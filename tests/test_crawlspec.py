"""Scalar vs numpy-vectorized crawlspec forms must agree exactly."""

from __future__ import annotations

import numpy as np

from scrapy_cluster_test_spark import crawlspec as spec


def test_mix64_parity():
    xs = np.array([0, 1, 42, 2**40 + 7, 2**63 - 1], dtype=np.uint64)
    vec = spec.mix64_np(xs)
    for x, v in zip(xs.tolist(), vec.tolist()):
        assert spec.mix64(int(x)) == int(v)


def test_domain_id_parity():
    idx = np.arange(0, 5000, dtype=np.int64)
    vec = spec.domain_id_np(idx)
    for i in (0, 1, 7, 499, 4999):
        assert spec.domain_id(i) == int(vec[i])
    assert vec.min() >= 0 and vec.max() < spec.N_DOMAINS


def test_domain_skew():
    """The u³ law concentrates ~27% of pages on domain 0 (hot-domain skew)."""
    idx = np.arange(0, 20000, dtype=np.int64)
    share0 = float((spec.domain_id_np(idx) == 0).mean())
    assert 0.2 < share0 < 0.35


def test_status_code_parity():
    ph = np.array([0, 97, 131, 35, 12345, -97, -(2**62)], dtype=np.int64)
    vec = spec.status_code_np(ph)
    for p, v in zip(ph.tolist(), vec.tolist()):
        assert spec.status_code(int(p)) == int(v)


def test_child_index_parity():
    ph = np.array([5, -700, 2**60, 35 * 11], dtype=np.int64)
    for k in range(3):
        vec = spec.child_indices_np(ph, k, 1000)
        for p, v in zip(ph.tolist(), vec.tolist()):
            assert spec.child_index(int(p), k, 1000) == int(v)


def test_status_precedence():
    # multiples of both 97 and 35 must take the 503 branch in both forms
    p = 97 * 35
    assert spec.status_code(p) == 503
    assert int(spec.status_code_np(np.array([p], dtype=np.int64))[0]) == 503
