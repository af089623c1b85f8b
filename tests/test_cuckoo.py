"""Cuckoo filter: no false negatives, low FP rate, and — the reason it
exists next to Bloom — in-place deletion."""

from __future__ import annotations

import numpy as np

from scrapy_cluster_test_spark.operators.cuckoo import CuckooFilter


def _keys(n, seed=0):
    rng = np.random.Generator(np.random.Philox(key=[42, seed]))
    return rng.integers(-(2**62), 2**62, n, dtype=np.int64)


def test_no_false_negatives():
    keys = _keys(20000)
    cf = CuckooFilter.create(20000)
    assert cf.insert(keys) == 0  # all inserted within kick budget
    assert bool(cf.contains(keys).all())


def test_fp_rate():
    keys, other = _keys(20000, 0), _keys(20000, 1)
    cf = CuckooFilter.create(20000)
    cf.insert(keys)
    fresh = other[~np.isin(other, keys)]
    fp = float(cf.contains(fresh).mean())
    # 16-bit fingerprints, b=4 → theoretical ~2b/2^f ≈ 0.012%
    assert fp < 0.01, fp


def test_delete_then_absent():
    keys = _keys(5000)
    cf = CuckooFilter.create(5000)
    cf.insert(keys)
    victims = keys[:1000]
    assert cf.delete(victims) == 1000
    # deleted keys gone (barring fingerprint collisions with survivors)
    still = float(cf.contains(victims).mean())
    assert still < 0.02, still
    # survivors untouched
    assert bool(cf.contains(keys[1000:]).all())


def test_overfull_keeps_no_false_negative_contract():
    """Insert 4x the filter's capacity: kick chains exhaust and insert()
    reports failures, but every inserted key must STILL probe positive —
    evicted fingerprints land in the victim cache (ADVICE r1)."""
    cf = CuckooFilter.create(512)
    keys = _keys(4 * 512 * 4)  # 4x (buckets * slots)
    failed = cf.insert(keys)
    assert failed > 0  # we really did overfill
    assert bool(cf.contains(keys).all())
