"""Property-based tests (hypothesis) — beyond the reference's
golden-fixture-only strategy (SURVEY §5): canonicalization idempotence,
hash parity on arbitrary inputs, codec roundtrips on arbitrary shapes."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from scrapy_cluster_test_spark import crawlspec as spec
from scrapy_cluster_test_spark.functions import urlkit
from scrapy_cluster_test_spark.functions.imagecodec import (
    decode_image,
    encode_png,
    encode_qimg,
    psnr,
)
from scrapy_cluster_test_spark.functions.xxh64 import xxh64

HOST = st.from_regex(r"[a-z0-9][a-z0-9.-]{0,20}\.[a-z]{2,5}", fullmatch=True)
PATH = st.from_regex(r"(/[A-Za-z0-9._~-]{0,12}){0,4}", fullmatch=True)
QUERY = st.lists(
    st.tuples(
        st.from_regex(r"[a-z]{1,6}", fullmatch=True),
        st.from_regex(r"[A-Za-z0-9]{0,8}", fullmatch=True),
    ),
    max_size=4,
)


@st.composite
def urls(draw):
    host = draw(HOST)
    path = draw(PATH)
    q = draw(QUERY)
    qs = "&".join(f"{k}={v}" for k, v in q)
    frag = draw(st.sampled_from(["", "#frag"]))
    scheme = draw(st.sampled_from(["http", "https", "HTTPS"]))
    return f"{scheme}://{host}{path}" + (f"?{qs}" if qs else "") + frag


@given(urls())
@settings(max_examples=200, deadline=None)
def test_canonicalize_idempotent(u):
    c1 = urlkit.py_canonicalize(u)
    assert urlkit.py_canonicalize(c1) == c1
    assert "#" not in c1
    # sorted query atoms
    if "?" in c1:
        atoms = c1.split("?", 1)[1].split("&")
        assert atoms == sorted(atoms)


@given(st.binary(max_size=200), st.integers(min_value=0, max_value=2**64 - 1))
@settings(max_examples=200, deadline=None)
def test_xxh64_reference_vectors(data, seed):
    """Stability: hashing twice is equal, single-bit flips change the hash
    (avalanche sanity), and output stays in 64-bit range."""
    h = xxh64(data, seed)
    assert 0 <= h < 2**64
    assert xxh64(data, seed) == h
    if data:
        flipped = bytes([data[0] ^ 1]) + data[1:]
        assert xxh64(flipped, seed) != h


@given(
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=50, deadline=None)
def test_png_roundtrip_any_shape(w, h, s):
    rng = np.random.Generator(np.random.Philox(key=[7, s]))
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    assert (decode_image(encode_png(img)) == img).all()


@given(st.integers(min_value=0, max_value=2**31 - 1))
@settings(max_examples=50, deadline=None)
def test_qimg_psnr_bound(s):
    rng = np.random.Generator(np.random.Philox(key=[8, s]))
    img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    dec = decode_image(encode_qimg(img))
    assert psnr(img, dec) >= 40.0
    assert int(np.abs(dec.astype(int) - img.astype(int)).max()) <= 2


@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
@settings(max_examples=200, deadline=None)
def test_status_code_total(p):
    assert spec.status_code(p) in (200, 404, 503, 520)


@given(st.integers(min_value=-(2**63), max_value=2**63 - 1), st.integers(0, 9))
@settings(max_examples=200, deadline=None)
def test_child_index_in_range(p, k):
    assert 0 <= spec.child_index(p, k, 1000) < 1000
