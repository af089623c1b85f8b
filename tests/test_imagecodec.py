"""Image payload invariants (BASELINE.json input_hint): PNG roundtrips
exactly; the lossy stand-in decodes with PSNR ≥ 40 dB; phash is
recomputable and stable."""

from __future__ import annotations

import numpy as np

from scrapy_cluster_test_spark.datagen import make_image_row
from scrapy_cluster_test_spark.functions.imagecodec import (
    decode_image,
    encode_png,
    phash64,
    psnr,
)


def _rng(i):
    return np.random.Generator(np.random.Philox(key=[42, i]))


def test_png_roundtrip_exact():
    img = _rng(1).integers(0, 256, (64, 32, 3), dtype=np.uint8)
    assert (decode_image(encode_png(img)) == img).all()


def test_lossy_psnr_over_40db():
    for i in (1, 3, 5):
        row = make_image_row(2 * i + 1)  # odd → fmt=jpeg (lossy stand-in)
        assert row["fmt"] == "jpeg"
        src = _rng(2 * i + 1).integers(
            0, 256, (row["h"], row["w"], 3), dtype=np.uint8
        )
        dec = decode_image(row["bytes"])
        assert dec.shape == (row["h"], row["w"], 3)
        assert psnr(src, dec) >= 40.0


def test_png_rows_exact_and_caption():
    row = make_image_row(4)  # even → png
    assert row["fmt"] == "png"
    src = _rng(4).integers(0, 256, (row["h"], row["w"], 3), dtype=np.uint8)
    assert (decode_image(row["bytes"]) == src).all()
    assert row["caption"].startswith("caption 4: tok")


def test_phash_deterministic_and_stored():
    row1, row2 = make_image_row(7), make_image_row(7)
    assert row1["phash"] == row2["phash"]
    src = _rng(7).integers(0, 256, (row1["h"], row1["w"], 3), dtype=np.uint8)
    assert phash64(src) == row1["phash"]


def test_phash_robust_to_lossy_encoding():
    """pHash of the decoded lossy payload stays within a small Hamming
    distance of the source pHash (perceptual invariance)."""
    row = make_image_row(9)
    src = _rng(9).integers(0, 256, (row["h"], row["w"], 3), dtype=np.uint8)
    dec = decode_image(row["bytes"])
    d = bin((phash64(src) ^ phash64(dec)) & ((1 << 64) - 1)).count("1")
    assert d <= 8
