"""Distributed per-row payload invariants (BASELINE.json input_hint):
decoded pixels PSNR≥40dB (exact for PNG), captions byte-equal — checked
through the Spark path (mapInPandas over the images table)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scrapy_cluster_test_spark import datagen
from scrapy_cluster_test_spark.operators import multimodal

DATA = "/tmp/sct_payload_data"
N = 120


@pytest.fixture(scope="module")
def images(spark):
    datagen.generate_images(spark, N).write.mode("overwrite").parquet(
        f"{DATA}/images.parquet"
    )
    return spark.read.parquet(f"{DATA}/images.parquet")


def test_payload_invariants(spark, images):
    res = multimodal.verify_payloads(images)
    bad = res.filter(
        (F.col("psnr_db") < 40.0) | ~F.col("caption_ok") | ~F.col("shape_ok")
    )
    assert bad.count() == 0
    assert res.count() == N


def test_png_rows_lossless(spark, images):
    res = multimodal.verify_payloads(images.filter(F.col("fmt") == "png"))
    # PSNR of an exact roundtrip is clamped to 1e9 (inf)
    assert res.filter(F.col("psnr_db") < 1e9).count() == 0


def test_phash_matches_stored(spark, images):
    res = multimodal.verify_payloads(images).select("image_id", "phash_rehash")
    joined = images.select("image_id", "phash").join(res, "image_id")
    assert joined.filter(F.col("phash") != F.col("phash_rehash")).count() == 0


def test_feature_extraction_shape(spark, images):
    feats = multimodal.extract_features(images.limit(10))
    rows = feats.collect()
    assert len(rows) == 10
    for r in rows:
        assert 0 <= r.mean_r <= 255 and 0 <= r.luma_p50 <= 255 and r.contrast > 0


def test_configure_arrow_for_binary(spark, images, monkeypatch):
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    prev = spark.conf.get(key)
    try:
        multimodal.configure_arrow_for_binary(spark)
        assert spark.conf.get(key) == str(multimodal.BINARY_ARROW_RECORDS_PER_BATCH)
        # env override wins when no explicit value is passed
        monkeypatch.setenv("SCT_ARROW_BATCH", "1024")
        multimodal.configure_arrow_for_binary(spark)
        assert spark.conf.get(key) == "1024"
        # explicit argument beats the env
        multimodal.configure_arrow_for_binary(spark, records_per_batch=256)
        assert spark.conf.get(key) == "256"
        # the operators still run under the bounded batch size
        assert multimodal.verify_payloads(images.limit(5)).count() == 5
    finally:
        spark.conf.set(key, prev)
