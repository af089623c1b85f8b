"""Adaptive Bloom resize (CrawlParams.bloom_resize_at): when the seen set
outgrows the filter's design capacity, the epoch's bloom job rebuilds at
the next power-of-two size instead of OR-ing. Results must be byte-exact
either way (the bloom is a pure pre-filter — positives are verified by an
exact anti-join), so these tests pin: the trigger actually fires under a
deliberately undersized filter, the crawl log stays identical to the
exact-path crawl, the recorded size matches the bitmap bytes on disk,
resume restores the grown size, and bloom_resize_at=0 restores the
fixed-size pre-feature behavior."""

from __future__ import annotations

import pytest

from scrapy_cluster_test_spark import datagen
from scrapy_cluster_test_spark.operators import seen as seen_ops
from scrapy_cluster_test_spark.plans import epoch as ep

DATA = "/tmp/sct_bresize_data"
N = 200
# deliberately undersized: capacity = 1024 bits/shard · 2 shards / 10 b/key
# = 204 keys, far under the ~500-URL frontier this universe produces
TINY = dict(use_bloom=True, bloom_expected_total=32, bloom_shards=2)


@pytest.fixture(scope="module")
def universe(spark):
    datagen.generate_all(spark, DATA, n_images=N, n_seeds=8, budget_scale=0.2)
    return DATA


def _params(job_dir, **over):
    kw = dict(
        images_path=f"{DATA}/images.parquet",
        seeds_path=f"{DATA}/seeds.parquet",
        domains_path=f"{DATA}/domains.parquet",
        robots_path=f"{DATA}/robots.parquet",
        job_dir=job_dir,
        n_images=N,
        max_epochs=12,
    )
    kw.update(over)
    return ep.CrawlParams(**kw)


def _log(spark, job_dir):
    return [
        tuple(r)
        for r in ep.read_crawl_log(spark, job_dir).orderBy("seq").collect()
    ]


def _final_rec(job_dir):
    return ep.read_commit(job_dir, ep.last_committed_epoch(job_dir))


def test_resize_triggers_and_crawl_identical(spark, universe):
    ep.run_crawl(spark, _params("/tmp/sct_bresize_exact"), resume=False)
    ep.run_crawl(spark, _params("/tmp/sct_bresize_tiny", **TINY), resume=False)
    a = _log(spark, "/tmp/sct_bresize_exact")
    b = _log(spark, "/tmp/sct_bresize_tiny")
    assert len(a) > 0
    assert a == b
    rec = _final_rec("/tmp/sct_bresize_tiny")
    m0 = ep._bloom_m_bits(_params("/tmp/x", **TINY))
    assert rec["n_frontier"] > (m0 * 2) // seen_ops.BITS_PER_KEY, (
        "universe too small to exercise the trigger — grow N"
    )
    assert rec["bloom_m_bits"] > m0, "resize never fired"
    # the committed bitmap bytes match the recorded size
    last = ep.last_committed_epoch("/tmp/sct_bresize_tiny")
    bm = spark.read.parquet(
        f"/tmp/sct_bresize_tiny/epoch={last:05d}/bloom"
    ).collect()
    assert len(bm) == 2
    assert all(len(r.bitmap) == rec["bloom_m_bits"] // 8 for r in bm)


def test_resize_under_delta_carry(spark, universe):
    ep.run_crawl(
        spark,
        _params("/tmp/sct_bresize_delta", commit_mode="delta", **TINY),
        resume=False,
    )
    assert _log(spark, "/tmp/sct_bresize_delta") == _log(
        spark, "/tmp/sct_bresize_exact"
    )
    assert _final_rec("/tmp/sct_bresize_delta")["bloom_m_bits"] > ep._bloom_m_bits(
        _params("/tmp/x", **TINY)
    )


def test_resize_survives_resume(spark, universe):
    p_stop = _params("/tmp/sct_bresize_resume", max_epochs=4, **TINY)
    ep.run_crawl(spark, p_stop, resume=False)
    p_go = _params("/tmp/sct_bresize_resume", **TINY)
    ep.run_crawl(spark, p_go, resume=True)
    assert _log(spark, "/tmp/sct_bresize_resume") == _log(
        spark, "/tmp/sct_bresize_tiny"
    )
    assert _final_rec("/tmp/sct_bresize_resume")["bloom_m_bits"] == _final_rec(
        "/tmp/sct_bresize_tiny"
    )["bloom_m_bits"]


def test_resize_disabled_keeps_fixed_size(spark, universe):
    ep.run_crawl(
        spark,
        _params("/tmp/sct_bresize_off", bloom_resize_at=0.0, **TINY),
        resume=False,
    )
    assert _log(spark, "/tmp/sct_bresize_off") == _log(
        spark, "/tmp/sct_bresize_exact"
    )
    assert _final_rec("/tmp/sct_bresize_off")["bloom_m_bits"] == ep._bloom_m_bits(
        _params("/tmp/x", **TINY)
    )
