"""The bloom-enabled crawl must be byte-identical to the exact-path crawl
(and hence to the oracle): the Bloom filter is a pure pre-filter."""

from __future__ import annotations

import pytest

from scrapy_cluster_test_spark import datagen
from scrapy_cluster_test_spark.plans import epoch as ep

DATA = "/tmp/sct_bloom_data"
N = 200


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


def test_bloom_crawl_identical(spark, universe):
    ep.run_crawl(spark, _params("/tmp/sct_bloom_jobE"), resume=False)
    ep.run_crawl(spark, _params("/tmp/sct_bloom_jobB", use_bloom=True), resume=False)
    a = _log(spark, "/tmp/sct_bloom_jobE")
    b = _log(spark, "/tmp/sct_bloom_jobB")
    assert len(a) > 0
    assert a == b
    fa = ep.read_final_frontier(spark, "/tmp/sct_bloom_jobE")
    fb = ep.read_final_frontier(spark, "/tmp/sct_bloom_jobB")
    key = lambda df: sorted(
        (r.url_fp, r.status, r.crawl_time, r.retry_times) for r in df.collect()
    )
    assert key(fa) == key(fb)
