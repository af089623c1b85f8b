"""ANN search: LSH recall vs the exact baseline, and the BLAS kernel
variant must agree with the fold-based exact top-k."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scrapy_cluster_test_spark.operators import similarity
from scrapy_cluster_test_spark.sources import tables

from .conftest import SF_TINY

DIM = 64


@pytest.fixture(scope="module")
def embs(spark):
    return tables.load(spark, SF_TINY, "embeddings")


def _queries(embs):
    return embs.filter(F.col("vec_id") % 50 == 0)


def test_numpy_kernel_matches_exact(spark, embs):
    """Same neighbors, same ranks: the float32→float64 matmul kernel and
    the JVM fold produce cosines whose ORDER agrees (ties broken by id)."""
    q = _queries(embs)
    a = {
        (r.query_id, r.rnk): r.neighbor_id
        for r in similarity.brute_force_topk(embs, q, k=5).collect()
    }
    b = {
        (r.query_id, r.rnk): r.neighbor_id
        for r in similarity.brute_force_topk_numpy(embs, q, k=5).collect()
    }
    assert a == b


def test_lsh_recall_multitable(spark, embs):
    """Recall is measured, not assumed. One table at 4 planes recovers
    little on near-random vectors; 8 independent tables recover most of
    the true top-5 (measured: 0.12 → 0.76+) — the standard multi-table
    recall lever, each table still 2^planes cheaper than brute force."""
    q = _queries(embs)
    truth = {
        (r.query_id, r.neighbor_id)
        for r in similarity.brute_force_topk(embs, q, k=5).collect()
    }

    def recall(n_tables):
        got = {
            (r.query_id, r.neighbor_id)
            for r in similarity.lsh_topk(
                embs, q, dim=DIM, k=5, n_planes=4, n_tables=n_tables
            ).collect()
        }
        assert len(got) <= len(truth)  # never more than k per query
        return len(truth & got) / len(truth)

    r1, r8 = recall(1), recall(8)
    assert r8 >= 0.6, (r1, r8)
    assert r8 > r1


def test_lsh_bucket_determinism(spark, embs):
    b1 = similarity.lsh_topk(embs, _queries(embs), dim=DIM, k=5, n_tables=4).collect()
    b2 = similarity.lsh_topk(embs, _queries(embs), dim=DIM, k=5, n_tables=4).collect()
    assert sorted(map(tuple, b1)) == sorted(map(tuple, b2))
