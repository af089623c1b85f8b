"""r6 optimization pins: the Arrow/numpy LSH-IVF kernels must produce
BIT-IDENTICAL relations to the JVM expression forms they replaced.

* codes: ``md5_lsh_codes_arrow`` (numpy element-ordered accumulation over
  ``md5_plane_weights``) vs ``md5_lsh_codes`` (explode + broadcast plane
  join + aggregate fold) — same (id, bucket) set.
* ann: the two-phase (BLAS prune + exact rescore + per-query merge)
  ``ann_topk_lsh`` vs an r5-shaped reference built from the JVM codes and
  ordered-fold verify — byte-equal rows.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from scrapy_cluster_test_spark.operators import similarity as sim
from scrapy_cluster_test_spark.sources import tables

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def embs(spark):
    return tables.load(spark, SF, "embeddings")


def test_codes_arrow_equals_jvm(spark, embs):
    jvm = set(map(tuple, sim.md5_lsh_codes(embs, 5, 8).collect()))
    arrow = set(map(tuple, sim.md5_lsh_codes_arrow(embs, 5, 8).collect()))
    assert arrow == jvm
    assert len(arrow) == embs.count() * 8


def _ann_reference_jvm(vectors, queries, k=5, n_planes=5, n_tables=40):
    """The r5 plan shape: JVM codes, grouped candidate generation,
    ordered-fold verify, row_number window."""
    codes = sim.md5_lsh_codes(vectors, n_planes, n_tables)
    qids = queries.select("vec_id").withColumn("_isq", F.lit(1))
    marked = codes.join(qids, "vec_id", "left")
    grp = (
        marked.groupBy("bucket")
        .agg(
            F.collect_list(
                F.when(F.col("_isq") == 1, F.col("vec_id"))
            ).alias("_qs"),
            F.collect_list(F.col("vec_id")).alias("_members"),
        )
        .filter(F.size("_qs") > 0)
    )
    cand = (
        grp.select(F.explode("_qs").alias("query_id"), "_members")
        .select("query_id", F.explode("_members").alias("neighbor_id"))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .distinct()
    )
    vn = vectors.select(
        "vec_id", "embedding", sim.norm_col(F.col("embedding")).alias("nr")
    )
    pair = cand.join(
        vn.select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("emb_q"),
            F.col("nr").alias("norm_q"),
        ),
        "query_id",
    ).join(
        vn.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("embedding").alias("emb_v"),
            F.col("nr").alias("norm_v"),
        ),
        "neighbor_id",
    )
    scored = pair.withColumn(
        "cosine",
        sim.dot_cols("emb_q", "emb_v") / (F.col("norm_q") * F.col("norm_v")),
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "rnk")
    )


def test_ann_two_phase_equals_jvm_reference(spark, embs):
    q = embs.filter(F.col("vec_id") % 50 == 0)
    ref = sorted(map(tuple, _ann_reference_jvm(embs, q).collect()))
    new = sorted(map(tuple, sim.ann_topk_lsh(embs, q, k=5).collect()))
    assert new == ref
    assert len(new) > 0
