"""IVF at scale (VERDICT r4 item #6): the cid-bucketed corpus write +
probe-side file pruning that ivf_topk's docstring promises.

Pins, mirroring test_delta_bucket_pruning's method:
* the lists table on disk is partitioned by cid only (``cid=K`` subdirs);
* a probed-list read's inputFiles touch ONLY the probed ``cid=K``
  directories — pruning happens at file LISTING, not as a post-scan
  filter;
* ivf_topk_bucketed over the on-disk index returns exactly ivf_topk's
  result for the same corpus (same centroids, same tie-breaks).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from scrapy_cluster_test_spark.operators import similarity as sim
from scrapy_cluster_test_spark.sources import tables

from .conftest import SF_TINY

QUERY_EVERY = 50


@pytest.fixture(scope="module")
def index(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ivf_idx"))
    vecs = tables.load(spark, SF_TINY, "embeddings")
    sim.ivf_write_bucketed(vecs, root)
    return root


def test_lists_partitioned_by_cid(index):
    lists = os.path.join(index, "lists")
    subs = [s for s in os.listdir(lists) if not s.startswith(("_", "."))]
    assert subs, "no inverted lists written"
    assert all(s.startswith("cid=") for s in subs), subs


def test_probe_read_prunes_at_listing(spark, index):
    lists = os.path.join(index, "lists")
    all_cids = sorted(
        int(s.split("=")[1])
        for s in os.listdir(lists)
        if s.startswith("cid=")
    )
    assert len(all_cids) >= 2, "need ≥2 lists to show pruning"
    probe = all_cids[:1]
    scan = sim.ivf_read_lists(spark, index, probe)
    files = scan.inputFiles()
    assert files, "pruned read saw no files"
    assert all(f"cid={probe[0]}/" in f for f in files), files[:5]
    # and the pruned read equals the full read filtered to the list
    full = spark.read.parquet(lists).filter(F.col("cid") == probe[0])
    assert sorted(r.vec_id for r in scan.collect()) == sorted(
        r.vec_id for r in full.collect()
    )


def test_bucketed_equals_unbucketed_ivf(spark, index):
    vecs = tables.load(spark, SF_TINY, "embeddings")
    queries_ids = vecs.filter(F.col("vec_id") % QUERY_EVERY == 0).select(
        "vec_id"
    )
    want = sorted(
        tuple(r) for r in sim.ivf_topk(vecs, queries_ids).collect()
    )
    queries = vecs.filter(F.col("vec_id") % QUERY_EVERY == 0).select(
        "vec_id", "embedding"
    )
    got = sorted(
        tuple(r)
        for r in sim.ivf_topk_bucketed(spark, index, queries).collect()
    )
    assert want, "empty IVF baseline — bad query stride"
    assert got == want


def test_probed_fraction_scan_is_partial(spark, index):
    """The end-to-end probe scan reads a strict subset of list dirs when
    the query set probes fewer than all lists (the 100-TB win: untouched
    lists are never listed)."""
    vecs = tables.load(spark, SF_TINY, "embeddings")
    one_q = vecs.filter(F.col("vec_id") % QUERY_EVERY == 0).select(
        "vec_id", "embedding"
    ).orderBy("vec_id").limit(1)
    cents = spark.read.parquet(os.path.join(index, "centroids"))
    n_lists = len(
        [s for s in os.listdir(os.path.join(index, "lists")) if s.startswith("cid=")]
    )
    # a single query probes n_probe lists; with IVF_PROBE < n_lists the
    # pruned members scan must touch fewer dirs than exist
    assert sim.IVF_PROBE < n_lists or n_lists <= sim.IVF_PROBE
    if sim.IVF_PROBE >= n_lists:
        pytest.skip("tiny corpus materialized fewer lists than n_probe")
    qn = one_q.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("emb_q"),
        sim.norm_col(F.col("embedding")).alias("norm_q"),
    )
    qsim = qn.crossJoin(F.broadcast(cents)).withColumn(
        "cs",
        sim.dot_cols("emb_q", "emb_c") / (F.col("norm_q") * F.col("norm_c")),
    )
    from pyspark.sql.window import Window as W

    wq = W.partitionBy("query_id").orderBy(F.col("cs").desc(), F.col("cid"))
    probed = [
        int(r.cid)
        for r in qsim.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= sim.IVF_PROBE)
        .select("cid")
        .distinct()
        .collect()
    ]
    scan = sim.ivf_read_lists(spark, index, probed)
    dirs = {f.split("/cid=")[1].split("/")[0] for f in scan.inputFiles()}
    assert len(dirs) <= sim.IVF_PROBE < n_lists
