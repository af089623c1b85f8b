"""Bloom seen-filter: no false negatives, same result set as exact
anti-join, delta updates, and sane false-positive rate."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from scrapy_cluster_test_spark.operators import seen


@pytest.fixture(scope="module")
def fps(spark):
    # deterministic fp universe: 20k "seen" + 20k candidates (half overlap)
    seen_df = spark.range(0, 20000).select(
        F.xxhash64(F.col("id")).alias("url_fp")
    )
    cand_df = spark.range(10000, 30000).select(
        F.xxhash64(F.col("id")).alias("url_fp")
    )
    return seen_df, cand_df


def test_bloom_no_false_negatives(spark, fps):
    seen_df, _ = fps
    bloom = seen.build_bloom(seen_df)
    marked = seen.mark_probably_seen(spark, seen_df, bloom)
    assert marked.filter(~F.col("maybe_seen")).count() == 0


def test_bloom_filter_new_equals_exact(spark, fps):
    seen_df, cand_df = fps
    bloom = seen.build_bloom(seen_df)
    via_bloom = {
        r.url_fp for r in seen.filter_new(spark, cand_df, seen_df, bloom).collect()
    }
    exact = {r.url_fp for r in cand_df.join(seen_df, "url_fp", "left_anti").collect()}
    assert via_bloom == exact
    assert len(exact) == 10000


def test_bloom_fp_rate(spark, fps):
    seen_df, cand_df = fps
    bloom = seen.build_bloom(seen_df)
    fresh = cand_df.join(seen_df, "url_fp", "left_anti")
    marked = seen.mark_probably_seen(spark, fresh, bloom)
    fp_rate = marked.filter(F.col("maybe_seen")).count() / fresh.count()
    # 10 bits/key, k=5 → theoretical ~1%; allow slack
    assert fp_rate < 0.05, fp_rate


def test_bloom_delta_update(spark, fps):
    seen_df, cand_df = fps
    bloom = seen.build_bloom(seen_df)
    delta = np.array(
        [r.url_fp for r in cand_df.limit(500).collect()], dtype=np.int64
    )
    bloom2 = bloom.add_delta(delta)
    assert bool(bloom2.probe_np(delta).all())
    # old keys still present
    old = np.array([r.url_fp for r in seen_df.limit(500).collect()], dtype=np.int64)
    assert bool(bloom2.probe_np(old).all())


def test_routed_probe_equals_exact(spark):
    """Shard-routed probe (bitmap table + cogroup) must produce exactly
    the plain left_anti result — and the probe stage must not broadcast
    any filter state (VERDICT r1 scale-killer #5)."""
    from scrapy_cluster_test_spark.operators import seen as seen_ops
    from pyspark.sql import functions as F

    frontier = spark.range(0, 5000).select(
        (F.xxhash64(F.col("id").cast("string"))).alias("url_fp")
    )
    cands = spark.range(2500, 7500).select(
        (F.xxhash64(F.col("id").cast("string"))).alias("url_fp"),
        F.col("id").alias("payload"),
    )
    shard_bitmaps, m_bits = seen.build_bloom_table(frontier, n_shards=8)
    routed = seen.filter_new_routed(
        cands, frontier, shard_bitmaps, m_bits, n_shards=8
    )
    exact = cands.join(frontier, "url_fp", "left_anti")
    assert sorted(map(tuple, routed.collect())) == sorted(map(tuple, exact.collect()))

    # no executor ever holds more than one shard: the bitmap table has one
    # row per shard, each exactly m_bits/8 bytes, and the probe plan ships
    # them via shuffle (cogroup/FlatMapCoGroups), never a broadcast
    rows = shard_bitmaps.collect()
    assert len(rows) == 8
    assert all(len(r.bitmap) == m_bits // 8 for r in rows)
    plan = routed._jdf.queryExecution().executedPlan().toString()
    probe_part = plan[: plan.index("CoGroup") + 200] if "CoGroup" in plan else plan
    assert "FlatMapCoGroupsInPandas" in plan, plan[:1500]
    assert "Broadcast" not in probe_part, probe_part


def test_incremental_or_equals_full_rebuild(spark):
    """bloom_or_new(prev, delta) must be BIT-IDENTICAL to building the
    union set from scratch at the same m_bits — a Bloom filter never
    clears bits, so set-union == bitwise OR (the broadcast-plus-delta
    lifecycle the epoch driver commits each epoch)."""
    base = spark.range(0, 4000).select(
        F.xxhash64(F.col("id").cast("string")).alias("url_fp")
    )
    delta = spark.range(4000, 5500).select(
        F.xxhash64(F.col("id").cast("string")).alias("url_fp")
    )
    m_bits = seen.bloom_m_bits(10_000, n_shards=8)
    prev = seen.build_bloom_table_fixed(base, m_bits, n_shards=8)
    inc = seen.bloom_or_new(prev, delta, m_bits, n_shards=8)
    full = seen.build_bloom_table_fixed(base.union(delta), m_bits, n_shards=8)
    inc_map = {r.shard: bytes(r.bitmap) for r in inc.collect()}
    full_map = {r.shard: bytes(r.bitmap) for r in full.collect()}
    assert inc_map == full_map
    # empty delta → table passes through unchanged
    none = seen.bloom_or_new(prev, delta.limit(0), m_bits, n_shards=8)
    assert {r.shard: bytes(r.bitmap) for r in none.collect()} == {
        r.shard: bytes(r.bitmap) for r in prev.collect()
    }
