"""URL-seen set at scale: sharded Bloom filter + exact anti-join.

Reference: the two-stage `$in`-probe anti-join dedup
(pipelines.py:457-468) and `$setOnInsert` idempotent inserts
(pipelines.py:429-444). Exact anti-join alone is correct but at a
10^10-row frontier the probe side dominates epoch cost; the north rule
prescribes a Bloom/cuckoo pre-filter maintained as broadcast + delta.

Design (sandbox = small constants, same shape at scale):
* the fp space is sharded by ``pmod(fp, n_shards)``; each shard is an
  independent Bloom bitmap built DISTRIBUTED via applyInPandas over the
  frontier's fps (one task per shard — numpy bit-ops, no Python loop);
* the PRODUCTION path is shard-ROUTED (build_bloom_table +
  filter_new_routed): shard bitmaps live in a table, candidates
  repartition by ``pmod(fp, n_shards)`` and cogroup with it, so each task
  receives exactly ONE shard's bitmap through the shuffle — at 10^10 fps
  and 10 bits/key (~12 GB of filter state across 256 shards) no executor
  ever holds more than one ~48 MB shard. The whole-dict broadcast path
  (build_bloom + filter_new) survives for small frontiers and the delta
  lifecycle tests;
* candidate fps probe their shard vectorized (numpy bit ops);
  bloom-negative → **definitely new** (no false negatives), skips the join;
  bloom-positive → exact ``left_anti`` against the frontier fps resolves
  false positives;
* per-epoch "delta" = the fps inserted this epoch: ``bloom_or_new`` ORs
  only the delta's bits into last epoch's bitmap table (set-union ==
  bitwise OR — bit-identical to a full rebuild, asserted in tests), and
  the epoch driver COMMITS the table with each epoch, so maintenance is
  O(new) and resume restores the exact filter state. ``bloom_m_bits``
  sizes the table once from expected totals so it never resizes.
  ``BloomShards.add_delta`` is the driver-side small-scale twin.

Equivalence with the exact path is asserted in tests/test_seen_bloom.py,
and the bloom-enabled crawl reproduces the oracle byte-for-byte.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import crawlspec as spec

_H2_SALT = 0xA5A5A5A5DEADBEEF


def _probe_positions(fps: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(n, k) bit positions via double hashing h1 + i·h2 (Kirsch-Mitzenmacher)."""
    u = fps.astype(np.uint64)
    h1 = spec.mix64_np(u)
    h2 = spec.mix64_np(u ^ np.uint64(_H2_SALT)) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)[None, :]
    return ((h1[:, None] + i * h2[:, None]) % np.uint64(m_bits)).astype(np.int64)


def _set_bits(bitmap: np.ndarray, pos: np.ndarray) -> None:
    np.bitwise_or.at(bitmap, pos >> 3, (1 << (pos & 7)).astype(np.uint8))


def _test_bits(bitmap: np.ndarray, pos: np.ndarray) -> np.ndarray:
    """(n, k) positions → (n,) all-bits-set boolean."""
    got = (bitmap[pos >> 3] & (1 << (pos & 7)).astype(np.uint8)) != 0
    return got.all(axis=1)


@dataclass
class BloomShards:
    n_shards: int
    m_bits: int  # per shard
    k: int
    shards: dict[int, bytes]

    def probe_np(self, fps: np.ndarray) -> np.ndarray:
        out = np.zeros(len(fps), dtype=bool)
        shard_of = np.mod(fps, self.n_shards)  # pmod: numpy % is non-negative here
        for s in range(self.n_shards):
            mask = shard_of == s
            if not mask.any() or s not in self.shards:
                continue
            bitmap = np.frombuffer(self.shards[s], dtype=np.uint8)
            pos = _probe_positions(fps[mask], self.m_bits, self.k)
            out[mask] = _test_bits(bitmap, pos)
        return out

    def add_delta(self, fps: np.ndarray) -> "BloomShards":
        """OR a delta of fps into the shard bitmaps (the per-epoch
        broadcast-plus-delta update — no rebuild)."""
        shards = {s: bytearray(b) for s, b in self.shards.items()}
        shard_of = np.mod(fps, self.n_shards)
        for s in range(self.n_shards):
            mask = shard_of == s
            if not mask.any():
                continue
            if s not in shards:
                shards[s] = bytearray(self.m_bits // 8)
            bm = np.frombuffer(bytes(shards[s]), dtype=np.uint8).copy()
            _set_bits(bm, _probe_positions(fps[mask], self.m_bits, self.k))
            shards[s] = bytearray(bm.tobytes())
        return BloomShards(
            self.n_shards, self.m_bits, self.k, {s: bytes(b) for s, b in shards.items()}
        )


# design bits-per-key for bloom_m_bits and the fill-ratio resize trigger
# (10 bits/key ≈ 1% false-positive rate at k=5). Single source of truth:
# both builders and epoch.py's resize cap_keys math derive from this.
BITS_PER_KEY = 10


def build_bloom(
    fps_df: DataFrame,
    n_shards: int = 16,
    bits_per_key: int = BITS_PER_KEY,
    k: int = 5,
    expected: int | None = None,
) -> BloomShards:
    """Distributed Bloom build: one applyInPandas task per shard sets its
    bitmap's bits with numpy; the driver collects n_shards small byte
    blobs. (At 10^10 keys this is the only collect — ~bits_per_key·N/8
    bytes total, sharded.)"""
    n = expected if expected is not None else fps_df.count()
    m_bits = bloom_m_bits(n, n_shards, bits_per_key)

    def per_shard(key, pdf: pd.DataFrame) -> pd.DataFrame:
        bitmap = np.zeros(m_bits // 8, dtype=np.uint8)
        fps = pdf["url_fp"].to_numpy(np.int64)
        _set_bits(bitmap, _probe_positions(fps, m_bits, k))
        return pd.DataFrame({"shard": [int(key[0])], "bitmap": [bitmap.tobytes()]})

    rows = (
        fps_df.select("url_fp")
        .withColumn("shard", F.pmod(F.col("url_fp"), F.lit(n_shards)).cast("int"))
        .groupBy("shard")
        .applyInPandas(per_shard, schema="shard int, bitmap binary")
        .collect()
    )
    return BloomShards(n_shards, m_bits, k, {r.shard: bytes(r.bitmap) for r in rows})


def build_bloom_table(
    fps_df: DataFrame,
    n_shards: int = 16,
    bits_per_key: int = BITS_PER_KEY,
    k: int = 5,
    expected: int | None = None,
) -> tuple[DataFrame, int]:
    """Shard bitmaps as a TABLE (shard int, bitmap binary) — nothing is
    collected to the driver and nothing is broadcast whole. Returns
    (shard_bitmaps_df, m_bits). The routed probe cogroups candidates with
    this table so each task receives exactly ONE shard's bitmap via the
    shuffle — at 10^10 fps no executor ever holds more than m_bits/8 bytes
    of filter state (the whole-dict broadcast this replaces shipped all
    shards to every executor: VERDICT r1 scale-killer #5)."""
    n = expected if expected is not None else fps_df.count()
    m_bits = bloom_m_bits(n, n_shards, bits_per_key)
    return build_bloom_table_fixed(fps_df, m_bits, k, n_shards), m_bits


def bloom_m_bits(
    expected_total: int, n_shards: int = 16, bits_per_key: int = BITS_PER_KEY
) -> int:
    """Per-shard bitmap size for an expected TOTAL key count — fixed up
    front so the table can grow incrementally without resizing; when the
    seen set outgrows it anyway, run_epoch's fill-ratio trigger rebuilds
    at the next power of two (epoch.py _job_bloom)."""
    return max(
        1024,
        1
        << int(
            np.ceil(
                np.log2(max(1, expected_total // max(1, n_shards)) * bits_per_key)
            )
        ),
    )


def build_bloom_table_fixed(
    fps_df: DataFrame, m_bits: int, k: int = 5, n_shards: int = 16
) -> DataFrame:
    """build_bloom_table with caller-fixed m_bits — the incremental
    lifecycle's bootstrap (size once from expected totals, never rebuild)."""

    def per_shard(key, pdf: pd.DataFrame) -> pd.DataFrame:
        bitmap = np.zeros(m_bits // 8, dtype=np.uint8)
        fps = pdf["url_fp"].to_numpy(np.int64)
        _set_bits(bitmap, _probe_positions(fps, m_bits, k))
        return pd.DataFrame({"shard": [int(key[0])], "bitmap": [bitmap.tobytes()]})

    return (
        fps_df.select("url_fp")
        .withColumn("shard", F.pmod(F.col("url_fp"), F.lit(n_shards)).cast("int"))
        .groupBy("shard")
        .applyInPandas(per_shard, schema="shard int, bitmap binary")
    )


def bloom_or_new(
    prev_bitmaps: DataFrame,
    new_fps: DataFrame,
    m_bits: int,
    k: int = 5,
    n_shards: int = 16,
) -> DataFrame:
    """The broadcast-plus-DELTA maintenance step (north rule): OR only the
    NEW fps into last epoch's bitmap table — O(new) work per epoch instead
    of an O(frontier) rebuild. Cogroup pairs each shard's new fps with its
    previous bitmap; shards with no new fps pass through unchanged, shards
    with no previous bitmap start from zeros. A Bloom filter never clears
    bits, so set-union of key sets == bitwise OR of bitmaps — the
    incremental table is bit-identical to a full rebuild at the same
    m_bits (asserted in tests/test_seen_bloom.py)."""

    def merge(fps: pd.DataFrame, bm: pd.DataFrame) -> pd.DataFrame:
        if bm.empty:
            shard = int(fps["shard"].iloc[0])
            bitmap = np.zeros(m_bits // 8, dtype=np.uint8)
        else:
            shard = int(bm["shard"].iloc[0])
            bitmap = np.frombuffer(bm["bitmap"].iloc[0], dtype=np.uint8).copy()
        if not fps.empty:
            _set_bits(
                bitmap, _probe_positions(fps["url_fp"].to_numpy(np.int64), m_bits, k)
            )
        return pd.DataFrame({"shard": [shard], "bitmap": [bitmap.tobytes()]})

    tagged = new_fps.select("url_fp").withColumn(
        "shard", F.pmod(F.col("url_fp"), F.lit(n_shards)).cast("int")
    )
    return (
        tagged.groupBy("shard")
        .cogroup(prev_bitmaps.groupBy("shard"))
        .applyInPandas(merge, schema="shard int, bitmap binary")
    )


def mark_probably_seen_routed(
    candidates: DataFrame,
    shard_bitmaps: DataFrame,
    m_bits: int,
    k: int = 5,
    n_shards: int = 16,
) -> DataFrame:
    """Shard-routed probe: candidates repartition by ``pmod(fp, n_shards)``
    and COGROUP with the shard-bitmap table — each task probes only its
    local shard's bitmap (shipped once per task through the shuffle, never
    broadcast). Adds ``maybe_seen``."""
    from pyspark.sql import types as T

    out_schema = T.StructType(
        list(candidates.schema.fields) + [T.StructField("maybe_seen", T.BooleanType())]
    )
    cand_cols = candidates.columns

    def probe(cand: pd.DataFrame, bm: pd.DataFrame) -> pd.DataFrame:
        cand = cand[cand_cols]
        if cand.empty:
            return cand.assign(maybe_seen=pd.Series([], dtype=bool))
        if bm.empty:  # shard with no frontier fps → nothing can be seen
            return cand.assign(maybe_seen=False)
        bitmap = np.frombuffer(bm["bitmap"].iloc[0], dtype=np.uint8)
        pos = _probe_positions(cand["url_fp"].to_numpy(np.int64), m_bits, k)
        return cand.assign(maybe_seen=_test_bits(bitmap, pos))

    tagged = candidates.withColumn(
        "_shard", F.pmod(F.col("url_fp"), F.lit(n_shards)).cast("int")
    )
    return (
        tagged.groupBy("_shard")
        .cogroup(shard_bitmaps.groupBy(F.col("shard").alias("_shard")))
        .applyInPandas(probe, schema=out_schema)
    )


def filter_new_routed(
    candidates: DataFrame,
    frontier_fps: DataFrame,
    shard_bitmaps: DataFrame,
    m_bits: int,
    k: int = 5,
    n_shards: int = 16,
) -> DataFrame:
    """filter_new with the shard-routed probe — identical result set to a
    plain left_anti (asserted in tests/test_seen_bloom.py)."""
    marked = mark_probably_seen_routed(candidates, shard_bitmaps, m_bits, k, n_shards)
    negatives = marked.filter(~F.col("maybe_seen")).drop("maybe_seen")
    positives = (
        marked.filter(F.col("maybe_seen"))
        .drop("maybe_seen")
        .join(frontier_fps, "url_fp", "left_anti")
    )
    return negatives.unionByName(positives)


def mark_probably_seen(
    spark: SparkSession, candidates: DataFrame, bloom: BloomShards
) -> DataFrame:
    """Adds ``maybe_seen`` via a vectorized pandas UDF probing the
    broadcast shard bitmaps."""
    bc = spark.sparkContext.broadcast(bloom)

    @F.pandas_udf("boolean")
    def probe(fp: pd.Series) -> pd.Series:
        b: BloomShards = bc.value
        return pd.Series(b.probe_np(fp.to_numpy(np.int64)))

    return candidates.withColumn("maybe_seen", probe(F.col("url_fp")))


def filter_new(
    spark: SparkSession,
    candidates: DataFrame,
    frontier_fps: DataFrame,
    bloom: BloomShards,
) -> DataFrame:
    """Rows of ``candidates`` whose fp is NOT in the frontier:
    bloom-negatives pass directly; bloom-positives take the exact
    anti-join. Result set is identical to a plain left_anti (asserted in
    tests) — the bloom only cuts the join's probe side."""
    marked = mark_probably_seen(spark, candidates, bloom)
    negatives = marked.filter(~F.col("maybe_seen")).drop("maybe_seen")
    positives = (
        marked.filter(F.col("maybe_seen"))
        .drop("maybe_seen")
        .join(frontier_fps, "url_fp", "left_anti")
    )
    return negatives.unionByName(positives)
