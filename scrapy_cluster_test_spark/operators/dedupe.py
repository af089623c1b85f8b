"""Document deduplication operators for training-data pipelines.

Exact (hash-groupBy), MinHash+LSH (shingle → minhash → band → bucket join),
SimHash, and n-gram Jaccard — all expressed with native Spark SQL functions
(explode / groupBy / self-join); no Python in the hot path, so every stage
is whole-stage-codegen'd and scales with ordinary shuffles on
content-derived keys.

Reference parallel: the reference dedups entities by key anti-joins
(pipelines.py:457-530) and first-wins dicts (SURVEY D2-D7); these operators
generalize that to *content* dedup, the dominant op in a 100 TB
training-data pipeline.

Cross-engine determinism notes (these must oracle-match DuckDB):
* hash family = md5 strings — identical in both engines; MinHash uses the
  LEXICOGRAPHIC MIN of salted md5 hex digests (a valid permutation family,
  no integer conversion needed);
* where an integer hash is needed (SimHash), the first 8 md5 hex chars are
  parsed as a 32-bit integer on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_BANDS = 4


def words(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("ws", F.split(F.col(text_col), " "))


def shingles_multiset(
    df: DataFrame, id_col: str, text_col: str = "text", n: int = 3
) -> DataFrame:
    """Word n-gram shingles per document, one row each, DUPLICATES KEPT
    (1-based positions) — the codegen'd explode without the DISTINCT
    exchange, for consumers whose aggregate is duplicate-insensitive
    (min-hash style folds). Documents with fewer than ``n`` words yield
    NO shingles (they simply drop out of the explode), matching the
    DuckDB oracles' generate_series semantics — an unguarded
    sequence(1, size-n+1) would DESCEND for short docs and element_at
    would then throw INVALID_ARRAY_INDEX."""
    w = words(df, text_col)
    gram = F.concat_ws(
        " ", *[F.element_at("ws", F.col("i") + k) for k in range(n)]
    )
    positions = F.when(
        F.size("ws") >= n, F.sequence(F.lit(1), F.size("ws") - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    return (
        w.select(id_col, F.explode(positions).alias("i"), "ws")
        .select(id_col, gram.alias("shingle"))
    )


def shingles(df: DataFrame, id_col: str, text_col: str = "text", n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per document, one row each — for
    consumers that need the set relation (e.g. exact Jaccard counting);
    duplicate-insensitive aggregates use ``shingles_multiset`` and skip
    the DISTINCT exchange (r6, guide §2.4)."""
    return shingles_multiset(df, id_col, text_col, n).distinct()


def exact_dedup_groups(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Exact dedup via content hash: groups of byte-identical documents.
    Output: (content_hash, n_dups, keeper_id). One shuffle on the hash."""
    return (
        df.select(F.md5(F.col(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.count("*").alias("n_dups"),
            F.min(id_col).alias("keeper_id"),
        )
    )


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str = "text", bands: int = DEFAULT_BANDS
) -> DataFrame:
    """One minhash per band: min over shingles of md5('b{b}|' + shingle).
    Output: (id, h0..h{bands-1}).

    r6 (guide §2.4): min over the multiset equals min over the distinct
    set, so the shingle DISTINCT exchange is dropped — the explode stays
    whole-stage-codegen'd, the mins partially aggregate map-side (the
    explode preserves the scan partitioning), and the one remaining
    exchange carries only the ~|docs| partial signature rows instead of
    the full (doc, shingle) relation twice."""
    sh = shingles_multiset(df, id_col, text_col)
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"b{b}|"), F.col("shingle")))).alias(f"h{b}")
        for b in range(bands)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    bands: int = DEFAULT_BANDS,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """MinHash-LSH candidate duplicate pairs: documents sharing ANY band
    bucket. Output: distinct (id_a, id_b) with id_a < id_b.

    Scale shape: signatures shuffle once on the band hash (the bucket
    join key); the self-join per band is an equi-join Catalyst plans as
    shuffle-hash; a bucket of size s yields s(s-1)/2 pairs, so skew is
    watched via ``lsh_bucket_stats`` BEFORE the join at 100 TB.

    ``max_bucket_size`` is the production gate that metric feeds: buckets
    larger than the cap (boilerplate-dominated shingles — one degenerate
    bucket turns the join quadratic) are DROPPED before the self-join, so
    the pair output is bounded by Σ_{s≤cap} s(s-1)/2 ≤ n_buckets·cap²/2.
    Documents in a dropped bucket still pair through their other bands.
    None (the default, and the oracle-checked semantics) keeps every
    bucket."""
    sig = minhash_signatures(df, id_col, text_col, bands)
    # ONE exchange total (r6, guide §2.4): the per-row signatures explode
    # to (id, band-salted bucket) rows, one groupBy collects each
    # bucket's members, the size cap is a filter on the member count, and
    # pairs come from a double explode within the bucket row — identical
    # pair set to the bucket self-join, but the signature subtree is
    # planned ONCE (the join shape planned it once per side, plus a third
    # time for the oversized-bucket relation) and no quadratic pair set
    # crosses an exchange before the final distinct.
    long = sig.select(
        F.col(id_col),
        F.explode(
            F.array(*[
                F.concat(F.lit(f"{b}|"), F.col(f"h{b}")) for b in range(bands)
            ])
        ).alias("bucket"),
    )
    grp = long.groupBy("bucket").agg(F.collect_list(F.col(id_col)).alias("_ms"))
    if max_bucket_size is not None:
        grp = grp.filter(F.size("_ms") <= max_bucket_size)
    return (
        grp.filter(F.size("_ms") >= 2)
        .select(F.explode("_ms").alias("id_a"), "_ms")
        .select("id_a", F.explode("_ms").alias("id_b"))
        .filter(F.col("id_a") < F.col("id_b"))
        .distinct()
    )


def lsh_bucket_stats(
    df: DataFrame, id_col: str, text_col: str = "text", bands: int = DEFAULT_BANDS
) -> DataFrame:
    """Bucket-size skew diagnostics for the LSH self-join — the metric the
    100-TB deployment watches BEFORE running lsh_candidate_pairs, because
    a bucket of size s emits s(s-1)/2 pairs: one degenerate bucket (e.g.
    boilerplate-dominated shingles) turns the candidate join quadratic.

    One row: n_buckets, max/p99 bucket size, and est_pairs = Σ s(s-1)/2 —
    the exact output size of the candidate join. Gate the join on
    est_pairs (or cap oversized buckets) rather than discovering the skew
    as a straggler task."""
    sig = minhash_signatures(df, id_col, text_col, bands)
    long = sig.select(
        F.explode(
            F.array(*[
                F.concat(F.lit(f"{b}|"), F.col(f"h{b}")) for b in range(bands)
            ])
        ).alias("bucket"),
    )
    sizes = long.groupBy("bucket").agg(F.count("*").alias("s"))
    # exact percentile (not approx) so the DuckDB oracle's quantile_cont
    # agrees bit-for-bit; the sizes relation is #buckets rows — tiny
    return sizes.agg(
        F.count("*").alias("n_buckets"),
        F.max("s").alias("max_bucket"),
        F.expr("percentile(s, 0.99)").cast("double").alias("p99_bucket"),
        F.sum(F.col("s") * (F.col("s") - 1) / 2).cast("long").alias("est_pairs"),
    )


def _word_hash32(col: F.Column) -> F.Column:
    """First 8 md5 hex chars as a 32-bit integer — identical in DuckDB via
    CAST(concat('0x', substr(md5(w),1,8)) AS BIGINT)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def simhash(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """32-bit SimHash over words: per bit, sum +1/-1 votes across (repeated)
    tokens; bit set if the vote is positive. Output: (id, simhash).

    Computed entirely per-row with higher-order functions: one md5 per
    word (hoisted by the outer transform), then a 32-slot vote accumulator
    folded with aggregate/zip_with. ZERO shuffles and no row expansion —
    the previous shape exploded 32 bit-rows per word and pushed
    32×|words| rows through a groupBy exchange, which at 100 TB made the
    cheap fingerprint the dominant shuffle."""
    hs = f"transform(split({text_col}, ' '), x -> CAST(conv(substring(md5(x), 1, 8), 16, 10) AS BIGINT))"
    votes = (
        f"aggregate({hs}, array_repeat(CAST(0 AS BIGINT), 32), "
        "(acc, h) -> zip_with(acc, "
        "transform(sequence(0, 31), b -> CAST(2 * ((h >> b) & 1) - 1 AS BIGINT)), "
        "(a, v) -> a + v))"
    )
    sim = (
        f"aggregate(zip_with({votes}, sequence(0, 31), "
        "(v, b) -> IF(v > 0, shiftleft(CAST(1 AS BIGINT), b), CAST(0 AS BIGINT))), "
        "CAST(0 AS BIGINT), (a, x) -> a + x)"
    )
    return df.select(F.col(id_col), F.expr(sim).alias("simhash"))


def ngram_jaccard_pairs(
    df: DataFrame, id_col: str, pairs: DataFrame, text_col: str = "text", n: int = 3
) -> DataFrame:
    """Exact n-gram Jaccard for a given candidate pair set.
    ``pairs``: (id_a, id_b). Output: (id_a, id_b, inter, union_n, jaccard).

    The pair set bounds the cost — feed it LSH candidates, never the full
    cross product."""
    sh = shingles(df, id_col, text_col, n)
    sa = sh.select(F.col(id_col).alias("id_a"), F.col("shingle"))
    sb = sh.select(F.col(id_col).alias("id_b"), F.col("shingle"))
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("sz"))
    inter = (
        pairs.join(sa, "id_a")
        .join(sb, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        pairs.join(inter, ["id_a", "id_b"], "left")
        .na.fill({"inter": 0})
        .join(sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a")), "id_a")
        .join(sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b")), "id_b")
        .select(
            "id_a",
            "id_b",
            F.col("inter").cast("long").alias("inter"),
            (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast("long").alias("union_n"),
            (
                F.col("inter").cast("double")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast("double")
            ).alias("jaccard"),
        )
    )

