"""Similarity search over an embedding column (array<float>).

* ``cosine`` — native column expression (zip_with + aggregate fold): the
  multiply-accumulate runs in the JVM in element order, so results are
  bit-reproducible and oracle-comparable (DuckDB sums with ORDER BY).
* ``brute_force_topk`` — the exact baseline: broadcast the (small) query
  set against all vectors, window top-k.
* ``lsh_topk`` — the scale path: random-hyperplane LSH buckets (SimHash
  over fixed deterministic planes) shrink each query's candidate set;
  recall measured against brute force in tests.

At 100 TB the vectors table is bucketed by the LSH key so probes touch
only matching buckets; brute force stays as the per-bucket kernel. A
numpy matmul variant via mapInPandas is provided for throughput
(vectorized BLAS beats per-row folds ~50×) — same results, used by bench.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from .. import crawlspec as spec


def dot_cols(a: str | F.Column, b: str | F.Column) -> F.Column:
    """Σ aᵢ·bᵢ as doubles, folded in element order (deterministic)."""
    prods = F.zip_with(
        F.col(a) if isinstance(a, str) else a,
        F.col(b) if isinstance(b, str) else b,
        lambda x, y: x.cast("double") * y.cast("double"),
    )
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm_col(a: str | F.Column) -> F.Column:
    c = F.col(a) if isinstance(a, str) else a
    sq = F.transform(c, lambda x: x.cast("double") * x.cast("double"))
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x))


def with_cosine(pairs: DataFrame, a: str = "emb_a", b: str = "emb_b") -> DataFrame:
    return pairs.withColumn(
        "cosine", dot_cols(a, b) / (norm_col(a) * norm_col(b))
    )


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Exact top-k: broadcast queries × all vectors → cosine → window.
    Output: (query_id, neighbor_id, rnk) — rank ties broken by neighbor id.
    Norms are computed once per VECTOR before the join (identical
    element-order arithmetic, 3× fewer folds than per-pair norms)."""
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(emb_col).alias("emb_q"),
            norm_col(F.col(emb_col)).alias("norm_q"),
        )
    )
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(emb_col).alias("emb_v"),
        norm_col(F.col(emb_col)).alias("norm_v"),
    )
    scored = (
        q.crossJoin(v)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine", dot_cols("emb_q", "emb_v") / (F.col("norm_q") * F.col("norm_v"))
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "rnk")
    )


# -- deterministic random hyperplanes for LSH (seeded numpy, fixed dim) ----


def _planes(dim: int, n_planes: int, table: int = 0) -> np.ndarray:
    rng = np.random.Generator(np.random.Philox(key=[spec.SEED, 0x51AE + table]))
    return rng.standard_normal((n_planes, dim))


def lsh_bucket_udf(dim: int, n_planes: int = 8, n_tables: int = 1):
    """→ array<int> of bucket ids, one per hash table (independent plane
    sets). Multi-table LSH is the standard recall lever: a true neighbor
    is missed only if it hashes away in EVERY table."""
    planes = np.stack([_planes(dim, n_planes, t) for t in range(n_tables)])
    weights = (1 << np.arange(n_planes)).astype(np.int64)

    @F.pandas_udf("array<int>")
    def bucket(emb: pd.Series) -> pd.Series:
        m = np.stack(emb.to_numpy())  # (B, dim)
        out = []
        codes = np.empty((len(m), len(planes)), np.int64)
        for t in range(len(planes)):
            signs = (m @ planes[t].T) > 0
            codes[:, t] = (signs @ weights) + (t << n_planes)  # disjoint per table
        for row in codes:
            out.append(row.astype(np.int32).tolist())
        return pd.Series(out)

    return bucket


def lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 8,
    n_tables: int = 1,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to vectors sharing a
    random-hyperplane bucket with the query in ANY of ``n_tables`` tables.
    ~2^n_planes/n_tables× less work than brute force; recall is measured,
    not assumed (tests/test_similarity.py). At 100 TB the vectors table is
    written bucketed by the table-0 key so probes are partition-pruned."""
    bucket = lsh_bucket_udf(dim, n_planes, n_tables)
    v = (
        vectors.select(F.col(id_col).alias("neighbor_id"), F.col(emb_col).alias("emb_v"))
        .withColumn("bucket", F.explode(bucket(F.col("emb_v"))))
    )
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(emb_col).alias("emb_q")
        ).withColumn("bucket", F.explode(bucket(F.col("emb_q"))))
    )
    cand = (
        q.join(v, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "emb_q", "neighbor_id", "emb_v")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.withColumn(
        "cosine", dot_cols("emb_q", "emb_v") / (norm_col("emb_q") * norm_col("emb_v"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "rnk")
    )


# -- oracle-mirrorable LSH near-dup (md5-derived hyperplanes) --------------

NEARDUP_PLANES = 5
NEARDUP_TABLES = 24
# ANN top-k needs a higher collision probability than threshold near-dup:
# recall of the true top-k (including moderately-near neighbors) must be
# >=0.9, measured at sf0.1 in tests/test_similarity.py. 40 tables of 5
# planes measures 0.970 there (24 tables: 0.875 — below the floor).
# Keeping 5 planes (32 buckets/table) rather than dropping planes keeps
# bucket granularity, the dial that matters at 10^10 rows.
ANN_PLANES = 5
ANN_TABLES = 40
NEARDUP_THRESHOLD = 0.38


def md5_plane_weights(dim: int, n_planes: int, n_tables: int) -> np.ndarray:
    """Deterministic pseudo-random hyperplanes BOTH engines can derive:
    w(t,p,j) = (uint32(md5(f"{t}|{p}|{j}")[:8]) % 1000001) / 500000 - 1
    (j 1-based), i.e. uniform [-1,1). DuckDB computes the identical value
    via CAST(concat('0x', substr(md5(...),1,8)) AS BIGINT) — no plane
    literals need to travel into the oracle SQL."""
    import hashlib

    P = np.empty((n_tables, n_planes, dim), np.float64)
    for t in range(n_tables):
        for p in range(n_planes):
            for j in range(1, dim + 1):
                h = int(hashlib.md5(f"{t}|{p}|{j}".encode()).hexdigest()[:8], 16)
                P[t, p, j - 1] = (h % 1000001) / 500000.0 - 1.0
    return P


def md5_planes_df(spark, dim: int, n_planes: int, n_tables: int) -> DataFrame:
    """The same w(t,p,j) as ``md5_plane_weights`` but derived NATIVELY in
    Spark SQL (conv/substring/md5 — byte-for-byte the DuckDB oracle's
    formula) and assembled into a (t, p, plane: array<double>) relation
    of n_tables*n_planes rows. No Python RDD, no literal arrays in the
    query plan: the relation is computed JVM-side and broadcast (~tens of
    KB). array_sort on struct(j, w) pins element order before the
    collect_list, so the plane arrays are deterministic."""
    w = (
        F.conv(
            F.substring(F.md5(F.concat_ws("|", "t", "p", "j")), 1, 8), 16, 10
        ).cast("long")
        % 1000001
    ) / 500000.0 - 1.0
    # one flat range → (t, p, j) by integer div/mod: no crossJoin, so no
    # CartesianProduct node anywhere in downstream plans
    return (
        spark.range(n_tables * n_planes * dim)
        .select(
            F.expr(f"id div {n_planes * dim}").alias("t"),
            F.expr(f"(id div {dim}) % {n_planes}").alias("p"),
            F.expr(f"id % {dim} + 1").alias("j"),
        )
        .select("t", "p", "j", w.alias("w"))
        .groupBy("t", "p")
        .agg(F.array_sort(F.collect_list(F.struct("j", "w"))).alias("_jw"))
        .select(
            "t", "p", F.transform("_jw", lambda s: s["w"]).alias("plane")
        )
    )


def md5_lsh_codes(
    vectors: DataFrame,
    n_planes: int,
    n_tables: int,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """(id, bucket) LSH codes from the md5-derived hyperplanes — the
    shared kernel of ``neardup_pairs_lsh`` and ``ann_topk_lsh``. One
    bucket per hash table per vector; bucket ids are disjoint across
    tables (table id in the high bits). Plan shape: explode ×(n_tables ·
    n_planes), broadcast plane join, ordered float fold per (vector,
    plane), then an integer bit-sum per (vector, table) — every float
    step element-ordered so the DuckDB oracle is bit-identical."""
    spark = vectors.sparkSession
    dim = len(vectors.select(emb_col).first()[0])
    planes = md5_planes_df(spark, dim, n_planes, n_tables)
    n_codes = n_tables * n_planes

    v = vectors.select(F.col(id_col), F.col(emb_col))
    fan = v.select(
        id_col,
        emb_col,
        F.explode(F.sequence(F.lit(0), F.lit(n_codes - 1))).alias("_tp"),
    ).select(
        id_col,
        emb_col,
        (F.col("_tp") / n_planes).cast("long").alias("t"),
        (F.col("_tp") % n_planes).cast("long").alias("p"),
    )
    dots = fan.join(F.broadcast(planes), ["t", "p"]).select(
        id_col, "t", "p", dot_cols(F.col(emb_col), F.col("plane")).alias("d")
    )
    return (
        dots.groupBy(id_col, "t")
        .agg(
            F.sum(
                F.when(
                    F.col("d") > 0,
                    F.expr("shiftleft(cast(1 as bigint), cast(p as int))"),
                ).otherwise(F.lit(0).cast("long"))
            ).alias("bits")
        )
        .select(
            F.col(id_col),
            (F.shiftleft(F.col("t").cast("long"), n_planes) + F.col("bits")).alias(
                "bucket"
            ),
        )
    )


def neardup_pairs_lsh(
    vectors: DataFrame,
    threshold: float = NEARDUP_THRESHOLD,
    n_planes: int = NEARDUP_PLANES,
    n_tables: int = NEARDUP_TABLES,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate pairs via LSH buckets + exact cosine verify — the
    100-TB-shaped replacement for the all-pairs crossJoin: vectors explode
    into one bucket per hash table, pairs come from an EQUI-join on the
    bucket key (shuffle-hash/sort-merge, never CartesianProduct), and only
    bucket-co-resident pairs pay the exact-cosine fold.

    Every arithmetic step folds in element order as doubles (F.aggregate,
    mirrored by DuckDB sum(... ORDER BY)), so candidate sets and the final
    threshold cut are bit-identical cross-engine.

    Parameters are an honest recall/cost dial, measured not assumed
    (tests/test_similarity.py): on the driver's structureless corpus the
    defaults give recall 0.93 vs brute force at sf0.1; on clustered real
    corpora (planted-dup test) the same operator prunes >90% of pairs.

    Plan shape: the hyperplanes live in a tiny (n_tables*n_planes)-row
    broadcast relation with one array column — NOT inlined as literals
    (the literal form put 7,680 constants + 120 nested folds in one
    expression tree; analysis/codegen alone cost ~10s regardless of data
    size). Vectors explode ×(n_tables*n_planes), broadcast-equi-join the
    plane rows on (t, p), one ordered fold per row, then an integer bit
    sum per (vector, table) — order-independent because the bits are
    ints, while every float fold stays in element order for cross-engine
    bit-identity. Candidate pairs are deduped as bare ids BEFORE the
    embeddings are re-joined for the exact-cosine verify, so the widest
    rows never pass through the distinct shuffle."""
    codes = md5_lsh_codes(vectors, n_planes, n_tables, id_col, emb_col)
    cand = (
        codes.select(F.col(id_col).alias("vec_a"), "bucket")
        .join(codes.select(F.col(id_col).alias("vec_b"), "bucket"), "bucket")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
        .distinct()
    )
    vn = vectors.select(
        F.col(id_col), F.col(emb_col), norm_col(F.col(emb_col)).alias("nr")
    )
    pair = cand.join(
        vn.select(
            F.col(id_col).alias("vec_a"),
            F.col(emb_col).alias("emb_a"),
            F.col("nr").alias("norm_a"),
        ),
        "vec_a",
    ).join(
        vn.select(
            F.col(id_col).alias("vec_b"),
            F.col(emb_col).alias("emb_b"),
            F.col("nr").alias("norm_b"),
        ),
        "vec_b",
    )
    cosine = dot_cols("emb_a", "emb_b") / (F.col("norm_a") * F.col("norm_b"))
    return pair.filter(cosine >= threshold).select("vec_a", "vec_b")


def neardup_oracle_sql(
    threshold: float = NEARDUP_THRESHOLD,
    n_planes: int = NEARDUP_PLANES,
    n_tables: int = NEARDUP_TABLES,
) -> str:
    """DuckDB oracle mirroring neardup_pairs_lsh's exact bucket math —
    planes re-derived from md5 in SQL, dots folded in element order."""
    return f"""
    WITH ex AS (SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
           FROM embeddings, LATERAL unnest(generate_series(1, len(embedding))) AS t(i)),
    dims AS (SELECT DISTINCT i AS j FROM ex),
    planes AS (
      SELECT t, p, j,
             (CAST(concat('0x', substr(md5(concat(t, '|', p, '|', j)), 1, 8)) AS BIGINT)
              % 1000001) / 500000.0 - 1.0 AS w
      FROM generate_series(0, {n_tables - 1}) AS tt(t),
           generate_series(0, {n_planes - 1}) AS pp(p),
           dims),
    nrm AS (SELECT vec_id, sqrt(sum(x * x ORDER BY i)) AS nr FROM ex GROUP BY vec_id),
    dots AS (SELECT e.vec_id, pl.t, pl.p, sum(e.x * pl.w ORDER BY e.i) AS d
             FROM ex e JOIN planes pl ON pl.j = e.i
             GROUP BY e.vec_id, pl.t, pl.p),
    codes AS (SELECT vec_id, t,
                     sum(CASE WHEN d > 0 THEN (1::BIGINT << p) ELSE 0 END)
                       + (t::BIGINT << {n_planes}) AS bucket
              FROM dots GROUP BY vec_id, t),
    cand AS (SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
             FROM codes a JOIN codes b ON a.bucket = b.bucket AND a.vec_id < b.vec_id),
    dotp AS (SELECT c.vec_a, c.vec_b, sum(ea.x * eb.x ORDER BY ea.i) AS dot
             FROM cand c
             JOIN ex ea ON ea.vec_id = c.vec_a
             JOIN ex eb ON eb.vec_id = c.vec_b AND eb.i = ea.i
             GROUP BY c.vec_a, c.vec_b)
    SELECT vec_a, vec_b
    FROM dotp JOIN nrm na ON na.vec_id = vec_a JOIN nrm nb ON nb.vec_id = vec_b
    WHERE dot / (na.nr * nb.nr) >= {threshold}
    """


def ann_topk_lsh(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = ANN_PLANES,
    n_tables: int = ANN_TABLES,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k with the ORACLE-MIRRORABLE md5-plane LSH — the
    registered ANN operator (the crossJoin ``brute_force_topk`` is the
    test-side recall reference only, the same split as
    ``neardup_pairs_lsh`` vs ``embedding_neardup_bruteforce``).

    The expensive codes relation (n_tables plane-fold dots per vector) is
    computed ONCE: instead of a codes⨝codes self-join (which plans the
    md5-plane aggregation subtree twice, once per side), each bucket is
    grouped into a member array with its resident query ids flagged, and
    candidates come from a double explode of (queries × members) within
    the bucket — identical candidate set, half the code-derivation cost,
    and still never a CartesianProduct (asserted in tests/test_plans.py).
    Per-bucket arrays are bounded by bucket size = N / 2^n_planes per
    table; at 10^10 rows raise ``n_planes`` (and tables with it) so the
    bucket granularity tracks N — the same degenerate-bucket dial as
    ``dedupe.max_bucket_size``. Only bucket-co-resident pairs pay the
    exact ordered-fold cosine. Recall vs brute force is measured in
    tests/test_similarity.py (>=0.9 floor; 0.970 at the defaults), not
    assumed.

    Output: (query_id, neighbor_id, rnk) — rnk by (cosine desc, id), may
    yield < k rows for a query whose buckets are sparse (oracle agrees)."""
    codes = md5_lsh_codes(vectors, n_planes, n_tables, id_col, emb_col)
    qids = queries.select(F.col(id_col)).withColumn("_isq", F.lit(1))
    marked = codes.join(qids, id_col, "left")
    grp = (
        marked.groupBy("bucket")
        .agg(
            F.collect_list(
                F.when(F.col("_isq") == 1, F.col(id_col))
            ).alias("_qs"),
            F.collect_list(F.col(id_col)).alias("_members"),
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
        F.col(id_col), F.col(emb_col), norm_col(F.col(emb_col)).alias("nr")
    )
    pair = cand.join(
        vn.select(
            F.col(id_col).alias("query_id"),
            F.col(emb_col).alias("emb_q"),
            F.col("nr").alias("norm_q"),
        ),
        "query_id",
    ).join(
        vn.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(emb_col).alias("emb_v"),
            F.col("nr").alias("norm_v"),
        ),
        "neighbor_id",
    )
    scored = pair.withColumn(
        "cosine", dot_cols("emb_q", "emb_v") / (F.col("norm_q") * F.col("norm_v"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "rnk")
    )


def ann_topk_oracle_sql(
    k: int = 5,
    query_every: int = 50,
    n_planes: int = ANN_PLANES,
    n_tables: int = ANN_TABLES,
) -> str:
    """DuckDB oracle for ``ann_topk_lsh`` with queries = vec_id %
    query_every == 0 — identical md5-plane bucket math and element-ordered
    float folds as ``neardup_oracle_sql``, then the top-k window."""
    return f"""
    WITH ex AS (SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
           FROM embeddings, LATERAL unnest(generate_series(1, len(embedding))) AS t(i)),
    dims AS (SELECT DISTINCT i AS j FROM ex),
    planes AS (
      SELECT t, p, j,
             (CAST(concat('0x', substr(md5(concat(t, '|', p, '|', j)), 1, 8)) AS BIGINT)
              % 1000001) / 500000.0 - 1.0 AS w
      FROM generate_series(0, {n_tables - 1}) AS tt(t),
           generate_series(0, {n_planes - 1}) AS pp(p),
           dims),
    nrm AS (SELECT vec_id, sqrt(sum(x * x ORDER BY i)) AS nr FROM ex GROUP BY vec_id),
    dots AS (SELECT e.vec_id, pl.t, pl.p, sum(e.x * pl.w ORDER BY e.i) AS d
             FROM ex e JOIN planes pl ON pl.j = e.i
             GROUP BY e.vec_id, pl.t, pl.p),
    codes AS (SELECT vec_id, t,
                     sum(CASE WHEN d > 0 THEN (1::BIGINT << p) ELSE 0 END)
                       + (t::BIGINT << {n_planes}) AS bucket
              FROM dots GROUP BY vec_id, t),
    cand AS (SELECT DISTINCT q.vec_id AS query_id, v.vec_id AS neighbor_id
             FROM codes q JOIN codes v
               ON q.bucket = v.bucket AND q.vec_id != v.vec_id
             WHERE q.vec_id % {query_every} = 0),
    dotp AS (SELECT c.query_id, c.neighbor_id, sum(ea.x * eb.x ORDER BY ea.i) AS dot
             FROM cand c
             JOIN ex ea ON ea.vec_id = c.query_id
             JOIN ex eb ON eb.vec_id = c.neighbor_id AND eb.i = ea.i
             GROUP BY c.query_id, c.neighbor_id),
    scored AS (SELECT query_id, neighbor_id, dot / (na.nr * nb.nr) AS c
               FROM dotp JOIN nrm na ON na.vec_id = query_id
                         JOIN nrm nb ON nb.vec_id = neighbor_id)
    SELECT query_id, neighbor_id, CAST(rnk AS INT) AS rnk
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY c DESC, neighbor_id) AS rnk
          FROM scored)
    WHERE rnk <= {k}
    """


def brute_force_topk_numpy(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """BLAS-kernel variant: broadcast the query matrix, one numpy matmul
    per Arrow batch. Same (query_id, neighbor_id, rnk) contract as
    brute_force_topk except scores are float32-accumulated — used for
    throughput benchmarking."""
    spark = vectors.sparkSession
    qrows = queries.select(id_col, emb_col).collect()
    qids = np.array([r[0] for r in qrows])
    qm = np.stack([np.asarray(r[1], dtype=np.float64) for r in qrows])
    qn = qm / np.linalg.norm(qm, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((qids, qn))

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qids_, qn_ = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            vm = np.stack(pdf[emb_col].map(lambda e: np.asarray(e, np.float64)))
            vn = vm / np.linalg.norm(vm, axis=1, keepdims=True)
            sims = qn_ @ vn.T  # (Q, B)
            nid = pdf[id_col].to_numpy()
            out = {
                "query_id": np.repeat(qids_, len(nid)),
                "neighbor_id": np.tile(nid, len(qids_)),
                "cosine": sims.ravel(),
            }
            yield pd.DataFrame(out)

    scored = vectors.select(id_col, emb_col).mapInPandas(
        score, schema="query_id long, neighbor_id long, cosine double"
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "rnk")
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the coarse-quantizer scale path
# ---------------------------------------------------------------------------
# Deterministic, oracle-mirrorable IVF: centroids are the n_centroids
# corpus vectors with the smallest md5(vec_id) (a seedless pseudo-random
# sample both engines can reproduce — the same md5 trick as the LSH
# planes), every vector joins the inverted list of its nearest centroid,
# and a query probes its n_probe nearest lists. Unlike LSH (which needs
# no training but pays multi-table code derivation), IVF pays one
# N×C broadcast nested-loop assignment and then each query scans
# ~n_probe/C of the corpus — the classic FAISS IVF-flat trade
# (Johnson et al., "Billion-scale similarity search with GPUs").
IVF_CENTROIDS = 16
IVF_PROBE = 4


def ivf_centroids(
    vectors: DataFrame,
    n_centroids: int = IVF_CENTROIDS,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """The deterministic coarse quantizer: corpus vectors ordered by
    md5(id). At 10^10 rows this is a TakeOrdered over a one-column
    projection — no shuffle of the embeddings themselves."""
    return (
        vectors.select(
            F.col(id_col).alias("cid"),
            F.col(emb_col).alias("emb_c"),
            norm_col(F.col(emb_col)).alias("norm_c"),
        )
        .orderBy(F.md5(F.col("cid").cast("string")), "cid")
        .limit(n_centroids)
    )


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = IVF_CENTROIDS,
    n_probe: int = IVF_PROBE,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """IVF-flat approximate top-k. Output contract identical to
    ``ann_topk_lsh``: (query_id, neighbor_id, rnk), rnk by (cosine desc,
    neighbor id), possibly < k rows for sparse probes.

    Scale shape: the assignment is a BROADCAST nested-loop against C
    centroid rows (never a shuffle of the 10^10-row corpus) followed by a
    map-side-combinable ``max_by`` per vector — each vector's C candidate
    rows are produced inside one partition, so the argmin aggregation is
    a near-zero-byte exchange. Candidates come from an equi-join on the
    centroid id (each vector lives in exactly ONE list, so no distinct is
    needed), and only probed-list members pay the exact ordered-fold
    cosine. At 10^10 raise n_centroids ~ √N and materialize the corpus
    with ``ivf_write_bucketed`` (partitioned by ``cid``) so probes prune
    at file listing via ``ivf_topk_bucketed`` — same listing-time method
    as the frontier's lineage buckets (tests/test_ivf_bucketed.py)."""
    cents = F.broadcast(ivf_centroids(vectors, n_centroids, id_col, emb_col))
    vn = vectors.select(
        F.col(id_col), F.col(emb_col), norm_col(F.col(emb_col)).alias("nr")
    )
    sim = vn.crossJoin(cents).withColumn(
        "cs", dot_cols(emb_col, "emb_c") / (F.col("nr") * F.col("norm_c"))
    )
    # nearest centroid, ties broken toward the smaller cid (max of the
    # (cs, -cid) struct) — partial-aggregable, unlike a row_number window
    assign = sim.groupBy(id_col).agg(
        F.max_by("cid", F.struct(F.col("cs"), (-F.col("cid")))).alias("cid")
    )
    # query-side centroid similarities: semi-join FIRST, then the C-way
    # expansion — dotting N×C rows just to keep N/query_every of them
    # would run the corpus-wide pass a second time (the `sim` subtree is
    # not persisted, so its two consumers each rebuild it)
    qsim = (
        vn.join(queries.select(id_col), id_col, "left_semi")
        .crossJoin(cents)
        .withColumn(
            "cs", dot_cols(emb_col, "emb_c") / (F.col("nr") * F.col("norm_c"))
        )
    )
    wq = W.partitionBy(id_col).orderBy(F.col("cs").desc(), F.col("cid"))
    probes = (
        qsim.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= n_probe)
        .select(F.col(id_col).alias("query_id"), "cid")
    )
    cand = probes.join(
        assign.select(F.col(id_col).alias("neighbor_id"), "cid"), "cid"
    ).filter(F.col("query_id") != F.col("neighbor_id")).select(
        "query_id", "neighbor_id"
    )
    pair = cand.join(
        vn.select(
            F.col(id_col).alias("query_id"),
            F.col(emb_col).alias("emb_q"),
            F.col("nr").alias("norm_q"),
        ),
        "query_id",
    ).join(
        vn.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(emb_col).alias("emb_v"),
            F.col("nr").alias("norm_v"),
        ),
        "neighbor_id",
    )
    scored = pair.withColumn(
        "cosine", dot_cols("emb_q", "emb_v") / (F.col("norm_q") * F.col("norm_v"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "rnk")
    )


def ivf_topk_oracle_sql(
    k: int = 5,
    query_every: int = 50,
    n_centroids: int = IVF_CENTROIDS,
    n_probe: int = IVF_PROBE,
) -> str:
    """DuckDB oracle for ``ivf_topk`` with queries = vec_id % query_every
    == 0 — identical md5-ordered centroid pick, element-ordered float
    folds, (cs desc, cid) tie-breaks, then the top-k window."""
    return f"""
    WITH ex AS (SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
           FROM embeddings, LATERAL unnest(generate_series(1, len(embedding))) AS t(i)),
    nrm AS (SELECT vec_id, sqrt(sum(x * x ORDER BY i)) AS nr FROM ex GROUP BY vec_id),
    cents AS (SELECT vec_id AS cid FROM embeddings
              ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {n_centroids}),
    cdot AS (SELECT e.vec_id, c.cid, sum(e.x * ec.x ORDER BY e.i) AS dot
             FROM ex e JOIN cents c ON TRUE
             JOIN ex ec ON ec.vec_id = c.cid AND ec.i = e.i
             GROUP BY e.vec_id, c.cid),
    csim AS (SELECT d.vec_id, d.cid, d.dot / (nv.nr * nc.nr) AS cs
             FROM cdot d JOIN nrm nv ON nv.vec_id = d.vec_id
                         JOIN nrm nc ON nc.vec_id = d.cid),
    assign AS (SELECT vec_id, cid FROM (
                 SELECT vec_id, cid,
                        row_number() OVER (PARTITION BY vec_id
                                           ORDER BY cs DESC, cid) AS rn
                 FROM csim) WHERE rn = 1),
    probes AS (SELECT vec_id AS query_id, cid FROM (
                 SELECT vec_id, cid,
                        row_number() OVER (PARTITION BY vec_id
                                           ORDER BY cs DESC, cid) AS rn
                 FROM csim WHERE vec_id % {query_every} = 0)
               WHERE rn <= {n_probe}),
    cand AS (SELECT p.query_id, a.vec_id AS neighbor_id
             FROM probes p JOIN assign a ON a.cid = p.cid
             WHERE a.vec_id != p.query_id),
    dotp AS (SELECT c.query_id, c.neighbor_id,
                    sum(ea.x * eb.x ORDER BY ea.i) AS dot
             FROM cand c
             JOIN ex ea ON ea.vec_id = c.query_id
             JOIN ex eb ON eb.vec_id = c.neighbor_id AND eb.i = ea.i
             GROUP BY c.query_id, c.neighbor_id),
    scored AS (SELECT query_id, neighbor_id, dot / (na.nr * nb.nr) AS c
               FROM dotp JOIN nrm na ON na.vec_id = query_id
                         JOIN nrm nb ON nb.vec_id = neighbor_id)
    SELECT query_id, neighbor_id, CAST(rnk AS INT) AS rnk
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY c DESC, neighbor_id) AS rnk
          FROM scored)
    WHERE rnk <= {k}
    """


# ---------------------------------------------------------------------------
# IVF at scale: cid-bucketed corpus materialization + probe-side file pruning
# (the "bucket the corpus table by cid so probes prune at file listing" knob
# ivf_topk's docstring promises — same listing-time method as the frontier's
# _dbucket delta partitions, plans/epoch._read_frontier_state).


def _ivf_assign(vn: DataFrame, cents: DataFrame, id_col: str, emb_col: str) -> DataFrame:
    """(id → nearest-centroid cid): broadcast nested-loop against the C
    centroid rows, then a map-side-combinable max_by argmin — the corpus
    is never shuffled (same shape as ivf_topk's inline assignment)."""
    sim = vn.crossJoin(F.broadcast(cents)).withColumn(
        "cs", dot_cols(emb_col, "emb_c") / (F.col("nr") * F.col("norm_c"))
    )
    return sim.groupBy(id_col).agg(
        F.max_by("cid", F.struct(F.col("cs"), (-F.col("cid")))).alias("cid")
    )


def ivf_write_bucketed(
    vectors: DataFrame,
    path: str,
    n_centroids: int = IVF_CENTROIDS,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> None:
    """Materialize the IVF index on disk in its 10^10 shape:

    * ``path/lists`` — (id, embedding, nr, cid) partitioned BY cid, one
      inverted list per ``cid=K`` directory, so a probe constructs its
      scan from exactly the probed directories and untouched lists are
      never even listed (file-listing pruning, not a post-scan filter);
    * ``path/centroids`` — the C coarse-quantizer rows (cid, emb_c,
      norm_c), re-read and broadcast at probe time.

    The repartition keys one task per list (C tasks) — at 10^10 rows with
    C ~ √N lists each holds ~√N vectors; a hot list splits across files
    by maxRecordsPerFile if needed, which keeps the listing-time pruning
    property."""
    import os

    cents = ivf_centroids(vectors, n_centroids, id_col, emb_col)
    vn = vectors.select(
        F.col(id_col), F.col(emb_col), norm_col(F.col(emb_col)).alias("nr")
    )
    assign = _ivf_assign(vn, cents, id_col, emb_col)
    (
        vn.join(assign, id_col)
        .repartition(n_centroids, "cid")
        .write.partitionBy("cid")
        .parquet(os.path.join(path, "lists"))
    )
    cents.write.parquet(os.path.join(path, "centroids"))


def ivf_read_lists(spark, path: str, cids: list[int]) -> DataFrame:
    """Scan ONLY the given inverted lists: the scan is built from explicit
    ``cid=K`` paths (with basePath so cid stays a column) — O(probed
    lists) files by construction. A post-scan .isin filter would list the
    whole corpus first; this never does."""
    import os

    lists_root = os.path.join(path, "lists")
    sub = [
        os.path.join(lists_root, f"cid={c}")
        for c in sorted({int(c) for c in cids})
        if os.path.isdir(os.path.join(lists_root, f"cid={c}"))
    ]
    if not sub:  # no probed list materialized → empty frame, full schema
        return spark.read.parquet(lists_root).limit(0)
    return spark.read.option("basePath", lists_root).parquet(*sub)


def ivf_topk_bucketed(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = IVF_PROBE,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """``ivf_topk`` against the on-disk bucketed index: identical output
    contract (query_id, neighbor_id, rnk) and identical results for the
    same corpus/centroids (pinned in tests/test_ivf_bucketed.py), but the
    corpus scan touches only the probed ``cid=K`` directories.

    ``queries`` must carry (id_col, emb_col). The only collect is the
    distinct probed-cid set — ≤ C ints (C ~ √N at scale: driver-bounded,
    it is the path list for the pruned scan)."""
    import os

    cents = F.broadcast(spark.read.parquet(os.path.join(path, "centroids")))
    qn = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(emb_col).alias("emb_q"),
        norm_col(F.col(emb_col)).alias("norm_q"),
    )
    qsim = qn.crossJoin(cents).withColumn(
        "cs", dot_cols("emb_q", "emb_c") / (F.col("norm_q") * F.col("norm_c"))
    )
    wq = W.partitionBy("query_id").orderBy(F.col("cs").desc(), F.col("cid"))
    probes = (
        qsim.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= n_probe)
        .select("query_id", "cid", "emb_q", "norm_q")
    )
    probed = [int(r.cid) for r in probes.select("cid").distinct().collect()]
    members = ivf_read_lists(spark, path, probed).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(emb_col).alias("emb_v"),
        F.col("nr").alias("norm_v"),
        "cid",
    )
    pair = probes.join(members, "cid").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    scored = pair.withColumn(
        "cosine", dot_cols("emb_q", "emb_v") / (F.col("norm_q") * F.col("norm_v"))
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "rnk")
    )
