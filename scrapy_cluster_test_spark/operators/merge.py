"""MERGE INTO emulation: keyed upsert as a DataFrame transform.

Reference: Mongo `update_one({key}, {"$set": item}, upsert=True)` and
`$setOnInsert` bulk upserts (pipelines.py:380-447 → SURVEY K1/K2/J6).
Iceberg/Delta would execute `MERGE INTO` directly; on plain parquet the
same semantics compose from an anti-join + union (+ a first-wins window
when the update batch itself may contain duplicate keys).

All three reference flavors:
* ``upsert``            — WHEN MATCHED UPDATE, WHEN NOT MATCHED INSERT (K1)
* ``insert_if_absent``  — WHEN NOT MATCHED INSERT ($setOnInsert, K2/D6)
* ``update_matched``    — WHEN MATCHED UPDATE only (mark-done K4)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def _dedup_updates(updates: DataFrame, keys: list[str], order: list[str]) -> DataFrame:
    """Last-wins (by ``order`` desc) dedup of the update batch — the
    bulk_write(ordered=False) equivalent needs a deterministic winner."""
    w = W.partitionBy(*keys).orderBy(*[F.col(c).desc() for c in order])
    return (
        updates.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def upsert(
    target: DataFrame, updates: DataFrame, keys: list[str], order: list[str]
) -> DataFrame:
    """WHEN MATCHED UPDATE (replace row), WHEN NOT MATCHED INSERT."""
    u = _dedup_updates(updates.select(*target.columns), keys, order)
    kept = target.join(u.select(*keys), keys, "left_anti")
    return kept.unionByName(u)


def insert_if_absent(
    target: DataFrame, inserts: DataFrame, keys: list[str], order: list[str]
) -> DataFrame:
    """WHEN NOT MATCHED INSERT — existing rows win (idempotent push)."""
    i = _dedup_updates(inserts.select(*target.columns), keys, order)
    fresh = i.join(target.select(*keys), keys, "left_anti")
    return target.unionByName(fresh)


def update_matched(
    target: DataFrame,
    updates: DataFrame,
    keys: list[str],
    set_cols: list[str],
) -> DataFrame:
    """WHEN MATCHED UPDATE SET col=... — non-key columns of matching rows
    replaced from ``updates``; unmatched target rows unchanged."""
    u = updates.select(*keys, *[F.col(c).alias(f"_new_{c}") for c in set_cols])
    joined = target.join(u, keys, "left")
    out = joined
    for c in set_cols:
        out = out.withColumn(c, F.coalesce(F.col(f"_new_{c}"), F.col(c)))
    return out.drop(*[f"_new_{c}" for c in set_cols])
