"""Parquet table registry for the driver-provided TPC-H-ish testdata.

Reference parallel: the Mongo collections the read API queries
(api/app/main.py:97-657). Here every table is a parquet scan — Catalyst gets
predicate pushdown + column pruning for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_spread(
    spark: SparkSession, sf_dir: str, name: str, key: str
) -> DataFrame:
    """``load`` + hash-repartition to defaultParallelism, for queries whose
    MAP stage is CPU-heavy (regex/md5/JSON-parse per row).

    Why (guide §2.5 input skew / §6.1): the driver-provided tables are
    single parquet files with 1-6 row groups, and a parquet split never
    subdivides a row group — so however small maxPartitionBytes /
    openCostInBytes make the splits, at most #row-groups tasks do real
    work and a heavy map stage runs near-serial on 32 cores. One cheap
    exchange of the scanned bytes buys full-cluster parallelism for the
    expensive stage. Hash partitioning on the (unique) id key spreads
    evenly and — unlike round-robin — needs no sort-before-repartition
    pass and stays deterministic under task retry (guide §2.5).
    defaultParallelism tracks the cluster size, so nothing here is tuned
    to local[32]. Do NOT use for cheap projections/scans: there the
    exchange costs more than it saves."""
    return load(spark, sf_dir, name).repartition(
        spark.sparkContext.defaultParallelism, key
    )


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql use."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
