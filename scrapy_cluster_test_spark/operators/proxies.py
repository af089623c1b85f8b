"""Proxy-token lease/release (SURVEY S8) as dataflow over a config table.

Reference: kafka_monitor/main.py:29-58 polls the ``proxies`` collection
for one free token per provider (crawlera / proxycrawl / proxycrawl_js),
marks the winners ``in_used``; pipelines.py:391-403 clears the flag when
the spider closes. Here the table is a tiny parquet config relation and
the lease is one window query + a MERGE-style rewrite — the whole
transition is expressible in SQL (driver oracle:
catalog ``proxy_token_lease``), and the table is small by construction
(tokens, not URLs), so a full rewrite per lease IS the scale-correct
plan.
"""

from __future__ import annotations

import contextlib
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from .. import locking

PROVIDERS = ("crawlera", "proxycrawl", "proxycrawl_js")


def mark_lease(proxies: DataFrame, providers: tuple[str, ...] = PROVIDERS) -> DataFrame:
    """Pure transition: pick the FIRST free token per provider (the
    reference walks the cursor and keeps the first match per provider —
    deterministic here as min(token)) and flag it leased.

    Output = input columns + ``leased`` (this call's winners) +
    ``in_used_after``."""
    # rank within (provider, in_used) so busy rows never shift the free
    # rows' numbering — rk=1 among the free rows IS the reference's
    # first-cursor-match winner
    free_rank = F.row_number().over(
        W.partitionBy("provider", "in_used").orderBy("token")
    )
    ranked = proxies.withColumn(
        "_rk", F.when(~F.col("in_used"), free_rank).otherwise(F.lit(None))
    )
    leased = (F.col("_rk") == 1) & F.col("provider").isin(*providers)
    return ranked.select(
        "*",
        F.coalesce(leased, F.lit(False)).alias("leased"),
        (F.col("in_used") | F.coalesce(leased, F.lit(False))).alias("in_used_after"),
    ).drop("_rk")


def lease_tokens(
    spark: SparkSession,
    proxies_path: str,
    providers: tuple[str, ...] = PROVIDERS,
    retries: int = 0,
    sleep_s: float = 0.0,
) -> dict[str, str]:
    """Lease one token per provider, persisting the ``in_used`` flags.

    Mirrors the reference's wait loop (PROXY_SLEEP_RETRY): if any provider
    has no free token, retry up to ``retries`` times then raise. Returns
    {provider: token}.

    The read-modify-write is guarded by an advisory lock file so two
    concurrent jobs cannot both lease the same free token (the reference
    gets this from Mongo's per-document atomicity; parquet has none)."""
    for attempt in range(retries + 1):
        with _table_lock(proxies_path):
            _repair(proxies_path)
            cur = spark.read.parquet(proxies_path)
            out = mark_lease(cur, providers)
            winners = {
                r["provider"]: r["token"]
                for r in out.filter("leased").select("provider", "token").collect()
            }
            if all(p in winners for p in providers):
                nxt = out.select(
                    "token", "provider", F.col("in_used_after").alias("in_used")
                )
                _rewrite(spark, nxt, proxies_path)
                return winners
        if attempt < retries:
            time.sleep(sleep_s)
    missing = [p for p in providers if p not in winners]
    raise RuntimeError(f"no free proxy token for provider(s): {missing}")


def release_tokens(
    spark: SparkSession, proxies_path: str, tokens: dict[str, str]
) -> None:
    """Clear ``in_used`` for the leased tokens (pipelines.py:391-403)."""
    with _table_lock(proxies_path):
        _repair(proxies_path)
        cur = spark.read.parquet(proxies_path)
        vals = set(tokens.values())
        nxt = cur.withColumn(
            "in_used",
            F.when(F.col("token").isin(*vals), F.lit(False)).otherwise(
                F.col("in_used")
            ),
        )
        _rewrite(spark, nxt, proxies_path)


@contextlib.contextmanager
def _table_lock(path: str, timeout_s: float = 30.0, poll_s: float = 0.05):
    """Writer lease for the lease/release read-modify-write — the shared
    PID lock (locking.pid_lock): dead holders are broken (the crash
    _repair recovers from — a writer dying between _rewrite's renames —
    is exactly the crash that strands its lock file), live holders are
    honored until the timeout (the table auto-repairs on rerun)."""
    with locking.pid_lock(
        path, timeout_s=timeout_s, poll_s=poll_s, what="proxies table"
    ) as lock:
        yield lock


def _repair(path: str) -> None:
    """Recover a crash between _rewrite's two renames: if the table dir is
    missing but ``._old`` survives, the writer died mid-swap — restore the
    previous version (the new one, if fully written, is still in ``._next``
    and the interrupted operation simply never happened)."""
    old = path.rstrip("/") + "._old"
    if not os.path.isdir(path) and os.path.isdir(old):
        os.rename(old, path)


def _rewrite(spark: SparkSession, df: DataFrame, path: str) -> None:
    """Atomic-enough small-table rewrite: write aside, swap directories.
    ``._old`` is kept until the new version is in place, so a crash at any
    point leaves either the old or the new table recoverable (_repair).
    (The proxies table is O(tokens) — on a cluster this is one Iceberg
    row-level UPDATE; a full rewrite of a KB-sized config table is the
    same cost.)"""
    import shutil

    tmp = path.rstrip("/") + "._next"
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)
    df.coalesce(1).write.parquet(tmp)
    old = path.rstrip("/") + "._old"
    if os.path.isdir(old):
        shutil.rmtree(old)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
