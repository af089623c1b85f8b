"""S8 proxy-token lease lifecycle (kafka_monitor/main.py:29-58;
release pipelines.py:391-403)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scrapy_cluster_test_spark.operators import proxies as px

PATH = "/tmp/sct_proxies_test"


def _seed(spark, rows):
    spark.createDataFrame(rows, "token string, provider string, in_used boolean") \
        .coalesce(1).write.mode("overwrite").parquet(PATH)


def _state(spark):
    return {
        r["token"]: r["in_used"]
        for r in spark.read.parquet(PATH).collect()
    }


def test_lease_release_cycle(spark):
    _seed(spark, [
        ("t1", "crawlera", False), ("t2", "crawlera", False),
        ("t3", "proxycrawl", False), ("t4", "proxycrawl_js", True),
        ("t5", "proxycrawl_js", False),
    ])
    tokens = px.lease_tokens(spark, PATH)
    # first free token per provider, min(token) first — and t4 (busy) skipped
    assert tokens == {"crawlera": "t1", "proxycrawl": "t3", "proxycrawl_js": "t5"}
    st = _state(spark)
    assert st == {"t1": True, "t2": False, "t3": True, "t4": True, "t5": True}
    # a second lease while the first is outstanding takes the NEXT tokens
    with pytest.raises(RuntimeError, match="proxycrawl"):
        px.lease_tokens(spark, PATH)  # proxycrawl/js exhausted
    px.release_tokens(spark, PATH, tokens)
    st = _state(spark)
    assert st == {"t1": False, "t2": False, "t3": False, "t4": True, "t5": False}


def test_exhaustion_raises(spark):
    _seed(spark, [("t1", "crawlera", False)])
    with pytest.raises(RuntimeError):
        px.lease_tokens(spark, PATH)


def test_stale_lock_of_dead_holder_is_broken(spark):
    """A writer that died between _rewrite's renames strands BOTH the
    half-swapped table AND its lock file — the next lease must break the
    dead holder's lock, run _repair, and proceed (ADVICE r3: the repair
    path was unreachable behind the stranded lock)."""
    import os, subprocess, sys

    _seed(spark, [
        ("t1", "crawlera", False), ("t2", "proxycrawl", False),
        ("t3", "proxycrawl_js", False),
    ])
    # a real (then dead) process wrote the lock, as a crashed holder would
    proc = subprocess.run(
        [sys.executable, "-c", "import os; print(os.getpid())"],
        capture_output=True, text=True,
    )
    dead_pid = int(proc.stdout.strip())
    with open(PATH + ".lock", "w") as f:
        f.write(str(dead_pid))
    # and died mid-swap: table dir gone, ._old still present
    os.rename(PATH, PATH + "._old")
    tokens = px.lease_tokens(spark, PATH)
    assert tokens == {"crawlera": "t1", "proxycrawl": "t2", "proxycrawl_js": "t3"}
    assert not os.path.exists(PATH + ".lock")
    assert not os.path.exists(PATH + "._old")


def test_live_lock_is_honored(spark):
    """A lock held by a LIVE process times out instead of being broken."""
    import os

    _seed(spark, [("t1", "crawlera", False)])
    with open(PATH + ".lock", "w") as f:
        f.write(str(os.getpid()))  # this very process: definitely alive
    try:
        with pytest.raises(TimeoutError, match="live process"):
            with px._table_lock(PATH, timeout_s=0.3):
                pass
    finally:
        os.unlink(PATH + ".lock")
