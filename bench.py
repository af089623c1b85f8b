"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Each query is executed once to warm the JVM/scan caches? No — cold, single
pass, count() as the action (forces full plan, no driver collect cost).
The headline metric is total wall time over the suite; per-query seconds
are reported individually.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scrapy_cluster_test_spark.plans.catalog import catalog  # noqa: E402
from scrapy_cluster_test_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("sct-spark-bench", cores=cores)

    # Session warmup (NOT query warmup): the timed loop runs queries in
    # sorted-name order, so whichever query sorts first used to absorb
    # the one-time JVM/codegen/Arrow session costs (~3-4 s) and read as
    # the "slowest row" regardless of its own merit (r3's
    # ann_cosine_topk_lsh 11.03 s, later ann_cosine_topk_ivf 9.16 s —
    # both ~5 s standalone). Warm the generic machinery with a trivial
    # job exercising the same engine features (codegen, HOF expressions,
    # a window, a tiny shuffle) against NO benchmark table; every
    # query's own scans and plans below stay cold.
    spark.sql(
        "SELECT id, aggregate(array(id, id), 0L, (a, x) -> a + x) s, "
        "row_number() OVER (PARTITION BY id % 4 ORDER BY id) rn "
        "FROM range(1000)"
    ).groupBy("rn").count().count()

    timings: dict[str, float] = {}
    total = 0.0
    for name, entry in sorted(catalog().items()):
        t0 = time.perf_counter()
        entry.builder(spark, sf_dir).count()
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 2)
        total += dt

    out = {
        "metric": "catalog_suite_wall_seconds",
        "value": round(total, 2),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cores": cores,
    }
    # Headline crawl-engine numbers (full detail: BENCH/BASELINE.md +
    # BENCH/scaling_*.json, produced by bench_scaling.py). Kept to a few
    # scalars so the whole output stays ONE short parseable JSON line —
    # the driver only retains a bounded tail of stdout.
    bench_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH")
    try:
        with open(os.path.join(bench_dir, "scaling_kernel_3m_2v8.json")) as f:
            r = json.load(f)
        out["urls_per_sec"] = round(r["high"]["urls_per_sec"], 1)
        out["scaling_eff_n_to_4n"] = round(r["scaling_efficiency"], 2)
    except Exception:
        pass
    try:
        # full sched epochs (commit IO + bloom + metrics), delta mode
        with open(
            os.path.join(bench_dir, "scaling_sched_3m_s500_2v8_delta.json")
        ) as f:
            r = json.load(f)
        out["sched_urls_per_sec"] = round(r["high"]["urls_per_sec"], 1)
        out["sched_scaling_eff"] = round(r["scaling_efficiency"], 2)
    except Exception:
        pass
    print(json.dumps(out, separators=(",", ":")))
    spark.stop()


if __name__ == "__main__":
    main()
