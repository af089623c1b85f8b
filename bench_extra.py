"""Extra benchmarks for optimization work (guide §1.4): per-query noop-sink
isolation + .explain("formatted") capture. Does NOT replace bench.py (frozen
for measurement); numbers from here are cited in OPTIMIZATION_r06.md.

Usage:
  python bench_extra.py [query ...]           # time listed queries (all if none)
  SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py ...
  SPARK_GRAFT_EXPLAIN_DIR=plans/r06 SPARK_GRAFT_EXPLAIN_SUFFIX=_before \
      python bench_extra.py embedding_neardup_pairs   # also dump plans
"""

from __future__ import annotations

import contextlib
import io
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
    explain_dir = os.environ.get("SPARK_GRAFT_EXPLAIN_DIR")
    suffix = os.environ.get("SPARK_GRAFT_EXPLAIN_SUFFIX", "")
    passes = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "1"))
    spark = get_spark("sct-spark-bench-extra", cores=cores)
    # same session warmup as bench.py so pass-1 numbers are comparable
    spark.sql(
        "SELECT id, aggregate(array(id, id), 0L, (a, x) -> a + x) s, "
        "row_number() OVER (PARTITION BY id % 4 ORDER BY id) rn "
        "FROM range(1000)"
    ).groupBy("rn").count().count()

    cat = catalog()
    names = sys.argv[1:] or sorted(cat)
    out: dict[str, list[float]] = {}
    for name in names:
        entry = cat[name]
        if explain_dir:
            os.makedirs(explain_dir, exist_ok=True)
            df = entry.builder(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(explain_dir, f"{name}{suffix}.txt"), "w") as f:
                f.write(buf.getvalue())
        ts = []
        mode = os.environ.get("SPARK_GRAFT_BENCH_MODE", "noop")
        for _ in range(passes):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.perf_counter()
            df = entry.builder(spark, sf_dir)
            if mode == "count":  # the frozen bench.py's timing action
                df.count()
            else:
                df.write.format("noop").mode("overwrite").save()
            ts.append(round(time.perf_counter() - t0, 2))
            spark.sparkContext.setJobDescription(None)
        out[name] = ts
        print(f"{name}: {ts}", flush=True)
    print(json.dumps({"sf_dir": sf_dir, "cores": cores, "noop_sec": out}))
    spark.stop()


if __name__ == "__main__":
    main()
