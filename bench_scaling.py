"""Two-parallelism scaling benchmark (BASELINE.json scaling criterion).

No multi-node cluster exists in this sandbox, so the N→4N-executor
criterion is evidenced per BASELINE.md's protocol: the IDENTICAL crawl job
runs at local[8] and local[32] on the same input; we report URLs
scheduled+fetched/sec at both plus efficiency = (rate_32 / rate_8) / 4,
and assert the two runs fetched the same URL count (determinism across
parallelism).

Each parallelism level runs in a fresh subprocess (own JVM) so nothing is
shared. Two modes:
* sched  — scheduler-only epochs (pop/dedup/merge; payload column pruned)
* decode — adds payload decode + PSNR verification per fetched page
           (compute-heavy fetch, the realistic image-pipeline shape)

Usage: python bench_scaling.py [--n-images 30000] [--mode both]
Writes results into BENCH/scaling_<mode>.json; BENCH/BASELINE.md is the
human-readable summary.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
UNIVERSE = "/tmp/sct_bench_universe"

_WORKER = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from scrapy_cluster_test_spark.session import get_spark
from scrapy_cluster_test_spark import datagen
from scrapy_cluster_test_spark.plans import epoch as ep

cores = {cores}
mode = {mode!r}
n_images = {n_images}
universe = {universe!r}
budget_scale = {budget_scale}

spark = get_spark(f"sct-bench-{{cores}}", cores=cores)
if not os.path.exists(os.path.join(universe, "robots.parquet")):
    datagen.generate_all(spark, universe, n_images=n_images, n_seeds=500,
                         budget_scale=budget_scale)

job = f"/tmp/sct_bench_job_c{{cores}}_{{mode}}"
p = ep.CrawlParams(
    images_path=f"{{universe}}/images.parquet",
    seeds_path=f"{{universe}}/seeds.parquet",
    domains_path=f"{{universe}}/domains.parquet",
    robots_path=f"{{universe}}/robots.parquet",
    job_dir=job, n_images=n_images,
    seller_cap=500000, asin_cap=500000, max_epochs=30, use_bloom=True)
t0 = time.perf_counter()
summary = ep.run_crawl(spark, p, resume=False)
wall = time.perf_counter() - t0

extra = {{}}
if mode == "decode":
    from scrapy_cluster_test_spark.operators import multimodal
    from pyspark.sql import functions as F
    log = ep.read_crawl_log(spark, job).select("image_id").distinct()
    images = spark.read.parquet(f"{{universe}}/images.parquet")
    t1 = time.perf_counter()
    fetched_imgs = images.join(log, "image_id", "left_semi")
    res = multimodal.verify_payloads(fetched_imgs)
    bad = res.filter((F.col("psnr_db") < 40.0) | ~F.col("caption_ok")).count()
    n_dec = res.count()
    dwall = time.perf_counter() - t1
    wall += dwall
    extra = {{"decoded": n_dec, "decode_sec": round(dwall, 2), "bad": bad}}

print("RESULT " + json.dumps({{
    "cores": cores, "mode": mode, "epochs": summary["epochs"],
    "fetched": summary["total_fetched"], "wall_sec": round(wall, 2),
    "urls_per_sec": round(summary["total_fetched"] / wall, 1), **extra}}))
spark.stop()
"""


def run_level(cores: int, mode: str, n_images: int, budget_scale: float) -> dict:
    code = _WORKER.format(
        repo=REPO,
        cores=cores,
        mode=mode,
        n_images=n_images,
        universe=UNIVERSE,
        budget_scale=budget_scale,
    )
    t0 = time.time()
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=3600,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            r = json.loads(line[len("RESULT "):])
            r["subprocess_sec"] = round(time.time() - t0, 1)
            return r
    raise RuntimeError(f"no RESULT line (rc={out.returncode}):\n{out.stdout[-2000:]}\n{out.stderr[-3000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-images", type=int, default=150000)
    ap.add_argument("--mode", choices=["sched", "decode", "both"], default="both")
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    # politeness budgets scaled up for the bench so epochs are few and fat
    # (per-epoch fixed latency amortizes over real work, as it would at
    # 10^10 where an epoch pops millions of URLs)
    ap.add_argument("--budget-scale", type=float, default=50.0)
    args = ap.parse_args()

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    modes = ["sched", "decode"] if args.mode == "both" else [args.mode]
    for mode in modes:
        lo = run_level(args.low, mode, args.n_images, args.budget_scale)
        hi = run_level(args.high, mode, args.n_images, args.budget_scale)
        assert lo["fetched"] == hi["fetched"], (
            f"determinism violation: {lo['fetched']} != {hi['fetched']}"
        )
        eff = (hi["urls_per_sec"] / lo["urls_per_sec"]) / (args.high / args.low)
        result = {
            "mode": mode,
            "n_images": args.n_images,
            "low": lo,
            "high": hi,
            "scaling_efficiency": round(eff, 3),
            "fetched_equal": True,
        }
        path = os.path.join(REPO, "BENCH", f"scaling_{mode}.json")
        with open(path, "w") as f:
            json.dump(result, f, indent=2)
        print(json.dumps(result))


if __name__ == "__main__":
    main()
