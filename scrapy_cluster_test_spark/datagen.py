"""Deterministic synthetic table generation (FIXTURES.md), seed 42.

Distributed and partitioning-independent: every row is generated from a
per-row Philox keyed (SEED, i), via ``spark.range(N).mapInPandas`` — the
same bytes come out whether the range is split across 8 or 800 tasks.
This is the property that lets the 10^6-row bench table stand in for the
10^10 design point: generation is embarrassingly parallel with zero
shuffle.

Tables written under ``out_dir``:
* images.parquet  — the graft input shape (BASELINE.json input_hint)
* seeds.parquet   — seed URL list (analog of mongo_seed/init_autonomous.json)
* domains.parquet — politeness dimension (rates → per-epoch budgets)
* robots.parquet  — robots gating dimension (north rule Q13)
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from . import crawlspec as spec
from .functions.imagecodec import encode_image, phash64
from .functions.urlkit import py_canonicalize, py_url_fingerprint
from .schemas import DOMAINS, IMAGES, ROBOTS, SEEDS

_SIZES = (32, 64, 128)
_VOCAB = 1000


def _row_rng(i: int) -> np.random.Generator:
    return np.random.Generator(np.random.Philox(key=[spec.SEED, i]))


def make_image_row(i: int) -> dict:
    """One deterministic image row; pure function of i (given SEED)."""
    rng = _row_rng(i)
    w = _SIZES[i % 3]
    h = _SIZES[(i // 3) % 3]
    fmt = "png" if i % 2 == 0 else "jpeg"
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    toks = rng.integers(0, _VOCAB, 5 + i % 8)
    caption = f"caption {i}: " + " ".join(f"tok{t}" for t in toks)
    return {
        "image_id": f"img{i:010d}",
        "bytes": encode_image(img, fmt),
        "w": int(w),
        "h": int(h),
        "fmt": fmt,
        "caption": caption,
        "phash": phash64(img),
        "img_bucket": int(i % spec.N_IMG_BUCKETS),
    }


def _gen_images(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = [make_image_row(int(i)) for i in pdf["id"]]
        yield pd.DataFrame(rows)


def _gen_images_lite(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Payload-light variant for scheduler benchmarks: real schema, stub
    bytes, phash drawn from splitmix64 instead of pixels. Same crawl
    semantics (status codes / fan-out are functions of phash); decoded-
    payload invariants obviously don't apply — bench only, never tests."""
    for pdf in batches:
        i = pdf["id"].to_numpy(np.int64)
        ph = spec.mix64_np(i.astype(np.uint64) ^ np.uint64(0xBE9C4)).astype(np.int64)
        ids = "img" + pd.Series(i).astype(str).str.zfill(10)
        yield pd.DataFrame(
            {
                "image_id": ids,
                "bytes": [b"\x00stub"] * len(i),
                "w": np.full(len(i), 32, np.int32),
                "h": np.full(len(i), 32, np.int32),
                "fmt": ["png"] * len(i),
                "caption": "caption " + pd.Series(i).astype(str) + ":",
                "phash": ph,
                "img_bucket": (i % spec.N_IMG_BUCKETS).astype(np.int32),
            }
        )


def generate_images(
    spark: SparkSession, n: int, parallelism: int | None = None, lite: bool = False
) -> DataFrame:
    parallelism = parallelism or spark.sparkContext.defaultParallelism
    gen = _gen_images_lite if lite else _gen_images
    return spark.range(
        0, n, numPartitions=min(parallelism * 2, max(1, n // 50) or 1)
    ).mapInPandas(gen, schema=IMAGES)


def seed_rows(n_images: int, n_seeds: int) -> list[tuple[str, str, int]]:
    """Seed URL list; first-wins dedup by canonical fp (K2 idempotence).
    crawl_time = position in the deduped list (seed FIFO order)."""
    out: list[tuple[str, str, int]] = []
    seen: set[int] = set()
    for s in range(n_seeds):
        j = spec.seed_index(s, n_images)
        kind = spec.seed_kind(s)
        url = spec.page_url(kind, j)
        fp = py_url_fingerprint(py_canonicalize(url))
        if fp in seen:
            continue
        seen.add(fp)
        out.append((url, kind, len(out)))
    return out


def domain_rows(budget_scale: float = 1.0) -> list[tuple[str, int, int, int]]:
    from .functions.xxh64 import xxh64_str

    rows = []
    for d in range(spec.N_DOMAINS):
        name = spec.domain_name(d)
        rows.append(
            (
                name,
                xxh64_str(name),
                spec.domain_rate(d),
                spec.domain_budget(d, budget_scale),
            )
        )
    return rows


def robots_rows() -> list[tuple[str, int, bool]]:
    return [
        (spec.domain_name(d), b, spec.robots_allow(d, b))
        for d in range(spec.N_DOMAINS)
        for b in range(spec.N_PATH_BUCKETS)
    ]


def generate_all(
    spark: SparkSession,
    out_dir: str,
    n_images: int,
    n_seeds: int = 20,
    budget_scale: float = 1.0,
    lite: bool = False,
) -> None:
    os.makedirs(out_dir, exist_ok=True)
    # partitionBy the bucket key: each epoch's payload join dynamic-partition-
    # prunes the scan to the buckets its popped URLs touch (test_plans asserts)
    generate_images(spark, n_images, lite=lite).write.partitionBy(
        "img_bucket"
    ).mode("overwrite").parquet(os.path.join(out_dir, "images.parquet"))
    spark.createDataFrame(seed_rows(n_images, n_seeds), SEEDS).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(out_dir, "seeds.parquet"))
    spark.createDataFrame(domain_rows(budget_scale), DOMAINS).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(out_dir, "domains.parquet"))
    spark.createDataFrame(robots_rows(), ROBOTS).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(out_dir, "robots.parquet"))
