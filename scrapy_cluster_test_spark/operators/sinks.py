"""Export sinks: CSV, chunked gzip JSONL, and callback summaries.

Reference parallels:
* CSV → S3 export with hyperlink columns and dedup before write
  (pipelines.py:127-217, 283-326 → SURVEY K5, F20, D4);
* chunked gzip JSONL, 1000 items per object
  (core/sellgo_core/webcrawl/scrapy/pipelines.py:12-122 → K6);
* HTTP callback with final result JSON (pipelines.py:219-252 → K8).

Spark-native: ``maxRecordsPerFile`` replaces hand-rolled chunking; the
writers are distributed (no driver collect); the callback becomes a
driver-side summary JSON written after the last epoch.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hyperlink(col: str, text: str | None = None) -> F.Column:
    """Spreadsheet HYPERLINK formula cell (pipelines.py:127-128 → F20)."""
    return F.format_string(
        '=HYPERLINK("%s", "%s")', F.col(col), F.col(text or col)
    )


def export_csv(
    df: DataFrame,
    path: str,
    dedup_keys: list[str] | None = None,
    hyperlink_cols: list[str] | None = None,
) -> None:
    """Header CSV export with optional pre-write dedup and hyperlink
    formatting — the flat-file export pipeline (K5/D4/F20)."""
    if dedup_keys:
        df = df.dropDuplicates(dedup_keys)
    for c in hyperlink_cols or []:
        df = df.withColumn(c, hyperlink(c))
    df.write.mode("overwrite").option("header", True).csv(path)


def export_jsonl_gz(
    df: DataFrame, path: str, records_per_file: int = 1000
) -> None:
    """Chunked gzip JSONL: the reference buffers 1000 items per S3 object
    (S3PIPELINE_MAX_CHUNK_SIZE); maxRecordsPerFile gives the same contract
    without driver-side buffering."""
    (
        df.write.mode("overwrite")
        .option("compression", "gzip")
        .option("maxRecordsPerFile", records_per_file)
        .json(path)
    )


def write_callback_summary(path: str, summary: dict) -> None:
    """Final-result callback payload (K8), written as a local JSON file —
    the durable half of the POST-to-CALLBACK_URL pair."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(summary, f, indent=2, sort_keys=True)


def post_callback(
    callback_url: str,
    job_id: str,
    scraped_items_len: int,
    project: str = "scrapy_cluster_test_spark",
    spider: str = "crawl",
    extra: dict | None = None,
    timeout_s: float = 10.0,
) -> int:
    """K8 HTTP callback: POST the reference's exact result envelope
    {project, spider, job_id, data: {scraped_items_len, ...}} to
    CALLBACK_URL (pipelines.py:219-252). stdlib urllib — no extra deps;
    returns the HTTP status. Raises on connection/HTTP errors so the job
    driver can decide whether a missed notification is fatal (the
    reference lets requests.post raise the same way)."""
    import urllib.request

    data = {
        "project": project,
        "spider": spider,
        "job_id": job_id,
        "data": {"scraped_items_len": int(scraped_items_len), **(extra or {})},
    }
    req = urllib.request.Request(
        callback_url,
        data=json.dumps(data, sort_keys=True).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=timeout_s) as resp:
        return resp.status


def archive_payloads(fetched_images: DataFrame, path: str) -> None:
    """Raw payload archive keyed by image_id (K9: raw-HTML S3 archive
    analog) — partitioned parquet of the binary column."""
    fetched_images.select("image_id", "bytes", "fmt").write.mode(
        "overwrite"
    ).parquet(path)
