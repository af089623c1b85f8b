"""Structured Streaming intake: job-command parsing, windowed metrics
stream/batch parity, and the idempotent foreachBatch seed sink."""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import functions as F

from scrapy_cluster_test_spark.sources import tables
from scrapy_cluster_test_spark.streaming import intake

from .conftest import SF_TINY


def test_parse_job_commands(spark):
    cmds = [
        json.dumps(
            {
                "job_id": "j1",
                "spider": "autonomous",
                "seed_urls": ["https://d0001.example.com/asin/0000000001"],
                "priority": 0,
            }
        ),
        json.dumps({"job_id": "j2", "spider": "merchant", "seed_urls": []}),
        "not json at all",
    ]
    raw = spark.createDataFrame([(c,) for c in cmds], "value string")
    rows = intake.parse_job_commands(raw).collect()
    ids = sorted({r.job_id for r in rows})
    assert ids == ["j1", "j2"]
    assert any(r.seed_url and r.seed_url.endswith("0000000001") for r in rows)


def test_windowed_metrics_stream_equals_batch(spark, tmp_path):
    """The same windowed aggregation over the events table must produce
    identical rows via the streaming engine (file source, memory sink)
    and the batch engine."""
    events_dir = str(tmp_path / "events_stream")
    os.makedirs(events_dir)
    src = os.path.join(SF_TINY, "events.parquet")
    batch_df = spark.read.parquet(src)
    if os.path.isdir(src):
        shutil.copytree(src, os.path.join(events_dir, "part0"))
    else:
        shutil.copy(src, os.path.join(events_dir, "part0.parquet"))

    batch = intake.windowed_fetch_metrics(batch_df).collect()

    stream_in = (
        spark.readStream.schema(batch_df.schema)
        .option("recursiveFileLookup", "true")
        .parquet(events_dir)
    )
    # complete mode emits every window each trigger (append mode would
    # withhold windows the watermark hasn't closed yet — a semantics
    # difference, not a bug)
    q = (
        intake.windowed_fetch_metrics(stream_in)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("metrics_out")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    stream = spark.sql("SELECT * FROM metrics_out").collect()

    key = lambda rows: sorted(
        (r.win_start, r.win_end, r.event_type, r.n, round(r.sum_value, 6))
        for r in rows
    )
    assert key(stream) == key(batch)
    assert len(batch) > 0


def test_seed_sink_idempotent(spark, tmp_path):
    frontier = str(tmp_path / "frontier_seeds")
    sink = intake.seed_sink(frontier)
    batch = spark.createDataFrame(
        [("https://d0001.example.com/asin/0000000001",),
         ("https://d0002.example.com/seller/0000000002",)],
        "seed_url string",
    )
    sink(batch, 0)
    sink(batch, 1)  # later batch with same urls — must not duplicate
    sink(batch, 0)  # foreachBatch RETRY of batch 0 — must not duplicate
    #   nor erase batch 0's own rows (the anti-join excludes its own partition)
    out = spark.read.parquet(frontier)
    assert out.count() == 2
    assert out.select("url_fp").distinct().count() == 2


def test_seed_sink_propagates_corrupt_frontier(spark, tmp_path):
    """A frontier path that EXISTS but fails to read must raise, not be
    silently treated as 'first batch' (ADVICE r1)."""
    import pytest

    frontier = str(tmp_path / "frontier_corrupt")
    os.makedirs(frontier)
    with open(os.path.join(frontier, "garbage.parquet"), "w") as fh:
        fh.write("this is not parquet")
    sink = intake.seed_sink(frontier)
    batch = spark.createDataFrame(
        [("https://d0001.example.com/asin/0000000001",)], "seed_url string"
    )
    with pytest.raises(Exception):
        sink(batch, 0)


def test_job_commands_end_to_end_readstream(spark, tmp_path):
    """S1 smoke: parse_job_commands + seed_sink under a REAL readStream
    (file source standing in for kafka — same `value` column contract)."""
    in_dir = str(tmp_path / "job_cmds")
    frontier = str(tmp_path / "frontier_stream")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)
    cmds = [
        {"job_id": "j1", "spider": "autonomous",
         "seed_urls": ["https://d0001.example.com/asin/0000000001",
                       "https://d0002.example.com/asin/0000000002"],
         "priority": 0},
        {"job_id": "j2", "spider": "merchant",
         "seed_urls": ["https://d0001.example.com/asin/0000000001"],  # dup
         "priority": 1},
    ]
    with open(os.path.join(in_dir, "cmds.txt"), "w") as fh:
        for c in cmds:
            fh.write(json.dumps(c) + "\n")

    raw = spark.readStream.format("text").load(in_dir)
    q = (
        intake.parse_job_commands(raw)
        .writeStream.foreachBatch(intake.seed_sink(frontier))
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.read.parquet(frontier)
    # 3 seed urls, 1 duplicate fingerprint → 2 distinct frontier rows
    assert out.select("url_fp").distinct().count() == 2
    assert out.count() == 2
