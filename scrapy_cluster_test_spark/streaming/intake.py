"""Structured Streaming intake: the Kafka job-command plane, Spark-native.

Reference: `kafka_monitor` consumes `todo_jobs`, JSON-decodes, and
schedules spiders (kafka_monitor/main.py:79-105); per-item progress events
flow to `{job_id}-job` topics (pipelines.py:59-108). The streaming
equivalents:

* ``parse_job_commands`` — a byte stream of JSON job commands → typed rows
  (from_json; with a kafka source this is `spark.readStream.format("kafka")`
  → same transform on `CAST(value AS STRING)`).
* ``windowed_fetch_metrics`` — tumbling-window counters with a watermark:
  the streaming form of the per-epoch metric rollup (A3/A4).
* ``seed_sink`` — foreachBatch writer that MERGEs new seed URLs into the
  frontier idempotently (K2 `$setOnInsert` semantics) — exactly-once via
  the streaming checkpoint + idempotent anti-join insert.

The frontier loop itself intentionally stays batch-incremental
(SURVEY §2.11: the reference has no event-time semantics; Iceberg-style
snapshots give exact resume that streaming state would complicate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

JOB_SCHEMA = T.StructType(
    [
        T.StructField("job_id", T.StringType(), False),
        T.StructField("spider", T.StringType(), False),
        T.StructField("seed_urls", T.ArrayType(T.StringType()), True),
        T.StructField("priority", T.IntegerType(), True),
    ]
)


def parse_job_commands(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """JSON job commands → typed command rows; malformed JSON → null job_id
    rows are dropped (the consumer's try/except json.loads parity)."""
    parsed = raw.select(
        F.from_json(F.col(value_col).cast("string"), JOB_SCHEMA).alias("cmd")
    )
    return (
        parsed.select("cmd.*")
        .filter(F.col("job_id").isNotNull())
        .withColumn("seed_url", F.explode_outer("seed_urls"))
        .drop("seed_urls")
    )


def windowed_fetch_metrics(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Tumbling-window fetch counters with late-data watermark. Works
    identically on a batch DataFrame (window() is just an expression) —
    tests exploit that for streaming/batch parity."""
    # watermarks require TIMESTAMP (with tz); parquet often stores NTZ —
    # normalize (session tz is pinned UTC so the instant is unchanged)
    events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("win"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def seed_sink(frontier_path: str):
    """foreachBatch sink: idempotent seed insert, exactly-once per batch.

    Each micro-batch anti-joins against every OTHER batch's fingerprints and
    then OVERWRITES its own ``batch_id=<n>`` partition directory — a retried
    batch replaces its previous (possibly torn) attempt instead of appending
    a duplicate, and excluding its own partition from the anti-join keeps the
    retry from erasing its own rows. Only a genuinely-missing frontier path
    is treated as "first batch"; any other read failure propagates."""

    def write(batch: DataFrame, batch_id: int) -> None:
        from pyspark.errors import AnalysisException

        from ..functions import urlkit

        spark = batch.sparkSession
        canon = urlkit.canonicalize(F.col("seed_url"))
        rows = (
            batch.filter(F.col("seed_url").isNotNull())
            .select(
                canon.alias("url"),
                urlkit.url_fingerprint(canon).alias("url_fp"),
            )
            # within-batch dedup (deterministic winner), same K2 semantics
            .groupBy("url_fp")
            .agg(F.min("url").alias("url"))
            .select("url", "url_fp")
        )
        try:
            existing = (
                spark.read.parquet(frontier_path)
                .filter(F.col("batch_id") != batch_id)
                .select("url_fp")
            )
            rows = rows.join(existing, "url_fp", "left_anti")
        except AnalysisException as e:
            msg = str(e)
            if "PATH_NOT_FOUND" not in msg and "Path does not exist" not in msg:
                raise
        if rows.limit(1).count() > 0:  # empty partition dirs confuse discovery
            rows.write.mode("overwrite").parquet(f"{frontier_path}/batch_id={batch_id}")

    return write
