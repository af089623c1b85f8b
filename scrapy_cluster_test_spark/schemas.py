"""Explicit StructType schemas for every engine table.

The reference is schemaless (Mongo dicts, SURVEY §1.3); this engine fixes
schemas up front. The ``images`` shape is authoritative from
BASELINE.json ``input_hint``.
"""

from __future__ import annotations

from pyspark.sql import types as T

# input_hint: (image_id string, bytes binary, w int, h int, fmt string,
#              caption string, phash long)
IMAGES = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("h", T.IntegerType(), False),
        T.StructField("fmt", T.StringType(), False),
        T.StructField("caption", T.StringType(), False),
        T.StructField("phash", T.LongType(), False),
        # storage-layout column, NOT part of the logical input_hint shape:
        # partition key (image index % N_IMG_BUCKETS) written via partitionBy
        # so the per-epoch payload join partition-prunes the 10^10-row scan
        T.StructField("img_bucket", T.IntegerType(), False),
    ]
)

# Frontier row (FIXTURES.md §2). Analog of Mongo todo collections
# (pipelines.py:429-444, popped at amazon_merchant_autonomous.py:70-102).
FRONTIER = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("url_fp", T.LongType(), False),
        T.StructField("domain", T.StringType(), False),
        T.StructField("domain_hash", T.LongType(), False),
        T.StructField("queue_kind", T.StringType(), False),  # 'seller' | 'asin'
        T.StructField("priority", T.IntegerType(), False),
        T.StructField("crawl_time", T.LongType(), False),  # logical enqueue counter
        T.StructField("retry_times", T.IntegerType(), False),
        T.StructField("provider", T.StringType(), False),
        T.StructField("status", T.StringType(), False),  # pending|done|failed|robots_blocked
        T.StructField("path_bucket", T.IntegerType(), False),  # robots join key
        T.StructField("parent_fp", T.LongType(), True),
        T.StructField("epoch", T.IntegerType(), False),  # epoch that last touched the row
    ]
)

SEEDS = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("queue_kind", T.StringType(), False),
        # FIFO position in the seed list — the reference's seed order is the
        # list order of the job payload (utils.py:73-88); a logical counter
        # keeps it deterministic without relying on file row order.
        T.StructField("crawl_time", T.LongType(), False),
    ]
)

DOMAINS = T.StructType(
    [
        T.StructField("domain", T.StringType(), False),
        T.StructField("domain_hash", T.LongType(), False),
        T.StructField("rate_per_sec", T.IntegerType(), False),
        T.StructField("budget_per_epoch", T.IntegerType(), False),
    ]
)

ROBOTS = T.StructType(
    [
        T.StructField("domain", T.StringType(), False),
        T.StructField("path_bucket", T.IntegerType(), False),
        T.StructField("allow", T.BooleanType(), False),
    ]
)

# One row per fetched URL per epoch — the crawl-order contract
# (SURVEY §2.4 Q2: the equivalence test replays this exact order).
CRAWL_LOG = T.StructType(
    [
        T.StructField("epoch", T.IntegerType(), False),
        T.StructField("seq", T.LongType(), False),  # global fetch sequence number
        T.StructField("url_fp", T.LongType(), False),
        T.StructField("domain", T.StringType(), False),
        T.StructField("queue_kind", T.StringType(), False),
        T.StructField("status_code", T.IntegerType(), False),
        T.StructField("image_id", T.StringType(), True),
    ]
)

METRICS = T.StructType(
    [
        T.StructField("epoch", T.IntegerType(), False),
        T.StructField("metric_key", T.StringType(), False),
        T.StructField("n", T.LongType(), False),
    ]
)
