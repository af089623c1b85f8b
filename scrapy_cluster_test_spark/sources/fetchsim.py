"""Deterministic fetch stage: popped frontier rows → fetched page rows.

Reference: the proxied HTTP downloader + retry middleware
(scrapy_project/project/utils.py:90-151, middlewares.py:22-233). In this
sandbox there is no network, so the "web" is a pure function of the image
table (crawlspec.py): page j serves image j's payload; its status code and
child links derive from image j's phash.

Dataflow (all DataFrame ops; Python only inside Arrow batches):

1. derive ``image_id`` from the URL path natively (regexp_extract) —
   no UDF;
2. join the popped batch against the images table. The popped side is
   tiny (≤ Σ budgets) so it broadcasts; the images table is partitioned by
   ``img_bucket`` so dynamic partition pruning skips untouched buckets —
   at 10^10 rows the scan reads only the buckets this epoch touches;
3. one ``mapInPandas`` pass computes status codes and fans out child
   links with vectorized numpy (no per-row Python).

Child URL strings are built with vectorized pandas str ops; their
fingerprints/domain hashes are computed NATIVELY afterwards
(F.xxhash64 on the canonical URL) so the hot hashing path stays in the JVM.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import crawlspec as spec
from ..functions import urlkit

FETCH_SCHEMA = (
    "seq long, url_fp long, domain string, queue_kind string, priority int, "
    "crawl_time long, retry_times int, provider string, status_code int, "
    "image_id string, phash long"
)

CHILD_SCHEMA = (
    "parent_seq long, parent_fp long, child_k int, j long, d int, queue_kind string"
)


def attach_image_id(popped: DataFrame) -> DataFrame:
    """image_id + partition bucket from the URL path, natively:
    .../{kind}/{j:010d} → (img{j:010d}, j % N_IMG_BUCKETS)."""
    j = F.regexp_extract("url", r"/(\d{10})$", 1)
    return popped.withColumn(
        "image_id", F.concat(F.lit("img"), j)
    ).withColumn(
        "img_bucket",
        F.pmod(j.cast("long"), F.lit(spec.N_IMG_BUCKETS)).cast("int"),
    )


def join_payload(
    popped: DataFrame,
    images: DataFrame,
    with_bytes: bool = False,
    prune_buckets: bool = True,
) -> DataFrame:
    """Join the popped batch to its page payloads.

    Broadcast the popped side; Catalyst prunes the image columns not
    selected (bytes stays unread unless requested — check ReadSchema in
    .explain). The images table is written partitionBy(img_bucket) and the
    popped side derives the same bucket natively, so joining on
    (img_bucket, image_id) dynamic-partition-prunes the scan: an epoch
    touching k of the N_IMG_BUCKETS partitions reads only those — at 10^10
    images the fetch path's scan bill is O(popped), not O(table)
    (PartitionFilters asserted in tests/test_plans.py)."""
    cols = ["image_id", "img_bucket", "phash"] + (
        ["bytes", "caption", "w", "h", "fmt"] if with_bytes else []
    )
    im = images.select(*cols)
    tagged = attach_image_id(popped)
    # Static partition pruning: the distinct bucket set is bounded by the
    # CONSTANT N_IMG_BUCKETS (≤64 ints), never by data size — a legitimate
    # driver-side collect. Catalyst turns the isin into PartitionFilters on
    # the scan, which Spark's DPP heuristics decline here (no selective
    # build-side filter to trigger them).
    if prune_buckets:
        # Worth a driver round-trip only when the popped batch is SMALL
        # (capped epochs): a large uncapped pop touches every bucket, so
        # the caller disables this and skips one job barrier per epoch.
        buckets = [
            r[0] for r in tagged.select("img_bucket").distinct().collect()
        ]
        im = im.filter(F.col("img_bucket").isin(buckets))
    # No broadcast hint: the popped side ranges from ~7k rows (capped sched
    # epochs — AQE flips this to a broadcast join at runtime, under the
    # raised adaptive threshold in session.py) to millions (uncapped
    # kernel epochs — a forced broadcast build of ~500 MB of wide rows was
    # a serial-per-epoch cost; a shuffle join is parallel and both sides
    # are O(popped) after the partition-pruned scan).
    return im.join(tagged, ["img_bucket", "image_id"], "inner").drop("img_bucket")


def fetch_statuses(popped_with_payload: DataFrame) -> DataFrame:
    """Status codes are integer arithmetic on phash — native columns, no UDF."""
    p = F.col("phash")
    # unsigned interpretation of the signed 64-bit phash, mod small primes:
    # pmod on the signed value matches crawlspec's (phash & MASK) % m only
    # when m divides 2^64-offset... it does not — so compute via the same
    # two-limb trick: (phash & MASK) % m == pmod(pmod(2^32,m)*pmod(hi,m) + pmod(lo,m), m)
    hi = F.shiftrightunsigned(p, 32)
    lo = p.bitwiseAND(F.lit(0xFFFFFFFF))

    def umod(m: int):
        return F.pmod(F.pmod(F.lit((1 << 32) % m), m) * F.pmod(hi, m) + F.pmod(lo, m), m)

    return popped_with_payload.withColumn(
        "status_code",
        F.when(umod(97) == 0, 503)
        .when(umod(131) == 0, 404)
        .when(umod(35) == 0, 520)
        .otherwise(200)
        .cast("int"),
    )


def _children_batches(n_images: int):
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            ok = pdf[pdf["status_code"] == 200]
            if ok.empty:
                continue
            phash = ok["phash"].to_numpy(np.int64).view(np.uint64)
            n_child = np.minimum(phash % np.uint64(35), np.uint64(spec.MAX_CHILDREN)).astype(
                np.int64
            )
            parent_seq = ok["seq"].to_numpy(np.int64)
            parent_fp = ok["url_fp"].to_numpy(np.int64)
            child_kind = ok["ckind"].to_numpy()
            out = []
            for k in range(spec.MAX_CHILDREN):
                mask = n_child > k
                if not mask.any():
                    break
                j = spec.child_indices_np(phash[mask].view(np.int64), k, n_images)
                d = spec.domain_id_np(j)
                out.append(
                    pd.DataFrame(
                        {
                            "parent_seq": parent_seq[mask],
                            "parent_fp": parent_fp[mask],
                            "child_k": np.full(mask.sum(), k, np.int32),
                            "j": j,
                            "d": d.astype(np.int32),
                            "queue_kind": child_kind[mask],
                        }
                    )
                )
            if out:
                yield pd.concat(out, ignore_index=True)

    return gen


def discover_children(fetched: DataFrame, n_images: int) -> DataFrame:
    """200-pages → child link rows, with native fp/domain/bucket columns.

    The Python stage stays pure numpy and emits ONLY integer link targets
    (j, d) — the 10×-fanout URL strings are assembled afterwards by JVM
    codegen (concat/lpad). Building them with pandas str ops inside the
    UDF cost ~20 s/epoch at a 27M-child fan-out and dominated the Arrow
    transfer; ints are 8 bytes each and the string never crosses the
    Python boundary. (In a real crawl this stage parses payloads — the
    same minimal-output rule applies: emit extraction results, not
    re-serialized pages.)"""
    src = fetched.select(
        "seq",
        "url_fp",
        "status_code",
        "phash",
        # child kind derived natively BEFORE the UDF (offer pages yield
        # sellers and vice versa) so the Python side never string-maps
        F.when(F.col("queue_kind") == "asin", "seller")
        .otherwise("asin")
        .alias("ckind"),
    )
    raw = src.mapInPandas(_children_batches(n_images), schema=CHILD_SCHEMA)
    # Engine-constructed child URLs are canonical BY CONSTRUCTION (https,
    # lowercase host, no query/fragment), so canonicalize() — six
    # parse_url calls per row, ~20 s/epoch at a 27M fan-out — is skipped;
    # the identity canonicalize(child_url) == child_url is pinned in
    # tests/test_urlkit.py. External URLs (seeds, imports) always go
    # through the full canonicalizer.
    domain = F.concat(
        F.lit("d"), F.lpad(F.col("d").cast("string"), 4, "0"), F.lit(".example.com")
    )
    url = F.concat(
        F.lit("https://"),
        domain,
        F.lit("/"),
        F.col("queue_kind"),
        F.lit("/"),
        F.lpad(F.col("j").cast("string"), 10, "0"),
    )
    fp = urlkit.url_fingerprint(url)
    return raw.select(
        url.alias("url"),
        fp.alias("url_fp"),
        domain.alias("domain"),
        urlkit.domain_hash(domain).alias("domain_hash"),
        "queue_kind",
        F.pmod(fp, F.lit(spec.N_PATH_BUCKETS)).cast("int").alias("path_bucket"),
        "parent_fp",
        "parent_seq",
        "child_k",
    )


def with_parent_context(
    child_rows: DataFrame,
    parent_log: DataFrame,
    ctx_cols: tuple[str, ...] = ("domain", "queue_kind", "status_code", "image_id", "seq"),
) -> DataFrame:
    """Chained-fetch context (SURVEY Q12): the reference forwards the FULL
    parsed parent row into the child request as ``cb_kwargs`` so the next
    callback can merge onto it (amazon_merchant.py:547-572 — the seller
    struct rides into parse_inventory_info). Carrying a wide struct inside
    every frontier row would bloat 10^10 rows with data that is already
    durable, so the Spark-first form reconstructs the context ON DEMAND:
    children keep only ``parent_fp`` (8 bytes), and this equi-join against
    the parent's crawl-log row rebuilds exactly what cb_kwargs carried —
    one shuffle-hash join keyed by url_fp, prunable to the parent's epoch.

    ``parent_log`` is any frame keyed by ``url_fp`` (e.g.
    epoch.read_crawl_log output). Parent columns arrive as one ``ctx``
    struct; children with no logged parent (seeds) get ctx = NULL.
    """
    parents = parent_log.select(
        F.col("url_fp").alias("parent_fp"),
        F.struct(*[F.col(c).alias(c) for c in ctx_cols]).alias("ctx"),
    )
    return child_rows.join(parents, "parent_fp", "left")
