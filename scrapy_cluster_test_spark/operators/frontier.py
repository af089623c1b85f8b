"""Frontier operators: politeness-budgeted pop, robots gate, child enqueue.

Reference: Mongo todo collections popped FIFO on `spider_idle`
(amazon_merchant_autonomous.py:60-154), pending-flag lifecycle
(pipelines.py:429-455), retry middleware (middlewares.py:153-233).

Everything is a deterministic DataFrame transform: every window order ends
in ``url_fp`` so the result is independent of partitioning and task
scheduling (SURVEY §7 "hard parts": ties must be broken by url_fp or
distribution order leaks in).

Scale notes (10^10 frontier, 1000 executors):
* the per-domain budget rank is a GROUPED two-level rank
  (``distributed_rank(group_cols=["domain"])``): no domain — however hot —
  ever sorts in a single task; each domain tiles contiguous range
  partitions and pays one triangular count join for its offsets;
* the per-kind cap runs on the *post-budget* subset only (≤ Σ budgets
  rows per epoch, ~10^6 at full scale), not the 10^10 table, and its rank
  doubles as the global ``seq`` (dense after the cap filter) so the pop
  pays two range shuffles total;
* the hot-domain skew (domain 0 holds ~27% of pages) is additionally
  bounded by the budget itself: at most ``budget`` rows per domain survive
  the rank filter, so the excess is discarded at the first shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from .. import crawlspec as spec

POP_ORDER = [
    "kind_rank",
    "priority",
    "crawl_time",
    "url_fp",
]


def kind_rank() -> F.Column:
    """seller before asin — the reference dispatches all sellers, then all
    asins (amazon_merchant_autonomous.py:103-151)."""
    return F.when(F.col("queue_kind") == "seller", 0).otherwise(1)


def salted_repartition(
    df: DataFrame, num_partitions: int, salt_buckets: int = 16
) -> DataFrame:
    """Hot-domain skew defense (SURVEY Q15, north rule): partition the
    fetch batch by ``(domain_hash, pmod(url_fp, S))`` so one mega-domain
    (domain 0 holds ~27% of the synthetic universe) spreads across up to
    ``salt_buckets`` partitions instead of pinning one task. Politeness
    accounting stays correct because budgets were already applied
    per-domain BEFORE this shuffle (pop_batch) — the salt only affects
    physical placement of the fetch work, never the schedule.

    Reference parallel: the multiprocess chunker re-splitting one domain's
    URLs across processes (core/.../crawl_amazon_product_listing.py:83-104).
    """
    return df.repartition(
        num_partitions,
        F.col("domain_hash"),
        F.pmod(F.col("url_fp"), F.lit(salt_buckets)),
    )


def distributed_rank(
    df: DataFrame, order_cols: list, out_col: str, group_cols: list | None = None
) -> DataFrame:
    """row_number over a total order WITHOUT a single-partition sort
    (VERDICT r1 scale-killer #3) — optionally PER GROUP, without one
    task per group (the hot-domain fix: a Zipf head domain holding ~27%
    of the frontier made every plain ``partitionBy(domain)`` window an
    Amdahl serial floor — measured 28% serial fraction at 3M URLs).

    Two-level ranking: range-repartition on (group..., order...) — so
    each group's rows tile CONTIGUOUS partitions in order — rank locally
    per (partition, group), then add the count of the group's rows in
    all earlier partitions. The offsets come from a triangular join over
    the per-(partition, group) counts — ~(#groups + #partitions) rows,
    so no Exchange SinglePartition appears anywhere in the plan
    (asserted in tests/test_plans.py).

    The produced ranks are IDENTICAL to ``row_number().over(W.orderBy(...))``
    for any total order (the range boundaries — sampled, and possibly
    AQE-coalesced — only decide which task computes which slice, never the
    rank itself), so crawl logs stay byte-identical (test_crawl_equivalence).

    The range layout MUST be materialized exactly once before both
    consumers read it: ``part`` feeds the counts subtree AND the ranked
    subtree, and without the eager checkpoint each subtree plans its own
    range Exchange whose boundaries come from independent random
    sampling. When the two layouts disagree, the inner join on ``_pid``
    silently drops every row whose partition id the counts side never
    produced — nondeterministic row LOSS that grows with the partition
    count (observed: 140k children shrank to 21k at local[32]).
    ``localCheckpoint(eager=True)`` pins one layout and one lineage for
    both readers; at scale it is a single cached pass over the batch
    being ranked, no extra shuffle.
    """
    ranked, _ = _distributed_rank_with_counts(df, order_cols, out_col, group_cols)
    return ranked


def _distributed_rank_with_counts(
    df: DataFrame, order_cols: list, out_col: str, group_cols: list | None = None
) -> tuple[DataFrame, DataFrame]:
    """distributed_rank plus its internal per-(partition, group) counts
    relation — callers that also need group TOTALS (e.g. pop_batch's
    kind offsets) derive them from the counts instead of re-running the
    rank's window+join subtree (the checkpoint below pins the layout, so
    re-reading counts is one cheap pass over materialized narrow rows)."""
    g = list(group_cols or [])
    part = df.repartitionByRange(
        *[F.col(c) for c in g + list(order_cols)]
    ).withColumn("_pid", F.spark_partition_id())
    part = part.localCheckpoint(eager=True)
    counts = part.groupBy("_pid", *g).agg(F.count("*").alias("_c"))
    cond = F.col("b._pid") < F.col("a._pid")
    for c in g:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    # counts is ~(#partitions × #groups) rows — broadcast the probe side so
    # the triangular prefix-sum join never plans a SortMergeJoin
    earlier = (
        counts.alias("a")
        .join(F.broadcast(counts.alias("b")), cond, "left")
        .groupBy(
            F.col("a._pid").alias("_pid"),
            *[F.col(f"a.{c}").alias(c) for c in g],
        )
        .agg(F.coalesce(F.sum("b._c"), F.lit(0)).alias("_off"))
    )
    w_local = W.partitionBy("_pid", *g).orderBy(*order_cols)
    ranked = (
        part.withColumn("_lrk", F.row_number().over(w_local))
        .join(F.broadcast(earlier), ["_pid"] + g)
        .withColumn(out_col, (F.col("_lrk") + F.col("_off")).cast("long"))
        .drop("_pid", "_lrk", "_off")
    )
    return ranked, counts


def robots_split(pending: DataFrame, robots: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split pending rows into (allowed, blocked) via a broadcast join on
    (domain, path_bucket). Reference has no robots support (SURVEY Q13);
    the north rule requires it."""
    deny = robots.filter(~F.col("allow")).select("domain", "path_bucket")
    blocked = pending.join(F.broadcast(deny), ["domain", "path_bucket"], "left_semi")
    allowed = pending.join(F.broadcast(deny), ["domain", "path_bucket"], "left_anti")
    return allowed, blocked


def pop_batch(
    allowed_pending: DataFrame,
    domains: DataFrame,
    seller_cap: int | None,
    asin_cap: int | None,
    seq_base: int,
    prefilter_salt: int | None = None,
) -> DataFrame:
    """Politeness-budgeted, deterministic frontier pop.

    1. per-domain rank over (kind, priority, crawl_time, url_fp), keep
       rank ≤ that domain's budget (Q1/Q4 politeness);
    2. per-kind global FIFO cap (the reference's 5000-seller / 2000-asin
       epoch limits, amazon_merchant_autonomous.py:81,99);
    3. global fetch sequence number ``seq`` over the popped batch
       (the crawl-order contract, Q2).

    All ranking runs on a NARROW projection (url_fp + order/group columns,
    ~40 B/row) — the wide frontier rows are re-attached by ONE equi-join on
    the unique ``url_fp`` at the end. The eager checkpoint inside
    ``distributed_rank`` then materializes a few hundred MB at the 5M-URL
    epoch design point instead of the full frontier width (measured 4.6×
    faster at 6M rows, and the only wide shuffle left is the final join).

    ``prefilter_salt``: exact salted top-k pre-filter for the
    frontier ≫ Σbudgets regime (the 10^10 shape). Within each
    (domain, pmod(url_fp, salt)) cell a row whose CELL rank exceeds the
    domain budget cannot rank ≤ budget domain-wide (its cell alone
    out-ranks it), so dropping it is exact. This caps what the exact
    grouped rank sees at salt × budget rows per domain — O(popped), not
    O(frontier). Costs one extra narrow hash-shuffle, so the epoch driver
    enables it only when the pending frontier dwarfs the budgets.
    """
    cand = allowed_pending.withColumn("kind_rank", kind_rank())

    dom_budget = F.broadcast(domains.select("domain", "budget_per_epoch"))
    budget = F.coalesce(F.col("budget_per_epoch"), F.lit(1))
    narrow = cand.select(
        "url_fp", "domain", "queue_kind", "kind_rank", "priority", "crawl_time"
    ).join(dom_budget, "domain", "left")

    if prefilter_salt:
        w_cell = W.partitionBy(
            "domain", F.pmod(F.col("url_fp"), F.lit(prefilter_salt))
        ).orderBy(*POP_ORDER)
        narrow = (
            narrow.withColumn("_lrk", F.row_number().over(w_cell))
            .filter(F.col("_lrk") <= budget)
            .drop("_lrk")
        )

    # per-domain budget rank via GROUPED two-level rank: a plain
    # partitionBy(domain) window put the Zipf head domain (~27% of the
    # universe) in one task at every cluster size — a serial floor that
    # capped N→4N scaling at ~0.55. Grouped ranking spreads each domain
    # across contiguous range partitions.
    narrow = distributed_rank(narrow, POP_ORDER, "dom_rk", ["domain"]).filter(
        F.col("dom_rk") <= budget
    )

    # ONE grouped rank serves both the per-kind cap and the global seq:
    # within a kind the pop order is (priority, crawl_time, url_fp), and
    # the cap filter removes exactly the tail ranks, so survivors keep
    # DENSE per-kind ranks — the global sequence is then kind_rk plus the
    # popped count of all kinds dispatched earlier (sellers before asins),
    # a 2-row broadcast, instead of a third range shuffle + checkpoint.
    narrow, kind_counts = _distributed_rank_with_counts(
        narrow, ["priority", "crawl_time", "url_fp"], "kind_rk", ["queue_kind"]
    )
    big = 1 << 40
    kind_cap = F.when(
        F.col("queue_kind") == "seller",
        seller_cap if seller_cap is not None else big,
    ).otherwise(asin_cap if asin_cap is not None else big)
    if seller_cap is not None or asin_cap is not None:
        narrow = narrow.filter(F.col("kind_rk") <= kind_cap)

    # per-kind POPPED counts = min(cap, total) — derived from the rank's
    # internal counts relation (one cheap pass over the checkpoint), NOT
    # from the ranked output, which would re-run its window+join subtree
    kcounts = (
        kind_counts.groupBy("queue_kind")
        .agg(F.sum("_c").alias("_tot"))
        .select("queue_kind", F.least(F.col("_tot"), kind_cap.cast("long")).alias("_n"))
    )

    def _krank(side: str) -> F.Column:
        return F.when(F.col(f"{side}.queue_kind") == "seller", 0).otherwise(1)

    koff = (
        kcounts.alias("a")
        .join(F.broadcast(kcounts.alias("b")), _krank("b") < _krank("a"), "left")
        .groupBy(F.col("a.queue_kind").alias("queue_kind"))
        .agg(F.coalesce(F.sum("b._n"), F.lit(0)).alias("_koff"))
    )
    seqs = (
        narrow.join(F.broadcast(koff), "queue_kind")
        .select(
            "url_fp",
            (F.col("kind_rk") + F.col("_koff") + F.lit(seq_base))
            .cast("long")
            .alias("seq"),
        )
    )
    # seqs is bounded by Σ per-domain budgets (+ per-kind caps) — the
    # ~5M-row / ~80MB epoch design point — NEVER by the frontier, so it is
    # broadcast: the 10^10-row wide side is scanned in place (filter
    # pushdown on the hash probe), not shuffled or sorted.
    return cand.drop("kind_rank").join(F.broadcast(seqs), "url_fp")


def apply_fetch_outcome(popped_fetched: DataFrame, epoch: int) -> DataFrame:
    """Post-fetch state transition for popped rows (Q6/K4):

    * 200 → done
    * retryable {404,429,503,520} with retry_times < 2 → stays pending,
      retry_times+1, priority += RETRY_PRIORITY_ADJUST (retries sort first
      next epoch — Q7), provider flips from the 2nd retry on
      (middlewares.py:182-206)
    * retryable with retries exhausted → failed
    """
    retryable = F.col("status_code").isin(*spec.RETRY_STATUS)
    can_retry = retryable & (F.col("retry_times") < spec.RETRY_TIMES_MAX)
    flip = F.when(F.col("provider") == "crawlera", "proxycrawl").otherwise("crawlera")
    return (
        popped_fetched.withColumn(
            "status",
            F.when(F.col("status_code") == 200, "done")
            .when(can_retry, "pending")
            .otherwise("failed"),
        )
        .withColumn(
            "provider",
            F.when(can_retry & (F.col("retry_times") >= 1), flip).otherwise(
                F.col("provider")
            ),
        )
        .withColumn(
            "priority",
            F.when(
                can_retry, F.col("priority") + spec.RETRY_PRIORITY_ADJUST
            ).otherwise(F.col("priority")),
        )
        .withColumn(
            "retry_times",
            F.when(can_retry, F.col("retry_times") + 1).otherwise(
                F.col("retry_times")
            ),
        )
        .withColumn("epoch", F.lit(epoch))
    )


def enqueue_children(
    children: DataFrame,
    frontier_fps: DataFrame,
    epoch: int,
) -> DataFrame:
    """Turn discovered child URLs into new frontier rows.

    * first-wins dedup within the epoch by fp, winner = lowest
      (parent_seq, child_k) — the reference's insertion-ordered
      `dict.fromkeys` dedup (D2);
    * anti-join against ALL existing frontier fps — the URL-seen set
      (J1/D7; `$setOnInsert` idempotence K2/D6);
    * crawl_time = (epoch+1)·10⁹ + enqueue rank over (parent_seq, child_k)
      — the FIFO position a sequential crawler would assign.

    ``children`` needs columns: url, url_fp, domain, domain_hash,
    queue_kind, path_bucket, parent_fp, parent_seq, child_k.
    """
    w_first = W.partitionBy("url_fp").orderBy("parent_seq", "child_k")
    fresh = (
        children.withColumn("rn", F.row_number().over(w_first))
        .filter(F.col("rn") == 1)
        .drop("rn")
        .join(frontier_fps, "url_fp", "left_anti")
    )
    # (parent_seq, child_k) is unique per surviving child, so the two-level
    # distributed rank reproduces the sequential FIFO numbering exactly.
    # Rank the NARROW (url_fp, parent_seq, child_k) projection and join the
    # rank back on the (post-dedup unique) url_fp, so the eager checkpoint
    # in distributed_rank never materializes the wide child rows.
    base = (epoch + 1) * 1_000_000_000
    enq_rk = distributed_rank(
        fresh.select("url_fp", "parent_seq", "child_k"),
        ["parent_seq", "child_k"],
        "_enq_rk",
    ).select("url_fp", "_enq_rk")
    fresh = fresh.join(enq_rk, "url_fp")
    return fresh.select(
        "url",
        "url_fp",
        "domain",
        "domain_hash",
        "queue_kind",
        F.lit(0).alias("priority"),
        (F.col("_enq_rk") + F.lit(base - 1).cast("long")).alias("crawl_time"),
        F.lit(0).alias("retry_times"),
        F.lit("crawlera").alias("provider"),
        F.lit("pending").alias("status"),
        "path_bucket",
        "parent_fp",
        F.lit(epoch).alias("epoch"),
    )
