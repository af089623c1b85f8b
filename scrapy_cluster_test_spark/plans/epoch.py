"""Epoch driver: the autonomous crawl loop as one transaction per epoch.

Reference: the `spider_idle` epoch (pop → fetch → parse → push,
amazon_merchant_autonomous.py:60-154) with pending-flag resume semantics
(pipelines.py:429-455). Here each epoch is a snapshot commit:

    job_dir/epoch=NNNNN/frontier/    full frontier state (COW)
    job_dir/epoch=NNNNN/crawl_log/   this epoch's fetches (the order contract)
    job_dir/epoch=NNNNN/metrics/     counter rows
    job_dir/epoch=NNNNN/_COMMIT      json marker — epoch is visible only
                                     once this exists

A killed job resumes from the last `_COMMIT`ed epoch exactly (uncommitted
partial writes are ignored and overwritten) — the sandbox stand-in for
Iceberg snapshot commits; on a cluster each epoch body becomes a single
`MERGE INTO frontier` + two appends in one Iceberg transaction. The
frontier is copy-on-write here; with an Iceberg table bucketed by
``domain_hash``, MERGE rewrites only touched buckets.

Determinism: no wall clock anywhere — crawl_time is a logical counter,
seq a row_number over a total order ending in url_fp. Running the job at
different parallelism levels produces byte-identical crawl logs (asserted
in tests/test_crawl_equivalence.py::test_partitioning_independence and
re-checked per-run by bench_scaling.py's output-hash assert).
"""

from __future__ import annotations

import json
import logging
import os
import shutil
import time
from concurrent.futures import ThreadPoolExecutor
from contextlib import contextmanager
from dataclasses import dataclass

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from .. import crawlspec as spec
from .. import locking
from ..operators import frontier as fr_ops
from ..schemas import FRONTIER
from ..sources import fetchsim

FRONTIER_COLS = [f.name for f in FRONTIER.fields]

_log = logging.getLogger(__name__)

# Count of pipelined-prepop build failures (each one silently falls back
# to the serial rebuild — correct but slower). Surfaced so a
# systematically-failing prepop can't disable pipelining invisibly:
# the handler logs a warning, and the pipelined-equivalence test asserts
# the counter stays zero (tests/test_epoch_tail.py).
PREPOP_FALLBACKS = 0

# per-partition lineage granularity: fetch counts per pmod(domain_hash, B)
# bucket per epoch — mirrors an Iceberg table bucketed by domain_hash
N_LINEAGE_BUCKETS = 16


@dataclass
class CrawlParams:
    images_path: str
    seeds_path: str
    domains_path: str
    robots_path: str
    job_dir: str
    n_images: int
    seller_cap: int = 5000  # amazon_merchant_autonomous.py:99
    asin_cap: int = 2000  # amazon_merchant_autonomous.py:81
    max_epochs: int = 50
    # Bloom pre-filter for the seen-set anti-join (north rule). Results are
    # identical either way (no false negatives); the bloom only shrinks the
    # anti-join's probe side — mandatory at 10^10, optional here.
    use_bloom: bool = False
    bloom_shards: int = 16
    # Fixed Bloom capacity (total keys) for the INCREMENTAL bitmap table:
    # sized once up front (never resized), each epoch ORs only the new fps
    # into last epoch's table — the north rule's broadcast-plus-delta
    # lifecycle. None → 2·n_images + 1000 (every image can contribute one
    # seller and one asin URL, plus seeds).
    bloom_expected_total: int | None = None
    # ADAPTIVE RESIZE: when the frontier (== seen-key count, fps never
    # leave it) exceeds this fraction of the filter's design capacity
    # (m_bits·shards / BITS_PER_KEY), the epoch's bloom job rebuilds the
    # table at bloom_m_bits(2·n_frontier) instead of OR-ing — one
    # O(frontier) pass, amortized O(1)/key by doubling, exactly like a
    # hash-table grow. Without it a long crawl silently degrades: the
    # false-positive rate climbs and every fp is paid for in the exact
    # verify anti-join's probe side (results stay correct — only the
    # join grows). The new size is recorded in the epoch's commit record
    # (``bloom_m_bits``) so probe positions stay consistent across
    # epochs and resume. 0 disables (fixed size forever, pre-r4 form).
    bloom_resize_at: float = 0.8
    # Salted repartition of the popped batch before fetch (Q15 hot-domain
    # skew defense). None = let Catalyst place the work (fine when popped
    # batches are small); set to ~cluster cores at scale.
    fetch_partitions: int | None = None
    salt_buckets: int = 16
    # Snapshot strategy (VERDICT r1 scale-killer #4):
    #   "cow"   — every epoch rewrites the FULL frontier (simple, O(N) IO);
    #   "delta" — every epoch writes ONLY the touched rows (updated +
    #             blocked + new) to epoch=N/delta, O(touched) IO; the
    #             frontier state is base-snapshot ⊕ deltas resolved
    #             last-writer-wins, and a full compacted snapshot is
    #             written every `compact_every` epochs to bound the read
    #             path. This is the sandbox form of an Iceberg MERGE
    #             (merge-on-read + periodic compaction); crawl output is
    #             byte-identical across modes (tests/test_delta_mode.py).
    #             A real Iceberg/Delta catalog was evaluated (round 3):
    #             no iceberg/delta jar exists anywhere in the container
    #             and package installs are unavailable, so the stand-in
    #             stays — but delta files ARE bucket-partitioned by
    #             pmod(domain_hash, N_LINEAGE_BUCKETS) like the Iceberg
    #             table the north rule names, and bucket-scoped readers
    #             prune untouched buckets at file listing.
    commit_mode: str = "cow"
    compact_every: int = 8
    # S8 proxy-token lease: when set, run_crawl leases one token per
    # provider from this parquet config table at start (kafka_monitor/
    # main.py:29-58) and releases them on exit (pipelines.py:391-403).
    proxies_path: str | None = None
    # Q12 chained-fetch context as an epoch-path consumer: when set, each
    # epoch also writes ``child_ctx`` — every ENQUEUED child with its
    # parent's crawl-log row reconstructed as one ``ctx`` struct via
    # fetchsim.with_parent_context (the reference's cb_kwargs carry,
    # amazon_merchant.py:547-572, rebuilt on demand from parent_fp instead
    # of bloating 10^10 frontier rows with duplicated parent data).
    emit_child_context: bool = False
    # Exact salted top-k pre-filter inside pop_batch (see its docstring):
    # an int forces that salt; None disables; "auto" enables salt=16 only
    # when the pending frontier is ≥8× the last epoch's pop — i.e. the
    # 10^10 regime where ranking the full frontier would dominate, while
    # small frontiers skip the extra shuffle.
    pop_prefilter_salt: int | str | None = "auto"
    # Cache the dim tables (corpus payload-join projection, domains,
    # robots) across the epoch loop: the projection is persisted
    # PRE-PARTITIONED + PRE-SORTED on the payload-join keys, so every
    # epoch's join satisfies its distribution/ordering from the cache and
    # only the O(popped) side is shuffled; domains/robots skip a per-epoch
    # parquet scan each. Purely physical — crawl output is byte-identical
    # (dim VALUES are unchanged), pinned by the cow≡delta / parallelism
    # equivalence suites which run both with and without it.
    cache_dims: bool = True
    # EPOCH PIPELINING: build epoch k+1's pop/rank (pure compute over the
    # carried pending checkpoint — no commit IO, publishes nothing) inside
    # epoch k's concurrent tail, chained after the pending-carry
    # checkpoint it consumes. Epoch k+1 then starts at the payload join,
    # overlapping the rank's CPU with the tail's commit IO — per-epoch
    # wall ≈ max(tail, pop) instead of tail + pop. Output byte-identity
    # across the toggle is pinned (tests/test_epoch_tail.py); requires
    # the delta+bloom carried-state path (elsewhere there is no carried
    # pending relation to pop from). SCT_PIPELINE_POP=0 disables at run
    # time for A/B controls.
    pipeline_pop: bool = True
    # How long run_crawl waits for a LIVE concurrent writer of the same
    # job_dir before raising WriterConflict. Short by design: a second
    # writer is a deployment error, not contention to ride out. Dead
    # holders' leases are broken immediately regardless.
    lock_timeout_s: float = 5.0


def _epoch_dir(job_dir: str, epoch: int) -> str:
    return os.path.join(job_dir, f"epoch={epoch:05d}")


def _bloom_m_bits(p: CrawlParams) -> int:
    from ..operators import seen as seen_ops

    n = p.bloom_expected_total or (2 * p.n_images + 1000)
    return seen_ops.bloom_m_bits(n, p.bloom_shards)


def _commit_path(job_dir: str, epoch: int) -> str:
    return os.path.join(_epoch_dir(job_dir, epoch), "_COMMIT")


def last_committed_epoch(job_dir: str) -> int | None:
    if not os.path.isdir(job_dir):
        return None
    best = None
    for name in os.listdir(job_dir):
        if name.startswith("epoch=") and os.path.exists(
            os.path.join(job_dir, name, "_COMMIT")
        ):
            e = int(name.split("=")[1])
            best = e if best is None else max(best, e)
    return best


def read_commit(job_dir: str, epoch: int) -> dict:
    with open(_commit_path(job_dir, epoch)) as f:
        return json.load(f)


def bootstrap(spark: SparkSession, p: CrawlParams) -> None:
    """Epoch 0: seeds → initial frontier snapshot (S4 seed-list source)."""
    seeds = spark.read.parquet(p.seeds_path)
    from ..functions import urlkit

    canon = urlkit.canonicalize(F.col("url"))
    fp = urlkit.url_fingerprint(canon)
    domain = urlkit.domain_of(canon)
    fr = seeds.select(
        canon.alias("url"),
        fp.alias("url_fp"),
        domain.alias("domain"),
        urlkit.domain_hash(domain).alias("domain_hash"),
        "queue_kind",
        F.lit(0).alias("priority"),
        F.col("crawl_time").cast("long").alias("crawl_time"),
        F.lit(0).alias("retry_times"),
        F.lit("crawlera").alias("provider"),
        F.lit("pending").alias("status"),
        F.pmod(fp, F.lit(spec.N_PATH_BUCKETS)).cast("int").alias("path_bucket"),
        F.lit(None).cast("long").alias("parent_fp"),
        F.lit(0).alias("epoch"),
    ).select(*FRONTIER_COLS)
    ed = _epoch_dir(p.job_dir, 0)
    if os.path.isdir(ed):
        shutil.rmtree(ed)
    _null_audit(fr).write.parquet(os.path.join(ed, "frontier"))
    if p.use_bloom:
        from ..operators import seen as seen_ops

        seen_ops.build_bloom_table_fixed(
            spark.read.parquet(os.path.join(ed, "frontier")).select("url_fp"),
            _bloom_m_bits(p),
            n_shards=p.bloom_shards,
        ).write.parquet(os.path.join(ed, "bloom"))
    pending = spark.read.parquet(os.path.join(ed, "frontier")).count()
    with open(_commit_path(p.job_dir, 0), "w") as f:
        json.dump(
            {
                "epoch": 0,
                "seq_base": 0,
                "pending": pending,
                "n_frontier": pending,
                **({"bloom_m_bits": _bloom_m_bits(p)} if p.use_bloom else {}),
            },
            f,
        )


# extra audit columns carried on the snapshot rows touched this epoch —
# the crawl log is a projection of the snapshot, not a second table
# (one write per epoch, exactly like a single Iceberg MERGE commit)
_AUDIT_COLS = ["seq", "status_code", "image_id"]
SNAPSHOT_COLS = FRONTIER_COLS + _AUDIT_COLS


def _null_audit(df):
    return (
        df.withColumn("seq", F.lit(None).cast("long"))
        .withColumn("status_code", F.lit(None).cast("int"))
        .withColumn("image_id", F.lit(None).cast("string"))
    )


def _compact_snapshot(spark: SparkSession, job_dir: str, epoch: int) -> None:
    """Write a full snapshot for an ALREADY-COMMITTED epoch post-hoc
    (resume-time compaction). The snapshot is derived state — a cache of
    the delta resolve, never the commit itself — so the _COMMIT marker is
    untouched; torn-write safety comes from writing to a tmp dir and
    atomically renaming it into place (a crash mid-write leaves only the
    tmp dir, which no reader matches — _frontier_base_epoch looks for the
    exact name ``frontier``)."""
    ed = _epoch_dir(job_dir, epoch)
    final = os.path.join(ed, "frontier")
    if os.path.isdir(final):
        return
    tmp = os.path.join(ed, "_frontier_compact_tmp")
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)
    _read_frontier_state(spark, job_dir, epoch, with_audit=True).write.parquet(
        tmp
    )
    os.rename(tmp, final)


def _frontier_base_epoch(job_dir: str, upto: int) -> int:
    """Latest epoch ≤ upto that has a full snapshot (bootstrap or
    compaction) — the base the delta overlay starts from."""
    for e in range(upto, -1, -1):
        if os.path.isdir(os.path.join(_epoch_dir(job_dir, e), "frontier")):
            return e
    raise FileNotFoundError(f"no frontier snapshot ≤ epoch {upto} in {job_dir}")


def _read_frontier_state(
    spark: SparkSession,
    job_dir: str,
    upto: int,
    with_audit: bool = False,
    buckets: list[int] | None = None,
) -> DataFrame:
    """Frontier state as of `upto` in delta mode: base snapshot overlaid
    with every later delta, resolved last-writer-wins by url_fp.

    Scale shape: the per-fp resolution window runs over DELTA rows only
    (bounded by budgets × epochs-since-compaction, never the 10^10 base);
    the base contributes via one anti-join on the touched fps — broadcast
    when the touched set is small, the same bucketed-MERGE read an Iceberg
    merge-on-read table does. ``buckets`` restricts the read to those
    pmod(domain_hash, N_LINEAGE_BUCKETS) buckets — delta files are
    partitioned by that key, so untouched buckets are never even listed
    (the "MERGE rewrites only touched buckets" read path)."""
    cols = SNAPSHOT_COLS if with_audit else FRONTIER_COLS
    bset = None if buckets is None else sorted({int(b) for b in buckets})
    base_e = _frontier_base_epoch(job_dir, upto)
    base = spark.read.parquet(
        os.path.join(_epoch_dir(job_dir, base_e), "frontier")
    ).select(*SNAPSHOT_COLS)
    if bset is not None:
        # applied BEFORE the no-delta early return so a bucket-scoped read
        # of a compaction/bootstrap epoch honors the scope too
        base = base.filter(
            F.pmod(F.col("domain_hash"), F.lit(N_LINEAGE_BUCKETS)).isin(bset)
        )
    deltas = [
        os.path.join(_epoch_dir(job_dir, e), "delta")
        for e in range(base_e + 1, upto + 1)
        if os.path.isdir(os.path.join(_epoch_dir(job_dir, e), "delta"))
    ]
    if not deltas:
        return base.select(*cols)
    # each delta root is its own partitioned (_dbucket=K) table — Spark's
    # partition discovery cannot span multiple roots, so read per-root and
    # union. Bucket scoping happens at LISTING time: we already know which
    # _dbucket=K subdirs we need, so a scoped read constructs the scan from
    # exactly those paths — O(touched buckets) files by construction, never
    # a full-root listing filtered after the fact (a post-union .isin filter
    # does NOT reliably become partition pruning across a multi-root union).
    d = None
    for pth in deltas:
        if bset is None:
            part = spark.read.parquet(pth).select(*SNAPSHOT_COLS)
        else:
            sub = [
                os.path.join(pth, f"_dbucket={b}")
                for b in bset
                if os.path.isdir(os.path.join(pth, f"_dbucket={b}"))
            ]
            if sub:
                part = (
                    spark.read.option("basePath", pth)
                    .parquet(*sub)
                    .select(*SNAPSHOT_COLS)
                )
            elif any(
                e.startswith("_dbucket=") for e in os.listdir(pth)
            ):
                # bucketed root that never touched the requested buckets
                continue
            else:
                # pre-upgrade delta root (written before bucket
                # partitioning): no _dbucket subdirs to prune by, so fall
                # back to a row-level filter on the same key — unprunable
                # but still correct, keeping old job dirs resumable
                part = (
                    spark.read.parquet(pth)
                    .filter(
                        F.pmod(
                            F.col("domain_hash"), F.lit(N_LINEAGE_BUCKETS)
                        ).isin(bset)
                    )
                    .select(*SNAPSHOT_COLS)
                )
        d = part if d is None else d.unionByName(part)
    if d is None:
        # scoped read and none of the delta epochs touched these buckets
        return base.select(*cols)
    # each fp is touched at most once per epoch, so (url_fp, epoch) is
    # unique and max-epoch-wins is a total resolution
    from pyspark.sql.window import Window as W

    w = W.partitionBy("url_fp").orderBy(F.col("epoch").desc())
    latest = (
        d.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
    )
    merged = base.join(d.select("url_fp").distinct(), "url_fp", "left_anti").select(
        *SNAPSHOT_COLS
    ).unionByName(latest)
    return merged.select(*cols)


_AGG_KEYS = (
    "n_popped", "n_new", "n_blocked", "n_pending", "n_ended", "n_frontier",
    "sc_200", "sc_404", "sc_429", "sc_503", "sc_520",
)


def _metric_exprs(epoch: int) -> list:
    """Aggregate expressions for the epoch's counter tree (A3/A4) plus the
    16 per-bucket lineage counters, shaped for ``DataFrame.observe``: the
    metrics ride along the snapshot/delta WRITE action itself (CollectMetrics
    accumulators merged at task completion), so the epoch pays ZERO extra
    scans or jobs for its metrics — previously a second full pass over the
    written snapshot per epoch (O(frontier) re-read in cow mode)."""
    this_epoch = F.col("epoch") == epoch
    fetched_now = this_epoch & F.col("seq").isNotNull()
    bucket = F.pmod(F.col("domain_hash"), F.lit(N_LINEAGE_BUCKETS))
    return [
        F.sum(fetched_now.cast("long")).alias("n_popped"),
        F.sum(
            (this_epoch & (F.col("status") == "pending") & (F.col("retry_times") == 0))
            .cast("long")
        ).alias("n_new"),
        F.sum(
            (this_epoch & (F.col("status") == "robots_blocked")).cast("long")
        ).alias("n_blocked"),
        F.sum((F.col("status") == "pending").cast("long")).alias("n_pending"),
        F.sum(
            (fetched_now & F.col("status").isin("done", "failed")).cast("long")
        ).alias("n_ended"),
        F.count(F.lit(1)).alias("n_frontier"),
        *[
            F.sum((fetched_now & (F.col("status_code") == sc)).cast("long")).alias(
                f"sc_{sc}"
            )
            for sc in (200, 404, 429, 503, 520)
        ],
        *[
            F.sum((fetched_now & (bucket == b)).cast("long")).alias(f"pop_b{b}")
            for b in range(N_LINEAGE_BUCKETS)
        ],
    ]


# Pending-frontier size below which an epoch's ranks take plain windows
# instead of the two-level bucketed form (stats-driven physical choice:
# the bucketed rank's ~1 s fixed cost per call only amortizes on
# multi-million-row inputs, and the BFS tail of a crawl is many thin
# epochs; ranks are identical either way — tests/test_distributed_rank).
# Derived ONLY from the previous commit record, so it is data-dependent
# and identical at every parallelism level: crawl logs stay byte-exact.
SMALL_EPOCH_PENDING = 150_000


def _small_epoch_hint(prev_state: dict | None, big_pop: bool) -> bool:
    return bool(
        prev_state
        and not big_pop
        and int(prev_state.get("pending") or 0) < SMALL_EPOCH_PENDING
    )


def _build_popped(
    p: CrawlParams,
    fr: DataFrame,
    domains: DataFrame,
    robots: DataFrame,
    seq_base: int,
    prev_state: dict | None,
    caches: list,
):
    """The epoch's pop/rank head: robots gate → politeness-budgeted pop →
    persist. Factored out verbatim so the in-epoch path and the pipelined
    prepop (built in the PREVIOUS epoch's tail, over the same carried
    pending checkpoint, with the same data-dependent hints from the same
    commit-record values) are one code path — crawl-order byte-identity
    across the pipelining toggle depends on it.

    Returns (pending, allowed, blocked, popped_persisted, big_pop)."""
    pending = fr.filter(F.col("status") == "pending")
    allowed, blocked = fr_ops.robots_split(pending, robots)
    salt = p.pop_prefilter_salt
    if salt == "auto":
        last_pop = (prev_state or {}).get("popped")
        salt = (
            16
            if last_pop and int(prev_state["pending"]) >= 8 * int(last_pop)
            else None
        )
    # pop_batch's internal rank persists join ``caches`` and are released
    # after the consuming epoch's writes — without this the CacheManager
    # accumulates entries per epoch for the lifetime of the crawl (r2
    # ADVICE).
    # fat-epoch hint: last epoch's popped count predicts this one's scale;
    # ≥150k rows means (a) the broadcast build of the seqs re-attach
    # relation would be ~1s+ of serial driver work per epoch (see
    # pop_batch docstring) and (b) the pop touches essentially every
    # image bucket, so the bucket-prune driver round-trip is wasted.
    # Data-dependent → identical at every parallelism level, so crawl
    # logs stay byte-exact.
    big_pop = bool(prev_state and int(prev_state.get("popped") or 0) >= 150_000)
    popped = fr_ops.pop_batch(
        allowed, domains, p.seller_cap, p.asin_cap, seq_base, prefilter_salt=salt,
        cache_registry=caches, big_pop_hint=big_pop,
        small_pop_hint=_small_epoch_hint(prev_state, big_pop),
    )
    if p.fetch_partitions:
        popped = fr_ops.salted_repartition(
            popped, p.fetch_partitions, p.salt_buckets
        )
    # persist: join_payload's bucket-set collect and the join itself both
    # consume popped — without this the pop window would run twice
    return pending, allowed, blocked, popped.persist(), big_pop


def run_epoch(
    spark: SparkSession,
    p: CrawlParams,
    epoch: int,
    seq_base: int,
    expected_frontier: int | None = None,
    prev_state: dict | None = None,
    fence: "callable | None" = None,
    carry_io: dict | None = None,
) -> dict:
    """One frontier epoch; returns the commit record.

    ONE serial action anchors the epoch — the commit write, which also
    carries the metrics aggregation via DataFrame.observe. Every other
    per-epoch job (compaction, bloom maintenance, the carry checkpoints,
    child_ctx, the metrics file) consumes only committed files or
    already-checkpointed relations and runs CONCURRENTLY after it (the
    ``tail`` pool below), so per-epoch fixed job-launch latency is paid
    ~once, not k times. At 10^10 scale the write becomes the Iceberg
    MERGE and the metrics agg an incremental scan of the changed
    buckets."""
    _caches: list = []
    _t_epoch = time.perf_counter()
    carried = carried_seen = None
    if p.commit_mode == "delta":
        # Delta-mode state handling, two layers:
        #
        # 1. CARRIED STATE (the steady-state path): run_crawl threads
        #    two checkpointed relations between epochs through
        #    ``carry_io`` — the PENDING frontier (wide rows, what pop
        #    consumes) and the SEEN fp set (one long column, what the
        #    Bloom false-positive exact check consumes; the bloom alone
        #    is not enough — its positives are verified by an exact
        #    anti-join, seen.filter_new_routed, and a pending-only set
        #    there re-enqueues already-done URLs: caught by the
        #    cow≡delta(bloom) equivalence test). The epoch then touches
        #    NO O(frontier) disk resolve at all; the delta files are the
        #    durable log (resume, audit, compaction), not the hot read
        #    path. Requires use_bloom (without the bloom the enqueue
        #    dedup consumes full frontier ROWS, not fps).
        # 2. DISK RESOLVE (first epoch of a process / resume / bloom
        #    off): base ⊕ k delta layers via union + last-writer-wins
        #    window + anti-join, materialized with an EAGER
        #    localCheckpoint — without the checkpoint the k-union
        #    subtree is embedded in every downstream plan and per-epoch
        #    wall grew ~5 s per delta layer (each of the epoch's several
        #    actions re-analyzes the ever-larger plan and same-job
        #    sibling branches race a plain cache) even though the
        #    resolve alone runs in 1-2 s.
        #
        # Both paths yield flat checkpointed scans; the resolve is
        # deterministic and the carried sets provably equal
        # resolve(epoch-1).filter(pending) / resolve(epoch-1).fps by
        # induction (this epoch writes at most one row per url_fp, and
        # fps never leave the frontier), so cow≡delta stays byte-exact
        # (tests/test_delta_mode.py, incl. the bloom variant).
        if p.use_bloom:
            carried = (carry_io or {}).get("pending")
            carried_seen = (carry_io or {}).get("seen")
        if carried is not None and carried_seen is not None:
            fr = carried  # all-pending FRONTIER_COLS, already checkpointed
        else:
            carried_seen = None
            fr = _read_frontier_state(spark, p.job_dir, epoch - 1).localCheckpoint(
                eager=True
            )
    else:
        prev = os.path.join(_epoch_dir(p.job_dir, epoch - 1), "frontier")
        fr = spark.read.parquet(prev).select(*FRONTIER_COLS)
    dims = (carry_io or {}).get("dims") or {}
    images = dims.get("images")
    if images is None:
        images = spark.read.parquet(p.images_path)
    domains = dims.get("domains")
    if domains is None:
        domains = spark.read.parquet(p.domains_path)
    robots = dims.get("robots")
    if robots is None:
        robots = spark.read.parquet(p.robots_path)

    _t = time.perf_counter()
    _ph: dict[str, float] = {}
    # EPOCH PIPELINING (pipeline_pop): the previous epoch's tail may have
    # pre-built THIS epoch's pop/rank over the carried pending checkpoint
    # (the one relation the pop consumes, materialized before that tail
    # ran). Valid only if it was derived from the very relation this
    # epoch took as ``fr`` — identity-checked, not assumed; stale handoffs
    # (resume, carry fallback) are released and the pop is rebuilt. Both
    # paths run the SAME _build_popped code, so pops and crawl order
    # cannot drift (plus serial≡pipelined is pinned in tests).
    pre = (carry_io or {}).pop("prepop", None)
    if pre is not None and not (pre["epoch"] == epoch and pre["fr"] is fr):
        pre["popped"].unpersist()
        for _c in pre["caches"]:
            _c.unpersist()
        pre = None
    if pre is not None:
        pending, allowed, blocked = pre["pending"], pre["allowed"], pre["blocked"]
        popped, big_pop = pre["popped"], pre["big_pop"]
        _caches.extend(pre["caches"])
    else:
        pending, allowed, blocked, popped, big_pop = _build_popped(
            p, fr, domains, robots, seq_base, prev_state, _caches
        )
    _ph["pop_rank"] = time.perf_counter() - _t
    _t = time.perf_counter()
    payload = fetchsim.join_payload(
        popped,
        images,
        # bucket pruning pays only when caps bound the pop AND the batch
        # is small; an uncapped or known-fat epoch touches every bucket,
        # so skip the extra job barrier
        prune_buckets=(
            (p.seller_cap is not None or p.asin_cap is not None) and not big_pop
        ),
    )
    _ph["pop+buckets"] = time.perf_counter() - _t
    fetched = fetchsim.fetch_statuses(payload).persist()

    ed = _epoch_dir(p.job_dir, epoch)
    if os.path.isdir(ed):
        shutil.rmtree(ed)  # uncommitted partial epoch → overwrite

    # ---- frontier transition ------------------------------------------
    # persist: the candidate-fps subtree and the thinned semi-join both
    # consume children — without this the mapInPandas fan-out runs twice
    children = fetchsim.discover_children(fetched, p.n_images).persist()
    # full seen-fp set: in the carried path fr holds only PENDING rows, so
    # the done fps come from the carried seen relation instead
    frontier_fps = (
        carried_seen
        if p.commit_mode == "delta" and carried_seen is not None
        else fr.select("url_fp")
    )
    if p.use_bloom:
        from ..operators import seen as seen_ops

        # INCREMENTAL bitmap table: read last epoch's committed table
        # (O(new) maintenance, written below) instead of rebuilding from
        # the full frontier every epoch (O(frontier) — measured ~5s/epoch
        # at a 300k frontier, and the whole frontier scan at 10^10).
        # Steady-state epochs take the CARRIED checkpoint (the bitmap
        # relation _job_bloom materialized last epoch — the same bytes it
        # wrote to disk) instead of re-reading the parquet: the table is
        # consumed twice per epoch (the probe here and the OR below), so
        # the disk form costs two O(m_bits) reads per epoch — a per-epoch
        # constant that is GBs at the 10^10 design point. The disk copy
        # stays the durable/resume form, exactly like the pending/seen
        # carries.
        # the CURRENT per-shard size comes from the previous commit record
        # (adaptive resize may have grown it past the params-derived
        # bootstrap value); probe positions are a function of m_bits, so
        # probing last epoch's table at any other size would be garbage.
        # Pre-resize job dirs have no record key → params default, which
        # is exactly the size every epoch used before the feature.
        m_bits = int((prev_state or {}).get("bloom_m_bits") or _bloom_m_bits(p))
        prev_bloom = os.path.join(_epoch_dir(p.job_dir, epoch - 1), "bloom")
        carried_bloom = (carry_io or {}).get("bloom")
        if carried_bloom is not None:
            shard_bitmaps = carried_bloom
        elif os.path.isdir(prev_bloom):
            shard_bitmaps = spark.read.parquet(prev_bloom)
        else:  # pre-incremental job dir → one full rebuild at fixed size
            shard_bitmaps = seen_ops.build_bloom_table_fixed(
                frontier_fps, m_bits, n_shards=p.bloom_shards
            )
        # first-wins dedup within the epoch must still run (it's not a
        # seen-set concern); enqueue_children handles it, so hand it the
        # bloom-thinned candidate set with an already-resolved seen check.
        # Shard-ROUTED probe: each task ships exactly one shard bitmap —
        # nothing is collected to the driver or broadcast whole. Only the
        # DISTINCT 8-byte fps travel through the Arrow/Python probe; the
        # wide child rows (url/domain strings) stay JVM-side and rejoin
        # via a semi join on url_fp — whose shuffle the first-wins window
        # in enqueue_children reuses (same partitioning key).
        cand_fps = children.select("url_fp").distinct()
        new_fps = seen_ops.filter_new_routed(
            cand_fps, frontier_fps, shard_bitmaps, m_bits,
            n_shards=p.bloom_shards,
        )
        thinned = children.join(new_fps, "url_fp", "left_semi")
        _t = time.perf_counter()
        new_rows = fr_ops.enqueue_children(
            thinned, frontier_fps.limit(0), epoch,
            small_hint=_small_epoch_hint(prev_state, big_pop),
        ).select(*FRONTIER_COLS)
        _ph["enqueue_rank"] = time.perf_counter() - _t
    else:
        new_rows = fr_ops.enqueue_children(
            children, frontier_fps, epoch,
            small_hint=_small_epoch_hint(prev_state, big_pop),
        ).select(*FRONTIER_COLS)
    updated = fr_ops.apply_fetch_outcome(fetched, epoch).select(
        *FRONTIER_COLS, "seq", "status_code", "image_id"
    )
    blocked_rows = (
        blocked.withColumn("status", F.lit("robots_blocked"))
        .withColumn("epoch", F.lit(epoch))
        .select(*FRONTIER_COLS)
    )
    delta_rows = (
        updated.unionByName(_null_audit(blocked_rows))
        .unionByName(_null_audit(new_rows))
        .select(*SNAPSHOT_COLS)
    )
    # metrics ride the write action itself (CollectMetrics, see
    # _metric_exprs) — the aggregation source is the rows being written:
    # the full snapshot in cow mode, the touched rows in delta mode
    _obs = Observation()
    # Concurrent tail jobs (the delta write + chained compaction,
    # child_ctx, bloom, the two carry checkpoints, the pipelined
    # next-epoch pop, the metrics file) each consume only the commit
    # CHECKPOINT (stats_src — in delta mode the eager localCheckpoint
    # that is the epoch's one serial anchor; in cow mode the written
    # snapshot), the previous epoch's bloom table, or relations already
    # checkpointed/persisted (pending, frontier_fps) — they are mutually
    # independent (ordering within a job is by chaining: compact after
    # the delta write, prepop after the pending carry), so they run
    # CONCURRENTLY from driver threads after the anchor. Serially each is
    # a small job whose cost is dominated by fixed driver/job-launch
    # latency — the per-epoch Amdahl term the fat-epoch sched pairs
    # measure; overlapping them collapses k fixed latencies into ~one,
    # and lets the write's IO overlap the pipelined pop's compute.
    # Each job's plan and output bytes are identical to the serial order
    # (no task reads another's output), so crawl logs stay byte-exact —
    # asserted by the cow≡delta and parallelism-independence equivalence
    # suites. SCT_SERIAL_EPOCH_TAIL=1 restores the serial order for
    # profiling A/B.
    tail: list = []
    # Old carry-handle (and the commit checkpoint's) unpersists are
    # DEFERRED past the tail barrier: tail jobs run concurrently and
    # _job_bloom's resize branch scans frontier_fps — in the delta+carry
    # path a union over the SAME localCheckpointed seen layers
    # _job_carry_seen re-flattens (and used to unpersist) on compaction
    # epochs. Checkpointed blocks cannot be recomputed, so yanking them
    # mid-scan aborts the epoch whenever a resize coincides with a
    # compaction. Tail threads only APPEND here (GIL-atomic); the release
    # loop after the pool joins is the barrier.
    _post_tail_release: list = []
    if p.commit_mode == "delta":
        delta_rows = delta_rows.observe(_obs, *_metric_exprs(epoch))
        # O(touched) commit: only the rows this epoch changed hit disk,
        # PARTITIONED by pmod(domain_hash, N_LINEAGE_BUCKETS) — the
        # sandbox form of an Iceberg MERGE into a bucket-partitioned
        # table: an epoch touching k buckets writes k subdirs, and
        # bucket-scoped merge-on-read readers prune the rest at file
        # listing. A full compacted snapshot every compact_every epochs
        # bounds the delta chain the read path overlays.
        _t = time.perf_counter()
        # ONE file per touched bucket per epoch: without the repartition,
        # every shuffle task holding rows of a bucket opens its own file
        # under _dbucket=K (~tasks × buckets tiny files per layer), and
        # the merge-on-read resolve re-lists/opens ALL of them each epoch
        # — profiled as the delta-mode scale-killer (write phase sawtooth
        # 16→42 s across a compaction cycle at 150k images; serialized
        # file syscalls, exactly the small-file problem Iceberg solves
        # with bin-packing). The extra narrow shuffle is O(touched).
        # CHECKPOINT-FIRST commit: the epoch's one serial anchor is now
        # the eager localCheckpoint — it runs the whole transition dag
        # (fetch → children → dedup → rank) and pins the exact bytes the
        # commit will contain (metrics observed on the same action). The
        # parquet WRITE of those checkpointed bytes is pure IO, so it
        # moves into the concurrent tail where it overlaps the pipelined
        # next-epoch pop and the bloom/carry jobs. Commit semantics are
        # unchanged: the _COMMIT marker still gates on the ENTIRE tail
        # (write included) plus the fence, so a crash anywhere publishes
        # nothing and resume discards the partial epoch. Downstream
        # consumers (child_ctx, bloom fps, the carries) read the
        # checkpointed relation — the same rows the files get, without a
        # disk round-trip. The checkpoint keeps the post-repartition
        # layout (one partition per touched _dbucket), so the write still
        # produces ONE file per touched bucket (the bin-packing
        # invariant).
        ck = (
            delta_rows.withColumn(
                "_dbucket", F.pmod(F.col("domain_hash"), F.lit(N_LINEAGE_BUCKETS))
            )
            .repartition(N_LINEAGE_BUCKETS, F.col("_dbucket"))
            .localCheckpoint(eager=True)
        )
        _ph["ck"] = time.perf_counter() - _t

        def _job_delta_write() -> None:
            _t0 = time.perf_counter()
            ck.write.partitionBy("_dbucket").parquet(os.path.join(ed, "delta"))
            _ph["write"] = time.perf_counter() - _t0
            if epoch % p.compact_every == 0:
                # chained after the write: the compaction resolve reads
                # THIS epoch's delta files from disk
                _t1 = time.perf_counter()
                _read_frontier_state(
                    spark, p.job_dir, epoch, with_audit=True
                ).write.parquet(os.path.join(ed, "frontier"))
                _ph["compact"] = time.perf_counter() - _t1

        tail.append(("delta_write", _job_delta_write))
        stats_src = ck
        _post_tail_release.append(ck)  # last consumers run inside the tail
    else:
        touched = updated.select("url_fp").union(blocked_rows.select("url_fp"))
        untouched = fr.join(touched, "url_fp", "left_anti").select(*FRONTIER_COLS)
        next_fr = (
            _null_audit(untouched)
            .select(*SNAPSHOT_COLS)
            .unionByName(delta_rows)
            .observe(_obs, *_metric_exprs(epoch))
        )
        _t = time.perf_counter()
        next_fr.write.parquet(os.path.join(ed, "frontier"))
        _ph["write"] = time.perf_counter() - _t
        stats_src = spark.read.parquet(os.path.join(ed, "frontier"))
    if p.emit_child_context:
        # parent rows fetched THIS epoch are exactly the producers of this
        # epoch's children — one equi-join on parent_fp rebuilds the
        # cb_kwargs context (fetchsim.with_parent_context docstring).
        # Derived from the rows JUST WRITTEN (stats_src), not from the
        # new_rows/updated lineage: re-consuming those would re-run the
        # whole enqueue-rank pipeline for a third per-epoch action. This
        # epoch's children are exactly the written rows with epoch==e,
        # seq NULL (never popped) and status 'pending' (excludes the
        # robots_blocked carry-overs); its fetch attempts are the written
        # rows with epoch==e and seq set — the same frames by value.
        this_e = F.col("epoch") == epoch
        ctx_rows = fetchsim.with_parent_context(
            stats_src.filter(
                this_e & F.col("seq").isNull() & (F.col("status") == "pending")
            ).select("url", "url_fp", "parent_fp"),
            stats_src.filter(this_e & F.col("seq").isNotNull()),
        )
        def _job_child_ctx() -> None:
            _t0 = time.perf_counter()
            ctx_rows.write.parquet(os.path.join(ed, "child_ctx"))
            _ph["child_ctx"] = time.perf_counter() - _t0

        tail.append(("child_ctx", _job_child_ctx))
    if p.use_bloom:
        # broadcast-plus-delta maintenance: OR only this epoch's new fps
        # into the table and commit it with the epoch. The fps are read
        # back from the JUST-WRITTEN rows (same derivation as carry_seen
        # below: epoch==e, status pending, never popped → seq null), NOT
        # from the new_rows lineage — the bloom write is its own action,
        # and consuming the unpersisted enqueue-rank pipeline here would
        # re-run the whole children/probe/rank subtree the commit write
        # just computed (profiled at 6-22 s/epoch at 150k images — the
        # same cross-action recompute child_ctx and the carries already
        # avoid).
        committed_new_fps = stats_src.filter(
            (F.col("epoch") == epoch)
            & (F.col("status") == "pending")
            & F.col("seq").isNull()
        ).select("url_fp")

        bloom_rec = {"m_bits": m_bits}

        def _job_bloom() -> None:
            _t0 = time.perf_counter()
            # ADAPTIVE RESIZE (CrawlParams.bloom_resize_at): n_frontier —
            # the post-epoch seen-key count, bound in this scope by the
            # commit write before the tail runs — against design capacity
            # m_bits·shards/BITS_PER_KEY. Over the threshold the OR step
            # is replaced by ONE full rebuild at the next power-of-two
            # size that fits 2·n_frontier: O(frontier) once, amortized
            # O(1)/key by doubling. The rebuild consumes frontier_fps ∪
            # committed_new_fps (pre-epoch seen set + the just-committed
            # rows), never the carry_seen job's output — tail jobs run
            # concurrently and may not order.
            cap_keys = (m_bits * p.bloom_shards) // seen_ops.BITS_PER_KEY
            if p.bloom_resize_at and n_frontier > p.bloom_resize_at * cap_keys:
                bloom_rec["m_bits"] = seen_ops.bloom_m_bits(
                    2 * n_frontier, p.bloom_shards
                )
                new_table = seen_ops.build_bloom_table_fixed(
                    frontier_fps.unionByName(committed_new_fps),
                    bloom_rec["m_bits"],
                    n_shards=p.bloom_shards,
                )
            else:
                new_table = seen_ops.bloom_or_new(
                    shard_bitmaps,
                    committed_new_fps,
                    m_bits,
                    n_shards=p.bloom_shards,
                )
            if carry_io is not None:
                # materialize once, then BOTH the disk write and next
                # epoch's two consumers read the checkpointed blocks —
                # disk bytes and carried bytes are the same relation by
                # construction. The old handle is released only after
                # the replacement exists AND the tail barrier passes:
                # on the OR path its last consumer is the OR job the
                # checkpoint just ran; on the resize path it is simply
                # unused (the rebuild reads frontier_fps, not the old
                # table) — either way post-tail release is safe.
                new_table = new_table.localCheckpoint(eager=True)
                new_table.write.parquet(os.path.join(ed, "bloom"))
                old = carry_io.get("bloom")
                carry_io["bloom"] = new_table
                if old is not None:
                    _post_tail_release.append(old)
            else:
                new_table.write.parquet(os.path.join(ed, "bloom"))
            _ph["bloom_write"] = time.perf_counter() - _t0

        tail.append(("bloom", _job_bloom))
    if p.commit_mode == "delta" and carry_io is not None and p.use_bloom:
        # next epoch's pending state = this epoch's pending minus every
        # touched fp, plus the touched rows that are pending after the
        # transition (new children + retried pops) — derived from the
        # COMMIT CHECKPOINT (stats_src = the eager localCheckpoint whose
        # rows the delta write persists), so the carried set shares no
        # lineage with handles that are unpersisted below;
        # _post_tail_release defers the old checkpoint's release past
        # its tail consumers. O(pending) anti-join against an O(touched)
        # side + an eager checkpoint.
        nxt = (
            pending.join(stats_src.select("url_fp"), "url_fp", "left_anti")
            .select(*FRONTIER_COLS)
            .unionByName(
                stats_src.filter(F.col("status") == "pending").select(
                    *FRONTIER_COLS
                )
            )
        )

        def _job_carry_pending() -> None:
            _t0 = time.perf_counter()
            carry_io["pending"] = nxt.localCheckpoint(eager=True)
            _ph["carry_pending"] = time.perf_counter() - _t0
            # EPOCH PIPELINING (CrawlParams.pipeline_pop): with the next
            # pending checkpoint materialized, epoch k+1's pop/rank is
            # pure compute over it — its data-dependent hints (salt,
            # big_pop, seq_base) come from THIS epoch's commit-record
            # values, all bound before the tail ran. Building it here
            # overlaps the rank's CPU with the sibling tail jobs' commit
            # IO; the next run_epoch identity-checks the handoff
            # (pre["fr"] is fr) and rebuilds on any mismatch, and a
            # prepop failure must not fail THIS epoch's committed work —
            # the fallback rebuild is byte-identical by construction.
            if (
                p.pipeline_pop
                and os.environ.get("SCT_PIPELINE_POP") != "0"
                and n_pending > 0
                and epoch + 1 <= p.max_epochs
            ):
                _t1 = time.perf_counter()
                caches2: list = []
                pop2 = None
                try:
                    nview = {"popped": n_popped, "pending": n_pending}
                    pnd2, alw2, blk2, pop2, big2 = _build_popped(
                        p, carry_io["pending"], domains, robots,
                        seq_base + n_popped, nview, caches2,
                    )
                    pop2.count()  # materialize the rank into the persist
                    carry_io["prepop"] = {
                        "epoch": epoch + 1,
                        "fr": carry_io["pending"],
                        "pending": pnd2,
                        "allowed": alw2,
                        "blocked": blk2,
                        "popped": pop2,
                        "big_pop": big2,
                        "caches": caches2,
                    }
                except Exception as exc:
                    # correctness-safe (next epoch rebuilds identically),
                    # but NOT silent: count + warn so a systematically
                    # failing prepop can't disable pipelining invisibly,
                    # and release everything the partial build persisted
                    # (pop2 persists inside _build_popped before the
                    # count, so it may be live without being in caches2)
                    global PREPOP_FALLBACKS
                    PREPOP_FALLBACKS += 1
                    _ph["prepop_fallback"] = 1.0
                    _log.warning(
                        "pipelined prepop for epoch %d failed, falling "
                        "back to serial rebuild: %r", epoch + 1, exc,
                    )
                    if pop2 is not None:
                        try:
                            pop2.unpersist()
                        except Exception:
                            pass
                    for _c in caches2:
                        try:
                            _c.unpersist()
                        except Exception:
                            pass
                    carry_io.pop("prepop", None)
                _ph["prepop"] = time.perf_counter() - _t1

        tail.append(("carry_pending", _job_carry_pending))
        # seen fps grow append-only: this epoch's NEW rows (pending,
        # never popped → seq null; excludes robots_blocked carry-overs
        # and the seq-stamped fetch outcomes, which are all already
        # seen) are by construction disjoint from the seen set — a plain
        # union IS a set, no distinct shuffle needed
        new_fps = stats_src.filter(
            (F.col("status") == "pending") & F.col("seq").isNull()
        ).select("url_fp")
        # INCREMENTAL seen checkpoints: re-materializing the full seen set
        # every epoch is O(seen) per-epoch work that grows without bound —
        # at the 10^10 design point it is a TB-scale copy per epoch,
        # exactly the term delta mode exists to remove. Instead checkpoint
        # only this epoch's NEW fps (O(touched)) and carry the seen set as
        # a lazy union of flat checkpointed scans; the layer list is
        # re-flattened into one checkpoint every compact_every epochs (the
        # same knob that bounds the delta-file chain), so plan depth stays
        # ≤ compact_every and old layer handles are released only after
        # the flattened replacement exists.
        def _job_carry_seen() -> None:
            _t0 = time.perf_counter()
            seen_parts = carry_io.setdefault("seen_parts", [])
            old_seen = carry_io.get("seen")
            if old_seen is None or len(seen_parts) >= p.compact_every:
                flat = frontier_fps.unionByName(new_fps).localCheckpoint(
                    eager=True
                )
                # old layers released post-tail, never here: _job_bloom's
                # resize branch may still be scanning frontier_fps (a
                # union over these very layers) in a sibling thread
                _post_tail_release.extend(seen_parts)
                seen_parts[:] = [flat]
                carry_io["seen"] = flat
            else:
                inc = new_fps.localCheckpoint(eager=True)
                seen_parts.append(inc)
                carry_io["seen"] = old_seen.unionByName(inc)
            _ph["carry_seen"] = time.perf_counter() - _t0

        tail.append(("carry_seen", _job_carry_seen))
        release_fr = True
    else:
        release_fr = False
    # ---- metrics (A3/A4 counter tree) — collected DURING the write via
    # DataFrame.observe (_metric_exprs): the counter tree and the 16
    # per-bucket lineage counters (north rule: "every frontier epoch
    # checkpoints per-partition lineage and fetch metrics") cost no extra
    # scan or job — the write action's tasks merge them as accumulators.
    # In delta mode the frontier-wide counters (pending/total) are carried
    # INCREMENTALLY from the previous commit record, so per-epoch metric
    # cost is O(touched) too.
    _t = time.perf_counter()
    vals = _obs.get  # ready: the commit checkpoint/write action above ran
    lineage = [
        {"b": b, "n": int(vals[f"pop_b{b}"] or 0)}
        for b in range(N_LINEAGE_BUCKETS)
        if int(vals[f"pop_b{b}"] or 0) > 0
    ]
    agg = {k: int(vals[k] or 0) for k in _AGG_KEYS}
    _ph["agg"] = time.perf_counter() - _t
    n_popped = int(agg["n_popped"] or 0)
    if p.commit_mode == "delta":
        assert prev_state is not None, "delta mode needs the previous commit record"
        n_new = int(agg["n_new"] or 0)
        # pending' = pending - (popped that ended) - blocked + new;
        # retried pops stay pending, untouched rows are untouched
        n_pending = (
            int(prev_state["pending"])
            - int(agg["n_ended"] or 0)
            - int(agg["n_blocked"] or 0)
            + n_new
        )
        n_frontier = int(prev_state["n_frontier"]) + n_new
    else:
        n_pending = int(agg["n_pending"] or 0)
        n_frontier = int(agg["n_frontier"])
    metrics = [
        (epoch, "pop/total", n_popped),
        (epoch, "push/new_urls", int(agg["n_new"] or 0)),
        (epoch, "robots/blocked", int(agg["n_blocked"] or 0)),
        (epoch, "frontier/pending_after", n_pending),
    ] + [
        (epoch, f"fetch/status/{sc}", int(agg[f"sc_{sc}"] or 0))
        for sc in (200, 404, 429, 503, 520)
        if int(agg[f"sc_{sc}"] or 0) > 0
    ] + [
        (epoch, f"lineage/bucket/{int(r['b'])}", int(r["n"]))
        for r in sorted(lineage, key=lambda r: int(r["b"]))
    ]
    # SQL VALUES → LocalRelation: createDataFrame(list) planned a Python
    # RDD with defaultParallelism slices, spawning one Python worker per
    # core to serve ~20 driver-local rows (6s/epoch at local[32])
    values = ",".join(
        f"({e},'{k}',{int(n)})" for e, k, n in metrics
    )

    def _job_metrics() -> None:
        _t0 = time.perf_counter()
        spark.sql(
            "SELECT CAST(epoch AS INT) epoch, metric_key, CAST(n AS BIGINT) n "
            f"FROM VALUES {values} AS t(epoch, metric_key, n)"
        ).coalesce(1).write.parquet(os.path.join(ed, "metrics"))
        _ph["metrics"] = time.perf_counter() - _t0

    tail.append(("metrics", _job_metrics))

    # ---- run the independent tail jobs concurrently (see the `tail`
    # comment above); per-task _ph phases overlap, so their sum exceeds
    # the `tail` wall — that difference IS the latency the overlap hides
    _t = time.perf_counter()
    if os.environ.get("SCT_SERIAL_EPOCH_TAIL") == "1" or len(tail) <= 1:
        for _name, _job in tail:
            _job()
    else:
        with ThreadPoolExecutor(max_workers=len(tail)) as _ex:
            _futs = [(n, _ex.submit(j)) for n, j in tail]
            _first_err = None
            for _name, _fut in _futs:
                try:
                    _fut.result()
                except Exception as exc:  # join ALL before re-raising
                    if _first_err is None:
                        _first_err = exc
            if _first_err is not None:
                raise _first_err
    _ph["tail"] = time.perf_counter() - _t

    for _h in _post_tail_release:
        _h.unpersist()
    if release_fr:
        fr.unpersist()
    fetched.unpersist()
    popped.unpersist()
    children.unpersist()
    for _c in _caches:
        _c.unpersist()
    if os.environ.get("SCT_EPOCH_TIMING") == "1":
        _ph["total"] = time.perf_counter() - _t_epoch
        print(
            f"EPOCH_TIMING {epoch} "
            + " ".join(f"{k}={v:.2f}" for k, v in _ph.items()),
            flush=True,
        )

    rec = {
        "epoch": epoch,
        "seq_base": seq_base + n_popped,
        "pending": n_pending,
        "popped": n_popped,
        "n_frontier": n_frontier,
        # current per-shard bitmap size — next epoch's probe reads it
        # (positions are a function of m_bits) and resume restores it
        **({"bloom_m_bits": bloom_rec["m_bits"]} if p.use_bloom else {}),
    }
    # Fencing: the epoch's data files are all written by now, but nothing
    # is visible until the _COMMIT marker lands. If this writer's job
    # lease was broken or usurped while it computed (it was presumed dead
    # but wasn't — the classic zombie writer), publishing would interleave
    # two writers' epochs. Abort instead; the orphan files are invisible
    # without the marker and the next resume overwrites them.
    if fence is not None and not fence():
        raise locking.WriterConflict(
            f"job writer lease for {p.job_dir} lost before committing "
            f"epoch {epoch}; aborting without publishing"
        )
    with open(_commit_path(p.job_dir, epoch), "w") as f:
        json.dump(rec, f)
    return rec


def run_crawl(spark: SparkSession, p: CrawlParams, resume: bool = True) -> dict:
    """Run (or resume) the crawl to termination (Q8) or the epoch cap.

    Holds the job-dir writer lease (locking.pid_lock) for the duration:
    a second live ``run_crawl`` on the same job_dir raises WriterConflict
    instead of interleaving commits, a lease left by a CRASHED writer is
    broken automatically (resume then picks up from its last _COMMIT),
    and every epoch re-checks ownership before publishing its marker
    (see the fence in run_epoch). Stand-in for a table format's
    optimistic-commit protocol — locking.py module docstring.

    Returns {"epochs": E, "total_fetched": n, ...} summary."""
    with locking.pid_lock(
        p.job_dir, timeout_s=p.lock_timeout_s, what="crawl job"
    ) as lock:
        with _epoch_aqe_off(spark):
            return _run_crawl_locked(spark, p, resume, lock)


@contextmanager
def _epoch_aqe_off(spark: SparkSession):
    """Run the epoch loop with AQE disabled, restoring the session conf on
    exit (`SCT_EPOCH_AQE=1` keeps it on).

    Measured, not guessed (r4, s500 universe, 17 epochs, 3,095,947 URLs,
    8 pinned cores, identical fetch counts all three ways): AQE fully on
    524 s; AQE on with the adaptive broadcast threshold back at the 10 MB
    static default 453 s; AQE OFF 355 s — a 48% wall tax. The epoch loop
    is hundreds of SMALL actions per crawl over inputs the driver has
    already sized and localCheckpointed: AQE's per-stage materialization
    barriers and re-planning buy nothing here (the deterministic ranks
    fix their own partitioning; the payload join picks broadcast vs
    SHUFFLE_HASH from the popped-batch cap explicitly), while its runtime
    broadcast flips rebuild driver-side hash relations every epoch. Crawl
    output is plan-independent (tests/test_crawl_equivalence.py), so the
    toggle affects time only. Ad-hoc catalog queries keep AQE: one big
    query per action is exactly the regime AQE is built for."""
    if os.environ.get("SCT_EPOCH_AQE") == "1":
        yield
        return
    key = "spark.sql.adaptive.enabled"
    prev = spark.conf.get(key, "true")
    spark.conf.set(key, "false")
    try:
        yield
    finally:
        spark.conf.set(key, prev)


def _run_crawl_locked(
    spark: SparkSession, p: CrawlParams, resume: bool, lock: str
) -> dict:
    tokens: dict[str, str] = {}
    dim_handles: list = []
    carry: dict = {}  # bound before the try so the finally can drain it
    if p.proxies_path:
        from ..operators import proxies as proxy_ops

        tokens = proxy_ops.lease_tokens(spark, p.proxies_path)
    try:
        last = last_committed_epoch(p.job_dir) if resume else None
        resumed = last is not None
        if last is None:
            if os.path.isdir(p.job_dir):
                shutil.rmtree(p.job_dir)
            os.makedirs(p.job_dir, exist_ok=True)
            bootstrap(spark, p)
            last = 0
        state = read_commit(p.job_dir, last)
        # resume-time carry warm-up: the resumed process's first epoch
        # falls back to the disk resolve (run_epoch layer 2), which walks
        # base ⊕ every delta since the last compaction — at a 10^5-epoch
        # job dir that one resolve is unbounded if the job died long
        # after its last compaction. Compact ONCE up front when the chain
        # exceeds the cadence, so the first resolve reads base ⊕ ≤
        # compact_every layers — the same bound a live run maintains.
        if (
            resumed
            and p.commit_mode == "delta"
            and last > 0
            and last - _frontier_base_epoch(p.job_dir, last) >= p.compact_every
        ):
            _compact_snapshot(spark, p.job_dir, last)
        epoch = last
        # `carry` (bound above the try) holds the checkpointed pending
        # frontier between delta-mode epochs (run_epoch docs) — epochs
        # after the first touch no O(frontier) disk resolve; deltas stay
        # the durable log
        if p.cache_dims:
            # Dim tables are re-read from parquet by EVERY epoch otherwise
            # — a per-epoch fixed cost (scan stage launch + file listing ×
            # hundreds of epochs) that never shrinks with cores. Cache
            # them once for the loop. The payload-join projection of the
            # corpus is cached PRE-PARTITIONED AND PRE-SORTED on the join
            # keys, so each epoch's payload join satisfies its required
            # distribution/ordering straight from the cache: the corpus
            # side's exchange AND sort vanish from every epoch's plan —
            # only the O(popped) side is ever shuffled. At 10^10 this
            # cached projection is ~24 B/row spread across the fleet
            # (spilling to local disk where it doesn't fit); the wide
            # payload bytes are NOT cached — they stay behind the
            # bucket-pruned scan.
            from pyspark.storagelevel import StorageLevel

            n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
            im = (
                spark.read.parquet(p.images_path)
                .select("image_id", "img_bucket", "phash")
                .repartition(n_part, "img_bucket", "image_id")
                .sortWithinPartitions("img_bucket", "image_id")
                .persist(StorageLevel.MEMORY_AND_DISK)
            )
            dom = spark.read.parquet(p.domains_path).persist(
                StorageLevel.MEMORY_AND_DISK
            )
            rob = spark.read.parquet(p.robots_path).persist(
                StorageLevel.MEMORY_AND_DISK
            )
            im.count(), dom.count(), rob.count()  # materialize once, up front
            carry["dims"] = {"images": im, "domains": dom, "robots": rob}
            dim_handles = [im, dom, rob]
        while state["pending"] > 0 and epoch < p.max_epochs:
            epoch += 1
            state = run_epoch(
                spark, p, epoch, state["seq_base"], state.get("n_frontier"),
                prev_state=state,
                fence=lambda: locking.owns_lock(lock),
                carry_io=carry,
            )
    finally:
        # a crawl that aborts after a tail stored a prepop (fence failure
        # or a later-epoch error) would otherwise leak the prepop's
        # persisted popped handle and its rank caches — only the next
        # epoch's consume/identity-reject path releases them (ADVICE r5)
        _pre = carry.pop("prepop", None)
        if _pre:
            for _h in [_pre.get("popped"), *_pre.get("caches", ())]:
                try:
                    _h.unpersist()
                except Exception:
                    pass
        for _h in dim_handles:
            _h.unpersist()
        if tokens:
            proxy_ops.release_tokens(spark, p.proxies_path, tokens)
    return {
        "epochs": epoch,
        "total_fetched": state["seq_base"],
        "pending": state["pending"],
        "done": state["pending"] == 0,
        **({"proxy_tokens": tokens} if tokens else {}),
    }


def read_crawl_log(spark: SparkSession, job_dir: str) -> DataFrame:
    """The crawl-order contract: per epoch, the snapshot rows that were
    fetched that epoch (seq non-null ∧ epoch == e) — the log is a
    projection of the snapshots, not a second table.

    ONE multi-path scan, not a per-epoch union loop: at 10^5 epochs a
    Union of 10^5 per-epoch reads is a driver-side plan explosion. The
    per-epoch filter (epoch == e, which in cow mode picks THIS epoch's
    fetch attempts out of a snapshot that carries every prior epoch's
    rows — a retried URL logs once per attempt) is recovered from the
    file path instead: ``recursiveFileLookup`` turns off partition
    inference (the per-epoch roots would otherwise make Spark infer
    conflicting epoch/_dbucket partition columns over the common
    ancestor) and ``input_file_name`` still carries ``epoch=N/``."""
    last = last_committed_epoch(job_dir)
    srcs = []
    for e in range(1, (last or 0) + 1):
        if not os.path.exists(_commit_path(job_dir, e)):
            continue
        ddir = os.path.join(_epoch_dir(job_dir, e), "delta")
        srcs.append(
            ddir
            if os.path.isdir(ddir)
            else os.path.join(_epoch_dir(job_dir, e), "frontier")
        )
    if not srcs:
        return None
    snap = spark.read.option("recursiveFileLookup", "true").parquet(*srcs)
    src_epoch = F.regexp_extract(
        F.input_file_name(), r"epoch=(\d+)/", 1
    ).cast("long")
    return snap.filter(
        (F.col("epoch") == src_epoch) & F.col("seq").isNotNull()
    ).select(
        "epoch", "seq", "url_fp", "domain", "queue_kind", "status_code", "image_id"
    )


def read_final_frontier(spark: SparkSession, job_dir: str) -> DataFrame:
    last = last_committed_epoch(job_dir)
    snap = os.path.join(_epoch_dir(job_dir, last), "frontier")
    if os.path.isdir(snap):
        return spark.read.parquet(snap)
    return _read_frontier_state(spark, job_dir, last, with_audit=True)
