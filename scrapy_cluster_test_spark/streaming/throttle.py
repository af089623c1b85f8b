"""Stateful streaming politeness throttle: per-domain dispatch budgets
carried across micro-batches with ``applyInPandasWithState``.

Reference parity: this reference fork enforces per-domain politeness
through its download-delay / rate-limit configs (DOWNLOAD_DELAY and the
per-crawler MAX_REQUESTS_PER_SECOND cap, core/.../scrapy/constants.py —
SURVEY Q4; the Redis throttled-queue moderation belongs to upstream
scrapy-cluster, which this fork replaced with Mongo and does not ship);
the batch engine implements the same contract per epoch in
``frontier.pop_batch`` (operators/frontier.py). This module is the
streaming form: a continuous
stream of candidate fetch requests is throttled so each domain dispatches
at most ``budget`` requests over the stream's lifetime, with the per-domain
``used`` counter held in Spark's state store — the piece a stateless
window cannot express, because a micro-batch must see how much budget
EARLIER batches already spent.

Semantics (deterministic, wall-clock free):

* within a micro-batch, a domain's candidates are ordered by
  (priority, crawl_time, url_fp) — the same POP_ORDER the batch engine
  uses — and the first ``budget - used`` are dispatched;
* ``dispatch_seq`` numbers a domain's dispatches 0..budget-1 across the
  whole stream (batch-major: everything dispatched in batch k precedes
  batch k+1), so downstream sinks get a stable per-domain order;
* state is one int per domain — O(domains) state, never O(requests):
  the state store holds exactly the per-domain spent-budget counter the
  reference's rate caps imply (upstream scrapy-cluster kept the same
  counter in a per-domain Redis window key).

Arrow-batched via pandas on both the input and state sides (no
row-at-a-time Python); the grouping key is the domain, so hot domains
land in one task per batch — the same skew surface the batch engine's
salted pop handles, bounded here by ``budget`` itself (a group never
emits more than the remaining budget).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# candidate schema the throttle consumes; mirrors the pop projection
REQUEST_COLS = ["domain", "url_fp", "priority", "crawl_time"]

_OUT_SCHEMA = (
    "domain string, url_fp long, priority int, crawl_time long, "
    "dispatch_seq int"
)
_STATE_SCHEMA = "used int"

# POP_ORDER equivalent for pandas-side sorting (frontier.POP_ORDER is
# Column expressions; the throttle sorts the same keys ascending)
_ORDER = ["priority", "crawl_time", "url_fp"]


def _throttle_fn(budget: int):
    def fn(
        key: Any,
        pdf_iter: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        used = state.get[0] if state.exists else 0
        pdf = pd.concat(list(pdf_iter), ignore_index=True)
        if used < budget and len(pdf):
            take = pdf.sort_values(_ORDER, kind="mergesort").head(
                budget - used
            )
            out = take.reset_index(drop=True)[REQUEST_COLS].copy()
            out["dispatch_seq"] = range(used, used + len(out))
            used += len(out)
            yield out
        state.update((used,))

    return fn


def throttled_dispatch(requests: DataFrame, budget: int) -> DataFrame:
    """Throttle a (streaming) candidate DataFrame to ``budget`` dispatches
    per domain over the stream's lifetime.

    ``requests`` must carry REQUEST_COLS. On a single-batch stream this
    equals the batch engine's per-domain budget rank (the parity the tests
    pin); across batches it is the strictly stronger stateful contract.
    """
    if int(budget) <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    return (
        requests.select(*REQUEST_COLS)
        .groupBy("domain")
        .applyInPandasWithState(
            _throttle_fn(int(budget)),
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def reference_fold(batches: list[pd.DataFrame], budget: int) -> pd.DataFrame:
    """Driver-side oracle: the same contract as a plain pandas fold over
    the micro-batches in order. Test-side truth only."""
    used: dict[str, int] = {}
    outs = []
    for pdf in batches:
        for dom, grp in pdf.groupby("domain", sort=True):
            u = used.get(dom, 0)
            take = grp.sort_values(_ORDER, kind="mergesort").head(
                max(0, budget - u)
            )
            if len(take):
                out = take.reset_index(drop=True)[REQUEST_COLS].copy()
                out["dispatch_seq"] = range(u, u + len(out))
                outs.append(out)
                used[dom] = u + len(out)
    if not outs:
        return pd.DataFrame(columns=REQUEST_COLS + ["dispatch_seq"])
    return pd.concat(outs, ignore_index=True)
