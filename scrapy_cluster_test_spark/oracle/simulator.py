"""Single-threaded pure-Python crawl simulator — the equivalence oracle.

Implements EXACTLY the deterministic rules of crawlspec.py + the epoch
driver (SURVEY §5: mirrors the reference's golden-fixture test style; §7
"hard parts": the Spark engine's crawl log sorted by seq must match this
byte-for-byte).

Independence from the engine: no Spark, no DataFrames — dicts and sorted
lists, reading the images parquet via pyarrow. Shares only crawlspec (the
semantics contract) and the pure-Python urlkit/xxh64 mirrors (whose parity
with the native Spark expressions is separately asserted in
tests/test_urlkit.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyarrow.parquet as pq

from .. import crawlspec as spec
from ..functions.urlkit import py_canonicalize, py_domain_hash, py_url_fingerprint

N_LINEAGE_BUCKETS = 16  # must match plans/epoch.py


@dataclass
class SimRow:
    url: str
    url_fp: int
    domain: str
    domain_id: int
    queue_kind: str
    priority: int
    crawl_time: int
    retry_times: int = 0
    provider: str = "crawlera"
    status: str = "pending"
    parent_fp: int | None = None
    epoch: int = 0


@dataclass
class SimResult:
    crawl_log: list[tuple] = field(default_factory=list)  # (epoch, seq, url_fp, domain, kind, status_code, image_id)
    frontier: dict[int, SimRow] = field(default_factory=dict)
    metrics: list[tuple] = field(default_factory=list)  # (epoch, key, n)
    epochs: int = 0

    @property
    def seen_set(self) -> set[int]:
        return set(self.frontier.keys())


def _kind_rank(kind: str) -> int:
    return 0 if kind == "seller" else 1


def _make_row(url: str, kind: str, crawl_time: int, epoch: int, parent_fp=None) -> SimRow:
    canon = py_canonicalize(url)
    fp = py_url_fingerprint(canon)
    # domain id parsed back from the canonical hostname dNNNN.example.com
    host = canon.split("//", 1)[1].split("/", 1)[0]
    did = int(host[1:5])
    return SimRow(
        url=canon,
        url_fp=fp,
        domain=host,
        domain_id=did,
        queue_kind=kind,
        priority=0,
        crawl_time=crawl_time,
        parent_fp=parent_fp,
        epoch=epoch,
    )


def simulate(
    images_path: str,
    seeds: list[tuple[str, str, int]],
    n_images: int,
    seller_cap: int = 5000,
    asin_cap: int = 2000,
    max_epochs: int = 50,
    budget_scale: float = 1.0,
) -> SimResult:
    tbl = pq.read_table(images_path, columns=["image_id", "phash"])
    phash_by_idx: dict[int, int] = {}
    for image_id, ph in zip(tbl["image_id"].to_pylist(), tbl["phash"].to_pylist()):
        phash_by_idx[int(image_id[3:])] = ph

    res = SimResult()
    for url, kind, ct in seeds:
        row = _make_row(url, kind, ct, 0)
        if row.url_fp not in res.frontier:
            res.frontier[row.url_fp] = row

    seq_base = 0
    epoch = 0
    while epoch < max_epochs:
        pending = [r for r in res.frontier.values() if r.status == "pending"]
        if not pending:
            break
        epoch += 1

        # robots gate (Q13)
        allowed: list[SimRow] = []
        n_blocked = 0
        for r in pending:
            if spec.robots_allow(r.domain_id, spec.path_bucket_of_fp(r.url_fp)):
                allowed.append(r)
            else:
                r.status = "robots_blocked"
                r.epoch = epoch
                n_blocked += 1

        # per-domain politeness budget (Q1/Q4)
        order_key = lambda r: (
            _kind_rank(r.queue_kind),
            r.priority,
            r.crawl_time,
            r.url_fp,
        )
        allowed.sort(key=order_key)
        by_domain_count: dict[int, int] = {}
        survivors: list[SimRow] = []
        for r in allowed:
            c = by_domain_count.get(r.domain_id, 0)
            if c < spec.domain_budget(r.domain_id, budget_scale):
                by_domain_count[r.domain_id] = c + 1
                survivors.append(r)

        # per-kind global FIFO caps (the 5000/2000 epoch limits)
        kind_order = lambda r: (r.priority, r.crawl_time, r.url_fp)
        popped: list[SimRow] = []
        for kind, cap in (("seller", seller_cap), ("asin", asin_cap)):
            ks = sorted([r for r in survivors if r.queue_kind == kind], key=kind_order)
            popped.extend(ks[:cap])
        popped.sort(key=order_key)

        # fetch + log + state transition (Q6) + child discovery
        status_counts: dict[int, int] = {}
        lineage_counts: dict[int, int] = {}
        candidates: list[tuple[int, int, str, str, int]] = []  # (parent_seq, k, url, kind, parent_fp)
        for i, r in enumerate(popped):
            seq = seq_base + i + 1
            j = spec.image_index_of_url_path(r.url)
            ph = phash_by_idx[j]
            sc = spec.status_code(ph)
            status_counts[sc] = status_counts.get(sc, 0) + 1
            b = py_domain_hash(r.domain) % N_LINEAGE_BUCKETS
            lineage_counts[b] = lineage_counts.get(b, 0) + 1
            res.crawl_log.append(
                (epoch, seq, r.url_fp, r.domain, r.queue_kind, sc, f"img{j:010d}")
            )
            if sc == 200:
                r.status = "done"
                ck = spec.child_kind(r.queue_kind)
                for k in range(spec.n_children(ph)):
                    cj = spec.child_index(ph, k, n_images)
                    candidates.append((seq, k, spec.page_url(ck, cj), ck, r.url_fp))
            elif r.retry_times < spec.RETRY_TIMES_MAX:
                if r.retry_times >= 1:
                    r.provider = (
                        "proxycrawl" if r.provider == "crawlera" else "crawlera"
                    )
                r.retry_times += 1
                r.priority += spec.RETRY_PRIORITY_ADJUST
                # status stays pending
            else:
                r.status = "failed"
            r.epoch = epoch

        # enqueue children: first-wins dedup within epoch, anti-join vs seen
        candidates.sort(key=lambda c: (c[0], c[1]))
        n_new = 0
        epoch_seen: set[int] = set()
        base = (epoch + 1) * 1_000_000_000
        for pseq, k, url, kind, pfp in candidates:
            row = _make_row(url, kind, 0, epoch, parent_fp=pfp)
            if row.url_fp in epoch_seen or row.url_fp in res.frontier:
                continue
            epoch_seen.add(row.url_fp)
            row.crawl_time = base + n_new
            n_new += 1
            res.frontier[row.url_fp] = row

        n_pending = sum(1 for r in res.frontier.values() if r.status == "pending")
        res.metrics.append((epoch, "pop/total", len(popped)))
        res.metrics.append((epoch, "push/new_urls", n_new))
        res.metrics.append((epoch, "robots/blocked", n_blocked))
        res.metrics.append((epoch, "frontier/pending_after", n_pending))
        for sc, n in sorted(status_counts.items()):
            res.metrics.append((epoch, f"fetch/status/{sc}", n))
        for b, n in sorted(lineage_counts.items()):
            res.metrics.append((epoch, f"lineage/bucket/{b}", n))
        seq_base += len(popped)

    res.epochs = epoch
    return res
