"""Cross-process writer leases with PID-based stale-breaking and fencing.

Two mutable stores need single-writer discipline: the proxy-token table
(operators/proxies.py — the reference's ``proxies`` Mongo collection,
kafka_monitor/main.py:29-58) and a crawl job directory (plans/epoch.py —
the reference's per-spider Mongo state). A real table format would give
us optimistic-commit conflict detection (Iceberg's commit exchange, Delta's
LogStore ``putIfAbsent``); no such jar exists in this container (see
BENCH/BASELINE.md, "Iceberg note"), so this module is the documented
stand-in: an O_EXCL lock file recording the holder PID, broken only when
that PID is provably dead, plus an ownership check (:func:`owns_lock`)
writers call immediately before publishing a commit marker — the
fencing-token pattern, so a usurped writer can never make a torn epoch
visible.

Single filesystem only (os.O_EXCL + os.kill(pid, 0)); that is exactly the
sandbox's scope. On a real deployment this layer is replaced wholesale by
the table format's commit protocol, not scaled up.
"""

from __future__ import annotations

import contextlib
import os
import time


class WriterConflict(TimeoutError):
    """Another live process holds the writer lease (or usurped it).

    Subclasses TimeoutError: the acquire path raises it after waiting out
    ``timeout_s`` on a live holder, and callers that pre-dated the shared
    module caught TimeoutError."""


@contextlib.contextmanager
def pid_lock(
    path: str,
    timeout_s: float = 30.0,
    poll_s: float = 0.05,
    what: str = "table",
):
    """Advisory writer lease for a read-modify-write on ``path``: an
    O_EXCL lock file next to the target, holding the owner's PID.

    A lock whose recorded holder is DEAD is broken and retaken via atomic
    rename (exactly one concurrent breaker wins; losers loop and
    re-check) — a writer that crashes mid-commit would otherwise strand
    its lock forever. A lock held by a LIVE process is honored until the
    timeout, then :class:`WriterConflict` is raised.

    Yields the lock-file path so the holder can re-check ownership with
    :func:`owns_lock` before publishing (fencing)."""
    lock = path.rstrip("/") + ".lock"
    deadline = time.monotonic() + timeout_s
    while True:
        try:
            fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.write(fd, str(os.getpid()).encode())
            os.close(fd)
            break
        except FileExistsError:
            if _holder_dead(lock):
                stale = f"{lock}.stale.{os.getpid()}"
                try:
                    os.rename(lock, stale)
                    os.unlink(stale)
                except FileNotFoundError:
                    pass
                continue
            if time.monotonic() >= deadline:
                raise WriterConflict(
                    f"{what} writer lease held by a live process: {lock} "
                    f"(if that process is wedged, delete the lock file and "
                    f"rerun)"
                )
            time.sleep(poll_s)
    try:
        yield lock
    finally:
        try:
            if owns_lock(lock):
                os.unlink(lock)
        except FileNotFoundError:
            pass


def owns_lock(lock: str) -> bool:
    """True iff the lock file still records THIS process as holder.

    The fencing check: a writer calls this immediately before making new
    state visible (the ``_COMMIT`` marker write, the table-dir rename).
    If another process broke or replaced the lease, the check fails and
    the stale writer must abort instead of publishing."""
    try:
        with open(lock) as f:
            return int(f.read().strip() or "0") == os.getpid()
    except (OSError, ValueError):
        return False


def _holder_dead(lock: str) -> bool:
    """True iff the lock file names a PID that no longer exists.
    Unreadable or empty lock files (pre-upgrade, or racing with creation)
    are treated as live so we never break a lock we can't attribute."""
    try:
        with open(lock) as f:
            pid = int(f.read().strip() or "0")
    except (OSError, ValueError):
        return False
    if pid <= 0:
        return False
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return True
    except PermissionError:
        return False
    return False
