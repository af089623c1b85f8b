"""Cuckoo filter: the deletable alternative to the Bloom seen-filter.

Public algorithm (Fan, Andersen, Kaminsky, Mitzenmacher, "Cuckoo Filter:
Practically Better Than Bloom", CoNEXT'14): each key stores an f-bit
fingerprint in one of two candidate buckets; the partner bucket is
``i ⊕ hash(fingerprint)``, so relocation never needs the original key.

Same deployment shape as operators/seen.py: build distributed per shard,
broadcast, probe vectorized, exact anti-join on positives. Deletion
support matters when seen-set entries expire (recrawl windows) — a Bloom
filter would need rebuild; a cuckoo filter deletes in place.

numpy-vectorized probe; insert is per-key Python but runs sharded inside
applyInPandas workers at build time, never in the query hot path.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .. import crawlspec as spec

_BUCKET_SIZE = 4
_MAX_KICKS = 500
_FP_BITS = 16  # fingerprint bits (stored in uint16; 0 = empty slot)


def _fingerprint(fps: np.ndarray) -> np.ndarray:
    """16-bit nonzero fingerprints from 64-bit key hashes."""
    f = (spec.mix64_np(fps.astype(np.uint64)) & np.uint64(0xFFFF)).astype(np.uint16)
    return np.where(f == 0, np.uint16(1), f)


def _index1(fps: np.ndarray, n_buckets: int) -> np.ndarray:
    return (
        spec.mix64_np(fps.astype(np.uint64) ^ np.uint64(0xC0C0)) % np.uint64(n_buckets)
    ).astype(np.int64)


def _alt_index(i: np.ndarray, f: np.ndarray, n_buckets: int) -> np.ndarray:
    h = spec.mix64_np(f.astype(np.uint64)) % np.uint64(n_buckets)
    return ((i.astype(np.uint64) ^ h) % np.uint64(n_buckets)).astype(np.int64)


@dataclass
class CuckooFilter:
    n_buckets: int
    table: np.ndarray  # (n_buckets, BUCKET_SIZE) uint16, 0 = empty
    # Victim cache: fingerprints evicted by an exhausted kick chain. Keeping
    # them here (checked by contains()) preserves the no-false-negative
    # contract even when the table overfills; a victim is a degraded slot
    # (fingerprint-only membership), not a lost key.
    victims: set = None

    def __post_init__(self):
        if self.victims is None:
            self.victims = set()

    @classmethod
    def create(cls, capacity: int) -> "CuckooFilter":
        n_buckets = 1 << int(np.ceil(np.log2(max(1, capacity) / _BUCKET_SIZE / 0.84 + 1)))
        return cls(n_buckets, np.zeros((n_buckets, _BUCKET_SIZE), np.uint16))

    # -- single-key ops (build/delete path) ------------------------------
    def _insert_one(self, i: int, f: int) -> bool:
        rng_state = f
        for idx in (i, int(_alt_index(np.array([i]), np.array([f], np.uint16), self.n_buckets)[0])):
            row = self.table[idx]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = f
                return True
        # relocate: random-walk kicks (deterministic: seeded by fingerprint)
        idx = i
        for k in range(_MAX_KICKS):
            rng_state = spec.mix64(rng_state + k)
            slot = rng_state % _BUCKET_SIZE
            f, self.table[idx, slot] = int(self.table[idx, slot]), np.uint16(f)
            idx = int(
                _alt_index(np.array([idx]), np.array([f], np.uint16), self.n_buckets)[0]
            )
            row = self.table[idx]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = f
                return True
        # Table overfull: the fingerprint displaced by the final kick would
        # otherwise vanish (a silent false negative for whichever key put it
        # there). Stash it in the victim cache instead.
        self.victims.add(int(f))
        return False

    def insert(self, keys: np.ndarray) -> int:
        """Insert keys; returns the number that landed in the victim cache
        (filter over capacity — membership still holds, but victim entries
        match on fingerprint alone and cannot be deleted; rebuild larger)."""
        f = _fingerprint(keys)
        i = _index1(keys, self.n_buckets)
        failed = 0
        for kk in range(len(keys)):
            if not self._insert_one(int(i[kk]), int(f[kk])):
                failed += 1
        return failed

    def delete(self, keys: np.ndarray) -> int:
        """Remove one fingerprint copy per present key; returns #deleted."""
        f = _fingerprint(keys)
        i1 = _index1(keys, self.n_buckets)
        i2 = _alt_index(i1, f, self.n_buckets)
        deleted = 0
        for kk in range(len(keys)):
            for idx in (int(i1[kk]), int(i2[kk])):
                row = self.table[idx]
                hit = np.nonzero(row == f[kk])[0]
                if len(hit):
                    row[hit[0]] = 0
                    deleted += 1
                    break
        return deleted

    # -- vectorized probe (query hot path) -------------------------------
    def contains(self, keys: np.ndarray) -> np.ndarray:
        f = _fingerprint(keys)
        i1 = _index1(keys, self.n_buckets)
        i2 = _alt_index(i1, f, self.n_buckets)
        in1 = (self.table[i1] == f[:, None]).any(axis=1)
        in2 = (self.table[i2] == f[:, None]).any(axis=1)
        hit = in1 | in2
        if self.victims:
            vic = np.isin(f, np.fromiter(self.victims, np.uint16))
            hit = hit | vic
        return hit
