"""Packed cuckoo-filter shard — the alternative URL-seen prefilter.

The north rule names a "partitioned Bloom/cuckoo URL-seen filter";
``seen.py`` ships Bloom sidecars by default and this module supplies
the cuckoo option (``SeenSet(filter_kind="cuckoo")``): a
(2,4)-cuckoo filter per shard — 2 candidate buckets per key
(partial-key cuckoo hashing, Fan et al., "Cuckoo Filter: Practically
Better Than Bloom"), 4 slots per bucket, 8-bit fingerprints.

Properties that matter for the seen-set contract:

- **No false negatives** while unsaturated: every inserted key's
  fingerprint is in one of its two buckets, so a negative probe is
  definitely-unseen and skips the exact-confirm join (same contract
  as the Bloom path; FP rate ≈ 2·4/255 ≈ 3% at 8-bit fingerprints).
- **Bounded memory, graceful saturation**: if an insert's eviction
  walk exceeds the kick budget (table past ~95% load), the shard
  flips a ``saturated`` flag and thereafter answers *maybe* for
  every probe — correctness degrades to "confirm everything against
  the exact table", never to a false negative. Size shards so this
  doesn't happen (4 slots × n_buckets ≥ 1.05× expected keys).
- **Deletion support** (the structural advantage over Bloom): a
  fingerprint can be removed, so an incremental rollback could
  delete one round's keys instead of rebuilding the shard; the
  engine's rollback currently rebuilds (simpler, already
  bounded-cost) but the primitive is here and tested.
- **Idempotence under task retries** is NOT structural (re-inserting
  duplicates fingerprints, raising load) — the engine treats a
  retry's double-insert the same way it treats Bloom's re-OR: probe
  answers stay correct (extra *maybe*s only), and rollback rebuilds
  from the exact table anyway.

Serialization is a flat uint8 array (``[saturated] + table bytes``),
written via the same tmp+rename sidecar protocol as the Bloom
bitmaps; a packed shard of 2^16 buckets is 256 KiB.
"""

from __future__ import annotations

import hashlib

import numpy as np

from .hashing import cuckoo_parts_vec, xxh64_str

SLOTS_PER_BUCKET = 4
MAX_KICKS = 500

# fingerprint -> alternate-bucket offset hash (tabulated once; any
# fixed nonlinear map works for partial-key cuckoo hashing)
_FP_HASH = np.array(
    [
        int.from_bytes(
            hashlib.blake2b(bytes([f]), digest_size=8).digest(), "big"
        )
        for f in range(256)
    ],
    dtype=np.uint64,
)


def key_parts(s: str, n_buckets: int) -> tuple[int, int, int]:
    """(fingerprint 1..255, bucket1, bucket2) for a key string.
    ``n_buckets`` must be a power of two (xor-partial-key trick).

    Derived from the SAME xxh64 value Spark's ``xxhash64(surt)``
    column carries (``hashing.py``), so string-built and column-built
    sidecars are interchangeable — the hot paths never call this,
    they pass precomputed h1 arrays to ``parts_from_h``."""
    return parts_from_h(xxh64_str(s), n_buckets)


def parts_from_h(h1: int, n_buckets: int) -> tuple[int, int, int]:
    """(fingerprint, bucket1, bucket2) from a precomputed uint64."""
    fp = (h1 >> 56) % 255 + 1  # 0 means empty slot
    i1 = h1 & (n_buckets - 1)
    i2 = (i1 ^ int(_FP_HASH[fp])) & (n_buckets - 1)
    return int(fp), int(i1), int(i2)


class CuckooShard:
    """One shard's filter state: (n_buckets, 4) uint8 fingerprint
    table + a saturation flag."""

    def __init__(self, n_buckets: int, table: np.ndarray | None = None,
                 saturated: bool = False):
        if n_buckets & (n_buckets - 1):
            raise ValueError("n_buckets must be a power of two")
        self.n_buckets = n_buckets
        self.table = (
            table
            if table is not None
            else np.zeros((n_buckets, SLOTS_PER_BUCKET), dtype=np.uint8)
        )
        self.saturated = saturated

    # -- serialization (sidecar protocol) --------------------------------

    def to_array(self) -> np.ndarray:
        return np.concatenate(
            [np.array([1 if self.saturated else 0], dtype=np.uint8),
             self.table.reshape(-1)]
        )

    @classmethod
    def from_array(cls, arr: np.ndarray) -> "CuckooShard":
        saturated = bool(arr[0])
        body = arr[1:]
        n_buckets = body.size // SLOTS_PER_BUCKET
        return cls(
            n_buckets,
            table=body.reshape(n_buckets, SLOTS_PER_BUCKET).copy(),
            saturated=saturated,
        )

    @property
    def nbytes(self) -> int:
        return self.table.nbytes + 1

    # -- operations -------------------------------------------------------

    def _alt(self, fp: int, bucket: int) -> int:
        return (bucket ^ int(_FP_HASH[fp])) & (self.n_buckets - 1)

    def insert(self, s: str) -> bool:
        """Insert; returns False (and flips ``saturated``) if the
        deterministic eviction walk exhausts its kick budget."""
        return self.insert_parts(*key_parts(s, self.n_buckets))

    def insert_parts(self, fp: int, i1: int, i2: int) -> bool:
        """Insert from precomputed (fingerprint, bucket1, bucket2) —
        the column hot path (no string hashing)."""
        for b in (i1, i2):
            row = self.table[b]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = fp
                return True
        # evict: deterministic walk (slot = kick % 4, alternate bucket)
        b, cur = i1, fp
        for kick in range(MAX_KICKS):
            slot = kick % SLOTS_PER_BUCKET
            cur, self.table[b, slot] = int(self.table[b, slot]), cur
            b = self._alt(cur, b)
            row = self.table[b]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = cur
                return True
        self.saturated = True  # displaced key's fp re-homed best-effort:
        # it is currently held in `cur` and has no slot — saturation
        # makes every probe answer *maybe*, so no false negative.
        return False

    def contains(self, s: str) -> bool:
        if self.saturated:
            return True
        fp, i1, i2 = key_parts(s, self.n_buckets)
        return bool((self.table[i1] == fp).any() or (self.table[i2] == fp).any())

    def delete(self, s: str) -> bool:
        """Remove one copy of the key's fingerprint (False if absent).
        Only sound for keys that were actually inserted (standard
        cuckoo-filter caveat)."""
        return self.delete_parts(*key_parts(s, self.n_buckets))

    def delete_parts(self, fp: int, i1: int, i2: int) -> bool:
        """Delete from precomputed parts — the column hot path."""
        for b in (i1, i2):
            row = self.table[b]
            hits = np.nonzero(row == fp)[0]
            if len(hits):
                row[hits[0]] = 0
                return True
        return False

    def load_factor(self) -> float:
        return float((self.table != 0).mean())


def probe_packed(arr: np.ndarray, s: str) -> bool:
    """Probe a serialized shard (``to_array`` layout) without
    materializing a CuckooShard — string convenience over the
    vectorized ``probe_packed_vec`` the executors use."""
    h1 = np.array([xxh64_str(s)], dtype=np.uint64)
    return bool(probe_packed_vec(arr, h1)[0])


def probe_packed_vec(arr: np.ndarray, h1: np.ndarray) -> np.ndarray:
    """Vectorized membership of uint64 keys in a serialized shard:
    two fancy-indexed bucket gathers + fingerprint compares, no
    per-key Python. Saturated shards answer all-*maybe*."""
    if arr[0]:
        return np.ones(len(h1), dtype=bool)  # saturated
    n_buckets = (arr.size - 1) // SLOTS_PER_BUCKET
    fp, i1, i2 = cuckoo_parts_vec(h1, n_buckets, _FP_HASH)
    tbl = arr[1:].reshape(n_buckets, SLOTS_PER_BUCKET)
    return ((tbl[i1] == fp[:, None]).any(axis=1)) | (
        (tbl[i2] == fp[:, None]).any(axis=1)
    )
