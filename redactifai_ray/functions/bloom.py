"""Broadcast Bloom filter — approximate membership for semi/anti joins.

The guide's scale pattern for "filter a huge stream by a large key set":
when the key set is too big to broadcast exactly (the exact-dict path in
``compute_dup_winners`` / ``near_dedup``) but its *bitset* still fits, a
Bloom filter ships once via ``ray.put`` and each batch tests membership
vectorized. False positives only (rate ``fpr``): safe for anti-joins that
route rows to a slower exact path, and for semi-joins where a small
overshoot is acceptable.

Deterministic: double hashing over blake2b-based ``stable_hash64`` seeds
(h_i = h1 + i*h2), so filters built from the same keys are identical on
any node.
"""

from __future__ import annotations

import math

import numpy as np

from .hashing import stable_hash64


class BloomFilter:
    def __init__(self, capacity: int, fpr: float = 0.01):
        if capacity <= 0:
            raise ValueError("capacity must be positive")
        if not 0.0 < fpr < 1.0:
            raise ValueError("fpr must be in (0, 1)")
        m = math.ceil(-capacity * math.log(fpr) / (math.log(2) ** 2))
        self.n_bits = max(64, m)
        self.n_hashes = max(1, round(self.n_bits / capacity * math.log(2)))
        self.bits = np.zeros((self.n_bits + 63) // 64, dtype=np.uint64)
        self.capacity = capacity
        self.fpr = fpr

    def _positions(self, key: str | bytes) -> np.ndarray:
        h1 = np.uint64(stable_hash64(key, 0))
        h2 = np.uint64(stable_hash64(key, 1) | 1)  # odd → full period
        i = np.arange(self.n_hashes, dtype=np.uint64)
        with np.errstate(over="ignore"):  # uint64 wrap is the hash mix
            return ((h1 + i * h2) % np.uint64(self.n_bits)).astype(np.int64)

    def add(self, key: str | bytes) -> None:
        for p in self._positions(key):
            p = int(p)
            self.bits[p >> 6] |= np.uint64(1 << (p & 63))

    def __contains__(self, key: str | bytes) -> bool:
        for p in self._positions(key):
            p = int(p)
            if not int(self.bits[p >> 6]) & (1 << (p & 63)):
                return False
        return True

    def update(self, keys) -> None:
        for k in keys:
            self.add(k)

    @property
    def nbytes(self) -> int:
        return self.bits.nbytes


def bloom_semi_join_filter(keys, capacity: int | None = None, fpr: float = 0.01):
    """Build a filter + a ``map_batches``-ready predicate factory.

    Usage::

        bf = BloomFilter(...); bf.update(keys)
        ref = ray.put(bf)
        ds.map_batches(make_bloom_filter_batch(ref, "url"), batch_format="pyarrow")
    """
    keys = list(keys)
    bf = BloomFilter(capacity or max(1, len(keys)), fpr)
    bf.update(keys)
    return bf


def make_bloom_filter_batch(bloom_ref, key_col: str, keep_members: bool = True):
    """Batch filter: keep rows whose key is (probably) in the filter
    (semi-join) or definitely NOT in it (anti-join, exact on the keep
    side since Bloom has no false negatives)."""
    import pyarrow as pa
    import ray

    def filt(batch: pa.Table) -> pa.Table:
        bf = ray.get(bloom_ref)
        keys = batch[key_col].to_pylist()
        mask = [(k in bf) == keep_members for k in keys]
        return batch.filter(pa.array(mask, pa.bool_()))

    return filt
