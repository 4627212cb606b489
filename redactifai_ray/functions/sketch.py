"""HyperLogLog distinct-count sketch — the scale path for COUNT(DISTINCT)
over 10^12-row columns where the exact two-shuffle path
(`q_distinct_users_per_type`) would move one row per distinct value.

Deterministic: hashes via the same blake2b-based ``stable_hash64`` as the
dedup family, so sketches built from the same values are identical on any
node and merges are order-independent (register-wise max). Standard HLL
estimator with linear-counting small-range correction (Flajolet et al.;
the public algorithm).

Distributed shape: each block folds into one 2^p-byte register row inside
``map_batches`` (vectorized numpy); the per-block sketches (KBs each)
gather and merge on the driver — a tree of register-max merges, never a
shuffle of values.
"""

from __future__ import annotations

import numpy as np

from ..collect import collect_table
from .hashing import stable_hash64


class HyperLogLog:
    def __init__(self, p: int = 12, registers: np.ndarray | None = None):
        if not 4 <= p <= 18:
            raise ValueError("p must be in [4, 18]")
        self.p = p
        self.m = 1 << p
        self.registers = (
            registers.copy()
            if registers is not None
            else np.zeros(self.m, dtype=np.uint8)
        )

    def add_hashes(self, hashes: np.ndarray) -> None:
        """Fold a uint64 hash array in, vectorized."""
        if hashes.size == 0:
            return
        h = hashes.astype(np.uint64)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        # rank = leading zeros of the remaining 64-p bits, + 1; the low
        # p bits are forced to 1 so the rank caps at 64-p+1 naturally
        rest = (h << np.uint64(self.p)) | np.uint64((1 << self.p) - 1)
        # vectorized leading-zero count via float log2 would lose precision
        # beyond 2^53; do a 6-step binary clz instead (exact)
        shift = 32
        lzc = np.zeros(h.size, dtype=np.int64)
        v = rest.copy()
        while shift >= 1:
            top = v >> np.uint64(64 - shift)
            zero_top = top == 0
            lzc = np.where(zero_top, lzc + shift, lzc)
            v = np.where(zero_top, v << np.uint64(shift), v)
            shift //= 2
        rank = np.minimum(lzc + 1, 64 - self.p + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, rank)

    def update(self, values) -> None:
        hs = np.array(
            [stable_hash64(v if isinstance(v, (str, bytes)) else str(v), 77)
             for v in values],
            dtype=np.uint64,
        )
        self.add_hashes(hs)

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        if other.p != self.p:
            raise ValueError("cannot merge sketches of different precision")
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def count(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1.0 + 1.079 / m)
        est = alpha * m * m / float(np.sum(2.0 ** -self.registers.astype(np.float64)))
        if est <= 2.5 * m:  # small-range linear counting
            zeros = int(np.count_nonzero(self.registers == 0))
            if zeros:
                return m * np.log(m / zeros)
        return est

    def to_bytes(self) -> bytes:
        return self.registers.tobytes()

    @classmethod
    def from_bytes(cls, raw: bytes, p: int = 12) -> "HyperLogLog":
        return cls(p, registers=np.frombuffer(raw, dtype=np.uint8).copy())


def hll_distinct(ds, col: str, p: int = 12, merge_fanin: int = 256) -> float:
    """Approximate COUNT(DISTINCT col) over a Dataset. One map pass emits
    a register row per block; a distributed tree-merge stage then folds
    every ``merge_fanin`` register rows into one (register-wise max is
    associative and order-independent), so the driver gathers
    O(blocks/fanin) rows — ~4 KB × 4k rows even at 10^6 input blocks —
    and values never shuffle. Relative error ≈ 1.04/√(2^p) (~1.6% at
    p=12)."""
    import pyarrow as pa

    def sketch_block(batch: pa.Table) -> pa.Table:
        h = HyperLogLog(p)
        h.update(batch[col].to_pylist())
        return pa.table({"registers": pa.array([h.to_bytes()], pa.binary())})

    def merge_batch(batch: pa.Table) -> pa.Table:
        """Fold up to merge_fanin register rows into one (max is exact)."""
        regs = np.frombuffer(
            b"".join(batch["registers"].to_pylist()), dtype=np.uint8
        ).reshape(-1, 1 << p)
        return pa.table(
            {"registers": pa.array([regs.max(axis=0).tobytes()], pa.binary())}
        )

    tbl = collect_table(
        ds.map_batches(sketch_block, batch_format="pyarrow")
        .map_batches(merge_batch, batch_format="pyarrow", batch_size=merge_fanin)
    )
    acc = HyperLogLog(p)
    if "registers" in tbl.column_names:
        for raw in tbl.column("registers").to_pylist():
            acc.merge(HyperLogLog.from_bytes(raw, p))
    return acc.count()


# ------------------------------------------------- Misra-Gries top-k --


class MisraGries:
    """Mergeable heavy-hitters summary (Misra–Gries; merge rule from
    Agarwal et al., "Mergeable Summaries" — pointwise add then subtract
    the (k+1)-th largest count and drop non-positives).

    Guarantees with capacity k over a stream of N items: every stored
    estimate satisfies ``true - N/(k+1) <= est <= true``, and any item
    with true count > N/(k+1) is present. Deterministic — no hashing,
    no randomness — so distributed folds are reproducible."""

    def __init__(self, k: int):
        if k < 1:
            raise ValueError("k must be >= 1")
        self.k = k
        self.counts: dict = {}

    def add_counts(self, counts: dict) -> "MisraGries":
        for t, c in counts.items():
            self.counts[t] = self.counts.get(t, 0) + int(c)
        self._compress()
        return self

    def merge(self, other: "MisraGries") -> "MisraGries":
        return self.add_counts(other.counts)

    def _compress(self) -> None:
        if len(self.counts) <= self.k:
            return
        vals = sorted(self.counts.values(), reverse=True)
        thresh = vals[self.k]  # (k+1)-th largest
        self.counts = {t: c - thresh for t, c in self.counts.items() if c > thresh}


def mg_top_tokens(ds, col: str, k: int = 10, capacity: int = 200):
    """Approximate token top-k via a distributed Misra-Gries fold — the
    scale path for heavy hitters when the corpus VOCABULARY is too large
    to shuffle (web-scale n-grams), complementing the exact
    ``analyze.top_tokens``.

    Shape mirrors ``hll_distinct``: each block folds its tokens into a
    capacity-bounded summary and emits ≤ capacity (token, count) rows —
    the exchange carries summaries, never the vocabulary — one groupby
    sums residuals (pointwise add, deferred compress: error accrues only
    at per-block compress, so the merged bound is the SUM of per-block
    errors ≤ N/(capacity+1) per the mergeable-summaries theorem), and
    the driver compresses the ≤ capacity × num_partitions survivors to
    the final summary. Returns a pandas DataFrame (token, est) of the
    top-k stored estimates with a total (est desc, token asc) order."""
    from collections import Counter

    import pandas as pd
    import pyarrow as pa

    def block_summary(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch[col].to_pylist():
            c.update((t or "").lower().split())
        mg = MisraGries(capacity).add_counts(c)
        return pa.table(
            {
                "token": pa.array(list(mg.counts.keys()), pa.string()),
                "n": pa.array(list(mg.counts.values()), pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    tbl = collect_table(
        ds.map_batches(block_summary, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("n", alias_name="n"))
    )
    final = MisraGries(capacity).add_counts(
        dict(zip(tbl.column("token").to_pylist(), tbl.column("n").to_pylist()))
        if "token" in tbl.column_names
        else {}
    )
    top = sorted(final.counts.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return pd.DataFrame(top, columns=["token", "est"])


# --------------------------------------------------- KLL quantile sketch --


class KllSketch:
    """Mergeable quantile sketch (simplified KLL, Karnin-Lang-Liberty:
    levelled compactors; compaction sorts a full level and promotes
    every other item to the next level with doubled weight).

    Deterministic variant: compaction parity alternates via a per-sketch
    counter instead of a coin flip, so a fixed block partitioning yields
    reproducible estimates. Rank error is test-pinned (~1% at k=256 on
    100k values) rather than derived — the classic (2/3)^h capacity
    schedule is simplified to a flat per-level capacity of k."""

    def __init__(self, k: int = 256):
        if k < 8:
            raise ValueError("k must be >= 8")
        self.k = k
        self.compactors: list[list[float]] = [[]]
        self._parity = 0

    def add_values(self, values: np.ndarray) -> "KllSketch":
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        self.compactors[0].extend(v.tolist())
        self._compress()
        return self

    def insert_level(self, level: int, values: np.ndarray) -> None:
        while level >= len(self.compactors):
            self.compactors.append([])
        self.compactors[level].extend(
            np.asarray(values, dtype=np.float64).tolist()
        )

    def _compress(self) -> None:
        h = 0
        while h < len(self.compactors):
            if len(self.compactors[h]) > self.k:
                c = sorted(self.compactors[h])
                self._parity ^= 1
                promoted = c[self._parity :: 2]
                self.compactors[h] = []
                if h + 1 == len(self.compactors):
                    self.compactors.append([])
                self.compactors[h + 1].extend(promoted)
            h += 1

    def merge(self, other: "KllSketch") -> "KllSketch":
        for h, vals in enumerate(other.compactors):
            if vals:
                self.insert_level(h, np.asarray(vals))
        self._compress()
        return self

    def quantile(self, q: float) -> float:
        items: list[tuple[float, int]] = []
        for h, vals in enumerate(self.compactors):
            w = 1 << h
            items.extend((v, w) for v in vals)
        if not items:
            return float("nan")
        items.sort()
        total = sum(w for _, w in items)
        target = q * total
        acc = 0
        for v, w in items:
            acc += w
            if acc >= target:
                return v
        return items[-1][0]


def kll_quantiles(
    ds, col: str, qs=(0.25, 0.5, 0.75), k: int = 256, merge_fanin: int = 64
) -> dict[float, float]:
    """Approximate quantiles over a Dataset column — the scale path for
    ``q_quantiles`` where exact answers need a full sort (an all-to-all
    shuffle of the corpus). Same distributed shape as ``hll_distinct``:
    each block folds into one KB-scale sketch serialized as (level,
    float64-blob) rows, a tree-merge stage folds every ``merge_fanin``
    rows, and the driver merges the survivors. Values never shuffle."""
    import pyarrow as pa

    def rows_of(s: KllSketch) -> pa.Table:
        levels, blobs = [], []
        for h, vals in enumerate(s.compactors):
            if vals:
                levels.append(h)
                blobs.append(np.asarray(vals, dtype=np.float64).tobytes())
        return pa.table(
            {
                "level": pa.array(levels, pa.int32()),
                "values": pa.array(blobs, pa.binary()),
            }
        )

    def from_rows(levels, blobs, kk: int) -> KllSketch:
        s = KllSketch(kk)
        for h, blob in zip(levels, blobs):
            s.insert_level(int(h), np.frombuffer(blob, dtype=np.float64))
        s._compress()
        return s

    def block_sketch(batch: pa.Table) -> pa.Table:
        s = KllSketch(k)
        s.add_values(batch[col].to_numpy(zero_copy_only=False))
        return rows_of(s)

    def merge_batch(batch: pa.Table) -> pa.Table:
        return rows_of(
            from_rows(
                batch["level"].to_pylist(), batch["values"].to_pylist(), k
            )
        )

    tbl = collect_table(
        ds.map_batches(block_sketch, batch_format="pyarrow")
        .map_batches(merge_batch, batch_format="pyarrow", batch_size=merge_fanin)
    )
    has = "level" in tbl.column_names
    final = from_rows(
        tbl.column("level").to_pylist() if has else [],
        tbl.column("values").to_pylist() if has else [],
        k,
    )
    return {q: final.quantile(q) for q in qs}


# ---------------------------------------------------- Bloom membership --


class BloomFilter:
    """Mergeable Bloom membership filter over 64-bit item hashes.

    The scale path for broadcast membership tests: an exact n-gram hash
    set at 10^9 grams costs ~8 GB of heap in every worker, while a Bloom
    filter at 0.1% FPR is ~1.8 GB of plain bits — and a false positive
    only over-removes, the safe direction for decontamination-style
    anti-filters (false negatives are impossible). Probe positions come
    from double hashing one ``stable_hash64`` value (Kirsch &
    Mitzenmacher 2006, the public construction), so filters built from
    the same values on any node are bit-identical and ``merge`` (bitwise
    OR) is associative and order-independent — the same tree-merge
    contract as ``HyperLogLog``."""

    def __init__(self, n_bits: int, n_hashes: int,
                 words: np.ndarray | None = None):
        if n_bits < 64:
            n_bits = 64
        n_bits = (n_bits + 63) // 64 * 64
        if not 1 <= n_hashes <= 32:
            raise ValueError("n_hashes must be in [1, 32]")
        self.n_bits = n_bits
        self.k = n_hashes
        self.words = (
            words.copy()
            if words is not None
            else np.zeros(n_bits // 64, dtype=np.uint64)
        )

    @classmethod
    def for_capacity(cls, n_items: int, fpr: float = 0.001) -> "BloomFilter":
        """Size for ``n_items`` distinct values at target false-positive
        rate: m = -n·ln(p)/ln²2 bits, k = (m/n)·ln2 probes (textbook)."""
        n = max(1, int(n_items))
        if not 0.0 < fpr < 1.0:
            raise ValueError("fpr must be in (0, 1)")
        m = int(np.ceil(-n * np.log(fpr) / (np.log(2.0) ** 2)))
        # floor the geometry: below a few hundred words the k probe
        # positions (an arithmetic progression mod m) overlap added
        # progressions structurally and the FPR leaves the textbook
        # curve; 4096 bits is 512 bytes — free insurance
        m = max(m, 4096)
        k = max(1, int(round(np.log(2.0) * m / n)))
        return cls(m, min(k, 32))

    def _positions(self, hashes: np.ndarray) -> np.ndarray:
        """(k, n) probe positions via double hashing; uint64 wraparound
        is the intended mixing. h2 runs a murmur3-style finalizer so its
        LOW bits depend on ALL bits of h — a plain multiply leaves
        (h mod m, h2 mod m) a function of h's low bits alone, collapsing
        the probe sequence to only m distinct patterns at small/pow2 m
        (observed as a 10^4× FPR blowup on a 128-bit filter)."""
        h = hashes.astype(np.uint64)
        g = h ^ (h >> np.uint64(33))
        g = g * np.uint64(0xFF51AFD7ED558CCD)
        g = g ^ (g >> np.uint64(33))
        g = g * np.uint64(0xC4CEB9FE1A85EC53)
        g = g ^ (g >> np.uint64(33))
        h2 = g | np.uint64(1)
        m = np.uint64(self.n_bits)
        return np.stack(
            [(h + np.uint64(i) * h2) % m for i in range(self.k)]
        )

    def add_hashes(self, hashes: np.ndarray) -> None:
        if hashes.size == 0:
            return
        pos = self._positions(hashes).ravel()
        w = (pos >> np.uint64(6)).astype(np.int64)
        bit = np.uint64(1) << (pos & np.uint64(63))
        np.bitwise_or.at(self.words, w, bit)

    def contains_hashes(self, hashes: np.ndarray) -> np.ndarray:
        """Vectorized membership for a uint64 hash array → bool array.
        Guaranteed True for every added hash; False implies definitely
        absent."""
        if hashes.size == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(hashes)
        w = (pos >> np.uint64(6)).astype(np.int64)
        bits = (self.words[w] >> (pos & np.uint64(63))) & np.uint64(1)
        return bits.astype(bool).all(axis=0)

    def update(self, values) -> None:
        hs = np.array(
            [stable_hash64(v if isinstance(v, (str, bytes)) else str(v), 171)
             for v in values],
            dtype=np.uint64,
        )
        self.add_hashes(hs)

    def contains(self, values) -> np.ndarray:
        hs = np.array(
            [stable_hash64(v if isinstance(v, (str, bytes)) else str(v), 171)
             for v in values],
            dtype=np.uint64,
        )
        return self.contains_hashes(hs)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        if (other.n_bits, other.k) != (self.n_bits, self.k):
            raise ValueError("cannot merge filters of different geometry")
        np.bitwise_or(self.words, other.words, out=self.words)
        return self

    def fill_ratio(self) -> float:
        """Fraction of set bits — a post-hoc saturation check (the
        effective FPR is fill_ratio**k)."""
        return float(
            np.unpackbits(self.words.view(np.uint8)).sum()
        ) / self.n_bits

    def to_bytes(self) -> bytes:
        return self.words.tobytes()

    @classmethod
    def from_bytes(cls, raw: bytes, n_bits: int, n_hashes: int) -> "BloomFilter":
        return cls(
            n_bits, n_hashes,
            words=np.frombuffer(raw, dtype=np.uint64).copy(),
        )


def hll_distinct_by(ds, key_col: str, col: str, p: int = 12):
    """Approximate COUNT(DISTINCT col) GROUP BY key_col — the sketch
    twin of the exact two-shuffle `q_distinct_users_per_type` path, for
    when the per-key value sets are too large to move (10^12 events,
    10^9 users per event type: the exact path's first shuffle carries a
    row per distinct (key, value) pair; this one carries a 2^p-byte
    register row per (key, block)).

    Distributed shape: each block folds its rows into ONE register row
    per key present in the block (vectorized add_hashes per key group);
    a key-hash groupby then max-merges registers in-partition — merge is
    associative/commutative, so block boundaries and partition order
    cannot change the estimate. Output: (key, n_distinct_approx)."""
    import pandas as pd
    import pyarrow as pa

    def sketch_block(batch: pa.Table) -> pa.Table:
        df = batch.select([key_col, col]).to_pandas()
        keys, regs = [], []
        for k, g in df.groupby(key_col, sort=False, dropna=False):
            h = HyperLogLog(p)
            h.update(g[col].dropna().tolist())
            keys.append(k)
            regs.append(h.to_bytes())
        return pa.table(
            {
                key_col: pa.array(keys),
                "registers": pa.array(regs, pa.binary()),
            }
        )

    def merge_key(g: pd.DataFrame) -> pd.DataFrame:
        regs = np.frombuffer(
            b"".join(g["registers"]), dtype=np.uint8
        ).reshape(-1, 1 << p)
        acc = HyperLogLog(p, registers=regs.max(axis=0))
        return pd.DataFrame(
            {
                key_col: [g[key_col].iloc[0]],
                "n_distinct_approx": [float(acc.count())],
            }
        )

    return (
        ds.map_batches(sketch_block, batch_format="pyarrow")
        .groupby(key_col)
        .map_groups(merge_key, batch_format="pandas")
    )


def kll_quantiles_by(
    ds, key_col: str, col: str, qs=(0.25, 0.5, 0.75), k: int = 256
):
    """Approximate grouped quantiles — the sketch twin of the exact
    value-histogram path (``q_grouped_quantiles``), for real-valued or
    high-cardinality columns where the per-(key, value) histogram itself
    is too wide to exchange. Completes the sketch-through-shuffle family
    (``hll_distinct_by`` for COUNT DISTINCT, this for quantiles).

    Distributed shape: each block folds its rows into KB-scale KLL
    compactor rows per key present in the block (``(key, level,
    float64-blob)``); ONE key-hash groupby merges compactors
    in-partition. Merge is level-wise concatenation + deterministic
    compaction, so the exchange carries sketches, never values. Output:
    one row per key with a ``q<pct>`` column per requested quantile."""
    import pandas as pd
    import pyarrow as pa

    qcols = [f"q{int(round(q * 100)):02d}" for q in qs]

    def sketch_block(batch: pa.Table) -> pa.Table:
        df = batch.select([key_col, col]).to_pandas()
        keys, levels, blobs = [], [], []
        for kk, g in df.groupby(key_col, sort=False, dropna=False):
            s = KllSketch(k)
            s.add_values(g[col].to_numpy(dtype=np.float64))
            for h, vals in enumerate(s.compactors):
                if vals:
                    keys.append(kk)
                    levels.append(h)
                    blobs.append(
                        np.asarray(vals, dtype=np.float64).tobytes()
                    )
        return pa.table(
            {
                key_col: pa.array(keys),
                "level": pa.array(levels, pa.int32()),
                "values": pa.array(blobs, pa.binary()),
            }
        )

    def merge_key(g: pd.DataFrame) -> pd.DataFrame:
        s = KllSketch(k)
        for h, blob in zip(g["level"], g["values"]):
            s.insert_level(int(h), np.frombuffer(blob, dtype=np.float64))
        s._compress()
        out = {key_col: [g[key_col].iloc[0]]}
        for q, c in zip(qs, qcols):
            out[c] = [float(s.quantile(q))]
        return pd.DataFrame(out)

    return (
        ds.map_batches(sketch_block, batch_format="pyarrow")
        .groupby(key_col)
        .map_groups(merge_key, batch_format="pandas")
    )


# ------------------------------------------------- Count-Min frequency --


class CountMinSketch:
    """Mergeable frequency sketch (Cormode & Muthukrishnan 2005) — the
    scale path for point-frequency queries where even the Misra-Gries
    summary is wrong-shaped (MG tracks the top-k; CMS answers "how often
    did THIS value occur" for arbitrary values after one pass).
    ``depth × width`` int64 counters; estimates never underestimate and
    overshoot by ≤ e·N/width with probability 1−e^−depth.

    Probe columns come from the same murmur3-finalized double hashing as
    ``BloomFilter`` (Kirsch & Mitzenmacher construction over one
    ``stable_hash64`` value), so sketches built from the same values are
    bit-identical on any node and ``merge`` (elementwise add) is
    associative and order-independent — the HLL/Bloom tree-merge
    contract."""

    def __init__(self, width: int = 2048, depth: int = 5,
                 counts: np.ndarray | None = None):
        if width < 16 or depth < 1 or depth > 32:
            raise ValueError("need width >= 16 and depth in [1, 32]")
        self.width, self.depth = width, depth
        self.counts = (
            counts.copy()
            if counts is not None
            else np.zeros((depth, width), dtype=np.int64)
        )

    def _columns(self, hashes: np.ndarray) -> np.ndarray:
        """(depth, n) probe columns via double hashing; the murmur3
        finalizer keeps h2's low bits dependent on all of h (see
        BloomFilter._positions for the observed failure without it)."""
        h = hashes.astype(np.uint64)
        g = h ^ (h >> np.uint64(33))
        g = g * np.uint64(0xFF51AFD7ED558CCD)
        g = g ^ (g >> np.uint64(33))
        g = g * np.uint64(0xC4CEB9FE1A85EC53)
        g = g ^ (g >> np.uint64(33))
        h2 = g | np.uint64(1)
        w = np.uint64(self.width)
        return np.stack(
            [((h + np.uint64(i) * h2) % w).astype(np.int64)
             for i in range(self.depth)]
        )

    def add_hashes(self, hashes: np.ndarray,
                   weights: np.ndarray | None = None) -> None:
        if hashes.size == 0:
            return
        cols = self._columns(hashes)
        w = (
            np.ones(hashes.size, dtype=np.int64)
            if weights is None
            else weights.astype(np.int64)
        )
        for d in range(self.depth):
            np.add.at(self.counts[d], cols[d], w)

    def estimate_hashes(self, hashes: np.ndarray) -> np.ndarray:
        if hashes.size == 0:
            return np.zeros(0, dtype=np.int64)
        cols = self._columns(hashes)
        ests = np.stack(
            [self.counts[d][cols[d]] for d in range(self.depth)]
        )
        return ests.min(axis=0)

    def _hash_values(self, values) -> np.ndarray:
        return np.array(
            [stable_hash64(v if isinstance(v, (str, bytes)) else str(v), 233)
             for v in values],
            dtype=np.uint64,
        )

    def update(self, values, weights: np.ndarray | None = None) -> None:
        self.add_hashes(self._hash_values(values), weights)

    def estimate(self, values) -> np.ndarray:
        return self.estimate_hashes(self._hash_values(values))

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        if (other.width, other.depth) != (self.width, self.depth):
            raise ValueError("cannot merge sketches of different geometry")
        self.counts += other.counts
        return self

    def to_bytes(self) -> bytes:
        return self.counts.tobytes()

    @classmethod
    def from_bytes(cls, raw: bytes, width: int = 2048,
                   depth: int = 5) -> "CountMinSketch":
        return cls(
            width, depth,
            counts=np.frombuffer(raw, dtype=np.int64)
            .reshape(depth, width).copy(),
        )


def cms_token_counts(
    ds,
    col: str,
    query_values: list,
    width: int = 2048,
    depth: int = 5,
    merge_fanin: int = 64,
):
    """Estimate per-value occurrence counts of ``query_values`` in one
    pass with Count-Min: each block pre-folds its value counts (pyarrow
    group_by) and adds them weighted into one sketch row; sketch rows
    tree-merge every ``merge_fanin`` (elementwise int add — exact,
    order-independent) so the driver folds O(blocks/fanin) rows of
    width×depth×8 bytes and raw values never shuffle. Returns a pandas
    DataFrame (value, est_count); estimates are exact when width far
    exceeds the column's distinct count, and never underestimate."""
    import pandas as pd
    import pyarrow as pa

    def sketch_block(batch: pa.Table) -> pa.Table:
        g = batch.select([col]).group_by(col).aggregate([(col, "count")])
        s = CountMinSketch(width, depth)
        s.update(
            g.column(col).to_pylist(),
            weights=np.asarray(g.column(f"{col}_count"), dtype=np.int64),
        )
        return pa.table({"cms": pa.array([s.to_bytes()], pa.binary())})

    def merge_batch(batch: pa.Table) -> pa.Table:
        mats = np.frombuffer(
            b"".join(batch["cms"].to_pylist()), dtype=np.int64
        ).reshape(-1, depth, width)
        return pa.table(
            {"cms": pa.array([mats.sum(axis=0).tobytes()], pa.binary())}
        )

    tbl = collect_table(
        ds.map_batches(sketch_block, batch_format="pyarrow")
        .map_batches(
            merge_batch, batch_format="pyarrow", batch_size=merge_fanin
        )
    )
    acc = CountMinSketch(width, depth)
    if "cms" in tbl.column_names:
        for raw in tbl.column("cms").to_pylist():
            acc.merge(CountMinSketch.from_bytes(raw, width, depth))
    ests = acc.estimate(query_values)
    return pd.DataFrame(
        {
            "value": [str(v) for v in query_values],
            "est_count": ests.astype(np.int64),
        }
    )


def mg_top_tokens_by(
    ds, key_col: str, col: str, k: int = 10, capacity: int = 200
):
    """Grouped Misra-Gries heavy hitters: per-key approximate token
    top-k — the scale path named by ``q_top_tokens_per_lang`` for when
    (keys × vocabulary) is too large to shuffle exactly. Same
    sketch-through-shuffle contract as ``hll_distinct_by`` /
    ``kll_quantiles_by``: each block folds ONE capacity-bounded summary
    per key it sees and emits ≤ keys×capacity slim (key, token, n)
    rows; one keyed groupby sums residuals (pointwise add, deferred
    compress — merged error ≤ N_key/(capacity+1) summed per block); the
    driver compresses per-key survivors. Returns (key, token, est) of
    each key's top-k stored estimates, (est desc, token asc) order."""
    from collections import Counter, defaultdict

    import pandas as pd
    import pyarrow as pa

    from ray.data.aggregate import Sum

    def block_summary(batch: pa.Table) -> pa.Table:
        per_key: dict = defaultdict(Counter)
        keys = batch[key_col].to_pylist()
        texts = batch[col].to_pylist()
        for ky, t in zip(keys, texts):
            per_key[ky].update((t or "").lower().split())
        out_k, out_t, out_n = [], [], []
        for ky, c in per_key.items():
            mg = MisraGries(capacity).add_counts(c)
            for tok, n in mg.counts.items():
                out_k.append(ky)
                out_t.append(tok)
                out_n.append(n)
        return pa.table(
            {
                key_col: pa.array(out_k, pa.string()),
                "token": pa.array(out_t, pa.string()),
                "n": pa.array(out_n, pa.int64()),
            }
        )

    tbl = collect_table(
        ds.map_batches(block_summary, batch_format="pyarrow")
        .groupby([key_col, "token"])
        .aggregate(Sum("n", alias_name="n"))
    )
    per_key: dict = defaultdict(dict)
    if key_col in tbl.column_names:
        for kv, tok, n in zip(
            tbl.column(key_col).to_pylist(),
            tbl.column("token").to_pylist(),
            tbl.column("n").to_pylist(),
        ):
            per_key[kv][tok] = n
    frames = []
    for ky in sorted(per_key):
        final = MisraGries(capacity).add_counts(per_key[ky])
        top = sorted(final.counts.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        frames.append(
            pd.DataFrame(
                {
                    key_col: [ky] * len(top),
                    "token": [t for t, _ in top],
                    "est": [int(n) for _, n in top],
                }
            )
        )
    if not frames:
        return pd.DataFrame(
            {key_col: pd.Series(dtype="object"),
             "token": pd.Series(dtype="object"),
             "est": pd.Series(dtype="int64")}
        )
    return pd.concat(frames).reset_index(drop=True)


def hll_set_algebra(
    ds, key_col: str, col: str, key_a, key_b, p: int = 12
):
    """HLL set algebra between two key slices: estimated |A|, |B|,
    |A∪B| (register max-merge — exact HLL union) and |A∩B| by
    inclusion–exclusion — the distinct-overlap question ("how many
    users did BOTH event types") whose exact answer needs a
    per-(value) shuffle. One fold: each block emits ≤2 register rows
    (side-tagged); the driver max-merges 2×blocks rows of 2^p bytes.
    Intersection inherits both sketches' error (inclusion–exclusion
    amplifies relative error when the overlap is small) — the
    documented contract; tests pin a tolerance vs exact."""
    import pandas as pd
    import pyarrow as pa

    def sketch_block(batch: pa.Table) -> pa.Table:
        df = batch.select([key_col, col]).to_pandas()
        out_side, out_reg = [], []
        for side, key in (("a", key_a), ("b", key_b)):
            vals = df.loc[df[key_col] == key, col].dropna().tolist()
            if vals:
                h = HyperLogLog(p)
                h.update(vals)
                out_side.append(side)
                out_reg.append(h.to_bytes())
        return pa.table(
            {
                "side": pa.array(out_side, pa.string()),
                "registers": pa.array(out_reg, pa.binary()),
            }
        )

    tbl = collect_table(ds.map_batches(sketch_block, batch_format="pyarrow"))
    sketches = {
        "a": HyperLogLog(p),
        "b": HyperLogLog(p),
        "u": HyperLogLog(p),
    }
    if "side" in tbl.column_names:
        for side, raw in zip(
            tbl.column("side").to_pylist(), tbl.column("registers").to_pylist()
        ):
            other = HyperLogLog(p, registers=np.frombuffer(raw, dtype=np.uint8))
            sketches[side] = sketches[side].merge(other)
            sketches["u"] = sketches["u"].merge(other)
    n_a = float(sketches["a"].count())
    n_b = float(sketches["b"].count())
    n_union = float(sketches["u"].count())
    return pd.DataFrame(
        {
            "n_a": [n_a],
            "n_b": [n_b],
            "n_union": [n_union],
            "n_intersection": [max(0.0, n_a + n_b - n_union)],
        }
    )
