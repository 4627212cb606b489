"""Training-data curation operators: deterministic split assignment,
domain-weighted mixture sampling, benchmark decontamination, and
repetition (Gopher-style) signals.

These are the corpus-construction steps a 100 TB webtext pipeline runs
between cleaning and training (the reference engine stops at masking —
SURVEY §2 notes it has no corpus analytics; cf.
``src/services/masking_service.py`` which ends at masked output):

- ``assign_split``    — carve train/val/test with a content-stable hash so
                        membership is reproducible across runs and nodes.
- ``mixture_sample``  — downsample each domain/source to a target mixture
                        weight with the same hash (no RNG, no coordination).
- ``find_contaminated`` / ``decontaminate`` — flag/drop training documents
                        sharing a long word n-gram with an evaluation set
                        (the GPT-3/Dolma 13-gram decontamination rule).
- ``repetition_signals`` — per-document duplicate-word / duplicate-bigram /
                        top-word-frequency fractions (Gopher repetition
                        filters).

All bucket arithmetic is md5-hex-prefix based and all fractions are
fixed-order double math over exact ints, so every operator is
oracle-checkable bit-for-bit against DuckDB.

Scale shape: split/mixture/repetition are embarrassingly parallel
``map_batches`` stages (no shuffle). Decontamination broadcasts the
evaluation set's n-gram hashes once per worker while they fit
(benchmarks are ≪ corpus; 8-byte hashes, not strings) and falls back to
a fully distributed join-free union + hash-partition groupby semi-join
— the same shape as ``dedup._fold_pairs_distributed`` — when the test
side exceeds the broadcast cap.
"""

from __future__ import annotations

import hashlib
import itertools
import math
from typing import Callable, Mapping, Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..collect import collect_capped, collect_table
from ..cluster import default_partitions
from ..functions.hashing import stable_hash64

DEFAULT_SPLITS: tuple[tuple[str, int], ...] = (
    ("train", 80),
    ("val", 10),
    ("test", 10),
)


def _md5_bucket(value, n_buckets: int) -> int:
    """First 8 hex chars of md5(str(value)) as int, mod n_buckets —
    deliberately mirrors DuckDB's
    ``('0x'||substr(md5(cast(v as varchar)),1,8))::BIGINT % n``."""
    h = hashlib.md5(str(value).encode("utf-8")).hexdigest()
    return int(h[:8], 16) % n_buckets


def assign_split(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    splits: Sequence[tuple[str, int]] = DEFAULT_SPLITS,
    n_buckets: int = 100,
    out_col: str = "split",
) -> ray.data.Dataset:
    """Append a deterministic split label derived from md5(id).

    Hash-based (not row-order-based) so the assignment is stable under
    repartitioning, resumed runs, and corpus growth — the property a
    train/val/test carve needs at 100 TB. ``splits`` are (name, width)
    pairs whose widths sum to ``n_buckets``."""
    names = [n for n, _ in splits]
    bounds = list(itertools.accumulate(w for _, w in splits))
    if bounds[-1] != n_buckets:
        raise ValueError("split widths must sum to n_buckets")

    def tag(batch: pa.Table) -> pa.Table:
        out = []
        for i in batch[id_col].to_pylist():
            bk = _md5_bucket(i, n_buckets)
            for name, b in zip(names, bounds):
                if bk < b:
                    out.append(name)
                    break
        return batch.append_column(out_col, pa.array(out, pa.string()))

    return ds.map_batches(tag, batch_format="pyarrow")


def mixture_sample(
    ds: ray.data.Dataset,
    weights: Mapping[str, float] | Callable[[str], float],
    key_col: str = "source",
    id_col: str = "doc_id",
    n_buckets: int = 10_000,
    default_weight: float = 1.0,
) -> ray.data.Dataset:
    """Keep each row with probability ``weights[key]`` — deterministically.

    A row survives iff ``md5_bucket(id) < floor(weight * n_buckets)``, so
    the sample is reproducible, needs no RNG state or coordination, and a
    document keeps/drops identically on every node and every rerun (the
    property domain-mixture construction needs). Weights outside [0, 1]
    clamp."""
    if callable(weights):
        weight_of = weights
    else:
        weight_of = lambda k: weights.get(k, default_weight)  # noqa: E731

    def keep(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_pylist()
        ids = batch[id_col].to_pylist()
        mask = []
        for k, i in zip(keys, ids):
            w = min(1.0, max(0.0, float(weight_of(k))))
            mask.append(_md5_bucket(i, n_buckets) < math.floor(w * n_buckets))
        return batch.filter(pa.array(mask, pa.bool_()))

    return ds.map_batches(keep, batch_format="pyarrow")


def temperature_rates(
    counts: Mapping[str, int], alpha: float = 0.5
) -> dict[str, float]:
    """Temperature-based mixture rates (the multilingual XLM-R /
    unified-scaling α-sampling rule): natural source proportions
    p_i ∝ c_i resample toward q_i ∝ p_i^α, which as a per-source keep
    rate (downsampling only, the rarest source keeps everything) is
    ``rate_i = (c_min / c_i)^(1−α)``. α=1 keeps natural proportions
    (every rate 1), α=0 equalizes expected counts across sources.

    α=0.5 deliberately routes through ``math.sqrt`` — IEEE-754
    correctly-rounded, so the driver-side rate is bit-identical to a
    SQL twin's ``sqrt()`` and the floor-threshold survival test cannot
    straddle an ulp."""
    if not counts:
        return {}
    c_min = min(counts.values())
    out: dict[str, float] = {}
    for k, c in counts.items():
        ratio = c_min / c
        exp = 1.0 - alpha
        out[k] = math.sqrt(ratio) if exp == 0.5 else ratio**exp
    return out


def temperature_mixture(
    ds: ray.data.Dataset,
    alpha: float = 0.5,
    key_col: str = "source",
    id_col: str = "doc_id",
    n_buckets: int = 10_000,
) -> ray.data.Dataset:
    """Deterministic temperature resampling over a key column: one tiny
    key-groupby computes the per-source counts (mixture-cardinality),
    the rates derive driver-side (``temperature_rates``), and the
    survival test is the same hash-threshold rule as
    ``mixture_sample`` — no RNG, stable under repartition/rerun, and
    the corpus streams through exactly one counting pass plus one
    filter pass."""
    ctbl = collect_table(ds.groupby(key_col).count())
    counts = (
        dict(
            zip(
                ctbl.column(key_col).to_pylist(),
                ctbl.column("count()").to_pylist(),
            )
        )
        if key_col in ctbl.column_names
        else {}
    )
    return mixture_sample(
        ds,
        temperature_rates(counts, alpha),
        key_col=key_col,
        id_col=id_col,
        n_buckets=n_buckets,
    )


# ------------------------------------------------------ decontamination --

_NGRAM_SEED = 313


def _ngram_hashes(text: str, n: int) -> list[int]:
    """64-bit hashes of word n-grams (lowercased, whitespace-split).

    Documents shorter than ``n`` words yield NO n-grams (they cannot
    carry a full benchmark n-gram) — matching the SQL oracle's
    ``generate_series(1, len(w)-n+1)`` semantics, unlike
    ``shingle_hashes``' whole-doc fallback."""
    words = (text or "").lower().split()
    if len(words) < n:
        return []
    return [
        stable_hash64(" ".join(words[i : i + n]), _NGRAM_SEED)
        for i in range(len(words) - n + 1)
    ]


def find_contaminated(
    train: ray.data.Dataset,
    test: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
    max_broadcast_ngrams: int = 20_000_000,
) -> ray.data.Dataset:
    """Ids of training documents sharing ≥1 word n-gram with the test set.

    Fast path: the test side's distinct n-gram hashes (8 bytes each —
    benchmark suites are millions of grams, ≪ corpus) broadcast once via
    ``ray.put`` and cache per worker; the training corpus streams through
    one membership scan. Above ``max_broadcast_ngrams`` the check
    degrades to a fully distributed join-free semi-join: both sides emit
    slim (gram_hash, doc_id, is_test) rows, a hash-partition groupby
    co-locates each gram's test flag with the train docs carrying it, and
    flagged ids reduce to a distinct set — no driver gather of either
    corpus (same shape as ``dedup._fold_pairs_distributed``)."""

    def test_grams(batch: pa.Table) -> pa.Table:
        seen: set[int] = set()
        for t in batch[text_col].to_pylist():
            seen.update(_ngram_hashes(t, n))
        return pa.table(
            {"gram": pa.array(np.fromiter(seen, dtype=np.uint64, count=len(seen)))}
        )

    gram_tbl = collect_capped(
        test.map_batches(test_grams, batch_format="pyarrow"),
        max_broadcast_ngrams,
    )
    if gram_tbl is not None:
        gram_set = (
            set(
                gram_tbl.column("gram")
                .combine_chunks()
                .to_numpy(zero_copy_only=False)
                .tolist()
            )
            if "gram" in gram_tbl.column_names
            else set()
        )
        gram_ref = ray.put(gram_set)
        state: dict = {}  # per-worker cache

        def flag(batch: pa.Table) -> pa.Table:
            if "grams" not in state:
                state["grams"] = ray.get(gram_ref)
            grams = state["grams"]
            keep = [
                any(h in grams for h in _ngram_hashes(t, n))
                for t in batch[text_col].to_pylist()
            ]
            return batch.select([id_col]).filter(pa.array(keep, pa.bool_()))

        return train.map_batches(flag, batch_format="pyarrow")

    return _find_contaminated_distributed(train, test, text_col, id_col, n)


def _find_contaminated_distributed(
    train: ray.data.Dataset,
    test: ray.data.Dataset,
    text_col: str,
    id_col: str,
    n: int,
) -> ray.data.Dataset:
    """Join-free distributed n-gram semi-join (scale fallback)."""
    P = default_partitions()

    def side_rows(is_test: int):
        def emit(batch: pa.Table) -> pa.Table:
            grams: list[int] = []
            ids: list[int] = []
            for i, t in zip(
                batch[id_col].to_pylist(), batch[text_col].to_pylist()
            ):
                hs = _ngram_hashes(t, n)
                if is_test:
                    hs = list(set(hs))
                grams.extend(hs)
                ids.extend([i] * len(hs))
            g = np.array(grams, dtype=np.uint64).astype(np.int64)
            return pa.table(
                {
                    "pkey": pa.array(g % P, pa.int64()),
                    "gram": pa.array(g, pa.int64()),
                    id_col: pa.array(ids, pa.int64()),
                    "is_test": pa.array([is_test] * len(ids), pa.int8()),
                }
            )

        return emit

    stream = train.map_batches(side_rows(0), batch_format="pyarrow").union(
        test.map_batches(side_rows(1), batch_format="pyarrow")
    )

    def flag_partition(g: pd.DataFrame) -> pd.DataFrame:
        if "gram" not in g.columns:  # schema-less empty partition
            return pd.DataFrame({id_col: pd.Series(dtype="int64")})
        test_grams = set(g.loc[g["is_test"] == 1, "gram"].to_numpy())
        tr = g[g["is_test"] == 0]
        hit = tr.loc[tr["gram"].isin(test_grams), id_col].unique()
        return pd.DataFrame({id_col: pd.Series(hit, dtype="int64")})

    def norm(t: pa.Table) -> pa.Table:
        if id_col in t.column_names:
            return t.select([id_col])
        return pa.table({id_col: pa.array([], pa.int64())})

    flagged = (
        stream.groupby("pkey", num_partitions=P)
        .map_groups(flag_partition, batch_format="pandas")
        .map_batches(norm, batch_format="pyarrow")
    )
    # a doc can hit grams in many partitions — global distinct
    from ray.data.aggregate import Count

    return (
        flagged.groupby(id_col, num_partitions=P)
        .aggregate(Count(alias_name="_n"))
        .select_columns([id_col])
    )


def decontaminate(
    train: ray.data.Dataset,
    test: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
    max_broadcast_flagged: int = 20_000_000,
) -> ray.data.Dataset:
    """Drop contaminated documents from ``train``.

    The flagged set is contaminated docs only (≪ corpus for any sane
    benchmark) so it broadcasts; the corpus streams through one
    vectorized ``pc.is_in`` anti-filter."""
    flagged_rows = find_contaminated(train, test, text_col, id_col, n).take(
        max_broadcast_flagged + 1
    )
    if len(flagged_rows) > max_broadcast_flagged:
        raise ValueError(
            "flagged set exceeds broadcast cap — the corpus is mostly "
            "contaminated; inspect before dropping"
        )
    flagged_ref = ray.put(sorted(r[id_col] for r in flagged_rows))
    state: dict = {}

    def drop(batch: pa.Table) -> pa.Table:
        if "flagged" not in state:
            state["flagged"] = pa.array(ray.get(flagged_ref))
        if len(state["flagged"]) == 0:
            return batch
        hit = pc.fill_null(
            pc.is_in(batch[id_col], value_set=state["flagged"]), False
        )
        return batch.filter(pc.invert(hit))

    return train.map_batches(drop, batch_format="pyarrow")


def find_contaminated_bloom(
    train: ray.data.Dataset,
    test: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
    fpr: float = 1e-4,
    merge_fanin: int = 64,
) -> ray.data.Dataset:
    """Bloom-filter variant of ``find_contaminated`` — the constant-size
    broadcast path for huge benchmark suites.

    Where the exact path broadcasts an 8-byte-per-gram hash set (GBs at
    10^9 test grams) or falls back to a full n-gram shuffle, this builds
    one Bloom filter over the test side's grams (~2.3 bytes/gram at
    fpr=1e-4) and broadcasts that instead. False positives over-flag —
    the safe direction for decontamination — and false negatives are
    impossible, so the flagged set is always a superset of the exact
    one, with expected excess ≈ fpr × scanned grams.

    Distributed shape (mirrors ``sketch.hll_distinct``): one pass sizes
    the filter from per-batch distinct-gram counts (summed across
    batches — an overcount, which only oversizes); one pass folds each
    test block into a partial filter row; a tree-merge stage ORs every
    ``merge_fanin`` rows; the driver merges O(blocks/fanin) rows and
    ``ray.put``s the result once. Train then streams through a single
    membership scan. Test-set grams never shuffle."""
    from ray.data.aggregate import Sum

    from ..functions.sketch import BloomFilter

    def count_grams(batch: pa.Table) -> pa.Table:
        seen: set[int] = set()
        for t in batch[text_col].to_pylist():
            seen.update(_ngram_hashes(t, n))
        return pa.table({"n_grams": pa.array([len(seen)], pa.int64())})

    total = test.map_batches(count_grams, batch_format="pyarrow").aggregate(
        Sum("n_grams", alias_name="n_grams")
    )
    proto = BloomFilter.for_capacity(int(total["n_grams"] or 0) or 1, fpr)
    n_bits, k = proto.n_bits, proto.k

    def sketch_block(batch: pa.Table) -> pa.Table:
        bf = BloomFilter(n_bits, k)
        grams: set[int] = set()
        for t in batch[text_col].to_pylist():
            grams.update(_ngram_hashes(t, n))
        bf.add_hashes(np.fromiter(grams, dtype=np.uint64, count=len(grams)))
        return pa.table({"words": pa.array([bf.to_bytes()], pa.binary())})

    def merge_batch(batch: pa.Table) -> pa.Table:
        acc = BloomFilter(n_bits, k)
        for raw in batch["words"].to_pylist():
            acc.merge(BloomFilter.from_bytes(raw, n_bits, k))
        return pa.table({"words": pa.array([acc.to_bytes()], pa.binary())})

    wt = collect_table(
        test.map_batches(sketch_block, batch_format="pyarrow")
        .map_batches(merge_batch, batch_format="pyarrow",
                     batch_size=merge_fanin)
    )
    acc = BloomFilter(n_bits, k)
    if "words" in wt.column_names:
        for raw in wt.column("words").to_pylist():
            acc.merge(BloomFilter.from_bytes(raw, n_bits, k))
    bloom_ref = ray.put(acc.to_bytes())
    state: dict = {}  # per-worker cache

    def flag(batch: pa.Table) -> pa.Table:
        if "bloom" not in state:
            state["bloom"] = BloomFilter.from_bytes(
                ray.get(bloom_ref), n_bits, k
            )
        bf = state["bloom"]
        keep = []
        for t in batch[text_col].to_pylist():
            hs = _ngram_hashes(t, n)
            hit = bool(
                bf.contains_hashes(
                    np.asarray(hs, dtype=np.uint64)
                ).any()
            ) if hs else False
            keep.append(hit)
        return batch.select([id_col]).filter(pa.array(keep, pa.bool_()))

    return train.map_batches(flag, batch_format="pyarrow")


def decontaminate_bloom(
    train: ray.data.Dataset,
    test: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
    fpr: float = 1e-4,
    max_broadcast_flagged: int = 20_000_000,
) -> ray.data.Dataset:
    """``decontaminate`` with the constant-size Bloom broadcast: drops a
    guaranteed superset of the exactly-contaminated docs (excess bounded
    by the filter's FPR — tolerable over-removal in exchange for a
    test-side broadcast that never scales with gram count)."""
    flagged_tbl = collect_capped(
        find_contaminated_bloom(train, test, text_col, id_col, n, fpr),
        max_broadcast_flagged,
    )
    if flagged_tbl is None:
        raise ValueError(
            "flagged set exceeds broadcast cap — the corpus is mostly "
            "contaminated; inspect before dropping"
        )
    flagged_ref = ray.put(
        sorted(flagged_tbl.column(id_col).to_pylist())
        if id_col in flagged_tbl.column_names
        else []
    )
    state: dict = {}

    def drop(batch: pa.Table) -> pa.Table:
        if "flagged" not in state:
            state["flagged"] = pa.array(ray.get(flagged_ref))
        if len(state["flagged"]) == 0:
            return batch
        hit = pc.fill_null(
            pc.is_in(batch[id_col], value_set=state["flagged"]), False
        )
        return batch.filter(pc.invert(hit))

    return train.map_batches(drop, batch_format="pyarrow")


# --------------------------------------------------- repetition signals --


class RepetitionSignals:
    """Per-document repetition fractions (Gopher-style quality filters).

    Emits ``n_words``, ``dup_word_frac`` (1 − distinct/total words),
    ``dup_2gram_frac`` (same over word bigrams) and ``top_word_frac``
    (most frequent word's share). Fixed-order double math over exact
    ints — bit-exact against the DuckDB oracle. Stateless but shipped as
    a callable class for symmetry with the other analyze stages."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from collections import Counter

        n_words, dup_w, dup_bg, top_w = [], [], [], []
        for t in batch[self.text_col].to_pylist():
            words = (t or "").lower().split()
            nw = len(words)
            n_words.append(nw)
            if nw == 0:
                dup_w.append(0.0)
                top_w.append(0.0)
            else:
                dup_w.append(1.0 - len(set(words)) * 1.0 / nw)
                top_w.append(max(Counter(words).values()) * 1.0 / nw)
            if nw < 2:
                dup_bg.append(0.0)
            else:
                grams = [
                    words[i] + " " + words[i + 1] for i in range(nw - 1)
                ]
                dup_bg.append(1.0 - len(set(grams)) * 1.0 / len(grams))
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "n_words": pa.array(n_words, pa.int64()),
                "dup_word_frac": pa.array(dup_w, pa.float64()),
                "dup_2gram_frac": pa.array(dup_bg, pa.float64()),
                "top_word_frac": pa.array(top_w, pa.float64()),
            }
        )


def repetition_signals(
    ds: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """Map the corpus through :class:`RepetitionSignals` (no shuffle)."""
    return ds.map_batches(
        RepetitionSignals(text_col, id_col), batch_format="pyarrow"
    )


def stratified_sample(
    ds: ray.data.Dataset,
    key_col: str = "source",
    id_col: str = "doc_id",
    k: int = 3,
    n_buckets: int = 1_000_000,
) -> ray.data.Dataset:
    """Deterministic stratified sample: the k rows per key with the
    smallest (md5_bucket(id), id) order key — a reproducible "random"
    k-per-stratum draw with no RNG state (same hash family as
    ``assign_split``; ties broken by id so the draw is total-ordered).

    Scale shape mirrors the grouped top-k (``q_top_events_per_user``):
    per-batch partial min-k per key bounds the exchange at k rows per
    (key, batch); one groupby finishes. Returns (key_col, id_col)."""

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select([key_col, id_col]).to_pandas()
        df["_bk"] = [_md5_bucket(i, n_buckets) for i in df[id_col]]
        df = (
            df.sort_values(["_bk", id_col], kind="mergesort")
            .groupby(key_col, sort=False)
            .head(k)
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        if key_col not in g.columns:  # schema-less empty partition
            return pd.DataFrame(
                {
                    key_col: pd.Series(dtype="object"),
                    id_col: pd.Series(dtype="int64"),
                }
            )
        g = g.sort_values(["_bk", id_col], kind="mergesort").head(k)
        return g[[key_col, id_col]]

    def norm(t: pa.Table) -> pa.Table:
        if key_col in t.column_names:
            return t.select([key_col, id_col])
        return pa.table(
            {
                key_col: pa.array([], pa.string()),
                id_col: pa.array([], pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(key_col, num_partitions=default_partitions())
        .map_groups(final, batch_format="pandas")
        .map_batches(norm, batch_format="pyarrow")
    )


# ------------------------------------------- boilerplate line removal --

_LINE_SEED = 829


def hot_line_hashes(
    ds: ray.data.Dataset,
    text_col: str = "extracted_text",
    min_docs: int = 2,
) -> ray.data.Dataset:
    """Hashes of non-blank lines appearing in ≥ ``min_docs`` documents —
    the CCNet-style boilerplate vocabulary (nav bars, cookie banners,
    footers). Slim shape: per-batch per-doc-distinct line-hash counts
    fold locally, one groupby sums (the exchange carries the batch-local
    line vocabulary as 16-byte rows, never line text)."""
    from collections import Counter

    from ray.data.aggregate import Sum

    def line_rows(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch[text_col].to_pylist():
            seen = {
                stable_hash64(line, _LINE_SEED)
                for line in (t or "").split("\n")
                if line.strip()
            }
            for lh in seen:
                c[lh] += 1
        lhs = np.fromiter(c.keys(), dtype=np.uint64, count=len(c)).astype(
            np.int64
        )
        return pa.table(
            {
                "lh": pa.array(lhs, pa.int64()),
                "n": pa.array(list(c.values()), pa.int64()),
            }
        )

    counts = (
        ds.map_batches(line_rows, batch_format="pyarrow")
        .groupby("lh", num_partitions=default_partitions())
        .aggregate(Sum("n", alias_name="n"))
    )
    return counts.map_batches(
        lambda t: t.select(["lh"]).filter(
            pc.greater_equal(t["n"], min_docs)
        ),
        batch_format="pyarrow",
    )



def drop_hot_lines(
    ds: ray.data.Dataset,
    hot_hashes: np.ndarray,
    text_col: str = "extracted_text",
) -> ray.data.Dataset:
    """One bounded hot-line anti-filter stage: drop every line whose
    stable hash is in ``hot_hashes`` (blank lines are structural and
    always kept). The building block behind
    :func:`remove_boilerplate_lines`'s chunked-broadcast plan, exposed
    so the flagship CLI can apply a precomputed boilerplate vocabulary
    (computed once over the full input) inside each resumable
    partition's pipeline."""
    ref = ray.put(np.asarray(hot_hashes, dtype=np.uint64))
    state: dict = {}  # per-worker cache

    def drop(batch: pa.Table) -> pa.Table:
        if "hot" not in state:
            state["hot"] = set(ray.get(ref).tolist())
        hot_set = state["hot"]
        texts = []
        for t in batch[text_col].to_pylist():
            if t is None:
                texts.append(None)
                continue
            kept = [
                line
                for line in t.split("\n")
                if not line.strip()
                or stable_hash64(line, _LINE_SEED) not in hot_set
            ]
            texts.append("\n".join(kept))
        idx = batch.column_names.index(text_col)
        out = batch.set_column(idx, text_col, pa.array(texts, pa.string()))
        if "n_chars" in out.column_names:
            # keep the size column honest for downstream size-bucketing
            # and reporting after lines were removed
            out = out.set_column(
                out.column_names.index("n_chars"),
                "n_chars",
                pa.array(
                    [None if t is None else len(t) for t in texts],
                    pa.int64(),
                ),
            )
        return out

    return ds.map_batches(drop, batch_format="pyarrow")


def remove_boilerplate_lines(
    ds: ray.data.Dataset,
    text_col: str = "extracted_text",
    min_docs: int = 2,
    hot: Optional[ray.data.Dataset] = None,
    chunk_size: int = 20_000_000,
) -> ray.data.Dataset:
    """Drop lines shared by ≥ ``min_docs`` documents (CCNet-style
    cross-document line dedup — the webtext boilerplate cleaner).

    Exact at ANY hot-set size with no shuffle of document text: the hot
    hashes stream to the driver in bounded chunks (``iter_batches``, one
    chunk in driver memory at a time) and each chunk becomes one
    vectorized anti-filter stage over the streaming corpus — k chained
    ``map_batches`` stages instead of an uncapped broadcast or a
    corpus-text shuffle. Blank lines are structural and always kept.

    Pass ``hot`` (from :func:`hot_line_hashes`, possibly computed by an
    earlier job over the same shard group) to avoid re-executing this
    dataset's upstream for the stats pass — the CCNet production shape;
    when omitted, the stats pass re-executes ``ds``'s lineage once."""
    if hot is None:
        hot = hot_line_hashes(ds, text_col, min_docs)

    out = ds
    buf: list[np.ndarray] = []
    buffered = 0

    def attach(chunk_hashes: np.ndarray) -> None:
        nonlocal out
        out = drop_hot_lines(out, chunk_hashes, text_col=text_col)

    for b in hot.iter_batches(batch_size=None, batch_format="pyarrow"):
        arr = b["lh"].to_numpy(zero_copy_only=False).astype(np.uint64)
        buf.append(arr)
        buffered += arr.size
        if buffered >= chunk_size:
            attach(np.concatenate(buf))
            buf, buffered = [], 0
    if buffered:
        attach(np.concatenate(buf))
    return out



def _gopher_keep(
    text: Optional[str],
    min_words: int,
    max_words: int,
    max_dup_word_frac: float,
    max_top_word_frac: float,
    min_mean_word_len: float,
    max_mean_word_len: float,
) -> bool:
    """One document's Gopher verdict — the single source of the
    threshold math, shared by the audit op (:func:`gopher_filter`) and
    the row-filtering gate (:func:`gopher_gate`)."""
    from collections import Counter

    words = (text or "").lower().split()
    nw = len(words)
    if nw == 0:
        return False
    dupw = 1.0 - len(set(words)) * 1.0 / nw
    topw = max(Counter(words).values()) * 1.0 / nw
    mwl = sum(len(w) for w in words) * 1.0 / nw
    return (
        min_words <= nw <= max_words
        and dupw <= max_dup_word_frac
        and topw <= max_top_word_frac
        and min_mean_word_len <= mwl <= max_mean_word_len
    )


def gopher_gate(
    ds: ray.data.Dataset,
    text_col: str = "text",
    min_words: int = 30,
    max_words: int = 100_000,
    max_dup_word_frac: float = 0.55,
    max_top_word_frac: float = 0.20,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
) -> ray.data.Dataset:
    """Row-filtering form of the Gopher gate: keeps surviving FULL rows
    (the curation-pipeline shape — :func:`gopher_filter` is the audit
    form that emits signals for every document instead). Same verdict
    math by construction (shared helper), pure map_batches."""

    def gate(batch: pa.Table) -> pa.Table:
        keep = [
            _gopher_keep(
                t, min_words, max_words, max_dup_word_frac,
                max_top_word_frac, min_mean_word_len, max_mean_word_len,
            )
            for t in batch[text_col].to_pylist()
        ]
        return batch.filter(pa.array(keep, pa.bool_()))

    return ds.map_batches(gate, batch_format="pyarrow")


def gopher_filter(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 30,
    max_words: int = 100_000,
    max_dup_word_frac: float = 0.55,
    max_top_word_frac: float = 0.20,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
) -> ray.data.Dataset:
    """Gopher-style composite document quality gate (Rae et al. 2021
    §A1.1.1): word-count range, duplicate-word fraction, top-word share
    and mean word length, folded into one ``keep`` verdict per document.

    Emits every document with its signals AND the verdict (not just
    survivors) so downstream can audit why a document dropped — the
    corpus-curation report shape. Pure ``map_batches``, no shuffle; all
    fractions are single divisions of exact ints (and every threshold
    compare happens on that exact double), so the op is bit-exact
    against the DuckDB oracle. Thresholds are parameters — defaults are
    tuned to the synthetic corpus, not Gopher's web-scale values."""

    def signals(batch: pa.Table) -> pa.Table:
        from collections import Counter

        nw_c, dupw_c, topw_c, mwl_c, keep_c = [], [], [], [], []
        for t in batch[text_col].to_pylist():
            words = (t or "").lower().split()
            nw = len(words)
            nw_c.append(nw)
            if nw == 0:
                dupw_c.append(0.0)
                topw_c.append(0.0)
                mwl_c.append(0.0)
                keep_c.append(False)
                continue
            dupw = 1.0 - len(set(words)) * 1.0 / nw
            topw = max(Counter(words).values()) * 1.0 / nw
            mwl = sum(len(w) for w in words) * 1.0 / nw
            dupw_c.append(dupw)
            topw_c.append(topw)
            mwl_c.append(mwl)
            keep_c.append(
                min_words <= nw <= max_words
                and dupw <= max_dup_word_frac
                and topw <= max_top_word_frac
                and min_mean_word_len <= mwl <= max_mean_word_len
            )
        return pa.table(
            {
                id_col: batch[id_col],
                "n_words": pa.array(nw_c, pa.int64()),
                "dup_word_frac": pa.array(dupw_c, pa.float64()),
                "top_word_frac": pa.array(topw_c, pa.float64()),
                "mean_word_len": pa.array(mwl_c, pa.float64()),
                "keep": pa.array(keep_c, pa.bool_()),
            }
        )

    return ds.map_batches(signals, batch_format="pyarrow")


def _doc_chunks(text: Optional[str], mode: str, chunk_words: int) -> list[str]:
    """Split a document into dedup units. ``words`` mode: fixed windows
    of ``chunk_words`` whitespace tokens (the SQL-expressible
    pseudo-paragraph used when a corpus has no line structure);
    ``lines`` mode: newline paragraphs (the real webtext case — CCNet /
    RefinedWeb dedup at paragraph granularity)."""
    if mode == "lines":
        return (text or "").split("\n")
    toks = (text or "").split()
    return [
        " ".join(toks[i : i + chunk_words])
        for i in range(0, len(toks), chunk_words)
    ]


def chunk_dedup(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    mode: str = "words",
    chunk_words: int = 10,
    loser_chunk_size: int = 5_000_000,
) -> ray.data.Dataset:
    """Corpus-global first-wins chunk (pseudo-paragraph) dedup
    (RefinedWeb §3.3 / Lee et al. 2022 "Deduplicating Training Data
    Makes Language Models Better", at paragraph granularity): every
    repeated occurrence of a chunk — across documents AND within one —
    is dropped except the first by ``(id, chunk_idx)`` order, and
    documents are reassembled from their surviving chunks.

    Differs from :func:`remove_boilerplate_lines` (which drops ALL
    copies of hot lines): here exactly one copy survives, which is the
    training-data dedup semantic rather than the boilerplate semantic.

    Scale shape — document text never shuffles:

    1. slim pass: each batch emits ``(chunk_md5, id, idx)`` rows; a
       hash-partitioned groupby + vectorized run scan yields *loser*
       occurrences (everything after the global first), exactly like
       ``dedup.exact_dedup``'s loser scan.
    2. the loser ``(id, idx)`` pairs stream to the driver in bounded
       chunks (``iter_batches``) and each chunk becomes one vectorized
       anti-stage over the corpus — the
       :func:`remove_boilerplate_lines` chained-broadcast pattern, so
       the op is exact at ANY duplicate cardinality with no cap.
    3. anti-stages tombstone losers to NULL in a position-stable
       ``list<string>`` chunk column (indices never shift between
       stages); a final stage joins survivors back into ``text_col``.

    In ``lines`` mode blank lines are structural: never hashed, never
    dropped. Output adds ``n_chunks`` / ``n_chunks_kept`` columns."""
    P = default_partitions()
    joiner = "\n" if mode == "lines" else " "

    def is_unit(c: str) -> bool:
        # blank lines are structure, not content
        return bool(c.strip()) if mode == "lines" else True

    def slim_rows(batch: pa.Table) -> pa.Table:
        import hashlib as _hl

        md5s: list[str] = []
        ids: list = []
        idxs: list[int] = []
        for i, t in zip(
            batch[id_col].to_pylist(), batch[text_col].to_pylist()
        ):
            for j, c in enumerate(_doc_chunks(t, mode, chunk_words)):
                if not is_unit(c):
                    continue
                md5s.append(
                    _hl.md5(c.encode("utf-8", "surrogatepass")).hexdigest()
                )
                ids.append(i)
                idxs.append(j)
        return pa.table(
            {
                "ch": pa.array(md5s, pa.string()),
                id_col: pa.array(ids),
                "idx": pa.array(idxs, pa.int64()),
                "pkey": pa.array(
                    [int(m[:8], 16) % P for m in md5s], pa.int64()
                ),
            }
        )

    def find_losers(g: pd.DataFrame) -> pd.DataFrame:
        if "ch" not in g.columns:  # schema-less empty partition
            return pd.DataFrame(
                {
                    id_col: pd.Series(dtype="int64"),
                    "idx": pd.Series(dtype="int64"),
                }
            )
        g = g.sort_values(["ch", id_col, "idx"], kind="mergesort")
        chs = g["ch"].to_numpy()
        n = len(g)
        first = np.ones(n, dtype=bool)
        if n > 1:
            first[1:] = chs[1:] != chs[:-1]
        lose = ~first
        return pd.DataFrame(
            {
                id_col: g[id_col].to_numpy()[lose],
                "idx": g["idx"].to_numpy()[lose],
            }
        )

    losers = (
        ds.map_batches(slim_rows, batch_format="pyarrow")
        .groupby("pkey", num_partitions=P)
        .map_groups(find_losers, batch_format="pandas")
    )

    # corpus → position-stable chunk lists
    def to_chunks(batch: pa.Table) -> pa.Table:
        lists = [
            _doc_chunks(t, mode, chunk_words)
            for t in batch[text_col].to_pylist()
        ]
        out = batch.drop_columns([text_col])
        return out.append_column(
            "_chunks", pa.array(lists, pa.list_(pa.string()))
        )

    out = ds.map_batches(to_chunks, batch_format="pyarrow")

    def attach(ids_arr: np.ndarray, idx_arr: np.ndarray) -> None:
        nonlocal out
        ref = ray.put((ids_arr, idx_arr))
        state: dict = {}  # per-worker cache, one per anti-stage

        def tombstone(batch: pa.Table) -> pa.Table:
            if "losers" not in state:
                i_a, x_a = ray.get(ref)
                state["losers"] = set(zip(i_a.tolist(), x_a.tolist()))
            lose = state["losers"]
            col = batch["_chunks"].to_pylist()
            new = []
            for i, chunks in zip(batch[id_col].to_pylist(), col):
                new.append(
                    [
                        None if (i, j) in lose else c
                        for j, c in enumerate(chunks)
                    ]
                )
            k = batch.column_names.index("_chunks")
            return batch.set_column(
                k, "_chunks", pa.array(new, pa.list_(pa.string()))
            )

        out = out.map_batches(tombstone, batch_format="pyarrow")

    buf_i: list[np.ndarray] = []
    buf_x: list[np.ndarray] = []
    buffered = 0
    for b in losers.iter_batches(batch_size=None, batch_format="pyarrow"):
        buf_i.append(b[id_col].to_numpy(zero_copy_only=False))
        buf_x.append(b["idx"].to_numpy(zero_copy_only=False))
        buffered += len(b)
        if buffered >= loser_chunk_size:
            attach(np.concatenate(buf_i), np.concatenate(buf_x))
            buf_i, buf_x, buffered = [], [], 0
    if buffered:
        attach(np.concatenate(buf_i), np.concatenate(buf_x))

    def reassemble(batch: pa.Table) -> pa.Table:
        col = batch["_chunks"].to_pylist()
        texts, n_chunks, n_kept = [], [], []
        for chunks in col:
            kept = [c for c in chunks if c is not None]
            texts.append(joiner.join(kept))
            # counts are over dedup UNITS (blanks in lines mode are
            # structure: preserved in text, excluded from both counts).
            # A None is always a tombstoned unit — blanks never hash,
            # so they are never tombstoned.
            n_chunks.append(
                sum(1 for c in chunks if c is None or is_unit(c))
            )
            n_kept.append(
                sum(1 for c in chunks if c is not None and is_unit(c))
            )
        out_t = batch.drop_columns(["_chunks"])
        out_t = out_t.append_column(text_col, pa.array(texts, pa.string()))
        out_t = out_t.append_column("n_chunks", pa.array(n_chunks, pa.int64()))
        return out_t.append_column(
            "n_chunks_kept", pa.array(n_kept, pa.int64())
        )

    return out.map_batches(reassemble, batch_format="pyarrow")


def global_token_prefix(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    bucket_width: int = 4096,
) -> ray.data.Dataset:
    """Exact exclusive prefix sum of whitespace-token counts in ``id``
    order → ``(id, n_tokens, start_pos)``: every document's position in
    the corpus-concatenated token stream. The shared scan under
    :func:`token_shards` and :func:`pack_sequences`.

    This is a distributed prefix sum (a scan — the one primitive the
    Dataset API has no native operator for), done in the classic
    two-phase shape with a slim exchange:

    1. per-doc ``(id, n_tokens, bucket=id // bucket_width)`` projection
       (2 ints/row — text never shuffles); one small groupby sums
       tokens per id-bucket, and the driver turns those ~``N/width``
       partial sums into per-bucket prefix *offsets* (broadcast once).
    2. a hash-partitioned groupby co-locates each bucket's slim rows;
       an in-partition vectorized cumsum plus the bucket offset yields
       every document's exact global prefix.

    Pick ``bucket_width`` ≈ sqrt(corpus docs) so both the driver table
    and the per-group work stay ~sqrt(N) at 10^12 docs."""
    P = default_partitions()

    def slim(batch: pa.Table) -> pa.Table:
        ids = batch[id_col]
        n = pa.array(
            [len((t or "").split()) for t in batch[text_col].to_pylist()],
            pa.int64(),
        )
        bucket = pc.divide(ids, bucket_width)
        return pa.table({id_col: ids, "n": n, "bucket": bucket})

    counts = ds.map_batches(slim, batch_format="pyarrow")

    from ray.data.aggregate import Sum

    per_bucket = (
        counts.groupby("bucket", num_partitions=P)
        .aggregate(Sum("n", alias_name="bn"))
        .to_pandas()
        .sort_values("bucket")
    )
    offsets = dict(
        zip(
            per_bucket["bucket"].tolist(),
            np.concatenate(
                [[0], np.cumsum(per_bucket["bn"].to_numpy())[:-1]]
            ).tolist(),
        )
    )
    off_ref = ray.put(offsets)
    state: dict = {}

    def assign(g: pd.DataFrame) -> pd.DataFrame:
        if id_col not in g.columns:  # schema-less empty partition
            return pd.DataFrame(
                {
                    id_col: pd.Series(dtype="int64"),
                    "n_tokens": pd.Series(dtype="int64"),
                    "start_pos": pd.Series(dtype="int64"),
                }
            )
        if "off" not in state:
            state["off"] = ray.get(off_ref)
        off = state["off"]
        out = []
        for bucket, grp in g.groupby("bucket", sort=False):
            grp = grp.sort_values(id_col, kind="mergesort")
            n = grp["n"].to_numpy()
            before = off[int(bucket)] + np.cumsum(n) - n
            out.append(
                pd.DataFrame(
                    {
                        id_col: grp[id_col].to_numpy(),
                        "n_tokens": n,
                        "start_pos": before,
                    }
                )
            )
        return pd.concat(out, ignore_index=True)

    return counts.groupby("bucket", num_partitions=P).map_groups(
        assign, batch_format="pandas"
    )


def token_shards(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    budget: int = 10_000,
    bucket_width: int = 4096,
) -> ray.data.Dataset:
    """Pack documents (in ``id`` order) into training shards of
    ~``budget`` whitespace tokens each — the corpus-sharding step that
    follows curation (each shard becomes one training file). A document
    lands in shard ``floor(tokens_before_it / budget)``; the scan is
    :func:`global_token_prefix`. Returns ``(id, n_tokens, shard_id)`` —
    aggregate downstream for shard manifests, or join back by id to
    route rows to output files."""

    def to_shard(t: pa.Table) -> pa.Table:
        shard = pc.divide(t["start_pos"], budget)
        return pa.table(
            {
                id_col: t[id_col],
                "n_tokens": t["n_tokens"],
                "shard_id": shard,
            }
        )

    return global_token_prefix(ds, text_col, id_col, bucket_width).map_batches(
        to_shard, batch_format="pyarrow"
    )


def pack_sequences(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    seq_len: int = 1024,
    bucket_width: int = 4096,
) -> ray.data.Dataset:
    """GPT-style fixed-length sequence packing plan: concatenate the
    corpus token stream in ``id`` order and cut it into training
    sequences of exactly ``seq_len`` tokens (documents MAY straddle a
    boundary — the dense-packing regime, no padding). Emits per doc:
    ``(id, n_tokens, start_pos, first_seq, last_seq, offset_in_first)``
    — everything a writer needs to route each document's token slices
    to its sequence files, without ever materializing the stream.

    Empty documents occupy no tokens: their ``last_seq`` equals
    ``first_seq`` (the sequence the cursor is parked in). The scan is
    :func:`global_token_prefix`; everything after it is a vectorized
    per-batch projection, so the whole plan adds zero shuffles on top
    of the scan's one slim exchange."""

    def to_seqs(t: pa.Table) -> pa.Table:
        start = t.column("start_pos").to_numpy(zero_copy_only=False)
        n = t.column("n_tokens").to_numpy(zero_copy_only=False)
        first = start // seq_len
        last_tok = start + np.maximum(n, 1) - 1  # empty docs park in first
        last = last_tok // seq_len
        return pa.table(
            {
                id_col: t[id_col],
                "n_tokens": t["n_tokens"],
                "start_pos": t["start_pos"],
                "first_seq": pa.array(first, pa.int64()),
                "last_seq": pa.array(last, pa.int64()),
                "offset_in_first": pa.array(start % seq_len, pa.int64()),
            }
        )

    return global_token_prefix(ds, text_col, id_col, bucket_width).map_batches(
        to_seqs, batch_format="pyarrow"
    )


def exact_quantiles(
    ds: ray.data.Dataset,
    col: str,
    qs: Sequence[float],
) -> dict[float, int]:
    """Exact quantiles of an integer column via the distributed value
    histogram (per-batch ``value_counts`` → tiny groupby on distinct
    values → driver cumulative-rank select). Exact and shuffle-light
    whenever value cardinality is bounded (lengths, counts, scores);
    rank semantics = DuckDB ``quantile_disc`` (index ceil(q·n)−1 of the
    sorted multiset). The driver holds one row per DISTINCT value."""
    from ray.data.aggregate import Sum

    def value_counts(batch: pa.Table) -> pa.Table:
        vc = batch[col].value_counts()
        return pa.table(
            {
                "val": vc.field("values"),
                "cnt": pc.cast(vc.field("counts"), pa.int64()),
            }
        )

    hist = (
        ds.map_batches(value_counts, batch_format="pyarrow")
        .groupby("val")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
        .sort_values("val")
        .reset_index(drop=True)
    )
    n = int(hist["cnt"].sum())
    cum = hist["cnt"].cumsum()
    out = {}
    for q in qs:
        rank = max(0, int(np.ceil(q * n)) - 1)
        idx = int((cum > rank).idxmax())
        out[q] = int(hist.loc[idx, "val"])
    return out


def winsorize(
    ds: ray.data.Dataset,
    col: str,
    lo: float = 0.05,
    hi: float = 0.95,
    out_col: Optional[str] = None,
) -> ray.data.Dataset:
    """Clip a column to its [lo, hi] exact quantiles — the outlier
    treatment for length/score features before they feed thresholds or
    models. Two scalar cut points broadcast in the closure; the clip is
    one vectorized ``pyarrow.compute`` pass, no shuffle (the quantile
    pass is the histogram fold of :func:`exact_quantiles`)."""
    cuts = exact_quantiles(ds, col, [lo, hi])
    lo_v, hi_v = cuts[lo], cuts[hi]
    dst = out_col or f"{col}_winsor"

    def clip(batch: pa.Table) -> pa.Table:
        arr = pc.min_element_wise(
            pc.max_element_wise(batch[col], lo_v), hi_v
        )
        if dst in batch.column_names:
            return batch.set_column(batch.column_names.index(dst), dst, arr)
        return batch.append_column(dst, arr)

    return ds.map_batches(clip, batch_format="pyarrow")


# ------------------------------------------------ repeated substrings --


def _window_hashes(tokens: list[str], k: int) -> np.ndarray:
    """stable_hash64 of every k-token window, masked into int64 range."""
    n = len(tokens) - k + 1
    if n <= 0:
        return np.empty(0, np.int64)
    out = np.empty(n, np.int64)
    for i in range(n):
        out[i] = stable_hash64(" ".join(tokens[i : i + k])) & 0x7FFFFFFFFFFFFFFF
    return out


def _winnow_positions(whashes: np.ndarray, w: int) -> np.ndarray:
    """Winnowing minimizer positions (Schleimer et al. 2003): for each
    length-``w`` window over the hash sequence keep the position of the
    RIGHTMOST minimum; consecutive duplicates collapse. Guarantee: any
    shared token run of length ≥ k + w - 1 shares ≥ 1 selected window."""
    n = len(whashes)
    if n == 0:
        return np.empty(0, np.int64)
    if n <= w:
        return np.array([int(np.flatnonzero(whashes == whashes.min())[-1])])
    keep: list[int] = []
    prev = -1
    for s in range(n - w + 1):
        win = whashes[s : s + w]
        p = s + int(np.flatnonzero(win == win.min())[-1])
        if p != prev:
            keep.append(p)
            prev = p
    return np.asarray(keep, np.int64)


def _emit_window_rows(
    text_col: str, id_col: str, k: int, mode: str, winnow_w: int,
    with_starts: bool,
):
    """Batch fn → slim (whash, doc_id[, start], n, pkey) window rows.
    ``exact`` emits every window (the ExactSubstr contract); ``winnow``
    emits only minimizer windows — the 100-TB scale path (≈ 2/(w+1) of
    the rows; detection guaranteed for shared runs ≥ k + w - 1 tokens)."""
    P = default_partitions()

    def f(batch: pa.Table) -> pa.Table:
        whs: list[int] = []
        dids: list[int] = []
        starts: list[int] = []
        ns: list[int] = []
        for did, t in zip(
            batch[id_col].to_pylist(), batch[text_col].to_pylist()
        ):
            toks = (t or "").split()
            h = _window_hashes(toks, k)
            if h.size == 0:
                continue
            pos = (
                np.arange(h.size, dtype=np.int64)
                if mode == "exact"
                else _winnow_positions(h, winnow_w)
            )
            if with_starts:
                for p in pos:
                    whs.append(int(h[p]))
                    dids.append(int(did))
                    starts.append(int(p))
                    ns.append(1)
            else:
                # combine per (window, doc) inside the batch
                agg: dict[int, int] = {}
                for p in pos:
                    key = int(h[p])
                    agg[key] = agg.get(key, 0) + 1
                for key, n in agg.items():
                    whs.append(key)
                    dids.append(int(did))
                    ns.append(n)
        cols = {
            "whash": pa.array(whs, pa.int64()),
            id_col: pa.array(dids, pa.int64()),
        }
        if with_starts:
            cols["start"] = pa.array(starts, pa.int64())
        cols["n"] = pa.array(ns, pa.int64())
        cols["pkey"] = pa.array(
            (np.asarray(whs, np.int64) % P).astype(np.int64)
            if whs else np.empty(0, np.int64)
        )
        return pa.table(cols)

    return f


def repeated_window_counts(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    mode: str = "exact",
    winnow_w: int = 16,
) -> ray.data.Dataset:
    """Per document: how many of its k-token windows ALSO occur in at
    least one OTHER document — the ExactSubstr duplication signal (Lee
    et al. 2022, "Deduplicating Training Data Makes Language Models
    Better") as a distributed fold. Returns (id_col, n_dup_windows),
    docs with ≥ 1 duplicated window only.

    Scale shape: the exchange carries one slim (whash, doc, n) row per
    distinct (window, doc) — token-scale, which is inherent to exact
    substring dedup — and ONE window-keyed hash-partition groupby finds
    windows spanning ≥ 2 distinct docs (vectorized run scan); a final
    doc-keyed groupby sums per-doc contributions (doc-scale). For
    100-TB corpora run ``mode="winnow"``: winnowing minimizer sampling
    cuts the exchange ≈ (w+1)/2× while guaranteeing detection of any
    shared run of ≥ k + winnow_w - 1 tokens."""
    from ray.data.aggregate import Sum

    P = default_partitions()
    rows = ds.map_batches(
        _emit_window_rows(text_col, id_col, k, mode, winnow_w, False),
        batch_format="pyarrow",
    )

    def dup_contrib(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {id_col: pd.Series(dtype="int64"),
             "n_dup_windows": pd.Series(dtype="int64")}
        )
        if "whash" not in g.columns or g.empty:
            return empty
        g = g.sort_values("whash", kind="mergesort")
        wh = g["whash"].to_numpy(np.int64)
        starts = np.flatnonzero(np.concatenate([[True], wh[1:] != wh[:-1]]))
        counts = np.diff(np.append(starts, len(g)))
        dids = g[id_col].to_numpy(np.int64)
        ns = g["n"].to_numpy(np.int64)
        out_d: list[int] = []
        out_n: list[int] = []
        for s, c in zip(starts, counts):
            if c < 2:
                continue  # rows are per (window, doc): c ≥ 2 ⇔ ≥ 2 docs
            for j in range(s, s + c):
                out_d.append(int(dids[j]))
                out_n.append(int(ns[j]))
        if not out_d:
            return empty
        return pd.DataFrame({id_col: out_d, "n_dup_windows": out_n})

    return (
        rows.groupby("pkey", num_partitions=P)
        .map_groups(dup_contrib, batch_format="pandas")
        .groupby(id_col)
        .aggregate(Sum("n_dup_windows", alias_name="n_dup_windows"))
    )


def remove_repeated_substrings(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    out_col: Optional[str] = None,
    max_broadcast_losers: int = 5_000_000,
) -> ray.data.Dataset:
    """ExactSubstr-style cross-document substring dedup: for every
    k-token window occurring in ≥ 2 distinct documents, the document
    with the MINIMUM id keeps its occurrences; every other document has
    the covered token range removed (overlapping ranges union before
    cutting, so a shared passage of any length ≥ k vanishes from the
    losers in one pass). Within-document repetition is left alone —
    that is the Gopher repetition gate's job.

    Scale shape: one slim (whash, doc, start) exchange + one
    window-keyed groupby emits loser occurrences only (duplication
    volume, ≪ corpus); losers broadcast once (``max_broadcast_losers``
    cap — the same increments-must-fit contract as the dedup stores)
    and the cut is a per-batch vectorized token mask. Text never
    shuffles."""
    P = default_partitions()
    rows = ds.map_batches(
        _emit_window_rows(text_col, id_col, k, "exact", 0, True),
        batch_format="pyarrow",
    )

    def loser_occurrences(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {id_col: pd.Series(dtype="int64"),
             "start": pd.Series(dtype="int64")}
        )
        if "whash" not in g.columns or g.empty:
            return empty
        g = g.sort_values(["whash", id_col], kind="mergesort")
        wh = g["whash"].to_numpy(np.int64)
        dids = g[id_col].to_numpy(np.int64)
        sts = g["start"].to_numpy(np.int64)
        bounds = np.flatnonzero(np.concatenate([[True], wh[1:] != wh[:-1]]))
        counts = np.diff(np.append(bounds, len(g)))
        out_d: list[int] = []
        out_s: list[int] = []
        for s, c in zip(bounds, counts):
            run_d = dids[s : s + c]
            if run_d[0] == run_d[-1]:  # sorted: single doc → not cross-doc
                continue
            winner = run_d[0]  # min doc id (sorted)
            for j in range(s, s + c):
                if run_d[j - s] != winner:
                    out_d.append(int(dids[j]))
                    out_s.append(int(sts[j]))
        if not out_d:
            return empty
        return pd.DataFrame({id_col: out_d, "start": out_s})

    loser_tbl = collect_capped(
        rows.groupby("pkey", num_partitions=P)
        .map_groups(loser_occurrences, batch_format="pandas"),
        max_broadcast_losers,
    )
    if loser_tbl is None:
        raise ValueError(
            f"remove_repeated_substrings found >{max_broadcast_losers} "
            "duplicated window occurrences; raise the cap or pre-dedup "
            "with chunk_dedup/near_dedup first (duplication volume must "
            "stay ≪ corpus — the ExactSubstr contract)"
        )
    if id_col in loser_tbl.column_names and loser_tbl.num_rows:
        ld = (
            loser_tbl.column(id_col).combine_chunks().cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        ls = (
            loser_tbl.column("start").combine_chunks().cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        order = np.lexsort((ls, ld))
        ld, ls = ld[order], ls[order]
        bounds = np.flatnonzero(np.r_[True, ld[1:] != ld[:-1]])
        ref = ray.put(
            {
                int(d): arr
                for d, arr in zip(
                    ld[bounds].tolist(), np.split(ls, bounds[1:])
                )
            }
        )
    else:
        ref = ray.put({})
    dst = out_col or text_col
    state: dict = {}

    def cut(batch: pa.Table) -> pa.Table:
        if "ranges" not in state:
            state["ranges"] = ray.get(ref)
        ranges = state["ranges"]
        out: list[Optional[str]] = []
        for did, t in zip(
            batch[id_col].to_pylist(), batch[text_col].to_pylist()
        ):
            starts = ranges.get(int(did))
            if starts is None or t is None:
                out.append(t)
                continue
            toks = t.split()
            keep = np.ones(len(toks), bool)
            for st in starts:
                keep[st : st + k] = False
            out.append(" ".join(tok for tok, kf in zip(toks, keep) if kf))
        arr = pa.array(out, pa.string())
        if dst in batch.column_names:
            return batch.set_column(batch.column_names.index(dst), dst, arr)
        return batch.append_column(dst, arr)

    return ds.map_batches(cut, batch_format="pyarrow")


def dedup_lines(
    ds: ray.data.Dataset,
    text_col: str = "text",
) -> ray.data.Dataset:
    """Intra-document line dedup: within each document, keep only the
    FIRST occurrence of each exact line (order preserved) — the cheap
    row-local cousin of the cross-document operators (``chunk_dedup``
    dedups across docs; CCNet boilerplate removal needs corpus stats).
    Kills per-page repeated nav/footer/listing lines at zero exchange
    cost: a pure stateless ``map_batches``, no shuffle, no state.

    Empty lines are kept unconditionally (blank lines are structure,
    and they repeat legitimately). Adds ``n_lines`` / ``n_lines_kept``
    audit columns."""

    def drop_dups(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        new, n_all, n_kept = [], [], []
        for t in texts:
            if t is None:
                new.append(None)
                n_all.append(0)
                n_kept.append(0)
                continue
            lines = t.split("\n")
            seen: set[str] = set()
            kept = []
            for ln in lines:
                if ln == "":
                    kept.append(ln)
                    continue
                if ln in seen:
                    continue
                seen.add(ln)
                kept.append(ln)
            new.append("\n".join(kept))
            n_all.append(len(lines))
            n_kept.append(len(kept))
        k = batch.column_names.index(text_col)
        out = batch.set_column(k, text_col, pa.array(new, pa.string()))
        out = out.append_column("n_lines", pa.array(n_all, pa.int64()))
        return out.append_column(
            "n_lines_kept", pa.array(n_kept, pa.int64())
        )

    return ds.map_batches(drop_dups, batch_format="pyarrow")


def pii_gate(
    ds,
    max_bp: int = 100,
    text_col: str = "text",
    categories: tuple = ("Email", "PhoneNumber", "SSN"),
):
    """PII-density curation gate: drop documents whose regex-detected
    span count exceeds ``max_bp`` basis points of their length — the
    de-id detector feeding the training-data filter (many corpora gate
    out PII-heavy pages instead of masking them). Raw (pre-merge) match
    counts, floor division, null/empty text passes (density 0). Pure
    per-worker-cached detector map, zero shuffles."""
    import numpy as np
    import pyarrow as pa

    from .detect import DEFAULT_PATTERNS, make_detect_batch

    pats = {k: DEFAULT_PATTERNS[k] for k in categories}
    detect = make_detect_batch(
        patterns=pats, detect_names=False, text_col=text_col
    )

    def gate(t: pa.Table) -> pa.Table:
        d = detect(t)
        ns = np.array([len(s) for s in d["spans"].to_pylist()], dtype=np.int64)
        nc = np.array(
            [len(x or "") for x in t[text_col].to_pylist()], dtype=np.int64
        )
        bp = np.where(nc > 0, (ns * 10000) // np.maximum(nc, 1), 0)
        return t.filter(pa.array(bp <= max_bp))

    return ds.map_batches(gate, batch_format="pyarrow")
