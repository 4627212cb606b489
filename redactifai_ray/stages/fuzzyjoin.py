"""Edit-distance-bounded fuzzy join via symmetric deletion neighborhoods.

The entity-matching shape the reference approximates with per-candidate
Levenshtein scoring inside ``EntityMatcher`` (see
``/root/reference/src/services/entity_matcher.py`` — thresholded edit
distance over candidate pairs) — re-expressed as a distributed EXACT
similarity join: every pair within ``max_edits`` is found, no pair is
missed, without an all-pairs comparison.

Algorithm (SymSpell / symmetric-delete blocking, public): if
``levenshtein(a, b) <= k`` then deleting at most ``k`` characters from
each of ``a`` and ``b`` reaches a COMMON string, so emitting every
"delete up to k chars" variant as a blocking key and pairing rows inside
each block generates a candidate superset; a banded-DP verify
(``functions.textdist.levenshtein``) removes false positives. Exactness
therefore never depends on the blocking hash — collisions only ADD
candidates.

Scale design (SURVEY §2.6 join family):
  * expansion is bounded: ``k=1`` emits ``len(s)+1`` variant rows per
    input row (fewer after set-dedup of repeated-character deletions),
    each a slim ``(vhash: u64, id, text)`` triple — the exchange carries
    short key strings, never documents;
  * ONE hash-partition shuffle on ``vhash % P``; each partition runs ONE
    vectorized pandas self-merge over all its blocks (never a pandas
    call per block — the host-cap-scan lesson), then verifies only its
    locally-deduped candidates with the early-exit banded DP;
  * a pair reachable through variants in different partitions is emitted
    more than once, so a second pair-keyed hash partition dedupes —
    pair-scale, orders of magnitude below candidate scale;
  * skew contract: a variant shared by ``g`` rows generates ``O(g²)``
    candidates. For near-unique keys (names, titles, URLs) ``g`` is
    single-digit; degenerate blocks are capped at ``max_block`` pairs,
    logged per partition, and — when the caller passes a
    ``drop_counter`` actor (``make_drop_counter()``) — accumulated so
    the caller can DETECT a silently-incomplete result after
    materializing (round-4 ADVICE: print-only drops were invisible to
    callers). Never silently quadratic — same doctrine as the LSH
    bucket cap.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..functions.textdist import levenshtein


@ray.remote(num_cpus=0)
class _DropCounter:
    """Zero-CPU accumulator for capped-block drops: worker partitions
    fire-and-forget ``add``; the caller reads ``value`` after the pair
    Dataset is consumed (the count is only complete once every
    partition has run)."""

    def __init__(self) -> None:
        self._n = 0

    def add(self, n: int) -> None:
        self._n += int(n)

    def value(self) -> int:
        return self._n


def make_drop_counter():
    """Create a drop-counter actor to pass as ``fuzzy_join_pairs``'s
    ``drop_counter``; read it with
    ``ray.get(counter.value.remote())`` AFTER consuming the result."""
    return _DropCounter.remote()


def deletion_variants(s: str, k: int) -> set[str]:
    """All strings reachable from ``s`` by deleting up to ``k``
    characters (including ``s`` itself — the 0-deletion variant covers
    exact matches)."""
    out = {s}
    frontier = {s}
    for _ in range(k):
        nxt = set()
        for t in frontier:
            for i in range(len(t)):
                nxt.add(t[:i] + t[i + 1 :])
        out |= nxt
        frontier = nxt
    return out


def _bytemat(strs: "pd.Series | np.ndarray", width: int) -> np.ndarray:
    """Fixed-width byte matrix for a group of equal-length ASCII strings
    (one C-speed join + frombuffer — no per-char Python)."""
    joined = "".join(strs)
    if width == 0:
        return np.empty((len(strs), 0), np.uint8)
    return np.frombuffer(joined.encode("ascii"), np.uint8).reshape(
        -1, width
    )


def _prefix_suffix_cover(a_mat: np.ndarray, b_mat: np.ndarray) -> np.ndarray:
    """For rows of a (width L+1) vs b (width L): True when deleting one
    char from a yields b — common prefix + common suffix covers all of
    b (the vectorized single-deletion test)."""
    L = b_mat.shape[1]
    if L == 0:
        return np.ones(a_mat.shape[0], bool)
    mis_f = a_mat[:, :L] != b_mat
    any_f = mis_f.any(axis=1)
    pref = np.where(any_f, mis_f.argmax(axis=1), L)
    mis_r = a_mat[:, 1:][:, ::-1] != b_mat[:, ::-1]
    any_r = mis_r.any(axis=1)
    suf = np.where(any_r, mis_r.argmax(axis=1), L)
    return pref + suf >= L


def pair_distances(
    ta: np.ndarray, tb: np.ndarray, max_edits: int
) -> np.ndarray:
    """Levenshtein distances for candidate pairs, reported as
    ``max_edits + 1`` beyond the threshold. ``max_edits == 1`` is fully
    vectorized over ASCII pairs (equal length ⇒ hamming; length-diff-1 ⇒
    prefix+suffix single-deletion cover — both numpy byte-matrix passes
    grouped by length); non-ASCII pairs and ``max_edits >= 2`` take the
    early-exit banded DP per pair."""
    n = len(ta)
    out = np.full(n, max_edits + 1, np.int64)
    if n == 0:
        return out
    eq = np.fromiter((a == b for a, b in zip(ta, tb)), bool, n)
    out[eq] = 0
    la = np.fromiter((len(x) for x in ta), np.int64, n)
    lb = np.fromiter((len(x) for x in tb), np.int64, n)
    todo = ~eq & (np.abs(la - lb) <= max_edits)
    if max_edits == 1:
        asc = np.fromiter(
            (a.isascii() and b.isascii() for a, b in zip(ta, tb)), bool, n
        )
        vec = todo & asc
        # equal length: lev<=1 ⟺ hamming<=1 (a single substitution)
        same = vec & (la == lb)
        for L in np.unique(la[same]):
            idx = np.nonzero(same & (la == L))[0]
            ham = (
                _bytemat(ta[idx], L) != _bytemat(tb[idx], L)
            ).sum(axis=1)
            out[idx[ham == 1]] = 1
        # length diff 1: lev<=1 ⟺ one deletion from the longer works
        diff = vec & (np.abs(la - lb) == 1)
        lng = np.where(la > lb, ta, tb)
        sht = np.where(la > lb, tb, ta)
        lshort = np.minimum(la, lb)
        for L in np.unique(lshort[diff]):
            idx = np.nonzero(diff & (lshort == L))[0]
            ok = _prefix_suffix_cover(
                _bytemat(lng[idx], L + 1), _bytemat(sht[idx], L)
            )
            out[idx[ok]] = 1
        todo = todo & ~vec
    for i in np.nonzero(todo)[0]:
        out[i] = levenshtein(ta[i], tb[i], max_edits)
    return out


def _vhash(values: list[str]) -> np.ndarray:
    """Deterministic u64 hash of variant strings (pandas siphash,
    ``categorize=False`` — see ``analyze._term_pkey`` for why the
    categorize path is unsafe)."""
    return pd.util.hash_array(
        np.asarray(values, dtype=object), categorize=False
    )


def fuzzy_join_pairs(
    ds_a: ray.data.Dataset,
    ds_b: Optional[ray.data.Dataset] = None,
    id_col: str = "id",
    text_col: str = "text",
    max_edits: int = 1,
    num_partitions: Optional[int] = None,
    max_block: int = 100_000,
    drop_counter=None,
) -> ray.data.Dataset:
    """All pairs within ``max_edits`` Levenshtein distance — exact.

    Self-join (``ds_b=None``): pairs with ``id_a < id_b`` over ``ds_a``.
    Two-sided: pairs ``(id_a from ds_a, id_b from ds_b)``; ids of the two
    sides may overlap (sides are tracked explicitly).

    Returns a Dataset with columns ``id_a, id_b, dist`` (one row per
    distinct pair). ``max_block``: per-variant-block candidate-pair cap;
    blocks beyond it are dropped (logged per partition), keeping
    degenerate keys (e.g. empty strings under ``k >= len``) from going
    quadratic. Pass ``drop_counter=make_drop_counter()`` to ACCUMULATE
    dropped-block counts; ``ray.get(counter.value.remote())`` after
    consuming the result tells the caller whether the pair set is
    complete (0) or capped (>0).
    """
    from ..cluster import default_partitions

    P = num_partitions or min(default_partitions(), 64)
    two_sided = ds_b is not None

    def expand(side: int):
        def fn(t: pa.Table) -> pa.Table:
            ids = t.column(id_col).to_pylist()
            texts = t.column(text_col).to_pylist()
            v_ids, v_texts, v_keys = [], [], []
            for i, s in zip(ids, texts):
                s = s or ""
                for v in deletion_variants(s, max_edits):
                    v_ids.append(i)
                    v_texts.append(s)
                    v_keys.append(v)
            h = _vhash(v_keys)
            return pa.table(
                {
                    "vhash": pa.array(h, pa.uint64()),
                    "pkey": pa.array(
                        (h % np.uint64(P)).astype(np.int64), pa.int64()
                    ),
                    "id": pa.array(v_ids, pa.int64()),
                    "text": pa.array(v_texts, pa.string()),
                    "side": pa.array([side] * len(v_ids), pa.int8()),
                }
            )

        return fn

    parts = ds_a.map_batches(expand(0), batch_format="pyarrow")
    if two_sided:
        parts = parts.union(
            ds_b.map_batches(expand(1), batch_format="pyarrow")
        )

    def pair_in_partition(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "id_a": pd.Series(dtype="int64"),
                "id_b": pd.Series(dtype="int64"),
                "dist": pd.Series(dtype="int64"),
                "ppkey": pd.Series(dtype="int64"),
            }
        )
        if g.empty or "vhash" not in g.columns:
            return empty
        # one vectorized self-merge over every variant block co-located
        # in this partition; a row never pairs with itself
        g = g.drop_duplicates(["vhash", "id", "side"])
        # cap degenerate blocks BEFORE the merge goes quadratic
        sizes = g.groupby("vhash")["id"].transform("size")
        big = sizes * sizes > max_block
        if big.any():
            n_drop = g.loc[big, "vhash"].nunique()
            print(
                f"fuzzy_join_pairs: dropped {n_drop} degenerate variant "
                f"block(s) above max_block={max_block}"
            )
            if drop_counter is not None:
                # block until the actor has recorded the drop: a
                # fire-and-forget add can still be in flight when the
                # caller consumes the Dataset and reads value()
                # (observed as an order-dependent test flake on a busy
                # box). Drops are rare, so the sync cost is nil.
                ray.get(drop_counter.add.remote(int(n_drop)))
            g = g[~big]
        m = g.merge(g, on="vhash", suffixes=("_a", "_b"))
        if two_sided:
            m = m[(m["side_a"] == 0) & (m["side_b"] == 1)]
        else:
            m = m[m["id_a"] < m["id_b"]]
        if m.empty:
            return empty
        m = m.drop_duplicates(["id_a", "id_b"])
        dists = pair_distances(
            m["text_a"].to_numpy(), m["text_b"].to_numpy(), max_edits
        )
        m = m.assign(dist=dists)
        m = m[m["dist"] <= max_edits]
        if m.empty:
            return empty
        out = m[["id_a", "id_b", "dist"]].astype("int64").copy()
        # pair-keyed partition for the cross-partition dedup pass
        out["ppkey"] = (
            (
                out["id_a"].to_numpy(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                + out["id_b"].to_numpy(np.uint64)
            )
            % np.uint64(P)
        ).astype(np.int64)
        return out

    cand = parts.groupby("pkey", num_partitions=min(P, 16)).map_groups(
        pair_in_partition, batch_format="pandas"
    )

    def dedup_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty or "id_a" not in g.columns:
            return pd.DataFrame(
                {
                    "id_a": pd.Series(dtype="int64"),
                    "id_b": pd.Series(dtype="int64"),
                    "dist": pd.Series(dtype="int64"),
                }
            )
        return g.drop_duplicates(["id_a", "id_b"])[
            ["id_a", "id_b", "dist"]
        ]

    return cand.groupby("ppkey", num_partitions=min(P, 16)).map_groups(
        dedup_pairs, batch_format="pandas"
    )
