"""Host-graph operators: outlink extraction and distributed PageRank.

The web-graph quality-signal family Common-Crawl-style curation uses
(host-level PageRank / harmonic centrality as a document quality prior).
The reference has no graph stage — this extends the engine the same way
the dedup/curate families do: a Ray-Data-first operator over the tables
the crawl already carries.

Distributed shape:
  * ``extract_outlinks`` is a stateless vectorized ``map_batches`` over
    the pages table — one compiled-regex scan per page, emitting slim
    ``(src_host, dst_host)`` edge rows (html never leaves the stage).
  * ``pagerank`` is the bounded-vertex-set formulation: the rank vector
    is host-cardinality (dimension-scale next to the edge fact table —
    CC-scale hosts are ~10^8 while edges are ~10^11), so ranks broadcast
    once per iteration via ``ray.put`` and each edge batch folds its
    contributions with one vectorized ``np.add.at`` — per iteration the
    exchange is ONE tiny (host, partial) groupby-sum; edges never
    re-shuffle and never leave their blocks. Above ``max_hosts`` the
    vector no longer broadcasts; callers shard the graph by host hash
    (documented, not implemented — the capped path raises).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..functions.urls import registrable_domain

_HREF_RE = re.compile(rb'href="(https?://[^"\s>]+)"', re.IGNORECASE)


def extract_outlinks(
    pages: ray.data.Dataset,
    url_col: str = "url",
    html_col: str = "html",
    registrable: bool = True,
    include_self: bool = False,
) -> ray.data.Dataset:
    """Pages → distinct per-page host edges ``(src_host, dst_host)``.

    Only absolute http(s) hrefs count (relative links are same-host
    navigation — boilerplate, not graph signal). ``registrable=True``
    collapses hosts to registrable domains (www.a.co.uk → a.co.uk), the
    granularity host-level PageRank runs at. Non-UTF8 byte ranges are
    ignored, not fatal (crawl payloads are hostile)."""

    def edges(batch: pa.Table) -> pa.Table:
        srcs: list[str] = []
        dsts: list[str] = []
        for u, h in zip(
            batch[url_col].to_pylist(), batch[html_col].to_pylist()
        ):
            if not u or not h:
                continue
            src = (
                registrable_domain(u)
                if registrable
                else u.split("/", 3)[2] if "://" in u else None
            )
            if not src:
                continue
            seen: set[str] = set()
            for m in _HREF_RE.finditer(h):
                link = m.group(1).decode("utf-8", "ignore")
                dst = (
                    registrable_domain(link)
                    if registrable
                    else link.split("/", 3)[2]
                )
                if not dst or (dst == src and not include_self):
                    continue
                seen.add(dst)
            srcs.extend([src] * len(seen))
            dsts.extend(sorted(seen))
        return pa.table(
            {
                "src_host": pa.array(srcs, pa.string()),
                "dst_host": pa.array(dsts, pa.string()),
            }
        )

    return pages.map_batches(edges, batch_format="pyarrow")


def pagerank(
    edges: ray.data.Dataset,
    n_iters: int = 10,
    damping: float = 0.85,
    max_hosts: int = 50_000_000,
) -> pd.DataFrame:
    """Host PageRank over an ``(src_host, dst_host)`` edge Dataset —
    fixed ``n_iters`` power iterations with uniform teleport and uniform
    dangling-mass redistribution (the standard formulation).

    Per iteration: broadcast the host-indexed rank vector (``ray.put``
    once, read per worker), fold each edge batch's contributions with a
    vectorized ``np.add.at`` into ≤|hosts| partial rows, and one small
    keyed groupby-sum finishes the vector. Edges are read once into
    integer-indexed form and re-used across iterations — the fact table
    shuffles zero times. Returns ``(host, rank)`` summing to 1."""
    from ray.data.aggregate import Count, Sum

    # vertex set + out-degrees: one pass over the slim edge columns
    deg = (
        edges.groupby("src_host")
        .aggregate(Count(alias_name="outdeg"))
        .to_pandas()
    )
    dsts = (
        edges.select_columns(["dst_host"])
        .groupby("dst_host")
        .aggregate(Count(alias_name="n"))
        .to_pandas()
    )
    # an empty edge set yields schema-less groupby outputs
    src_hosts = set(deg["src_host"]) if "src_host" in deg.columns else set()
    dst_hosts = set(dsts["dst_host"]) if "dst_host" in dsts.columns else set()
    hosts = sorted(src_hosts.union(dst_hosts))
    n = len(hosts)
    if n == 0:
        return pd.DataFrame({"host": [], "rank": []})
    if n > max_hosts:
        raise ValueError(
            f"{n} hosts exceeds max_hosts={max_hosts}: the rank vector no "
            "longer broadcasts — shard the graph by host hash and run "
            "pagerank per shard with cross-shard rank exchange"
        )
    idx = {h: i for i, h in enumerate(hosts)}
    outdeg = np.zeros(n, dtype=np.int64)
    for h, d in zip(deg["src_host"], deg["outdeg"]):
        outdeg[idx[h]] = d

    idx_ref = ray.put(idx)
    state: dict = {}

    def to_indexed(batch: pa.Table) -> pa.Table:
        if "idx" not in state:
            state["idx"] = ray.get(idx_ref)
        m = state["idx"]
        return pa.table(
            {
                "s": pa.array(
                    [m[x] for x in batch["src_host"].to_pylist()], pa.int64()
                ),
                "d": pa.array(
                    [m[x] for x in batch["dst_host"].to_pylist()], pa.int64()
                ),
            }
        )

    # integer-indexed edges, materialized once, iterated n_iters times
    iedges = edges.map_batches(to_indexed, batch_format="pyarrow").materialize()

    outdeg_ref = ray.put(outdeg)  # host-cardinality, shipped once
    rank = np.full(n, 1.0 / n)
    for _ in range(n_iters):
        rank_ref = ray.put(rank)

        def fold(batch: pa.Table, _r=rank_ref, _o=outdeg_ref) -> pa.Table:
            # zero-copy reads from the local object store (numpy views)
            r, od = ray.get(_r), ray.get(_o)
            s = batch.column("s").to_numpy(zero_copy_only=False)
            d = batch.column("d").to_numpy(zero_copy_only=False)
            w = r[s] / np.maximum(od[s], 1)
            # batch-bounded partials: aggregate per dst PRESENT in the
            # batch (never a |hosts|-sized alloc per batch)
            uniq, inv = np.unique(d, return_inverse=True)
            c = np.zeros(len(uniq), dtype=np.float64)
            np.add.at(c, inv, w)
            return pa.table(
                {
                    "i": pa.array(uniq, pa.int64()),
                    "c": pa.array(c, pa.float64()),
                }
            )

        parts = (
            iedges.map_batches(fold, batch_format="pyarrow")
            .groupby("i", num_partitions=8)
            .aggregate(Sum("c", alias_name="c"))
            .to_pandas()
        )
        contrib = np.zeros(n, dtype=np.float64)
        if len(parts):
            contrib[parts["i"].to_numpy()] = parts["c"].to_numpy()
        dangling = float(rank[outdeg == 0].sum())
        rank = (1.0 - damping) / n + damping * (contrib + dangling / n)

    return pd.DataFrame({"host": hosts, "rank": rank})


def kcore(
    edges: ray.data.Dataset,
    k: int,
    id_cols: tuple[str, str] = ("id_a", "id_b"),
    max_iters: "int | None" = None,
) -> pd.DataFrame:
    """k-core decomposition by distributed iterative peeling: repeatedly
    delete every node of degree < k until the survivor subgraph is
    stable; return its ``(node, degree)`` table (degrees WITHIN the
    core, all >= k).

    edges: undirected simple graph as distinct canonical pairs
    (``id_a < id_b``). Each round is (1) one keyed groupby over
    batch-level degree partials — the exchange carries (node, n) rows,
    node-cardinality-bounded — and (2) one broadcast removed-id
    anti-filter over the surviving edge set (``pc.is_in`` per batch);
    the edge set only shrinks, and is re-materialized per round so the
    next round's two passes don't re-execute the whole chain (the
    ``label_propagation`` round doctrine). The degree table gathers
    driver-side — |V|-bounded, the same contract as ``pagerank``'s rank
    vector; beyond that, shard nodes by hash and peel with cross-shard
    degree exchange. Rounds are data-dependent but bounded by |V| (each
    round removes at least one node or terminates) — so ``max_iters``
    defaults to the node count observed in the FIRST degree pass (the
    documented bound; round-4 ADVICE — a fixed constant wrongly raised
    on graphs whose peel cascade outlasts it)."""
    from ray.data.aggregate import Sum

    a_col, b_col = id_cols

    def degree_partials(t: pa.Table) -> pa.Table:
        if a_col not in t.column_names:
            return pa.table(
                {"node": pa.array([], pa.int64()),
                 "n": pa.array([], pa.int64())}
            )
        both = np.concatenate(
            [
                t.column(a_col).to_numpy(zero_copy_only=False),
                t.column(b_col).to_numpy(zero_copy_only=False),
            ]
        ).astype(np.int64)
        uniq, counts = np.unique(both, return_counts=True)
        return pa.table(
            {
                "node": pa.array(uniq, pa.int64()),
                "n": pa.array(counts, pa.int64()),
            }
        )

    cur = edges.select_columns([a_col, b_col]).materialize()
    bound = max_iters
    rounds = 0
    while bound is None or rounds < bound:
        rounds += 1
        deg = (
            cur.map_batches(degree_partials, batch_format="pyarrow")
            .groupby("node")
            .aggregate(Sum("n", alias_name="degree"))
            .to_pandas()
        )
        if bound is None:
            # |V| from the first degree pass: each later round removes
            # >= 1 node or terminates, so |V| rounds always suffice
            bound = len(deg) + 1
        if deg.empty or "node" not in deg.columns:
            return pd.DataFrame(
                {
                    "node": pd.Series(dtype="int64"),
                    "degree": pd.Series(dtype="int64"),
                }
            )
        drop = deg.loc[deg["degree"] < k, "node"]
        if drop.empty:
            out = deg.astype({"node": "int64", "degree": "int64"})
            return out.sort_values("node").reset_index(drop=True)
        drop_ref = ray.put(pa.array(drop.to_numpy(np.int64), pa.int64()))
        state: dict = {}

        def peel(t: pa.Table, _d=drop_ref) -> pa.Table:
            if "d" not in state:
                state["d"] = ray.get(_d)
            bad = pc.or_(
                pc.is_in(t[a_col], value_set=state["d"]),
                pc.is_in(t[b_col], value_set=state["d"]),
            )
            return t.filter(pc.invert(pc.fill_null(bad, False)))

        cur = cur.map_batches(peel, batch_format="pyarrow").materialize()
    raise RuntimeError(f"kcore: no fixpoint within {bound} rounds")


__all__ = ["extract_outlinks", "pagerank", "kcore"]
