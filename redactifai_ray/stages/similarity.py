"""Similarity search over an embedding column (list<float>).

Baseline: brute-force cosine top-k — the query matrix broadcasts ONCE via
``ray.put`` (never re-ships per batch); each batch task computes a numpy
matmul against it and emits per-batch partial top-k rows; a final small
groupby(query) merge selects the global top-k. The shuffle therefore moves
O(n_queries × k × n_blocks) candidate rows — not the corpus.

Scale path: IVF-style bucketing — the same hyperplane sketch as
``embedding_near_dup_pairs`` restricts each query to matching buckets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..cluster import default_partitions, default_pool


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    return mat / norms[:, None]


class BruteForceTopK:
    """Per-batch partial top-k against a broadcast query matrix."""

    def __init__(self, queries_ref, k: int, id_col: str, vec_col: str):
        q = ray.get(queries_ref)  # fetched once per actor, zero-copy local
        self.q_ids = np.asarray(q["ids"])
        self.q_mat = _normalize(np.asarray(q["vectors"], dtype=np.float64))
        self.k = k
        self.id_col, self.vec_col = id_col, vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[self.id_col].to_pylist())
        mat = _normalize(np.asarray(batch[self.vec_col].to_pylist(), dtype=np.float64))
        sims = self.q_mat @ mat.T  # (nq, nb)
        k = min(self.k, sims.shape[1])
        out_q, out_id, out_s = [], [], []
        for qi in range(sims.shape[0]):
            row = sims[qi]
            top = np.argpartition(-row, k - 1)[:k]
            for j in top:
                out_q.append(int(self.q_ids[qi]))
                out_id.append(int(ids[j]))
                out_s.append(float(row[j]))
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                self.id_col: pa.array(out_id, pa.int64()),
                "cosine": pa.array(out_s, pa.float64()),
            }
        )


def knn_topk(
    emb: ray.data.Dataset,
    query_ids: list[int],
    query_vectors: list[list[float]],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> ray.data.Dataset:
    """Global cosine top-k per query. Output: (query_id, vec_id, cosine,
    rank), rank 1-based, deterministic tie-break by vec_id."""
    queries_ref = ray.put({"ids": list(query_ids), "vectors": list(query_vectors)})

    partials = emb.map_batches(
        BruteForceTopK,
        fn_constructor_kwargs=dict(
            queries_ref=queries_ref, k=k, id_col=id_col, vec_col=vec_col
        ),
        batch_format="pyarrow",
        concurrency=default_pool(),
        num_cpus=1,
    )

    def merge_topk(group: pd.DataFrame) -> pd.DataFrame:
        if exclude_self:
            group = group[group[id_col] != group["query_id"]]
        # deterministic: score desc, then id asc
        group = group.sort_values(
            ["cosine", id_col], ascending=[False, True], kind="mergesort"
        ).head(k)
        group = group.reset_index(drop=True)
        group["rank"] = np.arange(1, len(group) + 1, dtype=np.int64)
        return group

    return partials.groupby("query_id", num_partitions=default_partitions(floor=8)).map_groups(
        merge_topk, batch_format="pandas"
    )


def knn_topk_from_dataset(
    emb: ray.data.Dataset,
    n_queries: int = 10,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> ray.data.Dataset:
    """Convenience: use the first ``n_queries`` vectors (by id) as queries.

    The query side is tiny → ``take``-ing it on the driver is the
    broadcast-small-side pattern, not a full materialization."""
    import pyarrow.compute as pc

    q = (
        emb.map_batches(
            lambda t: t.filter(pc.less(t[id_col], n_queries)),
            batch_format="pyarrow",
        )
        .take(n_queries)
    )
    q.sort(key=lambda r: r[id_col])
    return knn_topk(
        emb,
        [r[id_col] for r in q],
        [r[vec_col] for r in q],
        k=k,
        id_col=id_col,
        vec_col=vec_col,
    )
