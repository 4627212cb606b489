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

from ..cluster import default_partitions


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
            # deterministic partial top-k: argpartition breaks exact-cosine
            # ties arbitrarily at the k boundary, which can drop the global
            # merge's (-cosine, id)-ordered winner (ADVICE r1). Keep every
            # candidate tied with the k-th value, lexsort by (-cos, id),
            # then truncate — same O(n) partition, tie-safe.
            kth = np.partition(row, len(row) - k)[len(row) - k]
            cand = np.flatnonzero(row >= kth)
            order = np.lexsort((ids[cand], -row[cand]))
            top = cand[order[:k]]
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

    # per-worker cached task, not an actor pool: the stage state is one
    # ray.get of the broadcast queries (zero-copy local) — tasks skip
    # pool spin-up and fuse with the upstream read (MinHash doctrine)
    _cache: dict = {}

    def topk_batch(batch: pa.Table) -> pa.Table:
        inst = _cache.get("inst")
        if inst is None:
            inst = BruteForceTopK(
                queries_ref=queries_ref, k=k, id_col=id_col, vec_col=vec_col
            )
            _cache["inst"] = inst
        return inst(batch)

    partials = emb.map_batches(topk_batch, batch_format="pyarrow")

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


def knn_topk_lsh(
    emb: ray.data.Dataset,
    query_ids: list[int],
    query_vectors: list[list[float]],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    probe_hamming: int = 1,
    seed: int = 7,
    exclude_self: bool = True,
) -> ray.data.Dataset:
    """Approximate top-k: the IVF/LSH scale path for the brute-force
    baseline above. Vectors bucket by an ``n_planes``-bit random-hyperplane
    sketch (one column added per batch, no shuffle); each query probes its
    own bucket plus all buckets within Hamming distance ``probe_hamming``
    of its sketch (multi-probe), and only rows in probed buckets are
    scored. Recall is tunable via n_planes/probe_hamming; at 100 TB this
    reduces scored candidates by ~2^n_planes / probes.
    """
    import numpy as np

    rng = np.random.default_rng(seed)
    q_mat = _normalize(np.asarray(query_vectors, dtype=np.float64))
    dim = q_mat.shape[1]
    planes = rng.standard_normal((dim, n_planes))

    def sketch_of(mat: np.ndarray) -> np.ndarray:
        bits = (mat @ planes > 0).astype(np.int64)
        return (bits * (1 << np.arange(n_planes, dtype=np.int64))).sum(axis=1)

    q_sketch = sketch_of(q_mat)
    # probe set per query: own bucket + all buckets within probe_hamming
    # bit flips (multi-probe LSH)
    probed: set[int] = set()
    for s in q_sketch:
        probed.add(int(s))
        if probe_hamming >= 1:
            for b in range(n_planes):
                probed.add(int(s) ^ (1 << b))
        if probe_hamming >= 2:
            for b1 in range(n_planes):
                for b2 in range(b1 + 1, n_planes):
                    probed.add(int(s) ^ (1 << b1) ^ (1 << b2))
    probed_ref = ray.put(np.array(sorted(probed), dtype=np.int64))
    queries_ref = ray.put({"ids": list(query_ids), "vectors": q_mat.tolist()})

    def filter_probed(batch: pa.Table) -> pa.Table:
        keep = ray.get(probed_ref)
        mat = np.asarray(batch[vec_col].to_pylist(), dtype=np.float64)
        if mat.size == 0:
            return batch
        sk = sketch_of(_normalize(mat))
        mask = np.isin(sk, keep)
        return batch.filter(pa.array(mask, pa.bool_()))

    candidates = emb.map_batches(filter_probed, batch_format="pyarrow")
    return knn_topk(
        candidates, query_ids, [list(v) for v in q_mat], k=k,
        id_col=id_col, vec_col=vec_col, exclude_self=exclude_self,
    )


# ------------------------------------------------------------- IVF knn --


def build_ivf_centroids(
    emb: ray.data.Dataset,
    n_centroids: int = 64,
    sample_size: int = 10_000,
    n_iters: int = 10,
    vec_col: str = "embedding",
    seed: int = 11,
) -> np.ndarray:
    """Deterministic k-means centroids from a bounded sample (Lloyd's
    iterations, seeded kmeans++-style init on the sample). The sample is
    the broadcast-small side: 10k × dim floats regardless of corpus size;
    training is a driver-side numpy loop over a fixed iteration count, so
    the result is bit-reproducible."""
    sample = emb.limit(sample_size).to_pandas()
    X = _normalize(np.asarray(list(sample[vec_col]), dtype=np.float64))
    k = min(n_centroids, len(X))
    rng = np.random.default_rng(seed)
    # kmeans++ init (deterministic rng)
    centroids = [X[rng.integers(len(X))]]
    for _ in range(1, k):
        d2 = np.min(
            [1.0 - X @ c for c in centroids], axis=0
        )  # cosine distance to nearest chosen
        d2 = np.maximum(d2, 0)
        probs = d2 / d2.sum() if d2.sum() > 0 else np.full(len(X), 1.0 / len(X))
        centroids.append(X[rng.choice(len(X), p=probs)])
    C = np.stack(centroids)
    for _ in range(n_iters):
        assign = np.argmax(X @ C.T, axis=1)
        for j in range(k):
            members = X[assign == j]
            if len(members):
                m = members.mean(axis=0)
                norm = np.linalg.norm(m)
                if norm > 0:
                    C[j] = m / norm
    return C


def knn_topk_ivf(
    emb: ray.data.Dataset,
    query_ids: list[int],
    query_vectors: list[list[float]],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 64,
    nprobe: int = 8,
    centroids: Optional[np.ndarray] = None,
    exclude_self: bool = True,
) -> ray.data.Dataset:
    """IVF approximate top-k: corpus vectors assign to their nearest
    k-means centroid (one vectorized matmul per batch, no shuffle);
    each query scores only vectors whose centroid is among its ``nprobe``
    nearest centroids. At 100 TB this reduces scored candidates by
    ~n_centroids/nprobe with recall controlled by nprobe — the trained
    counterpart of the hyperplane-LSH path (`knn_topk_lsh`); centroids
    train once (`build_ivf_centroids`) and broadcast."""
    C = centroids if centroids is not None else build_ivf_centroids(
        emb, n_centroids=n_centroids, vec_col=vec_col
    )
    q_mat = _normalize(np.asarray(query_vectors, dtype=np.float64))
    probe_lists = np.argsort(-(q_mat @ C.T), axis=1)[:, :nprobe]
    probed = set(int(c) for row in probe_lists for c in row)
    state_refs = ray.put({"C": C, "probed": probed})

    def filter_probed(batch: pa.Table) -> pa.Table:
        st = ray.get(state_refs)
        mat = np.asarray(batch[vec_col].to_pylist(), dtype=np.float64)
        if mat.size == 0:
            return batch
        assign = np.argmax(_normalize(mat) @ st["C"].T, axis=1)
        mask = np.isin(assign, list(st["probed"]))
        return batch.filter(pa.array(mask, pa.bool_()))

    candidates = emb.map_batches(filter_probed, batch_format="pyarrow")
    return knn_topk(
        candidates, query_ids, [list(v) for v in q_mat], k=k,
        id_col=id_col, vec_col=vec_col, exclude_self=exclude_self,
    )


def kmeans_assign(
    emb: ray.data.Dataset,
    centroids: Optional[np.ndarray] = None,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> ray.data.Dataset:
    """Semantic cluster assignment over an embedding column — the
    corpus-organization step behind cluster-balanced sampling and
    SemDeDup-style semantic dedup: every vector gets its nearest
    (cosine) k-means centroid plus the similarity to it.

    Scale shape: centroids train once from a bounded sample
    (`build_ivf_centroids` — driver numpy, deterministic) and broadcast
    via ``ray.put``; assignment is one vectorized matmul per batch with
    no shuffle. Rows-only correctness (a trained model is not
    SQL-expressible); determinism and centroid-consistency are
    test-pinned."""
    C = (
        centroids
        if centroids is not None
        else build_ivf_centroids(emb, n_centroids=n_centroids, vec_col=vec_col)
    )
    ref = ray.put(C)
    state: dict = {}

    def assign(batch: pa.Table) -> pa.Table:
        if "C" not in state:
            state["C"] = ray.get(ref)
        mat = np.asarray(batch[vec_col].to_pylist(), dtype=np.float64)
        if mat.size == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "cluster_id": pa.array([], pa.int64()),
                    "sim": pa.array([], pa.float64()),
                }
            )
        sims = _normalize(mat) @ state["C"].T
        best = np.argmax(sims, axis=1)
        return pa.table(
            {
                id_col: batch[id_col],
                "cluster_id": pa.array(best.astype(np.int64), pa.int64()),
                "sim": pa.array(
                    sims[np.arange(len(best)), best], pa.float64()
                ),
            }
        )

    return emb.map_batches(assign, batch_format="pyarrow")


def semdedup(
    emb: ray.data.Dataset,
    threshold: float = 0.95,
    n_centroids: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: Optional[np.ndarray] = None,
    block_rows: int = 8192,
) -> ray.data.Dataset:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup by
    clustering embeddings with k-means, then — within each cluster only —
    dropping every vector whose cosine similarity to an earlier
    *surviving* (lower-id, not itself dropped) vector in the cluster
    reaches ``threshold``; a chain a~b~c keeps only a. Keep-first-by-id,
    the same deterministic winner rule as every dedup family here.

    Scale shape: centroids train once from a bounded sample and
    broadcast; the only shuffle is ONE hash-partition groupby on
    cluster_id, carrying (id, cluster, vector) — vectors must co-locate
    for exact pairwise scoring, but only within-cluster, never
    corpus-wide (the whole point of the cluster-first design: pairwise
    cost drops from O(N²) to Σ|cluster|²). Inside a cluster the scan is
    blockwise-exact: survivors accumulate and each ``block_rows`` block
    scores against (survivors so far + its own upper triangle) in two
    matmuls, so memory stays O(block × survivors) instead of O(n²) for a
    skewed giant cluster.

    Returns (id, cluster_id, keep) for every input row — survivors AND
    audit trail, like ``gopher_filter``."""
    C = (
        centroids
        if centroids is not None
        else build_ivf_centroids(emb, n_centroids=n_centroids, vec_col=vec_col)
    )
    ref = ray.put(C)
    state: dict = {}

    def tag(batch: pa.Table) -> pa.Table:
        if "C" not in state:
            state["C"] = ray.get(ref)
        mat = np.asarray(batch[vec_col].to_pylist(), dtype=np.float64)
        if mat.size == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "cluster_id": pa.array([], pa.int64()),
                    vec_col: pa.array([], pa.list_(pa.float64())),
                }
            )
        unit = _normalize(mat)
        best = np.argmax(unit @ state["C"].T, axis=1).astype(np.int64)
        return pa.table(
            {
                id_col: batch[id_col],
                "cluster_id": pa.array(best, pa.int64()),
                # ship UNIT vectors so per-group scoring is one matmul
                vec_col: pa.array(unit.tolist(), pa.list_(pa.float64())),
            }
        )

    import pandas as pd

    from ..cluster import default_partitions

    def dedup_cluster(g: pd.DataFrame) -> pd.DataFrame:
        if id_col not in g.columns:  # schema-less empty partition
            return pd.DataFrame(
                {
                    id_col: pd.Series(dtype="int64"),
                    "cluster_id": pd.Series(dtype="int64"),
                    "keep": pd.Series(dtype="bool"),
                }
            )
        out = []
        for cid, grp in g.groupby("cluster_id", sort=False):
            grp = grp.sort_values(id_col, kind="mergesort")
            ids = grp[id_col].to_numpy()
            X = np.asarray(list(grp[vec_col]), dtype=np.float64)
            n = len(ids)
            keep = np.ones(n, dtype=bool)
            surv = np.empty((0, X.shape[1]) if X.ndim == 2 else (0, 0))
            for s in range(0, n, block_rows):
                blk = X[s : s + block_rows]
                b = len(blk)
                dup = np.zeros(b, dtype=bool)
                if len(surv):
                    dup |= (blk @ surv.T >= threshold).any(axis=1)
                # within-block: earlier rows of the block that are (so
                # far) keepers; sequential fold over the block triangle
                sims = blk @ blk.T
                for i in range(b):
                    if dup[i]:
                        continue
                    later = sims[i, i + 1 :] >= threshold
                    dup[i + 1 :] |= later
                keep[s : s + b] = ~dup
                if (~dup).any():
                    surv = (
                        blk[~dup]
                        if not len(surv)
                        else np.vstack([surv, blk[~dup]])
                    )
            out.append(
                pd.DataFrame(
                    {
                        id_col: ids,
                        "cluster_id": np.full(n, cid, dtype=np.int64),
                        "keep": keep,
                    }
                )
            )
        return pd.concat(out, ignore_index=True)

    return (
        emb.map_batches(tag, batch_format="pyarrow")
        .groupby("cluster_id", num_partitions=default_partitions())
        .map_groups(dedup_cluster, batch_format="pandas")
    )


# ------------------------------------------------------- product quantization


def train_pq_codebooks(
    emb: ray.data.Dataset,
    m: int = 8,
    nbits: int = 8,
    sample_size: int = 10_000,
    n_iters: int = 10,
    vec_col: str = "embedding",
    seed: int = 17,
) -> np.ndarray:
    """Train product-quantization codebooks (Jégou et al. 2011): the
    vector space splits into ``m`` contiguous subspaces and each gets an
    independent ``2**nbits``-word k-means codebook trained on unit
    vectors. Like ``build_ivf_centroids`` the sample is the
    broadcast-small side (``sample_size`` × dim floats regardless of
    corpus size) and training is a seeded driver-side numpy loop over a
    fixed iteration count — bit-reproducible.

    Returns an array of shape ``(m, ksub, dsub)``; requires dim % m == 0.
    """
    sample = emb.limit(sample_size).to_pandas()
    X = _normalize(np.asarray(list(sample[vec_col]), dtype=np.float64))
    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    ksub = min(2**nbits, len(X))
    rng = np.random.default_rng(seed)
    books = np.empty((m, ksub, dsub), dtype=np.float64)
    for j in range(m):
        Xs = X[:, j * dsub : (j + 1) * dsub]
        # deterministic init: distinct sample rows, seeded permutation
        idx = rng.permutation(len(Xs))[:ksub]
        C = Xs[idx].copy()
        for _ in range(n_iters):
            # L2 assignment via the expanded form (‖x‖² is constant per
            # row for the argmin, so -2x·c + ‖c‖² suffices)
            d = -2.0 * (Xs @ C.T) + (C * C).sum(axis=1)[None, :]
            assign = np.argmin(d, axis=1)
            for c in range(ksub):
                members = Xs[assign == c]
                if len(members):
                    C[c] = members.mean(axis=0)
        books[j] = C
    return books


def pq_encode(
    emb: ray.data.Dataset,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> ray.data.Dataset:
    """Encode each unit vector as ``m`` uint8 code indices (nearest
    codeword per subspace, L2). Output rides (id, m-byte binary code) —
    at 100 TB the code table is dim×4/m smaller than the raw embedding
    column (e.g. 64-dim float32 → 8 bytes: 32×), which is what makes
    re-ranking sweeps and repeated ANN queries over the full corpus
    affordable. One vectorized pass, no shuffle; the codebooks broadcast
    once via ``ray.put``."""
    ref = ray.put(np.ascontiguousarray(codebooks))
    state: dict = {}

    def encode(batch: pa.Table) -> pa.Table:
        if "B" not in state:
            state["B"] = ray.get(ref)
        B = state["B"]
        m, ksub, dsub = B.shape
        mat = np.asarray(batch[vec_col].to_pylist(), dtype=np.float64)
        if mat.size == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "pq_code": pa.array([], pa.binary()),
                }
            )
        X = _normalize(mat)
        codes = np.empty((len(X), m), dtype=np.uint8)
        for j in range(m):
            Xs = X[:, j * dsub : (j + 1) * dsub]
            d = -2.0 * (Xs @ B[j].T) + (B[j] * B[j]).sum(axis=1)[None, :]
            codes[:, j] = np.argmin(d, axis=1).astype(np.uint8)
        return pa.table(
            {
                id_col: batch[id_col],
                "pq_code": pa.array(
                    [c.tobytes() for c in codes], pa.binary()
                ),
            }
        )

    return emb.map_batches(encode, batch_format="pyarrow")


def knn_topk_pq(
    emb: ray.data.Dataset,
    query_ids: list[int],
    query_vectors: list[list[float]],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    nbits: int = 8,
    codebooks: Optional[np.ndarray] = None,
    codes: Optional[ray.data.Dataset] = None,
    exclude_self: bool = True,
) -> ray.data.Dataset:
    """PQ-compressed approximate top-k via asymmetric distance
    computation (ADC): each query precomputes an ``(m, ksub)`` lookup
    table of subspace inner products against the codebooks; scoring a
    row is then ``m`` table gathers summed — no float matmul against the
    corpus, and when ``codes`` (from ``pq_encode``) is supplied the raw
    embedding column is never read at all. This is the scale path when
    even the IVF probe set is too large to score in float: the LUTs
    broadcast once, per-batch partial top-k rows merge in the same tiny
    ``groupby(query_id)`` as the exact path.

    Output: (query_id, vec_id, score_pq, rank) — ``score_pq`` is the
    quantized cosine (approximate; rank by it, verify with the exact
    path on the survivors if needed)."""
    B = (
        codebooks
        if codebooks is not None
        else train_pq_codebooks(emb, m=m, nbits=nbits, vec_col=vec_col)
    )
    m_, ksub, dsub = B.shape
    q_mat = _normalize(np.asarray(query_vectors, dtype=np.float64))
    # ADC lookup tables: luts[q, j, c] = q_sub(j) · codeword(j, c)
    luts = np.stack(
        [
            q_mat[:, j * dsub : (j + 1) * dsub] @ B[j].T
            for j in range(m_)
        ],
        axis=1,
    )
    state_ref = ray.put(
        {"luts": luts, "q_ids": np.asarray(query_ids, dtype=np.int64)}
    )
    if codes is None:
        codes = pq_encode(emb, B, id_col=id_col, vec_col=vec_col)
    state: dict = {}

    def score(batch: pa.Table) -> pa.Table:
        if "st" not in state:
            state["st"] = ray.get(state_ref)
        st = state["st"]
        n = batch.num_rows
        if n == 0:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    id_col: pa.array([], pa.int64()),
                    "score_pq": pa.array([], pa.float64()),
                }
            )
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        raw = b"".join(batch["pq_code"].to_pylist())
        codes_np = np.frombuffer(raw, dtype=np.uint8).reshape(n, m_)
        lt = st["luts"]  # (nq, m, ksub)
        nq = lt.shape[0]
        out_q, out_id, out_s = [], [], []
        kk = min(k, n)
        cols = np.arange(m_)
        for qi in range(nq):
            # gather-sum: score[i] = Σ_j lut[qi, j, codes[i, j]]
            row = lt[qi][cols, codes_np].sum(axis=1)
            kth = np.partition(row, n - kk)[n - kk]
            cand = np.flatnonzero(row >= kth)
            order = np.lexsort((ids[cand], -row[cand]))
            top = cand[order[:kk]]
            out_q.extend([int(st["q_ids"][qi])] * len(top))
            out_id.extend(int(i) for i in ids[top])
            out_s.extend(float(s) for s in row[top])
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                id_col: pa.array(out_id, pa.int64()),
                "score_pq": pa.array(out_s, pa.float64()),
            }
        )

    partials = codes.map_batches(score, batch_format="pyarrow")

    def merge_topk(group: pd.DataFrame) -> pd.DataFrame:
        if exclude_self:
            group = group[group[id_col] != group["query_id"]]
        group = group.sort_values(
            ["score_pq", id_col], ascending=[False, True], kind="mergesort"
        ).head(k)
        group = group.reset_index(drop=True)
        group["rank"] = np.arange(1, len(group) + 1, dtype=np.int64)
        return group

    return partials.groupby(
        "query_id", num_partitions=default_partitions(floor=8)
    ).map_groups(merge_topk, batch_format="pandas")
