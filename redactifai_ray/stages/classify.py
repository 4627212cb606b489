"""Hashed-feature Naive Bayes text classifier — the classifier-based
quality-filter family member next to the heuristic gates: CCNet trains a
fastText filter against Wikipedia, GPT-3/PaLM train a quality classifier
against a high-quality seed corpus, then score every crawl document. The
reference has no counterpart (it is a de-id service); this is a
training-data-pipeline operator per the build brief.

Distributed shape (the LM/BPE/NER trainer doctrine, `functions/lm.py`):
training is ONE (feature → per-label count) fold — per-batch hashed
bag-of-words partials pre-aggregate before a feature-keyed groupby, so
the shuffle moves ≤ ``n_features`` slim rows per block and the driver
gather is capped at ``n_features`` rows (65k × 3 int64 ≈ 1.5 MB at the
default — independent of corpus size). The trained model is two numpy
arrays that broadcast once via ``ray.put``; scoring is a vectorized
log-likelihood gather per batch. No gradients, no RNG, no iteration —
training and scoring are bit-deterministic and partitioning-invariant.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Sum

from ..functions.hashing import stable_hash64
from .analyze import WORD_RE

_NB_SEED = 401
_WORD = re.compile(WORD_RE)


def _hash_tokens(text: str, n_features: int, memo: dict) -> np.ndarray:
    """Feature ids (hashed tokens) for one document; ``memo`` caches
    token→id across a batch so repeated tokens hash once."""
    ids = []
    for t in _WORD.findall((text or "").lower()):
        h = memo.get(t)
        if h is None:
            h = stable_hash64(t, _NB_SEED) % n_features
            memo[t] = h
        ids.append(h)
    return np.asarray(ids, dtype=np.int64)


def train_nb(
    ds: ray.data.Dataset,
    label_col: str,
    text_col: str = "text",
    n_features: int = 1 << 16,
    alpha: float = 1.0,
) -> dict:
    """Train multinomial Naive Bayes over hashed bag-of-words features.
    ``label_col`` must be 0/1 (int or bool). Returns a plain-dict model:
    ``log_prior`` (2,), ``log_like`` (2, n_features) — Laplace-smoothed
    log P(feature | label) — plus the geometry, ready for ``ray.put``.

    One pass: per-batch (feature, n_neg, n_pos) count partials (already
    folded within the batch) → feature groupby-sum → bounded driver
    gather (≤ n_features rows). Per-label document counts fold through
    the same stream as a sentinel feature −1 row."""

    def partial(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        labels = np.asarray(
            batch[label_col].to_pylist(), dtype=np.int64
        )
        neg = np.zeros(n_features, dtype=np.int64)
        pos = np.zeros(n_features, dtype=np.int64)
        memo: dict = {}
        for t, y in zip(texts, labels):
            ids = _hash_tokens(t, n_features, memo)
            if ids.size:
                np.add.at(pos if y else neg, ids, 1)
        feats = np.flatnonzero(neg | pos)
        n_docs = np.bincount(labels, minlength=2)
        return pa.table(
            {
                "feat": pa.array(
                    np.concatenate([feats, [-1]]), pa.int64()
                ),
                "n_neg": pa.array(
                    np.concatenate([neg[feats], [n_docs[0]]]), pa.int64()
                ),
                "n_pos": pa.array(
                    np.concatenate([pos[feats], [n_docs[1]]]), pa.int64()
                ),
            }
        )

    rows = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("feat")
        .aggregate(
            Sum("n_neg", alias_name="n_neg"),
            Sum("n_pos", alias_name="n_pos"),
        )
        .to_pandas()
    )
    counts = np.zeros((2, n_features), dtype=np.int64)
    n_docs = np.zeros(2, dtype=np.int64)
    feats = rows["feat"].to_numpy(dtype=np.int64)
    doc_row = feats == -1
    if doc_row.any():
        n_docs[0] = int(rows.loc[doc_row, "n_neg"].iloc[0])
        n_docs[1] = int(rows.loc[doc_row, "n_pos"].iloc[0])
    keep = ~doc_row
    counts[0, feats[keep]] = rows.loc[keep, "n_neg"].to_numpy()
    counts[1, feats[keep]] = rows.loc[keep, "n_pos"].to_numpy()
    totals = counts.sum(axis=1)
    log_like = np.log(counts + alpha) - np.log(
        totals[:, None] + alpha * n_features
    )
    total_docs = max(1, int(n_docs.sum()))
    log_prior = np.log(np.maximum(n_docs, 1) / total_docs)
    return {
        "log_prior": log_prior,
        "log_like": log_like,
        "n_features": n_features,
        "n_docs": n_docs,
    }


def nb_score(
    ds: ray.data.Dataset,
    model: dict,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_cols: tuple = (),
) -> ray.data.Dataset:
    """Score every document with a trained NB model: ``log_odds`` =
    log P(pos|doc) − log P(neg|doc), ``pred`` = 1 iff log_odds > 0.
    The model broadcasts once; scoring is a per-batch gather-sum over
    the hashed token ids — no shuffle, no state beyond the broadcast.
    ``keep_cols`` ride through from the input batch (e.g. a label for
    in-pipeline evaluation — no driver-side join needed)."""
    ref = ray.put(
        {
            "lp": model["log_prior"],
            "ll": model["log_like"],
            "nf": model["n_features"],
        }
    )
    state: dict = {}

    def score(batch: pa.Table) -> pa.Table:
        if "m" not in state:
            state["m"] = ray.get(ref)
        m = state["m"]
        diff = m["ll"][1] - m["ll"][0]  # (n_features,)
        base = float(m["lp"][1] - m["lp"][0])
        memo: dict = {}
        odds = np.empty(batch.num_rows, dtype=np.float64)
        for i, t in enumerate(batch[text_col].to_pylist()):
            ids = _hash_tokens(t, m["nf"], memo)
            odds[i] = base + (diff[ids].sum() if ids.size else 0.0)
        cols = {
            id_col: batch[id_col],
            "log_odds": pa.array(odds, pa.float64()),
            "pred": pa.array((odds > 0).astype(np.int64), pa.int64()),
        }
        for c in keep_cols:
            cols[c] = batch[c]
        return pa.table(cols)

    return ds.map_batches(score, batch_format="pyarrow")
