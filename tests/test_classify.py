"""Naive Bayes quality classifier: distributed training ≡ serial
reference, partitioning invariance, separable-corpus learning."""

import numpy as np
import pytest


def _toy_rows():
    good = [
        "the quick brown fox jumps over the lazy dog and keeps running",
        "clean well written prose with varied vocabulary and structure",
        "numbers and words mix nicely in ordinary sentences like this",
    ]
    bad = [
        "zzbad zzbad zzbad spam spam zzbad click here zzbad",
        "zzbad spam zzbad zzbad buy now zzbad zzbad",
        "spam zzbad spam zzbad zzbad zzbad free free zzbad",
    ]
    rows = []
    for i in range(30):
        rows.append(
            {"doc_id": i, "text": good[i % 3] + f" extra{i}", "y": 1}
        )
    for i in range(30, 50):
        rows.append(
            {"doc_id": i, "text": bad[i % 3] + f" extra{i}", "y": 0}
        )
    return rows


class TestNaiveBayes:
    def test_learns_separable_corpus(self, ray_session):
        import ray.data

        from redactifai_ray.stages.classify import nb_score, train_nb

        rows = _toy_rows()
        ds = ray.data.from_items(rows)
        model = train_nb(ds, label_col="y", n_features=1 << 12)
        out = (
            nb_score(ds, model)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        truth = np.array([r["y"] for r in rows])
        assert (out["pred"].to_numpy() == truth).all()

    def test_distributed_matches_serial_reference(self, ray_session):
        import ray.data

        from redactifai_ray.stages.classify import (
            _hash_tokens,
            train_nb,
        )

        rows = _toy_rows()
        nf = 1 << 10
        model = train_nb(
            ray.data.from_items(rows), label_col="y", n_features=nf
        )
        # serial numpy reference: same hashing, same smoothing
        counts = np.zeros((2, nf), dtype=np.int64)
        n_docs = np.zeros(2, dtype=np.int64)
        for r in rows:
            ids = _hash_tokens(r["text"], nf, {})
            np.add.at(counts[r["y"]], ids, 1)
            n_docs[r["y"]] += 1
        totals = counts.sum(axis=1)
        ll = np.log(counts + 1.0) - np.log(totals[:, None] + nf)
        lp = np.log(n_docs / n_docs.sum())
        assert (model["n_docs"] == n_docs).all()
        assert np.array_equal(model["log_like"], ll)
        assert np.array_equal(model["log_prior"], lp)

    def test_partitioning_invariant(self, ray_session):
        import ray.data

        from redactifai_ray.stages.classify import train_nb

        rows = _toy_rows()
        a = train_nb(
            ray.data.from_items(rows), label_col="y", n_features=256
        )
        b = train_nb(
            ray.data.from_items(rows).repartition(7),
            label_col="y",
            n_features=256,
        )
        assert np.array_equal(a["log_like"], b["log_like"])
        assert np.array_equal(a["log_prior"], b["log_prior"])

    def test_empty_and_null_text(self, ray_session):
        import ray.data

        from redactifai_ray.stages.classify import nb_score, train_nb

        rows = [
            {"doc_id": 0, "text": "alpha beta", "y": 1},
            {"doc_id": 1, "text": None, "y": 0},
            {"doc_id": 2, "text": "", "y": 0},
        ]
        ds = ray.data.from_items(rows)
        model = train_nb(ds, label_col="y", n_features=64)
        out = nb_score(ds, model).to_pandas()
        assert len(out) == 3  # null/empty docs score on the prior alone
        assert set(out.columns) == {"doc_id", "log_odds", "pred"}
