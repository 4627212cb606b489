"""CCNet-style n-gram language-model perplexity scoring.

The standard webtext quality filter (CCNet, Wenzek et al. 2020; also
Gopher / LLaMA data pipelines) scores every document under a language
model trained on a trusted reference slice and drops the worst tail.
This is the public-algorithm analog with the container's constraints
(no KenLM): an interpolated bigram LM with add-one-smoothed unigram
backoff, trained by a distributed count fold and evaluated in a warm
actor pool.

Scale shape (the trained-model doctrine this repo uses for BPE —
``functions/bpe.py`` — and the NER gazetteer — ``stages/ner.py``):

  1. **distributed count fold** — per-block unigram/bigram Counter
     tables (sample-vocabulary-bounded, never corpus-bounded) stream to
     the driver;
  2. **deterministic driver-side assembly** — vocabulary capped to the
     ``max_vocab`` most frequent words (ties lexicographic), everything
     else collapsed into ``<unk>``; bigram counts re-keyed through the
     same map. All iteration orders sorted → bit-reproducible model;
  3. **broadcast + warm actors** — the model ships once via ``ray.put``
     and unpacks once per actor in ``__init__``; scoring streams the
     corpus with no shuffle.

Scoring is per-document fixed-order math (tokens scored left to right),
so repeated runs are bit-identical; there is no SQL oracle (an
interpolated LM is not SQL-expressible) — determinism, ordering sanity
and OOV behavior are test-pinned instead, like the trained BPE.

Reference analog: the reference has no corpus analytics (its pipeline
ends at masked output, ``src/services/masking_service.py``); this is
part of the beyond-reference curation family the brief requires.
"""

from __future__ import annotations

import math
from collections import Counter
from typing import Optional

import pyarrow as pa

UNK = "<unk>"
BOS = "<s>"


def _tokens(text: str) -> list[str]:
    return (text or "").lower().split()


def ngram_counts(
    ds,
    text_col: str = "text",
    sample_rows: Optional[int] = 50_000,
) -> tuple[Counter, Counter]:
    """Distributed unigram/bigram count fold over a bounded sample.

    Each block emits its local (gram, n) table — bounded by the block's
    vocabulary, not its row count — and the driver sums. Bigrams are
    keyed ``"v w"`` (single space) so the table stays a flat string
    column on the exchange. Every document is prefixed with ``<s>`` so
    first words are conditioned like any other position."""

    def count_block(batch: pa.Table) -> pa.Table:
        uni: Counter = Counter()
        big: Counter = Counter()
        for t in batch[text_col].to_pylist():
            toks = _tokens(t)
            uni.update(toks)
            prev = BOS
            for w in toks:
                big[prev + " " + w] += 1
                prev = w
        grams = list(uni.keys()) + list(big.keys())
        ns = list(uni.values()) + list(big.values())
        kinds = [0] * len(uni) + [1] * len(big)
        return pa.table(
            {
                "gram": pa.array(grams, pa.string()),
                "n": pa.array(ns, pa.int64()),
                "kind": pa.array(kinds, pa.int8()),
            }
        )

    src = ds if sample_rows is None else ds.limit(sample_rows)
    partials = src.map_batches(count_block, batch_format="pyarrow")
    if sample_rows is None:
        # unsampled: the gather would otherwise be vocab×blocks — one
        # slim (gram, kind)-keyed shuffle-reduce folds the partials to
        # vocab-scale first (round-4; the ``top_tokens`` fold pattern)
        from ray.data.aggregate import Sum

        from ..cluster import default_partitions

        partials = partials.groupby(
            ["gram", "kind"], num_partitions=default_partitions()
        ).aggregate(Sum("n", alias_name="n"))
    from ..collect import collect_table

    uni: Counter = Counter()
    big: Counter = Counter()
    tbl = collect_table(partials)
    if "gram" in tbl.column_names:
        for g, kd, n in zip(
            tbl.column("gram").to_pylist(),
            tbl.column("kind").to_pylist(),
            tbl.column("n").to_pylist(),
        ):
            (uni if kd == 0 else big)[g] += n
    return uni, big


def train_lm(
    uni: Counter,
    big: Counter,
    max_vocab: int = 50_000,
    interp_lambda: float = 0.7,
) -> dict:
    """Deterministic model assembly from folded counts.

    The vocabulary keeps the ``max_vocab`` most frequent words (ties
    break lexicographically); all other words — and at score time any
    unseen word — map to ``<unk>``. Bigram counts re-key through the
    same map so probability mass is conserved. The model stores raw
    integer counts; probabilities are computed at score time with
    Jelinek-Mercer interpolation against the add-one unigram:

        p(w | v) = λ · c(v,w)/c(v·)  +  (1−λ) · (c(w)+1)/(N+V)

    (the bigram term drops out when context ``v`` was never seen)."""
    keep = sorted(uni.items(), key=lambda kv: (-kv[1], kv[0]))[:max_vocab]
    vocab = {w for w, _ in keep}

    def m(w: str) -> str:
        return w if w in vocab else UNK

    uni2: Counter = Counter()
    for w, n in uni.items():
        uni2[m(w)] += n
    big2: Counter = Counter()
    ctx_tot: Counter = Counter()
    for k, n in big.items():
        v, w = k.split(" ", 1)
        v = v if v == BOS else m(v)
        key = v + " " + m(w)
        big2[key] += n
        ctx_tot[v] += n
    return {
        "uni": dict(uni2),
        "big": dict(big2),
        "ctx_tot": dict(ctx_tot),
        "n_tokens": sum(uni2.values()),
        "v_size": len(vocab) + 1,  # + <unk>
        "vocab": sorted(vocab),
        "lambda": float(interp_lambda),
    }


def train_lm_from_corpus(
    ds,
    text_col: str = "text",
    sample_rows: Optional[int] = 50_000,
    **train_kwargs,
) -> dict:
    uni, big = ngram_counts(ds, text_col, sample_rows)
    return train_lm(uni, big, **train_kwargs)


class PerplexityScorer:
    """Actor-pool stage: text → (n_tokens, logprob, ppl) under a trained
    bigram LM. The model ships once via ``ray.put`` and the lookup
    dicts build once per actor in ``__init__`` (SURVEY §2.3 ST2 — the
    genuinely-expensive-state case). Scoring walks each document's
    tokens left to right, so the float accumulation order is fixed and
    repeated runs are bit-identical."""

    def __init__(
        self,
        model=None,
        model_ref=None,
        text_col: str = "text",
        id_col: str = "doc_id",
    ):
        if model is None:
            if model_ref is None:
                raise ValueError("PerplexityScorer needs model or model_ref")
            import ray

            model = ray.get(model_ref)
        self.uni = model["uni"]
        self.big = model["big"]
        self.ctx_tot = model["ctx_tot"]
        self.vocab = frozenset(model["vocab"])
        self.denom = model["n_tokens"] + model["v_size"]
        self.lam = model["lambda"]
        self.text_col, self.id_col = text_col, id_col

    def _logp(self, v: str, w: str) -> float:
        p = (1.0 - self.lam) * (self.uni.get(w, 0) + 1) / self.denom
        ct = self.ctx_tot.get(v)
        if ct:
            p += self.lam * self.big.get(v + " " + w, 0) / ct
        return math.log(p)

    def score(self, text: str) -> tuple[int, float, float]:
        toks = _tokens(text)
        if not toks:
            return 0, 0.0, float("nan")
        lp = 0.0
        prev = BOS
        for w in toks:
            if w not in self.vocab:
                w = UNK
            lp += self._logp(prev, w)
            prev = w
        return len(toks), lp, math.exp(-lp / len(toks))

    def __call__(self, batch: pa.Table) -> pa.Table:
        ns, lps, ppls = [], [], []
        for t in batch[self.text_col].to_pylist():
            n, lp, ppl = self.score(t)
            ns.append(n)
            lps.append(lp)
            ppls.append(ppl)
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "n_tokens": pa.array(ns, pa.int64()),
                "logprob": pa.array(lps, pa.float64()),
                "ppl": pa.array(ppls, pa.float64()),
            }
        )


def score_perplexity(
    ds,
    model: dict,
    text_col: str = "text",
    id_col: str = "doc_id",
    concurrency=(1, 8),
):
    """Map the corpus through a :class:`PerplexityScorer` actor pool
    (no shuffle; model broadcast once)."""
    import ray

    return ds.map_batches(
        PerplexityScorer,
        fn_constructor_kwargs=dict(
            model_ref=ray.put(model), text_col=text_col, id_col=id_col
        ),
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
    )
