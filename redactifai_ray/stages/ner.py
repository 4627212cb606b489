"""Trained NER-style name detector: corpus-learned gazetteer + char-ngram
scorer behind the Detector registry (VERDICT r2 #4).

The reference ships multiple cloud NER providers behind one ABC
(src/services/azure_phi_detection_service.py:76-137,
src/services/aws_comprehend_medical_service.py:79-123,
src/services/service_factory.py:17-92); the local analog is a detector
whose state is genuinely expensive to build — the case the actor path
(``detector_mode="actors"``, SURVEY §2.3 ST2) exists for. Following the
trained-BPE precedent (functions/bpe.py):

  1. **distributed token-stats fold** — per-block counters of how often
     each token appears capitalized mid-sentence vs lowercase
     (vocabulary-bounded tables, never corpus-bounded);
  2. **deterministic driver-side training** — a gazetteer of tokens that
     are essentially always capitalized mid-sentence (proper nouns) plus
     a Laplace-smoothed char-trigram log-odds model (name-like vs
     background vocabulary) that generalizes to unseen names;
  3. **broadcast + warm actors** — the model ships once via ``ray.put``
     and unpacks once per actor in ``__init__``.

Detection reuses SpanDetector's scanning/chunking/policy machinery and
replaces the capitalized-bigram *heuristic* accept-all with a per-token
model test: a candidate bigram is a name only if every token is
gazetteer-listed or scores name-like under the trigram model — killing
the sentence-initial capitalized-bigram false positives the heuristic
accepts.
"""

from __future__ import annotations

import math
import re as _stdre
from collections import Counter
from typing import Optional

import pyarrow as pa

from ..functions.spans import make_span
from .detect import (
    NAME_CONFIDENCE,
    PROVIDER_TITLES,
    SKIP_PHRASES,
    SpanDetector,
)

_TOKEN_RE = _stdre.compile(r"[A-Za-z][a-z]+")
_CAP_RE = _stdre.compile(r"[A-Z][a-z]+")


def _embedded(t: str, s: int, e: int) -> bool:
    """True when t[s:e] sits inside a composite token (email local-part,
    URL path segment, snake/kebab identifier). Webtext is full of
    ``first.last@example.com`` / ``site/word/word`` — casing there is
    orthographic convention, not natural-language evidence, so such
    occurrences must not count toward the capitalization statistics
    (else every name's email local-part registers as a "lowercase use"
    and vetoes it from the gazetteer)."""
    if s >= 2 and t[s - 1] in "@/._-" and t[s - 2].isalnum():
        return True
    if e < len(t) and t[e] in "@_":
        return True
    if e + 1 < len(t) and t[e] in "./-" and t[e + 1].isalnum():
        return True
    return False


def collect_token_stats(
    ds, text_col: str = "text", sample_rows: Optional[int] = 50_000
) -> dict[str, tuple[int, int, int]]:
    """Distributed fold: token → (n_cap_mid, n_cap_any, n_lower).

    ``n_cap_mid`` counts capitalized occurrences NOT at a sentence start
    (the signal for proper nouns); ``n_lower`` counts lowercase
    occurrences (the signal against). Per-block tables are
    vocabulary-bounded Counters — the same shape as
    ``bpe.word_frequencies``."""

    def count_block(batch: pa.Table) -> pa.Table:
        cap_mid: Counter = Counter()
        cap_any: Counter = Counter()
        lower: Counter = Counter()
        for t in batch[text_col].to_pylist():
            t = t or ""
            for m in _TOKEN_RE.finditer(t):
                tok = m.group()
                if _embedded(t, m.start(), m.end()):
                    continue
                if tok[0].isupper():
                    key = tok.lower()
                    cap_any[key] += 1
                    # sentence-start if preceded (ignoring spaces/quotes)
                    # by nothing or terminal punctuation
                    j = m.start() - 1
                    while j >= 0 and t[j] in " \t\"'“”‘’([":
                        j -= 1
                    if j >= 0 and t[j] not in ".!?\n":
                        cap_mid[key] += 1
                else:
                    lower[tok] += 1
        keys = sorted(set(cap_any) | set(lower))
        return pa.table(
            {
                "tok": pa.array(keys, pa.string()),
                "cap_mid": pa.array([cap_mid[k] for k in keys], pa.int64()),
                "cap_any": pa.array([cap_any[k] for k in keys], pa.int64()),
                "lower": pa.array([lower[k] for k in keys], pa.int64()),
            }
        )

    src = ds if sample_rows is None else ds.limit(sample_rows)
    partials = src.map_batches(count_block, batch_format="pyarrow")
    if sample_rows is None:
        # unsampled: shuffle-reduce the vocab×blocks partials to
        # vocab-scale before the driver gather (round-4)
        from ray.data.aggregate import Sum

        from ..cluster import default_partitions

        partials = partials.groupby(
            "tok", num_partitions=default_partitions()
        ).aggregate(
            Sum("cap_mid", alias_name="cap_mid"),
            Sum("cap_any", alias_name="cap_any"),
            Sum("lower", alias_name="lower"),
        )
    from ..collect import collect_table

    total: dict[str, list[int]] = {}
    tbl = collect_table(partials)
    if "tok" in tbl.column_names:
        for tok, cm, ca, lo in zip(
            tbl.column("tok").to_pylist(),
            tbl.column("cap_mid").to_pylist(),
            tbl.column("cap_any").to_pylist(),
            tbl.column("lower").to_pylist(),
        ):
            e = total.setdefault(tok, [0, 0, 0])
            e[0] += cm
            e[1] += ca
            e[2] += lo
    return {k: tuple(v) for k, v in total.items()}


def _trigrams(word: str) -> list[str]:
    w = f"^{word}$"
    return [w[i : i + 3] for i in range(len(w) - 2)]


def train_ner_model(
    token_stats: dict[str, tuple[int, int, int]],
    min_cap_mid: int = 1,
    min_cap_pure: int = 2,
    cap_ratio: float = 0.9,
    n_background: int = 500,
    score_threshold: float = 0.5,
) -> dict:
    """Deterministic model build from folded token stats.

    Gazetteer: tokens whose capitalized share of all occurrences is ≥
    ``cap_ratio`` (proper nouns are essentially never lowercase) AND
    either seen capitalized mid-sentence ≥ ``min_cap_mid`` times, or —
    for rare names only ever seen at sentence starts — seen ≥
    ``min_cap_pure`` times with zero lowercase occurrences anywhere
    (composite-token occurrences like email local-parts are already
    excluded by the fold, so "never lowercase in prose" is real
    evidence). Missing a rare name under-masks — the PHI-unsafe
    direction — so both rules err inclusive; the ``cap_ratio`` veto is
    what keeps ordinary vocabulary out. Char-trigram log-odds:
    P(trigram | gazetteer) vs P(trigram | top background words),
    Laplace-smoothed — scores unseen tokens by mean log-odds. All
    iteration orders are sorted → bit-reproducible."""
    gaz = sorted(
        tok
        for tok, (cap_mid, cap_any, low) in token_stats.items()
        if cap_any / (cap_any + low) >= cap_ratio
        and (cap_mid >= min_cap_mid or (low == 0 and cap_any >= min_cap_pure))
    )
    background = [
        tok
        for tok, _ in sorted(
            ((t, s[2]) for t, s in token_stats.items() if s[2] > 0),
            key=lambda kv: (-kv[1], kv[0]),
        )[:n_background]
    ]
    name_c: Counter = Counter()
    bg_c: Counter = Counter()
    for w in gaz:
        name_c.update(_trigrams(w))
    for w in background:
        bg_c.update(_trigrams(w))
    vocab = sorted(set(name_c) | set(bg_c))
    n_tot = sum(name_c.values()) + len(vocab)
    b_tot = sum(bg_c.values()) + len(vocab)
    logodds = {
        g: math.log((name_c[g] + 1) / n_tot) - math.log((bg_c[g] + 1) / b_tot)
        for g in vocab
    }
    default = math.log(1 / n_tot) - math.log(1 / b_tot)
    return {
        "gazetteer": gaz,
        "logodds": logodds,
        "default_logodds": default,
        "score_threshold": score_threshold,
    }


def train_ner_from_corpus(
    ds, text_col: str = "text", sample_rows: Optional[int] = 50_000, **train_kwargs
) -> dict:
    return train_ner_model(
        collect_token_stats(ds, text_col, sample_rows), **train_kwargs
    )


def train_ner_from_files(
    files, text_col: str = "text", sample_rows: Optional[int] = 50_000, **train_kwargs
) -> dict:
    """Train from parquet files with a pruned single-column read — the
    CLI path (run.py --detector trained-ner). The scan is bounded by
    ``sample_rows``; nulls count as empty text."""
    import ray.data

    ds = ray.data.read_parquet(files, columns=[text_col])
    return train_ner_from_corpus(ds, text_col, sample_rows, **train_kwargs)


class TrainedNerDetector(SpanDetector):
    """Registry-selectable trained detector ("trained-ner").

    State per actor: the compiled regex table (inherited) PLUS the
    unpacked gazetteer set and trigram log-odds dict — heavy enough that
    the actor pool, not a per-task rebuild, is the right home. Pass the
    model by object-store ref (``model_ref=ray.put(model)``) so it ships
    once per node, not once per task."""

    def __init__(self, model=None, model_ref=None, **kwargs):
        kwargs.setdefault("detect_names", True)
        super().__init__(**kwargs)
        if model is None:
            if model_ref is None:
                raise ValueError("TrainedNerDetector needs model or model_ref")
            import ray

            model = ray.get(model_ref)
        self.gazetteer = frozenset(model["gazetteer"])
        self.logodds = dict(model["logodds"])
        self.default_logodds = float(model["default_logodds"])
        self.score_threshold = float(model["score_threshold"])

    def _name_like(self, token: str) -> bool:
        low = token.lower()
        if low in self.gazetteer:
            return True
        tris = _trigrams(low)
        if not tris:
            return False
        s = sum(self.logodds.get(g, self.default_logodds) for g in tris) / len(tris)
        return s >= self.score_threshold

    def _detect_names(self, text: str) -> list[dict]:
        from ..policy import should_mask

        names: list[dict] = []
        for m in self.name_re.finditer(text):
            # The greedy capitalized n-gram may mix names with ordinary
            # capitalized words ("Contact Maria Lopez"); keep each
            # maximal run of >=2 consecutive model-approved tokens, so
            # leading/trailing non-name words trim off instead of
            # vetoing the whole candidate.
            toks = [
                (t.start(), t.end(), self._name_like(t.group()))
                for t in _CAP_RE.finditer(m.group())
            ]
            run: list[tuple[int, int]] = []
            runs: list[list[tuple[int, int]]] = []
            for s, e, ok in toks:
                if ok:
                    run.append((s, e))
                elif run:
                    runs.append(run)
                    run = []
            if run:
                runs.append(run)
            for r in runs:
                if len(r) < 2:
                    continue
                start = m.start() + r[0][0]
                end = m.start() + r[-1][1]
                surface = text[start:end]
                if any(skip in surface for skip in SKIP_PHRASES):
                    continue
                context = text[max(0, start - 10) : start]
                is_provider = any(t in context for t in PROVIDER_TITLES)
                category = "HealthcareProfessional" if is_provider else "Person"
                if should_mask(category, self.masking_level, self.custom_categories):
                    names.append(
                        make_span(
                            start, end, category, NAME_CONFIDENCE,
                            surface, subcategory="PersonName",
                        )
                    )
        return names
