"""Span relocation stage — the EntityMatcher as a pipeline step.

Use case (the reference's core problem re-expressed): spans were detected
over one text variant (the crawl-provided ``text`` column — cheaper, or
produced by an external detector) but masking must happen in the
canonical ``extracted_text`` coordinate system. The per-row SpanMatcher
(functions/align.py; reference: src/services/entity_matcher.py) re-locates
each span by fuzzy word alignment — robust to whitespace differences,
char-level noise and wrong offsets, with the reference's validation and
first-match-only fallback semantics.

Both sides of the "join" live in the same row (SURVEY §2.4: all reference
joins are within-document) → plain ``map_batches``, no shuffle.
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.align import SpanMatcher
from .detect import SPAN_STRUCT


def _surface_fallback(
    located: list[dict], spans: list[dict], tgt: str, max_occurrences: int = 10
) -> list[dict]:
    """PHI-safe recall net: any detected span whose (surface, category)
    the fuzzy aligner failed to place gets direct case-insensitive
    substring occurrences in the target instead (round-1 documented ~1
    unmasked row per 2,000 noisy pages from alignment misses). Masking
    every occurrence of an identical PII surface can only over-mask —
    never under-mask; if the surface truly isn't in the target, the
    extractor removed it and there is nothing to protect."""
    import re
    from collections import Counter

    have = Counter((s["text"], s["category"]) for s in located)
    seen_need = set()
    out = list(located)
    for s in spans:
        key = (s["text"], s["category"])
        if not s["text"] or have[key] > 0 or key in seen_need:
            continue
        seen_need.add(key)
        # re.finditer keeps match offsets/lengths in ORIGINAL-string
        # coordinates; str.lower() can change length ('İ' → 2 chars) and
        # would shift every later offset, under-masking (ADVICE r2).
        for found, m in enumerate(
            re.finditer(re.escape(s["text"]), tgt, re.IGNORECASE)
        ):
            if found >= max_occurrences:
                break
            out.append(
                {
                    "start": m.start(),
                    "end": m.end(),
                    "category": s["category"],
                    "subcategory": s.get("subcategory", ""),
                    "confidence": s["confidence"],
                    "text": m.group(0),
                }
            )
    return out


def make_relocate_batch(
    source_col: str = "text",
    target_col: str = "extracted_text",
    fuzzy_match_threshold: int = 2,
    confidence_threshold: float = 0.0,
    surface_fallback: bool = True,
):
    """Relocate the ``spans`` column from ``source_col`` coordinates onto
    ``target_col``. Rows whose source is null keep their spans unchanged
    (they were detected on the target directly). ``surface_fallback``
    (default on) catches aligner misses with direct substring masking —
    see ``_surface_fallback``."""

    # built once in the closure, not per batch (build-once doctrine)
    matcher = SpanMatcher(
        fuzzy_match_threshold=fuzzy_match_threshold,
        confidence_threshold=confidence_threshold,
    )

    def relocate(batch: pa.Table) -> pa.Table:
        sources = batch[source_col].to_pylist()
        targets = batch[target_col].to_pylist()
        spans_lists = batch["spans"].to_pylist()
        out_spans = []
        for src, tgt, spans in zip(sources, targets, spans_lists):
            if src is None or not spans:
                out_spans.append(spans or [])
                continue
            located = matcher.match(src.split(), tgt or "", spans)
            if surface_fallback:
                located = _surface_fallback(located, spans, tgt or "")
            out_spans.append(
                [
                    {
                        "start": s["start"],
                        "end": s["end"],
                        "category": s["category"],
                        "subcategory": s.get("subcategory", ""),
                        "confidence": s["confidence"],
                        "text": s["text"],
                    }
                    for s in located
                ]
            )
        idx = batch.column_names.index("spans")
        return batch.set_column(idx, "spans", pa.array(out_spans, pa.list_(SPAN_STRUCT)))

    return relocate
