"""Span algebra over half-open character intervals ``[start, end)``.

Semantics preserved from the reference:
  * overlap predicate — half-open interval overlap
    (reference: ``PHIEntity.overlaps_with``, src/models/domain.py:165-167).
  * interval-union merge — the text analog of merging matched word boxes
    into one mask region per entity/page
    (reference: ``EntityMatcher._merge_bounding_boxes``,
    src/services/entity_matcher.py:397-442) combined with the masker's
    tolerance of overlapping regions
    (src/services/image_masking_service.py — overlapping rectangles simply
    union on the canvas; in text land overlapping spans must coalesce).
  * confidence filtering — drop spans **below** threshold
    (reference: src/services/entity_matcher.py:99-105).
  * chunk offset re-basing — detection over >limit texts runs per chunk and
    re-bases offsets by the chunk start
    (reference: AWS 20k-char chunk loop,
    src/services/aws_comprehend_medical_service.py:125-162).

A span is a plain dict: ``{start, end, category, subcategory, confidence,
text}`` — kept as dicts (not dataclasses) so they convert to/from Arrow
``list<struct>`` columns without an object layer.
"""

from __future__ import annotations

from typing import Iterable, Optional


def make_span(
    start: int,
    end: int,
    category: str,
    confidence: float = 1.0,
    text: str = "",
    subcategory: str = "",
) -> dict:
    if start < 0 or end < start:
        raise ValueError(f"invalid span [{start}, {end})")
    return {
        "start": int(start),
        "end": int(end),
        "category": category,
        "subcategory": subcategory,
        "confidence": float(confidence),
        "text": text,
    }


def spans_overlap(a: dict, b: dict) -> bool:
    """Half-open interval overlap (reference: domain.py:165-167)."""
    return a["start"] < b["end"] and b["start"] < a["end"]


def sort_spans(spans: Iterable[dict]) -> list[dict]:
    """Canonical deterministic order: (start, end, category).

    The reference sorts detector output by offset only
    (mock_phi_detection_service.py:84); (end, category) tie-breaks make the
    order total, which the byte-identical invariant needs.
    """
    return sorted(spans, key=lambda s: (s["start"], s["end"], s["category"]))


def filter_confidence(spans: Iterable[dict], threshold: float) -> list[dict]:
    """Keep spans with confidence >= threshold (reference: entity_matcher.py:99-105)."""
    return [s for s in spans if s["confidence"] >= threshold]


def merge_spans(spans: Iterable[dict]) -> list[dict]:
    """Interval-union merge of overlapping spans.

    Returns non-overlapping spans sorted by start. Each merged span takes:
      * ``category``/``subcategory`` of the highest-confidence constituent
        (ties: earliest start, then lexicographic category — deterministic);
      * ``confidence`` = max over constituents;
      * ``text`` = "" (no longer a contiguous surface form).

    Touching spans (a.end == b.start) do NOT merge — half-open intervals do
    not overlap there, matching the reference overlap predicate.
    """
    ordered = sort_spans(spans)
    merged: list[dict] = []
    for s in ordered:
        if merged and s["start"] < merged[-1]["end"]:  # overlap with current run
            cur = merged[-1]
            cur["end"] = max(cur["end"], s["end"])
            # winner: (-confidence, start, category) minimal
            cur_key = (-cur["confidence"], cur["_wstart"], cur["category"])
            new_key = (-s["confidence"], s["start"], s["category"])
            if new_key < cur_key:
                cur["category"] = s["category"]
                cur["subcategory"] = s["subcategory"]
                cur["_wstart"] = s["start"]
            cur["confidence"] = max(cur["confidence"], s["confidence"])
        else:
            merged.append(
                {
                    "start": s["start"],
                    "end": s["end"],
                    "category": s["category"],
                    "subcategory": s["subcategory"],
                    "confidence": s["confidence"],
                    "_wstart": s["start"],
                }
            )
    for m in merged:
        del m["_wstart"]
        m["text"] = ""
    return merged


def rebase_spans(spans: Iterable[dict], delta: int) -> list[dict]:
    """Shift span offsets by ``delta`` (chunked detection re-base; reference:
    aws_comprehend_medical_service.py:154,194-195)."""
    out = []
    for s in spans:
        s2 = dict(s)
        s2["start"] = s["start"] + delta
        s2["end"] = s["end"] + delta
        out.append(s2)
    return out


def chunk_text(text: str, chunk_size: int, overlap: int = 0) -> list[tuple[int, str]]:
    """Split ``text`` into ``(base_offset, chunk)`` pieces of ``chunk_size``.

    ``overlap > 0`` makes consecutive chunks share a seam window so entities
    straddling a hard cut are still seen whole by per-chunk detection (the
    reference hard-cuts at 20k and can split entities —
    aws_comprehend_medical_service.py:144-147; we fix that, see SURVEY §7.5.2).
    Steps advance by ``chunk_size - overlap``.
    """
    if chunk_size <= 0:
        raise ValueError("chunk_size must be positive")
    if overlap < 0 or overlap >= chunk_size:
        raise ValueError("overlap must be in [0, chunk_size)")
    if len(text) <= chunk_size:
        return [(0, text)]
    step = chunk_size - overlap
    chunks = []
    pos = 0
    while pos < len(text):
        chunks.append((pos, text[pos : pos + chunk_size]))
        if pos + chunk_size >= len(text):
            break
        pos += step
    return chunks


def dedupe_spans(spans: Iterable[dict]) -> list[dict]:
    """Drop exact-duplicate ``(start, end, category)`` spans, keeping the
    highest-confidence instance. Needed after overlap-windowed chunk
    detection where seam spans are seen by two chunks."""
    best: dict[tuple, dict] = {}
    for s in spans:
        k = (s["start"], s["end"], s["category"])
        if k not in best or s["confidence"] > best[k]["confidence"]:
            best[k] = s
    return sort_spans(best.values())


def clamp_spans(spans: Iterable[dict], text_len: int) -> list[dict]:
    """Clamp spans to ``[0, text_len)``; drop empties. (Analog of bbox
    clamping, reference: entity_matcher.py:428-431.)"""
    out = []
    for s in spans:
        start = max(0, min(s["start"], text_len))
        end = max(0, min(s["end"], text_len))
        if end > start:
            s2 = dict(s)
            s2["start"], s2["end"] = start, end
            out.append(s2)
    return out
