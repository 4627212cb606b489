"""Deterministic text masking — the text analog of drawing solid rectangles.

Reference semantics preserved (src/services/image_masking_service.py:46-146):
  * copy-on-write → here, a new string is built; the input is untouched;
  * no spans → output equals input exactly (``apply_masks`` copies
    unmodified pages, :66-69);
  * overlapping regions union on the canvas → callers pass spans through
    ``merge_spans`` first; ``apply_spans`` validates non-overlap;
  * "solid black rectangle" → a category token (default) or a fixed block
    character run preserving length.

Byte-identical determinism: output is a pure function of (text, spans,
style); no locale, no randomness.
"""

from __future__ import annotations

from typing import Iterable

from .spans import merge_spans, sort_spans

BLOCK_CHAR = "█"  # █

TOKEN_STYLE = "token"    # replace span with "[CATEGORY]"
BLOCK_STYLE = "block"    # replace span with BLOCK_CHAR * span_len (offset-preserving)


def mask_token(category: str) -> str:
    """Canonical mask token for a category: ``[PHONENUMBER]``."""
    return "[" + category.upper() + "]"


def apply_spans(text: str, spans: Iterable[dict], style: str = TOKEN_STYLE) -> str:
    """Apply non-overlapping, sorted spans to ``text``.

    ``spans`` must already be merged (non-overlapping); raises ValueError on
    overlap or out-of-range spans rather than masking the wrong bytes.
    """
    pieces: list[str] = []
    cursor = 0
    for s in sort_spans(spans):
        start, end = s["start"], s["end"]
        if start < cursor:
            raise ValueError(f"overlapping/unsorted span at {start} (cursor {cursor})")
        if end > len(text):
            raise ValueError(f"span [{start},{end}) beyond text length {len(text)}")
        pieces.append(text[cursor:start])
        if style == TOKEN_STYLE:
            pieces.append(mask_token(s["category"]))
        elif style == BLOCK_STYLE:
            pieces.append(BLOCK_CHAR * (end - start))
        else:
            raise ValueError(f"unknown mask style: {style}")
        cursor = end
    pieces.append(text[cursor:])
    return "".join(pieces)


def mask_text(text: str, raw_spans: Iterable[dict], style: str = TOKEN_STYLE) -> tuple[str, list[dict]]:
    """Merge raw (possibly overlapping) spans, then mask.

    Returns ``(masked_text, merged_spans)`` — the pipeline's per-row core.
    """
    merged = merge_spans(raw_spans)
    return apply_spans(text, merged, style=style), merged


def debug_mask(text: str, spans: Iterable[dict]) -> str:
    """Debug rendering keeping the surface form visible:
    ``[CATEGORY:original text]`` (reference debug mode:
    image_masking_service.py:148-195 — semi-transparent colored overlays)."""
    pieces: list[str] = []
    cursor = 0
    for s in sort_spans(merge_spans(spans)):
        pieces.append(text[cursor : s["start"]])
        pieces.append(f"[{s['category'].upper()}:{text[s['start']:s['end']]}]")
        cursor = s["end"]
    pieces.append(text[cursor:])
    return "".join(pieces)
