"""Merge + mask batch stage, and the spans-table explode projection.

Per-row core: confidence filter (reference: entity_matcher.py:99-105) →
interval-union merge (functions.spans.merge_spans) → deterministic
substitution (functions.mask.apply_spans). Stateless → plain tasks.

``explode_spans`` is the audit sink analog of the reference's per-entity DB
rows (src/tasks.py:147-187): one output row per span, with the surface
``text`` column OMITTED by default — the ``include_text=False`` privacy
default of the reference's entities endpoint (src/api/main.py:344-407).
"""

from __future__ import annotations

import time

import pyarrow as pa

from ..functions.mask import TOKEN_STYLE, apply_spans
from ..functions.spans import clamp_spans, filter_confidence, merge_spans

MERGED_STRUCT = pa.struct(
    [
        ("start", pa.int32()),
        ("end", pa.int32()),
        ("category", pa.string()),
        ("confidence", pa.float32()),
    ]
)


def make_mask_batch(
    confidence_threshold: float = 0.0,
    style: str = TOKEN_STYLE,
    text_col: str = "extracted_text",
):
    """Build the merge+mask batch fn (Arrow in/out)."""

    def mask_batch(batch: pa.Table) -> pa.Table:
        t0 = time.perf_counter()
        texts = batch[text_col].to_pylist()
        spans_lists = batch["spans"].to_pylist()
        statuses = (
            batch["status"].to_pylist()
            if "status" in batch.column_names
            else ["ok"] * len(texts)
        )
        masked: list[str | None] = []
        merged_col: list[list[dict]] = []
        counts: list[int] = []
        for text, spans, status in zip(texts, spans_lists, statuses):
            if status != "ok":
                # failed rows emit NO text at all — never unmasked content
                # (deviation from reference fallback, SURVEY §7.5.4)
                masked.append(None)
                merged_col.append([])
                counts.append(0)
                continue
            text = text or ""
            kept = filter_confidence(spans or [], confidence_threshold)
            merged = merge_spans(clamp_spans(kept, len(text)))
            masked.append(apply_spans(text, merged, style=style))
            merged_col.append(
                [
                    {
                        "start": m["start"],
                        "end": m["end"],
                        "category": m["category"],
                        "confidence": m["confidence"],
                    }
                    for m in merged
                ]
            )
            counts.append(len(merged))
        elapsed_ms = (time.perf_counter() - t0) * 1000.0 / max(1, len(texts))
        out = batch.append_column("masked_text", pa.array(masked, pa.string()))
        out = out.append_column(
            "merged_spans", pa.array(merged_col, pa.list_(MERGED_STRUCT))
        )
        out = out.append_column("span_count", pa.array(counts, pa.int32()))
        out = out.append_column(
            "processing_ms",
            pa.array([elapsed_ms] * len(texts), pa.float64()),
        )
        return out

    return mask_batch


def make_explode_spans(key_col: str = "url", include_text: bool = False):
    """Spans audit projection: one row per detected span."""

    def explode(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_pylist()
        spans_lists = batch["spans"].to_pylist()
        out: dict[str, list] = {
            key_col: [],
            "start": [],
            "end": [],
            "category": [],
            "subcategory": [],
            "confidence": [],
        }
        if include_text:
            out["text"] = []
        for key, spans in zip(keys, spans_lists):
            for s in spans or []:
                out[key_col].append(key)
                out["start"].append(s["start"])
                out["end"].append(s["end"])
                out["category"].append(s["category"])
                out["subcategory"].append(s["subcategory"])
                out["confidence"].append(s["confidence"])
                if include_text:
                    out["text"].append(s["text"])
        schema = {
            key_col: pa.string(),
            "start": pa.int32(),
            "end": pa.int32(),
            "category": pa.string(),
            "subcategory": pa.string(),
            "confidence": pa.float32(),
        }
        if include_text:
            schema["text"] = pa.string()
        return pa.table({c: pa.array(v, schema[c]) for c, v in out.items()})

    return explode
