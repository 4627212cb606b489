"""JSONL (NDJSON) source/sink for the pages and documents tables.

The Dolma / Common-Crawl-tooling interchange shape: one JSON object per
line, many ``.jsonl`` shards per directory. The reference exchanged raw
bytes through a storage-backend KV (src/storage/base.py:5-46); this is
the text-corpus analog — a second ingest format next to Parquet and the
warcish archive reader, sharing the exact same downstream schemas so
every pipeline stage runs unchanged.

Scale notes: ``ray.data.read_json`` fans one read task per file (shard
your corpus, as Dolma does); JSON carries no binary type, so the pages
``html`` column rides as base64 — decode is a vectorized per-batch map.
Parquet remains the preferred at-rest format (typed, compressed,
column-prunable); JSONL is for interchange with external tooling.
"""

from __future__ import annotations

import base64
from typing import Sequence

import pyarrow as pa
import ray.data

from .pages import PAGES_COLUMNS


def write_pages_jsonl(ds: ray.data.Dataset, out_dir: str) -> None:
    """Write a pages Dataset as JSONL shards (one file per block).

    ``html`` (binary) → base64 string; ``warc_ts`` → int64 epoch
    microseconds (exact — ISO strings lose round-trip fidelity to
    strftime/strptime fractional-second quirks). Deterministic per row,
    so a Parquet→JSONL→Parquet roundtrip is value-identical."""

    def encode(batch: pa.Table) -> pa.Table:
        html = [
            None if b is None else base64.b64encode(b).decode("ascii")
            for b in batch["html"].to_pylist()
        ]
        ts = batch["warc_ts"].cast(pa.int64())
        batch = batch.set_column(
            batch.schema.get_field_index("html"),
            "html",
            pa.array(html, pa.string()),
        )
        return batch.set_column(
            batch.schema.get_field_index("warc_ts"), "warc_ts", ts
        )

    ds.map_batches(encode, batch_format="pyarrow").write_json(out_dir)


def read_pages_jsonl(
    paths: str | Sequence[str], **kwargs
) -> ray.data.Dataset:
    """Read JSONL shards written by :func:`write_pages_jsonl` (or external
    tooling emitting the same keys) back into the canonical pages schema:
    base64 ``html`` → binary, epoch-µs int → ``timestamp[us]``."""

    def decode(batch: pa.Table) -> pa.Table:
        html = [
            None if s is None else base64.b64decode(s)
            for s in batch["html"].to_pylist()
        ]
        ts = batch["warc_ts"].cast(pa.int64()).cast(pa.timestamp("us"))
        cols = {
            "url": batch["url"],
            "warc_ts": ts,
            "html": pa.array(html, pa.binary()),
            "text": batch["text"].cast(pa.string()),
            "lang": batch["lang"],
        }
        return pa.table(cols)

    return ray.data.read_json(paths, **kwargs).map_batches(
        decode, batch_format="pyarrow"
    )


def write_documents_jsonl(ds: ray.data.Dataset, out_dir: str) -> None:
    """Write a documents-shaped Dataset (plain scalar columns) as JSONL."""
    ds.write_json(out_dir)


def read_documents_jsonl(
    paths: str | Sequence[str], columns: Sequence[str] | None = None, **kwargs
) -> ray.data.Dataset:
    """Read JSONL document shards. JSON files cannot column-prune at the
    read (the format is row-major text) — ``columns`` projects immediately
    after parse so downstream blocks stay slim; prefer Parquet at rest."""
    ds = ray.data.read_json(paths, **kwargs)
    if columns is not None:
        ds = ds.select_columns(list(columns))
    return ds


__all__ = [
    "PAGES_COLUMNS",
    "read_pages_jsonl",
    "write_pages_jsonl",
    "read_documents_jsonl",
    "write_documents_jsonl",
]
