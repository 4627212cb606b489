"""Readers for the engine's input tables.

Replaces the reference's storage-backend abstraction
(src/storage/{base,local,s3,factory}.py — a bytes KV store with separate
PHI-in / clean-out buckets) with Arrow-filesystem Parquet paths: any
``local path`` or ``s3://…`` URI works unchanged through
``ray.data.read_parquet``. The PHI-in vs clean-out separation survives as
distinct ``input_path`` / ``output_path`` pipeline arguments.

Readers prune at the read: only requested columns leave storage (a read
that loads all columns for a 2-column transform is wrong at 100 TB).
"""

from __future__ import annotations

from typing import Optional, Sequence

import ray.data

PAGES_COLUMNS = ["url", "warc_ts", "html", "text", "lang"]


def read_pages(
    path: str | Sequence[str],
    columns: Optional[Sequence[str]] = None,
    include_text: bool = False,
    **kwargs,
) -> ray.data.Dataset:
    """Read a pages table. By default the crawl-provided ``text`` column is
    pruned (the extractor derives its own canonical text); pass
    ``include_text=True`` for the span-alignment path."""
    if columns is None:
        columns = [c for c in PAGES_COLUMNS if include_text or c != "text"]
    return ray.data.read_parquet(path, columns=list(columns), **kwargs)


def read_pages_from_html_files(
    dir_path: str, lang: str = "unknown", **kwargs
) -> ray.data.Dataset:
    """Raw-blob variant (SURVEY §2.1 S1): a directory of raw .html files →
    the pages schema via ``read_binary_files`` + a per-batch projection.
    ``url`` is derived from the file path; ``warc_ts`` from file mtime is
    deliberately NOT used (non-deterministic across copies) — epoch 0."""
    import datetime

    import pyarrow as pa

    ds = ray.data.read_binary_files(dir_path, include_paths=True, **kwargs)

    def to_pages(batch: pa.Table) -> pa.Table:
        paths = batch["path"].to_pylist()
        return pa.table(
            {
                "url": pa.array([f"file://{p}" for p in paths], pa.string()),
                "warc_ts": pa.array(
                    [datetime.datetime(1970, 1, 1)] * len(paths), pa.timestamp("us")
                ),
                "html": batch["bytes"],
                "text": pa.array([None] * len(paths), pa.string()),
                "lang": pa.array([lang] * len(paths), pa.string()),
            }
        )

    return ds.map_batches(to_pages, batch_format="pyarrow")


def read_documents(
    sf_dir: str, columns: Optional[Sequence[str]] = None, **kwargs
) -> ray.data.Dataset:
    """Read the generic ``documents`` table (doc_id, text, lang, source,
    n_chars) used by the training-data operators."""
    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=list(columns) if columns else None, **kwargs
    )


def read_embeddings(sf_dir: str, **kwargs) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", **kwargs)
