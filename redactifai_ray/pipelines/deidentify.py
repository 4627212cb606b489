"""The flagship pipeline: pages → extract → dedup → detect → merge+mask.

One driver-side builder replaces the reference's whole service
constellation (API + Redis queue + Celery workers + Postgres job table +
S3 buckets — SURVEY §3.1): the streaming executor schedules the stages
with backpressure, the object store carries blocks between them, outputs
are Parquet.

Stage layout (and why):
  * extract    — stateless ``map_batches`` tasks over zero-copy Arrow;
                 small ``batch_size`` because ``html`` blobs are fat;
                 drops ``html`` immediately so downstream blocks are slim;
  * dedup(url) — the one wide shuffle; runs AFTER extraction so the
                 exchange moves slim text rows, not raw html (extraction
                 is deterministic per byte, so duplicates extract
                 identically and the choice of kept row only affects
                 ``warc_ts``); keeps the newest crawl per url;
  * size bucket— ``n_chars``-derived bucket column; huge pages already
                 chunk inside the detector (20k-char windows, W1), the
                 bucket key additionally lets callers
                 ``repartition``/group so giant rows don't ride in the
                 same blocks as thousands of small ones (skew lever,
                 SURVEY §4);
  * detect     — actor-pool stage (warm compiled patterns, ST2 analog);
  * merge+mask — stateless tasks (pure span algebra + substitution).
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..policy import MaskingLevel
from ..sources.pages import read_pages
from ..stages.detect import SpanDetector
from ..stages.extract import make_extract_batch
from ..stages.mask import make_explode_spans, make_mask_batch

# size-bucket boundaries over n_chars (SURVEY §7.4: skew mitigation key)
SIZE_BUCKET_BOUNDS = (2_000, 20_000, 100_000)


def add_size_bucket(batch: pa.Table) -> pa.Table:
    n = batch["n_chars"]
    bucket = pc.add(
        pc.add(
            pc.cast(pc.greater(n, SIZE_BUCKET_BOUNDS[0]), pa.int32()),
            pc.cast(pc.greater(n, SIZE_BUCKET_BOUNDS[1]), pa.int32()),
        ),
        pc.cast(pc.greater(n, SIZE_BUCKET_BOUNDS[2]), pa.int32()),
    )
    return batch.append_column("size_bucket", bucket)


def dedup_latest(
    ds: ray.data.Dataset, key: str = "url", order_col: str = "warc_ts"
) -> ray.data.Dataset:
    """Exact key dedup keeping the newest row per key (hash shuffle on
    ``key``; reference analog: repeated crawl URLs, SURVEY §2.5/§2.7).

    Deterministic: within a group rows sort by (order_col desc, then all
    remaining columns via stable sort on order only — fixture duplicates
    share identical payloads, and at scale ties on (url, warc_ts) are
    crawl-identical rows by construction)."""

    def keep_newest(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            group, sort_keys=[(order_col, "descending"), (key, "ascending")]
        )
        return group.take(idx[:1])

    return ds.groupby(key).map_groups(keep_newest, batch_format="pyarrow")


def build_deidentify_pipeline(
    input_path: Union[str, Sequence[str], ray.data.Dataset],
    *,
    masking_level: MaskingLevel | str = MaskingLevel.SAFE_HARBOR,
    custom_categories: Optional[Sequence[str]] = None,
    confidence_threshold: float = 0.0,
    mask_style: str = "token",
    dedup: bool = True,
    size_bucket_shuffle: bool = False,
    emit_blocks: bool = False,
    extract_batch_size: int = 64,
    detect_batch_size: int = 256,
    detect_concurrency=(2, 8),
    extra_patterns: Optional[dict] = None,
) -> ray.data.Dataset:
    """Build (lazily) the flagship Dataset. Consume with write_parquet /
    iter_batches; nothing materializes here."""
    if isinstance(input_path, ray.data.Dataset):
        ds = input_path
    else:
        ds = read_pages(input_path)

    ds = ds.map_batches(
        make_extract_batch(emit_blocks=emit_blocks),
        batch_format="pyarrow",
        batch_size=extract_batch_size,
    )
    if dedup:
        ds = dedup_latest(ds)
    ds = ds.map_batches(add_size_bucket, batch_format="pyarrow")
    if size_bucket_shuffle:
        # co-locate similar-size rows so giant pages don't straggle inside
        # mixed blocks; at cluster scale use this before the actor stage.
        ds = ds.repartition(200, shuffle=True)
    ds = ds.map_batches(
        SpanDetector,
        fn_constructor_kwargs={
            "masking_level": masking_level,
            "custom_categories": custom_categories,
            "extra_patterns": extra_patterns,
        },
        batch_format="pyarrow",
        batch_size=detect_batch_size,
        concurrency=detect_concurrency,
        num_cpus=1,
    )
    ds = ds.map_batches(
        make_mask_batch(confidence_threshold=confidence_threshold, style=mask_style),
        batch_format="pyarrow",
    )
    return ds


def spans_table(out_ds: ray.data.Dataset, include_text: bool = False) -> ray.data.Dataset:
    """Exploded per-span audit table (reference: per-entity DB rows,
    src/tasks.py:147-187; ``include_text`` privacy default False,
    src/api/main.py:344-407)."""
    return out_ds.select_columns(["url", "spans"]).map_batches(
        make_explode_spans(include_text=include_text), batch_format="pyarrow"
    )


OUTPUT_COLUMNS = [
    "url", "warc_ts", "lang", "extracted_text", "masked_text", "span_count",
    "size_bucket", "status", "error", "processing_ms", "extractor_version",
]


def finalize_output(out_ds: ray.data.Dataset) -> ray.data.Dataset:
    """Project the flagship output row schema (FIXTURES.md §4)."""
    return out_ds.select_columns(OUTPUT_COLUMNS)
