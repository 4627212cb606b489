"""Job reports & result reads — the analog of the reference's status/read
API (SURVEY §3.3): global aggregates over pipeline output, recent-first
listings, seeded QA sampling, and lineage-table lookups.

Everything here operates on OUTPUT tables (small relative to input) —
aggregates and top-k are the only driver-materialized results.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Optional

import pandas as pd
import ray.data
from ray.data.aggregate import Count, Max, Mean, Sum


def job_report(out_ds: ray.data.Dataset) -> dict:
    """Global run metrics (reference: DeidentificationResult counters +
    job table rollup, src/services/deidentification_service.py:203-222)."""
    totals = out_ds.aggregate(
        Count(alias_name="n_pages"),
        Sum("span_count", alias_name="n_spans"),
        Mean("processing_ms", alias_name="mean_processing_ms"),
    )
    by_status = out_ds.groupby("status").aggregate(Count(alias_name="n")).to_pandas()
    return {
        "n_pages": int(totals["n_pages"]),
        "n_spans": int(totals["n_spans"] or 0),
        "mean_processing_ms": float(totals["mean_processing_ms"] or 0.0),
        "by_status": dict(zip(by_status["status"], by_status["n"].astype(int))),
    }


def recent_pages(out_ds: ray.data.Dataset, k: int = 20) -> pd.DataFrame:
    """Newest-first listing (reference: job list ordered by created_at
    desc + pagination, src/api/main.py:253-254)."""
    return (
        out_ds.select_columns(["url", "warc_ts", "span_count", "status"])
        .sort("warc_ts", descending=True)
        .limit(k)
        .to_pandas()
    )


def sample_for_qa(out_ds: ray.data.Dataset, fraction: float = 0.01, seed: int = 42):
    """Seeded reproducible QA sample (reference: seeded mock sampling,
    src/services/mock_ocr_service.py:45-46 → O3)."""
    return out_ds.random_sample(fraction, seed=seed)


def page_status(out_root: str, url: str) -> Optional[dict]:
    """Point lookup of one url in a written output tree (reference:
    GET /jobs/{id}, src/api/main.py:196-220). Parquet predicate pushdown
    does the filtering at the scan."""
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    pages = os.path.join(out_root, "pages")
    if not os.path.isdir(pages):
        return None
    dataset = pads.dataset(pages)
    tbl = dataset.to_table(filter=pc.field("url") == url)
    if tbl.num_rows == 0:
        return None
    return tbl.to_pylist()[0]


def lineage_report(out_root: str) -> pd.DataFrame:
    """All partition manifests as a table (reference: job table rollup)."""
    rows = []
    for p in sorted(glob.glob(os.path.join(out_root, "_lineage", "*.json"))):
        with open(p) as f:
            rows.append(json.load(f))
    return pd.DataFrame(rows)
