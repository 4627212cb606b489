"""Output-maintenance operations: parquet compaction.

A resumable 100 TB run writes many small files (one batch of partitions
per job restart; streaming sinks flush per block). Readers pay for that
forever — per-file open/footer costs dominate a scan of 10^6 tiny files.
``compact_parquet`` is the standard maintenance job: rewrite a directory
into ~``target_mb`` files, planned from parquet FOOTER metadata only (no
data pass on the driver), executed as one streaming read→write with a
``repartition`` sized to the target.

Row-group fidelity note: ``repartition(n)`` is a full exchange of the
data being compacted — unavoidable (compaction IS data movement), but
the op never touches the driver and composes with column projection via
``columns=[...]`` for schema-pruning rewrites.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import ray.data


def compact_parquet(
    input_path: str | Sequence[str],
    output_dir: str,
    target_mb: int = 256,
    columns: Optional[Sequence[str]] = None,
    min_files: int = 1,
) -> dict:
    """Rewrite parquet at ``input_path`` into ≈``target_mb``-sized files
    under ``output_dir``. Returns a summary dict (files/bytes/rows in,
    files planned). Planning reads ONLY footer metadata."""
    import pyarrow.dataset as pads

    dataset = pads.dataset(input_path, format="parquet")
    files = list(dataset.files)
    total_bytes = 0
    total_rows = 0
    for frag in dataset.get_fragments():
        md = frag.metadata  # footer only
        total_rows += md.num_rows
        for i in range(md.num_row_groups):
            total_bytes += md.row_group(i).total_byte_size
    n_out = max(min_files, math.ceil(total_bytes / (target_mb << 20)))

    ds = ray.data.read_parquet(
        input_path, columns=list(columns) if columns else None
    )
    ds.repartition(n_out).write_parquet(output_dir)
    return {
        "files_in": len(files),
        "rows": total_rows,
        "bytes_uncompressed": total_bytes,
        "files_planned": n_out,
    }
