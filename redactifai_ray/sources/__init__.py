"""Dataset sources/sinks: pruned Parquet readers for the engine's tables."""

import pyarrow as pa


def strip_schema_metadata(t: pa.Table) -> pa.Table:
    """Drop parquet key-value schema metadata (zero-copy).

    pandas-written parquet carries a ``pandas`` metadata blob; a
    ``pyarrow.Schema`` WITH metadata is unhashable ("unhashable type:
    'dict'"), so every downstream reduce task's schema-dedup
    ``set(schemas)`` fails and logs "Failed to hash the schemas"
    (round-4 VERDICT #3 — the bench-log spam). Append as a
    ``map_batches(..., batch_format="pyarrow")`` right after
    ``read_parquet``; it fuses into the read task.
    """
    if t.schema.metadata is None:
        return t
    return t.replace_schema_metadata(None)
