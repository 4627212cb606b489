"""Dataset sources/sinks: pruned Parquet readers for the engine's tables."""
