"""Cluster-derived sizing defaults (single source for all stages)."""

from __future__ import annotations


def cluster_cpus(default: int = 8) -> int:
    import ray

    if ray.is_initialized():
        return int(ray.cluster_resources().get("CPU", default))
    return default


def default_partitions(mult: int = 2, floor: int = 16) -> int:
    """Shuffle output partitions scaled to the cluster (2×CPUs locally; on
    a multi-node cluster this lands in the thousands — callers override
    when they know the key cardinality)."""
    return max(floor, mult * cluster_cpus())


def default_pool(min_actors: int = 1) -> tuple[int, int]:
    """Autoscaling actor-pool bounds for a CPU-dominant stage."""
    return (min_actors, max(4, cluster_cpus()))


def configure_data_context(
    target_max_block_size_mb: int = 128,
    preserve_order: bool = False,
    progress_bars: bool = False,
) -> None:
    """Opt-in DataContext tuning for this engine's workloads (call from
    entry points that own the Ray session — never from library code):
    raise block size for wide binary rows (html blobs) so blocks aren't
    split absurdly small, drop ordering guarantees the pipeline doesn't
    need, and quiet progress output."""
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.target_max_block_size = target_max_block_size_mb * 1024 * 1024
    ctx.execution_options.preserve_order = preserve_order
    ctx.enable_progress_bars = progress_bars


def quiet_ray_data_worker_logs() -> None:
    """Worker-process setup hook: pin Ray Data's cosmetic schema-dedup
    warnings to ERROR inside every worker.

    `transform_pyarrow.unify_schemas` tries `set(schemas)` as a fast path
    and WARNs ("Failed to hash the schemas (for deduplication)") whenever
    a schema carries key-value metadata — pyarrow Schemas with metadata
    are unhashable. Pandas-written parquet carries a `pandas` blob, and
    Ray's own pandas→arrow block conversion at sort/aggregate boundaries
    re-attaches one, so reduce WORKERS emit this spam no matter what UDFs
    strip (driver-side logger pinning cannot reach worker processes).
    Pass this as `runtime_env={"worker_process_setup_hook": ...}` from
    entry points that own the Ray session. CAVEAT: a module-level
    function is pickled BY REFERENCE, and the setup hook loads in
    workers before the job's cwd is on sys.path — so this exact function
    only works when `redactifai_ray` is installed as a package on the
    workers. Scripts run from a checkout should ship a nested copy of
    the body instead (bench.py does; see its `_quiet_worker_logs`).
    """
    import logging

    for _name in (
        "ray.data._internal.execution.streaming_executor_state",
        "ray.data._internal.arrow_ops.transform_pyarrow",
    ):
        logging.getLogger(_name).setLevel(logging.ERROR)
