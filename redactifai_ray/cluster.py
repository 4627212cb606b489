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


def quiet_ray_data_logging_env() -> dict:
    """Return (and export on the driver) the env that pins Ray Data's two
    cosmetic schema-dedup loggers to ERROR in EVERY process.

    Why env and not setLevel()/a worker_process_setup_hook: each worker
    re-runs ``logging.config.dictConfig`` the moment it imports
    ``ray.data``, which resets any level set earlier — including by a
    setup hook that ran before the import (measured: level 40 → 0 across
    the import). ``RAY_DATA_LOGGING_CONFIG`` names the dictConfig payload
    itself, so the pins in the packaged ``ray_data_logging.yaml`` are
    what that reset resets TO. See the yaml header for what the two
    warnings are and why they are cosmetic.

    Usage from a session-owning entry point, BEFORE ``ray.init``::

        env = quiet_ray_data_logging_env()
        ray.init(..., runtime_env={"env_vars": env})

    The function also sets ``os.environ`` so the driver process (and, in
    local mode, the raylet-forked workers) inherit it even without the
    runtime_env. On a real multi-node cluster the yaml path must exist on
    every node (it ships inside the package, so a normal install does).
    """
    import os

    path = os.path.join(os.path.dirname(__file__), "ray_data_logging.yaml")
    env = {"RAY_DATA_LOGGING_CONFIG": path}
    os.environ.setdefault("RAY_DATA_LOGGING_CONFIG", path)
    return env
