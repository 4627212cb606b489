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
