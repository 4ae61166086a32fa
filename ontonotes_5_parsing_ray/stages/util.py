"""Stage sizing helpers."""

from __future__ import annotations


def pool_size(requested: int, reserve: int = 1, floor: int = 1) -> int:
    """Clamp an actor-pool ``concurrency`` to the cluster's CPU budget.

    A fixed pool that reserves every CPU starves the read/write tasks and
    the pipeline deadlocks (observed at ``ray.init(num_cpus=2)`` with a
    concurrency-4 pool). Always leave ``reserve`` CPUs for task operators.
    """
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 0)) if ray.is_initialized() else 0
    except Exception:
        cpus = 0
    if cpus <= 0:
        return max(floor, requested)
    return max(floor, min(requested, cpus - reserve))
