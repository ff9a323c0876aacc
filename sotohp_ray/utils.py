"""Small shared runtime helpers."""

from __future__ import annotations


def agg_select(t, mapping: dict[str, str]):
    """Rename + reorder a ``pa.Table.group_by().aggregate()`` output BY
    NAME: ``mapping`` is {pyarrow_output_name: new_name} covering every
    wanted column. The key-vs-aggregate column ORDER of pyarrow's
    aggregate output has differed across versions, so a positional
    ``rename_columns`` can silently swap keys with sums on an upgrade;
    selecting by name fails loudly (KeyError) instead."""
    import pyarrow as pa

    return pa.table({new: t[old] for old, new in mapping.items()})


def actor_pool_size(max_frac: float = 1.0, cap: int = 64) -> tuple[int, int]:
    """Autoscaling ``concurrency=(min, max)`` for an actor-pool
    ``map_batches`` stage, derived from the cluster's CPU count instead
    of a hardcoded constant (a fixed pool of 2 starves the stage at 32
    CPUs and worse on a cluster; a fixed pool of 32 deadlocks a small
    test session when two pools chain). min=1 lets Ray's streaming
    executor grow the pool only while the stage is the bottleneck.
    """
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    except Exception:
        cpus = 4
    hi = max(2, min(cap, int(cpus * max_frac)))
    return (1, hi)
