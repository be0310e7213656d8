"""Small runtime helpers shared across stages."""

from __future__ import annotations

_OBJ_CACHE: dict[str, object] = {}


def cached_get(ref):
    """ray.get memoized per worker process — for broadcast objects whose
    deserialization is NOT zero-copy (dicts, pickled maps). Numpy/Arrow
    plasma objects don't need this (their ray.get is already zero-copy)."""
    import ray

    key = ref.hex()
    if key not in _OBJ_CACHE:
        _OBJ_CACHE[key] = ray.get(ref)
    return _OBJ_CACHE[key]


def auto_concurrency(min_actors: int = 2, max_actors: int | None = None) -> tuple:
    """(min, max) actor-pool size scaled to the cluster's CPU count —
    compute-heavy actor stages must grow with the cluster or they cap
    scaling (a fixed pool of 8 actors makes 32 CPUs run like 8)."""
    import ray

    n_cpus = int(ray.cluster_resources().get("CPU", 8)) \
        if ray.is_initialized() else 8
    hi = max(min_actors, n_cpus if max_actors is None else min(n_cpus, max_actors))
    return (min_actors, hi)
