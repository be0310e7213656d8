"""Small runtime helpers shared across stages."""

from __future__ import annotations

_OBJ_CACHE: dict[str, object] = {}  # insertion-ordered → LRU eviction
_OBJ_CACHE_MAX = 4


def cached_get(ref):
    """ray.get memoized per worker process — for broadcast objects whose
    deserialization is NOT zero-copy (dicts, pickled maps). Numpy/Arrow
    plasma objects don't need this (their ray.get is already zero-copy).

    Bounded LRU (last ``_OBJ_CACHE_MAX`` refs): each pipeline invocation
    broadcasts under a fresh ObjectRef, so an unbounded memo would pin
    every past run's buffers in every worker for the session's lifetime."""
    import ray

    key = ref.hex()
    if key in _OBJ_CACHE:
        _OBJ_CACHE[key] = _OBJ_CACHE.pop(key)  # re-insert = mark recent
    else:
        while len(_OBJ_CACHE) >= _OBJ_CACHE_MAX:
            _OBJ_CACHE.pop(next(iter(_OBJ_CACHE)))
        _OBJ_CACHE[key] = ray.get(ref)
    return _OBJ_CACHE[key]


def default_shuffle_partitions() -> int:
    """Cluster-scaled shuffle partition count: ~4 per CPU, floor 16.

    Ray's sort shuffle creates (map partitions × reduce partitions)
    intermediate objects; a fixed bucket count either starves a big
    cluster (too few reducers) or drowns a small one in tiny objects
    (round-3 2M campaign: 512×512 ≈ 262k ~3.5 KB objects capped pair-gen
    at ~30 MB/s regardless of CPUs — BASELINE.md). Scaling with the
    cluster, not the input block count, is the right shape at 100 TB:
    a 4N-node cluster automatically runs 4N-sized bucket counts."""
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(4 * cpus, 16)


def resolve_num_buckets(num_buckets: int) -> int:
    """``num_buckets <= 0`` means "auto" → `default_shuffle_partitions`.
    Stages whose routing-only shuffles default to 0 resolve here, so one
    helper governs bucket counts across the engine (explicit positive
    values always win — semantic bucketing like canopy's local-greedy
    partitions keeps its fixed counts)."""
    return num_buckets if num_buckets > 0 else default_shuffle_partitions()


def round_half_away(x, decimals: int = 0):
    """SQL-compatible decimal rounding: ties round AWAY from zero.

    numpy/pandas/python round ties to even (banker's); DuckDB's ROUND —
    like std::round and most SQL engines — rounds ties away from zero.
    The two disagree exactly when ``x * 10**decimals`` lands on a
    representable half-integer, which decimal-valued inputs hit readily
    (measured at sf0.1: flesch 33.48125 → np 33.4812 vs DuckDB 33.4813).
    Every oracle-compared output column rounds through this helper so
    the engine's rounding is bit-identical to the SQL oracle's whenever
    the pre-rounding doubles agree. Mirrors DuckDB's evaluation shape
    ``round(y)/10**d`` exactly (tie test on the scaled double, one
    final division). Accepts scalars, numpy arrays, or pandas Series;
    returns a float64 scalar/ndarray."""
    import numpy as np

    scale = np.float64(10.0 ** decimals)
    y = np.asarray(x, dtype=np.float64) * scale
    a = np.abs(y)
    f = np.floor(a)
    r = np.where(a - f >= 0.5, f + 1.0, f)
    out = np.copysign(r, y) / scale
    return float(out) if out.ndim == 0 else out


def broadcast_byte_budget() -> int:
    """Byte budget for a ray.put broadcast side: 25% of the node's plasma
    store when known, else a 4 GB fallback. A fraction of the store — not
    an absolute floor above it — so a broadcast can never pin >50% of a
    small store and thrash the shuffle against it (measured: a 2.6 GB
    broadcast in a 5 GB store crawled; BASELINE.md round 4)."""
    try:
        import ray

        store = float(ray.cluster_resources().get("object_store_memory", 0))
    except Exception:
        store = 0.0
    return int(store * 0.25) if store else 4_000_000_000


