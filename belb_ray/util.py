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


