"""Deterministic hashing kernels.

Design notes
------------
- Row identity / content identity is cryptographic (sha256 over content),
  mirroring the reference's md5 content hexdigest used as annotation
  identity (reference: belb/preprocessing/data.py:200-243,
  belb/utils/__init__.py:206-224). The north rule's per-row invariant is
  ``sha256(content)`` equality, so that column is computed once at ingest
  and carried (not the raw content) through shuffles.
- Shingle / band hashing is NON-cryptographic and fully vectorized:
  polynomial rolling hashes over uint64 with wraparound (deterministic,
  process-independent — unlike Python's ``hash()``).
- Stable 64-bit row ids come from blake2b(digest_size=8): order-independent,
  unlike the reference's arrival-order uid counters
  (belb/kbs/ncbi_gene/ncbi_gene.py:233-250 — SURVEY §2.4 T3), which cannot
  survive distributed execution.
"""

from __future__ import annotations

import hashlib

import numpy as np

# Odd multipliers for multiply-add hashing mod 2**64 (wraparound is the mod).
_POLY_P = np.uint64(0x9E3779B97F4A7C15)  # golden-ratio odd constant
_COMB_P = np.uint64(0xC2B2AE3D27D4EB4F)  # xxhash64 prime_2


def sha256_hex_list(values: list[str | None]) -> list[str | None]:
    """sha256 hexdigest per string. Cryptographic hashing has no vectorized
    kernel; a tight loop over the batch is the fastest available path and
    runs inside map_batches workers, not on the driver."""
    out: list[str | None] = []
    sha = hashlib.sha256
    for v in values:
        out.append(None if v is None else sha(v.encode("utf-8")).hexdigest())
    return out


# pd.util.hash_array requires an EXACTLY-16-byte key
_ROWID_HASH_KEY = "belb_ray_rowid16"


def stable_id64_list(*columns: list) -> np.ndarray:
    """Order-dependent int64 row id over the key fields. Replaces the
    reference's driver-side uid counter (SURVEY §2.4 T2/T3) with a
    hash-stable id usable on any partition.

    Vectorized as per-COLUMN keyed siphash (``pd.util.hash_array``,
    deterministic across processes/platforms — the actual requirement)
    mixed with an FNV-style fold; no per-row Python, no string
    concatenation, no separator-ambiguity. Measured 1.6x vs both the
    round-2 per-row blake2b loop and a join-then-hash form at 500k rows
    (BASELINE.md "Ingest kernels", VERDICT r2 What's-wrong #1).
    Stability contract: ids change if ``_ROWID_HASH_KEY`` or the mixing
    changes — regenerate fixtures/goldens then."""
    import pandas as pd

    h = None
    for col in columns:
        hc = pd.util.hash_array(np.asarray(col, dtype=object),
                                hash_key=_ROWID_HASH_KEY,
                                categorize=False)
        h = hc if h is None else (h * np.uint64(0x100000001B3)) ^ hc
    return (h & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)


def token_hashes(tokens: list[str], cache: dict | None = None) -> np.ndarray:
    """uint64 hash per token (blake2b-8, cached across calls when a dict is
    supplied — actor-held cache amortizes hashing of a skewed vocabulary)."""
    if cache is None:
        cache = {}
    out = np.empty(len(tokens), dtype=np.uint64)
    b2 = hashlib.blake2b
    for i, t in enumerate(tokens):
        v = cache.get(t)
        if v is None:
            v = int.from_bytes(b2(t.encode("utf-8"), digest_size=8).digest(), "big")
            cache[t] = v
        out[i] = v
    return out


def ngram_hashes(base: np.ndarray, n: int) -> np.ndarray:
    """Rolling n-gram hashes over a sequence of uint64 element hashes
    (tokens or bytes): windows dotted with powers of _POLY_P, wrap mod 2**64.
    Fully vectorized; deterministic across processes."""
    base = np.ascontiguousarray(base, dtype=np.uint64)
    if len(base) == 0:
        return np.zeros(0, dtype=np.uint64)
    if len(base) < n:
        n = len(base)
    powers = np.empty(n, dtype=np.uint64)
    p = 1
    for j in range(n - 1, -1, -1):
        powers[j] = p
        p = (p * int(_POLY_P)) & 0xFFFFFFFFFFFFFFFF
    windows = np.lib.stride_tricks.sliding_window_view(base, n)
    return (windows * powers).sum(axis=1, dtype=np.uint64)


def char_shingle_hashes(text: str, k: int) -> np.ndarray:
    """Character k-shingle hashes of a string (utf-8 bytes, rolling)."""
    b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
    return ngram_hashes(b, k)


def combine64(a: np.ndarray, b: np.ndarray | int) -> np.ndarray:
    """Mix two uint64 arrays/scalars into one (multiply-xor, wrap mod 2**64)."""
    a = np.asarray(a, dtype=np.uint64)
    b = np.asarray(b, dtype=np.uint64)
    return (a * _COMB_P) ^ (b + _POLY_P * (a >> np.uint64(32)))


def as_int64(u: np.ndarray) -> np.ndarray:
    """Reinterpret uint64 hashes as non-negative int64 (Arrow-friendly key)."""
    return (u & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)
