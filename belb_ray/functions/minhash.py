"""MinHash / LSH band / SimHash sketch kernels.

These are the blocking signatures of the ER engine (SURVEY §7.1 "block").
The reference's only grouping-for-identity device is SQL homonym grouping
(belb/kbs/query.py:97-194); at 10^12-file scale that becomes MinHash-LSH
banding: docs whose estimated Jaccard exceeds ~(1/bands)^(1/rows_per_band)
share at least one band key with high probability.

State (the permutation parameters) is built once per actor — the analog of
the reference's load-once lookup dicts (SURVEY §2.4 T6) — and the math is
fully vectorized numpy over uint64 with wraparound (deterministic,
process-independent).
"""

from __future__ import annotations

import numpy as np

from .hashing import as_int64, combine64, ngram_hashes

_M64 = np.uint64(0xFFFFFFFFFFFFFFFF)


class MinHasher:
    """num_perm multiply-add hash functions mod 2**64 (odd multipliers).

    ``signature(hashes)`` -> (num_perm,) uint64 columnwise min.
    ``signatures_many(list_of_hash_arrays)`` batches the loop.
    """

    def __init__(self, num_perm: int = 128, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.num_perm = num_perm
        # odd multipliers => bijections mod 2**64
        self.a = (rng.integers(0, 1 << 63, num_perm, dtype=np.uint64) << np.uint64(1)) | np.uint64(1)
        self.b = rng.integers(0, 1 << 63, num_perm, dtype=np.uint64)

    def signature(self, hashes: np.ndarray) -> np.ndarray:
        if hashes.size == 0:
            return np.full(self.num_perm, _M64, dtype=np.uint64)
        h = np.unique(hashes.astype(np.uint64, copy=False))
        # (P, n) = a[:,None]*h + b[:,None], wrap mod 2**64; chunk n to bound memory
        out = np.full(self.num_perm, _M64, dtype=np.uint64)
        for lo in range(0, h.size, 8192):
            hh = h[lo : lo + 8192]
            m = self.a[:, None] * hh[None, :] + self.b[:, None]
            np.minimum(out, m.min(axis=1), out=out)
        return out

    def signatures_many(self, hash_arrays: list[np.ndarray]) -> np.ndarray:
        """(n_docs, num_perm) uint64."""
        out = np.empty((len(hash_arrays), self.num_perm), dtype=np.uint64)
        for i, h in enumerate(hash_arrays):
            out[i] = self.signature(h)
        return out


def band_keys(signatures: np.ndarray, bands: int, salt: int = 0) -> np.ndarray:
    """(n_docs, num_perm) signatures -> (n_docs, bands) int64 band keys.

    Each band's rows are polynomial-hashed together, then mixed with the
    band index (and an optional partition salt, e.g. a lang hash) so keys
    from different bands / partitions never collide in the groupby."""
    n, p = signatures.shape
    assert p % bands == 0, "num_perm must be divisible by bands"
    r = p // bands
    grouped = signatures.reshape(n, bands, r)
    keys = np.zeros((n, bands), dtype=np.uint64)
    for j in range(r):
        keys = combine64(keys, grouped[:, :, j])
    band_ids = np.arange(1, bands + 1, dtype=np.uint64)[None, :]
    keys = combine64(keys, band_ids * np.uint64(salt * 2 + 1))
    return as_int64(keys)


def sig_matrix(col, num_perm: int | None = None) -> np.ndarray:
    """(n, P) uint64 signature matrix from an Arrow fixed-size-binary (or
    plain binary) column — ZERO-COPY for fixed-size binary (flat buffer
    view); ``to_pylist`` on wide binary columns measured ~10s per 100k
    rows, this is microseconds."""
    import pyarrow as pa

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.zeros((0, num_perm or 0), dtype=np.uint64)
    if pa.types.is_fixed_size_binary(col.type):
        w = col.type.byte_width
        buf = col.buffers()[1]
        flat = np.frombuffer(buf, dtype=np.uint64)
        start = col.offset * (w // 8)
        return flat[start:start + n * (w // 8)].reshape(n, w // 8)
    return np.frombuffer(b"".join(col.to_pylist()), dtype=np.uint64).reshape(n, -1)


def sig_array(mat: np.ndarray) -> "object":
    """(n, P) uint64 matrix → Arrow fixed_size_binary(8P) array, one
    buffer copy total (no per-row tobytes)."""
    import pyarrow as pa

    n, p = mat.shape
    return pa.Array.from_buffers(
        pa.binary(8 * p), n,
        [None, pa.py_buffer(np.ascontiguousarray(mat).tobytes())])


def est_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> np.ndarray:
    """Estimated Jaccard between row-aligned signature matrices
    (m, P) x (m, P) -> (m,) fraction of agreeing permutations."""
    return (sig_a == sig_b).mean(axis=1)


def simhash64(hashes: np.ndarray, weights: np.ndarray | None = None) -> np.uint64:
    """64-bit SimHash of a multiset of feature hashes: per-bit weighted
    majority vote. Near-duplicate docs differ in few bits (Hamming)."""
    if hashes.size == 0:
        return np.uint64(0)
    bits = (hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)
    w = np.ones(len(hashes)) if weights is None else weights
    votes = (bits.astype(np.float64) * 2.0 - 1.0).T @ w
    return np.uint64(((votes > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum(dtype=np.uint64))


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized Hamming distance between uint64 arrays."""
    x = np.bitwise_xor(a.astype(np.uint64), b.astype(np.uint64))
    # SWAR popcount
    m1, m2, m4 = np.uint64(0x5555555555555555), np.uint64(0x3333333333333333), np.uint64(0x0F0F0F0F0F0F0F0F)
    x = x - ((x >> np.uint64(1)) & m1)
    x = (x & m2) + ((x >> np.uint64(2)) & m2)
    x = (x + (x >> np.uint64(4))) & m4
    return ((x * np.uint64(0x0101010101010101)) >> np.uint64(56)).astype(np.int64)


def token_ngram_hashes(token_hash_seq: np.ndarray, n: int) -> np.ndarray:
    """Token n-gram (shingle) hashes from a per-token hash sequence."""
    return ngram_hashes(token_hash_seq, n)
