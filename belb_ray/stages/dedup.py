"""Exact deduplication by content hash.

The scale-critical pre-collapse (SURVEY §7.4): vendored files — the same
``content`` across thousands of repos — are the hot keys of this domain.
Collapsing exact duplicates to one representative BEFORE blocking/pair
generation turns the worst skewed block into a single row, exactly as the
reference dedups the KB before its homonym queries
(belb/kbs/kb.py:251-263 — SURVEY §2.6 A8).

Representative choice is ``min(row_id)`` — a total order, so every
partitioning reproduces the same representative (SURVEY §4 determinism).
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..functions.hashing import sha256_hex_list, stable_id64_list


def ensure_identity_columns(ds: rd.Dataset, id_cols=("repo", "path", "commit"),
                            content_col: str = "content") -> rd.Dataset:
    """Add ``row_id`` (stable blake2b-8 of the key fields) and
    ``content_sha256`` (the north-rule per-row invariant) if absent."""
    schema_names = ds.schema().names

    def _add(batch: pa.Table) -> pa.Table:
        if "row_id" not in batch.column_names:
            ids = stable_id64_list(*[batch[c].to_pylist() for c in id_cols])
            batch = batch.append_column("row_id", pa.array(ids, pa.int64()))
        if "content_sha256" not in batch.column_names:
            sha = sha256_hex_list(batch[content_col].to_pylist())
            batch = batch.append_column("content_sha256", pa.array(sha, pa.string()))
        return batch

    if "row_id" in schema_names and "content_sha256" in schema_names:
        return ds
    return ds.map_batches(_add, batch_format="pyarrow")


def exact_dedup_reps(ds: rd.Dataset, hash_col: str = "content_sha256",
                     id_col: str = "row_id") -> rd.Dataset:
    """(hash_col, rep_id): rep_id = min(id_col) per hash group. A NATIVE
    ``Min`` aggregate (pre-aggregating, vectorized) — no per-group Python.
    Only (hash, id) rows cross the shuffle; project wide columns first."""
    from ray.data.aggregate import Min

    return (ds.select_columns([hash_col, id_col])
            .groupby(hash_col)
            .aggregate(Min(id_col, alias_name="rep_id")))


def sha_int64(sha_hex_col: list[str]) -> list[int]:
    """First 8 bytes of the sha as a non-negative int64 (cheap join key)."""
    return [int(s[:16], 16) & 0x7FFFFFFFFFFFFFFF for s in sha_hex_col]


def fingerprint_dedup_key(texts: list[str]) -> list[int]:
    """Whitespace-insensitive exact-dup key: sha256 of collapsed text."""
    out = []
    for t in texts:
        collapsed = " ".join(t.split())
        out.append(int(hashlib.sha256(collapsed.encode()).hexdigest()[:16], 16) & 0x7FFFFFFFFFFFFFFF)
    return out
