"""Candidate-pair generation from blocking keys.

Strategy (vectorized, skew-aware — SURVEY §7.4 "pair explosion"):

1. ONE shuffle: ``groupby(bucket)`` where ``bucket = hash(block_key) % B``
   co-locates whole blocks (a block never splits across buckets). B is
   small (hundreds), so per-group Python dispatch is negligible; inside a
   bucket, pair enumeration is numpy group-boundary math — groups of the
   same size share one ``triu_indices`` template, so the loop is over
   distinct sizes (≤ max_block of them), not over groups.
2. Oversized keys (> max_block) — rare once exact duplicates are
   pre-collapsed (stages/dedup.py) — get the sorted-window fallback:
   members sorted by row_id, pairs only within ``window`` positions
   (per-key cap in the FP-Hadoop/Scarlett spirit, PAPERS.md). This bounds
   the worst key at n·window pairs instead of n².
3. Cross-band duplicate pairs (the same pair found by several LSH bands)
   are deduped batch-locally (free) then globally by a narrow
   ``groupby(id_a, id_b)`` — worth one extra shuffle because every
   surviving pair costs a feature-join + scoring downstream.

Output schema: (id_a, id_b) with id_a < id_b — a total order, so
downstream thresholds behave identically under any partitioning.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd
from ..util import resolve_num_buckets

_EMPTY = pa.table({"id_a": pa.array([], pa.int64()),
                   "id_b": pa.array([], pa.int64())})


def pairs_from_blocks(keys: np.ndarray, ids: np.ndarray,
                      max_block: int, window: int) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized pair enumeration over (block_key, row_id) rows.

    Returns (id_a, id_b) with id_a < id_b. Duplicate (key, id) rows are
    collapsed first; within each key, ids are ascending, so triu order
    gives the total-order pair orientation for free."""
    if len(keys) == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    order = np.lexsort((ids, keys))
    keys, ids = keys[order], ids[order]
    # drop duplicate (key, id) rows
    first = np.r_[True, (keys[1:] != keys[:-1]) | (ids[1:] != ids[:-1])]
    keys, ids = keys[first], ids[first]

    starts = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]])
    sizes = np.diff(np.r_[starts, len(keys)])

    out_a: list[np.ndarray] = []
    out_b: list[np.ndarray] = []

    # small groups: one triu template per distinct size
    small = (sizes >= 2) & (sizes <= max_block)
    for s in np.unique(sizes[small]):
        g_starts = starts[small & (sizes == s)]
        iu_a, iu_b = np.triu_indices(s, k=1)
        ia = (g_starts[:, None] + iu_a[None, :]).ravel()
        ib = (g_starts[:, None] + iu_b[None, :]).ravel()
        out_a.append(ids[ia])
        out_b.append(ids[ib])

    # hot keys: sorted-window cap
    for g_start, s in zip(starts[sizes > max_block], sizes[sizes > max_block]):
        offs = np.arange(1, window + 1)
        ia = np.repeat(np.arange(s), window)
        ib = ia + np.tile(offs, s)
        keep = ib < s
        out_a.append(ids[g_start + ia[keep]])
        out_b.append(ids[g_start + ib[keep]])

    if not out_a:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    return np.concatenate(out_a), np.concatenate(out_b)


def _default_shuffle_partitions() -> int:
    """Partition count for the pair-generation shuffles — now the
    engine-wide helper (`util.default_shuffle_partitions`); kept as an
    alias so round-3 callers/docs keep working."""
    from ..util import default_shuffle_partitions, resolve_num_buckets

    return default_shuffle_partitions()


def candidate_pairs(
    blocks: rd.Dataset,
    max_block: int = 64,
    window: int = 8,
    num_buckets: int = 0,
    shuffle_partitions: int | None = None,
) -> rd.Dataset:
    """(block_key, row_id) → deduped (id_a, id_b)."""
    num_buckets = resolve_num_buckets(num_buckets)
    if shuffle_partitions is None:
        shuffle_partitions = _default_shuffle_partitions()

    def _bucketize(batch: pa.Table) -> pa.Table:
        k = batch["block_key"].to_numpy().astype(np.uint64)
        b = ((k * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(40)) % np.uint64(num_buckets)
        return batch.append_column("__bucket", pa.array(b.astype(np.int32)))

    # split/coalesce (no all-to-all) so the groupby sort sees a bounded
    # map-partition count — see _default_shuffle_partitions.
    bucketed = blocks.repartition(shuffle_partitions).map_batches(
        _bucketize, batch_format="pyarrow")

    def _bucket_pairs(group: pa.Table) -> pa.Table:
        a, b = pairs_from_blocks(group["block_key"].to_numpy(),
                                 group["row_id"].to_numpy(),
                                 max_block, window)
        if len(a) == 0:
            return _EMPTY
        tbl = pa.table({"id_a": pa.array(a, pa.int64()),
                        "id_b": pa.array(b, pa.int64())})
        return tbl.group_by(["id_a", "id_b"]).aggregate([])  # bucket-local dedup

    pairs = bucketed.groupby("__bucket").map_groups(_bucket_pairs,
                                                    batch_format="pyarrow")

    # global cross-band dedup: bucket on the PAIR hash (band keys scatter
    # the same pair across blocks), dedup vectorized per bucket — avoids
    # the native composite-key aggregate (measured ~50x slower)
    def _pair_bucket(batch: pa.Table) -> pa.Table:
        a = batch["id_a"].to_numpy().astype(np.uint64)
        b = batch["id_b"].to_numpy().astype(np.uint64)
        h = (a * np.uint64(0x9E3779B97F4A7C15)) ^ (b + np.uint64(0xC2B2AE3D27D4EB4F))
        return batch.append_column(
            "__pb", pa.array((h % np.uint64(num_buckets)).astype(np.int32)))

    def _dedup(group: pa.Table) -> pa.Table:
        a = group["id_a"].to_numpy()
        b = group["id_b"].to_numpy()
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        keep = np.r_[True, (a[1:] != a[:-1]) | (b[1:] != b[:-1])]
        return pa.table({"id_a": pa.array(a[keep], pa.int64()),
                         "id_b": pa.array(b[keep], pa.int64())})

    return (pairs.map_batches(_pair_bucket, batch_format="pyarrow")
            .groupby("__pb").map_groups(_dedup, batch_format="pyarrow"))
