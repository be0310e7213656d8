"""Candidate-pair generation from blocking keys.

Strategy (vectorized, skew-aware — SURVEY §7.4 "pair explosion"):

1. block sizes via a NATIVE ``groupby(block_key).Count`` (pre-aggregating,
   no per-group Python);
2. oversized keys (> max_block) are pulled out — they are rare once exact
   duplicates are pre-collapsed (stages/dedup.py) and get the
   sorted-window fallback: members sorted by row_id, pairs only within
   ``window`` positions (per-key cap in the FP-Hadoop/Scarlett spirit,
   PAPERS.md);
3. normal blocks become pairs by a partitioned SELF-JOIN on block_key
   (pyarrow join per bucket, fully vectorized) filtered to id_a < id_b;
4. pairs found by several bands are deduped by a native
   ``groupby(id_a, id_b).Count``.

Output schema: (id_a, id_b) with id_a < id_b — a total order, so
downstream thresholds behave identically under any partitioning.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Count

from .joins import hash_partition_join


def _window_pairs(group: pa.Table, window: int) -> pa.Table:
    ids = np.unique(group["row_id"].to_numpy())
    n = len(ids)
    if n < 2:
        return pa.table({"id_a": pa.array([], pa.int64()),
                         "id_b": pa.array([], pa.int64())})
    offs = np.arange(1, window + 1)
    ia = np.repeat(np.arange(n), window)
    ib = ia + np.tile(offs, n)
    keep = ib < n
    ia, ib = ia[keep], ib[keep]
    return pa.table({"id_a": pa.array(ids[ia], pa.int64()),
                     "id_b": pa.array(ids[ib], pa.int64())})


def candidate_pairs(
    blocks: rd.Dataset,
    max_block: int = 64,
    window: int = 8,
    num_buckets: int = 32,
) -> rd.Dataset:
    """(block_key, row_id) → deduped (id_a, id_b)."""
    blocks = blocks.materialize()  # consumed 2-3 times below
    sizes = blocks.groupby("block_key").aggregate(Count(alias_name="__n"))
    big_tbl = sizes.filter(expr=f"__n > {max_block}").to_pandas()
    big_keys = big_tbl["block_key"].to_numpy() if len(big_tbl) else np.array([], np.int64)

    parts: list[rd.Dataset] = []

    if len(big_keys):
        key_set = pa.array(big_keys)

        def _only_big(t: pa.Table) -> pa.Table:
            return t.filter(pc.is_in(t["block_key"], value_set=key_set))

        def _no_big(t: pa.Table) -> pa.Table:
            return t.filter(pc.invert(pc.is_in(t["block_key"], value_set=key_set)))

        big_blocks = blocks.map_batches(_only_big, batch_format="pyarrow")
        small_blocks = blocks.map_batches(_no_big, batch_format="pyarrow")
        parts.append(big_blocks.groupby("block_key").map_groups(
            lambda g: _window_pairs(g, window), batch_format="pyarrow"))
    else:
        small_blocks = blocks

    right = small_blocks.map_batches(
        lambda t: pa.table({"block_key": t["block_key"], "id_b": t["row_id"]}),
        batch_format="pyarrow")
    left = small_blocks.map_batches(
        lambda t: pa.table({"block_key": t["block_key"], "id_a": t["row_id"]}),
        batch_format="pyarrow")
    joined = hash_partition_join(left, right, key="block_key",
                                 num_buckets=num_buckets)
    parts.append(joined.map_batches(
        lambda t: t.filter(pc.less(t["id_a"], t["id_b"])).select(["id_a", "id_b"]),
        batch_format="pyarrow"))

    pairs = parts[0] if len(parts) == 1 else parts[0].union(*parts[1:])
    deduped = pairs.groupby(["id_a", "id_b"]).aggregate(Count(alias_name="__c"))
    return deduped.drop_columns(["__c"])
