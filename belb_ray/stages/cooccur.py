"""Item co-occurrence (market-basket) counting.

Counts unordered item pairs that appear together in the same group
(parts in one order, tokens in one doc, entities in one citation — the
reference's citation-accumulator shape, belb/kbs/kb.py's pmid→set
aggregation, generalized to pairwise counts).

Distributed shape: ONE hash(group) co-location shuffle builds compact
per-group item lists (an Arrow ``large_list`` column — one row per
group, fully vectorized ``ListArray.from_arrays`` construction, no
per-group Python dispatch); the quadratic pair explosion then runs as
a SEPARATE wide map stage over a cheap ``repartition`` of those
group rows. Decoupling explosion from the groupby matters because a
``groupby().map_groups`` stage runs one task per *sort output block* —
a small-but-exploding input would otherwise blow up 13M pairs inside
2-3 tasks while the rest of the cluster idles. Group rows are tiny
(the deduped incidence), so the repartition moves almost nothing and
the explosion parallelism is set by ``explode_blocks``, not by the
shuffle's block count.

The pair blow-up is quadratic per group, so ``max_group_size`` caps
pathological groups (a group over the cap is dropped whole,
deterministically, rather than silently exploding the shuffle) — the
standard skew guard, same policy as the ER pair generator (pairs.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from belb_ray.util import resolve_num_buckets
from ..util import round_half_away


def group_item_lists(ds: rd.Dataset, group_col: str, item_col: str,
                     num_buckets: int = 0,
                     max_group_size: int | None = None) -> rd.Dataset:
    """(group, __items) — one row per group, ``__items`` a sorted
    ``large_list`` of the group's distinct items. Groups larger than
    ``max_group_size`` are dropped whole (skew guard)."""

    num_buckets = resolve_num_buckets(num_buckets)
    def _bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch[[group_col, item_col]].drop_duplicates()
        h = pd.util.hash_array(batch[group_col].to_numpy(),
                               categorize=False)
        return batch.assign(
            __bucket=(h % np.uint64(num_buckets)).astype(np.int32))

    def _lists(group: pd.DataFrame) -> pa.Table:
        g = (group.drop(columns="__bucket")
             .drop_duplicates()  # same (group,item) from two input blocks
             .sort_values([group_col, item_col], kind="mergesort"))
        gv = g[group_col].to_numpy()
        it = pa.Array.from_pandas(g[item_col])
        n = len(g)
        empty = pa.table({
            group_col: pa.Array.from_pandas(g[group_col][:0]),
            "__items": pa.array([], pa.large_list(it.type))})
        if n == 0:
            return empty
        new = np.ones(n, dtype=bool)
        new[1:] = gv[1:] != gv[:-1]
        starts = np.flatnonzero(new)
        counts = np.diff(np.concatenate((starts, [n]))).astype(np.int64)
        if max_group_size is not None:
            keep = counts <= max_group_size
            mask = np.repeat(keep, counts)
            it = it.filter(pa.array(mask))
            gv = gv[mask]
            counts = counts[keep]
            if counts.size == 0:
                return empty
            starts = np.concatenate(
                ([0], np.cumsum(counts)[:-1])).astype(np.int64)
        offsets = np.concatenate(([0], np.cumsum(counts)))
        la = pa.LargeListArray.from_arrays(
            pa.array(offsets, pa.int64()), it)
        return pa.table({group_col: pa.array(gv[starts]), "__items": la})

    return (ds.map_batches(_bucketize, batch_format="pandas")
            .groupby("__bucket")
            .map_groups(_lists, batch_format="pandas"))


def explode_pairs(lists: rd.Dataset,
                  explode_blocks: int = 64,
                  split_pairs: int | None = None) -> rd.Dataset:
    """(group, __items) rows → (a, b) unordered item pairs, a < b.

    ``split_pairs`` is the hub-group skew guard that KEEPS the data
    (``max_group_size`` drops oversized groups whole): a group whose
    pair triangle exceeds it is split into row-range work units — each
    chunk row duplicates the (small) member array and carries a
    ``[__r0, __r1)`` first-row range — so one hub group fans out over
    many tasks instead of pinning a straggler.

    ``repartition(explode_blocks)`` (a cheap split of whole group rows
    — never breaks a group) sets the parallelism of the quadratic
    explosion independently of the upstream shuffle's block count.

    The explode op requests ``num_cpus=1.01`` purely as a FUSION
    BARRIER: a consumer's map chain (e.g. a count combiner with
    ``batch_size=65536``) would otherwise fuse onto ``_explode`` and
    the executor bundles the tiny group-list blocks up to the largest
    batch_size in the fused chain — collapsing the quadratic explosion
    into 1-2 tasks (measured 38 s single-task vs 0.3 s at 64 tasks).
    Operators with differing resource requests never fuse, and block
    order stays deterministic."""

    def _split(t: pa.Table) -> pa.Table:
        # light rows pass through with the full [0, c) range; the few
        # heavy rows explode into chunk rows (python loop over heavy
        # rows only — they are rare by definition)
        arr = t["__items"]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        c = arr.value_lengths().to_numpy(zero_copy_only=False).astype(
            np.int64)
        npairs = c * (c - 1) // 2
        heavy = npairs > split_pairs
        out = t.append_column(
            "__r0", pa.array(np.zeros(len(t), np.int64)))
        out = out.append_column("__r1", pa.array(c))
        if not heavy.any():
            return out
        light_tbl = out.filter(pa.array(~heavy))
        rows = []
        for i in np.flatnonzero(heavy):
            ci = int(c[i])
            reps = ci - np.arange(ci, dtype=np.int64) - 1
            cum = np.cumsum(reps)
            bounds = np.searchsorted(
                cum, np.arange(split_pairs, int(cum[-1]), split_pairs),
                side="left") + 1
            bounds = np.concatenate(([0], bounds, [ci]))
            base = {name: t[name][int(i)].as_py()
                    for name in t.column_names}
            for r0, r1 in zip(bounds[:-1], bounds[1:]):
                if r0 < r1:
                    rows.append({**base, "__r0": int(r0),
                                 "__r1": int(r1)})
        heavy_tbl = pa.Table.from_pylist(rows, schema=out.schema)
        return pa.concat_tables([light_tbl, heavy_tbl])

    def _explode(t: pa.Table) -> pa.Table:
        arr = t["__items"]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        vals = arr.flatten()
        if len(t) == 0 or len(vals) == 0:
            return pa.table({"a": vals[:0], "b": vals[:0]})
        c = arr.value_lengths().to_numpy(zero_copy_only=False).astype(
            np.int64)
        base = np.cumsum(c) - c
        if "__r0" in t.column_names:
            r0 = t["__r0"].to_numpy(zero_copy_only=False)
            r1 = t["__r1"].to_numpy(zero_copy_only=False)
        else:
            r0, r1 = np.zeros(len(t), np.int64), c
        nf = r1 - r0  # first-rows per unit
        F = int(nf.sum())
        if F == 0:
            return pa.table({"a": vals[:0], "b": vals[:0]})
        # global (flattened-array) index of every first row, then the
        # same vectorized repeat/offset pair arithmetic — each first
        # pairs with everything after it inside ITS unit
        fl = (np.arange(F, dtype=np.int64)
              - np.repeat(np.cumsum(nf) - nf, nf)
              + np.repeat(base + r0, nf))
        reps = np.repeat(base + c, nf) - fl - 1
        total = int(reps.sum())
        if total == 0:
            return pa.table({"a": vals[:0], "b": vals[:0]})
        first = np.repeat(fl, reps)
        offs = np.arange(total) - np.repeat(np.cumsum(reps) - reps, reps)
        second = first + 1 + offs
        return pa.table({"a": vals.take(pa.array(first)),
                         "b": vals.take(pa.array(second))})

    if split_pairs is not None:
        lists = lists.map_batches(_split, batch_format="pyarrow")
    return (lists.repartition(explode_blocks)
            .map_batches(_explode, batch_format="pyarrow",
                         num_cpus=1.01))


def cooccurrence_pairs(ds: rd.Dataset, group_col: str, item_col: str,
                       num_buckets: int = 0,
                       max_group_size: int | None = None,
                       explode_blocks: int = 64,
                       split_pairs: int | None = None) -> rd.Dataset:
    """(a, b) rows — one per unordered distinct item pair per group,
    with a < b. Items are deduped within a group first. Skew guards:
    ``max_group_size`` DROPS oversized groups whole; ``split_pairs``
    KEEPS them, splitting their pair triangle across tasks."""
    num_buckets = resolve_num_buckets(num_buckets)
    return explode_pairs(
        group_item_lists(ds, group_col, item_col, num_buckets,
                         max_group_size),
        explode_blocks, split_pairs)


def cooccurrence_topk(ds: rd.Dataset, group_col: str, item_col: str,
                      k: int, num_buckets: int = 0,
                      max_group_size: int | None = None) -> rd.Dataset:
    """Top-k most co-occurring item pairs: (a, b, n_groups), ordered by
    count desc with a deterministic (a, b) tie-break."""
    num_buckets = resolve_num_buckets(num_buckets)
    from .agg import preagg_groupby

    pairs = cooccurrence_pairs(ds, group_col, item_col, num_buckets,
                               max_group_size)
    counts = preagg_groupby(pairs, ["a", "b"],
                            [("count", "", "n_groups")], num_buckets)
    return counts.sort(["n_groups", "a", "b"],
                       descending=[True, False, False]).limit(k)


def item_cosine_pairs(ds: rd.Dataset, group_col: str, item_col: str,
                      min_cosupport: int = 1, round_to: int = 6,
                      num_buckets: int = 0,
                      broadcast_threshold: int = 2_000_000,
                      max_group_size: int | None = None,
                      explode_blocks: int = 64) -> rd.Dataset:
    """Item–item cosine similarity from a bipartite (group, item)
    incidence — the collaborative-filtering bipartite projection:
    cos(a, b) = |G(a) ∩ G(b)| / √(|G(a)|·|G(b)|) over binary group
    vectors → (a, b, c, cosine) for unordered item pairs sharing ≥
    ``min_cosupport`` groups (a < b).

    Distributed shape: the deduped per-group item lists are built with
    ONE co-location shuffle and materialized once (they are the deduped
    incidence — small relative to the pair blow-up); BOTH the pair
    explosion and the per-item supports derive from that same table, so
    the input is scanned exactly once. Co-support counts ride the pair
    combiner (single-int64 packed keys on the int fast path); supports
    are a count combiner over the flattened lists (each (group, item)
    appears exactly once by construction); both attach to the pair
    table via the size-guarded broadcast join and the cosine finish is
    one vectorized map. ``max_group_size`` caps hub groups exactly as
    in cooccurrence."""
    num_buckets = resolve_num_buckets(num_buckets)
    from .agg import preagg_groupby
    from .analytic import _attach_small

    lists = group_item_lists(ds, group_col, item_col, num_buckets,
                             max_group_size).materialize()
    pairs = explode_pairs(lists, explode_blocks)

    # single-int64 pair keys make the count combine a fast-path int
    # groupby (composite-key pandas groupby measured ~4x slower on
    # pair-scale inputs); requires non-negative item ids < 2^31, which
    # the packer asserts per batch — non-int items take the plain path.
    # Item dtype comes from the INPUT dataset's schema: the lists
    # table's schema peek can land on a zero-column empty block
    # (AllToAll ops emit them for empty partitions).
    in_schema = ds.schema()
    item_type = in_schema.types[in_schema.names.index(item_col)]
    int_items = str(item_type) in ("int64", "int32", "int16")

    if int_items:
        def _pack(b: pd.DataFrame) -> pd.DataFrame:
            a = b["a"].to_numpy(np.int64)
            bb = b["b"].to_numpy(np.int64)
            if len(a) and (a.min() < 0 or max(a.max(), bb.max()) >= 1 << 31):
                raise ValueError("item ids must be in [0, 2^31) to pack")
            return pd.DataFrame({"__ab": (a << 31) | bb})

        packed = preagg_groupby(
            pairs.map_batches(_pack, batch_format="pandas"),
            ["__ab"], [("count", "", "c")], num_buckets)

        def _unpack(b: pd.DataFrame) -> pd.DataFrame:
            ab = b["__ab"].to_numpy(np.int64)
            return pd.DataFrame({"a": ab >> 31,
                                 "b": ab & ((1 << 31) - 1),
                                 "c": b["c"].to_numpy(np.int64)})

        co = packed.map_batches(_unpack, batch_format="pandas")
    else:
        co = preagg_groupby(pairs, ["a", "b"], [("count", "", "c")],
                            num_buckets)
    if min_cosupport > 1:
        co = co.filter(expr=f"c >= {int(min_cosupport)}")

    def _flat_items(t: pa.Table) -> pa.Table:
        arr = t["__items"]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        return pa.table({item_col: arr.flatten()})

    sup = preagg_groupby(
        lists.map_batches(_flat_items, batch_format="pyarrow"),
        [item_col], [("count", "", "sup")], num_buckets)

    def _ren(new: str):
        def fn(b: pd.DataFrame) -> pd.DataFrame:
            return b.rename(columns={item_col: new,
                                     "sup": f"__sup_{new}"})

        return fn

    withs = _attach_small(co, sup.map_batches(_ren("a"),
                                              batch_format="pandas"),
                          "a", broadcast_threshold)
    withs = _attach_small(withs, sup.map_batches(_ren("b"),
                                                 batch_format="pandas"),
                          "b", broadcast_threshold)

    def _cos(b: pd.DataFrame) -> pd.DataFrame:
        c = b["c"].to_numpy(np.float64)
        sa = b["__sup_a"].to_numpy(np.float64)
        sb = b["__sup_b"].to_numpy(np.float64)
        return pd.DataFrame({
            "a": b["a"], "b": b["b"],
            "c": b["c"].to_numpy(np.int64),
            "cosine": round_half_away(c / np.sqrt(sa * sb), round_to)})

    return withs.map_batches(_cos, batch_format="pandas")
