"""Item co-occurrence (market-basket) counting.

Counts unordered item pairs that appear together in the same group
(parts in one order, tokens in one doc, entities in one citation — the
reference's citation-accumulator shape, belb/kbs/kb.py's pmid→set
aggregation, generalized to pairwise counts).

Distributed shape: ONE hash(group) co-location shuffle brings each
group's items together; pair generation inside each bucket is fully
vectorized (repeat/offset index arithmetic — no per-group Python
dispatch); a second combiner aggregation counts each (a, b) pair with
fixed-width partials. The pair blow-up is quadratic per group, so
``max_group_size`` caps pathological groups (a group over the cap is
dropped whole, deterministically, rather than silently exploding the
shuffle) — the standard skew guard, same policy as the ER pair
generator (pairs.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd


def cooccurrence_pairs(ds: rd.Dataset, group_col: str, item_col: str,
                       num_buckets: int = 64,
                       max_group_size: int | None = None) -> rd.Dataset:
    """(a, b) rows — one per unordered distinct item pair per group,
    with a < b. Items are deduped within a group first."""

    def _bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch[[group_col, item_col]].drop_duplicates()
        h = pd.util.hash_array(batch[group_col].to_numpy(),
                               categorize=False)
        batch = batch.assign(
            __bucket=(h % np.uint64(num_buckets)).astype(np.int32))
        return batch

    def _pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = (group.drop(columns="__bucket")
             .drop_duplicates()  # same (group,item) from two input blocks
             .sort_values([group_col, item_col], kind="mergesort"))
        gv = g[group_col].to_numpy()
        it = g[item_col].to_numpy()
        n = len(g)
        if n == 0:
            return pd.DataFrame({"a": it[:0], "b": it[:0]})
        new = np.ones(n, dtype=bool)
        new[1:] = gv[1:] != gv[:-1]
        starts = np.flatnonzero(new)
        counts = np.diff(np.concatenate((starts, [n])))
        if max_group_size is not None:
            keep = counts <= max_group_size
            mask = np.repeat(keep, counts)
            gv, it = gv[mask], it[mask]
            n = len(it)
            counts = counts[keep]
            if n == 0:
                return pd.DataFrame({"a": it[:0], "b": it[:0]})
            starts = np.concatenate(
                ([0], np.cumsum(counts)[:-1])).astype(np.int64)
        # every row pairs with the rows after it inside its group:
        # fully vectorized repeat/offset index arithmetic
        idx = np.arange(n)
        local = idx - np.repeat(starts, counts)
        reps = np.repeat(counts, counts) - local - 1
        first = np.repeat(idx, reps)
        offs = np.arange(int(reps.sum())) - np.repeat(
            np.cumsum(reps) - reps, reps)
        second = first + 1 + offs
        return pd.DataFrame({"a": it[first], "b": it[second]})

    return (ds.map_batches(_bucketize, batch_format="pandas")
            .groupby("__bucket")
            .map_groups(_pairs, batch_format="pandas"))


def cooccurrence_topk(ds: rd.Dataset, group_col: str, item_col: str,
                      k: int, num_buckets: int = 64,
                      max_group_size: int | None = None) -> rd.Dataset:
    """Top-k most co-occurring item pairs: (a, b, n_groups), ordered by
    count desc with a deterministic (a, b) tie-break."""
    from .agg import preagg_groupby

    pairs = cooccurrence_pairs(ds, group_col, item_col, num_buckets,
                               max_group_size)
    counts = preagg_groupby(pairs, ["a", "b"],
                            [("count", "", "n_groups")], num_buckets)
    return counts.sort(["n_groups", "a", "b"],
                       descending=[True, False, False]).limit(k)


def item_cosine_pairs(ds: rd.Dataset, group_col: str, item_col: str,
                      min_cosupport: int = 1, round_to: int = 6,
                      num_buckets: int = 64,
                      broadcast_threshold: int = 2_000_000,
                      max_group_size: int | None = None) -> rd.Dataset:
    """Item–item cosine similarity from a bipartite (group, item)
    incidence — the collaborative-filtering bipartite projection:
    cos(a, b) = |G(a) ∩ G(b)| / √(|G(a)|·|G(b)|) over binary group
    vectors → (a, b, c, cosine) for unordered item pairs sharing ≥
    ``min_cosupport`` groups (a < b).

    Distributed shape: co-support counts ride the
    ``cooccurrence_pairs`` machinery (per-group dedup, ONE group
    co-location shuffle, vectorized pair explosion, pair-count
    combiner); per-item supports are a distinct-count combiner
    (item-sized); both supports attach to the pair table via the
    size-guarded broadcast join, and the cosine finish is one
    vectorized map. Rows never shuffle beyond the pair machinery;
    ``max_group_size`` caps hub groups exactly as in cooccurrence."""
    from .agg import count_distinct, preagg_groupby
    from .analytic import _attach_small

    pairs = cooccurrence_pairs(ds, group_col, item_col, num_buckets,
                               max_group_size=max_group_size)

    # single-int64 pair keys make the count combine a fast-path int
    # groupby (composite-key pandas groupby measured ~4x slower on
    # pair-scale inputs); requires non-negative item ids < 2^31, which
    # the packer asserts per batch — non-int items take the plain path
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
    sup = count_distinct(ds.select_columns([item_col, group_col]),
                         [item_col], group_col, "sup", num_buckets)

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
            "cosine": np.round(c / np.sqrt(sa * sb), round_to)})

    return withs.map_batches(_cos, batch_format="pandas")
