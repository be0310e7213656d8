"""Funnel (ordered multi-step conversion) analysis.

For an ordered step list (e.g. signup → click → purchase), find for each
user the earliest completion chain: t₁ = first step-1 event, tᵢ = first
step-i event at or after tᵢ₋₁ (optionally requiring tᵢ − t₁ ≤ ``within``).
Emits one row per user who reached step 1, with how many steps they
completed and the chain's first/last timestamps — the standard product-
analytics conversion query, here as ONE hash(user) co-location shuffle
plus len(steps) vectorized passes inside each bucket (each pass is a
filter + merge + groupby-min over the whole bucket — no per-user Python).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd


def funnel(ds: rd.Dataset, user_col: str, type_col: str, ts_col: str,
           steps: list[str], within: pd.Timedelta | None = None,
           num_buckets: int = 64) -> rd.Dataset:
    """(user, steps_completed, t_first, t_last) per user with ≥1 step-1
    event. Later steps must occur at-or-after the previous step's chosen
    time (ties allowed, SQL ``>=`` parity)."""
    if not steps:
        raise ValueError("funnel needs at least one step")

    def _bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch[[user_col, type_col, ts_col]]
        batch = batch[batch[type_col].isin(steps)]
        h = pd.util.hash_array(batch[user_col].to_numpy(),
                               categorize=False)
        return batch.assign(
            __bucket=(h % np.uint64(num_buckets)).astype(np.int32))

    def _funnel(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop(columns="__bucket")
        first = (g[g[type_col] == steps[0]]
                 .groupby(user_col)[ts_col].min())
        if first.empty:
            return pd.DataFrame({
                user_col: first.index[:0],
                "steps_completed": np.array([], np.int64),
                "t_first": first.values[:0],
                "t_last": first.values[:0],
            })
        counts = pd.Series(1, index=first.index, dtype=np.int64)
        last = first.copy()
        cur = first
        for s in steps[1:]:
            rows = g[g[type_col] == s].merge(
                cur.rename("__tp"), left_on=user_col, right_index=True)
            rows = rows[rows[ts_col] >= rows["__tp"]]
            if within is not None:
                t1 = first[rows[user_col]].to_numpy()
                rows = rows[rows[ts_col].to_numpy() <= t1 + within]
            cur = rows.groupby(user_col)[ts_col].min()
            if cur.empty:
                break
            counts.loc[cur.index] += 1
            last.loc[cur.index] = cur
        return pd.DataFrame({
            user_col: first.index,
            "steps_completed": counts.values,
            "t_first": first.values,
            "t_last": last.values,
        })

    return (ds.map_batches(_bucketize, batch_format="pandas")
            .groupby("__bucket")
            .map_groups(_funnel, batch_format="pandas"))
