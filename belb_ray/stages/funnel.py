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

from belb_ray.util import resolve_num_buckets


def funnel(ds: rd.Dataset, user_col: str, type_col: str, ts_col: str,
           steps: list[str], within: pd.Timedelta | None = None,
           num_buckets: int = 0) -> rd.Dataset:
    """(user, steps_completed, t_first, t_last) per user with ≥1 step-1
    event. Later steps must occur at-or-after the previous step's chosen
    time (ties allowed, SQL ``>=`` parity)."""
    num_buckets = resolve_num_buckets(num_buckets)
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


def last_touch_attribution(ds: rd.Dataset, user_col: str, type_col: str,
                           ts_col: str, id_col: str,
                           conversion_type: str, touch_type: str,
                           window_us: int = 86_400_000_000,
                           num_buckets: int = 0) -> rd.Dataset:
    """Last-touch conversion attribution: for every ``conversion_type``
    event, the user's most recent PRIOR ``touch_type`` event within
    ``window_us`` microseconds (strictly earlier by (ts, id) order).
    → (conversion_id, user_id, touch_id, gap_us); touch_id/gap_us are
    float64 with NaN when no touch qualifies (matches SQL NULL BIGINT
    → pandas float64).

    Shape: rows not of the two types are dropped BEFORE the single
    hash(user) co-location shuffle (read-side prune — the touch+conv
    subset is usually a small fraction of the stream); inside each
    bucket one lexsort + a forward-carry of the last touch index per
    user — no per-row Python, no window self-join."""

    num_buckets = resolve_num_buckets(num_buckets)
    def _bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch[[user_col, type_col, ts_col, id_col]]
        batch = batch[batch[type_col].isin(
            [conversion_type, touch_type])]
        h = pd.util.hash_array(batch[user_col].to_numpy(),
                               categorize=False)
        return batch.assign(
            __bucket=(h % np.uint64(num_buckets)).astype(np.int32))

    def _attribute(group: pd.DataFrame) -> pd.DataFrame:
        g = (group.drop(columns="__bucket")
             .sort_values([user_col, ts_col, id_col], kind="stable")
             .reset_index(drop=True))
        us = g[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        users = g[user_col].to_numpy()
        new_user = np.r_[True, users[1:] != users[:-1]]
        is_touch = (g[type_col] == touch_type).to_numpy()
        idx = np.arange(len(g), dtype=np.int64)
        # forward-carry of the most recent touch row index per user:
        # reset the carry at user heads by restarting the accumulate
        # from a sentinel (-1) planted at each head
        carry = np.where(is_touch, idx, -1)
        carry = np.where(new_user & ~is_touch, -1, carry)
        # segmented maximum-accumulate: subtract per-user offsets trick
        # (plain np.maximum.accumulate would leak across users, so bump
        # each user's sentinel domain by a monotone per-user base)
        uid = np.cumsum(new_user) - 1
        base = (uid + 1) * (len(g) + 2)
        lifted = np.where(carry >= 0, base + carry, 0)
        lifted = np.maximum.accumulate(lifted)
        last_touch = np.where(lifted >= base, lifted - base, -1)
        conv = ~is_touch
        # strictly-prior: a conversion row's own index is never a touch
        lt = last_touch[conv]
        cus = us[conv]
        valid = lt >= 0
        gap = np.where(valid, cus - us[np.maximum(lt, 0)], -1)
        ok = valid & (gap <= window_us)
        tid = g[id_col].to_numpy()[np.maximum(lt, 0)].astype(np.float64)
        return pd.DataFrame({
            "conversion_id": g[id_col].to_numpy()[conv],
            "user_id": users[conv],
            "touch_id": np.where(ok, tid, np.nan),
            "gap_us": np.where(ok, gap.astype(np.float64), np.nan)})

    bucketed = ds.map_batches(_bucketize, batch_format="pandas",
                              batch_size=1 << 17)
    return bucketed.groupby("__bucket").map_groups(
        _attribute, batch_format="pandas")
