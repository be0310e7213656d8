"""Time-series resample + gap-fill (downsample to a fixed period grid,
forward-fill missing periods per key).

Reference analog: the reference's per-document sequential assembly
(corpus passages joined onto a continuous offset grid,
/root/reference/belb/preprocessing/data.py passage assembly) generalized
to the time axis — the op every training-data feature store needs to
turn an irregular event stream into fixed-interval features.

Shape at 100 TB: rows pre-reduce per batch to one (key, period, value)
partial per key×period per block, then ONE hash(key)-bucket shuffle
co-locates each key's periods; the per-bucket pass builds every key's
dense period grid and forward-fills with a single composite-key
searchsorted — no per-key Python dispatch, no driver collect. Output
size is Σ_key (last−first+1) grid rows; input rows never shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from .agg import _bucket_of_frame

from belb_ray.util import resolve_num_buckets

_AGGS = ("max", "min")


def resample_ffill(events: rd.Dataset, key_col: str, ts_col: str,
                   value_col: str, period_s: int = 86_400,
                   agg: str = "max", num_buckets: int = 0) -> rd.Dataset:
    """→ (key_col, period:int64, value_ffill:double): one row per period
    between each key's first and last observed period; observed periods
    carry ``agg`` (max|min — order-independent, so the distributed
    result is deterministic) of the period's values, gaps carry the
    previous period's value forward."""
    num_buckets = resolve_num_buckets(num_buckets)
    if agg not in _AGGS:
        raise ValueError(f"agg must be one of {_AGGS}")

    def _partial(batch: pd.DataFrame) -> pd.DataFrame:
        epoch = batch[ts_col].to_numpy().astype(
            "datetime64[s]").astype(np.int64)
        df = pd.DataFrame({key_col: batch[key_col],
                           "__period": epoch // period_s,
                           "__v": batch[value_col].astype(np.float64)})
        g = df.groupby([key_col, "__period"], sort=False)["__v"]
        return (g.max() if agg == "max" else g.min()).reset_index()

    partials = events.map_batches(_partial, batch_format="pandas",
                                  batch_size=1 << 17)

    def _bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        batch["__bucket"] = _bucket_of_frame(batch, [key_col], num_buckets)
        return batch

    def _grid_ffill(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop(columns="__bucket")
        gg = g.groupby([key_col, "__period"], sort=False)["__v"]
        obs = (gg.max() if agg == "max" else gg.min()).reset_index()
        obs = obs.sort_values([key_col, "__period"],
                              kind="stable").reset_index(drop=True)
        if not len(obs):
            return pd.DataFrame({key_col: obs[key_col],
                                 "period": pd.Series([], dtype=np.int64),
                                 "value_ffill": pd.Series([], dtype=np.float64)})
        keys = obs[key_col].to_numpy()
        per = obs["__period"].to_numpy()
        vals = obs["__v"].to_numpy()
        new_key = np.r_[True, keys[1:] != keys[:-1]]
        kidx = np.cumsum(new_key) - 1  # dense key ordinal per obs row
        lo = per[new_key]  # first period per key (sorted order)
        # last period per key
        last_mask = np.r_[new_key[1:], True]
        hi = per[last_mask]
        cnt = hi - lo + 1
        total = int(cnt.sum())
        # expanded grid: key ordinal + contiguous periods per key
        ek = np.repeat(np.arange(len(lo), dtype=np.int64), cnt)
        starts = np.concatenate(([0], np.cumsum(cnt)[:-1]))
        eper = np.arange(total, dtype=np.int64) - starts[ek] + lo[ek]
        # composite searchsorted forward-fill: rank observed and grid
        # rows on (key ordinal, period); every grid row's fill source is
        # the last observed row at or before it (same key by
        # construction, since each grid starts at its key's first
        # observed period)
        pmin = per.min() if len(per) else 0
        comp_obs = kidx * np.int64(1) * (np.int64(1) << 42) + (per - pmin)
        comp_grid = ek * (np.int64(1) << 42) + (eper - pmin)
        src = np.searchsorted(comp_obs, comp_grid, side="right") - 1
        out = pd.DataFrame({key_col: keys[new_key][ek],
                            "period": eper,
                            "value_ffill": vals[src]})
        return out

    bucketed = partials.map_batches(_bucketize, batch_format="pandas",
                                    batch_size=1 << 18)
    return bucketed.groupby("__bucket").map_groups(_grid_ffill,
                                                   batch_format="pandas")
