"""Windowed aggregation over an event stream table.

The reference has no windows (SURVEY §2.7 "no windows, no watermarks") —
this is a graft extension for event-shaped inputs:

- ``tumbling_window`` — floor(ts, every) becomes a grouping key +
  combiner-style pre-aggregation inside ``map_batches``, so the shuffle
  only moves one row per (key, window) per block (the 100 TB groupby
  pattern).
- ``hopping_window`` — overlapping windows of ``length`` sliding by
  ``every``: each event explodes to its ``length/every`` containing
  windows BEFORE the same pre-aggregated groupby. The explosion factor is
  the window overlap count — bounded and known up front, no all-to-all
  beyond the one aggregation shuffle.
- ``session_windows`` — per-key sessionization with an inactivity
  ``gap``: events of a key co-locate via one bucketed shuffle, sessions
  form vectorized per key (diff > gap ⇒ new session). Assumes one key's
  events fit a worker (true for user/session-shaped keys; salt or
  pre-split pathological keys first).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from ..util import resolve_num_buckets

from .agg import AggSpec, preagg_groupby

_FREQ = {"1h": "h", "1d": "D", "1min": "min", "15min": "15min"}


def tumbling_window(
    events: rd.Dataset,
    ts_col: str,
    every: str,
    keys: list[str],
    specs: list[AggSpec],
    window_col: str = "window_start",
) -> rd.Dataset:
    """Tumbling-window aggregate: floor(ts, every) becomes a grouping key,
    then pre-aggregated groupby over (window, *keys)."""
    freq = _FREQ.get(every, every)

    def _add_window(batch: pd.DataFrame) -> pd.DataFrame:
        batch[window_col] = batch[ts_col].dt.floor(freq)
        return batch

    windowed = events.map_batches(_add_window, batch_format="pandas",
                                  batch_size=65536)
    return preagg_groupby(windowed, [window_col] + keys, specs)


def hopping_window(
    events: rd.Dataset,
    ts_col: str,
    every: str,
    length: str,
    keys: list[str],
    specs: list[AggSpec],
    window_col: str = "window_start",
) -> rd.Dataset:
    """Hopping (sliding) windows: ``length``-long windows starting every
    ``every``. An event at t belongs to windows starting in
    (t - length, t] aligned to ``every`` — it is replicated to each, then
    the tumbling machinery aggregates."""
    every_td = pd.Timedelta(every)
    length_td = pd.Timedelta(length)
    n_win = int(length_td / every_td)
    if n_win < 1 or every_td * n_win != length_td:
        raise ValueError("length must be a positive multiple of every")
    freq = _FREQ.get(every, every)

    def _explode(batch: pd.DataFrame) -> pd.DataFrame:
        base = batch[ts_col].dt.floor(freq)
        frames = []
        for i in range(n_win):
            f = batch.copy()
            f[window_col] = base - i * every_td
            frames.append(f)
        out = pd.concat(frames, ignore_index=True)
        # drop replicas whose window no longer contains the event
        keep = out[ts_col] < out[window_col] + length_td
        return out[keep]

    windowed = events.map_batches(_explode, batch_format="pandas",
                                  batch_size=65536)
    return preagg_groupby(windowed, [window_col] + keys, specs)


def session_windows(
    events: rd.Dataset,
    ts_col: str,
    key: str,
    gap: str,
    num_buckets: int = 0,
    max_bucket_rows: int | None = 8_000_000,
) -> rd.Dataset:
    """→ (key, session_id, session_start, session_end, n_events): events
    of a key sorted by time; a gap > ``gap`` starts a new session.
    session_id = epoch-seconds of the session's first event (stable under
    any partitioning).

    A bucket larger than ``max_bucket_rows`` fails LOUDLY naming the
    hottest key (instead of a silent worker OOM) — raise num_buckets,
    pre-salt the pathological key, or raise the budget."""
    num_buckets = resolve_num_buckets(num_buckets)
    gap_td = pd.Timedelta(gap)

    def _bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_array(batch[key].to_numpy(), categorize=False)
        batch["__bucket"] = (h % np.uint64(num_buckets)).astype(np.int32)
        return batch

    def _sessions(group: pd.DataFrame) -> pd.DataFrame:
        from .agg import guard_bucket_rows

        guard_bucket_rows(group, key, max_bucket_rows, "session_windows")
        g = group.drop(columns="__bucket").sort_values([key, ts_col],
                                                       kind="stable")
        ts = g[ts_col].to_numpy()
        ks = g[key].to_numpy()
        new_key = np.r_[True, ks[1:] != ks[:-1]]
        gap_break = np.r_[False, (ts[1:] - ts[:-1]) > gap_td.to_numpy()]
        start = new_key | gap_break
        sess = np.cumsum(start) - 1
        df = pd.DataFrame({key: ks, "__sess": sess, ts_col: ts})
        agg = df.groupby("__sess", sort=False).agg(
            key_=(key, "first"), session_start=(ts_col, "min"),
            session_end=(ts_col, "max"), n_events=(ts_col, "size"))
        agg = agg.rename(columns={"key_": key}).reset_index(drop=True)
        # epoch seconds regardless of the column's native resolution
        agg["session_id"] = (agg["session_start"].astype("datetime64[ns]")
                             .astype("int64") // 10**9)
        return agg[[key, "session_id", "session_start", "session_end",
                    "n_events"]]

    bucketed = events.map_batches(_bucketize, batch_format="pandas",
                                  batch_size=1 << 17)
    return bucketed.groupby("__bucket").map_groups(_sessions,
                                                   batch_format="pandas")
