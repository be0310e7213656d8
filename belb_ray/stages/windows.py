"""Windowed aggregation over an event stream table.

The reference has no windows (SURVEY §2.7 "no windows, no watermarks") —
this is a graft extension for event-shaped inputs: tumbling windows as a
derived key (``date_trunc``-style floor of the timestamp) + combiner-style
pre-aggregation inside ``map_batches``, so the shuffle only moves one row
per (key, window) per block (the 100 TB groupby pattern)."""

from __future__ import annotations

import pandas as pd
import ray.data as rd

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
