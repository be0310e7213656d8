"""Per-key ordered analytic window functions (lag / lead / cumulative
sum / row_number) over an event-shaped table.

The reference has no window functions (SURVEY §2.7) — this is a graft
extension for the event stream. Semantics match ANSI SQL
``f(x) OVER (PARTITION BY key ORDER BY order_cols)``.

Shape (same contract as ``windows.session_windows``): one hash-bucket
co-location shuffle moves each key's rows to one worker, then every
window column is computed **vectorized across the whole bucket** — one
stable sort by (key, order) and numpy shifted-slice / cumsum kernels with
key-boundary masks; no per-key Python dispatch. Assumes a single key's
rows fit a worker (user/session-shaped keys; salt pathological keys
first — same caveat as sessionization).

Ordering must be total for lag/lead/row_number to be deterministic:
callers pass a tiebreak column (e.g. an event id) as the last element of
``order_cols``; the SQL oracle orders by the same tuple.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

# (kind, value_col, out_col); kind: lag | lead | cumsum | row_number
# value_col is ignored for row_number.
WindowSpec = tuple[str, str, str]


def ordered_window(
    events: rd.Dataset,
    key: str,
    order_cols: list[str],
    specs: list[WindowSpec],
    num_buckets: int = 64,
) -> rd.Dataset:
    """→ input columns + one output column per spec, computed per key in
    ``order_cols`` order (SQL ``OVER (PARTITION BY key ORDER BY ...)``).

    lag/lead default offset 1, null at partition edges; cumsum is the
    running inclusive sum (``ROWS UNBOUNDED PRECEDING``); row_number is
    1-based.
    """
    for kind, _, _ in specs:
        if kind not in ("lag", "lead", "cumsum", "row_number"):
            raise ValueError(f"unknown window kind: {kind}")

    def _bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_array(batch[key].to_numpy(), categorize=False)
        batch["__bucket"] = (h % np.uint64(num_buckets)).astype(np.int32)
        return batch

    def _windows(group: pd.DataFrame) -> pd.DataFrame:
        g = (group.drop(columns="__bucket")
                  .sort_values([key] + order_cols, kind="stable")
                  .reset_index(drop=True))
        ks = g[key].to_numpy()
        # True at the first row of each key-partition
        new_key = np.r_[True, ks[1:] != ks[:-1]]
        pid = np.cumsum(new_key) - 1  # partition index per row
        for kind, vcol, out in specs:
            if kind == "lag":
                v = g[vcol].to_numpy()
                shifted = np.empty_like(v, dtype=np.float64)
                shifted[1:] = v[:-1]
                shifted[0] = np.nan
                shifted[new_key] = np.nan
                g[out] = shifted
            elif kind == "lead":
                v = g[vcol].to_numpy()
                shifted = np.empty_like(v, dtype=np.float64)
                shifted[:-1] = v[1:]
                shifted[-1] = np.nan
                # last row of each partition = row before a new_key row
                last = np.r_[new_key[1:], True]
                shifted[last] = np.nan
                g[out] = shifted
            elif kind == "cumsum":
                # dtype-preserving: int64 running sums stay exact ints
                # (hash parity with SQL BIGINT), floats stay float64
                v = g[vcol].to_numpy()
                cs = np.cumsum(v)
                # subtract the running total up to each partition's start
                # (indexed by pid — sign-safe, unlike a max-accumulate)
                g[out] = cs - (cs - v)[new_key][pid]
            else:  # row_number
                idx = np.arange(len(g), dtype=np.int64)
                g[out] = idx - idx[new_key][pid] + 1
        return g

    bucketed = events.map_batches(_bucketize, batch_format="pandas",
                                  batch_size=1 << 17)
    return bucketed.groupby("__bucket").map_groups(_windows,
                                                   batch_format="pandas")
