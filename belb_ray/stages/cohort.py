"""Cohort retention analysis over an event stream.

Users are cohorted by the period (default: Monday-aligned week) of their
FIRST event; the output counts, for every (cohort_period, period_offset)
cell, how many cohort members were active ``offset`` periods after their
cohort period — the classic retention triangle.

Reference analog: the corpus-statistics / evaluation-subset family
(/root/reference/belb/scripts/get_mentions_subsets.py — slicing a corpus
by first-seen status), re-expressed as a streaming Ray Data aggregate.

Shape at 100 TB: the input projects to (user, period) inside
``map_batches`` with a batch-local dedup (≤ one row per user×period per
block — activity streams compress enormously here), then ONE
hash(user)-bucket shuffle co-locates each user's periods; the per-bucket
pass computes first-period + offsets and counts users per (cohort,
offset) vectorized, so only per-bucket COUNTS enter the final tiny
sum-combine. Input rows are never shuffled; the first exchange moves at
most distinct (user, period) pairs and the second moves fixed-width
count rows.

Periods are integer indices ``(epoch_seconds + epoch_offset) //
period_s`` — engine-independent (re-derivable in ANSI SQL without
date_trunc dialect differences). The default offset 259200 aligns weeks
to Monday (epoch 0 is a Thursday).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from .agg import _bucket_of_frame, bucketed_combine

from belb_ray.util import resolve_num_buckets

WEEK_S = 604_800
MONDAY_EPOCH_OFFSET_S = 259_200


def cohort_retention(events: rd.Dataset, user_col: str, ts_col: str,
                     period_s: int = WEEK_S,
                     epoch_offset: int = MONDAY_EPOCH_OFFSET_S,
                     num_buckets: int = 0) -> rd.Dataset:
    """Retention triangle: (cohort_period, period_offset, n_users)."""

    num_buckets = resolve_num_buckets(num_buckets)
    def _project(batch: pd.DataFrame) -> pd.DataFrame:
        # resolution-independent epoch seconds (testdata is timestamp[us],
        # pandas-built inputs are ns)
        epoch = batch[ts_col].to_numpy().astype(
            "datetime64[s]").astype(np.int64)
        period = (epoch + epoch_offset) // period_s
        out = pd.DataFrame({user_col: batch[user_col], "__period": period})
        return out.drop_duplicates()

    pairs = events.map_batches(_project, batch_format="pandas",
                               batch_size=1 << 17)

    def _bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        batch["__bucket"] = _bucket_of_frame(batch, [user_col], num_buckets)
        return batch

    def _per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop(columns="__bucket").drop_duplicates()
        cohort = g.groupby(user_col, sort=False)["__period"].transform("min")
        offs = g["__period"] - cohort
        cells = pd.DataFrame({"cohort_period": cohort,
                              "period_offset": offs})
        out = cells.groupby(["cohort_period", "period_offset"],
                            sort=False).size().rename("n_users")
        return out.reset_index()

    bucketed = pairs.map_batches(_bucketize, batch_format="pandas",
                                 batch_size=1 << 18)
    partial = bucketed.groupby("__bucket").map_groups(
        _per_bucket, batch_format="pandas")
    out = bucketed_combine(partial, ["cohort_period", "period_offset"],
                           {"n_users": "sum"}, num_buckets=16)

    def _types(batch: pd.DataFrame) -> pd.DataFrame:
        batch["cohort_period"] = batch["cohort_period"].astype(np.int64)
        batch["period_offset"] = batch["period_offset"].astype(np.int64)
        batch["n_users"] = batch["n_users"].astype(np.int64)
        return batch

    return out.map_batches(_types, batch_format="pandas")
