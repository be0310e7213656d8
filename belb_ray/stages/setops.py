"""Distributed SQL set operations (EXCEPT / INTERSECT, distinct
semantics) over arbitrary key tuples.

Reference analog: the notinkb subset and cross-KB membership checks
(/root/reference/belb/kbs/query.py anti-join shapes) expressed as set
algebra. Shape at 100 TB: each side is projected to the key columns and
locally deduplicated inside ``map_batches`` (so the shuffle moves at most
one row per distinct key per block, never the input rows), the two sides
union into ONE dataset tagged by side, and a single hash-bucket shuffle
co-locates equal keys; the per-bucket combine is a vectorized pandas
merge — no driver-side collect, no broadcast, works for two large sides.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from .agg import _bucket_of_frame

from belb_ray.util import resolve_num_buckets

_SIDE = "__setop_side"
_BUCKET = "__bucket"


def _tagged_distinct(ds: rd.Dataset, cols: list[str], side: int,
                     rename: dict[str, str] | None) -> rd.Dataset:
    def _fn(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch[cols].drop_duplicates()
        if rename:
            out = out.rename(columns=rename)
        out[_SIDE] = side
        return out

    return ds.map_batches(_fn, batch_format="pandas", batch_size=65536)


def _set_op(a: rd.Dataset, b: rd.Dataset, cols: list[str],
            keep: str, b_cols: list[str] | None,
            num_buckets: int) -> rd.Dataset:
    """Shared EXCEPT/INTERSECT engine. ``keep`` is the pandas merge
    indicator value to retain ('left_only' → EXCEPT, 'both' → INTERSECT).
    """
    rename = dict(zip(b_cols, cols)) if b_cols else None
    both = _tagged_distinct(a, cols, 0, None).union(
        _tagged_distinct(b, b_cols or cols, 1, rename))

    def _bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        batch[_BUCKET] = _bucket_of_frame(batch, cols, num_buckets)
        return batch

    def _combine(group: pd.DataFrame) -> pd.DataFrame:
        da = group.loc[group[_SIDE] == 0, cols].drop_duplicates()
        db = group.loc[group[_SIDE] == 1, cols].drop_duplicates()
        merged = da.merge(db, on=cols, how="left", indicator=True)
        return merged.loc[merged["_merge"] == keep, cols]

    bucketed = both.map_batches(_bucketize, batch_format="pandas",
                                batch_size=1 << 18)
    return bucketed.groupby(_BUCKET).map_groups(_combine,
                                                batch_format="pandas")


def set_except(a: rd.Dataset, b: rd.Dataset, cols: list[str],
               b_cols: list[str] | None = None,
               num_buckets: int = 0) -> rd.Dataset:
    """``SELECT DISTINCT cols FROM a EXCEPT SELECT DISTINCT b_cols FROM
    b`` — distinct keys of ``a`` absent from ``b``. ``b_cols`` maps b's
    column names positionally onto ``cols`` (SQL set ops match by
    position, not name)."""
    num_buckets = resolve_num_buckets(num_buckets)
    return _set_op(a, b, cols, "left_only", b_cols, num_buckets)


def set_intersect(a: rd.Dataset, b: rd.Dataset, cols: list[str],
                  b_cols: list[str] | None = None,
                  num_buckets: int = 0) -> rd.Dataset:
    """``SELECT DISTINCT cols FROM a INTERSECT SELECT ... FROM b``."""
    num_buckets = resolve_num_buckets(num_buckets)
    return _set_op(a, b, cols, "both", b_cols, num_buckets)


def keyed_diff(old: rd.Dataset, new: rd.Dataset, key_cols: list[str],
               compare_cols: list[str],
               num_buckets: int = 0) -> rd.Dataset:
    """CDC-style keyed dataset diff: rows keyed by ``key_cols`` are
    classified ``added`` (key only in ``new``), ``removed`` (only in
    ``old``) or ``changed`` (key on both sides but some ``compare_cols``
    value differs; the output's ``changed_cols`` column lists the
    differing column names, comma-joined in column order). Unchanged
    keys are omitted.

    Shape at 100 TB: both sides project to key+compare columns inside
    ``map_batches``, union into one side-tagged dataset, and ONE
    hash(key)-bucket shuffle co-locates each key's (at most two) rows;
    the per-bucket classify is a vectorized pandas merge — no broadcast,
    no driver collect, works for two large sides. Keys are assumed
    unique per side (it is a keyed table diff, not a multiset diff).
    """
    num_buckets = resolve_num_buckets(num_buckets)
    cols = key_cols + compare_cols

    def _project(ds: rd.Dataset, side: int) -> rd.Dataset:
        def _fn(batch: pd.DataFrame) -> pd.DataFrame:
            out = batch[cols].copy()
            out[_SIDE] = side
            return out

        return ds.map_batches(_fn, batch_format="pandas", batch_size=65536)

    both = _project(old, 0).union(_project(new, 1))

    def _bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        batch[_BUCKET] = _bucket_of_frame(batch, key_cols, num_buckets)
        return batch

    def _classify(group: pd.DataFrame) -> pd.DataFrame:
        da = group.loc[group[_SIDE] == 0, cols]
        db = group.loc[group[_SIDE] == 1, cols]
        m = da.merge(db, on=key_cols, how="outer", indicator=True,
                     suffixes=("__old", "__new"))
        status = np.where(m["_merge"] == "right_only", "added",
                          np.where(m["_merge"] == "left_only", "removed",
                                   "changed"))
        # per-compare-col inequality (NaN-safe: NaN == NaN counts equal)
        diff_any = np.zeros(len(m), dtype=bool)
        changed_cols = np.full(len(m), "", dtype=object)
        for c in compare_cols:
            a_v, b_v = m[f"{c}__old"], m[f"{c}__new"]
            neq = ~((a_v == b_v) | (a_v.isna() & b_v.isna()))
            neq &= (m["_merge"] == "both").to_numpy()
            changed_cols = np.where(
                neq, np.where(changed_cols == "", c,
                              changed_cols + ("," + c)), changed_cols)
            diff_any |= neq.to_numpy()
        keep = (m["_merge"] != "both").to_numpy() | diff_any
        out = m.loc[keep, key_cols].copy()
        out["status"] = status[keep]
        out["changed_cols"] = changed_cols[keep]
        return out

    bucketed = both.map_batches(_bucketize, batch_format="pandas",
                                batch_size=1 << 18)
    return bucketed.groupby(_BUCKET).map_groups(_classify,
                                                batch_format="pandas")


def set_union(a: rd.Dataset, b: rd.Dataset, cols: list[str],
              b_cols: list[str] | None = None,
              num_buckets: int = 0) -> rd.Dataset:
    """``SELECT DISTINCT cols FROM a UNION SELECT ... FROM b`` —
    distinct keys present on EITHER side. Same one-shuffle shape: both
    sides locally dedup, the tagged union co-locates, the per-bucket
    combine is a plain drop_duplicates over the key columns."""
    num_buckets = resolve_num_buckets(num_buckets)
    rename = dict(zip(b_cols, cols)) if b_cols else None
    both = _tagged_distinct(a, cols, 0, None).union(
        _tagged_distinct(b, b_cols or cols, 1, rename))

    def _bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        batch[_BUCKET] = _bucket_of_frame(batch, cols, num_buckets)
        return batch

    def _combine(group: pd.DataFrame) -> pd.DataFrame:
        return group[cols].drop_duplicates()

    return (both.map_batches(_bucketize, batch_format="pandas",
                             batch_size=1 << 18)
            .groupby(_BUCKET).map_groups(_combine, batch_format="pandas"))
