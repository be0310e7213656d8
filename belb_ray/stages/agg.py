"""Aggregation helpers.

``preagg_groupby`` implements combiner-style aggregation: partial
aggregates are computed per batch inside ``map_batches`` (one row per key
per batch) and only the partials are shuffled — the pattern the task
demands for 100 TB groupbys. Supported specs: sum, count, min, max, mean
(sum+count recombined), nunique-ish via distinct collection is NOT here
(use groupby.map_groups for that).

``dense_ids`` replaces the reference's arrival-order id assignment
(belb/kbs/ctd_diseases/ctd_diseases.py:120-130, belb/kbs/umls/umls.py:175
— SURVEY §2.4 T2/T3) with a deterministic sort-based assignment: distinct
values sorted, id = rank. ``topk`` = sort + limit.
"""

from __future__ import annotations

import pandas as pd
import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum

AggSpec = tuple[str, str, str]  # (func, in_col, out_col); func: sum|count|min|max|mean


def preagg_groupby(ds: rd.Dataset, keys: list[str], specs: list[AggSpec]) -> rd.Dataset:
    """Partial-aggregate per batch, then a small groupby over partials."""
    need_mean = [(f, c, o) for f, c, o in specs if f == "mean"]
    # expand mean into sum+count partials
    partial_specs: list[AggSpec] = []
    for f, c, o in specs:
        if f == "mean":
            partial_specs.append(("sum", c, f"__msum_{o}"))
            partial_specs.append(("count", c, f"__mcnt_{o}"))
        else:
            partial_specs.append((f, c, o))

    def _partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby(keys, sort=False)
        cols = {}
        for f, c, o in partial_specs:
            if f == "sum":
                cols[o] = g[c].sum()
            elif f == "count":
                cols[o] = g[c if c else keys[0]].size()
            elif f == "min":
                cols[o] = g[c].min()
            elif f == "max":
                cols[o] = g[c].max()
        return pd.DataFrame(cols).reset_index()

    partials = ds.map_batches(_partial, batch_format="pandas", batch_size=65536)

    finals = []
    for f, c, o in partial_specs:
        if f in ("sum", "count"):
            finals.append(Sum(o, alias_name=o))
        elif f == "min":
            finals.append(Min(o, alias_name=o))
        elif f == "max":
            finals.append(Max(o, alias_name=o))
    out = partials.groupby(keys).aggregate(*finals)

    if need_mean:
        def _finish(batch: pd.DataFrame) -> pd.DataFrame:
            for f, c, o in need_mean:
                batch[o] = batch[f"__msum_{o}"] / batch[f"__mcnt_{o}"]
                batch = batch.drop(columns=[f"__msum_{o}", f"__mcnt_{o}"])
            return batch

        out = out.map_batches(_finish, batch_format="pandas")
    return out


def count_distinct(ds: rd.Dataset, keys: list[str], distinct_col: str, out_col: str) -> rd.Dataset:
    """count(distinct x) per key: batch-local dedup → global dedup on
    (keys, x) → count per key. Two small shuffles, no row explosion."""
    cols = keys + [distinct_col]

    def _dedup(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[cols].drop_duplicates()

    dd = ds.map_batches(_dedup, batch_format="pandas", batch_size=65536)
    dd = dd.groupby(cols).aggregate(Count(alias_name="__c"))
    return dd.groupby(keys).aggregate(Count(alias_name=out_col))


def dense_ids(ds: rd.Dataset, col: str, out_col: str = "internal_identifier") -> pd.DataFrame:
    """Deterministic dense int ids for the distinct values of ``col``:
    sorted order = rank (0-based). The distinct set is assumed driver-small
    (it is a vocabulary / id-space, not the corpus). Returns a DataFrame."""
    vals = sorted(ds.unique(col))
    return pd.DataFrame({col: vals, out_col: range(len(vals))})


def topk(ds: rd.Dataset, key: str, k: int, descending: bool = True,
         tiebreak: str | None = None) -> rd.Dataset:
    """Top-k by key with deterministic tie-break column."""
    cols = [key] if tiebreak is None else [key, tiebreak]
    desc = [descending] + ([False] if tiebreak else [])
    return ds.sort(cols, descending=desc if len(cols) > 1 else descending).limit(k)
