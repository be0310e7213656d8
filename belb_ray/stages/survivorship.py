"""Golden-record survivorship: per-cluster attribute consolidation.

After entity resolution groups rows into clusters, a "golden record"
per cluster keeps one surviving value per attribute under a per-column
rule — the canonicalization step the reference performs when it picks
one name per identifier group (belb/kbs/kb.py synset preferred-name
selection; SURVEY §2.5 A1/A8's symbol-wins dedup generalized to
arbitrary rules).

Rules (all deterministic, SQL-re-derivable):

- ``mode``    — most frequent value; ties broken by MIN value.
- ``longest`` — longest string; ties broken by MIN value.
- ``max`` / ``min`` — plain extrema (numeric, string, or timestamp;
  timestamps: latest / earliest).

Scale shape: one partial pass per batch collapses rows to
(cluster, value) partials per rule column, then ONE bucketed
single-int shuffle combines per cluster — the ``agg.py`` combiner
pattern; no composite-key native groupby, no driver materialization.
Values travel in dtype-specific sidecar columns (string / float64 /
int64-epoch-us) so extrema order numerically, never lexically.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from belb_ray.stages.agg import _bucket_of_frame, guard_bucket_rows

from belb_ray.util import resolve_num_buckets

_RULES = ("mode", "longest", "max", "min")


def _pack_value(d: pd.DataFrame, col: str) -> pd.DataFrame:
    """Route ``col`` into the dtype-matched sidecar (__vs/__vn/__vt)."""
    s = d[col]
    d = d.drop(columns=[col])
    d["__vs"] = None
    d["__vn"] = np.nan
    d["__vt"] = np.int64(0)
    d["__k"] = "s"
    if pd.api.types.is_datetime64_any_dtype(s):
        # normalize to epoch NANOSECONDS regardless of input resolution
        d["__vt"] = s.to_numpy().astype("datetime64[ns]").astype("int64")
        d["__k"] = "t"
    elif pd.api.types.is_numeric_dtype(s):
        d["__vn"] = s.astype("float64")
        d["__k"] = "n"
    else:
        d["__vs"] = s.astype(str)
    return d


def golden_records(ds: rd.Dataset, cluster_col: str,
                   rules: dict[str, str], num_buckets: int = 0,
                   max_bucket_rows: int | None = 50_000_000) -> rd.Dataset:
    """One row per ``cluster_col`` value with each rule column replaced
    by its surviving value. ``rules`` maps column -> rule name. Output
    column order: cluster, then rule columns in ``rules`` order; dtypes
    are preserved for numeric/timestamp extrema, string otherwise."""
    num_buckets = resolve_num_buckets(num_buckets)
    bad = set(rules.values()) - set(_RULES)
    if bad:
        raise ValueError(f"golden_records: unknown rules {sorted(bad)}")
    cols = [cluster_col] + list(rules)

    def _partial(batch: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for c, rule in rules.items():
            if rule == "mode":
                g = (batch.groupby([cluster_col, c], sort=False)
                     .size().rename("__n").reset_index())
                g = _pack_value(g, c)
            elif rule == "longest":
                d = batch[[cluster_col, c]].copy()
                d["__len"] = d[c].str.len()
                d = d.sort_values(["__len", c], ascending=[False, True])
                d = d.drop_duplicates(cluster_col, keep="first")
                d = d.drop(columns="__len")
                d["__n"] = np.int64(0)
                g = _pack_value(d, c)
            else:  # max / min
                gb = batch.groupby(cluster_col, sort=False)[c]
                s = gb.max() if rule == "max" else gb.min()
                d = s.reset_index()
                d["__n"] = np.int64(0)
                g = _pack_value(d, c)
            g["__col"] = c
            frames.append(g)
        out = pd.concat(frames, ignore_index=True)
        return out[[cluster_col, "__col", "__k", "__vs", "__vn", "__vt",
                    "__n"]]

    def _bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        batch["__bucket"] = _bucket_of_frame(batch, [cluster_col],
                                             num_buckets)
        return batch

    def _combine(group: pd.DataFrame) -> pd.DataFrame:
        guard_bucket_rows(group, cluster_col, max_bucket_rows,
                          "golden_records")
        g = group.drop(columns="__bucket")
        outs: dict[str, pd.Series] = {}
        for c, rule in rules.items():
            d = g[g["__col"] == c]
            kind = d["__k"].iloc[0] if len(d) else "s"
            vcol = {"s": "__vs", "n": "__vn", "t": "__vt"}[kind]
            if rule == "mode":
                d = (d.groupby([cluster_col, vcol], sort=False)["__n"]
                     .sum().reset_index())
                d = d.sort_values(["__n", vcol],
                                  ascending=[False, True])
                s = d.drop_duplicates(cluster_col, keep="first") \
                     .set_index(cluster_col)[vcol]
            elif rule == "longest":
                d = d.copy()
                d["__len"] = d[vcol].str.len()
                d = d.sort_values(["__len", vcol],
                                  ascending=[False, True])
                s = d.drop_duplicates(cluster_col, keep="first") \
                     .set_index(cluster_col)[vcol]
            else:
                gb = d.groupby(cluster_col, sort=False)[vcol]
                s = gb.max() if rule == "max" else gb.min()
            if kind == "t":
                s = pd.to_datetime(s, unit="ns")  # back from epoch ns
            outs[c] = s
        res = pd.DataFrame(outs).reset_index()
        res = res.rename(columns={"index": cluster_col})
        return res[cols]

    partials = ds.map_batches(_partial, batch_format="pandas",
                              batch_size=1 << 16)
    bucketed = partials.map_batches(_bucketize, batch_format="pandas",
                                    batch_size=1 << 18)
    return bucketed.groupby("__bucket").map_groups(_combine,
                                                   batch_format="pandas")
