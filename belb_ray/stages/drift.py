"""Distribution-drift detection between two dataset slices.

The data-monitoring step of a continuously-ingesting training pipeline:
compare a reference slice against a candidate slice (new crawl batch,
new time window) and quantify shift per histogram bin via the
population stability index, PSI = Σ_b (p_a − p_b)·ln(p_a / p_b), with
proportions clamped to ``eps`` so empty bins stay finite (the standard
industry formulation).

Distributed shape: each side reduces to a (bin, count) histogram with a
per-batch ``value_counts`` combiner and ONE bucketed combine — rows
never shuffle, the exchange is bin-width-bounded regardless of input
cardinality (the ``approx_grouped_quantiles`` device). The finish joins
the two bin tables (tiny) and computes contributions vectorized. Bins
are fixed-width ``floor(value / bin_width)`` so the SQL oracle mirrors
the arithmetic expression-for-expression.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from .agg import bucketed_combine


def _bin_counts(ds: rd.Dataset, value_col: str, bin_width: float,
                num_buckets: int) -> rd.Dataset:
    def _partial(batch: pa.Table) -> pa.Table:
        v = batch[value_col].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        bins = np.floor(v / bin_width).astype(np.int64)
        vc = pd.Series(bins).value_counts()
        return pa.table({"bin": pa.array(vc.index.to_numpy(), pa.int64()),
                         "n": pa.array(vc.to_numpy(), pa.int64())})

    partials = ds.select_columns([value_col]).map_batches(
        _partial, batch_format="pyarrow")
    return bucketed_combine(partials, ["bin"], {"n": "sum"}, num_buckets)


def psi_drift(
    ref: rd.Dataset,
    cand: rd.Dataset,
    value_col: str,
    bin_width: float,
    eps: float = 1e-6,
    round_to: int = 8,
    num_buckets: int = 16,
) -> rd.Dataset:
    """→ one row per bin present on EITHER side:
    (bin, p_ref, p_cand, psi_contrib); Σ psi_contrib is the PSI.

    p_* are exact count/total proportions; the contribution clamps both
    proportions to ``eps`` ((max(p_a,eps) − max(p_b,eps)) ·
    ln(max(p_a,eps)/max(p_b,eps))) — identical arithmetic to the SQL
    mirror. Both histogram tables are bin-count-sized; the join and the
    finish run in one tiny task."""
    ha = _bin_counts(ref, value_col, bin_width, num_buckets)
    hb = _bin_counts(cand, value_col, bin_width, num_buckets)

    def _tag(side: int):
        def fn(t: pa.Table) -> pa.Table:
            return pa.table({
                "bin": t["bin"], "n": t["n"],
                "__side": pa.array(
                    np.full(t.num_rows, side, np.int8))})

        return fn

    both = (ha.map_batches(_tag(0), batch_format="pyarrow")
            .union(hb.map_batches(_tag(1), batch_format="pyarrow")))

    def _finish(df: pd.DataFrame) -> pd.DataFrame:
        a = df[df["__side"] == 0]
        b = df[df["__side"] == 1]
        na, nb = a["n"].sum(), b["n"].sum()
        m = a.merge(b, on="bin", how="outer", suffixes=("_a", "_b")) \
            .fillna({"n_a": 0, "n_b": 0}).sort_values("bin")
        pa_ = m["n_a"].to_numpy(np.float64) / max(na, 1)
        pb_ = m["n_b"].to_numpy(np.float64) / max(nb, 1)
        ca = np.maximum(pa_, eps)
        cb = np.maximum(pb_, eps)
        return pd.DataFrame({
            "bin": m["bin"].to_numpy(np.int64),
            "p_ref": np.round(pa_, round_to),
            "p_cand": np.round(pb_, round_to),
            "psi_contrib": np.round((ca - cb) * np.log(ca / cb),
                                    round_to)})

    # the union is bin-count-sized — repartition(1) makes the finish one
    # whole-table task without a driver collect
    return both.repartition(1).map_batches(_finish, batch_size=None,
                                           batch_format="pandas")
