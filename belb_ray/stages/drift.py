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

from belb_ray.util import resolve_num_buckets
from ..util import round_half_away


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
    num_buckets: int = 0,
) -> rd.Dataset:
    """→ one row per bin present on EITHER side:
    (bin, p_ref, p_cand, psi_contrib); Σ psi_contrib is the PSI.

    p_* are exact count/total proportions; the contribution clamps both
    proportions to ``eps`` ((max(p_a,eps) − max(p_b,eps)) ·
    ln(max(p_a,eps)/max(p_b,eps))) — identical arithmetic to the SQL
    mirror. Both histogram tables are bin-count-sized; the join and the
    finish run in one tiny task."""
    num_buckets = resolve_num_buckets(num_buckets)
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
            "p_ref": round_half_away(pa_, round_to),
            "p_cand": round_half_away(pb_, round_to),
            "psi_contrib": round_half_away((ca - cb) * np.log(ca / cb),
                                    round_to)})

    # the union is bin-count-sized — repartition(1) makes the finish one
    # whole-table task without a driver collect
    return both.repartition(1).map_batches(_finish, batch_size=None,
                                           batch_format="pandas")


def chi2_association(
    ds: rd.Dataset,
    col_a: str,
    col_b: str,
    round_to: int = 8,
    num_buckets: int = 0,
) -> rd.Dataset:
    """Chi-squared association between two categorical columns → one row
    per observed contingency cell: (col_a, col_b, observed, expected,
    chi2_contrib) with expected = row_total·col_total/n and contrib =
    (o−e)²/e; Σ chi2_contrib is the test statistic.

    Distributed shape: ONE (a, b) pair-count combiner aggregation over
    the corpus (the only pass that touches rows); marginals derive from
    the category-pair-sized count table, and the finish runs vectorized
    in one tiny task. Exchange is bounded by distinct-pair count."""
    num_buckets = resolve_num_buckets(num_buckets)
    from .agg import preagg_groupby

    pairs = preagg_groupby(ds.select_columns([col_a, col_b]),
                           [col_a, col_b], [("count", "", "observed")],
                           num_buckets)

    def _finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([col_a, col_b], kind="mergesort")
        n = df["observed"].sum()
        ra = df.groupby(col_a)["observed"].transform("sum") \
            .to_numpy(np.float64)
        cb = df.groupby(col_b)["observed"].transform("sum") \
            .to_numpy(np.float64)
        o = df["observed"].to_numpy(np.float64)
        e = ra * cb / max(n, 1)
        return pd.DataFrame({
            col_a: df[col_a].to_numpy(),
            col_b: df[col_b].to_numpy(),
            "observed": df["observed"].to_numpy(np.int64),
            "expected": round_half_away(e, round_to),
            "chi2_contrib": round_half_away((o - e) ** 2 / e, round_to)})

    return pairs.repartition(1).map_batches(_finish, batch_size=None,
                                            batch_format="pandas")


def ks_drift(
    ref: rd.Dataset,
    cand: rd.Dataset,
    value_col: str,
    bin_width: float,
    round_to: int = 8,
    num_buckets: int = 0,
) -> rd.Dataset:
    """Two-sample Kolmogorov–Smirnov drift statistic over fixed-width
    value bins → one row per bin present on EITHER side, in bin order:
    (bin, cdf_ref, cdf_cand, ks_contrib = |cdf_ref − cdf_cand|);
    max(ks_contrib) is the KS statistic, exact over the quantized
    values (quantization error ≤ bin_width, same device as
    ``approx_grouped_quantiles``).

    Distributed shape: each side reduces to a (bin, count) histogram
    with a per-batch combiner and ONE bucketed combine — rows never
    shuffle, the exchange is bin-count-bounded; the cumulative finish
    runs in one bin-count-sized task. Cumulative counts are exact
    integers, so cdf = cum/total is bit-identical to the SQL window
    cumsum mirror."""
    num_buckets = resolve_num_buckets(num_buckets)
    ha = _bin_counts(ref, value_col, bin_width, num_buckets)
    hb = _bin_counts(cand, value_col, bin_width, num_buckets)

    def _tag(side: int):
        def fn(t: pa.Table) -> pa.Table:
            return pa.table({
                "bin": t["bin"], "n": t["n"],
                "__side": pa.array(np.full(t.num_rows, side, np.int8))})

        return fn

    both = (ha.map_batches(_tag(0), batch_format="pyarrow")
            .union(hb.map_batches(_tag(1), batch_format="pyarrow")))

    def _finish(df: pd.DataFrame) -> pd.DataFrame:
        a = df[df["__side"] == 0]
        b = df[df["__side"] == 1]
        na, nb = a["n"].sum(), b["n"].sum()
        m = a.merge(b, on="bin", how="outer", suffixes=("_a", "_b")) \
            .fillna({"n_a": 0, "n_b": 0}).sort_values("bin")
        ca = m["n_a"].to_numpy(np.int64).cumsum() / max(na, 1)
        cb = m["n_b"].to_numpy(np.int64).cumsum() / max(nb, 1)
        return pd.DataFrame({
            "bin": m["bin"].to_numpy(np.int64),
            "cdf_ref": round_half_away(ca, round_to),
            "cdf_cand": round_half_away(cb, round_to),
            "ks_contrib": round_half_away(np.abs(ca - cb), round_to)})

    return both.repartition(1).map_batches(_finish, batch_size=None,
                                           batch_format="pandas")


def _token_counts(ds: rd.Dataset, text_col: str,
                  num_buckets: int) -> rd.Dataset:
    import pyarrow.compute as pc

    def _partial(batch: pa.Table) -> pa.Table:
        toks = pc.list_flatten(
            pc.split_pattern(batch[text_col].combine_chunks(), " "))
        toks = toks.filter(pc.not_equal(toks, ""))
        vc = toks.value_counts()
        return pa.table({"tok": vc.field("values"),
                         "n": pc.cast(vc.field("counts"), pa.int64())})

    partials = ds.select_columns([text_col]).map_batches(
        _partial, batch_format="pyarrow")
    return bucketed_combine(partials, ["tok"], {"n": "sum"}, num_buckets)


def js_divergence(
    ref: rd.Dataset,
    cand: rd.Dataset,
    text_col: str,
    round_to: int = 8,
    num_buckets: int = 0,
) -> rd.Dataset:
    """Jensen–Shannon divergence between the whitespace-token unigram
    distributions of two corpora → one row per token present on EITHER
    side: (tok, p_ref, p_cand, jsd_contrib); Σ jsd_contrib is the JSD
    (symmetric, bounded by ln 2 — the corpus-level drift companion to
    the value-histogram ``psi_drift``, e.g. did this crawl batch's
    vocabulary shift?).

    contrib = ½·p·ln(p/m) + ½·q·ln(q/m) with m = (p+q)/2 and 0·ln 0 = 0
    — no eps clamp needed since m > 0 wherever either side is present;
    identical arithmetic to the SQL mirror.

    Distributed shape: each side reduces to a (token, count) table with
    a per-batch Arrow ``value_counts`` combiner and ONE bucketed
    combine — rows never shuffle, the exchange is vocabulary-bounded.
    The join + finish run in one vocabulary-sized task."""
    num_buckets = resolve_num_buckets(num_buckets)
    ha = _token_counts(ref, text_col, num_buckets)
    hb = _token_counts(cand, text_col, num_buckets)

    def _tag(side: int):
        def fn(t: pa.Table) -> pa.Table:
            return pa.table({
                "tok": t["tok"], "n": t["n"],
                "__side": pa.array(np.full(t.num_rows, side, np.int8))})

        return fn

    both = (ha.map_batches(_tag(0), batch_format="pyarrow")
            .union(hb.map_batches(_tag(1), batch_format="pyarrow")))

    def _finish(df: pd.DataFrame) -> pd.DataFrame:
        a = df[df["__side"] == 0]
        b = df[df["__side"] == 1]
        na, nb = a["n"].sum(), b["n"].sum()
        m = a.merge(b, on="tok", how="outer", suffixes=("_a", "_b")) \
            .fillna({"n_a": 0, "n_b": 0}).sort_values("tok")
        p = m["n_a"].to_numpy(np.float64) / max(na, 1)
        q = m["n_b"].to_numpy(np.float64) / max(nb, 1)
        mid = (p + q) / 2.0
        ps = np.where(p > 0, p, 1.0)
        qs = np.where(q > 0, q, 1.0)
        contrib = (0.5 * np.where(p > 0, p * np.log(ps / mid), 0.0)
                   + 0.5 * np.where(q > 0, q * np.log(qs / mid), 0.0))
        return pd.DataFrame({
            "tok": m["tok"].to_numpy(),
            "p_ref": round_half_away(p, round_to),
            "p_cand": round_half_away(q, round_to),
            "jsd_contrib": round_half_away(contrib, round_to)})

    return both.repartition(1).map_batches(_finish, batch_size=None,
                                           batch_format="pandas")


def mutual_information(
    ds: rd.Dataset,
    col_a: str,
    col_b: str,
    round_to: int = 8,
    num_buckets: int = 0,
) -> rd.Dataset:
    """Mutual information between two categorical columns → one row per
    observed contingency cell: (col_a, col_b, observed, mi_contrib)
    with contrib = p_ab·ln(p_ab / (p_a·p_b)); Σ mi_contrib is I(A;B) in
    nats (the dependence-strength companion to ``chi2_association`` —
    e.g. how much a doc's source tells you about its language).
    Unobserved cells contribute 0 (0·ln 0 = 0) and are not emitted.

    Distributed shape: identical to ``chi2_association`` — ONE (a, b)
    pair-count combiner pass over the rows; marginals and the finish
    derive from the cell-sized table in one tiny vectorized task."""
    num_buckets = resolve_num_buckets(num_buckets)
    from .agg import preagg_groupby

    pairs = preagg_groupby(ds.select_columns([col_a, col_b]),
                           [col_a, col_b], [("count", "", "observed")],
                           num_buckets)

    def _finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([col_a, col_b], kind="mergesort")
        n = float(df["observed"].sum())
        pa_ = df.groupby(col_a)["observed"].transform("sum") \
            .to_numpy(np.float64) / n
        pb_ = df.groupby(col_b)["observed"].transform("sum") \
            .to_numpy(np.float64) / n
        pab = df["observed"].to_numpy(np.float64) / n
        return pd.DataFrame({
            col_a: df[col_a].to_numpy(),
            col_b: df[col_b].to_numpy(),
            "observed": df["observed"].to_numpy(np.int64),
            "mi_contrib": round_half_away(pab * np.log(pab / (pa_ * pb_)),
                                   round_to)})

    return pairs.repartition(1).map_batches(_finish, batch_size=None,
                                            batch_format="pandas")
