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
import pyarrow as pa
import ray.data as rd

from ..util import resolve_num_buckets
from ..util import round_half_away

# (kind, value_col, out_col) or (kind, value_col, out_col, param);
# kind: lag | lead | cumsum | row_number | rollsum | rollmin | rollmax
#       | rank | dense_rank | ntile | first_value | last_value
#       | percent_rank | cume_dist | nth_value.
# value_col is ignored for row_number and ntile; param is window_rows
# (the N of SQL ``ROWS BETWEEN N-1 PRECEDING AND CURRENT ROW``) for
# roll*, the tile count for ntile, and the 1-based N for nth_value.
# rank/dense_rank/percent_rank/cume_dist tie on equal ``value_col`` runs
# — value_col must be a PREFIX of ``order_cols`` (SQL
# ``RANK() OVER (... ORDER BY value_col)``; the remaining order_cols act
# only as the deterministic tiebreak). first_value/last_value/nth_value
# use the full-partition frame (SQL ``ROWS BETWEEN UNBOUNDED PRECEDING
# AND UNBOUNDED FOLLOWING``); nth_value is null when the partition has
# fewer than N rows (int64-with-null output, pandas ``Int64``).
WindowSpec = tuple


def ordered_window(
    events: rd.Dataset,
    key: str,
    order_cols: list[str],
    specs: list[WindowSpec],
    num_buckets: int = 0,
    max_bucket_rows: int | None = 8_000_000,
) -> rd.Dataset:
    """→ input columns + one output column per spec, computed per key in
    ``order_cols`` order (SQL ``OVER (PARTITION BY key ORDER BY ...)``).

    lag/lead default offset 1, null at partition edges; cumsum is the
    running inclusive sum (``ROWS UNBOUNDED PRECEDING``); row_number is
    1-based.

    A bucket larger than ``max_bucket_rows`` fails LOUDLY naming the
    hottest key (instead of a silent worker OOM) — raise num_buckets,
    pre-salt the pathological key, or raise the budget.
    """
    num_buckets = resolve_num_buckets(num_buckets)
    for spec in specs:
        if spec[0] not in ("lag", "lead", "cumsum", "row_number",
                           "rollsum", "rollmin", "rollmax", "rank",
                           "dense_rank", "ntile", "first_value",
                           "last_value", "percent_rank", "cume_dist",
                           "nth_value"):
            raise ValueError(f"unknown window kind: {spec[0]}")
        if (spec[0].startswith("roll") or spec[0] in ("ntile", "nth_value")
                ) and (len(spec) < 4 or spec[3] < 1):
            raise ValueError(f"{spec[0]} needs a positive count param")

    def _bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_array(batch[key].to_numpy(), categorize=False)
        batch["__bucket"] = (h % np.uint64(num_buckets)).astype(np.int32)
        return batch

    def _windows(group: pd.DataFrame) -> pd.DataFrame:
        from .agg import guard_bucket_rows

        guard_bucket_rows(group, key, max_bucket_rows, "ordered_window")
        g = (group.drop(columns="__bucket")
                  .sort_values([key] + order_cols, kind="stable")
                  .reset_index(drop=True))
        ks = g[key].to_numpy()
        # True at the first row of each key-partition
        new_key = np.r_[True, ks[1:] != ks[:-1]]
        pid = np.cumsum(new_key) - 1  # partition index per row
        idx = np.arange(len(g), dtype=np.int64)
        part_start = idx[new_key][pid]  # index of each row's partition head
        for spec in specs:
            kind, vcol, out = spec[0], spec[1], spec[2]
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
            elif kind == "rollsum":
                # SQL ROWS BETWEEN w-1 PRECEDING AND CURRENT ROW, clamped
                # at partition heads; exact for int64 (use integer units
                # for SQL hash parity — float subtraction reassociates)
                w = int(spec[3])
                v = g[vcol].to_numpy()
                cs0 = np.concatenate((np.zeros(1, v.dtype), np.cumsum(v)))
                j = np.maximum(part_start, idx - w + 1)
                g[out] = cs0[idx + 1] - cs0[j]
            elif kind in ("rank", "dense_rank", "percent_rank",
                          "cume_dist"):
                # ties = runs of equal vcol within a key (vcol is an
                # order_cols prefix, so runs are contiguous after sort)
                v = g[vcol].to_numpy()
                new_tie = new_key | np.r_[True, v[1:] != v[:-1]]
                if kind == "dense_rank":
                    t = np.cumsum(new_tie)
                    g[out] = t - t[new_key][pid] + 1
                elif kind == "cume_dist":
                    # SQL: (# peers ordered <= current) / partition rows
                    # = 1-based index of the LAST row of the tie run
                    last_tie = np.r_[new_tie[1:], True]
                    tid = np.cumsum(new_tie) - 1
                    tie_end = idx[last_tie][tid]
                    plast = np.r_[new_key[1:], True]
                    part_len = idx[plast][pid] - part_start + 1
                    g[out] = ((tie_end - part_start + 1).astype(np.float64)
                              / part_len)
                else:
                    # start index of each tie run, per row
                    tie_start = np.maximum.accumulate(
                        np.where(new_tie, idx, 0))
                    rnk = tie_start - part_start + 1
                    if kind == "rank":
                        g[out] = rnk
                    else:  # percent_rank = (rank-1)/(rows-1), 0 if rows=1
                        plast = np.r_[new_key[1:], True]
                        part_len = idx[plast][pid] - part_start + 1
                        denom = np.maximum(part_len - 1, 1)
                        g[out] = (rnk - 1).astype(np.float64) / denom
            elif kind == "nth_value":
                # full-partition frame; null when partition < N rows
                n = int(spec[3])
                v = g[vcol].to_numpy()
                plast = np.r_[new_key[1:], True]
                part_end = idx[plast][pid]
                pos = part_start + n - 1
                valid = pos <= part_end
                vals = v[np.minimum(pos, len(g) - 1)]
                if np.issubdtype(vals.dtype, np.integer):
                    g[out] = pd.arrays.IntegerArray(
                        vals.astype(np.int64), mask=~valid)
                else:
                    g[out] = np.where(valid, vals.astype(np.float64),
                                      np.nan)
            elif kind == "ntile":
                # SQL NTILE(n): first (len % n) tiles get ceil(len/n)
                # rows, the rest floor(len/n)
                n = int(spec[3])
                last = np.r_[new_key[1:], True]
                part_len = idx[last][pid] - part_start + 1
                rn0 = idx - part_start
                qa, ra = part_len // n, part_len % n
                cut = ra * (qa + 1)
                g[out] = np.where(
                    rn0 < cut, rn0 // (qa + 1) + 1,
                    ra + (rn0 - cut) // np.maximum(qa, 1) + 1)
            elif kind in ("first_value", "last_value"):
                v = g[vcol].to_numpy()
                if kind == "first_value":
                    g[out] = v[part_start]
                else:
                    last = np.r_[new_key[1:], True]
                    g[out] = v[idx[last][pid]]
            elif kind in ("rollmin", "rollmax"):
                # pandas grouped rolling: O(n) monotonic-deque Cython
                # kernel per partition, order-preserving under sort=False
                w = int(spec[3])
                r = g.groupby(pid, sort=False)[vcol].rolling(
                    window=w, min_periods=1)
                vals = (r.min() if kind == "rollmin" else r.max()
                        ).reset_index(drop=True)
                g[out] = vals.to_numpy().astype(g[vcol].dtype)
            else:  # row_number
                g[out] = idx - part_start + 1
        return g

    bucketed = events.map_batches(_bucketize, batch_format="pandas",
                                  batch_size=1 << 17)
    return bucketed.groupby("__bucket").map_groups(_windows,
                                                   batch_format="pandas")


def grouped_quantiles(
    ds: rd.Dataset,
    key: str,
    value_col: str,
    specs: list[tuple[float, str]],
    num_buckets: int = 0,
    interpolate: bool = False,
) -> rd.Dataset:
    """Exact per-key discrete quantiles (SQL ``quantile_disc`` /
    ``percentile_disc``: the element at 0-based index
    ``max(ceil(q·n) - 1, 0)`` of the key's sorted values) → one row per
    key with one column per ``(q, out_col)`` spec. With
    ``interpolate=True`` it is instead ``quantile_cont`` /
    ``percentile_cont``: linear interpolation at 0-based fractional rank
    ``h = q·(n−1)`` between the two bracketing sorted elements — same
    histogram shuffle, the selection just gathers two ranks per key and
    blends (callers should round before hash-comparing to SQL).

    Scale shape: a per-block ``(key, value) → count`` combiner runs
    BEFORE the shuffle, so the exchange moves distinct pairs, not rows —
    a hot key with a billion rows but bounded value cardinality ships
    only its histogram. Selection is then a rank lookup over cumulative
    counts, vectorized across ALL keys of a bucket at once with the same
    merge-rank trick as the interval join (no per-key dispatch). Nulls
    in ``value_col`` are ignored (SQL aggregate semantics). The
    partitioning assumption is one key's *histogram* fits a worker —
    far weaker than fitting its rows."""
    num_buckets = resolve_num_buckets(num_buckets)
    import math

    from .rangejoin import _group_upper_bound

    def _combine(batch: pd.DataFrame) -> pd.DataFrame:
        c = (batch[[key, value_col]].dropna(subset=[value_col])
             .groupby([key, value_col], sort=False, observed=True)
             .size().reset_index(name="__cnt"))
        h = pd.util.hash_array(c[key].to_numpy(), categorize=False)
        c["__bucket"] = (h % np.uint64(num_buckets)).astype(np.int32)
        return c

    def _select(group: pd.DataFrame) -> pd.DataFrame:
        g = (group.drop(columns="__bucket")
                  .groupby([key, value_col], sort=False, observed=True)
                  ["__cnt"].sum().reset_index()
                  .sort_values([key, value_col], kind="stable")
                  .reset_index(drop=True))
        ks = g[key].to_numpy()
        new_key = np.r_[True, ks[1:] != ks[:-1]]
        gid = np.cumsum(new_key) - 1
        cnt = g["__cnt"].to_numpy()
        cum = np.cumsum(cnt)
        # per-key cumulative count (reset at key boundaries)
        cum_in = cum - (cum - cnt)[new_key][gid]
        n_per_key = cum_in[np.r_[new_key[1:], True]]
        uk = g[key].to_numpy()[new_key]
        vals = g[value_col].to_numpy()
        out = {key: uk}
        kid = np.arange(len(uk), dtype=np.int64)
        for q, name in specs:
            if interpolate:
                # fractional 0-based rank h = q·(n−1); gather the two
                # bracketing ranks (1-based lo+1, lo+2 clamped) and blend
                h = q * (n_per_key - 1).astype(np.float64)
                lo = np.floor(h).astype(np.int64)
                frac = h - lo
                t_lo = lo + 1
                t_hi = np.minimum(lo + 2, n_per_key)
                p_lo = _group_upper_bound(gid, cum_in, kid, t_lo - 1)
                p_hi = _group_upper_bound(gid, cum_in, kid, t_hi - 1)
                v_lo = vals[p_lo].astype(np.float64)
                v_hi = vals[p_hi].astype(np.float64)
                out[name] = v_lo + frac * (v_hi - v_lo)
            else:
                # target rank (1-based) of the q-quantile element per key
                tgt = np.maximum(
                    np.ceil(q * n_per_key - 1e-9).astype(np.int64), 1)
                # first histogram position with cum_in >= tgt, across all
                # keys at once: count entries with cum_in <= tgt-1
                pos = _group_upper_bound(gid, cum_in, kid, tgt - 1)
                out[name] = vals[pos]
        return pd.DataFrame(out)

    partial = ds.map_batches(_combine, batch_format="pandas",
                             batch_size=1 << 17)
    return partial.groupby("__bucket").map_groups(_select,
                                                  batch_format="pandas")


def grouped_string_agg(
    ds: rd.Dataset,
    key: str,
    value_col: str,
    order_cols: list[str],
    sep: str = ",",
    out_col: str = "agg",
    num_buckets: int = 0,
) -> rd.Dataset:
    """Ordered per-key string concatenation — SQL
    ``string_agg(value_col, sep ORDER BY order_cols) GROUP BY key`` →
    one row per key with ``out_col``.

    Same single co-location shuffle as ``ordered_window``: hash-bucket
    the key, one ``groupby(__bucket)``, then one stable whole-bucket
    sort by (key, order_cols). Concatenation itself is inherently
    O(output bytes) — pandas' grouped ``sep.join`` walks each group's
    Python strings once, which is the information-theoretic floor for
    this op, so there is no vectorized kernel to prefer. ``order_cols``
    must end in a total-order tiebreak for a deterministic result (same
    contract as ``ordered_window``). Partitioning assumption: one key's
    rows (and its output string) fit a worker — same caveat as
    sessionization; a key with gigabytes of values needs a hierarchical
    concat instead."""

    num_buckets = resolve_num_buckets(num_buckets)
    def _bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch[[key, value_col] + order_cols]
        h = pd.util.hash_array(batch[key].to_numpy(), categorize=False)
        batch = batch.copy()
        batch["__bucket"] = (h % np.uint64(num_buckets)).astype(np.int32)
        return batch

    def _concat(group: pd.DataFrame) -> pd.DataFrame:
        g = (group.drop(columns="__bucket")
                  .sort_values([key] + order_cols, kind="stable"))
        out = (g.groupby(key, sort=False)[value_col]
                .agg(sep.join).reset_index(name=out_col))
        return out

    bucketed = ds.map_batches(_bucketize, batch_format="pandas",
                              batch_size=1 << 17)
    return bucketed.groupby("__bucket").map_groups(_concat,
                                                   batch_format="pandas")


def _attach_small(ds: rd.Dataset, side: rd.Dataset, key: str,
                  broadcast_threshold: int = 2_000_000,
                  join_type: str = "inner") -> rd.Dataset:
    """Attach a per-key side table (one row per key) to every row:
    broadcast join when the side is small (one ray.put, zero shuffles),
    hash-partition join past the threshold — same size-guard policy as
    scoring.attach_features."""
    from .joins import broadcast_join, hash_partition_join

    side = side.materialize()  # consumed for count + join; tiny by contract
    if side.count() <= broadcast_threshold:
        return broadcast_join(ds, side, keys=key, join_type=join_type)
    return hash_partition_join(ds, side, key=key, join_type=join_type)


def grouped_mad(ds: rd.Dataset, key: str, value_col: str,
                out_col: str = "mad",
                num_buckets: int = 0,
                broadcast_threshold: int = 2_000_000) -> rd.Dataset:
    """Per-key median absolute deviation (discrete medians, SQL
    ``quantile_disc`` semantics): two histogram-shuffle quantile passes
    — per-key median, attach (broadcast when the key table is small),
    |x − median|, median again. Input rows are read twice but never
    shuffled; both quantile exchanges move (key, value)-count histograms
    only."""
    num_buckets = resolve_num_buckets(num_buckets)
    med = grouped_quantiles(ds, key, value_col, [(0.5, "__med")],
                            num_buckets)
    withmed = _attach_small(ds, med, key, broadcast_threshold)

    def _absdev(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            key: batch[key],
            "__absdev": (batch[value_col] - batch["__med"]).abs(),
        })

    dev = withmed.map_batches(_absdev, batch_format="pandas",
                              batch_size=1 << 17)
    return grouped_quantiles(dev, key, "__absdev", [(0.5, out_col)],
                             num_buckets)


def normalize_by_group(ds: rd.Dataset, key: str, value_col: str,
                       out_col: str = "z", ddof: int = 1,
                       num_buckets: int = 0,
                       broadcast_threshold: int = 2_000_000) -> rd.Dataset:
    """Per-group z-score standardization — the compute-stats-then-apply
    ML-preprocessing shape: one combiner moment pass (fixed-width
    partials), the per-key (mean, std) table attaches back via the same
    size-guarded broadcast, and the rescale streams. Groups with fewer
    than ddof+1 rows get a null z (matches SQL stddev_samp)."""
    num_buckets = resolve_num_buckets(num_buckets)
    from .agg import moment_stats

    stats = moment_stats(ds, [key], value_col, ddof=ddof,
                         num_buckets=num_buckets)

    def _slim(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[[key, "mean", "std", "n"]]

    withstats = _attach_small(ds, stats.map_batches(
        _slim, batch_format="pandas"), key, broadcast_threshold)

    def _z(batch: pd.DataFrame) -> pd.DataFrame:
        std = batch["std"].to_numpy(dtype=np.float64)
        ok = (batch["n"].to_numpy() > ddof) & (std > 0.0)
        z = np.where(ok, (batch[value_col] - batch["mean"]) / std, np.nan)
        out = batch.drop(columns=["mean", "std", "n"]).copy()
        out[out_col] = z
        return out

    return withstats.map_batches(_z, batch_format="pandas",
                                 batch_size=1 << 17)


def approx_grouped_quantiles(ds: rd.Dataset, key: str, value_col: str,
                             specs: list[tuple[float, str]],
                             bin_width: float,
                             num_buckets: int = 0) -> rd.Dataset:
    """Bounded-memory approximate quantiles: values are quantized to
    fixed ``bin_width`` bins (lower edge) BEFORE the exact histogram
    machinery, so the shuffled (key, value)→count histogram is bounded
    by value-range/bin_width per key regardless of input cardinality —
    the scale path when :func:`grouped_quantiles`'s exact histogram
    would blow up on high-cardinality floats (error ≤ bin_width,
    deterministic, SQL-mirrorable as quantile_disc over the same
    quantized values)."""
    num_buckets = resolve_num_buckets(num_buckets)
    if bin_width <= 0:
        raise ValueError("bin_width must be positive")

    def _quantize(batch: pd.DataFrame) -> pd.DataFrame:
        v = batch[value_col].to_numpy(dtype=np.float64)
        return pd.DataFrame({
            key: batch[key],
            value_col: np.floor(v / bin_width) * bin_width,
        })

    q = ds.map_batches(_quantize, batch_format="pandas",
                       batch_size=1 << 17)
    return grouped_quantiles(q, key, value_col, specs, num_buckets)


def equi_depth_buckets(ds: rd.Dataset, value_col: str, n_buckets: int,
                       out_col: str = "bucket",
                       num_buckets: int = 0) -> rd.Dataset:
    """Global equi-depth (quantile) bucketing: rows are labeled 1..n by
    which inter-quantile range their value falls in. Boundaries are the
    discrete q=i/n quantiles (i=1..n−1) computed with the histogram
    machinery (one fixed-width exchange), then broadcast — the
    assignment pass is a streaming vectorized searchsorted, so input
    rows never shuffle. Values equal to a boundary go to the LOWER
    bucket (SQL mirror: 1 + count of boundaries strictly below the
    value), which also means duplicated boundary values collapse ties
    deterministically rather than splitting them by row order."""
    num_buckets = resolve_num_buckets(num_buckets)
    import ray

    if n_buckets < 2:
        raise ValueError("n_buckets must be >= 2")

    def _tag(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"__g": np.int8(0),
                             value_col: batch[value_col]})

    specs = [(i / n_buckets, f"__q{i}") for i in range(1, n_buckets)]
    qrow = grouped_quantiles(
        ds.map_batches(_tag, batch_format="pandas", batch_size=1 << 17),
        "__g", value_col, specs, num_buckets).to_pandas()
    bounds = np.sort(qrow.iloc[0][[c for _, c in specs]]
                     .to_numpy(dtype=np.float64))
    ref = ray.put(bounds)

    def _assign(batch: pd.DataFrame) -> pd.DataFrame:
        b = ray.get(ref)
        v = batch[value_col].to_numpy(dtype=np.float64)
        batch[out_col] = (np.searchsorted(b, v, side="left") + 1).astype(
            np.int32)
        return batch

    return ds.map_batches(_assign, batch_format="pandas",
                          batch_size=1 << 17)


def winsorize_by_group(ds: rd.Dataset, key: str, value_col: str,
                       lo: float = 0.05, hi: float = 0.95,
                       out_col: str | None = None,
                       num_buckets: int = 0,
                       broadcast_threshold: int = 2_000_000) -> rd.Dataset:
    """Per-group winsorization (outlier clipping): values clip to the
    group's [lo, hi] discrete quantiles — the standard robust-cleaning
    transform before training-statistics. One histogram quantile
    exchange produces the per-key bounds (fixed width), the bounds
    attach back via the size-guarded broadcast, and the clip streams.
    SQL mirror: least(greatest(v, q_lo), q_hi) with quantile_disc."""
    num_buckets = resolve_num_buckets(num_buckets)
    if not (0.0 <= lo <= hi <= 1.0):
        raise ValueError("need 0 <= lo <= hi <= 1")
    out_col = out_col or value_col
    bounds = grouped_quantiles(ds, key, value_col,
                               [(lo, "__qlo"), (hi, "__qhi")], num_buckets)
    withb = _attach_small(ds, bounds, key, broadcast_threshold)

    def _clip(batch: pd.DataFrame) -> pd.DataFrame:
        v = batch[value_col].to_numpy(dtype=np.float64)
        out = batch.drop(columns=["__qlo", "__qhi"]).copy()
        out[out_col] = np.clip(v, batch["__qlo"], batch["__qhi"])
        return out

    return withb.map_batches(_clip, batch_format="pandas",
                             batch_size=1 << 17)


def transition_counts(events: rd.Dataset, key: str,
                      order_cols: list[str], state_col: str,
                      num_buckets: int = 0) -> rd.Dataset:
    """Markov transition matrix over a keyed event stream: counts of
    consecutive (from_state → to_state) pairs, where "consecutive" is
    per ``key`` in ``order_cols`` order (SQL: ``lead(state) OVER
    (PARTITION BY key ORDER BY ...)`` then GROUP BY pair).

    Shape at 100 TB: ONE hash(key)-bucket co-location shuffle of the
    projected (key, order, state) rows; the per-bucket pass is a whole-
    bucket stable sort + one shifted compare (no per-key dispatch, works
    for string states — unlike the float64 ``lead`` kernel in
    ``ordered_window``); each bucket emits per-pair COUNTS, so the final
    combine moves at most |states|² fixed-width rows per bucket."""
    num_buckets = resolve_num_buckets(num_buckets)
    from .agg import _bucket_of_frame, bucketed_combine

    cols = [key] + order_cols + [state_col]

    def _project(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[cols]

    def _bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        batch["__bucket"] = _bucket_of_frame(batch, [key], num_buckets)
        return batch

    def _pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = (group.drop(columns="__bucket")
                  .sort_values([key] + order_cols, kind="stable")
                  .reset_index(drop=True))
        if len(g) < 2:
            return pd.DataFrame({"from_state": [], "to_state": [],
                                 "n": pd.Series([], dtype=np.int64)})
        ks = g[key].to_numpy()
        st = g[state_col].to_numpy()
        same_key = ks[1:] == ks[:-1]
        pairs = pd.DataFrame({"from_state": st[:-1][same_key],
                              "to_state": st[1:][same_key]})
        out = (pairs.groupby(["from_state", "to_state"], sort=False)
               .size().rename("n").reset_index())
        return out

    bucketed = (events.map_batches(_project, batch_format="pandas",
                                   batch_size=1 << 17)
                .map_batches(_bucketize, batch_format="pandas",
                             batch_size=1 << 18))
    partial = bucketed.groupby("__bucket").map_groups(
        _pairs, batch_format="pandas")
    out = bucketed_combine(partial, ["from_state", "to_state"],
                           {"n": "sum"}, num_buckets=16)
    return out.map_batches(
        lambda b: b.assign(n=b["n"].astype(np.int64)),
        batch_format="pandas")


def impute_by_group(ds: rd.Dataset, key: str, value_col: str,
                    out_col: str | None = None, scale: float = 100.0,
                    num_buckets: int = 0,
                    broadcast_threshold: int = 2_000_000) -> rd.Dataset:
    """Null repair: fill ``value_col`` nulls with the per-key mean of the
    non-null values (groups that are all-null stay null) — the
    compute-stats-then-apply shape of ``normalize_by_group``. Values snap
    to integer units (``round(v·scale)``) for the partial sums so the
    distributed mean is exact and combine-order-independent; imputed
    values are unit-mean / scale.

    Scale shape: fixed-width (Σunits, n_nonnull) partials per key×block →
    one bucketed combine → the tiny per-key mean table broadcasts back
    (hash-join fallback past the threshold); data rows never shuffle."""
    num_buckets = resolve_num_buckets(num_buckets)
    from .agg import bucketed_combine

    out_col = out_col or f"{value_col}_imputed"

    # a block whose value slice is ALL null gets Arrow type `null` from
    # the pandas→arrow conversion, which the join kernel rejects — pin
    # the column to float64 up front
    import pyarrow as pa
    import pyarrow.compute as pc

    def _pin_f64(batch: pa.Table) -> pa.Table:
        i = batch.column_names.index(value_col)
        col = batch[value_col]
        if pa.types.is_null(col.type):
            return batch.set_column(i, value_col,
                                    pa.nulls(len(batch), pa.float64()))
        if col.type != pa.float64():
            return batch.set_column(i, value_col,
                                    pc.cast(col, pa.float64()))
        return batch

    ds = ds.map_batches(_pin_f64, batch_format="pyarrow")

    def _partial(batch: pd.DataFrame) -> pd.DataFrame:
        v = batch[value_col].to_numpy(dtype=np.float64)
        ok = ~np.isnan(v)
        units = np.zeros(len(v), dtype=np.int64)
        units[ok] = round_half_away(v[ok] * scale).astype(np.int64)
        g = pd.DataFrame({key: batch[key], "__s": units,
                          "__c": ok.astype(np.int64)})
        agg = g.groupby(key, sort=False).sum()
        return agg.reset_index()

    means = bucketed_combine(
        ds.map_batches(_partial, batch_format="pandas", batch_size=1 << 17),
        [key], {"__s": "sum", "__c": "sum"}, num_buckets)

    def _finish(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch["__s"].to_numpy(dtype=np.float64)
        c = batch["__c"].to_numpy(dtype=np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            mean = s / c / scale  # NaN where the whole group is null
        return pd.DataFrame({key: batch[key], "__mean": mean})

    withmean = _attach_small(ds, means.map_batches(
        _finish, batch_format="pandas"), key,
        broadcast_threshold=broadcast_threshold, join_type="left outer")

    def _apply(batch: pd.DataFrame) -> pd.DataFrame:
        v = batch[value_col].to_numpy(dtype=np.float64)
        m = batch["__mean"].to_numpy(dtype=np.float64)
        batch[out_col] = np.where(np.isnan(v), m, v)
        return batch.drop(columns=["__mean"])

    return withmean.map_batches(_apply, batch_format="pandas")


def global_rank(ds: rd.Dataset, order_col: str, id_col: str,
                descending: bool = False, bin_width: float = 1.0,
                pct: bool = False, round_to: int = 8,
                num_buckets: int = 0) -> rd.Dataset:
    """Global dense row numbering WITHOUT a partition key →
    (id_col, order_col, rank [1-based in (order_col, id_col) order],
    and ``pct`` = percent_rank (rank−1)/(n−1) when requested).

    The one window shape ``ordered_window`` can't express (it requires a
    partition key). Distributed two-phase prefix (the budget_select
    device): phase 1 counts rows per ``order_col`` value bin (per-batch
    partials, no row shuffle); the driver cumsums the O(#bins) counts in
    rank order; phase 2 shuffles rows ONCE by bin and finishes the
    within-bin (order_col, id_col) sort + position vectorized. Ties are
    broken by ``id_col``, so the rank is a total order (= row_number in
    the SQL mirror)."""
    num_buckets = resolve_num_buckets(num_buckets)
    import ray

    from ..util import cached_get
    from .agg import _bucket_of_frame

    def _partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = np.floor(batch[order_col].to_numpy(np.float64)
                     / bin_width).astype(np.int64)
        return (pd.DataFrame({"__bin": b})
                .groupby("__bin", sort=False).size()
                .rename("__n").reset_index())

    bs = (ds.select_columns([order_col])
          .map_batches(_partial, batch_format="pandas").to_pandas())
    bs = bs.groupby("__bin", sort=True)["__n"].sum().sort_index(
        ascending=not descending)
    total = int(bs.sum())
    bases = np.concatenate([[0], bs.cumsum().to_numpy()[:-1]])
    base_of = {int(k): int(v) for k, v in zip(bs.index, bases)}
    ref = ray.put(base_of)

    def _bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch[[id_col, order_col]].copy()
        batch["__bin"] = np.floor(
            batch[order_col].to_numpy(np.float64) / bin_width
        ).astype(np.int64)
        batch["__bucket"] = _bucket_of_frame(batch, ["__bin"],
                                             num_buckets)
        return batch

    def _scan(group: pd.DataFrame) -> pd.DataFrame:
        base_of = cached_get(ref)
        outs = []
        for bn, g in group.groupby("__bin", sort=False):
            g = g.sort_values([order_col, id_col],
                              ascending=[not descending, True],
                              kind="mergesort")
            rank = np.arange(1, len(g) + 1, dtype=np.int64) \
                + base_of[int(bn)]
            out = pd.DataFrame({id_col: g[id_col].to_numpy(),
                                order_col: g[order_col].to_numpy(),
                                "rank": rank})
            if pct:
                out["pct"] = round_half_away(
                    (rank - 1) / max(total - 1, 1), round_to)
            outs.append(out)
        return pd.concat(outs) if outs else pd.DataFrame(
            {id_col: [], order_col: [], "rank": []})

    return (ds.map_batches(_bucketize, batch_format="pandas")
            .groupby("__bucket").map_groups(_scan,
                                            batch_format="pandas"))


def time_weighted_mean(events: rd.Dataset, key: str, ts_col: str,
                       value_col: str, id_col: str,
                       num_buckets: int = 0,
                       round_to: int = 6) -> rd.Dataset:
    """Step-hold time-weighted average of ``value_col`` per key: each
    observation holds until the next one, TWA = Σ vᵢ·(tᵢ₊₁−tᵢ) /
    (t_last − t_first); keys with < 2 events are dropped (no interval).
    The right mean for irregularly-sampled series (sensor / account
    balances), where the plain mean over-weights bursts.

    ONE hash(key) co-location shuffle; inside each bucket one lexsort +
    shifted-diff in exact integer microseconds; weights are v·Δus in
    float64 (Δus < 2⁵³ exact). → (key, n_obs, span_us, twa)."""

    num_buckets = resolve_num_buckets(num_buckets)
    def _bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch[[key, ts_col, value_col, id_col]]
        h = pd.util.hash_array(batch[key].to_numpy(), categorize=False)
        return batch.assign(
            __bucket=(h % np.uint64(num_buckets)).astype(np.int32))

    def _twa(group: pd.DataFrame) -> pd.DataFrame:
        g = (group.drop(columns="__bucket")
             .sort_values([key, ts_col, id_col], kind="stable")
             .reset_index(drop=True))
        if not len(g):
            return pd.DataFrame({key: [], "n_obs": [], "span_us": [],
                                 "twa": []})
        us = g[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        ks = g[key].to_numpy()
        new_key = np.r_[True, ks[1:] != ks[:-1]]
        last = np.r_[new_key[1:], True]
        delta = np.empty(len(g), np.int64)
        delta[:-1] = us[1:] - us[:-1]
        delta[-1] = 0
        delta[last] = 0  # no interval after a key's final observation
        w = g[value_col].to_numpy(np.float64) * delta.astype(np.float64)
        heads = np.flatnonzero(new_key)
        sums = np.add.reduceat(w, heads)
        span = us[last] - us[new_key]
        n_obs = np.diff(np.r_[heads, len(g)])
        keep = n_obs >= 2
        return pd.DataFrame({
            key: ks[new_key][keep],
            "n_obs": n_obs[keep].astype(np.int64),
            "span_us": span[keep].astype(np.int64),
            "twa": round_half_away(sums[keep] / span[keep].astype(np.float64),
                            round_to)})

    bucketed = events.map_batches(_bucketize, batch_format="pandas",
                                  batch_size=1 << 17)
    return bucketed.groupby("__bucket").map_groups(
        _twa, batch_format="pandas")


def active_streaks(events: rd.Dataset, key: str, ts_col: str,
                   num_buckets: int = 0) -> rd.Dataset:
    """Longest run of consecutive active DAYS per key (gaps-and-islands
    on the day grid): batch-local (key, day) dedup → one hash(key)
    co-location shuffle → per-bucket global dedup + vectorized island
    lengths (day − rank is constant within a run). → (key,
    n_active_days, longest_streak)."""

    num_buckets = resolve_num_buckets(num_buckets)
    def _days(batch: pd.DataFrame) -> pd.DataFrame:
        d = (batch[ts_col].to_numpy().astype("datetime64[D]")
             .astype(np.int64))
        return pd.DataFrame({key: batch[key].to_numpy(),
                             "__day": d}).drop_duplicates()

    def _bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_array(batch[key].to_numpy(), categorize=False)
        return batch.assign(
            __bucket=(h % np.uint64(num_buckets)).astype(np.int32))

    def _streaks(group: pd.DataFrame) -> pd.DataFrame:
        g = (group.drop(columns="__bucket").drop_duplicates()
             .sort_values([key, "__day"], kind="stable")
             .reset_index(drop=True))
        if not len(g):
            return pd.DataFrame({key: [], "n_active_days": [],
                                 "longest_streak": []})
        ks = g[key].to_numpy()
        d = g["__day"].to_numpy()
        new_key = np.r_[True, ks[1:] != ks[:-1]]
        # island id: new island at key head or a day gap > 1
        new_isl = new_key | np.r_[True, (d[1:] - d[:-1]) != 1]
        isl_heads = np.flatnonzero(new_isl)
        isl_len = np.diff(np.r_[isl_heads, len(g)])
        # longest island per key: islands are contiguous per key
        isl_key_head = new_key[isl_heads]  # first island of its key
        key_isl_heads = np.flatnonzero(isl_key_head)
        longest = np.maximum.reduceat(isl_len, key_isl_heads)
        heads = np.flatnonzero(new_key)
        n_days = np.diff(np.r_[heads, len(g)])
        return pd.DataFrame({
            key: ks[new_key],
            "n_active_days": n_days.astype(np.int64),
            "longest_streak": longest.astype(np.int64)})

    dd = events.map_batches(_days, batch_format="pandas",
                            batch_size=1 << 17)
    bucketed = dd.map_batches(_bucketize, batch_format="pandas",
                              batch_size=1 << 17)
    return bucketed.groupby("__bucket").map_groups(
        _streaks, batch_format="pandas")


def trailing_ewma(events: rd.Dataset, key: str, order_cols: list[str],
                  value_col: str, alpha: float = 0.5, window: int = 8,
                  out_col: str = "ewma", round_to: int = 6,
                  num_buckets: int = 0) -> rd.Dataset:
    """Trailing-window exponential smoothing per key: for each row i (in
    ``order_cols`` order within its key) over the last ``window`` rows,
    ewma_i = Σ_j (1−α)^j·v_{i−j} / Σ_j (1−α)^j  (j = 0..window−1,
    clipped at the partition head) — the normalized finite-memory EWMA
    (pandas ``ewm(adjust=True)`` restricted to a frame). The frame bound
    keeps the weights' dynamic range fixed, so with dyadic α (0.5, 0.25,
    …) and integer-unit values every product and partial sum is an exact
    dyadic rational in float64: the result is bit-identical to any
    other evaluation order, including a SQL mirror.

    Distributed shape: ONE hash(key) co-location shuffle, then per
    bucket a whole-bucket stable sort and ``window`` vectorized
    shifted multiply-adds with partition-boundary masks — no per-key
    dispatch, no driver work. Output: input columns + ``out_col``."""
    num_buckets = resolve_num_buckets(num_buckets)
    if window < 1:
        raise ValueError("window must be >= 1")
    w = (1.0 - alpha) ** np.arange(window, dtype=np.float64)

    def _bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_array(batch[key].to_numpy(), categorize=False)
        batch["__bucket"] = (h % np.uint64(num_buckets)).astype(np.int32)
        return batch

    def _smooth(group: pd.DataFrame) -> pd.DataFrame:
        g = (group.drop(columns="__bucket")
                  .sort_values([key] + order_cols, kind="stable")
                  .reset_index(drop=True))
        ks = g[key].to_numpy()
        new_key = np.r_[True, ks[1:] != ks[:-1]]
        idx = np.arange(len(g), dtype=np.int64)
        pid = np.cumsum(new_key) - 1
        part_start = idx[new_key][pid]
        v = g[value_col].to_numpy(dtype=np.float64)
        num = np.zeros(len(g), np.float64)
        den = np.zeros(len(g), np.float64)
        for j in range(window):
            valid = idx - j >= part_start
            vj = np.where(valid, np.r_[np.zeros(j), v[:len(v) - j]], 0.0)
            num += w[j] * vj
            den += w[j] * valid
        g[out_col] = round_half_away(num / den, round_to)
        return g

    return (events.map_batches(_bucketize, batch_format="pandas")
            .groupby("__bucket").map_groups(_smooth,
                                            batch_format="pandas"))


def skyline2d(ds: rd.Dataset, x_col: str, y_col: str) -> rd.Dataset:
    """2-D Pareto skyline (maximization): rows NOT dominated by any
    other row, where v dominates u iff v ≥ u on both columns and > on
    at least one (SQL ``NOT EXISTS`` dominance). Exact duplicates of a
    frontier point all survive (neither strictly dominates). Minimize a
    dimension by negating it first.

    Distributed shape: every block reduces to its local skyline in one
    vectorized pass (a globally non-dominated row is non-dominated in
    its block, so local pruning is lossless); the survivor union — the
    frontier is typically orders of magnitude smaller than the input —
    finishes with the same kernel in ONE single-partition task, no
    driver collect. Worst case (all points on the frontier) degrades to
    a full gather; callers with adversarial inputs should pre-bucket."""

    def _sky(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return batch
        g = batch.sort_values([x_col, y_col], ascending=False,
                              kind="mergesort").reset_index(drop=True)
        x = g[x_col].to_numpy()
        y = g[y_col].to_numpy()
        new_x = np.r_[True, x[1:] != x[:-1]]
        gid = np.cumsum(new_x) - 1
        # per x-group max y = first y in the (x desc, y desc) sort
        gmax = y[new_x][gid]
        # running max of EARLIER groups' maxes (strictly larger x)
        group_maxes = y[new_x]
        run = np.maximum.accumulate(group_maxes)
        earlier = np.r_[-np.inf, run[:-1]][gid]
        keep = (y == gmax) & (y > earlier)
        return g[keep]

    local = ds.map_batches(_sky, batch_format="pandas")
    return local.repartition(1).map_batches(_sky, batch_size=None,
                                            batch_format="pandas")


def grouped_gini(
    ds: rd.Dataset,
    key: str,
    value_col: str,
    round_to: int = 8,
    num_buckets: int = 0,
) -> rd.Dataset:
    """Exact per-key Gini coefficient over nonnegative values → one row
    per key: (key, n, gini) with the standard rank formulation over the
    ascending-sorted values x_1..x_n,

        gini = 2·Σ i·x_i / (n·Σ x_i) − (n+1)/n

    (0 = perfectly equal, → 1 = fully concentrated; the per-group
    concentration audit of a curation run — e.g. how skewed each user's
    event values or each source's doc sizes are). Keys whose value sum
    is 0 (all zeros) emit gini = 0.0. Nulls are ignored (SQL aggregate
    semantics).

    Distributed shape (the ``grouped_quantiles`` histogram device): a
    per-block (key, value) → count combiner runs BEFORE the one
    co-location shuffle, so the exchange moves distinct pairs, not rows.
    The finish is vectorized across all keys of a bucket: within a run
    of c equal values starting after cumulative rank r the rank sum is
    exact integer c·r + c·(c+1)/2, so Σ i·x_i folds to one multiply per
    distinct value — ties make the result order-independent by
    construction. Assumes one key's *histogram* fits a worker."""

    num_buckets = resolve_num_buckets(num_buckets)
    def _combine(batch: pd.DataFrame) -> pd.DataFrame:
        c = (batch[[key, value_col]].dropna(subset=[value_col])
             .groupby([key, value_col], sort=False, observed=True)
             .size().reset_index(name="__cnt"))
        h = pd.util.hash_array(c[key].to_numpy(), categorize=False)
        c["__bucket"] = (h % np.uint64(num_buckets)).astype(np.int32)
        return c

    def _finish(group: pd.DataFrame) -> pd.DataFrame:
        g = (group.drop(columns="__bucket")
                  .groupby([key, value_col], sort=False, observed=True)
                  ["__cnt"].sum().reset_index()
                  .sort_values([key, value_col], kind="stable")
                  .reset_index(drop=True))
        ks = g[key].to_numpy()
        new_key = np.r_[True, ks[1:] != ks[:-1]]
        gid = np.cumsum(new_key) - 1
        cnt = g["__cnt"].to_numpy(np.int64)
        vals = g[value_col].to_numpy(np.float64)
        cum = np.cumsum(cnt)
        # rows BEFORE this run, within the key (cumulative rank r)
        prev = cum - cnt - (cum - cnt)[new_key][gid]
        # exact integer rank sum of the run: c·r + c·(c+1)/2
        rank_sum = cnt * prev + cnt * (cnt + 1) // 2
        w = vals * rank_sum.astype(np.float64)     # Σ i·x_i per run
        s = vals * cnt.astype(np.float64)          # Σ x_i per run
        seg = np.flatnonzero(new_key)
        w_k = np.add.reduceat(w, seg) if len(w) else np.empty(0)
        s_k = np.add.reduceat(s, seg) if len(s) else np.empty(0)
        n_k = (cum - (cum - cnt)[new_key][gid])[
            np.r_[new_key[1:], True]].astype(np.float64)
        denom = n_k * s_k
        gini = np.where(denom > 0,
                        2.0 * w_k / np.where(denom > 0, denom, 1.0)
                        - (n_k + 1.0) / np.maximum(n_k, 1.0),
                        0.0)
        return pd.DataFrame({
            key: ks[new_key],
            "n": n_k.astype(np.int64),
            "gini": round_half_away(gini, round_to)})

    partial = ds.map_batches(_combine, batch_format="pandas",
                             batch_size=1 << 17)
    return partial.groupby("__bucket").map_groups(_finish,
                                                  batch_format="pandas")


def global_quantile_exact(
    ds: rd.Dataset,
    value_col: str,
    qs: list[float],
    n_bins: int = 4096,
    distinct_budget: int = 65536,
    max_rounds: int = 10,
    num_buckets: int = 0,
) -> rd.Dataset:
    """EXACT global quantiles of a double column without a partition
    key and without assuming bounded value cardinality → one row per q:
    (q, value), where value is the element at 0-based index
    ``max(ceil(q·n) − 1, 0)`` of the ascending sort (SQL
    ``quantile_disc`` — same rule as ``grouped_quantiles``). Nulls are
    ignored.

    Distributed shape — iterative histogram refinement, the classic
    selection-without-sorting device: pass 0 is a (count, min, max)
    combiner; each round histograms the CURRENT candidate interval into
    ``n_bins`` equal-width bins with a per-block combiner (the exchange
    is O(bins) rows per block, rows never shuffle, no sort anywhere)
    and narrows to the bin containing the target rank — a 4096× range
    reduction per round. When the interval's EXACT-value histogram fits
    ``distinct_budget`` (always true once the interval is narrow, and
    immediately true for heavily tied data), the final combiner selects
    the exact element by cumulative count. Total cost: ~3-5 streaming
    passes per q at double precision; a driver-side O(bins) cumsum per
    round. The global-sort-free answer to "the p99 of 10^12 rows"."""
    num_buckets = resolve_num_buckets(num_buckets)
    import math

    from .agg import preagg_groupby
    from .joins import collect_arrow

    base = ds.select_columns([value_col])

    def _stats(t: pa.Table) -> pa.Table:
        v = t[value_col].combine_chunks().to_numpy(zero_copy_only=False)
        v = v[~np.isnan(v)] if v.dtype.kind == "f" else v
        if not len(v):
            return pa.table({"n": pa.array([], pa.int64()),
                             "lo": pa.array([], pa.float64()),
                             "hi": pa.array([], pa.float64())})
        return pa.table({"n": pa.array([len(v)], pa.int64()),
                         "lo": pa.array([float(v.min())]),
                         "hi": pa.array([float(v.max())])})

    st = collect_arrow(base.map_batches(
        _stats, batch_format="pyarrow")).to_pandas()
    n_total = int(st["n"].sum())
    if n_total == 0:
        return rd.from_arrow(pa.table({"q": pa.array(qs, pa.float64()),
                                       "value": pa.array(
                                           [None] * len(qs),
                                           pa.float64())}))
    g_lo, g_hi = float(st["lo"].min()), float(st["hi"].max())

    def _bin_pass(lo: float, hi: float) -> pd.DataFrame:
        width = (hi - lo) / n_bins

        def _partial(t: pa.Table) -> pa.Table:
            v = t[value_col].combine_chunks().to_numpy(
                zero_copy_only=False).astype(np.float64)
            v = v[~np.isnan(v)]
            below = int((v < lo).sum())
            inside = v[(v >= lo) & (v <= hi)]
            if width > 0:
                b = np.minimum(((inside - lo) / width).astype(np.int64),
                               n_bins - 1)
            else:
                b = np.zeros(len(inside), np.int64)
            vc = pd.Series(b).value_counts()
            bins = vc.index.to_numpy(np.int64)
            cnts = vc.to_numpy(np.int64)
            if below:
                bins = np.concatenate(([np.int64(-1)], bins))
                cnts = np.concatenate(([np.int64(below)], cnts))
            return pa.table({"b": pa.array(bins), "c": pa.array(cnts)})

        h = preagg_groupby(base.map_batches(_partial,
                                            batch_format="pyarrow"),
                           ["b"], [("sum", "c", "c")], num_buckets)
        return collect_arrow(h).to_pandas().sort_values("b")

    def _value_hist(lo: float, hi: float) -> pd.DataFrame:
        def _partial(t: pa.Table) -> pa.Table:
            v = t[value_col].combine_chunks().to_numpy(
                zero_copy_only=False).astype(np.float64)
            v = v[~np.isnan(v)]
            below = int((v < lo).sum())
            inside = v[(v >= lo) & (v <= hi)]
            vc = pd.Series(inside).value_counts()
            vals = vc.index.to_numpy(np.float64)
            cnts = vc.to_numpy(np.int64)
            # -inf row carries the below-interval count (never a value)
            return pa.table({
                "v": pa.array(np.concatenate(([-np.inf], vals))),
                "c": pa.array(np.concatenate(([np.int64(below)], cnts)))})

        h = preagg_groupby(base.map_batches(_partial,
                                            batch_format="pyarrow"),
                           ["v"], [("sum", "c", "c")], num_buckets
                           ).materialize()
        # budget guard BEFORE the driver collect: the loop bounds the
        # candidate bin's ROW count, but adversarially dense-distinct
        # data (or a max_rounds exit) can leave more DISTINCT doubles in
        # [lo, hi] than the budget — fail loudly instead of collecting
        # unboundedly (count() on the materialized table is metadata)
        n_distinct = h.count()
        if n_distinct > distinct_budget + 1:  # +1 = the -inf carrier row
            raise ValueError(
                f"global_quantile_exact: interval [{lo}, {hi}] still holds "
                f"{n_distinct - 1} distinct values > distinct_budget="
                f"{distinct_budget}; raise distinct_budget, n_bins or "
                "max_rounds")
        return collect_arrow(h).to_pandas().sort_values("v")

    out_q, out_v = [], []
    for q in qs:
        tgt = max(int(math.ceil(q * n_total - 1e-9)), 1)
        lo, hi = g_lo, g_hi
        # narrow until the candidate bin's ROW count fits the budget
        # (the exact-value histogram then has at most that many distinct
        # values, so the final collect is driver-safe); a stalled
        # interval (double-precision underflow: heavy ties) is one
        # double wide — its distinct-value histogram is tiny too
        for _ in range(max_rounds):
            binned = _bin_pass(lo, hi)
            below_b = int(binned.loc[binned["b"] == -1, "c"].sum())
            bb = binned[binned["b"] != -1]
            cum = below_b + bb["c"].to_numpy(np.int64).cumsum()
            pos = int(np.searchsorted(cum, tgt))
            bsel = int(bb["b"].to_numpy()[pos])
            in_bin = int(bb["c"].to_numpy()[pos])
            width = (hi - lo) / n_bins
            lo2 = lo + bsel * width
            hi2 = hi if bsel == n_bins - 1 else lo + (bsel + 1) * width
            stalled = lo2 == lo and hi2 == hi
            if not stalled:
                lo, hi = lo2, hi2
            if in_bin <= distinct_budget or stalled:
                break
        hist = _value_hist(lo, hi)
        below = int(hist.loc[hist["v"] == -np.inf, "c"].sum())
        inb = hist[hist["v"] != -np.inf]
        cum = below + inb["c"].to_numpy(np.int64).cumsum()
        pos = int(np.searchsorted(cum, tgt))
        out_q.append(q)
        out_v.append(float(inb["v"].to_numpy()[pos]))

    return rd.from_arrow(pa.table({"q": pa.array(out_q, pa.float64()),
                                   "value": pa.array(out_v,
                                                     pa.float64())}))


def grouped_weighted_median(
    ds: rd.Dataset,
    key: str,
    value_col: str,
    weight_col: str,
    out_col: str = "wmedian",
    num_buckets: int = 0,
) -> rd.Dataset:
    """Per-key lower weighted median → (key, total_weight, wmedian):
    the smallest value whose cumulative weight (ascending value order)
    reaches half the key's total, by the EXACT integer rule
    ``2·cumw ≥ totw`` — weights must be integers (counts, bytes,
    durations), which makes the rule tie-free and bit-identical to the
    SQL window mirror. The "median doc length weighted by tokens" /
    "median price weighted by volume" shape.

    Distributed shape (the ``grouped_quantiles`` histogram device): a
    per-block (key, value) → Σweight combiner runs BEFORE the one
    co-location shuffle — distinct pairs move, not rows; the finish is
    one vectorized cumulative scan across all keys of a bucket."""

    num_buckets = resolve_num_buckets(num_buckets)
    def _combine(batch: pd.DataFrame) -> pd.DataFrame:
        c = (batch[[key, value_col, weight_col]]
             .dropna(subset=[value_col, weight_col])
             .groupby([key, value_col], sort=False, observed=True)
             [weight_col].sum().reset_index(name="__w"))
        h = pd.util.hash_array(c[key].to_numpy(), categorize=False)
        c["__bucket"] = (h % np.uint64(num_buckets)).astype(np.int32)
        return c

    def _finish(group: pd.DataFrame) -> pd.DataFrame:
        g = (group.drop(columns="__bucket")
                  .groupby([key, value_col], sort=False, observed=True)
                  ["__w"].sum().reset_index()
                  .sort_values([key, value_col], kind="stable")
                  .reset_index(drop=True))
        ks = g[key].to_numpy()
        new_key = np.r_[True, ks[1:] != ks[:-1]]
        gid = np.cumsum(new_key) - 1
        w = g["__w"].to_numpy(np.int64)
        cum = np.cumsum(w)
        cum_in = cum - (cum - w)[new_key][gid]
        tot = cum_in[np.r_[new_key[1:], True]][gid]
        hit = 2 * cum_in >= tot
        # cum_in is monotone per key, so hits form a suffix of each run;
        # the first hit (no hit immediately before it in the same key)
        # is the lower weighted median
        prev_same = np.zeros(len(g), bool)
        prev_same[1:] = hit[:-1] & ~new_key[1:]
        sel = hit & ~prev_same
        out = g[sel]
        return pd.DataFrame({
            key: out[key].to_numpy(),
            "total_weight": tot[sel].astype(np.int64),
            out_col: out[value_col].to_numpy()})

    partial = ds.map_batches(_combine, batch_format="pandas",
                             batch_size=1 << 17)
    return partial.groupby("__bucket").map_groups(_finish,
                                                  batch_format="pandas")
