"""Aggregation helpers.

``preagg_groupby`` implements combiner-style aggregation: partial
aggregates are computed per batch inside ``map_batches`` (one row per key
per batch) and only the partials are shuffled — the pattern the task
demands for 100 TB groupbys. The final combine is a **bucketed pandas
merge**: partials get ``bucket = hash(keys) % B`` and are grouped by that
single int32 column (``groupby(bucket).map_groups``), with the real
groupby running vectorized in pandas inside each bucket. This
deliberately avoids Ray's native sort-based ``Aggregate`` on composite
keys, which measured ~50x slower on (timestamp, string) keys than a
single-int sort + pandas combine. B scales with key cardinality — each
bucket must fit a worker's heap, not the whole key space.

Supported specs: sum, count, min, max, mean (sum+count recombined).

``dense_ids`` replaces the reference's arrival-order id assignment
(belb/kbs/ctd_diseases/ctd_diseases.py:120-130, belb/kbs/umls/umls.py:175
— SURVEY §2.4 T2/T3) with a deterministic sort-based assignment: distinct
values sorted, id = rank. ``topk`` = sort + limit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from ..util import resolve_num_buckets
from ..util import round_half_away

AggSpec = tuple[str, str, str]  # (func, in_col, out_col); func: sum|count|min|max|mean

_PD_FUNC = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}


def _bucket_of_frame(batch: pd.DataFrame, keys: list[str], num_buckets: int) -> np.ndarray:
    h = np.zeros(len(batch), dtype=np.uint64)
    for k in keys:
        h = h * np.uint64(0x100000001B3) + pd.util.hash_array(
            batch[k].to_numpy(), hash_key="belb_ray_aggbkt0", categorize=False)
    return (h % np.uint64(num_buckets)).astype(np.int32)


def guard_bucket_rows(group: pd.DataFrame, key: str, budget: int | None,
                      op: str) -> None:
    """Loud hot-key failure for bucketed per-key ops: each hash bucket
    assembles on ONE worker, so a pathological key silently OOMs the
    task. Past ``budget`` rows, raise with the hottest key named — the
    remedy (more buckets / salt the key / raise the budget) is a caller
    decision, not something to guess (``distinct_values`` max_size
    pattern, joins.py)."""
    if budget is not None and len(group) > budget:
        vc = group[key].value_counts()
        raise ValueError(
            f"{op}: one bucket holds {len(group)} rows > max_bucket_rows="
            f"{budget}; hottest key {vc.index[0]!r} carries "
            f"{int(vc.iloc[0])} rows. Raise num_buckets, pre-salt the hot "
            f"key, or raise max_bucket_rows.")


def bucketed_combine(partials: rd.Dataset, keys: list[str],
                     agg_map: dict[str, str], num_buckets: int = 0) -> rd.Dataset:
    """Final combine of partial-aggregate rows: hash-bucket the key tuple
    into an int32 column, shuffle by THAT, combine per bucket in pandas.
    One cheap single-int sort instead of a composite-key sort."""

    num_buckets = resolve_num_buckets(num_buckets)
    def _bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        batch["__bucket"] = _bucket_of_frame(batch, keys, num_buckets)
        return batch

    def _combine(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop(columns="__bucket").groupby(keys, sort=False)
        out = g.agg(agg_map).reset_index()
        return out

    bucketed = partials.map_batches(_bucketize, batch_format="pandas",
                                    batch_size=1 << 18)
    return bucketed.groupby("__bucket").map_groups(_combine,
                                                   batch_format="pandas")


def preagg_groupby(ds: rd.Dataset, keys: list[str], specs: list[AggSpec],
                   num_buckets: int = 0) -> rd.Dataset:
    """Partial-aggregate per batch, then a bucketed pandas combine."""
    num_buckets = resolve_num_buckets(num_buckets)
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

    agg_map = {o: _PD_FUNC[f] for f, c, o in partial_specs}
    out = bucketed_combine(partials, keys, agg_map, num_buckets)

    if need_mean:
        def _finish(batch: pd.DataFrame) -> pd.DataFrame:
            for f, c, o in need_mean:
                batch[o] = batch[f"__msum_{o}"] / batch[f"__mcnt_{o}"]
                batch = batch.drop(columns=[f"__msum_{o}", f"__mcnt_{o}"])
            return batch

        out = out.map_batches(_finish, batch_format="pandas")
    return out


def count_distinct(ds: rd.Dataset, keys: list[str], distinct_col: str,
                   out_col: str, num_buckets: int = 0) -> rd.Dataset:
    """count(distinct x) per key: batch-local dedup → bucketed global
    dedup + count per key. One single-int shuffle, no row explosion."""
    num_buckets = resolve_num_buckets(num_buckets)
    cols = keys + [distinct_col]

    def _dedup(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[cols].drop_duplicates()

    def _bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        # bucket by KEYS only, so all rows of a key land in one bucket
        batch["__bucket"] = _bucket_of_frame(batch, keys, num_buckets)
        return batch

    def _count(group: pd.DataFrame) -> pd.DataFrame:
        dd = group.drop(columns="__bucket").drop_duplicates()
        out = dd.groupby(keys, sort=False)[distinct_col].nunique().rename(out_col)
        return out.reset_index()

    dd = ds.map_batches(_dedup, batch_format="pandas", batch_size=65536)
    bucketed = dd.map_batches(_bucketize, batch_format="pandas",
                              batch_size=1 << 18)
    return bucketed.groupby("__bucket").map_groups(_count, batch_format="pandas")


def count_distinct_rows(ds: rd.Dataset, cols: list[str],
                        num_buckets: int = 0) -> int:
    """Global ``COUNT(DISTINCT (cols...))`` as one int — collision-free
    (the tuple itself is the identity, no 64-bit key mixing) and
    distributed: batch-local dedup, bucket by the hashed TUPLE (this
    counts one global set, so bucketing by the value spreads the dedup
    across all buckets where a constant grouping key would collapse it
    onto a single task), per-bucket distinct count, driver sums the
    per-bucket ints (num_buckets rows)."""
    num_buckets = resolve_num_buckets(num_buckets)

    def _dedup_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        dd = batch[cols].drop_duplicates()
        dd["__bucket"] = _bucket_of_frame(dd, cols, num_buckets)
        return dd

    def _count(group: pd.DataFrame) -> pd.DataFrame:
        n = len(group.drop(columns="__bucket").drop_duplicates())
        return pd.DataFrame({"n": [n]})

    parts = (ds.map_batches(_dedup_bucket, batch_format="pandas",
                            batch_size=65536)
             .groupby("__bucket").map_groups(_count, batch_format="pandas")
             ).to_pandas()
    return int(parts["n"].sum()) if len(parts) else 0


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


def grouped_topk(ds: rd.Dataset, keys: list[str], order_col: str, k: int,
                 descending: bool = True, tiebreak: str | None = None,
                 num_buckets: int = 0) -> rd.Dataset:
    """Per-group top-k (``row_number() OVER (PARTITION BY keys ORDER BY
    order_col) <= k``) without a global sort: each batch keeps its local
    top-k per key (so at most k rows per key per block enter the
    shuffle), then one bucketed combine finishes per key. ``tiebreak``
    makes the cut deterministic under order-col ties."""
    num_buckets = resolve_num_buckets(num_buckets)
    sort_cols = [order_col] + ([tiebreak] if tiebreak else [])
    ascending = [not descending] + ([True] if tiebreak else [])

    def _local(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch.sort_values(sort_cols, ascending=ascending, kind="mergesort")
        return s.groupby(keys, sort=False).head(k)

    def _bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        batch["__bucket"] = _bucket_of_frame(batch, keys, num_buckets)
        return batch

    def _combine(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop(columns="__bucket")
        s = g.sort_values(sort_cols, ascending=ascending, kind="mergesort")
        return s.groupby(keys, sort=False).head(k)

    partial = ds.map_batches(_local, batch_format="pandas", batch_size=65536)
    bucketed = partial.map_batches(_bucketize, batch_format="pandas",
                                   batch_size=1 << 18)
    return bucketed.groupby("__bucket").map_groups(_combine,
                                                   batch_format="pandas")


def pivot_agg(
    ds: rd.Dataset,
    row_key: str,
    col_key: str,
    values: list,
    value_col: str | None = None,
    agg: str = "sum",
    prefix: str = "",
    num_buckets: int = 0,
) -> rd.Dataset:
    """Pivot ``col_key``'s (caller-enumerated) ``values`` into one wide
    column each, aggregated per ``row_key`` — SQL
    ``agg(x) FILTER (WHERE col_key = v) ... GROUP BY row_key``.

    ``agg="count"`` counts rows (``value_col`` ignored); ``agg="sum"``
    sums ``value_col``. The pivot happens INSIDE the per-block partial
    (``pd.crosstab``-style groupby per batch), so the shuffle moves one
    row per (row_key, block) at width ``len(values)`` — never the input
    rows — and the combine is the standard bucketed sum. ``values`` must
    be the full enumeration of interest: unlisted values are dropped
    (pass them explicitly to keep the output schema deterministic, a
    requirement for streaming blocks). Empty cells are 0 (SQL's FILTER
    count) — use int64 units for sums that must hash-match SQL BIGINT.
    """
    num_buckets = resolve_num_buckets(num_buckets)
    if agg not in ("sum", "count"):
        raise ValueError(f"pivot_agg supports sum|count, got {agg!r}")
    out_cols = [f"{prefix}{v}" for v in values]

    def _partial(batch: pd.DataFrame) -> pd.DataFrame:
        sub = batch[batch[col_key].isin(values)]
        if agg == "count":
            wide = (sub.groupby([row_key, col_key], sort=False, observed=True)
                    .size().unstack(col_key, fill_value=0))
        else:
            wide = (sub.groupby([row_key, col_key], sort=False, observed=True)
                    [value_col].sum().unstack(col_key, fill_value=0))
        wide = wide.reindex(columns=values, fill_value=0)
        wide.columns = out_cols
        return wide.reset_index()

    partial = ds.map_batches(_partial, batch_format="pandas",
                             batch_size=1 << 17)
    return bucketed_combine(partial, [row_key],
                            {c: "sum" for c in out_cols},
                            num_buckets=num_buckets)


def mode_agg(ds: rd.Dataset, keys: list[str], value_col: str,
             out_col: str, num_buckets: int = 0) -> rd.Dataset:
    """Per-key mode (most frequent ``value_col``), ties broken by the
    smallest value — the deterministic arg-max SQL shape
    ``row_number() OVER (PARTITION BY keys ORDER BY count DESC, value)``.

    Combiner shape: each block emits one (keys, value, partial_count) row
    per distinct (keys, value) it saw, the bucketed combine (bucket by
    KEYS so every candidate value of a key co-locates) sums counts and
    picks the winner vectorized — sort by (count desc, value asc) then
    ``groupby(keys).head(1)``. The shuffle moves per-block distinct
    (key, value) pairs, never input rows; worst case equals the distinct
    pair count, the same bound a SQL GROUP BY key,value would pay."""
    num_buckets = resolve_num_buckets(num_buckets)
    cols = keys + [value_col]

    def _partial(batch: pd.DataFrame) -> pd.DataFrame:
        out = (batch.groupby(cols, sort=False, observed=True)
               .size().rename("__n").reset_index())
        return out

    def _bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        batch["__bucket"] = _bucket_of_frame(batch, keys, num_buckets)
        return batch

    def _pick(group: pd.DataFrame) -> pd.DataFrame:
        g = (group.groupby(cols, sort=False, observed=True)["__n"]
             .sum().reset_index())
        g = g.sort_values(["__n", value_col], ascending=[False, True],
                          kind="mergesort")
        win = g.groupby(keys, sort=False).head(1)
        return win[cols].rename(columns={value_col: out_col})

    partial = ds.map_batches(_partial, batch_format="pandas",
                             batch_size=1 << 17)
    bucketed = partial.map_batches(_bucketize, batch_format="pandas",
                                   batch_size=1 << 18)
    return bucketed.groupby("__bucket").map_groups(_pick,
                                                   batch_format="pandas")


def moment_stats(ds: rd.Dataset, keys: list[str], value_col: str,
                 prefix: str = "", ddof: int = 1,
                 num_buckets: int = 0,
                 decimals: int | None = None) -> rd.Dataset:
    """Per-key count / mean / sample-variance / sample-stddev by shipping
    raw moments: each block emits (n, Σx, Σx²) per key — three doubles,
    never rows — one bucketed sum-combine, then the closed-form finish
    ``var = (Σx² − (Σx)²/n) / (n − ddof)``. The textbook distributed
    moments shape; at 100 TB the shuffle is keys × blocks rows of fixed
    width regardless of input size.

    ``decimals``: when the values are exact d-decimal numbers (prices,
    cents), pass d to sum INTEGER-scaled units in int64 — the moments
    are then exact and PARTITIONING-INDEPENDENT, and the finish is a
    single float division per stat, bit-identical to a SQL oracle that
    sums the same BIGINT units (measured at sf0.1: float block-partial
    sums diverged from DuckDB's sequential sum in the 4th decimal for
    6/1500 keys; exact units remove the divergence at any scale).
    Bounds: needs |Σunits| < 2⁵³ and n·Σunits² − (Σunits)² < 2⁶³ per
    key — comfortably true for 2-decimal values below ~10⁶ with up to
    ~10⁸ rows per key. Without ``decimals`` the float path applies;
    its naive Σx² loses precision when |mean| ≫ stddev — compare at
    rounded precision (the oracle rounds to 4dp)."""
    num_buckets = resolve_num_buckets(num_buckets)
    n_c, s_c, s2_c = f"__{prefix}n", f"__{prefix}s", f"__{prefix}s2"

    def _partial(batch: pd.DataFrame) -> pd.DataFrame:
        if decimals is None:
            x = batch[value_col].astype(np.float64)
        else:
            x = pd.Series(
                np.round(batch[value_col].to_numpy(np.float64)
                         * 10.0 ** decimals).astype(np.int64),
                index=batch.index)
        g = batch.assign(**{s_c: x, s2_c: x * x}).groupby(keys, sort=False)
        out = g.agg(**{n_c: (value_col, "size"), s_c: (s_c, "sum"),
                       s2_c: (s2_c, "sum")})
        return out.reset_index()

    partials = ds.map_batches(_partial, batch_format="pandas",
                              batch_size=1 << 17)
    combined = bucketed_combine(partials, keys,
                                {n_c: "sum", s_c: "sum", s2_c: "sum"},
                                num_buckets)

    def _finish(batch: pd.DataFrame) -> pd.DataFrame:
        n = batch[n_c].astype(np.float64)
        if decimals is None:
            mean = batch[s_c] / n
            var = (batch[s2_c] - batch[s_c] * mean) / (n - ddof)
            var = var.clip(lower=0.0)  # guard tiny negative fp residue
        else:
            # exact-integer numerators, ONE float division each —
            # mirrored token-for-token by the SQL oracle
            scale = 10.0 ** decimals
            sc = batch[s_c].to_numpy(np.int64)
            sc2 = batch[s2_c].to_numpy(np.int64)
            ni = batch[n_c].to_numpy(np.int64)
            mean = sc.astype(np.float64) / (scale * n.to_numpy())
            numer = (ni * sc2 - sc * sc).astype(np.float64)
            with np.errstate(divide="ignore", invalid="ignore"):
                var = numer / ((scale * scale * n.to_numpy())
                               * (n.to_numpy() - ddof))
            var = np.clip(var, 0.0, None)
        batch[f"{prefix}n"] = batch[n_c].astype(np.int64)
        batch[f"{prefix}mean"] = mean
        batch[f"{prefix}var"] = var
        batch[f"{prefix}std"] = np.sqrt(var)
        return batch.drop(columns=[n_c, s_c, s2_c])

    return combined.map_batches(_finish, batch_format="pandas")


def grouped_corr(ds: rd.Dataset, keys: list[str], x_col: str, y_col: str,
                 out_col: str = "corr", num_buckets: int = 0) -> rd.Dataset:
    """Per-key Pearson correlation via the same raw-moment shipping:
    blocks emit (n, Σx, Σy, Σx², Σy², Σxy) per key, one bucketed
    sum-combine, closed-form finish. Keys with zero variance on either
    side yield NaN (SQL NULL)."""
    num_buckets = resolve_num_buckets(num_buckets)
    cols = ["__n", "__sx", "__sy", "__sxx", "__syy", "__sxy"]

    def _partial(batch: pd.DataFrame) -> pd.DataFrame:
        x = batch[x_col].astype(np.float64)
        y = batch[y_col].astype(np.float64)
        ext = batch.assign(__sx=x, __sy=y, __sxx=x * x, __syy=y * y,
                           __sxy=x * y)
        g = ext.groupby(keys, sort=False)
        out = g.agg(__n=(x_col, "size"), __sx=("__sx", "sum"),
                    __sy=("__sy", "sum"), __sxx=("__sxx", "sum"),
                    __syy=("__syy", "sum"), __sxy=("__sxy", "sum"))
        return out.reset_index()

    partials = ds.map_batches(_partial, batch_format="pandas",
                              batch_size=1 << 17)
    combined = bucketed_combine(partials, keys, {c: "sum" for c in cols},
                                num_buckets)

    def _finish(batch: pd.DataFrame) -> pd.DataFrame:
        n = batch["__n"].astype(np.float64)
        cov = batch["__sxy"] - batch["__sx"] * batch["__sy"] / n
        vx = batch["__sxx"] - batch["__sx"] ** 2 / n
        vy = batch["__syy"] - batch["__sy"] ** 2 / n
        denom = np.sqrt(vx * vy)
        with np.errstate(invalid="ignore", divide="ignore"):
            batch[out_col] = np.where(denom > 0, cov / denom, np.nan)
        return batch.drop(columns=cols)

    return combined.map_batches(_finish, batch_format="pandas")


def grouped_regression(ds: rd.Dataset, keys: list[str], x_col: str,
                       y_col: str, num_buckets: int = 0) -> rd.Dataset:
    """Per-key simple OLS (``y = slope·x + intercept``) plus r² via the
    same raw-moment shipping as ``grouped_corr``: blocks emit
    (n, Σx, Σy, Σx², Σy², Σxy) per key — six doubles, never rows — one
    bucketed sum-combine, closed-form finish. SQL parity:
    ``regr_slope(y, x)`` / ``regr_intercept`` / ``regr_r2``. Keys with
    zero x-variance yield NULL slope/intercept/r2 (the SQL convention).
    At 100 TB the shuffle is keys × blocks fixed-width rows regardless
    of input size."""
    num_buckets = resolve_num_buckets(num_buckets)
    cols = ["__n", "__sx", "__sy", "__sxx", "__syy", "__sxy"]

    def _partial(batch: pd.DataFrame) -> pd.DataFrame:
        x = batch[x_col].astype(np.float64)
        y = batch[y_col].astype(np.float64)
        ext = batch.assign(__sx=x, __sy=y, __sxx=x * x, __syy=y * y,
                           __sxy=x * y)
        g = ext.groupby(keys, sort=False)
        out = g.agg(__n=(x_col, "size"), __sx=("__sx", "sum"),
                    __sy=("__sy", "sum"), __sxx=("__sxx", "sum"),
                    __syy=("__syy", "sum"), __sxy=("__sxy", "sum"))
        return out.reset_index()

    partials = ds.map_batches(_partial, batch_format="pandas",
                              batch_size=1 << 17)
    combined = bucketed_combine(partials, keys, {c: "sum" for c in cols},
                                num_buckets)

    def _finish(batch: pd.DataFrame) -> pd.DataFrame:
        n = batch["__n"].astype(np.float64)
        cov = batch["__sxy"] - batch["__sx"] * batch["__sy"] / n
        vx = batch["__sxx"] - batch["__sx"] ** 2 / n
        vy = batch["__syy"] - batch["__sy"] ** 2 / n
        with np.errstate(invalid="ignore", divide="ignore"):
            slope = np.where(vx > 0, cov / vx, np.nan)
            intercept = np.where(
                vx > 0, (batch["__sy"] - slope * batch["__sx"]) / n, np.nan)
            # regr_r2 = corr² when both variances positive; when the y
            # side is constant (vy == 0) DuckDB returns 1.0.
            r2 = np.where(vx > 0,
                          np.where(vy > 0, (cov * cov) / (vx * vy), 1.0),
                          np.nan)
        batch["n"] = batch["__n"].astype(np.int64)
        batch["slope"] = slope
        batch["intercept"] = intercept
        batch["r2"] = r2
        return batch.drop(columns=cols)

    return combined.map_batches(_finish, batch_format="pandas")


def rollup_agg(ds: rd.Dataset, keys: list[str], specs: list[AggSpec],
               marker: str = "ALL", num_buckets: int = 0) -> rd.Dataset:
    """``GROUP BY ROLLUP(keys)`` for re-aggregable functions
    (sum/count/min/max): the INPUT is aggregated once at the finest level
    (the only pass that sees input rows), then every coarser level —
    down to the grand total — re-aggregates the finest RESULT, which is
    keys-cardinality small. Rolled-up key columns carry ``marker``
    (the SQL mirror is ``COALESCE(key, marker)``), so keys must be
    string-typed. Shuffle cost = one combiner groupby over the input +
    len(keys) tiny aggregations over aggregates."""
    num_buckets = resolve_num_buckets(num_buckets)
    for f, _, _ in specs:
        if f not in ("sum", "count", "min", "max"):
            raise ValueError(f"rollup_agg needs re-aggregable funcs, got {f!r}")

    # materialize: the finest level is reused by every coarser branch, and
    # Ray Datasets are lazy — without this each union arm would re-execute
    # the whole input aggregation. The materialized table is one row per
    # key combination (keys-cardinality small), never the input.
    finest = preagg_groupby(ds, keys, specs, num_buckets).materialize()
    # re-aggregating the finest level: counts become sums of counts
    respec = [("sum" if f in ("sum", "count") else f, o, o)
              for f, _, o in specs]

    levels = [finest]
    for i in range(len(keys) - 1, -1, -1):
        kept = keys[:i]
        if kept:
            lvl = preagg_groupby(finest, kept, respec, num_buckets=8)
        else:
            def _tag(batch: pd.DataFrame) -> pd.DataFrame:
                batch = batch.copy()
                batch["__all"] = 0
                return batch
            lvl = preagg_groupby(
                finest.map_batches(_tag, batch_format="pandas"),
                ["__all"], respec, num_buckets=1)
            lvl = lvl.map_batches(
                lambda b: b.drop(columns="__all"), batch_format="pandas")

        def _fill(batch: pd.DataFrame, _kept=tuple(kept)) -> pd.DataFrame:
            batch = batch.copy()
            for k in keys:
                if k not in _kept:
                    batch[k] = marker
            return batch[keys + [o for _, _, o in specs]]

        levels.append(lvl.map_batches(_fill, batch_format="pandas"))

    out = levels[0].map_batches(
        lambda b: b[keys + [o for _, _, o in specs]], batch_format="pandas")
    for lvl in levels[1:]:
        out = out.union(lvl)
    return out


def cube_agg(ds: rd.Dataset, keys: list[str], specs: list[AggSpec],
             marker: str = "ALL", num_buckets: int = 0) -> rd.Dataset:
    """``GROUP BY CUBE(keys)`` — every one of the 2**len(keys) grouping
    sets — with the same derivation strategy as :func:`rollup_agg`: the
    input is aggregated ONCE at the finest level, and every other
    grouping set re-aggregates that keys-cardinality-small result, so
    the input rows are read exactly once no matter how many sets the
    cube expands to. Functions must be re-aggregable (sum/count/min/max;
    counts re-aggregate as sums). Rolled-up key columns carry ``marker``
    (SQL mirror: ``COALESCE(key, marker)``), so keys must be strings."""
    num_buckets = resolve_num_buckets(num_buckets)
    from itertools import combinations

    for f, _, _ in specs:
        if f not in ("sum", "count", "min", "max"):
            raise ValueError(f"cube_agg needs re-aggregable funcs, got {f!r}")

    # materialize — see rollup_agg: lazy reuse across 2**len(keys) union
    # arms would re-run the input aggregation per arm. The materialized
    # finest level is keys-cardinality small, never the input.
    finest = preagg_groupby(ds, keys, specs, num_buckets).materialize()
    respec = [("sum" if f in ("sum", "count") else f, o, o)
              for f, _, o in specs]

    def _project(lvl: rd.Dataset, kept: tuple[str, ...]) -> rd.Dataset:
        def _fill(batch: pd.DataFrame, _kept=kept) -> pd.DataFrame:
            batch = batch.copy()
            for k in keys:
                if k not in _kept:
                    batch[k] = marker
            return batch[keys + [o for _, _, o in specs]]
        return lvl.map_batches(_fill, batch_format="pandas")

    out = _project(finest, tuple(keys))
    for r in range(len(keys) - 1, -1, -1):
        for kept in combinations(keys, r):
            if kept:
                lvl = preagg_groupby(finest, list(kept), respec,
                                     num_buckets=8)
            else:
                def _tag(batch: pd.DataFrame) -> pd.DataFrame:
                    batch = batch.copy()
                    batch["__all"] = 0
                    return batch
                lvl = preagg_groupby(
                    finest.map_batches(_tag, batch_format="pandas"),
                    ["__all"], respec, num_buckets=1)
                lvl = lvl.map_batches(
                    lambda b: b.drop(columns="__all"),
                    batch_format="pandas")
            out = out.union(_project(lvl, kept))
    return out


def grouping_sets_agg(ds: rd.Dataset, keys: list[str],
                      sets: list[tuple[str, ...]], specs: list[AggSpec],
                      marker: str = "ALL",
                      num_buckets: int = 0) -> rd.Dataset:
    """``GROUP BY GROUPING SETS (...)`` for arbitrary subsets of ``keys``
    — the general form of :func:`rollup_agg` / :func:`cube_agg`
    (reference analog: the ad-hoc multi-granularity QAQC counters,
    /root/reference/belb/kbs/query.py:196-232 runs one query per
    granularity). Same one-pass strategy: the input is aggregated ONCE at
    the finest level (all of ``keys``), then every requested set
    re-aggregates that keys-cardinality-small materialized result.
    Functions must be re-aggregable (sum/count/min/max); rolled-up key
    columns carry ``marker`` (SQL mirror: ``COALESCE(key, marker)``), so
    keys must be strings. Duplicate sets are emitted once; a requested
    set not ⊆ keys raises."""
    num_buckets = resolve_num_buckets(num_buckets)
    for f, _, _ in specs:
        if f not in ("sum", "count", "min", "max"):
            raise ValueError(
                f"grouping_sets_agg needs re-aggregable funcs, got {f!r}")
    norm: list[tuple[str, ...]] = []
    for s in sets:
        t = tuple(k for k in keys if k in s)
        if len(t) != len(s):
            raise ValueError(f"grouping set {s!r} is not a subset of {keys}")
        if t not in norm:
            norm.append(t)
    if not norm:
        raise ValueError("grouping_sets_agg needs at least one set")

    # materialize — see rollup_agg: the finest level feeds every set's
    # union arm; lazily it would re-run the input aggregation per arm.
    finest = preagg_groupby(ds, keys, specs, num_buckets).materialize()
    respec = [("sum" if f in ("sum", "count") else f, o, o)
              for f, _, o in specs]

    def _project(lvl: rd.Dataset, kept: tuple[str, ...]) -> rd.Dataset:
        def _fill(batch: pd.DataFrame, _kept=kept) -> pd.DataFrame:
            batch = batch.copy()
            for k in keys:
                if k not in _kept:
                    batch[k] = marker
            return batch[keys + [o for _, _, o in specs]]
        return lvl.map_batches(_fill, batch_format="pandas")

    out = None
    for kept in norm:
        if kept == tuple(keys):
            lvl = finest
        elif kept:
            lvl = preagg_groupby(finest, list(kept), respec, num_buckets=8)
        else:
            def _tag(batch: pd.DataFrame) -> pd.DataFrame:
                batch = batch.copy()
                batch["__all"] = 0
                return batch
            lvl = preagg_groupby(
                finest.map_batches(_tag, batch_format="pandas"),
                ["__all"], respec, num_buckets=1)
            lvl = lvl.map_batches(
                lambda b: b.drop(columns="__all"), batch_format="pandas")
        arm = _project(lvl, kept)
        out = arm if out is None else out.union(arm)
    return out


def higher_moment_stats(ds: rd.Dataset, keys: list[str], value_col: str,
                        num_buckets: int = 0,
                        decimals: int | None = None) -> rd.Dataset:
    """Per-key population skewness and excess kurtosis by the same
    raw-moment shipping as :func:`moment_stats`, extended to Σx³/Σx⁴:
    each block emits five doubles per key (n, Σx, Σx², Σx³, Σx⁴) — fixed
    width regardless of rows — one bucketed sum-combine, closed-form
    finish from central moments::

        m2 = Σx²/n − μ²
        m3 = Σx³/n − 3μΣx²/n + 2μ³
        m4 = Σx⁴/n − 4μΣx³/n + 6μ²Σx²/n − 3μ⁴
        skew = m3 / m2^1.5,  kurt = m4 / m2² − 3

    The SQL oracle mirrors this arithmetic expression-for-expression from
    SUM(x)/SUM(x²)/SUM(x³)/SUM(x⁴)/COUNT, compared at 4dp (naive raw
    moments lose precision when |mean| ≫ stddev — same caveat as
    moment_stats)."""
    num_buckets = resolve_num_buckets(num_buckets)
    cols = [f"__m{i}" for i in range(5)]
    if decimals is not None:
        # exact-units Σx for a partitioning-independent MEAN (same
        # device as moment_stats(decimals=...)); the skew/kurt central
        # moments would need 128-bit Σx³/Σx⁴ sums, so they stay float —
        # their 4dp boundary exposure is orders smaller than the mean's
        # was (the mean divides a large near-cancellation-free sum)
        cols = cols + ["__mexact"]

    def _partial(batch: pd.DataFrame) -> pd.DataFrame:
        x = batch[value_col].to_numpy(dtype=np.float64)
        x2 = x * x
        extra = {}
        if decimals is not None:
            extra["__mexact"] = pd.Series(
                np.round(x * 10.0 ** decimals).astype(np.int64),
                index=batch.index)
        g = batch.assign(**{cols[1]: x, cols[2]: x2, cols[3]: x2 * x,
                            cols[4]: x2 * x2, **extra}).groupby(keys,
                                                               sort=False)
        out = g.agg(**{cols[0]: (value_col, "size"),
                       **{c: (c, "sum") for c in cols[1:]}})
        return out.reset_index()

    partials = ds.map_batches(_partial, batch_format="pandas",
                              batch_size=1 << 17)
    combined = bucketed_combine(partials, keys,
                                {c: "sum" for c in cols}, num_buckets)

    def _finish(batch: pd.DataFrame) -> pd.DataFrame:
        n = batch[cols[0]].astype(np.float64)
        mu = batch[cols[1]] / n
        r2, r3, r4 = (batch[cols[2]] / n, batch[cols[3]] / n,
                      batch[cols[4]] / n)
        m2 = (r2 - mu * mu).clip(lower=0.0)
        m3 = r3 - 3.0 * mu * r2 + 2.0 * mu ** 3
        m4 = r4 - 4.0 * mu * r3 + 6.0 * mu * mu * r2 - 3.0 * mu ** 4
        batch["n"] = batch[cols[0]].astype(np.int64)
        if decimals is None:
            batch["mean"] = mu
        else:
            batch["mean"] = (batch["__mexact"].to_numpy(np.int64)
                             .astype(np.float64)
                             / (10.0 ** decimals * n.to_numpy()))
        with np.errstate(divide="ignore", invalid="ignore"):
            batch["skew"] = m3 / np.power(m2, 1.5)
            batch["kurt"] = m4 / (m2 * m2) - 3.0
        return batch.drop(columns=cols)

    return combined.map_batches(_finish, batch_format="pandas")


def corr_matrix(ds: rd.Dataset, cols: list[str], round_to: int = 6,
                out_a: str = "col_a", out_b: str = "col_b") -> rd.Dataset:
    """Full Pearson correlation matrix over ``cols`` in ONE pass →
    long-form rows (col_a, col_b, corr) for every pair a < b.

    Scale shape: each block emits ONE fixed-width partial row — n, Σx_i
    and the upper triangle of XᵀX (k + k(k+1)/2 doubles, independent of
    row count) via a single matmul; the tiny partials concatenate in one
    task and finish closed-form. The k²-vs-k amortization is the point:
    computing k(k−1)/2 pairwise correlations costs the same single data
    pass as one."""
    k = len(cols)
    iu = np.triu_indices(k)

    def _partial(batch: pd.DataFrame) -> pd.DataFrame:
        x = batch[cols].to_numpy(np.float64)
        xtx = (x.T @ x)[iu]
        row = {"__n": np.float64(len(x))}
        row.update({f"__s{i}": x[:, i].sum() for i in range(k)})
        row.update({f"__m{i}_{j}": v
                    for (i, j), v in zip(zip(*iu), xtx)})
        return pd.DataFrame([row])

    partials = ds.select_columns(cols).map_batches(
        _partial, batch_format="pandas", batch_size=1 << 17)

    def _finish(df: pd.DataFrame) -> pd.DataFrame:
        n = df["__n"].sum()
        s = np.array([df[f"__s{i}"].sum() for i in range(k)])
        m = np.zeros((k, k))
        for i, j in zip(*iu):
            m[i, j] = m[j, i] = df[f"__m{i}_{j}"].sum()
        cov = m - np.outer(s, s) / n
        d = np.sqrt(np.diag(cov))
        with np.errstate(invalid="ignore", divide="ignore"):
            c = cov / np.outer(d, d)
        a_idx, b_idx = np.triu_indices(k, 1)
        # canonical (name-sorted) pair orientation — corr is symmetric
        names = [tuple(sorted((cols[i], cols[j])))
                 for i, j in zip(a_idx, b_idx)]
        return pd.DataFrame({
            out_a: [a for a, _ in names],
            out_b: [b for _, b in names],
            "corr": round_half_away(c[a_idx, b_idx], round_to)})

    return partials.repartition(1).map_batches(
        _finish, batch_size=None, batch_format="pandas")
