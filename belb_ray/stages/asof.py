"""As-of (time-travel) join — a custom operator Ray Data lacks.

For every left row ``(key, ts)`` attach the latest right row of the same
key with ``right.ts <= left.ts`` (backward as-of; optionally bounded by a
``tolerance``). The reference engine has no temporal joins — this is a
graft extension for event-shaped inputs, built from the same primitives
as ``joins.hash_partition_join``:

1. both sides tag + align schemas, union (no extra pass over either),
2. ONE bucketed shuffle on ``hash(key)`` co-locates a key's rows,
3. per bucket: sort by ts and run ``pandas.merge_asof(by=key)`` —
   a vectorized C merge, no per-row Python.

Partitioning assumption (documented per the task brief): all rows of one
bucket fit a worker's heap. Buckets hash over keys, so only a single
pathologically hot KEY can overflow a bucket — raise ``num_buckets`` for
key-cardinality growth; pre-split hot keys by time range if one key
dominates.

Tie semantics: ``allow_exact_matches=True`` and the right side is
expected unique per ``(key, ts)`` — pre-aggregate duplicates upstream
(the oracle does the same with ``max_by``), otherwise which duplicate
wins is unspecified.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from .joins import _bucket_of

from belb_ray.util import resolve_num_buckets


def asof_join(
    left: rd.Dataset,
    right: rd.Dataset,
    key: str,
    ts: str,
    tolerance: pd.Timedelta | None = None,
    right_suffix: str = "_r",
    num_buckets: int = 0,
    inner: bool = True,
) -> rd.Dataset:
    """Backward as-of join of two Datasets on (``key``, ``ts``).

    ``inner=True`` drops left rows with no matching right row (DuckDB's
    plain ``ASOF JOIN``); ``inner=False`` keeps them with nulls
    (``ASOF LEFT JOIN``).
    """
    num_buckets = resolve_num_buckets(num_buckets)
    import pyarrow as pa

    lschema = left.schema()
    rschema = right.schema()
    lcols = list(lschema.names)
    rcols = [c for c in rschema.names if c != key]
    rcols_out = [c + right_suffix if c in lcols else c for c in rcols]
    rename = dict(zip(rcols, rcols_out))
    ltypes = dict(zip(lschema.names, lschema.types))
    rtypes = {rename.get(c, c): t for c, t in zip(rschema.names, rschema.types)}
    all_cols = [key] + [c for c in lcols if c != key] + rcols_out
    ts_r = rename[ts]

    def _prep(side: int, ren: dict[str, str]):
        def fn(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            batch = batch.rename_columns(
                [ren.get(c, c) for c in batch.column_names])
            cols = {}
            for c in all_cols:
                if c in batch.column_names:
                    cols[c] = batch[c]
                else:
                    cols[c] = pa.nulls(n, ltypes.get(c) or rtypes.get(c))
            out = pa.table(cols)
            out = out.append_column("__bucket",
                                    _bucket_of(out[key], num_buckets))
            return out.append_column(
                "__side", pa.array(np.full(n, side, dtype=np.int8)))

        return fn

    lt = left.map_batches(_prep(0, {}), batch_format="pyarrow")
    rt = right.map_batches(_prep(1, rename), batch_format="pyarrow")
    both = lt.union(rt)

    lkeep = [key] + [c for c in lcols if c != key]
    # the aligned union holds nulls for left-only columns on right rows,
    # so pandas widens their ints to float64; left rows are never null
    # there — restore the original integer dtypes on the way out
    lcast = {c: np.dtype(t.to_pandas_dtype())
             for c, t in ltypes.items()
             if pa.types.is_integer(t)}

    def _asof_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lpart = g[g["__side"] == 0][lkeep]
        rpart = g[g["__side"] == 1][[key, ts_r] + [c for c in rcols_out
                                                   if c != ts_r]]
        # merge_asof needs both frames globally sorted by the on-column
        # (per-key matching comes from by=); mergesort keeps input order
        # stable under ts ties so results don't depend on block order
        lpart = lpart.sort_values(ts, kind="mergesort").reset_index(drop=True)
        rpart = rpart.sort_values(ts_r, kind="mergesort").reset_index(drop=True)
        out = pd.merge_asof(lpart, rpart, left_on=ts, right_on=ts_r,
                            by=key, direction="backward",
                            tolerance=tolerance, allow_exact_matches=True)
        if inner:
            out = out[out[ts_r].notna()]
        return out[all_cols].astype(lcast)

    bucketed = both.groupby("__bucket").map_groups(_asof_bucket,
                                                   batch_format="pandas")
    return bucketed
