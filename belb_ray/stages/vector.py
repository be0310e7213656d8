"""Vector-column aggregates over `list<float>` embedding columns.

``grouped_vector_mean`` computes per-group centroid vectors — the class-
prototype step of embedding-space analysis (label centroids for
SemDeDup-style clustering QA, per-source embedding drift, prototype
classifiers).

Scale shape (100 TB): each block reduces to ONE fixed-width row per key
— (key, n, Σdim_0 … Σdim_{d−1}) — via a zero-copy matrix view and
`np.add.reduceat` over the key-sorted block; one bucketed combine sums
the partials, and the finish divides. The exchange is
O(#keys × d floats) regardless of row count; rows never shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from .agg import bucketed_combine
from .ann import list_column_matrix


def grouped_vector_mean(
    ds: rd.Dataset,
    key: str,
    vec_col: str,
    dim: int,
    round_to: int = 6,
    num_buckets: int = 16,
    long_form: bool = True,
) -> rd.Dataset:
    """Per-group mean vector → long form (key, dim_idx [1-based],
    mean_val) when ``long_form`` (SQL-mirrorable via
    ``avg(embedding[i])``), else wide (key, n, mean list<double>)."""
    sum_cols = [f"__s{j}" for j in range(dim)]

    def _partial(batch: pa.Table) -> pa.Table:
        mat = list_column_matrix(batch[vec_col])
        if mat.shape[0] and mat.shape[1] != dim:
            raise ValueError(
                f"grouped_vector_mean: expected dim {dim}, "
                f"got {mat.shape[1]}")
        keys = batch[key].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(keys, kind="stable")
        keys_s = keys[order]
        starts = np.concatenate(
            ([0], np.flatnonzero(keys_s[1:] != keys_s[:-1]) + 1)) \
            if len(keys_s) else np.array([], np.int64)
        if len(keys_s) == 0:
            cols = {key: keys_s, "__n": np.array([], np.int64)}
            cols.update({c: np.array([], np.float64) for c in sum_cols})
            return pa.table(cols)
        sums = np.add.reduceat(mat[order], starts, axis=0)
        counts = np.diff(np.concatenate((starts, [len(keys_s)])))
        cols = {key: keys_s[starts],
                "__n": counts.astype(np.int64)}
        cols.update({c: sums[:, j] for j, c in enumerate(sum_cols)})
        return pa.table(cols)

    partials = ds.select_columns([key, vec_col]).map_batches(
        _partial, batch_format="pyarrow")
    combined = bucketed_combine(
        partials, [key], {"__n": "sum", **{c: "sum" for c in sum_cols}},
        num_buckets)

    if long_form:
        def _finish(df: pd.DataFrame) -> pd.DataFrame:
            n = df["__n"].to_numpy(np.float64)
            k = len(df)
            means = np.round(
                df[sum_cols].to_numpy(np.float64) / n[:, None], round_to)
            return pd.DataFrame({
                key: np.repeat(df[key].to_numpy(), dim),
                "dim_idx": np.tile(np.arange(1, dim + 1, dtype=np.int64),
                                   k),
                "mean_val": means.ravel()})
    else:
        def _finish(df: pd.DataFrame) -> pd.DataFrame:
            n = df["__n"].to_numpy(np.float64)
            means = np.round(
                df[sum_cols].to_numpy(np.float64) / n[:, None], round_to)
            return pd.DataFrame({
                key: df[key].to_numpy(),
                "n": df["__n"].to_numpy(np.int64),
                "mean": list(means)})

    return combined.map_batches(_finish, batch_format="pandas")
