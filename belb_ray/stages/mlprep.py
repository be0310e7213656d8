"""ML data-prep operators: smoothed target encoding, deterministic
train/val/test splitting, per-group quota sampling.

Reference analog: the reference's evaluation-subset construction
(/root/reference/belb/scripts/get_mentions_subsets.py:82-140 — stratified
zeroshot slicing) generalized to the standard feature-engineering /
dataset-assembly ops of an ML training pipeline.

Scale shapes (100 TB):
- ``target_encode``: per-batch fixed-width (sum, count) partials per
  category → one bucketed combine; the global prior is a 2-number driver
  reduce. Rows never shuffle.
- ``dataset_split``: stateless per-batch hash bucketing against float-free
  integer cut points — deterministic, partition-independent, no shuffle.
- ``quota_sample``: one group-bucket shuffle, then whole-bucket vectorized
  rank-and-take (sort by (group, hash, key), cumcount) — no per-group
  Python dispatch; deterministic under any partitioning.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from .agg import _bucket_of_frame, bucketed_combine
from .sampling import MD5_SPACE, _md5_hash60

from belb_ray.util import resolve_num_buckets
from ..util import round_half_away


def target_encode(ds: rd.Dataset, cat_col: str, target_col: str,
                  smoothing: float = 20.0, scale: float = 100.0,
                  num_buckets: int = 0) -> rd.Dataset:
    """Smoothed mean target encoding → (cat_col, n, te) with
    ``te = (sum_cat + m·prior) / (n_cat + m)``, prior = global mean.

    Targets are snapped to integer units (``round(target·scale)``) so the
    distributed partial sums are EXACT (int64) and the float arithmetic
    that follows is reproducible regardless of combine order — the same
    cents trick as the revenue queries; te is reported in original units.
    """

    num_buckets = resolve_num_buckets(num_buckets)
    def _partial(batch: pd.DataFrame) -> pd.DataFrame:
        units = round_half_away(batch[target_col].to_numpy(dtype=np.float64)
                         * scale).astype(np.int64)
        g = pd.DataFrame({cat_col: batch[cat_col], "__s": units})
        out = g.groupby(cat_col, sort=False)["__s"].agg(["sum", "size"])
        return pd.DataFrame({cat_col: out.index, "__s": out["sum"],
                             "__n": out["size"].astype(np.int64)})

    partials = ds.map_batches(_partial, batch_format="pandas",
                              batch_size=1 << 17)
    agg = bucketed_combine(partials, [cat_col],
                           {"__s": "sum", "__n": "sum"}, num_buckets)
    # global prior: a 2-number reduce over the (few) category rows
    totals = agg.to_pandas()
    prior_units = float(totals["__s"].sum()) / float(totals["__n"].sum())

    def _finish(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch["__s"].to_numpy(dtype=np.float64)
        n = batch["__n"].to_numpy(dtype=np.float64)
        te_units = (s + smoothing * prior_units) / (n + smoothing)
        return pd.DataFrame({cat_col: batch[cat_col],
                             "n": batch["__n"].astype(np.int64),
                             "te": round_half_away(te_units / scale, 4)})

    return agg.map_batches(_finish, batch_format="pandas")


def dataset_split(ds: rd.Dataset, key: str,
                  fracs: dict[str, float] | None = None,
                  seed: int = 0) -> rd.Dataset:
    """Deterministic train/val/test assignment → input columns + ``split``.

    A row's split is decided by where the md5 hash of (key, seed) falls
    among integer cut points ``floor(cum_frac · 16^15)`` — reproducible,
    partition-independent, and SQL-mirrorable. Fractions must sum to ≤ 1;
    any remainder falls into the last split."""
    fracs = fracs or {"train": 0.8, "val": 0.1, "test": 0.1}
    names = list(fracs)
    cum, cuts = 0.0, []
    for nm in names[:-1]:
        cum += fracs[nm]
        cuts.append(np.int64(int(cum * MD5_SPACE)))
    cuts_arr = np.array(cuts, dtype=np.int64)

    def _f(batch: pa.Table) -> pa.Table:
        h = _md5_hash60(batch[key], seed)
        idx = np.searchsorted(cuts_arr, h, side="right")
        labels = pa.array(np.array(names, dtype=object)[idx], pa.string())
        return batch.append_column("split", labels)

    return ds.map_batches(_f, batch_format="pyarrow")


def quota_sample(ds: rd.Dataset, group_col: str, n_per_group: int,
                 key: str, seed: int = 0,
                 num_buckets: int = 0) -> rd.Dataset:
    """Keep at most ``n_per_group`` rows per group, chosen deterministically
    by md5-hash order (ties broken by key) — the curation op that caps any
    one source/domain's contribution to a training mixture."""

    num_buckets = resolve_num_buckets(num_buckets)
    def _bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["__h"] = _md5_hash60(pa.array(batch[key]), seed)
        batch["__bucket"] = _bucket_of_frame(batch, [group_col], num_buckets)
        return batch

    def _take(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([group_col, "__h", key], kind="stable")
        rank = g.groupby(group_col, sort=False).cumcount()
        return (g[rank < n_per_group]
                .drop(columns=["__h", "__bucket"]))

    return (ds.map_batches(_bucketize, batch_format="pandas",
                           batch_size=1 << 17)
            .groupby("__bucket").map_groups(_take, batch_format="pandas"))


def leakage_safe_split(docs: rd.Dataset, id_col: str = "doc_id",
                       text_col: str = "text",
                       fracs: dict[str, float] | None = None,
                       seed: int = 0,
                       num_buckets: int = 0) -> rd.Dataset:
    """Dedup-aware train/test split: exact-duplicate documents always
    land in the SAME split, so no content leaks across the train/eval
    boundary. Returns (id, rep_id, split).

    Shape: the doc→group mapping comes from ``exact_dup_groups`` (one
    bucketed md5 shuffle, min-id representative); the representative id
    attaches back via the size-guarded broadcast join (group table ≈
    distinct contents; partitioned fallback above the threshold); the
    split decision is ``dataset_split`` on the REPRESENTATIVE id, so
    every member of a dup group hashes identically."""
    num_buckets = resolve_num_buckets(num_buckets)
    import hashlib

    from ..pipelines.docdedup import exact_dup_groups
    from .analytic import _attach_small

    groups = exact_dup_groups(docs, id_col=id_col, text_col=text_col,
                              num_buckets=num_buckets)

    def _keyed(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        md5 = hashlib.md5
        return pa.table({
            id_col: batch[id_col],
            "content_md5": pa.array(
                [md5(t.encode("utf-8")).hexdigest() for t in texts],
                pa.string()),
        })

    keyed = docs.select_columns([id_col, text_col]).map_batches(
        _keyed, batch_format="pyarrow")
    withrep = _attach_small(
        keyed, groups.select_columns(["content_md5", "rep_id"]),
        "content_md5").select_columns([id_col, "rep_id"])
    return dataset_split(withrep, key="rep_id", fracs=fracs, seed=seed)
