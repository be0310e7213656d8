"""Span-level annotation ops: list-merge grouping (A6) and per-document
overlap suppression (J9).

- ``merge_span_identifiers`` — reference: annotations identical except
  their identifiers collapse into ONE annotation whose ``identifiers`` is
  the merged list (belb/preprocessing/data.py:493-532 — SURVEY §2.6 A6).
  Ray form: one bucketed shuffle on the span key hash, vectorized pandas
  combine per bucket, identifiers emitted as a SORTED DISTINCT
  ``list<string>`` column (SURVEY §1.4: no ';'-string packing).
- ``suppress_overlapping`` — reference: foreign annotations that overlap,
  nest, equal, or share surface text with a gold annotation of the same
  document are dropped (belb/preprocessing/data.py:549-567 — SURVEY §2.5
  J9). Ray form: gold and foreign rows co-locate via one groupby on a
  doc-hash bucket; the overlap/text check is numpy broadcasting per doc.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from belb_ray.util import resolve_num_buckets


def merge_span_identifiers(
    anns: rd.Dataset,
    key_cols: tuple = ("doc_id", "start", "end", "text", "entity_type"),
    id_col: str = "identifier",
    num_buckets: int = 0,
) -> rd.Dataset:
    """anns(key_cols..., identifier) → one row per distinct key with
    ``identifiers: list<string>`` (sorted distinct) + ``n_ids``."""
    keys = list(key_cols)

    def _bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        from .agg import _bucket_of_frame

        batch = batch[keys + [id_col]].copy()
        batch["__bucket"] = _bucket_of_frame(batch, keys, num_buckets)
        return batch

    def _merge(group: pd.DataFrame) -> pa.Table:
        dd = (group.drop(columns="__bucket").drop_duplicates()
              .sort_values(keys + [id_col], kind="stable"))
        n = len(dd)
        if n == 0:
            return pa.table(
                {**{c: pa.array([]) for c in keys},
                 "identifiers": pa.array([], pa.list_(pa.string())),
                 "n_ids": pa.array([], pa.int64())})
        # whole-bucket vectorized list assembly: group boundaries by one
        # shifted compare per key column, then ListArray.from_arrays over
        # the sorted identifier values — no per-group Python agg(list)
        change = np.zeros(n, dtype=bool)
        change[0] = True
        for c in keys:
            v = dd[c].to_numpy()
            change[1:] |= v[1:] != v[:-1]
        starts = np.flatnonzero(change)
        offsets = np.concatenate((starts, [n])).astype(np.int32)
        lists = pa.ListArray.from_arrays(
            pa.array(offsets), pa.array(dd[id_col], pa.string()))
        firsts = dd.iloc[starts]
        arrays = {c: pa.array(firsts[c]) for c in keys}
        arrays["identifiers"] = lists
        arrays["n_ids"] = pa.array(np.diff(offsets).astype(np.int64))
        return pa.table(arrays)

    bucketed = anns.map_batches(_bucketize, batch_format="pandas",
                                batch_size=1 << 17)
    return bucketed.groupby("__bucket").map_groups(_merge,
                                                   batch_format="pandas")


def suppress_overlapping(
    gold: rd.Dataset,
    foreign: rd.Dataset,
    doc_col: str = "doc_id",
    num_buckets: int = 0,
) -> rd.Dataset:
    """Both inputs: (doc_id, ann_id, start, end, text). Returns the
    foreign rows that survive: no gold annotation of the same document
    overlaps them (start < g_end AND g_start < end — covers overlap,
    nesting and equality) and none shares their surface text."""

    num_buckets = resolve_num_buckets(num_buckets)
    def _tag(side: int):
        def _f(t: pa.Table) -> pa.Table:
            return pa.table({
                doc_col: t[doc_col],
                "ann_id": t["ann_id"], "start": t["start"], "end": t["end"],
                "text": t["text"],
                "__side": pa.array(np.full(t.num_rows, side, np.int8)),
            })

        return _f

    both = (gold.map_batches(_tag(1), batch_format="pyarrow")
            .union(foreign.map_batches(_tag(0), batch_format="pyarrow")))

    def _bucketize(batch: pa.Table) -> pa.Table:
        d = batch[doc_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = (d * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(num_buckets)
        return batch.append_column("__bucket", pa.array(b.astype(np.int32)))

    def _suppress(group: pa.Table) -> pa.Table:
        group = group.drop_columns(["__bucket"])
        docs = group[doc_col].to_numpy(zero_copy_only=False)
        side = group["__side"].to_numpy()
        order = np.lexsort((side, docs))  # per doc: foreign(0) then gold(1)
        docs = docs[order]
        side = side[order]
        ids = group["ann_id"].to_numpy()[order]
        a = group["start"].to_numpy()[order]
        b = group["end"].to_numpy()[order]
        texts = np.asarray(group["text"].to_pylist(), dtype=object)[order]

        starts = np.flatnonzero(np.r_[True, docs[1:] != docs[:-1]])
        bounds = np.r_[starts, len(docs)]
        keep_rows = []
        for lo, hi in zip(bounds[:-1], bounds[1:]):
            split = lo + int(np.searchsorted(side[lo:hi], 1))
            fg = slice(lo, split)
            gd = slice(split, hi)
            if fg.stop == lo:
                continue
            if gd.start == hi:  # no gold in this doc: all foreign survive
                keep_rows.append(np.arange(fg.start, fg.stop))
                continue
            overlap = (a[fg][:, None] < b[gd][None, :]) & \
                      (a[gd][None, :] < b[fg][:, None])
            same_text = texts[fg][:, None] == texts[gd][None, :]
            bad = (overlap | same_text).any(axis=1)
            keep_rows.append(np.arange(fg.start, fg.stop)[~bad])
        if not keep_rows:
            return pa.table({doc_col: pa.array([], group[doc_col].type),
                             "ann_id": pa.array([], group["ann_id"].type),
                             "start": pa.array([], group["start"].type),
                             "end": pa.array([], group["end"].type),
                             "text": pa.array([], pa.string())})
        keep = np.concatenate(keep_rows)
        return pa.table({
            doc_col: pa.array(docs[keep], group[doc_col].type),
            "ann_id": pa.array(ids[keep], group["ann_id"].type),
            "start": pa.array(a[keep], group["start"].type),
            "end": pa.array(b[keep], group["end"].type),
            "text": pa.array(texts[keep].tolist(), pa.string()),
        })

    bucketed = both.map_batches(_bucketize, batch_format="pyarrow")
    return bucketed.groupby("__bucket").map_groups(_suppress,
                                                   batch_format="pyarrow")
