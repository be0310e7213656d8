"""Per-document interval assignment (SURVEY §2.5 J8).

The reference assigns annotation spans to their containing passage /
sentence with a range predicate evaluated per document
(belb/preprocessing/data.py:595-609, belb/preprocessing/segment.py:118-145).
Distributed form: all intervals of a document are co-located by a
``groupby(doc_id)`` (one shuffle), then the containment check runs
vectorized inside each group — no global range join is ever needed
because the predicate never crosses documents.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd
from ..util import resolve_num_buckets


def assign_spans_to_segments(
    spans: rd.Dataset,
    segments: rd.Dataset,
    doc_col: str = "doc_id",
) -> rd.Dataset:
    """spans(doc_id, span_id, start, end) × segments(doc_id, seg_id,
    seg_start, seg_end) → (doc_id, span_id, seg_id) for each span fully
    contained in a segment (seg_start ≤ start AND end ≤ seg_end).

    Both sides are tagged and unioned so ONE groupby co-locates each
    document's spans and segments; the per-group check is numpy
    broadcasting (|spans| × |segments| per doc — bounded per document)."""

    def _tag_spans(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            doc_col: t[doc_col],
            "__id": t["span_id"], "__a": t["start"], "__b": t["end"],
            "__side": pa.array(np.zeros(n, np.int8)),
        })

    def _tag_segs(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            doc_col: t[doc_col],
            "__id": t["seg_id"], "__a": t["seg_start"], "__b": t["seg_end"],
            "__side": pa.array(np.ones(n, np.int8)),
        })

    both = (spans.map_batches(_tag_spans, batch_format="pyarrow")
            .union(segments.map_batches(_tag_segs, batch_format="pyarrow")))

    # bucket docs so the shuffle has ~B groups (one Python dispatch per
    # bucket, not per document — same rationale as stages/pairs.py)
    from ..util import resolve_num_buckets
    num_buckets = resolve_num_buckets(0)

    def _bucketize(batch: pa.Table) -> pa.Table:
        d = batch[doc_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = (d * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(num_buckets)
        return batch.append_column("__bucket", pa.array(b.astype(np.int32)))

    def _assign_bucket(group: pa.Table) -> pa.Table:
        docs = group[doc_col].to_numpy(zero_copy_only=False)
        side = group["__side"].to_numpy()
        ids = group["__id"].to_numpy()
        a = group["__a"].to_numpy()
        b = group["__b"].to_numpy()
        order = np.lexsort((side, docs))
        docs, side, ids, a, b = (docs[order], side[order], ids[order],
                                 a[order], b[order])
        starts = np.flatnonzero(np.r_[True, docs[1:] != docs[:-1]])
        bounds = np.r_[starts, len(docs)]
        out_doc, out_span, out_seg = [], [], []
        for lo, hi in zip(bounds[:-1], bounds[1:]):
            sp = slice(lo, lo + int(np.searchsorted(side[lo:hi], 1)))
            sg = slice(sp.stop, hi)
            if sp.stop == lo or sg.start == hi:
                continue
            contains = (a[sg][None, :] <= a[sp][:, None]) & \
                       (b[sp][:, None] <= b[sg][None, :])
            si, gi = np.nonzero(contains)
            if len(si):
                out_doc.append(np.full(len(si), docs[lo]))
                out_span.append(ids[sp][si])
                out_seg.append(ids[sg][gi])
        if not out_doc:
            return pa.table({doc_col: pa.array([], group[doc_col].type),
                             "span_id": pa.array([], pa.int64()),
                             "seg_id": pa.array([], pa.int64())})
        return pa.table({
            doc_col: pa.array(np.concatenate(out_doc), group[doc_col].type),
            "span_id": pa.array(np.concatenate(out_span), pa.int64()),
            "seg_id": pa.array(np.concatenate(out_seg), pa.int64()),
        })

    bucketed = both.map_batches(_bucketize, batch_format="pyarrow")
    return (bucketed.groupby("__bucket")
            .map_groups(lambda g: _assign_bucket(g.drop_columns(["__bucket"])),
                        batch_format="pyarrow"))


def merge_intervals(ds: rd.Dataset, key: str, start_col: str,
                    end_col: str, num_buckets: int = 0) -> rd.Dataset:
    """Union of overlapping/touching intervals per key → one row per
    maximal merged island: (key, start_col = min start, end_col = max
    end). The gaps-and-islands primitive (coverage spans, downtime
    windows, span coalescing).

    Island rule (mirrored by the SQL window form): intervals sort by
    (start, end) within a key; an interval opens a NEW island iff its
    start exceeds the running max end of all earlier intervals.
    Touching intervals (start == previous max end) merge.

    Distributed shape: ONE hash(key) co-location shuffle; per bucket a
    whole-bucket vectorized pass (lexsort, per-key shifted cumulative
    max, island ids by cumsum, min/max per island via reduceat)."""
    num_buckets = resolve_num_buckets(num_buckets)
    from .agg import _bucket_of_frame

    def _bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch[[key, start_col, end_col]]
        batch = batch.assign(
            __bucket=_bucket_of_frame(batch, [key], num_buckets))
        return batch

    def _merge(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop(columns="__bucket").sort_values(
            [key, start_col, end_col], kind="mergesort")
        kv = g[key].to_numpy()
        s = g[start_col].to_numpy()
        e = g[end_col].to_numpy()
        n = len(g)
        if n == 0:
            return pd.DataFrame({key: kv, start_col: s, end_col: e})
        newkey = np.ones(n, dtype=bool)
        newkey[1:] = kv[1:] != kv[:-1]
        # per-key SHIFTED cumulative max of end: pandas grouped cummax
        # then a global shift(1) — the shift leaks the previous key's
        # max into each key's FIRST row only, which first_of_key masks
        # below by always opening an island there
        pmax = pd.Series(e).groupby(
            pd.Series(np.cumsum(newkey))).cummax().shift(1).to_numpy()
        first_of_key = newkey
        new_island = first_of_key | (s > np.where(
            np.isnan(pmax), -np.inf, pmax))
        # pmax's shift(1) leaks the previous KEY's max into each key's
        # first row — masked by first_of_key always opening an island
        isl = np.cumsum(new_island) - 1
        starts = np.flatnonzero(new_island)
        out_s = s[starts]
        out_e = np.maximum.reduceat(e, starts)
        return pd.DataFrame({key: kv[starts], start_col: out_s,
                             end_col: out_e})

    return (ds.map_batches(_bucketize, batch_format="pandas")
            .groupby("__bucket").map_groups(_merge,
                                            batch_format="pandas"))
