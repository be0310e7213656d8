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
import pyarrow as pa
import ray.data as rd


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
    num_buckets = 64

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
