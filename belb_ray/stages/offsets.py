"""Document-offset ops: passage assembly (M11) and annotation offset
remapping by word-boundary search (M12).

- ``assemble_passages`` — reference: an Example is built from ordered
  ``(passage_type, passage_text)`` chunks; each passage's offset is the
  running sum of preceding chunk lengths **plus one joining whitespace
  per boundary** (belb/preprocessing/data.py:582-616, the ``offset +=
  len(passage_text) + 1`` accounting; also nlm_chem.py:80-113 — SURVEY
  §2.4 M11). Ray form: one doc-hash bucketed shuffle, then a vectorized
  segmented cumsum per bucket (lexsort + np.cumsum with per-doc base
  subtraction) — no per-doc Python dispatch.
- ``remap_offsets`` — reference: annotations are re-anchored inside
  their passage by a sequential regex scan: sort by original start, for
  each annotation search ``(?<!\\w)escaped_text(?!\\w)`` in
  ``passage_text[last_match:]``, advance ``last_match`` to the match
  end, emit absolute offsets (match + passage offset); annotations that
  never match are DROPPED (belb/preprocessing/data.py:313-362 — SURVEY
  §2.4 M12). Ray form: passages and annotations co-locate via one
  groupby on a (doc, passage)-hash bucket; the per-passage scan is the
  reference's sequential semantics (the ``last_match`` state makes it
  inherently ordered), with patterns compiled once per distinct
  annotation text inside the batch.

Scale notes: both ops shuffle only (id, int, short-text) columns; the
passage text rides exactly once into the remap groupby. Buckets are
doc-hash so skew is bounded by the largest single document.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from belb_ray.util import resolve_num_buckets

_MIX = np.uint64(0x9E3779B97F4A7C15)


def _doc_bucket(ids: np.ndarray, num_buckets: int) -> np.ndarray:
    return ((ids.astype(np.uint64) * _MIX)
            % np.uint64(num_buckets)).astype(np.int32)


def assemble_passages(chunks: rd.Dataset, doc_col: str = "doc_id",
                      idx_col: str = "chunk_idx",
                      type_col: str = "passage_type",
                      text_col: str = "text", sep_len: int = 1,
                      num_buckets: int = 0) -> rd.Dataset:
    """chunks(doc, idx, type, text) → (doc, passage_id, passage_type,
    p_offset, p_len): offsets are the per-document prefix sum of
    ``len(text) + sep_len`` in ``idx`` order, starting at 0.

    (doc, idx) is normally unique; when duplicates occur the tie order
    is pinned deterministically by (p_len, passage_type) so the assigned
    offsets are block-layout-independent (rows identical in all four
    fields are interchangeable)."""

    num_buckets = resolve_num_buckets(num_buckets)
    def _lens(batch: pa.Table) -> pa.Table:
        lens = pa.compute.utf8_length(
            pa.compute.cast(batch[text_col], pa.string()))
        d = batch[doc_col].to_numpy(zero_copy_only=False)
        return pa.table({
            doc_col: batch[doc_col],
            "passage_id": pa.compute.cast(batch[idx_col], pa.int64()),
            "passage_type": batch[type_col],
            "p_len": pa.compute.cast(lens, pa.int64()),
            "__bucket": pa.array(_doc_bucket(d, num_buckets)),
        })

    def _offsets(group: pa.Table) -> pa.Table:
        group = group.drop_columns(["__bucket"])
        doc = group[doc_col].to_numpy(zero_copy_only=False)
        idx = group["passage_id"].to_numpy()
        lens = group["p_len"].to_numpy()
        ptype = group["passage_type"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ptype, lens, idx, doc))
        doc, idx, lens = doc[order], idx[order], lens[order]
        step = lens + sep_len
        csum = np.cumsum(step)
        off = csum - step  # exclusive prefix sum (global)
        # subtract each doc's base so every doc restarts at 0
        starts = np.flatnonzero(np.r_[True, doc[1:] != doc[:-1]])
        runs = np.diff(np.r_[starts, len(doc)])
        off = off - np.repeat(off[starts], runs)
        return pa.table({
            doc_col: pa.array(doc, group[doc_col].type),
            "passage_id": pa.array(idx, pa.int64()),
            "passage_type": group["passage_type"].take(
                pa.array(order, pa.int64())),
            "p_offset": pa.array(off, pa.int64()),
            "p_len": pa.array(lens, pa.int64()),
        })

    bucketed = chunks.map_batches(_lens, batch_format="pyarrow")
    return bucketed.groupby("__bucket").map_groups(
        _offsets, batch_format="pyarrow")


def remap_offsets(passages: rd.Dataset, anns: rd.Dataset,
                  doc_col: str = "doc_id",
                  passage_col: str = "passage_id",
                  num_buckets: int = 0) -> rd.Dataset:
    """passages(doc, passage_id, p_offset, text) ×
    anns(doc, passage_id, ann_id, text, orig_start) →
    (doc, passage_id, ann_id, text, start, end) for every annotation
    whose surface text is found by the sequential word-boundary scan;
    unmatched annotations are dropped (reference logs-and-skips them).

    start/end are absolute: match position + the passage's p_offset.
    The scan order is ``orig_start`` (ties: ann_id) exactly as the
    reference sorts by the incoming start offset."""

    num_buckets = resolve_num_buckets(num_buckets)
    def _tag_passages(t: pa.Table) -> pa.Table:
        d = t[doc_col].to_numpy(zero_copy_only=False)
        n = t.num_rows
        return pa.table({
            doc_col: t[doc_col],
            passage_col: pa.compute.cast(t[passage_col], pa.int64()),
            "ann_id": pa.array(np.zeros(n, np.int64)),
            "text": t["text"],
            "p_offset": pa.compute.cast(t["p_offset"], pa.int64()),
            "orig_start": pa.array(np.zeros(n, np.int64)),
            "__side": pa.array(np.ones(n, np.int8)),
            "__bucket": pa.array(_doc_bucket(d, num_buckets)),
        })

    def _tag_anns(t: pa.Table) -> pa.Table:
        d = t[doc_col].to_numpy(zero_copy_only=False)
        n = t.num_rows
        return pa.table({
            doc_col: t[doc_col],
            passage_col: pa.compute.cast(t[passage_col], pa.int64()),
            "ann_id": pa.compute.cast(t["ann_id"], pa.int64()),
            "text": t["text"],
            "p_offset": pa.array(np.zeros(n, np.int64)),
            "orig_start": pa.compute.cast(t["orig_start"], pa.int64()),
            "__side": pa.array(np.zeros(n, np.int8)),
            "__bucket": pa.array(_doc_bucket(d, num_buckets)),
        })

    both = (passages.map_batches(_tag_passages, batch_format="pyarrow")
            .union(anns.map_batches(_tag_anns, batch_format="pyarrow")))

    def _remap(group: pd.DataFrame) -> pd.DataFrame:
        docs = group[doc_col].to_numpy()
        pids = group[passage_col].to_numpy()
        side = group["__side"].to_numpy()
        ostart = group["orig_start"].to_numpy()
        aid = group["ann_id"].to_numpy()
        texts = group["text"].to_numpy()
        poff = group["p_offset"].to_numpy()
        # per (doc, passage): passage row (side=1) first, then its
        # annotations in (orig_start, ann_id) order
        order = np.lexsort((aid, ostart, -side, pids, docs))
        docs, pids, side = docs[order], pids[order], side[order]
        aid, texts, poff = aid[order], texts[order], poff[order]
        bounds = np.flatnonzero(
            np.r_[True, (docs[1:] != docs[:-1]) | (pids[1:] != pids[:-1])])
        bounds = np.r_[bounds, len(docs)]
        pat_cache: dict[str, re.Pattern] = {}
        o_doc: list = []
        o_pid: list = []
        o_aid: list = []
        o_text: list = []
        o_start: list = []
        o_end: list = []
        for lo, hi in zip(bounds[:-1], bounds[1:]):
            if side[lo] != 1:  # annotations with no passage: all drop
                continue
            ptext = texts[lo]
            base = int(poff[lo])
            last = 0
            for i in range(lo + 1, hi):
                atext = texts[i]
                pat = pat_cache.get(atext)
                if pat is None:
                    pat = re.compile(
                        r"(?<!\w)" + re.escape(atext) + r"(?!\w)")
                    pat_cache[atext] = pat
                m = pat.search(ptext, last) if last == 0 else \
                    pat.search(ptext[last:])
                if m is None:
                    continue
                if last == 0:
                    s, e = m.start(), m.end()
                else:
                    s, e = m.start() + last, m.end() + last
                last = e
                o_doc.append(docs[i])
                o_pid.append(int(pids[i]))
                o_aid.append(int(aid[i]))
                o_text.append(atext)
                o_start.append(s + base)
                o_end.append(e + base)
        return pd.DataFrame({
            doc_col: np.asarray(o_doc, dtype=group[doc_col].dtype),
            passage_col: np.asarray(o_pid, np.int64),
            "ann_id": np.asarray(o_aid, np.int64),
            "text": pd.Series(o_text, dtype=object),
            "start": np.asarray(o_start, np.int64),
            "end": np.asarray(o_end, np.int64),
        })

    return both.groupby("__bucket").map_groups(
        _remap, batch_format="pandas")
