"""Text-rewriting transformations with enforced invariants (SURVEY §2.8
``BaseTransformation`` family).

The reference rewrites document text three ways — intra-word-mention
cleaning, sentence splitting, mention markers — and asserts conservation
invariants after every rewrite: length accounting
(/root/reference/belb/preprocessing/clean.py:228-232,
mark.py:215-219, segment.py:138-144,171-177) and offset validity
(``qaqc.test_offsets``, /root/reference/belb/preprocessing/qaqc.py:27-59;
annotation text must equal text-by-offset). Violations raise typed
errors — bad rewrites must fail loudly, not drift.

Ray form: text rewrites are per-document and stateless → plain
``map_batches``; ops that need a document's annotations co-located join
spans to docs by one hash-partitioned join, then rewrite per row. Each op
checks its invariant inline inside the batch (no second pass).

- ``split_sentences``  — (doc_id, text) → (doc_id, sent_id, start, length,
  sentence); invariant: ``text[start:start+length] == sentence`` and the
  sentences + single-space joints reassemble the normalized text
  (segment.py:249-331).
- ``mark_mentions``    — insert ``[M]``/``[/M]`` around spans; invariant:
  new length == old + n_spans · (len(open)+len(close)), and every span's
  surface text is still found at its REMAPPED offset (mark.py:224-265).
- ``clean_intraword``  — split tokens that contain an embedded mention by
  inserting spaces at span edges; invariant: length grows by exactly the
  number of inserted separators and span surfaces stay offset-addressable
  (clean.py:237-300).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from belb_ray.util import resolve_num_buckets


class TransformInvariantError(ValueError):
    """A text rewrite violated its conservation invariant."""


# explicit ASCII whitespace class (NOT \s): Python-re \s matches unicode
# spaces while RE2 (the DuckDB oracle engine) does not — the explicit
# class makes both engines split identically
_SENT_BOUNDARY = re.compile(r"(?:(?<=[.!?])[ \t\n\r\f\v]+)")


def split_sentences(docs: rd.Dataset, id_col: str = "doc_id",
                    text_col: str = "text") -> rd.Dataset:
    """→ (doc_id, sent_id, start, length, sentence). Split points are the
    whitespace runs after [.!?]; offsets index into the ORIGINAL text.
    Invariant (checked per doc): every sentence equals
    ``text[start:start+length]``."""

    def _f(batch: pa.Table) -> pa.Table:
        out_doc, out_sid, out_start, out_len, out_text = [], [], [], [], []
        ids = batch[id_col].to_pylist()
        for did, text in zip(ids, batch[text_col].to_pylist()):
            sid = 0
            bounds = [m.span() for m in _SENT_BOUNDARY.finditer(text)]
            edges = [0] + [e for _, e in bounds] + [len(text)]
            for i in range(len(edges) - 1):
                start = edges[i]
                end = edges[i + 1]
                # strip the trailing separator of non-final pieces
                for s, e in bounds:
                    if e == end:
                        end = s
                        break
                if end <= start:
                    continue
                sent = text[start:end]
                if text[start:start + len(sent)] != sent:  # offset invariant
                    raise TransformInvariantError(
                        f"sentence offset mismatch in doc {did!r} at {start}")
                out_doc.append(did)
                out_sid.append(sid)
                out_start.append(start)
                out_len.append(len(sent))
                out_text.append(sent)
                sid += 1
        return pa.table({
            id_col: pa.array(out_doc, batch[id_col].type),
            "sent_id": pa.array(out_sid, pa.int64()),
            "start": pa.array(out_start, pa.int64()),
            "length": pa.array(out_len, pa.int64()),
            "sentence": pa.array(out_text, pa.string()),
        })

    return docs.map_batches(_f, batch_format="pyarrow")


def _join_spans(docs: rd.Dataset, spans: rd.Dataset, id_col: str,
                num_buckets: int = 0) -> rd.Dataset:
    """(doc_id, text, starts: list, ends: list) — one row per doc with its
    spans gathered, via one bucketed co-location shuffle."""

    num_buckets = resolve_num_buckets(num_buckets)
    def _tag_docs(t: pa.Table) -> pa.Table:
        return pa.table({id_col: t[id_col], "text": t["text"],
                         "start": pa.array([-1] * t.num_rows, pa.int64()),
                         "end": pa.array([-1] * t.num_rows, pa.int64())})

    def _tag_spans(t: pa.Table) -> pa.Table:
        return pa.table({id_col: t[id_col],
                         "text": pa.array([None] * t.num_rows, pa.string()),
                         "start": pa.compute.cast(t["start"], pa.int64()),
                         "end": pa.compute.cast(t["end"], pa.int64())})

    both = (docs.map_batches(_tag_docs, batch_format="pyarrow")
            .union(spans.map_batches(_tag_spans, batch_format="pyarrow")))

    def _bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_array(batch[id_col].to_numpy(), categorize=False)
        batch["__bucket"] = (h % np.uint64(num_buckets)).astype(np.int32)
        return batch

    def _gather(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop(columns="__bucket")
        out_id, out_text, out_starts, out_ends = [], [], [], []
        for did, sub in g.groupby(id_col, sort=False):
            doc_rows = sub[sub["start"] < 0]
            if doc_rows.empty:
                continue
            sp = sub[sub["start"] >= 0].sort_values(["start", "end"])
            out_id.append(did)
            out_text.append(doc_rows["text"].iloc[0])
            out_starts.append(sp["start"].tolist())
            out_ends.append(sp["end"].tolist())
        return pd.DataFrame({id_col: out_id, "text": out_text,
                             "starts": out_starts, "ends": out_ends})

    bucketed = both.map_batches(_bucketize, batch_format="pandas")
    return bucketed.groupby("__bucket").map_groups(_gather,
                                                   batch_format="pandas")


def mark_mentions(docs: rd.Dataset, spans: rd.Dataset,
                  open_tok: str = "[M]", close_tok: str = "[/M]",
                  id_col: str = "doc_id") -> rd.Dataset:
    """docs(doc_id, text) + spans(doc_id, start, end) → (doc_id,
    marked_text, n_marked). Non-overlapping spans assumed (apply
    ``suppress_overlapping``/A7 dedup first, as the reference does).

    Invariants: len(marked) == len(text) + n·(len(open)+len(close));
    each span surface appears verbatim at its remapped offset."""
    joined = _join_spans(docs, spans, id_col)
    grow = len(open_tok) + len(close_tok)

    def _f(batch: pd.DataFrame) -> pd.DataFrame:
        out = []
        for did, text, starts, ends in zip(batch[id_col], batch["text"],
                                           batch["starts"], batch["ends"]):
            pieces = []
            pos = 0
            shift = 0
            for s, e in zip(starts, ends):
                if s < pos:  # overlapping span: reference drops these first
                    raise TransformInvariantError(
                        f"overlapping span at {s} in doc {did!r}")
                pieces.append(text[pos:s])
                pieces.append(open_tok)
                pieces.append(text[s:e])
                pieces.append(close_tok)
                shift += grow
                pos = e
            pieces.append(text[pos:])
            marked = "".join(pieces)
            if len(marked) != len(text) + len(starts) * grow:
                raise TransformInvariantError(
                    f"length conservation violated for doc {did!r}")
            # offset validity at remapped positions
            shift = 0
            for s, e in zip(starts, ends):
                ns = s + shift + len(open_tok)
                if marked[ns:ns + (e - s)] != text[s:e]:
                    raise TransformInvariantError(
                        f"marker offset mismatch in doc {did!r} at {s}")
                shift += grow
            out.append((did, marked, len(starts)))
        return pd.DataFrame(out, columns=[id_col, "marked_text", "n_marked"])

    return joined.map_batches(_f, batch_format="pandas")


def clean_intraword(docs: rd.Dataset, spans: rd.Dataset,
                    id_col: str = "doc_id") -> rd.Dataset:
    """Intra-word mention cleaning: insert a space before a span that
    abuts a word character on its left, and after one abutting on its
    right (reference clean.py:237-300). → (doc_id, clean_text,
    n_inserted). Invariant: len(clean) == len(text) + n_inserted and each
    span surface is intact at its remapped offset."""
    joined = _join_spans(docs, spans, id_col)
    word = re.compile(r"\w")

    def _f(batch: pd.DataFrame) -> pd.DataFrame:
        out = []
        for did, text, starts, ends in zip(batch[id_col], batch["text"],
                                           batch["starts"], batch["ends"]):
            inserts = []  # positions (in original text) to insert a space
            for s, e in zip(starts, ends):
                if s > 0 and word.match(text[s - 1]) and word.match(text[s]):
                    inserts.append(s)
                if e < len(text) and word.match(text[e - 1]) \
                        and word.match(text[e]):
                    inserts.append(e)
            inserts.sort()
            pieces = []
            pos = 0
            for ip in inserts:
                pieces.append(text[pos:ip])
                pieces.append(" ")
                pos = ip
            pieces.append(text[pos:])
            clean = "".join(pieces)
            if len(clean) != len(text) + len(inserts):
                raise TransformInvariantError(
                    f"length conservation violated for doc {did!r}")
            ins = np.asarray(inserts, dtype=np.int64)
            for s, e in zip(starts, ends):
                ns = s + int((ins <= s).sum())
                if clean[ns:ns + (e - s)] != text[s:e]:
                    raise TransformInvariantError(
                        f"clean offset mismatch in doc {did!r} at {s}")
            out.append((did, clean, len(inserts)))
        return pd.DataFrame(out, columns=[id_col, "clean_text", "n_inserted"])

    return joined.map_batches(_f, batch_format="pandas")


def check_offsets(docs: rd.Dataset, spans: rd.Dataset,
                  id_col: str = "doc_id") -> rd.Dataset:
    """The reference's ``qaqc.test_offsets`` as an op: returns the spans
    whose recorded surface text does NOT equal text[start:end] (empty
    result = corpus passes). spans: (doc_id, start, end, surface)."""

    def _tag_spans(t: pa.Table) -> pa.Table:
        return pa.table({id_col: t[id_col],
                         "text": t["surface"],
                         "start": pa.compute.cast(t["start"], pa.int64()),
                         "end": pa.compute.cast(t["end"], pa.int64())})

    # reuse the gather join, carrying surfaces through the spans channel
    import pyarrow.compute  # noqa: F401

    def _tag_docs(t: pa.Table) -> pa.Table:
        return pa.table({id_col: t[id_col], "text": t["text"],
                         "start": pa.array([-1] * t.num_rows, pa.int64()),
                         "end": pa.array([-1] * t.num_rows, pa.int64())})

    both = (docs.map_batches(_tag_docs, batch_format="pyarrow")
            .union(spans.map_batches(_tag_spans, batch_format="pyarrow")))

    def _bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_array(batch[id_col].to_numpy(), categorize=False)
        batch["__bucket"] = (h % np.uint64(32)).astype(np.int32)
        return batch

    def _check(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop(columns="__bucket")
        bad_id, bad_start, bad_end, bad_surface = [], [], [], []
        for did, sub in g.groupby(id_col, sort=False):
            doc_rows = sub[sub["start"] < 0]
            if doc_rows.empty:
                continue
            text = doc_rows["text"].iloc[0]
            for _, r in sub[sub["start"] >= 0].iterrows():
                s, e = int(r["start"]), int(r["end"])
                if text[s:e] != r["text"]:
                    bad_id.append(did)
                    bad_start.append(s)
                    bad_end.append(e)
                    bad_surface.append(r["text"])
        return pd.DataFrame({id_col: bad_id, "start": bad_start,
                             "end": bad_end, "surface": bad_surface})

    bucketed = both.map_batches(_bucketize, batch_format="pandas")
    return bucketed.groupby("__bucket").map_groups(_check,
                                                   batch_format="pandas")
