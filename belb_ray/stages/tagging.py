"""Dictionary-based mention tagging: find every occurrence of every
dictionary name in every document, with exact character offsets.

Reference analog: belb builds per-KB name dictionaries
(/root/reference/belb/kbs/kb.py:196-250 ``to_belb`` dumps
(identifier, name) dictionaries; corpora carry (text, annotation-span)
pairs, /root/reference/belb/preprocessing/data.py Example/Annotation) —
dictionary tagging is the step that turns a KB name table plus raw text
into annotation spans. The reference receives gold spans from corpus
files; this op is the scalable way to CREATE such spans from a name
dictionary, the missing half of its entity-linking loop.

Scale shape (100 TB): the dictionary (name → payload) is the small side
— ``ray.put`` ONCE, read zero-copy by every task. Documents stream
through one ``map_batches``; no shuffle anywhere. Matching is a token
n-gram membership probe, all-vectorized: split each text on ' '
(pyarrow kernel), reconstruct per-word character offsets from cumulative
word lengths (numpy), assemble n-gram strings with
``binary_join_element_wise``, filter with ``pc.is_in`` against the
broadcast name set, and attach payload columns with one small
per-batch Arrow join. A 1M-name dictionary costs ~tens of MB broadcast;
per-batch work is O(words × #distinct-name-lengths) with C kernels —
the standard dictionary-tagging shape (token-gram join), not a per-name
regex scan.

Match semantics (mirrored exactly by the SQL oracle's position scan):
an occurrence of name N at character position s exists iff
``text[s : s+len(N)] == N`` and both sides are a space or a text edge.
Names containing runs of ≥2 spaces never match (tokens are maximal
space-free runs). Overlapping and nested matches are ALL reported —
suppression/canonicalization is a separate op (stages/spans.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..util import cached_get, resolve_num_buckets


def _as_table(obj) -> pa.Table:
    from .joins import _as_arrow

    return _as_arrow(obj)


def tag_mentions(
    docs: rd.Dataset,
    dictionary,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    mention_col: str = "mention",
) -> rd.Dataset:
    """Tag every dictionary-name occurrence in every document.

    ``dictionary``: small side (pa.Table / DataFrame / small Dataset)
    with a ``mention_col`` string column plus any payload columns
    (entity ids, types, …) to carry onto matches.

    Output: one row per (document, position, name) match —
    ``doc_id_col``, ``start`` (0-based char offset), ``end``
    (exclusive), ``mention_col``, and the dictionary's payload columns.
    """
    dict_tbl = _as_table(dictionary)
    if dict_tbl.num_rows == 0:
        raise ValueError("tag_mentions: empty dictionary")
    names = dict_tbl[mention_col].combine_chunks()
    # group names by word count so each n-gram pass probes only names of
    # that exact length-in-words (a unigram can never equal a bigram)
    n_words = pc.add(
        pc.count_substring(names, " "), 1).to_numpy(zero_copy_only=False)
    by_n = {int(n): pc.unique(names.filter(pa.array(n_words == n)))
            for n in np.unique(n_words)}
    ref = ray.put((dict_tbl, by_n))

    def _tag(batch: pa.Table) -> pa.Table:
        dict_tbl, by_n = cached_get(ref)
        out_schema = pa.schema(
            [(doc_id_col, batch.schema.field(doc_id_col).type),
             ("start", pa.int64()), ("end", pa.int64()),
             (mention_col, pa.string())])
        empty = pa.table(
            {f.name: pa.array([], f.type) for f in out_schema})
        if batch.num_rows == 0:
            cands = empty
        else:
            words = pc.split_pattern(
                batch[text_col].combine_chunks(), pattern=" ")
            flat = words.flatten()
            offs = words.offsets.to_numpy(zero_copy_only=False)
            n_per_doc = np.diff(offs)
            doc_of = np.repeat(
                np.arange(len(words), dtype=np.int64), n_per_doc)
            lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            # char start of each word: exclusive prefix sum of (len+1)
            # within its doc = global prefix minus the doc's base
            gstart = np.concatenate(([0], np.cumsum(lens + 1)[:-1]))
            base = np.zeros(len(flat), np.int64)
            first = offs[:-1][n_per_doc > 0]
            base[first] = gstart[first]
            base = np.maximum.accumulate(base)
            starts = gstart - base
            parts = []
            ids = batch[doc_id_col].combine_chunks()
            for n, names_n in by_n.items():
                if len(flat) < n:
                    continue
                m = len(flat) - n + 1
                same_doc = doc_of[:m] == doc_of[n - 1:]
                idx = np.nonzero(same_doc)[0]
                if len(idx) == 0:
                    continue
                pieces = [flat.take(pa.array(idx + j)) for j in range(n)]
                grams = pieces[0] if n == 1 else \
                    pc.binary_join_element_wise(*pieces, " ")
                hit = pc.is_in(grams, value_set=names_n)
                hidx = idx[hit.to_numpy(zero_copy_only=False)]
                if len(hidx) == 0:
                    continue
                g = grams.filter(hit)
                s = starts[hidx]
                e = s + pc.utf8_length(g).to_numpy(
                    zero_copy_only=False).astype(np.int64)
                parts.append(pa.table({
                    doc_id_col: ids.take(pa.array(doc_of[hidx])),
                    "start": pa.array(s), "end": pa.array(e),
                    mention_col: g}))
            cands = pa.concat_tables(parts) if parts else empty
        return cands.join(dict_tbl, keys=[mention_col], join_type="inner") \
            .select([doc_id_col, "start", "end", mention_col]
                    + [c for c in dict_tbl.column_names if c != mention_col])

    return docs.map_batches(_tag, batch_format="pyarrow")


def mention_contexts(
    mentions: rd.Dataset,
    docs: rd.Dataset,
    window: int = 16,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 0,
) -> rd.Dataset:
    """Attach a ±``window``-char context snippet to every mention span →
    mention columns + ``context`` (text[max(0, start−w) : min(len,
    end+w)], char offsets). The disambiguation-feature step of an
    entity-linking pipeline: the reference's annotators consume mention
    context around gold spans (/root/reference/belb/preprocessing/
    data.py Example/Annotation carry passage text per span).

    Distributed shape: one hash(doc_id) partition join co-locates each
    mention with its document text (both sides large — no broadcast);
    slicing is per-row (no Arrow kernel takes per-row bounds) but
    allocation-only — O(output bytes), the floor for snippet
    extraction."""
    num_buckets = resolve_num_buckets(num_buckets)
    from .joins import hash_partition_join

    joined = hash_partition_join(
        mentions, docs.select_columns([doc_id_col, text_col]),
        key=doc_id_col, num_buckets=num_buckets)

    def _slice(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        starts = batch["start"].to_numpy(zero_copy_only=False)
        ends = batch["end"].to_numpy(zero_copy_only=False)
        ctx = [t[max(0, int(s) - window):int(e) + window]
               for t, s, e in zip(texts, starts, ends)]
        out = batch.drop_columns([text_col])
        return out.append_column("context", pa.array(ctx, pa.string()))

    return joined.map_batches(_slice, batch_format="pyarrow")
