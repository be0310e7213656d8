"""Duplicate-passage detection: maximal repeated token k-gram spans.

The LLM-training-data "exact substring dedup" operator (Lee et al. 2022,
"Deduplicating Training Data Makes Language Models Better") approximated
at token k-gram granularity: a span of a document is flagged when every
k-token window inside it occurs at least ``min_count`` times in the whole
corpus. The reference's closest analog is the per-corpus exact-duplicate
annotation suppression (belb/preprocessing/data.py:549-567), which works
on whole annotations; this generalizes it to sub-document text runs.

Distributed shape (three bounded exchanges, no all-pairs, no driver
materialization of corpus data):

1. **positions** — one streaming ``map_batches`` pass tokenizes each doc
   (``text.split(' ')``, exactly SQL ``string_split`` semantics so the
   DuckDB oracle can mirror it), hashes every token once
   (``pd.util.hash_array``), and derives each k-gram hash from the
   concatenated token-hash array with a vectorized polynomial window
   (k fused multiply-adds over the whole batch, wrapping uint64). Rows
   out: (gram, doc, pos) — never the text.
2. **dup grams** — combiner count per gram hash (fixed-width partials
   shuffle, one bucketed combine), keep hashes with global count ≥
   min_count. For mostly-unique corpora this result is tiny relative to
   the corpus.
3. **mark + merge** — :func:`bloom_semi_join` keeps only duplicated
   positions (bloom-negative positions — the vast majority — never enter
   a shuffle), then one hash(doc) co-location shuffle merges overlapping
   or adjacent windows per doc into maximal spans with a vectorized
   gaps-and-islands pass (interval ends are monotone for fixed k, so an
   island breaks exactly when ``pos > prev_pos + k``).

64-bit gram hashes make the "exact" claim probabilistic with collision
rate ~n²/2⁶⁴ (≈10⁻⁸ at a billion grams) — collisions can only over-mark,
never drop a true duplicate span.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from belb_ray.util import resolve_num_buckets

_R = np.uint64(1099511628211)  # FNV-1a prime as the rolling-base


def gram_positions(docs: rd.Dataset, k: int, id_col: str = "doc_id",
                   text_col: str = "text") -> rd.Dataset:
    """(gram:int64, doc:int64, pos:int32) for every token k-gram."""
    if k < 1:
        raise ValueError("k must be >= 1")

    def _grams(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = batch[text_col].to_pylist()
        toks_per_doc = [("" if t is None else t).split(" ") for t in texts]
        lens = np.fromiter((len(t) for t in toks_per_doc), np.int64,
                           len(toks_per_doc))
        total = int(lens.sum())
        empty = pa.table({"gram": pa.array([], pa.int64()),
                          "doc": pa.array([], pa.int64()),
                          "pos": pa.array([], pa.int32())})
        if total < k:
            return empty
        flat = np.empty(total, dtype=object)
        off = 0
        for toks in toks_per_doc:
            flat[off:off + len(toks)] = toks
            off += len(toks)
        h = pd.util.hash_array(flat, categorize=False)

        # polynomial k-window over the concatenated hash array; windows
        # that straddle a doc boundary are masked out below
        m = total - k + 1
        acc = np.zeros(m, dtype=np.uint64)
        rj = np.uint64(1)
        for j in range(k):
            acc += h[j:j + m] * rj
            # mod-2^64 wrap is the point — keep numpy from warning on it
            rj = np.multiply(rj, _R, dtype=np.uint64)

        starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
        doc_of = np.repeat(np.arange(len(lens)), lens)[:m]
        pos_in_doc = (np.arange(total) - np.repeat(starts, lens))[:m]
        valid = pos_in_doc + k <= np.repeat(lens, lens)[:m]
        return pa.table({
            "gram": pa.array(acc[valid].view(np.int64)),
            "doc": pa.array(ids[doc_of[valid]]),
            "pos": pa.array(pos_in_doc[valid].astype(np.int32)),
        })

    return docs.map_batches(_grams, batch_format="pyarrow",
                            batch_size=4096)


def duplicate_passage_spans(docs: rd.Dataset, k: int = 5,
                            id_col: str = "doc_id",
                            text_col: str = "text",
                            min_count: int = 2,
                            num_buckets: int = 0) -> rd.Dataset:
    """Maximal duplicated token spans: (doc_id, tok_start, tok_end,
    n_dup_grams) where every k-window in [tok_start, tok_end) occurs
    ≥ min_count times corpus-wide and the span cannot be extended."""
    num_buckets = resolve_num_buckets(num_buckets)
    from .agg import preagg_groupby
    from .joins import bloom_semi_join

    pos = gram_positions(docs, k, id_col, text_col)
    counts = preagg_groupby(pos.select_columns(["gram"]), ["gram"],
                            [("count", "", "n")], num_buckets)
    dup = counts.filter(expr=f"n >= {min_count}").select_columns(["gram"])
    marked = bloom_semi_join(pos, dup, key="gram",
                             num_buckets=num_buckets)

    def _bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_array(batch["doc"].to_numpy(), categorize=False)
        batch["__bucket"] = (h % np.uint64(num_buckets)).astype(np.int32)
        return batch

    def _merge(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["doc", "pos"], kind="mergesort")
        doc = g["doc"].to_numpy()
        p = g["pos"].to_numpy().astype(np.int64)
        brk = np.ones(len(g), dtype=bool)
        if len(g) > 1:
            brk[1:] = (doc[1:] != doc[:-1]) | (p[1:] > p[:-1] + k)
        island = np.cumsum(brk) - 1
        first = np.flatnonzero(brk)
        last = np.concatenate((first[1:] - 1, [len(g) - 1]))
        return pd.DataFrame({
            id_col: doc[first],
            "tok_start": p[first].astype(np.int32),
            "tok_end": (p[last] + k).astype(np.int32),
            "n_dup_grams": np.diff(np.concatenate((first,
                                                   [len(g)]))).astype(
                np.int64),
        })

    return (marked.map_batches(_bucketize, batch_format="pandas")
            .groupby("__bucket")
            .map_groups(_merge, batch_format="pandas"))
