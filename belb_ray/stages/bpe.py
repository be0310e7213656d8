"""Distributed BPE (byte-pair-encoding) vocabulary learning.

The tokenizer-training step of an LLM data pipeline: learn the top-R
merge rules from a corpus (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units" — public algorithm; the
left-to-right non-overlapping merge uses the same
``(?<!\\S)pair(?!\\S)`` regex device as the paper's reference code).

Scale shape (100 TB): the corpus is touched ONCE — a distributed
word-count (per-batch ``value_counts`` combiner → one bucketed combine)
reduces it to a (word, count) vocabulary table, orders of magnitude
smaller than the corpus (Heaps' law). Every merge round then runs over
the VOCABULARY Dataset only: a vectorized adjacent-pair count
(split-offsets + ``binary_join_element_wise``, weighted by word count)
→ one bucketed combine → a 1-row top-k collect picks the best pair
(count desc, pair asc — deterministic) → a streamed regex rewrite
applies the merge. Per-round driver state is ONE pair; nothing
corpus-sized ever materializes.

Reference analog: the reference ships dictionary/vocab construction as
a one-shot KB build (/root/reference/belb/kbs/kb.py:196-250); BPE
learning is the corresponding vocabulary-build step for subword
tokenizers.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from .agg import bucketed_combine
from .curation import GRAM_WORD_RE

from belb_ray.functions.arrow import table_from_pandas

from belb_ray.util import resolve_num_buckets

END_OF_WORD = "</w>"


def word_counts(ds: rd.Dataset, text_col: str = "text",
                num_buckets: int = 0) -> rd.Dataset:
    """Corpus → (word, n_occurrences) vocabulary table. Words are
    ``[a-z0-9]+`` runs of lowercased text — the corpus-wide tokenizer
    contract shared with ``stages/corpus.ngram_counts``."""

    num_buckets = resolve_num_buckets(num_buckets)
    def _partial(batch: pa.Table) -> pa.Table:
        words: list[str] = []
        for t in batch[text_col].to_pylist():
            words.extend(GRAM_WORD_RE.findall((t or "").lower()))
        vc = pd.Series(words, dtype=object).value_counts()
        return pa.table({"word": pa.array(vc.index, pa.string()),
                         "n_occurrences": pa.array(vc.to_numpy(), pa.int64())})

    partials = ds.map_batches(_partial, batch_format="pyarrow")
    return bucketed_combine(partials, ["word"], {"n_occurrences": "sum"},
                            num_buckets)


def _pair_counts(vocab: rd.Dataset, num_buckets: int) -> rd.Dataset:
    """(left, right, n_occurrences) over adjacent symbol pairs of the
    space-joined symbol strings, weighted by word count. Every position
    counts (``a a a`` contributes the pair (a, a) twice) — the classic
    get_stats semantics."""

    def _partial(batch: pa.Table) -> pa.Table:
        syms = pc.split_pattern(batch["syms"].combine_chunks(), pattern=" ")
        flat = syms.flatten()
        offs = syms.offsets.to_numpy(zero_copy_only=False)
        n_per = np.diff(offs)
        word_of = np.repeat(np.arange(len(syms), dtype=np.int64), n_per)
        m = len(flat) - 1
        if m < 1:
            return pa.table({"left": pa.array([], pa.string()),
                             "right": pa.array([], pa.string()),
                             "n_occurrences": pa.array([], pa.int64())})
        same = word_of[:m] == word_of[1:]
        idx = np.nonzero(same)[0]
        left = flat.take(pa.array(idx))
        right = flat.take(pa.array(idx + 1))
        w = batch["n_occurrences"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            "left": left.to_pandas(), "right": right.to_pandas(),
            "n_occurrences": w[word_of[idx]]})
        g = df.groupby(["left", "right"], sort=False, as_index=False).sum()
        return table_from_pandas(g)

    partials = vocab.map_batches(_partial, batch_format="pyarrow")
    return bucketed_combine(partials, ["left", "right"],
                            {"n_occurrences": "sum"}, num_buckets)


def learn_bpe(ds: rd.Dataset, n_merges: int, text_col: str = "text",
              num_buckets: int = 0) -> rd.Dataset:
    """Learn ``n_merges`` BPE merge rules → Dataset of
    (step, left, right, n_occurrences), step = 1-based merge order.

    Words start as character sequences with a trailing ``</w>`` symbol;
    each round merges the globally most frequent adjacent symbol pair
    (ties: smaller (left, right) lexicographically) and rewrites the
    vocabulary with a left-to-right non-overlapping regex substitution.
    """
    num_buckets = resolve_num_buckets(num_buckets)
    vocab = word_counts(ds, text_col, num_buckets)

    def _init(batch: pa.Table) -> pa.Table:
        words = batch["word"].to_pylist()
        syms = [" ".join(list(w) + [END_OF_WORD]) for w in words]
        return pa.table({"syms": pa.array(syms, pa.string()),
                         "n_occurrences": batch["n_occurrences"]})

    vocab = vocab.map_batches(_init, batch_format="pyarrow").materialize()

    merges: list[tuple[int, str, str, int]] = []
    for step in range(1, n_merges + 1):
        best = (_pair_counts(vocab, num_buckets)
                .sort(["n_occurrences", "left", "right"],
                      descending=[True, False, False]).limit(1).take_all())
        if not best:
            break
        left, right = best[0]["left"], best[0]["right"]
        merges.append((step, left, right, int(best[0]["n_occurrences"])))
        pat = re.compile(
            r"(?<!\S)" + re.escape(left + " " + right) + r"(?!\S)")
        merged = left + right

        def _apply(batch: pd.DataFrame, pat=pat, merged=merged) \
                -> pd.DataFrame:
            batch["syms"] = batch["syms"].str.replace(pat, merged,
                                                      regex=True)
            return batch

        vocab = vocab.map_batches(_apply,
                                  batch_format="pandas").materialize()

    return rd.from_arrow(pa.table({
        "step": pa.array([m[0] for m in merges], pa.int64()),
        "left": pa.array([m[1] for m in merges], pa.string()),
        "right": pa.array([m[2] for m in merges], pa.string()),
        "n_occurrences": pa.array([m[3] for m in merges], pa.int64())}))


def bpe_encode(ds: rd.Dataset, merges, doc_id_col: str = "doc_id",
               text_col: str = "text") -> rd.Dataset:
    """Apply learned merge rules → (doc_id, tokens list<string>,
    n_tokens) per document.

    Classic priority encoding: repeatedly merge ALL occurrences of the
    lowest-rank (earliest-learned) pair present in the word until no
    learnable pair remains. The merge table is tiny — shipped in the
    task closure; per-task a WORD-level memo caches each distinct
    word's encoding (Zipf: a block re-encodes few distinct words), so
    the per-row cost is a dict hit, not a merge loop.
    """
    if isinstance(merges, rd.Dataset):
        merges = merges.take_all()
        ranks = {(m["left"], m["right"]): m["step"] for m in merges}
    else:
        ranks = {(left, right): i + 1
                 for i, (left, right) in enumerate(merges)}

    def _encode_word(word: str, memo: dict) -> list[str]:
        got = memo.get(word)
        if got is not None:
            return got
        syms = list(word) + [END_OF_WORD]
        while len(syms) > 1:
            best, best_rank = None, None
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best, best_rank = (syms[i], syms[i + 1]), r
            if best is None:
                break
            a, b = best
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        memo[word] = syms
        return syms

    def _encode(batch: pa.Table) -> pa.Table:
        memo: dict[str, list[str]] = {}
        toks, counts = [], []
        for t in batch[text_col].to_pylist():
            words = GRAM_WORD_RE.findall((t or "").lower())
            dt: list[str] = []
            for w in words:
                dt.extend(_encode_word(w, memo))
            toks.append(dt)
            counts.append(len(dt))
        return pa.table({
            doc_id_col: batch[doc_id_col],
            "tokens": pa.array(toks, pa.list_(pa.string())),
            "n_tokens": pa.array(counts, pa.int64())})

    return ds.map_batches(_encode, batch_format="pyarrow")
