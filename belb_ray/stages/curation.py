"""Training-data curation operators: chunking, sequence packing, PII
redaction, benchmark-contamination flagging, repetition (quality) stats.

These are the named ops of an LLM pretraining-data pipeline, built on the
same per-batch / broadcast / ordered-bucket-scan primitives as the rest of
the engine. Reference analogs: the reference's passage segmentation
(/root/reference/belb/preprocessing/segment.py:249-331) generalizes to
``chunk_documents``; its offset bookkeeping (data.py passage assembly) to
``pack_sequences``'s global token-offset scan; its text cleaning
(clean.py:237-300) to ``redact_pii``; its corpus-statistics layer
(scripts/stats.py) to ``repetition_stats``.

Scale shapes (100 TB):
- ``chunk_documents``, ``redact_pii``, ``repetition_stats`` are pure
  map_batches — no shuffle, streaming, embarrassingly parallel.
- ``contamination_flags`` broadcasts the (small) benchmark n-gram set once
  via ``ray.put`` and probes it per batch — no shuffle of the corpus.
- ``pack_sequences`` is the classic two-phase distributed scan: per-batch
  partial sums per ordered id-range bucket (tiny), driver-side exclusive
  cumsum over bucket sums (O(#buckets) rows), then ONE bucket shuffle for
  the within-bucket prefix. Input rows shuffle exactly once.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..util import cached_get, resolve_num_buckets
from ..util import round_half_away

WORD_TOKEN_RE = re.compile(r"\S+")
GRAM_WORD_RE = re.compile(r"[a-z0-9]+")


# ---------------------------------------------------------------- chunking

def chunk_documents(ds: rd.Dataset, chunk_size: int = 120, overlap: int = 40,
                    id_col: str = "doc_id", text_col: str = "text") -> rd.Dataset:
    """Sliding-window character chunking with overlap.

    → (id_col, chunk_idx, chunk_start, chunk_text, chunk_len): chunks start
    at 0, stride, 2·stride … for every start < len(text) (one empty chunk
    for empty text), stride = chunk_size − overlap. Pure row explosion —
    no shuffle; output order within a doc is by chunk_idx.
    """
    if overlap >= chunk_size:
        raise ValueError("overlap must be < chunk_size")
    stride = chunk_size - overlap

    def _explode(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        texts = batch[text_col].to_pylist()
        out_id, out_idx, out_start, out_text = [], [], [], []
        for i, t in zip(ids, texts):
            t = t or ""
            n = len(t)
            n_chunks = 1 if n == 0 else (n - 1) // stride + 1
            for c in range(n_chunks):
                s = c * stride
                out_id.append(i)
                out_idx.append(c)
                out_start.append(s)
                out_text.append(t[s:s + chunk_size])
        return pa.table({
            id_col: pa.array(out_id, batch[id_col].type),
            "chunk_idx": pa.array(out_idx, pa.int64()),
            "chunk_start": pa.array(out_start, pa.int64()),
            "chunk_text": pa.array(out_text, pa.string()),
            "chunk_len": pa.array([len(t) for t in out_text], pa.int64()),
        })

    return ds.map_batches(_explode, batch_format="pyarrow")


# ------------------------------------------------------------ seq packing

def pack_sequences(ds: rd.Dataset, seq_len: int = 512,
                   id_col: str = "doc_id", text_col: str = "text",
                   tokens_col: str | None = None,
                   bucket_width: int = 4096) -> rd.Dataset:
    """GPT-style sequence packing offsets via a distributed prefix sum.

    Documents are concatenated in ``id_col`` order into one token stream
    split every ``seq_len`` tokens; each doc gets its global
    (start_token, end_token) and the (first_seq, last_seq) it lands in.

    → (id_col, n_tokens, start_token, end_token, first_seq, last_seq).

    Partitioning assumption: ``id_col`` is an integer; ordered range
    buckets are ``id // bucket_width``. Phase 1 computes per-bucket token
    sums as per-batch partials (no row shuffle); the driver cumsums the
    O(#buckets) sums; phase 2 shuffles rows once by bucket and finishes
    the within-bucket prefix vectorized.
    """

    def _tokens(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch[id_col], pa.int64())
        if tokens_col is not None:
            n = pc.cast(batch[tokens_col], pa.int64())
        else:
            n = pa.array([len(WORD_TOKEN_RE.findall(t or ""))
                          for t in batch[text_col].to_pylist()], pa.int64())
        return pa.table({id_col: ids, "n_tokens": n})

    toks = ds.map_batches(_tokens, batch_format="pyarrow")

    def _partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch[id_col].to_numpy() // bucket_width
        g = pd.DataFrame({"__bucket": b, "__n": batch["n_tokens"]})
        return g.groupby("__bucket", sort=False)["__n"].sum().reset_index()

    # O(#buckets) rows: safe to finish on the driver (same small-side
    # pattern as joins.collect_arrow callers).
    bs = toks.map_batches(_partial, batch_format="pandas").to_pandas()
    bs = bs.groupby("__bucket", sort=True)["__n"].sum()
    offsets = {int(k): int(v) for k, v in
               zip(bs.index, np.concatenate([[0], bs.cumsum().to_numpy()[:-1]]))}
    off_ref = ray.put(offsets)

    def _bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        batch["__bucket"] = batch[id_col].to_numpy() // bucket_width
        return batch

    def _scan(group: pd.DataFrame) -> pd.DataFrame:
        off = cached_get(off_ref)
        g = group.sort_values(id_col, kind="mergesort")
        n = g["n_tokens"].to_numpy(dtype=np.int64)
        start = (np.concatenate([[0], n.cumsum()[:-1]])
                 + off[int(g["__bucket"].iloc[0])])
        end = start + n
        first = start // seq_len
        last = np.where(n == 0, first, (end - 1) // seq_len)
        return pd.DataFrame({
            id_col: g[id_col].to_numpy(), "n_tokens": n,
            "start_token": start, "end_token": end,
            "first_seq": first, "last_seq": last,
        })

    return (toks.map_batches(_bucketize, batch_format="pandas")
            .groupby("__bucket").map_groups(_scan, batch_format="pandas"))


# ------------------------------------------------------------- PII redact

# (pattern, replacement) applied IN ORDER on progressively-redacted text;
# RE2 syntax — evaluated by pyarrow.compute here and mirrored verbatim in
# the DuckDB oracle (both RE2-based).
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\b\d{3}-\d{2}-\d{4}\b", "<ID>"),
    (r"\+\d{7,15}\b", "<PHONE>"),
)


def redact_pii(ds: rd.Dataset, id_col: str = "doc_id",
               text_col: str = "text") -> rd.Dataset:
    """→ (id_col, text_redacted, n_pii): emails / IPv4s / SSN-shaped ids /
    international phone numbers replaced by typed placeholders; ``n_pii``
    counts matches (on the progressively-redacted text, so overlapping
    pattern classes are counted once). Fully vectorized RE2 kernels."""

    def _redact(batch: pa.Table) -> pa.Table:
        t = pc.cast(batch[text_col], pa.string())
        n = pa.nulls(len(batch), pa.int64())
        n = np.zeros(len(batch), dtype=np.int64)
        for pat, repl in PII_PATTERNS:
            n += pc.count_substring_regex(t, pat).to_numpy(zero_copy_only=False)
            t = pc.replace_substring_regex(t, pat, repl)
        return pa.table({id_col: batch[id_col], "text_redacted": t,
                         "n_pii": pa.array(n, pa.int64())})

    return ds.map_batches(_redact, batch_format="pyarrow")


# ----------------------------------------------------------- contamination

def _word_ngrams(text: str, n: int) -> set[str]:
    w = GRAM_WORD_RE.findall((text or "").lower())
    return {" ".join(w[i:i + n]) for i in range(len(w) - n + 1)}


def contamination_flags(ds: rd.Dataset, benchmark_texts: list[str],
                        n: int = 3, id_col: str = "doc_id",
                        text_col: str = "text") -> rd.Dataset:
    """Benchmark-contamination check: flag docs sharing any word ``n``-gram
    with the benchmark suite. → (id_col, n_contaminated_ngrams [distinct
    shared grams], contaminated). The benchmark gram set is small by
    nature — built once on the driver, ``ray.put`` once, probed per batch
    (no corpus shuffle)."""
    bench: set[str] = set()
    for t in benchmark_texts:
        bench |= _word_ngrams(t, n)
    bench_ref = ray.put(frozenset(bench))

    def _flag(batch: pa.Table) -> pa.Table:
        bset = cached_get(bench_ref)
        hits = [len(_word_ngrams(t, n) & bset)
                for t in batch[text_col].to_pylist()]
        return pa.table({
            id_col: batch[id_col],
            "n_contaminated_ngrams": pa.array(hits, pa.int64()),
            "contaminated": pa.array([h > 0 for h in hits], pa.bool_()),
        })

    return ds.map_batches(_flag, batch_format="pyarrow")


# ------------------------------------------------------- repetition stats

def repetition_stats(ds: rd.Dataset, id_col: str = "doc_id",
                     text_col: str = "text") -> rd.Dataset:
    """C4/Gopher-style repetition signals per document:

    → (id_col, dup_line_frac, top_word_frac, dup_bigram_frac) where
    dup_line_frac = (lines − distinct lines)/lines over non-empty lines,
    top_word_frac = most-common-word count / word count, and
    dup_bigram_frac = (bigrams − distinct bigrams)/bigrams over word
    bigrams. Words are ``[a-z0-9]+`` runs of the lowercased text (the
    oracle-mirrored tokenizer contract). Pure map_batches — no shuffle."""

    def _stats(batch: pa.Table) -> pa.Table:
        dl, tw, db = [], [], []
        for t in batch[text_col].to_pylist():
            t = t or ""
            lines = [l for l in t.split("\n") if l != ""]
            dl.append(0.0 if not lines
                      else (len(lines) - len(set(lines))) / len(lines))
            words = GRAM_WORD_RE.findall(t.lower())
            if words:
                counts = pd.Series(words).value_counts()
                tw.append(int(counts.iloc[0]) / len(words))
            else:
                tw.append(0.0)
            bigrams = [f"{a} {b}" for a, b in zip(words, words[1:])]
            db.append(0.0 if not bigrams
                      else (len(bigrams) - len(set(bigrams))) / len(bigrams))
        return pa.table({
            id_col: batch[id_col],
            "dup_line_frac": pa.array(dl, pa.float64()),
            "top_word_frac": pa.array(tw, pa.float64()),
            "dup_bigram_frac": pa.array(db, pa.float64()),
        })

    return ds.map_batches(_stats, batch_format="pyarrow")


def budget_select(
    ds: rd.Dataset,
    score_col: str,
    weight_col: str,
    budget: int,
    id_col: str = "doc_id",
    bin_width: float = 0.01,
    num_buckets: int = 0,
) -> rd.Dataset:
    """Budgeted quality selection: keep the best-scoring rows until the
    summed ``weight_col`` reaches ``budget`` — exactly the rows whose
    running total in global (score desc, id asc) order stays ≤ budget
    (SQL: ``sum(w) OVER (ORDER BY score DESC, id) <= budget``). The
    data-selection step of a curation pipeline ("top-B tokens by
    quality").

    Distributed shape (the pack_sequences two-phase prefix, keyed by
    score range instead of id range): phase 1 computes per-score-bin
    weight sums as per-batch partials (no row shuffle); the driver
    cumsums the O(#bins) sums in descending-score order; bins whose
    base already exceeds the budget are PRUNED before the shuffle —
    only potentially-selected rows move. Phase 2 shuffles surviving
    rows once by bin and finishes the within-bin (score desc, id)
    prefix vectorized. → (id_col, weight_col, cum_weight), the selected
    rows."""

    num_buckets = resolve_num_buckets(num_buckets)
    def _partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = np.floor(batch[score_col].to_numpy(np.float64)
                     / bin_width).astype(np.int64)
        g = pd.DataFrame({"__bin": b,
                          "__w": batch[weight_col].to_numpy(np.int64)})
        return g.groupby("__bin", sort=False)["__w"].sum().reset_index()

    bs = (ds.select_columns([score_col, weight_col])
          .map_batches(_partial, batch_format="pandas").to_pandas())
    bs = bs.groupby("__bin", sort=True)["__w"].sum().sort_index(
        ascending=False)  # descending score order
    bases = np.concatenate([[0], bs.cumsum().to_numpy()[:-1]])
    base_of = {int(k): int(v) for k, v in zip(bs.index, bases)
               if int(v) <= budget}  # prune fully-over-budget bins
    base_ref = ray.put(base_of)

    def _bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        keep_map = cached_get(base_ref)
        b = np.floor(batch[score_col].to_numpy(np.float64)
                     / bin_width).astype(np.int64)
        batch = batch.assign(__bin=b)
        batch = batch[batch["__bin"].isin(keep_map)]
        return batch

    def _scan(group: pd.DataFrame) -> pd.DataFrame:
        base = cached_get(base_ref)[int(group["__bin"].iloc[0])]
        g = group.sort_values([score_col, id_col],
                              ascending=[False, True], kind="mergesort")
        w = g[weight_col].to_numpy(np.int64)
        cum = w.cumsum() + base
        keep = cum <= budget
        return pd.DataFrame({
            id_col: g[id_col].to_numpy()[keep],
            weight_col: w[keep],
            "cum_weight": cum[keep]})

    return (ds.map_batches(_bucketize, batch_format="pandas")
            .groupby("__bin").map_groups(_scan, batch_format="pandas"))


def boilerplate_stats(ds: rd.Dataset, id_col: str = "doc_id",
                      text_col: str = "text", n: int = 3,
                      min_df: int = 5,
                      num_buckets: int = 0) -> rd.Dataset:
    """Cross-document boilerplate detection (the CCNet / RefinedWeb
    template-removal signal, at phrase granularity): a word ``n``-gram is
    boilerplate when it appears in ≥ ``min_df`` DISTINCT documents; per
    doc report how much of it is made of such phrases.
    → (doc_id, n_grams, n_boiler, boiler_ratio); docs shorter than n
    words emit no grams and are excluded (no denominator).

    Shape: one streaming pass explodes per-doc gram instance counts
    (distinct-per-doc by construction — a doc is one row); grams leave
    the batch only as 64-bit polynomial hashes of the word hashes
    (strings never shuffle; collisions are ~n²/2⁶⁴-improbable and
    would only perturb df counts); document frequencies ride the
    bucketed combiner, and the boilerplate mark-back attaches the
    (vocabulary-sized) boiler-gram table to the SAME exploded table
    (materialized once, reused twice) via the size-guarded broadcast
    join with a partitioned fallback — no rescan of the corpus. Gram
    hashing and per-(doc, gram) counting are whole-batch vectorized
    (regex findall per doc, then one lexsort run-length pass)."""
    num_buckets = resolve_num_buckets(num_buckets)
    from .agg import preagg_groupby
    from .analytic import _attach_small

    _A = np.uint64(1099511628211)  # FNV prime: rolling gram combine

    def _gram_rows(batch: pd.DataFrame) -> pd.DataFrame:
        words_per = [GRAM_WORD_RE.findall((t or "").lower())
                     for t in batch[text_col]]
        lens = np.fromiter((len(w) for w in words_per), np.int64,
                           len(words_per))
        flat = [w for ws in words_per for w in ws]
        empty = pd.DataFrame({
            id_col: np.empty(0, batch[id_col].dtype
                             if len(batch) else np.int64),
            "gram": np.empty(0, np.int64),
            "cnt": np.empty(0, np.int64),
            "__one": np.empty(0, np.int64)})
        if not flat:
            return empty
        hw = pd.util.hash_array(np.asarray(flat, object),
                                hash_key="belb_ray_boilerp",
                                categorize=True)
        n_g = np.maximum(lens - (n - 1), 0)
        total = int(n_g.sum())
        if total == 0:
            return empty
        offsets = np.cumsum(lens) - lens
        seg = np.repeat(np.arange(len(lens), dtype=np.int64), n_g)
        within = (np.arange(total, dtype=np.int64)
                  - np.repeat(np.cumsum(n_g) - n_g, n_g))
        starts = offsets[seg] + within
        gh = hw[starts].copy()
        for j in range(1, n):
            gh = gh * _A + hw[starts + j]
        # run-length count per (doc, gram): one lexsort, no Python loop
        order = np.lexsort((gh, seg))
        seg_s, gh_s = seg[order], gh[order]
        new = np.r_[True, (seg_s[1:] != seg_s[:-1])
                    | (gh_s[1:] != gh_s[:-1])]
        run_starts = np.flatnonzero(new)
        cnt = np.diff(np.r_[run_starts, total])
        return pd.DataFrame({
            id_col: batch[id_col].to_numpy()[seg_s[run_starts]],
            "gram": gh_s[run_starts].astype(np.int64),
            "cnt": cnt.astype(np.int64),
            "__one": np.ones(len(run_starts), np.int64)})

    inst = ds.select_columns([id_col, text_col]).map_batches(
        _gram_rows, batch_format="pandas").materialize()  # reused 3x
    dft = preagg_groupby(inst, ["gram"], [("sum", "__one", "df")],
                         num_buckets=num_buckets)
    boiler = dft.filter(expr=f"df >= {min_df}")
    tot = preagg_groupby(inst, [id_col], [("sum", "cnt", "n_grams")],
                         num_buckets=num_buckets)
    marked = _attach_small(
        inst.map_batches(lambda b: b[[id_col, "gram", "cnt"]],
                         batch_format="pandas"),
        boiler, "gram")
    bcnt = preagg_groupby(marked, [id_col], [("sum", "cnt", "n_boiler")],
                          num_buckets=num_buckets)
    out = _attach_small(tot, bcnt, id_col, join_type="left outer")

    def _ratio(batch: pd.DataFrame) -> pd.DataFrame:
        nb = batch["n_boiler"].fillna(0).to_numpy(np.int64)
        ng = batch["n_grams"].to_numpy(np.int64)
        return pd.DataFrame({
            id_col: batch[id_col].to_numpy(),
            "n_grams": ng, "n_boiler": nb,
            "boiler_ratio": round_half_away(nb / ng.astype(np.float64), 6)})

    return out.map_batches(_ratio, batch_format="pandas")


def rule_filter_chain(docs: rd.Dataset, id_col: str = "doc_id",
                      text_col: str = "text",
                      min_words: int = 30,
                      mean_len_num: int = 47, mean_len_den: int = 10,
                      top_ratio_den: int = 9,
                      stats=None) -> rd.Dataset:
    """C4/Gopher-style rule filter chain with drop-reason precedence —
    every document gets a verdict, never a silent drop (the reference's
    per-stage drop-with-counter QAQC policy, corpus.py:655-661):

      1. ``too_short``  — word count < ``min_words``;
      2. ``long_words`` — mean word length > mean_len_num/mean_len_den,
         checked as den·(n_chars − n_words + 1) > num·n_words — EXACT
         integer arithmetic, no float threshold divergence;
      3. ``repetitive`` — most frequent word exceeds 1/``top_ratio_den``
         of all words (top_count · den > n_words, integer again);
      4. ``keep`` otherwise.

    Returns (id, n_words, reason) for ALL rows; pass a QaqcStats actor
    as ``stats`` to stream per-reason drop counts into the run manifest.
    Pure map_batches — no shuffle; the per-doc top-word count is one
    lexsort run-length pass over hashed words (strings never leave the
    batch)."""

    def _f(batch: pa.Table) -> pa.Table:
        words = pc.split_pattern(pc.cast(batch[text_col], pa.string()), " ")
        nw = pc.list_value_length(words).to_numpy().astype(np.int64)
        nc = pc.utf8_length(
            pc.cast(batch[text_col], pa.string())).to_numpy().astype(np.int64)
        flat = pc.list_flatten(words)
        seg = pc.list_parent_indices(words).to_numpy()
        if len(flat):
            hw = pd.util.hash_array(
                np.asarray(flat.to_pylist(), dtype=object),
                hash_key="belb_rulechain16", categorize=True)
            order = np.lexsort((hw, seg))
            seg_s, hw_s = seg[order], hw[order]
            new = np.r_[True, (seg_s[1:] != seg_s[:-1])
                        | (hw_s[1:] != hw_s[:-1])]
            run_starts = np.flatnonzero(new)
            cnt = np.diff(np.r_[run_starts, len(seg_s)])
            doc_of_run = seg_s[run_starts]
            doc_starts = np.flatnonzero(
                np.r_[True, doc_of_run[1:] != doc_of_run[:-1]])
            mx = np.zeros(batch.num_rows, np.int64)
            mx[doc_of_run[doc_starts]] = np.maximum.reduceat(cnt, doc_starts)
        else:
            mx = np.zeros(batch.num_rows, np.int64)
        reason = np.full(batch.num_rows, "keep", dtype=object)
        rep = mx * top_ratio_den > nw
        reason[rep] = "repetitive"
        lw = mean_len_den * (nc - nw + 1) > mean_len_num * nw
        reason[lw] = "long_words"
        reason[nw < min_words] = "too_short"
        if stats is not None:
            vals, counts = np.unique(reason[reason != "keep"],
                                     return_counts=True)
            # blocking, like counted_filter: the increment must land
            # before this task reports done or a post-pipeline snapshot
            # can undercount (one actor RTT per dropping batch only)
            ray.get([stats.add.remote("rule_filter_chain", str(v), int(c))
                     for v, c in zip(vals, counts)])
        return pa.table({
            id_col: batch[id_col],
            "n_words": pa.array(nw, pa.int64()),
            "reason": pa.array(reason, pa.string()),
        })

    return docs.select_columns([id_col, text_col]).map_batches(
        _f, batch_format="pyarrow")


def dedup_passages_rewrite(docs: rd.Dataset, k: int = 8,
                           id_col: str = "doc_id",
                           text_col: str = "text",
                           num_buckets: int = 0) -> rd.Dataset:
    """Cross-document passage-level dedup with corpus REWRITE (the
    C4-style span-removal policy): documents split into non-overlapping
    ``k``-word passages; only the globally FIRST occurrence of each
    distinct passage (by (doc_id, passage_idx) order) survives; every
    document is re-emitted with its surviving passages re-joined →
    (id, clean_text, n_kept, n_dropped). A document whose passages all
    lose still emits a row with empty text — no silent row loss (the
    reference's conservation policy, clean.py:228-232 length checks).

    Distributed shape: the explode is one streaming pass (list-offset
    arithmetic + one ListArray re-slice, no per-word Python); the
    first-occurrence winner is a MIN combiner over md5(passage) —
    passages shuffle as 32-byte digests + one packed int64, never as
    text; the winner attaches back via the size-guarded broadcast join
    (partitioned fallback past the threshold); the rebuild co-locates
    each doc's survivors with ONE doc-hash shuffle and joins them with
    a vectorized ListArray + binary_join — no per-doc Python in any hot
    stage. doc_id must fit 43 bits and passage index 20 bits (packed
    winner key)."""
    num_buckets = resolve_num_buckets(num_buckets)
    import hashlib

    from .agg import preagg_groupby
    from .analytic import _attach_small

    def _explode(batch: pa.Table) -> pa.Table:
        text = pc.cast(batch[text_col], pa.string())
        words = pc.split_pattern(text, " ")
        nw = pc.list_value_length(words).to_numpy().astype(np.int64)
        n_chunks = np.maximum((nw + k - 1) // k, 0)
        doc_ids = batch[id_col].to_numpy(zero_copy_only=False)
        total = int(n_chunks.sum())
        if total == 0:
            return pa.table({id_col: pa.array([], batch[id_col].type),
                             "idx": pa.array([], pa.int64()),
                             "md5": pa.array([], pa.string()),
                             "passage": pa.array([], pa.string()),
                             "n_chunks": pa.array([], pa.int64())})
        word_base = np.r_[0, np.cumsum(nw)]
        seg = np.repeat(np.arange(len(nw), dtype=np.int64), n_chunks)
        within = (np.arange(total, dtype=np.int64)
                  - np.repeat(np.cumsum(n_chunks) - n_chunks, n_chunks))
        starts = word_base[seg] + within * k
        ends = np.minimum(word_base[seg] + np.minimum(
            (within + 1) * k, nw[seg]), word_base[1:][seg])
        flat = pc.list_flatten(words).combine_chunks()
        offsets = np.empty(total + 1, np.int64)
        offsets[:-1] = starts
        offsets[-1] = ends[-1] if total else 0
        # chunk boundaries are contiguous inside a doc; across docs the
        # next start equals the previous end, so starts+last-end is a
        # valid monotone offsets vector
        lists = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), flat)
        passages = pc.binary_join(lists, " ")
        md5 = hashlib.md5
        digests = [md5(p.encode("utf-8")).hexdigest()
                   for p in passages.to_pylist()]
        return pa.table({
            id_col: pa.array(doc_ids[seg], batch[id_col].type),
            "idx": pa.array(within, pa.int64()),
            "md5": pa.array(digests, pa.string()),
            "passage": passages,
            "n_chunks": pa.array(n_chunks[seg], pa.int64()),
        })

    inst = docs.select_columns([id_col, text_col]).map_batches(
        _explode, batch_format="pyarrow").materialize()  # reused 2x

    def _pack(t: pa.Table) -> pa.Table:
        d = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "md5": t["md5"],
            "packed": pa.array((d << 20) | t["idx"].to_numpy(), pa.int64()),
        })

    winners = preagg_groupby(
        inst.map_batches(_pack, batch_format="pyarrow"),
        ["md5"], [("min", "packed", "first_packed")], num_buckets)

    marked = _attach_small(
        inst.map_batches(
            lambda t: _pack(t).append_column("idx", t["idx"])
            .append_column(id_col, t[id_col])
            .append_column("passage", t["passage"])
            .append_column("n_chunks", t["n_chunks"]),
            batch_format="pyarrow"),
        winners, "md5")

    kept = marked.filter(expr="packed == first_packed")

    def _bucketize(t: pa.Table) -> pa.Table:
        d = t[id_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = (d * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(num_buckets)
        return pa.table({
            id_col: t[id_col], "idx": t["idx"], "passage": t["passage"],
            "n_chunks": t["n_chunks"],
            "__bucket": pa.array(b.astype(np.int32)),
        })

    def _rebuild(group: pa.Table) -> pa.Table:
        d = group[id_col].to_numpy(zero_copy_only=False)
        idx = group["idx"].to_numpy()
        order = np.lexsort((idx, d))
        d = d[order]
        nchunk = group["n_chunks"].to_numpy()[order]
        passages = group["passage"].take(pa.array(order, pa.int64()))
        starts = np.flatnonzero(np.r_[True, d[1:] != d[:-1]])
        counts = np.diff(np.r_[starts, len(d)])
        lists = pa.ListArray.from_arrays(
            pa.array(np.r_[starts, len(d)], pa.int32()),
            passages.combine_chunks())
        return pa.table({
            id_col: pa.array(d[starts], group[id_col].type),
            "clean_text": pc.binary_join(lists, " "),
            "n_kept": pa.array(counts, pa.int64()),
            "n_dropped": pa.array(nchunk[starts] - counts, pa.int64()),
        })

    rebuilt = (kept.map_batches(_bucketize, batch_format="pyarrow")
               .groupby("__bucket")
               .map_groups(_rebuild, batch_format="pyarrow"))

    # docs whose every passage lost re-enter with empty text; their
    # n_dropped (= total chunks) is re-derived from the original text
    all_docs = docs.select_columns([id_col, text_col])
    out = _attach_small(all_docs, rebuilt, id_col, join_type="left outer")

    def _fill(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        lost = b["clean_text"].isna()
        if lost.any():
            nw = b.loc[lost, text_col].str.split(" ").str.len().to_numpy()
            b.loc[lost, "n_dropped"] = (nw + k - 1) // k
        b["clean_text"] = b["clean_text"].fillna("")
        b["n_kept"] = b["n_kept"].fillna(0).astype(np.int64)
        b["n_dropped"] = b["n_dropped"].astype(np.int64)
        return b.drop(columns=[text_col])

    return out.map_batches(_fill, batch_format="pandas")


def cross_corpus_overlap(train: rd.Dataset, bench: rd.Dataset,
                         n: int = 3, id_col: str = "doc_id",
                         text_col: str = "text",
                         num_buckets: int = 0,
                         broadcast_threshold: int = 2_000_000
                         ) -> rd.Dataset:
    """Benchmark-contamination overlap when the benchmark side is ALSO
    dataset-scale — the shuffle complement to ``contamination_flags``
    (which broadcasts a driver-small benchmark list).

    → (id_col, n_contaminated_ngrams [distinct shared word n-grams],
    contaminated) for every train doc, zero-filled — same contract and
    SQL mirror as ``contamination_flags``.

    Distributed shape: both sides reduce to distinct 64-bit word-n-gram
    hashes per doc (one vectorized keyed hash per doc set — the bench
    side additionally dedups per batch and ships ONLY 8-byte hashes,
    never text), ONE hash(gram) co-location shuffle marks train grams
    present on the bench side, per-doc distinct-hit counts ride the sum
    combiner, and the zero-fill is a size-guarded left broadcast join
    onto the train id list. Train text never shuffles."""
    num_buckets = resolve_num_buckets(num_buckets)
    from .agg import _bucket_of_frame, preagg_groupby
    from .analytic import _attach_small

    def _hash_grams(text: str) -> np.ndarray:
        gs = _word_ngrams(text, n)
        if not gs:
            return np.zeros(0, np.int64)
        return pd.util.hash_array(np.asarray(list(gs), object),
                                  hash_key="belb_ray_xgram16",
                                  categorize=False).view(np.int64)

    def _explode_train(b: pd.DataFrame) -> pd.DataFrame:
        hs, ids = [], []
        for i, t in zip(b[id_col], b[text_col]):
            h = _hash_grams(t)
            hs.append(h)
            ids.append(np.full(h.size, i, np.int64))
        h = np.concatenate(hs) if hs else np.zeros(0, np.int64)
        i = np.concatenate(ids) if ids else np.zeros(0, np.int64)
        return pd.DataFrame({"h": h, "docid": i,
                             "__side": np.ones(h.size, np.int8)})

    def _explode_bench(b: pd.DataFrame) -> pd.DataFrame:
        hs = [_hash_grams(t) for t in b[text_col]]
        h = np.unique(np.concatenate(hs)) if hs else np.zeros(0, np.int64)
        return pd.DataFrame({"h": h,
                             "docid": np.full(h.size, -1, np.int64),
                             "__side": np.zeros(h.size, np.int8)})

    tg = train.select_columns([id_col, text_col]).map_batches(
        _explode_train, batch_format="pandas")
    bg = bench.select_columns([text_col]).map_batches(
        _explode_bench, batch_format="pandas")

    def _bucketize(b: pd.DataFrame) -> pd.DataFrame:
        b["__bucket"] = _bucket_of_frame(b, ["h"], num_buckets)
        return b

    def _mark(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop(columns="__bucket")
        side = g["__side"].to_numpy()
        bset = np.unique(g["h"].to_numpy()[side == 0])
        tr = g[side == 1]
        hit = np.isin(tr["h"].to_numpy(), bset, assume_unique=False)
        counts = (pd.DataFrame({"docid": tr["docid"].to_numpy()[hit]})
                  .groupby("docid", sort=False).size()
                  .rename("cnt").reset_index())
        counts["cnt"] = counts["cnt"].astype(np.int64)
        return counts

    hits = preagg_groupby(
        tg.union(bg).map_batches(_bucketize, batch_format="pandas")
        .groupby("__bucket").map_groups(_mark, batch_format="pandas"),
        ["docid"], [("sum", "cnt", "cnt")], num_buckets)

    hits = hits.map_batches(
        lambda b: b.rename(columns={"docid": id_col}),
        batch_format="pandas")
    out = _attach_small(train.select_columns([id_col]), hits, id_col,
                        broadcast_threshold, join_type="left outer")

    def _finish(b: pd.DataFrame) -> pd.DataFrame:
        cnt = b["cnt"].fillna(0).astype(np.int64)
        return pd.DataFrame({id_col: b[id_col].to_numpy(np.int64),
                             "n_contaminated_ngrams": cnt,
                             "contaminated": cnt > 0})

    return out.map_batches(_finish, batch_format="pandas")
