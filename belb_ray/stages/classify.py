"""Multinomial Naive Bayes text classification, trained and scored
distributed.

The classic cheap corpus-labeling pass of a training-data pipeline
(fastText-style quality/language/source tagging without a model
artifact): fit token likelihoods per label from a labeled corpus with
add-α smoothing, then score every document against every label::

    ln P(label | doc) ∝ ln(n_docs_label / N)
                      + Σ_tok ln((c(label, tok) + α) / (total_label + α·V))

(multinomial NB with Laplace smoothing; V = corpus vocabulary size,
total_label = Σ token occurrences under the label). Reference analog:
the corpus/KB QAQC statistics machinery aggregates per-label counts the
same way (``/root/reference/belb/kbs/query.py`` count shapes); the
classifier itself is a graft extension.

Distributed shape — counts-based throughout, nothing quadratic:

1. **fit** — one pass explodes docs into (label, tok) rows and a
   combiner groupby yields the count table (vocabulary × labels rows,
   ≪ corpus); label doc counts and per-label token totals are
   label-count-sized. The count table is widened to one row per token
   (``c_<label>`` columns — the ``pivot_agg`` device) so likelihoods
   for ALL labels ride one attach.
2. **score** — a second streaming pass re-explodes tokens and attaches
   the per-token ln-likelihood row via the size-guarded broadcast
   (hash-join fallback past the threshold — the ``lm_score`` policy),
   then ONE per-doc sum combiner per label and a tiny prior add.

Output: (id_col, label, log_score) — one row per doc × label, the full
posterior surface (callers argmax over rounded scores; emitting scores
rather than a bare argmax keeps the op hash-comparable to the SQL
mirror without float-tie hazards).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd
from ..util import round_half_away


def _token_rows(docs: rd.Dataset, cols: list[str],
                text_col: str) -> rd.Dataset:
    """Explode docs into one row per token occurrence, carrying
    ``cols``. Tokenization is ``text.split(' ')`` (SQL string_split
    parity); empty tokens are dropped."""
    import pyarrow.compute as pc

    def _explode(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch[text_col].combine_chunks(), " ")
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        lens = np.nan_to_num(lens.astype(np.float64)).astype(np.int64)
        flat = pc.list_flatten(toks)
        keep = pc.not_equal(flat, "")
        idx = np.repeat(np.arange(len(batch), dtype=np.int64), lens)
        idx = idx[keep.to_numpy(zero_copy_only=False)]
        out = {c: batch[c].take(pa.array(idx)) for c in cols}
        out["tok"] = flat.filter(keep)
        return pa.table(out)

    return docs.select_columns(cols + [text_col]).map_batches(
        _explode, batch_format="pyarrow", batch_size=4096)


def nb_classify(
    docs: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "lang",
    alpha: float = 1.0,
    round_to: int = 6,
    num_buckets: int = 0,
    broadcast_threshold: int = 2_000_000,
) -> rd.Dataset:
    """Fit multinomial NB on ``docs`` and score the same corpus →
    (id_col, label, log_score) for every doc × label, log_score rounded
    to ``round_to``. Scoring the training corpus means no
    out-of-vocabulary tokens; the smoothed likelihood still assigns
    unseen (label, tok) cells mass α/(total+α·V) via the zero-count
    fill."""
    from .agg import bucketed_combine, preagg_groupby
    from .analytic import _attach_small
    from .joins import collect_arrow

    lt = _token_rows(docs, [label_col], text_col)
    counts = preagg_groupby(lt, [label_col, "tok"],
                            [("count", "", "c")], num_buckets) \
        .materialize()  # vocabulary-sized; reused 3× (totals/vocab/widen)

    # label-count-sized: doc counts per label (priors)
    labels_tbl = collect_arrow(preagg_groupby(
        docs.select_columns([label_col]), [label_col],
        [("count", "", "n_docs")], num_buckets)).to_pandas() \
        .sort_values(label_col).reset_index(drop=True)
    labels = labels_tbl[label_col].tolist()
    n_total = int(labels_tbl["n_docs"].sum())

    # per-label token totals + vocabulary size derive from the count
    # table (vocabulary-sized, never the corpus)
    totals_tbl = collect_arrow(preagg_groupby(
        counts, [label_col], [("sum", "c", "total")],
        num_buckets)).to_pandas()
    totals = dict(zip(totals_tbl[label_col], totals_tbl["total"]))
    v_size = _vocab_size(counts, num_buckets)

    # widen to one row per token with a ln-likelihood column per label
    # (the pivot_agg device: widen in the partial, sum-combine on tok)
    def _widen(batch: pd.DataFrame) -> pd.DataFrame:
        out = {"tok": batch["tok"]}
        lab = batch[label_col].to_numpy()
        c = batch["c"].to_numpy(np.int64)
        for l_ in labels:
            out[f"__c_{l_}"] = np.where(lab == l_, c, 0)
        return pd.DataFrame(out)

    wide = bucketed_combine(
        counts.map_batches(_widen, batch_format="pandas"), ["tok"],
        {f"__c_{l_}": "sum" for l_ in labels}, num_buckets)

    def _lnp(batch: pd.DataFrame) -> pd.DataFrame:
        out = {"tok": batch["tok"]}
        for l_ in labels:
            c = batch[f"__c_{l_}"].to_numpy(np.float64)
            out[f"__lp_{l_}"] = np.log(
                (c + alpha) / (float(totals.get(l_, 0)) + alpha * v_size))
        return pd.DataFrame(out)

    lnp = wide.map_batches(_lnp, batch_format="pandas")

    # score pass: explode tokens, attach the per-token likelihood row
    # (broadcast under the threshold, hash join above), per-doc sums
    toks = _token_rows(docs, [id_col], text_col)
    attached = _attach_small(toks, lnp, "tok", broadcast_threshold)
    sums = preagg_groupby(
        attached, [id_col],
        [("sum", f"__lp_{l_}", f"__s_{l_}") for l_ in labels],
        num_buckets)

    priors = {l_: math.log(int(n) / n_total)
              for l_, n in zip(labels_tbl[label_col],
                               labels_tbl["n_docs"])}

    def _finish(batch: pd.DataFrame) -> pd.DataFrame:
        n = len(batch)
        ids = np.repeat(batch[id_col].to_numpy(), len(labels))
        lab = np.tile(np.array(labels, dtype=object), n)
        score = np.empty(n * len(labels), np.float64)
        for j, l_ in enumerate(labels):
            score[j::len(labels)] = (priors[l_]
                                     + batch[f"__s_{l_}"].to_numpy())
        return pd.DataFrame({id_col: ids, "label": lab,
                             "log_score": round_half_away(score, round_to)})

    return sums.map_batches(_finish, batch_format="pandas")


def _vocab_size(counts: rd.Dataset, num_buckets: int) -> int:
    """Distinct tokens in the (label, tok) count table — a bucketed
    distinct over the vocabulary-sized table, not the corpus."""
    from .agg import preagg_groupby

    return preagg_groupby(counts.select_columns(["tok"]), ["tok"],
                          [("count", "", "__n")], num_buckets).count()
