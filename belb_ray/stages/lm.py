"""Corpus n-gram language-model scoring.

The classic LLM-training-data quality filter (KenLM-style): train bigram
statistics on the corpus itself, then score every document by its mean
token-bigram log-probability under add-k smoothing::

    P(w₂|w₁) = (c(w₁,w₂) + k) / (c(w₁) + k·V)
    score(doc) = mean over the doc's bigrams of ln P

Low scores flag documents whose token transitions are unlike the corpus
(gibberish, boilerplate soup, wrong-language fragments).

Distributed shape — two streaming passes over the docs plus fixed-width
count exchanges, no all-pairs, nothing quadratic:

1. **count** — one pass explodes each doc into (w₁, w₂) bigram rows
   (vectorized: the whole batch's tokens hash-free, shifted-slice
   pairing, doc boundaries masked) and a combiner groupby produces the
   bigram table; context counts c(w₁) re-aggregate that table; V is a
   distinct-count over the token stream.
2. **score** — a second pass re-explodes bigrams and attaches c₁₂/c₁ via
   the size-guarded broadcast (hash-join fallback past the threshold),
   then one combiner mean per doc.

Both tables are vocabulary-sized (≪ corpus at scale); the SQL oracle
mirrors the arithmetic expression-for-expression.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from belb_ray.util import resolve_num_buckets

_SEP = "\x00"  # joint bigram key separator (cannot appear in a token)


def _bigram_rows(docs: rd.Dataset, id_col: str, text_col: str,
                 with_doc: bool) -> rd.Dataset:
    """Explode docs into bigram rows: (w1, w2) plus the doc id when
    ``with_doc``. Tokenization is ``text.split(' ')`` (SQL string_split
    parity)."""

    def _explode(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        texts = batch[text_col].to_pylist()
        toks_per_doc = [("" if t is None else t).split(" ") for t in texts]
        lens = np.fromiter((len(t) for t in toks_per_doc), np.int64,
                           len(toks_per_doc))
        total = int(lens.sum())
        flat = np.empty(total, dtype=object)
        off = 0
        for toks in toks_per_doc:
            flat[off:off + len(toks)] = toks
            off += len(toks)
        m = max(total - 1, 0)
        doc_of = np.repeat(np.arange(len(lens)), lens)[:m]
        pos = (np.arange(total)
               - np.repeat(np.concatenate(([0], np.cumsum(lens)[:-1])),
                           lens))[:m]
        valid = pos + 2 <= np.repeat(lens, lens)[:m]
        cols = {"w1": pa.array(flat[:m][valid], pa.string()),
                "w2": pa.array(flat[1:][valid], pa.string())}
        if with_doc:
            cols[id_col] = pa.array(ids[doc_of[valid]])
        return pa.table(cols)

    return docs.map_batches(_explode, batch_format="pyarrow",
                            batch_size=4096)


def lm_score(docs: rd.Dataset, id_col: str = "doc_id",
             text_col: str = "text", add_k: float = 1.0,
             num_buckets: int = 0,
             broadcast_threshold: int = 2_000_000) -> rd.Dataset:
    """(doc_id, n_bigrams, logprob_mean) for every doc with ≥1 bigram,
    under the corpus's own add-k bigram model."""
    num_buckets = resolve_num_buckets(num_buckets)
    from .agg import preagg_groupby
    from .analytic import _attach_small

    big = _bigram_rows(docs, id_col, text_col, with_doc=False)
    c12 = preagg_groupby(big, ["w1", "w2"], [("count", "", "c12")],
                         num_buckets).materialize()
    c1 = preagg_groupby(c12, ["w1"], [("sum", "c12", "c1")], num_buckets)

    # V = distinct tokens in the corpus (every token is some bigram's w1
    # or the doc's last token; count over the full token stream)
    def _toks(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        out = [t for s in texts for t in ("" if s is None else s).split(" ")]
        return pa.table({"tok": pa.array(out, pa.string())})

    vocab = preagg_groupby(
        docs.select_columns([text_col]).map_batches(
            _toks, batch_format="pyarrow"),
        ["tok"], [("count", "", "__n")], num_buckets)
    v_size = vocab.count()

    def _joint12(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "__bg": batch["w1"] + _SEP + batch["w2"],
            "c12": batch["c12"],
        })

    c12_keyed = c12.map_batches(_joint12, batch_format="pandas")

    scored = _bigram_rows(docs, id_col, text_col, with_doc=True)

    def _key(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            id_col: batch[id_col],
            "w1": batch["w1"],
            "__bg": batch["w1"] + _SEP + batch["w2"],
        })

    keyed = scored.map_batches(_key, batch_format="pandas")
    keyed = _attach_small(keyed, c12_keyed, "__bg", broadcast_threshold)
    keyed = _attach_small(keyed, c1, "w1", broadcast_threshold)

    def _logp(batch: pd.DataFrame) -> pd.DataFrame:
        p = ((batch["c12"].to_numpy(dtype=np.float64) + add_k)
             / (batch["c1"].to_numpy(dtype=np.float64) + add_k * v_size))
        return pd.DataFrame({id_col: batch[id_col], "__lp": np.log(p)})

    sums = preagg_groupby(
        keyed.map_batches(_logp, batch_format="pandas"),
        [id_col], [("sum", "__lp", "__s"), ("count", "", "n_bigrams")],
        num_buckets)

    def _mean(batch: pd.DataFrame) -> pd.DataFrame:
        batch["logprob_mean"] = batch["__s"] / batch["n_bigrams"]
        return batch.drop(columns="__s")

    return sums.map_batches(_mean, batch_format="pandas")
