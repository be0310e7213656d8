"""TF-IDF term weighting over a document table.

The north-star blocking design calls for "TF-IDF vocabularies" held by
stateful stages; this operator is the standalone surface: top-k terms
per document by tf·idf (smooth idf, sklearn-style
``ln((1+n)/(1+df)) + 1``), composed entirely from existing primitives:

1. tf: one ``map_batches`` pass — a document lives in one row, so its
   per-term counts complete inside the batch (no shuffle),
2. df: combiner-style partial counts per block → one bucketed combine
   over the vocabulary (``agg.bucketed_combine``),
3. idf attach: vocabulary broadcast via ``ray.put`` when it fits the
   budget (vocabularies are dictionary-sized, not corpus-sized), else a
   hash-partitioned join on token — the same size-aware pattern as
   ``scoring.attach_features``,
4. per-doc top-k: ``agg.grouped_topk`` (local head-k per block, one
   bucketed combine — ≤ k rows per doc per block shuffle).

Arithmetic is mirrored expression-for-expression by the SQL oracle
(``__ray_entry__`` ``tfidf_top_terms``), so weights hash-match exactly.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from .agg import bucketed_combine, grouped_topk

_TOKEN_RE = re.compile(r"[a-z0-9]+")


def tfidf_top_terms(
    docs: rd.Dataset,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 4,
    num_buckets: int = 64,
    broadcast_vocab_limit: int = 5_000_000,
) -> rd.Dataset:
    """→ (id_col, token, weight): the k highest-tf·idf terms per doc,
    ties broken (weight desc, token asc) so the cut is deterministic."""
    import ray

    n_docs = float(docs.count())

    def _tf(batch: pa.Table) -> pa.Table:
        ids, toks = [], []
        for i, txt in zip(batch[id_col].to_pylist(),
                          batch[text_col].to_pylist()):
            for w in _TOKEN_RE.findall((txt or "").lower()):
                ids.append(i)
                toks.append(w)
        df = pd.DataFrame({id_col: ids, "token": toks})
        tf = (df.groupby([id_col, "token"], sort=False)
                .size().rename("tf").reset_index())
        return pa.Table.from_pandas(tf, preserve_index=False)

    tf_rows = docs.select_columns([id_col, text_col]).map_batches(
        _tf, batch_format="pyarrow")

    def _df_partial(batch: pd.DataFrame) -> pd.DataFrame:
        # tf rows are unique per (doc, token), so row-count == doc-count
        return (batch.groupby("token", sort=False)
                     .size().rename("df").reset_index())

    df_ds = bucketed_combine(
        tf_rows.map_batches(_df_partial, batch_format="pandas"),
        ["token"], {"df": "sum"}, num_buckets=num_buckets)

    vocab_size = df_ds.count()
    if vocab_size <= broadcast_vocab_limit:
        vocab = df_ds.to_pandas()
        idf_map = pd.Series(
            (np.log((1.0 + n_docs) / (1.0 + vocab["df"].to_numpy(np.float64)))
             + 1.0),
            index=vocab["token"])
        ref = ray.put(idf_map)

        def _weigh(batch: pd.DataFrame) -> pd.DataFrame:
            idf = ray.get(ref)
            w = batch["tf"].to_numpy(np.float64) * \
                batch["token"].map(idf).to_numpy(np.float64)
            batch["weight"] = np.round(w, round_to)
            return batch[[id_col, "token", "weight"]]

        weighted = tf_rows.map_batches(_weigh, batch_format="pandas")
    else:
        from .joins import hash_partition_join

        joined = hash_partition_join(tf_rows, df_ds, key="token",
                                     num_buckets=num_buckets)

        def _weigh_joined(batch: pd.DataFrame) -> pd.DataFrame:
            idf = np.log((1.0 + n_docs)
                         / (1.0 + batch["df"].to_numpy(np.float64))) + 1.0
            w = batch["tf"].to_numpy(np.float64) * idf
            batch["weight"] = np.round(w, round_to)
            return batch[[id_col, "token", "weight"]]

        weighted = joined.map_batches(_weigh_joined, batch_format="pandas")

    return grouped_topk(weighted, keys=[id_col], order_col="weight", k=k,
                        descending=True, tiebreak="token",
                        num_buckets=num_buckets)
