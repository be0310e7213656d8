"""Per-document exact-substring duplication statistics.

Document-granularity companion to ``dupspans.duplicate_passage_spans``
(same Lee et al. 2022 exact-substring signal, same
``dupspans.gram_positions`` kernel): instead of materializing maximal
duplicated spans, score each DOCUMENT by how much of it is duplicated —
``dup_grams`` k-token windows occurring >= ``min_total`` times
corpus-wide, ``total_grams`` windows overall, and their ratio
``dup_frac``, the standard drop/keep curation signal (e.g. "drop docs
with >30% duplicated windows").

Distributed shape: the gram kernel's one streaming pass (token hashes →
vectorized polynomial windows, text never ships), batch-local
(gram, doc) collapse, ONE gram-bucket shuffle to mark global totals and
re-collapse per doc within the bucket, ONE doc-bucket combine. Gram
identity is the kernel's 64-bit fingerprint — collisions (~n²/2⁶⁴) can
only over-count duplication, never under-count.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from belb_ray.stages.agg import _bucket_of_frame, bucketed_combine
from belb_ray.stages.dupspans import gram_positions

from belb_ray.util import resolve_num_buckets
from ..util import round_half_away


def cross_doc_gram_stats(ds: rd.Dataset, id_col: str, text_col: str,
                         k: int = 8, num_buckets: int = 0,
                         min_total: int = 2) -> rd.Dataset:
    """Per-document (id, dup_grams, total_grams, dup_frac) for every
    document with >= k tokens; shorter documents produce no row
    (matching the SQL oracle's semantics)."""
    num_buckets = resolve_num_buckets(num_buckets)
    positions = gram_positions(ds, k, id_col=id_col, text_col=text_col)

    def _collapse(b: pd.DataFrame) -> pd.DataFrame:
        # batch-local (gram, doc) occurrence counts before the shuffle
        return (b.groupby(["gram", "doc"], sort=False)
                .size().rename("c").reset_index())

    partials = positions.map_batches(_collapse, batch_format="pandas",
                                     batch_size=1 << 18)

    def _bucketize(b: pd.DataFrame) -> pd.DataFrame:
        b["__bucket"] = _bucket_of_frame(b, ["gram"], num_buckets)
        return b

    def _mark(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop(columns="__bucket")
        g = (g.groupby(["gram", "doc"], sort=False)["c"]
             .sum().reset_index())
        tot = g.groupby("gram", sort=False)["c"].transform("sum")
        g["dup"] = np.where(tot >= min_total, g["c"], 0)
        return (g.groupby("doc", sort=False)
                .agg(dup_grams=("dup", "sum"), total_grams=("c", "sum"))
                .reset_index())

    marked = (partials.map_batches(_bucketize, batch_format="pandas",
                                   batch_size=1 << 18)
              .groupby("__bucket").map_groups(_mark,
                                              batch_format="pandas"))

    out = bucketed_combine(marked, ["doc"],
                           {"dup_grams": "sum", "total_grams": "sum"},
                           num_buckets=num_buckets)

    def _finish(b: pd.DataFrame) -> pd.DataFrame:
        b = b.rename(columns={"doc": id_col})
        b["dup_frac"] = round_half_away(b["dup_grams"] / b["total_grams"], 6)
        b["dup_grams"] = b["dup_grams"].astype(np.int64)
        b["total_grams"] = b["total_grams"].astype(np.int64)
        return b

    return out.map_batches(_finish, batch_format="pandas")
