"""BM25 keyword search over a document table — two streaming passes.

The reference's retrieval layer is SQL lookups over name/homonym tables
(belb/kbs/query.py — SURVEY §2.5/§2.6); this is the graft's free-text
analog for training-data curation (find documents matching query terms):

1. STATS pass: one row per *batch* of (n_docs, total_len, df per query
   term) partials — the only thing collected to the driver is one tiny
   row per block, never the corpus.
2. SCORE pass: the per-term idf and avgdl broadcast into a stateless
   ``map_batches`` that scores every doc vectorized and keeps its local
   top-k, then a final sort+limit over the (blocks × k)-row remainder.

The arithmetic mirrors the DuckDB oracle expression-for-expression
(same association order), so scores hash-match at the driver's rounding.
"""

from __future__ import annotations

import re
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from belb_ray.functions.arrow import table_from_pandas

from belb_ray.util import resolve_num_buckets
from ..util import round_half_away

_TOKEN_RE = re.compile(r"[a-z0-9]+")


def _tokenize(text: str) -> list[str]:
    """lower + split on non-alnum, drop empties — the exact token set of
    ``list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')``."""
    return _TOKEN_RE.findall(text.lower())


def bm25_topk(
    docs: rd.Dataset,
    terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 4,
) -> rd.Dataset:
    """Top-k documents by BM25 score for ``terms``.

    Returns (id_col, score) with score rounded to ``round_to`` decimals;
    ranking is (rounded score desc, id asc) so the cut is total-order
    deterministic.
    """
    import ray

    terms = list(terms)
    nt = len(terms)

    def _stats(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        df = np.zeros(nt, dtype=np.int64)
        total_len = 0
        for t in texts:
            toks = _tokenize(t or "")
            total_len += len(toks)
            tokset = set(toks)
            for i, term in enumerate(terms):
                if term in tokset:
                    df[i] += 1
        cols = {"n_docs": pa.array([len(texts)], pa.int64()),
                "total_len": pa.array([total_len], pa.int64())}
        for i, term in enumerate(terms):
            cols[f"df_{i}"] = pa.array([df[i]], pa.int64())
        return pa.table(cols)

    part = docs.select_columns([text_col]).map_batches(
        _stats, batch_format="pyarrow").to_pandas()
    n = float(part["n_docs"].sum()) if "n_docs" in part.columns else 0.0
    if n == 0:
        return rd.from_arrow(pa.table({id_col: pa.array([], pa.int64()),
                                       "score": pa.array([], pa.float64())}))
    avgdl = float(part["total_len"].sum()) / n
    df = np.array([float(part[f"df_{i}"].sum()) for i in range(nt)])
    # BM25+ style idf, expression mirrored verbatim in the SQL oracle
    idf = np.log((n - df + 0.5) / (df + 0.5) + 1.0)
    ref = ray.put((idf, avgdl))

    def _score(batch: pa.Table) -> pa.Table:
        idf, avgdl = ray.get(ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        texts = batch[text_col].to_pylist()
        m = len(texts)
        tf = np.zeros((m, nt), dtype=np.float64)
        dl = np.zeros(m, dtype=np.float64)
        for r, t in enumerate(texts):
            toks = _tokenize(t or "")
            dl[r] = len(toks)
            if toks:
                cnt = Counter(toks)
                for i, term in enumerate(terms):
                    tf[r, i] = cnt.get(term, 0)
        score = np.zeros(m, dtype=np.float64)
        norm = k1 * (1.0 - b + b * dl / avgdl)
        # accumulate term-by-term in declaration order == the oracle's
        # left-associated (+) chain, for bit-stable float parity
        for i in range(nt):
            score = score + idf[i] * (tf[:, i] * (k1 + 1.0)) / (tf[:, i] + norm)
        score = round_half_away(score, round_to)
        out = pd.DataFrame({id_col: ids, "score": score})
        out = out.sort_values(["score", id_col],
                              ascending=[False, True], kind="mergesort").head(k)
        return table_from_pandas(out)

    partial = docs.select_columns([id_col, text_col]).map_batches(
        _score, batch_format="pyarrow")
    return partial.sort(["score", id_col], descending=[True, False]).limit(k)


def rrf_fuse(
    rankings: list[rd.Dataset],
    id_col: str,
    orders: list[list[tuple[str, bool]]],
    query_col: str | None = None,
    rrf_k: int = 60,
    top_k: int | None = None,
    round_to: int = 6,
    num_buckets: int = 0,
) -> rd.Dataset:
    """Reciprocal-rank fusion of N rankings (hybrid search):
    score(q, d) = Σ_i 1 / (rrf_k + rank_i(q, d)), items absent from a
    ranking contribute nothing (Cormack et al. 2009's RRF).

    ``orders[i]``: (column, descending) list that TOTALLY orders ranking
    i within a query (ties must be broken — include the id column).
    ``query_col=None`` fuses single-query shortlists.

    Distributed shape: per ranking, ranks come from the existing
    ``ordered_window`` row_number (ONE hash(query) co-location shuffle
    of that ranking — shortlists, not the corpus); contributions union
    and combine with one bucketed groupby on (query, id). Contributions
    are summed in ranking order, so float addition is reproducible and
    the SQL mirror (COALESCE(term_0) + COALESCE(term_1) + …) matches
    bit-for-bit. Nothing corpus-sized moves; driver holds nothing.
    """
    num_buckets = resolve_num_buckets(num_buckets)
    from .agg import _bucket_of_frame, grouped_topk
    from .analytic import ordered_window

    qcol = query_col or "__q"
    tagged = []
    for i, (ds, spec) in enumerate(zip(rankings, orders)):
        ocols = []

        def _prep(batch: pd.DataFrame, i=i, spec=spec,
                  ocols_out=ocols) -> pd.DataFrame:
            if query_col is None:
                batch[qcol] = np.int64(0)
            for j, (col, desc) in enumerate(spec):
                v = batch[col].to_numpy()
                if desc:
                    if not np.issubdtype(v.dtype, np.number):
                        raise TypeError(
                            f"rrf_fuse: descending order column {col!r} "
                            f"must be numeric")
                    v = -v
                batch[f"__o{j}"] = v
            return batch

        ocols = [f"__o{j}" for j in range(len(spec))]
        ranked = ordered_window(
            ds.map_batches(_prep, batch_format="pandas"),
            key=qcol, order_cols=ocols,
            specs=[("row_number", "", "__rank")],
            num_buckets=num_buckets)

        def _contrib(batch: pd.DataFrame, i=i) -> pd.DataFrame:
            return pd.DataFrame({
                qcol: batch[qcol].to_numpy(),
                id_col: batch[id_col].to_numpy(),
                "__src": np.full(len(batch), i, dtype=np.int8),
                "__contrib": 1.0 / (rrf_k + batch["__rank"].to_numpy()),
            })

        tagged.append(ranked.map_batches(_contrib, batch_format="pandas"))

    both = tagged[0]
    for t in tagged[1:]:
        both = both.union(t)

    def _bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        batch["__bucket"] = _bucket_of_frame(batch, [qcol, id_col],
                                             num_buckets)
        return batch

    def _combine(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([qcol, id_col, "__src"], kind="mergesort")
        out = (g.groupby([qcol, id_col], sort=False, as_index=False)
               ["__contrib"].sum())
        out["rrf_score"] = round_half_away(out.pop("__contrib").to_numpy(),
                                    round_to)
        return out

    fused = (both.map_batches(_bucketize, batch_format="pandas")
             .groupby("__bucket").map_groups(_combine,
                                             batch_format="pandas"))
    if top_k is not None:
        fused = grouped_topk(fused, [qcol], "rrf_score", top_k,
                             descending=True, tiebreak=id_col,
                             num_buckets=num_buckets)
    if query_col is None:
        fused = fused.drop_columns([qcol])
    return fused
