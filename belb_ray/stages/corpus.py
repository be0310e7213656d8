"""Corpus-statistics and dataset-composition operators: corpus-wide
n-gram counts, column profiling, deterministic mixture sampling, inverted
index.

Reference analog: the reference's corpus-statistics scripts
(/root/reference/belb/scripts/stats.py) and its per-source corpus
assembly (corpora/__init__.py registry + per-corpus subset selection)
generalized to the ops a pretraining-data mixture pipeline needs.

Scale shapes (100 TB):
- ``ngram_counts``: per-batch ``value_counts`` combiner → ONE bucketed
  combine on the gram key → tiny global top-k sort. Rows never shuffle;
  only (gram, count) partials do.
- ``profile_columns``: fixed-width per-batch count partials plus
  per-batch-deduped (column, value) pairs; one bucketed combine each.
  Output is O(#columns) rows.
- ``mixture_sample``: stateless per-batch hash filter against the
  broadcast-free per-source rate map (tiny dict captured in the task
  closure) — deterministic, partition-independent, no shuffle.
- ``inverted_index``: per-batch-deduped (term, doc) pairs → one bucketed
  shuffle on term → whole-bucket vectorized postings-list assembly
  (ListArray.from_arrays over group boundaries, no per-term Python agg).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from .agg import _bucket_of_frame, bucketed_combine, topk
from .sampling import MD5_SPACE, _md5_hash60
from .curation import GRAM_WORD_RE

from belb_ray.util import resolve_num_buckets
from ..util import round_half_away


def _word_gram_series(texts: list[str], n: int) -> pd.Series:
    grams: list[str] = []
    for t in texts:
        w = GRAM_WORD_RE.findall((t or "").lower())
        if n == 1:
            grams.extend(w)
        else:
            grams.extend(" ".join(w[i:i + n]) for i in range(len(w) - n + 1))
    return pd.Series(grams, dtype=object)


def ngram_counts(ds: rd.Dataset, n: int = 2, top_k: int | None = None,
                 text_col: str = "text", num_buckets: int = 0) -> rd.Dataset:
    """Corpus-wide word ``n``-gram frequency table → (gram, n_occurrences),
    optionally truncated to the global top-k (count desc, gram asc
    tie-break). Words are ``[a-z0-9]+`` runs of lowercased text — the same
    oracle-mirrored tokenizer contract as ``curation``."""

    num_buckets = resolve_num_buckets(num_buckets)
    def _partial(batch: pa.Table) -> pa.Table:
        vc = _word_gram_series(batch[text_col].to_pylist(), n).value_counts()
        return pa.table({"gram": pa.array(vc.index, pa.string()),
                         "n_occurrences": pa.array(vc.to_numpy(), pa.int64())})

    partials = ds.map_batches(_partial, batch_format="pyarrow")
    out = bucketed_combine(partials, ["gram"], {"n_occurrences": "sum"},
                           num_buckets)
    if top_k is not None:
        out = topk(out, "n_occurrences", top_k, tiebreak="gram")
    return out


def profile_columns(ds: rd.Dataset, cols: list[str],
                    num_buckets: int = 0) -> rd.Dataset:
    """Data-quality column profile → one row per profiled column:
    (col_name, n_rows, n_nulls, n_distinct [non-null, exact]).

    Distinctness is counted on each column's native values (converted to
    their injective ``str()`` transport form only to share one schema
    across columns), so it matches SQL ``count(DISTINCT col)``."""

    num_buckets = resolve_num_buckets(num_buckets)
    def _counts(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "col_name": cols,
            "n_rows": np.int64(len(batch)),
            "n_nulls": [np.int64(batch[c].isna().sum()) for c in cols],
        })

    counts = bucketed_combine(
        ds.map_batches(_counts, batch_format="pandas"),
        ["col_name"], {"n_rows": "sum", "n_nulls": "sum"}, num_buckets)

    def _pairs(batch: pd.DataFrame) -> pd.DataFrame:
        frames = [pd.DataFrame({
            "col_name": c,
            "__v": batch[c].dropna().unique().astype(str)}) for c in cols]
        out = pd.concat(frames, ignore_index=True)
        out["__bucket"] = _bucket_of_frame(out, ["col_name", "__v"],
                                           num_buckets)
        return out

    def _distinct_count(group: pd.DataFrame) -> pd.DataFrame:
        # a (col, value) pair always lands in ONE bucket, so per-bucket
        # dedup + count partials sum to the exact global distinct count
        vc = (group.drop(columns="__bucket").drop_duplicates()
              ["col_name"].value_counts())
        return pd.DataFrame({"col_name": vc.index,
                             "n_distinct": vc.to_numpy().astype(np.int64)})

    distinct = bucketed_combine(
        ds.map_batches(_pairs, batch_format="pandas")
        .groupby("__bucket").map_groups(_distinct_count,
                                        batch_format="pandas"),
        ["col_name"], {"n_distinct": "sum"}, num_buckets)

    from .joins import broadcast_join
    return broadcast_join(counts, distinct, ["col_name"])


def mixture_sample(ds: rd.Dataset, source_col: str, weights: dict[str, float],
                   key: str, seed: int = 0) -> rd.Dataset:
    """Training-mixture sampling: keep each row with its source's rate,
    decided by the deterministic md5 hash of (key, seed) — the same
    SQL-mirrorable recipe as ``sampling.hash_sample(method='md5')``, so
    the sample is reproducible and partition-independent. Sources absent
    from ``weights`` are dropped (rate 0)."""
    cuts = {s: np.int64(int(w * MD5_SPACE)) for s, w in weights.items()}

    def _f(batch: pa.Table) -> pa.Table:
        h = _md5_hash60(batch[key], seed)
        cut = (pd.Series(batch[source_col].to_pylist())
               .map(cuts).fillna(0).to_numpy(dtype=np.int64))
        return batch.filter(pa.array(h < cut))

    return ds.map_batches(_f, batch_format="pyarrow")


def inverted_index(ds: rd.Dataset, id_col: str = "doc_id",
                   text_col: str = "text", min_df: int = 1,
                   num_buckets: int = 0) -> rd.Dataset:
    """Build an inverted index → (term, df, postings: list<int64> sorted).
    Terms are the lowercased ``[a-z0-9]+`` word runs; postings hold each
    term's distinct doc ids."""

    num_buckets = resolve_num_buckets(num_buckets)
    def _pairs(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        t_out, d_out = [], []
        for i, t in zip(ids, batch[text_col].to_pylist()):
            for term in set(GRAM_WORD_RE.findall((t or "").lower())):
                t_out.append(term)
                d_out.append(i)
        return pa.table({"term": pa.array(t_out, pa.string()),
                         id_col: pa.array(d_out, pa.int64())})

    def _bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        batch["__bucket"] = _bucket_of_frame(batch, ["term"], num_buckets)
        return batch

    def _assemble(group: pd.DataFrame) -> pa.Table:
        dd = (group.drop(columns="__bucket").drop_duplicates()
              .sort_values(["term", id_col], kind="stable"))
        n = len(dd)
        if n == 0:
            return pa.table({"term": pa.array([], pa.string()),
                             "df": pa.array([], pa.int64()),
                             "postings": pa.array([], pa.list_(pa.int64()))})
        terms = dd["term"].to_numpy()
        change = np.zeros(n, dtype=bool)
        change[0] = True
        change[1:] = terms[1:] != terms[:-1]
        starts = np.flatnonzero(change)
        offsets = np.concatenate((starts, [n])).astype(np.int32)
        df = np.diff(offsets).astype(np.int64)
        keep = df >= min_df
        postings = pa.ListArray.from_arrays(
            pa.array(offsets),
            pa.array(dd[id_col].to_numpy(), pa.int64()))
        t = pa.table({"term": pa.array(terms[starts], pa.string()),
                      "df": pa.array(df, pa.int64()),
                      "postings": postings})
        return t.filter(pa.array(keep)) if not keep.all() else t

    pairs = ds.map_batches(_pairs, batch_format="pyarrow")
    return (pairs.map_batches(_bucketize, batch_format="pandas")
            .groupby("__bucket").map_groups(_assemble,
                                            batch_format="pandas"))


def key_skew_profile(ds: rd.Dataset, key: str,
                     num_buckets: int = 0) -> pd.DataFrame:
    """One-row skew diagnostic for a prospective partition/shuffle key →
    (n_rows, n_keys, max_cnt, top_share, cv). The pre-flight check every
    wide operation in this engine assumes (salted pair caps, bucketed
    combines): a key with top_share ≫ 1/n_keys or cv ≫ 1 needs salting
    before a groupby lands on it.

    Shape: per-key counts ride the usual bucketed combiner; the counts
    table then reduces to fixed-width moment partials (n, Σc, Σc², max)
    per block, so the driver sees O(#blocks) rows regardless of key
    cardinality. Counts are integer-valued and below 2^53, so float64
    sums are exact and block-order-independent — the SQL oracle mirrors
    the finish arithmetic expression-for-expression."""
    num_buckets = resolve_num_buckets(num_buckets)
    from .agg import preagg_groupby

    counts = preagg_groupby(ds.select_columns([key]), [key],
                            [("count", "", "__c")], num_buckets)

    def _partial(b: pd.DataFrame) -> pd.DataFrame:
        c = b["__c"].to_numpy(np.float64)
        return pd.DataFrame({
            "nk": [np.int64(len(c))],
            "total": [c.sum() if len(c) else 0.0],
            "sum2": [(c * c).sum() if len(c) else 0.0],
            "mx": [c.max() if len(c) else 0.0]})

    p = counts.map_batches(_partial, batch_format="pandas").to_pandas()
    nk = int(p["nk"].sum())
    total = float(p["total"].sum())
    sum2 = float(p["sum2"].sum())
    mx = float(p["mx"].max()) if len(p) else 0.0
    mean = total / nk
    cv = np.sqrt(sum2 / nk - mean * mean) / mean
    return pd.DataFrame({
        "n_rows": np.array([total], np.int64),
        "n_keys": np.array([nk], np.int64),
        "max_cnt": np.array([mx], np.int64),
        "top_share": [round_half_away(mx / total, 8)],
        "cv": [round_half_away(cv, 8)]})


def content_checksum(ds: rd.Dataset, key: str, seed: int = 0) -> rd.Dataset:
    """Order-independent corpus checksum → ONE row
    (n_rows, checksum): the exact integer sum of every row's 60-bit
    md5 draw (``sampling._md5_hash60`` recipe, so the SQL mirror is
    ``sum(CAST('0x' || substr(md5(v || ':seed'), 1, 15) AS BIGINT))``),
    carried as arbitrary-precision Python ints and emitted as a decimal
    string (the sum exceeds int64 past ~16 rows; SQL compares via
    HUGEINT → VARCHAR). Addition commutes, so the checksum is
    independent of partitioning and row order — the cheap equality
    certificate for export/re-import round-trips and cross-engine
    copies (same device as the per-partition manifests of
    ``resumable_partitioned_write``, but content-sensitive).

    Distributed shape: one streaming pass; each block reduces to a
    (count, partial-sum-as-string) row, the block-count-sized union
    folds in one tiny task. Nothing else moves."""
    from .sampling import _md5_hash60

    def _partial(batch: pa.Table) -> pa.Table:
        h = _md5_hash60(batch[key].combine_chunks(), seed)
        return pa.table({
            "__n": pa.array([len(h)], pa.int64()),
            "__s": pa.array([str(int(h.sum(dtype=object))
                                 if len(h) else 0)], pa.string())})

    partials = ds.select_columns([key]).map_batches(
        _partial, batch_format="pyarrow")

    def _finish(t: pa.Table) -> pa.Table:
        n = int(pa.compute.sum(t["__n"]).as_py() or 0)
        s = sum(int(x) for x in t["__s"].to_pylist())
        return pa.table({"n_rows": pa.array([n], pa.int64()),
                         "checksum": pa.array([str(s)], pa.string())})

    return partials.repartition(1).map_batches(
        _finish, batch_size=None, batch_format="pyarrow")


def mixture_plan(ds: rd.Dataset, source_col: str, alpha: float = 0.5,
                 round_to: int = 6, num_buckets: int = 0) -> rd.Dataset:
    """Temperature-rebalanced mixture plan → one row per source:
    (source, n_rows, share, target_share, rate). The planning step of
    multi-source pretraining mixtures: flatten the source distribution
    with temperature α (target_share ∝ n^α — α = 1 keeps natural
    proportions, α = 0 is uniform), then the per-source DOWNSAMPLING
    rate that realizes those shares without upsampling,
    rate_s = (target_share_s / share_s) / max_t(target_share_t /
    share_t) — the rarest-boosted source keeps rate 1.0. Feed the rates
    to ``mixture_sample``.

    Distributed shape: one per-source count combiner (rows never
    shuffle); the arithmetic finish runs over the source-count-sized
    table in one tiny task; the SQL oracle mirrors it
    expression-for-expression."""
    num_buckets = resolve_num_buckets(num_buckets)
    from .agg import preagg_groupby

    counts = preagg_groupby(ds.select_columns([source_col]),
                            [source_col], [("count", "", "n_rows")],
                            num_buckets)

    def _finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(source_col, kind="mergesort")
        n = df["n_rows"].to_numpy(np.float64)
        share = n / n.sum()
        w = np.power(n, alpha)
        tgt = w / w.sum()
        boost = tgt / share
        rate = boost / boost.max()
        return pd.DataFrame({
            source_col: df[source_col].to_numpy(),
            "n_rows": df["n_rows"].to_numpy(np.int64),
            "share": round_half_away(share, round_to),
            "target_share": round_half_away(tgt, round_to),
            "rate": round_half_away(rate, round_to)})

    return counts.repartition(1).map_batches(_finish, batch_size=None,
                                             batch_format="pandas")
