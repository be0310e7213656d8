"""Document text-analysis stages: token counts, quality features,
language-ID, fingerprints.

Generalizes the reference's corpus-statistics layer
(belb/scripts/stats.py:81-300 — SURVEY §2.6 A11) into per-document
training-data ops, as stateless/actor ``map_batches`` over Arrow batches.
The kernels live in ``functions/textstats.py`` and are mirrored by the
DuckDB oracle SQL in ``__ray_entry__.py`` (same stopword list, same
trigram profiles — the config contract).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..functions.textstats import (
    bpe_ish_token_count_batch,
    fingerprint64,
    lang_id,
    quality_features,
    token_count_batch,
)

from belb_ray.util import resolve_num_buckets
from ..util import round_half_away


def doc_token_counts(ds: rd.Dataset, id_col: str = "doc_id",
                     text_col: str = "text") -> rd.Dataset:
    """→ (doc_id, n_tokens, n_bpe_tokens). Vectorized pyarrow.compute
    regex-count kernels (the scalar spec twins live in
    ``functions/textstats.py``; parity pinned by ``test_functions``)."""

    def _f(batch: pa.Table) -> pa.Table:
        col = batch[text_col]
        return pa.table({
            id_col: batch[id_col],
            "n_tokens": pa.array(token_count_batch(col), pa.int64()),
            "n_bpe_tokens": pa.array(bpe_ish_token_count_batch(col), pa.int64()),
        })

    return ds.map_batches(_f, batch_format="pyarrow")


def doc_quality(ds: rd.Dataset, id_col: str = "doc_id",
                text_col: str = "text") -> rd.Dataset:
    """→ (doc_id, n_chars, n_words, stop_ratio). Quality-score components
    for filter thresholds (length / stopword-density heuristics).

    Scalar re/set kernel per row BY MEASUREMENT: a 9-pass
    pyarrow.compute form ran 0.57x this loop at 800-word docs
    (BASELINE.md "Ingest kernels") — Python's C-backed regex already
    dominates here."""

    def _f(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        feats = [quality_features(t) for t in texts]
        return pa.table({
            id_col: batch[id_col],
            "n_chars": pa.array([f[0] for f in feats], pa.int64()),
            "n_words": pa.array([f[1] for f in feats], pa.int64()),
            "stop_ratio": pa.array([f[3] for f in feats], pa.float64()),
        })

    return ds.map_batches(_f, batch_format="pyarrow")


def doc_lang_id(ds: rd.Dataset, id_col: str = "doc_id",
                text_col: str = "text") -> rd.Dataset:
    """→ (doc_id, lang_pred) via the character-trigram heuristic.

    Scalar str.count kernel per row BY MEASUREMENT: a 40-pass
    pyarrow.compute form ran 0.49x this loop at 800-word docs
    (BASELINE.md "Ingest kernels")."""

    def _f(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        return pa.table({
            id_col: batch[id_col],
            "lang_pred": pa.array([lang_id(t) for t in texts], pa.string()),
        })

    return ds.map_batches(_f, batch_format="pyarrow")


class Fingerprinter:
    """Stateful stage: rolling-hash document fingerprints. The token-hash
    cache amortizes the skewed vocabulary (SURVEY §2.4 T6 pattern) — held
    per worker process via ``_FP_CACHE`` on a task-pool map (actor-pool
    dispatch measured slower for ~100ms batches; stages/blocking.py)."""

    def __init__(self, k: int = 8, id_col: str = "doc_id", text_col: str = "text"):
        self.k = k
        self.cache: dict[str, int] = {}
        self.id_col, self.text_col = id_col, text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        fps = [fingerprint64(t, self.k, self.cache) for t in texts]
        return pa.table({
            self.id_col: batch[self.id_col],
            "fingerprint": pa.array(fps, pa.int64()),
        })


_FP_CACHE: dict[tuple, Fingerprinter] = {}


def doc_fingerprints(ds: rd.Dataset, k: int = 8, id_col: str = "doc_id",
                     text_col: str = "text") -> rd.Dataset:
    def _fn(batch: pa.Table) -> pa.Table:
        key = (k, id_col, text_col)
        fp = _FP_CACHE.get(key)
        if fp is None:
            fp = _FP_CACHE[key] = Fingerprinter(k=k, id_col=id_col,
                                                text_col=text_col)
        return fp(batch)

    return ds.map_batches(_fn, batch_format="pyarrow")


def grouped_entropy(ds: rd.Dataset, key: str, value_col: str,
                    out_col: str = "entropy",
                    num_buckets: int = 0) -> rd.Dataset:
    """Per-key Shannon entropy (nats) of the ``value_col`` distribution —
    the diversity score of a user's event mix / a source's doc types.
    Fully combiner-shaped: one (key, value) count aggregation, then the
    counts re-aggregate per key as Σc and Σc·ln c (fixed width), finished
    closed-form as ``H = ln n − Σc·ln c / n``. Input rows shuffle as
    count partials only; the SQL oracle mirrors the arithmetic."""
    num_buckets = resolve_num_buckets(num_buckets)
    from .agg import preagg_groupby

    counts = preagg_groupby(ds.select_columns([key, value_col]),
                            [key, value_col], [("count", "", "__c")],
                            num_buckets)

    def _terms(batch: pd.DataFrame) -> pd.DataFrame:
        c = batch["__c"].to_numpy(dtype=np.float64)
        return pd.DataFrame({key: batch[key], "__n": c,
                             "__clnc": c * np.log(c)})

    sums = preagg_groupby(
        counts.map_batches(_terms, batch_format="pandas"),
        [key], [("sum", "__n", "__n"), ("sum", "__clnc", "__clnc")],
        num_buckets)

    def _finish(batch: pd.DataFrame) -> pd.DataFrame:
        n = batch["__n"].to_numpy(dtype=np.float64)
        batch[out_col] = np.log(n) - batch["__clnc"] / n
        return batch.drop(columns=["__n", "__clnc"])

    return sums.map_batches(_finish, batch_format="pandas")


def readability_scores(ds: rd.Dataset, id_col: str = "doc_id",
                       text_col: str = "text") -> rd.Dataset:
    """Flesch-reading-ease-style score per document → (id_col, words,
    sentences, syllables, flesch). Pure streaming map_batches — no
    shuffle, pandas C-regex kernels.

    Proxies chosen for exact cross-engine parity (mirrored
    expression-for-expression in the SQL oracle): words = maximal
    [a-z0-9]+ runs of the lowercased text; sentences = max(1, count of
    [.!?]+ runs); syllables = count of [aeiouy]+ vowel groups. Documents
    with zero words are dropped (the score is undefined).
    flesch = 206.835 − 1.015·(words/sentences) − 84.6·(syllables/words),
    rounded to 4dp. The quality-scoring companion to doc_quality
    (Gopher/C4-style filters use reading-ease bands)."""

    def _f(batch: pd.DataFrame) -> pd.DataFrame:
        t = batch[text_col].astype(str).str.lower()
        words = t.str.count(r"[a-z0-9]+").to_numpy(np.int64)
        sents = np.maximum(
            1, t.str.count(r"[.!?]+").to_numpy(np.int64))
        syll = t.str.count(r"[aeiouy]+").to_numpy(np.int64)
        keep = words > 0
        w = words[keep].astype(np.float64)
        s = sents[keep].astype(np.float64)
        v = syll[keep].astype(np.float64)
        flesch = round_half_away(206.835 - 1.015 * (w / s) - 84.6 * (v / w), 4)
        return pd.DataFrame({id_col: batch[id_col].to_numpy()[keep],
                             "words": words[keep],
                             "sentences": sents[keep],
                             "syllables": syll[keep],
                             "flesch": flesch})

    return ds.select_columns([id_col, text_col]).map_batches(
        _f, batch_format="pandas")
