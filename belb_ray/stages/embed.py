"""Text-embedding actor stage: the model loads ONCE per actor in
``__init__``; batches stream through ``__call__``.

This is the GPU-shaped inference pattern of a training-data pipeline
(the text twin of ``stages/multimodal.ImageFeaturizer``): a callable
CLASS passed to ``map_batches(..., concurrency=N)`` so Ray builds an
actor pool and the checkpoint is deserialized per actor, never per
batch. Real embedding libraries are absent in this container, so the
"model" is a deterministic stand-in behind an import-try — the
Ray-side plumbing (actor signature, constructor kwargs, batch sizing,
fixed-size-list output schema) is real and oracled against a pinned
golden computed by the same model kernel single-process
(tools/make_goldens.py).

Extends the reference's load-once lookup-state pattern
(belb/kbs/kb.py converters — SURVEY §2.4 T6) to model inference.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd
from ..util import round_half_away

# pd.util.hash_array requires an EXACTLY-16-byte key
_EMBED_HASH_KEY = "belb_ray_embed16"


class FakeTextEmbedModel:
    """Deterministic stand-in for a sentence-transformer checkpoint:
    feature-hash whitespace tokens into ``vocab_dim`` buckets, project
    with a seeded Gaussian matrix, L2-normalize. Building the
    projection matrix IS the simulated weights load — it happens once
    per actor, in the constructor, exactly where a real
    ``SentenceTransformer(model_name)`` call would sit.

    Pure kernel: shared with the golden generator (the composition —
    batching, actor pool, schema — is what the Ray stage adds)."""

    def __init__(self, dim: int = 64, seed: int = 0,
                 vocab_dim: int = 4096):
        rng = np.random.default_rng(seed)
        self.proj = (rng.standard_normal((vocab_dim, dim))
                     .astype(np.float32) / np.float32(np.sqrt(dim)))
        self.vocab_dim = vocab_dim
        self.dim = dim

    def encode(self, texts: list) -> np.ndarray:
        """list[str] → (n, dim) float32, rows L2-normalized (zero vector
        for empty/whitespace-only text). ONE keyed-hash pass over every
        token of the batch, then a sequential scatter-add of projection
        rows: each output row accumulates in ITS OWN token order, so the
        result is bit-identical under any batching (a BLAS matmul's
        reduction order varies with batch shape and would drift the 6dp
        golden hashes)."""
        n = len(texts)
        emb = np.zeros((n, self.dim), dtype=np.float32)
        toks: list[str] = []
        rows: list[int] = []
        for i, t in enumerate(texts):
            w = (t or "").lower().split()
            toks.extend(w)
            rows.extend([i] * len(w))
        if toks:
            h = pd.util.hash_array(np.asarray(toks, dtype=object),
                                   hash_key=_EMBED_HASH_KEY,
                                   categorize=False)
            cols = (h % np.uint64(self.vocab_dim)).astype(np.int64)
            np.add.at(emb, np.asarray(rows, np.int64), self.proj[cols])
        norm = np.linalg.norm(emb, axis=1, keepdims=True)
        np.divide(emb, norm, out=emb, where=norm > 0)
        return emb


class TextEmbedder:
    """Actor-pool stage: (id, text) → (id, embedding fixed_size_list
    <float32>[dim]).

    A real model is attempted once per actor when ``model_name`` is
    given (sentence-transformers is not in this container); otherwise
    the deterministic fake keeps the pipeline runnable — and oracled —
    end to end in BOTH environments."""

    def __init__(self, dim: int = 64, seed: int = 0,
                 text_col: str = "text", id_col: str = "doc_id",
                 model_name: str | None = None):
        self.dim = dim
        self.text_col, self.id_col = text_col, id_col
        self.model = None
        if model_name is not None:
            try:  # real checkpoint if the lib exists
                from sentence_transformers import SentenceTransformer

                self.model = SentenceTransformer(model_name)
            except ImportError:
                pass
        if self.model is None:
            self.model = FakeTextEmbedModel(dim=dim, seed=seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        emb = np.ascontiguousarray(
            np.asarray(self.model.encode(texts), dtype=np.float32))
        return pa.table({
            self.id_col: batch[self.id_col],
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(emb.ravel(), pa.float32()), self.dim),
        })


class CrossEncoderReranker:
    """Actor-pool stage: (query, text) rows → + ``rerank_score``.

    The second GPU-shaped inference op (a retrieval pipeline's
    candidate rerank): a real cross-encoder checkpoint is attempted
    once per actor when ``model_name`` is given (sentence-transformers'
    ``CrossEncoder.predict(pairs)`` API — absent in this container);
    otherwise the deterministic stand-in scores a pair as the cosine of
    the two texts' ``FakeTextEmbedModel`` encodings, rounded to
    ``round_to`` — reusing the batch-invariant encode kernel, so the
    score is bit-stable under any batching/partitioning."""

    def __init__(self, dim: int = 32, seed: int = 0,
                 query_col: str = "query", text_col: str = "text",
                 out_col: str = "rerank_score", round_to: int = 6,
                 model_name: str | None = None):
        self.query_col, self.text_col = query_col, text_col
        self.out_col, self.round_to = out_col, round_to
        self.model = None
        if model_name is not None:
            try:  # real checkpoint if the lib exists
                from sentence_transformers import CrossEncoder

                self.model = CrossEncoder(model_name)
            except ImportError:
                pass
        self.fake = (FakeTextEmbedModel(dim=dim, seed=seed)
                     if self.model is None else None)

    def _scores(self, qs: list, ds_: list) -> np.ndarray:
        if self.model is not None:
            return np.asarray(self.model.predict(list(zip(qs, ds_))),
                              dtype=np.float64)
        eq = self.fake.encode(qs).astype(np.float64)
        ed = self.fake.encode(ds_).astype(np.float64)
        return (eq * ed).sum(axis=1)  # rows are already L2-normalized

    def __call__(self, batch: pa.Table) -> pa.Table:
        qs = batch[self.query_col].to_pylist()
        ds_ = batch[self.text_col].to_pylist()
        s = round_half_away(self._scores(qs, ds_), self.round_to)
        return batch.append_column(self.out_col,
                                   pa.array(s, pa.float64()))


def rerank_pairs(ds: rd.Dataset, dim: int = 32, seed: int = 0,
                 query_col: str = "query", text_col: str = "text",
                 out_col: str = "rerank_score", round_to: int = 6,
                 model_name: str | None = None, batch_size: int = 256,
                 concurrency=(1, 8)) -> rd.Dataset:
    """→ input + ``out_col``: streaming actor-pool cross-encoder
    scoring of (query, candidate-text) rows. Candidates come from a
    cheap first stage (BM25 / ANN top-k); only that k·|queries|-sized
    sliver ever reaches the model — the corpus itself never does."""
    return ds.map_batches(
        CrossEncoderReranker, batch_format="pyarrow",
        batch_size=batch_size,
        fn_constructor_kwargs=dict(dim=dim, seed=seed, query_col=query_col,
                                   text_col=text_col, out_col=out_col,
                                   round_to=round_to, model_name=model_name),
        concurrency=concurrency)


def embed_texts(ds: rd.Dataset, dim: int = 64, seed: int = 0,
                text_col: str = "text", id_col: str = "doc_id",
                model_name: str | None = None, batch_size: int = 256,
                concurrency=(1, 8)) -> rd.Dataset:
    """→ (id_col, embedding): streaming actor-pool inference. Size
    ``batch_size`` × ``concurrency`` to the worker heap (a real model's
    activations dominate, not the text); the corpus never materializes."""
    return ds.select_columns([id_col, text_col]).map_batches(
        TextEmbedder, batch_format="pyarrow", batch_size=batch_size,
        fn_constructor_kwargs=dict(dim=dim, seed=seed, text_col=text_col,
                                   id_col=id_col, model_name=model_name),
        concurrency=concurrency)
