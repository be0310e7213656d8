"""Text-embedding actor stage (stages/embed.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from belb_ray.stages.embed import FakeTextEmbedModel, embed_texts


def test_fake_model_deterministic_and_batch_invariant():
    m1 = FakeTextEmbedModel(dim=16, seed=3)
    m2 = FakeTextEmbedModel(dim=16, seed=3)
    texts = ["the cat sat", "dog", "", "   ", "the cat sat on the mat",
             "unrelated words entirely"]
    a = m1.encode(texts)
    b = m2.encode(texts)
    assert a.dtype == np.float32 and a.shape == (6, 16)
    assert np.array_equal(a, b)
    # bit-identical per row under ANY batching (token-order accumulation)
    parts = np.vstack([m1.encode(texts[:2]), m1.encode(texts[2:5]),
                       m1.encode(texts[5:])])
    assert np.array_equal(a, parts)
    # empty/whitespace text → zero vector; others unit-norm
    assert np.all(a[2] == 0) and np.all(a[3] == 0)
    norms = np.linalg.norm(a[[0, 1, 4, 5]], axis=1)
    assert np.allclose(norms, 1.0, atol=1e-6)
    # different seed = different checkpoint
    assert not np.array_equal(a, FakeTextEmbedModel(dim=16, seed=4)
                              .encode(texts))


def test_embed_texts_actor_pool_matches_direct_encode():
    n = 300
    rng = np.random.default_rng(0)
    vocab = np.array([f"w{i}" for i in range(40)])
    texts = [" ".join(vocab[rng.integers(0, 40, rng.integers(3, 12))])
             for _ in range(n)]
    df = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                       "text": texts})
    out = (embed_texts(rd.from_pandas(df).repartition(5), dim=12, seed=7,
                       batch_size=64)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert len(out) == n and list(out.columns) == ["doc_id", "embedding"]
    got = np.vstack(out["embedding"].to_numpy())
    want = FakeTextEmbedModel(dim=12, seed=7).encode(texts)
    assert np.array_equal(got, want)


def test_rerank_pairs_matches_direct_cosine_and_is_batch_stable():
    from belb_ray.stages.embed import rerank_pairs

    n = 120
    rng = np.random.default_rng(4)
    vocab = np.array([f"w{i}" for i in range(30)])
    texts = [" ".join(vocab[rng.integers(0, 30, rng.integers(3, 10))])
             for _ in range(n)]
    q = "w1 w2 w3"
    df = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                       "query": [q] * n, "text": texts})
    out = (rerank_pairs(rd.from_pandas(df).repartition(4), dim=16, seed=3,
                        batch_size=32)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert list(out.columns) == ["doc_id", "query", "text", "rerank_score"]
    m = FakeTextEmbedModel(dim=16, seed=3)
    eq = m.encode([q] * n).astype(np.float64)
    ed = m.encode(texts).astype(np.float64)
    want = np.round((eq * ed).sum(axis=1), 6)
    assert np.array_equal(out["rerank_score"].to_numpy(), want)
    assert (np.abs(out["rerank_score"]) <= 1.0 + 1e-9).all()
    # identical text scores 1.0 against itself
    self_df = pd.DataFrame({"doc_id": [0], "query": [texts[0]],
                            "text": [texts[0]]})
    s = rerank_pairs(rd.from_pandas(self_df), dim=16,
                     seed=3).to_pandas()["rerank_score"].iloc[0]
    assert abs(s - 1.0) < 1e-6


def test_embed_output_schema_fixed_size_list():
    df = pd.DataFrame({"doc_id": np.arange(4, dtype=np.int64),
                       "text": ["a b", "c", "", "d e f"]})
    ds = embed_texts(rd.from_pandas(df), dim=6, seed=1, batch_size=2)
    tbl = pa.concat_tables(
        [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")])
    f = tbl.schema.field("embedding")
    assert pa.types.is_fixed_size_list(f.type) and f.type.list_size == 6
    assert f.type.value_type == pa.float32()
