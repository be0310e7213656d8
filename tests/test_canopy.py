"""Canopy clustering blocking (stages/canopy)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from belb_ray.stages.canopy import (canopy_blocks, greedy_centers,
                                    hashed_unit_vectors)


def test_greedy_centers_matches_sequential_reference():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((200, 16))
    x /= np.linalg.norm(x, axis=1)[:, None]
    ids = rng.permutation(200).astype(np.int64) * 7 + 1
    for t2 in (0.1, 0.3, 0.6):
        got = sorted(greedy_centers(ids, x, t2, chunk=37))
        # plain sequential reference
        order = np.argsort(ids, kind="stable")
        kept = []
        for i in order:
            if all(round(float(x[i] @ x[j]), 6) < t2 for j in kept):
                kept.append(int(i))
        assert got == sorted(kept)


def test_hashed_unit_vectors_normalized_and_deterministic():
    v1 = hashed_unit_vectors(["the quick fox", "", "jumps over"], 32)
    v2 = hashed_unit_vectors(["the quick fox", "", "jumps over"], 32)
    np.testing.assert_array_equal(v1, v2)
    norms = np.linalg.norm(v1, axis=1)
    assert abs(norms[0] - 1.0) < 1e-12 and norms[1] == 0.0


def test_canopy_blocks_invariants(ray_session):
    rng = np.random.default_rng(11)
    words = np.array(["alpha", "beta", "gamma", "delta", "epsilon",
                      "zeta", "eta", "theta"])
    texts = [" ".join(rng.choice(words, size=6)) for _ in range(120)]
    t = pa.table({"doc_id": pa.array(np.arange(1, 121), pa.int64()),
                  "text": texts})
    out = canopy_blocks(rd.from_arrow(t), "doc_id", "text",
                        t1_sim=0.3, t2_sim=0.7, dim=32).to_pandas()
    # coverage: every record in at least one canopy
    assert set(out.row_id) == set(range(1, 121))
    # canopy ids are real record ids, and every center belongs to its
    # own canopy with sim 1.0
    centers = set(out.canopy_id)
    assert centers <= set(range(1, 121))
    own = out[out.canopy_id == out.row_id]
    assert set(own.canopy_id) == centers
    assert (own.sim >= 0.999999).all()
    # centers are pairwise < t2-similar (the greedy invariant)
    txt_of = dict(zip(range(1, 121), texts))
    cx = hashed_unit_vectors([txt_of[c] for c in sorted(centers)], 32)
    s = np.round(cx @ cx.T, 6)
    np.fill_diagonal(s, 0)
    assert s.max() < 0.7
    # non-fallback memberships respect t1
    multi = out.groupby("row_id").size()
    for rid in multi[multi > 1].index[:20]:
        assert (out[out.row_id == rid].sim >= 0.3 - 1e-9).any()


def test_canopy_requires_loose_below_tight(ray_session):
    t = pa.table({"doc_id": pa.array([1], pa.int64()), "text": ["x"]})
    with pytest.raises(ValueError, match="t1_sim < t2_sim"):
        canopy_blocks(rd.from_arrow(t), t1_sim=0.9, t2_sim=0.5)


def test_canopy_center_budget_guard(ray_session):
    # orthogonal-ish docs → every record its own center → budget trips
    t = pa.table({"doc_id": pa.array(np.arange(1, 41), pa.int64()),
                  "text": [f"uniqueword{i}" for i in range(40)]})
    with pytest.raises(ValueError, match="exceed the driver budget"):
        canopy_blocks(rd.from_arrow(t), "doc_id", "text", t1_sim=0.1,
                      t2_sim=0.9, max_centers=5)
