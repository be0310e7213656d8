"""Progressive verification curve (pipelines/docdedup)."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from belb_ray.pipelines.docdedup import progressive_verify_curve


def _docs():
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    near = base.replace("delta", "delt4")
    far = "one two three four five six seven eight nine ten"
    return pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "text": [base, base, near, far, far + " eleven"],
    })


def test_progressive_curve_monotone_and_exact_dup_collapse(ray_session):
    out = progressive_verify_curve(
        rd.from_arrow(_docs()), thresholds=(0.1, 0.5, 0.9),
        true_jaccard=0.5).to_pandas().sort_values("threshold")
    # prefix sizes and captured-true counts shrink as t rises
    assert (np.diff(out.n_pairs) <= 0).all()
    assert (np.diff(out.n_true) <= 0).all()
    assert (np.diff(out.pair_recall) <= 0).all()
    # docs 1/2 are identical → collapsed: the only high-sim candidate
    # left is (1, 3), so at t=0.1 the prefix is small and fully true
    row = out[out.threshold == 0.1].iloc[0]
    assert 1 <= row.n_pairs <= 3
    assert row.pair_recall == 1.0
    assert 0.0 <= row.pair_precision <= 1.0


def test_progressive_curve_empty_candidates(ray_session):
    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": ["aa bb cc dd ee", "vv ww xx yy zz"]})
    out = progressive_verify_curve(
        rd.from_arrow(t), thresholds=(0.5,)).to_pandas()
    # disjoint vocabularies: no true matches, zero recall either way
    # (covers the zero-candidate partial path)
    assert out.n_true.sum() == 0
    assert (out.pair_recall == 0.0).all()
