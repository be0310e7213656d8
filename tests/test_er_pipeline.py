"""End-to-end golden test of the ER pipeline on the deterministic fixture.

Asserts the north-rule gates (BASELINE.md "Driver-imposed targets"):
(a) per-row sha256(content) invariant preserved through the pipeline,
(b) pairwise F1 ≥ 0.99 on labeled pairs at matched blocking keys,
(c) exact cluster-id equality vs the gold transitive clusters,
(d) conservation counters (rows in == rows out).
"""

import pandas as pd
import pytest
import ray.data as rd

from belb_ray.pipelines.er import ERConfig, cluster_summary, resolve_files


@pytest.fixture(scope="module")
def er_result(fixture_tables):
    files = rd.from_arrow(fixture_tables["files"]).repartition(8)
    out = resolve_files(files, ERConfig(input_blocks=8, join_buckets=8))
    return {k: v.to_pandas() for k, v in out.items()
            if k in ("clusters", "members")}, fixture_tables


def _pairwise_f1(pred: dict, gold_pairs: pd.DataFrame):
    tp = fp = fn = 0
    for a, b, label in zip(gold_pairs["id_a"], gold_pairs["id_b"],
                           gold_pairs["label"]):
        same = pred.get(a) is not None and pred.get(a) == pred.get(b)
        if label == 1 and same:
            tp += 1
        elif label == 1:
            fn += 1
        elif same:
            fp += 1
    prec = tp / max(1, tp + fp)
    rec = tp / max(1, tp + fn)
    return 2 * prec * rec / max(1e-9, prec + rec), prec, rec


def test_row_conservation(er_result):
    out, fx = er_result
    assert len(out["clusters"]) == fx["files"].num_rows
    assert len(out["members"]) == fx["files"].num_rows


def test_pairwise_f1_at_least_099(er_result):
    out, fx = er_result
    pred = dict(zip(out["clusters"]["row_id"], out["clusters"]["cluster_id"]))
    f1, prec, rec = _pairwise_f1(pred, fx["gold_pairs"].to_pandas())
    assert f1 >= 0.99, f"F1={f1:.4f} (P={prec:.4f} R={rec:.4f})"


def test_exact_cluster_equality(er_result):
    out, fx = er_result
    gold = fx["gold_clusters"].to_pandas()
    merged = gold.merge(out["clusters"], on="row_id", suffixes=("_g", "_p"))
    assert (merged["cluster_id_g"] == merged["cluster_id_p"]).all()


def test_sha_invariant_preserved(fixture_tables):
    """ensure_identity_columns recomputes sha256 == fixture's stored sha."""
    from belb_ray.stages.dedup import ensure_identity_columns

    files = fixture_tables["files"]
    stripped = rd.from_arrow(files.drop_columns(["content_sha256", "row_id"]))
    out = ensure_identity_columns(stripped).to_pandas()
    orig = files.to_pandas()
    merged = orig.merge(out, on=["repo", "path", "commit"], suffixes=("_o", "_n"))
    assert (merged["content_sha256_o"] == merged["content_sha256_n"]).all()
    assert (merged["row_id_o"] == merged["row_id_n"]).all()


def test_cluster_summary_sizes(er_result):
    out, fx = er_result
    counters = dict(zip(fx["expected_counters"]["stat"].to_pylist(),
                        fx["expected_counters"]["value"].to_pylist()))
    sizes = (out["clusters"].groupby("cluster_id").size())
    assert sizes.sum() == counters["rows_in"]
    # vendored hot key: one cluster holds all its exact copies
    assert sizes.max() >= counters["rows_in"] * 0.04


def test_heavy_skew_vendored_hot_key():
    """30% of rows share ONE content (vendored-file analog): exact-dup
    pre-collapse must keep pair generation bounded and clustering exact."""
    import time

    import ray.data as rd

    from belb_ray.pipelines.er import ERConfig, resolve_files
    from belb_ray.sources.synthetic import make_fixture

    fx = make_fixture(n_files=2000, seed=13, vendored_frac=0.3)
    t0 = time.time()
    out = resolve_files(rd.from_arrow(fx["files"]), ERConfig(input_blocks=4))
    clusters = out["clusters"].to_pandas()
    elapsed = time.time() - t0
    assert elapsed < 120  # bounded despite the hot key
    pred = dict(zip(clusters.row_id, clusters.cluster_id))
    gold = fx["gold_clusters"].to_pandas()
    # the vendored family (largest cluster) must be one exact cluster
    sizes = gold.groupby("cluster_id").size()
    vend = sizes.idxmax()
    members = gold[gold.cluster_id == vend]["row_id"]
    assert len({pred[m] for m in members}) == 1


def test_no_cross_lang_merges():
    """Band keys are lang-salted: identical contents in different langs
    must NOT merge (the reference partitions by entity type)."""
    import pyarrow as pa
    import ray.data as rd

    from belb_ray.pipelines.er import ERConfig, resolve_files
    from belb_ray.stages.dedup import ensure_identity_columns

    content = "shared tokens here " * 30
    files = pa.table({
        "repo": pa.array(["r1", "r2"]),
        "path": pa.array(["a/x.py", "b/y.go"]),
        "commit": pa.array(["c1", "c2"]),
        "lang": pa.array(["py", "go"]),
        "content": pa.array([content, content + " tail"]),
    })
    ds = ensure_identity_columns(rd.from_arrow(files))
    out = resolve_files(ds, ERConfig(input_blocks=1, use_path_keys=False))
    clusters = out["clusters"].to_pandas()
    assert clusters["cluster_id"].nunique() == 2


def test_attach_scorer_fused_join_equals_broadcast():
    """The fused scorer (attach_features(scorer=...)) must be
    bit-identical across all three shapes: broadcast+fused, join+fused
    (post_fn inside the bucket tasks), and the unfused
    attach→score_pairs composition."""
    import pandas as pd

    from belb_ray.pipelines.er import ERConfig
    from belb_ray.sources.synthetic import make_fixture
    from belb_ray.stages.blocking import (compute_features,
                                          explode_band_keys,
                                          path_neighborhood_keys)
    from belb_ray.stages.dedup import ensure_identity_columns
    from belb_ray.stages.pairs import candidate_pairs
    from belb_ray.stages.scoring import (attach_features, score_pairs,
                                         score_table)

    cfg = ERConfig()
    fx = make_fixture(n_files=800, seed=23)
    files = ensure_identity_columns(rd.from_arrow(fx["files"]))
    feats = compute_features(files, num_perm=cfg.num_perm,
                             shingle_k=cfg.shingle_k, seed=cfg.seed)
    blocks = explode_band_keys(feats, bands=cfg.bands).union(
        path_neighborhood_keys(feats))
    pairs = candidate_pairs(blocks, max_block=cfg.max_block,
                            window=cfg.window).materialize()
    scorer = lambda t: score_table(t, cfg.threshold, cfg.w_jacc,
                                   cfg.w_jw, cfg.w_tok)

    def norm(ds):
        return (ds.to_pandas().sort_values(["id_a", "id_b"])
                .reset_index(drop=True))

    bc = norm(attach_features(pairs, feats, scorer=scorer))
    jn = norm(attach_features(pairs, feats, scorer=scorer,
                              broadcast_threshold=0))  # force join path
    un = norm(score_pairs(attach_features(pairs, feats),
                          threshold=cfg.threshold, w_jacc=cfg.w_jacc,
                          w_jw=cfg.w_jw, w_tok=cfg.w_tok))
    assert len(bc) > 0
    pd.testing.assert_frame_equal(bc, jn)
    pd.testing.assert_frame_equal(bc, un)
