"""Operator-level tests over tiny Arrow tables (Ray session from conftest)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from belb_ray.stages.agg import count_distinct, dense_ids, preagg_groupby, topk
from belb_ray.stages.cluster import assign_clusters, connected_components
from belb_ray.stages.dedup import ensure_identity_columns, exact_dedup_reps
from belb_ray.stages.history import apply_id_mapping, resolve_identifiers, squash_history
from belb_ray.stages.homonyms import identifier_homonyms, kb_dedup, name_homonyms, synsets
from belb_ray.stages.joins import broadcast_join, broadcast_semi_join, hash_partition_join
from belb_ray.stages.pairs import candidate_pairs


def test_broadcast_join():
    left = rd.from_items([{"k": i % 3, "v": i} for i in range(9)])
    right = pa.table({"k": [0, 1], "name": ["zero", "one"]})
    out = broadcast_join(left, right, "k").to_pandas()
    assert len(out) == 6 and set(out["name"]) == {"zero", "one"}


def test_broadcast_semi_and_anti_join():
    ds = rd.from_items([{"k": i} for i in range(10)])
    semi = broadcast_semi_join(ds, [2, 3], "k").to_pandas()
    anti = broadcast_semi_join(ds, [2, 3], "k", anti=True).to_pandas()
    assert sorted(semi["k"]) == [2, 3] and len(anti) == 8


def test_hash_partition_join_inner_and_left():
    left = rd.from_arrow(pa.table({"k": [1, 2, 3, 4], "a": ["w", "x", "y", "z"]}))
    right = rd.from_arrow(pa.table({"k": [2, 3, 5], "b": [20, 30, 50]}))
    inner = hash_partition_join(left, right, "k", num_buckets=4).to_pandas()
    assert sorted(inner["k"]) == [2, 3]
    louter = hash_partition_join(left, right, "k", num_buckets=4,
                                 join_type="left outer").to_pandas()
    assert len(louter) == 4 and louter.set_index("k")["b"].isna().sum() == 2


def test_preagg_groupby_matches_pandas():
    df = pd.DataFrame({"g": np.repeat(["a", "b"], 50),
                       "x": np.arange(100, dtype=float)})
    ds = rd.from_pandas(df).repartition(5)
    out = preagg_groupby(ds, ["g"], [("sum", "x", "sx"), ("count", "x", "n"),
                                     ("mean", "x", "mx"), ("min", "x", "mn"),
                                     ("max", "x", "mxx")]).to_pandas()
    exp = df.groupby("g")["x"].agg(["sum", "count", "mean", "min", "max"])
    out = out.set_index("g").sort_index()
    assert np.allclose(out["sx"], exp["sum"]) and (out["n"] == exp["count"]).all()
    assert np.allclose(out["mx"], exp["mean"])


def test_count_distinct():
    df = pd.DataFrame({"g": ["a"] * 4 + ["b"] * 2, "v": [1, 1, 2, 3, 9, 9]})
    out = count_distinct(rd.from_pandas(df), ["g"], "v", "nd").to_pandas()
    assert dict(zip(out["g"], out["nd"])) == {"a": 3, "b": 1}


def test_count_distinct_rows_matches_pandas_and_spreads_buckets():
    from belb_ray.stages.agg import count_distinct_rows

    rng = np.random.default_rng(11)
    df = pd.DataFrame({"a": rng.integers(0, 40, 500),
                       "b": rng.integers(0, 40, 500)})
    want = len(df.drop_duplicates())
    # num_buckets > 1 so a constant-bucket regression (everything on one
    # task) would still pass valuewise — assert the count over a forced
    # multi-bucket layout instead
    got = count_distinct_rows(rd.from_pandas(df).repartition(7),
                              ["a", "b"], num_buckets=8)
    assert got == want
    assert count_distinct_rows(
        rd.from_pandas(df.head(0)), ["a", "b"]) == 0


def test_dense_ids_sorted_rank():
    ds = rd.from_items([{"lang": l} for l in ["py", "js", "py", "go"]])
    out = dense_ids(ds, "lang")
    assert list(out["lang"]) == ["go", "js", "py"]
    assert list(out["internal_identifier"]) == [0, 1, 2]


def test_topk():
    ds = rd.from_items([{"v": i, "id": 100 - i} for i in range(50)])
    out = topk(ds, "v", 3, descending=True, tiebreak="id").to_pandas()
    assert sorted(out["v"].tolist(), reverse=True) == [49, 48, 47]


def test_exact_dedup_reps_min_id():
    t = pa.table({"content_sha256": ["h1", "h1", "h2"], "row_id": [5, 3, 9]})
    out = exact_dedup_reps(rd.from_arrow(t)).to_pandas()
    assert dict(zip(out["content_sha256"], out["rep_id"])) == {"h1": 3, "h2": 9}


def test_ensure_identity_columns_invariant():
    t = pa.table({"repo": ["r"], "path": ["p"], "commit": ["c"],
                  "lang": ["py"], "content": ["abc"]})
    out = ensure_identity_columns(rd.from_arrow(t)).to_pandas()
    assert out["content_sha256"][0] == (
        "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad")


def test_connected_components_transitive_chain():
    # A-B, B-C (no direct A-C) + isolated pair D-E; labels must be min id
    edges = rd.from_arrow(pa.table({"id_a": [10, 20, 40], "id_b": [20, 30, 50]}))
    labels = connected_components(edges).to_pandas()
    got = dict(zip(labels["node"], labels["label"]))
    assert got == {10: 10, 20: 10, 30: 10, 40: 40, 50: 40}


def test_assign_clusters_fills_singletons():
    members = rd.from_arrow(pa.table({"row_id": [1, 2, 3], "rep_id": [1, 1, 3]}))
    labels = rd.from_arrow(pa.table({"node": [1], "label": [1]}))
    out = assign_clusters(members, labels).to_pandas()
    assert dict(zip(out["row_id"], out["cluster_id"])) == {1: 1, 2: 1, 3: 3}


def test_candidate_pairs_all_and_windowed():
    rows = [{"block_key": 1, "row_id": i} for i in range(4)]
    rows += [{"block_key": 2, "row_id": 100 + i} for i in range(200)]
    pairs = candidate_pairs(rd.from_items(rows), max_block=64, window=3).to_pandas()
    small = pairs[pairs["id_a"] < 100]
    assert len(small) == 6  # C(4,2)
    big = pairs[pairs["id_a"] >= 100]
    assert len(big) == 200 * 3 - 6  # windowed cap
    assert (pairs["id_a"] < pairs["id_b"]).all()


def test_history_squash_and_resolve():
    hist = pd.DataFrame({"old_identifier": ["1", "2", "5"],
                         "new_identifier": ["2", "3", "-1"]})
    m = squash_history(hist)
    assert m["1"] == "3" and m["2"] == "3" and m["5"] == "-1"
    ds = rd.from_items([{"identifier": "1"}, {"identifier": "7"},
                        {"identifier": "5"}])
    out = resolve_identifiers(ds, hist).to_pandas().sort_values("identifier")
    got = dict(zip(out["identifier"], zip(out["resolved_identifier"], out["id_status"])))
    assert got == {"1": ("3", "replaced"), "7": ("7", "kept"), "5": ("-1", "obsolete")}


def test_apply_id_mapping_many_to_one():
    mapping = pd.DataFrame({"original_identifier": ["EXT:1", "ALT:1"],
                            "internal_identifier": [7, 7]})
    ds = rd.from_items([{"oid": "EXT:1"}, {"oid": "ALT:1"}, {"oid": "nope"}])
    out = apply_id_mapping(ds, mapping, "oid").to_pandas()
    assert sorted(out["internal_identifier"]) == [-1, 7, 7]


def _syn_table():
    return rd.from_arrow(pa.table({
        "uid": [0, 1, 2, 3, 4, 5],
        "identifier": [1, 1, 1, 2, 2, 3],
        "name": ["alpha", "beta", "alpha", "beta", "alpha", "gamma"],
        "description": [0, 1, 2, 0, 1, 0],
        "foreign_identifier": [0, 0, 0, 0, 0, 1],
    }))


def test_kb_dedup_symbol_wins():
    out = kb_dedup(_syn_table()).to_pandas()
    row = out[(out["identifier"] == 1) & (out["name"] == "alpha")]
    assert len(row) == 1 and row["description"].iloc[0] == 0


def test_synsets_sorted_names():
    out = synsets(_syn_table()).to_pandas().set_index("identifier")
    assert out.loc[1, "names"] == "alpha;beta" and out.loc[1, "n_names"] == 2


def test_name_homonyms():
    out = name_homonyms(_syn_table()).to_pandas()
    assert set(out["name"]) == {"alpha", "beta"}


def test_identifier_homonyms_merges_same_namelist():
    out = identifier_homonyms(_syn_table()).to_pandas()
    # identifiers 1 and 2 share the ordered name list alpha;beta → 2 → 1
    assert dict(zip(out["homonym"], out["identifier"])) == {2: 1}


def test_foreign_name_homonyms_two_predicates():
    from belb_ray.stages.homonyms import foreign_name_homonyms

    syn = rd.from_arrow(pa.table({
        "uid": list(range(6)),
        # "x": 2 ids, 2 fks → kept; "y": 2 ids, 1 fk → dropped;
        # "z": 1 id, 2 fks → dropped
        "identifier": [1, 2, 3, 4, 5, 5],
        "name": ["x", "x", "y", "y", "z", "z"],
        "description": [0] * 6,
        "foreign_identifier": [10, 11, 12, 12, 13, 14],
    }))
    out = foreign_name_homonyms(syn).to_pandas()
    assert out["name"].tolist() == ["x"]
    assert out["n_identifiers"].iloc[0] == 2 and out["n_foreign"].iloc[0] == 2


def test_merge_span_identifiers_list_column():
    from belb_ray.stages.spans import merge_span_identifiers

    anns = rd.from_arrow(pa.table({
        "doc_id": [1, 1, 1, 2],
        "start": [0, 0, 5, 0],
        "end": [3, 3, 9, 3],
        "text": ["ab", "ab", "cd", "ab"],
        "entity_type": ["E", "E", "E", "E"],
        "identifier": ["B", "A", "A", "A"],
    }))
    tbl = merge_span_identifiers(anns).to_pandas()
    row = tbl[(tbl.doc_id == 1) & (tbl.start == 0)]
    # true list column, sorted distinct
    assert list(row["identifiers"].iloc[0]) == ["A", "B"]
    assert row["n_ids"].iloc[0] == 2
    assert len(tbl) == 3


def test_suppress_overlapping_drops_overlap_nest_equal_sametext():
    from belb_ray.stages.spans import suppress_overlapping

    gold = rd.from_arrow(pa.table({
        "doc_id": [1, 2], "ann_id": [100, 200],
        "start": [10, 10], "end": [20, 20],
        "text": ["gold", "gold"],
    }))
    foreign = rd.from_arrow(pa.table({
        "doc_id": [1, 1, 1, 1, 1, 2, 3],
        "ann_id": [1, 2, 3, 4, 5, 6, 7],
        "start": [15, 12, 10, 30, 40, 50, 10],
        "end":   [25, 14, 20, 35, 45, 55, 20],
        #          ^overlap ^nested ^equal  ok  same-text  ok   no-gold-doc
        "text": ["a", "b", "c", "d", "gold", "e", "f"],
    }))
    out = suppress_overlapping(gold, foreign).to_pandas()
    assert sorted(out["ann_id"]) == [4, 6, 7]


def test_evaluation_subsets_broadcast_and_shuffle_agree():
    from belb_ray.stages.subsets import evaluation_subsets

    anns = rd.from_arrow(pa.table({
        "mention_id": list(range(8)),
        "split": ["train", "train", "train", "test", "test", "test", "dev",
                  "test"],
        "identifier": [1, 1, 2, 1, 2, 9, 3, 3],
        "surface": ["a", "b", "c", "a", "zz", "q", "d", "d"],
    }))
    # id 1/"a" seen; id 2 with new surface → stratified; id 9 → zeroshot;
    # id 3/"d" seen via dev
    expected = {3: "seen", 4: "stratified", 5: "zeroshot", 7: "seen"}
    bc = evaluation_subsets(anns).to_pandas()
    assert dict(zip(bc["mention_id"], bc["subset"])) == expected
    sh = evaluation_subsets(anns, broadcast_threshold=0).to_pandas()
    assert dict(zip(sh["mention_id"], sh["subset"])) == expected


def test_semi_join_broadcast_and_shuffle_agree():
    from belb_ray.stages.joins import semi_join

    left = rd.from_arrow(pa.table({"k": [1, 2, 3, 4, 5, 6],
                                   "v": list("abcdef")}))
    right = rd.from_arrow(pa.table({"k": [2, 4, 4, 9]}))
    for anti in (False, True):
        bc = semi_join(left, right, "k", anti=anti).to_pandas()
        sh = semi_join(left, right, "k", anti=anti,
                       broadcast_threshold=0).to_pandas()
        exp = {"b", "d"} if not anti else {"a", "c", "e", "f"}
        assert set(bc["v"]) == exp
        assert set(sh["v"]) == exp


def test_distinct_values_budget_guard():
    import pytest as _pytest

    from belb_ray.stages.joins import distinct_values

    ds = rd.from_arrow(pa.table({"k": list(range(100))}))
    with _pytest.raises(ValueError):
        distinct_values(ds, "k", max_size=10)


def test_attach_features_broadcast_and_join_paths_agree():
    from belb_ray.functions.minhash import MinHasher, sig_array
    from belb_ray.stages.scoring import attach_features, score_pairs

    hasher = MinHasher(num_perm=16, seed=5)
    rng = np.random.default_rng(2)
    sigs = rng.integers(0, 1 << 62, (6, 16), dtype=np.uint64)
    sigs[1] = sigs[0]  # identical pair → jacc 1
    feats = rd.from_arrow(pa.table({
        "row_id": pa.array([10, 11, 12, 13, 14, 15], pa.int64()),
        "sig": sig_array(sigs),
        "path": pa.array([f"p/{i}.py" for i in range(6)], pa.string()),
    }))
    pairs = rd.from_arrow(pa.table({
        "id_a": pa.array([10, 12], pa.int64()),
        "id_b": pa.array([11, 13], pa.int64()),
    }))

    def _score(pf):
        return score_pairs(pf, threshold=0.2, w_jacc=0.8, w_jw=0.1,
                           w_tok=0.1).to_pandas()

    bc = _score(attach_features(pairs, feats))
    jn = _score(attach_features(pairs, feats, broadcast_threshold=0))
    key = lambda df: sorted(zip(df.id_a, df.id_b, df.score.round(12)))
    assert key(bc) == key(jn) and len(bc) >= 1

    # pure-content form: no path columns anywhere, same jacc-driven edges
    bc_np = attach_features(pairs, feats, need_paths=False)
    assert "path_a" not in bc_np.schema().names
    out_np = score_pairs(bc_np, threshold=0.2, w_jacc=1.0, w_jw=0.0,
                         w_tok=0.0).to_pandas()
    jn_np = score_pairs(attach_features(pairs, feats, broadcast_threshold=0,
                                        need_paths=False),
                        threshold=0.2, w_jacc=1.0, w_jw=0.0,
                        w_tok=0.0).to_pandas()
    assert key(out_np) == key(jn_np)


def test_exact_dedup_sharded_map_equals_broadcast():
    """The distributed (sorted-shard) rep-map attach must be
    bit-identical to the driver-built broadcast attach."""
    from belb_ray.stages.dedup import exact_dedup_annotate

    rng = np.random.default_rng(9)
    n = 5000
    df = pd.DataFrame({
        "row_id": rng.permutation(n * 3)[:n].astype(np.int64),
        "content_sha256": [f"sha{int(x):04d}"
                          for x in rng.integers(0, 800, n)]})
    ds = rd.from_pandas(df).repartition(9)
    a = exact_dedup_annotate(ds).to_pandas()
    b = exact_dedup_annotate(ds, broadcast_rows=0).to_pandas()
    key = ["row_id"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    grp = a.groupby("content_sha256")["rep_id"].nunique()
    assert (grp == 1).all()
