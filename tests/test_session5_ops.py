"""Meta-blocking, rule-filter chain with QAQC accounting, and
leakage-safe splitting."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd


def test_meta_block_pairs_purge_weight_prune():
    from belb_ray.stages.blocking import meta_block_pairs

    # blocks: b1={1,2,3}, b2={1,2}, b3={2,3}, huge={1..9} (purged at 4)
    rows = ([("b1", r) for r in (1, 2, 3)]
            + [("b2", r) for r in (1, 2)]
            + [("b3", r) for r in (2, 3)]
            + [("huge", r) for r in range(1, 10)])
    ds = rd.from_pandas(pd.DataFrame(
        rows, columns=["block_key", "record_id"]))
    out = meta_block_pairs(ds, max_block_size=4).to_pandas()
    out = out.sort_values(["a", "b"]).reset_index(drop=True)
    # CBS weights: (1,2)=2, (2,3)=2, (1,3)=1; mean = 5/3 → keep w ≥ 2
    assert list(map(tuple, out[["a", "b", "w"]].to_numpy())) == [
        (1, 2, 2), (2, 3, 2)]


def test_meta_block_pairs_all_purged_is_empty():
    from belb_ray.stages.blocking import meta_block_pairs

    ds = rd.from_pandas(pd.DataFrame(
        {"block_key": ["b"] * 5, "record_id": range(5)}))
    assert meta_block_pairs(ds, max_block_size=2).count() == 0


def test_rule_filter_chain_precedence_and_stats():
    from belb_ray.pipelines.qaqc import new_stats, stats_snapshot
    from belb_ray.stages.curation import rule_filter_chain

    docs = rd.from_pandas(pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": [
            "tiny doc",                              # too_short
            " ".join(["verylongwordshere"] * 40),    # long_words
            " ".join(["dup"] * 20 + ["x%d" % i for i in range(20)]),
            " ".join(["w%d" % i for i in range(40)]),  # keep
        ],
    }))
    stats = new_stats()
    out = rule_filter_chain(docs, min_words=30, stats=stats).to_pandas()
    got = dict(zip(out.doc_id, out.reason))
    assert got == {1: "too_short", 2: "long_words",
                   3: "repetitive", 4: "keep"}
    snap = stats_snapshot(stats)
    drops = {k: v for k, v in snap.items() if "rule_filter_chain" in k}
    assert sum(drops.values()) == 3


def test_rule_filter_chain_short_beats_long_words():
    from belb_ray.stages.curation import rule_filter_chain

    # 5 long words: both too_short and long_words fire → too_short wins
    docs = rd.from_pandas(pd.DataFrame({
        "doc_id": [1], "text": [" ".join(["enormousword"] * 5)]}))
    out = rule_filter_chain(docs, min_words=30).to_pandas()
    assert out.reason.tolist() == ["too_short"]


def test_leakage_safe_split_dups_share_split():
    from belb_ray.stages.mlprep import leakage_safe_split

    texts = ["alpha beta", "gamma delta", "alpha beta", "epsilon",
             "gamma delta", "alpha beta"] + [f"uniq {i}" for i in range(50)]
    docs = rd.from_pandas(pd.DataFrame({
        "doc_id": range(len(texts)), "text": texts}))
    out = leakage_safe_split(docs, seed=3).to_pandas()
    assert len(out) == len(texts)
    by_text = pd.DataFrame({"text": texts,
                            "doc_id": range(len(texts))}).merge(
        out, on="doc_id")
    grouped = by_text.groupby("text")["split"].nunique()
    assert (grouped == 1).all()
    # reps are the min doc_id of each content group
    reps = by_text.groupby("text")["rep_id"].unique()
    assert all(len(r) == 1 for r in reps)
    assert by_text[by_text.text == "alpha beta"].rep_id.unique() == [0]
    # more than one split actually appears
    assert out["split"].nunique() >= 2


def test_dedup_passages_rewrite_first_wins():
    from belb_ray.stages.curation import dedup_passages_rewrite

    docs = rd.from_pandas(pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["a b c d e f g h i j",   # chunks [a..h], [i j]
                 "a b c d e f g h x y",   # first chunk loses to doc 0
                 "i j"],                   # whole doc loses
    }))
    out = dedup_passages_rewrite(docs, k=8).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    assert out.clean_text.tolist() == ["a b c d e f g h i j", "x y", ""]
    assert out.n_kept.tolist() == [2, 1, 0]
    assert out.n_dropped.tolist() == [0, 1, 1]
    # conservation: kept + dropped = total chunks per doc
    assert (out.n_kept + out.n_dropped).tolist() == [2, 2, 1]


def test_dedup_passages_within_doc_repeat():
    from belb_ray.stages.curation import dedup_passages_rewrite

    # same 2-word chunk repeated inside one doc: keep only the first
    docs = rd.from_pandas(pd.DataFrame({
        "doc_id": [7], "text": ["x y x y x y"]}))
    out = dedup_passages_rewrite(docs, k=2).to_pandas()
    assert out.clean_text.tolist() == ["x y"]
    assert out.n_kept.tolist() == [1] and out.n_dropped.tolist() == [2]


def test_monge_elkan_word_swap_and_edges():
    from belb_ray.functions.similarity import (jaro_winkler_batch,
                                               monge_elkan_batch)

    me = monge_elkan_batch(
        ["small ring", "red widget", "", "a b c"],
        ["ring small", "red gadget", "x", "a b c"])
    assert abs(me[0] - 1.0) < 1e-12       # word order irrelevant
    jw = jaro_winkler_batch(["widget"], ["gadget"])[0]
    assert abs(me[1] - (1.0 + jw) / 2) < 1e-12
    assert me[2] == 0.0                    # empty side scores 0
    assert abs(me[3] - 1.0) < 1e-12


def test_monge_elkan_asymmetric_mean():
    from belb_ray.functions.similarity import monge_elkan_batch

    # A ⊂ B: ME(A→B)=1 (every A token has an exact twin), ME(B→A)<1
    me = monge_elkan_batch(["ring"], ["ring small"])
    me_sym = monge_elkan_batch(["ring small"], ["ring"])
    assert 0.5 < me[0] < 1.0
    assert abs(me[0] - me_sym[0]) < 1e-12  # symmetric by construction


def test_salted_hash_join_matches_plain_join_under_skew():
    import numpy as np

    from belb_ray.stages.joins import hash_partition_join, salted_hash_join

    rng = np.random.RandomState(7)
    keys = np.where(rng.rand(5000) < 0.4, 5, rng.randint(0, 200, 5000))
    left = rd.from_pandas(pd.DataFrame(
        {"k": keys, "lv": np.arange(5000)})).repartition(8)
    right = rd.from_pandas(pd.DataFrame(
        {"k": np.arange(150), "rv": np.arange(150) * 10})).repartition(4)
    a = salted_hash_join(left, right, "k", n_salt=4, phi=0.01).to_pandas()
    b = hash_partition_join(left, right, "k").to_pandas()
    sa = a.sort_values(["k", "lv", "rv"]).reset_index(drop=True)[
        ["k", "lv", "rv"]]
    sb = b.sort_values(["k", "lv", "rv"]).reset_index(drop=True)[
        ["k", "lv", "rv"]]
    assert len(sa) > 0 and sa.equals(sb)


def test_salted_hash_join_non_first_key_uniform_schema():
    # key NOT the left table's first column: the hot and cold arms must
    # emit the SAME column order (Arrow-level consumers like
    # write_parquet break on heterogeneous union block schemas)
    import numpy as np
    import pyarrow as pa

    from belb_ray.stages.joins import hash_partition_join, salted_hash_join

    rng = np.random.RandomState(3)
    keys = np.where(rng.rand(3000) < 0.5, 7, rng.randint(0, 100, 3000))
    left = rd.from_pandas(pd.DataFrame(
        {"lv": np.arange(3000), "k": keys})).repartition(6)
    right = rd.from_pandas(pd.DataFrame(
        {"k": np.arange(100), "rv": np.arange(100) * 3}))
    ds = salted_hash_join(left, right, "k", n_salt=4, phi=0.01)
    tables = [pa.Table.from_pandas(b, preserve_index=False)
              for b in ds.iter_batches(batch_format="pandas")]
    orders = {tuple(t.column_names) for t in tables if t.num_rows}
    assert orders == {("k", "lv", "rv")}
    pa.concat_tables(tables)  # homogeneous schemas concat cleanly
    got = ds.to_pandas().sort_values(["k", "lv"]).reset_index(drop=True)
    want = (hash_partition_join(left, right, "k").to_pandas()
            .sort_values(["k", "lv"]).reset_index(drop=True))
    assert got[["k", "lv", "rv"]].equals(want[["k", "lv", "rv"]])


def test_salted_hash_join_no_hot_keys_falls_back():
    import numpy as np

    from belb_ray.stages.joins import salted_hash_join

    left = rd.from_pandas(pd.DataFrame(
        {"k": np.arange(1000) % 97, "lv": np.arange(1000)}))
    right = rd.from_pandas(pd.DataFrame(
        {"k": np.arange(97), "rv": np.arange(97)}))
    # uniform keys: nothing exceeds phi=0.5 -> plain path
    out = salted_hash_join(left, right, "k", phi=0.5).to_pandas()
    assert len(out) == 1000


def test_kmeans_lloyd_block_invariant_and_recovers_blobs():
    import numpy as np

    from belb_ray.stages.vector import kmeans_lloyd

    rng = np.random.RandomState(3)
    centers = rng.randn(4, 8) * 6
    X = np.vstack([centers[i] + rng.randn(50, 8) * 0.3 for i in range(4)])
    ds = rd.from_pandas(pd.DataFrame({
        "vec_id": np.arange(200),
        "embedding": [list(map(float, r)) for r in X]}))
    out1 = kmeans_lloyd(ds.repartition(1), k=4, n_iters=5).to_pandas() \
        .sort_values("vec_id")
    out8 = kmeans_lloyd(ds.repartition(8), k=4, n_iters=5).to_pandas() \
        .sort_values("vec_id")
    # exact integer centroid sums -> identical fit at any block count
    assert (out1.cluster.to_numpy() == out8.cluster.to_numpy()).all()
    # planted blobs: most points of a blob share a cluster
    truth = np.repeat(np.arange(4), 50)
    cl = out1.cluster.to_numpy()
    purity = sum(int(np.bincount(cl[truth == i], minlength=4).max())
                 for i in range(4)) / 200
    assert purity >= 0.75


def test_safe_apply_quarantines_and_conserves_rows():
    import pyarrow as pa_

    from belb_ray.pipelines.qaqc import new_stats, safe_apply, stats_snapshot

    def parse(row):
        if row["v"] % 3 == 0:
            raise ValueError("multiple of three")
        if row["v"] == 7:
            raise KeyError("seven")
        return {"double": row["v"] * 2}

    ds = rd.from_pandas(pd.DataFrame({"v": range(10)}))
    stats = new_stats()
    out = safe_apply(ds, parse, {"double": pa_.int64()},
                     stage="t", stats=stats).to_pandas().sort_values("v")
    assert len(out) == 10                       # conservation
    bad = out[~out.ok]
    assert sorted(bad.v.tolist()) == [0, 3, 6, 7, 9]
    assert bad[bad.v == 7].error.iloc[0].startswith("KeyError")
    assert out[out.ok].double.tolist() == [2, 4, 8, 10, 16]
    assert bad.double.isna().all()
    snap = stats_snapshot(stats)
    assert sum(v for k, v in snap.items() if k.startswith("t")) == 5


def test_build_corpus_conservation_and_gates():
    import pyarrow as pa_

    from belb_ray.pipelines.corpus_build import build_corpus
    from belb_ray.pipelines.qaqc import new_stats, stats_snapshot

    docs = rd.from_arrow(pa_.table({
        "doc_id": [1, 2],
        "text": ["alpha beta gamma", "delta epsilon zeta"],
    }))
    # doc1 'beta'@6 twice (dup), doc2 'epsilon'@6 once
    anns = rd.from_arrow(pa_.table({
        "doc_id": [1, 1, 2],
        "ann_id": [10, 11, 20],
        "start": [6, 6, 6],
        "end": [10, 10, 13],
        "text": ["beta", "beta", "epsilon"],
        "entity_type": ["gene", "gene", "chem"],
        "identifier_raw": ["X:1|X:2", "X:1|X:2", "X:3|Y:0"],
    }))
    kb = rd.from_arrow(pa_.table({
        "resolved_identifier": ["X:1", "X:102", "X:3"]}))
    history = pd.DataFrame({"old_identifier": ["X:2", "Y:0"],
                            "new_identifier": ["X:102", "-1"]})
    stats = new_stats()
    out = build_corpus(docs, anns, kb, history, stats=stats)
    man = out["manifest"]
    # 3 anns x 2 identifiers exploded = 6; Y:0 obsolete drops 1
    assert man["identifiers_in"] == 6
    assert man["dropped_obsolete"] == 1
    assert man["dropped_notinkb"] == 0  # X:1, X:102, X:3 all in KB
    res = out["annotations"].to_pandas().sort_values("doc_id")
    # doc1's two identical anns merged into ONE row w/ both (resolved) ids
    assert len(res) == 2
    r1 = res[res.doc_id == 1].iloc[0]
    assert sorted(r1.identifiers) == ["X:1", "X:102"] and r1.n_ids == 2
    r2 = res[res.doc_id == 2].iloc[0]
    assert list(r2.identifiers) == ["X:3"]
    # offsets invariant: surfaces equal their text slices
    assert out["offset_violations"].count() == 0
    snap = stats_snapshot(stats)
    assert any("obsolete" in k for k in snap)


def test_build_corpus_offset_violation_detected():
    import pyarrow as pa_

    from belb_ray.pipelines.corpus_build import build_corpus

    docs = rd.from_arrow(pa_.table({
        "doc_id": [1], "text": ["alpha beta gamma"]}))
    anns = rd.from_arrow(pa_.table({
        "doc_id": [1], "ann_id": [1], "start": [0], "end": [4],
        "text": ["beta"],  # wrong: text[0:4] == 'alph'
        "entity_type": ["gene"], "identifier_raw": ["X:1"]}))
    kb = rd.from_arrow(pa_.table({"resolved_identifier": ["X:1"]}))
    history = pd.DataFrame({"old_identifier": [], "new_identifier": []})
    out = build_corpus(docs, anns, kb, history)
    assert out["offset_violations"].count() == 1


def test_read_parquet_pruned_matches_post_filter(tmp_path):
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq_

    from belb_ray.sources.readers import read_parquet_pruned

    import pyarrow as pa_
    tbl = pa_.table({"k": list(range(1000)), "v": [i * 2 for i in range(1000)]})
    path = str(tmp_path / "t.parquet")
    pq_.write_table(tbl, path, row_group_size=100)
    got = read_parquet_pruned(path, columns=["k"],
                              predicate=pads.field("k") >= 950).to_pandas()
    assert sorted(got.k.tolist()) == list(range(950, 1000))
    assert list(got.columns) == ["k"]
