"""Golden-record survivorship and cluster-quality metrics."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def test_golden_records_rules_and_ties():
    from belb_ray.stages.survivorship import golden_records

    df = pd.DataFrame({
        "cid": [1, 1, 1, 1, 2, 2],
        "name": ["bb", "aa", "aa", "cc", "zz", "z"],
        "alias": ["x", "yyy", "qqq", "a", "mm", "m"],
        "score": [1.5, 9.25, 3.0, 2.0, -1.0, -2.0],
        "seen": pd.to_datetime(["2024-01-02", "2024-03-01", "2024-02-01",
                                "2024-01-01", "2023-06-01", "2023-07-01"]),
    })
    out = golden_records(rd.from_pandas(df), "cid", {
        "name": "mode", "alias": "longest",
        "score": "max", "seen": "max",
    }, num_buckets=4).to_pandas().sort_values("cid").reset_index(drop=True)
    # cid 1: mode name = aa (2 votes); alias tie len 3 -> min('qqq','yyy')
    assert out.loc[0, "name"] == "aa"
    assert out.loc[0, "alias"] == "qqq"
    assert out.loc[0, "score"] == 9.25
    assert out.loc[0, "seen"] == pd.Timestamp("2024-03-01")
    # cid 2: mode tie count 1 -> min value; numeric max is NUMERIC
    assert out.loc[1, "name"] == "z"
    assert out.loc[1, "score"] == -1.0
    assert out.loc[1, "seen"] == pd.Timestamp("2023-07-01")


def test_golden_records_mode_tie_is_min_across_batches():
    from belb_ray.stages.survivorship import golden_records

    # split across blocks so partial counts must recombine before the
    # tie-break: 'b' wins 3-2 only if batch partials merge correctly
    d1 = pd.DataFrame({"cid": [7, 7, 7], "v": ["a", "b", "b"]})
    d2 = pd.DataFrame({"cid": [7, 7], "v": ["a", "b"]})
    ds = rd.from_pandas(d1).union(rd.from_pandas(d2))
    out = golden_records(ds, "cid", {"v": "mode"}).to_pandas()
    assert list(out.itertuples(index=False)) == [(7, "b")]


def test_cluster_quality_exact_small():
    from belb_ray.stages.ereval import cluster_quality

    # pred {a:(1,2,3)},{b:(4,5)}; gold {x:(1,2)},{y:(3,4,5)}
    df = pd.DataFrame({
        "pred": ["a", "a", "a", "b", "b"],
        "gold": ["x", "x", "y", "y", "y"],
    })
    out = cluster_quality(rd.from_pandas(df), "pred", "gold",
                          num_buckets=4).to_pandas()
    # cells: (a,x)=2 (a,y)=1 (b,y)=2 ; tp = 1+0+1 = 2
    # pred pairs = C(3,2)+C(2,2) = 4 ; gold pairs = C(2,2)+C(3,2) = 4
    assert out.loc[0, "n_rows"] == 5
    assert out.loc[0, "pair_precision"] == 0.5
    assert out.loc[0, "pair_recall"] == 0.5
    assert out.loc[0, "pair_f1"] == 0.5
    # bcubed P = (4/3+1/3+4/2)/5 = 11/15 ; R = (4/2+1/3+4/3)/5 = 11/15
    assert abs(out.loc[0, "bcubed_precision"] - 11 / 15) < 1e-12
    assert abs(out.loc[0, "bcubed_recall"] - 11 / 15) < 1e-12


def test_cluster_quality_perfect_prediction():
    from belb_ray.stages.ereval import cluster_quality

    df = pd.DataFrame({"pred": list("aabbb"), "gold": list("xxyyy")})
    out = cluster_quality(rd.from_pandas(df), "pred", "gold").to_pandas()
    for c in ("pair_precision", "pair_recall", "pair_f1",
              "bcubed_precision", "bcubed_recall", "bcubed_f1"):
        assert out.loc[0, c] == 1.0


def test_cross_doc_gram_stats_small():
    from belb_ray.stages.gramdedup import cross_doc_gram_stats

    # k=3: doc1 'a b c d' windows: abc bcd ; doc2 'b c d e' -> bcd cde ;
    # doc3 'x y' too short -> no row ; doc4 'a a a a' -> aaa aaa (self-dup)
    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["a b c d", "b c d e", "x y", "a a a a"],
    })
    out = (cross_doc_gram_stats(rd.from_pandas(df), "doc_id", "text",
                                k=3, num_buckets=4)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert list(out["doc_id"]) == [1, 2, 4]
    # bcd occurs twice (docs 1+2); aaa occurs twice (doc 4 self-repeat)
    assert list(out["dup_grams"]) == [1, 1, 2]
    assert list(out["total_grams"]) == [2, 2, 2]
    assert list(out["dup_frac"]) == [0.5, 0.5, 1.0]


def test_clustering_diff_known_case():
    """Hand-checked 6-row case: A = {1,2},{3,4},{5},{6};
    B = {1,2,3,4},{5},{6} — one pure merge, no splits; ARI by hand:
    pab=2, pa=2, pb=6, N=6 → (2−0.8)/(4−0.8) = 0.375."""
    import pandas as pd

    from belb_ray.stages.ereval import clustering_diff

    df = pd.DataFrame({
        "a": [10, 10, 20, 20, 30, 40],
        "b": [1, 1, 1, 1, 2, 3]})
    out = clustering_diff(rd.from_pandas(df), "a", "b").to_pandas()
    r = out.iloc[0]
    assert r.n_rows == 6
    assert r.n_clusters_a == 4 and r.n_clusters_b == 3
    assert r.split_clusters == 0 and r.merge_clusters == 1
    assert abs(r.ari - 0.375) < 1e-9


def test_clustering_diff_identical_and_inverse():
    import pandas as pd

    from belb_ray.stages.ereval import clustering_diff

    df = pd.DataFrame({"a": [1, 1, 2, 2], "b": [7, 7, 9, 9]})
    out = clustering_diff(rd.from_pandas(df), "a", "b").to_pandas()
    assert out.iloc[0].ari == 1.0
    assert out.iloc[0].split_clusters == 0
    assert out.iloc[0].merge_clusters == 0
