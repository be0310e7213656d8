"""Waterfall matching, id crosswalk, calibration curve, cannot-link
audit."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd


def test_waterfall_match_levels_and_min_rep():
    from belb_ray.stages.mdm import waterfall_match

    left = pd.DataFrame({
        "lid": [1, 2, 3, 4],
        "k1": [10, 10, 20, 30],
        "k2": ["a", "zz", "a", "a"],
    })
    right = pd.DataFrame({
        "rid": [100, 101, 102, 103],
        "r1": [10, 10, 10, 20],
        "r2": ["a", "a", "b", "c"],
    })
    out = waterfall_match(
        rd.from_pandas(left), rd.from_pandas(right),
        levels=[(["k1", "k2"], ["r1", "r2"]), (["k1"], ["r1"])],
        right_id="rid",
    ).to_pandas().sort_values("lid").reset_index(drop=True)
    # lid 1: level 1 on (10,'a') -> min(100,101) = 100
    assert out.loc[0, "match_id"] == 100 and out.loc[0, "match_level"] == 1
    # lid 2: no (10,'zz') -> level 2 on k1=10 -> min rid overall = 100
    assert out.loc[1, "match_id"] == 100 and out.loc[1, "match_level"] == 2
    # lid 3: no (20,'a') -> level 2 on k1=20 -> 103
    assert out.loc[2, "match_id"] == 103 and out.loc[2, "match_level"] == 2
    # lid 4: k1=30 matches nothing at any level -> nulls
    assert pd.isna(out.loc[3, "match_id"]) and pd.isna(out.loc[3, "match_level"])


def test_waterfall_match_budget_guard():
    from belb_ray.stages.mdm import waterfall_match

    left = pd.DataFrame({"lid": [1], "k": [1]})
    right = pd.DataFrame({"rid": range(10), "r": range(10)})
    with pytest.raises(ValueError, match="broadcast budget"):
        waterfall_match(rd.from_pandas(left), rd.from_pandas(right),
                        levels=[(["k"], ["r"])], right_id="rid",
                        max_broadcast_rows=3)


def test_id_crosswalk_ambiguity_and_dedup():
    from belb_ray.stages.mdm import id_crosswalk

    # a=1 -> b{10,11} -> c{5,7}; a=2 -> b{10} -> c{5} (two routes to the
    # same c via duplicate rows must collapse); a=3 -> b{12} (no bridge)
    a2b = pd.DataFrame({"a": [1, 1, 2, 2, 3], "b": [10, 11, 10, 10, 12]})
    b2c = pd.DataFrame({"b": [10, 11, 11], "c": [5, 7, 7]})
    out = id_crosswalk(rd.from_pandas(a2b), rd.from_pandas(b2c),
                       "a", "b", "c", num_buckets=4).to_pandas()
    out = out.sort_values("a").reset_index(drop=True)
    assert list(out["a"]) == [1, 2]
    assert list(out["n_targets"]) == [2, 1]
    assert list(out["rep"]) == [5, 5]
    assert list(out["ambiguous"]) == [True, False]


def test_calibration_curve_exact_small():
    from belb_ray.stages.ereval import calibration_curve

    # two bins: [0,0.5) conf 0.25 rate 0.5 (n=2); [0.5,1) conf 0.75
    # rate 0.0 (n=2) -> ece = 0.5*0.25 + 0.5*0.75 = 0.5
    df = pd.DataFrame({"s": [0.2, 0.3, 0.7, 0.8],
                       "y": [1, 0, 0, 0]})
    out = calibration_curve(rd.from_pandas(df), "s", "y", n_bins=2,
                            num_buckets=4).to_pandas()
    assert list(out["bin"]) == [0, 1]
    assert list(out["n"]) == [2, 2]
    assert np.allclose(out["mean_score"], [0.25, 0.75])
    assert np.allclose(out["event_rate"], [0.5, 0.0])
    assert np.allclose(out["ece"], [0.5, 0.5])


def test_source_accuracy_majority_and_rates():
    from belb_ray.stages.mdm import source_accuracy

    # cluster 1 majority 'en' (2-1); cluster 2 majority tie 'de'/'fr'
    # -> min value 'de'
    df = pd.DataFrame({
        "cl": [1, 1, 1, 2, 2],
        "attr": ["en", "en", "fr", "de", "fr"],
        "src": ["A", "B", "B", "A", "B"],
    })
    out = source_accuracy(rd.from_pandas(df), "cl", "attr", "src",
                          num_buckets=4).to_pandas()
    out = out.sort_values("src").reset_index(drop=True)
    # A: rows (1,en ok), (2,de ok) -> 2/2; B: (1,en ok), (1,fr no),
    # (2,fr no) -> 1/3
    assert list(out["src"]) == ["A", "B"]
    assert list(out["n_rows"]) == [2, 3]
    assert list(out["n_agree"]) == [2, 1]
    assert np.allclose(out["accuracy"], [1.0, 1 / 3])


def test_cannot_link_audit_counts_same_cluster_pairs():
    from belb_ray.stages.ereval import cannot_link_audit

    clusters = pd.DataFrame({"id": [1, 2, 3, 4, 5],
                             "cl": [7, 7, 7, 8, 8]})
    pairs = pd.DataFrame({"id_a": [1, 1, 4, 2],
                          "id_b": [2, 4, 5, 3]})
    out = cannot_link_audit(rd.from_pandas(clusters),
                            rd.from_pandas(pairs), "id", "cl",
                            num_buckets=4).to_pandas()
    out = out.sort_values("cl").reset_index(drop=True)
    # violations: (1,2) and (2,3) in cluster 7; (4,5) in cluster 8;
    # (1,4) crosses clusters -> not counted
    assert list(out["cl"]) == [7, 8]
    assert list(out["violations"]) == [2, 1]
