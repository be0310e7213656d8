"""ML data-prep ops (stages/mlprep.py): target encoding, dataset split,
quota sampling — vs independent local computations, with determinism /
partition-invariance checks."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from belb_ray.stages.mlprep import (
    dataset_split,
    quota_sample,
    target_encode,
)
from belb_ray.stages.sampling import MD5_SPACE, _md5_hash60


def test_target_encode_vs_local():
    rng = np.random.default_rng(3)
    df = pd.DataFrame({"cat": rng.choice(list("abcd"), 500),
                       "y": rng.normal(10, 2, 500).round(2)})
    ds = rd.from_pandas(df).repartition(6)
    out = (target_encode(ds, "cat", "y", smoothing=20.0)
           .to_pandas().set_index("cat").sort_index())
    units = np.round(df.y.to_numpy() * 100).astype(np.int64)
    prior = units.sum() / len(units)
    g = pd.DataFrame({"cat": df.cat, "u": units}).groupby("cat")["u"]
    exp = np.round((g.sum() + 20.0 * prior) / (g.size() + 20.0) / 100.0, 4)
    assert list(out.index) == list(exp.index)
    assert np.allclose(out.te, exp.to_numpy())
    assert list(out.n) == list(g.size())
    # smoothing pulls a tiny category toward the prior
    tiny = pd.concat([df, pd.DataFrame({"cat": ["z"], "y": [100.0]})])
    o2 = (target_encode(rd.from_pandas(tiny), "cat", "y", smoothing=20.0)
          .to_pandas().set_index("cat"))
    assert o2.loc["z", "te"] < 100.0 / 2  # dominated by the prior


def test_dataset_split_exact_and_partition_independent():
    ids = pa.table({"k": pa.array(range(1000), pa.int64())})
    out = (dataset_split(rd.from_arrow(ids).repartition(7), "k",
                         {"train": 0.8, "val": 0.1, "test": 0.1}, seed=3)
           .to_pandas().sort_values("k"))
    h = _md5_hash60(ids["k"], 3)
    c1, c2 = int(0.8 * MD5_SPACE), int(0.9 * MD5_SPACE)
    exp = np.where(h < c1, "train", np.where(h < c2, "val", "test"))
    assert list(out.split) == list(exp)
    # roughly the requested proportions
    frac = (out.split == "train").mean()
    assert 0.75 < frac < 0.85
    out2 = (dataset_split(rd.from_arrow(ids), "k",
                          {"train": 0.8, "val": 0.1, "test": 0.1}, seed=3)
            .to_pandas().sort_values("k"))
    assert list(out2.split) == list(out.split)


def test_quota_sample_caps_and_determinism():
    rows = pa.table({
        "id": pa.array(range(300), pa.int64()),
        "grp": pa.array([f"g{i % 7}" for i in range(300)], pa.string()),
    })
    # g6 has ~43 rows; add a tiny group with 2 rows (below the quota)
    small = pa.table({"id": pa.array([900, 901], pa.int64()),
                      "grp": pa.array(["tiny", "tiny"], pa.string())})
    ds = rd.from_arrow(pa.concat_tables([rows, small])).repartition(5)
    out = quota_sample(ds, "grp", 10, key="id", seed=1).to_pandas()
    sizes = out.groupby("grp").size()
    assert (sizes[sizes.index != "tiny"] == 10).all()
    assert sizes["tiny"] == 2  # groups under quota kept whole
    # deterministic under different partitioning
    out2 = quota_sample(rd.from_arrow(pa.concat_tables([rows, small])),
                        "grp", 10, key="id", seed=1).to_pandas()
    assert sorted(out2.id) == sorted(out.id)
    # matches the independent hash-rank rule
    h = _md5_hash60(pa.concat_tables([rows, small])["id"], 1)
    df = pd.DataFrame({"id": list(range(300)) + [900, 901],
                       "grp": [f"g{i % 7}" for i in range(300)]
                       + ["tiny", "tiny"], "h": h})
    keep = (df.sort_values(["grp", "h", "id"])
            .groupby("grp").head(10).id)
    assert sorted(out.id) == sorted(keep)


def test_impute_by_group_mean_and_allnull_group():
    from belb_ray.stages.analytic import impute_by_group

    df = pd.DataFrame({
        "k": ["a"] * 4 + ["b"] * 3 + ["c"] * 2,
        "v": [1.0, np.nan, 3.0, np.nan, 10.0, 20.0, np.nan,
              np.nan, np.nan],  # group c is all-null
    })
    for thresh in (2_000_000, 0):  # broadcast path and hash-join fallback
        out = (impute_by_group(rd.from_pandas(df).repartition(4), "k", "v",
                               broadcast_threshold=thresh)
               .to_pandas().sort_values(["k", "v"]).reset_index(drop=True))
        a = out[out.k == "a"]["v_imputed"]
        assert sorted(a) == [1.0, 2.0, 2.0, 3.0]
        b = out[out.k == "b"]["v_imputed"]
        assert sorted(b) == [10.0, 15.0, 20.0]
        c = out[out.k == "c"]["v_imputed"]
        assert c.isna().all()
