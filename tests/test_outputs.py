"""Partitioned output writer: shards + manifests + skip-on-rerun."""

import json

import ray.data as rd


def test_write_er_outputs_and_resume(tmp_path):
    from belb_ray.pipelines.er import ERConfig, resolve_files
    from belb_ray.pipelines.outputs import write_er_outputs
    from belb_ray.sources.synthetic import make_fixture

    fx = make_fixture(n_files=300, seed=5)
    cfg = ERConfig(input_blocks=4)
    res = resolve_files(rd.from_arrow(fx["files"]), cfg)
    out = str(tmp_path / "out")

    man1 = write_er_outputs(res, out, cfg.to_dict())
    assert man1["tables"]["clusters"]["rows"] == 300
    assert not man1["tables"]["clusters"].get("skipped")

    # partitioned: more than zero parquet shard files under data/
    import glob

    shards = glob.glob(f"{out}/clusters/data/*.parquet")
    assert len(shards) >= 1

    # rerun with same config → every table skipped, data readable
    man2 = write_er_outputs(res, out, cfg.to_dict())
    assert all(t.get("skipped") for t in man2["tables"].values())
    back = rd.read_parquet(f"{out}/clusters/data").to_pandas()
    assert len(back) == 300
    with open(f"{out}/run_manifest.json") as f:
        assert json.load(f)["config_hash"] == man1["config_hash"]


def test_json_corpus_roundtrip(tmp_path):
    # K2: JSON interchange export must re-read to the identical table
    # (reference writes BioC JSON collections, corpus.py:171-180)
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from belb_ray.pipelines.outputs import export_json_corpus

    df = pd.DataFrame({
        "doc_id": np.arange(40, dtype=np.int64),
        "text": [f"döc {i} — ünïcode ok" for i in range(40)],
        "score": np.arange(40) * 0.25})
    out = str(tmp_path / "corpus_json")
    man = export_json_corpus(rd.from_pandas(df).repartition(4), out,
                             {"split": "train"})
    assert man["rows"] == 40 and man["files"] >= 1
    back = (rd.read_json(f"{out}/data").to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    assert back["text"].tolist() == df["text"].tolist()  # utf-8 intact
    pd.testing.assert_frame_equal(back[["doc_id", "text", "score"]],
                                  df[["doc_id", "text", "score"]])


def test_resumable_write_rejects_nonstring_partition(tmp_path):
    # float/bool partition values stringify differently in numpy vs hive
    # dir names — the op must refuse them loudly (ADVICE r2)
    import numpy as np
    import pandas as pd
    import pytest
    import ray.data as rd

    from belb_ray.pipelines.outputs import resumable_partitioned_write

    df = pd.DataFrame({"doc_id": np.arange(6, dtype=np.int64),
                       "frac": np.arange(6) * 0.5})
    with pytest.raises(TypeError, match="part_col"):
        resumable_partitioned_write(rd.from_pandas(df),
                                    str(tmp_path / "out"), "frac", {})


def test_resumable_partitioned_write(tmp_path):
    import os
    import time as _time

    import numpy as np
    import pandas as pd
    import ray.data as rd

    from belb_ray.pipelines.outputs import resumable_partitioned_write

    df = pd.DataFrame({
        "doc_id": np.arange(60, dtype=np.int64),
        "lang": np.array(["en", "de", "fr"])[np.arange(60) % 3],
        "val": np.arange(60, dtype=np.int64) * 7})
    out = str(tmp_path / "exp")
    cfg = {"v": 1}
    r1 = resumable_partitioned_write(rd.from_pandas(df).repartition(4),
                                     out, "lang", cfg)
    assert r1["skipped"] == {} and sorted(r1["written"]) == ["de", "en", "fr"]
    assert sum(r1["written"].values()) == 60
    back = rd.read_parquet(out).to_pandas()
    assert len(back) == 60 and set(back["lang"]) == {"de", "en", "fr"}

    # full resume: nothing rewritten, mtimes untouched
    mt = {d: os.path.getmtime(os.path.join(out, d))
          for d in os.listdir(out) if d.startswith("lang=")}
    _time.sleep(0.05)
    r2 = resumable_partitioned_write(rd.from_pandas(df).repartition(4),
                                     out, "lang", cfg)
    assert r2["written"] == {} and sorted(r2["skipped"]) == ["de", "en", "fr"]
    for d, m in mt.items():
        assert os.path.getmtime(os.path.join(out, d)) == m

    # partial resume: lose one partition, only it is rewritten
    import shutil
    shutil.rmtree(os.path.join(out, "lang=de"))
    r3 = resumable_partitioned_write(rd.from_pandas(df).repartition(4),
                                     out, "lang", cfg)
    assert list(r3["written"]) == ["de"] and r3["written"]["de"] == 20
    assert os.path.getmtime(os.path.join(out, "lang=en")) == mt["lang=en"]
    assert len(rd.read_parquet(out).to_pandas()) == 60

    # config change invalidates everything
    r4 = resumable_partitioned_write(rd.from_pandas(df).repartition(4),
                                     out, "lang", {"v": 2})
    assert sorted(r4["written"]) == ["de", "en", "fr"]
