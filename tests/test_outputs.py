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
