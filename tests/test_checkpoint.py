"""Checkpoint / resume semantics (north rule: per-partition shards +
lineage manifests, rerun skips completed stages)."""

import json
import os

import pyarrow as pa
import ray.data as rd


def _make(tmp_path, calls, config):
    from belb_ray.pipelines.checkpoint import checkpoint_stage

    def factory():
        calls.append(1)
        return rd.from_arrow(pa.table({"x": pa.array([1, 2, 3], pa.int64())}))

    return checkpoint_stage(factory, str(tmp_path / "stage"), config,
                            lineage={"stage": "test", "fragments": [0, 1]})


def test_checkpoint_skip_on_rerun(tmp_path):
    calls = []
    out1 = _make(tmp_path, calls, {"v": 1})
    assert out1.count() == 3
    assert len(calls) == 1

    out2 = _make(tmp_path, calls, {"v": 1})  # same config → read shards
    assert out2.count() == 3
    assert len(calls) == 1  # factory NOT re-invoked

    out3 = _make(tmp_path, calls, {"v": 2})  # config change → recompute
    assert out3.count() == 3
    assert len(calls) == 2


def test_checkpoint_manifest_lineage(tmp_path):
    from belb_ray.pipelines.checkpoint import read_manifest

    calls = []
    _make(tmp_path, calls, {"v": 1})
    man = read_manifest(str(tmp_path / "stage"))
    assert man["rows"] == 3
    assert man["lineage"]["stage"] == "test"
    assert man["lineage"]["fragments"] == [0, 1]
    assert "config_hash" in man


def test_checkpoint_crash_safe(tmp_path):
    """A half-written tmp dir must not be mistaken for a finished stage."""
    calls = []
    tmp = tmp_path / "stage.tmp"
    os.makedirs(tmp / "data")
    (tmp / "garbage").write_text("partial")
    out = _make(tmp_path, calls, {"v": 1})
    assert out.count() == 3
    assert len(calls) == 1
    assert not tmp.exists()  # tmp cleaned up after atomic rename


def test_er_checkpoint_resume(tmp_path):
    """resolve_files with checkpoint_dir: second run reuses edge shards."""
    from belb_ray.pipelines.checkpoint import read_manifest
    from belb_ray.pipelines.er import ERConfig, resolve_files
    from belb_ray.sources.synthetic import make_fixture

    fx = make_fixture(n_files=300, seed=11)
    cfg = ERConfig(input_blocks=4)
    ck = str(tmp_path / "ck")

    files = rd.from_arrow(fx["files"])
    out1 = resolve_files(files, cfg, checkpoint_dir=ck)
    c1 = out1["clusters"].to_pandas().sort_values("row_id").reset_index(drop=True)
    man1 = read_manifest(f"{ck}/edges")
    assert man1 is not None and man1["rows"] >= 0

    out2 = resolve_files(files, cfg, checkpoint_dir=ck)
    c2 = out2["clusters"].to_pandas().sort_values("row_id").reset_index(drop=True)
    man2 = read_manifest(f"{ck}/edges")
    assert man2["config_hash"] == man1["config_hash"]
    assert c1.equals(c2)


def test_levenshtein_and_ratio():
    from belb_ray.functions.similarity import levenshtein, levenshtein_ratio

    assert levenshtein("kitten", "sitting") == 3
    assert levenshtein("", "abc") == 3
    assert levenshtein("same", "same") == 0
    assert levenshtein_ratio("", "") == 1.0
    assert levenshtein_ratio("abcd", "abce") == 0.75


def test_hash_sample_deterministic():
    from belb_ray.stages.sampling import hash_sample

    ds = rd.from_arrow(pa.table({"k": pa.array(range(1000), pa.int64())}))
    a = sorted(hash_sample(ds, "k", 0.3, seed=5).to_pandas()["k"])
    b = sorted(hash_sample(ds, "k", 0.3, seed=5).to_pandas()["k"])
    assert a == b
    assert 200 < len(a) < 400  # ~30%
    c = sorted(hash_sample(ds, "k", 0.3, seed=6).to_pandas()["k"])
    assert a != c  # seed changes selection


def test_upsample_chunks_bounds():
    from belb_ray.stages.sampling import upsample_chunks

    ds = rd.from_arrow(pa.table({"k": pa.array(range(500), pa.int64())}))
    out = upsample_chunks(ds, key="k", max_chunk=40, seed=1).to_pandas()
    assert len(out) == 500
    sizes = out.groupby("chunk_id").size()
    assert sizes.max() <= 40


def test_seeded_upsample_chunks_exact_stdlib_shuffle():
    # O4 exact form: per-group assignment must equal stdlib
    # random.Random(f"{seed}:{g}").shuffle over sorted ids, regardless
    # of input partitioning (reference corpus.py:381-410 semantics)
    import random

    import numpy as np
    import pandas as pd

    from belb_ray.stages.sampling import seeded_upsample_chunks

    rng = np.random.default_rng(2)
    g = rng.integers(0, 25, 700)
    ids = np.arange(700, dtype=np.int64)
    df = pd.DataFrame({"doc": g.astype(np.int64), "ann": ids})

    outs = []
    for blocks in (3, 17):
        out = (seeded_upsample_chunks(
            rd.from_pandas(df).repartition(blocks), "doc", "ann",
            max_chunk=20, seed=9).to_pandas()
            .sort_values(["doc", "ann"]).reset_index(drop=True))
        outs.append(out)
    assert outs[0].equals(outs[1])  # partition-independent

    got = outs[0]
    for gval, sub in df.groupby("doc"):
        want_ids = sorted(sub["ann"].tolist())
        random.Random(f"9:{gval}").shuffle(want_ids)
        want = {i: pos // 20 for pos, i in enumerate(want_ids)}
        sg = got[got["doc"] == gval]
        assert dict(zip(sg["ann"], sg["chunk_idx"])) == want
        assert sg["chunk_idx"].value_counts().max() <= 20


def test_er_checkpoint_resume_after_partial_crash(tmp_path):
    """Kill-mid-`edges` contract at multi-shard state (VERDICT r3 #7):
    a run that died while writing edge shards leaves `edges.tmp` holding
    a SUBSET of real data shards and no manifest; the resume must
    discard the partial state, recompute, and emit byte-identical
    clusters. The partial tmp here is built from a genuine prior run's
    shards (half of them), so the discarded state is exactly what a
    SIGKILL mid-write leaves behind."""
    import shutil

    from belb_ray.pipelines.checkpoint import read_manifest
    from belb_ray.pipelines.er import ERConfig, resolve_files
    from belb_ray.sources.synthetic import make_fixture

    fx = make_fixture(n_files=3000, seed=13)
    cfg = ERConfig(input_blocks=8)
    files = rd.from_arrow(fx["files"])

    # clean baseline run (its edge shards seed the crash state)
    ck1 = str(tmp_path / "ck_clean")
    out1 = resolve_files(files, cfg, checkpoint_dir=ck1)
    c1 = out1["clusters"].to_pandas().sort_values("row_id").reset_index(drop=True)
    shard_dir = os.path.join(ck1, "edges", "data")
    shards = sorted(os.listdir(shard_dir))
    assert len(shards) >= 2, "need a multi-shard edge state for this test"

    # crashed state: edges.tmp with HALF the real shards, no manifest
    ck2 = str(tmp_path / "ck_crashed")
    partial = os.path.join(ck2, "edges.tmp", "data")
    os.makedirs(partial)
    for s in shards[: max(1, len(shards) // 2)]:
        shutil.copy(os.path.join(shard_dir, s), os.path.join(partial, s))

    out2 = resolve_files(files, cfg, checkpoint_dir=ck2)
    c2 = out2["clusters"].to_pandas().sort_values("row_id").reset_index(drop=True)
    assert c1.equals(c2)
    man = read_manifest(os.path.join(ck2, "edges"))
    assert man is not None and man["config_hash"] == \
        read_manifest(os.path.join(ck1, "edges"))["config_hash"]
    assert not os.path.exists(os.path.join(ck2, "edges.tmp"))
