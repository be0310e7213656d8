"""Incremental ER attach: wave-2 records join wave-1 clusters."""

import os
import shutil
import tempfile

import numpy as np
import pandas as pd
import ray.data as rd


def _canon(df: pd.DataFrame) -> dict[int, int]:
    m = df.groupby("cluster_id")["row_id"].transform("min")
    return dict(zip(df["row_id"], m))


def test_resolve_increment_matches_batch_resolution():
    from belb_ray.pipelines.er import (ERConfig, resolve_files,
                                       resolve_increment,
                                       save_resolution_state)
    from belb_ray.sources.synthetic import make_fixture

    tbl = make_fixture(n_files=900, seed=11)["files"]
    # interleaved waves: duplicate families straddle, so inheritance is
    # load-bearing (a positional split leaves families whole per wave)
    idx = np.arange(tbl.num_rows)
    w1, w2 = tbl.take(idx[idx % 2 == 0]), tbl.take(idx[idx % 2 == 1])
    cfg = ERConfig(input_blocks=8)
    state = os.path.join(tempfile.gettempdir(), "belb_er_inc_test")
    shutil.rmtree(state, ignore_errors=True)

    res1 = resolve_files(rd.from_arrow(w1), cfg)
    save_resolution_state(res1, state)
    inc = resolve_increment(rd.from_arrow(w2), state, cfg)
    inc_df = inc.to_pandas()
    assert bool(inc_df["matched_existing"].any())  # inheritance exercised

    batch = resolve_files(rd.from_arrow(tbl), cfg)["clusters"].to_pandas()

    combined = pd.concat(
        [res1["clusters"].to_pandas(),
         inc_df[["row_id", "cluster_id"]]], ignore_index=True)
    got = _canon(combined)
    want = _canon(batch)
    assert got == want

    # every wave-2 row whose cluster already existed in wave 1 is
    # flagged matched_existing; fresh clusters are not
    w1_clusters = set(res1["clusters"].to_pandas()["cluster_id"])
    for _, r in inc_df.iterrows():
        assert bool(r["matched_existing"]) == (r["cluster_id"] in w1_clusters)

    # state grew: second increment against the updated state sees the
    # wave-2 reps too (an exact re-send of a wave-2 file must match) —
    # and compaction of the two run shards must not change the answer
    from belb_ray.stages.incremental import compact_state

    counts = compact_state(state)
    assert set(counts) == {"features", "clusters"}
    resend = resolve_increment(rd.from_arrow(w2.slice(0, 10)), state,
                               cfg, update_state=False)
    rs = resend.to_pandas()
    assert bool(rs["matched_existing"].all())


def test_resolve_increment_disjoint_batch_is_all_fresh():
    """A new batch with NO similarity to the state must not crash (the
    inherit combiner is empty -> zero blocks) and must come back all
    fresh-clustered."""
    from belb_ray.pipelines.er import (ERConfig, resolve_files,
                                       resolve_increment,
                                       save_resolution_state)
    from belb_ray.sources.synthetic import make_fixture

    cfg = ERConfig(input_blocks=4)
    state = os.path.join(tempfile.gettempdir(), "belb_er_inc_disjoint")
    shutil.rmtree(state, ignore_errors=True)
    w1 = make_fixture(n_files=300, seed=5)["files"]
    w2 = make_fixture(n_files=300, seed=99)["files"]
    res1 = resolve_files(rd.from_arrow(w1), cfg)
    save_resolution_state(res1, state)
    inc = resolve_increment(rd.from_arrow(w2), state, cfg,
                            update_state=False).to_pandas()
    assert len(inc) == w2.num_rows
    assert not inc["matched_existing"].any()
