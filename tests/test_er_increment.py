"""Incremental ER attach: wave-2 records join wave-1 clusters."""

import shutil
import tempfile
import os

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
    half = tbl.num_rows // 2
    cfg = ERConfig(input_blocks=8)
    state = os.path.join(tempfile.gettempdir(), "belb_er_inc_test")
    shutil.rmtree(state, ignore_errors=True)

    res1 = resolve_files(rd.from_arrow(tbl.slice(0, half)), cfg)
    save_resolution_state(res1, state)
    inc = resolve_increment(rd.from_arrow(tbl.slice(half)), state, cfg)
    inc_df = inc.to_pandas()

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
    # wave-2 reps too (an exact re-send of a wave-2 file must match)
    resend = resolve_increment(rd.from_arrow(tbl.slice(half, 10)), state,
                               cfg, update_state=False)
    rs = resend.to_pandas()
    assert bool(rs["matched_existing"].all())
