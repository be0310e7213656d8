"""Per-stage timing for resolve_increment (mirror of its internals, the
profile_er.py pattern) — finds where the campaign-scale attach spends
its wall clock. Requires the caches built by profile_increment.py.

Usage: python tools/profile_increment_stages.py --cpus 16 \
    --state-rows 4000000 --inc-rows 1000000
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=16)
    ap.add_argument("--state-rows", type=int, default=4_000_000)
    ap.add_argument("--inc-rows", type=int, default=1_000_000)
    args = ap.parse_args()

    import ray

    ray.init(address="local", num_cpus=args.cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from belb_ray.pipelines.er import ERConfig
    from belb_ray.sources.readers import read_parquet_clean
    from belb_ray.stages.analytic import _attach_small
    from belb_ray.stages.blocking import (compute_features,
                                          explode_band_keys,
                                          path_neighborhood_keys)
    from belb_ray.stages.cluster import assign_clusters, connected_components
    from belb_ray.stages.dedup import (ensure_identity_columns,
                                       exact_dedup_annotate)
    from belb_ray.stages.scoring import attach_features, score_table
    from belb_ray.util import resolve_num_buckets

    total = args.state_rows + args.inc_rows
    base = f"/tmp/belb_ray_incfix_{total}"
    state_dir = f"/tmp/belb_ray_incstate_{total}"
    cfg = ERConfig()
    t: dict[str, float] = {}
    t_all = time.time()

    t0 = time.time()
    files = ensure_identity_columns(
        read_parquet_clean(os.path.join(base, "inc")))
    feats_all = compute_features(
        files, num_perm=cfg.num_perm, shingle_k=cfg.shingle_k, seed=cfg.seed,
        batch_size=cfg.blocker_batch_size,
        keep_cols=("content_sha256",)).materialize()
    fm = exact_dedup_annotate(feats_all).materialize()
    members = fm.select_columns(["row_id", "rep_id"])
    feats_new = fm.map_batches(
        lambda tb: tb.filter(pc.equal(tb["row_id"], tb["rep_id"]))
        .drop_columns(["content_sha256", "rep_id"]),
        batch_format="pyarrow").materialize()
    t["new_features_dedup"] = time.time() - t0

    t0 = time.time()
    shards = sorted(glob.glob(
        os.path.join(state_dir, "features", "run-*", "*.parquet")))
    feats_old = read_parquet_clean(shards).materialize()
    t["state_read"] = time.time() - t0

    t0 = time.time()

    def _blocks(feats):
        b = explode_band_keys(feats, bands=cfg.bands)
        if cfg.use_path_keys:
            b = b.union(path_neighborhood_keys(feats))
        return b

    def _tag(side):
        def fn(tb):
            return tb.append_column("__side", pa.array(
                np.full(tb.num_rows, side, np.int8)))
        return fn

    both = (_blocks(feats_new).map_batches(_tag(1), batch_format="pyarrow")
            .union(_blocks(feats_old).map_batches(_tag(0),
                                                  batch_format="pyarrow")))
    num_buckets = resolve_num_buckets(cfg.join_buckets)

    def _bucketize(b):
        h = pd.util.hash_array(b["block_key"].to_numpy(), categorize=False)
        b["__bucket"] = (h % np.uint64(num_buckets)).astype(np.int32)
        return b

    max_per_key = cfg.max_block

    def _pairs(group):
        g = group.drop(columns="__bucket").drop_duplicates(
            ["block_key", "row_id", "__side"])
        g = (g.sort_values(["block_key", "__side", "row_id"],
                           kind="mergesort")
             .groupby(["block_key", "__side"], sort=False)
             .head(max_per_key))
        new = g.loc[g["__side"] == 1, ["block_key", "row_id"]]
        old = g.loc[g["__side"] == 0, ["block_key", "row_id"]]
        cross = new.merge(old, on="block_key", suffixes=("", "_o"))
        cross = pd.DataFrame({"id_a": cross["row_id"],
                              "id_b": cross["row_id_o"],
                              "is_cross": np.int8(1)})
        nn = new.merge(new, on="block_key", suffixes=("", "_o"))
        nn = nn[nn["row_id"] < nn["row_id_o"]]
        nn = pd.DataFrame({"id_a": nn["row_id"], "id_b": nn["row_id_o"],
                           "is_cross": np.int8(0)})
        out = pd.concat([cross, nn], ignore_index=True)
        return out.drop_duplicates(["id_a", "id_b", "is_cross"])

    raw_pairs = (both.map_batches(_bucketize, batch_format="pandas")
                 .groupby("__bucket").map_groups(_pairs,
                                                 batch_format="pandas"))

    def _pair_bucket(batch: pa.Table) -> pa.Table:
        a = batch["id_a"].to_numpy().astype(np.uint64)
        b = batch["id_b"].to_numpy().astype(np.uint64)
        h = (a * np.uint64(0x9E3779B97F4A7C15)) ^ (
            b + np.uint64(0xC2B2AE3D27D4EB4F))
        return batch.append_column(
            "__pb", pa.array((h % np.uint64(num_buckets)).astype(np.int32)))

    def _pair_dedup(group: pa.Table) -> pa.Table:
        a = group["id_a"].to_numpy()
        b = group["id_b"].to_numpy()
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        keep = np.r_[True, (a[1:] != a[:-1]) | (b[1:] != b[:-1])]
        return pa.table({
            "id_a": pa.array(a[keep], pa.int64()),
            "id_b": pa.array(b[keep], pa.int64()),
            "is_cross": group["is_cross"].take(pa.array(order[keep]))})

    pairs = (raw_pairs.map_batches(_pair_bucket, batch_format="pyarrow")
             .groupby("__pb").map_groups(_pair_dedup,
                                         batch_format="pyarrow")
             ).materialize()
    t["blocks_pairs"] = time.time() - t0
    n_pairs = pairs.count()

    t0 = time.time()
    need_paths = cfg.w_jw > 0 or cfg.w_tok > 0
    cross_pairs = pairs.filter(expr="is_cross == 1").drop_columns(["is_cross"])
    nn_pairs = pairs.filter(expr="is_cross == 0").drop_columns(["is_cross"])
    all_feats = feats_new.union(feats_old)
    _scorer = lambda tb: score_table(tb, cfg.threshold, cfg.w_jacc,
                                     cfg.w_jw, cfg.w_tok)
    cross_edges = attach_features(
        cross_pairs, all_feats, num_buckets=num_buckets,
        need_paths=need_paths, scorer=_scorer).materialize()
    nn_edges = attach_features(
        nn_pairs, feats_new, num_buckets=num_buckets,
        need_paths=need_paths, scorer=_scorer).materialize()
    t["attach_score"] = time.time() - t0

    t0 = time.time()
    labels = connected_components(nn_edges, num_buckets=num_buckets)
    rep_ids = feats_new.select_columns(["row_id"])
    rep_members = rep_ids.map_batches(
        lambda tb: pa.table({"row_id": tb["row_id"],
                             "rep_id": tb["row_id"]}),
        batch_format="pyarrow")
    comp = assign_clusters(rep_members, labels, num_buckets=num_buckets)
    n = comp.count()
    t["cc_assign"] = time.time() - t0

    print(json.dumps({"cpus": args.cpus, "n_pairs": n_pairs, "n_comp": n,
                      "n_cross": cross_edges.count(),
                      "n_nn": nn_edges.count(),
                      "total_to_comp": round(time.time() - t_all, 2),
                      **{k: round(v, 2) for k, v in t.items()}}))
    ray.shutdown()


if __name__ == "__main__":
    main()
