"""Fine-grained probe of the ER `pairs` and `score_contract` stages —
the two non-scaling stages in the 2M-row campaign (round 3). Prints
sub-step timers + Ray Dataset stats for task-count forensics.

Usage: python tools/profile_stage.py --cpus 16 --rows 2000000
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=16)
    ap.add_argument("--rows", type=int, default=2_000_000)
    ap.add_argument("--stats", action="store_true")
    args = ap.parse_args()

    import ray

    ray.init(address="local", num_cpus=args.cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    import pyarrow.compute as pc

    from belb_ray.pipelines.er import ERConfig
    from belb_ray.util import resolve_num_buckets
    from belb_ray.sources.readers import read_parquet_clean
    from belb_ray.stages.blocking import (compute_features, explode_band_keys,
                                          path_neighborhood_keys)
    from belb_ray.stages.cluster import _contract_block
    from belb_ray.stages.dedup import ensure_identity_columns, exact_dedup_annotate
    from belb_ray.stages.pairs import candidate_pairs
    from belb_ray.stages.scoring import attach_features, score_pairs

    cfg = ERConfig()
    path = f"/tmp/belb_ray_scaling_{args.rows}"
    t: dict[str, float] = {}

    t0 = time.time()
    files = ensure_identity_columns(read_parquet_clean(path))
    feats_all = compute_features(files, num_perm=cfg.num_perm,
                                 shingle_k=cfg.shingle_k, seed=cfg.seed,
                                 batch_size=cfg.blocker_batch_size,
                                 keep_cols=("content_sha256",))
    fm = exact_dedup_annotate(feats_all).materialize()
    features = fm.map_batches(
        lambda tb: tb.filter(pc.equal(tb["row_id"], tb["rep_id"]))
        .drop_columns(["content_sha256", "rep_id"]),
        batch_format="pyarrow").materialize()
    t["setup"] = time.time() - t0

    # ---- pairs, sub-steps
    t0 = time.time()
    blocks = explode_band_keys(features, bands=cfg.bands)
    blocks = blocks.union(path_neighborhood_keys(features))
    blocks = blocks.materialize()
    t["pairs_blocks"] = time.time() - t0
    if args.stats:
        print("== blocks stats ==\n", blocks.stats()[-3000:], file=sys.stderr)

    t0 = time.time()
    pairs = candidate_pairs(blocks, max_block=cfg.max_block,
                            window=cfg.window).materialize()
    t["pairs_gen"] = time.time() - t0
    t["n_pairs"] = pairs.count()
    if args.stats:
        print("== pairs stats ==\n", pairs.stats()[-5000:], file=sys.stderr)

    # ---- score, sub-steps
    t0 = time.time()
    pf = attach_features(pairs, features, num_buckets=resolve_num_buckets(cfg.join_buckets))
    edges = score_pairs(pf, threshold=cfg.threshold, w_jacc=cfg.w_jacc,
                        w_jw=cfg.w_jw, w_tok=cfg.w_tok)
    contracted = edges.map_batches(_contract_block,
                                   batch_format="pyarrow").materialize()
    t["score_contract"] = time.time() - t0
    t["n_edges"] = contracted.count()
    if args.stats:
        print("== score stats ==\n", contracted.stats()[-6000:],
              file=sys.stderr)

    print(json.dumps({"cpus": args.cpus, "rows": args.rows,
                      **{k: round(v, 2) for k, v in t.items()}}))
    ray.shutdown()


if __name__ == "__main__":
    main()
