"""Score-stage-only probe for the 2M campaign's attach→score→contract
anti-scaling (round 3: 33 s @ 4 CPUs vs 42-58 s @ 16 CPUs).

--save computes features+pairs ONCE (at whatever --cpus) and parquets
them under /tmp/belb_ray_score_inputs_<rows>; subsequent runs read those
and time ONLY the score chain, so a 4-vs-16 A/B costs seconds of setup,
not the 8-minute 4-CPU feature pass.

    python tools/profile_score.py --rows 2000000 --cpus 16 --save
    python tools/profile_score.py --rows 2000000 --cpus 4
    python tools/profile_score.py --rows 2000000 --cpus 16 --mode join
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
    ap.add_argument("--save", action="store_true")
    ap.add_argument("--mode", default="auto",
                    choices=["auto", "broadcast", "join"])
    ap.add_argument("--stats", action="store_true")
    args = ap.parse_args()

    import ray

    ray.init(address="local", num_cpus=args.cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    import pyarrow.compute as pc
    import ray.data as rd

    from belb_ray.pipelines.er import ERConfig
    from belb_ray.util import resolve_num_buckets
    from belb_ray.stages.cluster import _contract_block
    from belb_ray.stages.scoring import attach_features, score_pairs

    cfg = ERConfig()
    base = f"/tmp/belb_ray_score_inputs_{args.rows}"

    if args.save:
        from belb_ray.sources.readers import read_parquet_clean
        from belb_ray.stages.blocking import (compute_features,
                                              explode_band_keys,
                                              path_neighborhood_keys)
        from belb_ray.stages.dedup import (ensure_identity_columns,
                                           exact_dedup_annotate)
        from belb_ray.stages.pairs import candidate_pairs

        files = ensure_identity_columns(
            read_parquet_clean(f"/tmp/belb_ray_scaling_{args.rows}"))
        feats_all = compute_features(files, num_perm=cfg.num_perm,
                                     shingle_k=cfg.shingle_k, seed=cfg.seed,
                                     batch_size=cfg.blocker_batch_size,
                                     keep_cols=("content_sha256",))
        fm = exact_dedup_annotate(feats_all).materialize()
        features = fm.map_batches(
            lambda tb: tb.filter(pc.equal(tb["row_id"], tb["rep_id"]))
            .drop_columns(["content_sha256", "rep_id"]),
            batch_format="pyarrow").materialize()
        blocks = explode_band_keys(features, bands=cfg.bands)
        blocks = blocks.union(path_neighborhood_keys(features))
        pairs = candidate_pairs(blocks, max_block=cfg.max_block,
                                window=cfg.window)
        features.write_parquet(f"{base}/features")
        pairs.write_parquet(f"{base}/pairs")
        print(json.dumps({"saved": base, "n_feat": features.count(),
                          "feat_bytes": features.size_bytes(),
                          "n_pairs": pairs.count()}))
        ray.shutdown()
        return

    features = rd.read_parquet(f"{base}/features").materialize()
    pairs = rd.read_parquet(f"{base}/pairs").materialize()

    kw: dict = {"num_buckets": resolve_num_buckets(cfg.join_buckets)}
    if args.mode == "broadcast":
        kw["broadcast_threshold"] = 1 << 60
        kw["broadcast_bytes"] = 1 << 60
    elif args.mode == "join":
        kw["broadcast_threshold"] = 0

    t0 = time.time()
    pf = attach_features(pairs, features, **kw)
    edges = score_pairs(pf, threshold=cfg.threshold, w_jacc=cfg.w_jacc,
                        w_jw=cfg.w_jw, w_tok=cfg.w_tok)
    contracted = edges.map_batches(_contract_block,
                                   batch_format="pyarrow").materialize()
    dt = time.time() - t0
    if args.stats:
        print("== score stats ==\n", contracted.stats()[-8000:],
              file=sys.stderr)
    print(json.dumps({"cpus": args.cpus, "rows": args.rows,
                      "mode": args.mode, "score_contract": round(dt, 2),
                      "n_edges": contracted.count()}))
    ray.shutdown()


if __name__ == "__main__":
    main()
