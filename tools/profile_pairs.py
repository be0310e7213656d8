"""A/B the candidate-pair shuffle shape at scale: as-is (512 map x 512
reduce shuffle objects) vs block-coalesced input (repartition before the
groupby), vs push-based shuffle.

Usage: python tools/profile_pairs.py --cpus 16 --rows 2000000 --variant b64
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
    ap.add_argument("--variant", default="asis",
                    choices=["asis", "b64", "b128", "push"])
    args = ap.parse_args()

    import ray

    ray.init(address="local", num_cpus=args.cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    if args.variant == "push":
        ctx.use_push_based_shuffle = True
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    import pyarrow.compute as pc

    from belb_ray.pipelines.er import ERConfig
    from belb_ray.sources.readers import read_parquet_clean
    from belb_ray.stages.blocking import (compute_features, explode_band_keys,
                                          path_neighborhood_keys)
    from belb_ray.stages.dedup import ensure_identity_columns, exact_dedup_annotate
    from belb_ray.stages.pairs import candidate_pairs

    cfg = ERConfig()
    path = f"/tmp/belb_ray_scaling_{args.rows}"

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

    blocks = explode_band_keys(features, bands=cfg.bands)
    blocks = blocks.union(path_neighborhood_keys(features))
    if args.variant in ("b64", "b128"):
        blocks = blocks.repartition(64 if args.variant == "b64" else 128)
    t0 = time.time()
    pairs = candidate_pairs(blocks, max_block=cfg.max_block,
                            window=cfg.window).materialize()
    dt = time.time() - t0
    print(json.dumps({"cpus": args.cpus, "rows": args.rows,
                      "variant": args.variant, "pairs_gen": round(dt, 2),
                      "n_pairs": pairs.count()}))
    ray.shutdown()


if __name__ == "__main__":
    main()
