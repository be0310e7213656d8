"""Per-stage ER timing breakdown at a given num_cpus — the measurement
tool behind the scaling work (run in a FRESH process per CPU level).

Usage: python tools/profile_er.py --cpus 8 --rows 500000
Prints one JSON line with per-stage seconds.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--rows", type=int, default=500_000)
    ap.add_argument("--object-store-gb", type=float, default=0,
                    help="cap the object store (GiB) to exercise spilling")
    ap.add_argument("--dedup-broadcast-rows", type=int, default=50_000_000,
                    help="exact_dedup_annotate broadcast row cap — set to 0 "
                         "to force its partitioned-join fallback")
    ap.add_argument("--attach-broadcast-bytes", type=int, default=-1,
                    help="attach_features byte budget (-1 = adaptive) — "
                         "set to 0 to force the fused-join fallback")
    args = ap.parse_args()

    import ray

    init_kw = {}
    if args.object_store_gb:
        init_kw["object_store_memory"] = int(args.object_store_gb * 2**30)
    ray.init(address="local", num_cpus=args.cpus, include_dashboard=False,
             logging_level="ERROR", **init_kw)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    import pyarrow.parquet as pq
    import ray.data as rd

    from belb_ray.sources.synthetic import make_fixture

    path = f"/tmp/belb_ray_scaling_{args.rows}"
    if not os.path.exists(path):
        tbl = make_fixture(n_files=args.rows, seed=42)["files"]
        os.makedirs(path + ".tmp", exist_ok=True)
        shards = 64
        per = (tbl.num_rows + shards - 1) // shards
        for i in range(shards):
            pq.write_table(tbl.slice(i * per, per),
                           f"{path}.tmp/part-{i:04d}.parquet")
        os.rename(path + ".tmp", path)

    from belb_ray.pipelines.er import ERConfig
    from belb_ray.util import resolve_num_buckets
    from belb_ray.stages.blocking import (compute_features, explode_band_keys,
                                          path_neighborhood_keys)
    from belb_ray.stages.cluster import (_contract_block, assign_clusters,
                                         connected_components)
    from belb_ray.stages.dedup import ensure_identity_columns, exact_dedup_annotate
    from belb_ray.stages.pairs import candidate_pairs
    from belb_ray.stages.scoring import (attach_features, score_pairs,
                                         score_table)

    cfg = ERConfig()
    import pyarrow.compute as pc

    t: dict[str, float] = {}
    t_all0 = time.time()

    t0 = time.time()
    from belb_ray.sources.readers import read_parquet_clean
    files = ensure_identity_columns(read_parquet_clean(path))
    feats_all = compute_features(files, num_perm=cfg.num_perm,
                                 shingle_k=cfg.shingle_k, seed=cfg.seed,
                                 batch_size=cfg.blocker_batch_size,
                                 keep_cols=("content_sha256",)).materialize()
    fm = exact_dedup_annotate(
        feats_all,
        broadcast_rows=args.dedup_broadcast_rows).materialize()
    del feats_all  # release the pre-dedup wide copy (pipelines/er.py)
    t["features_dedup"] = time.time() - t0

    t0 = time.time()
    members = fm.select_columns(["row_id", "rep_id"]).materialize()
    features = fm.map_batches(
        lambda tb: tb.filter(pc.equal(tb["row_id"], tb["rep_id"]))
        .drop_columns(["content_sha256", "rep_id"]),
        batch_format="pyarrow").materialize()
    del fm
    t["rep_filter"] = time.time() - t0

    t0 = time.time()
    blocks = explode_band_keys(features, bands=cfg.bands)
    blocks = blocks.union(path_neighborhood_keys(features))
    pairs = candidate_pairs(blocks, max_block=cfg.max_block,
                            window=cfg.window).materialize()
    t["pairs"] = time.time() - t0

    t0 = time.time()
    edges = attach_features(
        pairs, features, num_buckets=resolve_num_buckets(cfg.join_buckets),
        broadcast_bytes=(None if args.attach_broadcast_bytes < 0
                         else args.attach_broadcast_bytes),
        scorer=lambda tb: score_table(tb, cfg.threshold, cfg.w_jacc,
                                      cfg.w_jw, cfg.w_tok))
    contracted = edges.map_batches(_contract_block,
                                   batch_format="pyarrow").materialize()
    t["score_contract"] = time.time() - t0

    t0 = time.time()
    labels = connected_components(contracted.map_batches(lambda x: x,
                                                         batch_format="pyarrow"))
    clusters = assign_clusters(members, labels, num_buckets=resolve_num_buckets(cfg.join_buckets))

    def _ck(batch):
        import numpy as _np

        a = batch["row_id"].to_numpy().astype(_np.uint64)
        b = batch["cluster_id"].to_numpy().astype(_np.uint64)
        v = (a * _np.uint64(0x9E3779B97F4A7C15)) ^ b
        acc = _np.bitwise_xor.reduce(v) if len(v) else _np.uint64(0)
        import pyarrow as _pa

        return _pa.table({"x": _pa.array([int(acc)], _pa.uint64()),
                          "n": _pa.array([batch.num_rows], _pa.int64())})

    parts = clusters.map_batches(_ck, batch_format="pyarrow").to_pandas()
    n = int(parts["n"].sum())
    checksum = 0
    for x in parts["x"]:
        checksum ^= int(x)
    t["cc_assign"] = time.time() - t0

    total = time.time() - t_all0
    spill = {"spilled_mib": 0, "spilled_objects": 0}
    try:
        import re as _re

        from ray._private.internal_api import memory_summary
        ms = memory_summary(stats_only=True)
        m = _re.search(r"Spilled (\d+) MiB, (\d+) objects", ms)
        if m:
            spill = {"spilled_mib": int(m.group(1)),
                     "spilled_objects": int(m.group(2))}
    except Exception:
        pass
    print(json.dumps({"cpus": args.cpus, "rows": args.rows, "n_out": n,
                      "checksum": f"{checksum:016x}",
                      "total": round(total, 2),
                      "object_store_gb": args.object_store_gb or None,
                      **spill,
                      **{k: round(v, 2) for k, v in t.items()}}))
    ray.shutdown()


if __name__ == "__main__":
    main()
