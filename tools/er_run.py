"""Checkpointed ER run over the scaling fixture — the kill/resume probe.

Runs `resolve_files` with `checkpoint_dir` in THIS process and prints a
deterministic cluster checksum. The campaign driver (scale_campaign.py)
launches it, SIGKILLs it mid-`edges`, relaunches, and compares the
checksum against an uninterrupted run — the resume contract at campaign
scale (VERDICT r3 #7).

Usage: python tools/er_run.py --rows 4000000 --cpus 16 --checkpoint /tmp/ck
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, required=True)
    ap.add_argument("--cpus", type=int, default=16)
    ap.add_argument("--checkpoint", required=True)
    args = ap.parse_args()

    import ray

    ray.init(address="local", num_cpus=args.cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    import numpy as np
    import pyarrow as pa

    from belb_ray.pipelines.er import ERConfig, resolve_files
    from belb_ray.sources.readers import read_parquet_clean

    path = f"/tmp/belb_ray_scaling_{args.rows}"
    if not os.path.exists(path):
        raise SystemExit(f"fixture missing: {path} (run scale_campaign.py)")

    t0 = time.time()
    files = read_parquet_clean(path)
    out = resolve_files(files, ERConfig(), checkpoint_dir=args.checkpoint)

    def _ck(batch: pa.Table) -> pa.Table:
        a = batch["row_id"].to_numpy().astype(np.uint64)
        b = batch["cluster_id"].to_numpy().astype(np.uint64)
        v = (a * np.uint64(0x9E3779B97F4A7C15)) ^ b
        # XOR-fold: order-independent across blocks
        acc = np.bitwise_xor.reduce(v) if len(v) else np.uint64(0)
        return pa.table({"x": pa.array([int(acc)], pa.uint64()),
                         "n": pa.array([batch.num_rows], pa.int64())})

    parts = out["clusters"].map_batches(
        _ck, batch_format="pyarrow").to_pandas()
    checksum = 0
    for x in parts["x"]:
        checksum ^= int(x)
    print(json.dumps({"rows": args.rows, "cpus": args.cpus,
                      "n_clustered": int(parts["n"].sum()),
                      "checksum": f"{checksum:016x}",
                      "total": round(time.time() - t0, 2)}))
    ray.shutdown()


if __name__ == "__main__":
    main()
