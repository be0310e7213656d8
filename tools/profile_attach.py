"""Profile attach_features' broadcast vs join paths to PIN the
``broadcast_threshold`` crossover from data (VERDICT r2 Next #8).

One (reps, mode) config per invocation — fresh Ray session so trials
are comparable under the min-of-N protocol:

    python tools/profile_attach.py --reps 1000000 --mode broadcast
    python tools/profile_attach.py --reps 1000000 --mode join

Builds a synthetic feature table (row_id, 32-perm sig, path) of
``--reps`` rows and ``2x reps`` candidate pairs, then times
attach_features end-to-end (consumed by a row-count reduce, so every
output block materializes). ``--mode`` forces the path by setting
broadcast_threshold to inf/0.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_inputs(reps: int, num_perm: int = 32, seed: int = 0):
    import ray.data as rd

    from belb_ray.functions.minhash import sig_array

    rng = np.random.default_rng(seed)
    ids = np.arange(reps, dtype=np.int64) * 7 + 1
    sig = rng.integers(0, 2**63, size=(reps, num_perm)).astype(np.uint64)
    paths = np.array([f"src/m{i % 997}/f_{i % 8191}.py" for i in range(reps)],
                     dtype=object)
    feat_tbl = pa.table({
        "row_id": pa.array(ids),
        "sig": sig_array(sig),
        "path": pa.array(paths, pa.string()),
    })
    n_pairs = 2 * reps
    a = ids[rng.integers(0, reps, n_pairs)]
    b = ids[rng.integers(0, reps, n_pairs)]
    pair_tbl = pa.table({"id_a": pa.array(a), "id_b": pa.array(b)})
    feats = rd.from_arrow(feat_tbl).repartition(64).materialize()
    pairs = rd.from_arrow(pair_tbl).repartition(64).materialize()
    return feats, pairs


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=1_000_000)
    ap.add_argument("--mode", choices=["broadcast", "join"],
                    default="broadcast")
    ap.add_argument("--cpus", type=int, default=16)
    args = ap.parse_args()

    import ray

    ray.init(address="local", num_cpus=args.cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import ray.data  # noqa: F401

    from belb_ray.stages.scoring import attach_features

    feats, pairs = build_inputs(args.reps)
    thresh = 1 << 62 if args.mode == "broadcast" else 0
    t0 = time.perf_counter()
    out = attach_features(pairs, feats, broadcast_threshold=thresh)
    rows = int(out.map_batches(
        lambda t: pa.table({"n": pa.array([t.num_rows], pa.int64())}),
        batch_format="pyarrow").to_pandas()["n"].sum())
    secs = round(time.perf_counter() - t0, 2)
    print(json.dumps({"reps": args.reps, "mode": args.mode,
                      "cpus": args.cpus, "secs": secs, "rows": rows}))
    ray.shutdown()


if __name__ == "__main__":
    main()
