"""Campaign-scale measurement for the incremental-ER attach path
(`pipelines/er.resolve_increment`) — VERDICT r4 #1.

SCALE.md's 100-TB story shards the corpus into campaigns and attaches
each new shard to the standing resolution state via `resolve_increment`;
before round 5 its largest recorded run was the 20k-row `er_increment`
bench query. This tool measures the real thing: an N-row state built
once (cached), then a fresh-process timed attach of an M-row increment.

Fixture: ONE `make_fixture(state+inc rows)` table split INTERLEAVED
(idx % k == k-1 → increment), so duplicate families straddle the
state/increment boundary and cluster inheritance is load-bearing —
the same construction as tests/test_er_increment.py.

Caches under /tmp (delete to regenerate):
  /tmp/belb_ray_incfix_{total}/{state,inc}/   parquet shards
  /tmp/belb_ray_incstate_{total}/             features/clusters run-*

Usage:
  python tools/profile_increment.py --cpus 16 --state-rows 4000000 \
      --inc-rows 1000000 [--object-store-gb G]
Prints one JSON line: state_rows, inc_rows, n_out, matched_existing,
checksum (XOR-fold, order-independent), total (the timed attach), and
state_build seconds when the state was (re)built this run.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def ensure_split_fixture(state_rows: int, inc_rows: int) -> str:
    """Interleaved state/increment shards; returns the fixture dir."""
    total = state_rows + inc_rows
    base = f"/tmp/belb_ray_incfix_{total}"
    if os.path.exists(base):
        return base
    import numpy as np
    import pyarrow.parquet as pq

    from belb_ray.sources.synthetic import make_fixture

    t0 = time.time()
    import pyarrow as pa

    tbl = make_fixture(n_files=total, seed=42)["files"]
    k = max(total // inc_rows, 2)
    # slice-wise take: a single take over 5M ~1KB strings overflows the
    # int32 offsets Arrow uses when it concatenates chunks internally
    state_parts, inc_parts = [], []
    step = 250_000
    for start in range(0, tbl.num_rows, step):
        sub = tbl.slice(start, step)
        gidx = np.arange(start, start + sub.num_rows)
        local = np.arange(sub.num_rows)
        inc_mask = gidx % k == k - 1
        state_parts.append(sub.take(local[~inc_mask]))
        inc_parts.append(sub.take(local[inc_mask]))
    parts = {"state": pa.concat_tables(state_parts),
             "inc": pa.concat_tables(inc_parts)}
    os.makedirs(base + ".tmp", exist_ok=True)
    for name, part in parts.items():
        d = os.path.join(base + ".tmp", name)
        os.makedirs(d, exist_ok=True)
        shards = 64 if name == "state" else 16
        per = (part.num_rows + shards - 1) // shards
        for i in range(shards):
            pq.write_table(part.slice(i * per, per),
                           f"{d}/part-{i:04d}.parquet")
    os.rename(base + ".tmp", base)
    print(f"# fixture generated in {time.time()-t0:.0f}s: {base} "
          f"(state={parts['state'].num_rows}, inc={parts['inc'].num_rows})",
          file=sys.stderr)
    return base


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=16)
    ap.add_argument("--state-rows", type=int, default=4_000_000)
    ap.add_argument("--inc-rows", type=int, default=1_000_000)
    ap.add_argument("--object-store-gb", type=float, default=0)
    args = ap.parse_args()

    import ray

    init_kw = {}
    if args.object_store_gb:
        init_kw["object_store_memory"] = int(args.object_store_gb * 2**30)
    ray.init(address="local", num_cpus=args.cpus, include_dashboard=False,
             logging_level="ERROR", **init_kw)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

    import numpy as np
    import pyarrow as pa

    from belb_ray.pipelines.er import (ERConfig, resolve_files,
                                       resolve_increment,
                                       save_resolution_state)
    from belb_ray.sources.readers import read_parquet_clean

    base = ensure_split_fixture(args.state_rows, args.inc_rows)
    total = args.state_rows + args.inc_rows
    state_dir = f"/tmp/belb_ray_incstate_{total}"
    cfg = ERConfig()

    state_build = None
    if not os.path.isdir(os.path.join(state_dir, "features")):
        t0 = time.time()
        res = resolve_files(read_parquet_clean(os.path.join(base, "state")),
                            cfg)
        save_resolution_state(res, state_dir + ".tmp")
        os.rename(state_dir + ".tmp", state_dir)
        state_build = round(time.time() - t0, 2)
        print(f"# state built in {state_build}s: {state_dir}",
              file=sys.stderr)

    # ---- the timed attach (update_state=False → idempotent runs)
    t0 = time.time()
    inc = read_parquet_clean(os.path.join(base, "inc"))
    out = resolve_increment(inc, state_dir, cfg, update_state=False)

    def _ck(batch: pa.Table) -> pa.Table:
        a = batch["row_id"].to_numpy().astype(np.uint64)
        b = batch["cluster_id"].to_numpy().astype(np.uint64)
        v = (a * np.uint64(0x9E3779B97F4A7C15)) ^ b
        acc = np.bitwise_xor.reduce(v) if len(v) else np.uint64(0)
        import pyarrow.compute as pc

        return pa.table({
            "x": pa.array([int(acc)], pa.uint64()),
            "n": pa.array([batch.num_rows], pa.int64()),
            "m": pa.array([int(pc.sum(batch["matched_existing"]).as_py()
                               or 0)], pa.int64())})

    parts = out.map_batches(_ck, batch_format="pyarrow").to_pandas()
    checksum = 0
    for x in parts["x"]:
        checksum ^= int(x)
    total_s = round(time.time() - t0, 2)

    spill = {"spilled_mib": 0, "spilled_objects": 0}
    try:
        import re as _re

        from ray._private.internal_api import memory_summary
        m = _re.search(r"Spilled (\d+) MiB, (\d+) objects",
                       memory_summary(stats_only=True))
        if m:
            spill = {"spilled_mib": int(m.group(1)),
                     "spilled_objects": int(m.group(2))}
    except Exception:
        pass
    print(json.dumps({
        "cpus": args.cpus, "state_rows": args.state_rows,
        "inc_rows": args.inc_rows, "n_out": int(parts["n"].sum()),
        "matched_existing": int(parts["m"].sum()),
        "checksum": f"{checksum:016x}", "total": total_s,
        "state_build": state_build,
        "object_store_gb": args.object_store_gb or None, **spill}))
    ray.shutdown()


if __name__ == "__main__":
    main()
