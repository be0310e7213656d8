"""Scale-stress campaign driver (VERDICT r3 #1/#7): ER flagship at 4M/8M
rows, scaling efficiency, spill behavior, and a real SIGKILL mid-`edges`
kill/resume probe — all in fresh subprocesses, results as JSON lines.

Stages (pick with --stage, default runs all):
  gen      ensure the sharded fixture at --rows exists (/tmp cache)
  perf     min-of-N fresh-process profile_er runs at each CPU level
  spill    one run with a capped object store (--object-store-gb)
  resume   clean checkpointed run → SIGKILL a second run mid-`edges`
           → resume → checksums must match

Usage:
  python tools/scale_campaign.py --rows 4000000 --cpu-levels 4,16 --trials 2
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import signal
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def sh(cmd: list[str], **kw) -> str:
    out = subprocess.run(cmd, capture_output=True, text=True, **kw)
    if out.returncode != 0:
        raise RuntimeError(f"{cmd} failed:\n{out.stdout}\n{out.stderr}")
    return out.stdout


def last_json(stdout: str) -> dict:
    for line in reversed(stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise ValueError(f"no JSON line in output:\n{stdout[-2000:]}")


def ensure_fixture(rows: int) -> None:
    path = f"/tmp/belb_ray_scaling_{rows}"
    if os.path.exists(path):
        print(f"# fixture exists: {path}", file=sys.stderr)
        return
    t0 = time.time()
    sys.path.insert(0, REPO)
    import pyarrow.parquet as pq

    from belb_ray.sources.synthetic import make_fixture

    tbl = make_fixture(n_files=rows, seed=42)["files"]
    os.makedirs(path + ".tmp", exist_ok=True)
    shards = 64
    per = (tbl.num_rows + shards - 1) // shards
    for i in range(shards):
        pq.write_table(tbl.slice(i * per, per),
                       f"{path}.tmp/part-{i:04d}.parquet")
    os.rename(path + ".tmp", path)
    print(f"# fixture generated in {time.time()-t0:.0f}s: {path}",
          file=sys.stderr)


def perf(rows: int, cpu_levels: list[int], trials: int) -> dict:
    res: dict = {"rows": rows, "levels": {}}
    for cpus in cpu_levels:
        best = None
        for t in range(trials):
            out = sh([sys.executable, f"{HERE}/profile_er.py",
                      "--cpus", str(cpus), "--rows", str(rows)])
            j = last_json(out)
            print(json.dumps({"trial": t, **j}), flush=True)
            if best is None or j["total"] < best["total"]:
                best = j
        best["throughput_rows_s"] = round(rows / best["total"], 1)
        res["levels"][cpus] = best
    lv = sorted(res["levels"])
    if len(lv) >= 2:
        lo, hi = lv[0], lv[-1]
        s = (res["levels"][hi]["throughput_rows_s"]
             / res["levels"][lo]["throughput_rows_s"])
        res["scaling_efficiency"] = round(s / (hi / lo), 3)
    print(json.dumps({"perf": res}), flush=True)
    return res


def increment(state_rows: int, inc_rows: int, cpu_levels: list[int],
              trials: int) -> dict:
    """Campaign cell for the incremental-ER attach (VERDICT r4 #1):
    fresh-process `profile_increment` runs at each CPU level over a
    cached state; checksums must agree across every run and level."""
    # warm run builds the fixture + state caches if missing (its attach
    # timing is discarded — the cache build contends with it)
    warm = sh([sys.executable, f"{HERE}/profile_increment.py",
               "--cpus", str(max(cpu_levels)),
               "--state-rows", str(state_rows),
               "--inc-rows", str(inc_rows)])
    wj = last_json(warm)
    print(json.dumps({"warm": wj}), flush=True)

    res: dict = {"state_rows": state_rows, "inc_rows": inc_rows,
                 "levels": {}}
    checksums = {wj["checksum"]}
    for cpus in cpu_levels:
        best = None
        for t in range(trials):
            j = last_json(sh([sys.executable,
                              f"{HERE}/profile_increment.py",
                              "--cpus", str(cpus),
                              "--state-rows", str(state_rows),
                              "--inc-rows", str(inc_rows)]))
            print(json.dumps({"trial": t, **j}), flush=True)
            checksums.add(j["checksum"])
            if best is None or j["total"] < best["total"]:
                best = j
        best["throughput_rows_s"] = round(inc_rows / best["total"], 1)
        res["levels"][cpus] = best
    if len(checksums) != 1:
        raise SystemExit(f"INCREMENT CHECKSUM MISMATCH across runs: "
                         f"{sorted(checksums)}")
    res["checksum_stable"] = True
    lv = sorted(res["levels"])
    if len(lv) >= 2:
        lo, hi = lv[0], lv[-1]
        s = (res["levels"][hi]["throughput_rows_s"]
             / res["levels"][lo]["throughput_rows_s"])
        res["scaling_efficiency"] = round(s / (hi / lo), 3)
    print(json.dumps({"increment": res}), flush=True)
    return res


def fallbacks(rows: int, cpus: int) -> dict:
    """End-to-end exercise of BOTH size-guard fallbacks at natural row
    counts (VERDICT r4 #3): one default run (broadcast paths), one run
    with the dedup broadcast row cap AND the attach byte budget forced
    to 0 (partitioned-join dedup attach + fused-join feature attach).
    Cluster checksums must be identical — the fallbacks are alternative
    executions of the same semantics, not approximations."""
    base = last_json(sh([sys.executable, f"{HERE}/profile_er.py",
                         "--cpus", str(cpus), "--rows", str(rows)]))
    print(json.dumps({"broadcast_run": base}), flush=True)
    forced = last_json(sh([sys.executable, f"{HERE}/profile_er.py",
                           "--cpus", str(cpus), "--rows", str(rows),
                           "--dedup-broadcast-rows", "0",
                           "--attach-broadcast-bytes", "0"]))
    print(json.dumps({"fallback_run": forced}), flush=True)
    ok = forced["checksum"] == base["checksum"]
    result = {"fallbacks": {
        "rows": rows, "cpus": cpus,
        "broadcast_total": base["total"],
        "fallback_total": forced["total"],
        "fallback_spilled_mib": forced.get("spilled_mib", 0),
        "checksum": base["checksum"], "identical": ok}}
    print(json.dumps(result), flush=True)
    if not ok:
        raise SystemExit("FALLBACK CHECKSUM MISMATCH vs broadcast path")
    return result


def spill(rows: int, cpus: int, gb: float) -> dict:
    out = sh([sys.executable, f"{HERE}/profile_er.py", "--cpus", str(cpus),
              "--rows", str(rows), "--object-store-gb", str(gb)])
    j = last_json(out)
    print(json.dumps({"spill_run": j}), flush=True)
    return j


def kill_resume(rows: int, cpus: int) -> dict:
    ck_clean = f"/tmp/belb_er_ck_clean_{rows}"
    ck_kill = f"/tmp/belb_er_ck_kill_{rows}"
    for d in (ck_clean, ck_kill):
        if os.path.exists(d):
            shutil.rmtree(d)

    # 1. uninterrupted checkpointed run → reference checksum
    out = sh([sys.executable, f"{HERE}/er_run.py", "--rows", str(rows),
              "--cpus", str(cpus), "--checkpoint", ck_clean])
    ref = last_json(out)
    print(json.dumps({"clean_run": ref}), flush=True)

    # 2. second run, SIGKILL once edge shards start appearing in .tmp
    proc = subprocess.Popen(
        [sys.executable, f"{HERE}/er_run.py", "--rows", str(rows),
         "--cpus", str(cpus), "--checkpoint", ck_kill],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE)
    tmp_data = os.path.join(ck_kill, "edges.tmp", "data")
    killed_at = None
    t0 = time.time()
    while proc.poll() is None:
        n_shards = (len([f for f in os.listdir(tmp_data)
                         if f.endswith(".parquet")])
                    if os.path.isdir(tmp_data) else 0)
        if n_shards >= 1:
            time.sleep(0.3)  # let a few more shards land mid-write
            os.kill(proc.pid, signal.SIGKILL)
            killed_at = round(time.time() - t0, 2)
            break
        time.sleep(0.2)
    proc.wait()
    partial_shards = (len(os.listdir(tmp_data))
                      if os.path.isdir(tmp_data) else 0)
    if killed_at is None:
        raise RuntimeError(
            "run finished before any edge shard appeared — kill window "
            "missed; the edges stage is too fast at this rows/cpus")
    # the killed Ray session can leave a stale raylet; give the OS a beat
    time.sleep(3)

    # 3. resume from the partial state
    out = sh([sys.executable, f"{HERE}/er_run.py", "--rows", str(rows),
              "--cpus", str(cpus), "--checkpoint", ck_kill])
    resumed = last_json(out)
    ok = (resumed["checksum"] == ref["checksum"]
          and resumed["n_clustered"] == ref["n_clustered"])
    result = {"kill_resume": {
        "rows": rows, "killed_after_s": killed_at,
        "partial_shards_at_kill": partial_shards,
        "clean_checksum": ref["checksum"],
        "resumed_checksum": resumed["checksum"],
        "identical": ok}}
    print(json.dumps(result), flush=True)
    if not ok:
        raise SystemExit("RESUME MISMATCH — clusters differ after kill")
    for d in (ck_clean, ck_kill):
        shutil.rmtree(d, ignore_errors=True)
    return result


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=4_000_000)
    ap.add_argument("--cpu-levels", default="4,16")
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--spill-cpus", type=int, default=16)
    ap.add_argument("--object-store-gb", type=float, default=4.0)
    ap.add_argument("--resume-cpus", type=int, default=16)
    ap.add_argument("--inc-rows", type=int, default=1_000_000,
                    help="increment size for the `increment` stage "
                         "(state size = --rows)")
    ap.add_argument("--stage", default="all",
                    choices=["all", "gen", "perf", "spill", "resume",
                             "increment", "fallbacks"])
    args = ap.parse_args()

    levels = [int(x) for x in args.cpu_levels.split(",")]
    if args.stage != "increment":
        ensure_fixture(args.rows)
    if args.stage in ("all", "perf"):
        perf(args.rows, levels, args.trials)
    if args.stage in ("all", "spill"):
        spill(args.rows, args.spill_cpus, args.object_store_gb)
    if args.stage in ("all", "resume"):
        kill_resume(args.rows, args.resume_cpus)
    if args.stage == "increment":
        increment(args.rows, args.inc_rows, levels, args.trials)
    if args.stage == "fallbacks":
        fallbacks(args.rows, max(levels))


if __name__ == "__main__":
    main()
