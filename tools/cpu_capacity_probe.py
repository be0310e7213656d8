"""Host capacity probe: how many CPUs' worth of compute does this VM
actually deliver at k concurrent processes?

The sandbox VM advertises 32 logical CPUs but is co-tenant on a shared
host: delivered capacity fluctuates minute-to-minute and tops out well
below 32 (measured ~15-16x single-process throughput at 32 processes on
a pure-integer loop; memory-bandwidth-bound work saturates earlier).
Scaling-efficiency measurements between two ``num_cpus`` levels are only
meaningful when BOTH levels fit inside the host's real capacity — this
probe documents that capacity next to every recorded measurement.

Usage: python tools/cpu_capacity_probe.py [k ...]   (default: 1 8 16 32)
Prints one JSON line: {"levels": {k: total_reps_per_sec}, "effective_cpus": ...}
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time


def _work(q) -> None:
    t0 = time.monotonic()
    reps = 0
    while time.monotonic() - t0 < 5:
        s = 0
        for i in range(1_000_000):
            s += i * i
        reps += 1
    q.put(reps / (time.monotonic() - t0))


def measure(k: int) -> float:
    q = mp.Queue()
    procs = [mp.Process(target=_work, args=(q,)) for _ in range(k)]
    for p in procs:
        p.start()
    total = sum(q.get() for _ in procs)
    for p in procs:
        p.join()
    return total


def main() -> None:
    levels = [int(a) for a in sys.argv[1:]] or [1, 8, 16, 32]
    out = {}
    for k in levels:
        out[k] = round(measure(k), 2)
    base = out[levels[0]] / levels[0]
    print(json.dumps({
        "levels": out,
        "effective_cpus_at_max": round(out[levels[-1]] / base, 1),
    }))


if __name__ == "__main__":
    main()
