"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry at a given sf_dir, run the matching ``oracle_sql()``
in DuckDB over the same parquet views, compare row count + column names +
order-insensitive value hash. Usage:

    python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd
import ray

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data as rd

    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].astype(str)
    rows = sorted(df.apply("|".join, axis=1).tolist()) if len(df) else []
    import hashlib

    return hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)

    # golden oracles are per-sf files: point oracle_sql() at the tag
    # matching this run's inputs (goldens/<name>.<tag>.parquet — run
    # tools/make_goldens.py --sf-dir <sf_dir> first for a non-default sf)
    import os

    tag = "sf" + sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    os.environ.setdefault("BELB_RAY_GOLDEN_SF", tag)

    sys.path.insert(0, ".")
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            mine = to_pandas(fn(sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: query raised {type(e).__name__}: {e}")
            failures.append(name)
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(mine)} rows, cols={sorted(mine.columns)}"
                  f" ({dt:.1f}s) [rows-only]")
            if len(mine) == 0:
                failures.append(name)
            continue
        try:
            gold = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: oracle raised {e}")
            failures.append(name)
            continue
        ok_rows = len(mine) == len(gold)
        ok_cols = sorted(mine.columns) == sorted(gold.columns)
        ok_hash = ok_cols and value_hash(mine) == value_hash(gold)
        status = "OK   " if (ok_rows and ok_cols and ok_hash) else "FAIL "
        print(f"{status}{name}: rows {len(mine)}/{len(gold)} cols_ok={ok_cols} "
              f"hash_ok={ok_hash} ({dt:.1f}s)")
        if not (ok_rows and ok_cols and ok_hash):
            failures.append(name)
            if ok_cols and len(mine) and len(gold):
                m = mine[sorted(mine.columns)].astype(str)
                g = gold[sorted(gold.columns)].astype(str)
                ms = set(map(tuple, m.values.tolist()))
                gs = set(map(tuple, g.values.tolist()))
                print(f"   only-mine({len(ms - gs)}): {list(ms - gs)[:3]}")
                print(f"   only-gold({len(gs - ms)}): {list(gs - ms)[:3]}")
    print(f"\n{len(failures)} failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
