"""Final output writer: partitioned Parquet shards + lineage manifest.

The north rule requires resumable, partitioned outputs — never one giant
file. ``write_er_outputs`` writes each result table of the ER pipeline
into its own shard directory (Ray writes one file per block), records a
manifest (config hash, row counts, schema) per table, and skips tables
whose manifest already matches (the reference's skip-if-exists resume,
belb/kbs/kb.py:226-233 — SURVEY §4 resume row).
"""

from __future__ import annotations

import json
import os

import ray.data as rd

from .checkpoint import config_hash


def write_er_outputs(results: dict[str, rd.Dataset], out_dir: str,
                     config: dict, tables: tuple = ("clusters", "edges",
                                                    "members")) -> dict:
    """Write selected result Datasets as partitioned parquet shard dirs
    under ``out_dir`` with one manifest per table; skip tables already
    written under the same config hash. Returns the run manifest."""
    chash = config_hash(config)
    run_manifest: dict = {"config_hash": chash, "tables": {}}
    os.makedirs(out_dir, exist_ok=True)

    for name in tables:
        ds = results[name]
        tdir = os.path.join(out_dir, name)
        man_path = os.path.join(tdir, "manifest.json")
        if os.path.exists(man_path):
            with open(man_path) as f:
                man = json.load(f)
            if man.get("config_hash") == chash:
                run_manifest["tables"][name] = {**man, "skipped": True}
                continue
        tmp = tdir + ".tmp"
        if os.path.exists(tmp):
            import shutil

            shutil.rmtree(tmp)
        os.makedirs(os.path.join(tmp, "data"))
        ds.write_parquet(os.path.join(tmp, "data"))
        written = rd.read_parquet(os.path.join(tmp, "data"))
        man = {
            "config_hash": chash,
            "rows": written.count(),
            "schema": {n: str(t) for n, t in
                       zip(written.schema().names, written.schema().types)},
        }
        with open(os.path.join(tmp, "manifest.json"), "w") as f:
            json.dump(man, f, indent=1)
        if os.path.exists(tdir):
            import shutil

            shutil.rmtree(tdir)
        os.rename(tmp, tdir)
        run_manifest["tables"][name] = man

    with open(os.path.join(out_dir, "run_manifest.json"), "w") as f:
        json.dump(run_manifest, f, indent=1)
    return run_manifest
