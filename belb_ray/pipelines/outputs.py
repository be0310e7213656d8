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

from belb_ray.sources.readers import read_parquet_clean


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
        written = read_parquet_clean(os.path.join(tmp, "data"))
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


def export_json_corpus(ds: rd.Dataset, out_dir: str,
                       config: dict | None = None) -> dict:
    """K2: JSON interchange export — the reference persists corpora as
    BioC JSON collections (belb/corpora/corpus.py:171-180,
    ``biocjson.dump(..., ensure_ascii=False)``); Parquet stays this
    repo's at-scale format, this is the round-trippable interchange
    twin. Writes newline-delimited JSON shards (one file per block,
    UTF-8, non-ASCII preserved) plus a manifest; ``ray.data.read_json``
    on the directory's data dir reproduces the dataset exactly (pinned
    by ``test_json_corpus_roundtrip``).

    Row count for the manifest comes from a driver-side line count of
    the written shards — streaming file IO, no second Ray execution."""
    data_dir = os.path.join(out_dir, "data")
    os.makedirs(data_dir, exist_ok=True)
    ds.write_json(data_dir, force_ascii=False)
    rows = 0
    files = sorted(f for f in os.listdir(data_dir)
                   if f.endswith(".json"))
    for f in files:
        with open(os.path.join(data_dir, f), encoding="utf-8") as fh:
            rows += sum(1 for line in fh if line.strip())
    man = {"config_hash": config_hash(config or {}), "rows": rows,
           "files": len(files), "format": "jsonl"}
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(man, f, indent=1)
    return man


def resumable_partitioned_write(ds: rd.Dataset, out_dir: str,
                                part_col: str, config: dict) -> dict:
    """Per-PARTITION resumable Parquet export — the granularity the
    100-TB design point needs: a failed run re-writes only the
    partitions whose completion manifest is missing or was written
    under a different config hash, never the whole table.

    Layout: hive dirs ``out_dir/<part_col>=<value>/*.parquet`` plus
    ``out_dir/_manifests/<value>.json`` (config hash, rows). The
    underscore-prefixed manifest dir is ignored by pyarrow dataset
    discovery, so ``read_parquet(out_dir)`` reads the data cleanly.

    Shape: completed partition VALUES broadcast once; the missing-rows
    filter and the hive-partitioned write both stream (no driver
    collect, no materialize); per-partition row counts come from the
    written files' parquet footers (metadata only). Each partition dir
    is renamed into place atomically BEFORE its manifest is written, so
    a crash leaves completed partitions intact and at worst one
    partition to re-write. Returns
    ``{"written": {value: rows}, "skipped": {value: rows}}``."""
    import shutil

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    chash = config_hash(config)

    # the resume skip-mask compares numpy str() values against manifest
    # values parsed back from hive DIR NAMES; the two stringifications
    # agree only for string and integer columns (floats: '0.5' vs
    # '0.50'; bools: 'True' vs 'true') — fail loudly rather than
    # silently re-write or mask out rows
    schema = ds.schema()
    ptype = dict(zip(schema.names, schema.types)).get(part_col)
    _ok = False
    if isinstance(ptype, pa.DataType):
        _ok = (pa.types.is_string(ptype) or pa.types.is_large_string(ptype)
               or pa.types.is_integer(ptype))
    elif ptype is not None:  # pandas-block schema: numpy dtype / class
        _ok = (ptype is str or ptype is object
               or np.issubdtype(np.dtype(ptype), np.integer))
    if not _ok:
        raise TypeError(
            f"resumable_partitioned_write: part_col {part_col!r} has type "
            f"{ptype} — only string/int partition columns round-trip "
            "through hive dir names canonically; cast first")

    man_dir = os.path.join(out_dir, "_manifests")
    os.makedirs(man_dir, exist_ok=True)

    skipped: dict = {}
    for f in os.listdir(man_dir):
        if not f.endswith(".json"):
            continue
        with open(os.path.join(man_dir, f)) as fh:
            man = json.load(fh)
        part_path = os.path.join(out_dir, f"{part_col}={man['value']}")
        if man.get("config_hash") == chash and os.path.isdir(part_path):
            skipped[str(man["value"])] = man["rows"]

    done_ref = ray.put(set(skipped))

    def _mask(batch: pa.Table) -> pa.Table:
        done = ray.get(done_ref)
        if not done:
            return batch
        vals = batch[part_col].to_numpy(zero_copy_only=False)
        keep = ~np.isin(vals.astype(str), list(done))
        return batch.filter(pa.array(keep))

    tmp = os.path.join(out_dir, f".tmp-{chash}")
    shutil.rmtree(tmp, ignore_errors=True)
    missing = ds.map_batches(_mask, batch_format="pyarrow")
    missing.write_parquet(tmp, partition_cols=[part_col])

    written: dict = {}
    prefix = f"{part_col}="
    for d in sorted(os.listdir(tmp)) if os.path.isdir(tmp) else []:
        if not d.startswith(prefix):
            continue
        value = d[len(prefix):]
        rows = 0
        src = os.path.join(tmp, d)
        for f in os.listdir(src):
            if f.endswith(".parquet"):
                rows += pq.ParquetFile(os.path.join(src, f)).metadata.num_rows
        dst = os.path.join(out_dir, d)
        shutil.rmtree(dst, ignore_errors=True)
        os.rename(src, dst)  # data in place BEFORE the manifest
        with open(os.path.join(man_dir, f"{value}.json"), "w") as fh:
            json.dump({"config_hash": chash, "value": value,
                       "rows": rows}, fh)
        written[value] = rows
    shutil.rmtree(tmp, ignore_errors=True)
    return {"written": written, "skipped": skipped}
