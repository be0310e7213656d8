"""Per-partition checkpoint shards + lineage manifests.

Replays the reference's resume machinery — skip-if-output-exists per
table, sentinel ``status.json``, download-history cache
(belb/kbs/kb.py:226-233,366-392; belb/corpora/corpus.py:224-239;
belb/utils/pubtator_central.py:197-211 — SURVEY §4 resume row) — in the
shape the north rule requires: a stage writes partitioned Parquet into a
directory plus ``manifest.json`` carrying the config hash, row count and
input lineage; a rerun with the same config hash reads the shards back
instead of recomputing. Output directories are written to a temp name and
renamed, so a crashed write never looks complete.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
from typing import Any, Callable

import ray.data as rd

from belb_ray.sources.readers import read_parquet_clean

MANIFEST = "manifest.json"


def config_hash(config: dict[str, Any]) -> str:
    """Stable hexdigest of a config dict — the reference's frozen-config
    hexdigest that versions every output directory
    (belb/utils/__init__.py:285-334 — SURVEY §1.3)."""
    blob = json.dumps(config, sort_keys=True, default=str).encode()
    return hashlib.sha256(blob).hexdigest()[:16]


def checkpoint_stage(
    factory: Callable[[], rd.Dataset],
    path: str,
    config: dict[str, Any],
    lineage: dict[str, Any] | None = None,
) -> rd.Dataset:
    """Compute-or-load a stage result.

    If ``path/manifest.json`` exists with a matching config hash, read the
    shards (skip recompute). Otherwise run ``factory()``, write shards to
    ``path.tmp``, write the manifest, atomically rename."""
    chash = config_hash(config)
    man_path = os.path.join(path, MANIFEST)
    if os.path.exists(man_path):
        with open(man_path) as f:
            man = json.load(f)
        if man.get("config_hash") == chash:
            return read_parquet_clean(os.path.join(path, "data"))
        shutil.rmtree(path)

    tmp = path + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(os.path.join(tmp, "data"), exist_ok=True)
    ds = factory()
    ds.write_parquet(os.path.join(tmp, "data"))
    rows = read_parquet_clean(os.path.join(tmp, "data")).count()
    manifest = {
        "config_hash": chash,
        "config": {k: str(v) for k, v in config.items()},
        "rows": rows,
        "lineage": lineage or {},
    }
    with open(os.path.join(tmp, MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1)
    if os.path.exists(path):
        shutil.rmtree(path)
    os.rename(tmp, path)
    return read_parquet_clean(os.path.join(path, "data"))


def read_manifest(path: str) -> dict | None:
    man_path = os.path.join(path, MANIFEST)
    if not os.path.exists(man_path):
        return None
    with open(man_path) as f:
        return json.load(f)
