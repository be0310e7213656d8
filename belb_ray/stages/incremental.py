"""Incremental (cross-run) exact deduplication against persisted state.

The streaming-ingest shape: each run receives a NEW batch of documents
and must drop (a) rows whose content was already accepted by ANY earlier
run and (b) within-batch duplicates (keep-first by smallest id), then
record the survivors' content hashes so the next run sees them. State is
an append-only directory of parquet shards (one per run — the same
append-only registry pattern as pipelines/outputs.py; a crashed run
leaves prior shards untouched and simply re-appends).

Distributed shape: content hashes are md5 hex (engine-portable — the SQL
oracle re-derives them with ``md5(text)``), state hashes and the tagged
new batch co-locate with ONE hash-bucket shuffle, and each bucket
resolves seen-membership + keep-first vectorized. The state side ships
only its hash column, never documents.
"""

from __future__ import annotations

import glob
import hashlib
import os
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def _content_md5(col: pa.ChunkedArray | pa.Array) -> list[str]:
    md5 = hashlib.md5
    return [md5(("" if v is None else v).encode()).hexdigest()
            for v in col.to_pylist()]


def dedup_against_state(new_docs: rd.Dataset, state_dir: str,
                        id_col: str = "doc_id", content_col: str = "text",
                        num_buckets: int = 64,
                        update_state: bool = True) -> rd.Dataset:
    """Rows of ``new_docs`` that survive cross-run + within-batch exact
    dedup; survivors' hashes are appended to ``state_dir`` as a new
    shard when ``update_state``."""

    def _hash_new(batch: pa.Table) -> pa.Table:
        h = pa.array(_content_md5(batch[content_col]), pa.string())
        return batch.append_column("__h", h)

    hashed = new_docs.map_batches(_hash_new, batch_format="pyarrow")

    shards = sorted(glob.glob(os.path.join(state_dir, "run-*",
                                           "*.parquet")))
    cols = list(new_docs.schema().names)

    def _tag(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            out = {}
            for c in cols + ["__h"]:
                out[c] = (batch[c] if c in batch.column_names
                          else pa.nulls(n, pa.string() if c == content_col
                                        else pa.int64()))
            out["__side"] = pa.array(np.full(n, side, np.int8))
            return pa.table(out)
        return fn

    both = hashed.map_batches(_tag(1), batch_format="pyarrow")
    if shards:
        seen = rd.read_parquet(shards, columns=["__h"])
        both = both.union(seen.map_batches(_tag(0), batch_format="pyarrow"))

    def _bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        hv = pd.util.hash_array(batch["__h"].to_numpy(), categorize=False)
        batch["__bucket"] = (hv % np.uint64(num_buckets)).astype(np.int32)
        return batch

    int_cols = [c for c, t in zip(new_docs.schema().names,
                                  new_docs.schema().types)
                if pa.types.is_integer(t)]

    def _resolve(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop(columns="__bucket")
        seen_h = set(g.loc[g["__side"] == 0, "__h"])
        new = g[g["__side"] == 1]
        new = new[~new["__h"].isin(seen_h)]
        # keep-first within the batch: smallest id per content hash
        new = new.sort_values([id_col], kind="mergesort")
        new = new[~new["__h"].duplicated(keep="first")].copy()
        # the state side's null-filled rows float-ified integer columns
        # in the pandas union block; survivors have no nulls — restore
        for c in int_cols:
            new[c] = new[c].astype(np.int64)
        return new.drop(columns="__side")

    survivors = (both.map_batches(_bucketize, batch_format="pandas")
                 .groupby("__bucket")
                 .map_groups(_resolve, batch_format="pandas"))

    if update_state:
        # materialize: survivors feed BOTH the state write and the
        # returned dataset; lazily each consumer would re-run the shuffle
        survivors = survivors.materialize()
        runs = sorted(glob.glob(os.path.join(state_dir, "run-*")))
        shard_dir = os.path.join(
            state_dir, f"run-{len(runs):06d}-{int(time.time())}")
        # distributed write — survivor hashes never collect on the driver
        survivors.select_columns(["__h"]).write_parquet(shard_dir)

    return survivors.drop_columns(["__h"])
