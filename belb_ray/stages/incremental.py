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

from belb_ray.sources.readers import read_parquet_clean
from belb_ray.util import resolve_num_buckets


def _content_md5(col: pa.ChunkedArray | pa.Array) -> list[str]:
    md5 = hashlib.md5
    return [md5(("" if v is None else v).encode()).hexdigest()
            for v in col.to_pylist()]


def dedup_against_state(new_docs: rd.Dataset, state_dir: str,
                        id_col: str = "doc_id", content_col: str = "text",
                        num_buckets: int = 0,
                        update_state: bool = True) -> rd.Dataset:
    """Rows of ``new_docs`` that survive cross-run + within-batch exact
    dedup; survivors' hashes are appended to ``state_dir`` as a new
    shard when ``update_state``."""
    num_buckets = resolve_num_buckets(num_buckets)

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
        seen = read_parquet_clean(shards, columns=["__h"])
        both = both.union(seen.map_batches(_tag(0), batch_format="pyarrow"))

    def _bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        hv = pd.util.hash_array(batch["__h"].to_numpy(), categorize=False)
        batch["__bucket"] = (hv % np.uint64(num_buckets)).astype(np.int32)
        return batch

    def _is_int_type(t) -> bool:
        # pandas-block datasets report numpy dtypes here, arrow-block
        # ones report pa.DataType — accept both
        if isinstance(t, pa.DataType):
            return pa.types.is_integer(t)
        try:
            return np.issubdtype(t, np.integer)
        except TypeError:
            return False

    int_cols = [c for c, t in zip(new_docs.schema().names,
                                  new_docs.schema().types)
                if _is_int_type(t)]

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


def neardup_against_state(new_docs: rd.Dataset, state_dir: str,
                          threshold: float = 0.5, num_perm: int = 128,
                          bands: int = 32, shingle_k: int = 3,
                          seed: int = 7, id_col: str = "doc_id",
                          text_col: str = "text", num_buckets: int = 0,
                          update_state: bool = True,
                          broadcast_threshold: int = 2_000_000) -> rd.Dataset:
    """Cross-run NEAR-duplicate dedup against persisted MinHash state —
    the streaming-ingest completion of the flagship's LSH machinery.

    A new row is dropped when LSH banding pairs it with (a) any doc a
    previous run accepted or (b) a smaller-id doc of the same batch, and
    the signature-estimated Jaccard clears ``threshold``. The in-batch
    rule is "drops if similar to ANY smaller-id batch doc" (regardless
    of that doc's own fate) — deterministic without iteration; the
    golden oracle mirrors it exactly. Ids must be unique across runs.

    State = two append-only parquet families under ``state_dir``:
    ``bands/run-*`` (band_key, rid — what candidate generation joins
    against) and ``sigs/run-*`` (rid, sig — what verification reads).
    Shapes: candidate generation is ONE band-key co-location shuffle
    (state ships band rows, never signatures or text); verification
    attaches signatures to the candidate sliver via the size-guarded
    broadcast/hash join; recall is the LSH band guarantee (<1, same as
    the flagship; raise ``bands`` for higher recall)."""
    num_buckets = resolve_num_buckets(num_buckets)
    from ..functions.minhash import band_keys, est_jaccard, sig_matrix
    from ..pipelines.docdedup import _doc_features
    from .analytic import _attach_small
    from .joins import semi_join

    feats = _doc_features(new_docs, num_perm, shingle_k, seed,
                          id_col, text_col,
                          keep_shingles=False).materialize()

    def _bands(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table({"band_key": pa.array([], pa.int64()),
                             "rid": pa.array([], pa.int64())})
        keys = band_keys(sig_matrix(batch["sig"]), bands)
        rids = batch["row_id"].to_numpy()
        return pa.table({
            "band_key": pa.array(keys.ravel(), pa.int64()),
            "rid": pa.array(np.repeat(rids, bands), pa.int64()),
        })

    new_bands = feats.map_batches(_bands, batch_format="pyarrow")

    band_shards = sorted(glob.glob(
        os.path.join(state_dir, "bands", "run-*", "*.parquet")))
    sig_shards = sorted(glob.glob(
        os.path.join(state_dir, "sigs", "run-*", "*.parquet")))

    def _tag(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                "__side", pa.array(np.full(batch.num_rows, side, np.int8)))
        return fn

    both = new_bands.map_batches(_tag(1), batch_format="pyarrow")
    if band_shards:
        both = both.union(read_parquet_clean(band_shards).map_batches(
            _tag(0), batch_format="pyarrow"))

    def _bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_array(batch["band_key"].to_numpy(),
                               categorize=False)
        batch["__bucket"] = (h % np.uint64(num_buckets)).astype(np.int32)
        return batch

    def _pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop(columns="__bucket")
        new = g.loc[g["__side"] == 1, ["band_key", "rid"]]
        old = g.loc[g["__side"] == 0, ["band_key", "rid"]]
        cross = new.merge(old, on="band_key", suffixes=("", "_o"))
        nn = new.merge(new, on="band_key", suffixes=("", "_o"))
        nn = nn[nn["rid"] > nn["rid_o"]]
        pairs = pd.concat([cross, nn], ignore_index=True)
        pairs = pairs[["rid", "rid_o"]].drop_duplicates()
        return pairs.rename(columns={"rid": "new_id",
                                     "rid_o": "other_id"})

    cands = (both.map_batches(_bucketize, batch_format="pandas")
             .groupby("__bucket")
             .map_groups(_pairs, batch_format="pandas"))

    sigs_all = feats.map_batches(
        lambda t: pa.table({"rid": t["row_id"], "sig": t["sig"]}),
        batch_format="pyarrow")
    if sig_shards:
        sigs_all = sigs_all.union(read_parquet_clean(sig_shards))

    new_keyed = sigs_all.map_batches(
        lambda t: pa.table({"new_id": t["rid"], "sig": t["sig"]}),
        batch_format="pyarrow")
    other_keyed = sigs_all.map_batches(
        lambda t: pa.table({"other_id": t["rid"], "sig": t["sig"]}),
        batch_format="pyarrow")
    withsig = _attach_small(cands, new_keyed, "new_id",
                            broadcast_threshold)
    withsig = _attach_small(withsig, other_keyed, "other_id",
                            broadcast_threshold)

    def _verify(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64())})
        a = sig_matrix(batch["sig"], num_perm)
        b = sig_matrix(batch["sig_r"], num_perm)
        hit = est_jaccard(a, b) >= threshold
        ids = batch["new_id"].to_numpy(zero_copy_only=False)[hit]
        return pa.table({id_col: pa.array(np.unique(ids), pa.int64())})

    dropped = withsig.map_batches(_verify, batch_format="pyarrow")
    survivors = semi_join(new_docs, dropped, key=id_col, anti=True,
                          broadcast_threshold=broadcast_threshold,
                          num_buckets=num_buckets).materialize()

    if update_state:
        keep = survivors.select_columns([id_col]).map_batches(
            lambda t: t.rename_columns(["row_id"]), batch_format="pyarrow")
        feats_s = semi_join(feats, keep, key="row_id",
                            broadcast_threshold=broadcast_threshold,
                            num_buckets=num_buckets).materialize()
        runs = sorted(glob.glob(os.path.join(state_dir, "bands", "run-*")))
        tag = f"run-{len(runs):06d}-{int(time.time())}"
        feats_s.map_batches(_bands, batch_format="pyarrow").write_parquet(
            os.path.join(state_dir, "bands", tag))
        feats_s.map_batches(
            lambda t: pa.table({"rid": t["row_id"], "sig": t["sig"]}),
            batch_format="pyarrow").write_parquet(
            os.path.join(state_dir, "sigs", tag))

    return survivors


def compact_state(state_dir: str, num_buckets: int = 0) -> dict:
    """Merge an incremental-dedup state directory's append-only
    ``run-*`` shard families into ONE compacted run each.

    Append-only state (the crash-safe choice for ingest) accumulates one
    shard directory per run; after many runs every future
    ``*_against_state`` call pays a file-listing + small-file read tax.
    Compaction is the standard maintenance op (the reference's cache
    rebuild analog — belb/corpora/corpus.py re-materializes its caches
    wholesale): behavior-preserving by construction, because candidate
    generation only consumes the state's row SET, never its shard
    layout.

    Families handled (whichever exist):
    - exact-dedup hashes: ``state_dir/run-*`` (column ``__h``) —
      compacted to distinct hashes;
    - near-dup band keys: ``state_dir/bands/run-*`` (band_key, rid) —
      distinct rows;
    - near-dup signatures: ``state_dir/sigs/run-*`` (rid, sig) —
      keep-first per rid (ids are unique across runs, so duplicates
      only arise from crashed re-appends; any copy carries the same
      signature);
    - ER resolution state (pipelines/er.save_resolution_state /
      resolve_increment): ``state_dir/features/run-*`` keep-first per
      row_id and ``state_dir/clusters/run-*`` keep-first per row_id
      (a row's assignment never mutates across runs, so any copy
      agrees; keep-first is crash-re-append hygiene).

    Distributed shape: each family is one bucketed dedup shuffle and a
    distributed parquet rewrite — nothing collects on the driver. The
    swap is remove-then-rename (single maintenance writer assumed; do
    not run concurrently with ingest). Returns
    ``{family: compacted_row_count}``.
    """
    num_buckets = resolve_num_buckets(num_buckets)
    import shutil

    def _distinct(ds: rd.Dataset, keys: list[str]) -> rd.Dataset:
        def _bucketize(batch: pd.DataFrame) -> pd.DataFrame:
            h = np.zeros(len(batch), dtype=np.uint64)
            for k in keys:
                h = h * np.uint64(0x100000001B3) + pd.util.hash_array(
                    batch[k].to_numpy(), categorize=False)
            batch["__bucket"] = (h % np.uint64(num_buckets)).astype(
                np.int32)
            return batch

        def _dedup(group: pd.DataFrame) -> pd.DataFrame:
            g = group.drop(columns="__bucket")
            g = g.sort_values(keys, kind="mergesort")
            return g[~g.duplicated(keys, keep="first")]

        return (ds.map_batches(_bucketize, batch_format="pandas")
                .groupby("__bucket")
                .map_groups(_dedup, batch_format="pandas"))

    families = {
        "exact": (state_dir, ["__h"]),
        "bands": (os.path.join(state_dir, "bands"), ["band_key", "rid"]),
        "sigs": (os.path.join(state_dir, "sigs"), ["rid"]),
        "features": (os.path.join(state_dir, "features"), ["row_id"]),
        "clusters": (os.path.join(state_dir, "clusters"), ["row_id"]),
    }
    out: dict = {}
    for fam, (root, keys) in families.items():
        run_dirs = sorted(glob.glob(os.path.join(root, "run-*")))
        shards = sorted(glob.glob(os.path.join(root, "run-*",
                                               "*.parquet")))
        if not shards:
            continue
        src = read_parquet_clean(shards)
        schema = src.schema()
        names, types = list(schema.names), list(schema.types)

        def _restore(t: pa.Table, _n=names, _t=types) -> pa.Table:
            # the bucketed dedup round-trips through pandas, which drops
            # Arrow extension widths (fixed_size_binary -> binary);
            # re-cast to the shard schema so readers' unions stay aligned
            return pa.table({c: t[c].cast(ty)
                             for c, ty in zip(_n, _t)})

        compacted = (_distinct(src, keys)
                     .map_batches(_restore, batch_format="pyarrow")
                     .materialize())
        tag = int(time.time())
        tmp = os.path.join(root, f"compact-tmp-{tag}")  # not run-*
        compacted.write_parquet(tmp)
        for d in run_dirs:
            shutil.rmtree(d)
        os.rename(tmp, os.path.join(root, f"run-000000-compacted-{tag}"))
        out[fam] = compacted.count()
    return out


def prune_state(state_dir: str, keep_last: int) -> dict:
    """Retention GC for an incremental-dedup state directory: keep only
    the NEWEST ``keep_last`` append-only ``run-*`` shard directories of
    each family (exact hashes at ``state_dir/run-*``, near-dup
    ``bands/run-*`` and ``sigs/run-*``), deleting older runs.

    This is the retention-window semantics, not a space-only
    optimization: after pruning, ``*_against_state`` deduplicates
    against the kept runs ONLY — a document whose sole witness was in a
    pruned run is admitted again ("only dedup against the last N
    ingests/days"). ``compact_state`` is the behavior-PRESERVING
    sibling; this one deliberately forgets. Bands and sigs prune in
    lockstep (each near-dup ingest appends one run to both families).
    Single maintenance writer assumed. Returns
    ``{family: n_runs_removed}``."""
    import glob as _glob
    import os as _os
    import shutil as _shutil

    if keep_last < 0:
        raise ValueError("keep_last must be >= 0")
    removed: dict[str, int] = {}
    for family, pattern in (
            ("exact", _os.path.join(state_dir, "run-*")),
            ("bands", _os.path.join(state_dir, "bands", "run-*")),
            ("sigs", _os.path.join(state_dir, "sigs", "run-*"))):
        runs = sorted(_glob.glob(pattern))
        drop = runs[:-keep_last] if keep_last else runs
        for d in drop:
            _shutil.rmtree(d)
        if runs:
            removed[family] = len(drop)
    return removed
