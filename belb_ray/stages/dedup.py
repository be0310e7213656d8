"""Exact deduplication by content hash.

The scale-critical pre-collapse (SURVEY §7.4): vendored files — the same
``content`` across thousands of repos — are the hot keys of this domain.
Collapsing exact duplicates to one representative BEFORE blocking/pair
generation turns the worst skewed block into a single row, exactly as the
reference dedups the KB before its homonym queries
(belb/kbs/kb.py:251-263 — SURVEY §2.6 A8).

Representative choice is ``min(row_id)`` — a total order, so every
partitioning reproduces the same representative (SURVEY §4 determinism).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..functions.hashing import sha256_hex_list, stable_id64_list
from ..util import resolve_num_buckets

# per-worker cache for the distributed (sharded) rep map of
# exact_dedup_annotate — one live map per worker process (zero-copy
# views into plasma; clearing on swap keeps old runs' shards unpinned)
_SHARD_MAP_CACHE: dict[str, tuple] = {}


def ensure_identity_columns(ds: rd.Dataset, id_cols=("repo", "path", "commit"),
                            content_col: str = "content") -> rd.Dataset:
    """Add ``row_id`` (stable blake2b-8 of the key fields) and
    ``content_sha256`` (the north-rule per-row invariant) if absent."""
    schema_names = ds.schema().names

    def _add(batch: pa.Table) -> pa.Table:
        if "row_id" not in batch.column_names:
            ids = stable_id64_list(*[batch[c].to_pylist() for c in id_cols])
            batch = batch.append_column("row_id", pa.array(ids, pa.int64()))
        if "content_sha256" not in batch.column_names:
            sha = sha256_hex_list(batch[content_col].to_pylist())
            batch = batch.append_column("content_sha256", pa.array(sha, pa.string()))
        return batch

    if "row_id" in schema_names and "content_sha256" in schema_names:
        return ds
    return ds.map_batches(_add, batch_format="pyarrow")


def exact_dedup_reps(ds: rd.Dataset, hash_col: str = "content_sha256",
                     id_col: str = "row_id") -> rd.Dataset:
    """(hash_col, rep_id): rep_id = min(id_col) per hash group, via the
    bucketed shuffle of ``exact_dedup_annotate`` (one int32 sort — Ray's
    native string-key aggregate measured ~50x slower)."""
    import pyarrow.compute as pc

    annotated = exact_dedup_annotate(ds.select_columns([hash_col, id_col]),
                                     hash_col=hash_col, id_col=id_col)
    return annotated.map_batches(
        lambda t: t.filter(pc.equal(t[id_col], t["rep_id"]))
        .select([hash_col, "rep_id"]),
        batch_format="pyarrow")


def exact_dedup_annotate(ds: rd.Dataset, hash_col: str = "content_sha256",
                         id_col: str = "row_id",
                         num_buckets: int = 0,
                         broadcast_rows: int = 50_000_000) -> rd.Dataset:
    """Append ``rep_id`` = min(id_col) among rows sharing ``hash_col``.

    Round-4 shape: the shuffle is NARROW — only (id, hash) rows bucket
    by hash(hash_col) and each bucket resolves its groups vectorized
    (np.unique + minimum.at); the resulting (id, rep_id) map (16 B/row)
    is broadcast once via ray.put and looked up per batch with
    np.searchsorted, so the WIDE payload columns (signatures, paths)
    never cross a shuffle at all. The previous design shuffled full
    rows; at 4M rows x ~1.2 KB features that one shuffle was ~70% of
    the 4-CPU campaign wall (BASELINE.md round-4 campaign).

    Map-attach strategy (round 5): while BOTH the row cap
    (``broadcast_rows``) and the byte budget (25% of plasma via
    `util.broadcast_byte_budget`, at 16 B/row) hold, the map is built
    on the driver (collect + argsort — a transient ~3x map-size driver
    spike, cheap at these sizes) and `ray.put` once. Past either limit
    the map is built DISTRIBUTED instead: one narrow 16 B/row sort by
    id, the sorted shards stay in plasma (`to_arrow_refs`, zero-copy),
    and the attach does a two-level searchsorted (shard-starts, then
    within-shard). No driver transient at any size, and the wide
    payload columns never shuffle. (The previous fallback joined the
    WIDE rows against the map; at 4M rows x 1.2 KB the padded union
    deadlocked the streaming executor's object-store budget — zero
    tasks dispatched, scheduler spinning — measured round 5.) Either
    path is bounded by per-node plasma holding the 16 B/row map —
    past ~25% of plasma, shard the corpus into campaigns (SCALE.md)."""
    import pandas as pd

    from ..util import broadcast_byte_budget, resolve_num_buckets

    num_buckets = resolve_num_buckets(num_buckets)

    def _bucketize(batch: pa.Table) -> pa.Table:
        import numpy as np

        vals = batch[hash_col].to_numpy(zero_copy_only=False)
        h = pd.util.hash_array(vals, categorize=False)
        return pa.table({
            id_col: batch[id_col],
            hash_col: batch[hash_col],
            "__bucket": pa.array((h % np.uint64(num_buckets)).astype("int32")),
        })

    def _resolve(group: pa.Table) -> pa.Table:
        import numpy as np

        sha = np.asarray(group[hash_col].to_pylist())
        ids = group[id_col].to_numpy()
        uniq, inv = np.unique(sha, return_inverse=True)
        mins = np.full(len(uniq), np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(mins, inv, ids)
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "rep_id": pa.array(mins[inv], pa.int64())})

    rep = (ds.map_batches(_bucketize, batch_format="pyarrow")
           .groupby("__bucket").map_groups(_resolve, batch_format="pyarrow")
           ).materialize()

    import ray

    n_rep = rep.count()
    if n_rep <= broadcast_rows and n_rep * 16 <= broadcast_byte_budget():
        from .joins import collect_arrow
        tbl = collect_arrow(rep)
        ids_all = tbl[id_col].to_numpy()
        order = np.argsort(ids_all, kind="stable")
        ref = ray.put((ids_all[order],
                       tbl["rep_id"].to_numpy()[order]))

        def _attach(batch: pa.Table) -> pa.Table:
            from ..util import cached_get

            ids_sorted, reps_sorted = cached_get(ref)
            want = batch[id_col].to_numpy()
            idx = np.minimum(np.searchsorted(ids_sorted, want),
                             len(ids_sorted) - 1)
            if len(ids_sorted) == 0 or not np.all(ids_sorted[idx] == want):
                raise KeyError(
                    "exact_dedup_annotate: id missing from the rep map")
            return batch.append_column(
                "rep_id", pa.array(reps_sorted[idx], pa.int64()))

        return ds.map_batches(_attach, batch_format="pyarrow")

    # distributed map build: narrow sort by id, shards stay in plasma
    rep_sorted = rep.select_columns([id_col, "rep_id"]) \
        .sort(id_col).materialize()
    shard_refs = [r for r in rep_sorted.to_arrow_refs()]
    refs_ref = ray.put(shard_refs)

    def _attach_sharded(batch: pa.Table) -> pa.Table:
        from ..util import cached_get

        entry = _SHARD_MAP_CACHE.get(refs_ref.hex())
        if entry is None:
            tabs = [t for t in ray.get(cached_get(refs_ref))]
            tabs = [t if isinstance(t, pa.Table) else
                    pa.Table.from_pandas(t) for t in tabs]
            ids_list = [t[id_col].to_numpy() for t in tabs
                        if t.num_rows > 0]
            reps_list = [t["rep_id"].to_numpy() for t in tabs
                         if t.num_rows > 0]
            starts = np.array([a[0] for a in ids_list], dtype=np.int64)
            _SHARD_MAP_CACHE.clear()  # one live map per worker
            entry = _SHARD_MAP_CACHE[refs_ref.hex()] = (
                ids_list, reps_list, starts)
        ids_list, reps_list, starts = entry
        want = batch[id_col].to_numpy()
        if len(starts) == 0:
            raise KeyError("exact_dedup_annotate: empty rep map")
        ci = np.maximum(np.searchsorted(starts, want, side="right") - 1, 0)
        out = np.empty(len(want), np.int64)
        for c in np.unique(ci):
            m = ci == c
            w = want[m]
            a = ids_list[c]
            idx = np.minimum(np.searchsorted(a, w), len(a) - 1)
            if not np.all(a[idx] == w):
                raise KeyError(
                    "exact_dedup_annotate: id missing from the rep map")
            out[m] = reps_list[c][idx]
        return batch.append_column("rep_id", pa.array(out, pa.int64()))

    return ds.map_batches(_attach_sharded, batch_format="pyarrow")


def sha_int64(sha_hex_col: list[str]) -> list[int]:
    """First 8 bytes of the sha as a non-negative int64 (cheap join key)."""
    return [int(s[:16], 16) & 0x7FFFFFFFFFFFFFFF for s in sha_hex_col]


def fingerprint_dedup_key(texts: list[str]) -> list[int]:
    """Whitespace-insensitive exact-dup key: sha256 of collapsed text."""
    out = []
    for t in texts:
        collapsed = " ".join(t.split())
        out.append(int(hashlib.sha256(collapsed.encode()).hexdigest()[:16], 16) & 0x7FFFFFFFFFFFFFFF)
    return out
