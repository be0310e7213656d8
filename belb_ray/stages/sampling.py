"""Sampling / split utilities.

- ``upsample_chunks`` replays the reference's upsampling split — shuffle
  annotation ids with a seed, chunk into ≤ max_chunk sub-examples
  (belb/corpora/corpus.py:381-410 — SURVEY §2.7 O4) — as a deterministic
  hash-ordered chunking (seeded ``random_shuffle`` has no cross-run
  determinism guarantee under distributed execution; a keyed hash order
  does).
- ``hash_sample`` — deterministic fraction sampling by key hash: the
  stable way to sample a 100 TB corpus so every run (and every resumed
  partition) selects the same rows.

Both take ``method``:
- ``"fast"`` (default): vectorized ``pd.util.hash_array`` — cheapest at
  scale, deterministic across runs/partitions, but engine-specific.
- ``"md5"``: 60-bit hash from ``md5(f"{key}:{seed}")`` — byte-identical
  reproducible in ANY engine (DuckDB/Spark/SQL: ``md5(key || ':' || seed)``),
  the auditable choice when a split must be re-derivable outside Ray.
  Per-row hashlib (~0.5 µs/row) — still far from a bottleneck next to
  the read.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

# 60-bit space of the md5 method (15 hex digits — always fits int64,
# always non-negative, so signed/unsigned ordering agree across engines)
MD5_SPACE = 16 ** 15


def _key_hash(col: pa.ChunkedArray | pa.Array, seed: int) -> np.ndarray:
    vals = col.to_numpy(zero_copy_only=False)
    h = pd.util.hash_array(vals, categorize=False)
    # hash_key only affects object arrays — mix the seed in arithmetically
    # so integer keys reseed too
    s = np.uint64((seed * 0x9E3779B97F4A7C15 + 0xD1B54A32D192ED03) & (2**64 - 1))
    return (h ^ s) * np.uint64(0xC2B2AE3D27D4EB4F)


def _md5_hash60(col: pa.ChunkedArray | pa.Array, seed: int) -> np.ndarray:
    """int64 in [0, 16^15): int(md5(f"{v}:{seed}")[:15], 16) — mirrors SQL
    ``CAST('0x' || substr(md5(CAST(v AS VARCHAR) || ':seed'), 1, 15) AS BIGINT)``."""
    md5 = hashlib.md5
    vals = col.to_pylist()
    return np.fromiter(
        (int(md5(f"{v}:{seed}".encode()).hexdigest()[:15], 16) for v in vals),
        np.int64, len(vals))


def hash_sample(ds: rd.Dataset, key: str, frac: float, seed: int = 0,
                method: str = "fast") -> rd.Dataset:
    """Keep rows whose key hash falls below frac·(hash space) —
    deterministic, partition-independent sampling."""
    if method == "md5":
        cut64 = np.int64(int(frac * MD5_SPACE))

        def _f(batch: pa.Table) -> pa.Table:
            return batch.filter(pa.array(_md5_hash60(batch[key], seed) < cut64))

        return ds.map_batches(_f, batch_format="pyarrow")

    cut = np.uint64(int(frac * float(2**64 - 1)))

    def _f(batch: pa.Table) -> pa.Table:
        h = _key_hash(batch[key], seed)
        return batch.filter(pa.array(h <= cut))

    return ds.map_batches(_f, batch_format="pyarrow")


def upsample_chunks(ds: rd.Dataset, key: str, max_chunk: int,
                    seed: int = 0, out_col: str = "chunk_id",
                    method: str = "fast") -> rd.Dataset:
    """Assign rows to chunks of ≤ max_chunk in seeded pseudo-random order:
    chunk_id = rank(hash(key)) // max_chunk, computed per hash-bucket so
    no global sort is needed (ranks are bucket-local, chunk ids offset by
    bucket — deterministic, distributed). Rank ties (hash collisions)
    break on the key itself, so the order is total under any partitioning."""
    # SEMANTIC bucket count (not routing-only): chunk ids are offset by
    # bucket, so changing it changes the output — deliberately fixed,
    # exempt from resolve_num_buckets (cf. util.resolve_num_buckets doc)
    num_buckets = 64

    def _bucketize(batch: pa.Table) -> pa.Table:
        if method == "md5":
            h = _md5_hash60(batch[key], seed)
            bucket = (h % num_buckets).astype(np.int32)
            hcol = h
        else:
            h = _key_hash(batch[key], seed)
            bucket = (h % np.uint64(num_buckets)).astype(np.int32)
            hcol = h.astype(np.uint64).view(np.int64)
        return (batch
                .append_column("__h", pa.array(hcol, pa.int64()))
                .append_column("__bucket", pa.array(bucket)))

    def _chunk(group: pa.Table) -> pa.Table:
        h = group["__h"].to_numpy()
        k = group[key].to_numpy(zero_copy_only=False)
        bucket = int(group["__bucket"][0].as_py())
        order = np.lexsort((k, h))  # by (hash, key): total order
        ranks = np.empty(len(h), dtype=np.int64)
        ranks[order] = np.arange(len(h))
        chunk = ranks // max_chunk + (np.int64(bucket) << 32)
        return (group.drop_columns(["__h", "__bucket"])
                .append_column(out_col, pa.array(chunk, pa.int64())))

    bucketed = ds.map_batches(_bucketize, batch_format="pyarrow")
    return bucketed.groupby("__bucket").map_groups(_chunk, batch_format="pyarrow")


def seeded_upsample_chunks(ds: rd.Dataset, group_col: str, id_col: str,
                           max_chunk: int, seed: int = 0,
                           out_col: str = "chunk_idx",
                           num_buckets: int = 64) -> rd.Dataset:
    """O4, exact-shuffle form: per group, Fisher-Yates shuffle of the
    group's ids with stdlib ``random.Random``, then chunks of ≤
    ``max_chunk`` in shuffled order → (group_col, id_col, out_col).

    Reference semantics (belb/corpora/corpus.py:381-410 ``upsample``):
    shuffle an example's annotation ids, slice into ``max_mentions``
    chunks. The reference shuffles with the GLOBAL random state — its
    result depends on every previous shuffle in the run, which no
    distributed (or even re-ordered sequential) execution can reproduce
    bit-for-bit. The documented deviation is per-group seeding:
    ``random.Random(f"{seed}:{group}")`` over the group's ids in sorted
    (canonical) pre-shuffle order — deterministic under ANY
    partitioning, same chunk-size distribution, stdlib-exact shuffle.
    Groups are example-sized (annotations per document), so the per-
    group Python shuffle IS the spec, not a hot path."""
    import random

    def _bucketize(batch: pa.Table) -> pa.Table:
        h = _key_hash(batch[group_col], seed)
        return batch.append_column(
            "__bucket", pa.array((h % np.uint64(num_buckets))
                                 .astype(np.int32)))

    def _chunk(group: pd.DataFrame) -> pd.DataFrame:
        out_g, out_i, out_c = [], [], []
        for g, sub in group.groupby(group_col, sort=False):
            ids = sorted(sub[id_col].tolist())
            random.Random(f"{seed}:{g}").shuffle(ids)
            out_g.extend([g] * len(ids))
            out_i.extend(ids)
            out_c.extend(i // max_chunk for i in range(len(ids)))
        return pd.DataFrame({group_col: out_g, id_col: out_i,
                             out_col: np.asarray(out_c, np.int64)})

    bucketed = (ds.select_columns([group_col, id_col])
                .map_batches(_bucketize, batch_format="pyarrow"))
    return bucketed.groupby("__bucket").map_groups(
        _chunk, batch_format="pandas")


def weighted_sample_per_group(ds: rd.Dataset, group_col: str, id_col: str,
                              weight_col: str, k: int, seed: int = 0,
                              method: str = "md5",
                              num_buckets: int = 64) -> rd.Dataset:
    """Deterministic weighted sampling without replacement, k per group —
    Efraimidis-Spirakis A-Res with the row's key hash as its "random"
    draw: u = hash(id)/space ∈ [0,1), sample key u^(1/w), keep the k
    largest keys per group. P(selection) ∝ weight, every run/partition
    selects the same rows, and with ``method="md5"`` the draw is
    re-derivable in any engine (SQL: ``pow(md5-int / 16^15, 1.0/w)``) —
    the auditable way to curate a quality-weighted training subset.
    Rows with weight ≤ 0 are dropped. Shuffle cost = grouped_topk's
    (≤ k rows per group per block enter the exchange); the sampling key
    column is dropped from the output."""
    from .agg import grouped_topk

    def _keyed(batch: pa.Table) -> pa.Table:
        hv = (_md5_hash60(batch[id_col], seed) if method == "md5"
              else (_key_hash(batch[id_col], seed)
                    >> np.uint64(4)).astype(np.int64))
        u = hv.astype(np.float64) / float(MD5_SPACE)
        w = batch[weight_col].to_numpy(zero_copy_only=False).astype(
            np.float64)
        keep = w > 0
        out = batch.filter(pa.array(keep))
        with np.errstate(invalid="ignore"):
            wkey = np.power(u[keep], 1.0 / w[keep])
        return out.append_column("__wkey", pa.array(wkey))

    keyed = ds.map_batches(_keyed, batch_format="pyarrow")
    top = grouped_topk(keyed, [group_col], "__wkey", k,
                       descending=True, tiebreak=id_col,
                       num_buckets=num_buckets)
    return top.drop_columns(["__wkey"])


def stratified_hash_sample(ds: rd.Dataset, key: str, group_col: str,
                           fracs: dict, default_frac: float = 0.0,
                           seed: int = 0,
                           method: str = "md5") -> rd.Dataset:
    """Per-group deterministic fraction sampling: keep a row when its
    key hash falls below ``fracs[group]`` (``default_frac`` for unlisted
    groups) of the hash space — :func:`hash_sample` with a per-stratum
    rate, the training-data curation knob for rebalancing sources or
    languages. Same determinism/re-derivability guarantees as
    hash_sample (md5 mode mirrors in SQL via a CASE over the group)."""
    space = float(MD5_SPACE if method == "md5" else 2 ** 60)

    def _keep(batch: pa.Table) -> pa.Table:
        hv = (_md5_hash60(batch[key], seed) if method == "md5"
              else (_key_hash(batch[key], seed)
                    >> np.uint64(4)).astype(np.int64))
        groups = batch[group_col].to_pylist()
        cut = np.fromiter(
            (fracs.get(g, default_frac) * space for g in groups),
            np.float64, len(groups))
        return batch.filter(pa.array(hv < cut))

    return ds.map_batches(_keep, batch_format="pyarrow")


def shard_assign(ds: rd.Dataset, key: str, num_shards: int,
                 seed: int = 0, num_buckets: int = 64) -> rd.Dataset:
    """Deterministic global shuffle + sharding for training-data export:
    → input columns + ``shard`` (md5-hash of ``key`` mod num_shards) and
    ``pos`` (0-based rank of the hash within the shard — the record's
    position in its output shard file). The md5 hash is the SQL-
    re-derivable ``_md5_hash60`` form, so shard AND position are exactly
    checkable by ``row_number() OVER (PARTITION BY shard ORDER BY h,
    key)``; the same assignment on any partitioning of the input.

    Shape at 100 TB: one hash(shard)-bucket co-location shuffle (each
    shard lands wholly in one bucket; size ≈ rows/num_shards — pick
    num_shards so a shard fits a worker, which an export wants anyway
    for bounded file sizes); within a bucket positions come from one
    whole-bucket lexsort over (shard, h, key). Downstream:
    ``out.write_parquet(path, partition_cols=['shard'])`` gives the
    resumable one-directory-per-shard layout."""

    def _hash(batch: pa.Table) -> pa.Table:
        h = _md5_hash60(batch[key], seed)
        batch = batch.append_column("__h", pa.array(h, pa.int64()))
        return batch.append_column(
            "shard", pa.array(h % num_shards, pa.int64()))

    def _bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_array(batch["shard"].to_numpy(),
                               hash_key="belb_ray_shard000",
                               categorize=False)
        batch["__bucket"] = (h % np.uint64(num_buckets)).astype(np.int32)
        return batch

    def _rank(group: pd.DataFrame) -> pd.DataFrame:
        g = (group.drop(columns="__bucket")
                  .sort_values(["shard", "__h", key], kind="stable")
                  .reset_index(drop=True))
        sh = g["shard"].to_numpy()
        new_shard = np.r_[True, sh[1:] != sh[:-1]]
        idx = np.arange(len(g), dtype=np.int64)
        start = np.maximum.accumulate(np.where(new_shard, idx, 0))
        g["pos"] = idx - start
        return g.drop(columns="__h")

    bucketed = (ds.map_batches(_hash, batch_format="pyarrow")
                .map_batches(_bucketize, batch_format="pandas",
                             batch_size=1 << 18))
    return bucketed.groupby("__bucket").map_groups(_rank,
                                                   batch_format="pandas")


def size_balanced_shards(ds: rd.Dataset, target_bytes: int,
                         id_col: str = "doc_id",
                         text_col: str = "text",
                         id_bin: int = 4096,
                         num_buckets: int = 64) -> rd.Dataset:
    """Greedy byte-packed shard plan for training-data export:
    → (id, nbytes, shard) where ``shard = floor(exclusive-prefix-bytes
    / target_bytes)`` in ``id_col`` order — consecutive ids pack into
    ~``target_bytes``-sized output files (docs never split), the layout
    a resumable partitioned-parquet writer wants when doc sizes are
    skewed and hash-sharding (``shard_assign``) would produce uneven
    files.

    Distributed two-phase prefix (the ``global_rank`` device, summing
    bytes instead of counting rows): phase 1 reduces per-id-bin byte
    sums batch-locally (no row shuffle) and the driver cumsums the
    O(#bins) totals; phase 2 shuffles rows ONCE by bin and finishes the
    within-bin cumsum vectorized. Exactly mirrors the SQL window
    ``sum(len) OVER (ORDER BY id) - len``.
    """
    import ray

    from ..util import cached_get
    from .agg import _bucket_of_frame

    def _partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch[id_col].to_numpy(np.int64) // id_bin
        n = batch[text_col].str.len().to_numpy(np.int64)
        return (pd.DataFrame({"__bin": b, "__n": n})
                .groupby("__bin", sort=False)["__n"].sum().reset_index())

    bs = (ds.select_columns([id_col, text_col])
          .map_batches(_partial, batch_format="pandas").to_pandas())
    bs = bs.groupby("__bin", sort=True)["__n"].sum().sort_index()
    bases = np.concatenate([[0], bs.cumsum().to_numpy()[:-1]])
    base_of = {int(k): int(v) for k, v in zip(bs.index, bases)}
    ref = ray.put(base_of)

    def _bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            id_col: batch[id_col].to_numpy(np.int64),
            "nbytes": batch[text_col].str.len().to_numpy(np.int64)})
        out["__bin"] = out[id_col].to_numpy() // id_bin
        out["__bucket"] = _bucket_of_frame(out, ["__bin"], num_buckets)
        return out

    def _scan(group: pd.DataFrame) -> pd.DataFrame:
        base_of = cached_get(ref)
        outs = []
        for bn, g in group.groupby("__bin", sort=False):
            g = g.sort_values(id_col, kind="mergesort")
            nb = g["nbytes"].to_numpy(np.int64)
            cum_excl = base_of[int(bn)] + np.cumsum(nb) - nb
            outs.append(pd.DataFrame({
                id_col: g[id_col].to_numpy(),
                "nbytes": nb,
                "shard": cum_excl // int(target_bytes)}))
        return pd.concat(outs) if outs else pd.DataFrame(
            {id_col: np.zeros(0, np.int64),
             "nbytes": np.zeros(0, np.int64),
             "shard": np.zeros(0, np.int64)})

    return (ds.select_columns([id_col, text_col])
            .map_batches(_bucketize, batch_format="pandas")
            .groupby("__bucket").map_groups(_scan,
                                            batch_format="pandas"))
