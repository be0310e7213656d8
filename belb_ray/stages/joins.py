"""Join operators.

The reference delegates all joins to SQL (SURVEY §2.5 J1-J7). Ray Data
2.49 has no native ``Dataset.join``, so this module provides the two
canonical distributed strategies:

- ``broadcast_join``: the small side is ``ray.put`` once and joined per
  batch with ``pyarrow.Table.join`` (zero shuffle). Right for dimension
  tables, lookup maps, key sets — the reference's broadcast-dict pattern
  (belb/corpora/bioid.py:173-186 — SURVEY §2.4 T6).
- ``hash_partition_join``: both sides large → explicit partitioned hash
  join: add ``bucket = key % B`` to both sides, align schemas, union,
  ``groupby(bucket)`` and join per bucket with ``pyarrow.Table.join``.
  One shuffle each side; B sized so a bucket fits a worker's heap.
  Skewed keys: pre-collapse duplicates (exact-dedup) before joining, or
  raise B (SURVEY §4 skew row).

Semi/anti joins use a broadcast key set (belb/kbs/kb.py:428-453's
in-KB membership / notinkb anti-join — SURVEY §2.5 J1).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..util import resolve_num_buckets

from belb_ray.functions.arrow import table_from_pandas


def collect_arrow(ds: rd.Dataset) -> pa.Table:
    """Materialize a (small) Dataset to one driver-side Arrow table.
    Empty blocks carry a degenerate empty schema — drop them before
    concat; a fully-empty Dataset falls back to the Dataset schema.
    ``to_arrow_refs`` hands back pandas blocks UNconverted (empty
    DataFrames from a pandas map_groups can slip through an arrow
    map_batches untouched) — convert or skip them here."""
    import pandas as _pd

    tables = []
    for t in ray.get(ds.to_arrow_refs()):
        if isinstance(t, _pd.DataFrame):
            if len(t) == 0:
                continue
            t = table_from_pandas(t)
        if t.num_rows > 0:
            tables.append(t)
    if tables:
        return pa.concat_tables(tables)
    schema = ds.schema()
    return pa.table({n: pa.array([], t)
                     for n, t in zip(schema.names, schema.types)})


def _as_arrow(obj) -> pa.Table:
    if isinstance(obj, pa.Table):
        return obj
    if isinstance(obj, rd.Dataset):
        return collect_arrow(obj)
    import pandas as pd

    if isinstance(obj, pd.DataFrame):
        return table_from_pandas(obj)
    raise TypeError(type(obj))


def broadcast_join(
    ds: rd.Dataset,
    small,
    keys: str | list[str],
    join_type: str = "inner",
    right_suffix: str = "_r",
) -> rd.Dataset:
    """Join a Dataset against a small in-memory side (pa.Table / DataFrame /
    small Dataset). The small side is put in the object store ONCE and read
    by every task — not re-shipped per batch."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    small_tbl = _as_arrow(small)
    ref = ray.put(small_tbl)

    def _join(batch: pa.Table) -> pa.Table:
        # ray.get of a plasma Arrow table is zero-copy — no actor pool
        # needed (pool spin-up costs more than the per-task get)
        return batch.join(ray.get(ref), keys=keys, join_type=join_type,
                          right_suffix=right_suffix)

    return ds.map_batches(_join, batch_format="pyarrow")


def distinct_values(ds: rd.Dataset, col: str,
                    max_size: int = 50_000_000) -> np.ndarray:
    """Distinct values of one column: batch-local dedup in map_batches,
    final dedup on the driver. Avoids the native sort-aggregate that
    ``Dataset.unique`` runs (measured far slower). The distinct SET must
    fit the driver — right for join key-sets and vocabularies; the
    ``max_size`` guard fails loudly instead of silently OOMing the driver
    (use ``semi_join``'s shuffle path / ``count_distinct`` for corpus-
    cardinality keys)."""
    import pyarrow.compute as _pc

    dd = ds.select_columns([col]).map_batches(
        lambda t: pa.table({col: _pc.unique(t[col].combine_chunks())}),
        batch_format="pyarrow")
    tbl = collect_arrow(dd)
    if tbl.num_rows > max_size:
        raise ValueError(
            f"distinct_values({col!r}): {tbl.num_rows} batch-distinct rows "
            f"exceed the driver budget ({max_size}); use the shuffle path "
            f"(semi_join / count_distinct) for corpus-cardinality keys")
    return np.unique(tbl[col].to_numpy(zero_copy_only=False))


def broadcast_semi_join(ds: rd.Dataset, keys_values, key: str, anti: bool = False) -> rd.Dataset:
    """Semi (or anti) join: keep rows whose key is (not) in the broadcast
    key set. The reference's notinkb computation is exactly the anti form
    (belb/kbs/kb.py:428-453)."""
    arr = pa.array(sorted(set(keys_values)))
    ref = ray.put(arr)

    def _filt(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch[key], value_set=ray.get(ref))
        if anti:
            mask = pc.invert(mask)
        return batch.filter(mask)

    return ds.map_batches(_filt, batch_format="pyarrow")


def semi_join(ds: rd.Dataset, keys_side: rd.Dataset, key: str,
              anti: bool = False, broadcast_threshold: int = 5_000_000,
              num_buckets: int = 0) -> rd.Dataset:
    """Size-guarded semi/anti join against another Dataset's key column.

    Small key side (≤ broadcast_threshold distinct-ish rows) → broadcast
    membership set, zero shuffles. Larger → shuffle semi-join: both sides
    bucket on hash(key), each bucket resolves membership vectorized.
    Same results either way; the guard picks the shape."""
    num_buckets = resolve_num_buckets(num_buckets)
    keys_only = keys_side.select_columns([key])
    n = keys_only.count()
    if n == 0:
        # empty key side: anti keeps everything, semi keeps nothing —
        # (an all-empty-block dataset can also have no schema, which
        # would break the collect below)
        return ds if anti else ds.limit(0)
    if n <= broadcast_threshold:
        vals = distinct_values(keys_only, key)
        return broadcast_semi_join(ds, vals, key=key, anti=anti)

    def _tag(side: int, cols: list[str]):
        def fn(t: pa.Table) -> pa.Table:
            out = {c: t[c] if c in t.column_names
                   else pa.nulls(t.num_rows, typ)
                   for c, typ in cols}
            out["__side"] = pa.array(np.full(t.num_rows, side, np.int8))
            return pa.table(out)

        return fn

    schema = ds.schema()
    cols = list(zip(schema.names, schema.types))
    lt = ds.map_batches(_tag(0, cols), batch_format="pyarrow")
    rt = keys_only.map_batches(_tag(1, cols), batch_format="pyarrow")
    both = lt.union(rt)

    def _bucketize(batch: pa.Table) -> pa.Table:
        return batch.append_column("__bucket",
                                   _bucket_of(batch[key], num_buckets))

    def _filter_bucket(tbl: pa.Table) -> pa.Table:
        side = tbl["__side"].to_numpy(zero_copy_only=False)
        tbl = tbl.drop_columns(["__bucket", "__side"])
        keys_here = tbl.filter(pa.array(side == 1))[key].combine_chunks()
        rows = tbl.filter(pa.array(side == 0))
        mask = pc.is_in(rows[key], value_set=pc.unique(keys_here))
        if anti:
            mask = pc.invert(mask)
        return rows.filter(mask)

    bucketed = both.map_batches(_bucketize, batch_format="pyarrow")
    return bucketed.groupby("__bucket").map_groups(_filter_bucket,
                                                   batch_format="pyarrow")


def _bucket_of(col: pa.ChunkedArray | pa.Array, num_buckets: int) -> pa.Array:
    vals = col.to_numpy(zero_copy_only=False)
    if np.issubdtype(vals.dtype, np.integer):
        h = vals.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    else:
        # vectorized, deterministic string hashing (fixed-key xxhash)
        import pandas as pd

        h = pd.util.hash_array(vals, hash_key="belb_ray_bucket0", categorize=False)
    return pa.array((h % np.uint64(num_buckets)).astype(np.int32))


def hash_str(s) -> int:
    import hashlib

    return int.from_bytes(hashlib.blake2b(str(s).encode(), digest_size=8).digest(), "big")


_NATIVE_JOIN_TYPE = {"inner": "inner", "left outer": "left_outer",
                     "left_outer": "left_outer", "right outer": "right_outer",
                     "full outer": "full_outer"}


def hash_partition_join(
    left: rd.Dataset,
    right: rd.Dataset,
    key: str,
    num_buckets: int = 0,
    join_type: str = "inner",
    right_suffix: str = "_r",
    strategy: str = "manual",
    left_types: dict[str, pa.DataType] | None = None,
    post_fn=None,
) -> rd.Dataset:
    """Partitioned hash join of two large Datasets on ``key``.

    ``post_fn`` (Table → Table) is fused into each bucket task on the
    manual path (see `_manual_partition_join`); on the native path it
    runs as a following map_batches (Ray fuses Map onto the join op).

    ``left_types`` (ordered {column: Arrow type}) lets a caller that
    statically knows the left schema skip block-peek inference — the
    peek can land on a zero-column empty block (AllToAll ops emit them
    for empty partitions) and silently produce an empty join.

    Default strategy is the explicit union+bucket-groupby join
    (``_manual_partition_join``): one sort shuffle of the tagged union,
    ``pyarrow.Table.join`` per bucket. Measured ~2x faster than Ray's
    native hash-shuffle ``Dataset.join`` at sandbox scales (aggregator
    actor pool spin-up dominates) and immune to the
    multiple-joins-in-one-plan actor-resource deadlock. Pass
    ``strategy="native"`` for Ray's hash-shuffle operator (both sides
    hash-partition, per-partition joins in aggregator actors — no sort),
    which may win on real multi-node clusters with reused actor pools."""
    num_buckets = resolve_num_buckets(num_buckets)
    if strategy == "native":
        native_type = _NATIVE_JOIN_TYPE.get(join_type)
        if native_type is not None:
            # cap partitions at cluster CPUs and use fractional-CPU
            # aggregator actors: several joins in one lazy plan otherwise
            # deadlock on actor resources at small CPU counts
            n_cpus = int(ray.cluster_resources().get("CPU", 8)) \
                if ray.is_initialized() else 8
            parts = max(2, min(num_buckets, n_cpus))
            try:
                out = left.join(right, native_type, num_partitions=parts,
                                on=(key,), right_suffix=right_suffix,
                                aggregator_ray_remote_args={"num_cpus": 0.25})
                if post_fn is not None:
                    out = out.map_batches(post_fn, batch_format="pyarrow")
                return out
            except Exception:  # pragma: no cover — planner gaps
                pass
    return _manual_partition_join(left, right, key, num_buckets, join_type,
                                  right_suffix, left_types, post_fn=post_fn)


def _manual_partition_join(
    left: rd.Dataset,
    right: rd.Dataset,
    key: str,
    num_buckets: int = 0,
    join_type: str = "inner",
    right_suffix: str = "_r",
    left_types: dict[str, pa.DataType] | None = None,
    post_fn=None,
) -> rd.Dataset:
    """Explicit partitioned hash join: bucket column on both sides,
    aligned schemas with a side tag, one ``groupby(bucket)``,
    ``pyarrow.Table.join`` per bucket.

    ``post_fn`` (Table → Table) runs INSIDE each bucket task on the
    joined table before it is emitted — the fusion hook for consumers
    that immediately reduce the joined rows (e.g. pair scoring): a wide
    joined block that would otherwise throttle the streaming executor's
    object-store budget never leaves the task."""
    num_buckets = resolve_num_buckets(num_buckets)
    def _arrow_type(t) -> pa.DataType:
        # pandas-block datasets report numpy dtypes / Python classes in
        # Schema.types; pa.nulls needs a real Arrow DataType
        if isinstance(t, pa.DataType):
            return t
        if t is object or t is str:
            return pa.string()
        return pa.from_numpy_dtype(np.dtype(t))

    rschema = right.schema()
    if left_types is not None:
        lcols = list(left_types.keys())
        ltypes = dict(left_types)
    else:
        lschema = left.schema()
        lcols = list(lschema.names)
    rtype_by_name = {n: _arrow_type(t)
                     for n, t in zip(rschema.names, rschema.types)}
    rcols = [c for c in rschema.names if c != key]
    rcols_out = [c + right_suffix if c in lcols else c for c in rcols]
    rtypes = {co: rtype_by_name[c] for c, co in zip(rcols, rcols_out)}
    if left_types is None:
        ltypes = {n: _arrow_type(t)
                  for n, t in zip(lschema.names, lschema.types)}

    def _pad(n: int, t: pa.DataType) -> pa.Array:
        # schema-alignment padding for the other side's columns. The
        # values are NEVER read (_join_bucket selects them away before
        # joining), so pad with typed ZEROS, not nulls: an all-null
        # int64 column that round-trips through a pandas block during
        # the shuffle comes back as float64 (NaN laundering), silently
        # breaking the bucket hash of any later join on that column.
        if pa.types.is_integer(t) or pa.types.is_floating(t):
            return pa.array(np.zeros(n, dtype=t.to_pandas_dtype()),
                            type=t)
        if pa.types.is_string(t) or pa.types.is_large_string(t):
            return pa.array([""] * n, type=t)
        if pa.types.is_binary(t) or pa.types.is_large_binary(t):
            return pa.array([b""] * n, type=t)
        if pa.types.is_boolean(t):
            return pa.array(np.zeros(n, dtype=bool))
        return pa.nulls(n, t)

    def _prep(side: int, rename: dict[str, str]):
        def fn(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            batch = batch.rename_columns([rename.get(c, c) for c in batch.column_names])
            cols = {}
            for c in [key] + [c for c in lcols if c != key] + rcols_out:
                if c in batch.column_names:
                    cols[c] = batch[c]
                else:
                    t = ltypes.get(c) or rtypes.get(c)
                    cols[c] = _pad(n, t)
            out = pa.table(cols)
            out = out.append_column("__bucket", _bucket_of(out[key], num_buckets))
            return out.append_column("__side", pa.array(np.full(n, side, dtype=np.int8)))

        return fn

    lt = left.map_batches(_prep(0, {}), batch_format="pyarrow")
    rt = right.map_batches(_prep(1, dict(zip(rcols, rcols_out))), batch_format="pyarrow")
    both = lt.union(rt)

    lkeep = [key] + [c for c in lcols if c != key]

    def _join_bucket(tbl: pa.Table) -> pa.Table:
        side = tbl["__side"].to_numpy(zero_copy_only=False)
        tbl = tbl.drop_columns(["__bucket", "__side"])
        # a side's null-FILLED columns are typed by _prep, but the sort
        # may round-trip blocks through pandas (all-None object series),
        # which re-infers them as the Arrow `null` type — re-pin the
        # declared type (Acero rejects null-typed non-key join fields)
        for i, f in enumerate(tbl.schema):
            if pa.types.is_null(f.type):
                want = ltypes.get(f.name) or rtypes.get(f.name)
                if want is not None:
                    tbl = tbl.set_column(
                        i, f.name, tbl[f.name].cast(want))
        lpart = tbl.filter(pa.array(side == 0)).select(lkeep)
        rpart = tbl.filter(pa.array(side == 1)).select([key] + rcols_out)
        out = lpart.join(rpart, keys=[key], join_type=join_type)
        # join may reorder columns; normalize
        out = out.select([key] + [c for c in lcols if c != key] + rcols_out)
        return post_fn(out) if post_fn is not None else out

    return both.groupby("__bucket").map_groups(_join_bucket,
                                               batch_format="pyarrow")


def _bloom_hashes(col: pa.ChunkedArray | pa.Array, m_bits: int,
                  k: int) -> np.ndarray:
    """(k, n) bit positions via double hashing h1 + i·h2. Integer keys
    remix arithmetically (pd.util.hash_array ignores hash_key for ints);
    strings use two keyed xxhashes."""
    import pandas as pd

    vals = col.to_numpy(zero_copy_only=False)
    if np.issubdtype(vals.dtype, np.integer):
        u = vals.astype(np.uint64)
        h1 = u * np.uint64(0x9E3779B97F4A7C15)
        h2 = ((u ^ np.uint64(0xA076_1D64_78BD_642F))
              * np.uint64(0xE703_7ED1_A0B4_28DB))
    else:
        h1 = pd.util.hash_array(vals, hash_key="belbray_bloom_h1",
                                categorize=False)
        h2 = pd.util.hash_array(vals, hash_key="belbray_bloom_h2",
                                categorize=False)
    h2 |= np.uint64(1)  # odd step so probes don't collapse
    i = np.arange(k, dtype=np.uint64)[:, None]
    return ((h1[None, :] + i * h2[None, :])
            % np.uint64(m_bits)).astype(np.int64)


def build_bloom_filter(keys_side: rd.Dataset, key: str,
                       m_bits: int | None = None, k: int = 7,
                       n_hint: int | None = None) -> tuple:
    """Distributed Bloom-filter build over a key column: every block
    emits a packed local bitmap (m/8 bytes regardless of block rows),
    the driver OR-combines them STREAMING via iter_batches — it never
    holds more than one block bitmap plus the accumulator, and no key
    values ever reach the driver. m defaults to ~10 bits/key (≈1% FPR
    at k=7). Returns (ray.ObjectRef bitmap, m_bits, k)."""
    if m_bits is None:
        n = n_hint if n_hint is not None else keys_side.count()
        m_bits = max(1 << 13, 1 << int(np.ceil(np.log2(max(n, 1) * 10))))

    nbytes = m_bits // 8

    def _local(t: pa.Table) -> pa.Table:
        bm = np.zeros(nbytes, np.uint8)
        if t.num_rows:
            pos = _bloom_hashes(t[key].combine_chunks(), m_bits, k).ravel()
            np.bitwise_or.at(bm, pos >> 3,
                             np.left_shift(1, (pos & 7)).astype(np.uint8))
        return pa.table({"bm": pa.array([bm.tobytes()], pa.binary())})

    parts = keys_side.select_columns([key]).map_batches(
        _local, batch_format="pyarrow", batch_size=1 << 18)
    acc = np.zeros(nbytes, np.uint8)
    for b in parts.iter_batches(batch_format="pyarrow", batch_size=16):
        for buf in b["bm"].to_pylist():
            acc |= np.frombuffer(buf, np.uint8)
    return ray.put(acc), m_bits, k


def bloom_semi_join(ds: rd.Dataset, keys_side: rd.Dataset, key: str,
                    anti: bool = False, m_bits: int | None = None,
                    k: int = 7, broadcast_threshold: int = 5_000_000,
                    num_buckets: int = 0) -> rd.Dataset:
    """EXACT semi/anti join for two LARGE sides with a Bloom pre-filter:
    the key side compresses to an m-bit bitmap (fixed size, built
    distributed, broadcast once), the probe side drops definite
    non-members BEFORE any shuffle — only bloom-positive rows (true
    matches + ~1% false positives) enter the exact shuffle semi-join, so
    the all-to-all moves ~|matches| rows instead of |ds|. Anti joins
    split instead of filter: bloom-negative rows are *definitely*
    non-members (emitted directly, zero shuffle), only the positive
    sliver is exactly anti-checked. Unlike ``semi_join``'s broadcast
    path this never collects key VALUES anywhere — the bitmap is the
    only global state, sized by FPR not cardinality."""
    num_buckets = resolve_num_buckets(num_buckets)
    from ..util import cached_get

    ref, m_bits, k = build_bloom_filter(keys_side, key, m_bits, k)

    def _probe(batch: pa.Table, want: bool) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        bm = cached_get(ref)
        pos = _bloom_hashes(batch[key].combine_chunks(), m_bits, k)
        hit = (bm[pos >> 3] & np.left_shift(
            1, (pos & 7)).astype(np.uint8)).astype(bool).all(axis=0)
        return batch.filter(pa.array(hit if want else ~hit))

    positive = ds.map_batches(lambda t: _probe(t, True),
                              batch_format="pyarrow")
    exact = semi_join(positive, keys_side, key, anti=anti,
                      broadcast_threshold=broadcast_threshold,
                      num_buckets=num_buckets)
    if not anti:
        return exact
    definite_out = ds.map_batches(lambda t: _probe(t, False),
                                  batch_format="pyarrow")
    return exact.union(definite_out)


def cross_join(ds: rd.Dataset, small, right_suffix: str = "_r") -> rd.Dataset:
    """Cartesian product of a Dataset with a SMALL in-memory side (the
    only cross-join shape that makes sense distributed: the small table
    is ray.put once and each batch expands locally — output streams at
    |batch| × |small| rows per task, no shuffle). Pass small as a
    pa.Table / DataFrame / small Dataset."""
    small_tbl = _as_arrow(small)
    ref = ray.put(small_tbl)

    def _cross(batch: pa.Table) -> pa.Table:
        right = ray.get(ref)
        n, m = batch.num_rows, right.num_rows
        if n == 0 or m == 0:
            cols = {c: batch[c].slice(0, 0) for c in batch.column_names}
            for c in right.column_names:
                name = c + right_suffix if c in batch.column_names else c
                cols[name] = right[c].slice(0, 0)
            return pa.table(cols)
        left_idx = np.repeat(np.arange(n, dtype=np.int64), m)
        right_idx = np.tile(np.arange(m, dtype=np.int64), n)
        cols = {c: batch[c].take(pa.array(left_idx))
                for c in batch.column_names}
        for c in right.column_names:
            name = c + right_suffix if c in batch.column_names else c
            cols[name] = right[c].take(pa.array(right_idx))
        return pa.table(cols)

    return ds.map_batches(_cross, batch_format="pyarrow",
                          batch_size=8192)


def salted_hash_join(
    left: rd.Dataset,
    right: rd.Dataset,
    key: str,
    n_salt: int = 8,
    phi: float = 0.001,
    num_buckets: int = 0,
    right_suffix: str = "_r",
) -> rd.Dataset:
    """Skew-aware large×large inner equality join — EXACTLY the
    ``hash_partition_join`` output at any key skew, without the one-hot-
    partition straggler. The brief's "salt hot keys" shape:

      1. exact phi-heavy keys of the probe (left) side come from the
         Misra-Gries sketch + exact recount (``sketch.heavy_hitters``) —
         ≤ ceil(1/phi) keys, broadcast once as a sorted array;
      2. COLD rows of both sides take the plain partitioned join;
      3. HOT left rows fan out across ``n_salt`` sub-keys (batch-local
         round-robin — any assignment is correct, it only balances);
         hot RIGHT rows replicate ``n_salt``× so every (key, salt)
         partition holds the full right group; the sub-join runs on the
         packed ``key·n_salt + salt`` int64.

    The union of the two joins is the exact inner join: hot and cold key
    sets are disjoint, and salting partitions hot-left rows while
    replication keeps every right match reachable. Integer keys only
    (packing); |key| must stay < 2^62 / n_salt."""
    num_buckets = resolve_num_buckets(num_buckets)
    from .sketch import heavy_hitters

    from ..util import cached_get

    hot = heavy_hitters(left.select_columns([key]), key, phi)
    hot_keys = np.sort(np.asarray(
        [r[key] for r in hot.take_all()], dtype=np.int64))
    if len(hot_keys) == 0:
        return hash_partition_join(left, right, key, num_buckets,
                                   right_suffix=right_suffix)
    ref = ray.put(hot_keys)

    def _is_hot(col: pa.ChunkedArray) -> np.ndarray:
        hk = cached_get(ref)
        v = col.to_numpy(zero_copy_only=False).astype(np.int64)
        idx = np.minimum(np.searchsorted(hk, v), len(hk) - 1)
        return hk[idx] == v

    def _split(want_hot: bool):
        def _f(t: pa.Table) -> pa.Table:
            return t.filter(pa.array(
                _is_hot(t[key].combine_chunks()) == want_hot))

        return _f

    def _salt_left(t: pa.Table) -> pa.Table:
        v = t[key].to_numpy(zero_copy_only=False).astype(np.int64)
        salt = np.arange(len(v), dtype=np.int64) % n_salt
        return t.append_column("__sk", pa.array(v * n_salt + salt))

    def _replicate_right(t: pa.Table) -> pa.Table:
        v = t[key].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(v)
        idx = np.repeat(np.arange(n, dtype=np.int64), n_salt)
        rep = t.take(pa.array(idx))
        salt = np.tile(np.arange(n_salt, dtype=np.int64), n)
        return rep.append_column(
            "__sk", pa.array(rep[key].to_numpy(zero_copy_only=False)
                             .astype(np.int64) * n_salt + salt))

    cold = hash_partition_join(
        left.map_batches(_split(False), batch_format="pyarrow"),
        right.map_batches(_split(False), batch_format="pyarrow"),
        key, num_buckets, right_suffix=right_suffix)

    hot_right = (right.map_batches(_split(True), batch_format="pyarrow")
                 .map_batches(_replicate_right, batch_format="pyarrow")
                 .drop_columns([key]))
    hot_join = hash_partition_join(
        left.map_batches(_split(True), batch_format="pyarrow")
        .map_batches(_salt_left, batch_format="pyarrow"),
        hot_right, "__sk", num_buckets,
        right_suffix=right_suffix).drop_columns(["__sk"])

    # Align the hot arm's column ORDER with the cold arm before union:
    # the cold join normalizes to [key, left-others..., right...] while
    # the hot arm (joined on __sk, then dropped) keeps the left table's
    # original order — heterogeneous block schemas break Arrow-level
    # consumers (write_parquet, concat) whenever `key` is not the left
    # table's first column.
    def _key_first(t: pa.Table) -> pa.Table:
        return t.select([key] + [c for c in t.column_names if c != key])

    return cold.union(
        hot_join.map_batches(_key_first, batch_format="pyarrow"))


def star_broadcast_join(
    fact: rd.Dataset,
    dims: list[tuple],
    broadcast_threshold: int = 2_000_000,
) -> rd.Dataset:
    """One-pass star-schema denormalization: attach MANY small dimension
    tables to a fact stream in a SINGLE ``map_batches`` — each dim is
    put in the object store once and every task joins all of them
    against its batch, instead of N sequential join operators each
    re-materializing the fact stream. ``dims`` is a list of
    ``(dim_dataset, key, cols)`` tuples joined inner in order (``cols``
    None keeps every dim column; chained dims may key on columns a
    PREVIOUS dim attached — order matters, e.g. fact→orders→customer→
    nation→region). Any dim exceeding ``broadcast_threshold`` rows
    fails loudly — route that edge through ``hash_partition_join`` /
    ``salted_hash_join`` instead (a true big-big edge is not a star
    dimension)."""
    sides = []
    for dim, key, cols in dims:
        tbl = _as_arrow(dim.select_columns(
            list(dict.fromkeys([key] + list(cols)))) if cols is not None
            else dim)
        if tbl.num_rows > broadcast_threshold:
            raise ValueError(
                f"star_broadcast_join: dim on {key!r} has "
                f"{tbl.num_rows} rows > broadcast budget "
                f"{broadcast_threshold}; use a partitioned join")
        sides.append((ray.put(tbl), key))

    def _join(batch: pa.Table) -> pa.Table:
        from ..util import cached_get
        for ref, key in sides:
            batch = batch.join(cached_get(ref), keys=[key],
                               join_type="inner")
        return batch

    return fact.map_batches(_join, batch_format="pyarrow")
