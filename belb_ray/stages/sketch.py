"""Streaming sketches: HyperLogLog count-distinct and Misra-Gries heavy
hitters — the two cardinality/frequency primitives a 100-TB curation
pipeline needs where exact ``groupby`` is unaffordable.

Both are designed so the *distributed* result is bit-identical to a SQL
re-derivation (the driver's DuckDB oracle can check them exactly — no
"approximately equal" escape hatch):

- ``hll_sketch`` hashes with the engine-portable 60-bit md5 hash
  (``sampling._md5_hash60`` — re-derivable as
  ``md5(CAST(v AS VARCHAR) || ':seed')`` in any engine). Register maxes
  are integers (order-independent), and the harmonic denominator is
  computed as the INTEGER ``Z = Σ 2^(40 - rho)`` (every term a power of
  two, summed exactly in int64) so the float estimate is one
  deterministic expression over exact integers — no float-summation-order
  divergence between numpy and SQL.
- ``heavy_hitters`` runs per-block Misra-Gries with k = ceil(1/phi)
  counters. Pigeonhole guarantees the union of per-block candidates is a
  superset of every globally phi-heavy key (a key with global count
  > phi·n must exceed phi·n_b in some block, and block-MG finds
  everything above n_b/(k+1) ≤ phi·n_b). The tiny candidate union is
  broadcast and recounted EXACTLY in one filtered pass, so the output is
  the true heavy-hitter set with exact counts — sketch recall, exact
  precision.

Scale shape: HLL shuffles ≤ m register rows per group per block
(m = 2^p, bytes); MG shuffles nothing — per-block summaries of ≤ k rows
are collected (k ≈ 1/phi, e.g. 200 rows/block at phi = 0.005), and the
recount is a streaming filtered aggregate.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from .agg import _bucket_of_frame
from .sampling import _md5_hash60

from belb_ray.functions.arrow import table_from_pandas
from ..util import resolve_num_buckets
from ..util import round_half_away

# rho is the leading-zero rank inside a 38-bit window (bits p..p+37 of the
# 60-bit hash): [1, 39], 39 for w == 0. Keeping the window under 53 bits
# makes float64(w) exact, so floor(log2(w)) matches SQL's double log2
# bit-for-bit; and 2^(40 - rho) stays an exact int64 power of two.
_W_BITS = 38
_W_MASK = (1 << _W_BITS) - 1
_SCALE = 1 << (_W_BITS + 2)  # 2^40, the Z fixed-point scale


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_estimate(registers: np.ndarray) -> float:
    """Standard HLL estimate from one register vector (uint8, len = m),
    with the small-range linear-counting correction. Pure + deterministic:
    the golden oracle and the SQL mirror both re-derive it exactly."""
    m = len(registers)
    z = sum(1 << (_W_BITS + 2 - int(r)) for r in registers)  # exact int
    am2 = _alpha(m) * m * m
    # est = am2 * 2^40 / z — association order mirrored in the SQL oracle
    est = am2 * float(_SCALE) / float(z)
    zeros = int((registers == 0).sum())
    if zeros > 0 and est <= 2.5 * m:
        est = float(m) * math.log(float(m) / float(zeros))
    return est


def _rho_of(hv: np.ndarray, p: int) -> tuple[np.ndarray, np.ndarray]:
    """(register index, rho) for 60-bit hashes: idx = low p bits,
    w = next 38 bits, rho = 38 - floor(log2(w)) (39 when w = 0)."""
    idx = (hv & ((1 << p) - 1)).astype(np.int32)
    w = (hv >> p) & _W_MASK
    rho = np.full(len(hv), _W_BITS + 1, dtype=np.int64)
    nz = w > 0
    rho[nz] = _W_BITS - np.floor(np.log2(w[nz].astype(np.float64))).astype(np.int64)
    return idx, rho


def _finish_registers(regs: np.ndarray, m: int, am2: float):
    """(n_nonzero, md5 digest, rounded estimate) from one register
    vector — shared by the sketch finisher and the sketch MERGER (max is
    associative, so merged registers estimate identically to a direct
    sketch at the coarser granularity)."""
    z = sum(1 << (_W_BITS + 2 - int(r)) for r in regs)
    est = am2 * float(_SCALE) / float(z)
    zeros = int((regs == 0).sum())
    if zeros > 0 and est <= 2.5 * m:
        est = float(m) * math.log(float(m) / float(zeros))
    dig = hashlib.md5(
        ",".join(str(int(r)) for r in regs).encode()).hexdigest()
    return m - zeros, dig, round_half_away(est, 2)


def hll_sketch(ds: rd.Dataset, group_key: str, value_key: str, p: int = 6,
               seed: int = 0, num_buckets: int = 0,
               emit_registers: bool = False) -> rd.Dataset:
    """Approximate count-distinct of ``value_key`` per ``group_key``.

    → (group_key, n_nonzero:int64, reg_digest:str, approx_distinct:float)
    where ``reg_digest`` is md5 of the comma-joined register vector in
    index order (the exactly-checkable fingerprint of the sketch state)
    and ``approx_distinct`` is the HLL estimate rounded to 2 decimals.
    """
    num_buckets = resolve_num_buckets(num_buckets)
    m = 1 << p
    am2 = _alpha(m) * m * m

    def _partial(batch: pa.Table) -> pa.Table:
        hv = _md5_hash60(batch[value_key], seed)
        idx, rho = _rho_of(hv, p)
        df = pd.DataFrame({
            "__g": batch[group_key].to_numpy(zero_copy_only=False),
            "__idx": idx, "__rho": rho})
        part = (df.groupby(["__g", "__idx"], sort=False)["__rho"]
                  .max().reset_index())
        return table_from_pandas(part)

    def _bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        batch["__bucket"] = _bucket_of_frame(batch, ["__g"], num_buckets)
        return batch

    def _finalize(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop(columns="__bucket")
        maxes = g.groupby(["__g", "__idx"], sort=False)["__rho"].max()
        out_g, out_nz, out_dig, out_est, out_regs = [], [], [], [], []
        for gval, sub in maxes.groupby(level=0, sort=False):
            regs = np.zeros(m, dtype=np.int64)
            regs[sub.index.get_level_values(1).to_numpy()] = sub.to_numpy()
            nz, dig, est = _finish_registers(regs, m, am2)
            out_g.append(gval)
            out_nz.append(nz)
            out_dig.append(dig)
            out_est.append(est)
            if emit_registers:
                out_regs.append(regs.astype(np.uint8).tobytes())
        out = pd.DataFrame({group_key: out_g,
                            "n_nonzero": np.array(out_nz, dtype=np.int64),
                            "reg_digest": out_dig,
                            "approx_distinct": out_est})
        if emit_registers:
            out["registers"] = out_regs
        return out

    partial = ds.select_columns([group_key, value_key]).map_batches(
        _partial, batch_format="pyarrow")
    bucketed = partial.map_batches(_bucketize, batch_format="pandas",
                                   batch_size=1 << 18)
    return bucketed.groupby("__bucket").map_groups(_finalize,
                                                   batch_format="pandas")


def hll_sql(table: str, group_key: str, value_key: str, p: int = 6,
            seed: int = 0) -> str:
    """DuckDB mirror of ``hll_sketch`` — same hash, same registers, same
    integer Z, same estimate expression (exact parity by construction)."""
    m = 1 << p
    wmod = 1 << _W_BITS
    # DuckDB types bare decimal literals as DECIMAL (overflows in the
    # Z multiply) — force DOUBLE so arithmetic matches numpy float64
    am2 = f"CAST({_alpha(m) * m * m!r} AS DOUBLE)"
    scale = f"CAST({float(_SCALE)!r} AS DOUBLE)"
    md = f"CAST({float(m)!r} AS DOUBLE)"
    lim = f"CAST({2.5 * m!r} AS DOUBLE)"
    return f"""
        WITH h AS (
            SELECT {group_key} AS g,
                   CAST(('0x' || substr(md5(CAST({value_key} AS VARCHAR)
                                            || ':{seed}'), 1, 15))
                        AS BIGINT) AS hv
            FROM {table}),
        b AS (SELECT g, hv % {m} AS idx, (hv // {m}) % {wmod} AS w FROM h),
        r AS (SELECT g, idx,
                     max(CASE WHEN w = 0 THEN {_W_BITS + 1}
                              ELSE {_W_BITS} - CAST(floor(log2(
                                       CAST(w AS DOUBLE))) AS BIGINT)
                         END) AS rho
              FROM b GROUP BY g, idx),
        grid AS (SELECT DISTINCT g FROM h),
        idxs AS (SELECT unnest(range({m})) AS idx),
        fullreg AS (
            SELECT grid.g, idxs.idx, coalesce(r.rho, 0) AS rho
            FROM grid CROSS JOIN idxs
            LEFT JOIN r ON r.g = grid.g AND r.idx = idxs.idx),
        agg AS (
            SELECT g,
                   sum(CASE WHEN rho > 0 THEN 1 ELSE 0 END) AS n_nonzero,
                   md5(string_agg(CAST(rho AS VARCHAR), ','
                                  ORDER BY idx)) AS reg_digest,
                   sum(CAST(1 AS BIGINT) << ({_W_BITS + 2} - rho)) AS z,
                   {m} - sum(CASE WHEN rho > 0 THEN 1 ELSE 0 END) AS zeros
            FROM fullreg GROUP BY g)
        SELECT g AS {group_key},
               CAST(n_nonzero AS BIGINT) AS n_nonzero,
               reg_digest,
               round(CASE WHEN zeros > 0
                           AND {am2} * {scale}
                               / CAST(z AS DOUBLE) <= {lim}
                          THEN {md} * ln({md} / CAST(zeros AS DOUBLE))
                          ELSE {am2} * {scale} / CAST(z AS DOUBLE)
                     END, 2) AS approx_distinct
        FROM agg
    """


def _misra_gries(keys: np.ndarray, k: int) -> dict:
    """Classic Misra-Gries with k counters over one block (vectorized in
    chunks: exact per-key counts via pandas, then summary merge — the
    result is a valid MG summary of the block, error ≤ n_block/(k+1))."""
    vc = pd.Series(keys).value_counts()
    if len(vc) <= k:
        return vc.to_dict()
    # keep top-k counters, subtract the (k+1)-th count (the MG decrement
    # generalized: removing c_(k+1) from everything keeps the guarantee)
    cut = int(vc.iloc[k])
    top = vc.iloc[:k] - cut
    return top[top > 0].to_dict()


def heavy_hitters(ds: rd.Dataset, key: str, phi: float,
                  num_buckets: int = 0) -> rd.Dataset:
    """Exact phi-heavy hitters (count > phi·n) found at sketch cost.

    Pass 1 streams per-block Misra-Gries summaries (≤ ceil(1/phi) rows
    each) to the driver — their key union provably contains every global
    heavy hitter. Pass 2 broadcasts that tiny candidate set and recounts
    it exactly. → (key, cnt:int64), the exact heavy-hitter rows.
    """
    num_buckets = resolve_num_buckets(num_buckets)
    import ray

    k = max(1, math.ceil(1.0 / phi))

    def _summary(batch: pa.Table) -> pa.Table:
        keys = batch[key].to_numpy(zero_copy_only=False)
        mg = _misra_gries(keys, k)
        return pa.table({"__key": pa.array(list(mg.keys()),
                                           batch[key].type)})

    summaries = ds.select_columns([key]).map_batches(
        _summary, batch_format="pyarrow").to_pandas()
    if len(summaries) == 0:
        schema = ds.schema()
        ktype = dict(zip(schema.names, schema.types))[key]
        empty = pa.table({key: pa.array([], ktype),
                          "cnt": pa.array([], pa.int64())})
        return rd.from_arrow(empty)
    candidates = set(summaries["__key"].tolist())
    n_total = ds.count()
    cand_ref = ray.put(candidates)

    def _count_cands(batch: pa.Table) -> pa.Table:
        cands = ray.get(cand_ref)
        keys = batch[key].to_numpy(zero_copy_only=False)
        s = pd.Series(keys)
        s = s[s.isin(cands)]
        vc = s.value_counts()
        return pa.table({key: pa.array(vc.index.to_numpy(),
                                       batch[key].type),
                         "cnt": pa.array(vc.to_numpy(), pa.int64())})

    def _bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        batch["__bucket"] = _bucket_of_frame(batch, [key], num_buckets)
        return batch

    def _combine(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop(columns="__bucket")
        out = g.groupby(key, sort=False)["cnt"].sum().reset_index()
        return out[out["cnt"] > phi * n_total]

    partial = ds.select_columns([key]).map_batches(
        _count_cands, batch_format="pyarrow")
    bucketed = partial.map_batches(_bucketize, batch_format="pandas")
    return bucketed.groupby("__bucket").map_groups(_combine,
                                                   batch_format="pandas")


def hll_merge(sketches: rd.Dataset, group_key: str, p: int,
              num_buckets: int = 0) -> rd.Dataset:
    """Merge HLL sketches to a coarser key WITHOUT re-reading raw rows —
    the sketch-algebra step a pre-aggregated metrics store relies on:
    registers are element-wise MAX-merged per ``group_key``, then
    re-estimated. Because max is associative, the merged sketch is
    bit-identical to a direct ``hll_sketch`` at the coarse granularity
    (the oracle exploits exactly that).

    Input: (group_key, registers binary(m)) rows from
    ``hll_sketch(..., emit_registers=True)`` at any finer partitioning;
    the exchange is one bucketed combine of m-byte register rows —
    sketch-count-sized, never row-count-sized."""
    num_buckets = resolve_num_buckets(num_buckets)
    m = 1 << p
    am2 = _alpha(m) * m * m

    def _bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch[[group_key, "registers"]]
        batch["__bucket"] = _bucket_of_frame(batch, [group_key],
                                             num_buckets)
        return batch

    def _combine(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop(columns="__bucket")
        out_g, out_nz, out_dig, out_est = [], [], [], []
        for gval, sub in g.groupby(group_key, sort=False):
            mat = np.frombuffer(
                b"".join(sub["registers"].tolist()),
                np.uint8).reshape(len(sub), m)
            regs = mat.max(axis=0).astype(np.int64)
            nz, dig, est = _finish_registers(regs, m, am2)
            out_g.append(gval)
            out_nz.append(nz)
            out_dig.append(dig)
            out_est.append(est)
        return pd.DataFrame({group_key: out_g,
                             "n_nonzero": np.array(out_nz, np.int64),
                             "reg_digest": out_dig,
                             "approx_distinct": out_est})

    return (sketches.map_batches(_bucketize, batch_format="pandas")
            .groupby("__bucket").map_groups(_combine,
                                            batch_format="pandas"))


def _cms_hash(vals: list, d: int, width: int) -> np.ndarray:
    """Row-d CMS bucket: md5-derived 60-bit hash mod width — mirrors SQL
    ``CAST('0x' || substr(md5(CAST(v AS VARCHAR) || ':' || d), 1, 15)
    AS BIGINT) % width`` (same convention as ``_md5_hash60``)."""
    import hashlib

    md5 = hashlib.md5
    hv = np.fromiter(
        (int(md5(f"{v}:{d}".encode()).hexdigest()[:15], 16) for v in vals),
        np.int64, len(vals))
    return hv % width


def cms_sketch(ds: rd.Dataset, key_col: str, depth: int = 4,
               width: int = 64, num_buckets: int = 0) -> rd.Dataset:
    """Count-min sketch of ``key_col`` frequencies → nonzero cells
    (d, idx, cnt). CMS is a LINEAR sketch: per-block partial matrices
    sum cell-wise, so the exchange is bounded by depth x width rows per
    block at ANY key cardinality — the frequency-query dual of
    ``hll_sketch`` (Cormode & Muthukrishnan 2005). Point estimates
    overcount only (min over depth rows of colliding-bucket sums)."""
    num_buckets = resolve_num_buckets(num_buckets)
    from .agg import preagg_groupby

    def _partial(batch: pa.Table) -> pd.DataFrame:
        vals = batch[key_col].to_pylist()
        out_d, out_i, out_c = [], [], []
        for d in range(depth):
            cnt = np.bincount(_cms_hash(vals, d, width), minlength=width)
            nz = np.flatnonzero(cnt)
            out_d.append(np.full(len(nz), d, np.int64))
            out_i.append(nz.astype(np.int64))
            out_c.append(cnt[nz].astype(np.int64))
        return pd.DataFrame({"d": np.concatenate(out_d),
                             "idx": np.concatenate(out_i),
                             "cnt": np.concatenate(out_c)})

    partials = ds.select_columns([key_col]).map_batches(
        _partial, batch_format="pyarrow")
    return preagg_groupby(partials, ["d", "idx"],
                          [("sum", "cnt", "cnt")], num_buckets)


def cms_estimate(cms: rd.Dataset, probes: rd.Dataset, key_col: str,
                 depth: int = 4, width: int = 64) -> rd.Dataset:
    """Point-frequency estimates for each probe row's ``key_col``:
    (key_col, est_count). The sketch table is at most depth x width rows
    by construction — the one small collect — broadcast once; probes
    stream."""
    import ray

    from ..util import cached_get, resolve_num_buckets

    cells = cms.to_pandas()
    mat = np.zeros((depth, width), np.int64)
    mat[cells["d"].to_numpy(), cells["idx"].to_numpy()] = \
        cells["cnt"].to_numpy()
    ref = ray.put(mat)

    def _est(batch: pa.Table) -> pd.DataFrame:
        m = cached_get(ref)
        vals = batch[key_col].to_pylist()
        est = np.full(len(vals), np.iinfo(np.int64).max, np.int64)
        for d in range(depth):
            est = np.minimum(est, m[d, _cms_hash(vals, d, width)])
        return pd.DataFrame({key_col: vals,
                             "est_count": est})

    return probes.map_batches(_est, batch_format="pyarrow")


def join_size_estimate(
    left: rd.Dataset,
    right: rd.Dataset,
    key_col: str,
    depth: int = 4,
    width: int = 64,
    num_buckets: int = 0,
) -> rd.Dataset:
    """Inner-equi-join cardinality, exact AND sketch-estimated, WITHOUT
    running the join → one row: (n_left, n_right, exact_pairs,
    cms_estimate). The query-planning primitive behind join-order /
    skew decisions: |A ⋈ B| = Σ_k cA(k)·cB(k).

    Exact path: per-side per-key count combiners (key-cardinality-sized
    tables, rows never shuffle), ONE co-location combine pairs the two
    count columns, Σ na·nb folds in a tiny task. Sketch path: the two
    count-min matrices are LINEAR sketches, so the join size estimate is
    min over depth rows of the row dot product Σ_w A[d][w]·B[d][w]
    (Alon-Matias-Szegedy style; collisions only ADD, so
    cms_estimate ≥ exact_pairs always) — depth×width integers per side
    regardless of key cardinality, the path that still works when even
    the per-key count table is too big to exchange."""
    num_buckets = resolve_num_buckets(num_buckets)
    from .agg import bucketed_combine, preagg_groupby

    def _counts(ds: rd.Dataset, out: str) -> rd.Dataset:
        c = preagg_groupby(ds.select_columns([key_col]), [key_col],
                           [("count", "", out)], num_buckets)

        def _pad(t: pa.Table, which=out) -> pa.Table:
            z = pa.array(np.zeros(t.num_rows, np.int64))
            cols = {key_col: t[key_col],
                    "na": t[which] if which == "na" else z,
                    "nb": t[which] if which == "nb" else z}
            return pa.table(cols)

        return c.map_batches(_pad, batch_format="pyarrow")

    both = _counts(left, "na").union(_counts(right, "nb"))
    paired = bucketed_combine(both, [key_col],
                              {"na": "sum", "nb": "sum"}, num_buckets)

    def _dot(t: pa.Table) -> pa.Table:
        na = t["na"].combine_chunks().to_numpy(zero_copy_only=False)
        nb = t["nb"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table({
            "exact_pairs": pa.array([int((na * nb).sum())], pa.int64()),
            "n_left": pa.array([int(na.sum())], pa.int64()),
            "n_right": pa.array([int(nb.sum())], pa.int64())})

    exact = paired.map_batches(_dot,
                               batch_format="pyarrow").repartition(1)

    def _fold(t: pa.Table) -> pd.DataFrame:
        return pd.DataFrame({
            "n_left": [int(pa.compute.sum(t["n_left"]).as_py() or 0)],
            "n_right": [int(pa.compute.sum(t["n_right"]).as_py() or 0)],
            "exact_pairs": [int(pa.compute.sum(t["exact_pairs"])
                                .as_py() or 0)]})

    exact_row = exact.map_batches(_fold, batch_size=None,
                                  batch_format="pyarrow")

    # sketch path: two depth×width matrices, estimate on the driver
    ca = cms_sketch(left, key_col, depth, width, num_buckets).to_pandas()
    cb = cms_sketch(right, key_col, depth, width,
                    num_buckets).to_pandas()
    ma = np.zeros((depth, width), np.int64)
    mb = np.zeros((depth, width), np.int64)
    ma[ca["d"].to_numpy(), ca["idx"].to_numpy()] = ca["cnt"].to_numpy()
    mb[cb["d"].to_numpy(), cb["idx"].to_numpy()] = cb["cnt"].to_numpy()
    est = int(min(int((ma[d] * mb[d]).sum()) for d in range(depth)))

    def _attach(df: pd.DataFrame) -> pd.DataFrame:
        df["cms_estimate"] = np.int64(est)
        return df

    return exact_row.map_batches(_attach, batch_format="pandas")
