"""Interval-overlap (range) join — a custom operator Ray Data lacks.

Join two interval-shaped tables on ``[start, end]`` overlap (closed
intervals: ``l.start <= r.end AND r.start <= l.end``), optionally with an
equality key. The reference engine has no temporal/range joins (SURVEY
§2.5 ends at hash/broadcast/interval-assignment); this is a graft
extension built from the same primitives as ``asof.asof_join``:

1. each side explodes its interval across the fixed-width time bins it
   overlaps (bounded replication: ``interval_len / bin_width + 1`` copies
   per row — choose ``bin_width`` at or above the typical interval
   length, exactly the hopping-window tradeoff in ``windows.py``),
2. both sides tag + align schemas, union, and ONE bucketed shuffle on
   ``hash(key, bin)`` co-locates everything that can possibly pair,
3. per bucket: ONE vectorized sweep over ALL (key, bin) groups at once —
   rights lexsorted by (group, start), each left's candidate slice found
   with a merge-rank trick (np.lexsort over the concatenated rights +
   query bounds; no per-group or per-row Python), then the exact overlap
   mask,
4. a pair overlapping several bins is emitted exactly once: only in the
   bin containing ``max(l.start, r.start)`` (both sides replicate into
   that bin whenever the pair truly overlaps, so no pair is lost).

Partitioning assumption (documented per the task brief): one (key, bin)
group's rows fit a worker and pair in-memory — the candidate scan within
a group is worst-case O(nl·nr), bounded by the bin width. Shrink
``bin_width`` for denser streams; salt pathological keys upstream.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from .joins import _bucket_of

from belb_ray.util import resolve_num_buckets


def _ragged_ranges(lo: np.ndarray, hi: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """For per-row index ranges [lo_i, hi_i) return (row_idx, flat_idx)
    fully vectorized: row i repeated (hi_i - lo_i) times next to the
    concatenated aranges."""
    cnt = np.maximum(hi - lo, 0)
    total = int(cnt.sum())
    row = np.repeat(np.arange(len(cnt), dtype=np.int64), cnt)
    if total == 0:
        return row, np.empty(0, dtype=np.int64)
    starts = np.concatenate(([0], np.cumsum(cnt)[:-1]))
    flat = np.arange(total, dtype=np.int64) - np.repeat(starts - lo, cnt)
    return row, flat


def _group_upper_bound(r_gid: np.ndarray, r_val: np.ndarray,
                       q_gid: np.ndarray, q_val: np.ndarray) -> np.ndarray:
    """count of rights with (gid < q_gid) OR (gid == q_gid AND val <= q_val)
    for every query — one np.lexsort over rights+queries, no per-group
    searchsorted dispatch. Rights must already be sorted by (gid, val)."""
    nr, nq = len(r_gid), len(q_gid)
    all_g = np.concatenate([r_gid, q_gid])
    all_v = np.concatenate([r_val, q_val])
    # queries sort AFTER rights at equal (gid, val) → inclusive bound
    flag = np.concatenate([np.zeros(nr, np.int8), np.ones(nq, np.int8)])
    order = np.lexsort((flag, all_v, all_g))
    csum = np.cumsum(order < nr)  # rights seen at-or-before each position
    pos = np.empty(nr + nq, dtype=np.int64)
    pos[order] = np.arange(nr + nq)
    return csum[pos[nr:]]


def interval_join(
    left: rd.Dataset,
    right: rd.Dataset,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    key: str | None = None,
    bin_width: int | None = None,
    suffix: str = "_r",
    num_buckets: int = 0,
) -> rd.Dataset:
    """Inner join of ``left`` × ``right`` on closed-interval overlap
    (``l.start <= r.end AND r.start <= l.end``), plus ``key`` equality
    when given. Start/end columns may be timestamps or integers; they are
    compared on their int64 representation (µs for timestamps).

    ``bin_width`` is in the column's int64 unit (µs for timestamps) and
    defaults to 3600 s. Output = all left columns + all right columns,
    right names suffixed on collision.
    """
    num_buckets = resolve_num_buckets(num_buckets)
    import pyarrow as pa
    import pyarrow.compute as pc

    if bin_width is None:
        bin_width = 3600 * 1_000_000
    bw = int(bin_width)

    lschema, rschema = left.schema(), right.schema()
    lcols = list(lschema.names)
    # the equality key (if any) is shared: one output column, never
    # suffixed — same convention as asof_join
    rcols = [c for c in rschema.names if c != key]
    rename = {c: c + suffix if c in lcols else c for c in rcols}
    rcols_out = [rename[c] for c in rcols]
    ltypes = dict(zip(lschema.names, lschema.types))
    rtypes = {rename[c]: t for c, t in zip(rschema.names, rschema.types)
              if c != key}
    all_cols = lcols + rcols_out

    def _as_i64(arr: pa.ChunkedArray) -> pa.ChunkedArray:
        t = arr.type
        if pa.types.is_timestamp(t) or pa.types.is_date(t):
            return pc.cast(pc.cast(arr, pa.timestamp("us")), pa.int64())
        return pc.cast(arr, pa.int64())

    def _prep(side: int, ren: dict[str, str], s_col: str, e_col: str):
        def fn(batch: pa.Table) -> pa.Table:
            if ren:
                batch = batch.rename_columns(
                    [ren.get(c, c) for c in batch.column_names])
            s = _as_i64(batch[ren.get(s_col, s_col)]).combine_chunks()
            e = _as_i64(batch[ren.get(e_col, e_col)]).combine_chunks()
            sv = s.to_numpy(zero_copy_only=False)
            ev = np.maximum(e.to_numpy(zero_copy_only=False), sv)
            b0 = sv // bw
            nbins = (ev // bw - b0 + 1).astype(np.int64)
            idx = np.repeat(np.arange(len(sv), dtype=np.int64), nbins)
            _, off = _ragged_ranges(np.zeros(len(sv), np.int64), nbins)
            bins = np.repeat(b0, nbins) + off
            out = batch.take(pa.array(idx))
            n = out.num_rows
            cols = {}
            for c in all_cols:
                if c in out.column_names:
                    cols[c] = out[c]
                else:
                    cols[c] = pa.nulls(n, ltypes.get(c) or rtypes.get(c))
            cols["__s"] = pa.array(np.repeat(sv, nbins))
            cols["__e"] = pa.array(np.repeat(ev, nbins))
            cols["__bin"] = pa.array(bins)
            out = pa.table(cols)
            if key is not None:
                bkey = pc.binary_join_element_wise(
                    pc.cast(out[key], pa.string()),
                    pc.cast(out["__bin"], pa.string()), "\x1f")
            else:
                bkey = pc.cast(out["__bin"], pa.string())
            out = out.append_column("__bucket", _bucket_of(bkey, num_buckets))
            return out.append_column(
                "__side", pa.array(np.full(n, side, dtype=np.int8)))

        return fn

    lt = left.map_batches(_prep(0, {}, left_start, left_end),
                          batch_format="pyarrow")
    rt = right.map_batches(_prep(1, rename, right_start, right_end),
                           batch_format="pyarrow")
    both = lt.union(rt)

    # inner join: left columns are never null in the output, but the
    # aligned union widened them through a nullable pass — restore ints
    cast_back = {c: np.dtype(t.to_pandas_dtype())
                 for c, t in list(ltypes.items()) + list(rtypes.items())
                 if pa.types.is_integer(t)}

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        lm = g["__side"].to_numpy() == 0
        lp = g[lm]
        rp = g[~lm]
        if not len(lp) or not len(rp):
            return pd.DataFrame({c: pd.Series(dtype=g[c].dtype)
                                 for c in all_cols}).astype(cast_back)
        # exact (key, bin) group ids — factorized, collision-free
        gcols = ([key, "__bin"] if key is not None else ["__bin"])
        gid_all = g.groupby(gcols, sort=False).ngroup().to_numpy()
        l_gid, r_gid = gid_all[lm], gid_all[~lm]
        r_s = rp["__s"].to_numpy()
        r_e = rp["__e"].to_numpy()
        order = np.lexsort((r_s, r_gid))
        r_gid, r_s, r_e = r_gid[order], r_s[order], r_e[order]
        l_s = lp["__s"].to_numpy()
        l_e = lp["__e"].to_numpy()
        lo = np.searchsorted(r_gid, l_gid, side="left")
        hi = _group_upper_bound(r_gid, r_s, l_gid, l_e)
        li, ri = _ragged_ranges(lo, hi)
        # candidates have r_start <= l_end and same (key, bin);
        # keep true overlaps, once: only in the bin of max(start, start)
        ms = np.maximum(l_s[li], r_s[ri])
        keep = (r_e[ri] >= l_s[li]) & (
            ms // bw == lp["__bin"].to_numpy()[li])
        li, ri = li[keep], ri[keep]
        out = {}
        for c in lcols:
            out[c] = lp[c].to_numpy()[li]
        rsrc = rp.iloc[order]
        for c in rcols_out:
            out[c] = rsrc[c].to_numpy()[ri]
        return pd.DataFrame(out)[all_cols].astype(cast_back)

    return both.groupby("__bucket").map_groups(_pairs,
                                               batch_format="pandas")
