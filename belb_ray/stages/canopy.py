"""Canopy clustering as cheap overlapping blocking (McCallum, Nigam &
Ungar 2000, "Efficient clustering of high-dimensional data sets with
application to reference matching" — the original use case IS record
linkage/deduplication).

Records get a CHEAP similarity (cosine over a hashed token-count vector);
canopy centers are picked greedily so no two centers are more similar
than ``t2_sim`` (tight), and every record joins EVERY canopy whose center
is at least ``t1_sim`` similar (loose, ``t1_sim < t2_sim`` in similarity
terms). Overlapping canopies then bound any expensive downstream pairwise
comparison — the canonical pre-blocking for ER (BELB analog: the homonym
group-bys restrict candidate identity merges, SURVEY §2.6 A2).

Distributed shape (the Mahout two-phase MapReduce formulation):

1. **featurize** — stateless ``map_batches``: tokens feature-hashed into
   a ``dim``-dimensional signed count vector, L2-normalized float64.
2. **local centers** — ONE ``groupby(bucket)`` shuffle (bucket = id-hash,
   deterministic) → per-bucket sequential greedy over id-sorted rows.
   Greedy selection is inherently order-dependent; pinning (bucket,
   id-order) makes it reproducible under any partitioning/block layout.
   The chunked implementation matmuls sims in blocks and only walks a
   boolean per row in Python.
3. **merge** — local centers are SMALL by construction (at most one per
   t2-ball per bucket); they collect to the driver under a loud
   ``max_centers`` budget (the `distinct_values` guard pattern) and the
   same greedy runs once over the id-sorted union.
4. **assign** — final center matrix broadcast once (``ray.put``); one
   streaming ``map_batches`` computes sims, emits membership rows for
   every center with ``sim ≥ t1_sim``, and guarantees coverage with a
   nearest-center fallback (ties → smallest center id). No shuffle.

Determinism across engines: sims are rounded to 6dp BEFORE every
threshold comparison, so a boundary flip would need two float paths to
differ within 5e-13 of a rounding edge.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd
from ..util import round_half_away

_TOKEN_RE = re.compile(r"[a-z0-9]+")
_MIX = np.uint64(0x9E3779B97F4A7C15)


def hashed_unit_vectors(texts: list[str], dim: int) -> np.ndarray:
    """Feature-hashed signed token-count vectors, L2-normalized, (n, dim)
    float64. Token hash = blake2b-8 (the repo-wide token hash); index =
    h % dim, sign = top bit. Pure kernel, replicated by the golden."""
    from ..functions.hashing import token_hashes

    cache: dict[str, int] = {}
    out = np.zeros((len(texts), dim), np.float64)
    for i, t in enumerate(texts):
        toks = _TOKEN_RE.findall((t or "").lower())
        if not toks:
            continue
        h = token_hashes(toks, cache)
        idx = (h % np.uint64(dim)).astype(np.int64)
        sgn = np.where((h >> np.uint64(63)).astype(bool), -1.0, 1.0)
        np.add.at(out[i], idx, sgn)
    norms = np.linalg.norm(out, axis=1)
    nz = norms > 0
    out[nz] /= norms[nz, None]
    return out


def greedy_centers(ids: np.ndarray, x: np.ndarray, t2_sim: float,
                   chunk: int = 512) -> np.ndarray:
    """Sequential greedy canopy-center selection over id-sorted rows:
    row i becomes a center iff its (6dp-rounded) sim to every already-
    picked center is < t2_sim. Returns the selected row indices (into the
    id-sorted order). Chunked: sims to prior centers and within-chunk
    sims are matmuls; the per-row walk is boolean lookups only."""
    order = np.argsort(ids, kind="stable")
    xs = x[order]
    n = len(ids)
    picked: list[int] = []
    c_rows: list[np.ndarray] = []
    for s in range(0, n, chunk):
        e = min(s + chunk, n)
        blk = xs[s:e]
        prior = (round_half_away(blk @ np.vstack(c_rows).T, 6)
                 if c_rows else np.zeros((e - s, 0)))
        intra = round_half_away(blk @ blk.T, 6)
        new_local: list[int] = []
        for r in range(e - s):
            if prior.shape[1] and (prior[r] >= t2_sim).any():
                continue
            if new_local and (intra[r, new_local] >= t2_sim).any():
                continue
            new_local.append(r)
            picked.append(s + r)
        if new_local:
            c_rows.append(blk[new_local])
    return order[np.array(picked, np.int64)] if picked else np.empty(0, np.int64)


def canopy_blocks(ds: rd.Dataset, id_col: str = "doc_id",
                  text_col: str = "text", t1_sim: float = 0.3,
                  t2_sim: float = 0.6, dim: int = 64,
                  num_buckets: int = 32,
                  max_centers: int = 200_000) -> rd.Dataset:
    """documents → (canopy_id, row_id, sim): overlapping cheap-similarity
    blocks. ``canopy_id`` is the center's record id; every record appears
    in every canopy with sim ≥ t1_sim, plus its nearest center as a
    coverage fallback. Requires ``t1_sim < t2_sim``."""
    import ray

    if not t1_sim < t2_sim:
        raise ValueError("canopy needs t1_sim < t2_sim (loose < tight)")

    def _feat(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        x = hashed_unit_vectors(batch[text_col].to_pylist(), dim)
        b = ((ids.astype(np.uint64) * _MIX) % np.uint64(num_buckets))
        return pa.table({
            "row_id": pa.array(ids),
            "vec": pa.FixedSizeListArray.from_arrays(
                pa.array(x.ravel(), pa.float64()), dim),
            "__bucket": pa.array(b.astype(np.int32)),
        })

    feats = ds.select_columns([id_col, text_col]).map_batches(
        _feat, batch_format="pyarrow").materialize()

    def _local(group: pa.Table) -> pa.Table:
        ids = group["row_id"].to_numpy()
        x = group["vec"].combine_chunks().flatten().to_numpy(
            zero_copy_only=False).reshape(len(ids), dim)
        sel = greedy_centers(ids, x, t2_sim)
        return pa.table({
            "row_id": pa.array(ids[sel], pa.int64()),
            "vec": pa.FixedSizeListArray.from_arrays(
                pa.array(x[sel].ravel(), pa.float64()), dim),
        })

    local = feats.groupby("__bucket").map_groups(
        _local, batch_format="pyarrow").materialize()
    n_local = local.count()
    if n_local > max_centers:
        raise ValueError(
            f"canopy_blocks: {n_local} local centers exceed the driver "
            f"budget max_centers={max_centers}; raise t2_sim (tighter "
            f"suppression) or the budget")

    parts = [t for t in ray.get(local.to_arrow_refs()) if t.num_rows]
    if not parts:
        # empty input (or zero local centers): empty result, not an
        # ArrowInvalid from pa.concat_tables([])
        return rd.from_arrow(pa.table({
            "canopy_id": pa.array([], pa.int64()),
            "row_id": pa.array([], pa.int64()),
            "sim": pa.array([], pa.float64())}))
    merged = pa.concat_tables(parts, promote_options="default")
    m_ids = merged["row_id"].to_numpy()
    m_x = merged["vec"].combine_chunks().flatten().to_numpy(
        zero_copy_only=False).reshape(len(m_ids), dim)
    sel = greedy_centers(m_ids, m_x, t2_sim)
    order = np.argsort(m_ids[sel], kind="stable")
    c_ids = m_ids[sel][order]
    c_x = np.ascontiguousarray(m_x[sel][order])
    ref = ray.put((c_ids, c_x))

    def _assign(batch: pa.Table) -> pa.Table:
        import ray as _r

        cids, cx = _r.get(ref)
        ids = batch["row_id"].to_numpy()
        x = batch["vec"].combine_chunks().flatten().to_numpy(
            zero_copy_only=False).reshape(len(ids), dim)
        sims = round_half_away(x @ cx.T, 6)
        member = sims >= t1_sim
        # coverage fallback: nearest center (argmax → smallest center id
        # on ties because centers are id-ascending)
        none = ~member.any(axis=1)
        if none.any():
            member[np.flatnonzero(none), sims[none].argmax(axis=1)] = True
        rr, cc = np.nonzero(member)
        return pa.table({
            "canopy_id": pa.array(cids[cc], pa.int64()),
            "row_id": pa.array(ids[rr], pa.int64()),
            "sim": pa.array(sims[rr, cc], pa.float64()),
        })

    return feats.drop_columns(["__bucket"]).map_batches(
        _assign, batch_format="pyarrow")
