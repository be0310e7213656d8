"""Approximate/exact nearest-neighbor search over an embedding column.

Training-data-pipeline ops the reference does not have (its only
similarity op is the synset mean Levenshtein ratio,
belb/scripts/stats.py:203-250 — SURVEY §2.6 A12); these are first-class
components of the 100 TB engine:

- ``cosine_topk_search`` — EXACT brute-force cosine top-k, distributed the
  scalable way: the (small) query matrix is ``ray.put`` once and every
  corpus block computes a partial top-k against it (one numpy matmul per
  batch); partials merge in a tiny ``groupby(query_id)``. Corpus streams,
  queries broadcast — never the reverse.
- ``lsh_bucket_topk`` — the scale path: random-hyperplane signatures put
  corpus AND queries into LSH band buckets; candidates only from shared
  buckets (recall < 1, cost ≪ n·q).
- ``embedding_neardup_pairs`` — embedding-cosine near-duplicate detection:
  all pairs with cosine ≥ threshold, corpus blocks vs broadcast matrix
  (exact; LSH variant via ``lsh_neardup_pairs``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd


def list_column_matrix(col: pa.ChunkedArray | pa.Array, dtype=np.float64) -> np.ndarray:
    """(n, d) matrix from an Arrow list<float> column (zero-copy flatten)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(dtype)
    n = len(col)
    if n == 0:
        return flat.reshape(0, 0)
    return flat.reshape(n, flat.size // n)


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def cosine_topk_search(
    corpus: rd.Dataset,
    queries: pa.Table,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> rd.Dataset:
    """→ (query_id, neighbor_id, rank, sim). Deterministic: ranked by
    (-sim, neighbor_id); exact over the whole corpus."""
    q_ids = queries[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    q_mat = _normalize(list_column_matrix(queries[vec_col]))
    ref = ray.put((q_ids, q_mat))

    def _partial_topk(batch: pa.Table) -> pa.Table:
            q_ids, q_mat = ray.get(ref)  # zero-copy numpy from plasma
            c_ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            c_mat = _normalize(list_column_matrix(batch[vec_col]))
            sims = q_mat @ c_mat.T  # (q, n)
            out_q, out_n, out_s = [], [], []
            kk = min(k + (1 if exclude_self else 0), sims.shape[1])
            if kk == 0:
                return pa.table({"query_id": pa.array([], pa.int64()),
                                 "neighbor_id": pa.array([], pa.int64()),
                                 "sim": pa.array([], pa.float64())})
            part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
            for qi in range(len(q_ids)):
                idx = part[qi]
                s = sims[qi, idx]
                order = np.lexsort((c_ids[idx], -s))
                idx, s = idx[order], s[order]
                if exclude_self:
                    keep = c_ids[idx] != q_ids[qi]
                    idx, s = idx[keep][:k], s[keep][:k]
                out_q.append(np.full(len(idx), q_ids[qi], np.int64))
                out_n.append(c_ids[idx])
                out_s.append(s)
            return pa.table({
                "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                "neighbor_id": pa.array(np.concatenate(out_n), pa.int64()),
                "sim": pa.array(np.concatenate(out_s), pa.float64()),
            })

    partials = corpus.map_batches(_partial_topk, batch_format="pyarrow",
                                  batch_size=4096)

    def _merge(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["sim", "neighbor_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_id", "neighbor_id", "rank", "sim"]]

    return partials.groupby("query_id").map_groups(_merge, batch_format="pandas")


def embedding_neardup_pairs(
    corpus: rd.Dataset,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_broadcast_rows: int = 2_000_000,
) -> rd.Dataset:
    """Embedding-cosine near-dup pairs (id_a < id_b, sim ≥ threshold).

    EXACT path: corpus blocks stream against a broadcast of the full
    (normalized) matrix — right while the matrix fits the object store
    (n·d·8 bytes). Past ``max_broadcast_rows`` the op AUTO-SWITCHES to
    the LSH-bucketed path (``lsh_neardup_pairs``): no driver-side O(n·d)
    materialization at any scale, at the documented cost of recall < 1.
    Pass ``max_broadcast_rows=None`` to force the exact path."""
    if max_broadcast_rows is not None:
        # count BEFORE the projection: on a pure read this is parquet
        # metadata (free); counting the projected dataset would execute a
        # full extra pass just to pick the path
        n = corpus.count()
        if n > max_broadcast_rows:
            import logging

            first = corpus.take(1)[0]
            dim = len(first[vec_col])
            logging.getLogger(__name__).warning(
                "embedding_neardup_pairs: %d rows exceed the %d-row exact "
                "budget — switching to the LSH path (recall < 1)", n,
                max_broadcast_rows)
            return lsh_neardup_pairs(corpus, dim=dim, threshold=threshold,
                                     id_col=id_col, vec_col=vec_col)
    from .joins import collect_arrow

    # Quantized-exact cosine: components snap to integers at 2^21 units
    # and every dot product is then EXACT in float64 BLAS (|c| ≤ ~2^22,
    # 128-dim partial sums < 2^53), so the similarity — and the
    # threshold cut — is bit-identical under any partitioning, batch
    # size, or summation order, and the SQL oracle reproduces it from
    # the same integer lists. Quantization error < 1e-6 of true cosine
    # (far under any near-dup threshold's discrimination). The previous
    # pre-normalized float matmul disagreed with the oracle's own float
    # reduction at 4dp for ~1 in 4k pairs at sf0.1 (boundary straddle).
    _Q = np.float64(2097152.0)  # 2^21

    full = collect_arrow(corpus.select_columns([id_col, vec_col]))
    all_ids = full[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    from ..util import round_half_away
    all_mat = round_half_away(
        list_column_matrix(full[vec_col]).astype(np.float64) * _Q)
    all_n2 = np.einsum("ij,ij->i", all_mat, all_mat)  # exact ints
    ref = ray.put((all_ids, all_mat, all_n2))

    def _pairs(batch: pa.Table) -> pa.Table:
            all_ids, all_mat, all_n2 = ray.get(ref)  # zero-copy numpy
            b_ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            from ..util import round_half_away
            b_mat = round_half_away(
                list_column_matrix(batch[vec_col]).astype(np.float64) * _Q)
            b_n2 = np.einsum("ij,ij->i", b_mat, b_mat)
            dots = b_mat @ all_mat.T  # exact integer-valued doubles
            sims = dots / np.sqrt(b_n2[:, None] * all_n2[None, :])
            bi, aj = np.nonzero(sims >= threshold)
            ia, ib = b_ids[bi], all_ids[aj]
            keep = ia < ib  # total order: each pair emitted once
            return pa.table({
                "id_a": pa.array(ia[keep], pa.int64()),
                "id_b": pa.array(ib[keep], pa.int64()),
                "sim": pa.array(sims[bi, aj][keep], pa.float64()),
            })

    return corpus.map_batches(_pairs, batch_format="pyarrow",
                              batch_size=2048)


class HyperplaneSigner:
    """Random-hyperplane LSH signer (stateful stage): ``bits``-bit sign
    signature of each vector, split into ``bands`` band keys. The
    hyperplane matrix is drawn once per actor/process from a fixed seed.
    Usable as an actor-pool class OR via the per-process memo
    (``cached_signer``) on a task-pool map — the task-pool form measured
    ~3x faster when per-batch work is small (see stages/blocking.py)."""

    def __init__(self, dim: int, bits: int = 64, bands: int = 8, seed: int = 13,
                 id_col: str = "vec_id", vec_col: str = "embedding"):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((dim, bits))
        self.bits = bits
        self.bands = bands
        self.id_col, self.vec_col = id_col, vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = list_column_matrix(batch[self.vec_col])
        signs = (mat @ self.planes) > 0  # (n, bits)
        r = self.bits // self.bands
        weights = (1 << np.arange(r, dtype=np.int64))
        n = signs.shape[0]
        keys = np.empty((n, self.bands), dtype=np.int64)
        for b in range(self.bands):
            chunk = signs[:, b * r:(b + 1) * r].astype(np.int64)
            keys[:, b] = (chunk @ weights) + (int(b) << 32)
        ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "block_key": pa.array(keys.ravel(), pa.int64()),
            "row_id": pa.array(np.repeat(ids, self.bands), pa.int64()),
        })


def lsh_bucket_topk(
    corpus: rd.Dataset,
    queries: pa.Table,
    k: int = 5,
    dim: int | None = None,
    bits: int = 64,
    bands: int = 8,
    seed: int = 13,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> rd.Dataset:
    """Approximate LSH-bucketed cosine top-k → (query_id, neighbor_id,
    rank, sim): candidates are only corpus rows sharing ≥1 hyperplane
    band with the query (recall < 1 — the scale path next to the exact
    ``cosine_topk_search``). Query signatures + the bucket→query map are
    built once on the driver (queries are small by contract) and
    broadcast; the corpus streams, each batch re-deriving its band keys
    from the shared seed and scoring only bucket-collision candidates."""
    q_ids = queries[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    q_mat = _normalize(list_column_matrix(queries[vec_col]))
    if dim is None:
        dim = q_mat.shape[1]
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, bits))
    r = bits // bands
    weights = (1 << np.arange(r, dtype=np.int64))

    def _band_keys(mat: np.ndarray) -> np.ndarray:
        signs = (mat @ planes) > 0
        keys = np.empty((mat.shape[0], bands), dtype=np.int64)
        for b in range(bands):
            keys[:, b] = (signs[:, b * r:(b + 1) * r].astype(np.int64)
                          @ weights) + (int(b) << 32)
        return keys

    qk = _band_keys(q_mat)
    bucket_to_q: dict[int, list[int]] = {}
    for qi in range(len(q_ids)):
        for b in range(bands):
            bucket_to_q.setdefault(int(qk[qi, b]), []).append(qi)
    ref = ray.put((q_ids, q_mat, bucket_to_q))

    def _partial(batch: pa.Table) -> pa.Table:
        q_ids, q_mat, buckets = ray.get(ref)
        c_ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        c_mat = _normalize(list_column_matrix(batch[vec_col]))
        ck = _band_keys(c_mat)
        out_q, out_n, ci_list, qi_list = [], [], [], []
        for ci in range(len(c_ids)):
            cand: set[int] = set()
            for b in range(bands):
                cand.update(buckets.get(int(ck[ci, b]), ()))
            for qi in cand:
                if exclude_self and q_ids[qi] == c_ids[ci]:
                    continue
                ci_list.append(ci)
                qi_list.append(qi)
        if not ci_list:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        ci_a = np.asarray(ci_list)
        qi_a = np.asarray(qi_list)
        sims = (c_mat[ci_a] * q_mat[qi_a]).sum(axis=1)
        return pa.table({
            "query_id": pa.array(q_ids[qi_a], pa.int64()),
            "neighbor_id": pa.array(c_ids[ci_a], pa.int64()),
            "sim": pa.array(sims, pa.float64()),
        })

    partials = corpus.map_batches(_partial, batch_format="pyarrow",
                                  batch_size=4096)

    def _merge(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["sim", "neighbor_id"],
                              ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_id", "neighbor_id", "rank", "sim"]]

    return partials.groupby("query_id").map_groups(_merge,
                                                   batch_format="pandas")


def ivf_topk(
    corpus: rd.Dataset,
    queries: pa.Table,
    k: int = 5,
    n_cells: int = 64,
    nprobe: int = 4,
    sample_mod: int = 4,
    kmeans_iters: int = 10,
    seed: int = 11,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> rd.Dataset:
    """IVF (inverted-file) approximate cosine top-k — the coarse-quantizer
    scale path next to ``lsh_bucket_topk``:

    1. TRAIN: a deterministic id-keyed sample (``id % sample_mod == 0`` —
       partition-order independent) trains spherical k-means on the
       driver (the quantizer is a vocabulary-sized model, not the corpus).
    2. PROBE: each query selects its ``nprobe`` nearest cells.
    3. SCAN: the corpus streams; each batch assigns rows to their nearest
       cell (one matmul) and scores rows ONLY against queries probing
       that cell. Recall < 1 by construction (documented tradeoff);
       cost ≈ corpus · (n_cells + q·nprobe/n_cells) instead of corpus·q.
    """
    from ..functions.similarity import kmeans_fit

    def _samp(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.select([id_col, vec_col]).filter(
            pa.array(ids % sample_mod == 0))

    from .joins import collect_arrow

    sample = corpus.map_batches(_samp, batch_format="pyarrow")
    s_tbl = collect_arrow(sample)
    # sort by id: kmeans init draws rows by POSITION, so the sample must
    # be in a partition-independent order
    s_tbl = s_tbl.sort_by(id_col)
    s_mat = list_column_matrix(s_tbl[vec_col])
    centroids = kmeans_fit(s_mat, n_cells, iters=kmeans_iters, seed=seed)

    q_ids = queries[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    q_mat = _normalize(list_column_matrix(queries[vec_col]))
    q_sims = q_mat @ centroids.T
    nprobe_eff = min(nprobe, centroids.shape[0])
    # full stable argsort (not argpartition): the probed SET must be
    # identical in the single-process oracle, including tie handling
    probe = np.argsort(-q_sims, axis=1, kind="stable")[:, :nprobe_eff]
    cell_to_q: dict[int, list[int]] = {}
    for qi in range(len(q_ids)):
        for c in probe[qi]:
            cell_to_q.setdefault(int(c), []).append(qi)
    ref = ray.put((q_ids, q_mat, centroids, cell_to_q))

    def _partial(batch: pa.Table) -> pa.Table:
        q_ids, q_mat, centroids, cell_to_q = ray.get(ref)
        c_ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        c_mat = _normalize(list_column_matrix(batch[vec_col]))
        assign = np.argmax(c_mat @ centroids.T, axis=1)
        ci_list, qi_list = [], []
        for ci in range(len(c_ids)):
            for qi in cell_to_q.get(int(assign[ci]), ()):
                if exclude_self and q_ids[qi] == c_ids[ci]:
                    continue
                ci_list.append(ci)
                qi_list.append(qi)
        if not ci_list:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        ci_a = np.asarray(ci_list)
        qi_a = np.asarray(qi_list)
        sims = (c_mat[ci_a] * q_mat[qi_a]).sum(axis=1)
        return pa.table({
            "query_id": pa.array(q_ids[qi_a], pa.int64()),
            "neighbor_id": pa.array(c_ids[ci_a], pa.int64()),
            "sim": pa.array(sims, pa.float64()),
        })

    partials = corpus.map_batches(_partial, batch_format="pyarrow",
                                  batch_size=4096)

    def _merge(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["sim", "neighbor_id"],
                              ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_id", "neighbor_id", "rank", "sim"]]

    return partials.groupby("query_id").map_groups(_merge,
                                                   batch_format="pandas")


# per-worker-process signer memo (Ray reuses worker processes) — the
# task-pool analog of stages/blocking.py::cached_blocker
_SIGNER_CACHE: dict[tuple, HyperplaneSigner] = {}


def cached_signer(dim: int, bits: int, bands: int, seed: int,
                  id_col: str, vec_col: str) -> HyperplaneSigner:
    key = (dim, bits, bands, seed, id_col, vec_col)
    s = _SIGNER_CACHE.get(key)
    if s is None:
        s = _SIGNER_CACHE[key] = HyperplaneSigner(
            dim=dim, bits=bits, bands=bands, seed=seed,
            id_col=id_col, vec_col=vec_col)
    return s


def lsh_neardup_pairs(
    corpus: rd.Dataset,
    dim: int,
    threshold: float = 0.95,
    bits: int = 64,
    bands: int = 8,
    seed: int = 13,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_block: int = 256,
    broadcast_threshold: int = 2_000_000,
) -> rd.Dataset:
    """Scale path for near-dup detection: LSH buckets → candidate pairs →
    exact cosine check. Recall < 1 by construction (documented tradeoff).

    Vector attach is size-aware like ``scoring.attach_features``: under
    ``broadcast_threshold`` rows the (float32) matrix broadcasts once and
    pairs gather per batch (zero join shuffles — two chained joins cost
    ~6 sequential shuffle barriers of fixed latency); past it, two
    hash-partitioned joins carry vectors as fixed-width binary."""
    from .pairs import candidate_pairs
    from .joins import hash_partition_join

    n = corpus.count()  # metadata-only on a pure read

    def _sign(batch: pa.Table) -> pa.Table:
        return cached_signer(dim, bits, bands, seed, id_col, vec_col)(batch)

    blocks = corpus.map_batches(_sign, batch_format="pyarrow",
                                batch_size=4096)
    pairs = candidate_pairs(blocks, max_block=max_block, window=16)

    def _empty() -> pa.Table:
        return pa.table({"id_a": pa.array([], pa.int64()),
                         "id_b": pa.array([], pa.int64()),
                         "sim": pa.array([], pa.float64())})

    if n <= broadcast_threshold:
        from .joins import collect_arrow

        full = collect_arrow(corpus.select_columns([id_col, vec_col]))
        ids = full[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(ids, kind="stable")
        ids_sorted = ids[order]
        mat32 = list_column_matrix(full[vec_col], dtype=np.float32)[order]
        ref = ray.put((ids_sorted, mat32))

        from ..util import cached_get

        def _check_bc(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return _empty()
            ids_s, mat = cached_get(ref)
            ia = np.searchsorted(ids_s, batch["id_a"].to_numpy())
            ib = np.searchsorted(ids_s, batch["id_b"].to_numpy())
            a = _normalize(mat[ia].astype(np.float64))
            b = _normalize(mat[ib].astype(np.float64))
            sim = (a * b).sum(axis=1)
            keep = sim >= threshold
            return pa.table({
                "id_a": batch["id_a"].filter(pa.array(keep)),
                "id_b": batch["id_b"].filter(pa.array(keep)),
                "sim": pa.array(sim[keep], pa.float64()),
            })

        return pairs.map_batches(_check_bc, batch_format="pyarrow",
                                 batch_size=8192)

    # vectors cross the pair join as fixed-width binary (pyarrow joins
    # cannot carry list<float> payload columns)
    def _pack(t: pa.Table) -> pa.Table:
        mat = list_column_matrix(t[vec_col], dtype=np.float32)
        return pa.table({"row_id": t[id_col],
                         "vec": pa.array([mat[i].tobytes() for i in range(len(mat))],
                                         pa.binary())})

    vecs = corpus.map_batches(_pack, batch_format="pyarrow")
    va = vecs.map_batches(lambda t: t.rename_columns(["id_a", "vec_a"]),
                          batch_format="pyarrow")
    vb = vecs.map_batches(lambda t: t.rename_columns(["id_b", "vec_b"]),
                          batch_format="pyarrow")
    pf = hash_partition_join(pairs, va, key="id_a", num_buckets=16)
    pf = hash_partition_join(pf, vb, key="id_b", num_buckets=16)

    def _unpack(col) -> np.ndarray:
        flat = np.frombuffer(b"".join(col.to_pylist()), dtype=np.float32)
        return flat.reshape(len(col), -1).astype(np.float64)

    def _check(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty()
        a = _normalize(_unpack(batch["vec_a"]))
        b = _normalize(_unpack(batch["vec_b"]))
        sim = (a * b).sum(axis=1)
        keep = sim >= threshold
        return pa.table({
            "id_a": batch["id_a"].filter(pa.array(keep)),
            "id_b": batch["id_b"].filter(pa.array(keep)),
            "sim": pa.array(sim[keep], pa.float64()),
        })

    return pf.map_batches(_check, batch_format="pyarrow", batch_size=8192)
