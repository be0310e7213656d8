"""SemDeDup-style semantic deduplication over an embedding column.

Extends the dedup family (exact / MinHash / SimHash / n-gram Jaccard /
embedding-cosine pairs) with the cluster-then-prune shape of
Abbas et al. 2023 ("SemDeDup"): a k-means coarse quantizer partitions the
corpus into cells, and duplicates are detected ONLY within a cell — the
classic trick that turns O(n²) cosine comparison into
O(n·k + Σ m_c²) with bounded cells.

Dedup rule (total-order deterministic, so the distributed run and the
single-process golden agree exactly): within a cell, rows sorted by id;
row i is a duplicate iff some EARLIER row j (j < i, by id) has
cosine(v_i, v_j) ≥ threshold, and ``dup_of`` is the smallest such id.
Kept rows carry ``dup_of = -1``.

Scale shape: centroids train on a deterministic id-keyed sample on the
driver (a vocabulary-sized model — same as ``ann.ivf_topk``); cell
assignment is one broadcast matmul per batch; the only shuffle is the
``groupby(cell)`` co-location. Partitioning assumption: one cell fits a
worker (raise ``n_cells`` with corpus size; a cell that still overflows
needs a sub-split by id range — the similarity temps are already
row-chunked to stay small).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..functions.similarity import kmeans_fit
from .ann import _normalize, list_column_matrix


def semantic_dedup(
    corpus: rd.Dataset,
    n_cells: int = 16,
    threshold: float = 0.95,
    sample_mod: int = 4,
    kmeans_iters: int = 10,
    seed: int = 11,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> rd.Dataset:
    """→ (id_col, cell:int32, is_dup:bool, dup_of:int64, -1 when kept)."""

    def _samp(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.select([id_col, vec_col]).filter(
            pa.array(ids % sample_mod == 0))

    from .joins import collect_arrow

    sample = corpus.map_batches(_samp, batch_format="pyarrow")
    s_tbl = collect_arrow(sample)
    s_tbl = s_tbl.sort_by(id_col)  # partition-order-independent init
    centroids = kmeans_fit(list_column_matrix(s_tbl[vec_col]), n_cells,
                           iters=kmeans_iters, seed=seed)
    ref = ray.put(centroids)

    def _assign(batch: pa.Table) -> pa.Table:
        cent = ray.get(ref)
        mat = _normalize(list_column_matrix(batch[vec_col]))
        cell = np.argmax(mat @ cent.T, axis=1).astype(np.int32)
        return batch.select([id_col, vec_col]).append_column(
            "cell", pa.array(cell))

    assigned = corpus.map_batches(_assign, batch_format="pyarrow",
                                  batch_size=8192)

    def _dedup_cell(t: pa.Table) -> pa.Table:
        t = t.sort_by(id_col)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        cell = t["cell"].to_numpy(zero_copy_only=False)
        mat = _normalize(list_column_matrix(t[vec_col]))
        m = len(ids)
        dup_of = np.full(m, -1, dtype=np.int64)
        # row-chunk the m×m similarity so temps stay heap-recyclable
        # (<=8 MB — this sandbox punishes large fresh mmaps)
        chunk = max(1, (1 << 20) // max(1, m))
        for lo in range(1, m, chunk):
            hi = min(lo + chunk, m)
            sims = mat[lo:hi] @ mat.T  # (hi-lo, m)
            for r in range(lo, hi):
                row = sims[r - lo, :r] >= threshold
                j = int(np.argmax(row))
                if row[j]:
                    dup_of[r] = ids[j]
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "cell": pa.array(cell.astype(np.int32)),
            "is_dup": pa.array(dup_of != -1),
            "dup_of": pa.array(dup_of, pa.int64()),
        })

    return assigned.groupby("cell").map_groups(_dedup_cell,
                                               batch_format="pyarrow")
