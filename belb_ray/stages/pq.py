"""Product quantization (PQ) for embedding columns.

The memory-bound ANN scale path (Jégou et al. 2011, "Product
Quantization for Nearest Neighbor Search" — public algorithm): each
d-dim vector compresses to ``m`` uint8 codes (one sub-quantizer
centroid id per d/m-dim subspace), a 32x-plus compression that lets a
100 TB embedding corpus's index live in memory while the raw vectors
stay in Parquet. Search is ADC (asymmetric distance computation): per
query ONE (m × k) lookup table of subspace distances, then each code
row scores with m table gathers — no float matmul against the corpus.

Distributed shape: TRAIN collects only a deterministic id-keyed sample
(``id % sample_mod == 0``) to fit per-subspace k-means — sample-sized,
not corpus-sized. ENCODE broadcasts the (m, k, d/m) codebook tensor
once (``ray.put``) and streams the corpus through one vectorized
map_batches (argmin over squared distances per subspace) emitting
``fixed_size_binary(m)`` codes. SEARCH broadcasts the query LUTs,
computes per-block partial top-k, and merges with one small bucketed
combine — the cosine_topk_search shape with gathers instead of matmul.

Determinism: k-means is seeded/fixed-iteration over the id-sorted
sample; encode argmin takes the first minimal centroid; distances sum
subspaces in fixed order — the distributed op and the single-process
golden produce identical codes and distances bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..functions.similarity import kmeans_fit_l2
from ..util import cached_get, resolve_num_buckets
from .ann import list_column_matrix
from .joins import collect_arrow
from ..util import round_half_away


def pq_train(
    corpus: rd.Dataset,
    m: int = 8,
    k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_mod: int = 4,
    iters: int = 10,
    seed: int = 11,
) -> np.ndarray:
    """Fit per-subspace codebooks → (m, k, d/m) float64 tensor.

    The training sample is id-keyed (``id % sample_mod == 0``) and
    id-sorted before k-means, so it is partition-order independent."""

    def _samp(t: pa.Table) -> pa.Table:
        ids = t[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % sample_mod == 0))

    s_tbl = collect_arrow(corpus.select_columns([id_col, vec_col])
                          .map_batches(_samp, batch_format="pyarrow"))
    order = pc.sort_indices(s_tbl[id_col])
    mat = list_column_matrix(s_tbl.take(order)[vec_col])
    n, d = mat.shape
    if d % m:
        raise ValueError(f"pq_train: dim {d} not divisible by m={m}")
    sub = d // m
    books = np.empty((m, min(k, n), sub), np.float64)
    for j in range(m):
        books[j] = kmeans_fit_l2(mat[:, j * sub:(j + 1) * sub], k,
                                 iters=iters, seed=seed + j)
    return books


def _encode_mat(mat: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, d) → (n, m) uint8 codes: per subspace, argmin squared
    distance (first-index tie-break)."""
    n = mat.shape[0]
    m, _, sub = books.shape
    codes = np.empty((n, m), np.uint8)
    for j in range(m):
        x = mat[:, j * sub:(j + 1) * sub]
        d2 = ((x[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
        codes[:, j] = np.argmin(d2, axis=1).astype(np.uint8)
    return codes


def pq_encode(
    corpus: rd.Dataset,
    books: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> rd.Dataset:
    """Corpus → (id, code fixed_size_binary(m)). Codebooks broadcast
    once; one streaming vectorized pass."""
    m = books.shape[0]
    ref = ray.put(np.ascontiguousarray(books))

    def _enc(t: pa.Table) -> pa.Table:
        b = cached_get(ref)
        codes = _encode_mat(list_column_matrix(t[vec_col]), b)
        # one buffer copy total (sig_array's device) — no per-row bytes
        code_arr = pa.Array.from_buffers(
            pa.binary(m), len(codes),
            [None, pa.py_buffer(np.ascontiguousarray(codes).tobytes())])
        return pa.table({id_col: t[id_col], "code": code_arr})

    return corpus.select_columns([id_col, vec_col]).map_batches(
        _enc, batch_format="pyarrow")


def pq_search(
    codes: rd.Dataset,
    books: np.ndarray,
    queries: pa.Table,
    k: int = 10,
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    vec_col: str = "embedding",
    round_to: int = 6,
    num_buckets: int = 0,
) -> rd.Dataset:
    """ADC top-k: → (query_id, vec_id, dist), the k smallest
    approximate squared L2 distances per query (ties → smaller id).

    Per-block partial top-k over the code table (m uint8 gathers per
    code row against the broadcast per-query LUTs), then one bucketed
    per-query merge — the corpus codes stream, nothing corpus-sized
    materializes."""
    num_buckets = resolve_num_buckets(num_buckets)
    m, kcent, sub = books.shape
    qids = queries[query_id_col].to_numpy(zero_copy_only=False)
    qmat = list_column_matrix(queries[vec_col])
    # (q, m, kcent) LUT: squared distance of each query subvector to
    # every centroid of that subspace
    lut = np.empty((len(qids), m, kcent), np.float64)
    for j in range(m):
        qs = qmat[:, j * sub:(j + 1) * sub]
        lut[:, j, :] = ((qs[:, None, :] - books[j][None, :, :]) ** 2) \
            .sum(axis=2)
    ref = ray.put((qids.copy(), np.ascontiguousarray(lut)))

    def _partial(t: pa.Table) -> pa.Table:
        qids, lut = cached_get(ref)
        n = t.num_rows
        if n == 0:
            return pa.table({query_id_col: pa.array([], pa.int64()),
                             id_col: pa.array([], pa.int64()),
                             "dist": pa.array([], pa.float64())})
        ids = t[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        col = t["code"].combine_chunks()
        # zero-copy flat-buffer view (sig_matrix's device)
        flat = np.frombuffer(col.buffers()[1], np.uint8)
        codes = flat[col.offset * m:(col.offset + n) * m].reshape(n, m)
        out_q, out_i, out_d = [], [], []
        for qi in range(len(qids)):
            dist = np.zeros(n, np.float64)
            for j in range(m):
                dist += lut[qi, j][codes[:, j]]
            kk = min(k, n)
            # smallest-distance k with (dist, id) tie order
            part = np.lexsort((ids, dist))[:kk]
            out_q.append(np.full(kk, qids[qi], np.int64))
            out_i.append(ids[part])
            out_d.append(dist[part])
        return pa.table({query_id_col: np.concatenate(out_q),
                         id_col: np.concatenate(out_i),
                         "dist": np.concatenate(out_d)})

    partials = codes.map_batches(_partial, batch_format="pyarrow")

    def _bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_array(batch[query_id_col].to_numpy(),
                               categorize=False)
        batch["__bucket"] = (h % np.uint64(num_buckets)).astype(np.int32)
        return batch

    def _merge(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop(columns="__bucket").sort_values(
            [query_id_col, "dist", id_col], kind="mergesort")
        g = g.groupby(query_id_col, sort=False).head(k)
        g["dist"] = round_half_away(g["dist"].to_numpy(), round_to)
        return g

    return (partials.map_batches(_bucketize, batch_format="pandas")
            .groupby("__bucket").map_groups(_merge, batch_format="pandas"))
