"""Distributed PCA over an embedding (list<float>) column.

Classic two-pass shape — the d×d problem never touches more than one
block of data at a time:

1. **moments** — every block emits ONE row of fixed width: (n, Σx ∈ ℝᵈ,
   Σxxᵀ ∈ ℝ^{d×d} flattened). The driver sums the per-block rows (one row
   per block — thousands of doubles total even at 100 TB input) and
   forms the covariance ``C = Σxxᵀ/n − μμᵀ``.
2. **eigh + project** — the d×d eigendecomposition runs on the driver
   (d is the embedding width, tiny), the top-k component matrix is
   broadcast once, and the projection streams through ``map_batches``
   as one matmul per batch.

Sign convention: each component is flipped so its largest-|coordinate|
entry is positive — eigenvector signs are otherwise arbitrary, and the
convention makes outputs reproducible across runs/BLAS builds with the
same input (the golden oracle relies on it).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from .ann import list_column_matrix


def _covariance(ds: rd.Dataset, vec_col: str) -> tuple[int, np.ndarray,
                                                        np.ndarray]:
    """(n, mean ∈ ℝᵈ, covariance ∈ ℝ^{d×d}) via one streaming pass."""

    def _partial(batch: pa.Table) -> pa.Table:
        x = list_column_matrix(batch[vec_col])
        s = x.sum(axis=0)
        ss = x.T @ x
        return pa.table({
            "n": pa.array([x.shape[0]], pa.int64()),
            "s": pa.array([s.tolist()], pa.list_(pa.float64())),
            "ss": pa.array([ss.ravel().tolist()], pa.list_(pa.float64())),
        })

    parts = ds.map_batches(_partial, batch_format="pyarrow",
                           batch_size=1 << 14).to_pandas()
    n = int(parts["n"].sum())
    if n == 0:
        raise ValueError("PCA needs at least one row")
    s = np.sum(np.stack(parts["s"].to_numpy()), axis=0)
    ss = np.sum(np.stack(parts["ss"].to_numpy()), axis=0)
    d = s.shape[0]
    mu = s / n
    cov = ss.reshape(d, d) / n - np.outer(mu, mu)
    return n, mu, cov


def pca_project(ds: rd.Dataset, vec_col: str, n_components: int,
                id_cols: list[str] | None = None,
                out_prefix: str = "pc") -> rd.Dataset:
    """Project every row's vector onto the top ``n_components`` principal
    components (population covariance, mean-centered). Output columns:
    ``id_cols`` + pc1..pck."""
    _, mu, cov = _covariance(ds, vec_col)
    if n_components < 1 or n_components > cov.shape[0]:
        raise ValueError("n_components out of range")
    vals, vecs = np.linalg.eigh(cov)        # ascending eigenvalues
    comp = vecs[:, ::-1][:, :n_components]  # top-k columns
    # deterministic sign: largest-|coordinate| entry positive
    flip = np.sign(comp[np.abs(comp).argmax(axis=0),
                        np.arange(n_components)])
    flip[flip == 0] = 1.0
    comp = comp * flip
    ref = ray.put((mu, comp))
    ids = id_cols or []

    def _project(batch: pa.Table) -> pa.Table:
        mu_, comp_ = ray.get(ref)
        x = list_column_matrix(batch[vec_col])
        p = (x - mu_) @ comp_
        cols = {c: batch[c] for c in ids}
        for j in range(p.shape[1]):
            cols[f"{out_prefix}{j + 1}"] = pa.array(p[:, j])
        return pa.table(cols)

    return ds.map_batches(_project, batch_format="pyarrow")


def explained_variance(ds: rd.Dataset, vec_col: str) -> pd.DataFrame:
    """One row per principal component: eigenvalue and cumulative
    explained-variance ratio (descending). Driver-sized output (d rows)."""
    _, _, cov = _covariance(ds, vec_col)
    vals = np.linalg.eigh(cov)[0][::-1]
    vals = np.clip(vals, 0.0, None)
    ratio = vals / vals.sum() if vals.sum() > 0 else vals
    return pd.DataFrame({
        "component": np.arange(1, len(vals) + 1),
        "eigenvalue": vals,
        "explained_ratio": ratio,
        "cum_explained_ratio": np.cumsum(ratio),
    })


def jl_matrix(d: int, k: int, seed: int = 0) -> np.ndarray:
    """Deterministic Gaussian Johnson-Lindenstrauss projection P ∈ ℝ^{d×k},
    scaled 1/√k (unit expected norm preservation). A pure shared kernel
    (like MinHasher): the golden oracle re-derives only the composition."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((d, k)) / np.sqrt(k)


def jl_project(ds: rd.Dataset, vec_col: str, n_components: int,
               seed: int = 0, id_cols: list[str] | None = None,
               out_prefix: str = "jl") -> rd.Dataset:
    """Random-projection dimensionality reduction (Johnson-Lindenstrauss):
    project every row's vector through a seed-derived Gaussian matrix —
    the cheap streaming alternative to PCA when only pairwise distances
    must survive (embedding dedup/ANN preprocessing). Zero shuffles, no
    moment pass: the matrix depends on (d, k, seed) alone, broadcast
    once; every batch is one float64 GEMM."""
    import ray

    from ..util import cached_get

    first = ds.take(1)
    if not first:
        raise ValueError("jl_project needs at least one row")
    d = len(first[0][vec_col])
    if not 1 <= n_components <= d:
        raise ValueError("n_components out of range")
    ref = ray.put(jl_matrix(d, n_components, seed))
    id_cols = id_cols or []

    def _proj(batch: pa.Table) -> pa.Table:
        p = cached_get(ref)
        x = list_column_matrix(batch[vec_col]).astype(np.float64)
        y = x @ p
        cols = {c: batch[c] for c in id_cols}
        for j in range(n_components):
            cols[f"{out_prefix}{j + 1}"] = pa.array(y[:, j], pa.float64())
        return pa.table(cols)

    return ds.select_columns(id_cols + [vec_col]).map_batches(
        _proj, batch_format="pyarrow", batch_size=1 << 14)
