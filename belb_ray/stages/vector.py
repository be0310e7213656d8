"""Vector-column aggregates over `list<float>` embedding columns.

``grouped_vector_mean`` computes per-group centroid vectors — the class-
prototype step of embedding-space analysis (label centroids for
SemDeDup-style clustering QA, per-source embedding drift, prototype
classifiers).

Scale shape (100 TB): each block reduces to ONE fixed-width row per key
— (key, n, Σdim_0 … Σdim_{d−1}) — via a zero-copy matrix view and
`np.add.reduceat` over the key-sorted block; one bucketed combine sums
the partials, and the finish divides. The exchange is
O(#keys × d floats) regardless of row count; rows never shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from .agg import bucketed_combine
from .ann import list_column_matrix
from ..util import resolve_num_buckets
from ..util import round_half_away


def grouped_vector_mean(
    ds: rd.Dataset,
    key: str,
    vec_col: str,
    dim: int,
    round_to: int | None = 6,
    num_buckets: int = 0,
    long_form: bool = True,
) -> rd.Dataset:
    """Per-group mean vector → long form (key, dim_idx [1-based],
    mean_val) when ``long_form`` (SQL-mirrorable via
    ``avg(embedding[i])``), else wide (key, n, mean list<double>).
    ``round_to=None`` keeps means unrounded (for downstream math that
    rounds at its own boundary)."""
    num_buckets = resolve_num_buckets(num_buckets)
    sum_cols = [f"__s{j}" for j in range(dim)]

    def _partial(batch: pa.Table) -> pa.Table:
        mat = list_column_matrix(batch[vec_col])
        if mat.shape[0] and mat.shape[1] != dim:
            raise ValueError(
                f"grouped_vector_mean: expected dim {dim}, "
                f"got {mat.shape[1]}")
        keys = batch[key].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(keys, kind="stable")
        keys_s = keys[order]
        starts = np.concatenate(
            ([0], np.flatnonzero(keys_s[1:] != keys_s[:-1]) + 1)) \
            if len(keys_s) else np.array([], np.int64)
        if len(keys_s) == 0:
            cols = {key: keys_s, "__n": np.array([], np.int64)}
            cols.update({c: np.array([], np.float64) for c in sum_cols})
            return pa.table(cols)
        sums = np.add.reduceat(mat[order], starts, axis=0)
        counts = np.diff(np.concatenate((starts, [len(keys_s)])))
        cols = {key: keys_s[starts],
                "__n": counts.astype(np.int64)}
        cols.update({c: sums[:, j] for j, c in enumerate(sum_cols)})
        return pa.table(cols)

    partials = ds.select_columns([key, vec_col]).map_batches(
        _partial, batch_format="pyarrow")
    combined = bucketed_combine(
        partials, [key], {"__n": "sum", **{c: "sum" for c in sum_cols}},
        num_buckets)

    if long_form:
        def _finish(df: pd.DataFrame) -> pd.DataFrame:
            n = df["__n"].to_numpy(np.float64)
            k = len(df)
            means = df[sum_cols].to_numpy(np.float64) / n[:, None]
            if round_to is not None:
                means = round_half_away(means, round_to)
            return pd.DataFrame({
                key: np.repeat(df[key].to_numpy(), dim),
                "dim_idx": np.tile(np.arange(1, dim + 1, dtype=np.int64),
                                   k),
                "mean_val": means.ravel()})
    else:
        def _finish(df: pd.DataFrame) -> pd.DataFrame:
            n = df["__n"].to_numpy(np.float64)
            means = df[sum_cols].to_numpy(np.float64) / n[:, None]
            if round_to is not None:
                means = round_half_away(means, round_to)
            return pd.DataFrame({
                key: df[key].to_numpy(),
                "n": df["__n"].to_numpy(np.int64),
                "mean": list(means)})

    return combined.map_batches(_finish, batch_format="pandas")


def nearest_centroid_confusion(
    ds: rd.Dataset,
    label_col: str,
    vec_col: str,
    dim: int,
    round_to: int = 6,
    num_buckets: int = 0,
) -> rd.Dataset:
    """Nearest-centroid (prototype) classification self-evaluation →
    confusion counts (label, pred_label, n): each vector assigns to the
    label whose UNROUNDED centroid minimizes squared L2 distance
    (rounded to ``round_to`` before ranking so the comparison order is
    reproducible across engines; ties → smaller label).

    Distributed shape: centroids come from ``grouped_vector_mean``'s
    fixed-width combiner (label-count-sized), broadcast ONCE; each batch
    computes its (rows × labels) distance matrix with one numpy
    broadcast and takes a vectorized argmin; confusion cells reduce with
    the standard pair-count combiner. Rows never shuffle."""
    num_buckets = resolve_num_buckets(num_buckets)
    import ray

    from ..util import cached_get
    from .agg import preagg_groupby
    from .joins import collect_arrow

    wide = grouped_vector_mean(ds, label_col, vec_col, dim,
                               round_to=None, num_buckets=num_buckets,
                               long_form=False)
    cent = collect_arrow(wide).to_pandas().sort_values(label_col)
    labels = cent[label_col].to_numpy()
    mu = np.stack(cent["mean"].to_numpy())
    ref = ray.put((labels.copy(), np.ascontiguousarray(mu)))

    def _assign(batch: pa.Table) -> pa.Table:
        labels, mu = cached_get(ref)
        x = list_column_matrix(batch[vec_col])
        d2 = ((x[:, None, :] - mu[None, :, :]) ** 2).sum(axis=2)
        d2 = round_half_away(d2, round_to)
        pred = labels[np.argmin(d2, axis=1)]  # first min = smaller label
        return pa.table({
            "label": batch[label_col],
            "pred_label": pa.array(pred)})

    assigned = ds.select_columns([label_col, vec_col]).map_batches(
        _assign, batch_format="pyarrow")
    out = preagg_groupby(assigned, ["label", "pred_label"],
                         [("count", "", "n")], num_buckets)
    return out


_KM_SCALE = 1 << 20  # fixed-point quantization for exact int64 sums


def kmeans_lloyd(ds: rd.Dataset, k: int = 8, n_iters: int = 5,
                 id_col: str = "vec_id",
                 vec_col: str = "embedding") -> rd.Dataset:
    """Distributed Lloyd's k-means with a bit-deterministic contract:
    → (id, cluster) after exactly ``n_iters`` assignment/update rounds.

    Determinism spec (mirrored by the single-process golden):
    - vectors quantize ONCE to int64 fixed-point (×2^20, round-half-even)
      — centroid updates are EXACT integer sums, so the fit is
      independent of block count, batch order, and summation order (the
      fs_em / key_skew_profile exact-arithmetic policy);
    - init centroids = the vectors of the ``k`` smallest ids;
    - assignment = argmin squared-L2 (first index wins ties);
    - an emptied cluster keeps its previous centroid.

    Scale shape: per iteration ONE streaming pass emits ≤ k fixed-width
    partial rows per block ((cluster, n, Σq int64 vector)); the driver
    M-step combines O(k·d) numbers — rows never shuffle; centroids
    broadcast once per iteration via ray.put."""
    import ray

    from ..util import cached_get
    from .ann import list_column_matrix

    def _quant(t: pa.Table) -> pa.Table:
        mat = list_column_matrix(t[vec_col])
        q = np.rint(mat * _KM_SCALE).astype(np.int64)
        n, d = (q.shape[0], q.shape[1]) if q.ndim == 2 and q.size else \
            (0, 0)
        # variable-size list keeps the type stable across empty blocks
        lists = pa.ListArray.from_arrays(
            pa.array(np.arange(n + 1, dtype=np.int64) * d, pa.int32()),
            pa.array(q.ravel(), pa.int64()))
        return pa.table({id_col: t[id_col].slice(0, n), "__q": lists})

    qds = ds.select_columns([id_col, vec_col]).map_batches(
        _quant, batch_format="pyarrow").materialize()  # reused n_iters+1

    seed_rows = qds.sort(id_col).limit(k).take_all()
    cents = np.asarray([r["__q"] for r in seed_rows],
                       dtype=np.int64).astype(np.float64) / _KM_SCALE
    dim = cents.shape[1]

    def _qmat(t: pa.Table) -> np.ndarray:
        return (t["__q"].combine_chunks().flatten().to_numpy()
                .reshape(-1, dim))

    def _assign_ids(q: np.ndarray, c: np.ndarray) -> np.ndarray:
        x = q.astype(np.float64) / _KM_SCALE
        d2 = ((x * x).sum(axis=1)[:, None]
              - 2.0 * (x @ c.T) + (c * c).sum(axis=1)[None, :])
        return np.argmin(d2, axis=1)

    for _ in range(n_iters):
        ref = ray.put(cents)

        def _partial(t: pa.Table) -> pa.Table:
            c = cached_get(ref)
            q = _qmat(t)
            if not len(q):
                return pa.table({
                    "cid": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                    "s": pa.array([], pa.list_(pa.int64(), dim))})
            a = _assign_ids(q, c)
            order = np.argsort(a, kind="stable")
            a_s, q_s = a[order], q[order]
            starts = np.r_[0, np.flatnonzero(a_s[1:] != a_s[:-1]) + 1]
            sums = np.add.reduceat(q_s, starts, axis=0)
            counts = np.diff(np.r_[starts, len(a_s)])
            return pa.table({
                "cid": pa.array(a_s[starts], pa.int64()),
                "n": pa.array(counts, pa.int64()),
                "s": pa.FixedSizeListArray.from_arrays(
                    pa.array(sums.ravel(), pa.int64()), dim)})

        parts = qds.map_batches(_partial, batch_format="pyarrow") \
            .take_all()
        n_tot = np.zeros(k, np.int64)
        s_tot = np.zeros((k, dim), np.int64)
        for r in parts:
            n_tot[r["cid"]] += r["n"]
            s_tot[r["cid"]] += np.asarray(r["s"], np.int64)
        nz = n_tot > 0
        cents = cents.copy()
        cents[nz] = (s_tot[nz].astype(np.float64)
                     / (n_tot[nz][:, None] * float(_KM_SCALE)))

    ref = ray.put(cents)

    def _final(t: pa.Table) -> pa.Table:
        c = cached_get(ref)
        q = _qmat(t)
        a = _assign_ids(q, c) if len(q) else np.array([], np.int64)
        return pa.table({id_col: t[id_col],
                         "cluster": pa.array(a, pa.int64())})

    return qds.map_batches(_final, batch_format="pyarrow")


def simplified_silhouette(
    ds: rd.Dataset,
    label_col: str,
    vec_col: str,
    dim: int,
    round_to: int = 6,
    num_buckets: int = 0,
) -> rd.Dataset:
    """Simplified (centroid-based) silhouette per label → one row per
    label: (label, n, silhouette) — the standard clustering-quality
    audit at corpus scale, where the classic silhouette's all-pairs
    distances are replaced by distances to cluster centroids
    (a = distance to own centroid, b = min distance to any OTHER
    centroid, s = (b − a)/max(a, b), 0 when both are 0; silhouette is
    the per-label mean of s, rounded to ``round_to``). Validates a
    kmeans/label assignment without O(n²) work.

    Distributed shape: UNROUNDED centroids come from
    ``grouped_vector_mean``'s fixed-width combiner (label-count-sized),
    broadcast ONCE; each batch computes its (rows × labels) Euclidean
    distance matrix with one numpy broadcast; per-label (Σs, n)
    partials reduce with one bucketed combine. Rows never shuffle."""
    num_buckets = resolve_num_buckets(num_buckets)
    import ray

    from ..util import cached_get
    from .joins import collect_arrow

    wide = grouped_vector_mean(ds, label_col, vec_col, dim,
                               round_to=None, num_buckets=num_buckets,
                               long_form=False)
    cent = collect_arrow(wide).to_pandas().sort_values(label_col)
    labels = cent[label_col].to_numpy()
    mu = np.stack(cent["mean"].to_numpy())
    ref = ray.put((labels.copy(), np.ascontiguousarray(mu)))

    def _partial(batch: pa.Table) -> pa.Table:
        labs, mu_ = cached_get(ref)
        x = list_column_matrix(batch[vec_col]).astype(np.float64)
        lab = batch[label_col].combine_chunks().to_numpy(
            zero_copy_only=False)
        d = np.sqrt(((x[:, None, :] - mu_[None, :, :]) ** 2).sum(axis=2))
        own = np.searchsorted(labs, lab)
        if len(own) and not np.array_equal(labs[own], lab):
            raise KeyError("simplified_silhouette: row label missing "
                           "from the centroid table")
        rows = np.arange(len(x))
        a = d[rows, own]
        d[rows, own] = np.inf
        b = d.min(axis=1) if d.shape[1] > 1 else np.zeros(len(x))
        mx = np.maximum(a, b)
        s = np.where(mx > 0, (b - a) / np.where(mx > 0, mx, 1.0), 0.0)
        srt = np.argsort(lab, kind="stable")
        lab_s, s_s = lab[srt], s[srt]
        starts = np.concatenate(
            ([0], np.flatnonzero(lab_s[1:] != lab_s[:-1]) + 1)) \
            if len(lab_s) else np.array([], np.int64)
        sums = np.add.reduceat(s_s, starts) if len(s_s) else \
            np.array([], np.float64)
        counts = np.diff(np.concatenate((starts, [len(lab_s)]))) \
            if len(lab_s) else np.array([], np.int64)
        return pa.table({label_col: pa.array(lab_s[starts]),
                         "__s": pa.array(sums, pa.float64()),
                         "n": pa.array(counts.astype(np.int64))})

    from .agg import bucketed_combine

    partials = ds.select_columns([label_col, vec_col]).map_batches(
        _partial, batch_format="pyarrow")
    combined = bucketed_combine(partials, [label_col],
                                {"__s": "sum", "n": "sum"}, num_buckets)

    def _finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            label_col: df[label_col],
            "n": df["n"].astype(np.int64),
            "silhouette": round_half_away(
                df["__s"].to_numpy(np.float64)
                / df["n"].to_numpy(np.float64), round_to)})

    return combined.map_batches(_finish, batch_format="pandas")


def kcenter_sample(
    ds: rd.Dataset,
    id_col: str,
    vec_col: str,
    dim: int,
    k: int,
    round_to: int = 6,
    num_buckets: int = 0,
) -> rd.Dataset:
    """Greedy k-center (farthest-point-first) diversity sample →
    (sel_rank [0-based], id, dist): the classic coreset / diverse-subset
    seed for training-data selection and kmeans++-style initialization.
    Deterministic spec (the golden oracle implements the same): distances
    are squared L2 in float64; center 0 is the minimum-id row; each round
    picks the row maximizing its distance to the nearest chosen center,
    exact-double ties → smaller id; already-chosen ids are excluded;
    ``dist`` is the selected row's min-distance at selection time
    (0 for rank 0), rounded to ``round_to``.

    Distributed shape: the per-row min-distance column is UPDATED
    against only the newest center each round (one streaming
    ``map_batches`` + materialize), so the total work is k passes over
    the data — never k×n² and never a shuffle. Each round's global
    argmax reduces to ≤1 candidate row per block (id, vec, dist — a
    block-count-sized collect). k is small by design (a seed/coreset
    size); the k materialize barriers are the cost of the sequential
    dependence inherent to greedy k-center."""
    num_buckets = resolve_num_buckets(num_buckets)
    from .joins import collect_arrow

    def _init(t: pa.Table) -> pa.Table:
        return pa.table({
            id_col: t[id_col], vec_col: t[vec_col],
            "__md": pa.array(np.full(t.num_rows, np.inf, np.float64))})

    state = ds.select_columns([id_col, vec_col]).map_batches(
        _init, batch_format="pyarrow")

    def _minid_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.select([id_col, vec_col])
        ids = t[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        j = int(np.argmin(ids))
        return t.select([id_col, vec_col]).slice(j, 1)

    first = collect_arrow(state.map_batches(
        _minid_partial, batch_format="pyarrow")).to_pandas() \
        .sort_values(id_col)
    cid = first[id_col].iloc[0]
    cvec = np.asarray(first[vec_col].iloc[0], np.float64)
    chosen_ids = [cid]
    chosen_dist = [0.0]

    for r in range(1, k):
        def _update(t: pa.Table, c=cvec) -> pa.Table:
            from .ann import list_column_matrix
            x = list_column_matrix(t[vec_col]).astype(np.float64)
            d = ((x - c[None, :]) ** 2).sum(axis=1) if len(x) else \
                np.array([], np.float64)
            md = np.minimum(
                t["__md"].combine_chunks().to_numpy(zero_copy_only=False),
                d)
            return pa.table({id_col: t[id_col], vec_col: t[vec_col],
                             "__md": pa.array(md)})

        state = state.map_batches(_update,
                                  batch_format="pyarrow").materialize()

        def _argmax_partial(t: pa.Table,
                            excl=frozenset(chosen_ids)) -> pa.Table:
            ids = t[id_col].combine_chunks().to_numpy(
                zero_copy_only=False)
            keep = ~np.isin(ids, np.fromiter(excl, ids.dtype, len(excl)))
            if not keep.any():
                return t.slice(0, 0)
            sub = t.filter(pa.array(keep))
            md = sub["__md"].combine_chunks().to_numpy(
                zero_copy_only=False)
            sid = sub[id_col].combine_chunks().to_numpy(
                zero_copy_only=False)
            # block argmax, exact-double ties → smaller id
            best = np.lexsort((sid, -md))[0]
            return sub.slice(int(best), 1)

        cand = collect_arrow(state.map_batches(
            _argmax_partial, batch_format="pyarrow")).to_pandas()
        if not len(cand):
            break
        cand = cand.sort_values(["__md", id_col],
                                ascending=[False, True])
        row = cand.iloc[0]
        chosen_ids.append(row[id_col])
        chosen_dist.append(float(row["__md"]))
        cvec = np.asarray(row[vec_col], np.float64)

    out = pa.table({
        "sel_rank": pa.array(np.arange(len(chosen_ids), dtype=np.int64)),
        id_col: pa.array(chosen_ids, pa.int64()),
        "dist": pa.array(round_half_away(np.asarray(chosen_dist), round_to))})
    return rd.from_arrow(out)


def quantize_embeddings(
    ds: rd.Dataset,
    id_col: str,
    vec_col: str,
    dim: int,
    long_form: bool = True,
    num_buckets: int = 0,
) -> rd.Dataset:
    """Per-dimension affine int8 quantization of an embedding column —
    the 4× storage/bandwidth compressor for embedding corpora (scalar
    quantization, the SQ companion of the PQ codec in ``stages/pq``):
    ``code = round((v − lo_d) · 255 / (hi_d − lo_d)) − 128`` with
    per-dimension corpus [lo, hi] (constant dims quantize to 0).
    → long form (id, dim_idx [1-based], code) for the SQL mirror, or
    wide (id, codes fixed_size_binary) for storage.

    Distributed shape: per-dim min/max reduce in ONE fixed-width
    combiner pass (2·d doubles per block, rows never shuffle); the
    bounds broadcast once; quantization streams vectorized."""
    num_buckets = resolve_num_buckets(num_buckets)
    import ray

    from ..util import cached_get
    from .ann import list_column_matrix
    from .joins import collect_arrow

    def _minmax(t: pa.Table) -> pa.Table:
        x = list_column_matrix(t[vec_col]).astype(np.float64)
        if not len(x):
            return pa.table({"lo": pa.array([], pa.large_list(
                pa.float64())), "hi": pa.array([], pa.large_list(
                    pa.float64()))})
        return pa.table({
            "lo": pa.array([x.min(axis=0).tolist()],
                           pa.large_list(pa.float64())),
            "hi": pa.array([x.max(axis=0).tolist()],
                           pa.large_list(pa.float64()))})

    parts = collect_arrow(ds.select_columns([vec_col]).map_batches(
        _minmax, batch_format="pyarrow")).to_pandas()
    lo = np.min(np.stack(parts["lo"].to_numpy()), axis=0)
    hi = np.max(np.stack(parts["hi"].to_numpy()), axis=0)
    ref = ray.put((lo, hi))

    def _quant(t: pa.Table) -> pa.Table:
        lo_, hi_ = cached_get(ref)
        x = list_column_matrix(t[vec_col]).astype(np.float64)
        span = hi_ - lo_
        safe = np.where(span > 0, span, 1.0)
        codes = np.where(span > 0,
                         round_half_away((x - lo_) * 255.0 / safe) - 128.0,
                         0.0).astype(np.int64)
        ids = t[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        n = len(ids)
        if long_form:
            return pa.table({
                id_col: pa.array(np.repeat(ids, x.shape[1])),
                "dim_idx": pa.array(np.tile(
                    np.arange(1, x.shape[1] + 1, dtype=np.int64), n)),
                "code": pa.array(codes.ravel())})
        return pa.table({
            id_col: t[id_col],
            "codes": pa.array(
                [(codes[i] + 128).astype(np.uint8).tobytes()
                 for i in range(n)],
                pa.binary(x.shape[1] if n else dim))})

    return ds.select_columns([id_col, vec_col]).map_batches(
        _quant, batch_format="pyarrow")
