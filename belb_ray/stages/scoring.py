"""Pairwise hybrid scoring of candidate pairs.

Features are attached to pairs by two hash-partitioned joins (pairs ⋈
features on id_a, then on id_b) — signatures cross the wire once per pair
side, never multiplied by the band count (SURVEY §7.3). Scoring itself is
a stateless ``map_batches``:

- est. Jaccard from MinHash signatures — vectorized column-compare;
- Jaro-Winkler on file paths (reference seed: mean pairwise string
  similarity inside synsets, belb/scripts/stats.py:203-250 — SURVEY A12);
- token-set Dice on path tokens.

Output: (id_a, id_b, score) filtered to score ≥ threshold — the edge list
for transitive clustering.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from ..functions.minhash import est_jaccard
from ..functions.similarity import hybrid_score, jaro_winkler, token_set_ratio
from ..functions.text import path_tokens
from .joins import hash_partition_join


def attach_features(pairs: rd.Dataset, features: rd.Dataset,
                    num_buckets: int = 32,
                    broadcast_threshold: int = 2_000_000) -> rd.Dataset:
    """pairs(id_a,id_b) ⋈ features → + (sig_a, path_a, sig_b, path_b).

    Size-aware strategy: when the (exact-dedup'd) feature table is small
    enough to broadcast, it is ``ray.put`` ONCE and looked up per batch
    with ``np.searchsorted`` — zero shuffles. Beyond the threshold, two
    hash-partitioned joins (one shuffle per pair side)."""
    feat = features.select_columns(["row_id", "sig", "path"])
    n_feat = feat.count()

    if n_feat <= broadcast_threshold:
        import ray

        from .joins import collect_arrow
        tbl = collect_arrow(feat)
        ids = tbl["row_id"].to_numpy()
        order = np.argsort(ids, kind="stable")
        ids_sorted = ids[order]
        sig_all = np.frombuffer(b"".join(tbl["sig"].to_pylist()),
                                dtype=np.uint64).reshape(len(ids), -1)[order]
        paths = np.asarray(tbl["path"].to_pylist(), dtype=object)[order]
        ref = ray.put((ids_sorted, sig_all, paths))

        class _Attach:
            def __init__(self):
                self.ids, self.sig, self.paths = ray.get(ref)

            def __call__(self, batch: pa.Table) -> pa.Table:
                ia = np.searchsorted(self.ids, batch["id_a"].to_numpy())
                ib = np.searchsorted(self.ids, batch["id_b"].to_numpy())
                return pa.table({
                    "id_a": batch["id_a"], "id_b": batch["id_b"],
                    "sig_a": pa.array([self.sig[i].tobytes() for i in ia], pa.binary()),
                    "path_a": pa.array(self.paths[ia].tolist(), pa.string()),
                    "sig_b": pa.array([self.sig[i].tobytes() for i in ib], pa.binary()),
                    "path_b": pa.array(self.paths[ib].tolist(), pa.string()),
                })

        return pairs.map_batches(_Attach, batch_format="pyarrow",
                                 batch_size=16384, concurrency=(1, 8))

    fa = feat.map_batches(
        lambda t: t.rename_columns(["id_a", "sig_a", "path_a"]),
        batch_format="pyarrow")
    fb = feat.map_batches(
        lambda t: t.rename_columns(["id_b", "sig_b", "path_b"]),
        batch_format="pyarrow")
    withe_a = hash_partition_join(pairs, fa, key="id_a", num_buckets=num_buckets)
    return hash_partition_join(withe_a, fb, key="id_b", num_buckets=num_buckets)


def score_pairs(
    pairs_with_features: rd.Dataset,
    threshold: float = 0.5,
    w_jacc: float = 0.7,
    w_jw: float = 0.15,
    w_tok: float = 0.15,
) -> rd.Dataset:
    """→ (id_a, id_b, score) for score ≥ threshold."""

    def _score(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        sig_a = np.frombuffer(b"".join(batch["sig_a"].to_pylist()), dtype=np.uint64).reshape(n, -1)
        sig_b = np.frombuffer(b"".join(batch["sig_b"].to_pylist()), dtype=np.uint64).reshape(n, -1)
        jacc = est_jaccard(sig_a, sig_b)
        paths_a = batch["path_a"].to_pylist()
        paths_b = batch["path_b"].to_pylist()
        jw = np.fromiter((jaro_winkler(a, b) for a, b in zip(paths_a, paths_b)),
                         dtype=np.float64, count=n)
        tok = np.fromiter(
            (token_set_ratio(set(path_tokens(a)), set(path_tokens(b)))
             for a, b in zip(paths_a, paths_b)),
            dtype=np.float64, count=n)
        score = hybrid_score(jacc, jw, tok, w_jacc, w_jw, w_tok)
        keep = score >= threshold
        kept = batch.select(["id_a", "id_b"]).append_column(
            "score", pa.array(score, pa.float64())).filter(pa.array(keep))
        return kept

    return pairs_with_features.map_batches(_score, batch_format="pyarrow",
                                           batch_size=8192)
