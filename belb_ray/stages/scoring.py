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
from ..functions.similarity import (hybrid_score, jaro_winkler,
                                    jaro_winkler_batch, token_set_ratio)
from ..functions.text import path_tokens
from .joins import hash_partition_join
from ..util import resolve_num_buckets

# per-worker-process memo: path → frozenset of tokens (paths repeat
# heavily across candidate pairs; Ray reuses worker processes, so this
# amortizes like the cached_blocker in stages/blocking.py)
_TOKSET_CACHE: dict[str, frozenset] = {}


def _tokset(path: str) -> frozenset:
    s = _TOKSET_CACHE.get(path)
    if s is None:
        if len(_TOKSET_CACHE) > 200_000:
            _TOKSET_CACHE.clear()
        s = _TOKSET_CACHE[path] = frozenset(path_tokens(path))
    return s


def attach_features(pairs: rd.Dataset, features: rd.Dataset,
                    num_buckets: int = 0,
                    broadcast_threshold: int = 8_000_000,
                    broadcast_bytes: int | None = None,
                    need_paths: bool = True,
                    scorer=None) -> rd.Dataset:
    """pairs(id_a,id_b) ⋈ features → + (sig_a, sig_b[, path_a, path_b]).

    Size-aware strategy: when the (exact-dedup'd) feature table fits the
    broadcast budget, it is ``ray.put`` ONCE and looked up per batch
    with ``np.searchsorted`` — zero shuffles. Beyond the budget, two
    hash-partitioned joins (one shuffle per pair side).

    The crossover was MEASURED round 3 (tools/profile_attach.py,
    BASELINE.md "Feature-attach crossover"): broadcast beats the join
    path 14-29x at 1M/2M/4M reps (up to a 1 GB payload), so the
    governing quantity is the broadcast's BYTE size (object-store /
    worker-heap pressure, and this sandbox's first-touch page-fault tax
    past ~1.3 GB), not its row count — hence the dual budget:
    ``broadcast_threshold`` rows AND ``broadcast_bytes`` of actual
    materialized payload (``Dataset.size_bytes`` on the selected
    columns, so a 128-perm sig counts 4x a 32-perm one).

    ``need_paths=False`` (pure-content scoring: w_jw == w_tok == 0, e.g.
    MinHash document dedup) drops the path column from the broadcast AND
    from every per-pair gather — at millions of reps that is hundreds of
    MB never materialized.

    The byte budget (round 4; was a fixed 1.5 GB): a ``ray.put``
    numpy/Arrow payload lives ONCE per node in plasma and every worker
    reads it zero-copy, so the bound is per-NODE shared memory, not
    per-worker heap — ``broadcast_bytes=None`` derives it as 25% of the
    cluster's object store (floor 4 GB), which self-scales from this
    sandbox (27 GB store → ~6.7 GB budget) to a real node. The round-4
    4M-row campaign measured the join fallback ~10x slower end-to-end
    than the broadcast at a 2.6 GB payload (attached blocks throttled
    the streaming executor's object-store budget). Past the budget —
    O(100M) reps — the join path engages; pass ``scorer`` so it stays
    narrow (below), and shard the corpus into campaigns as the
    incremental pipeline does.

    ``scorer`` (Table → Table, e.g. a `score_table` closure): when set,
    the returned dataset is the SCORED pairs, with scoring fused into
    the attach so wide attached rows never enter the object store — on
    the broadcast path it runs inside the same map task right after the
    gather; on the join path it is fused into the second join's bucket
    tasks (`hash_partition_join(post_fn=...)`), which is what keeps the
    fallback streamable: the (pairs x 2-signature) blocks that
    throttled the 4M-row campaign are reduced to (id_a, id_b, score)
    before leaving the task."""
    num_buckets = resolve_num_buckets(num_buckets)
    if broadcast_bytes is None:
        from ..util import broadcast_byte_budget

        broadcast_bytes = broadcast_byte_budget()
    cols = ["row_id", "sig"] + (["path"] if need_paths else [])
    feat = features.select_columns(cols).materialize()
    n_feat = feat.count()

    if n_feat <= broadcast_threshold and feat.size_bytes() <= broadcast_bytes:
        import ray

        from .joins import collect_arrow
        tbl = collect_arrow(feat)
        ids = tbl["row_id"].to_numpy()
        # permutation instead of materializing the sorted 100s-of-MB sig
        # matrix (the full gather costs seconds; per-batch gathers don't)
        order = np.argsort(ids, kind="stable").astype(np.int64)
        ids_sorted = ids[order]
        from ..functions.minhash import sig_matrix

        sig_all = sig_matrix(tbl["sig"])
        # paths broadcast as an ARROW array, not a numpy object array:
        # object arrays re-pickle 100k+ strings per worker process
        # (measured seconds each); Arrow buffers deserialize near-free
        paths = tbl["path"].combine_chunks() if need_paths else None
        ref = ray.put((ids_sorted, order, sig_all, paths))

        from ..util import cached_get

        def _lookup(ids: np.ndarray, perm: np.ndarray, want: np.ndarray) -> np.ndarray:
            # clip + equality hit check: a pair id absent from the feature
            # table must FAIL, not silently attach a neighbor's features
            idx = np.minimum(np.searchsorted(ids, want), len(ids) - 1)
            if len(ids) == 0 or not np.all(ids[idx] == want):
                missing = want if len(ids) == 0 else want[ids[idx] != want]
                raise KeyError(
                    f"attach_features: {missing.size} pair ids missing from "
                    f"the feature table (e.g. {missing[:3].tolist()})")
            return perm[idx]

        def _attach(batch: pa.Table) -> pa.Table:
            ids, perm, sig, paths = cached_get(ref)
            ia = _lookup(ids, perm, batch["id_a"].to_numpy())
            ib = _lookup(ids, perm, batch["id_b"].to_numpy())
            from ..functions.minhash import sig_array

            out = {
                "id_a": batch["id_a"], "id_b": batch["id_b"],
                "sig_a": sig_array(sig[ia]),
                "sig_b": sig_array(sig[ib]),
            }
            if paths is not None:
                out["path_a"] = paths.take(pa.array(ia))
                out["path_b"] = paths.take(pa.array(ib))
            t = pa.table(out)
            return scorer(t) if scorer is not None else t

        # 8192 matches score_pairs' batch_size: the fused attach→score
        # task chain bundles input blocks to the LARGEST batch_size in the
        # chain, so a bigger value here would cut scoring parallelism
        return pairs.map_batches(_attach, batch_format="pyarrow",
                                 batch_size=8192)

    a_names = ["id_a", "sig_a"] + (["path_a"] if need_paths else [])
    b_names = ["id_b", "sig_b"] + (["path_b"] if need_paths else [])
    fa = feat.map_batches(lambda t: t.rename_columns(a_names),
                          batch_format="pyarrow")
    fb = feat.map_batches(lambda t: t.rename_columns(b_names),
                          batch_format="pyarrow")
    # Join fallback runs Ray's NATIVE hash-shuffle join (aggregator
    # actors), not the manual union+sort join: at 4M pairs x wide
    # signature rows the manual join's sorted union overran the
    # streaming executor's object-store budget and deadlocked (zero
    # bucket tasks dispatched, scheduler spinning — measured round 5,
    # and raising resource_limits did not unstick it), while the native
    # hash shuffle streams the same attach in 41 s at 16 CPUs. The
    # manual join stays the default for narrow joins elsewhere
    # (measured ~2x faster at small scales).
    withe_a = hash_partition_join(pairs, fa, key="id_a",
                                  num_buckets=num_buckets,
                                  strategy="native")
    # static left schema for join 2: its left side is join 1's LAZY
    # output, and a .schema() peek on a lazy join plan executes the
    # ENTIRE join for one row (measured round 5: the forced-fallback 4M
    # campaign ran join 1 twice — once for the peek, once for real)
    fsch = feat.schema()
    ftypes = dict(zip(fsch.names, fsch.types))
    j1_types = {"id_a": pa.int64(), "id_b": pa.int64(),
                "sig_a": ftypes["sig"]}
    if need_paths:
        j1_types["path_a"] = ftypes["path"]
    return hash_partition_join(withe_a, fb, key="id_b", num_buckets=num_buckets,
                               strategy="native",
                               left_types=j1_types,
                               post_fn=scorer)


def score_pairs(
    pairs_with_features: rd.Dataset,
    threshold: float = 0.5,
    w_jacc: float = 0.7,
    w_jw: float = 0.15,
    w_tok: float = 0.15,
) -> rd.Dataset:
    """→ (id_a, id_b, score) for score ≥ threshold.

    Hot-loop layout (the largest per-pair compute of the flagship):
    the MinHash-Jaccard estimate is computed first, vectorized; path
    kernels (batch Jaro-Winkler + token-set Dice) run ONLY on pairs whose
    upper-bound score ``w_jacc*jacc + w_jw + w_tok`` can still reach the
    threshold — a rejected-either-way pair never pays the string cost.
    Output is bit-identical to scoring every pair (dropped pairs were
    below threshold under ANY path score)."""

    def _score(batch: pa.Table) -> pa.Table:
        return score_table(batch, threshold, w_jacc, w_jw, w_tok)

    return pairs_with_features.map_batches(_score, batch_format="pyarrow",
                                           batch_size=8192)


def score_table(batch: pa.Table, threshold: float, w_jacc: float,
                w_jw: float, w_tok: float) -> pa.Table:
    """The hybrid-score kernel on ONE Arrow table of attached pairs —
    shared by `score_pairs` (streaming map_batches) and the fused
    join-path scorer (`attach_features(scorer=...)`), so both paths are
    bit-identical by construction."""
    n = batch.num_rows
    if n == 0:
        return pa.table({"id_a": pa.array([], pa.int64()),
                         "id_b": pa.array([], pa.int64()),
                         "score": pa.array([], pa.float64())})
    from ..functions.minhash import sig_matrix

    sig_a = sig_matrix(batch["sig_a"])
    sig_b = sig_matrix(batch["sig_b"])
    jacc = est_jaccard(sig_a, sig_b)
    if "path_a" not in batch.column_names:
        # pure-content scoring (paths not attached): score = w_jacc·jacc
        score = w_jacc * jacc
        keep = score >= threshold
        return batch.select(["id_a", "id_b"]).append_column(
            "score", pa.array(score, pa.float64())).filter(pa.array(keep))
    maybe = np.flatnonzero(w_jacc * jacc + w_jw + w_tok >= threshold)
    if maybe.size == 0:
        return pa.table({"id_a": pa.array([], pa.int64()),
                         "id_b": pa.array([], pa.int64()),
                         "score": pa.array([], pa.float64())})
    sub = batch.take(pa.array(maybe))
    paths_a = sub["path_a"].to_pylist()
    paths_b = sub["path_b"].to_pylist()
    jw = jaro_winkler_batch(paths_a, paths_b)
    tok = np.fromiter(
        (token_set_ratio(_tokset(a), _tokset(b))
         for a, b in zip(paths_a, paths_b)),
        dtype=np.float64, count=maybe.size)
    score = hybrid_score(jacc[maybe], jw, tok, w_jacc, w_jw, w_tok)
    keep = score >= threshold
    return sub.select(["id_a", "id_b"]).append_column(
        "score", pa.array(score, pa.float64())).filter(pa.array(keep))
