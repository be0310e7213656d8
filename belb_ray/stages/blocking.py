"""Blocking stage: MinHash-LSH band keys + path sorted-neighborhood keys.

This is the graft's replacement for the reference's SQL homonym grouping
(belb/kbs/query.py:97-175 — SURVEY §2.6 A2: "group things that could be
identical"). Two complementary key families:

- MinHash-LSH over content shingles, lang-partitioned (band keys are
  salted with the lang hash so cross-lang contents never co-block);
- sorted-neighborhood keys from path tokens (catches renamed contents with
  similar paths; SURVEY §7.2 step 2).

``MinHashBlocker`` is a STATEFUL actor-pool stage: the permutation
matrices and the token-hash vocabulary cache are built once per actor in
``__init__`` (the reference's load-once lookup dict, SURVEY §2.4 T6) and
reused across batches: ``ds.map_batches(MinHashBlocker, concurrency=N,
batch_size=B, batch_format="pyarrow")``.

Output is a FEATURES table: one row per input row —
(row_id, lang, path, n_shingles, sig: binary(8*num_perm), simhash: int64).
Band-key explosion to (block_key, row_id) rows is a separate stateless
stage so the kilobyte signature is never multiplied by the band count
through the shuffle (features are re-attached to candidate pairs by a
hash-partitioned join instead — SURVEY §7.3 table).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from ..functions.hashing import as_int64, combine64, ngram_hashes, token_hashes
from ..functions.minhash import MinHasher, band_keys, simhash64
from ..functions.text import sorted_neighborhood_key, tokenize

from belb_ray.util import resolve_num_buckets


class MinHashBlocker:
    """Actor-pool stage computing per-row MinHash signatures + SimHash."""

    def __init__(self, num_perm: int = 128, shingle_k: int = 3, seed: int = 7):
        self.hasher = MinHasher(num_perm=num_perm, seed=seed)
        self.shingle_k = shingle_k
        self.token_cache: dict[str, int] = {}
        self.num_perm = num_perm

    def features_for(self, texts: list[str]) -> tuple[np.ndarray, list[int], list[int]]:
        sigs = np.empty((len(texts), self.num_perm), dtype=np.uint64)
        n_shingles: list[int] = []
        simhashes: list[int] = []
        for i, t in enumerate(texts):
            toks = tokenize(t)
            th = token_hashes(toks, self.token_cache)
            sh = ngram_hashes(th, self.shingle_k)
            sigs[i] = self.hasher.signature(sh)
            n_shingles.append(int(np.unique(sh).size))
            simhashes.append(int(simhash64(th) & np.uint64(0x7FFFFFFFFFFFFFFF)))
        return sigs, n_shingles, simhashes

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.minhash import sig_array

        texts = batch["content"].to_pylist()
        sigs, n_shingles, simhashes = self.features_for(texts)
        return pa.table({
            "row_id": batch["row_id"],
            "lang": batch["lang"],
            "path": batch["path"],
            "n_shingles": pa.array(n_shingles, pa.int32()),
            "sig": sig_array(sigs),  # fixed_size_binary: zero-copy matrix
            "simhash": pa.array(simhashes, pa.int64()),
        })


# per-worker-process blocker cache: Ray reuses worker processes across
# tasks, so a module-level memo gives build-state-once semantics with
# TASK-pool scheduling — measured 3x faster than the actor-pool operator
# at 32 CPUs in Ray 2.49 (actor dispatch overhead dominates when the
# per-batch work is ~100ms). Reserve actor pools for state too large to
# memo per process (models, big vocabularies).
_BLOCKER_CACHE: dict[tuple, MinHashBlocker] = {}


def cached_blocker(num_perm: int, shingle_k: int, seed: int) -> MinHashBlocker:
    key = (num_perm, shingle_k, seed)
    b = _BLOCKER_CACHE.get(key)
    if b is None:
        b = _BLOCKER_CACHE[key] = MinHashBlocker(num_perm=num_perm,
                                                 shingle_k=shingle_k, seed=seed)
    return b


def compute_features(files: rd.Dataset, num_perm: int = 128,
                     shingle_k: int = 3, seed: int = 7,
                     batch_size: int = 2048,
                     keep_cols: tuple = ()) -> rd.Dataset:
    """files → per-row MinHash/SimHash feature table (task-pool map with a
    per-process cached blocker; ``keep_cols`` are carried through)."""

    def _fn(batch: pa.Table) -> pa.Table:
        out = cached_blocker(num_perm, shingle_k, seed)(batch)
        for c in keep_cols:
            out = out.append_column(c, batch[c])
        return out

    return files.map_batches(_fn, batch_format="pyarrow", batch_size=batch_size)


def lang_salt(langs: list[str]) -> np.ndarray:
    """Deterministic per-lang uint64 salt for band keys."""
    from .joins import hash_str

    return np.array([hash_str(l) for l in langs], dtype=np.uint64)


def explode_band_keys(features: rd.Dataset, bands: int = 32) -> rd.Dataset:
    """(features) → (block_key: int64, row_id) rows, ``bands`` per input
    row. Stateless; carries NO signature payload through the shuffle."""

    def _explode(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table({"block_key": pa.array([], pa.int64()),
                             "row_id": pa.array([], pa.int64())})
        from ..functions.minhash import sig_matrix

        sigs = sig_matrix(batch["sig"])
        salts = lang_salt(batch["lang"].to_pylist())
        keys = band_keys(sigs, bands)  # (n, bands) int64
        keys = as_int64(combine64(keys.astype(np.uint64), salts[:, None]))
        row_ids = batch["row_id"].to_numpy()
        return pa.table({
            "block_key": pa.array(keys.ravel(), pa.int64()),
            "row_id": pa.array(np.repeat(row_ids, bands), pa.int64()),
        })

    return features.map_batches(_explode, batch_format="pyarrow")


def path_neighborhood_keys(features: rd.Dataset, width: int = 2) -> rd.Dataset:
    """(features) → (block_key, row_id): sorted-neighborhood key over path
    tokens, salted by lang. One key per row (cheap recall channel for
    renamed near-identical files)."""
    from .joins import hash_str

    def _keys(batch: pa.Table) -> pa.Table:
        paths = batch["path"].to_pylist()
        langs = batch["lang"].to_pylist()
        keys = np.array(
            [hash_str(f"snk:{l}:{sorted_neighborhood_key(p, width)}")
             for p, l in zip(paths, langs)], dtype=np.uint64)
        return pa.table({
            "block_key": pa.array(as_int64(keys), pa.int64()),
            "row_id": batch["row_id"],
        })

    return features.map_batches(_keys, batch_format="pyarrow")


def meta_block_pairs(assignments: rd.Dataset,
                     record_col: str = "record_id",
                     block_col: str = "block_key",
                     max_block_size: int = 128,
                     num_buckets: int = 0) -> rd.Dataset:
    """Meta-blocking (Papadakis et al.): refine a redundant blocking
    collection into a pruned candidate-pair graph. Three classic steps
    over (record, block) assignments:

      1. block purging — blocks larger than ``max_block_size`` are
         dropped whole (the cooccurrence pair generator's skew cap);
      2. CBS edge weighting — each unordered record pair's weight is
         the number of blocks it co-occurs in (Common Blocks Scheme);
      3. weight-edge pruning (WEP) — keep pairs whose weight is ≥ the
         global mean edge weight.

    The reference's homonym/synonym blocking feeds exactly this pair
    graph shape (belb/kbs/query.py homonym candidate generation); this
    is its scale-path refinement. Returns (a, b, w) with a < b.

    Distributed shape: pair generation + weight count ride the
    cooccurrence machinery (ONE block co-location shuffle, vectorized
    in-bucket pair explosion, int-keyed count combiner). The mean
    threshold is an EXACT integer comparison (w·n_pairs ≥ Σw — no
    float divergence) computed from per-block partial sums (two tiny
    numbers per block reach the driver, never pairs)."""
    num_buckets = resolve_num_buckets(num_buckets)
    import pandas as pd

    from .cooccur import cooccurrence_pairs
    from .agg import preagg_groupby

    pairs = cooccurrence_pairs(assignments, block_col, record_col,
                               num_buckets,
                               max_group_size=max_block_size)
    w = preagg_groupby(pairs, ["a", "b"], [("count", "", "w")],
                       num_buckets).materialize()  # reused 2x

    def _partial(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"s": [int(b["w"].sum())], "n": [len(b)]})

    tot = w.map_batches(_partial, batch_format="pandas").to_pandas()
    if len(tot) == 0:  # no pairs at all (e.g. every block purged)
        return w
    s, n = int(tot["s"].sum()), int(tot["n"].sum())
    if n == 0:
        return w
    # w·n ≥ s  ⟺  integer w ≥ ceil(s/n): exact, and expressible as the
    # single comparison Ray's filter-expression parser accepts
    return w.filter(expr=f"w >= {(s + n - 1) // n}")
