"""The flagship ER pipeline: files → transitive entity clusters.

Stage graph (SURVEY §7.1/§7.3; north_star in BASELINE.json):

  read_parquet(files)                       # column-pruned at the read
   → ensure_identity_columns                # row_id + content_sha256 (invariant)
   → exact_dedup (groupby content_sha256)   # hot-key pre-collapse (vendored files)
   → reps → MinHashBlocker actor pool       # signatures: state once per actor
   → explode band keys ∪ path-neighborhood  # (block_key, row_id), no payload
   → candidate_pairs (groupby block_key)    # capped/salted pair budget
   → attach_features (2 hash-partition joins)
   → score_pairs (vectorized hybrid)        # → edges ≥ threshold
   → connected_components (label propagation to fixpoint)
   → assign_clusters (expand exact-dup members back)

Wide ``content`` never crosses a shuffle: after the blocker, rows are
(row_id, sig, path) — SURVEY §7.4 "wide content rows".
"""

from __future__ import annotations

from dataclasses import asdict, dataclass, field

import pyarrow as pa
import ray.data as rd

from ..stages.blocking import MinHashBlocker, explode_band_keys, path_neighborhood_keys
from ..stages.cluster import assign_clusters, connected_components
from ..stages.dedup import ensure_identity_columns, exact_dedup_annotate
from ..stages.pairs import candidate_pairs
from ..stages.scoring import attach_features, score_pairs


@dataclass(frozen=True)
class ERConfig:
    """Frozen, hashable config (reference: frozen config + hexdigest
    versioning, belb/utils/__init__.py:273-334 — SURVEY §2.8)."""
    num_perm: int = 128
    bands: int = 32
    shingle_k: int = 3
    seed: int = 7
    threshold: float = 0.5
    w_jacc: float = 0.7
    w_jw: float = 0.15
    w_tok: float = 0.15
    max_block: int = 64
    window: int = 8
    use_path_keys: bool = True
    join_buckets: int = 32
    blocker_batch_size: int = 2048
    input_blocks: int | None = None  # repartition narrow inputs for pool parallelism

    def to_dict(self) -> dict:
        return asdict(self)


def resolve_files(
    files: rd.Dataset,
    cfg: ERConfig = ERConfig(),
    checkpoint_dir: str | None = None,
) -> dict[str, rd.Dataset]:
    """Run the full pipeline. Returns dict of result datasets:
    clusters(row_id, cluster_id), edges(id_a, id_b, score),
    members(row_id, rep_id), features."""
    from .checkpoint import checkpoint_stage

    from ..stages.joins import hash_partition_join

    files = ensure_identity_columns(files)
    if cfg.input_blocks:
        files = files.repartition(cfg.input_blocks)

    # Features for EVERY row, before any shuffle: the wide `content` column
    # is read once, hashed/sketched, and dropped — only the ~1 KB feature
    # rows (sig, path, sha) ever cross a shuffle (SURVEY §7.4 "wide
    # content rows"). Exact dups waste a little compute re-sketching
    # identical content; that beats shuffling content bytes. Task-pool map
    # with a per-process cached blocker (see stages/blocking.py).
    from ..stages.blocking import compute_features

    features_all = compute_features(
        files, num_perm=cfg.num_perm, shingle_k=cfg.shingle_k, seed=cfg.seed,
        batch_size=cfg.blocker_batch_size,
        keep_cols=("content_sha256",))

    import pyarrow.compute as pc

    # rep per content hash in ONE bucketed shuffle (annotate rows with
    # rep_id = min row_id of their sha group) — no aggregate + join pair.
    # features_all stays LAZY so sketching fuses into the shuffle's map
    # side: one barrier here instead of two (barrier count is what capped
    # round-1 scaling efficiency).
    fm = exact_dedup_annotate(features_all).materialize()
    members = fm.select_columns(["row_id", "rep_id"])
    # materialized: consumed 3× (band keys, path keys, feature joins)
    features = fm.map_batches(
        lambda t: t.filter(pc.equal(t["row_id"], t["rep_id"]))
        .drop_columns(["content_sha256", "rep_id"]),
        batch_format="pyarrow").materialize()

    def _build_edges() -> rd.Dataset:
        blocks = explode_band_keys(features, bands=cfg.bands)
        if cfg.use_path_keys:
            blocks = blocks.union(path_neighborhood_keys(features))
        pairs = candidate_pairs(blocks, max_block=cfg.max_block, window=cfg.window)
        # pure-content configs (w_jw = w_tok = 0, e.g. MinHash doc dedup)
        # never broadcast or gather the path column
        pf = attach_features(pairs, features, num_buckets=cfg.join_buckets,
                             need_paths=cfg.w_jw > 0 or cfg.w_tok > 0)
        return score_pairs(pf, threshold=cfg.threshold, w_jacc=cfg.w_jacc,
                           w_jw=cfg.w_jw, w_tok=cfg.w_tok)

    if checkpoint_dir is not None:
        edges = checkpoint_stage(_build_edges, f"{checkpoint_dir}/edges",
                                 cfg.to_dict(), lineage={"stage": "edges"})
    else:
        edges = _build_edges()

    labels = connected_components(
        edges,
        checkpoint_dir=f"{checkpoint_dir}/cc" if checkpoint_dir else None)
    clusters = assign_clusters(members, labels, num_buckets=cfg.join_buckets)

    return {"clusters": clusters, "edges": edges, "members": members,
            "features": features}


def cluster_summary(clusters: rd.Dataset) -> rd.Dataset:
    """cluster_id → size (the A1-synset-style rollup over clusters)."""
    from ray.data.aggregate import Count

    return clusters.groupby("cluster_id").aggregate(Count(alias_name="size"))
