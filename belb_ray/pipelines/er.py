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

from ..util import resolve_num_buckets

from ..stages.blocking import MinHashBlocker, explode_band_keys, path_neighborhood_keys
from ..stages.cluster import assign_clusters, connected_components
from ..stages.dedup import ensure_identity_columns, exact_dedup_annotate
from ..stages.pairs import candidate_pairs
from ..stages.scoring import attach_features, score_pairs, score_table


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
    join_buckets: int = 0  # 0 = auto (util.default_shuffle_partitions)
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

    # Feature table MATERIALIZES before the dedup shuffle (round 4):
    # leaving it lazy fuses read→sketch→bucketize→sort→attach into one
    # deep plan, and at low CPU counts the streaming executor's
    # per-operator resource reservations starve every stage to ~1
    # concurrent task (measured: 4M rows at 4 CPUs ran 858 s lazy vs
    # 199 s with this barrier — BASELINE.md round-4 campaign). The
    # round-1 "fewer barriers" rule still holds for BALANCED plans; a
    # deep plan whose stages all want full width is the exception.
    features_all = features_all.materialize()
    fm = exact_dedup_annotate(features_all).materialize()
    # free each wide feature copy as soon as its successor is
    # materialized: keeping features_all/fm referenced pins ~n x 1.2 KB
    # of plasma EACH for the whole run — at 16M rows the three copies
    # (~57 GB) overran a 64 GB store into a disk-capped spill (round 5).
    # members materializes NARROW (16 B/row) so dropping fm really
    # releases the wide blocks.
    del features_all
    members = fm.select_columns(["row_id", "rep_id"]).materialize()
    # materialized: consumed 3× (band keys, path keys, feature joins)
    features = fm.map_batches(
        lambda t: t.filter(pc.equal(t["row_id"], t["rep_id"]))
        .drop_columns(["content_sha256", "rep_id"]),
        batch_format="pyarrow").materialize()
    del fm

    def _build_edges() -> rd.Dataset:
        blocks = explode_band_keys(features, bands=cfg.bands)
        if cfg.use_path_keys:
            blocks = blocks.union(path_neighborhood_keys(features))
        pairs = candidate_pairs(blocks, max_block=cfg.max_block, window=cfg.window)
        # pure-content configs (w_jw = w_tok = 0, e.g. MinHash doc dedup)
        # never broadcast or gather the path column
        # scorer fused into the attach: on the join fallback the wide
        # (pair x 2-signature) blocks never leave the bucket task
        return attach_features(
            pairs, features, num_buckets=resolve_num_buckets(cfg.join_buckets),
            need_paths=cfg.w_jw > 0 or cfg.w_tok > 0,
            scorer=lambda t: score_table(t, cfg.threshold, cfg.w_jacc,
                                         cfg.w_jw, cfg.w_tok))

    if checkpoint_dir is not None:
        edges = checkpoint_stage(_build_edges, f"{checkpoint_dir}/edges",
                                 cfg.to_dict(), lineage={"stage": "edges"})
    else:
        edges = _build_edges()

    labels = connected_components(
        edges,
        checkpoint_dir=f"{checkpoint_dir}/cc" if checkpoint_dir else None)
    clusters = assign_clusters(members, labels, num_buckets=resolve_num_buckets(cfg.join_buckets))

    return {"clusters": clusters, "edges": edges, "members": members,
            "features": features}


def cluster_summary(clusters: rd.Dataset) -> rd.Dataset:
    """cluster_id → size (the A1-synset-style rollup over clusters)."""
    from ray.data.aggregate import Count

    return clusters.groupby("cluster_id").aggregate(Count(alias_name="size"))


# ---------------------------------------------------------------- increment

def save_resolution_state(result: dict, state_dir: str) -> None:
    """Persist a ``resolve_files`` result for incremental attachment:
    rep features (row_id, sig, path) + full assignments (row_id,
    cluster_id), each an append-only run-shard directory (the
    stages/incremental.py registry pattern — a crashed run leaves prior
    shards untouched and re-appends)."""
    import glob as _glob
    import os as _os
    import time as _time

    runs = sorted(_glob.glob(_os.path.join(state_dir, "features", "run-*")))
    tag = f"run-{len(runs):06d}-{int(_time.time())}"
    result["features"].write_parquet(
        _os.path.join(state_dir, "features", tag))
    result["clusters"].write_parquet(
        _os.path.join(state_dir, "clusters", tag))


def resolve_increment(
    new_files: rd.Dataset,
    state_dir: str,
    cfg: ERConfig = ERConfig(),
    update_state: bool = True,
    max_per_key: int | None = None,
    broadcast_threshold: int = 2_000_000,
) -> rd.Dataset:
    """Attach a NEW batch of files to an existing resolution — the
    streaming-ingest completion of the flagship (the ER twin of
    stages/incremental.neardup_against_state; reference analog: the
    history-resolved incremental KB rebuild, SURVEY §2.4 J2/T9).

    Semantics (deterministic, iteration-free):

    1. New rows sketch + exact-dedup exactly like ``resolve_files``.
    2. Band/path block keys pair new reps with STATE reps (cross) and
       with each other (nn); scoring is the flagship's hybrid kernel.
    3. New reps first cluster among THEMSELVES (connected components
       over nn edges); each component then inherits the MIN existing
       cluster id its members cross-matched (score ≥ threshold), or
       keeps min-member-row_id as a fresh cluster id. Existing
       assignments are never mutated (merge-conflicts between OLD
       clusters surface via the cross edges but are deliberately not
       auto-merged — that is a curation decision, cf. homonym QAQC).
    4. Returns (row_id, cluster_id, matched_existing) for ALL new rows;
       appends the new reps' features + assignments to the state.

    Scale shape: state ships (block_key, row_id) and (row_id, sig,
    path) rows only — never content; candidate generation is ONE
    block-key co-location shuffle with a deterministic per-(key, side)
    member cap (``max_per_key`` smallest row_ids survive — the
    candidate_pairs hot-key budget in cross-batch form); every
    attach/membership step is broadcast-or-partitioned by size."""
    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc

    from ..sources.readers import read_parquet_clean

    if max_per_key is None:
        # align the cross-batch hot-key budget with the flagship's
        # within-batch block cap: the old 256 default admitted up to
        # 256x256 = 65k pairs per hot key — measured 43.6M candidate
        # pairs (41.7M cross) for a 1M-row increment against 4M state,
        # 62s pair-gen + 76s scoring at 16 CPUs (round-5 campaign)
        max_per_key = cfg.max_block
    from ..stages.analytic import _attach_small
    from ..stages.blocking import compute_features
    from ..stages.scoring import attach_features, score_pairs, score_table

    files = ensure_identity_columns(new_files)
    if cfg.input_blocks:
        files = files.repartition(cfg.input_blocks)
    feats_all = compute_features(
        files, num_perm=cfg.num_perm, shingle_k=cfg.shingle_k, seed=cfg.seed,
        batch_size=cfg.blocker_batch_size,
        keep_cols=("content_sha256",)).materialize()
    fm = exact_dedup_annotate(feats_all).materialize()
    members = fm.select_columns(["row_id", "rep_id"])
    feats_new = fm.map_batches(
        lambda t: t.filter(pc.equal(t["row_id"], t["rep_id"]))
        .drop_columns(["content_sha256", "rep_id"]),
        batch_format="pyarrow").materialize()

    import glob as _glob
    import os as _os

    feat_shards = sorted(_glob.glob(
        _os.path.join(state_dir, "features", "run-*", "*.parquet")))
    if not feat_shards:
        raise FileNotFoundError(
            f"resolve_increment: no state under {state_dir}/features — "
            "run resolve_files + save_resolution_state first")
    feats_old = read_parquet_clean(feat_shards)

    def _blocks(feats: rd.Dataset) -> rd.Dataset:
        b = explode_band_keys(feats, bands=cfg.bands)
        if cfg.use_path_keys:
            b = b.union(path_neighborhood_keys(feats))
        return b

    def _tag(side: int):
        def fn(t: pa.Table) -> pa.Table:
            import numpy as _np
            return t.append_column("__side", pa.array(
                _np.full(t.num_rows, side, _np.int8)))
        return fn

    # state-side key prefilter: only block keys that ALSO occur on the
    # new side can generate a cross pair, so the (much larger) state
    # block stream is membership-filtered BEFORE the pair shuffle — at
    # 100 TB the standing state dwarfs any one increment, and this is
    # what keeps the shuffle proportional to the increment, not the
    # state. Budget-guarded broadcast (sorted uint64 keys, searchsorted
    # per batch); past the budget the filter is skipped — correctness
    # never depends on it (non-co-occurring keys pair with nothing).
    new_blocks = _blocks(feats_new).materialize()
    from ..stages.joins import collect_arrow
    from ..util import broadcast_byte_budget, cached_get

    key_tbl = collect_arrow(new_blocks.map_batches(
        lambda t: pa.table({"block_key": pa.array(
            np.unique(t["block_key"].to_numpy()))}),
        batch_format="pyarrow"))
    new_keys = np.unique(key_tbl["block_key"].to_numpy())
    import ray as _ray

    old_blocks = _blocks(feats_old)
    if new_keys.nbytes <= broadcast_byte_budget():
        kref = _ray.put(new_keys)

        def _filter_old(t: pa.Table) -> pa.Table:
            keys = cached_get(kref)
            want = t["block_key"].to_numpy()
            idx = np.minimum(np.searchsorted(keys, want), len(keys) - 1)
            return t.filter(pa.array(
                keys[idx] == want if len(keys) else
                np.zeros(len(want), bool)))

        old_blocks = old_blocks.map_batches(_filter_old,
                                            batch_format="pyarrow")

    both = (new_blocks.map_batches(_tag(1), batch_format="pyarrow")
            .union(old_blocks.map_batches(_tag(0),
                                          batch_format="pyarrow")))

    num_buckets = resolve_num_buckets(cfg.join_buckets)

    def _bucketize(b: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_array(b["block_key"].to_numpy(), categorize=False)
        b["__bucket"] = (h % np.uint64(num_buckets)).astype(np.int32)
        return b

    def _pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop(columns="__bucket").drop_duplicates(
            ["block_key", "row_id", "__side"])
        # deterministic hot-key budget: keep the max_per_key smallest
        # row_ids per (key, side) — same recall contract as
        # candidate_pairs' sorted-window fallback
        g = (g.sort_values(["block_key", "__side", "row_id"],
                           kind="mergesort")
             .groupby(["block_key", "__side"], sort=False)
             .head(max_per_key))
        new = g.loc[g["__side"] == 1, ["block_key", "row_id"]]
        old = g.loc[g["__side"] == 0, ["block_key", "row_id"]]
        cross = new.merge(old, on="block_key", suffixes=("", "_o"))
        cross = pd.DataFrame({"id_a": cross["row_id"],
                              "id_b": cross["row_id_o"],
                              "is_cross": np.int8(1)})
        nn = new.merge(new, on="block_key", suffixes=("", "_o"))
        nn = nn[nn["row_id"] < nn["row_id_o"]]
        nn = pd.DataFrame({"id_a": nn["row_id"], "id_b": nn["row_id_o"],
                           "is_cross": np.int8(0)})
        out = pd.concat([cross, nn], ignore_index=True)
        return out.drop_duplicates(["id_a", "id_b", "is_cross"])

    raw_pairs = (both.map_batches(_bucketize, batch_format="pandas")
                 .groupby("__bucket").map_groups(_pairs,
                                                 batch_format="pandas"))

    # global cross-band pair dedup (the candidate_pairs device, pairs.py):
    # family members share up to `bands` band keys, and each shared key
    # regenerates the same pair in a different bucket — without this the
    # scorer re-scores every duplicate (measured round 5: 43.6M scored
    # pairs → 2.35M unique for a 1M-row increment against 4M state; the
    # duplicates were ~90% of attach+score wall). Dedup keys on
    # (id_a, id_b): cross (new x old) and nn (new x new) pairs are
    # disjoint in id space, so is_cross rides along untouched.
    def _pair_bucket(batch: pa.Table) -> pa.Table:
        a = batch["id_a"].to_numpy().astype(np.uint64)
        b = batch["id_b"].to_numpy().astype(np.uint64)
        h = (a * np.uint64(0x9E3779B97F4A7C15)) ^ (
            b + np.uint64(0xC2B2AE3D27D4EB4F))
        return batch.append_column(
            "__pb", pa.array((h % np.uint64(num_buckets)).astype(np.int32)))

    def _pair_dedup(group: pa.Table) -> pa.Table:
        a = group["id_a"].to_numpy()
        b = group["id_b"].to_numpy()
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        keep = np.r_[True, (a[1:] != a[:-1]) | (b[1:] != b[:-1])]
        return pa.table({
            "id_a": pa.array(a[keep], pa.int64()),
            "id_b": pa.array(b[keep], pa.int64()),
            "is_cross": group["is_cross"].take(
                pa.array(order[keep]))})

    pairs = (raw_pairs.map_batches(_pair_bucket, batch_format="pyarrow")
             .groupby("__pb").map_groups(_pair_dedup,
                                         batch_format="pyarrow")
             ).materialize()

    need_paths = cfg.w_jw > 0 or cfg.w_tok > 0
    cross_pairs = pairs.filter(expr="is_cross == 1").drop_columns(["is_cross"])
    nn_pairs = pairs.filter(expr="is_cross == 0").drop_columns(["is_cross"])

    # The cross attach only needs features for ids that actually appear
    # in a pair — unpaired STATE reps (the bulk, in any realistic
    # increment) must not enter the attach broadcast, whose driver-side
    # gather was the measured Amdahl serial term (round 5: s grew
    # 65 s → 109 s from the 4M- to the 8M-state campaign because the
    # un-filtered union gathered state+increment features ∝ state).
    # Pair-id set is ∝ pairs (16 B/id), collected via per-block uniques.
    def _pids(t: pa.Table) -> pa.Table:
        both = np.concatenate([t["id_a"].to_numpy(), t["id_b"].to_numpy()])
        return pa.table({"row_id": pa.array(np.unique(both))})

    pid_tbl = collect_arrow(
        cross_pairs.map_batches(_pids, batch_format="pyarrow"))
    pair_ids = np.unique(pid_tbl["row_id"].to_numpy())
    pref = _ray.put(pair_ids)

    def _filter_feats(t: pa.Table) -> pa.Table:
        keys = cached_get(pref)
        want = t["row_id"].to_numpy()
        idx = np.minimum(np.searchsorted(keys, want), len(keys) - 1)
        return t.filter(pa.array(
            keys[idx] == want if len(keys) else
            np.zeros(len(want), bool)))

    paired_feats = (feats_new.union(feats_old)
                    .map_batches(_filter_feats, batch_format="pyarrow"))
    _scorer = lambda t: score_table(t, cfg.threshold, cfg.w_jacc,
                                    cfg.w_jw, cfg.w_tok)
    cross_edges = attach_features(
        cross_pairs, paired_feats, num_buckets=resolve_num_buckets(cfg.join_buckets),
        need_paths=need_paths, scorer=_scorer)
    nn_edges = attach_features(
        nn_pairs, feats_new, num_buckets=resolve_num_buckets(cfg.join_buckets),
        need_paths=need_paths, scorer=_scorer)

    # components among the new reps, then per-component inheritance
    labels = connected_components(nn_edges, num_buckets=resolve_num_buckets(cfg.join_buckets))
    rep_ids = feats_new.select_columns(["row_id"])
    rep_members = rep_ids.map_batches(
        lambda t: pa.table({"row_id": t["row_id"], "rep_id": t["row_id"]}),
        batch_format="pyarrow")
    comp = assign_clusters(rep_members, labels,
                           num_buckets=resolve_num_buckets(cfg.join_buckets))  # row_id -> comp id

    clus_shards = sorted(_glob.glob(
        _os.path.join(state_dir, "clusters", "run-*", "*.parquet")))
    old_clusters = read_parquet_clean(clus_shards)
    old_map = old_clusters.map_batches(
        lambda t: pa.table({"id_b": t["row_id"],
                            "old_cluster": t["cluster_id"]}),
        batch_format="pyarrow")
    cross_w = _attach_small(
        cross_edges.select_columns(["id_a", "id_b"]), old_map, "id_b",
        broadcast_threshold)
    comp_keyed = comp.map_batches(
        lambda t: pa.table({"id_a": t["row_id"], "comp": t["cluster_id"]}),
        batch_format="pyarrow")
    cross_wc = _attach_small(cross_w, comp_keyed, "id_a",
                             broadcast_threshold)

    from ..stages.agg import preagg_groupby

    inherit = preagg_groupby(
        cross_wc.select_columns(["comp", "old_cluster"]), ["comp"],
        [("min", "old_cluster", "inherited")],
        num_buckets=resolve_num_buckets(cfg.join_buckets)).materialize()

    # rep -> final cluster: inherited if its component cross-matched
    rep_comp = comp.map_batches(
        lambda t: pa.table({"row_id": t["row_id"], "comp": t["cluster_id"]}),
        batch_format="pyarrow")
    if inherit.count() == 0:
        # no new rep matched the state (disjoint batch): a zero-row
        # combiner output has ZERO blocks (schema None), which the
        # broadcast join can't collect — synthesize the null column
        rep_final = rep_comp.map_batches(
            lambda t: t.append_column(
                "inherited", pa.nulls(t.num_rows, pa.int64())),
            batch_format="pyarrow")
    else:
        rep_final = _attach_small(rep_comp, inherit, "comp",
                                  broadcast_threshold,
                                  join_type="left outer")

    def _pick(t: pa.Table) -> pa.Table:
        # pc.coalesce keeps 64-bit ids exact (a numpy float64 round-trip
        # would corrupt stable_id64 values past 2**53)
        inh = t["inherited"]
        cid = pc.coalesce(pc.cast(inh, pa.int64()),
                          pc.cast(t["comp"], pa.int64()))
        return pa.table({
            "rep_id": t["row_id"],
            "rep_cluster": cid,
            "matched_existing": pc.is_valid(inh)})

    rep_assign = rep_final.map_batches(_pick, batch_format="pyarrow")

    assigned = _attach_small(members, rep_assign, "rep_id",
                             broadcast_threshold)
    out = assigned.map_batches(
        lambda t: pa.table({"row_id": t["row_id"],
                            "cluster_id": t["rep_cluster"],
                            "matched_existing": t["matched_existing"]}),
        batch_format="pyarrow").materialize()

    if update_state:
        import time as _time

        runs = sorted(_glob.glob(_os.path.join(state_dir, "features",
                                               "run-*")))
        tag = f"run-{len(runs):06d}-{int(_time.time())}"
        feats_new.write_parquet(_os.path.join(state_dir, "features", tag))
        out.select_columns(["row_id", "cluster_id"]).write_parquet(
            _os.path.join(state_dir, "clusters", tag))
    return out
