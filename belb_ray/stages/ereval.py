"""Cluster-quality evaluation: pairwise P/R/F1 and B-cubed vs a gold
labeling.

The reference evaluates entity annotations against gold subsets
(belb/corpora/corpus.py evaluation splits; SURVEY §2.5 A11); this is
the cluster-level twin every ER run needs: given a predicted cluster
column and a gold cluster column on the SAME rows, score the
prediction without materializing any pairs.

Both metric families reduce to the contingency cells
``n_pg = |pred = p AND gold = g|`` plus the marginals ``n_p``/``n_g``:

- pairwise: TP = sum C(n_pg,2); P = TP / sum C(n_p,2);
  R = TP / sum C(n_g,2)   (pairs counted combinatorially — the
  quadratic pair blowup never happens).
- B-cubed: precision = (1/N) sum n_pg^2 / n_p;
  recall = (1/N) sum n_pg^2 / n_g   (Bagga & Baldwin 1998).

Scale shape: ONE combiner-style aggregation builds the cells
(`agg.preagg_groupby` — partials per batch, single-int bucketed
shuffle); marginals are two more tiny aggregations OVER THE CELLS
(cells << rows), joined back cell-wise with broadcast-or-partition
joins. The driver only ever sees the final scalar sums.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from belb_ray.stages.agg import preagg_groupby
from belb_ray.util import resolve_num_buckets
from ..util import round_half_away


def cluster_quality(ds: rd.Dataset, pred_col: str, gold_col: str,
                    num_buckets: int = 0) -> rd.Dataset:
    """One-row Dataset: n_rows, pairwise_precision/recall/f1,
    bcubed_precision/recall/f1 (floats, unrounded)."""
    # materialize: the cell table feeds FOUR consumers below — without
    # pinning it, Ray's lazy plan re-runs the full input scan per
    # consumer. Cells are one row per (pred, gold) co-occurring pair of
    # cluster ids — orders of magnitude smaller than the input.
    cells = preagg_groupby(ds, [pred_col, gold_col],
                           [("count", pred_col, "n_pg")],
                           num_buckets=num_buckets).materialize()

    # marginals over the (small) cell table: n_p per pred, n_g per gold
    n_p = preagg_groupby(cells, [pred_col], [("sum", "n_pg", "n_p")],
                         num_buckets=num_buckets).materialize()
    n_g = preagg_groupby(cells, [gold_col], [("sum", "n_pg", "n_g")],
                         num_buckets=num_buckets).materialize()

    # cell-level partial sums; marginal-level pair counts
    def _cell_part(b: pd.DataFrame) -> pd.DataFrame:
        n = b["n_pg"].to_numpy(np.float64)
        return pd.DataFrame({
            "tp_pairs": [float((n * (n - 1) / 2).sum())],
            "pred_pairs": [0.0], "gold_pairs": [0.0],
            "bc_p": [0.0], "bc_r": [0.0],
            "n_rows": [int(b["n_pg"].sum())]})

    def _pred_part(b: pd.DataFrame) -> pd.DataFrame:
        n = b["n_p"].to_numpy(np.float64)
        return pd.DataFrame({
            "tp_pairs": [0.0],
            "pred_pairs": [float((n * (n - 1) / 2).sum())],
            "gold_pairs": [0.0], "bc_p": [0.0], "bc_r": [0.0],
            "n_rows": [0]})

    def _gold_part(b: pd.DataFrame) -> pd.DataFrame:
        n = b["n_g"].to_numpy(np.float64)
        return pd.DataFrame({
            "tp_pairs": [0.0], "pred_pairs": [0.0],
            "gold_pairs": [float((n * (n - 1) / 2).sum())],
            "bc_p": [0.0], "bc_r": [0.0], "n_rows": [0]})

    # B-cubed needs n_pg^2 / marginal per cell: attach marginals by key.
    from belb_ray.stages.joins import broadcast_join

    cells_p = broadcast_join(cells, n_p, pred_col)
    cells_pg = broadcast_join(cells_p, n_g, gold_col)

    def _bc_part(b: pd.DataFrame) -> pd.DataFrame:
        sq = b["n_pg"].to_numpy(np.float64) ** 2
        return pd.DataFrame({
            "tp_pairs": [0.0], "pred_pairs": [0.0],
            "gold_pairs": [0.0],
            "bc_p": [float((sq / b["n_p"].to_numpy(np.float64)).sum())],
            "bc_r": [float((sq / b["n_g"].to_numpy(np.float64)).sum())],
            "n_rows": [0]})

    parts = (cells.map_batches(_cell_part, batch_format="pandas")
             .union(n_p.map_batches(_pred_part, batch_format="pandas"))
             .union(n_g.map_batches(_gold_part, batch_format="pandas"))
             .union(cells_pg.map_batches(_bc_part,
                                         batch_format="pandas")))

    def _finish(b: pd.DataFrame) -> pd.DataFrame:
        tp = b["tp_pairs"].sum()
        pp = b["pred_pairs"].sum()
        gp = b["gold_pairs"].sum()
        n = float(b["n_rows"].sum())
        prec = tp / pp if pp else 0.0
        rec = tp / gp if gp else 0.0
        f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
        bp = b["bc_p"].sum() / n if n else 0.0
        br = b["bc_r"].sum() / n if n else 0.0
        bf = 2 * bp * br / (bp + br) if bp + br else 0.0
        return pd.DataFrame({
            "n_rows": [int(n)],
            "pair_precision": [prec], "pair_recall": [rec],
            "pair_f1": [f1],
            "bcubed_precision": [bp], "bcubed_recall": [br],
            "bcubed_f1": [bf]})

    # the partial rows are a handful of scalars — a single-task combine
    return parts.repartition(1).map_batches(_finish,
                                            batch_format="pandas")


def calibration_curve(ds: rd.Dataset, score_col: str, label_col: str,
                      n_bins: int = 10, lo: float = 0.0, hi: float = 1.0,
                      num_buckets: int = 0) -> rd.Dataset:
    """Reliability curve + expected calibration error for a match score
    against a binary label (the linkage-score QA step after Fellegi-
    Sunter / Jaro-Winkler scoring — is a 0.9 score right 90% of the
    time?). Scores are clipped into ``n_bins`` equal-width bins over
    [lo, hi); per bin: row count, mean score (confidence), empirical
    positive rate, |gap|; every row also carries the global ``ece``
    (sum of n_b/N * |rate_b - conf_b|).

    Scale shape: ONE fixed-width-bin combiner pass (sum/count partials
    per batch, single-int bucketed shuffle); the ECE finish runs over
    the n_bins-row result in a single task."""
    width = (hi - lo) / n_bins

    def _binned(b: pd.DataFrame) -> pd.DataFrame:
        s = b[score_col].to_numpy(np.float64)
        binned = np.clip(((s - lo) / width).astype(np.int64), 0, n_bins - 1)
        return pd.DataFrame({
            "bin": binned, "__s": s,
            "__y": b[label_col].to_numpy(np.float64)})

    cells = preagg_groupby(ds.map_batches(_binned, batch_format="pandas"),
                           ["bin"],
                           [("count", "bin", "n"),
                            ("sum", "__s", "sum_score"),
                            ("sum", "__y", "sum_label")],
                           num_buckets=num_buckets)

    def _finish(b: pd.DataFrame) -> pd.DataFrame:
        b = b.sort_values("bin").reset_index(drop=True)
        n = b["n"].to_numpy(np.float64)
        conf = b["sum_score"].to_numpy(np.float64) / n
        rate = b["sum_label"].to_numpy(np.float64) / n
        gap = np.abs(rate - conf)
        ece = float((n / n.sum() * gap).sum()) if n.sum() else 0.0
        return pd.DataFrame({
            "bin": b["bin"].astype("int64"), "n": b["n"].astype("int64"),
            "mean_score": conf, "event_rate": rate, "abs_gap": gap,
            "ece": ece})

    # n_bins rows — single-task finish
    return cells.repartition(1).map_batches(_finish, batch_format="pandas")


def cannot_link_audit(clusters: rd.Dataset, pairs: rd.Dataset,
                      id_col: str, cluster_col: str,
                      id_a: str = "id_a", id_b: str = "id_b",
                      num_buckets: int = 0) -> rd.Dataset:
    """Constraint QA after clustering: count cannot-link pairs whose two
    members landed in the SAME predicted cluster (each such pair is a
    resolution error a reviewer must split). Returns one row per
    violated cluster: (cluster, violations).

    Scale shape: the cluster assignment is dataset-scale, so each pair
    side attaches by a partitioned hash join (two shuffles of the
    narrow pair table; the assignment shuffles once per side); the
    per-cluster count is a combiner pass over the surviving pairs."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from belb_ray.stages.joins import hash_partition_join

    def _rename(mapping: dict[str, str]):
        # Dataset.rename_columns' Project op crashes on pandas-format
        # blocks (calls pa.Table.rename_columns on a DataFrame); an
        # Arrow map_batches rename is block-format-proof
        def fn(t: pa.Table) -> pa.Table:
            return t.rename_columns(
                [mapping.get(c, c) for c in t.column_names])
        return fn

    asg = clusters.select_columns([id_col, cluster_col])
    a = hash_partition_join(
        pairs.select_columns([id_a, id_b])
        .map_batches(_rename({id_a: id_col}), batch_format="pyarrow"),
        asg, id_col, num_buckets=num_buckets)
    a = a.map_batches(_rename({id_col: id_a, cluster_col: "__ca",
                               id_b: id_col}), batch_format="pyarrow")
    b = hash_partition_join(a, asg, id_col, num_buckets=num_buckets)
    b = b.map_batches(_rename({id_col: id_b, cluster_col: "__cb"}),
                      batch_format="pyarrow")

    def _same(t: pa.Table) -> pa.Table:
        keep = t.filter(pc.equal(t["__ca"], t["__cb"]))
        return keep.select([id_a, "__ca"]).rename_columns([id_a,
                                                           cluster_col])

    same = b.map_batches(_same, batch_format="pyarrow")
    return preagg_groupby(same, [cluster_col],
                          [("count", cluster_col, "violations")],
                          num_buckets=num_buckets)


def blocking_ablation(files: rd.Dataset, gold_pairs: rd.Dataset,
                      bands: int = 32, num_perm: int = 128,
                      shingle_k: int = 3, seed: int = 7,
                      snm_width: int = 2, max_block: int = 4096,
                      max_gold: int = 5_000_000) -> rd.Dataset:
    """Blocking-scheme ablation: which blocking family earns its keep?

    For each scheme (MinHash-LSH content bands; path sorted-neighborhood
    keys) and for their union, one row:

        (scheme, n_pairs, gold_covered, gold_recall, unique_gold)

    ``n_pairs`` per scheme is the raw candidate count (the work that
    scheme generates); on the ``union`` row it is the DISTINCT pair
    count across schemes (pairs produced by both schemes counted once —
    the de-duplicated comparison workload of running them together).
    ``gold_recall`` is measured against the gold positive pairs whose
    endpoints survive exact-dup collapse as DISTINCT reps (pairs merged
    by the collapse are blocking-free wins — reported in the
    ``collapse`` row). ``unique_gold`` = gold pairs only this scheme
    covers: the marginal contribution that justifies running the scheme
    at all (the methodology twin of pairs-completeness, cf.
    `snm_blocking_quality`).

    Shape: features once, both key channels reuse the ER pipeline's own
    generators (`explode_band_keys`, `path_neighborhood_keys`) and the
    skew-capped `candidate_pairs`; gold ids map to rep space via two
    distributed hash joins (no driver-side row_id→rep dict); candidate
    counts and the union-distinct count stay distributed; only PACKED
    GOLD KEYS (≤ |gold|, budget-guarded) ever reach the driver for the
    set algebra. Gold ids absent from ``files`` raise a named error."""
    import ray

    from ..functions.hashing import combine64
    from ..stages.blocking import (compute_features, explode_band_keys,
                                   path_neighborhood_keys)
    from ..stages.dedup import exact_dedup_annotate
    from ..stages.joins import hash_partition_join, semi_join
    from ..stages.pairs import candidate_pairs

    feats_all = compute_features(files, num_perm=num_perm,
                                 shingle_k=shingle_k, seed=seed,
                                 keep_cols=("content_sha256",)).materialize()
    fm = exact_dedup_annotate(feats_all).materialize()
    feats = fm.map_batches(
        lambda t: t.filter(pa.compute.equal(t["row_id"], t["rep_id"]))
        .drop_columns(["content_sha256", "rep_id"]),
        batch_format="pyarrow").materialize()

    def _ren(mapping: dict[str, str]):
        def fn(t: pa.Table) -> pa.Table:
            return t.rename_columns(
                [mapping.get(c, c) for c in t.column_names])
        return fn

    # gold pairs → rep space by two distributed joins against the
    # (row_id, rep_id) map; the driver only ever holds ≤ |gold| packed keys
    reps = fm.select_columns(["row_id", "rep_id"])
    gp = gold_pairs
    if "label" in gold_pairs.schema().names:
        gp = gp.filter(expr="label == 1")
    gp = gp.select_columns(["id_a", "id_b"])
    n_gold_rows = gp.count()
    if n_gold_rows > max_gold:
        raise ValueError(
            f"blocking_ablation: {n_gold_rows} gold pairs exceed max_gold")
    ja = hash_partition_join(
        gp.map_batches(_ren({"id_a": "row_id"}), batch_format="pyarrow"),
        reps, "row_id")
    ja = ja.map_batches(
        lambda t: t.select(["id_b", "rep_id"]).rename_columns(
            ["row_id", "rep_a"]), batch_format="pyarrow")
    # left_types: ja is a lazy join output — a schema peek would re-run
    # the whole first join for one row (same fix as scoring.py join 2)
    jb = hash_partition_join(
        ja, reps, "row_id",
        left_types={"row_id": pa.int64(), "rep_a": pa.int64()},
    ).map_batches(
        lambda t: t.select(["rep_a", "rep_id"]).rename_columns(
            ["rep_a", "rep_b"]), batch_format="pyarrow")

    def _pack(t: pa.Table) -> pa.Table:
        ra = t["rep_a"].to_numpy().astype(np.int64)
        rb = t["rep_b"].to_numpy().astype(np.int64)
        lo, hi = np.minimum(ra, rb), np.maximum(ra, rb)
        distinct = lo != hi
        keys = combine64(lo.astype(np.uint64),
                         hi.astype(np.uint64)).astype(np.int64)
        return pa.table({"k": pa.array(keys, pa.int64()),
                         "distinct": pa.array(distinct)})

    packed = jb.map_batches(_pack, batch_format="pyarrow").to_pandas()
    if len(packed) != n_gold_rows:
        # inner join dropped gold ids absent from `files` — name them
        # loudly instead of surfacing an opaque downstream cast error
        ids = gp.map_batches(
            _ren({"id_a": "row_id"}), batch_format="pyarrow"
        ).select_columns(["row_id"]).union(
            gp.map_batches(_ren({"id_b": "row_id"}),
                           batch_format="pyarrow").select_columns(["row_id"]))
        missing = semi_join(ids, reps, key="row_id", anti=True)
        sample = sorted({r["row_id"] for r in missing.take(20)})
        raise ValueError(
            f"blocking_ablation: gold pairs reference ids absent from the "
            f"files dataset ({n_gold_rows - len(packed)} gold pairs dropped "
            f"by the id join); e.g. missing row_ids {sample}")
    distinct = packed["distinct"].to_numpy()
    n_collapsed = int((~distinct).sum())
    gold_keys = np.unique(packed["k"].to_numpy()[distinct])
    n_gold = len(gold_keys)
    gref = ray.put(gold_keys)

    def _pair_keys(blocks: rd.Dataset) -> rd.Dataset:
        pairs = candidate_pairs(blocks, max_block=max_block, window=16)

        def _k(batch: pa.Table) -> pa.Table:
            a = batch["id_a"].to_numpy().astype(np.int64)
            b = batch["id_b"].to_numpy().astype(np.int64)
            lo, hi = np.minimum(a, b), np.maximum(a, b)
            # `k` (64-bit mixed key) is for the gold-coverage mark only —
            # collisions there bias recall by ~N²/2⁶⁴ (negligible and
            # pre-existing); the union DISTINCT count below uses the
            # exact (id_a, id_b) tuple, not this key
            k = combine64(lo.astype(np.uint64),
                          hi.astype(np.uint64)).astype(np.int64)
            return pa.table({"k": pa.array(k),
                             "id_a": pa.array(lo, pa.int64()),
                             "id_b": pa.array(hi, pa.int64())})

        return pairs.map_batches(_k, batch_format="pyarrow").materialize()

    def _scheme(kd: rd.Dataset) -> tuple[int, np.ndarray]:
        def _mark(batch: pa.Table) -> pa.Table:
            from ..util import cached_get

            gk = cached_get(gref)
            keys = batch["k"].to_numpy()
            if len(gk) == 0:
                hit = np.zeros(len(keys), bool)
            else:
                idx = np.searchsorted(gk, keys)
                idx[idx >= len(gk)] = 0
                hit = gk[idx] == keys
            return pa.table({
                "n": pa.array([batch.num_rows], pa.int64()),
                "covered": pa.array(
                    [np.unique(keys[hit]) if hit.any()
                     else np.empty(0, np.int64)],
                    pa.list_(pa.int64())),
            })

        parts = kd.map_batches(_mark, batch_format="pyarrow",
                               batch_size=65536).to_pandas()
        n_pairs = int(parts["n"].sum()) if len(parts) else 0
        cov = (np.unique(np.concatenate(
            [np.asarray(v, np.int64) for v in parts["covered"]]))
            if len(parts) else np.empty(0, np.int64))
        return n_pairs, cov

    keysets = {
        "minhash_bands": _pair_keys(explode_band_keys(feats, bands=bands)),
        "path_snm": _pair_keys(path_neighborhood_keys(feats,
                                                      width=snm_width)),
    }
    results = {name: _scheme(kd) for name, kd in keysets.items()}

    # distinct union pair count — distributed AND collision-free: the
    # (id_a, id_b) tuple is the identity (no 64-bit key mixing), and
    # count_distinct_rows buckets by the hashed tuple itself, so the
    # global dedup spreads across all buckets instead of collapsing
    # onto one task; no pair ever reaches the driver
    kds = list(keysets.values())
    union_kd = kds[0]
    for more in kds[1:]:
        union_kd = union_kd.union(more)
    from ..stages.agg import count_distinct_rows
    union_pairs = count_distinct_rows(
        union_kd.map_batches(lambda t: t.select(["id_a", "id_b"]),
                             batch_format="pyarrow"),
        ["id_a", "id_b"])

    union_cov = (np.unique(np.concatenate(
        [cov for _, cov in results.values()]))
        if results else np.empty(0, np.int64))
    rows = []
    for name, (n_pairs, cov) in results.items():
        others = np.unique(np.concatenate(
            [c for o, (_, c) in results.items() if o != name]
            or [np.empty(0, np.int64)]))
        uniq = np.setdiff1d(cov, others).size
        rows.append((name, n_pairs, len(cov),
                     round_half_away(len(cov) / n_gold, 6) if n_gold else 0.0, uniq))
    rows.append(("union", union_pairs, len(union_cov),
                 round_half_away(len(union_cov) / n_gold, 6) if n_gold else 0.0, 0))
    rows.append(("collapse", 0, n_collapsed, 0.0, n_collapsed))
    rows.sort()
    return rd.from_arrow(pa.table({
        "scheme": pa.array([r[0] for r in rows], pa.string()),
        "n_pairs": pa.array([r[1] for r in rows], pa.int64()),
        "gold_covered": pa.array([r[2] for r in rows], pa.int64()),
        "gold_recall": pa.array([r[3] for r in rows], pa.float64()),
        "unique_gold": pa.array([r[4] for r in rows], pa.int64()),
    }))


def clustering_diff(ds: rd.Dataset, a_col: str, b_col: str,
                    num_buckets: int = 0) -> rd.Dataset:
    """Split/merge audit + Adjusted Rand Index between two clusterings
    of the SAME rows (Hubert & Arabie 1985) — the change-control report
    an ER re-run needs: treating ``a_col`` as the old labels and
    ``b_col`` as the new, one row out:

        (n_rows, n_clusters_a, n_clusters_b,
         split_clusters,   # a-clusters scattered over >1 b-cluster
         merge_clusters,   # b-clusters absorbing >1 a-cluster
         ari)              # chance-adjusted pair agreement in [-1, 1]

    Everything reduces to the contingency cells n_ab = |a ∧ b| and their
    marginals, exactly like `cluster_quality`: ONE combiner aggregation
    over the rows builds the cells; marginals + degree counts are tiny
    aggregations OVER THE CELLS; the driver sees only scalar partials.
    ARI = (Σ C(n_ab,2) − A·B/C(N,2)) / ((A+B)/2 − A·B/C(N,2)) with
    A = Σ C(n_a,2), B = Σ C(n_b,2)."""
    num_buckets = resolve_num_buckets(num_buckets)
    cells = preagg_groupby(ds, [a_col, b_col],
                           [("count", a_col, "n_ab")],
                           num_buckets=num_buckets).materialize()
    # marginal size + cell-degree per side (degree = #cells the cluster
    # spans on the other side; >1 ⇒ split/merge)
    m_a = preagg_groupby(cells, [a_col],
                         [("sum", "n_ab", "n_a"),
                          ("count", "n_ab", "deg_a")],
                         num_buckets=num_buckets)
    m_b = preagg_groupby(cells, [b_col],
                         [("sum", "n_ab", "n_b"),
                          ("count", "n_ab", "deg_b")],
                         num_buckets=num_buckets)

    def _c2(x: np.ndarray) -> float:
        return float((x * (x - 1) / 2).sum())

    cols = ["n_rows", "pairs_ab", "pairs_a", "pairs_b",
            "n_a", "n_b", "splits", "merges"]

    def _part(vals: dict) -> pd.DataFrame:
        return pd.DataFrame({c: [vals.get(c, 0.0)] for c in cols})

    def _cell_part(b: pd.DataFrame) -> pd.DataFrame:
        n = b["n_ab"].to_numpy(np.float64)
        return _part({"n_rows": float(n.sum()), "pairs_ab": _c2(n)})

    def _a_part(b: pd.DataFrame) -> pd.DataFrame:
        n = b["n_a"].to_numpy(np.float64)
        return _part({"pairs_a": _c2(n), "n_a": float(len(b)),
                      "splits": float((b["deg_a"].to_numpy() > 1).sum())})

    def _b_part(b: pd.DataFrame) -> pd.DataFrame:
        n = b["n_b"].to_numpy(np.float64)
        return _part({"pairs_b": _c2(n), "n_b": float(len(b)),
                      "merges": float((b["deg_b"].to_numpy() > 1).sum())})

    parts = (cells.map_batches(_cell_part, batch_format="pandas")
             .union(m_a.map_batches(_a_part, batch_format="pandas"))
             .union(m_b.map_batches(_b_part, batch_format="pandas")))

    def _finish(b: pd.DataFrame) -> pd.DataFrame:
        s = {c: float(b[c].sum()) for c in cols}
        n = s["n_rows"]
        tot = n * (n - 1) / 2
        exp = s["pairs_a"] * s["pairs_b"] / tot if tot else 0.0
        mx = (s["pairs_a"] + s["pairs_b"]) / 2
        ari = ((s["pairs_ab"] - exp) / (mx - exp)
               if mx != exp else 1.0)
        return pd.DataFrame({
            "n_rows": [int(n)],
            "n_clusters_a": [int(s["n_a"])],
            "n_clusters_b": [int(s["n_b"])],
            "split_clusters": [int(s["splits"])],
            "merge_clusters": [int(s["merges"])],
            "ari": [ari]})

    return parts.repartition(1).map_batches(_finish, batch_format="pandas")
