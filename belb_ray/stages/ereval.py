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
import ray.data as rd

from belb_ray.stages.agg import preagg_groupby


def cluster_quality(ds: rd.Dataset, pred_col: str, gold_col: str,
                    num_buckets: int = 64) -> rd.Dataset:
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
                      num_buckets: int = 64) -> rd.Dataset:
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
                      num_buckets: int = 32) -> rd.Dataset:
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
