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
