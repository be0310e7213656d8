"""Iterative graph algorithms over edge-list Datasets.

``pagerank`` runs a fixed number of power iterations of
PR(v) = (1−d)/N + d·Σ_{u→v} PR(u)/outdeg(u) over a directed edge list.
(Connected components — the other graph op — lives in stages/cluster.py
with the two-level contraction used by the ER flagship.)

Distributed shape per iteration: the rank table (one row per node —
orders of magnitude smaller than the edge list) attaches to the edges
via the size-guarded broadcast/hash join, contributions pre-aggregate
inside map_batches, and one bucketed combine per iteration produces the
next rank table, which is materialized (it is consumed by the next
iteration's join AND must not re-execute lazily). The edge list itself
is scanned once per iteration and never shuffled when the rank table
broadcasts. Dangling nodes (outdeg 0) keep the (1−d)/N floor; their
lost mass is NOT redistributed (the common simplification — the SQL
oracle mirrors it exactly)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd


def pagerank(edges: rd.Dataset, src: str = "src", dst: str = "dst",
             damping: float = 0.85, iters: int = 3,
             num_buckets: int = 64,
             broadcast_threshold: int = 2_000_000) -> rd.Dataset:
    """(node, rank) after ``iters`` power iterations from the uniform
    start 1/N. Nodes = every distinct src or dst endpoint."""
    from .agg import preagg_groupby
    from .analytic import _attach_small
    from .joins import distinct_values

    if iters < 1:
        raise ValueError("iters must be >= 1")

    # materialize once: the edge list is consumed by every iteration (plus
    # the node/degree derivations) and Ray Datasets are lazy — without
    # this the edges' entire upstream lineage (often an expensive pair
    # generation) re-executes per iteration. The object store spills past
    # memory, so pinning the edge list is bounded-risk and strictly
    # cheaper than iters× recomputation.
    edges = edges.materialize()

    ends = edges.select_columns([src]).map_batches(
        lambda b: b.rename_columns(["node"]), batch_format="pyarrow").union(
        edges.select_columns([dst]).map_batches(
            lambda b: b.rename_columns(["node"]), batch_format="pyarrow"))
    nodes = preagg_groupby(
        ends.map_batches(lambda b: b.assign(__one=np.int8(1)),
                         batch_format="pandas"),
        ["node"], [("count", "", "__n")], num_buckets).drop_columns(
        ["__n"]).materialize()
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.map_batches(
            lambda b: b.assign(rank=np.float64(0)), batch_format="pandas")

    deg = preagg_groupby(
        edges.select_columns([src]).map_batches(
            lambda b: b.rename_columns(["node"]), batch_format="pyarrow"),
        ["node"], [("count", "", "deg")], num_buckets).materialize()

    base = (1.0 - damping) / n_nodes
    # rank ⋈ deg once: per-node share denominator (small table)
    rank = nodes.map_batches(
        lambda b, _r=1.0 / n_nodes: b.assign(rank=np.float64(_r)),
        batch_format="pandas").materialize()

    for _ in range(iters):
        shares = _attach_small(rank, deg, "node",
                               broadcast_threshold)

        def _share(batch: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                src: batch["node"],  # join key name on the edge side
                "share": batch["rank"] / batch["deg"],
            })

        shares = shares.map_batches(_share, batch_format="pandas")
        contrib_src = _attach_small(
            edges.select_columns([src, dst]), shares, src,
            broadcast_threshold)

        def _contrib(batch: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({"node": batch[dst],
                                 "c": batch["share"]})

        contrib = preagg_groupby(
            contrib_src.map_batches(_contrib, batch_format="pandas"),
            ["node"], [("sum", "c", "c")], num_buckets)

        withc = _attach_small(nodes, contrib, "node",
                              broadcast_threshold,
                              join_type="left outer")

        def _next(batch: pd.DataFrame) -> pd.DataFrame:
            c = batch["c"].fillna(0.0) if "c" in batch else 0.0
            return pd.DataFrame({
                "node": batch["node"],
                "rank": base + damping * c,
            })

        rank = withc.map_batches(_next, batch_format="pandas").materialize()

    return rank
