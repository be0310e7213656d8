"""Correlation clustering by distributed KwikCluster (pivot peeling).

KwikCluster (Ailon, Charikar & Newman 2008) is the classical 3-approx for
correlation clustering over a positive-edge similarity graph: walk the
nodes in random order; an unclustered node becomes a PIVOT and absorbs all
its unclustered neighbors. Unlike connected components it does NOT chain
through weak transitive paths — a documented alternative clustering for ER
match graphs (the reference's identity merge A2 is transitive; SURVEY
§2.6). The distributed form is the parallel pivot peeling of Chierichetti,
Dalvi & Kumar (KDD 2014, "Correlation clustering in MapReduce").

Determinism: the "random" order is the seeded hash ``mix64(node_id)`` — a
pure function of the id, so no permutation needs to be stored or shipped,
and hashed keys make the expected round count O(log n) even on
adversarial chains. Each round's pivots are the nodes whose key is a
local minimum among their still-active neighbors (so the pivot set over
all rounds is the lexicographically-first maximal independent set), and
every active node with a pivot neighbor joins its smallest-keyed pivot of
THAT round. This is KwikCluster under the round-major pivot order
(round 1's pivots in key order, then round 2's, ...) — note it is NOT in
general identical to the single-sequence key-order walk: a node can be
absorbed by a round-r pivot even though a smaller-keyed later-round pivot
is also adjacent. The independent golden re-derives the same round-major
walk with plain dict/set loops.

Per-round dataflow (everything streams; state is one edge Dataset):

1. self-loops are added once up front, so every active node always has an
   edge row and pivot/self-assignment need no separate node table: a node
   whose neighbors all have larger keys sees ``min(kv) == its own key``
   (the self-loop) ⇒ pivot; the self-loop is also the pivot's own
   assignment candidate.
2. ``preagg_groupby(min kv per u)`` (one bucketed combine) → pivot set.
3. pivot flag attaches to edges size-guarded (broadcast under the row
   budget, hash-partitioned join past it); candidates = edges whose head
   is a pivot; ``grouped_topk(k=1)`` by ascending key picks each node's
   smallest-keyed pivot → this round's assignments (pivots self-assign
   via their self-loop).
4. assigned nodes leave the graph: two size-guarded anti semi-joins drop
   every edge touching them.

``max_rounds`` is a loud budget (the ``distinct_values`` guard pattern):
with hashed keys the bound is generous, and a stall raises instead of
looping silently.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from ..functions.hashing import as_int64

from belb_ray.util import resolve_num_buckets

_MIX_A = np.uint64(0x9E3779B97F4A7C15)
_MIX_B = np.uint64(0xC2B2AE3D27D4EB4F)


def order_key(ids: np.ndarray, seed: int = 0) -> np.ndarray:
    """Seeded pseudo-random total order over node ids (pure function —
    the 'random permutation' of KwikCluster without storing one)."""
    v = (ids.astype(np.uint64) + np.uint64(seed)) * _MIX_A
    return as_int64((v ^ (v >> np.uint64(31))) * _MIX_B)


def kwik_cluster(pairs: rd.Dataset, id_a: str = "id_a", id_b: str = "id_b",
                 seed: int = 0, max_rounds: int = 40,
                 num_buckets: int = 0,
                 broadcast_threshold: int = 4_000_000) -> rd.Dataset:
    """Positive-edge pairs → (row_id, cluster_id): KwikCluster labels for
    every node that appears in ``pairs``; cluster_id is the pivot's node
    id. Deterministic: equal to the round-major pivot walk (module
    docstring) for the seeded ``order_key`` hash."""
    num_buckets = resolve_num_buckets(num_buckets)
    from .agg import grouped_topk, preagg_groupby
    from .joins import semi_join

    def _sym(batch: pa.Table) -> pa.Table:
        a = batch[id_a].to_numpy().astype(np.int64)
        b = batch[id_b].to_numpy().astype(np.int64)
        u = np.concatenate([a, b, a, b])
        v = np.concatenate([b, a, a, b])  # both orientations + self-loops
        return pa.table({"u": pa.array(u), "v": pa.array(v)})

    edges = pairs.map_batches(_sym, batch_format="pyarrow")

    def _with_kv(batch: pa.Table) -> pa.Table:
        kv = order_key(batch["v"].to_numpy(), seed)
        return batch.append_column("kv", pa.array(kv, pa.int64()))

    labels: list[rd.Dataset] = []
    for _round in range(max_rounds):
        edges = edges.materialize()
        if edges.count() == 0:
            break
        ek = edges.map_batches(_with_kv, batch_format="pyarrow")
        mn = preagg_groupby(ek, ["u"], [("min", "kv", "mnk")],
                            num_buckets=num_buckets)

        def _pivots(batch: pa.Table) -> pa.Table:
            u = batch["u"].to_numpy()
            is_p = order_key(u, seed) == batch["mnk"].to_numpy()
            return pa.table({"v": pa.array(u[is_p], pa.int64())})

        pivots = mn.map_batches(_pivots, batch_format="pyarrow")

        # candidates: edges whose head v is a pivot (self-loops make each
        # pivot its own candidate); smallest-keyed pivot wins per node
        cand = semi_join(ek, pivots, key="v",
                         broadcast_threshold=broadcast_threshold)
        assigned = grouped_topk(cand, ["u"], "kv", k=1, descending=False,
                                tiebreak="v", num_buckets=num_buckets)

        def _emit(batch: pa.Table) -> pa.Table:
            return pa.table({"row_id": batch["u"],
                             "cluster_id": batch["v"]})

        lab = assigned.map_batches(_emit, batch_format="pyarrow").materialize()
        labels.append(lab)

        done = lab.select_columns(["row_id"]).map_batches(
            lambda t: t.rename_columns(["u"]), batch_format="pyarrow")
        edges = semi_join(edges, done, key="u", anti=True,
                          broadcast_threshold=broadcast_threshold)
        done_v = done.map_batches(lambda t: t.rename_columns(["v"]),
                                  batch_format="pyarrow")
        edges = semi_join(edges, done_v, key="v", anti=True,
                          broadcast_threshold=broadcast_threshold)
    else:
        # Loop exhausted without hitting the empty-edges break — but the
        # final permitted round may have assigned every remaining node, so
        # re-check before declaring non-convergence.
        edges = edges.materialize()
        if edges.count() != 0:
            raise ValueError(
                f"kwik_cluster did not converge in max_rounds={max_rounds} "
                f"rounds; the active subgraph is pathological for hashed-key "
                f"peeling — raise max_rounds")

    if not labels:
        return rd.from_arrow(pa.table({
            "row_id": pa.array([], pa.int64()),
            "cluster_id": pa.array([], pa.int64())}))
    out = labels[0]
    for more in labels[1:]:
        out = out.union(more)
    return out
