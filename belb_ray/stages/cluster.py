"""Transitive clustering: two-level distributed connected components.

The reference's identity merge is single-process SQL — "first id of the
sorted group is canonical" (belb/kbs/query.py:97-194 — SURVEY §2.6 A2) —
and its history chains resolve one hop at a time
(belb/kbs/kb.py:455-486 — SURVEY §2.5 J2). At cluster scale this is
connected components, executed in two levels (PAPERS.md: "Finding
connected components in map-reduce in logarithmic rounds", ICDE 2013,
whose key observation is exactly this contraction):

1. **Block-local contraction** (the combiner): each edge block runs an
   in-memory union-find and emits only its spanning forest
   ``(root, node)`` edges — ≤ #distinct nodes per block, collapsing the
   massive intra-block redundancy (every LSH band rediscovers the same
   component). Pure ``map_batches``, no shuffle.
2. The contracted forest is tiny relative to the corpus (≤ one edge per
   candidate node). If it fits the driver budget (``local_threshold``
   edges) — which it does even for billions of input rows with millions
   of candidate nodes — a vectorized union-find solves it exactly in one
   pass. Otherwise the classic min-label-propagation loop runs over the
   contracted edges (log-diameter rounds of join + groupby-min).

Canonical cluster id = min(row_id) of the component — the reference's
ORDER BY + take-first determinism (SURVEY §4), independent of
partitioning because union-find roots are kept at the minimum id.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Min

from .joins import hash_partition_join
from ..util import resolve_num_buckets


def _uf_solve(a: np.ndarray, b: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Connected components over int64 id edge arrays → (nodes, labels);
    label = min id of the component.

    Fully vectorized min-label hook + pointer-jumping (no per-edge Python
    loop): each round every node's parent drops to the min parent seen
    across its incident edges, then parents compress by repeated
    ``parent = parent[parent]``. Converges in O(log n) rounds; the
    fixpoint (min id per component) is order-independent → deterministic
    under any edge/partition order."""
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    ia, ib = inv[: len(a)], inv[len(a):]
    parent = np.arange(len(nodes), dtype=np.int64)

    def _scatter_min(idx: np.ndarray, vals: np.ndarray) -> None:
        # parent[idx] = min(parent[idx], vals) grouped by idx — sort +
        # reduceat beats np.minimum.at (~10x on multi-million edges)
        order = np.argsort(idx, kind="stable")
        idx_s, vals_s = idx[order], vals[order]
        starts = np.flatnonzero(np.r_[True, idx_s[1:] != idx_s[:-1]])
        gmin = np.minimum.reduceat(vals_s, starts)
        tgt = idx_s[starts]
        parent[tgt] = np.minimum(parent[tgt], gmin)

    while len(ia):
        pa_, pb_ = parent[ia], parent[ib]
        # mask recomputed over ALL edges each round: an edge consistent
        # now can become inconsistent after later hooks, so edges are
        # never dropped permanently (the gather+compare is cheap; the
        # expensive scatters run on the active subset only)
        active = pa_ != pb_
        if not active.any():
            break
        aia, aib = ia[active], ib[active]
        pa_, pb_ = pa_[active], pb_[active]
        lo = np.minimum(pa_, pb_)
        # hook: every edge pulls the larger root toward the smaller
        _scatter_min(np.maximum(pa_, pb_), lo)
        _scatter_min(aia, lo)
        _scatter_min(aib, lo)
        # full path compression to fixpoint
        while True:
            nxt = parent[parent]
            if np.array_equal(nxt, parent):
                break
            parent = nxt
    return nodes, nodes[parent]


def _contract_block(batch: pa.Table) -> pa.Table:
    """Edge block → spanning-forest edges (label, node), label < node."""
    a = batch["id_a"].to_numpy()
    b = batch["id_b"].to_numpy()
    if len(a) == 0:
        return pa.table({"id_a": pa.array([], pa.int64()),
                         "id_b": pa.array([], pa.int64())})
    nodes, labels = _uf_solve(a, b)
    keep = nodes != labels
    return pa.table({"id_a": pa.array(labels[keep], pa.int64()),
                     "id_b": pa.array(nodes[keep], pa.int64())})


def connected_components(
    edges: rd.Dataset,
    max_rounds: int = 25,
    num_buckets: int = 0,
    checkpoint_dir: str | None = None,
    local_threshold: int = 5_000_000,
) -> rd.Dataset:
    """edges(id_a, id_b) → labels(node, label); label = min node id of the
    connected component. Exact (not approximate) at every scale."""
    # NO explicit batch_size here: a large one propagates into the fused
    # attach→score→contract task chain as the bundling target and
    # serializes the whole scoring stage into a handful of giant tasks
    # (measured: batch_size=1<<20 → ONE task for all pairs, 31 CPUs idle).
    # Per-block contraction loses nothing — the forest is re-solved
    # globally right below.
    num_buckets = resolve_num_buckets(num_buckets)
    contracted = edges.map_batches(_contract_block,
                                   batch_format="pyarrow").materialize()
    n_edges = contracted.count()

    if n_edges <= local_threshold:
        # forest fits the driver: one vectorized union-find pass
        if n_edges == 0:
            return rd.from_arrow(pa.table({"node": pa.array([], pa.int64()),
                                           "label": pa.array([], pa.int64())}))
        from .joins import collect_arrow
        tbl = collect_arrow(contracted)
        nodes, labels = _uf_solve(tbl["id_a"].to_numpy(), tbl["id_b"].to_numpy())
        out = pa.table({"node": pa.array(nodes, pa.int64()),
                        "label": pa.array(labels, pa.int64())})
        if checkpoint_dir is not None:
            rd.from_arrow(out).write_parquet(f"{checkpoint_dir}/cc_final")
        return rd.from_arrow(out)

    return _label_propagation(contracted, max_rounds, num_buckets,
                              checkpoint_dir)


def _label_propagation(
    bidir_src: rd.Dataset,
    max_rounds: int,
    num_buckets: int,
    checkpoint_dir: str | None,
) -> rd.Dataset:
    """Distributed min-label propagation over (already contracted) edges —
    the path taken when the forest exceeds the driver budget."""

    def _bidir(batch: pa.Table) -> pa.Table:
        a = batch["id_a"].to_numpy()
        b = batch["id_b"].to_numpy()
        return pa.table({
            "src": pa.array(np.concatenate([a, b]), pa.int64()),
            "dst": pa.array(np.concatenate([b, a]), pa.int64()),
        })

    bidir = bidir_src.map_batches(_bidir, batch_format="pyarrow").materialize()

    labels = (bidir
              .map_batches(lambda t: pa.table({"node": t["src"], "label": t["src"]}),
                           batch_format="pyarrow")
              .groupby("node").aggregate(Min("label", alias_name="label"))
              .materialize())

    for rnd in range(max_rounds):
        lab_by_src = labels.map_batches(
            lambda t: pa.table({"src": t["node"], "label": t["label"]}),
            batch_format="pyarrow")
        msgs = hash_partition_join(bidir, lab_by_src, key="src",
                                   num_buckets=num_buckets)
        msgs = msgs.map_batches(
            lambda t: pa.table({"node": t["dst"], "label": t["label"]}),
            batch_format="pyarrow")
        new_labels = (msgs.union(labels)
                      .groupby("node").aggregate(Min("label", alias_name="label"))
                      .materialize())
        if checkpoint_dir is not None:
            new_labels.write_parquet(f"{checkpoint_dir}/cc_round_{rnd}")

        # convergence: any node whose label strictly decreased?
        old = labels.map_batches(
            lambda t: pa.table({"node": t["node"], "old_label": t["label"]}),
            batch_format="pyarrow")
        diff = hash_partition_join(new_labels, old, key="node",
                                   num_buckets=num_buckets)
        changed = diff.map_batches(
            lambda t: pa.table({"c": pc.cast(
                pc.less(t["label"], t["old_label"]), pa.int64())}),
            batch_format="pyarrow").sum("c")
        labels = new_labels
        if not changed:
            break
    return labels


def assign_clusters(
    members: rd.Dataset,
    labels: rd.Dataset,
    num_buckets: int = 0,
    broadcast_threshold: int = 10_000_000,
) -> rd.Dataset:
    """members(row_id, rep_id) + labels(node→label over reps) →
    (row_id, cluster_id). Reps without edges keep rep_id as cluster id.

    Labels cover candidate nodes only (≪ corpus), so the common path is a
    broadcast left-lookup inside ``map_batches``; a hash-partitioned left
    join takes over past the broadcast threshold."""
    num_buckets = resolve_num_buckets(num_buckets)
    n_labels = labels.count()

    if n_labels <= broadcast_threshold:
        from .joins import collect_arrow
        tbl = collect_arrow(labels)
        nodes = tbl["node"].to_numpy()
        order = np.argsort(nodes, kind="stable")
        nodes_sorted = nodes[order]
        labs_sorted = tbl["label"].to_numpy()[order]
        ref = ray.put((nodes_sorted, labs_sorted))

        from .joins import collect_arrow as _ca  # noqa: F401 (import kept close)
        from ..util import cached_get

        def _assign(batch: pa.Table) -> pa.Table:
            nodes, labs = cached_get(ref)
            reps = batch["rep_id"].to_numpy()
            if len(nodes):
                idx = np.searchsorted(nodes, reps)
                idx_c = np.minimum(idx, len(nodes) - 1)
                hit = nodes[idx_c] == reps
                cid = np.where(hit, labs[idx_c], reps)
            else:
                cid = reps
            return pa.table({"row_id": batch["row_id"],
                             "cluster_id": pa.array(cid, pa.int64())})

        return members.map_batches(_assign, batch_format="pyarrow")

    lab = labels.map_batches(
        lambda t: pa.table({"rep_id": t["node"], "cluster_id": t["label"]}),
        batch_format="pyarrow")
    joined = hash_partition_join(members, lab, key="rep_id",
                                 num_buckets=num_buckets, join_type="left outer")

    def _fill(batch: pa.Table) -> pa.Table:
        cid = pc.coalesce(batch["cluster_id"], batch["rep_id"])
        return pa.table({"row_id": batch["row_id"],
                         "cluster_id": pc.cast(cid, pa.int64())})

    return joined.map_batches(_fill, batch_format="pyarrow")
