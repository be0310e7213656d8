"""Transitive clustering: distributed connected components by iterative
min-label propagation (hash-partitioned union-find).

The reference's identity merge is single-process SQL — "first id of the
sorted group is canonical" (belb/kbs/query.py:97-194 — SURVEY §2.6 A2) —
and its history chains resolve one hop at a time
(belb/kbs/kb.py:455-486 — SURVEY §2.5 J2). At cluster scale this becomes
the classic connected-components-in-MapReduce loop (PAPERS.md: "Finding
connected components in map-reduce in logarithmic rounds", ICDE 2013):

  round: labels ⋈ edges on src (partitioned hash join, vectorized)
         → messages (dst, src_label)
         → union with current labels
         → NATIVE groupby(node).Min(label)  → new labels
         → changed count via labels-join (convergence test)

Labels only decrease; the loop stops when no node changed or at
``max_rounds``. The label table (candidate nodes only — rows that appear
in an edge, not the corpus) is materialized per round: that is the
checkpointable state. Canonical cluster id = min(row_id) of the
component — the reference's ORDER BY + take-first determinism (SURVEY §4).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Min

from .joins import hash_partition_join


def connected_components(
    edges: rd.Dataset,
    max_rounds: int = 25,
    num_buckets: int = 16,
    checkpoint_dir: str | None = None,
) -> rd.Dataset:
    """edges(id_a, id_b) → labels(node, label); label = min node id of the
    connected component."""

    def _bidir(batch: pa.Table) -> pa.Table:
        a = batch["id_a"].to_numpy()
        b = batch["id_b"].to_numpy()
        return pa.table({
            "src": pa.array(np.concatenate([a, b]), pa.int64()),
            "dst": pa.array(np.concatenate([b, a]), pa.int64()),
        })

    bidir = edges.map_batches(_bidir, batch_format="pyarrow").materialize()

    # initial labels: distinct nodes, label = node (native Min as distinct)
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
    num_buckets: int = 32,
) -> rd.Dataset:
    """members(row_id, rep_id) + labels(node→label over reps) →
    (row_id, cluster_id). Reps without edges keep rep_id as cluster id.
    Left hash-partitioned join on rep_id (labels cover candidates only)."""
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
