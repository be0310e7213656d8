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

from belb_ray.util import resolve_num_buckets


def pagerank(edges: rd.Dataset, src: str = "src", dst: str = "dst",
             damping: float = 0.85, iters: int = 3,
             num_buckets: int = 0,
             broadcast_threshold: int = 2_000_000,
             weight_col: str | None = None) -> rd.Dataset:
    """(node, rank) after ``iters`` power iterations from the uniform
    start 1/N. Nodes = every distinct src or dst endpoint.
    With ``weight_col``, contributions split proportionally to edge
    weight (share = rank·w / Σ_out w) instead of uniformly."""
    num_buckets = resolve_num_buckets(num_buckets)
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

    if weight_col is None:
        deg = preagg_groupby(
            edges.select_columns([src]).map_batches(
                lambda b: b.rename_columns(["node"]),
                batch_format="pyarrow"),
            ["node"], [("count", "", "deg")], num_buckets).materialize()
    else:
        deg = preagg_groupby(
            edges.select_columns([src, weight_col]).map_batches(
                lambda b: b.rename_columns(["node", "__w"]),
                batch_format="pyarrow"),
            ["node"], [("sum", "__w", "deg")], num_buckets).materialize()

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
        edge_cols = [src, dst] + ([weight_col] if weight_col else [])
        contrib_src = _attach_small(
            edges.select_columns(edge_cols), shares, src,
            broadcast_threshold)

        def _contrib(batch: pd.DataFrame) -> pd.DataFrame:
            c = batch["share"].to_numpy()
            if weight_col is not None:
                c = c * batch[weight_col].to_numpy(dtype=np.float64)
            return pd.DataFrame({"node": batch[dst], "c": c})

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


def triangle_counts(edges: rd.Dataset, src: str = "src", dst: str = "dst",
                    num_buckets: int = 0) -> rd.Dataset:
    """Per-vertex triangle counts over an undirected edge list →
    (vertex, n_triangles); vertices in no triangle are omitted. The
    global triangle count is Σ n_triangles / 3.

    Distributed shape: edges canonicalize (min, max) and dedupe with one
    pair-bucket shuffle; each edge orients from its lower-(degree, id)
    endpoint to the higher (the standard fan-out bound: oriented
    out-degree is O(√m), so per-pivot wedge generation never explodes on
    hub vertices); wedges (u; v, w) generate per pivot bucket with the
    same vectorized repeat/offset arithmetic as cooccurrence_pairs, then
    close against the canonical edge set via the size-guarded semi-join.
    Each triangle closes exactly one wedge, so counts are exact."""
    num_buckets = resolve_num_buckets(num_buckets)
    from .agg import _bucket_of_frame, preagg_groupby
    from .analytic import _attach_small
    from .joins import semi_join

    def _canon(batch: pd.DataFrame) -> pd.DataFrame:
        a = batch[src].to_numpy()
        b = batch[dst].to_numpy()
        keep = a != b  # self-loops can't be in a triangle
        a, b = a[keep], b[keep]
        out = pd.DataFrame({"a": np.minimum(a, b), "b": np.maximum(a, b)})
        out = out.drop_duplicates()
        out["__bucket"] = _bucket_of_frame(out, ["a", "b"], num_buckets)
        return out

    def _distinct(group: pd.DataFrame) -> pd.DataFrame:
        return group.drop(columns="__bucket").drop_duplicates()

    canon = (edges.map_batches(_canon, batch_format="pandas")
             .groupby("__bucket").map_groups(_distinct,
                                             batch_format="pandas")
             .materialize())  # consumed 3x: degrees, orientation, closure

    def _endpoints(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"vertex": np.concatenate(
            [batch["a"].to_numpy(), batch["b"].to_numpy()])})

    deg = preagg_groupby(
        canon.map_batches(_endpoints, batch_format="pandas"),
        ["vertex"], [("count", "", "deg")], num_buckets)

    withdeg = _attach_small(
        _attach_small(canon.map_batches(
            lambda t: t.rename(columns={"a": "vertex"}),
            batch_format="pandas"), deg, "vertex")
        .map_batches(lambda t: t.rename(
            columns={"vertex": "a", "deg": "deg_a", "b": "vertex"}),
            batch_format="pandas"),
        deg, "vertex")

    def _orient(batch: pd.DataFrame) -> pd.DataFrame:
        a = batch["a"].to_numpy()
        b = batch["vertex"].to_numpy()
        da = batch["deg_a"].to_numpy()
        db = batch["deg"].to_numpy()
        # pivot u = lower (deg, id); tie on degree broken by vertex id
        a_first = (da < db) | ((da == db) & (a < b))
        out = pd.DataFrame({"u": np.where(a_first, a, b),
                            "v": np.where(a_first, b, a)})
        out["__bucket"] = _bucket_of_frame(out, ["u"], num_buckets)
        return out

    oriented = withdeg.map_batches(_orient, batch_format="pandas")

    def _wedges(group: pd.DataFrame) -> pd.DataFrame:
        g = (group.drop(columns="__bucket").drop_duplicates()
             .sort_values(["u", "v"], kind="mergesort"))
        uv = g["u"].to_numpy()
        vv = g["v"].to_numpy()
        n = len(g)
        if n == 0:
            return pd.DataFrame({"u": uv[:0], "x": vv[:0], "y": vv[:0]})
        new = np.ones(n, dtype=bool)
        new[1:] = uv[1:] != uv[:-1]
        starts = np.flatnonzero(new)
        counts = np.diff(np.concatenate((starts, [n])))
        idx = np.arange(n)
        local = idx - np.repeat(starts, counts)
        reps = np.repeat(counts, counts) - local - 1
        first = np.repeat(idx, reps)
        offs = np.arange(int(reps.sum())) - np.repeat(
            np.cumsum(reps) - reps, reps)
        second = first + 1 + offs
        return pd.DataFrame({"u": uv[first], "x": vv[first],
                             "y": vv[second]})

    wedges = oriented.groupby("__bucket").map_groups(
        _wedges, batch_format="pandas")

    # wedge↔edge membership key: packed int64 (lo << 32 | hi) when every
    # id fits 32 bits — integer semi-join keys are far cheaper than the
    # string concat fallback. Decided ONCE from the (materialized,
    # canonical a ≤ b) edge list so every batch encodes identically.
    import pyarrow as pa
    from ray.data.aggregate import Max, Min

    def _is_int_type(t) -> bool:
        if isinstance(t, pa.DataType):
            return pa.types.is_integer(t)
        try:
            return np.issubdtype(np.dtype(t), np.integer)
        except TypeError:
            return False

    packed = False
    if _is_int_type(canon.schema().types[0]) and canon.count() > 0:
        bounds = canon.aggregate(Min("a"), Max("b"))
        packed = bounds["min(a)"] >= 0 and bounds["max(b)"] < (1 << 31)

    def _wedge_key(batch: pd.DataFrame) -> pd.DataFrame:
        x = batch["x"].to_numpy()
        y = batch["y"].to_numpy()
        lo = np.minimum(x, y)
        hi = np.maximum(x, y)
        if packed:
            batch["__e"] = (lo.astype(np.int64) << 32) | hi.astype(np.int64)
        else:
            batch["__e"] = pd.Series(lo.astype(str), index=batch.index) \
                .str.cat(hi.astype(str), ":")
        return batch

    def _edge_key(batch: pd.DataFrame) -> pd.DataFrame:
        a = batch["a"].to_numpy()
        b = batch["b"].to_numpy()
        if packed:
            e = (a.astype(np.int64) << 32) | b.astype(np.int64)
        else:
            e = pd.Series(a.astype(str)).str.cat(b.astype(str), ":") \
                .to_numpy()
        return pd.DataFrame({"__e": e})

    closed = semi_join(
        wedges.map_batches(_wedge_key, batch_format="pandas"),
        canon.map_batches(_edge_key, batch_format="pandas"), "__e")

    def _vertices(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"vertex": np.concatenate(
            [batch["u"].to_numpy(), batch["x"].to_numpy(),
             batch["y"].to_numpy()])})

    return preagg_groupby(
        closed.map_batches(_vertices, batch_format="pandas"),
        ["vertex"], [("count", "", "n_triangles")], num_buckets)


def cochain_edges(ds: rd.Dataset, group_cols: list[str], item_col: str,
                  num_buckets: int = 0) -> rd.Dataset:
    """Sparse co-occurrence graph: per group, chain ADJACENT items of the
    sorted distinct item list → (a, b) edges with a < b. ne ≤ #(group,
    item) rows — the sparsifier that keeps hub groups from exploding into
    O(k²) pairs the way a full pair expansion would."""
    num_buckets = resolve_num_buckets(num_buckets)
    from .agg import _bucket_of_frame

    def _bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch[group_cols + [item_col]].drop_duplicates()
        batch["__bucket"] = _bucket_of_frame(batch, group_cols, num_buckets)
        return batch

    def _chain(group: pd.DataFrame) -> pd.DataFrame:
        g = (group.drop(columns="__bucket").drop_duplicates()
             .sort_values(group_cols + [item_col], kind="mergesort"))
        it = g[item_col].to_numpy()
        if len(g) < 2:
            return pd.DataFrame({"a": it[:0], "b": it[:0]})
        same = np.ones(len(g) - 1, dtype=bool)
        for c in group_cols:
            v = g[c].to_numpy()
            same &= v[1:] == v[:-1]
        return pd.DataFrame({"a": it[:-1][same], "b": it[1:][same]})

    return (ds.map_batches(_bucketize, batch_format="pandas")
            .groupby("__bucket").map_groups(_chain, batch_format="pandas"))


def _distinct_nodes(ds: rd.Dataset, col: str,
                    num_buckets: int = 0) -> rd.Dataset:
    """Distributed distinct of one node column: batch-local dedup first
    (the frontier's dst lists are massively duplicated), then one
    co-location shuffle on hash(node) with a per-bucket dedup. Never
    collects values to the driver."""

    num_buckets = resolve_num_buckets(num_buckets)
    def _local(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch[[col]].drop_duplicates()
        from .agg import _bucket_of_frame

        batch["__bucket"] = _bucket_of_frame(batch, [col], num_buckets)
        return batch

    def _dedup(group: pd.DataFrame) -> pd.DataFrame:
        return group.drop(columns="__bucket").drop_duplicates()

    return (ds.map_batches(_local, batch_format="pandas")
            .groupby("__bucket").map_groups(_dedup, batch_format="pandas"))


def bfs_hops(edges: rd.Dataset, seeds: rd.Dataset, src: str = "src",
             dst: str = "dst", node_col: str = "node", max_hops: int = 3,
             broadcast_threshold: int = 5_000_000,
             num_buckets: int = 0) -> rd.Dataset:
    """Multi-source BFS: minimum hop distance (≤ ``max_hops``) from any
    seed node → (node, hops) rows, hops ∈ [0, max_hops].

    Distributed shape per level: the current frontier (a node table,
    orders of magnitude smaller than the edge list) gates the edges via
    the size-guarded semi-join (broadcast membership set under
    ``broadcast_threshold`` distinct nodes, shuffle semi-join above),
    reached dst nodes dedup with batch-local uniques plus ONE bucketed
    shuffle, and already-visited nodes drop via the same size-guarded
    anti-join. The edge list is scanned once per level and never
    shuffled in the broadcast regime; frontier/visited tables are
    node-sized and materialize per level (each is consumed twice:
    as the next join's key side and in the visited union).

    Equivalent SQL: a bounded-depth recursive CTE with UNION-distinct
    and a final MIN(d) GROUP BY — the oracle mirrors it exactly.
    """
    num_buckets = resolve_num_buckets(num_buckets)
    from .joins import semi_join

    # one pass computes the edge blocks; every BFS level re-reads them —
    # without this the edges' entire upstream lineage (often an expensive
    # pair-generation) re-executes max_hops times
    edges = edges.select_columns([src, dst]).materialize()

    def _with_hops(ds_nodes: rd.Dataset, h: int) -> rd.Dataset:
        def fn(batch: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                node_col: batch[node_col].to_numpy(),
                "hops": np.full(len(batch), h, dtype=np.int64)})

        return ds_nodes.map_batches(fn, batch_format="pandas")

    frontier = _distinct_nodes(
        seeds.select_columns([node_col]), node_col, num_buckets) \
        .materialize()
    visited = frontier
    levels = [_with_hops(frontier, 0)]
    for h in range(1, max_hops + 1):
        reached = semi_join(
            edges.select_columns([src, dst]),
            frontier.map_batches(
                lambda b: b.rename(columns={node_col: src}),
                batch_format="pandas"),
            src, broadcast_threshold=broadcast_threshold,
            num_buckets=num_buckets)
        nxt = _distinct_nodes(
            reached.select_columns([dst]).map_batches(
                lambda b: b.rename(columns={dst: node_col}),
                batch_format="pandas"),
            node_col, num_buckets)
        frontier = semi_join(nxt, visited, node_col, anti=True,
                             broadcast_threshold=broadcast_threshold,
                             num_buckets=num_buckets).materialize()
        if frontier.count() == 0:
            break
        visited = visited.union(frontier).materialize()
        levels.append(_with_hops(frontier, h))
    out = levels[0]
    for lv in levels[1:]:
        out = out.union(lv)
    return out


def k_core(edges: rd.Dataset, k: int, src: str = "src", dst: str = "dst",
           max_iters: int = 50, num_buckets: int = 0,
           broadcast_threshold: int = 5_000_000) -> rd.Dataset:
    """k-core of an undirected graph (edge list with BOTH directions
    present) → (vertex, core_degree): the maximal subgraph where every
    vertex keeps degree ≥ k, by standard iterative peeling.

    Distributed shape per round: one degree combiner aggregation over
    the surviving edge list, then the edge list filters through the
    size-guarded semi-join against the (node-sized) surviving-vertex
    table on BOTH endpoints. The edge list is materialized per round
    (it shrinks monotonically and is consumed twice next round);
    convergence is detected by edge count, so rounds stop as soon as
    peeling stabilizes — never ``max_iters`` blind rounds."""
    num_buckets = resolve_num_buckets(num_buckets)
    from .agg import preagg_groupby
    from .joins import semi_join

    cur = edges.select_columns([src, dst]).materialize()
    n_edges = cur.count()
    for _ in range(max_iters):
        if n_edges == 0:
            break
        deg = preagg_groupby(cur.select_columns([src]), [src],
                             [("count", "", "deg")], num_buckets)
        keep = deg.filter(expr=f"deg >= {int(k)}").materialize()
        kept_src = keep.map_batches(
            lambda b: b[[src]], batch_format="pandas")
        nxt = semi_join(cur, kept_src, src,
                        broadcast_threshold=broadcast_threshold,
                        num_buckets=num_buckets)
        nxt = semi_join(
            nxt,
            kept_src.map_batches(lambda b: b.rename(columns={src: dst}),
                                 batch_format="pandas"),
            dst, broadcast_threshold=broadcast_threshold,
            num_buckets=num_buckets).materialize()
        n_next = nxt.count()
        if n_next == n_edges:
            cur = nxt
            break
        cur, n_edges = nxt, n_next

    out = preagg_groupby(cur.select_columns([src]), [src],
                         [("count", "", "core_degree")], num_buckets)
    return out.map_batches(
        lambda b: b.rename(columns={src: "vertex"}),
        batch_format="pandas")


def label_propagation(edges: rd.Dataset, src: str = "src",
                      dst: str = "dst", iters: int = 3,
                      num_buckets: int = 0,
                      broadcast_threshold: int = 2_000_000) -> rd.Dataset:
    """Synchronous label-propagation community detection over an
    undirected edge list (both directions present) → (node, label)
    after ``iters`` rounds. Every node starts labeled with itself; each
    round it adopts the most frequent label among its neighbors
    (smallest label on ties, previous label kept when it has none) —
    all nodes update simultaneously, so the result is deterministic and
    partition-independent (asynchronous LPA is run-order dependent;
    mirrors the deterministic variant of Raghavan et al. 2007).

    Distributed shape per round (same as ``pagerank``): the label table
    (node-sized) attaches to the edges via the size-guarded
    broadcast/hash join, neighbor-label counts pre-aggregate in
    map_batches before ONE bucketed combine, the per-node argmax rides
    the grouped-topk combiner (≤1 row per node per block shuffles), and
    the next label table materializes (consumed by the next round's
    join). The edge list is scanned once per round and never shuffled
    in the broadcast regime."""
    num_buckets = resolve_num_buckets(num_buckets)
    from .agg import grouped_topk, preagg_groupby
    from .analytic import _attach_small

    if iters < 1:
        raise ValueError("iters must be >= 1")
    edges = edges.select_columns([src, dst]).materialize()

    ends = edges.select_columns([src]).map_batches(
        lambda b: b.rename_columns(["node"]), batch_format="pyarrow").union(
        edges.select_columns([dst]).map_batches(
            lambda b: b.rename_columns(["node"]), batch_format="pyarrow"))
    labels = preagg_groupby(
        ends.map_batches(lambda b: b.assign(__one=np.int8(1)),
                         batch_format="pandas"),
        ["node"], [("count", "", "__n")], num_buckets).map_batches(
        lambda b: pd.DataFrame({"node": b["node"],
                                "label": b["node"]}),
        batch_format="pandas").materialize()

    for _ in range(iters):
        on_edges = _attach_small(
            edges,
            labels.map_batches(lambda b: b.rename(columns={"node": src}),
                               batch_format="pandas"),
            src, broadcast_threshold)
        counts = preagg_groupby(
            on_edges.map_batches(
                lambda b: pd.DataFrame({"node": b[dst], "label": b["label"]}),
                batch_format="pandas"),
            ["node", "label"], [("count", "", "c")], num_buckets)
        best = grouped_topk(counts, ["node"], "c", 1, descending=True,
                            tiebreak="label", num_buckets=num_buckets) \
            .map_batches(lambda b: b.rename(columns={"label": "__new"})
                         [["node", "__new"]], batch_format="pandas")
        merged = _attach_small(labels, best, "node", broadcast_threshold,
                               join_type="left outer")

        def _pick(batch: pd.DataFrame) -> pd.DataFrame:
            new = batch["__new"] if "__new" in batch else batch["label"]
            lab = new.fillna(batch["label"])
            # int keys survive the nullable left join as float — restore
            if batch["node"].dtype.kind in "iu":
                lab = lab.astype(batch["node"].dtype)
            return pd.DataFrame({"node": batch["node"], "label": lab})

        labels = merged.map_batches(_pick,
                                    batch_format="pandas").materialize()
    return labels


def shortest_paths(edges: rd.Dataset, seeds: rd.Dataset,
                   src: str = "src", dst: str = "dst",
                   weight_col: str = "w", node_col: str = "node",
                   max_hops: int = 3, num_buckets: int = 0,
                   broadcast_threshold: int = 2_000_000) -> rd.Dataset:
    """Multi-source weighted shortest paths, bounded at ``max_hops``
    edges (Bellman–Ford with a fixed round count) → (node, dist):
    minimum total edge weight over any walk of ≤ max_hops edges from
    any seed. Integer weights stay exact end-to-end; equivalent SQL is
    the bounded-depth recursive CTE accumulating d + w with a final
    MIN(d) GROUP BY, which the oracle mirrors.

    Distributed shape per round: the distance table (node-sized, only
    reached nodes) attaches to the edges via the size-guarded
    broadcast/hash join, relaxed candidates (dst, d+w) pre-aggregate
    with a MIN combiner before ONE bucketed combine, and the new table
    unions the old with a second node-sized MIN combine. Edges are
    scanned once per round, never shuffled in the broadcast regime."""
    num_buckets = resolve_num_buckets(num_buckets)
    from .agg import preagg_groupby
    from .analytic import _attach_small

    edges = edges.select_columns([src, dst, weight_col]).materialize()

    dist = _distinct_nodes(seeds.select_columns([node_col]), node_col,
                           num_buckets).map_batches(
        lambda b: pd.DataFrame({"node": b[node_col].to_numpy(),
                                "dist": np.zeros(len(b), np.int64)}),
        batch_format="pandas").materialize()

    for _ in range(max_hops):
        reach = _attach_small(
            edges,
            dist.map_batches(lambda b: b.rename(columns={"node": src}),
                             batch_format="pandas"),
            src, broadcast_threshold)

        def _relax(batch: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "node": batch[dst],
                "dist": batch["dist"].to_numpy()
                + batch[weight_col].to_numpy()})

        cand = reach.map_batches(_relax, batch_format="pandas")
        dist = preagg_groupby(dist.union(cand), ["node"],
                              [("min", "dist", "dist")],
                              num_buckets).materialize()
    return dist
