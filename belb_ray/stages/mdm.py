"""Master-data-management linkage ops: waterfall (cascade) matching
and many-to-many id crosswalk bridging.

The reference resolves identifiers through a priority chain — exact id
match, then history-resolved id, then homonym-canonicalized name
(belb/kbs/kb.py + belb/kbs/history.py; SURVEY §2.4 J2-J4) — which is
the classic MDM "waterfall": try the strictest key first, fall through
to weaker keys, record which level matched. ``waterfall_match`` is that
pattern as one streaming pass; ``id_crosswalk`` is its transitive
sibling (A→B→C bridging with ambiguity accounting, the reference's
PMCID→PMID→document chain, SURVEY §2.4 J6).

Scale shape:

- Each level's right-side map is collapsed FIRST to one row per key
  (min-id representative — deterministic) by a combiner groupby; only
  those collapsed maps are broadcast (``ray.put`` once), never the raw
  right table. The left side then matches ALL levels in ONE
  ``map_batches`` pass — zero shuffles over the big side.
- A loud row budget guards the broadcast (the ``distinct_values``
  pattern): at 100 TB a level key with ~billions of distinct values
  must be restructured as a partitioned join, and silently collecting
  it would OOM the driver first.
- ``id_crosswalk`` never materializes the A→C pair blowup on the
  driver: distinct (A,B) and (A,C) collapses are combiner shuffles;
  the B→C bridge attaches broadcast-or-partitioned by size.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from belb_ray.stages.agg import mode_agg, preagg_groupby
from ..util import resolve_num_buckets

Level = tuple[list[str], list[str]]  # (left key cols, right key cols)


def waterfall_match(
    left: rd.Dataset,
    right: rd.Dataset,
    levels: list[Level],
    right_id: str,
    out_id: str = "match_id",
    out_level: str = "match_level",
    max_broadcast_rows: int = 5_000_000,
    num_buckets: int = 0,
) -> rd.Dataset:
    """Deterministic cascade match: each left row gets the min
    ``right_id`` among right rows sharing the keys of its
    highest-priority matching level (level 1 = ``levels[0]``), plus the
    1-based level number. Unmatched rows keep nulls in both columns.

    Right-side multi-matches collapse to MIN ``right_id`` per key
    BEFORE matching, so the result is order- and partitioning-
    independent (and SQL-re-derivable as per-level GROUP BY min +
    priority COALESCE)."""
    num_buckets = resolve_num_buckets(num_buckets)
    import ray

    maps: list[tuple[list[str], object]] = []  # (left_cols, ref(pd map))
    total = 0
    for left_cols, right_cols in levels:
        m = preagg_groupby(right.select_columns(right_cols + [right_id]),
                           right_cols, [("min", right_id, "__m")],
                           num_buckets=num_buckets).materialize()
        n = m.count()
        total += n
        if total > max_broadcast_rows:
            raise ValueError(
                f"waterfall_match: level maps exceed the broadcast budget "
                f"({total} > {max_broadcast_rows} rows at level "
                f"{len(maps) + 1}); coarsen the level keys or restructure "
                f"this level as a hash_partition_join")
        mt = m.to_pandas()
        # rename key cols to the LEFT names so per-batch merge is direct;
        # nullable Int64 keeps 64-bit ids exact through the NaN-producing
        # left merge (float64 would corrupt ids past 2**53)
        mt.columns = [left_cols[right_cols.index(c)] if c in right_cols
                      else c for c in mt.columns]
        mt["__m"] = mt["__m"].astype("Int64")
        maps.append((left_cols, ray.put(mt)))

    from belb_ray.util import cached_get

    def _attach(b: pd.DataFrame) -> pd.DataFrame:
        matched = pd.array([pd.NA] * len(b), dtype="Int64")
        level_no = pd.array([pd.NA] * len(b), dtype="Int64")
        todo = np.ones(len(b), bool)
        for i, (left_cols, ref) in enumerate(maps):
            if not todo.any():
                break
            mt = cached_get(ref)
            sub = b.loc[todo, left_cols].reset_index(drop=True)
            hit = sub.merge(mt, on=left_cols, how="left")["__m"]
            got = hit.notna().to_numpy()
            rows = np.flatnonzero(todo)[got]
            matched[rows] = hit[got].to_numpy(dtype=np.int64)
            level_no[rows] = i + 1
            todo[rows] = False
        out = b.copy()
        out[out_id] = matched
        out[out_level] = level_no
        return out

    return left.map_batches(_attach, batch_format="pandas")


def id_crosswalk(
    a2b: rd.Dataset,
    b2c: rd.Dataset,
    a_col: str,
    b_col: str,
    c_col: str,
    max_broadcast_rows: int = 5_000_000,
    num_buckets: int = 0,
) -> rd.Dataset:
    """Transitive id bridging A→B→C with ambiguity accounting: one row
    per A value with ``n_targets`` (distinct C reachable), ``rep``
    (MIN C — the deterministic representative), and ``ambiguous``
    (n_targets > 1). Handles many-to-many on both hops; duplicate
    (A,B) / (B,C) rows collapse in combiner passes before any join."""
    num_buckets = resolve_num_buckets(num_buckets)
    ab = preagg_groupby(a2b.select_columns([a_col, b_col]), [a_col, b_col],
                        [("count", a_col, "__n")],
                        num_buckets=num_buckets).materialize()
    bc = preagg_groupby(b2c.select_columns([b_col, c_col]), [b_col, c_col],
                        [("count", b_col, "__n")],
                        num_buckets=num_buckets).materialize()

    if bc.count() <= max_broadcast_rows:
        from belb_ray.stages.joins import broadcast_join

        ac = broadcast_join(ab.drop_columns(["__n"]),
                            bc.drop_columns(["__n"]), b_col)
    else:
        from belb_ray.stages.joins import hash_partition_join

        ac = hash_partition_join(ab.drop_columns(["__n"]),
                                 bc.drop_columns(["__n"]), b_col,
                                 num_buckets=num_buckets)

    # collapse duplicate (A,C) reached via different B before counting
    acd = preagg_groupby(ac.select_columns([a_col, c_col]), [a_col, c_col],
                         [("count", a_col, "__n")],
                         num_buckets=num_buckets)
    out = preagg_groupby(acd, [a_col],
                         [("count", c_col, "n_targets"),
                          ("min", c_col, "rep")],
                         num_buckets=num_buckets)

    def _flag(b: pd.DataFrame) -> pd.DataFrame:
        b["ambiguous"] = b["n_targets"] > 1
        return b

    return out.map_batches(_flag, batch_format="pandas")


def source_accuracy(
    ds: rd.Dataset,
    cluster_col: str,
    attr_col: str,
    source_col: str,
    max_broadcast_rows: int = 5_000_000,
    num_buckets: int = 0,
) -> rd.Dataset:
    """Truth-discovery-lite source scoring: the per-cluster majority
    value of ``attr_col`` (mode, min tie-break — the golden-record
    consensus) is the working truth; each source is scored by the
    fraction of its rows that agree with their cluster's majority.
    Output: one row per source — (source, n_rows, n_agree, accuracy).

    Scale shape: the majority table is one row per cluster (mode_agg's
    combiner — the shuffle moves distinct (cluster, value) pairs, not
    rows); it attaches back broadcast-or-partitioned by size, and the
    per-source tally is a sum/count combiner. Iterative truth-discovery
    (re-weighting votes by accuracy) is this op run to fixpoint;
    published estimators converge in a handful of rounds, each round
    exactly this shape."""
    num_buckets = resolve_num_buckets(num_buckets)
    maj = mode_agg(ds.select_columns([cluster_col, attr_col]),
                   [cluster_col], attr_col, "__maj",
                   num_buckets=num_buckets).materialize()

    if maj.count() <= max_broadcast_rows:
        from belb_ray.stages.joins import broadcast_join

        joined = broadcast_join(
            ds.select_columns([cluster_col, attr_col, source_col]),
            maj, cluster_col)
    else:
        from belb_ray.stages.joins import hash_partition_join

        joined = hash_partition_join(
            ds.select_columns([cluster_col, attr_col, source_col]),
            maj, cluster_col, num_buckets=num_buckets)

    def _agree(b: pd.DataFrame) -> pd.DataFrame:
        b["__ok"] = (b[attr_col] == b["__maj"]).astype("int64")
        return b[[source_col, "__ok"]]

    tallied = preagg_groupby(
        joined.map_batches(_agree, batch_format="pandas"), [source_col],
        [("count", source_col, "n_rows"), ("sum", "__ok", "n_agree")],
        num_buckets=num_buckets)

    def _finish(b: pd.DataFrame) -> pd.DataFrame:
        b["accuracy"] = b["n_agree"] / b["n_rows"]
        return b

    return tallied.map_batches(_finish, batch_format="pandas")
