"""The reference's corpus BUILD read path as one Ray composition — the
product a belb user actually runs (SURVEY §3.2; belb/corpora/
corpus.py:182-663). Step order mirrors the reference exactly:

  1. M7  identifier explosion — ``|``-packed identifier strings fan out
         to one row per identifier (corpus.py:275-379).
  2. J2  history resolution — squashed old→new chains applied per row,
         with kept/replaced/obsolete status (qaqc.py:131-178);
         obsolete rows drop with a counted reason.
  3. J1  notinkb boundary — identifiers absent from the KB drop with a
         counted reason (corpus.py:219-239).
  4. A7  exact annotation dedup — identical (doc, span, text, type,
         identifier) rows collapse to one (data.py:472-491).
  5. A6  span-group list merge — rows identical except identifier merge
         into one row with a sorted-distinct identifier list
         (data.py:493-532).
  6. QAQC offsets invariant — every surviving annotation's surface text
         must equal text[start:end] (qaqc.py:27-59); violations are
         RETURNED (empty = pass), never silently dropped.

Scale shape: explosion and resolution are streaming map_batches (the
history map broadcasts once); the KB boundary is the size-guarded
semi-join; dedup + list merge are one bucketed span-key shuffle; the
offsets gate is one doc-hash co-location join. Row conservation is
accounted at every dropping step (rows_in = rows_out + Σ dropped),
returned in the manifest and streamable into a QaqcStats actor.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from belb_ray.util import resolve_num_buckets


def explode_identifiers(anns: rd.Dataset, raw_col: str = "identifier_raw",
                        out_col: str = "identifier",
                        sep: str = "|") -> rd.Dataset:
    """M7: one row per ``sep``-packed identifier, all other columns
    repeated. Vectorized split + flatten + parent-index repeat."""

    def _explode(t: pa.Table) -> pa.Table:
        parts = pc.split_pattern(
            pc.cast(t[raw_col], pa.string()), sep)
        lens = pc.list_value_length(parts).to_numpy()
        idx = pa.array(np.repeat(np.arange(t.num_rows), lens), pa.int64())
        cols = {name: t[name].take(idx) for name in t.column_names
                if name != raw_col}
        cols[out_col] = pc.list_flatten(parts)
        return pa.table(cols)

    return anns.map_batches(_explode, batch_format="pyarrow")


def build_corpus(docs: rd.Dataset, anns: rd.Dataset, kb_ids: rd.Dataset,
                 history, stats=None,
                 num_buckets: int = 0) -> dict:
    """docs(doc_id, text) × anns(doc_id, ann_id, start, end, text,
    entity_type, identifier_raw) × kb_ids(identifier) × history
    (old_identifier, new_identifier) → dict with:

    - ``annotations``: the prepared corpus — one row per distinct
      (doc_id, start, end, text, entity_type) with ``identifiers``
      (sorted-distinct list), ``n_ids``;
    - ``offset_violations``: annotations whose surface ≠ text slice
      (empty = QAQC pass);
    - ``manifest``: drop-with-reason conservation accounting.
    """
    num_buckets = resolve_num_buckets(num_buckets)
    from ..stages.history import resolve_identifiers
    from ..stages.joins import semi_join
    from ..stages.spans import merge_span_identifiers
    from ..stages.transform import check_offsets

    manifest: dict = {}

    exploded = explode_identifiers(anns).materialize()
    n_exploded = exploded.count()
    manifest["identifiers_in"] = n_exploded

    resolved = resolve_identifiers(exploded, history,
                                   id_col="identifier",
                                   out_col="resolved_identifier")
    live = resolved.filter(expr="id_status != 'obsolete'").materialize()
    n_live = live.count()
    manifest["dropped_obsolete"] = n_exploded - n_live
    if stats is not None:
        ray.get(stats.add.remote("corpus_build", "obsolete",
                                 manifest["dropped_obsolete"]))

    inkb = semi_join(live, kb_ids, key="resolved_identifier",
                     num_buckets=num_buckets).materialize()
    n_inkb = inkb.count()
    manifest["dropped_notinkb"] = n_live - n_inkb
    if stats is not None:
        ray.get(stats.add.remote("corpus_build", "notinkb",
                                 manifest["dropped_notinkb"]))

    # A7 + A6 in one span-key shuffle: merge_span_identifiers dedups
    # identical (key, identifier) rows (A7) and merges the rest (A6)
    merged = merge_span_identifiers(
        inkb.map_batches(
            lambda t: pa.table({
                "doc_id": t["doc_id"], "start": t["start"],
                "end": t["end"], "text": t["text"],
                "entity_type": t["entity_type"],
                "identifier": t["resolved_identifier"]}),
            batch_format="pyarrow"),
        num_buckets=num_buckets).materialize()
    manifest["annotations_out"] = merged.count()

    violations = check_offsets(
        docs,
        merged.map_batches(
            lambda t: pa.table({
                "doc_id": t["doc_id"], "start": t["start"],
                "end": t["end"], "surface": t["text"]}),
            batch_format="pyarrow"))

    return {"annotations": merged, "offset_violations": violations,
            "manifest": manifest}
