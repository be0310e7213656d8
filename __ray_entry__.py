"""Driver contract for the graft builder (Ray Data target).

``queries()`` exposes one entry per implemented operator family from
SURVEY.md §2 plus the training-data ops (dedup / ANN / text analysis /
multimodal); ``oracle_sql()`` gives a DuckDB oracle for EVERY entry:
real SQL where the op is SQL-expressible (same column names, same
rounding), and for the non-SQL compositions (MinHash/SimHash dedup, LSH
ANN, the ER flagship, fingerprints, multimodal) a pinned golden parquet
computed by the INDEPENDENT single-process oracle in
``tools/make_goldens.py`` (uncapped brute-force candidate enumeration,
dict union-find, the fixture's analytic gold clusters) — regenerate with
``python tools/make_goldens.py`` if the sf0.01 testdata ever changes.

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ``ray.init()`` / ``ray.shutdown()``.

NOTE on trailing sorts: many queries end in a global ``.sort(...)`` /
``sort_values``. That sort exists ONLY so the driver's order-insensitive
value-hash compare sees a stable row set at tiny result sizes — it is
the oracle-comparability harness, NOT part of the production pipeline
shape (a real pipeline consumes the unsorted stream or writes
partitioned parquet; see the library stage the query wraps).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

# ---------------------------------------------------------------- helpers

STOPWORDS = ("the", "a", "an", "and", "of", "to", "in", "is", "it")
LANG_PROFILES = {
    "en": ("the", "and", "ing", "ion", "ent", " th", "he ", "er ", " of", "of "),
    "de": ("der", "die", "und", "sch", "ein", "ich", "den", "cht", " de", "en "),
    "fr": ("les", "des", "ent", "que", " de", "de ", "ion", "eur", "ait", " le"),
    "es": ("que", " de", "de ", "los", "ión", "ent", "ado", " la", "la ", "es "),
}


import os as _os
from belb_ray.util import round_half_away

_GOLDEN_DIR = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                            "goldens")


def _t(sf_dir: str, name: str,
       columns: list[str] | None = None) -> rd.Dataset:
    """Table read; pass ``columns=`` for wide fact tables (lineitem,
    events, documents) so projection pushdown keeps unused column chunks
    in storage — "prune at the read"."""
    from belb_ray.sources.readers import read_parquet_clean

    return read_parquet_clean(f"{sf_dir.rstrip('/')}/{name}.parquet",
                              columns=columns)


def _t_where(sf_dir: str, name: str, predicate,
             columns: list[str] | None = None) -> rd.Dataset:
    """Predicate-pushdown read (sources/readers.read_parquet_pruned):
    row groups whose min/max statistics exclude ``predicate`` never
    leave storage — vs ``_t(...).filter(...)`` which scans every row."""
    from belb_ray.sources.readers import read_parquet_pruned

    return read_parquet_pruned(f"{sf_dir.rstrip('/')}/{name}.parquet",
                               columns=columns, predicate=predicate)


def _round_cols(ds: rd.Dataset, spec: dict[str, int]) -> rd.Dataset:
    def _r(batch: pd.DataFrame) -> pd.DataFrame:
        for c, nd in spec.items():
            batch[c] = round_half_away(batch[c], nd)
        return batch

    return ds.map_batches(_r, batch_format="pandas")


def _sf_of(sf_dir: str) -> float:
    tail = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        return float(tail)
    except ValueError:
        return 0.01


# ---------------------------------------------------------------- queries


def q_pricing_summary(sf_dir: str) -> rd.Dataset:
    """TPC-H-Q1-style combiner aggregate (SURVEY A10 preagg pattern)."""
    from belb_ray.stages.agg import preagg_groupby

    li = _t(sf_dir, "lineitem", columns=[
        "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
        "l_discount"]).map_batches(
        lambda t: t.append_column(
            "disc_price",
            pa.compute.multiply(t["l_extendedprice"],
                                pa.compute.subtract(pa.scalar(1.0), t["l_discount"])))
        .select(["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "disc_price", "l_discount"]),
        batch_format="pyarrow")
    out = preagg_groupby(li, ["l_returnflag", "l_linestatus"], [
        ("sum", "l_quantity", "sum_qty"),
        ("sum", "l_extendedprice", "sum_base_price"),
        ("sum", "disc_price", "sum_disc_price"),
        ("mean", "l_discount", "avg_disc"),
        ("count", "", "count_order"),
    ])
    return _round_cols(out, {"sum_qty": 2, "sum_base_price": 2,
                             "sum_disc_price": 2, "avg_disc": 6})


def q_revenue_by_nation(sf_dir: str) -> rd.Dataset:
    """Broadcast dimension joins (SURVEY J4/J6) + pre-aggregated groupby."""
    from belb_ray.stages.agg import preagg_groupby
    from belb_ray.stages.joins import broadcast_join

    cust = _t(sf_dir, "customer").map_batches(
        lambda t: pa.table({"o_custkey": t["c_custkey"],
                            "n_nationkey": pa.compute.cast(t["c_nationkey"], pa.int32())}),
        batch_format="pyarrow")
    nation = _t(sf_dir, "nation", columns=["n_nationkey", "n_name"])
    orders = _t(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    j = broadcast_join(orders, cust, keys="o_custkey")
    j = broadcast_join(j, nation, keys="n_nationkey")
    out = preagg_groupby(j, ["n_name"], [
        ("sum", "o_totalprice", "revenue"),
        ("count", "", "n_orders"),
    ])
    return _round_cols(out, {"revenue": 2})


def q_order_priority_revenue(sf_dir: str) -> rd.Dataset:
    """Large-large hash-partitioned join (SURVEY J5) lineitem ⋈ orders."""
    from belb_ray.stages.agg import preagg_groupby
    from belb_ray.stages.joins import hash_partition_join

    li = _t(sf_dir, "lineitem", columns=[
        "l_orderkey", "l_extendedprice", "l_discount"]).map_batches(
        lambda t: pa.table({
            "orderkey": t["l_orderkey"],
            "disc_price": pa.compute.multiply(
                t["l_extendedprice"],
                pa.compute.subtract(pa.scalar(1.0), t["l_discount"]))}),
        batch_format="pyarrow")
    orders = _t(sf_dir, "orders", columns=[
        "o_orderkey", "o_orderpriority"]).map_batches(
        lambda t: pa.table({"orderkey": t["o_orderkey"],
                            "o_orderpriority": t["o_orderpriority"]}),
        batch_format="pyarrow")
    j = hash_partition_join(li, orders, key="orderkey", num_buckets=32)
    out = preagg_groupby(j, ["o_orderpriority"], [
        ("sum", "disc_price", "revenue"),
        ("count", "", "n_items"),
    ])
    return _round_cols(out, {"revenue": 2})


def q_customers_without_orders(sf_dir: str) -> rd.Dataset:
    """Broadcast anti-join — the reference's notinkb membership check
    (belb/kbs/kb.py:428-453 — SURVEY J1). Customers with no big order."""
    from belb_ray.stages.agg import preagg_groupby
    from belb_ray.stages.joins import broadcast_semi_join, distinct_values

    import pyarrow.dataset as pads

    big = _t_where(sf_dir, "orders", pads.field("o_totalprice") > 300000,
                   columns=["o_custkey", "o_totalprice"])
    have_big = distinct_values(big, "o_custkey")
    cust = _t(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    no_big = broadcast_semi_join(cust, have_big, key="c_custkey", anti=True)
    return preagg_groupby(no_big, ["c_mktsegment"],
                          [("count", "", "n_customers")])


def q_top_orders(sf_dir: str) -> rd.Dataset:
    """Deterministic top-k (sort + limit, tie-break on key — SURVEY O2)."""
    from belb_ray.stages.agg import topk

    orders = _t(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    return topk(orders, "o_totalprice", 10, descending=True,
                tiebreak="o_orderkey")


def q_brand_dense_ids(sf_dir: str) -> pd.DataFrame:
    """Deterministic dense-id assignment replacing arrival-order uids
    (SURVEY T2/T3)."""
    from belb_ray.stages.agg import dense_ids

    return dense_ids(_t(sf_dir, "part"), "p_brand")


def q_brand_synsets(sf_dir: str) -> rd.Dataset:
    """SYNSET aggregation (belb/kbs/query.py:321-356 — SURVEY A1)."""
    from belb_ray.stages.homonyms import synsets

    syn = _t(sf_dir, "part").map_batches(
        lambda t: pa.table({"identifier": t["p_brand"], "name": t["p_name"]}),
        batch_format="pyarrow")
    return synsets(syn)


def q_name_homonyms(sf_dir: str) -> rd.Dataset:
    """NAME_HOMONYMS (belb/kbs/query.py:234-291 — SURVEY A3)."""
    from belb_ray.stages.homonyms import name_homonyms

    syn = _t(sf_dir, "part").map_batches(
        lambda t: pa.table({"identifier": t["p_brand"], "name": t["p_name"]}),
        batch_format="pyarrow")
    return name_homonyms(syn)


def q_identifier_homonyms(sf_dir: str) -> rd.Dataset:
    """IDENTIFIER_HOMONYMS merge (belb/kbs/query.py:97-194 — SURVEY A2)."""
    from belb_ray.stages.homonyms import identifier_homonyms

    syn = _t(sf_dir, "customer").map_batches(
        lambda t: pa.table({"identifier": pa.compute.cast(t["c_nationkey"], pa.int64()),
                            "name": t["c_mktsegment"]}),
        batch_format="pyarrow")
    return identifier_homonyms(syn)


def q_kb_dedup(sf_dir: str) -> rd.Dataset:
    """Sort+keep-first KB dedup (belb/kbs/kb.py:251-263 — SURVEY A8)."""
    from belb_ray.stages.homonyms import kb_dedup

    syn = _t(sf_dir, "part").map_batches(
        lambda t: pa.table({"uid": t["p_partkey"],
                            "identifier": t["p_brand"],
                            "name": t["p_name"],
                            "description": pa.compute.cast(t["p_size"], pa.int64())}),
        batch_format="pyarrow")
    return kb_dedup(syn)


def _nation_history() -> pd.DataFrame:
    """Deterministic redirect table over nation keys: one-hop, two-hop
    chains and the '-1' obsolete sentinel (FIXTURES.md F5)."""
    old, new = [], []
    for n in range(25):
        old += [str(n + 100), str(n + 200), str(n + 300)]
        new += [str(n), str(n + 100), "-1"]
    return pd.DataFrame({"old_identifier": old, "new_identifier": new})


def q_history_resolution(sf_dir: str) -> rd.Dataset:
    """Identifier-history fixpoint resolution (belb/kbs/kb.py:455-486,
    belb/preprocessing/qaqc.py:97-178 — SURVEY J2)."""
    from belb_ray.stages.history import resolve_identifiers

    cust = _t(sf_dir, "customer").map_batches(
        lambda t: pa.table({
            "c_custkey": t["c_custkey"],
            "identifier": pa.array(
                [str(nk + 100 * (ck % 4)) for ck, nk in
                 zip(t["c_custkey"].to_pylist(), t["c_nationkey"].to_pylist())],
                pa.string())}),
        batch_format="pyarrow")
    return resolve_identifiers(cust, _nation_history())


def q_id_mapping(sf_dir: str) -> rd.Dataset:
    """String→dense-int id mapping lookup (belb/kbs/kb.py:538-570 —
    SURVEY J4)."""
    from belb_ray.stages.history import apply_id_mapping

    mapping = pd.DataFrame({
        "original_identifier": [f"EXT:{2 * n}" for n in range(25)],
        "internal_identifier": list(range(25)),
    })
    sup = _t(sf_dir, "supplier").map_batches(
        lambda t: pa.table({
            "s_suppkey": t["s_suppkey"],
            "orig": pa.array(
                [f"EXT:{2 * nk + (sk % 2)}" for sk, nk in
                 zip(t["s_suppkey"].to_pylist(), t["s_nationkey"].to_pylist())],
                pa.string())}),
        batch_format="pyarrow")
    return apply_id_mapping(sup, mapping, id_col="orig")


def q_distinct_segments(sf_dir: str) -> rd.Dataset:
    """count(distinct) via two-level dedup (SURVEY O6/O8 pattern)."""
    from belb_ray.stages.agg import count_distinct

    cust = _t(sf_dir, "customer").map_batches(
        lambda t: pa.table({"c_nationkey": pa.compute.cast(t["c_nationkey"], pa.int64()),
                            "c_mktsegment": t["c_mktsegment"]}),
        batch_format="pyarrow")
    return count_distinct(cust, ["c_nationkey"], "c_mktsegment", "n_segments")


def q_exact_dup_groups(sf_dir: str) -> rd.Dataset:
    from belb_ray.pipelines.docdedup import exact_dup_groups

    return exact_dup_groups(_t(sf_dir, "documents"))


def q_doc_token_counts(sf_dir: str) -> rd.Dataset:
    from belb_ray.stages.docstats import doc_token_counts

    return doc_token_counts(_t(sf_dir, "documents"))


def q_doc_quality(sf_dir: str) -> rd.Dataset:
    from belb_ray.stages.docstats import doc_quality

    return doc_quality(_t(sf_dir, "documents"))


def q_doc_lang_id(sf_dir: str) -> rd.Dataset:
    from belb_ray.stages.docstats import doc_lang_id

    return doc_lang_id(_t(sf_dir, "documents"))


def q_events_hourly(sf_dir: str) -> rd.Dataset:
    """Tumbling-window aggregate over the event stream (graft extension;
    window as string for a timezone/unit-stable compare)."""
    from belb_ray.stages.windows import tumbling_window

    out = tumbling_window(_t(sf_dir, "events"), "ts", "1h", ["event_type"], [
        ("count", "", "n_events"),
        ("sum", "value", "sum_value"),
    ])

    def _fmt(batch: pd.DataFrame) -> pd.DataFrame:
        batch["window_start"] = batch["window_start"].dt.strftime("%Y-%m-%d %H:%M:%S")
        batch["sum_value"] = round_half_away(batch["sum_value"], 4)
        return batch

    return out.map_batches(_fmt, batch_format="pandas")


def q_events_hopping(sf_dir: str) -> rd.Dataset:
    """Hopping (sliding) window aggregate: 2h windows every 1h — each
    event lands in 2 windows (graft extension; no reference analog)."""
    from belb_ray.stages.windows import hopping_window

    out = hopping_window(_t(sf_dir, "events"), "ts", "1h", "2h",
                         ["event_type"], [
                             ("count", "", "n_events"),
                             ("sum", "value", "sum_value"),
                         ])

    def _fmt(batch: pd.DataFrame) -> pd.DataFrame:
        batch["window_start"] = batch["window_start"].dt.strftime(
            "%Y-%m-%d %H:%M:%S")
        batch["sum_value"] = round_half_away(batch["sum_value"], 4)
        return batch

    return out.map_batches(_fmt, batch_format="pandas")


def q_events_sessions(sf_dir: str) -> rd.Dataset:
    """Per-user sessionization with a 30-minute inactivity gap (graft
    extension: stateful stream shape as one co-location shuffle)."""
    from belb_ray.stages.windows import session_windows

    out = session_windows(_t(sf_dir, "events"), "ts", "user_id", "30min")

    def _fmt(batch: pd.DataFrame) -> pd.DataFrame:
        for c in ("session_start", "session_end"):
            batch[c] = batch[c].dt.strftime("%Y-%m-%d %H:%M:%S")
        return batch

    return out.map_batches(_fmt, batch_format="pandas")


def q_ann_cosine_topk(sf_dir: str) -> rd.Dataset:
    """Exact brute-force cosine top-k: broadcast queries, streamed corpus."""
    import pyarrow.parquet as pq

    from belb_ray.stages.ann import cosine_topk_search

    emb = pq.read_table(f"{sf_dir.rstrip('/')}/embeddings.parquet")
    queries = emb.filter(pa.compute.less(emb["vec_id"], pa.scalar(16)))
    out = cosine_topk_search(_t(sf_dir, "embeddings"), queries, k=5)
    return _round_cols(out, {"sim": 4})


def q_embedding_neardup(sf_dir: str) -> rd.Dataset:
    """Embedding-cosine near-dup pairs (exact, broadcast matrix)."""
    from belb_ray.stages.ann import embedding_neardup_pairs

    out = embedding_neardup_pairs(_t(sf_dir, "embeddings"), threshold=0.35)
    return _round_cols(out, {"sim": 4})


def q_synset_similarity(sf_dir: str) -> rd.Dataset:
    """A12 analog: per identifier, mean pairwise Levenshtein ratio over
    its distinct names (belb/scripts/stats.py:203-250 — the reference's
    only string-similarity scoring op). Singleton synsets score 1.0."""
    from belb_ray.functions.similarity import levenshtein_ratio

    syn = _t(sf_dir, "part").map_batches(
        lambda t: pa.table({"identifier": t["p_brand"], "name": t["p_name"]}),
        batch_format="pyarrow")

    def _mean_lev(group: pd.DataFrame) -> pd.DataFrame:
        names = sorted(set(group["name"]))
        if len(names) < 2:
            mean = 1.0
        else:
            scores = [levenshtein_ratio(a, b)
                      for i, a in enumerate(names) for b in names[i + 1:]]
            mean = float(sum(scores) / len(scores))
        return pd.DataFrame({"identifier": [group["identifier"].iloc[0]],
                             "n_names": [len(names)],
                             "mean_lev": [round_half_away(mean, 6)]})

    return syn.groupby("identifier").map_groups(_mean_lev, batch_format="pandas")


def q_id_explosion(sf_dir: str) -> rd.Dataset:
    """M7 analog: multi-valued packed identifier strings split on '|',
    prefix-stripped, exploded to one row per id (identifier parsing per
    corpus, e.g. belb/corpora/bc5cdr.py:48-60 — SURVEY M7). Vectorized:
    pyarrow split_pattern + list flatten, no Python row loop."""
    orders = _t(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])

    def _explode(batch: pa.Table) -> pa.Table:
        ok = batch["o_orderkey"]
        packed = pa.compute.binary_join_element_wise(
            pa.compute.cast(pa.compute.binary_join_element_wise(
                pa.array(["ID:"] * batch.num_rows),
                pa.compute.cast(ok, pa.string()), ""), pa.string()),
            pa.compute.binary_join_element_wise(
                pa.array(["ID:"] * batch.num_rows),
                pa.compute.cast(batch["o_custkey"], pa.string()), ""),
            "|")
        parts = pa.compute.split_pattern(packed, "|")
        flat = pa.compute.list_flatten(parts)
        lens = pa.compute.list_value_length(parts).to_numpy()
        parent = np.repeat(ok.to_numpy(), lens)
        ident = pa.compute.utf8_slice_codeunits(flat, 3)
        return pa.table({"o_orderkey": pa.array(parent, pa.int64()),
                         "ident": ident})

    return orders.map_batches(_explode, batch_format="pyarrow")


def q_doc_normalize(sf_dir: str) -> rd.Dataset:
    """M9/M13 analog: vectorized unicode-fix + whitespace-collapse + trim
    normalizer (belb/preprocessing/transform.py:154-163)."""
    from belb_ray.functions.text import normalize_text_array

    docs = _t(sf_dir, "documents")

    def _norm(batch: pa.Table) -> pa.Table:
        return pa.table({"doc_id": batch["doc_id"],
                         "norm_text": normalize_text_array(
                             batch["text"].combine_chunks())})

    return docs.map_batches(_norm, batch_format="pyarrow")


def q_span_assignment(sf_dir: str) -> rd.Dataset:
    """J8 analog: span → containing segment, per-document groupby +
    vectorized containment (belb/preprocessing/data.py:595-609). Spans
    derive from lineitem rows, segments are 3 fixed windows per order."""
    from belb_ray.stages.intervals import assign_spans_to_segments

    spans = _t(sf_dir, "lineitem", columns=[
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"]).map_batches(
        lambda t: pa.table({
            "doc_id": t["l_orderkey"],
            "span_id": pa.compute.add(
                pa.compute.multiply(t["l_orderkey"], pa.scalar(10, pa.int64())),
                pa.compute.cast(t["l_linenumber"], pa.int64())),
            "start": pa.compute.cast(
                np.mod(t["l_partkey"].to_numpy(), 280), pa.int64()),
            "end": pa.compute.cast(
                np.mod(t["l_partkey"].to_numpy(), 280)
                + np.mod(t["l_suppkey"].to_numpy(), 20), pa.int64()),
        }), batch_format="pyarrow")

    def _segs(batch: pa.Table) -> pa.Table:
        ok = batch["o_orderkey"].to_numpy()
        doc = np.repeat(ok, 3)
        s = np.tile(np.arange(3, dtype=np.int64), len(ok))
        return pa.table({
            "doc_id": pa.array(doc, pa.int64()),
            "seg_id": pa.array(s, pa.int64()),
            "seg_start": pa.array(s * 100, pa.int64()),
            "seg_end": pa.array(s * 100 + 100, pa.int64()),
        })

    segments = _t(sf_dir, "orders", columns=["o_orderkey"]).map_batches(
        _segs, batch_format="pyarrow")
    return assign_spans_to_segments(spans, segments)


def q_sentence_split(sf_dir: str) -> rd.Dataset:
    """Sentence splitting with offset invariants (reference
    segment.py:249-331; invariant checks segment.py:138-144) — offsets
    index the original text and are re-derived independently in SQL."""
    from belb_ray.stages.transform import split_sentences

    return split_sentences(_t(sf_dir, "documents"))


def q_span_merge(sf_dir: str) -> rd.Dataset:
    """A6 analog: annotations identical except identifiers merge into one
    row with a sorted-distinct identifier LIST (belb/preprocessing/
    data.py:493-532). The operator emits a true ``list<string>`` column;
    the query joins it to a string for the cross-engine hash compare."""
    from belb_ray.stages.spans import merge_span_identifiers

    anns = _t(sf_dir, "lineitem", columns=[
        "l_orderkey", "l_linenumber", "l_returnflag", "l_suppkey"]).map_batches(
        lambda t: pa.table({
            "doc_id": pa.compute.cast(t["l_orderkey"], pa.int64()),
            "start": pa.compute.cast(
                np.mod(t["l_linenumber"].to_numpy(), 2) * 10, pa.int64()),
            "end": pa.compute.cast(
                np.mod(t["l_linenumber"].to_numpy(), 2) * 10 + 5, pa.int64()),
            "text": pa.array(
                ["m%d" % (v % 2) for v in t["l_linenumber"].to_pylist()],
                pa.string()),
            "entity_type": t["l_returnflag"],
            "identifier": pa.array(
                ["S:%d" % v for v in t["l_suppkey"].to_pylist()], pa.string()),
        }), batch_format="pyarrow")
    merged = merge_span_identifiers(anns)
    return merged.map_batches(
        lambda t: pa.table({
            "doc_id": t["doc_id"], "start": t["start"], "end": t["end"],
            "text": t["text"], "entity_type": t["entity_type"],
            "ids_joined": pa.array(
                [";".join(v) for v in t["identifiers"].to_pylist()],
                pa.string()),
            "n_ids": t["n_ids"],
        }), batch_format="pyarrow")


def q_overlap_suppression(sf_dir: str) -> rd.Dataset:
    """J9 analog: foreign annotations overlapping (or sharing text with) a
    same-document gold annotation are dropped
    (belb/preprocessing/data.py:549-567)."""
    from belb_ray.stages.spans import suppress_overlapping

    gold = _t(sf_dir, "orders", columns=["o_orderkey", "o_custkey"]).map_batches(
        lambda t: pa.table({
            "doc_id": pa.compute.cast(t["o_orderkey"], pa.int64()),
            "ann_id": pa.compute.cast(
                pa.compute.multiply(t["o_orderkey"], pa.scalar(10, pa.int64())),
                pa.int64()),
            "start": pa.array([50] * t.num_rows, pa.int64()),
            "end": pa.array([150] * t.num_rows, pa.int64()),
            "text": pa.array(["t%d" % (v % 100)
                              for v in t["o_custkey"].to_pylist()], pa.string()),
        }), batch_format="pyarrow")
    foreign = _t(sf_dir, "lineitem", columns=[
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"]).map_batches(
        lambda t: pa.table({
            "doc_id": pa.compute.cast(t["l_orderkey"], pa.int64()),
            "ann_id": pa.compute.cast(
                pa.compute.add(
                    pa.compute.multiply(t["l_orderkey"],
                                        pa.scalar(10, pa.int64())),
                    pa.compute.cast(t["l_linenumber"], pa.int64())),
                pa.int64()),
            "start": pa.array(np.mod(t["l_partkey"].to_numpy(), 280), pa.int64()),
            "end": pa.array(np.mod(t["l_partkey"].to_numpy(), 280)
                            + np.mod(t["l_suppkey"].to_numpy(), 20) + 1,
                            pa.int64()),
            "text": pa.array(["t%d" % (v % 100)
                              for v in t["l_partkey"].to_pylist()], pa.string()),
        }), batch_format="pyarrow")
    return suppress_overlapping(gold, foreign)


def q_passage_assembly(sf_dir: str) -> rd.Dataset:
    """M11 analog: ordered typed text chunks → passages with running
    offsets, +1 whitespace accounted per chunk boundary
    (belb/preprocessing/data.py:582-616). Chunks derive from lineitem:
    one chunk per line, text length (l_partkey % 40) + 3; the oracle
    re-derives the offsets with a SQL window prefix sum."""
    from belb_ray.stages.offsets import assemble_passages

    # (l_orderkey, l_linenumber) is NOT unique in the synthetic data;
    # chunk order tiebreaks by partkey so equal-idx rows (which could
    # otherwise swap offsets) always carry equal lengths
    chunks = _t(sf_dir, "lineitem", columns=[
        "l_orderkey", "l_linenumber", "l_partkey"]).map_batches(
        lambda t: pa.table({
            "doc_id": t["l_orderkey"],
            "chunk_idx": pa.compute.cast(pa.compute.add(
                pa.compute.multiply(
                    pa.compute.cast(t["l_linenumber"], pa.int64()),
                    pa.scalar(32768, pa.int64())),
                pa.compute.cast(t["l_partkey"], pa.int64())), pa.int64()),
            "passage_type": pa.compute.if_else(
                pa.compute.equal(t["l_linenumber"], pa.scalar(1)),
                pa.scalar("title"), pa.scalar("body")),
            "text": pa.compute.binary_repeat(
                pa.scalar("x"),
                pa.compute.cast(
                    np.mod(t["l_partkey"].to_numpy(), 40) + 3, pa.int32())),
        }), batch_format="pyarrow")
    return assemble_passages(chunks)


def q_offset_remap(sf_dir: str) -> rd.Dataset:
    """M12 analog: annotations re-anchored inside their passage by the
    reference's sequential word-boundary regex scan
    (belb/preprocessing/data.py:313-362): sorted by original start,
    each search starts at the previous match end; unmatched rows drop.
    The passage is the whole document (text is strictly single-space
    [a-z]+ words, so the `(?<!\\w)t(?!\\w)` regex semantics are exactly
    reproducible in SQL with space-padded strpos arithmetic); four
    annotations per doc: word 2, word 5, word 2 again (found only if it
    reoccurs after the second match), and a never-present token."""
    from belb_ray.stages.offsets import remap_offsets

    docs = _t(sf_dir, "documents", columns=["doc_id", "text"])

    def _passages(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy()
        return pa.table({
            "doc_id": t["doc_id"],
            "passage_id": pa.array(np.zeros(len(d), np.int64)),
            "p_offset": pa.array((d % 7) * 100, pa.int64()),
            "text": t["text"],
        })

    def _anns(t: pa.Table) -> pa.Table:
        words = pa.compute.split_pattern(t["text"], " ")
        w2 = pa.compute.list_element(words, 1)
        w5 = pa.compute.list_element(words, 4)
        n = t.num_rows
        parts = []
        for ann_id, w in ((1, w2), (2, w5), (3, w2),
                          (4, pa.array(["zzq"] * n, pa.string()))):
            parts.append(pa.table({
                "doc_id": t["doc_id"],
                "passage_id": pa.array(np.zeros(n, np.int64)),
                "ann_id": pa.array(np.full(n, ann_id, np.int64)),
                "text": w,
                "orig_start": pa.array(np.full(n, ann_id - 1, np.int64)),
            }))
        return pa.concat_tables(parts)

    passages = docs.map_batches(_passages, batch_format="pyarrow")
    anns = docs.map_batches(_anns, batch_format="pyarrow")
    return remap_offsets(passages, anns)


def q_foreign_name_homonyms(sf_dir: str) -> rd.Dataset:
    """A4 exact: two-predicate HAVING (count(distinct id) > 1 AND
    count(distinct foreign id) > 1 — belb/kbs/query.py:196-232)."""
    from belb_ray.stages.homonyms import foreign_name_homonyms

    syn = _t(sf_dir, "part").map_batches(
        lambda t: pa.table({"name": t["p_name"],
                            "identifier": t["p_brand"],
                            "foreign_identifier": t["p_type"]}),
        batch_format="pyarrow")
    return foreign_name_homonyms(syn)


def q_eval_subsets(sf_dir: str) -> rd.Dataset:
    """A11 analog: zeroshot / stratified / seen evaluation slicing
    (belb/scripts/get_mentions_subsets.py:82-140)."""
    from belb_ray.stages.subsets import evaluation_subsets

    anns = _t(sf_dir, "supplier").map_batches(
        lambda t: pa.table({
            "s_suppkey": pa.compute.cast(t["s_suppkey"], pa.int64()),
            "identifier": pa.array(
                (t["s_suppkey"].to_numpy().astype(np.int64) * 7919) % 50,
                pa.int64()),
            "surface": pa.array(
                ["n%d" % (v % 5) for v in t["s_nationkey"].to_pylist()],
                pa.string()),
            "split": pa.array(
                ["test" if (v * 104729) % 10 < 3 else "train"
                 for v in t["s_suppkey"].to_pylist()], pa.string()),
        }), batch_format="pyarrow")
    out = evaluation_subsets(anns, train_splits=("train",))
    return out.select_columns(["s_suppkey", "identifier", "surface", "subset"])


# ---- rows-only (non-SQL-expressible) ------------------------------------


def q_hash_sample(sf_dir: str) -> rd.Dataset:
    """Deterministic hash-based sampling (training-data split op). The
    md5 hash method is engine-reproducible, so DuckDB re-derives the
    exact same sample (stages/sampling.py)."""
    from belb_ray.stages.sampling import hash_sample

    return hash_sample(_t(sf_dir, "documents"), key="doc_id", frac=0.25,
                       seed=7, method="md5"
                       ).select_columns(["doc_id", "lang", "source"])


def q_upsample_chunks(sf_dir: str) -> rd.Dataset:
    """O4 analog: seeded shuffle-and-chunk split (md5 hash order —
    re-derivable in SQL via row_number over the same hash)."""
    from belb_ray.stages.sampling import upsample_chunks

    out = upsample_chunks(_t(sf_dir, "documents"), key="doc_id",
                          max_chunk=50, seed=3, method="md5")
    return out.select_columns(["doc_id", "chunk_id"])


def q_er_clusters(sf_dir: str) -> rd.Dataset:
    """Flagship ER pipeline on the deterministic synthetic files fixture
    (size scaled by sf; BASELINE.json north_rule)."""
    from belb_ray.pipelines.er import ERConfig, resolve_files
    from belb_ray.sources.synthetic import make_fixture

    n_files = max(600, int(200_000 * _sf_of(sf_dir)))
    files = rd.from_arrow(make_fixture(n_files=n_files, seed=42)["files"])
    res = resolve_files(files, ERConfig(input_blocks=8))
    return res["clusters"]


def q_pprl_links(sf_dir: str) -> rd.Dataset:
    """Privacy-preserving record linkage (stages/pprl.pprl_dice_links):
    CLK Bloom-filter encodings over (repo, path) quasi-identifiers —
    vectorized byte-bigram double hashing into 512-bit filters — then
    identical-filter collapse, byte-sampled LSH bands, candidate pairs,
    and exact Dice ≥ 0.9 links computed ONLY on the encodings (Schnell
    et al. 2009). Oracle = pinned golden from the independent plain-
    Python single-process composition (tools/make_goldens.py
    golden_pprl_links). Trailing sort is oracle-comparability only."""
    from belb_ray.sources.synthetic import make_fixture
    from belb_ray.stages.pprl import pprl_dice_links

    n_files = max(600, int(200_000 * _sf_of(sf_dir)))
    files = rd.from_arrow(make_fixture(n_files=n_files, seed=42)["files"])
    out = pprl_dice_links(files, "row_id", ["repo", "path"], threshold=0.9)
    return out.sort(["id_a", "id_b"])


def q_canopy_blocks(sf_dir: str) -> rd.Dataset:
    """Canopy clustering as cheap overlapping blocking (stages/canopy.
    canopy_blocks, McCallum et al. 2000): hashed-unit-vector cosine,
    per-bucket greedy center selection (one shuffle), driver merge under
    a loud budget, broadcast assignment with nearest-center coverage
    fallback. Oracle = pinned golden from the independent sequential
    single-process composition (tools/make_goldens.py
    golden_canopy_blocks). Trailing sort is oracle-comparability only."""
    from belb_ray.stages.canopy import canopy_blocks

    docs = _t(sf_dir, "documents")
    out = canopy_blocks(docs, "doc_id", "text", t1_sim=0.6, t2_sim=0.75)
    return out.sort(["canopy_id", "row_id"])


def q_progressive_er_curve(sf_dir: str) -> rd.Dataset:
    """Pay-as-you-go verification schedule (pipelines/docdedup.
    progressive_verify_curve, Whang et al. 2013): LSH candidates ranked
    by cheap MinHash score; per cheap-score threshold, the share of true
    matches (exact shingle Jaccard ≥ 0.5) the work prefix captures.
    Whole curve costs ONE pass over the candidate pairs (fixed-width
    partial per batch). Oracle = pinned golden from the independent
    single-process composition (tools/make_goldens.py
    golden_progressive_curve)."""
    from belb_ray.pipelines.docdedup import progressive_verify_curve
    from belb_ray.sources.synthetic import make_fixture

    n_files = max(600, int(200_000 * _sf_of(sf_dir)))
    files = rd.from_arrow(
        make_fixture(n_files=n_files, seed=42)["files"])
    return progressive_verify_curve(
        files, id_col="row_id", text_col="content").sort(["threshold"])


def q_blocking_ablation(sf_dir: str) -> rd.Dataset:
    """Blocking-scheme ablation (stages/ereval.blocking_ablation): for
    each of the ER pipeline's two key families (MinHash content bands,
    path sorted-neighborhood) and their union — candidate volume, gold-
    pair coverage after exact-dup collapse, and each scheme's UNIQUE
    marginal contribution (the number that justifies running it).
    Candidate counts stay distributed; only covered gold keys reach the
    driver (budget-guarded). Oracle = pinned golden from the independent
    single-process composition (tools/make_goldens.py
    golden_blocking_ablation)."""
    from belb_ray.sources.synthetic import make_fixture
    from belb_ray.stages.ereval import blocking_ablation

    n_files = max(600, int(200_000 * _sf_of(sf_dir)))
    fx = make_fixture(n_files=n_files, seed=42)
    return blocking_ablation(rd.from_arrow(fx["files"]),
                             rd.from_arrow(fx["gold_pairs"]))


def q_corr_clusters(sf_dir: str) -> rd.Dataset:
    """Correlation clustering by distributed KwikCluster
    (stages/corrcluster.kwik_cluster, Ailon et al. 2008 / Chierichetti
    et al. KDD'14): support-≥2 part co-occurrence edges → hashed-key
    pivot peeling (local-minima MIS per round, smallest-keyed-pivot
    assignment) — the non-transitive alternative to connected-components
    identity merge. Oracle = pinned golden from the independent plain
    dict/set single-process round-major walk (tools/make_goldens.py
    golden_corr_clusters). Trailing sort is oracle-comparability only."""
    from belb_ray.stages.agg import preagg_groupby
    from belb_ray.stages.cooccur import cooccurrence_pairs
    from belb_ray.stages.corrcluster import kwik_cluster

    li = _t(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    pairs = cooccurrence_pairs(li, "l_orderkey", "l_partkey")
    counts = preagg_groupby(pairs, ["a", "b"], [("count", "", "n")],
                            num_buckets=64)
    edges = counts.filter(expr="n >= 2")
    out = kwik_cluster(edges, id_a="a", id_b="b", seed=5)
    return out.sort(["row_id"])


def q_er_increment(sf_dir: str) -> rd.Dataset:
    """Incremental ER attach (pipelines/er.resolve_increment): wave 1
    resolves half the fixture and persists rep features + assignments;
    wave 2 attaches the other half against that state (cross band
    pairing + nn components + min-cluster inheritance). Combined
    assignments, canonically relabeled to min-member row_id, must equal
    the BATCH resolution's gold — incremental attach is held to the
    same golden as ``er_clusters``, which is the point."""
    import shutil
    import tempfile

    from belb_ray.pipelines.er import (ERConfig, resolve_files,
                                       resolve_increment,
                                       save_resolution_state)
    from belb_ray.sources.synthetic import make_fixture
    from belb_ray.stages.agg import preagg_groupby
    from belb_ray.stages.analytic import _attach_small

    n_files = max(600, int(200_000 * _sf_of(sf_dir)))
    tbl = make_fixture(n_files=n_files, seed=42)["files"]
    # interleave the waves (even/odd positions) so duplicate families
    # STRADDLE the waves and the inheritance path is load-bearing — a
    # positional half-split leaves families whole in one wave and the
    # increment degenerates to fresh clustering
    idx = np.arange(tbl.num_rows)
    state = _os.path.join(tempfile.gettempdir(),
                          f"belb_ray_er_state_{n_files}")
    shutil.rmtree(state, ignore_errors=True)
    cfg = ERConfig(input_blocks=8)
    res1 = resolve_files(rd.from_arrow(tbl.take(idx[idx % 2 == 0])), cfg)
    save_resolution_state(res1, state)
    inc = resolve_increment(rd.from_arrow(tbl.take(idx[idx % 2 == 1])),
                            state, cfg)

    combined = res1["clusters"].union(
        inc.select_columns(["row_id", "cluster_id"]))
    canon = preagg_groupby(combined, ["cluster_id"],
                           [("min", "row_id", "canon")], num_buckets=32)
    out = _attach_small(combined, canon, "cluster_id", 2_000_000)
    return out.map_batches(
        lambda t: pa.table({"row_id": t["row_id"],
                            "cluster_id": t["canon"]}),
        batch_format="pyarrow")


def q_minhash_dedup_docs(sf_dir: str) -> rd.Dataset:
    from belb_ray.pipelines.docdedup import minhash_dedup

    return minhash_dedup(_t(sf_dir, "documents"), threshold=0.5)


def q_simhash_dedup_docs(sf_dir: str) -> rd.Dataset:
    from belb_ray.pipelines.docdedup import simhash_dedup

    return simhash_dedup(_t(sf_dir, "documents"), max_hamming=3)


def q_ngram_jaccard_docs(sf_dir: str) -> rd.Dataset:
    from belb_ray.pipelines.docdedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(_t(sf_dir, "documents"), threshold=0.3)


def q_doc_fingerprints(sf_dir: str) -> rd.Dataset:
    from belb_ray.stages.docstats import doc_fingerprints

    return doc_fingerprints(_t(sf_dir, "documents"))


def q_lsh_neardup(sf_dir: str) -> rd.Dataset:
    """LSH-bucketed near-dup (the recall<1 scale path for embeddings)."""
    from belb_ray.stages.ann import lsh_neardup_pairs

    return lsh_neardup_pairs(_t(sf_dir, "embeddings"), dim=64, threshold=0.3)


def q_lsh_ann_topk(sf_dir: str) -> rd.Dataset:
    """Approximate LSH-bucketed ANN top-k (the scale path next to the
    exact ann_cosine_topk; recall < 1 by construction, checked against
    the independent single-process golden)."""
    import pyarrow.parquet as pq

    from belb_ray.stages.ann import lsh_bucket_topk

    emb = pq.read_table(f"{sf_dir.rstrip('/')}/embeddings.parquet")
    queries = emb.filter(pa.compute.less(emb["vec_id"], pa.scalar(16)))
    return lsh_bucket_topk(_t(sf_dir, "embeddings"), queries, k=5)


def q_ivf_ann_topk(sf_dir: str) -> rd.Dataset:
    """IVF coarse-quantizer approximate ANN top-k (kmeans cells trained
    on a deterministic id-keyed sample; recall < 1, checked against the
    independent single-process golden)."""
    import pyarrow.parquet as pq

    from belb_ray.stages.ann import ivf_topk

    emb = pq.read_table(f"{sf_dir.rstrip('/')}/embeddings.parquet")
    queries = emb.filter(pa.compute.less(emb["vec_id"], pa.scalar(16)))
    return ivf_topk(_t(sf_dir, "embeddings"), queries, k=5)


def q_multimodal_features(sf_dir: str) -> rd.Dataset:
    """Multimodal plumbing: binary payload column → actor-pool featurize
    (decode stubbed deterministically — no image libs in this container)."""
    from belb_ray.stages.multimodal import featurize_images

    binary = _t(sf_dir, "documents").map_batches(
        lambda t: pa.table({
            "item_id": t["doc_id"],
            "payload": pa.array([s.encode() for s in t["text"].to_pylist()],
                                pa.binary())}),
        batch_format="pyarrow")
    out = featurize_images(binary, feat_dim=16)
    return out.map_batches(
        lambda t: pa.table({"item_id": t["item_id"],
                            "width": t["width"], "height": t["height"]}),
        batch_format="pyarrow")


def q_bm25_rerank(sf_dir: str) -> rd.Dataset:
    """Retrieval-then-rerank composition: cheap BM25 recall stage
    (k=25 candidates) → text attach (broadcast join) → cross-encoder
    actor-pool scoring (stages/embed.CrossEncoderReranker, model loads
    once per actor; deterministic stand-in = cosine of the shared
    fake-embed kernel) → final top-10 by (rerank_score desc, doc_id).
    Only the 25-candidate sliver reaches the model — the corpus never
    does. Oracle = pinned golden from the independent single-process
    composition (tools/make_goldens.py golden_bm25_rerank)."""
    from belb_ray.stages.embed import rerank_pairs
    from belb_ray.stages.joins import broadcast_join
    from belb_ray.stages.search import bm25_topk

    docs = _t(sf_dir, "documents")
    cand = bm25_topk(docs, list(BM25_TERMS), k=25)
    with_text = broadcast_join(cand, docs.select_columns(
        ["doc_id", "text"]), "doc_id")
    query = " ".join(BM25_TERMS)
    paired = with_text.map_batches(
        lambda t: t.append_column(
            "query", pa.array([query] * t.num_rows, pa.string())),
        batch_format="pyarrow")
    scored = rerank_pairs(paired, dim=32, seed=5)
    out = scored.map_batches(
        lambda t: t.select(["doc_id", "score", "rerank_score"]),
        batch_format="pyarrow")
    return out.sort(["rerank_score", "doc_id"],
                    descending=[True, False]).limit(10)


def q_golden_records(sf_dir: str) -> rd.Dataset:
    """Golden-record survivorship (stages/survivorship.golden_records):
    one consolidated record per customer over their orders — priority
    and status survive by MODE (tie -> min value), totalprice by MAX,
    orderdate by LATEST. One partial pass + one bucketed single-int
    shuffle; reference analog is the synset preferred-name selection
    (belb/kbs/kb.py) generalized to per-column rules."""
    from belb_ray.stages.survivorship import golden_records

    out = golden_records(_t(sf_dir, "orders"), "o_custkey", {
        "o_orderpriority": "mode",
        "o_orderstatus": "mode",
        "o_totalprice": "max",
        "o_orderdate": "max",
    })
    return out.sort("o_custkey")


def q_cluster_quality(sf_dir: str) -> rd.Dataset:
    """Pairwise + B-cubed cluster-quality scoring (stages/ereval.
    cluster_quality): predicted clustering = 100-char length bucket,
    gold = lang, over documents. Pure contingency-cell math — the
    quadratic pair set is never materialized (C(n,2) sums over cell
    counts). Reference analog: corpus-level evaluation subsets
    (belb/corpora/corpus.py; SURVEY §2.5 A11) lifted to cluster
    metrics."""
    from belb_ray.stages.ereval import cluster_quality

    docs = _t(sf_dir, "documents")

    def _pred(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.append_column(
            "pred", pc.divide(t["n_chars"], pa.scalar(100, pa.int64())))

    labeled = docs.select_columns(["n_chars", "lang"]).map_batches(
        _pred, batch_format="pyarrow")
    out = cluster_quality(labeled, "pred", "lang")
    return _round_cols(out, {c: 6 for c in (
        "pair_precision", "pair_recall", "pair_f1",
        "bcubed_precision", "bcubed_recall", "bcubed_f1")})


def q_clustering_diff(sf_dir: str) -> rd.Dataset:
    """Split/merge audit + Adjusted Rand Index between two clusterings
    (stages/ereval.clustering_diff, Hubert & Arabie 1985): clustering A
    = exact-text groups, clustering B = 40-char-prefix groups over
    documents — the blocking-key-sensitivity change report an ER re-run
    emits. Labels are 64-bit text hashes on the Ray side (the metrics
    are label-invariant; at 100 TB the wide text column never enters the
    shuffle), raw strings in the SQL oracle."""
    from belb_ray.stages.ereval import clustering_diff

    docs = _t(sf_dir, "documents", columns=["text"])

    def _lab(b: pd.DataFrame) -> pd.DataFrame:
        txt = np.asarray(b["text"], object)
        pre = np.asarray([t[:40] for t in b["text"]], object)
        return pd.DataFrame({
            "a": pd.util.hash_array(txt, categorize=False).view(np.int64),
            "b": pd.util.hash_array(pre, categorize=False).view(np.int64)})

    out = clustering_diff(docs.map_batches(_lab, batch_format="pandas"),
                          "a", "b")
    return _round_cols(out, {"ari": 6})


def q_substring_dup_stats(sf_dir: str) -> rd.Dataset:
    """Exact substring duplication stats (stages/gramdedup.
    cross_doc_gram_stats): per-doc counts of 8-token windows that occur
    >= 2 times corpus-wide (Lee et al. 2022 exact-substring dedup at
    window granularity). Token-hash rolling fingerprints — the window
    text never ships; two bucketed single-int shuffles total."""
    from belb_ray.stages.gramdedup import cross_doc_gram_stats

    out = cross_doc_gram_stats(_t(sf_dir, "documents"), "doc_id",
                               "text", k=8)
    return out.sort("doc_id")


def q_waterfall_match(sf_dir: str) -> rd.Dataset:
    """MDM waterfall (cascade) matching (stages/mdm.waterfall_match):
    customers matched to a deterministic supplier representative —
    level 1 on (nationkey, acctbal-thousands band), level 2 on
    nationkey alone; min-suppkey wins per key; level recorded.
    Reference analog: the id → history → homonym resolution chain
    (belb/kbs/kb.py, SURVEY §2.4 J2-J4). Level maps broadcast once;
    the customer side never shuffles."""
    from belb_ray.stages.mdm import waterfall_match

    def _ckey(t: pa.Table) -> pa.Table:
        band = pc.cast(pc.floor(pc.divide(t["c_acctbal"],
                                          pa.scalar(1000.0))), pa.int64())
        return t.append_column("acct_band", band)

    def _skey(t: pa.Table) -> pa.Table:
        band = pc.cast(pc.floor(pc.divide(t["s_acctbal"],
                                          pa.scalar(1000.0))), pa.int64())
        return t.append_column("acct_band", band)

    cust = _t(sf_dir, "customer").map_batches(_ckey, batch_format="pyarrow")
    supp = _t(sf_dir, "supplier").map_batches(_skey, batch_format="pyarrow")
    out = waterfall_match(
        cust, supp,
        levels=[(["c_nationkey", "acct_band"], ["s_nationkey", "acct_band"]),
                (["c_nationkey"], ["s_nationkey"])],
        right_id="s_suppkey")
    return (out.select_columns(["c_custkey", "match_id", "match_level"])
            .sort("c_custkey"))


def q_id_crosswalk(sf_dir: str) -> rd.Dataset:
    """Transitive id crosswalk with ambiguity accounting (stages/mdm.
    id_crosswalk): part → supplier (lineitem, many-to-many) → nation
    (supplier): per part the distinct reachable nations, min-nation
    representative, and an ambiguity flag. Reference analog: the
    PMCID→PMID→document bridge (SURVEY §2.4 J6). Both hops collapse in
    combiner passes; the A→C blowup never hits the driver."""
    from belb_ray.stages.mdm import id_crosswalk

    supp = (_t(sf_dir, "supplier")
            .select_columns(["s_suppkey", "s_nationkey"])
            .rename_columns({"s_suppkey": "l_suppkey"}))
    out = id_crosswalk(_t(sf_dir, "lineitem"), supp,
                       "l_partkey", "l_suppkey", "s_nationkey")

    def _names(t: pa.Table) -> pa.Table:
        return t.rename_columns(["l_partkey", "n_nations", "rep_nation",
                                 "ambiguous"])

    return out.map_batches(_names, batch_format="pyarrow").sort("l_partkey")


def q_score_calibration(sf_dir: str) -> rd.Dataset:
    """Linkage-score reliability curve + ECE (stages/ereval.
    calibration_curve): score = clipped events.value/200, label =
    purchase-or-click; 10 equal-width bins, one fixed-width-bin
    combiner shuffle. The post-scoring QA step for any probabilistic
    matcher (Fellegi-Sunter weights, JW scores)."""
    from belb_ray.stages.ereval import calibration_curve

    def _prep(t: pa.Table) -> pa.Table:
        s = pc.min_element_wise(
            pc.max_element_wise(pc.divide(t["value"], pa.scalar(200.0)),
                                pa.scalar(0.0)), pa.scalar(1.0))
        y = pc.cast(pc.is_in(t["event_type"],
                             value_set=pa.array(["purchase", "click"])),
                    pa.int64())
        return pa.table({"score": s, "label": y})

    ev = _t(sf_dir, "events").map_batches(_prep, batch_format="pyarrow")
    out = calibration_curve(ev, "score", "label", n_bins=10)
    return _round_cols(out.sort("bin"), {"mean_score": 6, "event_rate": 6,
                                         "abs_gap": 6, "ece": 6})


def q_cannot_link_audit(sf_dir: str) -> rd.Dataset:
    """Cannot-link constraint audit (stages/ereval.cannot_link_audit):
    predicted clusters = 100-char doc length bucket; cannot-link pairs
    = (doc_id, doc_id+1) for every third doc — pairs whose members
    share a bucket are resolution errors, counted per cluster. Two
    narrow-pair hash joins + one combiner; the assignment table never
    broadcasts."""
    from belb_ray.stages.ereval import cannot_link_audit

    docs = _t(sf_dir, "documents")

    def _pred(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t["doc_id"],
            "cluster": pc.divide(t["n_chars"], pa.scalar(100, pa.int64()))})

    clusters = docs.map_batches(_pred, batch_format="pyarrow")

    def _pairs(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        keep = ids % 3 == 0
        return pa.table({"id_a": pa.array(ids[keep], pa.int64()),
                         "id_b": pa.array(ids[keep] + 1, pa.int64())})

    pairs = docs.select_columns(["doc_id"]).map_batches(
        _pairs, batch_format="pyarrow")
    out = cannot_link_audit(clusters, pairs, "doc_id", "cluster")
    return out.sort("cluster")


def q_source_accuracy(sf_dir: str) -> rd.Dataset:
    """Truth-discovery-lite source scoring (stages/mdm.source_accuracy):
    per-cluster majority lang (100-char length buckets) is the working
    truth; each document source scored by its agreement rate. One
    mode_agg combiner + broadcast-or-join attach + one tally combiner.
    Reference analog: the QAQC disagreement counters (SURVEY §2.5 A10)
    lifted to per-source reliability."""
    from belb_ray.stages.mdm import source_accuracy

    docs = _t(sf_dir, "documents")

    def _prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "cl": pc.divide(t["n_chars"], pa.scalar(100, pa.int64())),
            "lang": t["lang"], "source": t["source"]})

    ds = docs.map_batches(_prep, batch_format="pyarrow")
    out = source_accuracy(ds, "cl", "lang", "source")
    return _round_cols(out.sort("source"), {"accuracy": 6})


def q_upsample_exact(sf_dir: str) -> rd.Dataset:
    """O4 exact-shuffle upsampling (stages/sampling.
    seeded_upsample_chunks): per-user stdlib Fisher-Yates over sorted
    event ids, chunked at 20 — reference corpus.py:381-410 semantics
    with per-group seeding (the documented deviation; the reference's
    global-random-state order is unreproducible distributed). Oracle =
    pinned golden from an independent single-process driver loop."""
    from belb_ray.stages.sampling import seeded_upsample_chunks

    return seeded_upsample_chunks(_t(sf_dir, "events"), "user_id",
                                  "event_id", max_chunk=20, seed=9)


def q_text_embeddings(sf_dir: str) -> rd.Dataset:
    """Model-in-``__init__`` actor-pool inference (stages/embed.
    TextEmbedder — the GPU-shaped text twin of multimodal_features):
    the deterministic stand-in checkpoint loads once per actor, batches
    stream through the pool. Oracle = pinned golden computed by the
    SAME model kernel run single-process over the whole corpus
    (tools/make_goldens.py golden_text_embeddings; encode accumulates
    per-row in token order, so batching cannot drift the hashes)."""
    from belb_ray.stages.embed import embed_texts

    dim = 8
    out = embed_texts(_t(sf_dir, "documents"), dim=dim, seed=11)

    def _flat(t: pa.Table) -> pa.Table:
        emb = round_half_away(t["embedding"].combine_chunks().flatten()
                       .to_numpy(zero_copy_only=False)
                       .astype(np.float64).reshape(-1, dim), 6)
        cols = {"doc_id": t["doc_id"]}
        for j in range(dim):
            cols[f"e{j}"] = pa.array(emb[:, j], pa.float64())
        return pa.table(cols)

    return out.map_batches(_flat, batch_format="pyarrow")


def q_asof_snapshot(sf_dir: str) -> rd.Dataset:
    """Backward as-of join: every non-snapshot event picks up the latest
    snapshot-event (event_id % 5 == 0) of the same user at-or-before its
    timestamp (stages/asof.py — temporal-join extension; one bucketed
    shuffle + per-bucket vectorized merge_asof)."""
    from belb_ray.stages.asof import asof_join

    def _split(want_snapshot: bool):
        def fn(t: pa.Table) -> pa.Table:
            ids = t["event_id"].to_numpy(zero_copy_only=False)
            is_snap = pa.array(ids % 5 == 0)
            return t.filter(is_snap if want_snapshot
                            else pa.compute.invert(is_snap))
        return fn

    ev = _t(sf_dir, "events")
    left = (ev.map_batches(_split(False), batch_format="pyarrow")
              .select_columns(["event_id", "user_id", "ts", "value"]))
    right = (ev.map_batches(_split(True), batch_format="pyarrow")
               .select_columns(["user_id", "ts", "value"]))
    return asof_join(left, right, key="user_id", ts="ts", inner=True,
                     num_buckets=16)


def q_top_orders_per_customer(sf_dir: str) -> rd.Dataset:
    """Per-group top-k without a global sort (stages/agg.py grouped_topk:
    per-block local head-k, then one bucketed combine — at most k rows
    per key per block enter the shuffle)."""
    from belb_ray.stages.agg import grouped_topk

    orders = _t(sf_dir, "orders", columns=["o_custkey", "o_orderkey", "o_totalprice"])
    return grouped_topk(orders, keys=["o_custkey"],
                        order_col="o_totalprice", k=3, descending=True,
                        tiebreak="o_orderkey")


BM25_TERMS = ("hash", "join", "window")


def q_bm25_search(sf_dir: str) -> rd.Dataset:
    """BM25 keyword top-k over documents (stages/search.py — two
    streaming passes: per-block df/len partials, then broadcast idf +
    vectorized scoring with local top-k)."""
    from belb_ray.stages.search import bm25_topk

    return bm25_topk(_t(sf_dir, "documents"), list(BM25_TERMS), k=25)


def q_semantic_dedup(sf_dir: str) -> rd.Dataset:
    """SemDeDup-style cluster-then-prune embedding dedup
    (stages/semdedup.py): kmeans cells bound the O(n^2) cosine check;
    golden from the independent brute-force oracle."""
    from belb_ray.stages.semdedup import semantic_dedup

    return semantic_dedup(_t(sf_dir, "embeddings"), n_cells=8,
                          threshold=0.35)


def q_hll_distinct_users(sf_dir: str) -> rd.Dataset:
    """HyperLogLog approximate distinct users per event type
    (stages/sketch.py): register maxes + integer harmonic sum make the
    distributed estimate bit-identical to the SQL re-derivation."""
    from belb_ray.stages.sketch import hll_sketch

    return hll_sketch(_t(sf_dir, "events"), "event_type", "user_id",
                      p=9, seed=0)


def q_heavy_hitter_tokens(sf_dir: str) -> rd.Dataset:
    """Exact phi-heavy-hitter tokens over the document corpus at sketch
    cost (stages/sketch.py): per-block Misra-Gries candidate superset +
    one exact recount pass — output is the true heavy-hitter set."""
    import re

    from belb_ray.stages.sketch import heavy_hitters

    pat = re.compile(r"[a-z0-9]+")

    def _explode(t: pa.Table) -> pa.Table:
        toks: list[str] = []
        for txt in t["text"].to_pylist():
            toks.extend(pat.findall((txt or "").lower()))
        return pa.table({"token": pa.array(toks, pa.string())})

    tokens = _t(sf_dir, "documents").map_batches(
        _explode, batch_format="pyarrow")
    return heavy_hitters(tokens, "token", phi=0.03)


def q_tfidf_top_terms(sf_dir: str) -> rd.Dataset:
    """Top-3 tf·idf terms per document (stages/tfidf.py — no-shuffle tf,
    combiner df over the vocabulary, size-aware idf broadcast, per-doc
    top-k via grouped_topk)."""
    from belb_ray.stages.tfidf import tfidf_top_terms

    return tfidf_top_terms(_t(sf_dir, "documents"), k=3)


def q_user_event_windows(sf_dir: str) -> rd.Dataset:
    """Per-user ordered analytic windows over the event stream
    (stages/analytic.py): lag/lead of value, exact integer running sum
    (cents), row_number — one co-location shuffle, vectorized
    whole-bucket kernels with key-boundary masks. Order is total via the
    (ts, event_id) tiebreak; running sums are int64 cents so the value
    hash is bit-identical to SQL BIGINT window sums."""
    import pandas as pd

    from belb_ray.stages.analytic import ordered_window

    events = _t(sf_dir, "events", columns=["event_id", "ts", "user_id", "value"])

    def _cents(batch: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        batch["cents"] = round_half_away(
            batch["value"].to_numpy() * 100.0).astype(np.int64)
        return batch

    out = ordered_window(
        events.map_batches(_cents, batch_format="pandas"),
        key="user_id", order_cols=["ts", "event_id"],
        specs=[("lag", "value", "prev_value"),
               ("lead", "value", "next_value"),
               ("cumsum", "cents", "cum_cents"),
               ("row_number", "", "rn")])
    return out.select_columns(
        ["event_id", "user_id", "prev_value", "next_value",
         "cum_cents", "rn"])


def q_user_event_rolling(sf_dir: str) -> rd.Dataset:
    """Per-user rolling 5-row frames (SQL ROWS BETWEEN 4 PRECEDING AND
    CURRENT ROW): exact int64 rolling sum via clamped cumsum differences,
    rolling min/max via pandas' O(n) monotonic-deque kernels — all in
    the same single co-location shuffle as the other window kinds."""
    import pandas as pd

    from belb_ray.stages.analytic import ordered_window

    events = _t(sf_dir, "events", columns=["event_id", "ts", "user_id", "value"])

    def _cents(batch: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        batch["cents"] = round_half_away(
            batch["value"].to_numpy() * 100.0).astype(np.int64)
        return batch.drop(columns=["value"])

    out = ordered_window(
        events.map_batches(_cents, batch_format="pandas"),
        key="user_id", order_cols=["ts", "event_id"],
        specs=[("rollsum", "cents", "roll_sum", 5),
               ("rollmin", "cents", "roll_min", 5),
               ("rollmax", "cents", "roll_max", 5)])
    return out.select_columns(
        ["event_id", "user_id", "roll_sum", "roll_min", "roll_max"])


def q_event_value_quantiles(sf_dir: str) -> rd.Dataset:
    """Exact per-event-type discrete quantiles of value cents
    (stages/analytic.grouped_quantiles): per-block (key, value)→count
    combiner BEFORE the shuffle (exchange moves histograms, not rows),
    then all-keys-at-once vectorized rank selection over cumulative
    counts. quantile_disc picks an existing element — no float
    arithmetic — so the hash matches SQL bit-for-bit."""
    import pandas as pd

    from belb_ray.stages.analytic import grouped_quantiles

    events = _t(sf_dir, "events", columns=["event_type", "value"])

    def _cents(batch: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        batch["cents"] = round_half_away(
            batch["value"].to_numpy() * 100.0).astype(np.int64)
        return batch.drop(columns=["value"])

    return grouped_quantiles(
        events.map_batches(_cents, batch_format="pandas"),
        key="event_type", value_col="cents",
        specs=[(0.25, "p25"), (0.5, "p50"), (0.75, "p75"),
               (0.95, "p95")])


def q_user_value_ranks(sf_dir: str) -> rd.Dataset:
    """Ranking window functions per user ordered by spend
    (stages/analytic.py rank/dense_rank/ntile/first_value/last_value):
    same single co-location shuffle and whole-bucket vectorized kernels
    as the other window kinds — tie runs found by one shifted compare,
    rank via max-accumulate of run starts, ntile by the SQL
    remainder-to-first-tiles rule. Mirrors RANK()/DENSE_RANK()/NTILE(4)/
    first_value/last_value OVER (PARTITION BY user ORDER BY cents)."""
    import pandas as pd

    from belb_ray.stages.analytic import ordered_window

    events = _t(sf_dir, "events", columns=["event_id", "user_id", "value"])

    def _cents(batch: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        batch["cents"] = round_half_away(
            batch["value"].to_numpy() * 100.0).astype(np.int64)
        return batch.drop(columns=["value"])

    out = ordered_window(
        events.map_batches(_cents, batch_format="pandas"),
        key="user_id", order_cols=["cents", "event_id"],
        specs=[("rank", "cents", "rnk"),
               ("dense_rank", "cents", "drnk"),
               ("ntile", "", "quartile", 4),
               ("first_value", "event_id", "cheapest_event"),
               ("last_value", "event_id", "dearest_event")])
    return out.select_columns(
        ["event_id", "user_id", "rnk", "drnk", "quartile",
         "cheapest_event", "dearest_event"])


def q_event_daily_pivot(sf_dir: str) -> rd.Dataset:
    """Daily × event-type pivot (stages/agg.pivot_agg): the pivot runs
    INSIDE the per-block partial, so the shuffle moves one wide row per
    (day, block) — never the events — and the combine is the standard
    bucketed sum. Mirrors SQL count(*) FILTER (WHERE ...) GROUP BY."""
    import pandas as pd

    from belb_ray.stages.agg import pivot_agg

    events = _t(sf_dir, "events", columns=["ts", "event_type"])

    def _day(batch: pd.DataFrame) -> pd.DataFrame:
        batch["day"] = batch["ts"].dt.strftime("%Y-%m-%d")
        return batch.drop(columns=["ts"])

    return pivot_agg(
        events.map_batches(_day, batch_format="pandas"),
        row_key="day", col_key="event_type",
        values=["click", "view", "purchase", "signup", "error"],
        agg="count", prefix="n_")


def q_customer_order_counts(sf_dir: str) -> rd.Dataset:
    """Large×large LEFT OUTER hash join (stages/joins.py
    hash_partition_join join_type='left outer': pyarrow per-bucket join
    keeps customers with no orders as nulls), then a combiner count of
    non-null order keys — customers with zero orders survive with 0."""
    import pandas as pd

    from belb_ray.stages.agg import preagg_groupby
    from belb_ray.stages.joins import hash_partition_join

    customer = _t(sf_dir, "customer", columns=["c_custkey"])
    orders = _t(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])

    def _ren(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.rename(columns={"o_custkey": "c_custkey"})

    joined = hash_partition_join(
        customer, orders.map_batches(_ren, batch_format="pandas"),
        key="c_custkey", join_type="left outer")

    def _ind(batch: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        batch["__has"] = batch["o_orderkey"].notna().astype(np.int64)
        return batch[["c_custkey", "__has"]]

    out = preagg_groupby(
        joined.map_batches(_ind, batch_format="pandas"),
        keys=["c_custkey"], specs=[("sum", "__has", "n_orders")])
    return out


def q_event_overlaps(sf_dir: str) -> rd.Dataset:
    """Per-user interval-overlap join (stages/rangejoin.py): click
    intervals [ts, ts + floor(value·240) s] × purchase intervals, joined
    on closed-interval overlap with user equality. Both sides explode
    over 24 h bins (duration ≤ 33 h → ≤3 copies/row), ONE bucketed shuffle
    on hash(user, bin), per-bucket vectorized sweep, exact-once emission
    via the max-start anchor bin. floor (not round) keeps the duration
    arithmetic bit-identical to the SQL CAST(floor(value) AS BIGINT)."""
    import pandas as pd

    from belb_ray.stages.rangejoin import interval_join

    events = _t(sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type", "value"])

    def _mk(etype: str, idname: str):
        def _prep(b: pd.DataFrame) -> pd.DataFrame:
            import numpy as np

            b = b[b["event_type"] == etype]
            dur = np.floor(b["value"].to_numpy() * 240.0).astype(np.int64)
            return pd.DataFrame({
                idname: b["event_id"].to_numpy(),
                "user_id": b["user_id"].to_numpy(),
                "start": b["ts"].to_numpy(),
                "stop": (b["ts"] + pd.to_timedelta(dur, unit="s")
                         ).to_numpy(),
            })
        return _prep

    clicks = events.map_batches(_mk("click", "click_id"),
                                batch_format="pandas")
    purchases = events.map_batches(_mk("purchase", "purchase_id"),
                                   batch_format="pandas")
    out = interval_join(clicks, purchases, "start", "stop", "start",
                        "stop", key="user_id",
                        bin_width=86_400 * 1_000_000)
    return out.select_columns(["click_id", "purchase_id", "user_id"])


def q_hourly_distinct_users(sf_dir: str) -> rd.Dataset:
    """Exact COUNT(DISTINCT user) per (hour, event_type): tumbling-window
    key assignment + stages/agg.count_distinct — batch-local dedup of
    (window, type, user) means the shuffle moves distinct triples per
    block, never events; one bucketed shuffle keyed on (window, type)
    finishes the exact nunique (vs hll_distinct_users' sketch path)."""
    import pandas as pd

    from belb_ray.stages.agg import count_distinct

    events = _t(sf_dir, "events", columns=["ts", "event_type", "user_id"])

    def _win(batch: pd.DataFrame) -> pd.DataFrame:
        batch["window_start"] = batch["ts"].dt.floor("h").dt.strftime(
            "%Y-%m-%d %H:%M:%S")
        return batch[["window_start", "event_type", "user_id"]]

    windowed = events.map_batches(_win, batch_format="pandas",
                                  batch_size=65536)
    return count_distinct(windowed, ["window_start", "event_type"],
                          "user_id", "n_users")


def q_parts_never_ordered(sf_dir: str) -> rd.Dataset:
    """SQL EXCEPT set-op (stages/setops.py): distinct part keys absent
    from the high-quantity lineitems — the reference's notinkb anti-join
    (belb/kbs/query.py) as pure set algebra over two large sides (no
    broadcast, one co-location shuffle of locally-deduped keys)."""
    from belb_ray.stages.setops import set_except

    import pyarrow.dataset as pads

    part = _t(sf_dir, "part", columns=["p_partkey"])
    li = _t_where(sf_dir, "lineitem",
                  pads.field("l_quantity") >= 48.0,
                  columns=["l_partkey", "l_quantity"]
                  ).select_columns(["l_partkey"])
    out = set_except(part, li, ["p_partkey"], b_cols=["l_partkey"])

    def _ren(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.rename(columns={"p_partkey": "partkey"})

    return out.map_batches(_ren, batch_format="pandas")


def q_supplier_customer_nations(sf_dir: str) -> rd.Dataset:
    """SQL INTERSECT set-op: nation keys present on BOTH the supplier and
    customer sides (stages/setops.set_intersect, same single-shuffle
    distinct-key engine as EXCEPT)."""
    from belb_ray.stages.setops import set_intersect

    sup = _t(sf_dir, "supplier", columns=["s_nationkey"])
    cust = _t(sf_dir, "customer", columns=["c_nationkey"])
    out = set_intersect(sup, cust, ["s_nationkey"],
                        b_cols=["c_nationkey"])

    def _ren(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.rename(columns={"s_nationkey": "nationkey"})

    return out.map_batches(_ren, batch_format="pandas")


def q_user_modal_event_type(sf_dir: str) -> rd.Dataset:
    """Per-user modal event type (stages/agg.mode_agg): deterministic
    mode with smallest-value tie-break; combiner ships per-block distinct
    (user, type) counts, one bucketed shuffle, vectorized arg-max."""
    from belb_ray.stages.agg import mode_agg

    events = _t(sf_dir, "events", columns=["user_id", "event_type"])
    return mode_agg(events, ["user_id"], "event_type", "modal_type")


def q_user_value_stats(sf_dir: str) -> rd.Dataset:
    """Per-user count/mean/var/std of event value via raw-moment shipping
    (stages/agg.moment_stats): blocks emit (n, Σx, Σx²) per key — fixed
    width, never rows — one bucketed sum-combine, closed-form finish.
    Compared to the oracle at 4dp (naive vs Welford fp differences sit
    far below that)."""
    from belb_ray.stages.agg import moment_stats

    events = _t(sf_dir, "events", columns=["user_id", "value"])
    out = moment_stats(events, ["user_id"], "value", decimals=2)
    return _round_cols(out, {"mean": 4, "var": 4, "std": 4})


def q_lineitem_corr(sf_dir: str) -> rd.Dataset:
    """Per-returnflag Pearson corr(extendedprice, discount)
    (stages/agg.grouped_corr): blocks ship six raw moments per key, one
    bucketed combine, closed-form finish; 4dp oracle compare."""
    from belb_ray.stages.agg import grouped_corr

    li = _t(sf_dir, "lineitem", columns=["l_returnflag", "l_extendedprice", "l_discount"])
    out = grouped_corr(li, ["l_returnflag"], "l_extendedprice",
                       "l_discount", out_col="price_discount_corr")
    return _round_cols(out, {"price_discount_corr": 4})


def q_event_rollup(sf_dir: str) -> rd.Dataset:
    """GROUP BY ROLLUP(event_type, day) totals (stages/agg.rollup_agg):
    input aggregated once at the finest level, every coarser level —
    through the grand total — re-aggregates that small RESULT; rolled-up
    keys carry 'ALL' (SQL mirror: COALESCE after ROLLUP). Cents int64
    keeps sums exact for the BIGINT hash compare."""
    import numpy as np

    from belb_ray.stages.agg import rollup_agg

    def _prep(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_type": batch["event_type"],
            "day": batch["ts"].dt.strftime("%Y-%m-%d"),
            "cents": round_half_away(batch["value"].to_numpy() * 100.0)
            .astype(np.int64),
        })

    ev = _t(sf_dir, "events", columns=["event_type", "ts", "value"]).map_batches(
        _prep, batch_format="pandas", batch_size=65536)
    return rollup_agg(ev, ["event_type", "day"], [
        ("count", "", "n_events"),
        ("sum", "cents", "sum_cents"),
    ])


def q_event_value_percentiles(sf_dir: str) -> rd.Dataset:
    """Continuous (interpolated) per-event-type percentiles —
    quantile_cont — via the same histogram-shuffle engine as the
    discrete path (grouped_quantiles(interpolate=True)): the selection
    gathers the two bracketing ranks per key and blends linearly;
    compared to the oracle at 4dp."""
    from belb_ray.stages.analytic import grouped_quantiles

    events = _t(sf_dir, "events", columns=["event_type", "value"])
    out = grouped_quantiles(
        events, key="event_type", value_col="value",
        specs=[(0.25, "p25"), (0.5, "p50"), (0.75, "p75"),
               (0.99, "p99")], interpolate=True)
    return _round_cols(out, {"p25": 4, "p50": 4, "p75": 4, "p99": 4})


def q_event_cube(sf_dir: str) -> rd.Dataset:
    """GROUP BY CUBE(event_type, day) totals (stages/agg.cube_agg): the
    input is aggregated ONCE at the finest level and every other
    grouping set (including the by-day-alone set ROLLUP misses)
    re-aggregates that small RESULT; rolled-up keys carry 'ALL' (SQL
    mirror: COALESCE after CUBE). Cents int64 keeps sums exact for the
    BIGINT hash compare."""
    import numpy as np

    from belb_ray.stages.agg import cube_agg

    def _prep(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_type": batch["event_type"],
            "day": batch["ts"].dt.strftime("%Y-%m-%d"),
            "cents": round_half_away(batch["value"].to_numpy() * 100.0)
            .astype(np.int64),
        })

    ev = _t(sf_dir, "events", columns=["event_type", "ts", "value"]).map_batches(
        _prep, batch_format="pandas", batch_size=65536)
    return cube_agg(ev, ["event_type", "day"], [
        ("count", "", "n_events"),
        ("sum", "cents", "sum_cents"),
    ])


def q_user_value_pctl(sf_dir: str) -> rd.Dataset:
    """Distribution window functions per user ordered by spend
    (stages/analytic.py percent_rank/cume_dist/nth_value): same single
    co-location shuffle and whole-bucket vectorized kernels as the
    ranking kinds — percent_rank blends the tie-run start rank into
    (rank-1)/(rows-1), cume_dist uses the tie-run END index, nth_value
    gathers the partition's Nth ordered row with a null mask for short
    partitions (emitted as float64 so the SQL NULL→NaN compare is
    representation-identical)."""
    import numpy as np

    from belb_ray.stages.analytic import ordered_window

    events = _t(sf_dir, "events", columns=["event_id", "user_id", "value"])

    def _cents(batch: pd.DataFrame) -> pd.DataFrame:
        batch["cents"] = round_half_away(
            batch["value"].to_numpy() * 100.0).astype(np.int64)
        return batch.drop(columns=["value"])

    out = ordered_window(
        events.map_batches(_cents, batch_format="pandas"),
        key="user_id", order_cols=["cents", "event_id"],
        specs=[("percent_rank", "cents", "pr"),
               ("cume_dist", "cents", "cd"),
               ("nth_value", "event_id", "third_cheapest", 3)])

    def _cast(batch: pd.DataFrame) -> pd.DataFrame:
        batch["third_cheapest"] = batch["third_cheapest"].astype(
            "float64")
        return batch[["event_id", "user_id", "pr", "cd",
                      "third_cheapest"]]

    out = out.map_batches(_cast, batch_format="pandas")
    return _round_cols(out, {"pr": 6, "cd": 6})


def q_user_event_paths(sf_dir: str) -> rd.Dataset:
    """Ordered per-user event-type journey string
    (stages/analytic.grouped_string_agg): one hash-bucket co-location
    shuffle, one stable whole-bucket sort, grouped join — mirrors SQL
    string_agg(event_type, ',' ORDER BY ts, event_id). The output
    string is O(user's events); the shuffle moves each event row
    exactly once."""
    from belb_ray.stages.analytic import grouped_string_agg

    events = _t(sf_dir, "events", columns=["user_id", "event_type", "ts", "event_id"])
    return grouped_string_agg(events, key="user_id",
                              value_col="event_type",
                              order_cols=["ts", "event_id"],
                              sep=",", out_col="journey")


def q_event_grouping_sets(sf_dir: str) -> rd.Dataset:
    """GROUP BY GROUPING SETS ((event_type), (day), ()) — the general
    form of ROLLUP/CUBE (stages/agg.grouping_sets_agg): input aggregated
    ONCE at the finest (event_type, day) level, each requested set
    re-aggregates that small materialized result. Deliberately neither a
    rollup prefix chain nor the full cube (it omits the finest set).
    Rolled-up keys carry 'ALL'; cents int64 keeps sums exact."""
    import numpy as np

    from belb_ray.stages.agg import grouping_sets_agg

    def _prep(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_type": batch["event_type"],
            "day": batch["ts"].dt.strftime("%Y-%m-%d"),
            "cents": round_half_away(batch["value"].to_numpy() * 100.0)
            .astype(np.int64),
        })

    ev = _t(sf_dir, "events", columns=["event_type", "ts", "value"]).map_batches(
        _prep, batch_format="pandas", batch_size=65536)
    return grouping_sets_agg(
        ev, ["event_type", "day"],
        [("event_type",), ("day",), ()],
        [("count", "", "n_events"), ("sum", "cents", "sum_cents")])


def q_user_value_shape(sf_dir: str) -> rd.Dataset:
    """Per-user population skewness / excess kurtosis of event value
    (stages/agg.higher_moment_stats): blocks ship five raw moments per
    key (fixed width, never rows), one bucketed sum-combine, closed-form
    finish. Oracle mirrors the central-moment arithmetic from
    SUM(x..x⁴)/COUNT expression-for-expression; 4dp compare."""
    from belb_ray.stages.agg import higher_moment_stats

    events = _t(sf_dir, "events", columns=["user_id", "value"])
    out = higher_moment_stats(events, ["user_id"], "value", decimals=2)
    return _round_cols(out, {"mean": 4, "skew": 4, "kurt": 4})


def q_part_attributes_long(sf_dir: str) -> rd.Dataset:
    """Wide→long UNPIVOT of part's numeric attributes
    (stages/reshape.unpivot): zero-shuffle map_batches melt — each input
    row yields one output row per value column; streams at any scale."""
    from belb_ray.stages.reshape import unpivot

    part = _t(sf_dir, "part", columns=["p_partkey", "p_size", "p_retailprice"])
    return unpivot(part, ["p_partkey"], ["p_size", "p_retailprice"],
                   var_name="attribute", value_name="value")


def q_order_item_balance(sf_dir: str) -> rd.Dataset:
    """Large-large FULL OUTER hash-partitioned join: big orders (>300k)
    vs high-quantity item revenue per orderkey — each side has keys the
    other lacks, so both null-extension paths are exercised. Same
    one-shuffle manual partition join as the inner/left paths
    (stages/joins.hash_partition_join, pyarrow full-outer per bucket);
    nulls are coalesced to sentinels so the hash compare is stable."""
    from belb_ray.stages.agg import preagg_groupby
    from belb_ray.stages.joins import hash_partition_join

    import pyarrow.dataset as pads

    big = _t_where(
        sf_dir, "orders", pads.field("o_totalprice") > 300000,
        columns=["o_orderkey", "o_orderpriority", "o_totalprice"],
    ).map_batches(
        lambda t: pa.table({"orderkey": t["o_orderkey"],
                            "o_orderpriority": t["o_orderpriority"]}),
        batch_format="pyarrow")
    def _cents(t: pa.Table) -> pa.Table:
        # exact int64 cents×cents so the distributed partial-sum order
        # can't flip a penny at a rounding boundary vs the SQL oracle
        pc_ = pa.compute
        price = pc_.cast(pc_.round(pc_.multiply(
            t["l_extendedprice"], pa.scalar(100.0))), pa.int64())
        keep = pc_.cast(pc_.round(pc_.multiply(
            pc_.subtract(pa.scalar(1.0), t["l_discount"]),
            pa.scalar(100.0))), pa.int64())
        return pa.table({"orderkey": t["l_orderkey"],
                         "rev_e4": pc_.multiply(price, keep)})

    items = _t(sf_dir, "lineitem").filter(
        expr="l_quantity > 45").map_batches(_cents, batch_format="pyarrow")
    item_rev = preagg_groupby(items, ["orderkey"],
                              [("sum", "rev_e4", "item_rev")])
    j = hash_partition_join(big, item_rev, key="orderkey",
                            num_buckets=32, join_type="full outer")

    def _coalesce(batch: pd.DataFrame) -> pd.DataFrame:
        batch["o_orderpriority"] = batch["o_orderpriority"].fillna("NONE")
        # keep exact integer 1e-4-dollar units: a float division would sit
        # exactly on .5 rounding halves (banker's-vs-away divergence)
        batch["item_rev_e4"] = batch.pop("item_rev").fillna(0).astype("int64")
        return batch

    return j.map_batches(_coalesce, batch_format="pandas")


def q_dup_passage_spans(sf_dir: str) -> rd.Dataset:
    """Exact-substring (duplicate-passage) dedup at token 5-gram
    granularity — Lee et al. 2022's training-data operator
    (stages/dupspans.duplicate_passage_spans): one streaming pass emits
    (gram-hash, doc, pos) via a vectorized polynomial token-hash window,
    a combiner count finds corpus-wide duplicated grams, a Bloom
    semi-join keeps only duplicated positions (the unique majority never
    shuffles), and one co-location shuffle merges windows into maximal
    per-doc spans (gaps-and-islands). Oracle mirrors it on the literal
    gram strings."""
    from belb_ray.stages.dupspans import duplicate_passage_spans

    docs = _t(sf_dir, "documents", columns=["doc_id", "text"])
    return duplicate_passage_spans(docs, k=5, min_count=2)


def q_parts_bought_together(sf_dir: str) -> rd.Dataset:
    """Market-basket co-occurrence: top-40 part pairs sharing an order
    (stages/cooccur.cooccurrence_topk): ONE hash(order) co-location
    shuffle, fully vectorized intra-group pair generation (repeat/offset
    index arithmetic, no per-group Python), combiner pair counts,
    deterministic (count desc, a, b) order."""
    from belb_ray.stages.cooccur import cooccurrence_topk

    li = _t(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    return cooccurrence_topk(li, "l_orderkey", "l_partkey", k=40)


def q_user_value_mad(sf_dir: str) -> rd.Dataset:
    """Per-user median absolute deviation (stages/analytic.grouped_mad):
    two histogram-shuffle quantile passes with a size-guarded broadcast
    attach between them — input rows never shuffle; discrete-median
    (quantile_disc) semantics mirrored in SQL."""
    from belb_ray.stages.analytic import grouped_mad

    events = _t(sf_dir, "events", columns=["user_id", "value"])
    return grouped_mad(events, "user_id", "value")


def q_user_value_zscores(sf_dir: str) -> rd.Dataset:
    """Per-group z-score standardization — compute-stats-then-apply
    (stages/analytic.normalize_by_group): one combiner moment pass, the
    per-key (mean, std) table broadcast back, rescale streams per row.
    4dp compare vs the SQL window mirror."""
    from belb_ray.stages.analytic import normalize_by_group

    events = _t(sf_dir, "events", columns=["event_id", "user_id", "value"])
    out = normalize_by_group(events, "user_id", "value")
    return _round_cols(out, {"z": 4, "value": 4})


def q_quality_weighted_sample(sf_dir: str) -> rd.Dataset:
    """Deterministic weighted sampling without replacement, 5 docs per
    language, P(pick) ∝ n_chars (stages/sampling.
    weighted_sample_per_group — Efraimidis-Spirakis A-Res with the md5
    key hash as the draw, re-derivable in SQL): the auditable
    quality-weighted training-subset curation op."""
    from belb_ray.stages.sampling import weighted_sample_per_group

    docs = _t(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])
    return weighted_sample_per_group(docs, "lang", "doc_id", "n_chars",
                                     k=5, seed=11)


def q_event_value_approx_quantiles(sf_dir: str) -> rd.Dataset:
    """Bounded-memory approximate per-type quantiles
    (stages/analytic.approx_grouped_quantiles): values quantized to
    width-0.5 bins before the histogram shuffle, so the exchange is
    bounded by range/bin_width per key at ANY input cardinality; error
    ≤ bin_width, mirrored exactly by SQL quantile_disc over the same
    quantized values."""
    from belb_ray.stages.analytic import approx_grouped_quantiles

    ev = _t(sf_dir, "events", columns=["event_type", "value"])
    return approx_grouped_quantiles(ev, "event_type", "value",
                                    [(0.5, "p50"), (0.95, "p95")],
                                    bin_width=0.5)


def q_event_prop_stats(sf_dir: str) -> rd.Dataset:
    """JSON field extraction from the semi-structured props column
    (stages/semistructured.json_field — streaming, zero shuffle) feeding
    a combiner aggregate: per event_type count + sum of props.k."""
    from belb_ray.stages.agg import preagg_groupby
    from belb_ray.stages.semistructured import json_field

    ev = _t(sf_dir, "events", columns=["event_type", "props"])
    withk = json_field(ev, "props", "k", out_col="k", out_type=pa.int64())
    return preagg_groupby(withk, ["event_type"], [
        ("count", "", "n"), ("sum", "k", "sum_k")])


def q_doc_first_words(sf_dir: str) -> rd.Dataset:
    """Vectorized regex capture-group extraction
    (stages/semistructured.regex_extract, pandas C regex engine) feeding
    a combiner count: top-20 document first words."""
    from belb_ray.stages.agg import preagg_groupby
    from belb_ray.stages.semistructured import regex_extract

    docs = _t(sf_dir, "documents", columns=["doc_id", "text"])
    fw = regex_extract(docs, "text", r"^([A-Za-z0-9_]+)", ["first_word"])
    counts = preagg_groupby(fw, ["first_word"], [("count", "", "n_docs")])
    return counts.sort(["n_docs", "first_word"],
                       descending=[True, False]).limit(20)


def q_part_pagerank(sf_dir: str) -> rd.Dataset:
    """Fixed-iteration PageRank over the part co-occurrence graph
    (stages/graph.pagerank): per iteration the node-rank table (tiny vs
    the edge list) broadcasts onto the edges via the size-guarded
    attach, contributions pre-aggregate in map_batches, one bucketed
    combine produces the next rank table — the edge list is scanned
    once per iteration and never shuffled. Oracle = 3 unrolled CTE
    iterations; 9dp compare, top-30 deterministic order."""
    from belb_ray.stages.agg import preagg_groupby
    from belb_ray.stages.cooccur import cooccurrence_pairs
    from belb_ray.stages.graph import pagerank

    li = _t(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    pairs = cooccurrence_pairs(li, "l_orderkey", "l_partkey")
    und = preagg_groupby(pairs, ["a", "b"],
                         [("count", "", "__n")]).drop_columns(["__n"])

    def _mirror(batch: pa.Table) -> pa.Table:
        fwd = pa.table({"src": batch["a"], "dst": batch["b"]})
        rev = pa.table({"src": batch["b"], "dst": batch["a"]})
        return pa.concat_tables([fwd, rev])

    edges = und.map_batches(_mirror, batch_format="pyarrow")
    pr = pagerank(edges, iters=3)

    def _round(batch: pd.DataFrame) -> pd.DataFrame:
        batch["rank"] = round_half_away(batch["rank"], 9)
        return batch

    return (pr.map_batches(_round, batch_format="pandas")
            .sort(["rank", "node"], descending=[True, False]).limit(30))


def q_signup_funnel(sf_dir: str) -> rd.Dataset:
    """Ordered conversion funnel signup → click → purchase
    (stages/funnel.funnel): earliest chain per user, each step at or
    after the previous step's time; ONE hash(user) co-location shuffle
    + one vectorized pass per step inside each bucket."""
    from belb_ray.stages.funnel import funnel

    ev = _t(sf_dir, "events", columns=["user_id", "event_type", "ts"])
    return funnel(ev, "user_id", "event_type", "ts",
                  ["signup", "click", "purchase"])


def q_value_deciles(sf_dir: str) -> rd.Dataset:
    """Global equi-depth bucketing (stages/analytic.equi_depth_buckets):
    the 9 decile boundaries come from one fixed-width histogram
    exchange, broadcast once; assignment is a streaming vectorized
    searchsorted — input rows never shuffle. Output: rows per decile."""
    from belb_ray.stages.agg import preagg_groupby
    from belb_ray.stages.analytic import equi_depth_buckets

    ev = _t(sf_dir, "events", columns=["value"])
    b = equi_depth_buckets(ev, "value", 10, out_col="decile")
    return preagg_groupby(b, ["decile"], [("count", "", "n")])


def q_doc_lm_scores(sf_dir: str) -> rd.Dataset:
    """Corpus-trained bigram LM quality score per document
    (stages/lm.lm_score — the KenLM-style training-data filter): one
    pass builds the bigram/context count tables (combiner groupbys,
    vocabulary-sized), a second pass attaches them via the size-guarded
    broadcast and averages ln P(w2|w1) with add-1 smoothing per doc.
    6dp compare vs the expression-level SQL mirror."""
    from belb_ray.stages.lm import lm_score

    docs = _t(sf_dir, "documents", columns=["doc_id", "text"])
    return _round_cols(lm_score(docs), {"logprob_mean": 6})


def q_incremental_dedup(sf_dir: str) -> rd.Dataset:
    """Cross-run incremental exact dedup
    (stages/incremental.dedup_against_state): wave 1 (first half of the
    corpus by doc_id) seeds an append-only parquet hash state; wave 2
    drops rows whose content wave 1 already accepted plus within-wave
    duplicates (keep-first). ONE co-location shuffle per wave; the state
    side ships only md5 hashes (SQL-re-derivable). Returns wave-2
    survivors."""
    import shutil
    import tempfile

    from belb_ray.stages.incremental import dedup_against_state

    docs = _t(sf_dir, "documents", columns=["doc_id", "text"])
    split = docs.count() // 2
    state = _os.path.join(tempfile.gettempdir(),
                          f"belb_ray_incr_state_{split}")
    shutil.rmtree(state, ignore_errors=True)
    wave1 = docs.filter(expr=f"doc_id < {split}")
    wave2 = docs.filter(expr=f"doc_id >= {split}")
    dedup_against_state(wave1, state).materialize()  # seed the state
    out = dedup_against_state(wave2, state)

    def _slim(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[["doc_id"]]

    return out.map_batches(_slim, batch_format="pandas")


def q_pca_projection(sf_dir: str) -> rd.Dataset:
    """Distributed PCA (stages/pca.pca_project): each block ships ONE
    fixed-width moment row (n, Σx, Σxxᵀ), the d×d eigendecomposition
    runs on the driver, the top-4 components broadcast once, and the
    projection streams as one matmul per batch. Deterministic sign
    convention; checked against an independent single-process numpy
    PCA golden at 6dp."""
    from belb_ray.stages.pca import pca_project

    emb = _t(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    out = pca_project(emb, "embedding", 4, id_cols=["vec_id"])
    return _round_cols(out, {f"pc{j}": 6 for j in range(1, 5)})


def q_incremental_neardup(sf_dir: str) -> rd.Dataset:
    """Cross-run NEAR-dup dedup against persisted MinHash state
    (stages/incremental.neardup_against_state): wave 1 seeds band-key +
    signature parquet state, wave 2 drops docs LSH-paired (shared band,
    est-Jaccard ≥ 0.5) with a wave-1 survivor or a smaller-id wave-2
    doc. Candidate generation is one band-key co-location shuffle; the
    state ships band rows, never text. Golden from the independent
    brute-force two-wave oracle."""
    import shutil
    import tempfile

    from belb_ray.stages.incremental import neardup_against_state

    docs = _t(sf_dir, "documents", columns=["doc_id", "text"])
    split = docs.count() // 2
    state = _os.path.join(tempfile.gettempdir(),
                          f"belb_ray_nd_state_{split}")
    shutil.rmtree(state, ignore_errors=True)
    wave1 = docs.filter(expr=f"doc_id < {split}")
    wave2 = docs.filter(expr=f"doc_id >= {split}")
    neardup_against_state(wave1, state).materialize()  # seed the state
    out = neardup_against_state(wave2, state)

    def _slim(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[["doc_id"]]

    return out.map_batches(_slim, batch_format="pandas")


def q_compacted_neardup(sf_dir: str) -> rd.Dataset:
    """Incremental near-dup dedup run against COMPACTED state
    (stages/incremental.compact_state): wave 1 seeds the append-only
    band/sig shards, compaction merges them into one run each (bucketed
    distinct + distributed parquet rewrite, fixed_size_binary widths
    restored), wave 2 must then produce EXACTLY the survivors it would
    against the uncompacted state — so the oracle is the same pinned
    golden as ``incremental_neardup``, which is the point: compaction
    is behavior-preserving by construction (candidate generation
    consumes the state's row set, never its shard layout)."""
    import shutil
    import tempfile

    from belb_ray.stages.incremental import (compact_state,
                                             neardup_against_state)

    docs = _t(sf_dir, "documents", columns=["doc_id", "text"])
    split = docs.count() // 2
    state = _os.path.join(tempfile.gettempdir(),
                          f"belb_ray_ndc_state_{split}")
    shutil.rmtree(state, ignore_errors=True)
    wave1 = docs.filter(expr=f"doc_id < {split}")
    wave2 = docs.filter(expr=f"doc_id >= {split}")
    neardup_against_state(wave1, state).materialize()  # seed the state
    compact_state(state)
    out = neardup_against_state(wave2, state)

    def _slim(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[["doc_id"]]

    return out.map_batches(_slim, batch_format="pandas")


def q_pca_variance(sf_dir: str) -> pd.DataFrame:
    """Explained-variance spectrum of the embedding covariance
    (stages/pca.explained_variance): one fixed-width moment row per
    block, driver eigh; d-row output. Golden from independent numpy."""
    from belb_ray.stages.pca import explained_variance

    emb = _t(sf_dir, "embeddings", columns=["embedding"])
    out = explained_variance(emb, "embedding")
    for c in ("eigenvalue", "explained_ratio", "cum_explained_ratio"):
        out[c] = round_half_away(out[c], 8)
    return out


def q_user_event_entropy(sf_dir: str) -> rd.Dataset:
    """Per-user Shannon entropy of the event-type mix
    (stages/docstats.grouped_entropy): two combiner aggregations (counts,
    then Σc / Σc·ln c per key — fixed width) + closed-form finish.
    6dp compare vs the arithmetic SQL mirror."""
    from belb_ray.stages.docstats import grouped_entropy

    ev = _t(sf_dir, "events", columns=["user_id", "event_type"])
    out = grouped_entropy(ev, "user_id", "event_type")
    return _round_cols(out, {"entropy": 6})


def q_stratified_docs_sample(sf_dir: str) -> rd.Dataset:
    """Per-language deterministic fraction sampling
    (stages/sampling.stratified_hash_sample, md5 mode): rebalance a
    corpus by keeping 50% of 'en', 25% of 'de', 10% of everything else —
    partition-independent, SQL-re-derivable draw per row."""
    from belb_ray.stages.sampling import stratified_hash_sample

    docs = _t(sf_dir, "documents", columns=["doc_id", "lang", "source"])
    return stratified_hash_sample(docs, "doc_id", "lang",
                                  {"en": 0.5, "de": 0.25},
                                  default_frac=0.10, seed=7)


def q_user_value_winsorized(sf_dir: str) -> rd.Dataset:
    """Per-user winsorization at [p10, p90]
    (stages/analytic.winsorize_by_group): one histogram quantile
    exchange for the per-key bounds, broadcast attach, streaming clip.
    Aggregated per user for a compact oracle compare (sum of clipped
    cents, exact int64)."""
    import numpy as np

    from belb_ray.stages.agg import preagg_groupby
    from belb_ray.stages.analytic import winsorize_by_group

    ev = _t(sf_dir, "events", columns=["user_id", "value"])
    w = winsorize_by_group(ev, "user_id", "value", lo=0.10, hi=0.90,
                           out_col="wv")

    def _cents(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": batch["user_id"],
            "wc": round_half_away(batch["wv"].to_numpy() * 100.0)
            .astype(np.int64),
        })

    return preagg_groupby(w.map_batches(_cents, batch_format="pandas"),
                          ["user_id"], [("count", "", "n"),
                                        ("sum", "wc", "sum_wc")])


def q_user_event_validity(sf_dir: str) -> rd.Dataset:
    """SCD2-style validity intervals: each user event is valid until the
    user's next event (null-capped tail) — the lead window composition
    (stages/analytic.ordered_window, one co-location shuffle)."""
    from belb_ray.stages.analytic import ordered_window

    ev = _t(sf_dir, "events", columns=["user_id", "event_id", "ts"]).map_batches(
        lambda b: b.assign(ts_us=b["ts"].astype("int64")),
        batch_format="pandas").drop_columns(["ts"])
    out = ordered_window(ev, "user_id", ["ts_us", "event_id"],
                         [("lead", "ts_us", "valid_to_us")])

    def _shape(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[["user_id", "event_id", "ts_us", "valid_to_us"]]

    return out.map_batches(_shape, batch_format="pandas")


def q_wealthy_or_supplier_nations(sf_dir: str) -> rd.Dataset:
    """UNION (distinct) of two key sets (stages/setops.set_union): both
    sides locally dedup before ONE co-location shuffle — nations with a
    wealthy customer or any supplier."""
    from belb_ray.stages.setops import set_union

    import pyarrow.dataset as pads

    rich = _t_where(sf_dir, "customer", pads.field("c_acctbal") > 9000,
                    columns=["c_nationkey", "c_acctbal"])
    sup = _t(sf_dir, "supplier")
    return set_union(rich, sup, ["c_nationkey"], b_cols=["s_nationkey"])


def q_nation_type_matrix(sf_dir: str) -> rd.Dataset:
    """Broadcast CROSS JOIN (stages/joins.cross_join): every nation ×
    every distinct event type — the small side is ray.put once, each
    batch expands locally, no shuffle."""
    from belb_ray.stages.agg import preagg_groupby
    from belb_ray.stages.joins import cross_join

    nations = _t(sf_dir, "nation", columns=["n_nationkey", "n_name"])
    types = preagg_groupby(
        _t(sf_dir, "events", columns=["event_type"]),
        ["event_type"], [("count", "", "__n")]).drop_columns(["__n"])
    return cross_join(nations, types)


def q_user_value_regression(sf_dir: str) -> rd.Dataset:
    """Per-user OLS of event value over time (stages/agg.
    grouped_regression): blocks ship six raw moments per key, one
    bucketed sum-combine, closed-form slope/intercept/r². x is
    DAYS since 2024-01-01 (fixed origin keeps |x| small so the
    intercept's ybar − slope·xbar cancellation stays benign) as double — the identical expression the SQL mirror uses, so
    the 6dp/4dp rounded compare is exact."""
    from belb_ray.stages.agg import grouped_regression

    ev = _t(sf_dir, "events", columns=["user_id", "ts", "value"])

    def _x(batch: pd.DataFrame) -> pd.DataFrame:
        secs = (batch["ts"].astype("int64") / 1e6)
        return pd.DataFrame({"user_id": batch["user_id"],
                             "x": (secs - 1704067200.0) / 86400.0,
                             "value": batch["value"]})

    xy = ev.map_batches(_x, batch_format="pandas", batch_size=1 << 17)
    out = grouped_regression(xy, ["user_id"], "x", "value")
    return _round_cols(out, {"slope": 6, "intercept": 4, "r2": 6})


def q_weekly_cohort_retention(sf_dir: str) -> rd.Dataset:
    """Weekly cohort retention triangle (stages/cohort.cohort_retention):
    batch-local (user, week) dedup → ONE hash(user) shuffle → per-bucket
    first-week + offset counts → tiny sum-combine. Weeks are
    Monday-aligned integer indices so the SQL mirror needs no date_trunc
    dialect."""
    from belb_ray.stages.cohort import cohort_retention

    ev = _t(sf_dir, "events", columns=["user_id", "ts"])
    return cohort_retention(ev, "user_id", "ts")


def q_customer_table_diff(sf_dir: str) -> rd.Dataset:
    """CDC keyed diff (stages/setops.keyed_diff): two deterministically
    derived versions of the customer table — 'old' drops custkey%11==0,
    'new' drops custkey%13==0 and patches acctbal where custkey%5==0 —
    classified added/removed/changed with per-row changed-column list in
    ONE co-location shuffle."""
    from belb_ray.stages.setops import keyed_diff

    cust = _t(sf_dir, "customer", columns=["c_custkey", "c_acctbal", "c_mktsegment"])
    old = cust.map_batches(
        lambda b: b[b["c_custkey"] % 11 != 0],
        batch_format="pandas", batch_size=1 << 16)

    def _patch(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch[batch["c_custkey"] % 13 != 0].copy()
        hit = batch["c_custkey"] % 5 == 0
        batch.loc[hit, "c_acctbal"] = batch.loc[hit, "c_acctbal"] + 100.0
        return batch

    new = cust.map_batches(_patch, batch_format="pandas",
                           batch_size=1 << 16)
    return keyed_diff(old, new, ["c_custkey"],
                      ["c_acctbal", "c_mktsegment"])


def q_user_value_daily_ffill(sf_dir: str) -> rd.Dataset:
    """Time-series resample + gap-fill (stages/resample.resample_ffill):
    per-block (user, day) max partials → ONE hash(user) co-location
    shuffle → per-bucket dense day grid + composite-searchsorted forward
    fill. max is order-independent over float64, so the filled values are
    bit-identical to the SQL last_value(... IGNORE NULLS) mirror."""
    from belb_ray.stages.resample import resample_ffill

    ev = _t(sf_dir, "events", columns=["user_id", "ts", "value"])
    return resample_ffill(ev, "user_id", "ts", "value", period_s=86_400,
                          agg="max")


def q_user_event_transitions(sf_dir: str) -> rd.Dataset:
    """Markov transition counts over the per-user ordered event stream
    (stages/analytic.transition_counts): consecutive event_type pairs in
    (ts, event_id) order — one co-location shuffle, whole-bucket sort +
    shifted compare, per-pair counts combined bucketed."""
    from belb_ray.stages.analytic import transition_counts

    ev = _t(sf_dir, "events", columns=["user_id", "ts", "event_id", "event_type"])
    return transition_counts(ev, "user_id", ["ts", "event_id"],
                             "event_type")


def q_doc_shard_assignment(sf_dir: str) -> rd.Dataset:
    """Deterministic global shuffle + sharding for training-data export
    (stages/sampling.shard_assign): md5-derived shard plus the row's
    exact 0-based position within its shard — partitioning-independent,
    so the SQL row_number() mirror re-derives both columns."""
    from belb_ray.stages.sampling import shard_assign

    docs = _t(sf_dir, "documents", columns=["doc_id", "lang"])
    out = shard_assign(docs, key="doc_id", num_shards=8, seed=5)
    return out.select_columns(["doc_id", "lang", "shard", "pos"])


def q_size_shard_plan(sf_dir: str) -> rd.Dataset:
    """Greedy byte-packed shard plan (stages/sampling.
    size_balanced_shards): shard = floor(exclusive-prefix-bytes /
    target) in doc_id order, so skewed doc sizes still pack into
    ~equal-byte output files. Two-phase distributed prefix sum (per-bin
    partials, driver cumsums O(#bins), one bin shuffle). Oracle = the
    SQL window sum(length) OVER (ORDER BY doc_id) - length."""
    from belb_ray.stages.sampling import size_balanced_shards

    return size_balanced_shards(_t(sf_dir, "documents"),
                                target_bytes=50_000)


def q_doc_chunks(sf_dir: str) -> rd.Dataset:
    """Sliding-window character chunking with overlap
    (stages/curation.chunk_documents): size 120, overlap 40 → stride 80.
    Pure row explosion, no shuffle; SQL mirror is generate_series +
    substring."""
    from belb_ray.stages.curation import chunk_documents

    docs = _t(sf_dir, "documents", columns=["doc_id", "text"])
    return chunk_documents(docs, chunk_size=120, overlap=40)


def q_seq_packing(sf_dir: str) -> rd.Dataset:
    """GPT-style sequence-packing offsets (stages/curation.pack_sequences):
    global token prefix-sum in doc_id order via the two-phase ordered-
    bucket scan, seq_len 512. SQL mirror is a window cumulative sum."""
    from belb_ray.stages.curation import pack_sequences

    docs = _t(sf_dir, "documents", columns=["doc_id", "text"])
    return pack_sequences(docs, seq_len=512, bucket_width=64)


def q_pii_redaction(sf_dir: str) -> rd.Dataset:
    """PII redaction (stages/curation.redact_pii): vectorized RE2
    replace for emails / IPv4 / SSN-shaped ids / phone numbers with
    per-doc match counts; the oracle applies the same patterns in the
    same order via DuckDB's RE2."""
    from belb_ray.stages.curation import redact_pii

    return redact_pii(_t(sf_dir, "documents", columns=["doc_id", "text"]))


def q_cross_corpus_contamination(sf_dir: str) -> rd.Dataset:
    """Contamination overlap with a dataset-scale benchmark side
    (stages/curation.cross_corpus_overlap): same contract as
    contamination_flags (docs with doc_id % 50 = 0 stand in for the
    benchmark) but via ONE gram-hash co-location shuffle instead of a
    driver broadcast — certifying the at-scale path against the SAME
    SQL oracle text."""
    from belb_ray.stages.curation import cross_corpus_overlap

    docs = _t(sf_dir, "documents", columns=["doc_id", "text"])

    def _split(keep_bench: bool):
        def fn(batch: pa.Table) -> pa.Table:
            m = (batch["doc_id"].to_numpy(zero_copy_only=False) % 50) == 0
            return batch.filter(pa.array(m if keep_bench else ~m))
        return fn

    bench = docs.map_batches(_split(True), batch_format="pyarrow")
    train = docs.map_batches(_split(False), batch_format="pyarrow")
    return cross_corpus_overlap(train, bench)


def q_resumable_export(sf_dir: str) -> pd.DataFrame:
    """Per-partition resumable Parquet export (pipelines/outputs.
    resumable_partitioned_write): documents hive-partitioned by lang
    with a per-partition completion manifest. The query writes fresh,
    then calls again and returns the SECOND call's skipped-partition
    row counts — so the oracle (GROUP BY lang) certifies both the
    partitioned write and the skip-if-complete resume path."""
    import shutil
    import tempfile

    from belb_ray.pipelines.outputs import resumable_partitioned_write

    docs = _t(sf_dir, "documents", columns=["doc_id", "lang",
                                                   "text"])
    import hashlib as _hl
    out = _os.path.join(
        tempfile.gettempdir(),
        f"belb_ray_export_{_hl.md5(sf_dir.encode()).hexdigest()[:8]}")
    shutil.rmtree(out, ignore_errors=True)
    cfg = {"sf_dir": sf_dir, "v": 1}
    resumable_partitioned_write(docs, out, "lang", cfg)
    r2 = resumable_partitioned_write(docs, out, "lang", cfg)
    assert not r2["written"], "resume path must skip completed parts"
    return pd.DataFrame(
        {"lang": sorted(r2["skipped"]),
         "n_rows": np.array([r2["skipped"][k]
                             for k in sorted(r2["skipped"])],
                            np.int64)})


def q_contamination_flags(sf_dir: str) -> rd.Dataset:
    """Benchmark-contamination flagging (stages/curation.
    contamination_flags): docs sharing any word 3-gram with the
    benchmark suite (docs with doc_id % 50 = 0 stand in for the
    benchmark). Benchmark grams broadcast once; corpus never shuffles."""
    from belb_ray.stages.curation import contamination_flags
    from belb_ray.stages.joins import collect_arrow

    docs = _t(sf_dir, "documents", columns=["doc_id", "text"])

    def _split(batch: pa.Table, keep_bench: bool) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        m = (ids % 50) == 0
        return batch.filter(pa.array(m if keep_bench else ~m))

    bench = collect_arrow(docs.map_batches(
        lambda t: _split(t, True), batch_format="pyarrow"))
    corpus = docs.map_batches(lambda t: _split(t, False),
                              batch_format="pyarrow")
    return contamination_flags(corpus, bench["text"].to_pylist(), n=3)


def q_repetition_stats(sf_dir: str) -> rd.Dataset:
    """C4/Gopher repetition signals per doc (stages/curation.
    repetition_stats): duplicate-line fraction, top-word fraction,
    duplicate-bigram fraction — pure map_batches, oracle-mirrored
    tokenizer contract."""
    from belb_ray.stages.curation import repetition_stats

    return repetition_stats(_t(sf_dir, "documents", columns=["doc_id", "text"]))


def q_corpus_ngrams(sf_dir: str) -> rd.Dataset:
    """Corpus-wide top-100 word bigrams (stages/corpus.ngram_counts):
    per-batch value_counts combiner → one bucketed combine on the gram
    key → tiny global top-k. Rows never shuffle."""
    from belb_ray.stages.corpus import ngram_counts

    docs = _t(sf_dir, "documents", columns=["text"])
    return ngram_counts(docs, n=2, top_k=100)


def q_table_profile(sf_dir: str) -> rd.Dataset:
    """Column data-quality profile (stages/corpus.profile_columns):
    exact per-column row / null / distinct counts via fixed-width count
    partials and bucket-local dedup partials. O(#columns) output rows."""
    from belb_ray.stages.corpus import profile_columns

    return profile_columns(_t(sf_dir, "documents"),
                           ["doc_id", "text", "lang", "source", "n_chars"])


# per-source keep rates for the mixture-sampling query — shared between
# the Ray op and the generated oracle SQL (cut = floor(rate · 16^15),
# matching sampling._md5_hash60's space)
_MIXTURE_RATES = {"src0": 1.0, "src1": 0.75, "src2": 0.5,
                  "src3": 0.25, "src4": 0.1}
# int cut constants baked into the oracle SQL so both sides share the
# exact same floor(rate * 16^15) arithmetic
_MIXTURE_CASE = " ".join(f"WHEN '{s}' THEN {int(r * 16 ** 15)}"
                         for s, r in _MIXTURE_RATES.items())


def q_mixture_sample(sf_dir: str) -> rd.Dataset:
    """Training-mixture sampling (stages/corpus.mixture_sample):
    deterministic per-source hash-rate filter (md5 recipe shared with
    hash_sample); sources outside the mixture are dropped."""
    from belb_ray.stages.corpus import mixture_sample

    return mixture_sample(_t(sf_dir, "documents"), "source",
                          _MIXTURE_RATES, key="doc_id", seed=7)


def q_inverted_index(sf_dir: str) -> rd.Dataset:
    """Inverted-index build (stages/corpus.inverted_index): distinct
    (term, doc) pairs → one term-bucket shuffle → vectorized
    postings-list assembly; min_df=2 prunes hapax terms."""
    from belb_ray.stages.corpus import inverted_index

    docs = _t(sf_dir, "documents", columns=["doc_id", "text"])
    return inverted_index(docs, min_df=2)


def q_target_encoding(sf_dir: str) -> rd.Dataset:
    """Smoothed mean target encoding (stages/mlprep.target_encode):
    int-cents partial sums make the distributed aggregate exact; the
    prior is a 2-number driver reduce."""
    from belb_ray.stages.mlprep import target_encode

    orders = _t(sf_dir, "orders", columns=["o_orderpriority", "o_totalprice"])
    return target_encode(orders, "o_orderpriority", "o_totalprice",
                         smoothing=20.0)


# train/val/test cut points for the split query — ints baked into the
# oracle SQL so both sides share floor(cum_frac * 16^15) exactly
_SPLIT_FRACS = {"train": 0.8, "val": 0.1, "test": 0.1}
_SPLIT_CUT1 = int(0.8 * 16 ** 15)
_SPLIT_CUT2 = int((0.8 + 0.1) * 16 ** 15)


def q_dataset_split(sf_dir: str) -> rd.Dataset:
    """Deterministic train/val/test assignment (stages/mlprep.
    dataset_split): md5(key,seed) against integer cut points —
    partition-independent, stateless, SQL-mirrored."""
    from belb_ray.stages.mlprep import dataset_split

    docs = _t(sf_dir, "documents", columns=["doc_id"])
    return dataset_split(docs, "doc_id", _SPLIT_FRACS, seed=3)


def q_quota_sample(sf_dir: str) -> rd.Dataset:
    """Per-source quota sampling (stages/mlprep.quota_sample): keep ≤5
    docs per source in deterministic md5-hash order — one group-bucket
    shuffle, vectorized rank-and-take."""
    from belb_ray.stages.mlprep import quota_sample

    docs = _t(sf_dir, "documents", columns=["doc_id", "source"])
    return quota_sample(docs, "source", 5, key="doc_id", seed=3)


def q_triangle_counts(sf_dir: str) -> rd.Dataset:
    """Per-vertex triangle counts (stages/graph.triangle_counts) over the
    user co-activity graph: users adjacent in the sorted distinct user
    list of each (event_type, hour) bucket (stages/graph.cochain_edges —
    the sparsifier that bounds hub buckets). Degree-ordered orientation
    bounds wedge fan-out; closure via size-guarded semi-join."""
    from belb_ray.stages.graph import cochain_edges, triangle_counts

    ev = _t(sf_dir, "events", columns=["event_type", "ts", "user_id"])

    def _hour(batch: pd.DataFrame) -> pd.DataFrame:
        hr = batch["ts"].to_numpy().astype("datetime64[h]").astype(np.int64)
        return pd.DataFrame({"event_type": batch["event_type"],
                             "__hr": hr, "user_id": batch["user_id"]})

    edges = cochain_edges(ev.map_batches(_hour, batch_format="pandas"),
                          ["event_type", "__hr"], "user_id")
    return triangle_counts(edges, src="a", dst="b")


def q_name_edit_pairs(sf_dir: str) -> rd.Dataset:
    """Exact edit-distance self-join (stages/linkage.
    edit_distance_self_join): FastSS deletion-neighborhood blocking
    (guaranteed recall at k=1) + Levenshtein verify on candidates only —
    never all pairs. The short-string ER op the MinHash flagship doesn't
    cover."""
    from belb_ray.stages.linkage import edit_distance_self_join

    cust = _t(sf_dir, "customer", columns=["c_custkey", "c_name"])
    return edit_distance_self_join(cust, "c_custkey", "c_name", k=1)


def q_customer_golden_record(sf_dir: str) -> rd.Dataset:
    """Golden-record survivorship per customer (stages/linkage.
    survivorship): combiner min/max/count attributes + most-recent-wins
    status via grouped_topk(k=1)."""
    from belb_ray.stages.linkage import survivorship

    orders = _t(sf_dir, "orders", columns=["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice",
         "o_orderstatus"])
    return survivorship(
        orders, "o_custkey",
        [("max", "o_totalprice", "max_price"),
         ("min", "o_orderdate", "first_order"),
         ("count", "", "n_orders")],
        ["o_orderstatus"], "o_orderdate", "o_orderkey")


def q_event_value_imputed(sf_dir: str) -> rd.Dataset:
    """Per-group mean null imputation (stages/analytic.impute_by_group):
    exact integer-unit partial sums → tiny mean table broadcasts back;
    rows never shuffle. Nulls are injected deterministically
    (event_id % 7 = 0) so the repair path is actually exercised."""
    from belb_ray.stages.analytic import impute_by_group

    ev = _t(sf_dir, "events", columns=["event_id", "user_id", "value"])

    def _null_out(batch: pd.DataFrame) -> pd.DataFrame:
        v = batch["value"].to_numpy(dtype=np.float64).copy()
        v[batch["event_id"].to_numpy() % 7 == 0] = np.nan
        batch["value"] = v
        return batch

    out = impute_by_group(ev.map_batches(_null_out, batch_format="pandas"),
                          "user_id", "value", out_col="value_imputed")
    return out.select_columns(["event_id", "user_id", "value_imputed"])


def q_dict_mentions(sf_dir: str) -> rd.Dataset:
    """Dictionary mention tagging (stages/tagging.tag_mentions): the
    dictionary = the corpus's own top-25 bigrams (entity_id = rank,
    count desc / gram asc), ray.put once; documents stream through one
    vectorized token-n-gram membership probe — every space-bounded
    occurrence with exact char offsets, zero shuffle. Oracle = SQL
    position scan (substring equality + space-boundary predicates)."""
    from belb_ray.stages.corpus import ngram_counts
    from belb_ray.stages.joins import collect_arrow
    from belb_ray.stages.tagging import tag_mentions

    docs = _t(sf_dir, "documents", columns=["doc_id", "text"])
    top = collect_arrow(ngram_counts(docs, n=2, top_k=25)).to_pandas()
    top = top.sort_values(["n_occurrences", "gram"],
                          ascending=[False, True], kind="mergesort")
    dict_tbl = pa.table({
        "mention": pa.array(top["gram"].to_numpy(), pa.string()),
        "entity_id": pa.array(np.arange(len(top), dtype=np.int64))})
    out = tag_mentions(docs, dict_tbl)
    return out.sort(["doc_id", "start", "mention"])


def q_part_bfs_hops(sf_dir: str) -> rd.Dataset:
    """Multi-source BFS hop distance ≤3 over the part co-purchase graph
    (stages/graph.bfs_hops): per level the node-sized frontier gates the
    edge list via the size-guarded semi-join, reached nodes dedup with
    one bucketed shuffle, visited nodes drop via the anti form. Seeds =
    parts with p_partkey % 200 = 0. Oracle = bounded-depth recursive CTE
    with UNION-distinct + MIN(d) GROUP BY."""
    from belb_ray.stages.agg import preagg_groupby
    from belb_ray.stages.cooccur import cooccurrence_pairs
    from belb_ray.stages.graph import bfs_hops

    li = _t(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    pairs = cooccurrence_pairs(li, "l_orderkey", "l_partkey")
    und = preagg_groupby(pairs, ["a", "b"],
                         [("count", "", "__n")]).drop_columns(["__n"])

    def _mirror(batch: pa.Table) -> pa.Table:
        fwd = pa.table({"src": batch["a"], "dst": batch["b"]})
        rev = pa.table({"src": batch["b"], "dst": batch["a"]})
        return pa.concat_tables([fwd, rev])

    edges = und.map_batches(_mirror, batch_format="pyarrow")
    def _seed(t: pa.Table) -> pa.Table:
        k = t["p_partkey"].combine_chunks()
        mask = pa.array(k.to_numpy(zero_copy_only=False) % 200 == 0)
        return pa.table({"node": k.filter(mask)})

    seeds = (_t(sf_dir, "part", columns=["p_partkey"])
             .map_batches(_seed, batch_format="pyarrow"))
    return bfs_hops(edges, seeds, max_hops=3).sort("node")


def q_bpe_merges(sf_dir: str) -> rd.Dataset:
    """BPE vocabulary learning (stages/bpe.learn_bpe): the corpus reduces
    ONCE to a (word, count) vocabulary via a distributed word-count; 12
    merge rounds then run over the vocabulary Dataset only (vectorized
    adjacent-pair counts → bucketed combine → 1-row argmax collect →
    streamed regex rewrite). Oracle = pinned golden from the independent
    single-process Counter/tuple-scan implementation."""
    from belb_ray.stages.bpe import learn_bpe

    docs = _t(sf_dir, "documents", columns=["text"])
    return learn_bpe(docs, n_merges=12).sort("step")


def q_bpe_tokens(sf_dir: str) -> rd.Dataset:
    """BPE tokenizer application (stages/bpe.bpe_encode): the 12 learned
    merge rules ship in the task closure; documents stream through one
    map_batches with a per-task word-level memo (Zipf — few distinct
    words per block). Oracle = pinned golden from the independent
    single-process priority encoder."""
    from belb_ray.stages.bpe import bpe_encode, learn_bpe

    docs = _t(sf_dir, "documents", columns=["doc_id", "text"])
    merges = learn_bpe(docs, n_merges=12)
    return bpe_encode(docs, merges).sort("doc_id")


def q_hybrid_search(sf_dir: str) -> rd.Dataset:
    """Reciprocal-rank fusion (stages/search.rrf_fuse) of two document
    shortlists: BM25 top-25 for the fixed query terms and the top-25
    longest documents (n_words from doc_quality). Ranks come from the
    ordered_window row_number; contributions combine with one bucketed
    groupby summed in ranking order, so the SQL FULL OUTER JOIN +
    COALESCE mirror is bit-identical."""
    from belb_ray.stages.agg import topk
    from belb_ray.stages.docstats import doc_quality
    from belb_ray.stages.search import bm25_topk, rrf_fuse

    docs = _t(sf_dir, "documents")
    bm = bm25_topk(docs, list(BM25_TERMS), k=25)
    longest = topk(doc_quality(docs).select_columns(["doc_id", "n_words"]),
                   "n_words", 25, tiebreak="doc_id")
    fused = rrf_fuse(
        [bm, longest], id_col="doc_id",
        orders=[[("score", True), ("doc_id", False)],
                [("n_words", True), ("doc_id", False)]],
        rrf_k=60, top_k=20)
    return fused.sort(["rrf_score", "doc_id"], descending=[True, False])


def q_pq_ann_topk(sf_dir: str) -> rd.Dataset:
    """Product-quantization ANN top-k (stages/pq.py): train per-subspace
    codebooks on the deterministic id-keyed sample, encode the corpus to
    fixed_size_binary(8) codes in one streaming pass, ADC-search with
    broadcast per-query LUTs (m uint8 gathers per code row, no float
    matmul). Oracle = pinned golden from the independent single-process
    PQ composition."""
    import pyarrow.parquet as pq

    from belb_ray.stages.pq import pq_encode, pq_search, pq_train

    emb = _t(sf_dir, "embeddings")
    books = pq_train(emb, m=8, k=16)
    codes = pq_encode(emb, books)
    qt = pq.read_table(f"{sf_dir.rstrip('/')}/embeddings.parquet",
                       columns=["vec_id", "embedding"])
    qt = qt.filter(pa.compute.less(qt["vec_id"], pa.scalar(16)))
    queries = pa.table({"query_id": qt["vec_id"],
                        "embedding": qt["embedding"]})
    out = pq_search(codes, books, queries, k=5)
    return out.sort(["query_id", "dist", "vec_id"])


def q_trending_events(sf_dir: str) -> rd.Dataset:
    """Trending items per window — pure composition: tumbling-window
    counts (stages/windows.tumbling_window combiner pre-agg) feed the
    per-group top-k (stages/agg.grouped_topk, ≤k rows/window/block
    shuffle). Top-3 event types per hour by count; ties → smaller
    type."""
    from belb_ray.stages.agg import grouped_topk
    from belb_ray.stages.windows import tumbling_window

    counts = tumbling_window(_t(sf_dir, "events"), "ts", "1h",
                             ["event_type"], [("count", "", "n_events")])

    def _fmt(batch: pd.DataFrame) -> pd.DataFrame:
        batch["window_start"] = batch["window_start"].dt.strftime(
            "%Y-%m-%d %H:%M:%S")
        return batch

    out = grouped_topk(counts.map_batches(_fmt, batch_format="pandas"),
                       ["window_start"], "n_events", 3,
                       descending=True, tiebreak="event_type")
    return out.sort(["window_start", "n_events", "event_type"],
                    descending=[False, True, False])


def q_value_drift(sf_dir: str) -> rd.Dataset:
    """PSI distribution drift (stages/drift.psi_drift) between the
    even- and odd-event_id halves of the event stream: each side reduces
    to a fixed-width (bin, count) histogram with a combiner + one
    bucketed combine (rows never shuffle); the bin-count-sized finish
    computes clamped PSI contributions. Oracle mirrors the arithmetic
    expression-for-expression."""
    from belb_ray.stages.drift import psi_drift

    ev = _t(sf_dir, "events", columns=["event_id", "value"])

    def _half(parity: int):
        def fn(t: pa.Table) -> pa.Table:
            ids = t["event_id"].combine_chunks().to_numpy(
                zero_copy_only=False)
            return t.filter(pa.array(ids % 2 == parity))

        return fn

    ref = ev.map_batches(_half(0), batch_format="pyarrow")
    cand = ev.map_batches(_half(1), batch_format="pyarrow")
    return psi_drift(ref, cand, "value", bin_width=25.0).sort("bin")


def q_lang_source_assoc(sf_dir: str) -> rd.Dataset:
    """Chi-squared association (stages/drift.chi2_association) between
    document language and source: one pair-count combiner pass over the
    corpus, marginals and (o−e)²/e derived from the cell-sized table."""
    from belb_ray.stages.drift import chi2_association

    return chi2_association(_t(sf_dir, "documents"), "lang", "source") \
        .sort(["lang", "source"])


def q_mention_contexts(sf_dir: str) -> rd.Dataset:
    """Mention context windows (stages/tagging.mention_contexts): the
    dict_mentions spans re-join their document text with one hash(doc)
    partition join and slice a ±16-char snippet per span — the
    disambiguation-feature step of an entity-linking pipeline."""
    from belb_ray.stages.corpus import ngram_counts
    from belb_ray.stages.joins import collect_arrow
    from belb_ray.stages.tagging import mention_contexts, tag_mentions

    docs = _t(sf_dir, "documents", columns=["doc_id", "text"])
    top = collect_arrow(ngram_counts(docs, n=2, top_k=25)).to_pandas()
    top = top.sort_values(["n_occurrences", "gram"],
                          ascending=[False, True], kind="mergesort")
    dict_tbl = pa.table({
        "mention": pa.array(top["gram"].to_numpy(), pa.string()),
        "entity_id": pa.array(np.arange(len(top), dtype=np.int64))})
    spans = tag_mentions(docs, dict_tbl)
    out = mention_contexts(spans, docs, window=16)
    return out.sort(["doc_id", "start", "mention"]).select_columns(
        ["doc_id", "start", "end", "mention", "entity_id", "context"])


def q_quasi_id_audit(sf_dir: str) -> rd.Dataset:
    """k-anonymity audit (privacy QA for the PII-redaction family):
    quasi-identifier combinations (nation, market segment, account-
    balance decile) whose group size < k=5 re-identify their members.
    Pure composition: equi-depth decile bucketing + one pair-count
    combiner aggregation + a size filter; rows never shuffle."""
    from belb_ray.stages.agg import preagg_groupby
    from belb_ray.stages.analytic import equi_depth_buckets

    cust = _t(sf_dir, "customer", columns=["c_nationkey", "c_mktsegment", "c_acctbal"])
    binned = equi_depth_buckets(cust, "c_acctbal", 10,
                                out_col="bal_decile")
    counts = preagg_groupby(
        binned.select_columns(["c_nationkey", "c_mktsegment",
                               "bal_decile"]),
        ["c_nationkey", "c_mktsegment", "bal_decile"],
        [("count", "", "group_size")])
    small = counts.filter(expr="group_size < 5")
    return small.sort(["c_nationkey", "c_mktsegment", "bal_decile"])


def q_part_k_core(sf_dir: str) -> rd.Dataset:
    """k-core decomposition (stages/graph.k_core, k=80) of the part
    co-purchase graph by iterative peeling: per round one degree
    combiner + two size-guarded semi-joins; the shrinking edge list
    materializes per round and rounds stop at the edge-count fixpoint.
    Oracle = pinned golden from independent single-process peeling."""
    from belb_ray.stages.agg import preagg_groupby
    from belb_ray.stages.cooccur import cooccurrence_pairs
    from belb_ray.stages.graph import k_core

    li = _t(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    pairs = cooccurrence_pairs(li, "l_orderkey", "l_partkey")
    und = preagg_groupby(pairs, ["a", "b"],
                         [("count", "", "__n")]).drop_columns(["__n"])

    def _mirror(batch: pa.Table) -> pa.Table:
        fwd = pa.table({"src": batch["a"], "dst": batch["b"]})
        rev = pa.table({"src": batch["b"], "dst": batch["a"]})
        return pa.concat_tables([fwd, rev])

    edges = und.map_batches(_mirror, batch_format="pyarrow")
    return k_core(edges, k=80).sort("vertex")


def q_budget_select(sf_dir: str) -> rd.Dataset:
    """Budgeted quality selection (stages/curation.budget_select): keep
    the most-natural-language documents (stop_ratio desc, doc_id tie)
    until 30k chars — two-phase score-bin prefix sum, over-budget bins
    pruned before the one row shuffle. Oracle = cumulative-sum window
    cut."""
    from belb_ray.stages.curation import budget_select
    from belb_ray.stages.docstats import doc_quality

    q = doc_quality(_t(sf_dir, "documents"))
    out = budget_select(q, "stop_ratio", "n_chars", budget=30000)
    return out.sort("doc_id").select_columns(
        ["doc_id", "n_chars", "cum_weight"])


def q_hll_merge_rollup(sf_dir: str) -> rd.Dataset:
    """Sketch-algebra rollup (stages/sketch.hll_merge): per-(type, day)
    HLL sketches MAX-merge into per-type sketches WITHOUT re-reading raw
    rows — and because max is associative the merged registers are
    bit-identical to a direct coarse sketch, so the oracle is the same
    SQL re-derivation hll_distinct_users uses."""
    from belb_ray.stages.sketch import hll_merge, hll_sketch

    ev = _t(sf_dir, "events", columns=["event_type", "ts", "user_id"])

    def _fine(b: pd.DataFrame) -> pd.DataFrame:
        day = b["ts"].dt.strftime("%Y-%m-%d")
        return pd.DataFrame({"fine": b["event_type"] + "|" + day,
                             "user_id": b["user_id"]})

    sk = hll_sketch(ev.map_batches(_fine, batch_format="pandas"),
                    "fine", "user_id", p=9, seed=0, emit_registers=True)

    def _coarse(b: pd.DataFrame) -> pd.DataFrame:
        b["event_type"] = b["fine"].str.split("|").str[0]
        return b[["event_type", "registers"]]

    merged = hll_merge(sk.map_batches(_coarse, batch_format="pandas"),
                       "event_type", p=9)
    return merged.sort("event_type")


def q_fuzzy_name_lookup(sf_dir: str) -> rd.Dataset:
    """Cross-table approximate dictionary lookup
    (stages/linkage.edit_distance_lookup): customer names corrupted
    deterministically (custkey%3=0 → last char dropped, %3=1 → last
    char → 'X') resolve back against the canonical name table at
    Levenshtein ≤ 1 via lossless FastSS deletion blocking — only
    cross-side candidates verify, never all pairs."""
    from belb_ray.stages.linkage import edit_distance_lookup

    cust = _t(sf_dir, "customer", columns=["c_custkey", "c_name"])

    def _corrupt(b: pd.DataFrame) -> pd.DataFrame:
        key = b["c_custkey"].to_numpy()
        nm = b["c_name"]
        drop = nm.str.slice(0, -1)
        subx = nm.str.slice(0, -1) + "X"
        probe = np.where(key % 3 == 0, drop,
                         np.where(key % 3 == 1, subx, nm))
        return pd.DataFrame({"probe_id": key, "probe_name": probe})

    probe = cust.map_batches(_corrupt, batch_format="pandas")
    out = edit_distance_lookup(probe, cust, "probe_id", "probe_name",
                               "c_custkey", "c_name", k=1)
    return out.sort(["probe_id", "c_custkey"])


def q_label_centroids(sf_dir: str) -> rd.Dataset:
    """Per-label embedding centroids (stages/vector.grouped_vector_mean):
    one fixed-width (key, n, Σdims) partial per key per block via
    np.add.reduceat over a zero-copy matrix view; exchange is
    O(#labels × 64 floats). Oracle = avg(embedding[i]) over a constant
    generate_series of dims, 6dp."""
    from belb_ray.stages.vector import grouped_vector_mean

    emb = _t(sf_dir, "embeddings", columns=["label", "embedding"])
    out = grouped_vector_mean(emb, "label", "embedding", dim=64)
    return out.sort(["label", "dim_idx"])


def q_centroid_confusion(sf_dir: str) -> rd.Dataset:
    """Nearest-centroid classification self-eval
    (stages/vector.nearest_centroid_confusion): label centroids
    broadcast once, per-batch vectorized distance argmin (6dp-rounded
    distances, smaller-label ties), confusion cells via the pair-count
    combiner. Oracle = per-vector row_number over candidate distances."""
    from belb_ray.stages.vector import nearest_centroid_confusion

    emb = _t(sf_dir, "embeddings", columns=["label", "embedding"])
    out = nearest_centroid_confusion(emb, "label", "embedding", dim=64)
    return out.sort(["label", "pred_label"])


def q_event_debounce(sf_dir: str) -> rd.Dataset:
    """Debounce/throttle cleaning (composition): keep an event only if
    the previous event of the same (user, type) is ≥ 600 s older (or
    absent) — ordered_window lag + a streaming filter. The
    duplicate-burst suppression step of event-stream ingestion."""
    from belb_ray.stages.analytic import ordered_window

    ev = _t(sf_dir, "events", columns=["event_id", "user_id", "event_type", "ts"])

    def _key(b: pd.DataFrame) -> pd.DataFrame:
        b["__k"] = b["user_id"].astype(str) + "|" + b["event_type"]
        return b

    w = ordered_window(ev.map_batches(_key, batch_format="pandas"),
                       key="__k", order_cols=["ts", "event_id"],
                       specs=[("lag", "ts", "prev_ts")])

    def _keep(b: pd.DataFrame) -> pd.DataFrame:
        # integer-microsecond compare (exactly mirrors epoch_us in SQL)
        cur = b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        prev = b["prev_ts"].to_numpy().astype("datetime64[us]") \
            .astype(np.int64)
        keep = b["prev_ts"].isna().to_numpy() | \
            (cur - prev >= 600 * 1_000_000)
        return b.loc[keep, ["event_id", "user_id", "event_type"]]

    return w.map_batches(_keep, batch_format="pandas").sort("event_id")


def q_token_pmi(sf_dir: str) -> rd.Dataset:
    """Collocation extraction (composition): PMI of adjacent word pairs
    = ln(c12 · N1 / (c1 · c2)) over the corpus bigram/unigram count
    tables (stages/corpus.ngram_counts combiners); counts-only join —
    the corpus is read twice, shuffled never. Top-50 bigrams with
    c12 ≥ 5 by (pmi desc, gram)."""
    import ray

    from belb_ray.stages.corpus import ngram_counts
    from belb_ray.stages.joins import collect_arrow

    docs = _t(sf_dir, "documents", columns=["text"])
    big = ngram_counts(docs, n=2)
    uni = ngram_counts(docs, n=1)
    u = collect_arrow(uni).to_pandas()
    n1 = float(u["n_occurrences"].sum())
    cmap = dict(zip(u["gram"], u["n_occurrences"].astype(float)))
    ref = ray.put((cmap, n1))

    def _pmi(b: pd.DataFrame) -> pd.DataFrame:
        from belb_ray.util import cached_get

        cmap, n1 = cached_get(ref)
        b = b[b["n_occurrences"] >= 5].copy()
        parts = b["gram"].str.split(" ")
        c1 = parts.str[0].map(cmap).to_numpy(np.float64)
        c2 = parts.str[1].map(cmap).to_numpy(np.float64)
        c12 = b["n_occurrences"].to_numpy(np.float64)
        b["pmi"] = round_half_away(np.log(c12 * n1 / (c1 * c2)), 6)
        return b

    out = big.map_batches(_pmi, batch_format="pandas")
    return out.sort(["pmi", "gram"], descending=[True, False]).limit(50)


def q_customer_global_rank(sf_dir: str) -> rd.Dataset:
    """Global row numbering without a partition key
    (stages/analytic.global_rank): rank customers by (balance desc,
    custkey) via the two-phase value-bin prefix — per-bin count partials,
    O(#bins) driver cumsum, ONE bin shuffle for the within-bin finish.
    Oracle = row_number / percent_rank OVER a global ORDER BY."""
    from belb_ray.stages.analytic import global_rank

    cust = _t(sf_dir, "customer", columns=["c_custkey", "c_acctbal"])
    out = global_rank(cust, "c_acctbal", "c_custkey", descending=True,
                      bin_width=100.0, pct=True)
    return out.sort("rank")


def q_dedup_savings(sf_dir: str) -> rd.Dataset:
    """Dedup-impact report (composition): exact-dup groups (bucketed
    md5 combine) broadcast-join back to per-doc rows; non-representative
    docs count as removed; per-source (n_docs, n_removed, chars_removed)
    via the fixed-width combiner — the what-did-dedup-buy-us accounting
    a curation run reports."""
    import hashlib

    from belb_ray.pipelines.docdedup import exact_dup_groups
    from belb_ray.stages.agg import preagg_groupby
    from belb_ray.stages.joins import broadcast_join

    docs = _t(sf_dir, "documents", columns=["doc_id", "text", "source", "n_chars"])
    groups = exact_dup_groups(_t(sf_dir, "documents"))

    def _md5(batch: pd.DataFrame) -> pd.DataFrame:
        batch["content_md5"] = [hashlib.md5(t.encode()).hexdigest()
                                for t in batch["text"]]
        return batch.drop(columns=["text"])

    tagged = broadcast_join(
        docs.map_batches(_md5, batch_format="pandas"),
        groups.map_batches(lambda b: b[["content_md5", "rep_id"]],
                           batch_format="pandas"),
        keys="content_md5")

    def _removed(batch: pa.Table) -> pa.Table:
        removed = pc.not_equal(batch["doc_id"], batch["rep_id"])
        rem = pc.cast(removed, pa.int64())
        chars_rem = pc.multiply(rem, batch["n_chars"])
        return pa.table({"source": batch["source"],
                         "__one": pa.array(
                             np.ones(batch.num_rows, np.int64)),
                         "removed": rem, "chars_removed": chars_rem})

    out = preagg_groupby(
        tagged.map_batches(_removed, batch_format="pyarrow"),
        ["source"], [("sum", "__one", "n_docs"),
                     ("sum", "removed", "n_removed"),
                     ("sum", "chars_removed", "chars_removed")])
    return out.sort("source")


def q_daily_user_growth(sf_dir: str) -> rd.Dataset:
    """Daily new-vs-returning users (composition): per-user first-seen
    day via the min combiner, per-(day,user) batch-local dedup before
    the distinct-count combine, day-sized finish computes returning =
    active − new and the running cum_users prefix in one tiny task."""
    from belb_ray.stages.agg import preagg_groupby

    ev = _t(sf_dir, "events", columns=["user_id", "ts"])

    def _day(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"user_id": b["user_id"],
                             "day": b["ts"].dt.strftime("%Y-%m-%d")})

    du = ev.map_batches(_day, batch_format="pandas")
    first = preagg_groupby(du, ["user_id"], [("min", "day", "first_day")])
    new_per_day = preagg_groupby(
        first.map_batches(lambda b: pd.DataFrame(
            {"day": b["first_day"], "__one": np.int64(1)}),
            batch_format="pandas"),
        ["day"], [("sum", "__one", "n_new")])

    def _dedup_pairs(b: pd.DataFrame) -> pd.DataFrame:
        return b[["day", "user_id"]].drop_duplicates().assign(
            __one=np.int64(1))

    active = preagg_groupby(
        du.map_batches(_dedup_pairs, batch_format="pandas"),
        ["day", "user_id"], [("sum", "__one", "__n")])
    active = preagg_groupby(
        active.map_batches(lambda b: pd.DataFrame(
            {"day": b["day"], "__one": np.int64(1)}),
            batch_format="pandas"),
        ["day"], [("sum", "__one", "n_active")])

    def _tag(name: str, col: str):
        def fn(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({"day": b["day"], name: b[col]})

        return fn

    both = (active.map_batches(_tag("n_active", "n_active"),
                               batch_format="pandas")
            .union(new_per_day.map_batches(_tag("n_new", "n_new"),
                                           batch_format="pandas")))

    def _finish(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("day", sort=True).sum(min_count=1).reset_index()
        n_new = g["n_new"].fillna(0).astype(np.int64)
        n_active = g["n_active"].fillna(0).astype(np.int64)
        return pd.DataFrame({
            "day": g["day"], "n_active": n_active, "n_new": n_new,
            "n_returning": n_active - n_new,
            "cum_users": n_new.cumsum()})

    return (both.repartition(1)
            .map_batches(_finish, batch_size=None,
                         batch_format="pandas").sort("day"))


def q_user_coverage_spans(sf_dir: str) -> rd.Dataset:
    """Interval union per user (stages/intervals.merge_intervals): each
    event covers [ts, ts + value seconds] (exact integer microseconds
    via cents arithmetic); overlapping/touching spans coalesce into
    maximal islands with one hash(user) co-location shuffle. Oracle =
    gaps-and-islands window form."""
    from belb_ray.stages.intervals import merge_intervals

    ev = _t(sf_dir, "events", columns=["user_id", "ts", "value"])

    def _iv(b: pd.DataFrame) -> pd.DataFrame:
        s = b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        dur = (round_half_away(b["value"].to_numpy(np.float64) * 100)
               .astype(np.int64) * 10_000)
        return pd.DataFrame({"user_id": b["user_id"],
                             "start_us": s, "end_us": s + dur})

    out = merge_intervals(ev.map_batches(_iv, batch_format="pandas"),
                          "user_id", "start_us", "end_us")
    return out.sort(["user_id", "start_us"])


def q_part_pagerank_weighted(sf_dir: str) -> rd.Dataset:
    """Weighted PageRank (stages/graph.pagerank with weight_col): edge
    weight = number of orders sharing the part pair; contributions split
    proportionally to weight (share = rank·w / Σ_out w). Same
    broadcast-attach + combiner iteration shape as the unweighted op."""
    from belb_ray.stages.agg import preagg_groupby
    from belb_ray.stages.cooccur import cooccurrence_pairs
    from belb_ray.stages.graph import pagerank

    li = _t(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    pairs = cooccurrence_pairs(li, "l_orderkey", "l_partkey")
    und = preagg_groupby(pairs, ["a", "b"], [("count", "", "w")])

    def _mirror(batch: pa.Table) -> pa.Table:
        fwd = pa.table({"src": batch["a"], "dst": batch["b"],
                        "w": batch["w"]})
        rev = pa.table({"src": batch["b"], "dst": batch["a"],
                        "w": batch["w"]})
        return pa.concat_tables([fwd, rev])

    edges = und.map_batches(_mirror, batch_format="pyarrow")
    pr = pagerank(edges, iters=3, weight_col="w")

    def _round(batch: pd.DataFrame) -> pd.DataFrame:
        batch["rank"] = round_half_away(batch["rank"], 9)
        return batch

    return (pr.map_batches(_round, batch_format="pandas")
            .sort(["rank", "node"], descending=[True, False]).limit(30))


def q_lineitem_corr_matrix(sf_dir: str) -> rd.Dataset:
    """Full correlation matrix in ONE data pass
    (stages/agg.corr_matrix): each block ships n, Σx and the XᵀX upper
    triangle (fixed width regardless of rows); all 6 pairwise
    correlations finish closed-form from the same partials."""
    from belb_ray.stages.agg import corr_matrix

    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    out = corr_matrix(_t(sf_dir, "lineitem").select_columns(cols), cols)
    return out.sort(["col_a", "col_b"])


def q_priority_geo_mean(sf_dir: str) -> rd.Dataset:
    """Geometric mean per group (composition): ln-transform in the map,
    mean combiner, exp at the finish — the multiplicative-average shape
    (price indices, growth rates) the arithmetic combiner can't give."""
    from belb_ray.stages.agg import preagg_groupby

    orders = _t(sf_dir, "orders", columns=["o_orderpriority", "o_totalprice"])

    def _ln(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "o_orderpriority": b["o_orderpriority"],
            "lnp": np.log(b["o_totalprice"].to_numpy(np.float64))})

    m = preagg_groupby(orders.map_batches(_ln, batch_format="pandas"),
                       ["o_orderpriority"], [("mean", "lnp", "mean_ln")])

    def _fin(b: pd.DataFrame) -> pd.DataFrame:
        b["geo_mean_price"] = round_half_away(np.exp(b["mean_ln"]), 4)
        return b.drop(columns=["mean_ln"])

    return m.map_batches(_fin, batch_format="pandas") \
        .sort("o_orderpriority")


def q_dup_size_histogram(sf_dir: str) -> rd.Dataset:
    """Dup-cluster-size histogram (composition): exact-dup groups →
    count of clusters per size — the shape-of-duplication report a
    dedup run publishes."""
    from belb_ray.pipelines.docdedup import exact_dup_groups
    from belb_ray.stages.agg import preagg_groupby

    groups = exact_dup_groups(_t(sf_dir, "documents"))
    out = preagg_groupby(
        groups.map_batches(lambda b: pd.DataFrame(
            {"cluster_size": b["n_dups"], "__one": np.int64(1)}),
            batch_format="pandas"),
        ["cluster_size"], [("sum", "__one", "n_clusters")])
    return out.sort("cluster_size")


def q_nation_revenue_share(sf_dir: str) -> rd.Dataset:
    """Percent-of-total (composition): per-nation revenue via the
    broadcast dim join + cents combiner; the share divides by the global
    total derived from the SAME tiny aggregate (no second corpus
    pass)."""
    from belb_ray.stages.agg import preagg_groupby
    from belb_ray.stages.joins import broadcast_join

    cust = _t(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    orders = _t(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def _cents(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "c_custkey": b["o_custkey"],
            "cents": round_half_away(b["o_totalprice"].to_numpy(np.float64)
                              * 100).astype(np.int64)})

    joined = broadcast_join(orders.map_batches(_cents,
                                               batch_format="pandas"),
                            cust, keys="c_custkey")
    per_nation = preagg_groupby(joined, ["c_nationkey"],
                                [("sum", "cents", "cents")])

    def _share(df: pd.DataFrame) -> pd.DataFrame:
        total = df["cents"].sum()
        df["revenue"] = df["cents"].to_numpy(np.float64) / 100.0
        df["share"] = round_half_away(df["cents"].to_numpy(np.float64)
                               / np.float64(total), 8)
        return df.drop(columns=["cents"])

    return (per_nation.repartition(1)
            .map_batches(_share, batch_size=None, batch_format="pandas")
            .sort("c_nationkey"))


def q_weekly_revenue_growth(sf_dir: str) -> rd.Dataset:
    """Period-over-period growth (composition): weekly revenue cents
    combiner → week-sized finish computes prev_revenue and growth_pct
    ((cur − prev)/prev, 6dp) in one tiny ordered pass."""
    from belb_ray.stages.agg import preagg_groupby

    orders = _t(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def _week(b: pd.DataFrame) -> pd.DataFrame:
        d = pd.to_datetime(b["o_orderdate"])
        monday = d - pd.to_timedelta(d.dt.weekday, unit="D")
        return pd.DataFrame({
            "week": monday.dt.strftime("%Y-%m-%d"),
            "cents": round_half_away(b["o_totalprice"].to_numpy(np.float64)
                              * 100).astype(np.int64)})

    weekly = preagg_groupby(orders.map_batches(_week,
                                               batch_format="pandas"),
                            ["week"], [("sum", "cents", "cents")])

    def _growth(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("week")
        rev = df["cents"].to_numpy(np.float64) / 100.0
        prev = np.concatenate([[np.nan], rev[:-1]])
        with np.errstate(invalid="ignore"):
            growth = round_half_away((rev - prev) / prev, 6)
        return pd.DataFrame({"week": df["week"], "revenue": rev,
                             "prev_revenue": prev,
                             "growth_pct": growth})

    return (weekly.repartition(1)
            .map_batches(_growth, batch_size=None,
                         batch_format="pandas").sort("week"))


def q_snm_pairs(sf_dir: str) -> rd.Dataset:
    """Sorted-neighborhood blocking pairs (stages/linkage.
    sorted_neighborhood_pairs): window pairs over the global
    (p_name, p_partkey) order via the two-phase prefix-bin rank — no
    global sort materialization, bounded 2x chunk replication."""
    from belb_ray.stages.linkage import sorted_neighborhood_pairs

    part = _t(sf_dir, "part", columns=["p_partkey", "p_name"])
    return sorted_neighborhood_pairs(part, "p_partkey", "p_name", window=4)


def q_name_jw_pairs(sf_dir: str) -> rd.Dataset:
    """Jaro-Winkler-scored sorted-neighborhood candidates: SNM window
    pairs over part names (carry_sort=True so the scorer needs no join)
    scored by the vectorized JW kernel (functions/similarity.
    jaro_winkler_batch) — cross-engine check of the flagship's scoring
    kernel against DuckDB's jaro_winkler_similarity, bit-identical."""
    from belb_ray.functions.similarity import jaro_winkler_batch
    from belb_ray.stages.linkage import sorted_neighborhood_pairs

    part = _t(sf_dir, "part", columns=["p_partkey", "p_name"])
    pairs = sorted_neighborhood_pairs(part, "p_partkey", "p_name",
                                      window=8, carry_sort=True)

    def _score(batch: pd.DataFrame) -> pd.DataFrame:
        jw = jaro_winkler_batch(batch["sort_a"].tolist(),
                                batch["sort_b"].tolist())
        keep = jw >= 0.85
        return pd.DataFrame({
            "id_a": batch["id_a"].to_numpy()[keep],
            "id_b": batch["id_b"].to_numpy()[keep],
            "jw": round_half_away(jw[keep], 6)})

    return pairs.map_batches(_score, batch_format="pandas")


def q_name_monge_elkan(sf_dir: str) -> rd.Dataset:
    """Symmetric Monge-Elkan name similarity over SNM candidate pairs
    (functions/similarity.monge_elkan_batch): per-token max-JW means in
    both directions — the multi-token scorer that survives word swaps
    the flat JW misses. Oracle rebuilds it in DuckDB from unnested
    token positions and jaro_winkler_similarity."""
    from belb_ray.functions.similarity import monge_elkan_batch
    from belb_ray.stages.linkage import sorted_neighborhood_pairs

    part = _t(sf_dir, "part", columns=["p_partkey", "p_name"])
    pairs = sorted_neighborhood_pairs(part, "p_partkey", "p_name",
                                      window=8, carry_sort=True)

    def _score(batch: pd.DataFrame) -> pd.DataFrame:
        me = monge_elkan_batch(batch["sort_a"].tolist(),
                               batch["sort_b"].tolist())
        keep = me >= 0.92
        return pd.DataFrame({
            "id_a": batch["id_a"].to_numpy()[keep],
            "id_b": batch["id_b"].to_numpy()[keep],
            "me": round_half_away(me[keep], 6)})

    return pairs.map_batches(_score, batch_format="pandas")


def q_name_soundex(sf_dir: str) -> rd.Dataset:
    """American Soundex phonetic codes per part name (stages/linkage.
    soundex_codes): the phonetic-key blocking family — names that sound
    alike share a key — complementing order-based (SNM) and
    deletion-based (FastSS) blocking. Pure streaming map_batches with
    pandas C-string kernels; the oracle re-derives the code in DuckDB
    from translate + run-collapse regexes, bit-identical."""
    from belb_ray.stages.linkage import soundex_codes

    part = _t(sf_dir, "part", columns=["p_partkey", "p_name"])
    return soundex_codes(part, "p_partkey", "p_name")


def q_user_freq_cms(sf_dir: str) -> rd.Dataset:
    """Count-min-sketch point-frequency estimates (stages/sketch.
    cms_sketch + cms_estimate): linear sketch, cell-wise-summing
    partials bound the exchange at depth x width per block; probes
    stream against the broadcast matrix. width=64 < 150 users, so real
    collisions exercise the min-across-rows bound."""
    from belb_ray.stages.agg import preagg_groupby
    from belb_ray.stages.sketch import cms_estimate, cms_sketch

    ev = _t(sf_dir, "events", columns=["user_id"])
    cms = cms_sketch(ev, "user_id", depth=4, width=64)
    distinct = preagg_groupby(ev, ["user_id"], [("count", "", "_n")])

    def _sel(b: pd.DataFrame) -> pd.DataFrame:
        u = b["user_id"].to_numpy(np.int64)
        return pd.DataFrame({"user_id": u[u % 20 == 0]})

    probes = distinct.map_batches(_sel, batch_format="pandas")
    return cms_estimate(cms, probes, "user_id", depth=4, width=64)


def q_doc_readability(sf_dir: str) -> rd.Dataset:
    """Flesch-style readability per document (stages/docstats.
    readability_scores): streaming C-regex kernels, no shuffle; proxies
    (word runs / sentence-punct runs / vowel groups) chosen for exact
    SQL-mirror parity."""
    from belb_ray.stages.docstats import readability_scores

    return readability_scores(_t(sf_dir, "documents"))


def q_supplier_key_skew(sf_dir: str) -> pd.DataFrame:
    """Partition-key skew diagnostic (stages/corpus.key_skew_profile)
    over lineitem.l_suppkey: per-key counts → fixed-width moment
    partials → one summary row (top_share, cv)."""
    from belb_ray.stages.corpus import key_skew_profile

    return key_skew_profile(_t(sf_dir, "lineitem"), "l_suppkey")


def q_doc_jaccard_join(sf_dir: str) -> rd.Dataset:
    """Exact set-similarity self-join with prefix filtering
    (stages/setsim.jaccard_similarity_join, PPJoin-style): provably
    complete candidates from rarest-first prefixes — the exact
    complement to the MinHash LSH paths (no recall loss). Oracle is the
    brute-force all-pairs word-Jaccard in SQL, which certifies both the
    scores AND the prefix filter's completeness."""
    from belb_ray.stages.setsim import jaccard_similarity_join

    out = jaccard_similarity_join(_t(sf_dir, "documents"), 0.95)

    def _round(b: pd.DataFrame) -> pd.DataFrame:
        b["jaccard"] = round_half_away(b["jaccard"].to_numpy(np.float64), 6)
        return b

    return out.map_batches(_round, batch_format="pandas")


def q_dedup_threshold_sweep(sf_dir: str) -> rd.Dataset:
    """Dedup-aggressiveness sweep (pipelines/docdedup.dedup_sweep):
    docs dropped/kept per candidate Jaccard threshold under the
    min-id-wins near-dup rule. One EXACT prefix-filtered set-similarity
    join at the grid minimum feeds a per-doc max combiner and a
    fixed-width histogram — grid size is free. Oracle = the same
    all-pairs word-Jaccard self-join in SQL with a correlated count per
    grid value (exact join → bit-identical double ratios)."""
    from belb_ray.pipelines.docdedup import dedup_sweep

    return dedup_sweep(_t(sf_dir, "documents"),
                       [0.98, 0.95, 0.9, 0.85])


def q_part_components(sf_dir: str) -> rd.Dataset:
    """Standalone connected components (stages/cluster.
    connected_components — the ER flagship's transitive-closure engine
    exposed on a generic edge list): block-local union-find contraction,
    driver solve under local_threshold, label-propagation loop above.
    Oracle = pinned golden from an independent dict union-find."""
    from belb_ray.stages.cluster import connected_components
    from belb_ray.stages.cooccur import cooccurrence_pairs

    li = _t(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    pairs = cooccurrence_pairs(li, "l_orderkey", "l_partkey")

    def _rename(b: pa.Table) -> pa.Table:
        return b.rename_columns(["id_a", "id_b"])

    return connected_components(pairs.map_batches(
        _rename, batch_format="pyarrow"))


def q_jl_projection(sf_dir: str) -> rd.Dataset:
    """Johnson-Lindenstrauss random projection (stages/pca.jl_project):
    seed-derived Gaussian matrix broadcast once, one float64 GEMM per
    batch, zero shuffles — the streaming distance-preserving reduction
    for embedding dedup/ANN preprocessing."""
    from belb_ray.stages.pca import jl_project

    out = jl_project(_t(sf_dir, "embeddings"), "embedding", 6,
                     seed=0, id_cols=["vec_id"])

    def _round(b: pd.DataFrame) -> pd.DataFrame:
        for c in b.columns:
            if c.startswith("jl"):
                b[c] = round_half_away(b[c].to_numpy(np.float64), 6)
        return b

    return out.map_batches(_round, batch_format="pandas")


def q_fs_linkage_weights(sf_dir: str) -> pd.DataFrame:
    """Fellegi-Sunter probabilistic linkage weights (stages/fellegi.
    fs_em_weights): EM over SNM candidate pairs' binary agreement
    features (JW-name ≥ 0.9, brand, type) — one fixed-width partial
    row per block per iteration, no shuffles; 2^-30 posterior
    quantization makes the fit bit-deterministic. Oracle = pinned golden
    from an independent single-process EM over SQL-derived pairs."""
    from belb_ray.functions.similarity import jaro_winkler_batch
    from belb_ray.stages.fellegi import fs_em_weights
    from belb_ray.stages.linkage import sorted_neighborhood_pairs

    part = _t(sf_dir, "part", columns=["p_partkey", "p_name", "p_brand", "p_type"])
    # attributes ride the SNM shuffles (carry_cols): the pair generator
    # already co-locates both rows, so feature attach needs NO join
    pairs = sorted_neighborhood_pairs(
        part, "p_partkey", "p_name", window=8, carry_sort=True,
        carry_cols=["p_brand", "p_type"])

    def _feat(b: pd.DataFrame) -> pd.DataFrame:
        jw = jaro_winkler_batch(b["sort_a"].tolist(), b["sort_b"].tolist())
        return pd.DataFrame({
            "agree_name": (jw >= 0.9).astype(np.int8),
            "agree_brand": (b["p_brand_a"].to_numpy()
                            == b["p_brand_b"].to_numpy()).astype(np.int8),
            "agree_type": (b["p_type_a"].to_numpy()
                           == b["p_type_b"].to_numpy()).astype(np.int8),
        })

    feats = pairs.map_batches(_feat, batch_format="pandas")
    return fs_em_weights(
        feats, ["agree_name", "agree_brand", "agree_type"], iters=15)


def q_fs_pattern_posteriors(sf_dir: str) -> rd.Dataset:
    """Fellegi-Sunter agreement-pattern table (stages/fellegi.
    fs_score_pairs + a pattern count): the classical FS decision device —
    fit m/u/prior by EM over SNM candidate agreement vectors, then one
    row per OBSERVED agreement pattern with its pair count, composite
    log2 weight, and P(match|x) posterior from the fitted (8dp-rounded,
    determinism contract) parameters. Pattern-level output is
    scale-stable (≤ 2^k rows at any corpus size) where a per-pair
    posterior cutoff is not — at sf0.1 the SNM window makes agree_name
    nearly universal and no pair clears 0.5. Per-pair scoring is the
    library op ``fs_score_pairs`` (tested on planted structure). Oracle
    = pinned golden from the independent single-process EM + scoring
    (tools/make_goldens.py golden_fs_pattern_posteriors)."""
    from belb_ray.functions.similarity import jaro_winkler_batch
    from belb_ray.stages.agg import preagg_groupby
    from belb_ray.stages.fellegi import fs_em_weights, fs_score_pairs
    from belb_ray.stages.linkage import sorted_neighborhood_pairs

    part = _t(sf_dir, "part", columns=["p_partkey", "p_name", "p_brand", "p_type"])
    pairs = sorted_neighborhood_pairs(
        part, "p_partkey", "p_name", window=8, carry_sort=True,
        carry_cols=["p_brand", "p_type"])

    def _feat(b: pd.DataFrame) -> pd.DataFrame:
        jw = jaro_winkler_batch(b["sort_a"].tolist(), b["sort_b"].tolist())
        return pd.DataFrame({
            "id_a": b["id_a"].to_numpy(),
            "id_b": b["id_b"].to_numpy(),
            "agree_name": (jw >= 0.9).astype(np.int8),
            "agree_brand": (b["p_brand_a"].to_numpy()
                            == b["p_brand_b"].to_numpy()).astype(np.int8),
            "agree_type": (b["p_type_a"].to_numpy()
                           == b["p_type_b"].to_numpy()).astype(np.int8),
        })

    feats = pairs.map_batches(_feat, batch_format="pandas").materialize()
    cols = ["agree_name", "agree_brand", "agree_type"]
    w = fs_em_weights(feats, cols, iters=15)
    scored = fs_score_pairs(feats, cols, w)
    out = preagg_groupby(
        scored, cols, [("count", "", "n_pairs"),
                       ("min", "weight", "weight"),
                       ("min", "posterior", "posterior")], num_buckets=8)
    return out.sort(cols)


def q_snm_blocking_quality(sf_dir: str) -> pd.DataFrame:
    """Blocking-scheme evaluation (the record-linkage methodology
    metrics): pairs completeness + reduction ratio of sorted-neighborhood
    blocking against the exact lev≤1 truth from FastSS — composition of
    sorted_neighborhood_pairs, edit_distance_self_join and the
    distributed INTERSECT; only counts reach the driver."""
    from belb_ray.stages.linkage import (edit_distance_self_join,
                                         sorted_neighborhood_pairs)
    from belb_ray.stages.setops import set_intersect

    cust = _t(sf_dir, "customer", columns=["c_custkey", "c_name"])

    def _canon(b: pd.DataFrame) -> pd.DataFrame:
        a_ = b["id_a"].to_numpy()
        b_ = b["id_b"].to_numpy()
        return pd.DataFrame({"ia": np.minimum(a_, b_),
                             "ib": np.maximum(a_, b_)})

    cand = (sorted_neighborhood_pairs(cust, "c_custkey", "c_name",
                                      window=6)
            .map_batches(_canon, batch_format="pandas").materialize())
    truth = (edit_distance_self_join(cust, "c_custkey", "c_name", k=1)
             .map_batches(_canon, batch_format="pandas").materialize())
    ni = set_intersect(cand, truth, ["ia", "ib"]).count()
    n = cust.count()
    nc = cand.count()
    nt = truth.count()
    return pd.DataFrame({
        "n_candidates": np.array([nc], np.int64),
        "n_true": np.array([nt], np.int64),
        "n_matched": np.array([ni], np.int64),
        "pairs_completeness": [round_half_away(ni / nt, 6)],
        "reduction_ratio": [round_half_away(
            1.0 - nc / (float(n) * (float(n) - 1.0) / 2.0), 6)]})


def q_blocking_bcubed(sf_dir: str) -> pd.DataFrame:
    """B-cubed precision/recall/F1 (stages/linkage.bcubed) of first-token
    blocking against exact-name entities over parts — the standard
    extrinsic ER evaluation; everything reduces to the (cluster, gold)
    contingency table via one combiner groupby, so only label-pair counts
    ever shuffle. Oracle = the same Σ n_cg²/n_c identity in SQL."""
    from belb_ray.stages.linkage import bcubed

    part = _t(sf_dir, "part", columns=["p_name"])

    def _labels(batch: pd.DataFrame) -> pd.DataFrame:
        nm = batch["p_name"].astype(str)
        return pd.DataFrame({"cluster": nm.str.split(" ").str[0],
                             "gold": nm})

    return bcubed(part.map_batches(_labels, batch_format="pandas"),
                  "cluster", "gold")


def q_name_one2one_match(sf_dir: str) -> rd.Dataset:
    """Unique-mapping record linkage (stages/linkage.one_to_one_match):
    JW-scored SNM candidates over customer names, then greedy max-weight
    one-to-one matching via locally-dominant rounds (Preis 1999) — each
    round one node-bucket argmin combine + a pair-bucket mutuality check,
    provably equal to the sequential greedy matching. Golden oracle:
    independent single-process greedy over brute-forced SNM candidates."""
    from belb_ray.functions.similarity import jaro_winkler_batch
    from belb_ray.stages.linkage import (one_to_one_match,
                                         sorted_neighborhood_pairs)

    cust = _t(sf_dir, "customer", columns=["c_custkey", "c_name"])
    pairs = sorted_neighborhood_pairs(cust, "c_custkey", "c_name",
                                      window=8, carry_sort=True)

    def _score(batch: pd.DataFrame) -> pd.DataFrame:
        jw = jaro_winkler_batch(batch["sort_a"].tolist(),
                                batch["sort_b"].tolist())
        keep = jw >= 0.9
        return pd.DataFrame({
            "id_a": batch["id_a"].to_numpy()[keep],
            "id_b": batch["id_b"].to_numpy()[keep],
            "score": round_half_away(jw[keep], 6)})

    out = one_to_one_match(pairs.map_batches(_score,
                                             batch_format="pandas"))
    return out.sort(["id_a", "id_b"])


def q_purchase_attribution(sf_dir: str) -> rd.Dataset:
    """Last-touch conversion attribution (stages/funnel.
    last_touch_attribution): every purchase attributed to the user's
    most recent prior click within 24 h — type-pruned BEFORE the single
    hash(user) shuffle, segmented forward-carry of the last touch index
    inside each bucket (no window self-join). Oracle = last_value
    IGNORE NULLS OVER (... ROWS 1 PRECEDING)."""
    from belb_ray.stages.funnel import last_touch_attribution

    ev = _t(sf_dir, "events", columns=["event_id", "user_id", "event_type", "ts"])
    out = last_touch_attribution(ev, "user_id", "event_type", "ts",
                                 "event_id", conversion_type="purchase",
                                 touch_type="click")
    return out.sort("conversion_id")


def q_user_value_twa(sf_dir: str) -> rd.Dataset:
    """Step-hold time-weighted average of event value per user
    (stages/analytic.time_weighted_mean): the right mean for
    irregularly-sampled series — one hash(user) co-location shuffle,
    exact integer-µs interval arithmetic, v·Δus float64 weights.
    Oracle = lead() OVER + sum(v·Δ)/(max−min) in SQL."""
    from belb_ray.stages.analytic import time_weighted_mean

    ev = _t(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])
    out = time_weighted_mean(ev, "user_id", "ts", "value", "event_id")
    return out.sort("user_id")


def q_user_streaks(sf_dir: str) -> rd.Dataset:
    """Longest consecutive-active-day streak per user (stages/analytic.
    active_streaks): batch-local (user, day) dedup → one co-location
    shuffle → vectorized gaps-and-islands (day − rank constant within a
    run). Oracle = the classic row_number island trick in SQL."""
    from belb_ray.stages.analytic import active_streaks

    ev = _t(sf_dir, "events", columns=["user_id", "ts"])
    return active_streaks(ev, "user_id", "ts").sort("user_id")


def q_boilerplate_stats(sf_dir: str) -> rd.Dataset:
    """Cross-doc boilerplate phrases (stages/curation.boilerplate_stats):
    word 3-grams in ≥ 5 distinct docs are boilerplate; per-doc instance
    counts + boilerplate ratio. One exploded-gram materialization reused
    for document frequencies AND the hash(gram) mark-back join — the
    CCNet-style template-removal signal."""
    from belb_ray.stages.curation import boilerplate_stats

    docs = _t(sf_dir, "documents", columns=["doc_id", "text"])
    return boilerplate_stats(docs, n=3, min_df=5).sort("doc_id")


def q_doc_containment(sf_dir: str) -> rd.Dataset:
    """Containment search (stages/setsim.containment_topk): top-3 corpus
    docs per probe doc by shingle containment |S(q)∩S(d)|/|S(q)| — the
    LSH-Ensemble problem in exact small-probe form; probe shingle sets
    broadcast once, corpus streamed, per-query top-k via the grouped-topk
    combiner."""
    from belb_ray.stages.setsim import containment_topk

    docs = _t(sf_dir, "documents", columns=["doc_id", "text"])
    out = containment_topk(docs, query_ids=[0, 1, 2, 3, 4], k=3, n=3)
    return out.sort(["qid", "doc_id"])


def q_part_communities(sf_dir: str) -> rd.Dataset:
    """Synchronous label-propagation communities over the part
    co-purchase graph (stages/graph.label_propagation): 3 deterministic
    rounds, node-sized label table broadcast onto the edge list per
    round, neighbor-label counts combine in ONE bucketed shuffle, argmax
    rides the grouped-topk combiner. Oracle = 3 unrolled CTE rounds."""
    from belb_ray.stages.agg import preagg_groupby
    from belb_ray.stages.cooccur import cooccurrence_pairs
    from belb_ray.stages.graph import label_propagation

    li = _t(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    pairs = cooccurrence_pairs(li, "l_orderkey", "l_partkey")
    und = preagg_groupby(pairs, ["a", "b"],
                         [("count", "", "__n")]).drop_columns(["__n"])

    def _mirror(batch: pa.Table) -> pa.Table:
        fwd = pa.table({"src": batch["a"], "dst": batch["b"]})
        rev = pa.table({"src": batch["b"], "dst": batch["a"]})
        return pa.concat_tables([fwd, rev])

    edges = und.map_batches(_mirror, batch_format="pyarrow")
    return label_propagation(edges, iters=3).sort("node")


def q_part_shortest_paths(sf_dir: str) -> rd.Dataset:
    """Multi-source weighted shortest paths ≤3 hops over the part
    co-purchase graph (stages/graph.shortest_paths, Bellman–Ford with a
    fixed round count): edge weight = co-purchase multiplicity, integer
    distances exact end-to-end; per round the reached-node distance
    table broadcasts onto the edges and relaxed candidates ride a MIN
    combiner. Oracle = bounded-depth recursive CTE accumulating d+w."""
    from belb_ray.stages.agg import preagg_groupby
    from belb_ray.stages.cooccur import cooccurrence_pairs
    from belb_ray.stages.graph import shortest_paths

    li = _t(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    pairs = cooccurrence_pairs(li, "l_orderkey", "l_partkey")
    und = preagg_groupby(pairs, ["a", "b"], [("count", "", "w")])

    def _mirror(batch: pa.Table) -> pa.Table:
        fwd = pa.table({"src": batch["a"], "dst": batch["b"],
                        "w": batch["w"]})
        rev = pa.table({"src": batch["b"], "dst": batch["a"],
                        "w": batch["w"]})
        return pa.concat_tables([fwd, rev])

    edges = und.map_batches(_mirror, batch_format="pyarrow")

    def _seed(t: pa.Table) -> pa.Table:
        k = t["p_partkey"].combine_chunks()
        mask = pa.array(k.to_numpy(zero_copy_only=False) % 200 == 0)
        return pa.table({"node": k.filter(mask)})

    seeds = (_t(sf_dir, "part", columns=["p_partkey"])
             .map_batches(_seed, batch_format="pyarrow"))
    return shortest_paths(edges, seeds, max_hops=3).sort("node")


def q_user_value_ewma(sf_dir: str) -> rd.Dataset:
    """Trailing-window exponential smoothing of each user's event
    values (stages/analytic.trailing_ewma): α = 0.5 over the last 8
    events — dyadic weights × integer cents make every partial sum an
    exact dyadic rational, so the distributed result is bit-identical
    to the SQL rank-difference self-join mirror. ONE hash(user)
    co-location shuffle; 8 vectorized shifted multiply-adds per
    bucket."""
    from belb_ray.stages.analytic import trailing_ewma

    ev = _t(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])

    def _cents(b: pd.DataFrame) -> pd.DataFrame:
        b["cents"] = round_half_away(
            b["value"].to_numpy(np.float64) * 100).astype(np.int64)
        return b.drop(columns=["value"])

    sm = trailing_ewma(ev.map_batches(_cents, batch_format="pandas"),
                       "user_id", ["ts", "event_id"], "cents",
                       alpha=0.5, window=8)
    return (sm.select_columns(["user_id", "event_id", "ewma"])
            .sort(["user_id", "event_id"]))


def q_value_ks_drift(sf_dir: str) -> rd.Dataset:
    """Two-sample KS drift (stages/drift.ks_drift) between the even-
    and odd-event_id halves of the event stream: each side reduces to a
    fixed-width (bin, count) histogram via a combiner (rows never
    shuffle); the bin-sized finish computes exact-integer cumulative
    CDFs. max(ks_contrib) is the KS statistic. Oracle mirrors the
    window-cumsum arithmetic."""
    from belb_ray.stages.drift import ks_drift

    ev = _t(sf_dir, "events", columns=["event_id", "value"])

    def _half(parity: int):
        def fn(t: pa.Table) -> pa.Table:
            ids = t["event_id"].combine_chunks().to_numpy(
                zero_copy_only=False)
            return t.filter(pa.array(ids % 2 == parity))

        return fn

    ref = ev.map_batches(_half(0), batch_format="pyarrow")
    cand = ev.map_batches(_half(1), batch_format="pyarrow")
    return ks_drift(ref, cand, "value", bin_width=25.0).sort("bin")


def q_user_skyline(sf_dir: str) -> rd.Dataset:
    """Pareto-frontier users by (total event value, event count)
    (stages/analytic.skyline2d): per-user totals via the exact-cents
    combiner, then the lossless local-skyline → tiny-survivor-finish
    dominance pass (SQL NOT EXISTS mirror)."""
    from belb_ray.stages.agg import preagg_groupby
    from belb_ray.stages.analytic import skyline2d

    ev = _t(sf_dir, "events", columns=["user_id", "value"])

    def _cents(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": b["user_id"],
            "cents": round_half_away(b["value"].to_numpy(np.float64)
                              * 100).astype(np.int64)})

    per_user = preagg_groupby(
        ev.map_batches(_cents, batch_format="pandas"), ["user_id"],
        [("sum", "cents", "cents"), ("count", "", "n")])
    return skyline2d(per_user, "cents", "n").sort("user_id")


def q_part_cosine_sim(sf_dir: str) -> rd.Dataset:
    """Item–item cosine similarity over customer purchase baskets
    (stages/cooccur.item_cosine_pairs): lineitem ⋈ orders gives the
    (customer, part) bipartite incidence; co-support rides the
    cooccurrence pair machinery, per-part supports a distinct-count
    combiner, cosine = c/√(sup_a·sup_b). Oracle = SQL self-join over
    the distinct incidence with the same arithmetic."""
    from belb_ray.stages.analytic import _attach_small
    from belb_ray.stages.cooccur import item_cosine_pairs

    li = _t(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    ords = _t(sf_dir, "orders", columns=["o_orderkey", "o_custkey"]).map_batches(
        lambda b: b.rename(columns={"o_orderkey": "l_orderkey"}),
        batch_format="pandas")
    # orders is the per-key side table here (one custkey per orderkey)
    # — size-guarded broadcast attach, partitioned-join fallback
    inc = _attach_small(li, ords, "l_orderkey").select_columns(
        ["o_custkey", "l_partkey"])
    out = item_cosine_pairs(inc, "o_custkey", "l_partkey",
                            min_cosupport=3)
    return out.sort(["a", "b"])


def q_user_value_gini(sf_dir: str) -> rd.Dataset:
    """Per-user Gini concentration of event values
    (stages/analytic.grouped_gini): the (key, value) → count histogram
    combiner runs before the one co-location shuffle, ties fold to one
    exact integer rank-sum multiply per distinct value — the per-group
    inequality audit of a curation run."""
    from belb_ray.stages.analytic import grouped_gini

    ev = _t(sf_dir, "events", columns=["user_id", "value"])
    return grouped_gini(ev, "user_id", "value").sort("user_id")


def q_token_js_drift(sf_dir: str) -> rd.Dataset:
    """Jensen–Shannon vocabulary drift (stages/drift.js_divergence)
    between the even- and odd-doc_id halves of the corpus: each side
    reduces to a vocabulary-bounded token-count table with an Arrow
    value_counts combiner; the join + ½p·ln(p/m) finish run in one
    vocabulary-sized task."""
    from belb_ray.stages.drift import js_divergence

    docs = _t(sf_dir, "documents", columns=["doc_id", "text"])

    def _half(parity: int):
        def fn(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].combine_chunks().to_numpy(
                zero_copy_only=False)
            return t.filter(pa.array(ids % 2 == parity))

        return fn

    ref = docs.map_batches(_half(0), batch_format="pyarrow")
    cand = docs.map_batches(_half(1), batch_format="pyarrow")
    return js_divergence(ref, cand, "text").sort("tok")


def q_nb_lang_scores(sf_dir: str) -> rd.Dataset:
    """Multinomial Naive Bayes posterior surface
    (stages/classify.nb_classify): fit add-1 token likelihoods per lang
    from the corpus itself (vocabulary×label count combiner), score
    every doc against every label via one size-guarded likelihood
    attach + per-doc sum combiner. Full (doc, label, log_score) output
    — hash-comparable without argmax float-tie hazards."""
    from belb_ray.stages.classify import nb_classify

    docs = _t(sf_dir, "documents")
    return nb_classify(docs, id_col="doc_id", text_col="text",
                       label_col="lang").sort(["doc_id", "label"])


def q_user_value_autocorr(sf_dir: str) -> rd.Dataset:
    """Per-user lag-1 autocorrelation of event values — the
    burstiness/trend signal of a user's stream. Composition: one
    ordered_window co-location shuffle attaches lag(value), then
    grouped_corr ships six raw moments per user (rows never shuffle
    again); 4dp oracle compare vs LAG OVER + corr()."""
    from belb_ray.stages.agg import grouped_corr
    from belb_ray.stages.analytic import ordered_window

    ev = _t(sf_dir, "events", columns=["user_id", "event_id", "ts", "value"]).map_batches(
        lambda b: b.assign(ts_us=b["ts"].astype("int64")),
        batch_format="pandas").drop_columns(["ts"])
    lagged = ordered_window(ev, "user_id", ["ts_us", "event_id"],
                            [("lag", "value", "prev_value")])

    def _drop_first(b: pd.DataFrame) -> pd.DataFrame:
        return b[b["prev_value"].notna()][
            ["user_id", "value", "prev_value"]]

    lagged = lagged.map_batches(_drop_first, batch_format="pandas")
    out = grouped_corr(lagged, ["user_id"], "value", "prev_value",
                       out_col="autocorr")
    return _round_cols(out, {"autocorr": 4}).sort("user_id")


def q_corpus_checksum(sf_dir: str) -> rd.Dataset:
    """Order-independent content checksum of the corpus
    (stages/corpus.content_checksum): exact arbitrary-precision sum of
    per-row 60-bit md5 draws — one (count, partial) row per block, one
    tiny fold; the export/re-import equality certificate."""
    from belb_ray.stages.corpus import content_checksum

    return content_checksum(_t(sf_dir, "documents"), "text", seed=0)


def q_label_silhouette(sf_dir: str) -> rd.Dataset:
    """Simplified-silhouette clustering audit per embedding label
    (stages/vector.simplified_silhouette): unrounded label centroids
    broadcast once, per-batch vectorized Euclidean distances,
    per-label (Σs, n) combiner — the no-all-pairs cluster-quality
    check. Oracle mirrors a/b/max arithmetic over the centroid CTE."""
    from belb_ray.stages.vector import simplified_silhouette

    emb = _t(sf_dir, "embeddings", columns=["label", "embedding"])
    return simplified_silhouette(emb, "label", "embedding",
                                 dim=64).sort("label")


def q_ivf_recall(sf_dir: str) -> rd.Dataset:
    """ANN quality gate (composition): per-query recall@5 of the IVF
    approximate index vs the exact brute-force cosine top-k — both
    sides computed distributed, membership intersected with one
    (query, neighbor) combiner (side-tag sum: 3 = present in both),
    then a per-query hit count. The index-vs-truth evaluation every
    ANN deployment needs; oracle joins the exact-SQL top-k against the
    pinned IVF golden."""
    import pyarrow.parquet as pq

    from belb_ray.stages.agg import preagg_groupby
    from belb_ray.stages.ann import cosine_topk_search, ivf_topk

    emb = pq.read_table(f"{sf_dir.rstrip('/')}/embeddings.parquet")
    queries = emb.filter(pa.compute.less(emb["vec_id"], pa.scalar(16)))
    corpus = _t(sf_dir, "embeddings")
    ex = cosine_topk_search(corpus, queries, k=5)
    ap = ivf_topk(corpus, queries, k=5)

    def _tag(side: int):
        def fn(t: pa.Table) -> pa.Table:
            return pa.table({
                "query_id": t["query_id"],
                "neighbor_id": t["neighbor_id"],
                "__side": pa.array(
                    np.full(t.num_rows, side, np.int64))})

        return fn

    both = (ex.map_batches(_tag(1), batch_format="pyarrow")
            .union(ap.map_batches(_tag(2), batch_format="pyarrow")))
    per_pair = preagg_groupby(both, ["query_id", "neighbor_id"],
                              [("sum", "__side", "t")])

    def _hit(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "query_id": b["query_id"],
            "__hit": (b["t"] == 3).astype(np.int64)})

    hits = preagg_groupby(per_pair.map_batches(_hit, batch_format="pandas"),
                          ["query_id"], [("sum", "__hit", "hits")])

    def _recall(b: pd.DataFrame) -> pd.DataFrame:
        b["recall"] = round_half_away(b["hits"].to_numpy(np.float64) / 5.0, 6)
        return b

    return hits.map_batches(_recall, batch_format="pandas") \
        .sort("query_id")


def q_kcenter_sample(sf_dir: str) -> rd.Dataset:
    """Greedy k-center diversity sample over the embedding corpus
    (stages/vector.kcenter_sample): k streaming min-distance update
    passes, ≤1 candidate row per block per round — the coreset /
    diverse-subset selection step of embedding-curated training data.
    Oracle = pinned golden from the independent single-process greedy
    implementation of the same determinism spec."""
    from belb_ray.stages.vector import kcenter_sample

    emb = _t(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return kcenter_sample(emb, "vec_id", "embedding", dim=64, k=8)


def q_lang_source_mi(sf_dir: str) -> rd.Dataset:
    """Mutual information between document language and source
    (stages/drift.mutual_information): one pair-count combiner pass,
    cell-sized finish — Σ mi_contrib is I(lang; source) in nats."""
    from belb_ray.stages.drift import mutual_information

    return mutual_information(_t(sf_dir, "documents"), "lang",
                              "source").sort(["lang", "source"])


def q_mixture_plan(sf_dir: str) -> rd.Dataset:
    """Temperature-rebalanced mixture plan over document sources
    (stages/corpus.mixture_plan, α=0.5): per-source counts via one
    combiner, target shares ∝ n^α, downsampling-only rates with the
    rarest-boosted source pinned at 1.0."""
    from belb_ray.stages.corpus import mixture_plan

    return mixture_plan(_t(sf_dir, "documents"), "source", alpha=0.5)


def q_linkage_negatives(sf_dir: str) -> rd.Dataset:
    """Hard-negative pair mining for linkage-model training
    (composition): sorted-neighborhood candidates over customer names
    (near in sort order) MINUS the true edit-distance-≤1 matches — the
    distributed EXCEPT over canonicalized pairs. The training-data
    generation step of learned entity resolution."""
    from belb_ray.stages.linkage import (edit_distance_self_join,
                                         sorted_neighborhood_pairs)
    from belb_ray.stages.setops import set_except

    cust = _t(sf_dir, "customer", columns=["c_custkey", "c_name"])
    snm = sorted_neighborhood_pairs(cust, "c_custkey", "c_name",
                                    window=4)
    matches = edit_distance_self_join(cust, "c_custkey", "c_name", k=1)

    def _canon(b: pd.DataFrame) -> pd.DataFrame:
        a = b["id_a"].to_numpy()
        c = b["id_b"].to_numpy()
        return pd.DataFrame({"id_a": np.minimum(a, c),
                             "id_b": np.maximum(a, c)})

    return set_except(
        snm.map_batches(_canon, batch_format="pandas"),
        matches.map_batches(_canon, batch_format="pandas"),
        ["id_a", "id_b"]).sort(["id_a", "id_b"])


def q_vocab_coverage(sf_dir: str) -> rd.Dataset:
    """Vocabulary coverage curve (composition): what fraction of all
    token occurrences the top-k most frequent words cover, at k ∈
    {10, 100, 1000} — the Zipf head/tail audit behind tokenizer-vocab
    sizing. One corpus pass (ngram_counts combiner); the cumulative
    finish runs over the vocabulary-sized table in one task."""
    from belb_ray.stages.corpus import ngram_counts

    vocab = ngram_counts(_t(sf_dir, "documents"), n=1, top_k=None)

    def _cover(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["n_occurrences", "gram"],
                            ascending=[False, True], kind="mergesort")
        c = df["n_occurrences"].to_numpy(np.int64)
        cum = np.cumsum(c)
        total = float(cum[-1]) if len(cum) else 0.0
        ks = np.array([10, 100, 1000], np.int64)
        cov = np.array([cum[min(k, len(cum)) - 1] if len(cum) else 0
                        for k in ks], np.int64)
        return pd.DataFrame({
            "top_k": ks,
            "covered_occurrences": cov,
            "coverage": round_half_away(cov / total, 6) if total else 0.0})

    return vocab.repartition(1).map_batches(_cover, batch_size=None,
                                            batch_format="pandas")


def q_negative_pairs(sf_dir: str) -> rd.Dataset:
    """Contrastive negative-pair generation (composition): each doc
    paired with 2 pseudo-random partners via md5-derived rank offsets —
    partner_rank = ((rank−1) + md5(doc_id:j) mod (n−1) + 1) mod n + 1,
    which can never hit the doc itself. global_rank's two-phase prefix
    gives the dense positions; one hash join resolves partner ranks to
    ids. The deterministic negative-sampling step of embedding /
    linkage training. Oracle re-derives the identical arithmetic."""
    from belb_ray.stages.analytic import global_rank
    from belb_ray.stages.joins import hash_partition_join
    from belb_ray.stages.sampling import _md5_hash60

    docs = _t(sf_dir, "documents", columns=["doc_id", "n_chars"])
    n = docs.count()
    ranked = global_rank(docs, "n_chars", "doc_id").materialize()

    def _explode(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        rk = t["rank"].combine_chunks().to_numpy(zero_copy_only=False)
        out_id, out_j, out_pr = [], [], []
        for j in (0, 1):
            off = _md5_hash60(t["doc_id"].combine_chunks(), j) % (n - 1)
            pr = ((rk - 1) + off + 1) % n + 1
            out_id.append(ids)
            out_j.append(np.full(len(ids), j, np.int64))
            out_pr.append(pr)
        return pa.table({
            "doc_id": pa.array(np.concatenate(out_id)),
            "j": pa.array(np.concatenate(out_j)),
            "rank": pa.array(np.concatenate(out_pr))})

    probes = ranked.map_batches(_explode, batch_format="pyarrow")
    partners = ranked.map_batches(
        lambda t: pa.table({"rank": t["rank"], "neg_id": t["doc_id"]}),
        batch_format="pyarrow")
    out = hash_partition_join(probes, partners, key="rank")
    return out.select_columns(["doc_id", "j", "neg_id"]) \
        .sort(["doc_id", "j"])


def q_source_freshness(sf_dir: str) -> rd.Dataset:
    """Ingestion-freshness report per event type (composition): first /
    last event micro-timestamps and staleness vs the global watermark —
    one min/max/count combiner, one tiny finish; the ops dashboard
    behind incremental ingestion."""
    from belb_ray.stages.agg import preagg_groupby

    ev = _t(sf_dir, "events", columns=["event_type", "ts"]) \
        .map_batches(lambda b: pd.DataFrame({
            "event_type": b["event_type"],
            "ts_us": b["ts"].astype("int64")}), batch_format="pandas")
    per = preagg_groupby(ev, ["event_type"],
                         [("count", "", "n_events"),
                          ("min", "ts_us", "first_us"),
                          ("max", "ts_us", "last_us")])

    def _stale(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("event_type", kind="mergesort")
        wm = df["last_us"].max()
        df["staleness_s"] = (wm - df["last_us"]) // 1_000_000
        return df

    return per.repartition(1).map_batches(_stale, batch_size=None,
                                          batch_format="pandas")


def q_exact_value_quantiles(sf_dir: str) -> rd.Dataset:
    """EXACT global quantiles of event values WITHOUT a sort
    (stages/analytic.global_quantile_exact): iterative 4096-bin
    histogram refinement — O(bins) exchange per round, rows never
    shuffle; the final exact-value selection collects only the narrowed
    interval's distinct values. The "p99 of 10^12 rows" op."""
    from belb_ray.stages.analytic import global_quantile_exact

    ev = _t(sf_dir, "events", columns=["value"])
    return global_quantile_exact(ev, "value", [0.5, 0.9, 0.99])


def q_nation_join_size(sf_dir: str) -> rd.Dataset:
    """Join-cardinality estimation without running the join
    (stages/sketch.join_size_estimate): exact Σ na·nb via per-side
    count combiners + one pairing combine, AND the count-min linear-
    sketch estimate (min over depth of row dot products — overcounts
    only). The planner primitive behind join-order / skew decisions,
    over the deliberately quadratic customer ⋈ supplier nation join."""
    from belb_ray.stages.sketch import join_size_estimate

    cust = _t(sf_dir, "customer").map_batches(
        lambda t: pa.table({"k": t["c_nationkey"]}),
        batch_format="pyarrow")
    supp = _t(sf_dir, "supplier").map_batches(
        lambda t: pa.table({"k": t["s_nationkey"]}),
        batch_format="pyarrow")
    return join_size_estimate(cust, supp, "k")


def q_brand_weighted_median_price(sf_dir: str) -> rd.Dataset:
    """Per-brand lower weighted median part price, weighted by size
    (stages/analytic.grouped_weighted_median): (key, value)→Σweight
    combiner before the one shuffle; exact integer 2·cumw ≥ totw rule."""
    from belb_ray.stages.analytic import grouped_weighted_median

    part = _t(sf_dir, "part", columns=["p_brand", "p_retailprice", "p_size"])
    return grouped_weighted_median(part, "p_brand", "p_retailprice",
                                   "p_size").sort("p_brand")


def q_lang_id_kappa(sf_dir: str) -> rd.Dataset:
    """Cohen's kappa between the gold language labels and the trigram
    lang-ID predictions (composition): one confusion-cell combiner over
    a single streaming pass (the predictor runs in the same batch as the
    gold label — no join), exact-integer marginals, one-row finish. The
    labeler-agreement QA behind weak supervision."""
    from belb_ray.functions.textstats import lang_id
    from belb_ray.stages.agg import preagg_groupby

    docs = _t(sf_dir, "documents", columns=["lang", "text"])

    def _pred(t: pa.Table) -> pa.Table:
        return pa.table({
            "lang": t["lang"],
            "lang_pred": pa.array([lang_id(x) for x in
                                   t["text"].to_pylist()], pa.string())})

    cells = preagg_groupby(docs.map_batches(_pred, batch_format="pyarrow"),
                           ["lang", "lang_pred"], [("count", "", "n")])

    def _kappa(df: pd.DataFrame) -> pd.DataFrame:
        n = int(df["n"].sum())
        po_num = int(df.loc[df["lang"] == df["lang_pred"], "n"].sum())
        row = df.groupby("lang")["n"].sum()
        col = df.groupby("lang_pred")["n"].sum()
        pe_num = int(sum(int(row[l_]) * int(col[l_])
                         for l_ in row.index if l_ in col.index))
        po = po_num / n
        pe = pe_num / (n * n)
        return pd.DataFrame({
            "n": np.array([n], np.int64),
            "po": [round_half_away(po, 8)],
            "pe": [round_half_away(pe, 8)],
            "kappa": [round_half_away((po - pe) / (1 - pe), 8)]})

    return cells.repartition(1).map_batches(_kappa, batch_size=None,
                                            batch_format="pandas")


def q_user_gap_stats(sf_dir: str) -> rd.Dataset:
    """Per-user inter-event gap statistics (composition): one
    ordered_window co-location shuffle attaches lag(ts), gaps in
    seconds feed the raw-moment combiner (moment_stats), plus the
    burstiness coefficient of variation std/mean. Users with a single
    event (no gap pair) are excluded. 4dp compare (raw-moment fp)."""
    from belb_ray.stages.agg import moment_stats
    from belb_ray.stages.analytic import ordered_window

    ev = _t(sf_dir, "events", columns=["user_id", "event_id", "ts"]).map_batches(
        lambda b: b.assign(ts_us=b["ts"].astype("int64")),
        batch_format="pandas").drop_columns(["ts"])
    lagged = ordered_window(ev, "user_id", ["ts_us", "event_id"],
                            [("lag", "ts_us", "prev_us")])

    def _gap(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["prev_us"].notna()]
        return pd.DataFrame({
            "user_id": b["user_id"],
            "gap_s": (b["ts_us"].to_numpy(np.float64)
                      - b["prev_us"].to_numpy(np.float64)) / 1e6})

    gaps = lagged.map_batches(_gap, batch_format="pandas")
    stats = moment_stats(gaps, ["user_id"], "gap_s")

    def _cv(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["n"] >= 2].copy()
        b["cv"] = round_half_away(b["std"].to_numpy(np.float64)
                           / b["mean"].to_numpy(np.float64), 4)
        for c in ("mean", "std"):
            b[c] = round_half_away(b[c].to_numpy(np.float64), 4)
        # var is the cancellation-amplified raw moment — omit it from
        # the hash-compared surface (std = sqrt(var) halves the rel err)
        return b.drop(columns=["var"])

    return stats.map_batches(_cv, batch_format="pandas").sort("user_id")


def q_multipass_snm_pairs(sf_dir: str) -> rd.Dataset:
    """Multi-pass sorted-neighborhood blocking (Hernandez–Stolfo
    merge/purge, composition): SNM candidate pairs under TWO independent
    sort keys — raw name and reversed name (catches prefix vs suffix
    typos) — unioned distinct via the one-shuffle distributed UNION
    over canonicalized pairs. The classic recall-boosting ER blocking
    strategy the single-pass SNM op feeds."""
    from belb_ray.stages.linkage import sorted_neighborhood_pairs
    from belb_ray.stages.setops import set_union

    cust = _t(sf_dir, "customer", columns=["c_custkey", "c_name"])
    p1 = sorted_neighborhood_pairs(cust, "c_custkey", "c_name", window=4)

    def _rev(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "c_custkey": b["c_custkey"],
            "c_name": b["c_name"].str[::-1]})

    p2 = sorted_neighborhood_pairs(
        cust.map_batches(_rev, batch_format="pandas"),
        "c_custkey", "c_name", window=4)

    def _canon(b: pd.DataFrame) -> pd.DataFrame:
        a = b["id_a"].to_numpy()
        c = b["id_b"].to_numpy()
        return pd.DataFrame({"id_a": np.minimum(a, c),
                             "id_b": np.maximum(a, c)})

    return set_union(p1.map_batches(_canon, batch_format="pandas"),
                     p2.map_batches(_canon, batch_format="pandas"),
                     ["id_a", "id_b"]).sort(["id_a", "id_b"])


def q_customer_conflicts(sf_dir: str) -> rd.Dataset:
    """Data-fusion conflict audit (composition): per customer, how many
    distinct order statuses / priorities their records carry, and
    whether any attribute conflicts — the pre-survivorship QA that says
    which clusters need a merge rule at all. Two count_distinct
    combiners (batch-local dedup before one shuffle each)."""
    from belb_ray.stages.agg import count_distinct

    ords = _t(sf_dir, "orders", columns=["o_custkey", "o_orderstatus", "o_orderpriority"])
    st = count_distinct(ords, ["o_custkey"], "o_orderstatus",
                        "n_statuses")
    pr = count_distinct(ords, ["o_custkey"], "o_orderpriority",
                        "n_priorities")
    from belb_ray.stages.joins import hash_partition_join

    out = hash_partition_join(st, pr, key="o_custkey")

    def _flag(b: pd.DataFrame) -> pd.DataFrame:
        b["has_conflict"] = ((b["n_statuses"] > 1)
                             | (b["n_priorities"] > 1))
        return b

    return out.map_batches(_flag, batch_format="pandas") \
        .sort("o_custkey")


def q_doc_tfidf_cosine(sf_dir: str) -> rd.Dataset:
    """Weighted tf·idf cosine document-similarity join
    (stages/tfidf.tfidf_cosine_join): discriminative-vocabulary
    contract (df ≤ 50) bounds the per-token pair fan-out; the weighted
    repeat/offset triangle explosion runs behind a fusion barrier, dot
    products reduce in a pair combiner, norms attach size-guarded.
    The idf-weighted upgrade of doc_jaccard_join."""
    from belb_ray.stages.tfidf import tfidf_cosine_join

    docs = _t(sf_dir, "documents", columns=["doc_id", "text"])
    # fractional cut: 0.1·n_docs = df ≤ 50 at the sf0.01 oracle scale
    return tfidf_cosine_join(docs, threshold=0.5, max_df=0.1) \
        .sort(["id_a", "id_b"])


def q_fk_integrity(sf_dir: str) -> rd.Dataset:
    """Referential-integrity audit (composition): orphan counts for the
    two FK edges lineitem→orders and orders→customer via the
    size-guarded anti semi-join (Bloom/shuffle fallback path at scale)
    — the cross-table consistency check every warehouse load runs."""
    from belb_ray.stages.joins import semi_join

    li = _t(sf_dir, "lineitem", columns=["l_orderkey"])
    ords = _t(sf_dir, "orders", columns=["o_orderkey",
                                                "o_custkey"])
    cust = _t(sf_dir, "customer", columns=["c_custkey"])

    def _k(ds: rd.Dataset, src: str, dst: str):
        return ds.map_batches(
            lambda t, s=src: pa.table({"k": t[s]}),
            batch_format="pyarrow")

    li_k = _k(li, "l_orderkey", "")
    o_key = _k(ords, "o_orderkey", "")
    o_fk = _k(ords, "o_custkey", "")
    c_key = _k(cust, "c_custkey", "")

    rows = []
    for rel, n_child, child, parent in (
            # child row counts come from parquet metadata (pre-map)
            ("lineitem->orders", li.count(), li_k, o_key),
            ("orders->customer", ords.count(), o_fk, c_key)):
        n_orphans = semi_join(child, parent, "k", anti=True).count()
        rows.append((rel, n_child, n_orphans))
    return rd.from_arrow(pa.table({
        "relation": pa.array([r[0] for r in rows]),
        "n_child_rows": pa.array([r[1] for r in rows], pa.int64()),
        "n_orphans": pa.array([r[2] for r in rows], pa.int64())}))


def q_user_rfm(sf_dir: str) -> rd.Dataset:
    """RFM (recency/frequency/monetary) feature engineering per user
    (composition): one exact-cents combiner builds the per-user table,
    then three equi-depth quintile bucketings (exact quantile
    boundaries, one histogram exchange each; boundary ties go lower) —
    the classic behavioral-feature block of churn/value models."""
    from belb_ray.stages.agg import preagg_groupby
    from belb_ray.stages.analytic import equi_depth_buckets

    ev = _t(sf_dir, "events", columns=["user_id", "ts", "value"]).map_batches(
        lambda b: pd.DataFrame({
            "user_id": b["user_id"],
            "ts_us": b["ts"].astype("int64"),
            "cents": round_half_away(b["value"].to_numpy(np.float64)
                              * 100).astype(np.int64)}),
        batch_format="pandas")
    per = preagg_groupby(ev, ["user_id"],
                         [("max", "ts_us", "last_us"),
                          ("count", "", "n_events"),
                          ("sum", "cents", "sum_cents")]) \
        .materialize()  # user-sized; read by 3 bucketings × 2 passes
    per = equi_depth_buckets(per, "last_us", 5, out_col="r_score")
    per = equi_depth_buckets(per, "n_events", 5, out_col="f_score")
    per = equi_depth_buckets(per, "sum_cents", 5, out_col="m_score")
    return per.sort("user_id")


def q_ab_test_report(sf_dir: str) -> rd.Dataset:
    """Two-proportion A/B z-test per event type (composition): cohorts
    by user parity, success = high-value event (value > 100); one
    (type, cohort) count combiner, pooled-variance z finish from the
    cell-sized table. The experiment-readout op, exact-integer counts."""
    from belb_ray.stages.agg import preagg_groupby

    ev = _t(sf_dir, "events", columns=["event_type", "user_id", "value"]).map_batches(
        lambda b: pd.DataFrame({
            "event_type": b["event_type"],
            "grp": (b["user_id"].to_numpy(np.int64) % 2),
            "hit": (b["value"].to_numpy(np.float64) > 100.0)
            .astype(np.int64)}),
        batch_format="pandas")
    cells = preagg_groupby(ev, ["event_type", "grp"],
                           [("count", "", "n"), ("sum", "hit", "hits")])

    def _z(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["event_type", "grp"], kind="mergesort")
        a = df[df["grp"] == 0].set_index("event_type")
        b = df[df["grp"] == 1].set_index("event_type")
        ix = a.index.intersection(b.index).sort_values()
        na = a.loc[ix, "n"].to_numpy(np.float64)
        nb = b.loc[ix, "n"].to_numpy(np.float64)
        ha = a.loc[ix, "hits"].to_numpy(np.float64)
        hb = b.loc[ix, "hits"].to_numpy(np.float64)
        pa_, pb_ = ha / na, hb / nb
        pool = (ha + hb) / (na + nb)
        z = (pa_ - pb_) / np.sqrt(pool * (1 - pool)
                                  * (1 / na + 1 / nb))
        return pd.DataFrame({
            "event_type": ix.to_numpy(),
            "n_a": na.astype(np.int64), "n_b": nb.astype(np.int64),
            "p_a": round_half_away(pa_, 6), "p_b": round_half_away(pb_, 6),
            "z": round_half_away(z, 6)})

    return cells.repartition(1).map_batches(_z, batch_size=None,
                                            batch_format="pandas")


def q_lang_id_accuracy(sf_dir: str) -> rd.Dataset:
    """Per-source accuracy of the trigram lang-ID heuristic vs the gold
    label (composition): predictor and gold compare inside one
    streaming pass, per-source (n, n_correct) combiner — the
    slice-where-does-the-model-fail QA of weak supervision."""
    from belb_ray.functions.textstats import lang_id
    from belb_ray.stages.agg import preagg_groupby

    docs = _t(sf_dir, "documents", columns=["source", "lang", "text"])

    def _acc(t: pa.Table) -> pd.DataFrame:
        pred = [lang_id(x) for x in t["text"].to_pylist()]
        gold = t["lang"].to_pylist()
        return pd.DataFrame({
            "source": t["source"].to_pylist(),
            "ok": np.array([p == g for p, g in zip(pred, gold)],
                           np.int64)})

    per = preagg_groupby(docs.map_batches(_acc, batch_format="pyarrow"),
                         ["source"],
                         [("count", "", "n"), ("sum", "ok", "n_correct")])

    def _rate(b: pd.DataFrame) -> pd.DataFrame:
        b["accuracy"] = round_half_away(b["n_correct"].to_numpy(np.float64)
                                 / b["n"].to_numpy(np.float64), 6)
        return b

    return per.map_batches(_rate, batch_format="pandas").sort("source")


def q_embedding_quantization(sf_dir: str) -> rd.Dataset:
    """Int8 scalar quantization of the embedding corpus
    (stages/vector.quantize_embeddings): per-dim [lo, hi] from one
    fixed-width combiner pass, bounds broadcast once, codes stream —
    the 4× embedding-storage compressor. Long form for the SQL mirror."""
    from belb_ray.stages.vector import quantize_embeddings

    emb = _t(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return quantize_embeddings(emb, "vec_id", "embedding",
                               dim=64).sort(["vec_id", "dim_idx"])


def q_region_year_sales(sf_dir: str) -> rd.Dataset:
    """Star-schema denormalized sales rollup
    (stages/joins.star_broadcast_join): lineitem facts attach orders →
    customer → nation → region in ONE map_batches pass (each dim
    broadcast once), then an exact-cents (region, year) combiner — the
    classic warehouse denormalize-and-rollup without N sequential join
    operators."""
    from belb_ray.stages.agg import preagg_groupby
    from belb_ray.stages.joins import star_broadcast_join

    li = _t(sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"])
    ords = _t(sf_dir, "orders", columns=[
        "o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
        lambda t: pa.table({"l_orderkey": t["o_orderkey"],
                            "o_custkey": t["o_custkey"],
                            "o_orderdate": t["o_orderdate"]}),
        batch_format="pyarrow")
    cust = _t(sf_dir, "customer").map_batches(
        lambda t: pa.table({"o_custkey": t["c_custkey"],
                            "c_nationkey": t["c_nationkey"]}),
        batch_format="pyarrow")
    nat = _t(sf_dir, "nation").map_batches(
        lambda t: pa.table({"c_nationkey": t["n_nationkey"],
                            "n_regionkey": t["n_regionkey"]}),
        batch_format="pyarrow")
    reg = _t(sf_dir, "region").map_batches(
        lambda t: pa.table({"n_regionkey": t["r_regionkey"],
                            "r_name": t["r_name"]}),
        batch_format="pyarrow")

    wide = star_broadcast_join(li, [
        (ords, "l_orderkey", None), (cust, "o_custkey", None),
        (nat, "c_nationkey", None), (reg, "n_regionkey", None)])

    def _units(b: pd.DataFrame) -> pd.DataFrame:
        # exact integer revenue units (cent · percent): price and
        # discount are 2dp, so both factors are exact ints — no
        # half-cent rounding ambiguity vs SQL
        rev = (round_half_away(b["l_extendedprice"].to_numpy(np.float64)
                        * 100).astype(np.int64)
               * (100 - round_half_away(b["l_discount"].to_numpy(np.float64)
                                 * 100).astype(np.int64)))
        return pd.DataFrame({
            "r_name": b["r_name"],
            "year": b["o_orderdate"].astype(str).str.slice(0, 4),
            "rev_units": rev})

    out = preagg_groupby(wide.map_batches(_units, batch_format="pandas"),
                         ["r_name", "year"],
                         [("count", "", "n_items"),
                          ("sum", "rev_units", "rev_units")])
    return out.sort(["r_name", "year"])


def entry() -> Any:
    """Flagship: ER/near-dup clustering over sf0.001 documents — read →
    adapt → block → pair → score → cluster; returns (row_id, cluster_id,
    content_sha256) with the north-rule invariant column."""
    from belb_ray.pipelines.docdedup import adapt_documents
    from belb_ray.pipelines.er import ERConfig, resolve_files
    from belb_ray.stages.joins import hash_partition_join

    docs = _t("/root/testdata/sf0.001", "documents")
    adapted = adapt_documents(docs)
    res = resolve_files(adapted, ERConfig(use_path_keys=False, w_jacc=1.0,
                                          w_jw=0.0, w_tok=0.0,
                                          input_blocks=4))
    sha = adapted.select_columns(["row_id", "content_sha256"])
    return hash_partition_join(res["clusters"], sha, key="row_id",
                               num_buckets=4)


def q_bloom_semi_join(sf_dir: str) -> rd.Dataset:
    """Bloom-prefiltered EXACT semi-join (stages/joins.bloom_semi_join):
    the key side compresses to a fixed-size bitmap, bloom-negative probe
    rows never shuffle, and the positive sliver is exactly verified —
    the membership-join shape for two sides too large to broadcast.
    broadcast_threshold=1 forces the exact stage onto the shuffle path
    so the oracle certifies the at-scale code path, not the small-side
    shortcut."""
    from belb_ray.stages.joins import bloom_semi_join

    li = _t(sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber", "l_partkey"])
    import pyarrow.dataset as pads

    keys = _t_where(sf_dir, "part", pads.field("p_size") > 25,
                    columns=["p_partkey", "p_size"]).map_batches(
        lambda t: pa.table({"l_partkey": t["p_partkey"]}),
        batch_format="pyarrow")
    out = bloom_semi_join(li, keys, "l_partkey", broadcast_threshold=1)
    return out.map_batches(
        lambda t: pa.table({
            "l_orderkey": t["l_orderkey"],
            "l_linenumber": pa.compute.cast(t["l_linenumber"], pa.int64()),
            "l_partkey": t["l_partkey"],
        }), batch_format="pyarrow")


def q_meta_blocking(sf_dir: str) -> rd.Dataset:
    """Meta-blocking WEP (stages/blocking.meta_block_pairs): three
    redundant blocking keys over parts → block purge (cap 128) → CBS
    pair weights → exact-integer global-mean edge pruning."""
    from belb_ray.stages.blocking import meta_block_pairs

    def _assign(t: pa.Table) -> pa.Table:
        size_s = pa.compute.cast(t["p_size"], pa.string())
        keys = [
            pa.compute.binary_join_element_wise(
                "n:", t["p_name"], "/", size_s, ""),
            pa.compute.binary_join_element_wise(
                "bt:", t["p_brand"], "/", t["p_type"], ""),
            pa.compute.binary_join_element_wise(
                "bs:", t["p_brand"], "/", size_s, ""),
        ]
        return pa.concat_tables([
            pa.table({"record_id": t["p_partkey"], "block_key": k})
            for k in keys])

    assigns = _t(sf_dir, "part").map_batches(_assign,
                                             batch_format="pyarrow")
    return meta_block_pairs(assigns, max_block_size=128)


def q_doc_rule_filters(sf_dir: str) -> rd.Dataset:
    """C4/Gopher rule-filter chain with drop-reason precedence
    (stages/curation.rule_filter_chain): too_short > long_words >
    repetitive > keep, all thresholds exact-integer."""
    from belb_ray.stages.curation import rule_filter_chain

    return rule_filter_chain(_t(sf_dir, "documents"))


def q_corpus_build(sf_dir: str) -> rd.Dataset:
    """The reference's full corpus-build read path (SURVEY §3.2,
    corpus.py:182-663) as one composition
    (pipelines/corpus_build.build_corpus): identifier explosion →
    history resolution (obsolete drops) → notinkb KB boundary → exact
    annotation dedup → span-group identifier list merge → offsets QAQC
    gate. Mentions are the first occurrences of words 2 and 5 of each
    document (each emitted TWICE to exercise the dedup), identifiers
    are |-packed pairs, the KB holds even-numbered ids, and the history
    redirects X:k (k%5=0) and retires Y:0."""
    from belb_ray.pipelines.corpus_build import build_corpus

    docs = _t(sf_dir, "documents", columns=["doc_id", "text"])

    def _anns(t: pa.Table) -> pa.Table:
        dids = t["doc_id"].to_numpy()
        texts = t["text"].to_pylist()
        out: dict[str, list] = {k: [] for k in (
            "doc_id", "ann_id", "start", "end", "text", "entity_type",
            "identifier_raw")}
        for did, txt in zip(dids, texts):
            words = txt.split(" ")
            offs = np.cumsum([0] + [len(w) + 1 for w in words[:-1]])
            raw = f"X:{did % 50}|Y:{did % 7}"
            etype = "gene" if did % 2 == 0 else "chem"
            for k, w in enumerate((words[1], words[4])):
                first = words.index(w)
                s = int(offs[first])
                for dup in range(2):  # duplicate inject → A7 dedup
                    out["doc_id"].append(int(did))
                    out["ann_id"].append(int(did) * 10 + k * 2 + dup)
                    out["start"].append(s)
                    out["end"].append(s + len(w))
                    out["text"].append(w)
                    out["entity_type"].append(etype)
                    out["identifier_raw"].append(raw)
        return pa.table({
            "doc_id": pa.array(out["doc_id"], pa.int64()),
            "ann_id": pa.array(out["ann_id"], pa.int64()),
            "start": pa.array(out["start"], pa.int64()),
            "end": pa.array(out["end"], pa.int64()),
            "text": pa.array(out["text"], pa.string()),
            "entity_type": pa.array(out["entity_type"], pa.string()),
            "identifier_raw": pa.array(out["identifier_raw"], pa.string()),
        })

    anns = docs.map_batches(_anns, batch_format="pyarrow")

    def _kb(t: pa.Table) -> pa.Table:
        m = np.unique(t["p_partkey"].to_numpy() % 150)
        m = m[m % 2 == 0]
        ids = [f"X:{v}" for v in m] + [f"Y:{v}" for v in m]
        return pa.table({"resolved_identifier": pa.array(ids, pa.string())})

    kb = _t(sf_dir, "part", columns=["p_partkey"]).map_batches(
        _kb, batch_format="pyarrow")
    history = pd.DataFrame({
        "old_identifier": [f"X:{k}" for k in range(0, 50, 5)] + ["Y:0"],
        "new_identifier": [f"X:{k + 100}" for k in range(0, 50, 5)]
        + ["-1"],
    })
    out = build_corpus(docs, anns, kb, history)
    return out["annotations"].map_batches(
        lambda t: pa.table({
            "doc_id": t["doc_id"], "start": t["start"], "end": t["end"],
            "text": t["text"], "entity_type": t["entity_type"],
            "ids_joined": pa.array(
                [";".join(v) for v in t["identifiers"].to_pylist()],
                pa.string()),
            "n_ids": t["n_ids"],
        }), batch_format="pyarrow")


def q_safe_parse(sf_dir: str) -> rd.Dataset:
    """Per-record error containment (pipelines/qaqc.safe_apply — the
    reference's BaseTransformation.safe_apply,
    belb/preprocessing/transform.py:59-74): a fallible row parser
    raises on a sentinel token; failing records quarantine with the
    exception string instead of killing the task; rows_out == rows_in."""
    from belb_ray.pipelines.qaqc import safe_apply

    def parse(row: dict) -> dict:
        words = row["text"].split(" ")
        if words[2] == "vector":
            raise ValueError("sentinel token at position 3")
        return {"first_word": words[0], "n_words": len(words)}

    out = safe_apply(
        _t(sf_dir, "documents", columns=["doc_id", "text"]),
        parse, {"first_word": pa.string(), "n_words": pa.int64()})
    return out.select_columns(
        ["doc_id", "ok", "error", "first_word", "n_words"])


def q_kmeans_clusters(sf_dir: str) -> rd.Dataset:
    """Distributed Lloyd's k-means (stages/vector.kmeans_lloyd): exact
    int64 fixed-point centroid sums make the fit independent of block
    count and batch order; golden from the independent single-process
    implementation of the same determinism spec."""
    from belb_ray.stages.vector import kmeans_lloyd

    return kmeans_lloyd(_t(sf_dir, "embeddings"), k=8, n_iters=5)


def q_salted_join(sf_dir: str) -> rd.Dataset:
    """Skew-aware salted hash join (stages/joins.salted_hash_join):
    exact Misra-Gries-detected hot keys fan out across salt sub-keys
    with the right side's hot rows replicated — hash-partition-join
    output equality at any skew, no one-hot-partition straggler."""
    from belb_ray.stages.joins import salted_hash_join

    ev = _t(sf_dir, "events", columns=["event_id", "user_id"])
    cust = _t(sf_dir, "customer", columns=["c_custkey", "c_nationkey"]).map_batches(
        lambda t: pa.table({"user_id": t["c_custkey"],
                            "c_nationkey": t["c_nationkey"]}),
        batch_format="pyarrow")
    out = salted_hash_join(ev, cust, "user_id", n_salt=4, phi=0.005)
    return out.select_columns(["event_id", "user_id", "c_nationkey"])


def q_dedup_passages(sf_dir: str) -> rd.Dataset:
    """Cross-doc passage dedup with corpus rewrite
    (stages/curation.dedup_passages_rewrite): non-overlapping 8-word
    passages, global first occurrence by (doc_id, idx) wins, documents
    re-emitted from their surviving passages."""
    from belb_ray.stages.curation import dedup_passages_rewrite

    return dedup_passages_rewrite(_t(sf_dir, "documents"), k=8)


def q_leakage_safe_split(sf_dir: str) -> rd.Dataset:
    """Dedup-aware split (stages/mlprep.leakage_safe_split): exact-dup
    groups share a split — content can't straddle the train/eval
    boundary. Split hash runs on the min-id representative."""
    from belb_ray.stages.mlprep import leakage_safe_split

    return leakage_safe_split(_t(sf_dir, "documents"),
                              fracs=_SPLIT_FRACS, seed=3)


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "pricing_summary": q_pricing_summary,
        "revenue_by_nation": q_revenue_by_nation,
        "order_priority_revenue": q_order_priority_revenue,
        "customers_without_orders": q_customers_without_orders,
        "top_orders": q_top_orders,
        "brand_dense_ids": q_brand_dense_ids,
        "brand_synsets": q_brand_synsets,
        "name_homonyms": q_name_homonyms,
        "identifier_homonyms": q_identifier_homonyms,
        "kb_dedup": q_kb_dedup,
        "history_resolution": q_history_resolution,
        "id_mapping": q_id_mapping,
        "distinct_segments": q_distinct_segments,
        "exact_dup_groups": q_exact_dup_groups,
        "doc_token_counts": q_doc_token_counts,
        "doc_quality": q_doc_quality,
        "doc_lang_id": q_doc_lang_id,
        "events_hourly": q_events_hourly,
        "events_hopping": q_events_hopping,
        "events_sessions": q_events_sessions,
        "ann_cosine_topk": q_ann_cosine_topk,
        "embedding_neardup": q_embedding_neardup,
        "synset_similarity": q_synset_similarity,
        "id_explosion": q_id_explosion,
        "doc_normalize": q_doc_normalize,
        "span_assignment": q_span_assignment,
        "sentence_split": q_sentence_split,
        "span_merge": q_span_merge,
        "overlap_suppression": q_overlap_suppression,
        "passage_assembly": q_passage_assembly,
        "offset_remap": q_offset_remap,
        "bloom_semi_join": q_bloom_semi_join,
        "meta_blocking": q_meta_blocking,
        "doc_rule_filters": q_doc_rule_filters,
        "dedup_passages": q_dedup_passages,
        "leakage_safe_split": q_leakage_safe_split,
        "salted_join": q_salted_join,
        "kmeans_clusters": q_kmeans_clusters,
        "safe_parse": q_safe_parse,
        "corpus_build": q_corpus_build,
        "foreign_name_homonyms": q_foreign_name_homonyms,
        "eval_subsets": q_eval_subsets,
        "asof_snapshot": q_asof_snapshot,
        "top_orders_per_customer": q_top_orders_per_customer,
        "bm25_search": q_bm25_search,
        "semantic_dedup": q_semantic_dedup,
        "hll_distinct_users": q_hll_distinct_users,
        "heavy_hitter_tokens": q_heavy_hitter_tokens,
        "tfidf_top_terms": q_tfidf_top_terms,
        "user_event_windows": q_user_event_windows,
        "event_overlaps": q_event_overlaps,
        "user_event_rolling": q_user_event_rolling,
        "event_value_quantiles": q_event_value_quantiles,
        "user_value_ranks": q_user_value_ranks,
        "event_daily_pivot": q_event_daily_pivot,
        "customer_order_counts": q_customer_order_counts,
        "hourly_distinct_users": q_hourly_distinct_users,
        "parts_never_ordered": q_parts_never_ordered,
        "supplier_customer_nations": q_supplier_customer_nations,
        "user_modal_event_type": q_user_modal_event_type,
        "user_value_stats": q_user_value_stats,
        "lineitem_corr": q_lineitem_corr,
        "event_rollup": q_event_rollup,
        "event_value_percentiles": q_event_value_percentiles,
        "event_cube": q_event_cube,
        "user_value_pctl": q_user_value_pctl,
        "user_event_paths": q_user_event_paths,
        "event_grouping_sets": q_event_grouping_sets,
        "user_value_shape": q_user_value_shape,
        "part_attributes_long": q_part_attributes_long,
        "order_item_balance": q_order_item_balance,
        "dup_passage_spans": q_dup_passage_spans,
        "parts_bought_together": q_parts_bought_together,
        "user_value_mad": q_user_value_mad,
        "user_value_zscores": q_user_value_zscores,
        "quality_weighted_sample": q_quality_weighted_sample,
        "event_value_approx_quantiles": q_event_value_approx_quantiles,
        "event_prop_stats": q_event_prop_stats,
        "doc_first_words": q_doc_first_words,
        "part_pagerank": q_part_pagerank,
        "signup_funnel": q_signup_funnel,
        "value_deciles": q_value_deciles,
        "doc_lm_scores": q_doc_lm_scores,
        "user_event_entropy": q_user_event_entropy,
        "stratified_docs_sample": q_stratified_docs_sample,
        "user_value_winsorized": q_user_value_winsorized,
        "user_event_validity": q_user_event_validity,
        "wealthy_or_supplier_nations": q_wealthy_or_supplier_nations,
        "nation_type_matrix": q_nation_type_matrix,
        "user_value_regression": q_user_value_regression,
        "weekly_cohort_retention": q_weekly_cohort_retention,
        "customer_table_diff": q_customer_table_diff,
        "incremental_dedup": q_incremental_dedup,
        "user_value_daily_ffill": q_user_value_daily_ffill,
        "user_event_transitions": q_user_event_transitions,
        "doc_shard_assignment": q_doc_shard_assignment,
        "doc_chunks": q_doc_chunks,
        "seq_packing": q_seq_packing,
        "pii_redaction": q_pii_redaction,
        "contamination_flags": q_contamination_flags,
        "cross_corpus_contamination": q_cross_corpus_contamination,
        "resumable_export": q_resumable_export,
        "repetition_stats": q_repetition_stats,
        "corpus_ngrams": q_corpus_ngrams,
        "table_profile": q_table_profile,
        "mixture_sample": q_mixture_sample,
        "inverted_index": q_inverted_index,
        "target_encoding": q_target_encoding,
        "dataset_split": q_dataset_split,
        "quota_sample": q_quota_sample,
        "triangle_counts": q_triangle_counts,
        "name_edit_pairs": q_name_edit_pairs,
        "customer_golden_record": q_customer_golden_record,
        "event_value_imputed": q_event_value_imputed,
        "dict_mentions": q_dict_mentions,
        "part_bfs_hops": q_part_bfs_hops,
        "bpe_merges": q_bpe_merges,
        "bpe_tokens": q_bpe_tokens,
        "hybrid_search": q_hybrid_search,
        "pq_ann_topk": q_pq_ann_topk,
        "trending_events": q_trending_events,
        "value_drift": q_value_drift,
        "lang_source_assoc": q_lang_source_assoc,
        "mention_contexts": q_mention_contexts,
        "quasi_id_audit": q_quasi_id_audit,
        "part_k_core": q_part_k_core,
        "budget_select": q_budget_select,
        "hll_merge_rollup": q_hll_merge_rollup,
        "fuzzy_name_lookup": q_fuzzy_name_lookup,
        "label_centroids": q_label_centroids,
        "centroid_confusion": q_centroid_confusion,
        "event_debounce": q_event_debounce,
        "token_pmi": q_token_pmi,
        "customer_global_rank": q_customer_global_rank,
        "dedup_savings": q_dedup_savings,
        "daily_user_growth": q_daily_user_growth,
        "user_coverage_spans": q_user_coverage_spans,
        "part_pagerank_weighted": q_part_pagerank_weighted,
        "lineitem_corr_matrix": q_lineitem_corr_matrix,
        "priority_geo_mean": q_priority_geo_mean,
        "dup_size_histogram": q_dup_size_histogram,
        "nation_revenue_share": q_nation_revenue_share,
        "weekly_revenue_growth": q_weekly_revenue_growth,
        # rows-only (non-SQL-expressible)
        "pca_projection": q_pca_projection,
        "pca_variance": q_pca_variance,
        "incremental_neardup": q_incremental_neardup,
        "compacted_neardup": q_compacted_neardup,
        "hash_sample": q_hash_sample,
        "upsample_chunks": q_upsample_chunks,
        "er_clusters": q_er_clusters,
        "minhash_dedup_docs": q_minhash_dedup_docs,
        "simhash_dedup_docs": q_simhash_dedup_docs,
        "ngram_jaccard_docs": q_ngram_jaccard_docs,
        "doc_fingerprints": q_doc_fingerprints,
        "lsh_neardup": q_lsh_neardup,
        "lsh_ann_topk": q_lsh_ann_topk,
        "ivf_ann_topk": q_ivf_ann_topk,
        "multimodal_features": q_multimodal_features,
        "text_embeddings": q_text_embeddings,
        "upsample_exact": q_upsample_exact,
        "bm25_rerank": q_bm25_rerank,
        "golden_records": q_golden_records,
        "cluster_quality": q_cluster_quality,
        "clustering_diff": q_clustering_diff,
        "substring_dup_stats": q_substring_dup_stats,
        "waterfall_match": q_waterfall_match,
        "id_crosswalk": q_id_crosswalk,
        "score_calibration": q_score_calibration,
        "cannot_link_audit": q_cannot_link_audit,
        "source_accuracy": q_source_accuracy,
        "er_increment": q_er_increment,
        "pprl_links": q_pprl_links,
        "canopy_blocks": q_canopy_blocks,
        "corr_clusters": q_corr_clusters,
        "progressive_er_curve": q_progressive_er_curve,
        "fs_pattern_posteriors": q_fs_pattern_posteriors,
        "blocking_ablation": q_blocking_ablation,
        "snm_pairs": q_snm_pairs,
        "name_jw_pairs": q_name_jw_pairs,
        "name_monge_elkan": q_name_monge_elkan,
        "name_soundex": q_name_soundex,
        "user_freq_cms": q_user_freq_cms,
        "doc_readability": q_doc_readability,
        "supplier_key_skew": q_supplier_key_skew,
        "doc_jaccard_join": q_doc_jaccard_join,
        "dedup_threshold_sweep": q_dedup_threshold_sweep,
        "size_shard_plan": q_size_shard_plan,
        "part_components": q_part_components,
        "jl_projection": q_jl_projection,
        "fs_linkage_weights": q_fs_linkage_weights,
        "snm_blocking_quality": q_snm_blocking_quality,
        "blocking_bcubed": q_blocking_bcubed,
        "name_one2one_match": q_name_one2one_match,
        "purchase_attribution": q_purchase_attribution,
        "user_value_twa": q_user_value_twa,
        "user_streaks": q_user_streaks,
        "boilerplate_stats": q_boilerplate_stats,
        "doc_containment": q_doc_containment,
        "part_communities": q_part_communities,
        "part_shortest_paths": q_part_shortest_paths,
        "user_value_ewma": q_user_value_ewma,
        "value_ks_drift": q_value_ks_drift,
        "user_skyline": q_user_skyline,
        "part_cosine_sim": q_part_cosine_sim,
        "user_value_gini": q_user_value_gini,
        "token_js_drift": q_token_js_drift,
        "nb_lang_scores": q_nb_lang_scores,
        "user_value_autocorr": q_user_value_autocorr,
        "corpus_checksum": q_corpus_checksum,
        "label_silhouette": q_label_silhouette,
        "ivf_recall": q_ivf_recall,
        "kcenter_sample": q_kcenter_sample,
        "lang_source_mi": q_lang_source_mi,
        "mixture_plan": q_mixture_plan,
        "linkage_negatives": q_linkage_negatives,
        "vocab_coverage": q_vocab_coverage,
        "negative_pairs": q_negative_pairs,
        "source_freshness": q_source_freshness,
        "exact_value_quantiles": q_exact_value_quantiles,
        "nation_join_size": q_nation_join_size,
        "brand_weighted_median_price": q_brand_weighted_median_price,
        "lang_id_kappa": q_lang_id_kappa,
        "user_gap_stats": q_user_gap_stats,
        "multipass_snm_pairs": q_multipass_snm_pairs,
        "customer_conflicts": q_customer_conflicts,
        "doc_tfidf_cosine": q_doc_tfidf_cosine,
        "fk_integrity": q_fk_integrity,
        "user_rfm": q_user_rfm,
        "ab_test_report": q_ab_test_report,
        "lang_id_accuracy": q_lang_id_accuracy,
        "embedding_quantization": q_embedding_quantization,
        "region_year_sales": q_region_year_sales,
    }


def _bm25_sql(terms: tuple[str, ...], k: int, k1: float = 1.2,
              b: float = 0.75) -> str:
    """DuckDB mirror of stages/search.bm25_topk, expression-for-expression
    in the same association order so doubles are bit-identical."""
    tok = ("list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), "
           "x -> x <> '')")
    df_cols = ", ".join(
        f"CAST(sum(CASE WHEN list_contains(t, '{t_}') THEN 1 ELSE 0 END) "
        f"AS DOUBLE) AS df_{i}" for i, t_ in enumerate(terms))
    tf_cols = ", ".join(
        f"CAST(len(list_filter(t, x -> x = '{t_}')) AS DOUBLE) AS tf_{i}"
        for i, t_ in enumerate(terms))
    norm = f"{k1} * (1.0 - {b} + {b} * sc.dl / st.avgdl)"
    term_exprs = [
        f"(ln((st.n - st.df_{i} + 0.5) / (st.df_{i} + 0.5) + 1.0)"
        f" * (sc.tf_{i} * ({k1} + 1.0)) / (sc.tf_{i} + {norm}))"
        for i in range(len(terms))]
    score = " + ".join(term_exprs)
    return f"""
        WITH toks AS (SELECT doc_id, {tok} AS t FROM documents),
        st AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                      CAST(sum(len(t)) AS DOUBLE)
                          / CAST(count(*) AS DOUBLE) AS avgdl,
                      {df_cols}
               FROM toks),
        sc AS (SELECT doc_id, CAST(len(t) AS DOUBLE) AS dl, {tf_cols}
               FROM toks)
        SELECT sc.doc_id, round({score}, 4) AS score
        FROM sc, st
        ORDER BY score DESC, sc.doc_id
        LIMIT {k}
    """


def _lang_id_sql() -> str:
    t = "substr(lower(text), 1, 2000)"
    scores = {}
    for lang, grams in LANG_PROFILES.items():
        parts = []
        for g in grams:
            gq = g.replace("'", "''")
            parts.append(f"(length({t}) - length(replace({t}, '{gq}', ''))) // {len(g)}")
        scores[lang] = " + ".join(parts)
    s = {l: f"s_{l}" for l in scores}
    score_cols = ", ".join(f"({expr}) AS s_{l}" for l, expr in scores.items())
    return f"""
WITH scored AS (SELECT doc_id, {score_cols} FROM documents)
SELECT doc_id,
  CASE
    WHEN {s['en']}=0 AND {s['de']}=0 AND {s['fr']}=0 AND {s['es']}=0 THEN 'und'
    WHEN {s['en']}>={s['de']} AND {s['en']}>={s['fr']} AND {s['en']}>={s['es']} THEN 'en'
    WHEN {s['de']}>={s['fr']} AND {s['de']}>={s['es']} THEN 'de'
    WHEN {s['fr']}>={s['es']} THEN 'fr'
    ELSE 'es'
  END AS lang_pred
FROM scored
"""


def oracle_sql() -> dict[str, str]:
    from belb_ray.stages.sketch import hll_sql as _hll_sql

    # pinned goldens are per-scale-factor files; the driver's gate runs
    # at sf0.01 (the default). A local gate at another sf regenerates
    # them (tools/make_goldens.py --sf-dir .../sf0.1) and sets
    # BELB_RAY_GOLDEN_SF=sf0.1 (tools/check_correctness.py does both
    # automatically via its sf_dir argument).
    _sf_tag = _os.environ.get("BELB_RAY_GOLDEN_SF", "sf0.01")

    stoplist = ", ".join(f"'{w}'" for w in STOPWORDS)
    sqls = {
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   round(sum(l_discount) / count(*), 6) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "revenue_by_nation": """
            SELECT n_name, round(sum(o_totalprice), 2) AS revenue,
                   count(*) AS n_orders
            FROM orders JOIN customer ON o_custkey = c_custkey
                        JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name
        """,
        "order_priority_revenue": """
            SELECT o_orderpriority,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
                   count(*) AS n_items
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY o_orderpriority
        """,
        "customers_without_orders": """
            SELECT c_mktsegment, count(*) AS n_customers
            FROM customer
            WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                                    WHERE o_totalprice > 300000)
            GROUP BY c_mktsegment
        """,
        "top_orders": """
            SELECT o_orderkey, o_totalprice FROM orders
            ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
        """,
        "brand_dense_ids": """
            SELECT p_brand, row_number() OVER (ORDER BY p_brand) - 1
                   AS internal_identifier
            FROM (SELECT DISTINCT p_brand FROM part)
        """,
        "brand_synsets": """
            SELECT p_brand AS identifier,
                   string_agg(DISTINCT p_name, ';' ORDER BY p_name) AS names,
                   count(DISTINCT p_name) AS n_names
            FROM part GROUP BY p_brand
        """,
        "name_homonyms": """
            SELECT p_name AS name, count(DISTINCT p_brand) AS n_identifiers
            FROM part GROUP BY p_name
            HAVING count(DISTINCT p_brand) > 1
        """,
        "identifier_homonyms": """
            WITH per_id AS (
                SELECT CAST(c_nationkey AS BIGINT) AS identifier,
                       string_agg(DISTINCT c_mktsegment, ';'
                                  ORDER BY c_mktsegment) AS names
                FROM customer GROUP BY 1),
            g AS (
                SELECT names, min(identifier) AS canonical
                FROM per_id GROUP BY names HAVING count(*) > 1)
            SELECT p.identifier AS homonym, g.canonical AS identifier
            FROM per_id p JOIN g USING (names)
            WHERE p.identifier <> g.canonical
        """,
        "kb_dedup": """
            SELECT p_partkey AS uid, p_brand AS identifier, p_name AS name,
                   CAST(p_size AS BIGINT) AS description
            FROM part
            QUALIFY row_number() OVER (PARTITION BY p_brand, p_name
                                       ORDER BY p_size, p_partkey) = 1
        """,
        "history_resolution": """
            SELECT c_custkey,
                   CAST(c_nationkey + 100 * (c_custkey % 4) AS VARCHAR) AS identifier,
                   CASE c_custkey % 4
                     WHEN 0 THEN CAST(c_nationkey AS VARCHAR)
                     WHEN 3 THEN '-1'
                     ELSE CAST(c_nationkey AS VARCHAR)
                   END AS resolved_identifier,
                   CASE c_custkey % 4
                     WHEN 0 THEN 'kept'
                     WHEN 3 THEN 'obsolete'
                     ELSE 'replaced'
                   END AS id_status
            FROM customer
        """,
        "id_mapping": """
            SELECT s_suppkey,
                   'EXT:' || CAST(2 * s_nationkey + (s_suppkey % 2) AS VARCHAR) AS orig,
                   CASE WHEN s_suppkey % 2 = 0 THEN CAST(s_nationkey AS BIGINT)
                        ELSE -1 END AS internal_identifier
            FROM supplier
        """,
        "distinct_segments": """
            SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
                   count(DISTINCT c_mktsegment) AS n_segments
            FROM customer GROUP BY 1
        """,
        "exact_dup_groups": """
            SELECT md5(text) AS content_md5, min(doc_id) AS rep_id,
                   count(*) AS n_dups
            FROM documents GROUP BY 1
        """,
        "doc_token_counts": r"""
            SELECT doc_id,
                   len(list_filter(regexp_split_to_array(text, '\s+'),
                                   x -> x <> '')) AS n_tokens,
                   len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^\w\s]'))
                       AS n_bpe_tokens
            FROM documents
        """,
        "doc_quality": rf"""
            WITH w AS (
                SELECT doc_id, length(text) AS n_chars,
                       list_filter(regexp_split_to_array(text, '\s+'),
                                   x -> x <> '') AS words
                FROM documents)
            SELECT doc_id, n_chars, len(words) AS n_words,
                   CASE WHEN len(words) = 0 THEN 0.0
                        ELSE len(list_filter(words,
                             x -> list_contains([{stoplist}], lower(x))))
                             / len(words)
                   END AS stop_ratio
            FROM w
        """,
        "doc_lang_id": _lang_id_sql(),
        "synset_similarity": """
            WITH n AS (SELECT DISTINCT p_brand AS identifier, p_name AS name
                       FROM part),
            c AS (SELECT identifier, count(*) AS n_names FROM n GROUP BY 1),
            p AS (SELECT a.identifier,
                         avg(1.0 - levenshtein(a.name, b.name)
                             / greatest(length(a.name), length(b.name)))
                             AS mean_lev
                  FROM n a JOIN n b ON a.identifier = b.identifier
                                   AND a.name < b.name
                  GROUP BY 1)
            SELECT c.identifier, c.n_names,
                   round(coalesce(p.mean_lev, 1.0), 6) AS mean_lev
            FROM c LEFT JOIN p USING (identifier)
        """,
        "id_explosion": """
            WITH e AS (SELECT o_orderkey,
                              unnest(string_split(
                                  'ID:' || o_orderkey || '|ID:' || o_custkey,
                                  '|')) AS part
                       FROM orders)
            SELECT o_orderkey, substr(part, 4) AS ident FROM e
        """,
        "doc_normalize": r"""
            SELECT doc_id,
                   trim(regexp_replace(
                       replace(replace(replace(replace(replace(replace(
                       replace(replace(text,
                           '‎', ''), '‐', '-'), '−', '-'), chr(160), ' '),
                           '‘', ''''), '’', ''''), '“', '"'), '”', '"'),
                       '\s+', ' ', 'g')) AS norm_text
            FROM documents
        """,
        "span_assignment": """
            WITH spans AS (
                SELECT l_orderkey AS doc_id,
                       l_orderkey * 10 + l_linenumber AS span_id,
                       l_partkey % 280 AS s,
                       (l_partkey % 280) + (l_suppkey % 20) AS e
                FROM lineitem),
            segs AS (
                SELECT o_orderkey AS doc_id, CAST(u.s AS BIGINT) AS seg_id,
                       CAST(u.s * 100 AS BIGINT) AS seg_start,
                       CAST(u.s * 100 + 100 AS BIGINT) AS seg_end
                FROM orders, (SELECT unnest([0, 1, 2]) AS s) u)
            SELECT sp.doc_id, CAST(sp.span_id AS BIGINT) AS span_id,
                   sg.seg_id
            FROM spans sp JOIN segs sg
              ON sp.doc_id = sg.doc_id
             AND sg.seg_start <= sp.s AND sp.e <= sg.seg_end
        """,
        "events_hourly": """
            SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
                       AS window_start,
                   event_type, count(*) AS n_events,
                   round(sum(value), 4) AS sum_value
            FROM events GROUP BY 1, 2
        """,
        "events_hopping": """
            SELECT strftime(date_trunc('hour', ts)
                            - to_hours(CAST(u.i AS BIGINT)),
                            '%Y-%m-%d %H:%M:%S') AS window_start,
                   event_type, count(*) AS n_events,
                   round(sum(value), 4) AS sum_value
            FROM events, (SELECT unnest([0, 1]) AS i) u
            GROUP BY 1, 2
        """,
        "events_sessions": """
            WITH o AS (
                SELECT user_id, ts,
                       CASE WHEN lag(ts) OVER w IS NULL
                              OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                            THEN 1 ELSE 0 END AS brk
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
            s AS (
                SELECT user_id, ts,
                       sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS sess
                FROM o)
            SELECT user_id,
                   CAST(floor(epoch(min(ts))) AS BIGINT) AS session_id,
                   strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
                   strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
                   count(*) AS n_events
            FROM s GROUP BY user_id, sess
        """,
        "ann_cosine_topk": """
            WITH q AS (SELECT vec_id AS query_id, embedding AS qe
                       FROM embeddings WHERE vec_id < 16),
            s AS (SELECT q.query_id, e.vec_id AS neighbor_id,
                         list_cosine_similarity(q.qe, e.embedding) AS sim
                  FROM q CROSS JOIN embeddings e
                  WHERE e.vec_id <> q.query_id),
            r AS (SELECT query_id, neighbor_id, sim,
                         row_number() OVER (PARTITION BY query_id
                                            ORDER BY sim DESC, neighbor_id)
                             AS rank
                  FROM s)
            SELECT query_id, neighbor_id, rank, round(sim, 4) AS sim
            FROM r WHERE rank <= 5
        """,
        # quantized-exact cosine (mirrors stages/ann.py): components
        # snap to integers at 2^21 units, so every inner product is an
        # exact integer in float64 and the similarity is bit-identical
        # across engines and partitionings; quantization error < 1e-6
        # DOUBLE casts throughout: list_inner_product (and bare float
        # lambdas) accumulate in float32, which crushes the exact
        # integer products back into approximation
        "embedding_neardup": """
            WITH q AS (SELECT vec_id,
                              list_transform(embedding,
                                  x -> round(CAST(x AS DOUBLE)
                                             * 2097152.0)) AS qv
                       FROM embeddings),
            n AS (SELECT vec_id, qv,
                         list_sum(list_transform(qv, v -> v * v)) AS n2
                  FROM q),
            d AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                         list_sum(list_transform(
                             range(1, len(a.qv) + 1),
                             i -> a.qv[i] * b.qv[i])) AS dot,
                         a.n2 AS n2a, b.n2 AS n2b
                  FROM n a JOIN n b ON a.vec_id < b.vec_id)
            SELECT id_a, id_b,
                   round(dot / sqrt(n2a * n2b), 4) AS sim
            FROM d WHERE dot / sqrt(n2a * n2b) >= 0.35
        """,
        "sentence_split": r"""
            WITH marked AS (
                SELECT doc_id,
                       string_split(regexp_replace(text,
                           '([.!?])([ \t' || chr(10) || chr(13) || chr(12)
                           || chr(11) || ']+)',
                           '\1' || chr(1) || '\2', 'g'), chr(1)) AS pieces
                FROM documents),
            u AS (SELECT doc_id, pieces,
                         unnest(generate_series(1, len(pieces))) AS i
                  FROM marked),
            p AS (SELECT doc_id, CAST(i AS BIGINT) AS i,
                         pieces[CAST(i AS INT)] AS piece
                  FROM u),
            q AS (SELECT doc_id, i, piece,
                         coalesce(sum(length(piece)) OVER (
                             PARTITION BY doc_id ORDER BY i
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING), 0) AS raw_start,
                         length(regexp_extract(piece,
                             '^[ \t' || chr(10) || chr(13) || chr(12)
                             || chr(11) || ']*')) AS lead
                  FROM p),
            s AS (SELECT doc_id, i,
                         raw_start + lead AS start,
                         regexp_replace(piece,
                             '^[ \t' || chr(10) || chr(13) || chr(12)
                             || chr(11) || ']+', '') AS sentence
                  FROM q)
            SELECT doc_id,
                   CAST(row_number() OVER (PARTITION BY doc_id ORDER BY i)
                        - 1 AS BIGINT) AS sent_id,
                   CAST(start AS BIGINT) AS start,
                   CAST(length(sentence) AS BIGINT) AS length,
                   sentence
            FROM s WHERE length(sentence) > 0
        """,
        "span_merge": """
            WITH a AS (
                SELECT l_orderkey AS doc_id,
                       CAST((l_linenumber % 2) * 10 AS BIGINT) AS start,
                       CAST((l_linenumber % 2) * 10 + 5 AS BIGINT) AS "end",
                       'm' || (l_linenumber % 2) AS text,
                       l_returnflag AS entity_type,
                       'S:' || l_suppkey AS identifier
                FROM lineitem)
            SELECT doc_id, start, "end", text, entity_type,
                   array_to_string(list_sort(list_distinct(
                       array_agg(identifier))), ';') AS ids_joined,
                   count(DISTINCT identifier) AS n_ids
            FROM a GROUP BY doc_id, start, "end", text, entity_type
        """,
        "overlap_suppression": """
            WITH gold AS (
                SELECT o_orderkey AS doc_id, 50 AS gs, 150 AS ge,
                       't' || (o_custkey % 100) AS gt
                FROM orders),
            fg AS (
                SELECT l_orderkey AS doc_id,
                       CAST(l_orderkey * 10 + l_linenumber AS BIGINT) AS ann_id,
                       CAST(l_partkey % 280 AS BIGINT) AS s,
                       CAST((l_partkey % 280) + (l_suppkey % 20) + 1 AS BIGINT)
                           AS e,
                       't' || (l_partkey % 100) AS t
                FROM lineitem)
            SELECT f.doc_id, f.ann_id, f.s AS start, f.e AS "end", f.t AS text
            FROM fg f
            WHERE NOT EXISTS (
                SELECT 1 FROM gold g
                WHERE g.doc_id = f.doc_id
                  AND ((f.s < g.ge AND g.gs < f.e) OR f.t = g.gt))
        """,
        "passage_assembly": """
            SELECT l_orderkey AS doc_id,
                   CAST(l_linenumber * 32768 + l_partkey AS BIGINT)
                       AS passage_id,
                   CASE WHEN l_linenumber = 1 THEN 'title'
                        ELSE 'body' END AS passage_type,
                   CAST(COALESCE(SUM((l_partkey % 40) + 4) OVER (
                        PARTITION BY l_orderkey
                        ORDER BY l_linenumber * 32768 + l_partkey
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        0) AS BIGINT) AS p_offset,
                   CAST((l_partkey % 40) + 3 AS BIGINT) AS p_len
            FROM lineitem
        """,
        # sequential word-boundary scan emulated step by step: document
        # text is strictly single-space [a-z]+ words, so the reference's
        # (?<!\\w)t(?!\\w) search from last_match equals space-padded
        # strpos over the remaining suffix; unmatched steps don't advance
        "offset_remap": """
            WITH d AS (
                SELECT doc_id, text AS t,
                       CAST((doc_id % 7) * 100 AS BIGINT) AS poff,
                       split_part(text, ' ', 2) AS w1,
                       split_part(text, ' ', 5) AS w2
                FROM documents),
            s1 AS (
                SELECT *, strpos(' ' || t || ' ', ' ' || w1 || ' ') - 1
                       AS st1
                FROM d),
            s1e AS (SELECT *, st1 + length(w1) AS e1 FROM s1),
            s2 AS (
                SELECT *, strpos(' ' || substr(t, e1 + 1) || ' ',
                                 ' ' || w2 || ' ') AS p2
                FROM s1e),
            s2e AS (
                SELECT *,
                       CASE WHEN p2 > 0 THEN e1 + p2 - 1 END AS st2,
                       CASE WHEN p2 > 0 THEN e1 + p2 - 1 + length(w2)
                            ELSE e1 END AS last2
                FROM s2),
            s3 AS (
                SELECT *, strpos(' ' || substr(t, last2 + 1) || ' ',
                                 ' ' || w1 || ' ') AS p3
                FROM s2e),
            s3e AS (
                SELECT *, CASE WHEN p3 > 0 THEN last2 + p3 - 1 END AS st3
                FROM s3)
            SELECT doc_id, CAST(0 AS BIGINT) AS passage_id,
                   CAST(1 AS BIGINT) AS ann_id, w1 AS text,
                   CAST(st1 + poff AS BIGINT) AS start,
                   CAST(st1 + length(w1) + poff AS BIGINT) AS "end"
            FROM s3e
            UNION ALL
            SELECT doc_id, CAST(0 AS BIGINT), CAST(2 AS BIGINT), w2,
                   CAST(st2 + poff AS BIGINT),
                   CAST(st2 + length(w2) + poff AS BIGINT)
            FROM s3e WHERE p2 > 0
            UNION ALL
            SELECT doc_id, CAST(0 AS BIGINT), CAST(3 AS BIGINT), w1,
                   CAST(st3 + poff AS BIGINT),
                   CAST(st3 + length(w1) + poff AS BIGINT)
            FROM s3e WHERE p3 > 0
        """,
        "bloom_semi_join": """
            SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
                   l_partkey
            FROM lineitem
            WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size > 25)
        """,
        "meta_blocking": """
            WITH assign AS (
                SELECT p_partkey AS rec,
                       'n:' || p_name || '/' || p_size AS blk FROM part
                UNION ALL
                SELECT p_partkey, 'bt:' || p_brand || '/' || p_type
                FROM part
                UNION ALL
                SELECT p_partkey, 'bs:' || p_brand || '/' || p_size
                FROM part),
            sz AS (SELECT blk, count(*) AS c FROM assign GROUP BY blk),
            ok AS (SELECT a.blk, a.rec FROM assign a
                   JOIN sz USING (blk) WHERE sz.c <= 128),
            w AS (SELECT x.rec AS a, y.rec AS b, count(*) AS w
                  FROM ok x JOIN ok y
                    ON x.blk = y.blk AND x.rec < y.rec
                  GROUP BY 1, 2),
            m AS (SELECT count(*) AS n, sum(w) AS s FROM w)
            SELECT a, b, CAST(w AS BIGINT) AS w FROM w, m
            WHERE w * m.n >= m.s
        """,
        "doc_rule_filters": """
            WITH base AS (
                SELECT doc_id, len(string_split(text, ' ')) AS nw,
                       length(text) AS nc
                FROM documents),
            wds AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
                    FROM documents),
            mx AS (SELECT doc_id, max(c) AS mx FROM (
                       SELECT doc_id, word, count(*) AS c
                       FROM wds GROUP BY 1, 2) GROUP BY 1)
            SELECT b.doc_id, CAST(nw AS BIGINT) AS n_words,
                   CASE WHEN nw < 30 THEN 'too_short'
                        WHEN 10 * (nc - nw + 1) > 47 * nw THEN 'long_words'
                        WHEN mx * 9 > nw THEN 'repetitive'
                        ELSE 'keep' END AS reason
            FROM base b JOIN mx USING (doc_id)
        """,
        "corpus_build": """
            WITH d AS (
                SELECT doc_id, text,
                       split_part(text, ' ', 2) AS w2,
                       split_part(text, ' ', 5) AS w5,
                       CASE WHEN doc_id % 2 = 0 THEN 'gene'
                            ELSE 'chem' END AS etype
                FROM documents),
            ann0 AS (
                SELECT doc_id,
                       CAST(strpos(' ' || text || ' ', ' ' || w2 || ' ')
                            - 1 AS BIGINT) AS start,
                       CAST(strpos(' ' || text || ' ', ' ' || w2 || ' ')
                            - 1 + length(w2) AS BIGINT) AS "end",
                       w2 AS text, etype
                FROM d
                UNION ALL
                SELECT doc_id,
                       CAST(strpos(' ' || text || ' ', ' ' || w5 || ' ')
                            - 1 AS BIGINT),
                       CAST(strpos(' ' || text || ' ', ' ' || w5 || ' ')
                            - 1 + length(w5) AS BIGINT),
                       w5, etype
                FROM d),
            expl AS (
                SELECT a.*, unnest(string_split(
                    'X:' || (doc_id % 50) || '|Y:' || (doc_id % 7), '|'))
                    AS identifier
                FROM ann0 a),
            res AS (
                SELECT *, CASE
                    WHEN identifier = 'Y:0' THEN '-1'
                    WHEN identifier LIKE 'X:%'
                         AND CAST(substr(identifier, 3) AS INT) % 5 = 0
                         AND CAST(substr(identifier, 3) AS INT) < 50
                        THEN 'X:' ||
                             (CAST(substr(identifier, 3) AS INT) + 100)
                    ELSE identifier END AS rid
                FROM expl),
            kb AS (
                SELECT DISTINCT 'X:' || (p_partkey % 150) AS id
                FROM part WHERE (p_partkey % 150) % 2 = 0
                UNION
                SELECT DISTINCT 'Y:' || (p_partkey % 150)
                FROM part WHERE (p_partkey % 150) % 2 = 0),
            inkb AS (
                SELECT * FROM res
                WHERE rid <> '-1' AND rid IN (SELECT id FROM kb))
            SELECT doc_id, start, "end", text, etype AS entity_type,
                   array_to_string(list_sort(list_distinct(
                       array_agg(rid))), ';') AS ids_joined,
                   count(DISTINCT rid) AS n_ids
            FROM inkb
            GROUP BY doc_id, start, "end", text, etype
        """,
        "safe_parse": """
            SELECT doc_id,
                   (split_part(text, ' ', 3) <> 'vector') AS ok,
                   CASE WHEN split_part(text, ' ', 3) = 'vector'
                        THEN 'ValueError: sentinel token at position 3'
                   END AS error,
                   CASE WHEN split_part(text, ' ', 3) <> 'vector'
                        THEN split_part(text, ' ', 1) END AS first_word,
                   CASE WHEN split_part(text, ' ', 3) <> 'vector'
                        THEN CAST(len(string_split(text, ' ')) AS BIGINT)
                   END AS n_words
            FROM documents
        """,
        "salted_join": """
            SELECT e.event_id, e.user_id, c.c_nationkey
            FROM events e JOIN customer c ON e.user_id = c.c_custkey
        """,
        "dedup_passages": """
            WITH w AS (
                SELECT doc_id, text, string_split(text, ' ') AS ws
                FROM documents),
            ch0 AS (
                SELECT doc_id, ws,
                       unnest(range(CAST(ceil(len(ws) / 8.0) AS BIGINT)))
                           AS i
                FROM w),
            ch AS (
                SELECT doc_id, CAST(i AS BIGINT) AS idx,
                       array_to_string(
                           list_slice(ws, i * 8 + 1, (i + 1) * 8), ' ')
                           AS passage
                FROM ch0),
            fw AS (
                SELECT md5(passage) AS m,
                       min(doc_id * 1048576 + idx) AS fp
                FROM ch GROUP BY 1),
            kept AS (
                SELECT c.doc_id, c.idx, c.passage FROM ch c
                JOIN fw f ON md5(c.passage) = f.m
                         AND c.doc_id * 1048576 + c.idx = f.fp),
            reb AS (
                SELECT doc_id,
                       string_agg(passage, ' ' ORDER BY idx)
                           AS clean_text,
                       count(*) AS n_kept
                FROM kept GROUP BY doc_id),
            tot AS (
                SELECT doc_id,
                       CAST(ceil(len(string_split(text, ' ')) / 8.0)
                            AS BIGINT) AS nch
                FROM documents)
            SELECT t.doc_id, COALESCE(r.clean_text, '') AS clean_text,
                   CAST(COALESCE(r.n_kept, 0) AS BIGINT) AS n_kept,
                   CAST(t.nch - COALESCE(r.n_kept, 0) AS BIGINT)
                       AS n_dropped
            FROM tot t LEFT JOIN reb r USING (doc_id)
        """,
        "leakage_safe_split": f"""
            WITH g AS (
                SELECT doc_id,
                       min(doc_id) OVER (PARTITION BY text) AS rep_id
                FROM documents)
            SELECT doc_id, rep_id,
                   CASE WHEN CAST(('0x' || substr(md5(CAST(rep_id AS VARCHAR)
                                                   || ':3'), 1, 15))
                             AS BIGINT) < {_SPLIT_CUT1} THEN 'train'
                        WHEN CAST(('0x' || substr(md5(CAST(rep_id AS VARCHAR)
                                                   || ':3'), 1, 15))
                             AS BIGINT) < {_SPLIT_CUT2} THEN 'val'
                        ELSE 'test' END AS split
            FROM g
        """,
        "foreign_name_homonyms": """
            SELECT p_name AS name,
                   count(DISTINCT p_brand) AS n_identifiers,
                   count(DISTINCT p_type) AS n_foreign
            FROM part GROUP BY p_name
            HAVING count(DISTINCT p_brand) > 1
               AND count(DISTINCT p_type) > 1
        """,
        "eval_subsets": """
            WITH a AS (
                SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey,
                       CAST((s_suppkey * 7919) % 50 AS BIGINT) AS identifier,
                       'n' || (s_nationkey % 5) AS surface,
                       CASE WHEN (s_suppkey * 104729) % 10 < 3
                            THEN 'test' ELSE 'train' END AS split
                FROM supplier),
            tr AS (SELECT DISTINCT identifier, surface FROM a
                   WHERE split = 'train'),
            tid AS (SELECT DISTINCT identifier FROM a WHERE split = 'train')
            SELECT t.s_suppkey, t.identifier, t.surface,
                   CASE WHEN EXISTS (SELECT 1 FROM tr
                                     WHERE tr.identifier = t.identifier
                                       AND tr.surface = t.surface) THEN 'seen'
                        WHEN EXISTS (SELECT 1 FROM tid
                                     WHERE tid.identifier = t.identifier)
                            THEN 'stratified'
                        ELSE 'zeroshot' END AS subset
            FROM a t WHERE t.split = 'test'
        """,
        # exact n-gram Jaccard: token trigram sets rebuilt in SQL (the Ray
        # path uses 64-bit token-hash trigrams — same sets barring hash
        # collisions); candidates here are ALL pairs, so equality also
        # certifies the LSH channel recalled every pair above threshold
        "ngram_jaccard_docs": r"""
            WITH toks AS (
                SELECT doc_id,
                       regexp_extract_all(lower(text), '[a-z0-9_]+') AS t
                FROM documents),
            sh AS (
                SELECT doc_id,
                       list_distinct(list_transform(range(1, len(t) - 1),
                           i -> t[i] || chr(1) || t[i+1] || chr(1) || t[i+2]))
                           AS s
                FROM toks WHERE len(t) >= 3),
            p AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                       len(list_intersect(a.s, b.s)) AS i,
                       len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS u
                FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
            SELECT id_a, id_b, CAST(i AS DOUBLE) / u AS jaccard
            FROM p WHERE CAST(i AS DOUBLE) / u >= 0.3
        """,
        # md5-mode hash sampling: the SAME 60-bit hash re-derived in SQL
        "hash_sample": f"""
            SELECT doc_id, lang, source FROM documents
            WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':7'),
                                       1, 15)) AS BIGINT)
                  < {int(0.25 * 16 ** 15)}
        """,
        "upsample_chunks": """
            WITH h AS (
                SELECT doc_id,
                       CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                                                || ':3'), 1, 15)) AS BIGINT)
                           AS hv
                FROM documents),
            r AS (
                SELECT doc_id, hv % 64 AS b,
                       row_number() OVER (PARTITION BY hv % 64
                                          ORDER BY hv, doc_id) - 1 AS rk
                FROM h)
            SELECT doc_id, rk // 50 + (CAST(b AS BIGINT) << 32) AS chunk_id
            FROM r
        """,
        "asof_snapshot": """
            WITH l AS (SELECT event_id, user_id, ts, value FROM events
                       WHERE event_id % 5 <> 0),
            r AS (SELECT user_id, ts AS ts_r, value AS value_r FROM events
                  WHERE event_id % 5 = 0)
            SELECT l.user_id, l.event_id, l.ts, l.value, r.ts_r, r.value_r
            FROM l ASOF JOIN r
              ON l.user_id = r.user_id AND l.ts >= r.ts_r
        """,
        "top_orders_per_customer": """
            WITH r AS (SELECT o_custkey, o_orderkey, o_totalprice,
                              row_number() OVER (
                                  PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey)
                                  AS rn
                       FROM orders)
            SELECT o_custkey, o_orderkey, o_totalprice FROM r WHERE rn <= 3
        """,
        "bm25_search": _bm25_sql(BM25_TERMS, k=25),
        "hll_distinct_users": _hll_sql("events", "event_type", "user_id",
                                       p=9, seed=0),
        # the merged-sketch rollup must equal the direct coarse sketch
        # (register max is associative) — same oracle by construction
        "hll_merge_rollup": _hll_sql("events", "event_type", "user_id",
                                     p=9, seed=0),
        "heavy_hitter_tokens": """
            WITH t AS (SELECT unnest(regexp_extract_all(lower(text),
                                                        '[a-z0-9]+'))
                           AS token
                       FROM documents)
            SELECT token, count(*) AS cnt FROM t GROUP BY token
            HAVING count(*) > 0.03 * (SELECT count(*) FROM t)
        """,
        "tfidf_top_terms": """
            WITH toks AS (
                SELECT doc_id,
                       unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
                           AS token
                FROM documents),
            tf AS (SELECT doc_id, token, CAST(count(*) AS DOUBLE) AS tf
                   FROM toks GROUP BY doc_id, token),
            df AS (SELECT token, CAST(count(*) AS DOUBLE) AS df
                   FROM (SELECT DISTINCT doc_id, token FROM toks)
                   GROUP BY token),
            n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
            w AS (SELECT tf.doc_id, tf.token,
                         round(tf.tf * (ln((1.0 + n.n) / (1.0 + df.df))
                                        + 1.0), 4) AS weight
                  FROM tf JOIN df ON df.token = tf.token, n),
            r AS (SELECT doc_id, token, weight,
                         row_number() OVER (PARTITION BY doc_id
                                            ORDER BY weight DESC, token)
                             AS rn
                  FROM w)
            SELECT doc_id, token, weight FROM r WHERE rn <= 3
        """,
        "user_event_windows": """
            WITH t AS (
                SELECT event_id, ts, user_id, value,
                       CAST(round(value * 100) AS BIGINT) AS cents
                FROM events)
            SELECT event_id, user_id,
                   lag(value) OVER w AS prev_value,
                   lead(value) OVER w AS next_value,
                   CAST(sum(cents) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id
                                         ROWS BETWEEN UNBOUNDED PRECEDING
                                              AND CURRENT ROW)
                        AS BIGINT) AS cum_cents,
                   row_number() OVER w AS rn
            FROM t
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        """,
        "user_event_rolling": """
            WITH t AS (
                SELECT event_id, ts, user_id,
                       CAST(round(value * 100) AS BIGINT) AS cents
                FROM events)
            SELECT event_id, user_id,
                   CAST(sum(cents) OVER w AS BIGINT) AS roll_sum,
                   min(cents) OVER w AS roll_min,
                   max(cents) OVER w AS roll_max
            FROM t
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
        """,
        "event_value_quantiles": """
            WITH t AS (
                SELECT event_type,
                       CAST(round(value * 100) AS BIGINT) AS cents
                FROM events)
            SELECT event_type,
                   quantile_disc(cents, 0.25) AS p25,
                   quantile_disc(cents, 0.50) AS p50,
                   quantile_disc(cents, 0.75) AS p75,
                   quantile_disc(cents, 0.95) AS p95
            FROM t GROUP BY event_type
        """,
        "user_value_ranks": """
            WITH t AS (
                SELECT event_id, user_id,
                       CAST(round(value * 100) AS BIGINT) AS cents
                FROM events)
            SELECT event_id, user_id,
                   RANK() OVER w_ties AS rnk,
                   DENSE_RANK() OVER w_ties AS drnk,
                   NTILE(4) OVER w_total AS quartile,
                   first_value(event_id) OVER w_total AS cheapest_event,
                   last_value(event_id) OVER (
                       PARTITION BY user_id ORDER BY cents, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                            AND UNBOUNDED FOLLOWING) AS dearest_event
            FROM t
            WINDOW w_ties AS (PARTITION BY user_id ORDER BY cents),
                   w_total AS (PARTITION BY user_id
                               ORDER BY cents, event_id)
        """,
        "event_daily_pivot": """
            SELECT strftime(ts, '%Y-%m-%d') AS day,
                   count(*) FILTER (WHERE event_type = 'click')    AS n_click,
                   count(*) FILTER (WHERE event_type = 'view')     AS n_view,
                   count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
                   count(*) FILTER (WHERE event_type = 'signup')   AS n_signup,
                   count(*) FILTER (WHERE event_type = 'error')    AS n_error
            FROM events GROUP BY day
        """,
        "customer_order_counts": """
            SELECT c.c_custkey, count(o.o_orderkey) AS n_orders
            FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
            GROUP BY c.c_custkey
        """,
        "hourly_distinct_users": """
            SELECT strftime(date_trunc('hour', ts),
                            '%Y-%m-%d %H:%M:%S') AS window_start,
                   event_type,
                   count(DISTINCT user_id) AS n_users
            FROM events GROUP BY 1, 2
        """,
        "parts_never_ordered": """
            SELECT p_partkey AS partkey FROM part
            EXCEPT
            SELECT l_partkey AS partkey FROM lineitem
            WHERE l_quantity >= 48.0
        """,
        "supplier_customer_nations": """
            SELECT s_nationkey AS nationkey FROM supplier
            INTERSECT
            SELECT c_nationkey AS nationkey FROM customer
        """,
        "user_modal_event_type": """
            SELECT user_id, event_type AS modal_type FROM (
                SELECT user_id, event_type,
                       row_number() OVER (
                           PARTITION BY user_id
                           ORDER BY count(*) DESC, event_type) AS rn
                FROM events GROUP BY user_id, event_type)
            WHERE rn = 1
        """,
        # exact-units moments (values are exact 2-decimal): BIGINT sums
        # of cents mirror moment_stats(decimals=2) token-for-token, so
        # both engines divide the SAME exact integers — partitioning-
        # and summation-order-independent at any scale factor
        "user_value_stats": """
            WITH c AS (SELECT user_id,
                              CAST(round(value * 100) AS BIGINT) AS c
                       FROM events),
            m AS (SELECT user_id, count(*) AS n, sum(c) AS sc,
                         sum(c * c) AS sc2
                  FROM c GROUP BY 1)
            SELECT user_id, n,
                   round(CAST(sc AS DOUBLE) / (100.0 * n), 4) AS mean,
                   round(CAST(n * sc2 - sc * sc AS DOUBLE)
                         / ((100.0 * 100.0 * n) * (n - 1)), 4) AS var,
                   round(sqrt(CAST(n * sc2 - sc * sc AS DOUBLE)
                         / ((100.0 * 100.0 * n) * (n - 1))), 4) AS std
            FROM m
        """,
        "lineitem_corr": """
            SELECT l_returnflag,
                   round(corr(l_extendedprice, l_discount), 4)
                       AS price_discount_corr
            FROM lineitem GROUP BY l_returnflag
        """,
        "event_rollup": """
            SELECT COALESCE(event_type, 'ALL') AS event_type,
                   COALESCE(day, 'ALL') AS day,
                   count(*) AS n_events,
                   CAST(sum(cents) AS BIGINT) AS sum_cents
            FROM (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
                         CAST(round(value * 100) AS BIGINT) AS cents
                  FROM events)
            GROUP BY ROLLUP(event_type, day)
        """,
        "event_value_percentiles": """
            SELECT event_type,
                   round(quantile_cont(value, 0.25), 4) AS p25,
                   round(quantile_cont(value, 0.50), 4) AS p50,
                   round(quantile_cont(value, 0.75), 4) AS p75,
                   round(quantile_cont(value, 0.99), 4) AS p99
            FROM events GROUP BY event_type
        """,
        "event_cube": """
            SELECT COALESCE(event_type, 'ALL') AS event_type,
                   COALESCE(day, 'ALL') AS day,
                   count(*) AS n_events,
                   CAST(sum(cents) AS BIGINT) AS sum_cents
            FROM (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
                         CAST(round(value * 100) AS BIGINT) AS cents
                  FROM events)
            GROUP BY CUBE(event_type, day)
        """,
        "user_value_pctl": """
            WITH t AS (
                SELECT event_id, user_id,
                       CAST(round(value * 100) AS BIGINT) AS cents
                FROM events)
            SELECT event_id, user_id,
                   round(percent_rank() OVER w_ties, 6) AS pr,
                   round(cume_dist() OVER w_ties, 6) AS cd,
                   CAST(nth_value(event_id, 3) OVER (
                       PARTITION BY user_id ORDER BY cents, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                            AND UNBOUNDED FOLLOWING) AS DOUBLE)
                       AS third_cheapest
            FROM t
            WINDOW w_ties AS (PARTITION BY user_id ORDER BY cents)
        """,
        "user_event_paths": """
            SELECT user_id,
                   string_agg(event_type, ',' ORDER BY ts, event_id)
                       AS journey
            FROM events GROUP BY user_id
        """,
        "event_overlaps": """
            WITH iv AS (
                SELECT event_id, user_id, event_type, ts AS start,
                       ts + to_seconds(CAST(floor(value * 240) AS BIGINT))
                           AS stop
                FROM events
                WHERE event_type IN ('click', 'purchase'))
            SELECT c.event_id AS click_id, p.event_id AS purchase_id,
                   c.user_id AS user_id
            FROM iv c JOIN iv p
              ON c.user_id = p.user_id
             AND c.event_type = 'click' AND p.event_type = 'purchase'
             AND c.start <= p.stop AND p.start <= c.stop
        """,
        "event_grouping_sets": """
            SELECT COALESCE(event_type, 'ALL') AS event_type,
                   COALESCE(day, 'ALL') AS day,
                   count(*) AS n_events,
                   CAST(sum(cents) AS BIGINT) AS sum_cents
            FROM (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
                         CAST(round(value * 100) AS BIGINT) AS cents
                  FROM events)
            GROUP BY GROUPING SETS ((event_type), (day), ())
        """,
        "user_value_shape": """
            SELECT user_id, count(*) AS n,
                   -- exact-units mean (see user_value_stats); skew/kurt
                   -- stay on the mirrored float expressions
                   round(CAST(sum(CAST(round(value * 100) AS BIGINT))
                              AS DOUBLE) / (100.0 * count(*)), 4) AS mean,
                   round((sum(value*value*value)/count(*)
                          - 3*(sum(value)/count(*))*(sum(value*value)/count(*))
                          + 2*pow(sum(value)/count(*), 3))
                         / pow(sum(value*value)/count(*)
                               - pow(sum(value)/count(*), 2), 1.5), 4)
                       AS skew,
                   round((sum(value*value*value*value)/count(*)
                          - 4*(sum(value)/count(*))
                              *(sum(value*value*value)/count(*))
                          + 6*pow(sum(value)/count(*), 2)
                              *(sum(value*value)/count(*))
                          - 3*pow(sum(value)/count(*), 4))
                         / pow(sum(value*value)/count(*)
                               - pow(sum(value)/count(*), 2), 2) - 3, 4)
                       AS kurt
            FROM events GROUP BY user_id
        """,
        "part_attributes_long": """
            SELECT p_partkey, 'p_size' AS attribute,
                   CAST(p_size AS DOUBLE) AS value FROM part
            UNION ALL
            SELECT p_partkey, 'p_retailprice' AS attribute,
                   p_retailprice AS value FROM part
        """,
        "order_item_balance": """
            WITH big AS (SELECT o_orderkey AS orderkey, o_orderpriority
                         FROM orders WHERE o_totalprice > 300000),
                 rev AS (SELECT l_orderkey AS orderkey,
                                sum(CAST(round(l_extendedprice * 100)
                                         AS BIGINT)
                                    * CAST(round((1 - l_discount) * 100)
                                           AS BIGINT)) AS rev_e4
                         FROM lineitem WHERE l_quantity > 45
                         GROUP BY l_orderkey)
            SELECT COALESCE(big.orderkey, rev.orderkey) AS orderkey,
                   COALESCE(o_orderpriority, 'NONE') AS o_orderpriority,
                   CAST(COALESCE(rev_e4, 0) AS BIGINT) AS item_rev_e4
            FROM big FULL OUTER JOIN rev ON big.orderkey = rev.orderkey
        """,
        "dup_passage_spans": """
            WITH s AS (SELECT doc_id, string_split(text, ' ') AS toks
                       FROM documents),
                 p AS (SELECT doc_id, toks,
                              unnest(range(0, len(toks) - 4)) AS pos
                       FROM s),
                 g AS (SELECT doc_id, pos,
                              array_to_string(toks[pos+1:pos+5], ' ')
                                  AS gram
                       FROM p),
                 d AS (SELECT gram FROM g
                       GROUP BY gram HAVING count(*) >= 2),
                 m AS (SELECT g.doc_id, g.pos FROM g JOIN d USING (gram)),
                 b AS (SELECT doc_id, pos,
                              CASE WHEN lag(pos) OVER w IS NULL
                                     OR pos - lag(pos) OVER w > 5
                                   THEN 1 ELSE 0 END AS brk
                       FROM m
                       WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
                 i AS (SELECT doc_id, pos,
                              sum(brk) OVER (PARTITION BY doc_id
                                             ORDER BY pos) AS island
                       FROM b)
            SELECT doc_id, CAST(min(pos) AS INT) AS tok_start,
                   CAST(max(pos) + 5 AS INT) AS tok_end,
                   count(*) AS n_dup_grams
            FROM i GROUP BY doc_id, island
        """,
        "parts_bought_together": """
            WITH items AS (SELECT DISTINCT l_orderkey AS g,
                                  l_partkey AS it FROM lineitem),
                 pairs AS (SELECT x.it AS a, y.it AS b
                           FROM items x JOIN items y
                             ON x.g = y.g AND x.it < y.it)
            SELECT a, b, count(*) AS n_groups FROM pairs GROUP BY a, b
            ORDER BY n_groups DESC, a, b LIMIT 40
        """,
        "user_value_mad": """
            WITH med AS (SELECT user_id,
                                quantile_disc(value, 0.5) AS med
                         FROM events GROUP BY user_id)
            SELECT e.user_id,
                   quantile_disc(abs(e.value - m.med), 0.5) AS mad
            FROM events e JOIN med m USING (user_id)
            GROUP BY e.user_id
        """,
        "user_value_zscores": """
            SELECT event_id, user_id, round(value, 4) AS value,
                   round((value - avg(value) OVER w)
                         / stddev_samp(value) OVER w, 4) AS z
            FROM events WINDOW w AS (PARTITION BY user_id)
        """,
        "quality_weighted_sample": """
            WITH w AS (
                SELECT doc_id, lang, n_chars,
                       pow(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                                                    || ':11'), 1, 15))
                                AS BIGINT) / 1152921504606846976.0,
                           1.0 / n_chars) AS wkey
                FROM documents WHERE n_chars > 0),
                 r AS (SELECT doc_id, lang, n_chars,
                              row_number() OVER (PARTITION BY lang
                                                 ORDER BY wkey DESC,
                                                          doc_id) AS rk
                       FROM w)
            SELECT doc_id, lang, n_chars FROM r WHERE rk <= 5
        """,
        "event_value_approx_quantiles": """
            SELECT event_type,
                   quantile_disc(floor(value / 0.5) * 0.5, 0.5) AS p50,
                   quantile_disc(floor(value / 0.5) * 0.5, 0.95) AS p95
            FROM events GROUP BY event_type
        """,
        "event_prop_stats": """
            SELECT event_type, count(*) AS n,
                   CAST(sum(CAST(json_extract_string(props, '$.k')
                                 AS BIGINT)) AS BIGINT) AS sum_k
            FROM events GROUP BY event_type
        """,
        "doc_first_words": """
            SELECT regexp_extract(text, '^([A-Za-z0-9_]+)', 1)
                       AS first_word,
                   count(*) AS n_docs
            FROM documents GROUP BY first_word
            ORDER BY n_docs DESC, first_word LIMIT 20
        """,
        "part_pagerank": """
            WITH items AS (SELECT DISTINCT l_orderkey AS g,
                                  l_partkey AS it FROM lineitem),
                 edges AS (SELECT DISTINCT x.it AS src, y.it AS dst
                           FROM items x JOIN items y
                             ON x.g = y.g AND x.it <> y.it),
                 nodes AS (SELECT DISTINCT src AS node FROM edges),
                 nn AS (SELECT count(*) AS n FROM nodes),
                 deg AS (SELECT src AS node, count(*) AS d
                         FROM edges GROUP BY src),
                 r0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS rank
                        FROM nodes),
                 r1 AS (SELECT nodes.node,
                               0.15 / (SELECT n FROM nn)
                               + 0.85 * COALESCE(c.c, 0) AS rank
                        FROM nodes LEFT JOIN (
                            SELECT e.dst AS node,
                                   sum(r0.rank / deg.d) AS c
                            FROM edges e
                            JOIN r0 ON e.src = r0.node
                            JOIN deg ON e.src = deg.node
                            GROUP BY e.dst) c USING (node)),
                 r2 AS (SELECT nodes.node,
                               0.15 / (SELECT n FROM nn)
                               + 0.85 * COALESCE(c.c, 0) AS rank
                        FROM nodes LEFT JOIN (
                            SELECT e.dst AS node,
                                   sum(r1.rank / deg.d) AS c
                            FROM edges e
                            JOIN r1 ON e.src = r1.node
                            JOIN deg ON e.src = deg.node
                            GROUP BY e.dst) c USING (node)),
                 r3 AS (SELECT nodes.node,
                               0.15 / (SELECT n FROM nn)
                               + 0.85 * COALESCE(c.c, 0) AS rank
                        FROM nodes LEFT JOIN (
                            SELECT e.dst AS node,
                                   sum(r2.rank / deg.d) AS c
                            FROM edges e
                            JOIN r2 ON e.src = r2.node
                            JOIN deg ON e.src = deg.node
                            GROUP BY e.dst) c USING (node))
            SELECT node, round(rank, 9) AS rank FROM r3
            ORDER BY rank DESC, node LIMIT 30
        """,
        "signup_funnel": """
            WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
                        WHERE event_type = 'signup' GROUP BY user_id),
                 s2 AS (SELECT e.user_id, min(e.ts) AS t2
                        FROM events e JOIN s1 USING (user_id)
                        WHERE e.event_type = 'click' AND e.ts >= s1.t1
                        GROUP BY e.user_id),
                 s3 AS (SELECT e.user_id, min(e.ts) AS t3
                        FROM events e JOIN s2 USING (user_id)
                        WHERE e.event_type = 'purchase' AND e.ts >= s2.t2
                        GROUP BY e.user_id)
            SELECT s1.user_id,
                   CASE WHEN t3 IS NOT NULL THEN 3
                        WHEN t2 IS NOT NULL THEN 2
                        ELSE 1 END AS steps_completed,
                   t1 AS t_first,
                   COALESCE(t3, t2, t1) AS t_last
            FROM s1 LEFT JOIN s2 USING (user_id)
                    LEFT JOIN s3 USING (user_id)
        """,
        "value_deciles": """
            WITH b AS (SELECT quantile_disc(value,
                           [0.1, 0.2, 0.3, 0.4, 0.5,
                            0.6, 0.7, 0.8, 0.9]) AS bs FROM events)
            SELECT CAST(len(list_filter(b.bs, x -> x < e.value)) + 1
                        AS INT) AS decile,
                   count(*) AS n
            FROM events e CROSS JOIN b
            GROUP BY decile
        """,
        "doc_lm_scores": """
            WITH s AS (SELECT doc_id, string_split(text, ' ') AS toks
                       FROM documents),
                 p AS (SELECT doc_id, toks,
                              unnest(range(0, len(toks) - 1)) AS i
                       FROM s),
                 bg AS (SELECT doc_id, toks[i+1] AS w1, toks[i+2] AS w2
                        FROM p),
                 c12 AS (SELECT w1, w2, count(*) AS c12
                         FROM bg GROUP BY w1, w2),
                 c1 AS (SELECT w1, sum(c12) AS c1 FROM c12 GROUP BY w1),
                 vv AS (SELECT count(DISTINCT tok) AS v
                        FROM (SELECT unnest(toks) AS tok FROM s)),
                 lp AS (SELECT bg.doc_id,
                               ln((c12.c12 + 1.0)
                                  / (c1.c1 + 1.0 * (SELECT v FROM vv)))
                                   AS lp
                        FROM bg JOIN c12 USING (w1, w2)
                                JOIN c1 USING (w1))
            SELECT doc_id, count(*) AS n_bigrams,
                   round(avg(lp), 6) AS logprob_mean
            FROM lp GROUP BY doc_id
        """,
        "incremental_dedup": """
            WITH k AS (SELECT count(*) // 2 AS s FROM documents),
                 w1 AS (SELECT md5(text) AS h FROM documents
                        WHERE doc_id < (SELECT s FROM k)),
                 w2 AS (SELECT doc_id, md5(text) AS h FROM documents
                        WHERE doc_id >= (SELECT s FROM k))
            SELECT doc_id FROM w2
            WHERE h NOT IN (SELECT h FROM w1)
              AND doc_id = (SELECT min(doc_id) FROM w2 b
                            WHERE b.h = w2.h)
        """,
        "user_event_entropy": """
            WITH c AS (SELECT user_id, event_type, count(*) AS c
                       FROM events GROUP BY user_id, event_type),
                 t AS (SELECT user_id, sum(c) AS n FROM c
                       GROUP BY user_id)
            SELECT c.user_id,
                   round(ln(t.n) - sum(c.c * ln(c.c)) / t.n, 6)
                       AS entropy
            FROM c JOIN t USING (user_id) GROUP BY c.user_id, t.n
        """,
        "stratified_docs_sample": f"""
            SELECT doc_id, lang, source FROM documents
            WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                                            || ':7'), 1, 15)) AS BIGINT)
                  < CASE lang WHEN 'en' THEN {int(0.5 * 16 ** 15)}
                              WHEN 'de' THEN {int(0.25 * 16 ** 15)}
                              ELSE {int(0.10 * 16 ** 15)} END
        """,
        "user_value_winsorized": """
            WITH b AS (SELECT user_id,
                              quantile_disc(value, 0.10) AS qlo,
                              quantile_disc(value, 0.90) AS qhi
                       FROM events GROUP BY user_id)
            SELECT e.user_id, count(*) AS n,
                   CAST(sum(CAST(round(
                       least(greatest(e.value, b.qlo), b.qhi) * 100)
                       AS BIGINT)) AS BIGINT) AS sum_wc
            FROM events e JOIN b USING (user_id)
            GROUP BY e.user_id
        """,
        "user_event_validity": """
            SELECT user_id, event_id,
                   epoch_us(ts) AS ts_us,
                   lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                            ORDER BY epoch_us(ts),
                                                     event_id)
                       AS valid_to_us
            FROM events
        """,
        "wealthy_or_supplier_nations": """
            SELECT c_nationkey FROM customer WHERE c_acctbal > 9000
            UNION
            SELECT s_nationkey FROM supplier
        """,
        "nation_type_matrix": """
            SELECT n_nationkey, n_name, event_type
            FROM nation CROSS JOIN (SELECT DISTINCT event_type
                                    FROM events)
        """,
        "user_value_regression": """
            WITH m AS (
                SELECT user_id, count(*) AS n,
                       sum(x) AS sx, sum(y) AS sy, sum(x * x) AS sxx,
                       sum(y * y) AS syy, sum(x * y) AS sxy
                FROM (SELECT user_id,
                             (epoch(ts) - 1704067200.0) / 86400.0 AS x,
                             value AS y FROM events)
                GROUP BY user_id)
            SELECT user_id, n,
                   round(CASE WHEN sxx - sx * sx / n > 0
                         THEN (sxy - sx * sy / n) / (sxx - sx * sx / n)
                         END, 6) AS slope,
                   round(CASE WHEN sxx - sx * sx / n > 0
                         THEN (sy - (sxy - sx * sy / n)
                               / (sxx - sx * sx / n) * sx) / n
                         END, 4) AS intercept,
                   round(CASE WHEN sxx - sx * sx / n > 0 THEN
                         CASE WHEN syy - sy * sy / n > 0
                         THEN (sxy - sx * sy / n) * (sxy - sx * sy / n)
                              / ((sxx - sx * sx / n) * (syy - sy * sy / n))
                         ELSE 1.0 END END, 6) AS r2
            FROM m
        """,
        "weekly_cohort_retention": """
            WITH a AS (SELECT DISTINCT user_id,
                              (CAST(floor(epoch(ts)) AS BIGINT) + 259200)
                              // 604800 AS w
                       FROM events),
                 f AS (SELECT user_id, min(w) AS cw FROM a
                       GROUP BY user_id)
            SELECT f.cw AS cohort_period, a.w - f.cw AS period_offset,
                   count(*) AS n_users
            FROM a JOIN f USING (user_id)
            GROUP BY f.cw, a.w - f.cw
        """,
        "customer_table_diff": """
            WITH old AS (SELECT c_custkey, c_acctbal, c_mktsegment
                         FROM customer WHERE c_custkey % 11 != 0),
                 new AS (SELECT c_custkey,
                                CASE WHEN c_custkey % 5 = 0
                                     THEN c_acctbal + 100.0
                                     ELSE c_acctbal END AS c_acctbal,
                                c_mktsegment
                         FROM customer WHERE c_custkey % 13 != 0),
                 j AS (SELECT coalesce(old.c_custkey, new.c_custkey)
                              AS c_custkey,
                              old.c_custkey IS NULL AS only_new,
                              new.c_custkey IS NULL AS only_old,
                              old.c_acctbal IS DISTINCT FROM
                                  new.c_acctbal AS d_bal,
                              old.c_mktsegment IS DISTINCT FROM
                                  new.c_mktsegment AS d_seg
                       FROM old FULL OUTER JOIN new
                            ON old.c_custkey = new.c_custkey)
            SELECT c_custkey,
                   CASE WHEN only_new THEN 'added'
                        WHEN only_old THEN 'removed'
                        ELSE 'changed' END AS status,
                   CASE WHEN only_new OR only_old THEN ''
                        ELSE concat_ws(',',
                             CASE WHEN d_bal THEN 'c_acctbal' END,
                             CASE WHEN d_seg THEN 'c_mktsegment' END)
                        END AS changed_cols
            FROM j
            WHERE only_new OR only_old OR d_bal OR d_seg
        """,
        "user_value_daily_ffill": """
            WITH obs AS (
                SELECT user_id,
                       CAST(floor(epoch(ts) / 86400) AS BIGINT) AS period,
                       max(value) AS v
                FROM events GROUP BY 1, 2),
            bounds AS (
                SELECT user_id, min(period) AS lo, max(period) AS hi
                FROM obs GROUP BY 1),
            grid AS (
                SELECT b.user_id, unnest(generate_series(b.lo, b.hi))
                       AS period
                FROM bounds b)
            SELECT g.user_id, g.period,
                   last_value(o.v IGNORE NULLS) OVER (
                       PARTITION BY g.user_id ORDER BY g.period
                       ROWS UNBOUNDED PRECEDING) AS value_ffill
            FROM grid g LEFT JOIN obs o
                 ON g.user_id = o.user_id AND g.period = o.period
        """,
        "user_event_transitions": """
            WITH seq AS (
                SELECT event_type AS from_state,
                       lead(event_type) OVER (
                           PARTITION BY user_id
                           ORDER BY ts, event_id) AS to_state
                FROM events)
            SELECT from_state, to_state, count(*) AS n
            FROM seq WHERE to_state IS NOT NULL
            GROUP BY 1, 2
        """,
        "doc_shard_assignment": """
            WITH h AS (
                SELECT doc_id, lang,
                       CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                                                || ':5'), 1, 15)) AS BIGINT)
                           AS hv
                FROM documents)
            SELECT doc_id, lang, hv % 8 AS shard,
                   row_number() OVER (PARTITION BY hv % 8
                                      ORDER BY hv, doc_id) - 1 AS pos
            FROM h
        """,
        "doc_chunks": r"""
            WITH idx AS (
                SELECT doc_id, text,
                       unnest(generate_series(
                           0, greatest(length(text) - 1, 0) // 80)) AS i
                FROM documents)
            SELECT doc_id, i AS chunk_idx, i * 80 AS chunk_start,
                   substring(text, i * 80 + 1, 120) AS chunk_text,
                   length(substring(text, i * 80 + 1, 120)) AS chunk_len
            FROM idx
        """,
        "seq_packing": r"""
            WITH t AS (
                SELECT doc_id,
                       len(list_filter(regexp_split_to_array(text, '\s+'),
                                       x -> x <> '')) AS n_tokens
                FROM documents),
            s AS (
                SELECT doc_id, n_tokens,
                       CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING), 0) AS BIGINT) AS start_token
                FROM t)
            SELECT doc_id, n_tokens, start_token,
                   start_token + n_tokens AS end_token,
                   start_token // 512 AS first_seq,
                   CASE WHEN n_tokens = 0 THEN start_token // 512
                        ELSE (start_token + n_tokens - 1) // 512
                   END AS last_seq
            FROM s
        """,
        "pii_redaction": r"""
            WITH s0 AS (SELECT doc_id, text AS t FROM documents),
            s1 AS (SELECT doc_id,
                       len(regexp_extract_all(t,
                           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
                           AS c1,
                       regexp_replace(t,
                           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                           '<EMAIL>', 'g') AS t
                   FROM s0),
            s2 AS (SELECT doc_id, c1,
                       len(regexp_extract_all(t,
                           '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS c2,
                       regexp_replace(t,
                           '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b',
                           '<IP>', 'g') AS t
                   FROM s1),
            s3 AS (SELECT doc_id, c1, c2,
                       len(regexp_extract_all(t, '\b\d{3}-\d{2}-\d{4}\b'))
                           AS c3,
                       regexp_replace(t, '\b\d{3}-\d{2}-\d{4}\b',
                                      '<ID>', 'g') AS t
                   FROM s2),
            s4 AS (SELECT doc_id, c1, c2, c3,
                       len(regexp_extract_all(t, '\+\d{7,15}\b')) AS c4,
                       regexp_replace(t, '\+\d{7,15}\b', '<PHONE>', 'g') AS t
                   FROM s3)
            SELECT doc_id, t AS text_redacted,
                   CAST(c1 + c2 + c3 + c4 AS BIGINT) AS n_pii
            FROM s4
        """,
        "contamination_flags": r"""
            WITH words AS (
                SELECT doc_id,
                       regexp_extract_all(lower(text), '[a-z0-9]+') AS w
                FROM documents),
            grams AS (
                SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
                FROM (SELECT doc_id, w,
                             unnest(generate_series(1, len(w) - 2)) AS i
                      FROM words)),
            bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 50 = 0),
            hits AS (
                SELECT g2.doc_id, count(*) AS n_hits
                FROM (SELECT DISTINCT doc_id, g FROM grams
                      WHERE doc_id % 50 <> 0) g2
                JOIN bench USING (g)
                GROUP BY g2.doc_id)
            SELECT d.doc_id,
                   CAST(COALESCE(h.n_hits, 0) AS BIGINT)
                       AS n_contaminated_ngrams,
                   COALESCE(h.n_hits, 0) > 0 AS contaminated
            FROM documents d LEFT JOIN hits h USING (doc_id)
            WHERE d.doc_id % 50 <> 0
        """,
        "repetition_stats": r"""
            WITH base AS (
                SELECT doc_id,
                       list_filter(string_split(text, chr(10)),
                                   x -> x <> '') AS ls,
                       regexp_extract_all(lower(text), '[a-z0-9]+') AS w
                FROM documents),
            wordstats AS (
                SELECT doc_id, CAST(max(c) AS DOUBLE) / sum(c)
                           AS top_word_frac
                FROM (SELECT doc_id, word, count(*) AS c
                      FROM (SELECT doc_id, unnest(w) AS word FROM base)
                      GROUP BY doc_id, word)
                GROUP BY doc_id),
            bigrams AS (
                SELECT doc_id, count(*) AS nb, count(DISTINCT g) AS db
                FROM (SELECT doc_id, w[i] || ' ' || w[i+1] AS g
                      FROM (SELECT doc_id, w,
                                   unnest(generate_series(1, len(w) - 1)) AS i
                            FROM base))
                GROUP BY doc_id)
            SELECT b.doc_id,
                   CASE WHEN len(ls) = 0 THEN 0.0
                        ELSE CAST(len(ls) - len(list_distinct(ls)) AS DOUBLE)
                             / len(ls)
                   END AS dup_line_frac,
                   COALESCE(ws.top_word_frac, 0.0) AS top_word_frac,
                   CASE WHEN bg.nb IS NULL THEN 0.0
                        ELSE CAST(bg.nb - bg.db AS DOUBLE) / bg.nb
                   END AS dup_bigram_frac
            FROM base b
            LEFT JOIN wordstats ws USING (doc_id)
            LEFT JOIN bigrams bg USING (doc_id)
        """,
        "corpus_ngrams": r"""
            WITH words AS (
                SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS w
                FROM documents),
            grams AS (
                SELECT w[i] || ' ' || w[i+1] AS gram
                FROM (SELECT w, unnest(generate_series(1, len(w) - 1)) AS i
                      FROM words))
            SELECT gram, count(*) AS n_occurrences
            FROM grams GROUP BY gram
            ORDER BY n_occurrences DESC, gram LIMIT 100
        """,
        "table_profile": """
            SELECT 'doc_id' AS col_name, count(*) AS n_rows,
                   count(*) - count(doc_id) AS n_nulls,
                   count(DISTINCT doc_id) AS n_distinct FROM documents
            UNION ALL
            SELECT 'text', count(*), count(*) - count(text),
                   count(DISTINCT text) FROM documents
            UNION ALL
            SELECT 'lang', count(*), count(*) - count(lang),
                   count(DISTINCT lang) FROM documents
            UNION ALL
            SELECT 'source', count(*), count(*) - count(source),
                   count(DISTINCT source) FROM documents
            UNION ALL
            SELECT 'n_chars', count(*), count(*) - count(n_chars),
                   count(DISTINCT n_chars) FROM documents
        """,
        "mixture_sample": f"""
            SELECT * FROM documents
            WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':7'),
                                       1, 15)) AS BIGINT)
                  < CASE source {_MIXTURE_CASE} ELSE 0 END
        """,
        "target_encoding": """
            WITH u AS (
                SELECT o_orderpriority,
                       CAST(ROUND(o_totalprice * 100) AS BIGINT) AS units
                FROM orders),
            a AS (
                SELECT o_orderpriority, sum(units) AS s, count(*) AS n
                FROM u GROUP BY o_orderpriority),
            p AS (
                SELECT CAST(sum(units) AS DOUBLE) / count(*) AS prior
                FROM u)
            SELECT o_orderpriority, n,
                   ROUND((s + 20.0 * prior) / (n + 20.0) / 100.0, 4) AS te
            FROM a, p
        """,
        "dataset_split": f"""
            SELECT doc_id,
                   CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                                                   || ':3'), 1, 15))
                             AS BIGINT) < {_SPLIT_CUT1} THEN 'train'
                        WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                                                   || ':3'), 1, 15))
                             AS BIGINT) < {_SPLIT_CUT2} THEN 'val'
                        ELSE 'test' END AS split
            FROM documents
        """,
        "quota_sample": """
            WITH h AS (
                SELECT doc_id, source,
                       CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                                                || ':3'), 1, 15)) AS BIGINT)
                           AS hv
                FROM documents)
            SELECT doc_id, source FROM (
                SELECT doc_id, source,
                       row_number() OVER (PARTITION BY source
                                          ORDER BY hv, doc_id) AS rn
                FROM h)
            WHERE rn <= 5
        """,
        "event_value_imputed": """
            WITH b AS (
                SELECT event_id, user_id,
                       CASE WHEN event_id % 7 = 0 THEN NULL
                            ELSE value END AS v
                FROM events),
            m AS (
                SELECT user_id,
                       CAST(sum(CAST(ROUND(v * 100) AS BIGINT)) AS DOUBLE)
                           / count(v) / 100.0 AS mean_v
                FROM b WHERE v IS NOT NULL GROUP BY user_id)
            SELECT event_id, b.user_id,
                   COALESCE(v, mean_v) AS value_imputed
            FROM b LEFT JOIN m ON b.user_id = m.user_id
        """,
        "dict_mentions": r"""
            WITH words AS (
                SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS w
                FROM documents),
            grams AS (
                SELECT w[i] || ' ' || w[i+1] AS gram
                FROM (SELECT w, unnest(generate_series(1, len(w) - 1)) AS i
                      FROM words)),
            dict AS (
                SELECT gram AS mention,
                       row_number() OVER (ORDER BY count(*) DESC, gram) - 1
                           AS entity_id
                FROM grams GROUP BY gram
                ORDER BY count(*) DESC, gram LIMIT 25)
            SELECT d.doc_id, s.i - 1 AS start,
                   s.i - 1 + length(n.mention) AS "end",
                   n.mention, n.entity_id
            -- generate_series only takes constants in this DuckDB build:
            -- 8192 safely exceeds every synthetic document length
            FROM documents d, dict n, generate_series(1, 8192) AS s(i)
            WHERE s.i <= length(d.text)
              AND substring(d.text, s.i, length(n.mention)) = n.mention
              AND (s.i = 1 OR substring(d.text, s.i - 1, 1) = ' ')
              AND (s.i - 1 + length(n.mention) = length(d.text)
                   OR substring(d.text, s.i + length(n.mention), 1) = ' ')
            ORDER BY d.doc_id, start, n.mention
        """,
        "hybrid_search": rf"""
            WITH bm AS ({_bm25_sql(BM25_TERMS, k=25)}),
            bmr AS (SELECT doc_id, row_number() OVER
                        (ORDER BY score DESC, doc_id) AS r FROM bm),
            q AS (SELECT doc_id,
                         len(list_filter(
                             regexp_split_to_array(text, '\s+'),
                             x -> x <> '')) AS n_words
                  FROM documents),
            qtop AS (SELECT doc_id, n_words FROM q
                     ORDER BY n_words DESC, doc_id LIMIT 25),
            qr AS (SELECT doc_id, row_number() OVER
                       (ORDER BY n_words DESC, doc_id) AS r FROM qtop),
            f AS (SELECT COALESCE(bmr.doc_id, qr.doc_id) AS doc_id,
                         COALESCE(1.0 / (60 + bmr.r), 0)
                         + COALESCE(1.0 / (60 + qr.r), 0) AS s
                  FROM bmr FULL OUTER JOIN qr ON bmr.doc_id = qr.doc_id)
            SELECT doc_id, round(s, 6) AS rrf_score FROM f
            ORDER BY rrf_score DESC, doc_id LIMIT 20
        """,
        "nation_revenue_share": """
            WITH j AS (SELECT c.c_nationkey,
                              CAST(round(o.o_totalprice * 100) AS BIGINT)
                                  AS cents
                       FROM orders o JOIN customer c
                         ON o.o_custkey = c.c_custkey),
            n AS (SELECT c_nationkey, CAST(sum(cents) AS BIGINT) AS cents
                  FROM j GROUP BY 1)
            SELECT c_nationkey, CAST(cents AS DOUBLE) / 100.0 AS revenue,
                   round(CAST(cents AS DOUBLE)
                         / CAST((SELECT sum(cents) FROM n) AS DOUBLE), 8)
                       AS share
            FROM n ORDER BY c_nationkey
        """,
        "weekly_revenue_growth": """
            WITH w AS (SELECT strftime(date_trunc('week', o_orderdate),
                                       '%Y-%m-%d') AS week,
                              CAST(round(o_totalprice * 100) AS BIGINT)
                                  AS cents
                       FROM orders),
            a AS (SELECT week, CAST(sum(cents) AS BIGINT) AS cents
                  FROM w GROUP BY 1)
            SELECT week, CAST(cents AS DOUBLE) / 100.0 AS revenue,
                   lag(CAST(cents AS DOUBLE) / 100.0)
                       OVER (ORDER BY week) AS prev_revenue,
                   round((CAST(cents AS DOUBLE) / 100.0
                          - lag(CAST(cents AS DOUBLE) / 100.0)
                                OVER (ORDER BY week))
                         / lag(CAST(cents AS DOUBLE) / 100.0)
                               OVER (ORDER BY week), 6) AS growth_pct
            FROM a ORDER BY week
        """,
        "priority_geo_mean": """
            SELECT o_orderpriority,
                   round(exp(avg(ln(o_totalprice))), 4)
                       AS geo_mean_price
            FROM orders GROUP BY 1 ORDER BY 1
        """,
        "dup_size_histogram": """
            WITH g AS (SELECT md5(text) AS h, count(*) AS cluster_size
                       FROM documents GROUP BY 1)
            SELECT cluster_size, count(*) AS n_clusters
            FROM g GROUP BY 1 ORDER BY 1
        """,
        "lineitem_corr_matrix": """
            SELECT 'l_discount' AS col_a, 'l_extendedprice' AS col_b,
                   round(corr(l_discount, l_extendedprice), 6) AS corr
            FROM lineitem
            UNION ALL
            SELECT 'l_discount', 'l_tax',
                   round(corr(l_discount, l_tax), 6) FROM lineitem
            UNION ALL
            SELECT 'l_extendedprice', 'l_tax',
                   round(corr(l_extendedprice, l_tax), 6) FROM lineitem
            UNION ALL
            SELECT 'l_discount', 'l_quantity',
                   round(corr(l_quantity, l_discount), 6) FROM lineitem
            UNION ALL
            SELECT 'l_extendedprice', 'l_quantity',
                   round(corr(l_quantity, l_extendedprice), 6)
            FROM lineitem
            UNION ALL
            SELECT 'l_quantity', 'l_tax',
                   round(corr(l_quantity, l_tax), 6) FROM lineitem
            ORDER BY col_a, col_b
        """,
        "part_pagerank_weighted": """
            WITH items AS (SELECT DISTINCT l_orderkey AS g,
                                  l_partkey AS it FROM lineitem),
                 edges AS (SELECT x.it AS src, y.it AS dst,
                                  CAST(count(*) AS DOUBLE) AS w
                           FROM items x JOIN items y
                             ON x.g = y.g AND x.it <> y.it
                           GROUP BY 1, 2),
                 nodes AS (SELECT DISTINCT src AS node FROM edges),
                 nn AS (SELECT count(*) AS n FROM nodes),
                 deg AS (SELECT src AS node, sum(w) AS d
                         FROM edges GROUP BY src),
                 r0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS rank
                        FROM nodes),
                 r1 AS (SELECT nodes.node,
                               0.15 / (SELECT n FROM nn)
                               + 0.85 * COALESCE(c.c, 0) AS rank
                        FROM nodes LEFT JOIN (
                            SELECT e.dst AS node,
                                   sum((r0.rank / deg.d) * e.w) AS c
                            FROM edges e
                            JOIN r0 ON e.src = r0.node
                            JOIN deg ON e.src = deg.node
                            GROUP BY e.dst) c USING (node)),
                 r2 AS (SELECT nodes.node,
                               0.15 / (SELECT n FROM nn)
                               + 0.85 * COALESCE(c.c, 0) AS rank
                        FROM nodes LEFT JOIN (
                            SELECT e.dst AS node,
                                   sum((r1.rank / deg.d) * e.w) AS c
                            FROM edges e
                            JOIN r1 ON e.src = r1.node
                            JOIN deg ON e.src = deg.node
                            GROUP BY e.dst) c USING (node)),
                 r3 AS (SELECT nodes.node,
                               0.15 / (SELECT n FROM nn)
                               + 0.85 * COALESCE(c.c, 0) AS rank
                        FROM nodes LEFT JOIN (
                            SELECT e.dst AS node,
                                   sum((r2.rank / deg.d) * e.w) AS c
                            FROM edges e
                            JOIN r2 ON e.src = r2.node
                            JOIN deg ON e.src = deg.node
                            GROUP BY e.dst) c USING (node))
            SELECT node, round(rank, 9) AS rank FROM r3
            ORDER BY rank DESC, node LIMIT 30
        """,
        "user_coverage_spans": """
            WITH iv AS (
                SELECT user_id, epoch_us(ts) AS s,
                       epoch_us(ts)
                       + CAST(ROUND(value * 100) AS BIGINT) * 10000 AS e
                FROM events),
            w AS (SELECT user_id, s, e,
                         max(e) OVER (PARTITION BY user_id
                                      ORDER BY s, e
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING) AS pmax
                  FROM iv),
            fl AS (SELECT *, CASE WHEN pmax IS NULL OR s > pmax
                                  THEN 1 ELSE 0 END AS newisl
                   FROM w),
            isl AS (SELECT *, sum(newisl) OVER (PARTITION BY user_id
                                                ORDER BY s, e
                                                ROWS UNBOUNDED PRECEDING)
                               AS isl_id
                    FROM fl)
            SELECT user_id, min(s) AS start_us, max(e) AS end_us
            FROM isl GROUP BY user_id, isl_id
            ORDER BY user_id, start_us
        """,
        "daily_user_growth": """
            WITH d AS (SELECT DISTINCT strftime(ts, '%Y-%m-%d') AS day,
                                       user_id
                       FROM events),
            f AS (SELECT user_id, min(day) AS first_day FROM d
                  GROUP BY user_id),
            nw AS (SELECT first_day AS day, count(*) AS n_new FROM f
                   GROUP BY 1),
            ac AS (SELECT day, count(*) AS n_active FROM d GROUP BY 1)
            SELECT ac.day, ac.n_active,
                   CAST(COALESCE(nw.n_new, 0) AS BIGINT) AS n_new,
                   CAST(ac.n_active - COALESCE(nw.n_new, 0) AS BIGINT)
                       AS n_returning,
                   CAST(sum(COALESCE(nw.n_new, 0))
                        OVER (ORDER BY ac.day
                              ROWS UNBOUNDED PRECEDING) AS BIGINT)
                       AS cum_users
            FROM ac LEFT JOIN nw ON ac.day = nw.day
            ORDER BY ac.day
        """,
        "dedup_savings": """
            WITH g AS (SELECT md5(text) AS h, min(doc_id) AS rep_id
                       FROM documents GROUP BY 1)
            SELECT d.source, count(*) AS n_docs,
                   CAST(sum(CASE WHEN d.doc_id <> g.rep_id
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
                   CAST(sum(CASE WHEN d.doc_id <> g.rep_id
                            THEN d.n_chars ELSE 0 END) AS BIGINT)
                       AS chars_removed
            FROM documents d JOIN g ON md5(d.text) = g.h
            GROUP BY d.source ORDER BY d.source
        """,
        "customer_global_rank": """
            SELECT c_custkey, c_acctbal,
                   row_number() OVER (ORDER BY c_acctbal DESC, c_custkey)
                       AS rank,
                   round(CAST(row_number() OVER (ORDER BY c_acctbal DESC,
                                                 c_custkey) - 1 AS DOUBLE)
                         / (count(*) OVER () - 1), 8) AS pct
            FROM customer ORDER BY rank
        """,
        "event_debounce": """
            WITH w AS (
                SELECT event_id, user_id, event_type, ts,
                       lag(ts) OVER (PARTITION BY user_id, event_type
                                     ORDER BY ts, event_id) AS prev_ts
                FROM events)
            SELECT event_id, user_id, event_type FROM w
            WHERE prev_ts IS NULL
               OR epoch_us(ts) - epoch_us(prev_ts) >= 600000000
            ORDER BY event_id
        """,
        "token_pmi": r"""
            WITH words AS (
                SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS w
                FROM documents),
            uni AS (SELECT unnest(w) AS gram FROM words),
            u AS (SELECT gram, count(*) AS c FROM uni GROUP BY gram),
            n1 AS (SELECT CAST(sum(c) AS DOUBLE) AS n FROM u),
            grams AS (
                SELECT w[i] AS g1, w[i+1] AS g2,
                       w[i] || ' ' || w[i+1] AS gram
                FROM (SELECT w, unnest(generate_series(1, len(w) - 1)) AS i
                      FROM words)),
            b AS (SELECT gram, min(g1) AS g1, min(g2) AS g2,
                         count(*) AS c12
                  FROM grams GROUP BY gram HAVING count(*) >= 5)
            SELECT b.gram, CAST(b.c12 AS BIGINT) AS n_occurrences,
                   round(ln(CAST(b.c12 AS DOUBLE) * (SELECT n FROM n1)
                            / (CAST(u1.c AS DOUBLE)
                               * CAST(u2.c AS DOUBLE))), 6) AS pmi
            FROM b JOIN u u1 ON u1.gram = b.g1
                   JOIN u u2 ON u2.gram = b.g2
            ORDER BY pmi DESC, b.gram LIMIT 50
        """,
        "centroid_confusion": """
            WITH m AS (
                SELECT label AS cand, s.i AS i,
                       avg(CAST(embedding[s.i] AS DOUBLE)) AS mu
                FROM embeddings, generate_series(1, 64) AS s(i)
                GROUP BY label, s.i),
            d AS (
                SELECT e.vec_id, e.label, m.cand,
                       round(sum((CAST(e.embedding[m.i] AS DOUBLE) - m.mu)
                                 * (CAST(e.embedding[m.i] AS DOUBLE)
                                    - m.mu)), 6) AS dist
                FROM embeddings e, m
                GROUP BY e.vec_id, e.label, m.cand),
            r AS (
                SELECT *, row_number() OVER (PARTITION BY vec_id
                                             ORDER BY dist, cand) AS rn
                FROM d)
            SELECT label, cand AS pred_label, count(*) AS n
            FROM r WHERE rn = 1
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "label_centroids": """
            SELECT label, s.i AS dim_idx,
                   round(avg(CAST(embedding[s.i] AS DOUBLE)), 6)
                       AS mean_val
            FROM embeddings, generate_series(1, 64) AS s(i)
            GROUP BY label, s.i
            ORDER BY label, dim_idx
        """,
        "fuzzy_name_lookup": """
            WITH p AS (SELECT c_custkey AS probe_id,
                              CASE WHEN c_custkey % 3 = 0
                                   THEN substr(c_name, 1,
                                               length(c_name) - 1)
                                   WHEN c_custkey % 3 = 1
                                   THEN substr(c_name, 1,
                                               length(c_name) - 1) || 'X'
                                   ELSE c_name END AS probe_name
                       FROM customer)
            SELECT p.probe_id, c.c_custkey,
                   levenshtein(p.probe_name, c.c_name) AS dist
            FROM p, customer c
            WHERE levenshtein(p.probe_name, c.c_name) <= 1
            ORDER BY p.probe_id, c.c_custkey
        """,
        "budget_select": rf"""
            WITH w AS (
                SELECT doc_id, length(text) AS n_chars,
                       list_filter(regexp_split_to_array(text, '\s+'),
                                   x -> x <> '') AS words
                FROM documents),
            q AS (SELECT doc_id, n_chars,
                         CASE WHEN len(words) = 0 THEN 0.0
                              ELSE len(list_filter(words,
                                   x -> list_contains([{stoplist}],
                                                      lower(x))))
                                   / len(words)
                         END AS stop_ratio
                  FROM w),
            c AS (SELECT doc_id, n_chars,
                         sum(n_chars) OVER (ORDER BY stop_ratio DESC,
                                            doc_id
                                            ROWS UNBOUNDED PRECEDING)
                             AS cum_weight
                  FROM q)
            SELECT doc_id, n_chars, CAST(cum_weight AS BIGINT) AS cum_weight
            FROM c WHERE cum_weight <= 30000 ORDER BY doc_id
        """,
        "quasi_id_audit": """
            WITH b AS (SELECT quantile_disc(c_acctbal,
                           [0.1, 0.2, 0.3, 0.4, 0.5,
                            0.6, 0.7, 0.8, 0.9]) AS bs FROM customer),
            g AS (SELECT c_nationkey, c_mktsegment,
                         CAST(len(list_filter(b.bs, x -> x < c.c_acctbal))
                              + 1 AS BIGINT) AS bal_decile
                  FROM customer c CROSS JOIN b)
            SELECT c_nationkey, c_mktsegment, bal_decile,
                   count(*) AS group_size
            FROM g GROUP BY 1, 2, 3 HAVING count(*) < 5
            ORDER BY 1, 2, 3
        """,
        "mention_contexts": r"""
            WITH words AS (
                SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS w
                FROM documents),
            grams AS (
                SELECT w[i] || ' ' || w[i+1] AS gram
                FROM (SELECT w, unnest(generate_series(1, len(w) - 1)) AS i
                      FROM words)),
            dict AS (
                SELECT gram AS mention,
                       row_number() OVER (ORDER BY count(*) DESC, gram) - 1
                           AS entity_id
                FROM grams GROUP BY gram
                ORDER BY count(*) DESC, gram LIMIT 25)
            SELECT d.doc_id, s.i - 1 AS start,
                   s.i - 1 + length(n.mention) AS "end",
                   n.mention, n.entity_id,
                   substring(d.text,
                             greatest(0, s.i - 1 - 16) + 1,
                             least(length(d.text),
                                   s.i - 1 + length(n.mention) + 16)
                             - greatest(0, s.i - 1 - 16)) AS context
            FROM documents d, dict n, generate_series(1, 8192) AS s(i)
            WHERE s.i <= length(d.text)
              AND substring(d.text, s.i, length(n.mention)) = n.mention
              AND (s.i = 1 OR substring(d.text, s.i - 1, 1) = ' ')
              AND (s.i - 1 + length(n.mention) = length(d.text)
                   OR substring(d.text, s.i + length(n.mention), 1) = ' ')
            ORDER BY d.doc_id, start, n.mention
        """,
        "lang_source_assoc": """
            WITH c AS (SELECT lang, source, count(*) AS observed
                       FROM documents GROUP BY 1, 2),
            ra AS (SELECT lang, sum(observed) AS rt FROM c GROUP BY 1),
            cb AS (SELECT source, sum(observed) AS ct FROM c GROUP BY 1),
            t AS (SELECT CAST(sum(observed) AS DOUBLE) AS n FROM c),
            m AS (SELECT c.lang, c.source, c.observed,
                         CAST(ra.rt AS DOUBLE) * CAST(cb.ct AS DOUBLE)
                             / (SELECT n FROM t) AS e
                  FROM c JOIN ra USING (lang) JOIN cb USING (source))
            SELECT lang, source, observed, round(e, 8) AS expected,
                   round((CAST(observed AS DOUBLE) - e)
                         * (CAST(observed AS DOUBLE) - e) / e, 8)
                       AS chi2_contrib
            FROM m ORDER BY lang, source
        """,
        "value_drift": """
            WITH a AS (SELECT floor(value / 25.0) AS bin, count(*) AS n
                       FROM events WHERE event_id % 2 = 0 GROUP BY 1),
            b AS (SELECT floor(value / 25.0) AS bin, count(*) AS n
                  FROM events WHERE event_id % 2 = 1 GROUP BY 1),
            m AS (SELECT COALESCE(a.bin, b.bin) AS bin,
                         CAST(COALESCE(a.n, 0) AS DOUBLE)
                             / (SELECT sum(n) FROM a) AS pa,
                         CAST(COALESCE(b.n, 0) AS DOUBLE)
                             / (SELECT sum(n) FROM b) AS pb
                  FROM a FULL OUTER JOIN b ON a.bin = b.bin)
            SELECT CAST(bin AS BIGINT) AS bin,
                   round(pa, 8) AS p_ref, round(pb, 8) AS p_cand,
                   round((greatest(pa, 1e-6) - greatest(pb, 1e-6))
                         * ln(greatest(pa, 1e-6) / greatest(pb, 1e-6)), 8)
                       AS psi_contrib
            FROM m ORDER BY bin
        """,
        "trending_events": """
            WITH c AS (
                SELECT strftime(date_trunc('hour', ts),
                                '%Y-%m-%d %H:%M:%S') AS window_start,
                       event_type, count(*) AS n_events
                FROM events GROUP BY 1, 2),
            r AS (
                SELECT *, row_number() OVER (
                           PARTITION BY window_start
                           ORDER BY n_events DESC, event_type) AS rn
                FROM c)
            SELECT window_start, event_type, n_events FROM r
            WHERE rn <= 3
            ORDER BY window_start, n_events DESC, event_type
        """,
        "part_bfs_hops": """
            WITH RECURSIVE
            items AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS it
                      FROM lineitem),
            edges AS (SELECT DISTINCT x.it AS src, y.it AS dst
                      FROM items x JOIN items y
                        ON x.g = y.g AND x.it <> y.it),
            seeds AS (SELECT p_partkey AS node FROM part
                      WHERE p_partkey % 200 = 0),
            r(node, d) AS (
                SELECT node, 0 FROM seeds
                UNION
                SELECT e.dst, r.d + 1
                FROM r JOIN edges e ON e.src = r.node
                WHERE r.d < 3)
            SELECT node, MIN(d) AS hops FROM r GROUP BY node ORDER BY node
        """,
        "name_edit_pairs": """
            SELECT c1.c_custkey AS id_a, c2.c_custkey AS id_b,
                   levenshtein(c1.c_name, c2.c_name) AS dist
            FROM customer c1 JOIN customer c2
              ON c1.c_custkey < c2.c_custkey
            WHERE levenshtein(c1.c_name, c2.c_name) <= 1
        """,
        "customer_golden_record": """
            WITH r AS (
                SELECT o_custkey, o_orderstatus,
                       row_number() OVER (PARTITION BY o_custkey
                                          ORDER BY o_orderdate DESC,
                                                   o_orderkey DESC) AS rn
                FROM orders),
            a AS (
                SELECT o_custkey, max(o_totalprice) AS max_price,
                       min(o_orderdate) AS first_order,
                       count(*) AS n_orders
                FROM orders GROUP BY o_custkey)
            SELECT a.o_custkey, max_price, first_order, n_orders,
                   r.o_orderstatus AS latest_o_orderstatus
            FROM a JOIN r ON a.o_custkey = r.o_custkey AND r.rn = 1
        """,
        "triangle_counts": """
            WITH ev AS (
                SELECT DISTINCT event_type, date_trunc('hour', ts) AS hr,
                       user_id
                FROM events),
            chain AS (
                SELECT user_id AS a,
                       lead(user_id) OVER (PARTITION BY event_type, hr
                                           ORDER BY user_id) AS b
                FROM ev),
            e AS (
                SELECT DISTINCT least(a, b) AS a, greatest(a, b) AS b
                FROM chain WHERE b IS NOT NULL AND a <> b),
            tri AS (
                SELECT e1.a AS x, e1.b AS y, e2.b AS z
                FROM e e1
                JOIN e e2 ON e2.a = e1.b
                JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
            v AS (
                SELECT x AS vertex FROM tri
                UNION ALL SELECT y FROM tri
                UNION ALL SELECT z FROM tri)
            SELECT vertex, count(*) AS n_triangles FROM v GROUP BY vertex
        """,
        "inverted_index": r"""
            WITH w AS (
                SELECT doc_id,
                       unnest(list_distinct(
                           regexp_extract_all(lower(text), '[a-z0-9]+')))
                           AS term
                FROM documents)
            SELECT term, count(*) AS df,
                   list_sort(array_agg(doc_id)) AS postings
            FROM w GROUP BY term HAVING count(*) >= 2
        """,
        "snm_pairs": """
            WITH r AS (SELECT p_partkey AS id, p_name AS nm,
                              row_number() OVER (ORDER BY p_name,
                                                 p_partkey) AS rn
                       FROM part)
            SELECT a.id AS id_a, b.id AS id_b,
                   CAST(b.rn - a.rn AS BIGINT) AS gap
            FROM r a JOIN r b ON b.rn > a.rn AND b.rn - a.rn < 4
        """,
        "name_jw_pairs": """
            WITH r AS (SELECT p_partkey AS id, p_name AS nm,
                              row_number() OVER (ORDER BY p_name,
                                                 p_partkey) AS rn
                       FROM part),
            p AS (SELECT a.id AS id_a, b.id AS id_b,
                         a.nm AS na, b.nm AS nb
                  FROM r a JOIN r b ON b.rn > a.rn AND b.rn - a.rn < 8)
            SELECT id_a, id_b,
                   round(jaro_winkler_similarity(na, nb), 6) AS jw
            FROM p WHERE jaro_winkler_similarity(na, nb) >= 0.85
        """,
        "name_monge_elkan": """
            WITH r AS (SELECT p_partkey AS id, p_name AS nm,
                              row_number() OVER (ORDER BY p_name,
                                                 p_partkey) AS rn
                       FROM part),
            p AS (SELECT a.id AS id_a, b.id AS id_b,
                         a.nm AS na, b.nm AS nb
                  FROM r a JOIN r b ON b.rn > a.rn AND b.rn - a.rn < 8),
            ta AS (SELECT id_a, id_b,
                          unnest(string_split(na, ' ')) AS tok,
                          generate_subscripts(string_split(na, ' '), 1)
                              AS i
                   FROM p),
            tb AS (SELECT id_a, id_b,
                          unnest(string_split(nb, ' ')) AS tok,
                          generate_subscripts(string_split(nb, ' '), 1)
                              AS j
                   FROM p),
            x AS (SELECT ta.id_a, ta.id_b, ta.i, tb.j,
                         jaro_winkler_similarity(ta.tok, tb.tok) AS s
                  FROM ta JOIN tb ON ta.id_a = tb.id_a
                                 AND ta.id_b = tb.id_b),
            mab AS (SELECT id_a, id_b, avg(m) AS sab FROM (
                        SELECT id_a, id_b, i, max(s) AS m
                        FROM x GROUP BY 1, 2, 3) GROUP BY 1, 2),
            mba AS (SELECT id_a, id_b, avg(m) AS sba FROM (
                        SELECT id_a, id_b, j, max(s) AS m
                        FROM x GROUP BY 1, 2, 3) GROUP BY 1, 2)
            SELECT id_a, id_b, round((sab + sba) / 2, 6) AS me
            FROM mab JOIN mba USING (id_a, id_b)
            WHERE (sab + sba) / 2 >= 0.92
        """,
        "name_soundex": """
            WITH b AS (
                SELECT p_partkey,
                       regexp_replace(upper(p_name), '[^A-Z]', '', 'g') AS s
                FROM part),
            t AS (
                SELECT p_partkey, substr(s, 1, 1) AS f,
                       translate(s, 'AEIOUYBFPVCGJKQSXZDTLMNRHW',
                                 '000000111122222222334556') AS tr
                FROM b),
            c AS (
                SELECT p_partkey, f,
                       regexp_replace(regexp_replace(regexp_replace(
                       regexp_replace(regexp_replace(regexp_replace(
                       regexp_replace(tr,
                           '00+', '0', 'g'), '11+', '1', 'g'),
                           '22+', '2', 'g'), '33+', '3', 'g'),
                           '44+', '4', 'g'), '55+', '5', 'g'),
                           '66+', '6', 'g') AS col,
                       translate(f, 'AEIOUYBFPVCGJKQSXZDTLMNRHW',
                                 '000000111122222222334556') AS fd
                FROM t),
            d AS (
                SELECT p_partkey, f,
                       replace(CASE WHEN fd IN ('1','2','3','4','5','6')
                                    THEN substr(col, 2) ELSE col END,
                               '0', '') AS digits
                FROM c)
            SELECT p_partkey,
                   CASE WHEN f = '' THEN ''
                        ELSE rpad(substr(f || digits, 1, 4), 4, '0')
                   END AS soundex
            FROM d
        """,
        "user_freq_cms": """
            WITH ds AS (SELECT unnest(range(4)) AS d),
            h AS (SELECT e.user_id, ds.d,
                         CAST(('0x' || substr(md5(CAST(e.user_id AS VARCHAR)
                                                  || ':' || ds.d), 1, 15))
                              AS BIGINT) % 64 AS idx
                  FROM events e CROSS JOIN ds),
            cells AS (SELECT d, idx, count(*) AS cnt FROM h GROUP BY d, idx),
            probes AS (SELECT DISTINCT user_id FROM events
                       WHERE user_id % 20 = 0),
            ph AS (SELECT p.user_id, ds.d,
                          CAST(('0x' || substr(md5(CAST(p.user_id AS VARCHAR)
                                                   || ':' || ds.d), 1, 15))
                               AS BIGINT) % 64 AS idx
                   FROM probes p CROSS JOIN ds)
            SELECT ph.user_id, CAST(min(c.cnt) AS BIGINT) AS est_count
            FROM ph JOIN cells c ON c.d = ph.d AND c.idx = ph.idx
            GROUP BY ph.user_id
        """,
        "doc_readability": """
            WITH m AS (
                SELECT doc_id,
                       len(regexp_extract_all(lower(text), '[a-z0-9]+'))
                           AS words,
                       greatest(1, len(regexp_extract_all(lower(text),
                                                          '[.!?]+')))
                           AS sentences,
                       len(regexp_extract_all(lower(text), '[aeiouy]+'))
                           AS syllables
                FROM documents)
            SELECT doc_id, CAST(words AS BIGINT) AS words,
                   CAST(sentences AS BIGINT) AS sentences,
                   CAST(syllables AS BIGINT) AS syllables,
                   round(206.835
                         - 1.015 * (CAST(words AS DOUBLE)
                                    / CAST(sentences AS DOUBLE))
                         - 84.6 * (CAST(syllables AS DOUBLE)
                                   / CAST(words AS DOUBLE)), 4) AS flesch
            FROM m WHERE words > 0
        """,
        "supplier_key_skew": """
            WITH c AS (SELECT l_suppkey, CAST(count(*) AS DOUBLE) AS c
                       FROM lineitem GROUP BY l_suppkey),
            a AS (SELECT CAST(count(*) AS BIGINT) AS n_keys,
                         sum(c) AS total, sum(c * c) AS sum2,
                         max(c) AS mx
                  FROM c)
            SELECT CAST(total AS BIGINT) AS n_rows, n_keys,
                   CAST(mx AS BIGINT) AS max_cnt,
                   round(mx / total, 8) AS top_share,
                   round(sqrt(sum2 / n_keys
                              - (total / n_keys) * (total / n_keys))
                         / (total / n_keys), 8) AS cv
            FROM a
        """,
        "doc_jaccard_join": """
            WITH w AS (SELECT DISTINCT doc_id,
                              unnest(list_filter(string_split_regex(
                                  lower(text), '[^a-z0-9]+'),
                                  x -> x <> '')) AS tok
                       FROM documents),
            s AS (SELECT doc_id, count(*) AS n FROM w GROUP BY doc_id),
            i AS (SELECT w1.doc_id AS id_a, w2.doc_id AS id_b,
                         count(*) AS inter
                  FROM w w1 JOIN w w2
                    ON w1.tok = w2.tok AND w1.doc_id < w2.doc_id
                  GROUP BY w1.doc_id, w2.doc_id),
            j AS (SELECT id_a, id_b,
                         CAST(inter AS DOUBLE)
                             / CAST(sa.n + sb.n - inter AS DOUBLE) AS jac
                  FROM i JOIN s sa ON sa.doc_id = id_a
                         JOIN s sb ON sb.doc_id = id_b)
            SELECT id_a, id_b, round(jac, 6) AS jaccard
            FROM j WHERE jac >= 0.95
        """,
        "resumable_export": """
            SELECT lang, CAST(count(*) AS BIGINT) AS n_rows
            FROM documents GROUP BY lang ORDER BY lang
        """,
        "size_shard_plan": """
            SELECT doc_id,
                   CAST(length(text) AS BIGINT) AS nbytes,
                   CAST(floor((sum(length(text)) OVER (ORDER BY doc_id)
                               - length(text)) / 50000) AS BIGINT)
                       AS shard
            FROM documents
        """,
        "dedup_threshold_sweep": """
            WITH w AS (SELECT DISTINCT doc_id,
                              unnest(list_filter(string_split_regex(
                                  lower(text), '[^a-z0-9]+'),
                                  x -> x <> '')) AS tok
                       FROM documents),
            s AS (SELECT doc_id, count(*) AS n FROM w GROUP BY doc_id),
            i AS (SELECT w1.doc_id AS id_a, w2.doc_id AS id_b,
                         count(*) AS inter
                  FROM w w1 JOIN w w2
                    ON w1.tok = w2.tok AND w1.doc_id < w2.doc_id
                  GROUP BY w1.doc_id, w2.doc_id),
            j AS (SELECT id_b,
                         CAST(inter AS DOUBLE)
                             / CAST(sa.n + sb.n - inter AS DOUBLE) AS jac
                  FROM i JOIN s sa ON sa.doc_id = id_a
                         JOIN s sb ON sb.doc_id = id_b),
            m AS (SELECT id_b AS doc_id, max(jac) AS mx
                  FROM j GROUP BY id_b),
            g AS (SELECT unnest([0.98, 0.95, 0.9, 0.85]) AS threshold),
            n AS (SELECT count(*) AS total FROM documents)
            SELECT g.threshold,
                   CAST((SELECT count(*) FROM m
                         WHERE m.mx >= g.threshold) AS BIGINT)
                       AS docs_dropped,
                   CAST(n.total - (SELECT count(*) FROM m
                                   WHERE m.mx >= g.threshold) AS BIGINT)
                       AS docs_kept
            FROM g CROSS JOIN n
            ORDER BY g.threshold DESC
        """,
        "snm_blocking_quality": """
            WITH r AS (SELECT c_custkey AS id, c_name AS nm,
                              row_number() OVER (ORDER BY c_name,
                                                 c_custkey) AS rn
                       FROM customer),
            cand AS (SELECT least(a.id, b.id) AS ia,
                            greatest(a.id, b.id) AS ib
                     FROM r a JOIN r b ON b.rn > a.rn AND b.rn - a.rn < 6),
            t AS (SELECT c1.c_custkey AS ia, c2.c_custkey AS ib
                  FROM customer c1 JOIN customer c2
                    ON c1.c_custkey < c2.c_custkey
                  WHERE levenshtein(c1.c_name, c2.c_name) <= 1),
            s AS (SELECT (SELECT count(*) FROM customer) AS n,
                         (SELECT count(*) FROM cand) AS nc,
                         (SELECT count(*) FROM t) AS nt,
                         (SELECT count(*) FROM
                            (SELECT * FROM cand
                             INTERSECT SELECT * FROM t)) AS ni)
            SELECT CAST(nc AS BIGINT) AS n_candidates,
                   CAST(nt AS BIGINT) AS n_true,
                   CAST(ni AS BIGINT) AS n_matched,
                   round(CAST(ni AS DOUBLE) / CAST(nt AS DOUBLE), 6)
                       AS pairs_completeness,
                   round(1 - CAST(nc AS DOUBLE)
                             / (CAST(n AS DOUBLE)
                                * (CAST(n AS DOUBLE) - 1) / 2), 6)
                       AS reduction_ratio
            FROM s
        """,
        "blocking_bcubed": """
            WITH r AS (SELECT split_part(p_name, ' ', 1) AS cluster,
                              p_name AS gold
                       FROM part),
            cont AS (SELECT cluster, gold, count(*) AS n_cg
                     FROM r GROUP BY cluster, gold),
            nc AS (SELECT cluster, sum(n_cg) AS n_c
                   FROM cont GROUP BY cluster),
            ng AS (SELECT gold, sum(n_cg) AS n_g FROM cont GROUP BY gold),
            s AS (SELECT sum(n_cg * n_cg / CAST(n_c AS DOUBLE)) AS sp,
                         sum(n_cg * n_cg / CAST(n_g AS DOUBLE)) AS sr,
                         sum(n_cg) AS n
                  FROM cont JOIN nc USING (cluster) JOIN ng USING (gold))
            SELECT CAST(n AS BIGINT) AS n_records,
                   round(sp / n, 6) AS b3_precision,
                   round(sr / n, 6) AS b3_recall,
                   round(2 * (sp / n) * (sr / n)
                         / ((sp / n) + (sr / n)), 6) AS b3_f1
            FROM s
        """,
        "purchase_attribution": """
            WITH e AS (SELECT event_id, user_id, ts, event_type
                       FROM events
                       WHERE event_type IN ('click', 'purchase')),
            w AS (SELECT e.*,
                         last_value(CASE WHEN event_type = 'click'
                                         THEN event_id END IGNORE NULLS)
                             OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                            AND 1 PRECEDING) AS tid,
                         last_value(CASE WHEN event_type = 'click'
                                         THEN epoch_us(ts) END
                                    IGNORE NULLS)
                             OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                            AND 1 PRECEDING) AS tus
                  FROM e)
            SELECT event_id AS conversion_id, user_id,
                   CAST(CASE WHEN epoch_us(ts) - tus <= 86400000000
                             THEN tid END AS DOUBLE) AS touch_id,
                   CAST(CASE WHEN epoch_us(ts) - tus <= 86400000000
                             THEN epoch_us(ts) - tus END AS DOUBLE)
                       AS gap_us
            FROM w WHERE event_type = 'purchase'
            ORDER BY conversion_id
        """,
        "user_value_twa": """
            WITH e AS (SELECT user_id, epoch_us(ts) AS us, value,
                              event_id
                       FROM events),
            w AS (SELECT user_id, us, value,
                         lead(us) OVER (PARTITION BY user_id
                                        ORDER BY us, event_id) AS nus
                  FROM e)
            SELECT user_id, count(*) AS n_obs,
                   CAST(max(us) - min(us) AS BIGINT) AS span_us,
                   round(sum(value * CAST(nus - us AS DOUBLE))
                         / CAST(max(us) - min(us) AS DOUBLE), 6) AS twa
            FROM w GROUP BY user_id HAVING count(*) >= 2
            ORDER BY user_id
        """,
        "user_streaks": """
            WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
                       FROM events),
            r AS (SELECT user_id, day,
                         row_number() OVER (PARTITION BY user_id
                                            ORDER BY day) AS rn
                  FROM d),
            i AS (SELECT user_id, count(*) AS len
                  FROM r GROUP BY user_id, day - CAST(rn AS INTEGER))
            SELECT user_id, CAST(sum(len) AS BIGINT) AS n_active_days,
                   CAST(max(len) AS BIGINT) AS longest_streak
            FROM i GROUP BY user_id ORDER BY user_id
        """,
        "boilerplate_stats": r"""
            WITH words AS (
                SELECT doc_id,
                       regexp_extract_all(lower(text), '[a-z0-9]+') AS w
                FROM documents),
            inst AS (
                SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                           AS gram
                FROM (SELECT doc_id, w,
                             unnest(generate_series(1, len(w) - 2)) AS i
                      FROM words)),
            dft AS (SELECT gram, count(DISTINCT doc_id) AS df
                    FROM inst GROUP BY gram),
            tot AS (SELECT doc_id, count(*) AS n_grams
                    FROM inst GROUP BY doc_id),
            boil AS (SELECT i.doc_id, count(*) AS n_boiler
                     FROM inst i JOIN dft USING (gram)
                     WHERE df >= 5 GROUP BY i.doc_id)
            SELECT t.doc_id, t.n_grams,
                   coalesce(b.n_boiler, 0) AS n_boiler,
                   round(coalesce(b.n_boiler, 0)
                         / CAST(t.n_grams AS DOUBLE), 6) AS boiler_ratio
            FROM tot t LEFT JOIN boil b USING (doc_id)
            ORDER BY t.doc_id
        """,
        "doc_containment": r"""
            WITH words AS (
                SELECT doc_id,
                       regexp_extract_all(lower(text), '[a-z0-9]+') AS w
                FROM documents),
            g AS (
                SELECT DISTINCT doc_id,
                       w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS gram
                FROM (SELECT doc_id, w,
                             unnest(generate_series(1, len(w) - 2)) AS i
                      FROM words)),
            q AS (SELECT doc_id AS qid, gram FROM g WHERE doc_id < 5),
            qs AS (SELECT qid, count(*) AS qsize FROM q GROUP BY qid),
            inter AS (SELECT q.qid, g.doc_id, count(*) AS inter
                      FROM q JOIN g USING (gram)
                      WHERE g.doc_id <> q.qid
                      GROUP BY q.qid, g.doc_id),
            sc AS (SELECT qid, doc_id, inter,
                          round(inter / CAST(qsize AS DOUBLE), 6)
                              AS containment,
                          row_number() OVER (PARTITION BY qid
                                             ORDER BY inter DESC, doc_id)
                              AS rn
                   FROM inter JOIN qs USING (qid))
            SELECT qid, doc_id, inter, containment
            FROM sc WHERE rn <= 3 ORDER BY qid, doc_id
        """,
        "part_communities": """
            WITH items AS (SELECT DISTINCT l_orderkey AS g,
                                  l_partkey AS it FROM lineitem),
            edges AS (SELECT DISTINCT x.it AS src, y.it AS dst
                      FROM items x JOIN items y
                        ON x.g = y.g AND x.it <> y.it),
            l0 AS (SELECT DISTINCT src AS node, src AS lab FROM edges),
            c1 AS (SELECT e.dst AS node, l.lab, count(*) AS c
                   FROM edges e JOIN l0 l ON l.node = e.src
                   GROUP BY e.dst, l.lab),
            b1 AS (SELECT node, lab FROM (
                       SELECT node, lab, row_number() OVER (
                           PARTITION BY node ORDER BY c DESC, lab) AS rn
                       FROM c1) WHERE rn = 1),
            l1 AS (SELECT p.node, coalesce(b.lab, p.lab) AS lab
                   FROM l0 p LEFT JOIN b1 b USING (node)),
            c2 AS (SELECT e.dst AS node, l.lab, count(*) AS c
                   FROM edges e JOIN l1 l ON l.node = e.src
                   GROUP BY e.dst, l.lab),
            b2 AS (SELECT node, lab FROM (
                       SELECT node, lab, row_number() OVER (
                           PARTITION BY node ORDER BY c DESC, lab) AS rn
                       FROM c2) WHERE rn = 1),
            l2 AS (SELECT p.node, coalesce(b.lab, p.lab) AS lab
                   FROM l1 p LEFT JOIN b2 b USING (node)),
            c3 AS (SELECT e.dst AS node, l.lab, count(*) AS c
                   FROM edges e JOIN l2 l ON l.node = e.src
                   GROUP BY e.dst, l.lab),
            b3 AS (SELECT node, lab FROM (
                       SELECT node, lab, row_number() OVER (
                           PARTITION BY node ORDER BY c DESC, lab) AS rn
                       FROM c3) WHERE rn = 1),
            l3 AS (SELECT p.node, coalesce(b.lab, p.lab) AS lab
                   FROM l2 p LEFT JOIN b3 b USING (node))
            SELECT node, lab AS label FROM l3 ORDER BY node
        """,
        "part_shortest_paths": """
            WITH RECURSIVE
            items AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS it
                      FROM lineitem),
            edges AS (SELECT x.it AS src, y.it AS dst,
                             count(*) AS w
                      FROM items x JOIN items y
                        ON x.g = y.g AND x.it <> y.it
                      GROUP BY x.it, y.it),
            seeds AS (SELECT p_partkey AS node FROM part
                      WHERE p_partkey % 200 = 0),
            r(node, d, hops) AS (
                SELECT node, CAST(0 AS BIGINT), 0 FROM seeds
                UNION
                SELECT e.dst, r.d + e.w, r.hops + 1
                FROM r JOIN edges e ON e.src = r.node
                WHERE r.hops < 3)
            SELECT node, MIN(d) AS dist FROM r GROUP BY node ORDER BY node
        """,
        "user_value_ewma": """
            WITH r AS (
                SELECT user_id, event_id,
                       CAST(round(value * 100) AS BIGINT) AS cents,
                       row_number() OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS rn
                FROM events)
            SELECT a.user_id, a.event_id,
                   round(sum(b.cents * pow(0.5, a.rn - b.rn))
                         / sum(pow(0.5, a.rn - b.rn)), 6) AS ewma
            FROM r a JOIN r b
              ON a.user_id = b.user_id
             AND b.rn BETWEEN a.rn - 7 AND a.rn
            GROUP BY a.user_id, a.event_id
            ORDER BY a.user_id, a.event_id
        """,
        "value_ks_drift": """
            WITH a AS (SELECT floor(value / 25.0) AS bin, count(*) AS n
                       FROM events WHERE event_id % 2 = 0 GROUP BY 1),
            b AS (SELECT floor(value / 25.0) AS bin, count(*) AS n
                  FROM events WHERE event_id % 2 = 1 GROUP BY 1),
            m AS (SELECT COALESCE(a.bin, b.bin) AS bin,
                         COALESCE(a.n, 0) AS na, COALESCE(b.n, 0) AS nb
                  FROM a FULL OUTER JOIN b ON a.bin = b.bin),
            c AS (SELECT bin,
                         CAST(sum(na) OVER (ORDER BY bin) AS DOUBLE)
                             / (SELECT sum(n) FROM a) AS ca,
                         CAST(sum(nb) OVER (ORDER BY bin) AS DOUBLE)
                             / (SELECT sum(n) FROM b) AS cb
                  FROM m)
            SELECT CAST(bin AS BIGINT) AS bin,
                   round(ca, 8) AS cdf_ref, round(cb, 8) AS cdf_cand,
                   round(abs(ca - cb), 8) AS ks_contrib
            FROM c ORDER BY bin
        """,
        "user_skyline": """
            WITH u AS (
                SELECT user_id,
                       CAST(sum(round(value * 100)) AS BIGINT) AS cents,
                       count(*) AS n
                FROM events GROUP BY user_id)
            SELECT user_id, cents, n FROM u
            WHERE NOT EXISTS (
                SELECT 1 FROM u v
                WHERE v.cents >= u.cents AND v.n >= u.n
                  AND (v.cents > u.cents OR v.n > u.n))
            ORDER BY user_id
        """,
        "part_cosine_sim": """
            WITH cp AS (SELECT DISTINCT o.o_custkey AS cust,
                               l.l_partkey AS item
                        FROM lineitem l JOIN orders o
                          ON l.l_orderkey = o.o_orderkey),
            s AS (SELECT item, count(*) AS sup FROM cp GROUP BY item),
            p AS (SELECT x.item AS a, y.item AS b, count(*) AS c
                  FROM cp x JOIN cp y
                    ON x.cust = y.cust AND x.item < y.item
                  GROUP BY x.item, y.item)
            SELECT a, b, c,
                   round(c / sqrt(sa.sup * sb.sup), 6) AS cosine
            FROM p JOIN s sa ON sa.item = p.a
                   JOIN s sb ON sb.item = p.b
            WHERE c >= 3
            ORDER BY a, b
        """,
        "user_value_gini": """
            WITH r AS (SELECT user_id, value,
                              row_number() OVER (PARTITION BY user_id
                                                 ORDER BY value) AS i
                       FROM events WHERE value IS NOT NULL)
            SELECT user_id, CAST(count(*) AS BIGINT) AS n,
                   round(2.0 * sum(i * value)
                         / (count(*) * sum(value))
                         - (count(*) + 1.0) / count(*), 8) AS gini
            FROM r GROUP BY user_id ORDER BY user_id
        """,
        "token_js_drift": """
            WITH ta AS (SELECT unnest(string_split(text, ' ')) AS tok
                        FROM documents WHERE doc_id % 2 = 0),
            tb AS (SELECT unnest(string_split(text, ' ')) AS tok
                   FROM documents WHERE doc_id % 2 = 1),
            a AS (SELECT tok, count(*) AS n FROM ta
                  WHERE tok <> '' GROUP BY 1),
            b AS (SELECT tok, count(*) AS n FROM tb
                  WHERE tok <> '' GROUP BY 1),
            m AS (SELECT COALESCE(a.tok, b.tok) AS tok,
                         CAST(COALESCE(a.n, 0) AS DOUBLE)
                             / (SELECT sum(n) FROM a) AS p,
                         CAST(COALESCE(b.n, 0) AS DOUBLE)
                             / (SELECT sum(n) FROM b) AS q
                  FROM a FULL OUTER JOIN b ON a.tok = b.tok)
            SELECT tok, round(p, 8) AS p_ref, round(q, 8) AS p_cand,
                   round(0.5 * (CASE WHEN p > 0
                                THEN p * ln(p / ((p + q) / 2.0))
                                ELSE 0 END)
                       + 0.5 * (CASE WHEN q > 0
                                THEN q * ln(q / ((p + q) / 2.0))
                                ELSE 0 END), 8) AS jsd_contrib
            FROM m ORDER BY tok
        """,
        "nb_lang_scores": """
            WITH toks AS (SELECT doc_id,
                                 unnest(string_split(text, ' ')) AS tok
                          FROM documents),
            tk AS (SELECT * FROM toks WHERE tok <> ''),
            cnt AS (SELECT d.lang AS label, t.tok, count(*) AS c
                    FROM tk t JOIN documents d USING (doc_id)
                    GROUP BY 1, 2),
            lab AS (SELECT lang AS label, count(*) AS n_docs
                    FROM documents GROUP BY 1),
            tot AS (SELECT label, sum(c) AS total FROM cnt GROUP BY 1),
            v AS (SELECT count(DISTINCT tok) AS v FROM tk)
            SELECT t.doc_id, l.label,
                   round(ln(CAST(l.n_docs AS DOUBLE)
                            / (SELECT sum(n_docs) FROM lab))
                         + sum(ln((CAST(COALESCE(c.c, 0) AS DOUBLE) + 1.0)
                                  / (CAST(tt.total AS DOUBLE)
                                     + 1.0 * (SELECT v FROM v)))),
                         6) AS log_score
            FROM tk t
            CROSS JOIN lab l
            JOIN tot tt ON tt.label = l.label
            LEFT JOIN cnt c ON c.label = l.label AND c.tok = t.tok
            GROUP BY t.doc_id, l.label, l.n_docs, tt.total
            ORDER BY t.doc_id, l.label
        """,
        "user_value_autocorr": """
            WITH l AS (SELECT user_id, value,
                              lag(value) OVER (PARTITION BY user_id
                                               ORDER BY epoch_us(ts),
                                                        event_id)
                                  AS prev_value
                       FROM events)
            SELECT user_id, round(corr(value, prev_value), 4) AS autocorr
            FROM l WHERE prev_value IS NOT NULL
            GROUP BY user_id ORDER BY user_id
        """,
        "corpus_checksum": """
            SELECT CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(sum(CAST(CAST('0x' || substr(md5(text || ':0'),
                                                     1, 15) AS BIGINT)
                                 AS HUGEINT)) AS VARCHAR) AS checksum
            FROM documents
        """,
        "label_silhouette": """
            WITH m AS (
                SELECT label AS cand, s.i AS i,
                       avg(CAST(embedding[s.i] AS DOUBLE)) AS mu
                FROM embeddings, generate_series(1, 64) AS s(i)
                GROUP BY label, s.i),
            d AS (
                SELECT e.vec_id, e.label, m.cand,
                       sqrt(sum((CAST(e.embedding[m.i] AS DOUBLE) - m.mu)
                                * (CAST(e.embedding[m.i] AS DOUBLE)
                                   - m.mu))) AS dist
                FROM embeddings e, m
                GROUP BY e.vec_id, e.label, m.cand),
            ab AS (
                SELECT vec_id, label,
                       min(CASE WHEN cand = label THEN dist END) AS a,
                       min(CASE WHEN cand <> label THEN dist END) AS b
                FROM d GROUP BY vec_id, label)
            SELECT label, CAST(count(*) AS BIGINT) AS n,
                   round(avg(CASE WHEN greatest(a, b) > 0
                             THEN (b - a) / greatest(a, b)
                             ELSE 0 END), 6) AS silhouette
            FROM ab GROUP BY label ORDER BY label
        """,
        "ivf_recall": f"""
            WITH q AS (SELECT vec_id AS query_id, embedding AS qe
                       FROM embeddings WHERE vec_id < 16),
            s AS (SELECT q.query_id, e.vec_id AS neighbor_id,
                         list_cosine_similarity(q.qe, e.embedding) AS sim
                  FROM q CROSS JOIN embeddings e
                  WHERE e.vec_id <> q.query_id),
            r AS (SELECT query_id, neighbor_id,
                         row_number() OVER (PARTITION BY query_id
                                            ORDER BY sim DESC, neighbor_id)
                             AS rank
                  FROM s),
            ex AS (SELECT query_id, neighbor_id FROM r WHERE rank <= 5),
            ap AS (SELECT query_id, neighbor_id FROM read_parquet(
                       '{_GOLDEN_DIR}/ivf_ann_topk.{_sf_tag}.parquet'))
            SELECT ex.query_id,
                   CAST(count(ap.neighbor_id) AS BIGINT) AS hits,
                   round(count(ap.neighbor_id) / 5.0, 6) AS recall
            FROM ex LEFT JOIN ap USING (query_id, neighbor_id)
            GROUP BY ex.query_id ORDER BY ex.query_id
        """,
        "lang_source_mi": """
            WITH c AS (SELECT lang, source, count(*) AS observed
                       FROM documents GROUP BY 1, 2),
            ra AS (SELECT lang, sum(observed) AS rt FROM c GROUP BY 1),
            cb AS (SELECT source, sum(observed) AS ct FROM c GROUP BY 1),
            t AS (SELECT CAST(sum(observed) AS DOUBLE) AS n FROM c)
            SELECT c.lang, c.source, c.observed,
                   round((CAST(c.observed AS DOUBLE) / (SELECT n FROM t))
                         * ln((CAST(c.observed AS DOUBLE)
                               / (SELECT n FROM t))
                              / ((CAST(ra.rt AS DOUBLE)
                                  / (SELECT n FROM t))
                                 * (CAST(cb.ct AS DOUBLE)
                                    / (SELECT n FROM t)))), 8)
                       AS mi_contrib
            FROM c JOIN ra USING (lang) JOIN cb USING (source)
            ORDER BY lang, source
        """,
        "mixture_plan": """
            WITH c AS (SELECT source, count(*) AS n_rows
                       FROM documents GROUP BY 1),
            m AS (SELECT source, n_rows,
                         CAST(n_rows AS DOUBLE)
                             / sum(n_rows) OVER () AS share,
                         pow(CAST(n_rows AS DOUBLE), 0.5)
                             / sum(pow(CAST(n_rows AS DOUBLE), 0.5))
                                   OVER () AS tgt
                  FROM c)
            SELECT source, n_rows, round(share, 6) AS share,
                   round(tgt, 6) AS target_share,
                   round((tgt / share)
                         / max(tgt / share) OVER (), 6) AS rate
            FROM m ORDER BY source
        """,
        "linkage_negatives": """
            WITH r AS (SELECT c_custkey AS id, c_name AS nm,
                              row_number() OVER (ORDER BY c_name,
                                                 c_custkey) AS rn
                       FROM customer),
            snm AS (SELECT least(a.id, b.id) AS id_a,
                           greatest(a.id, b.id) AS id_b
                    FROM r a JOIN r b ON b.rn > a.rn AND b.rn - a.rn < 4),
            m AS (SELECT c1.c_custkey AS id_a, c2.c_custkey AS id_b
                  FROM customer c1 JOIN customer c2
                    ON c1.c_custkey < c2.c_custkey
                  WHERE levenshtein(c1.c_name, c2.c_name) <= 1)
            SELECT id_a, id_b FROM snm
            EXCEPT
            SELECT id_a, id_b FROM m
            ORDER BY id_a, id_b
        """,
        "vocab_coverage": r"""
            WITH w AS (SELECT unnest(list_filter(
                           regexp_split_to_array(lower(text),
                                                 '[^a-z0-9]+'),
                           x -> x <> '')) AS gram
                       FROM documents),
            c AS (SELECT gram, count(*) AS n FROM w GROUP BY 1),
            r AS (SELECT n, row_number() OVER (ORDER BY n DESC, gram)
                         AS rn
                  FROM c),
            t AS (SELECT CAST(sum(n) AS DOUBLE) AS total FROM c)
            SELECT k AS top_k,
                   CAST(sum(n) FILTER (rn <= k) AS BIGINT)
                       AS covered_occurrences,
                   round(sum(n) FILTER (rn <= k) / (SELECT total FROM t),
                         6) AS coverage
            FROM r CROSS JOIN (SELECT unnest([10, 100, 1000]) AS k)
            GROUP BY k ORDER BY k
        """,
        "negative_pairs": """
            WITH r AS (SELECT doc_id,
                              row_number() OVER (ORDER BY n_chars,
                                                 doc_id) AS rank
                       FROM documents),
            nn AS (SELECT count(*) AS n FROM documents),
            p AS (SELECT doc_id, j,
                         ((rank - 1)
                          + (CAST('0x' || substr(md5(CAST(doc_id
                                  AS VARCHAR) || ':' || j), 1, 15)
                              AS BIGINT) % ((SELECT n FROM nn) - 1))
                          + 1) % (SELECT n FROM nn) + 1 AS prank
                  FROM r CROSS JOIN (SELECT unnest([0, 1]) AS j))
            SELECT p.doc_id, CAST(p.j AS BIGINT) AS j,
                   r2.doc_id AS neg_id
            FROM p JOIN r r2 ON r2.rank = p.prank
            ORDER BY p.doc_id, p.j
        """,
        "source_freshness": """
            WITH per AS (SELECT event_type,
                                CAST(count(*) AS BIGINT) AS n_events,
                                min(epoch_us(ts)) AS first_us,
                                max(epoch_us(ts)) AS last_us
                         FROM events GROUP BY 1)
            SELECT event_type, n_events, first_us, last_us,
                   (max(last_us) OVER () - last_us) // 1000000
                       AS staleness_s
            FROM per ORDER BY event_type
        """,
        "exact_value_quantiles": """
            SELECT 0.5 AS q, quantile_disc(value, 0.5) AS value
            FROM events
            UNION ALL
            SELECT 0.9, quantile_disc(value, 0.9) FROM events
            UNION ALL
            SELECT 0.99, quantile_disc(value, 0.99) FROM events
            ORDER BY q
        """,
        "nation_join_size": """
            WITH a AS (SELECT c_nationkey AS k, count(*) AS na
                       FROM customer GROUP BY 1),
            b AS (SELECT s_nationkey AS k, count(*) AS nb
                  FROM supplier GROUP BY 1),
            ds AS (SELECT unnest(range(4)) AS d),
            ha AS (SELECT ds.d,
                          CAST(('0x' || substr(md5(CAST(c_nationkey
                               AS VARCHAR) || ':' || ds.d), 1, 15))
                               AS BIGINT) % 64 AS idx
                   FROM customer CROSS JOIN ds),
            ca AS (SELECT d, idx, count(*) AS cnt FROM ha GROUP BY 1, 2),
            hb AS (SELECT ds.d,
                          CAST(('0x' || substr(md5(CAST(s_nationkey
                               AS VARCHAR) || ':' || ds.d), 1, 15))
                               AS BIGINT) % 64 AS idx
                   FROM supplier CROSS JOIN ds),
            cb AS (SELECT d, idx, count(*) AS cnt FROM hb GROUP BY 1, 2),
            dots AS (SELECT ca.d, sum(ca.cnt * cb.cnt) AS dot
                     FROM ca JOIN cb ON ca.d = cb.d AND ca.idx = cb.idx
                     GROUP BY ca.d)
            SELECT (SELECT CAST(count(*) AS BIGINT) FROM customer)
                       AS n_left,
                   (SELECT CAST(count(*) AS BIGINT) FROM supplier)
                       AS n_right,
                   (SELECT CAST(sum(a.na * b.nb) AS BIGINT)
                    FROM a JOIN b USING (k)) AS exact_pairs,
                   (SELECT CAST(min(dot) AS BIGINT) FROM dots)
                       AS cms_estimate
        """,
        "brand_weighted_median_price": """
            WITH c AS (SELECT p_brand, p_retailprice AS v,
                              CAST(sum(p_size) AS BIGINT) AS w
                       FROM part GROUP BY 1, 2),
            s AS (SELECT p_brand, v, w,
                         sum(w) OVER (PARTITION BY p_brand ORDER BY v)
                             AS cumw,
                         sum(w) OVER (PARTITION BY p_brand) AS totw
                  FROM c)
            SELECT p_brand, CAST(min(totw) AS BIGINT) AS total_weight,
                   min(v) FILTER (2 * cumw >= totw) AS wmedian
            FROM s GROUP BY p_brand ORDER BY p_brand
        """,
        "lang_id_kappa": f"""
            WITH pred AS ({_lang_id_sql()}),
            j AS (SELECT d.lang, p.lang_pred
                  FROM documents d JOIN pred p USING (doc_id)),
            c AS (SELECT lang, lang_pred, count(*) AS n
                  FROM j GROUP BY 1, 2),
            t AS (SELECT CAST(sum(n) AS BIGINT) AS n FROM c),
            ra AS (SELECT lang AS l, sum(n) AS r FROM c GROUP BY 1),
            ca AS (SELECT lang_pred AS l, sum(n) AS cc FROM c GROUP BY 1),
            po AS (SELECT CAST(COALESCE(sum(n), 0) AS DOUBLE)
                          / (SELECT n FROM t) AS po
                   FROM c WHERE lang = lang_pred),
            pe AS (SELECT CAST(sum(ra.r * ca.cc) AS DOUBLE)
                          / ((SELECT n FROM t) * (SELECT n FROM t)) AS pe
                   FROM ra JOIN ca USING (l))
            SELECT (SELECT n FROM t) AS n,
                   round((SELECT po FROM po), 8) AS po,
                   round((SELECT pe FROM pe), 8) AS pe,
                   round(((SELECT po FROM po) - (SELECT pe FROM pe))
                         / (1 - (SELECT pe FROM pe)), 8) AS kappa
        """,
        "user_gap_stats": """
            WITH l AS (SELECT user_id,
                              epoch_us(ts) AS ts_us,
                              lag(epoch_us(ts)) OVER (
                                  PARTITION BY user_id
                                  ORDER BY epoch_us(ts), event_id)
                                  AS prev_us
                       FROM events),
            g AS (SELECT user_id,
                         (CAST(ts_us AS DOUBLE)
                          - CAST(prev_us AS DOUBLE)) / 1e6 AS gap_s
                  FROM l WHERE prev_us IS NOT NULL),
            m AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n,
                         sum(gap_s) AS sx, sum(gap_s * gap_s) AS sxx
                  FROM g GROUP BY user_id HAVING count(*) >= 2)
            SELECT user_id, n,
                   round(sx / n, 4) AS mean,
                   round(sqrt((sxx - sx * sx / n) / (n - 1)), 4) AS std,
                   round(sqrt((sxx - sx * sx / n) / (n - 1))
                         / (sx / n), 4) AS cv
            FROM m ORDER BY user_id
        """,
        "multipass_snm_pairs": """
            WITH r1 AS (SELECT c_custkey AS id,
                               row_number() OVER (ORDER BY c_name,
                                                  c_custkey) AS rn
                        FROM customer),
            r2 AS (SELECT c_custkey AS id,
                          row_number() OVER (ORDER BY reverse(c_name),
                                             c_custkey) AS rn
                   FROM customer),
            p1 AS (SELECT least(a.id, b.id) AS id_a,
                          greatest(a.id, b.id) AS id_b
                   FROM r1 a JOIN r1 b
                     ON b.rn > a.rn AND b.rn - a.rn < 4),
            p2 AS (SELECT least(a.id, b.id) AS id_a,
                          greatest(a.id, b.id) AS id_b
                   FROM r2 a JOIN r2 b
                     ON b.rn > a.rn AND b.rn - a.rn < 4)
            SELECT id_a, id_b FROM p1
            UNION
            SELECT id_a, id_b FROM p2
            ORDER BY id_a, id_b
        """,
        "customer_conflicts": """
            SELECT o_custkey,
                   CAST(count(DISTINCT o_orderstatus) AS BIGINT)
                       AS n_statuses,
                   CAST(count(DISTINCT o_orderpriority) AS BIGINT)
                       AS n_priorities,
                   (count(DISTINCT o_orderstatus) > 1
                    OR count(DISTINCT o_orderpriority) > 1)
                       AS has_conflict
            FROM orders GROUP BY o_custkey ORDER BY o_custkey
        """,
        "doc_tfidf_cosine": r"""
            WITH tok AS (SELECT doc_id,
                                unnest(list_filter(
                                    regexp_split_to_array(lower(text),
                                                          '[^a-z0-9]+'),
                                    x -> x <> '')) AS token
                         FROM documents),
            tf AS (SELECT doc_id, token, count(*) AS tf
                   FROM tok GROUP BY 1, 2),
            dfq AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
            nd AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
            w AS (SELECT tf.doc_id, tf.token,
                         tf * (ln((1.0 + (SELECT n FROM nd))
                                  / (1.0 + df)) + 1.0) AS w
                  FROM tf JOIN dfq USING (token)
                  -- fractional cut mirroring the engine: df <=
                  -- max(int(0.1 * n_docs), 2) at ANY scale factor
                  WHERE df <= greatest(
                      floor(0.1 * (SELECT n FROM nd)), 2)),
            nrm AS (SELECT doc_id, sum(w * w) AS n2 FROM w GROUP BY 1),
            dot AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                           sum(a.w * b.w) AS dot
                    FROM w a JOIN w b
                      ON a.token = b.token AND a.doc_id < b.doc_id
                    GROUP BY 1, 2)
            SELECT id_a, id_b,
                   round(dot / sqrt(na.n2 * nb.n2), 6) AS cosine
            FROM dot JOIN nrm na ON na.doc_id = dot.id_a
                     JOIN nrm nb ON nb.doc_id = dot.id_b
            WHERE round(dot / sqrt(na.n2 * nb.n2), 6) >= 0.5
            ORDER BY id_a, id_b
        """,
        "fk_integrity": """
            SELECT 'lineitem->orders' AS relation,
                   (SELECT CAST(count(*) AS BIGINT) FROM lineitem)
                       AS n_child_rows,
                   (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
                    WHERE NOT EXISTS (SELECT 1 FROM orders o
                                      WHERE o.o_orderkey = l.l_orderkey))
                       AS n_orphans
            UNION ALL
            SELECT 'orders->customer',
                   (SELECT CAST(count(*) AS BIGINT) FROM orders),
                   (SELECT CAST(count(*) AS BIGINT) FROM orders o
                    WHERE NOT EXISTS (SELECT 1 FROM customer c
                                      WHERE c.c_custkey = o.o_custkey))
            ORDER BY relation
        """,
        "user_rfm": """
            WITH u AS (SELECT user_id,
                              max(epoch_us(ts)) AS last_us,
                              CAST(count(*) AS BIGINT) AS n_events,
                              CAST(sum(CAST(round(value * 100) AS BIGINT))
                                   AS BIGINT) AS sum_cents
                       FROM events GROUP BY 1),
            br AS (SELECT quantile_disc(last_us,
                              [0.2, 0.4, 0.6, 0.8]) AS bs FROM u),
            bf AS (SELECT quantile_disc(n_events,
                              [0.2, 0.4, 0.6, 0.8]) AS bs FROM u),
            bm AS (SELECT quantile_disc(sum_cents,
                              [0.2, 0.4, 0.6, 0.8]) AS bs FROM u)
            SELECT u.user_id, u.last_us, u.n_events, u.sum_cents,
                   CAST(len(list_filter(br.bs, x -> x < u.last_us)) + 1
                        AS INT) AS r_score,
                   CAST(len(list_filter(bf.bs, x -> x < u.n_events)) + 1
                        AS INT) AS f_score,
                   CAST(len(list_filter(bm.bs, x -> x < u.sum_cents)) + 1
                        AS INT) AS m_score
            FROM u CROSS JOIN br CROSS JOIN bf CROSS JOIN bm
            ORDER BY user_id
        """,
        "ab_test_report": """
            WITH c AS (SELECT event_type, user_id % 2 AS grp,
                              CAST(count(*) AS BIGINT) AS n,
                              CAST(sum(CASE WHEN value > 100.0
                                       THEN 1 ELSE 0 END) AS BIGINT)
                                  AS hits
                       FROM events GROUP BY 1, 2),
            m AS (SELECT a.event_type,
                         a.n AS n_a, b.n AS n_b,
                         CAST(a.hits AS DOUBLE) / a.n AS pa,
                         CAST(b.hits AS DOUBLE) / b.n AS pb,
                         CAST(a.hits + b.hits AS DOUBLE)
                             / (a.n + b.n) AS pool
                  FROM c a JOIN c b ON a.event_type = b.event_type
                  WHERE a.grp = 0 AND b.grp = 1)
            SELECT event_type, n_a, n_b,
                   round(pa, 6) AS p_a, round(pb, 6) AS p_b,
                   round((pa - pb) / sqrt(pool * (1 - pool)
                         * (1.0 / n_a + 1.0 / n_b)), 6) AS z
            FROM m ORDER BY event_type
        """,
        "lang_id_accuracy": f"""
            WITH pred AS ({_lang_id_sql()})
            SELECT d.source, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CASE WHEN d.lang = p.lang_pred
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
                   round(CAST(sum(CASE WHEN d.lang = p.lang_pred
                              THEN 1 ELSE 0 END) AS DOUBLE)
                         / count(*), 6) AS accuracy
            FROM documents d JOIN pred p USING (doc_id)
            GROUP BY d.source ORDER BY d.source
        """,
        "embedding_quantization": """
            WITH m AS (SELECT s.i AS i,
                              min(CAST(embedding[s.i] AS DOUBLE)) AS lo,
                              max(CAST(embedding[s.i] AS DOUBLE)) AS hi
                       FROM embeddings, generate_series(1, 64) AS s(i)
                       GROUP BY 1)
            SELECT e.vec_id, m.i AS dim_idx,
                   CAST(CASE WHEN m.hi = m.lo THEN 0
                        ELSE round((CAST(e.embedding[m.i] AS DOUBLE)
                                    - m.lo) * 255.0 / (m.hi - m.lo))
                             - 128 END AS BIGINT) AS code
            FROM embeddings e, m
            ORDER BY e.vec_id, m.i
        """,
        "region_year_sales": """
            SELECT r.r_name, strftime(o.o_orderdate, '%Y') AS year,
                   CAST(count(*) AS BIGINT) AS n_items,
                   CAST(sum(CAST(round(l.l_extendedprice * 100)
                                 AS BIGINT)
                            * (100 - CAST(round(l.l_discount * 100)
                                          AS BIGINT)))
                        AS BIGINT) AS rev_units
            FROM lineitem l
            JOIN orders o ON o.o_orderkey = l.l_orderkey
            JOIN customer c ON c.c_custkey = o.o_custkey
            JOIN nation n ON n.n_nationkey = c.c_nationkey
            JOIN region r ON r.r_regionkey = n.n_regionkey
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "golden_records": """
            WITH pr AS (
              SELECT o_custkey, o_orderpriority AS v, count(*) AS c
              FROM orders GROUP BY 1, 2
            ), prm AS (
              SELECT o_custkey, v FROM (
                SELECT o_custkey, v, ROW_NUMBER() OVER (
                  PARTITION BY o_custkey ORDER BY c DESC, v ASC) AS rn
                FROM pr) WHERE rn = 1
            ), st AS (
              SELECT o_custkey, o_orderstatus AS v, count(*) AS c
              FROM orders GROUP BY 1, 2
            ), stm AS (
              SELECT o_custkey, v FROM (
                SELECT o_custkey, v, ROW_NUMBER() OVER (
                  PARTITION BY o_custkey ORDER BY c DESC, v ASC) AS rn
                FROM st) WHERE rn = 1
            ), ex AS (
              SELECT o_custkey, max(o_totalprice) AS o_totalprice,
                     max(o_orderdate) AS o_orderdate
              FROM orders GROUP BY 1
            )
            SELECT ex.o_custkey, prm.v AS o_orderpriority,
                   stm.v AS o_orderstatus, ex.o_totalprice, ex.o_orderdate
            FROM ex JOIN prm USING (o_custkey) JOIN stm USING (o_custkey)
            ORDER BY ex.o_custkey
        """,
        "clustering_diff": """
            WITH t AS (
              SELECT text AS a, substr(text, 1, 40) AS b FROM documents
            ), cells AS (
              SELECT a, b, count(*) * 1.0 AS n FROM t GROUP BY 1, 2
            ), ma AS (
              SELECT a, sum(n) AS na, count(*) AS dega FROM cells GROUP BY 1
            ), mb AS (
              SELECT b, sum(n) AS nb, count(*) AS degb FROM cells GROUP BY 1
            ), s AS (
              SELECT (SELECT sum(n) FROM cells) AS n_rows,
                     (SELECT sum(n * (n - 1) / 2.0) FROM cells) AS pab,
                     (SELECT sum(na * (na - 1) / 2.0) FROM ma) AS pa,
                     (SELECT count(*) FROM ma) AS nca,
                     (SELECT count(*) FROM ma WHERE dega > 1) AS splits,
                     (SELECT sum(nb * (nb - 1) / 2.0) FROM mb) AS pb,
                     (SELECT count(*) FROM mb) AS ncb,
                     (SELECT count(*) FROM mb WHERE degb > 1) AS merges
            )
            SELECT CAST(n_rows AS BIGINT) AS n_rows,
                   CAST(nca AS BIGINT) AS n_clusters_a,
                   CAST(ncb AS BIGINT) AS n_clusters_b,
                   CAST(splits AS BIGINT) AS split_clusters,
                   CAST(merges AS BIGINT) AS merge_clusters,
                   round((pab - pa * pb / (n_rows * (n_rows - 1) / 2.0))
                         / ((pa + pb) / 2.0
                            - pa * pb / (n_rows * (n_rows - 1) / 2.0)),
                         6) AS ari
            FROM s
        """,
        "cluster_quality": """
            WITH base AS (
              SELECT n_chars // 100 AS p, lang AS g FROM documents
            ), cells AS (
              SELECT p, g, count(*) AS n FROM base GROUP BY 1, 2
            ), np AS (
              SELECT p, sum(n) AS np FROM cells GROUP BY 1
            ), ng AS (
              SELECT g, sum(n) AS ng FROM cells GROUP BY 1
            ), tot AS (
              SELECT CAST(sum(n) AS BIGINT) AS n_rows,
                     sum(n * (n - 1) / 2.0) AS tp
              FROM cells
            ), pp AS (
              SELECT sum(np * (np - 1) / 2.0) AS pp FROM np
            ), gp AS (
              SELECT sum(ng * (ng - 1) / 2.0) AS gp FROM ng
            ), bc AS (
              SELECT sum(cells.n * cells.n * 1.0 / np.np) AS bp,
                     sum(cells.n * cells.n * 1.0 / ng.ng) AS br
              FROM cells JOIN np USING (p) JOIN ng USING (g)
            )
            SELECT tot.n_rows,
                   round(tp / pp, 6) AS pair_precision,
                   round(tp / gp, 6) AS pair_recall,
                   round(2 * (tp / pp) * (tp / gp)
                         / ((tp / pp) + (tp / gp)), 6) AS pair_f1,
                   round(bp / tot.n_rows, 6) AS bcubed_precision,
                   round(br / tot.n_rows, 6) AS bcubed_recall,
                   round(2 * (bp / tot.n_rows) * (br / tot.n_rows)
                         / ((bp / tot.n_rows) + (br / tot.n_rows)), 6)
                       AS bcubed_f1
            FROM tot, pp, gp, bc
        """,
        "waterfall_match": """
            WITH r1 AS (
              SELECT s_nationkey AS k1,
                     CAST(floor(s_acctbal / 1000.0) AS BIGINT) AS k2,
                     min(s_suppkey) AS m
              FROM supplier GROUP BY 1, 2
            ), r2 AS (
              SELECT s_nationkey AS k1, min(s_suppkey) AS m
              FROM supplier GROUP BY 1
            )
            SELECT c_custkey,
                   COALESCE(r1.m, r2.m) AS match_id,
                   CASE WHEN r1.m IS NOT NULL THEN 1
                        WHEN r2.m IS NOT NULL THEN 2 END AS match_level
            FROM customer
            LEFT JOIN r1 ON r1.k1 = c_nationkey
                        AND r1.k2 = CAST(floor(c_acctbal / 1000.0) AS BIGINT)
            LEFT JOIN r2 ON r2.k1 = c_nationkey
            ORDER BY c_custkey
        """,
        "id_crosswalk": """
            WITH ac AS (
              SELECT DISTINCT l.l_partkey, s.s_nationkey
              FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
            )
            SELECT l_partkey,
                   CAST(count(*) AS BIGINT) AS n_nations,
                   min(s_nationkey) AS rep_nation,
                   count(*) > 1 AS ambiguous
            FROM ac GROUP BY 1 ORDER BY 1
        """,
        "score_calibration": """
            WITH base AS (
              SELECT least(greatest(value / 200.0, 0.0), 1.0) AS s,
                     CASE WHEN event_type IN ('purchase', 'click')
                          THEN 1 ELSE 0 END AS y
              FROM events
            ), binned AS (
              SELECT least(greatest(
                       CAST(floor(s / 0.1) AS BIGINT), 0), 9) AS bin,
                     s, y
              FROM base
            ), cells AS (
              SELECT bin, CAST(count(*) AS BIGINT) AS n,
                     avg(s) AS conf, avg(y) AS rate
              FROM binned GROUP BY 1
            )
            SELECT bin, n,
                   round(conf, 6) AS mean_score,
                   round(rate, 6) AS event_rate,
                   round(abs(rate - conf), 6) AS abs_gap,
                   round(sum(n * abs(rate - conf)) OVER ()
                         / sum(n) OVER (), 6) AS ece
            FROM cells ORDER BY bin
        """,
        "source_accuracy": """
            WITH base AS (
              SELECT n_chars // 100 AS cl, lang, source FROM documents
            ), cnt AS (
              SELECT cl, lang, count(*) AS c FROM base GROUP BY 1, 2
            ), maj AS (
              SELECT cl, lang AS maj FROM (
                SELECT cl, lang, ROW_NUMBER() OVER (
                  PARTITION BY cl ORDER BY c DESC, lang ASC) AS rn
                FROM cnt) WHERE rn = 1
            )
            SELECT b.source,
                   CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(sum(CASE WHEN b.lang = m.maj THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_agree,
                   round(sum(CASE WHEN b.lang = m.maj THEN 1 ELSE 0 END)
                         * 1.0 / count(*), 6) AS accuracy
            FROM base b JOIN maj m USING (cl)
            GROUP BY 1 ORDER BY 1
        """,
        "cannot_link_audit": """
            WITH asg AS (
              SELECT doc_id, n_chars // 100 AS cluster FROM documents
            ), pairs AS (
              SELECT doc_id AS id_a, doc_id + 1 AS id_b
              FROM documents WHERE doc_id % 3 = 0
            )
            SELECT a.cluster,
                   CAST(count(*) AS BIGINT) AS violations
            FROM pairs p
            JOIN asg a ON a.doc_id = p.id_a
            JOIN asg b ON b.doc_id = p.id_b
            WHERE a.cluster = b.cluster
            GROUP BY 1 ORDER BY 1
        """,
        "substring_dup_stats": """
            WITH toks AS (
              SELECT doc_id, string_split(text, ' ') AS ts FROM documents
            ), grams AS (
              SELECT doc_id, array_to_string(ts[i:i+7], ' ') AS gram
              FROM toks, LATERAL (
                SELECT unnest(range(1, len(ts) - 6)) AS i) r
              WHERE len(ts) >= 8
            ), gc AS (
              SELECT gram, count(*) AS total FROM grams GROUP BY 1
            )
            SELECT g.doc_id,
                   CAST(count(*) FILTER (WHERE gc.total >= 2) AS BIGINT)
                       AS dup_grams,
                   CAST(count(*) AS BIGINT) AS total_grams,
                   round(count(*) FILTER (WHERE gc.total >= 2) * 1.0
                         / count(*), 6) AS dup_frac
            FROM grams g JOIN gc USING (gram)
            GROUP BY 1 ORDER BY 1
        """,
        # pinned goldens (non-SQL-expressible compositions): computed by
        # the independent single-process oracle in tools/make_goldens.py
        # over the driver's fixed sf0.01 inputs / seeded fixture
        # compaction is behavior-preserving, so compacted_neardup is
        # held to incremental_neardup's golden — identical survivors
        "compacted_neardup": ("SELECT * FROM read_parquet("
                              f"'{_GOLDEN_DIR}/incremental_neardup"
                              f".{_sf_tag}.parquet')"),
        # incremental attach must reproduce the batch resolution: held
        # to er_clusters' golden (the fixture's analytic gold)
        "er_increment": ("SELECT * FROM read_parquet("
                         f"'{_GOLDEN_DIR}/er_clusters.{_sf_tag}.parquet')"),
        **{name: f"SELECT * FROM read_parquet('{_GOLDEN_DIR}/{name}.{_sf_tag}.parquet')"
           for name in ("pca_projection", "pca_variance",
                        "incremental_neardup",
                        "er_clusters", "minhash_dedup_docs",
                        "simhash_dedup_docs", "doc_fingerprints",
                        "lsh_neardup", "lsh_ann_topk", "ivf_ann_topk",
                        "multimodal_features", "text_embeddings",
                        "upsample_exact", "bm25_rerank", "semantic_dedup",
                        "bpe_merges", "bpe_tokens", "pq_ann_topk",
                        "part_k_core", "part_components",
                        "jl_projection", "fs_linkage_weights",
                        "name_one2one_match", "kmeans_clusters",
                        "kcenter_sample", "pprl_links",
                        "canopy_blocks", "corr_clusters",
                        "progressive_er_curve", "fs_pattern_posteriors",
                        "blocking_ablation")},
    }
    # the shuffle-path contamination op is held to the IDENTICAL SQL
    # text as the broadcast path — same contract, different engine path
    sqls["cross_corpus_contamination"] = sqls["contamination_flags"]
    return sqls
