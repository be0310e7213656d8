"""Uniform drop-with-reason accounting (SURVEY §4 "drop-with-counter").

The reference counts every QAQC mutation/drop per split and persists
``qaqc_stats.json`` next to the corpus
(/root/reference/belb/corpora/corpus.py:655-661; counter updates e.g.
corpus.py:197,215-217) — counter drift is its de-facto regression signal
(SURVEY §5.4). Ray form: a shared counter ACTOR (raw ``@ray.remote`` —
the one state shape ``Dataset`` ops can't express) receives
(stage, reason, n_dropped) increments from ``counted_filter`` batches;
``write_qaqc_manifest`` persists the counters and asserts conservation:
rows_in == rows_out + Σ dropped.

Traffic is one tiny actor call per batch that DROPPED anything — no
backpressure on the data path at any scale.
"""

from __future__ import annotations

import json
import os
from typing import Callable

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd


@ray.remote(num_cpus=0)
class QaqcStats:
    """Shared (stage, reason) → dropped-row counters."""

    def __init__(self):
        self.counts: dict[str, int] = {}

    def add(self, stage: str, reason: str, n: int) -> None:
        key = f"{stage}/{reason}"
        self.counts[key] = self.counts.get(key, 0) + int(n)

    def snapshot(self) -> dict[str, int]:
        return dict(self.counts)


def new_stats() -> "ray.actor.ActorHandle":
    return QaqcStats.remote()


def counted_filter(
    ds: rd.Dataset,
    keep: Callable[[pa.Table], np.ndarray],
    stage: str,
    reason: str,
    stats: "ray.actor.ActorHandle",
) -> rd.Dataset:
    """``ds.filter`` that accounts for every dropped row: ``keep(batch)``
    returns a bool mask; dropped counts stream to the stats actor."""

    def _f(batch: pa.Table) -> pa.Table:
        mask = np.asarray(keep(batch), dtype=bool)
        n_drop = int(batch.num_rows - mask.sum())
        if n_drop:
            # blocking: guarantees the increment landed before this task
            # reports done, so a snapshot after the pipeline completes can
            # never undercount (one actor RTT per DROPPING batch only)
            ray.get(stats.add.remote(stage, reason, n_drop))
        return batch.filter(pa.array(mask))

    return ds.map_batches(_f, batch_format="pyarrow")


def stats_snapshot(stats: "ray.actor.ActorHandle") -> dict[str, int]:
    return ray.get(stats.snapshot.remote())


def write_qaqc_manifest(
    stats: "ray.actor.ActorHandle",
    path: str,
    rows_in: int,
    rows_out: int,
) -> dict:
    """Persist ``qaqc_stats.json`` (reference corpus.py:655-661) and
    ASSERT conservation: rows_in == rows_out + Σ dropped. Raises
    ``ValueError`` on leak — a row that vanished without a reason is a
    bug, not a statistic."""
    counts = stats_snapshot(stats)
    dropped = sum(counts.values())
    manifest = {"rows_in": rows_in, "rows_out": rows_out,
                "dropped": counts, "dropped_total": dropped}
    if rows_in != rows_out + dropped:
        raise ValueError(
            f"row-conservation violation: rows_in={rows_in} != "
            f"rows_out={rows_out} + dropped={dropped} "
            f"(leak of {rows_in - rows_out - dropped})")
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest


def safe_apply(
    ds: rd.Dataset,
    row_fn: Callable[[dict], dict],
    out_schema: dict[str, "pa.DataType"],
    stage: str = "safe_apply",
    stats: "ray.actor.ActorHandle | None" = None,
) -> rd.Dataset:
    """Per-record error containment — the reference's
    ``BaseTransformation.safe_apply`` (belb/preprocessing/
    transform.py:59-74): ``row_fn(row_dict) -> out_dict`` runs per
    record; an exception QUARANTINES that record (``ok=False``,
    ``error='<ExcType>: <msg>'``, output columns null) instead of
    killing the task, and the pipeline keeps streaming. Successes carry
    ``ok=True`` and their outputs. Row conservation holds by
    construction: rows_out == rows_in, every failure visible and
    countable (per-exception-type counts stream to the QaqcStats actor
    when given).

    This wrapper is for FALLIBLE, inherently row-wise parser steps —
    the one place a per-row Python loop is the semantics, not a
    performance bug. Vectorized stages should use ``counted_filter`` /
    plain ``map_batches`` instead."""
    out_names = list(out_schema)

    def _f(batch: pa.Table) -> pa.Table:
        rows = batch.to_pylist()
        ok = np.zeros(len(rows), dtype=bool)
        errs: list = [None] * len(rows)
        outs: dict[str, list] = {n: [None] * len(rows) for n in out_names}
        fail_counts: dict[str, int] = {}
        for i, row in enumerate(rows):
            try:
                res = row_fn(row)
            except Exception as e:  # noqa: BLE001 — containment IS the op
                errs[i] = f"{type(e).__name__}: {e}"
                fail_counts[type(e).__name__] = \
                    fail_counts.get(type(e).__name__, 0) + 1
                continue
            ok[i] = True
            for n in out_names:
                outs[n][i] = res.get(n)
        if stats is not None and fail_counts:
            for exc, n in fail_counts.items():
                ray.get(stats.add.remote(stage, exc, n))
        cols = {name: batch[name] for name in batch.column_names}
        cols["ok"] = pa.array(ok)
        cols["error"] = pa.array(errs, pa.string())
        for n in out_names:
            cols[n] = pa.array(outs[n], out_schema[n])
        return pa.table(cols)

    return ds.map_batches(_f, batch_format="pyarrow")
