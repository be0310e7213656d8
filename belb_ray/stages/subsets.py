"""Evaluation-subset slicing (SURVEY §2.6 A11).

The reference labels test mentions as *zeroshot* (identifier never seen
in train∪dev) or *stratified* (identifier seen, surface form unseen) and
pins them as evaluation subsets
(belb/scripts/get_mentions_subsets.py:82-140, belb/metadata/zeroshot.csv).

Ray form: the train vocabulary (distinct identifiers; distinct
(identifier, surface) pairs) is collected once — it is a vocabulary, not
the corpus — and broadcast; test rows classify vectorized per batch.
Past ``broadcast_threshold`` distinct train keys the op switches to
hash-partitioned semi-joins (same results, two shuffles)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd


def evaluation_subsets(
    anns: rd.Dataset,
    split_col: str = "split",
    id_col: str = "identifier",
    surface_col: str = "surface",
    train_splits: tuple = ("train", "dev"),
    test_split: str = "test",
    broadcast_threshold: int = 5_000_000,
) -> rd.Dataset:
    """→ test rows + ``subset`` ∈ {zeroshot, stratified, seen}:
    zeroshot = identifier absent from train∪dev; stratified = identifier
    present but (identifier, surface) pair absent; seen = both present."""

    train_expr = " or ".join(f"{split_col} == {s!r}" for s in train_splits)
    train = anns.filter(expr=train_expr)
    test = anns.filter(expr=f"{split_col} == {test_split!r}")

    train_pairs = train.map_batches(
        lambda t: pa.table({id_col: t[id_col], surface_col: t[surface_col]}),
        batch_format="pyarrow")

    from .joins import collect_arrow

    n_train = train_pairs.count()
    if n_train > broadcast_threshold:
        return _subsets_shuffle(test, train_pairs, id_col, surface_col)

    tbl = collect_arrow(train_pairs)
    ids = set(tbl[id_col].to_pylist())
    pairs = set(zip(tbl[id_col].to_pylist(), tbl[surface_col].to_pylist()))
    ref = ray.put((ids, pairs))

    from ..util import cached_get

    def _classify(batch: pa.Table) -> pa.Table:
        ids_set, pair_set = cached_get(ref)
        bi = batch[id_col].to_pylist()
        bs = batch[surface_col].to_pylist()
        subset = [
            "seen" if (i, s) in pair_set
            else ("stratified" if i in ids_set else "zeroshot")
            for i, s in zip(bi, bs)
        ]
        return batch.append_column("subset", pa.array(subset, pa.string()))

    return test.map_batches(_classify, batch_format="pyarrow")


def _subsets_shuffle(test: rd.Dataset, train_pairs: rd.Dataset,
                     id_col: str, surface_col: str,
                     num_buckets: int = 0) -> rd.Dataset:
    """Shuffle fallback: classify via two bucketed membership checks on
    hash(id) — all rows of an id land in one bucket, the check is
    vectorized pandas per bucket."""

    def _tag(side: int):
        def _f(t: pa.Table) -> pa.Table:
            cols = {c: t[c] for c in t.column_names}
            cols["__side"] = pa.array(np.full(t.num_rows, side, np.int8))
            return pa.table(cols)

        return _f

    both = (train_pairs.map_batches(_tag(1), batch_format="pyarrow")
            .union(test.map_batches(_tag(0), batch_format="pyarrow")))

    def _bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_array(batch[id_col].to_numpy(), categorize=False)
        batch["__bucket"] = (h % np.uint64(num_buckets)).astype(np.int32)
        return batch

    def _classify(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop(columns="__bucket")
        tr = g[g["__side"] == 1]
        te = g[g["__side"] == 0].drop(columns="__side")
        ids = set(tr[id_col])
        pairs = set(zip(tr[id_col], tr[surface_col]))
        te = te.copy()
        te["subset"] = [
            "seen" if (i, s) in pairs
            else ("stratified" if i in ids else "zeroshot")
            for i, s in zip(te[id_col], te[surface_col])
        ]
        return te

    bucketed = both.map_batches(_bucketize, batch_format="pandas",
                                batch_size=1 << 17)
    return bucketed.groupby("__bucket").map_groups(_classify,
                                                   batch_format="pandas")
