"""Synset / homonym aggregations over a KB-shaped synonyms table
(uid, identifier, name, description, foreign_identifier).

Direct Ray-Data re-expressions of the reference's derived dictionary
queries (SURVEY §2.6):

- ``kb_dedup``      — A8: per (identifier, name) keep the row with min
                      (description, uid): symbol beats synonym
                      (belb/kbs/kb.py:251-263).
- ``synsets``       — A1: identifier → sorted names (belb/kbs/query.py:321-356).
- ``name_homonyms`` — A3: names borne by >1 identifier
                      (belb/kbs/query.py:234-291).
- ``identifier_homonyms`` — A2: identifiers with identical ordered name
                      lists merge; canonical = min identifier; the rest
                      become homonym→canonical edges
                      (belb/kbs/query.py:97-194).
- ``foreign_name_homonyms`` — A4: names under >1 identifier AND >1
                      foreign identifier (two-predicate HAVING,
                      belb/kbs/query.py:196-232).

All orderings are explicit total orders, preserving the reference's
"first of sorted group" determinism (SURVEY §4).

Execution shape: every aggregation hash-buckets its key tuple into ONE
int32 column, shuffles by that, and combines VECTORIZED pandas per
bucket (``agg.py`` bucketed-combine pattern). The earlier
``groupby(key).map_groups`` forms dispatched one Python call + one-row
DataFrame per group — measured ~50x slower at high key cardinality.
"""

from __future__ import annotations

import pandas as pd
import ray.data as rd

from .agg import _bucket_of_frame, count_distinct

from belb_ray.util import resolve_num_buckets


def _bucket_by(ds: rd.Dataset, keys: list[str], num_buckets: int) -> rd.Dataset:
    def _bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        batch["__bucket"] = _bucket_of_frame(batch, keys, num_buckets)
        return batch

    return ds.map_batches(_bucketize, batch_format="pandas",
                          batch_size=1 << 18)


def kb_dedup(synonyms: rd.Dataset, num_buckets: int = 0) -> rd.Dataset:
    """Keep-first dedup by (identifier, name): min (description, uid).
    One bucketed shuffle; per bucket a vectorized sort + drop_duplicates
    (no per-group dispatch)."""

    num_buckets = resolve_num_buckets(num_buckets)
    def _dedup(group: pd.DataFrame) -> pd.DataFrame:
        return (group.drop(columns="__bucket")
                .sort_values(["identifier", "name", "description", "uid"],
                             kind="stable")
                .drop_duplicates(["identifier", "name"], keep="first"))

    return _bucket_by(synonyms, ["identifier", "name"], num_buckets) \
        .groupby("__bucket").map_groups(_dedup, batch_format="pandas")


def synsets(synonyms: rd.Dataset, sep: str = ";",
            num_buckets: int = 0) -> rd.Dataset:
    """identifier → sep-joined sorted distinct names (+ n_names)."""

    num_buckets = resolve_num_buckets(num_buckets)
    def _syn(group: pd.DataFrame) -> pd.DataFrame:
        dd = (group[["identifier", "name"]].drop_duplicates()
              .sort_values(["identifier", "name"], kind="stable"))
        g = dd.groupby("identifier", sort=False)["name"]
        out = g.agg(sep.join).rename("names").reset_index()
        out["n_names"] = g.size().to_numpy()
        return out

    return _bucket_by(synonyms, ["identifier"], num_buckets) \
        .groupby("__bucket").map_groups(_syn, batch_format="pandas")


def name_homonyms(synonyms: rd.Dataset) -> rd.Dataset:
    """names attached to >1 distinct identifier → (name, n_identifiers)."""
    counted = count_distinct(synonyms, ["name"], "identifier", "n_identifiers")
    return counted.filter(expr="n_identifiers > 1")


def identifier_homonyms(synonyms: rd.Dataset, sep: str = ";",
                        num_buckets: int = 0) -> rd.Dataset:
    """(homonym, identifier): identifiers sharing the same ordered name
    list; min identifier of the group is canonical, others map to it."""

    num_buckets = resolve_num_buckets(num_buckets)
    def _namelist(group: pd.DataFrame) -> pd.DataFrame:
        dd = (group[["identifier", "name"]].drop_duplicates()
              .sort_values(["identifier", "name"], kind="stable"))
        return (dd.groupby("identifier", sort=False)["name"]
                .agg(sep.join).rename("__names").reset_index())

    per_id = _bucket_by(synonyms, ["identifier"], num_buckets) \
        .groupby("__bucket").map_groups(_namelist, batch_format="pandas")

    def _merge(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop(columns="__bucket")
        canon = g.groupby("__names", sort=False)["identifier"].transform("min")
        out = g[g["identifier"] != canon]
        return pd.DataFrame({"homonym": out["identifier"].to_numpy(),
                             "identifier": canon[out.index].to_numpy()})

    return _bucket_by(per_id, ["__names"], num_buckets) \
        .groupby("__bucket").map_groups(_merge, batch_format="pandas")


def foreign_name_homonyms(synonyms: rd.Dataset,
                          num_buckets: int = 0) -> rd.Dataset:
    """A4 exact: names under >1 distinct identifier AND >1 distinct
    foreign identifier → (name, n_identifiers, n_foreign). The reference's
    two-predicate HAVING (belb/kbs/query.py:196-232)."""
    num_buckets = resolve_num_buckets(num_buckets)
    cols = ["name", "identifier", "foreign_identifier"]

    def _dedup(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[cols].drop_duplicates()

    def _count(group: pd.DataFrame) -> pd.DataFrame:
        dd = group.drop(columns="__bucket").drop_duplicates()
        g = dd.groupby("name", sort=False)
        out = pd.DataFrame({
            "n_identifiers": g["identifier"].nunique(),
            "n_foreign": g["foreign_identifier"].nunique(),
        }).reset_index()
        return out[(out["n_identifiers"] > 1) & (out["n_foreign"] > 1)]

    dd = synonyms.map_batches(_dedup, batch_format="pandas", batch_size=65536)
    return _bucket_by(dd, ["name"], num_buckets) \
        .groupby("__bucket").map_groups(_count, batch_format="pandas")
