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

All orderings are explicit total orders, preserving the reference's
"first of sorted group" determinism (SURVEY §4).
"""

from __future__ import annotations

import pandas as pd
import ray.data as rd

from .agg import count_distinct


def kb_dedup(synonyms: rd.Dataset) -> rd.Dataset:
    """Keep-first dedup by (identifier, name): min (description, uid)."""

    def _first(group: pd.DataFrame) -> pd.DataFrame:
        return group.sort_values(["description", "uid"]).head(1)

    return synonyms.groupby(["identifier", "name"]).map_groups(
        _first, batch_format="pandas")


def synsets(synonyms: rd.Dataset, sep: str = ";") -> rd.Dataset:
    """identifier → sep-joined sorted distinct names (+ n_names)."""

    def _syn(group: pd.DataFrame) -> pd.DataFrame:
        names = sorted(set(group["name"]))
        return pd.DataFrame({"identifier": [group["identifier"].iloc[0]],
                             "names": [sep.join(names)],
                             "n_names": [len(names)]})

    return synonyms.groupby("identifier").map_groups(_syn, batch_format="pandas")


def name_homonyms(synonyms: rd.Dataset) -> rd.Dataset:
    """names attached to >1 distinct identifier → (name, n_identifiers)."""
    counted = count_distinct(synonyms, ["name"], "identifier", "n_identifiers")
    return counted.filter(lambda row: row["n_identifiers"] > 1)


def identifier_homonyms(synonyms: rd.Dataset, sep: str = ";") -> rd.Dataset:
    """(homonym, identifier): identifiers sharing the same ordered name
    list; min identifier of the group is canonical, others map to it."""

    def _namelist(group: pd.DataFrame) -> pd.DataFrame:
        names = sorted(set(group["name"]))
        return pd.DataFrame({"identifier": [group["identifier"].iloc[0]],
                             "__names": [sep.join(names)]})

    per_id = synonyms.groupby("identifier").map_groups(_namelist, batch_format="pandas")

    def _merge(group: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(group["identifier"])
        dtype = group["identifier"].dtype
        if len(ids) < 2:
            return pd.DataFrame({"homonym": pd.Series([], dtype=dtype),
                                 "identifier": pd.Series([], dtype=dtype)})
        canonical = ids[0]
        return pd.DataFrame({"homonym": ids[1:],
                             "identifier": [canonical] * (len(ids) - 1)})

    return per_id.groupby("__names").map_groups(_merge, batch_format="pandas")
