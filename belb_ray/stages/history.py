"""Identifier-history resolution and cross-source ID mapping.

Replays the reference's redirect semantics (belb/kbs/kb.py:455-486,
applied per-annotation in belb/preprocessing/qaqc.py:97-178 — SURVEY
§2.5 J2): a left lookup of ``old_identifier → new_identifier`` where a
miss keeps the id, a hit rewrites it, and the "-1" sentinel marks the id
obsolete (belb/preprocessing/data.py:24). The reference resolves ONE hop
(dbSNP multi-merges pack a ';' list, belb/kbs/dbsnp/dbsnp.py:241-256);
here chains are resolved to FIXPOINT by squaring the redirect map
(log(h) doublings) before the broadcast, so the per-row lookup stays one
hop — the distributed-friendly form of chain chasing.

The history/mapping tables are side tables (≪ corpus), broadcast via
``ray.put`` and applied in ``map_batches`` — never a corpus-wide shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

OBSOLETE = "-1"  # reference sentinel, belb/preprocessing/data.py:24


def squash_history(history: pd.DataFrame, max_doublings: int = 20) -> dict[str, str]:
    """old→new map squared to fixpoint; cycles collapse to the min member
    (total-order determinism). Obsolete ("-1") is absorbing."""
    nxt = dict(zip(history["old_identifier"].astype(str),
                   history["new_identifier"].astype(str)))
    for _ in range(max_doublings):
        changed = False
        new_map = {}
        for k, v in nxt.items():
            w = nxt.get(v)
            if w is not None and w != v and v != OBSOLETE:
                # cycle guard: collapse k→...→k to min id on the cycle
                if w == k:
                    w = min(k, v)
                new_map[k] = w
                changed = True
            else:
                new_map[k] = v
        nxt = new_map
        if not changed:
            break
    return nxt


def resolve_identifiers(
    ds: rd.Dataset,
    history: pd.DataFrame | pa.Table,
    id_col: str = "identifier",
    out_col: str = "resolved_identifier",
    status_col: str = "id_status",
) -> rd.Dataset:
    """Add resolved id + status ∈ {kept, replaced, obsolete} per row —
    the reference's per-annotation amend + QAQC counters
    (belb/preprocessing/qaqc.py:131-178 — SURVEY §2.6 A10)."""
    if isinstance(history, pa.Table):
        history = history.to_pandas()
    redirects = squash_history(history)
    # broadcast a hash-indexed Series (not a dict): Series.map against it
    # is one vectorized C lookup per batch instead of a per-row Python loop
    ref = ray.put(pd.Series(redirects, dtype=object))

    from ..util import cached_get

    def _resolve(batch: pa.Table) -> pa.Table:
        m = cached_get(ref)  # pd.Series: memoized per worker process
        s = batch[id_col].to_pandas().astype(str)
        w = s.map(m)
        hit = w.notna().to_numpy()
        resolved = w.fillna(s).to_numpy(dtype=object)
        status = np.where(~hit, "kept",
                          np.where(resolved == OBSOLETE, "obsolete",
                                   "replaced"))
        return (batch
                .append_column(out_col, pa.array(resolved, pa.string()))
                .append_column(status_col, pa.array(status, pa.string())))

    return ds.map_batches(_resolve, batch_format="pyarrow")


def apply_id_mapping(
    ds: rd.Dataset,
    mapping: pd.DataFrame | pa.Table,
    id_col: str,
    out_col: str = "internal_identifier",
    missing: int = -1,
) -> rd.Dataset:
    """original_identifier → internal int id broadcast lookup (reference:
    belb/kbs/kb.py:538-570 — SURVEY §2.5 J4). Missing ids map to -1."""
    if isinstance(mapping, pa.Table):
        mapping = mapping.to_pandas()
    m = pd.Series(mapping["internal_identifier"].astype(np.int64).to_numpy(),
                  index=mapping["original_identifier"].astype(str))
    ref = ray.put(m)

    from ..util import cached_get

    def _map(batch: pa.Table) -> pa.Table:
        m = cached_get(ref)  # pd.Series: vectorized hash lookup per batch
        vals = (batch[id_col].to_pandas().astype(str)
                .map(m).fillna(missing).astype(np.int64))
        return batch.append_column(out_col,
                                   pa.array(vals.to_numpy(), pa.int64()))

    return ds.map_batches(_map, batch_format="pyarrow")
