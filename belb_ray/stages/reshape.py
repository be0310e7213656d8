"""Row/column reshape operators.

``unpivot`` is the wide→long melt (SQL ``UNPIVOT`` / pandas ``melt``):
each of N value columns becomes a (variable-name, value) row pair. Pure
``map_batches`` — every output row derives from one input row, so the op
streams with zero shuffle and scales linearly at any input size. The
reference analog is the per-column QAQC expansion of wide KB tables
(e.g. /root/reference/belb/kbs/query.py's per-attribute homonym passes).
"""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd


def unpivot(ds: rd.Dataset, id_cols: list[str], value_cols: list[str],
            var_name: str = "attribute", value_name: str = "value",
            value_type: pa.DataType | None = None) -> rd.Dataset:
    """Melt ``value_cols`` into (``var_name``, ``value_name``) long rows,
    keeping ``id_cols``. All value columns are cast to a common Arrow
    type (``value_type``, default float64). Output order within a batch
    is column-major (all rows' first attribute, then the second, …) —
    callers needing a total order sort on (id, attribute)."""
    if not value_cols:
        raise ValueError("unpivot needs at least one value column")
    vt = value_type or pa.float64()

    def _melt(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        ids = {c: pa.concat_arrays(
            [batch[c].combine_chunks()] * len(value_cols))
            for c in id_cols}
        var = pa.array(
            sum(([v] * n for v in value_cols), []), pa.string())
        val = pa.concat_arrays(
            [batch[v].cast(vt).combine_chunks() for v in value_cols])
        return pa.table({**ids, var_name: var, value_name: val})

    return ds.map_batches(_melt, batch_format="pyarrow")
