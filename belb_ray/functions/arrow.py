"""Arrow block-construction helpers shared by the stages.

``pa.Table.from_pandas`` attaches a ``b'pandas'`` schema-metadata blob
whose embedded dict makes ``pa.Schema`` unhashable; Ray's block-unify
dedup then logs "Failed to hash the schemas (for deduplication)" from
EVERY downstream read/reduce task (ray/data/_internal/arrow_ops/
transform_pyarrow.py ``unify_schemas``). Route every pandas→Arrow block
conversion through :func:`table_from_pandas` so block schemas stay
hashable and the unify fast path engages silently.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa


def table_from_pandas(df: pd.DataFrame) -> pa.Table:
    """``pa.Table.from_pandas(preserve_index=False)`` minus the
    unhashable ``b'pandas'`` schema metadata (see module docstring)."""
    return pa.Table.from_pandas(
        df, preserve_index=False).replace_schema_metadata(None)
