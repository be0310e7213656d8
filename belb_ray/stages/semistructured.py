"""Semi-structured column extraction: JSON fields and regex groups.

The reference parses semi-structured payloads row-by-row in its corpus
parsers (PubTator fields, BioC passages — belb/corpora/parser.py); these
ops are the generic streaming equivalents over a Dataset column. Both
are pure ``map_batches`` (zero shuffle, linear at any scale).

- ``json_field`` parses a JSON-string column and projects one top-level
  field. Parsing is a per-row ``json.loads`` — Python-level because no
  Arrow JSON-path kernel exists in this pyarrow build — but it is the
  only row loop and it's bounded by the decode itself (same policy as
  the regex tokenizer in docstats). Malformed/missing rows yield null.
- ``regex_extract`` pulls capture groups with pandas' vectorized C
  regex engine (compiled once per batch call, not per row).
"""

from __future__ import annotations

import json

import pandas as pd
import pyarrow as pa
import ray.data as rd


def json_field(ds: rd.Dataset, col: str, field: str,
               out_col: str | None = None,
               out_type: pa.DataType | None = None) -> rd.Dataset:
    """Append ``out_col`` = the top-level ``field`` of the JSON in
    ``col`` (null when the row is malformed or the field is absent).
    Values are emitted as strings by default (SQL
    ``json_extract_string`` parity) or cast to ``out_type``."""
    out_col = out_col or field
    loads = json.loads

    def _extract(batch: pa.Table) -> pa.Table:
        vals = batch[col].to_pylist()
        out = []
        for v in vals:
            try:
                x = loads(v)[field]
                out.append(x if isinstance(x, str) else
                           json.dumps(x) if isinstance(x, (dict, list))
                           else str(x))
            except (TypeError, KeyError, ValueError):
                out.append(None)
        arr = pa.array(out, pa.string())
        if out_type is not None:
            arr = arr.cast(out_type)
        return batch.append_column(out_col, arr)

    return ds.map_batches(_extract, batch_format="pyarrow")


def regex_extract(ds: rd.Dataset, col: str, pattern: str,
                  out_cols: list[str],
                  no_match: str | None = "") -> rd.Dataset:
    """Append one column per capture group in ``pattern``, extracted
    with pandas' vectorized regex engine. Non-matching rows get
    ``no_match`` (default empty string — SQL ``regexp_extract``
    parity; pass None to keep nulls)."""
    def _extract(batch: pd.DataFrame) -> pd.DataFrame:
        got = batch[col].str.extract(pattern, expand=True)
        if got.shape[1] != len(out_cols):
            raise ValueError(
                f"pattern has {got.shape[1]} groups, expected "
                f"{len(out_cols)}")
        for name, c in zip(out_cols, got.columns):
            s = got[c]
            batch[name] = s.fillna(no_match) if no_match is not None else s
        return batch

    return ds.map_batches(_extract, batch_format="pandas",
                          batch_size=1 << 16)
