"""Source readers re-expressing the reference's ingest family (SURVEY
§2.1) Ray-Data-first:

- S1/S12: delimited text (TSV/.gz, pipe-delimited RRF) → ``read_csv`` with
  Arrow parse options (native block splitting, predicate/column pushdown).
- S5/S8: JSON-lines → ``read_json``.
- S4: record-block flat files (``//``-delimited records, keyed lines, e.g.
  Cellosaurus ``cellosaurus.txt``; reference parser
  belb/kbs/cellosaurus/cellosaurus.py:124-147) → whole-file read +
  ``flat_map``-style record split in ``map_batches`` (records never span
  files, so no cross-block reassembly is needed).
- S2's gz line streams are just ``read_csv``/``read_text`` with an Arrow
  gzip stream underneath.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.csv as pacsv
import ray.data as rd


def read_delimited(paths, delimiter: str = "\t", column_names=None,
                   columns=None, **kwargs) -> rd.Dataset:
    """TSV / pipe-delimited / CSV reader (gz handled by Arrow transparently
    by extension). ``columns`` prunes at the read."""
    parse_options = pacsv.ParseOptions(delimiter=delimiter)
    read_options = None
    if column_names is not None:
        read_options = pacsv.ReadOptions(column_names=column_names)
    convert_options = None
    if columns is not None:
        convert_options = pacsv.ConvertOptions(include_columns=columns)
    kw = dict(parse_options=parse_options)
    if read_options is not None:
        kw["read_options"] = read_options
    if convert_options is not None:
        kw["convert_options"] = convert_options
    kw.update(kwargs)
    return rd.read_csv(paths, **kw)


def read_jsonl(paths, **kwargs) -> rd.Dataset:
    return rd.read_json(paths, **kwargs)


def read_record_blocks(paths, record_sep: str = "\n//\n",
                       encoding: str = "utf-8") -> rd.Dataset:
    """Flat files of ``record_sep``-delimited multi-line records → one row
    per record (``record: string``). Files are the parallelism unit."""
    raw = rd.read_binary_files(paths)

    def _split(batch: pa.Table) -> pa.Table:
        records: list[str] = []
        for blob in batch["bytes"].to_pylist():
            text = blob.decode(encoding)
            for rec in text.split(record_sep):
                rec = rec.strip("\n")
                if rec:
                    records.append(rec)
        return pa.table({"record": pa.array(records, pa.string())})

    return raw.map_batches(_split, batch_format="pyarrow", batch_size=1)


def parse_keyed_records(records: rd.Dataset, key_len: int = 2,
                        record_col: str = "record") -> rd.Dataset:
    """Keyed-line record parser (Cellosaurus-style ``XX   value`` lines) →
    one row per (record_idx-in-block, key, value). Vectorizable enough:
    pure string splits inside the batch."""

    def _parse(batch: pa.Table) -> pa.Table:
        ridx, keys, vals = [], [], []
        for i, rec in enumerate(batch[record_col].to_pylist()):
            for line in rec.split("\n"):
                if len(line) <= key_len:
                    continue
                key = line[:key_len].strip()
                val = line[key_len:].strip()
                if key and val:
                    ridx.append(i)
                    keys.append(key)
                    vals.append(val)
        return pa.table({
            "record_idx": pa.array(ridx, pa.int32()),
            "key": pa.array(keys, pa.string()),
            "value": pa.array(vals, pa.string()),
        })

    return records.map_batches(_parse, batch_format="pyarrow")
