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


def read_pubtator(paths, encoding: str = "utf-8") -> tuple[rd.Dataset, rd.Dataset]:
    """S6: PubTator text-format corpus reader (reference:
    ``pubtator.iterparse`` consumers, belb/corpora/ncbi_disease/
    ncbi_disease.py:91-112, bc5cdr.py:91-111). Format::

        PMID|t|Title text
        PMID|a|Abstract text
        PMID<TAB>start<TAB>end<TAB>mention<TAB>type<TAB>identifier
        <blank line>

    → (documents(pmid, title, abstract),
       annotations(pmid, start, end, text, entity_type, identifiers)).
    Documents never span files, so files are the parallelism unit; both
    outputs stream from the same single-pass parse (invoked twice — the
    raw read is cheap next to any downstream stage)."""

    def _parse(batch: pa.Table, want: str) -> pa.Table:
        d_pmid, d_title, d_abs = [], [], []
        a_pmid, a_s, a_e, a_txt, a_ty, a_id = [], [], [], [], [], []
        for blob in batch["bytes"].to_pylist():
            for block in blob.decode(encoding).split("\n\n"):
                title = abstract = ""
                pmid = None
                for line in block.strip("\n").split("\n"):
                    if not line:
                        continue
                    if "|t|" in line[:32]:
                        pmid, title = line.split("|t|", 1)
                    elif "|a|" in line[:32]:
                        pmid, abstract = line.split("|a|", 1)
                    else:
                        parts = line.split("\t")
                        if len(parts) >= 6:
                            a_pmid.append(parts[0])
                            a_s.append(int(parts[1]))
                            a_e.append(int(parts[2]))
                            a_txt.append(parts[3])
                            a_ty.append(parts[4])
                            a_id.append(parts[5])
                if pmid is not None:
                    d_pmid.append(pmid)
                    d_title.append(title)
                    d_abs.append(abstract)
        if want == "docs":
            return pa.table({"pmid": pa.array(d_pmid, pa.string()),
                             "title": pa.array(d_title, pa.string()),
                             "abstract": pa.array(d_abs, pa.string())})
        return pa.table({"pmid": pa.array(a_pmid, pa.string()),
                         "start": pa.array(a_s, pa.int64()),
                         "end": pa.array(a_e, pa.int64()),
                         "text": pa.array(a_txt, pa.string()),
                         "entity_type": pa.array(a_ty, pa.string()),
                         "identifiers": pa.array(a_id, pa.string())})

    raw = rd.read_binary_files(paths)
    docs = raw.map_batches(lambda t: _parse(t, "docs"),
                           batch_format="pyarrow", batch_size=1)
    anns = rd.read_binary_files(paths).map_batches(
        lambda t: _parse(t, "anns"), batch_format="pyarrow", batch_size=1)
    return docs, anns


def read_tar_members(paths, suffix: str = "", encoding: str = "utf-8",
                     lines: bool = False) -> rd.Dataset:
    """S3: tar-member streamer (reference: taxdump ``names.dmp`` out of
    ``taxdump.tar.gz``, belb/kbs/ncbi_taxonomy/ncbi_taxonomy.py:86-99).

    One tar archive is ONE sequential stream — the parallelism unit is the
    archive, so a directory of tars fans out naturally
    (``read_binary_files`` → per-file member extraction). With
    ``lines=True`` each member explodes to (member, line_no, line) rows;
    otherwise one row per member (member, content)."""
    import io
    import tarfile

    raw = rd.read_binary_files(paths, include_paths=True)

    def _extract(batch: pa.Table) -> pa.Table:
        members, payloads, line_nos = [], [], []
        for blob in batch["bytes"].to_pylist():
            with tarfile.open(fileobj=io.BytesIO(blob), mode="r:*") as tf:
                for m in tf:
                    if not m.isfile() or not m.name.endswith(suffix):
                        continue
                    data = tf.extractfile(m).read().decode(encoding)
                    if lines:
                        for i, ln in enumerate(data.splitlines()):
                            members.append(m.name)
                            line_nos.append(i)
                            payloads.append(ln)
                    else:
                        members.append(m.name)
                        payloads.append(data)
        cols = {"member": pa.array(members, pa.string())}
        if lines:
            cols["line_no"] = pa.array(line_nos, pa.int64())
            cols["line"] = pa.array(payloads, pa.string())
        else:
            cols["content"] = pa.array(payloads, pa.string())
        return pa.table(cols)

    return raw.map_batches(_extract, batch_format="pyarrow", batch_size=1)


def read_xml_documents(paths, doc_tag: str, field_tags: tuple = (),
                       encoding: str = "utf-8") -> rd.Dataset:
    """S7/S9: XML reader — one row per ``<doc_tag>`` element with its
    attributes (``attr_*`` columns), child-element texts for
    ``field_tags``, and the element's full concatenated text
    (reference BioC XML: belb/corpora/nlm_chem/nlm_chem.py:192-204;
    offset-reconstructing ElementTree parse:
    belb/corpora/osiris/osiris.py:74-120). Files are the parallelism
    unit; parse runs inside map_batches workers."""
    import xml.etree.ElementTree as ET

    raw = rd.read_binary_files(paths, include_paths=True)

    def _parse(batch: pa.Table) -> pa.Table:
        rows: list[dict] = []
        for path, blob in zip(batch["path"].to_pylist(),
                              batch["bytes"].to_pylist()):
            root = ET.fromstring(blob.decode(encoding))
            it = ([root] if root.tag == doc_tag else
                  root.iter(doc_tag))
            for i, el in enumerate(it):
                row = {"file": path, "doc_idx": i}
                for k, v in el.attrib.items():
                    row[f"attr_{k}"] = v
                for tag in field_tags:
                    child = el.find(f".//{tag}")
                    row[tag] = None if child is None else \
                        "".join(child.itertext())
                row["full_text"] = "".join(el.itertext())
                rows.append(row)
        if not rows:
            return pa.table({"file": pa.array([], pa.string()),
                             "doc_idx": pa.array([], pa.int64()),
                             "full_text": pa.array([], pa.string())})
        cols = sorted({k for r in rows for k in r})
        return pa.table({c: pa.array([r.get(c) for r in rows]) for c in cols})

    return raw.map_batches(_parse, batch_format="pyarrow", batch_size=1)


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


def _xlsx_cell_value(c, shared: list[str]) -> str | None:
    """One OOXML <c> element → string value (type-tag aware)."""
    t = c.get("t", "n")
    ns = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
    if t == "inlineStr":
        is_el = c.find(f"{ns}is")
        return "".join(el.text or "" for el in
                       is_el.iter(f"{ns}t")) if is_el is not None else None
    v = c.find(f"{ns}v")
    if v is None or v.text is None:
        return None
    if t == "s":  # shared-string index
        return shared[int(v.text)]
    return v.text  # n / str / b: the raw stored text


def _xlsx_col_index(ref: str) -> int:
    """'BC12' → 0-based column 54 (letters part of the A1 reference)."""
    idx = 0
    for ch in ref:
        if not ch.isalpha():
            break
        idx = idx * 26 + (ord(ch.upper()) - 64)
    return idx - 1


def read_excel_table(path: str, header: bool = True,
                     sheet: int = 1) -> pa.Table:
    """S10: ``.xlsx`` side-table reader — the reference loads an Excel
    mapping sheet via ``pd.read_excel`` and broadcasts it as a dict
    (belb/corpora/bioid/bioid.py:173-186). No Excel library ships in
    this container, so this is a dependency-free OOXML parse (stdlib
    ``zipfile`` + ``ElementTree``): shared strings + ``sheet{N}.xml``
    → one Arrow table. Column types are inferred (all-int64 → int64,
    all-numeric → float64, else string; blanks → null).

    Returns a DRIVER-SIDE ``pa.Table`` by design: an Excel side table
    is small by construction (the format caps at ~10^6 rows) and its
    consumer is ``broadcast_join`` / a ``ray.put`` dict — it is never
    the big side of anything. Wrap with ``ray.data.from_arrow`` to
    compose as a Dataset."""
    import xml.etree.ElementTree as ET
    import zipfile

    ns = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
    with zipfile.ZipFile(path) as zf:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in zf.namelist():
            root = ET.fromstring(zf.read("xl/sharedStrings.xml"))
            for si in root.iter(f"{ns}si"):
                shared.append("".join(el.text or ""
                                      for el in si.iter(f"{ns}t")))
        sheet_xml = zf.read(f"xl/worksheets/sheet{sheet}.xml")

    rows: list[dict[int, str | None]] = []
    width = 0
    for row_el in ET.fromstring(sheet_xml).iter(f"{ns}row"):
        row: dict[int, str | None] = {}
        for j, c in enumerate(row_el.iter(f"{ns}c")):
            ref = c.get("r")
            col = _xlsx_col_index(ref) if ref else j
            row[col] = _xlsx_cell_value(c, shared)
        if row:
            width = max(width, max(row) + 1)
            rows.append(row)
    if not rows:
        return pa.table({})

    grid = [[r.get(j) for r in rows] for j in range(width)]
    if header:
        names = [grid[j][0] if grid[j][0] is not None else f"col{j}"
                 for j in range(width)]
        grid = [col[1:] for col in grid]
    else:
        names = [f"col{j}" for j in range(width)]

    def _typed(col: list) -> pa.Array:
        for typ, conv in ((pa.int64(), int), (pa.float64(), float)):
            try:
                return pa.array(
                    [None if v is None else conv(v) for v in col], typ)
            except (ValueError, OverflowError, pa.ArrowInvalid):
                continue
        return pa.array(col, pa.string())

    return pa.table({n: _typed(g) for n, g in zip(names, grid)})


def _clean_read_schema(path, columns=None):
    """Resolve a metadata-free Arrow schema for a parquet file, shard
    list, or flat shard directory. Pandas-written parquet carries a
    ``b'pandas'`` schema-metadata dict that makes ``pa.Schema``
    UNHASHABLE — Ray's block-unify dedup (`ray/data/_internal/arrow_ops/
    transform_pyarrow.py` ``unify_schemas``) then warns "Failed to hash
    the schemas" in EVERY read/reduce task. Passing an explicit
    metadata-free schema to ``read_parquet`` removes the noise at the
    source. Returns ``None`` (caller lets Ray infer) for hive-partitioned
    dirs, missing columns, or any resolution failure — correctness never
    depends on this."""
    import os

    import pyarrow.parquet as pq

    try:
        f = path
        if isinstance(path, (list, tuple)):
            if not path:
                return None
            f = path[0]
        if os.path.isdir(f):
            names = sorted(x for x in os.listdir(f) if x.endswith(".parquet"))
            if not names:  # hive-partitioned / nested: partition cols
                return None  # would be missing from the file schema
            f = os.path.join(f, names[0])
        sch = pq.read_schema(f).remove_metadata()
        if columns is not None:
            sch = pa.schema([sch.field(c) for c in columns])
        return sch
    except Exception:
        return None


def read_parquet_clean(path, *, columns=None, **kwargs) -> rd.Dataset:
    """``rd.read_parquet`` with an explicit metadata-free schema (see
    ``_clean_read_schema``) so every downstream block schema is hashable
    and Ray's unify fast path engages silently."""
    if "schema" not in kwargs:
        sch = _clean_read_schema(path, columns)
        if sch is not None:
            kwargs["schema"] = sch
    return rd.read_parquet(path, columns=columns, **kwargs)


def read_parquet_pruned(path, columns=None, predicate=None,
                        **kwargs) -> rd.Dataset:
    """Parquet read with projection AND predicate pushdown: ``columns``
    prunes at the column-chunk level, ``predicate`` (a
    ``pyarrow.dataset`` expression, e.g. ``pads.field("x") > 5``)
    prunes row groups via their min/max statistics BEFORE bytes leave
    storage — the "prune at the read" rule. A post-read
    ``ds.filter(expr=...)`` scans every row of every row group; this
    never deserializes groups whose statistics exclude the predicate."""
    return read_parquet_clean(path, columns=columns, filter=predicate,
                              **kwargs)
