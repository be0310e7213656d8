"""Extension surface: PipelineStep registry (§2.8), QAQC drop counters,
text transformations with invariants, tar/XML readers."""

import json
import os
import tarfile

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd


# ---------------------------------------------------------------- registry


def test_registry_register_build_run(tmp_path):
    from belb_ray.pipelines.checkpoint import read_manifest
    from belb_ray.pipelines.registry import (FnStep, build_step, list_steps,
                                             register_step, run_step,
                                             unregister_step)

    @register_step("double_value")
    def _make(cfg):
        mult = int(cfg.get("mult", 2))

        def step(ds):
            return ds.map_batches(
                lambda t: t.set_column(
                    t.column_names.index("v"), "v",
                    pa.compute.multiply(t["v"], pa.scalar(mult))),
                batch_format="pyarrow")

        return step

    try:
        assert "double_value" in list_steps()
        ds = rd.from_arrow(pa.table({"v": [1, 2, 3]}))
        step = build_step("double_value", {"mult": 3})
        assert isinstance(step, FnStep) and step.name == "double_value"
        assert sorted(step(ds).to_pandas()["v"]) == [3, 6, 9]

        # checkpointed run: second invocation reads shards, not recompute
        ck = str(tmp_path / "ck")
        out1 = run_step("double_value", {"mult": 3}, ds, checkpoint_dir=ck)
        assert sorted(out1.to_pandas()["v"]) == [3, 6, 9]
        man = read_manifest(os.path.join(ck, "double_value"))
        assert man is not None and man["rows"] == 3
        assert man["lineage"]["step"] == "double_value"
        out2 = run_step("double_value", {"mult": 3},
                        rd.from_arrow(pa.table({"v": [99]})),  # ignored: cached
                        checkpoint_dir=ck)
        assert sorted(out2.to_pandas()["v"]) == [3, 6, 9]
    finally:
        unregister_step("double_value")


def test_registry_builtins_and_unknown():
    from belb_ray.pipelines.registry import build_step, list_steps

    assert {"ensure_identity", "normalize_text", "exact_dedup",
            "minhash_features"}.issubset(set(list_steps()))
    with pytest.raises(KeyError):
        build_step("no_such_step")


def test_registry_duplicate_name_rejected():
    from belb_ray.pipelines.registry import register_step, unregister_step

    @register_step("dup_probe")
    def _a(cfg):
        return lambda ds: ds

    try:
        with pytest.raises(ValueError):
            @register_step("dup_probe")
            def _b(cfg):
                return lambda ds: ds
    finally:
        unregister_step("dup_probe")


# ---------------------------------------------------------------- qaqc


def test_qaqc_counted_filter_conservation(tmp_path):
    from belb_ray.pipelines.qaqc import (counted_filter, new_stats,
                                         stats_snapshot, write_qaqc_manifest)

    stats = new_stats()
    ds = rd.from_arrow(pa.table({"v": list(range(100)),
                                 "lang": ["en", "xx"] * 50}))
    out = counted_filter(ds, lambda t: np.asarray(t["v"].to_numpy() % 3 != 0),
                         "stage1", "v_mod3", stats)
    out = counted_filter(
        out, lambda t: np.asarray([l == "en" for l in t["lang"].to_pylist()]),
        "stage2", "bad_lang", stats)
    rows_out = out.count()
    counts = stats_snapshot(stats)
    assert counts["stage1/v_mod3"] == 34
    assert 100 == rows_out + sum(counts.values())

    man_path = str(tmp_path / "qaqc_stats.json")
    man = write_qaqc_manifest(stats, man_path, rows_in=100, rows_out=rows_out)
    assert man["dropped_total"] == 100 - rows_out
    assert json.load(open(man_path))["rows_in"] == 100

    # conservation violation must raise
    with pytest.raises(ValueError):
        write_qaqc_manifest(stats, man_path, rows_in=100, rows_out=rows_out - 1)


# ---------------------------------------------------------------- transform


def _docs():
    return rd.from_arrow(pa.table({
        "doc_id": [1, 2],
        "text": ["One sentence. Two now! And a third? yes.",
                 "No boundaries here"],
    }))


def test_split_sentences_offsets_reassemble():
    from belb_ray.stages.transform import split_sentences

    out = split_sentences(_docs()).to_pandas()
    texts = {1: "One sentence. Two now! And a third? yes.",
             2: "No boundaries here"}
    for _, r in out.iterrows():
        t = texts[r["doc_id"]]
        assert t[r["start"]:r["start"] + r["length"]] == r["sentence"]
    assert list(out[out.doc_id == 1]["sentence"]) == \
        ["One sentence.", "Two now!", "And a third?", "yes."]
    assert list(out[out.doc_id == 2]["sentence"]) == ["No boundaries here"]


def test_mark_mentions_length_and_offsets():
    from belb_ray.stages.transform import mark_mentions

    docs = rd.from_arrow(pa.table({
        "doc_id": [1], "text": ["alpha beta gamma"]}))
    spans = rd.from_arrow(pa.table({
        "doc_id": [1, 1], "start": [0, 11], "end": [5, 16]}))
    out = mark_mentions(docs, spans).to_pandas()
    assert out.iloc[0]["marked_text"] == "[M]alpha[/M] beta [M]gamma[/M]"
    assert out.iloc[0]["n_marked"] == 2


def test_mark_mentions_overlap_raises():
    from belb_ray.stages.transform import TransformInvariantError, mark_mentions

    docs = rd.from_arrow(pa.table({"doc_id": [1], "text": ["abcdef"]}))
    spans = rd.from_arrow(pa.table({
        "doc_id": [1, 1], "start": [0, 2], "end": [4, 6]}))
    with pytest.raises(Exception) as ei:
        mark_mentions(docs, spans).to_pandas()
    assert "overlapping span" in str(ei.value)


def test_clean_intraword():
    from belb_ray.stages.transform import clean_intraword

    docs = rd.from_arrow(pa.table({
        "doc_id": [1], "text": ["xxBRCA1yy and BRCA2"]}))
    spans = rd.from_arrow(pa.table({
        "doc_id": [1, 1], "start": [2, 14], "end": [7, 19]}))
    out = clean_intraword(docs, spans).to_pandas()
    assert out.iloc[0]["clean_text"] == "xx BRCA1 yy and BRCA2"
    assert out.iloc[0]["n_inserted"] == 2


def test_check_offsets_flags_bad_spans():
    from belb_ray.stages.transform import check_offsets

    docs = rd.from_arrow(pa.table({"doc_id": [1], "text": ["hello world"]}))
    spans = rd.from_arrow(pa.table({
        "doc_id": [1, 1], "start": [0, 6], "end": [5, 11],
        "surface": ["hello", "worlD"]}))
    bad = check_offsets(docs, spans).to_pandas()
    assert len(bad) == 1 and bad.iloc[0]["surface"] == "worlD"


# ---------------------------------------------------------------- readers


def test_read_tar_members(tmp_path):
    from belb_ray.sources.readers import read_tar_members

    tpath = tmp_path / "dump.tar.gz"
    (tmp_path / "names.dmp").write_text("1|root|scientific name|\n2|leaf|synonym|\n")
    (tmp_path / "other.txt").write_text("ignored\n")
    with tarfile.open(tpath, "w:gz") as tf:
        tf.add(tmp_path / "names.dmp", arcname="names.dmp")
        tf.add(tmp_path / "other.txt", arcname="other.txt")

    out = read_tar_members(str(tpath), suffix=".dmp", lines=True).to_pandas()
    assert out["member"].tolist() == ["names.dmp", "names.dmp"]
    assert out["line"].tolist()[0].startswith("1|root")

    whole = read_tar_members(str(tpath)).to_pandas()
    assert set(whole["member"]) == {"names.dmp", "other.txt"}


def test_read_xml_documents(tmp_path):
    from belb_ray.sources.readers import read_xml_documents

    x = tmp_path / "corpus.xml"
    x.write_text(
        "<collection><document id='d1'>"
        "<passage><offset>0</offset><text>Title here.</text></passage>"
        "<passage><offset>12</offset><text>Body text.</text></passage>"
        "</document><document id='d2'>"
        "<passage><offset>0</offset><text>Second doc.</text></passage>"
        "</document></collection>")
    out = read_xml_documents(str(x), "document",
                             field_tags=("text",)).to_pandas()
    assert out["attr_id"].tolist() == ["d1", "d2"]
    assert out.iloc[0]["text"] == "Title here."  # first <text> child
    assert "Body text." in out.iloc[0]["full_text"]


def _write_minimal_xlsx(path, header, rows):
    """Hand-built OOXML workbook: shared strings for str cells, inline
    <v> for numbers — the subset every real writer (openpyxl, pandas,
    Excel itself) emits."""
    import zipfile

    shared, sidx = [], {}

    def cell(ref, v):
        if v is None:
            return f'<c r="{ref}"/>'
        if isinstance(v, (int, float)):
            return f'<c r="{ref}"><v>{v}</v></c>'
        if v not in sidx:
            sidx[v] = len(shared)
            shared.append(v)
        return f'<c r="{ref}" t="s"><v>{sidx[v]}</v></c>'

    def row_xml(i, vals):
        cells = "".join(cell(f"{chr(65 + j)}{i}", v)
                        for j, v in enumerate(vals))
        return f'<row r="{i}">{cells}</row>'

    body = row_xml(1, header) + "".join(
        row_xml(i + 2, r) for i, r in enumerate(rows))
    ns = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("xl/worksheets/sheet1.xml",
                    f'<worksheet {ns}><sheetData>{body}</sheetData>'
                    f'</worksheet>')
        zf.writestr("xl/sharedStrings.xml",
                    f'<sst {ns}>' + "".join(
                        f"<si><t>{s}</t></si>" for s in shared) + "</sst>")


def test_read_excel_table_and_broadcast_join(tmp_path):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from belb_ray.sources.readers import read_excel_table
    from belb_ray.stages.joins import broadcast_join

    x = tmp_path / "mapping.xlsx"
    _write_minimal_xlsx(
        str(x), ["Uniprot", "NCBI gene", "score"],
        [["P05201", 2875, 0.5], ["P99999", 54205, 1.5],
         ["Q00001", 7157, None]])
    tbl = read_excel_table(str(x))
    assert tbl.column_names == ["Uniprot", "NCBI gene", "score"]
    assert tbl["Uniprot"].to_pylist() == ["P05201", "P99999", "Q00001"]
    assert tbl["NCBI gene"].type == "int64"
    assert tbl["score"].to_pylist() == [0.5, 1.5, None]
    # the reference's consumption shape: side table broadcast-joined
    left = rd.from_pandas(pd.DataFrame(
        {"Uniprot": ["P99999", "P05201", "P05201"],
         "n": np.arange(3, dtype=np.int64)}))
    side = rd.from_arrow(tbl.select(["Uniprot", "NCBI gene"]))
    out = (broadcast_join(left, side, "Uniprot").to_pandas()
           .sort_values("n").reset_index(drop=True))
    assert out["NCBI gene"].tolist() == [54205, 2875, 2875]


def test_read_pubtator(tmp_path):
    from belb_ray.sources.readers import read_pubtator

    p = tmp_path / "corpus.pubtator"
    p.write_text(
        "1001|t|Breast cancer risk.\n"
        "1001|a|BRCA1 mutations increase risk.\n"
        "1001\t0\t13\tBreast cancer\tDisease\tD001943\n"
        "1001\t20\t25\tBRCA1\tGene\t672\n"
        "\n"
        "1002|t|Second title.\n"
        "1002|a|Abstract two.\n"
        "1002\t0\t6\tSecond\tThing\tX:1|X:2\n"
        "\n")
    docs, anns = read_pubtator(str(p))
    d = docs.to_pandas().set_index("pmid")
    assert d.loc["1001", "title"] == "Breast cancer risk."
    assert d.loc["1002", "abstract"] == "Abstract two."
    a = anns.to_pandas()
    assert len(a) == 3
    assert a[a.pmid == "1001"]["text"].tolist() == ["Breast cancer", "BRCA1"]
    assert a[a.pmid == "1002"]["identifiers"].iloc[0] == "X:1|X:2"


def test_run_pipeline_chains_checkpoints_and_invalidation(tmp_path):
    from belb_ray.pipelines.checkpoint import read_manifest
    from belb_ray.pipelines.registry import (register_step, run_pipeline,
                                             unregister_step)

    calls = {"add": 0, "mul": 0}

    @register_step("p_add")
    def _make_add(cfg):
        k = int(cfg.get("k", 1))

        def step(ds):
            calls["add"] += 1
            return ds.map_batches(
                lambda t: pa.table({"v": pa.compute.add(t["v"],
                                                        pa.scalar(k))}),
                batch_format="pyarrow")

        return step

    @register_step("p_mul")
    def _make_mul(cfg):
        m = int(cfg.get("m", 2))

        def step(ds):
            calls["mul"] += 1
            return ds.map_batches(
                lambda t: pa.table({"v": pa.compute.multiply(
                    t["v"], pa.scalar(m))}),
                batch_format="pyarrow")

        return step

    try:
        ds = rd.from_arrow(pa.table({"v": [1, 2, 3]}))
        ck = str(tmp_path / "pk")
        spec = [("p_add", {"k": 10}), ("p_mul", {"m": 3})]

        out = run_pipeline(spec, ds, checkpoint_dir=ck)
        assert sorted(out.to_pandas()["v"]) == [33, 36, 39]
        assert calls == {"add": 1, "mul": 1}
        # per-step manifests exist, downstream records the upstream hash
        m0 = read_manifest(os.path.join(ck, "00-p_add"))
        m1 = read_manifest(os.path.join(ck, "01-p_mul"))
        assert m0 is not None and m1 is not None
        assert m1["lineage"]["upstream_hash"] == m0["config_hash"]

        # identical re-run: both steps load from shards, no recompute
        out2 = run_pipeline(spec, ds, checkpoint_dir=ck)
        assert sorted(out2.to_pandas()["v"]) == [33, 36, 39]
        assert calls == {"add": 1, "mul": 1}

        # editing the FIRST step's config invalidates BOTH checkpoints
        out3 = run_pipeline([("p_add", {"k": 20}), ("p_mul", {"m": 3})],
                            ds, checkpoint_dir=ck)
        assert sorted(out3.to_pandas()["v"]) == [63, 66, 69]
        assert calls == {"add": 2, "mul": 2}

        # uncheckpointed composition still works
        out4 = run_pipeline(spec, ds)
        assert sorted(out4.to_pandas()["v"]) == [33, 36, 39]
    finally:
        unregister_step("p_add")
        unregister_step("p_mul")
