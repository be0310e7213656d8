"""M11 passage assembly and M12 offset remap — reference semantics
(belb/preprocessing/data.py:582-616 and 313-362) on hand-built docs."""

import pyarrow as pa
import ray.data as rd

from belb_ray.stages.offsets import assemble_passages, remap_offsets


def test_assemble_passages_plus_one_whitespace():
    chunks = rd.from_arrow(pa.table({
        "doc_id": [1, 1, 1, 2],
        "chunk_idx": [0, 1, 2, 0],
        "passage_type": ["title", "body", "body", "title"],
        "text": ["abcde", "xy", "zzz", "q"],
    }))
    out = assemble_passages(chunks).to_pandas().sort_values(
        ["doc_id", "passage_id"]).reset_index(drop=True)
    # doc 1: offsets 0, 5+1=6, 6+2+1=9; doc 2 restarts at 0
    assert out["p_offset"].tolist() == [0, 6, 9, 0]
    assert out["p_len"].tolist() == [5, 2, 3, 1]
    assert out["passage_type"].tolist() == ["title", "body", "body", "title"]


def test_remap_offsets_sequential_scan_and_drops():
    # passage text: 'foo' occurs at 0 and 8; 'bar' at 4
    passages = rd.from_arrow(pa.table({
        "doc_id": [1], "passage_id": [0], "p_offset": [100],
        "text": ["foo bar foo baz"],
    }))
    anns = rd.from_arrow(pa.table({
        "doc_id": [1, 1, 1, 1],
        "passage_id": [0, 0, 0, 0],
        "ann_id": [1, 2, 3, 4],
        "text": ["foo", "foo", "bar", "zz"],
        "orig_start": [0, 1, 2, 3],
    }))
    out = remap_offsets(passages, anns).to_pandas().sort_values(
        "ann_id").reset_index(drop=True)
    # ann1 'foo'@0; ann2 'foo' searched from 3 -> @8; ann3 'bar'
    # searched from 11 -> NOT found again (dropped); ann4 absent.
    assert out["ann_id"].tolist() == [1, 2]
    assert out["start"].tolist() == [100, 108]
    assert out["end"].tolist() == [103, 111]


def test_remap_offsets_word_boundary():
    # 'bar' inside 'barbed' must not match; hyphen IS a boundary
    passages = rd.from_arrow(pa.table({
        "doc_id": [1], "passage_id": [0], "p_offset": [0],
        "text": ["barbed x-bar wire"],
    }))
    anns = rd.from_arrow(pa.table({
        "doc_id": [1], "passage_id": [0], "ann_id": [1],
        "text": ["bar"], "orig_start": [0],
    }))
    out = remap_offsets(passages, anns).to_pandas()
    assert out["start"].tolist() == [9] and out["end"].tolist() == [12]


def test_remap_offsets_slice_start_lookbehind():
    # reference searches text[last_match:]: a token starting exactly at
    # the previous match end can match even though, on the FULL text,
    # its (?<!\w) lookbehind would fail — the slice hides the char.
    # Here '-bar' at offset 3 is preceded by 'o' (a word char), but the
    # scan for it starts at 3 so the lookbehind sees string-start.
    passages = rd.from_arrow(pa.table({
        "doc_id": [1], "passage_id": [0], "p_offset": [0],
        "text": ["foo-bar baz"],
    }))
    anns = rd.from_arrow(pa.table({
        "doc_id": [1, 1], "passage_id": [0, 0], "ann_id": [1, 2],
        "text": ["foo", "-bar"], "orig_start": [0, 1],
    }))
    out = remap_offsets(passages, anns).to_pandas().sort_values(
        "ann_id").reset_index(drop=True)
    assert out["start"].tolist() == [0, 3]
    assert out["end"].tolist() == [3, 7]


def test_remap_offsets_unmatched_does_not_advance():
    # an unmatched annotation must not move last_match: 'ab' fails its
    # lookahead inside 'abcd', then 'cd' still scans from 0 and fails
    # its lookbehind — nothing is emitted
    passages = rd.from_arrow(pa.table({
        "doc_id": [1], "passage_id": [0], "p_offset": [0],
        "text": ["abcd efg"],
    }))
    anns = rd.from_arrow(pa.table({
        "doc_id": [1, 1], "passage_id": [0, 0], "ann_id": [1, 2],
        "text": ["ab", "cd"], "orig_start": [0, 1],
    }))
    out = remap_offsets(passages, anns).to_pandas()
    assert len(out) == 0


def test_remap_offsets_orphan_annotation_dropped():
    passages = rd.from_arrow(pa.table({
        "doc_id": [1], "passage_id": [0], "p_offset": [0],
        "text": ["foo"],
    }))
    anns = rd.from_arrow(pa.table({
        "doc_id": [1, 2], "passage_id": [0, 0], "ann_id": [1, 2],
        "text": ["foo", "foo"], "orig_start": [0, 0],
    }))
    out = remap_offsets(passages, anns).to_pandas()
    assert out["doc_id"].tolist() == [1]
