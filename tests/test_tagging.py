"""Dictionary mention tagging (stages/tagging.tag_mentions)."""

import pyarrow as pa
import ray.data as rd

from belb_ray.stages.tagging import tag_mentions


def _brute(docs: list[tuple[int, str]], names: dict[str, int]):
    """All space-bounded occurrences, by position scan (the SQL oracle's
    definition)."""
    out = []
    for doc_id, text in docs:
        for name, eid in names.items():
            ln = len(name)
            for s in range(len(text) - ln + 1):
                if text[s:s + ln] != name:
                    continue
                if s > 0 and text[s - 1] != " ":
                    continue
                e = s + ln
                if e < len(text) and text[e] != " ":
                    continue
                out.append((doc_id, s, e, name, eid))
    return sorted(out)


def _run(docs, names, **kw):
    ds = rd.from_arrow(pa.table({
        "doc_id": [d for d, _ in docs], "text": [t for _, t in docs]}))
    dict_tbl = pa.table({"mention": list(names), "entity_id": list(names.values())})
    out = tag_mentions(ds, dict_tbl, **kw).take_all()
    return sorted((r["doc_id"], r["start"], r["end"], r["mention"],
                   r["entity_id"]) for r in out)


def test_tag_mentions_matches_position_scan():
    docs = [
        (0, "alpha beta gamma alpha beta"),
        (1, "beta alphabet alpha alpha"),       # substring 'alpha' inside
                                                # 'alphabet' must NOT match
        (2, "gamma"),                           # whole-text match
        (3, ""),                                # empty text
        (4, "x alpha beta gamma y alpha"),
    ]
    names = {"alpha": 1, "beta": 2, "alpha beta": 3, "gamma": 4,
             "beta gamma": 5, "missing term": 9}
    assert _run(docs, names) == _brute(docs, names)


def test_tag_mentions_overlaps_and_offsets():
    docs = [(7, "a b a b a")]
    names = {"a b": 1, "b a": 2, "a": 3}
    got = _run(docs, names)
    assert got == _brute(docs, names)
    # overlapping bigrams are ALL reported: 'a b' at 0,4 and 'b a' at 2,6
    assert (7, 0, 3, "a b", 1) in got and (7, 2, 5, "b a", 2) in got
    assert (7, 4, 7, "a b", 1) in got and (7, 6, 9, "b a", 2) in got
    # end is exclusive char offset
    assert all(e - s == len(m) for _, s, e, m, _ in got)


def test_tag_mentions_trigrams_and_block_invariance():
    docs = [(i, f"u v w q{i} u v w") for i in range(20)]
    names = {"u v w": 1, "v w": 2}
    expect = _brute(docs, names)
    ds = rd.from_arrow(pa.table({
        "doc_id": [d for d, _ in docs],
        "text": [t for _, t in docs]})).repartition(7)
    dict_tbl = pa.table({"mention": list(names),
                         "entity_id": list(names.values())})
    got = sorted((r["doc_id"], r["start"], r["end"], r["mention"],
                  r["entity_id"])
                 for r in tag_mentions(ds, dict_tbl).take_all())
    assert got == expect


def test_mention_contexts_clamped_windows():
    import pyarrow as pa
    import ray.data as rd

    from belb_ray.stages.tagging import mention_contexts, tag_mentions

    docs_rows = [(0, "aa bb cc dd ee"), (1, "bb")]
    docs = rd.from_arrow(pa.table({
        "doc_id": [d for d, _ in docs_rows],
        "text": [t for _, t in docs_rows]}))
    dict_tbl = pa.table({"mention": ["bb", "dd"], "entity_id": [1, 2]})
    spans = tag_mentions(docs, dict_tbl)
    got = {(r["doc_id"], r["start"], r["mention"]): r["context"]
           for r in mention_contexts(spans, docs, window=4,
                                     num_buckets=2).take_all()}
    # exact values per the definition text[max(0,s-4):e+4]
    text0 = "aa bb cc dd ee"
    assert got[(0, 3, "bb")] == text0[0:9]    # left edge clamped
    assert got[(0, 9, "dd")] == text0[5:15]   # right edge clamped by slice
    assert got[(1, 0, "bb")] == "bb"          # both edges clamped


def test_tag_mentions_property_random_docs():
    """Property test: the vectorized token-n-gram tagger equals the
    position-scan definition on randomized corpora (including repeated
    tokens, empty docs, unmatched names)."""
    import numpy as np

    rng = np.random.default_rng(123)
    vocab = ["aa", "b", "ccc", "dd", "e"]
    for trial in range(5):
        docs = []
        for d in range(12):
            n = int(rng.integers(0, 9))
            docs.append((d, " ".join(rng.choice(vocab, n))))
        names = {}
        eid = 0
        for n_words in (1, 2):
            for _ in range(3):
                name = " ".join(rng.choice(vocab, n_words))
                if name not in names:
                    names[name] = eid
                    eid += 1
        names["zz never"] = 99
        assert _run(docs, names) == _brute(docs, names), f"trial {trial}"
