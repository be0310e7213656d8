"""Training-data curation ops (stages/curation.py): chunking, sequence
packing, PII redaction, contamination flagging, repetition stats.

Each distributed stage is checked against an independent single-process
computation, including edge cases the sf fixture doesn't exercise (empty
text, actual PII hits, crafted repetition) and block-structure invariance
for the order-sensitive prefix-sum scan.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from belb_ray.stages.curation import (
    WORD_TOKEN_RE,
    chunk_documents,
    contamination_flags,
    pack_sequences,
    redact_pii,
    repetition_stats,
)


def _docs(rows: list[tuple[int, str]]) -> rd.Dataset:
    t = pa.table({"doc_id": pa.array([r[0] for r in rows], pa.int64()),
                  "text": pa.array([r[1] for r in rows], pa.string())})
    return rd.from_arrow(t).repartition(4)


def test_chunk_documents_windows_and_empty():
    rows = [(1, "abcdefghij"), (2, ""), (3, "xyz"), (4, "a" * 25)]
    out = (chunk_documents(_docs(rows), chunk_size=8, overlap=4)
           .to_pandas().sort_values(["doc_id", "chunk_idx"]))
    by = {k: g for k, g in out.groupby("doc_id")}
    # n=10, stride=4 -> starts 0,4,8
    assert list(by[1].chunk_text) == ["abcdefgh", "efghij", "ij"]
    assert list(by[1].chunk_start) == [0, 4, 8]
    # empty text -> exactly one empty chunk
    assert list(by[2].chunk_text) == [""] and list(by[2].chunk_len) == [0]
    assert list(by[3].chunk_text) == ["xyz"]
    # n=25 -> starts 0,4,...,24 (7 chunks); every char covered
    assert len(by[4]) == 7
    assert by[4].chunk_len.sum() >= 25
    # overlap invariant: consecutive chunks share `overlap` chars
    a, b = by[1].chunk_text.iloc[0], by[1].chunk_text.iloc[1]
    assert a[4:] == b[:4]


def test_pack_sequences_matches_local_cumsum():
    rng = np.random.default_rng(11)
    rows = [(int(i * 3 + 1), "tok " * int(rng.integers(0, 40)))
            for i in range(200)]
    rows[5] = (rows[5][0], "")  # zero-token doc
    out = (pack_sequences(_docs(rows), seq_len=16, bucket_width=13)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    # independent local scan in doc_id order
    loc = pd.DataFrame({"doc_id": [r[0] for r in rows],
                        "n": [len(WORD_TOKEN_RE.findall(r[1]))
                              for r in rows]}).sort_values("doc_id")
    start = np.concatenate([[0], loc.n.cumsum().to_numpy()[:-1]])
    assert list(out.doc_id) == list(loc.doc_id)
    assert list(out.start_token) == list(start)
    assert list(out.end_token) == list(start + loc.n.to_numpy())
    assert (out.first_seq == out.start_token // 16).all()
    nz = out.n_tokens > 0
    assert (out.last_seq[nz] == (out.end_token[nz] - 1) // 16).all()
    assert (out.last_seq[~nz] == out.first_seq[~nz]).all()
    # block-structure invariance: different partitioning, same offsets
    out2 = (pack_sequences(_docs(rows).repartition(9), seq_len=16,
                           bucket_width=64)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert list(out2.start_token) == list(out.start_token)


def test_redact_pii_hits_and_counts():
    rows = [
        (1, "mail bob@example.com or carol.x+1@sub.org today"),
        (2, "server at 10.0.12.7 port 80"),
        (3, "ssn 123-45-6789 phone +4915112345678"),
        (4, "clean text, nothing here"),
        (5, ""),
    ]
    out = redact_pii(_docs(rows)).to_pandas().set_index("doc_id")
    assert out.loc[1, "text_redacted"] == "mail <EMAIL> or <EMAIL> today"
    assert out.loc[1, "n_pii"] == 2
    assert out.loc[2, "text_redacted"] == "server at <IP> port 80"
    assert out.loc[3, "text_redacted"] == "ssn <ID> phone <PHONE>"
    assert out.loc[3, "n_pii"] == 2
    assert out.loc[4, "n_pii"] == 0
    assert out.loc[4, "text_redacted"] == rows[3][1]
    assert out.loc[5, "n_pii"] == 0


def test_contamination_flags_known_overlap():
    bench = ["the quick brown fox jumps", "pack my box with jugs"]
    rows = [
        (1, "he saw the quick brown fox run"),   # shares 2 distinct 3-grams
        (2, "Pack my BOX, with jugs!"),          # case/punct-insensitive hit
        (3, "completely unrelated words only"),
        (4, "fox quick the brown"),              # right words, wrong order
    ]
    out = (contamination_flags(_docs(rows), bench, n=3)
           .to_pandas().set_index("doc_id"))
    assert out.loc[1, "n_contaminated_ngrams"] == 2
    assert bool(out.loc[1, "contaminated"])
    assert out.loc[2, "n_contaminated_ngrams"] == 3
    assert not bool(out.loc[3, "contaminated"])
    assert not bool(out.loc[4, "contaminated"])


def test_repetition_stats_crafted():
    rows = [
        (1, "a\nb\na\n\nc"),          # 4 non-empty lines, 3 distinct
        (2, "go go go stop"),          # top word 3/4; bigrams: 2 dup of 3
        (3, ""),
        (4, "all distinct words here"),
    ]
    out = repetition_stats(_docs(rows)).to_pandas().set_index("doc_id")
    assert out.loc[1, "dup_line_frac"] == (4 - 3) / 4
    assert out.loc[2, "top_word_frac"] == 3 / 4
    # bigrams: "go go","go go","go stop" -> 3 total, 2 distinct
    assert out.loc[2, "dup_bigram_frac"] == (3 - 2) / 3
    assert (out.loc[3, ["dup_line_frac", "top_word_frac",
                        "dup_bigram_frac"]] == 0).all()
    assert out.loc[4, "dup_bigram_frac"] == 0.0
    assert out.loc[4, "top_word_frac"] == 1 / 4


def test_budget_select_matches_global_window_cut():
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from belb_ray.stages.curation import budget_select

    rng = np.random.default_rng(4)
    n = 300
    df = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "score": np.round(rng.random(n), 3),   # deliberate ties
        "w": rng.integers(1, 50, n).astype(np.int64)})
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(6)
    budget = int(df["w"].sum() * 0.3)

    got = sorted((r["doc_id"], r["w"], r["cum_weight"]) for r in
                 budget_select(ds, "score", "w", budget,
                               id_col="doc_id").take_all())
    o = df.sort_values(["score", "doc_id"],
                       ascending=[False, True], kind="mergesort")
    cum = o["w"].cumsum()
    keep = o[cum <= budget].assign(cum_weight=cum[cum <= budget])
    expect = sorted(zip(keep["doc_id"], keep["w"], keep["cum_weight"]))
    assert got == expect
    assert len(got) > 0 and max(c for _, _, c in got) <= budget


def test_budget_select_prunes_and_zero_budget():
    import pyarrow as pa
    import ray.data as rd

    from belb_ray.stages.curation import budget_select

    ds = rd.from_arrow(pa.table({
        "doc_id": [1, 2, 3], "score": [0.9, 0.5, 0.1],
        "w": [10, 10, 10]}))
    got = [(r["doc_id"], r["cum_weight"]) for r in
           budget_select(ds, "score", "w", budget=15,
                         id_col="doc_id").take_all()]
    assert got == [(1, 10)]
    assert budget_select(ds, "score", "w", budget=0,
                         id_col="doc_id").count() == 0
