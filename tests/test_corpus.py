"""Corpus-statistics ops (stages/corpus.py): n-gram counts, column
profiling, mixture sampling, inverted index — each vs an independent
local computation, with nulls / min_df / absent-source edge cases."""

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from belb_ray.stages.corpus import (
    GRAM_WORD_RE,
    inverted_index,
    mixture_sample,
    ngram_counts,
    profile_columns,
)
from belb_ray.stages.sampling import MD5_SPACE, _md5_hash60


def _docs(rows):
    t = pa.table({"doc_id": pa.array([r[0] for r in rows], pa.int64()),
                  "text": pa.array([r[1] for r in rows], pa.string())})
    return rd.from_arrow(t).repartition(4)


TEXTS = [
    (1, "the cat sat on the mat"),
    (2, "the cat ran"),
    (3, "a dog sat on the mat"),
    (4, ""),
    (5, "cat cat cat"),
]


def test_ngram_counts_vs_counter():
    out = ngram_counts(_docs(TEXTS), n=2).to_pandas()
    c = Counter()
    for _, t in TEXTS:
        w = GRAM_WORD_RE.findall(t.lower())
        c.update(" ".join(w[i:i + 2]) for i in range(len(w) - 1))
    got = dict(zip(out.gram, out.n_occurrences))
    assert got == dict(c)
    # top-k with deterministic tie-break (count desc, gram asc)
    top = ngram_counts(_docs(TEXTS), n=2, top_k=3).to_pandas()
    exp = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    assert list(zip(top.gram, top.n_occurrences)) == exp


def test_profile_columns_with_nulls():
    t = pa.table({
        "a": pa.array([1, 2, 2, None, 3], pa.int64()),
        "b": pa.array(["x", None, "x", None, "y"], pa.string()),
        "c": pa.array([1.5, 1.5, 1.5, 1.5, 1.5], pa.float64()),
    })
    ds = rd.from_arrow(t).repartition(3)
    out = (profile_columns(ds, ["a", "b", "c"])
           .to_pandas().set_index("col_name"))
    assert (out.n_rows == 5).all()
    assert out.loc["a", "n_nulls"] == 1 and out.loc["a", "n_distinct"] == 3
    assert out.loc["b", "n_nulls"] == 2 and out.loc["b", "n_distinct"] == 2
    assert out.loc["c", "n_nulls"] == 0 and out.loc["c", "n_distinct"] == 1


def test_mixture_sample_deterministic_and_drops_unknown():
    rows = [(i, f"src{i % 4}") for i in range(400)]
    t = pa.table({"doc_id": pa.array([r[0] for r in rows], pa.int64()),
                  "source": pa.array([r[1] for r in rows], pa.string())})
    ds = rd.from_arrow(t).repartition(5)
    weights = {"src0": 1.0, "src1": 0.5, "src2": 0.0}  # src3 absent
    out = mixture_sample(ds, "source", weights, key="doc_id",
                         seed=7).to_pandas()
    # independent local recompute of the md5-rate filter
    h = _md5_hash60(t["doc_id"], 7)
    cut = np.array([int(weights.get(s, 0) * MD5_SPACE)
                    for s in t["source"].to_pylist()], dtype=np.int64)
    exp_ids = t["doc_id"].to_numpy()[h < cut]
    assert sorted(out.doc_id) == sorted(exp_ids)
    assert set(out.source) <= {"src0", "src1"}
    assert (out.source == "src0").sum() == 100  # rate 1.0 keeps all
    # partition-independence
    out2 = mixture_sample(rd.from_arrow(t), "source", weights,
                          key="doc_id", seed=7).to_pandas()
    assert sorted(out2.doc_id) == sorted(out.doc_id)


def test_inverted_index_vs_local():
    out = inverted_index(_docs(TEXTS), min_df=1).to_pandas()
    local: dict[str, set] = {}
    for i, t in TEXTS:
        for w in set(GRAM_WORD_RE.findall(t.lower())):
            local.setdefault(w, set()).add(i)
    got = {r.term: list(r.postings) for r in out.itertuples()}
    assert got == {w: sorted(ids) for w, ids in local.items()}
    assert dict(zip(out.term, out.df)) == {w: len(v) for w, v in local.items()}
    # min_df prunes hapax terms
    out2 = inverted_index(_docs(TEXTS), min_df=2).to_pandas()
    assert set(out2.term) == {w for w, v in local.items() if len(v) >= 2}


def test_triangle_counts_vs_bruteforce():
    import itertools

    from belb_ray.stages.graph import cochain_edges, triangle_counts

    rng = np.random.default_rng(5)
    E = {(int(a), int(b)) for a, b in rng.integers(0, 30, (260, 2))}
    edges = pd.DataFrame(list(E), columns=["src", "dst"])
    out = triangle_counts(rd.from_pandas(edges).repartition(5)).to_pandas()
    und = {(min(a, b), max(a, b)) for a, b in E if a != b}
    adj: dict[int, set] = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    cnt: dict[int, int] = {}
    for a, b, c in itertools.combinations(sorted(adj), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            for v in (a, b, c):
                cnt[v] = cnt.get(v, 0) + 1
    assert dict(zip(out.vertex, out.n_triangles)) == cnt


def test_cochain_edges_adjacent_only():
    from belb_ray.stages.graph import cochain_edges

    df = pd.DataFrame({"g": ["x"] * 4 + ["y"] * 2 + ["z"],
                       "it": [3, 1, 7, 1, 5, 2, 9]})
    out = (cochain_edges(rd.from_pandas(df).repartition(3), ["g"], "it")
           .to_pandas())
    got = set(zip(out.a, out.b))
    # x: distinct sorted [1,3,7] -> (1,3),(3,7); y: [2,5] -> (2,5); z: none
    assert got == {(1, 3), (3, 7), (2, 5)}


def test_learn_bpe_matches_bruteforce():
    from collections import Counter

    import pyarrow as pa
    import ray.data as rd

    from belb_ray.stages.bpe import learn_bpe

    texts = ["low low low lower lowest", "new newer newest low",
             "aaa banana bandana", ""] * 3
    ds = rd.from_arrow(pa.table({"text": texts})).repartition(4)
    got = [(r["step"], r["left"], r["right"], r["n_occurrences"])
           for r in learn_bpe(ds, n_merges=8).sort("step").take_all()]

    # independent brute force (tuple-scan merges, Counter stats)
    wc = Counter(w for t in texts for w in t.split() if w)
    vocab = {tuple(list(w) + ["</w>"]): c for w, c in wc.items()}

    def merge_word(s, a, b):
        out, i = [], 0
        while i < len(s):
            if i < len(s) - 1 and s[i] == a and s[i + 1] == b:
                out.append(a + b); i += 2
            else:
                out.append(s[i]); i += 1
        return tuple(out)

    expect = []
    for step in range(1, 9):
        stats = Counter()
        for s, c in vocab.items():
            for i in range(len(s) - 1):
                stats[(s[i], s[i + 1])] += c
        (a, b), cnt = sorted(stats.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        expect.append((step, a, b, cnt))
        vocab = {merge_word(s, a, b): c for s, c in vocab.items()}

    assert got == expect
    # 'aaa' exercises overlapping-pair counting: ('a','a') counts twice
    # per occurrence, and the merge is left-to-right non-overlapping


def test_bpe_encode_matches_priority_bruteforce():
    import pyarrow as pa
    import ray.data as rd

    from belb_ray.stages.bpe import bpe_encode

    # hand-picked ranks: 'lo' learned before 'ow', so "low" encodes as
    # [lo, w, </w>] — priority order matters, not left-to-right scan
    merges = [("l", "o"), ("o", "w"), ("lo", "w"), ("w", "</w>")]
    docs = rd.from_arrow(pa.table({
        "doc_id": [0, 1, 2],
        "text": ["low lower owl", "wow", ""]}))
    got = {r["doc_id"]: (r["tokens"], r["n_tokens"])
           for r in bpe_encode(docs, merges).take_all()}
    # low: l,o,w,</w> -> rank1 (l,o) -> lo,w,</w> -> rank3 (lo,w)
    # -> low,</w> -> (low,</w>) unranked -> ['low','</w>'];
    # 'lower' and 'owl' follow ("lower" ends lo w er..., "owl" = ow l)
    assert got[0][0][:2] == ["low", "</w>"]
    # wow: w o w </w> -> rank2 'ow' merges FIRST occurrence scan:
    # w ow </w> -> rank4 (w,</w>)? syms are w,ow,</w> — no (w,</w>)
    # adjacency -> stuck -> ['w','ow','</w>']
    assert got[1][0] == ["w", "ow", "</w>"]
    assert got[2] == ([], 0)
    assert all(got[d][1] == len(got[d][0]) for d in got)


def test_rrf_fuse_matches_bruteforce_multiquery():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from belb_ray.stages.search import rrf_fuse

    rng = np.random.default_rng(5)
    rows_a, rows_b = [], []
    for q in range(4):
        docs = rng.permutation(30)[:12]
        for d in docs:
            rows_a.append((q, int(d), float(rng.integers(1, 100))))
        docs = rng.permutation(30)[:12]
        for d in docs:
            rows_b.append((q, int(d), float(rng.integers(1, 100))))
    a = rd.from_arrow(pa.table({
        "q": [r[0] for r in rows_a], "doc": [r[1] for r in rows_a],
        "s": [r[2] for r in rows_a]})).repartition(3)
    b = rd.from_arrow(pa.table({
        "q": [r[0] for r in rows_b], "doc": [r[1] for r in rows_b],
        "s": [r[2] for r in rows_b]})).repartition(2)

    got = {(r["q"], r["doc"]): r["rrf_score"]
           for r in rrf_fuse([a, b], id_col="doc",
                             orders=[[("s", True), ("doc", False)]] * 2,
                             query_col="q", rrf_k=60).take_all()}

    expect = {}
    for rows, _src in ((rows_a, 0), (rows_b, 1)):
        byq = {}
        for q, d, s in rows:
            byq.setdefault(q, []).append((d, s))
        for q, lst in byq.items():
            lst.sort(key=lambda ds: (-ds[1], ds[0]))
            for rank, (d, _) in enumerate(lst, 1):
                expect[(q, d)] = expect.get((q, d), 0.0) + 1.0 / (60 + rank)
    expect = {k: round(v, 6) for k, v in expect.items()}
    assert got == expect


def test_rrf_fuse_top_k_and_absentees():
    import pyarrow as pa
    import ray.data as rd

    from belb_ray.stages.search import rrf_fuse

    a = rd.from_arrow(pa.table({"doc": [1, 2, 3], "s": [9.0, 5.0, 1.0]}))
    b = rd.from_arrow(pa.table({"doc": [2, 4], "s": [7.0, 3.0]}))
    got = sorted(((r["doc"], r["rrf_score"]) for r in
                  rrf_fuse([a, b], id_col="doc",
                           orders=[[("s", True), ("doc", False)]] * 2,
                           rrf_k=60, top_k=2).take_all()),
                 key=lambda t: -t[1])
    # doc 2: rank 2 in a, rank 1 in b -> 1/62 + 1/61 (the winner);
    # doc 1: rank 1 in a only -> 1/61
    assert [d for d, _ in got] == [2, 1]
    assert got[0][1] == round(1 / 62 + 1 / 61, 6)
    assert got[1][1] == round(1 / 61, 6)


def test_pq_roundtrip_and_block_invariance():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from belb_ray.stages.pq import _encode_mat, pq_encode, pq_search, pq_train

    rng = np.random.default_rng(3)
    n, d = 200, 16
    mat = rng.normal(size=(n, d))
    tbl = pa.table({"vec_id": pa.array(np.arange(n, dtype=np.int64)),
                    "embedding": pa.array(mat.tolist(),
                                          pa.list_(pa.float32()))})
    mat32 = np.array(tbl["embedding"].to_pylist(), dtype=np.float64)
    ds = rd.from_arrow(tbl).repartition(6)

    books = pq_train(ds, m=4, k=8, sample_mod=2)
    assert books.shape == (4, 8, 4)

    codes = {r["vec_id"]: r["code"]
             for r in pq_encode(ds, books).take_all()}
    expect_codes = _encode_mat(mat32, books)
    assert all(np.frombuffer(codes[i], np.uint8).tolist()
               == expect_codes[i].tolist() for i in range(n))

    queries = pa.table({"query_id": pa.array([0, 5], pa.int64()),
                        "embedding": tbl["embedding"].take(
                            pa.array([0, 5]))})
    got = [(r["query_id"], r["vec_id"], r["dist"]) for r in
           pq_search(pq_encode(ds, books), books, queries, k=3)
           .sort(["query_id", "dist", "vec_id"]).take_all()]

    # brute-force ADC over the same codes
    sub = 4
    expect = []
    for qi in (0, 5):
        q = mat32[qi]
        dist = np.zeros(n)
        for j in range(4):
            lut = (((q[j * sub:(j + 1) * sub])[None, :]
                    - books[j]) ** 2).sum(axis=1)
            dist += lut[expect_codes[:, j]]
        top = np.lexsort((np.arange(n), dist))[:3]
        expect += [(qi, int(i), round(float(dist[i]), 6)) for i in top]
    assert got == expect
    # the query's own code distance is (near-)minimal: it ranks first
    assert got[0][1] == 0 and expect[3][0] == 5


def test_psi_drift_matches_bruteforce():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from belb_ray.stages.drift import psi_drift

    rng = np.random.default_rng(9)
    a_vals = rng.normal(50, 10, 400)
    b_vals = rng.normal(60, 15, 300)  # shifted+widened: real drift
    a = rd.from_arrow(pa.table({"value": a_vals})).repartition(4)
    b = rd.from_arrow(pa.table({"value": b_vals})).repartition(3)
    got = {r["bin"]: (r["p_ref"], r["p_cand"], r["psi_contrib"])
           for r in psi_drift(a, b, "value", bin_width=10.0).take_all()}

    eps = 1e-6
    bins_a = np.floor(a_vals / 10.0).astype(np.int64)
    bins_b = np.floor(b_vals / 10.0).astype(np.int64)
    expect = {}
    for bn in sorted(set(bins_a) | set(bins_b)):
        p_a = (bins_a == bn).sum() / len(a_vals)
        p_b = (bins_b == bn).sum() / len(b_vals)
        ca, cb = max(p_a, eps), max(p_b, eps)
        expect[bn] = (round(p_a, 8), round(p_b, 8),
                      round((ca - cb) * np.log(ca / cb), 8))
    assert got == expect
    total = sum(c for _, _, c in got.values())
    assert total > 0.1  # drifted distributions score materially


def test_chi2_association_matches_scipy_formula():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from belb_ray.stages.drift import chi2_association

    rng = np.random.default_rng(2)
    a = rng.choice(["x", "y", "z"], 500)
    b = np.where((a == "x") & (rng.random(500) < 0.7), "p",
                 rng.choice(["p", "q"], 500))  # dependence
    ds = rd.from_arrow(pa.table({"a": a, "b": b})).repartition(5)
    rows = chi2_association(ds, "a", "b").take_all()
    got_stat = sum(r["chi2_contrib"] for r in rows)

    # scipy-formula brute force over the contingency table
    cats_a, cats_b = sorted(set(a)), sorted(set(b))
    obs = np.array([[(a[b == cb] == ca).sum() if False else
                     ((a == ca) & (b == cb)).sum()
                     for cb in cats_b] for ca in cats_a], dtype=np.float64)
    e = obs.sum(1, keepdims=True) * obs.sum(0, keepdims=True) / obs.sum()
    mask = obs > 0  # op emits observed cells only
    expect_stat = (((obs - e) ** 2 / e)[mask]).sum()
    assert abs(got_stat - expect_stat) < 1e-6
    assert len(rows) == int(mask.sum())
