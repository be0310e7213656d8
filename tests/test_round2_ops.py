"""Round-2 operators: as-of join, grouped top-k, BM25 search, semantic
dedup, HLL count-distinct, Misra-Gries heavy hitters.

Each test checks the distributed stage against an independent
single-process computation (pandas / numpy brute force) on small inputs,
plus block-structure invariance where the cut is order-sensitive.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from belb_ray.stages.agg import grouped_topk
from belb_ray.stages.asof import asof_join
from belb_ray.stages.search import bm25_topk, _tokenize
from belb_ray.stages.semdedup import semantic_dedup


def _asof_frames(seed=7, n_left=200, n_right=80, n_keys=9):
    rng = np.random.default_rng(seed)
    base = pd.Timestamp("2024-01-01")
    left = pd.DataFrame({
        "uid": rng.integers(0, n_keys, n_left),
        "ts": base + pd.to_timedelta(rng.integers(0, 10_000, n_left), unit="s"),
        "lv": rng.normal(size=n_left),
    })
    right = pd.DataFrame({
        "uid": rng.integers(0, n_keys, n_right),
        "ts": base + pd.to_timedelta(rng.integers(0, 10_000, n_right), unit="s"),
        "rv": rng.normal(size=n_right),
    })
    # merge_asof right side must be unique per (uid, ts); so must ours
    right = right.drop_duplicates(["uid", "ts"])
    left = left.drop_duplicates(["uid", "ts"])
    return left, right


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    return (df.sort_values(list(df.columns))
              .reset_index(drop=True))


def test_asof_join_matches_pandas_inner_and_left():
    left, right = _asof_frames()
    lds = rd.from_pandas(left).repartition(5)
    rds = rd.from_pandas(right).repartition(3)

    expect = pd.merge_asof(
        left.sort_values("ts"), right.sort_values("ts").rename(
            columns={"ts": "ts_r"}),
        left_on="ts", right_on="ts_r", by="uid", direction="backward")

    got_left = asof_join(lds, rds, key="uid", ts="ts", inner=False,
                         num_buckets=4).to_pandas()
    cols = ["uid", "ts", "lv", "ts_r", "rv"]
    pd.testing.assert_frame_equal(_norm(got_left[cols]), _norm(expect[cols]))

    got_inner = asof_join(lds, rds, key="uid", ts="ts", inner=True,
                          num_buckets=4).to_pandas()
    exp_inner = expect[expect["ts_r"].notna()]
    pd.testing.assert_frame_equal(_norm(got_inner[cols]),
                                  _norm(exp_inner[cols]))


def test_asof_join_tolerance_and_exact_match():
    left, right = _asof_frames(seed=3)
    # plant an exact-timestamp match to pin allow_exact_matches=True
    right = pd.concat([right, left.iloc[[0]][["uid", "ts"]].assign(rv=99.0)],
                      ignore_index=True).drop_duplicates(["uid", "ts"])
    lds, rds = rd.from_pandas(left), rd.from_pandas(right)
    tol = pd.Timedelta(seconds=600)
    got = asof_join(lds, rds, key="uid", ts="ts", tolerance=tol,
                    inner=False, num_buckets=4).to_pandas()
    expect = pd.merge_asof(
        left.sort_values("ts"),
        right.sort_values("ts").rename(columns={"ts": "ts_r"}),
        left_on="ts", right_on="ts_r", by="uid",
        direction="backward", tolerance=tol)
    cols = ["uid", "ts", "lv", "ts_r", "rv"]
    pd.testing.assert_frame_equal(_norm(got[cols]), _norm(expect[cols]))
    planted = got[(got["uid"] == left.iloc[0]["uid"])
                  & (got["ts"] == left.iloc[0]["ts"])]
    assert (planted["rv"] == 99.0).all()


def test_grouped_topk_matches_pandas():
    rng = np.random.default_rng(11)
    df = pd.DataFrame({
        "g": rng.integers(0, 23, 600),
        "x": rng.integers(0, 50, 600).astype(float),
        "id": np.arange(600),
    })
    got = grouped_topk(rd.from_pandas(df).repartition(7), keys=["g"],
                       order_col="x", k=3, descending=True,
                       tiebreak="id").to_pandas()
    expect = (df.sort_values(["x", "id"], ascending=[False, True])
                .groupby("g", sort=False).head(3))
    pd.testing.assert_frame_equal(_norm(got[["g", "x", "id"]]),
                                  _norm(expect[["g", "x", "id"]]))
    # ascending variant
    got_a = grouped_topk(rd.from_pandas(df).repartition(7), keys=["g"],
                         order_col="x", k=2, descending=False,
                         tiebreak="id").to_pandas()
    exp_a = (df.sort_values(["x", "id"], ascending=[True, True])
               .groupby("g", sort=False).head(2))
    pd.testing.assert_frame_equal(_norm(got_a[["g", "x", "id"]]),
                                  _norm(exp_a[["g", "x", "id"]]))


def _bm25_reference(texts, ids, terms, k, k1=1.2, b=0.75):
    toks = [_tokenize(t) for t in texts]
    n = float(len(texts))
    dl = np.array([float(len(t)) for t in toks])
    avgdl = dl.sum() / n
    rows = []
    for term in terms:
        df = float(sum(1 for t in toks if term in set(t)))
        idf = np.log((n - df + 0.5) / (df + 0.5) + 1.0)
        tf = np.array([float(t.count(term)) for t in toks])
        rows.append(idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl)))
    score = np.zeros(len(texts))
    for r in rows:
        score = score + r
    out = pd.DataFrame({"doc_id": ids, "score": np.round(score, 4)})
    return (out.sort_values(["score", "doc_id"], ascending=[False, True])
               .head(k).reset_index(drop=True))


def test_bm25_topk_matches_reference_and_block_invariant():
    rng = np.random.default_rng(5)
    vocab = ["hash", "join", "window", "scan", "table", "row", "agg", "sort"]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(3, 30)))
             for _ in range(300)]
    ids = list(range(300))
    df = pd.DataFrame({"doc_id": ids, "text": texts})
    terms = ["hash", "window"]
    expect = _bm25_reference(texts, ids, terms, k=15)
    for nparts in (1, 6):
        ds = rd.from_pandas(df).repartition(nparts)
        got = bm25_topk(ds, terms, k=15).to_pandas().reset_index(drop=True)
        pd.testing.assert_frame_equal(got[["doc_id", "score"]], expect)
    assert (expect["score"] > 0).any()


def test_bm25_topk_empty_corpus():
    ds = rd.from_arrow(pa.table({"doc_id": pa.array([], pa.int64()),
                                 "text": pa.array([], pa.string())}))
    out = bm25_topk(ds, ["hash"], k=5)
    assert out.count() == 0
    # schema survives at the Dataset layer (to_pandas drops it when empty)
    assert set(out.schema().names) == {"doc_id", "score"}


def _semdedup_reference(ids, mat, cells, threshold):
    """Brute-force per-cell dup rule: smallest earlier id with sim>=thr."""
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    dup_of = {}
    for c in np.unique(cells):
        sel = np.where(cells == c)[0]
        order = sel[np.argsort(ids[sel])]
        for pos, i in enumerate(order):
            match = -1
            for j in order[:pos]:
                if float(mat[i] @ mat[j]) >= threshold:
                    match = int(ids[j])
                    break
            dup_of[int(ids[i])] = match
    return dup_of


def test_semantic_dedup_matches_bruteforce():
    rng = np.random.default_rng(19)
    n, d = 240, 16
    base = rng.normal(size=(n, d))
    # plant near-dup pairs: rows 2i+1 close to 2i for first 40 rows
    for i in range(0, 40, 2):
        base[i + 1] = base[i] + rng.normal(scale=0.01, size=d)
    ids = np.arange(n, dtype=np.int64)
    tbl = pa.table({
        "vec_id": pa.array(ids),
        "embedding": pa.array([list(map(float, r)) for r in base],
                              pa.list_(pa.float32())),
    })
    ds = rd.from_arrow(tbl).repartition(5)
    got = semantic_dedup(ds, n_cells=6, threshold=0.9,
                         sample_mod=3).to_pandas().sort_values("vec_id")
    assert len(got) == n
    # re-derive the expectation from the cells the stage assigned
    # (centroid training is shared; the dup rule is what we verify)
    mat = np.asarray(base, dtype=np.float64)
    cells = got.sort_values("vec_id")["cell"].to_numpy()
    expect = _semdedup_reference(ids, mat, cells, threshold=0.9)
    for _, row in got.iterrows():
        assert expect[int(row["vec_id"])] == int(row["dup_of"])
    assert ((got["dup_of"] != -1) == got["is_dup"]).all()
    assert got["is_dup"].sum() >= 15  # planted dups detected


def test_semantic_dedup_block_invariant():
    rng = np.random.default_rng(23)
    n, d = 120, 8
    base = rng.normal(size=(n, d))
    tbl = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array([list(map(float, r)) for r in base],
                              pa.list_(pa.float32())),
    })
    outs = []
    for nparts in (1, 4):
        ds = rd.from_arrow(tbl).repartition(nparts)
        outs.append(semantic_dedup(ds, n_cells=4, threshold=0.8,
                                   sample_mod=2)
                    .to_pandas().sort_values("vec_id")
                    .reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_hll_sketch_accuracy_and_block_invariance():
    from belb_ray.stages.sketch import _rho_of, hll_estimate, hll_sketch
    from belb_ray.stages.sampling import _md5_hash60

    rng = np.random.default_rng(31)
    n, m = 4000, 512  # p=9
    df = pd.DataFrame({
        "g": np.where(np.arange(n) % 2 == 0, "a", "b"),
        "v": rng.integers(0, 1200, n),
    })
    outs = []
    for nparts in (1, 6):
        ds = rd.from_pandas(df).repartition(nparts)
        outs.append(hll_sketch(ds, "g", "v", p=9).to_pandas()
                    .sort_values("g").reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])
    # independent single-process recompute of the registers + estimate
    for gval, sub in df.groupby("g"):
        hv = _md5_hash60(pa.array(sub["v"].to_numpy()), 0)
        idx, rho = _rho_of(hv, 9)
        regs = np.zeros(m, dtype=np.int64)
        np.maximum.at(regs, idx, rho)
        est = round(hll_estimate(regs), 2)
        row = outs[0][outs[0]["g"] == gval].iloc[0]
        assert row["approx_distinct"] == est
        exact = sub["v"].nunique()
        assert abs(est - exact) / exact < 0.15  # ~3 sigma at m=512


def test_heavy_hitters_exact_under_any_blocking():
    from belb_ray.stages.sketch import heavy_hitters

    rng = np.random.default_rng(37)
    # zipf-ish: few hot keys + long tail
    hot = np.repeat(["h0", "h1", "h2"], [900, 500, 260])
    tail = np.array([f"t{i}" for i in rng.integers(0, 2000, 3000)])
    keys = np.concatenate([hot, tail])
    rng.shuffle(keys)
    df = pd.DataFrame({"k": keys})
    phi = 0.05
    exact = df["k"].value_counts()
    expect = exact[exact > phi * len(df)].rename("cnt").reset_index()
    expect.columns = ["k", "cnt"]
    for nparts in (1, 3, 11):
        ds = rd.from_pandas(df).repartition(nparts)
        got = (heavy_hitters(ds, "k", phi=phi).to_pandas()
               .sort_values("k").reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got, expect.sort_values("k").reset_index(drop=True))


def test_misra_gries_candidate_superset():
    from belb_ray.stages.sketch import _misra_gries

    rng = np.random.default_rng(41)
    keys = np.concatenate([np.repeat("hot", 150),
                           rng.integers(0, 400, 850).astype(str)])
    rng.shuffle(keys)
    k = 20  # phi = 0.05
    mg = _misra_gries(keys, k)
    assert len(mg) <= k
    # every key with count > n/(k+1) must survive
    vc = pd.Series(keys).value_counts()
    for key, cnt in vc.items():
        if cnt > len(keys) / (k + 1):
            assert key in mg


def test_tfidf_top_terms_matches_bruteforce():
    from belb_ray.stages.tfidf import tfidf_top_terms, _TOKEN_RE

    rng = np.random.default_rng(13)
    vocab = [f"w{i}" for i in range(40)]
    docs = pd.DataFrame({
        "doc_id": np.arange(60),
        "text": [" ".join(rng.choice(vocab, rng.integers(3, 25)))
                 for _ in range(60)],
    })
    # independent single-process recompute
    rows = []
    for did, txt in zip(docs["doc_id"], docs["text"]):
        for tok in _TOKEN_RE.findall(txt.lower()):
            rows.append((did, tok))
    t = pd.DataFrame(rows, columns=["doc_id", "token"])
    tf = t.groupby(["doc_id", "token"]).size().rename("tf").reset_index()
    df_ = (t.drop_duplicates().groupby("token").size()
           .rename("df").reset_index())
    n = float(len(docs))
    m = tf.merge(df_, on="token")
    m["weight"] = np.round(
        m["tf"] * (np.log((1.0 + n) / (1.0 + m["df"])) + 1.0), 4)
    m = m.sort_values(["doc_id", "weight", "token"],
                      ascending=[True, False, True])
    expect = (m.groupby("doc_id").head(3)[["doc_id", "token", "weight"]]
              .reset_index(drop=True))
    for nparts in (1, 4):
        ds = rd.from_pandas(docs).repartition(nparts)
        got = tfidf_top_terms(ds, k=3).to_pandas()
        pd.testing.assert_frame_equal(_norm(got), _norm(expect),
                                      check_dtype=False)


def test_tfidf_join_path_matches_broadcast():
    from belb_ray.stages.tfidf import tfidf_top_terms

    docs = pd.DataFrame({
        "doc_id": np.arange(25),
        "text": [f"alpha beta w{i % 7} w{i % 3} gamma" for i in range(25)],
    })
    ds = rd.from_pandas(docs)
    a = tfidf_top_terms(ds, k=2).to_pandas()
    b = tfidf_top_terms(ds, k=2, broadcast_vocab_limit=0).to_pandas()
    pd.testing.assert_frame_equal(_norm(a), _norm(b), check_dtype=False)


def test_ordered_window_matches_pandas():
    from belb_ray.stages.analytic import ordered_window

    rng = np.random.default_rng(23)
    n = 400
    df = pd.DataFrame({
        "eid": np.arange(n),
        "k": rng.integers(0, 12, n),
        "v": np.round(rng.normal(size=n), 2),  # negative values too
    })
    g = df.sort_values(["k", "eid"], kind="stable").reset_index(drop=True)
    grp = g.groupby("k", sort=False)
    expect = g.copy()
    expect["prev"] = grp["v"].shift(1)
    expect["nxt"] = grp["v"].shift(-1)
    expect["cs"] = grp["v"].cumsum()
    expect["rn"] = grp.cumcount() + 1
    for nparts in (1, 5):
        ds = rd.from_pandas(df).repartition(nparts)
        got = ordered_window(
            ds, key="k", order_cols=["eid"],
            specs=[("lag", "v", "prev"), ("lead", "v", "nxt"),
                   ("cumsum", "v", "cs"), ("row_number", "", "rn")],
            num_buckets=7).to_pandas()
        pd.testing.assert_frame_equal(
            _norm(got[expect.columns]), _norm(expect), check_dtype=False)


def test_ordered_window_int_cumsum_stays_int():
    from belb_ray.stages.analytic import ordered_window

    df = pd.DataFrame({"eid": [0, 1, 2, 3], "k": [1, 1, 2, 2],
                       "c": np.array([5, -3, 7, 7], dtype=np.int64)})
    got = ordered_window(rd.from_pandas(df), key="k", order_cols=["eid"],
                         specs=[("cumsum", "c", "cs")]).to_pandas()
    assert got["cs"].dtype == np.int64
    got = got.sort_values("eid").reset_index(drop=True)
    assert got["cs"].tolist() == [5, 2, 7, 14]


def _brute_overlaps(ldf, rdf, key=None):
    m = ldf.merge(rdf, how="cross", suffixes=("", "_r"))
    keep = (m["s"] <= m["e_r"]) & (m["s_r"] <= m["e"])
    if key is not None:
        keep &= m[key] == m[f"{key}_r"]
    return m[keep].reset_index(drop=True)


def test_interval_join_matches_bruteforce():
    from belb_ray.stages.rangejoin import interval_join

    rng = np.random.default_rng(7)
    nl, nr = 300, 250
    ldf = pd.DataFrame({
        "lid": np.arange(nl),
        "k": rng.integers(0, 6, nl),
        "s": rng.integers(0, 5000, nl).astype(np.int64),
    })
    ldf["e"] = ldf["s"] + rng.integers(0, 400, nl)
    rdf = pd.DataFrame({
        "rid": np.arange(nr),
        "k": rng.integers(0, 6, nr),
        "s": rng.integers(0, 5000, nr).astype(np.int64),
    })
    rdf["e"] = rdf["s"] + rng.integers(0, 400, nr)

    for key in (None, "k"):
        want = _brute_overlaps(ldf, rdf, key)
        wset = set(zip(want["lid"], want["rid"]))
        for bw in (256, 1000, 10_000):  # bins smaller / similar / larger
            got = interval_join(
                rd.from_pandas(ldf).repartition(5),
                rd.from_pandas(rdf).repartition(3),
                "s", "e", "s", "e", key=key, bin_width=bw,
                num_buckets=9).to_pandas()
            gset = set(zip(got["lid"], got["rid"]))
            assert len(got) == len(gset), "duplicate pairs emitted"
            assert gset == wset, (key, bw, len(gset), len(wset))


def test_interval_join_timestamps_and_suffix():
    from belb_ray.stages.rangejoin import interval_join

    base = pd.Timestamp("2024-01-01")
    ldf = pd.DataFrame({
        "eid": [1, 2],
        "start": [base, base + pd.Timedelta(minutes=90)],
    })
    ldf["stop"] = ldf["start"] + pd.Timedelta(minutes=30)
    rdf = pd.DataFrame({
        "eid": [10, 20, 30],
        "start": [base + pd.Timedelta(minutes=t) for t in (15, 50, 100)],
    })
    rdf["stop"] = rdf["start"] + pd.Timedelta(minutes=10)
    got = interval_join(rd.from_pandas(ldf), rd.from_pandas(rdf),
                        "start", "stop", "start", "stop").to_pandas()
    pairs = sorted(zip(got["eid"], got["eid_r"]))
    assert pairs == [(1, 10), (2, 30)]
    assert got["eid"].dtype == np.int64 and got["eid_r"].dtype == np.int64


def test_ordered_window_rolling_matches_pandas():
    from belb_ray.stages.analytic import ordered_window

    rng = np.random.default_rng(31)
    n = 500
    df = pd.DataFrame({
        "eid": np.arange(n),
        "k": rng.integers(0, 9, n),
        "c": rng.integers(-50, 50, n).astype(np.int64),
    })
    g = df.sort_values(["k", "eid"], kind="stable").reset_index(drop=True)
    grp = g.groupby("k", sort=False)["c"]
    expect = g.copy()
    expect["rs"] = grp.rolling(4, min_periods=1).sum().reset_index(drop=True).to_numpy().astype(np.int64)
    expect["rmin"] = grp.rolling(4, min_periods=1).min().reset_index(drop=True).to_numpy().astype(np.int64)
    expect["rmax"] = grp.rolling(4, min_periods=1).max().reset_index(drop=True).to_numpy().astype(np.int64)
    got = ordered_window(
        rd.from_pandas(df).repartition(6), key="k", order_cols=["eid"],
        specs=[("rollsum", "c", "rs", 4), ("rollmin", "c", "rmin", 4),
               ("rollmax", "c", "rmax", 4)], num_buckets=5).to_pandas()
    assert got["rs"].dtype == np.int64
    pd.testing.assert_frame_equal(
        _norm(got[expect.columns]), _norm(expect), check_dtype=False)


def test_grouped_quantiles_matches_bruteforce():
    import math

    from belb_ray.stages.analytic import grouped_quantiles

    rng = np.random.default_rng(41)
    n = 2000
    df = pd.DataFrame({
        "k": rng.integers(0, 7, n),
        "v": rng.integers(0, 40, n).astype(np.int64),  # heavy repeats
    })

    def brute(q):
        out = {}
        for k, grp in df.groupby("k"):
            s = np.sort(grp["v"].to_numpy())
            out[k] = s[max(math.ceil(q * len(s)) - 1, 0)]
        return out

    got = grouped_quantiles(
        rd.from_pandas(df).repartition(7), key="k", value_col="v",
        specs=[(0.25, "p25"), (0.5, "p50"), (0.75, "p75"),
               (0.0, "p0"), (1.0, "p100")],
        num_buckets=5).to_pandas().sort_values("k").reset_index(drop=True)
    for q, col in [(0.25, "p25"), (0.5, "p50"), (0.75, "p75"),
                   (0.0, "p0"), (1.0, "p100")]:
        want = brute(q)
        assert got[col].tolist() == [want[k] for k in got["k"]], col


def test_pivot_agg_counts_and_sums():
    from belb_ray.stages.agg import pivot_agg

    rng = np.random.default_rng(5)
    n = 1200
    df = pd.DataFrame({
        "day": rng.integers(0, 10, n),
        "kind": rng.choice(["a", "b", "c"], n),
        "amt": rng.integers(1, 100, n).astype(np.int64),
    })
    ds = rd.from_pandas(df).repartition(6)
    got = (pivot_agg(ds, "day", "kind", ["a", "b", "c"], agg="count",
                     prefix="n_").to_pandas()
           .sort_values("day").reset_index(drop=True))
    want = (df.groupby(["day", "kind"]).size().unstack(fill_value=0)
            .reindex(columns=["a", "b", "c"], fill_value=0))
    for k in ["a", "b", "c"]:
        assert got[f"n_{k}"].tolist() == want[k].tolist()

    got = (pivot_agg(ds, "day", "kind", ["a", "b"], value_col="amt",
                     agg="sum", prefix="s_").to_pandas()
           .sort_values("day").reset_index(drop=True))
    want = (df[df["kind"].isin(["a", "b"])]
            .groupby(["day", "kind"])["amt"].sum().unstack(fill_value=0))
    for k in ["a", "b"]:
        assert got[f"s_{k}"].tolist() == want[k].tolist()
    assert got["s_a"].dtype == np.int64


def test_ordered_window_rank_ntile_firstlast():
    from belb_ray.stages.analytic import ordered_window

    rng = np.random.default_rng(11)
    n = 2000
    df = pd.DataFrame({
        "k": rng.integers(0, 40, n),
        "v": rng.integers(0, 15, n).astype(np.int64),  # many ties
        "id": np.arange(n, dtype=np.int64),
    })
    ds = rd.from_pandas(df).repartition(7)
    got = (ordered_window(ds, "k", ["v", "id"],
                          [("rank", "v", "rnk"),
                           ("dense_rank", "v", "drnk"),
                           ("ntile", "", "t3", 3),
                           ("first_value", "id", "fv"),
                           ("last_value", "id", "lv")])
           .to_pandas().sort_values("id").reset_index(drop=True))

    want = df.sort_values(["k", "v", "id"]).copy()
    grp = want.groupby("k", sort=False)
    want["rnk"] = grp["v"].rank(method="min").astype(np.int64)
    want["drnk"] = grp["v"].rank(method="dense").astype(np.int64)
    want["fv"] = grp["id"].transform("first")
    want["lv"] = grp["id"].transform("last")

    def _ntile(g, ntiles):
        ln = len(g)
        q, r = divmod(ln, ntiles)
        out = np.empty(ln, dtype=np.int64)
        pos = 0
        for tile in range(1, ntiles + 1):
            size = q + (1 if tile <= r else 0)
            out[pos:pos + size] = tile
            pos += size
        return pd.Series(out, index=g.index)

    want["t3"] = grp["id"].apply(lambda g: _ntile(g, 3)).reset_index(
        level=0, drop=True)
    want = want.sort_values("id").reset_index(drop=True)
    for c in ["rnk", "drnk", "t3", "fv", "lv"]:
        assert got[c].tolist() == want[c].tolist(), c


def test_set_ops_match_pandas():
    from belb_ray.stages.setops import set_except, set_intersect

    rng = np.random.default_rng(11)
    a = pd.DataFrame({"k": rng.integers(0, 60, 300),
                      "g": rng.integers(0, 3, 300)})
    b = pd.DataFrame({"kk": rng.integers(30, 90, 250),
                      "gg": rng.integers(0, 3, 250)})
    da = rd.from_pandas(a).repartition(5)
    db = rd.from_pandas(b).repartition(4)

    got_ex = set_except(da, db, ["k", "g"], b_cols=["kk", "gg"],
                        num_buckets=7).to_pandas()
    got_in = set_intersect(da, db, ["k", "g"], b_cols=["kk", "gg"],
                           num_buckets=7).to_pandas()

    sa = set(map(tuple, a.drop_duplicates().itertuples(index=False)))
    sb = set(map(tuple, b.drop_duplicates().itertuples(index=False)))
    assert set(map(tuple, got_ex.itertuples(index=False))) == sa - sb
    assert set(map(tuple, got_in.itertuples(index=False))) == sa & sb
    # distinct semantics: no duplicate output rows
    assert not got_ex.duplicated().any() and not got_in.duplicated().any()


def test_mode_agg_deterministic_ties():
    from belb_ray.stages.agg import mode_agg

    # key 1: 'b' wins outright; key 2: tie between 'a' and 'c' -> 'a'
    df = pd.DataFrame({
        "k": [1, 1, 1, 2, 2, 2, 2, 3],
        "v": ["a", "b", "b", "c", "a", "c", "a", "z"],
    })
    got = (mode_agg(rd.from_pandas(df).repartition(4), ["k"], "v",
                    "modal", num_buckets=3)
           .to_pandas().sort_values("k").reset_index(drop=True))
    assert got["modal"].tolist() == ["b", "a", "z"]

    # fuzz vs pandas mode with the same tie-break
    rng = np.random.default_rng(5)
    big = pd.DataFrame({"k": rng.integers(0, 40, 2000),
                        "v": rng.choice(list("abcdef"), 2000)})
    got = (mode_agg(rd.from_pandas(big).repartition(6), ["k"], "v", "m")
           .to_pandas().sort_values("k").reset_index(drop=True))
    exp = (big.groupby(["k", "v"]).size().rename("n").reset_index()
           .sort_values(["n", "v"], ascending=[False, True], kind="mergesort")
           .groupby("k").head(1).sort_values("k").reset_index(drop=True))
    assert got["k"].tolist() == exp["k"].tolist()
    assert got["m"].tolist() == exp["v"].tolist()


def test_moment_stats_and_corr_match_pandas():
    from belb_ray.stages.agg import grouped_corr, moment_stats

    rng = np.random.default_rng(3)
    df = pd.DataFrame({"k": rng.integers(0, 25, 3000),
                       "x": rng.normal(50, 9, 3000),
                       "y": rng.normal(size=3000)})
    df["y"] = df["y"] + 0.3 * df["x"]  # induce correlation
    ds = rd.from_pandas(df).repartition(6)

    got = (moment_stats(ds, ["k"], "x").to_pandas()
           .sort_values("k").reset_index(drop=True))
    exp = df.groupby("k")["x"].agg(["size", "mean", "var", "std"])
    np.testing.assert_allclose(got["mean"], exp["mean"], rtol=1e-9)
    np.testing.assert_allclose(got["var"], exp["var"], rtol=1e-7)
    np.testing.assert_allclose(got["std"], exp["std"], rtol=1e-7)
    assert got["n"].tolist() == exp["size"].tolist()

    gotc = (grouped_corr(ds, ["k"], "x", "y").to_pandas()
            .sort_values("k").reset_index(drop=True))
    expc = df.groupby("k").apply(
        lambda g: g["x"].corr(g["y"]), include_groups=False)
    np.testing.assert_allclose(gotc["corr"], expc.values, rtol=1e-7)

    # zero-variance key -> NaN, not a crash
    const = pd.DataFrame({"k": [0] * 5, "x": [2.0] * 5,
                          "y": [1.0, 2, 3, 4, 5]})
    g0 = grouped_corr(rd.from_pandas(const), ["k"], "x", "y").to_pandas()
    assert np.isnan(g0["corr"].iloc[0])


def test_rollup_agg_levels_consistent():
    from belb_ray.stages.agg import rollup_agg

    rng = np.random.default_rng(9)
    df = pd.DataFrame({
        "a": rng.choice(["p", "q", "r"], 500),
        "b": rng.choice(["u", "v"], 500),
        "val": rng.integers(0, 100, 500).astype(np.int64),
    })
    got = rollup_agg(rd.from_pandas(df).repartition(5), ["a", "b"], [
        ("count", "", "n"), ("sum", "val", "s"),
    ]).to_pandas()

    finest = got[(got.a != "ALL") & (got.b != "ALL")]
    mid = got[(got.a != "ALL") & (got.b == "ALL")]
    total = got[(got.a == "ALL") & (got.b == "ALL")]
    exp = df.groupby(["a", "b"]).agg(n=("val", "size"), s=("val", "sum"))
    assert len(finest) == len(exp) and len(total) == 1
    m = finest.set_index(["a", "b"]).sort_index()
    pd.testing.assert_frame_equal(m[["n", "s"]], exp.sort_index(),
                                  check_dtype=False)
    # every level conserves totals
    assert finest.n.sum() == mid.n.sum() == total.n.iloc[0] == 500
    assert finest.s.sum() == mid.s.sum() == total.s.iloc[0] == df.val.sum()
    # mid level matches a direct groupby on 'a'
    expa = df.groupby("a").agg(n=("val", "size"), s=("val", "sum"))
    ma = mid.set_index("a").sort_index()
    pd.testing.assert_frame_equal(ma[["n", "s"]], expa.sort_index(),
                                  check_dtype=False)


def test_grouped_quantiles_interpolated_matches_numpy():
    from belb_ray.stages.analytic import grouped_quantiles

    rng = np.random.default_rng(21)
    df = pd.DataFrame({"k": rng.integers(0, 12, 4000),
                       "v": rng.normal(size=4000)})
    got = (grouped_quantiles(rd.from_pandas(df).repartition(7), "k", "v",
                             [(0.25, "p25"), (0.5, "p50"), (0.9, "p90")],
                             interpolate=True)
           .to_pandas().sort_values("k").reset_index(drop=True))
    for q, c in [(0.25, "p25"), (0.5, "p50"), (0.9, "p90")]:
        exp = df.groupby("k")["v"].quantile(q, interpolation="linear")
        np.testing.assert_allclose(got[c], exp.values, rtol=1e-12)

    # single-value keys: both brackets are the value itself
    one = pd.DataFrame({"k": [1, 2], "v": [3.5, -1.0]})
    g1 = (grouped_quantiles(rd.from_pandas(one), "k", "v",
                            [(0.5, "m")], interpolate=True)
          .to_pandas().sort_values("k"))
    assert g1["m"].tolist() == [3.5, -1.0]


def test_bloom_semi_join_exact_both_forms():
    from belb_ray.stages.joins import bloom_semi_join, semi_join

    rng = np.random.default_rng(17)
    big = pd.DataFrame({"k": rng.integers(0, 5000, 20000),
                        "payload": rng.normal(size=20000)})
    keys = pd.DataFrame({"k": rng.choice(5000, 400, replace=False)})
    dbig = rd.from_pandas(big).repartition(8)
    dkeys = rd.from_pandas(keys).repartition(3)

    for anti in (False, True):
        got = bloom_semi_join(
            dbig, dkeys, "k", anti=anti,
            broadcast_threshold=0,  # force the exact SHUFFLE path
        ).to_pandas().sort_values(["k", "payload"]).reset_index(drop=True)
        exp = semi_join(dbig, dkeys, "k", anti=anti).to_pandas() \
            .sort_values(["k", "payload"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, exp)

    # string keys exercise the keyed-hash path
    sbig = pd.DataFrame({"k": [f"id{i % 90}" for i in range(800)],
                         "v": range(800)})
    skeys = pd.DataFrame({"k": [f"id{i}" for i in range(0, 90, 3)]})
    got = bloom_semi_join(rd.from_pandas(sbig), rd.from_pandas(skeys),
                          "k").to_pandas()
    exp = sbig[sbig.k.isin(set(skeys.k))]
    assert sorted(got.v) == sorted(exp.v)


def test_bloom_filter_no_false_negatives():
    from belb_ray.stages.joins import _bloom_hashes, build_bloom_filter
    import pyarrow as pa_
    import ray as ray_

    keys = pd.DataFrame({"k": np.arange(1000, 3000)})
    ref, m, k = build_bloom_filter(rd.from_pandas(keys).repartition(4), "k")
    bm = ray_.get(ref)
    pos = _bloom_hashes(pa_.array(keys.k.to_numpy()), m, k)
    hit = (bm[pos >> 3] & np.left_shift(1, (pos & 7)).astype(np.uint8)
           ).astype(bool).all(axis=0)
    assert hit.all()  # every inserted key must test positive
    # FPR sanity on disjoint probes (~1% expected at 10 bits/key)
    probe = _bloom_hashes(pa_.array(np.arange(50_000, 60_000)), m, k)
    fp = (bm[probe >> 3] & np.left_shift(1, (probe & 7)).astype(np.uint8)
          ).astype(bool).all(axis=0).mean()
    assert fp < 0.05


def test_ordered_window_pctl_kinds_match_pandas():
    from belb_ray.stages.analytic import ordered_window

    rng = np.random.default_rng(13)
    n = 2000
    df = pd.DataFrame({
        "k": rng.integers(0, 40, n),
        "v": rng.integers(0, 15, n).astype(np.int64),  # many ties
        "id": np.arange(n, dtype=np.int64),
    })
    # some singleton partitions (percent_rank denom-0 edge)
    df.loc[df.index[:3], "k"] = [100, 101, 102]
    ds = rd.from_pandas(df).repartition(7)
    got = (ordered_window(ds, "k", ["v", "id"],
                          [("percent_rank", "v", "pr"),
                           ("cume_dist", "v", "cd"),
                           ("nth_value", "id", "n3", 3)])
           .to_pandas().sort_values("id").reset_index(drop=True))

    want = df.sort_values(["k", "v", "id"]).copy()
    grp = want.groupby("k", sort=False)
    sz = grp["v"].transform("size")
    rmin = grp["v"].rank(method="min")
    rmax = grp["v"].rank(method="max")
    want["pr"] = np.where(sz > 1, (rmin - 1) / np.maximum(sz - 1, 1), 0.0)
    want["cd"] = rmax / sz
    want["n3"] = grp["id"].transform(
        lambda g: g.iloc[2] if len(g) >= 3 else np.nan)
    want = want.sort_values("id").reset_index(drop=True)
    np.testing.assert_allclose(got["pr"], want["pr"], rtol=1e-12)
    np.testing.assert_allclose(got["cd"], want["cd"], rtol=1e-12)
    got_n3 = got["n3"].astype("float64").to_numpy(na_value=np.nan)
    np.testing.assert_array_equal(np.isnan(got_n3), want["n3"].isna())
    m = ~want["n3"].isna()
    np.testing.assert_array_equal(got_n3[m], want["n3"][m])


def test_cube_agg_all_grouping_sets():
    from belb_ray.stages.agg import cube_agg

    rng = np.random.default_rng(19)
    df = pd.DataFrame({
        "a": rng.choice(["p", "q", "r"], 600),
        "b": rng.choice(["u", "v"], 600),
        "val": rng.integers(0, 100, 600).astype(np.int64),
    })
    got = cube_agg(rd.from_pandas(df).repartition(5), ["a", "b"], [
        ("count", "", "n"), ("sum", "val", "s"),
    ]).to_pandas()

    fin = got[(got.a != "ALL") & (got.b != "ALL")]
    by_a = got[(got.a != "ALL") & (got.b == "ALL")]
    by_b = got[(got.a == "ALL") & (got.b != "ALL")]
    tot = got[(got.a == "ALL") & (got.b == "ALL")]
    assert len(got) == len(fin) + len(by_a) + len(by_b) + 1

    exp = df.groupby(["a", "b"]).agg(n=("val", "size"), s=("val", "sum"))
    pd.testing.assert_frame_equal(
        fin.set_index(["a", "b"]).sort_index()[["n", "s"]],
        exp.sort_index(), check_dtype=False)
    # the ROLLUP-missing set: group by b alone
    expb = df.groupby("b").agg(n=("val", "size"), s=("val", "sum"))
    pd.testing.assert_frame_equal(
        by_b.set_index("b").sort_index()[["n", "s"]],
        expb.sort_index(), check_dtype=False)
    expa = df.groupby("a").agg(n=("val", "size"), s=("val", "sum"))
    pd.testing.assert_frame_equal(
        by_a.set_index("a").sort_index()[["n", "s"]],
        expa.sort_index(), check_dtype=False)
    assert tot.n.iloc[0] == 600 and tot.s.iloc[0] == df.val.sum()


def test_grouped_string_agg_matches_pandas():
    from belb_ray.stages.analytic import grouped_string_agg

    rng = np.random.default_rng(23)
    n = 1500
    df = pd.DataFrame({
        "k": rng.integers(0, 60, n),
        "v": rng.choice(list("abcdef"), n),
        "ord": rng.permutation(n).astype(np.int64),
    })
    got = (grouped_string_agg(rd.from_pandas(df).repartition(6),
                              "k", "v", ["ord"], sep=",", out_col="path")
           .to_pandas().sort_values("k").reset_index(drop=True))
    exp = (df.sort_values(["k", "ord"], kind="stable")
           .groupby("k")["v"].agg(",".join).reset_index(name="path")
           .sort_values("k").reset_index(drop=True))
    assert got["k"].tolist() == exp["k"].tolist()
    assert got["path"].tolist() == exp["path"].tolist()


def test_grouping_sets_agg_matches_pandas():
    from belb_ray.stages.agg import grouping_sets_agg

    rng = np.random.default_rng(31)
    df = pd.DataFrame({
        "a": rng.choice(["p", "q", "r"], 600),
        "b": rng.choice(["u", "v"], 600),
        "val": rng.integers(0, 100, 600).astype(np.int64),
    })
    got = grouping_sets_agg(
        rd.from_pandas(df).repartition(5), ["a", "b"],
        [("a",), ("b",), ()],
        [("count", "", "n"), ("sum", "val", "s")]).to_pandas()

    by_a = got[(got.a != "ALL") & (got.b == "ALL")].set_index("a").sort_index()
    by_b = got[(got.a == "ALL") & (got.b != "ALL")].set_index("b").sort_index()
    total = got[(got.a == "ALL") & (got.b == "ALL")]
    # the finest (a,b) set was NOT requested and must not appear
    assert len(got) == len(by_a) + len(by_b) + len(total)
    pd.testing.assert_frame_equal(
        by_a[["n", "s"]],
        df.groupby("a").agg(n=("val", "size"), s=("val", "sum")).sort_index(),
        check_dtype=False)
    pd.testing.assert_frame_equal(
        by_b[["n", "s"]],
        df.groupby("b").agg(n=("val", "size"), s=("val", "sum")).sort_index(),
        check_dtype=False)
    assert total.n.iloc[0] == 600 and total.s.iloc[0] == df.val.sum()

    # duplicates collapse; finest set passes through the materialized level
    got2 = grouping_sets_agg(
        rd.from_pandas(df).repartition(3), ["a", "b"],
        [("a", "b"), ("b", "a")], [("count", "", "n")]).to_pandas()
    assert len(got2) == df.groupby(["a", "b"]).ngroups

    with pytest.raises(ValueError):
        grouping_sets_agg(rd.from_pandas(df), ["a"], [("zz",)],
                          [("count", "", "n")])


def test_higher_moment_stats_matches_scipy_formulas():
    from belb_ray.stages.agg import higher_moment_stats

    rng = np.random.default_rng(32)
    df = pd.DataFrame({"k": rng.integers(0, 8, 5000).astype(str),
                       "v": rng.exponential(50.0, 5000)})
    got = (higher_moment_stats(rd.from_pandas(df).repartition(9), ["k"], "v")
           .to_pandas().sort_values("k").reset_index(drop=True))
    for _, row in got.iterrows():
        x = df.loc[df.k == row.k, "v"].to_numpy()
        mu = x.mean()
        m2, m3, m4 = ((x - mu) ** 2).mean(), ((x - mu) ** 3).mean(), \
            ((x - mu) ** 4).mean()
        assert row.n == len(x)
        np.testing.assert_allclose(row["mean"], mu, rtol=1e-9)
        np.testing.assert_allclose(row["skew"], m3 / m2 ** 1.5, rtol=1e-6)
        np.testing.assert_allclose(row["kurt"], m4 / m2 ** 2 - 3, rtol=1e-6)


def test_unpivot_matches_pandas_melt():
    from belb_ray.stages.reshape import unpivot

    rng = np.random.default_rng(33)
    df = pd.DataFrame({"id": np.arange(200),
                       "x": rng.normal(size=200),
                       "y": rng.integers(0, 9, 200)})
    got = (unpivot(rd.from_pandas(df).repartition(4), ["id"], ["x", "y"])
           .to_pandas().sort_values(["id", "attribute"])
           .reset_index(drop=True))
    exp = (df.melt(id_vars="id", value_vars=["x", "y"],
                   var_name="attribute", value_name="value")
           .sort_values(["id", "attribute"]).reset_index(drop=True))
    exp["value"] = exp["value"].astype(np.float64)
    pd.testing.assert_frame_equal(got, exp)

    with pytest.raises(ValueError):
        unpivot(rd.from_pandas(df), ["id"], [])


def test_full_outer_hash_partition_join():
    from belb_ray.stages.joins import hash_partition_join

    left = pd.DataFrame({"k": [1, 2, 3, 4], "lv": ["a", "b", "c", "d"]})
    right = pd.DataFrame({"k": [3, 4, 5, 6], "rv": [30, 40, 50, 60]})
    got = (hash_partition_join(rd.from_pandas(left), rd.from_pandas(right),
                               key="k", num_buckets=4,
                               join_type="full outer")
           .to_pandas().sort_values("k").reset_index(drop=True))
    exp = (left.merge(right, on="k", how="outer")
           .sort_values("k").reset_index(drop=True))
    assert got.k.tolist() == exp.k.tolist()
    assert got.lv.fillna("-").tolist() == exp.lv.fillna("-").tolist()
    assert got.rv.fillna(-1).tolist() == exp.rv.fillna(-1).tolist()


def _bruteforce_dup_spans(df: pd.DataFrame, k: int, min_count: int = 2):
    from collections import Counter

    grams = []
    for _, r in df.iterrows():
        toks = r.text.split(" ")
        for i in range(len(toks) - k + 1):
            grams.append((r.doc_id, i, " ".join(toks[i:i + k])))
    counts = Counter(g for _, _, g in grams)
    marked = sorted((d, p) for d, p, g in grams if counts[g] >= min_count)
    spans = []
    for d, p in marked:
        if spans and spans[-1][0] == d and p <= spans[-1][2]:
            spans[-1][2] = p + k
            spans[-1][3] += 1
        else:
            spans.append([d, p, p + k, 1])
    return sorted(map(tuple, spans))


def test_duplicate_passage_spans_matches_bruteforce():
    from belb_ray.stages.dupspans import duplicate_passage_spans

    rng = np.random.default_rng(41)
    vocab = [f"w{i}" for i in range(40)]
    base = " ".join(rng.choice(vocab, 30))
    docs = []
    for d in range(30):
        words = list(rng.choice(vocab, 50))
        if d % 3 == 0:  # plant a shared passage
            ins = int(rng.integers(0, 40))
            words[ins:ins] = base.split(" ")[:12]
        docs.append((d, " ".join(words)))
    df = pd.DataFrame(docs, columns=["doc_id", "text"])

    got = (duplicate_passage_spans(
        rd.from_arrow(pa.Table.from_pandas(df)).repartition(6), k=5)
        .to_pandas())
    got_t = sorted(map(tuple, got[["doc_id", "tok_start", "tok_end",
                                   "n_dup_grams"]].itertuples(index=False)))
    assert got_t == _bruteforce_dup_spans(df, 5)
    assert len(got_t) >= 10  # the planted passages were found

    # block-structure invariance
    got2 = (duplicate_passage_spans(
        rd.from_arrow(pa.Table.from_pandas(df)).repartition(2), k=5)
        .to_pandas())
    assert sorted(map(tuple, got2[["doc_id", "tok_start", "tok_end",
                                   "n_dup_grams"]]
                      .itertuples(index=False))) == got_t


def test_duplicate_passage_spans_short_and_empty_docs():
    from belb_ray.stages.dupspans import duplicate_passage_spans

    df = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": ["", "a b", "x y z q r s t u", "x y z q r s t u"],
    })
    got = (duplicate_passage_spans(rd.from_arrow(pa.Table.from_pandas(df)),
                                   k=5).to_pandas()
           .sort_values(["doc_id"]).reset_index(drop=True))
    # docs 2 and 3 are identical 8-token docs: one maximal span each
    assert got.doc_id.tolist() == [2, 3]
    assert got.tok_start.tolist() == [0, 0]
    assert got.tok_end.tolist() == [8, 8]
    assert got.n_dup_grams.tolist() == [4, 4]


def test_cooccurrence_pairs_matches_bruteforce():
    from itertools import combinations

    from belb_ray.stages.cooccur import cooccurrence_pairs, cooccurrence_topk

    rng = np.random.default_rng(51)
    rows = []
    for g in range(120):
        for it in rng.choice(50, size=rng.integers(1, 8), replace=True):
            rows.append((g, int(it)))
    df = pd.DataFrame(rows, columns=["g", "it"])

    got = (cooccurrence_pairs(rd.from_pandas(df).repartition(7), "g", "it")
           .to_pandas())
    exp = sorted(
        p for g, sub in df.groupby("g")
        for p in combinations(sorted(set(sub["it"])), 2))
    assert sorted(map(tuple, got[["a", "b"]].itertuples(index=False))) == exp

    top = (cooccurrence_topk(rd.from_pandas(df).repartition(3), "g", "it",
                             k=10).to_pandas())
    from collections import Counter
    cnt = Counter(exp)
    exp_top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [((a, b), n) for (a, b), n in zip(
        map(tuple, top[["a", "b"]].itertuples(index=False)),
        top["n_groups"])] == exp_top


def test_cooccurrence_max_group_size_drops_whole_group():
    from belb_ray.stages.cooccur import cooccurrence_pairs

    df = pd.DataFrame({
        "g": [1] * 10 + [2, 2, 2],
        "it": list(range(10)) + [7, 8, 9],
    })
    got = (cooccurrence_pairs(rd.from_pandas(df), "g", "it",
                              max_group_size=5).to_pandas())
    # group 1 (10 items) dropped whole; group 2 contributes its 3 pairs
    assert sorted(map(tuple, got[["a", "b"]].itertuples(index=False))) == \
        [(7, 8), (7, 9), (8, 9)]


def test_grouped_mad_matches_pandas():
    from belb_ray.stages.analytic import grouped_mad

    rng = np.random.default_rng(61)
    df = pd.DataFrame({"k": rng.integers(0, 10, 3000),
                       "v": rng.normal(50, 9, 3000)})

    def disc_median(x):
        s = np.sort(np.asarray(x))
        return s[max(int(np.ceil(0.5 * len(s))) - 1, 0)]

    got = (grouped_mad(rd.from_pandas(df).repartition(6), "k", "v")
           .to_pandas().sort_values("k").reset_index(drop=True))
    exp = df.groupby("k")["v"].apply(
        lambda x: disc_median((x - disc_median(x)).abs()))
    np.testing.assert_allclose(got["mad"], exp.values, rtol=1e-12)

    # hash-join fallback path gives identical results
    got2 = (grouped_mad(rd.from_pandas(df).repartition(6), "k", "v",
                        broadcast_threshold=2)
            .to_pandas().sort_values("k").reset_index(drop=True))
    np.testing.assert_allclose(got2["mad"], exp.values, rtol=1e-12)


def test_normalize_by_group_matches_pandas():
    from belb_ray.stages.analytic import normalize_by_group

    rng = np.random.default_rng(62)
    df = pd.DataFrame({"id": np.arange(2000),
                       "k": rng.integers(0, 8, 2000),
                       "v": rng.exponential(5, 2000)})
    # one singleton group -> null z
    df.loc[len(df)] = [2000, 99, 3.3]
    got = (normalize_by_group(rd.from_pandas(df).repartition(5), "k", "v")
           .to_pandas().sort_values("id").reset_index(drop=True))
    exp = df.groupby("k")["v"].transform(
        lambda x: (x - x.mean()) / x.std(ddof=1))
    np.testing.assert_allclose(got["z"], exp.values, rtol=1e-9)
    assert np.isnan(got.loc[got.k == 99, "z"]).all()


def test_weighted_sample_per_group_properties():
    from belb_ray.stages.sampling import weighted_sample_per_group

    rng = np.random.default_rng(71)
    df = pd.DataFrame({
        "id": np.arange(4000),
        "g": rng.integers(0, 4, 4000),
        "w": np.where(np.arange(4000) % 100 == 0, 0.0,
                      rng.exponential(1.0, 4000)),
    })
    got = (weighted_sample_per_group(
        rd.from_arrow(pa.Table.from_pandas(df)).repartition(6),
        "g", "id", "w", k=7, seed=3).to_pandas())
    # exactly k per group, weight-0 rows never chosen
    assert (got.groupby("g").size() == 7).all()
    assert (df.set_index("id").loc[got.id, "w"] > 0).all()

    # deterministic under different blocking
    got2 = (weighted_sample_per_group(
        rd.from_arrow(pa.Table.from_pandas(df)).repartition(2),
        "g", "id", "w", k=7, seed=3).to_pandas())
    assert sorted(got.id) == sorted(got2.id)

    # selection is weight-biased: heavy rows picked far above uniform rate
    df2 = pd.DataFrame({"id": np.arange(2000), "g": 0,
                        "w": np.where(np.arange(2000) < 20, 1000.0, 0.001)})
    got3 = (weighted_sample_per_group(
        rd.from_arrow(pa.Table.from_pandas(df2)), "g", "id", "w",
        k=10, seed=5).to_pandas())
    assert (got3.id < 20).mean() > 0.8


def test_approx_grouped_quantiles_within_bin_width():
    from belb_ray.stages.analytic import approx_grouped_quantiles

    rng = np.random.default_rng(72)
    df = pd.DataFrame({"k": rng.integers(0, 6, 5000),
                       "v": rng.normal(100, 25, 5000)})
    bw = 2.0
    got = (approx_grouped_quantiles(rd.from_pandas(df).repartition(5),
                                    "k", "v", [(0.5, "p50")], bin_width=bw)
           .to_pandas().sort_values("k").reset_index(drop=True))
    exact = df.groupby("k")["v"].quantile(0.5).values
    assert (np.abs(got["p50"].values - exact) <= bw).all()

    import pytest as _pt
    with _pt.raises(ValueError):
        approx_grouped_quantiles(rd.from_pandas(df), "k", "v",
                                 [(0.5, "p50")], bin_width=0.0)


def test_json_field_and_regex_extract():
    from belb_ray.stages.semistructured import json_field, regex_extract

    df = pd.DataFrame({
        "id": [0, 1, 2, 3, 4],
        "js": ['{"k": 1, "s": "x"}', '{"k": 2}', 'not json', None,
               '{"other": 9}'],
        "txt": ["alpha beta", "gamma-1", "", "42 start", None],
    })
    ds = rd.from_arrow(pa.Table.from_pandas(df))
    got = json_field(ds, "js", "k").to_pandas().sort_values("id")
    assert got["k"].tolist() == ["1", "2", None, None, None]
    gi = (json_field(ds, "js", "k", out_col="ki", out_type=pa.int64())
          .to_pandas().sort_values("id"))
    assert gi["ki"].fillna(-1).tolist() == [1, 2, -1, -1, -1]

    gr = (regex_extract(ds, "txt", r"^([A-Za-z]+)", ["w"])
          .to_pandas().sort_values("id"))
    assert gr["w"].tolist() == ["alpha", "gamma", "", "", ""]

    import pytest as _pt
    with _pt.raises(Exception):
        regex_extract(ds, "txt", r"^([A-Za-z]+)", ["a", "b"]).to_pandas()


def test_pagerank_matches_power_iteration():
    from belb_ray.stages.graph import pagerank

    rng = np.random.default_rng(81)
    e = pd.DataFrame({"src": rng.integers(0, 25, 150),
                      "dst": rng.integers(0, 25, 150)})
    e = e[e.src != e.dst].drop_duplicates().reset_index(drop=True)
    # add a dangling node (in-edges only): node 99
    e.loc[len(e)] = [0, 99]

    got = (pagerank(rd.from_pandas(e).repartition(4), iters=3)
           .to_pandas().sort_values("node").reset_index(drop=True))

    nodes = sorted(set(e.src) | set(e.dst))
    idx = {n: i for i, n in enumerate(nodes)}
    N, d = len(nodes), 0.85
    deg = e.groupby("src").size()
    r = pd.Series(np.full(N, 1.0 / N), index=nodes)
    for _ in range(3):
        contrib = np.zeros(N)
        sh = r[e.src].to_numpy() / deg[e.src].to_numpy()
        for t, s in zip(e.dst, sh):
            contrib[idx[t]] += s
        r = pd.Series((1 - d) / N + d * contrib, index=nodes)

    assert got.node.tolist() == nodes
    np.testing.assert_allclose(got["rank"], r.values, rtol=1e-12)

    import pytest as _pt
    with _pt.raises(ValueError):
        pagerank(rd.from_pandas(e), iters=0)


def test_funnel_matches_bruteforce():
    from belb_ray.stages.funnel import funnel

    rng = np.random.default_rng(91)
    n = 3000
    df = pd.DataFrame({
        "u": rng.integers(0, 60, n),
        "t": pd.to_datetime("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 10**6, n), unit="s"),
        "e": rng.choice(["A", "B", "C", "X"], n, p=[.2, .2, .1, .5]),
    })
    steps = ["A", "B", "C"]
    got = (funnel(rd.from_pandas(df).repartition(6), "u", "e", "t", steps)
           .to_pandas().sort_values("u").reset_index(drop=True))

    exp_rows = []
    for u, g in df.groupby("u"):
        t_prev = g.loc[g.e == "A", "t"].min()
        if pd.isna(t_prev):
            continue
        t1, done, last = t_prev, 1, t_prev
        for s in steps[1:]:
            nxt = g.loc[(g.e == s) & (g.t >= t_prev), "t"].min()
            if pd.isna(nxt):
                break
            done += 1
            last = t_prev = nxt
        exp_rows.append((u, done, t1, last))
    exp = pd.DataFrame(exp_rows, columns=["u", "steps_completed",
                                          "t_first", "t_last"])
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    # within-window variant: chains longer than the window cut off
    got_w = (funnel(rd.from_pandas(df).repartition(3), "u", "e", "t",
                    steps, within=pd.Timedelta(days=1)).to_pandas())
    full = got_w[got_w.steps_completed == 3]
    assert ((full.t_last - full.t_first) <= pd.Timedelta(days=1)).all()
    # window can only reduce completion depth
    m = got.merge(got_w, on="u", suffixes=("", "_w"))
    assert (m.steps_completed_w <= m.steps_completed).all()


def test_equi_depth_buckets_balanced_and_boundary_ties():
    from belb_ray.stages.analytic import equi_depth_buckets

    rng = np.random.default_rng(101)
    df = pd.DataFrame({"v": rng.normal(0, 1, 10000)})
    got = (equi_depth_buckets(rd.from_pandas(df).repartition(8), "v", 10,
                              out_col="b").to_pandas())
    sizes = got.groupby("b").size()
    assert sorted(sizes.index) == list(range(1, 11))
    # near-balanced on continuous data
    assert sizes.min() > 800 and sizes.max() < 1200

    # boundary ties all collapse to the lower bucket deterministically
    df2 = pd.DataFrame({"v": np.repeat([1.0, 2.0, 3.0, 4.0], 100)})
    got2 = (equi_depth_buckets(rd.from_pandas(df2).repartition(4),
                               "v", 4, out_col="b").to_pandas())
    per_value = got2.groupby("v")["b"].nunique()
    assert (per_value == 1).all()

    import pytest as _pt
    with _pt.raises(ValueError):
        equi_depth_buckets(rd.from_pandas(df), "v", 1)


def test_lm_score_matches_bruteforce():
    import math
    from collections import Counter

    from belb_ray.stages.lm import lm_score

    rng = np.random.default_rng(111)
    vocab = [f"t{i}" for i in range(15)]
    docs = [(d, " ".join(rng.choice(vocab, rng.integers(1, 25))))
            for d in range(80)]
    docs.append((80, "solo"))      # 1 token: no bigrams, excluded
    docs.append((81, ""))          # split(' ') -> [''] : no bigrams
    df = pd.DataFrame(docs, columns=["doc_id", "text"])

    got = (lm_score(rd.from_arrow(pa.Table.from_pandas(df)).repartition(5))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))

    bgs = {d: list(zip(t.split(" "), t.split(" ")[1:]))
           for d, t in docs if len(t.split(" ")) > 1}
    c12 = Counter(b for lst in bgs.values() for b in lst)
    c1 = Counter()
    for (w1, _), c in c12.items():
        c1[w1] += c
    V = len(set(t for _, s in docs for t in s.split(" ")))
    assert set(got.doc_id) == set(bgs.keys())
    for _, row in got.iterrows():
        lst = bgs[row.doc_id]
        lp = [math.log((c12[b] + 1.0) / (c1[b[0]] + V)) for b in lst]
        assert row.n_bigrams == len(lst)
        np.testing.assert_allclose(row.logprob_mean,
                                   sum(lp) / len(lp), rtol=1e-12)

    # near-dup doc scores higher than a gibberish doc of the same length
    base = " ".join(rng.choice(vocab[:5], 30))
    df2 = pd.concat([df, pd.DataFrame({
        "doc_id": [100, 101, 102],
        "text": [base, base, " ".join(f"zz{i}" for i in range(30))],
    })], ignore_index=True)
    g2 = (lm_score(rd.from_arrow(pa.Table.from_pandas(df2)))
          .to_pandas().set_index("doc_id"))
    assert g2.loc[100, "logprob_mean"] > g2.loc[102, "logprob_mean"]


def test_dedup_against_state_across_runs(tmp_path):
    from belb_ray.stages.incremental import dedup_against_state

    state = str(tmp_path / "state")
    w1 = pd.DataFrame({"doc_id": [1, 2, 3, 4],
                       "text": ["aa", "bb", "cc", "bb"]})  # 4 dups 2
    got1 = (dedup_against_state(
        rd.from_arrow(pa.Table.from_pandas(w1)), state)
        .to_pandas().sort_values("doc_id"))
    assert got1.doc_id.tolist() == [1, 2, 3]  # keep-first within batch

    w2 = pd.DataFrame({"doc_id": [10, 11, 12, 13],
                       "text": ["cc", "dd", "dd", "ee"]})
    got2 = (dedup_against_state(
        rd.from_arrow(pa.Table.from_pandas(w2)), state)
        .to_pandas().sort_values("doc_id"))
    # 10 seen in run 1; 12 is a within-batch dup of 11
    assert got2.doc_id.tolist() == [11, 13]

    # third run: everything seen
    got3 = (dedup_against_state(
        rd.from_arrow(pa.Table.from_pandas(w2)), state)
        .to_pandas())
    assert len(got3) == 0
    # one shard per run that accepted rows (the empty third run adds none)
    import glob as _g
    assert len(_g.glob(str(tmp_path / "state" / "run-*"))) == 2

    # read-only probe: update_state=False leaves state untouched
    got4 = (dedup_against_state(
        rd.from_arrow(pa.Table.from_pandas(w1)), state,
        update_state=False).to_pandas())
    assert len(_g.glob(str(tmp_path / "state" / "run-*"))) == 2
    assert len(got4) == 0


def test_pca_project_matches_numpy_and_block_invariant():
    from belb_ray.stages.pca import explained_variance, pca_project

    rng = np.random.default_rng(121)
    d, n, k = 8, 600, 3
    # anisotropic data: known dominant directions
    basis = np.linalg.qr(rng.normal(size=(d, d)))[0]
    scales = np.array([10, 5, 2, 1, .5, .2, .1, .05])
    x = rng.normal(size=(n, d)) * scales @ basis.T + rng.normal(size=d)
    tbl = pa.table({"id": pa.array(np.arange(n)),
                    "v": pa.array(x.tolist(), pa.list_(pa.float64()))})

    got = (pca_project(rd.from_arrow(tbl).repartition(5), "v", k,
                       id_cols=["id"])
           .to_pandas().sort_values("id").reset_index(drop=True))

    cov = np.cov(x, rowvar=False, bias=True)
    _, vecs = np.linalg.eigh(cov)
    comp = vecs[:, ::-1][:, :k]
    flip = np.sign(comp[np.abs(comp).argmax(axis=0), np.arange(k)])
    comp = comp * flip
    exp = (x - x.mean(axis=0)) @ comp
    np.testing.assert_allclose(
        got[[f"pc{j+1}" for j in range(k)]].to_numpy(), exp, atol=1e-8)

    # block-structure invariance
    got2 = (pca_project(rd.from_arrow(tbl).repartition(2), "v", k,
                        id_cols=["id"])
            .to_pandas().sort_values("id").reset_index(drop=True))
    np.testing.assert_allclose(
        got2[[f"pc{j+1}" for j in range(k)]].to_numpy(),
        got[[f"pc{j+1}" for j in range(k)]].to_numpy(), atol=1e-10)

    ev = explained_variance(rd.from_arrow(tbl), "v")
    assert (np.diff(ev.eigenvalue) <= 1e-9).all()  # descending
    assert abs(ev.cum_explained_ratio.iloc[-1] - 1.0) < 1e-9
    # the top component dominates by construction
    assert ev.explained_ratio.iloc[0] > 0.5

    import pytest as _pt
    with _pt.raises(ValueError):
        pca_project(rd.from_arrow(tbl), "v", 99)


def test_neardup_against_state_across_runs(tmp_path):
    from belb_ray.stages.incremental import neardup_against_state

    rng = np.random.default_rng(131)
    vocab = [f"w{i}" for i in range(200)]

    def doc():
        return " ".join(rng.choice(vocab, 60))

    def mutate(s, k=3):
        w = s.split(" ")
        for i in rng.choice(len(w), k, replace=False):
            w[i] = str(rng.choice(vocab))
        return " ".join(w)

    state = str(tmp_path / "nd")
    base = [doc() for _ in range(20)]
    w1 = pd.DataFrame({"doc_id": range(20), "text": base})
    s1 = (neardup_against_state(
        rd.from_arrow(pa.Table.from_pandas(w1)), state).to_pandas())
    assert len(s1) == 20  # all distinct

    fresh = [doc() for _ in range(10)]
    w2_texts = ([mutate(base[i]) for i in range(10)] + fresh
                + [mutate(fresh[0])])
    w2 = pd.DataFrame({"doc_id": range(100, 100 + len(w2_texts)),
                       "text": w2_texts})
    s2 = (neardup_against_state(
        rd.from_arrow(pa.Table.from_pandas(w2)), state,
        ).to_pandas())
    # cross-run near-dups (100-109) and the in-batch near-dup (120)
    # dropped; the 10 fresh docs survive
    assert sorted(s2.doc_id) == list(range(110, 120))

    # third run: re-sending the fresh docs under new ids drops them all
    w3 = pd.DataFrame({"doc_id": range(200, 210), "text": fresh})
    s3 = (neardup_against_state(
        rd.from_arrow(pa.Table.from_pandas(w3)), state).to_pandas())
    assert len(s3) == 0


def test_collect_arrow_handles_pandas_blocks():
    from belb_ray.stages.joins import collect_arrow

    # pandas map_groups emits pandas blocks — incl. possibly EMPTY ones,
    # which to_arrow_refs hands back unconverted
    df = pd.DataFrame({"k": [1, 1, 2], "v": ["a", "b", "c"]})

    def _grp(g: pd.DataFrame) -> pd.DataFrame:
        return g if g.k.iloc[0] == 1 else g.iloc[:0]

    ds = (rd.from_pandas(df).groupby("k")
          .map_groups(_grp, batch_format="pandas"))
    tbl = collect_arrow(ds)
    assert tbl.num_rows == 2
    assert sorted(tbl["v"].to_pylist()) == ["a", "b"]


def test_grouped_entropy_matches_scipy_and_block_invariant():
    from belb_ray.stages.docstats import grouped_entropy

    rng = np.random.default_rng(141)
    df = pd.DataFrame({"k": rng.integers(0, 12, 6000),
                       "v": rng.choice(list("abcde"), 6000,
                                       p=[.4, .3, .15, .1, .05])})
    got = (grouped_entropy(rd.from_pandas(df).repartition(7), "k", "v")
           .to_pandas().sort_values("k").reset_index(drop=True))

    def ent(x):
        p = x.value_counts(normalize=True).to_numpy()
        return -(p * np.log(p)).sum()

    exp = df.groupby("k")["v"].apply(ent)
    np.testing.assert_allclose(got["entropy"], exp.values, rtol=1e-12)

    # single-value keys have zero entropy
    one = pd.DataFrame({"k": [1, 1, 2], "v": ["x", "x", "y"]})
    g1 = (grouped_entropy(rd.from_pandas(one), "k", "v")
          .to_pandas().sort_values("k"))
    np.testing.assert_allclose(g1["entropy"], [0.0, 0.0], atol=1e-12)


def test_stratified_hash_sample_rates_and_determinism():
    from belb_ray.stages.sampling import stratified_hash_sample

    rng = np.random.default_rng(142)
    df = pd.DataFrame({"id": np.arange(20000),
                       "g": rng.choice(["a", "b", "c"], 20000)})
    fr = {"a": 0.5, "b": 0.1}
    got = (stratified_hash_sample(
        rd.from_arrow(pa.Table.from_pandas(df)).repartition(6),
        "id", "g", fr, default_frac=0.0, seed=3).to_pandas())
    rates = got.groupby("g").size() / df.groupby("g").size()
    assert abs(rates.get("a", 0) - 0.5) < 0.03
    assert abs(rates.get("b", 0) - 0.1) < 0.02
    assert "c" not in set(got.g)  # default_frac=0 drops unlisted groups

    got2 = (stratified_hash_sample(
        rd.from_arrow(pa.Table.from_pandas(df)).repartition(2),
        "id", "g", fr, default_frac=0.0, seed=3).to_pandas())
    assert sorted(got.id) == sorted(got2.id)  # partition-independent


def test_winsorize_by_group_matches_pandas():
    from belb_ray.stages.analytic import winsorize_by_group

    rng = np.random.default_rng(151)
    df = pd.DataFrame({"k": rng.integers(0, 8, 4000),
                       "v": rng.standard_cauchy(4000)})

    def disc_q(x, q):
        s = np.sort(np.asarray(x))
        return s[max(int(np.ceil(q * len(s))) - 1, 0)]

    got = (winsorize_by_group(rd.from_pandas(df).repartition(5), "k", "v",
                              lo=0.05, hi=0.95, out_col="w")
           .to_pandas().sort_values(["k", "v"]).reset_index(drop=True))
    exp_rows = []
    for k, g in df.groupby("k"):
        qlo, qhi = disc_q(g.v, 0.05), disc_q(g.v, 0.95)
        for v in g.v:
            exp_rows.append((k, v, min(max(v, qlo), qhi)))
    exp = (pd.DataFrame(exp_rows, columns=["k", "v", "w"])
           .sort_values(["k", "v"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got[["k", "v", "w"]], exp,
                                  check_dtype=False)

    import pytest as _pt
    with _pt.raises(ValueError):
        winsorize_by_group(rd.from_pandas(df), "k", "v", lo=0.9, hi=0.1)


def test_set_union_and_cross_join():
    from belb_ray.stages.joins import cross_join
    from belb_ray.stages.setops import set_union

    a = pd.DataFrame({"k": [1, 2, 2, 3]})
    b = pd.DataFrame({"j": [3, 4, 4]})
    got = (set_union(rd.from_pandas(a), rd.from_pandas(b), ["k"],
                     b_cols=["j"]).to_pandas())
    assert sorted(got.k) == [1, 2, 3, 4]

    left = pd.DataFrame({"x": [1, 2, 3], "k": ["a", "b", "c"]})
    right = pa.table({"y": [10, 20], "k": ["p", "q"]})
    cj = (cross_join(rd.from_pandas(left).repartition(2), right)
          .to_pandas().sort_values(["x", "y"]).reset_index(drop=True))
    assert len(cj) == 6
    assert set(cj.columns) == {"x", "k", "y", "k_r"}
    assert cj.loc[0, ["x", "y"]].tolist() == [1, 10]
    exp = left.merge(right.to_pandas(), how="cross",
                     suffixes=("", "_r")).sort_values(
        ["x", "y"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(cj[exp.columns], exp)


def test_grouped_regression_matches_numpy_and_block_invariant():
    from belb_ray.stages.agg import grouped_regression

    rng = np.random.default_rng(11)
    n = 600
    df = pd.DataFrame({
        "k": rng.integers(0, 7, n),
        "x": rng.normal(100.0, 5.0, n),
    })
    df["y"] = 3.5 * df["x"] + rng.normal(0, 2.0, n)
    # one single-point key (zero x-variance → NULLs), one constant-y key
    df = pd.concat([df, pd.DataFrame({"k": [90, 91, 91, 91],
                                      "x": [1.0, 1.0, 2.0, 3.0],
                                      "y": [5.0, 7.0, 7.0, 7.0]})],
                   ignore_index=True)

    for nblocks in (1, 5):
        got = (grouped_regression(rd.from_pandas(df).repartition(nblocks),
                                  ["k"], "x", "y")
               .to_pandas().sort_values("k").reset_index(drop=True))
        for _, row in got.iterrows():
            sub = df[df.k == row.k]
            if sub.x.nunique() == 1:
                assert np.isnan(row.slope) and np.isnan(row.r2)
                continue
            slope, intercept = np.polyfit(sub.x, sub.y, 1)
            assert abs(row.slope - slope) < 1e-8
            assert abs(row.intercept - intercept) < 1e-6
            r = np.corrcoef(sub.x, sub.y)[0, 1]
            exp_r2 = 1.0 if sub.y.nunique() == 1 else r * r
            assert abs(row.r2 - exp_r2) < 1e-8


def test_cohort_retention_matches_bruteforce():
    from belb_ray.stages.cohort import cohort_retention

    rng = np.random.default_rng(3)
    n = 800
    df = pd.DataFrame({
        "user_id": rng.integers(0, 60, n),
        "ts": (pd.Timestamp("2024-01-01")
               + pd.to_timedelta(rng.integers(0, 90 * 86400, n), unit="s")),
    })
    got = (cohort_retention(rd.from_pandas(df).repartition(6),
                            "user_id", "ts")
           .to_pandas()
           .sort_values(["cohort_period", "period_offset"])
           .reset_index(drop=True))

    # brute force
    week = (df.ts.astype("int64") // 10**9 + 259200) // 604800
    a = pd.DataFrame({"u": df.user_id, "w": week}).drop_duplicates()
    first = a.groupby("u").w.transform("min")
    cells = pd.DataFrame({"cohort_period": first,
                          "period_offset": a.w - first})
    exp = (cells.groupby(["cohort_period", "period_offset"])
           .size().rename("n_users").reset_index()
           .sort_values(["cohort_period", "period_offset"])
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # offset-0 row exists for every cohort and equals the cohort size
    zero = got[got.period_offset == 0]
    sizes = a.groupby("u").w.min().value_counts()
    for _, r in zero.iterrows():
        assert r.n_users == sizes[r.cohort_period]


def test_keyed_diff_classifies_and_lists_changed_cols():
    from belb_ray.stages.setops import keyed_diff

    old = pd.DataFrame({"id": [1, 2, 3, 4, 5],
                        "a": [1.0, 2.0, 3.0, 4.0, np.nan],
                        "b": ["x", "y", "z", "w", "v"]})
    new = pd.DataFrame({"id": [2, 3, 4, 5, 6],
                        "a": [2.0, 30.0, 4.0, np.nan, 6.0],
                        "b": ["y", "z", "W", "v", "u"]})
    got = (keyed_diff(rd.from_pandas(old).repartition(2),
                      rd.from_pandas(new).repartition(3),
                      ["id"], ["a", "b"])
           .to_pandas().sort_values("id").reset_index(drop=True))
    by_id = {int(r.id): (r.status, r.changed_cols)
             for _, r in got.iterrows()}
    assert by_id == {
        1: ("removed", ""),
        3: ("changed", "a"),
        4: ("changed", "b"),
        6: ("added", ""),
    }  # id 2 unchanged, id 5 NaN==NaN → unchanged


def test_resample_ffill_matches_bruteforce_and_block_invariant():
    from belb_ray.stages.resample import resample_ffill

    rng = np.random.default_rng(11)
    n = 600
    df = pd.DataFrame({
        "k": rng.integers(0, 25, n),
        "ts": (pd.Timestamp("2024-01-01")
               + pd.to_timedelta(rng.integers(0, 40 * 86400, n), unit="s")),
        "v": np.round(rng.normal(size=n) * 50, 2),
    })

    def run(nparts):
        return (resample_ffill(rd.from_pandas(df).repartition(nparts),
                               "k", "ts", "v", period_s=86_400, agg="max")
                .to_pandas().sort_values(["k", "period"])
                .reset_index(drop=True))

    got = run(5)
    # brute force: per-key daily max reindexed onto the dense grid + ffill
    day = df.ts.astype("int64") // (10**9 * 86_400)
    obs = (pd.DataFrame({"k": df.k, "period": day, "v": df.v})
           .groupby(["k", "period"]).v.max())
    rows = []
    for k, sub in obs.groupby(level=0):
        s = sub.droplevel(0)
        grid = s.reindex(range(int(s.index.min()), int(s.index.max()) + 1))
        for p, v in grid.ffill().items():
            rows.append((k, p, v))
    exp = (pd.DataFrame(rows, columns=["k", "period", "value_ffill"])
           .sort_values(["k", "period"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # partitioning must not change the result
    pd.testing.assert_frame_equal(got, run(13), check_dtype=False)


def test_transition_counts_matches_bruteforce():
    from belb_ray.stages.analytic import transition_counts

    rng = np.random.default_rng(4)
    n = 500
    df = pd.DataFrame({
        "k": rng.integers(0, 20, n),
        "o": rng.permutation(n),
        "s": rng.choice(list("abcd"), n),
    })
    got = (transition_counts(rd.from_pandas(df).repartition(7),
                             "k", ["o"], "s")
           .to_pandas().sort_values(["from_state", "to_state"])
           .reset_index(drop=True))
    sdf = df.sort_values(["k", "o"])
    same = sdf.k.to_numpy()[1:] == sdf.k.to_numpy()[:-1]
    exp = (pd.DataFrame({"from_state": sdf.s.to_numpy()[:-1][same],
                         "to_state": sdf.s.to_numpy()[1:][same]})
           .groupby(["from_state", "to_state"]).size().rename("n")
           .reset_index()
           .sort_values(["from_state", "to_state"])
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    assert int(got.n.sum()) == int(same.sum())


def test_shard_assign_positions_dense_and_partition_independent():
    from belb_ray.stages.sampling import shard_assign

    df = pd.DataFrame({"id": np.arange(300), "x": np.arange(300) * 1.5})

    def run(nparts):
        return (shard_assign(rd.from_pandas(df).repartition(nparts),
                             "id", num_shards=6, seed=9)
                .to_pandas().sort_values(["shard", "pos"])
                .reset_index(drop=True))

    got = run(4)
    # every shard's positions are exactly 0..len-1 (dense, no gaps)
    for _, sub in got.groupby("shard"):
        assert sub.pos.tolist() == list(range(len(sub)))
    # all input rows present exactly once, payload intact
    assert sorted(got.id.tolist()) == list(range(300))
    assert (got.x == got.id * 1.5).all()
    # deterministic across partitioning
    pd.testing.assert_frame_equal(got, run(11), check_dtype=False)


def test_bfs_hops_vs_bruteforce():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from belb_ray.stages.graph import bfs_hops

    rng = np.random.default_rng(11)
    n = 60
    srcs, dsts = [], []
    for _ in range(150):
        a, b = rng.integers(0, n, 2)
        if a != b:
            srcs += [int(a), int(b)]
            dsts += [int(b), int(a)]
    # isolate nodes 50..59 in their own chain so some are unreachable
    for v in range(50, 59):
        srcs += [v, v + 1]
        dsts += [v + 1, v]
    edges = rd.from_arrow(pa.table({"src": srcs, "dst": dsts})) \
        .repartition(5)
    seed_nodes = [0, 3, 50, 999]  # 999 is not in the graph at all
    seeds = rd.from_arrow(pa.table({"node": seed_nodes}))

    # brute-force BFS
    from collections import deque
    adj = {}
    for a, b in zip(srcs, dsts):
        adj.setdefault(a, set()).add(b)
    dist = {s: 0 for s in seed_nodes}
    q = deque(seed_nodes)
    while q:
        u = q.popleft()
        if dist[u] >= 3:
            continue
        for v in adj.get(u, ()):
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    expect = sorted(dist.items())

    got = sorted((r["node"], r["hops"])
                 for r in bfs_hops(edges, seeds, max_hops=3).take_all())
    assert got == expect
    # the un-seeded chain tail beyond 3 hops must be absent
    assert all(h <= 3 for _, h in got)


def test_bfs_hops_empty_frontier_stops_early():
    import pyarrow as pa
    import ray.data as rd

    from belb_ray.stages.graph import bfs_hops

    edges = rd.from_arrow(pa.table({"src": [1], "dst": [2]}))
    seeds = rd.from_arrow(pa.table({"node": [7]}))  # no outgoing edges
    got = sorted((r["node"], r["hops"])
                 for r in bfs_hops(edges, seeds, max_hops=5).take_all())
    assert got == [(7, 0)]


def test_k_core_vs_bruteforce_peeling():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from belb_ray.stages.graph import k_core

    rng = np.random.default_rng(21)
    n = 40
    und = set()
    for _ in range(120):
        a, b = rng.integers(0, n, 2)
        if a != b:
            und.add((min(int(a), int(b)), max(int(a), int(b))))
    srcs = [a for a, b in und] + [b for a, b in und]
    dsts = [b for a, b in und] + [a for a, b in und]
    edges = rd.from_arrow(pa.table({"src": srcs, "dst": dsts})) \
        .repartition(4)

    # brute-force peel at k=4
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    alive = set(adj)
    changed = True
    while changed:
        changed = False
        for v in list(alive):
            if len(adj[v] & alive) < 4:
                alive.discard(v)
                changed = True
    expect = sorted((v, len(adj[v] & alive)) for v in alive)

    got = sorted((r["vertex"], r["core_degree"])
                 for r in k_core(edges, k=4, num_buckets=8).take_all())
    assert got == expect
    assert all(d >= 4 for _, d in got)


def test_k_core_empty_result():
    import pyarrow as pa
    import ray.data as rd

    from belb_ray.stages.graph import k_core

    edges = rd.from_arrow(pa.table({"src": [1, 2], "dst": [2, 1]}))
    assert k_core(edges, k=5).count() == 0


def test_hll_merge_equals_direct_coarse_sketch():
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from belb_ray.stages.sketch import hll_merge, hll_sketch

    rng = np.random.default_rng(6)
    n = 3000
    df = pd.DataFrame({
        "coarse": rng.choice(["a", "b", "c"], n),
        "part": rng.integers(0, 7, n).astype(str),
        "v": rng.integers(0, 400, n)})
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(5)

    direct = {r["coarse"]: (r["reg_digest"], r["approx_distinct"])
              for r in hll_sketch(ds, "coarse", "v", p=6,
                                  seed=0).take_all()}

    fine_in = ds.map_batches(
        lambda b: pd.DataFrame({"fine": b["coarse"] + "|" + b["part"],
                                "v": b["v"]}), batch_format="pandas")
    sk = hll_sketch(fine_in, "fine", "v", p=6, seed=0,
                    emit_registers=True)
    merged = hll_merge(
        sk.map_batches(
            lambda b: pd.DataFrame({
                "coarse": b["fine"].str.split("|").str[0],
                "registers": b["registers"]}), batch_format="pandas"),
        "coarse", p=6)
    got = {r["coarse"]: (r["reg_digest"], r["approx_distinct"])
           for r in merged.take_all()}
    assert got == direct  # register max is associative


def test_grouped_vector_mean_matches_numpy_and_block_invariant():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from belb_ray.stages.vector import grouped_vector_mean

    rng = np.random.default_rng(13)
    n, d = 250, 8
    labels = rng.integers(0, 4, n).astype(np.int32)
    mat = rng.normal(size=(n, d))
    tbl = pa.table({"label": labels,
                    "embedding": pa.array(mat.tolist(),
                                          pa.list_(pa.float32()))})
    mat64 = np.array(tbl["embedding"].to_pylist(), dtype=np.float64)

    for parts in (1, 7):
        ds = rd.from_arrow(tbl).repartition(parts)
        got = {(r["label"], r["dim_idx"]): r["mean_val"] for r in
               grouped_vector_mean(ds, "label", "embedding",
                                   dim=d).take_all()}
        expect = {}
        for lb in np.unique(labels):
            m = mat64[labels == lb].mean(axis=0)
            for j in range(d):
                expect[(lb, j + 1)] = round(float(m[j]), 6)
        assert got == expect  # block-count independent

    # wide form carries counts and the vector
    wide = grouped_vector_mean(rd.from_arrow(tbl), "label", "embedding",
                               dim=d, long_form=False).take_all()
    assert sum(r["n"] for r in wide) == n
    assert all(len(r["mean"]) == d for r in wide)


def test_nearest_centroid_confusion_matches_bruteforce():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from belb_ray.stages.vector import nearest_centroid_confusion

    rng = np.random.default_rng(17)
    n, d, k = 300, 6, 4
    centers = rng.normal(scale=3.0, size=(k, d))
    labels = rng.integers(0, k, n).astype(np.int32)
    mat = centers[labels] + rng.normal(size=(n, d))
    tbl = pa.table({"label": labels,
                    "embedding": pa.array(mat.tolist(),
                                          pa.list_(pa.float32()))})
    ds = rd.from_arrow(tbl).repartition(5)
    got = {(r["label"], r["pred_label"]): r["n"] for r in
           nearest_centroid_confusion(ds, "label", "embedding",
                                      dim=d).take_all()}

    m64 = np.array(tbl["embedding"].to_pylist(), np.float64)
    mu = np.stack([m64[labels == c].mean(axis=0) for c in range(k)])
    d2 = np.round(((m64[:, None, :] - mu[None]) ** 2).sum(axis=2), 6)
    pred = np.argmin(d2, axis=1)
    expect = {}
    for lb, p in zip(labels, pred):
        expect[(int(lb), int(p))] = expect.get((int(lb), int(p)), 0) + 1
    assert got == expect
    # well-separated clusters → diagonal dominates
    diag = sum(v for (a, b), v in got.items() if a == b)
    assert diag / n > 0.9


def test_global_rank_matches_pandas_and_block_invariant():
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from belb_ray.stages.analytic import global_rank

    rng = np.random.default_rng(8)
    n = 400
    df = pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "v": np.round(rng.normal(50, 30, n), 2)})  # negatives + ties
    df.loc[:20, "v"] = 7.0  # heavy tie block spanning bins? same bin
    o = df.sort_values(["v", "id"], ascending=[False, True],
                       kind="mergesort")
    expect_rank = {i: r + 1 for r, i in enumerate(o["id"])}
    for parts in (1, 9):
        ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(parts)
        rows = global_rank(ds, "v", "id", descending=True,
                           bin_width=10.0, pct=True).take_all()
        got = {r["id"]: r["rank"] for r in rows}
        assert got == expect_rank
        pcts = {r["id"]: r["pct"] for r in rows}
        assert pcts[o["id"].iloc[0]] == 0.0
        assert pcts[o["id"].iloc[-1]] == 1.0
    # ascending variant
    rows = global_rank(rd.from_arrow(pa.Table.from_pandas(df)),
                       "v", "id", descending=False,
                       bin_width=10.0).take_all()
    oa = df.sort_values(["v", "id"], kind="mergesort")
    assert {r["id"]: r["rank"] for r in rows} == \
        {i: r + 1 for r, i in enumerate(oa["id"])}


def test_merge_intervals_matches_bruteforce():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from belb_ray.stages.intervals import merge_intervals

    rng = np.random.default_rng(30)
    n = 300
    key = rng.integers(0, 10, n).astype(np.int64)
    s = rng.integers(0, 1000, n).astype(np.int64)
    e = s + rng.integers(0, 60, n)  # zero-length intervals included
    ds = rd.from_arrow(pa.table({"k": key, "s": s, "e": e})) \
        .repartition(6)
    got = sorted((r["k"], r["s"], r["e"]) for r in
                 merge_intervals(ds, "k", "s", "e",
                                 num_buckets=4).take_all())

    expect = []
    for kk in np.unique(key):
        ivs = sorted(zip(s[key == kk], e[key == kk]))
        cur_s, cur_e = ivs[0]
        for a, b in ivs[1:]:
            if a > cur_e:
                expect.append((kk, cur_s, cur_e))
                cur_s, cur_e = a, b
            else:
                cur_e = max(cur_e, b)
        expect.append((kk, cur_s, cur_e))
    assert got == sorted(expect)
    # touching intervals (start == running max end) merged, gaps split
    assert all(a2 > e1 for (k1, s1, e1), (k2, a2, _) in
               zip(got, got[1:]) if k1 == k2)


def test_weighted_pagerank_matches_power_iteration():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from belb_ray.stages.graph import pagerank

    srcs = [1, 1, 2, 3, 3, 4]
    dsts = [2, 3, 3, 1, 4, 1]
    ws = [3.0, 1.0, 2.0, 5.0, 5.0, 1.0]
    edges = rd.from_arrow(pa.table({"src": srcs, "dst": dsts, "w": ws}))
    got = {r["node"]: r["rank"] for r in
           pagerank(edges, iters=3, weight_col="w").take_all()}

    nodes = sorted(set(srcs) | set(dsts))
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    wsum = {}
    for s, w in zip(srcs, ws):
        wsum[s] = wsum.get(s, 0.0) + w
    r = np.full(n, 1.0 / n)
    for _ in range(3):
        c = np.zeros(n)
        for s, d, w in zip(srcs, dsts, ws):
            c[idx[d]] += r[idx[s]] / wsum[s] * w
        r = 0.15 / n + 0.85 * c
    assert all(abs(got[v] - r[idx[v]]) < 1e-12 for v in nodes)
    # weights genuinely change the answer vs the uniform split
    got_unw = {x["node"]: x["rank"] for x in
               pagerank(edges.drop_columns(["w"]), iters=3).take_all()}
    assert any(abs(got[v] - got_unw[v]) > 1e-6 for v in nodes)


def test_corr_matrix_matches_numpy_and_block_invariant():
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from belb_ray.stages.agg import corr_matrix

    rng = np.random.default_rng(19)
    n = 500
    a = rng.normal(size=n)
    df = pd.DataFrame({"a": a, "b": 2 * a + rng.normal(size=n),
                       "c": rng.normal(size=n)})
    expect = {}
    cc = np.corrcoef(df.to_numpy().T)
    for i, x in enumerate(["a", "b", "c"]):
        for j, y in enumerate(["a", "b", "c"]):
            if i < j:
                expect[(x, y)] = round(float(cc[i, j]), 6)
    for parts in (1, 6):
        ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(parts)
        got = {(r["col_a"], r["col_b"]): r["corr"] for r in
               corr_matrix(ds, ["a", "b", "c"]).take_all()}
        assert got == expect
    assert expect[("a", "b")] > 0.8  # the planted correlation shows


def test_cms_overcounts_only_and_block_invariant():
    import numpy as np
    import pandas as pd

    from belb_ray.stages.sketch import cms_estimate, cms_sketch

    rng = np.random.default_rng(5)
    keys = rng.zipf(1.5, 4000) % 97  # skewed, collisions at width 32
    df = pd.DataFrame({"k": keys.astype(np.int64)})
    exact = df["k"].value_counts()
    probes = rd.from_pandas(pd.DataFrame({"k": exact.index.to_numpy()}))

    outs = []
    for blocks in (2, 13):
        cms = cms_sketch(rd.from_pandas(df).repartition(blocks), "k",
                         depth=4, width=32)
        est = cms_estimate(cms, probes, "k", depth=4, width=32).to_pandas()
        outs.append(est.sort_values("k").reset_index(drop=True))
    a, b = outs
    assert a.equals(b)  # linear sketch: partial sums are block-invariant
    merged = a.set_index("k")["est_count"]
    ex = exact.reindex(merged.index)
    assert (merged >= ex).all()  # CMS never undercounts
    # min over 4 rows keeps error well under the single-row worst case
    assert (merged - ex).max() <= len(df) // 8


def test_readability_scores_crafted():
    import numpy as np
    import pandas as pd

    from belb_ray.stages.docstats import readability_scores

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["The cat sat. The dog ran!", "???", "aeiou xyz"]})
    got = (readability_scores(rd.from_pandas(docs))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    # doc 2 has zero words -> dropped
    assert got["doc_id"].tolist() == [1, 3]
    r1 = got.iloc[0]
    assert (r1["words"], r1["sentences"], r1["syllables"]) == (6, 2, 6)
    assert abs(r1["flesch"] - round(206.835 - 1.015 * 3.0
                                    - 84.6 * 1.0, 4)) < 1e-9
    r3 = got.iloc[1]  # 'aeiou xyz': 2 words, 1 sentence (floor), 2 groups
    assert (r3["words"], r3["sentences"], r3["syllables"]) == (2, 1, 2)


def test_key_skew_profile_block_invariant():
    import numpy as np
    import pandas as pd

    from belb_ray.stages.corpus import key_skew_profile

    rng = np.random.default_rng(9)
    df = pd.DataFrame({"k": rng.zipf(1.3, 5000) % 211})
    outs = [key_skew_profile(rd.from_pandas(df).repartition(b), "k",
                             num_buckets=8)
            for b in (3, 17)]
    assert outs[0].equals(outs[1])
    row = outs[0].iloc[0]
    vc = df["k"].value_counts()
    assert row["n_rows"] == len(df) and row["n_keys"] == len(vc)
    assert row["max_cnt"] == vc.max()
    assert abs(row["top_share"] - round(vc.max() / len(df), 8)) < 1e-12


def test_jaccard_similarity_join_exact_all_paths():
    import random

    import numpy as np
    import pandas as pd

    from belb_ray.functions.text import tokenize
    from belb_ray.stages.setsim import jaccard_similarity_join

    rng = random.Random(4)
    vocab = [f"w{i}" for i in range(50)]
    texts, ids = [], []
    for i in range(150):
        base = rng.sample(vocab, rng.randint(3, 10))
        texts.append(" ".join(base))
        ids.append(i)
        if rng.random() < 0.5:  # near-dup sibling
            sib = base if rng.random() < 0.3 else \
                base[:-1] + [rng.choice(vocab)]
            texts.append(" ".join(sib))
            ids.append(1000 + i)
    df = pd.DataFrame({"doc_id": np.array(ids, np.int64), "text": texts})
    T = 0.7
    sets = {r.doc_id: set(tokenize(r.text)) for r in df.itertuples()}
    ks = sorted(sets)
    exp = sorted(
        (a, b, round(len(sets[a] & sets[b])
                     / len(sets[a] | sets[b]), 9))
        for x, a in enumerate(ks) for b in ks[x + 1:]
        if len(sets[a] | sets[b])
        and len(sets[a] & sets[b]) / len(sets[a] | sets[b]) >= T)
    # df-order broadcast, hash-order fallback, join-verify fallback:
    # all three are EXACT (prefix filter is complete under any global
    # total order; the verify recomputes true Jaccard)
    for kw in ({}, {"vocab_broadcast": 0}, {"broadcast_threshold": 0}):
        got = jaccard_similarity_join(
            rd.from_pandas(df).repartition(7), T, **kw).to_pandas()
        gl = sorted((int(a), int(b), round(float(j), 9))
                    for a, b, j in got.itertuples(index=False))
        assert gl == exp, kw


def test_jl_project_block_invariant_and_distance_preserving():
    import numpy as np
    import pandas as pd

    from belb_ray.stages.pca import jl_matrix, jl_project

    rng = np.random.default_rng(3)
    n, d, k = 400, 32, 12
    x = rng.standard_normal((n, d))
    df = pd.DataFrame({"vid": np.arange(n, dtype=np.int64),
                       "v": [row.astype(np.float32).tolist() for row in x]})

    def run(blocks: int) -> pd.DataFrame:
        out = jl_project(rd.from_pandas(df).repartition(blocks), "v", k,
                         seed=5, id_cols=["vid"]).to_pandas()
        return out.sort_values("vid").reset_index(drop=True)

    a, b = run(2), run(9)
    pd.testing.assert_frame_equal(a, b)
    y = a[[f"jl{j + 1}" for j in range(k)]].to_numpy()
    expect = x.astype(np.float32).astype(np.float64) @ jl_matrix(d, k, 5)
    assert np.allclose(y, expect, atol=1e-9)
    # JL property: squared norms preserved in expectation (loose band)
    r = (y ** 2).sum(1) / (x.astype(np.float32) ** 2).sum(1)
    assert 0.5 < np.median(r) < 1.5


def test_fs_em_weights_planted_structure_and_block_invariant():
    import numpy as np
    import pandas as pd

    from belb_ray.stages.fellegi import fs_em_weights

    rng = np.random.default_rng(7)
    n = 4000
    is_match = rng.random(n) < 0.2
    # informative feature: agrees 90% on matches, 10% on unmatches;
    # noise feature: 50/50 everywhere
    # three features: two-class Bernoulli mixtures need >= 3 binary
    # features to be identifiable (Fellegi-Sunter's own 3-field setup)
    f1 = np.where(is_match, rng.random(n) < 0.9, rng.random(n) < 0.1)
    f2 = np.where(is_match, rng.random(n) < 0.8, rng.random(n) < 0.15)
    f3 = rng.random(n) < 0.5
    df = pd.DataFrame({"agree_a": f1.astype(np.int8),
                       "agree_b": f3.astype(np.int8),
                       "agree_c": f2.astype(np.int8)})

    def run(blocks: int) -> pd.DataFrame:
        return fs_em_weights(rd.from_pandas(df).repartition(blocks),
                             ["agree_a", "agree_b", "agree_c"], iters=12)

    a, b = run(3), run(11)
    pd.testing.assert_frame_equal(a, b)  # quantized sums: block-invariant
    byf = a.set_index("feature")
    assert 0.1 < byf.loc["__match_prior", "m"] < 0.35
    assert byf.loc["agree_a", "m"] > 0.7 > 0.3 > byf.loc["agree_a", "u"]
    assert byf.loc["agree_a", "weight_agree"] > 1.0
    # the noise feature carries ~no weight
    assert abs(byf.loc["agree_b", "weight_agree"]) < 0.5


def _rand_events(seed: int, n: int = 400, users: int = 12) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    ts = (np.datetime64("2024-01-01", "us")
          + rng.integers(0, 30 * 86400 * 10**6, n).astype("timedelta64[us]"))
    return pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, users, n).astype(np.int64),
        "event_type": rng.choice(["click", "purchase", "view"], n),
        "ts": ts,
        "value": np.round(rng.uniform(0, 100, n), 2)})


def test_last_touch_attribution_matches_bruteforce():
    from belb_ray.stages.funnel import last_touch_attribution

    df = _rand_events(5)
    win = 3 * 86400 * 10**6  # 3 days
    got = (last_touch_attribution(
        rd.from_pandas(df).repartition(5), "user_id", "event_type", "ts",
        "event_id", "purchase", "click", window_us=win, num_buckets=8)
        .to_pandas().sort_values("conversion_id").reset_index(drop=True))

    rows = []
    s = df.sort_values(["user_id", "ts", "event_id"], kind="stable")
    for uid, g in s.groupby("user_id"):
        last = None  # (us, event_id)
        for _, r in g.iterrows():
            us = r["ts"].value // 1000 if hasattr(r["ts"], "value") else 0
            us = np.datetime64(r["ts"], "us").astype(np.int64)
            if r["event_type"] == "purchase":
                if last is not None and us - last[0] <= win:
                    rows.append((r["event_id"], uid, float(last[1]),
                                 float(us - last[0])))
                else:
                    rows.append((r["event_id"], uid, np.nan, np.nan))
            if r["event_type"] == "click":
                last = (us, r["event_id"])
    exp = (pd.DataFrame(rows, columns=["conversion_id", "user_id",
                                       "touch_id", "gap_us"])
           .sort_values("conversion_id").reset_index(drop=True))
    assert len(got) == len(exp)
    assert got["conversion_id"].tolist() == exp["conversion_id"].tolist()
    pd.testing.assert_series_equal(got["touch_id"], exp["touch_id"],
                                   check_names=False)
    pd.testing.assert_series_equal(got["gap_us"], exp["gap_us"],
                                   check_names=False)


def test_time_weighted_mean_matches_bruteforce():
    from belb_ray.stages.analytic import time_weighted_mean

    df = _rand_events(9, n=300, users=10)
    got = (time_weighted_mean(
        rd.from_pandas(df).repartition(4), "user_id", "ts", "value",
        "event_id", num_buckets=8)
        .to_pandas().sort_values("user_id").reset_index(drop=True))
    for _, r in got.iterrows():
        g = (df[df["user_id"] == r["user_id"]]
             .sort_values(["ts", "event_id"], kind="stable"))
        us = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        v = g["value"].to_numpy(np.float64)
        num = float((v[:-1] * (us[1:] - us[:-1])).sum())
        span = int(us[-1] - us[0])
        assert int(r["n_obs"]) == len(g)
        assert int(r["span_us"]) == span
        assert abs(r["twa"] - round(num / span, 6)) <= 1e-9
    # every user with >= 2 events is present
    counts = df.groupby("user_id").size()
    assert set(got["user_id"]) == set(counts[counts >= 2].index)


def test_active_streaks_matches_bruteforce():
    from belb_ray.stages.analytic import active_streaks

    df = _rand_events(13, n=250, users=8)
    got = (active_streaks(rd.from_pandas(df).repartition(6), "user_id",
                          "ts", num_buckets=4)
           .to_pandas().sort_values("user_id").reset_index(drop=True))
    for _, r in got.iterrows():
        days = sorted(set(
            df[df["user_id"] == r["user_id"]]["ts"]
            .to_numpy().astype("datetime64[D]").astype(np.int64)))
        best = cur = 1
        for a, b in zip(days, days[1:]):
            cur = cur + 1 if b - a == 1 else 1
            best = max(best, cur)
        assert int(r["n_active_days"]) == len(days)
        assert int(r["longest_streak"]) == best
    assert set(got["user_id"]) == set(df["user_id"])


def _gram_corpus(seed: int, n_docs: int = 60):
    import random

    rng = random.Random(seed)
    vocab = [f"t{i}" for i in range(30)]
    boiler = "click here to subscribe now"
    texts = []
    for i in range(n_docs):
        words = [rng.choice(vocab) for _ in range(rng.randint(1, 25))]
        if rng.random() < 0.4:
            pos = rng.randint(0, len(words))
            words[pos:pos] = boiler.split()
        texts.append(" ".join(words))
    return pd.DataFrame({"doc_id": np.arange(n_docs, dtype=np.int64),
                         "text": texts})


def _grams(t: str, n: int = 3) -> list:
    w = t.lower().split()
    return [" ".join(w[i:i + n]) for i in range(len(w) - n + 1)]


def test_boilerplate_stats_matches_bruteforce():
    from collections import Counter

    from belb_ray.stages.curation import boilerplate_stats

    df = _gram_corpus(7)
    got = (boilerplate_stats(rd.from_pandas(df).repartition(5), n=3,
                             min_df=5, num_buckets=8)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    df_counts = Counter()
    per_doc = {}
    for r in df.itertuples():
        gs = _grams(r.text)
        per_doc[r.doc_id] = Counter(gs)
        df_counts.update(set(gs))
    boiler = {g for g, c in df_counts.items() if c >= 5}
    assert boiler, "fixture must produce boilerplate grams"
    exp = {d: (sum(c.values()), sum(v for g, v in c.items() if g in boiler))
           for d, c in per_doc.items() if c}
    assert len(got) == len(exp)
    for r in got.itertuples():
        ng, nb = exp[r.doc_id]
        assert (int(r.n_grams), int(r.n_boiler)) == (ng, nb)
        assert abs(float(r.boiler_ratio) - round(nb / ng, 6)) < 1e-12


def test_containment_topk_matches_bruteforce():
    from belb_ray.stages.setsim import containment_topk

    df = _gram_corpus(11)
    # query docs must share >=1 gram with someone, else the result is
    # legitimately empty — pick three boilerplate-carrying docs
    qids = [int(d) for d, t in zip(df["doc_id"], df["text"])
            if "click here to" in t][:3]
    assert len(qids) == 3
    got = (containment_topk(rd.from_pandas(df).repartition(5),
                            query_ids=qids, k=3, n=3, num_buckets=8)
           .to_pandas())
    sets = {r.doc_id: set(_grams(r.text)) for r in df.itertuples()}
    for q in qids:
        if not sets[q]:
            continue
        cands = sorted(
            ((-len(sets[q] & sets[d]), d) for d in sets
             if d != q and sets[q] & sets[d]))[:3]
        sub = got[got["qid"] == q].sort_values(["inter", "doc_id"],
                                               ascending=[False, True])
        assert [(int(-i), int(d)) for i, d in cands] == \
            [(int(r.inter), int(r.doc_id)) for r in sub.itertuples()]
        for r in sub.itertuples():
            assert abs(float(r.containment)
                       - round(float(r.inter) / len(sets[q]), 6)) < 1e-12


def _copurchase_edges(seed: int = 3, n_groups: int = 25, n_items: int = 40):
    import random

    rng = random.Random(seed)
    rows = []
    for g in range(n_groups):
        items = rng.sample(range(n_items), rng.randint(2, 5))
        for a in items:
            for b in items:
                if a != b:
                    rows.append((a, b))
    df = (pd.DataFrame(rows, columns=["src", "dst"])
          .groupby(["src", "dst"]).size().rename("w").reset_index())
    df["src"] = df["src"].astype(np.int64)
    df["dst"] = df["dst"].astype(np.int64)
    df["w"] = df["w"].astype(np.int64)
    return df


def test_label_propagation_matches_bruteforce():
    from belb_ray.stages.graph import label_propagation

    df = _copurchase_edges()
    got = (label_propagation(rd.from_pandas(df).repartition(4), iters=3,
                             num_buckets=8)
           .to_pandas().sort_values("node").reset_index(drop=True))
    # synchronous reference: label = mode of neighbor labels, min tie
    nbrs = {}
    for r in df.itertuples():
        nbrs.setdefault(r.src, []).append(r.dst)
    nodes = sorted(set(df["src"]) | set(df["dst"]))
    lab = {v: v for v in nodes}
    for _ in range(3):
        new = {}
        for v in nodes:
            ns = nbrs.get(v, [])
            if not ns:
                new[v] = lab[v]
                continue
            from collections import Counter

            cnt = Counter(lab[u] for u in ns)
            best = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
            new[v] = best[0]
        lab = new
    assert dict(zip(got["node"], got["label"])) == lab
    # communities formed: strictly fewer labels than nodes
    assert got["label"].nunique() < len(nodes)


def test_shortest_paths_matches_bruteforce():
    from belb_ray.stages.graph import shortest_paths

    df = _copurchase_edges(seed=5)
    seeds = sorted(set(df["src"]))[:3]
    got = (shortest_paths(
        rd.from_pandas(df).repartition(4),
        rd.from_pandas(pd.DataFrame({"node": np.asarray(seeds, np.int64)})),
        max_hops=3, num_buckets=8)
        .to_pandas().sort_values("node").reset_index(drop=True))
    # brute force: min weight over walks with <= 3 edges
    adj = {}
    for r in df.itertuples():
        adj.setdefault(r.src, []).append((r.dst, r.w))
    dist = {s: 0 for s in seeds}
    for _ in range(3):
        new = dict(dist)
        for u, d in dist.items():
            for v, w in adj.get(u, []):
                if d + w < new.get(v, 1 << 60):
                    new[v] = d + w
        dist = new
    assert dict(zip(got["node"], got["dist"])) == dist


def test_trailing_ewma_matches_bruteforce():
    from belb_ray.stages.analytic import trailing_ewma

    rng = np.random.RandomState(13)
    n = 400
    df = pd.DataFrame({
        "user_id": rng.randint(0, 12, n).astype(np.int64),
        "ts": rng.randint(0, 10_000, n).astype(np.int64),
        "event_id": np.arange(n, dtype=np.int64),
        "cents": rng.randint(0, 100_000, n).astype(np.int64)})
    got = (trailing_ewma(rd.from_pandas(df).repartition(6), "user_id",
                         ["ts", "event_id"], "cents", alpha=0.5,
                         window=8, num_buckets=8)
           .to_pandas().sort_values("event_id").reset_index(drop=True))
    exp = {}
    w = 0.5 ** np.arange(8)
    for _, g in df.sort_values(["ts", "event_id"]).groupby("user_id"):
        v = g["cents"].to_numpy(np.float64)
        for i, eid in enumerate(g["event_id"]):
            lo = max(0, i - 7)
            vv = v[lo:i + 1][::-1]
            exp[eid] = round(float((w[:len(vv)] * vv).sum()
                                   / w[:len(vv)].sum()), 6)
    assert len(got) == n
    for r in got.itertuples():
        assert float(r.ewma) == exp[r.event_id], r.event_id


def test_ks_drift_matches_bruteforce():
    from belb_ray.stages.drift import ks_drift

    rng = np.random.RandomState(17)
    a = pd.DataFrame({"v": rng.normal(50, 20, 2000)})
    b = pd.DataFrame({"v": rng.normal(60, 25, 1500)})
    got = (ks_drift(rd.from_pandas(a).repartition(4),
                    rd.from_pandas(b).repartition(3), "v", bin_width=10.0)
           .to_pandas().sort_values("bin").reset_index(drop=True))
    ba = np.floor(a["v"].to_numpy() / 10.0).astype(np.int64)
    bb = np.floor(b["v"].to_numpy() / 10.0).astype(np.int64)
    bins = np.unique(np.r_[ba, bb])
    ca = np.cumsum([np.sum(ba == x) for x in bins]) / len(ba)
    cb = np.cumsum([np.sum(bb == x) for x in bins]) / len(bb)
    assert list(got["bin"]) == list(bins)
    assert np.allclose(got["cdf_ref"], np.round(ca, 8))
    assert np.allclose(got["cdf_cand"], np.round(cb, 8))
    assert np.allclose(got["ks_contrib"], np.round(np.abs(ca - cb), 8))
    # KS statistic sanity: shifted distributions must register drift
    assert got["ks_contrib"].max() > 0.05


def test_skyline2d_matches_bruteforce():
    from belb_ray.stages.analytic import skyline2d

    rng = np.random.RandomState(23)
    df = pd.DataFrame({
        "id": np.arange(500, dtype=np.int64),
        "x": rng.randint(0, 40, 500).astype(np.int64),
        "y": rng.randint(0, 40, 500).astype(np.int64)})
    got = (skyline2d(rd.from_pandas(df).repartition(7), "x", "y")
           .to_pandas().sort_values("id").reset_index(drop=True))
    pts = df[["x", "y"]].to_numpy()
    keep = []
    for i, (xi, yi) in enumerate(pts):
        dom = ((pts[:, 0] >= xi) & (pts[:, 1] >= yi)
               & ((pts[:, 0] > xi) | (pts[:, 1] > yi))).any()
        if not dom:
            keep.append(i)
    assert list(got["id"]) == keep
    assert len(keep) > 0


def test_item_cosine_pairs_matches_bruteforce():
    from belb_ray.stages.cooccur import item_cosine_pairs

    rng = np.random.RandomState(29)
    rows = pd.DataFrame({
        "g": rng.randint(0, 30, 600).astype(np.int64),
        "it": rng.randint(0, 20, 600).astype(np.int64)})
    got = (item_cosine_pairs(rd.from_pandas(rows).repartition(5),
                             "g", "it", min_cosupport=2, num_buckets=8)
           .to_pandas().sort_values(["a", "b"]).reset_index(drop=True))
    inc = rows.drop_duplicates()
    members = {i: set(inc[inc["it"] == i]["g"]) for i in inc["it"].unique()}
    exp = []
    for a in sorted(members):
        for b in sorted(members):
            if a < b:
                c = len(members[a] & members[b])
                if c >= 2:
                    exp.append((a, b, c, round(
                        c / np.sqrt(len(members[a]) * len(members[b])), 6)))
    assert [(int(r.a), int(r.b), int(r.c), float(r.cosine))
            for r in got.itertuples()] == exp
    assert len(exp) > 10


def test_compact_state_preserves_behavior(tmp_path):
    from belb_ray.stages.incremental import (compact_state,
                                             dedup_against_state,
                                             neardup_against_state)

    # exact family: two runs seed state, compact, third run behaves
    # identically (drops everything already seen)
    state = str(tmp_path / "exact")
    w1 = pd.DataFrame({"doc_id": [1, 2, 3], "text": ["aa", "bb", "cc"]})
    w2 = pd.DataFrame({"doc_id": [10, 11], "text": ["dd", "ee"]})
    dedup_against_state(rd.from_arrow(pa.Table.from_pandas(w1)),
                        state).materialize()
    dedup_against_state(rd.from_arrow(pa.Table.from_pandas(w2)),
                        state).materialize()
    import glob as _g
    assert len(_g.glob(str(tmp_path / "exact" / "run-*"))) == 2
    stats = compact_state(state)
    assert stats == {"exact": 5}
    assert len(_g.glob(str(tmp_path / "exact" / "run-*"))) == 1
    w3 = pd.DataFrame({"doc_id": [20, 21, 22],
                       "text": ["aa", "ee", "ff"]})
    got = (dedup_against_state(rd.from_arrow(pa.Table.from_pandas(w3)),
                               state, update_state=False)
           .to_pandas())
    assert got.doc_id.tolist() == [22]

    # neardup family: compacted state yields the same wave-2 survivors
    # as the uncompacted state
    words = [f"tok{i}" for i in range(40)]
    docs = []
    for i in range(16):
        base = " ".join(words[j % 40] for j in range(i, i + 12))
        docs.append((i, base))
        docs.append((100 + i, base))  # near/exact dup of i
    d1 = pd.DataFrame({"doc_id": [a for a, _ in docs[:16]],
                       "text": [b for _, b in docs[:16]]})
    d2 = pd.DataFrame({"doc_id": [a for a, _ in docs[16:]],
                       "text": [b for _, b in docs[16:]]})
    sa = str(tmp_path / "nd_a")
    sb = str(tmp_path / "nd_b")
    for s in (sa, sb):
        neardup_against_state(rd.from_arrow(pa.Table.from_pandas(d1)),
                              s).materialize()
    stats = compact_state(sb)
    assert set(stats) == {"bands", "sigs"} and stats["sigs"] > 0
    assert len(_g.glob(str(tmp_path / "nd_b" / "bands" / "run-*"))) == 1
    surv_a = (neardup_against_state(
        rd.from_arrow(pa.Table.from_pandas(d2)), sa,
        update_state=False).to_pandas().doc_id.sort_values().tolist())
    surv_b = (neardup_against_state(
        rd.from_arrow(pa.Table.from_pandas(d2)), sb,
        update_state=False).to_pandas().doc_id.sort_values().tolist())
    assert surv_a == surv_b


def test_jaccard_join_heavy_token_split_path():
    # chunk_pairs=5 forces every non-trivial token group through the
    # heavy-token triangle-split path (row-range work units, one task
    # each); results must be identical to the default light path.
    import random

    from belb_ray.stages.setsim import jaccard_similarity_join

    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(30)]
    texts, ids = [], []
    for i in range(60):
        base = rng.sample(vocab, rng.randint(4, 8))
        texts.append(" ".join(base))
        ids.append(i)
        if rng.random() < 0.6:
            texts.append(" ".join(base))  # exact dup → hot tokens
            ids.append(1000 + i)
    df = pd.DataFrame({"doc_id": np.array(ids, np.int64), "text": texts})
    want = (jaccard_similarity_join(rd.from_pandas(df), 0.8)
            .to_pandas())
    got = (jaccard_similarity_join(rd.from_pandas(df), 0.8,
                                   chunk_pairs=5).to_pandas())
    key = lambda d: sorted(  # noqa: E731
        (int(a), int(b), round(float(j), 9))
        for a, b, j in d.itertuples(index=False))
    assert key(got) == key(want)
    assert len(want) > 20  # the fixture actually produces hot groups


def test_jaccard_join_hot_token_bounded_chunks():
    # one content shared by n docs → every token is one hot group with n
    # members. The heavy path ships the member arrays ray.put-ONCE per
    # token; chunk rows are 3 scalars (hidx, r0, r1), so per-task memory
    # is bounded by chunk_pairs regardless of group size (VERDICT r2
    # What's-wrong #2).
    from belb_ray.stages.setsim import jaccard_similarity_join

    n = 400
    df = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                       "text": ["alpha beta gamma delta"] * n})
    got = jaccard_similarity_join(rd.from_pandas(df), 0.9,
                                  chunk_pairs=1000).to_pandas()
    assert len(got) == n * (n - 1) // 2
    assert (got["jaccard"] == 1.0).all()
    assert (got["id_a"] < got["id_b"]).all()


def test_dedup_sweep_matches_bruteforce():
    import random

    from belb_ray.functions.text import tokenize
    from belb_ray.pipelines.docdedup import dedup_sweep

    rng = random.Random(9)
    vocab = [f"w{i}" for i in range(40)]
    texts, ids = [], []
    for i in range(80):
        base = rng.sample(vocab, rng.randint(4, 9))
        texts.append(" ".join(base))
        ids.append(i)
        if rng.random() < 0.5:
            sib = base if rng.random() < 0.4 else \
                base[:-1] + [rng.choice(vocab)]
            texts.append(" ".join(sib))
            ids.append(1000 + i)
    df = pd.DataFrame({"doc_id": np.array(ids, np.int64), "text": texts})
    grid = [0.95, 0.8, 0.6]
    got = (dedup_sweep(rd.from_pandas(df).repartition(5), grid)
           .to_pandas().set_index("threshold"))

    sets = {r.doc_id: set(tokenize(r.text)) for r in df.itertuples()}
    ks = sorted(sets)
    mx = {}
    for x, a in enumerate(ks):
        for b in ks[x + 1:]:
            u = len(sets[a] | sets[b])
            jac = len(sets[a] & sets[b]) / u if u else 1.0
            mx[b] = max(mx.get(b, 0.0), jac)
    for t in grid:
        dropped = sum(1 for v in mx.values() if v >= t)
        assert got.loc[t, "docs_dropped"] == dropped, t
        assert got.loc[t, "docs_kept"] == len(df) - dropped, t


def test_size_balanced_shards_prefix_and_balance():
    from belb_ray.stages.sampling import size_balanced_shards

    rng = np.random.default_rng(5)
    n = 400
    # skewed sizes: a few huge docs among small ones
    sizes = np.where(rng.random(n) < 0.05,
                     rng.integers(400, 900, n),
                     rng.integers(10, 60, n))
    df = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                       "text": ["x" * int(s) for s in sizes]})
    target = 1500
    got = (size_balanced_shards(rd.from_pandas(df).repartition(7),
                                target, id_bin=32)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    cum_excl = np.cumsum(sizes) - sizes
    assert (got["nbytes"].to_numpy() == sizes).all()
    assert (got["shard"].to_numpy() == cum_excl // target).all()
    # no shard exceeds target + one doc (a doc never splits, so the
    # only overshoot is the doc that crosses the boundary), and shards
    # are contiguous id ranges
    by = got.groupby("shard")["nbytes"].sum()
    assert (by <= target + sizes.max()).all()
    first_ids = got.groupby("shard")["doc_id"].min().to_numpy()
    assert (np.diff(first_ids) > 0).all()


def test_cross_corpus_overlap_matches_broadcast_path():
    from belb_ray.stages.curation import (contamination_flags,
                                          cross_corpus_overlap)

    rng = np.random.default_rng(3)
    vocab = [f"t{i}" for i in range(60)]
    mk = lambda: " ".join(rng.choice(vocab, 12))  # noqa: E731
    bench_texts = [mk() for _ in range(5)]
    train = pd.DataFrame({
        "doc_id": np.arange(40, dtype=np.int64),
        "text": [bench_texts[i % 5] if i % 7 == 0 else mk()
                 for i in range(40)]})
    bench = pd.DataFrame({"doc_id": np.arange(900, 905, dtype=np.int64),
                          "text": bench_texts})
    a = (contamination_flags(rd.from_pandas(train), bench_texts)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    b = (cross_corpus_overlap(rd.from_pandas(train).repartition(5),
                              rd.from_pandas(bench).repartition(2))
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
    assert b["contaminated"].sum() >= 6  # the planted hits were found


def test_cooccurrence_split_pairs_hub_group():
    from belb_ray.stages.cooccur import cooccurrence_pairs

    # one hub group (40 items -> 780 pairs) among small ones
    rows = [("hub", f"i{j:02d}") for j in range(40)]
    rows += [(f"g{k}", f"i{j:02d}") for k in range(10) for j in range(3)]
    df = pd.DataFrame({"g": [r[0] for r in rows],
                       "it": [r[1] for r in rows]})
    want = (cooccurrence_pairs(rd.from_pandas(df).repartition(4),
                               "g", "it")
            .to_pandas().sort_values(["a", "b"]).reset_index(drop=True))
    got = (cooccurrence_pairs(rd.from_pandas(df).repartition(4),
                              "g", "it", split_pairs=50)
           .to_pandas().sort_values(["a", "b"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)
    assert len(want) == 40 * 39 // 2 + 10 * 3


def test_grouped_gini_matches_bruteforce():
    from belb_ray.stages.analytic import grouped_gini

    rng = np.random.default_rng(77)
    # integer values force ties through the histogram fold
    df = pd.DataFrame({"k": rng.integers(0, 12, 4000),
                       "v": rng.integers(0, 40, 4000).astype(float)})
    df.loc[rng.integers(0, 4000, 50), "v"] = np.nan
    df.loc[df["k"] == 11, "v"] = 0.0  # zero-sum group → gini 0

    def gini(x):
        s = np.sort(np.asarray(x)[~np.isnan(np.asarray(x))])
        n, tot = len(s), s.sum()
        if tot <= 0:
            return 0.0
        i = np.arange(1, n + 1)
        return 2.0 * (i * s).sum() / (n * tot) - (n + 1.0) / n

    got = (grouped_gini(rd.from_pandas(df).repartition(7), "k", "v")
           .to_pandas().sort_values("k").reset_index(drop=True))
    exp = df.groupby("k")["v"].apply(gini)
    np.testing.assert_allclose(got["gini"], np.round(exp.values, 8),
                               atol=2e-8)
    exp_n = df.dropna(subset=["v"]).groupby("k").size()
    assert got["n"].tolist() == exp_n.tolist()

    # block invariance: different partitioning, identical output
    got2 = (grouped_gini(rd.from_pandas(df).repartition(2), "k", "v")
            .to_pandas().sort_values("k").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, got2)


def test_js_divergence_matches_bruteforce():
    from collections import Counter

    from belb_ray.stages.drift import js_divergence

    ra = pd.DataFrame({"text": ["a b b c", "c c d", "a a"]})
    rb = pd.DataFrame({"text": ["b b e", "e e a", ""]})
    got = (js_divergence(rd.from_pandas(ra).repartition(2),
                         rd.from_pandas(rb).repartition(2), "text")
           .to_pandas().sort_values("tok").reset_index(drop=True))

    ca = Counter(" ".join(ra["text"]).split())
    cb = Counter(" ".join(rb["text"]).split())
    na, nb = sum(ca.values()), sum(cb.values())
    toks = sorted(set(ca) | set(cb))
    total = 0.0
    for i, t in enumerate(toks):
        p, q = ca.get(t, 0) / na, cb.get(t, 0) / nb
        m = (p + q) / 2
        c = (0.5 * (p * np.log(p / m) if p else 0.0)
             + 0.5 * (q * np.log(q / m) if q else 0.0))
        total += c
        assert got.loc[i, "tok"] == t
        np.testing.assert_allclose(got.loc[i, "jsd_contrib"], c, atol=1e-8)
        np.testing.assert_allclose(got.loc[i, "p_ref"], p, atol=1e-8)
    # JSD is bounded by ln 2 and strictly positive for differing dists
    assert 0 < total < np.log(2)

    # identical corpora → zero divergence on every token
    same = js_divergence(rd.from_pandas(ra), rd.from_pandas(ra),
                         "text").to_pandas()
    assert (same["jsd_contrib"] == 0).all()


def test_nb_classify_matches_bruteforce():
    from collections import Counter

    from belb_ray.stages.classify import nb_classify

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "text": ["cat dog cat", "dog dog bone", "fish gill fin",
                 "fin fish fish", "cat fish"],
        "lang": ["pet", "pet", "sea", "sea", "pet"],
    })
    got = (nb_classify(rd.from_pandas(docs).repartition(3))
           .to_pandas().sort_values(["doc_id", "label"])
           .reset_index(drop=True))

    # independent single-process NB
    toks = {r.doc_id: r.text.split() for r in docs.itertuples()}
    cnt = {}
    for r in docs.itertuples():
        cnt.setdefault(r.lang, Counter()).update(r.text.split())
    vocab = {t for c in cnt.values() for t in c}
    v = len(vocab)
    n_docs = Counter(docs["lang"])
    rows = []
    for did in sorted(toks):
        for lab in sorted(cnt):
            tot = sum(cnt[lab].values())
            s = np.log(n_docs[lab] / len(docs))
            for t in toks[did]:
                s += np.log((cnt[lab][t] + 1.0) / (tot + v))
            rows.append((did, lab, round(s, 6)))
    exp = pd.DataFrame(rows, columns=["doc_id", "label", "log_score"])
    pd.testing.assert_frame_equal(got, exp)

    # sanity: each doc's best label is its true one on this separable set
    best = got.loc[got.groupby("doc_id")["log_score"].idxmax()]
    assert best.set_index("doc_id")["label"].to_dict() == \
        dict(zip(docs["doc_id"], docs["lang"]))

    # hash-join fallback path produces identical scores
    got2 = (nb_classify(rd.from_pandas(docs).repartition(3),
                        broadcast_threshold=2)
            .to_pandas().sort_values(["doc_id", "label"])
            .reset_index(drop=True))
    pd.testing.assert_frame_equal(got2, exp)


def test_content_checksum_order_independent_and_exact():
    import hashlib

    from belb_ray.stages.corpus import content_checksum

    df = pd.DataFrame({"t": [f"row {i} payload" for i in range(300)]})
    got = content_checksum(rd.from_pandas(df).repartition(5), "t").to_pandas()
    exp = sum(int(hashlib.md5(f"{v}:0".encode()).hexdigest()[:15], 16)
              for v in df["t"])
    assert got["n_rows"].iloc[0] == 300
    assert int(got["checksum"].iloc[0]) == exp
    assert exp > 2**63  # genuinely beyond int64 — the string carry matters

    # partitioning/order independence
    shuf = df.sample(frac=1.0, random_state=3).reset_index(drop=True)
    got2 = content_checksum(rd.from_pandas(shuf).repartition(2), "t").to_pandas()
    assert got2["checksum"].iloc[0] == got["checksum"].iloc[0]

    # sensitivity: any single-row change moves the checksum
    df2 = df.copy()
    df2.loc[7, "t"] = "row 7 payloadX"
    got3 = content_checksum(rd.from_pandas(df2), "t").to_pandas()
    assert got3["checksum"].iloc[0] != got["checksum"].iloc[0]


def test_simplified_silhouette_matches_bruteforce():
    from belb_ray.stages.vector import simplified_silhouette

    rng = np.random.default_rng(91)
    # three well-separated blobs + one noisy label
    centers = np.array([[0.0] * 8, [10.0] * 8, [-10.0] * 8, [0.5] * 8])
    lab = rng.integers(0, 4, 400).astype(np.int32)
    X = centers[lab] + rng.normal(0, 1.0, (400, 8))
    df = pd.DataFrame({"label": lab,
                       "embedding": [r.astype(np.float32) for r in X]})
    tbl = pa.table({"label": pa.array(lab, pa.int32()),
                    "embedding": pa.array(
                        [r.astype(np.float32).tolist() for r in X],
                        pa.list_(pa.float32()))})

    got = (simplified_silhouette(rd.from_arrow(tbl).repartition(5),
                                 "label", "embedding", dim=8)
           .to_pandas().sort_values("label").reset_index(drop=True))

    Xf = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    mu = np.stack([Xf[lab == l_].mean(axis=0) for l_ in range(4)])
    d = np.sqrt(((Xf[:, None, :] - mu[None]) ** 2).sum(axis=2))
    a = d[np.arange(len(Xf)), lab]
    d[np.arange(len(Xf)), lab] = np.inf
    b = d.min(axis=1)
    s = np.where(np.maximum(a, b) > 0, (b - a) / np.maximum(a, b), 0.0)
    for l_ in range(4):
        np.testing.assert_allclose(got.loc[l_, "silhouette"],
                                   round(s[lab == l_].mean(), 6),
                                   atol=2e-6)
        assert got.loc[l_, "n"] == (lab == l_).sum()
    # tight blobs score near 1; the overlapping pair (0 vs 3) scores low
    assert got.loc[1, "silhouette"] > 0.8
    assert got.loc[0, "silhouette"] < 0.5


def test_kcenter_sample_matches_bruteforce_and_block_invariant():
    from belb_ray.stages.vector import kcenter_sample

    rng = np.random.default_rng(17)
    n, d = 200, 6
    X = rng.normal(0, 1, (n, d)).astype(np.float32)
    X[50] = 40.0   # planted far point: must be picked at rank 1
    X[51] = -40.0  # second-farthest extreme
    ids = np.arange(100, 100 + n, dtype=np.int64)
    tbl = pa.table({"vec_id": pa.array(ids),
                    "embedding": pa.array([r.tolist() for r in X],
                                          pa.list_(pa.float32()))})

    got = (kcenter_sample(rd.from_arrow(tbl).repartition(5), "vec_id",
                          "embedding", dim=d, k=6).to_pandas())

    # independent greedy reference
    xf = X.astype(np.float64)
    j = int(np.argmin(ids))
    sel, chosen = [int(ids[j])], {int(ids[j])}
    md = np.full(n, np.inf)
    cur = xf[j]
    for _ in range(5):
        md = np.minimum(md, ((xf - cur) ** 2).sum(axis=1))
        mm = md.copy()
        mm[np.isin(ids, list(chosen))] = -np.inf
        cands = np.flatnonzero(mm == mm.max())
        j = int(cands[np.argmin(ids[cands])])
        sel.append(int(ids[j]))
        chosen.add(int(ids[j]))
        cur = xf[j]
    assert got["vec_id"].tolist() == sel
    assert got["vec_id"].tolist()[1] in (150, 151)
    assert {150, 151} <= set(got["vec_id"])  # both extremes chosen early
    assert (np.diff(got["dist"].to_numpy()[1:]) <= 1e-9).all()  # non-increasing

    # block invariance
    got2 = (kcenter_sample(rd.from_arrow(tbl).repartition(2), "vec_id",
                           "embedding", dim=d, k=6).to_pandas())
    pd.testing.assert_frame_equal(got, got2)


def test_mutual_information_matches_bruteforce():
    from belb_ray.stages.drift import mutual_information

    rng = np.random.default_rng(23)
    a = rng.integers(0, 3, 1200)
    b = np.where(rng.random(1200) < 0.7, a, rng.integers(0, 3, 1200))
    df = pd.DataFrame({"a": a.astype(str), "b": b.astype(str)})
    got = (mutual_information(rd.from_pandas(df).repartition(4), "a", "b")
           .to_pandas().sort_values(["a", "b"]).reset_index(drop=True))

    n = len(df)
    total = 0.0
    for _, r in got.iterrows():
        pab = r["observed"] / n
        pa_ = (df["a"] == r["a"]).mean()
        pb_ = (df["b"] == r["b"]).mean()
        c = pab * np.log(pab / (pa_ * pb_))
        np.testing.assert_allclose(r["mi_contrib"], c, atol=1e-8)
        total += c
    assert total > 0.2  # strongly dependent by construction

    # independent columns → MI ~ 0 (small-sample bias only)
    df2 = pd.DataFrame({"a": a.astype(str),
                        "b": rng.integers(0, 3, 1200).astype(str)})
    mi2 = mutual_information(rd.from_pandas(df2), "a", "b") \
        .to_pandas()["mi_contrib"].sum()
    assert abs(mi2) < 0.02


def test_mixture_plan_shares_and_rates():
    from belb_ray.stages.corpus import mixture_plan

    df = pd.DataFrame({"src": ["a"] * 800 + ["b"] * 160 + ["c"] * 40})
    got = (mixture_plan(rd.from_pandas(df).repartition(3), "src",
                        alpha=0.5).to_pandas()
           .sort_values("src").reset_index(drop=True))
    n = np.array([800.0, 160.0, 40.0])
    w = np.sqrt(n)
    tgt = w / w.sum()
    boost = tgt / (n / n.sum())
    rate = boost / boost.max()
    np.testing.assert_allclose(got["target_share"], np.round(tgt, 6))
    np.testing.assert_allclose(got["rate"], np.round(rate, 6))
    # rarest source keeps everything; shares sum to 1
    assert got.loc[2, "rate"] == 1.0
    assert abs(got["target_share"].sum() - 1.0) < 1e-5
    # α flattens: rare source's target share exceeds its natural share
    assert got.loc[2, "target_share"] > got.loc[2, "share"]


def test_global_quantile_exact_matches_numpy():
    from belb_ray.stages.analytic import global_quantile_exact

    rng = np.random.default_rng(41)
    v = np.concatenate([rng.normal(100, 30, 5000),
                        np.full(2000, 42.5),      # heavy tie mass
                        rng.exponential(5, 3000)])
    df = pd.DataFrame({"value": v})
    qs = [0.1, 0.5, 0.9, 0.99]
    got = (global_quantile_exact(rd.from_pandas(df).repartition(7),
                                 "value", qs, distinct_budget=500)
           .to_pandas())

    s = np.sort(v)
    for i, q in enumerate(qs):
        exp = s[max(int(np.ceil(q * len(s) - 1e-9)) - 1, 0)]
        assert got.loc[i, "value"] == exp, (q, got.loc[i, "value"], exp)

    # all-ties column: interval stalls, exact fallback still right
    df2 = pd.DataFrame({"value": np.full(1000, 7.25)})
    got2 = global_quantile_exact(rd.from_pandas(df2), "value",
                                 [0.5]).to_pandas()
    assert got2.loc[0, "value"] == 7.25


def test_join_size_estimate_exact_and_overcount():
    from belb_ray.stages.sketch import join_size_estimate

    rng = np.random.default_rng(53)
    a = pd.DataFrame({"k": rng.integers(0, 30, 2000)})
    b = pd.DataFrame({"k": rng.integers(10, 50, 1500)})
    got = join_size_estimate(rd.from_pandas(a).repartition(4),
                             rd.from_pandas(b).repartition(3),
                             "k").to_pandas()
    exact = a.merge(b, on="k").shape[0]
    assert got["exact_pairs"].iloc[0] == exact
    assert got["n_left"].iloc[0] == 2000
    assert got["n_right"].iloc[0] == 1500
    # CMS collisions only ADD mass: the estimate never undercounts
    assert got["cms_estimate"].iloc[0] >= exact


def test_grouped_weighted_median_matches_bruteforce():
    from belb_ray.stages.analytic import grouped_weighted_median

    rng = np.random.default_rng(67)
    df = pd.DataFrame({"k": rng.integers(0, 9, 3000),
                       "v": rng.integers(0, 50, 3000).astype(float),
                       "w": rng.integers(1, 20, 3000)})

    def wmed(g):
        g = g.sort_values("v")
        cum = g["w"].cumsum()
        tot = int(g["w"].sum())
        return float(g.loc[2 * cum >= tot, "v"].iloc[0])

    got = (grouped_weighted_median(rd.from_pandas(df).repartition(6),
                                   "k", "v", "w")
           .to_pandas().sort_values("k").reset_index(drop=True))
    exp = df.groupby("k").apply(wmed, include_groups=False)
    assert got["wmedian"].tolist() == exp.tolist()
    assert got["total_weight"].tolist() == \
        df.groupby("k")["w"].sum().tolist()

    # weight-1 degenerates to the plain lower median rule
    df1 = pd.DataFrame({"k": [0] * 4, "v": [1.0, 2.0, 3.0, 4.0],
                        "w": [1] * 4})
    got1 = grouped_weighted_median(rd.from_pandas(df1), "k", "v",
                                   "w").to_pandas()
    assert got1["wmedian"].iloc[0] == 2.0


def test_tfidf_cosine_join_matches_bruteforce():
    import re

    from belb_ray.stages.tfidf import tfidf_cosine_join

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["alpha beta gamma delta",
                 "alpha beta gamma epsilon",   # near-dup of doc 1
                 "zeta eta theta iota",
                 "alpha common common common"],
    })
    got = (tfidf_cosine_join(rd.from_pandas(docs).repartition(2),
                             threshold=0.0, max_df=3)
           .to_pandas().sort_values(["id_a", "id_b"])
           .reset_index(drop=True))

    # independent brute force with the same smooth-idf + df<=3 contract
    tok_re = re.compile(r"[a-z0-9]+")
    tf = {}
    for r in docs.itertuples():
        for t in tok_re.findall(r.text):
            tf[(r.doc_id, t)] = tf.get((r.doc_id, t), 0) + 1
    from collections import Counter
    dfc = Counter(t for (_, t) in tf)
    n = float(len(docs))
    w = {(d, t): c * (np.log((1 + n) / (1 + dfc[t])) + 1)
         for (d, t), c in tf.items() if dfc[t] <= 3}
    import itertools
    exp = []
    for a, b in itertools.combinations(docs["doc_id"], 2):
        dot = sum(w[(a, t)] * w[(b, t)]
                  for t in {t for (d, t) in w if d == a}
                  if (b, t) in w)
        if dot == 0:
            continue
        na = sum(v * v for (d, _), v in w.items() if d == a)
        nb = sum(v * v for (d, _), v in w.items() if d == b)
        exp.append((a, b, round(dot / np.sqrt(na * nb), 6)))
    exp_df = pd.DataFrame(exp, columns=["id_a", "id_b", "cosine"])
    got_c = dict(zip(zip(got["id_a"], got["id_b"]), got["cosine"]))
    exp_c = dict(zip(zip(exp_df["id_a"], exp_df["id_b"]),
                     exp_df["cosine"]))
    assert set(got_c) == set(exp_c)
    for k in exp_c:
        np.testing.assert_allclose(got_c[k], exp_c[k], atol=2e-6)
    # the near-dup pair scores far above the disjoint ones
    assert got_c[(1, 2)] > 0.5
    assert (3, 4) not in got_c  # no shared rare token → no candidate


def test_quantize_embeddings_roundtrip_and_block_invariance():
    from belb_ray.stages.vector import quantize_embeddings

    rng = np.random.default_rng(29)
    X = rng.normal(0, 2, (120, 5)).astype(np.float32)
    X[:, 3] = 7.0  # constant dim → code 0
    ids = np.arange(120, dtype=np.int64)
    tbl = pa.table({"vec_id": pa.array(ids),
                    "embedding": pa.array([r.tolist() for r in X],
                                          pa.list_(pa.float32()))})

    got = (quantize_embeddings(rd.from_arrow(tbl).repartition(4),
                               "vec_id", "embedding", dim=5)
           .to_pandas().sort_values(["vec_id", "dim_idx"])
           .reset_index(drop=True))

    xf = X.astype(np.float64)
    lo, hi = xf.min(axis=0), xf.max(axis=0)
    span = np.where(hi > lo, hi - lo, 1.0)
    exp = np.where(hi > lo,
                   np.round((xf - lo) * 255.0 / span) - 128, 0.0)
    np.testing.assert_array_equal(
        got["code"].to_numpy().reshape(120, 5), exp.astype(np.int64))
    assert got["code"].between(-128, 127).all()
    assert (got.loc[got["dim_idx"] == 4, "code"] == 0).all()
    # dequantization error bounded by half a step per dim
    deq = lo + (exp + 128) * span / 255.0
    assert np.abs(deq - xf)[:, [0, 1, 2, 4]].max() <= \
        (span[[0, 1, 2, 4]] / 255.0 / 2 + 1e-12).max()

    # wide form: fixed-width binary codes, block-order invariant
    wide = (quantize_embeddings(rd.from_arrow(tbl).repartition(2),
                                "vec_id", "embedding", dim=5,
                                long_form=False)
            .to_pandas().sort_values("vec_id").reset_index(drop=True))
    b0 = np.frombuffer(wide["codes"].iloc[0], np.uint8).astype(np.int64)
    np.testing.assert_array_equal(b0 - 128, exp[0].astype(np.int64))


def test_star_broadcast_join_chained_dims_and_budget():
    from belb_ray.stages.joins import star_broadcast_join

    fact = pd.DataFrame({"fk1": [1, 2, 1, 3], "x": [10, 20, 30, 40]})
    d1 = pd.DataFrame({"fk1": [1, 2, 3], "fk2": [7, 8, 7]})
    d2 = pd.DataFrame({"fk2": [7, 8], "name": ["a", "b"]})
    got = (star_broadcast_join(
        rd.from_pandas(fact).repartition(2),
        [(rd.from_pandas(d1), "fk1", None),
         (rd.from_pandas(d2), "fk2", None)])
        .to_pandas().sort_values(["fk1", "x"]).reset_index(drop=True))
    exp = (fact.merge(d1, on="fk1").merge(d2, on="fk2")
           .sort_values(["fk1", "x"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got[["fk1", "x", "fk2", "name"]], exp[["fk1", "x", "fk2", "name"]])

    # oversized dim fails loudly instead of silently broadcasting
    import pytest as _pytest
    big = pd.DataFrame({"fk1": np.arange(100), "y": np.arange(100)})
    with _pytest.raises(ValueError, match="broadcast budget"):
        star_broadcast_join(rd.from_pandas(fact),
                            [(rd.from_pandas(big), "fk1", None)],
                            broadcast_threshold=10)


def test_prune_state_retention_semantics(tmp_path):
    from belb_ray.stages.incremental import dedup_against_state, prune_state

    state = str(tmp_path / "st")
    w1 = pd.DataFrame({"doc_id": [1, 2], "text": ["aaa", "bbb"]})
    w2 = pd.DataFrame({"doc_id": [3, 4], "text": ["ccc", "ddd"]})
    out1 = dedup_against_state(rd.from_pandas(w1), state).to_pandas()
    out2 = dedup_against_state(rd.from_pandas(w2), state).to_pandas()
    assert len(out1) == 2 and len(out2) == 2

    # keep only the newest run: wave-1 docs are forgotten, wave-2 kept
    removed = prune_state(state, keep_last=1)
    assert removed["exact"] == 1

    re1 = dedup_against_state(
        rd.from_pandas(w1.assign(doc_id=[11, 12])), state).to_pandas()
    assert len(re1) == 2  # admitted again — their witness was pruned
    re2 = dedup_against_state(
        rd.from_pandas(w2.assign(doc_id=[13, 14])), state).to_pandas()
    assert len(re2) == 0  # still deduped against the kept run
