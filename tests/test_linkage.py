"""Record-linkage ops (stages/linkage.py): exact edit-distance self-join
and golden-record survivorship — vs brute-force / pandas computations,
including the non-ASCII fallback path and k=2."""

import itertools

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from belb_ray.functions.similarity import levenshtein
from belb_ray.stages.linkage import edit_distance_self_join, survivorship


def _pairs_bruteforce(strs: dict[int, str], k: int) -> set:
    out = set()
    for (ia, sa), (ib, sb) in itertools.combinations(sorted(strs.items()), 2):
        d = levenshtein(sa, sb)
        if d <= k:
            out.add((ia, ib, d))
    return out


def _ds(strs: dict[int, str]) -> rd.Dataset:
    t = pa.table({"id": pa.array(list(strs), pa.int64()),
                  "s": pa.array(list(strs.values()), pa.string())})
    return rd.from_arrow(t).repartition(4)


def test_edit_distance_self_join_k1_vs_bruteforce():
    rng = np.random.default_rng(9)
    strs = {i: "".join(rng.choice(list("abcd"), rng.integers(3, 9)))
            for i in range(120)}
    strs[900] = ""           # empty string
    strs[901] = "a"          # ed(“”, “a”) = 1
    strs[902] = "cafè"       # non-ASCII hits the scalar fallback
    strs[903] = "cafè"       # hmm same — make a 1-sub variant
    strs[904] = "cafa"
    out = edit_distance_self_join(_ds(strs), "id", "s", k=1).to_pandas()
    got = set(zip(out.id_a, out.id_b, out.dist))
    assert got == _pairs_bruteforce(strs, 1)


def test_edit_distance_self_join_k2_vs_bruteforce():
    rng = np.random.default_rng(11)
    strs = {i: "".join(rng.choice(list("xy"), rng.integers(2, 7)))
            for i in range(60)}
    out = edit_distance_self_join(_ds(strs), "id", "s", k=2).to_pandas()
    got = set(zip(out.id_a, out.id_b, out.dist))
    assert got == _pairs_bruteforce(strs, 2)


def test_survivorship_vs_pandas():
    rng = np.random.default_rng(4)
    n = 400
    df = pd.DataFrame({
        "cid": rng.integers(0, 25, n),
        "oid": np.arange(n),
        "dt": rng.integers(0, 50, n),
        "price": rng.normal(100, 10, n).round(2),
        "status": rng.choice(list("OFP"), n),
    })
    out = (survivorship(rd.from_pandas(df).repartition(6), "cid",
                        [("max", "price", "max_price"),
                         ("min", "dt", "first_dt"),
                         ("count", "", "n")],
                        ["status"], "dt", "oid")
           .to_pandas().sort_values("cid").reset_index(drop=True))
    g = df.groupby("cid")
    exp_latest = (df.sort_values(["dt", "oid"], ascending=False)
                  .groupby("cid").first()["status"])
    assert np.allclose(out.max_price, g.price.max().to_numpy())
    assert list(out.first_dt) == list(g.dt.min())
    assert list(out.n) == list(g.size())
    assert list(out.latest_status) == list(exp_latest)


def test_edit_distance_lookup_vs_bruteforce():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from belb_ray.functions.similarity import levenshtein
    from belb_ray.stages.linkage import edit_distance_lookup

    canon_names = ["alpha", "alpht", "beta", "bets", "gamma", "delta",
                   "epsilon", ""]
    canon = rd.from_arrow(pa.table({
        "cid": list(range(len(canon_names))), "cname": canon_names}))
    probe_names = ["alpha", "alph", "betax", "gamm", "zeta", "", "x"]
    probe = rd.from_arrow(pa.table({
        "pid": [100 + i for i in range(len(probe_names))],
        "pname": probe_names})).repartition(3)

    got = sorted((r["pid"], r["cid"], r["dist"]) for r in
                 edit_distance_lookup(probe, canon, "pid", "pname",
                                      "cid", "cname", k=1,
                                      num_buckets=4).take_all())
    expect = sorted(
        (100 + i, j, levenshtein(p, c))
        for i, p in enumerate(probe_names)
        for j, c in enumerate(canon_names)
        if levenshtein(p, c) <= 1)
    assert got == expect
    # same-string cross match has dist 0; '' matches '' (0) and 'x'-like
    assert (100, 0, 0) in got and (105, 7, 0) in got


def test_sorted_neighborhood_pairs_vs_bruteforce():
    import random
    import string

    import numpy as np
    import pandas as pd

    from belb_ray.stages.linkage import sorted_neighborhood_pairs

    rng = random.Random(11)
    n = 600
    names = ["".join(rng.choices(string.ascii_lowercase + "é",
                                 k=rng.randint(0, 6))) for _ in range(n)]
    for i in range(0, n, 5):  # force heavy sort-key ties
        names[i] = names[(i * 7) % n]
    df = pd.DataFrame({"id": np.arange(n, dtype=np.int64), "nm": names})
    W = 4
    got = sorted_neighborhood_pairs(
        rd.from_pandas(df).repartition(7), "id", "nm", W,
        carry_sort=True, num_buckets=8).to_pandas()
    bf = df.sort_values(["nm", "id"], kind="mergesort").reset_index(drop=True)
    rows = [(bf.id[i], bf.id[j], j - i, bf.nm[i], bf.nm[j])
            for i in range(len(bf))
            for j in range(i + 1, min(i + W, len(bf)))]
    exp = pd.DataFrame(rows, columns=["id_a", "id_b", "gap",
                                      "sort_a", "sort_b"])
    key = ["id_a", "id_b"]
    got = got.sort_values(key).reset_index(drop=True)
    exp = exp.sort_values(key).reset_index(drop=True)
    assert got.astype(str).equals(exp.astype(str))


def test_sorted_neighborhood_pairs_block_invariant():
    import numpy as np
    import pandas as pd

    from belb_ray.stages.linkage import sorted_neighborhood_pairs

    df = pd.DataFrame({"id": np.arange(200, dtype=np.int64),
                       "nm": [f"k{i % 37:02d}" for i in range(200)]})

    def run(blocks: int, buckets: int) -> pd.DataFrame:
        out = sorted_neighborhood_pairs(
            rd.from_pandas(df).repartition(blocks), "id", "nm", 5,
            num_buckets=buckets).to_pandas()
        return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)

    a, b = run(2, 4), run(11, 16)
    assert a.equals(b)
    assert (a["gap"] >= 1).all() and (a["gap"] < 5).all()


def test_soundex_codes_canonical_examples():
    """NARA American Soundex reference examples, incl. the h/w-transparent
    collapse (Ashcraft→A261, Tymczak→T522, Pfister→P236) and the
    first-letter-digit-drop rule (Jackson→J250); empty / non-letter
    names code as ''."""
    from belb_ray.stages.linkage import soundex_codes

    cases = {
        "Robert": "R163", "Rupert": "R163", "Ashcraft": "A261",
        "Ashcroft": "A261", "Tymczak": "T522", "Pfister": "P236",
        "Honeyman": "H555", "Jackson": "J250", "Washington": "W252",
        "Lee": "L000", "Gutierrez": "G362", "Jackson-Smith": "J252",
        "van Dyke": "V532", "O'Hara": "O600", "123": "", "": "",
        "Wu": "W000", "Czarkowska": "C622",
    }
    names = list(cases)
    df = pd.DataFrame({"id": np.arange(len(names), dtype=np.int64),
                       "nm": names})
    got = (soundex_codes(rd.from_pandas(df).repartition(3), "id", "nm")
           .to_pandas().sort_values("id").reset_index(drop=True))
    assert got["soundex"].tolist() == [cases[n] for n in names]


def _greedy_bruteforce(df: pd.DataFrame) -> list[tuple[int, int]]:
    df = df.sort_values(["score", "id_a", "id_b"],
                        ascending=[False, True, True], kind="stable")
    used: set[int] = set()
    out = []
    for a, b in zip(df["id_a"], df["id_b"]):
        if a not in used and b not in used:
            used.add(a)
            used.add(b)
            out.append((int(a), int(b)))
    return sorted(out)


def test_one_to_one_match_equals_sequential_greedy():
    """Distributed locally-dominant rounds == the literal sequential
    greedy matching, on a seeded random pair graph with score ties —
    exercised with local_threshold=0 so EVERY round runs distributed."""
    from belb_ray.stages.linkage import one_to_one_match

    rng = np.random.default_rng(11)
    n = 60
    rows = set()
    while len(rows) < 300:
        a, b = rng.integers(0, n, 2)
        if a != b:
            rows.add((min(a, b), max(a, b)))
    pairs = pd.DataFrame(sorted(rows), columns=["id_a", "id_b"])
    # quantized scores force ties broken by (id_a, id_b)
    pairs["score"] = np.round(
        rng.uniform(0, 1, len(pairs)) * 8) / 8
    got = (one_to_one_match(rd.from_pandas(pairs).repartition(5),
                            local_threshold=0, num_buckets=8)
           .to_pandas())
    got_pairs = sorted(zip(got["id_a"].astype(int),
                           got["id_b"].astype(int)))
    assert got_pairs == _greedy_bruteforce(pairs)
    # one-to-one: every node appears at most once
    nodes = got["id_a"].tolist() + got["id_b"].tolist()
    assert len(nodes) == len(set(nodes))


def test_one_to_one_match_local_finish_identical():
    """The size-guarded local finish returns the same matching as the
    all-distributed path."""
    from belb_ray.stages.linkage import one_to_one_match

    rng = np.random.default_rng(3)
    pairs = pd.DataFrame({
        "id_a": rng.integers(0, 40, 150),
        "id_b": rng.integers(40, 80, 150),
        "score": np.round(rng.uniform(0, 1, 150), 3)})
    a = (one_to_one_match(rd.from_pandas(pairs).repartition(3),
                          local_threshold=0, num_buckets=4).to_pandas())
    b = (one_to_one_match(rd.from_pandas(pairs).repartition(3),
                          local_threshold=10**6).to_pandas())
    key = lambda d: sorted(zip(d["id_a"].astype(int),
                               d["id_b"].astype(int),
                               np.round(d["score"], 9)))
    assert key(a) == key(b)


def test_bcubed_matches_per_record_definition():
    """bcubed's contingency-table identity == the literal per-record
    average of |cluster ∩ gold| / |cluster| (and the recall dual)."""
    from belb_ray.stages.linkage import bcubed

    rng = np.random.default_rng(7)
    n = 500
    df = pd.DataFrame({
        "cluster": rng.integers(0, 12, n).astype(str),
        "gold": rng.integers(0, 9, n).astype(str)})
    got = bcubed(rd.from_pandas(df).repartition(4), "cluster", "gold")

    # brute force per record
    sizes_c = df.groupby("cluster")["gold"].size()
    sizes_g = df.groupby("gold")["cluster"].size()
    n_cg = df.groupby(["cluster", "gold"]).size()
    joint = df.apply(lambda r: n_cg[(r["cluster"], r["gold"])], axis=1)
    p = float((joint / df["cluster"].map(sizes_c)).mean())
    r = float((joint / df["gold"].map(sizes_g)).mean())
    assert abs(got["b3_precision"][0] - round(p, 6)) <= 1e-6
    assert abs(got["b3_recall"][0] - round(r, 6)) <= 1e-6
    f1 = 2 * p * r / (p + r)
    assert abs(got["b3_f1"][0] - round(f1, 6)) <= 1e-6
    assert int(got["n_records"][0]) == n
