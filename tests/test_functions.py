"""Unit tests for the pure kernels (no Ray)."""

import numpy as np

from belb_ray.functions.hashing import (
    char_shingle_hashes,
    ngram_hashes,
    sha256_hex_list,
    stable_id64_list,
    token_hashes,
)
from belb_ray.functions.minhash import (
    MinHasher,
    band_keys,
    est_jaccard,
    hamming64,
    simhash64,
)
from belb_ray.functions.similarity import cosine_topk, jaro_winkler, token_set_ratio
from belb_ray.functions.text import (
    normalize_text,
    path_tokens,
    sorted_neighborhood_key,
    tokenize,
)
from belb_ray.functions.textstats import (
    fingerprint64,
    lang_id,
    quality_features,
    token_count,
)


def test_sha256_matches_known_vector():
    assert sha256_hex_list(["abc"])[0] == (
        "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad")
    assert sha256_hex_list([None]) == [None]


def test_stable_ids_deterministic_and_distinct():
    a = stable_id64_list(["r1", "r1"], ["p1", "p2"])
    b = stable_id64_list(["r1", "r1"], ["p1", "p2"])
    assert (a == b).all() and a[0] != a[1] and (a >= 0).all()


def test_ngram_hashes_shift_sensitive():
    base = token_hashes(["a", "b", "c", "d"])
    h3 = ngram_hashes(base, 3)
    assert len(h3) == 2 and h3[0] != h3[1]
    # shorter than n collapses to one whole-sequence hash
    assert len(ngram_hashes(base[:2], 3)) == 1


def test_minhash_estimates_jaccard():
    mh = MinHasher(256, seed=1)
    rng = np.random.default_rng(0)
    a = rng.integers(0, 2**63, 1000).astype(np.uint64)
    b = np.concatenate([a[:800], rng.integers(0, 2**63, 200).astype(np.uint64)])
    true_j = len(np.intersect1d(a, b)) / len(np.union1d(a, b))
    est = est_jaccard(mh.signature(a)[None, :], mh.signature(b)[None, :])[0]
    assert abs(est - true_j) < 0.08


def test_identical_content_identical_signature():
    mh = MinHasher(128, seed=7)
    h = char_shingle_hashes("the same content twice", 5)
    assert (mh.signature(h) == mh.signature(h.copy())).all()


def test_band_keys_shared_for_near_dups_only():
    mh = MinHasher(128, seed=7)
    rng = np.random.default_rng(5)
    vocab = np.array([f"w{i}" for i in range(300)])
    doc = vocab[rng.integers(0, 300, 150)]
    near = doc.copy()
    near[[10, 80]] = ["x1", "x2"]  # 2 token edits → high shingle Jaccard
    other = vocab[rng.integers(0, 300, 150)]
    t1 = token_hashes(list(doc))
    t2 = token_hashes(list(near))
    t3 = token_hashes(list(other))
    sigs = np.vstack([mh.signature(ngram_hashes(t, 3)) for t in (t1, t2, t3)])
    keys = band_keys(sigs, bands=32)
    assert len(set(keys[0]) & set(keys[1])) > 0
    assert len(set(keys[0]) & set(keys[2])) == 0


def test_simhash_hamming_orders_similarity():
    t1 = token_hashes(tokenize("alpha beta gamma delta epsilon " * 20))
    t2 = token_hashes(tokenize("alpha beta gamma delta zeta " * 20))
    t3 = token_hashes(tokenize("unrelated totally different thing " * 20))
    d12 = hamming64(np.array([simhash64(t1)]), np.array([simhash64(t2)]))[0]
    d13 = hamming64(np.array([simhash64(t1)]), np.array([simhash64(t3)]))[0]
    assert d12 < d13


def test_jaro_winkler_reference_value():
    assert abs(jaro_winkler("martha", "marhta") - 0.9611111111111111) < 1e-9
    assert jaro_winkler("", "x") == 0.0
    assert jaro_winkler("same", "same") == 1.0


def test_jaro_winkler_batch_matches_scalar():
    import itertools
    import random
    import string

    from belb_ray.functions.similarity import jaro_winkler_batch

    rng = random.Random(11)
    alpha = string.ascii_lowercase + "/._-09"
    short = ["", "a", "ab", "abc", "s/0", "ab/c", "x", "abcd", "abcde"]
    cases = list(itertools.product(short, short))
    for _ in range(800):
        a = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 40)))
        if rng.random() < 0.4:
            b = list(a)
            for _ in range(rng.randint(1, 3)):
                if b:
                    b[rng.randrange(len(b))] = rng.choice(alpha)
            b = "".join(b)
        else:
            b = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 40)))
        cases.append((a, b))
    # scalar-fallback rows: non-ASCII and overlong
    cases += [("héllo/wörld.py", "hello/world.py"), ("a" * 300, "a" * 299)]
    vec = jaro_winkler_batch([a for a, _ in cases], [b for _, b in cases])
    for i, (a, b) in enumerate(cases):
        assert abs(jaro_winkler(a, b) - vec[i]) < 1e-12, (a, b)


def test_token_set_ratio():
    assert token_set_ratio({"a", "b"}, {"a", "b"}) == 1.0
    assert token_set_ratio({"a"}, {"b"}) == 0.0
    assert token_set_ratio(set(), set()) == 1.0


def test_cosine_topk_deterministic():
    rng = np.random.default_rng(3)
    q, c = rng.normal(size=(2, 16)), rng.normal(size=(50, 16))
    i1, s1 = cosine_topk(q, c, 5)
    i2, s2 = cosine_topk(q, c, 5)
    assert (i1 == i2).all()
    assert (np.diff(s1, axis=1) <= 1e-12).all()  # descending


def test_text_normalize_and_tokens():
    assert normalize_text("a b   c\n\nd") == "a b c d"
    assert tokenize("Foo_bar baz-qux") == ["foo_bar", "baz", "qux"]
    assert path_tokens("src/util/foo_bar.py") == ["src", "util", "foo", "bar", "py"]
    assert sorted_neighborhood_key("src/util/foo_bar.py") == "bar.foo"


def test_textstats():
    assert token_count("a b  c") == 3
    n_chars, n_words, mwl, stop = quality_features("the cat sat")
    assert (n_chars, n_words) == (11, 3) and 0 < stop < 1
    assert lang_id("the cat and the dog of the house") == "en"
    assert fingerprint64("a b c d e f g h") == fingerprint64("a  b c d e f g  h")
    assert fingerprint64("a b c d e f g h") != fingerprint64("a b c d e f g x")


def test_textstats_batch_twins_match_scalar():
    """The vectorized pyarrow token-count kernels must equal the scalar
    spec kernels row-for-row (the goldens/oracles were generated from
    the scalar forms)."""
    import random
    import string

    from belb_ray.functions.textstats import (
        bpe_ish_token_count,
        bpe_ish_token_count_batch,
        token_count_batch,
    )

    rng = random.Random(7)
    vocab = ["the", "a", "of", "cat", "sat", "und", "der", "les", "que",
             "mat!", "x9", "The.", "AND", "it,", "in"]
    texts = ["", " ", "the", "  the  ", "a.b,c!d", "The cat AND the dog",
             "der die und sch ein ich den", "les des que de ion eur"]
    for _ in range(200):
        n = rng.randint(0, 30)
        texts.append(" ".join(rng.choice(vocab) for _ in range(n)))
    for _ in range(50):
        texts.append("".join(rng.choice(string.printable[:95])
                             for _ in range(rng.randint(0, 120))))

    tc = token_count_batch(texts)
    bc = bpe_ish_token_count_batch(texts)
    for i, t in enumerate(texts):
        assert tc[i] == token_count(t), repr(t)
        assert bc[i] == bpe_ish_token_count(t), repr(t)


def test_round_half_away_matches_duckdb():
    """Ties round AWAY from zero (SQL semantics), not to even (numpy) —
    verified value-for-value against DuckDB's round()."""
    import duckdb
    import numpy as np
    import pandas as pd

    from belb_ray.util import round_half_away

    vals = [33.48125, 2.5, 3.5, -2.5, -33.48125, 0.05, -0.05,
            1.23456789, -1.23456789, 0.0, 1e12 + 0.5]
    for d in (0, 2, 4):
        got = round_half_away(np.array(vals), d)
        con = duckdb.connect()
        want = [con.execute(
            f"SELECT round(CAST(? AS DOUBLE), {d})", [v]).fetchone()[0]
            for v in vals]
        assert got.tolist() == want, (d, got.tolist(), want)
    # scalar + Series forms
    assert round_half_away(33.48125, 4) == 33.4813
    s = round_half_away(pd.Series([2.5, -2.5]), 0)
    assert s.tolist() == [3.0, -3.0]
    # NaN passes through
    import math

    assert math.isnan(round_half_away(float("nan"), 2))


def test_moment_stats_decimals_partitioning_independent():
    """Exact-units moments: identical bits under any partitioning, and
    equal to the closed-form computed from exact integer cents."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from belb_ray.stages.agg import moment_stats

    rng = np.random.default_rng(3)
    df = pd.DataFrame({
        "k": rng.integers(0, 5, 400),
        "v": np.round(rng.uniform(0, 100, 400), 2)})
    outs = []
    for nparts in (1, 3, 17):
        out = moment_stats(rd.from_pandas(df).repartition(nparts),
                           ["k"], "v", decimals=2).to_pandas()
        outs.append(out.sort_values("k").reset_index(drop=True))
    for o in outs[1:]:
        pd.testing.assert_frame_equal(outs[0], o)
    # closed form from exact cents
    c = np.round(df["v"].to_numpy() * 100).astype(np.int64)
    for k, g in pd.DataFrame({"k": df["k"], "c": c}).groupby("k"):
        n = len(g)
        sc, sc2 = int(g["c"].sum()), int((g["c"] ** 2).sum())
        row = outs[0][outs[0]["k"] == k].iloc[0]
        assert row["mean"] == float(sc) / (100.0 * n)
        assert row["var"] == float(n * sc2 - sc * sc) / (
            (100.0 * 100.0 * n) * (n - 1))


def test_embedding_neardup_sim_batchsize_invariant():
    """Quantized-exact cosine: the emitted sim values are bit-identical
    across batch sizes / partitionings (the float matmul was not)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from belb_ray.stages.ann import embedding_neardup_pairs

    rng = np.random.default_rng(5)
    vecs = rng.standard_normal((300, 16)).astype(np.float32)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(300), pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs],
                              pa.list_(pa.float32()))})
    outs = []
    for nparts in (1, 7):
        out = embedding_neardup_pairs(
            rd.from_arrow(tbl).repartition(nparts),
            threshold=0.2).to_pandas()
        outs.append(out.sort_values(["id_a", "id_b"])
                    .reset_index(drop=True))
    assert len(outs[0]) > 0
    import pandas as pd

    pd.testing.assert_frame_equal(outs[0], outs[1])
