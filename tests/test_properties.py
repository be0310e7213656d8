"""Property-based tests (hypothesis) for the pure similarity /
clustering kernels — no Ray session needed, so these run in
milliseconds and fuzz far wider input space than the example-based
tests. Each property pins a kernel to an independent reference:
DuckDB's C implementations for the string metrics, a dict union-find
for connected components, int.bit_count for Hamming."""

from __future__ import annotations

import duckdb
import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

WORD = st.text(alphabet="abcdefgh ", min_size=0, max_size=12)


@settings(max_examples=200, deadline=None)
@given(WORD, WORD)
def test_jaro_winkler_matches_duckdb(a, b):
    from belb_ray.functions.similarity import jaro_winkler

    got = jaro_winkler(a, b)
    if a == "" and b == "":
        # documented convention divergence: identical (empty) strings
        # score 1.0 here; DuckDB returns 0.0 for the both-empty case.
        # Oracled queries never compare two empty names.
        assert got == 1.0
        return
    exp = duckdb.sql(
        "SELECT jaro_winkler_similarity(?, ?)", params=[a, b]
    ).fetchone()[0]
    assert abs(got - float(exp)) < 1e-12, (a, b)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(WORD, WORD), min_size=1, max_size=20))
def test_jaro_winkler_batch_matches_scalar(pairs):
    from belb_ray.functions.similarity import (jaro_winkler,
                                               jaro_winkler_batch)

    al = [a for a, _ in pairs]
    bl = [b for _, b in pairs]
    got = jaro_winkler_batch(al, bl)
    exp = np.array([jaro_winkler(a, b) for a, b in pairs])
    assert np.allclose(got, exp, atol=1e-12), pairs


@settings(max_examples=200, deadline=None)
@given(WORD, WORD)
def test_levenshtein_matches_duckdb(a, b):
    from belb_ray.functions.similarity import levenshtein

    exp = duckdb.sql("SELECT levenshtein(?, ?)",
                     params=[a, b]).fetchone()[0]
    assert levenshtein(a, b) == int(exp), (a, b)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 2**63 - 1),
                          st.integers(0, 2**63 - 1)),
                min_size=1, max_size=30))
def test_hamming64_matches_bit_count(pairs):
    from belb_ray.functions.minhash import hamming64

    a = np.array([p[0] for p in pairs], np.uint64)
    b = np.array([p[1] for p in pairs], np.uint64)
    got = hamming64(a, b)
    exp = np.array([(x ^ y).bit_count() for x, y in pairs], np.int64)
    assert (got.astype(np.int64) == exp).all()


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 30), st.integers(0, 30)),
                min_size=1, max_size=60))
def test_uf_solve_matches_dict_union_find(edges):
    from belb_ray.stages.cluster import _uf_solve

    a = np.array([e[0] for e in edges], np.int64)
    b = np.array([e[1] for e in edges], np.int64)
    nodes, labels = _uf_solve(a, b)

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for x, y in edges:
        parent[find(x)] = find(y)
    comp: dict[int, int] = {}
    for n in set(a) | set(b):
        r = find(int(n))
        comp[int(n)] = min(comp.get(r, int(n)), int(n)) \
            if r in comp else int(n)
    # recompute min-label per root exactly
    roots: dict[int, int] = {}
    for n in sorted(set(int(v) for v in np.concatenate((a, b)))):
        r = find(n)
        roots.setdefault(r, n)  # first seen = smallest (sorted)
    exp = {n: roots[find(n)]
           for n in set(int(v) for v in np.concatenate((a, b)))}
    got = dict(zip(nodes.tolist(), labels.tolist()))
    assert got == exp, edges


@settings(max_examples=100, deadline=None)
@given(st.integers(0, 2**32 - 1),
       st.lists(st.integers(0, 127), min_size=0, max_size=7,
                unique=True),
       st.sampled_from([8, 16, 32]))
def test_band_keys_pigeonhole(seed, diff_positions, bands):
    # LSH recall guarantee: two signatures differing in FEWER components
    # than there are bands MUST share at least one identical band key
    from belb_ray.functions.minhash import band_keys

    rng = np.random.default_rng(seed)
    num_perm = 128
    sig_a = rng.integers(0, 2**63, (1, num_perm)).astype(np.uint64)
    sig_b = sig_a.copy()
    for p in diff_positions[:bands - 1]:  # < bands differing components
        sig_b[0, p] ^= np.uint64(1)
    ka = band_keys(sig_a, bands)
    kb = band_keys(sig_b, bands)
    assert (ka == kb).any(), (diff_positions, bands)


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="ab \t\n -", min_size=0, max_size=30))
def test_normalize_text_idempotent(s):
    import pyarrow as pa

    from belb_ray.functions.text import normalize_text_array

    once = normalize_text_array(pa.array([s])).to_pylist()[0]
    twice = normalize_text_array(pa.array([once])).to_pylist()[0]
    assert once == twice, repr(s)
