"""Correlation clustering / KwikCluster (stages/corrcluster)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from belb_ray.stages.corrcluster import kwik_cluster, order_key


def _reference(edges, seed):
    """Plain round-major pivot walk (mirrors the golden)."""
    def key(i):
        return int(order_key(np.array([i], np.int64), seed)[0])

    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    cluster, active, rounds = {}, set(adj), 0
    while active:
        rounds += 1
        pivots = {v for v in active
                  if all(key(v) < key(w) for w in adj[v] if w in active)}
        removed = set()
        for v in active:
            cand = [w for w in adj[v] if w in pivots]
            if v in pivots:
                cluster[v] = v
                removed.add(v)
            elif cand:
                cluster[v] = min(cand, key=lambda w: (key(w), w))
                removed.add(v)
        active -= removed
    return cluster, rounds


def _run(edges, seed, **kw):
    t = pa.table({"id_a": pa.array([a for a, _ in edges], pa.int64()),
                  "id_b": pa.array([b for _, b in edges], pa.int64())})
    out = kwik_cluster(rd.from_arrow(t), seed=seed, **kw).to_pandas()
    return dict(zip(out.row_id, out.cluster_id))


def test_kwik_matches_reference_on_random_graphs(ray_session):
    rng = np.random.default_rng(0)
    for seed in (0, 5, 11):
        n = 60
        edges = {(int(a) + 1, int(b) + 1)
                 for a, b in rng.integers(0, n, (150, 2)) if a < b}
        want, _ = _reference(edges, seed)
        got = _run(edges, seed)
        assert got == want


def test_kwik_chain_and_pivot_invariants(ray_session):
    edges = [(i, i + 1) for i in range(1, 40)]  # adversarial path
    want, rounds = _reference(edges, seed=3)
    got = _run(edges, seed=3)
    assert got == want
    # every cluster label is a pivot: it labels itself
    for v, c in got.items():
        assert got[c] == c
        # members are adjacent to their pivot (KwikCluster invariant)
        if v != c:
            assert (v, c) in set(edges) or (c, v) in set(edges)
    assert rounds > 1  # hashed keys still need >1 peel on a path


def test_kwik_not_transitive_like_components(ray_session):
    # a-b, b-c: components give one cluster; KwikCluster splits when b's
    # pivot takes only one side — with any seed, clusters ⊆ components
    got = _run([(1, 2), (2, 3)], seed=0)
    assert set(got) == {1, 2, 3}
    assert len(set(got.values())) in (1, 2)


def test_kwik_max_rounds_budget_is_loud(ray_session):
    edges = [(i, i + 1) for i in range(1, 40)]
    _, rounds = _reference(edges, seed=3)
    assert rounds > 1
    with pytest.raises(ValueError, match="did not converge"):
        _run(edges, seed=3, max_rounds=1)


def test_kwik_singleton_edge_and_empty(ray_session):
    got = _run([(9, 9)], seed=1)  # self-pair degenerates to a singleton
    assert got == {9: 9}


def test_blocking_ablation_invariants(ray_session):
    from belb_ray.sources.synthetic import make_fixture
    from belb_ray.stages.ereval import blocking_ablation

    fx = make_fixture(n_files=800, seed=42)
    out = blocking_ablation(rd.from_arrow(fx["files"]),
                            rd.from_arrow(fx["gold_pairs"])).to_pandas()
    out = out.set_index("scheme")
    schemes = {"minhash_bands", "path_snm"}
    assert set(out.index) == schemes | {"union", "collapse"}
    union = out.loc["union"]
    for s in schemes:
        r = out.loc[s]
        assert 0 <= r.gold_covered <= union.gold_covered
        assert 0 <= r.unique_gold <= r.gold_covered
        assert 0.0 <= r.gold_recall <= 1.0
    # union coverage >= best single scheme; recall consistent with counts
    assert union.gold_covered >= max(out.loc[s].gold_covered
                                     for s in schemes)
    # unique contributions can't exceed what the union holds
    assert sum(out.loc[s].unique_gold for s in schemes) <= union.gold_covered
