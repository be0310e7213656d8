"""Privacy-preserving record linkage (stages/pprl)."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from belb_ray.stages.pprl import (band_keys, bloom_encode, clk_cardinality,
                                  clk_encode, pprl_dice_links)

M64 = (1 << 64) - 1


def _mix_py(v: int, salt: int) -> int:
    v = ((v + salt) * 0x9E3779B97F4A7C15) & M64
    return ((v ^ (v >> 29)) * 0xC2B2AE3D27D4EB4F) & M64


def _encode_py(fields, m_bits=512, k=8, seed=7) -> set:
    """Per-row plain-Python CLK reference (independent of the vectorized
    flat-buffer kernel)."""
    pos = set()
    for f_idx, s in enumerate(fields):
        b = s.encode("utf-8")  # lowercasing lives in bloom_encode's _norm
        for i in range(len(b) - 1):
            v = ((b[i] << 8) | b[i + 1]) | ((f_idx + 1) << 16)
            h1 = _mix_py(v, seed) % m_bits
            h2 = (_mix_py(v, seed + 0x51ED) % m_bits) | 1
            for j in range(k):
                pos.add((h1 + j * h2) % m_bits)
    return pos


def _bits_of(packed_row: np.ndarray) -> set:
    return set(np.flatnonzero(np.unpackbits(packed_row)))


def test_clk_encode_matches_per_row_reference():
    f0 = ["John Smith", "jane-doe", "", "émile"]
    f1 = ["42 Oak St", "", "x", "42 oak st"]
    packed = clk_encode([f0, f1])
    assert packed.shape == (4, 64)
    for i in range(4):
        assert _bits_of(packed[i]) == _encode_py((f0[i], f1[i]))
    # cardinality = popcount
    np.testing.assert_array_equal(
        clk_cardinality(packed),
        [len(_bits_of(packed[i])) for i in range(4)])


def test_clk_field_salting():
    a = clk_encode([["ab"], [""]])
    b = clk_encode([[""], ["ab"]])
    assert _bits_of(a[0]) != _bits_of(b[0])  # same bigram, different field
    assert _bits_of(clk_encode([["ab c"]])[0]) == _encode_py(("ab c",))


def test_band_keys_deterministic_and_discriminating():
    packed = clk_encode([["alpha beta", "alpha beta", "totally other"]])
    keys = band_keys(packed, bands=16, bytes_per_band=3, seed=7)
    np.testing.assert_array_equal(keys[0], keys[1])  # identical filters
    assert (keys[0] != keys[2]).any()


def test_pprl_links_end_to_end_and_scale_path_agrees(ray_session):
    t = pa.table({
        "row_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "nm": ["john smith", "john smith", "jon smith", "mary jones",
               "zzzz qqqq"],
        "addr": ["12 oak st", "12 oak st", "12 oak st", "9 elm ave",
                 "1 pine rd"],
    })
    out = pprl_dice_links(rd.from_arrow(t), "row_id", ["nm", "addr"],
                          threshold=0.7).to_pandas()
    got = set(zip(out.id_a, out.id_b))
    # identical rows 1/2 collapse to rep 1; 3 is a near-dup of the rep
    assert (1, 3) in got
    assert all(a == 1 or a > 2 for a, _ in got)  # 2 never appears (collapsed)
    assert not any(5 in p for p in got)  # unrelated record links to nothing
    assert ((out.dice >= 0.7) & (out.dice <= 1.0)).all()

    # hash-join scale path (broadcast budget 0) must agree exactly
    out2 = pprl_dice_links(rd.from_arrow(t), "row_id", ["nm", "addr"],
                           threshold=0.7, broadcast_rows=0).to_pandas()
    a = out.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    b = out2.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    assert a.equals(b)


def test_pprl_exact_threshold_boundary(ray_session):
    # two records whose filters give a known Dice: identical → 1.0 always
    t = pa.table({
        "row_id": pa.array([10, 11], pa.int64()),
        "nm": ["abcdef", "abcdxy"],
    })
    lo = pprl_dice_links(rd.from_arrow(t), "row_id", ["nm"],
                         threshold=0.01).to_pandas()
    assert len(lo) == 1
    d = float(lo.dice.iloc[0])
    # reported dice is round(exact, 6), so |d - exact| <= 5e-7: a 2e-6
    # margin either side is decisive under the integer >= comparison
    at = pprl_dice_links(rd.from_arrow(t), "row_id", ["nm"],
                         threshold=d - 2e-6).to_pandas()
    assert len(at) == 1
    above = pprl_dice_links(rd.from_arrow(t), "row_id", ["nm"],
                            threshold=min(1.0, d + 2e-6)).to_pandas()
    assert len(above) == 0


def test_bloom_encode_schema(ray_session):
    t = pa.table({"row_id": pa.array([7], pa.int64()), "nm": ["hello"]})
    enc = bloom_encode(rd.from_arrow(t), "row_id", ["nm"]).take_all()
    assert len(enc) == 1
    row = enc[0]
    assert len(row["bloom"]) == 64 and row["card"] > 0


def test_fs_score_pairs_separates_planted_structure(ray_session):
    import pandas as pd
    from belb_ray.stages.fellegi import fs_em_weights, fs_score_pairs

    rng = np.random.default_rng(4)
    n = 400
    match = rng.random(n) < 0.2
    x = np.where(match[:, None],
                 rng.random((n, 3)) < 0.95,
                 rng.random((n, 3)) < 0.05).astype(np.int8)
    t = pa.table({
        "id_a": pa.array(np.arange(n), pa.int64()),
        "id_b": pa.array(np.arange(n) + 10_000, pa.int64()),
        "f1": x[:, 0], "f2": x[:, 1], "f3": x[:, 2],
    })
    ds = rd.from_arrow(t).materialize()
    cols = ["f1", "f2", "f3"]
    w = fs_em_weights(ds, cols, iters=10)
    out = fs_score_pairs(ds, cols, w).to_pandas()
    assert len(out) == n
    full = out[(out.f1 == 1) & (out.f2 == 1) & (out.f3 == 1)]
    none = out[(out.f1 == 0) & (out.f2 == 0) & (out.f3 == 0)]
    assert (full.posterior > 0.9).all()
    assert (none.posterior < 0.1).all()
    assert (full.weight > none.weight.max()).all()
    kept = fs_score_pairs(ds, cols, w, min_posterior=0.5).to_pandas()
    assert set(map(tuple, kept[["id_a", "id_b"]].to_numpy())) == \
        set(map(tuple, out[out.posterior >= 0.5][["id_a", "id_b"]].to_numpy()))
