"""Fellegi-Sunter probabilistic record linkage: EM estimation of
match/unmatch agreement probabilities over candidate-pair comparison
vectors (Fellegi & Sunter 1969; Winkler's EM formulation).

The classical statistical model behind every rule-of-thumb "agreement
weight" in record linkage: each candidate pair carries binary agreement
features x = (x_1..x_k); EM fits P(match) and per-feature m_i = P(x_i=1 |
match), u_i = P(x_i=1 | unmatch) without labels; log2(m/u) is the
feature's agreement weight. The reference scores identifier/name matches
with fixed heuristics (belb/kbs/kb.py synonym resolution — SURVEY §2.5
J3/J4); this op LEARNS those weights from the candidate distribution.

Distributed shape: the E-step posterior is a per-row vectorized
expression of the broadcast parameter vector — one streaming map_batches
pass per EM iteration producing ONE fixed-width partial row per block
(Σr, Σr·x_i, Σ(1−r)·x_i, n); the driver M-step is O(k). No shuffles at
any scale; the pair set is materialized once and re-streamed.

Cross-engine determinism: posteriors are quantized to 2^-30 before the
partial sums, so every partial is an exact multiple of 2^-30 and float64
block sums are EXACTLY associative while n·2^30 < 2^53 (~8.4M pairs per
run — past that, quantize coarser). The pinned golden re-runs the same
EM single-process and matches bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd
from ..util import round_half_away

_QUANT = float(1 << 30)


def _em_partials(pairs: rd.Dataset, feature_cols: list[str],
                 p: float, m: np.ndarray, u: np.ndarray) -> pd.DataFrame:
    """One E-step pass → summed partials (n, sr, srx_i, sux_i)."""

    def _partial(batch: pd.DataFrame) -> pd.DataFrame:
        x = batch[feature_cols].to_numpy(np.float64)
        # log-domain products guard against underflow at many features
        lm = x @ np.log(m) + (1.0 - x) @ np.log1p(-m)
        lu = x @ np.log(u) + (1.0 - x) @ np.log1p(-u)
        a = np.log(p) + lm
        b = np.log1p(-p) + lu
        r = 1.0 / (1.0 + np.exp(b - a))
        r = round_half_away(r * _QUANT) / _QUANT  # exact-sum quantization
        row = {"n": [np.float64(len(r))], "sr": [r.sum()]}
        for i, c in enumerate(feature_cols):
            rx = r * x[:, i]
            row[f"srx_{i}"] = [rx.sum()]
            row[f"sux_{i}"] = [(x[:, i] - rx).sum()]
        return pd.DataFrame(row)

    parts = pairs.map_batches(_partial, batch_format="pandas").to_pandas()
    return parts.sum(axis=0)


def fs_em_weights(pairs: rd.Dataset, feature_cols: list[str],
                  iters: int = 15, init_p: float = 0.1,
                  init_m: float = 0.9, init_u: float = 0.1,
                  eps: float = 1e-6) -> pd.DataFrame:
    """EM-fit Fellegi-Sunter parameters over binary agreement features →
    one row per feature (feature, m, u, weight_agree, weight_disagree)
    plus a ``__match_prior`` row carrying P(match) in ``m``. Weights are
    log2 likelihood ratios, the classical linkage scores."""
    if not feature_cols:
        raise ValueError("need at least one feature column")
    pairs = pairs.select_columns(feature_cols).materialize()
    k = len(feature_cols)
    p = float(init_p)
    m = np.full(k, init_m, np.float64)
    u = np.full(k, init_u, np.float64)
    for _ in range(iters):
        s = _em_partials(pairs, feature_cols, p, m, u)
        n, sr = float(s["n"]), float(s["sr"])
        if n == 0:
            raise ValueError("no candidate pairs")
        su = n - sr
        p = min(max(sr / n, eps), 1.0 - eps)
        for i in range(k):
            m[i] = min(max(float(s[f"srx_{i}"]) / max(sr, eps), eps),
                       1.0 - eps)
            u[i] = min(max(float(s[f"sux_{i}"]) / max(su, eps), eps),
                       1.0 - eps)
    rows = [("__match_prior", p, 0.0, 0.0, 0.0)]
    for i, c in enumerate(feature_cols):
        rows.append((c, m[i], u[i],
                     float(np.log2(m[i] / u[i])),
                     float(np.log2((1.0 - m[i]) / (1.0 - u[i])))))
    out = pd.DataFrame(rows, columns=["feature", "m", "u",
                                      "weight_agree", "weight_disagree"])
    for c in ("m", "u", "weight_agree", "weight_disagree"):
        out[c] = round_half_away(out[c].to_numpy(np.float64), 8)
    return out


def fs_score_pairs(pairs: rd.Dataset, feature_cols: list[str],
                   weights: pd.DataFrame,
                   id_cols: tuple = ("id_a", "id_b"),
                   min_posterior: float | None = None,
                   round_to: int = 6) -> rd.Dataset:
    """Score candidate pairs with FITTED Fellegi-Sunter parameters →
    pairs + (weight, posterior). ``weights`` is ``fs_em_weights``'s
    output table (8dp-rounded m/u per feature + the ``__match_prior``
    row) — scoring from the ROUNDED table is the determinism contract:
    any engine recomputing from the same table gets bit-identical
    doubles. ``weight`` is the classical composite log2 likelihood
    ratio; ``posterior`` is P(match | x) under the fitted mixture,
    quantized to 2^-30 (the EM's own grid) then rounded.

    One streaming ``map_batches``; the parameter table is O(k) and rides
    the task closure — no broadcast, no shuffle, no state."""
    w = weights.set_index("feature")
    p = float(w.loc["__match_prior", "m"])
    m = w.loc[feature_cols, "m"].to_numpy(np.float64)
    u = w.loc[feature_cols, "u"].to_numpy(np.float64)
    thr = None if min_posterior is None else float(min_posterior)

    def _score(b: pd.DataFrame) -> pd.DataFrame:
        x = b[feature_cols].to_numpy(np.float64)
        lm = x @ np.log(m) + (1.0 - x) @ np.log1p(-m)
        lu = x @ np.log(u) + (1.0 - x) @ np.log1p(-u)
        la = np.log(p) + lm
        lb = np.log1p(-p) + lu
        r = 1.0 / (1.0 + np.exp(lb - la))
        r = round_half_away(r * _QUANT) / _QUANT
        wgt = x @ np.log2(m / u) + (1.0 - x) @ np.log2((1.0 - m) / (1.0 - u))
        out = b[[*id_cols, *feature_cols]].copy()
        out["weight"] = round_half_away(wgt, round_to)
        out["posterior"] = round_half_away(r, round_to)
        if thr is not None:
            out = out[out["posterior"].to_numpy() >= thr]
        return out

    return pairs.map_batches(_score, batch_format="pandas")
