"""Pairwise similarity kernels for the scoring stage (SURVEY §7.1 "score").

The reference's in-repo seed for string similarity is the mean pairwise
Levenshtein ratio within a synset (belb/scripts/stats.py:203-250 — SURVEY
§2.6 A12). The graft's hybrid score = Jaccard-on-shingles (estimated from
MinHash signatures, vectorized) + Jaro-Winkler on path + token-set ratio,
combined with fixed weights. All tie-breaks are total-order deterministic
(id-sorted pairs) so thresholds behave identically across partitions.
"""

from __future__ import annotations

import numpy as np


def jaro_winkler(s1: str, s2: str, prefix_weight: float = 0.1,
                 boost_threshold: float = 0.7) -> float:
    """Standard Jaro-Winkler similarity (scalar; called only on blocked
    candidate pairs, whose count is capped per block). The Winkler prefix
    boost applies only when jaro > boost_threshold (0.7, the canonical
    value — matches DuckDB's ``jaro_winkler_similarity``)."""
    if s1 == s2:
        return 1.0
    len1, len2 = len(s1), len(s2)
    if len1 == 0 or len2 == 0:
        return 0.0
    match_dist = max(len1, len2) // 2 - 1
    flags1 = [False] * len1
    flags2 = [False] * len2
    matches = 0
    for i, c1 in enumerate(s1):
        lo = max(0, i - match_dist)
        hi = min(len2, i + match_dist + 1)
        for j in range(lo, hi):
            if not flags2[j] and s2[j] == c1:
                flags1[i] = flags2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    t_half = 0
    k = 0
    for i in range(len1):
        if flags1[i]:
            while not flags2[k]:
                k += 1
            if s1[i] != s2[k]:
                t_half += 1
            k += 1
    # canonical transposition count: PAIRS of out-of-order matches
    # (integer floor), as in Apache commons / RapidFuzz / DuckDB —
    # verified bit-identical to DuckDB's jaro_winkler_similarity by fuzz
    t = t_half // 2
    jaro = (matches / len1 + matches / len2 + (matches - t) / matches) / 3.0
    if jaro <= boost_threshold:
        return jaro
    prefix = 0
    for c1, c2 in zip(s1[:4], s2[:4]):
        if c1 != c2:
            break
        prefix += 1
    return jaro + prefix * prefix_weight * (1.0 - jaro)


def jaro_winkler_batch(a_list: list[str], b_list: list[str],
                       prefix_weight: float = 0.1,
                       boost_threshold: float = 0.7,
                       max_len: int = 128) -> np.ndarray:
    """Vectorized Jaro-Winkler over aligned string lists — numerically
    IDENTICAL to the scalar ``jaro_winkler`` (same greedy matching, same
    half-transposition count, same float formula), ~30-50x faster.

    The matching loop runs over character POSITIONS (≤ max batch string
    length) with numpy ops across all pairs at once, instead of a Python
    loop per pair. Rows that are non-ASCII or longer than ``max_len``
    fall back to the scalar kernel (the fixed-width uint8 matrix view
    only equals Python-string semantics for ASCII)."""
    n = len(a_list)
    out = np.empty(n, dtype=np.float64)
    if n == 0:
        return out
    lena = np.fromiter((len(s) for s in a_list), np.int64, n)
    lenb = np.fromiter((len(s) for s in b_list), np.int64, n)
    ok = np.fromiter(
        (la <= max_len and lb <= max_len and a.isascii() and b.isascii()
         for a, b, la, lb in zip(a_list, b_list, lena, lenb)),
        bool, n)
    for i in np.flatnonzero(~ok):
        out[i] = jaro_winkler(a_list[i], b_list[i], prefix_weight,
                              boost_threshold)
    idx = np.flatnonzero(ok)
    if idx.size == 0:
        return out
    sa = [a_list[i] for i in idx]
    sb = [b_list[i] for i in idx]
    la, lb = lena[idx], lenb[idx]
    m = idx.size
    L = int(max(la.max(), lb.max(), 1))
    A = np.array(sa, dtype=f"S{L}").view(np.uint8).reshape(m, L)
    B = np.array(sb, dtype=f"S{L}").view(np.uint8).reshape(m, L)

    res = np.zeros(m, dtype=np.float64)
    eq = (la == lb) & (A == B).all(axis=1)
    res[eq] = 1.0
    live = ~eq & (la > 0) & (lb > 0)  # either empty (and not equal) → 0.0

    md = np.maximum(la, lb) // 2 - 1  # may be negative, as in the scalar
    flags2 = np.zeros((m, L), dtype=bool)
    matched1 = np.zeros((m, L), dtype=bool)
    jidx = np.arange(L)
    for i in range(L):
        active = live & (i < la)
        if not active.any():
            continue
        cand = ((B == A[:, i][:, None]) & ~flags2
                & (jidx[None, :] >= np.maximum(0, i - md)[:, None])
                & (jidx[None, :] < np.minimum(lb, i + md + 1)[:, None])
                & active[:, None])
        has = cand.any(axis=1)
        first = cand.argmax(axis=1)
        flags2[has, first[has]] = True
        matched1[has, i] = True
    matches = matched1.sum(axis=1)

    # half-transpositions: compare matched chars of A (in i order) against
    # matched chars of B (in j order), rank-scattered into dense rows
    pos1 = np.where(matched1, np.cumsum(matched1, axis=1) - 1, L)
    pos2 = np.where(flags2, np.cumsum(flags2, axis=1) - 1, L)
    M1 = np.zeros((m, L + 1), dtype=np.uint8)
    M2 = np.zeros((m, L + 1), dtype=np.uint8)
    np.put_along_axis(M1, pos1, A, axis=1)
    np.put_along_axis(M2, pos2, B, axis=1)
    t_half = ((M1[:, :L] != M2[:, :L])
              & (jidx[None, :] < matches[:, None])).sum(axis=1)

    mf = matches.astype(np.float64)
    has_m = live & (matches > 0)
    denom = np.maximum(mf, 1.0)
    # clamp lengths for the dead rows (result discarded) to avoid 0-division
    jaro = (mf / np.maximum(la, 1) + mf / np.maximum(lb, 1)
            + (mf - (t_half // 2)) / denom) / 3.0

    k4 = min(L, 4)
    pref_eq = (A[:, :k4] == B[:, :k4]) & \
        (np.arange(k4)[None, :] < np.minimum(np.minimum(la, lb), k4)[:, None])
    prefix = np.cumprod(pref_eq, axis=1).sum(axis=1)
    boosted = np.where(jaro > boost_threshold,
                       jaro + prefix * prefix_weight * (1.0 - jaro), jaro)
    res[has_m] = boosted[has_m]
    out[idx] = res
    return out


def levenshtein(s1: str, s2: str) -> int:
    """Plain Levenshtein edit distance (integer DP — exactly reproducible
    across engines, unlike float Jaro variants). The reference's synset
    similarity stat is a mean pairwise Levenshtein ratio
    (belb/scripts/stats.py:203-250 — SURVEY A12)."""
    if s1 == s2:
        return 0
    if len(s1) < len(s2):
        s1, s2 = s2, s1
    if not s2:
        return len(s1)
    prev = list(range(len(s2) + 1))
    for i, c1 in enumerate(s1):
        cur = [i + 1]
        for j, c2 in enumerate(s2):
            cur.append(min(prev[j + 1] + 1, cur[j] + 1,
                           prev[j] + (c1 != c2)))
        prev = cur
    return prev[-1]


def levenshtein_ratio(s1: str, s2: str) -> float:
    """1 - dist/max(len) ∈ [0,1]; 1.0 for two empty strings."""
    m = max(len(s1), len(s2))
    return 1.0 - levenshtein(s1, s2) / m if m else 1.0


def token_set_ratio(a: set, b: set) -> float:
    """Dice coefficient over token sets: 2|A∩B| / (|A|+|B|)."""
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    return 2.0 * len(a & b) / (len(a) + len(b))


def hybrid_score(
    est_jacc: np.ndarray,
    path_jw: np.ndarray,
    tok_ratio: np.ndarray,
    w_jacc: float = 0.7,
    w_jw: float = 0.15,
    w_tok: float = 0.15,
) -> np.ndarray:
    """Weighted hybrid similarity in [0,1]; weights fixed by config so the
    decision threshold is reproducible (SURVEY §7.4 determinism note)."""
    return w_jacc * est_jacc + w_jw * path_jw + w_tok * tok_ratio


def kmeans_fit(mat: np.ndarray, n_cells: int, iters: int = 10,
               seed: int = 11) -> np.ndarray:
    """Deterministic spherical k-means (Lloyd, fixed iterations, seeded
    init from data rows) → (n_cells, d) L2-normalized centroids. The IVF
    coarse quantizer: deterministic in (input order-independent sample,
    n_cells, iters, seed) so the distributed op and the single-process
    oracle derive identical cells."""
    n, d = mat.shape
    normed = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True),
                              1e-12)
    rng = np.random.default_rng(seed)
    k_eff = min(n_cells, n)
    cent = normed[rng.choice(n, size=k_eff, replace=False)].copy()
    for _ in range(iters):
        sims = normed @ cent.T
        assign = np.argmax(sims, axis=1)
        for c in range(k_eff):
            members = normed[assign == c]
            if len(members):
                v = members.sum(axis=0)
                nv = np.linalg.norm(v)
                if nv > 1e-12:
                    cent[c] = v / nv
    return cent


def cosine_topk(queries: np.ndarray, corpus: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Brute-force cosine top-k: (q, d) @ (d, n) matmul per batch.

    Returns (indices (q,k), sims (q,k)), ranked by (-sim, index) so ties
    are total-order deterministic."""
    qn = queries / np.maximum(np.linalg.norm(queries, axis=1, keepdims=True), 1e-12)
    cn = corpus / np.maximum(np.linalg.norm(corpus, axis=1, keepdims=True), 1e-12)
    sims = qn @ cn.T
    # argsort by (-sim, idx): stable sort on idx is implicit (arange), so
    # kind='stable' over -sims keeps index order within equal sims
    order = np.argsort(-sims, axis=1, kind="stable")[:, :k]
    return order, np.take_along_axis(sims, order, axis=1)


def kmeans_fit_l2(mat: np.ndarray, n_cells: int, iters: int = 10,
                  seed: int = 11) -> np.ndarray:
    """Deterministic Euclidean k-means (Lloyd, fixed iterations, seeded
    init from data rows) → (n_cells, d) centroids. The PQ sub-quantizer
    trainer: deterministic in (order-independent sample, n_cells, iters,
    seed) so the distributed op and the single-process oracle derive
    identical codebooks. Assignment is argmin squared distance with
    first-index tie-break; empty cells keep their previous centroid."""
    n, d = mat.shape
    rng = np.random.default_rng(seed)
    k_eff = min(n_cells, n)
    cent = mat[rng.choice(n, size=k_eff, replace=False)].astype(
        np.float64).copy()
    x = mat.astype(np.float64)
    for _ in range(iters):
        d2 = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = np.argmin(d2, axis=1)
        for c in range(k_eff):
            members = x[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
    return cent


def monge_elkan_batch(a_list: list[str], b_list: list[str]) -> np.ndarray:
    """Symmetric Monge-Elkan over aligned string lists:
    ME(A→B) = mean over A's token INSTANCES of max_b JW(a, b), returned
    as (ME(A→B) + ME(B→A)) / 2 — the multi-token name similarity the
    single-string JW under-scores when word order differs.

    Vectorized: every row's token cross product flattens into ONE
    ``jaro_winkler_batch`` call per direction; the per-token max and
    per-row mean are ``np.maximum.reduceat`` / ``np.add.reduceat``
    segment ops. Empty strings tokenize to zero tokens and score 0."""

    def _directed(xs: list[list[str]], ys: list[list[str]]) -> np.ndarray:
        kx = np.fromiter((len(t) for t in xs), np.int64, len(xs))
        ky = np.fromiter((len(t) for t in ys), np.int64, len(ys))
        flat_x: list[str] = []
        flat_y: list[str] = []
        for tx, ty in zip(xs, ys):
            for a in tx:
                flat_x.extend([a] * len(ty))
                flat_y.extend(ty)
        out = np.zeros(len(xs))
        if not flat_x:
            return out
        jw = jaro_winkler_batch(flat_x, flat_y)
        # segment boundaries: one block of ky[i] comparisons per x-token
        blocks = np.repeat(ky, kx)  # len = total x tokens
        nz = blocks > 0
        tok_max = np.zeros(len(blocks))
        if nz.any():
            starts = np.r_[0, np.cumsum(blocks)[:-1]]
            tok_max[nz] = np.maximum.reduceat(jw, starts[nz])
        row_has = (kx > 0) & (ky > 0)
        row_starts = np.r_[0, np.cumsum(kx)[:-1]]
        sums = np.add.reduceat(tok_max, row_starts[kx > 0]) \
            if (kx > 0).any() else np.array([])
        out[kx > 0] = sums
        out[row_has] = out[row_has] / kx[row_has]
        out[~row_has] = 0.0
        return out

    ta = [a.split() for a in a_list]
    tb = [b.split() for b in b_list]
    return (_directed(ta, tb) + _directed(tb, ta)) / 2.0
