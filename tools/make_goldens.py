"""Generate pinned golden parquet oracles for the non-SQL-expressible
queries (goldens/<name>.sf0.01.parquet).

Each golden is computed by an INDEPENDENT single-process implementation —
plain numpy/pandas brute force, no Ray, no distributed stages — over the
driver's fixed sf0.01 testdata (or the seeded synthetic fixture). The
driver's DuckDB oracle then reads the golden via ``read_parquet``, so
cluster/near-dup results are checked against a second implementation, not
against the pipeline itself. (This is the reference's own QA device:
golden/pinned metadata as the conformance corpus — SURVEY §5.3.)

Shared PURE KERNELS (tokenize, MinHasher, simhash64, fingerprint64,
_fake_decode) are reused — they are deterministic functions with their own
unit tests; what the golden independently re-derives is the COMPOSITION:
exact-dup collapse, banding, candidate generation (uncapped brute force),
scoring, and transitive clustering.

Usage: python tools/make_goldens.py [--sf-dir /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from belb_ray.util import round_half_away  # noqa: E402 (needs the path above)

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "goldens")


class UnionFind:
    """Plain dict union-find, min-id roots (independent of stages/cluster)."""

    def __init__(self):
        self.parent: dict[int, int] = {}

    def find(self, x: int) -> int:
        p = self.parent.setdefault(x, x)
        while p != x:
            self.parent[x] = p = self.parent.setdefault(p, p)
            x, p = p, self.parent[p]
        return p

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            self.parent[hi] = lo

    def label(self, x: int) -> int:
        return self.find(x)


def _doc_arrays(sf_dir: str):
    docs = pq.read_table(f"{sf_dir}/documents.parquet")
    return (docs["doc_id"].to_numpy().astype(np.int64),
            docs["text"].to_pylist(), docs["lang"].to_pylist())


def golden_minhash_dedup(sf_dir: str, threshold=0.5, num_perm=128, bands=32,
                         shingle_k=3, seed=7) -> pa.Table:
    """Single-process MinHash-LSH dedup: exact-dup collapse → per-rep
    signatures → lang-salted band buckets → UNCAPPED shared-bucket pairs →
    est-Jaccard threshold → union-find. Mirrors minhash_dedup's semantics
    (docdedup.py) with brute-force composition."""
    import hashlib

    from belb_ray.functions.hashing import (as_int64, combine64, ngram_hashes,
                                            token_hashes)
    from belb_ray.functions.minhash import MinHasher, band_keys, est_jaccard
    from belb_ray.functions.text import tokenize
    from belb_ray.stages.joins import hash_str

    ids, texts, langs = _doc_arrays(sf_dir)
    sha = [hashlib.sha256(t.encode()).hexdigest() for t in texts]

    rep_of_sha: dict[str, int] = {}
    for i in np.argsort(ids, kind="stable"):
        rep_of_sha.setdefault(sha[i], int(ids[i]))
    rep_id = np.array([rep_of_sha[s] for s in sha], dtype=np.int64)

    reps = np.unique(rep_id)
    idx_of_id = {int(v): i for i, v in enumerate(ids)}
    hasher = MinHasher(num_perm=num_perm, seed=seed)
    cache: dict[str, int] = {}
    sigs = np.empty((len(reps), num_perm), dtype=np.uint64)
    rep_lang = []
    for r, rid in enumerate(reps):
        i = idx_of_id[int(rid)]
        th = token_hashes(tokenize(texts[i]), cache)
        sigs[r] = hasher.signature(ngram_hashes(th, shingle_k))
        rep_lang.append(langs[i])

    keys = band_keys(sigs, bands)  # (n, bands)
    salts = np.array([hash_str(l) for l in rep_lang], dtype=np.uint64)
    keys = as_int64(combine64(keys.astype(np.uint64), salts[:, None]))

    buckets: dict[int, list[int]] = {}
    for r in range(len(reps)):
        for b in range(bands):
            buckets.setdefault(int(keys[r, b]), []).append(r)

    uf = UnionFind()
    seen = set()
    for members in buckets.values():
        if len(members) < 2:
            continue
        for x in range(len(members)):
            for y in range(x + 1, len(members)):
                a, b = members[x], members[y]
                if a == b or (a, b) in seen:
                    continue
                seen.add((a, b))
                if est_jaccard(sigs[a:a + 1], sigs[b:b + 1])[0] >= threshold:
                    uf.union(int(reps[a]), int(reps[b]))

    dup_group = np.array([uf.label(int(r)) for r in rep_id], dtype=np.int64)
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "dup_group": pa.array(dup_group, pa.int64())})


def golden_simhash_dedup(sf_dir: str, max_hamming=3, shingle_k=3, seed=7,
                         num_perm=16) -> pa.Table:
    """Brute-force ALL-pairs Hamming ≤ max_hamming → union-find (no LSH:
    the banding in simhash_dedup is recall-guaranteed by pigeonhole, so
    the uncapped all-pairs graph must give identical components)."""
    from belb_ray.functions.hashing import token_hashes
    from belb_ray.functions.minhash import hamming64, simhash64
    from belb_ray.functions.text import tokenize

    ids, texts, _ = _doc_arrays(sf_dir)
    cache: dict[str, int] = {}
    sh = np.array(
        [int(simhash64(token_hashes(tokenize(t), cache))
             & np.uint64(0x7FFFFFFFFFFFFFFF)) for t in texts], dtype=np.uint64)

    uf = UnionFind()
    n = len(ids)
    for i in range(n):
        d = hamming64(np.full(n - i - 1, sh[i], np.uint64), sh[i + 1:])
        for j in np.flatnonzero(d <= max_hamming):
            uf.union(int(ids[i]), int(ids[i + 1 + j]))
    lab = np.array([uf.label(int(v)) for v in ids], dtype=np.int64)
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "dup_group": pa.array(lab, pa.int64())})


def golden_doc_fingerprints(sf_dir: str, k=8) -> pa.Table:
    from belb_ray.functions.textstats import fingerprint64

    ids, texts, _ = _doc_arrays(sf_dir)
    cache: dict[str, int] = {}
    fps = [fingerprint64(t, k, cache) for t in texts]
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "fingerprint": pa.array(fps, pa.int64())})


def golden_lsh_neardup(sf_dir: str, dim=64, threshold=0.3, bits=64, bands=8,
                       seed=13) -> pa.Table:
    """Brute-force LSH near-dup: same hyperplanes/banding as
    HyperplaneSigner (seeded), shared-bucket pairs enumerated exhaustively,
    sim recomputed through the SAME float32-pack → float64 path so floats
    are bit-identical."""
    emb = pq.read_table(f"{sf_dir}/embeddings.parquet")
    ids = emb["vec_id"].to_numpy().astype(np.int64)
    flat = emb["embedding"].combine_chunks().flatten().to_numpy(
        zero_copy_only=False)
    mat64 = flat.astype(np.float64).reshape(len(ids), dim)

    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, bits))
    signs = (mat64 @ planes) > 0
    r = bits // bands
    weights = (1 << np.arange(r, dtype=np.int64))
    buckets: dict[int, list[int]] = {}
    for b in range(bands):
        chunk = signs[:, b * r:(b + 1) * r].astype(np.int64)
        key = (chunk @ weights) + (int(b) << 32)
        for i, kv in enumerate(key):
            buckets.setdefault(int(kv), []).append(i)

    # the scored path packs to float32 then promotes — replicate exactly
    m32 = flat.astype(np.float32).reshape(len(ids), dim).astype(np.float64)
    norm = m32 / np.maximum(np.linalg.norm(m32, axis=1, keepdims=True), 1e-12)

    pairs = set()
    for members in buckets.values():
        for x in range(len(members)):
            for y in range(x + 1, len(members)):
                i, j = members[x], members[y]
                a, b = (i, j) if ids[i] < ids[j] else (j, i)
                if ids[a] != ids[b]:
                    pairs.add((a, b))
    out_a, out_b, out_s = [], [], []
    for a, b in sorted(pairs, key=lambda p: (ids[p[0]], ids[p[1]])):
        sim = float((norm[a] * norm[b]).sum())
        if sim >= threshold:
            out_a.append(int(ids[a]))
            out_b.append(int(ids[b]))
            out_s.append(sim)
    return pa.table({"id_a": pa.array(out_a, pa.int64()),
                     "id_b": pa.array(out_b, pa.int64()),
                     "sim": pa.array(out_s, pa.float64())})


def golden_lsh_ann_topk(sf_dir: str, k=5, bits=64, bands=8, seed=13,
                        dim=64, n_queries=16) -> pa.Table:
    """Brute-force single-process recompute of lsh_bucket_topk: same
    hyperplanes/banding, exhaustive candidate enumeration, same float
    expression ((c*q).sum(axis=1) on float64-normalized rows)."""
    emb = pq.read_table(f"{sf_dir}/embeddings.parquet")
    ids = emb["vec_id"].to_numpy().astype(np.int64)
    flat = emb["embedding"].combine_chunks().flatten().to_numpy(
        zero_copy_only=False)
    mat = flat.astype(np.float64).reshape(len(ids), dim)
    mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)

    q_sel = np.flatnonzero(ids < n_queries)
    q_ids = ids[q_sel]
    q_mat = mat[q_sel]

    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, bits))
    r = bits // bands
    weights = (1 << np.arange(r, dtype=np.int64))

    def band_keys(m):
        signs = (m @ planes) > 0
        keys = np.empty((m.shape[0], bands), dtype=np.int64)
        for b in range(bands):
            keys[:, b] = (signs[:, b * r:(b + 1) * r].astype(np.int64)
                          @ weights) + (int(b) << 32)
        return keys

    qk = band_keys(q_mat)
    ck = band_keys(mat)
    buckets: dict[int, list[int]] = {}
    for qi in range(len(q_ids)):
        for b in range(bands):
            buckets.setdefault(int(qk[qi, b]), []).append(qi)

    per_q: dict[int, list[tuple[float, int]]] = {int(q): [] for q in q_ids}
    for ci in range(len(ids)):
        cand: set[int] = set()
        for b in range(bands):
            cand.update(buckets.get(int(ck[ci, b]), ()))
        for qi in cand:
            if q_ids[qi] == ids[ci]:
                continue
            sim = float((mat[ci] * q_mat[qi]).sum())
            per_q[int(q_ids[qi])].append((sim, int(ids[ci])))

    out_q, out_n, out_r, out_s = [], [], [], []
    for q in sorted(per_q):
        ranked = sorted(per_q[q], key=lambda t: (-t[0], t[1]))[:k]
        for rank, (sim, nid) in enumerate(ranked, 1):
            out_q.append(q)
            out_n.append(nid)
            out_r.append(rank)
            out_s.append(sim)
    return pa.table({"query_id": pa.array(out_q, pa.int64()),
                     "neighbor_id": pa.array(out_n, pa.int64()),
                     "rank": pa.array(out_r, pa.int64()),
                     "sim": pa.array(out_s, pa.float64())})


def golden_ivf_topk(sf_dir: str, k=5, n_cells=64, nprobe=4, sample_mod=4,
                    kmeans_iters=10, seed=11, dim=64,
                    n_queries=16) -> pa.Table:
    """Single-process IVF recompute: same id-keyed sample (sorted by id),
    same kmeans kernel, same probe sets, exhaustive scan."""
    from belb_ray.functions.similarity import kmeans_fit

    emb = pq.read_table(f"{sf_dir}/embeddings.parquet")
    ids = emb["vec_id"].to_numpy().astype(np.int64)
    flat = emb["embedding"].combine_chunks().flatten().to_numpy(
        zero_copy_only=False)
    mat = flat.astype(np.float64).reshape(len(ids), dim)
    norm = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)

    s_sel = np.flatnonzero(ids % sample_mod == 0)
    s_sel = s_sel[np.argsort(ids[s_sel], kind="stable")]
    centroids = kmeans_fit(mat[s_sel], n_cells, iters=kmeans_iters, seed=seed)

    q_sel = np.flatnonzero(ids < n_queries)
    q_ids = ids[q_sel]
    q_mat = norm[q_sel]
    q_sims = q_mat @ centroids.T
    nprobe_eff = min(nprobe, centroids.shape[0])
    probe = np.argsort(-q_sims, axis=1, kind="stable")[:, :nprobe_eff]
    cell_to_q: dict[int, list[int]] = {}
    for qi in range(len(q_ids)):
        for c in probe[qi]:
            cell_to_q.setdefault(int(c), []).append(qi)

    assign = np.argmax(norm @ centroids.T, axis=1)
    per_q: dict[int, list[tuple[float, int]]] = {int(q): [] for q in q_ids}
    for ci in range(len(ids)):
        for qi in cell_to_q.get(int(assign[ci]), ()):
            if q_ids[qi] == ids[ci]:
                continue
            sim = float((norm[ci] * q_mat[qi]).sum())
            per_q[int(q_ids[qi])].append((sim, int(ids[ci])))

    out_q, out_n, out_r, out_s = [], [], [], []
    for q in sorted(per_q):
        ranked = sorted(per_q[q], key=lambda t: (-t[0], t[1]))[:k]
        for rank, (sim, nid) in enumerate(ranked, 1):
            out_q.append(q)
            out_n.append(nid)
            out_r.append(rank)
            out_s.append(sim)
    return pa.table({"query_id": pa.array(out_q, pa.int64()),
                     "neighbor_id": pa.array(out_n, pa.int64()),
                     "rank": pa.array(out_r, pa.int64()),
                     "sim": pa.array(out_s, pa.float64())})


def golden_semantic_dedup(sf_dir: str, n_cells=8, threshold=0.35,
                          sample_mod=4, kmeans_iters=10, seed=11,
                          dim=64) -> pa.Table:
    """Single-process SemDeDup recompute: same id-keyed sample + kmeans
    kernel (shared pure function), then an independent per-cell
    brute-force first-match scan (no chunking, no Ray)."""
    from belb_ray.functions.similarity import kmeans_fit

    emb = pq.read_table(f"{sf_dir}/embeddings.parquet")
    ids = emb["vec_id"].to_numpy().astype(np.int64)
    flat = emb["embedding"].combine_chunks().flatten().to_numpy(
        zero_copy_only=False)
    mat = flat.astype(np.float64).reshape(len(ids), dim)
    norm = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)

    s_sel = np.flatnonzero(ids % sample_mod == 0)
    s_sel = s_sel[np.argsort(ids[s_sel], kind="stable")]
    centroids = kmeans_fit(mat[s_sel], n_cells, iters=kmeans_iters, seed=seed)
    cell = np.argmax(norm @ centroids.T, axis=1).astype(np.int32)

    out_id, out_cell, out_dup = [], [], []
    for c in np.unique(cell):
        sel = np.flatnonzero(cell == c)
        sel = sel[np.argsort(ids[sel], kind="stable")]
        sub = norm[sel]
        sims = sub @ sub.T
        for pos, idx in enumerate(sel):
            hit = np.flatnonzero(sims[pos, :pos] >= threshold)
            out_id.append(int(ids[idx]))
            out_cell.append(int(c))
            out_dup.append(int(ids[sel[hit[0]]]) if len(hit) else -1)
    dup = np.array(out_dup, dtype=np.int64)
    return pa.table({"vec_id": pa.array(out_id, pa.int64()),
                     "cell": pa.array(out_cell, pa.int32()),
                     "is_dup": pa.array(dup != -1),
                     "dup_of": pa.array(dup, pa.int64())})


def golden_multimodal_features(sf_dir: str, feat_dim=16) -> pa.Table:
    from belb_ray.stages.multimodal import _fake_decode

    ids, texts, _ = _doc_arrays(sf_dir)
    ws, hs = [], []
    for t in texts:
        _, w, h = _fake_decode(t.encode(), feat_dim)
        ws.append(w)
        hs.append(h)
    return pa.table({"item_id": pa.array(ids, pa.int64()),
                     "width": pa.array(ws, pa.int32()),
                     "height": pa.array(hs, pa.int32())})


def golden_er_clusters(sf: float) -> pa.Table:
    """The fixture's analytic gold clusters (family lineage — independent
    of every pipeline stage), at the same size q_er_clusters uses."""
    from belb_ray.sources.synthetic import make_fixture

    n_files = max(600, int(200_000 * sf))
    return make_fixture(n_files=n_files, seed=42)["gold_clusters"]


def golden_pca_projection(sf_dir: str, k=4) -> pa.Table:
    """Independent single-process PCA: load the whole embedding matrix,
    population covariance via np.cov, numpy eigh, same sign convention
    (largest-|coordinate| entry positive), project, round 6dp."""
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                      columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy(zero_copy_only=False)
    x = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    cov = np.cov(x, rowvar=False, bias=True)
    _, vecs = np.linalg.eigh(cov)
    comp = vecs[:, ::-1][:, :k]
    flip = np.sign(comp[np.abs(comp).argmax(axis=0), np.arange(k)])
    flip[flip == 0] = 1.0
    comp = comp * flip
    p = (x - x.mean(axis=0)) @ comp
    cols = {"vec_id": pa.array(ids, pa.int64())}
    for j in range(k):
        cols[f"pc{j + 1}"] = pa.array(round_half_away(p[:, j], 6))
    return pa.table(cols)


def golden_incremental_neardup(sf_dir: str, threshold=0.5, num_perm=128,
                                bands=32, shingle_k=3, seed=7) -> pa.Table:
    """Independent single-process two-wave near-dup ingestion: wave 1 =
    doc_id < count//2 self-dedups (drop if sharing >=1 band with ANY
    smaller-id wave-1 doc at est-Jaccard >= t); wave 2 drops on a
    shared band with any wave-1 SURVIVOR or any smaller-id wave-2 doc.
    Brute-force dict buckets; mirrors incremental.neardup_against_state
    (no lang salt, unique-shingle signatures)."""
    from belb_ray.functions.hashing import ngram_hashes, token_hashes
    from belb_ray.functions.minhash import MinHasher, band_keys, est_jaccard
    from belb_ray.functions.text import tokenize

    ids, texts, _ = _doc_arrays(sf_dir)
    split = len(ids) // 2
    hasher = MinHasher(num_perm=num_perm, seed=seed)
    cache: dict[str, int] = {}
    sigs = np.empty((len(ids), num_perm), dtype=np.uint64)
    for i, t in enumerate(texts):
        th = token_hashes(tokenize(t), cache)
        sigs[i] = hasher.signature(np.unique(ngram_hashes(th, shingle_k)))
    keys = band_keys(sigs, bands)
    band_sets = [set(int(k) for k in keys[i]) for i in range(len(ids))]

    def similar(i: int, j: int) -> bool:
        return (bool(band_sets[i] & band_sets[j])
                and est_jaccard(sigs[i:i + 1], sigs[j:j + 1])[0]
                >= threshold)

    order = np.argsort(ids, kind="stable")
    w1 = [int(i) for i in order if ids[i] < split]
    w2 = [int(i) for i in order if ids[i] >= split]
    w1_kept = [i for n, i in enumerate(w1)
               if not any(similar(i, j) for j in w1[:n])]
    out = [int(ids[i]) for n, i in enumerate(w2)
           if not any(similar(i, j) for j in w1_kept)
           and not any(similar(i, j) for j in w2[:n])]
    return pa.table({"doc_id": pa.array(sorted(out), pa.int64())})


def golden_pca_variance(sf_dir: str) -> pa.Table:
    """Independent single-process eigenvalue spectrum (np.cov + eigh)."""
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                      columns=["embedding"])
    x = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    vals = np.linalg.eigh(np.cov(x, rowvar=False, bias=True))[0][::-1]
    vals = np.clip(vals, 0.0, None)
    ratio = vals / vals.sum()
    return pa.table({
        "component": pa.array(np.arange(1, len(vals) + 1), pa.int64()),
        "eigenvalue": pa.array(round_half_away(vals, 8)),
        "explained_ratio": pa.array(round_half_away(ratio, 8)),
        "cum_explained_ratio": pa.array(round_half_away(np.cumsum(ratio), 8)),
    })


def golden_bpe_merges(sf_dir: str, n_merges: int = 12) -> pa.Table:
    """Independent single-process BPE: Counter word counts, dict vocab of
    symbol TUPLES, per-round Counter pair stats with (count desc, pair
    asc) tie-break, and an explicit left-to-right non-overlapping tuple
    scan for the merge (the distributed op uses a regex rewrite — a
    different mechanism for the same semantics)."""
    import re as _re
    from collections import Counter

    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["text"])
    wc: Counter = Counter()
    for txt in t["text"].to_pylist():
        wc.update(_re.findall(r"[a-z0-9]+", (txt or "").lower()))
    vocab = {tuple(list(w) + ["</w>"]): c for w, c in wc.items()}

    def _merge_word(syms, a, b):
        out, i = [], 0
        while i < len(syms):
            if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        return tuple(out)

    rows = []
    for step in range(1, n_merges + 1):
        stats: Counter = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                stats[(syms[i], syms[i + 1])] += c
        if not stats:
            break
        (a, b), cnt = sorted(stats.items(),
                             key=lambda kv: (-kv[1], kv[0]))[0]
        rows.append((step, a, b, cnt))
        vocab = {_merge_word(s, a, b): c for s, c in vocab.items()}
    return pa.table({
        "step": pa.array([r[0] for r in rows], pa.int64()),
        "left": pa.array([r[1] for r in rows], pa.string()),
        "right": pa.array([r[2] for r in rows], pa.string()),
        "n_occurrences": pa.array([r[3] for r in rows], pa.int64())})


def golden_bpe_tokens(sf_dir: str, n_merges: int = 12) -> pa.Table:
    """Independent single-process BPE encoding: the merge ranks come
    from golden_bpe_merges; each word is encoded by repeatedly merging
    all occurrences of the lowest-rank pair present."""
    import re as _re

    m = golden_bpe_merges(sf_dir, n_merges)
    ranks = {(l, r): s for s, l, r in zip(
        m["step"].to_pylist(), m["left"].to_pylist(),
        m["right"].to_pylist())}

    def _encode(word: str) -> list[str]:
        syms = list(word) + ["</w>"]
        while len(syms) > 1:
            ranked = [(ranks[(a, b)], (a, b))
                      for a, b in zip(syms, syms[1:]) if (a, b) in ranks]
            if not ranked:
                break
            a, b = min(ranked)[1]
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["doc_id", "text"])
    memo: dict = {}
    toks, counts = [], []
    for txt in t["text"].to_pylist():
        dt: list[str] = []
        for w in _re.findall(r"[a-z0-9]+", (txt or "").lower()):
            if w not in memo:
                memo[w] = _encode(w)
            dt.extend(memo[w])
        toks.append(dt)
        counts.append(len(dt))
    return pa.table({
        "doc_id": t["doc_id"],
        "tokens": pa.array(toks, pa.list_(pa.string())),
        "n_tokens": pa.array(counts, pa.int64())})


def golden_pq_ann_topk(sf_dir: str, m: int = 8, kcent: int = 16,
                       k: int = 5) -> pa.Table:
    """Independent single-process PQ: id-keyed sample → per-subspace
    k-means (shared deterministic kernel kmeans_fit_l2) → brute-force
    encode of ALL rows → full ADC distance per query → top-k by
    (dist, id). Re-derives the whole composition without Ray."""
    from belb_ray.functions.similarity import kmeans_fit_l2

    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                      columns=["vec_id", "embedding"])
    ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
    mat = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    d = mat.shape[1]
    sub = d // m
    sel = ids % 4 == 0
    samp = mat[sel][np.argsort(ids[sel])]
    books = [kmeans_fit_l2(samp[:, j * sub:(j + 1) * sub], kcent,
                           iters=10, seed=11 + j) for j in range(m)]
    codes = np.empty((len(mat), m), np.int64)
    for j in range(m):
        x = mat[:, j * sub:(j + 1) * sub]
        d2 = ((x[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
        codes[:, j] = np.argmin(d2, axis=1)
    qsel = ids < 16
    rows_q, rows_i, rows_d = [], [], []
    for qi in np.flatnonzero(qsel):
        q = mat[qi]
        dist = np.zeros(len(mat), np.float64)
        for j in range(m):
            lut = (((q[j * sub:(j + 1) * sub])[None, :]
                    - books[j]) ** 2).sum(axis=1)
            dist += lut[codes[:, j]]
        top = np.lexsort((ids, dist))[:k]
        rows_q.extend([int(ids[qi])] * k)
        rows_i.extend(ids[top].tolist())
        rows_d.extend(round_half_away(dist[top], 6).tolist())
    return pa.table({"query_id": pa.array(rows_q, pa.int64()),
                     "vec_id": pa.array(rows_i, pa.int64()),
                     "dist": pa.array(rows_d, pa.float64())})


def golden_part_k_core(sf_dir: str, k: int = 80) -> pa.Table:
    """Independent single-process k-core peeling over the part
    co-purchase graph: adjacency sets + a removal worklist (a different
    mechanism from the distributed round-based semi-join peeling; the
    fixpoint is the same subgraph by the k-core's uniqueness)."""
    import duckdb

    con = duckdb.connect()
    edges = con.sql(f"""
        WITH items AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS it
                       FROM '{os.path.join(sf_dir, "lineitem.parquet")}'),
        e AS (SELECT DISTINCT x.it AS a, y.it AS b
              FROM items x JOIN items y ON x.g = y.g AND x.it < y.it)
        SELECT a, b FROM e
    """).fetchall()
    adj: dict[int, set] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    from collections import deque

    alive = {v for v in adj}
    q = deque(v for v in adj if len(adj[v]) < k)
    while q:
        v = q.popleft()
        if v not in alive:
            continue
        alive.discard(v)
        for u in adj[v]:
            if u in alive:
                adj[u].discard(v)
                if len(adj[u]) < k:
                    q.append(u)
    verts = sorted(alive)
    return pa.table({
        "vertex": pa.array(verts, pa.int64()),
        "core_degree": pa.array([len(adj[v] & alive) for v in verts],
                                pa.int64())})


def golden_part_components(sf_dir: str) -> pa.Table:
    """Independent connected components (plain dict union-find, a
    different mechanism from the distributed contract-then-solve in
    stages/cluster.py) over the part co-purchase graph."""
    import duckdb

    con = duckdb.connect()
    edges = con.sql(f"""
        WITH items AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS it
                       FROM '{os.path.join(sf_dir, "lineitem.parquet")}'),
        e AS (SELECT DISTINCT x.it AS a, y.it AS b
              FROM items x JOIN items y ON x.g = y.g AND x.it < y.it)
        SELECT a, b FROM e
    """).fetchall()
    uf = UnionFind()
    for a, b in edges:
        uf.union(int(a), int(b))
    nodes = sorted({int(v) for e in edges for v in e})
    return pa.table({
        "node": pa.array(nodes, pa.int64()),
        "label": pa.array([uf.label(v) for v in nodes], pa.int64())})


def golden_jl_projection(sf_dir: str, k: int = 6, seed: int = 0) -> pa.Table:
    """Single-process JL projection: one full-matrix float64 GEMM through
    the shared deterministic projection kernel (the golden re-derives the
    composition — load, cast, project, round)."""
    from belb_ray.stages.pca import jl_matrix

    emb = pq.read_table(f"{sf_dir}/embeddings.parquet")
    ids = emb["vec_id"].to_numpy().astype(np.int64)
    x = np.stack(emb["embedding"].to_pylist()).astype(np.float64)
    y = round_half_away(x @ jl_matrix(x.shape[1], k, seed), 6)
    cols = {"vec_id": pa.array(ids, pa.int64())}
    for j in range(k):
        cols[f"jl{j + 1}"] = pa.array(y[:, j], pa.float64())
    return pa.table(cols)


def golden_fs_linkage_weights(sf_dir: str, iters: int = 15) -> pa.Table:
    """Independent single-process Fellegi-Sunter EM: candidate pairs and
    agreement features derived in SQL (DuckDB's jaro_winkler_similarity,
    verified bit-identical to the engine kernel), then a plain-numpy EM
    loop with the same 2^-30 posterior quantization."""
    import duckdb

    con = duckdb.connect()
    x = con.sql(f"""
        WITH part AS (SELECT * FROM '{os.path.join(sf_dir, "part.parquet")}'),
        r AS (SELECT p_partkey AS id, p_name AS nm, p_brand AS br,
                     p_type AS ct,
                     row_number() OVER (ORDER BY p_name, p_partkey) AS rn
              FROM part)
        SELECT CASE WHEN jaro_winkler_similarity(a.nm, b.nm) >= 0.9
                    THEN 1 ELSE 0 END AS agree_name,
               CASE WHEN a.br = b.br THEN 1 ELSE 0 END AS agree_brand,
               CASE WHEN a.ct = b.ct THEN 1 ELSE 0 END AS agree_type
        FROM r a JOIN r b ON b.rn > a.rn AND b.rn - a.rn < 8
    """).df().to_numpy(np.float64)
    k = x.shape[1]
    p, m, u = 0.1, np.full(k, 0.9), np.full(k, 0.1)
    eps = 1e-6
    quant = float(1 << 30)
    for _ in range(iters):
        lm = x @ np.log(m) + (1.0 - x) @ np.log1p(-m)
        lu = x @ np.log(u) + (1.0 - x) @ np.log1p(-u)
        r_ = 1.0 / (1.0 + np.exp((np.log1p(-p) + lu) - (np.log(p) + lm)))
        r_ = round_half_away(r_ * quant) / quant
        n, sr = float(len(r_)), r_.sum()
        su = n - sr
        p = min(max(sr / n, eps), 1.0 - eps)
        for i in range(k):
            m[i] = min(max((r_ * x[:, i]).sum() / max(sr, eps), eps),
                       1.0 - eps)
            u[i] = min(max((x[:, i] - r_ * x[:, i]).sum() / max(su, eps),
                           eps), 1.0 - eps)
    names = ["agree_name", "agree_brand", "agree_type"]
    rows = [("__match_prior", p, 0.0, 0.0, 0.0)]
    for i, c in enumerate(names):
        rows.append((c, m[i], u[i], float(np.log2(m[i] / u[i])),
                     float(np.log2((1.0 - m[i]) / (1.0 - u[i])))))
    import pandas as pd
    df = pd.DataFrame(rows, columns=["feature", "m", "u", "weight_agree",
                                     "weight_disagree"])
    for c in ("m", "u", "weight_agree", "weight_disagree"):
        df[c] = round_half_away(df[c].to_numpy(np.float64), 8)
    return pa.Table.from_pandas(df, preserve_index=False)


def golden_fs_pattern_posteriors(sf_dir: str, iters: int = 15) -> pa.Table:
    """Independent single-process FS agreement-pattern table: SQL-derived
    pairs, the same plain-numpy EM as golden_fs_linkage_weights, then per
    OBSERVED pattern the pair count plus weight/posterior computed from
    the 8dp-ROUNDED parameter table (the scoring determinism
    contract)."""
    import duckdb
    import pandas as pd

    con = duckdb.connect()
    df = con.sql(f"""
        WITH part AS (SELECT * FROM '{os.path.join(sf_dir, "part.parquet")}'),
        r AS (SELECT p_partkey AS id, p_name AS nm, p_brand AS br,
                     p_type AS ct,
                     row_number() OVER (ORDER BY p_name, p_partkey) AS rn
              FROM part)
        SELECT a.id AS id_a, b.id AS id_b,
               CASE WHEN jaro_winkler_similarity(a.nm, b.nm) >= 0.9
                    THEN 1 ELSE 0 END AS agree_name,
               CASE WHEN a.br = b.br THEN 1 ELSE 0 END AS agree_brand,
               CASE WHEN a.ct = b.ct THEN 1 ELSE 0 END AS agree_type
        FROM r a JOIN r b ON b.rn > a.rn AND b.rn - a.rn < 8
    """).df()
    names = ["agree_name", "agree_brand", "agree_type"]
    x = df[names].to_numpy(np.float64)
    k = x.shape[1]
    p, m, u = 0.1, np.full(k, 0.9), np.full(k, 0.1)
    eps = 1e-6
    quant = float(1 << 30)
    for _ in range(iters):
        lm = x @ np.log(m) + (1.0 - x) @ np.log1p(-m)
        lu = x @ np.log(u) + (1.0 - x) @ np.log1p(-u)
        r_ = 1.0 / (1.0 + np.exp((np.log1p(-p) + lu) - (np.log(p) + lm)))
        r_ = round_half_away(r_ * quant) / quant
        n, sr = float(len(r_)), r_.sum()
        su = n - sr
        p = min(max(sr / n, eps), 1.0 - eps)
        for i in range(k):
            m[i] = min(max((r_ * x[:, i]).sum() / max(sr, eps), eps),
                       1.0 - eps)
            u[i] = min(max((x[:, i] - r_ * x[:, i]).sum() / max(su, eps),
                           eps), 1.0 - eps)
    # score from the ROUNDED table, exactly like fs_score_pairs
    p = float(round_half_away(p, 8))
    m = round_half_away(m, 8)
    u = round_half_away(u, 8)
    lm = x @ np.log(m) + (1.0 - x) @ np.log1p(-m)
    lu = x @ np.log(u) + (1.0 - x) @ np.log1p(-u)
    r_ = 1.0 / (1.0 + np.exp((np.log1p(-p) + lu) - (np.log(p) + lm)))
    r_ = round_half_away(r_ * quant) / quant
    wgt = x @ np.log2(m / u) + (1.0 - x) @ np.log2((1.0 - m) / (1.0 - u))
    out = df[names].copy()
    for c in names:
        out[c] = out[c].astype(np.int8)
    out["weight"] = round_half_away(wgt, 6)
    out["posterior"] = round_half_away(r_, 6)
    g = out.groupby(names, sort=True)
    tbl = pd.DataFrame({
        "n_pairs": g.size(),
        "weight": g["weight"].min(),
        "posterior": g["posterior"].min(),
    }).reset_index()
    tbl["n_pairs"] = tbl["n_pairs"].astype(np.int64)
    return pa.Table.from_pandas(tbl, preserve_index=False)


def golden_blocking_ablation(sf: float, bands: int = 32, num_perm: int = 128,
                             shingle_k: int = 3, seed: int = 7,
                             snm_width: int = 2) -> pa.Table:
    """Independent single-process blocking ablation over the fixture:
    sha collapse, shared signature/key kernels, UNCAPPED in-group pairs
    per scheme, plain python set algebra for coverage/uniqueness."""
    from belb_ray.functions.hashing import (as_int64, combine64,
                                            ngram_hashes, token_hashes)
    from belb_ray.functions.minhash import MinHasher, band_keys
    from belb_ray.functions.text import sorted_neighborhood_key, tokenize
    from belb_ray.sources.synthetic import make_fixture
    from belb_ray.stages.joins import hash_str

    n_files = max(600, int(200_000 * sf))
    fx = make_fixture(n_files=n_files, seed=42)
    t = fx["files"]
    ids = t["row_id"].to_numpy().astype(np.int64)
    sha = t["content_sha256"].to_pylist()
    texts = t["content"].to_pylist()
    paths = t["path"].to_pylist()
    langs = t["lang"].to_pylist()

    rep_of_sha: dict[str, int] = {}
    for i in np.argsort(ids, kind="stable"):
        rep_of_sha.setdefault(sha[i], int(ids[i]))
    rep_of = {int(ids[i]): rep_of_sha[sha[i]] for i in range(len(ids))}
    reps = sorted(set(rep_of.values()))
    idx_of = {int(v): i for i, v in enumerate(ids)}

    hasher = MinHasher(num_perm=num_perm, seed=seed)
    cache: dict[str, int] = {}
    groups_mh: dict[int, list[int]] = {}
    groups_snm: dict[int, list[int]] = {}
    for rid in reps:
        i = idx_of[rid]
        th = token_hashes(tokenize(texts[i]), cache)
        sig = hasher.signature(ngram_hashes(th, shingle_k))
        keys = band_keys(sig.reshape(1, -1), bands)[0]
        salt = np.uint64(hash_str(langs[i]))
        keys = as_int64(combine64(keys.astype(np.uint64), salt))
        for kv in keys:
            groups_mh.setdefault(int(kv), []).append(rid)
        snk = int(as_int64(np.array([hash_str(
            f"snk:{langs[i]}:{sorted_neighborhood_key(paths[i], snm_width)}"
        )], np.uint64))[0])
        groups_snm.setdefault(snk, []).append(rid)

    def pairs_of(groups: dict) -> set:
        out = set()
        for g in groups.values():
            gs = sorted(set(g))
            for x in range(len(gs)):
                for y in range(x + 1, len(gs)):
                    out.add((gs[x], gs[y]))
        return out

    gp = fx["gold_pairs"]
    la = gp["id_a"].to_numpy()
    lb = gp["id_b"].to_numpy()
    lab = gp["label"].to_numpy()
    gold = set()
    n_collapsed = 0
    for a, b, l in zip(la, lb, lab):
        if l != 1:
            continue
        ra, rb = rep_of[int(a)], rep_of[int(b)]
        if ra == rb:
            n_collapsed += 1
        else:
            gold.add((min(ra, rb), max(ra, rb)))
    n_gold = len(gold)

    res = {"minhash_bands": pairs_of(groups_mh),
           "path_snm": pairs_of(groups_snm)}
    cov = {n: p & gold for n, p in res.items()}
    union_cov = set().union(*cov.values())
    rows = []
    for name, p in res.items():
        others = set().union(*[c for o, c in cov.items() if o != name])
        rows.append((name, len(p), len(cov[name]),
                     round_half_away(len(cov[name]) / n_gold, 6) if n_gold else 0.0,
                     len(cov[name] - others)))
    # union n_pairs = DISTINCT pairs across schemes (pairs found by both
    # schemes counted once), matching blocking_ablation's r4 semantics
    union_pairs = set().union(*res.values())
    rows.append(("union", len(union_pairs), len(union_cov),
                 round_half_away(len(union_cov) / n_gold, 6) if n_gold else 0.0, 0))
    rows.append(("collapse", 0, n_collapsed, 0.0, n_collapsed))
    rows.sort()
    return pa.table({
        "scheme": pa.array([r[0] for r in rows], pa.string()),
        "n_pairs": pa.array([r[1] for r in rows], pa.int64()),
        "gold_covered": pa.array([r[2] for r in rows], pa.int64()),
        "gold_recall": pa.array([r[3] for r in rows], pa.float64()),
        "unique_gold": pa.array([r[4] for r in rows], pa.int64()),
    })


def golden_pprl_links(sf: float, threshold: float = 0.9, m_bits: int = 512,
                      k: int = 8, bands: int = 32, bytes_per_band: int = 3,
                      seed: int = 7) -> pa.Table:
    """Independent single-process PPRL: per-record CLK Bloom filters built
    with plain-Python int arithmetic (the engine's mix constants, none of
    its numpy kernels), identical-filter collapse to min-id reps, UNCAPPED
    brute-force pair enumeration inside every LSH band group, exact Dice
    with the same integer threshold."""
    from belb_ray.sources.synthetic import make_fixture

    n_files = max(600, int(200_000 * sf))
    t = make_fixture(n_files=n_files, seed=42)["files"]
    ids = t["row_id"].to_pylist()
    repos = t["repo"].to_pylist()
    paths = t["path"].to_pylist()
    m64 = (1 << 64) - 1

    def mix(v: int, salt: int) -> int:
        v = ((v + salt) * 0x9E3779B97F4A7C15) & m64
        return ((v ^ (v >> 29)) * 0xC2B2AE3D27D4EB4F) & m64

    def encode(fields) -> frozenset:
        pos = set()
        for f_idx, s in enumerate(fields):
            b = s.lower().encode("utf-8")
            for i in range(len(b) - 1):
                v = ((b[i] << 8) | b[i + 1]) | ((f_idx + 1) << 16)
                h1 = mix(v, seed) % m_bits
                h2 = (mix(v, seed + 0x51ED) % m_bits) | 1
                for j in range(k):
                    pos.add((h1 + j * h2) % m_bits)
        return frozenset(pos)

    enc = {i: encode((r, p)) for i, r, p in zip(ids, repos, paths)}
    by_bloom: dict[frozenset, int] = {}
    for i in sorted(enc):
        if enc[i] not in by_bloom:
            by_bloom[enc[i]] = i
    reps = {i: s for s, i in by_bloom.items()}

    def packed(s: frozenset) -> bytes:
        bb = bytearray(m_bits // 8)
        for p in s:
            bb[p // 8] |= 0x80 >> (p % 8)  # np.packbits bitorder='big'
        return bytes(bb)

    perm = np.random.default_rng(seed).permutation(m_bits // 8)
    idx = np.arange(bands * bytes_per_band) % (m_bits // 8)
    cols = perm[idx].reshape(bands, bytes_per_band)
    groups: dict[int, list[int]] = {}
    for i, s in reps.items():
        pb = packed(s)
        for j in range(bands):
            h = j + 1
            for c in cols[j]:
                h = mix(h ^ pb[int(c)], seed + j)
            # the engine's block_key is the MASKED int64, band-unaware
            groups.setdefault(h & 0x7FFFFFFFFFFFFFFF, []).append(i)

    cand = set()
    for g in groups.values():
        g = sorted(set(g))
        for x in range(len(g)):
            for y in range(x + 1, len(g)):
                cand.add((g[x], g[y]))

    thr = round(threshold * 1_000_000)
    rows = []
    for a, b in sorted(cand):
        inter = len(reps[a] & reps[b])
        den = len(reps[a]) + len(reps[b])
        if den > 0 and 2 * inter * 1_000_000 >= thr * den:
            rows.append((a, b, round_half_away(2.0 * inter / den, 6)))
    return pa.table({
        "id_a": pa.array([r[0] for r in rows], pa.int64()),
        "id_b": pa.array([r[1] for r in rows], pa.int64()),
        "dice": pa.array([r[2] for r in rows], pa.float64()),
    })


def golden_canopy_blocks(sf_dir: str, t1_sim: float = 0.6,
                         t2_sim: float = 0.75, dim: int = 64,
                         num_buckets: int = 32) -> pa.Table:
    """Independent single-process canopy clustering: same hashed-unit-
    vector features (pure kernel), but plain row-by-row sequential greedy
    per id-hash bucket, a second sequential greedy over the merged
    centers, and a dense assignment loop — no chunking, no Ray."""
    from belb_ray.stages.canopy import hashed_unit_vectors

    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    ids = docs["doc_id"].to_numpy().astype(np.int64)
    x = hashed_unit_vectors(docs["text"].to_pylist(), dim)

    def greedy(sub_ids: np.ndarray, sub_x: np.ndarray) -> list[int]:
        order = np.argsort(sub_ids, kind="stable")
        kept: list[int] = []
        for i in order:
            ok = True
            for j in kept:
                if round_half_away(float(sub_x[i] @ sub_x[j]), 6) >= t2_sim:
                    ok = False
                    break
            if ok:
                kept.append(int(i))
        return kept

    buckets = ((ids.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
               % np.uint64(num_buckets)).astype(np.int64)
    loc_idx: list[int] = []
    for b in np.unique(buckets):
        sub = np.flatnonzero(buckets == b)
        loc_idx.extend(sub[k] for k in greedy(ids[sub], x[sub]))
    loc_idx = np.array(sorted(loc_idx, key=lambda i: ids[i]), np.int64)
    fin = greedy(ids[loc_idx], x[loc_idx])
    c_idx = loc_idx[fin]
    c_order = np.argsort(ids[c_idx], kind="stable")
    c_ids = ids[c_idx][c_order]
    c_x = x[c_idx][c_order]

    rows = []
    for i in range(len(ids)):
        sims = round_half_away(c_x @ x[i], 6)
        member = np.flatnonzero(sims >= t1_sim)
        if len(member) == 0:
            member = np.array([int(sims.argmax())])
        for c in member:
            rows.append((int(c_ids[c]), int(ids[i]), float(sims[c])))
    rows.sort()
    return pa.table({
        "canopy_id": pa.array([r[0] for r in rows], pa.int64()),
        "row_id": pa.array([r[1] for r in rows], pa.int64()),
        "sim": pa.array([r[2] for r in rows], pa.float64()),
    })


def golden_corr_clusters(sf_dir: str, min_support: int = 2,
                         seed: int = 5) -> pa.Table:
    """Independent single-process KwikCluster: co-occurrence edges from a
    plain dict count, then the SEQUENTIAL greedy pivot walk in hashed-key
    order (the engine's parallel peeling must equal it exactly)."""
    li = pq.read_table(f"{sf_dir}/lineitem.parquet",
                       columns=["l_orderkey", "l_partkey"])
    by_order: dict[int, set] = {}
    for o, p in zip(li["l_orderkey"].to_pylist(),
                    li["l_partkey"].to_pylist()):
        by_order.setdefault(o, set()).add(p)
    counts: dict[tuple, int] = {}
    for items in by_order.values():
        s = sorted(items)
        for x in range(len(s)):
            for y in range(x + 1, len(s)):
                counts[(s[x], s[y])] = counts.get((s[x], s[y]), 0) + 1
    edges = [e for e, c in counts.items() if c >= min_support]

    m64 = (1 << 64) - 1

    def key(i: int) -> int:
        v = ((i + seed) * 0x9E3779B97F4A7C15) & m64
        return (((v ^ (v >> 31)) * 0xC2B2AE3D27D4EB4F) & m64) \
            & 0x7FFFFFFFFFFFFFFF

    adj: dict[int, set] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    # round-major pivot walk (the parallel peeling's defined order):
    # each round's pivots are the key-local-minima of the ACTIVE graph;
    # every active node with a pivot neighbor joins its smallest-keyed
    # round pivot (pivots self-join); both leave the graph.
    cluster: dict[int, int] = {}
    active = set(adj)
    while active:
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
    rows = sorted(cluster.items())
    return pa.table({
        "row_id": pa.array([r[0] for r in rows], pa.int64()),
        "cluster_id": pa.array([r[1] for r in rows], pa.int64()),
    })


def golden_progressive_curve(sf: float,
                             thresholds=(0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9),
                             true_jaccard: float = 0.5, num_perm: int = 128,
                             bands: int = 32, shingle_k: int = 3,
                             seed: int = 7) -> pa.Table:
    """Independent single-process progressive-verification curve over the
    synthetic near-dup fixture: exact md5 collapse, shared signature
    kernels, UNCAPPED in-band pairs, python-set exact Jaccard, same
    integer threshold arithmetic."""
    import hashlib

    from belb_ray.functions.hashing import ngram_hashes, token_hashes
    from belb_ray.functions.minhash import MinHasher, band_keys
    from belb_ray.functions.text import tokenize
    from belb_ray.sources.synthetic import make_fixture

    n_files = max(600, int(200_000 * sf))
    t = make_fixture(n_files=n_files, seed=42)["files"]
    ids = t["row_id"].to_numpy().astype(np.int64)
    texts = t["content"].to_pylist()
    rep_of: dict[str, int] = {}
    for i in np.argsort(ids, kind="stable"):
        rep_of.setdefault(hashlib.md5(texts[i].encode()).hexdigest(),
                          int(ids[i]))
    reps = sorted(rep_of.values())
    idx_of = {int(v): i for i, v in enumerate(ids)}

    hasher = MinHasher(num_perm=num_perm, seed=seed)
    cache: dict[str, int] = {}
    sigs = np.empty((len(reps), num_perm), np.uint64)
    shingles = []
    for r, rid in enumerate(reps):
        th = token_hashes(tokenize(texts[idx_of[rid]]), cache)
        sh = np.unique(ngram_hashes(th, shingle_k))
        sigs[r] = hasher.signature(sh)
        shingles.append(set((sh & np.uint64(0x7FFFFFFFFFFFFFFF))
                            .astype(np.int64).tolist()))

    keys = band_keys(sigs, bands)
    buckets: dict[int, list[int]] = {}
    for r in range(len(reps)):
        for b in range(bands):
            buckets.setdefault(int(keys[r, b]), []).append(r)
    cand = set()
    for members in buckets.values():
        ms = sorted(set(members))
        for x in range(len(ms)):
            for y in range(x + 1, len(ms)):
                cand.add((ms[x], ms[y]))

    tj = round(true_jaccard * 1_000_000)
    rows_agree, rows_true = [], []
    for a, b in cand:
        rows_agree.append(int((sigs[a] == sigs[b]).sum()))
        inter = len(shingles[a] & shingles[b])
        union = len(shingles[a]) + len(shingles[b]) - inter
        rows_true.append(union > 0 and inter * 1_000_000 >= tj * union)
    agree = np.array(rows_agree, np.int64)
    true = np.array(rows_true, bool)
    n_true_total = int(true.sum())

    out = []
    for t in sorted(thresholds):
        tn = round(t * 1_000_000)
        pre = agree * 1_000_000 >= tn * num_perm
        n_pairs = int(pre.sum())
        n_t = int((pre & true).sum())
        out.append((float(t), n_pairs, n_t,
                    round_half_away(n_t / n_true_total, 6) if n_true_total else 0.0,
                    round_half_away(n_t / n_pairs, 6) if n_pairs else 0.0))
    return pa.table({
        "threshold": pa.array([r[0] for r in out], pa.float64()),
        "n_pairs": pa.array([r[1] for r in out], pa.int64()),
        "n_true": pa.array([r[2] for r in out], pa.int64()),
        "pair_recall": pa.array([r[3] for r in out], pa.float64()),
        "pair_precision": pa.array([r[4] for r in out], pa.float64()),
    })


def golden_one2one_match(sf_dir: str) -> pa.Table:
    """Independent single-process greedy one-to-one matching: SNM window
    candidates + JW scores derived in SQL (DuckDB jaro_winkler_similarity,
    bit-identical to the engine kernel), then the literal sequential
    greedy scan in (score desc, id_a, id_b) order — the definition the
    distributed locally-dominant rounds must reproduce exactly."""
    import duckdb

    con = duckdb.connect()
    df = con.sql(f"""
        WITH customer AS (
            SELECT * FROM '{os.path.join(sf_dir, "customer.parquet")}'),
        r AS (SELECT c_custkey AS id, c_name AS nm,
                     row_number() OVER (ORDER BY c_name, c_custkey) AS rn
              FROM customer)
        SELECT least(a.id, b.id) AS id_a, greatest(a.id, b.id) AS id_b,
               round(jaro_winkler_similarity(a.nm, b.nm), 6) AS score
        FROM r a JOIN r b ON b.rn > a.rn AND b.rn - a.rn < 8
        WHERE jaro_winkler_similarity(a.nm, b.nm) >= 0.9
    """).df()
    # dedupe (id_a, id_b) keeping max score, then sequential greedy
    df = (df.sort_values(["id_a", "id_b", "score"],
                         ascending=[True, True, False])
          .drop_duplicates(["id_a", "id_b"], keep="first"))
    df = df.sort_values(["score", "id_a", "id_b"],
                        ascending=[False, True, True], kind="stable")
    used: set[int] = set()
    keep = []
    for ia, ib, s in zip(df["id_a"], df["id_b"], df["score"]):
        if ia in used or ib in used:
            continue
        used.add(int(ia))
        used.add(int(ib))
        keep.append((int(ia), int(ib), float(s)))
    keep.sort()
    import pandas as pd
    out = pd.DataFrame(keep, columns=["id_a", "id_b", "score"])
    return pa.table({"id_a": pa.array(out["id_a"], pa.int64()),
                     "id_b": pa.array(out["id_b"], pa.int64()),
                     "score": pa.array(out["score"], pa.float64())})


def golden_kmeans_clusters(sf_dir: str, k: int = 8,
                           n_iters: int = 5) -> pa.Table:
    """Independent single-process Lloyd's k-means under the same
    determinism spec as stages/vector.kmeans_lloyd: vectors quantized
    once to int64 fixed-point (x 2^20, round-half-even), init = the k
    smallest vec_ids, exact integer centroid sums, argmin squared-L2
    with first-index ties, empty clusters keep their centroid."""
    tbl = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    ids = tbl["vec_id"].to_numpy().astype(np.int64)
    X = np.asarray(tbl["embedding"].to_pylist(), dtype=np.float64)
    scale = float(1 << 20)
    q = np.rint(X * (1 << 20)).astype(np.int64)
    order = np.argsort(ids, kind="stable")
    cents = q[order[:k]].astype(np.float64) / scale

    def assign(c):
        x = q.astype(np.float64) / scale
        d2 = ((x * x).sum(axis=1)[:, None] - 2.0 * (x @ c.T)
              + (c * c).sum(axis=1)[None, :])
        return np.argmin(d2, axis=1)

    for _ in range(n_iters):
        a = assign(cents)
        cents = cents.copy()
        for c in range(k):
            m = a == c
            if m.any():
                cents[c] = (q[m].sum(axis=0).astype(np.float64)
                            / (int(m.sum()) * scale))
    a = assign(cents)
    return pa.table({"vec_id": pa.array(ids, pa.int64()),
                     "cluster": pa.array(a.astype(np.int64), pa.int64())})


def golden_kcenter_sample(sf_dir: str, k: int = 8) -> pa.Table:
    """Independent single-process greedy k-center with the same
    determinism spec as stages/vector.kcenter_sample: squared-L2
    float64 distances, min-id start, exact-double max ties -> smaller
    id, chosen ids excluded."""
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                      columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy(zero_copy_only=False)
    x = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    j = int(np.argmin(ids))
    sel, dist, chosen = [int(ids[j])], [0.0], {int(ids[j])}
    cur = x[j]
    md = np.full(len(ids), np.inf)
    for _ in range(1, k):
        md = np.minimum(md, ((x - cur) ** 2).sum(axis=1))
        mm = md.copy()
        mm[np.isin(ids, list(chosen))] = -np.inf
        cands = np.flatnonzero(mm == mm.max())
        j = int(cands[np.argmin(ids[cands])])
        sel.append(int(ids[j]))
        dist.append(float(md[j]))
        chosen.add(int(ids[j]))
        cur = x[j]
    return pa.table({
        "sel_rank": pa.array(np.arange(len(sel), dtype=np.int64)),
        "vec_id": pa.array(sel, pa.int64()),
        "dist": pa.array(round_half_away(np.asarray(dist), 6))})


def golden_text_embeddings(sf_dir: str, dim=8, seed=11) -> pa.Table:
    """Single-process run of the SHARED deterministic embed model over
    every document (the Ray stage adds only batching + the actor pool;
    the model kernel is the pure function under test). Output exploded
    to flat e0..e{dim-1} float64 columns rounded 6dp for hashability."""
    from belb_ray.stages.embed import FakeTextEmbedModel

    ids, texts, _ = _doc_arrays(sf_dir)
    model = FakeTextEmbedModel(dim=dim, seed=seed)
    emb = round_half_away(model.encode(list(texts)).astype(np.float64), 6)
    cols = {"doc_id": pa.array(np.asarray(ids, np.int64))}
    for j in range(dim):
        cols[f"e{j}"] = pa.array(emb[:, j], pa.float64())
    return pa.table(cols)


def golden_upsample_exact(sf_dir: str, max_chunk=20, seed=9) -> pa.Table:
    """Independent single-process driver loop of the O4 exact-shuffle
    spec: per user, stdlib random.Random(f"{seed}:{g}").shuffle over
    sorted event ids, position // max_chunk (the distributed op's
    composition — bucketing, map_groups — is what's under test; the
    shuffle itself IS the stdlib call in both)."""
    import random

    t = pq.read_table(os.path.join(sf_dir, "events.parquet"),
                      columns=["user_id", "event_id"])
    df = t.to_pandas()
    gs, es, cs = [], [], []
    for g, sub in df.groupby("user_id", sort=True):
        ids = sorted(sub["event_id"].tolist())
        random.Random(f"{seed}:{g}").shuffle(ids)
        gs.extend([int(g)] * len(ids))
        es.extend(int(i) for i in ids)
        cs.extend(pos // max_chunk for pos in range(len(ids)))
    return pa.table({"user_id": pa.array(gs, pa.int64()),
                     "event_id": pa.array(es, pa.int64()),
                     "chunk_idx": pa.array(cs, pa.int64())})


def golden_bm25_rerank(sf_dir: str, terms=("hash", "join", "window"),
                       k_cand=25, k_out=10, dim=32, seed=5) -> pa.Table:
    """Independent single-process retrieval-then-rerank: brute-force
    BM25 over every doc (same idf/tf expression, left-associated term
    accumulation, 4dp rounding as stages/search.bm25_topk), top-25 by
    (score desc, id asc), then cross-encoder stand-in = cosine of the
    shared FakeTextEmbedModel encodings (6dp), top-10 by (rerank desc,
    id asc)."""
    from collections import Counter

    from belb_ray.stages.embed import FakeTextEmbedModel
    from belb_ray.stages.search import _tokenize

    ids, texts, _ = _doc_arrays(sf_dir)
    terms = list(terms)
    nt = len(terms)
    toks = [_tokenize(t or "") for t in texts]
    n = float(len(texts))
    avgdl = sum(len(t) for t in toks) / n
    df = np.array([float(sum(1 for t in toks if term in set(t)))
                   for term in terms])
    idf = np.log((n - df + 0.5) / (df + 0.5) + 1.0)
    k1, b = 1.2, 0.75
    m = len(texts)
    tf = np.zeros((m, nt), dtype=np.float64)
    dl = np.array([len(t) for t in toks], dtype=np.float64)
    for r, t in enumerate(toks):
        cnt = Counter(t)
        for i, term in enumerate(terms):
            tf[r, i] = cnt.get(term, 0)
    score = np.zeros(m, dtype=np.float64)
    norm = k1 * (1.0 - b + b * dl / avgdl)
    for i in range(nt):
        score = score + idf[i] * (tf[:, i] * (k1 + 1.0)) / (tf[:, i] + norm)
    score = round_half_away(score, 4)
    order = np.lexsort((np.asarray(ids), -score))[:k_cand]

    model = FakeTextEmbedModel(dim=dim, seed=seed)
    q = model.encode([" ".join(terms)]).astype(np.float64)[0]
    cand_texts = [texts[i] for i in order]
    ed = model.encode(cand_texts).astype(np.float64)
    # same expression as CrossEncoderReranker._scores ((eq*ed).sum) so
    # the float reduction order matches bit-for-bit before rounding
    rr = round_half_away((ed * q[None, :]).sum(axis=1), 6)
    sel = np.lexsort((np.asarray(ids)[order], -rr))[:k_out]
    pick = np.asarray(order)[sel]
    return pa.table({
        "doc_id": pa.array(np.asarray(ids)[pick].astype(np.int64)),
        "score": pa.array(score[pick], pa.float64()),
        "rerank_score": pa.array(rr[sel], pa.float64())})


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--only", nargs="*", default=None,
                    help="regenerate only these goldens")
    args = ap.parse_args()
    sf_tag = "sf" + args.sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    sf = float(sf_tag[2:])
    os.makedirs(GOLDEN_DIR, exist_ok=True)

    tables = {
        "er_clusters": lambda: golden_er_clusters(sf),
        "minhash_dedup_docs": lambda: golden_minhash_dedup(args.sf_dir),
        "simhash_dedup_docs": lambda: golden_simhash_dedup(args.sf_dir),
        "doc_fingerprints": lambda: golden_doc_fingerprints(args.sf_dir),
        "lsh_neardup": lambda: golden_lsh_neardup(args.sf_dir),
        "lsh_ann_topk": lambda: golden_lsh_ann_topk(args.sf_dir),
        "ivf_ann_topk": lambda: golden_ivf_topk(args.sf_dir),
        "multimodal_features": lambda: golden_multimodal_features(args.sf_dir),
        "semantic_dedup": lambda: golden_semantic_dedup(args.sf_dir),
        "pca_projection": lambda: golden_pca_projection(args.sf_dir),
        "incremental_neardup": lambda: golden_incremental_neardup(args.sf_dir),
        "pca_variance": lambda: golden_pca_variance(args.sf_dir),
        "bpe_merges": lambda: golden_bpe_merges(args.sf_dir),
        "bpe_tokens": lambda: golden_bpe_tokens(args.sf_dir),
        "pq_ann_topk": lambda: golden_pq_ann_topk(args.sf_dir),
        "part_k_core": lambda: golden_part_k_core(args.sf_dir),
        "part_components": lambda: golden_part_components(args.sf_dir),
        "jl_projection": lambda: golden_jl_projection(args.sf_dir),
        "fs_linkage_weights": lambda: golden_fs_linkage_weights(args.sf_dir),
        "name_one2one_match": lambda: golden_one2one_match(args.sf_dir),
        "kmeans_clusters": lambda: golden_kmeans_clusters(args.sf_dir),
        "kcenter_sample": lambda: golden_kcenter_sample(args.sf_dir),
        "text_embeddings": lambda: golden_text_embeddings(args.sf_dir),
        "upsample_exact": lambda: golden_upsample_exact(args.sf_dir),
        "bm25_rerank": lambda: golden_bm25_rerank(args.sf_dir),
        "pprl_links": lambda: golden_pprl_links(sf),
        "canopy_blocks": lambda: golden_canopy_blocks(args.sf_dir),
        "corr_clusters": lambda: golden_corr_clusters(args.sf_dir),
        "progressive_er_curve": lambda: golden_progressive_curve(sf),
        "fs_pattern_posteriors":
            lambda: golden_fs_pattern_posteriors(args.sf_dir),
        "blocking_ablation": lambda: golden_blocking_ablation(sf),
    }
    if args.only:
        tables = {n: t for n, t in tables.items() if n in set(args.only)}
    for name, thunk in tables.items():
        tbl = thunk()
        path = os.path.join(GOLDEN_DIR, f"{name}.{sf_tag}.parquet")
        pq.write_table(tbl, path)
        print(f"wrote {path}: {tbl.num_rows} rows")


if __name__ == "__main__":
    main()
