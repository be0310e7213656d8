"""Document-deduplication pipelines over a ``documents(doc_id, text,
lang, source)`` table — the training-data-pipeline op family (exact,
MinHash-LSH, SimHash, n-gram Jaccard; embedding-cosine lives in
``stages/ann.py``).

These are compositions of the ER engine's stages (blocking → candidate
pairs → scoring → connected components), re-targeted at near-duplicate
*document* detection. The exact-dup path replays the reference's KB
dedup-before-derived-queries move (belb/kbs/kb.py:251-263 — SURVEY §2.6
A8) with a content hash as the key.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data as rd


from ..functions.hashing import sha256_hex_list
from ..functions.minhash import hamming64

from ..stages.cluster import assign_clusters, connected_components
from ..stages.joins import hash_partition_join
from ..stages.pairs import candidate_pairs
from ..util import resolve_num_buckets
from ..util import round_half_away


def adapt_documents(docs: rd.Dataset, id_col: str = "doc_id",
                    text_col: str = "text") -> rd.Dataset:
    """documents → the files-shaped schema the ER stages expect:
    (row_id, path, lang, content, content_sha256)."""

    def _adapt(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        ids = batch[id_col].to_pylist()
        srcs = (batch["source"].to_pylist() if "source" in batch.column_names
                else ["doc"] * len(ids))
        langs = (batch["lang"] if "lang" in batch.column_names
                 else pa.array(["und"] * len(ids), pa.string()))
        return pa.table({
            "row_id": pa.array([int(i) for i in ids], pa.int64()),
            "path": pa.array([f"{s}/{i}" for s, i in zip(srcs, ids)], pa.string()),
            "lang": langs,
            "content": batch[text_col],
            "content_sha256": pa.array(sha256_hex_list(texts), pa.string()),
        })

    return docs.map_batches(_adapt, batch_format="pyarrow")


def exact_dup_groups(docs: rd.Dataset, id_col: str = "doc_id",
                     text_col: str = "text",
                     num_buckets: int = 0) -> rd.Dataset:
    """→ (content_md5, rep_id, n_dups): hash-partitioned exact dedup,
    rep = min id (total-order determinism). md5 matches DuckDB's ``md5()``
    so the oracle is byte-identical.

    Combine is per-batch partial (min, count per md5) → bucketed pandas
    merge on an int32 bucket — NOT Ray's native string-key aggregate
    (measured ~50x slower; agg.py docstring)."""
    num_buckets = resolve_num_buckets(num_buckets)
    import pandas as pd

    def _partial(batch: pa.Table) -> pd.DataFrame:
        md5 = hashlib.md5
        texts = batch[text_col].to_pylist()
        df = pd.DataFrame({
            "content_md5": [md5(t.encode("utf-8")).hexdigest() for t in texts],
            id_col: batch[id_col].to_numpy(zero_copy_only=False),
        })
        g = df.groupby("content_md5", sort=False)[id_col]
        out = pd.DataFrame({"rep_id": g.min(), "n_dups": g.size()}).reset_index()
        h = pd.util.hash_array(out["content_md5"].to_numpy(), categorize=False)
        out["__bucket"] = (h % np.uint64(num_buckets)).astype(np.int32)
        return out

    def _combine(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop(columns="__bucket").groupby("content_md5", sort=False)
        return pd.DataFrame({"rep_id": g["rep_id"].min(),
                             "n_dups": g["n_dups"].sum()}).reset_index()

    partials = docs.map_batches(_partial, batch_format="pyarrow",
                                batch_size=65536)
    return partials.groupby("__bucket").map_groups(_combine,
                                                   batch_format="pandas")


def minhash_dedup(docs: rd.Dataset, threshold: float = 0.7,
                  num_perm: int = 128, bands: int = 32, shingle_k: int = 3,
                  seed: int = 7, id_col: str = "doc_id",
                  text_col: str = "text") -> rd.Dataset:
    """MinHash-LSH near-dup clustering → (doc_id, dup_group). Pure content
    similarity: the ER pipeline with weights (jaccard=1, path=0, token=0)."""
    from .er import ERConfig, resolve_files

    adapted = adapt_documents(docs, id_col=id_col, text_col=text_col)
    cfg = ERConfig(num_perm=num_perm, bands=bands, shingle_k=shingle_k,
                   seed=seed, threshold=threshold,
                   w_jacc=1.0, w_jw=0.0, w_tok=0.0, use_path_keys=False)
    res = resolve_files(adapted, cfg)
    return res["clusters"].map_batches(
        lambda t: pa.table({id_col: t["row_id"], "dup_group": t["cluster_id"]}),
        batch_format="pyarrow")


def _doc_features(docs: rd.Dataset, num_perm: int, shingle_k: int, seed: int,
                  id_col: str, text_col: str, keep_shingles: bool) -> rd.Dataset:
    """(row_id, sig, simhash[, shingles]) features — task-pool map with a
    per-process cached MinHasher (see stages/blocking.py rationale)."""
    from ..stages.blocking import cached_blocker

    def _fn(batch: pa.Table) -> pa.Table:
        from ..functions.hashing import ngram_hashes, token_hashes
        from ..functions.minhash import simhash64
        from ..functions.text import tokenize

        blocker = cached_blocker(num_perm, shingle_k, seed)
        texts = batch[text_col].to_pylist()
        sigs, simhashes, shingle_lists = [], [], []
        for t in texts:
            th = token_hashes(tokenize(t), blocker.token_cache)
            sh = np.unique(ngram_hashes(th, shingle_k))
            sigs.append(blocker.hasher.signature(sh))
            simhashes.append(int(simhash64(th) & np.uint64(0x7FFFFFFFFFFFFFFF)))
            if keep_shingles:
                shingle_lists.append((sh & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64))
        from ..functions.minhash import sig_array

        cols = {
            "row_id": pa.array([int(i) for i in batch[id_col].to_pylist()], pa.int64()),
            "sig": (sig_array(np.stack(sigs)) if sigs
                    else pa.array([], pa.binary(8 * num_perm))),
            "simhash": pa.array(simhashes, pa.int64()),
        }
        if keep_shingles:
            # binary, not list<int64>: shingle sets must survive the
            # pair join (pyarrow joins reject list payload columns)
            cols["shingles"] = pa.array([s.tobytes() for s in shingle_lists],
                                        pa.binary())
        return pa.table(cols)

    return docs.map_batches(_fn, batch_format="pyarrow", batch_size=2048)


def _attach_and_check_hamming(pairs: rd.Dataset, feats: rd.Dataset,
                              max_hamming: int,
                              broadcast_threshold: int = 20_000_000,
                              num_buckets: int = 0) -> rd.Dataset:
    """Pairs + per-row simhash → edges with Hamming ≤ max_hamming.
    Size-aware: the simhash column is 8 B/row, so up to tens of millions
    of rows it broadcasts once and pairs gather per batch (zero join
    shuffles); past that, two hash-partitioned joins."""
    num_buckets = resolve_num_buckets(num_buckets)
    import ray

    n = feats.count()
    if n <= broadcast_threshold:
        from ..stages.joins import collect_arrow
        from ..util import cached_get

        tbl = collect_arrow(feats.select_columns(["row_id", "simhash"]))
        ids = tbl["row_id"].to_numpy()
        order = np.argsort(ids, kind="stable")
        ids_sorted = ids[order]
        sh_sorted = tbl["simhash"].to_numpy()[order].astype(np.uint64)
        ref = ray.put((ids_sorted, sh_sorted))

        def _check_bc(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return pa.table({"id_a": pa.array([], pa.int64()),
                                 "id_b": pa.array([], pa.int64())})
            ids_s, sh = cached_get(ref)
            ia = np.searchsorted(ids_s, batch["id_a"].to_numpy())
            ib = np.searchsorted(ids_s, batch["id_b"].to_numpy())
            d = hamming64(sh[ia], sh[ib])
            keep = pa.array(d <= max_hamming)
            return pa.table({"id_a": batch["id_a"].filter(keep),
                             "id_b": batch["id_b"].filter(keep)})

        return pairs.map_batches(_check_bc, batch_format="pyarrow",
                                 batch_size=16384)

    sh_tbl = feats.select_columns(["row_id", "simhash"])
    sa = sh_tbl.map_batches(lambda t: t.rename_columns(["id_a", "sh_a"]),
                            batch_format="pyarrow")
    sb = sh_tbl.map_batches(lambda t: t.rename_columns(["id_b", "sh_b"]),
                            batch_format="pyarrow")
    pf = hash_partition_join(pairs, sa, key="id_a", num_buckets=num_buckets)
    pf = hash_partition_join(pf, sb, key="id_b", num_buckets=num_buckets)

    def _check(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64())})
        d = hamming64(batch["sh_a"].to_numpy().astype(np.uint64),
                      batch["sh_b"].to_numpy().astype(np.uint64))
        keep = pa.array(d <= max_hamming)
        return pa.table({"id_a": batch["id_a"].filter(keep),
                         "id_b": batch["id_b"].filter(keep)})

    return pf.map_batches(_check, batch_format="pyarrow")


def simhash_dedup(docs: rd.Dataset, max_hamming: int = 3, n_bands: int = 4,
                  num_perm: int = 16, shingle_k: int = 3, seed: int = 7,
                  id_col: str = "doc_id", text_col: str = "text") -> rd.Dataset:
    """SimHash near-dup clustering → (doc_id, dup_group): 64-bit SimHash,
    banded (any pair within ``max_hamming`` bits shares ≥1 identical band
    when max_hamming < n_bands — pigeonhole), exact Hamming check on
    candidates, connected components. ``n_bands`` is auto-raised to
    ``max_hamming + 1`` so the recall guarantee ALWAYS holds (a caller
    passing max_hamming ≥ n_bands would otherwise silently lose pairs)."""
    n_bands = min(max(n_bands, max_hamming + 1), 64)
    feats = _doc_features(docs, num_perm, shingle_k, seed, id_col, text_col,
                          keep_shingles=False).materialize()

    def _bands(batch: pa.Table) -> pa.Table:
        sh = batch["simhash"].to_numpy().astype(np.uint64)
        n = len(sh)
        r = 64 // n_bands
        keys = np.empty((n, n_bands), dtype=np.int64)
        mask = np.uint64((1 << r) - 1)
        for b in range(n_bands):
            chunk = (sh >> np.uint64(b * r)) & mask
            keys[:, b] = chunk.astype(np.int64) | (np.int64(b + 1) << np.int64(48))
        return pa.table({
            "block_key": pa.array(keys.ravel(), pa.int64()),
            "row_id": pa.array(np.repeat(batch["row_id"].to_numpy(), n_bands),
                               pa.int64()),
        })

    blocks = feats.map_batches(_bands, batch_format="pyarrow")
    pairs = candidate_pairs(blocks, max_block=512, window=16)
    edges = _attach_and_check_hamming(pairs, feats, max_hamming)
    labels = connected_components(edges)
    members = feats.map_batches(
        lambda t: pa.table({"row_id": t["row_id"], "rep_id": t["row_id"]}),
        batch_format="pyarrow")
    out = assign_clusters(members, labels)
    return out.map_batches(
        lambda t: pa.table({id_col: t["row_id"], "dup_group": t["cluster_id"]}),
        batch_format="pyarrow")


def ngram_jaccard_pairs(docs: rd.Dataset, threshold: float = 0.5,
                        num_perm: int = 128, bands: int = 32,
                        shingle_k: int = 3, seed: int = 7,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> rd.Dataset:
    """EXACT n-gram Jaccard over LSH candidates → (id_a, id_b, jaccard ≥
    threshold). MinHash bands give recall; the shingle sets give the exact
    score (carried as list<int64> — fine for documents, not for 1 GB
    files; there the MinHash estimate is the score)."""
    from ..functions.minhash import MinHasher, band_keys

    feats = _doc_features(docs, num_perm, shingle_k, seed, id_col, text_col,
                          keep_shingles=True).materialize()

    def _bands(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table({"block_key": pa.array([], pa.int64()),
                             "row_id": pa.array([], pa.int64())})
        from ..functions.minhash import sig_matrix

        keys = band_keys(sig_matrix(batch["sig"]), bands)
        return pa.table({
            "block_key": pa.array(keys.ravel(), pa.int64()),
            "row_id": pa.array(np.repeat(batch["row_id"].to_numpy(), bands),
                               pa.int64()),
        })

    blocks = feats.map_batches(_bands, batch_format="pyarrow")
    pairs = candidate_pairs(blocks, max_block=256, window=16)

    def _jacc_table(ids_a, ids_b, sh_a_list, sh_b_list) -> pa.Table:
        ja = []
        for a, b in zip(sh_a_list, sh_b_list):
            sa_ = np.frombuffer(a, dtype=np.int64)
            sb_ = np.frombuffer(b, dtype=np.int64)
            inter = np.intersect1d(sa_, sb_, assume_unique=True).size
            union = sa_.size + sb_.size - inter
            ja.append(inter / union if union else 1.0)
        ja = np.asarray(ja, np.float64)
        keep = pa.array(ja >= threshold)
        return pa.table({"id_a": ids_a.filter(keep),
                         "id_b": ids_b.filter(keep),
                         "jaccard": pa.array(ja[ja >= threshold], pa.float64())})

    n = feats.count()
    if n <= 2_000_000:  # shingle payloads broadcast (zero join shuffles)
        import ray

        from ..stages.joins import collect_arrow
        from ..util import cached_get

        tbl = collect_arrow(feats.select_columns(["row_id", "shingles"]))
        ids = tbl["row_id"].to_numpy()
        order = np.argsort(ids, kind="stable")
        ids_sorted = ids[order]
        sh_arr = tbl["shingles"].combine_chunks().take(pa.array(order))
        ref = ray.put((ids_sorted, sh_arr))

        def _jacc_bc(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return pa.table({"id_a": pa.array([], pa.int64()),
                                 "id_b": pa.array([], pa.int64()),
                                 "jaccard": pa.array([], pa.float64())})
            ids_s, sh = cached_get(ref)
            ia = np.searchsorted(ids_s, batch["id_a"].to_numpy())
            ib = np.searchsorted(ids_s, batch["id_b"].to_numpy())
            return _jacc_table(batch["id_a"], batch["id_b"],
                               sh.take(pa.array(ia)).to_pylist(),
                               sh.take(pa.array(ib)).to_pylist())

        return pairs.map_batches(_jacc_bc, batch_format="pyarrow",
                                 batch_size=4096)

    sh_tbl = feats.select_columns(["row_id", "shingles"])
    sa = sh_tbl.map_batches(lambda t: t.rename_columns(["id_a", "sh_a"]),
                            batch_format="pyarrow")
    sb = sh_tbl.map_batches(lambda t: t.rename_columns(["id_b", "sh_b"]),
                            batch_format="pyarrow")
    pf = hash_partition_join(pairs, sa, key="id_a", num_buckets=16)
    pf = hash_partition_join(pf, sb, key="id_b", num_buckets=16)

    def _jacc(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64()),
                             "jaccard": pa.array([], pa.float64())})
        return _jacc_table(batch["id_a"], batch["id_b"],
                           batch["sh_a"].to_pylist(),
                           batch["sh_b"].to_pylist())

    return pf.map_batches(_jacc, batch_format="pyarrow", batch_size=4096)


def dedup_sweep(docs: rd.Dataset, thresholds: list[float],
                id_col: str = "doc_id", text_col: str = "text",
                num_buckets: int = 0) -> rd.Dataset:
    """Dedup-aggressiveness planning table: for each candidate Jaccard
    threshold, how many docs the min-id-wins exact near-dup pass would
    drop vs keep — the "how hard should I dedup this corpus" question a
    training-data pipeline answers before committing to a full rewrite.

    → (threshold float64, docs_dropped, docs_kept), one row per grid
    value, threshold descending.

    Shape: the EXACT prefix-filtered set-similarity join
    (stages/setsim.jaccard_similarity_join — complete, no LSH recall
    loss, so the SQL oracle holds bit-exactly) runs ONCE at the grid
    minimum; a max-combiner reduces pairs to one row per doc (its best
    Jaccard against any smaller-id doc), and the sweep is a fixed-width
    per-batch histogram + sum combiner — the whole grid costs one pair
    join regardless of grid size. A doc is dropped at threshold t iff
    its max-to-smaller-id Jaccard ≥ t (exactly the keep-first rule the
    dedup ops apply)."""
    num_buckets = resolve_num_buckets(num_buckets)
    import pandas as pd

    from ..stages.agg import preagg_groupby
    from ..stages.setsim import jaccard_similarity_join

    if not thresholds:
        raise ValueError("thresholds grid must be non-empty")
    ts = np.array(sorted(set(float(t) for t in thresholds),
                         reverse=True), np.float64)

    pairs = jaccard_similarity_join(docs, float(ts.min()), id_col,
                                    text_col, num_buckets)

    def _larger(b: pd.DataFrame) -> pd.DataFrame:
        # pair (id_a < id_b): only the LARGER id can be dropped by it
        return pd.DataFrame({"doc": b["id_b"].to_numpy(np.int64),
                             "j": b["jaccard"].to_numpy(np.float64)})

    mx = preagg_groupby(pairs.map_batches(_larger, batch_format="pandas"),
                        ["doc"], [("max", "j", "mx")], num_buckets)

    def _hist(b: pd.DataFrame) -> pd.DataFrame:
        m = b["mx"].to_numpy(np.float64)
        return pd.DataFrame({
            "threshold": ts,
            "docs_dropped": np.array([(m >= t).sum() for t in ts],
                                     np.int64)})

    dropped = preagg_groupby(
        mx.map_batches(_hist, batch_format="pandas"),
        ["threshold"], [("sum", "docs_dropped", "docs_dropped")],
        num_buckets)
    n_docs = docs.count()

    def _finish(b: pd.DataFrame) -> pd.DataFrame:
        b["docs_kept"] = n_docs - b["docs_dropped"]
        return b

    out = dropped.map_batches(_finish, batch_format="pandas")
    # a grid value can be missing when NO batch reached _hist (empty
    # corpus edge) — normalize by unioning zero rows for absent ts
    got = out.to_pandas()
    missing = [t for t in ts if t not in set(got["threshold"])]
    if missing:
        got = pd.concat([got, pd.DataFrame({
            "threshold": np.array(missing, np.float64),
            "docs_dropped": np.zeros(len(missing), np.int64),
            "docs_kept": np.full(len(missing), n_docs, np.int64)})],
            ignore_index=True)
    got = got.sort_values("threshold", ascending=False,
                          ignore_index=True)
    return rd.from_pandas(got)


def progressive_verify_curve(
    docs: rd.Dataset,
    thresholds: tuple = (0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9),
    true_jaccard: float = 0.5,
    num_perm: int = 128,
    bands: int = 32,
    shingle_k: int = 3,
    seed: int = 7,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_block: int = 4096,
) -> rd.Dataset:
    """Pay-as-you-go verification schedule (Whang, Marmaros &
    Garcia-Molina 2013, "Pay-as-you-go entity resolution"): LSH candidate
    pairs are ranked by their CHEAP score (estimated MinHash Jaccard);
    for each cheap-score threshold ``t`` the row reports how many pairs
    the ``est ≥ t`` work prefix contains and what fraction of the true
    matches (exact shingle Jaccard ≥ ``true_jaccard``, candidate-
    relative — blocking recall is a separate metric, see
    ``snm_blocking_quality``) that prefix captures:

        (threshold, n_pairs, n_true, pair_recall, pair_precision)

    A steep recall curve at high ``t`` means early verification budget
    lands on real matches — the progressive-ER property.

    Shape: exact dups collapse to min-id reps first (identical docs make
    degenerate band groups); features+shingle sets are computed once and
    broadcast (binary columns, sorted-id searchsorted gather); the grid
    is accumulated as ONE fixed-width partial row per batch, so the
    whole curve costs a single pass over the candidate pairs. Threshold
    comparisons are exact integer arithmetic (agreeing-permutation and
    shingle-overlap counts), never float order. Exact per-pair set
    intersections are a Python loop over ~max_block-bounded candidates —
    this is an EVAL op; the scale path for exact set-similarity joins is
    stages/setsim.py."""
    import ray

    from ..stages.joins import semi_join
    from ..stages.pairs import candidate_pairs
    from ..functions.minhash import band_keys as mh_band_keys
    from ..functions.minhash import sig_matrix

    # 1. exact-dup collapse (min-id rep per content md5)
    groups = exact_dup_groups(docs, id_col=id_col, text_col=text_col)
    reps = groups.map_batches(
        lambda t: pa.table({id_col: t["rep_id"]}), batch_format="pyarrow")
    rep_docs = semi_join(docs.select_columns([id_col, text_col]), reps,
                         key=id_col)

    # 2. signatures + shingle sets, once per rep
    feats = _doc_features(rep_docs, num_perm, shingle_k, seed,
                          id_col, text_col, keep_shingles=True).materialize()

    def _blocks(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"block_key": pa.array([], pa.int64()),
                             "row_id": pa.array([], pa.int64())})
        keys = mh_band_keys(sig_matrix(batch["sig"]), bands)
        rid = batch["row_id"].to_numpy()
        return pa.table({
            "block_key": pa.array(keys.ravel(), pa.int64()),
            "row_id": pa.array(np.repeat(rid, bands), pa.int64()),
        })

    pairs = candidate_pairs(feats.map_batches(_blocks, batch_format="pyarrow"),
                            max_block=max_block, window=16)

    whole = pa.concat_tables(
        [t for t in ray.get(feats.to_arrow_refs()) if t.num_rows])
    ids = whole["row_id"].to_numpy()
    order = np.argsort(ids, kind="stable")
    sigs_sorted = sig_matrix(whole["sig"])[order]
    sh_sorted = [np.frombuffer(b, np.int64)
                 for b in whole["shingles"].to_pylist()]
    sh_sorted = [sh_sorted[i] for i in order]
    ref = ray.put((ids[order], np.ascontiguousarray(sigs_sorted), sh_sorted))

    ts = np.array(sorted(thresholds), np.float64)
    t_nums = round_half_away(ts * 1_000_000).astype(np.int64)
    tj_num = round(true_jaccard * 1_000_000)

    def _partial(batch: pa.Table) -> pa.Table:
        from ..util import cached_get

        s_ids, s_sigs, s_sh = cached_get(ref)
        a = np.searchsorted(s_ids, batch["id_a"].to_numpy())
        b = np.searchsorted(s_ids, batch["id_b"].to_numpy())
        agree = (s_sigs[a] == s_sigs[b]).sum(axis=1).astype(np.int64)
        true = np.zeros(len(a), bool)
        for i, (ia, ib) in enumerate(zip(a, b)):
            sa, sb = s_sh[ia], s_sh[ib]
            inter = np.intersect1d(sa, sb, assume_unique=True).size
            union = sa.size + sb.size - inter
            true[i] = union > 0 and inter * 1_000_000 >= tj_num * union
        cols = {"n_true_total": pa.array([int(true.sum())], pa.int64())}
        for t_num, t in zip(t_nums, ts):
            pre = agree * 1_000_000 >= t_num * num_perm
            cols[f"np_{t_num}"] = pa.array([int(pre.sum())], pa.int64())
            cols[f"nt_{t_num}"] = pa.array([int((pre & true).sum())],
                                           pa.int64())
        return pa.table(cols)

    parts = pairs.map_batches(_partial, batch_format="pyarrow",
                              batch_size=8192).to_pandas()
    if parts.empty:  # no candidate pairs at all
        zero = {f"np_{t}": 0 for t in t_nums}
        zero.update({f"nt_{t}": 0 for t in t_nums})
        zero["n_true_total"] = 0
        import pandas as pd

        parts = pd.DataFrame([zero])
    tot = parts.sum(axis=0)
    n_true_total = int(tot["n_true_total"])
    rows = []
    for t_num, t in zip(t_nums, ts):
        n_pairs = int(tot[f"np_{t_num}"])
        n_true = int(tot[f"nt_{t_num}"])
        rows.append((float(t), n_pairs, n_true,
                     round_half_away(n_true / n_true_total, 6) if n_true_total else 0.0,
                     round_half_away(n_true / n_pairs, 6) if n_pairs else 0.0))
    return rd.from_arrow(pa.table({
        "threshold": pa.array([r[0] for r in rows], pa.float64()),
        "n_pairs": pa.array([r[1] for r in rows], pa.int64()),
        "n_true": pa.array([r[2] for r in rows], pa.int64()),
        "pair_recall": pa.array([r[3] for r in rows], pa.float64()),
        "pair_precision": pa.array([r[4] for r in rows], pa.float64()),
    }))
