"""Privacy-preserving record linkage (PPRL) via Bloom-filter encodings.

Cryptographic Long-term Key (CLK) encoding: each record's quasi-identifier
fields are normalized, split into character bigrams, and every bigram sets
``k`` bit positions of an ``m``-bit Bloom filter by double hashing
(Kirsch-Mitzenmacher ``g_i = h1 + i*h2 mod m``). Records are then compared
ONLY through their encodings with the Dice coefficient
``2|A∧B| / (|A|+|B|)`` — the linkage never touches the raw identifiers
(Schnell, Bachteler & Reiher 2009, "Privacy-preserving record linkage
using Bloom filters").

Reference analog: BELB resolves mentions through exact/synonym string
lookups (`/root/reference/belb/kbs/kb.py:501-570`, SURVEY §2.5 J3/J4);
this op is the counterpart for names that cross a trust boundary encoded.

Distributed shape (all stages stream):

- **encode** — stateless vectorized ``map_batches``: the batch's strings
  are joined into ONE flat byte buffer per field (a single C-level join),
  bigram codes are adjacent-byte pairs over that buffer with boundary
  pairs masked, k positions per bigram come from two vectorized uint64
  mixes, and the rows×m bit matrix is set with one scatter then
  ``np.packbits`` → packed bytes. No Python per row.
- **blocking** — LSH over the encodings themselves: band ``j`` reads a
  seeded sample of ``bytes_per_band`` packed bytes; equal sampled bytes ⇒
  candidate pair. Bands are pure functions of the filter, so the
  independent golden re-derives them exactly. Pairs run through
  ``stages.pairs.candidate_pairs`` (bucketed, skew-capped, deduped).
- **verify** — encodings attach to pairs broadcast-once under a row
  budget (``scoring.attach_features`` policy; 64 B/row ⇒ 4M reps ≈
  256 MB) or via two hash-partitioned joins past it; Dice is a
  popcount-LUT sum over the AND of uint8 views. The threshold is applied
  as an exact integer comparison
  ``2·inter·10^6 ≥ round(t·10^6)·(|A|+|B|)`` so no float ordering can
  flip a pair across partitions.

Exact-duplicate records (identical normalized quasi-identifiers ⇒
identical filters) are collapsed to their min-id representative BEFORE
banding — their linkage is trivial and the collapse is what bounds band
groups (the repo-wide pre-collapse convention, stages/dedup.py). With
collapsed inputs the band groups stay far below ``max_block``, so the
skew cap never fires and the emitted pair set is exactly the uncapped
band-candidate set the golden enumerates.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from ..functions.hashing import as_int64
from ..util import round_half_away

_MIX_A = np.uint64(0x9E3779B97F4A7C15)
_MIX_B = np.uint64(0xC2B2AE3D27D4EB4F)
_POP8 = np.array([bin(i).count("1") for i in range(256)], np.int32)
_DENOM = 1_000_000


def _mix64(v: np.ndarray, salt: int) -> np.ndarray:
    """One multiply-xor-shift round over uint64 (pure; the independent
    golden replicates it in plain Python ints)."""
    v = (v + np.uint64(salt)) * _MIX_A
    return (v ^ (v >> np.uint64(29))) * _MIX_B


def _flat_bigrams(strs: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """All byte bigrams of a batch of strings → (codes, row index).

    One join + one frombuffer for the whole batch; bigrams spanning row
    boundaries (the \\x00 separators) are masked out."""
    if not strs:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    buf = np.frombuffer("\x00".join(strs).encode("utf-8"), np.uint8)
    if len(buf) < 2:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    sep = buf == 0
    row = np.cumsum(sep)  # row index per byte (separator starts next row)
    v = (buf[:-1].astype(np.uint64) << np.uint64(8)) | buf[1:]
    ok = ~sep[:-1] & ~sep[1:]
    return v[ok], row[:-1][ok].astype(np.int64)


def clk_encode(fields: list[list[str]], m_bits: int = 512, k: int = 8,
               seed: int = 7) -> np.ndarray:
    """CLK-encode a batch: per-field byte bigrams, k double-hashed
    positions each → packed (n, m_bits//8) uint8. The field index is
    mixed into the bigram code so 'ab' in field 0 and in field 1 set
    different bits."""
    n = len(fields[0]) if fields else 0
    m = np.uint64(m_bits)
    bits = np.zeros(n * m_bits, bool)
    for f_idx, strs in enumerate(fields):
        v, rows = _flat_bigrams(strs)
        if len(v) == 0:
            continue
        v = v | (np.uint64(f_idx + 1) << np.uint64(16))
        h1 = _mix64(v, seed) % m
        h2 = (_mix64(v, seed + 0x51ED) % m) | np.uint64(1)  # odd → full cycle
        ks = np.arange(k, dtype=np.uint64)
        pos = (h1[:, None] + ks[None, :] * h2[:, None]) % m
        flat = (rows[:, None] * m_bits + pos.astype(np.int64)).ravel()
        bits[flat] = True
    return np.packbits(bits.reshape(n, m_bits), axis=1)


def clk_cardinality(packed: np.ndarray) -> np.ndarray:
    """Set-bit count per row of a packed (n, bytes) uint8 matrix."""
    return _POP8[packed].sum(axis=1, dtype=np.int64)


def band_byte_columns(n_bytes: int, bands: int, bytes_per_band: int,
                      seed: int) -> np.ndarray:
    """Seeded sample of packed-byte columns per band, shape
    (bands, bytes_per_band): a fixed permutation read with wraparound, so
    any (bands, bytes_per_band) is valid for any m."""
    perm = np.random.default_rng(seed).permutation(n_bytes)
    idx = np.arange(bands * bytes_per_band) % n_bytes
    return perm[idx].reshape(bands, bytes_per_band)


def band_keys(packed: np.ndarray, bands: int, bytes_per_band: int,
              seed: int) -> np.ndarray:
    """LSH band keys over sampled packed bytes → (n, bands) int64.
    Equal key in any band ⇒ candidate. Pure function of the filter."""
    cols = band_byte_columns(packed.shape[1], bands, bytes_per_band, seed)
    out = np.empty((packed.shape[0], bands), np.int64)
    for j in range(bands):
        h = np.full(packed.shape[0], np.uint64(j + 1))
        for c in cols[j]:
            h = _mix64(h ^ packed[:, c].astype(np.uint64), seed + j)
        out[:, j] = as_int64(h)
    return out


def _norm(col) -> list[str]:
    import pyarrow.compute as pc

    s = pc.utf8_lower(pc.cast(col, pa.string()))
    return pc.fill_null(s, "").to_pylist()


def _packed_of(col, nb: int) -> np.ndarray:
    """binary column (nb bytes per value) → (n, nb) uint8 view."""
    vals = col.to_pylist()
    if not vals:
        return np.empty((0, nb), np.uint8)
    return np.frombuffer(b"".join(vals), np.uint8).reshape(len(vals), nb)


def bloom_encode(ds: rd.Dataset, id_col: str, field_cols: list[str],
                 m_bits: int = 512, k: int = 8,
                 seed: int = 7) -> rd.Dataset:
    """records → (row_id, bloom binary(m/8), card). The only stage that
    reads the quasi-identifiers; everything downstream sees bits."""

    def _enc(batch: pa.Table) -> pa.Table:
        packed = clk_encode([_norm(batch[c]) for c in field_cols],
                            m_bits, k, seed)
        n, nb = packed.shape
        offs = np.arange(0, (n + 1) * nb, nb, dtype=np.int32)
        blooms = pa.BinaryArray.from_buffers(
            pa.binary(), n, [None, pa.py_buffer(offs.tobytes()),
                             pa.py_buffer(packed.tobytes())])
        return pa.table({
            "row_id": pa.compute.cast(batch[id_col], pa.int64()),
            "bloom": blooms,
            "card": pa.array(clk_cardinality(packed)),
        })

    return ds.map_batches(_enc, batch_format="pyarrow")


def pprl_dice_links(ds: rd.Dataset, id_col: str, field_cols: list[str],
                    threshold: float = 0.8, m_bits: int = 512, k: int = 8,
                    bands: int = 32, bytes_per_band: int = 3, seed: int = 7,
                    max_block: int = 4096,
                    broadcast_rows: int = 4_000_000) -> rd.Dataset:
    """End-to-end PPRL: encode → collapse identical filters → LSH bands →
    candidate pairs → exact Dice ≥ threshold → (id_a, id_b, dice).

    Links are between distinct representatives: rows with identical
    encodings (⇔ identical normalized quasi-identifiers, up to hash
    collision) collapse to their min-id representative first. dice is
    rounded to 6dp for cross-engine hash comparability; the threshold is
    an exact integer comparison at 10^-6 resolution."""
    from .agg import preagg_groupby
    from .joins import hash_partition_join
    from .pairs import candidate_pairs

    nb = m_bits // 8
    enc = bloom_encode(ds, id_col, field_cols, m_bits, k, seed)

    # collapse identical filters: min id per bloom value (bucketed combine)
    reps = preagg_groupby(enc.select_columns(["bloom", "row_id"]),
                          ["bloom"], [("min", "row_id", "row_id")],
                          num_buckets=32).materialize()

    def _bands(batch: pa.Table) -> pa.Table:
        packed = _packed_of(batch["bloom"], nb)
        ids = batch["row_id"].to_numpy().astype(np.int64)
        keys = band_keys(packed, bands, bytes_per_band, seed)
        return pa.table({
            "block_key": pa.array(keys.ravel(), pa.int64()),
            "row_id": pa.array(np.repeat(ids, bands), pa.int64()),
        })

    blocks = reps.map_batches(_bands, batch_format="pyarrow")
    pairs = candidate_pairs(blocks, max_block=max_block, window=16)

    thr_num = round(threshold * _DENOM)

    def _dice_keep(pa_m: np.ndarray, pb_m: np.ndarray, ca: np.ndarray,
                   cb: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        inter = _POP8[pa_m & pb_m].sum(axis=1, dtype=np.int64)
        denom = ca + cb
        keep = (2 * inter * _DENOM >= thr_num * denom) & (denom > 0)
        dice = round_half_away(2.0 * inter[keep] / denom[keep], 6)
        return keep, dice

    n_reps = reps.count()
    if n_reps <= broadcast_rows:
        import ray

        whole = pa.concat_tables(ray.get(reps.to_arrow_refs()))
        ids = whole["row_id"].to_numpy().astype(np.int64)
        packed = _packed_of(whole["bloom"], nb)
        order = np.argsort(ids, kind="stable")
        ref = ray.put((ids[order], np.ascontiguousarray(packed[order])))

        def _verify(batch: pa.Table) -> pa.Table:
            import ray as _r

            s_ids, s_packed = _r.get(ref)
            a = batch["id_a"].to_numpy()
            b = batch["id_b"].to_numpy()
            pa_m = s_packed[np.searchsorted(s_ids, a)]
            pb_m = s_packed[np.searchsorted(s_ids, b)]
            ca = _POP8[pa_m].sum(axis=1, dtype=np.int64)
            cb = _POP8[pb_m].sum(axis=1, dtype=np.int64)
            keep, dice = _dice_keep(pa_m, pb_m, ca, cb)
            return pa.table({"id_a": pa.array(a[keep], pa.int64()),
                             "id_b": pa.array(b[keep], pa.int64()),
                             "dice": pa.array(dice, pa.float64())})

        return pairs.map_batches(_verify, batch_format="pyarrow")

    # scale path: two hash-partitioned joins carry the fixed-width blooms
    def _rename(suffix: str):
        def fn(t: pa.Table) -> pa.Table:
            return pa.table({f"id_{suffix}": t["row_id"],
                             f"bloom_{suffix}": t["bloom"]})
        return fn

    reps_a = reps.map_batches(_rename("a"), batch_format="pyarrow")
    reps_b = reps.map_batches(_rename("b"), batch_format="pyarrow")
    both = hash_partition_join(
        hash_partition_join(pairs, reps_a, key="id_a"), reps_b, key="id_b")

    def _verify_j(batch: pa.Table) -> pa.Table:
        pa_m = _packed_of(batch["bloom_a"], nb)
        pb_m = _packed_of(batch["bloom_b"], nb)
        ca = _POP8[pa_m].sum(axis=1, dtype=np.int64)
        cb = _POP8[pb_m].sum(axis=1, dtype=np.int64)
        keep, dice = _dice_keep(pa_m, pb_m, ca, cb)
        return pa.table({
            "id_a": pa.array(batch["id_a"].to_numpy()[keep], pa.int64()),
            "id_b": pa.array(batch["id_b"].to_numpy()[keep], pa.int64()),
            "dice": pa.array(dice, pa.float64())})

    return both.map_batches(_verify_j, batch_format="pyarrow")
