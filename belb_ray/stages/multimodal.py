"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

Image/audio decode libraries are not in this container, so the decode
kernels are STUBS behind an import-try (clearly marked); the Ray-side
plumbing — schema, actor-pool signature, batch sizing, output layout — is
real and tested. The pattern mirrors the stateful-actor stages of the ER
engine (model/state loaded once per actor in ``__init__``).

Large binary payloads ⇒ SMALL batches (``batch_size`` 16-64) so
batch × concurrency fits the worker heap; the streaming executor spills
the rest.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data as rd


def _fake_decode(payload: bytes, feat_dim: int) -> tuple[np.ndarray, int, int]:
    """Deterministic fake decoder: feature vector + (width, height) derived
    from the payload digest. Stands in for PIL/librosa (absent here)."""
    h = hashlib.blake2b(payload, digest_size=32).digest()
    rng = np.random.default_rng(int.from_bytes(h[:8], "big"))
    feats = rng.standard_normal(feat_dim).astype(np.float32)
    w = 64 + h[8] % 192
    hgt = 64 + h[9] % 192
    return feats, w, hgt


class ImageFeaturizer:
    """Actor-pool stage: binary image column → (feature vector, w, h).

    Real decode path (PIL) is attempted once per actor; otherwise the
    deterministic fake keeps the pipeline runnable end-to-end."""

    def __init__(self, feat_dim: int = 64, payload_col: str = "payload",
                 id_col: str = "item_id"):
        self.feat_dim = feat_dim
        self.payload_col, self.id_col = payload_col, id_col
        try:  # real decoder if the lib exists (not in this container)
            from PIL import Image
            self.Image = Image
        except ImportError:
            self.Image = None

    def _real_decode(self, payload: bytes) -> tuple[np.ndarray, int, int]:
        """PIL path: decode → grayscale thumbnail → normalized pixel
        features. Raises if the payload is not a decodable image."""
        import io

        img = self.Image.open(io.BytesIO(payload))
        w, h = img.size
        side = max(1, int(np.ceil(np.sqrt(self.feat_dim))))
        small = np.asarray(img.convert("L").resize((side, side)),
                           dtype=np.float32).ravel()[: self.feat_dim]
        feats = np.zeros(self.feat_dim, dtype=np.float32)
        feats[: small.size] = small / 255.0
        return feats, int(w), int(h)

    def _decode(self, payload: bytes) -> tuple[np.ndarray, int, int]:
        """Real decode when PIL exists AND the payload decodes; the
        deterministic fake otherwise — so the stage never breaks on a
        library-present/absent mismatch (and non-image payloads, e.g. the
        text-bytes test fixture, behave identically in BOTH environments)."""
        if self.Image is not None:
            try:
                return self._real_decode(payload)
            except Exception:
                pass
        return _fake_decode(payload, self.feat_dim)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.payload_col].to_pylist()
        feats = np.empty((len(payloads), self.feat_dim), dtype=np.float32)
        ws, hs = [], []
        for i, p in enumerate(payloads):
            f, w, h = self._decode(p or b"")
            feats[i] = f
            ws.append(w)
            hs.append(h)
        return pa.table({
            self.id_col: batch[self.id_col],
            "features": pa.FixedSizeListArray.from_arrays(
                pa.array(feats.ravel(), pa.float32()), self.feat_dim),
            "width": pa.array(ws, pa.int32()),
            "height": pa.array(hs, pa.int32()),
        })


class FrameSampler:
    """Actor-pool stage: binary video column → N evenly-spaced fake frame
    digests (real frame extraction is a stub; the fan-out row layout —
    one row per sampled frame — is the tested contract)."""

    def __init__(self, n_frames: int = 4, payload_col: str = "payload",
                 id_col: str = "item_id"):
        self.n_frames = n_frames
        self.payload_col, self.id_col = payload_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frame_idx, digests = [], [], []
        for item_id, payload in zip(batch[self.id_col].to_pylist(),
                                    batch[self.payload_col].to_pylist()):
            p = payload or b""
            for i in range(self.n_frames):
                ids.append(item_id)
                frame_idx.append(i)
                digests.append(hashlib.blake2b(p + i.to_bytes(4, "big"),
                                               digest_size=16).hexdigest())
        return pa.table({
            self.id_col: pa.array(ids),
            "frame_idx": pa.array(frame_idx, pa.int32()),
            "frame_digest": pa.array(digests, pa.string()),
        })


def featurize_images(ds: rd.Dataset, feat_dim: int = 64,
                     payload_col: str = "payload", id_col: str = "item_id",
                     batch_size: int = 32) -> rd.Dataset:
    """Binary payloads need small batches (see module docstring)."""
    return ds.map_batches(
        ImageFeaturizer, batch_format="pyarrow", batch_size=batch_size,
        fn_constructor_kwargs=dict(feat_dim=feat_dim, payload_col=payload_col,
                                   id_col=id_col),
        concurrency=(1, 8))


def sample_frames(ds: rd.Dataset, n_frames: int = 4,
                  payload_col: str = "payload", id_col: str = "item_id",
                  batch_size: int = 16) -> rd.Dataset:
    return ds.map_batches(
        FrameSampler, batch_format="pyarrow", batch_size=batch_size,
        fn_constructor_kwargs=dict(n_frames=n_frames, payload_col=payload_col,
                                   id_col=id_col),
        concurrency=(1, 8))
