"""Multimodal column plumbing: binary payload stages with typed metadata.

Image/audio/video payloads are opaque ``binary`` columns + metadata
(mime, width/height/duration). Decode/resize/frame-sample are
actor-pool ``map_batches`` stages whose Ray-side plumbing (schema,
batch sizing for large payloads, actor ``__init__`` model-load slot,
output layout) is REAL and tested; the codec call itself is stubbed
(no image/audio libraries in this container) behind
``DecodeBackend`` — swap in PIL/ffmpeg by registering a backend.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


class DecodeBackend:
    """Codec interface. The default deterministic fake 'decodes' a
    payload into a pseudo-feature vector derived from its bytes —
    replace via ``register_backend`` when a real codec is available."""

    name = "fake"

    def load(self) -> None:  # model/codec load slot (once per actor)
        pass

    def decode_features(self, payload: bytes, dim: int) -> np.ndarray:
        h = hashlib.sha256(payload).digest()
        raw = np.frombuffer((h * (dim * 4 // len(h) + 1))[: dim * 4], dtype=np.uint32)
        return (raw.astype(np.float64) / np.iinfo(np.uint32).max).astype(np.float32)

    def image_size(self, payload: bytes) -> tuple[int, int]:
        raise NotImplementedError("real image decoding needs an image library")


_BACKENDS: dict[str, DecodeBackend] = {"fake": DecodeBackend()}


def register_backend(name: str, backend: DecodeBackend) -> None:
    _BACKENDS[name] = backend


class MediaFeatureExtract:
    """Actor-pool stage: backend loaded ONCE per actor in __init__;
    per batch, decode each binary payload to a feature vector.

    Use small ``batch_size`` (payloads are MBs): batch_size x concurrency
    payload bytes must fit worker heap."""

    def __init__(self, payload_col: str = "payload", dim: int = 64, backend: str = "fake"):
        self.payload_col = payload_col
        self.dim = dim
        self.backend = _BACKENDS[backend]
        self.backend.load()

    def __call__(self, t: pa.Table) -> pa.Table:
        feats = [
            self.backend.decode_features(p if p is not None else b"", self.dim)
            for p in t[self.payload_col].to_pylist()
        ]
        out = t.drop_columns([self.payload_col])  # features replace payload
        return out.append_column(
            "features",
            pa.array([f.tolist() for f in feats], pa.list_(pa.float32(), self.dim)),
        )


def extract_media_features(ds, payload_col: str = "payload", dim: int = 64,
                           backend: str = "fake", concurrency: int = 4,
                           batch_size: int = 64):
    return ds.map_batches(
        MediaFeatureExtract,
        fn_constructor_kwargs={"payload_col": payload_col, "dim": dim, "backend": backend},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def make_media_table(n: int, seed: int = 21, payload_bytes: int = 2048) -> pa.Table:
    """Deterministic fake media table (binary payload + metadata)."""
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, size=payload_bytes, dtype=np.uint8).tobytes() for _ in range(n)]
    return pa.table(
        {
            "media_id": pa.array(range(n), pa.int64()),
            "mime": pa.array(["image/fake"] * n),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(rng.integers(64, 4096, size=n), pa.int32()),
            "height": pa.array(rng.integers(64, 4096, size=n), pa.int32()),
        }
    )
