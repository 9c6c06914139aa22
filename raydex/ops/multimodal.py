"""Multimodal column plumbing: binary payload stages with typed metadata.

Image/audio/video payloads are opaque ``binary`` columns + metadata
(mime, width/height/duration). Decode/resize/frame-sample are
actor-pool ``map_batches`` stages whose Ray-side plumbing (schema,
batch sizing for large payloads, actor ``__init__`` model-load slot,
output layout) is REAL and tested. The codec slot (``DecodeBackend``)
has two shipped backends: ``"builtin"`` — a REAL pure-Python PNG/WAV
codec (``raydex.ops.codecs``: zlib inflate + scanline unfilter,
RIFF PCM) — and ``"fake"``, the deterministic pseudo-codec kept for
synthetic media and the video pseudo-container. PIL/ffmpeg-class
codecs plug in via ``register_backend``.
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


def _get_backend(name: str) -> DecodeBackend:
    if name == "builtin" and name not in _BACKENDS:
        # real pure-Python PNG/WAV codec (raydex.ops.codecs) — lazy so
        # the fake tier never pays the import
        from raydex.ops.codecs import BuiltinBackend

        _BACKENDS["builtin"] = BuiltinBackend()
    return _BACKENDS[name]


class MediaFeatureExtract:
    """Actor-pool stage: backend loaded ONCE per actor in __init__;
    per batch, decode each binary payload to a feature vector.

    Use small ``batch_size`` (payloads are MBs): batch_size x concurrency
    payload bytes must fit worker heap."""

    def __init__(self, payload_col: str = "payload", dim: int = 64, backend: str = "fake"):
        self.payload_col = payload_col
        self.dim = dim
        self.backend = _get_backend(backend)
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


class ImageResize:
    """Actor-pool resize stage (image binary -> image binary + updated
    metadata). The codec call goes through the backend (`resize`); the
    default fake derives a deterministic payload of the target byte
    budget, keeping the Ray plumbing — schema in/out, metadata rewrite,
    per-actor codec slot — fully testable without an image library.

    Output layout (the contract a PIL-backed backend must keep):
    same columns, `payload` replaced by the resized bytes and
    `width`/`height` set to the target box (aspect-preserving fit)."""

    def __init__(self, max_side: int = 256, payload_col: str = "payload",
                 backend: str = "fake"):
        self.max_side = max_side
        self.payload_col = payload_col
        self.backend = _get_backend(backend)
        self.backend.load()

    def _fit(self, w: int, h: int) -> tuple[int, int]:
        scale = min(1.0, self.max_side / max(w, h, 1))
        return max(1, int(w * scale)), max(1, int(h * scale))

    def __call__(self, t: pa.Table) -> pa.Table:
        ws = t["width"].to_numpy()
        hs = t["height"].to_numpy()
        new_w, new_h, payloads = [], [], []
        resize = getattr(self.backend, "resize", None)
        for p, w, h in zip(t[self.payload_col].to_pylist(), ws, hs):
            tw, th = self._fit(int(w), int(h))
            new_w.append(tw)
            new_h.append(th)
            if resize is not None:
                payloads.append(resize(p or b"", tw, th))
            else:  # deterministic fake: size-proportional byte budget
                budget = max(16, len(p or b"") * tw * th // max(w * h, 1))
                payloads.append(
                    hashlib.sha256((p or b"") + bytes([tw % 256, th % 256]))
                    .digest() * (budget // 32 + 1)
                )
        idx = t.schema.get_field_index(self.payload_col)
        out = t.set_column(idx, self.payload_col,
                           pa.array(payloads, pa.binary()))
        out = out.set_column(out.schema.get_field_index("width"), "width",
                             pa.array(new_w, pa.int32()))
        return out.set_column(out.schema.get_field_index("height"), "height",
                              pa.array(new_h, pa.int32()))


def resize_images(ds, max_side: int = 256, concurrency: int = 4,
                  batch_size: int = 32, backend: str = "fake"):
    """Large payloads -> SMALL batch_size: batch_size x concurrency x
    payload bytes must fit a worker heap (the multimodal sizing rule)."""
    return ds.map_batches(
        ImageResize,
        fn_constructor_kwargs={"max_side": max_side, "backend": backend},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency,
    )


FRAME_BYTES = 256  # fake container: fixed-size pseudo-frames


class FrameSample:
    """Actor-pool video frame-sampling stage: one input row (video
    binary) EXPLODES into one output row per sampled frame — the
    one-to-many layout every real video pipeline needs (ffmpeg-backed
    backends keep the same contract: iterate frames, keep every Nth).

    Output schema: carried metadata columns + ``frame_idx`` (int64) +
    ``frame`` (binary). The fake container treats the payload as a
    sequence of FRAME_BYTES-sized frames."""

    def __init__(self, every_n: int = 10, payload_col: str = "payload",
                 carry_cols: tuple = ("media_id",), backend: str = "fake"):
        self.every_n = max(1, int(every_n))
        self.payload_col = payload_col
        self.carry_cols = tuple(carry_cols)
        self.backend = _get_backend(backend)
        self.backend.load()

    def _frames(self, payload: bytes):
        it = getattr(self.backend, "iter_frames", None)
        if it is not None:
            yield from it(payload)
            return
        for i in range(0, len(payload), FRAME_BYTES):
            yield payload[i : i + FRAME_BYTES]

    def __call__(self, t: pa.Table) -> pa.Table:
        carried = {c: [] for c in self.carry_cols}
        fidx: list[int] = []
        frames: list[bytes] = []
        cols = {c: t[c].to_pylist() for c in self.carry_cols}
        for row, p in enumerate(t[self.payload_col].to_pylist()):
            for j, fr in enumerate(self._frames(p or b"")):
                if j % self.every_n:
                    continue
                for c in self.carry_cols:
                    carried[c].append(cols[c][row])
                fidx.append(j)
                frames.append(fr)
        return pa.table(
            {
                **{c: pa.array(carried[c]) for c in self.carry_cols},
                "frame_idx": pa.array(fidx, pa.int64()),
                "frame": pa.array(frames, pa.binary()),
            }
        )


def sample_frames(ds, every_n: int = 10, concurrency: int = 4,
                  batch_size: int = 16, carry_cols: tuple = ("media_id",),
                  backend: str = "fake"):
    """Row-exploding stage: output rows ~= input rows x frames/every_n;
    Ray Data re-blocks downstream, so the explosion never builds a
    driver-side list."""
    return ds.map_batches(
        FrameSample,
        fn_constructor_kwargs={"every_n": every_n, "carry_cols": carry_cols,
                               "backend": backend},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency,
    )
