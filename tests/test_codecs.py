"""Pure-Python PNG/WAV codecs + the builtin multimodal backend.

The PNG decode path is validated against HAND-CRAFTED chunk streams
with known pixel bytes per filter type (not just our own encoder), so
the unfilter math can't self-confirm."""

import struct
import zlib

import numpy as np
import pyarrow as pa
import pytest

from raydex.ops.codecs import (
    BuiltinBackend,
    png_decode,
    png_encode,
    png_resize,
    png_size,
    wav_decode,
    wav_encode,
)

MAGIC = b"\x89PNG\r\n\x1a\n"


def _chunk(ctype, data):
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))


def _handmade_png(scanlines: bytes, w: int, h: int, color_type: int) -> bytes:
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (MAGIC + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(scanlines))
            + _chunk(b"IEND", b""))


def test_png_decode_each_filter_type():
    # 3x2 greyscale. Row 1: filter 0 (raw 10,20,30). Row 2: filter 2
    # (Up: stored deltas 5,5,5 -> 15,25,35).
    p = _handmade_png(b"\x00\x0a\x14\x1e" + b"\x02\x05\x05\x05", 3, 2, 0)
    img = png_decode(p)
    assert img.shape == (2, 3, 1)
    assert img[:, :, 0].tolist() == [[10, 20, 30], [15, 25, 35]]

    # filter 1 (Sub): stored 100,10,10 -> 100,110,120
    p = _handmade_png(b"\x01\x64\x0a\x0a", 3, 1, 0)
    assert png_decode(p)[0, :, 0].tolist() == [100, 110, 120]

    # filter 4 (Paeth) over RGB: first row raw, second all-zero deltas
    # -> equals first row (Paeth predicts b=up when a=c=0... exactly)
    row1 = bytes([0, 1, 2, 3, 4, 5, 6])  # filter 0 + 2 px RGB
    row2 = bytes([4, 0, 0, 0, 0, 0, 0])  # filter 4, zero deltas
    p = _handmade_png(row1 + row2, 2, 2, 2)
    img = png_decode(p)
    assert img[1].tolist() == img[0].tolist()

    # filter 3 (Average): stored value + (left+up)//2
    row1 = bytes([0, 100, 100])
    row2 = bytes([3, 10, 10])   # px1: 10+(0+100)//2=60; px2: 10+(60+100)//2=90
    p = _handmade_png(row1 + row2, 2, 2, 0)
    assert png_decode(p)[1, :, 0].tolist() == [60, 90]


def test_png_roundtrip_and_size():
    rng = np.random.default_rng(5)
    for ch in (1, 2, 3, 4):
        img = rng.integers(0, 256, size=(7, 5, ch), dtype=np.uint8)
        p = png_encode(img)
        assert png_size(p) == (5, 7)
        back = png_decode(p)
        assert np.array_equal(back, img)


def test_png_resize_nearest():
    # 2x2 quadrant image upscaled 2x: each quadrant becomes a 2x2 block
    img = np.array([[[255], [0]], [[64], [128]]], dtype=np.uint8)
    out = png_decode(png_resize(png_encode(img), 4, 4))
    assert out[0, 0, 0] == 255 and out[0, 3, 0] == 0
    assert out[3, 0, 0] == 64 and out[3, 3, 0] == 128
    assert out.shape == (4, 4, 1)


def test_png_rejects_exotic():
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)  # 16-bit
    p = MAGIC + _chunk(b"IHDR", ihdr) + _chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="bit depth"):
        png_decode(p)
    with pytest.raises(ValueError, match="magic"):
        png_decode(b"JFIF not a png")


def test_wav_roundtrip():
    t = np.linspace(0, 1, 1600, dtype=np.float32)
    sig = 0.5 * np.sin(2 * np.pi * 440 * t)
    p = wav_encode(sig, rate=1600)
    x, rate = wav_decode(p)
    assert rate == 1600 and x.shape == (1600, 1)
    assert np.abs(x[:, 0] - sig).max() < 1e-3


def test_builtin_backend_features_deterministic():
    b = BuiltinBackend()
    img = np.zeros((8, 8, 3), dtype=np.uint8)
    img[:4] = 255  # top half white
    p = png_encode(img)
    f1 = b.decode_features(p, 12)
    f2 = b.decode_features(p, 12)
    assert np.array_equal(f1, f2) and f1.shape == (12,)
    assert f1.max() > 0.9  # white region pools to ~1.0
    assert b.image_size(p) == (8, 8)

    wav = wav_encode(np.ones(320, dtype=np.float32) * 0.25, rate=320)
    fa = b.decode_features(wav, 8)
    assert fa.shape == (8,) and np.all(np.abs(fa - 0.25) < 1e-2)

    with pytest.raises(ValueError, match="PNG/WAV"):
        b.decode_features(b"random bytes", 8)


def test_multimodal_stages_with_builtin_backend(ray_session):
    """The real codec rides the SAME actor-pool stages the fake does:
    feature extraction + aspect-preserving PNG resize over a Dataset."""
    import ray.data as rd

    from raydex.ops.multimodal import extract_media_features, resize_images

    rng = np.random.default_rng(11)
    rows = []
    for i in range(12):
        w, h = 16 + i, 12 + i
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        rows.append({"media_id": i, "payload": png_encode(img),
                     "width": w, "height": h})
    t = pa.table({
        "media_id": pa.array([r["media_id"] for r in rows], pa.int64()),
        "payload": pa.array([r["payload"] for r in rows], pa.binary()),
        "width": pa.array([r["width"] for r in rows], pa.int32()),
        "height": pa.array([r["height"] for r in rows], pa.int32()),
    })
    ds = rd.from_arrow(t)
    feats = extract_media_features(ds, dim=27, backend="builtin",
                                   concurrency=2).to_pandas()
    assert len(feats) == 12
    assert all(len(f) == 27 for f in feats["features"])

    small = resize_images(rd.from_arrow(t), max_side=8,
                          backend="builtin", concurrency=2).to_pandas()
    assert (small[["width", "height"]].max(axis=1) == 8).all()
    # resized payloads are REAL PNGs of the stated size
    for _, row in small.iterrows():
        assert png_size(row["payload"]) == (row["width"], row["height"])
