"""Pure-Python media codecs: PNG (zlib inflate + unfilter) and WAV
(PCM) — the default REAL backend behind ``raydex.ops.multimodal``'s
``DecodeBackend`` slot.

The container ships no image/audio libraries, but both formats are
fully specified public standards implementable on the stdlib: PNG
(RFC 2083 / the W3C PNG spec: IHDR/IDAT chunks, zlib-compressed
scanlines, per-row filters None/Sub/Up/Average/Paeth) and WAV (RIFF
PCM, stdlib ``wave``). Reference parity target:
``modules/ingest-attachment`` is scope-guarded, but the multimodal
pipeline tier (SURVEY §: training-data ops) needs a real decode path;
this replaces the documented fake for PNG/WAV payloads while the fake
remains the deterministic test backend and the video pseudo-container.

Supported PNG subset: 8-bit depth, color types 0 (grey), 2 (RGB),
4 (grey+alpha), 6 (RGBA), non-interlaced. Everything a resize/feature
pipeline writes and reads; exotic PNGs (16-bit, palette, Adam7) raise
with a clear message.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def png_decode(payload: bytes) -> np.ndarray:
    """PNG bytes -> (H, W, C) uint8 array."""
    if payload[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG payload (bad magic)")
    pos = 8
    width = height = None
    color_type = bit_depth = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos:pos + 4])
        ctype = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = \
                struct.unpack(">IIBBBBB", data)
            if bit_depth != 8:
                raise ValueError(f"unsupported PNG bit depth {bit_depth}")
            if color_type not in _CHANNELS:
                raise ValueError(f"unsupported PNG color type {color_type}")
            if interlace:
                raise ValueError("interlaced (Adam7) PNG unsupported")
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG has no IHDR chunk")
    ch = _CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * ch
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG scanline payload has the wrong size")
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        off = y * (stride + 1)
        ftype = raw[off]
        line = np.frombuffer(raw, dtype=np.uint8,
                             count=stride, offset=off + 1).copy()
        if ftype == 0:          # None
            cur = line
        elif ftype == 2:        # Up
            cur = line + prev
        elif ftype == 1:        # Sub (sequential within the row)
            cur = line
            for x in range(ch, stride):
                cur[x] += cur[x - ch]
        elif ftype == 3:        # Average
            cur = line
            for x in range(stride):
                left = int(cur[x - ch]) if x >= ch else 0
                cur[x] = (int(cur[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:        # Paeth
            cur = line
            for x in range(stride):
                a = int(cur[x - ch]) if x >= ch else 0
                b = int(prev[x])
                c = int(prev[x - ch]) if x >= ch else 0
                p = a + b - c
                pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc) else (
                    b if pb <= pc else c)
                cur[x] = (int(cur[x]) + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = cur
        prev = cur
    return out.reshape(height, width, ch)


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))


def png_encode(img: np.ndarray) -> bytes:
    """(H, W, C) uint8 array -> PNG bytes (filter 0, one IDAT)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    flat = img.reshape(h, w * ch)
    lines = np.zeros((h, w * ch + 1), dtype=np.uint8)
    lines[:, 1:] = flat  # filter byte 0 per row
    idat = zlib.compress(lines.tobytes(), 6)
    return (_PNG_MAGIC + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat)
            + _chunk(b"IEND", b""))


def png_size(payload: bytes) -> tuple[int, int]:
    if payload[:8] != _PNG_MAGIC or payload[12:16] != b"IHDR":
        raise ValueError("not a PNG payload")
    w, h = struct.unpack(">II", payload[16:24])
    return int(w), int(h)


def png_resize(payload: bytes, tw: int, th: int) -> bytes:
    """Nearest-neighbor resize (numpy index gather), re-encoded PNG."""
    img = png_decode(payload)
    h, w = img.shape[:2]
    ys = np.minimum((np.arange(th) * h) // max(th, 1), h - 1)
    xs = np.minimum((np.arange(tw) * w) // max(tw, 1), w - 1)
    return png_encode(img[ys][:, xs])


def wav_decode(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (float32 samples in [-1, 1] shaped (n, channels),
    sample_rate)."""
    with wave.open(io.BytesIO(payload), "rb") as f:
        rate = f.getframerate()
        ch = f.getnchannels()
        width = f.getsampwidth()
        raw = f.readframes(f.getnframes())
    if width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32)
             - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    return x.reshape(-1, ch), rate


def wav_encode(samples: np.ndarray, rate: int = 16000) -> bytes:
    """(n, channels) float32 in [-1, 1] -> 16-bit PCM WAV bytes."""
    s = np.asarray(samples, dtype=np.float32)
    if s.ndim == 1:
        s = s[:, None]
    pcm = np.clip(s * 32767.0, -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(s.shape[1])
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(pcm.tobytes())
    return buf.getvalue()


class BuiltinBackend:
    """Real codec backend for the multimodal stages: PNG payloads
    decode to pixel grids, WAV payloads to PCM — feature vectors are
    deterministic content statistics (pooled channel means for images,
    windowed RMS energies for audio), so identical media always yields
    identical features."""

    name = "builtin"

    def load(self) -> None:
        pass

    @staticmethod
    def _kind(payload: bytes) -> str:
        if payload[:8] == _PNG_MAGIC:
            return "png"
        if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            return "wav"
        return "unknown"

    def decode_features(self, payload: bytes, dim: int) -> np.ndarray:
        kind = self._kind(payload)
        if kind == "png":
            img = png_decode(payload).astype(np.float32) / 255.0
            h, w, ch = img.shape
            g = max(1, int(np.sqrt(dim // max(ch, 1))) or 1)
            ys = np.linspace(0, h, g + 1).astype(int)
            xs = np.linspace(0, w, g + 1).astype(int)
            feats = [img[ys[i]:max(ys[i + 1], ys[i] + 1),
                         xs[j]:max(xs[j + 1], xs[j] + 1)].mean(axis=(0, 1))
                     for i in range(g) for j in range(g)]
            v = np.concatenate(feats)
        elif kind == "wav":
            x, _rate = wav_decode(payload)
            mono = x.mean(axis=1)
            n = max(1, mono.size // dim)
            trim = mono[: n * dim].reshape(dim, n) if mono.size >= dim \
                else np.pad(mono, (0, dim - mono.size)).reshape(dim, 1)
            v = np.sqrt((trim * trim).mean(axis=1))
        else:
            raise ValueError(
                "builtin backend decodes PNG/WAV payloads only — use "
                "the 'fake' backend for synthetic media")
        if v.size < dim:
            v = np.pad(v, (0, dim - v.size))
        return v[:dim].astype(np.float32)

    def image_size(self, payload: bytes) -> tuple[int, int]:
        return png_size(payload)

    def resize(self, payload: bytes, tw: int, th: int) -> bytes:
        if self._kind(payload) != "png":
            raise ValueError("builtin resize handles PNG payloads")
        return png_resize(payload, tw, th)
