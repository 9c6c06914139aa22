"""Lucene ``SmallFloat`` int<->byte4 norm quantization, vectorized.

Re-implements (from the published Lucene 8.x algorithm; reference call
sites: ES uses Lucene norms for `text` fields —
``server/src/main/java/org/elasticsearch/index/mapper/TextFieldMapper.java:99``
and BM25 scoring via
``server/src/main/java/org/elasticsearch/index/similarity/SimilarityProviders.java:234-241``)
the 4-bit-float-with-free-values encoding Lucene uses to store per-doc
field length (number of tokens) in ONE byte. Rank-identity with Lucene
BM25 requires scoring against the quantized round-trip length, not the
raw length (SURVEY.md §5 oracle notes).

Encoding (Lucene ``SmallFloat.intToByte4``):
  - lengths 0..23 are stored exactly ("free values";
    NUM_FREE_VALUES = 255 - longToInt4(2^31-1) = 255 - 231 = 24);
  - larger lengths are stored as a 4-bit float (3 mantissa bits +
    implicit leading 1, shift exponent) of ``length - 24``, biased by 24.

Decoding is a 256-entry lookup table; encoding is a searchsorted against
the (monotone) decode table — ``intToByte4`` truncates the mantissa, i.e.
rounds *down* to the nearest representable value.
"""

from __future__ import annotations

import numpy as np


def _long_to_int4(i: int) -> int:
    if i < 0:
        raise ValueError("only non-negative")
    num_bits = i.bit_length()
    if num_bits < 4:
        return i
    shift = num_bits - 4
    encoded = (i >> shift) & 0x07  # clear the implicit leading bit
    encoded |= (shift + 1) << 3
    return encoded


def _int4_to_long(i: int) -> int:
    bits = i & 0x07
    shift = (i >> 3) - 1
    if shift == -1:
        return bits
    return (bits | 0x08) << shift


_MAX_INT4 = _long_to_int4(2**31 - 1)  # 231
NUM_FREE_VALUES = 255 - _MAX_INT4  # 24

# byte (0..255) -> decoded int length
BYTE4_TO_INT = np.array(
    [
        b if b < NUM_FREE_VALUES else NUM_FREE_VALUES + _int4_to_long(b - NUM_FREE_VALUES)
        for b in range(256)
    ],
    dtype=np.int64,
)
assert np.all(np.diff(BYTE4_TO_INT) > 0), "decode table must be strictly increasing"


def int_to_byte4(lengths: np.ndarray) -> np.ndarray:
    """Vectorized ``SmallFloat.intToByte4`` (rounds down). -> uint8 array."""
    lengths = np.asarray(lengths, dtype=np.int64)
    if lengths.size and lengths.min() < 0:
        raise ValueError("lengths must be non-negative")
    idx = np.searchsorted(BYTE4_TO_INT, lengths, side="right") - 1
    return idx.astype(np.uint8)


def byte4_to_int(norms: np.ndarray) -> np.ndarray:
    """Vectorized ``SmallFloat.byte4ToInt``. uint8 -> int64 lengths."""
    return BYTE4_TO_INT[np.asarray(norms, dtype=np.uint8)]
