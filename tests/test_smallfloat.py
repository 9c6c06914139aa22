import numpy as np

from raydex.analysis.smallfloat import (
    BYTE4_TO_INT,
    NUM_FREE_VALUES,
    byte4_to_int,
    int_to_byte4,
)


def test_free_values_exact():
    assert NUM_FREE_VALUES == 24
    lengths = np.arange(24)
    assert np.array_equal(byte4_to_int(int_to_byte4(lengths)), lengths)


def test_known_points():
    # spot values from the 4-bit-float construction
    assert BYTE4_TO_INT[24] == 24  # first non-free value: 24 + int4ToLong(0)
    assert BYTE4_TO_INT[255] == 24 + ((0x7 | 0x8) << 27)  # max encodable


def test_round_trip_monotone_round_down():
    rng = np.random.default_rng(42)
    lengths = rng.integers(0, 2**31 - 1, size=20000)
    b = int_to_byte4(lengths)
    dec = byte4_to_int(b)
    # rounds down, and to the nearest representable value
    assert np.all(dec <= lengths)
    nxt = np.where(b < 255, BYTE4_TO_INT[np.minimum(b + 1, 255)], np.iinfo(np.int64).max)
    assert np.all(lengths < nxt)


def test_idempotent_on_representable():
    b = np.arange(256, dtype=np.uint8)
    assert np.array_equal(int_to_byte4(byte4_to_int(b)), b)
