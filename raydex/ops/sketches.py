"""Mergeable sketches: HyperLogLog++ (cardinality agg analogue).

Re-implements from the published HLL++ paper (Heule et al., "HyperLogLog
in Practice", EDBT 2013 — the algorithm behind the reference's
``server/.../search/aggregations/metrics/HyperLogLogPlusPlus.java``, see
``AbstractHyperLogLogPlusPlus.java:28``): 2^p registers of max leading-
zero ranks, linear-counting fallback at low fill, register-wise MAX
merge. Hashing: two murmur3_x86_32 passes (seeds 0 and 1) combined into
a 64-bit value — vectorized, deterministic.

Partial/final law (InternalAggregationTestCase analogue): merging
sketches built over any split of the input equals the single-pass
sketch; property-tested in tests/test_sketches.py.
"""

from __future__ import annotations

import numpy as np

from raydex.partition import murmur3_hash_many


def _hash64(strings) -> np.ndarray:
    h1 = murmur3_hash_many(strings).astype(np.uint64) & np.uint64(0xFFFFFFFF)
    salted = [s + "\x01" for s in strings]
    h2 = murmur3_hash_many(salted).astype(np.uint64) & np.uint64(0xFFFFFFFF)
    return (h1 << np.uint64(32)) | h2


class HllPlusPlus:
    def __init__(self, p: int = 14):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add_hashed(self, h: np.ndarray) -> None:
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) | np.uint64((1 << self.p) - 1)
        # rank = leading zeros of `rest` + 1, capped at 64 - p + 1
        lz = np.zeros(h.size, dtype=np.uint8)
        cur = rest.copy()
        # vectorized leading-zero count via progressive halving
        for shift in (32, 16, 8, 4, 2, 1):
            mask = cur < (np.uint64(1) << np.uint64(64 - shift))
            lz[mask] += shift
            cur[mask] = cur[mask] << np.uint64(shift)
        rank = lz.astype(np.uint8) + 1
        np.maximum.at(self.registers, idx, rank)

    def add(self, strings) -> None:
        if len(strings):
            self.add_hashed(_hash64(strings))

    def merge(self, other: "HllPlusPlus") -> "HllPlusPlus":
        assert self.p == other.p
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def cardinality(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1.0 + 1.079 / m)
        inv = np.ldexp(1.0, -self.registers.astype(np.int32))
        e = alpha * m * m / inv.sum()
        zeros = int((self.registers == 0).sum())
        if e <= 2.5 * m and zeros:
            return m * np.log(m / zeros)  # linear counting
        return float(e)

    def to_bytes(self) -> bytes:
        return bytes([self.p]) + self.registers.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes) -> "HllPlusPlus":
        h = cls(p=b[0])
        h.registers = np.frombuffer(b[1:], dtype=np.uint8).copy()
        return h


def cardinality_hll(ds, col: str, p: int = 14, name: str = "cardinality"):
    """Distributed HLL++: one sketch per block (map_batches partial),
    register-MAX merge on the driver (sketch = 16KB, trivially small)."""
    import pyarrow as pa

    def partial(t: pa.Table) -> pa.Table:
        h = HllPlusPlus(p)
        vals = t[col].to_pylist()
        h.add([str(v) for v in vals if v is not None])
        return pa.table({"sketch": pa.array([h.to_bytes()], pa.large_binary())})

    acc = HllPlusPlus(p)
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for s in b["sketch"].to_pylist():
            acc.merge(HllPlusPlus.from_bytes(s))
    return pa.table({name: pa.array([int(round(acc.cardinality()))], pa.int64())})
