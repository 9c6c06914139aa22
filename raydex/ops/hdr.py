"""HDR-histogram percentiles — the reference's second percentiles engine
(``server/.../search/aggregations/metrics/PercentilesConfig.java:100``,
``percentiles: {hdr: {number_of_significant_value_digits: N}}``).

Re-implements the published HdrHistogram log-linear bucketing (Gil Tene,
hdrhistogram.org): values are binned into exponentially-growing buckets
each split into ``sub_bucket_count`` linear sub-buckets, giving a fixed
RELATIVE error of 10^-significant_digits at any magnitude. The counts
array is the whole state:

- record:  vectorized index math (numpy bit tricks) + one bincount
- merge:   counts addition — EXACT partial/final law (unlike t-digest's
           approximate centroid merge), property-tested
- quantile: cumulative scan, returning the bucket's highest equivalent
           value (the reference engine's getValueAtPercentile contract)

Non-negative integer values (doc lengths, latencies, sizes); floats are
the t-digest engine's domain (raydex.ops.tdigest).
"""

from __future__ import annotations

import numpy as np


class HdrHistogram:
    def __init__(self, significant_digits: int = 3, max_value: int = 1 << 40):
        if not 1 <= significant_digits <= 5:
            raise ValueError("significant_digits must be in 1..5")
        self.significant_digits = significant_digits
        self.max_value = int(max_value)
        largest_single_unit = 2 * 10**significant_digits
        self.sub_bucket_count = 1 << (largest_single_unit - 1).bit_length()
        self.sub_bucket_half_count = self.sub_bucket_count // 2
        self.sub_bucket_mask = self.sub_bucket_count - 1
        self.sub_bucket_count_mag = self.sub_bucket_count.bit_length() - 1
        # enough doubling buckets that the last covers max_value
        b, smallest_untrackable = 1, self.sub_bucket_count
        while smallest_untrackable <= self.max_value:
            smallest_untrackable <<= 1
            b += 1
        self.bucket_count = b
        self.counts = np.zeros(
            (self.bucket_count + 1) * self.sub_bucket_half_count, dtype=np.int64
        )
        self.total = 0

    # ---- index math (vectorized)

    def _indexes(self, v: np.ndarray) -> np.ndarray:
        v = np.asarray(v, dtype=np.int64)
        if (v < 0).any():
            raise ValueError("HdrHistogram records non-negative values only")
        v = np.minimum(v, self.max_value)
        # floor(log2(v | mask)) — exact via frexp for ints < 2^53
        msb = np.frexp((v | self.sub_bucket_mask).astype(np.float64))[1] - 1
        # canonical HdrHistogram bucket index: msb relative to the HALF
        # count magnitude (bucket 0 spans the full sub-bucket range,
        # higher buckets only its upper half)
        bucket_idx = msb - (self.sub_bucket_count_mag - 1)
        sub_idx = v >> bucket_idx
        return (bucket_idx + 1) * self.sub_bucket_half_count + (
            sub_idx - self.sub_bucket_half_count
        )

    def record_many(self, values) -> "HdrHistogram":
        v = np.asarray(values)
        v = v[~np.isnan(v.astype(np.float64))].astype(np.int64) if v.dtype.kind == "f" else v.astype(np.int64)
        if v.size == 0:
            return self
        idx = self._indexes(v)
        self.counts += np.bincount(idx, minlength=self.counts.size)
        self.total += int(v.size)
        return self

    def merge(self, other: "HdrHistogram") -> "HdrHistogram":
        if other.significant_digits != self.significant_digits:
            raise ValueError("merge requires identical precision")
        n = max(self.counts.size, other.counts.size)
        if self.counts.size < n:
            self.counts = np.pad(self.counts, (0, n - self.counts.size))
        oc = other.counts
        if oc.size < n:
            oc = np.pad(oc, (0, n - oc.size))
        self.counts += oc
        self.total += other.total
        return self

    # ---- value reconstruction

    def _value_at_index(self, index: int) -> tuple[int, int]:
        """(lowest equivalent value, size) of the bucket at counts index."""
        bucket_idx = index // self.sub_bucket_half_count - 1
        sub_idx = index % self.sub_bucket_half_count + self.sub_bucket_half_count
        if bucket_idx < 0:
            bucket_idx, sub_idx = 0, sub_idx - self.sub_bucket_half_count
        lowest = sub_idx << bucket_idx
        return lowest, 1 << bucket_idx

    def value_at_percentile(self, pct: float) -> int:
        """The reference engine's contract: the HIGHEST value equivalent
        to the bucket containing the percentile rank."""
        if self.total == 0:
            return 0
        need = max(1, int(np.ceil(pct / 100.0 * self.total)))
        cum = np.cumsum(self.counts)
        index = int(np.searchsorted(cum, need))
        lowest, size = self._value_at_index(index)
        return lowest + size - 1

    def quantile(self, q: float) -> float:
        # inlined rather than value_at_percentile(q*100) so need =
        # ceil(q*total) is computed from the caller's q directly (the
        # q*100/100 double round-trip is not an identity) — this makes
        # the rank math bit-mirrorable by a SQL oracle
        if self.total == 0:
            return 0.0
        need = max(1, int(np.ceil(q * self.total)))
        cum = np.cumsum(self.counts)
        index = int(np.searchsorted(cum, need))
        lowest, size = self._value_at_index(index)
        return float(lowest + size - 1)

    def to_sparse(self) -> tuple[list[int], list[int]]:
        nz = np.flatnonzero(self.counts)
        return nz.tolist(), self.counts[nz].tolist()

    @classmethod
    def from_sparse(cls, idx, cnt, significant_digits=3, max_value=1 << 40):
        h = cls(significant_digits, max_value)
        idx = np.asarray(idx, dtype=np.int64)
        cnt = np.asarray(cnt, dtype=np.int64)
        h.counts[idx] = cnt
        h.total = int(cnt.sum())
        return h


def percentiles_hdr(ds, col: str, qs=(0.25, 0.5, 0.75, 0.95, 0.99),
                    significant_digits: int = 3):
    """Distributed HDR percentiles: one histogram per block (map_batches
    partial, shipped SPARSE), exact counts merge on the driver, quantile
    final — the same partial/final shape as ``percentiles_agg`` with the
    reference's hdr engine semantics."""
    import pyarrow as pa

    def partial(t: pa.Table) -> pa.Table:
        h = HdrHistogram(significant_digits)
        h.record_many(t[col].to_numpy(zero_copy_only=False))
        idx, cnt = h.to_sparse()
        return pa.table(
            {
                "idx": pa.array([idx], pa.list_(pa.int64())),
                "cnt": pa.array([cnt], pa.list_(pa.int64())),
            }
        )

    acc = HdrHistogram(significant_digits)
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for idx, cnt in zip(b["idx"].to_pylist(), b["cnt"].to_pylist()):
            acc.merge(HdrHistogram.from_sparse(idx, cnt, significant_digits))
    import pyarrow as pa

    return pa.table(
        {
            "quantile": pa.array(list(qs), pa.float64()),
            "value": pa.array([acc.quantile(q) for q in qs], pa.float64()),
        }
    )
