"""Mergeable t-digest for `percentiles` / `percentile_ranks` aggs.

Re-implements from the published t-digest paper (Dunning & Ertl,
"Computing extremely accurate quantiles using t-digests") — the
reference's default percentiles engine
(``server/.../search/aggregations/metrics/PercentilesConfig.java:48``).
Merging-digest variant: centroids merged under the scale-function size
bound k1; deterministic (no randomized centroid ordering).

Partial/final law: merge(digest(a), digest(b)) approximates digest(a+b);
quantile error bounds property-tested in tests/test_sketches.py.
"""

from __future__ import annotations

import numpy as np


class TDigest:
    def __init__(self, compression: float = 100.0):
        self.compression = compression
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)

    def add(self, values: np.ndarray) -> "TDigest":
        values = np.asarray(values, dtype=np.float64)
        if values.size == 0:
            return self
        self.means = np.concatenate([self.means, values])
        self.weights = np.concatenate([self.weights, np.ones(values.size)])
        self._compress()
        return self

    def merge(self, other: "TDigest") -> "TDigest":
        self.means = np.concatenate([self.means, other.means])
        self.weights = np.concatenate([self.weights, other.weights])
        self._compress()
        return self

    def _compress(self) -> None:
        if self.means.size == 0:
            return
        order = np.argsort(self.means, kind="stable")
        means, weights = self.means[order], self.weights[order]
        total = weights.sum()
        out_m, out_w = [], []
        cur_m, cur_w = means[0], weights[0]
        w_so_far = 0.0
        for m, w in zip(means[1:], weights[1:]):
            q = (w_so_far + cur_w / 2.0) / total
            limit = 4.0 * total * q * (1.0 - q) / self.compression
            if cur_w + w <= max(limit, 1.0):
                cur_m = (cur_m * cur_w + m * w) / (cur_w + w)
                cur_w += w
            else:
                out_m.append(cur_m)
                out_w.append(cur_w)
                w_so_far += cur_w
                cur_m, cur_w = m, w
        out_m.append(cur_m)
        out_w.append(cur_w)
        self.means = np.asarray(out_m)
        self.weights = np.asarray(out_w)

    def quantile(self, q: float) -> float:
        if self.means.size == 0:
            return float("nan")
        if self.means.size == 1:
            return float(self.means[0])
        total = self.weights.sum()
        target = q * total
        cum = np.cumsum(self.weights) - self.weights / 2.0
        i = int(np.searchsorted(cum, target))
        if i == 0:
            return float(self.means[0])
        if i >= self.means.size:
            return float(self.means[-1])
        frac = (target - cum[i - 1]) / (cum[i] - cum[i - 1])
        return float(self.means[i - 1] + frac * (self.means[i] - self.means[i - 1]))

    def cdf(self, x: float) -> float:
        """percentile_ranks: fraction of mass <= x."""
        if self.means.size == 0:
            return float("nan")
        total = self.weights.sum()
        cum = np.cumsum(self.weights) - self.weights / 2.0
        return float(np.interp(x, self.means, cum / total, left=0.0, right=1.0))

    def to_arrays(self):
        return self.means.copy(), self.weights.copy()

    @classmethod
    def from_arrays(cls, means, weights, compression: float = 100.0) -> "TDigest":
        d = cls(compression)
        d.means = np.asarray(means, dtype=np.float64)
        d.weights = np.asarray(weights, dtype=np.float64)
        return d


def percentiles_agg(ds, col: str, qs=(0.25, 0.5, 0.75, 0.95, 0.99), compression: float = 100.0):
    """Distributed percentiles: one t-digest per block (map_batches
    partial), centroid merge on the driver (tiny), quantiles final."""
    import pyarrow as pa

    def partial(t: pa.Table) -> pa.Table:
        d = TDigest(compression)
        d.add(t[col].to_numpy(zero_copy_only=False))
        m, w = d.to_arrays()
        return pa.table(
            {
                "means": pa.array([m.tolist()], pa.list_(pa.float64())),
                "weights": pa.array([w.tolist()], pa.list_(pa.float64())),
            }
        )

    acc = TDigest(compression)
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for m, w in zip(b["means"].to_pylist(), b["weights"].to_pylist()):
            acc.merge(TDigest.from_arrays(m, w, compression))
    return pa.table(
        {
            "quantile": pa.array(list(qs), pa.float64()),
            "value": pa.array([acc.quantile(q) for q in qs], pa.float64()),
        }
    )
