"""Similarity search over an embedding column (`list<float>`).

- ``knn_brute_force``: exact cosine top-k — broadcast the query matrix
  once (``ray.put``), numpy matmul per batch, per-block partial top-k,
  driver merge of partials (k rows per block, tiny).
- ``knn_ivf``: IVF-style scale path — k-means-lite coarse centroids
  (sampled, deterministic), per-batch assignment, probe the ``nprobe``
  nearest centroid buckets only.

Both deterministic; no wall-clock, no randomness outside fixed seeds.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


class _BruteScore:
    """Stateful batch scorer: query matrix fetched from the object store
    once per actor (broadcast), matmul per batch, local top-k."""

    def __init__(self, qref, vec_col: str, id_col: str, k: int):
        import ray

        self.q = _normalize(np.asarray(ray.get(qref), dtype=np.float64))  # (nq, d)
        self.vec_col, self.id_col, self.k = vec_col, id_col, k

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t[self.id_col].to_numpy()
        v = _normalize(np.asarray(t[self.vec_col].to_pylist(), dtype=np.float64))
        sim = self.q @ v.T  # (nq, nb)
        k = min(self.k, sim.shape[1])
        part = np.argpartition(-sim, k - 1, axis=1)[:, :k]
        rows_q, rows_id, rows_s = [], [], []
        for qi in range(sim.shape[0]):
            sel = part[qi]
            rows_q.extend([qi] * k)
            rows_id.extend(ids[sel].tolist())
            rows_s.extend(sim[qi, sel].tolist())
        return pa.table(
            {
                "query_id": pa.array(rows_q, pa.int64()),
                "doc_id": pa.array(rows_id, pa.int64()),
                "cosine": pa.array(rows_s, pa.float64()),
            }
        )


def knn_brute_force(ds, queries: np.ndarray, vec_col: str, id_col: str, k: int = 10):
    """Exact cosine top-k for each query row. Returns (query_id, rank,
    doc_id, cosine), rank by (cosine desc, doc_id asc)."""
    import ray

    qref = ray.put(np.asarray(queries, dtype=np.float64))
    partials = ds.map_batches(
        _BruteScore(qref, vec_col, id_col, k),
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=4,
    ).to_pandas()
    out = []
    for qi, g in partials.groupby("query_id"):
        g = g.sort_values(["cosine", "doc_id"], ascending=[False, True]).head(k)
        for r, (_, row) in enumerate(g.iterrows()):
            out.append((qi, r, int(row["doc_id"]), float(row["cosine"])))
    return pa.table(
        {
            "query_id": pa.array([o[0] for o in out], pa.int64()),
            "rank": pa.array([o[1] for o in out], pa.int32()),
            "doc_id": pa.array([o[2] for o in out], pa.int64()),
            "cosine": pa.array([o[3] for o in out], pa.float64()),
        }
    )


def train_centroids(ds, vec_col: str, num_centroids: int = 64, sample: int = 4096, iters: int = 5, seed: int = 3):
    """k-means-lite on a deterministic sample (driver-side; centroids are
    the broadcastable small side)."""
    samp = ds.limit(sample).to_pandas()
    v = _normalize(np.asarray(list(samp[vec_col]), dtype=np.float64))
    rng = np.random.default_rng(seed)
    c = v[rng.choice(len(v), size=min(num_centroids, len(v)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(v @ c.T, axis=1)
        for j in range(c.shape[0]):
            m = assign == j
            if m.any():
                c[j] = v[m].mean(axis=0)
        c = _normalize(c)
    return c


def knn_ivf(ds, queries: np.ndarray, vec_col: str, id_col: str, k: int = 10,
            centroids: np.ndarray | None = None, nprobe: int = 4):
    """IVF-bucketed ANN: assign each vector to its nearest centroid
    (map_batches), keep only vectors in the ``nprobe`` buckets nearest
    each query, exact top-k inside. Approximate (bucket recall)."""
    import ray

    if centroids is None:
        centroids = train_centroids(ds, vec_col)
    q = _normalize(np.asarray(queries, dtype=np.float64))
    probe = np.argsort(-(q @ centroids.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    probe_sets = [set(p.tolist()) for p in probe]
    cref = ray.put(centroids)
    qref = ray.put(q)
    pref = ray.put(probe_sets)

    class Scorer:
        def __init__(self):
            self.c = ray.get(cref)
            self.q = ray.get(qref)
            self.probe = ray.get(pref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = t[id_col].to_numpy()
            v = _normalize(np.asarray(t[vec_col].to_pylist(), dtype=np.float64))
            assign = np.argmax(v @ self.c.T, axis=1)
            rows_q, rows_id, rows_s = [], [], []
            sim_all = self.q @ v.T
            for qi, pset in enumerate(self.probe):
                mask = np.isin(assign, list(pset))
                if not mask.any():
                    continue
                sel = np.flatnonzero(mask)
                sims = sim_all[qi, sel]
                kk = min(k, sel.size)
                top = sel[np.argpartition(-sims, kk - 1)[:kk]]
                rows_q.extend([qi] * top.size)
                rows_id.extend(ids[top].tolist())
                rows_s.extend(sim_all[qi, top].tolist())
            return pa.table(
                {
                    "query_id": pa.array(rows_q, pa.int64()),
                    "doc_id": pa.array(rows_id, pa.int64()),
                    "cosine": pa.array(rows_s, pa.float64()),
                }
            )

    # NOTE: Scorer is an actor pool (stateful); leave CPUs free for the
    # read stage — an actor pool sized to every CPU starves the reads.
    partials = ds.map_batches(
        Scorer, batch_format="pyarrow", batch_size=4096, concurrency=2
    ).to_pandas()
    out = []
    for qi, g in partials.groupby("query_id"):
        g = g.sort_values(["cosine", "doc_id"], ascending=[False, True]).head(k)
        for r, (_, row) in enumerate(g.iterrows()):
            out.append((qi, r, int(row["doc_id"]), float(row["cosine"])))
    return pa.table(
        {
            "query_id": pa.array([o[0] for o in out], pa.int64()),
            "rank": pa.array([o[1] for o in out], pa.int32()),
            "doc_id": pa.array([o[2] for o in out], pa.int64()),
            "cosine": pa.array([o[3] for o in out], pa.float64()),
        }
    )
