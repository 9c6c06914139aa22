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
import pyarrow as pa


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _scorer_concurrency(denom: float = 2.0) -> int:
    """Actor-pool size for the matmul scorers, derived from the
    cluster's CPU count (the _keyed_blocks pattern, dedup.py) — a
    hardcoded 2-4 starves a 32-cpu box and any real cluster. A couple
    of CPUs stay free for the read stage feeding the pool."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) if \
        ray.is_initialized() else 8
    return max(2, int(cpus / denom) - 1)


def _final_topk(partials: pa.Table, k: int) -> pa.Table:
    """Driver reduce of per-block partial top-k rows -> global top-k
    per query, rank by (cosine desc, doc_id asc). One lexsort over the
    (k x nq x nblocks)-bounded partial table — no per-row Python."""
    qid = partials["query_id"].to_numpy(zero_copy_only=False)
    did = partials["doc_id"].to_numpy(zero_copy_only=False)
    cos = partials["cosine"].to_numpy(zero_copy_only=False)
    # lexsort: last key is primary
    order = np.lexsort((did, -cos, qid))
    qid, did, cos = qid[order], did[order], cos[order]
    # rank within each query run; keep rank < k
    if qid.size == 0:
        return pa.table({"query_id": pa.array([], pa.int64()),
                         "rank": pa.array([], pa.int32()),
                         "doc_id": pa.array([], pa.int64()),
                         "cosine": pa.array([], pa.float64())})
    starts = np.flatnonzero(np.r_[True, qid[1:] != qid[:-1]])
    rank = np.arange(qid.size) - np.repeat(starts, np.diff(np.r_[starts, qid.size]))
    keep = rank < k
    return pa.table({
        "query_id": pa.array(qid[keep].astype(np.int64), pa.int64()),
        "rank": pa.array(rank[keep].astype(np.int32), pa.int32()),
        "doc_id": pa.array(did[keep].astype(np.int64), pa.int64()),
        "cosine": pa.array(cos[keep], pa.float64()),
    })


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
        part = np.argpartition(-sim, k - 1, axis=1)[:, :k]  # (nq, k)
        nq = sim.shape[0]
        rows_q = np.repeat(np.arange(nq, dtype=np.int64), k)
        rows_id = ids[part.ravel()]
        rows_s = np.take_along_axis(sim, part, axis=1).ravel()
        return pa.table(
            {
                "query_id": pa.array(rows_q, pa.int64()),
                "doc_id": pa.array(rows_id.astype(np.int64), pa.int64()),
                "cosine": pa.array(rows_s, pa.float64()),
            }
        )


def knn_brute_force(ds, queries: np.ndarray, vec_col: str, id_col: str, k: int = 10):
    """Exact cosine top-k for each query row. Returns (query_id, rank,
    doc_id, cosine), rank by (cosine desc, doc_id asc)."""
    import ray

    qref = ray.put(np.asarray(queries, dtype=np.float64))
    partials = _concat_batches(ds.map_batches(
        _BruteScore(qref, vec_col, id_col, k),
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=_scorer_concurrency(),
    ))
    return _final_topk(partials, k)


def _concat_batches(ds) -> pa.Table:
    batches = [b for b in ds.iter_batches(batch_format="pyarrow")]
    if not batches:
        return pa.table({"query_id": pa.array([], pa.int64()),
                         "doc_id": pa.array([], pa.int64()),
                         "cosine": pa.array([], pa.float64())})
    return pa.concat_tables(batches)


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


def build_ivf_index(
    ds,
    vec_col: str,
    id_col: str,
    out_dir: str,
    num_centroids: int = 64,
    centroids: np.ndarray | None = None,
) -> np.ndarray:
    """ONE-TIME shuffle: write the dataset as centroid-partitioned
    parquet (``out_dir/bucket=NNN/``) so probes prune I/O, not just
    compute — the real IVF contract at 100 TB: a probe reads only
    ``nprobe/num_centroids`` of the stored bytes.

    The bucket id is stored BOTH as the hive partition (file pruning)
    and as the ``cbucket`` data column (per-query filtering without
    re-assignment at probe time). Centroids are persisted next to the
    data. Same shared-filesystem path contract as ``build_index``."""
    import json
    import os

    import ray

    if centroids is None:
        centroids = train_centroids(ds, vec_col, num_centroids=num_centroids)
    cref = ray.put(centroids)

    def assign(t: pa.Table) -> pa.Table:
        c = ray.get(cref)
        v = _normalize(np.asarray(t[vec_col].to_pylist(), dtype=np.float64))
        b = np.argmax(v @ c.T, axis=1).astype(np.int32)
        t = t.append_column("cbucket", pa.array(b))
        return t.append_column("bucket", pa.array(b))

    os.makedirs(out_dir, exist_ok=True)
    ds.map_batches(assign, batch_format="pyarrow").write_parquet(
        out_dir, partition_cols=["bucket"]
    )
    np.save(os.path.join(out_dir, "centroids.npy"), centroids)
    with open(os.path.join(out_dir, "ivf_manifest.json"), "w") as f:
        json.dump(
            {"num_centroids": int(centroids.shape[0]), "dim": int(centroids.shape[1]),
             "vec_col": vec_col, "id_col": id_col},
            f,
        )
    return centroids


def knn_ivf_index(
    index_dir: str,
    queries: np.ndarray,
    vec_col: str,
    id_col: str,
    k: int = 10,
    nprobe: int = 4,
    _probe_info: dict | None = None,
):
    """Pruned-probe ANN over a ``build_ivf_index`` directory: ONLY the
    union of the queries' ``nprobe`` nearest bucket partitions is read
    (``read_parquet`` over those paths — unprobed bytes never leave
    storage). Identical results to ``knn_ivf`` with the same centroids.

    ``_probe_info``, when given, receives {'paths': [...], 'buckets':
    [...], 'num_buckets_total': N} for I/O-pruning assertions."""
    import os

    import ray.data as rd

    centroids = np.load(os.path.join(index_dir, "centroids.npy"))
    q = _normalize(np.asarray(queries, dtype=np.float64))
    probe = np.argsort(-(q @ centroids.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    probe_sets = [set(p.tolist()) for p in probe]
    needed = sorted(set().union(*probe_sets)) if probe_sets else []
    all_buckets = [
        d for d in os.listdir(index_dir) if d.startswith("bucket=")
    ]
    import glob as _glob

    paths = [
        f
        for b in needed
        for f in sorted(
            _glob.glob(os.path.join(index_dir, f"bucket={b}", "*.parquet"))
        )
    ]
    if _probe_info is not None:
        _probe_info.update(
            paths=paths, buckets=needed, num_buckets_total=len(all_buckets)
        )
    if not paths:
        return pa.table(
            {"query_id": pa.array([], pa.int64()), "rank": pa.array([], pa.int32()),
             "doc_id": pa.array([], pa.int64()), "cosine": pa.array([], pa.float64())}
        )
    ds = rd.read_parquet(paths, columns=[id_col, vec_col, "cbucket"])

    import ray

    qref = ray.put(q)
    pref = ray.put(probe_sets)

    class Scorer:
        def __init__(self):
            self.q = ray.get(qref)
            self.probe = ray.get(pref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = t[id_col].to_numpy()
            bucket = t["cbucket"].to_numpy()
            v = _normalize(np.asarray(t[vec_col].to_pylist(), dtype=np.float64))
            sim_all = self.q @ v.T
            rows_q, rows_id, rows_s = [], [], []
            for qi, pset in enumerate(self.probe):
                sel = np.flatnonzero(np.isin(bucket, list(pset)))
                if sel.size == 0:
                    continue
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

    partials = _concat_batches(ds.map_batches(
        Scorer, batch_format="pyarrow", batch_size=4096,
        concurrency=_scorer_concurrency(),
    ))
    return _final_topk(partials, k)


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
    partials = _concat_batches(ds.map_batches(
        Scorer, batch_format="pyarrow", batch_size=4096,
        concurrency=_scorer_concurrency(),
    ))
    return _final_topk(partials, k)
