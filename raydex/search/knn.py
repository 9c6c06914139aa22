"""kNN vector search over index-time ``dense_vector`` fields.

The reference's ``knn`` search section (``_search`` top-level ``knn``,
``server/.../action/search/SearchRequest.java`` +
``DenseVectorFieldMapper.java`` similarities): each shard returns its
top ``num_candidates`` by vector similarity, the coordinator merges to
the global ``k``. This engine's "shard" is a segment; scoring is a
vectorized NumPy matmul over the segment's pinned doc-values matrix —
exact brute-force per segment (the reference's HNSW graph is an
approximation layer over the same score contract; exactness here is a
superset of its recall guarantee, at higher per-segment cost; the
IVF-bucketed path in raydex.ops.similarity is the scale analogue).

Score transforms match the reference's published formulas
(dense-vector similarity docs / ``VectorSimilarityFunction``):

    cosine            (1 + cos(q, d)) / 2
    dot_product       (1 + dot(q, d)) / 2
    l2_norm           1 / (1 + ||q - d||^2)
    max_inner_product dot < 0 ? 1 / (1 - dot) : dot + 1

An optional ``filter`` (any query-DSL dict) restricts candidates BEFORE
the top-k selection — the reference's filtered-knn semantics (filter is
applied during graph search, not post-filtering, so k survivors are
guaranteed when the filter matches >= k docs).
"""

from __future__ import annotations

import numpy as np


def vector_scores(mat: np.ndarray, qvec: np.ndarray, similarity: str) -> np.ndarray:
    """Similarity scores of every row of ``mat`` (float32, may hold NaN
    rows for docs without vectors) against ``qvec``; float64 out."""
    q = np.asarray(qvec, dtype=np.float64)
    if similarity == "cosine":
        dots = mat @ q
        norms = np.linalg.norm(mat.astype(np.float64), axis=1) * np.linalg.norm(q)
        with np.errstate(invalid="ignore", divide="ignore"):
            cos = dots / norms
        return (1.0 + cos) / 2.0
    if similarity == "dot_product":
        return (1.0 + (mat @ q)) / 2.0
    if similarity == "l2_norm":
        d2 = ((mat.astype(np.float64) - q) ** 2).sum(axis=1)
        return 1.0 / (1.0 + d2)
    if similarity == "max_inner_product":
        dots = mat @ q
        return np.where(dots < 0, 1.0 / (1.0 - dots), dots + 1.0)
    raise ValueError(f"unknown similarity {similarity!r}")


def segment_knn(
    reader,
    field: str,
    qvec,
    num_candidates: int,
    filter_mask: np.ndarray | None = None,
    nprobe: int | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Top ``num_candidates`` (docids, scores) of one segment, sorted by
    (score desc, docid asc) — the per-shard phase. ``filter_mask``:
    optional bool array over segment docids (pre-filter, reference
    filtered-knn contract). ``nprobe``: with an IVF-built field, score
    only the rows of the ``nprobe`` closest clusters (the approximate
    path — the reference's per-segment graph search analogue);
    ``nprobe >= nlist`` or None = exact."""
    mat, valid, similarity = reader.dense_vectors(field)
    q64 = np.asarray(qvec, dtype=np.float64)
    if nprobe is not None:
        ivf = reader.dense_vector_ivf(field)
        if ivf is not None:
            cents, clusters = ivf
            if nprobe < cents.shape[0]:
                qn = q64 / (np.linalg.norm(q64) or 1.0)
                top = np.argpartition(-(cents @ qn), nprobe - 1)[:nprobe]
                keep = np.isin(clusters, top)
                valid = valid[keep]
    if reader.live is not None:  # liveDocs: deleted docs never match
        valid = valid[reader.live[valid]]
    if filter_mask is not None:
        valid = valid[filter_mask[valid]]
    if not valid.size:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    scores = vector_scores(mat[valid], q64, similarity)
    n = min(int(num_candidates), valid.size)
    if valid.size > n:
        part = np.argpartition(-scores, n - 1)[:n]
    else:
        part = np.arange(valid.size)
    ids, sc = valid[part], scores[part]
    order = np.lexsort((ids, -sc))  # score desc, docid asc
    return ids[order].astype(np.int64), sc[order]
