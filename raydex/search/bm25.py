"""Okapi BM25 (Lucene-8 / LegacyBM25 convention) + brute-force top-k.

Formula (reference parameterization
``server/.../index/similarity/SimilarityProviders.java:234-241``,
``SimilarityService.java:43-48``; SURVEY.md §5 oracle notes):

    idf      = ln(1 + (N - df + 0.5) / (df + 0.5))          # global stats
    tf_part  = tf / (tf + k1 * (1 - b + b * dl / avgdl))
    score    = sum over matched terms of idf * tf_part * (k1 + 1)

with k1 = 1.2, b = 0.75; ``dl`` is the SmallFloat-quantized doc length
(norm byte round-trip), ``avgdl = sum_dl_raw / N`` with RAW totals —
both exactly the reference's Lucene behavior. Scores are accumulated in
float64 and emitted float32; the SAME accumulation path is used by the
brute-force scorer, the WAND scorer and the merge tie-break, so ranking
is internally consistent (and property-tested brute == WAND).

The brute-force scorer is the vectorized term-at-a-time path: decode the
full posting list per query term, numpy-accumulate into a dense score
array, argpartition top-k. It doubles as the no-pruning oracle for WAND
(SURVEY.md §5 oracle (b)).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

K1 = 1.2
B = 0.75


@dataclass(frozen=True)
class GlobalStats:
    """Exact corpus-level stats (computed from segment manifests —
    the dfs_query_then_fetch-style global df/avgdl, SURVEY.md §3.2).

    ``fdf``/``field_sum_dl`` extend the same contract to index-time
    mapped fields (multi-field mappings): ``fdf`` keys are
    ``(field, term)`` pairs, ``field_sum_dl`` maps field name to its
    global length sum. ``None`` means "not collected" — evaluators fall
    back to segment-local field stats (the query_then_fetch default)."""

    ndocs: int
    sum_dl: int
    df: dict[str, int]  # per query term, global df (primary text field)
    fdf: dict | None = None  # {(field, term): global df}
    field_sum_dl: dict | None = None  # {field: global sum_dl}

    @property
    def avgdl(self) -> float:
        return self.sum_dl / self.ndocs if self.ndocs else 1.0

    def field_avgdl(self, field: str) -> float | None:
        if self.field_sum_dl is None or field not in self.field_sum_dl:
            return None
        return self.field_sum_dl[field] / self.ndocs if self.ndocs else 1.0

    def field_df(self, field: str, term: str) -> int | None:
        if self.fdf is None:
            return None
        return self.fdf.get((field, term), 0)


def idf(ndocs: int, df: np.ndarray | int) -> np.ndarray | float:
    return np.log(1.0 + (ndocs - np.asarray(df, dtype=np.float64) + 0.5) / (np.asarray(df, dtype=np.float64) + 0.5))


def tf_norm_denom_add(dl_quant: np.ndarray, avgdl: float) -> np.ndarray:
    """k1 * (1 - b + b * dl/avgdl) for quantized doc lengths."""
    return K1 * (1.0 - B + B * dl_quant.astype(np.float64) / avgdl)


def term_score(tfs: np.ndarray, denom_add: np.ndarray, idf_t: float) -> np.ndarray:
    t = tfs.astype(np.float64)
    return idf_t * (K1 + 1.0) * t / (t + denom_add)


import os as _os

# byte-capped (NOT entry-capped): entries are df-sized float64 arrays,
# so 2048 head terms of a multi-M-doc merged segment would otherwise
# cost gigabytes per reader x replica
_CONTRIB_CACHE_MAX_BYTES = int(_os.environ.get(
    "RAYDEX_CONTRIB_CACHE_MAX_BYTES", 128 * 1024 * 1024))


def cached_term_contrib(reader, ti: int, ids: np.ndarray, tfs: np.ndarray,
                        idf_t: float, avgdl: float) -> np.ndarray:
    """Per-posting BM25 contributions of one term, cached on the reader.

    The contribution array depends only on (term postings, idf, avgdl)
    — all query-independent under the engine's dfs stats contract — so
    repeated query terms (Zipf head) skip the dl gather + float
    arithmetic entirely. Entries are the exact float64 values the
    uncached path computes (bitwise-identical scores); keyed by term
    index and validated against (idf, avgdl) so multi-index union-IDF
    contexts never reuse a stale array. LRU-capped like the
    decoded-postings cache (~cap * avg_df * 8B)."""
    from collections import OrderedDict

    cache = getattr(reader, "_contrib_cache", None)
    if cache is None:
        cache = reader._contrib_cache = OrderedDict()
        reader._contrib_cache_bytes = 0
    hit = cache.get(ti)
    if hit is not None and hit[0] == idf_t and hit[1] == avgdl \
            and hit[2].size == ids.size:
        cache.move_to_end(ti)
        return hit[2]
    contrib = term_score(tfs, tf_norm_denom_add(reader.dl_quant[ids], avgdl),
                         idf_t)
    if hit is not None:
        reader._contrib_cache_bytes -= hit[2].nbytes
        del cache[ti]
    if contrib.nbytes <= _CONTRIB_CACHE_MAX_BYTES:
        cache[ti] = (idf_t, avgdl, contrib)
        reader._contrib_cache_bytes += contrib.nbytes
        while reader._contrib_cache_bytes > _CONTRIB_CACHE_MAX_BYTES:
            _, old = cache.popitem(last=False)
            reader._contrib_cache_bytes -= old[2].nbytes
    return contrib


def top_k_select(scores: np.ndarray, k: int, mask: np.ndarray | None = None):
    """Top-k by (score desc, docid asc) over a dense score array.

    Returns (docids, scores) with scores cast to float32 for emission.
    """
    if mask is not None:
        cand = np.flatnonzero(mask)
    else:
        cand = np.flatnonzero(scores > 0)
    if cand.size == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float32)
    s = scores[cand]
    if cand.size > k:
        # narrow to candidates at or above the kth score (ties included),
        # then do the exact (score desc, docid asc) sort on that set only
        kth = -np.partition(-s, k - 1)[k - 1]
        keep = np.flatnonzero(s >= kth)
        cand, s = cand[keep], s[keep]
    order = np.lexsort((cand, -s))[:k]
    return cand[order], s[order].astype(np.float32)


def brute_force_top_k(
    reader,
    terms: list[str],
    k: int,
    stats: GlobalStats,
    operator: str = "or",
    minimum_should_match: int = 0,
    live: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Exhaustive scoring of a match query over one segment.

    ``operator='and'`` requires every term (bool.must); ``'or'`` is the
    reference match default (bool.should,
    ``server/.../index/search/MatchQueryParser.java:230-237``) with
    optional ``minimum_should_match``.
    """
    scores = np.zeros(reader.ndocs, dtype=np.float64)
    nmatch = np.zeros(reader.ndocs, dtype=np.int32)
    avgdl = stats.avgdl
    n_present = 0
    for term in terms:
        ti = reader.lookup(term)
        gdf = stats.df.get(term, 0)
        if ti < 0 or gdf == 0:
            continue
        n_present += 1
        ids, tfs = reader.postings(ti)
        scores[ids] += cached_term_contrib(
            reader, ti, ids, tfs, float(idf(stats.ndocs, gdf)), avgdl)
        nmatch[ids] += 1
    if operator == "and":
        need = len(terms)  # every query term must match (even absent ones -> empty)
        mask = nmatch >= need if need else None
        if need and n_present < need:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float32)
    elif minimum_should_match > 1:
        mask = nmatch >= minimum_should_match
    else:
        mask = nmatch > 0
    if live is not None:  # liveDocs: deleted docs never match
        mask = live if mask is None else (mask & live)
    return top_k_select(scores, k, mask)
