"""Exact phrase query (`match_phrase`, slop=0) over positional postings.

Reference semantics (``MatchQueryParser.java`` phrase path → Lucene
PhraseQuery): analyze the phrase with the field's analyzer keeping
POSITION GAPS (a removed stopword leaves a hole the matching document
must span), intersect the terms' postings, then verify positions:
doc matches with phrase frequency pf = |{p : every term i occurs at
p + pos_i}|. Scored as BM25 with tf := pf and idf := sum of the terms'
idfs (the Lucene phrase-weight convention).
"""

from __future__ import annotations

import numpy as np

from raydex.search.bm25 import GlobalStats, idf, term_score, tf_norm_denom_add, top_k_select


def phrase_frequencies(reader, terms: list[str], query_positions: list[int]):
    """-> (docids, phrase_freq) over one segment; empty when any term is
    absent."""
    empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
    if not terms:
        return empty
    posting = []
    for t in terms:
        ti = reader.lookup(t)
        if ti < 0:
            return empty
        posting.append(reader.postings_with_positions(ti))

    # conjunction of docids
    common = posting[0][0]
    for ids, *_ in posting[1:]:
        common = np.intersect1d(common, ids, assume_unique=True)
    if common.size == 0:
        return empty

    # index of each common doc in every term's posting list
    doc_idx = [
        np.searchsorted(ids, common) for ids, *_ in posting
    ]
    pf = np.zeros(common.size, dtype=np.int64)
    base = query_positions[0]
    for ci in range(common.size):
        ids0, tfs0, pos0, off0 = posting[0]
        i0 = doc_idx[0][ci]
        cand = pos0[off0[i0] : off0[i0 + 1]]  # positions of first term
        cand = cand - base
        for t_i in range(1, len(posting)):
            ids_t, tfs_t, pos_t, off_t = posting[t_i]
            it = doc_idx[t_i][ci]
            ppos = pos_t[off_t[it] : off_t[it + 1]] - query_positions[t_i]
            cand = np.intersect1d(cand, ppos, assume_unique=True)
            if cand.size == 0:
                break
        pf[ci] = cand.size

    hit = pf > 0
    return common[hit], pf[hit]


def phrase_top_k(reader, terms: list[str], query_positions: list[int],
                 k: int, stats: GlobalStats):
    """BM25-scored exact-phrase top-k for one segment."""
    docs, pf = phrase_frequencies(reader, terms, query_positions)
    if docs.size == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float32)
    sum_idf = float(
        sum(idf(stats.ndocs, stats.df.get(t, 1)) for t in terms)
    )
    denom = tf_norm_denom_add(reader.dl_quant[docs], stats.avgdl)
    scores_dense = np.zeros(reader.ndocs)
    scores_dense[docs] = term_score(pf, denom, sum_idf)
    mask = np.zeros(reader.ndocs, dtype=bool)
    mask[docs] = True
    return top_k_select(scores_dense, k, mask)


def phrase_count(reader, terms, query_positions, stats=None) -> int:
    docs, _ = phrase_frequencies(reader, terms, query_positions)
    return int(docs.size)
