"""Rank-quality metrics — the `_rank_eval` API
(``modules/rank-eval/.../rankeval/{PrecisionAtK,MeanReciprocalRank,
DiscountedCumulativeGain,ExpectedReciprocalRank,RecallAtK}.java``),
re-derived from the published IR metric definitions. The rank-identity
harness shape from SURVEY.md §5.6.
"""

from __future__ import annotations

import math


def precision_at_k(ranked_ids, relevant: set, k: int = 10) -> float:
    top = list(ranked_ids)[:k]
    if not top:
        return 0.0
    return sum(1 for d in top if d in relevant) / len(top)


def recall_at_k(ranked_ids, relevant: set, k: int = 10) -> float:
    if not relevant:
        return 0.0
    top = list(ranked_ids)[:k]
    return sum(1 for d in top if d in relevant) / len(relevant)


def reciprocal_rank(ranked_ids, relevant: set, k: int = 10) -> float:
    for i, d in enumerate(list(ranked_ids)[:k], 1):
        if d in relevant:
            return 1.0 / i
    return 0.0


def dcg_at_k(ranked_ids, gains: dict, k: int = 10) -> float:
    """gains: id -> graded relevance; DCG = sum (2^g - 1)/log2(rank+1)."""
    out = 0.0
    for i, d in enumerate(list(ranked_ids)[:k], 1):
        g = gains.get(d, 0)
        out += (2**g - 1) / math.log2(i + 1)
    return out


def ndcg_at_k(ranked_ids, gains: dict, k: int = 10) -> float:
    ideal = sorted(gains.values(), reverse=True)[:k]
    idcg = sum((2**g - 1) / math.log2(i + 1) for i, g in enumerate(ideal, 1))
    if idcg == 0:
        return 0.0
    return dcg_at_k(ranked_ids, gains, k) / idcg


def err_at_k(ranked_ids, gains: dict, k: int = 10, max_grade: int = 3) -> float:
    """Expected reciprocal rank (Chapelle et al.)."""
    p_stop_prev = 1.0
    out = 0.0
    for i, d in enumerate(list(ranked_ids)[:k], 1):
        g = gains.get(d, 0)
        r = (2**g - 1) / (2**max_grade)
        out += p_stop_prev * r / i
        p_stop_prev *= 1 - r
    return out


def rank_eval(results: dict, qrels: dict, k: int = 10) -> dict:
    """results: qid -> ranked id list; qrels: qid -> {id: grade}.

    Returns macro-averaged metrics (the `_rank_eval` response shape).
    """
    per_q = {}
    for qid, ranked in results.items():
        gains = qrels.get(qid, {})
        relevant = {d for d, g in gains.items() if g > 0}
        per_q[qid] = {
            "precision_at_k": precision_at_k(ranked, relevant, k),
            "recall_at_k": recall_at_k(ranked, relevant, k),
            "mrr": reciprocal_rank(ranked, relevant, k),
            "ndcg": ndcg_at_k(ranked, gains, k),
            "err": err_at_k(ranked, gains, k),
        }
    n = max(1, len(per_q))
    macro = {
        m: sum(v[m] for v in per_q.values()) / n
        for m in ("precision_at_k", "recall_at_k", "mrr", "ndcg", "err")
    }
    return {"metrics": macro, "details": per_q, "k": k}
