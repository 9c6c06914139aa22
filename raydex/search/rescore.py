"""Rescore — re-rank the top ``window_size`` hits with a second query
(``server/.../search/rescore/QueryRescorer.java``): final score =
query_weight * first_score + rescore_query_weight * second_score.
"""

from __future__ import annotations


def rescore_hits(
    hits: list[dict],
    searcher,
    rescore_query: dict,
    window_size: int = 10,
    query_weight: float = 1.0,
    rescore_query_weight: float = 1.0,
) -> list[dict]:
    """``hits``: merged results (url/score/...); the window is re-scored
    with ``rescore_query`` (evaluated via the DSL path), rest untouched."""
    window = hits[:window_size]
    tail = hits[window_size:]
    second = {
        h["url"]: h["score"]
        for h in searcher.search_query(rescore_query, k=max(window_size * 4, 40))
    }
    out = []
    for h in window:
        s2 = second.get(h["url"], 0.0)
        out.append(
            {
                **h,
                "score": query_weight * h["score"] + rescore_query_weight * s2,
                "rescored": h["url"] in second,
            }
        )
    out.sort(key=lambda h: (-h["score"], h["ordinal"], h["docid"]))
    return out + tail
