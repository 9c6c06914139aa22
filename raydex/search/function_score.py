"""function_score + more_like_this (SURVEY.md §2.11).

``function_score`` (``FunctionScoreQueryBuilder``): rescale the base
query's BM25 scores with score functions — weight, random_score (seeded
hash), field_value_factor (a doc-column factor, here `dl`), script —
combined via score_mode (multiply/sum/max/min/avg) and boost_mode.

``more_like_this`` (``MoreLikeThisQueryBuilder``): pick the source doc's
top tf-idf terms (max_query_terms, min_term_freq, min_doc_freq filters)
and run them as a `match`-style disjunction, excluding the source doc.
"""

from __future__ import annotations

import math

import numpy as np

from raydex.partition import murmur3_hash_many
from raydex.search.bm25 import idf


def _field_value(searcher_group, url_to_hit: dict):
    return url_to_hit


def function_score_hits(
    hits: list[dict],
    functions: list[dict],
    score_mode: str = "multiply",
    boost_mode: str = "multiply",
    seed: int = 0,
    dl_lookup=None,
):
    """Apply score functions to merged hits.

    functions: [{"weight": w} | {"random_score": {}} |
                {"field_value_factor": {"field": "dl", "factor": f,
                                        "modifier": "none|log1p|sqrt"}} |
                {"script": callable(hit) -> float}]
    """
    out = []
    for h in hits:
        vals = []
        for fn in functions:
            if "weight" in fn:
                vals.append(float(fn["weight"]))
            elif "random_score" in fn:
                hsh = murmur3_hash_many([f"{seed}|{h['url']}"])[0]
                vals.append((int(hsh) & 0x7FFFFFFF) / float(1 << 31))
            elif "field_value_factor" in fn:
                spec = fn["field_value_factor"]
                v = float(dl_lookup(h) if dl_lookup else h.get(spec.get("field", "dl"), 1.0))
                v *= spec.get("factor", 1.0)
                mod = spec.get("modifier", "none")
                if mod == "log1p":
                    v = math.log1p(v)
                elif mod == "sqrt":
                    v = math.sqrt(v)
                vals.append(v)
            elif "script" in fn:
                vals.append(float(fn["script"](h)))
        if not vals:
            fscore = 1.0
        elif score_mode == "multiply":
            fscore = math.prod(vals)
        elif score_mode == "sum":
            fscore = sum(vals)
        elif score_mode == "max":
            fscore = max(vals)
        elif score_mode == "min":
            fscore = min(vals)
        else:
            fscore = sum(vals) / len(vals)
        base = h["score"]
        if boost_mode == "multiply":
            s = base * fscore
        elif boost_mode == "sum":
            s = base + fscore
        elif boost_mode == "replace":
            s = fscore
        elif boost_mode == "max":
            s = max(base, fscore)
        else:
            s = (base + fscore) / 2
        out.append({**h, "score": s})
    out.sort(key=lambda x: (-x["score"], x["ordinal"], x["docid"]))
    return out


def more_like_this(
    searcher,
    like_url: str,
    k: int = 10,
    max_query_terms: int = 25,
    min_term_freq: int = 1,
    min_doc_freq: int = 2,
):
    """Find docs similar to ``like_url``: the source doc's terms ranked
    by tf*idf, top max_query_terms as a disjunctive match; source doc
    excluded from results."""
    # locate the source doc's term vector from the index itself
    group = searcher.group if hasattr(searcher, "group") else None
    if group is None:
        raise ValueError("more_like_this needs a LocalSearcher")
    tf: dict[str, int] = {}
    found = False
    for r in group.readers:
        import pyarrow.compute as pc

        hit = pc.index(r.urls, like_url).as_py()
        if hit >= 0:
            docid = int(hit)
            # the doc's terms from the flat docid sweep (one gather),
            # then per-term tf via the postings LRU — cost is bounded
            # by the doc's distinct-term count, not the vocabulary
            docids, starts = r.all_postings_docids()
            flat_idx = np.flatnonzero(docids == docid)
            tis = np.searchsorted(starts, flat_idx, side="right") - 1
            for ti in tis:
                ids, tfs = r.postings(int(ti))
                pos = np.searchsorted(ids, docid)
                tf[str(r._terms_pa[int(ti)].as_py())] = int(tfs[pos])
            found = True
            break
    if not found:
        return []
    df = group.term_stats(sorted(tf))
    n = searcher.ndocs
    scored = [
        (float(tfv * idf(n, df.get(t, 1))), t)
        for t, tfv in tf.items()
        if tfv >= min_term_freq and df.get(t, 0) >= min_doc_freq
    ]
    scored.sort(reverse=True)
    terms = [t for _, t in scored[:max_query_terms]]
    if not terms:
        return []
    hits = searcher.search(" ".join(terms), k=k + 1, method="brute")
    return [h for h in hits if h["url"] != like_url][:k]
