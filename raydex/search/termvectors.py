"""`_termvectors` / `_mtermvectors` — per-doc term statistics
(``server/.../action/termvectors/``): re-analyze one document and report
term -> (term_freq, positions), optionally decorated with index-level
stats (df, cf) from a SegmentReader / searcher.
"""

from __future__ import annotations

from collections import Counter

from raydex.analysis.tokenizer import ENGLISH_STOP_SET, get_analyzer, standard_analyze_with_positions


def term_vector(text: str, analyzer: str = "standard_en", with_positions: bool = True) -> dict:
    an = get_analyzer(analyzer)
    if with_positions and analyzer in ("standard", "standard_en"):
        stop = ENGLISH_STOP_SET if analyzer == "standard_en" else None
        toks, pos = standard_analyze_with_positions(text, stop)
        out: dict[str, dict] = {}
        for t, p in zip(toks, pos):
            d = out.setdefault(t, {"term_freq": 0, "positions": []})
            d["term_freq"] += 1
            d["positions"].append(p)
        return out
    toks = an(text)
    return {t: {"term_freq": c} for t, c in Counter(toks).items()}


def term_vectors_with_stats(text: str, searcher, analyzer: str = "standard_en") -> dict:
    """Decorate with global df (the term_statistics=true flag)."""
    tv = term_vector(text, analyzer)
    df = searcher.group.term_stats(sorted(tv)) if hasattr(searcher, "group") else {}
    for t, d in tv.items():
        d["doc_freq"] = df.get(t, 0)
    return tv


def mtermvectors(texts: list[str], analyzer: str = "standard_en") -> list[dict]:
    return [term_vector(t, analyzer) for t in texts]
