"""Suggesters — `term` suggester (edit-distance candidates from the term
dictionary, ``server/.../search/suggest/term/``) and a `phrase`-style
corrector that rescores whole inputs (``PhraseSuggester.java`` shape:
candidate generation + frequency ranking).
"""

from __future__ import annotations

from raydex.search.query import _edit_distance_le


def term_suggest(reader, text: str, max_edits: int = 2, size: int = 5,
                 analyzer=None) -> dict:
    """Per input token: up to ``size`` dictionary terms within
    ``max_edits``, ranked by (edit distance asc, df desc, term asc)."""
    toks = analyzer(text) if analyzer else text.lower().split()
    out: dict[str, list] = {}
    terms = reader.terms
    df = reader.df
    for tok in toks:
        cands = []
        for i in range(terms.size):
            t = terms[i]
            if t == tok:
                cands = []  # exact hit: no suggestion needed
                break
            for d in range(1, max_edits + 1):
                if _edit_distance_le(tok, t, d):
                    cands.append((d, -int(df[i]), t))
                    break
        cands.sort()
        out[tok] = [
            {"text": t, "distance": d, "freq": -negdf}
            for d, negdf, t in cands[:size]
        ]
    return out


def phrase_suggest(reader, text: str, max_edits: int = 1, size: int = 3,
                   analyzer=None) -> list[dict]:
    """Whole-input correction: per-token best replacements, combined and
    ranked by sum of corrected-term frequencies (freq-weighted candidate
    ranking, the PhraseSuggester shape without the language model)."""
    toks = analyzer(text) if analyzer else text.lower().split()
    per_tok = []
    for tok in toks:
        if reader.lookup(tok) >= 0:
            per_tok.append([(tok, 0, int(reader.df[reader.lookup(tok)]))])
            continue
        sugg = term_suggest(reader, tok, max_edits=max_edits, size=size)
        cands = [(s["text"], s["distance"], s["freq"]) for s in sugg.get(tok, [])]
        per_tok.append(cands or [(tok, 0, 0)])
    # greedy best per slot (full cartesian explodes; reference also prunes)
    options = []
    for choice_idx in range(size):
        parts, score = [], 0
        for cands in per_tok:
            t, d, f = cands[min(choice_idx, len(cands) - 1)]
            parts.append(t)
            score += f
        options.append({"text": " ".join(parts), "score": score})
    seen, out = set(), []
    for o in sorted(options, key=lambda x: -x["score"]):
        if o["text"] not in seen:
            seen.add(o["text"])
            out.append(o)
    return out[:size]
