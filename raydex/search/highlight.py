"""Plain highlighter — the fetch-phase `highlight` subphase
(``server/.../search/fetch/subphase/highlight/`` — the 'plain'
highlighter re-analyzes the stored text and marks query-term hits).

Snippets are fragments of ``fragment_size`` chars around the densest
hit cluster, with hits wrapped in pre/post tags.
"""

from __future__ import annotations

import regex

from raydex.analysis.tokenizer import get_analyzer

_FINDTOK = regex.compile(r"\w[\w.'’]*", regex.V1)


def highlight(
    text: str,
    query_terms: set[str],
    analyzer: str = "standard_en",
    pre_tag: str = "<em>",
    post_tag: str = "</em>",
    fragment_size: int = 100,
    number_of_fragments: int = 3,
) -> list[str]:
    """Return up to N highlighted fragments for one document."""
    an = get_analyzer(analyzer)
    spans = []
    for m in _FINDTOK.finditer(text):
        toks = an(m.group(0))
        if toks and toks[0] in query_terms:
            spans.append((m.start(), m.end()))
    if not spans:
        return []
    # greedy fragment packing around hit spans
    frags = []
    used_until = -1
    for s, e in spans:
        if s < used_until:
            continue
        lo = max(0, s - fragment_size // 2)
        hi = min(len(text), lo + fragment_size)
        # collect hits inside [lo, hi)
        inside = [(a, b) for a, b in spans if a >= lo and b <= hi]
        out = []
        pos = lo
        for a, b in inside:
            out.append(text[pos:a])
            out.append(pre_tag + text[a:b] + post_tag)
            pos = b
        out.append(text[pos:hi])
        frags.append("".join(out).strip())
        used_until = hi
        if len(frags) >= number_of_fragments:
            break
    return frags


def highlight_hits(hits, corpus_lookup, query_text: str,
                   analyzer: str = "standard_en", **kw):
    """Decorate merged search hits with highlight fragments.

    ``corpus_lookup``: url -> text (the fetch phase — callers read the
    winning urls' rows from the corpus parquet with a pushed-down
    filter; only <=k docs are ever fetched, SURVEY.md §3.2.5)."""
    terms = set(get_analyzer(analyzer)(query_text))
    out = []
    for h in hits:
        text = corpus_lookup.get(h["url"], "")
        out.append({**h, "highlight": highlight(text, terms, analyzer, **kw)})
    return out
