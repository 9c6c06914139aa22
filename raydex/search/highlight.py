"""Plain highlighter — the fetch-phase `highlight` subphase
(``server/.../search/fetch/subphase/highlight/`` — the 'plain'
highlighter re-analyzes the stored text and marks query-term hits).

Snippets are fragments of ``fragment_size`` chars around the densest
hit cluster, with hits wrapped in pre/post tags.
"""

from __future__ import annotations

import numpy as np
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


def _sentence_bounds(text: str, max_len: int):
    """Sentence-ish passage boundaries (BreakIterator analogue): split
    after . ! ? followed by whitespace; long sentences re-split at
    max_len."""
    bounds = []
    start = 0
    for m in regex.finditer(r"[.!?]\s+", text):
        bounds.append((start, m.end()))
        start = m.end()
    if start < len(text):
        bounds.append((start, len(text)))
    out = []
    for s, e in bounds:
        while e - s > max_len:
            cut = text.rfind(" ", s, s + max_len)
            cut = cut if cut > s else s + max_len
            out.append((s, cut))
            s = cut
        out.append((s, e))
    return out


def unified_highlight(
    text: str,
    query_terms: set[str],
    phrases: list[list[str]] | None = None,
    analyzer: str = "standard_en",
    pre_tag: str = "<em>",
    post_tag: str = "</em>",
    fragment_size: int = 150,
    number_of_fragments: int = 3,
    term_weights: dict | None = None,
) -> list[str]:
    """Unified-highlighter analogue (``UnifiedHighlighter.java``):
    sentence-bounded PASSAGES scored like the reference's PassageScorer
    (sum of per-unique-term weights — idf-shaped via ``term_weights``,
    default 1.0 — with phrase hits counted as whole units), top passages
    returned with every hit tagged. Phrase members only highlight when
    the full phrase matches consecutively in token order."""
    an = get_analyzer(analyzer)
    toks = []  # (start, end, analyzed token)
    for m in _FINDTOK.finditer(text):
        out = an(m.group(0))
        toks.append((m.start(), m.end(), out[0] if out else None))
    hit_spans = []  # (char_start, char_end, term)
    for s, e, t in toks:
        if t is not None and t in query_terms:
            hit_spans.append((s, e, t))
    for ph in phrases or []:
        L = len(ph)
        for i in range(len(toks) - L + 1):
            window = toks[i : i + L]
            if [w[2] for w in window] == list(ph):
                hit_spans.append((window[0][0], window[-1][1], " ".join(ph)))
    if not hit_spans:
        return []
    hit_spans.sort()
    weights = term_weights or {}
    passages = []
    for lo, hi in _sentence_bounds(text, fragment_size):
        inside = [(a, b, t) for a, b, t in hit_spans if a >= lo and b <= hi]
        if not inside:
            continue
        score = sum(weights.get(t, 1.0) for t in {t for _, _, t in inside})
        passages.append((score, lo, hi, inside))
    passages.sort(key=lambda p: (-p[0], p[1]))
    frags = []
    for score, lo, hi, inside in passages[:number_of_fragments]:
        # merge overlapping hit spans (phrase + member) keeping the widest
        merged = []
        for a, b, _ in sorted(inside):
            if merged and a < merged[-1][1]:
                merged[-1] = (merged[-1][0], max(merged[-1][1], b))
            else:
                merged.append((a, b))
        out = []
        pos = lo
        for a, b in merged:
            out.append(text[pos:a])
            out.append(pre_tag + text[a:b] + post_tag)
            pos = b
        out.append(text[pos:hi])
        frags.append("".join(out).strip())
    return frags


def _pack_fragments(text, spans, pre_tag, post_tag, fragment_size,
                    number_of_fragments):
    """Greedy fragment packing around hit spans (shared by plain + FVH)."""
    frags = []
    used_until = -1
    for s, e in spans:
        if s < used_until:
            continue
        lo = max(0, s - fragment_size // 2)
        hi = min(len(text), lo + fragment_size)
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


def fvh_highlight(
    reader,
    docid: int,
    text: str,
    query_terms: set[str] | None = None,
    phrases: list[list[str]] | None = None,
    pre_tag: str = "<em>",
    post_tag: str = "</em>",
    fragment_size: int = 100,
    number_of_fragments: int = 3,
) -> list[str]:
    """Fast-vector-highlighter analogue
    (``search/fetch/subphase/highlight/FastVectorHighlighter.java``,
    requires ``term_vector=with_positions_offsets`` in the reference):
    match POSITIONS come from the POSITIONAL POSTINGS — the index
    structure, not a text re-scan — which is what makes FVH
    phrase-accurate: a phrase highlights ONLY where its terms are
    position-adjacent, while the plain highlighter marks every member
    term. The reference reads stored character offsets; raydex's index
    stores positions (not offsets), so the position->offset table is
    rebuilt in ONE tokenization pass over the doc being highlighted
    (documented difference — O(doc) per highlighted hit either way).

    Requires a positional index (``store_positions=True``)."""
    from raydex.analysis.tokenizer import tokenize_with_offsets

    # position -> char span table (positions are pre-stop-filter
    # ordinals, exactly the build's assignment)
    offs = tokenize_with_offsets(text)

    def doc_positions(term: str) -> np.ndarray:
        ti = reader.lookup(term)
        if ti < 0:
            return np.empty(0, dtype=np.int64)
        ids, tfs, pos, po = reader.postings_with_positions(ti)
        j = int(np.searchsorted(ids, docid))
        if j >= ids.size or ids[j] != docid:
            return np.empty(0, dtype=np.int64)
        return pos[po[j] : po[j + 1]]

    spans: list[tuple[int, int]] = []
    for t in query_terms or ():
        for p in doc_positions(t):
            if p < len(offs):
                spans.append((offs[p][0], offs[p][1]))
    for ph in phrases or ():
        if not ph:
            continue
        base = doc_positions(ph[0])
        ok = base
        for k, t in enumerate(ph[1:], start=1):
            nxt = doc_positions(t)
            ok = ok[np.isin(ok + k, nxt)]
            if not ok.size:
                break
        for p0 in ok:
            last = p0 + len(ph) - 1
            if last < len(offs):
                spans.append((offs[int(p0)][0], offs[int(last)][1]))
    if not spans:
        return []
    # merge overlaps (a term hit inside a phrase hit must not double-tag)
    spans.sort()
    merged = [spans[0]]
    for s, e in spans[1:]:
        if s <= merged[-1][1]:
            merged[-1] = (merged[-1][0], max(merged[-1][1], e))
        else:
            merged.append((s, e))
    return _pack_fragments(text, merged, pre_tag, post_tag, fragment_size,
                           number_of_fragments)
