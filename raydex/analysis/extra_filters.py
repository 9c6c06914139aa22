"""Additional tokenizers / token filters (SURVEY.md §2.3 'analysis-common').

Re-implemented from their documented public semantics
(``modules/analysis-common/.../CommonAnalysisPlugin.java`` registers the
reference set): ngram, edge_ngram, shingle, asciifolding, char_group
tokenizer, pattern tokenizer, pattern_replace char filter, length,
truncate, reverse, unique, keyword_marker-style stop of processing is
composed by the caller. Each is a pure ``list[str] -> list[str]`` (or
tokenizer ``str -> list[str]``) usable inside an Analyzer chain via
``make_custom_analyzer``.
"""

from __future__ import annotations

import unicodedata

import regex

from raydex.analysis.tokenizer import register_analyzer


def ngram_filter(tokens, min_gram: int = 1, max_gram: int = 2):
    out = []
    for t in tokens:
        for n in range(min_gram, max_gram + 1):
            for i in range(0, len(t) - n + 1):
                out.append(t[i : i + n])
    return out


def edge_ngram_filter(tokens, min_gram: int = 1, max_gram: int = 2):
    out = []
    for t in tokens:
        for n in range(min_gram, min(max_gram, len(t)) + 1):
            out.append(t[:n])
    return out


def shingle_filter(tokens, min_size: int = 2, max_size: int = 2,
                   separator: str = " ", output_unigrams: bool = True):
    out = list(tokens) if output_unigrams else []
    for n in range(min_size, max_size + 1):
        for i in range(0, len(tokens) - n + 1):
            out.append(separator.join(tokens[i : i + n]))
    return out


def asciifolding_filter(tokens):
    return [
        unicodedata.normalize("NFKD", t).encode("ascii", "ignore").decode("ascii")
        for t in tokens
    ]


def length_filter(tokens, min_len: int = 0, max_len: int = 2**31):
    return [t for t in tokens if min_len <= len(t) <= max_len]


def truncate_filter(tokens, length: int = 10):
    return [t[:length] for t in tokens]


def reverse_filter(tokens):
    return [t[::-1] for t in tokens]


def unique_filter(tokens):
    seen, out = set(), []
    for t in tokens:
        if t not in seen:
            seen.add(t)
            out.append(t)
    return out


def char_group_tokenizer(chars: str):
    """Split on any char in ``chars`` (the `char_group` tokenizer)."""
    rx = regex.compile("[" + regex.escape(chars) + "]+")

    def tok(text: str) -> list[str]:
        return [t for t in rx.split(text) if t]

    return tok


def pattern_tokenizer(pattern: str = r"\W+"):
    rx = regex.compile(pattern)

    def tok(text: str) -> list[str]:
        return [t for t in rx.split(text) if t]

    return tok


def pattern_replace_charfilter(pattern: str, replacement: str):
    rx = regex.compile(pattern)

    def cf(text: str) -> str:
        return rx.sub(replacement, text)

    return cf


def path_hierarchy_tokenizer(delimiter: str = "/"):
    """`path_hierarchy`: /a/b/c -> /a, /a/b, /a/b/c."""

    def tok(text: str) -> list[str]:
        parts = text.split(delimiter)
        out = []
        cur = ""
        for p in parts:
            if p == "" and not out:
                cur = delimiter
                continue
            cur = cur.rstrip(delimiter) + delimiter + p if out or cur else p
            out.append(cur)
        return out

    return tok


def synonym_filter(rules: dict[str, list[str]], expand: bool = True):
    """`synonym` token filter (flat, non-graph): ``rules`` maps a token
    to its synonyms. ``expand=True`` keeps the original AND emits the
    synonyms at the same position (the reference's expand mode);
    ``expand=False`` replaces (contract mode)."""

    def f(tokens):
        out = []
        for t in tokens:
            syns = rules.get(t)
            if syns is None:
                out.append(t)
            elif expand:
                out.append(t)
                out.extend(syns)
            else:
                out.append(syns[0])
        return out

    return f


def keyword_marker_filter(protected: set):
    """Marks tokens that later stemming must not touch by wrapping the
    stem step: use with ``make_stemming_filter``."""
    return protected


def make_stemming_filter(protected: set | None = None):
    from raydex.analysis.stemmer import porter_stem

    protected = protected or set()

    def f(tokens):
        return [t if t in protected else porter_stem(t) for t in tokens]

    return f


def make_custom_analyzer(name: str, tokenizer, token_filters=(), char_filters=()):
    """CustomAnalyzer analogue: char_filters* -> tokenizer -> filters*."""

    def analyze(text: str) -> list[str]:
        for cf in char_filters:
            text = cf(text)
        toks = tokenizer(text)
        for f in token_filters:
            toks = f(toks)
        return toks

    return register_analyzer(name, analyze)
