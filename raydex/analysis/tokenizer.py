"""Standard analyzer: UAX#29-style word-break -> lowercase -> stop filter.

Re-implements, from the published Unicode UAX#29 word-boundary spec, the
behavior of the reference's standard analyzer
(``server/src/main/java/org/elasticsearch/index/analysis/StandardAnalyzerProvider.java:21-29``:
StandardTokenizer -> LowerCaseFilter -> StopFilter with default stop set
EMPTY and ``max_token_length`` 255;
``StandardTokenizerFactory.java:29`` delegates the UAX#29 grammar to the
Lucene jar — re-derived here as a compiled ``regex`` pattern).

Word-break rules implemented (the subset that matters for web text):
  - runs of letters / digits / combining marks / connector punctuation
    ("foo_bar" is ONE token per ExtendNumLet);
  - MidNumLet/MidLetter (``.`` ``'`` ``’`` ``·`` ``·``
    ``״`` ``‧``) join alnum runs ("3.14", "o'neil's");
  - MidNum ``,`` joins digit runs only ("1,000"; "a,b" splits);
  - Katakana runs are one token; Han / Hiragana code points are emitted
    one per token (the reference's ``<IDEOGRAPHIC>`` behavior);
  - hyphens and other punctuation split ("wi-fi" -> wi, fi);
  - "@"/"/" split (plain UAX#29, not the URL/email variant):
    "foo@bar.com" -> foo, bar.com.
Deviations from the full spec (documented, golden-tested):
  - MidNumLet joins any alnum pair (spec restricts to letter-letter /
    num-num); regional indicators / Hebrew double-quote rules omitted.

Lowercase: Python ``str.lower()`` (Unicode full lowercase; Lucene uses
per-code-point simple lowercase — differs only for a handful of code
points like dotted capital I).

``max_token_length=255``: longer matches are split into 255-char chunks,
mirroring the reference tokenizer's overflow behavior.

Stop set ``_english_``: the exact Lucene English stop set
(``server/.../index/analysis/StopTokenFilterFactory.java:34``,
``Analysis.java:101-112``).
"""

from __future__ import annotations

from typing import Callable, Iterable

import regex

MAX_TOKEN_LENGTH = 255

ENGLISH_STOP_SET = frozenset(
    "a an and are as at be but by for if in into is it no not of on or such "
    "that the their then there these they this to was will with".split()
)

_WORDCHAR = r"[[\p{Alphabetic}\p{Mn}\p{Mc}\p{Nd}\p{Pc}]--[\p{Hiragana}\p{Katakana}\p{Han}]]"
_MIDNUMLET = r"[.'’··״‧]"
_TOKEN_RE = regex.compile(
    rf"[\p{{Katakana}}ー]+"
    rf"|[\p{{Han}}\p{{Hiragana}}]"
    rf"|{_WORDCHAR}+(?:(?:{_MIDNUMLET}|(?<=\p{{Nd}}),(?=\p{{Nd}})){_WORDCHAR}+)*",
    regex.V1,
)

# ASCII fast path: byte-identical to _TOKEN_RE on pure-ASCII input (no
# Katakana/Han/ideographic branches can fire; the Unicode word classes
# collapse to [A-Za-z0-9_]); stdlib `re` is ~4x faster than the regex
# module here, and the analyzer is the single hottest function of the
# whole build (allocation-bound workload — see BASELINE.md notes)
import re as _stdre

_TOKEN_RE_ASCII = _stdre.compile(
    r"[A-Za-z0-9_]+(?:(?:['.]|(?<=[0-9]),(?=[0-9]))[A-Za-z0-9_]+)*"
)

# "simple" analyzer: maximal letter runs, lowercased (Lucene SimpleAnalyzer)
_LETTER_RE = regex.compile(r"\p{L}+", regex.V1)


def _split_long(tok: str) -> list[str]:
    if len(tok) <= MAX_TOKEN_LENGTH:
        return [tok]
    return [tok[i : i + MAX_TOKEN_LENGTH] for i in range(0, len(tok), MAX_TOKEN_LENGTH)]


def tokenize(text: str) -> list[str]:
    """UAX#29-style tokenization only (no lowercase/stop)."""
    rx = _TOKEN_RE_ASCII if text.isascii() else _TOKEN_RE
    toks = rx.findall(text)
    for t in toks:
        if len(t) > MAX_TOKEN_LENGTH:  # rare path
            return [p for tok in toks for p in _split_long(tok)]
    return toks


def tokenize_with_offsets(text: str) -> list[tuple[int, int, str]]:
    """Like :func:`tokenize` but over the ORIGINAL text, returning
    (char_start, char_end, lowercased token) per token — the
    position -> offset table the fast-vector highlighter needs. Token
    boundaries match :func:`tokenize` of the lowered text (the word
    classes are case-insensitive); overlong tokens split in place."""
    rx = _TOKEN_RE_ASCII if text.isascii() else _TOKEN_RE
    out = []
    for m in rx.finditer(text):
        tok = m.group(0).lower()
        if len(tok) <= MAX_TOKEN_LENGTH:
            out.append((m.start(), m.end(), tok))
        else:
            for i in range(0, len(tok), MAX_TOKEN_LENGTH):
                out.append(
                    (m.start() + i, min(m.start() + i + MAX_TOKEN_LENGTH, m.end()),
                     tok[i : i + MAX_TOKEN_LENGTH])
                )
    return out


def standard_analyze_with_positions(
    text: str, stopwords: frozenset[str] | None = None
) -> tuple[list[str], list[int]]:
    """Like :func:`standard_analyze` but returns token POSITIONS in the
    pre-stop-filter stream — the reference StopFilter preserves position
    increments across removed stopwords (phrase queries see the gap)."""
    toks = tokenize(text.lower())
    if not stopwords:
        return toks, list(range(len(toks)))
    out_t, out_p = [], []
    for i, t in enumerate(toks):
        if t not in stopwords:
            out_t.append(t)
            out_p.append(i)
    return out_t, out_p


def standard_analyze(text: str, stopwords: frozenset[str] | None = None) -> list[str]:
    """StandardTokenizer -> LowerCaseFilter -> StopFilter.

    Lowercasing is applied to the whole text BEFORE tokenization (one
    big string op instead of one per token — same output for our rules;
    full-lowercase expansions like dotted-capital-I keep their marks
    inside the token). Default ``stopwords=None`` mirrors the reference
    default (EMPTY stop set for the `standard` analyzer).
    """
    toks = tokenize(text.lower())
    if stopwords:
        return [t for t in toks if t not in stopwords]
    return toks


def simple_analyze(text: str) -> list[str]:
    return [t.lower() for t in _LETTER_RE.findall(text)]


def whitespace_analyze(text: str) -> list[str]:
    return text.split()


def keyword_analyze(text: str) -> list[str]:
    return [text] if text else []


# "keywordish": lowercase + split on non-alphanumeric — the simple-analyzer
# shape used for url-ish auxiliary fields (raydex.search.fields uses the
# same function, so an index-time `url` field ranks identically to the
# query-time derived one)
_KEYWORDISH_RE = _stdre.compile(r"[^a-z0-9]+")


def keywordish_analyze(text: str) -> list[str]:
    return [t for t in _KEYWORDISH_RE.split(str(text).lower()) if t]


class Analyzer:
    """A named analyzer = tokenizer fn + optional stop set.

    The registry mirrors the reference's ``AnalysisRegistry``
    (``server/.../index/analysis/AnalysisRegistry.java:46``) as a flat
    dict — the plugin/classloader machinery collapses to registration.
    """

    def __init__(self, fn: Callable[[str], list[str]], name: str,
                 with_positions_fn=None):
        self.fn = fn
        self.name = name
        # analyzers with non-ordinal position streams (e.g. same-position
        # injection in annotated_text) supply their own (tokens,
        # positions) function
        self.with_positions_fn = with_positions_fn

    def __call__(self, text: str) -> list[str]:
        return self.fn(text)

    def analyze_many(self, texts: Iterable[str]) -> list[list[str]]:
        fn = self.fn
        return [fn(t if t is not None else "") for t in texts]

    def analyze_many_with_positions(self, texts: Iterable[str]):
        """(tokens, positions) per text; positions preserve stop gaps."""
        if self.with_positions_fn is not None:
            f = self.with_positions_fn
            return [f(t if t is not None else "") for t in texts]
        stop = (
            ENGLISH_STOP_SET if self.name == "standard_en" else None
        )
        if self.name in ("standard", "standard_en"):
            return [
                standard_analyze_with_positions(t if t is not None else "", stop)
                for t in texts
            ]
        # other analyzers: positions = ordinal stream
        out = []
        for t in texts:
            toks = self.fn(t if t is not None else "")
            out.append((toks, list(range(len(toks)))))
        return out


_REGISTRY: dict[str, Analyzer] = {}


def register_analyzer(name: str, fn: Callable[[str], list[str]],
                      with_positions_fn=None) -> Analyzer:
    a = Analyzer(fn, name, with_positions_fn=with_positions_fn)
    _REGISTRY[name] = a
    return a


_SNOWBALL_LANGS = frozenset((
    "french", "german", "spanish", "italian", "portuguese", "dutch",
    "russian", "danish", "norwegian", "swedish", "finnish", "romanian",
    "hungarian", "turkish",
    "catalan", "basque", "armenian", "irish", "lithuanian", "estonian",
))

_LIGHT_LANGS = frozenset((
    "arabic", "persian", "hindi", "bengali", "sorani",
    "greek", "bulgarian", "czech", "latvian", "galician", "brazilian",
    "indonesian", "thai", "chinese", "cjk",
))


def get_analyzer(name: str) -> Analyzer:
    if name not in _REGISTRY and name.startswith("sayt_"):
        import raydex.analysis.sayt  # noqa: F401  (registers sayt_* analyzers)
    if name == "annotated_text" and name not in _REGISTRY:
        import raydex.analysis.annotated  # noqa: F401  (registers it)
    if name in _SNOWBALL_LANGS and name not in _REGISTRY:
        import raydex.analysis.snowball  # noqa: F401  (registers them)
    if name in _LIGHT_LANGS and name not in _REGISTRY:
        import raydex.analysis.light_stemmers  # noqa: F401
        import raydex.analysis.euro_stemmers  # noqa: F401
    if name in ("kuromoji", "japanese", "nori", "korean",
                "smartcn") and name not in _REGISTRY:
        import raydex.analysis.cjk_dict  # noqa: F401  (registers them)
    if name in ("icu_analyzer", "icu_folding", "polish",
                "stempel", "ukrainian") and name not in _REGISTRY:
        import raydex.analysis.icu_stempel  # noqa: F401
    if name == "english" and name not in _REGISTRY:
        import raydex.analysis.stemmer  # noqa: F401  (registers it)
    return _REGISTRY[name]


register_analyzer("standard", standard_analyze)
register_analyzer(
    "standard_en", lambda t: standard_analyze(t, stopwords=ENGLISH_STOP_SET)
)
register_analyzer("simple", simple_analyze)
register_analyzer("whitespace", whitespace_analyze)
register_analyzer("keyword", keyword_analyze)
register_analyzer("keywordish", keywordish_analyze)


def wildcard_3gram_analyze(text: str) -> list[str]:
    """x-pack wildcard field's index analyzer
    (``WildcardFieldMapper.java:90-107,989``): lowercase, wrap with
    start/end anchors (one leading, two trailing —
    ``addLineEndChars``), emit every 3-gram. Anchored grams make
    prefix/suffix patterns accelerable too. Deviation: the anchor char
    is \\x1f (unit separator), not the reference's \\0 — the term
    dictionary's factorize pass hashes object strings as C strings,
    so embedded NULs would collapse distinct anchored grams."""
    w = "\x1f" + text.lower() + "\x1f\x1f"
    return [w[i:i + 3] for i in range(len(w) - 2)]


register_analyzer("wildcard_3gram", wildcard_3gram_analyze)


def flattened_leaves_analyze(text: str) -> list[str]:
    """x-pack ``flattened`` field's index "analyzer"
    (``x-pack/plugin/mapper-flattened/.../FlattenedFieldMapper.java``
    + its ``FlattenedFieldParser``): the value is a JSON object whose
    LEAVES index as untokenized keywords, twice each — the bare value
    (root queries match any leaf) and ``dotted.path\\x1fvalue`` (keyed
    queries address one leaf), exactly the mapper's root/keyed field
    pair (the reference separates with \\0; we use the unit separator
    for the same C-string-hash reason as the wildcard anchors). Depth limit 20 like the mapper's ``depth_limit`` default.
    Values keep keyword case semantics (no lowercasing)."""
    import json as _json

    if not text:
        return []
    try:
        obj = _json.loads(text)
    except Exception:
        # a bare scalar string value: index as root keyword only
        return [str(text)]
    out: list[str] = []

    def walk(o, path: str, depth: int) -> None:
        if depth > 20:
            raise ValueError(
                "flattened object depth exceeds depth_limit (20)")
        if isinstance(o, dict):
            for k, v in o.items():
                walk(v, f"{path}.{k}" if path else str(k), depth + 1)
        elif isinstance(o, (list, tuple)):
            for v in o:
                walk(v, path, depth)
        elif o is not None:
            s = ("true" if o is True else "false" if o is False
                 else str(o))
            out.append(s)
            if path:
                out.append(f"{path}\x1f{s}")

    walk(obj, "", 0)
    return out


register_analyzer("flattened_leaves", flattened_leaves_analyze)
