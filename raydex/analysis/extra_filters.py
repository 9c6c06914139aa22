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


def synonym_graph_filter(rules: list[str], expand: bool = True):
    """`synonym_graph` (CommonAnalysisPlugin.java:309): Solr-format rules
    with MULTI-WORD sides — "sea biscuit, seabiscuit" (equivalence) or
    "usa => united states" (explicit mapping). The token stream is
    scanned for the LONGEST matching sequence; alternatives are emitted
    flattened in place (the bag-of-terms projection of the token graph —
    exact for match/bool scoring, approximate for phrase positions,
    which matches the reference's guidance to use it at SEARCH time)."""
    mapping: dict[tuple, list[list[str]]] = {}
    for rule in rules:
        if "=>" in rule:
            lhs, rhs = rule.split("=>", 1)
            outs = [s.split() for s in rhs.split(",") if s.strip()]
            for s in lhs.split(","):
                seq = tuple(s.split())
                if seq:
                    mapping[seq] = outs
        else:
            alts = [s.split() for s in rule.split(",") if s.strip()]
            for s in alts:
                mapping[tuple(s)] = alts if expand else [alts[0]]
    max_len = max((len(k) for k in mapping), default=1)

    def f(tokens):
        out = []
        i = 0
        n = len(tokens)
        while i < n:
            for L in range(min(max_len, n - i), 0, -1):
                seq = tuple(tokens[i : i + L])
                alts = mapping.get(seq)
                if alts is not None:
                    seen = set()
                    for alt in alts:
                        key = tuple(alt)
                        if key not in seen:
                            seen.add(key)
                            out.extend(alt)
                    i += L
                    break
            else:
                out.append(tokens[i])
                i += 1
        return out

    return f


_WDG_PART = regex.compile(
    r"[A-Z]+(?![a-z])|[A-Z][a-z]+|[a-z]+|[0-9]+"
)


def word_delimiter_graph_filter(
    generate_word_parts: bool = True,
    generate_number_parts: bool = True,
    catenate_words: bool = False,
    catenate_numbers: bool = False,
    catenate_all: bool = False,
    preserve_original: bool = False,
):
    """`word_delimiter_graph` (CommonAnalysisPlugin.java:314): split on
    intra-token delimiters, case changes and letter/number transitions
    ("PowerShot500-B" -> Power, Shot, 500, B), with the catenate options
    emitting joined variants. Flattened emission order: original?, parts
    in reading order, catenations."""

    def f(tokens):
        out = []
        for t in tokens:
            parts = _WDG_PART.findall(t)
            if len(parts) <= 1 and not preserve_original:
                out.extend(parts if parts else ([t] if t else []))
                continue
            if preserve_original:
                out.append(t)
            words = [p for p in parts if not p.isdigit()]
            nums = [p for p in parts if p.isdigit()]
            for p in parts:
                if p.isdigit():
                    if generate_number_parts:
                        out.append(p)
                elif generate_word_parts:
                    out.append(p)
            if catenate_words and len(words) > 1:
                out.append("".join(words))
            if catenate_numbers and len(nums) > 1:
                out.append("".join(nums))
            if catenate_all and len(parts) > 1:
                out.append("".join(parts))
        return out

    return f


def multiplexer_filter(filters: list):
    """`multiplexer` (CommonAnalysisPlugin.java): run each token through
    every sub-filter path, emitting all distinct variants at the token's
    position. Pass an identity (lambda ts: ts) path to keep originals."""

    def f(tokens):
        out = []
        for t in tokens:
            seen = set()
            for flt in filters:
                for v in flt([t]):
                    if v and v not in seen:
                        seen.add(v)
                        out.append(v)
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


# ---------------------------------------------------------- CJK (plugin tier)

_CJK_RANGES = (
    (0x4E00, 0x9FFF),   # CJK Unified Ideographs
    (0x3400, 0x4DBF),   # Extension A
    (0xF900, 0xFAFF),   # Compatibility Ideographs
    (0x3040, 0x309F),   # Hiragana
    (0x30A0, 0x30FF),   # Katakana
    (0xAC00, 0xD7AF),   # Hangul syllables
)


def _is_cjk_char(ch: str) -> bool:
    cp = ord(ch)
    return any(lo <= cp <= hi for lo, hi in _CJK_RANGES)


def cjk_bigram_filter(tokens, output_unigrams: bool = False):
    """`cjk_bigram` (analysis-common CJKBigramFilterFactory; Lucene
    CJKBigramFilter semantics): the standard tokenizer emits CJK text as
    single-char tokens; runs of adjacent single-CJK-char tokens are
    re-emitted as overlapping bigrams (日,本,語 -> 日本, 本語), optionally
    keeping the unigrams too. Non-CJK tokens pass through unchanged."""
    out: list[str] = []
    run: list[str] = []

    def flush():
        if not run:
            return
        if len(run) == 1:
            out.append(run[0])
        else:
            if output_unigrams:
                out.extend(run)
            out.extend(run[i] + run[i + 1] for i in range(len(run) - 1))
        run.clear()

    for t in tokens:
        if len(t) == 1 and _is_cjk_char(t):
            run.append(t)
        else:
            flush()
            out.append(t)
    flush()
    return out


def cjk_width_filter(tokens):
    """`cjk_width` (Lucene CJKWidthFilter semantics): fold fullwidth
    ASCII variants to basic latin and halfwidth katakana to fullwidth —
    the two NFKC foldings for the FF00-FFEF block."""
    import unicodedata as _ud

    return [
        "".join(
            _ud.normalize("NFKC", ch) if 0xFF01 <= ord(ch) <= 0xFFEF else ch
            for ch in t
        )
        for t in tokens
    ]


# ------------------------------------------------------ phonetic (plugin tier)

_SOUNDEX_CODE = {}
for _letters, _digit in (
    ("bfpv", "1"), ("cgjkqsxz", "2"), ("dt", "3"),
    ("l", "4"), ("mn", "5"), ("r", "6"),
):
    for _c in _letters:
        _SOUNDEX_CODE[_c] = _digit


def soundex(word: str) -> str:
    """American Soundex (the published algorithm the phonetic plugin's
    `soundex` encoder implements): first letter + 3 digits; same-coded
    letters separated by h/w merge, separated by vowels do not.
    Goldens: Robert/Rupert->R163, Ashcraft->A261, Tymczak->T522,
    Honeyman->H555, Pfister->P236."""
    w = [c for c in word.lower() if c.isalpha()]
    if not w:
        return ""
    first = w[0]
    digits = [_SOUNDEX_CODE.get(first, "")]
    for c in w[1:]:
        d = _SOUNDEX_CODE.get(c)
        if c in "hw":
            continue  # transparent: previous code stays "last seen"
        if d is None:  # vowel: breaks the run
            digits.append("")
            continue
        if digits[-1] != d:
            digits.append(d)
    code = "".join(d for d in digits[1:] if d)
    return (first.upper() + code + "000")[:4]


_VOWELS = "aeiou"


def metaphone(word: str) -> str:
    """Classic Metaphone (Lawrence Philips, 1990 — the phonetic
    plugin's DEFAULT encoder). Re-implemented from the published rule
    table (goldens trace the rules, not any one library's quirks):
    metaphone->MTFN, Knight->NT, Philip->FLP, Smith/Smyth->SM0,
    white->WT, Xavier->SFR, school->SKL, thought->0T."""
    w = "".join(c for c in word.lower() if c.isalpha())
    if not w:
        return ""
    # initial-pair exceptions
    if w[:2] in ("ae", "gn", "kn", "pn", "wr"):
        w = w[1:]
    elif w[0] == "x":
        w = "s" + w[1:]
    elif w[:2] == "wh":
        w = "w" + w[2:]
    out = []
    n = len(w)
    i = 0
    while i < n:
        c = w[i]
        nxt = w[i + 1] if i + 1 < n else ""
        nxt2 = w[i + 2] if i + 2 < n else ""
        prev = w[i - 1] if i > 0 else ""
        # collapse doubled letters (except c)
        if c == prev and c != "c":
            i += 1
            continue
        if c in _VOWELS:
            if i == 0:
                out.append(c.upper())
        elif c == "b":
            if not (i == n - 1 and prev == "m"):  # silent -mb
                out.append("B")
        elif c == "c":
            if nxt == "i" and nxt2 == "a":            # -cia-
                out.append("X")
            elif nxt == "h":
                if prev == "s":                        # sch -> k
                    out.append("K")
                else:
                    out.append("X")
                i += 1
            elif nxt in "iey":
                if prev != "s":                        # sci/sce silent c
                    out.append("S")
            else:
                out.append("K")
        elif c == "d":
            if nxt == "g" and nxt2 in "iey":           # -dge -> j
                out.append("J")
                i += 1
            else:
                out.append("T")
        elif c == "g":
            if nxt == "h":
                if i + 2 >= n or w[i + 2] in _VOWELS:  # ghI -> k
                    out.append("K")
                i += 1                                 # else silent gh
            elif nxt == "n":
                pass                                   # silent gn
            elif nxt in "iey":
                out.append("J")
            else:
                out.append("K")
        elif c == "h":
            if prev in _VOWELS and nxt not in _VOWELS:
                pass                                   # silent
            elif prev in "csptg":
                pass                                   # digraph handled
            else:
                out.append("H")
        elif c == "k":
            if prev != "c":
                out.append("K")
        elif c == "p":
            if nxt == "h":
                out.append("F")
                i += 1
            else:
                out.append("P")
        elif c == "q":
            out.append("K")
        elif c == "s":
            if nxt == "h":
                out.append("X")
                i += 1
            elif nxt == "i" and nxt2 in "ao":          # -sio-/-sia-
                out.append("X")
            else:
                out.append("S")
        elif c == "t":
            if nxt == "h":
                out.append("0")                        # theta
                i += 1
            elif nxt == "i" and nxt2 in "ao":          # -tio-/-tia-
                out.append("X")
            else:
                out.append("T")
        elif c == "v":
            out.append("F")
        elif c == "w":
            if nxt in _VOWELS:
                out.append("W")
        elif c == "x":
            out.append("KS")
        elif c == "y":
            if nxt in _VOWELS:
                out.append("Y")
        elif c == "z":
            out.append("S")
        elif c in "fjlmnr":
            out.append(c.upper())
        i += 1
    return "".join(out)


_PHONETIC_ENCODERS = {"soundex": soundex, "metaphone": metaphone}


def phonetic_filter(tokens, encoder: str = "metaphone",
                    replace: bool = True):
    """`phonetic` token filter (plugins/analysis-phonetic
    PhoneticTokenFilterFactory shape; default encoder metaphone like
    the plugin): encode each token; ``replace`` False emits the
    original token followed by its encoding, mirroring the plugin's
    inject-vs-replace switch."""
    enc_fn = _PHONETIC_ENCODERS.get(encoder)
    if enc_fn is None:
        raise ValueError(f"unsupported phonetic encoder: {encoder}")
    out = []
    for t in tokens:
        enc = enc_fn(t)
        if replace:
            out.append(enc)
        else:
            out.extend((t, enc))
    return out


# ------------------------------------------------- elision / apostrophe

# Lucene FrenchAnalyzer's DEFAULT_ARTICLES (ElisionFilter); Italian's
# set is longer (ItalianAnalyzer.ITALIAN_ARTICLES)
FRENCH_ELISION_ARTICLES = frozenset(
    "l m t qu n s j d c jusqu quoiqu lorsqu puisqu".split())
ITALIAN_ELISION_ARTICLES = frozenset(
    "c l all dall dell nell sull coll pell gl agl dagl degl negl sugl "
    "un m t s v d".split())

_APOSTROPHES = ("'", "’")


def elision_filter(tokens, articles=FRENCH_ELISION_ARTICLES):
    """`elision` token filter (ElisionFilter): when the text before the
    FIRST apostrophe is a listed article, drop it and the apostrophe
    (l'avion -> avion)."""
    out = []
    for t in tokens:
        for ap in _APOSTROPHES:
            i = t.find(ap)
            if i != -1 and t[:i].lower() in articles:
                t = t[i + 1:]
                break
        if t:
            out.append(t)
    return out


def apostrophe_filter(tokens):
    """`apostrophe` token filter (the Turkish-analyzer step,
    ApostropheFilter): strip the first apostrophe and EVERYTHING after
    it (Türkiye'den -> Türkiye)."""
    out = []
    for t in tokens:
        for ap in _APOSTROPHES:
            i = t.find(ap)
            if i != -1:
                t = t[:i]
                break
        if t:
            out.append(t)
    return out


def decimal_digit_filter(tokens):
    """`decimal_digit` token filter (DecimalDigitFilter): fold every
    Unicode decimal digit to its 0-9 form (٤٥٦ -> 456)."""
    import unicodedata

    out = []
    for t in tokens:
        out.append("".join(
            str(unicodedata.decimal(ch)) if unicodedata.decimal(ch, None)
            is not None else ch for ch in t))
    return out


def limit_filter(tokens, max_token_count: int = 1):
    """`limit` token filter (LimitTokenCountFilter): keep only the
    first ``max_token_count`` tokens."""
    return list(tokens)[:max_token_count]


def keep_filter(tokens, keep_words, case_sensitive: bool = False):
    """`keep` token filter (KeepWordFilter): the inverse of stop —
    only listed words survive."""
    if case_sensitive:
        kw = set(keep_words)
        return [t for t in tokens if t in kw]
    kw = {w.lower() for w in keep_words}
    return [t for t in tokens if t.lower() in kw]


def stemmer_override_filter(overrides: dict):
    """`stemmer_override` (StemmerOverrideFilter): a token with a
    mapping is replaced by it AND protected from the downstream
    stemmer (returned pre-stemmed; compose BEFORE make_stemming_filter
    with the override targets in its protected set)."""
    def fn(tokens):
        return [overrides.get(t, t) for t in tokens]

    return fn


def fingerprint_analyze(text: str, max_output_size: int = 255,
                        separator: str = " ") -> list[str]:
    """The `fingerprint` ANALYZER (FingerprintAnalyzer): standard
    tokenize -> lowercase -> asciifold -> sort -> dedup -> ONE joined
    token, emitted only if it fits max_output_size — the OpenRefine
    clustering fingerprint."""
    from raydex.analysis.tokenizer import standard_analyze

    toks = sorted(set(asciifolding_filter(standard_analyze(text))))
    joined = separator.join(toks)
    if not joined or len(joined) > max_output_size:
        return []
    return [joined]


register_analyzer("fingerprint", fingerprint_analyze)
