"""Snowball stemmers for the major non-English languages.

Re-implemented from the PUBLISHED Snowball algorithm descriptions
(M.F. Porter's snowball language pages; the same algorithms behind the
reference's per-language stemmers in ``modules/analysis-common``
``StemmerTokenFilterFactory.java`` and the bundled language analyzers,
``server/.../index/analysis/Analysis.java:101-112`` names the stopword
sets). The reference ships Lucene's generated Snowball code; this
module re-derives each algorithm from its public specification —
structure (R1/R2/RV regions, ordered longest-match suffix tables,
per-step conditions) follows the spec, so regular inflection families
collapse to a single stem; generated-code byte parity on exotic edge
cases is not claimed.

Registered analyzers (``<lang>`` = standard tokenizer → lowercase →
``_<lang>_`` stop set → snowball stem), mirroring the reference's
language-analyzer shape: french german spanish italian portuguese
dutch russian danish norwegian swedish finnish romanian hungarian
turkish (turkish swaps in its own casing rule İ→i / I→ı and the
apostrophe filter, per TurkishAnalyzer).
"""

from __future__ import annotations

# ------------------------------------------------------------ regions


def _r_after_first_nonvowel_after_vowel(word: str, vowels: str,
                                        start: int = 0) -> int:
    """Position after the first non-vowel following a vowel (the
    standard R1/R2 definition)."""
    n = len(word)
    i = start
    while i < n and word[i] not in vowels:
        i += 1
    while i < n and word[i] in vowels:
        i += 1
    return min(i + 1, n) if i < n else n


def _std_regions(word: str, vowels: str) -> tuple[int, int]:
    r1 = _r_after_first_nonvowel_after_vowel(word, vowels)
    r2 = _r_after_first_nonvowel_after_vowel(word, vowels, r1)
    return r1, r2


def _rv_romance(word: str, vowels: str) -> int:
    """RV for Spanish/Italian/Portuguese/French (snowball definition):
    if the second letter is a consonant, RV is after the next vowel;
    if the first two letters are vowels, RV is after the next
    consonant; otherwise (consonant-vowel) RV starts after the third
    letter. RV is end-of-word if those positions cannot be found."""
    n = len(word)
    if n < 3:
        return n
    if word[1] not in vowels:
        i = 2
        while i < n and word[i] not in vowels:
            i += 1
        return min(i + 1, n)
    if word[0] in vowels and word[1] in vowels:
        i = 2
        while i < n and word[i] in vowels:
            i += 1
        return min(i + 1, n)
    return 3


def _longest_suffix(word: str, sufs, region_start: int) -> str | None:
    """Longest suffix from ``sufs`` present in the word whose START is
    inside the region; None otherwise. ``sufs`` is iterated longest
    first by sorting."""
    for s in sorted(sufs, key=len, reverse=True):
        if word.endswith(s) and len(word) - len(s) >= region_start:
            return s
    return None


def _ends_any(word: str, sufs) -> str | None:
    for s in sorted(sufs, key=len, reverse=True):
        if word.endswith(s):
            return s
    return None


# ------------------------------------------------------------- german

_DE_VOWELS = "aeiouyäöü"
_DE_S_END = "bdfghklmnrt"
_DE_ST_END = "bdfghklmnt"


def stem_german(word: str) -> str:
    """Snowball German2 (snowballstem.org/algorithms/german/stemmer):
    ß→ss, protected U/Y, R1 (min 3 after word start), three suffix
    steps, then umlaut folding."""
    w = word.lower().replace("ß", "ss")
    # protect u/y between vowels
    chars = list(w)
    for i in range(1, len(chars) - 1):
        if chars[i] == "u" and chars[i - 1] in _DE_VOWELS \
                and chars[i + 1] in _DE_VOWELS:
            chars[i] = "U"
        if chars[i] == "y" and chars[i - 1] in _DE_VOWELS \
                and chars[i + 1] in _DE_VOWELS:
            chars[i] = "Y"
    w = "".join(chars)
    vowels = _DE_VOWELS
    r1, r2 = _std_regions(w, vowels)
    r1 = max(r1, 3)  # R1 is adjusted so that region before it has >= 3

    # step 1
    s = _longest_suffix(w, ("em", "ern", "er"), r1)
    if s:
        w = w[: -len(s)]
    else:
        s = _longest_suffix(w, ("e", "en", "es"), r1)
        if s:
            w = w[: -len(s)]
            # undouble niss
            if w.endswith("niss"):
                w = w[:-1]
        elif w.endswith("s") and len(w) - 1 >= r1 \
                and len(w) >= 2 and w[-2] in _DE_S_END:
            w = w[:-1]

    # step 2
    s = _longest_suffix(w, ("en", "er", "est"), r1)
    if s:
        w = w[: -len(s)]
    elif w.endswith("st") and len(w) - 2 >= r1 \
            and len(w) >= 6 and w[-3] in _DE_ST_END:
        w = w[:-2]

    # step 3 (d-suffixes, in R2)
    r2 = _std_regions(w, vowels)[1]
    s = _longest_suffix(w, ("end", "ung"), r2)
    if s:
        w = w[: -len(s)]
        # 'ig' in (recomputed) R2, not preceded by 'e'
        if w.endswith("ig") and not w[:-2].endswith("e") \
                and len(w) - 2 >= _std_regions(w, vowels)[1]:
            w = w[:-2]
    else:
        s = _longest_suffix(w, ("ig", "ik", "isch"), r2)
        if s and not w[: -len(s)].endswith("e"):
            w = w[: -len(s)]
        else:
            s = _longest_suffix(w, ("lich", "heit"), r2)
            if s:
                w = w[: -len(s)]
                t = _longest_suffix(w, ("er", "en"), max(
                    _std_regions(w, vowels)[0], 3))
                if t:
                    w = w[: -len(t)]
            else:
                s = _longest_suffix(w, ("keit",), r2)
                if s:
                    w = w[: -len(s)]
                    t = _longest_suffix(
                        w, ("lich", "ig"), _std_regions(w, vowels)[1])
                    if t:
                        w = w[: -len(t)]

    return (w.replace("U", "u").replace("Y", "y")
            .replace("ä", "a").replace("ö", "o").replace("ü", "u"))


# -------------------------------------------------------------- dutch

_NL_VOWELS = "aeiouyè"


def _nl_undouble(w: str) -> str:
    if w.endswith(("kk", "dd", "tt")):
        return w[:-1]
    return w


def stem_dutch(word: str) -> str:
    """Snowball Dutch (snowballstem.org/algorithms/dutch/stemmer):
    accent folding, protected I/Y, R1 (min 3), en/s/e removal with
    undoubling, d-suffixes, vowel undoubling."""
    w = word.lower()
    fold = str.maketrans("áéíóúàèìòù", "aeiouaeiou")
    w = w.translate(fold)
    chars = list(w)
    if chars and chars[0] == "y":
        chars[0] = "Y"
    for i in range(1, len(chars)):
        if chars[i] == "y" and chars[i - 1] in _NL_VOWELS:
            chars[i] = "Y"
        if 0 < i < len(chars) - 1 and chars[i] == "i" \
                and chars[i - 1] in _NL_VOWELS and chars[i + 1] in _NL_VOWELS:
            chars[i] = "I"
    w = "".join(chars)
    r1, r2 = _std_regions(w, _NL_VOWELS)
    r1 = max(r1, 3)
    e_removed = False

    # step 1
    if w.endswith("heden") and len(w) - 5 >= r1:
        w = w[:-5] + "heid"
    else:
        s = _longest_suffix(w, ("en", "ene"), r1)
        if s:
            stem = w[: -len(s)]
            if stem and stem[-1] not in _NL_VOWELS and not stem.endswith("gem"):
                w = _nl_undouble(stem)
        else:
            s = _longest_suffix(w, ("s", "se"), r1)
            if s:
                stem = w[: -len(s)]
                if stem and stem[-1] not in _NL_VOWELS and stem[-1] != "j":
                    w = stem

    # step 2: final e
    if w.endswith("e") and len(w) - 1 >= r1 and len(w) >= 2 \
            and w[-2] not in _NL_VOWELS:
        w = _nl_undouble(w[:-1])
        e_removed = True

    # step 3a: heid
    if w.endswith("heid") and len(w) - 4 >= r2 and not w[:-4].endswith("c"):
        w = w[:-4]
        if w.endswith("en") and len(w) - 2 >= r1:
            stem = w[:-2]
            if stem and stem[-1] not in _NL_VOWELS and not stem.endswith("gem"):
                w = _nl_undouble(stem)

    # step 3b: d-suffixes
    s = _longest_suffix(w, ("end", "ing"), r2)
    if s:
        w = w[: -len(s)]
        if w.endswith("ig") and len(w) - 2 >= r2 and not w[:-2].endswith("e"):
            w = w[:-2]
        else:
            w = _nl_undouble(w)
    elif w.endswith("ig") and len(w) - 2 >= r2 and not w[:-2].endswith("e"):
        w = w[:-2]
    elif w.endswith("lijk") and len(w) - 4 >= r2:
        w = w[:-4]
        if w.endswith("e") and len(w) - 1 >= r1 and len(w) >= 2 \
                and w[-2] not in _NL_VOWELS:
            w = _nl_undouble(w[:-1])
    elif w.endswith("baar") and len(w) - 4 >= r2:
        w = w[:-4]
    elif w.endswith("bar") and len(w) - 3 >= r2 and e_removed:
        w = w[:-3]

    # step 4: undouble vowel — C v v D -> C v D (D a non-I consonant)
    if len(w) >= 4 and w[-1] not in _NL_VOWELS and w[-1] != "I" \
            and w[-2] == w[-3] and w[-2] in "aeou" \
            and w[-4] not in _NL_VOWELS:
        w = w[:-2] + w[-1]

    return w.replace("I", "i").replace("Y", "y")


# ------------------------------------------------------------- russian

_RU_VOWELS = "аеиоуыэюя"
_RU_PERF_GERUND_1 = ("в", "вши", "вшись")          # after а/я
_RU_PERF_GERUND_2 = ("ив", "ивши", "ившись", "ыв", "ывши", "ывшись")
_RU_ADJECTIVE = (
    "ее", "ие", "ые", "ое", "ими", "ыми", "ей", "ий", "ый", "ой", "ем",
    "им", "ым", "ом", "его", "ого", "ему", "ому", "их", "ых", "ую", "юю",
    "ая", "яя", "ою", "ею",
)
_RU_PARTICIPLE_1 = ("ем", "нн", "вш", "ющ", "щ")   # after а/я
_RU_PARTICIPLE_2 = ("ивш", "ывш", "ующ")
_RU_VERB_1 = (                                       # after а/я
    "ла", "на", "ете", "йте", "ли", "й", "л", "ем", "н", "ло", "но",
    "ет", "ют", "ны", "ть", "ешь", "нно",
)
_RU_VERB_2 = (
    "ила", "ыла", "ена", "ейте", "уйте", "ите", "или", "ыли", "ей",
    "уй", "ил", "ыл", "им", "ым", "ен", "ило", "ыло", "ено", "ят",
    "ует", "уют", "ит", "ыт", "ены", "ить", "ыть", "ишь", "ую", "ю",
)
_RU_NOUN = (
    "а", "ев", "ов", "ие", "ье", "е", "иями", "ями", "ами", "еи", "ии",
    "и", "ией", "ей", "ой", "ий", "й", "иям", "ям", "ием", "ем", "ам",
    "ом", "о", "у", "ах", "иях", "ях", "ы", "ь", "ию", "ью", "ю", "ия",
    "ья", "я",
)


def _ru_strip_group(w: str, rv: int, sufs, after_ay) -> tuple[str, bool]:
    """Remove the longest suffix of the group found in RV; ``after_ay``
    suffixes additionally require a preceding а/я (which stays)."""
    best, best_ay = None, False
    for s in sufs:
        if w.endswith(s) and len(w) - len(s) >= rv:
            if best is None or len(s) > len(best):
                best, best_ay = s, False
    for s in after_ay:
        for pre in ("а", "я"):
            full = pre + s
            if w.endswith(full) and len(w) - len(s) - 1 >= rv - 1 \
                    and len(w) - len(full) >= 0:
                # the а/я must itself be in RV or precede it by one
                if len(w) - len(full) + 1 > rv - 1 and \
                        (best is None or len(s) > len(best) or
                         (len(s) == len(best) and not best_ay)):
                    if best is None or len(s) >= len(best):
                        best, best_ay = s, True
    if best is None:
        return w, False
    return w[: -len(best)], True


def stem_russian(word: str) -> str:
    """Snowball Russian (snowballstem.org/algorithms/russian/stemmer):
    RV after the first vowel; perfective gerund | (reflexive?
    adjective/participle | verb | noun); derivational ость/ост in R2;
    tidy-up (double н, superlative ейш(е), final ь)."""
    w = word.lower().replace("ё", "е")
    n = len(w)
    rv = n
    for i, c in enumerate(w):
        if c in _RU_VOWELS:
            rv = i + 1
            break
    r1, r2 = _std_regions(w, _RU_VOWELS)

    # step 1: perfective gerund, else (reflexive?, adj/part|verb|noun)
    w2, done = _ru_strip_group(w, rv, _RU_PERF_GERUND_2,
                               _RU_PERF_GERUND_1)
    if done:
        w = w2
    else:
        for s in ("ся", "сь"):
            if w.endswith(s) and len(w) - len(s) >= rv:
                w = w[: -len(s)]
                break
        w2, done = _ru_strip_group(w, rv, _RU_ADJECTIVE, ())
        if done:
            w = w2
            w2, _ = _ru_strip_group(w, rv, _RU_PARTICIPLE_2,
                                    _RU_PARTICIPLE_1)
            w = w2
        else:
            w2, done = _ru_strip_group(w, rv, _RU_VERB_2, _RU_VERB_1)
            if done:
                w = w2
            else:
                w2, _ = _ru_strip_group(w, rv, _RU_NOUN, ())
                w = w2

    # step 2: и
    if w.endswith("и") and len(w) - 1 >= rv:
        w = w[:-1]

    # step 3: derivational, in R2
    for s in ("ость", "ост"):
        if w.endswith(s) and len(w) - len(s) >= r2:
            w = w[: -len(s)]
            break

    # step 4: tidy up
    if w.endswith("нн") and len(w) - 1 >= rv:
        w = w[:-1]
    else:
        for s in ("ейше", "ейш"):
            if w.endswith(s) and len(w) - len(s) >= rv:
                w = w[: -len(s)]
                if w.endswith("нн") and len(w) - 1 >= rv:
                    w = w[:-1]
                break
    if w.endswith("ь") and len(w) - 1 >= rv:
        w = w[:-1]
    return w


# ------------------------------------------------------------- spanish

_ES_VOWELS = "aeiouáéíóúü"
_ES_STEP0_PRON = ("me", "se", "sela", "selo", "selas", "selos", "la",
                  "le", "lo", "las", "les", "los", "nos")
_ES_STEP0_PRE1 = ("iéndo", "ándo", "ár", "ér", "ír")   # de-accent after
_ES_STEP0_PRE2 = ("iendo", "ando", "ar", "er", "ir")
_ES_DEACCENT = str.maketrans("áéíóú", "aeiou")

_ES_VERB_SUFFIXES = (
    "arían", "arías", "arán", "arás", "aríais", "aría", "aréis",
    "aríamos", "aremos", "ará", "aré", "erían", "erías", "erán",
    "erás", "eríais", "ería", "eréis", "eríamos", "eremos", "erá",
    "eré", "irían", "irías", "irán", "irás", "iríais", "iría",
    "iréis", "iríamos", "iremos", "irá", "iré", "aba", "ada", "ida",
    "ía", "ara", "iera", "ad", "ed", "id", "ase", "iese", "aste",
    "iste", "an", "aban", "ían", "aran", "ieran", "asen", "iesen",
    "aron", "ieron", "ado", "ido", "ando", "iendo", "ió", "ar", "er",
    "ir", "as", "abas", "adas", "idas", "ías", "aras", "ieras",
    "ases", "ieses", "ís", "áis", "abais", "íais", "arais", "ierais",
    "aseis", "ieseis", "asteis", "isteis", "ados", "idos", "amos",
    "ábamos", "íamos", "imos", "áramos", "iéramos", "iésemos",
    "ásemos",
)
_ES_VERB_EN = ("en", "es", "éis", "emos")


def stem_spanish(word: str) -> str:
    """Snowball Spanish (snowballstem.org/algorithms/spanish/stemmer):
    attached-pronoun step, standard-suffix step (R1/R2 tables), verb
    suffixes in RV, residual vowels, de-accenting."""
    w = word.lower()
    rv = _rv_romance(w, _ES_VOWELS)
    r1, r2 = _std_regions(w, _ES_VOWELS)

    # step 0: attached pronoun
    p = _ends_any(w, _ES_STEP0_PRON)
    if p:
        base = w[: -len(p)]
        pre1 = _ends_any(base, _ES_STEP0_PRE1)
        if pre1 and len(base) - len(pre1) >= rv:
            w = base.translate(_ES_DEACCENT)
        else:
            pre2 = _ends_any(base, _ES_STEP0_PRE2)
            if pre2 and len(base) - len(pre2) >= rv:
                w = base
            elif base.endswith("yendo") and base[: -5].endswith("u"):
                w = base

    # step 1: standard suffixes
    changed = False
    s = _longest_suffix(w, (
        "anza", "anzas", "ico", "ica", "icos", "icas", "ismo", "ismos",
        "able", "ables", "ible", "ibles", "ista", "istas", "oso",
        "osa", "osos", "osas", "amiento", "amientos", "imiento",
        "imientos",
    ), r2)
    if s:
        w = w[: -len(s)]
        changed = True
    else:
        s = _longest_suffix(w, ("adora", "ador", "ación", "adoras",
                                "adores", "aciones", "ante", "antes",
                                "ancia", "ancias"), r2)
        if s:
            w = w[: -len(s)]
            changed = True
            if w.endswith("ic") and len(w) - 2 >= r2:
                w = w[:-2]
        elif _longest_suffix(w, ("logía", "logías"), r2):
            s = _longest_suffix(w, ("logía", "logías"), r2)
            w = w[: -len(s)] + "log"
            changed = True
        elif _longest_suffix(w, ("ución", "uciones"), r2):
            s = _longest_suffix(w, ("ución", "uciones"), r2)
            w = w[: -len(s)] + "u"
            changed = True
        elif _longest_suffix(w, ("encia", "encias"), r2):
            s = _longest_suffix(w, ("encia", "encias"), r2)
            w = w[: -len(s)] + "ente"
            changed = True
        elif w.endswith("amente") and len(w) - 6 >= r1:
            w = w[:-6]
            changed = True
            if w.endswith("iv") and len(w) - 2 >= r2:
                w = w[:-2]
                if w.endswith("at") and len(w) - 2 >= r2:
                    w = w[:-2]
            else:
                t = _longest_suffix(w, ("os", "ic", "ad"), r2)
                if t:
                    w = w[: -len(t)]
        elif w.endswith("mente") and len(w) - 5 >= r2:
            w = w[:-5]
            changed = True
            t = _longest_suffix(w, ("ante", "able", "ible"), r2)
            if t:
                w = w[: -len(t)]
        elif _longest_suffix(w, ("idad", "idades"), r2):
            s = _longest_suffix(w, ("idad", "idades"), r2)
            w = w[: -len(s)]
            changed = True
            t = _longest_suffix(w, ("abil", "ic", "iv"), r2)
            if t:
                w = w[: -len(t)]
        elif _longest_suffix(w, ("iva", "ivo", "ivas", "ivos"), r2):
            s = _longest_suffix(w, ("iva", "ivo", "ivas", "ivos"), r2)
            w = w[: -len(s)]
            changed = True
            if w.endswith("at") and len(w) - 2 >= r2:
                w = w[:-2]

    # step 2a (only if step 1 removed nothing): y-verbs after u
    if not changed:
        s = _longest_suffix(w, ("ya", "ye", "yan", "yen", "yeron",
                                "yendo", "yo", "yó", "yas", "yes",
                                "yais", "yamos"), rv)
        if s and w[: -len(s)].endswith("u"):
            w = w[: -len(s)]
            changed = True
    # step 2b: other verb suffixes in RV
    if not changed:
        s = _longest_suffix(w, _ES_VERB_EN, rv)
        s2 = _longest_suffix(w, _ES_VERB_SUFFIXES, rv)
        if s2 and (not s or len(s2) > len(s)):
            w = w[: -len(s2)]
        elif s:
            w = w[: -len(s)]
            if w.endswith("gu"):
                w = w[:-1]

    # step 3: residual suffix
    s = _longest_suffix(w, ("os", "a", "o", "á", "í", "ó"), rv)
    if s:
        w = w[: -len(s)]
    else:
        s = _longest_suffix(w, ("e", "é"), rv)
        if s:
            w = w[: -len(s)]
            if w.endswith("gu") and len(w) - 1 >= rv:
                w = w[:-1]

    return w.translate(_ES_DEACCENT)


# ------------------------------------------------------------- italian

_IT_VOWELS = "aeiouàèìòù"
_IT_STEP0_PRON = (
    "ci", "gli", "la", "le", "li", "lo", "mi", "ne", "si", "ti", "vi",
    "sene", "gliela", "gliele", "glieli", "glielo", "gliene", "mela",
    "mele", "meli", "melo", "mene", "tela", "tele", "teli", "telo",
    "tene", "cela", "cele", "celi", "celo", "cene", "vela", "vele",
    "veli", "velo", "vene",
)
_IT_VERB_SUFFIXES = (
    "ammo", "ando", "ano", "are", "arono", "asse", "assero", "assi",
    "assimo", "ata", "ate", "ati", "ato", "ava", "avamo", "avano",
    "avate", "avi", "avo", "emmo", "enda", "ende", "endi", "endo",
    "erà", "erai", "eranno", "ere", "erebbe", "erebbero", "erei",
    "eremmo", "eremo", "ereste", "eresti", "erete", "erò", "erono",
    "essero", "ete", "eva", "evamo", "evano", "evate", "evi", "evo",
    "Yamo", "iamo", "immo", "irà", "irai", "iranno", "ire", "irebbe",
    "irebbero", "irei", "iremmo", "iremo", "ireste", "iresti",
    "irete", "irò", "irono", "isca", "iscano", "isce", "isci",
    "isco", "iscono", "issero", "ita", "ite", "iti", "ito", "iva",
    "ivamo", "ivano", "ivate", "ivi", "ivo", "ono", "uta", "ute",
    "uti", "uto", "ar", "ir",
)


def stem_italian(word: str) -> str:
    """Snowball Italian (snowballstem.org/algorithms/italian/stemmer):
    accent normalization (acute→grave), protected U/I after q /
    between vowels, attached pronouns, standard suffixes, verb
    suffixes in RV, residual vowel removal, i/h cleanup."""
    w = word.lower().translate(str.maketrans("áéíóú", "àèìòù"))
    chars = list(w)
    for i in range(1, len(chars)):
        if chars[i] in "ui" and chars[i - 1] == "q":
            chars[i] = chars[i].upper()
        elif 0 < i < len(chars) - 1 and chars[i] in "ui" \
                and chars[i - 1] in _IT_VOWELS and chars[i + 1] in _IT_VOWELS:
            chars[i] = chars[i].upper()
    w = "".join(chars)
    rv = _rv_romance(w, _IT_VOWELS)
    r1, r2 = _std_regions(w, _IT_VOWELS)

    # step 0: attached pronoun, preceded by ando/endo (delete) or
    # ar/er/ir (replace with e), the preceding part in RV
    p = _ends_any(w, _IT_STEP0_PRON)
    if p:
        base = w[: -len(p)]
        pre = _ends_any(base, ("ando", "endo"))
        if pre and len(base) - len(pre) >= rv:
            w = base
        else:
            pre = _ends_any(base, ("ar", "er", "ir"))
            if pre and len(base) - len(pre) >= rv:
                w = base + "e"

    # step 1: standard suffixes
    changed = False
    s = _longest_suffix(w, (
        "anza", "anze", "ico", "ici", "ica", "ice", "iche", "ichi",
        "ismo", "ismi", "abile", "abili", "ibile", "ibili", "ista",
        "iste", "isti", "istà", "istè", "istì", "oso", "osi", "osa",
        "ose", "mente", "atrice", "atrici", "ante", "anti",
    ), r2)
    if s:
        w = w[: -len(s)]
        changed = True
    else:
        s = _longest_suffix(w, ("azione", "azioni", "atore", "atori"), r2)
        if s:
            w = w[: -len(s)]
            changed = True
            if w.endswith("ic") and len(w) - 2 >= r2:
                w = w[:-2]
        elif _longest_suffix(w, ("logia", "logie"), r2):
            s = _longest_suffix(w, ("logia", "logie"), r2)
            w = w[: -len(s)] + "log"
            changed = True
        elif _longest_suffix(w, ("uzione", "uzioni", "usione", "usioni"), r2):
            s = _longest_suffix(w, ("uzione", "uzioni", "usione",
                                    "usioni"), r2)
            w = w[: -len(s)] + "u"
            changed = True
        elif _longest_suffix(w, ("enza", "enze"), r2):
            s = _longest_suffix(w, ("enza", "enze"), r2)
            w = w[: -len(s)] + "ente"
            changed = True
        elif w.endswith("amente") and len(w) - 6 >= r1:
            w = w[:-6]
            changed = True
            if w.endswith("iv") and len(w) - 2 >= r2:
                w = w[:-2]
                if w.endswith("at") and len(w) - 2 >= r2:
                    w = w[:-2]
            else:
                t = _longest_suffix(w, ("os", "ic", "abil"), r2)
                if t:
                    w = w[: -len(t)]
        elif _longest_suffix(w, ("amento", "amenti", "imento",
                                 "imenti"), rv):
            s = _longest_suffix(w, ("amento", "amenti", "imento",
                                    "imenti"), rv)
            w = w[: -len(s)]
            changed = True
        elif _longest_suffix(w, ("ità",), r2):
            w = w[:-3]
            changed = True
            t = _longest_suffix(w, ("abil", "ic", "iv"), r2)
            if t:
                w = w[: -len(t)]
        elif _longest_suffix(w, ("ivo", "ivi", "iva", "ive"), r2):
            s = _longest_suffix(w, ("ivo", "ivi", "iva", "ive"), r2)
            w = w[: -len(s)]
            changed = True
            if w.endswith("at") and len(w) - 2 >= r2:
                w = w[:-2]
                if w.endswith("ic") and len(w) - 2 >= r2:
                    w = w[:-2]

    # step 2: verb suffixes in RV (only if step 1 removed nothing)
    if not changed:
        s = _longest_suffix(w, _IT_VERB_SUFFIXES, rv)
        if s:
            w = w[: -len(s)]

    # step 3a: residual vowel in RV (then a preceding i in RV)
    s = _longest_suffix(w, ("a", "e", "i", "o", "à", "è", "ì", "ò"), rv)
    if s:
        w = w[: -1]
        if w.endswith("i") and len(w) - 1 >= rv:
            w = w[:-1]
    # step 3b: ch/gh -> c/g in RV
    if (w.endswith("ch") or w.endswith("gh")) and len(w) - 1 >= rv:
        w = w[:-1]

    return w.replace("U", "u").replace("I", "i")


# ---------------------------------------------------------- portuguese

_PT_VOWELS = "aeiouáéíóúâêôàü"
_PT_VERB_SUFFIXES = (
    "ada", "ida", "ia", "aria", "eria", "iria", "ará", "ara", "erá",
    "era", "irá", "ava", "asse", "esse", "isse", "aste", "este",
    "iste", "ei", "arei", "erei", "irei", "am", "iam", "ariam",
    "eriam", "iriam", "aram", "eram", "iram", "avam", "em", "arem",
    "erem", "irem", "assem", "essem", "issem", "ado", "ido", "ando",
    "endo", "indo", "arão", "erão", "irão", "ar", "er", "ir", "as",
    "adas", "idas", "ias", "arias", "erias", "irias", "arás", "aras",
    "erás", "eras", "irás", "avas", "es", "ardes", "erdes", "irdes",
    "ares", "eres", "ires", "asses", "esses", "isses", "astes",
    "estes", "istes", "is", "ais", "eis", "íeis", "aríeis", "eríeis",
    "iríeis", "áreis", "areis", "éreis", "ereis", "íreis", "ireis",
    "ásseis", "ésseis", "ísseis", "áveis", "aveis", "ados", "idos",
    "ámos", "amos", "íamos", "aríamos", "eríamos", "iríamos",
    "áramos", "éramos", "íramos", "ávamos", "emos", "aremos",
    "eremos", "iremos", "ássemos", "êssemos", "íssemos", "imos",
    "armos", "ermos", "irmos", "eu", "iu", "ou", "ira", "iras",
)


def stem_portuguese(word: str) -> str:
    """Snowball Portuguese (snowballstem.org/algorithms/portuguese/
    stemmer): ã/õ encoded a~/o~, standard suffixes, verb suffixes in
    RV, residual suffix/cedilla cleanup."""
    w = word.lower().replace("ã", "a~").replace("õ", "o~")
    rv = _rv_romance(w, _PT_VOWELS)
    r1, r2 = _std_regions(w, _PT_VOWELS)

    changed = False
    # step 1: standard suffixes
    s = _longest_suffix(w, (
        "eza", "ezas", "ico", "ica", "icos", "icas", "ismo", "ismos",
        "ável", "ível", "ista", "istas", "oso", "osa", "osos", "osas",
        "amento", "amentos", "imento", "imentos", "adora", "ador",
        "aça~o", "adoras", "adores", "aço~es", "ante", "antes",
        "ância",
    ), r2)
    if s:
        w = w[: -len(s)]
        changed = True
        if s in ("adora", "ador", "aça~o", "adoras", "adores",
                 "aço~es", "ante", "antes", "ância") \
                and w.endswith("ic") and len(w) - 2 >= r2:
            w = w[:-2]
    elif _longest_suffix(w, ("logia", "logias"), r2):
        s = _longest_suffix(w, ("logia", "logias"), r2)
        w = w[: -len(s)] + "log"
        changed = True
    elif _longest_suffix(w, ("uça~o", "uço~es"), r2):
        s = _longest_suffix(w, ("uça~o", "uço~es"), r2)
        w = w[: -len(s)] + "u"
        changed = True
    elif _longest_suffix(w, ("ência", "ências"), r2):
        s = _longest_suffix(w, ("ência", "ências"), r2)
        w = w[: -len(s)] + "ente"
        changed = True
    elif w.endswith("amente") and len(w) - 6 >= r1:
        w = w[:-6]
        changed = True
        if w.endswith("iv") and len(w) - 2 >= r2:
            w = w[:-2]
            if w.endswith("at") and len(w) - 2 >= r2:
                w = w[:-2]
        else:
            t = _longest_suffix(w, ("os", "ic", "ad"), r2)
            if t:
                w = w[: -len(t)]
    elif w.endswith("mente") and len(w) - 5 >= r2:
        w = w[:-5]
        changed = True
        t = _longest_suffix(w, ("ante", "avel", "ível"), r2)
        if t:
            w = w[: -len(t)]
    elif _longest_suffix(w, ("idade", "idades"), r2):
        s = _longest_suffix(w, ("idade", "idades"), r2)
        w = w[: -len(s)]
        changed = True
        t = _longest_suffix(w, ("abil", "ic", "iv"), r2)
        if t:
            w = w[: -len(t)]
    elif _longest_suffix(w, ("iva", "ivo", "ivas", "ivos"), r2):
        s = _longest_suffix(w, ("iva", "ivo", "ivas", "ivos"), r2)
        w = w[: -len(s)]
        changed = True
        if w.endswith("at") and len(w) - 2 >= r2:
            w = w[:-2]
    elif _longest_suffix(w, ("ira", "iras"), rv):
        s = _longest_suffix(w, ("ira", "iras"), rv)
        if w[: -len(s)].endswith("e"):
            w = w[: -len(s)] + "ir"
            changed = True

    # step 2: verb suffixes in RV (only if step 1 removed nothing)
    if not changed:
        s = _longest_suffix(w, _PT_VERB_SUFFIXES, rv)
        if s:
            w = w[: -len(s)]
            changed = True

    # step 3: if steps 1-2 changed, final i preceded by c, in RV
    if changed and w.endswith("i") and len(w) - 1 >= rv \
            and w[:-1].endswith("c"):
        w = w[:-1]
    # step 4: if steps 1-2 did nothing, residual suffix os/a/i/o/á/í/ó
    if not changed:
        s = _longest_suffix(w, ("os", "a", "i", "o", "á", "í", "ó"), rv)
        if s:
            w = w[: -len(s)]
    # step 5: final e/é/ê in RV; gu/ci undouble; ç -> c
    s = _longest_suffix(w, ("e", "é", "ê"), rv)
    if s:
        w = w[: -1]
        if (w.endswith("gu") and len(w) - 1 >= rv) or \
                (w.endswith("ci") and len(w) - 1 >= rv):
            w = w[:-1]
    if w.endswith("ç"):
        w = w[:-1] + "c"

    return w.replace("a~", "ã").replace("o~", "õ")


# -------------------------------------------------------------- french

_FR_VOWELS = "aeiouyâàëéêèïîôûù"
_FR_VERB_SUFFIXES_I = (  # step 2a: start with i, preceded by non-vowel
    "îmes", "ît", "îtes", "i", "ie", "ies", "ir", "ira", "irai",
    "iraIent", "irais", "irait", "iras", "irent", "irez", "iriez",
    "irions", "irons", "iront", "is", "issaIent", "issais", "issait",
    "issant", "issante", "issantes", "issants", "isse", "issent",
    "isses", "issez", "issiez", "issions", "issons", "it",
)
_FR_VERB_SUFFIXES_2B = (
    "ions", "é", "ée", "ées", "és", "èrent", "er", "era", "erai",
    "eraIent", "erais", "erait", "eras", "erez", "eriez", "erions",
    "erons", "eront", "ez", "iez", "âmes", "ât", "âtes", "a", "ai",
    "aIent", "ais", "ait", "ant", "ante", "antes", "ants", "as",
    "asse", "assent", "asses", "assiez", "assions",
)


def stem_french(word: str) -> str:
    """Snowball French (snowballstem.org/algorithms/french/stemmer):
    protected U/I/Y, standard suffixes, verb suffixes (i-group needs a
    preceding non-vowel), residual steps, undoubling, accent fold."""
    w = word.lower()
    chars = list(w)
    n = len(chars)
    for i in range(n):
        c = chars[i]
        if c in "ui" and 0 < i < n - 1 and chars[i - 1] in _FR_VOWELS \
                and chars[i + 1] in _FR_VOWELS:
            chars[i] = c.upper()
        elif c == "u" and i > 0 and chars[i - 1] == "q":
            chars[i] = "U"
        elif c == "y" and ((i > 0 and chars[i - 1] in _FR_VOWELS) or
                           (i < n - 1 and chars[i + 1] in _FR_VOWELS)):
            chars[i] = "Y"
    w = "".join(chars)
    rv = len(w)
    # French RV: if the word begins with two vowels, RV is after the
    # third letter; else after the first vowel not at the start
    if len(w) >= 3 and w[0] in _FR_VOWELS and w[1] in _FR_VOWELS:
        rv = 3
    else:
        for i in range(1, len(w)):
            if w[i] in _FR_VOWELS:
                rv = i + 1
                break
    r1, r2 = _std_regions(w, _FR_VOWELS)

    orig = w
    step1_done = False
    found_step1 = False

    # step 1: standard suffixes (the high-traffic subset of the spec)
    s = _longest_suffix(w, ("ance", "iqUe", "isme", "able", "iste",
                            "eux", "ances", "iqUes", "ismes", "ables",
                            "istes"), r2)
    if s:
        w = w[: -len(s)]
        found_step1 = True
    else:
        s = _longest_suffix(w, ("atrice", "ateur", "ation", "atrices",
                                "ateurs", "ations"), r2)
        if s:
            w = w[: -len(s)]
            found_step1 = True
            if w.endswith("ic"):
                if len(w) - 2 >= r2:
                    w = w[:-2]
                else:
                    w = w[:-2] + "iqU"
        elif _longest_suffix(w, ("logie", "logies"), r2):
            s = _longest_suffix(w, ("logie", "logies"), r2)
            w = w[: -len(s)] + "log"
            found_step1 = True
        elif _longest_suffix(w, ("usion", "ution", "usions", "utions"), r2):
            s = _longest_suffix(w, ("usion", "ution", "usions",
                                    "utions"), r2)
            w = w[: -len(s)] + "u"
            found_step1 = True
        elif _longest_suffix(w, ("ence", "ences"), r2):
            s = _longest_suffix(w, ("ence", "ences"), r2)
            w = w[: -len(s)] + "ent"
            found_step1 = True
        elif _longest_suffix(w, ("ement", "ements"), rv):
            s = _longest_suffix(w, ("ement", "ements"), rv)
            w = w[: -len(s)]
            found_step1 = True
            if w.endswith("iv") and len(w) - 2 >= r2:
                w = w[:-2]
                if w.endswith("at") and len(w) - 2 >= r2:
                    w = w[:-2]
            elif w.endswith("eus"):
                if len(w) - 3 >= r2:
                    w = w[:-3]
                elif len(w) - 3 >= r1:
                    w = w[:-3] + "eux"
            elif w.endswith("abl") and len(w) - 3 >= r2:
                w = w[:-3]
            elif w.endswith("iqU") and len(w) - 3 >= r2:
                w = w[:-3]
        elif _longest_suffix(w, ("ité", "ités"), r2):
            s = _longest_suffix(w, ("ité", "ités"), r2)
            w = w[: -len(s)]
            found_step1 = True
            if w.endswith("abil"):
                w = (w[:-4] if len(w) - 4 >= r2 else w[:-4] + "abl")
            elif w.endswith("ic"):
                w = (w[:-2] if len(w) - 2 >= r2 else w[:-2] + "iqU")
            elif w.endswith("iv") and len(w) - 2 >= r2:
                w = w[:-2]
        elif _longest_suffix(w, ("if", "ive", "ifs", "ives"), r2):
            s = _longest_suffix(w, ("if", "ive", "ifs", "ives"), r2)
            w = w[: -len(s)]
            found_step1 = True
            if w.endswith("at") and len(w) - 2 >= r2:
                w = w[:-2]
                if w.endswith("ic"):
                    w = (w[:-2] if len(w) - 2 >= r2 else w[:-2] + "iqU")
        elif w.endswith("eaux"):
            w = w[:-4] + "eau"
            found_step1 = True
        elif w.endswith("aux") and len(w) - 3 >= r1:
            w = w[:-3] + "al"
            found_step1 = True
        elif _longest_suffix(w, ("euse", "euses"), r2):
            s = _longest_suffix(w, ("euse", "euses"), r2)
            w = w[: -len(s)]
            found_step1 = True
        elif _longest_suffix(w, ("euse", "euses"), r1):
            s = _longest_suffix(w, ("euse", "euses"), r1)
            w = w[: -len(s)] + "eux"
            found_step1 = True
        elif _longest_suffix(w, ("issement", "issements"), r1):
            s = _longest_suffix(w, ("issement", "issements"), r1)
            if not w[: -len(s)] or w[-len(s) - 1] not in _FR_VOWELS:
                w = w[: -len(s)]
                found_step1 = True
        elif _longest_suffix(w, ("amment",), rv):
            w = w[:-6] + "ant"
            step1_done = False  # treated as unfinished (spec: goto 2a)
        elif _longest_suffix(w, ("emment",), rv):
            w = w[:-6] + "ent"
        elif _longest_suffix(w, ("ment", "ments"), rv):
            s = _longest_suffix(w, ("ment", "ments"), rv)
            if len(w) - len(s) - 1 >= 0 and w[-len(s) - 1] in _FR_VOWELS \
                    and len(w) - len(s) - 1 >= rv:
                w = w[: -len(s)]

    step1_changed = w != orig
    step1_finished = found_step1

    # step 2a (if step 1 left the word unfinished): i-verb suffixes
    # preceded by a non-vowel, all within RV
    did2 = False
    if not step1_finished:
        s = _longest_suffix(w, _FR_VERB_SUFFIXES_I, rv)
        if s and len(w) - len(s) - 1 >= 0 \
                and w[-len(s) - 1] not in _FR_VOWELS \
                and len(w) - len(s) - 1 >= rv - 1:
            w = w[: -len(s)]
            did2 = True
        elif not did2:
            # step 2b: other verb suffixes
            s = _longest_suffix(w, _FR_VERB_SUFFIXES_2B, rv)
            if s:
                if s == "ions":
                    if len(w) - 4 >= r2:
                        w = w[:-4]
                        did2 = True
                elif s[0] in "eè" or s in ("âmes", "ât", "âtes", "a",
                                           "ai", "aIent", "ais", "ait",
                                           "ant", "ante", "antes",
                                           "ants", "as", "asse",
                                           "assent", "asses", "assiez",
                                           "assions"):
                    w = w[: -len(s)]
                    did2 = True
                    # preceding e in RV also removed for the a-group
                    if s[0] in "aâ" and w.endswith("e") \
                            and len(w) - 1 >= rv:
                        w = w[:-1]
                else:
                    w = w[: -len(s)]
                    did2 = True

    # step 3 (if altered): final Y->i, ç->c; else step 4 residuals
    if step1_changed or did2:
        if w.endswith("Y"):
            w = w[:-1] + "i"
        elif w.endswith("ç"):
            w = w[:-1] + "c"
    else:
        # step 4
        if w.endswith("s") and len(w) >= 2 \
                and w[-2] not in "aiouès" and w[-2] != "H":
            w = w[:-1]
        s = _longest_suffix(w, ("ion",), r2)
        if s and len(w) - 4 >= 0 and w[-4] in "st" \
                and len(w) - 3 >= r2:
            w = w[:-3]
        else:
            s = _longest_suffix(w, ("ier", "ière", "Ier", "Ière"), rv)
            if s:
                w = w[: -len(s)] + "i"
            elif w.endswith("e") and len(w) - 1 >= rv:
                w = w[:-1]
            elif w.endswith("ë") and len(w) - 1 >= rv \
                    and w[:-1].endswith("gu"):
                w = w[:-1]

    # step 5: undouble enn/onn/ett/ell/eill
    for d in ("enn", "onn", "ett", "ell", "eill"):
        if w.endswith(d):
            w = w[:-1]
            break
    # step 6: un-accent: é/è + consonants* at end -> e
    i = len(w) - 1
    seen_cons = False
    while i >= 0:
        if w[i] in _FR_VOWELS or w[i] in "éè":
            break
        seen_cons = True
        i -= 1
    if i >= 0 and w[i] in "éè" and seen_cons:
        w = w[:i] + "e" + w[i + 1:]

    return (w.replace("I", "i").replace("U", "u").replace("Y", "y"))


# -------------------------------------------------- stopwords + registry

# Named stopword sets (Analysis.java:101-112 `_french_`, `_german_`, …
# resolve to Lucene's bundled snowball lists; the high-frequency core
# of each public list is included here — these are function words, not
# copyrightable content).
FRENCH_STOP_SET = frozenset("""
au aux avec ce ces dans de des du elle en et eux il ils je la le les
leur lui ma mais me même mes moi mon ne nos notre nous on ou par pas
pour qu que qui sa se ses son sur ta te tes toi ton tu un une vos
votre vous c d j l à m n s t y été étée étées étés étant suis es est
sommes êtes sont serai seras sera serons serez seront serais serait
serions seriez seraient étais était étions étiez étaient fus fut
furent sois soit soyons soyez soient fût eu eue eues eus ai as avons
avez ont aurai auras aura aurons aurez auront aurais aurait aurions
auriez auraient avais avait avions aviez avaient eut eûmes eûtes
eurent aie aies ait ayons ayez aient eût ayant
""".split())

GERMAN_STOP_SET = frozenset("""
aber alle allem allen aller alles als also am an ander andere anderem
anderen anderer anderes anderm andern anderr anders auch auf aus bei
bin bis bist da damit dann der den des dem die das daß derselbe
derselben denselben desselben demselben dieselbe dieselben dasselbe
dazu dein deine deinem deinen deiner deines denn dessen dich dir du
dies diese diesem diesen dieser dieses doch dort durch ein eine einem
einen einer eines einig einige einigem einigen einiger einiges einmal
er ihn ihm es etwas euer eure eurem euren eurer eures für gegen
gewesen hab habe haben hat hatte hatten hier hin hinter ich mich mir
ihr ihre ihrem ihren ihrer ihres euch im in indem ins ist jede jedem
jeden jeder jedes jene jenem jenen jener jenes jetzt kann kein keine
keinem keinen keiner keines können könnte machen man manche manchem
manchen mancher manches mein meine meinem meinen meiner meines mit
muss musste nach nicht nichts noch nun nur ob oder ohne sehr sein
seine seinem seinen seiner seines selbst sich sie ihnen sind so
solche solchem solchen solcher solches soll sollte sondern sonst
über um und uns unse unsem unsen unser unses unter viel vom von vor
während war waren warst was weg weil weiter welche welchem welchen
welcher welches wenn werde werden wie wieder will wir wird wirst wo
wollen wollte würde würden zu zum zur zwar zwischen
""".split())

SPANISH_STOP_SET = frozenset("""
de la que el en y a los del se las por un para con no una su al lo
como más pero sus le ya o este sí porque esta entre cuando muy sin
sobre también me hasta hay donde quien desde todo nos durante todos
uno les ni contra otros ese eso ante ellos e esto mí antes algunos
qué unos yo otro otras otra él tanto esa estos mucho quienes nada
muchos cual poco ella estar estas algunas algo nosotros mi mis tú te
ti tu tus ellas nosotras vosotros vosotras os mío mía míos mías tuyo
tuya tuyos tuyas suyo suya suyos suyas nuestro nuestra nuestros
nuestras vuestro vuestra vuestros vuestras esos esas estoy estás está
estamos estáis están esté estés estemos estéis estén estaré estarás
estará estaremos estaréis estarán estaría estarías estaríamos
estaríais estarían estaba estabas estábamos estabais estaban estuve
estuviste estuvo estuvimos estuvisteis estuvieron ser es soy eres
somos sois son sea seas seamos seáis sean seré serás será seremos
seréis serán sería serías seríamos seríais serían era eras éramos
erais eran fui fuiste fue fuimos fuisteis fueron tener tengo tienes
tiene tenemos tenéis tienen tenga tengas tengamos tengáis tengan
tendré tendrás tendrá tendremos tendréis tendrán tenía tenías
teníamos teníais tenían tuve tuviste tuvo tuvimos tuvisteis tuvieron
he has ha hemos habéis han haya hayas hayamos hayáis hayan habré
habrás habrá habremos habréis habrán había habías habíamos habíais
habían hube hubiste hubo hubimos hubisteis hubieron
""".split())

ITALIAN_STOP_SET = frozenset("""
ad al allo ai agli all agl alla alle con col coi da dal dallo dai
dagli dall dagl dalla dalle di del dello dei degli dell degl della
delle in nel nello nei negli nell negl nella nelle su sul sullo sui
sugli sull sugl sulla sulle per tra contro io tu lui lei noi voi loro
mio mia miei mie tuo tua tuoi tue suo sua suoi sue nostro nostra
nostri nostre vostro vostra vostri vostre mi ti ci vi lo la li le gli
ne il un uno una ma ed se perché anche come dov dove che chi cui non
più quale quanto quanti quanta quante quello quelli quella quelle
questo questi questa queste si tutto tutti a c e i l o ho hai ha
abbiamo avete hanno abbia abbiate abbiano avrò avrai avrà avremo
avrete avranno avrei avresti avrebbe avremmo avreste avrebbero avevo
avevi aveva avevamo avevate avevano ebbi avesti ebbe avemmo aveste
ebbero avessi avesse avessimo avessero avendo avuto avuta avuti avute
sono sei è siamo siete sia siate siano sarò sarai sarà saremo sarete
saranno sarei saresti sarebbe saremmo sareste sarebbero ero eri era
eravamo eravate erano fui fosti fu fummo foste furono fossi fosse
fossimo fossero essendo faccio fai facciamo fanno faccia facciate
facciano farò farai farà faremo farete faranno farei faresti farebbe
faremmo fareste farebbero facevo facevi faceva facevamo facevate
facevano feci facesti fece facemmo faceste fecero facessi facesse
facessimo facessero facendo sto stai sta stiamo stanno stia stiate
stiano starò starai starà staremo starete staranno starei staresti
starebbe staremmo stareste starebbero stavo stavi stava stavamo
stavate stavano stetti stesti stette stemmo steste stettero stessi
stesse stessimo stessero stando
""".split())

PORTUGUESE_STOP_SET = frozenset("""
de a o que e do da em um para é com não uma os no se na por mais as
dos como mas foi ao ele das tem à seu sua ou ser quando muito há nos
já está eu também só pelo pela até isso ela entre era depois sem
mesmo aos ter seus quem nas me esse eles estão você tinha foram essa
num nem suas meu às minha têm numa pelos elas havia seja qual será
nós tenho lhe deles essas esses pelas este fosse dele tu te vocês
vos lhes meus minhas teu tua teus tuas nosso nossa nossos nossas
dela delas esta estes estas aquele aquela aqueles aquelas isto aquilo
estou está estamos estão estive esteve estivemos estiveram estava
estávamos estavam esteja estejamos estejam estivesse estivéssemos
estivessem estiver estivermos estiverem hei há havemos hão houve
houvemos houveram houvera houvéramos haja hajamos hajam houvesse
houvéssemos houvessem houver houvermos houverem houverei houverá
houveremos houverão houveria houveríamos houveriam sou somos são era
éramos eram fui foi fomos foram fora fôramos seja sejamos sejam
fosse fôssemos fossem for formos forem serei será seremos serão
seria seríamos seriam tenho tem temos tém tinha tínhamos tinham
tive teve tivemos tiveram tivera tivéramos tenha tenhamos tenham
tivesse tivéssemos tivessem tiver tivermos tiverem terei terá
teremos terão teria teríamos teriam
""".split())

DUTCH_STOP_SET = frozenset("""
de en van ik te dat die in een hij het niet zijn is was op aan met
als voor had er maar om hem dan zou of wat mijn men dit zo door over
ze zich bij ook tot je mij uit der daar haar naar heb hoe heeft
hebben deze u want nog zal me zij nu ge geen omdat iets worden toch
al waren veel meer doen toen moet ben zonder kan hun dus alles onder
ja eens hier wie werd altijd doch wordt wezen kunnen ons zelf tegen
na reeds wil kon niets uw iemand geweest andere
""".split())

RUSSIAN_STOP_SET = frozenset("""
и в во не что он на я с со как а то все она так его но да ты к у же
вы за бы по только ее мне было вот от меня еще нет о из ему теперь
когда даже ну вдруг ли если уже или ни быть был него до вас нибудь
опять уж вам ведь там потом себя ничего ей может они тут где есть
надо ней для мы тебя их чем была сам чтоб без будто чего раз тоже
себе под будет ж тогда кто этот того потому этого какой совсем ним
здесь этом один почти мой тем чтобы нее сейчас были куда зачем всех
никогда можно при наконец два об другой хоть после над больше тот
через эти нас про всего них какая много разве три эту моя впрочем
хорошо свою этой перед иногда лучше чуть том нельзя такой им более
всегда конечно всю между
""".split())

# ------------------------------------------------- scandinavian trio
# Danish / Norwegian / Swedish share the snowball skeleton: R1 with the
# min-3 adjustment, ONE longest-match step-1 table (noun/verb endings +
# the conditional final-s), a consonant-pair step 2, and a small step-3
# cleanup. Per the spec, the LONGEST table match is selected first and
# its region/letter condition then tested — no fallback to a shorter
# suffix when the test fails.

_DA_VOWELS = "aeiouyæåø"
_NO_VOWELS = "aeiouyæåø"
_SV_VOWELS = "aeiouyäåö"
_DA_S_END = "abcdfghjklmnoprtvyzå"
_NO_S_END = "bcdfghjlmnoprtvyz"
_SV_S_END = "bcdfghjklmnoprtvy"

_DA_STEP1 = (
    "hed ethed ered e erede ende erende ene erne ere en heden eren er "
    "heder erer heds es endes erendes enes ernes eres ens hedens erens "
    "ers ets erets et eret").split()
_NO_STEP1 = (
    "a e ede ande ende ane ene hetene en heten ar er heter as es edes "
    "endes enes hetenes ens hetens ers ets et het ast").split()
_SV_STEP1 = (
    "a arna erna heterna orna ad e ade ande arne are aste en anden "
    "aren heten ern ar er heter or as arnas ernas ornas es ades andes "
    "ens arens hetens erns at andet het ast").split()


def _scand_r1(w: str, vowels: str) -> int:
    return max(_r_after_first_nonvowel_after_vowel(w, vowels), 3)


def stem_danish(word: str) -> str:
    """Snowball Danish (snowballstem.org/algorithms/danish/stemmer)."""
    w = word.lower()
    r1 = _scand_r1(w, _DA_VOWELS)
    s = _ends_any(w, _DA_STEP1 + ["s"])
    if s == "s":
        if len(w) - 1 >= r1 and len(w) >= 2 and w[-2] in _DA_S_END:
            w = w[:-1]
    elif s and len(w) - len(s) >= r1:
        w = w[: -len(s)]
    if _ends_any(w, ("gd", "dt", "gt", "kt")) and len(w) - 2 >= r1:
        w = w[:-1]
    if w.endswith("igst"):
        w = w[:-2]
    s = _ends_any(w, ("elig", "lig", "els", "ig", "løst"))
    if s == "løst":
        if len(w) - 4 >= r1:
            w = w[:-1]
    elif s and len(w) - len(s) >= r1:
        w = w[: -len(s)]
        if _ends_any(w, ("gd", "dt", "gt", "kt")) and len(w) - 2 >= r1:
            w = w[:-1]
    # undouble: final double consonant in R1
    if len(w) >= 2 and w[-1] == w[-2] and w[-1] not in _DA_VOWELS \
            and len(w) - 1 >= r1:
        w = w[:-1]
    return w


def stem_norwegian(word: str) -> str:
    """Snowball Norwegian (snowballstem.org/algorithms/norwegian/
    stemmer); the final-s condition allows `k` only after a
    non-vowel."""
    w = word.lower()
    r1 = _scand_r1(w, _NO_VOWELS)
    s = _ends_any(w, _NO_STEP1 + ["s", "erte", "ert"])
    if s == "s":
        ok = len(w) >= 2 and (
            w[-2] in _NO_S_END
            or (w[-2] == "k" and (len(w) < 3 or w[-3] not in _NO_VOWELS)))
        if ok and len(w) - 1 >= r1:
            w = w[:-1]
    elif s in ("erte", "ert"):
        if len(w) - len(s) >= r1:
            w = w[: -len(s)] + "er"
    elif s and len(w) - len(s) >= r1:
        w = w[: -len(s)]
    if _ends_any(w, ("dt", "vt")) and len(w) - 2 >= r1:
        w = w[:-1]
    s = _ends_any(w, ("hetslov", "slov", "elov", "lov", "elig", "eleg",
                      "lig", "leg", "eig", "ig", "els"))
    if s and len(w) - len(s) >= r1:
        w = w[: -len(s)]
    return w


def stem_swedish(word: str) -> str:
    """Snowball Swedish (snowballstem.org/algorithms/swedish/stemmer)."""
    w = word.lower()
    r1 = _scand_r1(w, _SV_VOWELS)
    s = _ends_any(w, _SV_STEP1 + ["s"])
    if s == "s":
        if len(w) - 1 >= r1 and len(w) >= 2 and w[-2] in _SV_S_END:
            w = w[:-1]
    elif s and len(w) - len(s) >= r1:
        w = w[: -len(s)]
    if _ends_any(w, ("dd", "gd", "nn", "dt", "gt", "kt", "tt")) \
            and len(w) - 2 >= r1:
        w = w[:-1]
    s = _ends_any(w, ("lig", "ig", "els", "löst", "fullt"))
    if s in ("lig", "ig", "els"):
        if len(w) - len(s) >= r1:
            w = w[: -len(s)]
    elif s == "löst":
        if len(w) - 4 >= r1:
            w = w[:-1]
    elif s == "fullt":
        if len(w) - 5 >= r1:
            w = w[:-1]
    return w


# ------------------------------------------------------------ finnish

_FI_VOWELS = "aeiouyäö"
_FI_LV = ("aa", "ee", "ii", "oo", "uu", "ää", "öö")

_FI_PARTICLES = ("kin", "kaan", "kään", "ko", "kö", "han", "hän",
                 "pa", "pä")
_FI_CASES_PLAIN = ("ta", "tä", "ssa", "ssä", "sta", "stä", "lla",
                   "llä", "lta", "ltä", "lle", "na", "nä", "ksi",
                   "ine")
_FI_HXN = {"han": "a", "hen": "e", "hin": "i", "hon": "o",
           "hun": "u", "hyn": "y", "hän": "ä", "hön": "ö"}


def stem_finnish(word: str) -> str:
    """Snowball Finnish (snowballstem.org/algorithms/finnish/stemmer):
    particles -> possessives -> cases -> comparatives -> i/j|t
    cleanup -> tidy. Longest table match first; a failed condition on
    the longest match does NOT fall back to a shorter suffix."""
    w = word.lower()
    r1, r2 = _std_regions(w, _FI_VOWELS)

    # step 1: particles (condition on the preceding letter) + -sti (R2)
    s = _longest_suffix(w, _FI_PARTICLES + ("sti",), r1)
    if s == "sti":
        if len(w) - 3 >= r2:
            w = w[:-3]
    elif s:
        prev = w[len(w) - len(s) - 1] if len(w) > len(s) else ""
        if prev in "nt" or prev in _FI_VOWELS:
            w = w[: -len(s)]

    # step 2: possessives
    s = _longest_suffix(
        w, ("si", "ni", "nsa", "nsä", "mme", "nne", "an", "än", "en"),
        r1)
    if s == "si":
        if not w[:-2].endswith("k"):
            w = w[:-2]
    elif s == "ni":
        w = w[:-2]
        if w.endswith("kse"):
            w = w[:-3] + "ksi"
    elif s in ("nsa", "nsä", "mme", "nne"):
        w = w[: -len(s)]
    elif s == "an":
        if _ends_any(w[:-2], ("ta", "ssa", "sta", "lla", "lta", "na")):
            w = w[:-2]
    elif s == "än":
        if _ends_any(w[:-2], ("tä", "ssä", "stä", "llä", "ltä", "nä")):
            w = w[:-2]
    elif s == "en":
        if _ends_any(w[:-2], ("lle", "ine")):
            w = w[:-2]

    # step 3: cases
    ending_removed = False
    s = _longest_suffix(
        w,
        tuple(_FI_HXN) + ("siin", "den", "tten", "seen", "a", "ä",
                          "tta", "ttä", "n") + _FI_CASES_PLAIN,
        r1)
    if s in _FI_HXN:
        if w[:-3].endswith(_FI_HXN[s]):
            w = w[:-3]
            ending_removed = True
    elif s in ("siin", "den", "tten"):
        stem = w[: -len(s)]
        if len(stem) >= 2 and stem[-1] == "i" and stem[-2] in _FI_VOWELS:
            w = stem
            ending_removed = True
    elif s == "seen":
        if _ends_any(w[:-4], _FI_LV):
            w = w[:-4]
            ending_removed = True
    elif s in ("a", "ä"):
        # preceded by cv: consonant then vowel directly before the a/ä
        if (len(w) >= 3 and w[-2] in _FI_VOWELS
                and w[-3] not in _FI_VOWELS):
            w = w[:-1]
            ending_removed = True
    elif s in ("tta", "ttä"):
        if w[:-3].endswith("e"):
            w = w[:-3]
            ending_removed = True
    elif s in _FI_CASES_PLAIN:
        w = w[: -len(s)]
        ending_removed = True
    elif s == "n":
        w = w[:-1]
        ending_removed = True
        if _ends_any(w, _FI_LV) or w.endswith("ie"):
            w = w[:-1]

    # step 4: other endings (R2); mpi family blocked after 'po'
    s = _longest_suffix(
        w, ("mpi", "mpa", "mpä", "mmi", "mma", "mmä", "impi", "impa",
            "impä", "immi", "imma", "immä", "eja", "ejä"), r2)
    if s in ("impi", "impa", "impä", "immi", "imma", "immä",
             "eja", "ejä"):
        w = w[: -len(s)]
    elif s:
        if not w[: -len(s)].endswith("po"):
            w = w[: -len(s)]

    # step 5
    if ending_removed:
        if w and w[-1] in "ij" and len(w) - 1 >= r1:
            w = w[:-1]
    else:
        if (w.endswith("t") and len(w) - 1 >= r1 and len(w) >= 2
                and w[-2] in _FI_VOWELS):
            w = w[:-1]
            s = _longest_suffix(w, ("mma", "imma"), r2)
            if s == "imma":
                w = w[:-4]
            elif s == "mma" and not w[:-3].endswith("po"):
                w = w[:-3]

    # step 6: tidy
    if _ends_any(w, _FI_LV) and len(w) - 1 >= r1:
        w = w[:-1]
    if (len(w) >= 2 and w[-1] in "aäei" and w[-2] not in _FI_VOWELS
            and len(w) - 1 >= r1):
        w = w[:-1]
    if (w.endswith("oj") or w.endswith("uj")) and len(w) - 1 >= r1:
        w = w[:-1]
    if w.endswith("jo") and len(w) - 1 >= r1:
        w = w[:-1]
    # undouble a final double consonant followed by zero or more vowels
    i = len(w)
    while i > 0 and w[i - 1] in _FI_VOWELS:
        i -= 1
    if (i >= 2 and w[i - 1] == w[i - 2]
            and w[i - 1] not in _FI_VOWELS):
        w = w[: i - 1] + w[i:]
    return w


# ----------------------------------------------------------- romanian

_RO_VOWELS = "aăâeiîou"

_RO_STEP1 = {
    "abilitate": "abil", "abilitati": "abil", "abilităi": "abil",
    "abilităţi": "abil",
    "ibilitate": "ibil",
    "ivitate": "iv", "ivitati": "iv", "ivităi": "iv", "ivităţi": "iv",
    "icitate": "ic", "icitati": "ic", "icităi": "ic", "icităţi": "ic",
    "icator": "ic", "icatori": "ic",
    "iciv": "ic", "iciva": "ic", "icive": "ic", "icivi": "ic",
    "icivă": "ic",
    "ical": "ic", "icala": "ic", "icale": "ic", "icali": "ic",
    "icală": "ic",
    "ativ": "at", "ativa": "at", "ative": "at", "ativi": "at",
    "ativă": "at", "aţiune": "at", "atoare": "at", "ator": "at",
    "atori": "at", "ătoare": "at", "ător": "at", "ători": "at",
    "itiv": "it", "itiva": "it", "itive": "it", "itivi": "it",
    "itivă": "it", "iţiune": "it", "itoare": "it", "itor": "it",
    "itori": "it",
}

_RO_STEP2_DELETE = (
    "at", "ata", "ată", "ati", "ate", "ut", "uta", "ută", "uti",
    "ute", "it", "ita", "ită", "iti", "ite", "ic", "ica", "ice",
    "ici", "ică", "abil", "abila", "abile", "abili", "abilă",
    "ibil", "ibila", "ibile", "ibili", "ibilă", "oasa", "oasă",
    "oase", "os", "osi", "oşi", "ant", "anta", "ante", "anti",
    "antă", "ator", "atori", "itate", "itati", "ităi", "ităţi",
    "iv", "iva", "ive", "ivi", "ivă")
_RO_STEP2_IST = ("ism", "isme", "ist", "ista", "iste", "isti",
                 "istă", "işti")

_RO_VERB_COND = (
    "are", "ere", "ire", "âre", "ind", "ând", "indu", "ându", "eze",
    "ească", "ez", "ezi", "ează", "esc", "eşti", "eşte", "ăsc",
    "ăşti", "ăşte", "am", "ai", "au", "eam", "eai", "eau", "iam",
    "iai", "iau", "ui", "âi", "aşi", "arăm", "arăţi", "ară", "âşi",
    "ârăm", "ârăţi", "âră", "işi", "irăm", "irăţi", "iră", "em",
    "eţi", "im", "iţi", "âm", "âţi", "ăm", "aţi", "eaţi", "iaţi")
_RO_VERB_UNCOND = (
    "sei", "seşi", "serăm", "serăţi", "seră", "se", "sesem",
    "seseşi", "sese", "seserăm", "seserăţi", "seseră")


def stem_romanian(word: str) -> str:
    """Snowball Romanian (snowballstem.org/algorithms/romanian/
    stemmer): i/u-between-vowels prelude, plural step 0, repeated
    combining-suffix reduction, standard-suffix removal in R2, verb
    suffixes in RV only when steps 1-2 removed nothing, final-vowel
    step 4. Uses the cedilla forms (ş/ţ) like the reference's bundled
    generated stemmer."""
    w = word.lower()
    # prelude: i/u between vowels -> consonant markers I/U
    chars = list(w)
    for i in range(1, len(chars) - 1):
        if (chars[i] in "iu" and chars[i - 1] in _RO_VOWELS
                and chars[i + 1] in _RO_VOWELS):
            chars[i] = chars[i].upper()
    w = "".join(chars)
    r1, r2 = _std_regions(w, _RO_VOWELS)
    rv = _rv_romance(w, _RO_VOWELS)

    # step 0: plurals and simplifications (R1)
    s = _longest_suffix(
        w, ("ul", "ului", "aua", "ea", "ele", "elor", "ii", "iua",
            "iei", "iile", "iilor", "ilor", "ile", "atei", "aţie",
            "aţia"), r1)
    if s in ("ul", "ului"):
        w = w[: -len(s)]
    elif s == "aua":
        w = w[:-3] + "a"
    elif s in ("ea", "ele", "elor"):
        w = w[: -len(s)] + "e"
    elif s in ("ii", "iua", "iei", "iile", "iilor", "ilor"):
        w = w[: -len(s)] + "i"
    elif s == "ile":
        if not w[:-3].endswith("ab"):
            w = w[:-3] + "i"
    elif s == "atei":
        w = w[:-4] + "at"
    elif s in ("aţie", "aţia"):
        w = w[:-4] + "aţi"

    # step 1: combining suffixes — repeat while a replacement fires
    removed_12 = False
    while True:
        s = _longest_suffix(w, _RO_STEP1, r1)
        if not s:
            break
        w = w[: -len(s)] + _RO_STEP1[s]
        removed_12 = True

    # step 2: standard suffixes (R2)
    s = _longest_suffix(
        w, _RO_STEP2_DELETE + ("iune", "iuni") + _RO_STEP2_IST, r2)
    if s in ("iune", "iuni"):
        if w[: -len(s)].endswith("ţ"):
            w = w[: -len(s) - 1] + "t"
            removed_12 = True
    elif s in _RO_STEP2_IST:
        w = w[: -len(s)] + "ist"
        removed_12 = True
    elif s:
        w = w[: -len(s)]
        removed_12 = True

    # step 3: verb suffixes (RV), only when steps 1-2 removed nothing
    if not removed_12:
        s = _longest_suffix(w, _RO_VERB_COND + _RO_VERB_UNCOND, rv)
        if s in _RO_VERB_UNCOND:
            w = w[: -len(s)]
        elif s:
            i = len(w) - len(s) - 1
            if i >= rv and (w[i] not in _RO_VOWELS or w[i] == "u"):
                w = w[: -len(s)]

    # step 4: final vowel (RV)
    s = _longest_suffix(w, ("a", "e", "i", "ie", "ă"), rv)
    if s:
        w = w[: -len(s)]
    return w.replace("I", "i").replace("U", "u")


# ---------------------------------------------------------- hungarian

_HU_VOWELS = "aáeéiíoóöőuúüű"
_HU_DIGRAPHS = ("cs", "dz", "dzs", "gy", "ly", "ny", "sz", "ty", "zs")
_HU_DOUBLES = ("bb", "cc", "ccs", "dd", "ff", "gg", "ggy", "jj", "kk",
               "ll", "lly", "mm", "nn", "nny", "pp", "rr", "ss",
               "ssz", "tt", "tty", "vv", "zz", "zzs")

_HU_STEP2 = ("ban", "ben", "ba", "be", "ra", "re", "nak", "nek",
             "val", "vel", "tól", "től", "ról", "ről", "ból", "ből",
             "hoz", "hez", "höz", "nál", "nél", "ig", "at", "et",
             "ot", "öt", "ért", "képp", "képpen", "kor", "ul", "ül",
             "vá", "vé", "onként", "enként", "anként", "ként", "en",
             "on", "an", "ön", "n", "t")
_HU_STEP7_DEL = ("ünk", "unk", "nk", "juk", "jük", "uk", "ük", "em",
                 "om", "am", "m", "od", "ed", "ad", "öd", "d", "ja",
                 "je", "a", "e", "o")
_HU_STEP7_A = ("ánk", "ájuk", "ám", "ád", "á")
_HU_STEP7_E = ("énk", "éjük", "ém", "éd", "é")
# the plural-owner paradigm is the -i- possessive marker plus person
# endings (im/id/i/ink/itek/ik with a/e linking vowels and j-glides);
# bare m/d/nk/k belong to steps 7 and 9, not here — including them
# would shadow the plural step entirely (házak must reach step 9)
_HU_STEP8_DEL = ("jaim", "jeim", "im", "aim", "eim", "jaid",
                 "jeid", "id", "aid", "eid", "jai", "jei", "i",
                 "ai", "ei", "jaink", "jeink", "ink", "aink", "eink",
                 "jaitok", "jeitek", "itek", "aitok", "eitek",
                 "jaik", "jeik", "ik", "aik", "eik")
_HU_STEP8_A = ("áim", "áid", "ái", "áink", "áitok", "áik")
_HU_STEP8_E = ("éim", "éid", "éi", "éink", "éitek", "éik")


def _hu_r1(w: str) -> int:
    """Hungarian R1: after the first consonant-or-digraph when the
    word begins with a vowel, else after the first vowel."""
    n = len(w)
    if not n:
        return 0
    if w[0] in _HU_VOWELS:
        i = 0
        while i < n and w[i] in _HU_VOWELS:
            i += 1
        if i >= n:
            return n
        if w[i:i + 3] == "dzs":
            return min(i + 3, n)
        if w[i:i + 2] in _HU_DIGRAPHS:
            return min(i + 2, n)
        return i + 1
    i = 0
    while i < n and w[i] not in _HU_VOWELS:
        i += 1
    return min(i + 1, n) if i < n else n


def _hu_undouble(stem: str) -> str:
    """Remove one letter of a trailing double consonant (doubled
    digraphs like ``ssz`` keep the digraph: ssz -> sz)."""
    d = _ends_any(stem, _HU_DOUBLES)
    if d:
        return stem[: -len(d)] + d[1:]
    return stem


def _hu_a_e(w: str) -> str:
    if w.endswith("á"):
        return w[:-1] + "a"
    if w.endswith("é"):
        return w[:-1] + "e"
    return w


def stem_hungarian(word: str) -> str:
    """Snowball Hungarian (snowballstem.org/algorithms/hungarian/
    stemmer): digraph-aware R1, then nine ordered suffix steps —
    instrumental (undouble), frequent cases (with final á/é
    shortening), special/other cases, factive (undouble), owned,
    singular-owner, plural-owner, plural."""
    w = word.lower()
    r1 = _hu_r1(w)

    # step 1: instrumental case (al/el preceded by a double consonant)
    s = _longest_suffix(w, ("al", "el"), r1)
    if s:
        stem = w[:-2]
        if _ends_any(stem, _HU_DOUBLES):
            w = _hu_undouble(stem)

    # step 2: frequent cases, then shorten a trailing á/é
    s = _longest_suffix(w, _HU_STEP2, r1)
    if s:
        w = _hu_a_e(w[: -len(s)])

    # step 3: special cases
    s = _longest_suffix(w, ("án", "ánként", "én"), r1)
    if s in ("án", "ánként"):
        w = w[: -len(s)] + "a"
    elif s == "én":
        w = w[:-2] + "e"

    # step 4: other cases
    s = _longest_suffix(
        w, ("astul", "estül", "ástul", "éstül", "stul", "stül"), r1)
    if s == "ástul":
        w = w[:-5] + "a"
    elif s == "éstül":
        w = w[:-5] + "e"
    elif s:
        w = w[: -len(s)]

    # step 5: factive case (á/é preceded by a double consonant)
    s = _longest_suffix(w, ("á", "é"), r1)
    if s:
        stem = w[:-1]
        if _ends_any(stem, _HU_DOUBLES):
            w = _hu_undouble(stem)

    # step 6: owned
    s = _longest_suffix(
        w, ("oké", "öké", "aké", "eké", "ké", "éi", "é", "áké",
            "áéi", "éké", "ééi", "éé"), r1)
    if s in ("áké", "áéi"):
        w = w[: -len(s)] + "a"
    elif s in ("éké", "ééi", "éé"):
        w = w[: -len(s)] + "e"
    elif s:
        w = w[: -len(s)]

    # step 7: singular owner suffixes
    s = _longest_suffix(w, _HU_STEP7_DEL + _HU_STEP7_A + _HU_STEP7_E,
                        r1)
    if s in _HU_STEP7_A:
        w = w[: -len(s)] + "a"
    elif s in _HU_STEP7_E:
        w = w[: -len(s)] + "e"
    elif s:
        w = w[: -len(s)]

    # step 8: plural owner suffixes
    s = _longest_suffix(w, _HU_STEP8_DEL + _HU_STEP8_A + _HU_STEP8_E,
                        r1)
    if s in _HU_STEP8_A:
        w = w[: -len(s)] + "a"
    elif s in _HU_STEP8_E:
        w = w[: -len(s)] + "e"
    elif s:
        w = w[: -len(s)]

    # step 9: plural
    s = _longest_suffix(w, ("ák", "ék", "ök", "ok", "ek", "ak", "k"),
                        r1)
    if s == "ák":
        w = w[:-2] + "a"
    elif s == "ék":
        w = w[:-2] + "e"
    elif s:
        w = w[: -len(s)]
    return w


# ------------------------------------------------------------ turkish

_TR_VOWELS = "aeıioöuü"
# Turkish vowel harmony: the suffix's first vowel must agree with the
# last vowel of the remaining stem (snowball turkish
# check_vowel_harmony; 2-fold a/e and 4-fold ı/i/u/ü alternations)
_TR_HARMONY = {
    "a": "aıou", "e": "eiöü",
    "ı": "aı", "i": "ei", "u": "ou", "ü": "öü",
    "o": "aıou", "ö": "eiöü",
}


def _tr_last_vowel(w: str) -> str | None:
    for c in reversed(w):
        if c in _TR_VOWELS:
            return c
    return None


def _tr_harmony_ok(stem: str, suffix: str) -> bool:
    sv = next((c for c in suffix if c in _TR_VOWELS), None)
    if sv is None:
        return True  # invariant suffix (-ki)
    pv = _tr_last_vowel(stem)
    return pv is not None and pv in _TR_HARMONY[sv]


def _4fold(pre: str = "", post: str = "") -> tuple[str, ...]:
    return tuple(pre + v + post for v in "ıiuü")


def _2fold(pre: str = "", post: str = "") -> tuple[str, ...]:
    return tuple(pre + v + post for v in "ae")


def _tr_surfaces(bodies, opts: str) -> tuple[tuple[str, str], ...]:
    """Expand a suffix class into concrete (surface, body) forms:
    every optional buffer consonant + body, then the bare body —
    sorted longest surface first so ``yla`` beats ``a``."""
    out = []
    for body in set(bodies):
        for o in opts:
            out.append((o + body, body))
        out.append((body, body))
    return tuple(sorted(out, key=lambda t: len(t[0]), reverse=True))


def _tr_strip(word: str, surfaces) -> str | None:
    """Strip one suffix surface form. A buffered form (surface longer
    than body) requires a vowel before the buffer consonant (snowball
    mark_suffix_with_optional_*_consonant); a bare single-consonant
    body (the post-vocalic allomorph of -(U)m / -(U)n) requires a
    vowel before it. The remainder must keep a vowel and pass vowel
    harmony against the body's first vowel."""
    for surface, body in surfaces:
        if not word.endswith(surface):
            continue
        rem = word[: -len(surface)]
        if len(rem) < 2 or _tr_last_vowel(rem) is None:
            continue
        if len(surface) > len(body) and rem[-1] not in _TR_VOWELS:
            continue  # buffer consonant must follow a vowel
        if (len(body) == 1 and body not in _TR_VOWELS
                and rem[-1] not in _TR_VOWELS):
            continue  # bare post-vocalic allomorph after a consonant
        if _tr_harmony_ok(rem, body):
            return rem
    return None


# nominal-verb (copula/tense/person) suffix classes, most specific
# first; each entry pre-expanded to (surface, body) forms
_TR_NOMINAL_VERB = tuple(_tr_surfaces(bodies, opts) for bodies, opts in (
    (("casına", "cesine"), ""),                       # -cAsInA
    (_4fold("d", "r") + _4fold("t", "r"), ""),        # -DUr
    (_4fold("sın", "z"), ""),                         # -sUnUz
    (_4fold("m", "ş"), "y"),                          # -(y)mUş
    (_4fold("d") + _4fold("t"), "y"),                 # -(y)DU
    (_2fold("s"), "y"),                               # -(y)sA
    (("ken",), "y"),                                  # -(y)ken
    (_2fold("l", "r"), ""),                           # -lAr
    (_4fold("", "z"), "y"),                           # -(y)Uz
    (_4fold("s", "n"), ""),                           # -sUn
    (_4fold("", "m"), "y"),                           # -(y)Um
))

# noun (possessive/case) suffix classes; the chain loop lets EACH
# class fire at most once (agglutinative chains: ev-ler-i-nden strips
# -nDAn then -lArI; the once-per-class rule bounds over-stemming)
_TR_NOUN = tuple(_tr_surfaces(bodies, opts) for bodies, opts in (
    (("ları", "leri"), ""),                           # -lArI
    (("ımız", "imiz", "umuz", "ümüz"), ""),           # -(U)mUz
    (("ınız", "iniz", "unuz", "ünüz"), ""),           # -(U)nUz
    (_2fold("nd", "n"), ""),                          # -nDAn
    (_2fold("nd"), ""),                               # -nDA
    (_4fold("n", "n"), ""),                           # -nUn
    (_2fold("d", "n") + _2fold("t", "n"), ""),        # -DAn
    (_2fold("l"), "y"),                               # -(y)lA
    (_4fold("m", "z"), ""),                           # -mUz
    (_4fold("n", "z"), ""),                           # -nUz
    (_2fold("d") + _2fold("t"), ""),                  # -DA
    (_2fold("c") + _2fold("ç"), ""),                  # -çA
    (_2fold("l", "r"), ""),                           # -lAr
    (("ki",), ""),                                    # -ki (invariant)
    (_4fold("", "m"), ""),                            # -(U)m
    (_4fold("", "n"), "y"),                           # -(U)n / -(y)Un
    (_2fold(), "ny"),                                 # -(y)A / -nA
    (_4fold(), "sy"),                                 # -(s)U / -(y)U
))
# deliberately absent: the bare post-vocalic -m/-n possessive
# allomorphs (araba-m, araba-n) — stripping a lone consonant after a
# vowel destroys far more roots (insan, adam, gün, zaman) than it
# collapses 1sg/2sg possessives in web text


def stem_turkish(word: str) -> str:
    """Snowball Turkish (snowballstem.org/algorithms/turkish/stemmer,
    E. Çilden's algorithm; the reference registers it via
    StemmerTokenFilterFactory and the ``turkish`` analyzer): strip one
    nominal-verb suffix chain, then loop the noun possessive/case
    suffix classes, every strip gated on vowel harmony and the
    optional-buffer-consonant rule; post-process un-does final-stop
    voicing (b→p c→ç d→t ğ→k after a vowel) and restores the harmony
    vowel after a stranded d/g (kanadı→kanat, geldim→geldi). Structure
    follows the spec; generated-code byte parity is not claimed."""
    w = word.lower()
    if sum(c in _TR_VOWELS for c in w) < 2:
        return w  # snowball: only stem words of more than one syllable

    stemmed = False

    def noun_chain(w: str, stemmed: bool) -> tuple[str, bool]:
        for _ in range(5):
            for surfaces in _TR_NOUN:
                rem = _tr_strip(w, surfaces)
                if rem is not None:
                    w, stemmed = rem, True
                    break
            else:
                break
        return w, stemmed

    # noun possessive/case chain first (deviation from the spec's
    # nominal-verb-first order: running the noun chain first keeps
    # noun inflection families — kanat/kanadı, sevgi/sevgisi —
    # collapsed instead of letting -(y)DU eat a noun's -dU ending)
    w, stemmed = noun_chain(w, stemmed)

    # nominal verb suffixes: each class at most once, re-chasing the
    # noun chain after every strip (gelmişlerdir → -DUr → -lAr →
    # gelmiş → -(y)mUş → gel; the spec composes person + tense
    # alternatives the same way)
    for surfaces in _TR_NOMINAL_VERB:
        rem = _tr_strip(w, surfaces)
        if rem is not None:
            w, stemmed = rem, True
            w, stemmed = noun_chain(w, stemmed)

    if stemmed and len(w) >= 2:
        last, prev = w[-1], w[-2]
        if last in "bcdğ" and prev in _TR_VOWELS:
            w = w[:-1] + {"b": "p", "c": "ç", "d": "t", "ğ": "k"}[last]
        elif last in "dg":
            lv = _tr_last_vowel(w)
            if lv is not None:
                for sv in "ıiuü":
                    if lv in _TR_HARMONY[sv]:
                        w = w + sv
                        break
    return w


# Turkish casing: dotted İ lowers to i, dotless I lowers to ı
# (TurkishLowerCaseFilter; Python str.lower() maps İ→i+combining-dot
# and I→i, both wrong for Turkish)
_TR_CASE = str.maketrans({"İ": "i", "I": "ı"})


def turkish_lowercase(text: str) -> str:
    return text.translate(_TR_CASE).lower()


def apostrophe_filter(tokens: list[str]) -> list[str]:
    """The reference's ``apostrophe`` token filter (Turkish analyzer
    chain): drop everything from the first apostrophe on —
    Türkiye'nin → Türkiye."""
    return [t.split("'", 1)[0] for t in tokens if t.split("'", 1)[0]]


SNOWBALL_STEMMERS = {
    "french": stem_french,
    "german": stem_german,
    "spanish": stem_spanish,
    "italian": stem_italian,
    "portuguese": stem_portuguese,
    "dutch": stem_dutch,
    "russian": stem_russian,
    "danish": stem_danish,
    "norwegian": stem_norwegian,
    "swedish": stem_swedish,
    "finnish": stem_finnish,
    "romanian": stem_romanian,
    "hungarian": stem_hungarian,
    "turkish": stem_turkish,
}

FINNISH_STOP_SET = frozenset("""
olen olet on olemme olette ovat ole oli olisi olisit olisin olisimme
olisitte olisivat olit olin olimme olitte olivat ollut olleet en et ei
emme ette eivät minä minun minut minua minussa minusta minuun minulla
minulta minulle sinä sinun sinut sinua sinussa sinusta sinuun sinulla
sinulta sinulle hän hänen hänet häntä hänessä hänestä häneen hänellä
häneltä hänelle me meidän meidät meitä meissä meistä meihin meillä
meiltä meille te teidän teidät teitä teissä teistä teihin teillä
teiltä teille he heidän heidät heitä heissä heistä heihin heillä
heiltä heille tämä tämän tätä tässä tästä tähän tällä tältä tälle
tänä täksi tuo tuon tuota tuossa tuosta tuohon tuolla tuolta tuolle
tuona tuoksi se sen sitä siinä siitä siihen sillä siltä sille siksi
nämä näiden näitä näissä näistä näihin näillä näiltä näille näinä
näiksi nuo noiden noita noissa noista noihin noilla noilta noille
noina noiksi ne niiden niitä niissä niistä niihin niillä niiltä
niille niinä niiksi kuka kenen kenet ketä kenessä kenestä keneen
kenellä keneltä kenelle kenenä keneksi ketkä keiden keitä keissä
keistä keihin keillä keiltä keille keinä keiksi mikä minkä mitä missä
mistä mihin millä miltä mille miksi mitkä joka jonka jota jossa josta
johon jolla jolta jolle jona joksi jotka joiden joita joissa joista
joihin joilla joilta joille joina joiksi että ja jos koska kuin mutta
niin sekä tai vaan vai vaikka kanssa mukaan noin poikki yli kun nyt
itse
""".split())

ROMANIAN_STOP_SET = frozenset("""
acea aceasta această aceea acei aceia acel acela acele acelea acest
acesta aceste acestea aceşti aceştia acolo acum ai aia aibă aici al
ăla ale alea ălea altceva altcineva am ar are aş aşadar asemenea asta
ăsta astăzi astea ăstea ăştia asupra aţi au avea avem aveţi azi bine
bucur bună ca că căci când care cărei căror cărui cât câte câţi către
câtva ce cel ceva chiar cînd cine cineva cît cîte cîţi cîtva contra
cu cum cumva curând curînd da dă dacă dar datorită de deci deja
deoarece departe deşi din dinaintea dintr dintre drept după ea ei el
ele eram este eşti eu face fără fi fie fiecare fii fim fiţi iar ieri
îi îl îmi împotriva în înainte înaintea încât încît încotro între
întrucât întrucît îţi la lângă le li lîngă lor lui mă mâine mea mei
mele mereu meu mi mine mult multă mulţi ne nicăieri nici nimeni nişte
noastră noastre noi noştri nostru nu ori oricând oricare oricât orice
oricînd oricine oricît oricum oriunde până pe pentru peste pînă poate
pot prea prima primul prin printr sa să săi sale sau său se şi sînt
sîntem sînteţi spre sub sunt suntem sunteţi ta tale tău te ţi ţie
timp tine toată toate tot toţi totuşi tu un una unde undeva unei
unele uneori unor vă vi voastră voastre voi voştri vostru vouă vreo
vreun
""".split())

HUNGARIAN_STOP_SET = frozenset("""
a ahogy ahol aki akik akkor alatt által általában amely amelyek
amelyekben amelyeket amelyet amelynek ami amit amolyan amíg amikor át
abban ahhoz annak arra arról az azok azon azt azzal azért aztán
azután azonban bár be belül benne cikk cikkek cikkeket csak de e
eddig egész egy egyes egyetlen egyéb egyik egyre ekkor el elég ellen
elő először előtt első én éppen ebben ehhez emilyen ennek erre ez
ezt ezek ezen ezzel ezért és fel felé hanem hiszen hogy hogyan igen
így illetve ill ilyen ilyenkor ismét itt jó jól jobban kell kellett
keresztül ki kívül között közül legalább lehet lehetett legyen lenne
lenni lesz lett maga magát majd már más másik meg még mellett mert
mely melyek mi mit míg miért milyen mikor minden mindent mindenki
mindig mint mintha mivel most nagy nagyobb nagyon ne néha nekem neki
nem néhány nélkül nincs olyan ott össze ő ők őket pedig persze rá s
saját sem semmi sok sokat sokkal számára szemben szerint szinte talán
tehát teljes tovább továbbá több úgy ugyanis új újabb újra után utána
utolsó vagy vagyis valaki valami valamint való vagyok van vannak volt
voltam voltak voltunk vissza vele viszont volna
""".split())

DANISH_STOP_SET = frozenset("""
og i jeg det at en den til er som på de med han af for ikke der var
mig sig men et har om vi min havde ham hun nu over da fra du ud sin
dem os op man hans hvor eller hvad skal selv her alle vil blev kunne
ind når være dog noget ville jo deres efter ned skulle denne end dette
mit også under have dig anden hende mine alt meget sit sine vor mod
disse hvis din nogle hos blive mange ad bliver hendes været thi jer
sådan
""".split())

NORWEGIAN_STOP_SET = frozenset("""
og i jeg det at en et den til er som på de med han av ikke der så var
meg seg men ett har om vi min mitt ha hadde hun nå over da ved fra du
ut sin dem oss opp man kan hans hvor eller hva skal selv her alle vil
bli ble blitt kunne inn når være kom noen noe ville deres etter ned
skulle denne for deg si sine sitt mot uten hvordan ingen din ditt blir
samme hvilken mellom vår hver hvem hvis både
""".split())

SWEDISH_STOP_SET = frozenset("""
och det att i en jag hon som han på den med var sig för så till är men
ett om hade de av icke mig du henne då sin nu har inte hans honom
skulle hennes där min man ej vid kunde något från ut när efter upp vi
dem vara vad över än dig kan sina här ha mot alla under någon eller
allt mycket sedan ju denna själv detta åt utan varit hur ingen mitt ni
bli blev oss din dessa några deras blir mina samma vilken er sådan vår
blivit dess inom mellan sådant varför varje vilka ditt vem vilket
sådana vart dina vars vårt våra ert era vilkas
""".split())

TURKISH_STOP_SET = frozenset("""
acaba altı ama ancak arada aslında ayrıca bana bazı belki ben benden
beni benim beri beş bile bin bir biri birkaç birçok birşey biz bizden
bize bizi bizim bu buna bunda bundan bunlar bunları bunların bunu
bunun burada böyle böylece çok çünkü da daha dahi de defa değil diye
diğer dolayı dolayısıyla edecek eden ederek edilecek ediliyor edilmesi
ediyor elli en etmesi etti ettiği ettiğini eğer gibi göre halen hangi
hatta hem henüz hep hepsi her herhangi herkesin hiç hiçbir iki ile
ilgili ise itibaren itibariyle için işte kadar karşın kendi
kendilerine kendini kendisi kendisine kendisini kez ki kim kimden
kime kimi kimse mi mu mü mı nasıl ne neden nedenle nerde nerede
nereye niye niçin o olan olarak oldu olduklarını olduğu olduğunu
olmadı olmadığı olmak olması olmayan olmaz olsa olsun olup olur
olursa oluyor on ona ondan onlar onlardan onları onların onu onun
otuz oysa sanki sekiz sen senden seni senin siz sizden sizi sizin
tarafından tüm var vardı ve veya ya yani yapacak yapılan yapılması
yapıyor yapmak yaptı yaptığı yaptığını yaptıkları yedi yine yirmi
yoksa yüz zaten
""".split())

LANGUAGE_STOP_SETS = {
    "_french_": FRENCH_STOP_SET,
    "_german_": GERMAN_STOP_SET,
    "_spanish_": SPANISH_STOP_SET,
    "_italian_": ITALIAN_STOP_SET,
    "_portuguese_": PORTUGUESE_STOP_SET,
    "_dutch_": DUTCH_STOP_SET,
    "_russian_": RUSSIAN_STOP_SET,
    "_danish_": DANISH_STOP_SET,
    "_norwegian_": NORWEGIAN_STOP_SET,
    "_swedish_": SWEDISH_STOP_SET,
    "_finnish_": FINNISH_STOP_SET,
    "_romanian_": ROMANIAN_STOP_SET,
    "_hungarian_": HUNGARIAN_STOP_SET,
    "_turkish_": TURKISH_STOP_SET,
}


def snowball_stem(language: str):
    """The ``stemmer``/``snowball`` token-filter factory by language
    name (StemmerTokenFilterFactory dispatch)."""
    try:
        return SNOWBALL_STEMMERS[language]
    except KeyError:
        raise ValueError(
            f"unsupported stemmer language {language!r} "
            f"(available: {sorted(SNOWBALL_STEMMERS)})") from None


def _register_language_analyzers():
    from raydex.analysis.extra_filters import (
        FRENCH_ELISION_ARTICLES,
        ITALIAN_ELISION_ARTICLES,
        elision_filter,
    )
    from raydex.analysis.tokenizer import register_analyzer, standard_analyze

    # the reference's French/Italian analyzers run ElisionFilter before
    # stop/stem (FrenchAnalyzer/ItalianAnalyzer createComponents)
    elision_sets = {"french": FRENCH_ELISION_ARTICLES,
                    "italian": ITALIAN_ELISION_ARTICLES}

    for lang, stemfn in SNOWBALL_STEMMERS.items():
        stop = LANGUAGE_STOP_SETS[f"_{lang}_"]
        arts = elision_sets.get(lang)

        if lang == "turkish":
            # TurkishAnalyzer chain: apostrophe filter →
            # turkish_lowercase → stop → snowball (createComponents in
            # the bundled analyzer; the apostrophe filter runs first)
            def analyze(text: str, _stop=stop, _stem=stemfn):
                from raydex.analysis.tokenizer import tokenize
                toks = apostrophe_filter(tokenize(turkish_lowercase(text)))
                return [_stem(t) for t in toks if t not in _stop]
        else:
            def analyze(text: str, _stop=stop, _stem=stemfn,
                        _arts=arts) -> list[str]:
                toks = standard_analyze(text)
                if _arts is not None:
                    toks = elision_filter(toks, _arts)
                return [_stem(t) for t in toks if t not in _stop]

        register_analyzer(lang, analyze)


_register_language_analyzers()


# second snowball tier (catalan/basque/armenian/irish/lithuanian/
# estonian) merges into the same dispatch so snowball_stem() and the
# named stop sets cover all twenty languages
from raydex.analysis import snowball2 as _snowball2  # noqa: E402, F401

# (the merge itself happens at the bottom of snowball2 so either
# import order initializes exactly once)
