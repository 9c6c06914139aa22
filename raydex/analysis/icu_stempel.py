"""ICU + stempel analyzer packs — the last two named analysis plugins.

Reference: ``plugins/analysis-icu`` (ICUNormalizer2CharFilter with the
``nfkc_cf`` normalizer, ``icu_tokenizer`` = UAX#29 with
dictionary-based segmentation for CJK runs, ``icu_folding``) and
``plugins/analysis-stempel`` (Polish analyzer: stop filter + the
Stempel algorithmic stemmer).

raydex mapping (documented deviations — both plugins delegate to
multi-megabyte ICU / trained-stemmer-table artifacts):

- ``icu_analyzer``: NFKC case-fold normalization via
  ``unicodedata.normalize("NFKC", s).casefold()`` (the published
  nfkc_cf definition), then UAX#29 tokenization with CJK runs
  segmented by the dictionary lattice of ``raydex.analysis.cjk_dict``
  (ICU's dictionary-based break iterator role).
- ``icu_folding``: NFKC + casefold + combining-mark strip (the
  foldings the ICU transform applies that are expressible without the
  ICU data files).
- ``polish`` / ``stempel``: tokenize → lower → stop(_polish_) → a
  light Polish suffix stemmer re-implemented from the published
  light-stemming rule inventories for Polish (noun/adjective case
  endings, diminutives, verb endings) — the trained Stempel table is
  a binary artifact; the light rules cover the inflection families
  retrieval needs.
"""

from __future__ import annotations

import unicodedata as _ud

from raydex.analysis.tokenizer import register_analyzer, tokenize


def nfkc_cf(text: str) -> str:
    """The nfkc_cf normalizer: NFKC + Unicode case folding."""
    return _ud.normalize("NFKC", text).casefold()


def icu_fold(token: str) -> str:
    """icu_folding token filter (data-file-free subset): NFKC +
    casefold + strip combining marks (accent folding)."""
    d = _ud.normalize("NFD", nfkc_cf(token))
    return _ud.normalize("NFC",
                         "".join(c for c in d if not _ud.combining(c)))


def _analyze_icu(text: str) -> list[str]:
    from raydex.analysis.cjk_dict import _CJK_RUN, _ZH_LEX, viterbi_segment

    text = nfkc_cf(text)
    out: list[str] = []
    pos = 0
    for m in _CJK_RUN.finditer(text):
        if m.start() > pos:
            out.extend(tokenize(text[pos:m.start()]))
        out.extend(viterbi_segment(m.group(), _ZH_LEX))
        pos = m.end()
    if pos < len(text):
        out.extend(tokenize(text[pos:]))
    return out


def _analyze_icu_folding(text: str) -> list[str]:
    return [icu_fold(t) for t in _analyze_icu(text)]


# ------------------------------------------------------------- polish

POLISH_STOP_SET = frozenset("""
i a w z na do nie to się jest że o jak po co tak za od ale przez być
przy czy dla ich go jego jej tym tego ten ta te już tylko może bardzo
gdy kiedy tu tam nas nam was wam mnie ciebie oraz lub albo ani bez
pod nad między który która które którego której był była było były
byli będzie są mam masz ma mamy macie mają też więc jednak natomiast
""".split())

# light Polish suffix inventory, longest-first (case endings,
# adjectival endings, common verb endings, diminutive plurals)
_PL_SUFFIXES = (
    "owania", "owanie", "owaniu", "owałem", "owałeś",
    "ościach", "ościami", "ością", "ości",
    "owie", "ówka", "ówki", "ówce",
    "ymi", "imi", "ach", "ami", "iach", "iami",
    "emu", "ego", "iej", "ej", "ych", "ich",
    "ować", "uje", "ujesz", "ujemy", "ujecie", "ują",
    "anie", "enie", "aniu", "eniu",
    "ała", "ało", "ały", "ali", "ał",
    "iła", "iło", "iły", "ili", "ił",
    "om", "ów", "ie", "ia", "iu", "ią",
    "a", "ę", "ą", "e", "i", "o", "u", "y",
)
_PL_MIN_STEM = 3


def polish_stem(token: str) -> str:
    """One pass, longest matching suffix, stem stays >= 3 chars —
    the light-stemming convention the reference's non-trained light
    stemmers share (e.g. LightStemmer family)."""
    for suf in sorted(_PL_SUFFIXES, key=len, reverse=True):
        if token.endswith(suf) and len(token) - len(suf) >= _PL_MIN_STEM:
            return token[: -len(suf)]
    return token


def _analyze_polish(text: str) -> list[str]:
    return [polish_stem(t) for t in tokenize(text.lower())
            if t not in POLISH_STOP_SET]


register_analyzer("icu_analyzer", _analyze_icu)
register_analyzer("icu_folding", _analyze_icu_folding)
register_analyzer("polish", _analyze_polish)
register_analyzer("stempel", _analyze_polish)


# ---------------------------------------------------------- ukrainian

# plugins/analysis-ukrainian (UkrainianAnalyzer: stop + the
# morfologik-ukrainian dictionary stemmer — a binary artifact; light
# suffix rules stand in, same convention as the polish tier above)
UKRAINIAN_STOP_SET = frozenset("""
і в на з до не що це як та але за від по у й чи для про так же ми ви
вони він вона воно його її їх цей ця це ці той та те ті був була було
були бути є буде мати має можна треба вже тільки дуже коли де хто
також або ні аби б би яких який яка яке які себе собі нас вам
""".split())

_UK_SUFFIXES = (
    "ами", "ями", "ові", "еві", "єві", "ого", "ього", "ому", "ьому",
    "ації", "ація", "ацію", "ацій",
    "ість", "ості", "істю",
    "ував", "ювал", "ував", "увати", "ювати",
    "ення", "ання", "ення", "іння",
    "ах", "ях", "ів", "їв", "ом", "ем", "єм", "ою", "ею", "єю",
    "ий", "ій", "их", "іх", "им", "ім", "ими", "іми",
    "а", "я", "о", "е", "є", "у", "ю", "и", "і", "ї", "ь",
)
_UK_MIN_STEM = 3


def ukrainian_stem(token: str) -> str:
    for suf in sorted(_UK_SUFFIXES, key=len, reverse=True):
        if token.endswith(suf) and len(token) - len(suf) >= _UK_MIN_STEM:
            return token[: -len(suf)]
    return token


def _analyze_ukrainian(text: str) -> list[str]:
    return [ukrainian_stem(t) for t in tokenize(text.lower())
            if t not in UKRAINIAN_STOP_SET]


register_analyzer("ukrainian", _analyze_ukrainian)
