"""Language-tier round-out: the light-stemmer family (arabic, persian,
hindi, bengali, sorani), the European light stemmers (greek, bulgarian,
czech, latvian, galician, indonesian), the second snowball tier
(catalan, basque, armenian, irish, lithuanian, estonian), thai
syllable segmentation, and the chinese/brazilian provider aliases —
completing the reference's bundled analyzer inventory
(CommonAnalysisPlugin.java:177-212).

Goldens are traced through the published algorithm rules as
implemented here and frozen as regression anchors; inflection-family
collapse (several surface forms -> one stem) is the semantic check.
"""

import pytest

from raydex.analysis.euro_stemmers import (
    bulgarian_stem,
    czech_stem,
    galician_stem,
    greek_lowercase,
    greek_stem,
    indonesian_stem,
    latvian_stem,
    thai_segment,
)
from raydex.analysis.light_stemmers import (
    arabic_normalize,
    arabic_stem,
    bengali_stem,
    hindi_normalize,
    hindi_stem,
    persian_normalize,
    sorani_normalize,
    sorani_stem,
)
from raydex.analysis.snowball2 import (
    stem_armenian,
    stem_basque,
    stem_catalan,
    stem_estonian,
    stem_irish,
    stem_lithuanian,
)
from raydex.analysis.tokenizer import get_analyzer

# ------------------------------------------------------ stemmer goldens

GOLDEN = {
    arabic_stem: [
        ("والكتابات", "كتاب"),     # wa+al prefix, -at suffix
        ("المدرسة", "مدرس"),          # al- prefix, teh marbuta
        ("مكتبات", "مكتب"),
    ],
    hindi_stem: [
        ("लडकियां", "लडक"), ("किताबे", "किताब"),
        ("चलकर", "चल"), ("बनाया", "बन"),
    ],
    bengali_stem: [
        ("বইগুলো", "বই"), ("ছেলেরা", "ছেল"),
        ("মানুষের", "মানুষ"),
    ],
    sorani_stem: [
        ("کتێبەکان", "کتێب"), ("ماڵەکە", "ماڵ"),
    ],
    greek_stem: [
        ("εργαζομενοι", "εργαζομεν"), ("πολεισ", "πολ"),
        ("βιβλια", "βιβλ"), ("δικαιωματα", "δικαιω"),
    ],
    bulgarian_stem: [
        ("книгите", "книги"), ("градовете", "град"),
        ("хубава", "хубав"), ("нация", "наци"),
    ],
    czech_stem: [
        ("městech", "měst"), ("knihami", "knih"),
        ("matčin", "matk"), ("filozofové", "filozof"),
    ],
    latvian_stem: [
        ("grāmatas", "grāmat"), ("cilvēkiem", "cilvēk"),
        ("valodās", "valod"),
    ],
    galician_stem: [
        ("camións", "camión"), ("animais", "animal"),
        ("casas", "casa"),
    ],
    indonesian_stem: [
        ("membacakan", "baca"), ("bukunya", "buku"),
        ("memukul", "pukul"), ("penyanyi", "sanyi"),
        ("berjalan", "jalan"),
    ],
    stem_catalan: [
        ("treballadors", "treball"), ("nacionals", "nacional"),
        ("importants", "important"), ("catalanes", "catalan"),
    ],
    stem_basque: [
        ("etxearen", "etxe"), ("liburuetan", "liburu"),
        ("handitasuna", "handitasun"),
    ],
    stem_armenian: [
        ("գրքերը", "գրք"), ("քաղաքներում", "քաղաք"),
    ],
    stem_irish: [
        ("bhfuinneog", "fuinneog"), ("scoileanna", "scoile"),
        ("gcarr", "carr"),
    ],
    stem_lithuanian: [
        ("knygos", "knyg"), ("miestuose", "miest"),
        ("dirbame", "dirb"),
    ],
    stem_estonian: [
        ("raamatutes", "raamatu"), ("linnades", "linna"),
        ("töötasime", "tööta"),
    ],
}


@pytest.mark.parametrize(
    "fn,word,want",
    [(fn, w, s) for fn, pairs in GOLDEN.items() for (w, s) in pairs],
    ids=lambda v: getattr(v, "__name__", str(v)),
)
def test_stemmer_goldens(fn, word, want):
    assert fn(word) == want


def test_family_collapse():
    """Several inflected surface forms must map to ONE stem."""
    assert len({arabic_stem(arabic_normalize(w))
                for w in ("كتاب", "الكتاب", "كتابها")}) == 1
    assert len({hindi_stem(w) for w in ("लडकी", "लडकियां")}) == 1
    assert len({stem_catalan(w)
                for w in ("treballador", "treballadors", "treballadora")}) == 1
    assert len({stem_lithuanian(w) for w in ("knyga", "knygos")}) == 1
    assert len({indonesian_stem(w)
                for w in ("baca", "membaca", "membacakan", "bacaan")}) == 1


# -------------------------------------------------------- normalization

def test_arabic_normalize():
    assert arabic_normalize("أَهْلاً") == "اهلا"  # hamza fold + harakat strip
    assert arabic_normalize("مكتبـــة") == "مكتبه"  # tatweel + teh marbuta


def test_persian_normalize():
    assert persian_normalize("كتاب") == "کتاب"  # arabic kaf -> keheh
    assert persian_normalize("علي") == "علی"        # arabic yeh -> farsi yeh


def test_hindi_normalize():
    # precomposed qa (U+0958) and decomposed ka+nukta both fold to ka
    assert hindi_normalize("क़") == "क"
    assert hindi_normalize("क़") == "क"
    # candrabindu -> anusvara
    assert hindi_normalize("हाँ") == "हां"


def test_sorani_normalize():
    assert sorani_normalize("كتيب") == "کتیب"


def test_greek_lowercase():
    assert greek_lowercase("Ελλάδας") == "ελλαδασ"  # accents + final sigma


# ---------------------------------------------------------------- thai

def test_thai_segmentation():
    assert thai_segment("ประเทศไทย") == ["ประ", "เทศ", "ไทย"]
    toks = get_analyzer("thai")("ภาษาไทยเป็นภาษาที่สวยงาม hello")
    assert "hello" in toks
    assert "ที่" not in toks       # stopword removed
    assert all(t for t in toks)


# ------------------------------------------------------ analyzer wiring

ALL_LANGS = (
    "arabic", "armenian", "basque", "bengali", "brazilian", "bulgarian",
    "catalan", "chinese", "cjk", "czech", "danish", "dutch", "english",
    "estonian", "finnish", "french", "galician", "german", "greek",
    "hindi", "hungarian", "indonesian", "irish", "italian", "latvian",
    "lithuanian", "norwegian", "persian", "portuguese", "romanian",
    "russian", "sorani", "spanish", "swedish", "thai", "turkish",
)


def test_every_reference_language_analyzer_registered():
    """The reference's full bundled language-analyzer inventory
    (CommonAnalysisPlugin.getAnalyzers) resolves and runs here."""
    for lang in ALL_LANGS:
        an = get_analyzer(lang)
        out = an("test 123")
        assert isinstance(out, list), lang


def test_analyzers_stop_and_stem():
    assert get_analyzer("arabic")("الكتاب في المدرسة") == ["كتاب", "مدرس"]
    assert get_analyzer("persian")("کتاب‌های خوب در ايران") == [
        "کتاب", "خوب", "ایران"]
    assert get_analyzer("greek")("Οι εργαζόμενοι στις πόλεις") == [
        "εργαζομεν", "πολ"]
    assert get_analyzer("catalan")(
        "els treballadors de l'administració") == ["treball", "administr"]
    assert get_analyzer("indonesian")(
        "mereka membacakan buku untuk anak") == ["baca", "buku", "anak"]
    # chinese == StandardAnalyzer + English stop set (provider comment:
    # "old index: best effort")
    assert get_analyzer("chinese")("the 中文 analyzer") == [
        "中", "文", "analyzer"]
    # brazilian rides the portuguese snowball stemmer (documented
    # deviation from the legacy BrazilianStemmer)
    assert get_analyzer("brazilian")("os meninos trabalhando") == [
        "menin", "trabalh"]


def test_named_stop_sets_merged():
    from raydex.analysis.euro_stemmers import EURO_STOP_SETS
    from raydex.analysis.light_stemmers import LIGHT_STOP_SETS
    from raydex.analysis.snowball import LANGUAGE_STOP_SETS

    # twenty snowball languages merged into the primary dispatch
    from raydex.analysis.snowball import SNOWBALL_STEMMERS
    assert len(SNOWBALL_STEMMERS) == 20
    for name, st in {**LANGUAGE_STOP_SETS, **LIGHT_STOP_SETS,
                     **EURO_STOP_SETS}.items():
        assert name.startswith("_") and name.endswith("_")
        assert len(st) >= 25, name


def test_snowball_stem_dispatch_covers_new_tier():
    from raydex.analysis.snowball import snowball_stem
    assert snowball_stem("catalan")("nacionals") == "nacional"
    assert snowball_stem("estonian")("linnades") == "linna"
    with pytest.raises(ValueError):
        snowball_stem("klingon")


def test_thai_segment_coverage_property():
    """Hypothesis: Thai orthographic-cluster segmentation covers the
    input exactly (concatenation identity — no char lost/duplicated)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from raydex.analysis.euro_stemmers import thai_segment

    thai_chars = st.sampled_from(list("กขคงจชซทนบปผพมยรลวสหอะาิีุูเแโไ็่้ำ"))

    @settings(max_examples=80, deadline=None)
    @given(st.text(alphabet=thai_chars, min_size=1, max_size=25))
    def check(s):
        assert "".join(thai_segment(s)) == s

    check()
