"""Light stemmers + script normalizers for the non-snowball language
analyzers the reference registers (CommonAnalysisPlugin.java:177-212 —
arabic, persian, hindi, bengali, sorani here; the snowball tier lives
in raydex/analysis/snowball.py).

Each analyzer mirrors the reference chain for that language
(the bundled Lucene analyzer's ``createComponents``):

- ``arabic``  : tokenize → lower → stop(_arabic_) → ArabicNormalization
  → ArabicStem (Larkey/Ballesteros/Connell light-10 stemmer).
- ``persian`` : ZWNJ char filter → tokenize → lower →
  ArabicNormalization → PersianNormalization → stop(_persian_)
  (no stemmer — the reference PersianAnalyzer has none).
- ``hindi``   : tokenize → lower → stop(_hindi_) → IndicNormalization
  → HindiNormalization → HindiStem (Ramanathan & Rao light stemmer).
- ``bengali`` : tokenize → lower → stop(_bengali_) →
  BengaliNormalization → BengaliStem.
- ``sorani``  : tokenize → SoraniNormalization → lower →
  stop(_sorani_) → SoraniStem.

Suffix inventories and normalization maps are re-implemented from the
published algorithm descriptions; where a list is condensed relative
to the upstream resource files this is noted inline. Stop sets carry
the high-frequency core of the published sets (Analysis.java:101-136
named sets resolve to bundled resource files we re-state from the
published lists).
"""

from __future__ import annotations

import unicodedata as _ud

from raydex.analysis.tokenizer import register_analyzer, tokenize

# --------------------------------------------------------------- arabic

# harakat (U+064B..U+0652) + tatweel (U+0640)
_AR_STRIP = {chr(c) for c in range(0x064B, 0x0653)} | {"ـ"}

_AR_NORM = str.maketrans({
    "آ": "ا",  # alef madda -> alef
    "أ": "ا",  # alef hamza above -> alef
    "إ": "ا",  # alef hamza below -> alef
    "ٱ": "ا",  # alef wasla -> alef
    "ى": "ي",  # dotless yeh -> yeh
    "ة": "ه",  # teh marbuta -> heh
})


def arabic_normalize(word: str) -> str:
    """ArabicNormalizer: drop tatweel + harakat, fold alef/yeh/teh
    variants (Larkey et al. normalization step)."""
    w = "".join(c for c in word if c not in _AR_STRIP)
    return w.translate(_AR_NORM)


_AR_PREFIXES = (
    "ال",                # al-
    "وال",          # wal-
    "بال",          # bal-
    "كال",          # kal-
    "فال",          # fal-
    "لل",                # lil-
    "و",                      # wa-
)

_AR_SUFFIXES = (
    "ها",  # -ha
    "ان",  # -an
    "ات",  # -at
    "ون",  # -wn
    "ين",  # -yn
    "يه",  # -yh
    "ية",  # -yp
    "ه",        # -h
    "ة",        # -p
    "ي",        # -y
)


def arabic_stem(word: str) -> str:
    """Light-10 stemmer (Larkey, Ballesteros & Connell 2002), the
    algorithm behind the reference's ArabicStemFilter: strip one
    definite-article/conjunction prefix, then each matching suffix."""
    for p in _AR_PREFIXES:
        if word.startswith(p):
            # waw alone needs >3 remaining; articles need >=2 remaining
            if len(p) == 1 and len(word) > 3:
                word = word[1:]
                break
            if len(p) > 1 and len(word) > len(p) + 1:
                word = word[len(p):]
                break
    for s in _AR_SUFFIXES:
        if word.endswith(s) and len(word) > len(s) + 1:
            word = word[: -len(s)]
    return word


ARABIC_STOP_SET = frozenset("""
من في على الى إلى عن مع هذا هذه ذلك تلك التي الذي الذين ما لا لم لن ان
أن إن كان كانت يكون هو هي هم هن هنا هناك أنا انت أنت نحن قد كل بعض غير
بين حتى إذا اذا ثم أو او أي اي كيف أين اين متى لماذا منذ خلال بعد قبل
عند عندما لكن ليس ولا ولم وهو وهي فيه فيها عليه عليها إليه إليها منه
منها به بها له لها لهم لدى لدي نفسه أيضا ايضا كما بل وقد فقد حيث دون
حول تحت فوق أمام امام وراء ضد عبر إذ اذ إما اما أما لأن لان كي لكي
""".split())

# -------------------------------------------------------------- persian

_FA_NORM = str.maketrans({
    "ي": "ی",  # arabic yeh -> farsi yeh
    "ى": "ی",  # dotless yeh -> farsi yeh
    "ے": "ی",  # yeh barree -> farsi yeh
    "ك": "ک",  # arabic kaf -> keheh
    "ۀ": "ه",  # heh+yeh -> heh
    "ہ": "ه",  # heh goal -> heh
    "ٔ": None,      # hamza above removed
})


def persian_normalize(word: str) -> str:
    """PersianNormalizer (yeh/kaf/heh folding, hamza-above removal);
    runs after arabic_normalize like the reference chain."""
    return word.translate(_FA_NORM)


def persian_char_filter(text: str) -> str:
    """PersianCharFilter: zero-width non-joiner becomes a space."""
    return text.replace("‌", " ")


PERSIAN_STOP_SET = frozenset("""
از به در که را با این آن است برای تا و یا هم نیز اما اگر هر من تو او
ما شما آنها ایشان بود شد می های ها یک دو بر چه چرا کجا کی هیچ همه خود
دیگر باید شاید البته بی بدون مانند مثل فقط پس چون زیرا بین روی زیر
کنار نزد سوی درباره علیه طبق بنابراین سپس هنوز چند چندین کدام چیزی
کسی جایی وقتی حالا اکنون امروز دیروز فردا آنجا اینجا چنین چنان همین
همان غیر ضمن آری بله نه خیر
""".split())

# ---------------------------------------------------------------- hindi

_DEVA_NUKTA = "़"
_DEVA_CANDRABINDU = "ँ"
_DEVA_ANUSVARA = "ं"


def hindi_normalize(word: str) -> str:
    """IndicNormalization + HindiNormalization core: fold nukta
    consonants to their base forms (NFD then nukta removal — the
    precomposed qa/za/rra forms U+0958-095F decompose to base+nukta),
    candrabindu -> anusvara (Ramanathan & Rao normalizations)."""
    w = _ud.normalize("NFD", word).replace(_DEVA_NUKTA, "")
    return _ud.normalize("NFC", w.replace(_DEVA_CANDRABINDU, _DEVA_ANUSVARA))


# Devanagari codepoints used by the suffix inventory
_AA = "ा"   # matra aa
_I = "ि"    # matra i
_II = "ी"   # matra ii
_U = "ु"    # matra u
_UU = "ू"   # matra uu
_RI = "ृ"   # matra vocalic r
_E = "े"    # matra e
_AI = "ै"   # matra ai
_O = "ो"    # matra o
_AU = "ौ"   # matra au
_AN = "ं"   # anusvara
_KA = "क"
_TA = "त"
_NA = "न"
_NI = _NA + _II
_RA = "र"
_YA = "य"
_EN = _E + _AN   # en (matra e + anusvara)
_ON = _O + _AN

# suffix groups by length, longest first (Ramanathan & Rao 2003 light
# stemmer — the HindiStemmer inventory)
_HI_SUF = [
    (_AA + _E + _AN + "ग" + _II,   # aengi
     _AA + _E + _AN + "ग" + _E,    # aenge
     _AA + "ऊ" + _AN + "ग" + _II,
     _AA + "ऊ" + _AN + "ग" + _AA,
     _AA + _I + _YA + _AA + _AN,
     _AA + _I + _YA + _O + _AN),
    (_AA + _E + "ग" + _II,
     _AA + _E + "ग" + _AA,
     _AA + _O + "ग" + _II,
     _AA + _O + "ग" + _E,
     _EN + "ग" + _II,
     _EN + "ग" + _E,
     _UU + _AN + "ग" + _II,
     _UU + _AN + "ग" + _AA,
     _AA + _TA + _II + _AN,
     _NA + _AA + _O + _AN,
     _NA + _AA + _EN,
     _TA + _AA + _O + _AN,
     _TA + _AA + _EN,
     _I + _YA + _AA + _AN,
     _I + _YA + _O + _AN),
    (_AA + _KA + _RA,
     _AA + _I + _E,
     _AA + _II + _AN,
     _AA + _YA + _AA,
     _E + "ग" + _II,
     _E + "ग" + _AA,
     _O + "ग" + _II,
     _O + "ग" + _E,
     _AA + _NA + _E,
     _AA + _NA + _AA,
     _AA + _TA + _E,
     _AA + _TA + _II,
     _AA + _TA + _AA,
     _TA + _II + _AN,
     _AA + _O + _AN,
     _AA + _EN,
     _U + _O + _AN,
     _U + _EN,
     _U + _AA + _AN),
    (_KA + _RA,
     _AA + _O,
     _I + _E,
     _AA + _II,
     _AA + _E,
     _NA + _E,
     _NI,
     _NA + _AA,
     _TA + _E,
     _II + _AN,
     _TA + _II,
     _TA + _AA,
     _AA + _AN,
     _O + _AN,
     _EN),
    (_AA, _I, _II, _U, _UU, _RI, _E, _AI, _O, _AU),
]


def hindi_stem(word: str) -> str:
    """Ramanathan & Rao light stemmer: strip the longest matching
    suffix, gated so at least two characters remain."""
    for group in _HI_SUF:
        for s in group:
            if word.endswith(s) and len(word) > len(s) + 1:
                return word[: -len(s)]
    return word


HINDI_STOP_SET = frozenset("""
के का एक में की है यह और से हैं को पर इस होता कि जो कर मे गया करने किया
लिये अपने ने बनी नहीं तो ही या हो इसका था द्वारा हुआ तक साथ करना वाले
बाद लिए सकते इसके अभी सभी कुछ रहा इसकी सकता रहे उनकी जा ना इसे बहुत वर्ग
कई करें वह वे काफी अपनी उनके थे यदि हुई जब होते कोई हुए व जैसे सबसे
उनको तथा उन पे दो उसके वहाँ अत किसी कहा जाता उस होने अपना उसे
""".split())

# -------------------------------------------------------------- bengali

_BENG_NUKTA = "়"
_BENG_CANDRABINDU = "ঁ"
_BENG_ANUSVARA = "ং"


def bengali_normalize(word: str) -> str:
    """BengaliNormalizer core: fold nukta consonants to base forms
    (NFD + nukta removal — rra/rha/yya U+09DC/09DD/09DF decompose to
    base+nukta), candrabindu -> anusvara."""
    w = _ud.normalize("NFD", word).replace(_BENG_NUKTA, "")
    return _ud.normalize("NFC", w.replace(_BENG_CANDRABINDU, _BENG_ANUSVARA))


# Bengali codepoints for the suffix inventory
_B_E = "ে"    # matra e
_B_I = "ি"    # matra i
_B_O = "ো"    # matra o
_B_R = "র"    # ra
_B_RA = _B_R + "া"
_B_ER = _B_E + _B_R
_B_TA = "টা"
_B_TI = "টি"
_B_TE = "তে"
_B_KE = "কে"
_B_DER = "দের"
_B_DE = "দে"
_B_GULO = "গুলো"
_B_GULI = "গুলি"
_B_KHANA = "খানা"
_B_KHANI = "খানি"
_B_ERA = _B_E + _B_RA
_B_EI = _B_E + _B_I
_B_EO = _B_E + "ও"
_B_YA = "য"

# inflection suffixes, longest first (BengaliStemmer inventory,
# condensed to the high-frequency case/plural/verb endings)
_BN_SUF = [
    (_B_GULO, _B_GULI, _B_KHANA, _B_KHANI),
    (_B_DER, _B_ERA),
    (_B_RA, _B_ER, _B_EI, _B_EO, _B_TA, _B_TI, _B_TE, _B_KE, _B_DE),
    (_B_E, _B_I, _B_R, _B_YA),
]


def bengali_stem(word: str) -> str:
    for group in _BN_SUF:
        for s in group:
            if word.endswith(s) and len(word) > len(s) + 1:
                return word[: -len(s)]
    return word


BENGALI_STOP_SET = frozenset("""
এই যে এবং ও না হয় কি তার সে থেকে করে এর জন্য একটি আর এক তা হবে যা নিয়ে
করা বলে আছে হয়ে এখন আমি আমরা তুমি তোমার আমার তিনি তারা কিন্তু তবে যদি
কোনো কোন সব কেউ কিছু এটি এটা ওই সেই আগে পরে মধ্যে দিয়ে হতে ছিল ছিলেন
করতে করেন হয়েছে বলেন আবার অনেক খুব শুধু যখন তখন কারণ যেমন কেন কোথায়
কীভাবে হ্যাঁ উপর নিচে কাছে দূরে প্রতি আজ কাল গিয়ে এসে
""".split())

# --------------------------------------------------------------- sorani

_CKB_NORM = str.maketrans({
    "ي": "ی",  # arabic yeh -> farsi yeh
    "ى": "ی",  # dotless yeh -> farsi yeh
    "ك": "ک",  # kaf -> keheh
    "ھ": "ه",  # heh doachashmee -> heh
    "ة": "ە",  # teh marbuta -> ae
})


def sorani_normalize(word: str) -> str:
    """SoraniNormalizer: yeh/kaf/heh folding, teh marbuta -> ae,
    diacritic/tatweel/ZWNJ removal."""
    w = word.translate(_CKB_NORM)
    return "".join(c for c in w if c not in _AR_STRIP and c != "‌")


_CKB_AE = "ە"      # ae
_CKB_KAN = "کان"
_CKB_KE = "ک" + _CKB_AE
_CKB_EWE = _CKB_AE + "و" + _CKB_AE
_CKB_DA = "دا"
_CKB_RA = "را"
_CKB_MAN = "مان"
_CKB_TAN = "تان"
_CKB_YAN = "یان"
_CKB_EK = "ێک"
_CKB_YEK = "ی" + _CKB_AE + "ک"

# morpheme classes stripped in sequence (SoraniStemmer inventory):
# clitics/postpositions, definite plural, definite/indefinite singular
_CKB_SUF_ROUNDS = (
    (_CKB_EWE, _CKB_DA, _CKB_RA, _CKB_MAN, _CKB_TAN, _CKB_YAN),
    (_CKB_AE + _CKB_KAN, _CKB_KAN),
    (_CKB_AE + _CKB_KE, _CKB_KE, _CKB_EK, _CKB_YEK),
    (_CKB_AE,),
)


def sorani_stem(word: str) -> str:
    for round_sufs in _CKB_SUF_ROUNDS:
        for s in round_sufs:
            if word.endswith(s) and len(word) > len(s) + 1:
                word = word[: -len(s)]
                break
    return word


SORANI_STOP_SET = frozenset("""
لە بە کە و بۆ ئەم ئەو لەگەڵ وەک هەر چی بەڵام ئەگەر دوای پێش ناو سەر ژێر
لای نێوان هەموو هیچ هەندێک ئێمە ئێوە ئەوان من تۆ ئەویش یان نە بەر دژی
لەسەر لەژێر لەناو لەلای بەبێ بەپێی لەبەر چونکە کاتێک ئینجا پاشان
هەروەها بەڵکو تەنها زۆر کەم ئەمە ئەوە ئایا چۆن کوێ کەی بۆچی
""".split())

# --------------------------------------------------- analyzer assembly


def _analyze_arabic(text: str) -> list[str]:
    out = []
    for t in tokenize(text.lower()):
        if t in ARABIC_STOP_SET:
            continue
        out.append(arabic_stem(arabic_normalize(t)))
    return out


def _analyze_persian(text: str) -> list[str]:
    out = []
    for t in tokenize(persian_char_filter(text).lower()):
        w = persian_normalize(arabic_normalize(t))
        if w and w not in PERSIAN_STOP_SET:
            out.append(w)
    return out


def _analyze_hindi(text: str) -> list[str]:
    out = []
    for t in tokenize(text.lower()):
        if t in HINDI_STOP_SET:
            continue
        out.append(hindi_stem(hindi_normalize(t)))
    return out


def _analyze_bengali(text: str) -> list[str]:
    out = []
    for t in tokenize(text.lower()):
        if t in BENGALI_STOP_SET:
            continue
        out.append(bengali_stem(bengali_normalize(t)))
    return out


def _analyze_sorani(text: str) -> list[str]:
    out = []
    for t in tokenize(text.lower()):
        w = sorani_normalize(t)
        if w and w not in SORANI_STOP_SET:
            out.append(sorani_stem(w))
    return out


LIGHT_STEMMERS = {
    "arabic": arabic_stem,
    "hindi": hindi_stem,
    "bengali": bengali_stem,
    "sorani": sorani_stem,
}

LIGHT_STOP_SETS = {
    "_arabic_": ARABIC_STOP_SET,
    "_persian_": PERSIAN_STOP_SET,
    "_hindi_": HINDI_STOP_SET,
    "_bengali_": BENGALI_STOP_SET,
    "_sorani_": SORANI_STOP_SET,
}


def _register():
    register_analyzer("arabic", _analyze_arabic)
    register_analyzer("persian", _analyze_persian)
    register_analyzer("hindi", _analyze_hindi)
    register_analyzer("bengali", _analyze_bengali)
    register_analyzer("sorani", _analyze_sorani)


_register()
