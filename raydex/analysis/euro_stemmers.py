"""Remaining bundled language analyzers: greek, bulgarian, czech,
latvian, galician, brazilian, indonesian, thai, chinese
(CommonAnalysisPlugin.java:177-212).

Algorithms re-implemented from the published descriptions:

- greek      : GreekLowerCaseFilter (accent folding + final sigma) →
  stop(_greek_) → Greek stemmer (condensed Ntais/Saroukos rule set —
  the regular noun/adjective/verb paradigms; the reference's
  GreekStemFilter carries the full exception tables).
- bulgarian  : Nakov's light stemmer shape (BulgarianStemFilter):
  definite-article removal → plural rules → final-vowel trim →
  double-н undoubling.
- czech      : Dolamic & Savoy light stemmer (CzechStemFilter):
  case-suffix removal → possessive removal → palatalization folds.
- latvian    : Lucene LatvianStemmer model: affix list gated by the
  number of vowels that must remain in the stem.
- galician   : minimal (plural-only) stemmer — the reference analyzer
  uses the full RSLP-G GalicianStemFilter; the minimal variant (also
  bundled upstream as GalicianMinimalStemFilter) is what we ship, a
  DOCUMENTED DEVIATION.
- brazilian  : the reference uses the legacy BrazilianStemmer; we
  register the published Snowball Portuguese stemmer over the
  brazilian stop set — same stemming family, DOCUMENTED DEVIATION.
- indonesian : Tala's confix-stripping stemmer (IndonesianStemFilter):
  particles → possessive pronouns → first/second-order prefixes with
  recoding → suffixes, all gated on >2 syllables remaining.
- thai       : the reference ThaiTokenizer is dictionary-based (JDK
  BreakIterator); no dictionary ships in this container, so Thai runs
  are segmented into orthographic syllable clusters (Thai Character
  Cluster rules) — a DOCUMENTED DEVIATION — then stop(_thai_).
- chinese    : StandardAnalyzer + English stop set, verbatim
  (ChineseAnalyzerProvider.java:28 — "old index: best effort").
"""

from __future__ import annotations

import re

from raydex.analysis.tokenizer import (
    ENGLISH_STOP_SET,
    register_analyzer,
    standard_analyze,
    tokenize,
)

# ---------------------------------------------------------------- greek

_EL_FOLD = str.maketrans({
    "ά": "α", "έ": "ε", "ή": "η", "ί": "ι", "ό": "ο", "ύ": "υ",
    "ώ": "ω", "ϊ": "ι", "ΐ": "ι", "ϋ": "υ", "ΰ": "υ", "ς": "σ",
})


def greek_lowercase(text: str) -> str:
    """GreekLowerCaseFilter: lowercase + tonos/dialytika folding +
    final sigma normalization."""
    return text.lower().translate(_EL_FOLD)


# regular paradigm endings, longest first (condensed Ntais rule set)
_EL_SUF = (
    "ομαστε", "ιουνται",
    "ονται", "ουνται", "ομουν", "οσουν", "ιεμαι", "ιεσαι", "ιεται",
    "ουσαν", "ουσεσ",
    "ειτε", "εται", "εσαι", "ομαι", "ουμε", "ουσα", "ηκαν", "ηκεσ",
    "ιουσ", "ικοσ", "ικησ", "ικου", "ικων", "ικεσ", "ικοι", "τερη",
    "τεροσ", "τερο", "τερα",
    "ματα", "ματοσ", "ματων",
    "ουν", "ετε", "αμε", "ατε", "εισ", "ουσ", "εων", "εωσ", "ιου",
    "ιων", "ιεσ", "ιοι", "ηκα", "ικο", "ικα",
    "οσ", "ησ", "εσ", "ων", "ου", "οι", "ασ", "αν", "ει", "ια", "ιο",
    "εσ", "αι",
    "α", "η", "ο", "ι", "ε", "υ", "ω",
)


def greek_stem(word: str) -> str:
    """Condensed Greek stemmer (regular noun/adjective/verb endings,
    longest-first, stem keeps >= 3 characters)."""
    for s in _EL_SUF:
        if word.endswith(s) and len(word) - len(s) >= 3:
            return word[: -len(s)]
    return word


GREEK_STOP_SET = frozenset(greek_lowercase(w) for w in """
ο η το οι τα του τησ των τον την και κι κ ειμαι εισαι ειναι ειμαστε
ειστε στο στον στη στην μα αλλα απο για προσ με σε ωσ παρα αντι κατα
μετα θα να δε δεν μη μην επι ενω εαν αν τοτε που πωσ ποιοσ ποια ποιο
ποιοι ποιεσ ποιων ποιουσ αυτοσ αυτη αυτο αυτοι αυτων αυτουσ αυτεσ
αυτα εκεινοσ εκεινη εκεινο εκεινοι εκεινεσ εκεινα εκεινων εκεινουσ
οπωσ ομωσ ισωσ οσο οτι τισ τουσ στισ στουσ στα στο μια ενα εναν ενασ
ειχε ειχαν οπου εδω εκει
""".split())

# ------------------------------------------------------------ bulgarian

# (article, min stem length left) — the adjectival -ия/-ият forms keep
# a 4-char stem so nouns in -ия (нация) take the final-я path instead,
# keeping the singular/definite family on one stem
_BG_ARTICLES = (("ият", 4), ("ия", 4), ("ът", 3), ("ят", 3),
                ("та", 3), ("то", 3), ("те", 3))
_BG_PLURAL = (("ове", ""), ("еве", "й"), ("ища", ""), ("зи", "г"))


def bulgarian_stem(word: str) -> str:
    """Nakov-style light stemmer (the BulgarianStemFilter shape)."""
    if len(word) < 4:
        return word
    if len(word) > 5 and word.endswith("ища"):
        return word[:-3]
    # definite article
    for a, keep in _BG_ARTICLES:
        if word.endswith(a) and len(word) - len(a) >= keep:
            word = word[: -len(a)]
            break
    # plural
    for suf, rep in _BG_PLURAL:
        if word.endswith(suf) and len(word) - len(suf) + len(rep) >= 3:
            word = word[: -len(suf)] + rep
            break
    if len(word) > 3 and word[-1] == "я":
        word = word[:-1]
    if len(word) > 3 and word[-1] in "аое":
        word = word[:-1]
    if len(word) > 4 and word.endswith("нн"):
        word = word[:-1]
    return word


BULGARIAN_STOP_SET = frozenset("""
а аз ако ала бе без беше би бил била били било благодаря близо бъдат
бъде бяха в вас ваш ваша вероятно вече взема ви вие винаги все всеки
всички всичко всяка във въпреки върху г ги главен глас го д да дали
до докато докога дори досега доста е едва един ето за зад заедно
заради засега затова защо защото и из или им има имат иска й каза
как каква какво както какъв като кога когато което които кой който
колко която къде където към ли м ме между мен ми мнозина мога могат
може моля момента му н на над назад най направи напред например нас
не него нея ни ние никой нито но нужно о около освен особено от
отгоре отново още пак по повече повечето под поне поради после почти
прави пред преди през при пък първо с са само се сега си скоро след
сме според сред срещу сте съм със също т тази така такива такъв там
твой те тези ти то това тогава този той толкова точно трябва тук
тъй тя тях у харесва ч че често чрез ще щом я
""".split())

# ---------------------------------------------------------------- czech

_CS_CASE = (
    "atech",
    "ětem", "etem", "atům",
    "ech", "ich", "ích", "ého", "ěmi", "emi", "ému", "emu", "ěte",
    "ete", "ěti", "eti", "ího", "iho", "ími", "ímu", "imu", "ách",
    "ata", "aty", "ých", "ama", "ami", "ové", "ovi", "ými",
    "em", "es", "ém", "ím", "ům", "at", "ám", "os", "us", "ým",
    "mi", "ou",
    "a", "e", "i", "o", "u", "ů", "y", "á", "é", "í", "ý", "ě",
)

_CS_PALATAL = (("čt", "ck"), ("št", "sk"), ("č", "k"), ("ž", "h"),
               ("c", "k"), ("z", "h"))


def czech_stem(word: str) -> str:
    """Dolamic & Savoy light stemmer: case endings, possessives,
    palatalization folds."""
    # case endings (longest first; keep >= 3-char stem for multi-char
    # suffixes, >= 4 for single vowels — the published length gates)
    for s in _CS_CASE:
        keep = 4 if len(s) == 1 else 3
        if word.endswith(s) and len(word) - len(s) >= keep:
            word = word[: -len(s)]
            break
    # possessives
    for s in ("ov", "ův", "in"):
        if word.endswith(s) and len(word) - len(s) >= 3:
            word = word[: -len(s)]
            break
    # palatalization fold on the exposed stem tail
    for suf, rep in _CS_PALATAL:
        if word.endswith(suf):
            word = word[: -len(suf)] + rep
            break
    return word


CZECH_STOP_SET = frozenset("""
a aby ale ani aniž ano asi až bez bude budem budeš by byl byla byli
bylo být co což cz či článek článku články další dnes do ho i jak jako
je jeho jej její jejich jen ještě ji jiné již jsem jseš jsme jsou jší
k kam každý kde kdo když ke která které kterou který kteří ku ma mají
máte mé mezi mi mít mně mnou můj může my na nad nám námi naproti nás
náš naše nebo nechť nejsou není než nic nich ním nové nový o od ode on
ona oni ono ony osm pak po pod podle pokud potom pouze pozdě pravé pro
proč proto protože první před přede přes při s se sedm si sice skoro
smí smějí snad spolu sta sté sto svůj svých svým svými ta tak také
takže tato tě tedy těma ten tento této tím tímto tipy to tohle toho
tohoto tom tomto tomu tomuto toto tu tuto tvůj ty tyto u už v vám vámi
vás váš vaše ve večer vedle více však všechen vy z za zda zde ze zpět
zprávy že
""".split())

# --------------------------------------------------------------- latvian

_LV_VOWELS = set("aāeēiīouū")

# (affix, vowels that must remain in the stem) — LatvianStemmer model
_LV_AFFIXES = (
    ("ajiem", 3), ("ajai", 3),
    ("ajam", 2), ("ajām", 2), ("ajos", 2), ("ajās", 2), ("iem", 2),
    ("ajā", 2), ("ais", 2), ("ai", 2), ("ei", 2),
    ("ām", 1), ("am", 1), ("ēm", 1), ("īm", 1), ("im", 1), ("um", 1),
    ("us", 1), ("as", 1), ("ās", 1), ("es", 1), ("os", 1), ("ij", 1),
    ("īs", 1), ("ēs", 1), ("is", 1), ("ie", 1),
    ("u", 1), ("a", 1), ("i", 1), ("e", 1), ("ā", 1), ("ē", 1),
    ("ī", 1), ("ū", 1), ("o", 1), ("s", 0), ("š", 0),
)


def _lv_vowel_count(w: str) -> int:
    return sum(1 for c in w if c in _LV_VOWELS)


def latvian_stem(word: str) -> str:
    """Light stemmer for Latvian (the LatvianStemmer model): strip the
    first affix whose removal leaves the required number of vowels."""
    for suf, need in _LV_AFFIXES:
        if word.endswith(suf):
            stem = word[: -len(suf)]
            if len(stem) >= 3 and _lv_vowel_count(stem) >= max(need, 1):
                return stem
    return word


LATVIAN_STOP_SET = frozenset("""
aiz ap ar apakš ārpus augšpus bez caur dēļ gar iekš iz kopš labad lejpus
līdz no otrpus pa par pār pēc pie pirms pret priekš starp šaipus uz viņpus
virs virspus zem apakšpus un bet jo ja ka lai tomēr tikko turpretī arī
kaut gan tādēļ tā ne tikvien vien kā ir te vai kamēr ar diezin droši
diemžēl nebūt ik it taču nu pat tiklab iekšpus nedz tik nevis turpretim
jeb iekam iekām iekāms kolīdz līdzko tiklīdz jebšu tālab tāpēc nekā
itin jā jau jel nē nezin tad tikai vis tak iekams vien būt biju biji
bija bijām bijāt esmu esi esam esat būšu būsi būs būsim būsiet tikt
tiku tiki tika tikām tikāt tieku tiec tiek tiekam tiekat tikšu tiks
tiksim tiksiet tapt tapi tapāt topat tapšu tapsi taps tapsim tapsiet
kļūt kļuvu kļuvi kļuva kļuvām kļuvāt kļūstu kļūsti kļūst kļūstam
kļūstat kļūšu kļūsi kļūs kļūsim kļūsiet varēt varēju varējām varēšu
varēsim var varēji varējāt varēsi varēsiet varat varēja varēs
""".split())

# -------------------------------------------------------------- galician

GALICIAN_STOP_SET = frozenset("""
a aínda alí aquel aquela aquelas aqueles aquilo aquí ao aos as así á
ben cando che co coa comigo con connosco contigo convosco coas cos
cun cunha cunhas cuns da dalgunha dalgunhas dalgún dalgúns das de
del dela delas deles desde deste do dos dun dunha dunhas duns e el
ela elas eles en era eran esa esas ese eses esta estar estaba está
están este estes estiven estou eu é facer foi foron fun había hai
iso isto la las lle lles lo los mais me meu meus min miña miñas moi
na nas neste nin no non nos nosa nosas noso nosos nós nun nunha
nuns nunhas o os ou ó ós para pero pode pois pola polas polo polos
por que se senón ser seu seus sexa sido sobre súa súas tamén tan te
ten teñen teño ter teu teus ti tido tiña tiven túa túas un unha
unhas uns vos vosa vosas voso vosos vós
""".split())


def galician_stem(word: str) -> str:
    """Minimal (plural-only) Galician stemmer — the upstream
    GalicianMinimalStemFilter rules; the reference's `galician`
    analyzer runs the full RSLP-G (documented deviation)."""
    if len(word) < 4 or not word.endswith("s"):
        return word
    if word.endswith("ns"):
        return word[:-2] + "n"
    if word.endswith(("ais", "eis", "ois", "uis")):
        return word[:-2] + "l"
    if word.endswith("és"):
        return word[:-2] + "és"  # invariant
    return word[:-1]

# ------------------------------------------------------------ indonesian

_ID_VOWELS = set("aeiou")


def _id_syllables(w: str) -> int:
    return sum(1 for c in w if c in _ID_VOWELS)


def indonesian_stem(word: str) -> str:
    """Tala's confix-stripping stemmer (the IndonesianStemFilter
    algorithm): particles, possessives, first/second-order prefixes
    with meny-/peny- recoding, then suffixes — each step gated on
    more than two syllables remaining."""
    w = word
    # inflectional particles
    if _id_syllables(w) > 2:
        for s in ("kah", "lah", "pun", "tah"):
            if w.endswith(s):
                w = w[: -len(s)]
                break
    # possessive pronouns
    if _id_syllables(w) > 2:
        for s in ("nya", "ku", "mu"):
            if w.endswith(s):
                w = w[: -len(s)]
                break
    removed_first = False
    if _id_syllables(w) > 2:
        for p in ("meng", "peng", "meny", "peny", "men", "pen", "mem",
                  "pem", "me", "pe", "di", "ter", "ke"):
            if w.startswith(p):
                rest = w[len(p):]
                # morphophonemic recoding (Tala): meny/peny + vowel
                # assimilated an s-initial root; mem/pem + vowel a
                # p-initial root; meng/men are plain strips
                if p in ("meny", "peny") and rest and rest[0] in _ID_VOWELS:
                    rest = "s" + rest
                elif p in ("mem", "pem") and rest and rest[0] in _ID_VOWELS:
                    rest = "p" + rest
                if _id_syllables(rest) >= 2:
                    w = rest
                    removed_first = True
                break
    if not removed_first and _id_syllables(w) > 2:
        for p in ("ber", "per", "bel", "pel", "be", "pe"):
            if w.startswith(p):
                rest = w[len(p):]
                if _id_syllables(rest) >= 2:
                    w = rest
                break
    if _id_syllables(w) > 2:
        for s in ("kan", "an", "i"):
            if w.endswith(s):
                rest = w[: -len(s)]
                if _id_syllables(rest) >= 2:
                    w = rest
                break
    return w


INDONESIAN_STOP_SET = frozenset("""
yang untuk pada ke para namun menurut antara dia dua ia seperti jika
sehingga kembali dan tidak ini karena kepada oleh saat harus sementara
setelah belum kami sekitar bagi serta di dari telah sebagai masih hal
ketika adalah itu dalam bisa bahwa atau hanya kita dengan akan juga ada
mereka sudah saya terhadap secara agar lain anda begitu mengapa kenapa
yaitu yakni daripada itulah lagi maka tentang demi dimana kemana pula
sambil sebelum sesudah supaya guna kah pun sampai sedangkan selagi
sementara tetapi apakah kecuali sebab selain seolah seraya seterusnya
tanpa agak boleh dapat dsb dst dll dahulu dulunya anu demikian tapi
ingin juga nggak mari nanti melainkan oh ok seharusnya sebetulnya
setiap setidaknya sesuatu pasti saja toh ya walau tolong tentu amat
apalagi bagaimanapun
""".split())

# ---------------------------------------------------------------- thai

# Thai orthographic syllable clusters: optional leading vowel, base
# consonant (+ cluster), dependent vowels/tone marks, optional final.
_THAI_RUN = re.compile(r"[฀-๿]+")
_THAI_SYL = re.compile(
    r"[เ-ไ]?"                 # leading vowel e/ae/o/ai/ai
    r"[ก-ฮ](?:[รลว])?"   # base consonant (+ cluster r/l/w)
    r"[ัิ-ฺ็-๎]*"  # above/below vowels + tones
    r"(?:[าำะๅ][ัิ-ฺ็-๎]*)?"  # following vowel
)

_THAI_MARKS = set("ัิีึืฺุู็่้๊๋์ํ๎ะาำๅ")
_THAI_FINALS = set("กงดนบมยวตสษศชญ")
_THAI_LEADING = set("เแโใไ")


def thai_segment(token: str) -> list[str]:
    """Greedy orthographic-cluster segmentation for Thai runs (TCC
    rules) — approximates the reference's dictionary BreakIterator
    tokenizer (documented deviation: no dictionary in container).
    A bare consonant joins the previous cluster as a final only when
    the context shows the next syllable starts after it (end of run,
    a leading vowel, or a consonant that carries its own vowel)."""
    out = []
    i = 0
    n = len(token)
    while i < n:
        m = _THAI_SYL.match(token, i)
        if not (m and m.end() > i):
            out.append(token[i])
            i += 1
            continue
        j = m.end()
        # absorb one final consonant when a new syllable demonstrably
        # starts right after it
        if j < n and token[j] in _THAI_FINALS:
            nxt = j + 1
            starts_new = (
                nxt >= n
                or token[nxt] in _THAI_LEADING
                or (nxt + 1 < n and token[nxt + 1] in _THAI_MARKS)
                or (nxt + 1 == n)
            )
            if starts_new and (nxt >= n or token[nxt] not in _THAI_MARKS):
                j += 1
        out.append(token[i:j])
        i = j
    return out


THAI_STOP_SET = frozenset("""
ที่ การ และ เป็น ของ ใน ให้ ได้ ว่า มี จะ ไม่ ก็ มา ความ กับ แต่ หรือ นี้ นั้น อยู่ อย่าง จาก
ถ้า เมื่อ แล้ว ต้อง ถึง โดย ซึ่ง คือ เพราะ กว่า ทั้ง ตาม แห่ง หาก เขา ผู้ ด้วย จึง ยัง ขึ้น ลง
ไป ทำ ใช้ เรา ฉัน คุณ มัน พวก เพื่อ ต่อ ครั้ง วัน คน อะไร ทุก บาง อื่น เอง ดัง เช่น ๆ
""".split())

# --------------------------------------------------- analyzer assembly


def _mk_stop_stem(stop, stem):
    def analyze(text: str, _stop=stop, _stem=stem) -> list[str]:
        return [_stem(t) for t in tokenize(text.lower()) if t not in _stop]
    return analyze


def _analyze_greek(text: str) -> list[str]:
    toks = tokenize(greek_lowercase(text))
    return [greek_stem(t) for t in toks if t not in GREEK_STOP_SET]


def _analyze_thai(text: str) -> list[str]:
    out = []
    for t in tokenize(text.lower()):
        if _THAI_RUN.fullmatch(t):
            out.extend(s for s in thai_segment(t) if s not in THAI_STOP_SET)
        elif _THAI_RUN.search(t):
            for piece in _THAI_RUN.split(t):
                if piece:
                    out.append(piece)
            for run in _THAI_RUN.findall(t):
                out.extend(s for s in thai_segment(run)
                           if s not in THAI_STOP_SET)
        elif t not in THAI_STOP_SET:
            out.append(t)
    return out


def _register():
    from raydex.analysis.snowball import PORTUGUESE_STOP_SET, stem_portuguese

    register_analyzer("greek", _analyze_greek)
    register_analyzer(
        "bulgarian", _mk_stop_stem(BULGARIAN_STOP_SET, bulgarian_stem))
    register_analyzer("czech", _mk_stop_stem(CZECH_STOP_SET, czech_stem))
    register_analyzer("latvian", _mk_stop_stem(LATVIAN_STOP_SET, latvian_stem))
    register_analyzer(
        "galician", _mk_stop_stem(GALICIAN_STOP_SET, galician_stem))
    register_analyzer(
        "brazilian", _mk_stop_stem(PORTUGUESE_STOP_SET, stem_portuguese))
    register_analyzer(
        "indonesian", _mk_stop_stem(INDONESIAN_STOP_SET, indonesian_stem))
    register_analyzer("thai", _analyze_thai)
    # ChineseAnalyzerProvider: StandardAnalyzer + English stop set
    register_analyzer(
        "chinese", lambda t: standard_analyze(t, stopwords=ENGLISH_STOP_SET))
    # CjkAnalyzerProvider → CJKAnalyzer: width fold → lower → bigram →
    # stop (English core set)
    from raydex.analysis.extra_filters import (
        cjk_bigram_filter,
        cjk_width_filter,
    )

    def _analyze_cjk(text: str) -> list[str]:
        toks = cjk_bigram_filter(cjk_width_filter(tokenize(text.lower())))
        return [t for t in toks if t not in ENGLISH_STOP_SET]

    register_analyzer("cjk", _analyze_cjk)


EURO_STEMMERS = {
    "greek": greek_stem,
    "bulgarian": bulgarian_stem,
    "czech": czech_stem,
    "latvian": latvian_stem,
    "galician": galician_stem,
    "indonesian": indonesian_stem,
}

EURO_STOP_SETS = {
    "_greek_": GREEK_STOP_SET,
    "_bulgarian_": BULGARIAN_STOP_SET,
    "_czech_": CZECH_STOP_SET,
    "_latvian_": LATVIAN_STOP_SET,
    "_galician_": GALICIAN_STOP_SET,
    "_indonesian_": INDONESIAN_STOP_SET,
    "_thai_": THAI_STOP_SET,
}

_register()
