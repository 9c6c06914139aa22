"""Second snowball tier: catalan, basque, armenian, irish,
lithuanian, estonian (CommonAnalysisPlugin.java:177-212 registers all
six as bundled analyzers backed by the published Snowball algorithms).

Each stemmer re-implements the published Snowball algorithm's region
definitions and rule ordering with a CONDENSED suffix inventory (the
regular inflection/derivation paradigms; the upstream tables carry
additional rare endings). Documented per function. Stop sets carry the
high-frequency core of the published lists (Analysis.java:101-136).

Merged into the primary registry by raydex/analysis/snowball.py at
import time so ``snowball_stem()`` and the analyzer registry cover all
twenty snowball languages.
"""

from __future__ import annotations

from raydex.analysis.snowball import (
    _ends_any,
    _longest_suffix,
    _rv_romance,
    _std_regions,
)

# -------------------------------------------------------------- catalan

_CA_VOWELS = "aeiouàéèíïóòúü"

_CA_STD_R1 = (
    "atges", "atge", "esos", "eses", "assos", "asses", "istes", "ista",
    "ismes", "isme", "osos", "oses", "osa", "ós", "ives", "iva", "ius",
    "iu", "ics", "iques", "ica", "ic",
)
_CA_STD_R2 = (
    "acions", "ació", "ància", "àncies", "ència", "ències", "ables",
    "able", "ibles", "ible", "itats", "itat", "ments", "ment", "dors",
    "dora", "dores", "dor",
)
_CA_VERB = (
    "aríem", "aríeu", "essin", "éssiu", "éssim", "eixen", "eixes",
    "àvem", "àveu", "arien", "aries",
    "ades", "aven", "aria", "aràs", "arem", "areu", "aran", "eixo",
    "eix", "ava", "ant", "ada", "ats", "aré", "arà", "int", "ides",
    "ida", "its", "uts", "uda", "udes", "és",
    "at", "ir", "it", "ut", "en", "es", "em", "eu", "am",
)
_CA_RESIDUAL = ("os", "a", "e", "i", "í", "ï", "o", "à", "é", "è",
                "ó", "ò", "s")


def stem_catalan(word: str) -> str:
    """Snowball Catalan (condensed): standard suffixes in R1/R2,
    verb suffixes in RV, residual final vowel, ç→c."""
    r1, r2 = _std_regions(word, _CA_VOWELS)
    rv = _rv_romance(word, _CA_VOWELS)
    n0 = len(word)
    s = _longest_suffix(word, _CA_STD_R2, r2)
    if s:
        word = word[: -len(s)]
    else:
        s = _longest_suffix(word, _CA_STD_R1, r1)
        if s:
            word = word[: -len(s)]
    if len(word) == n0:
        s = _longest_suffix(word, _CA_VERB, rv)
        if s:
            word = word[: -len(s)]
    s = _longest_suffix(word, _CA_RESIDUAL, max(rv, 2))
    if s:
        word = word[: -len(s)]
    if word.endswith("ç"):
        word = word[:-1] + "c"
    return word


CATALAN_ELISION_ARTICLES = frozenset(("l", "d", "m", "t", "s", "n"))

CATALAN_STOP_SET = frozenset("""
de es i a o un una unes uns un tot també altre algun alguna alguns
algunes ser és soc ets som esteu està estem esteu estan com en per
perquè per que està sí no nosaltres vosaltres si dins dalt baix més
molt mentre bé coses aquí allà allí el la els les lo los hi ha he
has havia hem haveu han a dins del al d'un d'unes d'uns aquell
aquella aquells aquelles aquest aquesta aquests aquestes meu teu seu
meva teva seva nostre vostre nostra vostra llur qual quals quan quant
on amb sense sota sobre entre fins des contra doncs
""".split())

# --------------------------------------------------------------- basque

_EU_VOWELS = "aeiou"

_EU_CASE = (
    "etako", "etatik", "etara", "arekin", "aren", "etan",
    "ekin", "ean", "eko", "era", "ari", "ara", "tik", "rako",
    "tan", "ko", "ra", "en", "ak", "ek", "ok", "ik", "az", "ez",
    "oz", "an", "a",
)
_EU_DERIV = (
    "tzailea", "tzaile", "tasuna", "tasun", "keria", "garria",
    "garri", "kuntza", "dura", "pena", "pen", "mena", "men",
    "korra", "kor", "tegia", "tegi",
)


def stem_basque(word: str) -> str:
    """Snowball Basque (condensed): declension endings in R1, then
    derivational suffixes in R2, longest-first."""
    r1, r2 = _std_regions(word, _EU_VOWELS)
    s = _longest_suffix(word, _EU_CASE, r1)
    if s and len(word) - len(s) >= 2:
        word = word[: -len(s)]
        r1, r2 = _std_regions(word, _EU_VOWELS)
    s = _longest_suffix(word, _EU_DERIV, r2)
    if s and len(word) - len(s) >= 2:
        word = word[: -len(s)]
    return word


BASQUE_STOP_SET = frozenset("""
al anitz arabera asko baina bat batean batek bati batzuei batzuek
batzuetan batzuk bera beraiek berau berauek bere berori beroriek
beste bezala da dago dira ditu du dute edo egin ere eta eurak ez
gainera gu gutxi guzti haiei haiek haietan hainbeste hala han handik
hango hara hari hark hartan hau hauei hauek hauetan hemen hemendik
hemengo hi hona honek honela honetan honi hor hori horiei horiek
horietan horko horra horrek horrela horretan horri hortik hura izan
ni noiz nola non nondik nongo nor nora ze zein zen zenbait zenbat
zer zergatik ziren zituen zu zuek zuen zuten
""".split())

# ------------------------------------------------------------- armenian

_HY_VOWELS = "աեէըիոօւ"

_HY_CASE = (
    "ներում", "ներին", "ներից", "ներով", "ների", "ները", "ներ",
    "երում", "երին", "երից", "երով", "երի", "երը", "եր",
    "ում", "ին", "ից", "ով", "ի", "ը", "ն",
)
_HY_DERIV = (
    "ությունը", "ության", "ություն", "ական", "ային", "որեն",
    "եղեն", "ավոր",
)


def stem_armenian(word: str) -> str:
    """Snowball Armenian (condensed): declension/plural endings, then
    derivational suffixes, both requiring a 3-letter stem (the
    published algorithm anchors on R2; the regular paradigms here)."""
    s = _ends_any(word, _HY_CASE)
    if s and len(word) - len(s) >= 3:
        word = word[: -len(s)]
    s = _ends_any(word, _HY_DERIV)
    if s and len(word) - len(s) >= 3:
        word = word[: -len(s)]
    return word


ARMENIAN_STOP_SET = frozenset("""
այդ այլ այն այս դու դուք եմ են ենք ես եք է էի էին էինք էիր էիք էր ըստ
թ ի ին իսկ իր կամ համար հետ հետո մենք մեջ մի ն նա նաև նրա նրանք որ որը
որոնք որպես ու ում պիտի վրա և
""".split())

# ---------------------------------------------------------------- irish

_GA_VOWELS = "aeiouáéíóú"

# eclipsis / prothesis patterns: (prefix-to-strip, required-next)
_GA_MUTATIONS = (
    ("bhf", "f"), ("mb", "b"), ("gc", "c"), ("nd", "d"), ("ng", "g"),
    ("bp", "p"), ("dt", "t"), ("ts", "s"),
)

_GA_SUF_R1 = (
    "aíochta", "íochta", "aíocht", "íocht",
    "anna", "acha", "eacha",
    "adh", "eadh", "amh", "eamh", "aithe", "ithe",
)
_GA_SUF_R2 = ("acht", "eacht", "ach", "each", "úil", "iúil", "óir",
              "eoir", "óireacht", "eoireacht")


def stem_irish(word: str) -> str:
    """Snowball Irish (condensed): strip the initial eclipsis/
    t-prothesis mutation, then plural/abstract suffixes in R1 and
    derivational suffixes in R2."""
    # initial mutation: eclipsed consonant (mb- gc- nd- bhf- …) or
    # prothetic t-/h- before s/vowel
    for pre, nxt in _GA_MUTATIONS:
        if word.startswith(pre):
            word = word[len(pre) - len(nxt):]
            break
    else:
        if len(word) > 2 and word[0] == "h" and word[1] in _GA_VOWELS:
            word = word[1:]
        elif word.startswith("n-") or word.startswith("t-"):
            word = word[2:]
    r1, r2 = _std_regions(word, _GA_VOWELS)
    s = _longest_suffix(word, _GA_SUF_R2, r2)
    if s:
        return word[: -len(s)]
    s = _longest_suffix(word, _GA_SUF_R1, r1)
    if s:
        return word[: -len(s)]
    return word


IRISH_STOP_SET = frozenset("""
a ach ag agus an aon ar arna as ba beirt bhúr caoga ceathair ceathrar
chomh chtó chuig chun cois céad cúig cúigear d daichead dar de deich
deichniúr den dhá do don dtí dá dár dó faoi faoin faoina faoinár fara
fiche gach gan go gur haon hocht i iad idir in ina ins inár is le leis
lena lenár m mar mo mé na nach naoi naonúr ná ní níor nó nócha ocht
ochtar os roimh sa seacht seachtar seachtó seasca seisear siad sibh
sinn sna sé sí tar thar thú triúr trí trína trínár tríocha tú um ár é
éis í ó ón óna ónár
""".split())

# ----------------------------------------------------------- lithuanian

_LT_VOWELS = "aeiyouąęėįųū"

_LT_CASE = (
    "iausias", "iausia", "iausi",
    "iuose", "uose", "iams", "omis", "ėmis", "imis", "umis",
    "iais", "ams", "ais", "ose", "ėse", "yse", "oms", "ėms",
    "ims", "ums", "ius", "ios", "ias", "ies", "uje", "oje", "ėje",
    "yje",
    "as", "is", "ys", "us", "ai", "ei", "ui", "io", "ių", "ės",
    "es", "uo", "au", "am", "om", "im", "um", "ie", "os",
    "a", "e", "i", "y", "o", "u", "ą", "ę", "į", "ų", "ė", "ū",
)
_LT_VERB = (
    "tumėte", "tumėme", "damos", "damas", "dama", "dami", "kime",
    "kite", "čiau", "tume", "iau", "ėjo", "avo", "ame", "ime",
    "ate", "ite", "ėte", "si", "ti", "ta", "tas", "me", "te", "ki",
    "tų",
)


def stem_lithuanian(word: str) -> str:
    """Snowball Lithuanian (condensed): longest verb ending then
    longest declension ending, both inside R1."""
    r1, _ = _std_regions(word, _LT_VOWELS)
    n0 = len(word)
    s = _longest_suffix(word, _LT_VERB, r1)
    if s and len(word) - len(s) >= 3:
        word = word[: -len(s)]
    if len(word) == n0:
        s = _longest_suffix(word, _LT_CASE, r1)
        if s and len(word) - len(s) >= 3:
            word = word[: -len(s)]
    return word


LITHUANIAN_STOP_SET = frozenset("""
ant apie ar arba aš be bei bet bus buvo dar dėl gal gali galima iki
yra iš jau ji jis jo jog jos ju jų jūs ką kad kai kaip kas kiek kol
kur kurie kuris man mane manęs mes mus net nei nes nuo o pagal pat
per po prie prieš savo su tačiau tai taip tarp tas tą tik tiktai to
todėl tos tu turi už vis visi viskas visų
""".split())

# ------------------------------------------------------------- estonian

_ET_VOWELS = "aeiouõäöü"

_ET_VERB = (
    "takse", "dakse", "akse", "sime", "site", "sid", "nud", "tud",
    "dud", "mata", "vad", "da", "ma", "b",
)
_ET_CASE = (
    "sse", "ni", "ga", "ta", "st", "le", "lt", "ks", "na", "l", "s",
)
_ET_PLURAL = ("de", "te", "id", "d")


def _et_undouble(w: str) -> str:
    if len(w) > 3 and w[-1] == w[-2] and w[-1] not in _ET_VOWELS:
        return w[:-1]
    return w


def stem_estonian(word: str) -> str:
    """Snowball Estonian (condensed): verb endings, then case
    endings, then plural markers, all in R1; final double consonant
    undoubled."""
    r1, _ = _std_regions(word, _ET_VOWELS)
    s = _longest_suffix(word, _ET_VERB, r1)
    if s and len(word) - len(s) >= 3:
        word = word[: -len(s)]
    else:
        s = _longest_suffix(word, _ET_CASE, r1)
        if s and len(word) - len(s) >= 3:
            word = word[: -len(s)]
        s = _longest_suffix(word, _ET_PLURAL, r1)
        if s and len(word) - len(s) >= 3:
            word = word[: -len(s)]
    return _et_undouble(word)


ESTONIAN_STOP_SET = frozenset("""
aga ei et ja jah kas kui kõik ma me mida midagi mind minu mis mu mul
mulle nad nii oled olen oli olid olnud on pole sa seda see selle
siin siis ta te ära
""".split())

# ------------------------------------------------------------- registry

SNOWBALL2_STEMMERS = {
    "catalan": stem_catalan,
    "basque": stem_basque,
    "armenian": stem_armenian,
    "irish": stem_irish,
    "lithuanian": stem_lithuanian,
    "estonian": stem_estonian,
}

SNOWBALL2_STOP_SETS = {
    "_catalan_": CATALAN_STOP_SET,
    "_basque_": BASQUE_STOP_SET,
    "_armenian_": ARMENIAN_STOP_SET,
    "_irish_": IRISH_STOP_SET,
    "_lithuanian_": LITHUANIAN_STOP_SET,
    "_estonian_": ESTONIAN_STOP_SET,
}


def register_analyzers():
    from raydex.analysis.extra_filters import elision_filter
    from raydex.analysis.tokenizer import register_analyzer, standard_analyze

    for lang, stemfn in SNOWBALL2_STEMMERS.items():
        stop = SNOWBALL2_STOP_SETS[f"_{lang}_"]
        arts = CATALAN_ELISION_ARTICLES if lang == "catalan" else None

        def analyze(text: str, _stop=stop, _stem=stemfn,
                    _arts=arts) -> list[str]:
            toks = standard_analyze(text)
            if _arts is not None:
                toks = elision_filter(toks, _arts)
            return [_stem(t) for t in toks if t not in _stop]

        register_analyzer(lang, analyze)


# merge into the primary dispatch (runs once, whichever module is
# imported first — snowball.py's bottom import lands here)
import raydex.analysis.snowball as _sb  # noqa: E402

_sb.SNOWBALL_STEMMERS.update(SNOWBALL2_STEMMERS)
_sb.LANGUAGE_STOP_SETS.update(SNOWBALL2_STOP_SETS)
register_analyzers()
