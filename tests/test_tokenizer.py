from raydex.analysis.tokenizer import (
    ENGLISH_STOP_SET,
    get_analyzer,
    simple_analyze,
    standard_analyze,
    tokenize,
)

# UAX#29 golden cases (FIXTURES.md §4 analysis_golden shapes)
GOLDENS = [
    ("wi-fi", ["wi", "fi"]),
    ("3.14", ["3.14"]),
    ("O'Neil's", ["o'neil's"]),
    ("1,000 items", ["1,000", "items"]),
    ("foo@bar.com", ["foo", "bar.com"]),
    ("https://x.example/path?q=1", ["https", "x.example", "path", "q", "1"]),
    ("foo_bar baz", ["foo_bar", "baz"]),
    ("Hello, World!", ["hello", "world"]),
    ("a,b", ["a", "b"]),
    ("end.", ["end"]),
    ("", []),
    ("   ", []),
]


def test_goldens_standard():
    for text, want in GOLDENS:
        assert standard_analyze(text) == want, text


def test_ideographic_and_katakana():
    # Han/Hiragana one code point per token; Katakana runs stay together
    assert standard_analyze("日本語テキスト") == ["日", "本", "語", "テキスト"]
    assert standard_analyze("これはペンです") == ["こ", "れ", "は", "ペン", "で", "す"]


def test_mixed_scripts():
    assert standard_analyze("abc日本def") == ["abc", "日", "本", "def"]


def test_max_token_length_split():
    tok = "x" * 256
    out = tokenize(tok)
    assert out == ["x" * 255, "x"]


def test_stopwords():
    got = standard_analyze("The quick brown fox and the lazy dog", ENGLISH_STOP_SET)
    assert got == ["quick", "brown", "fox", "lazy", "dog"]
    # stopword-only query analyzes to zero terms
    assert standard_analyze("the and of to", ENGLISH_STOP_SET) == []
    assert len(ENGLISH_STOP_SET) == 33


def test_simple_and_registry():
    assert simple_analyze("Ab3cD ef") == ["ab", "cd", "ef"]
    assert get_analyzer("whitespace")("a  b\tc") == ["a", "b", "c"]
    assert get_analyzer("keyword")("Keep As Is") == ["Keep As Is"]
    assert get_analyzer("standard_en")("the dog") == ["dog"]


def test_none_safe_batch():
    a = get_analyzer("standard")
    assert a.analyze_many(["a b", None, "c"]) == [["a", "b"], [], ["c"]]


def test_metaphone_encoder():
    """Classic Metaphone (round-5): rule-table goldens + the phonetic
    filter's default-encoder switch."""
    from raydex.analysis.extra_filters import metaphone, phonetic_filter

    for w, want in [("metaphone", "MTFN"), ("Knight", "NT"),
                    ("Philip", "FLP"), ("Smith", "SM0"),
                    ("Smyth", "SM0"), ("white", "WT"),
                    ("Xavier", "SFR"), ("school", "SKL"),
                    ("science", "SNS"), ("lodge", "LJ"),
                    ("thought", "0T"), ("lamb", "LM"),
                    ("graduation", "KRTXN")]:
        assert metaphone(w) == want, (w, metaphone(w), want)
    # homophones collapse
    assert metaphone("night") != ""  # smoke
    assert metaphone("wright") == metaphone("rite") == "RT"
    assert phonetic_filter(["Smith"]) == ["SM0"]  # metaphone default
    assert phonetic_filter(["Smith"], encoder="soundex") == ["S530"]
    assert phonetic_filter(["Smith"], replace=False) == ["Smith", "SM0"]
