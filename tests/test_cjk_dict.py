"""Dictionary-based CJK segmentation (kuromoji / nori / smartcn tier):
lattice Viterbi over bundled lexicons, char-class unknown handling,
analyzer compositions, and phrase retrieval across segmentation.

Reference: plugins/analysis-kuromoji (JapaneseTokenizer lattice),
plugins/analysis-nori (KoreanTokenizer), plugins/analysis-smartcn
(HMMChineseTokenizer)."""

import pyarrow as pa
import pyarrow.parquet as pq

from raydex.analysis.cjk_dict import (
    Lexicon,
    analyze_kuromoji,
    analyze_nori,
    analyze_smartcn,
    char_class,
    register_user_words,
    viterbi_segment,
    word_cost,
)
from raydex.analysis.tokenizer import get_analyzer


def test_golden_vectors_ja():
    # kuromoji parity targets: particles/aux dropped, dictionary words
    # win over single-char decomposition
    assert analyze_kuromoji("東京都に住んでいます") == ["東京", "都", "住ん"]
    assert analyze_kuromoji("日本語のテキストを検索します") == \
        ["日本語", "テキスト", "検索"]
    # katakana run is ONE token (unknown-run grouping) + length stem
    assert analyze_kuromoji("コンピューターで勉強した") == \
        ["コンピュータ", "勉強"]
    # CJKWidthFilter: full-width latin folds to half-width
    assert analyze_kuromoji("ＡＢＣの本") == ["abc", "本"]


def test_golden_vectors_ko():
    assert analyze_nori("한국어를 공부합니다") == ["한국어", "공부"]
    assert analyze_nori("서울에서 친구와 영화를 봅니다") == \
        ["서울", "친구", "영화", "봅니다"]


def test_golden_vectors_zh():
    assert analyze_smartcn("我们在北京学习中文") == \
        ["我们", "北京", "学习", "中文"]
    # OOV han chars fall back to single-char edges (smartcn behavior)
    out = analyze_smartcn("他们喜欢读书和音乐")
    assert "他们" in out and "喜欢" in out and "音乐" in out


def test_mixed_script_and_registry():
    # non-CJK spans run through the standard tokenizer, lowercased
    assert analyze_kuromoji("Ray Dataで日本語を検索") == \
        ["ray", "data", "日本語", "検索"]
    for name in ("kuromoji", "japanese", "nori", "korean", "smartcn"):
        assert get_analyzer(name) is not None


def test_viterbi_prefers_known_words():
    lex = Lexicon({"東京": word_cost(2), "東京大": word_cost(3),
                   "学": word_cost(1)})
    # longest known word wins over decomposition
    assert viterbi_segment("東京大学", lex) == ["東京大", "学"]
    # unknown han chars fall back to single-char edges
    assert viterbi_segment("火水", lex) == ["火", "水"]
    # latin/digit/katakana runs group into ONE unknown token
    assert viterbi_segment("abc12", lex) == ["abc", "12"]


def test_char_class_runs():
    from raydex.analysis.cjk_dict import DIGIT, HAN, HIRAGANA, KATAKANA

    assert char_class("あ") == HIRAGANA
    assert char_class("ア") == KATAKANA
    assert char_class("東") == HAN
    assert char_class("7") == DIGIT
    # digit run inside CJK text is one token
    assert analyze_kuromoji("２０２４年の東京") == ["2024", "年", "東京"]


def test_user_dictionary_extends_lexicon():
    # unseen compound segments char-by-char until registered
    before = analyze_kuromoji("鰻丼")
    assert before == ["鰻", "丼"]
    register_user_words("ja", ["鰻丼"])
    assert analyze_kuromoji("鰻丼") == ["鰻丼"]


def test_phrase_query_matches_across_segmentation(ray_session, tmp_path):
    """A phrase query analyzed with the same dictionary matches the
    consecutive positions the indexed text produced — the retrieval
    contract that bigram-only tokenization breaks."""
    from raydex.index.build import build_index
    from raydex.search.scatter import LocalSearcher

    rows = [
        ("ja/1", "東京都に住んでいます"),
        ("ja/2", "京都に住んでいます"),       # Kyoto, NOT Tokyo
        ("ja/3", "日本語のテキストを検索します"),
        ("ja/4", "コンピューターで勉強した"),
    ]
    t = pa.table({
        "url": pa.array([r[0] for r in rows]),
        "warc_ts": pa.array(list(range(len(rows)))).cast(pa.timestamp("us")),
        "text": pa.array([r[1] for r in rows], pa.large_string()),
    })
    p = str(tmp_path / "ja.parquet")
    pq.write_table(t, p)
    idx = str(tmp_path / "ja_idx")
    build_index(p, idx, num_partitions=1, analyzer="kuromoji",
                store_positions=True)
    s = LocalSearcher(idx)
    # phrase 東京都 -> [東京, 都]: matches ja/1 only (ja/2 has 京都
    # which segments to the DIFFERENT dictionary word 京都)
    hits = s.search_query(
        {"match_phrase": {"text": "東京都"}}, k=10)
    assert [h["url"] for h in hits] == ["ja/1"]
    # term query on a dictionary word
    assert s.count({"term": {"text": "検索"}}) == 1
    assert s.count({"term": {"text": "京都"}}) == 1  # ja/2


def test_icu_analyzer_and_folding():
    from raydex.analysis.icu_stempel import icu_fold, nfkc_cf

    icu = get_analyzer("icu_analyzer")
    # nfkc_cf: full-width latin folds, case folds; CJK runs segment via
    # the dictionary lattice
    assert icu("Ｈéllo Ｗorld 中文文本") == ["héllo", "world", "中文", "文", "本"]
    assert nfkc_cf("ＡＢＣ") == "abc"
    fold = get_analyzer("icu_folding")
    assert fold("Crème Brûlée") == ["creme", "brulee"]
    assert icu_fold("Über") == "uber"


def test_polish_stempel_analyzer():
    from raydex.analysis.icu_stempel import polish_stem

    pl = get_analyzer("polish")
    assert pl("książkami w miastach dobrymi") == ["książk", "miast", "dobr"]
    assert pl("pracował nad nowymi projektami") == \
        ["pracow", "now", "projekt"]
    # inflection family collapses to one stem
    assert polish_stem("książkami") == polish_stem("książkach") == "książk"
    assert get_analyzer("stempel") is not None


def test_ukrainian_analyzer():
    from raydex.analysis.icu_stempel import ukrainian_stem

    uk = get_analyzer("ukrainian")
    assert uk("книжками в містах") == ["книжк", "міст"]
    assert uk("українська мова") == ["українськ", "мов"]
    assert ukrainian_stem("книжками") == ukrainian_stem("книжках") == "книжк"


def test_viterbi_coverage_property():
    """Hypothesis: the lattice path COVERS the input exactly — the
    concatenation of emitted tokens equals the input string for
    arbitrary mixed CJK text (no char lost or duplicated)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from raydex.analysis.cjk_dict import _JA_LEX, _ZH_LEX

    cjk_chars = st.sampled_from(list(
        "東京都日本語検索勉強学校あいうえおかきくけしアイウエオー"
        "中文北京学习我们的了是在有和人一二三鷹鴉"))

    @settings(max_examples=80, deadline=None)
    @given(st.text(alphabet=cjk_chars, min_size=1, max_size=30))
    def check(s):
        for lex in (_JA_LEX, _ZH_LEX):
            assert "".join(viterbi_segment(s, lex)) == s

    check()
