"""Dictionary-based CJK segmentation — the kuromoji / nori / smartcn
analyzer tier.

Reference architecture: ``plugins/analysis-kuromoji/src/main/java/org/
elasticsearch/index/analysis/KuromojiAnalyzerProvider.java`` (Lucene's
``JapaneseTokenizer``: a dictionary lattice over the input with a
minimum-cost Viterbi path, unknown words grouped by character class),
``plugins/analysis-nori`` (``KoreanTokenizer``, same lattice design
over a Korean dictionary with particle/ending decomposition) and
``plugins/analysis-smartcn`` (``HMMChineseTokenizer``, a hidden-Markov
word segmenter). All three delegate the algorithm to Lucene jars; the
published design is the MeCab-style lattice: every dictionary word
starting at every offset becomes a lattice edge with a cost, unknown
characters contribute class-dependent fallback edges, and the emitted
segmentation is the minimum-total-cost path (Kudo et al., "Applying
Conditional Random Fields to Japanese Morphological Analysis", and the
MeCab/kuromoji documentation).

raydex implementation — a from-scratch unigram-cost lattice:

* bundled compact lexicons (common vocabulary + function words) stand
  in for the MeCab/UniDic, mecab-ko-dic and smartcn binary
  dictionaries, which are multi-megabyte artifacts this container does
  not ship. DOCUMENTED DEVIATION: segmentation quality tracks the
  bundled lexicon; the algorithm (lattice + Viterbi over word costs +
  char-class unknown handling) is the reference one, and
  ``register_user_words`` extends the lexicon at runtime exactly like
  the reference's ``user_dictionary`` analyzer setting.
* connection costs are folded into unigram word costs (a unigram
  language model rather than the reference's bigram left/right
  connection matrix) — the standard simplification when no trained
  connection matrix is available.
* unknown-word handling mirrors kuromoji's character-class groups:
  KATAKANA / LATIN / DIGIT runs become one candidate token each, HAN /
  HIRAGANA / HANGUL fall back to single-character edges that known
  words out-compete.

Post-filters per analyzer follow the reference analyzer compositions:
kuromoji = tokenize → CJK-width fold → part-of-speech drop (particles
and auxiliaries, approximated by the bundled function-word sets) →
katakana-length stem (``JapaneseKatakanaStemFilter``: strip a trailing
prolonged-sound mark from katakana of length > 3) → lowercase.
nori = tokenize → particle (josa/eomi) drop → lowercase.
smartcn = tokenize → stop (punctuation + 的/了-class function words)
→ lowercase.
"""

from __future__ import annotations

import re
import unicodedata

from raydex.analysis.tokenizer import register_analyzer, tokenize

# ---------------------------------------------------------------------------
# character classes (kuromoji UnknownDictionary's char-class groups)
# ---------------------------------------------------------------------------

HIRAGANA, KATAKANA, HAN, HANGUL, LATIN, DIGIT, OTHER = range(7)

import numpy as _np


def _build_class_lut() -> "_np.ndarray":
    """Char-class lookup table over the BMP+SMP (one numpy gather per
    input string instead of a Python call per char — the lattice's
    hottest helper)."""
    lut = _np.full(0x110000, OTHER, dtype=_np.uint8)
    # alphabetic/digit below the CJK blocks (LATIN class)
    for i in range(0x3000):
        c = chr(i)
        if c.isdigit():
            lut[i] = DIGIT
        elif c.isalpha():
            lut[i] = LATIN
    lut[0x3040:0x30A0] = HIRAGANA
    lut[0x30A0:0x3100] = KATAKANA
    lut[0x31F0:0x3200] = KATAKANA
    lut[0xFF70] = KATAKANA
    lut[0x4E00:0xA000] = HAN
    lut[0x3400:0x4DC0] = HAN
    lut[0xAC00:0xD7B0] = HANGUL
    lut[0x1100:0x1200] = HANGUL
    return lut


_CLASS_LUT = _build_class_lut()


def char_class(ch: str) -> int:
    return int(_CLASS_LUT[ord(ch)])


# one-token-per-run classes (kuromoji groups katakana/latin/digit runs)
_RUN_CLASSES = {KATAKANA, LATIN, DIGIT}

# unknown-edge costs per class: single-char fallback for the classes a
# dictionary should cover (HAN/HIRAGANA/HANGUL); whole-run token for
# the grouped classes. Known words must out-compete decomposition:
# a 2-char dictionary word (~700) beats two single-char unknowns
# (2 x 1600).
_UNK_SINGLE_COST = 1600.0
_UNK_RUN_COST = 900.0


def word_cost(length: int, bonus: float = 0.0) -> float:
    """Unigram cost of a known dictionary word: longer words cheaper
    per character so the lattice prefers maximal known units, as the
    trained dictionaries do."""
    return max(200.0, 1000.0 - 180.0 * min(length, 4)) - bonus


class Lexicon:
    """Prefix-bucketed dictionary: first char -> [(word, cost, len) ...]
    (longest-first). max word length bounds the lattice fan-out."""

    def __init__(self, words: dict[str, float]):
        self.by_first: dict[str, list[tuple[str, float, int]]] = {}
        self.max_len = 1
        for w, c in words.items():
            self.by_first.setdefault(w[0], []).append((w, c, len(w)))
            self.max_len = max(self.max_len, len(w))
        for lst in self.by_first.values():
            lst.sort(key=lambda wc: -wc[2])

    def add(self, word: str, cost: float | None = None) -> None:
        c = word_cost(len(word), bonus=200.0) if cost is None else cost
        self.by_first.setdefault(word[0], []).append((word, c, len(word)))
        self.by_first[word[0]].sort(key=lambda wc: -wc[2])
        self.max_len = max(self.max_len, len(word))

    def candidates(self, s: str, i: int):
        for w, c, _l in self.by_first.get(s[i], ()):
            if s.startswith(w, i):
                yield w, c


def viterbi_segment(s: str, lex: Lexicon) -> list[str]:
    """Minimum-cost lattice path over one text run (the MeCab/kuromoji
    Viterbi). O(n * max_word_len)."""
    n = len(s)
    INF = float("inf")
    best = [INF] * (n + 1)
    best[0] = 0.0
    back: list[tuple[int, str] | None] = [None] * (n + 1)
    # one numpy gather classifies the whole string
    classes = _CLASS_LUT[
        _np.frombuffer(s.encode("utf-32-le"), dtype=_np.uint32)
    ].tolist()
    by_first = lex.by_first
    startswith = s.startswith
    for i in range(n):
        bi = best[i]
        if bi == INF:
            continue
        # dictionary edges (inlined candidate scan, no generator)
        lst = by_first.get(s[i])
        if lst is not None:
            for w, c, lw in lst:
                if startswith(w, i):
                    j = i + lw
                    nc = bi + c
                    if nc < best[j]:
                        best[j] = nc
                        back[j] = (i, w)
        # unknown edges
        cls = classes[i]
        if cls in _RUN_CLASSES:
            j = i + 1
            while j < n and classes[j] == cls:
                j += 1
            cost = bi + _UNK_RUN_COST + 50.0 * (j - i)
            if cost < best[j]:
                best[j] = cost
                back[j] = (i, s[i:j])
        else:
            cost = bi + _UNK_SINGLE_COST
            if cost < best[i + 1]:
                best[i + 1] = cost
                back[i + 1] = (i, s[i])
    out: list[str] = []
    j = n
    while j > 0:
        i, w = back[j]  # type: ignore[misc]
        out.append(w)
        j = i
    out.reverse()
    return out


# ---------------------------------------------------------------------------
# bundled lexicons (public common vocabulary; the user_dictionary
# analyzer setting extends them via register_user_words)
# ---------------------------------------------------------------------------

# Japanese: function words get a strong bonus so attachment points
# segment correctly (the POS-informed costs of the real dictionary).
_JA_PARTICLES = (
    "は が を に で と の も へ や から まで より ね よ か な ば "
    "ので のに だけ しか でも こそ など って ながら たり".split())
_JA_AUX = (
    "ます です でした ました ません だ である いる ある する します "
    "した して し いた いて なる なった ている ていた れる られる "
    "せる させる たい ない なかった う よう だろう でしょう て い "
    "た".split())
_JA_WORDS = (
    "日本 日本語 東京 京都 大阪 学校 大学 学生 先生 会社 会社員 仕事 "
    "図書館 電車 新幹線 駅 空港 飛行機 自動車 車 道 町 都市 都 県 市 "
    "国 世界 言葉 言語 文章 文字 辞書 辞典 新聞 雑誌 本 映画 音楽 歌 "
    "写真 絵 色 水 火 山 川 海 空 天気 雨 雪 風 花 木 森 犬 猫 鳥 魚 "
    "肉 野菜 果物 料理 食事 朝 昼 夜 今日 明日 昨日 今 時間 時 分 秒 "
    "年 月 日 週 私 僕 君 彼 彼女 人 人々 家族 父 母 兄 弟 姉 妹 子供 "
    "友達 住ん 住む 行く 行き 行った 来る 来た 食べ 食べる 飲む 飲み "
    "読む 読み 読んで 書く 書き 話す 話し 聞く 聞き 見る 見て 買う "
    "買い 使う 使い 作る 作り 働く 働き 勉強 研究 検索 索引 情報 技術 "
    "電話 電気 計算 計算機 機械 問題 質問 答え 意味 名前 番号 数 "
    "多い 少ない 大きい 小さい 高い 安い 新しい 古い 良い 悪い 早い "
    "遅い 面白い 難しい 簡単 きれい 静か 元気 有名 大切 大丈夫".split())

_KO_JOSA = (
    "은 는 이 가 을 를 에 에서 의 와 과 로 으로 도 만 까지 부터 에게 "
    "한테 보다 처럼 같이 라고 고 며 거나 든지".split())
_KO_ENDINGS = (
    "합니다 입니다 습니다 있습니다 없습니다 했습니다 됩니다 합니까 "
    "입니까 하고 하는 해서 하면 하지 이다 있다 없다 했다 된다 "
    "어요 아요 여요 예요 이에요 세요 네요 군요 지요".split())
_KO_WORDS = (
    "한국 한국어 서울 부산 일본 중국 미국 영어 중국어 일본어 학교 "
    "대학 대학교 학생 선생님 교수 회사 회사원 일 직업 도서관 책 "
    "사전 신문 잡지 영화 음악 노래 사진 그림 시간 오늘 내일 어제 "
    "지금 아침 점심 저녁 밤 년 월 일 주 시 분 초 사람 사람들 가족 "
    "아버지 어머니 형 동생 누나 언니 친구 아이 남자 여자 나 저 너 "
    "우리 그 그녀 이것 그것 저것 무엇 누구 어디 언제 왜 어떻게 물 "
    "불 산 강 바다 하늘 날씨 비 눈 바람 꽃 나무 개 고양이 새 물고기 "
    "고기 야채 과일 요리 식사 밥 집 방 문 창문 길 도시 나라 세계 "
    "말 언어 글 글자 이름 번호 숫자 문제 질문 대답 의미 정보 기술 "
    "전화 컴퓨터 인터넷 검색 색인 공부 연구 살고 살다 삽니다 가다 "
    "갑니다 오다 옵니다 먹다 먹습니다 마시다 읽다 읽습니다 쓰다 "
    "말하다 듣다 보다 봅니다 사다 팔다 만들다 일하다 좋다 나쁘다 "
    "크다 작다 많다 적다 새롭다 오래되다 빠르다 느리다 어렵다 쉽다".split())

_ZH_STOP = set("的 了 着 呢 吗 吧 啊 嘛 哦 呀 和 与 或 而 就 都 也 "
               "很 在 是 有 个 之 其 此 这 那".split())
_ZH_WORDS = (
    "中国 中文 北京 上海 广州 深圳 香港 台湾 日本 美国 英国 法国 德国 "
    "我们 你们 他们 她们 自己 大家 什么 怎么 为什么 哪里 哪个 这个 "
    "那个 这里 那里 现在 今天 明天 昨天 时候 时间 小时 分钟 年 月 日 "
    "星期 没有 可以 可能 应该 需要 必须 知道 认识 觉得 认为 希望 喜欢 "
    "爱 想 要 会 能 说 讲 听 看 读 写 学 学习 学生 学校 大学 老师 "
    "教授 同学 朋友 家人 父亲 母亲 爸爸 妈妈 哥哥 弟弟 姐姐 妹妹 "
    "孩子 男人 女人 人们 工作 公司 商店 医院 银行 图书馆 书 词典 "
    "报纸 杂志 电影 音乐 歌 照片 画 电话 电脑 计算机 手机 网络 互联网 "
    "搜索 索引 信息 技术 问题 答案 意思 名字 号码 数字 语言 文字 文章 "
    "国家 世界 城市 地方 东西 事情 因为 所以 但是 如果 虽然 然后 还有 "
    "已经 正在 一起 非常 真 太 水 火 山 河 海 天 天气 雨 雪 风 花 树 "
    "狗 猫 鸟 鱼 肉 菜 水果 饭 吃 喝 买 卖 做 来 去 回 走 跑 坐 住 "
    "大 小 多 少 高 低 新 旧 好 坏 快 慢 难 容易 漂亮 安静 有名 重要".split())


def _build_lexicon(words, function_words=(), endings=()) -> Lexicon:
    lx: dict[str, float] = {}
    for w in words:
        lx[w] = word_cost(len(w))
    for w in function_words:
        lx[w] = min(lx.get(w, 1e9), 250.0 + 30.0 * len(w))
    for w in endings:
        lx[w] = min(lx.get(w, 1e9), 350.0 + 30.0 * len(w))
    return Lexicon(lx)


_JA_LEX = _build_lexicon(_JA_WORDS, _JA_PARTICLES, _JA_AUX)
_KO_LEX = _build_lexicon(_KO_WORDS, _KO_JOSA, _KO_ENDINGS)
_ZH_LEX = _build_lexicon(_ZH_WORDS, _ZH_STOP)

_JA_DROP = frozenset(_JA_PARTICLES) | frozenset(_JA_AUX)
_KO_DROP = frozenset(_KO_JOSA) | frozenset(_KO_ENDINGS)
_ZH_DROP = frozenset(_ZH_STOP)


def register_user_words(lang: str, words: list[str]) -> None:
    """The ``user_dictionary`` analyzer setting: add words to the
    bundled lexicon (they get a bonus cost so they win ties against
    built-in decompositions, like the reference's user entries)."""
    lex = {"ja": _JA_LEX, "ko": _KO_LEX, "zh": _ZH_LEX}[lang]
    for w in words:
        lex.add(w)


# ---------------------------------------------------------------------------
# analyzers
# ---------------------------------------------------------------------------

_CJK_RUN = re.compile(
    "[぀-ヿㇰ-ㇿ㐀-䶿一-鿿"
    "가-힯ᄀ-ᇿー]+")


def _width_fold(s: str) -> str:
    """CJKWidthFilter: full-width ASCII -> half-width, half-width
    katakana -> full-width (NFKC covers both)."""
    return unicodedata.normalize("NFKC", s)


_KATAKANA_RX = re.compile("^[゠-ヿー]+$")


def _katakana_stem(tok: str) -> str:
    """JapaneseKatakanaStemFilter: strip one trailing prolonged-sound
    mark from katakana tokens longer than 3 chars."""
    if len(tok) > 3 and tok.endswith("ー") and _KATAKANA_RX.match(tok):
        return tok[:-1]
    return tok


def _segmenting_analyzer(lex: Lexicon, drop: frozenset,
                         katakana_stem: bool = False):
    def analyze(text: str) -> list[str]:
        text = _width_fold(text)
        out: list[str] = []
        pos = 0
        for m in _CJK_RUN.finditer(text):
            if m.start() > pos:
                out.extend(tokenize(text[pos:m.start()].lower()))
            for tok in viterbi_segment(m.group(), lex):
                if tok in drop:
                    continue
                if katakana_stem:
                    tok = _katakana_stem(tok)
                out.append(tok)
            pos = m.end()
        if pos < len(text):
            out.extend(tokenize(text[pos:].lower()))
        return out

    return analyze


analyze_kuromoji = _segmenting_analyzer(_JA_LEX, _JA_DROP,
                                        katakana_stem=True)
analyze_nori = _segmenting_analyzer(_KO_LEX, _KO_DROP)
analyze_smartcn = _segmenting_analyzer(_ZH_LEX, _ZH_DROP)

register_analyzer("kuromoji", analyze_kuromoji)
register_analyzer("japanese", analyze_kuromoji)
register_analyzer("nori", analyze_nori)
register_analyzer("korean", analyze_nori)
register_analyzer("smartcn", analyze_smartcn)
