"""Positional postings + match_phrase tests."""

import numpy as np
import pytest

from raydex.analysis.tokenizer import (
    ENGLISH_STOP_SET,
    get_analyzer,
    standard_analyze_with_positions,
)
from raydex.index.segment import SegmentReader, build_segment
from raydex.search.bm25 import GlobalStats
from raydex.search.phrase import phrase_count, phrase_frequencies, phrase_top_k
from raydex.search.query import SegmentEvaluator, parse_query

DOCS = [
    ("u0", "the quick brown fox jumps"),
    ("u1", "quick brown dog sleeps"),
    ("u2", "brown quick reversed order"),
    ("u3", "a quick brown quick brown repeat"),
    ("u4", "quick and brown separated words"),
]


@pytest.fixture(scope="module", params=["standard", "standard_en"])
def pseg(tmp_path_factory, request):
    d = str(tmp_path_factory.mktemp("pos") / f"seg-{request.param}")
    build_segment(
        d, [u for u, _ in DOCS], [t for _, t in DOCS],
        analyzer=request.param, store_positions=True,
    )
    return SegmentReader(d), request.param


def test_positions_round_trip(pseg):
    r, analyzer = pseg
    an = get_analyzer(analyzer)
    stop = ENGLISH_STOP_SET if analyzer == "standard_en" else None
    for term in ["quick", "brown"]:
        ti = r.lookup(term)
        ids, tfs, pos, offs = r.postings_with_positions(ti)
        for i, d in enumerate(ids):
            toks, tpos = standard_analyze_with_positions(DOCS[d][1].lower(), stop)
            want = [p for t, p in zip(toks, tpos) if t == term]
            got = pos[offs[i] : offs[i + 1]].tolist()
            assert got == want, (term, d, analyzer)


def test_phrase_exact(pseg):
    r, analyzer = pseg
    stop = ENGLISH_STOP_SET if analyzer == "standard_en" else None
    terms, qpos = standard_analyze_with_positions("quick brown", stop)
    docs, pf = phrase_frequencies(r, terms, qpos)
    # u0, u1 have 'quick brown' adjacent; u3 twice; u2 reversed; u4 has
    # 'quick and brown' — adjacency only under standard_en (stop gap!)...
    # no: the gap means positions differ by 2, NOT a phrase match.
    assert set(docs.tolist()) == {0, 1, 3}
    assert pf[docs.tolist().index(3)] == 2


def test_phrase_stopword_gap():
    # "fox jumps" with a stopword IN the phrase query under standard_en
    import tempfile, os

    with tempfile.TemporaryDirectory() as td:
        d = os.path.join(td, "seg")
        texts = ["jump over the fence", "jump the fence", "jump fence"]
        build_segment(d, ["a", "b", "c"], texts, analyzer="standard_en",
                      store_positions=True)
        r = SegmentReader(d)
        terms, qpos = standard_analyze_with_positions(
            "jump the fence", ENGLISH_STOP_SET
        )
        assert terms == ["jump", "fence"] and qpos == [0, 2]
        docs, pf = phrase_frequencies(r, terms, qpos)
        # only doc b has jump@0 fence@2 (gap preserved); doc c has
        # fence@1 (no gap) and doc a has fence@3
        assert docs.tolist() == [1]


def test_phrase_scoring_and_count(pseg):
    r, analyzer = pseg
    stop = ENGLISH_STOP_SET if analyzer == "standard_en" else None
    terms, qpos = standard_analyze_with_positions("quick brown", stop)
    df = {t: int(r.df[r.lookup(t)]) for t in terms}
    stats = GlobalStats(r.ndocs, r.sum_dl, df)
    ids, scores = phrase_top_k(r, terms, qpos, 10, stats)
    assert ids.size == 3
    assert scores[0] >= scores[-1] > 0
    # u3 (pf=2, longer doc) should rank near top
    assert phrase_count(r, terms, qpos) == 3


def test_dsl_match_phrase(pseg):
    r, analyzer = pseg
    ev = SegmentEvaluator(
        r,
        GlobalStats(r.ndocs, r.sum_dl, {"quick": 4, "brown": 5}),
        get_analyzer(analyzer),
    )
    ids, sc = ev.top_k(parse_query({"match_phrase": {"text": "quick brown"}}), 10)
    assert set(ids.tolist()) == {0, 1, 3}
    n = ev.count(parse_query({"match_phrase": {"text": "reversed order"}}))
    assert n == 1


def test_absent_term_phrase(pseg):
    r, _ = pseg
    docs, pf = phrase_frequencies(r, ["quick", "zzz"], [0, 1], )
    assert docs.size == 0
