import math

import numpy as np
import pytest

from raydex.analysis.tokenizer import get_analyzer
from raydex.index.segment import SegmentReader, build_segment
from raydex.search.bm25 import GlobalStats, brute_force_top_k, idf

DOCS = [
    ("u0", "cat dog"),
    ("u1", "cat cat fish"),
    ("u2", "dog dog dog bird"),
    ("u3", "fish"),
]


@pytest.fixture(scope="module")
def seg(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("seg") / "seg-test")
    urls = [u for u, _ in DOCS]
    texts = [t for _, t in DOCS]
    m = build_segment(d, urls, texts, analyzer="standard")
    return SegmentReader(d), m


def _stats(reader):
    df = {t: int(reader.df[reader.lookup(t)]) if reader.lookup(t) >= 0 else 0
          for t in ["cat", "dog", "fish", "bird", "absent"]}
    return GlobalStats(ndocs=reader.ndocs, sum_dl=reader.sum_dl, df=df)


def test_manifest_and_dict(seg):
    reader, m = seg
    assert m["doc_count"] == 4 and m["sum_dl"] == 10 and m["status"] == "complete"
    assert list(reader.terms) == ["bird", "cat", "dog", "fish"]  # sorted
    assert reader.df.tolist() == [1, 2, 2, 2]
    assert reader.cf.tolist() == [1, 3, 4, 2]


def test_postings_round_trip(seg):
    reader, _ = seg
    ids, tfs = reader.postings(reader.lookup("cat"))
    assert ids.tolist() == [0, 1] and tfs.tolist() == [1, 2]
    ids, tfs = reader.postings(reader.lookup("dog"))
    assert ids.tolist() == [0, 2] and tfs.tolist() == [1, 3]


def test_bm25_hand_golden(seg):
    reader, _ = seg
    stats = _stats(reader)
    ids, scores = brute_force_top_k(reader, ["cat"], 10, stats)
    # hand-computed: N=4, df=2 -> idf=ln(2); avgdl=2.5
    ln2 = math.log(2.0)
    s_d1 = ln2 * 2.2 * 2 / (2 + 1.2 * (0.25 + 0.75 * 3 / 2.5))
    s_d0 = ln2 * 2.2 * 1 / (1 + 1.2 * (0.25 + 0.75 * 2 / 2.5))
    assert ids.tolist() == [1, 0]
    np.testing.assert_allclose(scores, np.array([s_d1, s_d0], dtype=np.float32), rtol=1e-6)


def test_operator_and(seg):
    reader, _ = seg
    stats = _stats(reader)
    ids, _ = brute_force_top_k(reader, ["cat", "fish"], 10, stats, operator="and")
    assert ids.tolist() == [1]
    ids, _ = brute_force_top_k(reader, ["cat", "absent"], 10, stats, operator="and")
    assert ids.size == 0


def test_zero_terms_and_absent(seg):
    reader, _ = seg
    stats = _stats(reader)
    ids, _ = brute_force_top_k(reader, [], 10, stats)
    assert ids.size == 0
    ids, _ = brute_force_top_k(reader, ["absent"], 10, stats)
    assert ids.size == 0


def test_tie_break_docid_asc(tmp_path):
    # two identical docs -> identical scores -> docid ascending
    d = str(tmp_path / "seg-tie")
    build_segment(d, ["a", "b", "c"], ["x y", "x y", "z"], analyzer="standard")
    r = SegmentReader(d)
    stats = GlobalStats(ndocs=3, sum_dl=r.sum_dl, df={"x": 2})
    ids, scores = brute_force_top_k(r, ["x"], 10, stats)
    assert ids.tolist() == [0, 1]
    assert scores[0] == scores[1]


def test_segment_against_recount(tmp_path):
    # randomized property: postings == recount from the analyzer output
    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(50)]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(1, 40))) for _ in range(100)]
    urls = [f"u{i}" for i in range(100)]
    d = str(tmp_path / "seg-prop")
    build_segment(d, urls, texts, analyzer="standard")
    r = SegmentReader(d)
    an = get_analyzer("standard")
    for t in ["w0", "w7", "w49"]:
        want = [(i, toks.count(t)) for i, toks in enumerate(map(an, texts)) if t in toks]
        ti = r.lookup(t)
        if ti < 0:
            assert not want
            continue
        ids, tfs = r.postings(ti)
        assert list(zip(ids.tolist(), tfs.tolist())) == want
