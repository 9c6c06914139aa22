"""Property: Arrow-native tokenization == the Python standard analyzer,
row by row, including positions, stop filtering, CJK fallback, and
overlong-token fallback."""

import numpy as np
import pyarrow as pa
import pytest

from raydex.analysis.arrow_tokenize import encode_terms, tokenize_batch
from raydex.analysis.tokenizer import (
    ENGLISH_STOP_SET,
    standard_analyze_with_positions,
)
from raydex.corpus import make_pages_table

CASES = [
    "The quick brown fox",
    "wi-fi 3.14 O'Neil's 1,000 items",
    "foo@bar.com https://x.example/path?q=1",
    "foo_bar BAZ_qux",
    "",
    "   ",
    "日本語テキスト mixed ascii",
    "a.b.c.d chains e'f'g 1,2,3",
    "x" * 300 + " normal",
    "ümlauts über straße",
    "end. start, mid; done!",
]


def _split(tokens_flat, doc_of, pos, n):
    """Regroup flat output per doc."""
    toks = tokens_flat.to_pylist()
    out = [([], []) for _ in range(n)]
    for i, d in enumerate(doc_of):
        out[d][0].append(toks[i])
        if pos is not None:
            out[d][1].append(int(pos[i]))
    return out


@pytest.mark.parametrize("stop", [None, ENGLISH_STOP_SET])
def test_matches_python_analyzer(stop):
    flat, doc_of, pos = tokenize_batch(
        pa.array(CASES, type=pa.large_string()), stopwords=stop, store_positions=True
    )
    got = _split(flat, doc_of, pos, len(CASES))
    for i, text in enumerate(CASES):
        want_t, want_p = standard_analyze_with_positions(text.lower(), stop)
        assert got[i][0] == want_t, (i, text)
        assert got[i][1] == want_p, (i, text)


def test_matches_on_generated_corpus():
    t = make_pages_table(300, seed=31, with_html=False)
    texts = t["text"]
    flat, doc_of, pos = tokenize_batch(texts, ENGLISH_STOP_SET, store_positions=True)
    got = _split(flat, doc_of, pos, t.num_rows)
    for i, text in enumerate(texts.to_pylist()):
        want_t, want_p = standard_analyze_with_positions(text.lower(), ENGLISH_STOP_SET)
        assert got[i][0] == want_t, i
        assert got[i][1] == want_p, i


def test_encode_terms_sorted():
    flat, doc_of, _ = tokenize_batch(pa.array(["b a c a", "c b"]))
    codes, terms = encode_terms(flat)
    assert terms.tolist() == ["a", "b", "c"]
    assert [terms[c] for c in codes] == ["b", "a", "c", "a", "c", "b"]


def test_empty_and_null():
    flat, doc_of, pos = tokenize_batch(pa.array([None, "", "a"], type=pa.string()),
                                       store_positions=True)
    assert flat.to_pylist() == ["a"] and doc_of.tolist() == [2]


def test_segment_build_equivalence(tmp_path):
    """Segments built via the Arrow path must equal the old python-path
    output (postings + dl + terms) — checked via a whitespace-analyzer
    twin plus direct comparison on standard_en."""
    from raydex.index.segment import SegmentReader, build_segment

    t = make_pages_table(150, seed=33, with_html=False)
    texts = t["text"].to_pylist()
    urls = [f"u{i:04d}" for i in range(len(texts))]
    d1 = str(tmp_path / "arrow")
    build_segment(d1, urls, t["text"], analyzer="standard_en", store_positions=True)
    r = SegmentReader(d1)
    # recount oracle on a few terms
    from raydex.analysis.tokenizer import get_analyzer

    an = get_analyzer("standard_en")
    toks_per_doc = [an(x.lower()) for x in texts]
    for term in ["search", "data", "web"]:
        ti = r.lookup(term)
        want = [(i, tk.count(term)) for i, tk in enumerate(toks_per_doc) if term in tk]
        if ti < 0:
            assert not want
            continue
        ids, tfs = r.postings(ti)
        assert list(zip(ids.tolist(), tfs.tolist())) == want, term
    dls = [len(tk) for tk in toks_per_doc]
    assert r.manifest["sum_dl"] == sum(dls)
