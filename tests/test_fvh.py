"""Fast-vector highlighter (``FastVectorHighlighter.java``): match
positions come from the positional postings, making phrase highlighting
position-accurate (only where the phrase actually matched), unlike the
plain re-analyzing highlighter which marks every member term.
"""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from raydex.index.build import build_index, segment_dirs
from raydex.index.segment import SegmentReader
from raydex.search.highlight import fvh_highlight, highlight

TEXTS = [
    "batch jobs stream data but batch stream is the phrase here",
    "stream first then batch later never adjacent",
    "plain document about nothing relevant",
]


def _corpus():
    n = len(TEXTS)
    return pa.table(
        {
            "url": pa.array([f"s{i}.example/p/{i}" for i in range(n)]),
            "warc_ts": pa.array(list(range(n)), pa.int64()).cast(pa.timestamp("us")),
            "text": pa.array(TEXTS, pa.large_string()),
        }
    )


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("fvh_pages") / "pages.parquet")
    pq.write_table(_corpus(), p)
    idx = str(tmp_path_factory.mktemp("fvh_idx") / "index")
    m = build_index(p, idx, num_partitions=1, analyzer="standard",
                    source="text", store_positions=True)
    readers = [SegmentReader(sd) for sd in segment_dirs(idx, m)]
    # map url -> (reader, docid)
    where = {}
    for r in readers:
        for d in range(r.ndocs):
            where[r.url_of(d)] = (r, d)
    return where


def test_term_hits_from_postings(built):
    r, d = built["s0.example/p/0"]
    frags = fvh_highlight(r, d, TEXTS[0], query_terms={"batch"},
                          fragment_size=200)
    assert len(frags) == 1
    assert frags[0].count("<em>batch</em>") == 2
    # parity with the plain highlighter on simple term queries
    plain = highlight(TEXTS[0], {"batch"}, analyzer="standard",
                      fragment_size=200)
    assert frags == plain


def test_phrase_accuracy(built):
    """The FVH advantage: ["batch","stream"] highlights ONLY the
    position-adjacent occurrence."""
    r, d = built["s0.example/p/0"]
    frags = fvh_highlight(r, d, TEXTS[0], phrases=[["batch", "stream"]],
                          fragment_size=200)
    assert len(frags) == 1
    assert frags[0].count("<em>batch stream</em>") == 1
    assert "<em>batch jobs" not in frags[0]
    # doc 1 has both terms but never adjacent -> no highlight at all
    r1, d1 = built["s1.example/p/1"]
    assert fvh_highlight(r1, d1, TEXTS[1],
                         phrases=[["batch", "stream"]]) == []


def test_terms_plus_phrase_merge(built):
    """Overlapping term + phrase spans merge (no double tagging)."""
    r, d = built["s0.example/p/0"]
    frags = fvh_highlight(r, d, TEXTS[0], query_terms={"stream"},
                          phrases=[["batch", "stream"]], fragment_size=200)
    assert len(frags) == 1
    f = frags[0]
    assert f.count("<em>") == f.count("</em>")
    assert "<em>batch stream</em>" in f          # merged phrase span
    assert f.count("<em>stream</em>") == 1       # the standalone stream


def test_absent_term_and_doc(built):
    r, d = built["s2.example/p/2"]
    assert fvh_highlight(r, d, TEXTS[2], query_terms={"batch"}) == []
    assert fvh_highlight(r, d, TEXTS[2], query_terms={"nosuchterm"}) == []
