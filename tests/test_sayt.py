"""search_as_you_type field type (mapper-extras
``SearchAsYouTypeFieldMapper.java``): shingle sub-fields + dedicated
edge-gram prefix sub-field, and the bool_prefix last-term rewrite to a
single term lookup on ``<field>._index_prefix``.
"""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from raydex.analysis.sayt import (
    sayt_prefix_analyze,
    sayt_shingle_analyze,
    sayt_subfield_specs,
)
from raydex.index.build import build_index, segment_dirs
from raydex.index.segment import SegmentReader
from raydex.search.scatter import LocalSearcher

TEXTS = [
    "quick brown fox jumps",
    "quick brown dog",
    "the brown fox",
    "lazy dog sleeps here quietly",
    "quip quiz quantum",
    "stream processing engine",
    "stream batch window",
    "single",
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
    p = str(tmp_path_factory.mktemp("sayt_pages") / "pages.parquet")
    pq.write_table(_corpus(), p)
    idx = str(tmp_path_factory.mktemp("sayt_idx") / "index")
    m = build_index(
        p, idx, num_partitions=2, analyzer="standard", source="text",
        fields=sayt_subfield_specs("text", source="text", max_shingle_size=3),
    )
    # plain index: the same corpus WITHOUT the SAYT sub-fields (the
    # expansion-based fallback path) for behavioral parity checks
    idx2 = str(tmp_path_factory.mktemp("sayt_idx2") / "index")
    build_index(p, idx2, num_partitions=2, analyzer="standard", source="text")
    return idx, idx2, m


def test_analyzers_match_reference_shape():
    # FixedShingleFilter: exactly-n shingles, no unigrams
    assert sayt_shingle_analyze("quick brown fox jumps", 2) == [
        "quick brown", "brown fox", "fox jumps"]
    assert sayt_shingle_analyze("quick brown fox jumps", 3) == [
        "quick brown fox", "brown fox jumps"]
    assert sayt_shingle_analyze("one two", 3) == []
    # prefix analyzer: trailing fillers mean EVERY token heads a shingle,
    # so each token's prefixes are terms
    grams = set(sayt_prefix_analyze("quick brown fox", 3))
    for pre in ("q", "qu", "quick", "quick ", "quick b", "quick brown fox",
                "b", "brown", "brown fox", "f", "fox"):
        assert pre in grams, pre
    assert sayt_prefix_analyze("", 3) == []


def test_subfield_layout(built):
    idx, _, m = built
    assert set(m["fields"]) == {"text._2gram", "text._3gram", "text._index_prefix"}
    sds = segment_dirs(idx, m)
    shingle_terms = set()
    for sd in sds:
        r = SegmentReader(sd)
        fr = r.field("text._2gram")
        assert fr is not None
        shingle_terms |= {str(fr.terms[i]) for i in range(fr.nterms)}
    assert "quick brown" in shingle_terms
    assert "quick" not in shingle_terms  # fixed shingles exclude unigrams


def _counts(idx, dsl):
    return LocalSearcher(idx).count(dsl)


@pytest.mark.parametrize(
    "query,expected",
    [
        # every term is optional (the reference builds SHOULD clauses):
        ("quick bro", 3),     # quick(0,1) OR bro*(0,1,2)
        ("qui", 4),           # qui* -> quick(0,1), quietly(3), quip/quiz(4)
        ("stream bat", 2),    # stream(5,6) OR bat*(6)
        ("brown fo", 3),      # brown(0,1,2) OR fo*(0,2)
        ("nosuchprefix", 0),
    ],
)
def test_bool_prefix_accelerated_equals_expansion(built, query, expected):
    idx, idx2, _ = built
    dsl = {"match_bool_prefix": {"text": query}}
    fast, slow = _counts(idx, dsl), _counts(idx2, dsl)
    assert fast == slow
    assert fast == expected


def test_acceleration_path_is_used(built, monkeypatch):
    """The SAYT index must answer the last-term prefix via a term lookup
    on ._index_prefix, NOT via term-dict prefix expansion."""
    import raydex.search.query as qmod

    calls = {"n": 0}
    orig = qmod.expand_prefix

    def spy(reader, prefix):
        calls["n"] += 1
        return orig(reader, prefix)

    monkeypatch.setattr(qmod, "expand_prefix", spy)
    idx, idx2, _ = built
    dsl = {"match_bool_prefix": {"text": "quick bro"}}
    _counts(idx, dsl)
    assert calls["n"] == 0  # dedicated structure, no expansion
    _counts(idx2, dsl)
    assert calls["n"] > 0  # fallback expands


def test_long_prefix_falls_back(built):
    """> MAX_GRAM(20) chars: out of the prefix field's range -> the
    expansion fallback (PrefixFieldType.prefixQuery's range check)."""
    idx, idx2, _ = built
    long_pre = "a" * 25
    dsl = {"match_bool_prefix": {"text": f"quick {long_pre}"}}
    assert _counts(idx, dsl) == _counts(idx2, dsl)


def test_multi_match_bool_prefix_over_sayt(built):
    """The canonical SAYT query shape: multi_match type bool_prefix over
    [root, ._2gram, ._3gram] (the reference docs' recommended query)."""
    idx, _, _ = built
    s = LocalSearcher(idx)
    hits = s.search_query(
        {"multi_match": {"query": "quick brown f",
                         "type": "bool_prefix",
                         "fields": ["text", "text._2gram", "text._3gram"]}},
        k=10,
    )
    urls = [h["url"] for h in hits]
    # doc 0 ("quick brown fox jumps") must rank first: it matches the
    # 2gram "quick brown" and the f-prefix; doc 1 lacks fox
    assert urls and urls[0].endswith("/p/0")
    got = set(urls)
    assert {u for u in got if u.endswith(("/p/0", "/p/1"))} == {
        "s0.example/p/0", "s1.example/p/1"}
