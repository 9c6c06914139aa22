"""Porter stemmer, function_score, more_like_this tests."""

import pyarrow.parquet as pq
import pytest

from raydex.analysis.stemmer import porter_stem, stem_filter
from raydex.analysis.tokenizer import get_analyzer


def test_porter_classic_cases():
    # end-to-end stems matching the canonical Porter implementation
    cases = {
        "caresses": "caress", "ponies": "poni", "caress": "caress",
        "cats": "cat", "feed": "feed", "agreed": "agre",
        "plastered": "plaster", "bled": "bled", "motoring": "motor",
        "sing": "sing", "conflated": "conflat", "troubled": "troubl",
        "sized": "size", "hopping": "hop", "tanned": "tan",
        "falling": "fall", "hissing": "hiss", "fizzed": "fizz",
        "failing": "fail", "filing": "file", "happy": "happi",
        "sky": "sky", "relational": "relat", "conditional": "condit",
        "rational": "ration", "digitizer": "digit",
        "operator": "oper", "feudalism": "feudal",
        "decisiveness": "decis", "hopefulness": "hope",
        "formative": "form", "electrical": "electr",
        "hopeful": "hope", "goodness": "good",
        "allowance": "allow", "inference": "infer",
        "airliner": "airlin", "adjustable": "adjust", "defensible": "defens",
        "irritant": "irrit", "replacement": "replac", "adjustment": "adjust",
        "dependent": "depend", "adoption": "adopt",
        "homologous": "homolog", "effective": "effect",
        "rate": "rate", "cease": "ceas", "roll": "roll",
        "running": "run", "connections": "connect",
        "generalizations": "gener",
    }
    for w, want in cases.items():
        assert porter_stem(w) == want, w


def test_english_analyzer():
    an = get_analyzer("english")
    assert an("The running dogs jumped quickly") == ["run", "dog", "jump", "quickli"]
    assert stem_filter(["connections", "connecting"]) == ["connect", "connect"]


@pytest.fixture(scope="module")
def small_searcher(ray_session, tmp_path_factory):
    from raydex.corpus import make_pages_table
    from raydex.index.build import build_index
    from raydex.search.scatter import LocalSearcher

    t = make_pages_table(250, seed=51)
    p = str(tmp_path_factory.mktemp("fs") / "pages.parquet")
    pq.write_table(t, p)
    idx = str(tmp_path_factory.mktemp("fsx") / "idx")
    build_index(p, idx, num_partitions=2, source="text")
    return LocalSearcher(idx)


def test_function_score(small_searcher):
    from raydex.search.function_score import function_score_hits

    hits = small_searcher.search("search engine data", k=10)
    assert hits
    w = function_score_hits(hits, [{"weight": 2.0}])
    assert w[0]["score"] == pytest.approx(
        max(h["score"] for h in hits) * 2.0
    )
    rnd1 = function_score_hits(hits, [{"random_score": {}}], seed=5, boost_mode="replace")
    rnd2 = function_score_hits(hits, [{"random_score": {}}], seed=5, boost_mode="replace")
    assert [h["url"] for h in rnd1] == [h["url"] for h in rnd2]  # deterministic
    scripted = function_score_hits(
        hits, [{"script": lambda h: len(h["url"])}], boost_mode="sum", score_mode="sum"
    )
    assert scripted[0]["score"] >= hits[0]["score"]


def test_more_like_this(small_searcher):
    from raydex.search.function_score import more_like_this

    seed_hit = small_searcher.search("search engine", k=1)
    if not seed_hit:
        pytest.skip("no hits in corpus sample")
    url = seed_hit[0]["url"]
    similar = more_like_this(small_searcher, url, k=5)
    assert all(h["url"] != url for h in similar)
    assert len(similar) > 0
    assert more_like_this(small_searcher, "missing-url", k=5) == []
