"""Approximate distributed terms agg: the reference's shard_size /
doc_count_error_upper_bound / sum_other_doc_count contract
(`InternalTerms#reduce` error accounting) over index-time keyword
fields — exactness with big shard_size, sound bounds with small."""

from collections import Counter

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from raydex.index.build import build_index
from raydex.index.segment import FieldSpec
from raydex.search.distributed_terms import default_shard_size
from raydex.search.scatter import LocalSearcher, RaySearcher

N = 200
# skewed source distribution across several values
SOURCES = [f"src{(i * i) % 13 % 7}" for i in range(N)]


def _pages():
    return pa.table(
        {
            "url": pa.array([f"s{i % 9}.example/p/{i}" for i in range(N)]),
            "warc_ts": pa.array(list(range(N)), pa.int64()).cast(pa.timestamp("us")),
            "text": pa.array([f"doc number {i}" for i in range(N)],
                             pa.large_string()),
            "source": pa.array(SOURCES, pa.string()),
        }
    )


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("dt_pages") / "pages.parquet")
    pq.write_table(_pages(), p)
    idx = str(tmp_path_factory.mktemp("dt_idx") / "index")
    build_index(p, idx, num_partitions=4, analyzer="standard_en",
                max_docs_per_segment=30,
                fields=[FieldSpec("source", source="source",
                                  analyzer="keyword")])
    return idx


def _exact():
    return Counter(SOURCES)


def test_exact_when_shard_size_covers_vocab(built):
    s = LocalSearcher(built)
    out = s.terms_agg("source", size=7, shard_size=100)
    exact = _exact()
    assert [(b["key"], b["doc_count"]) for b in out["buckets"]] == sorted(
        exact.items(), key=lambda kv: (-kv[1], kv[0])
    )
    assert all(b["doc_count_error_upper_bound"] == 0 for b in out["buckets"])
    assert out["sum_other_doc_count"] == 0


def test_bounds_sound_with_small_shard_size(built):
    s = LocalSearcher(built)
    out = s.terms_agg("source", size=3, shard_size=2)
    exact = _exact()
    total = sum(exact.values())
    for b in out["buckets"]:
        true = exact[b["key"]]
        # reported count is a lower bound; count + error is an upper bound
        assert b["doc_count"] <= true
        assert b["doc_count"] + b["doc_count_error_upper_bound"] >= true
    got = sum(b["doc_count"] for b in out["buckets"])
    assert out["sum_other_doc_count"] == total - got
    assert out["doc_count_error_upper_bound"] >= 0


def test_distributed_parity_and_default_shard_size(built):
    local = LocalSearcher(built).terms_agg("source", size=5, shard_size=3)
    rs = RaySearcher(built, num_actors=2)
    try:
        dist = rs.terms_agg("source", size=5, shard_size=3)
    finally:
        rs.shutdown()
    assert local == dist
    assert default_shard_size(10) == 25  # the reference's 1.5x + 10


def test_text_field_terms(built):
    # the primary analyzed field works too (terms = vocabulary by df)
    out = LocalSearcher(built).terms_agg("text", size=2, shard_size=1000)
    assert out["buckets"][0]["key"] in ("doc", "number")
    assert out["buckets"][0]["doc_count"] == N
