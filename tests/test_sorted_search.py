"""Query-time field sort with index-sort early termination — the
reference's ``FieldSortBuilder`` + ``BottomSortValuesCollector``:
segments visited most-promising-first (sort-range ordering), and once k
hits exist, segments whose whole [min, max] range lies past the current
bottom are skipped without evaluation.
"""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from raydex.index.build import build_index
from raydex.search.scatter import LocalSearcher

N = 80


def _corpus():
    # url sorts with dl (url embeds zero-padded dl) so consecutive
    # segments get DISJOINT dl ranges -> skipping can trigger
    rows = []
    for i in range(N):
        dl = i + 3
        words = ["tok"] * (dl - 1) + (["special"] if i % 4 == 0 else ["plain"])
        rows.append((f"{dl:04d}.example/p/{i}", " ".join(words)))
    return pa.table(
        {
            "url": pa.array([u for u, _ in rows]),
            "warc_ts": pa.array(list(range(N)), pa.int64()).cast(pa.timestamp("us")),
            "text": pa.array([t for _, t in rows], pa.large_string()),
        }
    )


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    t = _corpus()
    p = str(tmp_path_factory.mktemp("sort_pages") / "pages.parquet")
    pq.write_table(t, p)
    idx = str(tmp_path_factory.mktemp("sort_idx") / "index")
    build_index(p, idx, num_partitions=1, analyzer="standard", source="text",
                max_docs_per_segment=10)  # 8 segments, increasing dl ranges
    return idx, t


def test_sorted_matchall_asc_and_skipping(built):
    idx, t = built
    s = LocalSearcher(idx)
    hits = s.search_sorted({"match_all": {}}, sort_field="dl", order="asc", k=5)
    assert [h["sort_value"] for h in hits] == [3, 4, 5, 6, 7]
    assert [h["url"] for h in hits] == sorted(t["url"].to_pylist())[:5]
    # 8 segments, k=5 fits entirely in the first -> the other 7 skip
    assert s.group.sort_skipped() == 7


def test_sorted_desc(built):
    idx, t = built
    s = LocalSearcher(idx)
    hits = s.search_sorted({"match_all": {}}, sort_field="dl", order="desc", k=4)
    assert [h["sort_value"] for h in hits] == [N + 2, N + 1, N, N - 1]
    assert s.group.sort_skipped() == 7


def test_sorted_with_query_filter(built):
    idx, t = built
    s = LocalSearcher(idx)
    hits = s.search_sorted({"term": {"text": "special"}}, sort_field="dl",
                           order="asc", k=3)
    # 'special' docs are i % 4 == 0 -> dl 3, 7, 11, ...
    assert [h["sort_value"] for h in hits] == [3, 7, 11]


def test_sorted_equals_bruteforce_oracle(built):
    idx, t = built
    s = LocalSearcher(idx)
    urls = t["url"].to_pylist()
    dls = [len(x.split()) for x in t["text"].to_pylist()]
    for order in ("asc", "desc"):
        exp = sorted(zip(dls, urls), reverse=(order == "desc"))[:10]
        hits = s.search_sorted({"match_all": {}}, "dl", order, k=10)
        assert [(h["sort_value"], h["url"]) for h in hits] == exp


def test_sorted_by_url(built):
    idx, t = built
    s = LocalSearcher(idx)
    hits = s.search_sorted({"match_all": {}}, sort_field="url",
                           order="desc", k=3)
    assert [h["url"] for h in hits] == sorted(t["url"].to_pylist())[::-1][:3]
    assert s.group.sort_skipped() == 7


def test_unsupported_field_errors(built):
    idx, _ = built
    with pytest.raises(ValueError, match="not a stored doc-values"):
        LocalSearcher(idx).search_sorted({"match_all": {}}, "nope", "asc", 3)
    with pytest.raises(ValueError, match="order"):
        LocalSearcher(idx).search_sorted({"match_all": {}}, "dl", "sideways", 3)


def test_ray_searcher_parity(built, ray_session):
    from raydex.search.scatter import RaySearcher

    idx, _ = built
    rs = RaySearcher(idx, num_actors=3)
    try:
        for order in ("asc", "desc"):
            local = LocalSearcher(idx).search_sorted(
                {"match_all": {}}, "dl", order, k=7)
            dist = rs.search_sorted({"match_all": {}}, "dl", order, k=7)
            assert [(h["sort_value"], h["url"]) for h in local] == [
                (h["sort_value"], h["url"]) for h in dist]
    finally:
        rs.shutdown()
