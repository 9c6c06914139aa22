"""_terms_enum (x-pack TransportTermsEnumAction shape) and the scroll
API (PIT + search_after cursor construction)."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from raydex.index.build import build_index
from raydex.index.segment import FieldSpec
from raydex.search.scroll import clear_scroll, open_scroll, scroll
from raydex.search.terms_enum import terms_enum

N = 60
LANGS = ["en", "English", "enGB", "fr", "frCA", "de"]


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    t = pa.table({
        "url": pa.array([f"p/{i:03d}" for i in range(N)]),
        "warc_ts": pa.array(list(range(N)),
                            pa.int64()).cast(pa.timestamp("us")),
        "lang": pa.array([LANGS[i % len(LANGS)] for i in range(N)]),
        "text": pa.array(
            [f"doc {'red' if i % 2 else 'blue'} item w{i}"
             for i in range(N)], pa.large_string()),
    })
    p = str(tmp_path_factory.mktemp("te_pages") / "pages.parquet")
    pq.write_table(t, p)
    idx = str(tmp_path_factory.mktemp("te_idx") / "index")
    build_index(p, idx, num_partitions=2, analyzer="standard",
                max_docs_per_segment=20,
                fields=[FieldSpec("lang", source="lang",
                                  analyzer="keyword")])
    return idx


def test_terms_enum_prefix_sorted(built):
    r = terms_enum(built, "lang", string="en", size=10)
    assert r["terms"] == ["en", "enGB"]  # case-sensitive: English out
    assert r["complete"] is True


def test_terms_enum_case_insensitive_returns_stored_form(built):
    r = terms_enum(built, "lang", string="en", size=10,
                   case_insensitive=True)
    assert r["terms"] == ["English", "en", "enGB"]  # binary sort order


def test_terms_enum_size_cap_and_search_after(built):
    # main text field: tokens doc/blue/red/item/w0..w59
    r = terms_enum(built, "text", string="w", size=5)
    assert len(r["terms"]) == 5
    assert r["complete"] is False
    assert r["terms"] == sorted(r["terms"])
    # page on: strictly-after resume, no overlap, tiles the full set
    seen, after = [], None
    while True:
        page = terms_enum(built, "text", string="w", size=7,
                          search_after=after)
        if not page["terms"]:
            break
        assert not set(page["terms"]) & set(seen)
        seen += page["terms"]
        after = page["terms"][-1]
        if page["complete"]:
            break
    assert seen == sorted(f"w{i}" for i in range(N))


def test_terms_enum_index_filter_can_match(built):
    # a range the index can't satisfy (url bounds are in every
    # manifest) -> every segment skipped at the shard level
    r = terms_enum(built, "lang", string="", size=10, index_filter={
        "range": {"url": {"gte": "zzz"}}})
    assert r["terms"] == []
    # a satisfiable filter leaves the segments in place
    r2 = terms_enum(built, "lang", string="", size=10, index_filter={
        "range": {"url": {"gte": "p/"}}})
    assert r2["terms"] != []


def test_scroll_tiles_and_survives_deletes(built):
    from raydex.index.deletes import delete_by_query
    from raydex.search.scatter import LocalSearcher

    q = {"term": {"text": "red"}}
    full = [h["url"] for h in LocalSearcher(built).search_sorted(
        q, sort_field="url", order="asc", k=1000)]
    assert len(full) == N // 2

    out = open_scroll(built, q, size=7)
    sid = out["_scroll_id"]
    pages = [h["url"] for h in out["hits"]]
    # writes/deletes after the scroll opened must not change what the
    # scroll sees (consistent reader contract)
    delete_by_query(built, {"term": {"text": "w3"}}, use_ray=False)
    while True:
        nxt = scroll(sid, keep_alive_s=600)
        if not nxt["hits"]:
            break
        pages += [h["url"] for h in nxt["hits"]]
    assert pages == full
    assert scroll(sid)["hits"] == []  # exhausted stays empty
    assert clear_scroll(sid) is True
    with pytest.raises(ValueError):
        scroll(sid)
