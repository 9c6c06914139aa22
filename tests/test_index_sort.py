"""Index-time sort (`index.sort.field` — IndexSortConfig): docs stored
in sort order, url_index sidecar keeps point GETs O(log n), and a
matching query-time sort early-terminates within each segment."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from raydex.index.build import build_index, load_index_manifest, segment_dirs
from raydex.index.compact import expunge_deletes
from raydex.index.deletes import delete_by_query
from raydex.index.segment import SegmentReader
from raydex.search.get import get_doc, mget
from raydex.search.scatter import LocalSearcher

N = 100


def _pages():
    rng = np.random.default_rng(5)
    ts = rng.permutation(N) * 1000
    return pa.table(
        {
            "url": pa.array([f"s{i % 6}.example/p/{i}" for i in range(N)]),
            "warc_ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
            "text": pa.array(
                [f"doc {'hot' if i % 4 == 0 else 'cold'} item {i}"
                 for i in range(N)],
                pa.large_string(),
            ),
        }
    )


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    t = _pages()
    p = str(tmp_path_factory.mktemp("is_pages") / "pages.parquet")
    pq.write_table(t, p)
    idx = str(tmp_path_factory.mktemp("is_idx") / "index")
    m = build_index(p, idx, num_partitions=2, analyzer="standard_en",
                    max_docs_per_segment=20, index_sort=("warc_ts", "desc"))
    return idx, m, t


def test_docs_stored_in_sort_order(built):
    idx, m, t = built
    assert m["index_sort"] == ["warc_ts", "desc"]
    for sd in segment_dirs(idx, m):
        r = SegmentReader(sd)
        v = r.doc_values["warc_ts"]
        assert (np.diff(v) <= 0).all()  # desc within every segment
        assert r.manifest["index_sort"] == ["warc_ts", "desc"]
        assert r.manifest["max_warc_ts"] == int(v[0])
        assert os.path.exists(os.path.join(sd, "url_index.parquet"))


def test_point_get_uses_sidecar(built):
    idx, _, t = built
    for u in ["s0.example/p/0", "s5.example/p/95", "s3.example/p/33"]:
        assert get_doc(idx, u)["url"] == u
    assert get_doc(idx, "nope.example/x") is None
    got = mget(idx, ["s1.example/p/1", "s2.example/p/2"])
    assert [g["url"] for g in got] == ["s1.example/p/1", "s2.example/p/2"]


def test_sorted_search_early_terminates(built):
    idx, _, t = built
    s = LocalSearcher(idx)
    hits = s.search_sorted({"term": {"text": "cold"}}, sort_field="warc_ts",
                           order="desc", k=10)
    df = t.to_pandas()
    cold = df[df["text"].str.contains("cold")].copy()
    cold["us"] = cold["warc_ts"].astype("int64")
    want = cold.sort_values("us", ascending=False).head(10)
    assert [h["url"] for h in hits] == list(want["url"])
    assert [h["sort_value"] for h in hits] == list(want["us"])
    # the matching-direction sort early-terminated inside segments
    assert getattr(s.group, "last_sort_early_terminated", 0) > 0
    # the OPPOSITE direction still works (no early termination, full path)
    hits_asc = s.search_sorted({"term": {"text": "cold"}},
                               sort_field="warc_ts", order="asc", k=5)
    want_asc = cold.sort_values("us", ascending=True).head(5)
    assert [h["url"] for h in hits_asc] == list(want_asc["url"])


def test_sort_field_requires_doc_values(ray_session, tmp_path):
    t = _pages()
    p = str(tmp_path / "plain.parquet")
    pq.write_table(t, p)
    idx = str(tmp_path / "plain_idx")
    build_index(p, idx, num_partitions=1, analyzer="standard_en")
    s = LocalSearcher(idx)
    with pytest.raises(ValueError, match="doc-values"):
        s.search_sorted({"match_all": {}}, sort_field="warc_ts", k=3)


def test_compact_preserves_index_sort(built, tmp_path):
    idx, m, t = built
    from raydex.index.reshape import clone_index

    work = str(tmp_path / "work")
    clone_index(idx, work)
    delete_by_query(work, {"term": {"text": "hot"}}, use_ray=False)
    expunge_deletes(work, use_ray=False)
    m2 = load_index_manifest(work)
    for sd in segment_dirs(work, m2):
        r = SegmentReader(sd)
        v = r.doc_values["warc_ts"]
        if v.size > 1:
            assert (np.diff(v) <= 0).all()  # sort order survives
        assert r.manifest["index_sort"] == ["warc_ts", "desc"]
    # gets still work post-compaction (sidecar rebuilt)
    assert get_doc(work, "s1.example/p/1")["url"] == "s1.example/p/1"
    assert get_doc(work, "s0.example/p/0") is None  # deleted ('hot')


def test_range_on_stored_ts_with_can_match(built):
    """Range filter over the stored warc_ts doc-values + can-match skip
    via the min/max manifest ranges — non-overlapping segments are
    skipped BEFORE evaluation, results exact."""
    idx, m, t = built
    s = LocalSearcher(idx)
    df = t.to_pandas()
    df["us"] = df["warc_ts"].astype("int64")
    cut = int(df["us"].quantile(0.9))
    q = {"bool": {"must": [{"match_all": {}}],
                  "filter": [{"range": {"warc_ts": {"gte": cut}}}]}}
    assert s.count(q) == int((df["us"] >= cut).sum())
    # a query above every segment's max skips them all
    s.group.query_count({"bool": {"filter": [
        {"range": {"warc_ts": {"gt": int(df["us"].max())}}}]}},
        s.ndocs, s.sum_dl, {}, m["analyzer"])
    assert s.group.can_match_skipped() == len(s.group.readers)


def test_sorted_search_after_pages(built):
    """search_after over the sorted scatter path: consecutive pages
    tile the exact full ordering with no overlap, beyond the
    max_result_window depth cap (the cursor path has none)."""
    idx, _, t = built
    s = LocalSearcher(idx)
    q = {"term": {"text": "cold"}}
    full = s.search_sorted(q, sort_field="warc_ts", order="desc", k=1000)
    pages, cursor = [], None
    while True:
        page = s.search_sorted(q, sort_field="warc_ts", order="desc", k=20,
                               search_after=cursor)
        if not page:
            break
        pages.extend(page)
        h = page[-1]
        cursor = (h["sort_value"], h["ordinal"], h["docid"])
    assert [p["url"] for p in pages] == [h["url"] for h in full]
    assert len({p["url"] for p in pages}) == len(pages)  # no dupes


def test_disk_usage_report(built):
    from raydex.index.fieldcaps import disk_usage

    idx, m, t = built
    du = disk_usage(idx)
    assert du["doc_count"] == N
    f = du["fields"]["text"]
    assert f["postings_bytes"] > 0 and f["terms_bytes"] > 0
    assert f["stored_fields_bytes"] > 0
    assert f["sidecar_bytes"] > 0  # url_index + manifests
    assert du["total_bytes"] == sum(
        x["total_bytes"] for x in du["fields"].values()
    )
