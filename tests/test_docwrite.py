"""Single-document write path: PUT _doc / _update / DELETE _doc with
refresh-gated visibility (TransportIndexAction / UpdateHelper /
InternalEngine refresh semantics)."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from raydex.index.build import build_index, load_index_manifest
from raydex.index.docwrite import (
    DocumentSourceMissing,
    DocWriter,
    VersionConflict,
    delete_doc,
    index_doc,
    update_doc,
)
from raydex.search.get import get_doc
from raydex.search.scatter import LocalSearcher

N = 40


def _pages():
    return pa.table(
        {
            "url": pa.array([f"s{i % 5}.example/p/{i}" for i in range(N)]),
            "warc_ts": pa.array(list(range(N)), pa.int64()).cast(
                pa.timestamp("us")),
            "text": pa.array(
                [f"page {'red' if i % 2 else 'blue'} item number {i}"
                 for i in range(N)], pa.large_string()),
        }
    )


@pytest.fixture()
def built(ray_session, tmp_path):
    p = str(tmp_path / "pages.parquet")
    pq.write_table(_pages(), p)
    idx = str(tmp_path / "index")
    build_index(p, idx, num_partitions=4, analyzer="standard_en",
                max_docs_per_segment=15)
    return idx


def test_index_doc_visible_after_refresh(built):
    w = DocWriter(built)
    r = w.index_doc({"url": "new.example/a", "text": "a shiny zebra page"})
    assert r["result"] == "created"
    # buffered, not yet searchable (refresh gate)
    assert LocalSearcher(built).count({"term": {"text": "zebra"}}) == 0
    assert get_doc(built, "new.example/a") is None
    out = w.refresh()
    assert out["segments"] == 1 and out["docs"] == 1
    s = LocalSearcher(built)
    assert s.count({"term": {"text": "zebra"}}) == 1
    hit = s.search_query({"term": {"text": "zebra"}}, k=1)[0]
    assert hit["url"] == "new.example/a"
    # micro-segments store the source (translog/_source analogue)
    row = get_doc(built, "new.example/a")
    assert row["text"] == "a shiny zebra page"
    m = load_index_manifest(built)
    assert m["doc_count"] == N + 1


def test_reindex_latest_wins_and_create_conflict(built):
    url = "s1.example/p/1"  # exists in the bulk build ("red" doc)
    s0 = LocalSearcher(built)
    n_red = s0.count({"term": {"text": "red"}})
    r = index_doc(built, {"url": url, "text": "now a green page"})
    assert r["result"] == "updated"
    s = LocalSearcher(built)
    # old copy soft-deleted: red count drops by one, doc now matches green
    assert s.count({"term": {"text": "red"}}) == n_red - 1
    assert s.count({"term": {"text": "green"}}) == 1
    assert s.count({"match_all": {}}) == N  # net doc count unchanged
    got = get_doc(built, url)
    assert got["text"] == "now a green page"
    with pytest.raises(VersionConflict):
        index_doc(built, {"url": url, "text": "x"}, create=True)
    # create on a FREE id works
    r2 = index_doc(built, {"url": "free.example/x", "text": "words"},
                   create=True)
    assert r2["result"] == "created"


def test_update_doc_merge_noop_upsert(built):
    # seed a doc through the writer so its source is stored
    index_doc(built, {"url": "u.example/1", "text": "alpha beta",
                      "lang": "en"})
    r = update_doc(built, "u.example/1", doc={"lang": "fr"})
    assert r["result"] == "updated"
    row = get_doc(built, "u.example/1")
    assert row["lang"] == "fr" and row["text"] == "alpha beta"
    # text untouched -> still searchable
    assert LocalSearcher(built).count({"term": {"text": "alpha"}}) == 1
    # noop detection
    r = update_doc(built, "u.example/1", doc={"lang": "fr"})
    assert r["result"] == "noop"
    # missing id: plain update raises; doc_as_upsert creates
    with pytest.raises(KeyError):
        update_doc(built, "ghost.example/1", doc={"text": "boo"})
    r = update_doc(built, "ghost.example/1", doc={"text": "boo"},
                   doc_as_upsert=True)
    assert r["result"] == "created"
    assert get_doc(built, "ghost.example/1")["text"] == "boo"
    # bulk-built docs carry no stored source -> the reference's
    # DocumentSourceMissingException analogue
    with pytest.raises(DocumentSourceMissing):
        update_doc(built, "s3.example/p/3", doc={"lang": "de"})


def test_delete_doc(built):
    url = "s2.example/p/2"
    assert get_doc(built, url) is not None
    r = delete_doc(built, url)
    assert r["result"] == "deleted"
    assert get_doc(built, url) is None
    assert LocalSearcher(built).count({"match_all": {}}) == N - 1
    r = delete_doc(built, url)
    assert r["result"] == "not_found"
    # delete of a doc that only exists in the buffer never hits disk
    w = DocWriter(built)
    w.index_doc({"url": "temp.example/1", "text": "fleeting"})
    w.delete_doc("temp.example/1")
    out = w.refresh()
    assert out["segments"] == 0
    assert get_doc(built, "temp.example/1") is None


def test_buffered_batch_one_segment_per_partition(built):
    w = DocWriter(built)
    for i in range(12):
        w.index_doc({"url": f"batch.example/{i}", "text": f"fresh word{i}"})
    out = w.refresh()
    assert out["docs"] == 12
    # <= num_partitions micro-segments for the whole batch
    assert out["segments"] <= 4
    s = LocalSearcher(built)
    assert s.count({"match_all": {}}) == N + 12
    # second refresh round gets distinct seg ids
    w2 = DocWriter(built)
    w2.index_doc({"url": "batch.example/0", "text": "fresh replaced"})
    w2.refresh()
    assert get_doc(built, "batch.example/0")["text"] == "fresh replaced"
    assert LocalSearcher(built).count({"match_all": {}}) == N + 12
    m = load_index_manifest(built)
    seg_ids = [r["seg_id"] for r in m["segments"]]
    assert len(seg_ids) == len(set(seg_ids))


def test_seq_no_monotonic_across_writers(built):
    r1 = index_doc(built, {"url": "a.example/1", "text": "one"})
    r2 = index_doc(built, {"url": "a.example/2", "text": "two"})
    assert r2["_seq_no"] > r1["_seq_no"]
    w = DocWriter(built)
    r3 = w.delete_doc("a.example/1")
    assert r3["_seq_no"] > r2["_seq_no"]


def test_docwrite_survives_merge(built):
    """Micro-segments carry stored-source columns the bulk segments
    lack and OVERLAP their url ranges — both merge paths must keep the
    point-GET bisect contract (url_index sidecar) and null-fill the
    missing columns."""
    from raydex.index.merge import merge_partition_segments

    index_doc(built, {"url": "new.example/a", "text": "zebra words",
                      "lang": "en"})
    index_doc(built, {"url": "s1.example/p/1", "text": "replaced words"})
    m = load_index_manifest(built)
    merges: dict = {}
    for r in m["segments"]:
        merges.setdefault(r["part"], []).append(r["seg_id"])
    merge_partition_segments(built, merges)
    s = LocalSearcher(built)
    assert s.count({"match_all": {}}) == N + 1
    assert s.count({"term": {"text": "zebra"}}) == 1
    assert get_doc(built, "new.example/a")["text"] == "zebra words"
    assert get_doc(built, "s1.example/p/1")["text"] == "replaced words"
    # a bulk doc with no stored source still resolves post-merge
    assert get_doc(built, "s2.example/p/2")["url"] == "s2.example/p/2"


def test_bulk_apply_wire_format(built):
    """_bulk action-line NDJSON: per-item isolation + one refresh."""
    from raydex.index.docwrite import bulk_apply

    body = [
        '{"index": {"_id": "b.example/1"}}',
        '{"text": "walrus one"}',
        '{"create": {"_id": "b.example/2"}}',
        '{"text": "walrus two"}',
        '{"create": {"_id": "b.example/2"}}',   # conflict -> 409
        '{"text": "dupe"}',
        '{"update": {"_id": "b.example/1"}}',
        '{"doc": {"lang": "en"}}',
        '{"update": {"_id": "ghost.example/9"}}',  # missing -> 404
        '{"doc": {"text": "x"}}',
        '{"delete": {"_id": "s2.example/p/2"}}',
        '{"delete": {"_id": "never.example/1"}}',  # not_found -> 404
    ]
    out = bulk_apply(built, body)
    assert out["errors"] is True
    st = [list(it.values())[0]["status"] for it in out["items"]]
    assert st == [201, 201, 409, 200, 404, 200, 404]
    s = LocalSearcher(built)
    assert s.count({"term": {"text": "walrus"}}) == 2
    assert get_doc(built, "b.example/1")["lang"] == "en"
    assert get_doc(built, "s2.example/p/2") is None
    assert s.count({"match_all": {}}) == N + 1  # +2 created -1 deleted
    # file-path form + idempotent re-delete
    import os
    p = os.path.join(os.path.dirname(built), "bulk.ndjson")
    with open(p, "w") as f:
        f.write('{"delete": {"_id": "b.example/1"}}\n')
        f.write('{"index": {"_id": "b.example/3"}}\n')
        f.write('{"text": "walrus three"}\n')
    out2 = bulk_apply(built, p)
    assert out2["errors"] is False
    assert LocalSearcher(built).count({"term": {"text": "walrus"}}) == 2


def test_scripted_update(built):
    """Scripted _update: ctx._source mutation + ctx.op index/delete/
    none (UpdateHelper.executeScriptedUpsert contract)."""
    from raydex.index.docwrite import register_update_script

    index_doc(built, {"url": "sc.example/1", "text": "counter doc",
                      "counter": 1})
    w = DocWriter(built)
    r = w.update_doc("sc.example/1",
                     script={"source": "increment_field",
                             "params": {"field": "counter", "by": 4}})
    assert r["result"] == "updated"
    w.refresh()
    assert get_doc(built, "sc.example/1")["counter"] == 5
    # ctx.op = none -> noop; ctx.op = delete -> tombstone
    r = update_doc(built, "sc.example/1",
                   script={"source": "delete_if_eq",
                           "params": {"field": "counter", "value": 99}})
    assert r["result"] == "noop"
    r = update_doc(built, "sc.example/1",
                   script={"source": "delete_if_eq",
                           "params": {"field": "counter", "value": 5}})
    assert r["result"] == "deleted"
    assert get_doc(built, "sc.example/1") is None
    # missing doc + upsert: upsert indexed as-is, script NOT run
    register_update_script("set_tag", lambda ctx, p: ctx["_source"]
                           .__setitem__("tag", p["tag"]))
    r = update_doc(built, "sc.example/2",
                   script={"source": "set_tag", "params": {"tag": "t"}},
                   upsert={"text": "upserted words"})
    assert r["result"] == "created"
    row = get_doc(built, "sc.example/2")
    assert row["text"] == "upserted words" and "tag" not in row
    # doc + script together rejected
    with pytest.raises(ValueError):
        update_doc(built, "sc.example/2", doc={"lang": "en"},
                   script={"source": "set_tag", "params": {"tag": "x"}})
    # unknown script name
    with pytest.raises(ValueError):
        update_doc(built, "sc.example/2", script={"source": "nope"})


def test_realtime_get_reads_buffer(built):
    """realtime GET: buffered docs fetchable before refresh; deleted
    docs invisible; searchability still refresh-gated."""
    w = DocWriter(built)
    w.index_doc({"url": "rt.example/1", "text": "realtime ocelot"})
    assert w.get("rt.example/1")["text"] == "realtime ocelot"
    assert get_doc(built, "rt.example/1") is None  # non-realtime path
    assert LocalSearcher(built).count(
        {"term": {"text": "ocelot"}}) == 0
    w.delete_doc("s4.example/p/4")
    assert w.get("s4.example/p/4") is None          # tombstone wins
    assert get_doc(built, "s4.example/p/4") is not None
    w.refresh()
    assert get_doc(built, "rt.example/1")["text"] == "realtime ocelot"
    assert get_doc(built, "s4.example/p/4") is None


# -- round-5: join-field routing + translog replay --------------------------

def _join_index(tmp_path, ray_session):
    import json

    from raydex.index.segment import FieldSpec

    rows = []
    for i in range(12):
        rows.append((f"q{i}", f"question topic{i % 3}",
                     json.dumps({"name": "question"})))
        for j in range(i % 3):
            rows.append((f"a{i}-{j}", f"answer detail{j}",
                         json.dumps({"name": "answer", "parent": f"q{i}"})))
    t = pa.table({
        "url": pa.array([r[0] for r in rows]),
        "warc_ts": pa.array(list(range(len(rows)))).cast(pa.timestamp("us")),
        "text": pa.array([r[1] for r in rows], pa.large_string()),
        "join_field": pa.array([r[2] for r in rows]),
    })
    p = str(tmp_path / "jp.parquet")
    pq.write_table(t, p)
    idx = str(tmp_path / "jidx")
    spec = FieldSpec("join_field", source="join_field", analyzer="join",
                     relations={"question": ["answer"]})
    build_index(p, idx, num_partitions=3, analyzer="standard",
                source="text", max_docs_per_segment=8, fields=[spec])
    return idx


def test_join_index_child_ops_require_routing(ray_session, tmp_path):
    """ADVICE r4: id-only ops on a join index must not silently target
    the wrong partition — child ops require routing; parent ops
    self-route."""
    import json

    idx = _join_index(tmp_path, ray_session)
    w = DocWriter(idx)
    # parent resolves via self-routing (no explicit routing needed)
    assert w.delete_doc("q3")["result"] == "deleted"
    # child without routing: rejected, not silently not_found
    with pytest.raises(ValueError, match="routing is required"):
        w.delete_doc("a5-1")
    # child WITH routing: found and deleted
    assert w.delete_doc("a5-1", routing="q5")["result"] == "deleted"
    w.refresh()
    s = LocalSearcher(idx)
    assert s.count({"ids": {"values": ["q3", "a5-1"]}}) == 0
    # re-index of an existing child doc routes by the PARENT key, so
    # latest-wins holds (the r4 corruption: old copy stayed live)
    w2 = DocWriter(idx)
    before = s.count({"match_all": {}})
    r = w2.index_doc({
        "url": "a7-0", "text": "answer rewritten detail",
        "join_field": json.dumps({"name": "answer", "parent": "q7"})})
    assert r["result"] == "updated"  # existence seen via parent routing
    w2.refresh()
    s2 = LocalSearcher(idx)
    assert s2.count({"match_all": {}}) == before  # no duplicate
    assert s2.count({"match": {"text": "rewritten"}}) == 1


def test_refresh_crash_between_append_and_delete_recovers(built):
    """ADVICE r4: a crash mid-refresh must never lose the update. The
    journal in write_log.json replays; the append-before-delete order
    leaves at worst a recoverable duplicate."""
    import json
    import os

    w = DocWriter(built)
    w.index_doc({"url": "s1.example/p/1", "text": "page crash rewrite one"})
    w.delete_doc("s2.example/p/7")
    # simulate the crash: journal written, nothing else happened
    from raydex.index.docwrite import _store_seq
    _store_seq(built, w._seq, pending={"docs": w.buffer,
                                       "tombstones": w.tombstones})
    del w

    w2 = DocWriter(built)  # replays the journal
    assert "s1.example/p/1" in w2.buffer
    assert "s2.example/p/7" in w2.tombstones
    out = w2.refresh()
    assert out["docs"] == 1
    s = LocalSearcher(built)
    assert s.count({"match": {"text": "crash"}}) == 1
    assert s.count({"ids": {"values": ["s2.example/p/7"]}}) == 0
    assert s.count({"ids": {"values": ["s1.example/p/1"]}}) == 1  # no dup
    # journal cleared after the successful refresh
    with open(os.path.join(built, "write_log.json")) as f:
        assert "pending" not in json.load(f)


def test_index_sort_flush_none_safe(ray_session, tmp_path):
    """ADVICE r4: _flush_segments index-sort path must tolerate None
    sort values and must not duplicate dl/norm columns."""
    p = str(tmp_path / "pages.parquet")
    pq.write_table(_pages(), p)
    idx = str(tmp_path / "idx_sorted")
    build_index(p, idx, num_partitions=2, analyzer="standard_en",
                index_sort=("warc_ts", "desc"))
    w = DocWriter(idx)
    # None sort value + a doc carrying dl/norm keys (reserved strip)
    w.index_doc({"url": "x.example/1", "text": "sorted flush alpha",
                 "warc_ts": None, "dl": 999, "norm": 5})
    w.index_doc({"url": "x.example/2", "text": "sorted flush beta",
                 "warc_ts": 12345})
    w.refresh()
    row = get_doc(idx, "x.example/1")
    assert row is not None
    # stored dl is the COMPUTED doc length, not the injected 999
    assert row["dl"] == 3
    s = LocalSearcher(idx)
    assert s.count({"match": {"text": "flush"}}) == 2
