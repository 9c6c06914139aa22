"""Dedicated completion field type (``CompletionFieldMapper.java`` +
``search/suggest/completion/``): index-time input-sorted weighted table
per segment (the weighted-FST analogue), prefix search = binary-search
range + top-k by weight, scatter-merge across segments.
"""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from raydex.index.build import build_index, segment_dirs
from raydex.index.segment import FieldSpec, SegmentReader
from raydex.search.suggest import (
    completion_field_suggest,
    merge_completion_options,
)

SUGG = [
    ("sugar", 7), ("suggest", 30), ("suggestion", 20), ("sun", 5),
    ("summer", 12), ("table", 9), ("tablet", 25), ("suggestive", 2),
    ("sum", 40), ("tab", 1),
]


def _corpus():
    n = len(SUGG)
    return pa.table(
        {
            "url": pa.array([f"s{i}.example/p/{i}" for i in range(n)]),
            "warc_ts": pa.array(list(range(n)), pa.int64()).cast(pa.timestamp("us")),
            "text": pa.array([f"doc {i}" for i in range(n)], pa.large_string()),
            "sugg": pa.array(
                [{"input": s, "weight": w} for s, w in SUGG],
                pa.struct([("input", pa.string()), ("weight", pa.int64())]),
            ),
        }
    )


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("comp_pages") / "pages.parquet")
    pq.write_table(_corpus(), p)
    idx = str(tmp_path_factory.mktemp("comp_idx") / "index")
    m = build_index(
        p, idx, num_partitions=2, analyzer="standard", source="text",
        fields=[FieldSpec("sugg", source="sugg", analyzer="completion")],
    )
    return idx, m


def _scatter(idx, m, prefix, size=5, skip_duplicates=False):
    per_seg = [
        completion_field_suggest(SegmentReader(sd), "sugg", prefix, size=size,
                                 skip_duplicates=skip_duplicates)
        for sd in segment_dirs(idx, m)
    ]
    return merge_completion_options(per_seg, size=size,
                                    skip_duplicates=skip_duplicates)


def test_layout_and_manifest(built):
    idx, m = built
    assert m["fields"]["sugg"]["analyzer"] == "completion"
    total = 0
    for sd in segment_dirs(idx, m):
        r = SegmentReader(sd)
        inputs, weights, docids, _ctx = r.completion_field("sugg")
        assert list(inputs) == sorted(inputs)  # the dedicated sort
        assert r.field("sugg") is None
        total += len(inputs)
    assert total == len(SUGG)


@pytest.mark.parametrize(
    "prefix,expected",
    [
        # top by weight desc then text asc — the reference's collector order
        ("su", ["sum", "suggest", "suggestion", "summer", "sugar"]),
        ("sugg", ["suggest", "suggestion", "suggestive"]),
        ("tab", ["tablet", "table", "tab"]),
        ("z", []),
        ("suggestz", []),
    ],
)
def test_prefix_topk(built, prefix, expected):
    idx, m = built
    got = [o["text"] for o in _scatter(idx, m, prefix, size=5)]
    assert got == expected


def test_weights_and_urls(built):
    idx, m = built
    opts = _scatter(idx, m, "sugg", size=3)
    byname = dict((s, w) for s, w in SUGG)
    for o in opts:
        assert o["weight"] == byname[o["text"]]
        i = [s for s, _ in SUGG].index(o["text"])
        assert o["url"] == f"s{i}.example/p/{i}"


def test_plain_string_column(ray_session, tmp_path_factory):
    """A bare string source column is accepted with weight=1."""
    t = pa.table(
        {
            "url": pa.array(["a.example/1", "b.example/2"]),
            "warc_ts": pa.array([1, 2], pa.int64()).cast(pa.timestamp("us")),
            "text": pa.array(["x", "y"], pa.large_string()),
            "sugg": pa.array(["hello", "help"], pa.string()),
        }
    )
    p = str(tmp_path_factory.mktemp("comp_str") / "pages.parquet")
    pq.write_table(t, p)
    idx = str(tmp_path_factory.mktemp("comp_str_idx") / "index")
    m = build_index(p, idx, num_partitions=1, analyzer="standard",
                    source="text",
                    fields=[FieldSpec("sugg", "sugg", "completion")])
    got = _scatter(idx, m, "hel", size=5)
    assert [o["text"] for o in got] == ["hello", "help"]
    assert all(o["weight"] == 1 for o in got)


def test_skip_duplicates(ray_session, tmp_path_factory):
    t = pa.table(
        {
            "url": pa.array([f"d{i}.example/{i}" for i in range(3)]),
            "warc_ts": pa.array([1, 2, 3], pa.int64()).cast(pa.timestamp("us")),
            "text": pa.array(["x", "y", "z"], pa.large_string()),
            "sugg": pa.array(
                [{"input": "dup", "weight": 5}, {"input": "dup", "weight": 9},
                 {"input": "dupx", "weight": 1}],
                pa.struct([("input", pa.string()), ("weight", pa.int64())]),
            ),
        }
    )
    p = str(tmp_path_factory.mktemp("comp_dup") / "pages.parquet")
    pq.write_table(t, p)
    idx = str(tmp_path_factory.mktemp("comp_dup_idx") / "index")
    m = build_index(p, idx, num_partitions=1, analyzer="standard",
                    source="text",
                    fields=[FieldSpec("sugg", "sugg", "completion")])
    dedup = _scatter(idx, m, "du", size=5, skip_duplicates=True)
    assert [(o["text"], o["weight"]) for o in dedup] == [("dup", 9), ("dupx", 1)]
    full = _scatter(idx, m, "du", size=5)
    assert [(o["text"], o["weight"]) for o in full] == [
        ("dup", 9), ("dup", 5), ("dupx", 1)]


CTX_SUGG = [
    ("paris cafe", 10, ["paris"]),
    ("paris metro", 20, ["paris"]),
    ("london cafe", 30, ["london"]),
    ("paradise", 40, []),
]


@pytest.fixture(scope="module")
def ctx_built(ray_session, tmp_path_factory):
    n = len(CTX_SUGG)
    typ = pa.struct([
        ("input", pa.string()), ("weight", pa.int64()),
        ("contexts", pa.struct([("place", pa.list_(pa.string()))])),
    ])
    t = pa.table({
        "url": pa.array([f"c{i}.example/p/{i}" for i in range(n)]),
        "warc_ts": pa.array(list(range(n)), pa.int64()).cast(pa.timestamp("us")),
        "text": pa.array([f"doc {i}" for i in range(n)], pa.large_string()),
        "sugg": pa.array(
            [{"input": s, "weight": w,
              "contexts": {"place": c}} for s, w, c in CTX_SUGG], typ),
    })
    p = str(tmp_path_factory.mktemp("comp_ctx") / "pages.parquet")
    pq.write_table(t, p)
    idx = str(tmp_path_factory.mktemp("comp_ctx_idx") / "index")
    m = build_index(p, idx, num_partitions=1, analyzer="standard",
                    source="text",
                    fields=[FieldSpec("sugg", "sugg", "completion")])
    return idx, m


def _one(idx, m, prefix, **kw):
    (sd,) = segment_dirs(idx, m)
    return completion_field_suggest(SegmentReader(sd), "sugg", prefix, **kw)


def test_context_filter_and_boost(ctx_built):
    idx, m = ctx_built
    # filter: only paris-context entries survive
    got = _one(idx, m, "pa", contexts={"place": ["paris"]})
    assert [o["text"] for o in got] == ["paris metro", "paris cafe"]
    # boost: a boosted clause reorders by weight x boost
    got = _one(idx, m, "", size=10, contexts={"place": [
        {"context": "paris", "boost": 10}, "london"]})
    scores = {o["text"]: o["score"] for o in got}
    assert scores["paris metro"] == 200.0   # 20 * 10
    assert scores["london cafe"] == 30.0    # boost 1 clause
    assert got[0]["text"] == "paris metro"
    # entries with no contexts are filtered when contexts are queried
    assert "paradise" not in scores


def test_no_contexts_query_matches_everything(ctx_built):
    idx, m = ctx_built
    got = _one(idx, m, "par", size=10)
    assert {o["text"] for o in got} == {"paris cafe", "paris metro",
                                       "paradise"}


def test_fuzzy_completion(built):
    idx, m = built
    # 'sugest' (dropped g) is 1 edit from the 'suggest*' prefixes
    per_seg = [completion_field_suggest(SegmentReader(sd), "sugg",
                                        "sugest", fuzzy=True, size=5)
               for sd in segment_dirs(idx, m)]
    got = merge_completion_options(per_seg, size=5)
    assert [o["text"] for o in got] == [
        "suggest", "suggestion", "suggestive"]
    assert all(not o["exact"] for o in got)
    # exact matches rank before fuzzy ones regardless of weight
    per_seg = [completion_field_suggest(SegmentReader(sd), "sugg",
                                        "sug", fuzzy=True, size=10)
               for sd in segment_dirs(idx, m)]
    got = merge_completion_options(per_seg, size=10)
    exact = [o["text"] for o in got if o["exact"]]
    # weight desc within the exact tier
    assert exact == ["suggest", "suggestion", "sugar", "suggestive"]
    fuzzy_tail = [o["text"] for o in got if not o["exact"]]
    assert "sum" in fuzzy_tail          # 'sug' -> 'sum' = 1 substitution
    assert got.index(next(o for o in got if o["text"] == "sum")) >= len(exact)


def test_fuzzy_min_length_gate(built):
    idx, m = built
    # prefix shorter than min_length: fuzzy degrades to exact
    (sd0, *_) = segment_dirs(idx, m)
    got = completion_field_suggest(SegmentReader(sd0), "sugg", "ta",
                                   fuzzy={"fuzziness": 2}, size=10)
    assert all(o["text"].startswith("ta") for o in got)


def test_fuzzy_transpositions(built):
    idx, m = built
    # 'usggest' = one adjacent swap from 'suggest'
    per_seg = [completion_field_suggest(
        SegmentReader(sd), "sugg", "usggest",
        fuzzy={"fuzziness": 1, "prefix_length": 0}, size=5)
        for sd in segment_dirs(idx, m)]
    got = merge_completion_options(per_seg, size=5)
    assert "suggest" in [o["text"] for o in got]
    per_seg = [completion_field_suggest(
        SegmentReader(sd), "sugg", "usggest",
        fuzzy={"fuzziness": 1, "prefix_length": 0,
               "transpositions": False}, size=5)
        for sd in segment_dirs(idx, m)]
    assert merge_completion_options(per_seg, size=5) == []


def test_geo_contexts(ray_session, tmp_path_factory):
    """GeoContextMapping: points index as precision-6 geohash cells;
    a geo query clause matches its cell + neighbours by prefix, so a
    coarser query precision widens the net."""
    paris = {"lat": 48.8566, "lon": 2.3522}
    london = {"lat": 51.5074, "lon": -0.1278}
    typ = pa.struct([
        ("input", pa.string()), ("weight", pa.int64()),
        ("contexts", pa.struct([
            ("location", pa.struct([("lat", pa.float64()),
                                    ("lon", pa.float64())]))])),
    ])
    t = pa.table({
        "url": pa.array(["g0.x/0", "g1.x/1"]),
        "warc_ts": pa.array([1, 2], pa.int64()).cast(pa.timestamp("us")),
        "text": pa.array(["a", "b"], pa.large_string()),
        "sugg": pa.array(
            [{"input": "cafe de flore", "weight": 5,
              "contexts": {"location": paris}},
             {"input": "cafe nero", "weight": 9,
              "contexts": {"location": london}}], typ),
    })
    p = str(tmp_path_factory.mktemp("comp_geo") / "pages.parquet")
    pq.write_table(t, p)
    idx = str(tmp_path_factory.mktemp("comp_geo_idx") / "index")
    m = build_index(p, idx, num_partitions=1, analyzer="standard",
                    source="text",
                    fields=[FieldSpec("sugg", "sugg", "completion")])
    (sd,) = segment_dirs(idx, m)
    r = SegmentReader(sd)
    # query near Paris at precision 6: only the Paris entry
    got = completion_field_suggest(
        r, "sugg", "cafe",
        contexts={"location": [{"context": paris}]})
    assert [o["text"] for o in got] == ["cafe de flore"]
    # coarse precision 3 from a point a few km away still matches via
    # the cell prefix + neighbours
    nearby = {"lat": 48.9, "lon": 2.4}
    got = completion_field_suggest(
        r, "sugg", "cafe",
        contexts={"location": [{"context": nearby, "precision": 3}]})
    assert [o["text"] for o in got] == ["cafe de flore"]
    # both cities queried: both match, boost reorders
    got = completion_field_suggest(
        r, "sugg", "cafe",
        contexts={"location": [
            {"context": paris, "boost": 10},
            {"context": london}]})
    assert [o["text"] for o in got] == ["cafe de flore", "cafe nero"]
    assert got[0]["score"] == 50.0


def test_geohash_neighbors_roundtrip():
    from raydex.ops.geo import (geohash_decode_bounds, geohash_encode,
                                geohash_neighbors)

    gh = geohash_encode([48.8566], [2.3522], precision=5)[0]
    lo, hi, llo, lhi = geohash_decode_bounds(gh)
    # center decodes back into the same cell
    assert geohash_encode([(lo + hi) / 2], [(llo + lhi) / 2], 5)[0] == gh
    nb = geohash_neighbors(gh)
    assert len(nb) == 8 and gh not in nb
    # every neighbour's center is one cell-size step away
    for n in nb:
        nlo, nhi, nllo, nlhi = geohash_decode_bounds(n)
        assert abs((nlo + nhi) / 2 - (lo + hi) / 2) <= (hi - lo) * 1.5
        assert abs((nllo + nlhi) / 2 - (llo + lhi) / 2) <= (lhi - llo) * 1.5


def test_fuzzy_prefix_acceptance_matches_brute():
    """_prefix_within_edits (the Levenshtein-automaton ∩ FST walk
    analogue) must equal the brute definition: some prefix of the
    input is within k edits of the query (restricted-Damerau)."""
    import itertools

    from raydex.search.suggest import _prefix_within_edits

    def dl(a, b):
        d = {}
        for i in range(len(a) + 1):
            d[i, 0] = i
        for j in range(len(b) + 1):
            d[0, j] = j
        for i in range(1, len(a) + 1):
            for j in range(1, len(b) + 1):
                cost = a[i - 1] != b[j - 1]
                d[i, j] = min(d[i - 1, j] + 1, d[i, j - 1] + 1,
                              d[i - 1, j - 1] + cost)
                if (i > 1 and j > 1 and a[i - 1] == b[j - 2]
                        and a[i - 2] == b[j - 1]):
                    d[i, j] = min(d[i, j], d[i - 2, j - 2] + 1)
        return d[len(a), len(b)]

    def brute(q, inp, k):
        return any(dl(q, inp[:j]) <= k for j in range(len(inp) + 1))

    words = ["".join(w) for w in itertools.product("abc", repeat=4)]
    queries = ["abca", "bcab", "aabb", "abc", "ccc", "abcab"]
    for q in queries:
        for w in words:
            for k in (0, 1, 2):
                assert _prefix_within_edits(q, w, k) == brute(q, w, k), \
                    (q, w, k)
