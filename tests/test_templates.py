"""Search templates + stored scripts (mustache core) and composable
index templates (component merge, priority match, overlap rejection)."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from raydex.index.build import build_index, load_index_manifest
from raydex.index.templates import IndexTemplateRegistry
from raydex.search.scatter import LocalSearcher
from raydex.search.templates import ScriptStore, render_template, search_template


# ------------------------------------------------------ search templates


def test_render_scalars_and_defaults():
    src = '{"query": {"term": {"text": "{{word}}"}}, "size": {{size}}{{^size}}10{{/size}}}'
    assert render_template(src, {"word": "web", "size": 3}) == {
        "query": {"term": {"text": "web"}}, "size": 3
    }
    assert render_template(src, {"word": "web"}) == {
        "query": {"term": {"text": "web"}}, "size": 10
    }
    with pytest.raises(KeyError, match="word"):
        render_template(src, {"size": 1})


def test_render_tojson_arrays():
    src = '{"query": {"terms": {"text": "{{#toJson}}words{{/toJson}}"}}}'
    out = render_template(src, {"words": ["a", "b"]})
    assert out == {"query": {"terms": {"text": ["a", "b"]}}}


def test_stored_scripts_roundtrip(tmp_path):
    store = ScriptStore(str(tmp_path))
    store.put("my_q", {"query": {"match": {"text": "{{q}}"}}, "size": "{{k}}{{^k}}5{{/k}}"})
    body = store.render("my_q", {"q": "hello", "k": 2})
    assert body["query"] == {"match": {"text": "hello"}}
    store.delete("my_q")
    with pytest.raises(KeyError):
        store.get("my_q")


@pytest.fixture(scope="module")
def tiny_index(ray_session, tmp_path_factory):
    t = pa.table(
        {
            "url": pa.array([f"a.example/{i}" for i in range(30)]),
            "warc_ts": pa.array(list(range(30)), pa.int64()).cast(pa.timestamp("us")),
            "text": pa.array(
                [f"doc {'hot' if i % 5 == 0 else 'cold'} item {i}" for i in range(30)],
                pa.large_string(),
            ),
        }
    )
    p = str(tmp_path_factory.mktemp("tp") / "pages.parquet")
    pq.write_table(t, p)
    idx = str(tmp_path_factory.mktemp("ti") / "index")
    build_index(p, idx, num_partitions=1, analyzer="standard_en")
    return idx


def test_search_template_end_to_end(tiny_index, tmp_path):
    s = LocalSearcher(tiny_index)
    store = ScriptStore(str(tmp_path))
    store.put("hot_docs",
              '{"query": {"term": {"text": "{{what}}"}}, "size": {{n}}}')
    hits = search_template(s, "hot_docs", {"what": "hot", "n": 4},
                           store=store)
    assert len(hits) == 4
    direct = s.search_query({"term": {"text": "hot"}}, k=4)
    assert [(h["url"], h["score"]) for h in hits] == [
        (h["url"], h["score"]) for h in direct
    ]
    # inline template path
    hits2 = search_template(
        s, '{"query": {"term": {"text": "{{w}}"}}}', {"w": "cold"}, k=3
    )
    assert len(hits2) == 3


# ------------------------------------------------------- index templates


def test_component_merge_and_priority(tmp_path):
    reg = IndexTemplateRegistry(str(tmp_path))
    reg.put_component("base_settings",
                      {"settings": {"num_partitions": 8, "analyzer": "standard"}})
    reg.put_component("url_field",
                      {"mappings": [{"name": "u", "source": "url",
                                     "analyzer": "keywordish"}]})
    reg.put_template("logs", ["logs-*"], priority=10,
                     composed_of=["base_settings", "url_field"],
                     template={"settings": {"analyzer": "standard_en"}})
    reg.put_template("catchall", ["*"], priority=0)
    assert reg.match("logs-2024") == "logs"
    assert reg.match("web-2024") == "catchall"
    body = reg.resolve("logs-2024")
    # template body overrides component (later wins)
    assert body["settings"] == {"num_partitions": 8, "analyzer": "standard_en"}
    assert [m["name"] for m in body["mappings"]] == ["u"]
    args = reg.build_args_for("logs-2024")
    assert args["num_partitions"] == 8 and args["analyzer"] == "standard_en"
    assert args["fields"][0].name == "u"
    # unknown component rejected
    with pytest.raises(ValueError, match="unknown component"):
        reg.put_template("bad", ["x-*"], composed_of=["nope"])


def test_overlap_rejected_same_priority(tmp_path):
    reg = IndexTemplateRegistry(str(tmp_path))
    reg.put_template("a", ["logs-*"], priority=5)
    with pytest.raises(ValueError, match="conflicts"):
        reg.put_template("b", ["logs-app*"], priority=5)
    # different priority is fine (the reference allows shadowing)
    reg.put_template("b", ["logs-app*"], priority=6)
    assert reg.match("logs-app1") == "b"


def test_template_driven_build(ray_session, tmp_path):
    reg = IndexTemplateRegistry(str(tmp_path))
    reg.put_template("t", ["idx-*"], template={
        "settings": {"num_partitions": 2, "max_docs_per_segment": 10},
        "mappings": [{"name": "u", "source": "url", "analyzer": "keywordish"}],
    })
    t = pa.table(
        {
            "url": pa.array([f"b.example/{i}" for i in range(25)]),
            "warc_ts": pa.array(list(range(25)), pa.int64()).cast(pa.timestamp("us")),
            "text": pa.array([f"w{i}" for i in range(25)], pa.large_string()),
        }
    )
    p = str(tmp_path / "pg.parquet")
    pq.write_table(t, p)
    idx = str(tmp_path / "idx-001")
    m = build_index(p, idx, **reg.build_args_for("idx-001"))
    assert m["num_partitions"] == 2
    assert "u" in m["fields"]


def test_per_request_runtime_mappings(tiny_index):
    """`runtime_mappings` in the search request: a factory-defined field
    (regex over the stored url) is term-queryable for THIS request only,
    shadowing nothing global; same request distributed == local."""
    from raydex.search.scatter import RaySearcher

    s = LocalSearcher(tiny_index)
    rm = {"suffix": {"factory": "url_regex",
                     "params": {"pattern": r"/(\d+)$", "group": 1}}}
    q = {"term": {"suffix": "7"}}
    hits = s.search_query(q, k=10, runtime_mappings=rm)
    assert [h["url"] for h in hits] == ["a.example/7"]
    assert s.count(q, runtime_mappings=rm) == 1
    # without the mapping the field is unknown
    import pytest as _pytest

    with _pytest.raises(Exception, match="runtime"):
        s.search_query(q, k=10)
    rs = RaySearcher(tiny_index, num_actors=1)
    try:
        dist = rs.search_query(q, k=10, runtime_mappings=rm)
    finally:
        rs.shutdown()
    assert [h["url"] for h in dist] == ["a.example/7"]
