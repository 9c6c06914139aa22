"""REST-surface round-out: _msearch(+/template), GET _source,
_search_shards, painless _execute, _segments, _stats, mapping APIs,
enrich policy lifecycle, _rollup_search, _resolve/index, and the grok
built-in pattern bank."""

import json

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from raydex.corpus import make_pages_table
from raydex.index.build import build_index
from raydex.search.scatter import LocalSearcher


@pytest.fixture(scope="module")
def idx(tmp_path_factory, ray_session):
    d = tmp_path_factory.mktemp("miscapi")
    t = make_pages_table(200, seed=7)
    p = str(d / "pages.parquet")
    pq.write_table(t, p)
    out = str(d / "idx")
    build_index(p, out, num_partitions=2, source="text")
    return out


def test_msearch_isolates_errors(idx):
    from raydex.search.misc_api import msearch

    s = LocalSearcher(idx)
    res = msearch(s, [
        {"query": {"match": {"text": "data"}}, "size": 3},
        {"query": {"bogus_kind": {}}},
        {"query": {"match_all": {}}, "size": 2},
    ])
    assert len(res) == 3
    assert res[0]["status"] == 200 and len(res[0]["hits"]) <= 3
    assert res[1]["status"] == 400 and "error" in res[1]
    assert res[2]["status"] == 200 and len(res[2]["hits"]) == 2
    # single search equivalence (the msearch contract)
    solo = s.search_query({"match": {"text": "data"}}, k=3)
    assert [h["url"] for h in res[0]["hits"]] == [h["url"] for h in solo]


def test_msearch_template(idx):
    from raydex.search.misc_api import msearch_template

    s = LocalSearcher(idx)
    res = msearch_template(s, [
        {"source": {"query": {"match": {"text": "{{term}}"}},
                    "size": "{{sz}}"},
         "params": {"term": "data", "sz": 2}},
    ])
    assert res[0]["status"] == 200 and len(res[0]["hits"]) <= 2


def test_get_source_and_exists(idx):
    from raydex.search.misc_api import exists_source, get_source

    s = LocalSearcher(idx)
    url = s.search_query({"match_all": {}}, k=1)[0]["url"]
    src = get_source(idx, url)
    assert src is not None and src["url"] == url and "dl" in src
    proj = get_source(idx, url, source=["url"])
    assert set(proj) == {"url"}
    excl = get_source(idx, url, source={"excludes": ["dl*"]})
    assert "dl" not in excl and "url" in excl
    assert exists_source(idx, url)
    assert get_source(idx, "https://nope.example/x") is None
    assert not exists_source(idx, "https://nope.example/x")


def test_search_shards(idx):
    from raydex.search.misc_api import search_shards

    out = search_shards(idx)
    assert len(out["shards"]) >= 2  # one per partition at least
    total = sum(sh["doc_count"] for sh in out["shards"])
    assert total == out["indices"][idx]["doc_count"]
    assert all(sh["segments"] for sh in out["shards"])


def test_painless_execute():
    from raydex.search.fetchphase import register_field_script
    from raydex.search.misc_api import painless_execute

    register_field_script(
        "t_sum2", lambda doc, p: doc.get("a", 0) + p.get("b", 0))
    out = painless_execute({
        "script": {"source": "t_sum2", "params": {"b": 5}},
        "context_setup": {"document": {"a": 37}},
    })
    assert out == {"result": 42}
    with pytest.raises(ValueError):
        painless_execute({"script": {"source": "no_such_script"}})


def test_segments_and_stats(idx):
    from raydex.index.stats_api import index_segments, index_stats

    segs = index_segments(idx)["indices"][idx]["shards"]
    assert len(segs) >= 2
    for rows in segs.values():
        for r in rows:
            assert r["num_docs"] > 0 and r["size_in_bytes"] > 0
            assert r["deleted_docs"] == 0
    st = index_stats(idx)["_all"]["primaries"]
    man = json.load(open(f"{idx}/index_manifest.json"))
    assert st["docs"]["count"] == man["doc_count"]
    assert st["segments"]["count"] == len(man["segments"])
    assert st["store"]["size_in_bytes"] > 0


def test_stats_reflect_deletes(idx, tmp_path):
    import shutil

    from raydex.index.deletes import delete_by_query
    from raydex.index.stats_api import index_stats

    d2 = str(tmp_path / "delidx")
    shutil.copytree(idx, d2)
    n = delete_by_query(d2, {"match": {"text": "data"}}, use_ray=False)
    if isinstance(n, dict):
        n = n.get("deleted", 0)
    st = index_stats(d2)["_all"]["primaries"]
    assert st["docs"]["deleted"] > 0
    man = json.load(open(f"{d2}/index_manifest.json"))
    assert st["docs"]["count"] == man["doc_count"] - st["docs"]["deleted"]


def test_mapping_apis(idx, tmp_path):
    import shutil

    from raydex.index.stats_api import (
        get_field_mapping,
        get_mapping,
        put_mapping,
    )

    m = get_mapping(idx)[idx]["mappings"]["properties"]
    assert m["url"] == {"type": "keyword"}
    assert m["text"]["type"] == "text"

    fm = get_field_mapping(idx, ["te*"])[idx]["mappings"]
    assert "text" in fm and fm["text"]["full_name"] == "text"

    d2 = str(tmp_path / "mapidx")
    shutil.copytree(idx, d2)
    put_mapping(d2, {"views": {"type": "long"},
                     "tag": {"type": "keyword"}})
    m2 = get_mapping(d2)[d2]["mappings"]["properties"]
    assert m2["views"] == {"type": "long"}
    assert m2["tag"] == {"type": "keyword"}
    # idempotent re-put; conflicting change rejects (MapperService.merge)
    put_mapping(d2, {"views": {"type": "long"}})
    with pytest.raises(ValueError):
        put_mapping(d2, {"views": {"type": "keyword"}})
    # a new mapped field is searchable-empty, not an error
    s = LocalSearcher(d2)
    assert s.count({"term": {"views": 7}}) == 0


def test_enrich_lifecycle(tmp_path):
    from raydex.ops.enrich import EnrichRegistry

    src = pa.table({
        "host": ["a.example", "b.example", "a.example"],
        "owner": ["ops", "dev", "sre"],   # last a.example wins
        "tier": [1, 2, 3],
    })
    p = str(tmp_path / "hosts.parquet")
    pq.write_table(src, p)
    reg = EnrichRegistry(str(tmp_path / "enrich"))
    reg.put_policy("hosts", {"match": {
        "indices": p, "match_field": "host",
        "enrich_fields": ["owner", "tier"]}})
    with pytest.raises(ValueError):
        reg.put_policy("hosts", {"match": {
            "indices": p, "match_field": "host",
            "enrich_fields": ["owner"]}})
    with pytest.raises(ValueError):
        reg.lookup("hosts")  # not executed yet
    out = reg.execute_policy("hosts")
    assert out["rows"] == 2
    lk = reg.lookup("hosts")
    assert lk["a.example"] == {"owner": "sre", "tier": 3}  # last wins
    assert lk["b.example"]["owner"] == "dev"
    # decorate through the ingest processor
    import pandas as pd

    from raydex.ops.processors import p_enrich
    df = pd.DataFrame({"host": ["b.example", "c.example"]})
    got = p_enrich(df, field="host", lookup=lk, target="meta")
    assert got["meta"][0]["owner"] == "dev"
    names = [pol["config"]["match"]["name"]
             for pol in reg.get_policy()["policies"]]
    assert names == ["hosts"]
    reg.delete_policy("hosts")
    with pytest.raises(KeyError):
        reg.get_policy("hosts")


def test_rollup_search(ray_session, tmp_path):
    import numpy as np
    import ray

    from raydex.ops.rollup import rollup, rollup_search

    n = 500
    rng = np.random.default_rng(11)
    ts = (np.arange(n) * 3_600_000_000).astype("int64")  # hourly us
    t = pa.table({
        "ts": ts,
        "host": pa.array(rng.choice(["a", "b"], n)),
        "lat": rng.integers(1, 100, n).astype("float64"),
    })
    ds = ray.data.from_arrow(t)
    day = 86_400_000_000
    rolled_ds = rollup(ds, "ts", day, dims=["host"],
                       metrics={"lat": ["avg", "min", "max", "sum",
                                        "value_count"]})
    rolled = pa.concat_tables(
        [pa.table(b) for b in rolled_ds.iter_batches(batch_format="pyarrow")])

    out = rollup_search(rolled, {"aggregations": {
        "by_host": {"terms": {"field": "host"},
                    "aggs": {"avg_lat": {"avg": {"field": "lat"}},
                             "max_lat": {"max": {"field": "lat"}},
                             "n": {"value_count": {"field": "lat"}}}}}})
    buckets = {b["key"]: b for b in out["aggregations"]["by_host"]["buckets"]}
    assert set(buckets) == {"a", "b"}
    # re-combined moments equal the live computation
    lats = t["lat"].to_numpy()
    hosts = t["host"].to_pylist()
    for h in ("a", "b"):
        mask = np.array([x == h for x in hosts])
        b = buckets[h]
        assert b["doc_count"] == int(mask.sum())
        assert b["n"]["value"] == int(mask.sum())
        assert b["max_lat"]["value"] == lats[mask].max()
        assert abs(b["avg_lat"]["value"] - lats[mask].mean()) < 1e-9
    with pytest.raises(ValueError):
        rollup_search(rolled, {"aggregations": {
            "x": {"terms": {"field": "nope"}}}})


def test_resolve_index(idx, tmp_path):
    from raydex.index.aliases import AliasRegistry, resolve_index
    from raydex.index.datastream import DataStreamRegistry

    areg = AliasRegistry(str(tmp_path / "reg"))
    areg.update_aliases([{"add": {"alias": "web", "index": idx,
                                  "is_write_index": True}}])
    dreg = DataStreamRegistry(str(tmp_path / "ds"))
    dreg.create("logs-web")

    out = resolve_index("we*,logs-*," + idx,
                        alias_root=str(tmp_path / "reg"),
                        ds_root=str(tmp_path / "ds"))
    assert out["aliases"] == [{"name": "web", "indices": [idx]}]
    assert out["data_streams"][0]["name"] == "logs-web"
    assert out["indices"][0]["name"] == idx


def test_grok_patterns_api():
    from raydex.ops.processors import grok_patterns

    pats = grok_patterns()["patterns"]
    assert "GREEDYDATA" in pats and "LOGLEVEL" in pats
    # the bank drives the processor
    import pandas as pd

    from raydex.ops.processors import p_grok
    df = pd.DataFrame({"msg": ["2024-01-02T03:04:05Z ERROR boom"]})
    got = p_grok(df, field="msg",
                 pattern="%{TIMESTAMP_ISO8601:ts} %{LOGLEVEL:lvl} %{GREEDYDATA:rest}")
    assert got["lvl"][0] == "ERROR" and got["ts"][0].startswith("2024-")


def test_index_blocks(idx, tmp_path):
    import shutil

    from raydex.index.blocks import (
        IndexBlockedError,
        add_block,
        close_index,
        freeze_index,
        open_index,
        remove_block,
        unfreeze_index,
    )
    from raydex.index.deletes import delete_by_query

    d2 = str(tmp_path / "blkidx")
    shutil.copytree(idx, d2)

    close_index(d2)
    with pytest.raises(IndexBlockedError):
        LocalSearcher(d2)
    with pytest.raises(IndexBlockedError):
        delete_by_query(d2, {"match": {"text": "data"}}, use_ray=False)
    open_index(d2)
    assert LocalSearcher(d2).count({"match_all": {}}) > 0

    # write block: reads fine, deletes reject
    add_block(d2, "write")
    assert LocalSearcher(d2).count({"match_all": {}}) > 0
    with pytest.raises(IndexBlockedError):
        delete_by_query(d2, {"match": {"text": "data"}}, use_ray=False)
    remove_block(d2, "write")

    # frozen == searchable + write-blocked
    freeze_index(d2)
    assert LocalSearcher(d2).count({"match_all": {}}) > 0
    with pytest.raises(IndexBlockedError):
        delete_by_query(d2, {"match": {"text": "data"}}, use_ray=False)
    unfreeze_index(d2)
    n = delete_by_query(d2, {"match": {"text": "data"}}, use_ray=False)
    assert n["deleted"] >= 0


def test_simulate_templates(tmp_path):
    from raydex.index.templates import (
        IndexTemplateRegistry,
        simulate_index_template,
        simulate_template,
    )

    reg = IndexTemplateRegistry(str(tmp_path / "tpl"))
    reg.put_component("base", {"settings": {"num_partitions": 4}})
    reg.put_template("logs", ["logs-*"], {"settings": {"analyzer":
                                                       "standard_en"}},
                     composed_of=["base"], priority=10)
    reg.put_template("low", ["logs-2024*"], {"settings": {}}, priority=1)

    sim = simulate_index_template(reg, "logs-2024-01")
    assert sim["matched_template"] == "logs"
    assert sim["template"]["settings"]["num_partitions"] == 4
    assert sim["template"]["settings"]["analyzer"] == "standard_en"
    assert [o["name"] for o in sim["overlapping"]] == ["low"]

    named = simulate_template(reg, "logs")
    assert named["template"]["settings"]["num_partitions"] == 4
    assert named["priority"] == 10
    with pytest.raises(KeyError):
        simulate_template(reg, "nope")
