"""Watcher execution (x-pack watcher ExecutionService /
CompareCondition / LenientCompare): input.search -> condition ->
actions."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from raydex.index.build import build_index
from raydex.search.scatter import LocalSearcher
from raydex.search.watcher import check_condition, execute_watch


@pytest.fixture(scope="module")
def searcher(ray_session, tmp_path_factory):
    n = 40
    t = pa.table({
        "url": pa.array([f"w{i}.example" for i in range(n)]),
        "warc_ts": pa.array(np.arange(n, dtype="int64"),
                            pa.int64()).cast(pa.timestamp("us")),
        "text": pa.array(
            [("error disk full" if i % 4 == 0 else "ok heartbeat")
             + f" node{i}" for i in range(n)], pa.large_string()),
    })
    p = str(tmp_path_factory.mktemp("w_pages") / "pages.parquet")
    pq.write_table(t, p)
    d = str(tmp_path_factory.mktemp("w_idx") / "index")
    build_index(p, d, num_partitions=1, analyzer="standard", source="text",
                store_positions=True)  # match_phrase input needs positions
    return LocalSearcher(d)


def test_lenient_compare_conditions():
    ctx = {"payload": {"hits": {"total": 10}},
           "ctx": {"payload": {"hits": {"total": 10}}}}
    assert check_condition(
        {"compare": {"ctx.payload.hits.total": {"gte": 10}}}, ctx)
    assert not check_condition(
        {"compare": {"ctx.payload.hits.total": {"gt": 10}}}, ctx)
    # numeric string coercion (LenientCompare)
    assert check_condition(
        {"compare": {"ctx.payload.hits.total": {"eq": "10"}}}, ctx)
    assert check_condition({"always": {}}, ctx)
    assert not check_condition({"never": {}}, ctx)


def test_execute_watch_fires(searcher):
    watch = {
        "input": {"search": {"request": {"body": {
            "query": {"match_phrase": {"text": "error disk"}},
            "size": 3}}}},
        "condition": {"compare": {"ctx.payload.hits.total": {"gt": 5}}},
        "actions": {
            "log_it": {"logging": {
                "text": "found {{ctx.payload.hits.total}} errors"}},
            "store_it": {"index": {"index": "alerts"}},
        },
    }
    r = execute_watch(watch, searcher)
    assert r["condition_met"] is True
    assert r["payload"]["hits"]["total"] == 10
    acts = {a["id"]: a for a in r["actions"]}
    assert acts["log_it"]["message"] == "found 10 errors"
    assert len(acts["store_it"]["indexed"]) == 3  # size-capped hits

    # condition not met -> no actions
    watch["condition"] = {"compare": {"ctx.payload.hits.total": {"gt": 50}}}
    r2 = execute_watch(watch, searcher)
    assert r2["condition_met"] is False and r2["actions"] == []


def test_array_compare(searcher):
    watch = {
        "input": {"search": {"request": {"body": {
            "query": {"match": {"text": "error"}}, "size": 5}}}},
        "condition": {"array_compare": {"ctx.payload.hits.hits": {
            "path": "score", "gte": {"value": 0.1, "quantifier": "all"}}}},
        "actions": {"l": {"logging": {"text": "scores ok"}}},
    }
    r = execute_watch(watch, searcher)
    assert r["condition_met"] is True
    assert r["actions"][0]["message"] == "scores ok"
