"""Alias layer + rollover (`MetadataIndexAliasesService` atomic actions,
`AliasMetadata#filter` filtered aliases, `TransportRolloverAction`
conditions + naming)."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from raydex.index.aliases import AliasRegistry, AliasedSearcher
from raydex.index.build import build_index
from raydex.search.scatter import LocalSearcher


def _pages(n, site, start=0):
    return pa.table(
        {
            "url": pa.array([f"{site}/p/{start + i}" for i in range(n)]),
            "warc_ts": pa.array([start + i for i in range(n)], pa.int64()).cast(
                pa.timestamp("us")
            ),
            "text": pa.array(
                [f"doc {'red' if i % 2 else 'blue'} item {start + i}"
                 for i in range(n)],
                pa.large_string(),
            ),
        }
    )


@pytest.fixture(scope="module")
def two_indexes(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("alias_root")
    ia, ib = str(root / "logs-000001"), str(root / "logs-000002")
    pa_, pb = str(root / "a.parquet"), str(root / "b.parquet")
    pq.write_table(_pages(40, "a.example"), pa_)
    pq.write_table(_pages(30, "b.example", start=100), pb)
    build_index(pa_, ia, num_partitions=2, analyzer="standard_en",
                max_docs_per_segment=20)
    build_index(pb, ib, num_partitions=2, analyzer="standard_en",
                max_docs_per_segment=20)
    return str(root), ia, ib


def test_add_remove_and_atomic_swap(two_indexes):
    root, ia, ib = two_indexes
    reg = AliasRegistry(os.path.join(root, "reg1"))
    reg.update_aliases([{"add": {"alias": "logs", "index": ia,
                                 "is_write_index": True}}])
    assert reg.write_index("logs") == ia
    # atomic swap: one action list moves the write pointer
    reg.update_aliases([
        {"add": {"alias": "logs", "index": ia, "is_write_index": False}},
        {"add": {"alias": "logs", "index": ib, "is_write_index": True}},
    ])
    assert reg.write_index("logs") == ib
    assert [e["index"] for e in reg.get("logs")] == [ia, ib]
    # remove of a non-pointed index fails without mutating state
    with pytest.raises(ValueError, match="aliases_not_found"):
        reg.update_aliases([{"remove": {"alias": "logs", "index": "/nope"}}])
    assert len(reg.get("logs")) == 2
    reg.update_aliases([{"remove_index": {"index": ia}}])
    assert [e["index"] for e in reg.get("logs")] == [ib]


def test_union_search_and_filtered_alias(two_indexes):
    root, ia, ib = two_indexes
    reg = AliasRegistry(os.path.join(root, "reg2"))
    reg.update_aliases([
        {"add": {"alias": "all", "index": ia}},
        {"add": {"alias": "all", "index": ib}},
        {"add": {"alias": "red_only", "index": ia,
                 "filter": {"term": {"text": "red"}}}},
        {"add": {"alias": "red_only", "index": ib,
                 "filter": {"term": {"text": "red"}}}},
    ])
    s = AliasedSearcher(reg, "all")
    # union count == multi-index count over both dirs
    multi = LocalSearcher(f"{ia},{ib}")
    q = {"term": {"text": "item"}}
    assert s.count(q) == multi.count(q) == 70
    # filtered alias: every hit satisfies the filter; count matches
    # the manually composed bool
    sf = AliasedSearcher(reg, "red_only")
    want = multi.count({"bool": {"must": [q],
                                 "filter": [{"term": {"text": "red"}}]}})
    assert sf.count(q) == want > 0
    hits = sf.search_query(q, k=100)
    reds = {h["url"] for h in multi.search_query(
        {"bool": {"must": [q], "filter": [{"term": {"text": "red"}}]}},
        k=100)}
    assert {h["url"] for h in hits} == reds


def test_rollover_conditions_and_naming(two_indexes):
    root, ia, ib = two_indexes
    reg = AliasRegistry(os.path.join(root, "reg3"))
    reg.update_aliases([{"add": {"alias": "logs", "index": ia,
                                 "is_write_index": True}}])
    assert AliasRegistry.next_index_name("logs-000009") == "logs-000010"
    assert AliasRegistry.next_index_name("plain") == "plain-000002"
    # not met: doc_count 40 < 1000
    r = reg.rollover("logs", {"max_docs": 1000})
    assert not r["rolled_over"] and reg.write_index("logs") == ia
    # dry run: met but no mutation
    r = reg.rollover("logs", {"max_docs": 10}, dry_run=True)
    assert r["rolled_over"] and reg.write_index("logs") == ia
    # real rollover: write pointer moves to <stem>+1, old stays searchable
    r = reg.rollover("logs", {"max_docs": 10, "max_age_s": 10**9})
    assert r["rolled_over"]
    assert r["new_index"].endswith("logs-000002")
    assert reg.write_index("logs") == r["new_index"]
    assert ia in [e["index"] for e in reg.get("logs")]
    # exactly one condition (max_docs) was the trigger
    assert any(v for v in r["conditions"].values())
    assert r["conditions"]["[max_age_s: %d]" % 10**9] is False


def test_write_index_uniqueness(two_indexes):
    root, ia, ib = two_indexes
    reg = AliasRegistry(os.path.join(root, "reg4"))
    reg.update_aliases([{"add": {"alias": "w", "index": ia,
                                 "is_write_index": True}}])
    # adding a second write index demotes the first (reference behavior:
    # explicit is_write_index=true moves the pointer)
    reg.update_aliases([{"add": {"alias": "w", "index": ib,
                                 "is_write_index": True}}])
    assert reg.write_index("w") == ib
    data = json.load(open(os.path.join(root, "reg4", "aliases.json")))
    assert sum(e["is_write_index"] for e in data["w"]) == 1
