"""Property test over the index-lifecycle algebra: any sequence of
delete_by_query / split / shrink / clone / expunge-deletes preserves
EXACTLY the expected live-doc set — counts, membership via search, and
point-GET liveness all agree with a pure-Python model."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import given, settings, strategies as st

from raydex.index.build import build_index
from raydex.index.compact import expunge_deletes
from raydex.index.deletes import delete_by_query
from raydex.index.reshape import clone_index, shrink_index, split_index
from raydex.search.get import get_doc
from raydex.search.scatter import LocalSearcher

N = 60
COLORS = ("red", "blue", "green", "teal")


def _pages():
    return pa.table(
        {
            "url": pa.array([f"s{i % 5}.example/p/{i}" for i in range(N)]),
            "warc_ts": pa.array(list(range(N)), pa.int64()).cast(pa.timestamp("us")),
            "text": pa.array(
                [f"doc {COLORS[i % 4]} item {i}" for i in range(N)],
                pa.large_string(),
            ),
        }
    )


@pytest.fixture(scope="module")
def base_index(ray_session, tmp_path_factory):
    t = _pages()
    p = str(tmp_path_factory.mktemp("lp_pages") / "pages.parquet")
    pq.write_table(t, p)
    idx = str(tmp_path_factory.mktemp("lp_idx") / "index")
    build_index(p, idx, num_partitions=4, analyzer="standard_en",
                max_docs_per_segment=10)
    return idx


OPS = st.lists(
    st.one_of(
        st.tuples(st.just("delete"), st.sampled_from(COLORS)),
        st.tuples(st.just("split"), st.just(2)),
        st.tuples(st.just("shrink"), st.just(2)),
        st.tuples(st.just("clone"), st.just(0)),
        st.tuples(st.just("expunge"), st.just(0)),
    ),
    min_size=1, max_size=4,
)


@settings(max_examples=6, deadline=None)
@given(ops=OPS)
def test_lifecycle_algebra(base_index, tmp_path_factory, ops):
    work = str(tmp_path_factory.mktemp("lp_work") / "idx")
    clone_index(base_index, work)
    live = {f"s{i % 5}.example/p/{i}": COLORS[i % 4] for i in range(N)}
    parts = 4
    step = 0
    for op, arg in ops:
        step += 1
        if op == "delete":
            delete_by_query(work, {"term": {"text": arg}}, use_ray=False)
            live = {u: c for u, c in live.items() if c != arg}
        elif op == "split":
            if parts * arg > 32:
                continue
            dst = work + f"_s{step}"
            split_index(work, dst, parts * arg)
            work, parts = dst, parts * arg
        elif op == "shrink":
            if parts % arg or parts // arg < 1:
                continue
            dst = work + f"_h{step}"
            shrink_index(work, dst, parts // arg)
            work, parts = dst, parts // arg
        elif op == "clone":
            dst = work + f"_c{step}"
            clone_index(work, dst)
            work = dst
        elif op == "expunge":
            expunge_deletes(work, use_ray=False)
    s = LocalSearcher(work)
    assert s.count({"match_all": {}}) == len(live)
    hits = s.search_query({"match": {"text": "item"}}, k=4 * N)
    assert {h["url"] for h in hits} == set(live)
    # point-GET agrees with liveness on a sample
    sample = list(live)[:3] + [u for u in
                               (f"s{i % 5}.example/p/{i}" for i in range(N))
                               if u not in live][:3]
    for u in sample:
        got = get_doc(work, u)
        assert (got is not None) == (u in live)
    # per-color counts match the model
    from collections import Counter

    model = Counter(live.values())
    for c in COLORS:
        assert s.count({"term": {"text": c}}) == model.get(c, 0)
