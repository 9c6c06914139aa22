"""Property test over the parent/child join algebra: for random inner
queries (constant-score bool mixes), score modes, and children bounds,
has_child / has_parent / parent_id agree EXACTLY with a pure-Python
oracle — including a relations map with TWO child types."""

import json

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import given, settings, strategies as st

from raydex.index.build import build_index
from raydex.index.segment import FieldSpec
from raydex.search.scatter import LocalSearcher

N_Q = 25
VOCAB = ("red", "blue", "green", "teal")


def _docs():
    """25 questions; question i has i%3 answers and (i+1)%2 comments.
    Child j of question i carries VOCAB[(i+j)%4] and VOCAB[(i*j)%4]."""
    rows = []
    children = {}
    for i in range(N_Q):
        rows.append((f"q{i}", f"question {VOCAB[i % 4]}",
                     json.dumps({"name": "question"})))
        kids = []
        for rel, cnt in (("answer", i % 3), ("comment", (i + 1) % 2)):
            for j in range(cnt):
                u = f"{rel[0]}{i}-{j}"
                toks = (VOCAB[(i + j) % 4], VOCAB[(i * j) % 4])
                rows.append((u, f"{rel} {toks[0]} {toks[1]}",
                             json.dumps({"name": rel, "parent": f"q{i}"})))
                kids.append((u, rel, set(toks)))
        children[f"q{i}"] = kids
    return rows, children


ROWS, CHILDREN = _docs()


@pytest.fixture(scope="module")
def jidx(ray_session, tmp_path_factory):
    t = pa.table(
        {
            "url": pa.array([r[0] for r in ROWS], pa.string()),
            "warc_ts": pa.array(range(len(ROWS))).cast(pa.timestamp("us")),
            "text": pa.array([r[1] for r in ROWS], pa.large_string()),
            "jf": pa.array([r[2] for r in ROWS], pa.string()),
        }
    )
    p = str(tmp_path_factory.mktemp("jp_pages") / "pages.parquet")
    pq.write_table(t, p)
    idx = str(tmp_path_factory.mktemp("jp_idx") / "index")
    build_index(
        p, idx, num_partitions=3, analyzer="standard", source="text",
        max_docs_per_segment=6,
        fields=[FieldSpec("jf", source="jf", analyzer="join",
                          relations={"question": ["answer", "comment"]})],
    )
    return LocalSearcher(idx)


def _inner(clauses):
    """bool of constant-score term clauses -> (qdict, score_fn(tokens))."""
    q = {"bool": {"should": [
        {"constant_score": {"filter": {"term": {"text": tok}}, "boost": b}}
        for tok, b in clauses
    ]}}

    def score(tokens: set) -> float | None:
        s = [b for tok, b in clauses if tok in tokens]
        return sum(s) if s else None

    return q, score


CLAUSES = st.lists(
    st.tuples(st.sampled_from(VOCAB), st.sampled_from([1.0, 2.0, 3.5])),
    min_size=1, max_size=3, unique_by=lambda c: c[0],
)


@settings(max_examples=40, deadline=None)
@given(
    clauses=CLAUSES,
    child_type=st.sampled_from(["answer", "comment"]),
    score_mode=st.sampled_from(["none", "sum", "avg", "min", "max"]),
    min_children=st.integers(1, 3),
    max_children=st.sampled_from([0, 1, 2]),
)
def test_has_child_matches_oracle(jidx, clauses, child_type, score_mode,
                                  min_children, max_children):
    inner, score = _inner(clauses)
    q = {"has_child": {"type": child_type, "query": inner,
                       "score_mode": score_mode,
                       "min_children": min_children,
                       "max_children": max_children}}
    want = {}
    for parent, kids in CHILDREN.items():
        scs = [score(toks) for u, rel, toks in kids
               if rel == child_type and score(toks) is not None]
        if len(scs) < min_children or (max_children and len(scs) > max_children):
            continue
        if not scs:
            continue
        want[parent] = {
            "none": 1.0, "sum": sum(scs), "avg": sum(scs) / len(scs),
            "min": min(scs), "max": max(scs),
        }[score_mode]
    hits = jidx.search_query(q, k=100)
    got = {h["url"]: h["score"] for h in hits}
    assert got.keys() == want.keys()
    for u in want:
        assert got[u] == pytest.approx(want[u], rel=1e-9)
    assert jidx.count(q) == len(want)


@settings(max_examples=25, deadline=None)
@given(clauses=CLAUSES, use_score=st.booleans())
def test_has_parent_matches_oracle(jidx, clauses, use_score):
    inner, score = _inner(clauses)
    q = {"has_parent": {"parent_type": "question", "query": inner,
                        "score": use_score}}
    want = {}
    for i in range(N_Q):
        ps = score({VOCAB[i % 4]})
        if ps is None:
            continue
        for u, rel, _ in CHILDREN[f"q{i}"]:
            want[u] = ps if use_score else 1.0
    hits = jidx.search_query(q, k=200)
    got = {h["url"]: h["score"] for h in hits}
    assert got.keys() == want.keys()
    for u in want:
        assert got[u] == pytest.approx(want[u], rel=1e-9)


@settings(max_examples=15, deadline=None)
@given(i=st.integers(0, N_Q - 1),
       child_type=st.sampled_from(["answer", "comment"]))
def test_parent_id_matches_oracle(jidx, i, child_type):
    q = {"parent_id": {"type": child_type, "id": f"q{i}"}}
    want = sorted(u for u, rel, _ in CHILDREN[f"q{i}"] if rel == child_type)
    hits = jidx.search_query(q, k=50)
    assert sorted(h["url"] for h in hits) == want
    assert jidx.count(q) == len(want)
