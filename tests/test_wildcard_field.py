"""wildcard field type (x-pack wildcard plugin, WildcardFieldMapper):
anchored-3-gram approximate candidates + exact verification against the
stored value column. Checked against a pure-python fnmatch oracle."""

import fnmatch

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from raydex.index.build import build_index
from raydex.index.segment import FieldSpec
from raydex.search.scatter import LocalSearcher


@pytest.fixture(scope="module")
def idx(ray_session, tmp_path_factory):
    paths = [
        f"/var/log/{kind}/{host}.{ext}"
        for kind in ("syslog", "app", "db")
        for host in ("web01", "web02", "Db-Master", "cache9")
        for ext in ("log", "log.1", "gz")
    ]
    n = len(paths)
    t = pa.table({
        "url": pa.array([f"u{i:04d}.example" for i in range(n)]),
        "warc_ts": pa.array(
            np.arange(n, dtype="int64"), pa.int64()
        ).cast(pa.timestamp("us")),
        "text": pa.array([f"doc {i} body words" for i in range(n)],
                         pa.large_string()),
        "path": pa.array(paths),
    })
    p = str(tmp_path_factory.mktemp("wc_pages") / "pages.parquet")
    pq.write_table(t, p)
    d = str(tmp_path_factory.mktemp("wc_idx") / "index")
    build_index(p, d, num_partitions=2, analyzer="standard", source="text",
                fields=[FieldSpec("path", source="path",
                                  analyzer="wildcard")])
    return d, paths


@pytest.mark.parametrize("pattern", [
    "/var/log/syslog/*",          # prefix (anchored grams)
    "*web01*",                    # infix
    "*.log",                      # suffix (anchored grams)
    "/var/log/??/web01.log",      # ? wildcards
    "*Db-Master*",                # mixed case, case-sensitive default
    "/var/log/app/*.log.1",       # prefix + suffix
    "*nosuchthing*",              # impossible gram -> empty
    "*a*",                        # no usable gram -> full verify
])
def test_wildcard_field_vs_fnmatch(idx, pattern):
    d, paths = idx
    s = LocalSearcher(d)
    hits = s.search_query({"wildcard": {"path": {"value": pattern}}},
                          k=10_000)
    got = sorted(h["url"] for h in hits)
    # verification is case-sensitive by default (WildcardFieldMapper
    # wildcardQuery passes caseInsensitive=false)
    want = sorted(
        f"u{i:04d}.example" for i, p in enumerate(paths)
        if fnmatch.fnmatchcase(p, pattern)
    )
    assert got == want, pattern


def test_wildcard_field_case_insensitive_opt_in(idx):
    d, paths = idx
    s = LocalSearcher(d)
    # default: 'ABC*' must not match 'abc...' — case-varying pattern
    # finds nothing without the opt-in
    assert s.count({"wildcard": {"path": {"value": "*db-master*"}}}) == 0
    hits = s.search_query(
        {"wildcard": {"path": {"value": "*db-master*",
                               "case_insensitive": True}}}, k=10_000)
    want = sorted(
        f"u{i:04d}.example" for i, p in enumerate(paths)
        if fnmatch.fnmatchcase(p.lower(), "*db-master*")
    )
    assert sorted(h["url"] for h in hits) == want and want


def test_wildcard_field_term_and_count(idx):
    d, paths = idx
    s = LocalSearcher(d)
    # term = exact case-SENSITIVE equality by default
    hits = s.search_query(
        {"term": {"path": "/var/log/db/Db-Master.gz"}}, k=100)
    assert [h["url"] for h in hits] == [
        f"u{paths.index('/var/log/db/Db-Master.gz'):04d}.example"]
    assert s.search_query(
        {"term": {"path": "/var/log/db/db-master.gz"}}, k=100) == []
    assert s.count({"wildcard": {"path": {"value": "*.gz"}}}) == \
        sum(p.endswith(".gz") for p in paths)


def test_wildcard_field_acceleration(idx):
    """The gram conjunction must actually narrow candidates: a selective
    pattern's verify set is far smaller than the corpus."""
    d, paths = idx
    s = LocalSearcher(d)
    from raydex.search.query import wildcard_field_mask

    r = s.group.readers[0]
    fr = r.field("path")
    # gram postings for a selective literal: few docs carry 'web01'
    cand_docs = None
    anchored_run = "web01"
    for i in range(len(anchored_run) - 2):
        g = anchored_run[i:i + 3]
        ti = fr.lookup(g)
        assert ti >= 0
        ids = fr.postings(ti)[0]
        m = np.zeros(r.ndocs, dtype=bool)
        m[ids] = True
        cand_docs = m if cand_docs is None else (cand_docs & m)
    assert 0 < cand_docs.sum() < r.ndocs  # grams narrow the corpus
    mask = wildcard_field_mask(r, "path", "*web01*")
    assert mask.sum() <= cand_docs.sum()


def test_rare_terms_on_wildcard_field_uses_stored_values(idx):
    """rare_terms over a wildcard field must aggregate the stored
    doc-values column, not its anchored-3-gram sub-index (gram keys
    contain \\x00 anchors and would leak as buckets)."""
    d, paths = idx
    s = LocalSearcher(d)
    res = s.search_aggs({"match_all": {}},
                        {"rare": {"rare_terms": {"field": "path",
                                                 "max_doc_count": 1}}})
    keys = [b["key"] for b in res["aggregations"]["rare"]["buckets"]]
    assert all("\x00" not in k for k in keys)
    from collections import Counter

    want = sorted(t for t, c in Counter(paths).items() if c <= 1)
    assert sorted(keys) == want


def test_wildcard_field_survives_merge(idx, tmp_path):
    d, paths = idx
    s = LocalSearcher(d)
    before = s.count({"wildcard": {"path": {"value": "*web*"}}})
    from raydex.index.merge import merge_partition_segments

    for part in range(2):
        try:
            merge_partition_segments(d, {part: None}, num_buckets=2)
        except Exception:
            pass  # single-segment partitions may refuse to merge
    after = LocalSearcher(d).count({"wildcard": {"path": {"value": "*web*"}}})
    assert after == before > 0


def test_distinct_prefix_patterns_no_anchor_collapse(idx):
    """Round-5 regression: pd.factorize hashes object strings as
    C strings, so \\x00-anchored grams collapsed to ONE term — every
    prefix pattern except the first-seen one returned zero candidates
    (silent false negatives). Anchors are now \\x1f. All prefixes of
    the fixture must match their fnmatch oracle."""
    d, paths = idx
    s = LocalSearcher(d)
    for kind in ("syslog", "app", "db"):
        pat = f"/var/log/{kind}/*"
        want = sum(1 for p in paths if fnmatch.fnmatchcase(p, pat))
        assert s.count({"wildcard": {"path": pat}}) == want > 0
    # distinct suffix anchors too
    for suf in ("*.log", "*.gz", "*.1"):
        want = sum(1 for p in paths if fnmatch.fnmatchcase(p, suf))
        assert s.count({"wildcard": {"path": suf}}) == want > 0
