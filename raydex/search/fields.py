"""Secondary / runtime fields over stored doc columns.

The reference indexes every mapped field into its own Lucene field
(``server/.../index/mapper/``); raydex segments index the ``text``
field and STORE ``url`` and ``dl``. This module derives a segment-local
keyword-ish inverted index for a stored string column on first use —
the shape of the reference's runtime fields (``es/script/*FieldScript``:
computed at query time from stored data, then queried like any field)
and of multi-field search over short auxiliary fields.

Scale contract: built lazily ONCE per segment reader inside the query
actor (`__init__`-per-actor pattern, SURVEY §2.4); cost is O(column
bytes) — for url-sized columns this is ~1% of the text index. Scoring
uses SEGMENT-LOCAL df/avgdl, which is the reference's default
``query_then_fetch`` shard-local-stats behavior (global-df collection
is only wired for the primary text field, the dfs_ mode analogue).
"""

from __future__ import annotations

import numpy as np

from raydex.analysis.tokenizer import keywordish_analyze as tokenize_keywordish


# runtime-field registry (es/script/*FieldScript analogue): name ->
# fn(reader) -> list of string values (one per doc), indexed lazily on
# first query via DerivedFieldIndex. The built-in 'url' field is the
# stored column itself.
RUNTIME_FIELDS: dict = {"url": lambda reader: reader.urls.to_pylist()}


def register_runtime_field(name: str, fn) -> None:
    """Register a query-time computed field: ``fn(reader)`` returns one
    string per doc, derived from stored columns (urls/dl). The field is
    then queryable via term/match/prefix leaves like any keyword field."""
    RUNTIME_FIELDS[name] = fn


class DerivedFieldIndex:
    """Segment-local inverted index over one stored string column."""

    def __init__(self, values):
        post: dict[str, dict[int, int]] = {}
        dl = np.zeros(len(values), dtype=np.int64)
        for doc, v in enumerate(values):
            toks = tokenize_keywordish(v)
            dl[doc] = len(toks)
            for t in toks:
                d = post.setdefault(t, {})
                d[doc] = d.get(doc, 0) + 1
        self.ndocs = len(values)
        self.dl = dl
        self.avgdl = float(dl.mean()) if len(values) else 1.0
        self.postings: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        for t, d in post.items():
            ids = np.fromiter(d.keys(), dtype=np.int64, count=len(d))
            tfs = np.fromiter(d.values(), dtype=np.int64, count=len(d))
            order = np.argsort(ids)
            self.postings[t] = (ids[order], tfs[order])
        self.terms = sorted(self.postings)

    def df(self, term: str) -> int:
        p = self.postings.get(term)
        return 0 if p is None else int(p[0].size)

    def expand_prefix(self, prefix: str) -> list[str]:
        import bisect

        lo = bisect.bisect_left(self.terms, prefix)
        hi = bisect.bisect_left(self.terms, prefix + "￿")
        return self.terms[lo:hi]


# parameterized runtime-field factories for PER-REQUEST runtime
# mappings (the `_search` body's `runtime_mappings` section,
# ``es/search/builder/SearchSourceBuilder#runtimeMappings`` +
# ``RuntimeField.parseRuntimeFields``): name -> fn(reader, **params)
# returning one string per doc. The request carries only JSON (factory
# name + params), so mappings serialize to query actors untouched.
RUNTIME_FIELD_FACTORIES: dict = {}


def register_runtime_field_factory(name: str, fn) -> None:
    RUNTIME_FIELD_FACTORIES[name] = fn


def _url_regex_factory(reader, pattern: str, group: int = 1,
                       missing: str = ""):
    """Built-in factory: regex-extract a group from each stored url
    (the grok-on-a-stored-field runtime pattern)."""
    import re

    rx = re.compile(pattern)
    out = []
    for u in reader.urls.to_pylist():
        m = rx.search(u)
        out.append(m.group(group) if m else missing)
    return out


register_runtime_field_factory("url_regex", _url_regex_factory)
