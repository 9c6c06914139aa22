"""Percolate — reverse search (SURVEY §2.11).

The reference's percolator (``modules/percolator/src/main/java/org/
elasticsearch/percolator/PercolateQueryBuilder.java``) stores QUERIES
in an index and matches incoming DOCUMENTS against them: each document
is indexed into a one-doc MemoryIndex and the candidate queries run
against it, pre-filtered by the terms the query requires
(``QueryAnalyzer`` term extraction).

Ray-Data-first: the registered query set is compiled ONCE PER ACTOR
(broadcast via ``ray.put``, parsed + term-extracted in ``__init__``),
documents stream through ``map_batches``; per doc the candidate
pre-filter (any required term present) prunes the query set before full
evaluation over the doc's token multiset/positions. Output is a
(doc_id, query_id) match Dataset — never materialized on the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from raydex.search.query import (
    Bool,
    ConstantScore,
    DisMax,
    Match,
    MatchAll,
    MatchPhrase,
    Prefix,
    Query,
    Term,
    Terms,
    parse_query,
)


def required_terms(q: Query, analyzer) -> set[str]:
    """Terms at least ONE of which a matching doc must contain (the
    QueryAnalyzer candidate-extraction shape; conservative: returns
    empty when the query can match without any specific term)."""
    if isinstance(q, (Term,)):
        return {q.value}
    if isinstance(q, Terms):
        return set(q.values)
    if isinstance(q, (Match, MatchPhrase)):
        return set(analyzer(q.text))
    if isinstance(q, ConstantScore):
        return required_terms(q.filter_q, analyzer)
    if isinstance(q, Bool):
        req: set[str] = set()
        for sub in (*q.must, *q.filter):
            sub_req = required_terms(sub, analyzer)
            if sub_req:
                return sub_req  # any one conjunct's terms suffice
        if q.should and not q.must and not q.filter:
            for sub in q.should:
                s = required_terms(sub, analyzer)
                if not s:
                    return set()
                req |= s
            return req
        return set()
    if isinstance(q, DisMax):
        req = set()
        for sub in q.queries:
            s = required_terms(sub, analyzer)
            if not s:
                return set()
            req |= s
        return req
    return set()  # MatchAll, Prefix, ranges, … : always candidates


def _doc_matches(q: Query, toks: list[str], tokset: set[str]) -> bool:
    """Evaluate one query against one document's token stream (the
    MemoryIndex run). Supports the percolation-relevant core."""
    if isinstance(q, MatchAll):
        return True
    if isinstance(q, Term):
        return q.value in tokset
    if isinstance(q, Terms):
        return any(v in tokset for v in q.values)
    if isinstance(q, Match):
        hits = [t for t in q.terms_cache if t in tokset]
        if q.operator == "and":
            return len(hits) == len(q.terms_cache) and bool(q.terms_cache)
        need = max(q.minimum_should_match, 1)
        return len(hits) >= need
    if isinstance(q, MatchPhrase):
        ph = q.terms_cache
        n = len(ph)
        if n == 0:
            return False
        for i in range(len(toks) - n + 1):
            if toks[i : i + n] == ph:
                return True
        return False
    if isinstance(q, Prefix):
        return any(t.startswith(q.value) for t in tokset)
    if isinstance(q, ConstantScore):
        return _doc_matches(q.filter_q, toks, tokset)
    if isinstance(q, DisMax):
        return any(_doc_matches(s, toks, tokset) for s in q.queries)
    if isinstance(q, Bool):
        for sub in (*q.must, *q.filter):
            if not _doc_matches(sub, toks, tokset):
                return False
        for sub in q.must_not:
            if _doc_matches(sub, toks, tokset):
                return False
        if q.should:
            cnt = sum(_doc_matches(s, toks, tokset) for s in q.should)
            need = q.minimum_should_match
            if q.must or q.filter:
                return cnt >= need if need else True
            return cnt >= max(need, 1)
        return bool(q.must or q.filter)
    raise ValueError(f"percolate: unsupported node {type(q).__name__}")


def _prepare(q: Query, analyzer) -> Query:
    """Cache analyzed terms on Match/MatchPhrase nodes (once per actor)."""
    if isinstance(q, (Match, MatchPhrase)):
        q.terms_cache = analyzer(q.text)
    for attr in ("must", "should", "must_not", "filter", "queries"):
        for sub in getattr(q, attr, ()):
            _prepare(sub, analyzer)
    if isinstance(q, ConstantScore):
        _prepare(q.filter_q, analyzer)
    return q


class _Percolator:
    """Actor-pool stage: queries compiled once per actor."""

    def __init__(self, qref, text_col: str, id_col: str, analyzer_name: str):
        import ray

        from raydex.analysis.tokenizer import get_analyzer

        self.an = get_analyzer(analyzer_name)
        self.text_col, self.id_col = text_col, id_col
        self.compiled = []  # (qid, Query, required terms or None)
        for qid, dsl in ray.get(qref):
            q = _prepare(parse_query(dsl), self.an)
            req = required_terms(q, self.an)
            self.compiled.append((qid, q, req or None))
        # term -> query candidates: the percolator's extracted-terms
        # index (``modules/percolator/.../QueryAnalyzer.java`` extracts
        # required terms at registration; candidate selection is a terms
        # lookup, not a scan) — per doc the work is O(matching
        # candidates), independent of the registered-query count
        self.by_term: dict[str, list[int]] = {}
        self.always: list[int] = []  # no extractable required terms
        for idx, (_, _, req) in enumerate(self.compiled):
            if req:
                for term in req:
                    self.by_term.setdefault(term, []).append(idx)
            else:
                self.always.append(idx)

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t[self.id_col].to_pylist()
        out_doc, out_q = [], []
        for i, text in enumerate(t[self.text_col].to_pylist()):
            toks = self.an(str(text))
            tokset = set(toks)
            cand = set(self.always)
            for tok in tokset:
                cand.update(self.by_term.get(tok, ()))
            for idx in sorted(cand):
                qid, q, _ = self.compiled[idx]
                if _doc_matches(q, toks, tokset):
                    out_doc.append(ids[i])
                    out_q.append(qid)
        return pa.table(
            {
                "doc_id": pa.array(out_doc, pa.int64()),
                "query_id": pa.array(out_q, pa.string()),
            }
        )


def percolate(ds, text_col: str, id_col: str, queries: dict,
              analyzer: str = "standard", concurrency: int = 2):
    """Match every streamed document against the registered query set;
    returns a (doc_id, query_id) Dataset."""
    import ray

    qref = ray.put(sorted(queries.items()))
    return ds.map_batches(
        _Percolator,
        fn_constructor_args=(qref, text_col, id_col, analyzer),
        batch_format="pyarrow",
        concurrency=concurrency,
    )
