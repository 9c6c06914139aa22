"""Span queries + intervals over positional postings (SURVEY §2.11).

The reference's span family (``server/.../index/query/SpanNearQueryBuilder.java``,
``SpanTermQueryBuilder.java``, ``SpanOrQueryBuilder.java``,
``SpanNotQueryBuilder.java``, ``SpanFirstQueryBuilder.java``) and the
intervals query (``IntervalQueryBuilder.java``) re-expressed over the
raydex positional index: a span is a half-open position window
``[start, end)``; leaves are single-term occurrences (width 1); compound
spans combine per-doc sorted span lists with pointer walks.

Matching semantics follow the documented Lucene behavior:
- span_near(in_order=True): clauses appear in order, total gap between
  consecutive spans <= slop;
- span_near(in_order=False): a window containing one occurrence of each
  clause with (window width - sum of span widths) <= slop;
- span_not: include spans that do not overlap any exclude span;
- span_first: spans with end <= boundary;
- intervals.match maps to near over the analyzed terms with
  max_gaps/ordered; all_of/any_of compose recursively.

Scoring: constant-score per matching doc (the engine's multi-term
rewrite convention; raydex.search.query docstring) — span frequency is
exposed for tests via ``span_counts``.
"""

from __future__ import annotations

import numpy as np


def term_doc_spans(reader, term: str) -> dict[int, np.ndarray]:
    """doc -> (n,2) span array for one term (width-1 spans)."""
    return _ti_doc_spans(reader, reader.lookup(term))


def _ti_doc_spans(reader, ti: int) -> dict[int, np.ndarray]:
    if ti < 0:
        return {}
    ids, tfs, pos, off = reader.postings_with_positions(ti)
    out = {}
    for i, d in enumerate(ids):
        p = pos[off[i] : off[i + 1]]
        out[int(d)] = np.stack([p, p + 1], axis=1).astype(np.int64)
    return out


def _merge_spans(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    if a.size == 0:
        return b
    if b.size == 0:
        return a
    m = np.concatenate([a, b])
    return m[np.lexsort((m[:, 1], m[:, 0]))]


def near_spans(clause_spans: list[np.ndarray], slop: int, in_order: bool) -> np.ndarray:
    """Combine per-clause span lists (one doc) into near-match spans."""
    if any(s.size == 0 for s in clause_spans):
        return np.empty((0, 2), dtype=np.int64)
    if len(clause_spans) == 1:
        return clause_spans[0]
    out = []
    if in_order:
        # greedy ordered walk from each occurrence of the first clause
        for s0 in clause_spans[0]:
            start, end = int(s0[0]), int(s0[1])
            gap = 0
            ok = True
            for spans in clause_spans[1:]:
                nxt = spans[spans[:, 0] >= end]
                if nxt.size == 0:
                    ok = False
                    break
                s = nxt[0]
                gap += int(s[0]) - end
                end = int(s[1])
            if ok and gap <= slop:
                out.append((start, end))
    else:
        # sliding window over (position, clause) events
        k = len(clause_spans)
        events = []  # (start, end, clause)
        for ci, spans in enumerate(clause_spans):
            for s in spans:
                events.append((int(s[0]), int(s[1]), ci))
        events.sort()
        from collections import defaultdict

        have = defaultdict(int)
        distinct = 0
        lo = 0
        for hi in range(len(events)):
            c = events[hi][2]
            have[c] += 1
            if have[c] == 1:
                distinct += 1
            while distinct == k:
                # candidate window events[lo..hi]
                w_start = events[lo][0]
                w_end = max(e[1] for e in events[lo : hi + 1])
                widths = sum(
                    min(e[1] - e[0] for e in events[lo : hi + 1] if e[2] == ci)
                    for ci in range(k)
                )
                if (w_end - w_start) - widths <= slop:
                    out.append((w_start, w_end))
                c0 = events[lo][2]
                have[c0] -= 1
                if have[c0] == 0:
                    distinct -= 1
                lo += 1
    if not out:
        return np.empty((0, 2), dtype=np.int64)
    arr = np.array(sorted(set(out)), dtype=np.int64)
    return arr


def not_spans(include: np.ndarray, exclude: np.ndarray) -> np.ndarray:
    if include.size == 0 or exclude.size == 0:
        return include
    keep = []
    for s in include:
        overlap = (exclude[:, 0] < s[1]) & (exclude[:, 1] > s[0])
        if not overlap.any():
            keep.append(s)
    return (
        np.array(keep, dtype=np.int64) if keep else np.empty((0, 2), dtype=np.int64)
    )


def eval_spans(reader, node: dict, analyzer=None) -> dict[int, np.ndarray]:
    """Recursively evaluate a span/interval node -> doc -> spans."""
    (kind, body), = node.items()
    if kind == "span_term":
        v = body["text"] if isinstance(body, dict) else body
        term = v["value"] if isinstance(v, dict) else v
        return term_doc_spans(reader, term)
    if kind == "span_or":
        out: dict[int, np.ndarray] = {}
        for c in body["clauses"]:
            for d, s in eval_spans(reader, c, analyzer).items():
                out[d] = _merge_spans(out.get(d, np.empty((0, 2), np.int64)), s)
        return out
    if kind == "span_near":
        clause_maps = [eval_spans(reader, c, analyzer) for c in body["clauses"]]
        slop = int(body.get("slop", 0))
        in_order = bool(body.get("in_order", True))
        if not clause_maps:
            return {}
        docs = set(clause_maps[0])
        for m in clause_maps[1:]:
            docs &= set(m)
        out = {}
        for d in docs:
            spans = near_spans([m[d] for m in clause_maps], slop, in_order)
            if spans.size:
                out[d] = spans
        return out
    if kind == "span_not":
        inc = eval_spans(reader, body["include"], analyzer)
        exc = eval_spans(reader, body["exclude"], analyzer)
        out = {}
        for d, s in inc.items():
            kept = not_spans(s, exc.get(d, np.empty((0, 2), np.int64)))
            if kept.size:
                out[d] = kept
        return out
    if kind == "span_first":
        inner = eval_spans(reader, body["match"], analyzer)
        end = int(body["end"])
        out = {}
        for d, s in inner.items():
            kept = s[s[:, 1] <= end]
            if kept.size:
                out[d] = kept
        return out
    if kind in ("span_within", "span_containing"):
        # SpanWithinQueryBuilder / SpanContainingQueryBuilder: within
        # keeps little spans enclosed by some big span; containing keeps
        # big spans that enclose some little span.
        little = eval_spans(reader, body["little"], analyzer)
        big = eval_spans(reader, body["big"], analyzer)
        out = {}
        for d in set(little) & set(big):
            l, b = little[d], big[d]
            if kind == "span_within":
                keep = [
                    s for s in l
                    if ((b[:, 0] <= s[0]) & (b[:, 1] >= s[1])).any()
                ]
            else:
                keep = [
                    s for s in b
                    if ((l[:, 0] >= s[0]) & (l[:, 1] <= s[1])).any()
                ]
            if keep:
                out[d] = np.array(keep, dtype=np.int64)
        return out
    if kind == "span_multi":
        # SpanMultiTermQueryBuilder: expand the wrapped multi-term query
        # (prefix/wildcard/regexp/fuzzy) against the term dictionary and
        # take the span_or of the matching terms' width-1 spans.
        from raydex.search.query import (
            expand_fuzzy,
            expand_prefix,
            expand_regexp,
            expand_wildcard,
        )

        (mk, mb), = body["match"].items()
        val = mb["text"] if isinstance(mb, dict) and "text" in mb else mb
        if isinstance(val, dict):
            val = val.get("value", val.get("query"))
        if mk == "prefix":
            tis = expand_prefix(reader, val)
        elif mk == "wildcard":
            tis = expand_wildcard(reader, val)
        elif mk == "regexp":
            tis = expand_regexp(reader, val)
        elif mk == "fuzzy":
            tis = expand_fuzzy(reader, val, 2)
        else:
            raise ValueError(f"span_multi cannot wrap {mk!r}")
        out: dict[int, np.ndarray] = {}
        for ti in tis:
            for d, s in _ti_doc_spans(reader, ti).items():
                out[d] = _merge_spans(out.get(d, np.empty((0, 2), np.int64)), s)
        return out
    if kind == "field_masking_span":
        # SpanFieldMaskingQueryBuilder: report the inner span as if it
        # came from another field. The index is single-text-field, so the
        # mask is an identity re-label — evaluate the inner span.
        return eval_spans(reader, body["query"], analyzer)
    raise ValueError(f"unsupported span kind: {kind}")


def intervals_to_span(body: dict, analyzer) -> dict:
    """Lower an intervals rule to the span node language."""
    (rule, spec), = body.items()
    if rule == "match":
        terms = analyzer(spec["query"]) if analyzer else spec["query"].split()
        clauses = [{"span_term": {"text": t}} for t in terms]
        if len(clauses) == 1:
            return clauses[0]
        max_gaps = int(spec.get("max_gaps", -1))
        return {
            "span_near": {
                "clauses": clauses,
                "slop": max_gaps if max_gaps >= 0 else 10**9,
                "in_order": bool(spec.get("ordered", False)),
            }
        }
    if rule == "all_of":
        clauses = [intervals_to_span(r, analyzer) for r in spec["intervals"]]
        max_gaps = int(spec.get("max_gaps", -1))
        return {
            "span_near": {
                "clauses": clauses,
                "slop": max_gaps if max_gaps >= 0 else 10**9,
                "in_order": bool(spec.get("ordered", False)),
            }
        }
    if rule == "any_of":
        return {
            "span_or": {
                "clauses": [intervals_to_span(r, analyzer) for r in spec["intervals"]]
            }
        }
    raise ValueError(f"unsupported intervals rule: {rule}")


def span_counts(reader, node: dict, analyzer=None) -> dict[int, int]:
    return {d: int(s.shape[0]) for d, s in eval_spans(reader, node, analyzer).items()}
