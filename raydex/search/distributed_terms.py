"""Distributed terms aggregation with the reference's shard-approximate
contract: ``shard_size``, per-bucket ``doc_count_error_upper_bound`` and
``sum_other_doc_count``
(``server/.../search/aggregations/bucket/terms/TermsAggregationBuilder.java``,
``InternalTerms.java`` reduce + error accounting,
``AbstractStringTermsAggregator`` shard collection).

The exact Ray-Data terms agg (raydex.ops.aggs.terms_agg) shuffles and
is exact — this module is the INDEX-SERVING path: each segment returns
only its local top ``shard_size`` terms by doc count (df of the mapped
keyword field's term dictionary — zero postings decode), so the
coordinator merges tiny lists instead of shuffling the corpus. The
price is the reference's documented approximation, reproduced exactly:

- a returned bucket's ``doc_count`` is a LOWER bound (segments that cut
  the term from their top shard_size contribute 0);
- ``doc_count_error_upper_bound`` per bucket = sum over the segments
  that did NOT return the term of the LAST (smallest) count each such
  segment returned — the worst case it could have missed;
- top-level ``doc_count_error_upper_bound`` = sum of every segment's
  last returned count;
- ``sum_other_doc_count`` = total term-occurrence docs minus what the
  returned buckets account for.

Default ``shard_size = size * 1.5 + 10``, the reference's heuristic
(``TermsAggregationBuilder#shardSize`` default ladder).
"""

from __future__ import annotations

import numpy as np


def segment_terms_partial(reader, field: str, shard_size: int):
    """One segment's shard phase: (terms, counts) of the top
    ``shard_size`` terms by doc count, sorted (count desc, term asc),
    plus the segment's total count mass. Counts come straight from the
    term dictionary's df column — no postings decode."""
    fr = reader if field == "text" else reader.field(field)
    if fr is None:
        return [], [], 0, False
    df = fr.df
    n = min(int(shard_size), df.size)
    if n == 0:
        return [], [], 0, False
    truncated = df.size > n  # exhaustive segments contribute 0 error
    if truncated:
        idx = np.argpartition(-df, n - 1)[:n]
    else:
        idx = np.arange(df.size)
    terms = [fr._terms_pa[int(i)].as_py() for i in idx]
    counts = df[idx].astype(np.int64)
    order = sorted(range(len(terms)), key=lambda j: (-counts[j], terms[j]))
    return (
        [terms[j] for j in order],
        [int(counts[j]) for j in order],
        int(df.sum()),
        truncated,
    )


def merge_terms_partials(partials, size: int):
    """Coordinator reduce (InternalTerms#reduce): sum per-term counts,
    keep the top ``size`` by (count desc, term asc), attach the error
    bounds. ``partials`` = [(terms, counts, total), ...] per segment."""
    merged: dict[str, int] = {}
    returned_by: list[set] = []
    last_counts: list[int] = []
    total = 0
    for terms, counts, seg_total, truncated in partials:
        total += seg_total
        returned_by.append(set(terms))
        # a segment that returned its WHOLE term dict is exhaustive —
        # it cannot have missed anything, so its worst-case is 0
        # (InternalTerms: shards with size >= their term count report
        # no error)
        last_counts.append(counts[-1] if (counts and truncated) else 0)
        for t, c in zip(terms, counts):
            merged[t] = merged.get(t, 0) + c
    top = sorted(merged.items(), key=lambda kv: (-kv[1], kv[0]))[:size]
    buckets = []
    for term, count in top:
        err = sum(
            lc for ret, lc in zip(returned_by, last_counts) if term not in ret
        )
        buckets.append(
            {"key": term, "doc_count": count,
             "doc_count_error_upper_bound": err}
        )
    return {
        "buckets": buckets,
        "doc_count_error_upper_bound": int(sum(last_counts)),
        "sum_other_doc_count": int(total - sum(c for _, c in top)),
    }


def default_shard_size(size: int) -> int:
    """The reference's shard_size heuristic (size * 1.5 + 10)."""
    return int(size * 1.5 + 10)
