"""``_terms_enum`` API — low-latency term discovery for autocomplete.

Reference shape: ``x-pack/plugin/core/src/main/java/org/elasticsearch/
xpack/core/termsenum/action/TermsEnumRequest.java`` +
``TransportTermsEnumAction.java``: walk each shard's sorted term
dictionary for terms matching a ``string`` prefix, merge across shards
in sorted order, return at most ``size`` (default 10). Contract points
mirrored here:

- values come straight from the term dictionary, so (like the
  reference, which documents this) terms that now appear ONLY in
  deleted documents can still be returned until a merge reclaims them;
- ``case_insensitive`` matches the prefix against lowercased terms but
  returns the stored form;
- ``search_after`` resumes strictly after a previous page's last term;
- ``index_filter`` is a shard-level can-match pre-filter only (the
  reference runs it "on shard level" to skip shards, never per doc).

The per-segment walk is one vectorized ``pyarrow.compute`` pass over
the dictionary column (zero postings decode); the coordinator merges
``size``-capped candidate lists, so bytes across the wire are
O(size × segments) regardless of corpus size.
"""

from __future__ import annotations

import pyarrow.compute as pc


def _segment_terms(reader, field: str, string: str, size: int,
                   case_insensitive: bool, search_after: str | None):
    """One segment's candidates: up to ``size`` matching terms, in the
    dictionary's sorted order."""
    fr = reader if field == "text" else reader.field(field)
    if fr is not None and fr is not reader:
        arr = fr._terms_pa
    elif field == "text":
        arr = reader._terms_pa
    else:
        # keyword-ish stored column without a sub-index: enumerate the
        # doc-values column's distinct values (SortedSetDocValues-style)
        import pyarrow as pa

        vals = reader.doc_values.get(field)
        if vals is None:
            return []
        if vals.dtype.kind not in ("U", "S", "O"):
            return []  # terms_enum is a string-field API
        uniq = {v for v in vals.tolist() if isinstance(v, str)}
        arr = pa.array(sorted(uniq))
    if len(arr) == 0:
        return []
    if string:
        hay = pc.utf8_lower(arr) if case_insensitive else arr
        pre = string.lower() if case_insensitive else string
        arr = arr.filter(pc.starts_with(hay, pre))
    if search_after is not None:
        cmp_src = pc.utf8_lower(arr) if case_insensitive else arr
        after = search_after.lower() if case_insensitive else search_after
        arr = arr.filter(pc.greater(cmp_src, after))
    return arr[: int(size)].to_pylist()


def merge_terms_enum(per_segment: list[list[str]], size: int) -> list[str]:
    """Coordinator reduce: sorted distinct union, first ``size``
    (TransportTermsEnumAction merges shard responses into one sorted
    list capped at the request size)."""
    seen: set[str] = set()
    for terms in per_segment:
        seen.update(terms)
    return sorted(seen)[: int(size)]


def terms_enum(index_dir: str, field: str, string: str = "",
               size: int = 10, case_insensitive: bool = False,
               search_after: str | None = None,
               index_filter: dict | None = None) -> dict:
    """Single-process ``_terms_enum`` over an index directory (or a
    comma/glob multi-index expression). Returns the reference's
    response shape ``{"terms": [...], "complete": bool}`` — complete
    is False when any segment's candidate list was size-capped (more
    terms may exist beyond the returned page)."""
    from raydex.index.build import load_index_manifest, segment_dirs
    from raydex.index.segment import SegmentReader
    from raydex.search.scatter import resolve_index_dirs

    dirs = resolve_index_dirs(index_dir)
    seg_dirs = [
        s for d in dirs
        for s in segment_dirs(d, load_index_manifest(d))
    ]
    readers = [SegmentReader(s) for s in seg_dirs]
    if index_filter is not None:
        from raydex.search.query import (
            collect_required_ranges,
            parse_query,
            segment_can_match,
        )

        ranges = collect_required_ranges(parse_query(index_filter))
        if ranges:
            readers = [r for r in readers
                       if segment_can_match(r.manifest, ranges)]
    per_seg = [
        _segment_terms(r, field, string, size, case_insensitive,
                       search_after)
        for r in readers
    ]
    union: set[str] = set()
    for t in per_seg:
        union.update(t)
    terms = sorted(union)[: int(size)]
    # complete iff no segment's candidate list was size-capped AND the
    # coordinator's sorted-union itself fit in the page — either cap
    # means matches may exist beyond the returned terms
    complete = (all(len(t) < size for t in per_seg)
                and len(union) <= int(size))
    return {"terms": terms, "complete": bool(complete)}
