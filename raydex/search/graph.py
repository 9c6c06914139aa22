"""Graph explore — hop-wise significant-term expansion.

Reference: ``x-pack/plugin/graph`` (``TransportGraphExploreAction``):
starting from a seed query, each hop finds the most significant terms
of the configured vertex field among the matching docs (vertices),
records term co-occurrence strengths (connections), then the next hop's
query is the disjunction of the newly found terms. This engine builds
each hop from the existing significant_terms aggregation phase (same
JLH weighting the reference's default ``use_significance=true`` path
uses) plus per-pair doc counts for connections."""

from __future__ import annotations


def graph_explore(searcher, seed_query: dict, field: str,
                  size: int = 5, hops: int = 2,
                  min_doc_count: int = 1) -> dict:
    """Explore ``field`` outward from ``seed_query``.

    Returns {"vertices": [{field, term, weight, depth}],
    "connections": [{source, target, doc_count}]} — the reference's
    response shape with vertex ids flattened to terms (one field per
    explore keeps ids unambiguous)."""
    vertices: dict[str, dict] = {}
    connections: dict[tuple[str, str], int] = {}
    frontier_query = seed_query
    source_terms: list[str] = []
    for depth in range(hops):
        out = searcher.search_aggs(
            frontier_query,
            {"sig": {"significant_terms": {
                "field": field, "size": size,
                "min_doc_count": min_doc_count}}},
            k=0,
        )
        buckets = out["aggregations"]["sig"]["buckets"]
        new_terms = []
        for b in buckets:
            t = b["key"]
            if t not in vertices:
                vertices[t] = {"field": field, "term": t,
                               "weight": float(b["score"]),
                               "depth": depth}
                new_terms.append(t)
        if not new_terms:
            break
        # connections: seed terms of this hop -> each new vertex, with
        # the co-occurrence doc count as the strength
        for src in source_terms:
            for dst in new_terms:
                n = searcher.count({"bool": {"filter": [
                    {"term": {field: src}}, {"term": {field: dst}}]}})
                if n > 0:
                    connections[(src, dst)] = n
        source_terms = new_terms
        frontier_query = {"bool": {"should": [
            {"term": {field: t}} for t in new_terms
        ], "minimum_should_match": 1}}
    return {
        "vertices": sorted(vertices.values(),
                           key=lambda v: (-v["weight"], v["term"])),
        "connections": [
            {"source": s, "target": d, "doc_count": n}
            for (s, d), n in sorted(connections.items())
        ],
    }
