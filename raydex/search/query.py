"""Structured query DSL: dataclass tree + per-segment evaluation.

The rank-relevant subset of the reference's 46 query builders
(``server/src/main/java/org/elasticsearch/index/query/*QueryBuilder.java``,
SURVEY.md §2.11), evaluated per segment over the raydex index:

  match_all, term, terms, match (analyzed, operator/minimum_should_match
  — ``MatchQueryParser.java:58,110,230-237``), bool
  (must/should/must_not/filter + minimum_should_match,
  ``BoolQueryBuilder.java``), constant_score, dis_max (tie_breaker),
  boosting (negative_boost), prefix, wildcard, regexp, fuzzy
  (Damerau-ish edit distance <=2), range over stored doc columns
  (url keyword / dl numeric), exists, ids (url list).

Semantics follow the reference:
  - multi-term expansions (prefix/wildcard/regexp/fuzzy) rewrite to
    CONSTANT-SCORE over the expanded term set (the reference's default
    ``constant_score`` rewrite) — no per-term IDF;
  - scoring leaves (term/match) use BM25 with GLOBAL df passed in by the
    coordinator; expansions use segment-local term dicts;
  - bool: must/filter conjunct the match mask (filter never scores),
    should adds scores (pure-should requires >=1 match or
    minimum_should_match), must_not subtracts from the mask.

Evaluation is dense-vectorized per segment (scores + mask arrays) —
exhaustive, the generality path; the hot `match` top-k path keeps the
WAND/brute fast paths in ``raydex.search.scatter``.

Also provides ``explain`` (per-doc score breakdown — the `_explain` API,
``es/action/explain/``) and ``count`` (the `_count` API).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import regex as _regex

from raydex.search.bm25 import idf as _idf
from raydex.search.bm25 import term_score, tf_norm_denom_add, top_k_select


# ------------------------------------------------------------------ tree


@dataclass
class Query:
    boost: float = 1.0


@dataclass
class MatchAll(Query):
    pass


@dataclass
class Term(Query):
    value: str = ""
    fld: str = "text"


@dataclass
class Terms(Query):
    values: tuple = ()
    fld: str = "text"


@dataclass
class Match(Query):
    text: str = ""
    operator: str = "or"
    minimum_should_match: object = 0  # int | ES msm grammar string
    fld: str = "text"


@dataclass
class MatchPhrase(Query):
    text: str = ""


@dataclass
class Prefix(Query):
    value: str = ""
    fld: str = "text"


@dataclass
class Wildcard(Query):
    pattern: str = ""  # * and ? wildcards
    fld: str = "text"
    case_insensitive: bool = False


@dataclass
class Regexp(Query):
    pattern: str = ""
    fld: str = "text"


@dataclass
class Fuzzy(Query):
    value: str = ""
    fuzziness: int = 2
    fld: str = "text"


@dataclass
class GeoBoundingBox(Query):
    fld: str = ""
    top: float = 90.0
    left: float = -180.0
    bottom: float = -90.0
    right: float = 180.0


@dataclass
class GeoDistance(Query):
    fld: str = ""
    lat: float = 0.0
    lon: float = 0.0
    distance_m: float = 0.0


@dataclass
class GeoPolygon(Query):
    """GeoPolygonQueryBuilder: point-in-polygon over a geo_point
    field's lat/lon doc-values (vectorized even-odd)."""
    fld: str = ""
    points: tuple = ()  # ((lon, lat), ...)


@dataclass
class GeoShapeQ(Query):
    """GeoShapeQueryBuilder: relation between the indexed shape and a
    query shape — intersects (default) / disjoint / within / contains.
    Candidates via the stored bbox doc-values, exact relate on
    survivors (ops.geo.shape_relation)."""
    fld: str = ""
    shape: object = None  # GeoJSON-style dict
    relation: str = "intersects"


@dataclass
class Ids(Query):
    values: tuple = ()  # urls


@dataclass
class RangeQ(Query):
    fld: str = "dl"  # 'dl' (numeric) or 'url' (keyword)
    gte: object = None
    gt: object = None
    lte: object = None
    lt: object = None
    # range-FIELD queries only (RangeFieldMapper): how the query range
    # relates to the stored per-doc interval
    relation: str = "intersects"  # | 'within' | 'contains' 


@dataclass
class Exists(Query):
    fld: str = "url"


@dataclass
class MatchNone(Query):
    pass


@dataclass
class MultiMatch(Query):
    """`multi_match` (MultiMatchQueryBuilder.java:1): per-field match
    queries combined best_fields (dis_max + tie_breaker) / most_fields
    (sum) / phrase / bool_prefix. Fields may carry ^boost suffixes."""

    text: str = ""
    fields: tuple = ("text",)  # entries like "text" or "url^2"
    type: str = "best_fields"
    operator: str = "or"
    tie_breaker: float = 0.0


@dataclass
class CombinedFields(Query):
    """`combined_fields` (CombinedFieldsQueryBuilder.java:1, Lucene
    CombinedFieldQuery): BM25F over a merged pseudo-field — per-term tf
    is the weighted sum of per-field tfs, doc length is the weighted sum
    of per-field lengths, idf from the union doc-freq. Stats are
    segment-local (the reference's query_then_fetch shard-local default
    for non-primary fields); field weights are `^w` suffixes (the
    reference validates w >= 1). The reference requires one shared
    analyzer across fields; here the query text is analyzed with the
    index's text analyzer and looked up per field."""

    text: str = ""
    fields: tuple = ("text",)
    operator: str = "or"


@dataclass
class MatchBoolPrefix(Query):
    """`match_bool_prefix` (MatchBoolPrefixQueryBuilder.java:1): all
    analyzed terms as bool.should term queries, the LAST as a prefix."""

    text: str = ""
    fld: str = "text"


@dataclass
class MatchPhrasePrefix(Query):
    """`match_phrase_prefix` (MatchPhrasePrefixQueryBuilder.java):
    exact phrase whose last term is a prefix, expanded to at most
    ``max_expansions`` segment-local terms (Lucene MultiPhraseQuery)."""

    text: str = ""
    max_expansions: int = 50


@dataclass
class TermsSet(Query):
    """`terms_set` (TermsSetQueryBuilder.java:1): scored like a bool of
    term queries with a minimum-should-match count (here a constant —
    the reference's minimum_should_match_field resolves per doc; a
    per-doc field hook can be added the same way RangeQ reads dl)."""

    values: tuple = ()
    minimum_should_match: int = 1


@dataclass
class DistanceFeature(Query):
    """`distance_feature` (DistanceFeatureQueryBuilder.java): matches
    everything, scores boost * pivot / (pivot + |value - origin|) over a
    stored numeric column (dl here)."""

    fld: str = "dl"
    origin: float = 0.0
    pivot: float = 1.0


@dataclass
class RankFeature(Query):
    """`rank_feature` (mapper-extras RankFeatureQueryBuilder.java:48-190):
    matches docs that HAVE the feature, scoring boost * fn(v) with
    fn = saturation v/(v+pivot) | log ln(scaling_factor+v) |
    sigmoid v^exp/(v^exp+pivot^exp) | linear v. Default saturation
    pivot = geometric mean of the segment's positive feature values
    (the reference's index-statistics default, per-shard there,
    per-segment here)."""

    fld: str = ""
    function: str = "saturation"
    pivot: float | None = None
    scaling_factor: float | None = None
    exponent: float | None = None


@dataclass
class FuzzyMatch(Query):
    """`match` with ``fuzziness`` (MatchQueryParser fuzzy rewrite):
    every analyzed token becomes a fuzzy term clause combined by the
    match operator. ``fuzziness=-1`` = AUTO (the reference's ladder:
    0 edits for length <= 2, 1 for <= 5, else 2)."""

    text: str = ""
    fld: str = "text"
    fuzziness: int = -1
    operator: str = "or"


@dataclass
class ZeroTermsWrap(Query):
    """``zero_terms_query: all`` (MatchQuery.ZeroTermsQuery.ALL): when
    analysis strips every token (stopword-only input), match ALL docs
    instead of none; otherwise transparent."""

    inner: Query = None


@dataclass
class KnnQuery(Query):
    """`knn` as a QUERY-DSL kind (the reference's knn query,
    ``search/vectors/KnnVectorQueryBuilder.java`` — usable inside bool
    since 8.12): matches each segment's local top ``num_candidates`` by
    vector similarity over an index-time dense_vector field, scoring
    the similarity transform. Composable with every other node (the
    per-shard-top-k contract is the documented difference from the
    top-level knn SECTION, which ranks globally)."""

    fld: str = ""
    query_vector: tuple = ()
    num_candidates: int = 100


@dataclass
class ScriptQuery(Query):
    """`script` query (ScriptQueryBuilder.java): a registered Python
    predicate over the segment's stored columns — the scripting surface
    maps to a function registry (SURVEY §2.9)."""

    source: str = ""
    params: tuple = ()  # tuple of (k, v) pairs (dataclass hashability)


@dataclass
class ScriptScore(Query):
    """`script_score` (ScriptScoreQueryBuilder.java): match the inner
    query's docs, replace the score with a registered score script over
    (raw score, stored columns); negative scripted scores error out, as
    the reference enforces."""

    inner: Query = None
    source: str = ""
    params: tuple = ()
    min_score: float = float("-inf")


@dataclass
class Pinned(Query):
    """`pinned` (x-pack search-business-rules PinnedQueryBuilder):
    promote the listed ids (urls) above all organic hits, in list
    order, keeping organic BM25 order below them."""

    ids: tuple = ()
    organic: Query = None


@dataclass
class HasChild(Query):
    """`has_child` (parent-join module, HasChildQueryBuilder.java):
    match PARENT docs having min_children..max_children children of
    relation ``type`` matching ``inner``; parent score combines the
    matching children's scores per ``score_mode`` (none -> 1.0, the
    constant-score contract). Evaluated as a per-partition two-phase
    join (raydex.search.joinquery) — the scatter analogue of
    JoinUtil.createJoinQuery over global ordinals."""

    type: str = ""
    inner: Query = None
    score_mode: str = "none"  # none | min | max | sum | avg
    min_children: int = 1
    max_children: int = 0  # 0 = unbounded
    # inner_hits request ((k, v) pairs; None = not requested): each
    # parent hit carries its top matching children
    inner_hits: tuple = None


@dataclass
class HasParent(Query):
    """`has_parent` (HasParentQueryBuilder.java): match CHILD docs whose
    parent of relation ``parent_type`` matches ``inner``; ``score=True``
    propagates the parent's score to every child, else constant 1.0."""

    parent_type: str = ""
    inner: Query = None
    score: bool = False
    inner_hits: tuple = None  # each child hit carries its parent


@dataclass
class ParentId(Query):
    """`parent_id` (ParentIdQueryBuilder.java): the children of ONE
    parent — a term lookup on the join field's parent-id doc-values,
    segment-local (children are co-routed with the parent)."""

    type: str = ""
    id: str = ""


@dataclass
class SpanDSL(Query):
    """Span-family / intervals node (evaluated by raydex.search.spans;
    constant-score per matching doc, the multi-term rewrite convention).
    ``node`` holds the raw span-language dict; an `intervals` node is
    lowered at eval time (the analyzer lives on the evaluator)."""

    node: dict = field(default_factory=dict)


@dataclass
class Bool(Query):
    must: tuple = ()
    should: tuple = ()
    must_not: tuple = ()
    filter: tuple = ()
    minimum_should_match: object = 0  # int | ES msm grammar string


@dataclass
class ConstantScore(Query):
    filter_q: Query = None


@dataclass
class DisMax(Query):
    queries: tuple = ()
    tie_breaker: float = 0.0


@dataclass
class Boosting(Query):
    positive: Query = None
    negative: Query = None
    negative_boost: float = 0.5


def parse_query(d: dict) -> Query:
    """Parse the reference's JSON query DSL shape (single text field)."""
    (kind, body), = d.items()
    if kind == "match_all":
        return MatchAll(**({"boost": body.get("boost", 1.0)} if body else {}))
    if kind == "term":
        fld, v = _field_body(body)
        if isinstance(v, dict):
            return Term(value=v["value"], fld=fld, boost=v.get("boost", 1.0))
        return Term(value=v, fld=fld)
    if kind == "terms":
        fld = next((k for k in body if k != "boost"), "text")
        return Terms(values=tuple(body[fld]), fld=fld,
                     boost=body.get("boost", 1.0))
    if kind == "match":
        fld, v = _field_body(body)
        if isinstance(v, dict):
            m = Match(
                text=v["query"],
                operator=v.get("operator", "or"),
                minimum_should_match=v.get("minimum_should_match", 0),
                fld=fld,
                boost=v.get("boost", 1.0),
            )
            # fuzziness: each analyzed token becomes a fuzzy term clause
            # (MatchQueryParser builds FuzzyQuery per token); AUTO = the
            # reference's length ladder resolved at evaluation time
            if v.get("fuzziness") not in (None, 0, "0"):
                fz = v["fuzziness"]
                m = FuzzyMatch(
                    text=v["query"], fld=fld,
                    fuzziness=-1 if str(fz).upper() == "AUTO" else int(fz),
                    operator=v.get("operator", "or"),
                    boost=v.get("boost", 1.0),
                )
            # zero_terms_query: what an all-stopwords query matches
            # (MatchQuery.ZeroTermsQuery) — 'none' (default) | 'all'
            if v.get("zero_terms_query", "none").lower() == "all":
                return ZeroTermsWrap(inner=m)
            return m
        return Match(text=v, fld=fld)
    if kind == "match_phrase":
        v = body["text"] if isinstance(body, dict) else body
        if isinstance(v, dict):
            return MatchPhrase(text=v["query"], boost=v.get("boost", 1.0))
        return MatchPhrase(text=v)
    if kind == "prefix":
        fld, v = _field_body(body)
        return Prefix(value=v if isinstance(v, str) else v["value"], fld=fld)
    if kind == "wildcard":
        fld, v = _field_body(body)
        if isinstance(v, dict):
            return Wildcard(pattern=v["value"], fld=fld,
                            boost=v.get("boost", 1.0),
                            case_insensitive=bool(
                                v.get("case_insensitive", False)))
        return Wildcard(pattern=v, fld=fld)
    if kind == "regexp":
        fld, v = _field_body(body)
        return Regexp(pattern=v if isinstance(v, str) else v["value"], fld=fld)
    if kind == "fuzzy":
        fld, v = _field_body(body)
        if isinstance(v, dict):
            return Fuzzy(value=v["value"], fuzziness=int(v.get("fuzziness", 2)), fld=fld)
        return Fuzzy(value=v, fld=fld)
    if kind == "ids":
        return Ids(values=tuple(body["values"]))
    if kind == "geo_bounding_box":
        fld = [k for k in body if k not in
               ("validation_method", "_name", "boost")][0]
        box = body[fld]
        if "top_left" in box or "bottom_right" in box:
            tl = box.get("top_left") or {}
            br = box.get("bottom_right") or {}
            top, left = _latlon(tl, (90.0, -180.0))
            bottom, right = _latlon(br, (-90.0, 180.0))
        else:
            top = float(box.get("top", 90.0))
            left = float(box.get("left", -180.0))
            bottom = float(box.get("bottom", -90.0))
            right = float(box.get("right", 180.0))
        return GeoBoundingBox(fld=fld, top=top, left=left,
                              bottom=bottom, right=right)
    if kind == "geo_polygon":
        fld = [k for k in body if k not in
               ("validation_method", "_name", "boost")][0]
        pts = []
        for p in body[fld]["points"]:
            if isinstance(p, dict):
                pts.append((float(p["lon"]), float(p["lat"])))
            elif isinstance(p, str):
                la, lo = p.split(",")
                pts.append((float(lo), float(la)))
            else:
                pts.append((float(p[0]), float(p[1])))
        return GeoPolygon(fld=fld, points=tuple(pts))
    if kind == "geo_shape":
        fld = [k for k in body if k not in
               ("ignore_unmapped", "_name", "boost")][0]
        spec = body[fld]
        if "shape" not in spec:
            raise ValueError("geo_shape needs an inline `shape` "
                             "(indexed-shape lookup is not supported)")
        return GeoShapeQ(fld=fld, shape=spec["shape"],
                         relation=str(spec.get("relation",
                                                "intersects")).lower())
    if kind == "geo_distance":
        from raydex.ops.geo import parse_distance_m

        dist = parse_distance_m(body["distance"])
        fld = [k for k in body if k not in
               ("distance", "distance_type", "_name", "boost",
                "validation_method")][0]
        lat, lon = _latlon(body[fld], (0.0, 0.0))
        return GeoDistance(fld=fld, lat=lat, lon=lon, distance_m=dist)
    if kind == "range":
        fld, spec = _field_body(body)
        if not isinstance(spec, dict):
            raise ValueError(f"range body for {fld!r} must be an object, got {spec!r}")
        # keep the literal field: the evaluator serves dl, any stored
        # doc-values column (e.g. warc_ts), and falls back to url;
        # collapsing everything to "url" made can-match skip on the
        # wrong axis for doc-values ranges
        fld = "dl" if fld in ("dl", "length") else fld
        return RangeQ(fld=fld,
                      relation=str(spec.get("relation", "intersects")).lower(),
                      **{k: spec[k] for k in ("gte", "gt", "lte", "lt") if k in spec})
    if kind == "exists":
        return Exists(fld=body.get("field", "url"))
    if kind == "bool":
        return Bool(
            must=tuple(parse_query(q) for q in _as_list(body.get("must"))),
            should=tuple(parse_query(q) for q in _as_list(body.get("should"))),
            must_not=tuple(parse_query(q) for q in _as_list(body.get("must_not"))),
            filter=tuple(parse_query(q) for q in _as_list(body.get("filter"))),
            minimum_should_match=body.get("minimum_should_match", 0),
            boost=body.get("boost", 1.0),
        )
    if kind == "constant_score":
        return ConstantScore(
            filter_q=parse_query(body["filter"]), boost=body.get("boost", 1.0)
        )
    if kind == "dis_max":
        return DisMax(
            queries=tuple(parse_query(q) for q in body["queries"]),
            tie_breaker=body.get("tie_breaker", 0.0),
            boost=body.get("boost", 1.0),
        )
    if kind == "boosting":
        return Boosting(
            positive=parse_query(body["positive"]),
            negative=parse_query(body["negative"]),
            negative_boost=body.get("negative_boost", 0.5),
        )
    if kind == "match_none":
        return MatchNone()
    if kind in ("span_term", "span_near", "span_or", "span_not", "span_first",
                "span_within", "span_containing", "span_multi",
                "field_masking_span", "intervals"):
        return SpanDSL(node={kind: body})
    if kind == "multi_match":
        return MultiMatch(
            text=body["query"],
            fields=tuple(body.get("fields", ["text"])),
            type=body.get("type", "best_fields"),
            operator=body.get("operator", "or"),
            tie_breaker=float(body.get("tie_breaker", 0.0)),
            boost=body.get("boost", 1.0),
        )
    if kind == "combined_fields":
        return CombinedFields(
            text=body["query"],
            fields=tuple(body.get("fields", ["text"])),
            operator=body.get("operator", "or"),
            boost=body.get("boost", 1.0),
        )
    if kind == "match_bool_prefix":
        fld, v = _field_body(body)
        if isinstance(v, dict):
            return MatchBoolPrefix(text=v["query"], fld=fld, boost=v.get("boost", 1.0))
        return MatchBoolPrefix(text=v, fld=fld)
    if kind == "match_phrase_prefix":
        v = body["text"] if isinstance(body, dict) else body
        if isinstance(v, dict):
            return MatchPhrasePrefix(
                text=v["query"],
                max_expansions=int(v.get("max_expansions", 50)),
                boost=v.get("boost", 1.0),
            )
        return MatchPhrasePrefix(text=v)
    if kind == "terms_set":
        fld, v = _field_body(body)
        msm = v.get("minimum_should_match", 1)
        return TermsSet(
            values=tuple(v["terms"]),
            minimum_should_match=msm if isinstance(msm, int) else 1,
            boost=v.get("boost", 1.0),
        )
    if kind == "rank_feature":
        fn, params = "saturation", {}
        for name in ("saturation", "log", "sigmoid", "linear"):
            if name in body:
                fn, params = name, body[name] or {}
                break
        if fn == "log" and "scaling_factor" not in params:
            raise ValueError("rank_feature log requires scaling_factor")
        if fn == "sigmoid" and not {"pivot", "exponent"} <= params.keys():
            raise ValueError("rank_feature sigmoid requires pivot and exponent")
        return RankFeature(
            fld=body["field"],
            function=fn,
            pivot=(float(params["pivot"]) if "pivot" in params else None),
            scaling_factor=(
                float(params["scaling_factor"])
                if "scaling_factor" in params else None
            ),
            exponent=(float(params["exponent"]) if "exponent" in params else None),
            boost=body.get("boost", 1.0),
        )
    if kind == "distance_feature":
        return DistanceFeature(
            fld=body.get("field", "dl"),
            origin=float(body["origin"]),
            pivot=float(body["pivot"]),
            boost=body.get("boost", 1.0),
        )
    if kind == "knn":
        return KnnQuery(
            fld=body["field"],
            query_vector=tuple(float(x) for x in body["query_vector"]),
            num_candidates=int(body.get("num_candidates", 100)),
            boost=body.get("boost", 1.0),
        )
    if kind == "script":
        spec = body.get("script", body)
        return ScriptQuery(
            source=spec["source"],
            params=tuple(sorted((spec.get("params") or {}).items())),
            boost=body.get("boost", 1.0),
        )
    if kind == "script_score":
        spec = body.get("script", {})
        return ScriptScore(
            inner=parse_query(body["query"]),
            source=spec.get("source", ""),
            params=tuple(sorted((spec.get("params") or {}).items())),
            min_score=float(body.get("min_score", float("-inf"))),
            boost=body.get("boost", 1.0),
        )
    if kind == "pinned":
        return Pinned(
            ids=tuple(body.get("ids", [])),
            organic=parse_query(body["organic"]),
        )
    if kind == "has_child":
        ih = body.get("inner_hits")
        return HasChild(
            type=body["type"],
            inner=parse_query(body["query"]),
            score_mode=body.get("score_mode", "none"),
            min_children=int(body.get("min_children", 1)),
            max_children=int(body.get("max_children", 0)),
            inner_hits=tuple(sorted(ih.items())) if ih is not None else None,
            boost=body.get("boost", 1.0),
        )
    if kind == "has_parent":
        ih = body.get("inner_hits")
        return HasParent(
            parent_type=body["parent_type"],
            inner=parse_query(body["query"]),
            score=bool(body.get("score", False)),
            inner_hits=tuple(sorted(ih.items())) if ih is not None else None,
            boost=body.get("boost", 1.0),
        )
    if kind == "parent_id":
        return ParentId(
            type=body["type"], id=str(body["id"]),
            boost=body.get("boost", 1.0),
        )
    if kind == "wrapper":
        # base64-encoded JSON query (WrapperQueryBuilder.java)
        import base64
        import json as _json

        return parse_query(_json.loads(base64.b64decode(body["query"])))
    if kind == "query_string":
        from raydex.search.query_string import parse_query_string

        return parse_query_string(
            body["query"] if isinstance(body, dict) else body,
            default_field=body.get("default_field", "text") if isinstance(body, dict) else "text",
            default_operator=body.get("default_operator", "or") if isinstance(body, dict) else "or",
        )
    if kind == "simple_query_string":
        from raydex.search.query_string import parse_simple_query_string

        return parse_query(
            parse_simple_query_string(
                body["query"] if isinstance(body, dict) else body,
                default_operator=body.get("default_operator", "or")
                if isinstance(body, dict) else "or",
            )
        )
    if kind in QUERY_PARSERS:
        return QUERY_PARSERS[kind](body)
    raise ValueError(f"unsupported query kind: {kind}")


# custom query-kind registry (SearchPlugin#getQueries analogue,
# es/plugins/SearchPlugin.java): kind -> fn(body) -> Query tree. The
# returned tree reuses the built-in leaves, so a plugin query composes
# bool/term/script nodes instead of registering an evaluator.
QUERY_PARSERS: dict = {}


def register_query(kind: str, parse_fn) -> None:
    QUERY_PARSERS[kind] = parse_fn


def validate_query(qdict: dict) -> dict:
    """`_validate/query` API (es/action/admin/indices/validate/query):
    parse-only check returning {valid, explanation | error} — no
    execution, so it is safe on any index."""
    try:
        q = parse_query(qdict)
    except Exception as e:  # parse surface: ValueError/KeyError/TypeError
        return {"valid": False, "error": f"{type(e).__name__}: {e}"}
    return {"valid": True, "explanation": repr(q)}


# script-query registry (the Painless-surface analogue, SURVEY §2.9):
# name -> fn(cols: dict[str, np.ndarray], params: dict) -> bool mask.
# cols provides 'url' (object array) and 'dl' (int array).
SCRIPT_QUERIES: dict = {}


def register_script_query(name: str, fn) -> None:
    SCRIPT_QUERIES[name] = fn


# score-script registry (ScoreScript context analogue): name ->
# fn(scores: np.ndarray, cols: dict[str, np.ndarray], params) -> scores.
SCORE_SCRIPTS: dict = {}

# pinned hits sit above any achievable BM25 score (the reference uses a
# float ladder just under Float.MAX_VALUE); integers <= 2^24 stay exact
# through the float32 score path, and BM25 never approaches 2^23
_PINNED_BASE = float(2**24)
_PINNED_STEP = 16.0


def register_score_script(name: str, fn) -> None:
    SCORE_SCRIPTS[name] = fn


register_score_script(
    "saturation_dl",
    lambda scores, cols, params: scores
    * (cols["dl"] / (cols["dl"] + float(params.get("pivot", 10.0)))),
)
register_score_script(
    "times_param", lambda scores, cols, params: scores * float(params.get("f", 1.0))
)


register_script_query(
    "url_contains",
    lambda cols, params: np.char.find(
        cols["url"].astype(str), params.get("substr", "")
    ) >= 0,
)
register_script_query(
    "dl_mod", lambda cols, params: cols["dl"] % int(params.get("mod", 2)) == int(params.get("rem", 0))
)


def _field_body(body):
    """('text'|'url', spec) from a {field: spec} DSL body. A top-level
    ``_name`` key (named queries) rides alongside the field and is
    handled by collect_named_queries, not here."""
    if isinstance(body, dict):
        items = [(k, v) for k, v in body.items() if k != "_name"]
        (fld, v), = items
        return fld, v
    return "text", body


def _as_list(x):
    if x is None:
        return []
    return x if isinstance(x, list) else [x]


# ----------------------------------------------------- term collection


def resolve_msm(spec, total: int) -> int:
    """The reference's ``minimum_should_match`` grammar
    (``Queries#calculateMinShouldMatch``): int (negative = total-|n|),
    ``"N%"`` (floor, negative = subtract-from-total), and conditional
    combinations ``"V<S V2<S2"`` (each spec applies when total > V; the
    largest applicable V wins; total <= smallest V requires ALL).
    Result clamped to [0, total]."""
    if spec in (None, 0, "0"):
        return 0

    def one(s: str) -> int:
        s = s.strip()
        if s.endswith("%"):
            pct = int(s[:-1])
            part = (total * abs(pct)) // 100
            return part if pct >= 0 else total - part
        v = int(s)
        return v if v >= 0 else total + v

    if isinstance(spec, int):
        out = spec if spec >= 0 else total + spec
    else:
        s = str(spec).strip()
        if "<" in s:
            out = total  # total <= every V: all clauses required
            best_v = -1
            for cond in s.split():
                v_str, _, sub = cond.partition("<")
                v = int(v_str)
                if total > v and v > best_v:
                    best_v = v
                    out = one(sub)
        else:
            out = one(s)
    return max(0, min(int(out), total))


def collect_field_stat_terms(q: Query, analyze_field) -> set[tuple[str, str]]:
    """(field, term) pairs whose GLOBAL df the coordinator must collect
    (scoring leaves only — multi-term expansions are segment-local
    constant-score). ``analyze_field(field, text) -> tokens`` applies the
    field's own search analyzer (the reference per-field analyzer
    contract, ``MatchQueryParser.java:110``). Non-text pairs are served
    by index-time mapped fields; derived/runtime fields keep scoring
    segment-local and are simply never collected."""
    out: set[tuple[str, str]] = set()
    if isinstance(q, Term):
        out.add((q.fld, q.value))
    elif isinstance(q, Terms):
        out.update((q.fld, v) for v in q.values)
    elif isinstance(q, Match):
        out.update((q.fld, t) for t in analyze_field(q.fld, q.text))
    elif isinstance(q, MatchPhrase):
        out.update(("text", t) for t in analyze_field("text", q.text))
    elif isinstance(q, MultiMatch):
        for fspec in q.fields:
            f = fspec.partition("^")[0]
            out.update((f, t) for t in analyze_field(f, q.text))
    elif isinstance(q, CombinedFields):
        # query text analyzed ONCE with the index's text analyzer, the
        # shared-analyzer contract of CombinedFieldsQueryBuilder
        toks = analyze_field("text", q.text)
        for fspec in q.fields:
            f = fspec.partition("^")[0]
            out.update((f, t) for t in toks)
    elif isinstance(q, MatchBoolPrefix):
        toks = analyze_field(q.fld, q.text)
        out.update((q.fld, t) for t in toks[:-1])  # last term = prefix
    elif isinstance(q, MatchPhrasePrefix):
        toks = analyze_field("text", q.text)
        out.update(("text", t) for t in toks[:-1])
    elif isinstance(q, TermsSet):
        out.update(("text", v) for v in q.values)
    elif isinstance(q, Bool):
        for sub in (*q.must, *q.should, *q.must_not, *q.filter):
            out |= collect_field_stat_terms(sub, analyze_field)
    elif isinstance(q, ConstantScore):
        out |= collect_field_stat_terms(q.filter_q, analyze_field)
    elif isinstance(q, DisMax):
        for sub in q.queries:
            out |= collect_field_stat_terms(sub, analyze_field)
    elif isinstance(q, Boosting):
        out |= collect_field_stat_terms(q.positive, analyze_field)
        out |= collect_field_stat_terms(q.negative, analyze_field)
    elif isinstance(q, ScriptScore):
        if q.inner is not None:
            out |= collect_field_stat_terms(q.inner, analyze_field)
    elif isinstance(q, Pinned):
        if q.organic is not None:
            out |= collect_field_stat_terms(q.organic, analyze_field)
    elif isinstance(q, ZeroTermsWrap):
        if q.inner is not None:
            out |= collect_field_stat_terms(q.inner, analyze_field)
    elif isinstance(q, (HasChild, HasParent)):
        if q.inner is not None:
            out |= collect_field_stat_terms(q.inner, analyze_field)
    return out


def collect_named_queries(qdict) -> list[tuple[str, dict]]:
    """(name, subquery-dict) pairs for every ``_name``-tagged clause
    (the reference's named queries / per-hit ``matched_queries``,
    ``AbstractQueryBuilder#queryName``). Works on the RAW DSL dict:
    the enclosing one-kind query dict is captured with ``_name``
    stripped, so it re-parses as a standalone query whose per-doc mask
    IS the matched_queries membership test."""
    out: list[tuple[str, dict]] = []

    def walk(node):
        if isinstance(node, dict):
            echo_wrapper = None
            if len(node) == 1:
                (kind, body), = node.items()
                if kind in ("has_child", "has_parent"):
                    # join clauses (and anything named inside them)
                    # cannot re-evaluate as standalone segment masks —
                    # their matches depend on the phase-1 parent maps
                    # keyed to the main query tree. Skip the subtree:
                    # the search still runs, the name is just not
                    # reported (documented limitation).
                    return
                if isinstance(body, dict):
                    name = body.get("_name")
                    wrapper = None
                    if name is None and len(body) == 1:
                        # field-keyed bodies: {"term": {"f": {"value":
                        # ..., "_name": ...}}}
                        inner = next(iter(body.values()))
                        if isinstance(inner, dict):
                            name = inner.get("_name")
                            wrapper = inner
                    if name is not None:
                        stripped = _strip_name(node)
                        # field wrappers ({"text": {...,"_name"}}) also
                        # look like one-key dicts: only a dict that
                        # parses as a QUERY is a named clause
                        try:
                            parse_query(stripped)
                        except Exception:
                            stripped = None
                        if stripped is not None:
                            out.append((str(name), stripped))
                            # keep walking: nested clauses may carry
                            # their own names — but the field wrapper
                            # that supplied THIS name must not be
                            # re-matched as a query node (a field
                            # literally named like a query kind, e.g.
                            # {"term": {"prefix": {...}}}, would
                            # otherwise echo a bogus duplicate clause)
                            echo_wrapper = wrapper
            for v in node.values():
                if echo_wrapper is not None and v is node[next(iter(node))]:
                    for vv in v.values():
                        walk(vv)
                else:
                    walk(v)
        elif isinstance(node, list):
            for v in node:
                walk(v)

    def _strip_name(node):
        import copy

        node = copy.deepcopy(node)
        (kind, body), = node.items()
        body.pop("_name", None)
        for v in body.values():
            if isinstance(v, dict):
                v.pop("_name", None)
        return node

    walk(qdict)
    return out


def collect_join_nodes(q: Query) -> list:
    """Pre-order list of has_child / has_parent nodes — the stable
    traversal index keys the per-partition parent maps across processes
    (each scatter actor re-parses the same qdict to the same order)."""
    out: list = []
    if isinstance(q, (HasChild, HasParent)):
        if isinstance(q.inner, (HasChild, HasParent)) or (
            q.inner is not None and collect_join_nodes(q.inner)
        ):
            raise ValueError(
                "nested has_child/has_parent inside another join query "
                "is not supported"
            )
        out.append(q)
        return out
    for attr in ("must", "should", "must_not", "filter", "queries"):
        for sub in getattr(q, attr, ()) or ():
            out += collect_join_nodes(sub)
    for attr in ("filter_q", "positive", "negative", "inner", "organic"):
        sub = getattr(q, attr, None)
        if isinstance(sub, Query):
            out += collect_join_nodes(sub)
    return out


def collect_required_ranges(q: Query) -> list["RangeQ"]:
    """Range constraints EVERY hit must satisfy (must/filter conjuncts,
    recursively) — the cheap rewrite the reference's can-match phase
    performs per shard (``CanMatchPreFilterSearchPhase.java:50,138``)."""
    out: list[RangeQ] = []
    if isinstance(q, RangeQ):
        out.append(q)
    elif isinstance(q, Bool):
        for sub in (*q.must, *q.filter):
            out += collect_required_ranges(sub)
    elif isinstance(q, ConstantScore):
        if q.filter_q is not None:
            out += collect_required_ranges(q.filter_q)
    elif isinstance(q, Boosting):
        if q.positive is not None:
            out += collect_required_ranges(q.positive)
    elif isinstance(q, ScriptScore):
        if q.inner is not None:
            out += collect_required_ranges(q.inner)
    elif isinstance(q, Pinned):
        # pinned ids match regardless of the organic query — no skip
        out = []
    return out


def segment_can_match(manifest: dict, ranges: list["RangeQ"]) -> bool:
    """False iff some required range is provably disjoint from the
    segment's stored [min, max] (manifests without the stats — pre-r3
    segments — always match)."""
    for r in ranges:
        if r.fld == "dl":
            lo, hi = manifest.get("min_dl"), manifest.get("max_dl")
        elif r.fld == "url":
            lo, hi = manifest.get("min_url"), manifest.get("max_url")
        else:
            # stored doc-values bounds when the manifest has them (e.g.
            # min_warc_ts/max_warc_ts from index-sorted builds); fields
            # without recorded bounds can never be skipped — comparing
            # them against the URL bounds (the pre-r3 behavior) skipped
            # on the WRONG axis
            lo, hi = manifest.get(f"min_{r.fld}"), manifest.get(f"max_{r.fld}")
        if lo is None or hi is None:
            continue
        if getattr(r, "relation", "intersects") != "intersects":
            continue  # within/contains cannot use the simple bounds
        try:
            if r.gte is not None and hi < r.gte:
                return False
            if r.gt is not None and hi <= r.gt:
                return False
            if r.lte is not None and lo > r.lte:
                return False
            if r.lt is not None and lo >= r.lt:
                return False
        except TypeError:
            # incomparable bound/stat types (e.g. a dotted-quad IP
            # literal vs int64 address stats): never skip on an
            # incomparable axis
            continue
    return True


def collect_stat_terms(q: Query, analyzer) -> set[str]:
    """Primary-text-field terms needing global df (back-compat wrapper
    over :func:`collect_field_stat_terms`)."""
    from raydex.search.fields import tokenize_keywordish

    def analyze_field(field, text):
        return analyzer(text) if field == "text" else tokenize_keywordish(text)

    return {
        t for f, t in collect_field_stat_terms(q, analyze_field) if f == "text"
    }


# ------------------------------------------------------------ expansion


def _expand(reader, pred) -> list[int]:
    return [i for i, t in enumerate(reader.terms) if pred(t)]


def expand_prefix(reader, prefix: str) -> list[int]:
    lo = int(np.searchsorted(reader.terms, prefix))
    hi = int(np.searchsorted(reader.terms, prefix + "￿"))
    return list(range(lo, hi))


def _latlon(spec, default) -> tuple[float, float]:
    """(lat, lon) from the reference's accepted point forms: {lat, lon}
    object, [lon, lat] GeoJSON array, or "lat,lon" string."""
    if isinstance(spec, dict):
        return float(spec.get("lat", default[0])), \
            float(spec.get("lon", default[1]))
    if isinstance(spec, (list, tuple)):
        return float(spec[1]), float(spec[0])  # GeoJSON order lon,lat
    a, b = str(spec).split(",")
    return float(a), float(b)


def _ip_to_int(s: str) -> int:
    parts = s.split(".")
    if len(parts) != 4:
        raise ValueError(f"malformed IPv4 literal {s!r}")
    v = 0
    for p in parts:
        o = int(p)
        if not 0 <= o <= 255:
            raise ValueError(f"malformed IPv4 literal {s!r}")
        v = (v << 8) | o
    return v


def _ip_term_bounds(term: str) -> tuple[int, int]:
    """Numeric [lo, hi] of an IPv4 literal or CIDR block (the
    reference's InetAddresses.parseCidr expansion)."""
    if "/" in term:
        addr, _, bits = term.partition("/")
        nbits = int(bits)
        if not 0 <= nbits <= 32:
            raise ValueError(f"malformed CIDR {term!r}")
        base = _ip_to_int(addr)
        span = 1 << (32 - nbits)
        lo = (base // span) * span
        return lo, lo + span - 1
    v = _ip_to_int(term)
    return v, v


def wildcard_field_mask(reader, fld: str, pattern: str,
                        case_insensitive: bool = False) -> np.ndarray:
    """Wildcard-FIELD evaluation (x-pack ``WildcardFieldMapper.java``):
    approximate candidates from the anchored-3-gram sub-index — the
    conjunction of every 3-gram of each contiguous literal run of the
    (anchor-wrapped, lowercased) pattern — then exact verification of
    only the candidates against the stored value column. The gram
    approximation is always lowercased (the sub-index is normalized),
    but verification is CASE-SENSITIVE by default — the reference's
    ``wildcardQuery`` builds its verifying automaton with
    ``caseInsensitive=false`` unless the query opts in. A pattern with
    no usable gram (e.g. ``*a*``) verifies every doc."""
    import re as _re

    fr = reader.field(fld) if hasattr(reader, "field") else None
    vals = getattr(reader, "doc_values", {}).get(fld)
    if fr is None or vals is None:
        raise ValueError(f"field {fld!r} is not a wildcard field")
    anchored = "\x1f" + pattern.lower() + "\x1f\x1f"
    grams = {run[i:i + 3]
             for run in _re.split(r"[*?]+", anchored)
             for i in range(len(run) - 2)}
    cand = None
    for g in sorted(grams):
        ti = fr.lookup(g)
        if ti < 0:
            return np.zeros(reader.ndocs, dtype=bool)
        m = np.zeros(reader.ndocs, dtype=bool)
        m[fr.postings(ti)[0]] = True
        cand = m if cand is None else (cand & m)
        if not cand.any():
            return cand
    rx = _re.compile(
        "^" + "".join(".*" if c == "*" else "." if c == "?"
                      else _re.escape(c) for c in pattern) + "$",
        _re.DOTALL | (_re.IGNORECASE if case_insensitive else 0),
    )
    idx = np.flatnonzero(cand) if cand is not None else np.arange(reader.ndocs)
    out = np.zeros(reader.ndocs, dtype=bool)
    for i in idx:
        v = vals[i]
        if v is not None and rx.match(str(v)):
            out[i] = True
    if reader.live is not None:
        out &= reader.live
    return out


def expand_wildcard(reader, pattern: str) -> list[int]:
    # leading literal prefix narrows the scan range (Lucene's automaton
    # prefix optimization, approximated)
    lit = _regex.match(r"[^*?\[\]\\]*", pattern).group(0)
    rx = _regex.compile(
        "^" + "".join(
            ".*" if c == "*" else "." if c == "?" else _regex.escape(c)
            for c in pattern
        ) + "$"
    )
    if lit:
        lo = int(np.searchsorted(reader.terms, lit))
        hi = int(np.searchsorted(reader.terms, lit + "￿"))
        return [i for i in range(lo, hi) if rx.match(reader.terms[i])]
    return _expand(reader, lambda t: rx.match(t) is not None)


def expand_regexp(reader, pattern: str) -> list[int]:
    rx = _regex.compile("^(?:" + pattern + ")$")
    return _expand(reader, lambda t: rx.match(t) is not None)


def _edit_distance_le(a: str, b: str, k: int) -> bool:
    if abs(len(a) - len(b)) > k:
        return False
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i] + [0] * len(b)
        lo = len(b) + 1
        for j, cb in enumerate(b, 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            lo = min(lo, cur[j])
        if lo > k:
            return False
        prev = cur
    return prev[-1] <= k


def expand_fuzzy(reader, value: str, fuzziness: int) -> list[int]:
    return _expand(reader, lambda t: _edit_distance_le(value, t, fuzziness))


# ----------------------------------------------------------- evaluation


class SegmentEvaluator:
    """Dense (scores, mask) evaluation of a query tree over one segment."""

    def __init__(self, reader, stats, analyzer, runtime_mappings=None,
                 join_maps=None):
        self.r = reader
        self.stats = stats
        self.analyzer = analyzer
        self.n = reader.ndocs
        # per-request runtime mappings ({field: {"factory": ..,
        # "params": ..}}) — the search body's runtime_mappings section;
        # resolution goes through _derived so request-local fields
        # shadow the global registry
        self.runtime_mappings = runtime_mappings or {}
        # resolved has_child/has_parent parent maps for THIS reader's
        # partition: {id(node): {parent_id: score}} — phase 2 of the
        # two-phase join (raydex.search.joinquery)
        self.join_maps = join_maps or {}

    def _derived(self, field: str):
        return self.r.derived_field(field, self.runtime_mappings.get(field))

    def _term_leaf(self, term: str, boost: float):
        scores = np.zeros(self.n)
        mask = np.zeros(self.n, dtype=bool)
        ti = self.r.lookup(term)
        gdf = self.stats.df.get(term, 0)
        if ti >= 0 and gdf > 0:
            ids, tfs = self.r.postings(ti)
            denom = tf_norm_denom_add(self.r.dl_quant[ids], self.stats.avgdl)
            scores[ids] = boost * term_score(
                tfs, denom, float(_idf(self.stats.ndocs, gdf))
            )
            mask[ids] = True
        return scores, mask

    def _field_reader(self, field: str):
        """Index-time mapped field's sub-reader, or None (then the
        derived/runtime-field fallback applies)."""
        f = getattr(self.r, "field", None)
        return f(field) if f is not None else None

    def _indexed_term_leaf(self, field: str, fr, term: str, boost: float):
        """BM25 term leaf over an index-time mapped field: GLOBAL df and
        avgdl when the coordinator collected them (the same
        dfs_query_then_fetch contract as the primary text field),
        segment-local otherwise."""
        scores = np.zeros(self.n)
        mask = np.zeros(self.n, dtype=bool)
        ti = fr.lookup(term)
        if ti >= 0:
            gdf = self.stats.field_df(field, term)
            df = gdf if gdf else int(fr.df[ti])
            avgdl = self.stats.field_avgdl(field)
            if avgdl is None:
                avgdl = fr.sum_dl / fr.ndocs if fr.ndocs else 1.0
            ids, tfs = fr.postings(ti)
            denom = tf_norm_denom_add(fr.dl_quant[ids], avgdl)
            scores[ids] = boost * term_score(
                tfs, denom, float(_idf(self.stats.ndocs, df))
            )
            mask[ids] = True
        return scores, mask

    def _derived_term_leaf(self, field: str, term: str, boost: float):
        """BM25 term leaf over a derived (stored-column) field with
        SEGMENT-LOCAL stats — the query_then_fetch shard-local default
        (raydex.search.fields docstring)."""
        scores = np.zeros(self.n)
        mask = np.zeros(self.n, dtype=bool)
        fi = self._derived(field)
        p = fi.postings.get(term)
        if p is not None:
            ids, tfs = p
            denom = tf_norm_denom_add(fi.dl[ids], fi.avgdl)
            scores[ids] = boost * term_score(
                tfs, denom, float(_idf(fi.ndocs, ids.size))
            )
            mask[ids] = True
        return scores, mask

    def _resolve_flattened(self, field: str) -> tuple[str, str]:
        """``myfield.dotted.key`` against a flattened field resolves to
        (``myfield``, ``dotted.key\\x1f``) — the keyed-term prefix of
        the FlattenedFieldMapper's keyed sub-field. Returns (field, "")
        when the name is not a flattened key path."""
        fm = getattr(self.r, "fields_meta", {})
        if field in fm or "." not in field:
            return field, ""
        head, _, rest = field.partition(".")
        if fm.get(head, {}).get("kind") == "flattened":
            return head, rest + "\x1f"
        return field, ""

    def _field_term_leaf(self, field: str, term: str, boost: float):
        if field == "text":
            return self._term_leaf(term, boost)
        rf, kp = self._resolve_flattened(field)
        if kp:
            field, term = rf, kp + str(term)
        meta = getattr(self.r, "fields_meta", {}).get(field, {})
        an = meta.get("analyzer")
        if an == "constant_keyword":
            # ConstantKeywordFieldMapper.termQuery: all-or-none — the
            # whole index shares one value (segment can-match in spirit)
            value = meta.get("constant_value")
            hit = value is not None and str(term) == str(value)
            mask = (np.ones(self.n, dtype=bool) if hit
                    else np.zeros(self.n, dtype=bool))
            if self.r.live is not None:
                mask = mask & self.r.live
            return np.where(mask, boost, 0.0), mask
        if an == "aggregate_metric_double":
            # term/range queries read the default_metric sub-column
            # (AggregateDoubleMetricFieldMapper.termQuery)
            dv = self.r.doc_values[field]
            mask = dv == float(term)
            if self.r.live is not None:
                mask = mask & self.r.live
            return np.where(mask, boost, 0.0), mask
        if an == "boolean":
            # BooleanFieldMapper.termQuery: true/false (accepts the
            # JSON bool or its string form) against the 0/1 doc-values
            want = 1 if str(term).lower() in ("true", "1") else 0
            mask = self.r.doc_values[field] == want
            if self.r.live is not None:
                mask = mask & self.r.live
            return np.where(mask, boost, 0.0), mask
        if an == "ip":
            # IpFieldMapper.termQuery: exact dotted-quad, or a CIDR
            # literal expanded to its numeric [lo, hi] block
            lo, hi = _ip_term_bounds(str(term))
            dv = self.r.doc_values[field]
            mask = (dv >= lo) & (dv <= hi)
            if self.r.live is not None:
                mask = mask & self.r.live
            return np.where(mask, boost, 0.0), mask
        if an == "version":
            # exact match on the raw version string
            dv = self.r.doc_values[field]
            mask = np.array([v == term for v in dv], dtype=bool)
            if self.r.live is not None:
                mask = mask & self.r.live
            return np.where(mask, boost, 0.0), mask
        if meta.get("kind") == "range":
            # RangeFieldMapper.termQuery: docs whose stored [gte, lte]
            # interval CONTAINS the queried point
            v = float(term) if an == "double_range" else int(
                float(term))
            g = self.r.doc_values[f"{field}__gte"]
            l = self.r.doc_values[f"{field}__lte"]
            mask = (g <= v) & (v <= l)
            if self.r.live is not None:
                mask = mask & self.r.live
            return np.where(mask, boost, 0.0), mask
        if (meta.get("kind") or meta.get("analyzer")) == "join":
            # term on the join FIELD matches the relation name (the
            # ParentJoinFieldMapper doc-values term — how the reference
            # filters parents/children by relation)
            names, _, _ = self.r.join_field_data(field)
            mask = names == term
            return np.where(mask, boost, 0.0), mask
        if (meta.get("kind") or meta.get("analyzer")) == "wildcard":
            # term on a wildcard field = exact (case-SENSITIVE, matching
            # WildcardFieldMapper.termQuery -> wildcardQuery(...,
            # caseInsensitive=false)) equality through the same
            # ngram-approximate + verify machinery; a term that itself
            # contains wildcard metachars compares directly
            if "*" in term or "?" in term:
                vals = self.r.doc_values.get(field)
                mask = np.fromiter(
                    (v is not None and str(v) == term for v in vals),
                    dtype=bool, count=self.n)
                if self.r.live is not None:
                    mask &= self.r.live
            else:
                mask = wildcard_field_mask(self.r, field, term)
            return np.where(mask, boost, 0.0), mask
        fr = self._field_reader(field)
        if fr is not None:
            if (meta.get("kind") or meta.get("analyzer")) == "match_only_text":
                # freq==1, norms off (MatchOnlyTextFieldMapper): the BM25
                # tf-norm term cancels to 1, leaving per-term idf
                scores = np.zeros(self.n)
                mask = np.zeros(self.n, dtype=bool)
                ti = fr.lookup(term)
                if ti >= 0:
                    gdf = self.stats.field_df(field, term)
                    df = gdf if gdf else int(fr.df[ti])
                    ids, _ = fr.postings(ti)
                    scores[ids] = boost * float(_idf(self.stats.ndocs, df))
                    mask[ids] = True
                return scores, mask
            return self._indexed_term_leaf(field, fr, term, boost)
        return self._derived_term_leaf(field, term, boost)

    def _field_analyze(self, field: str, text: str) -> list[str]:
        if field == "text":
            return self.analyzer(text)
        rf, kp = self._resolve_flattened(field)
        if kp or getattr(self.r, "fields_meta", {}).get(
                field, {}).get("kind") == "flattened":
            # flattened leaves are keywords: the query text is ONE term
            return [text]
        fr = self._field_reader(field)
        if fr is not None:
            from raydex.analysis.tokenizer import get_analyzer

            return get_analyzer(fr.manifest["analyzer"])(text)
        from raydex.search.fields import tokenize_keywordish

        return tokenize_keywordish(text)

    def _field_match(self, field: str, text: str, operator: str,
                     minimum_should_match, boost: float):
        n = self.n
        scores = np.zeros(n)
        nmatch = np.zeros(n, dtype=np.int32)
        terms = self._field_analyze(field, text)
        for t in terms:
            s, m = self._field_term_leaf(field, t, 1.0)
            scores += s
            nmatch += m
        if operator == "and":
            need = len(terms)
            mask = nmatch >= need if need else np.zeros(n, dtype=bool)
        else:
            msm = resolve_msm(minimum_should_match, len(terms))
            mask = nmatch >= msm if msm > 1 else nmatch > 0
        return boost * scores, mask

    def _derived_const(self, field: str, expander, boost: float):
        """Constant-score multi-term expansion over a derived field."""
        fi = self._derived(field)
        mask = np.zeros(self.n, dtype=bool)
        for t in expander(fi):
            p = fi.postings.get(t)
            if p is not None:
                mask[p[0]] = True
        return np.where(mask, boost, 0.0), mask

    def _const_terms(self, term_indices: list[int], boost: float, reader=None):
        r = reader if reader is not None else self.r
        mask = np.zeros(self.n, dtype=bool)
        for ti in term_indices:
            ids, _ = r.postings(ti)
            mask[ids] = True
        scores = np.where(mask, boost, 0.0)
        return scores, mask

    def _field_expand_const(self, fld: str, expand_indexed, expand_derived,
                            boost: float):
        """Constant-score multi-term expansion on a non-text field:
        index-time field when present (full term dict), derived fallback
        otherwise."""
        fr = self._field_reader(fld)
        if fr is not None:
            return self._const_terms(expand_indexed(fr), boost, reader=fr)
        return self._derived_const(fld, expand_derived, boost)

    def eval(self, q: Query):
        n = self.n
        if isinstance(q, MatchAll):
            return np.full(n, q.boost), np.ones(n, dtype=bool)
        if isinstance(q, MatchNone):
            return np.zeros(n), np.zeros(n, dtype=bool)
        if isinstance(q, Term):
            return self._field_term_leaf(q.fld, q.value, q.boost)
        if isinstance(q, Terms):
            # bool.should of term clauses (reference terms query scoring:
            # constant score per matching term set)
            mask = np.zeros(n, dtype=bool)
            if q.fld != "text":
                for v in q.values:
                    _, m = self._field_term_leaf(q.fld, v, 1.0)
                    mask |= m
                return np.where(mask, q.boost, 0.0), mask
            for v in q.values:
                ti = self.r.lookup(v)
                if ti >= 0:
                    ids, _ = self.r.postings(ti)
                    mask[ids] = True
            return np.where(mask, q.boost, 0.0), mask
        if isinstance(q, Match):
            return self._field_match(
                q.fld, q.text, q.operator, q.minimum_should_match, q.boost
            )
        if isinstance(q, MatchPhrase):
            from raydex.search.phrase import phrase_frequencies
            from raydex.search.bm25 import idf as _idf2

            # query-side analysis uses the INDEX analyzer (the
            # reference's MatchQuery resolves the field's search
            # analyzer) — e.g. a kuromoji phrase must segment with the
            # same dictionary the index used, not the standard rules
            terms, qpos = self.analyzer.analyze_many_with_positions(
                [q.text])[0]
            scores = np.zeros(n)
            mask = np.zeros(n, dtype=bool)
            if terms:
                docs, pf = phrase_frequencies(self.r, terms, qpos)
                if docs.size:
                    sum_idf = float(
                        sum(_idf2(self.stats.ndocs, max(self.stats.df.get(t, 0), 1))
                            for t in terms)
                    )
                    denom = tf_norm_denom_add(self.r.dl_quant[docs], self.stats.avgdl)
                    scores[docs] = q.boost * term_score(pf, denom, sum_idf)
                    mask[docs] = True
            return scores, mask
        if isinstance(q, Prefix):
            if q.fld != "text":
                rf, kp = self._resolve_flattened(q.fld)
                pat = kp + q.value if kp else q.value
                return self._field_expand_const(
                    rf,
                    lambda fr: expand_prefix(fr, pat),
                    lambda fi: fi.expand_prefix(q.value),
                    q.boost,
                )
            return self._const_terms(expand_prefix(self.r, q.value), q.boost)
        if isinstance(q, Wildcard):
            if q.fld != "text":
                meta = getattr(self.r, "fields_meta", {}).get(q.fld, {})
                if (meta.get("kind") or meta.get("analyzer")) == "wildcard":
                    mask = wildcard_field_mask(
                        self.r, q.fld, q.pattern,
                        case_insensitive=q.case_insensitive)
                    return np.where(mask, q.boost, 0.0), mask
                import regex as _rx

                pat = "".join(".*" if c == "*" else "." if c == "?" else _rx.escape(c)
                              for c in q.pattern)
                rx = _rx.compile("^" + pat + "$")
                return self._field_expand_const(
                    q.fld,
                    lambda fr: expand_wildcard(fr, q.pattern),
                    lambda fi: [t for t in fi.terms if rx.match(t)],
                    q.boost,
                )
            return self._const_terms(expand_wildcard(self.r, q.pattern), q.boost)
        if isinstance(q, Regexp):
            if q.fld != "text":
                import regex as _rx

                rx = _rx.compile("^(?:" + q.pattern + ")$")
                return self._field_expand_const(
                    q.fld,
                    lambda fr: expand_regexp(fr, q.pattern),
                    lambda fi: [t for t in fi.terms if rx.match(t)],
                    q.boost,
                )
            return self._const_terms(expand_regexp(self.r, q.pattern), q.boost)
        if isinstance(q, FuzzyMatch):
            # fuzzy match = bool over per-token fuzzy clauses
            # (MatchQueryParser fuzzy rewrite); AUTO resolves per token
            toks = self.analyzer(q.text)
            if not toks:
                return np.zeros(n), np.zeros(n, dtype=bool)

            def auto(tok: str) -> int:
                if q.fuzziness >= 0:
                    return q.fuzziness
                return 0 if len(tok) <= 2 else (1 if len(tok) <= 5 else 2)

            clauses = tuple(
                Fuzzy(value=t, fuzziness=auto(t), fld=q.fld) for t in toks
            )
            inner = (Bool(must=clauses) if q.operator == "and"
                     else Bool(should=clauses))
            scores, mask = self.eval(inner)
            return q.boost * scores, mask
        if isinstance(q, ZeroTermsWrap):
            inner_text = getattr(q.inner, "text", None)
            if inner_text is not None and not self.analyzer(inner_text):
                return np.full(n, q.inner.boost), np.ones(n, dtype=bool)
            return self.eval(q.inner)
        if isinstance(q, Fuzzy):
            if q.fld != "text":
                return self._field_expand_const(
                    q.fld,
                    lambda fr: expand_fuzzy(fr, q.value, q.fuzziness),
                    lambda fi: [t for t in fi.terms
                                if _edit_distance_le(q.value, t, q.fuzziness)],
                    q.boost,
                )
            return self._const_terms(
                expand_fuzzy(self.r, q.value, q.fuzziness), q.boost
            )
        if isinstance(q, Ids):
            wanted = set(q.values)
            urls = self.r.urls.to_pylist()
            mask = np.fromiter((u in wanted for u in urls), dtype=bool, count=n)
            return np.where(mask, q.boost, 0.0), mask
        if isinstance(q, RangeQ):
            fmeta = getattr(self.r, "fields_meta", {}).get(q.fld, {})
            if fmeta.get("kind") == "range":
                # range FIELD vs query range: relation semantics
                # (RangeFieldMapper.rangeQuery intersects/within/
                # contains)
                g = self.r.doc_values[f"{q.fld}__gte"]
                l = self.r.doc_values[f"{q.fld}__lte"]
                qlo = q.gte if q.gte is not None else (
                    q.gt if q.gt is not None else -np.inf)
                qhi = q.lte if q.lte is not None else (
                    q.lt if q.lt is not None else np.inf)
                if q.relation == "within":
                    mask = (g >= qlo) & (l <= qhi)
                elif q.relation == "contains":
                    mask = (g <= qlo) & (l >= qhi)
                else:  # intersects (the reference default)
                    mask = (g <= qhi) & (l >= qlo)
                # strict bounds exclude the touching endpoint
                if q.gt is not None and q.relation == "intersects":
                    mask &= l > q.gt
                if q.lt is not None and q.relation == "intersects":
                    mask &= g < q.lt
                return np.where(mask, q.boost, 0.0), mask
            if q.fld == "dl":
                vals = self.r.dl  # exact length, not the SmallFloat-quantized one
            elif q.fld in getattr(self.r, "doc_values", {}):
                vals = self.r.doc_values[q.fld]  # stored doc-values column
                if fmeta.get("analyzer") == "scaled_float":
                    # compare on unscaled doubles derived from the
                    # stored scaled longs (storage lossy like the
                    # reference's ScaledFloat encoding)
                    vals = vals / float(fmeta.get("scaling_factor") or 100.0)
            else:
                vals = np.asarray(self.r.urls.to_pylist(), dtype=object)
            ip_field = fmeta.get("analyzer") == "ip"
            if fmeta.get("analyzer") == "version":
                # semver-ordered compare on the padded sort key
                from raydex.index.segment import version_sort_key

                vals = self.r.doc_values[f"{q.fld}__sort"]

                def _bound(v):
                    return version_sort_key(v)
            else:
                def _bound(v):
                    return _ip_to_int(str(v)) if ip_field else v

            mask = np.ones(n, dtype=bool)
            if q.gte is not None:
                mask &= vals >= _bound(q.gte)
            if q.gt is not None:
                mask &= vals > _bound(q.gt)
            if q.lte is not None:
                mask &= vals <= _bound(q.lte)
            if q.lt is not None:
                mask &= vals < _bound(q.lt)
            return np.where(mask, q.boost, 0.0), mask
        if isinstance(q, GeoBoundingBox):
            from raydex.ops.geo import bbox_mask

            la = self.r.doc_values[f"{q.fld}__lat"]
            lo = self.r.doc_values[f"{q.fld}__lon"]
            mask = bbox_mask(la, lo, q.top, q.left, q.bottom, q.right)
            if self.r.live is not None:
                mask = mask & self.r.live
            return np.where(mask, q.boost, 0.0), mask
        if isinstance(q, GeoPolygon):
            from raydex.ops.geo import points_in_polygon_mask

            la = self.r.doc_values[f"{q.fld}__lat"]
            lo = self.r.doc_values[f"{q.fld}__lon"]
            mask = points_in_polygon_mask(la, lo, list(q.points))
            if self.r.live is not None:
                mask = mask & self.r.live
            return np.where(mask, q.boost, 0.0), mask
        if isinstance(q, GeoShapeQ):
            import json as _json

            from raydex.ops.geo import shape_bbox, shape_relation

            dv = self.r.doc_values
            bmin_lon = dv[f"{q.fld}__minlon"]
            bmin_lat = dv[f"{q.fld}__minlat"]
            bmax_lon = dv[f"{q.fld}__maxlon"]
            bmax_lat = dv[f"{q.fld}__maxlat"]
            qlo, qla, qhi, qha = shape_bbox(q.shape)
            valid = np.isfinite(bmin_lon)
            rel = q.relation
            if rel in ("intersects", "disjoint"):
                cand = valid & (bmin_lon <= qhi) & (bmax_lon >= qlo) \
                    & (bmin_lat <= qha) & (bmax_lat >= qla)
            elif rel == "within":
                # bbox(doc) ⊆ bbox(query) is necessary for within
                cand = valid & (bmin_lon >= qlo) & (bmax_lon <= qhi) \
                    & (bmin_lat >= qla) & (bmax_lat <= qha)
            elif rel == "contains":
                cand = valid & (bmin_lon <= qlo) & (bmax_lon >= qhi) \
                    & (bmin_lat <= qla) & (bmax_lat >= qha)
            else:
                raise ValueError(
                    f"unsupported geo_shape relation {rel!r}")
            shapes_col = dv[f"{q.fld}__shape"]
            mask = np.zeros(n, dtype=bool)
            verify_rel = "intersects" if rel == "disjoint" else rel
            for i in np.nonzero(cand)[0]:
                mask[i] = shape_relation(_json.loads(shapes_col[i]),
                                         q.shape, verify_rel)
            if rel == "disjoint":
                # bbox-disjoint docs are disjoint without verification;
                # a missing shape matches nothing (reference semantics)
                mask = valid & ~mask
            if self.r.live is not None:
                mask = mask & self.r.live
            return np.where(mask, q.boost, 0.0), mask
        if isinstance(q, GeoDistance):
            from raydex.ops.geo import haversine_m

            la = self.r.doc_values[f"{q.fld}__lat"]
            lo = self.r.doc_values[f"{q.fld}__lon"]
            mask = haversine_m(q.lat, q.lon, la, lo) <= q.distance_m
            if self.r.live is not None:
                mask = mask & self.r.live
            return np.where(mask, q.boost, 0.0), mask
        if isinstance(q, Exists):
            rf, kp = self._resolve_flattened(q.fld)
            fmeta = getattr(self.r, "fields_meta", {}).get(rf, {})
            if fmeta.get("kind") == "flattened":
                fr = self._field_reader(rf)
                mask = np.zeros(n, dtype=bool)
                if fr is not None:
                    if kp:
                        # exists on a keyed leaf: any keyed term
                        for ti in expand_prefix(fr, kp):
                            mask[fr.postings(ti)[0]] = True
                    else:
                        # root exists: any leaf at all
                        docids, _ = fr.all_postings_docids()
                        mask[docids] = True
                if self.r.live is not None:
                    mask = mask & self.r.live
                return np.where(mask, q.boost, 0.0), mask
            # ExistsQueryBuilder: docs carrying a value for the field.
            # url/dl/text always exist (every indexed doc has them);
            # doc-values columns test for null (numpy converts nullable
            # numeric columns to float NaN, object columns keep None);
            # keyword/text sub-fields test postings membership; unknown
            # fields keep the lenient all-docs fallback (derived/
            # runtime fields resolve per request).
            if q.fld not in ("url", "dl", "text"):
                dv = getattr(self.r, "doc_values", {})
                if q.fld in dv:
                    vals = dv[q.fld]
                    if vals.dtype.kind == "f":
                        mask = ~np.isnan(vals)
                    elif vals.dtype == object:
                        mask = np.fromiter(
                            (v is not None for v in vals),
                            dtype=bool, count=n)
                    else:
                        mask = np.ones(n, dtype=bool)
                    if self.r.live is not None:
                        mask = mask & self.r.live
                    return np.where(mask, q.boost, 0.0), mask
                fr = self._field_reader(q.fld)
                if fr is not None and hasattr(fr, "all_postings_docids"):
                    mask = np.zeros(n, dtype=bool)
                    docids, _ = fr.all_postings_docids()
                    mask[docids] = True
                    if self.r.live is not None:
                        mask = mask & self.r.live
                    return np.where(mask, q.boost, 0.0), mask
            mask = (self.r.live.copy() if self.r.live is not None
                    else np.ones(n, dtype=bool))
            return np.where(mask, q.boost, 0.0), mask
        if isinstance(q, ConstantScore):
            _, mask = self.eval(q.filter_q)
            return np.where(mask, q.boost, 0.0), mask
        if isinstance(q, DisMax):
            alls = [self.eval(sub) for sub in q.queries]
            mask = np.zeros(n, dtype=bool)
            for _, m in alls:
                mask |= m
            stack = np.stack([s for s, _ in alls])
            mx = stack.max(axis=0)
            total = stack.sum(axis=0)
            return q.boost * (mx + q.tie_breaker * (total - mx)), mask
        if isinstance(q, Boosting):
            ps, pm = self.eval(q.positive)
            _, nm = self.eval(q.negative)
            scores = np.where(nm, ps * q.negative_boost, ps)
            return q.boost * scores, pm
        if isinstance(q, MultiMatch):
            per_field = []
            for fspec in q.fields:
                f, _, fb = fspec.partition("^")
                fboost = float(fb) if fb else 1.0
                if q.type == "phrase" and f == "text":
                    s, m = self.eval(MatchPhrase(text=q.text))
                elif q.type == "bool_prefix":
                    s, m = self.eval(MatchBoolPrefix(text=q.text, fld=f))
                else:
                    s, m = self._field_match(f, q.text, q.operator, 0, 1.0)
                per_field.append((fboost * s, m))
            mask = np.zeros(n, dtype=bool)
            for _, m in per_field:
                mask |= m
            stack = np.stack([s for s, _ in per_field])
            if q.type == "most_fields":
                combined = stack.sum(axis=0)
            else:  # best_fields / phrase / bool_prefix: dis_max
                mx = stack.max(axis=0)
                combined = mx + q.tie_breaker * (stack.sum(axis=0) - mx)
            return q.boost * combined, mask
        if isinstance(q, CombinedFields):
            from raydex.search.bm25 import B, K1
            from raydex.search.bm25 import idf as _idfc

            specs = []  # (field, weight, indexed-field reader or None)
            norm = np.zeros(n)
            for fspec in q.fields:
                f, _, fb = fspec.partition("^")
                w = float(fb) if fb else 1.0
                fr = None if f == "text" else self._field_reader(f)
                if f == "text":
                    dl_f = self.r.dl
                elif fr is not None:
                    dl_f = fr.dl
                else:
                    dl_f = self._derived(f).dl
                norm += w * dl_f.astype(np.float64)
                specs.append((f, w, fr))
            # GLOBAL norm/idf stats where collected (the engine's
            # dfs_query_then_fetch contract — Match uses the same): the
            # text field and index-time mapped fields contribute the
            # coordinator-collected avgdl and per-term global df; derived
            # fields fall back to segment-local averages (fields.py
            # documents the caveat).
            gstats = self.stats
            avg_norm = 0.0
            for f, w, fr in specs:
                if f == "text":
                    avg_norm += w * float(gstats.avgdl)
                elif fr is not None:
                    g = gstats.field_avgdl(f)
                    avg_norm += w * float(
                        g if g is not None
                        else (fr.sum_dl / fr.ndocs if fr.ndocs else 1.0)
                    )
                else:
                    avg_norm += w * float(self._derived(f).avgdl)
            denom_add = K1 * (1.0 - B + B * norm / max(avg_norm, 1e-9))
            terms = self.analyzer(q.text)
            scores = np.zeros(n)
            nmatch = np.zeros(n, dtype=np.int32)
            for t in terms:
                tfc = np.zeros(n)
                df_other = 0
                for f, w, fr in specs:
                    if f == "text":
                        ti = self.r.lookup(t)
                        if ti >= 0:
                            ids, tfs = self.r.postings(ti)
                            tfc[ids] += w * tfs
                    elif fr is not None:
                        ti = fr.lookup(t)
                        if ti >= 0:
                            ids, tfs = fr.postings(ti)
                            tfc[ids] += w * tfs
                            gdf = gstats.field_df(f, t)
                            df_other = max(
                                df_other, gdf if gdf else int(fr.df[ti])
                            )
                    else:
                        p = self._derived(f).postings.get(t)
                        if p is not None:
                            tfc[p[0]] += w * p[1]
                            df_other = max(df_other, p[0].size)
                m = tfc > 0
                # pooled df = max over fields (Lucene CombinedFieldQuery
                # merges term states taking the max docFreq); text and
                # index-time fields use global df, derived segment-local
                df = max(gstats.df.get(t, 0), df_other)
                if df and m.any():
                    scores[m] += (
                        float(_idfc(max(gstats.ndocs, df), df))
                        * (K1 + 1.0)
                        * tfc[m]
                        / (tfc[m] + denom_add[m])
                    )
                nmatch += m
            if q.operator == "and":
                mask = nmatch >= len(terms) if terms else np.zeros(n, dtype=bool)
            else:
                mask = nmatch > 0
            return q.boost * scores, mask
        if isinstance(q, MatchBoolPrefix):
            terms = self._field_analyze(q.fld, q.text)
            if not terms:
                return np.zeros(n), np.zeros(n, dtype=bool)
            scores = np.zeros(n)
            mask = np.zeros(n, dtype=bool)
            for t in terms[:-1]:
                s, m = self._field_term_leaf(q.fld, t, 1.0)
                scores += s
                mask |= m
            # last term: constant-score prefix (the reference's rewrite)
            pmask = np.zeros(n, dtype=bool)
            last = terms[-1]
            # search_as_you_type acceleration: when the field has a
            # `<field>._index_prefix` sub-field (edge-grams of
            # trailing-filler shingles, SearchAsYouTypeFieldMapper
            # PrefixFieldType.prefixQuery:360), the prefix is a TERM in
            # that field — one dict lookup instead of a prefix expansion.
            # Out-of-range lengths fall back, as the reference does.
            pfr = self._field_reader(f"{q.fld}._index_prefix")
            if pfr is not None and 1 <= len(last) <= 20:
                ti = pfr.lookup(last)
                if ti >= 0:
                    ids, _ = pfr.postings(ti)
                    pmask[ids] = True
            elif q.fld == "text":
                for ti in expand_prefix(self.r, terms[-1]):
                    ids, _ = self.r.postings(ti)
                    pmask[ids] = True
            elif (fr := self._field_reader(q.fld)) is not None:
                for ti in expand_prefix(fr, terms[-1]):
                    ids, _ = fr.postings(ti)
                    pmask[ids] = True
            else:
                fi = self._derived(q.fld)
                for t in fi.expand_prefix(terms[-1]):
                    pmask[fi.postings[t][0]] = True
            scores += pmask
            mask |= pmask
            return q.boost * scores, mask
        if isinstance(q, MatchPhrasePrefix):
            from raydex.search.phrase import phrase_frequencies

            terms, qpos = self.analyzer.analyze_many_with_positions(
                [q.text])[0]
            scores = np.zeros(n)
            mask = np.zeros(n, dtype=bool)
            if not terms:
                return scores, mask
            fixed = terms[:-1]
            exp = expand_prefix(self.r, terms[-1])[: q.max_expansions]
            if not exp:
                return scores, mask
            pf_total = np.zeros(n, dtype=np.int64)
            exp_df = 0
            for ti in exp:
                exp_df += int(self.r.df[ti])
                docs, pf = phrase_frequencies(
                    self.r, fixed + [str(self.r.terms[ti])], qpos
                )
                if docs.size:
                    pf_total[docs] += pf
            docs = np.flatnonzero(pf_total)
            if docs.size:
                sum_idf = float(
                    sum(_idf(self.stats.ndocs, max(self.stats.df.get(t, 0), 1))
                        for t in fixed)
                ) + float(_idf(self.stats.ndocs, max(exp_df, 1)))
                denom = tf_norm_denom_add(self.r.dl_quant[docs], self.stats.avgdl)
                scores[docs] = q.boost * term_score(pf_total[docs], denom, sum_idf)
                mask[docs] = True
            return scores, mask
        if isinstance(q, TermsSet):
            scores = np.zeros(n)
            cnt = np.zeros(n, dtype=np.int32)
            for v in q.values:
                s, m = self._term_leaf(v, 1.0)
                scores += s
                cnt += m
            mask = cnt >= max(1, q.minimum_should_match)
            return q.boost * np.where(mask, scores, 0.0), mask
        if isinstance(q, RankFeature):
            vals = self.r.rank_feature_values(q.fld)
            mask = ~np.isnan(vals)
            v = np.where(mask, vals, 0.0)
            if q.function == "saturation":
                pivot = q.pivot
                if pivot is None:
                    pos = vals[mask & (vals > 0)]
                    pivot = float(np.exp(np.log(pos).mean())) if pos.size else 1.0
                s = v / (v + pivot)
            elif q.function == "log":
                s = np.log(q.scaling_factor + v)
            elif q.function == "sigmoid":
                vp = v ** q.exponent
                s = vp / (vp + q.pivot ** q.exponent)
            else:  # linear (FeatureField.newLinearQuery)
                s = v
            return np.where(mask, q.boost * s, 0.0), mask
        if isinstance(q, DistanceFeature):
            # score over the NAMED field's doc-values (the eval
            # previously hardcoded dl, silently mis-scoring any other
            # field); missing values don't match (the reference: docs
            # without the field are excluded)
            if q.fld == "dl":
                vals = self.r.dl.astype(np.float64)
                present = np.ones(n, dtype=bool)
            else:
                dv = self.r.doc_values.get(q.fld)
                if dv is None:
                    raise ValueError(
                        f"distance_feature field {q.fld!r} has no "
                        "stored doc-values column")
                vals = np.asarray(dv, dtype=np.float64)
                present = ~np.isnan(vals)
                vals = np.where(present, vals, 0.0)
            dist = np.abs(vals - q.origin)
            scores = q.boost * (q.pivot / (q.pivot + dist))
            return scores, present
        if isinstance(q, KnnQuery):
            from raydex.search.knn import segment_knn

            ids, sc = segment_knn(
                self.r, q.fld, np.asarray(q.query_vector, dtype=np.float64),
                q.num_candidates,
            )
            scores = np.zeros(n)
            mask = np.zeros(n, dtype=bool)
            scores[ids] = q.boost * sc
            mask[ids] = True
            return scores, mask
        if isinstance(q, SpanDSL):
            from raydex.search.spans import eval_spans, intervals_to_span

            node = q.node
            if "intervals" in node:
                (fld, rule), = node["intervals"].items()
                node = intervals_to_span(rule, self.analyzer)
            docmap = eval_spans(self.r, node, self.analyzer)
            mask = np.zeros(n, dtype=bool)
            if docmap:
                mask[np.fromiter(docmap.keys(), dtype=np.int64, count=len(docmap))] = True
            return np.where(mask, q.boost, 0.0), mask
        if isinstance(q, ScriptScore):
            base, mask = self.eval(q.inner)
            fn = SCORE_SCRIPTS.get(q.source)
            if fn is None:
                raise ValueError(f"unregistered score script: {q.source!r}")
            cols = {
                **getattr(self.r, "doc_values", {}),
                "url": np.asarray(self.r.urls.to_pylist(), dtype=object),
                "dl": self.r.dl,
            }
            scores = np.asarray(fn(base, cols, dict(q.params)), dtype=np.float64)
            if mask.any() and float(scores[mask].min()) < 0:
                # ScriptScoreQuery.java rejects negative scores outright
                raise ValueError("script_score produced a negative score")
            if q.min_score > float("-inf"):
                mask = mask & (scores >= q.min_score)
            return q.boost * np.where(mask, scores, 0.0), mask
        if isinstance(q, Pinned):
            base, mask = self.eval(q.organic)
            urls = self.r.urls.to_pylist()
            pos = {u: i for i, u in enumerate(q.ids)}
            scores = np.where(mask, base, 0.0)
            for d, u in enumerate(urls):
                p = pos.get(u)
                if p is not None:
                    # PinnedQueryBuilder: pinned docs outrank every
                    # organic hit, earlier ids first (decreasing ladder)
                    scores[d] = _PINNED_BASE - p * _PINNED_STEP
                    mask[d] = True
            return scores, mask
        if isinstance(q, ScriptQuery):
            fn = SCRIPT_QUERIES.get(q.source)
            if fn is None:
                raise ValueError(f"unregistered script query: {q.source!r}")
            cols = {
                **getattr(self.r, "doc_values", {}),
                "url": np.asarray(self.r.urls.to_pylist(), dtype=object),
                "dl": self.r.dl,
            }
            mask = np.asarray(fn(cols, dict(q.params)), dtype=bool)
            return np.where(mask, q.boost, 0.0), mask
        if isinstance(q, Bool):
            scores = np.zeros(n)
            mask = np.ones(n, dtype=bool)
            constrained = False
            for sub in q.must:
                s, m = self.eval(sub)
                scores += s
                mask &= m
                constrained = True
            for sub in q.filter:
                _, m = self.eval(sub)
                mask &= m
                constrained = True
            if q.should:
                smask = np.zeros(n, dtype=bool)
                scount = np.zeros(n, dtype=np.int32)
                for sub in q.should:
                    s, m = self.eval(sub)
                    scores += s
                    smask |= m
                    scount += m
                msm = resolve_msm(q.minimum_should_match, len(q.should))
                if not constrained:
                    mask &= (scount >= msm) if msm > 1 else smask
                elif msm > 0:
                    mask &= scount >= msm
            for sub in q.must_not:
                _, m = self.eval(sub)
                mask &= ~m
            return q.boost * scores, mask
        if isinstance(q, (HasChild, HasParent)):
            pmap = self.join_maps.get(id(q))
            if pmap is None:
                raise ValueError(
                    "has_child/has_parent require partition-scope "
                    "resolution (searchers resolve it automatically; a "
                    "bare SegmentEvaluator needs join_maps= built by "
                    "raydex.search.joinquery)"
                )
            names, pids, relations = self.r.join_field_data()
            scores = np.zeros(self.n)
            mask = np.zeros(self.n, dtype=bool)
            if isinstance(q, HasChild):
                from raydex.index.joinfield import parent_relation_of

                prel = parent_relation_of(relations, q.type)
                if prel is None:
                    raise ValueError(
                        f"unknown child relation {q.type!r}; "
                        f"relations = {relations}"
                    )
                cand = np.flatnonzero(names == prel)
            else:
                kids = relations.get(q.parent_type)
                if kids is None:
                    raise ValueError(
                        f"unknown parent relation {q.parent_type!r}; "
                        f"relations = {relations}"
                    )
                cand = np.flatnonzero(
                    np.isin(names, np.asarray(kids, dtype=object))
                )
            keys, vals = pmap  # sorted parent ids + aligned scores
            if cand.size and keys.size:
                pv = pids[cand].astype(str)
                pos = np.searchsorted(keys, pv)
                ok = pos < keys.size
                hit = np.zeros(cand.size, dtype=bool)
                hit[ok] = keys[pos[ok]] == pv[ok]
                hits = cand[hit]
                mask[hits] = True
                scores[hits] = q.boost * vals[pos[hit]]
            return scores, mask
        if isinstance(q, ParentId):
            names, pids, _ = self.r.join_field_data()
            mask = (names == q.type) & (pids == q.id)
            return np.where(mask, q.boost, 0.0), mask
        raise TypeError(f"unknown query node {type(q)}")

    def top_k(self, q: Query, k: int, min_score: float | None = None):
        scores, mask = self.eval(q)
        if self.r.live is not None:  # deleted docs never match (liveDocs)
            mask = mask & self.r.live
        if min_score is not None:
            # the search body's `min_score`: absolute threshold, so the
            # per-segment filter equals the reference's global one
            mask = mask & (scores >= min_score)
        scores = np.where(mask, scores, 0.0)
        # keep docs that MATCH even with score 0 (pure filters): nudge via
        # the mask in top_k_select
        return top_k_select(scores, k, mask)

    def count(self, q: Query) -> int:
        _, mask = self.eval(q)
        if self.r.live is not None:
            mask = mask & self.r.live
        return int(mask.sum())

    def explain(self, q: Query, docid: int) -> dict:
        """Per-doc score breakdown (the `_explain` API shape)."""
        if isinstance(q, Match):
            terms = self.analyzer(q.text)
            parts = []
            total = 0.0
            for t in terms:
                s, m = self._term_leaf(t, 1.0)
                if m[docid]:
                    contrib = float(s[docid])
                    ti = self.r.lookup(t)
                    parts.append(
                        {
                            "term": t,
                            "score": contrib,
                            "df": self.stats.df.get(t, 0),
                            "idf": float(_idf(self.stats.ndocs, self.stats.df.get(t, 1))),
                            "dl": int(self.r.dl_quant[docid]),
                            "avgdl": self.stats.avgdl,
                        }
                    )
                    total += contrib
            return {"docid": docid, "url": self.r.url_of(docid), "score": total, "terms": parts}
        scores, mask = self.eval(q)
        return {
            "docid": docid,
            "url": self.r.url_of(docid),
            "score": float(scores[docid]),
            "matched": bool(mask[docid]),
        }
