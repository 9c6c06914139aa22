"""Distributed query: segment-reader actor pool + scatter-gather merge.

The query path mirrors the reference's query-then-fetch (SURVEY.md §3.2):
the driver analyzes the query with the index's analyzer, collects EXACT
global stats for the query terms (df summed over segments, N/avgdl from
the index manifest — the dfs_query_then_fetch-consistent mode), scatters
``top_k`` to an actor pool where each actor pins a slice of segments
(state loaded once per actor, reference analogue
``ContextIndexSearcher``/``ReaderContext``, SURVEY.md §2.4), and merges
per-segment top-k lists with the ``TopDocs.merge`` tie-break:
score desc, then segment ordinal asc, then docid asc
(``server/.../action/search/SearchPhaseController.java:144,186-208``).

Latency path = plain Ray actor calls (not a Dataset op); batch-QPS path
pipelines many queries across the pool. A ``LocalSearcher`` runs the
same code without Ray for unit tests.
"""

from __future__ import annotations

import heapq

import numpy as np

from raydex.analysis.tokenizer import get_analyzer
from raydex.index.segment import SegmentReader
from raydex.search.bm25 import GlobalStats, brute_force_top_k
from raydex.search.wand import conjunction_top_k, wand_top_k


import os

# auto-dispatch crossover for match scoring: dense brute at or below,
# MaxScore pruning above (see the rationale at the dispatch site)
_AUTO_BRUTE_MAX_NDOCS = int(os.environ.get("RAYDEX_AUTO_BRUTE_MAX_NDOCS",
                                           256_000))


def _scaled_float_factor(r, field: str) -> float | None:
    """scaling_factor when ``field`` is a scaled_float doc-values column
    of reader ``r`` (sort values and search_after cursors decode with
    it, matching the range-query surface), else None."""
    meta = getattr(r, "fields_meta", {}).get(field, {})
    if meta.get("analyzer") == "scaled_float":
        return float(meta.get("scaling_factor") or 100.0)
    return None


def _needs_fetch_phases(qdict: dict) -> bool:
    """True when hits carry per-hit annotations only the full
    search_query path produces (matched_queries from ``_name`` clauses,
    inner_hits from join nodes)."""
    from raydex.search.query import (
        collect_join_nodes,
        collect_named_queries,
        parse_query,
    )

    return bool(collect_named_queries(qdict)) or bool(
        collect_join_nodes(parse_query(qdict)))


def _part_of_seg(seg_dir: str) -> int | None:
    """Partition ordinal from the canonical ``part=NNNNN`` path layout.
    The LAST match wins — an index rooted under a directory whose name
    happens to contain ``part=`` must not shadow the segment's own
    partition component."""
    import re

    ms = re.findall(r"part=(\d+)", seg_dir)
    return int(ms[-1]) if ms else None


class SegmentGroup:
    """Plain-python holder of a slice of segments (used by actor + local)."""

    def __init__(self, seg_dirs: list[str], ordinals: list[int]):
        self.readers = [SegmentReader(d) for d in seg_dirs]
        self.ordinals = ordinals

    def term_stats(self, terms: list[str]) -> dict[str, int]:
        out = dict.fromkeys(terms, 0)
        for r in self.readers:
            for t in out:  # iterate UNIQUE terms: a query repeating a
                # term must not double its df (each repeat is its own
                # scoring clause, but df is a per-term index statistic)
                ti = r.lookup(t)
                if ti >= 0:
                    out[t] += int(r.df[ti])
        return out

    def field_term_stats(self, pairs: list[tuple[str, str]]) -> dict:
        """Global df for (field, term) pairs over index-time mapped
        fields (multi-field stats collection; text pairs are served by
        :meth:`term_stats`). Fields absent from a segment contribute 0."""
        out = {tuple(p): 0 for p in pairs}
        for r in self.readers:
            for f, t in out.keys():
                fr = r.field(f) if hasattr(r, "field") else None
                if fr is None:
                    continue
                ti = fr.lookup(t)
                if ti >= 0:
                    out[(f, t)] += int(fr.df[ti])
        return out

    def top_k(
        self,
        terms: list[str],
        k: int,
        ndocs: int,
        sum_dl: int,
        df: dict[str, int],
        method: str = "wand",
        operator: str = "or",
        minimum_should_match: int = 0,
        only_part: int | None = None,
    ) -> list[tuple[int, list[int], list[float], list[str]]]:
        stats = GlobalStats(ndocs=ndocs, sum_dl=sum_dl, df=df)
        out = []
        pairs = zip(self.readers, self.ordinals)
        if only_part is not None:
            pairs = [(r, o) for r, o in pairs
                     if _part_of_seg(r.seg_dir) == only_part]
        for r, o in pairs:
            m = method
            if m == "auto":
                # dense exhaustive scoring is ~optimal for RAM-resident
                # small segments (two O(ndocs) arrays + one scatter-add
                # per term beats MaxScore's theta bootstrap + candidate
                # marking: measured 1.1-1.25x on a 75k-doc segment at
                # every sum-df decile, warm AND cold); MaxScore's
                # essential-split/selective-decode pays off once the
                # per-term decode and O(ndocs) select dominate — large
                # merged segments, the at-scale configuration. Both
                # paths share the dense float64 accumulator, so scores
                # are bitwise-identical either way.
                m = "brute" if r.ndocs <= _AUTO_BRUTE_MAX_NDOCS else "wand"
            if r.live is not None:
                # segments with deletes take the brute path with the
                # liveDocs mask (the reference routes deleted docs out
                # during collection; pruning bounds stay sound because
                # brute scores everything) — deletes are transient
                # until a compacting merge, so this is the cold path
                ids, sc = brute_force_top_k(
                    r, terms, k, stats, operator=operator,
                    minimum_should_match=minimum_should_match, live=r.live,
                )
            elif operator == "and" and m != "brute":
                ids, sc = conjunction_top_k(r, terms, k, stats)
            elif m == "wand" and operator == "or" and minimum_should_match <= 1:
                ids, sc = wand_top_k(r, terms, k, stats)
            else:
                ids, sc = brute_force_top_k(
                    r, terms, k, stats, operator=operator,
                    minimum_should_match=minimum_should_match,
                )
            urls = [r.url_of(d) for d in ids]
            out.append((o, ids.tolist(), sc.tolist(), urls))
        return out

    def search_texts(self, queries: list[tuple[str, int]],
                     analyzer_name: str, ndocs: int, sum_dl: int,
                     method: str = "auto"):
        """Full-service batch search for replica serving: analyze, df,
        per-segment top-k AND the final merge happen inside ONE RPC.
        Correct only when the group holds EVERY segment (the
        ReplicatedSearcher layout), which makes group-local df exact
        global df. The per-query-RPC variant bottlenecked the
        coordinator (analyze + 2 serializations + merge per query:
        measured ~850 qps ceiling at 16 cpus with replicas idle)."""
        from raydex.analysis.tokenizer import get_analyzer

        an = get_analyzer(analyzer_name)
        analyzed = [an(q) for q, _ in queries]
        uniq = sorted({t for ts in analyzed for t in ts})
        gdf = self.term_stats(uniq) if uniq else {}
        out = []
        for terms, (_, k) in zip(analyzed, queries):
            if not terms:
                out.append([])
                continue
            df = {t: gdf.get(t, 0) for t in terms}
            out.append(
                merge_top_k(self.top_k(terms, k, ndocs, sum_dl, df, method), k)
            )
        return out

    def top_k_many(self, queries, ndocs: int, sum_dl: int,
                   gdf: dict[str, int], method: str = "auto"):
        """Batched evaluation: ONE RPC carries every query of a batch
        (the per-query scatter fan-out cost dominates batch QPS
        otherwise — measured 3000 RPCs serializing on the driver).
        ``queries`` = [(terms, k), ...]; returns a list per query."""
        out = []
        for terms, k in queries:
            df = {t: gdf.get(t, 0) for t in terms}
            out.append(self.top_k(terms, k, ndocs, sum_dl, df, method))
        return out

    def _can_match_readers(self, q, can_match: bool,
                           only_part: int | None = None):
        """Segment pre-filter (the reference's can-match phase,
        ``CanMatchPreFilterSearchPhase.java``): skip segments whose
        stored [min, max] is disjoint from the query's required ranges.
        ``only_part`` additionally restricts to one routed partition
        (the ``?routing=`` search parameter — the reference searches
        only the routed shard, ``OperationRouting.searchShards``).
        ``last_can_match_skipped`` records the skip count (testable)."""
        from raydex.search.query import collect_required_ranges, segment_can_match

        pairs = list(zip(self.readers, self.ordinals))
        self.last_routing_skipped = 0
        if only_part is not None:
            kept = [(r, o) for r, o in pairs
                    if _part_of_seg(r.seg_dir) == only_part]
            self.last_routing_skipped = len(pairs) - len(kept)
            pairs = kept
        self.last_can_match_skipped = 0
        if not can_match:
            return pairs
        ranges = collect_required_ranges(q)
        if not ranges:
            return pairs
        kept = [
            (r, o) for r, o in pairs if segment_can_match(r.manifest, ranges)
        ]
        self.last_can_match_skipped = len(pairs) - len(kept)
        return kept

    def can_match_skipped(self) -> int:
        return getattr(self, "last_can_match_skipped", 0)

    def join_phase1(self, qdict: dict, ndocs: int, sum_dl: int,
                    df: dict[str, int], analyzer_name: str,
                    fdf: dict | None = None,
                    field_sum_dl: dict | None = None,
                    runtime_mappings: dict | None = None):
        """Phase 1 of has_child/has_parent over THIS group's segments
        (one RPC per actor; the coordinator reduces the partials). Runs
        over ALL segments — can-match skipping must not drop segments
        whose children/parents match the inner query."""
        from raydex.analysis.tokenizer import get_analyzer
        from raydex.search.joinquery import join_phase1 as _phase1
        from raydex.search.query import collect_join_nodes, parse_query

        stats = GlobalStats(ndocs=ndocs, sum_dl=sum_dl, df=df,
                            fdf=fdf, field_sum_dl=field_sum_dl)
        q = parse_query(qdict)
        nodes = collect_join_nodes(q)
        return _phase1(self.readers, nodes, stats,
                       get_analyzer(analyzer_name),
                       runtime_mappings=runtime_mappings)

    def matched_queries(self, pairs, named, ndocs: int, sum_dl: int,
                        df: dict[str, int], analyzer_name: str,
                        fdf: dict | None = None,
                        field_sum_dl: dict | None = None,
                        runtime_mappings: dict | None = None):
        """{(ordinal, docid): [names]} for the owned pairs — the
        reference's named queries / per-hit matched_queries
        (``AbstractQueryBuilder#queryName``): each ``_name``-tagged
        clause re-evaluates as a standalone mask on the hit's segment.
        Join clauses inside a named query are not supported (their
        partition maps are keyed to the main tree)."""
        from raydex.analysis.tokenizer import get_analyzer
        from raydex.search.query import (
            SegmentEvaluator,
            collect_join_nodes,
            parse_query,
        )

        stats = GlobalStats(ndocs=ndocs, sum_dl=sum_dl, df=df,
                            fdf=fdf, field_sum_dl=field_sum_dl)
        an = get_analyzer(analyzer_name)
        own = {o: r for r, o in zip(self.readers, self.ordinals)}
        per_o: dict = {}
        for o, d in pairs:
            if o in own:
                per_o.setdefault(o, []).append(d)
        parsed = []
        for name, sub in named:
            q = parse_query(sub)
            if collect_join_nodes(q):
                raise ValueError(
                    f"named query {name!r} contains a join clause — "
                    f"matched_queries does not support has_child/"
                    f"has_parent names"
                )
            parsed.append((name, q))
        out: dict = {}
        for o, docs in per_o.items():
            r = own[o]
            ev = SegmentEvaluator(r, stats, an,
                                  runtime_mappings=runtime_mappings)
            for name, q in parsed:
                _, mask = ev.eval(q)
                for d in docs:
                    if mask[d]:
                        out.setdefault((o, d), []).append(name)
        return out

    def join_parent_ids(self, pairs):
        """{(ordinal, docid): parent_id} for the pairs whose segment this
        group owns — the inner_hits fetch needs a child hit's parent
        pointer after the top-k merge."""
        own = {o: r for r, o in zip(self.readers, self.ordinals)}
        out = {}
        for o, d in pairs:
            r = own.get(o)
            if r is not None:
                _, pids, _ = r.join_field_data()
                out[(o, d)] = pids[d]
        return out

    def docvalue_fields(self, pairs, fields: list[str]):
        """{(ordinal, docid): {field: value}} for owned pairs — the
        fetch sub-phase for ``docvalue_fields`` (the reference returns
        doc-values columns per hit without _source). ``dl`` and any
        stored doc-values column serve; scaled_float decodes."""
        own = {o: r for r, o in zip(self.readers, self.ordinals)}
        out: dict = {}
        for o, d in pairs:
            r = own.get(o)
            if r is None:
                continue
            row = {}
            for f in fields:
                if f == "dl":
                    row[f] = int(r.dl[d])
                elif f in r.doc_values:
                    v = r.doc_values[f][d]
                    sf = _scaled_float_factor(r, f)
                    row[f] = float(v) / sf if sf else (
                        float(v) if hasattr(v, "dtype")
                        and v.dtype.kind == "f" else int(v)
                    )
            out[(o, d)] = row
        return out

    def fetch_source(self, pairs, includes, excludes,
                     script_fields=None):
        """{(ordinal, docid): (source_dict, script_values)} for owned
        pairs — the FetchSourcePhase/ScriptFieldsPhase sub-phase. The
        hit's source document is its stored per-doc columns (url, dl,
        every doc-values column, scaled_float decoded)."""
        from raydex.search.fetchphase import (
            filter_source,
            run_script_fields,
        )

        own = {o: r for r, o in zip(self.readers, self.ordinals)}
        out: dict = {}
        kw_cols: dict = {}  # (ordinal, field) -> per-doc value array
        for o, d in pairs:
            r = own.get(o)
            if r is None:
                continue
            doc = {"url": str(r.urls[d]), "dl": int(r.dl[d])}
            for f, col in r.doc_values.items():
                v = col[d]
                sf = _scaled_float_factor(r, f)
                if sf:
                    doc[f] = float(v) / sf
                elif isinstance(v, np.ndarray):
                    # list-valued doc values (histogram-field sub-cols)
                    doc[f] = v.tolist()
                else:
                    doc[f] = v.item() if hasattr(v, "item") else v
            # keyword index-time fields surface too (the reference's
            # _source carries them); single postings inversion per
            # (segment, field) per request, shared across its hits
            for f, meta in getattr(r, "fields_meta", {}).items():
                if f in doc or (meta.get("kind") or
                                meta.get("analyzer")) != "keyword":
                    continue
                key = (o, f)
                if key not in kw_cols:
                    from raydex.search.aggsphase import _multi_doc_values

                    kw_cols[key] = _multi_doc_values(r, f)
                v = kw_cols[key][d]
                if v is not None:
                    doc[f] = v
            scripts = run_script_fields(doc, script_fields)
            out[(o, d)] = (filter_source(doc, includes, excludes),
                           scripts)
        return out

    def query_top_k(self, qdict: dict, k: int, ndocs: int, sum_dl: int,
                    df: dict[str, int], analyzer_name: str,
                    fdf: dict | None = None,
                    field_sum_dl: dict | None = None,
                    can_match: bool = True,
                    runtime_mappings: dict | None = None,
                    join_maps: dict | None = None,
                    min_score: float | None = None,
                    only_part: int | None = None):
        """Structured query-DSL evaluation (raydex.search.query).

        ``join_maps`` = reduced per-(node, partition) parent maps for
        has_child/has_parent (raydex.search.joinquery); when the query
        has join nodes and no maps were provided, the group resolves
        them over its OWN segments — correct only when the group is
        partition-complete (LocalSearcher always is; RaySearcher passes
        coordinator-reduced maps instead)."""
        from raydex.analysis.tokenizer import get_analyzer
        from raydex.search.joinquery import (
            evaluator_join_maps,
            join_phase1 as _phase1,
            reduce_join_phase1,
        )
        from raydex.search.query import (
            SegmentEvaluator,
            collect_join_nodes,
            parse_query,
        )

        stats = GlobalStats(ndocs=ndocs, sum_dl=sum_dl, df=df,
                            fdf=fdf, field_sum_dl=field_sum_dl)
        q = parse_query(qdict)
        an = get_analyzer(analyzer_name)
        jnodes = collect_join_nodes(q)
        if jnodes and join_maps is None:
            partial = _phase1(self.readers, jnodes, stats, an,
                              runtime_mappings=runtime_mappings)
            join_maps = reduce_join_phase1(jnodes, [partial])
        out = []
        for r, o in self._can_match_readers(q, can_match, only_part):
            ev = SegmentEvaluator(
                r, stats, an, runtime_mappings=runtime_mappings,
                join_maps=evaluator_join_maps(jnodes, join_maps, r.seg_dir),
            )
            ids, sc = ev.top_k(q, k, min_score=min_score)
            urls = [r.url_of(d) for d in ids]
            out.append((o, ids.tolist(), sc.tolist(), urls))
        return out

    def profile_query(self, qdict: dict, k: int, ndocs: int, sum_dl: int,
                      df: dict[str, int], analyzer_name: str,
                      fdf: dict | None = None,
                      field_sum_dl: dict | None = None,
                      runtime_mappings: dict | None = None,
                      join_maps: dict | None = None):
        """`"profile": true` analogue (the reference's QueryProfiler /
        ProfileResult, ``es/search/profile/query/QueryProfiler.java``):
        per-segment wall time, matched-doc count, and the query kind —
        plus the group's can-match skip count. Returns (per_seg_hits,
        profile_rows); timings measure this group's evaluation only, the
        coordinator adds merge/reduce time."""
        import time as _time

        from raydex.analysis.tokenizer import get_analyzer
        from raydex.search.joinquery import (
            evaluator_join_maps,
            join_phase1 as _phase1,
            reduce_join_phase1,
        )
        from raydex.search.query import (
            SegmentEvaluator,
            collect_join_nodes,
            parse_query,
        )

        stats = GlobalStats(ndocs=ndocs, sum_dl=sum_dl, df=df,
                            fdf=fdf, field_sum_dl=field_sum_dl)
        q = parse_query(qdict)
        an = get_analyzer(analyzer_name)
        jnodes = collect_join_nodes(q)
        join_ns = 0
        if jnodes and join_maps is None:
            t0 = _time.perf_counter_ns()
            partial = _phase1(self.readers, jnodes, stats, an,
                              runtime_mappings=runtime_mappings)
            join_maps = reduce_join_phase1(jnodes, [partial])
            join_ns = _time.perf_counter_ns() - t0
        kind = next(iter(qdict))
        out, prof = [], []
        for r, o in self._can_match_readers(q, can_match=True):
            ev = SegmentEvaluator(
                r, stats, an, runtime_mappings=runtime_mappings,
                join_maps=evaluator_join_maps(jnodes, join_maps, r.seg_dir),
            )
            # time the REAL search path (ev.top_k — same semantics as
            # query_top_k forever); the untimed second eval only feeds
            # the matched-docs count
            t0 = _time.perf_counter_ns()
            ids, sc = ev.top_k(q, k)
            eval_ns = _time.perf_counter_ns() - t0
            _, mask = ev.eval(q)
            if r.live is not None:
                mask = mask & r.live
            urls = [r.url_of(d) for d in ids]
            out.append((o, ids.tolist(), sc.tolist(), urls))
            prof.append(
                {
                    "segment": r.manifest.get("seg_id", r.seg_dir),
                    "type": kind,
                    "time_in_nanos": int(eval_ns),
                    "matched": int(mask.sum()),
                    "docs": int(r.ndocs),
                }
            )
        meta = {
            "can_match_skipped": self.can_match_skipped(),
            "join_phase1_nanos": int(join_ns),
        }
        return out, prof, meta

    _SORT_RANGES = {
        "dl": ("min_dl", "max_dl"),
        "url": ("min_url", "max_url"),
        "warc_ts": ("min_warc_ts", "max_warc_ts"),
    }

    def sorted_top_k(self, qdict: dict, sort_field: str, order: str, k: int,
                     ndocs: int, sum_dl: int, df: dict[str, int],
                     analyzer_name: str, fdf: dict | None = None,
                     field_sum_dl: dict | None = None,
                     search_after: tuple | None = None,
                     join_maps: dict | None = None,
                     runtime_mappings: dict | None = None):
        """Field-sorted top-k with index-sort early termination — the
        reference's FieldSortBuilder + BottomSortValuesCollector
        (``action/search/BottomSortValuesCollector.java``,
        ``search/sort/FieldSortBuilder.java``): segments are visited in
        sort-range order (min asc / max desc — the can-match survivor
        ordering, CanMatchPreFilterSearchPhase.java:138) and, once k
        hits are collected, a segment whose whole [min, max] range lies
        beyond the current bottom is SKIPPED without evaluation.
        ``last_sort_skipped`` counts skips (testable).

        Sortable doc-values: ``dl`` (int64) and ``url`` (string) —
        the stored per-doc columns. Tie-break (value, ordinal, docid),
        the reference's shard-index then doc-id rule. Returns hits
        sorted, each {url, sort_value, ordinal, docid}."""
        from raydex.search.query import SegmentEvaluator, parse_query

        # geo_distance sort ({"_geo_distance": {field: point, "unit":
        # ...}} — search/sort/GeoDistanceSortBuilder): sort values are
        # haversine distances computed per segment from the geo_point
        # lat/lon doc-values; no stored bounds, so segment skipping is
        # disabled (every segment is evaluated, like the reference
        # without a bounding-box rewrite)
        geo_spec = None
        if isinstance(sort_field, dict) and "_geo_distance" in sort_field:
            from raydex.ops.geo import haversine_m, parse_distance_m
            from raydex.search.query import _latlon

            gb = sort_field["_geo_distance"]
            gfield = [kk for kk in gb if kk not in
                      ("unit", "order", "distance_type", "mode")][0]
            glat, glon = _latlon(gb[gfield], (0.0, 0.0))
            gscale = parse_distance_m("1" + gb.get("unit", "m"))

            def _geo_vals(r, cand):
                la = r.doc_values[f"{gfield}__lat"][cand]
                ln = r.doc_values[f"{gfield}__lon"][cand]
                return haversine_m(glat, glon, la, ln) / gscale

            geo_spec = (gfield, _geo_vals)
            sort_field = f"__geo_distance__{gfield}"
            if not all(f"{gfield}__lat" in r.doc_values
                       for r in self.readers):
                raise ValueError(
                    f"geo_distance sort needs a geo_point field "
                    f"{gfield!r} on every segment")
        if geo_spec is None and sort_field not in ("dl", "url") and not all(
            sort_field in r.doc_values for r in self.readers
        ):
            raise ValueError(
                f"sort field {sort_field!r} is not a stored doc-values "
                f"column of every segment — build with "
                f"index_sort=({sort_field!r}, ...) or a "
                f"long/double/date FieldSpec to store it"
            )
        if order not in ("asc", "desc"):
            raise ValueError("order must be 'asc' or 'desc'")
        # any stored doc-values column sorts; manifests record
        # min_<f>/max_<f> for index-sort and numeric/date fields
        lo_key, hi_key = self._SORT_RANGES.get(
            sort_field, (f"min_{sort_field}", f"max_{sort_field}")
        )
        stats = GlobalStats(ndocs=ndocs, sum_dl=sum_dl, df=df,
                            fdf=fdf, field_sum_dl=field_sum_dl)
        q = parse_query(qdict)
        an = get_analyzer(analyzer_name)
        pairs = list(zip(self.readers, self.ordinals))
        # visit order: most-promising first (the survivor ordering) —
        # min asc for asc sorts, max desc for desc sorts; segments
        # without range metadata are never skipped (the is-not-None
        # guard below), only possibly visited late
        default = "" if sort_field == "url" else 0
        if order == "asc":
            pairs.sort(key=lambda p: p[0].manifest.get(lo_key) or default)
        else:
            pairs.sort(key=lambda p: p[0].manifest.get(hi_key) or default,
                       reverse=True)
        def canon_sort(rows):
            rows.sort(key=lambda h: (h[1], h[2]))                 # ties
            rows.sort(key=lambda h: h[0], reverse=(order == "desc"))
            return rows

        from raydex.search.joinquery import (
            evaluator_join_maps,
            join_phase1 as _jphase1,
            reduce_join_phase1 as _jreduce,
        )
        from raydex.search.query import collect_join_nodes

        jnodes = collect_join_nodes(q)
        if jnodes and join_maps is None:  # partition-complete self-resolve
            join_maps = _jreduce(
                jnodes,
                [_jphase1(self.readers, jnodes, stats, an,
                          runtime_mappings=runtime_mappings)],
            )
        self.last_sort_skipped = 0
        out: list[tuple] = []  # (value, ordinal, docid), canon-sorted, <=k
        for r, o in pairs:
            if len(out) >= k:
                bottom = out[-1][0]
                seg_lo, seg_hi = r.manifest.get(lo_key), r.manifest.get(hi_key)
                if order == "asc" and seg_lo is not None and seg_lo > bottom:
                    self.last_sort_skipped += 1
                    continue
                if order == "desc" and seg_hi is not None and seg_hi < bottom:
                    self.last_sort_skipped += 1
                    continue
            ev = SegmentEvaluator(
                r, stats, an, runtime_mappings=runtime_mappings,
                join_maps=evaluator_join_maps(jnodes, join_maps, r.seg_dir),
            )
            _, mask = ev.eval(q)
            if r.live is not None:
                mask = mask & r.live
            cand = np.flatnonzero(mask)
            if not cand.size:
                continue
            if search_after is not None:
                # deep-paging cursor (the reference's search_after over a
                # field sort): keep only docs strictly beyond
                # (value, ordinal, docid) in sort order
                av, ao, ad = search_after
                if geo_spec is not None:
                    vv = geo_spec[1](r, cand)
                elif sort_field == "dl":
                    vv = r.dl[cand]
                elif sort_field in r.doc_values:
                    vv = r.doc_values[sort_field][cand]
                    sf_factor = _scaled_float_factor(r, sort_field)
                    if sf_factor:
                        vv = vv / sf_factor
                else:
                    vv = np.asarray([r.url_of(int(d)) for d in cand],
                                    dtype=object)
                beyond = (vv > av) if order == "asc" else (vv < av)
                ties = vv == av
                if ties.any():
                    tie_ok = (o > ao) | ((o == ao) & (cand > ad))
                    beyond = beyond | (ties & tie_ok)
                cand = cand[beyond]
                if not cand.size:
                    continue
            seg_sort = r.manifest.get("index_sort")
            if seg_sort and seg_sort[0] == sort_field and seg_sort[1] == order:
                # INDEX-SORT early termination (the reference's sorted-
                # index fast path, `IndexSortConfig` + Lucene
                # TopFieldCollector early exit): docs are STORED in the
                # requested order, so the first k matching docids ARE the
                # segment top-k — skip the value gather/partition for the
                # rest entirely
                cand = cand[:k]
                self.last_sort_early_terminated = (
                    getattr(self, "last_sort_early_terminated", 0) + 1
                )
            if geo_spec is not None:
                v = geo_spec[1](r, cand)
                if cand.size > k:
                    part = (np.argpartition(v, k - 1)[:k] if order == "asc"
                            else np.argpartition(-v, k - 1)[:k])
                    cand, v = cand[part], v[part]
                seg_vals = [float(x) for x in v]
            elif sort_field == "dl":
                v = r.dl[cand]
                if cand.size > k:  # per-segment narrowing before the sort
                    part = (np.argpartition(v, k - 1)[:k] if order == "asc"
                            else np.argpartition(-v, k - 1)[:k])
                    cand, v = cand[part], v[part]
                seg_vals = [int(x) for x in v]
            elif sort_field in r.doc_values:
                v = r.doc_values[sort_field][cand]
                sf_factor = _scaled_float_factor(r, sort_field)
                if sf_factor:
                    # scaled_float sorts and REPORTS in decoded units —
                    # the same surface the range query compares on
                    v = v / sf_factor
                if cand.size > k:
                    part = (np.argpartition(v, k - 1)[:k] if order == "asc"
                            else np.argpartition(-v, k - 1)[:k])
                    cand, v = cand[part], v[part]
                # keep the column's own kind: double columns sort (and
                # report sort_value) as floats, not truncated ints
                conv = float if v.dtype.kind == "f" else int
                seg_vals = [conv(x) for x in v]
            else:  # url (string doc-values)
                seg_vals = [r.url_of(int(d)) for d in cand]
            out.extend((val, o, int(d)) for val, d in zip(seg_vals, cand))
            out = canon_sort(out)[:k]
        return [
            {"url": self._url_of(o, d), "sort_value": val,
             "ordinal": o, "docid": d}
            for val, o, d in out
        ]

    def knn_top_k(self, field: str, qvec, num_candidates: int,
                  filter_qdict: dict | None = None,
                  ndocs: int = 0, sum_dl: int = 0,
                  df: dict | None = None, analyzer_name: str = "standard_en",
                  fdf: dict | None = None, field_sum_dl: dict | None = None,
                  nprobe: int | None = None):
        """Per-segment knn phase (raydex.search.knn.segment_knn): each
        segment returns its top ``num_candidates`` by vector similarity;
        optional ``filter_qdict`` (any DSL dict) pre-filters candidates
        (the reference's filtered-knn contract). Same wire shape as
        query_top_k: [(ordinal, ids, scores, urls)]."""
        from raydex.search.knn import segment_knn

        flt = None
        if filter_qdict is not None:
            from raydex.search.query import SegmentEvaluator, parse_query

            flt = parse_query(filter_qdict)
            stats = GlobalStats(ndocs=ndocs, sum_dl=sum_dl, df=df or {},
                                fdf=fdf, field_sum_dl=field_sum_dl)
            an = get_analyzer(analyzer_name)
        out = []
        for r, o in zip(self.readers, self.ordinals):
            mask = None
            if flt is not None:
                _, mask = SegmentEvaluator(r, stats, an).eval(flt)
            ids, sc = segment_knn(r, field, qvec, num_candidates, mask,
                                  nprobe=nprobe)
            urls = [r.url_of(d) for d in ids]
            out.append((o, ids.tolist(), sc.tolist(), urls))
        return out

    def terms_partials(self, field: str, shard_size: int):
        """Per-segment shard phase of the approximate terms agg
        (raydex.search.distributed_terms): each segment ships only its
        top shard_size (term, df) pairs."""
        from raydex.search.distributed_terms import segment_terms_partial

        return [segment_terms_partial(r, field, shard_size)
                for r in self.readers]

    def _url_of(self, ordinal: int, docid: int) -> str:
        r = self.readers[self.ordinals.index(ordinal)]
        return r.url_of(docid)

    def sort_skipped(self) -> int:
        return getattr(self, "last_sort_skipped", 0)

    def query_count(self, qdict: dict, ndocs: int, sum_dl: int,
                    df: dict[str, int], analyzer_name: str,
                    fdf: dict | None = None,
                    field_sum_dl: dict | None = None,
                    can_match: bool = True,
                    runtime_mappings: dict | None = None,
                    join_maps: dict | None = None) -> int:
        from raydex.analysis.tokenizer import get_analyzer
        from raydex.search.joinquery import (
            evaluator_join_maps,
            join_phase1 as _phase1,
            reduce_join_phase1,
        )
        from raydex.search.query import (
            SegmentEvaluator,
            collect_join_nodes,
            parse_query,
        )

        stats = GlobalStats(ndocs=ndocs, sum_dl=sum_dl, df=df,
                            fdf=fdf, field_sum_dl=field_sum_dl)
        q = parse_query(qdict)
        an = get_analyzer(analyzer_name)
        jnodes = collect_join_nodes(q)
        if jnodes and join_maps is None:
            partial = _phase1(self.readers, jnodes, stats, an,
                              runtime_mappings=runtime_mappings)
            join_maps = reduce_join_phase1(jnodes, [partial])
        return sum(
            SegmentEvaluator(
                r, stats, an, runtime_mappings=runtime_mappings,
                join_maps=evaluator_join_maps(jnodes, join_maps, r.seg_dir),
            ).count(q)
            for r, _ in self._can_match_readers(q, can_match)
        )

    def query_aggs(self, qdict: dict, aggs_spec: dict, ndocs: int,
                   sum_dl: int, df: dict[str, int], analyzer_name: str,
                   fdf: dict | None = None,
                   field_sum_dl: dict | None = None,
                   runtime_mappings: dict | None = None,
                   join_maps: dict | None = None, k: int = 0):
        """Aggregations phase over the query's matching docs: one merged
        partial tree per segment slice (the shard-level
        ``InternalAggregation`` stream — metadata-sized, never docs).

        With ``k > 0`` the SAME per-segment evaluation also yields the
        top-k hits (the reference collects hits and aggs in one shard
        pass); returns (merged_partials, per_segment_topk) — per_segment
        rows feed :func:`merge_top_k` exactly like ``query_top_k``'s.
        With ``k == 0`` returns just the merged partials."""
        from raydex.analysis.tokenizer import get_analyzer
        from raydex.search.aggsphase import (
            collect_filter_queries,
            collect_partials,
            reduce_partials,
        )
        from raydex.search.joinquery import (
            evaluator_join_maps,
            join_phase1 as _phase1,
            reduce_join_phase1,
        )
        from raydex.search.query import (
            SegmentEvaluator,
            collect_join_nodes,
            parse_query,
        )

        for fq in collect_filter_queries(aggs_spec):
            if collect_join_nodes(parse_query(fq)):
                raise ValueError(
                    "filter aggregations with has_child/has_parent "
                    "queries are not supported"
                )
        stats = GlobalStats(ndocs=ndocs, sum_dl=sum_dl, df=df,
                            fdf=fdf, field_sum_dl=field_sum_dl)
        q = parse_query(qdict)
        an = get_analyzer(analyzer_name)
        jnodes = collect_join_nodes(q)
        if jnodes and join_maps is None:
            partial = _phase1(self.readers, jnodes, stats, an,
                              runtime_mappings=runtime_mappings)
            join_maps = reduce_join_phase1(jnodes, [partial])
        parts = []
        per_seg_hits = []
        for r, o in zip(self.readers, self.ordinals):
            ev = SegmentEvaluator(
                r, stats, an, runtime_mappings=runtime_mappings,
                join_maps=evaluator_join_maps(jnodes, join_maps, r.seg_dir),
            )
            qscores, mask = ev.eval(q)
            if r.live is not None:  # deleted docs never reach a bucket
                mask = mask & r.live
            parts.append(collect_partials(r, ev, mask, aggs_spec,
                                          scores=qscores, ordinal=o))
            if k > 0:
                from raydex.search.bm25 import top_k_select

                ids, sc = top_k_select(
                    np.where(mask, qscores, 0.0), k, mask)
                per_seg_hits.append(
                    (o, ids.tolist(), sc.tolist(),
                     [r.url_of(d) for d in ids]))
        merged = reduce_partials(parts)
        return (merged, per_seg_hits) if k > 0 else merged


def merge_top_k(per_segment, k: int):
    """``TopDocs.merge``-style k-way merge.

    ``per_segment``: iterable of (ordinal, docids, scores, urls), each
    list already sorted by (score desc, docid asc). Tie-break:
    score desc, ordinal asc, docid asc.
    """
    heap = []
    for o, ids, scores, urls in per_segment:
        if ids:
            heap.append((-scores[0], o, ids[0], 0, (ids, scores, urls)))
    heapq.heapify(heap)
    out = []
    while heap and len(out) < k:
        negs, o, d, i, payload = heapq.heappop(heap)
        ids, scores, urls = payload
        out.append({"ordinal": o, "docid": d, "score": scores[i], "url": urls[i]})
        if i + 1 < len(ids):
            heapq.heappush(
                heap, (-scores[i + 1], o, ids[i + 1], i + 1, payload)
            )
    return out


# index.max_result_window (es/index/IndexSettings.java:90-91): deep
# from+size paging is capped; past it the reference demands search_after
MAX_RESULT_WINDOW = 10_000


def _window(k: int, from_: int) -> int:
    if from_ < 0:
        raise ValueError("from_ must be >= 0")
    if from_ + k > MAX_RESULT_WINDOW:
        raise ValueError(
            f"from+size {from_ + k} exceeds max_result_window "
            f"{MAX_RESULT_WINDOW}; use search_after for deep paging"
        )
    return from_ + k


def resolve_index_dirs(expr) -> list[str]:
    """Index-expression resolution (the reference's
    ``IndexNameExpressionResolver``): a list, or a comma-separated
    string, each element optionally a glob pattern (`logs-*`). Every
    element must match at least one index directory."""
    import glob as _glob

    parts = list(expr) if isinstance(expr, (list, tuple)) else str(expr).split(",")
    out: list[str] = []
    for p in parts:
        p = p.strip()
        if not p:
            continue
        matches = sorted(_glob.glob(p)) if any(c in p for c in "*?[") else [p]
        if not matches:
            raise ValueError(f"no index matches pattern: {p!r}")
        out.extend(m for m in matches if m not in out)
    if not out:
        raise ValueError(f"empty index expression: {expr!r}")
    return out


class SearcherBase:
    """One or several indexes (`/idx1,idx2/_search` semantics): segment
    lists concatenate, doc_count/sum_dl/df sum across indexes — global
    IDF over the union, the dfs_query_then_fetch-consistent mode."""

    def __init__(self, index_dir):
        from raydex.index.blocks import check_read
        from raydex.index.build import load_index_manifest, segment_dirs

        dirs = resolve_index_dirs(index_dir)
        for d in dirs:
            check_read(d)  # closed / read-blocked indexes reject search
        manifests = [load_index_manifest(d) for d in dirs]
        analyzers = {m["analyzer"] for m in manifests}
        if len(analyzers) > 1:
            raise ValueError(
                f"multi-index search requires one shared analyzer, got {analyzers}"
            )
        self.manifest = dict(manifests[0])
        if len(dirs) > 1:
            self.manifest["doc_count"] = sum(m["doc_count"] for m in manifests)
            self.manifest["sum_dl"] = sum(m["sum_dl"] for m in manifests)
        self.analyzer = get_analyzer(self.manifest["analyzer"])
        self.seg_dirs = [
            s for d, m in zip(dirs, manifests) for s in segment_dirs(d, m)
        ]
        self.ndocs = self.manifest["doc_count"]
        self.sum_dl = self.manifest["sum_dl"]
        # routing partition count (single-index only): the same
        # build_params-first rule get_doc routes with, so ?routing=
        # search targeting and point GETs agree across reshapes
        self.num_partitions = None
        if len(dirs) == 1:
            import json as _json

            pp = os.path.join(dirs[0], "build_params.json")
            if os.path.exists(pp):
                with open(pp) as f:
                    self.num_partitions = _json.load(f).get("num_partitions")
            else:
                self.num_partitions = self.manifest.get("num_partitions")
        # index-time mapped fields: union per-field specs, sum global dl
        self.fields_meta: dict = {}
        for m in manifests:
            for f, meta in (m.get("fields") or {}).items():
                agg = self.fields_meta.get(f)
                if agg is None:
                    self.fields_meta[f] = dict(meta)
                else:
                    agg["sum_dl"] = agg.get("sum_dl", 0) + meta.get("sum_dl", 0)
        self.field_sum_dl = {
            f: meta.get("sum_dl", 0) for f, meta in self.fields_meta.items()
        }
        # alias fields score with the TARGET's global dl (the
        # FieldAliasMapper path contract — alias == target, bitwise)
        for f, meta in self.fields_meta.items():
            if meta.get("analyzer") == "alias":
                # index-level meta carries the target under "source",
                # segment-level under "path"
                tgt = meta.get("path") or meta.get("source")
                self.field_sum_dl[f] = (
                    self.sum_dl if tgt == "text"
                    else self.field_sum_dl.get(tgt, 0)
                )

    def _join_field_info(self):
        for f, meta in self.fields_meta.items():
            if meta.get("analyzer") == "join":
                rel = meta.get("relations")
                if not rel and self.seg_dirs:
                    # indexes built before relations reached the index
                    # manifest: the segment manifests always carry them
                    import json as _json
                    import os as _os

                    with open(_os.path.join(self.seg_dirs[0],
                                            "manifest.json")) as fh:
                        sm = _json.load(fh)
                    rel = sm.get("fields", {}).get(f, {}).get("relations")
                return f, rel or {}
        raise ValueError(
            "index has no join field (build with "
            "FieldSpec(analyzer='join', relations=...))"
        )

    def children_agg(self, qdict: dict, child_type: str) -> dict:
        """Single-bucket `children` agg (parent-join module,
        ``ChildrenAggregationBuilder.java``): doc_count = docs of
        relation ``child_type`` whose parent matches ``qdict`` —
        composed from has_parent + a relation term on the join field,
        exactly the reference's children-context switch."""
        jf, relations = self._join_field_info()
        from raydex.index.joinfield import parent_relation_of

        prel = parent_relation_of(relations, child_type)
        if prel is None:
            raise ValueError(
                f"unknown child relation {child_type!r}; relations = "
                f"{relations}"
            )
        n = self.count({"bool": {"filter": [
            {"has_parent": {"parent_type": prel, "query": qdict}},
            {"term": {jf: child_type}},
        ]}})
        return {"doc_count": int(n)}

    def parent_agg(self, qdict: dict, child_type: str) -> dict:
        """Single-bucket `parent` agg (``ParentAggregationBuilder.java``):
        doc_count = DISTINCT parents owning at least one ``child_type``
        child matching ``qdict`` (has_child counts each parent once)."""
        self._join_field_info()  # fail fast on non-join indexes
        n = self.count({"has_child": {"type": child_type, "query": qdict}})
        return {"doc_count": int(n)}

    def analyze(self, query_text: str) -> list[str]:
        return self.analyzer(query_text)

    def _route_part(self, routing: str | None) -> int | None:
        """Partition for a ``?routing=`` search parameter (the
        reference's shard targeting, ``OperationRouting.searchShards``:
        the request fans out ONLY to the routed shard). Results equal
        the unrouted search restricted to docs of that partition, with
        identical scores (global stats stay index-wide — the engine's
        dfs_query_then_fetch contract)."""
        if routing is None:
            return None
        if self.num_partitions is None:
            raise ValueError(
                "routing requires a single index with a recorded "
                "partition count")
        from raydex.partition import route_partitions

        return int(route_partitions([routing], self.num_partitions)[0])

    def analyze_field(self, field: str, text: str) -> list[str]:
        """Per-field search analysis: the field's own index-time analyzer
        when mapped, keywordish fallback for derived fields."""
        if field == "text":
            return self.analyzer(text)
        meta = self.fields_meta.get(field)
        if meta and meta.get("analyzer") == "alias":
            return self.analyze_field(
                meta.get("path") or meta.get("source"), text
            )
        if meta and meta.get("analyzer") == "match_only_text":
            return self.analyzer(text)  # analyzed with the index analyzer
        if meta:
            return get_analyzer(meta["analyzer"])(text)
        from raydex.search.fields import tokenize_keywordish

        return tokenize_keywordish(text)

    def _collect_stats_spec(self, qdict: dict):
        """(text terms, field pairs) the coordinator must collect."""
        from raydex.search.query import collect_field_stat_terms, parse_query

        pairs = collect_field_stat_terms(parse_query(qdict), self.analyze_field)
        text_terms = sorted(t for f, t in pairs if f == "text")
        fpairs = sorted((f, t) for f, t in pairs
                        if f != "text" and f in self.fields_meta)
        return text_terms, fpairs

    def _aggs_stats_qdict(self, qdict: dict, aggs_spec: dict) -> dict:
        """Stats-collection query covering the main query AND every
        `filter` aggregation's query (their scoring leaves need global
        df exactly like the main tree)."""
        from raydex.search.aggsphase import collect_filter_queries

        fqs = collect_filter_queries(aggs_spec)
        return {"bool": {"should": [qdict, *fqs]}} if fqs else qdict

    @staticmethod
    def _combine_hybrid(query_hits: list, knn_hits: list, k: int,
                        query_boost: float = 1.0, knn_boost: float = 1.0):
        """Hybrid (query + knn) combination — the reference's rule when a
        ``_search`` body carries BOTH ``query`` and ``knn``: the knn
        section contributes its global-top-k scores, the query its own
        window, and a doc appearing in both sums the boosted scores
        (``KnnSearchBuilder``/SearchService docs: "score = query_score *
        boost + knn_score * boost", union of hit sets)."""
        combined: dict[tuple[int, int], dict] = {}
        for h in query_hits:
            key = (h["ordinal"], h["docid"])
            combined[key] = dict(h, score=h["score"] * query_boost)
        for h in knn_hits:
            key = (h["ordinal"], h["docid"])
            if key in combined:
                combined[key]["score"] += h["score"] * knn_boost
            else:
                combined[key] = dict(h, score=h["score"] * knn_boost)
        out = sorted(combined.values(),
                     key=lambda h: (-h["score"], h["ordinal"], h["docid"]))
        return out[:k]


class LocalSearcher(SearcherBase):
    """Single-process searcher (tests / tiny indexes)."""

    def __init__(self, index_dir: str):
        super().__init__(index_dir)
        self.group = SegmentGroup(self.seg_dirs, list(range(len(self.seg_dirs))))

    def search(self, query_text: str, k: int = 10, method: str = "auto",
               operator: str = "or", minimum_should_match: int = 0,
               from_: int = 0, routing: str | None = None):
        w = _window(k, from_)
        terms = self.analyze(query_text)
        if not terms:
            return []
        df = self.group.term_stats(terms)
        per_seg = self.group.top_k(
            terms, w, self.ndocs, self.sum_dl, df, method, operator,
            minimum_should_match, only_part=self._route_part(routing),
        )
        return merge_top_k(per_seg, w)[from_:]

    def _query_stats(self, qdict: dict):
        text_terms, fpairs = self._collect_stats_spec(qdict)
        df = self.group.term_stats(text_terms)
        fdf = self.group.field_term_stats(fpairs) if fpairs else {}
        return df, fdf

    def search_query(self, qdict: dict, k: int = 10, from_: int = 0,
                     runtime_mappings: dict | None = None,
                     docvalue_fields: list[str] | None = None,
                     min_score: float | None = None,
                     routing: str | None = None,
                     source=None,
                     script_fields: dict | None = None,
                     track_total_hits=None):
        """Structured DSL search (`POST _search {"query": ...}` analogue).
        ``runtime_mappings``: per-request runtime fields ({field:
        {"factory": <registered>, "params": {...}}}) — the search body's
        runtime_mappings section; fields resolve inside the segment
        evaluators with segment-local stats. ``source`` /
        ``script_fields`` run the FetchSourcePhase/ScriptFieldsPhase
        sub-phase (raydex.search.fetchphase): per-hit ``_source``
        include/exclude projection over the stored per-doc columns and
        registered-script computed fields. ``docvalue_fields`` adds a
        per-hit ``fields`` dict of stored doc-values columns (the
        fetch sub-phase; no _source exists in this engine)."""
        from raydex.search.joinquery import (
            attach_inner_hits,
            reduce_inner_hits,
            reduce_join_phase1,
        )
        from raydex.search.query import collect_join_nodes, parse_query

        w = _window(k, from_)
        df, fdf = self._query_stats(qdict)
        jnodes = collect_join_nodes(parse_query(qdict))
        jm = ih = None
        if jnodes:
            partial = self.group.join_phase1(
                qdict, self.ndocs, self.sum_dl, df,
                self.manifest["analyzer"], fdf=fdf,
                field_sum_dl=self.field_sum_dl,
                runtime_mappings=runtime_mappings,
            )
            jm = reduce_join_phase1(jnodes, [partial])
            ih = reduce_inner_hits(jnodes, [partial])
        per_seg = self.group.query_top_k(
            qdict, w, self.ndocs, self.sum_dl, df, self.manifest["analyzer"],
            fdf=fdf, field_sum_dl=self.field_sum_dl,
            runtime_mappings=runtime_mappings, join_maps=jm,
            min_score=min_score, only_part=self._route_part(routing),
        )
        hits = merge_top_k(per_seg, w)[from_:]
        if ih:
            got = {}

            def parent_ids_of(pairs):
                got.update(self.group.join_parent_ids(pairs))
                return [got.get(p) for p in pairs]

            attach_inner_hits(hits, jnodes, ih, self.seg_dirs, parent_ids_of)
        from raydex.search.query import collect_named_queries

        named = collect_named_queries(qdict)
        if named and hits:
            mq = self.group.matched_queries(
                [(h["ordinal"], h["docid"]) for h in hits], named,
                self.ndocs, self.sum_dl, df, self.manifest["analyzer"],
                fdf=fdf, field_sum_dl=self.field_sum_dl,
                runtime_mappings=runtime_mappings,
            )
            for h in hits:
                h["matched_queries"] = mq.get((h["ordinal"], h["docid"]), [])
        if docvalue_fields and hits:
            dv = self.group.docvalue_fields(
                [(h["ordinal"], h["docid"]) for h in hits], docvalue_fields
            )
            for h in hits:
                h["fields"] = dv.get((h["ordinal"], h["docid"]), {})
        if hits and (source is not None or script_fields):
            from raydex.search.fetchphase import normalize_source_spec

            spec = normalize_source_spec(source)
            src = self.group.fetch_source(
                [(h["ordinal"], h["docid"]) for h in hits],
                *(spec or ([], [])), script_fields=script_fields)
            for h in hits:
                doc, scripts = src.get((h["ordinal"], h["docid"]),
                                       ({}, {}))
                if spec is not None:
                    h["_source"] = doc
                if script_fields:
                    h.setdefault("fields", {}).update(scripts)
        if track_total_hits is not None and track_total_hits is not False:
            # `track_total_hits` (SearchSourceBuilder): opt into the
            # hits+total envelope. True = exact count; an int N caps
            # the reported value at N with relation "gte" beyond it
            # (the reference's default-10000 cap shape). The count is
            # one extra vectorized match pass, paid only on request.
            c = self.count(qdict, runtime_mappings=runtime_mappings)
            if track_total_hits is True:
                total = {"value": c, "relation": "eq"}
            else:
                cap = int(track_total_hits)
                total = ({"value": cap, "relation": "gte"} if c > cap
                         else {"value": c, "relation": "eq"})
            return {"hits": hits, "total": total}
        return hits

    def count(self, qdict: dict, runtime_mappings: dict | None = None) -> int:
        """The `_count` API analogue."""
        df, fdf = self._query_stats(qdict)
        return self.group.query_count(
            qdict, self.ndocs, self.sum_dl, df, self.manifest["analyzer"],
            fdf=fdf, field_sum_dl=self.field_sum_dl,
            runtime_mappings=runtime_mappings,
        )

    def search_aggs(self, qdict: dict, aggs: dict, k: int = 0,
                    runtime_mappings: dict | None = None) -> dict:
        """`_search` with an ``aggs`` body (AggregationPhase): per-
        segment collect over the query's matching docs, one reduce,
        reference-shaped ``{"hits": [...], "aggregations": {...}}``.
        ``k=0`` skips the hits phase (``"size": 0``, the faceting
        idiom)."""
        from raydex.search.aggsphase import fix_significant_bg, render_aggs

        # hits needing the fetch sub-phases (matched_queries attach,
        # inner_hits) go through search_query; plain hits ride the same
        # per-segment pass as the aggs collect
        one_pass_hits = k > 0 and not _needs_fetch_phases(qdict)
        df, fdf = self._query_stats(self._aggs_stats_qdict(qdict, aggs))
        res = self.group.query_aggs(
            qdict, aggs, self.ndocs, self.sum_dl, df,
            self.manifest["analyzer"], fdf=fdf,
            field_sum_dl=self.field_sum_dl,
            runtime_mappings=runtime_mappings,
            k=k if one_pass_hits else 0,
        )
        merged, per_seg = (res if one_pass_hits else (res, []))
        fix_significant_bg(aggs, merged, self.group.term_stats,
                           self.group.field_term_stats)
        out = {"hits": [], "aggregations": render_aggs(aggs, merged)}
        if one_pass_hits:
            out["hits"] = merge_top_k(per_seg, k)
        elif k > 0:
            out["hits"] = self.search_query(
                qdict, k=k, runtime_mappings=runtime_mappings)
        return out

    def profile_search(self, qdict: dict, k: int = 10,
                       runtime_mappings: dict | None = None) -> dict:
        """The `"profile": true` search option (QueryProfiler /
        SearchProfileResults): hits plus per-segment wall time, matched
        counts, can-match skips, and total took."""
        import time as _time

        df, fdf = self._query_stats(qdict)
        t0 = _time.perf_counter_ns()
        per_seg, prof, meta = self.group.profile_query(
            qdict, k, self.ndocs, self.sum_dl, df, self.manifest["analyzer"],
            fdf=fdf, field_sum_dl=self.field_sum_dl,
            runtime_mappings=runtime_mappings,
        )
        hits = merge_top_k(per_seg, k)
        took = _time.perf_counter_ns() - t0
        return {
            "hits": hits,
            "profile": {"segments": prof, **meta, "took_nanos": int(took)},
        }

    def search_sorted(self, qdict: dict, sort_field: str = "dl",
                      order: str = "asc", k: int = 10,
                      search_after: tuple | None = None):
        """Field-sorted hits (`"sort": [{field: order}]`) with
        BottomSortValuesCollector-style segment skipping — see
        SegmentGroup.sorted_top_k. ``search_after``: (sort_value,
        ordinal, docid) of the previous page's last hit — the deep-
        paging cursor (no max_result_window cap on this path)."""
        df, fdf = self._query_stats(qdict)
        return self.group.sorted_top_k(
            qdict, sort_field, order, k, self.ndocs, self.sum_dl, df,
            self.manifest["analyzer"], fdf=fdf, field_sum_dl=self.field_sum_dl,
            search_after=search_after,
        )

    def terms_agg(self, field: str, size: int = 10,
                  shard_size: int | None = None):
        """Approximate terms agg over an index-time keyword field with
        the reference's error contract (shard_size /
        doc_count_error_upper_bound / sum_other_doc_count) — see
        raydex.search.distributed_terms."""
        from raydex.search.distributed_terms import (
            default_shard_size,
            merge_terms_partials,
        )

        ss = shard_size or default_shard_size(size)
        return merge_terms_partials(
            self.group.terms_partials(field, ss), size
        )

    def knn_search(self, field: str, query_vector, k: int = 10,
                   num_candidates: int = 100, filter: dict | None = None,
                   nprobe: int | None = None):
        """kNN over a dense_vector field (the `_search` ``knn`` section):
        per-segment top num_candidates, merged to the global k.
        ``nprobe``: probe only that many IVF clusters per segment when
        the field was built with ivf_nlist (approximate; None = exact)."""
        df, fdf = self._query_stats(filter) if filter is not None else ({}, {})
        per_seg = self.group.knn_top_k(
            field, query_vector, max(num_candidates, k), filter, self.ndocs,
            self.sum_dl, df, self.manifest["analyzer"], fdf=fdf,
            field_sum_dl=self.field_sum_dl, nprobe=nprobe,
        )
        return merge_top_k(per_seg, k)

    def hybrid_search(self, qdict: dict, knn: dict, k: int = 10):
        """Query + knn in one request (the reference's combined `_search`
        body): see SearcherBase._combine_hybrid for the score rule.
        ``knn`` = {field, query_vector, k?, num_candidates?, boost?,
        filter?}."""
        qhits = self.search_query(qdict, k=k)
        khits = self.knn_search(
            knn["field"], knn["query_vector"], k=int(knn.get("k", k)),
            num_candidates=int(knn.get("num_candidates", 100)),
            filter=knn.get("filter"),
        )
        return self._combine_hybrid(
            qhits, khits, k, knn_boost=float(knn.get("boost", 1.0))
        )


class ReplicatedSearcher(SearcherBase):
    """Replica-based READ scaling (the reference's replica model: QPS
    scales by adding index copies, ``OperationRouting.java:185-190``
    adaptive replica selection): ``num_replicas`` actors EACH hold every
    segment; a batch of queries round-robins across replicas, one RPC
    per query (no per-query scatter fan-out). Use when one node can hold
    a full index copy — the high-QPS configuration; ``RaySearcher``
    (scatter-gather over disjoint segment slices) is the big-index
    configuration."""

    def __init__(self, index_dir: str, num_replicas: int = 4, cpus_per_replica: int = 1):
        super().__init__(index_dir)
        import ray

        RemoteGroup = ray.remote(SegmentGroup)
        ords = list(range(len(self.seg_dirs)))
        self.actors = [
            RemoteGroup.options(num_cpus=cpus_per_replica).remote(self.seg_dirs, ords)
            for _ in range(num_replicas)
        ]
        self._ray = ray
        # global df is exact from any single replica (it sees all segments)
        self._df_actor = self.actors[0]

    def wait_ready(self) -> None:
        """Block until EVERY replica finished loading its readers.

        Constructors run concurrently; a query batch that happens to skip
        a replica (e.g. a stopword-only query) would otherwise hit a
        still-constructing actor mid-measurement — one laggard
        constructor gates the whole batch (measured: a 10x QPS cliff)."""
        self._ray.get([a.term_stats.remote([]) for a in self.actors])

    def shutdown(self) -> None:
        """Release the replica actors and their CPU reservations.

        Long-lived replicas holding ``num_replicas`` CPUs starve any
        Dataset pipeline launched afterwards in the same session — on an
        8-cpu cluster, 4 replicas + two chained hash-shuffle aggregator
        pools left ZERO cpus for map tasks (measured deadlock). Call
        this when the serving phase ends."""
        for a in self.actors:
            self._ray.kill(a)
        self.actors = []
        self._df_actor = None

    def _check_live(self) -> None:
        if not self.actors or self._df_actor is None:
            raise RuntimeError(
                "ReplicatedSearcher has been shut down — create a new "
                "searcher; shutdown() released the replica actors"
            )

    def search_batch(self, queries: list[tuple[str, int]], method: str = "auto"):
        """Round-robin the batch across replicas, ONE RPC per replica:
        each replica analyzes, collects (exact, it holds all segments)
        df, scores and merges its strided slice — the coordinator only
        reassembles. The prior per-query-RPC shape serialized analyze +
        merge on the driver (~850 qps ceiling at 16 cpus)."""
        self._check_live()
        n = len(self.actors)
        slices = [queries[i::n] for i in range(n)]
        refs = [
            a.search_texts.remote(sl, self.manifest["analyzer"],
                                  self.ndocs, self.sum_dl, method)
            for a, sl in zip(self.actors, slices) if sl
        ]
        out: list = [None] * len(queries)
        ri = 0
        for i, sl in enumerate(slices):
            if not sl:
                continue
            out[i::n] = self._ray.get(refs[ri])
            ri += 1
        return out

    def knn_search(self, field: str, query_vector, k: int = 10,
                   num_candidates: int = 100, filter: dict | None = None):
        """kNN on one replica (each holds every segment, so a single
        RPC returns the exact global top-k)."""
        self._check_live()
        if filter is not None:
            raise ValueError(
                "filtered knn on ReplicatedSearcher needs df stats; use "
                "LocalSearcher/RaySearcher for filtered knn"
            )
        qv = list(map(float, query_vector))
        per_seg = self._ray.get(
            self._df_actor.knn_top_k.remote(field, qv, max(num_candidates, k))
        )
        return merge_top_k(per_seg, k)

    def knn_search_batch(self, queries, k: int = 10,
                         num_candidates: int = 100):
        """Batched knn QPS path: queries round-robin across replicas,
        one RPC each (the replica holds the whole index — the same
        read-scaling model as search_batch). ``queries`` = [(field,
        vector), ...]."""
        self._check_live()
        refs = [
            self.actors[i % len(self.actors)].knn_top_k.remote(
                f, list(map(float, v)), max(num_candidates, k)
            )
            for i, (f, v) in enumerate(queries)
        ]
        return [merge_top_k(self._ray.get(r), k) for r in refs]

    def search_batch_adaptive(self, queries: list[tuple[str, int]],
                              method: str = "auto"):
        """Adaptive replica selection — the reference's ARS
        (ResponseCollectorService.java:175, OperationRouting.java:185):
        each query goes to the replica minimizing
        ``EWMA(service time) x (outstanding + 1)``; the EWMA updates on
        completion (alpha=0.3). Under a straggling replica this shifts
        load away instead of blindly round-robining; results are
        identical to ``search_batch`` (same index on every replica)."""
        import time as _time

        self._check_live()
        analyzed = [self.analyze(q) for q, _ in queries]
        uniq = sorted({t for ts in analyzed for t in ts})
        gdf = self._ray.get(self._df_actor.term_stats.remote(uniq)) if uniq else {}
        n = len(self.actors)
        ewma = getattr(self, "_ars_ewma", None)
        if ewma is None:
            ewma = self._ars_ewma = [1e-3] * n
        outstanding = [0] * n
        alpha = 0.3
        pending: dict = {}
        out: list = [None] * len(queries)
        for i, (terms, (_, k)) in enumerate(zip(analyzed, queries)):
            if not terms:
                out[i] = []
                continue
            df = {t: gdf.get(t, 0) for t in terms}
            r = min(range(n), key=lambda j: ewma[j] * (outstanding[j] + 1))
            ref = self.actors[r].top_k.remote(
                terms, k, self.ndocs, self.sum_dl, df, method
            )
            pending[ref] = (i, r, _time.perf_counter())
            outstanding[r] += 1
        while pending:
            done, _ = self._ray.wait(list(pending), num_returns=1)
            i, r, t0 = pending.pop(done[0])
            ewma[r] = (1 - alpha) * ewma[r] + alpha * (_time.perf_counter() - t0)
            outstanding[r] -= 1
            out[i] = merge_top_k(self._ray.get(done[0]), queries[i][1])
        return out


class RaySearcher(SearcherBase):
    """Actor-pool scatter-gather searcher.

    ``num_actors`` actors each pin a contiguous slice of the global
    segment order; df collection and top-k are one round-trip each
    (df per query is k terms × actors — tiny).
    """

    def __init__(self, index_dir: str, num_actors: int = 8):
        super().__init__(index_dir)
        import ray

        n = max(1, min(num_actors, len(self.seg_dirs)))
        RemoteGroup = ray.remote(SegmentGroup)
        self.actors = []
        # round-robin segments over actors to balance partitions
        slices: list[list[int]] = [[] for _ in range(n)]
        for i in range(len(self.seg_dirs)):
            slices[i % n].append(i)
        for idx in slices:
            self.actors.append(
                RemoteGroup.options(num_cpus=1).remote(
                    [self.seg_dirs[i] for i in idx], idx
                )
            )
        self._ray = ray

    def shutdown(self) -> None:
        """Release the scatter actors' CPU reservations (see
        ReplicatedSearcher.shutdown)."""
        for a in self.actors:
            self._ray.kill(a)
        self.actors = []

    def _stats(self, terms: list[str]) -> dict[str, int]:
        partials = self._ray.get([a.term_stats.remote(terms) for a in self.actors])
        df = dict.fromkeys(terms, 0)
        for p in partials:
            for t, v in p.items():
                df[t] += v
        return df

    def search(self, query_text: str, k: int = 10, method: str = "auto",
               operator: str = "or", minimum_should_match: int = 0,
               from_: int = 0, routing: str | None = None):
        w = _window(k, from_)
        terms = self.analyze(query_text)
        if not terms:
            return []
        df = self._stats(terms)
        refs = [
            a.top_k.remote(terms, w, self.ndocs, self.sum_dl, df, method,
                           operator, minimum_should_match,
                           only_part=self._route_part(routing))
            for a in self.actors
        ]
        per_seg = [seg for actor_out in self._ray.get(refs) for seg in actor_out]
        return merge_top_k(per_seg, w)[from_:]

    def _field_stats(self, fpairs) -> dict:
        if not fpairs:
            return {}
        partials = self._ray.get(
            [a.field_term_stats.remote(fpairs) for a in self.actors]
        )
        fdf = dict.fromkeys((tuple(p) for p in fpairs), 0)
        for p in partials:
            for k, v in p.items():
                fdf[k] += v
        return fdf

    def _join_maps(self, qdict, df, fdf, runtime_mappings=None):
        """Coordinator side of has_child/has_parent: one phase-1 RPC per
        actor (each covers its segment slice), reduced here to the
        per-(node, partition) parent maps — required because actors
        round-robin segments, so no single actor is partition-complete.
        Returns (nodes, join_maps, inner_maps) — (None, None, None) for
        join-free queries (the common fast path)."""
        from raydex.search.joinquery import (
            reduce_inner_hits,
            reduce_join_phase1,
        )
        from raydex.search.query import collect_join_nodes, parse_query

        nodes = collect_join_nodes(parse_query(qdict))
        if not nodes:
            return None, None, None
        partials = self._ray.get([
            a.join_phase1.remote(qdict, self.ndocs, self.sum_dl, df,
                                 self.manifest["analyzer"], fdf=fdf,
                                 field_sum_dl=self.field_sum_dl,
                                 runtime_mappings=runtime_mappings)
            for a in self.actors
        ])
        return (nodes, reduce_join_phase1(nodes, partials),
                reduce_inner_hits(nodes, partials))

    def search_query(self, qdict: dict, k: int = 10, from_: int = 0,
                     runtime_mappings: dict | None = None,
                     docvalue_fields: list[str] | None = None,
                     source=None, script_fields: dict | None = None,
                     min_score: float | None = None,
                     routing: str | None = None):
        """Structured DSL search, scatter-gathered over the actor pool.
        ``runtime_mappings`` travel as plain JSON — each actor builds
        (and caches) the request-local derived index for its segments."""
        w = _window(k, from_)
        terms, fpairs = self._collect_stats_spec(qdict)
        df = self._stats(terms) if terms else {}
        fdf = self._field_stats(fpairs)
        jnodes, jm, ih = self._join_maps(qdict, df, fdf, runtime_mappings)
        refs = [
            a.query_top_k.remote(qdict, w, self.ndocs, self.sum_dl, df,
                                 self.manifest["analyzer"],
                                 fdf=fdf, field_sum_dl=self.field_sum_dl,
                                 runtime_mappings=runtime_mappings,
                                 join_maps=jm, min_score=min_score,
                                 only_part=self._route_part(routing))
            for a in self.actors
        ]
        per_seg = [s for actor_out in self._ray.get(refs) for s in actor_out]
        hits = merge_top_k(per_seg, w)[from_:]
        if ih:
            from raydex.search.joinquery import attach_inner_hits

            def parent_ids_of(pairs):
                # every actor owns a disjoint ordinal slice: broadcast
                # the pairs, merge the partial answers
                got = {}
                for part in self._ray.get(
                    [a.join_parent_ids.remote(pairs) for a in self.actors]
                ):
                    got.update(part)
                return [got.get(tuple(p)) for p in pairs]

            attach_inner_hits(hits, jnodes, ih, self.seg_dirs, parent_ids_of)
        from raydex.search.query import collect_named_queries

        named = collect_named_queries(qdict)
        # launch both fetch sub-phases before gathering either — they
        # are independent, so the scatter round-trips overlap
        mq_refs = dv_refs = src_refs = None
        src_spec = None
        if hits and (source is not None or script_fields):
            from raydex.search.fetchphase import normalize_source_spec

            src_spec = normalize_source_spec(source)
        if hits and (named or docvalue_fields or src_spec is not None
                     or script_fields):
            pairs = [(h["ordinal"], h["docid"]) for h in hits]
            if named:
                mq_refs = [
                    a.matched_queries.remote(
                        pairs, named, self.ndocs, self.sum_dl, df,
                        self.manifest["analyzer"], fdf=fdf,
                        field_sum_dl=self.field_sum_dl,
                        runtime_mappings=runtime_mappings)
                    for a in self.actors
                ]
            if docvalue_fields:
                dv_refs = [
                    a.docvalue_fields.remote(pairs, docvalue_fields)
                    for a in self.actors
                ]
            if src_spec is not None or script_fields:
                src_refs = [
                    a.fetch_source.remote(
                        pairs, *(src_spec or ([], [])),
                        script_fields=script_fields)
                    for a in self.actors
                ]
        if mq_refs is not None:
            mq: dict = {}
            for part in self._ray.get(mq_refs):
                mq.update(part)
            for h in hits:
                h["matched_queries"] = mq.get((h["ordinal"], h["docid"]), [])
        if dv_refs is not None:
            dv: dict = {}
            for part in self._ray.get(dv_refs):
                dv.update(part)
            for h in hits:
                h["fields"] = dv.get((h["ordinal"], h["docid"]), {})
        if src_refs is not None:
            src: dict = {}
            for part in self._ray.get(src_refs):
                src.update(part)
            for h in hits:
                doc, scripts = src.get((h["ordinal"], h["docid"]),
                                       ({}, {}))
                if src_spec is not None:
                    h["_source"] = doc
                if script_fields:
                    h.setdefault("fields", {}).update(scripts)
        return hits

    def profile_search(self, qdict: dict, k: int = 10,
                       runtime_mappings: dict | None = None) -> dict:
        """Distributed `"profile": true`: per-segment rows from every
        actor (each times its own slice) + the coordinator took."""
        import time as _time

        w = _window(k, 0)
        terms, fpairs = self._collect_stats_spec(qdict)
        df = self._stats(terms) if terms else {}
        fdf = self._field_stats(fpairs)
        _, jm, _ = self._join_maps(qdict, df, fdf, runtime_mappings)
        t0 = _time.perf_counter_ns()
        refs = [
            a.profile_query.remote(qdict, w, self.ndocs, self.sum_dl, df,
                                   self.manifest["analyzer"], fdf=fdf,
                                   field_sum_dl=self.field_sum_dl,
                                   runtime_mappings=runtime_mappings,
                                   join_maps=jm)
            for a in self.actors
        ]
        per_seg, prof = [], []
        skipped = 0
        for seg_out, p, meta in self._ray.get(refs):
            per_seg += seg_out
            prof += p
            skipped += meta["can_match_skipped"]
        hits = merge_top_k(per_seg, w)
        took = _time.perf_counter_ns() - t0
        return {
            "hits": hits,
            "profile": {"segments": prof, "can_match_skipped": skipped,
                        "took_nanos": int(took)},
        }

    def search_sorted(self, qdict: dict, sort_field: str = "dl",
                      order: str = "asc", k: int = 10,
                      search_after: tuple | None = None):
        """Distributed field sort: each actor runs the sequential
        bottom-fed early-terminated pass over ITS segment slice (the
        per-node BottomSortValuesCollector analogue — full parallelism
        across actors, skipping within each), coordinator merges by
        (value, ordinal, docid). ``search_after`` pages past the cursor
        on every actor."""
        terms, fpairs = self._collect_stats_spec(qdict)
        df = self._stats(terms) if terms else {}
        fdf = self._field_stats(fpairs)
        _, jm, _ = self._join_maps(qdict, df, fdf)
        refs = [
            a.sorted_top_k.remote(qdict, sort_field, order, k, self.ndocs,
                                  self.sum_dl, df, self.manifest["analyzer"],
                                  fdf=fdf, field_sum_dl=self.field_sum_dl,
                                  search_after=search_after, join_maps=jm)
            for a in self.actors
        ]
        allhits = [h for actor_out in self._ray.get(refs) for h in actor_out]
        allhits.sort(key=lambda h: (h["ordinal"], h["docid"]))
        allhits.sort(key=lambda h: h["sort_value"], reverse=(order == "desc"))
        return allhits[:k]

    def count(self, qdict: dict) -> int:
        terms, fpairs = self._collect_stats_spec(qdict)
        df = self._stats(terms) if terms else {}
        fdf = self._field_stats(fpairs)
        _, jm, _ = self._join_maps(qdict, df, fdf)
        refs = [
            a.query_count.remote(qdict, self.ndocs, self.sum_dl, df,
                                 self.manifest["analyzer"],
                                 fdf=fdf, field_sum_dl=self.field_sum_dl,
                                 join_maps=jm)
            for a in self.actors
        ]
        return sum(self._ray.get(refs))

    def search_aggs(self, qdict: dict, aggs: dict, k: int = 0,
                    runtime_mappings: dict | None = None) -> dict:
        """Distributed `_search` aggregations: every actor collects one
        merged partial tree over its segment slice (bucket keys +
        scalars — metadata-sized), coordinator reduces + renders."""
        from raydex.search.aggsphase import (
            fix_significant_bg,
            reduce_partials,
            render_aggs,
        )

        one_pass_hits = k > 0 and not _needs_fetch_phases(qdict)
        sq = self._aggs_stats_qdict(qdict, aggs)
        terms, fpairs = self._collect_stats_spec(sq)
        df = self._stats(terms) if terms else {}
        fdf = self._field_stats(fpairs)
        _, jm, _ = self._join_maps(qdict, df, fdf, runtime_mappings)
        refs = [
            a.query_aggs.remote(qdict, aggs, self.ndocs, self.sum_dl, df,
                                self.manifest["analyzer"], fdf=fdf,
                                field_sum_dl=self.field_sum_dl,
                                runtime_mappings=runtime_mappings,
                                join_maps=jm,
                                k=k if one_pass_hits else 0)
            for a in self.actors
        ]
        got = self._ray.get(refs)
        if one_pass_hits:  # hits ride the same per-actor pass
            merged = reduce_partials([g[0] for g in got])
            per_seg = [seg for g in got for seg in g[1]]
        else:
            merged = reduce_partials(got)
            per_seg = []
        fix_significant_bg(aggs, merged, self._stats, self._field_stats)
        out = {"hits": [], "aggregations": render_aggs(aggs, merged)}
        if one_pass_hits:
            out["hits"] = merge_top_k(per_seg, k)
        elif k > 0:
            out["hits"] = self.search_query(
                qdict, k=k, runtime_mappings=runtime_mappings)
        return out

    def terms_agg(self, field: str, size: int = 10,
                  shard_size: int | None = None):
        """Distributed approximate terms agg: each actor ships its
        segments' top shard_size (term, df) lists — bytes proportional
        to shard_size x segments, never to the corpus."""
        from raydex.search.distributed_terms import (
            default_shard_size,
            merge_terms_partials,
        )

        ss = shard_size or default_shard_size(size)
        per_actor = self._ray.get(
            [a.terms_partials.remote(field, ss) for a in self.actors]
        )
        return merge_terms_partials(
            [p for actor_out in per_actor for p in actor_out], size
        )

    def knn_search(self, field: str, query_vector, k: int = 10,
                   num_candidates: int = 100, filter: dict | None = None,
                   nprobe: int | None = None):
        """Distributed knn: each actor runs the per-segment candidate
        phase over its slice (vectors pinned in the actor), coordinator
        merges num_candidates-lists to the global k."""
        if filter is not None:
            terms, fpairs = self._collect_stats_spec(filter)
            df = self._stats(terms) if terms else {}
            fdf = self._field_stats(fpairs)
        else:
            df, fdf = {}, {}
        qv = list(map(float, query_vector))
        refs = [
            a.knn_top_k.remote(field, qv, max(num_candidates, k), filter,
                               self.ndocs, self.sum_dl, df,
                               self.manifest["analyzer"], fdf=fdf,
                               field_sum_dl=self.field_sum_dl,
                               nprobe=nprobe)
            for a in self.actors
        ]
        per_seg = [s for actor_out in self._ray.get(refs) for s in actor_out]
        return merge_top_k(per_seg, k)

    def hybrid_search(self, qdict: dict, knn: dict, k: int = 10):
        """Query + knn combined (see SearcherBase._combine_hybrid)."""
        qhits = self.search_query(qdict, k=k)
        khits = self.knn_search(
            knn["field"], knn["query_vector"], k=int(knn.get("k", k)),
            num_candidates=int(knn.get("num_candidates", 100)),
            filter=knn.get("filter"),
        )
        return self._combine_hybrid(
            qhits, khits, k, knn_boost=float(knn.get("boost", 1.0))
        )

    def search_batch(self, queries: list[tuple[str, int]], method: str = "auto"):
        """Batched QPS path: ONE RPC per actor carries the whole query
        batch (per-query scatter fan-out would serialize on the driver);
        df lookups batched once for all unique terms."""
        analyzed = [self.analyze(q) for q, _ in queries]
        uniq_terms = sorted({t for ts in analyzed for t in ts})
        gdf = self._stats(uniq_terms) if uniq_terms else {}
        work = [
            (terms, k) for terms, (_, k) in zip(analyzed, queries) if terms
        ]
        refs = [
            a.top_k_many.remote(work, self.ndocs, self.sum_dl, gdf, method)
            for a in self.actors
        ]
        per_actor = self._ray.get(refs)  # [actor][query][seg]
        out = []
        wi = 0
        for terms, (_, k) in zip(analyzed, queries):
            if not terms:
                out.append([])
                continue
            per_seg = [s for actor_out in per_actor for s in actor_out[wi]]
            out.append(merge_top_k(per_seg, k))
            wi += 1
        return out
