"""raydex CLI — build / merge / search / count / suggest over an index.

    python -m raydex build  --input pages.parquet --index /tmp/idx \
        [--partitions 32] [--analyzer standard_en] [--source text|html|verify]
        [--positions] [--resume]
    python -m raydex merge  --index /tmp/idx
    python -m raydex search --index /tmp/idx --query "web search" [--k 10]
        [--operator or|and] [--dsl '{"bool": {...}}']
    python -m raydex count  --index /tmp/idx --dsl '{"term": {"text": "web"}}'
    python -m raydex stats  --index /tmp/idx

Owns its Ray session (scripts only — library code never calls ray.init).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _ray():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", 32)),
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
        from ray.data import DataContext

        DataContext.get_current().enable_progress_bars = False
    return ray


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="raydex")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build")
    b.add_argument("--input", required=True)
    b.add_argument("--index", required=True)
    b.add_argument("--partitions", type=int, default=32)
    b.add_argument("--analyzer", default="standard_en")
    b.add_argument("--source", default="text", choices=["text", "html", "verify"])
    b.add_argument("--positions", action="store_true")
    b.add_argument("--resume", action="store_true")
    b.add_argument("--max-docs-per-segment", type=int, default=50_000)
    b.add_argument("--index-sort", default=None,
                   help="field:order (e.g. warc_ts:desc) — store docs in "
                        "sort order per segment (IndexSortConfig)")
    b.add_argument("--mappings", default=None,
                   help="JSON list of field mappings (FieldSpec dicts: "
                        'e.g. [{"name": "labels", "source": "labels", '
                        '"analyzer": "flattened"}]) — the PUT-mapping '
                        "analogue at build time")

    m = sub.add_parser("merge")
    m.add_argument("--index", required=True)
    m.add_argument("--generation", type=int, default=1)

    s = sub.add_parser("search")
    s.add_argument("--index", required=True)
    s.add_argument("--query", default=None)
    s.add_argument("--dsl", default=None)
    s.add_argument("--k", type=int, default=10)
    s.add_argument("--from", dest="from_", type=int, default=0,
                   help="paging offset (from+k capped at max_result_window)")
    s.add_argument("--operator", default="or", choices=["or", "and"])
    s.add_argument("--actors", type=int, default=0, help="0 = local in-process")
    s.add_argument("--sort", default=None,
                   help="field:order (e.g. dl:asc) — field-sorted hits "
                        "with index-sort early termination; needs --dsl")
    s.add_argument("--track-total-hits", dest="track_total_hits",
                   default=None,
                   help='"true" for the exact total, or an int cap '
                        '(relation "gte" beyond it); adds a total line '
                        "after the hits (needs --dsl)")
    s.add_argument("--profile", action="store_true",
                   help='the `"profile": true` search option: emit a '
                        "per-segment timing/matched breakdown after the hits")
    s.add_argument("--min-score", type=float, default=None,
                   help="drop hits scoring below this absolute threshold")
    s.add_argument("--docvalue-fields", default=None,
                   help="comma-separated stored doc-values columns to "
                        "return per hit (the docvalue_fields fetch phase)")
    s.add_argument("--source", dest="source_filter", default=None,
                   help="per-hit _source projection: 'true', a comma "
                        "list of include patterns, or a JSON "
                        "{includes, excludes} body (FetchSourcePhase)")
    s.add_argument("--script-fields", default=None,
                   help="JSON script_fields body (registered scripts)")
    s.add_argument("--routing", default=None,
                   help="routing key: search ONLY the partition this key "
                        "routes to (the ?routing= shard-targeting param)")
    s.add_argument("--pit", default=None,
                   help="point-in-time id (from `pit --action open`): "
                        "search the pinned segment set, renewing its "
                        "keep_alive lease")
    s.add_argument("--aggs", default=None,
                   help="JSON aggregations body (the `_search` aggs "
                        "section: terms/stats/histogram/date_histogram/"
                        "range/filter/global/cardinality...); prints an "
                        "aggregations line after the hits")

    c = sub.add_parser("count")
    c.add_argument("--index", required=True)
    c.add_argument("--dsl", required=True)
    c.add_argument("--pit", default=None, help="point-in-time id")

    st = sub.add_parser("stats")
    st.add_argument("--index", required=True)

    du = sub.add_parser("disk-usage")
    du.add_argument("--index", required=True)

    g = sub.add_parser("get")
    g.add_argument("--index", required=True)
    g.add_argument("--id", required=True, nargs="+",
                   help="one or more document ids (urls)")

    dw = sub.add_parser("doc", help="single-document writes: index / "
                        "update / delete (refresh-gated visibility)")
    dw.add_argument("action", choices=["index", "create", "update",
                                       "delete"])
    dw.add_argument("--index", required=True)
    dw.add_argument("--id", help="document id (url); for index/create "
                    "it may instead live in the --doc body")
    dw.add_argument("--doc", help="JSON source body (full doc for "
                    "index/create, partial for update)")
    dw.add_argument("--doc-as-upsert", action="store_true")
    dw.add_argument("--routing", default=None,
                    help="routing key (required for join-field child "
                         "docs: the parent id)")
    dw.add_argument("--no-refresh", action="store_true",
                    help="buffer only (caller refreshes later)")

    bk = sub.add_parser("bulk", help="_bulk NDJSON action-line format "
                        "over an existing index (incremental writes)")
    bk.add_argument("--index", required=True)
    bk.add_argument("--body", required=True,
                    help="path to the NDJSON bulk body")
    bk.add_argument("--no-refresh", action="store_true")

    an = sub.add_parser("analyze")
    an.add_argument("--text", required=True)
    an.add_argument("--analyzer", default="standard_en")

    sn = sub.add_parser("snapshot")
    sn.add_argument("--index", required=True)
    sn.add_argument("--repo", required=True)
    sn.add_argument("--name", required=True)

    rs = sub.add_parser("restore")
    rs.add_argument("--repo", required=True)
    rs.add_argument("--name", required=True)
    rs.add_argument("--dest", required=True)

    sl = sub.add_parser("snapshots")
    sl.add_argument("--repo", required=True)

    dq = sub.add_parser("delete-by-query")
    dq.add_argument("--index", required=True)
    dq.add_argument("--dsl", required=True)
    dq.add_argument("--local", action="store_true",
                    help="run segment deletes in-process (no Ray tasks)")

    xd = sub.add_parser("expunge-deletes")
    xd.add_argument("--index", required=True)
    xd.add_argument("--local", action="store_true")

    for name in ("clone", "shrink", "split"):
        rp = sub.add_parser(name)
        rp.add_argument("--index", required=True)
        rp.add_argument("--dest", required=True)
        if name != "clone":
            rp.add_argument("--partitions", type=int, required=True)

    al = sub.add_parser("aliases")
    al.add_argument("--root", required=True,
                    help="alias registry root directory")
    al.add_argument("--actions", default=None,
                    help='JSON action list, e.g. [{"add": {"alias": "logs", '
                         '"index": "/idx", "is_write_index": true}}]')

    ro = sub.add_parser("rollover")
    ro.add_argument("--root", required=True)
    ro.add_argument("--alias", required=True)
    ro.add_argument("--conditions", required=True,
                    help='JSON, e.g. {"max_docs": 1000000}')
    ro.add_argument("--dry-run", action="store_true")

    kn = sub.add_parser("knn")
    kn.add_argument("--index", required=True)
    kn.add_argument("--field", required=True)
    kn.add_argument("--vector", required=True, help="JSON float list")
    kn.add_argument("--k", type=int, default=10)
    kn.add_argument("--num-candidates", type=int, default=100)
    kn.add_argument("--filter", default=None, help="query DSL JSON")
    kn.add_argument("--actors", type=int, default=0)

    dst = sub.add_parser("datastream")
    dst.add_argument("--root", required=True,
                     help="data stream registry root directory")
    dst.add_argument("--action", required=True,
                     choices=["create", "rollover", "get", "delete",
                              "write-dir", "search"])
    dst.add_argument("--stream", required=True)
    dst.add_argument("--query", default=None,
                     help="query DSL JSON (action=search)")
    dst.add_argument("--k", type=int, default=10)

    il = sub.add_parser("ilm-step")
    il.add_argument("--root", required=True, help="alias registry root")
    il.add_argument("--alias", required=True)
    il.add_argument("--policy", required=True, help="policy JSON")

    sm = sub.add_parser("slm-run")
    sm.add_argument("--policy", required=True,
                    help='JSON: {"name", "repository", "config": '
                         '{"index_dir"}, "retention": {...}}')

    gx = sub.add_parser("graph")
    gx.add_argument("--index", required=True)
    gx.add_argument("--dsl", required=True, help="seed query DSL JSON")
    gx.add_argument("--field", required=True)
    gx.add_argument("--size", type=int, default=5)
    gx.add_argument("--hops", type=int, default=2)

    sg = sub.add_parser("suggest")
    sg.add_argument("--index", required=True)
    sg.add_argument("--text", required=True)
    sg.add_argument("--mode", default="term",
                    choices=["term", "phrase", "completion"])
    sg.add_argument("--size", type=int, default=5)
    sg.add_argument("--field", default=None,
                    help="dedicated completion field name (mode=completion)")
    sg.add_argument("--contexts", default=None,
                    help='JSON category contexts filter/boost, e.g. '
                         '\'{"place": [{"context": "paris", "boost": 2}]}\'')
    sg.add_argument("--suggest-mode", dest="suggest_mode",
                    default="missing",
                    choices=["missing", "popular", "always"],
                    help="term-suggester mode (TermSuggestionBuilder)")
    sg.add_argument("--fuzzy", default=None,
                    help='JSON fuzzy options (or "true"), e.g. '
                         '\'{"fuzziness": "AUTO", "prefix_length": 1}\'')

    pt = sub.add_parser("pit", help="point-in-time readers: open pins "
                        "the current segment set (hardlinked view), "
                        "search the returned id via --pit")
    pt.add_argument("--action", required=True,
                    choices=["open", "close", "expire"])
    pt.add_argument("--index", default=None,
                    help="index dir (open / expire)")
    pt.add_argument("--id", default=None, help="pit id (close)")
    pt.add_argument("--keep-alive", type=float, default=300.0)

    ms = sub.add_parser("msearch", help="multi-search: one JSON body "
                        "per --item, per-item error isolation")
    ms.add_argument("--index", required=True)
    ms.add_argument("--item", action="append", required=True,
                    help="search body JSON (repeatable)")

    gs = sub.add_parser("get-source", help="GET _source/<id> with "
                        "include/exclude projection")
    gs.add_argument("--index", required=True)
    gs.add_argument("--id", required=True)
    gs.add_argument("--source", default=None,
                    help="comma includes or JSON {includes, excludes}")

    sh = sub.add_parser("search-shards")
    sh.add_argument("--index", required=True)

    sg2 = sub.add_parser("segments", help="per-partition segment rows "
                         "(docs, deletes, bytes)")
    sg2.add_argument("--index", required=True)

    ist = sub.add_parser("index-stats", help="_stats: docs/store/segments")
    ist.add_argument("--index", required=True)

    mp = sub.add_parser("mapping", help="get / get-field / put (additive)")
    mp.add_argument("--index", required=True)
    mp.add_argument("--action", default="get",
                    choices=["get", "field", "put"])
    mp.add_argument("--fields", default=None, help="comma globs (field)")
    mp.add_argument("--properties", default=None, help="JSON (put)")

    en = sub.add_parser("enrich", help="enrich policy lifecycle")
    en.add_argument("--root", required=True)
    en.add_argument("--action", required=True,
                    choices=["put", "get", "delete", "execute"])
    en.add_argument("--name", default=None)
    en.add_argument("--policy", default=None, help="policy JSON (put)")

    rv = sub.add_parser("resolve", help="_resolve/index over dirs, "
                        "aliases, data streams")
    rv.add_argument("--expression", required=True)
    rv.add_argument("--alias-root", default=None)
    rv.add_argument("--ds-root", default=None)

    rls = sub.add_parser("rollup-search", help="aggregate FROM a rolled-up "
                         "parquet table (stored-moment recombination)")
    rls.add_argument("--table", required=True, help="rollup parquet path")
    rls.add_argument("--body", required=True, help="aggregations JSON")

    a = p.parse_args(argv)

    if a.cmd == "build":
        _ray()
        from raydex.index.build import build_index

        isort = None
        if a.index_sort:
            f, _, o = a.index_sort.partition(":")
            isort = (f, o or "asc")
        fields = None
        if a.mappings:
            from raydex.index.segment import FieldSpec

            fields = [FieldSpec.from_json(d)
                      for d in json.loads(a.mappings)]
        man = build_index(
            a.input, a.index, num_partitions=a.partitions, analyzer=a.analyzer,
            source=a.source, resume=a.resume, store_positions=a.positions,
            max_docs_per_segment=a.max_docs_per_segment, index_sort=isort,
            fields=fields,
        )
        print(json.dumps({k: man[k] for k in
                          ("doc_count", "sum_dl", "num_partitions", "build_sec",
                           "docs_per_sec", "resumed_partitions")}))
    elif a.cmd == "merge":
        _ray()
        from raydex.index.merge import merge_index

        merged = merge_index(a.index, generation=a.generation)
        print(json.dumps({str(k): v for k, v in merged.items()}))
    elif a.cmd == "search":
        from raydex.search.scatter import LocalSearcher, RaySearcher

        if a.pit:
            from raydex.search.pit import pit_dir

            a.index = pit_dir(a.pit, keep_alive_s=300.0)
        if a.actors > 0:
            _ray()
            searcher = RaySearcher(a.index, num_actors=a.actors)
        else:
            searcher = LocalSearcher(a.index)
        dv_fields = ([f.strip() for f in a.docvalue_fields.split(",")
                      if f.strip()] if a.docvalue_fields else None)
        if a.track_total_hits is not None and not a.dsl:
            p.error("--track-total-hits needs --dsl")
        if a.aggs:
            if (a.sort or a.profile or a.min_score is not None or dv_fields
                    or a.routing):
                p.error("--aggs combines only with --dsl/--query/--k")
            out = searcher.search_aggs(
                json.loads(a.dsl) if a.dsl else (
                    {"match": {"text": a.query}} if a.query
                    else {"match_all": {}}),
                json.loads(a.aggs), k=a.k,
            )
            for h in out["hits"]:
                print(json.dumps(h))
            print(json.dumps({"aggregations": out["aggregations"]},
                             default=str))
            return 0
        if a.sort:
            if a.min_score is not None or dv_fields or a.routing:
                p.error("--min-score/--docvalue-fields/--routing are not "
                        "supported with --sort")
            field, _, order = a.sort.partition(":")
            hits = searcher.search_sorted(
                json.loads(a.dsl) if a.dsl else {"match_all": {}},
                sort_field=field, order=order or "asc", k=a.k,
            )
        elif a.dsl and a.profile:
            if a.min_score is not None or dv_fields or a.routing:
                p.error("--min-score/--docvalue-fields/--routing are not "
                        "supported with --profile")
            out = searcher.profile_search(json.loads(a.dsl), k=a.k)
            for h in out["hits"]:
                print(json.dumps(h))
            print(json.dumps({"profile": out["profile"]}))
            hits = []
        src = None
        if getattr(a, "source_filter", None):
            raw = a.source_filter
            if raw.strip().startswith("{"):
                src = json.loads(raw)
            elif raw.lower() in ("true", "false"):
                src = raw.lower() == "true"
            else:
                src = [p.strip() for p in raw.split(",") if p.strip()]
        sfields = json.loads(a.script_fields) if getattr(
            a, "script_fields", None) else None
        if a.dsl:
            tth = None
            if a.track_total_hits is not None:
                tth = (True if a.track_total_hits.lower() == "true"
                       else int(a.track_total_hits))
            res = searcher.search_query(
                json.loads(a.dsl), k=a.k, from_=a.from_,
                min_score=a.min_score, docvalue_fields=dv_fields,
                routing=a.routing, source=src, script_fields=sfields,
                track_total_hits=tth,
            )
            if isinstance(res, dict):
                hits = res["hits"]
                for h in hits:
                    print(json.dumps(h, default=str))
                print(json.dumps({"total": res["total"]}))
                return 0
            hits = res
        elif a.min_score is not None or dv_fields or src is not None or sfields:
            # plain-text path with fetch/threshold options: route
            # through the DSL entry so the flags are honored
            hits = searcher.search_query(
                {"match": {"text": {"query": a.query or "",
                                    "operator": a.operator}}},
                k=a.k, from_=a.from_,
                min_score=a.min_score, docvalue_fields=dv_fields,
                routing=a.routing, source=src, script_fields=sfields,
            )
        else:
            hits = searcher.search(a.query or "", k=a.k, operator=a.operator,
                                   from_=a.from_, routing=a.routing)
        for h in hits:
            print(json.dumps(h))
    elif a.cmd == "count":
        from raydex.search.scatter import LocalSearcher

        if a.pit:
            from raydex.search.pit import pit_dir

            a.index = pit_dir(a.pit, keep_alive_s=300.0)
        print(LocalSearcher(a.index).count(json.loads(a.dsl)))
    elif a.cmd == "stats":
        from raydex.index.build import load_index_manifest
        from raydex.search.scatter import resolve_index_dirs

        for d in resolve_index_dirs(a.index):
            man = load_index_manifest(d)
            print(json.dumps({"index": d}
                             | {k: v for k, v in man.items() if k != "segments"}
                             | {"segments": len(man["segments"])}, indent=1))
    elif a.cmd == "disk-usage":
        from raydex.index.deletes import index_delete_stats
        from raydex.index.fieldcaps import disk_usage

        print(json.dumps(disk_usage(a.index) | index_delete_stats(a.index)))
    elif a.cmd == "get":
        from raydex.search.get import mget

        for row in mget(a.index, a.id):
            print(json.dumps(row if row is None or "text" not in row
                             else {**row, "text": row["text"][:200]},
                             default=str))
    elif a.cmd == "doc":
        from raydex.index import docwrite

        body = json.loads(a.doc) if a.doc else {}
        if a.id:
            body.setdefault("url", a.id)
        if a.action in ("update", "delete") and "url" not in body:
            p.error(f"doc {a.action} requires --id (or a 'url' key in "
                    "--doc)")
        refresh = not a.no_refresh
        if a.action in ("index", "create"):
            r = docwrite.index_doc(a.index, body,
                                   create=(a.action == "create"),
                                   refresh=refresh)
        elif a.action == "update":
            r = docwrite.update_doc(a.index, body.pop("url"), doc=body,
                                    doc_as_upsert=a.doc_as_upsert,
                                    refresh=refresh, routing=a.routing)
        else:
            r = docwrite.delete_doc(a.index, body.pop("url"),
                                    refresh=refresh, routing=a.routing)
        print(json.dumps(r, default=str))
    elif a.cmd == "bulk":
        from raydex.index.docwrite import bulk_apply

        print(json.dumps(bulk_apply(a.index, a.body,
                                    refresh=not a.no_refresh),
                         default=str))
    elif a.cmd == "analyze":
        # the `_analyze` API analogue (es/action/admin/indices/analyze)
        from raydex.analysis.tokenizer import get_analyzer

        print(json.dumps({"tokens": get_analyzer(a.analyzer)(a.text)}))
    elif a.cmd == "snapshot":
        from raydex.index.snapshot import create_snapshot

        meta = create_snapshot(a.index, a.repo, a.name)
        print(json.dumps({k: meta[k] for k in
                          ("name", "stored_blobs", "reused_blobs")}))
    elif a.cmd == "restore":
        from raydex.index.snapshot import restore_snapshot

        meta = restore_snapshot(a.repo, a.name, a.dest)
        print(json.dumps({"name": meta["name"], "files": len(meta["files"])}))
    elif a.cmd == "snapshots":
        from raydex.index.snapshot import list_snapshots

        print(json.dumps(list_snapshots(a.repo)))
    elif a.cmd == "delete-by-query":
        from raydex.index.deletes import delete_by_query

        if not a.local:
            _ray()
        print(json.dumps(delete_by_query(a.index, json.loads(a.dsl),
                                         use_ray=not a.local)))
    elif a.cmd == "expunge-deletes":
        from raydex.index.compact import expunge_deletes

        if not a.local:
            _ray()
        print(json.dumps(expunge_deletes(a.index, use_ray=not a.local)))
    elif a.cmd in ("clone", "shrink", "split"):
        from raydex.index import reshape

        if a.cmd == "clone":
            man = reshape.clone_index(a.index, a.dest)
        elif a.cmd == "shrink":
            man = reshape.shrink_index(a.index, a.dest, a.partitions)
        else:
            man = reshape.split_index(a.index, a.dest, a.partitions)
        print(json.dumps({"index_dir": man["index_dir"],
                          "num_partitions": man["num_partitions"],
                          "doc_count": man["doc_count"],
                          "segments": len(man["segments"])}))
    elif a.cmd == "aliases":
        from raydex.index.aliases import AliasRegistry

        reg = AliasRegistry(a.root)
        if a.actions:
            print(json.dumps(reg.update_aliases(json.loads(a.actions))))
        else:
            print(json.dumps(reg.aliases()))
    elif a.cmd == "rollover":
        from raydex.index.aliases import AliasRegistry

        print(json.dumps(AliasRegistry(a.root).rollover(
            a.alias, json.loads(a.conditions), dry_run=a.dry_run)))
    elif a.cmd == "datastream":
        from raydex.index.datastream import DataStreamRegistry

        reg = DataStreamRegistry(a.root)
        if a.action == "create":
            print(json.dumps(reg.create(a.stream)))
        elif a.action == "rollover":
            print(json.dumps(reg.rollover(a.stream)))
        elif a.action == "get":
            print(json.dumps(reg.get(a.stream)))
        elif a.action == "delete":
            reg.delete(a.stream)
            print(json.dumps({"deleted": a.stream}))
        elif a.action == "write-dir":
            print(reg.write_dir(a.stream))
        else:  # search
            hits = reg.searcher(a.stream).search_query(
                json.loads(a.query) if a.query else {"match_all": {}},
                k=a.k)
            for h in hits:
                print(json.dumps(h))
    elif a.cmd == "ilm-step":
        from raydex.index.aliases import AliasRegistry
        from raydex.index.ilm import step

        print(json.dumps(step(AliasRegistry(a.root), a.alias,
                              json.loads(a.policy))))
    elif a.cmd == "slm-run":
        from raydex.index.snapshot import slm_run

        print(json.dumps(slm_run(json.loads(a.policy))))
    elif a.cmd == "graph":
        from raydex.search.graph import graph_explore
        from raydex.search.scatter import LocalSearcher

        print(json.dumps(graph_explore(
            LocalSearcher(a.index), json.loads(a.dsl), a.field,
            size=a.size, hops=a.hops)))
    elif a.cmd == "knn":
        from raydex.search.scatter import LocalSearcher, RaySearcher

        if a.actors > 0:
            _ray()
            searcher = RaySearcher(a.index, num_actors=a.actors)
        else:
            searcher = LocalSearcher(a.index)
        hits = searcher.knn_search(
            a.field, json.loads(a.vector), k=a.k,
            num_candidates=a.num_candidates,
            filter=json.loads(a.filter) if a.filter else None,
        )
        for h in hits:
            print(json.dumps(h))
    elif a.cmd == "msearch":
        from raydex.search.misc_api import msearch
        from raydex.search.scatter import LocalSearcher

        res = msearch(LocalSearcher(a.index),
                      [json.loads(it) for it in a.item])
        for r in res:
            print(json.dumps(r))
    elif a.cmd == "get-source":
        from raydex.search.misc_api import get_source

        src = None
        if a.source:
            src = (json.loads(a.source) if a.source.lstrip().startswith("{")
                   else [f.strip() for f in a.source.split(",")])
        doc = get_source(a.index, a.id, source=src)
        print(json.dumps(doc if doc is not None else {"found": False}))
    elif a.cmd == "search-shards":
        from raydex.search.misc_api import search_shards

        print(json.dumps(search_shards(a.index)))
    elif a.cmd == "segments":
        from raydex.index.stats_api import index_segments

        print(json.dumps(index_segments(a.index)))
    elif a.cmd == "index-stats":
        from raydex.index.stats_api import index_stats

        print(json.dumps(index_stats(a.index)))
    elif a.cmd == "mapping":
        from raydex.index.stats_api import (
            get_field_mapping,
            get_mapping,
            put_mapping,
        )

        if a.action == "get":
            print(json.dumps(get_mapping(a.index)))
        elif a.action == "field":
            fields = [f.strip() for f in (a.fields or "*").split(",")]
            print(json.dumps(get_field_mapping(a.index, fields)))
        else:
            print(json.dumps(put_mapping(a.index,
                                         json.loads(a.properties))))
    elif a.cmd == "enrich":
        from raydex.ops.enrich import EnrichRegistry

        reg = EnrichRegistry(a.root)
        if a.action == "put":
            print(json.dumps(reg.put_policy(a.name, json.loads(a.policy))))
        elif a.action == "get":
            print(json.dumps(reg.get_policy(a.name)))
        elif a.action == "delete":
            print(json.dumps(reg.delete_policy(a.name)))
        else:
            print(json.dumps(reg.execute_policy(a.name)))
    elif a.cmd == "resolve":
        from raydex.index.aliases import resolve_index

        print(json.dumps(resolve_index(a.expression,
                                       alias_root=a.alias_root,
                                       ds_root=a.ds_root)))
    elif a.cmd == "rollup-search":
        import pyarrow.parquet as _pq

        from raydex.ops.rollup import rollup_search

        print(json.dumps(rollup_search(_pq.read_table(a.table),
                                       json.loads(a.body))))
    elif a.cmd == "pit":
        from raydex.search.pit import close_pit, expire_pits, open_pit

        if a.action == "open":
            pid = open_pit(a.index, keep_alive_s=a.keep_alive)
            print(json.dumps({"id": pid}))
        elif a.action == "close":
            print(json.dumps({"succeeded": close_pit(a.id)}))
        else:
            print(json.dumps({"expired": expire_pits(a.index)}))
    elif a.cmd == "suggest":
        from raydex.index.build import segment_dirs
        from raydex.index.segment import SegmentReader
        from raydex.search.suggest import (
            completion_suggest,
            phrase_suggest_lm,
            term_suggest,
        )

        if a.mode == "completion" and a.field:
            from raydex.search.suggest import (
                completion_field_suggest,
                merge_completion_options,
            )

            ctx = json.loads(a.contexts) if a.contexts else None
            fz = (json.loads(a.fuzzy) if a.fuzzy and a.fuzzy != "true"
                  else (True if a.fuzzy else None))
            per_seg = [
                completion_field_suggest(SegmentReader(sd), a.field, a.text,
                                         size=a.size, contexts=ctx,
                                         fuzzy=fz)
                for sd in segment_dirs(a.index)
            ]
            print(json.dumps(merge_completion_options(per_seg, size=a.size)))
        else:
            r = SegmentReader(segment_dirs(a.index)[0])
            if a.mode == "term":
                print(json.dumps(term_suggest(
                    r, a.text, size=a.size,
                    suggest_mode=a.suggest_mode)))
            elif a.mode == "phrase":
                print(json.dumps(phrase_suggest_lm(r, a.text, size=a.size)))
            else:
                print(json.dumps(completion_suggest(r, a.text, size=a.size)))
    import ray

    if ray.is_initialized():
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
