"""Small search-side API surfaces rounding out the reference's REST
inventory: `_msearch` (named multi-search with per-item error
isolation), `_msearch/template`, `GET _source` / `HEAD _source`,
`_search_shards`, and `_scripts/painless/_execute`.

Reference shapes: TransportMultiSearchAction (msearch responses array
with per-item error objects), RestGetSourceAction (source filtering
applied, 404 when the document or `_source` is absent),
TransportSearchShardsAction (per-shard group listing used by
cross-cluster coordinators), PainlessExecuteAction (run a script in a
test context and return {"result": ...}).
"""

from __future__ import annotations

from raydex.search.fetchphase import (
    field_script,
    filter_source,
    normalize_source_spec,
)


def msearch(searcher, items: list[dict]) -> list[dict]:
    """`_msearch` analogue: run each search body independently; a
    failing item yields an {"error": ...} entry instead of failing the
    batch (TransportMultiSearchAction semantics)."""
    out = []
    for body in items:
        try:
            k = int(body.get("size", 10))
            from_ = int(body.get("from", 0))
            q = body.get("query")
            if q is None:
                raise ValueError("msearch item needs a query")
            kwargs = {}
            if body.get("_source") is not None:
                kwargs["source"] = body["_source"]
            if body.get("script_fields"):
                kwargs["script_fields"] = body["script_fields"]
            if body.get("runtime_mappings"):
                kwargs["runtime_mappings"] = body["runtime_mappings"]
            hits = searcher.search_query(q, k=k, from_=from_, **kwargs)
            out.append({"hits": hits, "status": 200})
        except Exception as e:  # noqa: BLE001 — per-item isolation
            out.append({"error": {"type": type(e).__name__,
                                  "reason": str(e)}, "status": 400})
    return out


def msearch_template(searcher, items: list[dict],
                     store=None) -> list[dict]:
    """`_msearch/template`: render each item's template (inline source
    or stored id) into a search body, then msearch."""
    from raydex.search.templates import render_template

    rendered = []
    for it in items:
        try:
            if "id" in it:
                if store is None:
                    raise ValueError("stored template needs a script store")
                body = store.render(it["id"], it.get("params"))
            else:
                body = render_template(it["source"], it.get("params"))
            rendered.append(body)
        except Exception as e:  # noqa: BLE001
            rendered.append({"__error__": e})
    out = []
    for body in rendered:
        if "__error__" in body:
            e = body["__error__"]
            out.append({"error": {"type": type(e).__name__,
                                  "reason": str(e)}, "status": 400})
        else:
            out.extend(msearch(searcher, [body]))
    return out


def get_source(index_dir: str, url: str, source=None) -> dict | None:
    """`GET <index>/_source/<id>` analogue: the stored per-doc columns
    (this engine's `_source`) with include/exclude projection applied;
    None when the document does not exist (RestGetSourceAction 404)."""
    from raydex.search.get import get_doc

    doc = get_doc(index_dir, url)
    if doc is None:
        return None
    doc = {k: v for k, v in doc.items() if not k.startswith("_")}
    spec = normalize_source_spec(source if source is not None else True)
    if spec is None:
        return doc
    return filter_source(doc, *spec)


def exists_source(index_dir: str, url: str) -> bool:
    """`HEAD <index>/_source/<id>`."""
    return get_source(index_dir, url) is not None


def search_shards(index_expr: str) -> dict:
    """`_search_shards` analogue: the shard groups a search would
    scatter over — one row per (index dir, partition) with its segment
    ids and doc count (TransportSearchShardsAction's node/shard
    listing collapses to partitions here; can-match runs separately)."""
    import json
    import os

    from raydex.search.scatter import resolve_index_dirs

    shards = []
    indices = {}
    for d in resolve_index_dirs(index_expr):
        man = json.load(open(os.path.join(d, "index_manifest.json")))
        indices[d] = {"doc_count": man.get("doc_count"),
                      "num_partitions": man.get("num_partitions")}
        by_part: dict[int, list[dict]] = {}
        for seg in man.get("segments", []):
            by_part.setdefault(int(seg["part"]), []).append(seg)
        for part, segs in sorted(by_part.items()):
            shards.append({
                "index": d,
                "shard": part,
                "segments": [s["seg_id"] for s in segs],
                "doc_count": int(sum(s["doc_count"] for s in segs)),
            })
    return {"shards": shards, "indices": indices}


def painless_execute(body: dict) -> dict:
    """`POST _scripts/painless/_execute` analogue: run a REGISTERED
    script (the engine's scripting surface is the Python registry) in
    a test context. ``body`` = {"script": {"source": <registered
    name>, "params": {...}}, "context": "painless_test" (default),
    "context_setup": {"document": {...}}}. Returns {"result": ...}."""
    script = body.get("script") or {}
    name = script.get("source")
    params = script.get("params") or {}
    doc = (body.get("context_setup") or {}).get("document") or {}
    fn = field_script(name)
    return {"result": fn(doc, params)}
