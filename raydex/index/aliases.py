"""Index aliases + rollover — the reference's alias layer
(``server/src/main/java/org/elasticsearch/cluster/metadata/AliasMetadata.java``,
``MetadataIndexAliasesService.java`` atomic actions,
``action/admin/indices/rollover/TransportRolloverAction.java``).

State is one JSON file (``aliases.json``) under a *registry root*
directory (the cluster-metadata analogue): alias -> list of
``{"index": <dir>, "filter": <query dsl>|None, "is_write_index": bool}``.
Updates are atomic (tmp + rename) and applied as ONE action list, the
reference's `_aliases` POST semantics — readers never observe a half
swap.

Semantics kept from the reference:

- an alias may point at many indexes; searches fan out over the union
  (multi-index search path, union IDF);
- a *filtered* alias wraps every query in ``bool.filter`` with the
  alias filter (``AliasMetadata#filter``);
- at most ONE index per alias may be the write index
  (``is_write_index``); ``write_index()`` is where ingest goes;
- rollover: when the write index satisfies any condition
  (``max_docs`` / ``max_age_s``/ ``max_size_bytes``), the alias
  atomically moves its write pointer to ``<stem>-NNNNNN+1`` and the old
  index stays searchable through the alias — the reference's rollover
  contract (new index creation is the caller's ingest step, matching
  the lazy-bootstrap mode).
"""

from __future__ import annotations

import json
import os
import re
import time


class AliasRegistry:
    """Alias metadata store rooted at a directory; all mutation goes
    through :meth:`update_aliases` (atomic multi-action swap)."""

    FILE = "aliases.json"

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)
        self.path = os.path.join(root, self.FILE)

    # ------------------------------------------------------------- state
    def _load(self) -> dict:
        if not os.path.exists(self.path):
            return {}
        with open(self.path) as f:
            return json.load(f)

    def _store(self, data: dict) -> None:
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(data, f, indent=1, sort_keys=True)
        os.replace(tmp, self.path)

    # ----------------------------------------------------------- actions
    def update_aliases(self, actions: list[dict]) -> dict:
        """Apply an action list atomically (the `_aliases` POST body):
        ``{"add": {"alias": a, "index": dir, "filter": dsl?,
        "is_write_index": bool?}}`` | ``{"remove": {...}}`` |
        ``{"remove_index": {"index": dir}}`` (drops the index from every
        alias). Validation failures leave the registry untouched."""
        data = self._load()
        for act in actions:
            if len(act) != 1:
                raise ValueError(f"one action kind per entry, got {act}")
            kind, body = next(iter(act.items()))
            if kind == "add":
                alias, index = body["alias"], body["index"]
                entries = [e for e in data.get(alias, [])
                           if e["index"] != index]
                entry = {
                    "index": index,
                    "filter": body.get("filter"),
                    "is_write_index": bool(body.get("is_write_index", False)),
                }
                if entry["is_write_index"]:
                    for e in entries:
                        e["is_write_index"] = False
                entries.append(entry)
                data[alias] = entries
            elif kind == "remove":
                alias, index = body["alias"], body["index"]
                if alias not in data or not any(
                    e["index"] == index for e in data[alias]
                ):
                    raise ValueError(
                        f"aliases_not_found: [{alias}] does not point at "
                        f"[{index}]"
                    )
                data[alias] = [e for e in data[alias] if e["index"] != index]
                if not data[alias]:
                    del data[alias]
            elif kind == "remove_index":
                index = body["index"]
                for alias in list(data):
                    data[alias] = [e for e in data[alias]
                                   if e["index"] != index]
                    if not data[alias]:
                        del data[alias]
            else:
                raise ValueError(f"unknown alias action {kind!r}")
        nw = {a: sum(e["is_write_index"] for e in es)
              for a, es in data.items()}
        bad = [a for a, n in nw.items() if n > 1]
        if bad:
            raise ValueError(f"alias(es) with >1 write index: {bad}")
        self._store(data)
        return data

    # ------------------------------------------------------------ lookup
    def get(self, alias: str) -> list[dict]:
        return self._load().get(alias, [])

    def aliases(self) -> dict:
        return self._load()

    def resolve(self, alias: str) -> tuple[list[str], list[dict]]:
        """(index dirs, per-index alias filters aligned with dirs;
        None where unfiltered). Raises if the alias is unknown."""
        entries = self.get(alias)
        if not entries:
            raise ValueError(f"unknown alias {alias!r}")
        return [e["index"] for e in entries], [e["filter"] for e in entries]

    def write_index(self, alias: str) -> str:
        """The single write index of an alias (`is_write_index` pointer
        — where ingest goes, the reference's WriteRequest resolution)."""
        entries = self.get(alias)
        writers = [e["index"] for e in entries if e["is_write_index"]]
        if len(writers) != 1:
            raise ValueError(
                f"alias {alias!r} has {len(writers)} write indexes; "
                f"rollover targets need exactly one"
            )
        return writers[0]

    # ---------------------------------------------------------- rollover
    _STEM_RE = re.compile(r"^(?P<stem>.*?)-(?P<n>\d{6})$")

    @classmethod
    def next_index_name(cls, current: str) -> str:
        """`logs-000007` -> `logs-000008`; an unsuffixed name gets
        `-000002` (the reference's rollover naming rule)."""
        m = cls._STEM_RE.match(current)
        if m:
            return f"{m.group('stem')}-{int(m.group('n')) + 1:06d}"
        return f"{current}-000002"

    def rollover(self, alias: str, conditions: dict,
                 dry_run: bool = False) -> dict:
        """Roll the alias's write pointer when the current write index
        meets ANY condition: ``max_docs`` (manifest doc_count),
        ``max_age_s`` (manifest file mtime age), ``max_size_bytes``
        (sum of segment payload bytes). Returns the reference-shaped
        response: {rolled_over, old_index, new_index, conditions}."""
        from raydex.index.build import INDEX_MANIFEST, load_index_manifest

        old = self.write_index(alias)
        manifest = load_index_manifest(old)
        mpath = os.path.join(old, INDEX_MANIFEST)
        age_s = time.time() - os.path.getmtime(mpath)
        size = sum(
            int(s.get("payload_bytes", 0)) for s in manifest["segments"]
        ) or sum(
            os.path.getsize(os.path.join(dp, fn))
            for dp, _, fns in os.walk(old) for fn in fns
        )
        met = {}
        if "max_docs" in conditions:
            met["[max_docs: %d]" % conditions["max_docs"]] = (
                manifest["doc_count"] >= conditions["max_docs"]
            )
        if "max_age_s" in conditions:
            met["[max_age_s: %d]" % conditions["max_age_s"]] = (
                age_s >= conditions["max_age_s"]
            )
        if "max_size_bytes" in conditions:
            met["[max_size_bytes: %d]" % conditions["max_size_bytes"]] = (
                size >= conditions["max_size_bytes"]
            )
        roll = any(met.values()) if met else False
        new = self.next_index_name(old)
        if roll and not dry_run:
            self.update_aliases([
                {"add": {"alias": alias, "index": old,
                         "is_write_index": False}},
                {"add": {"alias": alias, "index": new,
                         "is_write_index": True}},
            ])
        return {
            "rolled_over": roll, "dry_run": dry_run,
            "old_index": old, "new_index": new, "conditions": met,
        }


def wrap_alias_filter(qdict: dict | None, flt: dict | None) -> dict:
    """Compose a query with an alias filter: ``bool(must=query,
    filter=alias_filter)`` — the reference applies alias filters as
    filter context (no scoring contribution)."""
    if flt is None:
        return qdict if qdict is not None else {"match_all": {}}
    inner = qdict if qdict is not None else {"match_all": {}}
    return {"bool": {"must": [inner], "filter": [flt]}}


class AliasedSearcher:
    """Search through an alias: one LocalSearcher per distinct filter
    group (indexes sharing a filter share a searcher, union IDF within
    the group), results merged with the TopDocs tie-break. Filters are
    applied as filter context per the alias contract."""

    def __init__(self, registry: AliasRegistry, alias: str,
                 searcher_cls=None):
        from raydex.search.scatter import LocalSearcher

        self.alias = alias
        dirs, filters = registry.resolve(alias)
        cls = searcher_cls or LocalSearcher
        # group dirs by (json-canonical) filter -> one searcher per group
        groups: dict[str, tuple[dict | None, list[str]]] = {}
        for d, f in zip(dirs, filters):
            key = json.dumps(f, sort_keys=True)
            groups.setdefault(key, (f, []))[1].append(d)
        self.parts = [(f, cls(ds)) for f, ds in groups.values()]

    def search_query(self, qdict: dict | None = None, k: int = 10):
        from raydex.search.scatter import merge_top_k

        allhits = []
        for i, (flt, s) in enumerate(self.parts):
            hits = s.search_query(wrap_alias_filter(qdict, flt), k=k)
            # re-key ordinals so tie-breaks stay deterministic across parts
            allhits.extend(
                (h["score"], (i, h["ordinal"]), h["docid"], h["url"])
                for h in hits
            )
        allhits.sort(key=lambda t: (-t[0], t[1], t[2]))
        return [
            {"score": sc, "ordinal": o, "docid": d, "url": u}
            for sc, o, d, u in allhits[:k]
        ]

    def count(self, qdict: dict | None = None) -> int:
        return sum(
            s.count(wrap_alias_filter(qdict, flt)) for flt, s in self.parts
        )


def resolve_index(expression: str, alias_root: str | None = None,
                  ds_root: str | None = None) -> dict:
    """`GET _resolve/index/<expression>` analogue
    (ResolveIndexAction): classify what an expression resolves to —
    concrete index dirs (glob-aware), aliases from a registry root,
    and data streams from a stream root — in the reference's response
    shape ({indices, aliases, data_streams})."""
    import fnmatch

    from raydex.search.scatter import resolve_index_dirs

    out = {"indices": [], "aliases": [], "data_streams": []}
    parts = [p.strip() for p in str(expression).split(",") if p.strip()]

    alias_map = {}
    if alias_root is not None:
        alias_map = AliasRegistry(alias_root).aliases()
    streams = {}
    if ds_root is not None:
        from raydex.index.datastream import DataStreamRegistry
        streams = DataStreamRegistry(ds_root).streams()

    seen_idx: set[str] = set()
    for p in parts:
        for name, entries in sorted(alias_map.items()):
            if fnmatch.fnmatchcase(name, p):
                out["aliases"].append(
                    {"name": name,
                     "indices": [e["index"] for e in entries]})
        for name, meta in sorted(streams.items()):
            if fnmatch.fnmatchcase(name, p):
                out["data_streams"].append(
                    {"name": name,
                     "backing_indices": list(meta.get("indices", []))})
        try:
            for d in resolve_index_dirs(p):
                import os
                if d in seen_idx:
                    continue
                if os.path.exists(os.path.join(d, "index_manifest.json")):
                    seen_idx.add(d)
                    out["indices"].append(
                        {"name": d, "attributes": ["open"]})
        except ValueError:
            pass  # pure alias/stream expressions have no concrete dir
    return out
