"""Composable index templates — the reference's
``MetadataIndexTemplateService`` / ``ComposableIndexTemplate`` /
``ComponentTemplate`` model (`PUT _index_template`,
`PUT _component_template`):

- an index template has ``index_patterns`` (globs), a ``priority``, an
  optional ``template`` body and an ordered ``composed_of`` list of
  component templates;
- at index-creation time the HIGHEST-priority matching template wins
  (overlapping same-priority patterns are rejected at put time, the
  reference's validation);
- the effective body = components merged in composed_of order, then the
  template's own body on top (later wins per key — the documented
  precedence).

The ``template`` body carries this engine's build settings:
``settings`` (num_partitions, analyzer, store_positions,
max_docs_per_segment, dedup) and ``mappings`` (a list of FieldSpec
dicts). ``build_args_for(name)`` resolves them to ``build_index``
kwargs, the create-index path analogue.
"""

from __future__ import annotations

import fnmatch
import json
import os


class IndexTemplateRegistry:
    FILE = "index_templates.json"

    def __init__(self, root: str):
        os.makedirs(root, exist_ok=True)
        self.path = os.path.join(root, self.FILE)

    def _load(self) -> dict:
        if not os.path.exists(self.path):
            return {"templates": {}, "components": {}}
        with open(self.path) as f:
            return json.load(f)

    def _store(self, data: dict) -> None:
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(data, f, indent=1, sort_keys=True)
        os.replace(tmp, self.path)

    # ------------------------------------------------------------- puts
    def put_component(self, name: str, template: dict) -> None:
        """`PUT _component_template/<name>` — a reusable body chunk."""
        data = self._load()
        data["components"][name] = {"template": template}
        self._store(data)

    def put_template(self, name: str, index_patterns: list[str],
                     template: dict | None = None, priority: int = 0,
                     composed_of: list[str] | None = None) -> None:
        """`PUT _index_template/<name>`. Rejects a same-priority
        template whose patterns overlap an existing one (the
        reference's overlap validation) and unknown components."""
        data = self._load()
        for comp in composed_of or []:
            if comp not in data["components"]:
                raise ValueError(f"unknown component template {comp!r}")
        for other, t in data["templates"].items():
            if other == name or t["priority"] != priority:
                continue
            for pa_ in index_patterns:
                for pb in t["index_patterns"]:
                    if _patterns_overlap(pa_, pb):
                        raise ValueError(
                            f"index template {name!r} pattern {pa_!r} "
                            f"conflicts with {other!r} pattern {pb!r} at "
                            f"the same priority {priority}"
                        )
        data["templates"][name] = {
            "index_patterns": list(index_patterns),
            "template": template or {},
            "priority": int(priority),
            "composed_of": list(composed_of or []),
        }
        self._store(data)

    def delete_template(self, name: str) -> None:
        data = self._load()
        data["templates"].pop(name, None)
        self._store(data)

    # ---------------------------------------------------------- resolve
    def match(self, index_name: str) -> str | None:
        """Highest-priority template whose patterns match (ties broken
        by name for determinism)."""
        data = self._load()
        best = None
        for name, t in sorted(data["templates"].items()):
            if any(fnmatch.fnmatchcase(index_name, p)
                   for p in t["index_patterns"]):
                if best is None or t["priority"] > data["templates"][best]["priority"]:
                    best = name
        return best

    def resolve(self, index_name: str) -> dict:
        """Effective merged template body for a new index (components in
        composed_of order, then the template's own body — later wins)."""
        data = self._load()
        name = self.match(index_name)
        if name is None:
            return {}
        t = data["templates"][name]
        out: dict = {"settings": {}, "mappings": []}
        for comp in t["composed_of"]:
            _merge(out, data["components"][comp]["template"])
        _merge(out, t["template"])
        return out

    def build_args_for(self, index_name: str) -> dict:
        """``build_index`` kwargs implied by the matched template —
        the create-index settings application."""
        from raydex.index.segment import FieldSpec

        body = self.resolve(index_name)
        s = body.get("settings", {})
        out = {}
        for k_src, k_dst in [
            ("num_partitions", "num_partitions"), ("analyzer", "analyzer"),
            ("store_positions", "store_positions"),
            ("max_docs_per_segment", "max_docs_per_segment"),
            ("dedup", "dedup"), ("source", "source"),
        ]:
            if k_src in s:
                out[k_dst] = s[k_src]
        if body.get("mappings"):
            out["fields"] = [FieldSpec.from_json(d) for d in body["mappings"]]
        return out


def _merge(base: dict, overlay: dict) -> None:
    """Later-wins merge: settings keys override, mappings append/replace
    by field name (the reference merges mappings per field)."""
    for k, v in (overlay.get("settings") or {}).items():
        base["settings"][k] = v
    for m in overlay.get("mappings") or []:
        base["mappings"] = [x for x in base["mappings"]
                            if x.get("name") != m.get("name")] + [m]


def _patterns_overlap(a: str, b: str) -> bool:
    """Conservative glob-overlap check: either pattern matches the
    other's literal prefix rendering (covers the `logs-*` vs `logs-app*`
    family the reference rejects)."""
    probe_a = a.replace("*", "x").replace("?", "x")
    probe_b = b.replace("*", "x").replace("?", "x")
    return (
        fnmatch.fnmatchcase(probe_a, b) or fnmatch.fnmatchcase(probe_b, a)
    )


def simulate_index_template(registry: IndexTemplateRegistry,
                            index_name: str) -> dict:
    """`POST _index_template/_simulate_index/<name>` analogue
    (TransportSimulateIndexTemplateAction): the effective merged
    template a new index with this name would get, plus every OTHER
    matching template it overrides (the `overlapping` list)."""
    data = registry._load()
    winner = registry.match(index_name)
    overlapping = []
    for name, t in sorted(data["templates"].items()):
        if name == winner:
            continue
        if any(fnmatch.fnmatchcase(index_name, p)
               for p in t["index_patterns"]):
            overlapping.append(
                {"name": name, "index_patterns": t["index_patterns"]})
    return {"template": registry.resolve(index_name),
            "matched_template": winner,
            "overlapping": overlapping}


def simulate_template(registry: IndexTemplateRegistry,
                      name: str) -> dict:
    """`POST _index_template/_simulate/<name>`: the fully composed body
    of one NAMED template (components merged in composed_of order)."""
    data = registry._load()
    if name not in data["templates"]:
        raise KeyError(name)
    t = data["templates"][name]
    out: dict = {"settings": {}, "mappings": []}
    for comp in t["composed_of"]:
        _merge(out, data["components"][comp]["template"])
    _merge(out, t["template"])
    return {"template": out,
            "index_patterns": t["index_patterns"],
            "priority": t["priority"]}
