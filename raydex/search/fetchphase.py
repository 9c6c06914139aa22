"""Fetch-phase ``_source`` filtering + ``script_fields``.

Reference: ``server/src/main/java/org/elasticsearch/search/fetch/
subphase/FetchSourcePhase.java`` (per-hit _source include/exclude
projection, wildcard patterns, includes applied before excludes) and
``ScriptFieldsPhase.java`` (per-hit computed fields). Segments here
store no JSON ``_source`` blob; the hit's source document is the set
of stored per-doc columns (``url``, ``dl``, every doc-values column) —
the same data the reference would surface via stored/doc-value fields,
so include/exclude semantics apply unchanged. Scripts resolve through
a Python registry (the engine-wide scripting convention): a script
spec's ``source`` names a registered callable ``fn(doc: dict, params:
dict) -> value``.

Request surface (``search_query(..., source=..., script_fields=...)``):

- ``source=True`` → full source dict per hit; ``source=False`` → none
- ``source={"includes": [...], "excludes": [...]}`` (str or list;
  ``*`` wildcards) — or a bare str/list shorthand for includes
- ``script_fields={"name": {"script": {"source": "<registered>",
  "params": {...}}}}``
"""

from __future__ import annotations

import fnmatch

_FIELD_SCRIPTS: dict = {}


def register_field_script(name: str, fn) -> None:
    """Register a ``script_fields`` callable: fn(doc, params) -> value.
    ``doc`` is the hit's source dict (url/dl/doc-values columns)."""
    _FIELD_SCRIPTS[name] = fn


def field_script(name: str):
    try:
        return _FIELD_SCRIPTS[name]
    except KeyError:
        raise ValueError(f"unknown field script {name!r}") from None


# a couple of generally useful built-ins (mirrors the painless
# one-liners the reference's doc examples use)
register_field_script(
    "doc_value_times", lambda doc, p: (
        doc.get(p.get("field", "dl"), 0) * p.get("factor", 1)))
register_field_script(
    "concat_fields", lambda doc, p: str(p.get("separator", "_")).join(
        str(doc.get(f, "")) for f in p.get("fields", [])))


def normalize_source_spec(source) -> tuple[list[str], list[str]] | None:
    """→ (includes, excludes) pattern lists, or None for source=False.
    Accepts the reference's forms: bool, str, list, {includes,
    excludes} (also the `include`/`exclude` aliases)."""
    if source is None or source is False:
        return None
    if source is True:
        return ([], [])
    if isinstance(source, str):
        return ([source], [])
    if isinstance(source, (list, tuple)):
        return (list(source), [])
    inc = source.get("includes", source.get("include", []))
    exc = source.get("excludes", source.get("exclude", []))
    if isinstance(inc, str):
        inc = [inc]
    if isinstance(exc, str):
        exc = [exc]
    return (list(inc), list(exc))


def filter_source(doc: dict, includes: list[str],
                  excludes: list[str]) -> dict:
    """FetchSourcePhase projection: a field survives when it matches
    SOME include pattern (or includes is empty) and NO exclude
    pattern. ``*`` wildcards per fnmatch."""
    out = {}
    for k, v in doc.items():
        if includes and not any(fnmatch.fnmatchcase(k, p)
                                for p in includes):
            continue
        if any(fnmatch.fnmatchcase(k, p) for p in excludes):
            continue
        out[k] = v
    return out


def run_script_fields(doc: dict, script_fields: dict) -> dict:
    """ScriptFieldsPhase: {name: value} per hit."""
    out = {}
    for name, spec in (script_fields or {}).items():
        sc = spec.get("script") or {}
        fn = field_script(sc.get("source") or sc.get("id"))
        out[name] = fn(doc, sc.get("params") or {})
    return out
