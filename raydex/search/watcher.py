"""Watcher execution core — input → condition → actions.

Reference: ``x-pack/plugin/watcher`` (``ExecutionService``,
``condition/CompareCondition.java`` + ``LenientCompare.java``,
``input/search``, ``actions/{logging,index}``): a watch runs its input
(here: a search against an index), evaluates a condition over the
payload context (``ctx.payload...`` dotted paths with the lenient
compare semantics), and fires actions when it's met. Scheduling
(``trigger.schedule``) is the caller's concern — the reference's
TickerScheduleTriggerEngine maps to whatever cron/driver loop invokes
:func:`execute_watch`; the execution semantics live here."""

from __future__ import annotations

_OPS = ("eq", "not_eq", "gt", "gte", "lt", "lte")


def _resolve_path(ctx: dict, path: str):
    cur = ctx
    for part in path.split("."):
        if isinstance(cur, list):
            cur = cur[int(part)]
        elif isinstance(cur, dict):
            cur = cur.get(part)
        else:
            return None
        if cur is None:
            return None
    return cur


def _lenient_compare(a, op: str, b) -> bool:
    """``LenientCompare``: numeric strings coerce to numbers; None only
    ever equals None."""
    if a is None or b is None:
        return (a is None and b is None) if op == "eq" else (
            op == "not_eq" and (a is None) != (b is None))

    def num(x):
        try:
            return float(x)
        except (TypeError, ValueError):
            return None

    na, nb = num(a), num(b)
    if na is not None and nb is not None:
        a, b = na, nb
    else:
        a, b = str(a), str(b)
    if op == "eq":
        return a == b
    if op == "not_eq":
        return a != b
    if op == "gt":
        return a > b
    if op == "gte":
        return a >= b
    if op == "lt":
        return a < b
    if op == "lte":
        return a <= b
    raise ValueError(f"unknown compare op {op!r}")


def check_condition(condition: dict, ctx: dict) -> bool:
    """``always`` | ``never`` | ``compare`` ({path: {op: value}}) |
    ``array_compare`` ({path: {"path": subfield?, op: {"value": v,
    "quantifier": "some"|"all"}}})."""
    if condition in (None, {}, {"always": {}}):
        return True
    (kind, body), = condition.items()
    if kind == "always":
        return True
    if kind == "never":
        return False
    if kind == "compare":
        (path, spec), = body.items()
        (op, want), = spec.items()
        return _lenient_compare(_resolve_path(ctx, path), op, want)
    if kind == "array_compare":
        (path, spec), = body.items()
        sub = spec.get("path")
        ops = {k: v for k, v in spec.items() if k in _OPS}
        (op, b), = ops.items()
        want, quant = b["value"], b.get("quantifier", "some")
        arr = _resolve_path(ctx, path) or []
        vals = [(_resolve_path(x, sub) if sub and isinstance(x, dict)
                 else x) for x in arr]
        hits = [_lenient_compare(v, op, want) for v in vals]
        return all(hits) if quant == "all" else any(hits)
    raise ValueError(f"unknown condition kind {kind!r}")


def execute_watch(watch: dict, searcher=None) -> dict:
    """Run one watch: ``input.search`` (body.query against
    ``searcher``) or ``input.simple`` (inline payload), then the
    condition, then actions. Supported actions: ``logging`` (message
    with ``{{ctx.payload...}}`` substitution, collected into the
    result) and ``index`` (rows appended to the returned
    ``indexed`` list — the caller owns durable storage). Returns
    {"condition_met", "payload", "actions": [...]}, the reference's
    watch-record shape."""
    inp = watch.get("input") or {"simple": {}}
    (ikind, ibody), = inp.items()
    if ikind == "simple":
        payload = dict(ibody)
    elif ikind == "search":
        body = ibody.get("request", ibody).get("body", {})
        k = int(body.get("size", 10))
        hits = searcher.search_query(body.get("query") or {"match_all": {}},
                                     k=max(k, 1))
        total = searcher.count(body.get("query") or {"match_all": {}})
        payload = {"hits": {"total": total, "hits": hits[:k]}}
    else:
        raise ValueError(f"unknown input kind {ikind!r}")
    ctx = {"payload": payload}
    met = check_condition(watch.get("condition"), {"ctx": ctx} | ctx)
    out: list[dict] = []
    if met:
        for name, act in (watch.get("actions") or {}).items():
            (akind, abody), = act.items()
            if akind == "logging":
                msg = abody.get("text", "")
                # {{ctx.payload.x}} mustache-lite substitution
                import re as _re

                msg = _re.sub(
                    r"\{\{\s*([\w.]+)\s*\}\}",
                    lambda m: str(_resolve_path({"ctx": ctx} | ctx,
                                                m.group(1))),
                    msg,
                )
                out.append({"id": name, "type": "logging",
                            "message": msg})
            elif akind == "index":
                h = payload.get("hits")
                rows = (h.get("hits", [payload])
                        if isinstance(h, dict) else [payload])
                out.append({"id": name, "type": "index",
                            "index": abody.get("index", ""),
                            "indexed": list(rows)})
            else:
                raise ValueError(f"unknown action kind {akind!r}")
    return {"condition_met": met, "payload": payload, "actions": out}
