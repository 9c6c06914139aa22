"""Text-structure finder — format inference for raw text ingestion.

Reference: ``x-pack/plugin/text-structure``
(``TextStructureFinderManager``, ``DelimitedTextStructureFinder``,
``NdJsonTextStructureFinder``, ``TimestampFormatFinder``): given a
sample of lines, decide the container format (ndjson / delimited /
semi-structured), the delimiter + column names for delimited data,
per-column types, and the timestamp column + format. The result feeds
ingest-pipeline construction — here it pairs with
:func:`raydex.index.build.build_index`'s dynamic mapping the same way."""

from __future__ import annotations

import json
import re

_TS_FORMATS = [
    ("iso8601", re.compile(
        r"^\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}(?:[.,]\d+)?"
        r"(?:Z|[+-]\d{2}:?\d{2})?$")),
    ("epoch_millis", re.compile(r"^1\d{12}$")),
    ("epoch_second", re.compile(r"^1\d{9}$")),
    ("yyyy/MM/dd HH:mm:ss", re.compile(
        r"^\d{4}/\d{2}/\d{2} \d{2}:\d{2}:\d{2}$")),
    ("syslog", re.compile(
        r"^[A-Z][a-z]{2} +\d{1,2} \d{2}:\d{2}:\d{2}$")),
]


def _timestamp_format(values: list[str]) -> str | None:
    vals = [v for v in values if v]
    if not vals:
        return None
    for name, rx in _TS_FORMATS:
        if all(rx.match(v.strip()) for v in vals):
            return name
    return None


def _column_type(values: list) -> str:
    vals = [v for v in values if v not in (None, "")]
    if not vals:
        return "keyword"
    if all(isinstance(v, bool) for v in vals):
        return "boolean"
    import math

    try:
        fs = [float(v) for v in vals]
    except (TypeError, ValueError):
        fs = None
    if fs is not None:
        # inf/nan cells keep the column numeric (double); int() is only
        # attempted on finite values so no OverflowError path exists
        if all(math.isfinite(x) and x == int(x) for x in fs):
            return "long"
        return "double"
    svals = [str(v) for v in vals]
    if _timestamp_format(svals):
        return "date"
    return "text" if max(len(s) for s in svals) > 64 or any(
        " " in s for s in svals) else "keyword"


def find_structure(lines: list[str], max_sample: int = 1000) -> dict:
    """Infer the structure of ``lines`` (the ``_text_structure/
    find_structure`` body). Returns {format, column_names?, delimiter?,
    mappings, timestamp_field?, timestamp_format?,
    num_lines_analyzed}."""
    sample = [ln for ln in lines[:max_sample] if ln.strip()]
    if not sample:
        raise ValueError("empty sample")

    # --- ndjson: every line parses to a JSON object
    objs = []
    for ln in sample:
        try:
            o = json.loads(ln)
        except json.JSONDecodeError:
            objs = None
            break
        if not isinstance(o, dict):
            objs = None
            break
        objs.append(o)
    if objs:
        cols = sorted({k for o in objs for k in o})
        colvals = {c: [o.get(c) for o in objs] for c in cols}
        return _result("ndjson", cols, colvals, len(sample))

    # --- delimited: a consistent column count > 1 under one delimiter,
    # parsed quote-aware (DelimitedTextStructureFinder uses a real CSV
    # parser — 'a,"x, y"' is two fields, not three)
    import csv
    import io

    for delim in (",", "\t", ";", "|"):
        try:
            rows = list(csv.reader(io.StringIO("\n".join(sample)),
                                   delimiter=delim))
        except csv.Error:
            continue
        widths = {len(r) for r in rows if r}
        if len(widths) == 1 and widths.pop() >= 2:
            rows = [r for r in rows if r]
            header = [c.strip().strip('"') for c in rows[0]]
            body = rows[1:] if len(rows) > 1 else rows
            # header row iff its cells look like names, not data
            has_header = len(rows) > 1 and all(
                _column_type([c]) in ("keyword", "text") for c in header
            ) and any(_column_type([r[i] for r in body]) != "keyword"
                      for i in range(len(header)))
            if not has_header:
                header = [f"column{i + 1}" for i in range(len(rows[0]))]
                body = rows
            colvals = {h: [r[i].strip() for r in body]
                       for i, h in enumerate(header)}
            out = _result("delimited", header, colvals, len(sample))
            out["delimiter"] = delim
            out["has_header_row"] = has_header
            return out

    # --- semi-structured text: grok-ish fallback, timestamp prefix if any
    head = [" ".join(ln.split()[:3]) for ln in sample]
    tsfmt = (_timestamp_format(head)
             or _timestamp_format(
                 [ln.split()[0] for ln in sample if ln.split()]))
    out = {"format": "semi_structured_text",
           "mappings": {"message": {"type": "text"}},
           "num_lines_analyzed": len(sample)}
    if tsfmt:
        out["timestamp_format"] = tsfmt
    return out


def _result(fmt: str, cols: list[str], colvals: dict,
            n: int) -> dict:
    mappings = {c: {"type": _column_type(colvals[c])} for c in cols}
    out = {"format": fmt, "column_names": list(cols),
           "mappings": mappings, "num_lines_analyzed": n}
    ts_cols = [c for c in cols if mappings[c]["type"] == "date"]
    if ts_cols:
        c = ts_cols[0]
        out["timestamp_field"] = c
        out["timestamp_format"] = _timestamp_format(
            [str(v) for v in colvals[c] if v not in (None, "")])
    return out
