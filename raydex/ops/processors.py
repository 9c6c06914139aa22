"""Ingest-processor analogues (SURVEY.md §2.2) — vectorized batch maps.

The reference's ingest pipeline
(``server/.../ingest/IngestService.java:426,488``; ``CompoundProcessor``
= sequential composition with per-processor failure handling; ~31
processors in ``modules/ingest-common/``) collapses to: a PIPELINE is a
list of (name, kwargs) steps, compiled once into a single vectorized
``pyarrow``/pandas batch function applied via ``ds.map_batches``.

Implemented processors: set, remove, rename, lowercase, uppercase,
trim, gsub, split, join, convert, fingerprint, json (extract), kv,
urldecode, uri_parts, html_strip, script (user fn), drop (predicate),
append, bytes, date. Stateless; regexes compiled at pipeline build.
"""

from __future__ import annotations

import hashlib
import json as _json
import re
import urllib.parse

import numpy as np
import pandas as pd


def _series(batch: pd.DataFrame, field: str) -> pd.Series:
    return batch[field].astype("string").fillna("")


def p_set(batch, field, value):
    batch[field] = value
    return batch


def p_remove(batch, field):
    return batch.drop(columns=[field])


def p_rename(batch, field, target):
    return batch.rename(columns={field: target})


def p_lowercase(batch, field, target=None):
    batch[target or field] = _series(batch, field).str.lower()
    return batch


def p_uppercase(batch, field, target=None):
    batch[target or field] = _series(batch, field).str.upper()
    return batch


def p_trim(batch, field, target=None):
    batch[target or field] = _series(batch, field).str.strip()
    return batch


def p_gsub(batch, field, pattern, replacement, target=None, _rx_cache={}):
    rx = _rx_cache.setdefault(pattern, re.compile(pattern))
    batch[target or field] = _series(batch, field).str.replace(rx, replacement, regex=True)
    return batch


def p_split(batch, field, separator, target=None):
    batch[target or field] = _series(batch, field).str.split(separator)
    return batch


def p_join(batch, field, separator, target=None):
    batch[target or field] = batch[field].map(lambda xs: separator.join(xs))
    return batch


def p_convert(batch, field, type, target=None):
    t = {"integer": "int64", "long": "int64", "float": "float64",
         "double": "float64", "string": "string", "boolean": "bool"}[type]
    batch[target or field] = batch[field].astype(t)
    return batch


def p_fingerprint(batch, fields, target="fingerprint", method="md5"):
    """Reference `fingerprint` processor: hash of the concatenated field
    values (deterministic, SQL-checkable via DuckDB md5)."""
    h = getattr(hashlib, method)
    joined = batch[fields[0]].astype(str)
    for f in fields[1:]:
        joined = joined + "|" + batch[f].astype(str)
    batch[target] = [h(s.encode()).hexdigest() for s in joined]
    return batch


def p_json(batch, field, key, target):
    """`json` processor narrowed to scalar key extraction."""

    def ex(s):
        try:
            v = _json.loads(s).get(key)
            return None if v is None else str(v)
        except Exception:
            return None

    batch[target] = batch[field].map(ex)
    return batch


def p_kv(batch, field, field_split, value_split, target):
    def parse(s):
        out = {}
        for part in str(s).split(field_split):
            if value_split in part:
                k, v = part.split(value_split, 1)
                out[k] = v
        return out

    batch[target] = batch[field].map(parse)
    return batch


def p_urldecode(batch, field, target=None):
    batch[target or field] = batch[field].map(lambda s: urllib.parse.unquote(str(s)))
    return batch


def p_uri_parts(batch, field, prefix="uri_"):
    parts = batch[field].map(lambda s: urllib.parse.urlsplit(str(s)))
    batch[prefix + "scheme"] = parts.map(lambda u: u.scheme)
    batch[prefix + "host"] = parts.map(lambda u: u.netloc)
    batch[prefix + "path"] = parts.map(lambda u: u.path)
    batch[prefix + "query"] = parts.map(lambda u: u.query)
    return batch


def p_html_strip(batch, field, target=None):
    from raydex.analysis.html_strip import extract_text

    batch[target or field] = batch[field].map(extract_text)
    return batch


def p_script(batch, fn):
    return fn(batch)


def p_drop(batch, predicate):
    """`drop` processor: predicate(batch) -> boolean mask of rows to DROP."""
    mask = predicate(batch)
    return batch[~np.asarray(mask)]


def p_append(batch, field, value, target=None):
    batch[target or field] = batch[field].map(lambda xs: list(xs) + [value])
    return batch


def p_bytes(batch, field, target=None):
    units = {"b": 1, "kb": 1024, "mb": 1024**2, "gb": 1024**3}

    def conv(s):
        s = str(s).strip().lower()
        for u in ("gb", "mb", "kb", "b"):
            if s.endswith(u):
                return int(float(s[: -len(u)]) * units[u])
        return int(s)

    batch[target or field] = batch[field].map(conv)
    return batch


def p_date(batch, field, target=None, unit="ms"):
    batch[target or field] = pd.to_datetime(batch[field], unit=unit)
    return batch


def p_csv(batch, field, target_fields, separator=",", quote='"'):
    """`csv` processor: split one CSV-formatted field into columns."""
    import csv as _csv
    import io

    def parse(s):
        row = next(_csv.reader(io.StringIO(str(s)), delimiter=separator, quotechar=quote))
        return row

    rows = batch[field].map(parse)
    for i, tf in enumerate(target_fields):
        batch[tf] = rows.map(lambda r, i=i: r[i] if i < len(r) else None)
    return batch


def p_dissect(batch, field, pattern, _rx_cache={}):
    """`dissect` processor: '%{key}' delimited extraction (non-regex).

    Pattern like '%{ip} - %{user} [%{ts}]' -> columns ip/user/ts.
    """
    rx = _rx_cache.get(pattern)
    if rx is None:
        parts = re.split(r"(%\{[^}]+\})", pattern)
        out = ""
        for p in parts:
            if p.startswith("%{") and p.endswith("}"):
                out += f"(?P<{p[2:-1]}>.*?)"
            else:
                out += re.escape(p)
        rx = _rx_cache[pattern] = re.compile("^" + out + "$")
    keys = list(rx.groupindex)
    matches = batch[field].map(lambda s: rx.match(str(s)))
    for k in keys:
        batch[k] = matches.map(lambda m, k=k: m.group(k) if m else None)
    return batch


def p_grok(batch, field, pattern, _rx_cache={}, patterns: dict | None = None):
    """`grok` processor: named-capture regex with a small built-in
    pattern library (%{WORD:name} style)."""
    lib = {
        "WORD": r"\w+", "NUMBER": r"-?\d+(?:\.\d+)?", "INT": r"-?\d+",
        "IP": r"\d{1,3}(?:\.\d{1,3}){3}", "NOTSPACE": r"\S+",
        "DATA": r".*?", "GREEDYDATA": r".*",
    }
    if patterns:
        lib.update(patterns)
    rx = _rx_cache.get(pattern)
    if rx is None:
        def sub(m):
            name, _, alias = m.group(1).partition(":")
            body = lib[name]
            return f"(?P<{alias}>{body})" if alias else f"(?:{body})"

        rx = _rx_cache[pattern] = re.compile(
            re.sub(r"%\{([^}]+)\}", sub, pattern)
        )
    keys = list(rx.groupindex)
    matches = batch[field].map(lambda s: rx.search(str(s)))
    for k in keys:
        batch[k] = matches.map(lambda m, k=k: m.group(k) if m else None)
    return batch


def p_foreach(batch, field, processor, target=None, **kw):
    """`foreach`: apply a (scalar-shaped) processor to every element of a
    list-valued field."""
    fn = PROCESSORS[processor]

    def each(xs):
        sub = pd.DataFrame({field: list(xs)})
        return fn(sub, field=field, **kw)[field].tolist()

    batch[target or field] = batch[field].map(each)
    return batch


def p_enrich(batch, field, lookup, target, default=None):
    """`enrich` processor (x-pack enrich analogue): decorate each row
    from a broadcast lookup dict — pass ``lookup`` as a plain dict or a
    ``ray.ObjectRef`` (fetched once per worker)."""
    table = lookup
    try:
        import ray

        if isinstance(lookup, ray.ObjectRef):
            table = ray.get(lookup)
    except Exception:
        pass
    batch[target] = batch[field].map(lambda v: table.get(v, default))
    return batch


PROCESSORS = {
    "set": p_set, "remove": p_remove, "rename": p_rename,
    "lowercase": p_lowercase, "uppercase": p_uppercase, "trim": p_trim,
    "gsub": p_gsub, "split": p_split, "join": p_join, "convert": p_convert,
    "fingerprint": p_fingerprint, "json": p_json, "kv": p_kv,
    "urldecode": p_urldecode, "uri_parts": p_uri_parts,
    "html_strip": p_html_strip, "script": p_script, "drop": p_drop,
    "append": p_append, "bytes": p_bytes, "date": p_date,
    "csv": p_csv, "dissect": p_dissect, "grok": p_grok,
    "foreach": p_foreach, "enrich": p_enrich,
}


def register_processor(name: str, fn) -> None:
    PROCESSORS[name] = fn


def compile_pipeline(steps: list[tuple[str, dict]]):
    """CompoundProcessor analogue: one composed batch fn."""
    fns = [(PROCESSORS[name], kw) for name, kw in steps]

    def run(batch: pd.DataFrame) -> pd.DataFrame:
        for fn, kw in fns:
            batch = fn(batch, **kw)
        return batch

    return run


def apply_pipeline(ds, steps: list[tuple[str, dict]], batch_size: int = 4096):
    return ds.map_batches(
        compile_pipeline(steps), batch_format="pandas", batch_size=batch_size
    )
