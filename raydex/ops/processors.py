"""Ingest-processor analogues (SURVEY.md §2.2) — vectorized batch maps.

The reference's ingest pipeline
(``server/.../ingest/IngestService.java:426,488``; ``CompoundProcessor``
= sequential composition with per-processor failure handling; ~31
processors in ``modules/ingest-common/``) collapses to: a PIPELINE is a
list of (name, kwargs) steps, compiled once into a single vectorized
``pyarrow``/pandas batch function applied via ``ds.map_batches``.

Implemented processors: set, remove, rename, lowercase, uppercase,
trim, gsub, split, join, convert (full type set incl. ip/auto),
fingerprint, json (extract), kv, urldecode, uri_parts, html_strip,
script (user fn), drop (predicate), append, bytes, date, csv,
dissect, grok, foreach, enrich, sort, fail, dot_expander,
date_index_name, registered_domain, community_id, network_direction,
geoip, user_agent. Stateless; regexes compiled at pipeline build.

Two execution tiers share one registry of names:

* **Arrow tier** (``ARROW_PROCESSORS``) — zero-copy ``pyarrow.Table``
  in/out, every kernel a ``pyarrow.compute`` call (RE2 regexes, SIMD
  string ops). This is the hot path ``apply_pipeline`` picks whenever
  every step in the pipeline has an Arrow implementation, because the
  ingest tier runs over EVERY row of the corpus.
* **pandas tier** (``PROCESSORS``) — the original per-row-capable
  implementations, kept for ``_simulate``, for processors whose output
  is a Python object column (kv, csv, dot_expander, foreach) and for
  user-callable steps (script, drop, fail predicates, enrich).
"""

from __future__ import annotations

import hashlib
import json as _json
import re
import urllib.parse

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


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
    """`convert` processor (ConvertProcessor.java): the full type set —
    integer/long/float/double/string/boolean plus `ip` (validates the
    address, keeps the string form) and `auto` (first successful of
    boolean/int/float, else the string — the reference's order)."""
    if type == "ip":
        import ipaddress

        def toip(v):
            ipaddress.ip_address(str(v))  # raises on invalid, like the ref
            return str(v)

        batch[target or field] = batch[field].map(toip)
        return batch
    if type == "auto":
        def auto(v):
            s_ = str(v)
            if s_.lower() in ("true", "false"):
                return s_.lower() == "true"
            try:
                return int(s_)
            except ValueError:
                pass
            try:
                return float(s_)
            except ValueError:
                return s_

        batch[target or field] = batch[field].map(auto)
        return batch
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


_URI_RX = re.compile(
    # RFC 3986 appendix-B split (vectorizable via str.extract):
    # scheme ':' [ '//' authority ] path [ '?' query ]
    r"^(?:(?P<scheme>[A-Za-z][^:/?#]*):)?(?://(?P<host>[^/?#]*))?"
    r"(?P<path>[^?#]*)(?:\?(?P<query>[^#]*))?"
)


def p_uri_parts(batch, field, prefix="uri_"):
    # one vectorized extract (C regex pass) instead of per-row urlsplit
    parts = batch[field].astype(str).str.extract(_URI_RX)
    batch[prefix + "scheme"] = parts["scheme"].fillna("")
    batch[prefix + "host"] = parts["host"].fillna("")
    batch[prefix + "path"] = parts["path"].fillna("")
    batch[prefix + "query"] = parts["query"].fillna("")
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


# built-in grok pattern library (the published logstash/grok core set;
# `GET _ingest/processor/grok` serves it via grok_patterns())
GROK_BUILTIN_PATTERNS = {
    "WORD": r"\w+", "NUMBER": r"-?\d+(?:\.\d+)?", "INT": r"-?\d+",
    "IP": r"\d{1,3}(?:\.\d{1,3}){3}", "NOTSPACE": r"\S+",
    "DATA": r".*?", "GREEDYDATA": r".*",
    "USERNAME": r"[a-zA-Z0-9._-]+",
    "UUID": r"[A-Fa-f0-9]{8}-(?:[A-Fa-f0-9]{4}-){3}[A-Fa-f0-9]{12}",
    "MAC": r"(?:[A-Fa-f0-9]{2}:){5}[A-Fa-f0-9]{2}",
    "LOGLEVEL": (r"(?:[Aa]lert|ALERT|[Tt]race|TRACE|[Dd]ebug|DEBUG|"
                 r"[Nn]otice|NOTICE|[Ii]nfo|INFO|[Ww]arn?(?:ing)?|"
                 r"WARN?(?:ING)?|[Ee]rr?(?:or)?|ERR?(?:OR)?|"
                 r"[Cc]rit(?:ical)?|CRIT(?:ICAL)?|[Ff]atal|FATAL|"
                 r"[Ss]evere|SEVERE)"),
    "TIMESTAMP_ISO8601": (r"\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}"
                          r"(?::\d{2}(?:\.\d+)?)?(?:Z|[+-]\d{2}:?\d{2})?"),
    "HOSTNAME": (r"\b(?:[0-9A-Za-z][0-9A-Za-z-]{0,62})"
                 r"(?:\.(?:[0-9A-Za-z][0-9A-Za-z-]{0,62}))*\.?\b"),
    "QUOTEDSTRING": r'"[^"]*"|\'[^\']*\'',
}


def grok_patterns() -> dict:
    """`GET _ingest/processor/grok` analogue: the built-in pattern
    bank (GrokProcessorGetAction returns the bundled pattern map)."""
    return {"patterns": dict(GROK_BUILTIN_PATTERNS)}


def p_grok(batch, field, pattern, _rx_cache={}, patterns: dict | None = None):
    """`grok` processor: named-capture regex with the built-in
    pattern library (%{WORD:name} style)."""
    lib = dict(GROK_BUILTIN_PATTERNS)
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


class IngestFailure(Exception):
    """Raised by the `fail` processor (FailProcessor.java semantics)."""


def p_sort(batch, field, order="asc", target=None):
    """`sort` processor: sort a list-valued field in place."""
    rev = order == "desc"
    batch[target or field] = batch[field].map(lambda xs: sorted(xs, reverse=rev))
    return batch


def p_fail(batch, message, predicate=None):
    """`fail` processor: abort the pipeline (optionally only when
    ``predicate(batch)`` flags any row — the `if` condition analogue)."""
    if predicate is None or bool(np.asarray(predicate(batch)).any()):
        raise IngestFailure(message)
    return batch


def _nest(path: list[str], value):
    for k in reversed(path):
        value = {k: value}
    return value


def p_dot_expander(batch, field, path_separator="."):
    """`dot_expander`: turn a dotted column 'a.b.c' into a dict-valued
    column 'a' = {'b': {'c': v}}, merging into an existing dict column."""
    root, rest = field.split(path_separator, 1)
    path = rest.split(path_separator)

    def merge(existing, v):
        base = dict(existing) if isinstance(existing, dict) else {}
        cur = base
        for k in path[:-1]:
            nxt = cur.get(k)
            cur[k] = dict(nxt) if isinstance(nxt, dict) else {}
            cur = cur[k]
        cur[path[-1]] = v
        return base

    if root in batch.columns:
        batch[root] = [merge(e, v) for e, v in zip(batch[root], batch[field])]
    else:
        batch[root] = [_nest(path, v) for v in batch[field]]
    return batch.drop(columns=[field])


def p_date_index_name(batch, field, date_rounding="d", index_name_prefix="",
                      index_name_format=None, target="_index"):
    """`date_index_name`: compute the destination index name from a date
    field rounded to y/M/w/d/h/m/s (DateIndexNameProcessor.java)."""
    freq = {"y": "Y", "M": "M", "w": "W", "d": "D", "h": "h", "m": "min", "s": "s"}[
        date_rounding
    ]
    fmt = index_name_format or {
        "y": "%Y", "M": "%Y-%m", "w": "%Y-%m-%d", "d": "%Y-%m-%d",
        "h": "%Y-%m-%d-%H", "m": "%Y-%m-%d-%H-%M", "s": "%Y-%m-%d-%H-%M-%S",
    }[date_rounding]
    dt = pd.to_datetime(batch[field])
    rounded = dt.dt.to_period(freq).dt.start_time
    batch[target] = index_name_prefix + rounded.dt.strftime(fmt)
    return batch


# minimal public-suffix list for the registered_domain processor — the
# reference bundles the full Mozilla PSL; this covers the common
# multi-label suffixes and falls back to the last label
_TWO_LABEL_SUFFIXES = {
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.jp", "or.jp", "ne.jp", "ac.jp", "go.jp",
    "co.nz", "net.nz", "org.nz", "co.in", "net.in", "org.in",
    "com.br", "net.br", "org.br", "com.cn", "net.cn", "org.cn",
    "com.mx", "com.sg", "com.hk", "co.kr", "co.za",
}


def p_registered_domain(batch, field, target_prefix=""):
    """`registered_domain` (RegisteredDomainProcessor.java): split an
    FQDN into top_level_domain / registered_domain / subdomain / domain
    using a built-in suffix table (PSL subset)."""

    def split(fqdn):
        fqdn = str(fqdn).strip(".").lower()
        labels = fqdn.split(".")
        if len(labels) < 2:
            return fqdn, None, None, None
        two = ".".join(labels[-2:])
        tld = two if two in _TWO_LABEL_SUFFIXES else labels[-1]
        ntld = tld.count(".") + 1
        if len(labels) <= ntld:
            return fqdn, tld, None, None
        reg = ".".join(labels[-(ntld + 1):])
        sub = ".".join(labels[: -(ntld + 1)]) or None
        return fqdn, tld, reg, sub

    parts = batch[field].map(split)
    batch[target_prefix + "domain"] = parts.map(lambda p: p[0])
    batch[target_prefix + "top_level_domain"] = parts.map(lambda p: p[1])
    batch[target_prefix + "registered_domain"] = parts.map(lambda p: p[2])
    batch[target_prefix + "subdomain"] = parts.map(lambda p: p[3])
    return batch


def p_community_id(batch, source_ip="source_ip", source_port="source_port",
                   dest_ip="dest_ip", dest_port="dest_port",
                   iana_number="transport", seed=0, target="community_id"):
    """`community_id` (CommunityIdProcessor.java): the Community ID v1
    flow hash — '1:' + base64(sha1(seed . saddr . daddr . proto . 0 .
    sport . dport)) with the endpoint pair canonically ordered
    (corelight/community-id-spec). TCP(6)/UDP(17)/SCTP(132) tuples."""
    import base64
    import socket
    import struct

    def cid(sip, sp, dip, dp, proto):
        try:
            sa, da = socket.inet_aton(str(sip)), socket.inet_aton(str(dip))
        except OSError:
            return None
        sp, dp, proto = int(sp), int(dp), int(proto)
        if (sa, sp) > (da, dp):
            sa, da, sp, dp = da, sa, dp, sp
        h = hashlib.sha1()
        h.update(struct.pack("!H", seed) + sa + da
                 + struct.pack("!BBHH", proto, 0, sp, dp))
        return "1:" + base64.b64encode(h.digest()).decode()

    batch[target] = [
        cid(a, b, c, d, e)
        for a, b, c, d, e in zip(batch[source_ip], batch[source_port],
                                 batch[dest_ip], batch[dest_port],
                                 batch[iana_number])
    ]
    return batch


def p_network_direction(batch, source_ip="source_ip", dest_ip="dest_ip",
                        internal_networks=("10.0.0.0/8", "172.16.0.0/12",
                                           "192.168.0.0/16"),
                        target="network_direction"):
    """`network_direction` (NetworkDirectionProcessor.java): classify a
    flow as inbound/outbound/internal/external against the configured
    internal CIDR ranges."""
    import ipaddress

    nets = [ipaddress.ip_network(n) for n in internal_networks]

    def internal(ip):
        try:
            a = ipaddress.ip_address(str(ip))
        except ValueError:
            return False
        return any(a in n for n in nets)

    def direction(s, d):
        si, di = internal(s), internal(d)
        if si and di:
            return "internal"
        if si:
            return "outbound"
        if di:
            return "inbound"
        return "external"

    batch[target] = [direction(s, d) for s, d in zip(batch[source_ip], batch[dest_ip])]
    return batch


# ---------------------------------------------------------------------------
# Arrow tier: the same processors as pyarrow.compute kernels over a
# zero-copy pa.Table. Null handling mirrors the pandas tier's
# `_series` contract (cast to string, nulls -> "").
# ---------------------------------------------------------------------------


def _astr(t: pa.Table, field: str) -> pa.ChunkedArray:
    return pc.fill_null(pc.cast(t[field], pa.string()), "")


def _put(t: pa.Table, name: str, arr) -> pa.Table:
    if name in t.column_names:
        return t.set_column(t.column_names.index(name), name, arr)
    return t.append_column(name, arr)


def a_set(t, field, value):
    return _put(t, field, pa.array([value] * t.num_rows))


def a_remove(t, field):
    return t.drop_columns([field])


def a_rename(t, field, target):
    return t.rename_columns([target if c == field else c for c in t.column_names])


# code points whose FULL case mapping (Python/Java, the reference's
# Locale.ROOT behavior) differs from Arrow's simple per-code-point
# mapping: sharp s, the Latin/Armenian ligatures, and the handful of
# decomposing forms. Rows containing one take a Python fallback; all
# other rows stay on the vectorized kernel (the a_urldecode pattern).
_UPPER_SPECIAL_RX = "[ßﬀ-ﬆŉǰΐΰևẖẗẘẙẚ]"
_LOWER_SPECIAL_RX = "[İ]"


def _full_case(arr, upper: bool):
    out = pc.utf8_upper(arr) if upper else pc.utf8_lower(arr)
    m = pc.match_substring_regex(
        arr, _UPPER_SPECIAL_RX if upper else _LOWER_SPECIAL_RX)
    if not pc.any(m).as_py():
        return out
    vals = arr.to_pylist()
    mask = m.to_pylist()
    fixed = out.to_pylist()
    for i, (v, mk) in enumerate(zip(vals, mask)):
        if mk:
            fixed[i] = v.upper() if upper else v.lower()
    return pa.array(fixed, pa.string())


def a_lowercase(t, field, target=None):
    return _put(t, target or field, _full_case(_astr(t, field), False))


def a_uppercase(t, field, target=None):
    return _put(t, target or field, _full_case(_astr(t, field), True))


def a_trim(t, field, target=None):
    return _put(t, target or field, pc.utf8_trim_whitespace(_astr(t, field)))


def a_gsub(t, field, pattern, replacement, target=None):
    out = pc.replace_substring_regex(_astr(t, field), pattern=pattern,
                                     replacement=replacement)
    return _put(t, target or field, out)


def a_split(t, field, separator, target=None):
    return _put(t, target or field,
                pc.split_pattern(_astr(t, field), pattern=separator))


def a_join(t, field, separator, target=None):
    return _put(t, target or field, pc.binary_join(t[field], separator))


_ARROW_TYPES = {"integer": pa.int64(), "long": pa.int64(),
                "float": pa.float64(), "double": pa.float64(),
                "string": pa.string(), "boolean": pa.bool_()}


def a_convert(t, field, type, target=None):
    return _put(t, target or field, pc.cast(t[field], _ARROW_TYPES[type]))


def a_fingerprint(t, fields, target="fingerprint", method="md5"):
    cols = [pc.cast(t[f], pa.string()) for f in fields]
    joined = cols[0] if len(cols) == 1 else pc.binary_join_element_wise(*cols, "|")
    h = getattr(hashlib, method)
    out = [h(s.encode()).hexdigest() if s is not None else None
           for s in joined.to_pylist()]
    return _put(t, target, pa.array(out, pa.string()))


def a_append(t, field, value, target=None):
    """Append one scalar to every row of a list column — rebuilt from
    flat values + shifted offsets, no per-row Python."""
    col = t[field].combine_chunks()
    if isinstance(col, pa.ChunkedArray):  # zero chunks edge
        col = pa.concat_arrays(col.chunks) if col.chunks else pa.array([], pa.list_(pa.string()))
    n = len(col)
    offsets = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    values = col.values
    new_vals_parts = []
    new_offsets = offsets + np.arange(n + 1, dtype=np.int64)
    ins = pa.array([value], values.type)
    for i in range(n):
        new_vals_parts.append(values.slice(offsets[i], offsets[i + 1] - offsets[i]))
        new_vals_parts.append(ins)
    new_values = pa.concat_arrays(new_vals_parts) if new_vals_parts else ins.slice(0, 0)
    out = pa.ListArray.from_arrays(pa.array(new_offsets, pa.int32()), new_values)
    return _put(t, target or field, out)


_BYTES_RX = r"^(?P<num>\d+(?:\.\d+)?)\s*(?P<unit>gb|mb|kb|b)?$"
_BYTES_MULT = {"": 1, "b": 1, "kb": 1024, "mb": 1024**2, "gb": 1024**3}


def a_bytes(t, field, target=None):
    s = pc.utf8_lower(pc.utf8_trim_whitespace(_astr(t, field)))
    ex = pc.extract_regex(s, _BYTES_RX)
    num = pc.cast(pc.struct_field(ex, "num"), pa.float64())
    unit = pc.struct_field(ex, "unit")
    mult_keys = pa.array(list(_BYTES_MULT), pa.string())
    mult_vals = np.array(list(_BYTES_MULT.values()), np.float64)
    idx = pc.index_in(unit, mult_keys).to_numpy(zero_copy_only=False)
    mult = pa.array(mult_vals[np.where(np.isnan(idx.astype(np.float64)), 0, idx).astype(np.int64)])
    # int() truncation semantics ("0.5b" -> 0), like the pandas tier
    out = pc.cast(pc.trunc(pc.multiply(num, mult)), pa.int64())
    return _put(t, target or field, out)


def a_date(t, field, target=None, unit="ms"):
    col = t[field]
    if pa.types.is_integer(col.type) or pa.types.is_floating(col.type):
        out = pc.cast(pc.cast(col, pa.int64()), pa.timestamp(unit))
    else:
        out = pc.cast(col, pa.timestamp("us"))  # ISO-8601 parse
    return _put(t, target or field, out)


def a_urldecode(t, field, target=None):
    s = _astr(t, field)
    # fast path: percent-decode only the rows that contain '%'
    has = pc.match_substring(s, "%")
    if not pc.any(has).as_py():
        return _put(t, target or field, s)
    vals = s.to_pylist()
    mask = has.to_pylist()
    out = [urllib.parse.unquote(v) if m else v for v, m in zip(vals, mask)]
    return _put(t, target or field, pa.array(out, pa.string()))


def a_uri_parts(t, field, prefix="uri_"):
    ex = pc.extract_regex(_astr(t, field), _URI_RX.pattern)
    for part in ("scheme", "host", "path", "query"):
        t = _put(t, prefix + part,
                 pc.fill_null(pc.struct_field(ex, part), ""))
    return t


def a_date_index_name(t, field, date_rounding="d", index_name_prefix="",
                      index_name_format=None, target="_index"):
    unit = {"y": "year", "M": "month", "w": "week", "d": "day",
            "h": "hour", "m": "minute", "s": "second"}[date_rounding]
    fmt = index_name_format or {
        "y": "%Y", "M": "%Y-%m", "w": "%Y-%m-%d", "d": "%Y-%m-%d",
        "h": "%Y-%m-%d-%H", "m": "%Y-%m-%d-%H-%M", "s": "%Y-%m-%d-%H-%M-%S",
    }[date_rounding]
    col = t[field]
    if not pa.types.is_timestamp(col.type):
        col = pc.cast(col, pa.timestamp("us"))
    rounded = pc.floor_temporal(col, unit=unit)
    names = pc.strftime(rounded, format=fmt)
    if index_name_prefix:
        names = pc.binary_join_element_wise(
            pa.array([index_name_prefix] * t.num_rows), names, "")
    return _put(t, target, names)


def _compile_named_regex(pattern: str, lib: dict | None = None,
                         grok: bool = False, anchor: bool = False):
    """Compile a dissect/grok pattern to an RE2-compatible regex string
    with named groups, or return None if RE2 rejects it."""
    if grok:
        bank = dict(GROK_BUILTIN_PATTERNS)
        if lib:
            bank.update(lib)

        def sub(m):
            name, _, alias = m.group(1).partition(":")
            body = bank[name]
            return f"(?P<{alias}>{body})" if alias else f"(?:{body})"

        rx = re.sub(r"%\{([^}]+)\}", sub, pattern)
    else:
        parts = re.split(r"(%\{[^}]+\})", pattern)
        rx = ""
        for p in parts:
            if p.startswith("%{") and p.endswith("}"):
                rx += f"(?P<{p[2:-1]}>.*?)"
            else:
                rx += re.escape(p)
        if anchor:
            rx = "^" + rx + "$"
    try:
        pc.extract_regex(pa.array([], pa.string()), rx)
    except Exception:
        return None
    return rx


def a_dissect(t, field, pattern):
    rx = _compile_named_regex(pattern, anchor=True)
    if rx is None:  # RE2 can't express it: per-batch pandas fallback
        return pa.Table.from_pandas(
            p_dissect(t.to_pandas(), field, pattern), preserve_index=False)
    ex = pc.extract_regex(_astr(t, field), rx)
    for k in re.compile(rx).groupindex:
        t = _put(t, k, pc.struct_field(ex, k))
    return t


def a_grok(t, field, pattern, patterns: dict | None = None):
    rx = _compile_named_regex(pattern, lib=patterns, grok=True)
    if rx is None:
        return pa.Table.from_pandas(
            p_grok(t.to_pandas(), field, pattern, patterns=patterns),
            preserve_index=False)
    ex = pc.extract_regex(_astr(t, field), rx)
    for k in re.compile(rx).groupindex:
        t = _put(t, k, pc.struct_field(ex, k))
    return t


def a_html_strip(t, field, target=None):
    """html_strip over an Arrow batch: the extractor itself is the
    byte-identical load-bearing path (html_strip.py); membership in the
    Arrow tier keeps a pipeline containing it on zero-copy tables."""
    from raydex.analysis.html_strip import extract_text_many

    col = t[field]
    vals = col.to_pylist()
    out = extract_text_many([v if v is not None else b"" for v in vals])
    return _put(t, target or field, pa.array(out, pa.large_string()))


def a_registered_domain(t, field, target_prefix=""):
    """registered_domain on Arrow kernels: last-1/2/3-label extraction
    via RE2, suffix-table membership via index_in, selection via
    if_else — no per-row Python."""
    s = pc.utf8_lower(pc.utf8_trim(_astr(t, field), "."))
    l1 = pc.struct_field(pc.extract_regex(s, r"(?P<g>[^.]+)$"), "g")
    l2 = pc.struct_field(pc.extract_regex(s, r"(?P<g>[^.]+\.[^.]+)$"), "g")
    l3 = pc.struct_field(
        pc.extract_regex(s, r"(?P<g>[^.]+\.[^.]+\.[^.]+)$"), "g")
    sub1 = pc.struct_field(
        pc.extract_regex(s, r"^(?P<g>.*)\.[^.]+\.[^.]+$"), "g")
    sub2 = pc.struct_field(
        pc.extract_regex(s, r"^(?P<g>.*)\.[^.]+\.[^.]+\.[^.]+$"), "g")
    suffixes = pa.array(sorted(_TWO_LABEL_SUFFIXES), pa.string())
    two = pc.is_valid(pc.index_in(l2, suffixes))
    has_dot = pc.match_substring(s, ".")
    tld = pc.if_else(has_dot, pc.if_else(two, l2, l1),
                     pa.nulls(t.num_rows, pa.string()))
    registered = pc.if_else(two, l3, l2)
    registered = pc.if_else(has_dot, registered,
                            pa.nulls(t.num_rows, pa.string()))
    sub = pc.if_else(two, sub2, sub1)
    sub = pc.if_else(pc.is_valid(registered), sub,
                     pa.nulls(t.num_rows, pa.string()))
    t = _put(t, target_prefix + "domain", s)
    t = _put(t, target_prefix + "top_level_domain", tld)
    t = _put(t, target_prefix + "registered_domain", registered)
    return _put(t, target_prefix + "subdomain", sub)


ARROW_PROCESSORS = {
    "set": a_set, "remove": a_remove, "rename": a_rename,
    "lowercase": a_lowercase, "uppercase": a_uppercase, "trim": a_trim,
    "gsub": a_gsub, "split": a_split, "join": a_join, "convert": a_convert,
    "fingerprint": a_fingerprint, "append": a_append, "bytes": a_bytes,
    "date": a_date, "urldecode": a_urldecode, "uri_parts": a_uri_parts,
    "date_index_name": a_date_index_name,
    "dissect": a_dissect, "grok": a_grok, "html_strip": a_html_strip,
    "registered_domain": a_registered_domain,
}


# ---------------------------------------------------------------------------
# geoip / user_agent processor shells (modules/ingest-geoip,
# modules/ingest-user-agent): pluggable databases with tiny bundled
# test data. The reference ships MaxMind mmdb + the uap-core regex
# bank (both public formats); the shells keep the exact API surface —
# database_file selection, properties filtering, target_field layout —
# with a CIDR-range table / compiled-regex bank as the database.
# ---------------------------------------------------------------------------


class GeoIpDatabase:
    """CIDR-range -> attributes table with vectorized longest-prefix
    lookup (sorted range starts + searchsorted; one containment check).
    Rows: (cidr, {country_iso_code, country_name, continent_name,
    city_name, location}). Register real GeoLite2-CSV-shaped data via
    register_geoip_database."""

    def __init__(self, rows: list[tuple[str, dict]]):
        import ipaddress

        nets = []
        for cidr, attrs in rows:
            n = ipaddress.ip_network(cidr)
            nets.append((int(n.network_address),
                         int(n.broadcast_address), attrs))
        nets.sort()
        self.starts = np.array([n[0] for n in nets], dtype=np.int64)
        self.ends = np.array([n[1] for n in nets], dtype=np.int64)
        self.attrs = [n[2] for n in nets]

    def lookup_many(self, ips) -> list[dict | None]:
        import socket
        import struct as _struct

        vals = np.zeros(len(ips), dtype=np.int64)
        ok = np.zeros(len(ips), dtype=bool)
        for i, ip in enumerate(ips):
            try:
                vals[i] = _struct.unpack(
                    "!I", socket.inet_aton(str(ip)))[0]
                ok[i] = True
            except OSError:
                pass
        idx = np.searchsorted(self.starts, vals, side="right") - 1
        out: list[dict | None] = [None] * len(ips)
        for i in range(len(ips)):
            j = int(idx[i])
            if ok[i] and j >= 0 and vals[i] <= self.ends[j]:
                out[i] = self.attrs[j]
        return out


# bundled test database: documentation/TEST-NET ranges + two well-known
# public resolver blocks (the shape GeoLite2-Country/City CSV carries)
_GEOIP_TEST_DB = GeoIpDatabase([
    ("192.0.2.0/24", {"country_iso_code": "US", "country_name":
                      "United States", "continent_name": "North America",
                      "city_name": "Test City",
                      "location": {"lat": 37.751, "lon": -97.822}}),
    ("198.51.100.0/24", {"country_iso_code": "DE", "country_name":
                         "Germany", "continent_name": "Europe",
                         "city_name": "Berlin",
                         "location": {"lat": 52.52, "lon": 13.405}}),
    ("203.0.113.0/24", {"country_iso_code": "JP", "country_name":
                        "Japan", "continent_name": "Asia",
                        "city_name": "Tokyo",
                        "location": {"lat": 35.689, "lon": 139.692}}),
    ("8.8.8.0/24", {"country_iso_code": "US", "country_name":
                    "United States", "continent_name": "North America",
                    "city_name": None,
                    "location": {"lat": 37.751, "lon": -97.822}}),
    ("1.1.1.0/24", {"country_iso_code": "AU", "country_name":
                    "Australia", "continent_name": "Oceania",
                    "city_name": None,
                    "location": {"lat": -33.494, "lon": 143.2104}}),
])

_GEOIP_DBS: dict[str, GeoIpDatabase] = {
    "GeoLite2-City.mmdb": _GEOIP_TEST_DB, "test": _GEOIP_TEST_DB}


def register_geoip_database(name: str, db: GeoIpDatabase) -> None:
    _GEOIP_DBS[name] = db


def p_geoip(batch, field, target_field="geoip",
            database_file="GeoLite2-City.mmdb", properties=None):
    """`geoip` processor (GeoIpProcessor.java): decorate each row with
    the database attributes of its IP. Unmatched/private IPs yield None
    (the reference drops the field). ``properties`` filters the emitted
    keys like the processor option of the same name."""
    db = _GEOIP_DBS[database_file]
    rows = db.lookup_many(batch[field].tolist())
    if properties:
        props = set(properties)
        rows = [None if r is None else
                {k: v for k, v in r.items() if k in props} for r in rows]
    batch[target_field] = rows
    return batch


# user_agent: compiled pattern bank in uap-core's spirit (family
# regex -> replacement), covering the major browser/OS/device families
_UA_BROWSERS = [
    (re.compile(r"Edg(?:e|A|iOS)?/(\d+)\.(\d+)"), "Edge"),
    (re.compile(r"OPR/(\d+)\.(\d+)"), "Opera"),
    (re.compile(r"Chrome/(\d+)\.(\d+)"), "Chrome"),
    (re.compile(r"CriOS/(\d+)\.(\d+)"), "Chrome Mobile iOS"),
    (re.compile(r"Firefox/(\d+)\.(\d+)"), "Firefox"),
    (re.compile(r"Version/(\d+)\.(\d+).*Safari/"), "Safari"),
    (re.compile(r"MSIE (\d+)\.(\d+)"), "IE"),
    (re.compile(r"Trident/.*rv:(\d+)\.(\d+)"), "IE"),
    (re.compile(r"curl/(\d+)\.(\d+)"), "curl"),
    (re.compile(r"(?:bot|Bot|spider|crawler)[/ ]?(\d+)?\.?(\d+)?"),
     "Spider"),
]
_UA_OS = [
    (re.compile(r"Windows NT 10\.0"), "Windows", "10"),
    (re.compile(r"Windows NT 6\.3"), "Windows", "8.1"),
    (re.compile(r"Windows NT 6\.1"), "Windows", "7"),
    (re.compile(r"Mac OS X (\d+)[._](\d+)"), "Mac OS X", None),
    (re.compile(r"Android (\d+)(?:\.(\d+))?"), "Android", None),
    (re.compile(r"(?:iPhone|CPU) OS (\d+)_(\d+)"), "iOS", None),
    (re.compile(r"Linux"), "Linux", None),
]
_UA_DEVICES = [
    (re.compile(r"iPhone"), "iPhone"),
    (re.compile(r"iPad"), "iPad"),
    (re.compile(r"Android.*Mobile"), "Generic Smartphone"),
    (re.compile(r"Android"), "Generic Tablet"),
]


def parse_user_agent(ua: str) -> dict:
    """One UA string -> the reference processor's output shape
    (UserAgentProcessor.java: name/version/os/device)."""
    ua = str(ua or "")
    out = {"name": "Other", "version": None,
           "os": {"name": "Other", "version": None},
           "device": {"name": "Other"}}
    for rx, name in _UA_BROWSERS:
        m = rx.search(ua)
        if m:
            out["name"] = name
            g = [x for x in m.groups() if x]
            if g:
                out["version"] = ".".join(g)
            break
    for rx, name, fixed in _UA_OS:
        m = rx.search(ua)
        if m:
            out["os"]["name"] = name
            if fixed is not None:
                out["os"]["version"] = fixed
            elif m.groups():
                out["os"]["version"] = ".".join(
                    x for x in m.groups() if x)
            break
    for rx, name in _UA_DEVICES:
        if rx.search(ua):
            out["device"]["name"] = name
            break
    return out


def p_user_agent(batch, field, target_field="user_agent",
                 properties=None):
    """`user_agent` processor (IngestUserAgentPlugin /
    UserAgentProcessor.java): parse browser/OS/device out of a UA
    string via the compiled pattern bank."""
    rows = [parse_user_agent(v) for v in batch[field]]
    if properties:
        props = set(properties)
        rows = [{k: v for k, v in r.items() if k in props} for r in rows]
    batch[target_field] = rows
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
    "sort": p_sort, "fail": p_fail, "dot_expander": p_dot_expander,
    "date_index_name": p_date_index_name,
    "registered_domain": p_registered_domain,
    "community_id": p_community_id,
    "network_direction": p_network_direction,
    "geoip": p_geoip, "user_agent": p_user_agent,
}


def register_processor(name: str, fn) -> None:
    PROCESSORS[name] = fn


def compile_pipeline(steps: list[tuple[str, dict]], on_failure=None):
    """CompoundProcessor analogue: one composed batch fn.

    ``on_failure``: optional handler step list (the pipeline-level
    `on_failure` block, ``CompoundProcessor.java`` failure path) — when
    a processor raises, the ORIGINAL batch re-runs through the handler
    with the failure metadata columns the reference exposes
    (`_ingest.on_failure_message` / `_on_failure_processor_type`).
    Granularity is the batch (this engine's unit of work), documented
    deviation from the reference's per-document handling."""
    fns = [(name, PROCESSORS[name], kw) for name, kw in steps]
    fail_fns = ([(PROCESSORS[n], kw) for n, kw in on_failure]
                if on_failure else None)

    def run(batch: pd.DataFrame) -> pd.DataFrame:
        # processors may mutate in place: keep a real copy for the
        # failure path so the handler sees the PRE-pipeline state
        original = batch.copy() if fail_fns is not None else batch
        for name, fn, kw in fns:
            try:
                batch = fn(batch, **kw)
            except Exception as e:
                if fail_fns is None:
                    raise
                out = original.copy()
                out["_ingest.on_failure_message"] = str(e)
                out["_ingest.on_failure_processor_type"] = name
                for ffn, fkw in fail_fns:
                    out = ffn(out, **fkw)
                return out
        return batch

    return run


def compile_pipeline_arrow(steps: list[tuple[str, dict]], on_failure=None):
    """Arrow-tier CompoundProcessor: one composed pa.Table -> pa.Table
    fn. Tables are immutable, so the failure path needs no defensive
    copy of the pre-pipeline state."""
    fns = [(name, ARROW_PROCESSORS[name], kw) for name, kw in steps]
    fail_fns = ([(ARROW_PROCESSORS[n], kw) for n, kw in on_failure]
                if on_failure else None)

    def run(t: pa.Table) -> pa.Table:
        original = t
        for name, fn, kw in fns:
            try:
                t = fn(t, **kw)
            except Exception as e:
                if fail_fns is None:
                    raise
                out = original
                out = _put(out, "_ingest.on_failure_message",
                           pa.array([str(e)] * out.num_rows))
                out = _put(out, "_ingest.on_failure_processor_type",
                           pa.array([name] * out.num_rows))
                for ffn, fkw in fail_fns:
                    out = ffn(out, **fkw)
                return out
        return t

    return run


def _arrow_capable(steps, on_failure=None) -> bool:
    for name, kw in list(steps) + list(on_failure or []):
        if name not in ARROW_PROCESSORS:
            return False
        if name == "convert" and kw.get("type") not in _ARROW_TYPES:
            return False  # ip/auto are pandas-tier (per-value dispatch)
    return True


def apply_pipeline(ds, steps: list[tuple[str, dict]], batch_size: int = 4096,
                   on_failure=None):
    """Run an ingest pipeline over a Dataset. Hot path: when every step
    has a ``pyarrow.compute`` implementation the whole pipeline runs
    zero-copy Arrow (``batch_format="pyarrow"``); otherwise it falls
    back to the pandas tier (script/foreach/kv/csv/object-valued
    processors)."""
    if _arrow_capable(steps, on_failure):
        return ds.map_batches(
            compile_pipeline_arrow(steps, on_failure=on_failure),
            batch_format="pyarrow", batch_size=batch_size,
        )
    return ds.map_batches(
        compile_pipeline(steps, on_failure=on_failure),
        batch_format="pandas", batch_size=batch_size,
    )


def simulate_pipeline(steps: list[tuple[str, dict]], docs: list[dict],
                      verbose: bool = False, on_failure=None) -> list:
    """`POST _ingest/pipeline/_simulate` analogue: run the pipeline over
    a handful of docs locally (no Ray) and return the transformed docs;
    ``verbose=True`` additionally returns per-processor intermediate
    states (the reference's verbose processor_results)."""
    batch = pd.DataFrame(docs)
    if not verbose:
        out = compile_pipeline(steps, on_failure=on_failure)(batch)
        return out.to_dict("records")
    trace: list[dict] = []
    for name, kw in steps:
        try:
            batch = PROCESSORS[name](batch.copy(), **kw)
            trace.append({"processor_type": name, "status": "success",
                          "docs": batch.to_dict("records")})
        except Exception as e:
            trace.append({"processor_type": name, "status": "error",
                          "error": str(e)})
            break
    return trace
