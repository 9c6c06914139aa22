"""Index introspection + mapping APIs: `_segments`, `_stats`,
`GET _mapping`, `GET _mapping/field/<fields>`, additive `PUT _mapping`.

Reference shapes: IndicesSegmentsAction (per-shard segment rows with
doc counts / deleted docs / sizes), IndicesStatsAction (docs.count,
docs.deleted, store.size_in_bytes, segments.count),
GetMappingsAction / GetFieldMappingsAction (mapping JSON reconstructed
from the field mappers), TransportPutMappingAction (merge validation:
new fields append, conflicting type changes reject —
MapperService.merge semantics).
"""

from __future__ import annotations

import json
import os

import numpy as np

# FieldSpec analyzer kind -> mapping `type` (the inverse of the
# build-side FieldSpec dispatch; text analyzers fall through to `text`
# with their analyzer recorded)
_KIND_TO_TYPE = {
    "keyword": "keyword", "keywordish": "keyword",
    "long": "long", "double": "double", "date": "date",
    "boolean": "boolean", "ip": "ip", "binary": "binary",
    "version": "version", "unsigned_long": "unsigned_long",
    "byte": "byte", "short": "short", "integer": "integer",
    "float": "float", "half_float": "half_float",
    "scaled_float": "scaled_float", "token_count": "token_count",
    "murmur3": "murmur3", "rank_feature": "rank_feature",
    "dense_vector": "dense_vector", "completion": "completion",
    "geo_point": "geo_point", "geo_shape": "geo_shape",
    "long_range": "long_range", "double_range": "double_range",
    "date_range": "date_range", "ip_range": "ip_range",
    "wildcard": "wildcard", "join": "join",
}


def _load_manifest(index_dir: str) -> dict:
    with open(os.path.join(index_dir, "index_manifest.json")) as f:
        return json.load(f)


def _seg_dir(index_dir: str, part: int, seg_id: str) -> str:
    return os.path.join(index_dir, f"part={part:05d}", seg_id)


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for fn in files:
            try:
                total += os.path.getsize(os.path.join(root, fn))
            except OSError:
                pass
    return total


def _deleted_count(seg_dir: str) -> int:
    p = os.path.join(seg_dir, "livedocs.npy")
    if not os.path.exists(p):
        return 0
    live = np.load(p)
    return int((~live).sum())


def index_segments(index_dir: str) -> dict:
    """`GET <index>/_segments` analogue: per-partition segment rows
    with live/deleted doc counts and on-disk size."""
    man = _load_manifest(index_dir)
    shards: dict[int, list[dict]] = {}
    for seg in man.get("segments", []):
        part = int(seg["part"])
        sd = _seg_dir(index_dir, part, seg["seg_id"])
        deleted = _deleted_count(sd)
        shards.setdefault(part, []).append({
            "segment": seg["seg_id"],
            "num_docs": int(seg["doc_count"]) - deleted,
            "deleted_docs": deleted,
            "size_in_bytes": _dir_bytes(sd),
            "term_count": int(seg.get("term_count", 0)),
            "committed": True,
            "search": True,
        })
    return {"indices": {index_dir: {"shards": {
        str(p): segs for p, segs in sorted(shards.items())}}}}


def index_stats(index_dir: str) -> dict:
    """`GET <index>/_stats` analogue (docs/store/segments groups)."""
    segs = index_segments(index_dir)["indices"][index_dir]["shards"]
    num_docs = deleted = size = count = 0
    for rows in segs.values():
        for r in rows:
            num_docs += r["num_docs"]
            deleted += r["deleted_docs"]
            size += r["size_in_bytes"]
            count += 1
    return {
        "_all": {"primaries": {
            "docs": {"count": num_docs, "deleted": deleted},
            "store": {"size_in_bytes": size},
            "segments": {"count": count},
        }},
    }


def get_mapping(index_dir: str) -> dict:
    """`GET <index>/_mapping` analogue: reconstruct the mapping JSON
    from the stored FieldSpecs (+ the default text/url fields every
    index carries)."""
    man = _load_manifest(index_dir)
    props: dict[str, dict] = {
        "url": {"type": "keyword"},
        "text": {"type": "text", "analyzer": man.get("analyzer",
                                                     "standard_en")},
    }
    for name, spec in (man.get("fields") or {}).items():
        kind = spec.get("analyzer", "keyword")
        ftype = _KIND_TO_TYPE.get(kind)
        if ftype is None:
            entry = {"type": "text", "analyzer": kind}
        else:
            entry = {"type": ftype}
        extra = spec.get("extra") or {}
        for k in ("dims", "similarity", "scaling_factor", "relations"):
            if k in extra:
                entry[k] = extra[k]
        props[name] = entry
    return {index_dir: {"mappings": {"properties": props}}}


def get_field_mapping(index_dir: str, fields: list[str]) -> dict:
    """`GET <index>/_mapping/field/<fields>` (glob-aware)."""
    import fnmatch

    props = get_mapping(index_dir)[index_dir]["mappings"]["properties"]
    out = {}
    for pat in fields:
        for name, entry in props.items():
            if fnmatch.fnmatchcase(name, pat):
                out[name] = {"full_name": name,
                             "mapping": {name.split(".")[-1]: entry}}
    return {index_dir: {"mappings": out}}


def put_mapping(index_dir: str, properties: dict) -> dict:
    """Additive `PUT _mapping`: append NEW FieldSpecs to the index
    manifest (visible to later builds/merges; existing segments have
    no data for them, like a reference field added after indexing).
    A type change on an existing field rejects — MapperService.merge
    conflict semantics."""
    path = os.path.join(index_dir, "index_manifest.json")
    man = _load_manifest(index_dir)
    fields = man.setdefault("fields", {})
    type_to_kind = {v: k for k, v in reversed(list(_KIND_TO_TYPE.items()))}
    for name, entry in properties.items():
        ftype = entry.get("type", "keyword")
        kind = ("standard_en" if ftype == "text" and "analyzer" not in entry
                else entry.get("analyzer") if ftype == "text"
                else type_to_kind.get(ftype))
        if kind is None:
            raise ValueError(f"unsupported mapping type {ftype!r}")
        if name in fields:
            have = fields[name].get("analyzer")
            if have != kind:
                raise ValueError(
                    f"mapper [{name}] cannot be changed from "
                    f"[{have}] to [{kind}]")
            continue  # idempotent re-put
        if name == "text" or name == "url":
            raise ValueError(f"mapper [{name}] cannot be changed")
        fields[name] = {"source": entry.get("source", name),
                        "analyzer": kind, "positions": False,
                        "sum_dl": 0}
        # record on every existing segment that the field is mapped
        # but dataless there (queries match nothing — the reference's
        # behavior for a field added after those docs were indexed)
        for seg in man.get("segments", []):
            sd = _seg_dir(index_dir, int(seg["part"]), seg["seg_id"])
            mp = os.path.join(sd, "manifest.json")
            if not os.path.exists(mp):
                continue
            with open(mp) as f:
                sman = json.load(f)
            md = sman.setdefault("mapped_dataless", [])
            if name not in md:
                md.append(name)
                stmp = mp + ".tmp"
                with open(stmp, "w") as f:
                    json.dump(sman, f)
                os.replace(stmp, mp)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(man, f)
    os.replace(tmp, path)
    return {"acknowledged": True}
