"""Field capabilities — the `_field_caps` API (``server/.../action/
fieldcaps/``): report, per field across tables/indexes, the type and
whether it is searchable/aggregatable. For parquet tables this derives
from the Arrow schema; for a raydex index, from the index manifest.
"""

from __future__ import annotations

import pyarrow.parquet as pq

_AGGREGATABLE = {"int32", "int64", "float", "double", "timestamp[us]", "bool"}


def field_caps_for_parquet(paths: dict[str, str]) -> dict:
    """paths: table_name -> parquet path. Returns field -> caps."""
    out: dict[str, dict] = {}
    for table, path in paths.items():
        schema = pq.ParquetFile(path).schema_arrow
        for f in schema:
            typ = str(f.type)
            caps = out.setdefault(
                f.name,
                {"types": set(), "searchable": True, "aggregatable": False, "indices": []},
            )
            caps["types"].add(typ)
            caps["aggregatable"] |= typ in _AGGREGATABLE or typ == "string"
            caps["indices"].append(table)
    for caps in out.values():
        caps["types"] = sorted(caps["types"])
    return out


_FIELD_KIND_CAPS = {
    # index-time mapped field kinds -> (_field_caps type, aggregatable)
    "rank_feature": ("rank_feature", False),
    "rank_features": ("rank_features", False),
    "completion": ("completion", False),
    "dense_vector": ("dense_vector", False),
    "keyword": ("keyword", True),
    "keywordish": ("keyword", True),
    "join": ("join", False),
    "alias": ("alias", False),
    "long": ("long", True),
    "double": ("double", True),
    "date": ("date", True),
    "scaled_float": ("scaled_float", True),
    "token_count": ("long", True),
    "match_only_text": ("match_only_text", False),
    "murmur3": ("murmur3", True),
    "size": ("long", True),
    "annotated_text": ("annotated_text", False),
}


def field_caps_for_index(index_dir: str) -> dict:
    from raydex.index.build import load_index_manifest

    m = load_index_manifest(index_dir)
    out = {
        "text": {
            "types": ["text"],
            "searchable": True,
            "aggregatable": False,
            "analyzer": m["analyzer"],
            "positions": bool(m.get("positions")),
        },
        "url": {"types": ["keyword"], "searchable": True, "aggregatable": True},
        "dl": {"types": ["long"], "searchable": True, "aggregatable": True},
    }
    if m.get("index_sort"):
        out[m["index_sort"][0]] = {
            "types": ["date"], "searchable": True, "aggregatable": True,
            "index_sort": m["index_sort"],
        }
    for fname, meta in (m.get("fields") or {}).items():
        kind = meta.get("analyzer", "keywordish")
        typ, agg = _FIELD_KIND_CAPS.get(kind, ("text", False))
        caps = {"types": [typ], "searchable": True, "aggregatable": agg,
                "analyzer": kind}
        if typ == "dense_vector":
            caps["dims"] = meta.get("dims")
            caps["similarity"] = meta.get("similarity")
            caps["searchable"] = True  # knn-searchable
        out[fname] = caps
    return out


def disk_usage(index_dir: str) -> dict:
    """`_disk_usage` analogue (``action/admin/indices/diskusage``):
    per-field on-disk byte breakdown across every segment — primary
    postings/terms/positions/docs vs each mapped field's artifacts —
    plus sidecars (livedocs, url_index). Walks manifests only;
    no artifact is read."""
    import os

    from raydex.index.build import load_index_manifest, segment_dirs

    m = load_index_manifest(index_dir)
    out: dict[str, dict] = {}

    def add(field: str, kind: str, nbytes: int) -> None:
        f = out.setdefault(field, {"total_bytes": 0})
        f[kind] = f.get(kind, 0) + nbytes
        f["total_bytes"] += nbytes

    _KIND = {
        "postings.bin": "postings_bytes",
        "positions.bin": "positions_bytes",
        "terms.parquet": "terms_bytes",
        "docs.parquet": "stored_fields_bytes",
        "vectors.parquet": "vectors_bytes",
        "feature.parquet": "doc_values_bytes",
        "features.parquet": "doc_values_bytes",
        "completion.parquet": "completion_bytes",
        "livedocs.npy": "live_docs_bytes",
        "url_index.parquet": "sidecar_bytes",
        "deletes.json": "sidecar_bytes",
        "manifest.json": "sidecar_bytes",
    }
    for sd in segment_dirs(index_dir, m):
        for dirpath, _, files in os.walk(sd):
            rel = os.path.relpath(dirpath, sd)
            if rel == ".":
                field = "text"
            elif rel.startswith("field="):
                field = rel.split("=", 1)[1].split(os.sep)[0]
            else:  # merged bucket dirs etc. accrue to the primary field
                field = "text"
            for fn in files:
                add(field, _KIND.get(fn, "other_bytes"),
                    os.path.getsize(os.path.join(dirpath, fn)))
    total = sum(f["total_bytes"] for f in out.values())
    return {"fields": out, "total_bytes": total,
            "doc_count": m["doc_count"]}
