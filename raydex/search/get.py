"""Point GET by id — the document-fetch path (SURVEY §2.1 row 4).

The reference's GET (``server/.../action/get/TransportGetAction``)
routes the id to ONE shard (murmur3) and reads the doc there (realtime
variants also check the in-memory translog; raydex is a batch engine,
so visibility is at segment granularity — the refresh analogue).

raydex: route the url with the SAME murmur3 partitioner the build used
(build_params.json records num_partitions), then binary-search each of
that partition's segments — build cuts segments from a url-SORTED
stream, so per-segment urls are sorted and the lookup is O(log n) with
zero scans. Latest-wins build dedup guarantees at most one live row per
url per partition.
"""

from __future__ import annotations

import json
import os

import pyarrow.parquet as pq

from raydex.index.build import _part_dir, load_index_manifest
from raydex.partition import route_partitions


def _bisect_url(urls, target: str) -> int:
    """Binary search an Arrow string array (sorted asc) -> index or -1."""
    lo, hi = 0, len(urls)
    while lo < hi:
        mid = (lo + hi) // 2
        v = urls[mid].as_py()
        if v < target:
            lo = mid + 1
        else:
            hi = mid
    if lo < len(urls) and urls[lo].as_py() == target:
        return lo
    return -1


def _lookup_docid(seg_dir: str, d, target: str) -> int:
    """Docid of ``target`` in one segment, or -1. Index-SORTED segments
    store docs in sort-field order, so the bisect runs over the
    ``url_index.parquet`` sidecar (url sorted -> docid) instead of the
    docs table — the same one-bisect contract either way."""
    ui = os.path.join(seg_dir, "url_index.parquet")
    if os.path.exists(ui):
        t = pq.read_table(ui)
        j = _bisect_url(t["url"].combine_chunks(), target)
        return int(t["docid"][j].as_py()) if j >= 0 else -1
    return _bisect_url(d["url"].combine_chunks(), target)


def get_doc(index_dir: str, url: str, columns: list[str] | None = None,
            routing: str | None = None) -> dict | None:
    """GET one document by id (url). Reads ONLY the routed partition's
    docs tables; returns the stored row dict or None. ``routing``
    overrides the partition key (the ``?routing=`` parameter — child
    docs of a join field live in their PARENT's partition)."""
    manifest = load_index_manifest(index_dir)
    params_path = os.path.join(index_dir, "build_params.json")
    if os.path.exists(params_path):
        with open(params_path) as f:
            num_partitions = json.load(f)["num_partitions"]
    else:
        num_partitions = manifest["num_partitions"]
    part = int(route_partitions([routing or url], num_partitions)[0])
    for r in manifest["segments"]:
        if r["part"] != part:
            continue
        seg_dir = os.path.join(_part_dir(index_dir, part), r["seg_id"])
        d = pq.read_table(
            os.path.join(seg_dir, "docs.parquet"), columns=columns
        )
        i = _lookup_docid(seg_dir, d, url)
        if i >= 0:
            if not _is_live(seg_dir, i):
                # deleted copy; another segment of this partition may
                # hold the live one (split->shrink round-trips leave
                # dead duplicates until a compacting merge)
                continue
            row = {c: d[c][i].as_py() for c in d.column_names}
            row["_seg_id"] = r["seg_id"]
            row["_docid"] = i
            return row
    return None


def _is_live(seg_dir: str, docid: int) -> bool:
    lp = os.path.join(seg_dir, "livedocs.npy")
    if not os.path.exists(lp):
        return True
    import numpy as np

    return bool(np.load(lp, mmap_mode="r")[docid])


def mget(index_dir: str, urls: list[str], columns: list[str] | None = None,
         routing: list[str] | None = None) -> list:
    """`_mget`: batched GET — groups ids by routed partition so each
    partition's doc tables are read once. ``routing``: optional
    per-id routing keys (parallel to ``urls``)."""
    manifest = load_index_manifest(index_dir)
    params_path = os.path.join(index_dir, "build_params.json")
    if os.path.exists(params_path):
        with open(params_path) as f:
            num_partitions = json.load(f)["num_partitions"]
    else:
        num_partitions = manifest["num_partitions"]
    parts = route_partitions(
        [r or u for r, u in zip(routing, urls)] if routing else urls,
        num_partitions)
    by_part: dict[int, list[int]] = {}
    for i, p in enumerate(parts):
        by_part.setdefault(int(p), []).append(i)
    out: list = [None] * len(urls)
    for part, idxs in by_part.items():
        segs = [r for r in manifest["segments"] if r["part"] == part]
        tables = []
        for r in segs:
            seg_dir = os.path.join(_part_dir(index_dir, part), r["seg_id"])
            tables.append(
                (r["seg_id"], seg_dir,
                 pq.read_table(os.path.join(seg_dir, "docs.parquet"),
                               columns=columns))
            )
        for i in idxs:
            u = urls[i]
            for seg_id, seg_dir, d in tables:
                j = _lookup_docid(seg_dir, d, u)
                if j >= 0:
                    if not _is_live(seg_dir, j):
                        continue  # deleted copy; a live one may exist
                    row = {c: d[c][j].as_py() for c in d.column_names}
                    row["_seg_id"] = seg_id
                    row["_docid"] = j
                    out[i] = row
                    break
    return out
