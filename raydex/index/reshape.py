"""Index reshape operations: `_clone`, `_shrink`, `_split`.

The reference implements all three without re-indexing
(``server/.../action/admin/indices/shrink/TransportResizeAction.java``,
``MetadataCreateIndexService#validateShrinkIndex/validateSplitIndex``):
segment files are HARD-LINKED into the target index and, for split,
docs that no longer route to the shard are deleted via a routing
filter (Lucene ``ShardSplittingQuery``). This module does exactly
that over the partition-directory layout:

- clone: link every segment, same partition count;
- shrink: target count must DIVIDE the source count — partitions
  ``{p : p % new == p_new}`` collapse into ``p_new``. Routing stays
  consistent because ``(h % old) % new == h % new`` when new | old
  (the reference's factor-of rule exists for the same modular reason);
- split: target count must be a MULTIPLE — every source partition is
  linked into each of its ``new/old`` children, then a liveDocs bitmap
  deletes the rows whose ``murmur3(url) % new`` routes elsewhere (the
  ShardSplittingQuery analogue). Per-segment stats (doc_count, df,
  norms) still include the masked copies until a compacting merge —
  the reference's post-split behavior (the duplicate dead docs shift
  IDF slightly until merges reclaim them).

Everything is metadata + hardlinks: no postings bytes are rewritten,
so a 100-TB index reshapes in seconds per partition. Targets are
built under ``<dst>.tmp`` and atomically renamed.
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pyarrow.parquet as pq

from raydex.index.build import (
    INDEX_MANIFEST,
    PART_MANIFEST,
    load_index_manifest,
)
from raydex.partition import route_partitions

_SIDE_FILES = ("livedocs.npy", "deletes.json")  # per-copy, never linked


def _link_file(src: str, dst: str) -> None:
    try:
        os.link(src, dst)
    except OSError:
        shutil.copy2(src, dst)


def _link_seg(src_seg: str, dst_seg: str, carry_livedocs: bool) -> None:
    for dirpath, dirnames, filenames in os.walk(src_seg):
        rel = os.path.relpath(dirpath, src_seg)
        out = dst_seg if rel == "." else os.path.join(dst_seg, rel)
        os.makedirs(out, exist_ok=True)
        for fn in filenames:
            if fn in _SIDE_FILES and not carry_livedocs:
                continue
            _link_file(os.path.join(dirpath, fn), os.path.join(out, fn))


def _part_dir(root: str, p: int) -> str:
    return os.path.join(root, f"part={p:05d}")


def _write_target(src: str, dst: str, new_partitions: int,
                  seg_rows: list[dict], src_manifest: dict) -> dict:
    """Common tail: part manifests, build_params, index manifest."""
    by_part: dict[int, list[dict]] = {}
    for r in seg_rows:
        by_part.setdefault(r["part"], []).append(r)
    for p, rows in by_part.items():
        pm = {
            "partition_id": p,
            "segment_ids": [r["seg_id"] for r in rows],
            "input_fragments": [src],
            "doc_count": int(sum(r["doc_count"] for r in rows)),
            "sum_dl": int(sum(r["sum_dl"] for r in rows)),
            "term_count": int(sum(r["term_count"] for r in rows)),
            "max_df": int(max((r["max_df"] for r in rows), default=0)),
            "content_hash": "|".join(r["content_hash"] for r in rows),
            "status": "complete",
        }
        with open(os.path.join(_part_dir(dst, p), PART_MANIFEST), "w") as f:
            json.dump(pm, f)
    bp_src = os.path.join(src, "build_params.json")
    params = {}
    if os.path.exists(bp_src):
        with open(bp_src) as f:
            params = json.load(f)
    params["num_partitions"] = new_partitions
    with open(os.path.join(dst, "build_params.json"), "w") as f:
        json.dump(params, f)
    seg_rows.sort(key=lambda r: (r["part"], r["seg_id"]))
    manifest = dict(src_manifest)
    manifest.update(
        index_dir=dst,
        num_partitions=new_partitions,
        doc_count=int(sum(r["doc_count"] for r in seg_rows)),
        sum_dl=int(sum(r["sum_dl"] for r in seg_rows)),
        segments=seg_rows,
        lineage=[src],
    )
    with open(os.path.join(dst, INDEX_MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


def clone_index(src: str, dst: str) -> dict:
    """`_clone`: hardlink every segment into a new index directory
    (same partition count, same everything; liveDocs carried)."""
    m = load_index_manifest(src)
    tmp = dst + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    rows = []
    for r in m["segments"]:
        sseg = os.path.join(_part_dir(src, r["part"]), r["seg_id"])
        dseg = os.path.join(_part_dir(tmp, r["part"]), r["seg_id"])
        _link_seg(sseg, dseg, carry_livedocs=True)
        rows.append(dict(r))
    out = _write_target(src, tmp, m["num_partitions"], rows, m)
    os.replace(tmp, dst)
    out["index_dir"] = dst
    return out


def shrink_index(src: str, dst: str, new_partitions: int) -> dict:
    """`_shrink`: collapse to a DIVIDING partition count. Source
    partitions with the same ``p % new`` land in one target partition;
    routing for gets/builds stays consistent by modular arithmetic."""
    m = load_index_manifest(src)
    old = m["num_partitions"]
    if new_partitions <= 0 or old % new_partitions != 0:
        raise ValueError(
            f"shrink target must divide the source partition count "
            f"({old}); got {new_partitions}"
        )
    tmp = dst + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    rows = []
    used: dict[int, set] = {}
    for r in m["segments"]:
        p_new = r["part"] % new_partitions
        sseg = os.path.join(_part_dir(src, r["part"]), r["seg_id"])
        sid = r["seg_id"]
        taken = used.setdefault(p_new, set())
        if sid in taken:
            # collapsing parts may carry the SAME seg_id (a split copies
            # one segment into several children) — qualify by the source
            # part to keep (part, seg_id) unique
            sid = f"{sid}-from{r['part']:05d}"
        taken.add(sid)
        dseg = os.path.join(_part_dir(tmp, p_new), sid)
        _link_seg(sseg, dseg, carry_livedocs=True)
        rows.append(dict(r, part=p_new, seg_id=sid))
    out = _write_target(src, tmp, new_partitions, rows, m)
    os.replace(tmp, dst)
    out["index_dir"] = dst
    return out


def split_index(src: str, dst: str, new_partitions: int) -> dict:
    """`_split`: expand to a MULTIPLE partition count. Each source
    partition is linked into its ``new/old`` children; a liveDocs
    bitmap then deletes the rows that route elsewhere — the reference's
    hardlink + ShardSplittingQuery recovery, no postings rewrite."""
    m = load_index_manifest(src)
    old = m["num_partitions"]
    if new_partitions % old != 0 or new_partitions <= old:
        raise ValueError(
            f"split target must be a strict multiple of the source "
            f"partition count ({old}); got {new_partitions}"
        )
    from raydex.index.deletes import write_livedocs

    tmp = dst + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    factor = new_partitions // old
    rows = []
    for r in m["segments"]:
        p_src = r["part"]
        sseg = os.path.join(_part_dir(src, p_src), r["seg_id"])
        urls = pq.read_table(
            os.path.join(sseg, "docs.parquet"), columns=["url"]
        )["url"].to_pylist()
        rkeys = urls
        with open(os.path.join(sseg, "manifest.json")) as f:
            seg_fields = json.load(f).get("fields", {})
        jf = next((n for n, fm in seg_fields.items()
                   if (fm.get("kind") or fm.get("analyzer")) == "join"), None)
        if jf is not None:
            # parent-join routing: docs were routed by parent ?? _id
            # (the reference's ShardSplittingQuery honors the stored
            # routing value the same way); parent docs carry their own
            # id in parent_id, so parent_id ?? url IS the routing key
            from raydex.index.joinfield import read_join_field

            _, pids = read_join_field(sseg, jf)
            # '' = doc outside the join (read_join_field's null sentinel)
            rkeys = [p if p else u for p, u in zip(pids, urls)]
        routed = np.asarray(route_partitions(rkeys, new_partitions))
        src_lp = os.path.join(sseg, "livedocs.npy")
        src_live = np.load(src_lp) if os.path.exists(src_lp) else None
        for i in range(factor):
            p_t = p_src + i * old
            dseg = os.path.join(_part_dir(tmp, p_t), r["seg_id"])
            _link_seg(sseg, dseg, carry_livedocs=False)
            live = routed == p_t
            if src_live is not None:
                live &= src_live
            write_livedocs(dseg, live)
            rows.append(dict(r, part=p_t))
    out = _write_target(src, tmp, new_partitions, rows, m)
    os.replace(tmp, dst)
    out["index_dir"] = dst
    return out
