"""Soft deletes (liveDocs) + `_delete_by_query`.

The reference deletes documents by marking them in a per-segment
bitmap (Lucene liveDocs; ``server/.../index/engine/InternalEngine.java``
delete path, ``reindex/.../DeleteByQueryRequest.java`` for the query
form). Segments stay immutable: a delete writes a NEW sidecar bitmap
(``livedocs.npy``, bool, True = live) next to the segment artifacts via
atomic rename. Deleted docs

- never match any query / filter / knn / get (masked at collection),
- STILL count in df / norms / sum_dl until a compacting merge — the
  reference's deletes-visible-in-stats behavior (scores shift only
  after merge reclaims them).

``delete_by_query`` is a scatter op: each segment evaluates the query
with coordinator-collected global stats and ANDs the inverted mask into
its bitmap — one small task per segment, no data movement (the 100-TB
shape: deletes touch metadata-sized sidecars, never postings).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def write_livedocs(seg_dir: str, live: np.ndarray) -> int:
    """Atomically install a liveDocs bitmap (ANDed with any existing
    one — deletes only ever grow). Returns the segment's deleted count."""
    lp = os.path.join(seg_dir, "livedocs.npy")
    if os.path.exists(lp):
        live = live & np.load(lp)
    tmp = lp + ".tmp.npy"
    np.save(tmp, live)
    os.replace(tmp, lp)
    del_count = int((~live).sum())
    meta = {"del_count": del_count, "updated_at": time.time()}
    mtmp = os.path.join(seg_dir, "deletes.json.tmp")
    with open(mtmp, "w") as f:
        json.dump(meta, f)
    os.replace(mtmp, os.path.join(seg_dir, "deletes.json"))
    return del_count


def _segment_delete(seg_dir: str, qdict: dict, ndocs: int, sum_dl: int,
                    df: dict, analyzer_name: str,
                    fdf: dict | None, field_sum_dl: dict | None) -> int:
    """Evaluate the query over one segment, mark matches deleted.
    Returns how many NEWLY-live docs this call deleted."""
    from raydex.analysis.tokenizer import get_analyzer
    from raydex.index.segment import SegmentReader
    from raydex.search.bm25 import GlobalStats
    from raydex.search.query import SegmentEvaluator, parse_query

    r = SegmentReader(seg_dir)
    stats = GlobalStats(ndocs=ndocs, sum_dl=sum_dl, df=df,
                        fdf=fdf, field_sum_dl=field_sum_dl)
    ev = SegmentEvaluator(r, stats, get_analyzer(analyzer_name))
    _, mask = ev.eval(parse_query(qdict))
    already_dead = (~r.live) if r.live is not None else np.zeros(
        r.ndocs, dtype=bool
    )
    newly = int((mask & ~already_dead).sum())
    if newly:
        write_livedocs(seg_dir, ~mask)
    return newly


def _segment_stats(seg_dir: str, terms: list[str], fpairs: list) -> tuple:
    """One segment's (df partial, field-df partial) — opened and
    released inside the task; the driver never holds readers."""
    from raydex.index.segment import SegmentReader

    r = SegmentReader(seg_dir)
    df = {}
    for t in terms:
        ti = r.lookup(t)
        if ti >= 0:
            df[t] = int(r.df[ti])
    fdf = {}
    for f, t in fpairs:
        fr = r.field(f)
        if fr is None:
            continue
        ti = fr.lookup(t)
        if ti >= 0:
            fdf[(f, t)] = int(fr.df[ti])
    return df, fdf


def delete_by_query(index_dir: str, qdict: dict, use_ray: bool = True) -> dict:
    """`POST <index>/_delete_by_query` analogue. Collects global stats
    once (the dfs phase — one small task per segment; the driver NEVER
    opens readers, so the op is metadata-sized at any index size), then
    one task per segment writes its bitmap.
    Returns {"deleted": n, "segments_touched": m}."""
    from raydex.index.blocks import check_write
    from raydex.search.scatter import SearcherBase

    check_write(index_dir)  # write-blocked / closed indexes reject
    s = SearcherBase(index_dir)  # manifest + analyzer only, no readers
    terms, fpairs = s._collect_stats_spec(qdict)
    if use_ray:
        import ray

        stats_task = ray.remote(num_cpus=1)(_segment_stats)
        partials = ray.get(
            [stats_task.remote(d, terms, fpairs) for d in s.seg_dirs]
        )
    else:
        partials = [_segment_stats(d, terms, fpairs) for d in s.seg_dirs]
    df = dict.fromkeys(terms, 0)
    fdf: dict = {tuple(p): 0 for p in fpairs}
    for pdf, pfdf in partials:
        for t, v in pdf.items():
            df[t] += v
        for k, v in pfdf.items():
            fdf[k] += v
    args = (qdict, s.ndocs, s.sum_dl, df, s.manifest["analyzer"],
            fdf, s.field_sum_dl)
    if use_ray:
        import ray

        task = ray.remote(num_cpus=1)(_segment_delete)
        counts = ray.get([task.remote(d, *args) for d in s.seg_dirs])
    else:
        counts = [_segment_delete(d, *args) for d in s.seg_dirs]
    return {
        "deleted": int(sum(counts)),
        "segments_touched": int(sum(1 for c in counts if c)),
    }


def delete_ids(index_dir: str, urls: list[str]) -> dict:
    """DELETE-by-id analogue: routes each id to its partition and marks
    the doc dead in its segment bitmap (metadata-only, like the query
    form)."""
    return delete_by_query(index_dir, {"ids": {"values": list(urls)}})


def index_delete_stats(index_dir: str) -> dict:
    """Per-index delete totals (`_stats` docs.deleted analogue)."""
    from raydex.index.build import load_index_manifest, segment_dirs

    m = load_index_manifest(index_dir)
    deleted = 0
    for sd in segment_dirs(index_dir, m):
        dj = os.path.join(sd, "deletes.json")
        if os.path.exists(dj):
            with open(dj) as f:
                deleted += int(json.load(f)["del_count"])
    return {"docs_count": m["doc_count"] - deleted, "docs_deleted": deleted}
