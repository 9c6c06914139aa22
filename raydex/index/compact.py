"""Compacting rewrite of segments with deletes — the reference's
``_forcemerge?only_expunge_deletes`` (Lucene merges drop deleted docs
and rebuild per-segment stats;
``server/.../action/admin/indices/forcemerge/ForceMergeRequest.java``,
Lucene ``IndexWriter#forceMergeDeletes``).

Until compaction, deleted docs are only MASKED (liveDocs) and still
count in df / norms / sum_dl — scores include them. Compaction rewrites
each segment without its dead docs: postings are decoded per term,
filtered by the bitmap, docids renumbered to the surviving order, and
the artifacts re-written through the SAME backend the build uses
(``write_field_artifacts``), so a compacted segment is byte-identical
to one built fresh from only the surviving docs. After compaction the
index manifest's doc_count / sum_dl / per-field stats shrink to the
live corpus — scores recover exactly.

Scale shape: one Ray task per dirty segment, no shuffle — the same
embarrassing parallelism as the build's per-partition step.
"""

from __future__ import annotations

import json
import os
import shutil
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from raydex.index.build import (
    INDEX_MANIFEST,
    PART_MANIFEST,
    load_index_manifest,
)
from raydex.index.segment import SegmentReader, write_field_artifacts


def _compact_text_index(reader: SegmentReader, live: np.ndarray,
                        out_dir: str, seg_id: str) -> dict:
    """Rewrite one text-like (inverted) field layout keeping only live
    docs. Positions are absolute in-doc offsets, so surviving postings
    keep their position payload verbatim."""
    keep = np.flatnonzero(live)
    new_id = np.full(reader.ndocs, -1, dtype=np.int64)
    new_id[keep] = np.arange(keep.size)
    urls_new = reader.urls.take(pa.array(keep)).to_pylist()
    dl_new = reader.dl[keep]

    # ONE varint sweep over the whole payload (term-major flat arrays),
    # then the live filter / renumber / per-term stats are single
    # vectorized passes — no per-term Python decode loop
    has_pos = reader.has_positions
    all_ids, all_tfs, starts = reader.decode_all_postings()
    sel = live[all_ids] if all_ids.size else np.zeros(0, dtype=bool)
    docids = new_id[all_ids[sel]]
    tfs = all_tfs[sel]
    df_new = np.zeros(reader.nterms, dtype=np.int64)
    cf_new = np.zeros(reader.nterms, dtype=np.int64)
    live_t = np.flatnonzero(reader.df > 0)
    if live_t.size and sel.size:
        df_new[live_t] = np.add.reduceat(
            sel.astype(np.int64), starts[:-1][live_t])
        cf_new[live_t] = np.add.reduceat(
            np.where(sel, all_tfs, 0), starts[:-1][live_t])
    sorted_pos = None
    if has_pos:
        # per-posting position runs of the surviving postings, gathered
        # in one _spans pass (positions are absolute in-doc offsets, so
        # surviving postings keep their values verbatim)
        from raydex.index.postings import _spans

        pos_abs, post_start = reader.decode_all_positions(all_tfs)
        sel_idx = np.flatnonzero(sel)
        sorted_pos = pos_abs[_spans(post_start[sel_idx], all_tfs[sel_idx])]

    alive_terms = np.flatnonzero(df_new)
    terms_new = np.asarray(
        reader._terms_pa.take(pa.array(alive_terms)).to_pylist(),
        dtype=object,
    )
    df_a = df_new[alive_terms]
    cf_a = cf_new[alive_terms]
    term_offsets = np.zeros(alive_terms.size + 1, dtype=np.int64)
    np.cumsum(df_a, out=term_offsets[1:])
    return write_field_artifacts(
        out_dir, urls_new, dl_new, terms_new, docids, tfs, df_a, cf_a,
        term_offsets, sorted_pos, reader.manifest["analyzer"],
        reader.manifest.get("input_fragments"), seg_id, has_pos,
        t0=time.perf_counter(),
    )


def _filter_rows(src: str, dst: str, fname: str, keep_idx: pa.Array,
                 renumber_docid: np.ndarray | None = None) -> None:
    t = pq.read_table(os.path.join(src, fname))
    if renumber_docid is None:
        t = t.take(keep_idx)
    else:
        d = t["docid"].to_numpy()
        mask = renumber_docid[d] >= 0
        t = t.filter(pa.array(mask))
        t = t.set_column(
            t.schema.get_field_index("docid"), "docid",
            pa.array(renumber_docid[t["docid"].to_numpy()], pa.int64()),
        )
    os.makedirs(dst, exist_ok=True)
    pq.write_table(t, os.path.join(dst, fname))


def compact_segment(seg_dir: str) -> dict | None:
    """Rewrite ``seg_dir`` in place without its deleted docs (no-op
    when the segment has no liveDocs bitmap). Returns the new manifest,
    or None for a no-op; a fully-deleted segment becomes an empty one
    (the caller drops it from the index manifest)."""
    reader = SegmentReader(seg_dir)
    live = reader.live
    if live is None or live.all():
        return None
    tmp = seg_dir + ".ctmp"
    shutil.rmtree(tmp, ignore_errors=True)
    seg_id = reader.manifest["seg_id"]
    manifest = _compact_text_index(reader, live, tmp, seg_id)

    keep = np.flatnonzero(live)
    manifest_dirty = False
    if reader.doc_values:
        # carry extra stored doc-values columns (index-sort fields)
        src_docs = pq.read_table(os.path.join(seg_dir, "docs.parquet"))
        dst_docs = pq.read_table(os.path.join(tmp, "docs.parquet"))
        for cname in src_docs.column_names:
            if cname in ("url", "dl", "norm"):
                continue
            dst_docs = dst_docs.append_column(
                cname, src_docs[cname].take(pa.array(keep))
            )
        pq.write_table(dst_docs, os.path.join(tmp, "docs.parquet"))
    if reader.manifest.get("index_sort"):
        sfield, sorder = reader.manifest["index_sort"]
        manifest["index_sort"] = [sfield, sorder]
        sv = reader.doc_values.get(sfield)
        if sv is not None and keep.size:
            kept = sv[keep]
            manifest[f"min_{sfield}"] = int(kept.min())
            manifest[f"max_{sfield}"] = int(kept.max())
        # surviving docs keep the sort order; rebuild the url sidecar
        urls_new = np.asarray(
            [reader.urls[int(i)].as_py() for i in keep], dtype=object
        )
        order = np.argsort(urls_new, kind="stable")
        pq.write_table(
            pa.table(
                {"url": pa.array(urls_new[order], pa.string()),
                 "docid": pa.array(order.astype(np.int64))}
            ),
            os.path.join(tmp, "url_index.parquet"),
        )
        manifest_dirty = True
    keep_pa = pa.array(keep)
    new_id = np.full(reader.ndocs, -1, dtype=np.int64)
    new_id[keep] = np.arange(keep.size)
    fields_meta: dict = {}
    for fname, meta in reader.fields_meta.items():
        src_f = os.path.join(seg_dir, f"field={fname}")
        dst_f = os.path.join(tmp, f"field={fname}")
        kind = meta.get("kind") or meta.get("analyzer")
        if kind == "dense_vector":
            _filter_rows(src_f, dst_f, "vectors.parquet", keep_pa)
            nvalid = int(pc.count(
                pq.read_table(os.path.join(dst_f, "vectors.parquet"))["vec"]
            ).as_py())
            fields_meta[fname] = dict(meta, value_count=nvalid)
        elif kind == "rank_feature":
            _filter_rows(src_f, dst_f, "feature.parquet", keep_pa)
            v = pq.read_table(os.path.join(dst_f, "feature.parquet"))["value"]
            vals = v.to_numpy(zero_copy_only=False)
            finite = vals[~np.isnan(vals)]
            fields_meta[fname] = dict(
                meta, value_count=int(finite.size),
                sum_ln=float(np.log(finite[finite > 0]).sum()) if finite.size else 0.0,
                positive_count=int((finite > 0).sum()),
            )
        elif kind == "rank_features":
            _filter_rows(src_f, dst_f, "features.parquet", keep_pa,
                         renumber_docid=new_id)
            fields_meta[fname] = dict(meta)
        elif kind == "join":
            _filter_rows(src_f, dst_f, "join.parquet", keep_pa)
            t = pq.read_table(os.path.join(dst_f, "join.parquet"))
            fields_meta[fname] = dict(
                meta, join_doc_count=int(len(t) - t["name"].null_count)
            )
        elif kind == "alias":
            fields_meta[fname] = dict(meta)  # pointer only, no files
        elif kind == "doc_values":
            # column rows filtered with docs.parquet above; keep the old
            # (conservative, possibly wider) bounds — can-match never
            # wrongly skips on a superset range
            fields_meta[fname] = dict(meta)
            for key in (f"min_{fname}", f"max_{fname}"):
                if key in reader.manifest:
                    manifest[key] = reader.manifest[key]
        elif kind == "completion":
            _filter_rows(src_f, dst_f, "completion.parquet", keep_pa,
                         renumber_docid=new_id)
            fields_meta[fname] = dict(meta)
        else:  # text-like sub-index: full recursive compaction
            fr = reader.field(fname)
            fm = _compact_text_index(fr, live, dst_f, f"{seg_id}-f-{fname}")
            fields_meta[fname] = dict(meta, sum_dl=fm["sum_dl"],
                                      term_count=fm["term_count"])
    if fields_meta:
        manifest["fields"] = fields_meta
        manifest_dirty = True
    if manifest_dirty:
        with open(os.path.join(tmp, "manifest.json"), "w") as f:
            json.dump(manifest, f)
    old = seg_dir + ".old"
    shutil.rmtree(old, ignore_errors=True)
    os.rename(seg_dir, old)
    os.rename(tmp, seg_dir)
    shutil.rmtree(old)
    return manifest


def expunge_deletes(index_dir: str, use_ray: bool = True) -> dict:
    """Compact every segment that carries deletes, then rewrite the
    partition + index manifests with the recovered stats. Returns
    {"compacted": n, "doc_count": new_total}."""
    m = load_index_manifest(index_dir)
    dirty = []
    for r in m["segments"]:
        sd = os.path.join(index_dir, f"part={r['part']:05d}", r["seg_id"])
        if os.path.exists(os.path.join(sd, "livedocs.npy")):
            dirty.append((r["part"], r["seg_id"], sd))
    if use_ray and dirty:
        import ray

        task = ray.remote(num_cpus=1)(compact_segment)
        results = ray.get([task.remote(sd) for _, _, sd in dirty])
    else:
        results = [compact_segment(sd) for _, _, sd in dirty]

    new_by_seg = {
        (p, sid): nm for (p, sid, _), nm in zip(dirty, results)
        if nm is not None
    }
    rows = []
    for r in m["segments"]:
        nm = new_by_seg.get((r["part"], r["seg_id"]))
        if nm is None:
            rows.append(r)
            continue
        if nm["doc_count"] == 0:  # fully-deleted segment: drop it
            sd = os.path.join(index_dir, f"part={r['part']:05d}", r["seg_id"])
            shutil.rmtree(sd, ignore_errors=True)
            continue
        rows.append(
            dict(
                r,
                doc_count=nm["doc_count"], sum_dl=nm["sum_dl"],
                term_count=nm["term_count"], max_df=nm["max_df"],
                content_hash=nm["content_hash"],
                field_sum_dl=json.dumps(
                    {f: fm.get("sum_dl", 0)
                     for f, fm in nm.get("fields", {}).items()}
                ),
                field_extra=json.dumps(
                    {
                        f: (
                            {"dims": fm.get("dims", 0),
                             "similarity": fm.get("similarity", "cosine")}
                            if fm.get("kind") == "dense_vector"
                            else {
                                "value_count": fm.get("value_count", 0),
                                "sum_ln": fm.get("sum_ln", 0.0),
                                "positive_count": fm.get("positive_count", 0),
                            }
                        )
                        for f, fm in nm.get("fields", {}).items()
                        if fm.get("kind") in ("rank_feature", "dense_vector")
                    }
                ),
            )
        )
    # refresh partition manifests for the touched partitions
    touched = {p for p, _, _ in dirty}
    for p in touched:
        prow = [r for r in rows if r["part"] == p]
        pm = {
            "partition_id": p,
            "segment_ids": [r["seg_id"] for r in prow],
            "input_fragments": m.get("lineage", []),
            "doc_count": int(sum(r["doc_count"] for r in prow)),
            "sum_dl": int(sum(r["sum_dl"] for r in prow)),
            "term_count": int(sum(r["term_count"] for r in prow)),
            "max_df": int(max((r["max_df"] for r in prow), default=0)),
            "content_hash": "|".join(r["content_hash"] for r in prow),
            "status": "complete",
        }
        pdir = os.path.join(index_dir, f"part={p:05d}")
        tmpf = os.path.join(pdir, PART_MANIFEST + ".tmp")
        with open(tmpf, "w") as f:
            json.dump(pm, f)
        os.replace(tmpf, os.path.join(pdir, PART_MANIFEST))
    # global per-field sums recomputed over ALL rows
    field_sum_dl: dict[str, int] = {}
    field_extra: dict[str, dict] = {}
    for r in rows:
        for f, v in json.loads(r.get("field_sum_dl") or "{}").items():
            field_sum_dl[f] = field_sum_dl.get(f, 0) + int(v)
        for f, fx in json.loads(r.get("field_extra") or "{}").items():
            if "dims" in fx:
                field_extra[f] = fx
            else:
                acc = field_extra.setdefault(
                    f, {"value_count": 0, "sum_ln": 0.0, "positive_count": 0}
                )
                acc["value_count"] += int(fx.get("value_count", 0))
                acc["sum_ln"] += float(fx.get("sum_ln", 0.0))
                acc["positive_count"] += int(fx.get("positive_count", 0))
    manifest = dict(m)
    manifest.update(
        doc_count=int(sum(r["doc_count"] for r in rows)),
        sum_dl=int(sum(r["sum_dl"] for r in rows)),
        segments=rows,
    )
    for fname, meta in (manifest.get("fields") or {}).items():
        meta = dict(meta)
        meta["sum_dl"] = field_sum_dl.get(fname, 0)
        meta.update(field_extra.get(fname, {}))
        manifest["fields"][fname] = meta
    tmpf = os.path.join(index_dir, INDEX_MANIFEST + ".tmp")
    with open(tmpf, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmpf, os.path.join(index_dir, INDEX_MANIFEST))
    return {
        "compacted": int(sum(1 for nm in results if nm is not None)),
        "doc_count": manifest["doc_count"],
    }
