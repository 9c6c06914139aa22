"""Rewrite merge for multi-field segments — the decode/re-encode merge
path (what Lucene's SegmentMerger actually does per field,
``org.apache.lucene.index.SegmentMerger``: iterate each field's terms
across inputs, concatenate postings with docBase rebase, rewrite).

The splice merge (raydex.index.merge) moves postings BYTES and is the
fast path, but it only covers the primary field layout; segments with
index-time mapped fields take this path instead: every field —
text-like sub-indexes, dense vectors, rank features, completion —
is merged by term-union + docid rebase through the SAME artifact
writer the build uses (``write_field_artifacts``), so the merged
segment is indistinguishable from a fresh build of the concatenated
docs. Inputs with liveDocs are compacted first (merges reclaim
deletes). Because the merged doc order is segment-concatenation (not
globally url-sorted), a ``url_index.parquet`` sidecar keeps point GETs
O(log n) — the same mechanism index-sorted segments use.
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from raydex.index.segment import SegmentReader, write_field_artifacts


def _merge_text_layout(readers: list, bases: np.ndarray, out_dir: str,
                       seg_id: str, input_fragments: list[str],
                       remap: np.ndarray | None = None) -> dict:
    """Union-merge one text-like field layout across readers into
    ``out_dir``: per union term, postings concatenate in reader order
    with docids rebased by each reader's docBase — within-reader docids
    ascend and bases ascend, so the merged list is sorted without a
    sort. ``remap`` (old concatenated docid -> new docid) implements the
    index-sorted merge (Lucene MultiSorter): per-term postings are then
    re-sorted by the new ids, position slices following their posting."""
    analyzer = readers[0].manifest["analyzer"]
    store_positions = all(r.has_positions for r in readers)
    term_src: dict[str, list] = {}
    for ri, r in enumerate(readers):
        for ti, term in enumerate(r.terms):
            term_src.setdefault(term, []).append((ri, ti))
    terms_sorted = np.asarray(sorted(term_src), dtype=object)

    parts_ids, parts_tfs, parts_pos = [], [], []
    df = np.zeros(terms_sorted.size, dtype=np.int64)
    cf = np.zeros(terms_sorted.size, dtype=np.int64)
    for i, term in enumerate(terms_sorted):
        t_ids, t_tfs, t_pos = [], [], []
        for ri, ti in term_src[term]:
            r = readers[ri]
            if store_positions:
                ids, tfs, pos, offs = r.postings_with_positions(ti)
                t_pos.append(pos)
            else:
                ids, tfs = r.postings(ti)
            t_ids.append(ids + bases[ri])
            t_tfs.append(tfs)
            df[i] += ids.size
            cf[i] += int(tfs.sum())
        ids = np.concatenate(t_ids)
        tfs = np.concatenate(t_tfs)
        pos = np.concatenate(t_pos) if (store_positions and t_pos) else None
        if remap is not None:
            new_ids = remap[ids]
            order = np.argsort(new_ids, kind="stable")
            ids = new_ids[order]
            if pos is not None and pos.size:
                # reorder per-posting position slices with their posting
                starts = np.cumsum(tfs) - tfs
                spans = np.concatenate(
                    [np.arange(starts[j], starts[j] + tfs[j]) for j in order]
                )
                pos = pos[spans]
            tfs = tfs[order]
        parts_ids.append(ids)
        parts_tfs.append(tfs)
        if pos is not None:
            parts_pos.append(pos)
    term_offsets = np.zeros(terms_sorted.size + 1, dtype=np.int64)
    np.cumsum(df, out=term_offsets[1:])
    docids = (np.concatenate(parts_ids) if parts_ids
              else np.empty(0, dtype=np.int64))
    tfs = (np.concatenate(parts_tfs) if parts_tfs
           else np.empty(0, dtype=np.int64))
    sorted_pos = (np.concatenate(parts_pos) if (store_positions and parts_pos)
                  else (np.empty(0, dtype=np.int64) if store_positions
                        else None))
    urls_concat = np.asarray(
        [u for r in readers for u in r.urls.to_pylist()], dtype=object
    )
    dl_concat = np.concatenate([r.dl for r in readers])
    if remap is not None:
        inv = np.empty_like(remap)
        inv[remap] = np.arange(remap.size)  # new docid -> old concat idx
        urls = list(urls_concat[inv])
        dl = dl_concat[inv]
    else:
        urls = list(urls_concat)
        dl = dl_concat
    return write_field_artifacts(
        out_dir, urls, dl, terms_sorted, docids, tfs, df, cf, term_offsets,
        sorted_pos, analyzer, input_fragments, seg_id, store_positions,
    )


def _concat_field_file(field_dirs: list[str], out_dir: str, fname: str,
                       bases: np.ndarray | None = None,
                       remap: np.ndarray | None = None,
                       inv: np.ndarray | None = None) -> pa.Table:
    """Row-concat one dedicated-structure artifact across inputs;
    ``bases`` rebases a ``docid`` column when given; for index-sorted
    merges ``remap`` renumbers docid columns and ``inv`` (new docid ->
    old concatenated row) reorders per-DOC row tables."""
    tables = []
    for fd, base in zip(field_dirs, bases if bases is not None
                        else [0] * len(field_dirs)):
        t = pq.read_table(os.path.join(fd, fname))
        if bases is not None and "docid" in t.column_names:
            d = t["docid"].to_numpy() + int(base)
            if remap is not None:
                d = remap[d]
            t = t.set_column(
                t.schema.get_field_index("docid"), "docid",
                pa.array(d, pa.int64()),
            )
        tables.append(t)
    # promote: a column added by a newer writer (e.g. completion
    # `contexts`) null-fills on segments that predate it
    out = pa.concat_tables(tables, promote_options="default")
    if bases is None and inv is not None:  # per-doc row table: reorder
        out = out.take(pa.array(inv))
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(out, os.path.join(out_dir, fname))
    return out


def merge_segments_rewrite(part_dir: str, seg_ids: list[str],
                           merged_seg_id: str) -> dict:
    """Merge ``seg_ids`` (with any mix of mapped fields) into ONE
    segment under ``part_dir/merged_seg_id`` (atomic rename). Returns
    the merged manifest. Inputs are compacted first when they carry
    deletes; index-SORTED inputs are merge-sorted by the shared sort key
    (Lucene MultiSorter — a full docid permutation re-sorts every
    posting list, its positions, and all per-doc row tables)."""
    from raydex.index.compact import compact_segment

    seg_ids = sorted(seg_ids)
    for sid in seg_ids:
        sd = os.path.join(part_dir, sid)
        if os.path.exists(os.path.join(sd, "livedocs.npy")):
            compact_segment(sd)
    readers = [SegmentReader(os.path.join(part_dir, sid)) for sid in seg_ids]
    sorts = {tuple(r.manifest["index_sort"]) if r.manifest.get("index_sort")
             else None for r in readers}
    if len(sorts) > 1:
        raise ValueError(
            f"cannot merge segments with heterogeneous index sorts: {sorts}"
        )
    index_sort = next(iter(sorts))
    bases = np.zeros(len(readers), dtype=np.int64)
    bases[1:] = np.cumsum([r.ndocs for r in readers])[:-1]
    remap = None
    if index_sort is not None:
        # MultiSorter: merged doc order re-sorts by the index-sort key
        # (stable, so same-key docs keep segment-concatenation order);
        # remap[old concatenated docid] = new docid
        sfield, sorder = index_sort
        keys = np.concatenate([r.doc_values[sfield] for r in readers])
        order = np.argsort(-keys if sorder == "desc" else keys,
                           kind="stable")  # rank -> old idx
        remap = np.empty(keys.size, dtype=np.int64)
        remap[order] = np.arange(keys.size)
    input_fragments = sorted(
        {f for r in readers for f in r.manifest.get("input_fragments", [])}
    )
    tmp = os.path.join(part_dir, merged_seg_id) + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    inv = None
    if remap is not None:
        inv = np.empty_like(remap)
        inv[remap] = np.arange(remap.size)  # new docid -> old concat row
    manifest = _merge_text_layout(readers, bases, tmp, merged_seg_id,
                                  input_fragments, remap=remap)

    # mapped fields: union of field names; every input must carry the
    # field (the build writes every spec'd field into every segment)
    fields_meta: dict = {}
    field_names = sorted({f for r in readers for f in r.fields_meta})
    for fname in field_names:
        metas = [r.fields_meta.get(fname) for r in readers]
        if any(m is None for m in metas):
            raise ValueError(
                f"field {fname!r} is missing from some input segments — "
                f"heterogeneous mappings cannot merge"
            )
        kind = metas[0].get("kind") or metas[0].get("analyzer")
        src_dirs = [os.path.join(part_dir, sid, f"field={fname}")
                    for sid in seg_ids]
        dst = os.path.join(tmp, f"field={fname}")
        if kind == "dense_vector":
            t = _concat_field_file(src_dirs, dst, "vectors.parquet", inv=inv)
            fields_meta[fname] = dict(
                metas[0],
                value_count=int(len(t) - t["vec"].null_count),
            )
        elif kind == "rank_feature":
            t = _concat_field_file(src_dirs, dst, "feature.parquet", inv=inv)
            vals = t["value"].to_numpy(zero_copy_only=False)
            finite = vals[~np.isnan(vals)]
            fields_meta[fname] = dict(
                metas[0], value_count=int(finite.size),
                sum_ln=float(np.log(finite[finite > 0]).sum())
                if finite.size else 0.0,
                positive_count=int((finite > 0).sum()),
            )
        elif kind == "rank_features":
            _concat_field_file(src_dirs, dst, "features.parquet", bases,
                               remap=remap)
            fields_meta[fname] = dict(metas[0])
        elif kind == "join":
            t = _concat_field_file(src_dirs, dst, "join.parquet", inv=inv)
            fields_meta[fname] = dict(
                metas[0],
                join_doc_count=int(len(t) - t["name"].null_count),
            )
        elif kind == "alias":
            fields_meta[fname] = dict(metas[0])  # pointer only, no files
        elif kind in ("doc_values", "range", "geo_point", "geo_shape"):
            # purely columnar kinds: the data lives in docs.parquet
            # columns that concat below (extra_cols); merged bounds =
            # bounds of the per-input bounds (no rescan). Bound keys
            # differ per kind: plain/range use the field name,
            # geo kinds track lat/lon axes.
            fields_meta[fname] = dict(metas[0])
            if kind in ("geo_point", "geo_shape"):
                bound_keys = [f"{fname}__lat", f"{fname}__lon"]
            else:
                bound_keys = [fname]
            for bk in bound_keys:
                los = [r.manifest.get(f"min_{bk}") for r in readers]
                his = [r.manifest.get(f"max_{bk}") for r in readers]
                if all(v is not None for v in los + his):
                    manifest[f"min_{bk}"] = min(los)
                    manifest[f"max_{bk}"] = max(his)
        elif kind == "completion":
            # inputs must stay input-SORTED for the prefix bisect: concat
            # then re-sort by (input, docid)
            t = _concat_field_file(src_dirs, dst, "completion.parquet",
                                   bases, remap=remap)
            t = t.sort_by([("input", "ascending"), ("docid", "ascending")])
            pq.write_table(t, os.path.join(dst, "completion.parquet"))
            fields_meta[fname] = dict(metas[0],
                                      input_count=int(t.num_rows))
        else:  # text-like sub-index: recursive union merge
            fr = [r.field(fname) for r in readers]
            fm = _merge_text_layout(fr, bases, dst,
                                    f"{merged_seg_id}-f-{fname}",
                                    input_fragments, remap=remap)
            fields_meta[fname] = dict(metas[0], sum_dl=fm["sum_dl"],
                                      term_count=fm["term_count"])

    # extra stored doc-values columns concat onto docs.parquet (in the
    # NEW doc order for index-sorted merges)
    extra_cols = sorted({c for r in readers for c in r.doc_values})
    if extra_cols:
        dst_docs = pq.read_table(os.path.join(tmp, "docs.parquet"))
        for cname in extra_cols:
            cols = []
            for sid, r in zip(seg_ids, readers):
                # doc-write micro-segments store source columns their
                # bulk siblings lack — absent columns fill null
                if cname not in r.doc_values:
                    cols.append(None)
                    continue
                t = pq.read_table(
                    os.path.join(part_dir, sid, "docs.parquet"),
                    columns=[cname],
                )
                cols.append(t[cname].combine_chunks())
            typ = next(c.type for c in cols if c is not None)
            cols = [
                c if c is not None else pa.nulls(r.ndocs, typ)
                for c, r in zip(cols, readers)
            ]
            arr = pa.concat_arrays([c.cast(typ) for c in cols])
            if inv is not None:
                arr = arr.take(pa.array(inv))
            dst_docs = dst_docs.append_column(cname, arr)
        pq.write_table(dst_docs, os.path.join(tmp, "docs.parquet"))

    # merged doc order = segment concatenation, NOT url-sorted: the
    # url_index sidecar keeps point GETs bisectable (index-sort's
    # mechanism); min/max url recomputed over the true set
    urls = np.asarray([u for r in readers for u in r.urls.to_pylist()],
                      dtype=object)
    if inv is not None:
        urls = urls[inv]  # NEW doc order
    order = np.argsort(urls, kind="stable")
    pq.write_table(
        pa.table({"url": pa.array(urls[order], pa.string()),
                  "docid": pa.array(order.astype(np.int64))}),
        os.path.join(tmp, "url_index.parquet"),
    )
    manifest["min_url"] = str(urls[order[0]]) if urls.size else ""
    manifest["max_url"] = str(urls[order[-1]]) if urls.size else ""
    manifest["merged_from"] = seg_ids
    if index_sort is not None:
        sfield, sorder = index_sort
        manifest["index_sort"] = [sfield, sorder]
        keys_new = keys[inv]
        manifest[f"min_{sfield}"] = int(keys_new.min()) if keys_new.size else None
        manifest[f"max_{sfield}"] = int(keys_new.max()) if keys_new.size else None
    if fields_meta:
        manifest["fields"] = fields_meta
    with open(os.path.join(tmp, "manifest.json"), "w") as f:
        json.dump(manifest, f)
    final = os.path.join(part_dir, merged_seg_id)
    os.replace(tmp, final)
    return manifest
