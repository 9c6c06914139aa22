"""Segment merge as an explicit term-hash shuffle (SURVEY.md §4.2, M4).

The reference's tiered background merge
(``server/.../index/MergePolicyConfig.java:109-119``: floor 2MB, <=10
segments/tier, <=10 merged at once, max segment 5GB) coalesces small
segments; the *mechanism* (k-way term-dict merge inside Lucene) is
re-expressed here Ray-Data-first:

  map stage (parallel over input segments, does ALL heavy byte work):
    each segment's posting payload is docid-REBASED (the merged docid of
    a doc is old docid + segment base — only each block's absolute first
    docid needs re-encoding, deltas are unchanged: a vectorized splice
    of one varint per block) and split into TERM CHUNKS of <=
    ``max_blocks_per_chunk`` blocks — the head-term skew split: a
    stop-word-sized posting list becomes many independently shipped
    chunks instead of one giant row;

  shuffle: rows keyed by (partition, murmur3(term) % num_buckets) —
    explicit term-hash partitioning; ``groupby`` on the composite key;

  reduce stage (cheap): within a bucket, chunks are ordered by
    (term, seg_ord, chunk_ord) and CONCATENATED — pure memcpy, no
    decode — into a bucket file (terms sorted within bucket).

The merged segment is a ``bucketed`` layout directory
(``bucket=NNN/{terms.parquet,postings.bin}`` + concatenated
``docs.parquet``); ``SegmentReader`` re-sorts the union term dict at
load. Because build cut segments from a url-sorted stream, concatenating
doc tables in segment order preserves the partition's deterministic doc
order — merged-index search results are EXACTLY the pre-merge results.
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

from raydex.index.build import PART_MANIFEST, _part_dir, load_index_manifest
from raydex.index.postings import varint_encode
from raydex.partition import murmur3_hash_many

# ported policy constants (MergePolicyConfig.java:113-119)
FLOOR_SEGMENT_BYTES = 2 * 1024 * 1024
SEGMENTS_PER_TIER = 10
MAX_MERGE_AT_ONCE = 10
MAX_MERGED_SEGMENT_BYTES = 5 * 1024**3

_CHUNK_SCHEMA = pa.schema(
    [
        ("pb", pa.int64()),  # part * num_buckets + bucket (shuffle key)
        ("part", pa.int32()),
        ("term", pa.string()),
        ("seg_ord", pa.int32()),
        ("chunk_ord", pa.int32()),
        ("first_chunk", pa.bool_()),
        ("term_cf", pa.int64()),
        ("blk_n", pa.list_(pa.int32())),
        ("blk_last", pa.list_(pa.int32())),
        ("blk_maxtf", pa.list_(pa.int32())),
        ("blk_mindl", pa.list_(pa.int32())),
        ("blk_idsb", pa.list_(pa.int32())),
        ("blk_nb", pa.list_(pa.int32())),
        ("payload", pa.large_binary()),
        ("has_pos", pa.bool_()),
        ("blk_posnb", pa.list_(pa.int32())),
        ("pos_payload", pa.large_binary()),
    ]
)


def _decode_first_varints(payload: np.ndarray, offs: np.ndarray):
    """Vectorized decode of the varint AT each offset -> (values, lengths)."""
    nb = offs.size
    vals = np.zeros(nb, dtype=np.uint64)
    lens = np.ones(nb, dtype=np.int64)
    cont = np.ones(nb, dtype=bool)
    for j in range(5):
        # clip: masked-off rows may point past the payload end
        b = payload[np.minimum(offs + j, payload.size - 1)].astype(np.uint64)
        use = cont
        vals[use] |= (b[use] & np.uint64(0x7F)) << np.uint64(7 * j)
        nxt = cont & (b >= 128)
        lens[nxt] += 1
        cont = nxt
        if not cont.any():
            break
    return vals.astype(np.int64), lens


def _varint_len(v: np.ndarray) -> np.ndarray:
    return (
        1
        + (v >= 128).astype(np.int64)
        + (v >= 128**2)
        + (v >= 128**3)
        + (v >= 128**4)
    )


def _spans(starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    csum = np.cumsum(lens) - lens
    return np.arange(total, dtype=np.int64) - np.repeat(csum, lens) + np.repeat(
        starts, lens
    )


def rebase_payload(reader) -> "tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]":
    """Shift every block's absolute first docid by ``base`` via a
    vectorized one-varint-per-block splice.

    Returns (new_payload, new_off, new_idsb, new_nb, new_last) given the
    reader's flat block arrays; ``base`` is added by the caller through
    ``reader._merge_base`` set beforehand.
    """
    base = reader._merge_base
    payload = reader.payload
    off = reader.blk_off.astype(np.int64)
    idsb = reader.blk_idsb.astype(np.int64)
    nb = reader.blk_nb.astype(np.int64)
    if off.size == 0:
        return payload, off, idsb, nb, reader.blk_last.astype(np.int64)
    vals, old_lens = _decode_first_varints(payload, off)
    new_vals = vals + base
    new_lens = _varint_len(new_vals)
    dlen = new_lens - old_lens
    new_nb = nb + dlen
    new_idsb = idsb + dlen
    new_off = np.cumsum(new_nb) - new_nb  # blocks are payload-ordered
    out = np.empty(int(new_nb.sum()), dtype=np.uint8)
    first_bytes = varint_encode(new_vals)
    fb_starts = np.cumsum(new_lens) - new_lens
    out[_spans(new_off, new_lens)] = first_bytes[_spans(fb_starts, new_lens)]
    rest_len = nb - old_lens
    out[_spans(new_off + new_lens, rest_len)] = payload[
        _spans(off + old_lens, rest_len)
    ]
    new_last = reader.blk_last.astype(np.int64) + base
    return out, new_off, new_idsb, new_nb, new_last


def _list_arr(values: np.ndarray, bounds: np.ndarray, typ) -> pa.ListArray:
    """ListArray over ``values`` with chunk boundaries ``bounds``
    (len = nchunks+1). Chunks tile the flat array, so no reshuffling."""
    return pa.ListArray.from_arrays(
        pa.array(bounds.astype(np.int32), pa.int32()),
        pa.array(values.astype(np.int32), typ.value_type),
    )


def _binary_arr(payload: np.ndarray, byte_bounds: np.ndarray) -> pa.Array:
    """Zero-copy-ish LargeBinaryArray: chunks are contiguous slices of
    ``payload``, so the value buffer IS the payload and only the int64
    offsets are built."""
    return pa.Array.from_buffers(
        pa.large_binary(),
        byte_bounds.size - 1,
        [None, pa.py_buffer(np.ascontiguousarray(byte_bounds, dtype=np.int64)),
         pa.py_buffer(np.ascontiguousarray(payload))],
    )


class _ChunkSegment:
    """Map stage: one input segment -> rebased, chunked term rows.

    Fully columnar: chunk boundaries are computed with numpy
    (repeat/cumsum over term_nblocks), list columns are built as
    ListArrays over the flat block arrays (chunks tile the block order),
    and payload slices become LargeBinary offsets into the single rebased
    payload — no per-term Python, no per-chunk bytes copies."""

    def __init__(self, num_buckets: int, max_blocks_per_chunk: int):
        self.num_buckets = num_buckets
        self.max_blocks = max_blocks_per_chunk

    def _one(self, row: dict) -> pa.Table:
        from raydex.index.segment import SegmentReader

        reader = SegmentReader(row["seg_dir"])
        has_pos = bool(getattr(reader, "has_positions", False))
        reader._merge_base = row["base"]
        payload, off, idsb, nbs, last = rebase_payload(reader)
        tnb = reader.term_nblocks.astype(np.int64)
        T = tnb.size
        if T == 0:
            return _CHUNK_SCHEMA.empty_table()
        buckets = murmur3_hash_many(reader.terms).astype(np.int64) % self.num_buckets
        part, seg_ord = row["part"], row["seg_ord"]

        nchunks = -(-tnb // self.max_blocks)  # ceil per term
        C = int(nchunks.sum())
        cstart = np.cumsum(nchunks) - nchunks
        term_idx = np.repeat(np.arange(T), nchunks)
        chunk_ord = np.arange(C) - np.repeat(cstart, nchunks)
        tstart = np.cumsum(tnb) - tnb
        lo = tstart[term_idx] + chunk_ord * self.max_blocks
        cnt = np.minimum(tnb[term_idx] - chunk_ord * self.max_blocks, self.max_blocks)
        bounds = np.zeros(C + 1, dtype=np.int64)
        np.cumsum(cnt, out=bounds[1:])  # == block order: chunks tile terms

        total_bytes = int(nbs.sum())
        byte_bounds = np.empty(C + 1, dtype=np.int64)
        byte_bounds[:-1] = off[lo]
        byte_bounds[-1] = total_bytes

        cols = {
            "pb": pa.array(part * self.num_buckets + buckets[term_idx], pa.int64()),
            "part": pa.array(np.full(C, part, dtype=np.int32)),
            "term": pa.array(np.repeat(reader.terms, nchunks)).cast(pa.string()),
            "seg_ord": pa.array(np.full(C, seg_ord, dtype=np.int32)),
            "chunk_ord": pa.array(chunk_ord.astype(np.int32)),
            "first_chunk": pa.array(chunk_ord == 0),
            "term_cf": pa.array(reader.cf[term_idx].astype(np.int64)),
            "blk_n": _list_arr(reader.blk_n, bounds, pa.list_(pa.int32())),
            "blk_last": _list_arr(last, bounds, pa.list_(pa.int32())),
            "blk_maxtf": _list_arr(reader.blk_maxtf, bounds, pa.list_(pa.int32())),
            "blk_mindl": _list_arr(reader.blk_mindl, bounds, pa.list_(pa.int32())),
            "blk_idsb": _list_arr(idsb, bounds, pa.list_(pa.int32())),
            "blk_nb": _list_arr(nbs, bounds, pa.list_(pa.int32())),
            "payload": _binary_arr(payload, byte_bounds),
            "has_pos": pa.array(np.full(C, has_pos)),
        }
        if has_pos:
            # positions are DOC-RELATIVE: no rebase, slices ride verbatim
            posnb = reader.blk_posnb.astype(np.int64)
            pos_bounds = np.empty(C + 1, dtype=np.int64)
            pos_bounds[:-1] = reader.blk_posoff[lo]
            pos_bounds[-1] = int(posnb.sum())
            cols["blk_posnb"] = _list_arr(posnb, bounds, pa.list_(pa.int32()))
            cols["pos_payload"] = _binary_arr(reader.pos_payload, pos_bounds)
        else:
            zero = np.zeros(C + 1, dtype=np.int64)
            cols["blk_posnb"] = _list_arr(np.empty(0, np.int64), zero, pa.list_(pa.int32()))
            cols["pos_payload"] = _binary_arr(np.empty(0, np.uint8), zero)
        return pa.table(cols).cast(_CHUNK_SCHEMA)

    def __call__(self, batch: pa.Table) -> pa.Table:
        outs = [self._one(row) for row in batch.to_pylist()]
        if not outs:
            return _CHUNK_SCHEMA.empty_table()
        return pa.concat_tables(outs)


class _WriteBucket:
    """Reduce stage: one (part, bucket) group -> bucket files (memcpy only)."""

    def __init__(self, out_dirs: dict[int, str], num_buckets: int):
        self.out_dirs = out_dirs  # part -> merged seg dir (pre-created .tmp)
        self.num_buckets = num_buckets

    @staticmethod
    def _write_binary_column(col: pa.ChunkedArray, path: str) -> int:
        """Concatenate a (Large)Binary column to a file in logical order.

        After sort_by the array's value buffer is freshly materialized in
        logical order, so when offsets are normalized the whole buffer is
        one memcpy-free write; otherwise fall back to per-value buffers
        (still no Python bytes objects)."""
        total = 0
        with open(path, "wb") as f:
            for arr in col.chunks if isinstance(col, pa.ChunkedArray) else [col]:
                if arr.null_count == 0 and arr.offset == 0:
                    offs = np.frombuffer(arr.buffers()[1], dtype=np.int64)[
                        : len(arr) + 1
                    ]
                    if offs[0] == 0 and arr.buffers()[2] is not None:
                        f.write(memoryview(arr.buffers()[2])[: int(offs[-1])])
                        total += int(offs[-1])
                        continue
                for v in arr:
                    b = v.as_buffer()
                    f.write(memoryview(b))
                    total += len(b)
        return total

    def __call__(self, group: pa.Table) -> pa.Table:
        """Columnar reduce: term boundaries via run-length over the
        sorted term column; per-term list columns are ListArrays over
        the flat block arrays with reduceat-computed offsets; payload
        files are buffer-level concatenations."""
        if group.num_rows == 0:
            return pa.table({"pb": pa.array([], pa.int64()), "nterms": pa.array([], pa.int64()), "nbytes": pa.array([], pa.int64())})
        pb = int(group["pb"][0].as_py())
        part, bucket = pb // self.num_buckets, pb % self.num_buckets
        group = group.sort_by(
            [("term", "ascending"), ("seg_ord", "ascending"), ("chunk_ord", "ascending")]
        ).combine_chunks()
        has_pos = bool(group["has_pos"][0].as_py())

        # term run boundaries over the sorted chunk rows
        enc = group["term"].combine_chunks().dictionary_encode()
        codes = np.asarray(enc.indices)
        starts = np.flatnonzero(np.r_[True, codes[1:] != codes[:-1]])
        nterms = starts.size
        term_arr = pc.take(group["term"], pa.array(starts.astype(np.int64)))

        chunk_lens = np.asarray(
            pc.list_value_length(group["blk_n"].combine_chunks())
        ).astype(np.int64)
        per_term_nblocks = np.add.reduceat(chunk_lens, starts)
        out_offsets = np.zeros(nterms + 1, dtype=np.int64)
        np.cumsum(per_term_nblocks, out=out_offsets[1:])
        block_starts = out_offsets[:-1]

        def flat(c: str) -> np.ndarray:
            return np.asarray(group[c].combine_chunks().flatten())

        flat_n = flat("blk_n").astype(np.int64)
        flat_nb = flat("blk_nb").astype(np.int64)
        df = np.add.reduceat(flat_n, block_starts)
        cf_chunk = np.asarray(group["term_cf"]).astype(np.int64) * np.asarray(
            group["first_chunk"]
        )
        cf = np.add.reduceat(cf_chunk, starts)
        blk_off = np.cumsum(flat_nb) - flat_nb  # global byte offsets

        def out_list(vals: np.ndarray, typ=pa.int32()) -> pa.ListArray:
            return pa.ListArray.from_arrays(
                pa.array(out_offsets.astype(np.int32), pa.int32()),
                pa.array(vals, typ),
            )

        cols = {
            "term": term_arr.combine_chunks() if isinstance(term_arr, pa.ChunkedArray) else term_arr,
            "df": pa.array(df, pa.int64()),
            "cf": pa.array(cf, pa.int64()),
            "nblocks": pa.array(per_term_nblocks.astype(np.int32)),
            "blk_n": out_list(flat("blk_n").astype(np.int32)),
            "blk_last": out_list(flat("blk_last").astype(np.int32)),
            "blk_maxtf": out_list(flat("blk_maxtf").astype(np.int32)),
            "blk_mindl": out_list(flat("blk_mindl").astype(np.int32)),
            "blk_off": out_list(blk_off, pa.int64()),
            "blk_idsb": out_list(flat("blk_idsb").astype(np.int32)),
            "blk_nb": out_list(flat("blk_nb").astype(np.int32)),
        }
        if has_pos:
            flat_pnb = flat("blk_posnb").astype(np.int64)
            cols["blk_posoff"] = out_list(np.cumsum(flat_pnb) - flat_pnb, pa.int64())
            cols["blk_posnb"] = out_list(flat_pnb.astype(np.int32))

        bdir = os.path.join(self.out_dirs[part], f"bucket={bucket:03d}")
        os.makedirs(bdir, exist_ok=True)
        pq.write_table(pa.table(cols), os.path.join(bdir, "terms.parquet"))
        nbytes = self._write_binary_column(
            group["payload"], os.path.join(bdir, "postings.bin")
        )
        if has_pos:
            self._write_binary_column(
                group["pos_payload"], os.path.join(bdir, "positions.bin")
            )
        return pa.table(
            {
                "pb": pa.array([pb], pa.int64()),
                "nterms": pa.array([nterms], pa.int64()),
                "nbytes": pa.array([nbytes], pa.int64()),
            }
        )


def merge_partition_segments(
    index_dir: str,
    merges: dict[int, list[str]],
    num_buckets: int = 16,
    max_blocks_per_chunk: int = 1024,
    generation: int = 1,
) -> dict[int, str]:
    """Merge the given segments per partition (``part -> [seg_id, ...]``)
    in ONE Ray Data shuffle across all partitions. Returns
    ``part -> merged seg_id``. Old segments are deleted and partition /
    index manifests rewritten.

    Path contract (same as ``build_index``): ``index_dir`` must resolve
    to the same filesystem on every worker and the driver — bucket files
    are written by reduce tasks and manifested by the driver."""
    import ray.data as rd

    manifest = load_index_manifest(index_dir)
    descs = []
    out_tmp: dict[int, str] = {}
    merged_ids: dict[int, str] = {}
    doc_meta: dict[int, dict] = {}
    rewrite_plan: dict[int, list[str]] = {}
    for part, seg_ids in list(merges.items()):
        # multi-field and index-SORTED segments take the decode/re-encode
        # REWRITE merge (raydex.index.merge_rewrite — the per-field
        # SegmentMerger path, with MultiSorter doc reordering for sorted
        # inputs); the byte-splice machinery below covers the plain
        # primary-field-only layout
        needs_rewrite = False
        for sid in seg_ids:
            with open(os.path.join(_part_dir(index_dir, part), sid,
                                   "manifest.json")) as f:
                sm = json.load(f)
                if sm.get("fields") or sm.get("index_sort"):
                    needs_rewrite = True
                    break
        if needs_rewrite:
            rewrite_plan[part] = seg_ids
    for part, seg_ids in merges.items():
        if part in rewrite_plan:
            merged_ids[part] = f"mseg-{part:05d}-{generation:04d}"
            continue
        part_dir = _part_dir(index_dir, part)
        base = 0
        mseg_id = f"mseg-{part:05d}-{generation:04d}"
        merged_ids[part] = mseg_id
        tmp = os.path.join(part_dir, mseg_id) + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp, exist_ok=True)
        out_tmp[part] = tmp
        doc_tables, seg_manifests = [], []
        for ord_, sid in enumerate(sorted(seg_ids)):
            sd = os.path.join(part_dir, sid)
            if os.path.exists(os.path.join(sd, "livedocs.npy")):
                # merges RECLAIM deletes (Lucene merge semantics): a
                # byte-splice of a deleted-docs segment would rebase
                # docids and silently orphan/resurrect the bitmap, so
                # compact first — the merged output is deletes-free
                from raydex.index.compact import compact_segment

                compact_segment(sd)
            with open(os.path.join(sd, "manifest.json")) as f:
                sm = json.load(f)
            if sm.get("index_sort"):
                # concatenating two sorted segments breaks the index
                # sort; the reference merge-sorts docs (MultiSorter) —
                # not implemented for the splice path, refuse
                raise NotImplementedError(
                    f"segment {sid} is index-sorted "
                    f"({sm['index_sort']}); splice merge would break the "
                    f"sort order — compact/rebuild instead"
                )
            descs.append({"part": part, "seg_dir": sd, "seg_ord": ord_, "base": base})
            base += sm["doc_count"]
            doc_tables.append(pq.read_table(os.path.join(sd, "docs.parquet")))
            seg_manifests.append(sm)
        # promote: doc-write micro-segments store source columns the
        # bulk segments lack (docwrite.py) — missing columns fill null
        docs = pa.concat_tables(doc_tables, promote_options="default")
        pq.write_table(docs, os.path.join(tmp, "docs.parquet"))
        # build-cut segments carry disjoint url ranges, so the concat
        # stays url-sorted; a doc-write micro-segment OVERLAPS them —
        # emit the url_index sidecar so point GETs keep their bisect
        # contract (same rule as index-sorted segments)
        u = docs["url"].combine_chunks()
        import pyarrow.compute as _pc

        if len(u) > 1 and not _pc.all(
            _pc.less_equal(u.slice(0, len(u) - 1), u.slice(1))
        ).as_py():
            order = _pc.sort_indices(u)
            pq.write_table(
                pa.table({"url": u.take(order),
                          "docid": order.cast(pa.int64())}),
                os.path.join(tmp, "url_index.parquet"),
            )
        doc_meta[part] = {
            "doc_count": int(sum(m["doc_count"] for m in seg_manifests)),
            "sum_dl": int(sum(m["sum_dl"] for m in seg_manifests)),
            "analyzer": seg_manifests[0]["analyzer"],
            "positions": bool(seg_manifests[0].get("positions", False)),
            "input_fragments": sorted(
                {f for m in seg_manifests for f in m.get("input_fragments", [])}
            ),
        }

    if descs:
        chunker = _ChunkSegment(num_buckets, max_blocks_per_chunk)
        writer = _WriteBucket(out_tmp, num_buckets)

        def write_bucket(group: pa.Table) -> pa.Table:
            return writer(group)

        ds = rd.from_items(descs)
        stats = (
            ds.map_batches(chunker, batch_format="pyarrow", batch_size=1)
            .groupby("pb")
            .map_groups(write_bucket, batch_format="pyarrow")
        )
        bucket_rows = stats.to_pandas()
    else:
        import pandas as _pd

        bucket_rows = _pd.DataFrame({"pb": [], "nterms": []})

    to_delete: list[str] = []
    if rewrite_plan:
        # decode/re-encode merge per multi-field partition — one task
        # per partition (the same embarrassing parallelism as the build)
        from raydex.index.merge_rewrite import merge_segments_rewrite

        import ray as _ray

        if _ray.is_initialized():
            task = _ray.remote(num_cpus=1)(merge_segments_rewrite)
            _ray.get([
                task.remote(_part_dir(index_dir, p), sids, merged_ids[p])
                for p, sids in rewrite_plan.items()
            ])
        else:
            for p, sids in rewrite_plan.items():
                merge_segments_rewrite(_part_dir(index_dir, p), sids,
                                       merged_ids[p])
        for p, sids in rewrite_plan.items():
            part_dir = _part_dir(index_dir, p)
            to_delete.extend(os.path.join(part_dir, sid) for sid in sids)
            pm_path = os.path.join(part_dir, PART_MANIFEST)
            if os.path.exists(pm_path):
                with open(pm_path) as f:
                    pm = json.load(f)
                pm["segment_ids"] = sorted(
                    [s for s in pm["segment_ids"] if s not in set(sids)]
                    + [merged_ids[p]]
                )
                with open(pm_path + ".tmp", "w") as f:
                    json.dump(pm, f)
                os.replace(pm_path + ".tmp", pm_path)
    for part, tmp in out_tmp.items():
        buckets = sorted(
            d for d in os.listdir(tmp) if d.startswith("bucket=")
        )
        meta = doc_meta[part]
        nterms = int(
            bucket_rows[bucket_rows["pb"] // num_buckets == part]["nterms"].sum()
        )
        m = {
            "seg_id": merged_ids[part],
            "layout": "bucketed",
            "buckets": buckets,
            "analyzer": meta["analyzer"],
            "positions": meta.get("positions", False),
            "doc_count": meta["doc_count"],
            "sum_dl": meta["sum_dl"],
            "term_count": nterms,
            "max_df": 0,
            "input_fragments": meta["input_fragments"],
            "merged_from": sorted(merges[part]),
            "content_hash": "",
            "status": "complete",
        }
        with open(os.path.join(tmp, "manifest.json"), "w") as f:
            json.dump(m, f)
        final = tmp[: -len(".tmp")]
        os.replace(tmp, final)
        # update partition manifest; old segment dirs are deleted only AFTER
        # the index manifest commit below (a crash in between must leave an
        # openable index — the reference drops old segments only once the new
        # commit point is durable, e.g. IndexFileDeleter semantics)
        part_dir = _part_dir(index_dir, part)
        to_delete.extend(os.path.join(part_dir, sid) for sid in merges[part])
        pm_path = os.path.join(part_dir, PART_MANIFEST)
        if os.path.exists(pm_path):
            with open(pm_path) as f:
                pm = json.load(f)
            pm["segment_ids"] = sorted(
                [s for s in pm["segment_ids"] if s not in set(merges[part])]
                + [merged_ids[part]]
            )
            with open(pm_path + ".tmp", "w") as f:
                json.dump(pm, f)
            os.replace(pm_path + ".tmp", pm_path)

    # rewrite index manifest
    segs = [r for r in manifest["segments"] if not (
        r["part"] in merges and r["seg_id"] in set(merges[r["part"]])
    )]
    for part in merges:
        md = os.path.join(_part_dir(index_dir, part), merged_ids[part])
        with open(os.path.join(md, "manifest.json")) as f:
            sm = json.load(f)
        segs.append(
            {
                "part": part,
                "seg_id": merged_ids[part],
                "doc_count": sm["doc_count"],
                "sum_dl": sm["sum_dl"],
                "term_count": sm["term_count"],
                "max_df": sm["max_df"],
                "content_hash": sm["content_hash"],
                # per-field stats survive the rewrite merge (the global
                # per-field avgdl numerators the coordinator sums)
                "field_sum_dl": json.dumps(
                    {f: fm.get("sum_dl", 0)
                     for f, fm in sm.get("fields", {}).items()}
                ),
                "field_extra": json.dumps(
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
                        for f, fm in sm.get("fields", {}).items()
                        if fm.get("kind") in ("rank_feature", "dense_vector")
                    }
                ),
            }
        )
    segs.sort(key=lambda r: (r["part"], r["seg_id"]))
    manifest["segments"] = segs
    # doc totals were invariant under pure splicing; with reclaimed
    # deletes (compact-before-merge) they shrink — recompute from rows
    manifest["doc_count"] = int(sum(r["doc_count"] for r in segs))
    manifest["sum_dl"] = int(sum(r["sum_dl"] for r in segs))
    if manifest.get("fields"):
        fsums: dict[str, int] = {}
        for r in segs:
            for f, v in json.loads(r.get("field_sum_dl") or "{}").items():
                fsums[f] = fsums.get(f, 0) + int(v)
        for f, meta in manifest["fields"].items():
            meta["sum_dl"] = fsums.get(f, meta.get("sum_dl", 0))
    from raydex.index.build import INDEX_MANIFEST

    tmp = os.path.join(index_dir, INDEX_MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, os.path.join(index_dir, INDEX_MANIFEST))
    # new commit point durable -> now safe to drop the merged inputs
    for d in to_delete:
        shutil.rmtree(d, ignore_errors=True)
    return merged_ids


def choose_merges(index_dir: str) -> dict[int, list[str]]:
    """Tiered selection using the ported policy constants: merge when a
    partition holds more than SEGMENTS_PER_TIER segments; pick the
    MAX_MERGE_AT_ONCE smallest (size-floored), capped by max merged
    bytes."""
    manifest = load_index_manifest(index_dir)
    by_part: dict[int, list[dict]] = {}
    for r in manifest["segments"]:
        by_part.setdefault(r["part"], []).append(r)
    plan: dict[int, list[str]] = {}
    for part, segs in by_part.items():
        if len(segs) <= SEGMENTS_PER_TIER:
            continue
        sized = []
        for r in segs:
            sd = os.path.join(_part_dir(index_dir, part), r["seg_id"])
            sz = 0
            for root, _, files in os.walk(sd):
                sz += sum(os.path.getsize(os.path.join(root, f)) for f in files)
            sized.append((max(sz, FLOOR_SEGMENT_BYTES), r["seg_id"]))
        sized.sort()
        chosen, total = [], 0
        for sz, sid in sized[:MAX_MERGE_AT_ONCE]:
            if total + sz > MAX_MERGED_SEGMENT_BYTES:
                break
            chosen.append(sid)
            total += sz
        if len(chosen) >= 2:
            plan[part] = chosen
    return plan


def merge_index(index_dir: str, generation: int = 1, **kw) -> dict[int, str]:
    plan = choose_merges(index_dir)
    if not plan:
        return {}
    return merge_partition_segments(index_dir, plan, generation=generation, **kw)
