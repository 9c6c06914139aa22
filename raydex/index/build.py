"""Distributed inverted-index build — the `_bulk` ingest analogue as a
Ray Data pipeline (SURVEY.md §3.1 "our shape").

    read_parquet(pages)                               # prune to needed cols
      -> map_batches(prepare)                         # extract/verify text,
                                                      #   murmur3 partition id
      -> groupby("part").map_groups(build_partition)  # THE explicit shuffle:
                                                      #   latest-wins dedup,
                                                      #   url-sorted doc order,
                                                      #   cut + write segments
      -> driver collects the (tiny) manifest table    # index manifest

Reference mapping: the murmur3 routing mirrors
``server/.../cluster/routing/OperationRouting.java:220-242``; the
latest-wins url dedup is the ``_id`` version-map semantics
(``server/.../index/engine/InternalEngine.java:896-907``); per-partition
url-sorted doc order is the deterministic-ordering rule (SURVEY.md §7
hard-part 6); segments are flushed every ``max_docs_per_segment`` docs —
the indexing-buffer flush analogue
(``server/.../indices/IndexingMemoryController.java:41-60``).

Scale notes (100 TB): ``html`` never crosses the shuffle — ``prepare``
extracts text and projects it away, so shuffled bytes ≈ text bytes; a
partition is the unit that must fit one worker (exactly an ES shard's
contract) — choose ``num_partitions`` ≥ corpus_bytes / a-few-GB;
tokenization+encode happen inside the per-partition group task, fully
parallel across partitions. Resumability: each partition directory gets
a ``partition_manifest.json`` on completion (atomic rename); a resumed
build filters completed partitions out BEFORE the shuffle, so finished
work costs one hash-filter pass, not a rebuild.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from raydex.partition import route_partitions

INDEX_MANIFEST = "index_manifest.json"
PART_MANIFEST = "partition_manifest.json"


def _part_dir(index_dir: str, p: int) -> str:
    return os.path.join(index_dir, f"part={p:05d}")


def completed_partitions(index_dir: str) -> set[int]:
    done = set()
    if not os.path.isdir(index_dir):
        return done
    for name in os.listdir(index_dir):
        if name.startswith("part=") and os.path.exists(
            os.path.join(index_dir, name, PART_MANIFEST)
        ):
            done.add(int(name.split("=")[1]))
    return done


class _Prepare:
    """Stateless batch prepare: text extraction/verification + routing.

    ``source='text'`` uses the text column as-is; ``'html'`` extracts
    (html_strip); ``'verify'`` extracts AND asserts byte-identity with
    the text column (the per-row invariant from BASELINE.json).
    """

    def __init__(self, num_partitions: int, source: str, skip_parts: frozenset[int],
                 carry_cols: tuple[str, ...] = (), join_source: str | None = None):
        self.num_partitions = num_partitions
        self.source = source
        self.skip_parts = skip_parts
        # extra source columns for index-time mapped fields: shuffled
        # alongside text (they are url/lang-sized, not html-sized)
        self.carry_cols = carry_cols
        # join-field source column: routing switches from murmur3(url)
        # to murmur3(parent ?? url) so children co-locate with their
        # parent (the parent-join `routing` requirement,
        # `ParentJoinFieldMapper.java` / `OperationRouting.java`)
        self.join_source = join_source

    def __call__(self, batch: pa.Table) -> pa.Table:
        from raydex.analysis.html_strip import extract_text_many

        urls = batch["url"].to_pylist()
        if self.source == "text":
            texts = batch["text"]
        else:
            extracted = extract_text_many(batch["html"].to_pylist())
            if self.source == "verify":
                want = batch["text"].to_pylist()
                for u, got, w in zip(urls, extracted, want):
                    if got != w:
                        raise ValueError(f"extracted text != text column for url={u!r}")
            texts = pa.array(extracted, type=pa.large_string())
        if self.join_source is not None:
            from raydex.index.joinfield import join_routing_keys

            rkeys = join_routing_keys(batch[self.join_source], urls)
        else:
            rkeys = urls
        part = route_partitions(rkeys, self.num_partitions)
        cols = {
            "url": batch["url"],
            "warc_ts": batch["warc_ts"],
            "text": texts,
            "part": pa.array(part, type=pa.int32()),
        }
        for c in self.carry_cols:
            if c not in cols:
                cols[c] = batch[c]
        out = pa.table(cols)
        if self.skip_parts:
            mask = np.isin(part, np.fromiter(self.skip_parts, dtype=np.int32), invert=True)
            out = out.filter(pa.array(mask))
        return out


class _BuildPartition:
    """Per-group (one partition) segment cutter. Runs inside the shuffle."""

    def __init__(self, index_dir, analyzer, max_docs_per_segment, dedup, lineage,
                 store_positions=False, fields=None, index_sort=None):
        self.index_dir = index_dir
        self.analyzer = analyzer
        self.max_docs = max_docs_per_segment
        self.dedup = dedup
        self.lineage = lineage
        self.store_positions = store_positions
        self.fields = fields or []  # list[FieldSpec]
        # (field, order) index-time sort (IndexSortConfig): docs within
        # each segment are stored in this order instead of url order
        self.index_sort = tuple(index_sort) if index_sort else None

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Build every partition present in the (hash-partitioned) batch.

        The shuffle guarantees each ``part`` value lands wholly in one
        block, but a block may carry several partitions — loop over them.
        """
        if batch.num_rows == 0:
            return _manifest_schema_empty()
        parts = pc.unique(batch["part"]).to_pylist()
        outs = [
            self._build_one(batch.filter(pc.equal(batch["part"], p)), int(p))
            for p in sorted(parts)
        ]
        return pa.concat_tables(outs)

    def _build_one(self, group: pa.Table, p: int) -> pa.Table:
        from raydex.index.segment import build_segment

        t0 = time.perf_counter()
        # deterministic doc order: sort by (url, warc_ts, text);
        # latest-wins dedup keeps the last row per url
        group = group.sort_by(
            [("url", "ascending"), ("warc_ts", "ascending"), ("text", "ascending")]
        )
        urls = np.asarray(group["url"].to_pylist(), dtype=object)
        if self.dedup and urls.size:
            keep = np.ones(urls.size, dtype=bool)
            keep[:-1] = urls[:-1] != urls[1:]  # last occurrence per url
            idx = np.flatnonzero(keep)
        else:
            idx = np.arange(urls.size)
        if self.index_sort:
            # re-sort the deduped rows by the sort field (stable; url
            # tie-break inherited from the dedup sort order)
            sfield, sorder = self.index_sort
            svals = group[sfield].take(pa.array(idx)).combine_chunks()
            keys = svals.cast(pa.timestamp("us")).cast(pa.int64()).to_numpy() \
                if pa.types.is_timestamp(svals.type) else \
                svals.to_numpy(zero_copy_only=False)
            # stable in BOTH directions (negate, don't reverse): equal
            # keys keep the deduped url order
            sidx = np.argsort(-keys if sorder == "desc" else keys,
                              kind="stable")
            idx = idx[sidx]
        texts = group["text"].take(pa.array(idx))  # stays Arrow (zero-copy path)
        kept_urls = [str(u) for u in urls[idx]]
        def _source_col(spec):
            if isinstance(spec.source, (list, tuple)):
                # copy_to: concatenate the source columns into ONE
                # analyzed value per doc (space-joined, nulls -> "")
                parts = [
                    group[c].combine_chunks().cast(pa.large_string())
                    for c in spec.source
                ]
                sep = pa.scalar(" ", pa.large_string())
                return pc.binary_join_element_wise(
                    *parts, sep, null_handling="replace",
                    null_replacement="",
                )
            return group[spec.source]

        field_vals = {
            spec.name: _source_col(spec).take(pa.array(idx))
            for spec in self.fields
            if spec.analyzer != "alias"  # alias: source names a FIELD
        }
        sort_dv = (
            {self.index_sort[0]: group[self.index_sort[0]].take(pa.array(idx)).combine_chunks()}
            if self.index_sort else None
        )

        part_dir = _part_dir(self.index_dir, p)
        os.makedirs(part_dir, exist_ok=True)
        rows = []
        nsegs = -(-len(kept_urls) // self.max_docs) if kept_urls else 0
        for s in range(nsegs):
            lo, hi = s * self.max_docs, min((s + 1) * self.max_docs, len(kept_urls))
            seg_id = f"seg-{p:05d}-{s:04d}"
            seg_dir = os.path.join(part_dir, seg_id)
            if os.path.exists(os.path.join(seg_dir, "manifest.json")):
                with open(os.path.join(seg_dir, "manifest.json")) as f:
                    m = json.load(f)  # idempotent re-run: reuse
            else:
                m = build_segment(
                    seg_dir,
                    kept_urls[lo:hi],
                    texts[lo:hi],
                    analyzer=self.analyzer,
                    input_fragments=self.lineage,
                    seg_id=seg_id,
                    store_positions=self.store_positions,
                    extra_fields=[
                        (spec, v[lo:hi] if (v := field_vals.get(spec.name))
                         is not None else None)
                        for spec in self.fields
                    ],
                    doc_values=(
                        {k: v.slice(lo, hi - lo) for k, v in sort_dv.items()}
                        if sort_dv else None
                    ),
                    index_sort=self.index_sort,
                )
            rows.append(
                {
                    "part": p,
                    "seg_id": seg_id,
                    "doc_count": m["doc_count"],
                    "sum_dl": m["sum_dl"],
                    "term_count": m["term_count"],
                    "max_df": m["max_df"],
                    "content_hash": m["content_hash"],
                    "field_sum_dl": json.dumps(
                        {f: fm["sum_dl"] for f, fm in m.get("fields", {}).items()}
                    ),
                    # rank_feature global stats (default-pivot inputs)
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
                            for f, fm in m.get("fields", {}).items()
                            if fm.get("kind") in ("rank_feature", "dense_vector")
                        }
                    ),
                }
            )
        wall = time.perf_counter() - t0
        pm = {
            "partition_id": p,
            "segment_ids": [r["seg_id"] for r in rows],
            "input_fragments": self.lineage,
            "doc_count": int(sum(r["doc_count"] for r in rows)),
            "sum_dl": int(sum(r["sum_dl"] for r in rows)),
            "term_count": int(sum(r["term_count"] for r in rows)),
            "max_df": int(max((r["max_df"] for r in rows), default=0)),
            "content_hash": "|".join(r["content_hash"] for r in rows),
            "docs_per_sec": round(sum(r["doc_count"] for r in rows) / max(wall, 1e-9), 2),
            "build_sec": round(wall, 4),
            "status": "complete",
        }
        tmp = os.path.join(part_dir, PART_MANIFEST + ".tmp")
        with open(tmp, "w") as f:
            json.dump(pm, f)
        os.replace(tmp, os.path.join(part_dir, PART_MANIFEST))
        return pa.Table.from_pylist(rows, schema=_MANIFEST_SCHEMA)


_MANIFEST_SCHEMA = pa.schema(
    [
        ("part", pa.int32()),
        ("seg_id", pa.string()),
        ("doc_count", pa.int64()),
        ("sum_dl", pa.int64()),
        ("term_count", pa.int64()),
        ("max_df", pa.int64()),
        ("content_hash", pa.string()),
        ("field_sum_dl", pa.string()),  # JSON {field: sum_dl} for mapped fields
        ("field_extra", pa.string()),   # JSON rank_feature stats per field
    ]
)


def _manifest_schema_empty() -> pa.Table:
    return _MANIFEST_SCHEMA.empty_table()


_RESERVED_COLS = ("url", "warc_ts", "html", "text")


def infer_dynamic_fields(schema: pa.Schema, reserved=_RESERVED_COLS) -> list:
    """Dynamic mapping inference (the reference's
    ``DynamicFieldsBuilder.java`` / ``DynamicTemplate.java``): unknown
    keys get a mapper from their token type. JSON token types arrive
    here as the Arrow types the NDJSON reader already inferred:
    string -> analyzed text field; integer/float/boolean/timestamp ->
    keyword field over the literal (term-queryable, matching the
    reference's exact-value semantics for non-text dynamics). Nested
    list/struct columns are skipped (the reference recurses via
    ObjectMapper; out of scope here)."""
    from raydex.index.segment import FieldSpec

    specs = []
    for name, typ in zip(schema.names, schema.types):
        if name in reserved:
            continue
        if pa.types.is_string(typ) or pa.types.is_large_string(typ):
            specs.append(FieldSpec(name, name, "standard"))
        elif (
            pa.types.is_integer(typ)
            or pa.types.is_floating(typ)
            or pa.types.is_boolean(typ)
            or pa.types.is_timestamp(typ)
        ):
            specs.append(FieldSpec(name, name, "keyword"))
    return specs


def build_index(
    input_path,
    index_dir: str,
    num_partitions: int = 32,
    analyzer: str = "standard_en",
    source: str = "text",
    dedup: bool = True,
    max_docs_per_segment: int = 50_000,
    resume: bool = False,
    ray_ds=None,
    store_positions: bool = False,
    fields=None,
    dynamic_fields: bool = False,
    index_sort: tuple[str, str] | None = None,
) -> dict:
    """Run the build; returns the index manifest dict.

    ``input_path`` may be a file/dir (read_parquet) or pre-built Dataset
    via ``ray_ds``. ``source``: 'text' | 'html' | 'verify'.
    ``fields``: optional list of :class:`raydex.index.segment.FieldSpec`
    — index-time mapped fields beyond the primary text field (the
    reference's multi-field mappings, ``MapperService.java``); their
    source columns are pruned at the read and shuffled with the text.

    Path contract: ``index_dir`` must be visible at the SAME path from
    every Ray worker and the driver — on one node any local dir works; on
    a multi-node cluster it must be a shared mount (NFS/FUSE-mounted
    object store). Segment files are written by workers and stitched into
    a manifest by the driver, exactly like the reference's
    shard-on-shared-nothing-disks model requires node-local paths per
    shard; here the partition directory IS the shard directory.
    """
    import ray
    import ray.data as rd
    from ray.data.context import DataContext, ShuffleStrategy

    if os.path.exists(os.path.join(index_dir, "index_state.json")):
        from raydex.index.blocks import check_write

        check_write(index_dir)  # closed / write-blocked index

    # key-based repartition requires the hash-shuffle backend (also the
    # right choice for this workload: no global sort needed). Cap the
    # aggregator actor pool and its CPU reservation so the shuffle does
    # not starve the read/prepare/build stages (measured: uncapped
    # aggregators serialize the pipeline on small CPU counts). The
    # overrides are SCOPED to this build — other pipelines (groupby /
    # map_groups) keep the default sort-shuffle backend.
    ctx = DataContext.get_current()
    saved = (
        ctx.shuffle_strategy,
        ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override,
        ctx.max_hash_shuffle_aggregators,
    )
    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    # Aggregator actors reserve (override x partitions/aggregator) CPUs
    # EACH (ray.data hash_shuffle.py _get_aggregator_ray_remote_args), so
    # a fixed per-partition override deadlocks small clusters: at 4 CPUs
    # with 128 partitions, 0.25 -> 16-CPU actors that never schedule.
    # Scale it so the WHOLE aggregator pool reserves <= half the cluster.
    ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = float(
        os.environ.get(
            "RAYDEX_SHUFFLE_CPU_PER_PART",
            min(0.25, ncpu / (2.0 * max(num_partitions, 1))),
        )
    )
    ctx.max_hash_shuffle_aggregators = int(
        os.environ.get("RAYDEX_SHUFFLE_AGGS", str(max(2, ncpu // 2)))
    )
    try:
        if dynamic_fields:
            # schema probe (metadata-only for parquet; first file for
            # NDJSON) -> inferred FieldSpecs merged with explicit ones
            if ray_ds is not None:
                sch = ray_ds.schema()
                schema = getattr(sch, "base_schema", sch)
            else:
                p0 = input_path if isinstance(input_path, str) else input_path[0]
                probe = (
                    rd.read_json(p0, file_extensions=["json", "jsonl", "ndjson"])
                    if p0.endswith((".json", ".ndjson", ".jsonl"))
                    else rd.read_parquet(p0)
                )
                sch = probe.schema()
                schema = getattr(sch, "base_schema", sch)
            have = {s.name for s in (fields or [])}
            fields = list(fields or []) + [
                s for s in infer_dynamic_fields(schema) if s.name not in have
            ]
        if index_sort is not None:
            sfield, sorder = index_sort
            if sfield != "warc_ts" or sorder not in ("asc", "desc"):
                raise ValueError(
                    "index_sort supports ('warc_ts', 'asc'|'desc') — the "
                    "stored timestamp doc-values column (IndexSortConfig "
                    "restricts sorts to indexed doc-values fields the same "
                    "way)"
                )
        return _build_index_inner(
            input_path, index_dir, num_partitions, analyzer, source, dedup,
            max_docs_per_segment, resume, ray_ds, rd, ncpu,
            t0=time.perf_counter(), store_positions=store_positions,
            fields=fields, index_sort=index_sort,
        )
    finally:
        (
            ctx.shuffle_strategy,
            ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override,
            ctx.max_hash_shuffle_aggregators,
        ) = saved


def _build_index_inner(
    input_path, index_dir, num_partitions, analyzer, source, dedup,
    max_docs_per_segment, resume, ray_ds, rd, ncpu, t0, store_positions=False,
    fields=None, index_sort=None,
) -> dict:
    import pyarrow as pa

    fields = list(fields or [])
    join_specs = [s for s in fields if s.analyzer == "join"]
    if len(join_specs) > 1:
        raise ValueError(
            "only one join field may be defined per index "
            "(ParentJoinFieldMapper enforces the same)"
        )
    if join_specs:
        from raydex.index.joinfield import validate_relations

        validate_relations(join_specs[0].relations or {})
    join_source = join_specs[0].source if join_specs else None
    names = {s.name for s in fields} | {"text"}
    alias_names = {s.name for s in fields if s.analyzer == "alias"}
    for s in fields:
        if s.analyzer != "alias":
            continue
        if s.source not in names:
            raise ValueError(
                f"alias field {s.name!r} targets unknown field {s.source!r}"
            )
        if s.source == s.name or s.source in alias_names:
            # the reference's FieldAliasMapper rejects alias->alias at
            # mapping time; resolving one at query time would recurse
            raise ValueError(
                f"alias field {s.name!r} cannot target another alias "
                f"({s.source!r})"
            )
    os.makedirs(index_dir, exist_ok=True)
    # Resume safety: record the routing-relevant build parameters once and
    # fail fast if a resumed build would mix two layouts (e.g. a different
    # num_partitions silently re-routes urls, dropping/duplicating docs).
    params = {
        "num_partitions": num_partitions,
        "analyzer": analyzer,
        "source": source,
        "dedup": bool(dedup),
        "max_docs_per_segment": max_docs_per_segment,
        "store_positions": bool(store_positions),
        "fields": [s.to_json() for s in fields],
        "index_sort": list(index_sort) if index_sort else None,
    }
    params_path = os.path.join(index_dir, "build_params.json")
    if os.path.exists(params_path):
        with open(params_path) as f:
            prev = json.load(f)
        prev.setdefault("fields", [])  # pre-multi-field indexes
        prev.setdefault("index_sort", None)
        if resume and prev != params:
            diff = {k: (prev.get(k), v) for k, v in params.items() if prev.get(k) != v}
            raise ValueError(
                f"resume=True with different build parameters than the original "
                f"build (old, new): {diff}; delete {index_dir} or match the "
                f"original parameters"
            )
    ptmp = params_path + ".tmp"
    with open(ptmp, "w") as f:
        json.dump(params, f)
    os.replace(ptmp, params_path)
    skip = frozenset(completed_partitions(index_dir)) if resume else frozenset()

    cols = ["url", "warc_ts", "text"]
    if source in ("html", "verify"):
        cols = ["url", "warc_ts", "html"] + (["text"] if source == "verify" else [])
    carry = tuple(
        dict.fromkeys(
            src
            for s in fields
            if s.analyzer != "alias"
            # copy_to-style fields take a LIST of source columns,
            # concatenated at build (TextFieldMapper copy_to semantics)
            for src in (s.source if isinstance(s.source, (list, tuple))
                        else [s.source])
            if src not in cols
        )
    )
    cols = cols + list(carry)
    if ray_ds is None:
        # `_bulk`'s native wire format is NDJSON (one doc per line —
        # TransportBulkAction.java:88); parquet stays the columnar fast
        # path (column pruning at the read)
        p0 = input_path if isinstance(input_path, str) else input_path[0]
        if p0.endswith((".json", ".ndjson", ".jsonl")):
            ds = rd.read_json(
                input_path, file_extensions=["json", "jsonl", "ndjson"]
            ).select_columns(cols)
        else:
            ds = rd.read_parquet(input_path, columns=cols)
        lineage = [input_path] if isinstance(input_path, str) else list(input_path)
    else:
        ds = ray_ds
        lineage = ["<dataset>"]
    # a Dataset snapshots its DataContext at creation — a caller-provided
    # dataset may carry the default sort-shuffle strategy; override the
    # captured context too, or the keys= repartition refuses to plan
    from ray.data.context import DataContext as _DC, ShuffleStrategy as _SS

    _plan = getattr(ds, "_plan", None)
    if _plan is not None and getattr(_plan, "_context", None) is not None:
        # detach first: derived datasets share the parent's context by
        # reference, so an in-place override would leak into the
        # caller's upstream lineage (see raydex.shuffle docstring)
        import copy as _copy

        _plan._context = _copy.deepcopy(_plan._context)
    dctx = getattr(ds, "context", None)
    if dctx is not None:
        cur = _DC.get_current()
        dctx.shuffle_strategy = _SS.HASH_SHUFFLE
        # mirror the scaled values build_index computed on the current
        # context (a hardcoded per-partition CPU here deadlocks small
        # clusters the same way the outer default would)
        dctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = (
            cur.hash_shuffle_operator_actor_num_cpus_per_partition_override
        )
        dctx.max_hash_shuffle_aggregators = cur.max_hash_shuffle_aggregators

    prepared = ds.map_batches(
        _Prepare(num_partitions, source, skip, carry_cols=carry,
                 join_source=join_source),
        batch_format="pyarrow",
        batch_size=2048,
    )
    builder = _BuildPartition(index_dir, analyzer, max_docs_per_segment, dedup,
                              lineage, store_positions=store_positions,
                              fields=fields, index_sort=index_sort)

    def build_partition(batch: pa.Table) -> pa.Table:
        return builder(batch)

    # THE routing shuffle: hash-repartition rows by `part` so each
    # partition lands wholly in one block, then build per block with full
    # task parallelism (one task per block; batch_size=None = whole
    # block). num_blocks <= 2*CPUs: each block may carry several
    # partitions (built sequentially inside the task) — more partitions
    # per block smooths hash-placement skew.
    num_blocks = min(num_partitions, 2 * ncpu)
    # Segment build is allocation/memory-bandwidth heavy; on hosts whose
    # bus saturates below the core count, RESERVING more than one CPU
    # per build task (fewer concurrent builds, each faster) lowers total
    # wall time. Tunable per host: RAYDEX_BUILD_TASK_CPUS (default 1 =
    # full task parallelism, the right choice on real hardware).
    task_cpus = int(os.environ.get("RAYDEX_BUILD_TASK_CPUS", "1"))
    manifests = prepared.repartition(num_blocks=num_blocks, keys=["part"]).map_batches(
        build_partition, batch_format="pyarrow", batch_size=None,
        num_cpus=task_cpus,
    )
    batches = [
        pa.Table.from_batches([b]) if isinstance(b, pa.RecordBatch) else b
        for b in manifests.iter_batches(batch_format="pyarrow")
    ]
    mtable = pa.concat_tables(batches or [_manifest_schema_empty()])
    if os.environ.get("RAYDEX_STATS"):
        # per-stage wall/cpu/memory breakdown (ds.stats()) for profiling
        try:
            with open(os.path.join(index_dir, "build_stats.txt"), "w") as f:
                f.write(manifests.stats())
        except Exception:
            pass

    segs = mtable.to_pylist()
    # merge with pre-existing (resumed) partitions
    for p in sorted(skip):
        with open(os.path.join(_part_dir(index_dir, p), PART_MANIFEST)) as f:
            pm = json.load(f)
        for sid in pm["segment_ids"]:
            with open(os.path.join(_part_dir(index_dir, p), sid, "manifest.json")) as f:
                m = json.load(f)
            segs.append(
                {
                    "part": p,
                    "seg_id": sid,
                    "doc_count": m["doc_count"],
                    "sum_dl": m["sum_dl"],
                    "term_count": m["term_count"],
                    "max_df": m["max_df"],
                    "content_hash": m["content_hash"],
                    "field_sum_dl": json.dumps(
                        {f: fm["sum_dl"] for f, fm in m.get("fields", {}).items()}
                    ),
                    # rank_feature global stats (default-pivot inputs)
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
                            for f, fm in m.get("fields", {}).items()
                            if fm.get("kind") in ("rank_feature", "dense_vector")
                        }
                    ),
                }
            )
    segs.sort(key=lambda r: (r["part"], r["seg_id"]))
    # exact GLOBAL per-field sum_dl (the per-field avgdl numerator) — the
    # dfs_query_then_fetch-style stats multi_match/combined_fields score with
    field_sum_dl: dict[str, int] = {}
    field_extra: dict[str, dict] = {}
    for r in segs:
        for f, v in json.loads(r.get("field_sum_dl") or "{}").items():
            field_sum_dl[f] = field_sum_dl.get(f, 0) + int(v)
        for f, fx in json.loads(r.get("field_extra") or "{}").items():
            acc = field_extra.setdefault(
                f, {"value_count": 0, "sum_ln": 0.0, "positive_count": 0}
            )
            acc["value_count"] += int(fx.get("value_count", 0))
            acc["sum_ln"] += float(fx.get("sum_ln", 0.0))
            acc["positive_count"] += int(fx.get("positive_count", 0))
    manifest = {
        "index_dir": index_dir,
        "analyzer": analyzer,
        "positions": bool(store_positions),
        "index_sort": list(index_sort) if index_sort else None,
        "num_partitions": num_partitions,
        "doc_count": int(sum(r["doc_count"] for r in segs)),
        "sum_dl": int(sum(r["sum_dl"] for r in segs)),
        "fields": {
            s.name: {"source": s.source, "analyzer": s.analyzer,
                     "positions": bool(s.store_positions),
                     "sum_dl": field_sum_dl.get(s.name, 0),
                     **({"dims": int(s.dims), "similarity": s.similarity}
                        if s.analyzer == "dense_vector" else {}),
                     **({"relations": s.relations}
                        if s.analyzer == "join" else {}),
                     **field_extra.get(s.name, {})}
            for s in fields
        },
        "segments": segs,
        "lineage": lineage,
        "build_sec": round(time.perf_counter() - t0, 3),
        "resumed_partitions": sorted(skip),
    }
    manifest["docs_per_sec"] = round(
        manifest["doc_count"] / max(manifest["build_sec"], 1e-9), 2
    )
    # partition skew metrics (the north rule's throughput/skew report:
    # routing hot-spots surface here — a skew_ratio near 1.0 means the
    # murmur3 routing balanced the corpus; per-partition docs_per_sec
    # lives in each partition_manifest.json)
    per_part: dict[int, int] = {}
    for r in segs:
        per_part[r["part"]] = per_part.get(r["part"], 0) + int(r["doc_count"])
    if per_part:
        counts = sorted(per_part.values())
        mean = sum(counts) / len(counts)
        manifest["partition_skew"] = {
            "partitions_with_docs": len(counts),
            "min_docs": counts[0],
            "max_docs": counts[-1],
            "mean_docs": round(mean, 1),
            "skew_ratio": round(counts[-1] / max(mean, 1e-9), 3),
        }
    tmp = os.path.join(index_dir, INDEX_MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, os.path.join(index_dir, INDEX_MANIFEST))
    return manifest


def load_index_manifest(index_dir: str) -> dict:
    with open(os.path.join(index_dir, INDEX_MANIFEST)) as f:
        return json.load(f)


def segment_dirs(index_dir: str, manifest: dict | None = None) -> list[str]:
    """Deterministic global segment order = (part asc, seg_id asc) — the
    shard-index order used for cross-shard tie-breaks (TopDocs.merge)."""
    m = manifest or load_index_manifest(index_dir)
    return [
        os.path.join(_part_dir(index_dir, r["part"]), r["seg_id"]) for r in m["segments"]
    ]
