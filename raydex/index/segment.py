"""Immutable segment build + read (the Lucene-segment analogue).

A segment is a directory of Arrow/binary artifacts (SURVEY.md §1.3):

    seg-<id>/
      terms.parquet     term (sorted), df, cf, block metadata list-columns
      docs.parquet      url, dl (raw token count), norm (SmallFloat byte)
      postings.bin      block varint payload (raydex.index.postings)
      manifest.json     doc_count, sum_dl, term_count, lineage, hash, status

Doc ids are per-segment ordinals in **input row order** (the build
pipeline sorts each partition's rows by url before cutting segments, so
ordering is deterministic — SURVEY.md §7 hard-part 6). The write is
atomic: artifacts land in ``<dir>.tmp`` which is renamed on completion;
a reader only ever sees complete segments (the translog/checkpoint
analogue at batch granularity, reference semantics
``server/.../index/translog/Translog.java:78-89``).

Block-max ``min_dl`` metadata is computed over the **quantized** doc
lengths (SmallFloat round-trip) so WAND bounds match BM25 scoring
exactly.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from dataclasses import dataclass

from raydex.analysis.smallfloat import byte4_to_int, int_to_byte4
from raydex.analysis.tokenizer import get_analyzer
from raydex.index.postings import encode_postings


def version_sort_key(v) -> str | None:
    """Semver-ordered sort key for the ``version`` field type
    (VersionStringFieldMapper): numeric runs zero-padded to fixed width
    so lexicographic order equals semantic order (1.10.0 > 1.9.0)."""
    import re as _re

    if v is None:
        return None
    parts = _re.split(r"(\d+)", str(v))
    return "".join(p.zfill(12) if p.isdigit() else p for p in parts)


@dataclass(frozen=True)
class FieldSpec:
    """An index-time mapped field (the reference's per-field mapper,
    ``server/.../index/mapper/TextFieldMapper.java:81-99`` /
    ``KeywordFieldMapper.java``): one source column indexed with its own
    analyzer into its own postings + norms. The primary ``text`` field is
    implicit; extra fields live under ``<seg>/field=<name>/`` in the full
    segment layout, so every query feature (WAND, phrase, expansion)
    works per field unchanged."""

    name: str
    source: str
    analyzer: str = "keywordish"
    store_positions: bool = False
    # dense_vector-only params (`DenseVectorFieldMapper.java`, mapper
    # dims + similarity + index_options): ignored by text/keyword kinds.
    # ivf_nlist > 0 builds a per-segment IVF structure (the reference's
    # per-segment ANN graph analogue — its HNSW is also an
    # index_options choice): knn may then probe nprobe clusters
    # instead of the full matmul. Cosine-only (clusters live on the
    # unit sphere).
    dims: int = 0
    similarity: str = "cosine"
    ivf_nlist: int = 0
    # join-only (`ParentJoinFieldMapper`'s `relations` parameter):
    # {parent: [child, ...]}. One join field per index.
    relations: dict | None = None
    # scaled_float-only (`ScaledFloatFieldMapper`): doubles stored as
    # round(v * scaling_factor) int64 doc-values
    scaling_factor: float = 0.0
    # aggregate_metric_double-only (`AggregateDoubleMetricFieldMapper`'s
    # `default_metric` parameter): the sub-metric queries/sorts read
    default_metric: str = ""

    def to_json(self) -> dict:
        out = {
            "name": self.name,
            "source": self.source,
            "analyzer": self.analyzer,
            "store_positions": bool(self.store_positions),
        }
        if self.analyzer == "dense_vector":
            out["dims"] = int(self.dims)
            out["similarity"] = self.similarity
            out["ivf_nlist"] = int(self.ivf_nlist)
        if self.analyzer == "join":
            out["relations"] = self.relations
        if self.analyzer == "scaled_float":
            out["scaling_factor"] = float(self.scaling_factor)
        if self.analyzer == "aggregate_metric_double":
            out["default_metric"] = self.default_metric or "max"
        return out

    @staticmethod
    def from_json(d: dict) -> "FieldSpec":
        return FieldSpec(
            d["name"], d["source"], d.get("analyzer", "keywordish"),
            bool(d.get("store_positions", False)),
            int(d.get("dims", 0)), d.get("similarity", "cosine"),
            int(d.get("ivf_nlist", 0)), d.get("relations"),
            float(d.get("scaling_factor", 0.0)),
            d.get("default_metric", ""),
        )


def _agg_metric_columns(arr) -> dict:
    """Parse an aggregate_metric_double source column (struct with
    min/max/sum/value_count children, or JSON strings) into the four
    float64/int64 sub-arrays."""
    if pa.types.is_struct(arr.type):
        return {
            "min": pc.struct_field(arr, "min").cast(pa.float64()),
            "max": pc.struct_field(arr, "max").cast(pa.float64()),
            "sum": pc.struct_field(arr, "sum").cast(pa.float64()),
            "value_count": pc.struct_field(arr, "value_count").cast(
                pa.int64()),
        }
    objs = [json.loads(v) if v is not None else {}
            for v in arr.cast(pa.string()).to_pylist()]
    return {
        "min": pa.array([o.get("min") for o in objs], pa.float64()),
        "max": pa.array([o.get("max") for o in objs], pa.float64()),
        "sum": pa.array([o.get("sum") for o in objs], pa.float64()),
        "value_count": pa.array([o.get("value_count") for o in objs],
                                pa.int64()),
    }


def _histogram_columns(arr) -> tuple:
    """Parse a histogram-field source column (struct with values/counts
    list children, or JSON strings) into (list<double>, list<int64>)."""
    if pa.types.is_struct(arr.type):
        return (pc.struct_field(arr, "values").cast(pa.list_(pa.float64())),
                pc.struct_field(arr, "counts").cast(pa.list_(pa.int64())))
    objs = [json.loads(v) if v is not None else {}
            for v in arr.cast(pa.string()).to_pylist()]
    return (pa.array([o.get("values") or [] for o in objs],
                     pa.list_(pa.float64())),
            pa.array([o.get("counts") or [] for o in objs],
                     pa.list_(pa.int64())))


def _list_col(flat: np.ndarray, counts: np.ndarray, typ: pa.DataType) -> pa.ListArray:
    offsets = np.zeros(counts.size + 1, dtype=np.int32)
    np.cumsum(counts, out=offsets[1:])
    return pa.ListArray.from_arrays(pa.array(offsets), pa.array(flat, type=typ))


def build_segment(
    out_dir: str,
    urls: list[str],
    texts: list[str],
    analyzer: str = "standard_en",
    input_fragments: list[str] | None = None,
    seg_id: str | None = None,
    store_positions: bool = False,
    extra_fields: list[tuple["FieldSpec", object]] | None = None,
    doc_values: dict[str, "pa.Array"] | None = None,
    index_sort: tuple[str, str] | None = None,
) -> dict:
    """Tokenize docs, build the inverted index, write one segment.

    Returns the manifest dict. ``urls``/``texts`` arrive in final doc
    order (docid = position). ``store_positions=True`` additionally
    writes ``positions.bin`` (per-posting delta-varint token positions,
    stop-filter gaps preserved) — the reference `text` field's
    ``DOCS_AND_FREQS_AND_POSITIONS`` option
    (``TextFieldMapper.java:99``), enabling phrase queries.

    ``extra_fields``: [(FieldSpec, values)] — each builds a complete
    per-field sub-index under ``<seg>/field=<name>/`` (own term dict,
    postings, norms, manifest) over the SAME doc ordinals, mirroring the
    reference's one-Lucene-field-per-mapper model. The whole segment
    (primary + fields) commits with ONE atomic rename.

    ``doc_values``: extra stored per-doc columns appended to
    docs.parquet (aligned with doc order). ``index_sort``: records that
    the caller ordered docs by (field, order) — the reference's
    ``IndexSortConfig`` — and, since doc order then no longer follows
    url, writes a ``url_index.parquet`` sidecar (url sorted -> docid)
    so point GETs keep their one-bisect contract.
    """
    seg_id = seg_id or ("seg-" + uuid.uuid4().hex[:12])
    tmp = out_dir + ".tmp"
    manifest = _build_field_index(
        tmp, urls, texts, analyzer, input_fragments, seg_id, store_positions
    )
    if doc_values:
        d = pq.read_table(os.path.join(tmp, "docs.parquet"))
        for cname, arr in doc_values.items():
            d = d.append_column(cname, arr)
        pq.write_table(d, os.path.join(tmp, "docs.parquet"))
    if index_sort:
        sfield, sorder = index_sort
        manifest["index_sort"] = [sfield, sorder]
        if doc_values and sfield in doc_values:
            sv = doc_values[sfield]
            if pa.types.is_timestamp(sv.type):  # JSON-safe: epoch micros
                sv = sv.cast(pa.timestamp("us")).cast(pa.int64())
            vals = sv.to_pylist()
            manifest[f"min_{sfield}"] = min(vals) if vals else None
            manifest[f"max_{sfield}"] = max(vals) if vals else None
        order = np.argsort(np.asarray(urls, dtype=object), kind="stable")
        pq.write_table(
            pa.table(
                {
                    "url": pa.array(np.asarray(urls, dtype=object)[order],
                                    pa.string()),
                    "docid": pa.array(order.astype(np.int64)),
                }
            ),
            os.path.join(tmp, "url_index.parquet"),
        )
        with open(os.path.join(tmp, "manifest.json"), "w") as f:
            json.dump(manifest, f)
    fields_meta: dict[str, dict] = {}
    # numeric / date field types (NumberFieldMapper / DateFieldMapper):
    # stored doc-values columns in docs.parquet with per-segment min/max
    # in the manifest (range can-match + field sort use them)
    _DV_KINDS = ("long", "double", "date", "scaled_float", "token_count",
                 "murmur3", "size", "boolean", "ip",
                 "long_range", "double_range", "date_range", "geo_point",
                 "geo_shape", "integer", "short", "byte", "float",
                 "half_float", "unsigned_long", "binary", "version",
                 "constant_keyword", "aggregate_metric_double",
                 "histogram")
    dv_specs = [
        (s, v) for s, v in (extra_fields or []) if s.analyzer in _DV_KINDS
    ]
    if dv_specs:
        import pyarrow.compute as _pc

        d = pq.read_table(os.path.join(tmp, "docs.parquet"))
        for spec, values in dv_specs:
            arr = values if isinstance(values, (pa.Array, pa.ChunkedArray)) \
                else pa.array(values)
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            extra_meta: dict = {}
            if spec.analyzer == "constant_keyword":
                # x-pack mapper-constant-keyword
                # (ConstantKeywordFieldMapper.java): ONE value for every
                # doc of the index; the first non-null value pins it and
                # a conflicting value REJECTS at index time. Stored as a
                # (trivially dictionary-compressed) doc-values column so
                # terms/cardinality/missing aggs ride the generic path.
                arr = arr.cast(pa.string())
                uniq = [u for u in _pc.unique(arr).to_pylist()
                        if u is not None]
                if len(uniq) > 1:
                    raise ValueError(
                        f"constant_keyword field {spec.name!r} holds "
                        f"conflicting values {sorted(uniq)[:3]}")
                value = uniq[0] if uniq else None
                if value is not None:
                    arr = _pc.fill_null(arr, value)
                d = d.append_column(spec.name, arr)
                manifest[f"min_{spec.name}"] = value
                manifest[f"max_{spec.name}"] = value
                fields_meta[spec.name] = {
                    "kind": "doc_values", "analyzer": "constant_keyword",
                    "source": spec.source, "sum_dl": 0,
                    "constant_value": value,
                }
                continue
            if spec.analyzer == "aggregate_metric_double":
                # x-pack mapper-aggregate-metric
                # (AggregateDoubleMetricFieldMapper.java): per-doc
                # PRE-AGGREGATED {min,max,sum,value_count} — four
                # doc-values sub-columns; queries/sorts read the
                # default_metric sub-column (stored under the field's
                # own name so range/sort ride the generic numeric path)
                sub = _agg_metric_columns(arr)
                dm = spec.default_metric or "max"
                for mname, marr in sub.items():
                    d = d.append_column(f"{spec.name}__{mname}", marr)
                d = d.append_column(spec.name, sub[dm])
                manifest[f"min_{spec.name}"] = _pc.min(sub[dm]).as_py()
                manifest[f"max_{spec.name}"] = _pc.max(sub[dm]).as_py()
                fields_meta[spec.name] = {
                    "kind": "doc_values",
                    "analyzer": "aggregate_metric_double",
                    "source": spec.source, "sum_dl": 0,
                    "default_metric": dm,
                }
                continue
            if spec.analyzer == "histogram":
                # x-pack analytics histogram field
                # (HistogramFieldMapper.java): per-doc pre-aggregated
                # (values, counts) pairs — two list sub-columns; not
                # searchable (exists only), consumed by the metric /
                # percentiles aggs which re-weight the pairs
                hvals, hcnts = _histogram_columns(arr)
                d = d.append_column(f"{spec.name}__values", hvals)
                d = d.append_column(f"{spec.name}__counts", hcnts)
                fields_meta[spec.name] = {
                    "kind": "doc_values", "analyzer": "histogram",
                    "source": spec.source, "sum_dl": 0,
                }
                continue
            if spec.analyzer == "long":
                arr = arr.cast(pa.int64())
            elif spec.analyzer in ("integer", "short", "byte"):
                # narrow-int mappers (NumberFieldMapper.NumberType):
                # out-of-range values REJECT at index time like the
                # reference's coercion bounds; storage stays int64
                bound = {"integer": 2**31, "short": 2**15,
                         "byte": 2**7}[spec.analyzer]
                arr = arr.cast(pa.int64())
                mn_, mx_ = _pc.min(arr).as_py(), _pc.max(arr).as_py()
                if mn_ is not None and (mn_ < -bound or mx_ >= bound):
                    raise ValueError(
                        f"value out of range for {spec.analyzer} "
                        f"field {spec.name!r}")
            elif spec.analyzer == "double":
                arr = arr.cast(pa.float64())
            elif spec.analyzer == "float":
                # float32 storage precision: values quantize through a
                # float32 round-trip exactly like the reference's
                # FloatPoint encoding
                arr = arr.cast(pa.float32()).cast(pa.float64())
            elif spec.analyzer == "half_float":
                # HalfFloatPoint: IEEE float16 round-trip quantization
                f16 = arr.cast(pa.float64()).to_numpy(
                    zero_copy_only=False).astype(np.float16)
                arr = pa.array(f16.astype(np.float64), pa.float64())
            elif spec.analyzer == "unsigned_long":
                arr = arr.cast(pa.uint64())
            elif spec.analyzer == "binary":
                # BinaryFieldMapper: opaque stored blob — doc-values
                # only (surfaced by the fetch phase; not queryable,
                # like the reference's non-indexed binary default)
                arr = arr.cast(pa.large_binary())
            elif spec.analyzer == "version":
                # VersionStringFieldMapper: the raw string column plus
                # a semver-ordered sort key (numeric parts zero-padded)
                # so range/sort compare semantically (1.10.0 > 1.9.0)
                raw = arr.cast(pa.string())
                d = d.append_column(
                    f"{spec.name}__sort",
                    pa.array([version_sort_key(v)
                              for v in raw.to_pylist()], pa.string()))
                arr = raw
            elif spec.analyzer == "scaled_float":
                # ScaledFloatFieldMapper: round(v * factor) stored as
                # int64 (lossy exactly like the reference's encoding)
                factor = float(spec.scaling_factor or 100.0)
                arr = _pc.round(
                    _pc.multiply(arr.cast(pa.float64()), factor)
                ).cast(pa.int64())
                extra_meta["scaling_factor"] = factor
            elif spec.analyzer == "murmur3":
                # mapper-murmur3 plugin: value hash stored as a long
                # doc-values field (cardinality pre-hashing). Deviation:
                # murmur3_x86_32 (the routing hash) instead of the
                # plugin's 128-bit msb — same use, narrower hash.
                from raydex.partition import murmur3_hash_many

                vals = ["" if v is None else str(v) for v in arr.to_pylist()]
                arr = pa.array(
                    murmur3_hash_many(vals).astype("int64"), pa.int64()
                )
            elif spec.analyzer == "size":
                # mapper-size plugin: _size = source byte length
                arr = _pc.binary_length(
                    arr.cast(pa.large_binary())
                ).cast(pa.int64())
            elif spec.analyzer == "boolean":
                # BooleanFieldMapper: true/false (bool or string input)
                # stored as int64 0/1 doc-values
                if pa.types.is_string(arr.type) or \
                        pa.types.is_large_string(arr.type):
                    arr = _pc.equal(_pc.utf8_lower(arr), "true")
                arr = arr.cast(pa.bool_()).cast(pa.int64())
            elif spec.analyzer == "ip":
                # IpFieldMapper: dotted-quad IPv4 stored as the numeric
                # address in int64 doc-values (deviation: IPv4 only —
                # the reference packs v6 into 16-byte sorted terms;
                # 128-bit values exceed this engine's int64 columns)
                from raydex.ops.aggs import _ipv4_to_u32

                vals, valid = _ipv4_to_u32(arr, strict=False)
                arr = pa.array(
                    np.where(valid, vals.astype("int64"), 0),
                    pa.int64())
            elif spec.analyzer in ("long_range", "double_range",
                                   "date_range"):
                # RangeFieldMapper: per-doc [gte, lte] interval from a
                # struct<gte, lte> (or list[2]) source column, stored
                # as TWO doc-values columns <f>__gte / <f>__lte
                typ = (pa.float64() if spec.analyzer == "double_range"
                       else pa.int64())
                if pa.types.is_struct(arr.type):
                    gte = arr.field("gte")
                    lte = arr.field("lte")
                elif pa.types.is_list(arr.type) or \
                        pa.types.is_large_list(arr.type):
                    flat = arr.flatten()
                    gte = flat[0::2]
                    lte = flat[1::2]
                else:
                    raise ValueError(
                        f"range field {spec.name!r} needs a "
                        f"struct<gte, lte> or list[2] source column")
                if spec.analyzer == "date_range":
                    gte = gte.cast(pa.timestamp("us")).cast(pa.int64())
                    lte = lte.cast(pa.timestamp("us")).cast(pa.int64())
                gte, lte = gte.cast(typ), lte.cast(typ)
                d = d.append_column(f"{spec.name}__gte", gte)
                d = d.append_column(f"{spec.name}__lte", lte)
                manifest[f"min_{spec.name}"] = _pc.min(gte).as_py()
                manifest[f"max_{spec.name}"] = _pc.max(lte).as_py()
                fields_meta[spec.name] = {
                    "kind": "range", "analyzer": spec.analyzer,
                    "source": spec.source, "sum_dl": 0,
                }
                continue
            elif spec.analyzer == "geo_point":
                # GeoPointFieldMapper: per-doc lat/lon as TWO float64
                # doc-values columns (<f>__lat, <f>__lon) from a
                # struct<lat, lon> or "lat,lon" string source column;
                # manifest bounds give bbox can-match an axis
                if pa.types.is_struct(arr.type):
                    la = arr.field("lat").cast(pa.float64())
                    lo2 = arr.field("lon").cast(pa.float64())
                else:
                    parts = _pc.split_pattern(
                        arr.cast(pa.string()), ",")
                    flat = _pc.list_flatten(parts)
                    nums = _pc.cast(_pc.utf8_trim_whitespace(flat),
                                    pa.float64())
                    npn = nums.to_numpy(zero_copy_only=False)
                    la = pa.array(npn[0::2], pa.float64())
                    lo2 = pa.array(npn[1::2], pa.float64())
                d = d.append_column(f"{spec.name}__lat", la)
                d = d.append_column(f"{spec.name}__lon", lo2)
                manifest[f"min_{spec.name}__lat"] = _pc.min(la).as_py()
                manifest[f"max_{spec.name}__lat"] = _pc.max(la).as_py()
                manifest[f"min_{spec.name}__lon"] = _pc.min(lo2).as_py()
                manifest[f"max_{spec.name}__lon"] = _pc.max(lo2).as_py()
                fields_meta[spec.name] = {
                    "kind": "geo_point", "analyzer": "geo_point",
                    "source": spec.source, "sum_dl": 0,
                }
                continue
            elif spec.analyzer == "geo_shape":
                # GeoShapeFieldMapper analogue: the shape itself is a
                # stored GeoJSON string doc-value (<f>__shape) and its
                # bounding box four float64 doc-values columns — the
                # vectorized candidate filter for every relation (the
                # reference's LatLonShape BKD tree serves the same
                # role); exact relate runs only on bbox survivors.
                # Source: a JSON string column or a struct column.
                import json as _json

                if pa.types.is_struct(arr.type):
                    shp_objs = arr.to_pylist()
                    shp_strs = [_json.dumps(o, sort_keys=True)
                                if o is not None else None
                                for o in shp_objs]
                else:
                    shp_strs = arr.cast(pa.string()).to_pylist()
                    shp_objs = [_json.loads(s) if s is not None else None
                                for s in shp_strs]
                from raydex.ops.geo import shape_bbox

                bb = np.full((len(shp_objs), 4), np.nan, np.float64)
                for bi, o in enumerate(shp_objs):
                    if o is not None:
                        bb[bi] = shape_bbox(o)
                d = d.append_column(f"{spec.name}__shape",
                                    pa.array(shp_strs, pa.string()))
                for ci, cname in enumerate(("minlon", "minlat",
                                            "maxlon", "maxlat")):
                    d = d.append_column(f"{spec.name}__{cname}",
                                        pa.array(bb[:, ci], pa.float64()))
                if np.isfinite(bb).any():
                    manifest[f"min_{spec.name}__lon"] = float(
                        np.nanmin(bb[:, 0]))
                    manifest[f"min_{spec.name}__lat"] = float(
                        np.nanmin(bb[:, 1]))
                    manifest[f"max_{spec.name}__lon"] = float(
                        np.nanmax(bb[:, 2]))
                    manifest[f"max_{spec.name}__lat"] = float(
                        np.nanmax(bb[:, 3]))
                fields_meta[spec.name] = {
                    "kind": "geo_shape", "analyzer": "geo_shape",
                    "source": spec.source, "sum_dl": 0,
                }
                continue
            elif spec.analyzer == "token_count":
                # TokenCountFieldMapper: number of analyzed tokens of the
                # source string, with the index analyzer
                from raydex.analysis.tokenizer import get_analyzer

                an = get_analyzer(analyzer)
                arr = pa.array(
                    [len(an(v)) if v is not None else None
                     for v in arr.to_pylist()],
                    pa.int64(),
                )
            else:  # date
                arr = arr.cast(pa.timestamp("us"))
            if spec.name not in d.column_names:  # may double as sort col
                d = d.append_column(spec.name, arr)
            stat = arr.cast(pa.int64()) if spec.analyzer == "date" else arr
            if spec.analyzer == "binary":
                mn = mx = None  # opaque blobs: no ordered stats (and
                # bytes would not survive the JSON manifest)
            else:
                try:
                    mn, mx = (_pc.min(stat).as_py(),
                              _pc.max(stat).as_py())
                except pa.ArrowNotImplementedError:
                    mn = mx = None
            if spec.analyzer == "scaled_float" and mn is not None:
                # manifest bounds in DECODED units: can-match compares
                # them against the query's (unscaled) range bounds
                mn, mx = mn / factor, mx / factor
            manifest[f"min_{spec.name}"] = mn
            manifest[f"max_{spec.name}"] = mx
            fields_meta[spec.name] = {
                "kind": "doc_values", "analyzer": spec.analyzer,
                "source": spec.source, "sum_dl": 0, **extra_meta,
            }
        pq.write_table(d, os.path.join(tmp, "docs.parquet"))
        with open(os.path.join(tmp, "manifest.json"), "w") as f:
            json.dump(manifest, f)
    for spec, values in extra_fields or []:
        if spec.analyzer in _DV_KINDS:
            continue
        fdir = os.path.join(tmp, f"field={spec.name}")
        if spec.analyzer == "rank_feature":
            fields_meta[spec.name] = _build_rank_feature(fdir, spec, values)
            continue
        if spec.analyzer == "completion":
            fields_meta[spec.name] = _build_completion(fdir, spec, values)
            continue
        if spec.analyzer == "rank_features":
            fields_meta[spec.name] = _build_rank_features(fdir, spec, values)
            continue
        if spec.analyzer == "dense_vector":
            fields_meta[spec.name] = _build_dense_vector(fdir, spec, values)
            continue
        if spec.analyzer == "join":
            from raydex.index.joinfield import build_join_field

            fields_meta[spec.name] = build_join_field(fdir, spec, values, urls)
            continue
        if spec.analyzer == "flattened":
            # x-pack flattened mapper (FlattenedFieldMapper.java): one
            # field indexing an arbitrary JSON object's leaves as
            # keywords — bare values (root queries) + `path\0value`
            # keyed terms, both in ONE postings sub-index (the mapper's
            # root/keyed field pair collapses to a term-prefix split)
            fm = _build_field_index(
                fdir, urls, values, "flattened_leaves", input_fragments,
                f"{seg_id}-f-{spec.name}", False,
            )
            fields_meta[spec.name] = {
                "kind": "flattened", "analyzer": "flattened",
                "source": spec.source, "sum_dl": fm["sum_dl"],
                "term_count": fm["term_count"],
            }
            continue
        if spec.analyzer == "match_only_text":
            # MatchOnlyTextFieldMapper (mapper-extras): analyzed with the
            # INDEX analyzer, but queries score as if freq == 1 and
            # norms are disabled (per-term idf) — the space-saving text
            # variant. The sub-index reuses the text layout; the query
            # side reads only doc membership.
            fm = _build_field_index(
                fdir, urls, values, analyzer, input_fragments,
                f"{seg_id}-f-{spec.name}", False,
            )
            fields_meta[spec.name] = {
                "kind": "match_only_text", "analyzer": "match_only_text",
                "source": spec.source, "sum_dl": fm["sum_dl"],
                "term_count": fm["term_count"],
            }
            continue
        if spec.analyzer == "alias":
            # FieldAliasMapper: no index structure, just a path pointer
            # resolved at query time (spec.source names the TARGET field)
            fields_meta[spec.name] = {
                "kind": "alias", "analyzer": "alias",
                "path": spec.source, "sum_dl": 0,
            }
            continue
        if spec.analyzer == "wildcard":
            # x-pack wildcard plugin (WildcardFieldMapper.java): a
            # lowercased anchored-3-gram sub-index for APPROXIMATE
            # candidate selection + the raw value stored as a parent
            # doc-values column for exact verification (the reference
            # verifies against a binary doc-value with an automaton).
            # Matching is case-insensitive, like the mapper's
            # normalized ngram field.
            fm = _build_field_index(
                fdir, urls, values, "wildcard_3gram", input_fragments,
                f"{seg_id}-f-{spec.name}", False,
            )
            d = pq.read_table(os.path.join(tmp, "docs.parquet"))
            # nulls STAY null (a doc without a value must not match
            # "*"; "" would) — list and arrow inputs behave identically
            arr = values if isinstance(values, (pa.Array, pa.ChunkedArray)) \
                else pa.array([None if v is None else str(v)
                               for v in values], pa.string())
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            arr = arr.cast(pa.string())
            if spec.name not in d.column_names:
                d = d.append_column(spec.name, arr)
                pq.write_table(d, os.path.join(tmp, "docs.parquet"))
            fields_meta[spec.name] = {
                "kind": "wildcard", "analyzer": "wildcard",
                "source": spec.source, "sum_dl": fm["sum_dl"],
                "term_count": fm["term_count"],
            }
            continue
        fm = _build_field_index(
            fdir, urls, values, spec.analyzer, input_fragments,
            f"{seg_id}-f-{spec.name}", spec.store_positions,
        )
        fields_meta[spec.name] = {
            "analyzer": spec.analyzer,
            "source": spec.source,
            "positions": bool(spec.store_positions),
            "sum_dl": fm["sum_dl"],
            "term_count": fm["term_count"],
        }
    if fields_meta:
        manifest["fields"] = fields_meta
        with open(os.path.join(tmp, "manifest.json"), "w") as f:
            json.dump(manifest, f)
    os.replace(tmp, out_dir)  # atomic completion (primary + all fields)
    return manifest


def _build_rank_feature(fdir: str, spec: FieldSpec, values) -> dict:
    """rank_feature field (`RankFeatureFieldMapper`, mapper-extras):
    one strictly-positive float per doc, stored as a doc-values column
    (`feature.parquet`, float32 — the reference quantizes harder, to a
    9-significant-bit freq via FeatureField; we keep float32 and score
    in float64, documented precision difference). Nulls = doc has no
    feature (the query's mask). Negative values are rejected exactly
    like the reference mapper."""
    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        arr = values.cast(pa.float32())
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
    else:
        arr = pa.array(list(values), type=pa.float32())
    vals = arr.to_numpy(zero_copy_only=False)
    finite = vals[~np.isnan(vals)]
    if finite.size and float(finite.min()) < 0:
        raise ValueError(
            f"rank_feature field {spec.name!r} requires non-negative values"
        )
    os.makedirs(fdir, exist_ok=True)
    pq.write_table(pa.table({"value": arr}), os.path.join(fdir, "feature.parquet"))
    return {
        "analyzer": "rank_feature",
        "source": spec.source,
        "kind": "rank_feature",
        "sum_dl": 0,       # no token lengths: numeric doc-values field
        "term_count": 0,
        "value_count": int(finite.size),
        # per-segment sum of ln(v) over positive values -> the
        # coordinator can derive the reference's default pivot
        # (geometric mean of feature values) globally
        "sum_ln": float(np.log(finite[finite > 0]).sum()) if finite.size else 0.0,
        "positive_count": int((finite > 0).sum()),
    }


_VECTOR_SIMILARITIES = ("cosine", "dot_product", "l2_norm", "max_inner_product")


def _build_dense_vector(fdir: str, spec: FieldSpec, values) -> dict:
    """dense_vector field (``DenseVectorFieldMapper.java``, mapper): one
    fixed-dims float32 vector per doc, stored as doc-values
    (``vectors.parquet``, fixed_size_list<float32, dims>). Nulls = doc
    has no vector (excluded from knn, like the reference's missing
    vector values). ``similarity='cosine'`` rejects zero-magnitude
    vectors exactly like the reference mapper; dims are validated per
    row (the strict-dims contract)."""
    if spec.similarity not in _VECTOR_SIMILARITIES:
        raise ValueError(
            f"dense_vector field {spec.name!r}: unknown similarity "
            f"{spec.similarity!r}; one of {_VECTOR_SIMILARITIES}"
        )
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    if not isinstance(values, (pa.ListArray, pa.LargeListArray,
                               pa.FixedSizeListArray)):
        values = pa.array(values.to_pylist() if hasattr(values, "to_pylist")
                          else list(values), type=pa.list_(pa.float32()))
    lens = pc.list_value_length(values)
    nn = pc.drop_null(lens)
    dims = int(spec.dims) or (int(nn[0].as_py()) if len(nn) else 0)
    if dims <= 0:
        raise ValueError(
            f"dense_vector field {spec.name!r}: dims not given and no "
            f"non-null vector to infer from"
        )
    bad = pc.any(pc.not_equal(pc.fill_null(lens, dims), dims)).as_py()
    if bad:
        raise ValueError(
            f"dense_vector field {spec.name!r}: a vector's length != dims "
            f"({dims})"
        )
    ndocs = len(values)
    valid = np.asarray(pc.is_valid(lens))
    flat = pc.list_flatten(values).cast(pa.float32())
    mat = np.full((ndocs, dims), np.nan, dtype=np.float32)
    if valid.any():
        mat[valid] = np.asarray(flat).reshape(-1, dims)
    if spec.similarity == "cosine" and valid.any():
        mags = np.linalg.norm(mat[valid].astype(np.float64), axis=1)
        if (mags == 0).any():
            raise ValueError(
                f"dense_vector field {spec.name!r}: cosine similarity "
                f"rejects zero-magnitude vectors (reference mapper contract)"
            )
    # plain list<float32> (not fixed_size_list): parquet rejects null FSL
    # rows ("non-zero length null components"); every non-null row is
    # dims-long by the validation above, so the reader reshapes safely
    counts = np.where(valid, dims, 0).astype(np.int64)
    offsets = np.zeros(ndocs + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    flat_valid = mat[valid].reshape(-1) if valid.any() else np.empty(0, np.float32)
    col = pa.LargeListArray.from_arrays(
        pa.array(offsets), pa.array(flat_valid, type=pa.float32()),
        mask=pa.array(~valid),
    )
    os.makedirs(fdir, exist_ok=True)
    pq.write_table(pa.table({"vec": col}), os.path.join(fdir, "vectors.parquet"))
    nlist = 0
    if spec.ivf_nlist > 0 and valid.any():
        if spec.similarity != "cosine":
            raise ValueError(
                f"dense_vector field {spec.name!r}: ivf_nlist requires "
                f"similarity='cosine' (clusters live on the unit sphere)"
            )
        nlist = min(int(spec.ivf_nlist), int(valid.sum()))
        vmat = mat[valid].astype(np.float64)
        vnorm = vmat / np.linalg.norm(vmat, axis=1, keepdims=True)
        # k-means-lite on the segment's own vectors (deterministic):
        # the per-segment ANN structure the reference builds per
        # segment too (its HNSW graph is also segment-local)
        rng = np.random.default_rng(11)
        cents = vnorm[rng.choice(vnorm.shape[0], size=nlist, replace=False)]
        for _ in range(5):
            assign = np.argmax(vnorm @ cents.T, axis=1)
            for j in range(nlist):
                sel = assign == j
                if sel.any():
                    cents[j] = vnorm[sel].mean(axis=0)
            cents /= np.linalg.norm(cents, axis=1, keepdims=True)
        assign = np.argmax(vnorm @ cents.T, axis=1)
        np.save(os.path.join(fdir, "ivf_centroids.npy"),
                cents.astype(np.float32))
        pq.write_table(
            pa.table({"cluster": pa.array(assign.astype(np.int32))}),
            os.path.join(fdir, "ivf.parquet"),
        )
    return {
        "analyzer": "dense_vector",
        "source": spec.source,
        "kind": "dense_vector",
        "dims": dims,
        "similarity": spec.similarity,
        "ivf_nlist": nlist,
        "sum_dl": 0,
        "term_count": 0,
        "value_count": int(valid.sum()),
    }


def _build_rank_features(fdir: str, spec: FieldSpec, values) -> dict:
    """rank_features field (plural — ``RankFeaturesFieldMapper.java``):
    a SPARSE per-doc map of feature name -> positive float. Stored
    long-form (docid, name, value) sorted by (name, docid); the reader
    materializes a dense per-feature doc-values array on first use, so
    ``rank_feature`` queries on ``<field>.<name>`` run unchanged.
    Source column: map<string, float> or struct-typed dicts."""
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    docids: list[int] = []
    names: list[str] = []
    vals: list[float] = []
    for d, item in enumerate(values.to_pylist()):
        if item is None:
            continue
        pairs = item.items() if isinstance(item, dict) else item  # map -> list
        for k, v in pairs:
            if v is None:
                continue
            v = float(v)
            if v < 0:
                raise ValueError(
                    f"rank_features field {spec.name!r} requires non-negative "
                    f"values (feature {k!r})"
                )
            docids.append(d)
            names.append(str(k))
            vals.append(v)
    order = np.lexsort(
        (np.asarray(docids, dtype=np.int64), np.asarray(names, dtype=object))
    ) if names else np.empty(0, dtype=np.int64)
    t = pa.table(
        {
            "docid": pa.array(np.asarray(docids, dtype=np.int64)[order]),
            "name": pa.array(np.asarray(names, dtype=object)[order], pa.string()),
            "value": pa.array(
                np.asarray(vals, dtype=np.float32)[order], pa.float32()
            ),
        }
    )
    os.makedirs(fdir, exist_ok=True)
    pq.write_table(t, os.path.join(fdir, "features.parquet"))
    return {
        "analyzer": "rank_features",
        "source": spec.source,
        "kind": "rank_features",
        "sum_dl": 0,
        "term_count": len({*names}),
        "value_count": len(vals),
    }


def _build_completion(fdir: str, spec: FieldSpec, values) -> dict:
    """completion field (`CompletionFieldMapper.java`, suggest/completion):
    the reference builds a weighted FST over per-doc suggestion inputs;
    here the dedicated structure is an input-SORTED arrow table
    (input, weight, docid) — prefix search = one binary-search range +
    top-k by weight, the same contract (top weighted completions for a
    prefix) with O(log n + range) lookups.

    Source column: struct<input: string, weight: int> (multiple inputs
    per doc via list<struct> also accepted) or a plain string column
    (weight=1). An entry dict may also carry ``contexts`` — a mapping
    of category-context name -> value or list of values
    (``suggest/completion/context/CategoryContextMapping.java``) —
    stored flattened as ``name\\x00value`` tokens per entry for
    query-time filter/boost."""
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    inputs: list[str] = []
    weights: list[int] = []
    docids: list[int] = []
    ctxs: list[list[str]] = []

    def _ctx_tokens(c) -> list[str]:
        out: list[str] = []
        for name, vals in (c or {}).items():
            if vals is None:
                continue
            for v in (vals if isinstance(vals, (list, tuple)) else [vals]):
                if v is None:
                    continue
                if isinstance(v, dict) and "lat" in v and "lon" in v:
                    # geo context (GeoContextMapping): the point is
                    # indexed as its geohash cell at precision 6 (the
                    # reference default); query-time matching is by
                    # cell prefix, so coarser query precisions match
                    from raydex.ops.geo import geohash_encode

                    v = geohash_encode([float(v["lat"])],
                                       [float(v["lon"])], precision=6)[0]
                out.append(f"{name}\x00{v}")
        return out

    def add(d: int, item) -> None:
        if item is None:
            return
        if isinstance(item, str):
            inputs.append(item); weights.append(1); docids.append(d)
            ctxs.append([])
        elif isinstance(item, dict):
            if item.get("input") is None:
                return
            inputs.append(str(item["input"]))
            weights.append(int(item.get("weight") or 1))
            docids.append(d)
            ctxs.append(_ctx_tokens(item.get("contexts")))
        elif isinstance(item, list):
            for sub in item:
                add(d, sub)
        else:
            raise ValueError(
                f"completion field {spec.name!r}: unsupported entry {type(item)}"
            )

    for d, item in enumerate(values.to_pylist()):
        add(d, item)
    order = np.lexsort(
        (np.asarray(docids, dtype=np.int64),
         np.asarray(inputs, dtype=object))
    ) if inputs else np.empty(0, dtype=np.int64)
    t = pa.table(
        {
            "input": pa.array(np.asarray(inputs, dtype=object)[order], pa.string()),
            "weight": pa.array(np.asarray(weights, dtype=np.int64)[order]),
            "docid": pa.array(np.asarray(docids, dtype=np.int64)[order]),
            "contexts": pa.array(
                [ctxs[i] for i in order], pa.list_(pa.string())),
        }
    )
    os.makedirs(fdir, exist_ok=True)
    pq.write_table(t, os.path.join(fdir, "completion.parquet"))
    return {
        "analyzer": "completion",
        "source": spec.source,
        "kind": "completion",
        "sum_dl": 0,
        "term_count": len(inputs),
        "input_count": len(inputs),
    }


def _build_field_index(
    tmp: str,
    urls: list[str],
    texts,
    analyzer: str,
    input_fragments: list[str] | None,
    seg_id: str,
    store_positions: bool,
) -> dict:
    """Build one field's full index layout into ``tmp`` (no rename —
    the caller owns the atomic commit)."""
    t0 = time.perf_counter()
    an = get_analyzer(analyzer)
    ndocs = len(urls)
    if analyzer in ("standard", "standard_en"):
        # Arrow-native hot path: tokens never become Python objects
        # (allocation traffic is the scaling ceiling — see module doc of
        # raydex.analysis.arrow_tokenize and BASELINE.md)
        from raydex.analysis.arrow_tokenize import encode_terms, tokenize_batch
        from raydex.analysis.tokenizer import ENGLISH_STOP_SET

        stop = ENGLISH_STOP_SET if analyzer == "standard_en" else None
        flat_tokens, doc_of, flat_pos = tokenize_batch(
            texts, stopwords=stop, store_positions=store_positions
        )
        inverse, terms = encode_terms(flat_tokens)
        dl = np.bincount(doc_of, minlength=ndocs).astype(np.int64)
    else:
        vals = texts.to_pylist() if hasattr(texts, "to_pylist") else list(texts)
        vals = ["" if v is None else str(v) for v in vals]
        tokens = an.analyze_many(vals)
        if store_positions:
            tok_pos = an.analyze_many_with_positions(vals)
            tokens = [tp[0] for tp in tok_pos]
            pos_lists = [tp[1] for tp in tok_pos]
        dl = np.fromiter((len(t) for t in tokens), dtype=np.int64, count=ndocs)
        flat_list: list[str] = []
        for toks in tokens:
            flat_list.extend(toks)
        flat_arr = np.array(flat_list, dtype=object)
        doc_of = np.repeat(np.arange(ndocs, dtype=np.int64), dl)
        if flat_arr.size:
            import pandas as pd

            codes, uniques = pd.factorize(flat_arr, sort=False)
            uniq_arr = np.asarray(uniques, dtype=object)
            order = np.argsort(uniq_arr, kind="stable")
            rank = np.empty_like(order)
            rank[order] = np.arange(order.size)
            terms = uniq_arr[order]
            inverse = rank[codes]
        else:
            terms = np.empty(0, dtype=object)
            inverse = np.empty(0, dtype=np.int64)
        if store_positions:
            flat_pos = np.empty(flat_arr.size, dtype=np.int64)
            i = 0
            for pl in pos_lists:
                flat_pos[i : i + len(pl)] = pl
                i += len(pl)
        else:
            flat_pos = None

    if inverse.size:
        key = inverse.astype(np.int64) * ndocs + doc_of
        uniq_key, tfs = np.unique(key, return_counts=True)
        docids = uniq_key % ndocs
        term_idx = uniq_key // ndocs
        df = np.bincount(term_idx, minlength=terms.size).astype(np.int64)
        cf = np.bincount(term_idx, weights=tfs, minlength=terms.size).astype(np.int64)
        term_offsets = np.zeros(terms.size + 1, dtype=np.int64)
        np.cumsum(df, out=term_offsets[1:])
        if store_positions:
            # stable sort by (term, doc) keeps occurrences pos-ascending
            occ_order = np.argsort(key, kind="stable")
            sorted_pos = flat_pos[occ_order]
        else:
            sorted_pos = None
    else:
        terms = np.empty(0, dtype=object)
        docids = np.empty(0, dtype=np.int64)
        tfs = np.empty(0, dtype=np.int64)
        df = np.empty(0, dtype=np.int64)
        cf = np.empty(0, dtype=np.int64)
        term_offsets = np.zeros(1, dtype=np.int64)
        sorted_pos = None

    return write_field_artifacts(
        tmp, urls, dl, terms, docids, tfs, df, cf, term_offsets,
        sorted_pos, analyzer, input_fragments, seg_id, store_positions, t0,
    )


def write_field_artifacts(
    tmp: str,
    urls: list[str],
    dl: np.ndarray,
    terms: np.ndarray,
    docids: np.ndarray,
    tfs: np.ndarray,
    df: np.ndarray,
    cf: np.ndarray,
    term_offsets: np.ndarray,
    sorted_pos: np.ndarray | None,
    analyzer: str,
    input_fragments: list[str] | None,
    seg_id: str,
    store_positions: bool,
    t0: float | None = None,
) -> dict:
    """Write one field's index artifacts from POSTINGS-SHAPED arrays —
    the backend shared by the tokenize path (build) and the compaction
    path (expunge-deletes rewrite), so both produce byte-identical
    layouts. ``docids``/``tfs`` are term-major (term_offsets bounds per
    term); ``sorted_pos`` is the flat per-occurrence position stream in
    the same order (or None)."""
    t0 = time.perf_counter() if t0 is None else t0
    ndocs = len(urls)
    norms = int_to_byte4(dl)
    dl_quant = byte4_to_int(norms)

    payload, meta = encode_postings(docids, tfs, dl_quant[docids] if docids.size else docids, term_offsets)

    pos_payload = np.empty(0, dtype=np.uint8)
    pos_cols: dict = {}
    if store_positions and docids.size:
        from raydex.index.postings import varint_encode as _venc

        post_start = np.cumsum(tfs) - tfs  # occurrence start per posting
        deltas = np.empty(sorted_pos.size, dtype=np.int64)
        deltas[0] = sorted_pos[0]
        deltas[1:] = sorted_pos[1:] - sorted_pos[:-1]
        deltas[post_start] = sorted_pos[post_start]  # absolute per posting
        pos_payload = _venc(deltas)
        vlen = (
            1
            + (deltas >= 128).astype(np.int64)
            + (deltas >= 128**2)
            + (deltas >= 128**3)
            + (deltas >= 128**4)
        )
        per_post_nb = np.add.reduceat(vlen, post_start)
        blk_post_start = np.cumsum(meta.n) - meta.n
        blk_posnb = np.add.reduceat(per_post_nb, blk_post_start).astype(np.int64)
        blk_posoff = np.cumsum(blk_posnb) - blk_posnb
        pos_cols = {
            "blk_posoff": _list_col(blk_posoff, meta.term_nblocks, pa.int64()),
            "blk_posnb": _list_col(
                blk_posnb.astype(np.int32), meta.term_nblocks, pa.int32()
            ),
        }
    elif store_positions:
        pos_cols = {
            "blk_posoff": _list_col(
                np.empty(0, dtype=np.int64), meta.term_nblocks, pa.int64()
            ),
            "blk_posnb": _list_col(
                np.empty(0, dtype=np.int32), meta.term_nblocks, pa.int32()
            ),
        }

    os.makedirs(tmp, exist_ok=True)

    terms_tbl = pa.table(
        {
            "term": pa.array(terms, type=pa.string()),
            "df": pa.array(df, type=pa.int64()),
            "cf": pa.array(cf, type=pa.int64()),
            "nblocks": pa.array(meta.term_nblocks, type=pa.int32()),
            "blk_n": _list_col(meta.n, meta.term_nblocks, pa.int32()),
            "blk_last": _list_col(meta.last_docid, meta.term_nblocks, pa.int32()),
            "blk_maxtf": _list_col(meta.max_tf, meta.term_nblocks, pa.int32()),
            "blk_mindl": _list_col(meta.min_dl, meta.term_nblocks, pa.int32()),
            "blk_off": _list_col(meta.offset, meta.term_nblocks, pa.int64()),
            "blk_idsb": _list_col(meta.ids_nbytes, meta.term_nblocks, pa.int32()),
            "blk_nb": _list_col(meta.nbytes, meta.term_nblocks, pa.int32()),
            **pos_cols,
        }
    )
    pq.write_table(terms_tbl, os.path.join(tmp, "terms.parquet"))
    if store_positions:
        pos_payload.tofile(os.path.join(tmp, "positions.bin"))
    docs_tbl = pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "dl": pa.array(dl, type=pa.int64()),
            "norm": pa.array(norms, type=pa.uint8()),
        }
    )
    pq.write_table(docs_tbl, os.path.join(tmp, "docs.parquet"))
    payload.tofile(os.path.join(tmp, "postings.bin"))

    h = hashlib.sha256()
    h.update(payload.tobytes())
    for u in urls:
        h.update(u.encode())
    manifest = {
        "seg_id": seg_id,
        "analyzer": analyzer,
        "positions": bool(store_positions),
        "doc_count": int(ndocs),
        "sum_dl": int(dl.sum()),
        # per-segment min/max for can-match pre-filtering (the reference's
        # CanMatchPreFilterSearchPhase.java:50,138 — cheap range-vs-field
        # rewrite skips non-overlapping segments before scatter)
        "min_dl": int(dl.min()) if ndocs else 0,
        "max_dl": int(dl.max()) if ndocs else 0,
        "min_url": min(urls) if urls else "",
        "max_url": max(urls) if urls else "",
        "term_count": int(terms.size),
        "max_df": int(df.max()) if df.size else 0,
        "payload_bytes": int(payload.size),
        "input_fragments": input_fragments or [],
        "content_hash": h.hexdigest(),
        "build_sec": round(time.perf_counter() - t0, 4),
        "status": "complete",
    }
    with open(os.path.join(tmp, "manifest.json"), "w") as f:
        json.dump(manifest, f)
    return manifest


class SegmentReader:
    """Query-side in-RAM view of one segment (term dict + norms + payload).

    The stateful analogue of the reference's per-shard
    ``ContextIndexSearcher`` over open segment files
    (``server/.../search/internal/ContextIndexSearcher.java:55``); held
    inside query actors, loaded once (§2.4).
    """

    def __init__(self, seg_dir: str):
        self.seg_dir = seg_dir
        with open(os.path.join(seg_dir, "manifest.json")) as f:
            manifest_probe = json.load(f)
        if manifest_probe.get("layout") == "bucketed":
            t, self.payload, bucket_pos = self._load_bucketed(seg_dir, manifest_probe)
        else:
            t = pq.read_table(os.path.join(seg_dir, "terms.parquet"))
            self.payload = np.fromfile(
                os.path.join(seg_dir, "postings.bin"), dtype=np.uint8
            )
            bucket_pos = None
        # term dict stays an Arrow array (zero-copy from parquet); the
        # np-object materialization is LAZY — point lookups bisect with
        # per-probe .as_py() (O(log n) tiny allocations), so query actors
        # serving match queries never pay the full-vocabulary
        # python-string storm (measured: dominant startup cost at low
        # cpu counts). Scan-based paths (prefix/wildcard/suggest/merge)
        # touch .terms and materialize once.
        self._terms_pa = t["term"].combine_chunks()
        self._terms_np: np.ndarray | None = None
        self.df = t["df"].to_numpy()
        self.cf = t["cf"].to_numpy()
        self.term_nblocks = t["nblocks"].to_numpy()
        self._blk_start = np.cumsum(self.term_nblocks) - self.term_nblocks
        flat = lambda c: np.asarray(t[c].combine_chunks().flatten())
        self.blk_n = flat("blk_n")
        self.blk_last = flat("blk_last")
        self.blk_maxtf = flat("blk_maxtf")
        self.blk_mindl = flat("blk_mindl")
        self.blk_off = flat("blk_off")
        self.blk_idsb = flat("blk_idsb")
        self.blk_nb = flat("blk_nb")
        self.has_positions = "blk_posoff" in t.schema.names
        if self.has_positions:
            self.blk_posoff = flat("blk_posoff")
            self.blk_posnb = flat("blk_posnb")
            self.pos_payload = (
                bucket_pos
                if bucket_pos is not None
                else np.fromfile(
                    os.path.join(seg_dir, "positions.bin"), dtype=np.uint8
                )
            )
        d = pq.read_table(os.path.join(seg_dir, "docs.parquet"))
        self.urls = d["url"]
        # extra stored doc-values columns (index-sort fields etc.);
        # timestamps held as epoch-micros int64 for comparisons
        self.doc_values: dict[str, np.ndarray] = {}
        for cname in d.column_names:
            if cname in ("url", "dl", "norm"):
                continue
            col = d[cname].combine_chunks()
            if pa.types.is_timestamp(col.type):
                col = col.cast(pa.timestamp("us")).cast(pa.int64())
            self.doc_values[cname] = col.to_numpy(zero_copy_only=False)
        self.norms = d["norm"].to_numpy()
        self.dl_quant = byte4_to_int(self.norms)
        # exact per-doc length for range filters; dl_quant stays the
        # scoring length (SmallFloat rounds down above 40, so filtering
        # on dl_quant would wrongly exclude e.g. raw dl 41 from gte=41)
        self.dl = d["dl"].to_numpy()
        with open(os.path.join(seg_dir, "manifest.json")) as f:
            self.manifest = json.load(f)
        self.ndocs = self.manifest["doc_count"]
        self.sum_dl = self.manifest["sum_dl"]
        # liveDocs (Lucene's per-segment deleted-docs bitmap analogue,
        # ``SegmentReader#getLiveDocs``): None = all live. Deleted docs
        # are masked from every match/filter/knn/get path but stats
        # (df, norms, sum_dl) still include them until a compacting
        # merge — exactly the reference's deletes-visible-in-stats
        # behavior.
        lp = os.path.join(seg_dir, "livedocs.npy")
        self.live: np.ndarray | None = np.load(lp) if os.path.exists(lp) else None
        self._derived: dict[str, object] = {}
        self.fields_meta: dict = self.manifest.get("fields", {})
        self._field_readers: dict[str, SegmentReader | None] = {}

    def field(self, name: str) -> "SegmentReader | None":
        """Index-time mapped field's sub-reader (full SegmentReader over
        ``<seg>/field=<name>/``), or None if the segment was built without
        that field (callers fall back to the derived/runtime-field path).
        The primary analyzed field answers to 'text'."""
        if name == "text":
            return self
        meta = self.fields_meta.get(name, {})
        if meta.get("analyzer") == "alias":
            # FieldAliasMapper: queries against the alias hit the target
            return self.field(meta["path"])
        if meta.get("analyzer") in (
            "rank_feature", "rank_features", "completion", "dense_vector",
            "join",
        ):
            return None  # dedicated structure, not a text sub-index
        fr = self._field_readers.get(name, False)
        if fr is False:
            fd = os.path.join(self.seg_dir, f"field={name}")
            fr = (
                SegmentReader(fd)
                if name in self.fields_meta and os.path.isdir(fd)
                else None
            )
            self._field_readers[name] = fr
        return fr

    def join_field_data(self, name: str | None = None):
        """(names, parent_ids, relations) of the index's join field
        (``name=None`` resolves the single join field — the reference
        allows one per index). Object ndarrays, doc-aligned; loaded once
        per reader (the global-ordinals doc-values analogue)."""
        cache = getattr(self, "_join_fields", None)
        if cache is None:
            cache = self._join_fields = {}
        if name is None:
            name = next(
                (f for f, m in self.fields_meta.items()
                 if (m.get("kind") or m.get("analyzer")) == "join"),
                None,
            )
            if name is None:
                raise ValueError(
                    "index has no join field (build with "
                    "FieldSpec(analyzer='join', relations=...))"
                )
        entry = cache.get(name)
        if entry is None:
            from raydex.index.joinfield import read_join_field

            names, pids = read_join_field(self.seg_dir, name)
            entry = (names, pids, self.fields_meta[name].get("relations", {}))
            cache[name] = entry
        return entry

    def completion_field(self, name: str):
        """(inputs sorted, weights, docids, contexts) of a completion
        field — loaded once per reader (the opened-FST analogue).
        ``contexts`` is a per-entry list of ``name\\x00value`` tokens
        (empty list when the entry carries none; pre-contexts segments
        load with all-empty lists)."""
        cache = getattr(self, "_completion_fields", None)
        if cache is None:
            cache = self._completion_fields = {}
        entry = cache.get(name)
        if entry is None:
            if self.fields_meta.get(name, {}).get("analyzer") != "completion":
                raise ValueError(
                    f"{name!r} is not an index-time completion field "
                    f"(build with FieldSpec(analyzer='completion'))"
                )
            t = pq.read_table(
                os.path.join(self.seg_dir, f"field={name}", "completion.parquet")
            )
            ctx = (t["contexts"].to_pylist()
                   if "contexts" in t.column_names
                   else [[] for _ in range(t.num_rows)])
            entry = (
                np.asarray(t["input"].to_pylist(), dtype=object),
                t["weight"].to_numpy(),
                t["docid"].to_numpy(),
                ctx,
            )
            cache[name] = entry
        return entry

    def dense_vectors(self, name: str):
        """(matrix float32 (ndocs, dims) with NaN rows for missing docs,
        valid docid int64 array, similarity str) of a dense_vector field.
        Loaded + cached once per reader — the opened-HNSW-graph/doc-values
        analogue; knn over a pinned segment actor pays the parquet read
        once."""
        cache = getattr(self, "_dense_vectors", None)
        if cache is None:
            cache = self._dense_vectors = {}
        entry = cache.get(name)
        if entry is None:
            meta = self.fields_meta.get(name, {})
            if meta.get("analyzer") != "dense_vector":
                raise ValueError(
                    f"{name!r} is not an index-time dense_vector field "
                    f"(build with FieldSpec(analyzer='dense_vector'))"
                )
            t = pq.read_table(
                os.path.join(self.seg_dir, f"field={name}", "vectors.parquet")
            )
            col = t["vec"].combine_chunks()
            dims = int(meta["dims"])
            valid = np.flatnonzero(np.asarray(pc.is_valid(col)))
            mat = np.full((self.ndocs, dims), np.nan, dtype=np.float32)
            if valid.size:
                # flatten() of a FixedSizeListArray skips null rows
                mat[valid] = np.asarray(col.flatten()).reshape(-1, dims)
            entry = (mat, valid, meta.get("similarity", "cosine"))
            cache[name] = entry
        return entry

    def dense_vector_ivf(self, name: str):
        """(centroids float32 (nlist, dims), cluster int32 per VALID row
        aligned with dense_vectors()' ``valid``) of an IVF-built
        dense_vector field, or None when built flat."""
        cache = getattr(self, "_dense_ivf", None)
        if cache is None:
            cache = self._dense_ivf = {}
        if name not in cache:
            fd = os.path.join(self.seg_dir, f"field={name}")
            cp = os.path.join(fd, "ivf_centroids.npy")
            if os.path.exists(cp):
                cents = np.load(cp)
                clusters = pq.read_table(
                    os.path.join(fd, "ivf.parquet")
                )["cluster"].to_numpy()
                cache[name] = (cents, clusters)
            else:
                cache[name] = None
        return cache[name]

    def rank_feature_values(self, name: str) -> np.ndarray:
        """Doc-values of a rank_feature field: float64 array (NaN = doc
        has no feature), loaded once per reader."""
        cache = getattr(self, "_rank_features", None)
        if cache is None:
            cache = self._rank_features = {}
        vals = cache.get(name)
        if vals is None:
            meta = self.fields_meta.get(name, {})
            root, _, feat = name.partition(".")
            if meta.get("analyzer") == "rank_feature":
                t = pq.read_table(
                    os.path.join(self.seg_dir, f"field={name}", "feature.parquet")
                )
                vals = t["value"].to_numpy(zero_copy_only=False).astype(np.float64)
            elif (
                feat
                and self.fields_meta.get(root, {}).get("analyzer")
                == "rank_features"
            ):
                # sparse plural field: dense-materialize one feature
                t = pq.read_table(
                    os.path.join(self.seg_dir, f"field={root}", "features.parquet")
                )
                nm = t["name"].to_numpy(zero_copy_only=False)
                lo = int(np.searchsorted(nm, feat, side="left"))
                hi = int(np.searchsorted(nm, feat, side="right"))
                vals = np.full(self.ndocs, np.nan)
                vals[t["docid"].to_numpy()[lo:hi]] = (
                    t["value"].to_numpy(zero_copy_only=False)[lo:hi].astype(np.float64)
                )
            else:
                raise ValueError(
                    f"{name!r} is not an index-time rank_feature field "
                    f"(build with FieldSpec(analyzer='rank_feature') or "
                    f"query '<rank_features_field>.<feature>')"
                )
            cache[name] = vals
        return vals

    def derived_field(self, name: str, spec: dict | None = None):
        """Lazy segment-local index over a stored column (the multi-field
        / runtime-field analogue; raydex.search.fields). Built once per
        reader — i.e. once per query actor. ``spec``: a PER-REQUEST
        runtime mapping ``{"factory": <registered name>, "params":
        {...}}`` (the `runtime_mappings` search-body section) — cached
        under its canonical JSON so repeated requests reuse the index."""
        import json as _json

        key = name if spec is None else name + "\x1f" + _json.dumps(
            spec, sort_keys=True
        )
        if key not in self._derived:
            from raydex.search.fields import (
                RUNTIME_FIELD_FACTORIES,
                RUNTIME_FIELDS,
                DerivedFieldIndex,
            )

            if spec is not None:
                fac = RUNTIME_FIELD_FACTORIES.get(spec.get("factory"))
                if fac is None:
                    raise ValueError(
                        f"unknown runtime-field factory "
                        f"{spec.get('factory')!r} "
                        f"(register_runtime_field_factory)"
                    )
                vals = fac(self, **(spec.get("params") or {}))
            else:
                fn = RUNTIME_FIELDS.get(name)
                if fn is None:
                    if name in self.manifest.get("mapped_dataless", []):
                        # mapped via PUT _mapping after this segment was
                        # built: the reference matches nothing on a
                        # mapped field with no indexed data
                        vals = [""] * self.ndocs
                    else:
                        raise ValueError(
                            f"no stored column or registered runtime "
                            f"field {name!r} (register_runtime_field)"
                        )
                else:
                    vals = fn(self)
            self._derived[key] = DerivedFieldIndex(vals)
        return self._derived[key]

    @staticmethod
    def _load_bucketed(seg_dir: str, manifest: dict):
        """Merged-segment layout: term-hash bucket files, each internally
        term-sorted (raydex.index.merge). Concatenate bucket payloads
        (rebasing block offsets) and globally sort the term dict once."""
        tables, payloads, base = [], [], 0
        pos_payloads, pos_base = [], 0
        for b in manifest["buckets"]:
            bt = pq.read_table(os.path.join(seg_dir, b, "terms.parquet"))
            bp = np.fromfile(os.path.join(seg_dir, b, "postings.bin"), dtype=np.uint8)
            if base:
                off = bt["blk_off"].combine_chunks()
                shifted = pa.ListArray.from_arrays(
                    off.offsets, pc.add(off.values, base)
                )
                bt = bt.set_column(
                    bt.schema.get_field_index("blk_off"), "blk_off", shifted
                )
            if "blk_posoff" in bt.schema.names:
                pp_path = os.path.join(seg_dir, b, "positions.bin")
                pp = (
                    np.fromfile(pp_path, dtype=np.uint8)
                    if os.path.exists(pp_path)
                    else np.empty(0, dtype=np.uint8)
                )
                if pos_base:
                    poff = bt["blk_posoff"].combine_chunks()
                    shifted = pa.ListArray.from_arrays(
                        poff.offsets, pc.add(poff.values, pos_base)
                    )
                    bt = bt.set_column(
                        bt.schema.get_field_index("blk_posoff"), "blk_posoff", shifted
                    )
                pos_payloads.append(pp)
                pos_base += pp.size
            tables.append(bt)
            payloads.append(bp)
            base += bp.size
        t = pa.concat_tables(tables).combine_chunks().sort_by("term")
        payload = np.concatenate(payloads) if payloads else np.empty(0, dtype=np.uint8)
        pos_payload = (
            np.concatenate(pos_payloads) if pos_payloads else None
        )
        return t, payload, pos_payload

    @property
    def terms(self) -> np.ndarray:
        if self._terms_np is None:
            self._terms_np = np.asarray(self._terms_pa.to_pylist(), dtype=object)
        return self._terms_np

    @property
    def nterms(self) -> int:
        return len(self._terms_pa)

    _LOOKUP_CACHE_CAP = 65536

    def lookup(self, term: str) -> int:
        """Sorted-term binary search; -1 if absent. Probes decode one
        term per step — no full dict materialization. Results are
        memoized (query workloads repeat terms heavily)."""
        cache = getattr(self, "_lookup_cache", None)
        if cache is None:
            cache = self._lookup_cache = {}
        hit = cache.get(term)
        if hit is not None:
            return hit
        arr = self._terms_pa
        lo, hi = 0, len(arr)
        while lo < hi:
            mid = (lo + hi) // 2
            if arr[mid].as_py() < term:
                lo = mid + 1
            else:
                hi = mid
        out = lo if lo < len(arr) and arr[lo].as_py() == term else -1
        if len(cache) < self._LOOKUP_CACHE_CAP:
            cache[term] = out
        return out

    def term_blocks(self, ti: int) -> slice:
        s = int(self._blk_start[ti])
        return slice(s, s + int(self.term_nblocks[ti]))

    # decoded-postings LRU: repeated query terms skip the varint decode
    # entirely (the reference's node query/filter cache analogue,
    # ``indices/IndicesQueryCache``; measured ~2x single-process QPS on
    # the 64-segment bench index). Entry cap bounds worst-case memory at
    # ~cap * avg_df * 16B per reader.
    _POSTINGS_CACHE_CAP = 4096

    def postings(self, ti: int) -> tuple[np.ndarray, np.ndarray]:
        from raydex.index.postings import decode_term

        cache = getattr(self, "_post_cache", None)
        if cache is None:
            from collections import OrderedDict

            cache = self._post_cache = OrderedDict()
        hit = cache.get(ti)
        if hit is not None:
            cache.move_to_end(ti)
            return hit
        sl = self.term_blocks(ti)
        out = decode_term(
            self.payload,
            self.blk_off[sl],
            self.blk_idsb[sl],
            self.blk_nb[sl],
            self.blk_n[sl],
        )
        cache[ti] = out
        if len(cache) > self._POSTINGS_CACHE_CAP:
            cache.popitem(last=False)
        return out

    def url_of(self, docid: int) -> str:
        return self.urls[int(docid)].as_py()

    def all_postings_docids(self) -> tuple[np.ndarray, np.ndarray]:
        """Flat docids of EVERY posting (term-major) + per-term start
        offsets, decoded in ONE varint pass over the whole payload
        (blocks are contiguous term-major, so a single decode yields
        every block's values in order). Cached: int32 docids cost
        ~4B/posting, bounded by the segment flush threshold — the
        full-dictionary sweep that significant_terms candidate
        nomination and keyword-field terms aggs need, without a
        per-term Python decode loop."""
        sweep = getattr(self, "_docid_sweep", None)
        if sweep is None:
            docids, _, starts = self.decode_all_postings()
            self._docid_sweep = sweep = (docids.astype(np.int32), starts)
        return sweep

    def decode_all_postings(self) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Uncached full decode: (docids, tfs, per-term starts), all
        term-major. One varint pass over the whole payload; bucketed
        layouts keep payload bytes in BUCKET order while the block
        metadata is term-sorted, so decode in payload order and gather
        runs back to term order."""
        from raydex.index.postings import _reassemble, _spans, varint_decode

        ns = self.blk_n.astype(np.int64)
        order = np.argsort(self.blk_off, kind="stable")
        vals = varint_decode(self.payload)
        docids_p, tfs_p = _reassemble(vals, ns[order])
        starts_p = np.cumsum(ns[order]) - ns[order]
        inv = np.empty(order.size, dtype=np.int64)
        inv[order] = np.arange(order.size)
        take = _spans(starts_p[inv], ns)
        df = self.df.astype(np.int64)
        starts = np.zeros(df.size + 1, dtype=np.int64)
        np.cumsum(df, out=starts[1:])
        return docids_p[take], tfs_p[take], starts

    def decode_all_positions(self, tfs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(absolute positions flat, per-posting start offsets) for ALL
        postings, term-major — one varint pass over the positions
        payload. ``tfs`` must be the term-major flat tfs from
        ``decode_all_postings``. Position deltas are absolute at each
        POSTING's first value, so a global cumsum with per-posting
        correction reconstructs absolute in-doc positions uniformly."""
        from raydex.index.postings import _spans, varint_decode

        if not self.has_positions:
            raise ValueError("segment was built without positions")
        ns = self.blk_n.astype(np.int64)
        # position values per block = sum of the block's tfs
        blk_post_start = np.cumsum(ns) - ns
        cnt = (np.add.reduceat(tfs, blk_post_start)
               if tfs.size else np.zeros(ns.size, dtype=np.int64))
        if ns.size and tfs.size:
            cnt[ns == 0] = 0
        order = np.argsort(self.blk_posoff, kind="stable")
        deltas_p = varint_decode(self.pos_payload)
        cnt_p = cnt[order]
        starts_p = np.cumsum(cnt_p) - cnt_p
        inv = np.empty(order.size, dtype=np.int64)
        inv[order] = np.arange(order.size)
        deltas = deltas_p[_spans(starts_p[inv], cnt)]
        csum = np.cumsum(deltas)
        post_start = np.cumsum(tfs) - tfs
        corr = np.zeros(tfs.size, dtype=np.int64)
        if tfs.size > 1:
            corr[1:] = csum[post_start[1:] - 1]
        pos = csum - np.repeat(corr, tfs)
        return pos, post_start

    def fg_term_counts(self, mask: np.ndarray) -> np.ndarray:
        """Per-term count of matched docs (``mask`` indexed by docid)
        across ALL terms — significant_terms/text per-shard candidate
        nomination (``SignificantTermsAggregatorFactory``: each shard
        nominates with exact local fg counts). One mask gather + one
        ``reduceat`` over the cached flat-docid sweep."""
        docids, starts = self.all_postings_docids()
        nterms = self.df.size
        if docids.size == 0 or nterms == 0:
            return np.zeros(nterms, dtype=np.int64)
        hits = mask[docids].astype(np.int64)
        live = self.df > 0
        if live.all():
            return np.add.reduceat(hits, starts[:-1])
        out = np.zeros(nterms, dtype=np.int64)
        idx = np.flatnonzero(live)
        if idx.size:
            out[idx] = np.add.reduceat(hits, starts[:-1][idx])
        return out

    def postings_with_positions(self, ti: int):
        """(docids, tfs, flat positions, per-posting offsets) for a term.

        Positions are absolute token positions (stop gaps preserved);
        flat array split per posting by ``offsets`` (len = df + 1).
        """
        if not self.has_positions:
            raise ValueError("segment was built without positions")
        from raydex.index.postings import varint_decode

        ids, tfs = self.postings(ti)
        sl = self.term_blocks(ti)
        offs, nbs = self.blk_posoff[sl], self.blk_posnb[sl]
        start, end = int(offs[0]), int(offs[-1] + nbs[-1])
        deltas = varint_decode(self.pos_payload[start:end])
        # per-posting cumsum with absolute first value
        csum = np.cumsum(deltas)
        post_start = np.cumsum(tfs) - tfs
        corr = np.zeros(tfs.size, dtype=np.int64)
        if tfs.size > 1:
            corr[1:] = csum[post_start[1:] - 1]
        pos = csum - np.repeat(corr, tfs)
        offsets = np.concatenate([post_start, [deltas.size]])
        return ids, tfs, pos, offsets
