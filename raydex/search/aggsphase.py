"""Search-request aggregations: per-segment collect over the query's
matching docs, coordinator reduce, reference-shaped response.

Reference: ``server/src/main/java/org/elasticsearch/search/aggregations/
AggregationPhase.java`` (per-shard collect over the query's matching
doc set), ``InternalAggregations#topLevelReduce`` and
``action/search/SearchPhaseController`` (shard partials merged at the
coordinating node). Supported aggregators mirror the corresponding
builders under ``search/aggregations/metrics`` and ``bucket``:

- metrics: avg / sum / min / max / stats / value_count / cardinality
  (exact value-set partials up to ``precision_threshold`` [default
  3000, the reference's ``CardinalityAggregatorFactory`` default],
  then an HLL++ sketch partial from :mod:`raydex.ops.sketches` — the
  reference's linear-counting→HLL regime switch
  (``HyperLogLogPlusPlus.java:28``); partials stay bounded at 16 KiB
  however broad the query) / top_hits (per-scope top-size hits by the
  main query's scores, ``TopHitsAggregationBuilder``)
- buckets: terms (keyword index-time fields via postings, or any
  doc-values column via ``np.unique``; ``size`` / ``min_doc_count`` /
  ``order`` by ``_count`` / ``_key`` / a metric sub-agg), histogram
  (``min_doc_count: 0`` + ``extended_bounds`` fill empty buckets;
  NOTE: unlike the reference, the DEFAULT min_doc_count here is 1 —
  gaps are omitted unless 0 is requested), date_histogram
  (calendar_interval minute/hour/day/month/year or fixed_interval),
  range, filter, missing, global, significant_terms /
  significant_text (JLH heuristic over foreground-vs-background term
  counts; each shard ships its ``shard_size`` best candidates with
  exact fg/bg counts — the reference's accuracy model. Deviation:
  the reference's significant_text re-analyzes a _source sample;
  segments here store no _source, so fg counts come from a full
  postings sweep of the segment, exact rather than sampled)

Sub-aggregations: ``filter`` / ``global`` / ``range`` / ``missing``
recurse fully (bucket count is request-bounded); ``terms`` /
``histogram`` / ``date_histogram`` accept metric sub-aggregations
(vectorized with ``argsort`` + ``reduceat``) AND bucket
sub-aggregations — terms-per-day, histogram-per-host, arbitrarily
nested like the reference's ``AggregatorFactories`` builder tree.
Nested bucketing stays one vectorized pass: the child keys are
factorized ONCE over all matched docs and fused with the parent
bucket ordinal into a single combined code (`parent_inv * n_child +
child_inv`), so a terms→date_histogram→stats tree costs three
``np.unique``/``reduceat`` sweeps, never per-bucket Python query
evaluation. A nested ``terms`` may carry ``shard_size`` to trim each
parent's children to the top-N-by-count at collect (the reference's
per-shard accuracy trade); without it the partial is exact and
matched-vocabulary-bounded, like the top-level terms collect.

Partials are plain JSON-able trees: a scatter actor computes one
merged partial per segment slice and ships only that (bucket keys +
scalars — metadata-sized at any index size, like the reference's
shard-level ``InternalAggregation`` stream).
"""

from __future__ import annotations

import numpy as np

_METRICS = ("avg", "sum", "min", "max", "stats", "extended_stats",
            "value_count", "cardinality", "percentiles")
_CAL_UNITS = {"minute": "m", "hour": "h", "day": "D", "month": "M",
              "year": "Y"}
_FIXED_US = {"s": 1_000_000, "m": 60_000_000, "h": 3_600_000_000,
             "d": 86_400_000_000}


def _split_spec(spec: dict):
    """(kind, body, sub_aggs) from one agg entry. The sibling ``meta``
    key is carried by the render phase, not a kind."""
    sub = spec.get("aggs") or spec.get("aggregations") or {}
    kinds = [k for k in spec if k not in ("aggs", "aggregations", "meta")]
    if len(kinds) != 1:
        raise ValueError(f"aggregation spec needs exactly one kind, got {kinds}")
    return kinds[0], spec[kinds[0]], sub


def collect_filter_queries(aggs_spec: dict) -> list[dict]:
    """Every `filter`-agg query dict in the spec tree — the coordinator
    must collect global df for their scoring leaves too (same contract
    as the main query)."""
    out: list[dict] = []
    for spec in (aggs_spec or {}).values():
        kind, body, sub = _split_spec(spec)
        if kind == "filter":
            out.append(body)
        elif kind == "filters":
            out.extend((body.get("filters") or {}).values())
        out += collect_filter_queries(sub)
    return out


# ------------------------------------------------------------ values


def _doc_values(reader, field: str) -> np.ndarray:
    """Per-doc value array for a numeric/date/scaled_float doc-values
    column, ``dl``, or the stored ``url`` column."""
    if field == "dl":
        return reader.dl
    if field == "url":
        return np.asarray(reader.urls.to_pylist(), dtype=object)
    dv = reader.doc_values.get(field)
    if dv is None:
        raise ValueError(
            f"field {field!r} has no doc-values column in this segment "
            f"(aggregations need dl, url, a numeric/date field, or a "
            f"keyword index-time field)"
        )
    meta = getattr(reader, "fields_meta", {}).get(field, {})
    if meta.get("analyzer") == "scaled_float":
        return dv / float(meta.get("scaling_factor") or 100.0)
    return dv


class _FlattenedKeyView:
    """Terms-agg view over ONE dotted key of a flattened field: the
    `key\\x1f`-prefixed term range of the field's sub-index, with the
    prefix stripped from the surfaced terms. Duck-types the two
    sub-reader members the agg collectors use (``terms`` +
    ``all_postings_docids``)."""

    def __init__(self, fr, prefix: str):
        from raydex.search.query import expand_prefix

        tis = expand_prefix(fr, prefix)
        docids, starts = fr.all_postings_docids()
        if tis:
            lo, hi = tis[0], tis[-1] + 1  # sorted terms: prefix range
            self.terms = np.array(
                [str(fr.terms[ti])[len(prefix):] for ti in range(lo, hi)],
                dtype=object)
            sl = starts[lo:hi + 1]
            self._docids = docids[sl[0]:sl[-1]]
            self._starts = (sl - sl[0]).astype(starts.dtype)
        else:
            self.terms = np.array([], dtype=object)
            self._docids = docids[:0]
            self._starts = starts[:1]
        import pyarrow as _pa

        self._terms_pa = _pa.array(list(self.terms), _pa.string())

    def all_postings_docids(self):
        return self._docids, self._starts

    @property
    def df(self) -> np.ndarray:
        return np.diff(self._starts)

    def fg_term_counts(self, mask: np.ndarray) -> np.ndarray:
        if self._docids.size == 0:
            return np.zeros(len(self.terms), dtype=np.int64)
        hits = mask[self._docids].astype(np.int64)
        return np.add.reduceat(hits, self._starts[:-1])


def _field_subreader(reader, field: str):
    """Keyword-ish index-time sub-field reader (the SortedSetDocValues
    analogue for terms/cardinality/missing: exact multi-value semantics,
    a doc counts once per distinct value), or None when the field has no
    sub-index (callers fall back to doc-values). Dotted paths under a
    flattened field resolve to a keyed view of its sub-index. A
    reader-load failure propagates — swallowing it would mask real
    segment corruption behind a misleading no-doc-values error."""
    fm = getattr(reader, "fields_meta", {})
    if field not in fm and "." in field:
        head, _, rest = field.partition(".")
        if fm.get(head, {}).get("kind") == "flattened":
            fr = reader.field(head)
            if fr is not None:
                return _FlattenedKeyView(fr, rest + "\x1f")
    fr = reader.field(field) if hasattr(reader, "field") else None
    return None if fr is None or fr is reader else fr


# ------------------------------------------------------------ collect


def _metric_partial(kind: str, vals: np.ndarray, body: dict | None = None):
    # docs without a value are skipped (NaN = arrow null post-conversion)
    if getattr(vals, "dtype", None) is not None and \
            np.issubdtype(vals.dtype, np.floating):
        vals = vals[~np.isnan(vals)]
    n = int(len(vals))
    if kind == "value_count":
        return {"k": "count", "count": n}
    if kind == "cardinality":
        thresh = int((body or {}).get("precision_threshold", 3000))
        if n == 0:
            return {"k": "set", "values": [], "thresh": thresh}
        uniq = [v.item() if hasattr(v, "item") else v
                for v in np.unique(vals)]
        if len(uniq) <= thresh:
            return {"k": "set", "values": uniq, "thresh": thresh}
        # above the threshold the partial switches to a fixed-size
        # HLL++ sketch — a broad query over a high-cardinality field
        # must not ship a corpus-sized value set off the segment
        return _set_to_hll(uniq, thresh)
    if kind == "percentiles":
        from raydex.ops.tdigest import TDigest

        d = TDigest().add(np.asarray(vals, dtype=np.float64))
        means, weights = d.to_arrays()
        return {"k": "tdigest", "means": [float(x) for x in means],
                "weights": [float(x) for x in weights]}
    if n == 0:
        return {"k": "stats", "count": 0, "sum": 0.0,
                "min": None, "max": None, "sum_sq": 0.0}
    return {
        "k": "stats", "count": n, "sum": float(np.sum(vals)),
        "min": float(np.min(vals)), "max": float(np.max(vals)),
        "sum_sq": float(np.sum(np.asarray(vals, dtype=np.float64) ** 2)),
    }


def _agg_metric_field_partial(reader, midx, field: str, kind: str) -> dict:
    """Metric partial over an aggregate_metric_double field: the
    pre-aggregated sub-columns COMBINE instead of re-aggregating raw
    values (AggregateDoubleMetricFieldMapper's agg support) — min of
    mins, max of maxes, sum of sums, count of value_counts. avg derives
    sum/value_count at render; extended_stats is unsupported (no
    sum-of-squares in the stored metrics), matching the reference."""
    if kind not in ("min", "max", "sum", "avg", "stats", "value_count"):
        raise ValueError(
            f"aggregation {kind!r} is not supported on an "
            "aggregate_metric_double field")
    dv = reader.doc_values
    mn = dv[f"{field}__min"][midx]
    mx = dv[f"{field}__max"][midx]
    sm = dv[f"{field}__sum"][midx]
    vc = dv[f"{field}__value_count"][midx]
    keep = ~np.isnan(mn)
    if kind == "value_count":
        return {"k": "count", "count": int(vc[keep].sum())}
    if not keep.any():
        return {"k": "stats", "count": 0, "sum": 0.0,
                "min": None, "max": None, "sum_sq": 0.0}
    return {"k": "stats", "count": int(vc[keep].sum()),
            "sum": float(sm[keep].sum()),
            "min": float(mn[keep].min()), "max": float(mx[keep].max()),
            "sum_sq": 0.0}


def _histogram_field_partial(reader, midx, field: str, kind: str,
                             body: dict | None = None) -> dict:
    """Metric / percentiles partial over a histogram field: the
    per-doc (values, counts) pairs re-weight into the partial
    (HistogramFieldMapper's agg support — the analytics plugin's
    HistoBackedAggregators)."""
    dv = reader.doc_values
    vlists = dv[f"{field}__values"][midx]
    clists = dv[f"{field}__counts"][midx]
    if len(vlists):
        v = np.concatenate([np.asarray(x, dtype=np.float64)
                            for x in vlists])
        c = np.concatenate([np.asarray(x, dtype=np.float64)
                            for x in clists])
    else:
        v = np.empty(0, dtype=np.float64)
        c = np.empty(0, dtype=np.float64)
    if kind == "percentiles":
        from raydex.ops.tdigest import TDigest

        d = TDigest.from_arrays(v.tolist(), c.tolist())
        means, weights = d.to_arrays()
        return {"k": "tdigest", "means": [float(x) for x in means],
                "weights": [float(x) for x in weights]}
    if kind == "value_count":
        return {"k": "count", "count": int(c.sum())}
    if kind not in ("min", "max", "sum", "avg", "stats"):
        raise ValueError(
            f"aggregation {kind!r} is not supported on a histogram field")
    if v.size == 0:
        return {"k": "stats", "count": 0, "sum": 0.0,
                "min": None, "max": None, "sum_sq": 0.0}
    return {"k": "stats", "count": int(c.sum()),
            "sum": float((v * c).sum()),
            "min": float(v.min()), "max": float(v.max()),
            "sum_sq": float((v * v * c).sum())}


def _set_to_hll(values, thresh: int) -> dict:
    """Exact value set → HLL++ sketch partial (p=14, 16 KiB registers).
    Values hash via ``str()`` so exact-regime partials fold into sketch
    partials consistently at merge."""
    from raydex.ops.sketches import HllPlusPlus

    h = HllPlusPlus(14)
    h.add([str(v) for v in values])
    return {"k": "hll", "thresh": thresh, "b": h.to_bytes()}


def _merge_cardinality(a: dict, b: dict) -> dict:
    """set+set (promote to HLL past the threshold), set+hll, hll+hll —
    the reference's LinearCounting→HyperLogLog upgrade path, with
    register-MAX merges associative and commutative."""
    from raydex.ops.sketches import HllPlusPlus

    thresh = max(int(a.get("thresh", 3000)), int(b.get("thresh", 3000)))
    if a["k"] == "set" and b["k"] == "set":
        vals = sorted(set(a["values"]) | set(b["values"]),
                      key=lambda v: (str(type(v)), v))
        if len(vals) <= thresh:
            return {"k": "set", "values": vals, "thresh": thresh}
        return _set_to_hll(vals, thresh)
    sketches = [HllPlusPlus.from_bytes(x["b"])
                for x in (a, b) if x["k"] == "hll"]
    h = sketches[0]
    if len(sketches) == 2:
        h.merge(sketches[1])
    else:
        exact = a if a["k"] == "set" else b
        h2 = HllPlusPlus(h.p)
        h2.add([str(v) for v in exact["values"]])
        h.merge(h2)
    return {"k": "hll", "thresh": thresh, "b": h.to_bytes()}


def _grouped_metric_partials(sub_spec: dict, reader, midx: np.ndarray,
                             inv: np.ndarray, n_keys: int,
                             scores=None, ordinal: int = 0,
                             evaluator=None):
    """Per-bucket sub-aggregation partials under a bucket agg,
    vectorized: ``midx`` = matched docids, ``inv`` = bucket index per
    matched doc. Returns [ {name: partial} ] aligned to bucket
    0..n_keys-1. Metric kinds reduce with ``reduceat``; bucket kinds
    (terms / histogram / date_histogram / filter / filters / range /
    missing) fuse the child key with the parent ordinal into one
    combined code and recurse — the whole tree is per-segment
    vectorized sweeps, one per node."""
    order = np.argsort(inv, kind="stable")
    sorted_inv = inv[order]
    # bucket boundaries in the sorted stream (buckets may be empty)
    starts = np.searchsorted(sorted_inv, np.arange(n_keys), side="left")
    ends = np.searchsorted(sorted_inv, np.arange(n_keys), side="right")
    per_bucket: list[dict] = [{} for _ in range(n_keys)]
    for name, spec in sub_spec.items():
        kind, body, sub2 = _split_spec(spec)
        if kind in ("terms", "histogram", "date_histogram"):
            for b, part in enumerate(_nested_bucket_partials(
                    kind, body, sub2, reader, evaluator, midx, inv,
                    n_keys, scores, ordinal)):
                per_bucket[b][name] = part
            continue
        if kind in ("filter", "filters", "missing", "range"):
            for b, part in enumerate(_nested_mask_partials(
                    kind, body, sub2, reader, evaluator, midx, inv,
                    n_keys, scores, ordinal)):
                per_bucket[b][name] = part
            continue
        if kind not in _METRICS and kind != "top_hits":
            raise ValueError(
                f"unsupported sub-aggregation kind {kind!r} under "
                f"terms/histogram buckets"
            )
        if sub2:
            raise ValueError("metric aggregations take no sub-aggregations")
        if kind == "top_hits":
            mo = midx[order]
            size = int(body.get("size", 3))
            for b in range(n_keys):
                per_bucket[b][name] = _top_hits_partial(
                    reader, mo[starts[b]:ends[b]], scores, ordinal, size)
            continue
        v = _doc_values(reader, body["field"])[midx][order]
        # null skip (same contract as the standalone metrics): drop
        # NaN entries and recompute this metric's bucket bounds over
        # the filtered sorted stream
        if np.issubdtype(v.dtype, np.floating) and np.isnan(v).any():
            ok = ~np.isnan(v)
            v = v[ok]
            si = sorted_inv[ok]
            starts_m = np.searchsorted(si, np.arange(n_keys), side="left")
            ends_m = np.searchsorted(si, np.arange(n_keys), side="right")
        else:
            starts_m, ends_m = starts, ends
        if kind in ("cardinality", "percentiles"):
            for b in range(n_keys):
                per_bucket[b][name] = _metric_partial(
                    kind, v[starts_m[b]:ends_m[b]], body)
            continue
        counts = ends_m - starts_m
        if kind == "value_count":
            for b in range(n_keys):
                per_bucket[b][name] = {"k": "count", "count": int(counts[b])}
            continue
        vf = v.astype(np.float64, copy=False)
        nz = counts > 0
        sums = np.zeros(n_keys)
        mins = np.zeros(n_keys)
        maxs = np.zeros(n_keys)
        sqs = np.zeros(n_keys)
        if nz.any():
            # reduceat windows are exact: ends[b] == starts[b+1] (right
            # bound of b == left bound of b+1 in a sorted stream), so
            # the next NON-EMPTY bucket's start equals this bucket's end
            st = starts_m[nz]
            sums[nz] = np.add.reduceat(vf, st)
            mins[nz] = np.minimum.reduceat(vf, st)
            maxs[nz] = np.maximum.reduceat(vf, st)
            sqs[nz] = np.add.reduceat(vf * vf, st)
        for b in range(n_keys):
            if counts[b]:
                per_bucket[b][name] = {
                    "k": "stats", "count": int(counts[b]),
                    "sum": float(sums[b]), "min": float(mins[b]),
                    "max": float(maxs[b]), "sum_sq": float(sqs[b]),
                }
            else:
                per_bucket[b][name] = {"k": "stats", "count": 0,
                                       "sum": 0.0, "min": None,
                                       "max": None, "sum_sq": 0.0}
    return per_bucket


def _py(v):
    return v.item() if hasattr(v, "item") else v


_NESTED_K = {"terms": "terms", "histogram": "hist",
             "date_histogram": "dhist"}


def _nested_bucket_partials(kind, body, sub2, reader, evaluator,
                            midx, inv, n_keys, scores, ordinal):
    """terms / histogram / date_histogram nested under a bucket agg:
    one factorization of the child key over ALL matched docs, fused
    with the parent ordinal (`inv * n_child + child_inv`) so the
    per-(parent, child) doc counts — and any grandchild recursion —
    are a single ``np.unique`` pass, never a per-parent-bucket loop
    over documents (the same keyed-block rule the dedup ops follow).
    Returns n_keys partials of kind terms/hist/dhist."""
    field = body["field"]
    vals = (_multi_doc_values(reader, field)
            if kind == "terms" else _doc_values(reader, field))[midx]
    vals, keepm = _null_mask(vals)
    midx2, inv2 = midx[keepm], inv[keepm]
    if kind == "terms":
        ckeys, cinv = np.unique(vals, return_inverse=True)
    else:
        ckeys, cinv = np.unique(_hist_keys(vals, kind, body),
                                return_inverse=True)
    nck = len(ckeys)
    if nck == 0:
        return [{"k": _NESTED_K[kind], "buckets": {}}
                for _ in range(n_keys)]
    code = inv2.astype(np.int64) * nck + cinv
    ucodes, kinv, counts = np.unique(code, return_inverse=True,
                                     return_counts=True)
    subs = (_grouped_metric_partials(sub2, reader, midx2, kinv,
                                     len(ucodes), scores, ordinal,
                                     evaluator)
            if sub2 else [{}] * len(ucodes))
    # assemble per-parent bucket dicts — a loop over (parent, child)
    # BUCKET pairs (metadata-sized), not over docs
    per_parent: list[dict] = [{} for _ in range(n_keys)]
    for i, c in enumerate(ucodes):
        b, ci = divmod(int(c), nck)
        per_parent[b][_py(ckeys[ci])] = {
            "doc_count": int(counts[i]), "sub": subs[i]}
    ss = body.get("shard_size")
    if ss is not None and kind == "terms":
        ss = int(ss)
        for b in range(n_keys):
            if len(per_parent[b]) > ss:
                top = sorted(per_parent[b].items(),
                             key=lambda kv: (-kv[1]["doc_count"],
                                             str(kv[0])))[:ss]
                per_parent[b] = dict(top)
    return [{"k": _NESTED_K[kind], "buckets": bp} for bp in per_parent]


def _nested_mask_partials(kind, body, sub2, reader, evaluator,
                          midx, inv, n_keys, scores, ordinal):
    """filter / filters / missing / range nested under a bucket agg:
    each child's doc mask is evaluated ONCE over the segment, then
    per-parent doc counts fall out of one ``bincount`` and the
    grandchild recursion reuses the same parent ordinals restricted to
    the child's docs. Returns n_keys partials."""
    from raydex.search.query import parse_query

    def one(childmask_local):
        # childmask_local: bool over midx entries
        m2, i2 = midx[childmask_local], inv[childmask_local]
        cnts = np.bincount(i2, minlength=n_keys)
        subs = (_grouped_metric_partials(sub2, reader, m2, i2, n_keys,
                                         scores, ordinal, evaluator)
                if sub2 else [{}] * n_keys)
        return [{"k": "filter", "doc_count": int(cnts[b]),
                 "sub": subs[b]} for b in range(n_keys)]

    if kind == "filter":
        _, fmask = evaluator.eval(parse_query(body))
        return one(fmask[midx])
    if kind == "missing":
        field = body["field"]
        fr = (None if field in ("dl", "url")
              or field in getattr(reader, "doc_values", {})
              else _field_subreader(reader, field))
        if fr is not None:
            covered = np.zeros(reader.ndocs, dtype=bool)
            covered[fr.all_postings_docids()[0]] = True
            miss = ~covered
        else:
            vals = _doc_values(reader, field)
            miss = (np.isnan(vals) if vals.dtype.kind == "f"
                    else np.zeros(reader.ndocs, dtype=bool))
        return one(miss[midx])
    if kind == "filters":
        named = body.get("filters") or {}
        other = np.ones(len(midx), dtype=bool)
        cols: dict[str, list] = {}
        for bname in named:
            _, fmask = evaluator.eval(parse_query(named[bname]))
            loc = fmask[midx]
            other &= ~loc
            cols[bname] = one(loc)
        if body.get("other_bucket") or body.get("other_bucket_key"):
            okey = str(body.get("other_bucket_key") or "_other_")
            cols[okey] = one(other)
        return [{"k": "filters",
                 "buckets": {bn: col[b] for bn, col in cols.items()}}
                for b in range(n_keys)]
    # range: per-range local masks from the doc-values column
    vals = _doc_values(reader, body["field"])[midx]
    per_range = []
    for rng in body["ranges"]:
        m = np.ones(len(vals), dtype=bool)
        if vals.dtype.kind == "f":
            m &= ~np.isnan(vals)
        if rng.get("from") is not None:
            m &= vals >= rng["from"]
        if rng.get("to") is not None:
            m &= vals < rng["to"]
        per_range.append(one(m))
    return [{"k": "range", "buckets": [pr[b] for pr in per_range]}
            for b in range(n_keys)]


def _null_mask(vals: np.ndarray):
    """(non-null values, keep-mask) — mirrors :func:`_drop_nulls` but
    returns the mask so callers can restrict parallel arrays."""
    if np.issubdtype(vals.dtype, np.floating):
        ok = ~np.isnan(vals)
    elif vals.dtype == object:
        ok = np.array([v is not None for v in vals], dtype=bool)
    else:
        return vals, np.ones(len(vals), dtype=bool)
    return vals[ok], ok


def _top_hits_partial(reader, midx, scores, ordinal, size):
    if scores is None:
        raise ValueError("top_hits needs the main query's scores")
    if len(midx) == 0:
        return {"k": "hits", "size": size, "hits": []}
    # float32 is the engine's scoring contract (Lucene parity); the
    # evaluator's float64 intermediates round differently in the last
    # bits than the top-k scorers, so rank ties are broken identically
    # but absolute values may differ ~1e-7 from the hits phase
    s = scores[midx].astype(np.float32)
    top = np.argsort(-s, kind="stable")[:size]
    ids = midx[top]
    return {"k": "hits", "size": size, "hits": [
        {"score": float(s[t]), "ordinal": int(ordinal),
         "docid": int(d), "url": str(reader.urls[int(d)])}
        for t, d in zip(top, ids)
    ]}


def collect_partials(reader, evaluator, mask: np.ndarray,
                     aggs_spec: dict, scores=None, ordinal: int = 0) -> dict:
    """{name: partial} for one segment over the matching-doc mask.
    ``scores``: the main query's per-doc scores (top_hits sub-phase);
    ``ordinal``: this segment's global ordinal (hit identity)."""
    out: dict = {}
    midx = np.flatnonzero(mask)
    for name, spec in aggs_spec.items():
        kind, body, sub = _split_spec(spec)
        if kind == "top_hits":
            if sub:
                raise ValueError("metric aggregations take no sub-aggregations")
            out[name] = _top_hits_partial(
                reader, midx, scores, ordinal, int(body.get("size", 3)))
        elif kind in _METRICS:
            if sub:
                raise ValueError("metric aggregations take no sub-aggregations")
            fmeta = getattr(reader, "fields_meta", {}).get(
                body.get("field", ""), {})
            if fmeta.get("analyzer") == "aggregate_metric_double":
                out[name] = _agg_metric_field_partial(
                    reader, midx, body["field"], kind)
                continue
            if fmeta.get("analyzer") == "histogram":
                out[name] = _histogram_field_partial(
                    reader, midx, body["field"], kind, body)
                continue
            if kind == "cardinality":
                # same precedence as terms/missing: a stored doc-values
                # column wins over a keyword sub-index of the same name
                f = body["field"]
                fr = (None if f in ("dl", "url") or f in reader.doc_values
                      else _field_subreader(reader, f))
                if fr is not None:
                    # distinct keyword values among matched docs: one
                    # sweep reduceat; only the surviving terms get
                    # materialized for the coordinator's cross-segment
                    # distinct merge
                    nz = np.flatnonzero(fr.fg_term_counts(mask))
                    vals = np.array(
                        [str(fr._terms_pa[int(ti)].as_py()) for ti in nz],
                        dtype=object,
                    )
                    out[name] = _metric_partial("cardinality", vals,
                                                body)
                    continue
            out[name] = _metric_partial(
                kind, _doc_values(reader, body["field"])[midx], body)
        elif kind in ("significant_terms", "significant_text"):
            out[name] = _collect_significant(reader, mask, body, sub,
                                             scores, ordinal, evaluator)
        elif kind == "terms":
            out[name] = _collect_terms(reader, evaluator, mask, midx,
                                       body, sub, scores, ordinal)
        elif kind in ("histogram", "date_histogram"):
            out[name] = _collect_histogram(reader, evaluator, midx, kind,
                                           body, sub, scores, ordinal)
        elif kind == "range":
            vals = _doc_values(reader, body["field"])[midx]
            buckets = []
            for rng in body["ranges"]:
                m = np.ones(len(vals), dtype=bool)
                if "from" in rng and rng["from"] is not None:
                    m &= vals >= rng["from"]
                if "to" in rng and rng["to"] is not None:
                    m &= vals < rng["to"]
                sub_mask = np.zeros_like(mask)
                sub_mask[midx[m]] = True
                buckets.append({
                    "doc_count": int(m.sum()),
                    "sub": collect_partials(reader, evaluator, sub_mask,
                                            sub, scores, ordinal),
                })
            out[name] = {"k": "range", "buckets": buckets}
        elif kind == "missing":
            # MissingAggregationBuilder: matched docs with NO value in
            # the field (keyword fields: outside every posting list;
            # float doc-values: NaN; dense int columns: none missing)
            field = body["field"]
            fr = (None if field in ("dl", "url")
                  or field in reader.doc_values
                  else _field_subreader(reader, field))
            if fr is not None:
                covered = np.zeros(reader.ndocs, dtype=bool)
                covered[fr.all_postings_docids()[0]] = True
                mmask = mask & ~covered
            else:
                vals = _doc_values(reader, field)
                miss = (np.isnan(vals) if vals.dtype.kind == "f"
                        else np.zeros(reader.ndocs, dtype=bool))
                mmask = mask & miss
            out[name] = {
                "k": "filter", "doc_count": int(mmask.sum()),
                "sub": collect_partials(reader, evaluator, mmask, sub,
                                        scores, ordinal),
            }
        elif kind == "filter":
            from raydex.search.query import parse_query

            _, fmask = evaluator.eval(parse_query(body))
            fmask = fmask & mask
            out[name] = {
                "k": "filter", "doc_count": int(fmask.sum()),
                "sub": collect_partials(reader, evaluator, fmask, sub,
                                        scores, ordinal),
            }
        elif kind == "filters":
            # FiltersAggregationBuilder: named buckets, optional
            # other_bucket (docs matching none of the filters)
            from raydex.search.query import parse_query

            named = body.get("filters") or {}
            other = mask.copy()
            bkts: dict = {}
            for bname in named:
                _, fmask = evaluator.eval(parse_query(named[bname]))
                fmask = fmask & mask
                other &= ~fmask
                bkts[bname] = {
                    "doc_count": int(fmask.sum()),
                    "sub": collect_partials(reader, evaluator, fmask, sub,
                                            scores, ordinal),
                }
            if body.get("other_bucket") or body.get("other_bucket_key"):
                okey = str(body.get("other_bucket_key") or "_other_")
                bkts[okey] = {
                    "doc_count": int(other.sum()),
                    "sub": collect_partials(reader, evaluator, other, sub,
                                            scores, ordinal),
                }
            out[name] = {"k": "filters", "buckets": bkts}
        elif kind == "rare_terms":
            out[name] = _collect_rare_terms(reader, mask, body)
        elif kind in ("geo_bounds", "geo_centroid", "geotile_grid",
                      "geohash_grid", "geo_distance"):
            out[name] = _collect_geo(reader, evaluator, midx, kind,
                                     body, sub, scores, ordinal)
        elif kind == "multi_terms":
            out[name] = _collect_multi_terms(reader, evaluator, mask, midx,
                                             body, sub, scores, ordinal)
        elif kind == "global":
            gmask = np.ones(reader.ndocs, dtype=bool)
            if reader.live is not None:
                gmask &= reader.live
            out[name] = {
                "k": "filter", "doc_count": int(gmask.sum()),
                "sub": collect_partials(reader, evaluator, gmask, sub,
                                        scores, ordinal),
            }
        else:
            raise ValueError(f"unsupported aggregation kind {kind!r}")
    return out


def _term_filter(body):
    """terms-agg include/exclude (``IncludeExclude.java``): exact value
    list or anchored regex over the bucket key; None = keep all."""
    inc, exc = body.get("include"), body.get("exclude")
    if inc is None and exc is None:
        return None
    import re

    inc_rx = re.compile(inc) if isinstance(inc, str) else None
    exc_rx = re.compile(exc) if isinstance(exc, str) else None
    # value lists compare against the STRINGIFIED bucket key (numeric
    # doc-values keys stringify before filtering)
    if inc is not None and inc_rx is None:
        inc = {str(v) for v in inc}
    if exc is not None and exc_rx is None:
        exc = {str(v) for v in exc}

    def ok(t: str) -> bool:
        if inc is not None:
            if inc_rx is not None:
                if not inc_rx.fullmatch(t):
                    return False
            elif t not in inc:
                return False
        if exc is not None:
            if exc_rx is not None:
                if exc_rx.fullmatch(t):
                    return False
            elif t in exc:
                return False
        return True

    return ok


def _collect_terms(reader, evaluator, mask, midx, body, sub_spec,
                   scores=None, ordinal: int = 0):
    field = body["field"]
    fr = None
    if field not in ("dl", "url") and field not in reader.doc_values:
        fr = _field_subreader(reader, field)
    keep = _term_filter(body)
    buckets: dict = {}
    if fr is not None:
        # keyword index-time field: one sweep reduceat gives every
        # term's matched count (exact multi-value semantics, like
        # SortedSetDocValues terms); only surviving terms materialize
        fg = fr.fg_term_counts(mask)
        nz = np.flatnonzero(fg)
        docids = starts = None
        if sub_spec and nz.size:
            docids, starts = fr.all_postings_docids()
        for ti in nz:
            key = str(fr._terms_pa[int(ti)].as_py())
            if keep is not None and not keep(key):
                continue
            b = {"doc_count": int(fg[ti]), "sub": {}}
            if sub_spec:
                ids = docids[starts[ti]:starts[ti + 1]]
                hit = ids[mask[ids]]
                inv = np.zeros(len(hit), dtype=np.int64)
                b["sub"] = _grouped_metric_partials(
                    sub_spec, reader, hit, inv, 1, scores, ordinal,
                    evaluator)[0]
            buckets[key] = b
        if body.get("missing") is not None:
            covered = np.zeros(reader.ndocs, dtype=bool)
            covered[fr.all_postings_docids()[0]] = True
            mmask = mask & ~covered
            n_miss = int(mmask.sum())
            mkey = str(body["missing"])
            if n_miss and (keep is None or keep(mkey)):
                msub: dict = {}
                if sub_spec:
                    hit = np.flatnonzero(mmask)
                    inv = np.zeros(hit.size, dtype=np.int64)
                    msub = _grouped_metric_partials(
                        sub_spec, reader, hit, inv, 1, scores, ordinal,
                        evaluator)[0]
                got = buckets.get(mkey)
                if got is None:
                    buckets[mkey] = {"doc_count": n_miss, "sub": msub}
                else:  # missing key collides with a real term: merge
                    got["doc_count"] += n_miss
                    got["sub"] = reduce_partials([got["sub"], msub])
    else:
        vals = _doc_values(reader, field)[midx]
        vals, midx = _drop_nulls(vals, midx)
        keys, inv, counts = np.unique(
            vals, return_inverse=True, return_counts=True)
        subs = (_grouped_metric_partials(sub_spec, reader, midx, inv,
                                         len(keys), scores, ordinal,
                                         evaluator)
                if sub_spec else [{}] * len(keys))
        for i, k in enumerate(keys):
            k = _py(k)
            if keep is not None and not keep(str(k)):
                continue
            buckets[k] = {"doc_count": int(counts[i]), "sub": subs[i]}
    return {"k": "terms", "buckets": buckets}


def _jlh(fg, fg_total, bg, bg_total):
    """JLH significance (``heuristic/JLHScore.java``): absolute change
    times relative change of the in-set vs background frequency."""
    if fg_total == 0 or bg_total == 0 or bg == 0:
        return 0.0
    fgp = fg / fg_total
    bgp = bg / bg_total
    if fgp <= bgp:
        return 0.0
    return (fgp - bgp) * (fgp / bgp)


def _multi_doc_values(reader, field: str):
    """Per-doc value array for multi_terms keys: a doc-values column
    (first, same precedence as terms/cardinality/missing — a wildcard
    field's stored string column must win over its 3-gram sub-index),
    or a single-valued keyword sub-field inverted from the docid sweep
    (multi-valued keyword fields would need per-combination explosion —
    the reference's MultiTermsAggregator has the same per-doc-tuple
    model)."""
    fr = (None if field in ("dl", "url") or field in reader.doc_values
          else _field_subreader(reader, field))
    if fr is None:
        return _doc_values(reader, field)
    vals = np.full(reader.ndocs, None, dtype=object)
    docids, starts = fr.all_postings_docids()
    terms = fr.terms
    df = np.diff(starts)
    vals[docids] = np.repeat(terms, df)
    return vals


def _collect_multi_terms(reader, evaluator, mask, midx, body, sub_spec,
                         scores=None, ordinal: int = 0):
    """``multi_terms`` (``analytics/multiterms/MultiTermsAggregator``):
    buckets keyed by the TUPLE of per-doc values. Each component is
    factorized with ``np.unique``; the combined code is one int per doc,
    so bucketing stays a single vectorized pass."""
    fields = [t["field"] for t in body["terms"]]
    if len(fields) < 2:
        raise ValueError("multi_terms needs at least two fields")
    # docs missing ANY key field drop out (MultiTermsAggregator skips
    # docs without a value for every term source)
    cols = [_multi_doc_values(reader, f)[midx] for f in fields]
    valid = np.ones(len(midx), dtype=bool)
    for vals in cols:
        if vals.dtype == object:
            valid &= np.array([v is not None for v in vals], dtype=bool)
        elif np.issubdtype(vals.dtype, np.floating):
            valid &= ~np.isnan(vals)
    midx = midx[valid]
    invs, uniqs = [], []
    for vals in cols:
        vals = vals[valid]
        u, inv = np.unique(vals.astype(str), return_inverse=True)
        uniqs.append(u)
        invs.append(inv)
    code = invs[0].astype(np.int64)
    for u, inv in zip(uniqs[1:], invs[1:]):
        code = code * (len(u) or 1) + inv
    keys, kinv, counts = np.unique(code, return_inverse=True,
                                   return_counts=True)
    subs = (_grouped_metric_partials(sub_spec, reader, midx, kinv,
                                     len(keys), scores, ordinal, evaluator)
            if sub_spec else [{}] * len(keys))
    buckets: dict = {}
    for i, c in enumerate(keys):
        parts = []
        rem = int(c)
        for u in reversed(uniqs[1:]):
            rem, comp = divmod(rem, (len(u) or 1))
            parts.append(str(u[comp]))
        parts.append(str(uniqs[0][rem]))
        key_list = parts[::-1]
        buckets["\x1f".join(key_list)] = {
            "doc_count": int(counts[i]), "key": key_list, "sub": subs[i],
        }
    return {"k": "mterms", "buckets": buckets}


def _collect_rare_terms(reader, mask, body):
    """``rare_terms`` (``bucket/terms/RareTermsAggregationBuilder``):
    terms whose TOTAL matched doc_count is <= max_doc_count. Exact
    distributed law: a shard ships its fg counts for candidate terms
    (local fg <= max) plus the terms it DISQUALIFIES (local fg > max —
    any local excess disqualifies globally since counts only add); the
    reference trades exactness for a bloom filter here, this engine's
    shard partial is matched-vocabulary-bounded instead."""
    field = body["field"]
    maxc = int(body.get("max_doc_count", 1))
    # doc-values precedence, same guard as terms/cardinality/missing:
    # a wildcard field's sub-index holds anchored 3-GRAMS, not values —
    # aggregate its stored doc-values column instead
    fr = (None if field in ("dl", "url")
          or field in getattr(reader, "doc_values", {})
          else _field_subreader(reader, field))
    if fr is None:
        vals = _doc_values(reader, field)[mask]
        vals = vals[np.array([v is not None for v in vals], dtype=bool)] \
            if vals.dtype == object else vals
        uniq, cnt = np.unique(vals.astype(str), return_counts=True) \
            if len(vals) else (np.empty(0, dtype=object),
                               np.empty(0, dtype=np.int64))
        kept = {str(t): int(c) for t, c in zip(uniq, cnt) if c <= maxc}
        banned = [str(t) for t, c in zip(uniq, cnt) if c > maxc]
        return {"k": "rare", "max": maxc, "kept": kept, "banned": banned}
    fg = fr.fg_term_counts(mask)
    nz = np.flatnonzero(fg)
    kept: dict = {}
    banned: list = []
    for ti in nz:
        t = str(fr._terms_pa[int(ti)].as_py())
        if fg[ti] <= maxc:
            kept[t] = int(fg[ti])
        else:
            banned.append(t)
    return {"k": "rare", "max": maxc, "kept": kept, "banned": banned}


def _collect_significant(reader, mask, body, sub_spec=None,
                         scores=None, ordinal: int = 0, evaluator=None):
    """fg/bg term counts over matched docs, pruned to the shard's
    ``shard_size`` best JLH candidates (SignificantTerms/Text
    aggregators: each shard nominates candidates with EXACT local
    counts; the coordinator re-scores on merged totals)."""
    field = body.get("field", "text")
    fr = reader if field == "text" else (
        reader.field(field) if hasattr(reader, "field") else None)
    if fr is None:
        raise ValueError(
            f"significant_terms needs an index-time text/keyword field, "
            f"got {field!r}")
    # sub-field docids align with the parent segment's docids (one doc
    # per row in both), so the main-query mask applies directly
    fg_total = int(mask.sum())
    bg_total = int(fr.ndocs)
    size = int(body.get("size", 10))
    shard_size = int(body.get("shard_size", max(200, size * 3)))
    terms_out: dict = {}
    if fg_total:
        # one vectorized sweep for ALL terms' fg counts (no per-term
        # postings decode); JLH scored in numpy. The term dict is
        # byte-sorted, so among equal scores ascending term INDEX is
        # ascending term string — a stable argsort on -score reproduces
        # the scalar (-score, term) order without materializing the
        # vocabulary; only the shard_size winners get .as_py()'d.
        fg_all = fr.fg_term_counts(mask)
        cand = np.flatnonzero(fg_all)
        if cand.size:
            fg = fg_all[cand].astype(np.float64)
            bg = fr.df[cand].astype(np.float64)
            fgp = fg / fg_total
            bgp = bg / bg_total
            with np.errstate(divide="ignore", invalid="ignore"):
                score = np.where(
                    (bgp > 0) & (fgp > bgp), (fgp - bgp) * (fgp / bgp), 0.0)
            order = np.argsort(-score, kind="stable")[:shard_size]
            sel = cand[order]
            docids = starts = None
            if sub_spec and sel.size:
                # per-winner metric sub-aggregations over the term's
                # MATCHED docs (sub-field docids align with the parent
                # segment's), sliced from the cached sweep
                docids, starts = fr.all_postings_docids()
            terms_out = {}
            for ti in sel:
                entry: list = [int(fg_all[ti]), int(fr.df[ti])]
                if sub_spec:
                    ids = docids[starts[ti]:starts[ti + 1]]
                    hit = ids[mask[ids]]
                    inv = np.zeros(len(hit), dtype=np.int64)
                    entry.append(_grouped_metric_partials(
                        sub_spec, reader, hit, inv, 1, scores, ordinal,
                        evaluator)[0])
                terms_out[str(fr._terms_pa[int(ti)].as_py())] = entry
    return {
        "k": "sig", "fg_total": fg_total, "bg_total": bg_total,
        "terms": terms_out,
    }


def _fixed_interval_us(s: str) -> int:
    unit = s[-1]
    if unit not in _FIXED_US:
        raise ValueError(f"unsupported fixed_interval {s!r}")
    return int(s[:-1]) * _FIXED_US[unit]


def _drop_nulls(vals: np.ndarray, midx: np.ndarray):
    """Docs without a value never reach a bucket or a metric (arrow
    nulls surface as NaN after the float64 doc-values conversion; the
    reference's ValuesSource simply skips such docs)."""
    if np.issubdtype(vals.dtype, np.floating):
        ok = ~np.isnan(vals)
        if not ok.all():
            return vals[ok], midx[ok]
    elif vals.dtype == object:
        ok = np.array([v is not None for v in vals], dtype=bool)
        if not ok.all():
            return vals[ok], midx[ok]
    return vals, midx


def _hist_keys(vals: np.ndarray, kind: str, body: dict) -> np.ndarray:
    """Bucket key per value: floor-to-interval (histogram) or
    calendar/fixed truncation (date_histogram)."""
    if kind == "histogram":
        interval = float(body["interval"])
        return np.floor(vals / interval) * interval
    if "calendar_interval" in body:
        unit = _CAL_UNITS.get(body["calendar_interval"])
        if unit is None:
            raise ValueError(
                f"unsupported calendar_interval {body['calendar_interval']!r}")
        dt = vals.astype("datetime64[us]")
        return (dt.astype(f"datetime64[{unit}]")
                .astype("datetime64[us]").astype(np.int64))
    iv = _fixed_interval_us(body["fixed_interval"])
    return (vals.astype(np.int64) // iv) * iv


def _collect_histogram(reader, evaluator, midx, kind, body, sub_spec,
                       scores=None, ordinal: int = 0):
    vals = _doc_values(reader, body["field"])[midx]
    vals, midx = _drop_nulls(vals, midx)
    keys, inv, counts = np.unique(
        _hist_keys(vals, kind, body), return_inverse=True,
        return_counts=True)
    subs = (_grouped_metric_partials(sub_spec, reader, midx, inv, len(keys),
                                     scores, ordinal, evaluator)
            if sub_spec else [{}] * len(keys))
    buckets = {
        _py(k): {"doc_count": int(counts[i]), "sub": subs[i]}
        for i, k in enumerate(keys)
    }
    return {"k": "hist" if kind == "histogram" else "dhist",
            "buckets": buckets}


def _collect_geo(reader, evaluator, midx, kind, body, sub_spec,
                 scores=None, ordinal: int = 0):
    """Geo aggregations over a geo_point field's lat/lon doc-values
    (``search/aggregations/bucket/geogrid`` + ``metrics/GeoBounds/
    GeoCentroid``): bounds/centroid ship scalar partials; the grid aggs
    factorize tile/hash keys once (one vectorized pass) and reuse the
    terms partial shape; geo_distance reuses the range shape over
    haversine meters from the origin."""
    from raydex.ops.geo import (
        geohash_encode,
        geotile_keys,
        haversine_m,
        parse_distance_m,
    )

    field = body["field"]
    la = _doc_values(reader, f"{field}__lat")[midx]
    lo = _doc_values(reader, f"{field}__lon")[midx]
    ok = ~(np.isnan(la) | np.isnan(lo))
    la, lo, midx = la[ok], lo[ok], midx[ok]
    if kind == "geo_bounds":
        if la.size == 0:
            return {"k": "gbounds", "top": None, "bottom": None,
                    "left": None, "right": None}
        return {"k": "gbounds", "top": float(la.max()),
                "bottom": float(la.min()), "left": float(lo.min()),
                "right": float(lo.max())}
    if kind == "geo_centroid":
        return {"k": "gcentroid", "count": int(la.size),
                "sum_lat": float(la.sum()), "sum_lon": float(lo.sum())}
    if kind in ("geotile_grid", "geohash_grid"):
        prec = int(body.get("precision",
                            7 if kind == "geotile_grid" else 5))
        keys = (geotile_keys(la, lo, prec) if kind == "geotile_grid"
                else geohash_encode(la, lo, prec))
        karr = np.asarray(keys, dtype=object)
        uk, inv, counts = np.unique(karr, return_inverse=True,
                                    return_counts=True)
        subs = (_grouped_metric_partials(sub_spec, reader, midx, inv,
                                         len(uk), scores, ordinal,
                                         evaluator)
                if sub_spec else [{}] * len(uk))
        return {"k": "terms", "buckets": {
            str(k): {"doc_count": int(counts[i]), "sub": subs[i]}
            for i, k in enumerate(uk)
        }}
    # geo_distance: range buckets over meters from the origin
    olat = float((body.get("origin") or {}).get("lat", 0.0)) \
        if isinstance(body.get("origin"), dict) else None
    if olat is None:
        from raydex.search.query import _latlon

        olat, olon = _latlon(body.get("origin"), (0.0, 0.0))
    else:
        olon = float(body["origin"].get("lon", 0.0))
    dist = haversine_m(olat, olon, la, lo)
    unit = body.get("unit", "m")
    scale = parse_distance_m("1" + unit)
    dist = dist / scale
    buckets = []
    for rng in body["ranges"]:
        m = np.ones(len(dist), dtype=bool)
        if rng.get("from") is not None:
            m &= dist >= float(rng["from"])
        if rng.get("to") is not None:
            m &= dist < float(rng["to"])
        sub = (_grouped_metric_partials(
            sub_spec, reader, midx[m],
            np.zeros(int(m.sum()), dtype=np.int64), 1, scores,
            ordinal, evaluator)[0] if sub_spec else {})
        buckets.append({"doc_count": int(m.sum()), "sub": sub})
    return {"k": "range", "buckets": buckets}


# ------------------------------------------------------------- reduce


def _merge_partial(a, b):
    if a is None:
        return b
    if b is None:
        return a
    k = a["k"]
    if k == "count":
        return {"k": "count", "count": a["count"] + b["count"]}
    if k in ("set", "hll"):
        return _merge_cardinality(a, b)
    if k == "stats":
        if a["count"] == 0:
            return b
        if b["count"] == 0:
            return a
        return {
            "k": "stats", "count": a["count"] + b["count"],
            "sum": a["sum"] + b["sum"],
            "min": min(a["min"], b["min"]), "max": max(a["max"], b["max"]),
            "sum_sq": a.get("sum_sq", 0.0) + b.get("sum_sq", 0.0),
        }
    if k == "tdigest":
        from raydex.ops.tdigest import TDigest

        d = TDigest.from_arrays(np.asarray(a["means"]),
                                np.asarray(a["weights"]))
        d.merge(TDigest.from_arrays(np.asarray(b["means"]),
                                    np.asarray(b["weights"])))
        means, weights = d.to_arrays()
        return {"k": "tdigest", "means": [float(x) for x in means],
                "weights": [float(x) for x in weights]}
    if k in ("terms", "hist", "dhist", "filters", "mterms"):
        buckets = dict(a["buckets"])
        for key, bb in b["buckets"].items():
            if key in buckets:
                cur = buckets[key]
                merged = {
                    "doc_count": cur["doc_count"] + bb["doc_count"],
                    "sub": reduce_partials([cur["sub"], bb["sub"]]),
                }
                if "key" in cur:  # mterms carries the value tuple
                    merged["key"] = cur["key"]
                buckets[key] = merged
            else:
                buckets[key] = bb
        return {"k": k, "buckets": buckets}
    if k == "rare":
        kept = dict(a["kept"])
        for t, c in b["kept"].items():
            kept[t] = kept.get(t, 0) + c
        return {"k": "rare", "max": a["max"], "kept": kept,
                "banned": sorted(set(a["banned"]) | set(b["banned"]))}
    if k == "range":
        return {"k": "range", "buckets": [
            {"doc_count": x["doc_count"] + y["doc_count"],
             "sub": reduce_partials([x["sub"], y["sub"]])}
            for x, y in zip(a["buckets"], b["buckets"])
        ]}
    if k == "filter":
        return {"k": "filter",
                "doc_count": a["doc_count"] + b["doc_count"],
                "sub": reduce_partials([a["sub"], b["sub"]])}
    if k == "gbounds":
        if a["top"] is None:
            return b
        if b["top"] is None:
            return a
        return {"k": "gbounds",
                "top": max(a["top"], b["top"]),
                "bottom": min(a["bottom"], b["bottom"]),
                "left": min(a["left"], b["left"]),
                "right": max(a["right"], b["right"])}
    if k == "gcentroid":
        return {"k": "gcentroid", "count": a["count"] + b["count"],
                "sum_lat": a["sum_lat"] + b["sum_lat"],
                "sum_lon": a["sum_lon"] + b["sum_lon"]}
    if k == "hits":
        merged = sorted(
            a["hits"] + b["hits"],
            key=lambda h: (-h["score"], h["ordinal"], h["docid"]),
        )[:a["size"]]
        return {"k": "hits", "size": a["size"], "hits": merged}
    if k == "sig":
        # entries are [fg, bg] or [fg, bg, sub-partials]
        terms = {t: list(c) for t, c in a["terms"].items()}
        for t, e in b["terms"].items():
            cur = terms.get(t)
            if cur is None:
                terms[t] = list(e)
                continue
            cur[0] += e[0]
            cur[1] += e[1]
            if len(cur) > 2 or len(e) > 2:
                sa = cur[2] if len(cur) > 2 else {}
                sb = e[2] if len(e) > 2 else {}
                merged_sub = reduce_partials([sa, sb])
                if len(cur) > 2:
                    cur[2] = merged_sub
                else:
                    cur.append(merged_sub)
        return {"k": "sig",
                "fg_total": a["fg_total"] + b["fg_total"],
                "bg_total": a["bg_total"] + b["bg_total"],
                "terms": terms}
    raise ValueError(f"unknown partial kind {k!r}")


def _iter_sig(aggs_spec: dict, merged: dict):
    for name, spec in (aggs_spec or {}).items():
        kind, body, sub = _split_spec(spec)
        p = merged.get(name)
        if p is None:
            continue
        if kind in ("significant_terms", "significant_text"):
            yield body, p
        elif kind in ("filter", "global", "missing"):
            yield from _iter_sig(sub, p["sub"])
        elif kind == "filters":
            for b in p["buckets"].values():
                yield from _iter_sig(sub, b["sub"])
        elif kind == "range":
            for b in p["buckets"]:
                yield from _iter_sig(sub, b["sub"])
        elif kind in ("terms", "histogram", "date_histogram",
                      "multi_terms"):
            for b in p["buckets"].values():
                yield from _iter_sig(sub, b.get("sub") or {})


def fix_significant_bg(aggs_spec: dict, merged: dict,
                       text_df, field_df) -> None:
    """Replace nominated candidates' background counts with EXACT
    global df (one stats lookup per unique term, the engine's
    dfs_query_then_fetch machinery). A shard only nominates terms with
    local fg > 0, so summing shard-local bg would undercount terms
    absent from some shards' matches — the reference accepts that
    inaccuracy (SignificantTermsAggregatorFactory uses per-nominating-
    shard docFreq); this engine corrects it."""
    text_terms: set = set()
    fpairs: set = set()
    sigs = list(_iter_sig(aggs_spec, merged))
    for body, p in sigs:
        f = body.get("field", "text")
        if f == "text":
            text_terms |= set(p["terms"])
        else:
            fpairs |= {(f, t) for t in p["terms"]}
    tdf = text_df(sorted(text_terms)) if text_terms else {}
    fdf = field_df(sorted(fpairs)) if fpairs else {}
    for body, p in sigs:
        f = body.get("field", "text")
        for t, c in p["terms"].items():
            c[1] = int(tdf[t] if f == "text" else fdf[(f, t)])


def reduce_partials(parts: list[dict]) -> dict:
    """Merge per-segment {name: partial} dicts (associative +
    commutative — the InternalAggregation#reduce law)."""
    out: dict = {}
    for p in parts:
        for name, partial in p.items():
            out[name] = _merge_partial(out.get(name), partial)
    return out


# ------------------------------------------------------------- render


def _empty_partial(kind: str):
    if kind == "value_count":
        return {"k": "count", "count": 0}
    if kind == "cardinality":
        return {"k": "set", "values": []}
    if kind == "top_hits":
        return {"k": "hits", "size": 0, "hits": []}
    if kind == "percentiles":
        return {"k": "tdigest", "means": [], "weights": []}
    # bucket kinds: an empty-bucket parent (zero-filled histogram slot)
    # renders nested bucket aggs as empty bucket lists
    if kind in ("terms", "rare_terms"):
        return ({"k": "terms", "buckets": {}} if kind == "terms"
                else {"k": "rare", "max": 1, "kept": {}, "banned": []})
    if kind == "histogram":
        return {"k": "hist", "buckets": {}}
    if kind == "date_histogram":
        return {"k": "dhist", "buckets": {}}
    if kind in ("filter", "global", "missing"):
        return {"k": "filter", "doc_count": 0, "sub": {}}
    if kind in ("filters", "multi_terms"):
        return {"k": "filters" if kind == "filters" else "mterms",
                "buckets": {}}
    if kind in ("significant_terms", "significant_text"):
        return {"k": "sig", "fg_total": 0, "bg_total": 0, "terms": {}}
    if kind in ("geotile_grid", "geohash_grid"):
        return {"k": "terms", "buckets": {}}
    if kind == "geo_bounds":
        return {"k": "gbounds", "top": None, "bottom": None,
                "left": None, "right": None}
    if kind == "geo_centroid":
        return {"k": "gcentroid", "count": 0, "sum_lat": 0.0,
                "sum_lon": 0.0}
    if kind == "geo_distance":
        return {"k": "range", "buckets": None}  # filled like range
    if kind == "range":
        return {"k": "range", "buckets": None}  # filled by caller below
    return {"k": "stats", "count": 0, "sum": 0.0, "min": None, "max": None,
            "sum_sq": 0.0}


def render_aggs(aggs_spec: dict, merged: dict) -> dict:
    """Reference-response-shaped aggregations from merged partials."""
    out: dict = {}
    for name, spec in aggs_spec.items():
        kind, body, sub = _split_spec(spec)
        p = merged.get(name)
        if p is None:  # zero-filled histogram buckets carry no partial
            p = _empty_partial(kind)
            if kind in ("range", "geo_distance"):
                p["buckets"] = [{"doc_count": 0, "sub": {}}
                                for _ in body["ranges"]]
        if kind in ("avg", "sum", "min", "max"):
            if p["count"] == 0:
                out[name] = {"value": None}
            elif kind == "avg":
                out[name] = {"value": p["sum"] / p["count"]}
            else:
                out[name] = {"value": p[kind] if kind != "sum" else p["sum"]}
        elif kind in ("stats", "extended_stats"):
            out[name] = {
                "count": p["count"], "sum": p["sum"],
                "min": p["min"], "max": p["max"],
                "avg": (p["sum"] / p["count"]) if p["count"] else None,
            }
            if kind == "extended_stats":
                n, sm, sq = p["count"], p["sum"], p.get("sum_sq", 0.0)
                var = max(0.0, sq / n - (sm / n) ** 2) if n else None
                out[name].update({
                    "sum_of_squares": sq if n else None,
                    "variance": var,
                    "std_deviation": (var ** 0.5) if n else None,
                })
        elif kind == "percentiles":
            from raydex.ops.tdigest import TDigest

            d = TDigest.from_arrays(np.asarray(p["means"]),
                                    np.asarray(p["weights"]))
            percents = body.get("percents", [1, 5, 25, 50, 75, 95, 99])
            out[name] = {"values": {
                str(float(pc)): (d.quantile(pc / 100.0)
                                 if len(p["means"]) else None)
                for pc in percents
            }}
        elif kind == "value_count":
            out[name] = {"value": p["count"]}
        elif kind == "cardinality":
            if p["k"] == "hll":
                from raydex.ops.sketches import HllPlusPlus

                out[name] = {"value": int(round(
                    HllPlusPlus.from_bytes(p["b"]).cardinality()))}
            else:
                out[name] = {"value": len(p["values"])}
        elif kind == "top_hits":
            out[name] = {"hits": p["hits"]}
        elif kind in ("significant_terms", "significant_text"):
            size = int(body.get("size", 10))
            mdc = int(body.get("min_doc_count", 3))
            scored = [
                (_jlh(e[0], p["fg_total"], e[1], p["bg_total"]), t,
                 e[0], e[1], e[2] if len(e) > 2 else None)
                for t, e in p["terms"].items() if e[0] >= mdc
            ]
            scored = [c for c in scored if c[0] > 0]
            scored.sort(key=lambda c: (-c[0], c[1]))
            out[name] = {
                "doc_count": p["fg_total"],
                "bg_count": p["bg_total"],
                "buckets": [
                    {"key": t, "doc_count": fg, "bg_count": bg,
                     "score": s,
                     **(render_aggs(sub, sp) if sp is not None else {})}
                    for s, t, fg, bg, sp in scored[:size]
                ],
            }
        elif kind == "terms":
            size = int(body.get("size", 10))
            mdc = int(body.get("min_doc_count", 1))
            items = [kv for kv in p["buckets"].items()
                     if kv[1]["doc_count"] >= mdc]
            order_spec = body.get("order") or {"_count": "desc"}
            (okey, odir), = order_spec.items()
            rev = str(odir).lower() == "desc"
            if okey == "_count":
                items.sort(key=lambda kv: (
                    -kv[1]["doc_count"] if rev else kv[1]["doc_count"],
                    str(kv[0])))
            elif okey == "_key":
                items.sort(key=lambda kv: kv[0], reverse=rev)
            else:
                # order by a metric sub-aggregation's value; the dotted
                # `"st.avg"` form addresses one component of a
                # multi-value metric (the reference's documented syntax)
                mname, _, comp = okey.partition(".")
                if mname not in sub:
                    raise ValueError(
                        f"terms order references unknown sub-aggregation "
                        f"{mname!r}")

                def metric_val(kv):
                    r = render_aggs({mname: sub[mname]}, kv[1]["sub"])[mname]
                    if comp:
                        v = r.get(comp)
                    else:
                        v = r.get("value", r.get("avg"))
                    return v if v is not None else float("-inf")
                # key tie-break stays ASCENDING regardless of direction
                # (stable sort over the key-presorted list)
                items.sort(key=lambda kv: str(kv[0]))
                items.sort(key=metric_val, reverse=rev)
            items = items[:size]
            out[name] = {"buckets": [
                {"key": k, "doc_count": b["doc_count"],
                 **render_aggs(sub, b["sub"])}
                for k, b in items
            ]}
        elif kind in ("histogram", "date_histogram"):
            mdc = int(body.get("min_doc_count", 1))
            bkts = {k: b for k, b in p["buckets"].items()
                    if b["doc_count"] >= mdc}
            if kind == "histogram" and mdc == 0 and (
                    bkts or "extended_bounds" in body):
                interval = float(body["interval"])
                eb = body.get("extended_bounds") or {}
                keys = list(bkts)
                cand_lo = keys + ([eb["min"]] if "min" in eb else [])
                cand_hi = keys + ([eb["max"]] if "max" in eb else [])
                if cand_lo and cand_hi:
                    # integer bucket ordinals: m*interval reproduces the
                    # collect-side floor(v/interval)*interval keys
                    # exactly (a += loop drifts on fractional intervals)
                    m0 = int(np.floor(min(cand_lo) / interval))
                    m1 = int(np.floor(max(cand_hi) / interval))
                    for m in range(m0, m1 + 1):
                        bkts.setdefault(m * interval,
                                        {"doc_count": 0, "sub": {}})
            items = sorted(bkts.items(), key=lambda kv: kv[0])
            buckets = []
            for k, b in items:
                row = {"key": k, "doc_count": b["doc_count"],
                       **render_aggs(sub, b["sub"])}
                if kind == "date_histogram":
                    row["key"] = int(k) // 1000  # epoch millis
                    row["key_as_string"] = str(
                        np.int64(k).astype("datetime64[us]"))
                buckets.append(row)
            out[name] = {"buckets": buckets}
        elif kind == "range":
            buckets = []
            for rng, b in zip(body["ranges"], p["buckets"]):
                frm, to = rng.get("from"), rng.get("to")
                key = rng.get("key") or (
                    f"{'*' if frm is None else frm}-"
                    f"{'*' if to is None else to}")
                row = {"key": key, "doc_count": b["doc_count"],
                       **render_aggs(sub, b["sub"])}
                if frm is not None:
                    row["from"] = frm
                if to is not None:
                    row["to"] = to
                buckets.append(row)
            out[name] = {"buckets": buckets}
        elif kind in ("filter", "global", "missing"):
            out[name] = {"doc_count": p["doc_count"],
                         **render_aggs(sub, p["sub"])}
        elif kind == "filters":
            out[name] = {"buckets": {
                bname: {"doc_count": b["doc_count"],
                        **render_aggs(sub, b["sub"])}
                for bname, b in p["buckets"].items()
            }}
        elif kind == "multi_terms":
            size = int(body.get("size", 10))
            items = sorted(
                p["buckets"].values(),
                key=lambda b: (-b["doc_count"], b["key"]),
            )[:size]
            out[name] = {"buckets": [
                {"key": b["key"],
                 "key_as_string": "|".join(b["key"]),
                 "doc_count": b["doc_count"],
                 **render_aggs(sub, b["sub"])}
                for b in items
            ]}
        elif kind in ("geotile_grid", "geohash_grid"):
            size = int(body.get("size", 10_000))
            items = sorted(p["buckets"].items(),
                           key=lambda kv: (-kv[1]["doc_count"],
                                           str(kv[0])))[:size]
            out[name] = {"buckets": [
                {"key": k, "doc_count": b["doc_count"],
                 **render_aggs(sub, b["sub"])}
                for k, b in items
            ]}
        elif kind == "geo_distance":
            buckets = []
            for rng, b in zip(body["ranges"], p["buckets"]):
                frm, to = rng.get("from"), rng.get("to")
                key = rng.get("key") or (
                    f"{'*' if frm is None else float(frm)}-"
                    f"{'*' if to is None else float(to)}")
                row = {"key": key, "doc_count": b["doc_count"],
                       **render_aggs(sub, b["sub"])}
                if frm is not None:
                    row["from"] = float(frm)
                if to is not None:
                    row["to"] = float(to)
                buckets.append(row)
            out[name] = {"buckets": buckets}
        elif kind == "geo_bounds":
            out[name] = ({"bounds": None} if p["top"] is None else
                         {"bounds": {
                             "top_left": {"lat": p["top"],
                                          "lon": p["left"]},
                             "bottom_right": {"lat": p["bottom"],
                                              "lon": p["right"]}}})
        elif kind == "geo_centroid":
            c = p["count"]
            out[name] = {"count": c, "location": (
                None if c == 0 else {"lat": p["sum_lat"] / c,
                                     "lon": p["sum_lon"] / c})}
        elif kind == "rare_terms":
            banned = set(p["banned"])
            final = [(t, c) for t, c in p["kept"].items()
                     if c <= p["max"] and t not in banned]
            final.sort(key=lambda tc: (tc[1], tc[0]))
            out[name] = {"buckets": [
                {"key": t, "doc_count": c} for t, c in final
            ]}
        if "meta" in spec and name in out:
            out[name]["meta"] = spec["meta"]  # echoed verbatim (ref)
    return out
