"""Aggregation operators (SURVEY.md §2.6) as Ray Data pipelines.

Execution contract mirrors the reference: per-block PARTIAL aggregation,
shuffled merge of partials, single final reduce
(``server/.../search/aggregations/InternalAggregation.java:41-51``;
partial-reduce law tested per
``test/framework/.../InternalAggregationTestCase.java:356``). Ray Data's
``groupby().aggregate`` already performs map-side combine, so `terms`
needs no shard_size/doc_count_error machinery — the shuffle is exact.

Column naming: every helper takes explicit output column names so Ray
results hash-match the DuckDB oracle SQL (driver compare contract).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def terms_agg(ds, key: str, size: int = 10, count_name: str = "doc_count"):
    """Top-N most frequent values (the `terms` bucket agg,
    ``TermsAggregationBuilder.java:46``) — exact, with map-side combine:
    each block collapses to its (value, count) table first (one
    vectorized ``value_counts``), so the groupby shuffle carries the
    per-block vocabulary instead of the corpus; the final sort+limit
    runs over the combined vocabulary table."""
    import pyarrow.compute as pc

    def partial(t: pa.Table) -> pa.Table:
        vc = pc.value_counts(t[key].combine_chunks())
        return pa.table({key: vc.field("values"),
                         "__n": vc.field("counts").cast(pa.int64())})

    out = ds.map_batches(partial, batch_format="pyarrow") \
            .groupby(key).sum("__n")
    out = out.map_batches(
        lambda t: t.rename_columns([key, count_name]), batch_format="pyarrow"
    )
    tbl = out.sort([count_name, key], descending=[True, False]).limit(size)
    return tbl


def stats_agg(ds, col: str, prefix: str = ""):
    """count/min/max/sum/avg — the `stats` metric agg. Integer-exact:
    sum is exact for int inputs; avg = one float64 division."""
    from ray.data.aggregate import Count, Max, Min, Sum

    p = prefix
    res = ds.aggregate(
        Count(col, alias_name=p + "cnt"),
        Min(col, alias_name=p + "min_v"),
        Max(col, alias_name=p + "max_v"),
        Sum(col, alias_name=p + "sum_v"),
    )
    res[p + "avg_v"] = float(res[p + "sum_v"]) / float(res[p + "cnt"])
    return pa.table({k: [v] for k, v in res.items()})


def extended_stats_agg(ds, col: str):
    """extended_stats: adds sum_of_squares / variance / std via the
    mergeable (count, sum, sum_sq) partial state."""

    def partial(t: pa.Table) -> pa.Table:
        x = t[col].to_numpy().astype(np.float64)
        return pa.table(
            {
                "cnt": pa.array([len(x)], pa.int64()),
                "s": pa.array([float(x.sum())]),
                "ss": pa.array([float((x * x).sum())]),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    cnt, s, ss = int(parts["cnt"].sum()), float(parts["s"].sum()), float(parts["ss"].sum())
    var = ss / cnt - (s / cnt) ** 2 if cnt else float("nan")
    return pa.table(
        {
            "cnt": pa.array([cnt], pa.int64()),
            "sum_v": pa.array([s]),
            "sum_sq": pa.array([ss]),
            "avg_v": pa.array([s / cnt if cnt else float("nan")]),
            "variance": pa.array([var]),
            "std_dev": pa.array([var**0.5 if var == var else float("nan")]),
        }
    )


def value_count_agg(ds, col: str, name: str = "value_count"):
    from ray.data.aggregate import Count

    res = ds.aggregate(Count(col, alias_name=name))
    return pa.table({name: [res[name]]})


def cardinality_exact(ds, col: str, name: str = "cardinality"):
    """Exact distinct count (`cardinality` would be HLL++ — see
    raydex.ops.sketches for the approximate path)."""
    n = ds.unique(col)
    return pa.table({name: pa.array([len(n)], pa.int64())})


def range_agg(ds, col: str, edges: list[float], count_name: str = "doc_count"):
    """`range` bucket agg: half-open [lo, hi) buckets labeled 'lo-hi'
    (reference label convention), plus open-ended ends."""
    edges_arr = np.asarray(edges, dtype=np.float64)
    labels = (
        ["*-%g" % edges[0]]
        + ["%g-%g" % (a, b) for a, b in zip(edges[:-1], edges[1:])]
        + ["%g-*" % edges[-1]]
    )

    def partial(t: pa.Table) -> pa.Table:
        x = t[col].to_numpy().astype(np.float64)
        idx = np.digitize(x, edges_arr)  # 0..len(edges)
        cnt = np.bincount(idx, minlength=len(labels))
        return pa.table(
            {"bucket": pa.array(labels), count_name: pa.array(cnt, pa.int64())}
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .sum(count_name)
    )
    out = out.map_batches(
        lambda t: t.rename_columns(["bucket", count_name]), batch_format="pyarrow"
    )
    return out.sort("bucket")


def date_range_agg(ds, ts_col: str, ranges: list[tuple], count_name: str = "doc_count"):
    """`date_range` bucket agg (DateRangeAggregationBuilder.java):
    half-open [from, to) buckets over a timestamp column; ranges are
    (key, from_iso|None, to_iso|None). Same partial/shuffled-merge shape
    as `range_agg`."""
    bounds = []
    for key, lo, hi in ranges:
        lo_ns = np.datetime64(lo) if lo is not None else None
        hi_ns = np.datetime64(hi) if hi is not None else None
        bounds.append((key, lo_ns, hi_ns))

    def partial(t: pa.Table) -> pa.Table:
        x = t[ts_col].to_numpy()
        keys, cnts = [], []
        for key, lo, hi in bounds:
            m = np.ones(len(x), dtype=bool)
            if lo is not None:
                m &= x >= lo
            if hi is not None:
                m &= x < hi
            keys.append(key)
            cnts.append(int(m.sum()))
        return pa.table({"bucket": pa.array(keys), count_name: pa.array(cnts, pa.int64())})

    out = ds.map_batches(partial, batch_format="pyarrow").groupby("bucket").sum(count_name)
    out = out.map_batches(
        lambda t: t.rename_columns(["bucket", count_name]), batch_format="pyarrow"
    )
    return out.sort("bucket")


def _ipv4_to_u32(arr: pa.ChunkedArray, strict: bool = True):
    """Vectorized dotted-quad -> uint32 (no per-row Python parse).

    strict=True raises on any null / non-4-octet row (callers converting
    literals). strict=False returns ``(vals, valid)`` where malformed or
    null rows have valid=False and an arbitrary value — the agg routes
    them to no bucket instead of silently shifting later rows (a single
    bad row would otherwise corrupt the flat reshape)."""
    if isinstance(arr, pa.Array):
        arr = pa.chunked_array([arr])
    parts = pc.split_pattern(pc.fill_null(arr.cast(pa.string()), ""), ".")
    lens = pc.list_value_length(parts).to_numpy()
    ok = lens == 4
    if strict and not ok.all():
        raise ValueError("malformed IPv4 literal")
    if not ok.all():
        # rebuild with bad rows replaced by 0.0.0.0 so the reshape holds
        keep = pa.array(ok)
        fixed = pc.if_else(keep, arr.combine_chunks(), pa.scalar("0.0.0.0"))
        parts = pc.split_pattern(fixed, ".")
    flat = pc.list_flatten(parts)
    try:
        nums = flat.cast(pa.int64())
    except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
        # non-numeric octet somewhere (e.g. "a.b.c.d")
        if strict:
            raise ValueError("malformed IPv4 literal")
        import pandas as pd

        s = pd.to_numeric(pd.Series(flat.to_pylist()), errors="coerce")
        bad_rows = np.unique(np.nonzero(s.isna().to_numpy())[0] // 4)
        ok[bad_rows] = False
        nums = pa.array(s.fillna(0).astype(np.int64))
    vals_np = nums.to_numpy(zero_copy_only=False)
    rng_ok = (vals_np >= 0) & (vals_np <= 255)
    if not rng_ok.all():
        if strict:
            raise ValueError("IPv4 octet out of range")
        ok &= rng_ok.reshape(-1, 4).all(axis=1)
    octets = np.clip(vals_np, 0, 255).reshape(-1, 4).astype(np.uint64)
    vals = (
        (octets[:, 0] << 24) | (octets[:, 1] << 16)
        | (octets[:, 2] << 8) | octets[:, 3]
    ).astype(np.uint32)
    if strict:
        return vals
    return vals, ok


def ip_range_agg(ds, ip_col: str, ranges: list[tuple], count_name: str = "doc_count"):
    """`ip_range` bucket agg (IpRangeAggregationBuilder.java): buckets
    are (key, from_ip|None, to_ip|None) half-open on the numeric IPv4
    value, or (key, "a.b.c.d/nn") CIDR masks (the reference expands a
    mask to its [network, broadcast+1) range)."""
    bounds = []
    for r in ranges:
        if len(r) == 2 and "/" in str(r[1]):
            key, cidr = r
            base, nbits = cidr.split("/")
            lo = int(_ipv4_to_u32(pa.chunked_array([pa.array([base])]))[0])
            width = 32 - int(nbits)
            lo = (lo >> width) << width
            hi = lo + (1 << width)
            # a range ending at 2^32 (e.g. 128.0.0.0/1) is open-ended
            bounds.append((key, np.uint32(lo),
                           np.uint32(hi) if hi < (1 << 32) else None))
        else:
            key, lo, hi = r
            one = lambda s: np.uint32(
                _ipv4_to_u32(pa.chunked_array([pa.array([s])]))[0]
            ) if s is not None else None
            bounds.append((key, one(lo), one(hi)))

    def partial(t: pa.Table) -> pa.Table:
        x, valid = _ipv4_to_u32(t[ip_col], strict=False)
        keys, cnts = [], []
        for key, lo, hi in bounds:
            m = valid.copy()
            if lo is not None:
                m &= x >= lo
            if hi is not None:
                m &= x < hi
            keys.append(key)
            cnts.append(int(m.sum()))
        return pa.table({"bucket": pa.array(keys), count_name: pa.array(cnts, pa.int64())})

    out = ds.map_batches(partial, batch_format="pyarrow").groupby("bucket").sum(count_name)
    out = out.map_batches(
        lambda t: t.rename_columns(["bucket", count_name]), batch_format="pyarrow"
    )
    return out.sort("bucket")


def histogram_agg(ds, col: str, interval: float, count_name: str = "doc_count"):
    """`histogram`: bucket key = floor(x/interval)*interval."""

    def keyed(t: pa.Table) -> pa.Table:
        x = t[col].to_numpy().astype(np.float64)
        key = np.floor(x / interval) * interval
        return pa.table({"bucket_key": pa.array(key)})

    out = ds.map_batches(keyed, batch_format="pyarrow").groupby("bucket_key").count()
    out = out.map_batches(
        lambda t: t.rename_columns(["bucket_key", count_name]), batch_format="pyarrow"
    )
    return out.sort("bucket_key")


def date_histogram_agg(ds, ts_col: str, unit: str = "day", count_name: str = "doc_count"):
    """`date_histogram` with calendar_interval=day/hour/month."""

    def keyed(t: pa.Table) -> pa.Table:
        k = pc.floor_temporal(t[ts_col], unit=unit)
        return pa.table({"bucket_ts": k})

    out = ds.map_batches(keyed, batch_format="pyarrow").groupby("bucket_ts").count()
    out = out.map_batches(
        lambda t: t.rename_columns(["bucket_ts", count_name]), batch_format="pyarrow"
    )
    return out.sort("bucket_ts")


def composite_agg(ds, keys: list[str], count_name: str = "doc_count",
                  after: tuple | None = None, size: int | None = None):
    """`composite`: all key combinations, key-ordered.

    ``after``/``size`` give the reference's paginate-through-buckets
    contract (``CompositeAggregationBuilder.java`` — the reason
    composite exists): ``after`` is the LAST key tuple of the previous
    page; only buckets strictly greater in key order are returned, at
    most ``size`` of them. The after-filter is pushed INTO the map stage
    (rows <= after never enter the groupby shuffle), so deep pagination
    costs one pruned pass per page, not a full re-aggregation.
    Callers read the next ``after`` from the last returned row."""
    if after is not None:
        if len(after) != len(keys):
            raise ValueError(f"after key must have {len(keys)} values, got {after!r}")

        def gt_after(t: pa.Table) -> pa.Table:
            # lexicographic (k1,...,kn) > after, vectorized
            n = t.num_rows
            gt = np.zeros(n, dtype=bool)
            eq = np.ones(n, dtype=bool)
            for col, av in zip(keys, after):
                x = t[col].to_numpy(zero_copy_only=False)
                gt |= eq & (x > av)
                eq &= x == av
            return t.filter(pa.array(gt))

        ds = ds.map_batches(gt_after, batch_format="pyarrow")
    out = ds.groupby(keys).count()
    out = out.map_batches(
        lambda t: t.rename_columns(keys + [count_name]), batch_format="pyarrow"
    )
    out = out.sort(keys)
    if size is not None:
        out = out.limit(size)
    return out


def collapse_top_rows(ds, group_key: str, sort_col: str, tiebreak_col: str,
                      k: int = 1, rank_name: str | None = None):
    """Field collapsing with inner_hits (``CollapseBuilder.java`` +
    the expand-collapse fetch): top-k rows per group by (sort_col desc,
    tiebreak asc), fully vectorized — a block-local prune (each block's
    per-group top-k is a SAFE SUPERSET of the global one) shrinks the
    data before ONE keyed shuffle, then a per-block exact rank; no
    task-per-group ``map_groups``. ``rank_name`` adds the 0-based
    within-group rank column."""

    def rank_block(t: pa.Table, emit_rank: bool) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column(rank_name, pa.array([], pa.int64())) \
                if emit_rank and rank_name else t
        t = t.sort_by([
            (group_key, "ascending"),
            (sort_col, "descending"),
            (tiebreak_col, "ascending"),
        ])
        keys = t[group_key].combine_chunks().to_numpy(zero_copy_only=False)
        starts = np.r_[True, keys[1:] != keys[:-1]]
        grp = np.cumsum(starts) - 1
        idx = np.arange(keys.size)
        rank = idx - idx[starts][grp]
        keep = rank < k
        out = t.filter(pa.array(keep))
        if emit_rank and rank_name:
            out = out.append_column(
                rank_name, pa.array(rank[keep].astype(np.int64))
            )
        return out

    from raydex.shuffle import scoped_hash_shuffle

    pruned = ds.map_batches(lambda t: rank_block(t, False),
                            batch_format="pyarrow")
    with scoped_hash_shuffle(pruned) as ncpu:
        return pruned.repartition(
            num_blocks=2 * ncpu, keys=[group_key]
        ).map_batches(lambda t: rank_block(t, True), batch_format="pyarrow",
                      batch_size=None)


def collapse_best(ds, group_key: str, sort_col: str, tiebreak_col: str):
    """Field collapsing (``CollapseBuilder.java``): keep the best row per
    group by (sort_col desc, tiebreak asc) — collapse_top_rows with
    k=1 (vectorized; the old per-group map_groups is gone)."""
    return collapse_top_rows(ds, group_key, sort_col, tiebreak_col, k=1)


def top_hits(ds, sort_col: str, k: int, descending: bool = True, tiebreak: str | None = None):
    keys, desc = [sort_col], [descending]
    if tiebreak:
        keys.append(tiebreak)
        desc.append(False)
    return ds.sort(keys, descending=desc).limit(k)


def weighted_avg(ds, value_col: str, weight_col: str, name: str = "weighted_avg"):
    def partial(t: pa.Table) -> pa.Table:
        v = t[value_col].to_numpy().astype(np.float64)
        w = t[weight_col].to_numpy().astype(np.float64)
        return pa.table({"vw": pa.array([float((v * w).sum())]), "w": pa.array([float(w.sum())])})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    return pa.table({name: pa.array([float(parts["vw"].sum()) / float(parts["w"].sum())])})


# custom-agg registry (SearchPlugin#getAggregations analogue,
# es/plugins/SearchPlugin.java): name -> fn(ds, **kwargs) -> Dataset or
# Table. Plugins register whole-pipeline aggregations built from Ray
# Data primitives; `run_agg` is the dispatch used by callers that take
# agg specs as data (the _search "aggs" body analogue).
AGG_REGISTRY: dict = {}


def register_agg(name: str, fn) -> None:
    AGG_REGISTRY[name] = fn


def run_agg(name: str, ds, **kwargs):
    if name not in AGG_REGISTRY:
        raise ValueError(f"unknown agg: {name} (register_agg)")
    return AGG_REGISTRY[name](ds, **kwargs)


for _n, _f in [
    ("terms", terms_agg), ("stats", stats_agg),
    ("extended_stats", extended_stats_agg), ("value_count", value_count_agg),
    ("cardinality", cardinality_exact), ("range", range_agg),
    ("histogram", histogram_agg), ("date_histogram", date_histogram_agg),
    ("composite", composite_agg), ("top_hits", top_hits),
    ("weighted_avg", weighted_avg),
]:
    register_agg(_n, _f)
