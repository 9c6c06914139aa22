"""Rollup + transform pivot — pre-aggregation of a raw table into a
compact grouped table (continuous downsampling for time-series, pivot
materialization for analytics).

Reference mapping:
- rollup: ``x-pack/plugin/rollup/.../job/RollupIndexer.java`` — a job
  groups by a date_histogram on one timestamp field (+ optional terms
  dimensions) and stores, per group, the configured metric moments
  (min/max/sum/value_count; avg is served from sum/value_count at query
  time, ``IndexerUtils.java``). Output docs carry ``<field>.<metric>``
  columns.
- transform pivot: ``x-pack/plugin/transform/.../transforms/pivot/
  Pivot.java`` — group_by (terms and/or date_histogram) + a dict of
  aggregations, materialized into a dest index; the same shape with a
  user-named output column per agg.

Ray Data shape: one ``map_batches`` bucketize/prune pass, then ONE
``groupby().aggregate(...)`` (map-side combined by Ray's aggregate
machinery — the only shuffle), output streamed as a Dataset that can be
written straight to partitioned parquet. avg is computed FROM the
sum/count moments after the reduce, exactly like the reference serves
it.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

_METRICS = ("min", "max", "sum", "value_count", "avg")


def _bucketize(ts_col: str, interval_us: int, keep: list[str],
               count_fields: list[str] = ()):
    def fn(t: pa.Table) -> pa.Table:
        ts = t[ts_col].combine_chunks()
        if pa.types.is_timestamp(ts.type):
            ts = ts.cast(pa.timestamp("us")).cast(pa.int64())
        b = pc.multiply(
            pc.floor(pc.divide(ts.cast(pa.float64()), float(interval_us))),
            float(interval_us),
        ).cast(pa.int64())
        cols = {f"{ts_col}.bucket": b}
        for c in keep:
            cols[c] = t[c]
        # per-field non-null indicators: value_count (and the avg
        # denominator) must skip nulls exactly like the reference
        for c in count_fields:
            cols[f"{c}__n"] = pc.cast(pc.is_valid(t[c]), pa.int64())
        return pa.table(cols)

    return fn


def rollup(ds, ts_col: str, interval_us: int,
           dims: list[str] | None = None,
           metrics: dict[str, list[str]] | None = None):
    """Run one rollup pass: group by the time bucket (+ ``dims``), emit
    ``<field>.<metric>`` columns per group plus the mandatory
    ``_doc_count`` (the reference stores it for query-time weighting).
    Returns a Ray Dataset — write it to parquet for the rollup index."""
    from ray.data.aggregate import Count, Max, Min, Sum

    dims = list(dims or [])
    metrics = metrics or {}
    for f, ms in metrics.items():
        for m in ms:
            if m not in _METRICS:
                raise ValueError(f"unsupported rollup metric {m!r} on {f!r}")
    keep = sorted(set(dims) | set(metrics))
    bcol = f"{ts_col}.bucket"
    aggs = [Count()]
    renames = {"count()": "_doc_count"}
    count_fields = sorted(
        f for f, ms in metrics.items()
        if "value_count" in ms or "avg" in ms)
    for f, ms in metrics.items():
        need = set(ms)
        if "avg" in need:  # served from the sum/value_count moments
            need |= {"sum", "value_count"}
        if "min" in need:
            aggs.append(Min(f))
            renames[f"min({f})"] = f"{f}.min"
        if "max" in need:
            aggs.append(Max(f))
            renames[f"max({f})"] = f"{f}.max"
        # Sum(f) backs only the sum/avg moments — value_count is served
        # from the {f}__n counter, so a value_count-only spec must not
        # emit a '<f>.sum' column the job never configured (the
        # reference stores only configured moments)
        if "sum" in need:
            aggs.append(Sum(f))
            renames[f"sum({f})"] = f"{f}.sum"
    for f in count_fields:
        aggs.append(Sum(f"{f}__n"))
        renames[f"sum({f}__n)"] = f"{f}.value_count"
    g = (
        ds.map_batches(_bucketize(ts_col, interval_us, keep, count_fields),
                       batch_format="pyarrow")
        .groupby([bcol, *dims])
        .aggregate(*aggs)
    )

    # no columns to drop post-agg: Sum(f) is only ever added for
    # sum/avg specs, and both store the sum moment (avg is served from
    # sum/value_count at query time, IndexerUtils)
    want_avg = [f for f, ms in metrics.items() if "avg" in ms]

    def finish(t: pa.Table) -> pa.Table:
        for old, new in renames.items():
            i = t.schema.get_field_index(old)
            if i >= 0:
                t = t.rename_columns(
                    [new if c == old else c for c in t.column_names])
        for f in want_avg:
            # avg = sum / NON-NULL value_count (IndexerUtils serves it
            # from the stored moments, nulls excluded)
            t = t.append_column(
                f"{f}.avg",
                pc.divide(pc.cast(t[f"{f}.sum"], pa.float64()),
                          pc.cast(t[f"{f}.value_count"], pa.float64())),
            )
        return t

    return g.map_batches(finish, batch_format="pyarrow")


def transform_pivot(ds, group_by: dict, aggs: dict):
    """``transform`` pivot (``Pivot.java``): ``group_by`` = {out_col:
    {"terms": {"field": f}} | {"date_histogram": {"field": f,
    "fixed_interval_us": n}}}, ``aggs`` = {out_col: {kind: {"field":
    f}}} with kind in avg/sum/min/max/value_count. Returns the
    materialized dest Dataset (write_parquet for the dest index)."""
    from ray.data.aggregate import Count, Max, Min, Sum

    key_specs = []
    for out, spec in group_by.items():
        (kind, body), = spec.items()
        if kind == "terms":
            key_specs.append((out, body["field"], None))
        elif kind == "date_histogram":
            key_specs.append((out, body["field"],
                              int(body["fixed_interval_us"])))
        else:
            raise ValueError(f"unsupported group_by kind {kind!r}")
    agg_specs = []
    for out, spec in aggs.items():
        (kind, body), = spec.items()
        if kind not in ("avg", "sum", "min", "max", "value_count"):
            raise ValueError(f"unsupported pivot agg {kind!r}")
        agg_specs.append((out, kind, body["field"]))

    count_fields = sorted({f for _, kind, f in agg_specs
                           if kind in ("avg", "value_count")})

    def prep(t: pa.Table) -> pa.Table:
        cols = {}
        for out, f, iv in key_specs:
            col = t[f].combine_chunks()
            if iv is not None:
                if pa.types.is_timestamp(col.type):
                    col = col.cast(pa.timestamp("us")).cast(pa.int64())
                col = pc.multiply(
                    pc.floor(pc.divide(col.cast(pa.float64()), float(iv))),
                    float(iv),
                ).cast(pa.int64())
            cols[out] = col
        for _, _, f in agg_specs:
            if f not in cols:
                cols[f] = t[f]
        for f in count_fields:  # null-skipping count/avg denominators
            cols[f"{f}__n"] = pc.cast(pc.is_valid(t[f]), pa.int64())
        return pa.table(cols)

    keys = [out for out, _, _ in key_specs]
    ray_aggs = [Count()]
    for out, kind, f in agg_specs:
        if kind == "min":
            ray_aggs.append(Min(f))
        elif kind == "max":
            ray_aggs.append(Max(f))
        else:  # sum / avg / value_count ride the sum+count moments
            ray_aggs.append(Sum(f))
    for f in count_fields:
        ray_aggs.append(Sum(f"{f}__n"))

    g = (ds.map_batches(prep, batch_format="pyarrow")
         .groupby(keys).aggregate(*ray_aggs))

    def finish(t: pa.Table) -> pa.Table:
        out_cols: dict = {k: t[k] for k in keys}
        for out, kind, f in agg_specs:
            if kind == "min":
                out_cols[out] = t[f"min({f})"]
            elif kind == "max":
                out_cols[out] = t[f"max({f})"]
            elif kind == "sum":
                out_cols[out] = t[f"sum({f})"]
            elif kind == "value_count":
                out_cols[out] = t[f"sum({f}__n)"]
            else:  # avg over non-null values only
                out_cols[out] = pc.divide(
                    pc.cast(t[f"sum({f})"], pa.float64()),
                    pc.cast(t[f"sum({f}__n)"], pa.float64()))
        return pa.table(out_cols)

    return g.map_batches(finish, batch_format="pyarrow")


def transform_latest(ds, unique_key, sort_col: str, tiebreak_col: str):
    """``transform`` latest (x-pack transform ``latest/Latest.java``):
    one output row per ``unique_key`` — the whole row holding the
    greatest ``sort_col`` value. Ties break by ``tiebreak_col``
    ascending (an explicit determinism guarantee; the reference
    inherits doc order). Rides collapse_top_rows: block-local prune,
    ONE keyed shuffle, no per-group tasks. Composite keys join into a
    temp column for the shuffle and are dropped on the way out."""
    from raydex.ops.aggs import collapse_top_rows

    keys = [unique_key] if isinstance(unique_key, str) else list(unique_key)
    if len(keys) == 1:
        return collapse_top_rows(ds, keys[0], sort_col, tiebreak_col, k=1)

    def mk(t: pa.Table) -> pa.Table:
        parts = [pc.cast(t[k], pa.string()) for k in keys]
        return t.append_column(
            "__latest_key",
            pc.binary_join_element_wise(*parts, "\x00"))

    out = collapse_top_rows(
        ds.map_batches(mk, batch_format="pyarrow"),
        "__latest_key", sort_col, tiebreak_col, k=1)
    return out.map_batches(lambda t: t.drop_columns(["__latest_key"]),
                           batch_format="pyarrow")


def rollup_search(table: pa.Table, body: dict) -> dict:
    """`_rollup_search` analogue (RollupSearchAction /
    RollupResponseTranslator): answer a live-style aggregation request
    FROM a rolled-up table by re-combining the stored moments —
    doc_count = Σ_doc_count, sum = Σ<f>.sum, value_count =
    Σ<f>.value_count, min = min(<f>.min), max = max(<f>.max),
    avg = Σsum / Σvalue_count. One bucketing agg (terms or
    date_histogram over a rolled-up group column) with metric
    sub-aggs, the reference's supported shape."""
    import pyarrow.compute as pc

    aggs = body.get("aggregations") or body.get("aggs") or {}
    if len(aggs) != 1:
        raise ValueError("rollup_search supports exactly one top agg")
    name, spec = next(iter(aggs.items()))
    sub = spec.get("aggs") or spec.get("aggregations") or {}
    if "date_histogram" in spec:
        field = spec["date_histogram"]["field"]
        key_col = f"{field}.bucket"
    elif "terms" in spec:
        key_col = spec["terms"]["field"]
    else:
        raise ValueError("rollup_search needs terms or date_histogram")
    if key_col not in table.column_names:
        raise ValueError(
            f"field {key_col!r} was not rolled up into this table")

    plan = [("_doc_count", "sum")]
    finals = []  # (out_name, kind, field)
    for sname, sspec in sub.items():
        (kind, body2), = sspec.items()
        f = body2["field"]
        if kind in ("sum", "avg", "min", "max", "value_count"):
            finals.append((sname, kind, f))
        else:
            raise ValueError(f"unsupported rollup metric {kind!r}")
        need = {"avg": ("sum", "value_count"), "sum": ("sum",),
                "min": ("min",), "max": ("max",),
                "value_count": ("value_count",)}[kind]
        for moment in need:
            col = f"{f}.{moment}"
            if col not in table.column_names:
                raise ValueError(f"moment {col!r} missing from rollup")
            comb = "min" if moment == "min" else (
                "max" if moment == "max" else "sum")
            plan.append((col, comb))
    plan = sorted(set(plan))
    g = table.group_by([key_col]).aggregate(plan)
    order = pc.sort_indices(g[key_col])
    g = g.take(order)

    buckets = []
    for i in range(g.num_rows):
        b = {"key": g[key_col][i].as_py(),
             "doc_count": int(g["_doc_count_sum"][i].as_py())}
        for sname, kind, f in finals:
            if kind == "avg":
                s = g[f"{f}.sum_sum"][i].as_py()
                n = g[f"{f}.value_count_sum"][i].as_py()
                b[sname] = {"value": (s / n) if n else None}
            else:
                comb = "min" if kind == "min" else (
                    "max" if kind == "max" else "sum")
                b[sname] = {"value": g[f"{f}.{kind}_{comb}"][i].as_py()}
        buckets.append(b)
    return {"aggregations": {name: {"buckets": buckets}}}
