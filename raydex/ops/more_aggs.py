"""Additional aggregations: significant_terms, rare_terms,
scripted_metric, matrix_stats, random_score, sampler (SURVEY.md §2.6/2.7).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from raydex.partition import murmur3_hash_many


def significant_terms(ds, key_col: str, foreground_mask_fn, size: int = 10):
    """`significant_terms`: terms over-represented in a foreground subset
    vs the background, scored with the reference's JLH heuristic
    (fg% / bg% ratio * difference;
    ``server/.../bucket/terms/...JLHScore``-shaped). Partial counts per
    batch, one groupby, driver-side scoring of the (small) term table."""

    def partial(t: pa.Table) -> pa.Table:
        fg = np.asarray(foreground_mask_fn(t), dtype=bool)
        tk = pa.table({"k": t[key_col],
                       "fg": pa.array(fg.astype(np.int64)),
                       "n": pa.array(np.ones(len(t), np.int64))})
        g = tk.group_by("k").aggregate([("fg", "sum"), ("n", "sum")])
        return g.rename_columns(["k", "fg", "n"])

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    g = parts.groupby("k", as_index=False).sum()
    fg_total = int(g["fg"].sum())
    bg_total = int(g["n"].sum())
    if fg_total == 0 or bg_total == 0:
        return pa.table({"term": pa.array([], pa.string()), "score": pa.array([], pa.float64())})
    fg_pct = g["fg"] / fg_total
    bg_pct = g["n"] / bg_total
    score = np.where(fg_pct > bg_pct, (fg_pct / bg_pct) * (fg_pct - bg_pct), 0.0)
    g = g.assign(score=score, doc_count=g["fg"]).sort_values(
        ["score", "k"], ascending=[False, True]
    )
    g = g[g["score"] > 0].head(size)
    return pa.table(
        {
            "term": pa.array(g["k"].astype(str).tolist(), pa.string()),
            "doc_count": pa.array(g["doc_count"].tolist(), pa.int64()),
            "score": pa.array(g["score"].tolist(), pa.float64()),
        }
    )


def rare_terms(ds, key_col: str, max_doc_count: int = 1):
    """`rare_terms`: terms with global count <= max_doc_count (the long
    tail the terms agg misses). Exact, with map-side combine: each
    block collapses to its (value, count) table first, so the groupby
    shuffle carries per-block vocabularies, not raw rows."""
    import pyarrow.compute as pc

    def partial(t: pa.Table) -> pa.Table:
        vc = pc.value_counts(t[key_col].combine_chunks())
        return pa.table({key_col: vc.field("values"),
                         "__n": vc.field("counts").cast(pa.int64())})

    out = ds.map_batches(partial, batch_format="pyarrow") \
            .groupby(key_col).sum("__n")
    out = out.map_batches(
        lambda t: t.rename_columns([key_col, "doc_count"]), batch_format="pyarrow"
    )
    out = out.map_batches(
        lambda t: t.filter(pa.compute.less_equal(t["doc_count"], max_doc_count)),
        batch_format="pyarrow",
    )
    return out.sort(key_col)


def scripted_metric(ds, map_fn, combine_fn, reduce_fn):
    """`scripted_metric`: user map per batch -> combine per block ->
    reduce on driver (the exact init/map/combine/reduce contract,
    ``ScriptedMetricAggregationBuilder``)."""

    def partial(t: pa.Table) -> pa.Table:
        state = combine_fn(map_fn(t))
        import pickle

        return pa.table({"state": pa.array([pickle.dumps(state)], pa.large_binary())})

    import pickle

    states = []
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        states.extend(pickle.loads(s) for s in b["state"].to_pylist())
    return reduce_fn(states)


def matrix_stats(ds, cols: list[str]):
    """`matrix_stats` (modules/aggs-matrix-stats): mergeable co-moment
    partials -> exact covariance/correlation matrix."""

    def partial(t: pa.Table) -> pa.Table:
        x = np.column_stack([t[c].to_numpy().astype(np.float64) for c in cols])
        n = x.shape[0]
        s = x.sum(axis=0)
        ss = x.T @ x
        return pa.table(
            {
                "n": pa.array([n], pa.int64()),
                "s": pa.array([s.tolist()], pa.list_(pa.float64())),
                "ss": pa.array([ss.flatten().tolist()], pa.list_(pa.float64())),
            }
        )

    n_tot, s_tot, ss_tot = 0, None, None
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for n, s, ss in zip(b["n"].to_pylist(), b["s"].to_pylist(), b["ss"].to_pylist()):
            n_tot += n
            s_tot = np.asarray(s) if s_tot is None else s_tot + np.asarray(s)
            ss_tot = np.asarray(ss) if ss_tot is None else ss_tot + np.asarray(ss)
    k = len(cols)
    mean = s_tot / n_tot
    cov = ss_tot.reshape(k, k) / n_tot - np.outer(mean, mean)
    std = np.sqrt(np.diag(cov))
    corr = cov / np.outer(std, std)
    return {
        "count": n_tot,
        "mean": dict(zip(cols, mean.tolist())),
        "covariance": cov.tolist(),
        "correlation": corr.tolist(),
        "fields": cols,
    }


def random_score_column(ds, key_col: str, seed: int = 0, out_col: str = "random_score"):
    """`random_score` function: deterministic seeded hash score in [0,1)
    (``RandomScoreFunctionBuilder`` — hash, never Math.random)."""

    def add(t: pa.Table) -> pa.Table:
        keys = [f"{seed}|{v}" for v in t[key_col].to_pylist()]
        h = murmur3_hash_many(keys).astype(np.int64) & 0x7FFFFFFF
        return t.append_column(out_col, pa.array(h / float(1 << 31)))

    return ds.map_batches(add, batch_format="pyarrow")


def sampler(ds, key_col: str, probability: float, seed: int = 0):
    """Deterministic hash sampler (the `sampler` agg's per-shard sampling
    made reproducible): keep rows whose seeded hash < probability."""

    def f(t: pa.Table) -> pa.Table:
        keys = [f"{seed}|{v}" for v in t[key_col].to_pylist()]
        h = murmur3_hash_many(keys).astype(np.int64) & 0x7FFFFFFF
        return t.filter(pa.array(h / float(1 << 31) < probability))

    return ds.map_batches(f, batch_format="pyarrow")


def _weighted_median(values: np.ndarray, counts: np.ndarray) -> float:
    """Exact median of the expanded multiset (DuckDB/postgres convention:
    mean of the two middle elements for even totals)."""
    order = np.argsort(values)
    v, c = values[order], counts[order]
    cum = np.cumsum(c)
    n = int(cum[-1])
    if n == 0:
        return float("nan")
    lo_rank, hi_rank = (n - 1) // 2, n // 2  # 0-based middle pair
    lo = v[np.searchsorted(cum, lo_rank + 1)]
    hi = v[np.searchsorted(cum, hi_rank + 1)]
    return float((lo + hi) / 2.0)


def median_absolute_deviation(ds, col: str, name: str = "mad",
                              max_exact_distinct: int = 10_000):
    """`median_absolute_deviation` (…/metrics/MedianAbsoluteDeviationAggregationBuilder.java):
    median(|x - median(x)|). EXACT via ONE value-counts groupby when the
    distinct-value table is driver-sized (both medians are weighted
    medians over it); above ``max_exact_distinct`` (continuous float
    columns where |distinct| ≈ |rows|) it switches to the REFERENCE's
    own algorithm — a merged t-digest of the raw values, median from
    the digest, then MAD as the t where F(med+t) - F(med-t) = 1/2
    (binary search on the digest's cdf, exactly how
    ``MedianAbsoluteDeviationAggregator.computeMedianAbsoluteDeviation``
    derives MAD from one sketch). The distinct-count guard itself is a
    distributed count — the value table never lands on the driver
    unless it fits."""
    gb = ds.groupby(col).count()
    if gb.count() <= max_exact_distinct:
        vc = gb.to_pandas()
        values = vc[col].to_numpy(dtype=np.float64)
        counts = vc["count()"].to_numpy(dtype=np.int64)
        m = _weighted_median(values, counts)
        mad = _weighted_median(np.abs(values - m), counts)
        return pa.table({name: pa.array([mad], pa.float64())})
    from raydex.ops.tdigest import TDigest

    def partial(t: pa.Table) -> pa.Table:
        d = TDigest(200.0).add(
            t[col].cast(pa.float64()).to_numpy(zero_copy_only=False))
        means, weights = d.to_arrays()
        return pa.table({"means": pa.array([list(map(float, means))]),
                         "weights": pa.array([list(map(float, weights))])})

    d = TDigest(200.0)
    for b in ds.map_batches(partial, batch_size=65536,
                            batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        for mns, wts in zip(b["means"].to_pylist(), b["weights"].to_pylist()):
            d = d.merge(TDigest.from_arrays(mns, wts, 200.0))
    med = d.quantile(0.5)
    lo, hi = 0.0, max(med - d.quantile(0.0), d.quantile(1.0) - med, 1e-12)
    for _ in range(60):
        mid = (lo + hi) / 2.0
        if d.cdf(med + mid) - d.cdf(med - mid) >= 0.5:
            hi = mid
        else:
            lo = mid
    return pa.table({name: pa.array([hi], pa.float64())})


def auto_date_histogram(ds, ts_col: str, target_buckets: int = 10,
                        count_name: str = "doc_count"):
    """`auto_date_histogram` (…/bucket/histogram/AutoDateHistogramAggregationBuilder.java):
    pick the smallest interval from the reference's rounding ladder that
    yields <= target_buckets buckets over [min, max], then histogram.
    Min/max are a cheap distributed aggregate; the ladder mirrors the
    reference's seconds->years roundings."""
    import pyarrow.compute as pc

    mm = ds.map_batches(
        lambda t: pa.table(
            {
                "mn": pa.array([pc.min(t[ts_col]).cast(pa.int64()).as_py()], pa.int64()),
                "mx": pa.array([pc.max(t[ts_col]).cast(pa.int64()).as_py()], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).to_pandas()
    if mm.empty:
        return pa.table({"bucket_ts": pa.array([], pa.timestamp("us")),
                         count_name: pa.array([], pa.int64()),
                         "interval_us": pa.array([], pa.int64())})
    lo, hi = int(mm["mn"].min()), int(mm["mx"].max())  # microseconds
    S = 1_000_000
    ladder_us = [
        1 * S, 5 * S, 10 * S, 30 * S,
        60 * S, 5 * 60 * S, 10 * 60 * S, 30 * 60 * S,
        3600 * S, 3 * 3600 * S, 12 * 3600 * S,
        86400 * S, 7 * 86400 * S,
        30 * 86400 * S, 90 * 86400 * S,
        365 * 86400 * S, 5 * 365 * 86400 * S, 10 * 365 * 86400 * S,
        20 * 365 * 86400 * S, 50 * 365 * 86400 * S, 100 * 365 * 86400 * S,
    ]
    interval = next(
        (iv for iv in ladder_us if (hi - lo) // iv + 1 <= target_buckets),
        ladder_us[-1],
    )

    def bucketize(t: pa.Table) -> pa.Table:
        us = t[ts_col].cast(pa.int64()).to_numpy()
        b = (us // interval) * interval
        return pa.table({"bucket_us": pa.array(b, pa.int64())})

    out = (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket_us")
        .count()
        .to_pandas()
        .sort_values("bucket_us")
    )
    return pa.table(
        {
            "bucket_ts": pa.array(out["bucket_us"].to_numpy(), pa.int64()).cast(
                pa.timestamp("us")
            ),
            count_name: pa.array(out["count()"].to_numpy(), pa.int64()),
            "interval_us": pa.array(np.full(len(out), interval), pa.int64()),
        }
    )


def _agglomerate_1d(mins, maxs, sums, cnts, buckets: int):
    """Adjacent-merge 1D clustering over range-ordered weighted
    clusters: repeatedly merge the two adjacent clusters whose weighted
    means are closest, down to ``buckets``. Deterministic
    (leftmost-min tie-break)."""
    while mins.size > buckets:
        means = sums / cnts
        gaps = means[1:] - means[:-1]
        i = int(np.argmin(gaps))
        sums[i] += sums[i + 1]
        cnts[i] += cnts[i + 1]
        maxs[i] = maxs[i + 1]
        keep = np.ones(mins.size, dtype=bool)
        keep[i + 1] = False
        mins, maxs, sums, cnts = mins[keep], maxs[keep], sums[keep], cnts[keep]
    return mins, maxs, sums, cnts


def _quantile_precluster(t: pa.Table, col: str, k: int,
                         count_col: str = "count()") -> pa.Table:
    """Reduce one VALUE-SORTED (value, count) block to <= k weighted
    centroids by equal-weight quantile slicing (vectorized: cumsum +
    searchsorted — no O(n^2) merge loop on the hot path). The shard
    collector's cluster cap in the reference
    (``VariableWidthHistogramAggregator`` caches shard_size clusters
    per shard, then the coordinator merges)."""
    v = t[col].cast(pa.float64()).to_numpy(zero_copy_only=False)
    c = t[count_col].cast(pa.float64()).to_numpy(zero_copy_only=False)
    if v.size <= k:
        return pa.table({"mn": pa.array(v, pa.float64()),
                         "mx": pa.array(v, pa.float64()),
                         "sm": pa.array(v * c, pa.float64()),
                         "ct": pa.array(c, pa.float64())})
    cum = np.cumsum(c)
    edges = np.searchsorted(cum, np.linspace(0, cum[-1], k + 1)[1:-1],
                            side="right")
    edges = np.unique(np.concatenate(([0], edges, [v.size])))
    sm = np.add.reduceat(v * c, edges[:-1])
    ct = np.add.reduceat(c, edges[:-1])
    return pa.table({"mn": pa.array(v[edges[:-1]], pa.float64()),
                     "mx": pa.array(v[edges[1:] - 1], pa.float64()),
                     "sm": pa.array(sm, pa.float64()),
                     "ct": pa.array(ct, pa.float64())})


def variable_width_histogram(ds, col: str, buckets: int = 10,
                             count_name: str = "doc_count",
                             max_exact_distinct: int = 10_000):
    """`variable_width_histogram` (…/bucket/histogram/VariableWidthHistogramAggregationBuilder.java):
    data-adaptive buckets. Exact path (distinct values fit the driver):
    value-counts groupby -> agglomerative 1D clustering. Scale path
    (continuous columns, |distinct| ≈ |rows|): the grouped table is
    SORTED by value and each block pre-clusters to <= 32*buckets
    weighted centroids (equal-weight quantile slices, vectorized) —
    the per-shard cluster cap of the reference's collector — then one
    bounded driver merge agglomerates the range-ordered centroid lists
    down to ``buckets``. Emits (min, key=centroid, max, doc_count)."""
    gb = ds.groupby(col).count()
    if gb.count() <= max_exact_distinct:
        vc = gb.to_pandas().sort_values(col)
        v = vc[col].to_numpy(dtype=np.float64)
        c = vc["count()"].to_numpy(dtype=np.float64)
        if v.size == 0:
            return pa.table({"min": pa.array([], pa.float64()), "key": pa.array([], pa.float64()),
                             "max": pa.array([], pa.float64()), count_name: pa.array([], pa.int64())})
        mins, maxs, sums, cnts = _agglomerate_1d(
            v.copy(), v.copy(), v * c, c.copy(), buckets)
    else:
        k = 32 * buckets
        cent = (gb.sort(col)
                .map_batches(lambda t: _quantile_precluster(t, col, k),
                             batch_format="pyarrow")
                .to_pandas())
        cent = cent.sort_values("mn")  # blocks are range-partitioned
        mins, maxs, sums, cnts = _agglomerate_1d(
            cent["mn"].to_numpy(np.float64).copy(),
            cent["mx"].to_numpy(np.float64).copy(),
            cent["sm"].to_numpy(np.float64).copy(),
            cent["ct"].to_numpy(np.float64).copy(), buckets)
    return pa.table(
        {
            "min": pa.array(mins, pa.float64()),
            "key": pa.array(sums / cnts, pa.float64()),
            "max": pa.array(maxs, pa.float64()),
            count_name: pa.array(cnts.astype(np.int64), pa.int64()),
        }
    )


def adjacency_matrix(ds, filters: dict, count_name: str = "doc_count",
                     separator: str = "&"):
    """`adjacency_matrix` (…/bucket/adjacency/AdjacencyMatrixAggregationBuilder.java):
    doc counts for each named filter and each pairwise intersection.
    ``filters`` maps name -> fn(batch: pa.Table) -> bool mask. Partial
    counts per batch (vectorized mask ANDs), summed on the driver —
    output is |F| + |F|(|F|-1)/2 rows regardless of data size."""
    names = sorted(filters)

    def partial(t: pa.Table) -> pa.Table:
        masks = {n: np.asarray(filters[n](t), dtype=bool) for n in names}
        keys, counts = [], []
        for i, a in enumerate(names):
            keys.append(a)
            counts.append(int(masks[a].sum()))
            for b in names[i + 1:]:
                keys.append(a + separator + b)
                counts.append(int((masks[a] & masks[b]).sum()))
        return pa.table({"key": pa.array(keys, pa.string()),
                         "n": pa.array(counts, pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    g = parts.groupby("key", as_index=False)["n"].sum()
    g = g[g["n"] > 0].sort_values("key")
    return pa.table(
        {
            "key": pa.array(g["key"].tolist(), pa.string()),
            count_name: pa.array(g["n"].tolist(), pa.int64()),
        }
    )


def significant_text(ds, text_col: str, foreground_mask_fn, size: int = 10,
                     filter_duplicate_text: bool = False):
    """`significant_text` (``bucket/terms/SignificantTextAggregationBuilder``):
    significant_terms over the TOKENS of a free-text field — per-doc
    DISTINCT tokens (the reference counts doc frequency, not term
    frequency), JLH score of foreground vs background doc counts.
    ``filter_duplicate_text`` drops exact-duplicate docs first (the
    reference's near-dup noise guard, here exact-hash).

    Map-side combine: one (token, fg, n) partial per batch — tokens never
    leave the batch as rows-per-occurrence, so the shuffle carries the
    vocabulary, not the corpus."""
    import pyarrow.compute as pc

    def partial(t: pa.Table) -> pa.Table:
        txt = pc.fill_null(t[text_col].cast(pa.string()), "")
        fg = np.asarray(foreground_mask_fn(t), dtype=bool)
        if filter_duplicate_text:
            import hashlib

            seen: set = set()
            keep = np.ones(len(t), dtype=bool)
            for i, s in enumerate(txt.to_pylist()):
                h = hashlib.md5(s.encode()).digest()
                if h in seen:
                    keep[i] = False
                else:
                    seen.add(h)
            txt, fg = txt.filter(pa.array(keep)), fg[keep]
        words = pc.split_pattern(txt, " ")
        flat = pc.list_flatten(words)
        parents = pc.list_parent_indices(words).to_numpy(zero_copy_only=False)
        toks = flat.to_numpy(zero_copy_only=False)
        # per-doc distinct: unique (token, doc) pairs
        dfp = pd.DataFrame({"k": toks, "d": parents}).drop_duplicates()
        dfp["fg"] = fg[dfp["d"].to_numpy()].astype(np.int64)
        g = dfp.groupby("k", as_index=False).agg(fg=("fg", "sum"), n=("fg", "size"))
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    g = parts.groupby("k", as_index=False).sum()
    fg_total = int(g["fg"].sum())
    bg_total = int(g["n"].sum())
    if fg_total == 0 or bg_total == 0:
        return pa.table(
            {"term": pa.array([], pa.string()),
             "doc_count": pa.array([], pa.int64()),
             "score": pa.array([], pa.float64())}
        )
    fg_pct = g["fg"] / fg_total
    bg_pct = g["n"] / bg_total
    score = np.where(fg_pct > bg_pct, (fg_pct / bg_pct) * (fg_pct - bg_pct), 0.0)
    g = g.assign(score=score).sort_values(["score", "k"], ascending=[False, True])
    g = g[g["score"] > 0].head(size)
    return pa.table(
        {
            "term": pa.array(g["k"].astype(str).tolist(), pa.string()),
            "doc_count": pa.array(g["fg"].tolist(), pa.int64()),
            "score": pa.array(g["score"].tolist(), pa.float64()),
        }
    )


def multi_terms(ds, key_cols: list[str], size: int = 10):
    """`multi_terms` (``bucket/terms/MultiTermsAggregationBuilder``):
    top-N composite-key buckets by doc count — count desc then key asc
    (the reference's order). Map-side combine (per-block Arrow group_by
    collapses each block to its distinct key tuples) + distributed
    groupby-sum + distributed sort/limit: only the final ``size`` rows
    land on the driver, so composite-key cardinality never does."""
    def partial(t: pa.Table) -> pa.Table:
        g = t.select(key_cols).group_by(key_cols).aggregate(
            [([], "count_all")])
        return g.rename_columns(list(key_cols) + ["__n"])

    out = ds.map_batches(partial, batch_format="pyarrow") \
            .groupby(key_cols).sum("__n")
    out = out.map_batches(
        lambda t: t.rename_columns(list(key_cols) + ["doc_count"]),
        batch_format="pyarrow")
    top = out.sort(["doc_count", *key_cols],
                   descending=[True] + [False] * len(key_cols)) \
             .limit(size).to_pandas()
    return pa.Table.from_pandas(top, preserve_index=False)


def top_metrics(ds, sort_col: str, metric_cols: list[str], order: str = "desc",
                size: int = 1):
    """`top_metrics` (``analytics/topmetrics``): the metric values of the
    docs with the top sort-key values — per-block partial top-N (k rows
    per block leave the block), driver-side final merge."""
    cols = [sort_col, *metric_cols]

    def partial(t: pa.Table) -> pa.Table:
        df = t.select(cols).to_pandas()
        df = df.sort_values(sort_col, ascending=(order == "asc")).head(size)
        return pa.Table.from_pandas(df, preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    parts = parts.sort_values(sort_col, ascending=(order == "asc")).head(size)
    return pa.Table.from_pandas(parts.reset_index(drop=True), preserve_index=False)


def boxplot_agg(ds, col: str, compression: int = 100):
    """`boxplot` (``analytics/boxplot``): min/max/q1/q2/q3 from the same
    t-digest engine percentiles uses (merge-law-safe partials) plus exact
    min/max."""
    from raydex.ops.tdigest import percentiles_agg

    q = percentiles_agg(ds, col, qs=(0.25, 0.5, 0.75), compression=compression)
    qv = {r["quantile"]: r["value"] for r in q.to_pylist()}
    import pyarrow.compute as pc

    def mm(t: pa.Table) -> pa.Table:
        v = t[col]
        return pa.table(
            {"mn": pa.array([pc.min(v).as_py()], pa.float64()),
             "mx": pa.array([pc.max(v).as_py()], pa.float64())}
        )

    parts = ds.map_batches(mm, batch_format="pyarrow").to_pandas()
    return pa.table(
        {
            "min": pa.array([float(parts["mn"].min())], pa.float64()),
            "q1": pa.array([qv[0.25]], pa.float64()),
            "q2": pa.array([qv[0.5]], pa.float64()),
            "q3": pa.array([qv[0.75]], pa.float64()),
            "max": pa.array([float(parts["mx"].max())], pa.float64()),
        }
    )


def _register() -> None:
    from raydex.ops.aggs import register_agg
    from raydex.ops.hdr import percentiles_hdr
    from raydex.ops.tdigest import percentiles_agg

    for _n, _f in [
        ("significant_terms", significant_terms),
        ("significant_text", significant_text),
        ("rare_terms", rare_terms),
        ("multi_terms", multi_terms),
        ("top_metrics", top_metrics),
        ("boxplot", boxplot_agg),
        ("median_absolute_deviation", median_absolute_deviation),
        ("auto_date_histogram", auto_date_histogram),
        ("variable_width_histogram", variable_width_histogram),
        ("adjacency_matrix", adjacency_matrix),
        ("percentiles", percentiles_agg),
        ("percentiles_hdr", percentiles_hdr),
    ]:
        register_agg(_n, _f)


_register()


def geo_line_agg(ds, key_col: str, lat_col: str, lon_col: str,
                 sort_col: str, tiebreak_col: str, size: int = 10000,
                 sort_order: str = "asc"):
    """``geo_line`` aggregation (x-pack spatial ``GeoLineAggregator``):
    per ``key_col`` bucket, the [lon, lat] track of its docs ordered by
    ``sort_col``, truncated to the first ``size`` points with a
    ``complete`` flag — the reference's size-capped per-bucket buffer.
    Ties break by ``tiebreak_col`` (explicit determinism; the reference
    inherits doc order). Block-local prune (each block's per-key first
    ``size`` points is a safe superset of the global ones) shrinks the
    data before ONE keyed shuffle; true doc counts survive the prune as
    per-block contribution rows summed after the shuffle."""
    desc = sort_order == "desc"

    def order(t: pa.Table) -> pa.Table:
        return t.sort_by([
            (key_col, "ascending"),
            (sort_col, "descending" if desc else "ascending"),
            (tiebreak_col, "ascending"),
        ])

    def grp_rank(t: pa.Table):
        keys = t[key_col].combine_chunks().to_numpy(zero_copy_only=False)
        starts = np.r_[True, keys[1:] != keys[:-1]]
        grp = np.cumsum(starts) - 1
        idx = np.arange(keys.size)
        rank = idx - idx[starts][grp]
        return starts, grp, rank

    def prune(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("__cnt", pa.array([], pa.int64()))
        t = order(t)
        starts, grp, rank = grp_rank(t)
        sizes = np.bincount(grp)
        contrib = np.where(rank == 0, sizes[grp], 0)
        t = t.append_column("__cnt", pa.array(contrib, pa.int64()))
        return t.filter(pa.array(rank < size))

    def assemble(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                key_col: pa.array([], t.schema.field(key_col).type),
                "doc_count": pa.array([], pa.int64()),
                "complete": pa.array([], pa.bool_()),
                "line": pa.array([], pa.list_(pa.list_(pa.float64()))),
            })
        t = order(t)
        starts, grp, rank = grp_rank(t)
        counts = np.zeros(grp[-1] + 1, np.int64)
        np.add.at(counts, grp,
                  t["__cnt"].combine_chunks().to_numpy(zero_copy_only=False))
        keep = rank < size
        lons = t[lon_col].combine_chunks().to_numpy(zero_copy_only=False)[keep]
        lats = t[lat_col].combine_chunks().to_numpy(zero_copy_only=False)[keep]
        kept_per_grp = np.bincount(grp[keep], minlength=len(counts))
        inner_vals = pa.array(
            np.column_stack([lons, lats]).ravel(), pa.float64())
        inner = pa.ListArray.from_arrays(
            pa.array(np.arange(len(lons) + 1) * 2, pa.int32()), inner_vals)
        outer = pa.ListArray.from_arrays(
            pa.array(np.concatenate(([0], np.cumsum(kept_per_grp))),
                     pa.int32()), inner)
        first_keys = t[key_col].combine_chunks().filter(
            pa.array(np.r_[True, grp[1:] != grp[:-1]]))
        return pa.table({
            key_col: first_keys,
            "doc_count": pa.array(counts, pa.int64()),
            "complete": pa.array(counts <= size, pa.bool_()),
            "line": outer,
        })

    from raydex.shuffle import scoped_hash_shuffle

    pruned = ds.map_batches(prune, batch_format="pyarrow")
    with scoped_hash_shuffle(pruned) as ncpu:
        return pruned.repartition(
            num_blocks=2 * ncpu, keys=[key_col]
        ).map_batches(assemble, batch_format="pyarrow", batch_size=None)
