"""Analytics-tier aggregations closing the §2.6 tail: rate, normalize,
moving_percentiles, ip_prefix, t_test, categorize_text,
frequent_item_sets.

Reference mapping:
- rate: ``xpack/analytics/.../rate/RateAggregationBuilder.java`` — a
  per-date-histogram-bucket rate of docs (or a field's sum) per unit
  interval;
- normalize: ``analytics/normalize/NormalizeAggregationBuilder`` —
  pipeline rescale of bucket values (rescale_0_1, rescale_0_100,
  percent_of_sum, mean, z-score, softmax — the reference's methods);
- moving_percentiles: sliding-window percentiles over bucket values
  (``analytics/movingPercentiles``);
- ip_prefix: ``bucket/prefix/IpPrefixAggregationBuilder`` — bucket IPv4
  addresses by network prefix;
- t_test: ``analytics/ttest`` — Student/Welch t-test with the
  reference's three modes (paired, homoscedastic, heteroscedastic);
  the two-sided p-value uses the regularized incomplete beta function
  (standard published algorithm — Numerical Recipes §6.4 continued
  fraction), no SciPy;
- categorize_text: deterministic analogue of the reference's log
  categorizer (``MachineLearning`` categorization: variable tokens —
  anything with digits — are dropped, the residual token sequence is
  the category key);
- frequent_item_sets: ``ml/frequent_item_sets`` — Apriori-style
  (field, value) itemset mining with support filtering, itemsets up to
  ``max_set_size``.

All distributive pieces run as ``map_batches`` partials + one small
groupby (the partial/final reduce law); pipeline pieces operate on the
already-reduced bucket table, exactly like the reference's pipeline
aggs run in the coordinator reduce phase.
"""

from __future__ import annotations

from itertools import combinations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


# ------------------------------------------------------------------ rate

_UNIT_SECONDS = {
    "second": 1.0, "minute": 60.0, "hour": 3600.0, "day": 86400.0,
    "week": 7 * 86400.0,
}


def rate_agg(ds, ts_col: str, interval: str, unit: str,
             value_col: str | None = None):
    """Per-bucket rate: date_histogram(interval) buckets, each reporting
    (docs or sum(value_col)) / (bucket length expressed in ``unit``).
    Fixed intervals only (second/minute/hour/day/week) — the reference's
    rate requires unit <= bucket interval; calendar months are not
    fixed-length and are out of scope here (documented deviation)."""
    import pyarrow.compute as pc

    if interval not in _UNIT_SECONDS or unit not in _UNIT_SECONDS:
        raise ValueError(
            f"fixed intervals only: {sorted(_UNIT_SECONDS)}; "
            f"got interval={interval!r} unit={unit!r}"
        )
    if _UNIT_SECONDS[unit] > _UNIT_SECONDS[interval]:
        raise ValueError("rate unit must be <= the histogram interval")

    def keyed(t: pa.Table) -> pa.Table:
        cols = {"bucket_ts": pc.floor_temporal(t[ts_col], unit=interval)}
        if value_col:
            cols["v"] = t[value_col]
        return pa.table(cols)

    k = ds.map_batches(keyed, batch_format="pyarrow")
    if value_col:
        buckets = k.groupby("bucket_ts").sum("v").to_pandas()
        buckets = buckets.rename(columns={buckets.columns[-1]: "value_sum"})
        val = "value_sum"
    else:
        buckets = k.groupby("bucket_ts").count().to_pandas()
        buckets = buckets.rename(columns={buckets.columns[-1]: "doc_count"})
        val = "doc_count"
    buckets = buckets.sort_values("bucket_ts").reset_index(drop=True)
    per_bucket_units = _UNIT_SECONDS[interval] / _UNIT_SECONDS[unit]
    buckets["rate"] = buckets[val] / per_bucket_units
    return pa.Table.from_pandas(buckets, preserve_index=False)


# -------------------------------------------------------------- normalize


def normalize_buckets(buckets, value_col: str, method: str,
                      out_col: str = "normalized"):
    """Pipeline rescale of a reduced bucket table (the reference's
    normalize methods, NormalizePipelineAggregationBuilder)."""
    df = buckets.to_pandas() if not isinstance(buckets, pd.DataFrame) else buckets.copy()
    v = df[value_col].to_numpy(dtype=np.float64)
    if method == "rescale_0_1":
        rng = v.max() - v.min()
        out = (v - v.min()) / rng if rng else np.zeros_like(v)
    elif method == "rescale_0_100":
        rng = v.max() - v.min()
        out = (v - v.min()) / rng * 100.0 if rng else np.zeros_like(v)
    elif method == "percent_of_sum":
        out = v / v.sum() * 100.0
    elif method == "mean":
        rng = v.max() - v.min()
        out = (v - v.mean()) / rng if rng else np.zeros_like(v)
    elif method == "z-score":
        sd = v.std()
        out = (v - v.mean()) / sd if sd else np.zeros_like(v)
    elif method == "softmax":
        e = np.exp(v)
        out = e / e.sum()
    else:
        raise ValueError(f"unknown normalize method {method!r}")
    df[out_col] = out
    return pa.Table.from_pandas(df, preserve_index=False)


def moving_percentiles(buckets, value_col: str, window: int,
                       qs=(0.5, 0.95)):
    """Sliding-window percentiles over bucket values (the reference
    shifts the percentiles agg's digests through the window; bucket
    tables are coordinator-small, so the window here is exact)."""
    df = buckets.to_pandas() if not isinstance(buckets, pd.DataFrame) else buckets.copy()
    v = df[value_col].to_numpy(dtype=np.float64)
    for q in qs:
        out = np.full(v.size, np.nan)
        for i in range(v.size):
            lo = max(0, i - window + 1)
            out[i] = np.quantile(v[lo:i + 1], q)
        df[f"p{q * 100:g}"] = out
    return pa.Table.from_pandas(df, preserve_index=False)


# -------------------------------------------------------------- ip_prefix


def ip_prefix_agg(ds, ip_col: str, prefix_length: int):
    """Bucket IPv4 addresses by /prefix_length network. Vectorized
    parse (reuses the ip_range u32 conversion), map-side combine, one
    tiny groupby. Buckets keyed by the dotted network address."""
    if not 0 <= prefix_length <= 32:
        raise ValueError("prefix_length in [0, 32]")
    from raydex.ops.aggs import _ipv4_to_u32

    shift = 32 - prefix_length

    def partial(t: pa.Table) -> pa.Table:
        u32, ok = _ipv4_to_u32(t[ip_col], strict=False)
        nets = (u32[ok] >> shift).astype(np.uint64) if shift else u32[ok].astype(np.uint64)
        uniq, cnt = np.unique(nets, return_counts=True)
        return pa.table(
            {"net": pa.array(uniq, pa.uint64()),
             "doc_count": pa.array(cnt, pa.int64())}
        )

    g = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("net").sum("doc_count")
    ).to_pandas()
    nets = g["net"].to_numpy(dtype=np.uint64) << np.uint64(shift)
    g["key"] = [
        f"{(n >> 24) & 255}.{(n >> 16) & 255}.{(n >> 8) & 255}.{n & 255}"
        f"/{prefix_length}"
        for n in nets.astype(np.int64)
    ]
    cnt_col = [c for c in g.columns if c.startswith("sum(")]
    g = g.rename(columns={cnt_col[0]: "doc_count"}) if cnt_col else g
    g = g[["key", "doc_count"]].sort_values("key").reset_index(drop=True)
    return pa.Table.from_pandas(g, preserve_index=False)


# ----------------------------------------------------------------- t_test


def _betacf(a: float, b: float, x: float) -> float:
    """Continued fraction for the incomplete beta function (Numerical
    Recipes §6.4, public algorithm)."""
    MAXIT, EPS, FPMIN = 200, 3e-16, 1e-300
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c, d = 1.0, 1.0 - qab * x / qap
    if abs(d) < FPMIN:
        d = FPMIN
    d = 1.0 / d
    h = d
    for m in range(1, MAXIT + 1):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < FPMIN:
            d = FPMIN
        c = 1.0 + aa / c
        if abs(c) < FPMIN:
            c = FPMIN
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < FPMIN:
            d = FPMIN
        c = 1.0 + aa / c
        if abs(c) < FPMIN:
            c = FPMIN
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < EPS:
            break
    return h


def _betainc(a: float, b: float, x: float) -> float:
    """Regularized incomplete beta I_x(a, b)."""
    import math

    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    ln_bt = (
        math.lgamma(a + b) - math.lgamma(a) - math.lgamma(b)
        + a * math.log(x) + b * math.log1p(-x)
    )
    bt = math.exp(ln_bt)
    if x < (a + 1.0) / (a + b + 2.0):
        return bt * _betacf(a, b, x) / a
    return 1.0 - bt * _betacf(b, a, 1.0 - x) / b


def _t_sf2(t: float, dof: float) -> float:
    """Two-sided p-value of a t statistic."""
    return _betainc(dof / 2.0, 0.5, dof / (dof + t * t))


def t_test_agg(ds, col_a: str, col_b: str, kind: str = "heteroscedastic"):
    """Two-sample t-test over two numeric columns, the reference's three
    modes: ``paired`` (same docs), ``homoscedastic`` (pooled variance),
    ``heteroscedastic`` (Welch, the default). Runs as one pass of
    distributive partials (n, sum, sum_sq per column; paired adds the
    difference moments). Returns {t, p_value, dof}."""

    def partial(t: pa.Table) -> pa.Table:
        a = t[col_a].to_numpy(zero_copy_only=False).astype(np.float64)
        b = t[col_b].to_numpy(zero_copy_only=False).astype(np.float64)
        d = a - b
        return pa.table(
            {
                "na": [float(a.size)], "sa": [float(a.sum())],
                "qa": [float((a * a).sum())],
                "nb": [float(b.size)], "sb": [float(b.sum())],
                "qb": [float((b * b).sum())],
                "nd": [float(d.size)], "sd_": [float(d.sum())],
                "qd": [float((d * d).sum())],
            }
        )

    p = ds.map_batches(partial, batch_format="pyarrow").to_pandas().sum()
    na, sa, qa = p["na"], p["sa"], p["qa"]
    nb, sb, qb = p["nb"], p["sb"], p["qb"]
    ma, mb = sa / na, sb / nb
    va = (qa - na * ma * ma) / (na - 1)
    vb = (qb - nb * mb * mb) / (nb - 1)
    if kind == "paired":
        nd, sd_, qd = p["nd"], p["sd_"], p["qd"]
        md = sd_ / nd
        vd = (qd - nd * md * md) / (nd - 1)
        t_stat = md / np.sqrt(vd / nd)
        dof = nd - 1
    elif kind == "homoscedastic":
        sp2 = ((na - 1) * va + (nb - 1) * vb) / (na + nb - 2)
        t_stat = (ma - mb) / np.sqrt(sp2 * (1 / na + 1 / nb))
        dof = na + nb - 2
    elif kind == "heteroscedastic":
        se2 = va / na + vb / nb
        t_stat = (ma - mb) / np.sqrt(se2)
        dof = se2 * se2 / (
            (va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1)
        )
    else:
        raise ValueError(f"unknown t_test kind {kind!r}")
    return {
        "t": float(t_stat),
        "p_value": float(_t_sf2(float(t_stat), float(dof))),
        "dof": float(dof),
    }


# --------------------------------------------------------- categorize_text


def categorize_text(ds, text_col: str, size: int = 10,
                    max_tokens: int = 12):
    """Deterministic log-message categorizer: tokens containing digits
    are variables and are dropped; the first ``max_tokens`` surviving
    lowercase tokens form the category key (the reference's ML
    categorization replaced by its documented token-pattern core).
    Partial counts per batch -> one tiny groupby -> top size."""

    def partial(t: pa.Table) -> pa.Table:
        import re

        keys = []
        for txt in t[text_col].to_pylist():
            toks = [
                w for w in re.split(r"[^A-Za-z0-9_]+", (txt or "").lower())
                if w and not any(ch.isdigit() for ch in w)
            ]
            keys.append(" ".join(toks[:max_tokens]))
        dfp = pd.DataFrame({"category": keys})
        g = dfp.value_counts().rename("doc_count").reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    g = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("category").sum("doc_count")
    ).to_pandas()
    cnt = [c for c in g.columns if c.startswith("sum(")]
    if cnt:
        g = g.rename(columns={cnt[0]: "doc_count"})
    g = g.sort_values(["doc_count", "category"],
                      ascending=[False, True]).head(size)
    return pa.Table.from_pandas(g.reset_index(drop=True), preserve_index=False)


# ----------------------------------------------------------- string_stats


def string_stats(ds, col: str, show_distribution: bool = False):
    """``string_stats`` (x-pack analytics ``StringStatsAggregator.java``):
    count, min/max/avg length and base-2 Shannon entropy over the
    CHARACTERS of every value (``InternalStringStats.java:132`` —
    p = char_count / total_length). Distributive partials: one row per
    batch with (n, total_len, min, max) plus the batch's codepoint
    histogram as parallel list columns, reduced driver-side (alphabet-
    sized, tiny). Lengths are Unicode code points (the reference counts
    UTF-16 units; identical off the astral planes)."""

    def partial(t: pa.Table) -> pa.Table:
        arr = t[col].combine_chunks().drop_null()
        n = len(arr)
        # zero-length values COUNT toward min/max/total — the reference
        # records every value's length including 0
        # (StringStatsAggregator.java:104-111)
        lens = (pc.utf8_length(arr).to_numpy(zero_copy_only=False)
                if n else np.empty(0, dtype=np.int64))
        joined = "".join(arr.to_pylist())
        codes = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
        uniq, cnt = np.unique(codes, return_counts=True)
        return pa.table(
            {
                "n": pa.array([n], pa.int64()),
                "tl": pa.array([int(lens.sum())], pa.int64()),
                "mn": pa.array(
                    [int(lens.min()) if lens.size else 2**31 - 1],
                    pa.int64()),
                "mx": pa.array(
                    [int(lens.max()) if lens.size else -(2**31)],
                    pa.int64()),
                "codes": pa.array([uniq.astype(np.int64).tolist()]),
                "cnts": pa.array([cnt.astype(np.int64).tolist()]),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    count = sum(r["n"] for r in parts)
    total_len = sum(r["tl"] for r in parts)
    occ: dict[int, int] = {}
    for r in parts:
        for c, k in zip(r["codes"], r["cnts"]):
            occ[c] = occ.get(c, 0) + k
    entropy = 0.0
    if total_len:
        p = np.array(sorted(occ.values()), dtype=np.float64) / total_len
        entropy = float(-(p * np.log2(p)).sum())
    # min/max keyed on COUNT, not total_len: all-empty input still has
    # lengths (all 0) — the Integer.MAX_VALUE/MIN_VALUE sentinels only
    # survive when no value was seen at all
    out = {
        "count": int(count),
        "min_length": (min(int(r["mn"]) for r in parts)
                       if count else None),
        "max_length": (max(int(r["mx"]) for r in parts)
                       if count else None),
        "avg_length": (total_len / count if count else None),
        "entropy": entropy,
    }
    if show_distribution:
        out["distribution"] = {
            chr(c): occ[c] / total_len for c in sorted(occ)
        }
    return out


# --------------------------------------------------- cumulative_cardinality


def cumulative_cardinality(ds, ts_col: str, key_col: str,
                           interval_us: int):
    """``cumulative_cardinality`` pipeline agg
    (``CumulativeCardinalityPipelineAggregator.java``): per
    date-histogram bucket, the number of DISTINCT keys seen in that
    bucket or any earlier one (e.g. cumulative unique users). Exact and
    shuffle-light: one groupby(key).min(first bucket) — each key
    contributes at its FIRST bucket — then per-bucket first-seen counts
    cumsum'd over the (small) bucket axis. The reference merges HLL
    sketches cumulatively; with exact per-key firsts the result is the
    exact value its sketch approximates."""

    def bucketize(t: pa.Table) -> pa.Table:
        ts = t[ts_col].combine_chunks()
        if pa.types.is_timestamp(ts.type):
            ts = ts.cast(pa.timestamp("us")).cast(pa.int64())
        b = pc.multiply(
            pc.floor(pc.divide(ts.cast(pa.float64()), float(interval_us))),
            float(interval_us),
        ).cast(pa.int64())
        return pa.table({"key": t[key_col], "bucket": b})

    firsts = (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("key")
        .min("bucket")
    )
    counts = (
        firsts.groupby("min(bucket)").count().to_pandas()
        .rename(columns={"min(bucket)": "bucket", "count()": "first_seen"})
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    counts["cumulative_cardinality"] = counts["first_seen"].cumsum()
    return pa.Table.from_pandas(
        counts[["bucket", "cumulative_cardinality"]], preserve_index=False
    )


# ----------------------------------------------------- frequent_item_sets


def frequent_item_sets(ds, cols: list[str], min_support: float = 0.1,
                       max_set_size: int = 3, size: int = 10):
    """Apriori-style frequent (field, value) itemsets: each row's items
    are its (col, value) pairs; per-batch Counters over combinations up
    to ``max_set_size`` combine through one groupby; support = count /
    total rows, filtered at ``min_support``. The enumeration bound is
    the reference's max itemset size knob (its default ladder stops
    small for the same combinatorial reason)."""

    def partial(t: pa.Table) -> pa.Table:
        from collections import Counter

        cnt: Counter = Counter()
        colvals = {c: t[c].to_pylist() for c in cols}
        n = t.num_rows
        for i in range(n):
            items = sorted(
                f"{c}={colvals[c][i]}" for c in cols
                if colvals[c][i] is not None
            )
            for r in range(1, min(max_set_size, len(items)) + 1):
                for combo in combinations(items, r):
                    cnt["\x1f".join(combo)] += 1
        ks = list(cnt.keys())
        return pa.table(
            {"itemset": pa.array(ks, pa.string()),
             "doc_count": pa.array([cnt[k] for k in ks], pa.int64()),
             "rows": pa.array([n] + [0] * (len(ks) - 1) if ks else [],
                              pa.int64())}
        )

    g = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    total = int(g["rows"].sum())
    agg = g.groupby("itemset", as_index=False)["doc_count"].sum()
    agg["support"] = agg["doc_count"] / max(total, 1)
    agg = agg[agg["support"] >= min_support]
    agg["items"] = agg["itemset"].str.split("\x1f")
    agg = agg.sort_values(["doc_count", "itemset"],
                          ascending=[False, True]).head(size)
    return pa.Table.from_pandas(
        agg[["items", "doc_count", "support"]].reset_index(drop=True),
        preserve_index=False,
    )


def _register() -> None:
    from raydex.ops.aggs import register_agg

    for _n, _f in [
        ("rate", rate_agg),
        ("normalize", normalize_buckets),
        ("moving_percentiles", moving_percentiles),
        ("ip_prefix", ip_prefix_agg),
        ("t_test", t_test_agg),
        ("string_stats", string_stats),
        ("cumulative_cardinality", cumulative_cardinality),
        ("categorize_text", categorize_text),
        ("frequent_item_sets", frequent_item_sets),
    ]:
        register_agg(_n, _f)


_register()
