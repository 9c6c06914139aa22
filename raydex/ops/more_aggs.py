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
        keys = t[key_col].to_pylist()
        fg = np.asarray(foreground_mask_fn(t), dtype=bool)
        dfp = pd.DataFrame({"k": keys, "fg": fg.astype(np.int64), "n": 1})
        g = dfp.groupby("k", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

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
    tail the terms agg misses). Exact: partial counts -> groupby.sum ->
    filter."""
    out = ds.groupby(key_col).count()
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
