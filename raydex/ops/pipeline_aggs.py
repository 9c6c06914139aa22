"""Pipeline aggregations (agg-over-agg, SURVEY.md §2.6 'Pipeline').

The reference runs these coordinator-side over the final (small) agg
result tree (``server/.../search/aggregations/pipeline/``); here they
are plain pandas/numpy post-processing over a bucket table — the final
reduce output of a raydex agg. Implemented: derivative, cumulative_sum,
moving_fn (window apply), serial_diff, avg/min/max/sum/stats_bucket,
bucket_script, bucket_selector, bucket_sort.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _df(buckets) -> pd.DataFrame:
    if isinstance(buckets, pa.Table):
        return buckets.to_pandas()
    if isinstance(buckets, pd.DataFrame):
        return buckets.copy()
    return buckets.to_pandas()


def derivative(buckets, value_col: str, out_col: str = "derivative") -> pd.DataFrame:
    df = _df(buckets)
    df[out_col] = df[value_col].diff()
    return df


def cumulative_sum(buckets, value_col: str, out_col: str = "cumulative_sum") -> pd.DataFrame:
    df = _df(buckets)
    df[out_col] = df[value_col].cumsum()
    return df


def moving_fn(buckets, value_col: str, window: int, fn, out_col: str = "moving_fn") -> pd.DataFrame:
    df = _df(buckets)
    df[out_col] = df[value_col].rolling(window, min_periods=1).apply(fn, raw=True)
    return df


def serial_diff(buckets, value_col: str, lag: int = 1, out_col: str = "serial_diff") -> pd.DataFrame:
    df = _df(buckets)
    df[out_col] = df[value_col].diff(lag)
    return df


def stats_bucket(buckets, value_col: str) -> dict:
    df = _df(buckets)
    x = df[value_col].to_numpy(dtype=np.float64)
    return {
        "count": int(x.size),
        "min": float(x.min()) if x.size else float("nan"),
        "max": float(x.max()) if x.size else float("nan"),
        "sum": float(x.sum()),
        "avg": float(x.mean()) if x.size else float("nan"),
    }


def avg_bucket(buckets, value_col: str) -> float:
    return stats_bucket(buckets, value_col)["avg"]


def sum_bucket(buckets, value_col: str) -> float:
    return stats_bucket(buckets, value_col)["sum"]


def min_bucket(buckets, value_col: str) -> float:
    return stats_bucket(buckets, value_col)["min"]


def max_bucket(buckets, value_col: str) -> float:
    return stats_bucket(buckets, value_col)["max"]


def bucket_script(buckets, script, out_col: str = "bucket_script") -> pd.DataFrame:
    """script: fn(row: pd.Series) -> value (the Painless analogue is a
    Python callable, SURVEY.md §2.9)."""
    df = _df(buckets)
    df[out_col] = df.apply(script, axis=1)
    return df


def bucket_selector(buckets, predicate) -> pd.DataFrame:
    df = _df(buckets)
    return df[df.apply(predicate, axis=1)].reset_index(drop=True)


def bucket_sort(buckets, by: list[str], ascending=None, size: int | None = None) -> pd.DataFrame:
    df = _df(buckets)
    if ascending is None:
        ascending = [True] * len(by)
    df = df.sort_values(by, ascending=ascending).reset_index(drop=True)
    return df.head(size) if size else df
