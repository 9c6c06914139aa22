"""Sketch + pipeline-agg + extra-agg tests (partial/final reduce laws)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd
from raydex.ops import more_aggs, pipeline_aggs
from raydex.ops.tdigest import TDigest, percentiles_agg


def test_tdigest_quantiles_accuracy():
    rng = np.random.default_rng(4)
    x = rng.normal(100, 15, size=50000)
    d = TDigest()
    d.add(x)
    for q in (0.01, 0.25, 0.5, 0.75, 0.99):
        exact = np.quantile(x, q)
        approx = d.quantile(q)
        assert abs(approx - exact) < 1.0, (q, exact, approx)


def test_tdigest_merge_law():
    rng = np.random.default_rng(5)
    x = rng.exponential(10, size=30000)
    single = TDigest().add(x)
    parts = [TDigest().add(x[i::5]) for i in range(5)]
    merged = parts[0]
    for p in parts[1:]:
        merged.merge(p)
    for q in (0.1, 0.5, 0.9, 0.99):
        assert abs(merged.quantile(q) - single.quantile(q)) < max(
            0.05 * single.quantile(q), 0.5
        )


def test_tdigest_cdf():
    d = TDigest().add(np.arange(1000, dtype=float))
    assert abs(d.cdf(500.0) - 0.5) < 0.02
    assert d.cdf(-5) == 0.0 and d.cdf(2000) == 1.0


def test_percentiles_agg(ray_session, sf_dir):
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["n_chars"])
    out = percentiles_agg(ds, "n_chars", qs=(0.5,)).to_pylist()[0]
    import duckdb

    exact = duckdb.sql(
        f"SELECT median(n_chars) FROM '{sf_dir}/documents.parquet'"
    ).fetchone()[0]
    assert abs(out["value"] - exact) / max(exact, 1) < 0.05


def test_hdr_accuracy_and_merge_law():
    from raydex.ops.hdr import HdrHistogram

    rng = np.random.default_rng(6)
    x = rng.integers(1, 1_000_000, size=60000)
    h = HdrHistogram(significant_digits=3)
    h.record_many(x)
    for q in (0.01, 0.25, 0.5, 0.75, 0.99):
        exact = float(np.quantile(x, q, method="inverted_cdf"))
        approx = h.quantile(q)
        # fixed RELATIVE error contract of the hdr engine
        assert abs(approx - exact) <= max(2.0, exact * 2e-3), (q, exact, approx)
    # EXACT merge law: counts addition, identical quantiles
    parts = [HdrHistogram(3).record_many(x[i::7]) for i in range(7)]
    merged = parts[0]
    for p in parts[1:]:
        merged.merge(p)
    assert merged.total == h.total
    assert (merged.counts == h.counts).all()
    for q in (0.1, 0.5, 0.9, 0.99):
        assert merged.quantile(q) == h.quantile(q)
    # sparse round-trip (the shipped partial form)
    idx, cnt = h.to_sparse()
    back = HdrHistogram.from_sparse(idx, cnt, 3)
    assert (back.counts == h.counts).all() and back.total == h.total


def test_percentiles_hdr_agg(ray_session, sf_dir):
    from raydex.ops.hdr import percentiles_hdr

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["n_chars"])
    out = percentiles_hdr(ds, "n_chars", qs=(0.5,)).to_pylist()[0]
    import duckdb

    exact = duckdb.sql(
        f"SELECT median(n_chars) FROM '{sf_dir}/documents.parquet'"
    ).fetchone()[0]
    assert abs(out["value"] - exact) / max(exact, 1) < 0.01


def test_pipeline_aggs():
    buckets = pd.DataFrame({"key": list("abcde"), "v": [1.0, 3.0, 2.0, 5.0, 4.0]})
    assert pipeline_aggs.derivative(buckets, "v")["derivative"].tolist()[1:] == [2.0, -1.0, 3.0, -1.0]
    assert pipeline_aggs.cumulative_sum(buckets, "v")["cumulative_sum"].tolist() == [1, 4, 6, 11, 15]
    assert pipeline_aggs.serial_diff(buckets, "v", lag=2)["serial_diff"].tolist()[2:] == [1.0, 2.0, 2.0]
    mf = pipeline_aggs.moving_fn(buckets, "v", 2, np.max)["moving_fn"].tolist()
    assert mf == [1.0, 3.0, 3.0, 5.0, 5.0]
    st = pipeline_aggs.stats_bucket(buckets, "v")
    assert st == {"count": 5, "min": 1.0, "max": 5.0, "sum": 15.0, "avg": 3.0}
    sel = pipeline_aggs.bucket_selector(buckets, lambda r: r["v"] > 2)
    assert sel["key"].tolist() == ["b", "d", "e"]
    bs = pipeline_aggs.bucket_sort(buckets, ["v"], ascending=[False], size=2)
    assert bs["key"].tolist() == ["d", "e"]
    sc = pipeline_aggs.bucket_script(buckets, lambda r: r["v"] * 10)
    assert sc["bucket_script"].tolist() == [10.0, 30.0, 20.0, 50.0, 40.0]


def test_significant_and_rare_terms(ray_session, sf_dir):
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang", "source"])
    out = more_aggs.significant_terms(
        ds, "source", lambda t: pa.compute.equal(t["lang"], "en").to_numpy(zero_copy_only=False)
    ).to_pandas()
    assert (out["score"] > 0).all()
    rare = more_aggs.rare_terms(
        rd.from_items([{"k": "x"}, {"k": "x"}, {"k": "y"}, {"k": "z"}]), "k", 1
    ).to_pandas()
    assert sorted(rare["k"]) == ["y", "z"]


def test_scripted_metric(ray_session, sf_dir):
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["n_chars"])
    total = more_aggs.scripted_metric(
        ds,
        map_fn=lambda t: t["n_chars"].to_numpy(),
        combine_fn=lambda x: int(x.sum()),
        reduce_fn=lambda states: sum(states),
    )
    import duckdb

    exact = duckdb.sql(
        f"SELECT SUM(n_chars) FROM '{sf_dir}/documents.parquet'"
    ).fetchone()[0]
    assert total == exact


def test_matrix_stats(ray_session, sf_dir):
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "value"])
    out = more_aggs.matrix_stats(ds, ["user_id", "value"])
    import duckdb

    cor = duckdb.sql(
        f"SELECT corr(user_id, value) FROM '{sf_dir}/events.parquet'"
    ).fetchone()[0]
    assert out["correlation"][0][1] == pytest.approx(cor, rel=1e-6)


def test_random_score_and_sampler(ray_session):
    ds = rd.from_items([{"id": str(i)} for i in range(2000)])
    a = more_aggs.random_score_column(ds, "id", seed=1).to_pandas().sort_values("id")
    b = (
        more_aggs.random_score_column(
            rd.from_items([{"id": str(i)} for i in range(2000)]), "id", seed=1
        )
        .to_pandas()
        .sort_values("id")
    )
    assert (a["random_score"].to_numpy() == b["random_score"].to_numpy()).all()
    assert a["random_score"].between(0, 1).all()
    s = more_aggs.sampler(ds, "id", 0.25, seed=2).count()
    assert 350 < s < 650  # ~500 expected
