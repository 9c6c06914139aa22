"""Analytics-tier aggs: rate, normalize, moving_percentiles, ip_prefix,
t_test (3 modes + p-value via incomplete beta), categorize_text,
frequent_item_sets — each checked against a direct numpy/pandas
recomputation."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from raydex.ops.analytics_aggs import (
    categorize_text,
    frequent_item_sets,
    ip_prefix_agg,
    moving_percentiles,
    normalize_buckets,
    rate_agg,
    t_test_agg,
)


@pytest.fixture(scope="module")
def events(ray_session):
    n = 500
    rng = np.random.default_rng(3)
    ts = pd.Timestamp("2024-05-01") + pd.to_timedelta(
        rng.integers(0, 72 * 3600, n), unit="s"
    )
    return pa.table(
        {
            "ts": pa.array(ts).cast(pa.timestamp("us")),
            "value": pa.array(rng.normal(10, 2, n)),
            "value2": pa.array(rng.normal(11, 3, n)),
            "ip": pa.array(
                [f"10.{i % 4}.{(i * 7) % 256}.{i % 256}" for i in range(n)]
            ),
            "msg": pa.array(
                [f"user {i} failed login attempt {i * 3} from host{i % 2}"
                 if i % 3 else f"disk {i} almost full" for i in range(n)]
            ),
            "color": pa.array([("red", "blue", "green")[i % 3] for i in range(n)]),
            "size": pa.array([("s", "m")[i % 2] for i in range(n)]),
        }
    )


def test_rate(events):
    ds = rd.from_arrow(events)
    out = rate_agg(ds, "ts", interval="day", unit="hour").to_pandas()
    df = events.to_pandas()
    want = df.groupby(df["ts"].dt.floor("D")).size()
    got = dict(zip(out["bucket_ts"], out["rate"]))
    for ts, cnt in want.items():
        assert got[ts] == pytest.approx(cnt / 24.0)
    # sum-of-field variant
    out2 = rate_agg(ds, "ts", interval="day", unit="day",
                    value_col="value").to_pandas()
    want2 = df.groupby(df["ts"].dt.floor("D"))["value"].sum()
    got2 = dict(zip(out2["bucket_ts"], out2["rate"]))
    for ts, s in want2.items():
        assert got2[ts] == pytest.approx(s)
    with pytest.raises(ValueError, match="unit must be <="):
        rate_agg(ds, "ts", interval="hour", unit="day")


def test_normalize_methods():
    b = pa.table({"k": ["a", "b", "c", "d"], "v": [1.0, 3.0, 5.0, 7.0]})
    v = np.array([1.0, 3.0, 5.0, 7.0])
    cases = {
        "rescale_0_1": (v - 1) / 6,
        "rescale_0_100": (v - 1) / 6 * 100,
        "percent_of_sum": v / 16 * 100,
        "mean": (v - 4) / 6,
        "z-score": (v - 4) / v.std(),
        "softmax": np.exp(v) / np.exp(v).sum(),
    }
    for method, want in cases.items():
        got = normalize_buckets(b, "v", method).to_pandas()["normalized"]
        np.testing.assert_allclose(got, want, rtol=1e-12)


def test_moving_percentiles():
    b = pa.table({"v": [5.0, 1.0, 9.0, 3.0, 7.0]})
    out = moving_percentiles(b, "v", window=3, qs=(0.5,)).to_pandas()
    v = [5.0, 1.0, 9.0, 3.0, 7.0]
    want = [np.quantile(v[max(0, i - 2):i + 1], 0.5) for i in range(5)]
    np.testing.assert_allclose(out["p50"], want)


def test_ip_prefix(events):
    ds = rd.from_arrow(events)
    out = ip_prefix_agg(ds, "ip", prefix_length=16).to_pandas()
    df = events.to_pandas()
    nets = df["ip"].str.extract(r"^(\d+\.\d+)\.")[0] + ".0.0/16"
    want = nets.value_counts().sort_index()
    assert dict(zip(out["key"], out["doc_count"])) == want.to_dict()
    # malformed rows route to no bucket instead of corrupting others
    bad = pa.table({"ip": ["1.2.3.4", "nonsense", None, "1.2.3.5"]})
    out2 = ip_prefix_agg(rd.from_arrow(bad), "ip", 24).to_pandas()
    assert out2["doc_count"].sum() == 2


def test_t_test_modes(events):
    ds = rd.from_arrow(events)
    df = events.to_pandas()
    a, b = df["value"].to_numpy(), df["value2"].to_numpy()
    na = nb = len(a)
    va, vb = a.var(ddof=1), b.var(ddof=1)
    # Welch
    got = t_test_agg(ds, "value", "value2", kind="heteroscedastic")
    se2 = va / na + vb / nb
    t_want = (a.mean() - b.mean()) / np.sqrt(se2)
    assert got["t"] == pytest.approx(t_want, rel=1e-9)
    dof_want = se2**2 / ((va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1))
    assert got["dof"] == pytest.approx(dof_want, rel=1e-9)
    assert 0.0 <= got["p_value"] <= 1.0
    # strongly-different means -> tiny p; identical column -> p == 1
    assert got["p_value"] < 1e-6
    paired = t_test_agg(ds, "value", "value2", kind="paired")
    d = a - b
    t_paired = d.mean() / np.sqrt(d.var(ddof=1) / na)
    assert paired["t"] == pytest.approx(t_paired, rel=1e-9)
    hom = t_test_agg(ds, "value", "value2", kind="homoscedastic")
    sp2 = ((na - 1) * va + (nb - 1) * vb) / (na + nb - 2)
    t_hom = (a.mean() - b.mean()) / np.sqrt(sp2 * (2 / na))
    assert hom["t"] == pytest.approx(t_hom, rel=1e-9)
    # p-value engine sanity vs the symmetric-beta identity:
    # I_x(v/2, 1/2) at t=0 gives p=1
    from raydex.ops.analytics_aggs import _t_sf2

    assert _t_sf2(0.0, 10) == pytest.approx(1.0)
    assert _t_sf2(100.0, 10) < 1e-12


def test_categorize_text(events):
    ds = rd.from_arrow(events)
    out = categorize_text(ds, "msg", size=5).to_pandas()
    # digit-bearing tokens are variables: two stable categories remain
    cats = set(out["category"])
    assert "user failed login attempt from" in " ".join(cats)
    top = out.iloc[0]
    df = events.to_pandas()
    n_login = (df["msg"].str.contains("failed login")).sum()
    assert top["doc_count"] == n_login


def test_frequent_item_sets(events):
    ds = rd.from_arrow(events)
    out = frequent_item_sets(ds, ["color", "size"], min_support=0.05,
                             max_set_size=2, size=20).to_pandas()
    df = events.to_pandas()
    n = len(df)
    # singleton support matches exact counts
    got = {tuple(r["items"]): r["doc_count"] for _, r in out.iterrows()}
    for c, cnt in df["color"].value_counts().items():
        assert got[(f"color={c}",)] == cnt
    # pair support matches the exact pair count
    pair = df.groupby(["color", "size"]).size()
    for (c, s), cnt in pair.items():
        key = tuple(sorted([f"color={c}", f"size={s}"]))
        if cnt / n >= 0.05:
            assert got[key] == cnt
    # support filter removes nothing above threshold, everything below
    assert all(r >= 0.05 * n for r in out["doc_count"])


def test_string_stats(events):
    from raydex.ops.analytics_aggs import string_stats

    ds = rd.from_arrow(events)
    out = string_stats(ds, "color", show_distribution=True)
    vals = events["color"].to_pylist()
    lens = [len(v) for v in vals if v]
    assert out["count"] == len(vals)
    assert out["min_length"] == min(lens)
    assert out["max_length"] == max(lens)
    assert out["avg_length"] == pytest.approx(sum(lens) / len(vals))
    # entropy vs direct recomputation over the concatenated characters
    from collections import Counter

    occ = Counter("".join(vals))
    tot = sum(occ.values())
    ent = -sum((c / tot) * np.log2(c / tot) for c in occ.values())
    assert out["entropy"] == pytest.approx(ent, rel=1e-12)
    assert sum(out["distribution"].values()) == pytest.approx(1.0)
    assert out["distribution"] == {
        ch: occ[ch] / tot for ch in sorted(occ)
    }


def test_string_stats_zero_length_values(ray_session):
    """Zero-length values count toward min/max/avg — the reference
    records length 0 (StringStatsAggregator.java:104-111): min over
    ['', 'ab'] is 0, and an all-empty column yields 0s, not None."""
    from raydex.ops.analytics_aggs import string_stats

    out = string_stats(
        rd.from_arrow(pa.table({"s": ["", "ab", "abcd", ""]})), "s")
    assert out["count"] == 4
    assert out["min_length"] == 0
    assert out["max_length"] == 4
    assert out["avg_length"] == pytest.approx(6 / 4)
    all_empty = string_stats(
        rd.from_arrow(pa.table({"s": ["", "", ""]})), "s")
    assert all_empty["count"] == 3
    assert all_empty["min_length"] == 0
    assert all_empty["max_length"] == 0
    assert all_empty["avg_length"] == 0.0
    assert all_empty["entropy"] == 0.0


def test_cumulative_cardinality(events):
    from raydex.ops.analytics_aggs import cumulative_cardinality

    ds = rd.from_arrow(events)
    out = cumulative_cardinality(
        ds, "ts", "ip", interval_us=86_400_000_000
    ).to_pandas()
    df = events.to_pandas()
    df["day"] = df["ts"].dt.floor("D")
    days = sorted(df["day"].unique())
    exact = []
    for d in days:
        exact.append((d, df.loc[df["day"] <= d, "ip"].nunique()))
    got = {int(r["bucket"]): int(r["cumulative_cardinality"])
           for _, r in out.iterrows()}
    for d, c in exact:
        key = int(pd.Timestamp(d).value // 1000)
        if key in got:  # buckets appear at first-seen days
            assert got[key] == c
    # the final bucket always exists and equals the global cardinality
    last = max(got)
    assert got[last] == df["ip"].nunique()
    # cumulative counts are monotone
    cc = [got[k] for k in sorted(got)]
    assert cc == sorted(cc)
