"""Rollup job + transform pivot (x-pack rollup RollupIndexer /
transform Pivot): grouped pre-aggregation into a dest table, checked
against a direct pandas recomputation."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from raydex.ops.rollup import rollup, transform_pivot

HOUR = 3_600_000_000


@pytest.fixture(scope="module")
def events(ray_session):
    n = 5000
    rng = np.random.default_rng(5)
    ts = pd.Timestamp("2024-01-01") + pd.to_timedelta(
        rng.integers(0, 48 * 3600, n), unit="s")
    return pa.table({
        "ts": pa.array(ts).cast(pa.timestamp("us")),
        "event_type": pa.array(rng.choice(["a", "b", "c"], n)),
        "value": pa.array(rng.normal(10, 3, n)),
        "user_id": pa.array(rng.integers(0, 500, n)),
    })


def _with_bucket(events):
    df = events.to_pandas()
    df["bucket"] = (df["ts"].astype("datetime64[us]").astype("int64")
                    // HOUR) * HOUR
    return df


def test_rollup(events):
    out = rollup(rd.from_arrow(events), "ts", HOUR, dims=["event_type"],
                 metrics={"value": ["min", "max", "avg"],
                          "user_id": ["sum"]}).to_pandas()
    df = _with_bucket(events)
    g = df.groupby(["bucket", "event_type"]).agg(
        n=("value", "size"), vmin=("value", "min"), vmax=("value", "max"),
        vavg=("value", "mean"), usum=("user_id", "sum")).reset_index()
    m = out.merge(g, left_on=["ts.bucket", "event_type"],
                  right_on=["bucket", "event_type"])
    assert len(m) == len(g) == len(out)
    assert (m["_doc_count"] == m["n"]).all()
    assert np.allclose(m["value.min"], m["vmin"])
    assert np.allclose(m["value.max"], m["vmax"])
    assert np.allclose(m["value.avg"], m["vavg"])
    assert (m["user_id.sum"] == m["usum"]).all()
    assert (m["value.value_count"] == m["n"]).all()
    # avg requested without sum: the sum moment still ships (the
    # reference serves avg from sum/value_count at query time)
    assert "value.sum" in out.columns


def test_rollup_value_count_only_no_spurious_sum(events):
    """A {'f': ['value_count']} spec stores ONLY the configured moment —
    the reference's rollup index holds just the fields the job asked
    for, so no '<f>.sum' column may appear."""
    out = rollup(rd.from_arrow(events), "ts", HOUR,
                 metrics={"value": ["value_count"]}).to_pandas()
    assert "value.value_count" in out.columns
    assert "value.sum" not in out.columns
    df = _with_bucket(events)
    g = df.groupby("bucket").agg(n=("value", "size")).reset_index()
    m = out.merge(g, left_on="ts.bucket", right_on="bucket")
    assert len(m) == len(g) == len(out)
    assert (m["value.value_count"] == m["n"]).all()


def test_transform_pivot(events):
    pv = transform_pivot(
        rd.from_arrow(events),
        {"et": {"terms": {"field": "event_type"}},
         "hour": {"date_histogram": {"field": "ts",
                                     "fixed_interval_us": HOUR}}},
        {"v_avg": {"avg": {"field": "value"}},
         "u_sum": {"sum": {"field": "user_id"}},
         "cnt": {"value_count": {"field": "value"}}},
    ).to_pandas()
    df = _with_bucket(events)
    g = df.groupby(["event_type", "bucket"]).agg(
        v_avg=("value", "mean"), u_sum=("user_id", "sum"),
        cnt=("value", "size")).reset_index()
    m = pv.merge(g, left_on=["et", "hour"],
                 right_on=["event_type", "bucket"], suffixes=("", "_w"))
    assert len(m) == len(g) == len(pv)
    assert np.allclose(m["v_avg"], m["v_avg_w"])
    assert (m["u_sum"] == m["u_sum_w"]).all()
    assert (m["cnt"] == m["cnt_w"]).all()
    assert list(pv.columns) == ["et", "hour", "v_avg", "u_sum", "cnt"]


def test_rollup_errors(events):
    with pytest.raises(ValueError, match="unsupported rollup metric"):
        rollup(rd.from_arrow(events), "ts", HOUR,
               metrics={"value": ["median"]})
    with pytest.raises(ValueError, match="unsupported group_by"):
        transform_pivot(rd.from_arrow(events),
                        {"x": {"histogram": {"field": "value"}}}, {})


def test_transform_latest(events):
    from raydex.ops.rollup import transform_latest

    t = events.append_column(
        "eid", pa.array(np.arange(events.num_rows), pa.int64()))
    got = (transform_latest(rd.from_arrow(t).repartition(6),
                            "user_id", "ts", "eid")
           .to_pandas().sort_values("user_id").reset_index(drop=True))
    df = t.to_pandas()
    want = (df.sort_values(["ts", "eid"], ascending=[False, True])
            .groupby("user_id").head(1)
            .sort_values("user_id").reset_index(drop=True))
    assert got["eid"].tolist() == want["eid"].tolist()
    assert len(got) == df["user_id"].nunique()
    # composite unique_key joins and drops the temp column
    got2 = transform_latest(rd.from_arrow(t).repartition(3),
                            ["event_type", "user_id"], "ts", "eid")
    g2 = got2.to_pandas()
    assert "__latest_key" not in g2.columns
    want2 = (df.sort_values(["ts", "eid"], ascending=[False, True])
             .groupby(["event_type", "user_id"]).head(1))
    assert sorted(g2["eid"]) == sorted(want2["eid"])


def test_geo_line(events):
    from raydex.ops.more_aggs import geo_line_agg

    n = events.num_rows
    rng = np.random.default_rng(11)
    t = (events
         .append_column("eid", pa.array(np.arange(n), pa.int64()))
         .append_column("lat", pa.array(rng.uniform(-60, 60, n)))
         .append_column("lon", pa.array(rng.uniform(-180, 180, n))))
    got = (geo_line_agg(rd.from_arrow(t).repartition(5), "event_type",
                        "lat", "lon", "ts", "eid", size=7)
           .to_pandas().sort_values("event_type").reset_index(drop=True))
    df = t.to_pandas()
    for _, row in got.iterrows():
        sub = df[df["event_type"] == row["event_type"]].sort_values(
            ["ts", "eid"])
        assert row["doc_count"] == len(sub)          # cap-surviving count
        assert row["complete"] == (len(sub) <= 7)
        assert np.allclose(np.array([list(p) for p in row["line"]]),
                           sub.head(7)[["lon", "lat"]].to_numpy())
    assert set(got["event_type"]) == set(df["event_type"])
