"""Driver-gate simulation: every queries() entry runs; every oracle_sql()
entry matches DuckDB exactly (row count + order-insensitive values) at
sf0.001 — the same comparison shape the driver applies at sf0.01."""

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

import __ray_entry__ as entrymod

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return c


def _to_df(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


ORACLES = entrymod.oracle_sql()
ALL = entrymod.queries()


@pytest.mark.parametrize("name", sorted(ALL))
def test_query_gate(name, ray_session, sf_dir, con):
    res = ALL[name](sf_dir)
    df = _to_df(res)
    assert df is not None
    if name not in ORACLES:
        assert len(df) >= 0  # rows-only check (non-SQL-expressible op)
        return
    want = con.execute(ORACLES[name]).df()
    assert len(df) == len(want), f"{name}: rows {len(df)} != {len(want)}"
    a, b = _norm(df.copy()), _norm(want.copy())
    assert list(a.columns) == list(b.columns), f"{name}: columns {list(a.columns)} != {list(b.columns)}"
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True, obj=name)


def test_entry_smoke(ray_session):
    out = entrymod.entry()
    df = _to_df(out)
    assert len(df) > 0
    assert set(df.columns) == {"qid", "rank", "url", "score"}
