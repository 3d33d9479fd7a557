"""Mimic the driver's correctness gate: run every queries() entry at
sf0.01 and compare against its oracle_sql() via DuckDB (row count, schema
names, order-insensitive values)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

import __ray_entry__ as entrymod

SF = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(entrymod.oracle_sql().keys()))
def test_query_matches_oracle(ray_session, con, name):
    got = entrymod.queries()[name](SF)
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    want = con.execute(entrymod.oracle_sql()[name]).fetchdf()
    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: cols {list(got.columns)} vs {list(want.columns)}"
    )
    g, w = _canon(got), _canon(want)
    assert len(g) == len(w), f"{name}: rows {len(g)} vs {len(w)}"
    for c in g.columns:
        gv, wv = g[c].to_numpy(), w[c].to_numpy()
        gk, wk = np.asarray(gv).dtype.kind, np.asarray(wv).dtype.kind
        # The driver hashes TYPED values: an int64 engine column vs a
        # float64 oracle column is a hash mismatch even when every value
        # is equal.  Mirror that here so dtype drift can't hide behind
        # allclose (int/uint are interchangeable widths; float must pair
        # with float).
        num = {"i": "int", "u": "int", "f": "float"}
        if gk in num or wk in num:
            assert num.get(gk) == num.get(wk), (
                f"{name}.{c}: dtype kind {gk} vs oracle {wk}"
            )
        if np.issubdtype(np.asarray(gv).dtype, np.floating):
            assert np.allclose(gv.astype(np.float64), wv.astype(np.float64)), f"{name}.{c}"
        else:
            eq = gv == wv
            assert np.all(eq), f"{name}.{c}: first mismatch at {np.argmin(eq)}"


def test_rows_only_queries_run(ray_session):
    """Queries without a SQL oracle must still run and be deterministic."""
    qs = entrymod.queries()
    no_oracle = set(qs) - set(entrymod.oracle_sql())
    for name in sorted(no_oracle):
        df = qs[name](SF)
        if not isinstance(df, pd.DataFrame):
            df = df.to_pandas()
        assert len(df) >= 0 and len(df.columns) >= 1, name


def test_entry_smoke(ray_session):
    out = entrymod.entry()
    assert len(out) > 0
    assert {"oid", "url", "rank"} <= set(out.columns)
