"""exact_quantiles: quantile_disc parity on adversarial shapes — the
oracle-parity sweep covers rel_price_quantiles at sf0.01; here we force
the refinement loop, the duplicate-mass distinct-resolve, and the q=0/1
rank edges on synthetic data."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from raylinkgraph.functions.quantiles import exact_quantiles

QS = [0.0, 0.01, 0.5, 0.77, 1.0]


def _duck(values, qs):
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"x": values}))
    return [
        con.execute(f"SELECT quantile_disc(x, {q}) FROM t").fetchone()[0]
        for q in qs
    ]


def _run(values, qs=QS, **kw):
    ds = rd.from_pandas(pd.DataFrame({"x": np.asarray(values, np.float64)}))
    out = exact_quantiles(ds, "x", qs, **kw)
    return out["value"].tolist()


def test_refinement_loop_matches_duckdb(ray_session):
    rng = np.random.default_rng(7)
    x = rng.lognormal(3.0, 2.0, 20_000)
    # max_local far below n: several refinement rounds must run
    got = _run(x, max_local=100, bins=16)
    assert got == _duck(x, QS)


def test_duplicate_mass_distinct_resolve(ray_session):
    # 50k copies of one double straddling the median: the interval
    # narrows to zero width with count >> max_local; the resolve pass
    # must finish via (value, count) rows, never collecting raw values
    x = np.concatenate([np.full(50_000, 3.14), np.arange(100, dtype=float)])
    got = _run(x, max_local=1000, bins=8)
    assert got == _duck(x, QS)


def test_tiny_and_negative(ray_session):
    x = np.array([-5.0, -1.5, 0.0, 2.5])
    assert _run(x) == _duck(x, QS)
    assert _run([42.0]) == _duck([42.0], QS)


def test_empty_returns_no_rows(ray_session):
    ds = rd.from_pandas(pd.DataFrame({"x": pd.Series([], dtype=np.float64)}))
    out = exact_quantiles(ds, "x", [0.5])
    assert len(out) == 0


def test_grouped_quantiles_string_and_int_keys(ray_session):
    from raylinkgraph.functions.quantiles import grouped_quantiles

    rng = np.random.default_rng(3)
    df = pd.DataFrame(
        {
            "ks": rng.choice(list("abc"), 5000),
            "ki": rng.integers(0, 7, 5000).astype(np.int64),
            "v": rng.normal(0, 10, 5000),
        }
    )
    con = duckdb.connect()
    con.register("t", df)
    for key in ("ks", "ki"):
        got = (
            grouped_quantiles(rd.from_pandas(df), key, "v", [0.25, 0.5, 1.0])
            .to_pandas()
            .sort_values([key, "q_e6"])
            .reset_index(drop=True)
        )
        want = con.execute(
            f"SELECT {key}, 250000::BIGINT q_e6, quantile_disc(v, 0.25) AS value FROM t GROUP BY {key} "
            f"UNION ALL SELECT {key}, 500000::BIGINT, quantile_disc(v, 0.5) FROM t GROUP BY {key} "
            f"UNION ALL SELECT {key}, 1000000::BIGINT, quantile_disc(v, 1.0) FROM t GROUP BY {key} "
            f"ORDER BY {key}, q_e6"
        ).fetchdf()
        assert got[key].astype(str).tolist() == want[key].astype(str).tolist()
        assert got["q_e6"].tolist() == want["q_e6"].tolist()
        assert got["value"].tolist() == want["value"].tolist()
