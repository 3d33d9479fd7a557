"""grouped_top_k: ROW_NUMBER parity on synthetic data, string-order
descending path, ascending path, and groups smaller than k (the sf0.01
oracle sweep covers rel_top_orders_per_status)."""

import duckdb
import numpy as np
import pandas as pd
import ray.data as rd

from raylinkgraph.functions.topk import grouped_top_k


def _frame(n=4000, seed=11):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "key": rng.choice(list("pqrs"), n),
            "val": rng.integers(0, 500, n).astype(np.int64),
            "id": np.arange(n, dtype=np.int64),
            "name": [f"row{i:05d}" for i in rng.permutation(n)],
        }
    )


def _oracle(df, order, k, desc):
    con = duckdb.connect()
    con.register("t", df)
    d = "DESC" if desc else "ASC"
    return con.execute(
        f"SELECT key, val, id, name, CAST(ROW_NUMBER() OVER "
        f"(PARTITION BY key ORDER BY {order} {d}, id) AS BIGINT) AS rnk "
        f"FROM t QUALIFY rnk <= {k} ORDER BY key, rnk"
    ).fetchdf()


def _check(df, order, k, desc):
    got = (
        grouped_top_k(
            rd.from_pandas(df), "key", order, k, tie_col="id", descending=desc
        )
        .to_pandas()
        .sort_values(["key", "rnk"])
        .reset_index(drop=True)
    )
    want = _oracle(df, order, k, desc)
    assert got[["key", "val", "id", "name", "rnk"]].astype(str).equals(
        want[["key", "val", "id", "name", "rnk"]].astype(str)
    ), (order, k, desc)


def test_numeric_desc_and_asc(ray_session):
    df = _frame()
    _check(df, "val", 5, True)
    _check(df, "val", 5, False)


def test_string_order_desc(ray_session):
    _check(_frame(), "name", 4, True)


def test_small_groups_keep_all(ray_session):
    df = _frame(n=6)  # groups smaller than k
    _check(df, "val", 10, True)


def test_grouped_mode_ties_and_strings(ray_session):
    from raylinkgraph.functions.topk import grouped_mode

    df = pd.DataFrame(
        {
            "k": ["a", "a", "a", "a", "b", "b"],
            "v": ["y", "x", "x", "y", "z", "z"],  # a: tie x/y -> x wins
        }
    )
    out = (
        grouped_mode(rd.from_pandas(df), "k", "v")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert out.values.tolist() == [["a", "x", 2], ["b", "z", 2]]


def test_grouped_percent_rank_ties(ray_session):
    import duckdb

    from raylinkgraph.functions.topk import grouped_percent_rank

    df = pd.DataFrame(
        {
            "k": np.int64([1, 1, 1, 1, 2, 2, 3]),
            "v": np.float64([5.0, 5.0, 7.0, 1.0, 2.0, 2.0, 9.0]),
            "id": np.arange(7, dtype=np.int64),
        }
    )
    got = (
        grouped_percent_rank(rd.from_pandas(df), "k", "v", "id")
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute(
        "SELECT id, PERCENT_RANK() OVER w AS pct_rank, "
        "CUME_DIST() OVER w AS cume_dist, "
        "CAST(NTILE(4) OVER w2 AS BIGINT) AS tile FROM t "
        "WINDOW w AS (PARTITION BY k ORDER BY v), "
        "w2 AS (PARTITION BY k ORDER BY v, id) ORDER BY id"
    ).fetchdf()
    for c in ("pct_rank", "cume_dist", "tile"):
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c
