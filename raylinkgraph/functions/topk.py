"""Grouped top-k rows (the SQL ROW_NUMBER()-window pattern), exact.

Per-batch combiner first: a batch keeps at most k rows per key it
contains, so the shuffle moves <= k * (keys present in batch) rows no
matter how large the group is; then ONE hash(key) shuffle and a
vectorized per-group final selection. Order is total — (order_col
desc/asc, then tie_col asc) — so ranks are deterministic and
oracle-exact against ROW_NUMBER() OVER (PARTITION BY key ORDER BY ...).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from raylinkgraph.functions.hashing import crc32_str, partition_of


def _key_partition(vals: np.ndarray, buckets: int) -> np.ndarray:
    if np.issubdtype(vals.dtype, np.integer):
        return partition_of(vals.astype(np.int64), buckets)
    return (crc32_str(vals) % np.uint32(buckets)).astype(np.int32)


def grouped_top_k(
    ds: rd.Dataset,
    key_col: str,
    order_col: str,
    k: int,
    *,
    tie_col: str,
    descending: bool = True,
    buckets: int = 32,
) -> rd.Dataset:
    """Top-k rows per key -> all input columns + ``rnk`` (1-based).

    ``tie_col`` must be unique per row within a key (a primary key) so
    the order — (order_col desc|asc, tie_col asc) — is total.
    """
    cols = [c for c in ds.schema().names]

    def pick(g: pd.DataFrame, with_rank: bool) -> pd.DataFrame:
        kv = g[key_col].to_numpy()
        ov = g[order_col].to_numpy()
        tv = g[tie_col].to_numpy()
        o_key = -ov if descending and np.issubdtype(ov.dtype, np.number) else ov
        if descending and not np.issubdtype(ov.dtype, np.number):
            # lexsort can't negate strings: rank via dense codes instead
            o_key = -np.unique(ov, return_inverse=True)[1]
        order = np.lexsort((tv, o_key, kv))
        gs = g.iloc[order]
        kk = gs[key_col].to_numpy()
        starts = np.flatnonzero(np.r_[True, kk[1:] != kk[:-1]])
        run = np.arange(len(kk)) - np.repeat(starts, np.diff(np.r_[starts, len(kk)]))
        keep = run < k
        out = gs.iloc[keep]
        if with_rank:
            out = out.copy()
            out["rnk"] = (run[keep] + 1).astype(np.int64)
        return out

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        out = pick(b, with_rank=False)
        out = out.copy()
        out["__p"] = _key_partition(out[key_col].to_numpy(), buckets)
        return out

    return (
        ds.map_batches(combine, batch_format="pandas")
        .groupby("__p")
        .map_groups(
            lambda g: pick(g[cols], with_rank=True), batch_format="pandas"
        )
    )


def grouped_mode(
    ds: rd.Dataset,
    key_col: str,
    val_col: str,
    *,
    buckets: int = 32,
) -> rd.Dataset:
    """Most frequent value per key -> (key, value, n); ties break on the
    smallest value, so the result is deterministic and oracle-exact
    against ROW_NUMBER() OVER (... ORDER BY n DESC, value) = 1.

    Per-batch (key, value, count) partials bucket on hash(key) — every
    row of a key lands in one bucket, so the per-bucket argmax is
    global; the fold is one vectorized pandas groupby + lexsort.
    """

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        c = (
            b.groupby([key_col, val_col], sort=False)
            .size()
            .reset_index(name="n")
        )
        c["__p"] = _key_partition(c[key_col].to_numpy(), buckets)
        return c

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby([key_col, val_col], sort=True)["n"].sum().reset_index()
        top = (
            agg.sort_values([key_col, "n", val_col],
                            ascending=[True, False, True], kind="stable")
            .drop_duplicates(key_col, keep="first")
            .copy()
        )
        top["n"] = top["n"].astype(np.int64)
        return top

    return (
        ds.select_columns([key_col, val_col])
        .map_batches(partial, batch_format="pandas")
        .groupby("__p")
        .map_groups(fold, batch_format="pandas")
    )
