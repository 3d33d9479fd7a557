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


def grouped_percent_rank(
    ds: rd.Dataset,
    key_col: str,
    val_col: str,
    id_col: str,
    *,
    buckets: int = 32,
    ntile: int = 4,
) -> rd.Dataset:
    """The per-row ranking windows in ONE pass: PERCENT_RANK(),
    CUME_DIST() OVER (PARTITION BY key ORDER BY val), and
    NTILE(ntile) OVER (PARTITION BY key ORDER BY val, id — total order)
    -> (id, pct_rank, cume_dist, tile). RANK ties share the smallest
    rank; pct = (rank - 1) / (n - 1) (0.0 for single-row groups); cume
    = tie-run end / n; NTILE gives the first (n % t) tiles the extra
    row (the SQL rule). The divisions are correctly-rounded IEEE, so
    engine and oracle doubles are bit-identical.

    ONE hash(key) shuffle; inside a bucket a (key, val) sort makes each
    key a contiguous run and all three columns come from vectorized
    run-start/run-end scans — no per-key dispatch.
    """

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["__p"] = _key_partition(b[key_col].to_numpy(), buckets)
        return b

    def ranks(g: pd.DataFrame) -> pd.DataFrame:
        # id as the final sort key: pct/cume depend only on val runs,
        # but NTILE assigns by ROW order — without a total order a tie
        # straddling a tile boundary would be nondeterministic
        g = g.sort_values([key_col, val_col, id_col], kind="stable")
        k = g[key_col].to_numpy()
        v = g[val_col].to_numpy()
        starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
        ends = np.r_[starts[1:], len(k)]
        sizes = ends - starts
        # group-relative position
        pos = np.arange(len(k)) - np.repeat(starts, sizes)
        # RANK(): ties take the run's first position. A value run starts
        # where val changes OR the key changes.
        new_val = np.r_[True, (v[1:] != v[:-1]) | (k[1:] != k[:-1])]
        run_id = np.cumsum(new_val) - 1
        run_start_pos = pos[np.flatnonzero(new_val)]
        rank = run_start_pos[run_id]
        n = np.repeat(sizes, sizes)
        denom = np.maximum(n.astype(np.float64) - 1.0, 1.0)
        pct = rank.astype(np.float64) / denom
        # CUME_DIST(): (# rows with val <= current) / n = the tie run's
        # END position / n
        run_len = np.bincount(run_id)
        run_end_pos = run_start_pos + run_len
        cume = run_end_pos[run_id].astype(np.float64) / n.astype(np.float64)
        # NTILE(t): first (n % t) tiles take ceil(n/t) rows (SQL rule)
        t = np.int64(ntile)
        q, r = n // t, n % t
        big = r * (q + 1)
        tile = np.where(
            pos < big, pos // np.maximum(q + 1, 1), r + (pos - big) // np.maximum(q, 1)
        ) + 1
        return pd.DataFrame(
            {
                id_col: g[id_col].to_numpy(np.int64),
                "pct_rank": pct,
                "cume_dist": cume,
                "tile": tile.astype(np.int64),
            }
        )

    return (
        ds.select_columns([key_col, val_col, id_col])
        .map_batches(tag, batch_format="pandas")
        .groupby("__p")
        .map_groups(ranks, batch_format="pandas")
    )
