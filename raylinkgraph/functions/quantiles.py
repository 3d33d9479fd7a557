"""Distributed exact quantiles by iterative range refinement.

No full sort and no large shuffle: each round streams the column once,
emitting per-batch histogram partials over the still-unresolved rank
intervals (<= n_ranks * bins tiny rows per batch, pre-combined), folds
them in one small bucketed groupby, and narrows each target rank's
candidate set by ~bins x. The final resolve pass streams (value, count)
partials for the surviving candidates only. Rounds over 100 TB:
ceil(log_bins(N / max_local)) ~ 2-3.

Membership across rounds is the CHAIN of floor-bin assignments, not a
range test: a value belongs to round j's candidate set iff it landed in
the chosen bin of every previous round's (lo, width) grid. Re-testing
with `lo' <= x <= hi'` instead would disagree with the floor arithmetic
by one ulp at bin boundaries and silently corrupt the rank bookkeeping;
the chain makes worker and driver decisions bit-identical.

Matches DuckDB's quantile_disc exactly: the returned value is the
element at 0-indexed rank max(0, ceil(q * n) - 1) of the sorted column
(probed rule; both sides compute q * n in IEEE float64, so the rank is
bit-identical).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import ray.data as rd

from raylinkgraph.functions.hashing import partition_of


def _disc_rank(q: float, n: int) -> int:
    return max(0, math.ceil(q * n) - 1)


def _degenerate(lo: float, hi: float, max_distinct: int = 4096) -> bool:
    """True when [lo, hi] spans <= ~max_distinct representable doubles:
    further binning cannot usefully split it, but a (value, count)
    distinct-resolve pass is bounded to max_distinct rows — this is how
    a duplicate mass with count >> max_local terminates."""
    return (hi - lo) <= np.spacing(max(abs(lo), abs(hi))) * max_distinct


def _member(x: np.ndarray, conds, bins: int) -> np.ndarray:
    m = np.ones(len(x), np.bool_)
    for lo, w, bi in conds:
        b = np.clip(np.floor((x - lo) / w), 0, bins - 1)
        m &= b == bi
    return m


def exact_quantiles(
    ds: rd.Dataset,
    col: str,
    qs: list[float],
    *,
    bins: int = 256,
    max_local: int = 1_000_000,
    max_rounds: int = 80,
    buckets: int = 8,
) -> pd.DataFrame:
    """quantile_disc over ``ds[col]`` -> (q_e6:int64, value:float64),
    one row per requested quantile, in input order.

    ``max_local`` bounds the candidate-set size at which refinement
    stops; the resolve pass then moves one (value, count) row per
    DISTINCT candidate value, so a huge duplicate mass (ulp-scale
    interval, count >> max_local but few distinct doubles) resolves
    without ever collecting raw values. Rounds are bounded even then:
    an interval spans <= ~2^64 representable doubles, and each split
    divides that by ~bins, so a duplicate mass degenerates within
    64 / log2(bins) rounds (8 at the default bins=256); ``max_rounds``
    is a safety cap above that, not a tuning knob.
    """
    vals = ds.select_columns([col]).materialize()

    def stats(b: pd.DataFrame) -> pd.DataFrame:
        x = b[col].to_numpy(np.float64)
        x = x[~np.isnan(x)]
        if not len(x):
            return pd.DataFrame({"n": pd.Series([], dtype=np.int64),
                                 "lo": pd.Series([], dtype=np.float64),
                                 "hi": pd.Series([], dtype=np.float64)})
        return pd.DataFrame({"n": [len(x)], "lo": [x.min()], "hi": [x.max()]})

    st = vals.map_batches(stats, batch_format="pandas").to_pandas()
    n = int(st["n"].sum()) if "n" in st.columns else 0
    if n == 0:
        return pd.DataFrame({"q_e6": pd.Series([], dtype=np.int64),
                             "value": pd.Series([], dtype=np.float64)})
    glo, ghi = float(st["lo"].min()), float(st["hi"].max())

    # per target: the bin-chain (conds), current nominal [lo, hi], the
    # wanted element's rank AMONG the candidate set, and its size
    targets = [
        {"q": q, "lo": glo, "hi": ghi, "conds": [], "rank": _disc_rank(q, n),
         "count": n, "value": None}
        for q in qs
    ]

    for _ in range(max_rounds):
        live = []
        for t in targets:
            if t["value"] is not None or t["count"] <= max_local:
                continue
            if _degenerate(t["lo"], t["hi"]):
                continue  # duplicate mass: distinct-resolve below
            live.append(t)
        if not live:
            break
        g_lo = np.array([t["lo"] for t in live])
        g_w = np.array([(t["hi"] - t["lo"]) / bins for t in live])
        g_conds = [list(t["conds"]) for t in live]

        def hist(b: pd.DataFrame) -> pd.DataFrame:
            x = b[col].to_numpy(np.float64)
            x = x[~np.isnan(x)]
            keys, cnts = [], []
            for i in range(len(g_lo)):
                m = x[_member(x, g_conds[i], bins)]
                if not len(m):
                    continue
                bi = np.clip(
                    np.floor((m - g_lo[i]) / g_w[i]), 0, bins - 1
                ).astype(np.int64)
                u, c = np.unique(bi, return_counts=True)
                keys.append(np.int64(i) * np.int64(bins) + u)
                cnts.append(c.astype(np.int64))
            if not keys:
                return pd.DataFrame({"key": pd.Series([], dtype=np.int64),
                                     "cnt": pd.Series([], dtype=np.int64),
                                     "__p": pd.Series([], dtype=np.int32)})
            k = np.concatenate(keys)
            return pd.DataFrame(
                {"key": k, "cnt": np.concatenate(cnts),
                 "__p": partition_of(k, buckets)}
            )

        def fold(g: pd.DataFrame) -> pd.DataFrame:
            u, inv = np.unique(g["key"].to_numpy(np.int64), return_inverse=True)
            c = np.bincount(inv, weights=g["cnt"].to_numpy(np.float64))
            return pd.DataFrame({"key": u, "cnt": c.astype(np.int64)})

        h = (
            vals.map_batches(hist, batch_format="pandas")
            .groupby("__p")
            .map_groups(fold, batch_format="pandas")
            .to_pandas()
        )
        counts = np.zeros((len(live), bins), np.int64)
        ki = h["key"].to_numpy(np.int64)
        counts[ki // bins, ki % bins] = h["cnt"].to_numpy(np.int64)

        for i, t in enumerate(live):
            cum = np.cumsum(counts[i])
            bi = int(np.searchsorted(cum, t["rank"] + 1))
            before = int(cum[bi - 1]) if bi else 0
            t["rank"] -= before
            t["count"] = int(counts[i][bi])
            t["conds"] = t["conds"] + [(g_lo[i], g_w[i], bi)]
            t["lo"] = g_lo[i] + bi * g_w[i]
            t["hi"] = g_lo[i] + (bi + 1) * g_w[i]

    pending = [t for t in targets if t["value"] is None]
    wide = [
        t for t in pending
        if t["count"] > max_local and not _degenerate(t["lo"], t["hi"])
    ]
    if wide:
        raise RuntimeError(
            f"{len(wide)} quantile interval(s) still hold > "
            f"max_local={max_local} values after {max_rounds} rounds; "
            f"raise bins, max_rounds, or max_local"
        )
    if pending:
        p_conds = [list(t["conds"]) for t in pending]

        def resolve(b: pd.DataFrame) -> pd.DataFrame:
            x = b[col].to_numpy(np.float64)
            x = x[~np.isnan(x)]
            out_iv, out_v, out_c = [], [], []
            for i in range(len(p_conds)):
                m = x[_member(x, p_conds[i], bins)]
                if not len(m):
                    continue
                u, c = np.unique(m, return_counts=True)
                out_iv.append(np.full(len(u), i, np.int64))
                out_v.append(u)
                out_c.append(c.astype(np.int64))
            if not out_iv:
                return pd.DataFrame({"iv": pd.Series([], dtype=np.int64),
                                     "v": pd.Series([], dtype=np.float64),
                                     "cnt": pd.Series([], dtype=np.int64)})
            return pd.DataFrame(
                {"iv": np.concatenate(out_iv), "v": np.concatenate(out_v),
                 "cnt": np.concatenate(out_c)}
            )

        got = vals.map_batches(resolve, batch_format="pandas").to_pandas()
        for i, t in enumerate(pending):
            sub = got[got["iv"] == i].groupby("v", sort=True)["cnt"].sum()
            cum = sub.to_numpy(np.int64).cumsum()
            t["value"] = float(
                sub.index.to_numpy(np.float64)[np.searchsorted(cum, t["rank"] + 1)]
            )

    return pd.DataFrame(
        {
            "q_e6": np.floor(np.array([t["q"] for t in targets]) * 1e6 + 0.5
                             ).astype(np.int64),
            "value": np.array([t["value"] for t in targets], np.float64),
        }
    )


def grouped_quantiles(
    ds: rd.Dataset,
    key_col: str,
    val_col: str,
    qs: list[float],
    *,
    buckets: int = 32,
) -> rd.Dataset:
    """Per-group quantile_disc -> (key, q_e6, value), exact.

    ONE shuffle: rows hash-bucket on the group key (pre-combined per
    batch into (key, value, count) partials, so heavy duplicate values
    travel as one row); each bucket holds its groups entirely and
    resolves every quantile vectorized from the sorted distinct-value
    runs. Assumes per-GROUP distinct values fit a worker (the normal
    case); a group too large for that needs exact_quantiles on its own
    filtered column instead.
    """
    q_arr = np.asarray(qs, np.float64)
    q_e6 = np.floor(q_arr * 1e6 + 0.5).astype(np.int64)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        k = b[key_col].to_numpy()
        v = b[val_col].to_numpy(np.float64)
        m = ~np.isnan(v)
        df = (
            pd.DataFrame({"k": k[m], "v": v[m]})
            .groupby(["k", "v"], sort=False)
            .size()
            .reset_index(name="cnt")
        )
        kk = df["k"].to_numpy()
        if np.issubdtype(kk.dtype, np.integer):
            part = partition_of(kk.astype(np.int64), buckets)
        else:
            from raylinkgraph.functions.hashing import crc32_str

            part = (crc32_str(kk) % buckets).astype(np.int32)
        df["__p"] = part
        return df

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby(["k", "v"], sort=True)["cnt"].sum().reset_index()
        out_k, out_q, out_v = [], [], []
        kv = agg["k"].to_numpy()
        vv = agg["v"].to_numpy(np.float64)
        cc = agg["cnt"].to_numpy(np.int64)
        starts = np.flatnonzero(np.r_[True, kv[1:] != kv[:-1]])
        ends = np.r_[starts[1:], len(kv)]
        for lo, hi in zip(starts, ends):
            cum = np.cumsum(cc[lo:hi])
            n = int(cum[-1])
            ranks = np.maximum(0, np.ceil(q_arr * n).astype(np.int64) - 1)
            idx = np.searchsorted(cum, ranks + 1)
            out_k.append(np.repeat(kv[lo], len(q_arr)))
            out_q.append(q_e6)
            out_v.append(vv[lo:hi][idx])
        if not out_k:
            return pd.DataFrame({key_col: pd.Series([], dtype=g["k"].dtype),
                                 "q_e6": pd.Series([], dtype=np.int64),
                                 "value": pd.Series([], dtype=np.float64)})
        return pd.DataFrame(
            {key_col: np.concatenate(out_k), "q_e6": np.concatenate(out_q),
             "value": np.concatenate(out_v)}
        )

    return (
        ds.select_columns([key_col, val_col])
        .map_batches(partial, batch_format="pandas")
        .groupby("__p")
        .map_groups(resolve, batch_format="pandas")
    )
