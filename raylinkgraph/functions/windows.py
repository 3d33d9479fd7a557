"""Stream-shaped operators over an ordered, partitioned event log.

Ray Data has no event-time windows/watermarks (guide: treat the input as
a partitioned log); these express the standard shapes:
- tumbling window aggregate: window key computed per batch (pure column
  math, no shuffle beyond the final pre-combined groupby)
- as-of / previous-event join: groupby(key).map_groups over the
  ts-ordered group (the partitioned merge_asof pattern)
- sessionization lives in __ray_entry__.q_events_sessions.
The ordering assumption: per-key processing sorts by (ts, event_id), so
results are independent of input block layout.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd


def tumbling_counts(
    events: rd.Dataset, *, window_sec: int = 3600,
    ts_col: str = "ts", type_col: str = "event_type", value_col: str = "value",
) -> rd.Dataset:
    """(event_type, window_start_epoch, n, sum_value) per tumbling window.

    Partial per-batch aggregates shuffle only O(#types x #windows) rows,
    merged by a hash(window)-bucketed vectorized fold — the number of
    windows grows with the time range, so a raw groupby([type, w])
    would hit Ray's per-group dispatch (hashing.any_key_partition).
    """
    from raylinkgraph.functions.hashing import partition_of

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        # unit-independent window id (datetime64 columns arrive as [us]
        # from parquet but [ns] from pandas sources; int64 division would
        # silently be ~1000x off for one of them)
        w = (
            (batch[ts_col] - pd.Timestamp(0)) // pd.Timedelta(seconds=window_sec)
        ).astype(np.int64)
        g = batch.assign(w=w).groupby([type_col, "w"], sort=True)
        out = g.agg(n=(value_col, "size"), sv=(value_col, "sum")).reset_index()
        out["__p"] = partition_of(out["w"].to_numpy(np.int64), 32)
        return out

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        agg = (
            g.groupby([type_col, "w"], sort=True)
            .agg(n=("n", "sum"), sum_value=("sv", "sum"))
            .reset_index()
        )
        agg["n"] = agg["n"].astype(np.int64)
        return agg

    return (
        events.map_batches(partial, batch_format="pandas")
        .groupby("__p")
        .map_groups(fold, batch_format="pandas")
    )


def asof_previous_event(
    events: rd.Dataset, *, key_col: str = "user_id",
    ts_col: str = "ts", id_col: str = "event_id",
) -> rd.Dataset:
    """For every event, the same key's immediately-previous event id
    (-1 for the first) — the as-of self-join. ONE hash(key)-bucketed
    shuffle; inside a bucket every key's rows are contiguous after one
    (key, ts, id) sort, so the previous-id is a single vectorized shift
    with run starts masked to -1 (never a per-key Python dispatch)."""
    from raylinkgraph.functions.hashing import partition_of

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["__p"] = partition_of(b[key_col].to_numpy(np.int64), 32)
        return b

    def prev(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, ts_col, id_col])
        ids = g[id_col].to_numpy(np.int64)
        keys = g[key_col].to_numpy(np.int64)
        prev_ids = np.r_[-1, ids[:-1]]
        prev_ids[np.r_[True, keys[1:] != keys[:-1]]] = -1
        return pd.DataFrame({id_col: ids, "prev_event_id": prev_ids})

    return (
        events.map_batches(tag, batch_format="pandas")
        .groupby("__p")
        .map_groups(prev, batch_format="pandas")
    )


def interval_join(
    ds: rd.Dataset,
    intervals: pd.DataFrame,
    val_col: str,
    lo_col: str,
    hi_col: str,
    *,
    band_width: float | None = None,
) -> rd.Dataset:
    """Range join: every (row, interval) pair with lo <= val < hi
    (half-open; intervals may OVERLAP, so a row can match several).
    Output: the row's columns + the interval's columns.

    The banded-broadcast pattern for the common small-interval-side
    case (calendar windows, price bands): intervals are replicated
    driver-side into fixed-width bands and the band -> candidate index
    is ray.put ONCE; each batch groups its rows by band and compares
    only against that band's candidates — no shuffle at all, and per
    row the comparison set is the band's intervals, not all of them.
    An interval side too large to broadcast should first be reduced
    (coarser bands + per-band files) — not this entry point.
    """
    import ray

    ivs = intervals.reset_index(drop=True)
    lo = ivs[lo_col].to_numpy(np.float64)
    hi = ivs[hi_col].to_numpy(np.float64)
    if band_width is None:
        band_width = float(np.median(hi - lo)) if len(ivs) else 0.0
    W = float(band_width)
    if not W > 0 or not np.isfinite(W):
        # all-zero-length intervals (or an empty frame) give W=0 and
        # floor(v/0) -> inf bands; fail loudly (advisor round-3)
        raise ValueError(
            f"interval_join band_width must be finite and > 0, got {W}; "
            "pass band_width= explicitly when intervals are zero-length"
        )
    band_lo = np.floor(lo / W).astype(np.int64)
    # hi is exclusive: a zero-length or exact-boundary interval must not
    # leak into the next band
    band_hi = np.floor(np.nextafter(hi, -np.inf) / W).astype(np.int64)
    index: dict[int, np.ndarray] = {}
    for i in range(len(ivs)):
        for b in range(band_lo[i], band_hi[i] + 1):
            index.setdefault(b, []).append(i)
    index = {b: np.array(v, np.int64) for b, v in index.items()}
    ref = ray.put((index, lo, hi, ivs))

    class Probe:
        def __init__(self):
            self.index, self.lo, self.hi, self.ivs = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            v = batch[val_col].to_numpy(np.float64)
            bands = np.floor(v / W).astype(np.int64)
            row_idx, iv_idx = [], []
            for b in np.unique(bands):
                cand = self.index.get(int(b))
                if cand is None:
                    continue
                rows = np.flatnonzero(bands == b)
                m = (v[rows, None] >= self.lo[cand][None, :]) & (
                    v[rows, None] < self.hi[cand][None, :]
                )
                r, c = np.nonzero(m)
                row_idx.append(rows[r])
                iv_idx.append(cand[c])
            if not row_idx:
                out = batch.iloc[:0].copy()
                for c in self.ivs.columns:
                    out[c] = pd.Series([], dtype=self.ivs[c].dtype)
                return out
            ri = np.concatenate(row_idx)
            ci = np.concatenate(iv_idx)
            out = batch.iloc[ri].reset_index(drop=True)
            for c in self.ivs.columns:
                out[c] = self.ivs[c].to_numpy()[ci]
            return out

    return ds.map_batches(Probe, batch_format="pandas", concurrency=(1, 8))


def sliding_window_count(
    events: rd.Dataset,
    *,
    window_sec: int,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    buckets: int = 32,
) -> rd.Dataset:
    """Per-event trailing-window count -> (id, w_count): how many of the
    same key's events have ts in [ts_i - window, ts_i] (SQL RANGE frame
    `RANGE BETWEEN INTERVAL x PRECEDING AND CURRENT ROW` — ties in ts
    all count, matching RANGE, not ROWS, semantics).

    ONE hash(key)-bucketed shuffle; inside a bucket one (key, ts) sort
    makes every key a contiguous run, and the window count is two
    vectorized searchsorted calls per run — no per-key dispatch.
    """
    from raylinkgraph.functions.hashing import partition_of

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["__p"] = partition_of(b[key_col].to_numpy(np.int64), buckets)
        return b

    def count(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, ts_col, id_col])
        keys = g[key_col].to_numpy(np.int64)
        ts = g[ts_col].to_numpy("datetime64[us]").astype(np.int64)
        ids = g[id_col].to_numpy(np.int64)
        out = np.empty(len(g), np.int64)
        starts = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]])
        ends = np.r_[starts[1:], len(keys)]
        w = np.int64(window_sec) * 1_000_000
        for lo, hi in zip(starts, ends):
            t = ts[lo:hi]
            out[lo:hi] = (
                np.searchsorted(t, t, side="right")
                - np.searchsorted(t, t - w, side="left")
            )
        return pd.DataFrame({id_col: ids, "w_count": out})

    return (
        events.map_batches(tag, batch_format="pandas")
        .groupby("__p")
        .map_groups(count, batch_format="pandas")
    )


def funnel_steps(
    events: rd.Dataset,
    steps: list[str],
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    buckets: int = 64,
) -> rd.Dataset:
    """Ordered-funnel analysis: for each user, the earliest time each
    funnel step completes, where step k must occur STRICTLY AFTER the
    completion of step k-1 (the standard product-analytics funnel; at
    web scale the same shape computes crawl-frontier progressions).

    -> (user_id, depth, t0_us, t1_us, ... ) with epoch-microsecond int64
    completion times (-1 = step never reached). One bucketed shuffle on
    hash(user); per-group work is a vectorized min-scan per step, so the
    cost is O(rows) regardless of funnel length. Exact integer output —
    no float quantization needed for oracle parity.
    """
    from raylinkgraph.functions.hashing import partition_of

    tcols = [f"t{i}_us" for i in range(len(steps))]

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        m = batch[type_col].isin(steps)
        b = batch.loc[m, [user_col, ts_col, type_col]].copy()
        uid = b[user_col].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "uid": uid,
                "ts_us": (b[ts_col] - pd.Timestamp(0))
                // pd.Timedelta(microseconds=1),
                "step": b[type_col].map({s: i for i, s in enumerate(steps)}),
                "__b": partition_of(uid, buckets),
            }
        )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        # Vectorized step chain: len(steps) passes of (mask -> per-user
        # min), no per-user Python loop — O(steps x rows) regardless of
        # user count in the bucket.
        uid = g["uid"].to_numpy(np.int64)
        ts = g["ts_us"].to_numpy(np.int64)
        st = g["step"].to_numpy(np.int64)
        users = np.unique(uid)
        code = np.searchsorted(users, uid)
        nu = len(users)
        times = np.full((len(steps), nu), -1, np.int64)
        prev = np.full(nu, -1, np.int64)
        for i in range(len(steps)):
            m = st == i
            if i > 0:
                # step i must follow a REACHED step i-1 strictly in time
                m &= (prev[code] >= 0) & (ts > prev[code])
            if m.any():
                t = np.full(nu, np.iinfo(np.int64).max, np.int64)
                np.minimum.at(t, code[m], ts[m])
                hit = t != np.iinfo(np.int64).max
                times[i, hit] = t[hit]
            prev = times[i]
        depth = (times >= 0).sum(axis=0).astype(np.int64)
        # depth counts the contiguous reached prefix by construction
        cols = {"user_id": users, "depth": depth}
        for i, c in enumerate(tcols):
            cols[c] = times[i]
        return pd.DataFrame(cols)

    return (
        events.map_batches(tag, batch_format="pandas")
        .groupby("__b")
        .map_groups(fold, batch_format="pandas")
    )


def user_gap_stats(
    events: rd.Dataset,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    buckets: int = 64,
) -> rd.Dataset:
    """Per-user inter-event-time statistics over the ts-sorted stream:
    (user_id, n, span_us, max_gap_us) — all exact int64 (epoch-microsecond
    arithmetic), so the DuckDB LAG-window oracle matches bit-for-bit.
    One bucketed shuffle on hash(user); per-group work is sort + diff.
    Duplicate timestamps are fine: the multiset of consecutive gaps of a
    sorted multiset is order-invariant.
    """
    from raylinkgraph.functions.hashing import partition_of

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        uid = batch[user_col].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "uid": uid,
                "ts_us": (batch[ts_col] - pd.Timestamp(0))
                // pd.Timedelta(microseconds=1),
                "__b": partition_of(uid, buckets),
            }
        )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        # One lexsort + segment scan: no per-user Python loop.
        uid = g["uid"].to_numpy(np.int64)
        ts = g["ts_us"].to_numpy(np.int64)
        order = np.lexsort((ts, uid))
        uid, ts = uid[order], ts[order]
        is_new = np.r_[True, np.diff(uid) != 0]
        users = uid[is_new]
        code = np.cumsum(is_new) - 1
        n = np.bincount(code)
        first = ts[is_new]
        last = ts[np.r_[is_new[1:], True]]
        gaps = np.diff(ts)
        within = ~is_new[1:]  # gap belongs to a user iff no boundary
        max_gap = np.zeros(len(users), np.int64)
        if within.any():
            np.maximum.at(max_gap, code[1:][within], gaps[within])
        return pd.DataFrame(
            {
                "user_id": users,
                "n": n.astype(np.int64),
                "span_us": last - first,
                "max_gap_us": max_gap,
            }
        )

    return (
        events.map_batches(tag, batch_format="pandas")
        .groupby("__b")
        .map_groups(fold, batch_format="pandas")
    )


def retention_cohorts(
    events: rd.Dataset,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    buckets: int = 64,
) -> rd.Dataset:
    """Cohort retention triangle: users grouped by first active day
    (cohort), counted on each later active day offset — the standard
    product-analytics retention table. -> (cohort_day, offset_days,
    n_users), all exact int64 (days since epoch / day diffs).

    Two bucketed exchanges: hash(user) dedups (user, day) pairs and
    derives each user's cohort with a segment-min scan (a user's rows
    co-locate, so the min is exact); hash(cohort) folds the pre-combined
    per-bucket counts. Nothing is broadcast; day cardinality is bounded
    by the time range, user cardinality never leaves its bucket.
    """
    from raylinkgraph.functions.hashing import partition_of

    US_PER_DAY = 86_400_000_000

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        uid = batch[user_col].to_numpy(np.int64)
        day = (
            (batch[ts_col] - pd.Timestamp(0)) // pd.Timedelta(microseconds=1)
        ).to_numpy(np.int64) // US_PER_DAY
        df = pd.DataFrame({"uid": uid, "day": day}).drop_duplicates()
        df["__b"] = partition_of(df["uid"].to_numpy(np.int64), buckets)
        return df

    def fold_users(g: pd.DataFrame) -> pd.DataFrame:
        uid = g["uid"].to_numpy(np.int64)
        day = g["day"].to_numpy(np.int64)
        order = np.lexsort((day, uid))
        uid, day = uid[order], day[order]
        keep = np.r_[True, (np.diff(uid) != 0) | (np.diff(day) != 0)]
        uid, day = uid[keep], day[keep]
        is_new = np.r_[True, np.diff(uid) != 0]
        seg_len = np.diff(np.r_[np.flatnonzero(is_new), len(uid)])
        cohort = np.repeat(day[is_new], seg_len)  # first day = sorted min
        out = (
            pd.DataFrame({"cohort_day": cohort, "offset_days": day - cohort})
            .groupby(["cohort_day", "offset_days"], sort=True)
            .size()
            .reset_index(name="n_users")
        )
        out["__b"] = partition_of(out["cohort_day"].to_numpy(np.int64), buckets)
        return out

    def fold_counts(g: pd.DataFrame) -> pd.DataFrame:
        out = (
            g.groupby(["cohort_day", "offset_days"], sort=True)["n_users"]
            .sum()
            .reset_index()
        )
        return out.astype(np.int64)

    return (
        events.map_batches(tag, batch_format="pandas")
        .groupby("__b")
        .map_groups(fold_users, batch_format="pandas")
        .groupby("__b")
        .map_groups(fold_counts, batch_format="pandas")
    )


def type_transitions(
    events: rd.Dataset,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    buckets: int = 64,
) -> pd.DataFrame:
    """First-order Markov transition counts of the per-user event-type
    sequence -> (prev_type, event_type, n): the bigram model of event
    streams (sessionized behavior modeling, next-event prediction
    features). One bucketed shuffle on hash(user); inside each bucket a
    single lexsort + shifted-pair segment scan (no per-user loop) emits
    partial counts over the BOUNDED type-pair key space, folded on the
    driver (<= |types|^2 * buckets tiny rows). Ordering is (ts, id) so
    ties are deterministic; exact integer counts — the DuckDB LAG
    oracle matches bit-for-bit."""
    from raylinkgraph.functions.hashing import partition_of

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        uid = batch[user_col].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "uid": uid,
                "ts_us": (batch[ts_col] - pd.Timestamp(0))
                // pd.Timedelta(microseconds=1),
                "eid": batch[id_col].to_numpy(np.int64),
                "et": batch[type_col],
                "__b": partition_of(uid, buckets),
            }
        )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        uid = g["uid"].to_numpy(np.int64)
        order = np.lexsort(
            (g["eid"].to_numpy(np.int64), g["ts_us"].to_numpy(np.int64), uid)
        )
        uid = uid[order]
        et = g["et"].to_numpy(dtype=object)[order]
        within = uid[1:] == uid[:-1]
        pairs = pd.DataFrame(
            {"prev_type": et[:-1][within], "event_type": et[1:][within]}
        )
        return (
            pairs.groupby(["prev_type", "event_type"], sort=False)
            .size().rename("n").reset_index()
        )

    parts = (
        events.map_batches(tag, batch_format="pandas")
        .groupby("__b")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
    )
    out = (
        parts.groupby(["prev_type", "event_type"], sort=True)["n"]
        .sum().reset_index()
    )
    out["n"] = out["n"].astype(np.int64)
    return out
