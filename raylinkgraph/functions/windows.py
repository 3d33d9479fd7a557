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

    Partial per-batch aggregates shuffle only O(#types x #windows) rows.
    """

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        # unit-independent window id (datetime64 columns arrive as [us]
        # from parquet but [ns] from pandas sources; int64 division would
        # silently be ~1000x off for one of them)
        w = (
            (batch[ts_col] - pd.Timestamp(0)) // pd.Timedelta(seconds=window_sec)
        ).astype(np.int64)
        g = batch.assign(w=w).groupby([type_col, "w"], sort=True)
        out = g.agg(n=(value_col, "size"), sv=(value_col, "sum")).reset_index()
        return out

    from ray.data.aggregate import Sum

    return (
        events.map_batches(partial, batch_format="pandas")
        .groupby([type_col, "w"])
        .aggregate(Sum("n", alias_name="n"), Sum("sv", alias_name="sum_value"))
    )


def asof_previous_event(
    events: rd.Dataset, *, key_col: str = "user_id",
    ts_col: str = "ts", id_col: str = "event_id",
) -> rd.Dataset:
    """For every event, the same key's immediately-previous event id
    (-1 for the first) — the as-of self-join, one shuffle on the key,
    per-group sort by (ts, id)."""

    def prev(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts_col, id_col])
        prev_ids = np.r_[-1, g[id_col].to_numpy(np.int64)[:-1]]
        return pd.DataFrame(
            {
                id_col: g[id_col].to_numpy(np.int64),
                "prev_event_id": prev_ids,
            }
        )

    return events.groupby(key_col).map_groups(prev, batch_format="pandas")
