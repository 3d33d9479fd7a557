"""Semi-structured (JSON) column operators.

The reference's property-graph loaders accept per-row JSON attribute
payloads (SURVEY.md §2.3 loader surface); at web scale the standard form
is a string column of small JSON objects riding next to typed columns.
The engine rule: scalar-field extraction is a compiled-regex vectorized
kernel inside map_batches — never json.loads per Python row in the hot
path. (A full nested parser belongs in an actor-pool stage; scalar
probes cover the overwhelmingly common flatten-then-aggregate case.)
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import ray.data as rd


def json_int_field_stats(
    events: rd.Dataset,
    *,
    field: str = "k",
    json_col: str = "props",
    group_col: str = "event_type",
) -> rd.Dataset:
    """Extract an integer field from a JSON-string column and aggregate
    per group -> (group, n, n_with_field, sum_v, min_v, max_v).

    Scale shape: per-batch partials (one row per group per batch) feed a
    groupby over the BOUNDED group key; the JSON column never shuffles.
    SQL parity: CAST(json_extract(props, '$.field') AS BIGINT).
    """
    pat = re.compile(r'"' + re.escape(field) + r'"\s*:\s*(-?\d+)')

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        v = b[json_col].str.extract(pat, expand=False)
        has = v.notna()
        vi = pd.to_numeric(v, errors="coerce")
        g = pd.DataFrame({group_col: b[group_col], "has": has, "v": vi})
        out = g.groupby(group_col, sort=False).agg(
            n=("has", "size"),
            n_with_field=("has", "sum"),
            sum_v=("v", "sum"),
            min_v=("v", "min"),
            max_v=("v", "max"),
        ).reset_index()
        return out

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        key = g[group_col].iloc[0]
        return pd.DataFrame(
            {
                group_col: [key],
                "n": [np.int64(g["n"].sum())],
                "n_with_field": [np.int64(g["n_with_field"].sum())],
                "sum_v": [np.int64(g["sum_v"].sum())],
                "min_v": [np.int64(g["min_v"].min())],
                "max_v": [np.int64(g["max_v"].max())],
            }
        )

    return (
        events.map_batches(partial, batch_format="pandas")
        .groupby(group_col)
        .map_groups(fold, batch_format="pandas")
    )
