"""Sequence packing: concat-then-chunk training-prep layout.

The standard LLM pre-training step (GPT-3 / T5 style "example packing"):
documents are concatenated in a fixed deterministic order (doc_id) and
the token stream is cut into fixed-``budget`` packs; each document gets
its global token start offset, its pack id, and how many packs it spans.

The interesting engine piece is the GLOBAL ORDERED PREFIX SCAN over a
distributed dataset — expressed as the classic two-level scan:

  1. range-partition on doc_id (contiguous id ranges, so within-range
     order + cross-range order compose to the global order);
  2. per-range token totals (one tiny R-row table) -> exclusive prefix
     offsets on the driver (R scalars, not data rows);
  3. per-range fold: sort by doc_id, local cumsum + the range's base
     offset, emit final columns.

Nothing corpus-sized touches the driver; the text is scanned twice
(cheap regex token count) instead of materializing an O(corpus)
intermediate. Tokenization matches token_counts (maximal non-whitespace
runs, SQL ``regexp_extract_all(text, '\\S+')`` parity).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

_TOKEN_RE = r"\S+"


def pack_sequences(
    docs: rd.Dataset,
    *,
    budget: int = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
    ranges: int = 32,
) -> rd.Dataset:
    """-> (doc_id, n_tokens, offset, pack_id, n_packs) for every doc.

    offset  = sum of n_tokens over all docs with smaller doc_id
    pack_id = offset // budget (the pack the doc STARTS in)
    n_packs = how many budget-sized packs the doc touches
    """
    B = int(budget)

    def counts(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                id_col: batch[id_col].to_numpy(np.int64),
                "n_tokens": batch[text_col].str.count(_TOKEN_RE).astype(np.int64),
            }
        )

    # pass 1: id bounds (2 scalars) to fix the contiguous range split —
    # id-column-only projection, no text touched
    bounds = (
        docs.select_columns([id_col])
        .map_batches(
            lambda b: pd.DataFrame({"lo": [b[id_col].min()], "hi": [b[id_col].max()]})
            if len(b)
            else pd.DataFrame({"lo": pd.Series([], dtype=np.int64),
                               "hi": pd.Series([], dtype=np.int64)}),
            batch_format="pandas",
        )
        .to_pandas()
    )
    if not len(bounds):
        return rd.from_pandas(
            pd.DataFrame({id_col: pd.Series([], dtype=np.int64),
                          "n_tokens": pd.Series([], dtype=np.int64),
                          "offset": pd.Series([], dtype=np.int64),
                          "pack_id": pd.Series([], dtype=np.int64),
                          "n_packs": pd.Series([], dtype=np.int64)})
        )
    lo, hi = int(bounds["lo"].min()), int(bounds["hi"].max())
    span = max((hi - lo) // int(ranges) + 1, 1)

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["__r"] = ((b[id_col].to_numpy(np.int64) - lo) // span).astype(np.int32)
        return b

    # pass 2: per-range totals -> exclusive base offsets (R scalars)
    totals = (
        docs.map_batches(counts, batch_format="pandas")
        .map_batches(tag, batch_format="pandas")
        .map_batches(
            lambda b: b.groupby("__r", as_index=False)["n_tokens"].sum(),
            batch_format="pandas",
        )
        .to_pandas()
    )
    totals = totals.groupby("__r")["n_tokens"].sum()
    base = np.zeros(int(ranges) + 1, np.int64)
    for r, s in totals.items():
        base[int(r)] = int(s)
    base = np.concatenate([[0], np.cumsum(base)[:-1]])

    # pass 3: in-range ordered scan + final layout
    def finish(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col, kind="mergesort")
        n = g["n_tokens"].to_numpy(np.int64)
        off = base[int(g["__r"].iloc[0])] + np.concatenate([[0], np.cumsum(n)[:-1]])
        pack = off // B
        end_pack = (off + n - 1) // B
        return pd.DataFrame(
            {
                id_col: g[id_col].to_numpy(np.int64),
                "n_tokens": n,
                "offset": off,
                "pack_id": pack,
                "n_packs": end_pack - pack + 1,
            }
        )

    return (
        docs.map_batches(counts, batch_format="pandas")
        .map_batches(tag, batch_format="pandas")
        .groupby("__r")
        .map_groups(finish, batch_format="pandas")
    )
