"""Resumable partitioned Parquet sink.

The scale rule for 100TB outputs: write one directory per partition
(hash bucket of a key column), each committed ATOMICALLY with a marker,
so a killed job's rerun skips finished partitions instead of rewriting
the world. The BSP engines' per-superstep checkpoints
(state/checkpoint.py) give this to iterative state; this module gives
the same contract to any Dataset sink (curated corpora, edge tables,
dedup keep lists).

Layout under ``out_dir``:

    part=<k>/data.parquet     (atomic: tmp file + rename)
    part=<k>/_SUCCESS         (written after data; presence = committed)

One hash-bucket shuffle; each bucket task checks its own marker BEFORE
doing any work, so a rerun's cost is proportional to the UNFINISHED
remainder. Buckets are deterministic in the key (splitmix64 / crc32),
so reruns land on identical partitions at any parallelism.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd


def resumable_write(
    ds: rd.Dataset,
    out_dir: str,
    key_col: str,
    *,
    buckets: int = 64,
) -> pd.DataFrame:
    """Write ``ds`` under ``out_dir`` in ``buckets`` hash-partitioned,
    individually-committed parquet directories -> manifest DataFrame
    (part, n_rows, skipped). Reruns skip committed partitions."""
    from raylinkgraph.functions.hashing import any_key_partition

    os.makedirs(out_dir, exist_ok=True)

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch.copy()
        b["__part"] = any_key_partition(b[key_col].to_numpy(), buckets)
        return b

    def write_part(g: pd.DataFrame) -> pd.DataFrame:
        part = int(g["__part"].iloc[0])
        pdir = os.path.join(out_dir, f"part={part}")
        marker = os.path.join(pdir, "_SUCCESS")
        if os.path.exists(marker):
            return pd.DataFrame(
                {"part": [part], "n_rows": [0], "skipped": [1]}
            )
        os.makedirs(pdir, exist_ok=True)
        body = g.drop(columns="__part").sort_values(key_col)
        tmp = os.path.join(pdir, ".data.parquet.tmp")
        pq.write_table(
            pa.Table.from_pandas(body, preserve_index=False), tmp
        )
        os.replace(tmp, os.path.join(pdir, "data.parquet"))
        with open(marker, "w") as f:
            f.write("ok\n")
        return pd.DataFrame(
            {"part": [part], "n_rows": [len(body)], "skipped": [0]}
        )

    manifest = (
        ds.map_batches(tag, batch_format="pandas")
        .groupby("__part")
        .map_groups(write_part, batch_format="pandas")
        .to_pandas()
    )
    return (
        manifest.astype({"part": np.int64, "n_rows": np.int64, "skipped": np.int64})
        .sort_values("part")
        .reset_index(drop=True)
    )


def read_resumable(out_dir: str) -> rd.Dataset:
    """Read back ONLY the committed partitions of a resumable_write
    layout (uncommitted tmp/partials are invisible by construction)."""
    parts = sorted(
        os.path.join(out_dir, d, "data.parquet")
        for d in os.listdir(out_dir)
        if d.startswith("part=")
        and os.path.exists(os.path.join(out_dir, d, "_SUCCESS"))
    )
    if not parts:
        raise FileNotFoundError(f"no committed partitions under {out_dir}")
    # partitioning=None: don't re-infer the hive-style part=<k> dir as a
    # data column — the bucket id is layout, not data
    return rd.read_parquet(parts, partitioning=None)
