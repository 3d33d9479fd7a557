"""Motif counting: rectangles (4-cycles).

Reference: flash_rectangle (.gs_conf.yaml:489-569,
apps/flash/subgraph/rectangle.h). Count of unordered 4-cycles:

  rect = (1/2) * sum over unordered pairs {u, w} of C(codeg(u, w), 2)

where codeg = |N(u) ∩ N(w)| — each 4-cycle u-a-w-b-u is counted once per
diagonal pair ({u,w} and {a,b}), hence the /2. Dataflow: per-partition
wedge expansion (the edge files are src-sorted, so a vertex's adjacency
is a contiguous segment — same vectorized pair kernel as triangles),
then one groupby shuffle on hash(u) to sum codegrees and fold
C(codeg, 2) partials; only P partial rows reach the driver."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from raylinkgraph.functions.hashing import partition_of


def rectangle_count(graph) -> int:
    if not graph.meta.get("symmetrize"):
        raise ValueError("rectangle counting requires a symmetrized graph")
    P = graph.P
    graph_dir = graph.graph_dir

    def wedges(batch: pa.Table):
        empty = pa.table(
            {"u": pa.array([], pa.int64()), "w": pa.array([], pa.int64()),
             "b": pa.array([], pa.int32())}
        )
        out_any = False
        for pid in batch.column("id").to_pylist():
            t = pq.read_table(
                os.path.join(graph_dir, "edges", f"edges-{int(pid):05d}.parquet")
            )
            src = t.column("src_id").to_numpy(zero_copy_only=False)
            dst = t.column("dst_id").to_numpy(zero_copy_only=False)
            if len(src) == 0:
                continue
            # per-apex neighbor pair expansion (u < w by the dst sort)
            is_new = np.r_[True, np.diff(src) != 0]
            starts = np.flatnonzero(is_new)
            seg_of = np.cumsum(is_new) - 1
            seg_len = np.diff(np.r_[starts, len(src)])
            idx = np.arange(len(src)) - starts[seg_of]
            n_partners = seg_len[seg_of] - idx - 1
            total = int(n_partners.sum())
            if total == 0:
                continue
            first = np.repeat(np.arange(len(src)), n_partners)
            base = np.repeat(np.cumsum(n_partners) - n_partners, n_partners)
            off = np.arange(total) - base + 1
            second = first + off
            u, w = dst[first], dst[second]
            chunk = 4_000_000
            for lo in range(0, total, chunk):
                hi = min(lo + chunk, total)
                out_any = True
                yield pa.table(
                    {
                        "u": pa.array(u[lo:hi], pa.int64()),
                        "w": pa.array(w[lo:hi], pa.int64()),
                        "b": pa.array(
                            partition_of(u[lo:hi], P), pa.int32()
                        ),
                    }
                )
        if not out_any:
            yield empty

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby(["u", "w"]).size().to_numpy(np.int64)
        return pd.DataFrame({"pairs": [np.int64((c * (c - 1) // 2).sum())]})

    parts = (
        rd.range(P, override_num_blocks=P)
        .map_batches(wedges, batch_format="pyarrow")
        .groupby("b")
        .map_groups(fold, batch_format="pandas")
    ).to_pandas()
    return int(parts["pairs"].sum()) // 2
