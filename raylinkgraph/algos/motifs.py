"""Motif counting: rectangles (4-cycles), diamonds, 3-paths, 4-cliques.

References (.gs_conf.yaml:489-569):
- flash_rectangle  apps/flash/subgraph/rectangle.h — unordered 4-cycles
- flash_diamond    apps/flash/subgraph/diamond.h:46-86 — count =
  sum over undirected edges e of C(t_e, 2), t_e = #triangles through e
  (each diamond counted once at its chord edge)
- flash_3_path     apps/flash/subgraph/3-path.h:30-76 — `out` is the
  FULL neighbor set (the first EdgeMapDense inserts every neighbor), and
  each undirected edge is counted once at its rank-lower endpoint:
  total = sum over undirected edges (u, v) of
  (deg(u)-1)(deg(v)-1) - |N(u) ∩ N(v)|. The intersection term summed
  over all edges is 3x the triangle count (each triangle contributes
  its three edges), so total = sum (deg(u)-1)(deg(v)-1) - 3*#triangles
- flash_k_clique   apps/flash/subgraph/k-clique.h:44-93 (k = 4) —
  (deg, id)-oriented recursive counting; here the k=4 instance as a
  triangle ⋈ adjacency ⋈ two semi-joins dataflow

Skew note (rectangles): wedges are expanded apex-side; the (deg, id)
orientation filter keeps a wedge (x, apex, y) only when rank(apex) >
min(rank(x), rank(y)), which counts every 4-cycle exactly once at the
diagonal containing its rank-minimum vertex — no final /2 — and roughly
halves the expansion. A hub apex still pays O(deg^2) pairs (inherent to
exact 4-cycle counting: those wedges all carry codegree mass); the
expansion streams in bounded 4M-pair chunks so memory stays flat, and
wall-clock on a hub is the documented cost bound.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from raylinkgraph.algos.triangles import (
    _vertexstate,
    orient_edges,
    triangle_rows,
    wedge_candidates,
)
from raylinkgraph.functions.hashing import partition_of
from raylinkgraph.stages.graph_build import _atomic_write

_PAIR_CHUNK = 4_000_000


def _annotated_edges_dir(graph, workdir: str) -> str:
    """Write dedges-{pid}.parquet per partition: (src, dst, deg_src,
    deg_dst), src-major dst-sorted — the degree-annotated adjacency the
    rectangle expansion walks. Two shuffles, cached per graph digest."""
    P = graph.P
    graph_dir = graph.graph_dir
    ddir = os.path.join(workdir, "dedges")
    os.makedirs(ddir, exist_ok=True)
    marker = os.path.join(ddir, "_done-" + graph.digest())
    if os.path.exists(marker):
        return ddir

    def tag_dst(batch: pa.Table) -> pa.Table:
        dst = batch.column("dst_id").to_numpy(zero_copy_only=False)
        return batch.append_column("pid", pa.array(partition_of(dst, P), pa.int32()))

    def attach_deg_dst(g: pd.DataFrame) -> pd.DataFrame:
        pid = int(g["pid"].iloc[0])
        oids, deg = _vertexstate(graph_dir, pid)
        dst = g["dst_id"].to_numpy(np.int64)
        g = g[["src_id", "dst_id"]].copy()
        g["deg_dst"] = deg[np.searchsorted(oids, dst)]
        return g

    def tag_src(batch: pa.Table) -> pa.Table:
        src = batch.column("src_id").to_numpy(zero_copy_only=False)
        return batch.append_column("pid", pa.array(partition_of(src, P), pa.int32()))

    def store(g: pd.DataFrame) -> pd.DataFrame:
        pid = int(g["pid"].iloc[0])
        oids, deg = _vertexstate(graph_dir, pid)
        src = g["src_id"].to_numpy(np.int64)
        dst = g["dst_id"].to_numpy(np.int64)
        deg_dst = g["deg_dst"].to_numpy(np.int64)
        deg_src = deg[np.searchsorted(oids, src)]
        order = np.lexsort((dst, src))
        t = pa.table(
            {
                "src": pa.array(src[order], pa.int64()),
                "dst": pa.array(dst[order], pa.int64()),
                "deg_src": pa.array(deg_src[order], pa.int64()),
                "deg_dst": pa.array(deg_dst[order], pa.int64()),
            }
        )
        _atomic_write(t, os.path.join(ddir, f"dedges-{pid:05d}.parquet"))
        return pd.DataFrame({"pid": [pid]})

    present = set(
        graph.edges_ds()
        .map_batches(tag_dst, batch_format="pyarrow")
        .groupby("pid")
        .map_groups(attach_deg_dst, batch_format="pandas")
        .map_batches(tag_src, batch_format="pyarrow")
        .groupby("pid")
        .map_groups(store, batch_format="pandas")
        .to_pandas()["pid"]
        .tolist()
    )
    empty = pa.table(
        {
            "src": pa.array([], pa.int64()),
            "dst": pa.array([], pa.int64()),
            "deg_src": pa.array([], pa.int64()),
            "deg_dst": pa.array([], pa.int64()),
        }
    )
    for pid in range(P):
        if pid not in present:
            _atomic_write(empty, os.path.join(ddir, f"dedges-{pid:05d}.parquet"))
    with open(marker, "w") as f:
        f.write("ok")
    return ddir


def rectangle_count(graph, workdir: str | None = None) -> int:
    """Unordered 4-cycle count (flash_rectangle semantics): every 4-cycle
    is counted once at the diagonal pair {x, y} containing its
    rank-minimum vertex, with apexes restricted to rank > min rank —
    rect = sum over pairs of C(#qualified apexes, 2)."""
    if not graph.meta.get("symmetrize"):
        raise ValueError("rectangle counting requires a symmetrized graph")
    P = graph.P
    if workdir is None:
        workdir = os.path.join(graph.graph_dir, "motifs")
    ddir = _annotated_edges_dir(graph, workdir)

    def wedges(batch: pa.Table):
        empty = pa.table(
            {"u": pa.array([], pa.int64()), "w": pa.array([], pa.int64()),
             "b": pa.array([], pa.int32())}
        )
        out_any = False
        for pid in batch.column("id").to_pylist():
            t = pq.read_table(os.path.join(ddir, f"dedges-{int(pid):05d}.parquet"))
            src = t.column("src").to_numpy(zero_copy_only=False)
            dst = t.column("dst").to_numpy(zero_copy_only=False)
            dsrc = t.column("deg_src").to_numpy(zero_copy_only=False)
            ddst = t.column("deg_dst").to_numpy(zero_copy_only=False)
            if len(src) == 0:
                continue
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
            for lo in range(0, total, _PAIR_CHUNK):
                hi = min(lo + _PAIR_CHUNK, total)
                f, s = first[lo:hi], second[lo:hi]
                x, y = dst[f], dst[s]
                dx, dy = ddst[f], ddst[s]
                da, apex = dsrc[f], src[f]
                # rank-min endpoint of the pair under (deg, id)
                x_is_min = (dx < dy) | ((dx == dy) & (x < y))
                dm = np.where(x_is_min, dx, dy)
                m = np.where(x_is_min, x, y)
                # keep the wedge iff rank(apex) > rank(min endpoint)
                keep = (da > dm) | ((da == dm) & (apex > m))
                if not keep.any():
                    continue
                u = np.minimum(x[keep], y[keep])
                w = np.maximum(x[keep], y[keep])
                out_any = True
                yield pa.table(
                    {
                        "u": pa.array(u, pa.int64()),
                        "w": pa.array(w, pa.int64()),
                        "b": pa.array(partition_of(u, P), pa.int32()),
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
    return int(parts["pairs"].sum())


def diamond_count(graph, workdir: str) -> int:
    """Diamonds (4-cycle + chord): sum over undirected edges of
    C(#triangles through the edge, 2). Triangle enumeration is the
    oriented 3-join; per-edge folding is one more shuffle."""
    P = graph.P
    tri = triangle_rows(graph, workdir)

    def edge_keys(batch: pa.Table):
        a = batch.column("a").to_numpy(zero_copy_only=False)
        x = batch.column("x").to_numpy(zero_copy_only=False)
        y = batch.column("y").to_numpy(zero_copy_only=False)
        # three edges per triangle, canonical (min, max) by oid
        e1 = np.concatenate([a, a, x])
        e2 = np.concatenate([x, y, y])
        u = np.minimum(e1, e2)
        w = np.maximum(e1, e2)
        return pa.table(
            {
                "u": pa.array(u, pa.int64()),
                "w": pa.array(w, pa.int64()),
                "b": pa.array(partition_of(u, P), pa.int32()),
            }
        )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby(["u", "w"]).size().to_numpy(np.int64)
        return pd.DataFrame({"d": [np.int64((c * (c - 1) // 2).sum())]})

    parts = (
        tri.map_batches(edge_keys, batch_format="pyarrow")
        .groupby("b")
        .map_groups(fold, batch_format="pandas")
    ).to_pandas()
    return int(parts["d"].sum())


def three_path_count(graph, workdir: str) -> int:
    """flash_3_path total: sum over undirected edges of
    (deg(u)-1)(deg(v)-1) - 3 * #triangles (see module doc for the
    identity). The degree product needs no shuffle at all: the
    degree-annotated directed edge files carry both endpoint degrees, and
    the directed sum is exactly twice the undirected sum."""
    P = graph.P
    ddir = _annotated_edges_dir(graph, workdir)

    def pair_sums(batch: pa.Table) -> pa.Table:
        out = []
        for pid in batch.column("id").to_pylist():
            t = pq.read_table(
                os.path.join(ddir, f"dedges-{int(pid):05d}.parquet"),
                columns=["deg_src", "deg_dst"],
            )
            ds = t.column("deg_src").to_numpy(zero_copy_only=False)
            dd = t.column("deg_dst").to_numpy(zero_copy_only=False)
            out.append(int(((ds - 1) * (dd - 1)).sum()))
        return pa.table({"s": pa.array(out, pa.int64())})

    parts = rd.range(P, override_num_blocks=P).map_batches(
        pair_sums, batch_format="pyarrow"
    ).to_pandas()
    pair_sum = int(parts["s"].sum()) // 2  # directed = 2x undirected

    tri_total = triangle_rows(graph, workdir).count()
    return pair_sum - 3 * int(tri_total)


def k_clique4_count(graph, workdir: str) -> int:
    """4-clique count: oriented triangles (a < x < y by (deg, id)) are
    extended with y's up-neighbors d, then the (x, d) and (a, d) edges
    are confirmed with two partitioned semi-joins. Each 4-clique is
    counted exactly once at its rank-sorted vertex order."""
    P = graph.P
    oriented_dir = orient_edges(graph, workdir)
    tri = triangle_rows(graph, workdir)

    def key_y(batch: pa.Table) -> pa.Table:
        y = batch.column("y").to_numpy(zero_copy_only=False)
        return batch.append_column("b", pa.array(partition_of(y, P), pa.int32()))

    def extend(g: pd.DataFrame) -> pd.DataFrame:
        pid = int(g["b"].iloc[0])
        o = pq.read_table(
            os.path.join(oriented_dir, f"oriented-{pid:05d}.parquet"),
            columns=["src", "dst"],
        ).to_pandas()
        hit = g.merge(o.rename(columns={"src": "y", "dst": "d"}), on="y")
        return hit[["a", "x", "y", "d"]] if len(hit) else pd.DataFrame(
            {c: pd.Series([], dtype=np.int64) for c in ("a", "x", "y", "d")}
        )

    def key_x(batch: pa.Table) -> pa.Table:
        x = batch.column("x").to_numpy(zero_copy_only=False)
        return batch.append_column("b2", pa.array(partition_of(x, P), pa.int32()))

    def check_xd(g: pd.DataFrame) -> pd.DataFrame:
        pid = int(g["b2"].iloc[0])
        o = pq.read_table(
            os.path.join(oriented_dir, f"oriented-{pid:05d}.parquet"),
            columns=["src", "dst"],
        ).to_pandas()
        hit = g.merge(o.rename(columns={"src": "x", "dst": "d"}), on=["x", "d"])
        return hit[["a", "d"]] if len(hit) else pd.DataFrame(
            {c: pd.Series([], dtype=np.int64) for c in ("a", "d")}
        )

    def key_a(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy(zero_copy_only=False)
        return batch.append_column("b3", pa.array(partition_of(a, P), pa.int32()))

    def check_ad(g: pd.DataFrame) -> pd.DataFrame:
        pid = int(g["b3"].iloc[0])
        o = pq.read_table(
            os.path.join(oriented_dir, f"oriented-{pid:05d}.parquet"),
            columns=["src", "dst"],
        ).to_pandas()
        hit = g.merge(o.rename(columns={"src": "a", "dst": "d"}), on=["a", "d"])
        return pd.DataFrame({"n": [np.int64(len(hit))]})

    parts = (
        tri.map_batches(key_y, batch_format="pyarrow")
        .groupby("b")
        .map_groups(extend, batch_format="pandas")
        .map_batches(key_x, batch_format="pyarrow")
        .groupby("b2")
        .map_groups(check_xd, batch_format="pandas")
        .map_batches(key_a, batch_format="pyarrow")
        .groupby("b3")
        .map_groups(check_ad, batch_format="pandas")
    ).to_pandas()
    return int(parts["n"].sum())
