"""Per-vertex triangle counting: degree-ordered orientation + 3-join dataflow.

Reference: gs::Triangles, analytical_engine/apps/clustering/triangles.h:30-162
— stage 1 keeps neighbor u in v's oriented neighborhood iff deg(u)<deg(v)
or (deg(u)==deg(v) and id(u)<id(v)) (:70-94); stage 2 intersects oriented
lists (:110-139); stage 3 sums counts back (:148-153). The same
orientation here bounds the wedge join (every oriented out-degree is
O(sqrt(E))), our explicit skew guard for super-nodes.

Ray-Data recast (SURVEY.md §2.2 triangles row): all stages are Dataset
shuffles — no broadcast of any O(V) or O(E) structure, so the dataflow
holds at 10^12-edge scale:

  1. attach deg(dst) via groupby(hash(dst) % P)     (one shuffle)
  2. attach deg(src), orient, write oriented-{pid}  (one shuffle)
  3. wedge expansion per oriented adjacency (vectorized pair explosion)
     -> candidates (x, y, apex) keyed by hash(x) % P
  4. groupby + per-partition hash join against the oriented edge set
     -> confirmed triangles -> per-vertex count rows (pre-combined)
  5. groupby(hash(v) % P) sum -> (oid, tricnt) with zeros for the rest

Input must be a symmetrized LinkGraph (its edge files hold both
directions; out_deg == undirected degree).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from raylinkgraph.functions.hashing import partition_of
from raylinkgraph.stages.graph_build import LinkGraph, _atomic_write


def _vertexstate(graph_dir: str, pid: int) -> tuple[np.ndarray, np.ndarray]:
    t = pq.read_table(
        os.path.join(graph_dir, "vertexstate", f"vertexstate-{pid:05d}.parquet")
    )
    return (
        t.column("oid").to_numpy(zero_copy_only=False),
        t.column("out_deg").to_numpy(zero_copy_only=False),
    )


def orient_edges(graph: LinkGraph, workdir: str) -> str:
    """Stages 1+2 of the triangle dataflow (shared by the motif counters):
    orient every undirected edge low->high by (deg, id) and store one
    src-major oriented-{pid}.parquet per partition (neighbors sorted by
    (deg, id) within each source segment). Two shuffles; idempotent per
    workdir. Returns the oriented directory path."""
    if not graph.meta.get("symmetrize"):
        raise ValueError("orientation requires a symmetrized graph")
    P = graph.P
    graph_dir = graph.graph_dir
    odir = os.path.join(workdir, "oriented")
    os.makedirs(odir, exist_ok=True)
    marker = os.path.join(odir, "_done-" + graph.digest())
    if os.path.exists(marker):  # already built for this exact graph
        return odir

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

    def orient_and_store(g: pd.DataFrame) -> pd.DataFrame:
        pid = int(g["pid"].iloc[0])
        oids, deg = _vertexstate(graph_dir, pid)
        src = g["src_id"].to_numpy(np.int64)
        dst = g["dst_id"].to_numpy(np.int64)
        deg_dst = g["deg_dst"].to_numpy(np.int64)
        deg_src = deg[np.searchsorted(oids, src)]
        keep = (deg_src < deg_dst) | ((deg_src == deg_dst) & (src < dst))
        src, dst, deg_dst = src[keep], dst[keep], deg_dst[keep]
        order = np.lexsort((dst, deg_dst, src))  # src-major, nbrs by (deg,id)
        t = pa.table(
            {
                "src": pa.array(src[order], pa.int64()),
                "dst": pa.array(dst[order], pa.int64()),
                "deg_dst": pa.array(deg_dst[order], pa.int64()),
            }
        )
        _atomic_write(t, os.path.join(workdir, "oriented", f"oriented-{pid:05d}.parquet"))
        return pd.DataFrame({"pid": [pid], "n": [len(src)]})

    oriented_counts = (
        graph.edges_ds()
        .map_batches(tag_dst, batch_format="pyarrow")
        .groupby("pid")
        .map_groups(attach_deg_dst, batch_format="pandas")
        .map_batches(tag_src, batch_format="pyarrow")
        .groupby("pid")
        .map_groups(orient_and_store, batch_format="pandas")
    ).to_pandas()
    present = set(oriented_counts["pid"].tolist())
    empty = pa.table(
        {
            "src": pa.array([], pa.int64()),
            "dst": pa.array([], pa.int64()),
            "deg_dst": pa.array([], pa.int64()),
        }
    )
    for pid in range(P):
        if pid not in present:
            _atomic_write(
                empty, os.path.join(workdir, "oriented", f"oriented-{pid:05d}.parquet")
            )
    with open(marker, "w") as f:
        f.write("ok")
    return odir


def wedge_candidates(oriented_dir: str, P: int) -> rd.Dataset:
    """Stage 3: oriented wedge expansion -> (x, y, apex, pid=hash(x)%P)
    rows. Driven per partition FILE (not per map batch): a source's
    adjacency must stay whole for the pair expansion, and batch
    boundaries would split it. Output streams in bounded chunks via a
    generator."""

    def wedges(batch: pa.Table):
        empty = pa.table(
            {
                "x": pa.array([], pa.int64()),
                "y": pa.array([], pa.int64()),
                "apex": pa.array([], pa.int64()),
                "pid": pa.array([], pa.int32()),
            }
        )
        any_out = False
        for pid in batch.column("id").to_pylist():
            t = pq.read_table(
                os.path.join(oriented_dir, f"oriented-{int(pid):05d}.parquet"),
                columns=["src", "dst"],
            )
            src = t.column("src").to_numpy(zero_copy_only=False)
            dst = t.column("dst").to_numpy(zero_copy_only=False)
            if len(src) == 0:
                continue
            # segments of equal src (file is src-major, nbrs (deg,id)-sorted)
            is_new = np.r_[True, np.diff(src) != 0]
            starts = np.flatnonzero(is_new)
            seg_of = np.cumsum(is_new) - 1
            seg_len = np.diff(np.r_[starts, len(src)])
            idx_in_seg = np.arange(len(src)) - starts[seg_of]
            # each element pairs with every later element of its segment
            n_partners = seg_len[seg_of] - idx_in_seg - 1
            total = int(n_partners.sum())
            if total == 0:
                continue
            first = np.repeat(np.arange(len(src)), n_partners)
            base = np.repeat(np.cumsum(n_partners) - n_partners, n_partners)
            off = np.arange(total) - base + 1
            second = first + off
            x, y, apex = dst[first], dst[second], src[first]
            chunk = 4_000_000
            for lo in range(0, total, chunk):
                hi = min(lo + chunk, total)
                any_out = True
                yield pa.table(
                    {
                        "x": pa.array(x[lo:hi], pa.int64()),
                        "y": pa.array(y[lo:hi], pa.int64()),
                        "apex": pa.array(apex[lo:hi], pa.int64()),
                        "pid": pa.array(partition_of(x[lo:hi], P), pa.int32()),
                    }
                )
        if not any_out:
            yield empty

    return rd.range(P, override_num_blocks=P).map_batches(
        wedges, batch_format="pyarrow"
    )


def triangle_rows(graph: LinkGraph, workdir: str) -> rd.Dataset:
    """-> Dataset of confirmed oriented triangles (a, x, y): rank(a) <
    rank(x) < rank(y) under the (deg, id) total order. Each triangle
    appears exactly once. Shared by the diamond / k-clique counters."""
    P = graph.P
    oriented_dir = orient_edges(graph, workdir)

    def confirm(g: pd.DataFrame) -> pd.DataFrame:
        pid = int(g["pid"].iloc[0])
        o = pq.read_table(
            os.path.join(oriented_dir, f"oriented-{pid:05d}.parquet"),
            columns=["src", "dst"],
        ).to_pandas()
        hit = g.merge(
            o.rename(columns={"src": "x", "dst": "y"}), on=["x", "y"], how="inner"
        )
        return pd.DataFrame(
            {"a": hit["apex"].to_numpy(np.int64),
             "x": hit["x"].to_numpy(np.int64),
             "y": hit["y"].to_numpy(np.int64)}
        )

    return (
        wedge_candidates(oriented_dir, P)
        .groupby("pid")
        .map_groups(confirm, batch_format="pandas")
    )


def run_triangles(graph: LinkGraph, workdir: str) -> rd.Dataset:
    """-> Dataset of (oid, tricnt, deg) for every vertex (deg = undirected
    degree, carried so LCC / transitivity stay distributed joins on the
    home partition — nothing O(V) touches the driver)."""
    if not graph.meta.get("symmetrize"):
        raise ValueError("triangles requires a symmetrized graph")
    P = graph.P
    graph_dir = graph.graph_dir
    oriented_dir = orient_edges(graph, workdir)

    # ---- stage 4: semi-join candidates against oriented edges -----------
    def check(g: pd.DataFrame) -> pd.DataFrame:
        pid = int(g["pid"].iloc[0])
        o = pq.read_table(
            os.path.join(oriented_dir, f"oriented-{pid:05d}.parquet"),
            columns=["src", "dst"],
        ).to_pandas()
        hit = g.merge(
            o.rename(columns={"src": "x", "dst": "y"}), on=["x", "y"], how="inner"
        )
        if len(hit) == 0:
            return pd.DataFrame({"v": pd.Series([], dtype=np.int64), "cnt": pd.Series([], dtype=np.int64)})
        vs = np.concatenate(
            [hit["x"].to_numpy(np.int64), hit["y"].to_numpy(np.int64), hit["apex"].to_numpy(np.int64)]
        )
        uv, cnt = np.unique(vs, return_counts=True)
        return pd.DataFrame({"v": uv, "cnt": cnt.astype(np.int64)})

    counts = (
        wedge_candidates(oriented_dir, P)
        .groupby("pid")
        .map_groups(check, batch_format="pandas")
    )

    # ---- stage 5: per-vertex sum + zero-fill ----------------------------
    def tag_v(batch: pa.Table) -> pa.Table:
        v = batch.column("v").to_numpy(zero_copy_only=False)
        return batch.append_column("pid", pa.array(partition_of(v, P), pa.int32()))

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        pid = int(g["pid"].iloc[0])
        g = g[g["v"] >= 0]  # drop marker rows
        oids, deg = _vertexstate(graph_dir, pid)
        agg = g.groupby("v")["cnt"].sum()
        out = np.zeros(len(oids), np.int64)
        pos = np.searchsorted(oids, agg.index.to_numpy(np.int64))
        out[pos] = agg.to_numpy(np.int64)
        return pd.DataFrame({"oid": oids, "tricnt": out, "deg": deg})

    # markers so every partition emits its (possibly all-zero) vertices
    markers = rd.range(P, override_num_blocks=max(1, P // 8)).map_batches(
        lambda b: pa.table(
            {
                "v": pa.array(np.full(len(b), -1), pa.int64()),
                "cnt": pa.array(np.zeros(len(b), np.int64)),
                "pid": pa.array(
                    b.column("id").to_numpy(zero_copy_only=False).astype(np.int32),
                    pa.int32(),
                ),
            }
        ),
        batch_format="pyarrow",
    )

    result = (
        counts.map_batches(tag_v, batch_format="pyarrow")
        .union(markers)
        .groupby("pid")
        .map_groups(finalize, batch_format="pandas")
    )
    return result


def lcc_from_triangles(tri: rd.Dataset) -> rd.Dataset:
    """Local clustering coefficient: lcc = 2*tri / (deg*(deg-1)), deg = the
    undirected degree (reference grape::LCC semantics, SURVEY.md §2.2).
    Pure per-batch column math over run_triangles output — no shuffle."""

    def lcc_batch(batch: pd.DataFrame) -> pd.DataFrame:
        d = batch["deg"].to_numpy(np.float64)
        t = batch["tricnt"].to_numpy(np.float64)
        denom = d * (d - 1)
        lcc = np.divide(2 * t, denom, out=np.zeros(len(batch)), where=denom > 0)
        return pd.DataFrame({"oid": batch["oid"].to_numpy(np.int64), "lcc": lcc})

    return tri.map_batches(lcc_batch, batch_format="pandas")


def clustering_summary(tri: rd.Dataset) -> dict:
    """Global transitivity + average clustering from run_triangles output:
    three scalar aggregates (pre-combined per batch); only 1 row per batch
    reaches the reduce."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        d = batch["deg"].to_numpy(np.float64)
        t = batch["tricnt"].to_numpy(np.float64)
        denom = d * (d - 1)
        lcc = np.divide(2 * t, denom, out=np.zeros(len(batch)), where=denom > 0)
        return pd.DataFrame(
            {
                "closed": [t.sum()],           # = 3 * #triangles per vertex sum
                "triads": [(denom / 2).sum()],
                "lcc_sum": [lcc.sum()],
                "n": [float(len(batch))],
            }
        )

    agg = tri.map_batches(partial, batch_format="pandas").sum(
        ["closed", "triads", "lcc_sum", "n"]
    )
    closed, triads = agg["sum(closed)"], agg["sum(triads)"]
    return {
        "transitivity": (closed / triads) if triads else 0.0,
        "avg_clustering": (agg["sum(lcc_sum)"] / agg["sum(n)"]) if agg["sum(n)"] else 0.0,
    }
