"""Directed / tailed triangle census (the remaining Flash motif family).

References (.gs_conf.yaml:496-540):
- flash_tailed_triangle   apps/flash/subgraph/tailed-triangle.h:40-78 —
  undirected; total = sum over undirected edges e of
  t_e * (deg(u) + deg(v) - 4), halved (each triangle's three edges
  contribute its tail slots twice).
- flash_acyclic_triangle  apps/flash/subgraph/acyclic-triangle.h:40-75 —
  directed; count of triples (u->v, u->x, v->x): sum over edges (u, v)
  of |out(u) ∩ out(v)| (each transitive triangle once, at its apex edge).
- flash_cyclic_triangle   apps/flash/subgraph/cyclic-triangle.h:40-80 —
  directed 3-cycles, each counted once at its rank-max vertex. The
  reference ranks by (deg, id); ANY strict total order yields the same
  count (every 3-cycle has exactly one max), so we rank by id.
- flash_in_triangle       apps/flash/subgraph/in-triangle.h:40-78 —
  sum over unordered reciprocal pairs {u, v} of |out(u) ∩ out(v)|.
- flash_out_triangle      apps/flash/subgraph/out-triangle.h:40-80 —
  sum over unordered reciprocal pairs {u, v} of |in(u) ∩ in(v)|.
- flash_cycle_plus_triangle apps/flash/subgraph/cycle-plus-triangle.h:40-80
  — sum over ORDERED reciprocal pairs (u, v) of |in(u) ∩ out(v)|.

All five directed counts share one dataflow: enumerate candidate pairs
(u, v) from the third vertex x's in/out neighbor lists (vectorized
segment expansion, chunked so a hub x streams in bounded pieces), then
confirm (u, v) against the edge set E or the reciprocal set R with a
partitioned semi-join on hash(u) — no global adjacency, no driver-side
loops. Skew bound: a hub x pays O(in(x)·out(x)) candidate pairs, the
inherent cost of exact directed-triangle counting; chunking keeps the
per-batch memory flat while the pairs stream through the shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from raylinkgraph.functions.hashing import partition_of

_PAIR_CHUNK = 4_000_000

# candidate kinds -> membership set (E = edges, R = ordered reciprocal)
K_ACY, K_CYC, K_IN, K_OUT, K_CP = 0, 1, 2, 3, 4
_E_KINDS = (K_ACY, K_CYC)
_R_KINDS = (K_IN, K_OUT, K_CP)
M_EDGE, M_RECIP = 100, 101


def _dedup_edges(edges: rd.Dataset, P: int) -> rd.Dataset:
    """Distinct directed (u, v), u != v, via one hash(u) shuffle."""

    def tag(batch: pa.Table) -> pa.Table:
        u = batch.column("src_id").to_numpy(zero_copy_only=False)
        v = batch.column("dst_id").to_numpy(zero_copy_only=False)
        keep = u != v
        u, v = u[keep], v[keep]
        return pa.table(
            {
                "u": pa.array(u, pa.int64()),
                "v": pa.array(v, pa.int64()),
                "b": pa.array(partition_of(u, P), pa.int32()),
            }
        )

    def uniq(g: pd.DataFrame) -> pd.DataFrame:
        return g[["u", "v"]].drop_duplicates()

    return (
        edges.map_batches(tag, batch_format="pyarrow")
        .groupby("b")
        .map_groups(uniq, batch_format="pandas")
    )


def _pair_table(u: np.ndarray, v: np.ndarray, kind: int, P: int) -> pa.Table:
    return pa.table(
        {
            "u": pa.array(u, pa.int64()),
            "v": pa.array(v, pa.int64()),
            "kind": pa.array(np.full(len(u), kind, np.int8), pa.int8()),
            "b2": pa.array(partition_of(u, P), pa.int32()),
        }
    )


def _seg_bounds(x_sorted: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    is_new = np.r_[True, np.diff(x_sorted) != 0]
    starts = np.flatnonzero(is_new)
    ends = np.r_[starts[1:], len(x_sorted)]
    return starts, ends


def _cross_chunks(ai: np.ndarray, bi: np.ndarray, starts_a, ends_a, starts_b, ends_b):
    """All (i, j) index pairs of aligned segments (cartesian per segment),
    yielded in bounded chunks. ai/bi are row-index arrays into the two
    sides; segment k spans [starts_a[k], ends_a[k]) and likewise for b."""
    na = ends_a - starts_a
    nb = ends_b - starts_b
    per_seg = na * nb
    total = int(per_seg.sum())
    if total == 0:
        return
    seg_of = np.repeat(np.arange(len(per_seg)), per_seg)
    base = np.repeat(np.cumsum(per_seg) - per_seg, per_seg)
    off = np.arange(total) - base
    i = ai[starts_a[seg_of] + off // nb[seg_of].clip(min=1)]
    j = bi[starts_b[seg_of] + off % nb[seg_of].clip(min=1)]
    for lo in range(0, total, _PAIR_CHUNK):
        yield i[lo : lo + _PAIR_CHUNK], j[lo : lo + _PAIR_CHUNK]


def directed_triangle_census(edges: rd.Dataset, *, P: int = 32) -> dict[str, int]:
    """Five Flash directed-triangle counts in one distributed pass over
    the deduplicated edge table. Returns {acyclic, cyclic, in_tri,
    out_tri, cycle_plus}."""
    E = _dedup_edges(edges, P).materialize()

    # ordered reciprocal pairs: canonical-pair shuffle, both orders kept
    def canon(batch: pa.Table) -> pa.Table:
        u = batch.column("u").to_numpy(zero_copy_only=False)
        v = batch.column("v").to_numpy(zero_copy_only=False)
        a = np.minimum(u, v)
        return pa.table(
            {
                "u": pa.array(u, pa.int64()),
                "v": pa.array(v, pa.int64()),
                "cb": pa.array(partition_of(a, P), pa.int32()),
            }
        )

    def recip(g: pd.DataFrame) -> pd.DataFrame:
        m = g.merge(
            g.rename(columns={"u": "v", "v": "u"})[["u", "v"]], on=["u", "v"]
        )
        return m[["u", "v"]]

    R = (
        E.map_batches(canon, batch_format="pyarrow")
        .groupby("cb")
        .map_groups(recip, batch_format="pandas")
    )

    # adjacency rows keyed by the third vertex x: dir 0 = out(x), 1 = in(x)
    def adj_rows(batch: pa.Table) -> pa.Table:
        u = batch.column("u").to_numpy(zero_copy_only=False)
        v = batch.column("v").to_numpy(zero_copy_only=False)
        x = np.concatenate([u, v])
        n = np.concatenate([v, u])
        d = np.concatenate(
            [np.zeros(len(u), np.int8), np.ones(len(v), np.int8)]
        )
        return pa.table(
            {
                "x": pa.array(x, pa.int64()),
                "n": pa.array(n, pa.int64()),
                "dir": pa.array(d, pa.int8()),
                "xb": pa.array(partition_of(x, P), pa.int32()),
            }
        )

    def expand(g: pd.DataFrame):
        # generator map_batches stage (map_groups can't yield); receives
        # whole hash(x) groups per block, so every x's rows are contiguous
        # after the lexsort below even if Ray coalesces groups
        order = np.lexsort((g["n"].to_numpy(), g["dir"].to_numpy(), g["x"].to_numpy()))
        x = g["x"].to_numpy(np.int64)[order]
        n = g["n"].to_numpy(np.int64)[order]
        d = g["dir"].to_numpy(np.int8)[order]
        out_any = False
        # per x: contiguous [out rows..., in rows...]; the out/in boundary
        # is starts + (# dir==0 rows in the segment), fully vectorized
        starts, ends = _seg_bounds(x)
        seg_of = np.cumsum(np.r_[True, np.diff(x) != 0]) - 1
        cnt0 = np.bincount(seg_of[d == 0], minlength=len(starts))
        out_s, out_e = starts, starts + cnt0
        in_s, in_e = out_e, ends
        idx = np.arange(len(x))

        # in×in ordered pairs -> ACY (all u != v) and IN (u > v)
        for i, j in _cross_chunks(idx, idx, in_s, in_e, in_s, in_e):
            u, v = n[i], n[j]
            keep = u != v
            u, v = u[keep], v[keep]
            if len(u):
                out_any = True
                yield _pair_table(u, v, K_ACY, P)
                hi = u > v
                if hi.any():
                    yield _pair_table(u[hi], v[hi], K_IN, P)
        # out×out u > v -> OUT
        for i, j in _cross_chunks(idx, idx, out_s, out_e, out_s, out_e):
            u, v = n[i], n[j]
            keep = u > v
            if keep.any():
                out_any = True
                yield _pair_table(u[keep], v[keep], K_OUT, P)
        # out×in -> CP (u != v), CYC (x > u and x > v)
        for i, j in _cross_chunks(idx, idx, out_s, out_e, in_s, in_e):
            u, v = n[i], n[j]
            xx = x[i]
            keep = u != v
            if keep.any():
                out_any = True
                yield _pair_table(u[keep], v[keep], K_CP, P)
            kc = keep & (xx > u) & (xx > v)
            if kc.any():
                out_any = True
                yield _pair_table(u[kc], v[kc], K_CYC, P)
        if not out_any:
            yield _pair_table(
                np.empty(0, np.int64), np.empty(0, np.int64), K_ACY, P
            )

    def mark(kind: int):
        def fn(batch: pa.Table) -> pa.Table:
            u = batch.column("u").to_numpy(zero_copy_only=False)
            v = batch.column("v").to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "u": pa.array(u, pa.int64()),
                    "v": pa.array(v, pa.int64()),
                    "kind": pa.array(np.full(len(u), kind, np.int8), pa.int8()),
                    "b2": pa.array(partition_of(u, P), pa.int32()),
                }
            )

        return fn

    cands = (
        E.map_batches(adj_rows, batch_format="pyarrow")
        .groupby("xb")
        .map_groups(
            lambda g: g[["x", "n", "dir"]], batch_format="pandas"
        )
        .map_batches(expand, batch_format="pandas")
    )
    markers_e = E.map_batches(mark(M_EDGE), batch_format="pyarrow")
    markers_r = R.map_batches(mark(M_RECIP), batch_format="pyarrow")

    def confirm(g: pd.DataFrame) -> pd.DataFrame:
        kinds = g["kind"].to_numpy()
        emem = g[kinds == M_EDGE][["u", "v"]]
        rmem = g[kinds == M_RECIP][["u", "v"]]
        rows = []
        for kind, mem in [(k, emem) for k in _E_KINDS] + [
            (k, rmem) for k in _R_KINDS
        ]:
            c = g[kinds == kind][["u", "v"]]
            if not len(c) or not len(mem):
                rows.append((kind, 0))
                continue
            rows.append((kind, len(c.merge(mem, on=["u", "v"]))))
        return pd.DataFrame(
            {
                "kind": np.array([r[0] for r in rows], np.int8),
                "n": np.array([r[1] for r in rows], np.int64),
            }
        )

    parts = (
        cands.union(markers_e, markers_r)
        .groupby("b2")
        .map_groups(confirm, batch_format="pandas")
        .to_pandas()  # P * 5 tiny rows
    )
    tot = parts.groupby("kind")["n"].sum()
    return {
        "acyclic": int(tot.get(K_ACY, 0)),
        "cyclic": int(tot.get(K_CYC, 0)),
        "in_tri": int(tot.get(K_IN, 0)),
        "out_tri": int(tot.get(K_OUT, 0)),
        "cycle_plus": int(tot.get(K_CP, 0)),
    }


def tailed_triangle_count(graph, workdir: str) -> int:
    """flash_tailed_triangle on the symmetrized graph: per-edge triangle
    counts (the oriented 3-join) meet the degree-annotated edge shards in
    one hash(u) shuffle; total = sum t_e * (deg_u + deg_v - 4) // 2."""
    import os

    import pyarrow.parquet as pq

    from raylinkgraph.algos.motifs import _annotated_edges_dir
    from raylinkgraph.algos.triangles import triangle_rows

    if not graph.meta.get("symmetrize"):
        raise ValueError("tailed triangle counting requires a symmetrized graph")
    P = graph.P
    ddir = _annotated_edges_dir(graph, workdir)
    tri = triangle_rows(graph, workdir)

    def edge_keys(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy(zero_copy_only=False)
        x = batch.column("x").to_numpy(zero_copy_only=False)
        y = batch.column("y").to_numpy(zero_copy_only=False)
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
        pid = int(partition_of(g["u"].to_numpy(np.int64)[:1], P)[0])
        te = g.groupby(["u", "w"]).size().rename("t").reset_index()
        ann = pq.read_table(
            os.path.join(ddir, f"dedges-{pid:05d}.parquet"),
            columns=["src", "dst", "deg_src", "deg_dst"],
        ).to_pandas()
        m = te.merge(
            ann.rename(columns={"src": "u", "dst": "w"}), on=["u", "w"]
        )
        s = (
            m["t"].to_numpy(np.int64)
            * (m["deg_src"].to_numpy(np.int64) + m["deg_dst"].to_numpy(np.int64) - 4)
        ).sum()
        return pd.DataFrame({"s": [np.int64(s)]})

    parts = (
        tri.map_batches(edge_keys, batch_format="pyarrow")
        .groupby("b")
        .map_groups(fold, batch_format="pandas")
    ).to_pandas()
    return int(parts["s"].sum()) // 2
