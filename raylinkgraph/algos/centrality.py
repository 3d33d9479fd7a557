"""Closeness / harmonic centrality via bitmask multi-source BFS.

Reference: closeness_centrality (.gs_conf.yaml:214, flash_closeness
yaml:580) and harmonic (flash_harmonic, yaml:594). Exact closeness needs
distances from EVERY vertex — O(V*E) anywhere, including the reference —
so the production shape is the standard sampled-source estimate: BFS from
a deterministic source set (the S smallest vertex ids), accumulating per
TARGET vertex the count of sources reaching it and the sum of (and sum of
reciprocal) distances:

  closeness(v) = reached(v) / sum_dist(v)      (sum over sampled sources)
  harmonic(v)  = sum over sources s (d>0) of 1 / d(s, v)

One BSP job covers a WAVE of up to 64 sources: state carries a 64-bit
reachability mask, messages are bitwise-OR reduced (np.bitwise_or.reduceat
per CSR segment — the same pre-combined shuffle as every other superstep),
and a vertex's newly-set bits at round r contribute distance r. Exact
closeness = run ceil(V/64) waves and sum the accumulators (run_closeness
with sources=None, used by the pytest NetworkX oracle at small V).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from raylinkgraph.bsp import Superstep
from raylinkgraph.stages.graph_build import LinkGraph

_U64 = np.uint64
_M1 = _U64(0x5555555555555555)
_M2 = _U64(0x3333333333333333)
_M4 = _U64(0x0F0F0F0F0F0F0F0F)
_H01 = _U64(0x0101010101010101)


def popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized SWAR popcount over a uint64 array."""
    x = x.astype(_U64, copy=True)
    x -= (x >> _U64(1)) & _M1
    x = (x & _M2) + ((x >> _U64(2)) & _M2)
    x = (x + (x >> _U64(4))) & _M4
    return ((x * _H01) >> _U64(56)).astype(np.int64)


class MSBFS(Superstep):
    """One wave of <=64 BFS sources with distance accumulators."""

    name = "msbfs"
    state_dtypes = {
        "mask": pa.int64(),
        "fresh": pa.int64(),
        "cnt": pa.int64(),
        "sum_d": pa.float64(),
        "sum_inv": pa.float64(),
    }
    scatter_columns = ["fresh"]
    msg_dtypes = {"orv": pa.int64()}
    scalar_names = ["active"]

    def __init__(self, sources, max_rounds: int = 10_000, wave: int = 0):
        src = np.asarray(sorted(int(s) for s in sources), np.int64)
        if len(src) > 64:
            raise ValueError("a wave carries at most 64 sources")
        self.sources = src
        self.max_rounds = int(max_rounds)
        self.wave = int(wave)  # distinguishes checkpoints of different waves

    def params(self) -> dict:
        return {
            "sources": [int(s) for s in self.sources],
            "max_rounds": self.max_rounds,
            "wave": self.wave,
        }

    def init(self, oids, out_deg):
        n = len(oids)
        mask = np.zeros(n, _U64)
        pos = np.searchsorted(oids, self.sources)
        pos = pos[(pos < n)]
        hit = pos[np.isin(oids[pos], self.sources)]
        bit_idx = np.searchsorted(self.sources, oids[hit]).astype(_U64)
        mask[hit] = _U64(1) << bit_idx
        cnt = popcount64(mask)  # self-pair (d = 0): counts, adds no distance
        return (
            {
                "mask": mask.view(np.int64),
                "fresh": mask.view(np.int64).copy(),
                "cnt": cnt,
                "sum_d": np.zeros(n),
                "sum_inv": np.zeros(n),
            },
            {"active": float((mask != 0).sum())},
        )

    def scatter(self, state, block, scalars):
        if len(block["udst_pos"]) == 0:
            return
        fresh = state["fresh"].view(_U64)[block["src_pos"]]
        vals = fresh[block["src_code"]]
        ors = np.bitwise_or.reduceat(vals, block["dst_ptr"][:-1])
        live = ors != 0
        if not live.any():
            return
        tgt_ptr, pos = block["tgt_ptr"], block["udst_pos"]
        out = ors.view(np.int64)
        for q in range(len(tgt_ptr) - 1):
            lo, hi = tgt_ptr[q], tgt_ptr[q + 1]
            if lo >= hi:
                continue
            m = live[lo:hi]
            if m.any():
                yield q, pos[lo:hi][m], {"orv": out[lo:hi][m]}

    def apply(self, oids, out_deg, state, msgs, scalars):
        r = int(scalars["_round"]) + 1  # bits arriving now are at distance r
        mask = state["mask"].view(_U64).copy()
        cnt = state["cnt"].copy()
        sum_d = state["sum_d"].copy()
        sum_inv = state["sum_inv"].copy()
        fresh = np.zeros(len(oids), _U64)
        if len(msgs["pos"]):
            pos = msgs["pos"]
            order = np.argsort(pos, kind="stable")
            ps, vs = pos[order], msgs["orv"][order].view(_U64)
            starts = np.flatnonzero(np.r_[True, np.diff(ps) > 0])
            ors = np.bitwise_or.reduceat(vs, starts)
            upos = ps[starts]
            new = ors & ~mask[upos]
            nz = new != 0
            if nz.any():
                upos, new = upos[nz], new[nz]
                pc = popcount64(new)
                fresh[upos] = new
                mask[upos] |= new
                cnt[upos] += pc
                sum_d[upos] += float(r) * pc
                sum_inv[upos] += pc / float(r)
        return (
            {
                "mask": mask.view(np.int64),
                "fresh": fresh.view(np.int64),
                "cnt": cnt,
                "sum_d": sum_d,
                "sum_inv": sum_inv,
            },
            {"active": float((fresh != 0).sum())},
        )

    def converged(self, scalars, completed_rounds):
        if completed_rounds >= self.max_rounds:
            return True
        return completed_rounds >= 1 and scalars["active"] == 0.0


def smallest_oids(graph: LinkGraph, n: int) -> np.ndarray:
    """The n smallest vertex ids: per-partition local minima (vertexstate
    files are oid-sorted, so each partition contributes its head) reduced
    on the driver — O(P*n) driver work, never O(V)."""
    heads = []
    for pid in range(graph.P):
        t = pq.read_table(graph.vertexstate_path(pid), columns=["oid"])
        heads.append(t.column("oid").to_numpy(zero_copy_only=False)[:n])
    allh = np.sort(np.concatenate(heads))
    return allh[:n]


def two_sweep_diameter(graph: LinkGraph, workdir: str) -> dict:
    """Double-sweep diameter lower bound (flash_diameter_approx,
    .gs_conf.yaml:457): BFS from the smallest id, then BFS from the
    farthest vertex found (ties -> smallest id); the second eccentricity
    is the bound. Per-sweep argmax is a per-batch partial reduce."""
    import pandas as pd

    from raylinkgraph.algos.bfs import BFS, UNREACHED
    from raylinkgraph.bsp import run_bsp

    def farthest(res):
        def partial(b: pd.DataFrame) -> pd.DataFrame:
            b = b[b["dist"] != UNREACHED]
            if not len(b):
                return pd.DataFrame({"d": [np.int64(-1)], "v": [np.int64(-1)]})
            i = np.lexsort((b["oid"].to_numpy(), -b["dist"].to_numpy()))[0]
            return pd.DataFrame(
                {"d": [np.int64(b["dist"].iloc[i])], "v": [np.int64(b["oid"].iloc[i])]}
            )

        parts = res.state_ds().map_batches(partial, batch_format="pandas").to_pandas()
        i = np.lexsort((parts["v"].to_numpy(), -parts["d"].to_numpy()))[0]
        return int(parts["v"].iloc[i]), int(parts["d"].iloc[i])

    s0 = int(smallest_oids(graph, 1)[0])
    r1 = run_bsp(graph, BFS(s0), os.path.join(workdir, "sweep1"), max_rounds=10_000)
    w, ecc1 = farthest(r1)
    r2 = run_bsp(graph, BFS(w), os.path.join(workdir, "sweep2"), max_rounds=10_000)
    w2, ecc2 = farthest(r2)
    return {"source": s0, "far_vertex": w, "ecc1": ecc1, "diameter_lb": ecc2}


def k_center(graph: LinkGraph, workdir: str, k: int) -> dict:
    """Greedy k-center / farthest-point traversal (flash_k_center,
    .gs_conf.yaml:457-478): c1 = min id; each next center = the vertex
    maximizing its min BFS distance to the chosen centers (ties ->
    smallest id; unreachable vertices excluded). Returns the centers in
    selection order and the final covering radius. One BFS job per
    center; the running min-distance is folded per partition."""
    import pandas as pd

    from raylinkgraph.algos.bfs import BFS, UNREACHED
    from raylinkgraph.algos.louvain import _attach, _persist
    from raylinkgraph.bsp import run_bsp

    B = graph.P
    centers = [int(smallest_oids(graph, 1)[0])]
    mind = None  # Dataset (oid, mind), persisted parquet per center
    for i in range(k):
        res = run_bsp(
            graph, BFS(centers[-1]),
            os.path.join(workdir, f"bfs-{centers[-1]}"), max_rounds=10_000,
        )
        st = res.state_ds().map_batches(
            lambda b: pd.DataFrame(
                {"oid": b["oid"].to_numpy(np.int64),
                 "dist": b["dist"].to_numpy(np.float64)}
            ),
            batch_format="pandas",
        )
        if mind is None:
            merged = st.map_batches(
                lambda b: pd.DataFrame(
                    {"oid": b["oid"].to_numpy(np.int64),
                     "mind": b["dist"].to_numpy(np.float64)}
                ),
                batch_format="pandas",
            )
        else:
            merged = _attach(
                st, "oid", mind, "oid", ["mind"], ["prev"], B,
                {"oid": "int64", "dist": "float64"},
            ).map_batches(
                lambda b: pd.DataFrame(
                    {"oid": b["oid"].to_numpy(np.int64),
                     "mind": np.minimum(b["dist"].to_numpy(np.float64),
                                         b["prev"].to_numpy(np.float64))}
                ),
                batch_format="pandas",
            )
        mind = _persist(merged, os.path.join(workdir, f"mind-{i}"))

        def far_partial(b: pd.DataFrame) -> pd.DataFrame:
            b = b[b["mind"] != float(UNREACHED)]
            if not len(b):
                return pd.DataFrame({"d": [-1.0], "v": [np.int64(-1)]})
            j = np.lexsort((b["oid"].to_numpy(), -b["mind"].to_numpy()))[0]
            return pd.DataFrame(
                {"d": [float(b["mind"].iloc[j])], "v": [np.int64(b["oid"].iloc[j])]}
            )

        parts = mind.map_batches(far_partial, batch_format="pandas").to_pandas()
        j = np.lexsort((parts["v"].to_numpy(), -parts["d"].to_numpy()))[0]
        far_v, far_d = int(parts["v"].iloc[j]), int(parts["d"].iloc[j])
        if i == k - 1:
            return {"centers": centers, "radius": far_d}
        centers.append(far_v)
    return {"centers": centers, "radius": far_d}


def run_closeness(
    graph: LinkGraph,
    workdir: str,
    *,
    sources: np.ndarray | None = None,
    engine: str = "dataset",
) -> pd.DataFrame:
    """-> (oid, reached, sum_d, sum_inv) accumulated over the source set
    (default: ALL vertices, executed in waves of 64 — exact closeness;
    pass a sampled source array for the at-scale estimate)."""
    if engine == "actors":
        from raylinkgraph.bsp_actors import run_bsp_actors as runner
    else:
        from raylinkgraph.bsp import run_bsp as runner

    if sources is None:
        parts = [
            pq.read_table(graph.vertexstate_path(pid), columns=["oid"])
            .column("oid").to_numpy(zero_copy_only=False)
            for pid in range(graph.P)
        ]
        sources = np.sort(np.concatenate(parts))
    sources = np.asarray(sources, np.int64)

    acc: pd.DataFrame | None = None
    for w, lo in enumerate(range(0, len(sources), 64)):
        wave_src = sources[lo : lo + 64]
        res = runner(
            graph,
            MSBFS(wave_src, wave=w),
            os.path.join(workdir, f"wave={w:04d}"),
            max_rounds=10_000,
        )
        df = res.state_pandas()[["oid", "cnt", "sum_d", "sum_inv"]]
        if acc is None:
            acc = df
        else:
            acc = acc.merge(df, on="oid", suffixes=("", "_w"))
            for c in ("cnt", "sum_d", "sum_inv"):
                acc[c] = acc[c] + acc[f"{c}_w"]
                acc = acc.drop(columns=[f"{c}_w"])
    out = acc.rename(columns={"cnt": "reached"})
    return out.sort_values("oid").reset_index(drop=True)


class MaxMSBFS(Superstep):
    """random_multi_bfs (flash, .gs_conf.yaml:650-709,
    apps/flash/traversal/random-multi-bfs.h:43-88): k<=64 sources, per
    vertex report the MAXIMUM distance over the sources that reach it
    (-1 when none does). Pinned deviation: sources are the k smallest
    vertex ids, not time-seeded rand_r. Distances travel implicitly: a
    bit arriving at round r is at distance r, so max_d is simply the
    last round any new bit arrived."""

    name = "max_msbfs"
    state_dtypes = {"mask": pa.int64(), "fresh": pa.int64(), "max_d": pa.int64()}
    scatter_columns = ["fresh"]
    msg_dtypes = {"orv": pa.int64()}
    scalar_names = ["active"]

    def __init__(self, sources, max_rounds: int = 10_000):
        src = np.asarray(sorted(int(s) for s in sources), np.int64)
        if len(src) > 64:
            raise ValueError("at most 64 sources")
        self.sources = src
        self.max_rounds = int(max_rounds)

    def params(self) -> dict:
        return {"sources": [int(s) for s in self.sources],
                "max_rounds": self.max_rounds}

    def init(self, oids, out_deg):
        n = len(oids)
        mask = np.zeros(n, _U64)
        pos = np.searchsorted(oids, self.sources)
        pos = pos[pos < n]
        hit = pos[np.isin(oids[pos], self.sources)]
        bit_idx = np.searchsorted(self.sources, oids[hit]).astype(_U64)
        mask[hit] = _U64(1) << bit_idx
        max_d = np.where(mask != 0, 0, -1).astype(np.int64)
        return (
            {"mask": mask.view(np.int64), "fresh": mask.view(np.int64).copy(),
             "max_d": max_d},
            {"active": float((mask != 0).sum())},
        )

    scatter = MSBFS.scatter  # identical OR-reduced frontier propagation

    def apply(self, oids, out_deg, state, msgs, scalars):
        r = int(scalars["_round"]) + 1
        mask = state["mask"].view(_U64).copy()
        max_d = state["max_d"].copy()
        fresh = np.zeros(len(oids), _U64)
        if len(msgs["pos"]):
            pos = msgs["pos"]
            order = np.argsort(pos, kind="stable")
            ps, vs = pos[order], msgs["orv"][order].view(_U64)
            starts = np.flatnonzero(np.r_[True, np.diff(ps) > 0])
            ors = np.bitwise_or.reduceat(vs, starts)
            upos = ps[starts]
            new = ors & ~mask[upos]
            nz = new != 0
            if nz.any():
                upos, new = upos[nz], new[nz]
                fresh[upos] = new
                mask[upos] |= new
                max_d[upos] = r
        return (
            {"mask": mask.view(np.int64), "fresh": fresh.view(np.int64),
             "max_d": max_d},
            {"active": float((fresh != 0).sum())},
        )

    def converged(self, scalars, completed_rounds):
        if completed_rounds >= self.max_rounds:
            return True
        return completed_rounds >= 1 and scalars["active"] == 0.0


def run_random_multi_bfs(graph: LinkGraph, workdir: str, *, k: int = 64,
                         engine: str = "dataset") -> pd.DataFrame:
    """-> (oid, res): res = max distance over the k pinned sources that
    reach the vertex, -1 if unreached. Directed (follows the graph's
    edges, ED in the reference)."""
    if engine == "actors":
        from raylinkgraph.bsp_actors import run_bsp_actors as runner
    else:
        from raylinkgraph.bsp import run_bsp as runner

    srcs = smallest_oids(graph, k)
    res = runner(graph, MaxMSBFS(srcs), workdir, max_rounds=10_000)
    df = res.state_pandas()[["oid", "max_d"]].rename(columns={"max_d": "res"})
    return df.reset_index(drop=True)
