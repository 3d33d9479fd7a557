"""k-shell / core-number decomposition: ONE-PASS distributed peeling.

Reference: kshell (.gs_conf.yaml:162), flash kcore/degeneracy/onion family
(.gs_conf.yaml:335-366). core(v) = the largest k such that v survives the
k-core. A single BSP job peels with an adaptive threshold k that travels
in the scalar channel: each round removes every alive vertex whose
residual degree is < k; when a round removes nothing and vertices remain,
k increments (all partitions advance k deterministically from the same
summed scalars, so no extra coordination round is needed). A vertex
removed while the threshold is k gets core = k-1 — exactly the peeling
order of the sequential algorithm, in rounds ~ O(peel depth + k_max)
instead of the k_max independent jobs of the naive formulation.

Oracle: networkx.core_number (tests/test_kshell.py) and the driver's
unrolled H-index SQL (graph_corenum).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from raylinkgraph.bsp import Superstep
from raylinkgraph.stages.graph_build import LinkGraph


class CoreDecompose(Superstep):
    name = "corenum"
    state_dtypes = {
        "cur_deg": pa.int64(),
        "core": pa.int64(),
        "layer": pa.int64(),  # onion layer = peel round of removal
        "alive": pa.bool_(),
        "just_removed": pa.bool_(),
    }
    scatter_columns = ["just_removed"]
    msg_dtypes = {"dec": pa.int64()}
    # k is a GLOBAL threshold shipped through the summed scalar channel:
    # every partition emits k/P, so the driver-side sum reconstructs k
    # exactly (P is a power of two -> dyadic floats are exact)
    scalar_names = ["removed", "alive", "k"]

    def __init__(self, P: int, max_rounds: int = 100_000):
        self.P = int(P)
        self.max_rounds = int(max_rounds)

    def params(self) -> dict:
        # spec tag invalidates pre-layer checkpoints on resume
        return {"P": self.P, "max_rounds": self.max_rounds, "spec": "layer-v2"}

    def init(self, oids, out_deg):
        removed = out_deg < 1  # isolated vertices: core 0, layer 0
        core = np.where(removed, 0, -1).astype(np.int64)
        layer = np.where(removed, 0, -1).astype(np.int64)
        return (
            {
                "cur_deg": out_deg.astype(np.int64),
                "core": core,
                "layer": layer,
                "alive": ~removed,
                "just_removed": removed,
            },
            {
                "removed": float(removed.sum()),
                "alive": float((~removed).sum()),
                "k": 1.0 / self.P,
            },
        )

    def scatter(self, state, block, scalars):
        if len(block["udst_pos"]) == 0:
            return
        rem = state["just_removed"][block["src_pos"]].astype(np.int64)
        per_edge = rem[block["src_code"]]
        decs = np.bincount(
            block["dst_code"], weights=per_edge, minlength=len(block["udst_pos"])
        ).astype(np.int64)
        live = decs > 0
        if not live.any():
            return
        tgt_ptr, pos = block["tgt_ptr"], block["udst_pos"]
        for q in range(len(tgt_ptr) - 1):
            lo, hi = tgt_ptr[q], tgt_ptr[q + 1]
            if lo >= hi:
                continue
            m = live[lo:hi]
            if m.any():
                yield q, pos[lo:hi][m], {"dec": decs[lo:hi][m]}

    def apply(self, oids, out_deg, state, msgs, scalars):
        k = int(round(scalars["k"]))
        # the previous round removed nothing but vertices remain: the
        # (k)-core is stable, advance the peeling threshold
        if scalars["removed"] == 0.0 and scalars["alive"] > 0.0:
            k += 1
        cur = state["cur_deg"].copy()
        alive = state["alive"].copy()
        core = state["core"].copy()
        layer = state["layer"].copy()
        if len(msgs["pos"]):
            cur -= np.bincount(
                msgs["pos"], weights=msgs["dec"], minlength=len(oids)
            ).astype(np.int64)
        just_removed = alive & (cur < k)
        core[just_removed] = k - 1
        layer[just_removed] = int(scalars["_round"]) + 1
        alive = alive & ~just_removed
        return (
            {"cur_deg": cur, "core": core, "layer": layer, "alive": alive,
             "just_removed": just_removed},
            {
                "removed": float(just_removed.sum()),
                "alive": float(alive.sum()),
                "k": k / self.P,
            },
        )

    def converged(self, scalars, completed_rounds):
        if completed_rounds >= self.max_rounds:
            return True
        return completed_rounds >= 1 and scalars["alive"] == 0.0


def run_core_number(
    graph: LinkGraph, workdir: str, *, engine: str = "dataset", max_rounds: int = 100_000
) -> pd.DataFrame:
    """-> (oid, core) for EVERY vertex of a symmetrized graph (one BSP job)."""
    if not graph.meta.get("symmetrize"):
        raise ValueError("core decomposition requires a symmetrized graph")
    if engine == "actors":
        from raylinkgraph.bsp_actors import run_bsp_actors as runner
    else:
        from raylinkgraph.bsp import run_bsp as runner

    res = runner(
        graph, CoreDecompose(graph.P), workdir, max_rounds=max_rounds
    )
    if not res.converged or res.scalars["alive"] > 0:
        raise RuntimeError(
            f"core decomposition did not finish: {res.scalars['alive']:.0f} "
            f"vertices still alive after {res.rounds} rounds"
        )
    df = res.state_pandas()[["oid", "core", "layer"]]
    return df.reset_index(drop=True)


def densest_subgraph_2approx(graph: LinkGraph, workdir: str, *,
                             engine: str = "dataset") -> dict:
    """flash_densest_sub_2_approx (.gs_conf.yaml:553-569,
    apps/flash/subgraph/densest-sub-2-approx.h:46-110): take the max-core
    subgraph of the degeneracy ordering; density is reported exactly as
    the reference computes it — nv = |S|, ne = sum over v in S of
    |N(v) ∩ S| (i.e. 2x the undirected edge count), density = ne / nv.
    Core numbers come from the one-pass peel; the membership filter is a
    partitioned bucket join (nothing broadcast, nothing on the driver)."""
    import os

    import pyarrow.parquet as pq
    import ray.data as rd

    from raylinkgraph.functions.hashing import partition_of

    if engine == "actors":
        from raylinkgraph.bsp_actors import run_bsp_actors as runner
    else:
        from raylinkgraph.bsp import run_bsp as runner

    # ``workdir`` may point at an existing CoreDecompose job (e.g. the
    # corenum query's): identical lineage makes the peel resume instantly
    res = runner(
        graph, CoreDecompose(graph.P), workdir, max_rounds=100_000,
    )
    state = res.state_ds()  # (oid, core, ...) per-partition parquet
    cmax = int(state.max("core"))
    P = graph.P

    # membership rows stay a Dataset end-to-end (no driver materialization)
    def members(b: pa.Table) -> pd.DataFrame:
        keep = b.column("core").to_numpy(zero_copy_only=False) == cmax
        oid = b.column("oid").to_numpy(zero_copy_only=False)[keep]
        return pd.DataFrame(
            {"k": oid, "side": np.int8(1), "src": np.int64(-1)}
        )

    mem_ds = state.map_batches(members, batch_format="pyarrow").materialize()
    nv = mem_ds.count()

    def tag_edges(b: pa.Table) -> pa.Table:
        d = b.column("dst_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "k": pa.array(d, pa.int64()),
                "side": pa.array(np.zeros(len(d), np.int8), pa.int8()),
                "src": b.column("src_id"),
            }
        )

    def tag_bucket(b: pd.DataFrame) -> pd.DataFrame:
        return b.assign(__b=partition_of(b["k"].to_numpy(np.int64), P))

    def count_dst_member(g: pd.DataFrame) -> pd.DataFrame:
        mem = np.sort(g[g["side"] == 1]["k"].to_numpy(np.int64))
        e = g[g["side"] == 0]
        if not len(e) or not len(mem):
            return pd.DataFrame({"k": pd.Series([], dtype=np.int64),
                                 "side": pd.Series([], dtype=np.int8),
                                 "src": pd.Series([], dtype=np.int64)})
        d = e["k"].to_numpy(np.int64)
        pos = np.minimum(np.searchsorted(mem, d), len(mem) - 1)
        hit = mem[pos] == d
        # survivors re-keyed by src for the second membership check
        s = e["src"].to_numpy(np.int64)[hit]
        return pd.DataFrame(
            {"k": s, "side": np.int8(0), "src": s}
        )

    def count_src_member(g: pd.DataFrame) -> pd.DataFrame:
        mem = np.sort(g[g["side"] == 1]["k"].to_numpy(np.int64))
        e = g[g["side"] == 0]
        if not len(e) or not len(mem):
            return pd.DataFrame({"ne": [np.int64(0)]})
        s = e["k"].to_numpy(np.int64)
        pos = np.minimum(np.searchsorted(mem, s), len(mem) - 1)
        return pd.DataFrame({"ne": [np.int64((mem[pos] == s).sum())]})

    pass1 = (
        graph.edges_ds().map_batches(tag_edges, batch_format="pyarrow")
        .union(mem_ds)
        .map_batches(tag_bucket, batch_format="pandas")
        .groupby("__b")
        .map_groups(lambda g: count_dst_member(g.drop(columns="__b")),
                    batch_format="pandas")
    )
    parts = (
        pass1.union(mem_ds)
        .map_batches(tag_bucket, batch_format="pandas")
        .groupby("__b")
        .map_groups(lambda g: count_src_member(g.drop(columns="__b")),
                    batch_format="pandas")
    ).to_pandas()
    ne = int(parts["ne"].sum())
    return {
        "cmax": cmax,
        "nv": int(nv),
        "ne": ne,
        "density": (ne / nv) if nv else 0.0,
    }
