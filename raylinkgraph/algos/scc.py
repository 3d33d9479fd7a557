"""Strongly connected components: min-label forward/backward settling.

Reference: flash_scc / flash_scc_2 (.gs_conf.yaml:776-783,
analytical_engine/apps/flash/connectivity/scc.h) — the same
forward-backward reachability coloring family.

Per phase, over the UNSETTLED subgraph only (settled SCCs can never lie
on a path between remaining vertices — if they did, the endpoints would
have belonged to that SCC):

  f(v) = min unsettled id reachable FROM v   (labels flow against edges)
  b(v) = min unsettled id that REACHES v     (labels flow along edges)

both propagated simultaneously in ONE BSP job on the direction-flagged
graph (edge (u,v) stored as (u,v,bit1) + (v,u,bit2), built with
dedup_weight="or"); a vertex with f(v) == b(v) == m has a mutual path
with m, so scc(v) = m — in particular the whole SCC of the globally
smallest unsettled vertex settles every phase, guaranteeing termination.
A zero-round "settle" job then folds f/b into the persistent
(scc, settled) assignment; the driver loops phases until none remain.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

from raylinkgraph.bsp import Superstep
from raylinkgraph.functions.hashing import partition_of
from raylinkgraph.state import checkpoint as ckpt

_INF = np.iinfo(np.int64).max


class SCCPhase(Superstep):
    """One phase of simultaneous f/b min-label propagation."""

    name = "sccphase"
    state_dtypes = {
        "flab": pa.int64(),
        "blab": pa.int64(),
        "ffresh": pa.bool_(),
        "bfresh": pa.bool_(),
        "settled": pa.bool_(),
    }
    scatter_columns = ["flab", "blab", "ffresh", "bfresh", "settled"]
    msg_dtypes = {"fc": pa.int64(), "bc": pa.int64()}
    scalar_names = ["active"]

    def __init__(self, P: int, phase: int, assign_workdir: str | None):
        self.P = int(P)
        self.phase = int(phase)
        self.assign_workdir = assign_workdir  # settle state of phase-1

    def params(self) -> dict:
        return {"P": self.P, "phase": self.phase, "assign": self.assign_workdir}

    def init(self, oids, out_deg):
        n = len(oids)
        if n and self.assign_workdir is not None:
            pid = int(partition_of(oids[:1], self.P)[0])
            t = ckpt.read_state(self.assign_workdir, 0, pid)
            settled = t.column("settled").to_numpy(zero_copy_only=False).copy()
        else:
            settled = np.zeros(n, np.bool_)
        lab = np.where(settled, _INF, oids)
        return (
            {
                "flab": lab.copy(),
                "blab": lab.copy(),
                "ffresh": ~settled,
                "bfresh": ~settled,
                "settled": settled,
            },
            {"active": float((~settled).sum())},
        )

    def scatter(self, state, block, scalars):
        nseg = len(block["udst_pos"])
        if nseg == 0:
            return
        flags = block["weight"]
        gate_fwd = np.mod(flags, 2.0) > 0          # bit 1: original s->t
        gate_rev = np.mod(np.floor(flags / 2.0), 2.0) > 0  # bit 2: original t->s
        src_ok = ~state["settled"][block["src_pos"]]
        # f labels flow s->t when the ORIGINAL edge is t->s (rev bit)
        fval = np.where(
            src_ok & state["ffresh"][block["src_pos"]], state["flab"][block["src_pos"]], _INF
        )[block["src_code"]]
        fval = np.where(gate_rev, fval, _INF)
        # b labels flow s->t along the original edge (fwd bit)
        bval = np.where(
            src_ok & state["bfresh"][block["src_pos"]], state["blab"][block["src_pos"]], _INF
        )[block["src_code"]]
        bval = np.where(gate_fwd, bval, _INF)
        fmins = np.minimum.reduceat(fval, block["dst_ptr"][:-1])
        bmins = np.minimum.reduceat(bval, block["dst_ptr"][:-1])
        live = (fmins < _INF) | (bmins < _INF)
        if not live.any():
            return
        tgt_ptr, pos = block["tgt_ptr"], block["udst_pos"]
        for q in range(len(tgt_ptr) - 1):
            lo, hi = tgt_ptr[q], tgt_ptr[q + 1]
            if lo >= hi:
                continue
            m = live[lo:hi]
            if m.any():
                yield q, pos[lo:hi][m], {
                    "fc": fmins[lo:hi][m], "bc": bmins[lo:hi][m]
                }

    def apply(self, oids, out_deg, state, msgs, scalars):
        n = len(oids)
        flab = state["flab"].copy()
        blab = state["blab"].copy()
        settled = state["settled"]
        ffresh = np.zeros(n, np.bool_)
        bfresh = np.zeros(n, np.bool_)
        if len(msgs["pos"]):
            pos = msgs["pos"]
            order = np.argsort(pos, kind="stable")
            ps = pos[order]
            starts = np.flatnonzero(np.r_[True, np.diff(ps) > 0])
            upos = ps[starts]
            ok = ~settled[upos]
            for lab, fresh, key in ((flab, ffresh, "fc"), (blab, bfresh, "bc")):
                mins = np.minimum.reduceat(msgs[key][order], starts)
                better = ok & (mins < lab[upos])
                lab[upos[better]] = mins[better]
                fresh[upos[better]] = True
        return (
            {
                "flab": flab,
                "blab": blab,
                "ffresh": ffresh,
                "bfresh": bfresh,
                "settled": settled,
            },
            {"active": float(ffresh.sum() + bfresh.sum())},
        )

    def converged(self, scalars, completed_rounds):
        return completed_rounds >= 1 and scalars["active"] == 0.0


class SCCSettle(Superstep):
    """Zero-round job: fold a phase's f/b fixpoint into the persistent
    (scc, settled) assignment (all work happens in init)."""

    name = "sccsettle"
    state_dtypes = {"scc": pa.int64(), "settled": pa.bool_()}
    scatter_columns: list[str] = []
    msg_dtypes: dict = {}
    scalar_names = ["remaining"]

    def __init__(self, P: int, phase: int, phase_workdir: str, phase_step: int,
                 prev_assign: str | None):
        self.P = int(P)
        self.phase = int(phase)
        self.phase_workdir = phase_workdir
        self.phase_step = int(phase_step)
        self.prev_assign = prev_assign

    def params(self) -> dict:
        return {
            "P": self.P,
            "phase": self.phase,
            "src": self.phase_workdir,
            "step": self.phase_step,
            "prev": self.prev_assign,
        }

    def init(self, oids, out_deg):
        n = len(oids)
        if n == 0:
            return (
                {"scc": np.zeros(0, np.int64), "settled": np.zeros(0, np.bool_)},
                {"remaining": 0.0},
            )
        pid = int(partition_of(oids[:1], self.P)[0])
        t = ckpt.read_state(self.phase_workdir, self.phase_step, pid)
        flab = t.column("flab").to_numpy(zero_copy_only=False)
        blab = t.column("blab").to_numpy(zero_copy_only=False)
        if self.prev_assign is not None:
            pt = ckpt.read_state(self.prev_assign, 0, pid)
            scc = pt.column("scc").to_numpy(zero_copy_only=False).copy()
            settled = pt.column("settled").to_numpy(zero_copy_only=False).copy()
        else:
            scc = np.full(n, -1, np.int64)
            settled = np.zeros(n, np.bool_)
        new = ~settled & (flab == blab) & (flab < _INF)
        scc[new] = flab[new]
        settled |= new
        return (
            {"scc": scc, "settled": settled},
            {"remaining": float((~settled).sum())},
        )

    def converged(self, scalars, completed_rounds):
        return True


def run_scc(graph, workdir: str, *, engine: str = "dataset",
            max_phases: int = 64) -> pd.DataFrame:
    """-> (oid, scc) for every vertex of a direction-flagged graph
    (LinkGraph built from augment_edges_ds with dedup_weight='or').
    scc id = the smallest member id of the component."""
    if engine == "actors":
        from raylinkgraph.bsp_actors import run_bsp_actors as runner
    else:
        from raylinkgraph.bsp import run_bsp as runner

    assign: str | None = None
    for phase in range(max_phases):
        prop = runner(
            graph,
            SCCPhase(graph.P, phase, assign),
            os.path.join(workdir, f"phase-{phase}"),
            max_rounds=10_000,
            keep_steps=1,
        )
        settle_dir = os.path.join(workdir, f"assign-{phase}")
        settle = runner(
            graph,
            SCCSettle(graph.P, phase, prop.workdir, prop.final_step, assign),
            settle_dir,
            max_rounds=0,
        )
        assign = settle_dir
        if settle.scalars["remaining"] == 0.0:
            df = settle.state_pandas()[["oid", "scc"]]
            return df.reset_index(drop=True)
    raise RuntimeError(f"SCC did not settle within {max_phases} phases")
