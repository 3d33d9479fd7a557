"""SSSP: frontier-based Bellman-Ford-style relaxation over weighted edges.

Reference: grape::SSSPOpt / gs::SSSPProjected
(coordinator .gs_conf.yaml:34,198; apps/projected/sssp_projected.h) —
source vertex, non-negative weights, per-round relaxation of the
frontier's out-edges until no distance improves. Requires a graph built
with ``weight_col`` (CSR blocks carry per-edge float64 weights aligned
to the dst-major edge order). Unreachable stays ``UNREACHED_DIST``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from raylinkgraph.bsp import Superstep

UNREACHED_DIST = np.inf


class SSSP(Superstep):
    name = "sssp"
    state_dtypes = {"dist": pa.float64(), "changed": pa.bool_()}
    scatter_columns = ["dist", "changed"]
    msg_dtypes = {"cand": pa.float64()}
    scalar_names = ["active"]

    def __init__(self, source: int, max_rounds: int = 10_000):
        self.source = int(source)
        self.max_rounds = int(max_rounds)

    def params(self) -> dict:
        return {"source": self.source, "max_rounds": self.max_rounds}

    def init(self, oids, out_deg):
        dist = np.full(len(oids), UNREACHED_DIST)
        changed = oids == self.source
        dist[changed] = 0.0
        return (
            {"dist": dist, "changed": changed},
            {"active": float(changed.sum())},
        )

    def scatter(self, state, block, scalars):
        if len(block["udst_pos"]) == 0:
            return
        dist = state["dist"][block["src_pos"]]
        active = state["changed"][block["src_pos"]]
        # inactive sources relax at +inf; inf + w == inf
        cand = np.where(active, dist, UNREACHED_DIST)[block["src_code"]] + block["weight"]
        mins = np.minimum.reduceat(cand, block["dst_ptr"][:-1])
        live = np.isfinite(mins)
        if not live.any():
            return
        tgt_ptr, pos = block["tgt_ptr"], block["udst_pos"]
        for q in range(len(tgt_ptr) - 1):
            lo, hi = tgt_ptr[q], tgt_ptr[q + 1]
            if lo >= hi:
                continue
            m = live[lo:hi]
            if m.any():
                yield q, pos[lo:hi][m], {"cand": mins[lo:hi][m]}

    def apply(self, oids, out_deg, state, msgs, scalars):
        dist = state["dist"].copy()
        changed = np.zeros(len(oids), np.bool_)
        if len(msgs["pos"]):
            pos = msgs["pos"]
            order = np.argsort(pos, kind="stable")
            ps, cs = pos[order], msgs["cand"][order]
            starts = np.flatnonzero(np.r_[True, np.diff(ps) > 0])
            mins = np.minimum.reduceat(cs, starts)
            upos = ps[starts]
            better = mins < dist[upos]
            dist[upos[better]] = mins[better]
            changed[upos[better]] = True
        return {"dist": dist, "changed": changed}, {"active": float(changed.sum())}

    def converged(self, scalars, completed_rounds):
        if completed_rounds >= self.max_rounds:
            return True
        return completed_rounds >= 1 and scalars["active"] == 0.0
