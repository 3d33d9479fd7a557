"""Weakly connected components: hash-min label propagation on oids.

Reference: gs::WCCProjected,
analytical_engine/apps/projected/wcc_projected.h:29-186 —
  comp[v] <- id(v) init (:76-81); propagate min over edges (:83-105);
  frontier = vertices whose comp changed last round (:140-166);
  fixpoint when no vertex changes (:114-119).
Component id = MIN vertex id in the component (we propagate oids, so the
result is the minimum oid — matching the reference's min-gid labeling with
our deterministic id space). Run on a symmetrized graph for the weakly-
connected semantics.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from raylinkgraph.bsp import Superstep

_I64MAX = np.iinfo(np.int64).max


class WCC(Superstep):
    name = "wcc"
    state_dtypes = {"comp": pa.int64(), "changed": pa.bool_()}
    scatter_columns = ["comp", "changed"]
    msg_dtypes = {"cand": pa.int64()}
    scalar_names = ["active"]

    def __init__(self, max_rounds: int = 10_000):
        self.max_rounds = int(max_rounds)

    def params(self) -> dict:
        return {"max_rounds": self.max_rounds}

    def init(self, oids, out_deg):
        return (
            {"comp": oids.copy(), "changed": np.ones(len(oids), np.bool_)},
            {"active": float(len(oids))},
        )

    def scatter(self, state, block, scalars):
        if len(block["udst_pos"]) == 0:
            return
        comp = state["comp"][block["src_pos"]]
        active = state["changed"][block["src_pos"]]
        # inactive sources contribute +inf so the segment min ignores them
        vals = np.where(active, comp, _I64MAX)[block["src_code"]]
        mins = np.minimum.reduceat(vals, block["dst_ptr"][:-1])
        live = mins < _I64MAX
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
        comp = state["comp"].copy()
        changed = np.zeros(len(oids), np.bool_)
        if len(msgs["pos"]):
            pos = msgs["pos"]
            order = np.argsort(pos, kind="stable")
            ps, cs = pos[order], msgs["cand"][order]
            starts = np.flatnonzero(np.r_[True, np.diff(ps) > 0])
            mins = np.minimum.reduceat(cs, starts)
            upos = ps[starts]
            better = mins < comp[upos]
            comp[upos[better]] = mins[better]
            changed[upos[better]] = True
        return (
            {"comp": comp, "changed": changed},
            {"active": float(changed.sum())},
        )

    def converged(self, scalars, completed_rounds):
        if completed_rounds >= self.max_rounds:
            return True
        return completed_rounds >= 1 and scalars["active"] == 0.0
