"""k-core: iterative peeling of vertices with degree < k.

Reference: gs::KCore (analytical_engine/apps/kcore/kcore.h:27, yaml:156).
Runs on a symmetrized graph (out_deg == undirected degree). Each round,
newly-removed vertices notify neighbors to decrement their residual
degree; fixpoint when nothing is removed. Output: ``in_core`` flag per
vertex (1 iff the vertex belongs to the k-core).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from raylinkgraph.bsp import Superstep


class KCore(Superstep):
    name = "kcore"
    state_dtypes = {"cur_deg": pa.int64(), "alive": pa.bool_(), "just_removed": pa.bool_()}
    scatter_columns = ["just_removed"]
    msg_dtypes = {"dec": pa.int64()}
    scalar_names = ["removed"]

    def __init__(self, k: int, max_rounds: int = 10_000):
        self.k = int(k)
        self.max_rounds = int(max_rounds)

    def params(self) -> dict:
        return {"k": self.k, "max_rounds": self.max_rounds}

    def init(self, oids, out_deg):
        removed = out_deg < self.k
        return (
            {
                "cur_deg": out_deg.astype(np.int64),
                "alive": ~removed,
                "just_removed": removed,
            },
            {"removed": float(removed.sum())},
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
        cur = state["cur_deg"].copy()
        alive = state["alive"].copy()
        if len(msgs["pos"]):
            cur -= np.bincount(
                msgs["pos"], weights=msgs["dec"], minlength=len(oids)
            ).astype(np.int64)
        just_removed = alive & (cur < self.k)
        alive = alive & ~just_removed
        return (
            {"cur_deg": cur, "alive": alive, "just_removed": just_removed},
            {"removed": float(just_removed.sum())},
        )

    def converged(self, scalars, completed_rounds):
        if completed_rounds >= self.max_rounds:
            return True
        return completed_rounds >= 1 and scalars["removed"] == 0.0
