"""BFS / unweighted SSSP: frontier-based min-distance propagation.

Reference: grape::BFSOpt / bfs_generic
(coordinator .gs_conf.yaml:42,150; run flags test/run_app.cc:63-66) —
source vertex, hop distances, frontier expansion each round. Unreachable
vertices keep ``UNREACHED`` (int64 max); callers usually filter or map it
to -1. On a directed graph distances follow out-edges; symmetrize for the
undirected variant.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from raylinkgraph.bsp import Superstep

UNREACHED = np.iinfo(np.int64).max


class BFS(Superstep):
    name = "bfs"
    state_dtypes = {"dist": pa.int64(), "changed": pa.bool_()}
    scatter_columns = ["dist", "changed"]
    msg_dtypes = {"cand": pa.int64()}
    scalar_names = ["active"]

    def __init__(self, source: int, max_rounds: int = 10_000,
                 depth_limit: int | None = None):
        # depth_limit: bfs_generic's bounded expansion (run_app.cc:63-66)
        # — round r settles exactly distance r, so capping rounds at the
        # limit yields distances <= depth_limit
        self.source = int(source)
        self.max_rounds = int(max_rounds)
        self.depth_limit = depth_limit if depth_limit is None else int(depth_limit)

    def params(self) -> dict:
        return {
            "source": self.source,
            "max_rounds": self.max_rounds,
            "depth_limit": self.depth_limit,
        }

    def init(self, oids, out_deg):
        dist = np.full(len(oids), UNREACHED)
        changed = oids == self.source
        dist[changed] = 0
        return (
            {"dist": dist, "changed": changed},
            {"active": float(changed.sum())},
        )

    def scatter(self, state, block, scalars):
        if len(block["udst_pos"]) == 0:
            return
        dist = state["dist"][block["src_pos"]]
        active = state["changed"][block["src_pos"]]
        vals = np.where(active, dist, UNREACHED - 1)[block["src_code"]]
        mins = np.minimum.reduceat(vals, block["dst_ptr"][:-1])
        live = mins < UNREACHED - 1
        if not live.any():
            return
        tgt_ptr, pos = block["tgt_ptr"], block["udst_pos"]
        for q in range(len(tgt_ptr) - 1):
            lo, hi = tgt_ptr[q], tgt_ptr[q + 1]
            if lo >= hi:
                continue
            m = live[lo:hi]
            if m.any():
                yield q, pos[lo:hi][m], {"cand": mins[lo:hi][m] + 1}

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
        if self.depth_limit is not None and completed_rounds >= self.depth_limit:
            return True
        if completed_rounds >= self.max_rounds:
            return True
        return completed_rounds >= 1 and scalars["active"] == 0.0
