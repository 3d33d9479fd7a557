"""ArticleRank and Personalized PageRank — PageRank-family supersteps.

Reference: flash_articlerank (.gs_conf.yaml:314,
apps/flash/ranking/articlerank.h) and flash_ppr (.gs_conf.yaml:321,
apps/flash/ranking/ppr.h). Pinned specs:

ArticleRank (no dangling redistribution; damping toward uniform):
  avg_deg = E / N  (directed edge count over vertex count)
  ar0 = 1/N;  ar'(v) = (1-a)/N + a * sum_{u->v} ar(u) / (outdeg(u) + avg_deg)

Personalized PageRank (teleport wholly to the source; dangling mass
returns to the source):
  r0 = e_src;  r'(v) = (1-a)*e_src(v) + a*(sum_{u->v} r(u)/outdeg(u)
                                           + dangling_sum * e_src(v))
Both run a fixed round budget (driver-checkable as unrolled SQL)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from raylinkgraph.bsp import Superstep


class ArticleRank(Superstep):
    name = "articlerank"
    state_dtypes = {"ar": pa.float64(), "share": pa.float64()}
    scatter_columns = ["share"]
    msg_dtypes = {"val": pa.float64()}
    static_messages = True
    scalar_names = ["l1"]

    def __init__(self, n_vertices: int, n_edges: int, alpha: float = 0.85,
                 max_rounds: int = 10):
        self.n = int(n_vertices)
        self.avg_deg = float(n_edges) / float(n_vertices)
        self.alpha = float(alpha)
        self.max_rounds = int(max_rounds)

    def params(self) -> dict:
        return {
            "n": self.n, "avg_deg": self.avg_deg, "alpha": self.alpha,
            "max_rounds": self.max_rounds,
        }

    def init(self, oids, out_deg):
        ar = np.full(len(oids), 1.0 / self.n)
        share = ar / (out_deg + self.avg_deg)
        return {"ar": ar, "share": share}, {"l1": float("inf") if len(oids) else 0.0}

    def scatter(self, state, block, scalars):
        share = state["share"]
        if len(block["udst_pos"]) == 0:
            return
        per_edge = share[block["src_pos"]][block["src_code"]]
        sums = np.bincount(
            block["dst_code"], weights=per_edge, minlength=len(block["udst_pos"])
        )
        tgt_ptr, pos = block["tgt_ptr"], block["udst_pos"]
        for q in range(len(tgt_ptr) - 1):
            lo, hi = tgt_ptr[q], tgt_ptr[q + 1]
            if lo < hi:
                yield q, pos[lo:hi], {"val": sums[lo:hi]}

    def apply(self, oids, out_deg, state, msgs, scalars):
        agg = np.zeros(len(oids))
        if len(msgs["pos"]):
            agg = np.bincount(msgs["pos"], weights=msgs["val"], minlength=len(oids))
        new = (1.0 - self.alpha) / self.n + self.alpha * agg
        share = new / (out_deg + self.avg_deg)
        return (
            {"ar": new, "share": share},
            {"l1": float(np.abs(new - state["ar"]).sum())},
        )

    def converged(self, scalars, completed_rounds):
        return completed_rounds >= self.max_rounds


class PPR(Superstep):
    name = "ppr"
    state_dtypes = {"r": pa.float64(), "share": pa.float64()}
    scatter_columns = ["share"]
    msg_dtypes = {"val": pa.float64()}
    static_messages = True
    scalar_names = ["dangling"]

    def __init__(self, source: int, alpha: float = 0.85, max_rounds: int = 15):
        self.source = int(source)
        self.alpha = float(alpha)
        self.max_rounds = int(max_rounds)

    def params(self) -> dict:
        return {
            "source": self.source, "alpha": self.alpha,
            "max_rounds": self.max_rounds,
        }

    def init(self, oids, out_deg):
        r = (oids == self.source).astype(np.float64)
        share = np.divide(r, out_deg, out=np.zeros(len(oids)), where=out_deg > 0)
        return (
            {"r": r, "share": share},
            {"dangling": float(r[out_deg == 0].sum())},
        )

    def scatter(self, state, block, scalars):
        share = state["share"]
        if len(block["udst_pos"]) == 0:
            return
        per_edge = share[block["src_pos"]][block["src_code"]]
        sums = np.bincount(
            block["dst_code"], weights=per_edge, minlength=len(block["udst_pos"])
        )
        tgt_ptr, pos = block["tgt_ptr"], block["udst_pos"]
        for q in range(len(tgt_ptr) - 1):
            lo, hi = tgt_ptr[q], tgt_ptr[q + 1]
            if lo < hi:
                yield q, pos[lo:hi], {"val": sums[lo:hi]}

    def apply(self, oids, out_deg, state, msgs, scalars):
        n_local = len(oids)
        agg = np.zeros(n_local)
        if len(msgs["pos"]):
            agg = np.bincount(msgs["pos"], weights=msgs["val"], minlength=n_local)
        e_src = (oids == self.source).astype(np.float64)
        new = (1.0 - self.alpha) * e_src + self.alpha * (
            agg + scalars["dangling"] * e_src
        )
        share = np.divide(new, out_deg, out=np.zeros(n_local), where=out_deg > 0)
        return (
            {"r": new, "share": share},
            {"dangling": float(new[out_deg == 0].sum())},
        )

    def converged(self, scalars, completed_rounds):
        return completed_rounds >= self.max_rounds
