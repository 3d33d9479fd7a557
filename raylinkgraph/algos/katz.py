"""Katz centrality: attenuated walk-sum power iteration.

Reference: katz_centrality (.gs_conf.yaml:144; run flags
test/run_app.cc:49-54), NetworkX semantics:
  x0 = 0;  x' = alpha * (A^T x) + beta;  stop when sum|x'-x| < n*tol;
  final L2 normalization is applied by the caller from the ``sumsq``
  scalar (nx normalized=True).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from raylinkgraph.bsp import Superstep


class Katz(Superstep):
    name = "katz"
    state_dtypes = {"x": pa.float64()}
    scatter_columns = ["x"]
    msg_dtypes = {"val": pa.float64()}
    static_messages = True
    scalar_names = ["err", "sumsq"]

    def __init__(self, alpha: float = 0.1, beta: float = 1.0, tol: float = 1e-6,
                 max_rounds: int = 1000, n_vertices: int = 0):
        self.alpha = float(alpha)
        self.beta = float(beta)
        self.tol = float(tol)
        self.max_rounds = int(max_rounds)
        self.n = int(n_vertices)

    def params(self) -> dict:
        return {
            "alpha": self.alpha, "beta": self.beta, "tol": self.tol,
            "max_rounds": self.max_rounds, "n": self.n,
        }

    def init(self, oids, out_deg):
        x = np.zeros(len(oids))
        return {"x": x}, {"err": float("inf"), "sumsq": 0.0}

    def scatter(self, state, block, scalars):
        x = state["x"]
        if len(block["udst_pos"]) == 0:
            return
        per_edge = x[block["src_pos"]][block["src_code"]]
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
        new_x = self.alpha * agg + self.beta
        partials = {
            "err": float(np.abs(new_x - state["x"]).sum()),
            "sumsq": float((new_x**2).sum()),
        }
        return {"x": new_x}, partials

    def converged(self, scalars, completed_rounds):
        if completed_rounds >= self.max_rounds:
            return True
        return completed_rounds >= 1 and scalars["err"] < self.n * self.tol
