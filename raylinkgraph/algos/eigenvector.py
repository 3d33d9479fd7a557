"""Eigenvector centrality: (A^T + I) power iteration with L2 normalization.

Reference: eigenvector_centrality (.gs_conf.yaml:138; run flags
test/run_app.cc:36-38), NetworkX semantics:
  x0 = 1/n; per round y = xlast + A^T xlast; x = y/||y||_2;
  stop when sum|x - xlast| < n*tol.

The L2 norm is a GLOBAL scalar needed mid-round, so normalization is
deferred one superstep: state holds the raw ``y`` plus the previous
normalized ``x_prev``; each round normalizes the previous ``y`` with the
norm scalar reduced by the driver last round, then adds messages. The
convergence check therefore lags one round (one extra cheap superstep);
the converged nx value is the ``x_prev`` column of the final state. For
fixed-round runs (tol=0), normalize ``y`` by sqrt(scalars['sumsq']).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from raylinkgraph.bsp import Superstep


class Eigenvector(Superstep):
    name = "eigenvector"
    state_dtypes = {"y": pa.float64(), "x_prev": pa.float64()}
    scatter_columns = ["y"]
    msg_dtypes = {"val": pa.float64()}
    static_messages = True
    scalar_names = ["err", "sumsq"]

    def __init__(self, n_vertices: int, tol: float = 1e-6, max_rounds: int = 100):
        self.n = int(n_vertices)
        self.tol = float(tol)
        self.max_rounds = int(max_rounds)

    def params(self) -> dict:
        return {"n": self.n, "tol": self.tol, "max_rounds": self.max_rounds}

    def init(self, oids, out_deg):
        x0 = np.full(len(oids), 1.0 / self.n)
        # sumsq is rigged so round 1 normalizes by 1 (nx uses x0 unscaled)
        return (
            {"y": x0, "x_prev": x0.copy()},
            {"err": float("inf"), "sumsq": float(len(oids)) / self.n},
        )

    def _norm(self, scalars) -> float:
        return math.sqrt(scalars["sumsq"]) or 1.0

    def scatter(self, state, block, scalars):
        xcur = state["y"] / self._norm(scalars)
        if len(block["udst_pos"]) == 0:
            return
        per_edge = xcur[block["src_pos"]][block["src_code"]]
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
        x_cur = state["y"] / self._norm(scalars)
        agg = np.zeros(n_local)
        if len(msgs["pos"]):
            agg = np.bincount(msgs["pos"], weights=msgs["val"], minlength=n_local)
        y_new = x_cur + agg  # (A^T + I) x
        partials = {
            "err": float(np.abs(x_cur - state["x_prev"]).sum()),
            "sumsq": float((y_new**2).sum()),
        }
        return {"y": y_new, "x_prev": x_cur}, partials

    def converged(self, scalars, completed_rounds):
        if completed_rounds >= self.max_rounds:
            return True
        # err lags one round: it compares x_{k-1} with x_{k-2}
        return (
            self.tol > 0
            and completed_rounds >= 2
            and scalars["err"] < self.n * self.tol
        )
