"""PageRank with NetworkX semantics.

Reference: gs::PageRankNetworkX,
analytical_engine/apps/pagerank/pagerank_networkx.h:36-167 —
  init rank = 1/N                                  (:62-74)
  per round, v:  sum_{(u,v)} rank(u)/out_deg(u)    (:118-133)
  rank' = alpha*sum + (1-alpha)/N + alpha*dangling_sum/N   (:117,132)
  dangling_sum = Σ rank(u) over out_deg(u)==0      (:82-85,159-160)
  stop when Σ|rank'-rank| < tol*N, or after max_round rounds (:145-148)

Directed graphs propagate along out-edges (the CSR build's native
direction); undirected semantics = run on the symmetrized graph (same as
NetworkX converting Graph -> DiGraph with both arcs).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from raylinkgraph.bsp import Superstep


class PageRank(Superstep):
    name = "pagerank"
    state_dtypes = {"rank": pa.float64(), "share": pa.float64()}
    scatter_columns = ["share"]
    msg_dtypes = {"val": pa.float64()}
    static_messages = True
    scalar_names = ["dangling", "l1", "rank_sum"]
    # per-superstep checkpoint = the rank vector alone: share is
    # rank/out_deg (rehydrate) and oids come from vertexstate order —
    # 3x less checkpoint IO on the superstep critical path
    ckpt_exclude = ["share"]
    ckpt_implicit_oid = True

    def rehydrate(self, state, oids, out_deg):
        rank = state["rank"]
        state["share"] = np.divide(
            rank, out_deg, out=np.zeros(len(rank)), where=out_deg > 0
        )
        return state

    def __init__(self, n_vertices: int, alpha: float = 0.85, tol: float = 1e-6,
                 max_rounds: int = 100, msg_dtype: str = "f8"):
        self.n = int(n_vertices)
        self.alpha = float(alpha)
        self.tol = float(tol)
        self.max_rounds = int(max_rounds)
        # "f4": ship message values as float32 (halves the per-superstep
        # transfer stream; abs error ~1e-13 per message, far below the
        # 1e-6 tolerance). Default float64 for bit-stable oracle parity.
        self.msg_dtype = msg_dtype
        if msg_dtype == "f4":
            self.msg_dtypes = {"val": pa.float32()}

    def params(self) -> dict:
        return {
            "n": self.n,
            "alpha": self.alpha,
            "tol": self.tol,
            "max_rounds": self.max_rounds,
            "msg_dtype": self.msg_dtype,
        }

    def init(self, oids, out_deg):
        n_local = len(oids)
        rank = np.full(n_local, 1.0 / self.n)
        share = np.divide(rank, out_deg, out=np.zeros(n_local), where=out_deg > 0)
        partials = {
            "dangling": float(rank[out_deg == 0].sum()),
            "l1": float("inf") if n_local else 0.0,
            "rank_sum": float(rank.sum()),
        }
        return {"rank": rank, "share": share}, partials

    def scatter(self, state, block, scalars):
        share = state["share"]
        if len(block["udst_pos"]) == 0:
            return
        per_edge = share[block["src_pos"]][block["src_code"]]
        sums = np.bincount(
            block["dst_code"], weights=per_edge, minlength=len(block["udst_pos"])
        )
        if self.msg_dtype == "f4":
            sums = sums.astype(np.float32)
        tgt_ptr, pos = block["tgt_ptr"], block["udst_pos"]
        for q in range(len(tgt_ptr) - 1):
            lo, hi = tgt_ptr[q], tgt_ptr[q + 1]
            if lo < hi:
                yield q, pos[lo:hi], {"val": sums[lo:hi]}

    def apply_chunks(self, oids, out_deg, state, chunks, scalars):
        """Chunk-wise reduce (resident engine): per-sender bincounts summed
        into one dense accumulator — no message concatenation."""
        n_local = len(oids)
        agg = np.zeros(n_local)
        for pos, payload in chunks:
            agg += np.bincount(pos, weights=payload["val"], minlength=n_local)
        return self._finish(oids, out_deg, state, agg, scalars)

    def apply(self, oids, out_deg, state, msgs, scalars):
        n_local = len(oids)
        agg = np.zeros(n_local)
        if len(msgs["pos"]):
            agg = np.bincount(msgs["pos"], weights=msgs["val"], minlength=n_local)
        return self._finish(oids, out_deg, state, agg, scalars)

    def _finish(self, oids, out_deg, state, agg, scalars):
        n_local = len(oids)
        dangling = scalars["dangling"]
        base = (1.0 - self.alpha) / self.n + self.alpha * dangling / self.n
        new_rank = self.alpha * agg + base
        share = np.divide(
            new_rank, out_deg, out=np.zeros(n_local), where=out_deg > 0
        )
        partials = {
            "dangling": float(new_rank[out_deg == 0].sum()),
            "l1": float(np.abs(new_rank - state["rank"]).sum()),
            "rank_sum": float(new_rank.sum()),
        }
        return {"rank": new_rank, "share": share}, partials

    def converged(self, scalars, completed_rounds):
        if completed_rounds >= self.max_rounds:
            return True
        return completed_rounds >= 1 and scalars["l1"] < self.n * self.tol


class WeightedPageRank(PageRank):
    """PageRank over a weighted graph: rank mass leaves u along edge
    (u, v) in proportion to the edge's share of u's total out-weight
    (networkx.pagerank(weight=...) semantics; the reference runs the
    same built-in over weight-projected property graphs,
    analytical_engine/apps/pagerank/pagerank_networkx.h:118-133 with
    edata weights).

    The graph must be built with ``weight_col`` holding the PRE-NORMALIZED
    transition weight w(u,v)/Σ_x w(u,x) (one bucketed groupby at build
    time — see tpch_graph.pp_transition_edges). That keeps the superstep
    a pure gather-scatter: message = rank(u) · t(u,v), no per-round
    division, and the scatter stream stays identical in shape to the
    unweighted variant (static message positions, f4-able payloads).
    Dangling mass handling is unchanged (out_deg == 0 vertices).
    """

    name = "wpagerank"
    # share IS the rank for the weighted variant (division happened at
    # build time inside the transition weights)
    ckpt_exclude = ["share"]

    def rehydrate(self, state, oids, out_deg):
        state["share"] = state["rank"].copy()
        return state

    def init(self, oids, out_deg):
        state, partials = super().init(oids, out_deg)
        state["share"] = state["rank"].copy()
        return state, partials

    def scatter(self, state, block, scalars):
        share = state["share"]
        if len(block["udst_pos"]) == 0:
            return
        per_edge = share[block["src_pos"]][block["src_code"]] * block["weight"]
        sums = np.bincount(
            block["dst_code"], weights=per_edge, minlength=len(block["udst_pos"])
        )
        if self.msg_dtype == "f4":
            sums = sums.astype(np.float32)
        tgt_ptr, pos = block["tgt_ptr"], block["udst_pos"]
        for q in range(len(tgt_ptr) - 1):
            lo, hi = tgt_ptr[q], tgt_ptr[q + 1]
            if lo < hi:
                yield q, pos[lo:hi], {"val": sums[lo:hi]}

    def _finish(self, oids, out_deg, state, agg, scalars):
        n_local = len(oids)
        dangling = scalars["dangling"]
        base = (1.0 - self.alpha) / self.n + self.alpha * dangling / self.n
        new_rank = self.alpha * agg + base
        partials = {
            "dangling": float(new_rank[out_deg == 0].sum()),
            "l1": float(np.abs(new_rank - state["rank"]).sum()),
            "rank_sum": float(new_rank.sum()),
        }
        return {"rank": new_rank, "share": new_rank.copy()}, partials
