"""HITS: hubs & authorities power iteration, phase-alternating BSP.

Reference: gs::HITS (analytical_engine/apps/hits/hits.h:30; flags
test/run_app.cc:40-44). NetworkX's hits() is scipy-backed in this
environment, so the pinned semantics are our own scipy-free spec (the
classic iteration, sum-normalized each half-step — `hits_oracle` in
oracle/reference.py is the single-process ground truth):

  h0 = 1/n; per iteration:
    a = A^T h;  a /= sum(a)
    h = A  a;   h /= sum(h)
  fixed ``max_iter`` iterations; outputs are the normalized vectors.

Hub updates need REVERSE edges, which a single CSR can't scatter, so the
graph is AUGMENTED: every original edge (u,v) becomes (u,v,flag|=1) and
(v,u,flag|=2) (build with weight_col="flag", dedup_weight="sum" — a pair
present in both directions gets flag 3). One superstep = one half-step;
the phase and the normalizer travel as scalars (phase emitted as
n_local/n partials so the driver's sum reconstructs it; normalization is
applied lazily by the NEXT phase's scatter, like the eigenvector lag).
Run exactly 2*max_iter supersteps.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from raylinkgraph.bsp import Superstep


def augment_edges_ds(edges):
    """(src_id, dst_id) Dataset -> direction-flagged augmented edge
    Dataset: every edge (u,v) becomes (u,v,flag=1) and (v,u,flag=2),
    emitted per Arrow batch (streams; nothing is collected on the driver).
    Feed to LinkGraph.build(weight_col="flag", dedup_weight="sum")."""
    import numpy as np

    def aug(batch: pa.Table) -> pa.Table:
        src = batch.column("src_id").to_numpy(zero_copy_only=False)
        dst = batch.column("dst_id").to_numpy(zero_copy_only=False)
        n = len(src)
        return pa.table(
            {
                "src_id": pa.array(np.concatenate([src, dst]), pa.int64()),
                "dst_id": pa.array(np.concatenate([dst, src]), pa.int64()),
                "flag": pa.array(
                    np.concatenate([np.ones(n), np.full(n, 2.0)]), pa.float64()
                ),
            }
        )

    return edges.map_batches(aug, batch_format="pyarrow")


class HITS(Superstep):
    name = "hits"
    state_dtypes = {"a": pa.float64(), "h": pa.float64()}
    scatter_columns = ["a", "h"]
    msg_dtypes = {"val": pa.float64()}
    scalar_names = ["phase", "norm", "nloc"]

    def __init__(self, n_vertices: int, max_iter: int = 50):
        self.n = int(n_vertices)
        self.max_iter = int(max_iter)
        self.max_rounds = 2 * self.max_iter

    def params(self) -> dict:
        return {"n": self.n, "max_iter": self.max_iter}

    def init(self, oids, out_deg):
        n_local = len(oids)
        h = np.full(n_local, 1.0 / self.n)
        a = np.zeros(n_local)
        return (
            {"a": a, "h": h},
            # next phase 0 (auth update); h is already sum-normalized
            {"phase": 0.0, "norm": float(h.sum()), "nloc": float(n_local)},
        )

    def scatter(self, state, block, scalars):
        if len(block["udst_pos"]) == 0:
            return
        phase = int(round(scalars["phase"]))
        norm = scalars["norm"] or 1.0
        flags = block["weight"]
        if phase == 0:  # auth update: h flows along FORWARD edges
            vec = state["h"] / norm
            gate = np.mod(flags, 2.0)          # bit 1
        else:  # hub update: a flows along REVERSE edges
            vec = state["a"] / norm
            gate = np.floor(flags / 2.0)       # bit 2
        per_edge = vec[block["src_pos"]][block["src_code"]] * gate
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
        phase = int(round(scalars["phase"]))
        agg = np.zeros(n_local)
        if len(msgs["pos"]):
            agg = np.bincount(msgs["pos"], weights=msgs["val"], minlength=n_local)
        if phase == 0:
            new = {"a": agg, "h": state["h"]}
        else:
            new = {"a": state["a"], "h": agg}
        partials = {
            "phase": (1.0 - phase) * n_local / self.n,
            "norm": float(agg.sum()),
            "nloc": float(n_local),
        }
        return new, partials

    def converged(self, scalars, completed_rounds):
        return completed_rounds >= self.max_rounds

    def finalize(self, state_df, scalars):
        """Normalize the final vectors: the last phase (1, hub update)
        leaves h un-normalized with sum in scalars['norm']; a was
        normalized by the preceding phase-0 norm, which the scatter of
        the final round already consumed — re-normalize both by their
        sums for the canonical output."""
        out = state_df.copy()
        for col in ("a", "h"):
            s = out[col].sum()
            if s:
                out[col] = out[col] / s
        return out


def hits_oracle(edges_df, n_vertices: int, max_iter: int = 50):
    """Single-process ground truth (same pinned semantics)."""
    import pandas as pd

    src = edges_df["src_id"].to_numpy()
    dst = edges_df["dst_id"].to_numpy()
    oids = np.union1d(np.unique(src), np.unique(dst))
    si = np.searchsorted(oids, src)
    di = np.searchsorted(oids, dst)
    n = len(oids)
    h = np.full(n, 1.0 / n_vertices)
    a = np.zeros(n)
    for _ in range(max_iter):
        a = np.bincount(di, weights=h[si], minlength=n)
        a = a / (a.sum() or 1.0)
        h = np.bincount(si, weights=a[di], minlength=n)
        h = h / (h.sum() or 1.0)
    return pd.DataFrame({"oid": oids, "a": a / (a.sum() or 1.0), "h": h / (h.sum() or 1.0)})
