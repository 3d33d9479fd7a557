"""A THIRD-PARTY custom algorithm on the Superstep UDF surface.

This file is written the way a user of the engine would write it — it
imports only the public surface (`raylinkgraph.bsp.Superstep`,
`run_bsp` / `run_bsp_actors`, `PropertyGraph` loaders) and defines an
algorithm the library does not ship: the Pregel paper's introductory
example, *maximum-value propagation* (Malewicz et al., SIGMOD'10 §1.1;
the reference's equivalent user surfaces are the Pregel
IPregelProgram{Init,Compute} C++ protocol,
analytical_engine/core/app/pregel/i_vertex_program.h:45-92, and the
@pregel Cython decorator, python/graphscope/analytical/udf/decorators.py:51).

Every vertex starts with a deterministic pseudo-random value; each
round, vertices that changed last round offer their value to their
neighbors, and each vertex keeps the maximum it has seen. At fixpoint
every vertex in a (weakly) connected component holds the component's
global maximum.

Run it:  python examples/max_value_udf.py
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from raylinkgraph.bsp import Superstep

_MIX = np.int64(2654435761)  # Knuth multiplicative hash
_MOD = np.int64(1_000_003)


class MaxValue(Superstep):
    """User-defined max-propagation. The engine contract (see docs/UDF.md):

    * ``init`` returns the per-partition state arrays + scalar partials.
    * ``scatter`` reads one CSR block and yields pre-combined messages
      ``(target_pid, positions, payload)`` — one row per unique
      destination, already reduced (here: max) across the block's edges.
    * ``apply`` folds the unordered concatenated messages into new state
      arrays (never mutating the old ones) and returns scalar partials.
    * ``converged`` reads the summed scalars.
    """

    name = "max_value_udf"
    state_dtypes = {"val": pa.int64(), "changed": pa.bool_()}
    scatter_columns = ["val", "changed"]
    msg_dtypes = {"cand": pa.int64()}
    scalar_names = ["active"]

    def init(self, oids, out_deg):
        val = (oids.astype(np.int64) * _MIX) % _MOD
        return (
            {"val": val, "changed": np.ones(len(oids), np.bool_)},
            {"active": float(len(oids))},
        )

    def scatter(self, state, block, scalars):
        if len(block["udst_pos"]) == 0:
            return
        src_val = state["val"][block["src_pos"]]
        src_live = state["changed"][block["src_pos"]]
        # per-edge values; silenced (-1) when the source didn't change
        vals = np.where(src_live, src_val, np.int64(-1))[block["src_code"]]
        # segment max per unique destination (edges grouped by dst)
        maxs = np.maximum.reduceat(vals, block["dst_ptr"][:-1])
        live = maxs >= 0
        if not live.any():
            return
        tgt_ptr, pos = block["tgt_ptr"], block["udst_pos"]
        for q in range(len(tgt_ptr) - 1):
            lo, hi = tgt_ptr[q], tgt_ptr[q + 1]
            if lo >= hi:
                continue
            m = live[lo:hi]
            if m.any():
                yield q, pos[lo:hi][m], {"cand": maxs[lo:hi][m]}

    def apply(self, oids, out_deg, state, msgs, scalars):
        val = state["val"].copy()
        changed = np.zeros(len(oids), np.bool_)
        if len(msgs["pos"]):
            pos = msgs["pos"]
            order = np.argsort(pos, kind="stable")
            ps, cs = pos[order], msgs["cand"][order]
            starts = np.flatnonzero(np.r_[True, np.diff(ps) > 0])
            maxs = np.maximum.reduceat(cs, starts)
            upos = ps[starts]
            better = maxs > val[upos]
            val[upos[better]] = maxs[better]
            changed[upos[better]] = True
        return ({"val": val, "changed": changed}, {"active": float(changed.sum())})

    def converged(self, scalars, completed_rounds):
        return scalars["active"] == 0


def main() -> None:
    import os
    import tempfile

    from raylinkgraph.bsp import run_bsp
    from raylinkgraph.sources.datasets import load_p2p_network

    root = tempfile.mkdtemp(prefix="maxval-")
    g = load_p2p_network().to_simple(
        os.path.join(root, "graph"), P=4, symmetrize=True
    )
    res = run_bsp(g, MaxValue(), os.path.join(root, "work"), max_rounds=1000)
    df = res.state_pandas()
    print(df[["oid", "val"]].head(10).to_string(index=False))
    print(f"rounds={res.rounds} converged={res.converged}")


if __name__ == "__main__":
    main()
