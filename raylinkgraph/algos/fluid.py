"""Fluid communities (synchronous, pinned-deterministic variant).

Reference: flash_fluid_community (.gs_conf.yaml:615-628,
apps/flash/clustering/fluid-community.h:33-108): s seed communities,
per round every vertex adopts the label with maximal density
d_i = m_i / cnt_i (m_i = labeled-i neighbors + 1 if own label is i,
cnt_i = global size of community i from the PREVIOUS round), switching
only on STRICT improvement.

Pinned deviations (documented, mirrored exactly by the SQL oracle):
- seeds = the s smallest vertex ids (the reference uses time-seeded
  rand_r — not reproducible);
- fully synchronous rounds with a FIXED round budget (the reference's
  VertexMapSeq reads in-round updates worker-sequentially — order-
  dependent);
- density comparison is exact: m_i / cnt_i > m_j / cnt_j is evaluated
  as m_i * cnt_j > m_j * cnt_i in int64 (no float epsilon);
- winner = max density; own label wins ties; otherwise the smallest
  community index among the maxima (this is exactly the reference's
  ascending strict-improvement scan).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from raylinkgraph.bsp import Superstep


class FluidCommunities(Superstep):
    name = "fluid"
    scalar_names: list[str] = []  # set in __init__ (c0..c{s-1})

    def __init__(self, seeds, rounds: int = 8):
        self.seeds = np.asarray(sorted(int(x) for x in seeds), np.int64)
        self.s = len(self.seeds)
        self.rounds = int(rounds)
        self.state_dtypes = {"lab": pa.int64()}
        self.scatter_columns = ["lab"]
        self.msg_dtypes = {f"m{i}": pa.int64() for i in range(self.s)}
        self.scalar_names = [f"c{i}" for i in range(self.s)]

    def params(self) -> dict:
        return {"seeds": [int(x) for x in self.seeds], "rounds": self.rounds}

    def init(self, oids, out_deg):
        lab = np.full(len(oids), -1, np.int64)
        pos = np.searchsorted(oids, self.seeds)
        pos = pos[pos < len(oids)]
        # unique: seeds absent from this partition collapse onto the same
        # position, which would double-count the size partials below
        hit = np.unique(pos[np.isin(oids[pos], self.seeds)])
        lab[hit] = np.searchsorted(self.seeds, oids[hit])
        partials = {f"c{i}": 0.0 for i in range(self.s)}
        for i in lab[hit]:
            partials[f"c{int(i)}"] += 1.0
        return {"lab": lab}, partials

    def scatter(self, state, block, scalars):
        if len(block["udst_pos"]) == 0:
            return
        lab = state["lab"][block["src_pos"]][block["src_code"]]
        counts = {}
        live = np.zeros(len(block["udst"]), np.bool_)
        for i in range(self.s):
            vals = (lab == i).astype(np.int64)
            c = np.add.reduceat(vals, block["dst_ptr"][:-1])
            counts[i] = c
            live |= c > 0
        if not live.any():
            return
        tgt_ptr, pos = block["tgt_ptr"], block["udst_pos"]
        for q in range(len(tgt_ptr) - 1):
            lo, hi = tgt_ptr[q], tgt_ptr[q + 1]
            if lo >= hi:
                continue
            m = live[lo:hi]
            if m.any():
                yield q, pos[lo:hi][m], {
                    f"m{i}": counts[i][lo:hi][m] for i in range(self.s)
                }

    def apply(self, oids, out_deg, state, msgs, scalars):
        n = len(oids)
        lab = state["lab"]
        m = np.zeros((n, self.s), np.int64)
        if len(msgs["pos"]):
            for i in range(self.s):
                m[:, i] = np.bincount(
                    msgs["pos"], weights=msgs[f"m{i}"], minlength=n
                ).astype(np.int64)
        # own-label contribution (the reference's d[v.lab] += 1/cnt[lab])
        has = lab >= 0
        m[np.flatnonzero(has), lab[has]] += 1
        cnt = np.array(
            [max(int(scalars.get(f"c{i}", 0.0)), 0) for i in range(self.s)],
            np.int64,
        )
        # best = argmax_i m_i/cnt_i, own label wins ties, else smallest i;
        # exact rational comparison via cross-multiplication
        best = lab.copy()
        bm = np.where(has, m[np.arange(n), np.maximum(lab, 0)], 0)
        bc = np.where(has, cnt[np.maximum(lab, 0)], 1)
        for i in range(self.s):
            if cnt[i] == 0:
                continue
            mi = m[:, i]
            # d_i > d_best  <=>  m_i * cnt_best > m_best * cnt_i
            better = (mi > 0) & (
                (best < 0) | (mi * bc > bm * np.int64(cnt[i]))
            ) & (best != i)
            if better.any():
                best = np.where(better, i, best)
                bm = np.where(better, mi, bm)
                bc = np.where(better, cnt[i], bc)
        partials = {
            f"c{i}": float((best == i).sum()) for i in range(self.s)
        }
        return {"lab": best}, partials

    def converged(self, scalars, completed_rounds):
        return completed_rounds >= self.rounds


def run_fluid(graph, workdir: str, *, s: int = 10, rounds: int = 8,
              engine: str = "dataset"):
    """-> pandas (oid, lab): lab in [0, s) (community index by seed rank)
    or -1 for never-reached vertices."""
    from raylinkgraph.algos.centrality import smallest_oids

    if engine == "actors":
        from raylinkgraph.bsp_actors import run_bsp_actors as runner
    else:
        from raylinkgraph.bsp import run_bsp as runner

    seeds = smallest_oids(graph, s)
    res = runner(
        graph, FluidCommunities(seeds, rounds=rounds), workdir,
        max_rounds=rounds,
    )
    df = res.state_pandas()[["oid", "lab"]]
    return df.reset_index(drop=True)
