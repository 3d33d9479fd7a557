"""Betweenness centrality: multi-source Brandes as ONE BSP job pair.

Reference: betweenness_centrality / betweenness_centrality_generic
(.gs_conf.yaml:286-293, flash_bc yaml:573). Exact betweenness needs a
Brandes pass from EVERY vertex (O(V*E)); the production shape is the
standard sampled-source estimate (NetworkX's ``k=`` parameter): run the
phases from a deterministic source set and sum the dependencies.

All S (<=32) sources run SIMULTANEOUSLY — state/message payloads carry
one column per source (dist_i, sigma_i / val_i), so the whole sampled
estimate costs one forward job (rounds = max BFS depth) plus one
backward job (rounds = that depth) instead of 2*S jobs; per-round work
is S bincounts over the same CSR gather.

Phase 1 (forward): frontier BFS accumulating shortest-path counts — a
vertex settled at round r gets sigma = sum of sigmas of its round-(r-1)
in-neighbors.

Phase 2 (backward): dependency accumulation down the BFS DAG, one
absolute level per superstep (round t's senders are vertices at level
maxlev - t; sources whose own eccentricity is smaller simply have no
vertices that deep). Senders ship (1 + delta)/sigma to ALL neighbors and
only receivers exactly one level up accept, checked against their own
dist — no per-edge predecessor lists are materialized. The backward
job's init reads the forward job's final checkpoint for its own
partition (home pid = hash(oid) % P is recoverable from any owned oid).

bc(v) = sum over sources s != v of delta_s(v) (Brandes' `w != s` guard).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

from raylinkgraph.bsp import Superstep
from raylinkgraph.functions.hashing import partition_of
from raylinkgraph.state import checkpoint as ckpt

UNREACHED = np.iinfo(np.int64).max


class BrandesForward(Superstep):
    name = "brfwd"

    def __init__(self, sources, max_rounds: int = 10_000):
        self.sources = [int(s) for s in sorted(sources)]
        if len(self.sources) > 32:
            raise ValueError("at most 32 simultaneous sources")
        self.S = len(self.sources)
        self.max_rounds = int(max_rounds)
        self.state_dtypes = {}
        for i in range(self.S):
            self.state_dtypes[f"dist_{i}"] = pa.int64()
            self.state_dtypes[f"sigma_{i}"] = pa.float64()
            self.state_dtypes[f"fresh_{i}"] = pa.bool_()
        self.scatter_columns = list(self.state_dtypes)
        self.msg_dtypes = {f"sig_{i}": pa.float64() for i in range(self.S)}

    scalar_names = ["active"]

    def params(self) -> dict:
        return {"sources": self.sources, "max_rounds": self.max_rounds}

    def init(self, oids, out_deg):
        n = len(oids)
        state = {}
        active = 0.0
        for i, s in enumerate(self.sources):
            dist = np.full(n, UNREACHED)
            sigma = np.zeros(n)
            fresh = oids == s
            dist[fresh] = 0
            sigma[fresh] = 1.0
            state[f"dist_{i}"] = dist
            state[f"sigma_{i}"] = sigma
            state[f"fresh_{i}"] = fresh
            active += float(fresh.sum())
        return state, {"active": active}

    def scatter(self, state, block, scalars):
        nseg = len(block["udst_pos"])
        if nseg == 0:
            return
        sums = {}
        any_live = np.zeros(nseg, np.bool_)
        for i in range(self.S):
            fresh = state[f"fresh_{i}"][block["src_pos"]]
            if not fresh.any():
                sums[i] = None
                continue
            sig = np.where(fresh, state[f"sigma_{i}"][block["src_pos"]], 0.0)
            per_edge = sig[block["src_code"]]
            s = np.bincount(block["dst_code"], weights=per_edge, minlength=nseg)
            sums[i] = s
            any_live |= s > 0
        if not any_live.any():
            return
        zeros = np.zeros(nseg)
        tgt_ptr, pos = block["tgt_ptr"], block["udst_pos"]
        for q in range(len(tgt_ptr) - 1):
            lo, hi = tgt_ptr[q], tgt_ptr[q + 1]
            if lo >= hi:
                continue
            m = any_live[lo:hi]
            if m.any():
                payload = {
                    f"sig_{i}": (sums[i] if sums[i] is not None else zeros)[lo:hi][m]
                    for i in range(self.S)
                }
                yield q, pos[lo:hi][m], payload

    def apply(self, oids, out_deg, state, msgs, scalars):
        r = int(scalars["_round"]) + 1
        n = len(oids)
        new_state = {}
        active = 0.0
        pos = msgs["pos"]
        agg = {}
        if len(pos):
            order = np.argsort(pos, kind="stable")
            ps = pos[order]
            starts = np.flatnonzero(np.r_[True, np.diff(ps) > 0])
            upos = ps[starts]
            for i in range(self.S):
                agg[i] = (upos, np.add.reduceat(msgs[f"sig_{i}"][order], starts))
        for i in range(self.S):
            dist = state[f"dist_{i}"].copy()
            sigma = state[f"sigma_{i}"].copy()
            fresh = np.zeros(n, np.bool_)
            if i in agg:
                upos, sums = agg[i]
                new = (dist[upos] == UNREACHED) & (sums > 0)
                up, sm = upos[new], sums[new]
                dist[up] = r
                sigma[up] = sm
                fresh[up] = True
                active += float(len(up))
            new_state[f"dist_{i}"] = dist
            new_state[f"sigma_{i}"] = sigma
            new_state[f"fresh_{i}"] = fresh
        return new_state, {"active": active}

    def converged(self, scalars, completed_rounds):
        if completed_rounds >= self.max_rounds:
            return True
        return completed_rounds >= 1 and scalars["active"] == 0.0


class BrandesBackward(Superstep):
    name = "brback"
    scalar_names = ["touched"]

    def __init__(self, P: int, fwd_workdir: str, fwd_step: int, maxlev: int,
                 sources):
        self.P = int(P)
        self.fwd_workdir = fwd_workdir
        self.fwd_step = int(fwd_step)
        self.maxlev = int(maxlev)
        self.sources = [int(s) for s in sorted(sources)]
        self.S = len(self.sources)
        self.state_dtypes = {}
        for i in range(self.S):
            self.state_dtypes[f"dist_{i}"] = pa.int64()
            self.state_dtypes[f"sigma_{i}"] = pa.float64()
            self.state_dtypes[f"delta_{i}"] = pa.float64()
        self.scatter_columns = list(self.state_dtypes)
        self.msg_dtypes = {f"val_{i}": pa.float64() for i in range(self.S)}

    def params(self) -> dict:
        return {
            "P": self.P,
            "fwd": self.fwd_workdir,
            "fwd_step": self.fwd_step,
            "maxlev": self.maxlev,
            "sources": self.sources,
        }

    def init(self, oids, out_deg):
        n = len(oids)
        state = {}
        if n == 0:
            for i in range(self.S):
                state[f"dist_{i}"] = np.zeros(0, np.int64)
                state[f"sigma_{i}"] = np.zeros(0)
                state[f"delta_{i}"] = np.zeros(0)
            return state, {"touched": 0.0}
        pid = int(partition_of(oids[:1], self.P)[0])  # home pid of any oid
        t = ckpt.read_state(self.fwd_workdir, self.fwd_step, pid)
        for i in range(self.S):
            state[f"dist_{i}"] = t.column(f"dist_{i}").to_numpy(zero_copy_only=False).copy()
            state[f"sigma_{i}"] = t.column(f"sigma_{i}").to_numpy(zero_copy_only=False).copy()
            state[f"delta_{i}"] = np.zeros(n)
        return state, {"touched": 0.0}

    def scatter(self, state, block, scalars):
        nseg = len(block["udst_pos"])
        if nseg == 0:
            return
        lev = self.maxlev - int(scalars["_round"])  # this round's sender level
        sums = {}
        any_live = np.zeros(nseg, np.bool_)
        for i in range(self.S):
            dist = state[f"dist_{i}"][block["src_pos"]]
            send = dist == lev
            if not send.any():
                sums[i] = None
                continue
            sigma = state[f"sigma_{i}"][block["src_pos"]]
            delta = state[f"delta_{i}"][block["src_pos"]]
            contrib = np.where(send, (1.0 + delta) / np.where(send, sigma, 1.0), 0.0)
            per_edge = contrib[block["src_code"]]
            s = np.bincount(block["dst_code"], weights=per_edge, minlength=nseg)
            sums[i] = s
            any_live |= s != 0
        if not any_live.any():
            return
        zeros = np.zeros(nseg)
        tgt_ptr, pos = block["tgt_ptr"], block["udst_pos"]
        for q in range(len(tgt_ptr) - 1):
            lo, hi = tgt_ptr[q], tgt_ptr[q + 1]
            if lo >= hi:
                continue
            m = any_live[lo:hi]
            if m.any():
                payload = {
                    f"val_{i}": (sums[i] if sums[i] is not None else zeros)[lo:hi][m]
                    for i in range(self.S)
                }
                yield q, pos[lo:hi][m], payload

    def apply(self, oids, out_deg, state, msgs, scalars):
        lev = self.maxlev - int(scalars["_round"])
        new_state = dict(state)
        touched = 0.0
        pos = msgs["pos"]
        if len(pos):
            order = np.argsort(pos, kind="stable")
            ps = pos[order]
            starts = np.flatnonzero(np.r_[True, np.diff(ps) > 0])
            upos = ps[starts]
            for i in range(self.S):
                sums = np.add.reduceat(msgs[f"val_{i}"][order], starts)
                dist = state[f"dist_{i}"]
                delta = state[f"delta_{i}"].copy()
                ok = dist[upos] == lev - 1  # only the level directly above accepts
                up, sm = upos[ok], sums[ok]
                delta[up] += state[f"sigma_{i}"][up] * sm
                new_state[f"delta_{i}"] = delta
                touched += float(len(up))
        return new_state, {"touched": touched}

    def converged(self, scalars, completed_rounds):
        return completed_rounds >= self.maxlev


def run_betweenness(graph, workdir: str, sources, *, engine: str = "dataset"):
    """-> pandas (oid, bc): bc = sum over the sampled sources of Brandes
    dependencies (delta at each source itself excluded). One forward +
    one backward BSP job for the whole source set.

    Backward dependency messages travel along OUT edges, which is only
    correct when the graph is symmetric — guard like the sibling
    algorithms (louvain/msf/triangles) instead of silently returning
    wrong values on a directed graph."""
    if not graph.meta.get("symmetrize"):
        raise ValueError(
            "betweenness sends backward dependencies along out-edges; "
            "build the graph with symmetrize=True (to_undirected) first"
        )
    if engine == "actors":
        from raylinkgraph.bsp_actors import run_bsp_actors as runner
    else:
        from raylinkgraph.bsp import run_bsp as runner

    sources = [int(s) for s in sorted(sources)]
    fwd = runner(
        graph, BrandesForward(sources), os.path.join(workdir, "fwd"),
        max_rounds=10_000, keep_steps=1,
    )
    maxlev = fwd.rounds - 1  # the last round discovered nothing
    back = runner(
        graph,
        BrandesBackward(graph.P, fwd.workdir, fwd.final_step, maxlev, sources),
        os.path.join(workdir, "back"),
        max_rounds=max(0, maxlev),
    )
    df = back.state_pandas()
    oid = df["oid"].to_numpy(np.int64)
    bc = np.zeros(len(df))
    for i, s in enumerate(sources):
        d = df[f"delta_{i}"].to_numpy()
        bc += np.where(oid == s, 0.0, d)
    return pd.DataFrame({"oid": oid, "bc": bc})
