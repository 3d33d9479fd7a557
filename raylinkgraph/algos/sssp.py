"""SSSP: frontier-based Bellman-Ford-style relaxation over weighted edges.

Reference: grape::SSSPOpt / gs::SSSPProjected
(coordinator .gs_conf.yaml:34,198; apps/projected/sssp_projected.h) —
source vertex, non-negative weights, per-round relaxation of the
frontier's out-edges until no distance improves. Requires a graph built
with ``weight_col`` (CSR blocks carry per-edge float64 weights aligned
to the dst-major edge order). Unreachable stays ``UNREACHED_DIST``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from raylinkgraph.bsp import Superstep

UNREACHED_DIST = np.inf


class SSSP(Superstep):
    name = "sssp"
    state_dtypes = {"dist": pa.float64(), "changed": pa.bool_()}
    scatter_columns = ["dist", "changed"]
    msg_dtypes = {"cand": pa.float64()}
    scalar_names = ["active"]

    def __init__(self, source: int, max_rounds: int = 10_000):
        self.source = int(source)
        self.max_rounds = int(max_rounds)

    def params(self) -> dict:
        return {"source": self.source, "max_rounds": self.max_rounds}

    def init(self, oids, out_deg):
        dist = np.full(len(oids), UNREACHED_DIST)
        changed = oids == self.source
        dist[changed] = 0.0
        return (
            {"dist": dist, "changed": changed},
            {"active": float(changed.sum())},
        )

    def scatter(self, state, block, scalars):
        if len(block["udst_pos"]) == 0:
            return
        dist = state["dist"][block["src_pos"]]
        active = state["changed"][block["src_pos"]]
        # inactive sources relax at +inf; inf + w == inf
        cand = np.where(active, dist, UNREACHED_DIST)[block["src_code"]] + block["weight"]
        mins = np.minimum.reduceat(cand, block["dst_ptr"][:-1])
        live = np.isfinite(mins)
        if not live.any():
            return
        tgt_ptr, pos = block["tgt_ptr"], block["udst_pos"]
        for q in range(len(tgt_ptr) - 1):
            lo, hi = tgt_ptr[q], tgt_ptr[q + 1]
            if lo >= hi:
                continue
            m = live[lo:hi]
            if m.any():
                yield q, pos[lo:hi][m], {"cand": mins[lo:hi][m]}

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
        if completed_rounds >= self.max_rounds:
            return True
        return completed_rounds >= 1 and scalars["active"] == 0.0


def walk_parents(workdir: str, step: int, P: int, target: int):
    """Reconstruct target -> source from SSSPParents state by following
    parent pointers: one per-partition point lookup per hop (O(path_len)
    small reads; at scale these become parquet row-group point reads on
    the oid-sorted state files). -> [(oid, dist), ...] source first."""
    import numpy as np

    from raylinkgraph.functions.hashing import partition_of
    from raylinkgraph.state import checkpoint as ckpt

    path = []
    cur = int(target)
    for _ in range(100_000):
        pid = int(partition_of(np.asarray([cur], np.int64), P)[0])
        t = ckpt.read_state(workdir, step, pid, columns=["oid", "dist", "par"])
        oids = t.column("oid").to_numpy(zero_copy_only=False)
        i = int(np.searchsorted(oids, cur))
        if i >= len(oids) or oids[i] != cur:
            raise KeyError(f"vertex {cur} not found")
        d = float(t.column("dist").to_numpy(zero_copy_only=False)[i])
        p = int(t.column("par").to_numpy(zero_copy_only=False)[i])
        path.append((cur, d))
        if p < 0:
            break
        cur = p
    else:
        raise RuntimeError("parent chain did not terminate")
    return list(reversed(path))


class SSSPParents(Superstep):
    """SSSP with shortest-path-tree parent pointers (sssp_path /
    sssp_has_path / sssp_average_length, .gs_conf.yaml:103-117).

    parent(v) = the MINIMUM oid u with dist(u) + w(u, v) == dist(v) —
    deterministic at any parallelism. The scatter pre-combines per
    destination with a lexicographic (dist, parent) argmin; apply also
    accepts EQUAL-distance messages that lower the parent (a predecessor
    may reach its final distance after v does), so the loop runs until
    neither distances nor parents change. Parent updates never re-open
    the frontier: only distance improvements scatter."""

    name = "ssspp"
    state_dtypes = {
        "dist": pa.float64(),
        "par": pa.int64(),
        "soid": pa.int64(),  # own oid, exposed to scatter as sender id
        "changed": pa.bool_(),
    }
    scatter_columns = ["dist", "par", "soid", "changed"]
    msg_dtypes = {"cand": pa.float64(), "mpar": pa.int64()}
    scalar_names = ["active"]

    def __init__(self, source: int, max_rounds: int = 10_000):
        self.source = int(source)
        self.max_rounds = int(max_rounds)

    def params(self) -> dict:
        return {"source": self.source, "max_rounds": self.max_rounds}

    def init(self, oids, out_deg):
        n = len(oids)
        dist = np.full(n, UNREACHED_DIST)
        par = np.full(n, -1, np.int64)
        changed = oids == self.source
        dist[changed] = 0.0
        return (
            {"dist": dist, "par": par, "soid": oids.astype(np.int64),
             "changed": changed},
            {"active": float(changed.sum())},
        )

    def scatter(self, state, block, scalars):
        nseg = len(block["udst_pos"])
        if nseg == 0:
            return
        dist = state["dist"][block["src_pos"]]
        active = state["changed"][block["src_pos"]]
        soid = state["soid"][block["src_pos"]]
        cand = np.where(active, dist, UNREACHED_DIST)[block["src_code"]] + block["weight"]
        par = soid[block["src_code"]]
        # per-destination argmin by (cand, parent): lexsort within segments
        seg = block["dst_code"]
        order = np.lexsort((par, cand, seg))
        seg_sorted = seg[order]
        firsts = np.flatnonzero(np.r_[True, np.diff(seg_sorted) > 0])
        sel = order[firsts]
        mins, pars = cand[sel], par[sel]
        live = np.isfinite(mins)
        if not live.any():
            return
        tgt_ptr, pos = block["tgt_ptr"], block["udst_pos"]
        for q in range(len(tgt_ptr) - 1):
            lo, hi = tgt_ptr[q], tgt_ptr[q + 1]
            if lo >= hi:
                continue
            m = live[lo:hi]
            if m.any():
                yield q, pos[lo:hi][m], {"cand": mins[lo:hi][m], "mpar": pars[lo:hi][m]}

    def apply(self, oids, out_deg, state, msgs, scalars):
        dist = state["dist"].copy()
        par = state["par"].copy()
        changed = np.zeros(len(oids), np.bool_)
        n_eq = 0.0
        if len(msgs["pos"]):
            pos = msgs["pos"]
            order = np.lexsort((msgs["mpar"], msgs["cand"], pos))
            ps = pos[order]
            firsts = np.flatnonzero(np.r_[True, np.diff(ps) > 0])
            sel = order[firsts]
            upos = ps[firsts]
            mins, pars = msgs["cand"][sel], msgs["mpar"][sel]
            better = mins < dist[upos]
            equal = (mins == dist[upos]) & (pars < par[upos]) & (dist[upos] < UNREACHED_DIST)
            dist[upos[better]] = mins[better]
            par[upos[better]] = pars[better]
            changed[upos[better]] = True
            par[upos[equal]] = pars[equal]
            n_eq = float(equal.sum())
        return (
            {"dist": dist, "par": par, "soid": state["soid"], "changed": changed},
            {"active": float(changed.sum()) + n_eq},
        )

    def converged(self, scalars, completed_rounds):
        if completed_rounds >= self.max_rounds:
            return True
        return completed_rounds >= 1 and scalars["active"] == 0.0
