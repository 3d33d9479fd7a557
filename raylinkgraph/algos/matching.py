"""Maximal matching: deterministic proposer/acceptor handshake rounds.

Reference: flash_mm / flash_mm_opt (.gs_conf.yaml:370-443,
apps/flash/matching/mm.h). The naive min-id handshake needs O(chain)
rounds (measured 132 on the sf0.01 pp graph); this is the standard
role-split variant that converges in O(log n) expected rounds, fully
deterministic (round-salted integer hash, mirrored by the SQL oracle):

  role_h(v) = ((v * 1103515245 + 12345 + h * 2654435761) % 2147483647) % 2
  handshake round h = three supersteps:
    propose: unmatched PROPOSERS (role 0) ship their id to all neighbors;
             every unmatched vertex also ships a presence marker.
             Unmatched ACCEPTORS (role 1) record chosen = min proposer.
    choose:  acceptors ship their id along the single edge to `chosen`;
             a proposer u receiving choices matches the MIN chooser:
             mate(u) = that acceptor.
    confirm: newly matched proposers ship their id along the edge to
             their mate; the acceptor records mate(v) = u. (Only the
             proposer an acceptor chose can confirm it, so at most one
             confirmation arrives.)
  fixpoint when the presence channel shows no unmatched vertex with an
  unmatched neighbor — true maximality, after which any further rounds
  are no-ops (what makes a fixed-unroll SQL oracle exact)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from raylinkgraph.bsp import Superstep

_I64MAX = np.iinfo(np.int64).max
_M = np.int64(2147483647)


def _role(oids: np.ndarray, h: int) -> np.ndarray:
    p = (
        oids * np.int64(1103515245) + np.int64(12345)
        + np.int64(h) * np.int64(2654435761)
    ) % _M
    return (p % np.int64(2)).astype(np.int64)  # 0 = proposer, 1 = acceptor


class MaximalMatching(Superstep):
    name = "matching"
    state_dtypes = {
        "mate": pa.int64(),
        "soid": pa.int64(),
        "chosen": pa.int64(),
        "newly": pa.bool_(),
    }
    scatter_columns = ["mate", "soid", "chosen", "newly"]
    msg_dtypes = {"pm": pa.int64(), "any": pa.int64()}
    scalar_names = ["frontier", "matched"]

    def __init__(self, max_rounds: int = 600):
        self.max_rounds = int(max_rounds)

    def params(self) -> dict:
        return {"max_rounds": self.max_rounds}

    def init(self, oids, out_deg):
        n = len(oids)
        return (
            {
                "mate": np.full(n, -1, np.int64),
                "soid": oids.astype(np.int64),
                "chosen": np.full(n, _I64MAX, np.int64),
                "newly": np.zeros(n, np.bool_),
            },
            {"frontier": float(n), "matched": 0.0},
        )

    def scatter(self, state, block, scalars):
        nseg = len(block["udst_pos"])
        if nseg == 0:
            return
        r = int(scalars["_round"])
        phase, h = r % 3, r // 3
        mate = state["mate"][block["src_pos"]]
        soid = state["soid"][block["src_pos"]]
        un = mate == -1
        if phase == 0:  # propose (+ presence)
            role = _role(state["soid"][block["src_pos"]], h)
            pvals = np.where(un & (role == 0), soid, _I64MAX)[block["src_code"]]
            avals = np.where(un, soid, _I64MAX)[block["src_code"]]
            pm = np.minimum.reduceat(pvals, block["dst_ptr"][:-1])
            anym = np.minimum.reduceat(avals, block["dst_ptr"][:-1])
            live = (pm < _I64MAX) | (anym < _I64MAX)
        else:
            if phase == 1:  # choose: ship along the edge to `chosen`
                gate_target = state["chosen"][block["src_pos"]]
                ok = un & (gate_target < _I64MAX)
            else:  # confirm: newly matched proposers -> their mate
                gate_target = state["mate"][block["src_pos"]]
                ok = state["newly"][block["src_pos"]]
            tgt_pe = gate_target[block["src_code"]]
            ok_pe = ok[block["src_code"]]
            dst_oid_pe = block["udst"][block["dst_code"]]
            vals = np.where(ok_pe & (tgt_pe == dst_oid_pe),
                            soid[block["src_code"]], _I64MAX)
            pm = np.minimum.reduceat(vals, block["dst_ptr"][:-1])
            anym = np.full(nseg, _I64MAX)
            live = pm < _I64MAX
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
                    "pm": pm[lo:hi][m], "any": anym[lo:hi][m]
                }

    def apply(self, oids, out_deg, state, msgs, scalars):
        r = int(scalars["_round"])
        phase, h = r % 3, r // 3
        n = len(oids)
        mate = state["mate"].copy()
        chosen = np.full(n, _I64MAX, np.int64)
        newly = np.zeros(n, np.bool_)
        pm = np.full(n, _I64MAX, np.int64)
        anym = np.full(n, _I64MAX, np.int64)
        if len(msgs["pos"]):
            pos = msgs["pos"]
            order = np.argsort(pos, kind="stable")
            ps = pos[order]
            starts = np.flatnonzero(np.r_[True, np.diff(ps) > 0])
            upos = ps[starts]
            pm[upos] = np.minimum.reduceat(msgs["pm"][order], starts)
            anym[upos] = np.minimum.reduceat(msgs["any"][order], starts)
        # frontier is a per-partition PARTIAL (summed by the driver): only
        # the propose phase measures it; converged() only consults it at
        # completed%3==1, i.e. right after a propose apply
        frontier = 0.0
        matched = 0.0
        un = mate == -1
        own = oids.astype(np.int64)
        if phase == 0:
            role = _role(own, h)
            chosen = np.where(un & (role == 1), pm, _I64MAX)
            frontier = float((un & (anym < _I64MAX)).sum())
        elif phase == 1:
            # proposers receiving choices match the min chooser
            role = _role(own, h)
            hit = un & (role == 0) & (pm < _I64MAX)
            mate = np.where(hit, pm, mate)
            newly = hit
            matched = float(hit.sum())
            chosen = state["chosen"]  # acceptors keep theirs for confirm
        else:
            # acceptors: a confirmation can only come from the proposer
            # they chose
            hit = un & (pm < _I64MAX)
            mate = np.where(hit, pm, mate)
            matched = float(hit.sum())
        return (
            {"mate": mate, "soid": state["soid"], "chosen": chosen,
             "newly": newly},
            {"frontier": frontier, "matched": matched},
        )

    def converged(self, scalars, completed_rounds):
        if completed_rounds >= self.max_rounds:
            return True
        # the frontier is measured in each propose phase; stop right
        # after one that saw no unmatched-adjacent vertex
        return (
            completed_rounds >= 1
            and completed_rounds % 3 == 1
            and scalars["frontier"] == 0.0
        )
