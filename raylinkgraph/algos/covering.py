"""Greedy covering operators: minimum dominating set + greedy vertex cover.

References:
- flash_min_dominating_set (.gs_conf.yaml:370-443,
  apps/flash/matching/min-dominating-set.h:30-95): undominated vertices
  propagate (residual-degree, id) maxima for TWO hops; 2-hop-local
  maxima join the set and dominate their neighborhoods; residual
  degrees recount; repeat until everything is dominated.
- flash_min_cover_greedy (apps/flash/matching/min-cover-greedy.h:31-95):
  active vertices (uncovered, residual degree > 0) that are a strict
  (residual-degree, id) local maximum among active neighbors join the
  cover; neighbors' residual degrees drop by the number of newly
  covered neighbors; repeat until no active vertex remains.

Both are synchronous multi-phase BSP supersteps (phase = round mod k)
with max- or sum-reduced single-column messages, deterministic ids as
tie-breaks, and an exact unrolled SQL replay as the driver oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from raylinkgraph.bsp import Superstep

_SHIFT = np.int64(1) << np.int64(32)
_NEG = np.int64(-1) << np.int64(62)


def _key(cnt: np.ndarray, oid: np.ndarray) -> np.ndarray:
    """(cnt, oid) lexicographic as one int64 (oid < 2^32, cnt < 2^30)."""
    return cnt.astype(np.int64) * _SHIFT + oid.astype(np.int64)


class MinDominatingSet(Superstep):
    """4-phase rounds: max-hop, max-hop, select+dominate-notify, recount."""

    name = "min_dominating_set"
    state_dtypes = {
        "maxk": pa.int64(),
        "dom": pa.bool_(),
        "in_set": pa.bool_(),
        "just": pa.bool_(),
    }
    scatter_columns = ["maxk", "dom", "just"]
    msg_dtypes = {"val": pa.int64()}
    scalar_names = ["active"]

    def __init__(self, max_rounds: int = 400):
        self.max_rounds = int(max_rounds)

    def params(self) -> dict:
        return {"max_rounds": self.max_rounds}

    def init(self, oids, out_deg):
        return (
            {
                "maxk": _key(out_deg, oids),
                "dom": np.zeros(len(oids), np.bool_),
                "in_set": np.zeros(len(oids), np.bool_),
                "just": np.zeros(len(oids), np.bool_),
            },
            {"active": float(len(oids))},
        )

    def scatter(self, state, block, scalars):
        phase = int(scalars["_round"]) % 4
        if len(block["udst_pos"]) == 0:
            return
        sp = block["src_pos"]
        if phase in (0, 1):  # undominated vertices propagate their max key
            send = ~state["dom"][sp]
            vals = np.where(send, state["maxk"][sp], _NEG)[block["src_code"]]
            red = np.maximum.reduceat(vals, block["dst_ptr"][:-1])
            live = red > _NEG
        elif phase == 2:  # just-selected vertices dominate their neighbors
            send = state["just"][sp]
            vals = send.astype(np.int64)[block["src_code"]]
            red = np.maximum.reduceat(vals, block["dst_ptr"][:-1])
            live = red > 0
        else:  # phase 3: undominated vertices count undominated neighbors
            send = ~state["dom"][sp]
            vals = send.astype(np.int64)[block["src_code"]]
            red = np.add.reduceat(vals, block["dst_ptr"][:-1])
            live = red > 0
        if not live.any():
            return
        tgt_ptr, pos = block["tgt_ptr"], block["udst_pos"]
        for q in range(len(tgt_ptr) - 1):
            lo, hi = tgt_ptr[q], tgt_ptr[q + 1]
            if lo >= hi:
                continue
            m = live[lo:hi]
            if m.any():
                yield q, pos[lo:hi][m], {"val": red[lo:hi][m]}

    def apply(self, oids, out_deg, state, msgs, scalars):
        phase = int(scalars["_round"]) % 4
        n = len(oids)
        maxk = state["maxk"].copy()
        dom = state["dom"].copy()
        in_set = state["in_set"].copy()
        just = np.zeros(n, np.bool_)
        pos, val = msgs["pos"], msgs["val"]
        if phase in (0, 1):
            if len(pos):
                agg = np.full(n, _NEG)
                np.maximum.at(agg, pos, val)
                upd = ~dom & (agg > maxk)
                maxk[upd] = agg[upd]
            if phase == 1:
                # select 2-hop maxima: maxid == own id
                sel = ~dom & ((maxk % _SHIFT) == (oids % _SHIFT))
                in_set |= sel
                dom |= sel
                just = sel
        elif phase == 2:
            if len(pos):
                flag = np.zeros(n, np.int64)
                np.maximum.at(flag, pos, val)
                dom |= flag > 0
        else:  # phase 3: recount residual degree, reset own key
            cnt = np.zeros(n, np.int64)
            if len(pos):
                np.add.at(cnt, pos, val)
            maxk = np.where(dom, maxk, _key(cnt, oids))
        return (
            {"maxk": maxk, "dom": dom, "in_set": in_set, "just": just},
            {"active": float((~dom).sum())},
        )

    def converged(self, scalars, completed_rounds):
        if completed_rounds >= self.max_rounds:
            return True
        return (
            completed_rounds >= 4
            and completed_rounds % 4 == 0
            and scalars["active"] == 0.0
        )


class MinVertexCover(Superstep):
    """2-phase rounds: select strict local maxima, decrement residuals.

    State carries the composite (resid, oid) key so scatter (which sees
    positions, not oids) can max-reduce the exact tie-broken priority."""

    name = "min_vertex_cover"
    state_dtypes = {
        "key": pa.int64(),
        "c": pa.bool_(),
        "just": pa.bool_(),
    }
    scatter_columns = ["key", "c", "just"]
    msg_dtypes = {"val": pa.int64()}
    scalar_names = ["active"]

    def __init__(self, max_rounds: int = 400):
        self.max_rounds = int(max_rounds)

    def params(self) -> dict:
        return {"max_rounds": self.max_rounds}

    def init(self, oids, out_deg):
        return (
            {
                "key": _key(out_deg, oids),
                "c": np.zeros(len(oids), np.bool_),
                "just": np.zeros(len(oids), np.bool_),
            },
            {"active": float((out_deg > 0).sum())},
        )

    def scatter(self, state, block, scalars):
        phase = int(scalars["_round"]) % 2
        if len(block["udst_pos"]) == 0:
            return
        sp = block["src_pos"]
        if phase == 0:  # active vertices propose their (resid, id) key
            key = state["key"][sp]
            send = ~state["c"][sp] & (key // _SHIFT > 0)
            vals = np.where(send, key, _NEG)[block["src_code"]]
            red = np.maximum.reduceat(vals, block["dst_ptr"][:-1])
            live = red > _NEG
        else:  # phase 1: just-selected send 1 per edge
            send = state["just"][sp]
            vals = send.astype(np.int64)[block["src_code"]]
            red = np.add.reduceat(vals, block["dst_ptr"][:-1])
            live = red > 0
        if not live.any():
            return
        tgt_ptr, pos = block["tgt_ptr"], block["udst_pos"]
        for q in range(len(tgt_ptr) - 1):
            lo, hi = tgt_ptr[q], tgt_ptr[q + 1]
            if lo >= hi:
                continue
            m = live[lo:hi]
            if m.any():
                yield q, pos[lo:hi][m], {"val": red[lo:hi][m]}

    def apply(self, oids, out_deg, state, msgs, scalars):
        phase = int(scalars["_round"]) % 2
        n = len(oids)
        key = state["key"].copy()
        c = state["c"].copy()
        just = np.zeros(n, np.bool_)
        pos, val = msgs["pos"], msgs["val"]
        if phase == 0:
            agg = np.full(n, _NEG)
            if len(pos):
                np.maximum.at(agg, pos, val)
            active = ~c & (key // _SHIFT > 0)
            sel = active & (key > agg)
            c |= sel
            just = sel
        else:
            if len(pos):
                dec = np.zeros(n, np.int64)
                np.add.at(dec, pos, val)
                resid = key // _SHIFT - dec
                key = _key(resid, oids)
        return (
            {"key": key, "c": c, "just": just},
            {"active": float((~c & (key // _SHIFT > 0)).sum())},
        )

    def converged(self, scalars, completed_rounds):
        if completed_rounds >= self.max_rounds:
            return True
        return (
            completed_rounds >= 2
            and completed_rounds % 2 == 0
            and scalars["active"] == 0.0
        )
