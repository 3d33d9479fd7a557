"""Greedy graph coloring: deterministic Jones-Plassmann rounds.

Reference: flash_color / flash_lpa_by_color (.gs_conf.yaml:615-646,
apps/flash/clustering/color.h). Pinned spec (the same round-salted
integer priorities as MIS — mirrored by the unrolled SQL oracle):

  key_r(v) as in mis.py; per round every UNCOLORED vertex whose key
  exceeds every uncolored neighbor's key colors itself with the MEX
  (minimum excluded value) of its already-colored neighbors' colors.
  Adjacent vertices can never win the same round, so colors are proper
  by construction; fixpoint when all vertices are colored.

One superstep per round: uncolored senders ship their key (per-block
max pre-combine), colored senders ship their color (per-(dst, color)
dedup, CDLP-style) — both travel in one message table with a -1
sentinel in the unused column."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from raylinkgraph.bsp import Superstep
from raylinkgraph.algos.mis import _key

_I64MIN = np.iinfo(np.int64).min


class Coloring(Superstep):
    name = "coloring"
    state_dtypes = {"color": pa.int64(), "soid": pa.int64()}
    scatter_columns = ["color", "soid"]
    msg_dtypes = {"prio": pa.int64(), "col": pa.int64()}
    scalar_names = ["uncolored"]

    def __init__(self, max_rounds: int = 300):
        self.max_rounds = int(max_rounds)

    def params(self) -> dict:
        return {"max_rounds": self.max_rounds}

    def init(self, oids, out_deg):
        return (
            {"color": np.full(len(oids), -1, np.int64),
             "soid": oids.astype(np.int64)},
            {"uncolored": float(len(oids))},
        )

    def scatter(self, state, block, scalars):
        nseg = len(block["udst_pos"])
        if nseg == 0:
            return
        r = int(scalars["_round"])
        color = state["color"][block["src_pos"]]
        soid = state["soid"][block["src_pos"]]
        un = color == -1
        # channel 1: max key among uncolored senders, per destination
        keys = np.where(un, _key(soid, r), _I64MIN)[block["src_code"]]
        kmax = np.maximum.reduceat(keys, block["dst_ptr"][:-1])
        # channel 2: distinct (dst, color) pairs from colored senders
        pe_col = np.where(un, -1, color)[block["src_code"]]
        dst_idx = block["dst_code"]
        order = np.lexsort((pe_col, dst_idx))
        d_s, c_s = dst_idx[order], pe_col[order]
        keep = c_s >= 0
        d_s, c_s = d_s[keep], c_s[keep]
        new = np.r_[True, (np.diff(d_s) > 0) | (np.diff(c_s) != 0)] if len(d_s) else np.array([], bool)
        d_u, c_u = (d_s[new], c_s[new]) if len(d_s) else (d_s, c_s)
        tgt_ptr, pos = block["tgt_ptr"], block["udst_pos"]
        bounds = np.searchsorted(d_u, tgt_ptr)
        for q in range(len(tgt_ptr) - 1):
            lo, hi = tgt_ptr[q], tgt_ptr[q + 1]
            out_pos, out_prio, out_col = [], [], []
            if lo < hi:
                m = kmax[lo:hi] > _I64MIN
                if m.any():
                    out_pos.append(pos[lo:hi][m])
                    out_prio.append(kmax[lo:hi][m])
                    out_col.append(np.full(int(m.sum()), -1, np.int64))
            blo, bhi = bounds[q], bounds[q + 1]
            if blo < bhi:
                out_pos.append(pos[d_u[blo:bhi]])
                out_prio.append(np.full(bhi - blo, _I64MIN, np.int64))
                out_col.append(c_u[blo:bhi])
            if out_pos:
                yield q, np.concatenate(out_pos), {
                    "prio": np.concatenate(out_prio),
                    "col": np.concatenate(out_col),
                }

    def apply(self, oids, out_deg, state, msgs, scalars):
        r = int(scalars["_round"])
        n = len(oids)
        color = state["color"].copy()
        kmax = np.full(n, _I64MIN, np.int64)
        if len(msgs["pos"]):
            pos = msgs["pos"].astype(np.int64)
            prio = msgs["prio"]
            order = np.argsort(pos, kind="stable")
            ps = pos[order]
            starts = np.flatnonzero(np.r_[True, np.diff(ps) > 0])
            kmax[ps[starts]] = np.maximum.reduceat(prio[order], starts)
        un = color == -1
        own = _key(oids.astype(np.int64), r)
        win = un & (own > kmax)
        if win.any() and len(msgs["pos"]):
            # mex over received neighbor colors, per winning vertex
            pos = msgs["pos"].astype(np.int64)
            col = msgs["col"]
            keep = col >= 0
            pc, cc = pos[keep], col[keep]
            order = np.lexsort((cc, pc))
            pc, cc = pc[order], cc[order]
            widx = np.flatnonzero(win)
            mex = np.zeros(len(widx), np.int64)
            lo = np.searchsorted(pc, widx)
            hi = np.searchsorted(pc, widx + 1)
            for j, (a, b) in enumerate(zip(lo, hi)):
                cs = np.unique(cc[a:b])
                m = 0
                for c in cs:
                    if c == m:
                        m += 1
                    elif c > m:
                        break
                mex[j] = m
            color[widx] = mex
        elif win.any():
            color[np.flatnonzero(win)] = 0
        return (
            {"color": color, "soid": state["soid"]},
            {"uncolored": float((color == -1).sum())},
        )

    def converged(self, scalars, completed_rounds):
        if completed_rounds >= self.max_rounds:
            return True
        return completed_rounds >= 1 and scalars["uncolored"] == 0.0
