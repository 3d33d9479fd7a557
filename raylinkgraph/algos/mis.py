"""Maximal independent set: deterministic Luby rounds.

Reference: flash_mis / flash_mis_2 (.gs_conf.yaml:370-443,
apps/flash/matching/mis.h). Pinned deterministic spec (identical in the
unrolled SQL oracle — pure integer arithmetic, no RNG):

  priority_r(v) = (v * 1103515245 + 12345 + r * 2654435761) % 2147483647
  key_r(v)      = priority_r(v) * 2^24 + (v % 2^24)     (distinct per v)

Luby round r = two supersteps:
  select  (even): every UNDECIDED vertex ships key_r; a vertex whose own
                  key exceeds every undecided neighbor's key joins the MIS
  exclude (odd):  new members notify neighbors; undecided receivers are
                  excluded
fixpoint when no vertex is undecided. Expected O(log n) rounds."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from raylinkgraph.bsp import Superstep

UNDECIDED, IN_MIS, EXCLUDED = 0, 1, 2
_M = np.int64(2147483647)


def _key(oids: np.ndarray, luby_round: int) -> np.ndarray:
    p = (
        oids * np.int64(1103515245)
        + np.int64(12345)
        + np.int64(luby_round) * np.int64(2654435761)
    ) % _M
    return p * np.int64(1 << 24) + (oids % np.int64(1 << 24))


class MIS(Superstep):
    name = "mis"
    state_dtypes = {"status": pa.int64(), "soid": pa.int64(), "fresh": pa.bool_()}
    scatter_columns = ["status", "soid", "fresh"]
    msg_dtypes = {"key": pa.int64()}
    scalar_names = ["undecided"]

    def __init__(self, max_rounds: int = 200):
        self.max_rounds = int(max_rounds)

    def params(self) -> dict:
        return {"max_rounds": self.max_rounds}

    def init(self, oids, out_deg):
        return (
            {
                "status": np.zeros(len(oids), np.int64),
                "soid": oids.astype(np.int64),
                "fresh": np.zeros(len(oids), np.bool_),
            },
            {"undecided": float(len(oids))},
        )

    def scatter(self, state, block, scalars):
        nseg = len(block["udst_pos"])
        if nseg == 0:
            return
        r = int(scalars["_round"])
        status = state["status"][block["src_pos"]]
        if r % 2 == 0:  # select: undecided ship their round key (max-reduce)
            luby = r // 2
            keys = np.where(
                status == UNDECIDED, _key(state["soid"][block["src_pos"]], luby),
                np.int64(-1),
            )
            vals = keys[block["src_code"]]
        else:  # exclude: freshly selected members ship a flag
            flag = np.where(
                (status == IN_MIS) & state["fresh"][block["src_pos"]],
                np.int64(1), np.int64(-1),
            )
            vals = flag[block["src_code"]]
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
                yield q, pos[lo:hi][m], {"key": maxs[lo:hi][m]}

    def apply(self, oids, out_deg, state, msgs, scalars):
        r = int(scalars["_round"])
        status = state["status"].copy()
        fresh = np.zeros(len(oids), np.bool_)
        maxin = np.full(len(oids), np.int64(-1))
        if len(msgs["pos"]):
            pos = msgs["pos"]
            order = np.argsort(pos, kind="stable")
            ps, ks = pos[order], msgs["key"][order]
            starts = np.flatnonzero(np.r_[True, np.diff(ps) > 0])
            maxin[ps[starts]] = np.maximum.reduceat(ks, starts)
        if r % 2 == 0:  # select
            luby = r // 2
            own = _key(oids.astype(np.int64), luby)
            win = (status == UNDECIDED) & (own > maxin)
            status[win] = IN_MIS
            fresh[win] = True
        else:  # exclude
            out = (status == UNDECIDED) & (maxin > 0)
            status[out] = EXCLUDED
        return (
            {"status": status, "soid": state["soid"], "fresh": fresh},
            {"undecided": float((status == UNDECIDED).sum())},
        )

    def converged(self, scalars, completed_rounds):
        if completed_rounds >= self.max_rounds:
            return True
        # stop only after an exclude phase so selections are propagated
        return (
            completed_rounds >= 2
            and completed_rounds % 2 == 0
            and scalars["undecided"] == 0.0
        )
