"""CDLP / LPA: synchronous community label propagation, LDBC semantics.

Reference: Python `lpa` (python/graphscope/analytical/app/lpa.py:29-55,
cdlp = lpa alias) -> grape::CDLP; vendored tie-break shown in
analytical_engine/apps/flash/clustering/lpa.h:54-67 — counts in an ordered
map with strict `>` comparison, so the SMALLEST label reaching the maximum
count wins. Init label = own id; every round ALL vertices synchronously
take the most frequent neighbor label (min on ties); fixed round budget
(default 10, lpa.h:72-77) with early stop when no label changes (a no-op
round under synchronous determinism).

Scatter pre-combines per-block (dst, label) counts — the combiner that
keeps the shuffle proportional to distinct (dst, label) pairs, not edges.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from raylinkgraph.bsp import Superstep


def _group_starts(sorted_keys: np.ndarray) -> np.ndarray:
    return np.flatnonzero(np.r_[True, np.diff(sorted_keys) > 0])


class CDLP(Superstep):
    name = "cdlp"
    state_dtypes = {"label": pa.int64()}
    scatter_columns = ["label"]
    msg_dtypes = {"label": pa.int64(), "cnt": pa.int64()}
    scalar_names = ["active"]

    def __init__(self, max_rounds: int = 10):
        self.max_rounds = int(max_rounds)

    def params(self) -> dict:
        return {"max_rounds": self.max_rounds}

    def init(self, oids, out_deg):
        return {"label": oids.copy()}, {"active": float(len(oids))}

    def scatter(self, state, block, scalars):
        upos = block["udst_pos"]
        if len(upos) == 0:
            return
        per_edge_label = state["label"][block["src_pos"]][block["src_code"]]
        dst_idx = block["dst_code"]
        # count per (dst, label): lexsort then run-length encode
        order = np.lexsort((per_edge_label, dst_idx))
        d, l = dst_idx[order], per_edge_label[order]
        new_run = np.r_[True, (np.diff(d) > 0) | (np.diff(l) != 0)]
        starts = np.flatnonzero(new_run)
        cnt = np.diff(np.r_[starts, len(d)]).astype(np.int64)
        rd, rl = d[starts], l[starts]
        # rd ascending -> slice per target via the run index boundaries
        tgt_ptr = block["tgt_ptr"]
        bounds = np.searchsorted(rd, tgt_ptr)
        for q in range(len(tgt_ptr) - 1):
            lo, hi = bounds[q], bounds[q + 1]
            if lo < hi:
                yield q, upos[rd[lo:hi]], {"label": rl[lo:hi], "cnt": cnt[lo:hi]}

    def apply(self, oids, out_deg, state, msgs, scalars):
        label = state["label"].copy()
        n_changed = 0
        if len(msgs["pos"]):
            pos = msgs["pos"].astype(np.int64)
            # merge partial counts per (pos, label)
            order = np.lexsort((msgs["label"], pos))
            p, l, c = pos[order], msgs["label"][order], msgs["cnt"][order]
            new_pair = np.r_[True, (np.diff(p) > 0) | (np.diff(l) != 0)]
            pair_starts = np.flatnonzero(new_pair)
            pair_id = np.cumsum(new_pair) - 1
            tot = np.bincount(pair_id, weights=c).astype(np.int64)
            pp, pl = p[pair_starts], l[pair_starts]
            # per pos: max count, smallest label on ties (labels ascending
            # within pos, so the FIRST pair reaching the max wins)
            grp_starts = _group_starts(pp)
            grp_id = np.cumsum(np.r_[True, np.diff(pp) > 0]) - 1
            maxc = np.maximum.reduceat(tot, grp_starts)
            is_max = tot == maxc[grp_id]
            idx = np.flatnonzero(is_max)
            first_in_grp = idx[np.unique(grp_id[idx], return_index=True)[1]]
            upos = pp[grp_starts]
            winners = pl[first_in_grp]
            n_changed = int((label[upos] != winners).sum())
            label[upos] = winners
        return {"label": label}, {"active": float(n_changed)}

    def converged(self, scalars, completed_rounds):
        if completed_rounds >= self.max_rounds:
            return True
        return completed_rounds >= 1 and scalars["active"] == 0.0
