"""lpa_u2i: bipartite weighted label propagation (u <-> i alternating).

Reference: gs::LPAU2I, analytical_engine/apps/lpa/lpa_u2i.h:30-246 —
alternating u2i / i2u rounds on a bipartite property graph where each
side takes the edge-weight-weighted mode of the other side's labels.
Pinned spec here (the reference propagates label VECTORS; we pin the
single-label weighted-mode variant, the LDBC-CDLP analogue):

  init: label(v) = own id
  even round (u2i): every ITEM takes the label with max SUM(edge weight)
    over its customer neighbors, smallest label on ties
  odd round (i2u): symmetric, customers update from items
  fixed round budget (labels of the non-updating side freeze that round)

Runs on the symmetrized weighted customer-part graph (weight = line
count per pair, dedup_weight='sum'); sides are distinguished by the id
space split (items carry the PART_OFFSET)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from raylinkgraph.bsp import Superstep


class LPAU2I(Superstep):
    name = "lpau2i"
    state_dtypes = {"label": pa.int64(), "soid": pa.int64()}
    scatter_columns = ["label", "soid"]
    msg_dtypes = {"label": pa.int64(), "wsum": pa.float64()}
    scalar_names = ["active"]

    def __init__(self, item_offset: int, max_rounds: int = 4):
        self.item_offset = int(item_offset)
        self.max_rounds = int(max_rounds)

    def params(self) -> dict:
        return {"item_offset": self.item_offset, "max_rounds": self.max_rounds}

    def init(self, oids, out_deg):
        return (
            {"label": oids.copy(), "soid": oids.astype(np.int64)},
            {"active": float(len(oids))},
        )

    def _sender_is_item(self, scalars) -> bool:
        # even completed rounds -> u2i (customers send); odd -> i2u
        return int(scalars["_round"]) % 2 == 1

    def scatter(self, state, block, scalars):
        upos = block["udst_pos"]
        if len(upos) == 0:
            return
        is_item = state["soid"][block["src_pos"]] >= self.item_offset
        send = is_item if self._sender_is_item(scalars) else ~is_item
        per_edge_send = send[block["src_code"]]
        if not per_edge_send.any():
            return
        per_edge_label = state["label"][block["src_pos"]][block["src_code"]]
        w = np.where(per_edge_send, block["weight"], 0.0)
        dst_idx = block["dst_code"]
        order = np.lexsort((per_edge_label, dst_idx))
        d, l, ws = dst_idx[order], per_edge_label[order], w[order]
        new_run = np.r_[True, (np.diff(d) > 0) | (np.diff(l) != 0)]
        starts = np.flatnonzero(new_run)
        wsum = np.add.reduceat(ws, starts)
        rd, rl = d[starts], l[starts]
        keep = wsum > 0
        rd, rl, wsum = rd[keep], rl[keep], wsum[keep]
        if len(rd) == 0:
            return
        bounds = np.searchsorted(rd, block["tgt_ptr"])
        for q in range(len(block["tgt_ptr"]) - 1):
            lo, hi = bounds[q], bounds[q + 1]
            if lo < hi:
                yield q, upos[rd[lo:hi]], {"label": rl[lo:hi], "wsum": wsum[lo:hi]}

    def apply(self, oids, out_deg, state, msgs, scalars):
        label = state["label"].copy()
        recv_item = not self._sender_is_item(scalars)  # receivers = other side
        n_changed = 0
        if len(msgs["pos"]):
            pos = msgs["pos"].astype(np.int64)
            order = np.lexsort((msgs["label"], pos))
            p, l, w = pos[order], msgs["label"][order], msgs["wsum"][order]
            new_pair = np.r_[True, (np.diff(p) > 0) | (np.diff(l) != 0)]
            pair_starts = np.flatnonzero(new_pair)
            pair_id = np.cumsum(new_pair) - 1
            tot = np.bincount(pair_id, weights=w)
            pp, pl = p[pair_starts], l[pair_starts]
            grp_starts = np.flatnonzero(np.r_[True, np.diff(pp) > 0])
            grp_id = np.cumsum(np.r_[True, np.diff(pp) > 0]) - 1
            maxw = np.maximum.reduceat(tot, grp_starts)
            is_max = tot == maxw[grp_id]
            idx = np.flatnonzero(is_max)
            first_in_grp = idx[np.unique(grp_id[idx], return_index=True)[1]]
            upos = pp[grp_starts]
            winners = pl[first_in_grp]
            side_ok = (oids[upos] >= self.item_offset) == recv_item
            upos, winners = upos[side_ok], winners[side_ok]
            n_changed = int((label[upos] != winners).sum())
            label[upos] = winners
        return (
            {"label": label, "soid": state["soid"]},
            {"active": float(n_changed)},
        )

    def converged(self, scalars, completed_rounds):
        return completed_rounds >= self.max_rounds
