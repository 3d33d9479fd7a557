"""Biconnected components, bridges, articulation points (Tarjan–Vishkin).

References: flash_bcc / flash_bridge / flash_cut_point
(.gs_conf.yaml:762-814, apps/flash/connectivity/bcc.h:44-140,
bridge.h:44-150, cut-point.h:44-150). The reference builds a BFS forest,
then walks every non-tree edge's two tree paths up to the LCA with a
worker-0 union-find (VertexMapSeq + global GetV) — a sequential join
step. Here the same equivalence is computed fully distributed with the
classic Tarjan–Vishkin auxiliary graph (the textbook parallel BCC):

  1. WCC -> component id (= min oid), roots = {v : comp(v) == v}
  2. multi-root BFS -> level dis(v)
  3. parent p(v) = min-(dis, oid) neighbor at dis(v)-1 (deterministic);
     children counts; subtree sizes sz(v) by bottom-up waves
  4. preorder pre(v) = pre(p) + 1 + (sum of sz over smaller-oid
     siblings) by top-down waves (sibling offsets are one bucket-join
     pass); subtree intervals are [pre(v), pre(v)+sz(v))
  5. low/high(v) = min/max preorder reachable from subtree(v) via one
     non-tree edge (bottom-up waves; in a BFS forest non-tree edges are
     never ancestor-related, so the classic aux rules simplify)
  6. auxiliary graph on NON-ROOT vertices (vertex v stands for its
     parent edge (p(v), v)):
       (a) every non-tree edge (x, y) -> aux edge x—y
       (b) tree edge (w, v), w non-root -> aux edge v—w iff
           low(v) < pre(w) or high(v) >= pre(w) + sz(w)
     connected components of the aux graph = biconnected components of
     the parent edges; non-tree edge (x, y) lives in class(x) (== class(y))
  7. outputs: per-edge bcc id = the minimum canonical edge key
     (min(a,b) * 2^32 + max(a,b)) in the class (unique per BCC — min
     VERTEX would collide when one articulation vertex is the minimum of
     two components); bridges = tree edges whose class contains exactly
     one edge; articulation points = vertices whose incident tree edges
     span >= 2 classes (cut-point.h:138-148 rule, root = >=2 child
     classes).

Every wave is a Superstep on the existing BSP engine; the offset pass
and the aux/label joins are hash-bucket Dataset shuffles; the aux
component step reuses LinkGraph.build + WCC. Nothing O(V) or O(E)
touches the driver until the final result export.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from raylinkgraph.algos.wcc import WCC
from raylinkgraph.bsp import Superstep, run_bsp
from raylinkgraph.functions.hashing import partition_of
from raylinkgraph.state import checkpoint as ckpt
from raylinkgraph.stages.graph_build import LinkGraph, _atomic_write

_SHIFT = np.int64(1) << np.int64(32)
_I64MAX = np.iinfo(np.int64).max


def _seed_read(workdir: str, step: int, P: int, oids, columns):
    """Read another BSP job's final state for this partition (pid derived
    from any oid's home hash — the BrandesBackward seeding pattern)."""
    pid = int(partition_of(oids[:1], P)[0])
    t = ckpt.read_state(workdir, step, pid)
    return {c: t.column(c).to_numpy(zero_copy_only=False).copy() for c in columns}


class MultiRootBFS(Superstep):
    """BFS levels from every component root (comp(v) == v)."""

    name = "bcc_bfs"
    state_dtypes = {"dis": pa.int64(), "changed": pa.bool_()}
    scatter_columns = ["dis", "changed"]
    msg_dtypes = {"cand": pa.int64()}
    scalar_names = ["active"]

    def __init__(self, P: int, wcc_workdir: str, wcc_step: int):
        self.P = int(P)
        self.wcc_workdir = wcc_workdir
        self.wcc_step = int(wcc_step)

    def params(self):
        return {"wcc": self.wcc_workdir, "step": self.wcc_step}

    def init(self, oids, out_deg):
        n = len(oids)
        if n == 0:
            return (
                {"dis": np.zeros(0, np.int64), "changed": np.zeros(0, np.bool_)},
                {"active": 0.0},
            )
        comp = _seed_read(self.wcc_workdir, self.wcc_step, self.P, oids, ["comp"])["comp"]
        changed = comp == oids
        dis = np.where(changed, 0, -1).astype(np.int64)
        return {"dis": dis, "changed": changed}, {"active": float(changed.sum())}

    def scatter(self, state, block, scalars):
        if len(block["udst_pos"]) == 0:
            return
        dis = state["dis"][block["src_pos"]]
        active = state["changed"][block["src_pos"]]
        vals = np.where(active, dis, _I64MAX - 1)[block["src_code"]]
        mins = np.minimum.reduceat(vals, block["dst_ptr"][:-1])
        live = mins < _I64MAX - 1
        if not live.any():
            return
        tgt_ptr, pos = block["tgt_ptr"], block["udst_pos"]
        for q in range(len(tgt_ptr) - 1):
            lo, hi = tgt_ptr[q], tgt_ptr[q + 1]
            if lo >= hi:
                continue
            m = live[lo:hi]
            if m.any():
                yield q, pos[lo:hi][m], {"cand": mins[lo:hi][m] + 1}

    def apply(self, oids, out_deg, state, msgs, scalars):
        dis = state["dis"].copy()
        changed = np.zeros(len(oids), np.bool_)
        if len(msgs["pos"]):
            pos = msgs["pos"]
            order = np.argsort(pos, kind="stable")
            ps, cs = pos[order], msgs["cand"][order]
            starts = np.flatnonzero(np.r_[True, np.diff(ps) > 0])
            mins = np.minimum.reduceat(cs, starts)
            upos = ps[starts]
            better = (dis[upos] < 0) | (mins < dis[upos])
            dis[upos[better]] = mins[better]
            changed[upos[better]] = True
        return {"dis": dis, "changed": changed}, {"active": float(changed.sum())}

    def converged(self, scalars, completed_rounds):
        return completed_rounds >= 1 and scalars["active"] == 0.0


class TreeBuild(Superstep):
    """Round 0: pick parents (min (dis, oid) neighbor one level up).
    Round 1: count children. Rounds >= 2: bottom-up subtree sizes."""

    name = "bcc_tree"
    state_dtypes = {
        "_oid": pa.int64(),
        "dis": pa.int64(), "p": pa.int64(), "nch": pa.int64(),
        "sz": pa.int64(), "recv": pa.int64(), "sent": pa.bool_(),
    }
    scatter_columns = ["_oid", "dis", "p", "nch", "sz", "recv", "sent"]
    msg_dtypes = {"m1": pa.int64(), "m2": pa.int64()}
    scalar_names = ["pending"]

    def __init__(self, P: int, bfs_workdir: str, bfs_step: int,
                 max_rounds: int = 10_000):
        self.P = int(P)
        self.bfs_workdir = bfs_workdir
        self.bfs_step = int(bfs_step)
        self.max_rounds = int(max_rounds)

    def params(self):
        return {"bfs": self.bfs_workdir, "step": self.bfs_step}

    def init(self, oids, out_deg):
        n = len(oids)
        if n == 0:
            z = np.zeros(0, np.int64)
            return (
                {"_oid": z, "dis": z, "p": z, "nch": z, "sz": z, "recv": z,
                 "sent": np.zeros(0, np.bool_)},
                {"pending": 0.0},
            )
        dis = _seed_read(self.bfs_workdir, self.bfs_step, self.P, oids, ["dis"])["dis"]
        return (
            {
                "_oid": oids.astype(np.int64),
                "dis": dis,
                "p": np.full(n, -1, np.int64),
                "nch": np.zeros(n, np.int64),
                "sz": np.ones(n, np.int64),
                "recv": np.zeros(n, np.int64),
                "sent": np.zeros(n, np.bool_),
            },
            {"pending": float(n)},
        )

    def scatter(self, state, block, scalars):
        r = int(scalars["_round"])
        if len(block["udst_pos"]) == 0:
            return
        sp, sc, dptr = block["src_pos"], block["src_code"], block["dst_ptr"][:-1]
        if r == 0:
            # every vertex offers (dis, oid); receivers keep the min
            key = state["dis"][sp] * _SHIFT + state["_oid"][sp]
            vals = key[sc]
            red1 = np.minimum.reduceat(vals, dptr)
            red2 = np.zeros(len(red1), np.int64)
            live = np.ones(len(red1), np.bool_)
        elif r == 1:
            # "1 to my parent": per-edge mask on the target oid
            p_edge = state["p"][sp][sc]
            mask = p_edge == block["udst"][block["dst_code"]]
            red1 = np.add.reduceat(mask.astype(np.int64), dptr)
            red2 = np.zeros(len(red1), np.int64)
            live = red1 > 0
        else:
            ready = (
                (state["recv"] == state["nch"]) & ~state["sent"]
                & (state["p"] != -1)
            )[sp]
            p_edge = state["p"][sp][sc]
            mask = (p_edge == block["udst"][block["dst_code"]]) & ready[sc]
            szv = np.where(mask, state["sz"][sp][sc], 0)
            red1 = np.add.reduceat(szv, dptr)
            red2 = np.add.reduceat(mask.astype(np.int64), dptr)
            live = red2 > 0
        if not live.any():
            return
        tgt_ptr, pos = block["tgt_ptr"], block["udst_pos"]
        for q in range(len(tgt_ptr) - 1):
            lo, hi = tgt_ptr[q], tgt_ptr[q + 1]
            if lo >= hi:
                continue
            m = live[lo:hi]
            if m.any():
                yield q, pos[lo:hi][m], {"m1": red1[lo:hi][m], "m2": red2[lo:hi][m]}

    def apply(self, oids, out_deg, state, msgs, scalars):
        r = int(scalars["_round"])
        n = len(oids)
        dis = state["dis"]
        p = state["p"].copy()
        nch = state["nch"].copy()
        sz = state["sz"].copy()
        recv = state["recv"].copy()
        sent = state["sent"].copy()
        pos, m1, m2 = msgs["pos"], msgs["m1"], msgs["m2"]
        if r == 0:
            agg = np.full(n, _I64MAX)
            if len(pos):
                np.minimum.at(agg, pos, m1)
            nonroot = dis >= 1
            k_dis, k_oid = agg // _SHIFT, agg % _SHIFT
            ok = nonroot & (agg < _I64MAX) & (k_dis == dis - 1)
            p[ok] = k_oid[ok]
        elif r == 1:
            if len(pos):
                np.add.at(nch, pos, m1)
        else:
            was_ready = (recv == nch) & ~sent & (p != -1)
            sent = sent | was_ready
            if len(pos):
                np.add.at(sz, pos, m1)
                np.add.at(recv, pos, m2)
        pending = float(((p != -1) & ~sent).sum()) if r >= 1 else float(n)
        return (
            {"_oid": state["_oid"], "dis": dis, "p": p, "nch": nch, "sz": sz,
             "recv": recv, "sent": sent},
            {"pending": pending},
        )

    def converged(self, scalars, completed_rounds):
        if completed_rounds >= self.max_rounds:
            return True
        return completed_rounds >= 2 and scalars["pending"] == 0.0


class PreOrder(Superstep):
    """Top-down preorder: pre(v) = pre(p(v)) + 1 + sibling offset.
    Messages are per-edge (sender oid, sender pre); receivers accept only
    their parent's."""

    name = "bcc_pre"
    state_dtypes = {
        "_oid": pa.int64(), "p": pa.int64(), "off": pa.int64(),
        "pre": pa.int64(), "fresh": pa.bool_(),
    }
    scatter_columns = ["_oid", "pre", "fresh"]
    msg_dtypes = {"snd": pa.int64(), "val": pa.int64()}
    scalar_names = ["active"]

    def __init__(self, P: int, tree_workdir: str, tree_step: int, off_dir: str,
                 max_rounds: int = 10_000):
        self.P = int(P)
        self.tree_workdir = tree_workdir
        self.tree_step = int(tree_step)
        self.off_dir = off_dir
        self.max_rounds = int(max_rounds)

    def params(self):
        return {"tree": self.tree_workdir, "step": self.tree_step,
                "off": self.off_dir}

    def init(self, oids, out_deg):
        n = len(oids)
        if n == 0:
            z = np.zeros(0, np.int64)
            return (
                {"_oid": z, "p": z, "off": z, "pre": z,
                 "fresh": np.zeros(0, np.bool_)},
                {"active": 0.0},
            )
        p = _seed_read(self.tree_workdir, self.tree_step, self.P, oids, ["p"])["p"]
        pid = int(partition_of(oids[:1], self.P)[0])
        off = (
            pq.read_table(os.path.join(self.off_dir, f"off-{pid:05d}.parquet"))
            .column("off").to_numpy(zero_copy_only=False).copy()
        )
        roots = p == -1
        pre = np.where(roots, 0, -1).astype(np.int64)
        return (
            {"_oid": oids.astype(np.int64), "p": p, "off": off, "pre": pre,
             "fresh": roots},
            {"active": float(roots.sum())},
        )

    def scatter(self, state, block, scalars):
        if len(block["udst_pos"]) == 0:
            return
        sp, sc = block["src_pos"], block["src_code"]
        fresh_e = state["fresh"][sp][sc]
        if not fresh_e.any():
            return
        snd = state["_oid"][sp][sc]
        pre = state["pre"][sp][sc]
        pos_e = block["udst_pos"][block["dst_code"]]
        tgt_e = np.searchsorted(
            block["tgt_ptr"], block["dst_code"], side="right"
        ) - 1
        # per-edge messages (no combining: receivers filter by sender)
        for q in np.unique(tgt_e[fresh_e]):
            m = fresh_e & (tgt_e == q)
            yield int(q), pos_e[m], {"snd": snd[m], "val": pre[m]}

    def apply(self, oids, out_deg, state, msgs, scalars):
        pre = state["pre"].copy()
        fresh = np.zeros(len(oids), np.bool_)
        if len(msgs["pos"]):
            pos, snd, val = msgs["pos"], msgs["snd"], msgs["val"]
            keep = (pre[pos] < 0) & (snd == state["p"][pos])
            if keep.any():
                upos = pos[keep]
                pre[upos] = val[keep] + 1 + state["off"][upos]
                fresh[upos] = True
        return (
            {"_oid": state["_oid"], "p": state["p"], "off": state["off"],
             "pre": pre, "fresh": fresh},
            {"active": float(fresh.sum())},
        )

    def converged(self, scalars, completed_rounds):
        if completed_rounds >= self.max_rounds:
            return True
        return completed_rounds >= 1 and scalars["active"] == 0.0


class LowHigh(Superstep):
    """Round 0: exchange (oid, parent, pre) along every edge; receivers
    fold non-tree neighbors' pre into low0/high0. Rounds >= 1: bottom-up
    subtree min/max (same wave pattern as subtree sizes)."""

    name = "bcc_lowhigh"
    state_dtypes = {
        "_oid": pa.int64(), "p": pa.int64(), "nch": pa.int64(),
        "pre": pa.int64(), "low": pa.int64(), "high": pa.int64(),
        "recv": pa.int64(), "sent": pa.bool_(),
    }
    scatter_columns = ["_oid", "p", "nch", "pre", "low", "high", "recv", "sent"]
    msg_dtypes = {"m1": pa.int64(), "m2": pa.int64(), "m3": pa.int64()}
    scalar_names = ["pending"]

    def __init__(self, P: int, tree_workdir: str, tree_step: int,
                 pre_workdir: str, pre_step: int, max_rounds: int = 10_000):
        self.P = int(P)
        self.tree_workdir = tree_workdir
        self.tree_step = int(tree_step)
        self.pre_workdir = pre_workdir
        self.pre_step = int(pre_step)
        self.max_rounds = int(max_rounds)

    def params(self):
        return {"tree": self.tree_workdir, "tstep": self.tree_step,
                "pre": self.pre_workdir, "pstep": self.pre_step}

    def init(self, oids, out_deg):
        n = len(oids)
        if n == 0:
            z = np.zeros(0, np.int64)
            return (
                {"_oid": z, "p": z, "nch": z, "pre": z, "low": z, "high": z,
                 "recv": z, "sent": np.zeros(0, np.bool_)},
                {"pending": 0.0},
            )
        t = _seed_read(self.tree_workdir, self.tree_step, self.P, oids, ["p", "nch"])
        pre = _seed_read(self.pre_workdir, self.pre_step, self.P, oids, ["pre"])["pre"]
        return (
            {
                "_oid": oids.astype(np.int64), "p": t["p"], "nch": t["nch"],
                "pre": pre, "low": pre.copy(), "high": pre.copy(),
                "recv": np.zeros(n, np.int64),
                "sent": np.zeros(n, np.bool_),
            },
            {"pending": float((t["p"] != -1).sum())},
        )

    def scatter(self, state, block, scalars):
        r = int(scalars["_round"])
        if len(block["udst_pos"]) == 0:
            return
        sp, sc, dptr = block["src_pos"], block["src_code"], block["dst_ptr"][:-1]
        if r == 0:
            # per-edge (sender oid, sender parent, sender pre)
            snd = state["_oid"][sp][sc]
            par = state["p"][sp][sc]
            pre = state["pre"][sp][sc]
            pos_e = block["udst_pos"][block["dst_code"]]
            tgt_e = np.searchsorted(
                block["tgt_ptr"], block["dst_code"], side="right"
            ) - 1
            for q in np.unique(tgt_e):
                m = tgt_e == q
                yield int(q), pos_e[m], {"m1": snd[m], "m2": par[m], "m3": pre[m]}
            return
        ready = (
            (state["recv"] == state["nch"]) & ~state["sent"]
            & (state["p"] != -1)
        )[sp]
        p_edge = state["p"][sp][sc]
        mask = (p_edge == block["udst"][block["dst_code"]]) & ready[sc]
        low = np.where(mask, state["low"][sp][sc], _I64MAX)
        high = np.where(mask, state["high"][sp][sc], np.int64(-1))
        red1 = np.minimum.reduceat(low, dptr)
        red2 = np.maximum.reduceat(high, dptr)
        red3 = np.add.reduceat(mask.astype(np.int64), dptr)
        live = red3 > 0
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
                    "m1": red1[lo:hi][m], "m2": red2[lo:hi][m],
                    "m3": red3[lo:hi][m],
                }

    def apply(self, oids, out_deg, state, msgs, scalars):
        r = int(scalars["_round"])
        low = state["low"].copy()
        high = state["high"].copy()
        recv = state["recv"].copy()
        sent = state["sent"].copy()
        pos = msgs["pos"]
        if r == 0:
            if len(pos):
                snd, par, pre = msgs["m1"], msgs["m2"], msgs["m3"]
                # non-tree neighbor: sender is not my parent AND I am not
                # the sender's parent
                nt = (snd != state["p"][pos]) & (par != state["_oid"][pos])
                if nt.any():
                    upos, vals = pos[nt], pre[nt]
                    np.minimum.at(low, upos, vals)
                    np.maximum.at(high, upos, vals)
        else:
            was_ready = (recv == state["nch"]) & ~sent & (state["p"] != -1)
            sent = sent | was_ready
            if len(pos):
                np.minimum.at(low, pos, msgs["m1"])
                np.maximum.at(high, pos, msgs["m2"])
                np.add.at(recv, pos, msgs["m3"])
        pending = float(((state["p"] != -1) & ~sent).sum())
        return (
            {"_oid": state["_oid"], "p": state["p"], "nch": state["nch"],
             "pre": state["pre"], "low": low, "high": high, "recv": recv,
             "sent": sent},
            {"pending": pending},
        )

    def converged(self, scalars, completed_rounds):
        if completed_rounds >= self.max_rounds:
            return True
        return completed_rounds >= 1 and scalars["pending"] == 0.0


def _compute_offsets(graph: LinkGraph, tree_workdir: str, tree_step: int,
                     off_dir: str) -> None:
    """off(v) = sum of sz over v's smaller-oid siblings: one bucket join
    on hash(parent), one write shuffle back to v's home partition."""
    P = graph.P
    os.makedirs(off_dir, exist_ok=True)
    state = rd.read_parquet(ckpt.step_dir(tree_workdir, tree_step))

    def tree_rows(b: pa.Table) -> pa.Table:
        p = b.column("p").to_numpy(zero_copy_only=False)
        keep = p != -1
        oid = b.column("oid").to_numpy(zero_copy_only=False)[keep]
        sz = b.column("sz").to_numpy(zero_copy_only=False)[keep]
        p = p[keep]
        return pa.table(
            {
                "v": pa.array(oid, pa.int64()),
                "p": pa.array(p, pa.int64()),
                "sz": pa.array(sz, pa.int64()),
                "b": pa.array(partition_of(p, P), pa.int32()),
            }
        )

    def offsets(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["p", "v"])
        sz = g["sz"].to_numpy(np.int64)
        p = g["p"].to_numpy(np.int64)
        cum = np.cumsum(sz) - sz
        # reset the running sum at each parent boundary
        starts = np.flatnonzero(np.r_[True, np.diff(p) != 0])
        base = np.repeat(cum[starts], np.diff(np.r_[starts, len(p)]))
        off = cum - base
        return pd.DataFrame({"v": g["v"].to_numpy(np.int64), "off": off})

    def write_aligned(g: pd.DataFrame) -> pd.DataFrame:
        pid = int(g["pid"].iloc[0])
        vs = pq.read_table(graph.vertexstate_path(pid), columns=["oid"])
        oids = vs.column("oid").to_numpy(zero_copy_only=False)
        off = np.zeros(len(oids), np.int64)
        g = g[g["v"] >= 0]
        if len(g):
            pos = np.searchsorted(oids, g["v"].to_numpy(np.int64))
            off[pos] = g["off"].to_numpy(np.int64)
        _atomic_write(
            pa.table({"off": pa.array(off, pa.int64())}),
            os.path.join(off_dir, f"off-{pid:05d}.parquet"),
        )
        return pd.DataFrame({"pid": [pid]})

    markers = rd.range(P, override_num_blocks=max(1, P // 8)).map_batches(
        lambda b: pd.DataFrame(
            {
                "v": np.full(len(b["id"]), -1, np.int64),
                "off": np.zeros(len(b["id"]), np.int64),
                "pid": b["id"].astype(np.int32),
            }
        ),
        batch_format="pandas",
    )
    (
        state.map_batches(tree_rows, batch_format="pyarrow")
        .groupby("b")
        .map_groups(lambda g: offsets(g.drop(columns="b")), batch_format="pandas")
        .map_batches(
            lambda b: b.assign(pid=partition_of(b["v"].to_numpy(np.int64), P)),
            batch_format="pandas",
        )
        .union(markers)
        .groupby("pid")
        .map_groups(write_aligned, batch_format="pandas")
    ).materialize()


def _attrs_dir(graph: LinkGraph, tree_workdir: str, tree_step: int,
               lh_workdir: str, lh_step: int, out_dir: str) -> str:
    """Combine the final per-partition states into attrs-{pid}.parquet:
    (oid, p, sz, pre, low, high) aligned to the vertexstate order."""
    os.makedirs(out_dir, exist_ok=True)
    P = graph.P

    def combine(batch: pa.Table) -> pa.Table:
        done = []
        for pid in batch.column("id").to_pylist():
            pid = int(pid)
            t1 = ckpt.read_state(tree_workdir, tree_step, pid)
            t2 = ckpt.read_state(lh_workdir, lh_step, pid)
            t = pa.table(
                {
                    "oid": t1.column("oid"),
                    "p": t1.column("p"),
                    "sz": t1.column("sz"),
                    "pre": t2.column("pre"),
                    "low": t2.column("low"),
                    "high": t2.column("high"),
                }
            )
            _atomic_write(t, os.path.join(out_dir, f"attrs-{pid:05d}.parquet"))
            done.append(pid)
        return pa.table({"pid": pa.array(done, pa.int32())})

    rd.range(P, override_num_blocks=P).map_batches(
        combine, batch_format="pyarrow"
    ).materialize()
    return out_dir


def run_bcc(graph: LinkGraph, workdir: str) -> dict:
    """-> {"edges": DataFrame (a, b, bcc), "bridges": DataFrame (a, b),
    "cutpoints": DataFrame (oid)}. Requires a symmetrized graph."""
    if not graph.meta.get("symmetrize"):
        raise ValueError("biconnectivity requires a symmetrized graph")
    P = graph.P
    os.makedirs(workdir, exist_ok=True)

    wcc = run_bsp(graph, WCC(), os.path.join(workdir, "wcc"))
    bfs = run_bsp(
        graph, MultiRootBFS(P, wcc.workdir, wcc.final_step),
        os.path.join(workdir, "bfs"),
    )
    tree = run_bsp(
        graph, TreeBuild(P, bfs.workdir, bfs.final_step),
        os.path.join(workdir, "tree"),
    )
    off_dir = os.path.join(workdir, "off")
    _compute_offsets(graph, tree.workdir, tree.final_step, off_dir)
    pre = run_bsp(
        graph, PreOrder(P, tree.workdir, tree.final_step, off_dir),
        os.path.join(workdir, "pre"),
    )
    lh = run_bsp(
        graph,
        LowHigh(P, tree.workdir, tree.final_step, pre.workdir, pre.final_step),
        os.path.join(workdir, "lowhigh"),
    )
    attrs = _attrs_dir(
        graph, tree.workdir, tree.final_step, lh.workdir, lh.final_step,
        os.path.join(workdir, "attrs"),
    )

    # ---- per-edge classification (src attrs local, dst attrs one join) --
    def src_side(batch: pa.Table):
        for pid in batch.column("id").to_pylist():
            pid = int(pid)
            e = pq.read_table(
                os.path.join(graph.graph_dir, "edges", f"edges-{pid:05d}.parquet"),
                columns=["src_id", "dst_id"],
            )
            a = pq.read_table(os.path.join(attrs, f"attrs-{pid:05d}.parquet"))
            oids = a.column("oid").to_numpy(zero_copy_only=False)
            src = e.column("src_id").to_numpy(zero_copy_only=False)
            dst = e.column("dst_id").to_numpy(zero_copy_only=False)
            i = np.searchsorted(oids, src)
            yield pa.table(
                {
                    "src": pa.array(src, pa.int64()),
                    "dst": pa.array(dst, pa.int64()),
                    "p_src": pa.array(
                        a.column("p").to_numpy(zero_copy_only=False)[i], pa.int64()),
                    "low_src": pa.array(
                        a.column("low").to_numpy(zero_copy_only=False)[i], pa.int64()),
                    "high_src": pa.array(
                        a.column("high").to_numpy(zero_copy_only=False)[i], pa.int64()),
                    "b": pa.array(partition_of(dst, P), pa.int32()),
                }
            )

    def dst_side(g: pd.DataFrame) -> pd.DataFrame:
        pid = int(g["b"].iloc[0])
        a = pq.read_table(os.path.join(attrs, f"attrs-{pid:05d}.parquet"))
        oids = a.column("oid").to_numpy(zero_copy_only=False)
        dst = g["dst"].to_numpy(np.int64)
        i = np.searchsorted(oids, dst)
        out = g.drop(columns=["b"]).copy()
        out["p_dst"] = a.column("p").to_numpy(zero_copy_only=False)[i]
        out["pre_dst"] = a.column("pre").to_numpy(zero_copy_only=False)[i]
        out["sz_dst"] = a.column("sz").to_numpy(zero_copy_only=False)[i]
        return out

    edges_full = (
        rd.range(P, override_num_blocks=P)
        .map_batches(src_side, batch_format="pyarrow")
        .groupby("b")
        .map_groups(dst_side, batch_format="pandas")
    ).materialize()

    # aux edges + (owner, a, b) edge-ownership rows
    def classify(b: pd.DataFrame):
        src = b["src"].to_numpy(np.int64)
        dst = b["dst"].to_numpy(np.int64)
        p_src = b["p_src"].to_numpy(np.int64)
        p_dst = b["p_dst"].to_numpy(np.int64)
        tree_cv = p_src == dst  # src is the child of this tree edge
        nontree = (~tree_cv) & (p_dst != src)
        out = []
        # (b) tree edge (w=dst, v=src), w non-root: aux v—w iff the
        # subtree of v escapes the subtree of w
        m = tree_cv & (p_dst != -1) & (
            (b["low_src"].to_numpy(np.int64) < b["pre_dst"].to_numpy(np.int64))
            | (b["high_src"].to_numpy(np.int64)
               >= b["pre_dst"].to_numpy(np.int64) + b["sz_dst"].to_numpy(np.int64))
        )
        out.append(pd.DataFrame({"x": src[m], "y": dst[m]}))
        # (a) non-tree edge once per direction pair
        m2 = nontree & (src < dst)
        out.append(pd.DataFrame({"x": src[m2], "y": dst[m2]}))
        res = pd.concat(out, ignore_index=True)
        return res if len(res) else pd.DataFrame(
            {"x": pd.Series([], dtype=np.int64), "y": pd.Series([], dtype=np.int64)}
        )

    def ownership(b: pd.DataFrame) -> pd.DataFrame:
        src = b["src"].to_numpy(np.int64)
        dst = b["dst"].to_numpy(np.int64)
        p_src = b["p_src"].to_numpy(np.int64)
        p_dst = b["p_dst"].to_numpy(np.int64)
        tree_cv = p_src == dst
        nontree = (~tree_cv) & (p_dst != src) & (src < dst)
        owner = np.concatenate([src[tree_cv], src[nontree]])
        a = np.concatenate(
            [np.minimum(src[tree_cv], dst[tree_cv]), src[nontree]]
        )
        z = np.concatenate(
            [np.maximum(src[tree_cv], dst[tree_cv]), dst[nontree]]
        )
        is_tree = np.concatenate(
            [np.ones(int(tree_cv.sum()), np.bool_),
             np.zeros(int(nontree.sum()), np.bool_)]
        )
        return pd.DataFrame({"owner": owner, "a": a, "z": z, "is_tree": is_tree})

    aux_edges = edges_full.map_batches(classify, batch_format="pandas")
    aux_dir = os.path.join(workdir, "auxgraph")
    aux_graph = LinkGraph.build(
        aux_edges, aux_dir, P=P, symmetrize=True,
        src_col="x", dst_col="y",
    )
    if aux_graph.n_edges > 0:
        aux_wcc = run_bsp(aux_graph, WCC(), os.path.join(workdir, "auxwcc"))
        cls = aux_wcc.state_pandas()[["oid", "comp"]]
    else:
        cls = pd.DataFrame({"oid": pd.Series([], dtype=np.int64),
                            "comp": pd.Series([], dtype=np.int64)})

    own = edges_full.map_batches(ownership, batch_format="pandas").to_pandas()
    lut = pd.Series(cls["comp"].to_numpy(np.int64), index=cls["oid"]).to_dict()
    owner_cls = own["owner"].map(lambda v: lut.get(v, v)).to_numpy(np.int64)
    own = own.assign(cls=owner_cls)
    own["key"] = own["a"].to_numpy(np.int64) * _SHIFT + own["z"].to_numpy(np.int64)
    bcc_label = own.groupby("cls")["key"].min()
    own["bcc"] = bcc_label.reindex(own["cls"]).to_numpy(np.int64)

    edges_out = (
        own[["a", "z", "bcc"]]
        .rename(columns={"z": "b"})
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    sizes = own.groupby("cls").size()
    own["cls_n"] = sizes.reindex(own["cls"]).to_numpy(np.int64)
    br = own[(own["cls_n"] == 1) & own["is_tree"]]
    bridges = (
        br[["a", "z"]].rename(columns={"z": "b"})
        .sort_values(["a", "b"]).reset_index(drop=True)
    )
    # articulation: tree edges only — every incident non-tree edge shares
    # the owner's class, so tree-edge classes already carry the full set
    tr = own[own["is_tree"]]
    pairs = pd.concat(
        [
            pd.DataFrame({"w": tr["a"].to_numpy(np.int64), "cls": tr["cls"]}),
            pd.DataFrame({"w": tr["z"].to_numpy(np.int64), "cls": tr["cls"]}),
        ],
        ignore_index=True,
    )
    ncls = pairs.drop_duplicates().groupby("w").size()
    cutpoints = pd.DataFrame(
        {"oid": np.sort(ncls[ncls >= 2].index.to_numpy(np.int64))}
    )
    return {"edges": edges_out, "bridges": bridges, "cutpoints": cutpoints}
