"""Deterministic pseudo-random walk corpus generation (the sampling
front-end of DeepWalk/node2vec-style embedding pipelines).

Every walk step picks the idx-th neighbor (id-sorted) of the current
vertex with idx = ((walk_id % 97) * 131 + step * 31 + cur % 1000003)
% deg — a small-coefficient congruential selector chosen to be (a)
fully deterministic across runs/partitionings, and (b) expressible in
ANSI SQL with no 64-bit overflow, so the driver oracle can replay the
walks exactly (ROW_NUMBER() over the id-sorted adjacency + the same
modulus). Swap `_pick` for a splitmix64-based index when statistical
quality matters more than SQL replayability.

Scale shape: one hash(cur)-bucketed shuffle per hop — the frontier
(walk_id, step, cur) meets the adjacency run of cur inside the bucket
and advances vectorized (searchsorted into the bucket's src-sorted edge
block); dead-ends (deg 0 is impossible here — every cur came from an
edge — but a vertex with no OUT-edges stops) terminate the walk early.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from raylinkgraph.functions.hashing import check_u32, partition_of

_B = 32


def _pick(walk_id: np.ndarray, step: int, cur: np.ndarray, deg: np.ndarray) -> np.ndarray:
    return ((walk_id % 97) * 131 + step * 31 + cur % 1000003) % deg


def random_walks(
    edges: rd.Dataset,
    *,
    walk_len: int,
    src_col: str = "src_id",
    dst_col: str = "dst_id",
) -> rd.Dataset:
    """One walk per distinct source vertex (walk_id = start vertex),
    ``walk_len`` hops -> (walk_id, step, vertex) rows, step 0 = start.
    """

    def bucket_edges(b: pd.DataFrame) -> pd.DataFrame:
        s = b[src_col].to_numpy(np.int64)
        d = b[dst_col].to_numpy(np.int64)
        return pd.DataFrame({"s": s, "d": d, "side": np.int8(0),
                             "w": np.int64(-1), "st": np.int8(-1),
                             "__p": partition_of(s, _B)})

    # consumed once per hop: pin the bucketed edge blocks or the whole
    # upstream edge pipeline re-executes walk_len times
    edges_tagged = edges.map_batches(
        bucket_edges, batch_format="pandas"
    ).materialize()

    def start_partial(b: pd.DataFrame) -> pd.DataFrame:
        u = np.unique(b[src_col].to_numpy(np.int64))
        return pd.DataFrame({"u": u, "__p": partition_of(u, _B)})

    def start_fold(g: pd.DataFrame) -> pd.DataFrame:
        # GLOBAL dedup per bucket (a per-batch unique alone would start
        # duplicate walks for sources spanning batches)
        u = np.unique(g["u"].to_numpy(np.int64))
        return pd.DataFrame({"s": u, "d": np.int64(-1), "side": np.int8(1),
                             "w": u, "st": np.int8(0),
                             "__p": partition_of(u, _B)})

    frontier = (
        edges.map_batches(start_partial, batch_format="pandas")
        .groupby("__p")
        .map_groups(start_fold, batch_format="pandas")
        .materialize()
    )
    out_frames = [
        frontier.map_batches(
            lambda b: pd.DataFrame(
                {"walk_id": b["w"].to_numpy(np.int64),
                 "step": np.int64(0),
                 "vertex": b["s"].to_numpy(np.int64)}
            ),
            batch_format="pandas",
        )
    ]

    for step in range(1, walk_len + 1):
        def advance(g: pd.DataFrame, step=step) -> pd.DataFrame:
            ee = g[g["side"] == 0].drop_duplicates(["s", "d"]).sort_values(["s", "d"])
            ff = g[g["side"] == 1]
            if not len(ee) or not len(ff):
                return pd.DataFrame({"walk_id": pd.Series([], dtype=np.int64),
                                     "step": pd.Series([], dtype=np.int64),
                                     "vertex": pd.Series([], dtype=np.int64)})
            es = ee["s"].to_numpy(np.int64)
            ed = ee["d"].to_numpy(np.int64)
            cur = ff["s"].to_numpy(np.int64)
            wid = ff["w"].to_numpy(np.int64)
            lo = np.searchsorted(es, cur, side="left")
            hi = np.searchsorted(es, cur, side="right")
            deg = hi - lo
            live = deg > 0
            if not live.any():
                return pd.DataFrame({"walk_id": pd.Series([], dtype=np.int64),
                                     "step": pd.Series([], dtype=np.int64),
                                     "vertex": pd.Series([], dtype=np.int64)})
            lo, deg = lo[live], deg[live]
            cur, wid = cur[live], wid[live]
            idx = _pick(wid, step, cur, deg)
            nxt = ed[lo + idx]
            return pd.DataFrame(
                {"walk_id": wid, "step": np.int64(step), "vertex": nxt}
            )

        stepped = (
            edges_tagged.union(frontier)
            .groupby("__p")
            .map_groups(advance, batch_format="pandas")
            # consumed twice (output + next frontier): pin the blocks or
            # the lazy lineage re-executes the whole prefix per hop
            .materialize()
        )
        out_frames.append(stepped)
        # next frontier: rebucket on the NEW position
        frontier = stepped.map_batches(
            lambda b: pd.DataFrame(
                {"s": b["vertex"].to_numpy(np.int64), "d": np.int64(-1),
                 "side": np.int8(1), "w": b["walk_id"].to_numpy(np.int64),
                 "st": np.int8(0),
                 "__p": partition_of(b["vertex"].to_numpy(np.int64), _B)}
            ),
            batch_format="pandas",
        )

    ds = out_frames[0]
    for f in out_frames[1:]:
        ds = ds.union(f)
    # the hop union carries ~(walk_len+1) * buckets TINY blocks; every
    # downstream pass would pay per-block task latency (measured: 480
    # blocks -> 30+ s per map over a 10k-row corpus). Consolidate once —
    # sub-second — before handing the corpus on.
    return ds.repartition(_B)


def khop_sample(
    edges: rd.Dataset,
    *,
    fanouts: list[int],
    seed_mod: int = 20,
    src_col: str = "src_id",
    dst_col: str = "dst_id",
) -> rd.Dataset:
    """GraphSAGE-style k-hop fixed-fanout neighbor sampling (Hamilton et
    al. 2017 minibatch frontier; the reference's GLE sampling surface is
    out of scope per SURVEY §2.5 — this is the Dataset-native
    equivalent of its 1-hop/k-hop neighbor samplers).

    Seeds = vertices with id % seed_mod == 0. At hop h (1-based) each
    frontier pair (seed, v) samples min(fanouts[h-1], deg(v)) DISTINCT
    neighbors as a circular block of the id-sorted adjacency starting at

      start = ((seed % 97) * 131 + h * 31 + v % 1000003) % deg

    i.e. rn selected iff (rn - start + deg) % deg < fanout — per-seed
    independent, deterministic, and exactly SQL-replayable (ROW_NUMBER
    adjacency + the same modular window). -> (seed, hop, src, dst).

    Scale shape mirrors random_walks: the bucketed edge blocks are
    pinned once; each hop is one hash(vertex)-bucketed exchange where
    the frontier meets its adjacency run (searchsorted) and expands
    vectorized; the frontier is deduped per (seed, vertex) so repeated
    reaches never re-expand.
    """

    def bucket_edges(b: pd.DataFrame) -> pd.DataFrame:
        s = b[src_col].to_numpy(np.int64)
        d = b[dst_col].to_numpy(np.int64)
        return pd.DataFrame({"s": s, "d": d, "side": np.int8(0),
                             "seed": np.int64(-1),
                             "__p": partition_of(s, _B)})

    edges_tagged = edges.map_batches(
        bucket_edges, batch_format="pandas"
    ).materialize()

    def seed_partial(b: pd.DataFrame) -> pd.DataFrame:
        u = np.unique(b[src_col].to_numpy(np.int64))
        u = u[u % seed_mod == 0]
        return pd.DataFrame({"u": u, "__p": partition_of(u, _B)})

    def seed_fold(g: pd.DataFrame) -> pd.DataFrame:
        u = np.unique(g["u"].to_numpy(np.int64))
        return pd.DataFrame({"s": u, "d": np.int64(-1), "side": np.int8(1),
                             "seed": u, "__p": partition_of(u, _B)})

    frontier = (
        edges.map_batches(seed_partial, batch_format="pandas")
        .groupby("__p")
        .map_groups(seed_fold, batch_format="pandas")
        .materialize()
    )

    out_frames = []
    empty = pd.DataFrame({"seed": pd.Series([], dtype=np.int64),
                          "hop": pd.Series([], dtype=np.int64),
                          "src": pd.Series([], dtype=np.int64),
                          "dst": pd.Series([], dtype=np.int64)})

    for hop, fan in enumerate(fanouts, start=1):
        def expand(g: pd.DataFrame, hop=hop, fan=fan) -> pd.DataFrame:
            ee = g[g["side"] == 0].drop_duplicates(["s", "d"]).sort_values(["s", "d"])
            ff = g[g["side"] == 1]
            if not len(ee) or not len(ff):
                return empty
            es = ee["s"].to_numpy(np.int64)
            ed = ee["d"].to_numpy(np.int64)
            cur = ff["s"].to_numpy(np.int64)
            sd = ff["seed"].to_numpy(np.int64)
            lo = np.searchsorted(es, cur, side="left")
            deg = np.searchsorted(es, cur, side="right") - lo
            live = deg > 0
            if not live.any():
                return empty
            lo, deg, cur, sd = lo[live], deg[live], cur[live], sd[live]
            start = ((sd % 97) * 131 + hop * 31 + cur % 1000003) % deg
            k = np.minimum(deg, fan)
            rep = np.repeat(np.arange(len(cur)), k)
            j = np.arange(len(rep)) - np.repeat(
                np.concatenate([[0], np.cumsum(k)[:-1]]), k
            )
            idx = (start[rep] + j) % deg[rep]
            return pd.DataFrame(
                {"seed": sd[rep], "hop": np.int64(hop),
                 "src": cur[rep], "dst": ed[lo[rep] + idx]}
            )

        stepped = (
            edges_tagged.union(frontier)
            .groupby("__p")
            .map_groups(expand, batch_format="pandas")
            .materialize()  # consumed twice: output + next frontier
        )
        out_frames.append(stepped)
        if hop < len(fanouts):
            def next_partial(b: pd.DataFrame) -> pd.DataFrame:
                u = b[["seed", "dst"]].drop_duplicates()
                return pd.DataFrame(
                    {"sv": u["seed"].to_numpy(np.int64),
                     "vv": u["dst"].to_numpy(np.int64),
                     "__p": partition_of(u["dst"].to_numpy(np.int64), _B)}
                )

            def next_fold(g: pd.DataFrame) -> pd.DataFrame:
                u = g[["sv", "vv"]].drop_duplicates()
                return pd.DataFrame(
                    {"s": u["vv"].to_numpy(np.int64), "d": np.int64(-1),
                     "side": np.int8(1),
                     "seed": u["sv"].to_numpy(np.int64),
                     "__p": partition_of(u["vv"].to_numpy(np.int64), _B)}
                )

            frontier = (
                stepped.map_batches(next_partial, batch_format="pandas")
                .groupby("__p")
                .map_groups(next_fold, batch_format="pandas")
            )

    ds = out_frames[0]
    for f in out_frames[1:]:
        ds = ds.union(f)
    return ds.repartition(_B)


def node2vec_walks(
    edges: rd.Dataset,
    *,
    walk_len: int,
    wr: int = 2,
    wi: int = 4,
    wo: int = 1,
    seed_mod: int = 1,
    src_col: str = "src_id",
    dst_col: str = "dst_id",
) -> rd.Dataset:
    """Second-order biased walks (node2vec, Grover & Leskovec 2016 §3.2):
    the next vertex x from cur with memory of prev is drawn with
    unnormalized weight

        wr  if x == prev           (return,   ~ 1/p scaled to integers)
        wi  if edge (prev, x)      (in/BFS-ish)
        wo  otherwise              (out/DFS-ish, ~ 1/q)

    made deterministic + SQL-replayable: candidates are the id-sorted
    adjacency of cur; r = ((walk_id%97)*131 + step*31 + cur%1000003)
    mod W (W = total integer weight) selects the candidate whose
    cumulative-weight interval [cw - w, cw) contains r — a window-cumsum
    replay in ANSI SQL, no floats, no 64-bit overflow. Step 1 has no
    prev and is the uniform first-order pick (same selector mod deg).
    One walk per seed vertex (id % seed_mod == 0); walk_id = seed.

    Scale shape: per hop, THREE bucketed exchanges (all of ``_B``
    groups) — (1) hash(cur): frontier meets cur's adjacency run and
    expands to candidate rows; (2) hash(prev): candidates meet prev's
    adjacency run for the (prev, x) membership test (vectorized
    searchsorted against the bucket's sorted edge block); (3)
    hash(walk_id): each walk's candidate set folds to one pick via the
    integer cumsum rule. Candidate volume per hop is Σ deg(cur) over the
    frontier — the inherent node2vec cost; nothing is broadcast and the
    walk state (walk_id, prev, cur) is O(#walks).
    -> (walk_id, step, vertex) rows like random_walks.
    """

    def bucket_edges(b: pd.DataFrame) -> pd.DataFrame:
        s = b[src_col].to_numpy(np.int64)
        d = b[dst_col].to_numpy(np.int64)
        n = len(s)
        return pd.DataFrame({"s": s, "d": d, "side": np.int8(0),
                             "w": np.full(n, -1, np.int64),
                             "prev": np.full(n, -1, np.int64),
                             "__p": partition_of(s, _B)})

    edges_tagged = edges.map_batches(
        bucket_edges, batch_format="pandas"
    ).materialize()

    def seed_partial(b: pd.DataFrame) -> pd.DataFrame:
        u = np.unique(b[src_col].to_numpy(np.int64))
        u = u[u % seed_mod == 0]
        return pd.DataFrame({"u": u, "__p": partition_of(u, _B)})

    def seed_fold(g: pd.DataFrame) -> pd.DataFrame:
        u = np.unique(g["u"].to_numpy(np.int64))
        return pd.DataFrame({"s": u, "d": np.int64(-1), "side": np.int8(1),
                             "w": u, "prev": np.int64(-1),
                             "__p": partition_of(u, _B)})

    frontier = (
        edges.map_batches(seed_partial, batch_format="pandas")
        .groupby("__p")
        .map_groups(seed_fold, batch_format="pandas")
        .materialize()
    )
    out_frames = [
        frontier.map_batches(
            lambda b: pd.DataFrame(
                {"walk_id": b["w"].to_numpy(np.int64),
                 "step": np.int64(0),
                 "vertex": b["s"].to_numpy(np.int64)}
            ),
            batch_format="pandas",
        )
    ]
    _fr_empty = pd.DataFrame(
        {"walk_id": pd.Series([], dtype=np.int64),
         "step": pd.Series([], dtype=np.int64),
         "prev": pd.Series([], dtype=np.int64),
         "vertex": pd.Series([], dtype=np.int64)}
    )

    # ---- step 1: uniform first-order pick (no prev) -------------------
    def first_hop(g: pd.DataFrame) -> pd.DataFrame:
        ee = g[g["side"] == 0].drop_duplicates(["s", "d"]).sort_values(["s", "d"])
        ff = g[g["side"] == 1]
        if not len(ee) or not len(ff):
            return _fr_empty
        es, ed = ee["s"].to_numpy(np.int64), ee["d"].to_numpy(np.int64)
        cur = ff["s"].to_numpy(np.int64)
        wid = ff["w"].to_numpy(np.int64)
        lo = np.searchsorted(es, cur, side="left")
        deg = np.searchsorted(es, cur, side="right") - lo
        live = deg > 0
        if not live.any():
            return _fr_empty
        lo, deg, cur, wid = lo[live], deg[live], cur[live], wid[live]
        idx = _pick(wid, 1, cur, deg)
        return pd.DataFrame({"walk_id": wid, "step": np.int64(1),
                             "prev": cur, "vertex": ed[lo + idx]})

    state = (
        edges_tagged.union(frontier)
        .groupby("__p")
        .map_groups(first_hop, batch_format="pandas")
        .materialize()
    )
    out_frames.append(state.select_columns(["walk_id", "step", "vertex"]))

    _cand_empty = pd.DataFrame(
        {"walk_id": pd.Series([], dtype=np.int64),
         "prev": pd.Series([], dtype=np.int64),
         "cur": pd.Series([], dtype=np.int64),
         "x": pd.Series([], dtype=np.int64),
         "is_ret": pd.Series([], dtype=np.int8),
         "is_edge": pd.Series([], dtype=np.int8),
         "__p": pd.Series([], dtype=np.int32)}
    )

    for step in range(2, walk_len + 1):
        # (1) expand candidates at hash(cur)
        def to_frontier(b: pd.DataFrame) -> pd.DataFrame:
            cur = b["vertex"].to_numpy(np.int64)
            n = len(cur)
            return pd.DataFrame({"s": cur, "d": np.full(n, -1, np.int64),
                                 "side": np.int8(1),
                                 "w": b["walk_id"].to_numpy(np.int64),
                                 "prev": b["prev"].to_numpy(np.int64),
                                 "__p": partition_of(cur, _B)})

        def expand(g: pd.DataFrame) -> pd.DataFrame:
            ee = g[g["side"] == 0].drop_duplicates(["s", "d"]).sort_values(["s", "d"])
            ff = g[g["side"] == 1]
            if not len(ee) or not len(ff):
                return _cand_empty
            es, ed = ee["s"].to_numpy(np.int64), ee["d"].to_numpy(np.int64)
            cur = ff["s"].to_numpy(np.int64)
            wid = ff["w"].to_numpy(np.int64)
            prv = ff["prev"].to_numpy(np.int64)
            lo = np.searchsorted(es, cur, side="left")
            deg = np.searchsorted(es, cur, side="right") - lo
            live = deg > 0
            if not live.any():
                return _cand_empty
            lo, deg = lo[live], deg[live]
            cur, wid, prv = cur[live], wid[live], prv[live]
            rep = np.repeat(np.arange(len(cur)), deg)
            base = np.repeat(np.cumsum(deg) - deg, deg)
            x = ed[np.repeat(lo, deg) + (np.arange(len(rep)) - base)]
            prv_r = prv[rep]
            return pd.DataFrame(
                {"walk_id": wid[rep], "prev": prv_r, "cur": cur[rep],
                 "x": x,
                 "is_ret": (x == prv_r).astype(np.int8),
                 "is_edge": np.zeros(len(rep), np.int8),
                 "__p": partition_of(prv_r, _B)})

        cands = (
            state.map_batches(to_frontier, batch_format="pandas")
            .union(edges_tagged)
            .groupby("__p")
            .map_groups(expand, batch_format="pandas")
        )

        # (2) membership test (prev, x) at hash(prev)
        def mark_edges(g: pd.DataFrame) -> pd.DataFrame:
            ee = g[g["side"] == 0].drop_duplicates(["s", "d"]).sort_values(["s", "d"])
            cc = g[g["side"] == 1]
            if not len(cc):
                return _cand_empty
            out = cc.drop(columns=["s", "d", "side", "w", "__p"],
                          errors="ignore").copy()
            if len(ee):
                # (s << 32) | d packing (repo convention, cf. ktruss._enc):
                # injective for u32 ids and monotone in (s, d), so enc_e
                # stays sorted after the (s, d) sort above.  The previous
                # s * 2^31 + d encoding collided and broke sortedness for
                # ids >= 2^31, which check_u32 elsewhere permits.
                es = check_u32(ee["s"].to_numpy(np.int64), "node2vec prev")
                ed = check_u32(ee["d"].to_numpy(np.int64), "node2vec x")
                enc_e = (es.astype(np.uint64) << np.uint64(32)) | \
                    ed.astype(np.uint64)
                cs = check_u32(out["prev"].to_numpy(np.int64), "node2vec prev")
                cd = check_u32(out["x"].to_numpy(np.int64), "node2vec x")
                enc_c = (cs.astype(np.uint64) << np.uint64(32)) | \
                    cd.astype(np.uint64)
                pos = np.searchsorted(enc_e, enc_c)
                pos = np.minimum(pos, len(enc_e) - 1)
                out["is_edge"] = (enc_e[pos] == enc_c).astype(np.int8)
            out["__p"] = partition_of(out["walk_id"].to_numpy(np.int64), _B)
            return out

        def cand_side(b: pd.DataFrame) -> pd.DataFrame:
            b = b.copy()
            b["s"] = b["prev"]
            b["d"] = np.int64(-1)
            b["side"] = np.int8(1)
            b["w"] = np.int64(-1)
            return b

        marked = (
            cands.map_batches(cand_side, batch_format="pandas")
            .union(
                edges_tagged.map_batches(
                    lambda b: b.assign(
                        walk_id=np.int64(-1), cur=np.int64(-1),
                        x=np.int64(-1), is_ret=np.int8(0), is_edge=np.int8(0),
                    ),
                    batch_format="pandas",
                )
            )
            .groupby("__p")
            .map_groups(mark_edges, batch_format="pandas")
        )

        # (3) fold per walk: integer cumsum pick
        def pick(g: pd.DataFrame, step=step) -> pd.DataFrame:
            if not len(g):
                return _fr_empty
            g = g.sort_values(["walk_id", "x"], kind="mergesort")
            wid = g["walk_id"].to_numpy(np.int64)
            x = g["x"].to_numpy(np.int64)
            cur = g["cur"].to_numpy(np.int64)
            w = np.where(g["is_ret"].to_numpy(np.int8) == 1, wr,
                         np.where(g["is_edge"].to_numpy(np.int8) == 1, wi, wo)
                         ).astype(np.int64)
            is_new = np.r_[True, np.diff(wid) != 0]
            start_idx = np.flatnonzero(is_new)
            seg_len = np.diff(np.r_[start_idx, len(w)])
            cw = np.cumsum(w)
            # inclusive per-walk cumsum: subtract the running total at
            # each walk's first row
            cw0 = np.repeat(cw[start_idx] - w[start_idx], seg_len)
            cws = cw - cw0
            last_idx = np.r_[start_idx[1:], len(w)] - 1
            Wrep = np.repeat(cws[last_idx], seg_len)  # per-walk totals
            r = ((wid % 97) * 131 + step * 31 + cur % 1000003) % Wrep
            sel = (cws - w <= r) & (r < cws)
            return pd.DataFrame(
                {"walk_id": wid[sel], "step": np.int64(step),
                 "prev": cur[sel], "vertex": x[sel]})

        state = (
            marked.groupby("__p").map_groups(pick, batch_format="pandas")
            .materialize()
        )
        out_frames.append(state.select_columns(["walk_id", "step", "vertex"]))

    ds = out_frames[0]
    for f in out_frames[1:]:
        ds = ds.union(f)
    return ds.repartition(_B)
