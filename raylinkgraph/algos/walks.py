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

from raylinkgraph.functions.hashing import partition_of

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
