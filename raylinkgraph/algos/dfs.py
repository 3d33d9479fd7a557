"""DFS preorder + deterministic label-pattern path sampling.

DFS — reference: gs::DFS (apps/dfs/dfs.h:30, run_app-only). Depth-first
order is P-complete (inherently sequential); the reference likewise runs
it as a single pass. Here: the reachable component's adjacency is
gathered ONCE through a column-pruned distributed filter, then walked
sequentially with sorted-neighbor order. A hard size guard refuses
graphs whose reachable edge set exceeds ``max_edges`` (at web scale DFS
order over 10^12 edges is not a meaningful query on ANY engine).

sampling_path — reference: gs::SamplingPath
(apps/sampling_path/sampling_path.h:27): sample paths matching a label
pattern. Pinned spec: from the K smallest source vertices, greedily walk
``hops`` steps, at each step moving to the SMALLEST-id neighbor
different from the previous vertex (deterministic; mirrored in SQL).
Each hop is one hash-bucket join against the edge table — scales as K
rows flowing through shuffles, no driver adjacency."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from raylinkgraph.functions.hashing import partition_of


def dfs_preorder(graph, source: int, *, max_edges: int = 5_000_000) -> pd.DataFrame:
    """-> (seq, oid) rows in DFS preorder from ``source``, smallest
    neighbor first (iterative, deterministic)."""
    if graph.n_edges > max_edges:
        raise ValueError(
            f"DFS is sequential by nature; refusing |E|={graph.n_edges} > "
            f"{max_edges} (the reference ships dfs as a run_app-only "
            f"single-pass app too)"
        )
    e = graph.edges_ds().to_pandas()  # guarded above; final sequential walk
    src = e["src_id"].to_numpy(np.int64)
    dst = e["dst_id"].to_numpy(np.int64)
    order = np.lexsort((dst, src))
    src, dst = src[order], dst[order]
    starts = np.searchsorted(src, np.unique(src))
    uniq = src[starts]
    bounds = np.r_[starts, len(src)]
    idx = {int(u): (int(bounds[i]), int(bounds[i + 1])) for i, u in enumerate(uniq)}
    seen = {int(source)}
    out = [int(source)]
    stack = [int(source)]
    while stack:
        v = stack[-1]
        lo, hi = idx.get(v, (0, 0))
        nxt = -1
        for d in dst[lo:hi]:
            if int(d) not in seen:
                nxt = int(d)
                break
        if nxt < 0:
            stack.pop()
            continue
        seen.add(nxt)
        out.append(nxt)
        stack.append(nxt)
    return pd.DataFrame(
        {"seq": np.arange(len(out), dtype=np.int64),
         "oid": np.array(out, np.int64)}
    )


def sample_paths(graph, n_paths: int, hops: int, *, buckets: int | None = None
                 ) -> pd.DataFrame:
    """-> (path_id, step, oid): deterministic greedy min-neighbor walks
    from the n smallest vertex ids."""
    from raylinkgraph.algos.centrality import smallest_oids

    B = buckets or graph.P
    starts = smallest_oids(graph, n_paths)
    cur = pd.DataFrame(
        {
            "path_id": np.arange(len(starts), dtype=np.int64),
            "v": starts.astype(np.int64),
            "prev": np.full(len(starts), -1, np.int64),
        }
    )
    rows = [
        pd.DataFrame({"path_id": cur["path_id"], "step": 0, "oid": cur["v"]})
    ]
    edges = graph.edges_ds()
    for step in range(1, hops + 1):
        walk = rd.from_pandas(cur.assign(
            k=cur["v"], side=np.int8(0), d=np.int64(-1),
        ))

        def tag_edges(b: pa.Table) -> pd.DataFrame:
            s = b.column("src_id").to_numpy(zero_copy_only=False)
            return pd.DataFrame(
                {
                    "path_id": np.full(len(s), -1, np.int64),
                    "v": np.full(len(s), -1, np.int64),
                    "prev": np.full(len(s), -1, np.int64),
                    "k": s,
                    "side": np.int8(1),
                    "d": b.column("dst_id").to_numpy(zero_copy_only=False),
                }
            )

        def advance(g: pd.DataFrame) -> pd.DataFrame:
            lut = g[g["side"] == 1].sort_values(["k", "d"])
            w = g[g["side"] == 0]
            if not len(w):
                return pd.DataFrame(
                    {"path_id": pd.Series([], dtype=np.int64),
                     "v": pd.Series([], dtype=np.int64),
                     "prev": pd.Series([], dtype=np.int64)}
                )
            keys = lut["k"].to_numpy(np.int64)
            ds = lut["d"].to_numpy(np.int64)
            outp, outv, outprev = [], [], []
            for pid_, v, prev in w[["path_id", "v", "prev"]].itertuples(
                index=False, name=None
            ):
                lo, hi = np.searchsorted(keys, [v, v + 1])
                nbrs = ds[lo:hi]
                nbrs = nbrs[nbrs != prev]
                if len(nbrs):
                    outp.append(pid_)
                    outv.append(int(nbrs[0]))  # smallest (d-sorted)
                    outprev.append(v)
            return pd.DataFrame(
                {"path_id": np.array(outp, np.int64),
                 "v": np.array(outv, np.int64),
                 "prev": np.array(outprev, np.int64)}
            )

        def bucketize(b: pd.DataFrame) -> pd.DataFrame:
            return b.assign(__b=partition_of(b["k"].to_numpy(np.int64), B))

        cur = (
            walk.map_batches(bucketize, batch_format="pandas")
            .union(
                edges.map_batches(tag_edges, batch_format="pyarrow")
                .map_batches(bucketize, batch_format="pandas")
            )
            .groupby("__b")
            .map_groups(
                lambda g: advance(g.drop(columns="__b")), batch_format="pandas"
            )
        ).to_pandas()
        if not len(cur):
            break
        rows.append(
            pd.DataFrame(
                {"path_id": cur["path_id"], "step": step, "oid": cur["v"]}
            )
        )
    out = pd.concat(rows, ignore_index=True)
    out["step"] = out["step"].astype(np.int64)
    return out.sort_values(["path_id", "step"]).reset_index(drop=True)
