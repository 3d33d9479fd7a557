"""VoteRank: iterative vote-and-suppress influential-seed selection.

Reference: voterank (.gs_conf.yaml:299, apps/voterank/voterank.h:30).
Pinned INTEGER spec (float voting abilities would make cross-system
argmax comparisons order-dependent; integer units are exact in both the
engine and the SQL oracle):

  D   = 2^20 voting-ability units
  dec = (D * V) // E_sym        (= D / mean-degree, integer division)
  every vertex starts with ability D; per election:
    score(v) = sum of neighbors' abilities   (undirected)
    winner   = argmax score among un-elected, smallest id on ties
    winner's ability -> 0; each neighbor's ability -> max(ability-dec, 0)
  T elections -> the seed list in election order.

Composed from the bucket-join / bucketed-sum helpers (louvain.py); the
per-election state lives in materialized object-store blocks; the winner
argmax is a per-batch partial reduce (P rows to the driver) with the
tiny elected set filtered by closure (no join); the winner's
neighborhood update ships one adjacency list via the object store."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import ray
import ray.data as rd

from raylinkgraph.algos.louvain import _attach, _sum_by
from raylinkgraph.pipelines.graph_ops import successors

D_UNITS = 1 << 20


def run_voterank(graph, workdir: str, n_seeds: int = 5) -> pd.DataFrame:
    """-> (rank, oid, score) for the elected seeds, in election order."""
    os.makedirs(workdir, exist_ok=True)
    B = graph.P
    dec = (D_UNITS * graph.n_vertices) // graph.n_edges  # E counts both dirs

    def norm(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"src": b["src_id"].to_numpy(np.int64),
             "dst": b["dst_id"].to_numpy(np.int64)}
        )

    # object-store pins, not parquet round trips: edges are re-joined
    # once per election and state is rewritten per election — both stay
    # as materialized block lists (spill-friendly), no filesystem IO
    edges = graph.edges_ds().map_batches(norm, batch_format="pandas").materialize()

    state = (
        rd.read_parquet(
            os.path.join(graph.graph_dir, "vertexstate"), columns=["oid"]
        )
        .map_batches(
            lambda b: pd.DataFrame(
                {"v": b["oid"].to_numpy(np.int64),
                 "a": np.full(len(b), float(D_UNITS)),
                 "elected": np.zeros(len(b))}
            ),
            batch_format="pandas",
        )
        .materialize()
    )

    elected: list[tuple[int, int]] = []
    for e in range(n_seeds):
        scored = _sum_by(
            _attach(edges, "dst", state, "v", ["a"], ["a_dst"], B,
                    {"src": "int64", "dst": "int64"}),
            "src", "a_dst", "score", B,
        )
        # the elected set is <= n_seeds ids: filter it in the per-batch
        # argmax via a plain closure instead of a third bucket-join
        # shuffle per election (VERDICT r2 perf discipline)
        elected_ids = np.array(sorted(w for w, _ in elected), np.int64)

        def top(b: pd.DataFrame, elected_ids=elected_ids) -> pd.DataFrame:
            b = b[~b["src"].isin(elected_ids)]
            if not len(b):
                return pd.DataFrame({"v": [np.int64(-1)], "s": [-1.0]})
            i = np.lexsort((b["src"].to_numpy(), -b["score"].to_numpy()))[0]
            return pd.DataFrame(
                {"v": [np.int64(b["src"].iloc[i])], "s": [float(b["score"].iloc[i])]}
            )

        parts = scored.map_batches(top, batch_format="pandas").to_pandas()
        i = np.lexsort((parts["v"].to_numpy(), -parts["s"].to_numpy()))[0]
        w, ws = int(parts["v"].iloc[i]), int(parts["s"].iloc[i])
        elected.append((w, ws))
        nbrs = np.unique(successors(graph, w))
        ref = ray.put(nbrs)

        def update(b: pd.DataFrame, w=w) -> pd.DataFrame:
            nb = ray.get(ref)
            b = b.copy()
            v = b["v"].to_numpy(np.int64)
            a = b["a"].to_numpy(np.float64)
            el = b["elected"].to_numpy(np.float64)
            hit = np.isin(v, nb)
            a = np.where(hit, np.maximum(a - dec, 0.0), a)
            a = np.where(v == w, 0.0, a)
            el = np.where(v == w, 1.0, el)
            return pd.DataFrame({"v": v, "a": a, "elected": el})

        state = state.map_batches(update, batch_format="pandas").materialize()

    return pd.DataFrame(
        {
            "rank": np.arange(1, len(elected) + 1, dtype=np.int64),
            "oid": np.array([x[0] for x in elected], np.int64),
            "score": np.array([x[1] for x in elected], np.int64),
        }
    )
