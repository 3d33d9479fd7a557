"""VoteRank vs a sequential replay of the pinned integer-unit spec."""

import collections
import os

import numpy as np
import pytest
import ray.data as rd

from raylinkgraph.algos.voterank import D_UNITS, run_voterank
from raylinkgraph.oracle.reference import random_edges
from raylinkgraph.stages.graph_build import LinkGraph


def _voterank_ref(adj: dict, n_edges_sym: int, n_seeds: int):
    verts = sorted(adj)
    dec = (D_UNITS * len(verts)) // n_edges_sym
    a = {v: D_UNITS for v in verts}
    elected = []
    chosen = set()
    for _ in range(n_seeds):
        best, best_key = None, None
        for v in verts:
            if v in chosen:
                continue
            s = sum(a[u] for u in adj[v])
            key = (s, -v)
            if best_key is None or key > best_key:
                best, best_key = v, key
        elected.append((best, best_key[0]))
        chosen.add(best)
        a[best] = 0
        for u in adj[best]:
            a[u] = max(a[u] - dec, 0)
    return elected


def test_voterank(ray_session, tmp_root):
    edges = random_edges(120, 700, seed=29)
    g = LinkGraph.build(
        rd.from_pandas(edges), os.path.join(tmp_root, "g-vr"), P=4,
        symmetrize=True,
    )
    got = run_voterank(g, os.path.join(tmp_root, "ck-vr"), n_seeds=4)

    adj = collections.defaultdict(set)
    for u, v in edges[["src_id", "dst_id"]].itertuples(index=False, name=None):
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
    want = _voterank_ref(adj, g.n_edges, 4)
    assert got["oid"].tolist() == [w[0] for w in want]
    assert got["score"].tolist() == [w[1] for w in want]
