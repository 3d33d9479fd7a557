"""SSSPParents: distances vs networkx dijkstra; parent pointers satisfy
the pinned invariant par(v) = MIN u with dist(u) + w(u,v) == dist(v)."""

import os

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from raylinkgraph.algos.sssp import SSSPParents, walk_parents
from raylinkgraph.bsp import run_bsp
from raylinkgraph.oracle.reference import random_edges
from raylinkgraph.stages.graph_build import LinkGraph


def test_sssp_parents(ray_session, tmp_root):
    import networkx as nx

    rng = np.random.Generator(np.random.Philox(key=[21, 0]))
    edges = random_edges(100, 600, seed=21)
    edges = edges.drop_duplicates(["src_id", "dst_id"])
    edges["weight"] = rng.integers(1, 9, len(edges)).astype(np.float64)
    g = LinkGraph.build(
        rd.from_pandas(edges), os.path.join(tmp_root, "g-ssspp"), P=4,
        symmetrize=True, weight_col="weight",
    )
    src = int(edges["src_id"].min())
    res = run_bsp(g, SSSPParents(src), os.path.join(tmp_root, "ck-ssspp"),
                  max_rounds=10_000)
    st = res.state_pandas()

    G = nx.Graph()
    for u, v, w in edges[["src_id", "dst_id", "weight"]].itertuples(index=False, name=None):
        if u == v:
            continue
        # symmetrized build dedups with MIN weight across both directions
        if G.has_edge(u, v):
            G[u][v]["weight"] = min(G[u][v]["weight"], w)
        else:
            G.add_edge(u, v, weight=w)
    want = nx.single_source_dijkstra_path_length(G, src)

    dist = dict(zip(st["oid"], st["dist"]))
    par = dict(zip(st["oid"], st["par"]))
    for o, d in dist.items():
        if np.isfinite(d):
            assert abs(d - want[o]) < 1e-9, o
        else:
            assert o not in want
    # parent invariant
    wmap = {}
    for u, v, data in G.edges(data=True):
        wmap[(u, v)] = wmap[(v, u)] = data["weight"]
    for o, p in par.items():
        if o == src or not np.isfinite(dist[o]):
            assert p == -1
            continue
        cands = [
            u for u in G.neighbors(o)
            if np.isfinite(dist[u]) and abs(dist[u] + wmap[(u, o)] - dist[o]) < 1e-9
        ]
        assert p == min(cands), (o, p, cands)

    # walk gives a genuine shortest path ending at the chosen target
    target = max(o for o, d in dist.items() if np.isfinite(d))
    path = walk_parents(res.workdir, res.final_step, g.P, target)
    assert path[0][0] == src and path[-1][0] == target
    total = sum(
        wmap[(path[i][0], path[i + 1][0])] for i in range(len(path) - 1)
    )
    assert abs(total - want[target]) < 1e-9
