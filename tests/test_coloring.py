"""Jones-Plassmann coloring: proper coloring + exact sequential replay."""

import collections
import os

import numpy as np
import pytest
import ray.data as rd

from raylinkgraph.algos.coloring import Coloring
from raylinkgraph.algos.mis import _key
from raylinkgraph.bsp import run_bsp
from raylinkgraph.oracle.reference import random_edges
from raylinkgraph.stages.graph_build import LinkGraph


def _coloring_ref(adj, max_rounds=500):
    color = {v: -1 for v in adj}
    for r in range(max_rounds):
        if all(c >= 0 for c in color.values()):
            break
        keys = {v: int(_key(np.array([v], np.int64), r)[0]) for v in adj}
        winners = [
            v for v in adj if color[v] == -1
            and all(color[u] >= 0 or keys[v] > keys[u] for u in adj[v])
        ]
        for v in winners:
            used = {color[u] for u in adj[v] if color[u] >= 0}
            c = 0
            while c in used:
                c += 1
            color[v] = c
    return color


def test_coloring(ray_session, tmp_root):
    edges = random_edges(120, 700, seed=53)
    g = LinkGraph.build(
        rd.from_pandas(edges), os.path.join(tmp_root, "g-col"), P=4,
        symmetrize=True,
    )
    res = run_bsp(g, Coloring(), os.path.join(tmp_root, "ck-col"),
                  max_rounds=500)
    df = res.state_pandas()
    color = dict(zip(df["oid"].astype(int), df["color"].astype(int)))

    adj = collections.defaultdict(set)
    for u, v in edges[["src_id", "dst_id"]].itertuples(index=False, name=None):
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
    assert all(c >= 0 for c in color.values())
    for v, cs in adj.items():
        for u in cs:
            assert color[v] != color[u], (v, u)
    want = _coloring_ref(adj)
    assert color == want
