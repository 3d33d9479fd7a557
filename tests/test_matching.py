"""Maximal matching: validity + maximality + exact sequential replay of
the role-split handshake spec."""

import collections
import os

import numpy as np
import pytest
import ray.data as rd

from raylinkgraph.algos.matching import MaximalMatching, _role
from raylinkgraph.bsp import run_bsp
from raylinkgraph.oracle.reference import random_edges
from raylinkgraph.stages.graph_build import LinkGraph


def _mm_ref(adj: dict, max_rounds=200):
    verts = sorted(adj)
    mate = {v: -1 for v in verts}
    for h in range(max_rounds):
        un = [v for v in verts if mate[v] == -1]
        if not any(any(mate[u] == -1 for u in adj[v]) for v in un):
            break
        role = {
            v: int(_role(np.array([v], np.int64), h)[0]) for v in verts
        }
        chosen = {}
        for v in un:
            if role[v] != 1:
                continue
            props = [u for u in adj[v] if mate[u] == -1 and role[u] == 0]
            if props:
                chosen[v] = min(props)
        by_proposer = collections.defaultdict(list)
        for v, u in chosen.items():
            by_proposer[u].append(v)
        for u, vs in by_proposer.items():
            if mate[u] == -1:
                v = min(vs)
                mate[u] = v
                mate[v] = u
    return mate


def test_matching(ray_session, tmp_root):
    edges = random_edges(140, 800, seed=41)
    g = LinkGraph.build(
        rd.from_pandas(edges), os.path.join(tmp_root, "g-mm"), P=4,
        symmetrize=True,
    )
    res = run_bsp(g, MaximalMatching(), os.path.join(tmp_root, "ck-mm"),
                  max_rounds=600)
    df = res.state_pandas()
    mate = dict(zip(df["oid"].astype(int), df["mate"].astype(int)))

    adj = collections.defaultdict(set)
    for u, v in edges[["src_id", "dst_id"]].itertuples(index=False, name=None):
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
    # validity: symmetric, adjacent pairs
    for v, m in mate.items():
        if m != -1:
            assert mate[m] == v and m in adj[v], (v, m)
    # maximality: no unmatched adjacent pair remains
    for v, m in mate.items():
        if m == -1:
            assert all(mate[u] != -1 for u in adj[v]), v
    # exact spec replay
    want = _mm_ref(adj)
    assert mate == want
