"""MIS: independence + maximality, and exact match vs a sequential
replay of the same deterministic Luby spec."""

import os

import numpy as np
import pytest
import ray.data as rd

from raylinkgraph.algos.mis import IN_MIS, MIS, _key
from raylinkgraph.bsp import run_bsp
from raylinkgraph.oracle.reference import random_edges
from raylinkgraph.stages.graph_build import LinkGraph


def _mis_ref(adj: dict, verts: np.ndarray) -> set:
    st = {int(v): 0 for v in verts}
    for luby in range(200):
        undec = [v for v, s in st.items() if s == 0]
        if not undec:
            break
        keys = {
            v: int(_key(np.array([v], np.int64), luby)[0]) for v in undec
        }
        sel = [
            v for v in undec
            if all(st[u] != 0 or keys[v] > keys[u] for u in adj[v])
        ]
        for v in sel:
            st[v] = 1
        for v in sel:
            for u in adj[v]:
                if st[u] == 0:
                    st[u] = 2
    return {v for v, s in st.items() if s == 1}


def test_mis(ray_session, tmp_root):
    edges = random_edges(150, 900, seed=23)
    g = LinkGraph.build(
        rd.from_pandas(edges), os.path.join(tmp_root, "g-mis"), P=4,
        symmetrize=True,
    )
    res = run_bsp(g, MIS(), os.path.join(tmp_root, "ck-mis"), max_rounds=200)
    df = res.state_pandas()
    mis = set(df.loc[df["status"] == IN_MIS, "oid"].astype(int))

    import collections

    adj = collections.defaultdict(set)
    for u, v in edges[["src_id", "dst_id"]].itertuples(index=False, name=None):
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
    # independence
    for v in mis:
        assert not (adj[v] & mis), v
    # maximality: every non-member has a member neighbor
    allv = set(df["oid"].astype(int))
    for v in allv - mis:
        assert adj[v] & mis, v
    # exact spec replay
    want = _mis_ref(adj, df["oid"].to_numpy(np.int64))
    assert mis == want
