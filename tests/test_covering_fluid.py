"""Dominating set, vertex cover, fluid communities, random multi-BFS,
densest subgraph: validity invariants + exact match vs sequential replays
of the same pinned deterministic specs."""

import collections
import os

import numpy as np
import pytest
import ray.data as rd

from raylinkgraph.algos.centrality import run_random_multi_bfs, smallest_oids
from raylinkgraph.algos.covering import MinDominatingSet, MinVertexCover
from raylinkgraph.algos.fluid import run_fluid
from raylinkgraph.algos.kshell import densest_subgraph_2approx
from raylinkgraph.bsp import run_bsp
from raylinkgraph.oracle.reference import random_edges
from raylinkgraph.stages.graph_build import LinkGraph


@pytest.fixture(scope="module")
def setup(ray_session, tmp_root):
    edges = random_edges(120, 700, seed=31)
    g = LinkGraph.build(
        rd.from_pandas(edges), os.path.join(tmp_root, "g-cov"), P=4,
        symmetrize=True,
    )
    adj = collections.defaultdict(set)
    for u, v in edges[["src_id", "dst_id"]].itertuples(index=False, name=None):
        if u != v:
            adj[int(u)].add(int(v))
            adj[int(v)].add(int(u))
    return g, adj, edges


def _dom_ref(adj):
    """Sequential replay of the 4-phase spec: 2-hop (resid-deg, id) maxima
    join; selected dominate neighborhoods; residuals recount."""
    verts = sorted(adj)
    dom = {v: False for v in verts}
    in_set = set()
    key = {v: (len(adj[v]), v) for v in verts}
    for _ in range(200):
        if all(dom.values()):
            break
        # two max-hops over undominated senders
        m1 = {}
        for v in verts:
            cands = [key[u] for u in adj[v] if not dom[u]]
            m1[v] = max([key[v]] + cands) if not dom[v] else key[v]
            if not dom[v] and cands:
                m1[v] = max(key[v], max(cands))
        m2 = {}
        for v in verts:
            cands = [m1[u] for u in adj[v] if not dom[u]]
            m2[v] = m1[v]
            if not dom[v] and cands:
                m2[v] = max(m1[v], max(cands))
        sel = [v for v in verts if not dom[v] and m2[v][1] == v]
        for v in sel:
            in_set.add(v)
            dom[v] = True
        for v in sel:
            for u in adj[v]:
                dom[u] = True
        for v in verts:
            if not dom[v]:
                key[v] = (sum(1 for u in adj[v] if not dom[u]), v)
    return in_set


def _cover_ref(adj):
    verts = sorted(adj)
    resid = {v: len(adj[v]) for v in verts}
    cov = set()
    for _ in range(200):
        active = [v for v in verts if v not in cov and resid[v] > 0]
        if not active:
            break
        sel = []
        for v in active:
            kv = (resid[v], v)
            if all(
                u in cov or resid[u] <= 0 or (resid[u], u) < kv
                for u in adj[v]
            ):
                sel.append(v)
        cov.update(sel)
        for v in sel:
            for u in adj[v]:
                if u not in cov:
                    resid[u] -= sum(1 for w in adj[u] if w in sel)
        # recompute exactly: resid = uncovered-edge degree
        for v in verts:
            if v not in cov:
                resid[v] = sum(1 for u in adj[v] if u not in cov)
    return cov


def test_min_dominating_set(setup, tmp_root):
    g, adj, _ = setup
    res = run_bsp(
        g, MinDominatingSet(), os.path.join(tmp_root, "ck-mds"),
        max_rounds=400,
    )
    df = res.state_pandas()
    got = set(df.loc[df["in_set"], "oid"].astype(int))
    # validity: every vertex is in the set or adjacent to a member
    for v in adj:
        assert v in got or (adj[v] & got), v
    assert got == _dom_ref(adj)


def test_min_vertex_cover(setup, tmp_root):
    g, adj, edges = setup
    res = run_bsp(
        g, MinVertexCover(), os.path.join(tmp_root, "ck-mvc"),
        max_rounds=400,
    )
    df = res.state_pandas()
    got = set(df.loc[df["c"], "oid"].astype(int))
    # validity: every edge covered
    for u in adj:
        for v in adj[u]:
            assert u in got or v in got, (u, v)
    assert got == _cover_ref(adj)


def _fluid_ref(adj, seeds, rounds):
    verts = sorted(adj)
    lab = {v: -1 for v in verts}
    for i, s in enumerate(seeds):
        lab[int(s)] = i
    cnt = [sum(1 for v in verts if lab[v] == i) for i in range(len(seeds))]
    for _ in range(rounds):
        new = {}
        for v in verts:
            m = [0] * len(seeds)
            for u in adj[v]:
                if lab[u] >= 0:
                    m[lab[u]] += 1
            if lab[v] >= 0:
                m[lab[v]] += 1
            best, bm, bc = lab[v], 0, 1
            if lab[v] >= 0:
                bm, bc = m[lab[v]], cnt[lab[v]]
            for i in range(len(seeds)):
                if cnt[i] == 0 or m[i] == 0 or i == best:
                    continue
                if best < 0 or m[i] * bc > bm * cnt[i]:
                    best, bm, bc = i, m[i], cnt[i]
            new[v] = best
        lab = new
        cnt = [sum(1 for v in verts if lab[v] == i) for i in range(len(seeds))]
    return lab


def test_fluid(setup, tmp_root):
    g, adj, _ = setup
    got = run_fluid(g, os.path.join(tmp_root, "ck-fluid"), s=6, rounds=5)
    seeds = smallest_oids(g, 6)
    want = _fluid_ref(adj, seeds, 5)
    gd = dict(zip(got["oid"].astype(int), got["lab"].astype(int)))
    assert gd == want
    assert len(set(gd.values()) - {-1}) > 1  # actually forms communities


def test_random_multi_bfs(setup, tmp_root):
    g, adj, _ = setup
    got = run_random_multi_bfs(g, os.path.join(tmp_root, "ck-rmb"), k=8)
    srcs = [int(s) for s in smallest_oids(g, 8)]
    # oracle: max BFS distance over reaching sources (undirected graph)
    dist = {v: -1 for v in adj}
    for s in srcs:
        d = {s: 0}
        q = [s]
        while q:
            nq = []
            for u in q:
                for w in adj[u]:
                    if w not in d:
                        d[w] = d[u] + 1
                        nq.append(w)
            q = nq
        for v, dv in d.items():
            dist[v] = max(dist[v], dv)
    gd = dict(zip(got["oid"].astype(int), got["res"].astype(int)))
    assert gd == dist


def test_densest_subgraph(setup, tmp_root):
    import networkx as nx

    g, adj, _ = setup
    got = densest_subgraph_2approx(g, os.path.join(tmp_root, "ck-dsg"))
    G = nx.Graph()
    for u, vs in adj.items():
        for v in vs:
            G.add_edge(u, v)
    core = nx.core_number(G)
    cmax = max(core.values())
    S = {v for v, c in core.items() if c == cmax}
    ne = sum(1 for u in S for w in adj[u] if w in S)  # directed count = 2|E(S)|
    assert got["cmax"] == cmax
    assert got["nv"] == len(S)
    assert got["ne"] == ne
    assert got["density"] == pytest.approx(ne / len(S))
