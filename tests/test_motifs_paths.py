"""Rectangle counting, DFS preorder, greedy path sampling, onion layers."""

import collections
import itertools
import os

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from raylinkgraph.algos.dfs import dfs_preorder, sample_paths
from raylinkgraph.algos.kshell import run_core_number
from raylinkgraph.algos.motifs import rectangle_count
from raylinkgraph.oracle.reference import random_edges
from raylinkgraph.stages.graph_build import LinkGraph


@pytest.fixture(scope="module")
def setup(ray_session, tmp_root):
    edges = random_edges(90, 600, seed=47)
    g = LinkGraph.build(
        rd.from_pandas(edges), os.path.join(tmp_root, "g-mot"), P=4,
        symmetrize=True,
    )
    adj = collections.defaultdict(set)
    for u, v in edges[["src_id", "dst_id"]].itertuples(index=False, name=None):
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
    return g, adj


def test_rectangles(setup):
    g, adj = setup
    got = rectangle_count(g)
    verts = sorted(adj)
    total = 0
    for u, w in itertools.combinations(verts, 2):
        cn = len(adj[u] & adj[w])
        total += cn * (cn - 1) // 2
    assert got == total // 2
    assert got > 0


def test_dfs_preorder(setup):
    import networkx as nx

    g, adj = setup
    src = min(adj)
    got = dfs_preorder(g, src)
    G = nx.Graph()
    for u, vs in adj.items():
        for v in vs:
            G.add_edge(u, v)
    want = list(
        nx.dfs_preorder_nodes(
            nx.Graph([(u, v) for u in sorted(adj) for v in sorted(adj[u])]),
            source=src,
        )
    )
    # networkx follows insertion order; ours is smallest-neighbor-first —
    # compare against an explicit sorted-order reference instead
    seen = {src}
    order = [src]
    stack = [src]
    while stack:
        v = stack[-1]
        nxt = next((u for u in sorted(adj[v]) if u not in seen), None)
        if nxt is None:
            stack.pop()
            continue
        seen.add(nxt)
        order.append(nxt)
        stack.append(nxt)
    assert got["oid"].tolist() == order
    assert set(order) == set(nx.node_connected_component(G, src))


def test_sample_paths(setup):
    g, adj = setup
    got = sample_paths(g, 10, 3)
    starts = sorted(adj)[:10]
    for pid_, grp in got.groupby("path_id"):
        seq = grp.sort_values("step")["oid"].tolist()
        assert seq[0] == starts[pid_]
        prev = -1
        for a, b in zip(seq, seq[1:]):
            nbrs = [u for u in sorted(adj[a]) if u != prev]
            assert b == nbrs[0], (a, b, nbrs[:3])
            prev = a


def test_onion_layers(setup, tmp_root):
    g, adj = setup
    df = run_core_number(g, os.path.join(tmp_root, "ck-onion"))
    # sequential replay of the adaptive-threshold peel
    deg = {v: len(adj[v]) for v in adj}
    alive = set(adj)
    layer = {}
    k = 1
    removed_prev = {v for v in alive if deg[v] < 1}
    for v in removed_prev:
        layer[v] = 0
        alive.discard(v)
    r = 1
    while alive:
        if not removed_prev and alive:
            k += 1
        for v in removed_prev:
            for u in adj[v]:
                if u in alive:
                    deg[u] -= 1
        removed = {v for v in alive if deg[v] < k}
        for v in removed:
            layer[v] = r
        alive -= removed
        removed_prev = removed
        r += 1
        assert r < 10_000
    for oid, lay in zip(df["oid"], df["layer"]):
        assert lay == layer[int(oid)], (oid, lay, layer[int(oid)])
