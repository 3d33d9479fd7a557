"""Diamond / 3-path / 4-clique counts vs brute-force oracles."""

import collections
import itertools
import os

import pytest
import ray.data as rd

from raylinkgraph.algos.motifs import (
    diamond_count,
    k_clique4_count,
    three_path_count,
)
from raylinkgraph.oracle.reference import random_edges
from raylinkgraph.stages.graph_build import LinkGraph


@pytest.fixture(scope="module")
def setup(ray_session, tmp_root):
    edges = random_edges(70, 500, seed=13)
    g = LinkGraph.build(
        rd.from_pandas(edges), os.path.join(tmp_root, "g-mot2"), P=4,
        symmetrize=True,
    )
    adj = collections.defaultdict(set)
    for u, v in edges[["src_id", "dst_id"]].itertuples(index=False, name=None):
        if u != v:
            adj[int(u)].add(int(v))
            adj[int(v)].add(int(u))
    return g, adj


def test_diamond(setup, tmp_root):
    g, adj = setup
    got = diamond_count(g, os.path.join(tmp_root, "ck-dia"))
    # oracle: per undirected edge, C(#common neighbors, 2)
    want = 0
    seen = set()
    for u in adj:
        for v in adj[u]:
            e = (min(u, v), max(u, v))
            if e in seen:
                continue
            seen.add(e)
            t = len(adj[u] & adj[v])
            want += t * (t - 1) // 2
    assert got == want
    assert got > 0


def test_three_path(setup, tmp_root):
    g, adj = setup
    got = three_path_count(g, os.path.join(tmp_root, "ck-3p"))
    # oracle (flash_3_path semantics via the same identity, computed
    # independently): number of paths a-b-c-d with distinct edges where
    # the middle edge (b, c) is counted once per unordered path:
    # sum over edges (b,c) of (deg(b)-1)(deg(c)-1) - triangles_through(b,c)
    deg = {v: len(adj[v]) for v in adj}
    want = 0
    seen = set()
    for u in adj:
        for v in adj[u]:
            e = (min(u, v), max(u, v))
            if e in seen:
                continue
            seen.add(e)
            want += (deg[u] - 1) * (deg[v] - 1) - len(adj[u] & adj[v])
    assert got == want


def test_k_clique4(setup, tmp_root):
    g, adj = setup
    got = k_clique4_count(g, os.path.join(tmp_root, "ck-k4"))
    verts = sorted(adj)
    want = 0
    for a, b in itertools.combinations(verts, 2):
        if b not in adj[a]:
            continue
        common = sorted(adj[a] & adj[b])
        for c, d in itertools.combinations(common, 2):
            if d in adj[c]:
                want += 1
    # the oracle hits each 4-clique once per unordered pair {a,b} of its
    # C(4,2) = 6 edges
    assert want % 6 == 0
    assert got == want // 6
    assert got > 0
