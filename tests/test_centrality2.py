"""Closeness / harmonic (MSBFS) and betweenness (Brandes) oracles.

Closeness & harmonic vs NetworkX exactly (all-source waves); betweenness
vs a single-process Brandes with the identical sampled-source spec, plus
a full-source run vs NetworkX (unnormalized, undirected => nx value * 2).
"""

import os

import numpy as np
import pytest
import ray.data as rd

from raylinkgraph.algos.brandes import run_betweenness
from raylinkgraph.algos.centrality import run_closeness, smallest_oids
from raylinkgraph.oracle.reference import random_edges
from raylinkgraph.stages.graph_build import LinkGraph


@pytest.fixture(scope="module")
def setup(ray_session, tmp_root):
    edges = random_edges(90, 700, seed=11)
    g = LinkGraph.build(
        rd.from_pandas(edges), os.path.join(tmp_root, "g-cent"), P=4,
        symmetrize=True,
    )
    import networkx as nx

    G = nx.Graph()
    G.add_edges_from(edges[["src_id", "dst_id"]].itertuples(index=False, name=None))
    G.remove_edges_from(nx.selfloop_edges(G))
    return g, G


def test_closeness_harmonic_exact(setup, tmp_root):
    import networkx as nx

    g, G = setup
    got = run_closeness(g, os.path.join(tmp_root, "ck-close"))  # all sources
    # closeness (wf_improved=False): (reached-1)/sum_d over reachable
    want_c = nx.closeness_centrality(G, wf_improved=False)
    want_h = nx.harmonic_centrality(G)
    for _, row in got.iterrows():
        o = int(row["oid"])
        if row["sum_d"] > 0:
            assert abs((row["reached"] - 1) / row["sum_d"] - want_c[o]) < 1e-9, o
        assert abs(row["sum_inv"] - want_h[o]) < 1e-9, o


def _brandes_ref(edges_df, sources):
    """Single-process Brandes (sampled sources, delta summed, s excluded)."""
    import collections

    adj = collections.defaultdict(set)
    for u, v in edges_df[["src_id", "dst_id"]].itertuples(index=False, name=None):
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
    bc = collections.defaultdict(float)
    for s in sources:
        # forward BFS
        dist = {s: 0}
        sigma = collections.defaultdict(float)
        sigma[s] = 1.0
        order = [s]
        frontier = [s]
        d = 0
        while frontier:
            nxt = []
            for v in frontier:
                for w in adj[v]:
                    if w not in dist:
                        dist[w] = d + 1
                        nxt.append(w)
                        order.append(w)
            for v in frontier:
                for w in adj[v]:
                    if dist[w] == d + 1:
                        sigma[w] += sigma[v]
            frontier = nxt
            d += 1
        delta = collections.defaultdict(float)
        for w in reversed(order):
            for v in adj[w]:
                if dist.get(v, -2) == dist[w] - 1:
                    delta[v] += sigma[v] / sigma[w] * (1.0 + delta[w])
            if w != s:
                bc[w] += delta[w]
    return bc


def test_betweenness_sampled(setup, tmp_root):
    g, G = setup
    srcs = [int(s) for s in smallest_oids(g, 8)]
    got = run_betweenness(g, os.path.join(tmp_root, "ck-bc"), srcs)
    import pandas as pd

    edges = pd.DataFrame(
        [(u, v) for u, v in G.edges()], columns=["src_id", "dst_id"]
    )
    want = _brandes_ref(edges, srcs)
    for _, row in got.iterrows():
        assert abs(row["bc"] - want.get(int(row["oid"]), 0.0)) < 1e-9, row["oid"]


def test_betweenness_full_vs_networkx(setup, tmp_root):
    import networkx as nx

    g, G = setup
    srcs = sorted(G.nodes())[:32]  # one full 32-wide wave
    got = run_betweenness(g, os.path.join(tmp_root, "ck-bc-full"), srcs)
    want = _brandes_ref(
        __import__("pandas").DataFrame(
            [(u, v) for u, v in G.edges()], columns=["src_id", "dst_id"]
        ),
        srcs,
    )
    for _, row in got.iterrows():
        assert abs(row["bc"] - want.get(int(row["oid"]), 0.0)) < 1e-9
    # sanity against nx on the full source set when V <= 32 is not given;
    # here just assert nonzero structure
    assert (got["bc"] > 0).any()


def test_betweenness_64_sources_wave_packed(setup, tmp_root):
    """One full 64-wide wave (the wave-packed layout's headline case:
    matrix state columns + one uint64 frontier word — column count does
    not grow with S)."""
    import pandas as pd

    g, G = setup
    srcs = sorted(G.nodes())[:64]
    got = run_betweenness(g, os.path.join(tmp_root, "ck-bc64"), srcs)
    want = _brandes_ref(
        pd.DataFrame([(u, v) for u, v in G.edges()],
                     columns=["src_id", "dst_id"]),
        srcs,
    )
    for _, row in got.iterrows():
        assert abs(row["bc"] - want.get(int(row["oid"]), 0.0)) < 1e-9, row["oid"]


def test_betweenness_64_actor_engine_equal(setup, tmp_root):
    g, G = setup
    srcs = sorted(G.nodes())[:64]
    a = run_betweenness(g, os.path.join(tmp_root, "ck-bc64d"), srcs)
    b = run_betweenness(
        g, os.path.join(tmp_root, "ck-bc64a"), srcs, engine="actors"
    )
    assert (a["oid"].to_numpy() == b["oid"].to_numpy()).all()
    assert np.allclose(a["bc"].to_numpy(), b["bc"].to_numpy(), atol=0, rtol=0)


def test_betweenness_exact_all_sources_vs_networkx(setup, tmp_root):
    """run_betweenness_exact: every vertex a source across ceil(V/64)
    waves (90 vertices -> 2 waves, so the cross-wave sum is exercised);
    on an undirected graph bc = 2x networkx unnormalized betweenness."""
    import networkx as nx

    from raylinkgraph.algos.brandes import run_betweenness_exact

    g, G = setup
    got = run_betweenness_exact(g, os.path.join(tmp_root, "ck-bc-exact"))
    want = nx.betweenness_centrality(G, normalized=False)
    assert len(got) == G.number_of_nodes()
    for _, row in got.iterrows():
        assert abs(row["bc"] - 2.0 * want[int(row["oid"])]) < 1e-9, row["oid"]


def test_edge_betweenness_networkx(setup, tmp_root):
    """All-source edge betweenness = 2 x nx unnormalized (each unordered
    pair counted from both endpoints on an undirected graph)."""
    import networkx as nx

    from raylinkgraph.algos.brandes import run_edge_betweenness

    edges = random_edges(50, 260, seed=23)
    g = LinkGraph.build(
        rd.from_pandas(edges), os.path.join(tmp_root, "g-ebc-small"), P=4,
        symmetrize=True,
    )
    G = nx.Graph()
    G.add_edges_from(edges[["src_id", "dst_id"]].itertuples(index=False, name=None))
    G.remove_edges_from(nx.selfloop_edges(G))
    all_srcs = sorted(G.nodes())
    assert len(all_srcs) <= 64
    got = run_edge_betweenness(g, os.path.join(tmp_root, "ck-ebc"), all_srcs)
    want = nx.edge_betweenness_centrality(G, normalized=False)
    assert len(got) == G.number_of_edges()
    for u, v, ebc in got.itertuples(index=False):
        w = want.get((u, v), want.get((v, u)))
        assert abs(ebc - 2.0 * w) < 1e-9, (u, v)


def test_edge_betweenness_sampled_ref(setup, tmp_root):
    """Sampled-source edge betweenness against a single-process Brandes
    edge accumulation of the same source set."""
    import collections

    from raylinkgraph.algos.brandes import run_edge_betweenness
    from raylinkgraph.algos.centrality import smallest_oids

    g, G = setup
    srcs = [int(s) for s in smallest_oids(g, 8)]
    got = run_edge_betweenness(g, os.path.join(tmp_root, "ck-ebc8"), srcs)

    adj = {v: set(G[v]) for v in G}
    ebc = collections.defaultdict(float)
    for s in srcs:
        dist = {s: 0}
        sigma = collections.defaultdict(float)
        sigma[s] = 1.0
        order = [s]
        frontier = [s]
        d = 0
        while frontier:
            nxt = []
            for v in frontier:
                for w in adj[v]:
                    if w not in dist:
                        dist[w] = d + 1
                        nxt.append(w)
                        order.append(w)
            for v in frontier:
                for w in adj[v]:
                    if dist[w] == d + 1:
                        sigma[w] += sigma[v]
            frontier = nxt
            d += 1
        delta = collections.defaultdict(float)
        for w in reversed(order):
            for v in adj[w]:
                if dist.get(v, -2) == dist[w] - 1:
                    c = sigma[v] / sigma[w] * (1.0 + delta[w])
                    delta[v] += c
                    ebc[(min(v, w), max(v, w))] += c
    for u, v, val in got.itertuples(index=False):
        assert abs(val - ebc.get((u, v), 0.0)) < 1e-9, (u, v)
