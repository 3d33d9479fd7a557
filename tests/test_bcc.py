"""Biconnected components / bridges / articulation points vs networkx."""

import collections
import os

import numpy as np
import pytest
import ray.data as rd

from raylinkgraph.algos.bcc import run_bcc
from raylinkgraph.oracle.reference import random_edges
from raylinkgraph.stages.graph_build import LinkGraph


def _nx_graph(edges):
    import networkx as nx

    G = nx.Graph()
    for u, v in edges[["src_id", "dst_id"]].itertuples(index=False, name=None):
        if u != v:
            G.add_edge(int(u), int(v))
    return G


@pytest.mark.parametrize(
    "n,m,seed",
    [
        (60, 90, 7),    # sparse: many bridges/articulations, several comps
        (120, 600, 11),  # denser: large biconnected cores
    ],
)
def test_bcc_vs_networkx(ray_session, tmp_root, n, m, seed):
    import networkx as nx

    edges = random_edges(n, m, seed=seed)
    tag = f"{n}-{m}-{seed}"
    g = LinkGraph.build(
        rd.from_pandas(edges), os.path.join(tmp_root, f"g-bcc{tag}"), P=4,
        symmetrize=True,
    )
    res = run_bcc(g, os.path.join(tmp_root, f"ck-bcc{tag}"))
    G = _nx_graph(edges)

    # ---- edge partition: same grouping of edges into components --------
    want = [frozenset(frozenset((min(u, v), max(u, v)))
                      for u, v in comp_edges)
            for comp_edges in (
                [list(nx.Graph(G.subgraph(c)).edges()) for c in
                 nx.biconnected_components(G)])]
    want_groups = set()
    for comp in nx.biconnected_components(G):
        sub = G.subgraph(comp)
        want_groups.add(frozenset(
            (min(u, v), max(u, v)) for u, v in sub.edges()
        ))
    got_groups = collections.defaultdict(set)
    for a, b, lab in res["edges"][["a", "b", "bcc"]].itertuples(
        index=False, name=None
    ):
        got_groups[int(lab)].add((int(a), int(b)))
    got = set(frozenset(s) for s in got_groups.values())
    assert got == want_groups

    # every edge appears exactly once
    all_edges = set((min(u, v), max(u, v)) for u, v in G.edges())
    assert set(
        (int(a), int(b)) for a, b in res["edges"][["a", "b"]]
        .itertuples(index=False, name=None)
    ) == all_edges
    assert len(res["edges"]) == len(all_edges)

    # ---- bridges --------------------------------------------------------
    want_br = set((min(u, v), max(u, v)) for u, v in nx.bridges(G))
    got_br = set(
        (int(a), int(b)) for a, b in res["bridges"][["a", "b"]]
        .itertuples(index=False, name=None)
    )
    assert got_br == want_br

    # ---- articulation points -------------------------------------------
    want_cp = set(int(v) for v in nx.articulation_points(G))
    got_cp = set(int(v) for v in res["cutpoints"]["oid"])
    assert got_cp == want_cp


def test_bcc_requires_symmetric(ray_session, tmp_root):
    edges = random_edges(30, 60, seed=3)
    g = LinkGraph.build(
        rd.from_pandas(edges), os.path.join(tmp_root, "g-bccdir"), P=2,
        symmetrize=False,
    )
    with pytest.raises(ValueError):
        run_bcc(g, os.path.join(tmp_root, "ck-bccdir"))
