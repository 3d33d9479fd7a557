"""Boruvka MSF: weight-sum equals networkx, spanning + acyclic."""

import os

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from raylinkgraph.algos.msf import run_msf
from raylinkgraph.oracle.reference import random_edges
from raylinkgraph.stages.graph_build import LinkGraph


def test_msf(ray_session, tmp_root):
    import networkx as nx

    rng = np.random.Generator(np.random.Philox(key=[61, 0]))
    edges = random_edges(100, 500, seed=61).drop_duplicates(["src_id", "dst_id"])
    edges["weight"] = rng.integers(1, 20, len(edges)).astype(np.float64)
    g = LinkGraph.build(
        rd.from_pandas(edges), os.path.join(tmp_root, "g-msf"), P=4,
        symmetrize=True, weight_col="weight",
    )
    forest = run_msf(g, os.path.join(tmp_root, "ck-msf"))

    G = nx.Graph()
    for u, v, w in edges[["src_id", "dst_id", "weight"]].itertuples(index=False, name=None):
        if u == v:
            continue
        if G.has_edge(u, v):
            G[u][v]["weight"] = min(G[u][v]["weight"], w)  # build dedups MIN
        else:
            G.add_edge(u, v, weight=w)
    msf_nx = nx.minimum_spanning_edges(G, data=True)
    want_w = sum(d["weight"] for _, _, d in msf_nx)
    n_comp = nx.number_connected_components(G)

    # same total weight as any MSF; spanning-forest edge count
    assert abs(forest["w"].sum() - want_w) < 1e-9
    assert len(forest) == G.number_of_nodes() - n_comp
    # forest edges are real edges with correct weights
    for u, v, w in forest.itertuples(index=False, name=None):
        assert G.has_edge(u, v) and abs(G[u][v]["weight"] - w) < 1e-9
    # acyclic: union-find over forest edges never joins a cycle
    parent = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for u, v, _ in forest.itertuples(index=False, name=None):
        ru, rv = find(u), find(v)
        assert ru != rv, (u, v)
        parent[ru] = rv
