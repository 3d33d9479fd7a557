"""Katz + eigenvector centrality vs NetworkX (pure-python implementations)."""

import os

import numpy as np
import pytest
import ray.data as rd

from raylinkgraph.algos.eigenvector import Eigenvector
from raylinkgraph.algos.katz import Katz
from raylinkgraph.bsp import run_bsp
from raylinkgraph.oracle.reference import random_edges
from raylinkgraph.stages.graph_build import LinkGraph


@pytest.fixture(scope="module")
def setup(ray_session, tmp_root):
    edges = random_edges(200, 1500, seed=31)
    g = LinkGraph.build(
        rd.from_pandas(edges), os.path.join(tmp_root, "g-cent"), P=4,
        symmetrize=False,
    )
    return g, edges


def _nx(edges):
    import networkx as nx

    G = nx.DiGraph()
    G.add_nodes_from(
        np.union1d(edges["src_id"].to_numpy(), edges["dst_id"].to_numpy()).tolist()
    )
    G.add_edges_from(edges[["src_id", "dst_id"]].itertuples(index=False, name=None))
    return G


def test_katz_matches_networkx(setup, tmp_root):
    import networkx as nx

    g, edges = setup
    res = run_bsp(
        g, Katz(alpha=0.05, beta=1.0, tol=1e-6, n_vertices=g.n_vertices),
        os.path.join(tmp_root, "ck-katz"), max_rounds=1000,
    )
    assert res.converged
    df = res.state_pandas()
    norm = np.sqrt(res.scalars["sumsq"])
    got = df["x"].to_numpy() / norm
    want = nx.katz_centrality(_nx(edges), alpha=0.05, beta=1.0, tol=1e-6)
    want_arr = np.array([want[int(o)] for o in df["oid"]])
    assert np.allclose(got, want_arr, atol=1e-6)


def test_eigenvector_matches_networkx(setup, tmp_root):
    import networkx as nx

    g, edges = setup
    res = run_bsp(
        g, Eigenvector(g.n_vertices, tol=1e-6),
        os.path.join(tmp_root, "ck-eig"), max_rounds=1000,
    )
    assert res.converged
    df = res.state_pandas()
    got = df["x_prev"].to_numpy()
    want = nx.eigenvector_centrality(_nx(edges), tol=1e-6, max_iter=1000)
    want_arr = np.array([want[int(o)] for o in df["oid"]])
    assert np.allclose(got, want_arr, atol=1e-6)
