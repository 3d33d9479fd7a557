"""Flat client API (raylinkgraph.api) vs NetworkX on a small graph —
the switch path for users of the reference's `graphscope.<algo>(g)`
surface (python/graphscope/analytical/app/*.py)."""

import os

import networkx as nx
import numpy as np
import pytest
import ray.data as rd

from raylinkgraph import api
from raylinkgraph.oracle.reference import random_edges
from raylinkgraph.stages.graph_build import LinkGraph


@pytest.fixture(scope="module")
def g(ray_session, tmp_root):
    edges = random_edges(120, 900, seed=17)
    return LinkGraph.build(
        rd.from_pandas(edges), os.path.join(tmp_root, "g-api"), P=4,
        symmetrize=True,
    )


@pytest.fixture(scope="module")
def nxg(g):
    import pyarrow.parquet as pq

    G = nx.Graph()
    t = pq.read_table(os.path.join(g.graph_dir, "edges")).to_pandas()
    G.add_edges_from(t[["src_id", "dst_id"]].itertuples(index=False, name=None))
    return G


def test_pagerank_nx(g):
    import pyarrow.parquet as pq

    from raylinkgraph.oracle.reference import pagerank_oracle

    pr = api.pagerank_nx(g, alpha=0.85, max_iter=100, tol=1e-8)
    edges = pq.read_table(os.path.join(g.graph_dir, "edges")).to_pandas()
    want = pagerank_oracle(edges, alpha=0.85, tol=1e-8)
    wmap = dict(zip(want["oid"], want[want.columns[1]]))
    got = dict(zip(pr["oid"], pr["rank"]))
    assert set(got) == set(wmap)
    for k in wmap:
        assert abs(got[k] - wmap[k]) < 1e-6


def test_wcc_and_lpa(g, nxg):
    comp = api.wcc(g)
    by_comp = comp.groupby("comp")["oid"].apply(set)
    nx_comps = {frozenset(c) for c in nx.connected_components(nxg)}
    assert {frozenset(s) for s in by_comp} == nx_comps

    lab = api.cdlp(g, max_round=5)
    assert len(lab) == g.n_vertices and set(lab.columns) == {"oid", "label"}


def test_bfs_and_kcore(g, nxg):
    src = int(min(nxg.nodes))
    d = api.bfs(g, src=src)
    want = nx.single_source_shortest_path_length(nxg, src)
    assert dict(zip(d["oid"], d["dist"])) == want

    kc = api.k_core(g, k=5)
    assert set(kc["oid"]) == set(nx.k_core(nxg, 5).nodes)

    cn = api.core_number(g)
    assert dict(zip(cn["oid"], cn["core"])) == nx.core_number(nxg)


def test_triangles_and_clustering(g, nxg):
    tri = api.triangles(g)
    want = nx.triangles(nxg)
    got = dict(zip(tri["oid"], tri[tri.columns[1]]))
    assert got == want

    cl = api.clustering(g)
    want_cl = nx.clustering(nxg)
    got_cl = dict(zip(cl["oid"], cl[cl.columns[1]]))
    assert all(abs(got_cl[k] - want_cl[k]) < 1e-9 for k in want_cl)


def test_degree_and_assortativity(g, nxg):
    dc = api.degree_centrality(g)
    assert len(dc) == g.n_vertices
    r = api.degree_assortativity_coefficient(g)
    assert abs(r - nx.degree_assortativity_coefficient(nxg)) < 1e-6
