"""BFS, k-core, and graph report ops vs NetworkX / direct oracles."""

import os

import numpy as np
import pytest
import ray.data as rd

from raylinkgraph.algos.bfs import BFS, UNREACHED
from raylinkgraph.algos.kcore import KCore
from raylinkgraph.bsp import run_bsp
from raylinkgraph.oracle.reference import random_edges
from raylinkgraph.pipelines import graph_ops
from raylinkgraph.stages.graph_build import LinkGraph


@pytest.fixture(scope="module")
def setup(ray_session, tmp_root):
    edges = random_edges(250, 1800, seed=21)
    dg = LinkGraph.build(
        rd.from_pandas(edges), os.path.join(tmp_root, "ma-d"), P=4, symmetrize=False
    )
    ug = LinkGraph.build(
        rd.from_pandas(edges), os.path.join(tmp_root, "ma-u"), P=4, symmetrize=True
    )
    return dg, ug, edges


def _nx_digraph(edges):
    import networkx as nx

    g = nx.DiGraph()
    g.add_nodes_from(
        np.union1d(edges["src_id"].to_numpy(), edges["dst_id"].to_numpy()).tolist()
    )
    g.add_edges_from(edges[["src_id", "dst_id"]].itertuples(index=False, name=None))
    return g


def test_bfs_directed(setup, tmp_root):
    import networkx as nx

    dg, _, edges = setup
    source = int(edges["src_id"].iloc[0])
    res = run_bsp(dg, BFS(source), os.path.join(tmp_root, "ck-bfs"))
    assert res.converged
    got = res.state_pandas()
    want = nx.single_source_shortest_path_length(_nx_digraph(edges), source)
    for oid, dist in zip(got["oid"], got["dist"]):
        if int(oid) in want:
            assert dist == want[int(oid)]
        else:
            assert dist == UNREACHED


def test_kcore(setup, tmp_root):
    import networkx as nx

    _, ug, edges = setup
    k = 4
    res = run_bsp(ug, KCore(k), os.path.join(tmp_root, "ck-kcore"))
    assert res.converged
    got = res.state_pandas()
    G = nx.Graph()
    G.add_edges_from(edges[["src_id", "dst_id"]].itertuples(index=False, name=None))
    G.remove_edges_from(nx.selfloop_edges(G))
    core = set(nx.k_core(G, k).nodes())
    got_core = set(got.loc[got["alive"], "oid"].astype(int))
    assert got_core == core


def test_report_ops(setup, tmp_root):
    dg, _, edges = setup
    assert graph_ops.node_num(dg) == len(
        np.union1d(edges["src_id"].to_numpy(), edges["dst_id"].to_numpy())
    )
    assert graph_ops.edge_num(dg) == len(edges)
    some = int(edges["src_id"].iloc[5])
    assert graph_ops.has_node(dg, some)
    assert not graph_ops.has_node(dg, 10**15)
    succ = set(graph_ops.successors(dg, some))
    want = set(edges.loc[edges["src_id"] == some, "dst_id"].astype(int))
    assert succ == want
    ind = graph_ops.in_degrees(dg).to_pandas().set_index("oid")["in_deg"]
    want_in = edges.groupby("dst_id").size()
    for oid, d in want_in.items():
        assert ind[oid] == d
    assert int(ind.sum()) == len(edges)


def test_degree_centrality_and_add_column(setup):
    dg, _, edges = setup
    n = dg.n_vertices
    dc = graph_ops.degree_centrality(dg).to_pandas().set_index("oid")["centrality"]
    outd = edges.groupby("src_id").size()
    for oid, d in outd.items():
        assert abs(dc[oid] - d / (n - 1)) < 1e-12
    verts = graph_ops.vertices_ds(dg)
    joined = graph_ops.add_column(verts, graph_ops.degree_centrality(dg)).to_pandas()
    assert "centrality" in joined.columns and len(joined) == n
