"""Triangle counting + LCC vs NetworkX oracles (exact / allclose)."""

import os

import numpy as np
import pytest
import ray.data as rd

from raylinkgraph.algos.triangles import lcc_from_triangles, run_triangles
from raylinkgraph.oracle.reference import random_edges, triangles_oracle
from raylinkgraph.stages.graph_build import LinkGraph


@pytest.fixture(scope="module")
def setup(ray_session, tmp_root):
    edges = random_edges(120, 2500, seed=3)  # dense enough for triangles
    g = LinkGraph.build(
        rd.from_pandas(edges),
        os.path.join(tmp_root, "g-tri"),
        P=4,
        symmetrize=True,
    )
    return g, edges


def test_triangles_exact(setup, tmp_root):
    g, edges = setup
    got = (
        run_triangles(g, os.path.join(tmp_root, "tri-work"))
        .to_pandas().sort_values("oid").reset_index(drop=True)
    )
    want = triangles_oracle(edges)
    assert np.array_equal(got["oid"].to_numpy(), want["oid"].to_numpy())
    assert np.array_equal(got["tricnt"].to_numpy(), want["tricnt"].to_numpy())
    assert got["tricnt"].sum() > 0  # the fixture actually has triangles


def test_lcc_matches_networkx(setup, tmp_root):
    import networkx as nx

    g, edges = setup
    tri = run_triangles(g, os.path.join(tmp_root, "tri-work2"))
    got = (
        lcc_from_triangles(tri)
        .to_pandas().sort_values("oid").reset_index(drop=True)
    )
    G = nx.Graph()
    G.add_edges_from(edges[["src_id", "dst_id"]].itertuples(index=False, name=None))
    cc = nx.clustering(G)
    want = (
        got[["oid"]]
        .assign(lcc=[cc.get(int(o), 0.0) for o in got["oid"]])["lcc"]
        .to_numpy()
    )
    assert np.allclose(got["lcc"].to_numpy(), want, atol=1e-12)
