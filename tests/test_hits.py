"""HITS vs the pinned single-process oracle (scipy-free spec)."""

import os

import numpy as np
import pytest
import ray.data as rd

from raylinkgraph.algos.hits import HITS, augment_edges_ds, hits_oracle
from raylinkgraph.bsp import run_bsp
from raylinkgraph.bsp_actors import run_bsp_actors
from raylinkgraph.oracle.reference import random_edges
from raylinkgraph.stages.graph_build import LinkGraph


@pytest.fixture(scope="module")
def setup(ray_session, tmp_root):
    edges = random_edges(250, 2000, seed=13)
    aug = augment_edges_ds(rd.from_pandas(edges))
    g = LinkGraph.build(
        aug, os.path.join(tmp_root, "g-hits"), P=4,
        symmetrize=False, weight_col="flag", dedup_weight="sum",
    )
    return g, edges


def test_hits_matches_oracle(setup, tmp_root):
    g, edges = setup
    algo = HITS(g.n_vertices, max_iter=30)
    res = run_bsp(g, algo, os.path.join(tmp_root, "ck-hits"), max_rounds=60)
    got = algo.finalize(res.state_pandas(), res.scalars)
    want = hits_oracle(edges, g.n_vertices, max_iter=30)
    assert np.array_equal(got["oid"].to_numpy(), want["oid"].to_numpy())
    assert np.allclose(got["a"].to_numpy(), want["a"].to_numpy(), atol=1e-9)
    assert np.allclose(got["h"].to_numpy(), want["h"].to_numpy(), atol=1e-9)


def test_hits_engines_agree(setup, tmp_root):
    g, _ = setup
    algo = HITS(g.n_vertices, max_iter=10)
    a = run_bsp(g, algo, os.path.join(tmp_root, "ck-hits-ds"), max_rounds=20)
    b = run_bsp_actors(g, algo, os.path.join(tmp_root, "ck-hits-ac"), max_rounds=20)
    assert np.allclose(
        a.state_pandas()["a"].to_numpy(), b.state_pandas()["a"].to_numpy(),
        rtol=1e-12, atol=1e-18,
    )
    assert np.allclose(
        a.state_pandas()["h"].to_numpy(), b.state_pandas()["h"].to_numpy(),
        rtol=1e-12, atol=1e-18,
    )
