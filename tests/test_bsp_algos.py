"""BSP algorithms vs single-process oracles (FIXTURES.md §B4 comparisons:
allclose 1e-6 for scores, exact equality for component/label ids)."""

import os

import numpy as np
import pytest
import ray.data as rd

from raylinkgraph.algos import CDLP, WCC, PageRank
from raylinkgraph.bsp import run_bsp
from raylinkgraph.oracle.reference import (
    cdlp_oracle,
    pagerank_oracle,
    random_edges,
    wcc_oracle,
)
from raylinkgraph.stages.graph_build import LinkGraph


@pytest.fixture(scope="module")
def edges_df():
    return random_edges(400, 3000, seed=7)


@pytest.fixture(scope="module")
def digraph(ray_session, tmp_root, edges_df):
    gdir = os.path.join(tmp_root, "g-directed")
    return LinkGraph.build(
        rd.from_pandas(edges_df), gdir, P=8, symmetrize=False,
        max_edges_per_block=500,  # small: force super-node block splitting
    )


@pytest.fixture(scope="module")
def ugraph(ray_session, tmp_root, edges_df):
    gdir = os.path.join(tmp_root, "g-undirected")
    return LinkGraph.build(
        rd.from_pandas(edges_df), gdir, P=8, symmetrize=True,
        max_edges_per_block=500,
    )


def test_graph_build_counts(digraph, edges_df):
    n_vertices = len(
        np.union1d(edges_df["src_id"].to_numpy(), edges_df["dst_id"].to_numpy())
    )
    assert digraph.n_vertices == n_vertices
    assert digraph.n_edges == len(edges_df)  # already deduped, no self loops
    got = (
        digraph.edges_ds()
        .to_pandas()
        .sort_values(["src_id", "dst_id"])
        .reset_index(drop=True)
    )
    want = edges_df.sort_values(["src_id", "dst_id"]).reset_index(drop=True)
    assert got.equals(want)


def test_pagerank_matches_networkx(digraph, edges_df, tmp_root):
    res = run_bsp(
        digraph,
        PageRank(digraph.n_vertices, alpha=0.85, tol=1e-6, max_rounds=100),
        os.path.join(tmp_root, "ck-pr"),
    )
    assert res.converged
    got = res.state_pandas()
    want = pagerank_oracle(edges_df, alpha=0.85, tol=1e-6, max_iter=100)
    assert np.array_equal(got["oid"].to_numpy(), want["oid"].to_numpy())
    assert np.allclose(got["rank"].to_numpy(), want["rank"].to_numpy(), atol=1e-6)
    # ranks are a probability distribution
    assert abs(got["rank"].sum() - 1.0) < 1e-9


def test_wcc_exact(ugraph, edges_df, tmp_root):
    res = run_bsp(ugraph, WCC(), os.path.join(tmp_root, "ck-wcc"))
    assert res.converged
    got = res.state_pandas()
    want = wcc_oracle(edges_df)
    assert np.array_equal(got["oid"].to_numpy(), want["oid"].to_numpy())
    assert np.array_equal(got["comp"].to_numpy(), want["comp"].to_numpy())


def test_cdlp_exact(ugraph, edges_df, tmp_root):
    res = run_bsp(ugraph, CDLP(max_rounds=10), os.path.join(tmp_root, "ck-cdlp"))
    got = res.state_pandas()
    want = cdlp_oracle(edges_df, max_rounds=10)
    assert np.array_equal(got["oid"].to_numpy(), want["oid"].to_numpy())
    assert np.array_equal(got["label"].to_numpy(), want["label"].to_numpy())
