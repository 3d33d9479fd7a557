"""Checkpoint/resume: a run killed after k supersteps resumes from the
per-superstep Parquet checkpoint and produces byte-identical results to an
uninterrupted run (FIXTURES.md §B4 'Resume' row)."""

import os

import numpy as np
import pytest
import ray.data as rd

from raylinkgraph.algos import PageRank, WCC
from raylinkgraph.bsp import run_bsp
from raylinkgraph.oracle.reference import random_edges
from raylinkgraph.stages.graph_build import LinkGraph
from raylinkgraph.state import checkpoint as ckpt


@pytest.fixture(scope="module")
def graph(ray_session, tmp_root):
    edges = random_edges(300, 2000, seed=11)
    return LinkGraph.build(
        rd.from_pandas(edges), os.path.join(tmp_root, "g-resume"), P=4,
        symmetrize=True,
    )


def _pr(graph):
    return PageRank(graph.n_vertices, alpha=0.85, tol=1e-6, max_rounds=60)


def test_resume_equals_uninterrupted(graph, tmp_root):
    w_full = os.path.join(tmp_root, "ck-full")
    full = run_bsp(graph, _pr(graph), w_full, max_rounds=60)
    assert full.converged

    # "killed" run: stop after 3 supersteps, then resume to convergence
    w_part = os.path.join(tmp_root, "ck-part")
    part = run_bsp(graph, _pr(graph), w_part, max_rounds=3)
    assert part.rounds == 3 and not (part.converged and part.rounds < 3)
    resumed = run_bsp(graph, _pr(graph), w_part, max_rounds=60)
    assert resumed.converged
    assert resumed.rounds == full.rounds

    a = full.state_pandas()
    b = resumed.state_pandas()
    assert np.array_equal(a["oid"].to_numpy(), b["oid"].to_numpy())
    assert np.array_equal(a["rank"].to_numpy(), b["rank"].to_numpy())  # bitwise


def test_lineage_mismatch_restarts(graph, tmp_root):
    w = os.path.join(tmp_root, "ck-mismatch")
    run_bsp(graph, _pr(graph), w, max_rounds=2)
    # different params -> stale checkpoints must not be reused
    res = run_bsp(
        graph,
        PageRank(graph.n_vertices, alpha=0.5, tol=1e-6, max_rounds=60),
        w,
        max_rounds=4,
    )
    lin = ckpt.read_lineage(w, res.final_step)
    assert lin["params"]["alpha"] == 0.5
    assert res.rounds == 4


def test_partial_step_ignored(graph, tmp_root):
    """A step dir missing its lineage (crash mid-checkpoint) is not used."""
    w = os.path.join(tmp_root, "ck-partial")
    run_bsp(graph, WCC(), w, max_rounds=2)
    # simulate crash: remove the lineage of the newest step
    os.remove(os.path.join(ckpt.step_dir(w, 2), "_lineage.json"))
    found = ckpt.latest_complete_step(w, "wcc", WCC().params(), graph.digest(), graph.P)
    assert found is not None and found[0] == 1
    res = run_bsp(graph, WCC(), w, max_rounds=10_000)
    assert res.converged
