"""Resident-actor BSP engine: bitwise-identical to the Dataset engine,
interchangeable checkpoints."""

import os

import numpy as np
import pytest
import ray.data as rd

from raylinkgraph.algos import CDLP, WCC, PageRank
from raylinkgraph.bsp import run_bsp
from raylinkgraph.bsp_actors import run_bsp_actors
from raylinkgraph.oracle.reference import random_edges
from raylinkgraph.stages.graph_build import LinkGraph


@pytest.fixture(scope="module")
def graphs(ray_session, tmp_root):
    edges = random_edges(350, 2500, seed=5)
    dg = LinkGraph.build(
        rd.from_pandas(edges), os.path.join(tmp_root, "ba-d"), P=4, symmetrize=False
    )
    ug = LinkGraph.build(
        rd.from_pandas(edges), os.path.join(tmp_root, "ba-u"), P=4, symmetrize=True
    )
    return dg, ug


def _pr(g):
    return PageRank(g.n_vertices, tol=1e-6, max_rounds=60)


def test_actor_engine_matches_dataset_engine(graphs, tmp_root):
    dg, ug = graphs
    a = run_bsp(dg, _pr(dg), os.path.join(tmp_root, "e-ds"), max_rounds=60)
    b = run_bsp_actors(dg, _pr(dg), os.path.join(tmp_root, "e-ac"), max_rounds=60)
    assert a.rounds == b.rounds and a.converged and b.converged
    pa_, pb = a.state_pandas(), b.state_pandas()
    assert np.array_equal(pa_["oid"].to_numpy(), pb["oid"].to_numpy())
    # float sums accumulate in engine-dependent message order -> last-ulp
    # differences; scores compare allclose (north rule: allclose 1e-6 for
    # scores, exact for ids) — here far tighter
    assert np.allclose(pa_["rank"].to_numpy(), pb["rank"].to_numpy(),
                       rtol=1e-12, atol=1e-15)

    wa = run_bsp(ug, WCC(), os.path.join(tmp_root, "w-ds"), max_rounds=10_000)
    wb = run_bsp_actors(ug, WCC(), os.path.join(tmp_root, "w-ac"), max_rounds=10_000)
    assert np.array_equal(
        wa.state_pandas()["comp"].to_numpy(), wb.state_pandas()["comp"].to_numpy()
    )

    ca = run_bsp(ug, CDLP(10), os.path.join(tmp_root, "c-ds"), max_rounds=10)
    cb = run_bsp_actors(ug, CDLP(10), os.path.join(tmp_root, "c-ac"), max_rounds=10)
    assert np.array_equal(
        ca.state_pandas()["label"].to_numpy(), cb.state_pandas()["label"].to_numpy()
    )


def test_cross_engine_resume(graphs, tmp_root):
    """Checkpoints are interchangeable: start on the actor engine, resume
    on the Dataset engine (and vice versa), equal to an unbroken run."""
    dg, _ = graphs
    w = os.path.join(tmp_root, "x-resume")
    run_bsp_actors(dg, _pr(dg), w, max_rounds=3)
    resumed = run_bsp(dg, _pr(dg), w, max_rounds=60)
    full = run_bsp_actors(dg, _pr(dg), os.path.join(tmp_root, "x-full"), max_rounds=60)
    assert resumed.rounds == full.rounds
    assert np.allclose(
        resumed.state_pandas()["rank"].to_numpy(),
        full.state_pandas()["rank"].to_numpy(),
        rtol=1e-12, atol=1e-15,
    )


def test_checkpoint_every_cadence(graphs, tmp_root):
    dg, _ = graphs
    w = os.path.join(tmp_root, "cad")
    res = run_bsp_actors(dg, _pr(dg), w, max_rounds=60, checkpoint_every=5)
    # final state durable even off-cadence; result readable
    df = res.state_pandas()
    assert len(df) == dg.n_vertices
    full = run_bsp_actors(dg, _pr(dg), os.path.join(tmp_root, "cad-full"), max_rounds=60)
    assert np.array_equal(
        df["rank"].to_numpy(), full.state_pandas()["rank"].to_numpy()
    )


def test_worker_count_invariance(graphs, tmp_root):
    """Same results with 1, 2, and 4 workers over the same P partitions:
    ids exactly equal, scores to 1e-12 (sum-order ulps only)."""
    dg, ug = graphs
    outs = []
    for w in (1, 2, 4):
        r = run_bsp_actors(dg, _pr(dg), os.path.join(tmp_root, f"wi-{w}"),
                           max_rounds=60, num_workers=w)
        outs.append(r.state_pandas())
    for other in outs[1:]:
        assert np.allclose(outs[0]["rank"].to_numpy(), other["rank"].to_numpy(),
                           rtol=1e-12, atol=1e-15)
    wc = []
    from raylinkgraph.algos import WCC
    for w in (1, 3):
        r = run_bsp_actors(ug, WCC(), os.path.join(tmp_root, f"wiw-{w}"),
                           max_rounds=10_000, num_workers=w)
        wc.append(r.state_pandas())
    assert np.array_equal(wc[0]["comp"].to_numpy(), wc[1]["comp"].to_numpy())


def test_default_workers_sized_from_available(ray_session):
    """W must come from AVAILABLE CPUs, not the total budget: a stage
    that never released its pool (or Ray's observed post-ray.kill token
    leak) would otherwise make the W-th actor creation infeasible and
    hang run_bsp_actors forever. With hostages holding tokens,
    _default_workers must settle for what is actually free."""
    import ray

    from raylinkgraph.bsp_actors import _default_workers

    budget = int(ray.cluster_resources().get("CPU", 0))
    assert _default_workers(1000, wait_s=0.5) == min(1000, budget)

    @ray.remote(num_cpus=1)
    class Hostage:
        def ping(self):
            return 1

    hostages = [Hostage.remote() for _ in range(2)]
    ray.get([h.ping.remote() for h in hostages])
    try:
        w = _default_workers(1000, wait_s=1.0)
        assert w == budget - 2, (w, budget)
        assert _default_workers(1, wait_s=0.5) == 1
    finally:
        for h in hostages:
            ray.kill(h)
