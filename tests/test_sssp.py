"""Weighted SSSP vs NetworkX Dijkstra on a random weighted graph."""

import os

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from raylinkgraph.algos.sssp import SSSP
from raylinkgraph.bsp import run_bsp
from raylinkgraph.bsp_actors import run_bsp_actors
from raylinkgraph.stages.graph_build import LinkGraph


@pytest.fixture(scope="module")
def setup(ray_session, tmp_root):
    rng = np.random.Generator(np.random.Philox(key=[77, 0]))
    n = 300
    src = rng.integers(0, n, 2500)
    dst = rng.integers(0, n, 2500)
    w = rng.integers(1, 20, 2500).astype(np.float64)
    df = pd.DataFrame({"src_id": src, "dst_id": dst, "weight": w})
    df = df[df.src_id != df.dst_id].drop_duplicates(["src_id", "dst_id"])
    g = LinkGraph.build(
        rd.from_pandas(df), os.path.join(tmp_root, "g-sssp"), P=4,
        symmetrize=False, weight_col="weight",
    )
    return g, df


def test_sssp_matches_dijkstra(setup, tmp_root):
    import networkx as nx

    g, df = setup
    source = int(df["src_id"].iloc[0])
    res = run_bsp(g, SSSP(source), os.path.join(tmp_root, "ck-sssp"))
    assert res.converged
    got = res.state_pandas()
    G = nx.DiGraph()
    for s, d, w in df.itertuples(index=False):
        G.add_edge(int(s), int(d), weight=float(w))
    want = nx.single_source_dijkstra_path_length(G, source)
    for oid, dist in zip(got["oid"], got["dist"]):
        if int(oid) in want:
            assert dist == want[int(oid)]
        else:
            assert np.isinf(dist)


def test_sssp_engines_agree(setup, tmp_root):
    g, df = setup
    source = int(df["src_id"].iloc[0])
    a = run_bsp(g, SSSP(source), os.path.join(tmp_root, "ck-sssp-ds"))
    b = run_bsp_actors(g, SSSP(source), os.path.join(tmp_root, "ck-sssp-ac"))
    assert np.array_equal(
        a.state_pandas()["dist"].to_numpy(), b.state_pandas()["dist"].to_numpy()
    )
