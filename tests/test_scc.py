"""SCC (min-label FW-BW settling) vs networkx.strongly_connected_components."""

import os

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from raylinkgraph.algos.hits import augment_edges_ds
from raylinkgraph.algos.scc import run_scc
from raylinkgraph.oracle.reference import random_edges
from raylinkgraph.stages.graph_build import LinkGraph


@pytest.mark.parametrize("seed,n,m", [(5, 120, 400), (9, 80, 120)])
def test_scc_exact(ray_session, tmp_root, seed, n, m):
    import networkx as nx

    edges = random_edges(n, m, seed=seed)  # directed as generated
    g = LinkGraph.build(
        augment_edges_ds(rd.from_pandas(edges)),
        os.path.join(tmp_root, f"g-scc-{seed}"),
        P=4,
        symmetrize=False,
        weight_col="flag",
        dedup_weight="or",
    )
    got = run_scc(g, os.path.join(tmp_root, f"ck-scc-{seed}"))
    G = nx.DiGraph()
    G.add_edges_from(edges[["src_id", "dst_id"]].itertuples(index=False, name=None))
    G.remove_edges_from(nx.selfloop_edges(G))
    want = {}
    for comp in nx.strongly_connected_components(G):
        m_id = min(comp)
        for v in comp:
            want[v] = m_id
    assert len(got) == g.n_vertices
    for oid, scc in zip(got["oid"], got["scc"]):
        assert scc == want[int(oid)], (oid, scc, want[int(oid)])
