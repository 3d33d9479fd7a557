"""Core-number decomposition vs networkx.core_number."""

import os

import numpy as np
import pytest
import ray.data as rd

from raylinkgraph.algos.kshell import run_core_number
from raylinkgraph.oracle.reference import random_edges
from raylinkgraph.stages.graph_build import LinkGraph


def test_core_number_exact(ray_session, tmp_root):
    import networkx as nx

    edges = random_edges(150, 1400, seed=42)
    g = LinkGraph.build(
        rd.from_pandas(edges), os.path.join(tmp_root, "g-kshell"), P=4,
        symmetrize=True,
    )
    got = run_core_number(g, os.path.join(tmp_root, "ck-kshell"))
    G = nx.Graph()
    G.add_edges_from(edges[["src_id", "dst_id"]].itertuples(index=False, name=None))
    G.remove_edges_from(nx.selfloop_edges(G))
    want = nx.core_number(G)
    assert len(got) == g.n_vertices
    for oid, c in zip(got["oid"], got["core"]):
        assert c == want[int(oid)], (oid, c, want[int(oid)])
