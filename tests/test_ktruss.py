"""k_truss vs networkx.k_truss edge sets on random and structured
graphs (the driver query graph_ktruss is rows-only; this pins it)."""

import networkx as nx
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from raylinkgraph.algos.ktruss import k_truss


def _run(g: nx.Graph, k: int) -> set:
    e = np.array(list(g.edges), np.int64)
    ds = rd.from_pandas(
        pd.DataFrame({"src_id": e[:, 0], "dst_id": e[:, 1]})
    )
    out = k_truss(ds, k)
    return set(zip(out["u"].tolist(), out["v"].tolist()))


def _nx_edges(g: nx.Graph, k: int) -> set:
    t = nx.k_truss(g, k)
    return {(min(a, b), max(a, b)) for a, b in t.edges}


@pytest.mark.parametrize("k", [3, 4, 5])
def test_ktruss_random(ray_session, k):
    g = nx.gnp_random_graph(120, 0.12, seed=7)
    assert _run(g, k) == _nx_edges(g, k)


def test_ktruss_clique_plus_tail(ray_session):
    g = nx.complete_graph(6)  # K6: every edge in 4 triangles
    g.add_edges_from([(5, 10), (10, 11), (11, 5)])  # a 3-truss triangle
    assert _run(g, 4) == _nx_edges(g, 4)
    assert _run(g, 6) == _nx_edges(g, 6)  # K6 survives k=6
    assert _run(g, 7) == set()  # nothing is a 7-truss


def test_ktruss_triangle_free(ray_session):
    g = nx.cycle_graph(10)  # no triangles at all
    assert _run(g, 3) == set()
    # k=2: every edge trivially survives (needs 0 triangles)
    assert _run(g, 2) == _nx_edges(g, 2)
