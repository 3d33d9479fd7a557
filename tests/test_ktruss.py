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


def test_scan_similarity_brute_force(ray_session):
    import networkx as nx
    import ray.data as rd

    from raylinkgraph.algos.ktruss import scan_similarity

    g = nx.gnm_random_graph(40, 120, seed=7)
    e = pd.DataFrame(
        {"src_id": [u for u, v in g.edges()], "dst_id": [v for u, v in g.edges()]}
    ).astype(np.int64)
    for blocks in (1, 5):
        out = scan_similarity(rd.from_pandas(e).repartition(blocks))
        assert len(out) == g.number_of_edges()
        for u, v, s6 in out.itertuples(index=False):
            gu = set(g[u]) | {u}
            gv = set(g[v]) | {v}
            sigma = len(gu & gv) / np.sqrt(float(len(gu) * len(gv)))
            assert s6 == int(np.floor(sigma * 1e6 + 0.5)), (u, v)


def test_rich_club_networkx(ray_session):
    import networkx as nx
    import ray.data as rd

    from raylinkgraph.algos.ktruss import rich_club

    g = nx.gnm_random_graph(60, 300, seed=3)
    e = pd.DataFrame(
        {"src_id": [u for u, v in g.edges()], "dst_id": [v for u, v in g.edges()]}
    ).astype(np.int64)
    out = rich_club(rd.from_pandas(e).repartition(4)).set_index("k")
    want = nx.rich_club_coefficient(g, normalized=False)
    for k, phi in want.items():
        if k in out.index:
            assert out.loc[k, "phi_e6"] == int(np.floor(phi * 1e6 + 0.5)), k
    # every k with >= 2 qualifying nodes must be present
    degs = np.array([d for _, d in g.degree()])
    for k in range(degs.max()):
        assert (k in out.index) == ((degs > k).sum() >= 2)
