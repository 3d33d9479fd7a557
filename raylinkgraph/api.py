"""Flat algorithm API mirroring the reference's Python client surface.

The reference exposes `graphscope.pagerank_nx(g, alpha, max_iter, tol)`,
`graphscope.wcc(g)`, `graphscope.lpa(g, max_round)`, ... as flat
functions over a loaded graph that return a queryable context
(`python/graphscope/analytical/app/*.py`). This module is the switch
path for those users: the same flat names and parameter shapes over a
built `LinkGraph`, returning a pandas DataFrame (the
`context.to_dataframe()` equivalent — column `oid` plus the per-vertex
result columns). Each call runs the corresponding distributed
Ray-Data/BSP implementation in `raylinkgraph.algos`; nothing here calls
`ray.init`.

Example::

    from raylinkgraph.stages.graph_build import LinkGraph
    from raylinkgraph import api

    g = LinkGraph.build(edge_dataset, "/data/mygraph", P=64)
    pr = api.pagerank_nx(g, alpha=0.85, max_iter=100, tol=1e-6)
    comp = api.wcc(api.to_undirected(g, "/data/mygraph-und"))
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from raylinkgraph.stages.graph_build import LinkGraph


def _workdir(graph: LinkGraph, name: str) -> str:
    d = os.path.join(graph.graph_dir, "apps", name)
    os.makedirs(d, exist_ok=True)
    return d


def _run(graph, superstep, name: str, *, engine: str = "actors", **kw):
    if engine == "actors":
        from raylinkgraph.bsp_actors import run_bsp_actors as runner
    else:
        from raylinkgraph.bsp import run_bsp as runner
    return runner(graph, superstep, _workdir(graph, name), **kw)


def to_undirected(graph: LinkGraph, out_dir: str) -> LinkGraph:
    """dag_utils.py to_undirected: symmetrized copy."""
    from raylinkgraph.pipelines.linkgraph import undirected_view

    return undirected_view(graph, out_dir)


# ---- ranking ---------------------------------------------------------------

def pagerank_nx(graph, alpha: float = 0.85, max_iter: int = 100,
                tol: float = 1e-06) -> pd.DataFrame:
    """apps/pagerank/pagerank_networkx.h semantics (dangling
    redistribution, L1 < tol * N stop)."""
    from raylinkgraph.algos import PageRank

    res = _run(
        graph,
        PageRank(graph.n_vertices, alpha=alpha, tol=tol, max_rounds=max_iter),
        "pagerank_nx", max_rounds=max_iter,
    )
    return res.state_pandas()[["oid", "rank"]]


def pagerank(graph, delta: float = 0.85, max_round: int = 10) -> pd.DataFrame:
    """The reference's fixed-round variant (yaml:2) maps onto the same
    superstep with tol=0."""
    from raylinkgraph.algos import PageRank

    res = _run(
        graph,
        PageRank(graph.n_vertices, alpha=delta, tol=0.0, max_rounds=max_round),
        "pagerank", max_rounds=max_round,
    )
    return res.state_pandas()[["oid", "rank"]]


def hits(graph, tolerance: float = 0.01, max_round: int = 100,
         normalized: bool = True) -> pd.DataFrame:
    """hits (yaml:123): returns (oid, auth, hub). The augmented
    direction-flagged graph builds once next to ``graph``."""
    from raylinkgraph.algos.hits import HITS, augment_edges_ds
    from raylinkgraph.bsp import run_bsp

    aug_dir = graph.graph_dir.rstrip("/") + "-hitsaug"
    if os.path.exists(os.path.join(aug_dir, "meta.json")):
        g = LinkGraph(aug_dir)
    else:
        g = LinkGraph.build(
            augment_edges_ds(graph.edges_ds()), aug_dir, P=graph.P,
            symmetrize=False, weight_col="flag", dedup_weight="sum",
        )
    algo = HITS(g.n_vertices, max_iter=max_round)
    res = run_bsp(g, algo, _workdir(graph, "hits"), max_rounds=2 * max_round)
    out = algo.finalize(res.state_pandas(), res.scalars)
    df = out[["oid", "a", "h"]].rename(columns={"a": "auth", "h": "hub"})
    if not normalized:
        return df
    for c in ("auth", "hub"):
        s = df[c].sum()
        if s > 0:
            df[c] = df[c] / s
    return df


def eigenvector_centrality(graph, tolerance: float = 1e-06,
                           max_round: int = 100) -> pd.DataFrame:
    from raylinkgraph.algos.eigenvector import Eigenvector

    res = _run(
        graph, Eigenvector(graph.n_vertices, tol=tolerance, max_rounds=max_round),
        "eigenvector", engine="dataset", max_rounds=max_round,
    )
    df = res.state_pandas()
    x = df["y"].to_numpy() / np.sqrt(max(res.scalars["sumsq"], 1e-300))
    return pd.DataFrame({"oid": df["oid"], "eigenvector": x})


def katz_centrality(graph, alpha: float = 0.1, beta: float = 1.0,
                    tolerance: float = 1e-06, max_round: int = 1000
                    ) -> pd.DataFrame:
    from raylinkgraph.algos.katz import Katz

    res = _run(
        graph,
        Katz(alpha=alpha, beta=beta, tol=tolerance, max_rounds=max_round,
             n_vertices=graph.n_vertices),
        "katz", engine="dataset", max_rounds=max_round,
    )
    df = res.state_pandas()
    x = df["x"].to_numpy() / np.sqrt(max(res.scalars["sumsq"], 1e-300))
    return pd.DataFrame({"oid": df["oid"], "katz": x})


def degree_centrality(graph) -> pd.DataFrame:
    from raylinkgraph.pipelines import graph_ops

    return graph_ops.degree_centrality(graph).to_pandas()


def voterank(graph, num_of_nodes: int = 0) -> pd.DataFrame:
    from raylinkgraph.algos.voterank import run_voterank

    n = num_of_nodes or 5
    return run_voterank(graph, _workdir(graph, "voterank"), n_seeds=n)


# ---- traversal -------------------------------------------------------------

def bfs(graph, src: int = 0, depth_limit: int | None = None) -> pd.DataFrame:
    from raylinkgraph.algos.bfs import BFS, UNREACHED

    res = _run(graph, BFS(src, depth_limit=depth_limit), "bfs")
    df = res.state_pandas()
    return df[df["dist"] != UNREACHED][["oid", "dist"]].reset_index(drop=True)


def sssp(graph, src: int = 0) -> pd.DataFrame:
    from raylinkgraph.algos.sssp import SSSP

    res = _run(graph, SSSP(src), "sssp")
    df = res.state_pandas()
    return df[np.isfinite(df["dist"])][["oid", "dist"]].reset_index(drop=True)


# ---- connectivity / community ---------------------------------------------

def wcc(graph) -> pd.DataFrame:
    from raylinkgraph.algos import WCC

    res = _run(graph, WCC(), "wcc")
    return res.state_pandas()[["oid", "comp"]]


def scc(graph) -> pd.DataFrame:
    from raylinkgraph.algos.scc import run_scc

    return run_scc(graph, _workdir(graph, "scc"), engine="actors")


def lpa(graph, max_round: int = 10) -> pd.DataFrame:
    from raylinkgraph.algos import CDLP

    res = _run(graph, CDLP(max_rounds=max_round), "lpa", max_rounds=max_round)
    return res.state_pandas()[["oid", "label"]]


cdlp = lpa  # the reference aliases cdlp = lpa (analytical/app/lpa.py)


def louvain(graph, min_progress: int = 1000, progress_tries: int = 1
            ) -> pd.DataFrame:
    from raylinkgraph.algos.louvain import run_louvain

    return run_louvain(graph, _workdir(graph, "louvain"))


# ---- clustering / motifs ---------------------------------------------------

def triangles(graph) -> pd.DataFrame:
    from raylinkgraph.algos.triangles import run_triangles

    return (
        run_triangles(graph, _workdir(graph, "triangles"))
        .to_pandas().sort_values("oid").reset_index(drop=True)
    )


def clustering(graph) -> pd.DataFrame:
    from raylinkgraph.algos.triangles import lcc_from_triangles, run_triangles

    tri = run_triangles(graph, _workdir(graph, "triangles"))
    return (
        lcc_from_triangles(tri).to_pandas()
        .sort_values("oid").reset_index(drop=True)
    )


avg_clustering = clustering  # average = clustering()["lcc"].mean()


# ---- cores -----------------------------------------------------------------

def k_core(graph, k: int = 3) -> pd.DataFrame:
    from raylinkgraph.algos.kcore import KCore

    res = _run(graph, KCore(k), "kcore")
    df = res.state_pandas()
    return df[df["alive"]][["oid"]].reset_index(drop=True)


def k_shell(graph) -> pd.DataFrame:
    """core numbers (kshell, yaml:162): (oid, core)."""
    from raylinkgraph.algos.kshell import run_core_number

    return run_core_number(graph, _workdir(graph, "corenum"))


core_number = k_shell


# ---- centrality over distances ---------------------------------------------

def closeness_centrality(graph, sources: np.ndarray | None = None
                         ) -> pd.DataFrame:
    from raylinkgraph.algos.centrality import run_closeness

    df = run_closeness(graph, _workdir(graph, "closeness"), sources=sources)
    out = df[df["sum_d"] > 0].copy()
    out["closeness"] = out["reached"] / out["sum_d"]
    return out[["oid", "closeness"]].reset_index(drop=True)


def betweenness_centrality(graph, sources: np.ndarray | None = None
                           ) -> pd.DataFrame:
    from raylinkgraph.algos.brandes import run_betweenness

    if sources is None:
        sources = np.arange(min(graph.n_vertices, 64))
    return run_betweenness(graph, _workdir(graph, "betweenness"), sources)


# ---- assortativity / boundary ----------------------------------------------

def degree_assortativity_coefficient(graph) -> float:
    from raylinkgraph.pipelines import graph_ops

    return graph_ops.degree_assortativity(graph)


def node_boundary(graph, vertices) -> pd.DataFrame:
    from raylinkgraph.pipelines import graph_ops

    return graph_ops.node_boundary(graph, vertices).to_pandas()


def edge_boundary(graph, vertices) -> pd.DataFrame:
    from raylinkgraph.pipelines import graph_ops

    return graph_ops.edge_boundary(graph, vertices).to_pandas()
