"""k-shell / core-number decomposition by iterated k-core peeling.

Reference: kshell (.gs_conf.yaml:162). core(v) = the largest k such that
v survives the k-core; computed by running the KCore superstep for
k = 1, 2, ... until the core empties — each run is an independent,
checkpointed BSP job, so the decomposition inherits resume for free.
Oracle: networkx.core_number.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from raylinkgraph.algos.kcore import KCore
from raylinkgraph.stages.graph_build import LinkGraph


def run_core_number(
    graph: LinkGraph, workdir: str, *, engine: str = "dataset", max_k: int = 10_000
) -> pd.DataFrame:
    """-> (oid, core) for every vertex of a symmetrized graph."""
    if not graph.meta.get("symmetrize"):
        raise ValueError("core decomposition requires a symmetrized graph")
    if engine == "actors":
        from raylinkgraph.bsp_actors import run_bsp_actors as runner
    else:
        from raylinkgraph.bsp import run_bsp as runner

    core: dict[int, int] = {}
    alive_prev: pd.DataFrame | None = None
    k = 1
    while k <= max_k:
        res = runner(graph, KCore(k), os.path.join(workdir, f"k={k}"), max_rounds=10_000)
        df = res.state_pandas()[["oid", "alive"]]
        # vertices dropped between (k-1)-core and k-core have core = k-1
        dead = df.loc[~df["alive"], "oid"].to_numpy(np.int64)
        for o in dead:
            core.setdefault(int(o), k - 1)
        if not df["alive"].any():
            break
        k += 1
    out = pd.DataFrame(
        {"oid": list(core.keys()), "core": list(core.values())}
    ).astype({"oid": np.int64, "core": np.int64})
    return out.sort_values("oid").reset_index(drop=True)
