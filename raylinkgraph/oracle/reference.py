"""Single-process oracles (FIXTURES.md §B4) — NetworkX + pure Python.

These mirror the reference's test strategy (SURVEY.md §5): NetworkX is the
semantic oracle (the reference's builtin apps deliberately mirror NetworkX,
apps/pagerank/pagerank_networkx.h:26-27), plus a 20-line reference CDLP
with the flash/lpa.h:54-67 min-tie-break. All take a deduped, self-loop-
free edge list of int64 (src, dst) pairs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _digraph(edges: pd.DataFrame):
    import networkx as nx

    g = nx.DiGraph()
    g.add_nodes_from(
        np.union1d(edges["src_id"].to_numpy(), edges["dst_id"].to_numpy()).tolist()
    )
    g.add_edges_from(edges[["src_id", "dst_id"]].itertuples(index=False, name=None))
    return g


def _graph(edges: pd.DataFrame):
    import networkx as nx

    g = nx.Graph()
    g.add_nodes_from(
        np.union1d(edges["src_id"].to_numpy(), edges["dst_id"].to_numpy()).tolist()
    )
    g.add_edges_from(edges[["src_id", "dst_id"]].itertuples(index=False, name=None))
    return g


def pagerank_oracle(
    edges: pd.DataFrame, alpha=0.85, tol=1e-6, max_iter=100, directed=True
) -> pd.DataFrame:
    """Pure-numpy power iteration with exact NetworkX / pagerank_networkx.h
    semantics: init 1/N; rank' = alpha*(in-sum + dangling/N) + (1-alpha)/N;
    stop when L1 change < N*tol (scipy-free — networkx.pagerank needs scipy)."""
    src = edges["src_id"].to_numpy(np.int64)
    dst = edges["dst_id"].to_numpy(np.int64)
    if not directed:
        src, dst = np.concatenate([src, dst]), np.concatenate([dst, src])
        pairs = np.unique(np.stack([src, dst], axis=1), axis=0)
        src, dst = pairs[:, 0], pairs[:, 1]
    oids = np.union1d(np.unique(src), np.unique(dst))
    n = len(oids)
    si = np.searchsorted(oids, src)
    di = np.searchsorted(oids, dst)
    deg = np.bincount(si, minlength=n).astype(np.float64)
    dangling_mask = deg == 0
    x = np.full(n, 1.0 / n)
    for _ in range(max_iter):
        xlast = x
        dangling = xlast[dangling_mask].sum()
        contrib = xlast[si] / deg[si]
        agg = np.bincount(di, weights=contrib, minlength=n)
        x = alpha * (agg + dangling / n) + (1.0 - alpha) / n
        if np.abs(x - xlast).sum() < n * tol:
            break
    return pd.DataFrame({"oid": oids, "rank": x})


def wcc_oracle(edges: pd.DataFrame) -> pd.DataFrame:
    import networkx as nx

    g = _graph(edges)
    rows = []
    for comp in nx.connected_components(g):
        cid = min(comp)
        rows.extend((v, cid) for v in comp)
    return (
        pd.DataFrame(rows, columns=["oid", "comp"])
        .sort_values("oid")
        .reset_index(drop=True)
    )


def cdlp_oracle(edges: pd.DataFrame, max_rounds: int = 10) -> pd.DataFrame:
    """Reference CDLP: synchronous rounds; most frequent neighbor label,
    smallest label on ties (flash/clustering/lpa.h:54-67)."""
    src = edges["src_id"].to_numpy(np.int64)
    dst = edges["dst_id"].to_numpy(np.int64)
    # symmetrize + dedup
    a = np.concatenate([src, dst])
    b = np.concatenate([dst, src])
    pairs = np.unique(np.stack([a, b], axis=1), axis=0)
    a, b = pairs[:, 0], pairs[:, 1]
    oids = np.unique(a)
    oids = np.union1d(oids, np.unique(b))
    label = {int(v): int(v) for v in oids}
    neigh: dict[int, list[int]] = {int(v): [] for v in oids}
    for s, d in zip(a, b):
        neigh[int(d)].append(int(s))
    for _ in range(max_rounds):
        new = {}
        changed = False
        for v in label:
            ns = neigh[v]
            if not ns:
                new[v] = label[v]
                continue
            counts: dict[int, int] = {}
            for u in ns:
                lu = label[u]
                counts[lu] = counts.get(lu, 0) + 1
            best_label, best_cnt = None, -1
            for l in sorted(counts):
                if counts[l] > best_cnt:
                    best_label, best_cnt = l, counts[l]
            new[v] = best_label
            changed |= best_label != label[v]
        label = new
        if not changed:
            break
    return (
        pd.DataFrame({"oid": list(label.keys()), "label": list(label.values())})
        .sort_values("oid")
        .reset_index(drop=True)
    )


def triangles_oracle(edges: pd.DataFrame) -> pd.DataFrame:
    import networkx as nx

    g = _graph(edges)
    tri = nx.triangles(g)
    return (
        pd.DataFrame({"oid": list(tri.keys()), "tricnt": list(tri.values())})
        .sort_values("oid")
        .reset_index(drop=True)
    )


def random_edges(n_vertices: int, n_edges: int, seed: int = 7) -> pd.DataFrame:
    """Small deterministic random edge table for unit tests (skewed dst)."""
    rng = np.random.Generator(np.random.Philox(key=[seed, 0]))
    src = rng.integers(0, n_vertices, n_edges)
    dst = (n_vertices * rng.random(n_edges) ** 2).astype(np.int64)
    keep = src != dst
    df = pd.DataFrame({"src_id": src[keep] * 13, "dst_id": dst[keep] * 13})
    return df.drop_duplicates().reset_index(drop=True)
