"""Louvain vs a single-process reference of the identical pinned spec,
plus a modularity-improvement sanity check."""

import os

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from raylinkgraph.algos.louvain import modularity, run_louvain
from raylinkgraph.oracle.reference import random_edges
from raylinkgraph.stages.graph_build import LinkGraph


def _louvain_ref(edges: pd.DataFrame, rounds: int, levels: int):
    """Same spec, sequential: synchronous moves, (score, -C) argmax."""

    def one_level(src, dst, w):
        m2 = w.sum()
        verts = np.unique(src)
        deg = {v: 0.0 for v in verts}
        for s, wt in zip(src, w):
            deg[s] += wt
        comm = {v: v for v in verts}
        for r in range(rounds):
            down = r % 2 == 0
            a = {}
            for v in verts:
                a[comm[v]] = a.get(comm[v], 0.0) + deg[v]
            wvc = {v: {} for v in verts}
            for s, d, wt in zip(src, dst, w):
                if s == d:  # self-loops are community-invariant
                    continue
                c = comm[d]
                wvc[s][c] = wvc[s].get(c, 0.0) + wt
            new = {}
            for v in verts:
                cands = dict(wvc[v])
                cands.setdefault(comm[v], 0.0)
                best, best_key = None, None
                for c in sorted(cands):
                    if c != comm[v] and ((c > comm[v]) if down else (c < comm[v])):
                        continue
                    ac = a.get(c, 0.0) - (deg[v] if c == comm[v] else 0.0)
                    score = cands[c] - deg[v] * ac / m2
                    key = (score, -c)
                    if best_key is None or key > best_key:
                        best, best_key = c, key
                new[v] = best
            comm = new
        return comm

    src = edges["src"].to_numpy(np.int64)
    dst = edges["dst"].to_numpy(np.int64)
    w = edges["w"].to_numpy(np.float64)
    mapping = one_level(src, dst, w)
    final = dict(mapping)
    for _ in range(1, levels):
        agg = {}
        for s, d, wt in zip(src, dst, w):
            k = (mapping[s], mapping[d])
            agg[k] = agg.get(k, 0.0) + wt
        src = np.array([k[0] for k in sorted(agg)], np.int64)
        dst = np.array([k[1] for k in sorted(agg)], np.int64)
        w = np.array([agg[k] for k in sorted(agg)], np.float64)
        m2 = one_level(src, dst, w)
        final = {v: m2[c] for v, c in final.items()}
        mapping = final
    return final


def test_louvain_matches_reference(ray_session, tmp_root):
    edges = random_edges(80, 420, seed=17)
    g = LinkGraph.build(
        rd.from_pandas(edges), os.path.join(tmp_root, "g-louv"), P=4,
        symmetrize=True,
    )
    comm_ds, q = run_louvain(
        g, os.path.join(tmp_root, "ck-louv"), rounds=3, levels=2
    )
    got = comm_ds.to_pandas().sort_values("v").reset_index(drop=True)

    e = g.edges_ds().to_pandas()
    e = pd.DataFrame(
        {"src": e["src_id"], "dst": e["dst_id"], "w": np.ones(len(e))}
    )
    want = _louvain_ref(e, rounds=3, levels=2)
    for v, c in zip(got["v"], got["comm"]):
        assert c == want[int(v)], (v, c, want[int(v)])

    # modularity should beat the singleton partition (Q_singleton < 0);
    # an ER random graph has ~no structure, so only a relative check here
    singles = rd.from_pandas(
        pd.DataFrame({"v": got["v"], "comm": got["v"]})
    )
    q0 = modularity(rd.from_pandas(e), singles, B=4)
    assert q > q0


def test_louvain_planted_partition(ray_session, tmp_root):
    """Four planted blocks: Louvain must recover them (high modularity,
    few communities, block members together)."""
    rng = np.random.Generator(np.random.Philox(key=[31, 0]))
    rows = []
    for b in range(4):
        members = np.arange(b * 20, (b + 1) * 20)
        for _ in range(160):
            u, v = rng.choice(members, 2, replace=False)
            rows.append((u, v))
    for _ in range(30):  # sparse cross links
        u = rng.integers(0, 40)
        v = rng.integers(40, 80)
        rows.append((u, v))
    edges = pd.DataFrame(rows, columns=["src_id", "dst_id"])
    g = LinkGraph.build(
        rd.from_pandas(edges), os.path.join(tmp_root, "g-louv-pl"), P=4,
        symmetrize=True,
    )
    comm_ds, q = run_louvain(
        g, os.path.join(tmp_root, "ck-louv-pl"), rounds=3, levels=2
    )
    got = comm_ds.to_pandas()
    assert q > 0.4, q
    # each planted block should map to a dominant community
    for b in range(4):
        members = got[(got["v"] >= b * 20) & (got["v"] < (b + 1) * 20)]
        top = members["comm"].value_counts().iloc[0]
        assert top >= 0.8 * len(members), (b, members["comm"].value_counts())


def test_louvain_auto_multilevel(ray_session, tmp_root):
    """levels="auto" (full multilevel): terminates, returns the best
    partition seen, and is at least as good as the fixed-2-level run
    on a graph with nested community structure (8 small blocks that
    pairwise merge into 4 super-blocks — needs >1 coarsening to see)."""
    rng = np.random.Generator(np.random.Philox(key=[77, 0]))
    rows = []
    for b in range(8):  # 8 tight blocks of 10
        members = np.arange(b * 10, (b + 1) * 10)
        for _ in range(90):
            u, v = rng.choice(members, 2, replace=False)
            rows.append((u, v))
    for sb in range(4):  # pair 2b,2b+1 with medium coupling
        left = np.arange(sb * 20, sb * 20 + 10)
        right = np.arange(sb * 20 + 10, sb * 20 + 20)
        for _ in range(25):
            rows.append((rng.choice(left), rng.choice(right)))
    for _ in range(12):  # sparse global noise
        u, v = rng.choice(80, 2, replace=False)
        rows.append((u, v))
    edges = pd.DataFrame(rows, columns=["src_id", "dst_id"])
    g = LinkGraph.build(
        rd.from_pandas(edges), os.path.join(tmp_root, "g-louv-auto"), P=4,
        symmetrize=True,
    )
    _, q2 = run_louvain(
        g, os.path.join(tmp_root, "ck-louv-2"), rounds=3, levels=2
    )
    comm_ds, qa = run_louvain(
        g, os.path.join(tmp_root, "ck-louv-auto"), rounds=3, levels="auto",
        tol=1e-6, max_levels=6,
    )
    assert qa >= q2 - 1e-12, (qa, q2)
    assert qa > 0.4, qa
    got = comm_ds.to_pandas()
    assert set(got["v"]) == set(range(80))
    assert got["comm"].nunique() <= 12, got["comm"].nunique()
