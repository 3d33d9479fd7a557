"""Directed triangle census vs a brute-force oracle (tri_census.py,
Flash subgraph variants .gs_conf.yaml:496-540)."""

import itertools

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from raylinkgraph.algos.tri_census import directed_triangle_census


def _brute(edges: set[tuple[int, int]]) -> dict[str, int]:
    out = {}
    verts = sorted({x for e in edges for x in e})
    E = edges
    acy = sum(
        1
        for (u, v) in E
        for x in verts
        if x != u and x != v and (u, x) in E and (v, x) in E
    )
    # directed 3-cycles, once per cycle (count rotations / 3)
    cyc = (
        sum(
            1
            for (u, v) in E
            for x in verts
            if (v, x) in E and (x, u) in E
        )
        // 3
    )
    R = {(u, v) for (u, v) in E if (v, u) in E}
    in_t = sum(
        1
        for (u, v) in R
        if u > v
        for x in verts
        if x != u and x != v and (u, x) in E and (v, x) in E
    )
    out_t = sum(
        1
        for (u, v) in R
        if u > v
        for x in verts
        if x != u and x != v and (x, u) in E and (x, v) in E
    )
    cp = sum(
        1
        for (u, v) in R
        for x in verts
        if x != u and x != v and (x, u) in E and (v, x) in E
    )
    out["acyclic"], out["cyclic"] = acy, cyc
    out["in_tri"], out["out_tri"], out["cycle_plus"] = in_t, out_t, cp
    return out


def _run(edges: set[tuple[int, int]]):
    df = pd.DataFrame(
        {
            "src_id": np.array([e[0] for e in edges], np.int64),
            "dst_id": np.array([e[1] for e in edges], np.int64),
        }
    )
    return directed_triangle_census(rd.from_pandas(df), P=4)


def test_census_known_motifs(ray_session):
    # transitive triangle 1->2, 1->3, 2->3 ; cycle 4->5->6->4 ;
    # reciprocal pair 7<->8 both pointing at 9 and both pointed at by 10
    edges = {
        (1, 2), (1, 3), (2, 3),
        (4, 5), (5, 6), (6, 4),
        (7, 8), (8, 7), (7, 9), (8, 9), (10, 7), (10, 8),
    }
    got = _run(edges)
    assert got == _brute(edges)
    assert got["acyclic"] >= 1 and got["cyclic"] == 1
    assert got["in_tri"] == 1 and got["out_tri"] == 1


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_census_random(ray_session, seed):
    rng = np.random.default_rng(seed)
    n = 14
    edges = {
        (int(u), int(v))
        for u, v in itertools.permutations(range(n), 2)
        if rng.random() < 0.25
    }
    assert _run(edges) == _brute(edges)


def test_tailed_triangle(ray_session, tmp_root):
    import collections
    import os

    from raylinkgraph.algos.tri_census import tailed_triangle_count
    from raylinkgraph.oracle.reference import random_edges
    from raylinkgraph.stages.graph_build import LinkGraph

    edges = random_edges(60, 400, seed=7)
    g = LinkGraph.build(
        rd.from_pandas(edges), os.path.join(tmp_root, "g-tail"), P=4,
        symmetrize=True,
    )
    adj = collections.defaultdict(set)
    for u, v in edges[["src_id", "dst_id"]].itertuples(index=False, name=None):
        if u != v:
            adj[int(u)].add(int(v))
            adj[int(v)].add(int(u))
    # oracle: sum over triangles {a,b,c} of (deg(a)-2)+(deg(b)-2)+(deg(c)-2)
    want = 0
    for a in adj:
        for b in adj[a]:
            if b <= a:
                continue
            for c in adj[a] & adj[b]:
                if c <= b:
                    continue
                want += sum(len(adj[x]) - 2 for x in (a, b, c))
    got = tailed_triangle_count(g, os.path.join(tmp_root, "ck-tail"))
    assert got == want
    assert got > 0


def test_census_partition_invariance(ray_session):
    rng = np.random.default_rng(5)
    edges = {
        (int(u), int(v))
        for u, v in zip(rng.integers(0, 40, 500), rng.integers(0, 40, 500))
        if u != v
    }
    df = pd.DataFrame(
        {"src_id": np.array([e[0] for e in edges], np.int64),
         "dst_id": np.array([e[1] for e in edges], np.int64)}
    )
    a = directed_triangle_census(rd.from_pandas(df), P=2)
    b = directed_triangle_census(
        rd.from_pandas(df).repartition(7), P=16
    )
    assert a == b == _brute(edges)
