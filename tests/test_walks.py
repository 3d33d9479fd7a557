"""random_walks: numpy replay parity, early termination at sinks, and
partitioning invariance (graph_walks carries the full SQL oracle)."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from raylinkgraph.algos.walks import _pick, random_walks


def _replay(edges: pd.DataFrame, walk_len: int) -> set:
    adj = {}
    for s, d in edges.drop_duplicates().itertuples(index=False):
        adj.setdefault(s, set()).add(d)
    adj = {s: np.array(sorted(ds), np.int64) for s, ds in adj.items()}
    rows = set()
    for w in sorted(adj):
        cur = w
        rows.add((w, 0, w))
        for step in range(1, walk_len + 1):
            nb = adj.get(cur)
            if nb is None or not len(nb):
                break
            i = int(_pick(np.array([w]), step, np.array([cur]),
                          np.array([len(nb)]))[0])
            cur = int(nb[i])
            rows.add((w, step, cur))
    return rows


@pytest.mark.parametrize("blocks", [1, 7])
def test_walks_match_replay(ray_session, blocks):
    rng = np.random.default_rng(13)
    e = pd.DataFrame(
        {"src_id": rng.integers(0, 60, 800).astype(np.int64),
         "dst_id": rng.integers(0, 60, 800).astype(np.int64)}
    )
    e = e[e["src_id"] != e["dst_id"]]
    got = random_walks(
        rd.from_pandas(e).repartition(blocks), walk_len=3
    ).to_pandas()
    assert set(zip(got["walk_id"], got["step"], got["vertex"])) == _replay(e, 3)


def test_walks_stop_at_sinks(ray_session):
    # 0 -> 1 -> 2, 2 has no out-edge: the walk from 0 stops at step 2
    e = pd.DataFrame({"src_id": np.int64([0, 1]), "dst_id": np.int64([1, 2])})
    got = random_walks(rd.from_pandas(e), walk_len=5).to_pandas()
    walk0 = got[got["walk_id"] == 0].sort_values("step")
    assert walk0["vertex"].tolist() == [0, 1, 2]


def test_node2vec_sequential_replay(ray_session):
    """Distributed node2vec walks == single-process sequential replay of
    the spec (uniform first hop; integer-weight cumsum pick after)."""
    from raylinkgraph.algos.walks import node2vec_walks

    rng = np.random.default_rng(2)
    m = 300
    u = rng.integers(0, 40, m)
    v = rng.integers(0, 40, m)
    keep = u != v
    e = pd.DataFrame({"src_id": u[keep], "dst_id": v[keep]}).drop_duplicates()
    sym = pd.concat(
        [e, e.rename(columns={"src_id": "dst_id", "dst_id": "src_id"})]
    ).drop_duplicates()
    WL, WR, WI, WO = 5, 2, 4, 1
    got = (
        node2vec_walks(
            rd.from_pandas(sym), walk_len=WL, wr=WR, wi=WI, wo=WO, seed_mod=4
        )
        .to_pandas()
        .sort_values(["walk_id", "step"])
        .reset_index(drop=True)
    )

    adj, eset = {}, set()
    for s, d in sym[["src_id", "dst_id"]].itertuples(index=False):
        adj.setdefault(int(s), []).append(int(d))
        eset.add((int(s), int(d)))
    for k in adj:
        adj[k] = sorted(set(adj[k]))
    rows = []
    for wid in sorted(x for x in adj if x % 4 == 0):
        cur, prev = wid, -1
        rows.append((wid, 0, cur))
        for step in range(1, WL + 1):
            nbrs = adj.get(cur, [])
            if not nbrs:
                break
            r = ((wid % 97) * 131 + step * 31 + cur % 1000003)
            if step == 1:
                nxt = nbrs[r % len(nbrs)]
            else:
                ws = [
                    WR if x == prev else (WI if (prev, x) in eset else WO)
                    for x in nbrs
                ]
                rr, cw = r % sum(ws), 0
                for x, wgt in zip(nbrs, ws):
                    cw += wgt
                    if rr < cw:
                        nxt = x
                        break
            rows.append((wid, step, nxt))
            prev, cur = cur, nxt
    bf = (
        pd.DataFrame(rows, columns=["walk_id", "step", "vertex"])
        .sort_values(["walk_id", "step"])
        .reset_index(drop=True)
    )
    assert got.astype(np.int64).equals(bf.astype(np.int64))


def test_node2vec_partition_invariance(ray_session):
    from raylinkgraph.algos.walks import node2vec_walks

    rng = np.random.default_rng(9)
    u = rng.integers(0, 30, 200)
    v = rng.integers(0, 30, 200)
    keep = u != v
    e = pd.DataFrame({"src_id": u[keep], "dst_id": v[keep]}).drop_duplicates()
    sym = pd.concat(
        [e, e.rename(columns={"src_id": "dst_id", "dst_id": "src_id"})]
    ).drop_duplicates()
    a = (
        node2vec_walks(rd.from_pandas(sym), walk_len=3, seed_mod=3)
        .to_pandas().sort_values(["walk_id", "step"]).reset_index(drop=True)
    )
    b = (
        node2vec_walks(rd.from_pandas(sym).repartition(11), walk_len=3,
                       seed_mod=3)
        .to_pandas().sort_values(["walk_id", "step"]).reset_index(drop=True)
    )
    assert a.astype(np.int64).equals(b.astype(np.int64))
