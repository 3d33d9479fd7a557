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
