"""top_link_pred_pairs: weights, tie-order, and bucket invariance on a
hand-checkable bipartite graph (oracle parity at sf0.01 is covered by
test_oracle_parity's auto-sweep over oracle_sql())."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from raylinkgraph.pipelines.graph_ops import (
    top_common_neighbor_pairs,
    top_link_pred_pairs,
)


def _toy_edges():
    # centers: 100 -> {1,2,3}, 101 -> {1,2}, 102 -> {2,3}, 103 -> {1}
    src = [1, 2, 3, 1, 2, 2, 3, 1]
    dst = [100, 100, 100, 101, 101, 102, 102, 103]
    return rd.from_pandas(
        pd.DataFrame({"src_id": np.int64(src), "dst_id": np.int64(dst)})
    )


def _ref_scores(weight):
    # pair -> score from the toy graph above (deg: 100->3, 101->2, 102->2)
    return {
        (1, 2): weight(3) + weight(2),
        (1, 3): weight(3),
        (2, 3): weight(3) + weight(2),
    }


@pytest.mark.parametrize("buckets", [1, 4])
def test_adamic_adar_toy(ray_session, buckets):
    out = top_link_pred_pairs(
        _toy_edges(), method="adamic_adar", k=10, buckets=buckets
    )
    ref = _ref_scores(lambda d: 1.0 / np.log(d))
    got = {
        (a, b): s / 1e6
        for a, b, s in zip(out["a"], out["b"], out["score_e6"])
    }
    assert set(got) == set(ref)
    for p in ref:
        assert abs(got[p] - ref[p]) < 1e-5, p
    # ties on equal quantized score break on (a, b): (1,2) before (2,3)
    assert (out.iloc[0]["a"], out.iloc[0]["b"]) == (1, 2)


def test_ra_and_cn_toy(ray_session):
    ra = top_link_pred_pairs(_toy_edges(), method="ra", k=10)
    ref = _ref_scores(lambda d: 1.0 / d)
    got = {(a, b): s / 1e6 for a, b, s in zip(ra["a"], ra["b"], ra["score_e6"])}
    for p in ref:
        assert abs(got[p] - ref[p]) < 1e-5, p

    cn = top_common_neighbor_pairs(_toy_edges(), k=10)
    got = {(a, b): n for a, b, n in zip(cn["a"], cn["b"], cn["n"])}
    assert got == {(1, 2): 2, (1, 3): 1, (2, 3): 2}
    assert cn["n"].dtype == np.int64


@pytest.mark.parametrize("buckets", [1, 4])
def test_jaccard_toy(ray_session, buckets):
    # deg: 1->{100,101,103}=3, 2->{100,101,102}=3, 3->{100,102}=2
    out = top_link_pred_pairs(
        _toy_edges(), method="jaccard", k=10, buckets=buckets
    )
    ref = {(1, 2): 2 / 4, (1, 3): 1 / 4, (2, 3): 2 / 3}
    got = {
        (a, b): s / 1e6
        for a, b, s in zip(out["a"], out["b"], out["score_e6"])
    }
    assert set(got) == set(ref)
    for p in ref:
        assert abs(got[p] - ref[p]) < 1e-5, p
    assert (out.iloc[0]["a"], out.iloc[0]["b"]) == (2, 3)


def test_duplicate_edges_ignored(ray_session):
    # a duplicated (src, dst) row must not inflate degree or pair count
    df = pd.DataFrame(
        {"src_id": np.int64([1, 1, 2]), "dst_id": np.int64([9, 9, 9])}
    )
    out = top_common_neighbor_pairs(rd.from_pandas(df), k=5)
    assert len(out) == 1
    assert (out.iloc[0]["a"], out.iloc[0]["b"], out.iloc[0]["n"]) == (1, 2, 1)
