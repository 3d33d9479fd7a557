"""Multi-label PropertyGraph: labeled registration, gid packing,
label-projected simple view, per-label result mapping, and algorithm
runs over the projection.

Reference semantics: labeled vertex/edge tables + project_to_simple
(python/graphscope/framework/graph.py:80-97; multi-label twitter
fixtures python/graphscope/tests/unittest/conftest.py:150-360).
"""

import os

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from raylinkgraph.pipelines.property_graph import (
    LABEL_STRIDE,
    PropertyGraph,
)


def _toy_pg():
    # person (keys 0..3) --lives_in--> city (keys 0..1)
    # person --knows--> person
    person = rd.from_pandas(
        pd.DataFrame(
            {"pid": np.int64([0, 1, 2, 3]), "city": np.int64([0, 0, 1, 1])}
        )
    )
    city = rd.from_pandas(
        pd.DataFrame({"cid": np.int64([0, 1]), "pop": np.int64([10, 20])})
    )
    knows = rd.from_pandas(
        pd.DataFrame({"a": np.int64([0, 1, 2]), "b": np.int64([1, 2, 3])})
    )
    return (
        PropertyGraph()
        .add_vertices("person", person, "pid")
        .add_vertices("city", city, "cid")
        .add_edges("lives_in", person, "pid", "city",
                   src_label="person", dst_label="city")
        .add_edges("knows", knows, "a", "b",
                   src_label="person", dst_label="person")
    )


def test_label_indexing_is_sorted_and_stable(ray_session):
    pg = _toy_pg()
    # sorted label order: city=0, person=1 — independent of insertion order
    assert pg.vertex_labels == ["city", "person"]
    assert pg.label_offset("city") == 0
    assert pg.label_offset("person") == LABEL_STRIDE


def test_counts_and_schema(ray_session):
    pg = _toy_pg()
    assert pg.num_vertices("person") == 4
    assert pg.num_vertices("city") == 2
    assert pg.num_edges("knows") == 3
    assert pg.num_edges("lives_in", distinct=True) == 4
    sch = pg.schema()
    assert sch["vertices"]["person"]["id_col"] == "pid"
    assert sch["edges"]["lives_in"]["dst_label"] == "city"


def test_projection_gid_arithmetic(ray_session):
    pg = _toy_pg()
    df = pg.project().to_pandas().sort_values(["src_id", "dst_id"])
    P = LABEL_STRIDE  # person offset (city=0, person=1)
    want = pd.DataFrame(
        {
            "src_id": np.int64(
                [P + 0, P + 0, P + 1, P + 1, P + 2, P + 2, P + 3]
            ),
            "dst_id": np.int64([0, P + 1, 0, P + 2, 1, P + 3, 1]),
        }
    ).sort_values(["src_id", "dst_id"])
    pd.testing.assert_frame_equal(
        df.reset_index(drop=True), want.reset_index(drop=True)
    )


def test_single_label_projection(ray_session):
    pg = _toy_pg()
    df = pg.project(["knows"]).to_pandas()
    assert len(df) == 3
    assert (df["src_id"] >= LABEL_STRIDE).all()  # all persons


def test_gid_range_guard(ray_session):
    bad = rd.from_pandas(
        pd.DataFrame({"k": np.int64([LABEL_STRIDE + 1]), "d": np.int64([0])})
    )
    pg = (
        PropertyGraph()
        .add_vertices("x", bad, "k")
        .add_edges("e", bad, "k", "d", src_label="x", dst_label="x")
    )
    with pytest.raises(Exception, match="2\\^40"):
        pg.project().to_pandas()


def test_with_labels_roundtrip(ray_session):
    pg = _toy_pg()
    gids = np.int64([0, 1, LABEL_STRIDE + 2])
    out = pg.with_labels(pd.DataFrame({"oid": gids, "v": [1.0, 2.0, 3.0]}))
    assert list(out["vlabel"]) == ["city", "city", "person"]
    assert list(out["vkey"]) == [0, 1, 2]


def test_to_simple_runs_wcc(ray_session, tmp_root):
    """End-to-end: labeled project -> LinkGraph -> WCC. Both cities are
    bridged by the knows-chain 0-1-2-3, so everything is one component
    whose id is the minimum gid (city 0)."""
    from raylinkgraph.algos import WCC
    from raylinkgraph.bsp import run_bsp

    pg = _toy_pg()
    gdir = os.path.join(tmp_root, "pg_toy")
    g = pg.to_simple(gdir, P=2, symmetrize=True)
    res = run_bsp(g, WCC(), os.path.join(tmp_root, "pg_wcc"), max_rounds=100)
    df = pg.with_labels(res.state_pandas()[["oid", "comp"]])
    assert (df["comp"] == 0).all()
    assert set(df["vlabel"]) == {"city", "person"}
    assert len(df) == 6
