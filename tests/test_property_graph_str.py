"""String-OID labeled property graphs (reference vertex ids may be
int32/int64/std::string — python/graphscope/framework/utils.py:411-418):
dense key maps, projection, result mapping, and the GraphAr round trip."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from raylinkgraph.pipelines.property_graph import LABEL_STRIDE, PropertyGraph
from raylinkgraph.stages.vertex_map import dense_key_map


def _pg():
    people = rd.from_pandas(
        pd.DataFrame(
            {"name": ["alice", "bob", "carol", "dave"], "age": [30, 40, 50, 60]}
        )
    )
    cities = rd.from_pandas(pd.DataFrame({"city": ["nyc", "sf", "tokyo"]}))
    lives = rd.from_pandas(
        pd.DataFrame(
            {"p": ["alice", "bob", "carol", "dave"], "c": ["nyc", "sf", "nyc", "tokyo"]}
        )
    )
    knows = rd.from_pandas(pd.DataFrame({"a": ["alice", "bob"], "b": ["bob", "carol"]}))
    return (
        PropertyGraph()
        .add_vertices("city", cities, "city")
        .add_vertices("person", people, "name")
        .add_edges("lives", lives, "p", "c", src_label="person", dst_label="city")
        .add_edges("knows", knows, "a", "b", src_label="person", dst_label="person")
    )


def test_dense_key_map_deterministic(ray_session):
    keys = pd.DataFrame({"k": [f"url{i:03d}" for i in range(97)]})
    a = dense_key_map(rd.from_pandas(keys), "k").to_pandas()
    # different block layout, duplicated rows -> identical assignment
    dup = pd.concat([keys.iloc[::-1], keys], ignore_index=True)
    b = dense_key_map(rd.from_pandas(dup).repartition(7), "k").to_pandas()
    a = a.sort_values("key").reset_index(drop=True)
    b = b.sort_values("key").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert a["local"].is_unique and (a["local"] >= 0).all()
    assert (a["local"] < LABEL_STRIDE).all()


def test_string_projection_and_key_mapping(ray_session):
    pg = _pg()
    assert pg.is_string_keyed("person") and pg.is_string_keyed("city")
    assert pg.num_edges("lives", distinct=True) == 4
    assert pg.num_edges("knows", distinct=True) == 2

    edges = pg.project().to_pandas()
    assert len(edges) == 6
    # gid label partition: city = idx 0, person = idx 1 (sorted order)
    lab = edges["src_id"].to_numpy() // LABEL_STRIDE
    assert (lab == 1).all()  # every edge starts at a person

    # with_keys round-trips gids back to the original strings
    m = pg.with_keys(edges.rename(columns={"src_id": "oid"}), "oid")
    assert set(m["vkey"]) == {"alice", "bob", "carol", "dave"}
    # attach_keys (the Dataset-scale path) agrees
    ds = pg.attach_keys(pg.project(), "src_id")
    got = ds.to_pandas().sort_values(["src_id", "dst_id"]).reset_index(drop=True)
    want = m.sort_values(["oid", "dst_id"]).reset_index(drop=True)
    assert list(got["vkey"]) == list(want["vkey"])


def test_projection_parallelism_invariant(ray_session):
    pg = _pg()
    e1 = (
        pg.project().to_pandas().sort_values(["src_id", "dst_id"])
        .reset_index(drop=True)
    )
    # same schema, re-blocked edge inputs -> identical gids
    pg2 = _pg()
    pg2._e["lives"]["ds"] = pg2._e["lives"]["ds"].repartition(3)
    e2 = (
        pg2.project().to_pandas().sort_values(["src_id", "dst_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(e1, e2)


def test_missing_endpoint_key_raises(ray_session):
    pg = _pg()
    bad = rd.from_pandas(pd.DataFrame({"a": ["alice"], "b": ["nobody"]}))
    pg.add_edges("bad", bad, "a", "b", src_label="person", dst_label="person")
    with pytest.raises(Exception, match="missing from the vertex label"):
        pg.project(["bad"]).materialize()


def test_string_wcc_end_to_end(ray_session, tmp_path):
    """WCC over the string projection: {alice,bob,carol,nyc,sf} form one
    component (knows + lives), {dave,tokyo} the other."""
    from raylinkgraph.algos import WCC
    from raylinkgraph.bsp import run_bsp

    pg = _pg()
    g = pg.to_simple(str(tmp_path / "g"), symmetrize=True)
    res = run_bsp(g, WCC(), str(tmp_path / "wcc"), max_rounds=100)
    df = pg.with_keys(res.state_pandas()[["oid", "comp"]])
    comp_key = df.groupby("comp")["vkey"].min()
    df["comp"] = comp_key.reindex(df["comp"]).to_numpy(object)
    by_key = dict(zip(df["vkey"], df["comp"]))
    assert (
        by_key["alice"] == by_key["bob"] == by_key["carol"]
        == by_key["nyc"] == by_key["sf"] == "alice"
    )
    assert by_key["dave"] == by_key["tokyo"] == "dave"
    assert by_key["dave"] != by_key["alice"]


def test_string_graphar_roundtrip(ray_session, tmp_path):
    """String-keyed labels survive the GraphAr export/import: same label
    set, same key sets, identical projected edge gids."""
    from raylinkgraph.sources.graphar import load_graphar, save_to_graphar

    pg = _pg()
    entry = save_to_graphar(
        pg, str(tmp_path / "gar"), graph_name="strpg",
        vertex_chunk_size=2, edge_chunk_size=2,
    )
    pg2 = load_graphar(entry)
    assert pg2.is_string_keyed("person") and pg2.is_string_keyed("city")
    e1 = (
        pg.project().to_pandas().sort_values(["src_id", "dst_id"])
        .reset_index(drop=True)
    )
    e2 = (
        pg2.project().to_pandas().drop_duplicates()
        .sort_values(["src_id", "dst_id"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(e1, e2)
