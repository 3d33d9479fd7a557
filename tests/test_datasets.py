"""Bundled dataset loaders, standard graph-file readers, and the
remote-filesystem loader path.

Reference parity targets: graphscope.dataset loaders
(python/graphscope/dataset/p2p_network.py:26, modern_graph.py:25),
libgrape-lite .v/.e fixtures (analytical_engine/test/app_tests.sh:403),
and the Loader's remote protocol support (framework/loader.py:94-211).
"""

import os

import numpy as np
import pandas as pd
import pytest

from raylinkgraph.sources.datasets import (
    load_modern_graph,
    load_p2p_network,
    read_graphalytics,
    read_snap_edges,
)
from raylinkgraph.sources.loader import load_table


def test_modern_graph_schema_and_counts(ray_session):
    pg = load_modern_graph()
    assert pg.vertex_labels == ["person", "software"]
    assert pg.edge_labels == ["created", "knows"]
    assert pg.num_vertices("person") == 4
    assert pg.num_vertices("software") == 2
    assert pg.num_edges("knows") == 2
    assert pg.num_edges("created") == 4


def test_modern_graph_weighted_projection(ray_session):
    pg = load_modern_graph()
    df = pg.project(weight=True).to_pandas()
    assert len(df) == 6
    # marko(person 1) -knows:0.5-> vadas(person 2)
    P = pg.label_offset("person")
    row = df[(df.src_id == P + 1) & (df.dst_id == P + 2)]
    assert len(row) == 1 and row.iloc[0]["weight"] == 0.5
    # all created edges end at software gids {lop=3, ripple=5}
    S = pg.label_offset("software")
    created = df[df.dst_id >= S]
    assert len(created) == 4
    assert sorted(set(created["dst_id"] - S)) == [3, 5]


def test_p2p_mini_load_and_wcc_vs_networkx(ray_session, tmp_root):
    nx = pytest.importorskip("networkx")
    from raylinkgraph.algos import WCC
    from raylinkgraph.bsp import run_bsp

    pg = load_p2p_network()
    assert pg.vertex_labels == ["host"]
    e = pg.edges("connect").to_pandas()
    assert len(e) == 367 and {"src_id", "dst_id", "weight"} <= set(e.columns)

    g = pg.to_simple(os.path.join(tmp_root, "p2p_g"), P=4, symmetrize=True)
    res = run_bsp(g, WCC(), os.path.join(tmp_root, "p2p_wcc"), max_rounds=1000)
    got = res.state_pandas()[["oid", "comp"]]

    G = nx.Graph()
    G.add_edges_from(zip(e["src_id"], e["dst_id"]))
    want = {}
    for comp in nx.connected_components(G):
        m = min(comp)
        for v in comp:
            want[v] = m
    got_map = dict(zip(got["oid"], got["comp"]))
    assert got_map == want


def test_p2p_mini_sssp_vs_networkx(ray_session, tmp_root):
    nx = pytest.importorskip("networkx")
    from raylinkgraph.algos.sssp import SSSP
    from raylinkgraph.bsp import run_bsp

    pg = load_p2p_network()
    g = pg.to_simple(
        os.path.join(tmp_root, "p2p_w"), P=4, symmetrize=True, weight_col="weight"
    )
    res = run_bsp(g, SSSP(source=0), os.path.join(tmp_root, "p2p_sssp"),
                  max_rounds=1000)
    got = res.state_pandas()
    dcol = "dist" if "dist" in got.columns else got.columns[-1]

    e = pg.edges("connect").to_pandas()
    G = nx.Graph()
    for s, d, w in zip(e["src_id"], e["dst_id"], e["weight"]):
        if G.has_edge(s, d):
            G[s][d]["weight"] = min(G[s][d]["weight"], w)
        else:
            G.add_edge(s, d, weight=w)
    want = nx.single_source_dijkstra_path_length(G, 0)
    for oid, dist in zip(got["oid"], got[dcol]):
        if np.isfinite(dist):
            assert abs(want[oid] - dist) < 1e-9, oid
        else:
            assert oid not in want


def test_read_graphalytics_unweighted_autodetect(ray_session, tmp_root):
    vf = os.path.join(tmp_root, "toy.v")
    ef = os.path.join(tmp_root, "toy.e")
    open(vf, "w").write("0\n1\n2\n")
    open(ef, "w").write("0 1\n1 2\n")
    v, e = read_graphalytics(vf, ef)
    assert v.count() == 3
    df = e.to_pandas()
    assert list(df.columns) == ["src_id", "dst_id"] and len(df) == 2


def test_read_snap_edges_skips_comments(ray_session, tmp_root):
    p = os.path.join(tmp_root, "snap.txt")
    open(p, "w").write(
        "# Directed graph (each unordered pair of nodes is saved once)\n"
        "# FromNodeId\tToNodeId\n"
        "0\t1\n"
        "1\t2\n"
        "\n"
        "2\t0\n"
    )
    df = read_snap_edges(p).to_pandas().sort_values(["src_id", "dst_id"])
    assert df.values.tolist() == [[0, 1], [1, 2], [2, 0]]


def test_load_table_over_mock_remote_fs(ray_session):
    """The reference Loader reads oss://, hdfs://, s3://
    (framework/loader.py:94-211). Exercise the exact same load_table code
    path — header probe + Ray Data worker-side read — through a
    NON-local pyarrow FileSystem wrapped in PyFileSystem(FSSpecHandler)."""
    from pyarrow import fs as pafs

    from raylinkgraph.sources.memfs import StaticBytesFS

    fs = pafs.PyFileSystem(
        pafs.FSSpecHandler(StaticBytesFS({"bucket/edges.csv": b"0,1\n1,2\n2,0\n"}))
    )

    ds = load_table("bucket/edges.csv#header_row=false", filesystem=fs)
    df = ds.to_pandas().sort_values(["f0", "f1"]).reset_index(drop=True)
    assert list(df.columns) == ["f0", "f1"]
    assert df.values.tolist() == [[0, 1], [1, 2], [2, 0]]
