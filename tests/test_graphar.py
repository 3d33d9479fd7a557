"""GraphAr v1 export / import round-trip (reference
tests/unittest/test_graphar.py save_to+load_from; dag_utils.py:1085)."""

import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest
import yaml

from raylinkgraph.sources.datasets import load_modern_graph
from raylinkgraph.sources.graphar import (
    DST_COL,
    OFFSET_COL,
    SRC_COL,
    load_graphar,
    save_to_graphar,
)


@pytest.fixture(scope="module")
def exported(ray_session):
    import shutil
    import tempfile

    d = tempfile.mkdtemp(prefix="rlg-gar-")
    entry = save_to_graphar(
        load_modern_graph(), d, graph_name="modern",
        vertex_chunk_size=3, edge_chunk_size=2,
    )
    yield d, entry
    shutil.rmtree(d, ignore_errors=True)


def test_layout_and_metadata(exported):
    d, entry = exported
    assert entry.endswith("modern.graph.yaml")
    gy = yaml.safe_load(open(entry))
    assert gy["version"] == "gar/v1"
    assert set(gy["vertices"]) == {"person.vertex.yaml", "software.vertex.yaml"}
    assert set(gy["edges"]) == {
        "person_knows_person.edge.yaml",
        "person_created_software.edge.yaml",
    }
    # person: 4 rows at chunk_size=3 -> 2 chunks + count file
    vdir = os.path.join(d, "vertex", "person")
    assert open(os.path.join(vdir, "vertex_count")).read() == "4"
    c0 = pq.read_table(os.path.join(vdir, "group0", "chunk0"))
    c1 = pq.read_table(os.path.join(vdir, "group0", "chunk1"))
    assert c0.num_rows == 3 and c1.num_rows == 1
    # primary-key sorted across chunks: 1,2,4 | 6
    assert c0.column("id").to_pylist() == [1, 2, 4]
    assert c1.column("id").to_pylist() == [6]


def test_adjlist_internal_ids_and_offsets(exported):
    d, _ = exported
    edir = os.path.join(d, "edge", "person_created_software", "ordered_by_source")
    # created: 1->3, 4->3, 4->5, 6->3; internal src ids (sorted person
    # keys 1,2,4,6): 0,2,2,3; internal dst (software keys 3,5): 0,0,1,0
    rows = []
    adir = os.path.join(edir, "adj_list")
    for part in sorted(os.listdir(adir)):
        for c in sorted(os.listdir(os.path.join(adir, part))):
            t = pq.read_table(os.path.join(adir, part, c))
            rows += list(zip(t.column(SRC_COL).to_pylist(),
                             t.column(DST_COL).to_pylist()))
    assert sorted(rows) == [(0, 0), (2, 0), (2, 1), (3, 0)]
    # part0 = src chunk {0,1,2} -> 3 edges; part1 = src chunk {3} -> 1
    assert open(os.path.join(edir, "edge_count0")).read() == "3"
    assert open(os.path.join(edir, "edge_count1")).read() == "1"
    # offsets: part0 covers vertices 0..2 -> [0,1,1,3]; part1 vertex 3 -> [0,1]
    o0 = pq.read_table(os.path.join(edir, "offset", "chunk0"))
    assert o0.column(OFFSET_COL).to_pylist() == [0, 1, 1, 3]
    o1 = pq.read_table(os.path.join(edir, "offset", "chunk1"))
    assert o1.column(OFFSET_COL).to_pylist() == [0, 1]


def test_roundtrip_restores_graph(exported, ray_session):
    d, entry = exported
    pg2 = load_graphar(entry)
    pg1 = load_modern_graph()
    assert pg2.vertex_labels == pg1.vertex_labels
    assert pg2.edge_labels == pg1.edge_labels

    for lab in pg1.vertex_labels:
        a = pg1.vertices(lab).to_pandas().sort_values("id").reset_index(drop=True)
        b = pg2.vertices(lab).to_pandas().sort_values("id").reset_index(drop=True)
        pd.testing.assert_frame_equal(a[sorted(a.columns)], b[sorted(b.columns)])

    # weighted projection equality (edges back in the original key space)
    key = ["src_id", "dst_id"]
    a = pg1.project(weight=True).to_pandas().sort_values(key).reset_index(drop=True)
    b = pg2.project(weight=True).to_pandas().sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_empty_src_chunk_parts_roundtrip(ray_session, tmp_path):
    """Parts whose src-chunk range has no out-edges still get their
    empty adj_list chunk, zero edge_count and flat offsets (the parallel
    per-part writer fills them in a driver post-pass), and the loader
    round-trips the graph exactly."""
    import pandas as pd
    import ray.data as rd

    from raylinkgraph.pipelines.property_graph import PropertyGraph

    v = rd.from_pandas(pd.DataFrame({"id": list(range(10))}))
    e = rd.from_pandas(pd.DataFrame({"s": [0, 1, 0], "d": [5, 7, 9]}))
    pg = (
        PropertyGraph()
        .add_vertices("n", v, "id")
        .add_edges("e", e, "s", "d", src_label="n", dst_label="n")
    )
    d = str(tmp_path / "gar")
    entry = save_to_graphar(pg, d, graph_name="g",
                            vertex_chunk_size=2, edge_chunk_size=2)
    edir = os.path.join(d, "edge", "n_e_n", "ordered_by_source")
    counts = {
        i: open(os.path.join(edir, f"edge_count{i}")).read() for i in range(5)
    }
    assert counts == {0: "3", 1: "0", 2: "0", 3: "0", 4: "0"}
    offs0 = pq.read_table(os.path.join(edir, "offset", "chunk3"))
    assert offs0.column(OFFSET_COL).to_pylist() == [0, 0, 0]
    out = (
        load_graphar(entry).project().to_pandas()
        .sort_values(["src_id", "dst_id"]).reset_index(drop=True)
    )
    assert out.values.tolist() == [[0, 5], [0, 9], [1, 7]]
