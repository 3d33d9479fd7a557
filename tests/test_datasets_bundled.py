"""Round-5 bundled dataset loaders (reference python/graphscope/dataset/:
cora.py, u2i.py, ldbc.py, ogbn_mag.py) — load -> project -> algorithm
over the vendored deterministic fixtures."""

import os

import numpy as np
import pandas as pd
import pytest

from raylinkgraph.sources.datasets import (
    _DATA_DIR,
    load_cora,
    load_ldbc,
    load_ogbn_mag,
    load_u2i,
)


def test_cora_counts_and_acyclic(ray_session, tmp_path):
    pg = load_cora()
    assert pg.vertex_labels == ["paper"]
    assert pg.num_vertices("paper") == 48
    raw = pd.read_csv(os.path.join(_DATA_DIR, "cora", "edge.csv"))
    assert pg.num_edges("cites", distinct=True) == len(raw.drop_duplicates())
    edges = pg.project().to_pandas()
    # citations point strictly to earlier papers -> acyclic
    assert (edges["dst_id"] < edges["src_id"]).all()
    # bfs from paper 47 reaches something
    from raylinkgraph.algos.bfs import BFS, UNREACHED
    from raylinkgraph.bsp import run_bsp

    g = pg.to_simple(str(tmp_path / "cora"), symmetrize=True)
    res = run_bsp(g, BFS(int(edges["src_id"].min())), str(tmp_path / "bfs"),
                  max_rounds=100)
    st = res.state_pandas()
    assert (st["dist"] != UNREACHED).sum() > 1


def test_u2i_lpa_end_to_end(ray_session, tmp_path):
    """load_u2i -> project -> bipartite weighted LPA, the flow the
    reference's u2i fixture exists for."""
    from raylinkgraph.algos.lpa_u2i import LPAU2I
    from raylinkgraph.bsp import run_bsp
    from raylinkgraph.pipelines.property_graph import LABEL_STRIDE

    pg = load_u2i()
    assert pg.vertex_labels == ["i", "u"]
    assert pg.num_edges("u-i") == 100
    g = pg.to_simple(str(tmp_path / "u2i"), symmetrize=True,
                     weight_col="weight")
    # label 'u' sits above LABEL_STRIDE: it plays the 'item side' role in
    # the alternating schedule (the algorithm is side-symmetric)
    res = run_bsp(g, LPAU2I(LABEL_STRIDE, max_rounds=4),
                  str(tmp_path / "lpa"), max_rounds=4)
    st = res.state_pandas()
    e = pg.project().to_pandas()
    assert len(st) == pd.concat([e["src_id"], e["dst_id"]]).nunique()
    # every final label is a real vertex id
    assert np.isin(st["label"].to_numpy(), st["oid"].to_numpy()).all()


def test_ldbc_labels_and_projection(ray_session):
    pg = load_ldbc()
    assert len(pg.vertex_labels) == 8
    assert len(pg.edge_labels) == 23
    assert pg.num_vertices("person") == 12
    assert pg.num_vertices("comment") == 20
    # knows has no self loops in the fixture
    knows = pg.edges("knows").to_pandas()
    assert (knows["Person.id"] != knows["Person.id.1"]).all()
    # single-pair families keep their bare family name; multi-pair
    # families split per (src, dst) label pair
    assert "containerOf" in pg.edge_labels and "knows" in pg.edge_labels
    edges = pg.project(["hasCreator_post_person", "hasCreator_comment_person"])
    assert edges.count() == 15 + 20


def test_ldbc_wcc_over_full_projection(ray_session, tmp_path):
    from raylinkgraph.algos import WCC
    from raylinkgraph.bsp import run_bsp

    pg = load_ldbc()
    g = pg.to_simple(str(tmp_path / "ldbc"), symmetrize=True)
    res = run_bsp(g, WCC(), str(tmp_path / "wcc"), max_rounds=100)
    st = res.state_pandas()
    # the fixture is referentially dense -> one giant component
    assert st["comp"].nunique() == 1


def test_ogbn_mag_counts_and_pagerank(ray_session, tmp_path):
    from raylinkgraph.algos import PageRank
    from raylinkgraph.bsp import run_bsp

    pg = load_ogbn_mag()
    assert pg.vertex_labels == ["author", "field_of_study", "institution", "paper"]
    assert pg.num_vertices("paper") == 30
    cites = pg.project(["cites"]).to_pandas()
    assert (cites["dst_id"] < cites["src_id"]).all()  # temporal DAG
    g = pg.to_simple(str(tmp_path / "mag"), symmetrize=False)
    res = run_bsp(
        g, PageRank(g.n_vertices, alpha=0.85, tol=0.0, max_rounds=5),
        str(tmp_path / "pr"), max_rounds=5,
    )
    st = res.state_pandas()
    assert len(st) == g.n_vertices
    assert np.isfinite(st["rank"].to_numpy()).all()


def test_consolidate_columns_cora_features(ray_session):
    """consolidate_columns (reference dag_utils.py:232): pack cora's
    word-vector columns into ONE list<double> feature column — the
    GNN-feature prep the reference runs on property graphs."""
    import pyarrow as pa

    pg = load_cora()
    cols = [f"w{b}" for b in range(8)]
    pg.consolidate_columns("paper", cols, "feat")
    t = pg.vertices("paper").take_batch(50, batch_format="pyarrow")
    names = t.column_names
    assert "feat" in names and not set(cols) & set(names)
    feat = t["feat"]
    assert pa.types.is_fixed_size_list(feat.type) and feat.type.list_size == 8
    ids = t["id"].to_numpy(zero_copy_only=False)
    mats = np.stack([np.asarray(v, np.float64) for v in feat.to_pylist()])
    # packed values equal the generator's bit pattern (id bits 0..7)
    for row, i in zip(mats, ids):
        assert (row == [(int(i) >> b) & 1 for b in range(8)]).all()
    # consolidating an endpoint / id column is rejected
    with pytest.raises(ValueError):
        pg.consolidate_columns("paper", ["id"], "bad")


def test_simple_graph_loaders(ray_session):
    """The five single-label loaders (reference ppi.py / ogbn_arxiv.py /
    ogbl_collab.py / ogbl_ddi.py / ogbn_proteins.py): load -> project,
    ids resolve, extra edge columns ride along as properties."""
    from raylinkgraph.sources.datasets import (
        load_ogbl_collab,
        load_ogbl_ddi,
        load_ogbn_arxiv,
        load_ogbn_proteins,
        load_ppi,
    )

    for fn, vlab, elab, nv in (
        (load_ppi, "protein", "link", 50),
        (load_ogbn_arxiv, "paper", "citation", 40),
        (load_ogbl_collab, "author", "collaboration", 40),
        (load_ogbl_ddi, "drug", "effect", 30),
        (load_ogbn_proteins, "proteins", "associations", 36),
    ):
        pg = fn()
        assert pg.vertex_labels == [vlab] and pg.edge_labels == [elab]
        assert pg.num_vertices(vlab) == nv
        edges = pg.project().to_pandas()
        assert len(edges) == pg.num_edges(elab)
        assert edges["src_id"].between(0, nv - 1).all()
        assert edges["dst_id"].between(0, nv - 1).all()
    # proteins edges carry their strength property columns
    eds = load_ogbn_proteins().edges("associations")
    assert {"w0", "w1"} <= set(eds.schema().names)
