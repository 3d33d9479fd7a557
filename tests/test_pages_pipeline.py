"""End-to-end pages pipeline tests: extraction byte-identity, ground-truth
edge recovery, parallelism invariance, PageRank on the real pipeline."""

import os

import numpy as np
import pytest
import ray.data as rd

from raylinkgraph.extract import extract
from raylinkgraph.oracle.reference import pagerank_oracle
from raylinkgraph.pipelines.linkgraph import (
    build_linkgraph_from_pages,
    run_pagerank,
    run_wcc,
    undirected_view,
)
from raylinkgraph.oracle.reference import wcc_oracle
from raylinkgraph.schema import PageGen
from raylinkgraph.sources.pages import generate_pages_parquet

N_PAGES = 600


@pytest.fixture(scope="module")
def pages_dir(ray_session, tmp_root):
    d = os.path.join(tmp_root, "pages")
    generate_pages_parquet(d, N_PAGES, seed=42)
    return d


@pytest.fixture(scope="module")
def built(ray_session, tmp_root, pages_dir):
    out = os.path.join(tmp_root, "pipe")
    graph, vmap = build_linkgraph_from_pages(
        pages_dir, out, P=8, vmap_partitions=16, extract_concurrency=2,
        extract_batch_size=64,
    )
    return out, graph, vmap


def test_extracted_text_byte_identical(built, pages_dir):
    """Distributed actor-pool output == single-process pinned extractor,
    per url (the input_hint per-row invariant)."""
    out, _, _ = built
    got = (
        rd.read_parquet(os.path.join(out, "text_table"))
        .to_pandas()
        .set_index("url")["text"]
        .to_dict()
    )
    pages = rd.read_parquet(pages_dir).to_pandas()
    assert len(got) == len(pages)
    for url, html in zip(pages["url"], pages["html"]):
        assert got[url] == extract(bytes(html), url)[0]


def test_edges_match_ground_truth(built):
    """Pipeline edge table == generator's known link graph (dedup, no
    self-loops), mapped through the vertex map."""
    out, graph, vmap = built
    gen = PageGen(N_PAGES, seed=42)
    vm = vmap.to_pandas().set_index("url")["gid"].to_dict()
    want = {(vm[s], vm[d]) for (s, d) in gen.true_edge_pairs()}
    got_df = graph.edges_ds().to_pandas()
    got = set(zip(got_df["src_id"], got_df["dst_id"]))
    assert got == want


def test_vertex_map_deterministic_and_parallelism_invariant(built, pages_dir, tmp_root):
    """Rebuilding with a different block layout / batch size yields the
    identical vertex map and edge table (mirrors the reference's
    test_scalability.py invariance)."""
    out, graph, vmap = built
    out2 = os.path.join(tmp_root, "pipe2")
    graph2, vmap2 = build_linkgraph_from_pages(
        pages_dir, out2, P=8, vmap_partitions=16, extract_concurrency=1,
        extract_batch_size=17, write_text_table=False,
    )
    a = vmap.to_pandas().sort_values("url").reset_index(drop=True)
    b = vmap2.to_pandas().sort_values("url").reset_index(drop=True)
    assert a.equals(b)
    ea = graph.edges_ds().to_pandas().sort_values(["src_id", "dst_id"]).reset_index(drop=True)
    eb = graph2.edges_ds().to_pandas().sort_values(["src_id", "dst_id"]).reset_index(drop=True)
    assert ea.equals(eb)


def test_pagerank_and_wcc_on_pipeline_graph(built, tmp_root):
    out, graph, _ = built
    edges = graph.edges_ds().to_pandas()
    res = run_pagerank(graph, os.path.join(tmp_root, "ck-pipe-pr"), max_rounds=100)
    assert res.converged
    got = res.state_pandas()
    want = pagerank_oracle(edges)
    assert np.array_equal(got["oid"].to_numpy(), want["oid"].to_numpy())
    assert np.allclose(got["rank"].to_numpy(), want["rank"].to_numpy(), atol=1e-6)

    und = undirected_view(graph, os.path.join(tmp_root, "pipe-und"))
    resw = run_wcc(und, os.path.join(tmp_root, "ck-pipe-wcc"))
    gotw = resw.state_pandas()
    wantw = wcc_oracle(edges)
    assert np.array_equal(gotw["comp"].to_numpy(), wantw["comp"].to_numpy())
