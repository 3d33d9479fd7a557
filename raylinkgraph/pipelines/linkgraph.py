"""End-to-end link-graph pipeline: pages parquet -> text -> edges -> CSR
-> {PageRank, WCC, CDLP, triangles}.

This is the flagship pipeline of the north rule: Common-Crawl-style pages
are parsed with a stateful actor-pool `map_batches` (byte-identical text
per url vs the pinned extractor), links resolved into a deduplicated
(src_id, dst_id) edge table via the deterministic vertex map, CSR shards
built by groupby-shuffle on hash(src) with super-node splitting, and the
iterative algorithms run as BSP rounds with per-superstep checkpoints.

The wide `html` column never crosses a shuffle: it is read once, consumed
by the extraction stage, and dropped (SURVEY.md §7 known-hard #6).
"""

from __future__ import annotations

import os

import pyarrow as pa

import ray.data as rd

from raylinkgraph.algos import CDLP, WCC, PageRank
from raylinkgraph.bsp import BSPResult, run_bsp
from raylinkgraph.stages.extract_stage import extract_pages, link_pairs, text_table
from raylinkgraph.stages.graph_build import LinkGraph
from raylinkgraph.stages.vertex_map import attach_gids, build_vertex_map


def build_linkgraph_from_pages(
    pages_path: str,
    out_dir: str,
    *,
    P: int = 32,
    vmap_partitions: int = 64,
    extract_concurrency: int | tuple[int, int] = 4,
    extract_batch_size: int = 256,
    symmetrize: bool = False,
    max_edges_per_block: int = 1 << 20,
    write_text_table: bool = True,
) -> tuple[LinkGraph, rd.Dataset]:
    """pages parquet -> (built LinkGraph, vertex_map Dataset).

    Artifacts under out_dir: text_table/ (url,text,lang), vertex_map/
    (url,gid), and the graph dir (edges/vertexstate/csr + meta.json).
    """
    pages = rd.read_parquet(pages_path, columns=["url", "html", "lang"])
    extracted = extract_pages(
        pages, concurrency=extract_concurrency, batch_size=extract_batch_size
    )
    if write_text_table:
        # two consumers (text sink + link pairs) would re-run the lazy
        # extraction twice; pin the html-free output once. At extreme
        # scale, write it to Parquet and re-read instead of materialize.
        extracted = extracted.materialize()
        text_table(extracted).write_parquet(os.path.join(out_dir, "text_table"))
    pairs = link_pairs(extracted)
    vmap = build_vertex_map(pairs, vmap_partitions=vmap_partitions).materialize()
    vmap.write_parquet(os.path.join(out_dir, "vertex_map"))
    edges = attach_gids(pairs, vmap)
    graph = LinkGraph.build(
        edges,
        os.path.join(out_dir, "graph" + ("-und" if symmetrize else "")),
        P=P,
        symmetrize=symmetrize,
        max_edges_per_block=max_edges_per_block,
    )
    return graph, vmap


def undirected_view(graph: LinkGraph, out_dir: str, **kwargs) -> LinkGraph:
    """Symmetrized copy of a built graph (for WCC/CDLP/triangles), built
    from its deduped edge table — the `to_undirected` op of SURVEY.md §2.1
    (dag_utils.py:611) as union-with-swapped-endpoints + dedup."""
    return LinkGraph.build(
        graph.edges_ds(),
        out_dir,
        P=graph.P,
        symmetrize=True,
        max_edges_per_block=int(graph.meta.get("max_edges_per_block", 1 << 20)),
        **kwargs,
    )


def run_pagerank(
    graph: LinkGraph, workdir: str, *, alpha=0.85, tol=1e-6, max_rounds=100, **kw
) -> BSPResult:
    return run_bsp(
        graph,
        PageRank(graph.n_vertices, alpha=alpha, tol=tol, max_rounds=max_rounds),
        workdir,
        max_rounds=max_rounds,
        **kw,
    )


def run_wcc(graph: LinkGraph, workdir: str, *, max_rounds=10_000, **kw) -> BSPResult:
    if not graph.meta.get("symmetrize"):
        raise ValueError("WCC requires a symmetrized graph (undirected_view)")
    return run_bsp(graph, WCC(max_rounds=max_rounds), workdir, max_rounds=max_rounds, **kw)


def run_cdlp(graph: LinkGraph, workdir: str, *, max_rounds=10, **kw) -> BSPResult:
    if not graph.meta.get("symmetrize"):
        raise ValueError("CDLP requires a symmetrized graph (undirected_view)")
    return run_bsp(graph, CDLP(max_rounds=max_rounds), workdir, max_rounds=max_rounds, **kw)


def host_graph(
    graph: LinkGraph, vmap: rd.Dataset, *, buckets: int = 64
) -> rd.Dataset:
    """Host-level aggregation of a page link graph: contract every page
    vertex to its URL host and count distinct page-level edges per
    (src_host, dst_host) — the Common-Crawl host/domain-graph product
    (the reference's analogue is label projection + groupby over a
    property graph). Host extraction is one vectorized string split over
    the sharded vertex map; the contraction is graph_ops.quotient_graph
    (three bucketed exchanges, nothing broadcast)."""
    import pyarrow.compute as pc

    from raylinkgraph.pipelines.graph_ops import quotient_graph

    def to_host(batch: pa.Table) -> pa.Table:
        parts = pc.split_pattern(batch.column("url"), "/")
        host = pc.list_element(parts, 2)  # scheme:, '', host, path...
        return pa.table({"oid": batch.column("gid"), "grp": host})

    hosts = vmap.map_batches(to_host, batch_format="pyarrow")
    return quotient_graph(graph.edges_ds(), hosts, hosts, buckets=buckets)


def host_rank(
    graph: LinkGraph,
    vmap: rd.Dataset,
    workdir: str,
    *,
    alpha: float = 0.85,
    tol: float = 1e-10,
    max_rounds: int = 50,
    buckets: int = 64,
    P: int = 8,
) -> "pd.DataFrame":
    """Host-level weighted PageRank — the Common-Crawl host-centrality
    product (the same statistic the CC project publishes as its host
    ranks): contract the page graph to hosts (host_graph), keep the
    page-edge multiplicity as the edge weight, row-normalize into
    transition weights t(u,v) = w(u,v)/Σ_x w(u,x) with one bucketed
    groupby on hash(src), build the (much smaller) host LinkGraph with
    the weights attached, and run the same WeightedPageRank superstep
    the page-level rank uses -> (host, rank).

    Every exchange is bucketed (quotient contraction, gid joins via
    hash_join's broadcast-or-partitioned paths, one normalization
    groupby); nothing O(pages) reaches the driver — only O(hosts)
    artifacts do, which is the point of contracting first."""
    import numpy as np
    import pandas as pd

    from raylinkgraph.algos.pagerank import WeightedPageRank
    from raylinkgraph.functions.hashing import partition_of
    from raylinkgraph.functions.joins import hash_join
    from raylinkgraph.stages.vertex_map import build_vertex_map as _bvm

    hg = host_graph(graph, vmap, buckets=buckets)

    def as_pairs(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src_url": batch.column("src_grp"),
                "dst_url": batch.column("dst_grp"),
                "weight": batch.column("n_edges").cast(pa.float64()),
            }
        )

    pairs = hg.map_batches(as_pairs, batch_format="pyarrow").materialize()
    hmap = _bvm(pairs, vmap_partitions=buckets).materialize()

    withs = hash_join(pairs, hmap, on="src_url", right_on="url")
    withd = hash_join(withs, hmap, on="dst_url", right_on="url", rsuffix="_d")

    def to_ids(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = pa.table(
            {
                "src_id": b.column("gid"),
                "dst_id": b.column("gid_d"),
                "weight": b.column("weight"),
            }
        )
        # LinkGraph.build drops self-loops; exclude them BEFORE the
        # transition normalization or their weight share leaks rank mass
        # (host graphs are self-loop-heavy: intra-host page links)
        return t.filter(pc.invert(pc.equal(t.column("src_id"), t.column("dst_id"))))

    edges = withd.map_batches(to_ids, batch_format="pyarrow")

    # row-normalize: src's edges co-group in one bucketed exchange
    def nbkt(batch: pa.Table) -> pa.Table:
        src = batch.column("src_id").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "nbkt", pa.array(partition_of(src, buckets), pa.int32())
        )

    def normalize(g: "pd.DataFrame") -> "pd.DataFrame":
        sw = g.groupby("src_id")["weight"].transform("sum")
        out = g[["src_id", "dst_id"]].copy()
        out["weight"] = g["weight"].to_numpy() / sw.to_numpy()
        return out

    tedges = (
        edges.map_batches(nbkt, batch_format="pyarrow")
        .groupby("nbkt")
        .map_groups(normalize, batch_format="pandas")
    )

    hgraph = LinkGraph.build(
        tedges, os.path.join(workdir, "host-graph"), P=P, weight_col="weight"
    )
    res = run_bsp(
        hgraph,
        WeightedPageRank(
            hgraph.n_vertices, alpha=alpha, tol=tol, max_rounds=max_rounds
        ),
        os.path.join(workdir, "host-wpr"),
        max_rounds=max_rounds,
    )
    ranks = res.state_pandas()[["oid", "rank"]]
    hm = hmap.to_pandas()  # O(hosts), bounded by construction
    out = ranks.merge(hm.rename(columns={"gid": "oid", "url": "host"}), on="oid")
    return out[["host", "rank"]].sort_values("host").reset_index(drop=True)
