"""Graphs derived from the driver's TPC-H-ish testdata tables.

Two deterministic edge tables give the correctness gate a graph whose
oracle is plain SQL over the same parquet views:

- CP (directed, bipartite): customer -> part, an edge when the customer
  ordered the part.  src = o_custkey, dst = 10_000_000 + l_partkey.
  SQL: SELECT DISTINCT o_custkey, 10000000 + l_partkey
       FROM orders JOIN lineitem ON o_orderkey = l_orderkey.
- PP (undirected): part -- part, an edge when two parts co-occur in one
  order (this one has triangles). u < v canonical direction.

The orders-lineitem join is a partitioned bucket join (one shuffle on
hash(orderkey)); nothing is collected on the driver or broadcast.

Built graphs are cached under a content-keyed directory so repeated
queries()/bench calls reuse the artifacts.
"""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from raylinkgraph.functions.hashing import partition_of
from raylinkgraph.stages.graph_build import LinkGraph

PART_OFFSET = 10_000_000
CACHE_ROOT = "/tmp/raylinkgraph_cache"


def cp_edges(sf_dir: str, *, buckets: int = 64) -> rd.Dataset:
    """customer -> part edge pairs (with duplicates; build() dedups).

    Partitioned bucket join on hash(orderkey) % buckets: both sides are
    tagged and shuffled ONCE; each group resolves lineitem rows against
    its own slice of orders with a searchsorted. Neither side is ever
    collected on the driver or broadcast, so the join holds when orders
    is itself web-scale (the reference's analogue is the hash-partitioned
    fragment loader, core/loader/arrow_fragment_loader.h:199-252)."""

    def tag_orders(batch: pa.Table) -> pa.Table:
        ok = batch.column("o_orderkey").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "k": pa.array(ok, pa.int64()),
                "val": batch.column("o_custkey"),
                "side": pa.array(np.zeros(len(ok), np.int8), pa.int8()),
                "bucket": pa.array(partition_of(ok, buckets), pa.int32()),
            }
        )

    def tag_lineitem(batch: pa.Table) -> pa.Table:
        lo = batch.column("l_orderkey").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "k": pa.array(lo, pa.int64()),
                "val": batch.column("l_partkey"),
                "side": pa.array(np.ones(len(lo), np.int8), pa.int8()),
                "bucket": pa.array(partition_of(lo, buckets), pa.int32()),
            }
        )

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    ).map_batches(tag_orders, batch_format="pyarrow")
    items = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).map_batches(tag_lineitem, batch_format="pyarrow")

    def join_group(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g["side"] == 0].sort_values("k")
        li = g[g["side"] == 1]
        okeys = o["k"].to_numpy(np.int64)
        ocust = o["val"].to_numpy(np.int64)
        pos = np.searchsorted(okeys, li["k"].to_numpy(np.int64))
        return pd.DataFrame(
            {
                "src_id": ocust[pos],
                "dst_id": li["val"].to_numpy(np.int64) + PART_OFFSET,
            }
        )

    return orders.union(items).groupby("bucket").map_groups(
        join_group, batch_format="pandas"
    )


def cpr_edges(sf_dir: str, *, buckets: int = 64) -> rd.Dataset:
    """Directed cyclic graph for SCC: customer -> part for every ordered
    part, PLUS part -> customer for RETURNED lines (l_returnflag = 'R').
    Same bucket join as cp_edges; returned lines emit the reverse pair."""

    def tag_orders(batch: pa.Table) -> pa.Table:
        ok = batch.column("o_orderkey").to_numpy(zero_copy_only=False)
        n = len(ok)
        return pa.table(
            {
                "k": pa.array(ok, pa.int64()),
                "val": batch.column("o_custkey"),
                "ret": pa.array(np.zeros(n, np.bool_), pa.bool_()),
                "side": pa.array(np.zeros(n, np.int8), pa.int8()),
                "bucket": pa.array(partition_of(ok, buckets), pa.int32()),
            }
        )

    def tag_lineitem(batch: pa.Table) -> pa.Table:
        lo = batch.column("l_orderkey").to_numpy(zero_copy_only=False)
        ret = pa.compute.equal(
            batch.column("l_returnflag"), "R"
        ).to_numpy(zero_copy_only=False)
        n = len(lo)
        return pa.table(
            {
                "k": pa.array(lo, pa.int64()),
                "val": batch.column("l_partkey"),
                "ret": pa.array(ret, pa.bool_()),
                "side": pa.array(np.ones(n, np.int8), pa.int8()),
                "bucket": pa.array(partition_of(lo, buckets), pa.int32()),
            }
        )

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    ).map_batches(tag_orders, batch_format="pyarrow")
    items = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_returnflag"],
    ).map_batches(tag_lineitem, batch_format="pyarrow")

    def join_group(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g["side"] == 0].sort_values("k")
        li = g[g["side"] == 1]
        okeys = o["k"].to_numpy(np.int64)
        ocust = o["val"].to_numpy(np.int64)
        pos = np.searchsorted(okeys, li["k"].to_numpy(np.int64))
        cust = ocust[pos]
        partv = li["val"].to_numpy(np.int64) + PART_OFFSET
        ret = li["ret"].to_numpy(np.bool_)
        return pd.DataFrame(
            {
                "src_id": np.concatenate([cust, partv[ret]]),
                "dst_id": np.concatenate([partv, cust[ret]]),
            }
        )

    return orders.union(items).groupby("bucket").map_groups(
        join_group, batch_format="pandas"
    )


def pp_weighted_edges(sf_dir: str, *, buckets: int = 64) -> rd.Dataset:
    """(u, v, weight) part co-order pairs, weight = number of orders the
    pair co-occurs in (aggregated via one pair-keyed groupby shuffle)."""
    pairs = pp_edges(sf_dir, buckets=buckets)

    def tag(batch: pa.Table) -> pa.Table:
        u = batch.column("src_id").to_numpy(zero_copy_only=False)
        return batch.append_column("wpid", pa.array(partition_of(u, buckets), pa.int32()))

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        out = (
            g.groupby(["src_id", "dst_id"], sort=True)
            .size()
            .reset_index(name="weight")
        )
        out["weight"] = out["weight"].astype(np.float64)
        return out

    return (
        pairs.map_batches(tag, batch_format="pyarrow")
        .groupby("wpid")
        .map_groups(agg, batch_format="pandas")
    )


def pp_transition_edges(sf_dir: str, *, buckets: int = 64) -> rd.Dataset:
    """Symmetric pp co-order edges with PRE-NORMALIZED transition weights
    t(u,v) = w(u,v) / Σ_x w(u,x) for WeightedPageRank: one extra bucketed
    groupby on hash(src) computes each vertex's total out-weight locally
    (src's edges are co-grouped) and divides in place — the classic
    "row-normalize the adjacency matrix" preprocessing, done as a
    streaming exchange instead of a matrix pass. Weights w are integer
    co-order counts, so t is one exact double division per edge and the
    DuckDB oracle reproduces it bit-for-bit (w/sw on the same ints)."""
    und = pp_weighted_edges(sf_dir, buckets=buckets)

    def both_dirs(batch: pa.Table) -> pa.Table:
        u = batch.column("src_id").to_numpy(zero_copy_only=False)
        v = batch.column("dst_id").to_numpy(zero_copy_only=False)
        w = batch.column("weight").to_numpy(zero_copy_only=False)
        src = np.concatenate([u, v])
        return pa.table(
            {
                "src_id": pa.array(src, pa.int64()),
                "dst_id": pa.array(np.concatenate([v, u]), pa.int64()),
                "weight": pa.array(np.concatenate([w, w]), pa.float64()),
                "nbkt": pa.array(partition_of(src, buckets), pa.int32()),
            }
        )

    def normalize(g: pd.DataFrame) -> pd.DataFrame:
        sw = g.groupby("src_id")["weight"].transform("sum")
        out = g[["src_id", "dst_id"]].copy()
        out["weight"] = g["weight"].to_numpy() / sw.to_numpy()
        return out

    return (
        und.map_batches(both_dirs, batch_format="pyarrow")
        .groupby("nbkt")
        .map_groups(normalize, batch_format="pandas")
    )


def pp_edges(sf_dir: str, *, buckets: int = 64) -> rd.Dataset:
    """part -- part co-order pairs (u < v), deduplicated downstream.

    One groupby on hash(l_orderkey) % buckets; pair expansion is the same
    vectorized segment-pair kernel as the triangle wedge stage, run over
    ~|orders|/buckets orders per group."""

    def tag(batch: pa.Table) -> pa.Table:
        lo = batch.column("l_orderkey").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "l_orderkey": pa.array(lo, pa.int64()),
                "l_partkey": batch.column("l_partkey"),
                "bucket": pa.array(partition_of(lo, buckets), pa.int32()),
            }
        )

    def expand(g: pd.DataFrame) -> pd.DataFrame:
        ok = g["l_orderkey"].to_numpy(np.int64)
        pk = g["l_partkey"].to_numpy(np.int64)
        order = np.lexsort((pk, ok))
        ok, pk = ok[order], pk[order]
        is_new = np.r_[True, np.diff(ok) != 0]
        starts = np.flatnonzero(is_new)
        seg_of = np.cumsum(is_new) - 1
        seg_len = np.diff(np.r_[starts, len(ok)])
        idx = np.arange(len(ok)) - starts[seg_of]
        n_partners = seg_len[seg_of] - idx - 1
        total = int(n_partners.sum())
        if total == 0:
            return pd.DataFrame(
                {"src_id": pd.Series([], dtype=np.int64),
                 "dst_id": pd.Series([], dtype=np.int64)}
            )
        first = np.repeat(np.arange(len(ok)), n_partners)
        base = np.repeat(np.cumsum(n_partners) - n_partners, n_partners)
        off = np.arange(total) - base + 1
        second = first + off
        a, b = pk[first], pk[second]
        u, v = np.minimum(a, b), np.maximum(a, b)
        keep = u != v
        return pd.DataFrame({"src_id": u[keep], "dst_id": v[keep]})

    return (
        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
        )
        .map_batches(tag, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(expand, batch_format="pandas")
    )


def tpch_property_graph(sf_dir: str):
    """Multi-label PropertyGraph over the driver's TPC-H-ish tables — the
    labeled analogue of the reference's twitter multi-label fixtures
    (python/graphscope/tests/unittest/conftest.py:150-360, graph.py:80-97).

    Vertex labels (sorted order fixes the gid layout):
      customer (idx 0) | nation (idx 1) | region (idx 2) | supplier (idx 3)
    Edge labels (each source table IS the edge table; endpoints are the
    labels' local keys):
      cust_nation:   customer.(c_custkey -> c_nationkey)
      nation_region: nation.(n_nationkey -> n_regionkey)
      supp_nation:   supplier.(s_suppkey -> s_nationkey)

    gid = local_key + label_index * 2^40, reproducible verbatim in the
    DuckDB oracles (``c_custkey + 0``, ``n_nationkey + 1099511627776``,
    ...). Reads are column-pruned to the key pairs.
    """
    from raylinkgraph.pipelines.property_graph import PropertyGraph

    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    supp = rd.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    nat = rd.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_regionkey"]
    )
    reg = rd.read_parquet(f"{sf_dir}/region.parquet", columns=["r_regionkey"])
    pg = (
        PropertyGraph()
        .add_vertices("customer", cust, "c_custkey")
        .add_vertices("nation", nat, "n_nationkey")
        .add_vertices("region", reg, "r_regionkey")
        .add_vertices("supplier", supp, "s_suppkey")
        .add_edges(
            "cust_nation", cust, "c_custkey", "c_nationkey",
            src_label="customer", dst_label="nation",
        )
        .add_edges(
            "nation_region", nat, "n_nationkey", "n_regionkey",
            src_label="nation", dst_label="region",
        )
        .add_edges(
            "supp_nation", supp, "s_suppkey", "s_nationkey",
            src_label="supplier", dst_label="nation",
        )
    )
    return pg


def tpch_property_graph_str(sf_dir: str):
    """String-OID labeled graph over the same tables — vertex keys are the
    NAME columns (reference oids may be std::string,
    python/graphscope/framework/utils.py:411-418; this is the labeled
    analogue of the page pipeline's url-keyed vertex map).

    Vertex labels (sorted order fixes the label indices):
      customer (c_name) | nation (n_name) | supplier (s_name)
    Edge labels (string endpoints resolved by joining the nation names
    onto the fact rows — nation is broadcast-sized):
      cust_nation: (c_name -> n_name)   supp_nation: (s_name -> n_name)
    """
    from raylinkgraph.functions.joins import hash_join
    from raylinkgraph.pipelines.property_graph import PropertyGraph

    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_name", "c_nationkey"]
    )
    supp = rd.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_name", "s_nationkey"]
    )
    nat = rd.read_parquet(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    cn = hash_join(cust, nat, on="c_nationkey", right_on="n_nationkey").select_columns(
        ["c_name", "n_name"]
    )
    sn = hash_join(supp, nat, on="s_nationkey", right_on="n_nationkey").select_columns(
        ["s_name", "n_name"]
    )
    return (
        PropertyGraph()
        .add_vertices("customer", cust, "c_name")
        .add_vertices("nation", nat, "n_name")
        .add_vertices("supplier", supp, "s_name")
        .add_edges(
            "cust_nation", cn, "c_name", "n_name",
            src_label="customer", dst_label="nation",
        )
        .add_edges(
            "supp_nation", sn, "s_name", "n_name",
            src_label="supplier", dst_label="nation",
        )
    )


_MEMO: dict[tuple[str, str], LinkGraph] = {}


def _content_sig(sf_dir: str) -> str:
    """Cheap content signature of the input tables (sizes + mtimes): folds
    into every cache tag so regenerated testdata at the same path never
    silently reuses stale graph artifacts."""
    parts = []
    for name in ("orders", "lineitem", "customer", "supplier", "nation", "region"):
        p = os.path.join(sf_dir, f"{name}.parquet")
        try:
            st = os.stat(p)
            parts.append(f"{name}:{st.st_size}:{int(st.st_mtime)}")
        except OSError:
            parts.append(f"{name}:absent")
    return hashlib.md5("|".join(parts).encode()).hexdigest()[:8]


def get_graph(sf_dir: str, kind: str, *, P: int = 16) -> LinkGraph:
    """Cached build of the CP / CP-undirected / PP graphs for ``sf_dir``."""
    key = (os.path.abspath(sf_dir), kind)
    if key in _MEMO:
        return _MEMO[key]
    tag = hashlib.md5(
        f"{key[0]}|{kind}|P{P}|v4|{_content_sig(sf_dir)}".encode()
    ).hexdigest()[:12]
    gdir = os.path.join(CACHE_ROOT, f"{kind}-{tag}")
    if os.path.exists(os.path.join(gdir, "meta.json")):
        g = LinkGraph(gdir)
    else:
        if kind == "cp":
            g = LinkGraph.build(cp_edges(sf_dir), gdir, P=P, symmetrize=False)
        elif kind == "cp_und":
            g = LinkGraph.build(cp_edges(sf_dir), gdir, P=P, symmetrize=True)
        elif kind == "pp":
            g = LinkGraph.build(pp_edges(sf_dir), gdir, P=P, symmetrize=True)
        elif kind == "ppw":
            g = LinkGraph.build(
                pp_weighted_edges(sf_dir), gdir, P=P, symmetrize=True,
                weight_col="weight",
            )
        elif kind == "ppt":
            g = LinkGraph.build(
                pp_transition_edges(sf_dir), gdir, P=P, symmetrize=False,
                weight_col="weight",
            )
        elif kind == "pps":
            # induced pp subgraph on partkey < 500 — a bounded-size input
            # for expensive multi-level queries (driver-side louvain)
            def small(batch: pa.Table) -> pa.Table:
                s = batch.column("src_id").to_numpy(zero_copy_only=False)
                d = batch.column("dst_id").to_numpy(zero_copy_only=False)
                keep = (s < 500) & (d < 500)
                return batch.filter(pa.array(keep))

            g = LinkGraph.build(
                pp_edges(sf_dir).map_batches(small, batch_format="pyarrow"),
                gdir, P=P, symmetrize=True,
            )
        elif kind == "ppsw":
            # weighted induced pp subgraph (partkey < 500): bounded input
            # for multi-phase ops (msf)
            def small_w(batch: pa.Table) -> pa.Table:
                s = batch.column("src_id").to_numpy(zero_copy_only=False)
                d = batch.column("dst_id").to_numpy(zero_copy_only=False)
                return batch.filter(pa.array((s < 500) & (d < 500)))

            g = LinkGraph.build(
                pp_weighted_edges(sf_dir).map_batches(
                    small_w, batch_format="pyarrow"
                ),
                gdir, P=P, symmetrize=True, weight_col="weight",
            )
        elif kind == "ppx":
            # deterministic hash-thinned pp subgraph (~2% of edges):
            # sparse enough that biconnectivity structure (bridges,
            # articulation points, multiple components) actually exists.
            # The filter is canonical in (min, max) so it commutes with
            # symmetrization and is reproducible in plain SQL.
            def thin(batch: pa.Table) -> pa.Table:
                s = batch.column("src_id").to_numpy(zero_copy_only=False)
                d = batch.column("dst_id").to_numpy(zero_copy_only=False)
                u = np.minimum(s, d)
                v = np.maximum(s, d)
                keep = (u * 2654435761 + v * 40503) % 100 < 2
                return batch.filter(pa.array(keep))

            g = LinkGraph.build(
                pp_edges(sf_dir).map_batches(thin, batch_format="pyarrow"),
                gdir, P=P, symmetrize=True,
            )
        elif kind == "cpw_und":
            # weighted bipartite: weight = lineitem rows per (cust, part),
            # symmetrized for alternating u2i / i2u propagation
            def add_w(batch: pa.Table) -> pa.Table:
                return batch.append_column(
                    "weight", pa.array(np.ones(batch.num_rows), pa.float64())
                )

            g = LinkGraph.build(
                cp_edges(sf_dir).map_batches(add_w, batch_format="pyarrow"),
                gdir, P=P, symmetrize=True,
                weight_col="weight", dedup_weight="sum",
            )
        elif kind == "cpr_flag":
            from raylinkgraph.algos.hits import augment_edges_ds

            g = LinkGraph.build(
                augment_edges_ds(cpr_edges(sf_dir)), gdir, P=P,
                symmetrize=False, weight_col="flag", dedup_weight="or",
            )
        elif kind == "pg":
            # label-projected simple view of the multi-label property
            # graph (members -> nation -> region, directed)
            g = tpch_property_graph(sf_dir).to_simple(gdir, P=P, symmetrize=False)
        elif kind == "pg_und":
            g = tpch_property_graph(sf_dir).to_simple(gdir, P=P, symmetrize=True)
        elif kind == "pgs":
            g = tpch_property_graph_str(sf_dir).to_simple(gdir, P=P, symmetrize=False)
        elif kind == "pgs_und":
            g = tpch_property_graph_str(sf_dir).to_simple(gdir, P=P, symmetrize=True)
        else:
            raise ValueError(kind)
    _MEMO[key] = g
    return g


def workdir_for(sf_dir: str, name: str) -> str:
    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    return os.path.join(CACHE_ROOT, f"work-{name}-{tag}")
