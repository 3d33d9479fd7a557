"""Graph management / report operators (SURVEY.md §2.1).

The reference's client-visible ops (python/graphscope/framework/
dag_utils.py; point queries core/fragment/fragment_reporter.h:69-208)
expressed over the LinkGraph artifacts: counts, degree tables, neighbor
queries, induced subgraphs, result-column joins, degree centrality.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from raylinkgraph.functions.hashing import check_u32, partition_of
from raylinkgraph.stages.graph_build import LinkGraph


def node_num(graph: LinkGraph) -> int:
    """REPORT_GRAPH NODE_NUM (fragment_reporter.h:69)."""
    return graph.n_vertices


def edge_num(graph: LinkGraph) -> int:
    return graph.n_edges


def vertices_ds(graph: LinkGraph) -> rd.Dataset:
    """(oid, out_deg) for every vertex."""
    return rd.read_parquet(os.path.join(graph.graph_dir, "vertexstate"))


def out_degrees(graph: LinkGraph) -> rd.Dataset:
    return vertices_ds(graph)


def in_degrees(graph: LinkGraph) -> rd.Dataset:
    """(oid, in_deg) via one pre-combined groupby shuffle on hash(dst)."""
    P = graph.P

    def partial(batch: pa.Table) -> pa.Table:
        dst = batch.column("dst_id").to_numpy(zero_copy_only=False)
        u, c = np.unique(dst, return_counts=True)
        return pa.table(
            {
                "oid": pa.array(u, pa.int64()),
                "cnt": pa.array(c.astype(np.int64), pa.int64()),
                "pid": pa.array(partition_of(u, P), pa.int32()),
            }
        )

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        pid = int(g["pid"].iloc[0])
        g = g[g["oid"] >= 0]  # marker rows use oid=-1 (oids are non-negative)
        vs = pq.read_table(graph.vertexstate_path(pid), columns=["oid"])
        oids = vs.column("oid").to_numpy(zero_copy_only=False)
        agg = g.groupby("oid")["cnt"].sum()
        out = np.zeros(len(oids), np.int64)
        out[np.searchsorted(oids, agg.index.to_numpy(np.int64))] = agg.to_numpy(np.int64)
        return pd.DataFrame({"oid": oids, "in_deg": out})

    markers = rd.range(P, override_num_blocks=max(1, P // 8)).map_batches(
        lambda b: pa.table(
            {
                "oid": pa.array(np.full(len(b), -1), pa.int64()),
                "cnt": pa.array(np.zeros(len(b), np.int64)),
                "pid": pa.array(
                    b.column("id").to_numpy(zero_copy_only=False).astype(np.int32),
                    pa.int32(),
                ),
            }
        ),
        batch_format="pyarrow",
    )
    return (
        graph.edges_ds()
        .map_batches(partial, batch_format="pyarrow")
        .union(markers)
        .groupby("pid")
        .map_groups(reduce, batch_format="pandas")
    )


def degree_centrality(graph: LinkGraph) -> rd.Dataset:
    """deg / (n-1), reference apps/centrality/degree/degree_centrality.h:25."""
    n = graph.n_vertices

    def f(batch: pa.Table) -> pa.Table:
        deg = batch.column("out_deg").to_numpy(zero_copy_only=False)
        c = deg / max(1, n - 1)
        return pa.table(
            {"oid": batch.column("oid"), "centrality": pa.array(c, pa.float64())}
        )

    return vertices_ds(graph).map_batches(f, batch_format="pyarrow")


def degree_assortativity(graph: LinkGraph) -> float:
    """Pearson r of (deg(src), deg(dst)) over the (symmetrized) edge list.

    The reference gathers a global degree-mixing matrix at worker 0
    (apps/assortativity/degree_assortativity_coefficient.h:36,
    attribute_assortativity.h:169); here each partition emits the five
    moment partials (n, Sx, Sy, Sxx, Syy, Sxy) — a pre-aggregated
    all-reduce instead of a matrix gather."""
    P = graph.P

    def tag(batch: pa.Table) -> pa.Table:
        dst = batch.column("dst_id").to_numpy(zero_copy_only=False)
        return batch.append_column("dpid", pa.array(partition_of(dst, P), pa.int32()))

    def attach_dst_deg(g: pd.DataFrame) -> pd.DataFrame:
        pid = int(g["dpid"].iloc[0])
        vs = pq.read_table(graph.vertexstate_path(pid))
        oids = vs.column("oid").to_numpy(zero_copy_only=False)
        deg = vs.column("out_deg").to_numpy(zero_copy_only=False)
        g = g[["src_id", "dst_id"]].copy()
        g["deg_dst"] = deg[np.searchsorted(oids, g["dst_id"].to_numpy(np.int64))]
        return g

    def tag_src(batch: pa.Table) -> pa.Table:
        src = batch.column("src_id").to_numpy(zero_copy_only=False)
        return batch.append_column("spid", pa.array(partition_of(src, P), pa.int32()))

    def moments(g: pd.DataFrame) -> pd.DataFrame:
        pid = int(g["spid"].iloc[0])
        vs = pq.read_table(graph.vertexstate_path(pid))
        oids = vs.column("oid").to_numpy(zero_copy_only=False)
        deg = vs.column("out_deg").to_numpy(zero_copy_only=False)
        x = deg[np.searchsorted(oids, g["src_id"].to_numpy(np.int64))].astype(np.float64)
        y = g["deg_dst"].to_numpy(np.float64)
        return pd.DataFrame(
            {
                "n": [float(len(x))], "sx": [x.sum()], "sy": [y.sum()],
                "sxx": [(x * x).sum()], "syy": [(y * y).sum()], "sxy": [(x * y).sum()],
            }
        )

    m = (
        graph.edges_ds()
        .map_batches(tag, batch_format="pyarrow")
        .groupby("dpid")
        .map_groups(attach_dst_deg, batch_format="pandas")
        .map_batches(tag_src, batch_format="pyarrow")
        .groupby("spid")
        .map_groups(moments, batch_format="pandas")
    ).to_pandas().sum()
    n, sx, sy, sxx, syy, sxy = m["n"], m["sx"], m["sy"], m["sxx"], m["syy"], m["sxy"]
    cov = sxy / n - (sx / n) * (sy / n)
    vx = sxx / n - (sx / n) ** 2
    vy = syy / n - (sy / n) ** 2
    denom = np.sqrt(vx * vy)
    return float(cov / denom) if denom else 0.0


def average_degree_connectivity(graph: LinkGraph) -> pd.DataFrame:
    """Per degree value k: mean degree of the neighbors of degree-k
    vertices (reference average_degree_connectivity, .gs_conf.yaml:254).
    Same two-shuffle deg-attach as degree_assortativity, reduced to
    per-k (sum, count) partials -> tiny driver-side divide."""
    P = graph.P

    def attach_deg(g: pd.DataFrame, col: str) -> np.ndarray:
        pid = int(g["pid"].iloc[0])
        vs = pq.read_table(graph.vertexstate_path(pid))
        oids = vs.column("oid").to_numpy(zero_copy_only=False)
        deg = vs.column("out_deg").to_numpy(zero_copy_only=False)
        return deg[np.searchsorted(oids, g[col].to_numpy(np.int64))]

    def tag_dst(batch: pa.Table) -> pa.Table:
        dst = batch.column("dst_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "src_id": batch.column("src_id"),
                "dst_id": batch.column("dst_id"),
                "pid": pa.array(partition_of(dst, P), pa.int32()),
            }
        )

    def step1(g: pd.DataFrame) -> pd.DataFrame:
        dd = attach_deg(g, "dst_id")
        out = g[["src_id"]].copy()
        out["deg_dst"] = dd
        src = out["src_id"].to_numpy(np.int64)
        out["pid"] = partition_of(src, P)
        return out

    def step2(g: pd.DataFrame) -> pd.DataFrame:
        ds = attach_deg(g, "src_id")
        t = pd.DataFrame({"k": ds, "s": g["deg_dst"].to_numpy(np.float64)})
        agg = t.groupby("k")["s"].agg(["sum", "count"]).reset_index()
        return pd.DataFrame(
            {"k": agg["k"].astype(np.int64), "s": agg["sum"].astype(np.float64),
             "c": agg["count"].astype(np.int64)}
        )

    parts = (
        graph.edges_ds()
        .map_batches(tag_dst, batch_format="pyarrow")
        .groupby("pid")
        .map_groups(step1, batch_format="pandas")
        .groupby("pid")
        .map_groups(step2, batch_format="pandas")
    ).to_pandas()
    agg = parts.groupby("k").agg(s=("s", "sum"), c=("c", "sum")).reset_index()
    agg["avg_nbr_deg"] = agg["s"] / agg["c"]
    return agg[["k", "avg_nbr_deg"]].sort_values("k").reset_index(drop=True)


def attribute_mixing_matrix(
    graph: LinkGraph, attr_parquet: str, key_col: str, attr_col: str,
    *, buckets: int = 32,
) -> pd.DataFrame:
    """Edge counts per (attr(src), attr(dst)) — the reference's global
    mixing-matrix gather (apps/assortativity/attribute_assortativity.h:169)
    as two bucket joins + a tiny (|categories|^2) driver collect."""
    attrs = rd.read_parquet(attr_parquet, columns=[key_col, attr_col])

    def tag_attr(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "k": b[key_col].to_numpy(np.int64),
                "a": b[attr_col].astype(str),
                "src_id": np.full(len(b), -1, np.int64),
                "side": np.int8(1),
                "bucket": partition_of(b[key_col].to_numpy(np.int64), buckets),
            }
        )

    def tag_edges_dst(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "k": b["dst_id"].to_numpy(np.int64),
                "a": "",
                "src_id": b["src_id"].to_numpy(np.int64),
                "side": np.int8(0),
                "bucket": partition_of(b["dst_id"].to_numpy(np.int64), buckets),
            }
        )

    def join1(g: pd.DataFrame) -> pd.DataFrame:
        lut = g[g["side"] == 1].sort_values("k")
        d = g[g["side"] == 0]
        keys = lut["k"].to_numpy(np.int64)
        vals = lut["a"].to_numpy()
        pos = np.searchsorted(keys, d["k"].to_numpy(np.int64))
        return pd.DataFrame(
            {
                "k": d["src_id"].to_numpy(np.int64),
                "a": "",
                "a_dst": vals[pos],
                "side": np.int8(0),
                "bucket": partition_of(d["src_id"].to_numpy(np.int64), buckets),
            }
        )

    def tag_attr2(b: pd.DataFrame) -> pd.DataFrame:
        out = tag_attr(b)
        out["a_dst"] = ""
        return out[["k", "a", "a_dst", "side", "bucket"]]

    def join2(g: pd.DataFrame) -> pd.DataFrame:
        lut = g[g["side"] == 1].sort_values("k")
        d = g[g["side"] == 0]
        keys = lut["k"].to_numpy(np.int64)
        vals = lut["a"].to_numpy()
        pos = np.searchsorted(keys, d["k"].to_numpy(np.int64))
        t = pd.DataFrame({"a_src": vals[pos], "a_dst": d["a_dst"].to_numpy()})
        agg = t.groupby(["a_src", "a_dst"]).size().reset_index(name="n")
        agg["n"] = agg["n"].astype(np.int64)
        return agg

    e1 = (
        graph.edges_ds()
        .map_batches(tag_edges_dst, batch_format="pandas")
        .union(attrs.map_batches(tag_attr, batch_format="pandas"))
        .groupby("bucket")
        .map_groups(join1, batch_format="pandas")
    )
    counts = (
        e1.union(attrs.map_batches(tag_attr2, batch_format="pandas"))
        .groupby("bucket")
        .map_groups(join2, batch_format="pandas")
    ).to_pandas()
    return (
        counts.groupby(["a_src", "a_dst"])["n"].sum().reset_index()
        .sort_values(["a_src", "a_dst"]).reset_index(drop=True)
    )


def attribute_assortativity(mix: pd.DataFrame) -> float:
    """r = (tr(e) - sum_i a_i b_i) / (1 - sum_i a_i b_i) over the
    normalized mixing matrix (categorical assortativity)."""
    total = float(mix["n"].sum())
    e_ii = float(mix.loc[mix["a_src"] == mix["a_dst"], "n"].sum()) / total
    a = mix.groupby("a_src")["n"].sum() / total
    b = mix.groupby("a_dst")["n"].sum() / total
    ab = float((a * b).fillna(0.0).sum())
    return (e_ii - ab) / (1.0 - ab) if ab < 1.0 else 1.0


def edge_boundary(graph: LinkGraph, in_set) -> rd.Dataset:
    """Edges from S to V\\S (reference apps/boundary/edge_boundary.h:31).
    ``in_set``: vectorized predicate oid-array -> bool-array."""

    def f(batch: pa.Table) -> pa.Table:
        src = batch.column("src_id").to_numpy(zero_copy_only=False)
        dst = batch.column("dst_id").to_numpy(zero_copy_only=False)
        m = in_set(src) & ~in_set(dst)
        return batch.filter(pa.array(m))

    return graph.edges_ds().map_batches(f, batch_format="pyarrow")


def node_boundary(graph: LinkGraph, in_set) -> rd.Dataset:
    """{v not in S : exists u in S with (u,v) in E} (node_boundary.h:30):
    filter + per-batch unique + one dedup shuffle on hash(v)."""
    P = graph.P

    def f(batch: pa.Table) -> pa.Table:
        src = batch.column("src_id").to_numpy(zero_copy_only=False)
        dst = batch.column("dst_id").to_numpy(zero_copy_only=False)
        v = np.unique(dst[in_set(src) & ~in_set(dst)])
        return pa.table(
            {"oid": pa.array(v, pa.int64()),
             "pid": pa.array(partition_of(v, P), pa.int32())}
        )

    def dedup(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"oid": np.unique(g["oid"].to_numpy(np.int64))})

    return (
        graph.edges_ds()
        .map_batches(f, batch_format="pyarrow")
        .groupby("pid")
        .map_groups(dedup, batch_format="pandas")
    )


def has_node(graph: LinkGraph, oid: int) -> bool:
    """Point query against the home partition only (no full scan)."""
    pid = int(partition_of(np.array([oid], np.int64), graph.P)[0])
    t = pq.read_table(graph.vertexstate_path(pid), columns=["oid"])
    oids = t.column("oid").to_numpy(zero_copy_only=False)
    i = np.searchsorted(oids, oid)
    return bool(i < len(oids) and oids[i] == oid)


def successors(graph: LinkGraph, oid: int) -> np.ndarray:
    """SUCCS_BY_NODE: read only the home partition's edge file."""
    pid = int(partition_of(np.array([oid], np.int64), graph.P)[0])
    t = pq.read_table(
        os.path.join(graph.graph_dir, "edges", f"edges-{pid:05d}.parquet")
    )
    src = t.column("src_id").to_numpy(zero_copy_only=False)
    dst = t.column("dst_id").to_numpy(zero_copy_only=False)
    lo, hi = np.searchsorted(src, [oid, oid + 1])  # edge files are src-sorted
    return dst[lo:hi]


def predecessors(graph: LinkGraph, oid: int) -> np.ndarray:
    """PREDS_BY_NODE (fragment_reporter.h:69-208): in-neighbors of oid.

    Unlike successors() this cannot read a single partition (edges are
    src-partitioned), so it is a distributed column-pruned scan with a
    vectorized filter — the same shape the reference uses for reverse
    lookups on kOnlyOut-loaded graphs."""

    def f(batch: pa.Table) -> pa.Table:
        m = pa.compute.equal(batch.column("dst_id"), oid)
        return batch.filter(m).select(["src_id"])

    out = graph.edges_ds().map_batches(f, batch_format="pyarrow").to_pandas()
    return np.sort(out["src_id"].to_numpy(np.int64))


def subgraph_edges(graph: LinkGraph, keep_oids: set[int] | np.ndarray) -> rd.Dataset:
    """Induced-subgraph edge table (CREATE_SUBGRAPH, dag_utils.py:709):
    broadcast the (small) vertex set, filter inside map_batches."""
    import ray

    keep = np.asarray(sorted(keep_oids), np.int64)
    ref = ray.put(keep)

    def f(batch: pa.Table) -> pa.Table:
        k = ray.get(ref)
        src = batch.column("src_id").to_numpy(zero_copy_only=False)
        dst = batch.column("dst_id").to_numpy(zero_copy_only=False)
        si = np.searchsorted(k, src)
        di = np.searchsorted(k, dst)
        m = (
            (si < len(k)) & (di < len(k))
            & (k[np.minimum(si, len(k) - 1)] == src)
            & (k[np.minimum(di, len(k) - 1)] == dst)
        )
        return batch.filter(pa.array(m))

    return graph.edges_ds().map_batches(f, batch_format="pyarrow")


def add_column(
    vertex_table: rd.Dataset,
    result: rd.Dataset,
    on: str = "oid",
    *,
    broadcast_limit: int = 2_000_000,
    buckets: int = 64,
) -> rd.Dataset:
    """ADD_COLUMN (dag_utils.py:973): join an algorithm's (oid, value)
    result onto a vertex table.

    An algorithm result is O(V), not a small side: below
    ``broadcast_limit`` rows it is broadcast ONCE via ray.put (sorted-key
    searchsorted lookup); above it the join is a partitioned bucket join
    on hash(key) — the same split attach_gids uses
    (stages/vertex_map.py:54-112). Missing keys get NaN for float result
    columns (int columns must be fully keyed)."""
    import ray

    if result.count() > broadcast_limit:
        return _add_column_partitioned(vertex_table, result, on, buckets)

    res = result.to_pandas().sort_values(on)
    keys = res[on].to_numpy(np.int64)
    cols = {c: res[c].to_numpy() for c in res.columns if c != on}
    ref = ray.put((keys, cols))

    def f(batch: pa.Table) -> pa.Table:
        k, cs = ray.get(ref)
        oid = batch.column(on).to_numpy(zero_copy_only=False)
        pos = np.searchsorted(k, oid)
        pos = np.minimum(pos, len(k) - 1)
        hit = k[pos] == oid
        out = batch
        for name, arr in cs.items():
            vals = arr[pos]
            if np.issubdtype(arr.dtype, np.floating):
                vals = np.where(hit, vals, np.nan)
            out = out.append_column(name, pa.array(vals))
        return out

    return vertex_table.map_batches(f, batch_format="pyarrow")


def _add_column_partitioned(
    vertex_table: rd.Dataset, result: rd.Dataset, on: str, buckets: int
) -> rd.Dataset:
    """Scale path: ONE bucket-join shuffle on hash(on). Both sides are
    tagged and grouped; each group resolves its vertex rows against its
    slice of the result with a sorted-key searchsorted (nothing is
    collected on the driver or broadcast)."""
    left_schema = vertex_table.schema()
    left_cols = list(left_schema.names)
    res_cols = [c for c in result.schema().names if c != on]
    res_types = {
        c: result.schema().field(c).type for c in res_cols
    }

    def tag_left(batch: pa.Table) -> pa.Table:
        key = batch.column(on).to_numpy(zero_copy_only=False)
        cols = {c: batch.column(c) for c in left_cols}
        for c in res_cols:
            cols[c] = pa.nulls(batch.num_rows, res_types[c])
        cols["__b"] = pa.array(partition_of(key, buckets), pa.int32())
        cols["__side"] = pa.array(np.zeros(batch.num_rows, np.int8), pa.int8())
        return pa.table(cols)

    def tag_res(batch: pa.Table) -> pa.Table:
        key = batch.column(on).to_numpy(zero_copy_only=False)
        cols = {
            c: (batch.column(on) if c == on
                else pa.nulls(batch.num_rows, left_schema.field(c).type))
            for c in left_cols
        }
        for c in res_cols:
            cols[c] = batch.column(c)
        cols["__b"] = pa.array(partition_of(key, buckets), pa.int32())
        cols["__side"] = pa.array(np.ones(batch.num_rows, np.int8), pa.int8())
        return pa.table(cols)

    def join(g: pd.DataFrame) -> pd.DataFrame:
        r = g[g["__side"] == 1].sort_values(on)
        rows = g[g["__side"] == 0]
        keys = r[on].to_numpy(np.int64)
        k = rows[on].to_numpy(np.int64)
        pos = np.searchsorted(keys, k)
        pos_c = np.minimum(pos, max(len(keys) - 1, 0))
        hit = (keys[pos_c] == k) if len(keys) else np.zeros(len(k), np.bool_)
        out = rows[left_cols].copy()
        for c in res_cols:
            vals = r[c].to_numpy()[pos_c] if len(keys) else np.full(len(k), np.nan)
            if np.issubdtype(np.asarray(vals).dtype, np.floating):
                vals = np.where(hit, vals, np.nan)
            out[c] = vals
        return out

    return (
        vertex_table.map_batches(tag_left, batch_format="pyarrow")
        .union(result.map_batches(tag_res, batch_format="pyarrow"))
        .groupby("__b")
        .map_groups(join, batch_format="pandas")
    )


def top_common_neighbor_pairs(
    edges: rd.Dataset,
    *,
    k: int = 20,
    src_col: str = "src_id",
    dst_col: str = "dst_id",
    buckets: int = 32,
) -> pd.DataFrame:
    """Link prediction by common-neighbor counts: the top-k unordered
    source pairs (a < b) sharing the most centers (dst) -> (a, b, n).

    Two bucketed shuffles, both of ``buckets`` groups — NEVER a raw
    groupby over a high-cardinality key (Ray Data's groupby dispatch
    loops Python-per-group in reduce; ~1M distinct keys = minutes):
    (1) hash(dst) co-locates every center's sources; each bucket runs a
    vectorized sorted-run expansion emitting its C(deg, 2) encoded
    pairs ALREADY pre-combined (np.unique counts — the combiner);
    (2) hash(pair) co-locates each distinct pair's partial counts; each
    bucket folds them with np.bincount and keeps only its LOCAL top-k
    (a pair lives in exactly one bucket, so the global top-k is a
    subset of the B*k survivors), which the driver merges. Ties at the
    cutoff break on (a, b), so the result is total-ordered and
    oracle-exact.

    Scale note: pair volume is sum(deg^2) over centers — a hub center
    explodes it; cap or rank-orient hubs first (rectangle_count shows
    the (deg, id) orientation) before running on power-law graphs.
    """
    out = top_link_pred_pairs(
        edges, method="cn", k=k, src_col=src_col, dst_col=dst_col,
        buckets=buckets,
    )
    return out.rename(columns={"score_e6": "n"}).assign(
        n=lambda t: t["n"] // 1_000_000
    )


def top_link_pred_pairs(
    edges: rd.Dataset,
    *,
    method: str = "adamic_adar",
    k: int = 20,
    src_col: str = "src_id",
    dst_col: str = "dst_id",
    buckets: int = 32,
) -> pd.DataFrame:
    """Neighborhood link prediction: top-k unordered source pairs (a < b)
    by summed per-center weight -> (a, b, score_e6).

    Methods (weight each shared center c contributes to its pairs):
      cn           1              (common-neighbor count)
      adamic_adar  1 / ln(deg c)  (Adamic & Adar 2003)
      ra           1 / deg c      (resource allocation, Zhou et al. 2009)
      jaccard      |Γa ∩ Γb| / |Γa ∪ Γb| — NOT a per-center weight; it
                   needs deg(a)/deg(b) and takes the _jaccard_pairs
                   path (two extra bucketed degree-attach shuffles).
    For the weighted methods deg(c) is LOCAL to c's hash bucket (every
    edge into c lands there), so no degree join is needed.

    Two bucketed shuffles, both of ``buckets`` groups — NEVER a raw
    groupby over a high-cardinality key (Ray Data's groupby dispatch
    loops Python-per-group in reduce; ~1M distinct keys = minutes):
    (1) hash(dst) co-locates every center's sources; each bucket runs a
    vectorized sorted-run expansion emitting its C(deg, 2) encoded
    pairs with per-bucket pre-summed weights (np.bincount — the
    combiner); (2) hash(pair) co-locates each distinct pair's partial
    sums; each bucket folds them, QUANTIZES the score to integer
    micro-units (so engine and SQL-oracle ties resolve identically),
    and keeps only its local top-k (a pair lives in exactly one bucket,
    so the global top-k is a subset of the B*k survivors), which the
    driver merges. Ties break on (a, b): total-ordered, oracle-exact.

    Portability note (advisor round-3): ``adamic_adar`` uses the
    platform libm ``log`` on both the engine (numpy) and oracle (DuckDB
    LN) sides. Like top_terms' division note, last-ulp libm divergence
    could in principle flip the floor(x*1e6+0.5) quantization at an
    exact .5 boundary on another platform; on this platform engine and
    oracle agree bit-exact (driver-verified). A cross-platform
    deployment should either share a small-integer-degree ln table or
    compare at 1e-6 tolerance instead of hash-exact.
    """
    if method == "jaccard":
        return _jaccard_pairs(
            edges, k=k, src_col=src_col, dst_col=dst_col, buckets=buckets
        )
    wfun = {
        "cn": lambda deg: np.ones(len(deg)),
        "adamic_adar": lambda deg: 1.0 / np.log(deg),
        "ra": lambda deg: 1.0 / deg,
    }[method]

    def bucket(b: pd.DataFrame) -> pd.DataFrame:
        # validate u32 BEFORE the (a << 32) | b pair packing downstream
        return pd.DataFrame(
            {
                "s": check_u32(b[src_col].to_numpy(np.int64)),
                "d": check_u32(b[dst_col].to_numpy(np.int64)),
                "__b": partition_of(b[dst_col].to_numpy(np.int64), buckets),
            }
        )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        # sort once; per-center slices expand to upper-triangle pairs
        g = g.drop_duplicates(["d", "s"]).sort_values(["d", "s"])
        d = g["d"].to_numpy(np.int64)
        s = g["s"].to_numpy(np.int64)
        starts = np.flatnonzero(np.r_[True, d[1:] != d[:-1]])
        ends = np.r_[starts[1:], len(d)]
        degs = (ends - starts).astype(np.float64)
        # deg-1 centers emit no pairs (the m < 2 skip below) — mask them
        # out of wfun so adamic_adar's 1/ln(1) doesn't emit a divide
        # warning for a value that is never used (advisor round-3)
        weights = np.zeros_like(degs)
        multi = degs >= 2
        weights[multi] = wfun(degs[multi])
        chunks, wchunks = [], []
        for lo, hi, w in zip(starts, ends, weights):
            m = hi - lo
            if m < 2:
                continue
            iu = np.triu_indices(m, 1)
            sv = s[lo:hi]
            chunks.append((sv[iu[0]] << np.int64(32)) | sv[iu[1]])
            wchunks.append(np.full(len(iu[0]), w))
        if not chunks:
            return pd.DataFrame({"pair": pd.Series([], dtype=np.int64),
                                 "w": pd.Series([], dtype=np.float64),
                                 "__p": pd.Series([], dtype=np.int32)})
        u, inv = np.unique(np.concatenate(chunks), return_inverse=True)
        wsum = np.bincount(inv, weights=np.concatenate(wchunks))
        return pd.DataFrame(
            {"pair": u, "w": wsum, "__p": partition_of(u, buckets)}
        )

    def fold_topk(g: pd.DataFrame) -> pd.DataFrame:
        u, inv = np.unique(g["pair"].to_numpy(np.int64), return_inverse=True)
        w = np.bincount(inv, weights=g["w"].to_numpy(np.float64))
        q = np.floor(w * 1e6 + 0.5).astype(np.int64)
        order = np.lexsort((u, -q))[:k]
        return pd.DataFrame({"pair": u[order], "score_e6": q[order]})

    top = (
        edges.map_batches(bucket, batch_format="pandas")
        .groupby("__b")
        .map_groups(pairs, batch_format="pandas")
        .groupby("__p")
        .map_groups(fold_topk, batch_format="pandas")
        .to_pandas()
    )
    order = np.lexsort((top["pair"].to_numpy(np.int64),
                        -top["score_e6"].to_numpy(np.int64)))[:k]
    top = top.iloc[order]
    enc = top["pair"].to_numpy(np.int64)
    return pd.DataFrame(
        {
            "a": enc >> np.int64(32),
            "b": enc & np.int64((1 << 32) - 1),
            "score_e6": top["score_e6"].to_numpy(np.int64),
        }
    )


def _jaccard_pairs(
    edges: rd.Dataset,
    *,
    k: int,
    src_col: str,
    dst_col: str,
    buckets: int,
) -> pd.DataFrame:
    """Jaccard-coefficient link prediction: top-k (a, b, score_e6) with
    score = cn / (deg a + deg b - cn), deg = distinct-center degree.

    Unlike the per-center-weighted methods, the denominator needs BOTH
    endpoints' degrees, so after the common-neighbor fold each pair row
    is routed twice more — hash(a) then hash(b) — through union +
    groupby bucket joins against the O(V) degree table (never collected
    or broadcast). Scores quantize to micro-units before the per-bucket
    top-k; every pair row is unique after the cn fold, so the global
    top-k is a subset of the per-bucket survivors.
    """
    LOW32 = np.int64((1 << 32) - 1)

    def bucket(b: pd.DataFrame) -> pd.DataFrame:
        # validate u32 BEFORE the (a << 32) | b pair packing downstream
        return pd.DataFrame(
            {
                "s": check_u32(b[src_col].to_numpy(np.int64)),
                "d": check_u32(b[dst_col].to_numpy(np.int64)),
                "__b": partition_of(b[dst_col].to_numpy(np.int64), buckets),
            }
        )

    def pair_partials(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["d", "s"]).sort_values(["d", "s"])
        d = g["d"].to_numpy(np.int64)
        s = g["s"].to_numpy(np.int64)
        starts = np.flatnonzero(np.r_[True, d[1:] != d[:-1]])
        ends = np.r_[starts[1:], len(d)]
        chunks = []
        for lo, hi in zip(starts, ends):
            if hi - lo < 2:
                continue
            iu = np.triu_indices(hi - lo, 1)
            sv = s[lo:hi]
            chunks.append((sv[iu[0]] << np.int64(32)) | sv[iu[1]])
        if not chunks:
            return pd.DataFrame({"pair": pd.Series([], dtype=np.int64),
                                 "n": pd.Series([], dtype=np.int64),
                                 "__p": pd.Series([], dtype=np.int32)})
        u, c = np.unique(np.concatenate(chunks), return_counts=True)
        return pd.DataFrame(
            {"pair": u, "n": c.astype(np.int64), "__p": partition_of(u, buckets)}
        )

    def fold_route_a(g: pd.DataFrame) -> pd.DataFrame:
        u, inv = np.unique(g["pair"].to_numpy(np.int64), return_inverse=True)
        n = np.bincount(inv, weights=g["n"].to_numpy(np.float64)).astype(np.int64)
        a = u >> np.int64(32)
        return pd.DataFrame(
            {"pair": u, "n": n, "deg": np.int64(-1), "key": a,
             "side": np.int8(1), "__r": partition_of(a, buckets)}
        )

    def degree_rows(g: pd.DataFrame) -> pd.DataFrame:
        # all of s's edges are in s's bucket: run lengths = global degree
        g = g.drop_duplicates(["s", "d"]).sort_values("s")
        s = g["s"].to_numpy(np.int64)
        starts = np.flatnonzero(np.r_[True, s[1:] != s[:-1]])
        deg = np.diff(np.r_[starts, len(s)]).astype(np.int64)
        sv = s[starts]
        return pd.DataFrame(
            {"pair": np.int64(-1), "n": np.int64(0), "deg": deg, "key": sv,
             "side": np.int8(0), "__r": partition_of(sv, buckets)}
        )

    def make_attach(route_b: bool):
        def attach(g: pd.DataFrame) -> pd.DataFrame:
            dd = g[g["side"] == 0].sort_values("key")
            pr = g[g["side"] == 1]
            if not len(pr):
                if route_b:
                    return pd.DataFrame(
                        {c: pd.Series([], dtype=g[c].dtype) for c in g.columns}
                    )
                return pd.DataFrame(
                    {c: pd.Series([], dtype=np.int64)
                     for c in ("pair", "n", "da", "db")}
                )
            keys = dd["key"].to_numpy(np.int64)
            degs = dd["deg"].to_numpy(np.int64)
            pos = np.minimum(np.searchsorted(keys, pr["key"].to_numpy(np.int64)),
                             max(len(keys) - 1, 0))
            got = degs[pos] if len(keys) else np.full(len(pr), -1, np.int64)
            out = pr.copy()
            if route_b:
                # first attach: stash deg(a) in `n`'s high bits? No —
                # carry it in `deg`, reroute on b = low 32 bits of pair
                out["deg"] = got
                b = out["pair"].to_numpy(np.int64) & LOW32
                out["key"] = b
                out["__r"] = partition_of(b, buckets)
                return out
            out["da"] = out["deg"].to_numpy(np.int64)
            out["db"] = got
            return out[["pair", "n", "da", "db"]]

        return attach

    def topk_local(g: pd.DataFrame) -> pd.DataFrame:
        n = g["n"].to_numpy(np.float64)
        union_sz = (g["da"].to_numpy(np.float64)
                    + g["db"].to_numpy(np.float64) - n)
        q = np.floor(n / union_sz * 1e6 + 0.5).astype(np.int64)
        u = g["pair"].to_numpy(np.int64)
        order = np.lexsort((u, -q))[:k]
        return pd.DataFrame({"pair": u[order], "score_e6": q[order]})

    src_bucketed = edges.map_batches(
        lambda b: pd.DataFrame(
            {"s": b[src_col].to_numpy(np.int64),
             "d": b[dst_col].to_numpy(np.int64),
             "__r": partition_of(b[src_col].to_numpy(np.int64), buckets)}
        ),
        batch_format="pandas",
    )
    deg_ds = (
        src_bucketed.groupby("__r")
        .map_groups(degree_rows, batch_format="pandas")
        .materialize()  # O(V) rows, reused by both attach passes
    )

    pair_rows = (
        edges.map_batches(bucket, batch_format="pandas")
        .groupby("__b")
        .map_groups(pair_partials, batch_format="pandas")
        .groupby("__p")
        .map_groups(fold_route_a, batch_format="pandas")
    )

    with_da = (
        pair_rows.union(deg_ds)
        .groupby("__r")
        .map_groups(make_attach(route_b=True), batch_format="pandas")
    )
    scored = (
        with_da.union(deg_ds)
        .groupby("__r")
        .map_groups(make_attach(route_b=False), batch_format="pandas")
        .map_batches(topk_local, batch_format="pandas")
        .to_pandas()
    )
    order = np.lexsort((scored["pair"].to_numpy(np.int64),
                        -scored["score_e6"].to_numpy(np.int64)))[:k]
    top = scored.iloc[order]
    enc = top["pair"].to_numpy(np.int64)
    return pd.DataFrame(
        {
            "a": enc >> np.int64(32),
            "b": enc & LOW32,
            "score_e6": top["score_e6"].to_numpy(np.int64),
        }
    )


def reciprocity(
    edges: rd.Dataset,
    *,
    src_col: str = "src_id",
    dst_col: str = "dst_id",
    buckets: int = 64,
) -> pd.DataFrame:
    """Edge reciprocity of a directed graph: the fraction of (deduplicated,
    loop-free) directed edges whose reverse edge also exists — the classic
    web-/social-graph mutual-link statistic (networkx.reciprocity
    semantics over the whole graph).

    One bucketed shuffle on the UNORDERED pair key hash(min,max): both
    (u,v) and (v,u) land in the same group, where a vectorized sort +
    segment scan decides mutuality. Nothing is broadcast and nothing is
    collected besides per-bucket (n_edges, n_recip) partials, so the op
    holds at web scale. Returns one row (n_edges, n_recip, recip_e6).
    """

    def tag(batch: pa.Table) -> pa.Table:
        s = batch.column(src_col).to_numpy(zero_copy_only=False).astype(np.int64)
        d = batch.column(dst_col).to_numpy(zero_copy_only=False).astype(np.int64)
        keep = s != d
        s, d = s[keep], d[keep]
        check_u32(np.minimum(s, d), "reciprocity")
        check_u32(np.maximum(s, d), "reciprocity")
        pair = (np.minimum(s, d) << np.int64(32)) | np.maximum(s, d)
        return pa.table(
            {
                "pair": pa.array(pair, pa.int64()),
                "fwd": pa.array(s < d, pa.bool_()),
                "bucket": pa.array(partition_of(pair, buckets), pa.int32()),
            }
        )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        pair = g["pair"].to_numpy(np.int64)
        fwd = g["fwd"].to_numpy(np.int8)
        # dedup on the (pair, direction) columns directly — the previous
        # (pair << 1) | fwd encoding dropped bit 63 of the packed pair,
        # so for ids in [2^31, 2^32) (allowed by check_u32) two distinct
        # unordered pairs could collide after the shift
        order = np.lexsort((fwd, pair))
        p, f = pair[order], fwd[order]
        keep = np.ones(len(p), np.bool_)
        keep[1:] = (p[1:] != p[:-1]) | (f[1:] != f[:-1])
        p = p[keep]
        n_edges = len(p)
        # after dedup, a pair appearing twice has both directions
        both = np.flatnonzero(p[:-1] == p[1:])
        n_recip = 2 * len(both)
        return pd.DataFrame({"n_edges": [n_edges], "n_recip": [n_recip]})

    parts = (
        edges.map_batches(tag, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
    )
    n_e = int(parts["n_edges"].sum())
    n_r = int(parts["n_recip"].sum())
    e6 = int(np.floor(1e6 * n_r / n_e + 0.5)) if n_e else 0
    return pd.DataFrame({"n_edges": [n_e], "n_recip": [n_r], "recip_e6": [e6]})


def quotient_graph(
    edges: rd.Dataset,
    src_map: rd.Dataset,
    dst_map: rd.Dataset,
    *,
    src_col: str = "src_id",
    dst_col: str = "dst_id",
    buckets: int = 64,
) -> rd.Dataset:
    """Vertex-contraction / quotient graph: map every endpoint through a
    (oid, grp) table and aggregate to (src_grp, dst_grp, n_edges) — the
    page-graph -> host-graph aggregation every web-graph pipeline runs
    (and GraphScope expresses as a label projection + groupby over
    property graphs, python/graphscope/framework/graph.py:80-97).

    Three bucketed exchanges total, each of ``buckets`` groups: resolve
    src groups (hash(src) join), resolve dst groups (hash(dst) join),
    fold counts (hash(pair) groupby with per-batch pre-combine). Mapping
    tables are vertex-sized and travel sharded with the edges — nothing
    is broadcast, so the contraction holds when both sides are web-scale.
    ``grp`` may be any hashable dtype (string hosts, int nation keys).
    Edge multiplicity: input edges are assumed deduplicated (LinkGraph
    edge shards are), so n_edges counts distinct underlying pairs.
    """

    def resolve(oid_side: str, out_name: str):
        """Per-group: rows carry (src,dst[,resolved cols]); mapping rows
        carry (oid, grp). searchsorted lookup, total mapping required."""

        def f(g: pd.DataFrame) -> pd.DataFrame:
            m = g[g["__side"] == 1].sort_values("oid")
            rows = g[g["__side"] == 0]
            keys = m["oid"].to_numpy(np.int64)
            grps = m["grp"].to_numpy()
            k = rows[oid_side].to_numpy(np.int64)
            pos = np.searchsorted(keys, k)
            pos = np.minimum(pos, max(len(keys) - 1, 0))
            if len(keys) == 0 or not np.all(keys[pos] == k):
                raise ValueError(
                    "quotient_graph: mapping is not total for column "
                    f"{oid_side!r}"
                )
            out = rows.drop(columns=["__side", "oid", "grp", "bucket"],
                            errors="ignore").copy()
            out[out_name] = grps[pos]
            return out

        return f

    # Every union side emits the SAME column set (ints padded with -1,
    # object columns with None) so pandas-block unions never coerce the
    # int64 id columns to float64 (which would silently degrade ids past
    # 2^53 at web scale).
    def tag_rows(key: str, extra: list[str]):
        def f(b: pd.DataFrame) -> pd.DataFrame:
            n = len(b)
            k = b[key].to_numpy(np.int64)
            out = {
                "src": b["src"].to_numpy(np.int64)
                if "src" in b.columns
                else b[src_col].to_numpy(np.int64),
                "dst": b["dst"].to_numpy(np.int64)
                if "dst" in b.columns
                else b[dst_col].to_numpy(np.int64),
                "oid": np.full(n, -1, np.int64),
                "grp": np.full(n, None, object),
                "__side": np.zeros(n, np.int8),
                "bucket": partition_of(k, buckets).astype(np.int32),
            }
            for c in extra:
                out[c] = b[c].to_numpy()
            return pd.DataFrame(out)

        return f

    def tag_map(b: pd.DataFrame, extra: list[str]) -> pd.DataFrame:
        n = len(b)
        oid = b["oid"].to_numpy(np.int64)
        out = {
            "src": np.full(n, -1, np.int64),
            "dst": np.full(n, -1, np.int64),
            "oid": oid,
            "grp": b["grp"].to_numpy(object),
            "__side": np.ones(n, np.int8),
            "bucket": partition_of(oid, buckets).astype(np.int32),
        }
        for c in extra:
            out[c] = np.full(n, None, object)
        return pd.DataFrame(out)

    s_resolved = (
        edges.map_batches(tag_rows(src_col, []), batch_format="pandas")
        .union(src_map.map_batches(lambda b: tag_map(b, []), batch_format="pandas"))
        .groupby("bucket")
        .map_groups(resolve("src", "src_grp"), batch_format="pandas")
    )
    d_resolved = (
        s_resolved.map_batches(tag_rows("dst", ["src_grp"]), batch_format="pandas")
        .union(
            dst_map.map_batches(
                lambda b: tag_map(b, ["src_grp"]), batch_format="pandas"
            )
        )
        .groupby("bucket")
        .map_groups(resolve("dst", "dst_grp"), batch_format="pandas")
    )

    def precombine(b: pd.DataFrame) -> pd.DataFrame:
        out = (
            b.groupby(["src_grp", "dst_grp"], sort=True)
            .size()
            .reset_index(name="n_edges")
        )
        out["bucket"] = (
            pd.util.hash_pandas_object(
                out["src_grp"].astype(str) + "\x1f" + out["dst_grp"].astype(str),
                index=False,
            ).to_numpy(np.uint64)
            % np.uint64(buckets)
        ).astype(np.int32)
        return out

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        out = (
            g.groupby(["src_grp", "dst_grp"], sort=True)["n_edges"]
            .sum()
            .reset_index()
        )
        out["n_edges"] = out["n_edges"].astype(np.int64)
        return out

    return (
        d_resolved.map_batches(precombine, batch_format="pandas")
        .groupby("bucket")
        .map_groups(fold, batch_format="pandas")
    )
