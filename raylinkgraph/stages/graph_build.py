"""Graph build: edge table -> partitioned vertex state + CSR shard blocks.

This is the Ray-Data-native recast of the reference loader's pipeline
(core/loader/arrow_fragment_loader.h:199-252, narrative docs/frag_intro.md):
oid shuffle -> vertex map -> CSR build, expressed as three Dataset passes:

  Pass A  edges.groupby(pid=hash(src)%P).map_groups(...)
          -> exact dedup on (src,dst), self-loop drop, per-src out-degree,
             deduped edges persisted as one Parquet file per partition.
  Pass B  vertex sets: unique(src ∪ dst) per home partition, joined with
          out-degrees -> vertexstate-{pid}.parquet (oid sorted, out_deg).
  Pass C  per-partition CSR blocks (dst-major, reduceat-ready), split at
          ``max_edges_per_block`` so a super-node's adjacency spans many
          blocks (explicit skew splitting — the north rule's requirement;
          the reference's analogue is degree-ordered orientation + chunked
          ForEach, SURVEY.md §4).

Everything downstream (BSP supersteps, triangles) consumes these artifacts.
All partition assignment uses one stable hash (functions/hashing.py), so
results are identical at any parallelism (mirrors
python/graphscope/tests/unittest/test_scalability.py:40-57).

CSR block layout (one Arrow row per block; edges sorted dst-major):
  pid:int32, block_id:int32, n_edges:int64
  src_pos:  large_list<int64>   position of each block-local source in the
                                home partition's sorted oid array
  src_code: large_list<int32>   per-edge index into src_pos
  dst_ptr:  large_list<int64>   segment offsets over the dst-sorted edges
  udst:     large_list<int64>   sorted unique destination oids
  udst_pid: large_list<int32>   home partition of each udst

Per-superstep scatter is then pure numpy: values = f(state[src_pos]);
per-edge = values[src_code]; per-dst reduce = ufunc.reduceat(per-edge,
dst_ptr[:-1]); route by udst_pid. No Python loops, no per-round hashing.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from raylinkgraph.functions.hashing import partition_of

CSR_SCHEMA = pa.schema(
    [
        ("pid", pa.int32()),
        ("block_id", pa.int32()),
        ("n_edges", pa.int64()),
        ("src_pos", pa.large_list(pa.int64())),
        ("src_code", pa.large_list(pa.int32())),
        ("dst_ptr", pa.large_list(pa.int64())),
        ("dst_code", pa.large_list(pa.int32())),
        ("udst", pa.large_list(pa.int64())),
        ("udst_pos", pa.large_list(pa.int32())),
        ("tgt_ptr", pa.large_list(pa.int64())),
    ]
)


WEIGHTED_CSR_SCHEMA = CSR_SCHEMA.append(pa.field("weight", pa.large_list(pa.float64())))


def _atomic_write(table: pa.Table, path: str) -> None:
    tmp = path + ".tmp"
    pq.write_table(table, tmp)
    os.rename(tmp, path)


class LinkGraph:
    """Handle to a built graph directory.

    Layout: {dir}/meta.json, {dir}/edges/edges-{pid}.parquet,
    {dir}/vertexstate/vertexstate-{pid}.parquet, {dir}/csr/csr-{pid}.parquet.
    """

    def __init__(self, graph_dir: str):
        self.graph_dir = graph_dir
        with open(os.path.join(graph_dir, "meta.json")) as f:
            self.meta = json.load(f)
        self.P = int(self.meta["P"])
        self.n_vertices = int(self.meta["n_vertices"])
        self.n_edges = int(self.meta["n_edges"])
        self._csr_ds: rd.Dataset | None = None

    # ---- accessors -------------------------------------------------------
    def edges_path(self) -> str:
        return os.path.join(self.graph_dir, "edges")

    def vertexstate_path(self, pid: int) -> str:
        return os.path.join(self.graph_dir, "vertexstate", f"vertexstate-{pid:05d}.parquet")

    def edges_ds(self) -> rd.Dataset:
        return rd.read_parquet(self.edges_path())

    def csr_ds(self) -> rd.Dataset:
        """CSR blocks, materialized once per process into the object store
        (zero-copy Arrow reads from every superstep thereafter — the Ray
        analogue of the reference keeping fragments resident in vineyard)."""
        if self._csr_ds is None:
            self._csr_ds = rd.read_parquet(
                os.path.join(self.graph_dir, "csr")
            ).materialize()
        return self._csr_ds

    def digest(self) -> str:
        return str(self.meta.get("digest", ""))

    # ---- build -----------------------------------------------------------
    @staticmethod
    def build(
        edges: rd.Dataset,
        graph_dir: str,
        *,
        P: int = 32,
        symmetrize: bool = False,
        max_edges_per_block: int = 1 << 20,
        src_col: str = "src_id",
        dst_col: str = "dst_id",
        weight_col: str | None = None,
        dedup_weight: str = "min",
    ) -> "LinkGraph":
        """Build all graph artifacts from an edge Dataset (int64 endpoints).

        Exactly-one all-to-all shuffle per pass; identical output for any
        input block layout or parallelism.
        """
        for sub in ("edges", "vertexstate", "csr"):
            os.makedirs(os.path.join(graph_dir, sub), exist_ok=True)

        # ---- Pass A: dedup + degrees, partitioned by hash(src) % P ------
        def add_pid(batch: pa.Table) -> pa.Table:
            src = batch.column(src_col).to_numpy(zero_copy_only=False)
            dst = batch.column(dst_col).to_numpy(zero_copy_only=False)
            w = (
                batch.column(weight_col).to_numpy(zero_copy_only=False).astype(np.float64)
                if weight_col
                else None
            )
            if symmetrize:
                src, dst = np.concatenate([src, dst]), np.concatenate([dst, src])
                if w is not None:
                    w = np.concatenate([w, w])
            keep = src != dst
            src, dst = src[keep], dst[keep]
            cols = {
                "src_id": pa.array(src, pa.int64()),
                "dst_id": pa.array(dst, pa.int64()),
                "pid": pa.array(partition_of(src, P), pa.int32()),
            }
            if w is not None:
                cols["weight"] = pa.array(w[keep], pa.float64())
            return pa.table(cols)

        def dedup_group(g: pd.DataFrame) -> pd.DataFrame:
            pid = int(g["pid"].iloc[0])
            if weight_col:
                # deterministic duplicate rule: MIN (shortest-path style),
                # SUM (multiplicities), or OR (direction-flag bitmasks)
                rule = (
                    (lambda s: float(np.bitwise_or.reduce(s.to_numpy(np.int64))))
                    if dedup_weight == "or"
                    else dedup_weight
                )
                g = (
                    g.groupby(["src_id", "dst_id"], sort=False, as_index=False)
                    .agg(weight=("weight", rule), pid=("pid", "first"))
                )
            else:
                g = g.drop_duplicates(["src_id", "dst_id"])
            arr = g.sort_values(["src_id", "dst_id"])
            cols = {
                "src_id": pa.array(arr["src_id"].to_numpy(), pa.int64()),
                "dst_id": pa.array(arr["dst_id"].to_numpy(), pa.int64()),
            }
            if weight_col:
                cols["weight"] = pa.array(arr["weight"].to_numpy(np.float64), pa.float64())
            _atomic_write(
                pa.table(cols),
                os.path.join(graph_dir, "edges", f"edges-{pid:05d}.parquet"),
            )
            deg = g.groupby("src_id", sort=False).size()
            return pd.DataFrame(
                {
                    "oid": deg.index.to_numpy(np.int64),
                    "out_deg": deg.to_numpy(np.int64),
                    "n_edges": np.int64(len(g)),
                }
            )

        degrees = (
            edges.map_batches(add_pid, batch_format="pyarrow")
            .groupby("pid")
            .map_groups(dedup_group, batch_format="pandas")
        ).materialize()
        # Partitions with no edges still need (empty) edge files.
        present = set()
        for f in os.listdir(os.path.join(graph_dir, "edges")):
            if f.startswith("edges-") and f.endswith(".parquet"):
                present.add(int(f[6:11]))
        empty_edges = pa.table(
            {"src_id": pa.array([], pa.int64()), "dst_id": pa.array([], pa.int64())}
        )
        for pid in range(P):
            if pid not in present:
                _atomic_write(
                    empty_edges,
                    os.path.join(graph_dir, "edges", f"edges-{pid:05d}.parquet"),
                )

        # ---- Pass B: vertex sets + out-degrees per home partition -------
        def vertex_candidates(batch: pa.Table) -> pa.Table:
            src = batch.column("src_id").to_numpy(zero_copy_only=False)
            dst = batch.column("dst_id").to_numpy(zero_copy_only=False)
            oids = np.unique(np.concatenate([src, dst]))
            return pa.table(
                {
                    "oid": pa.array(oids, pa.int64()),
                    "out_deg": pa.array(np.zeros(len(oids), np.int64)),
                    "pid": pa.array(partition_of(oids, P), pa.int32()),
                }
            )

        deg_tagged = degrees.map_batches(
            lambda b: pa.table(
                {
                    "oid": b.column("oid"),
                    "out_deg": b.column("out_deg"),
                    "pid": pa.array(
                        partition_of(b.column("oid").to_numpy(zero_copy_only=False), P),
                        pa.int32(),
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        candidates = rd.read_parquet(os.path.join(graph_dir, "edges")).map_batches(
            vertex_candidates, batch_format="pyarrow"
        )

        def vertexstate_group(g: pd.DataFrame) -> pd.DataFrame:
            pid = int(g["pid"].iloc[0])
            agg = g.groupby("oid", sort=True)["out_deg"].max()
            oids = agg.index.to_numpy(np.int64)
            _atomic_write(
                pa.table(
                    {
                        "oid": pa.array(oids, pa.int64()),
                        "out_deg": pa.array(agg.to_numpy(np.int64), pa.int64()),
                    }
                ),
                os.path.join(
                    graph_dir, "vertexstate", f"vertexstate-{pid:05d}.parquet"
                ),
            )
            return pd.DataFrame({"pid": [pid], "n_vertices": [np.int64(len(oids))]})

        vcounts = (
            candidates.union(deg_tagged)
            .groupby("pid")
            .map_groups(vertexstate_group, batch_format="pandas")
        ).to_pandas()
        empty_vs = pa.table(
            {"oid": pa.array([], pa.int64()), "out_deg": pa.array([], pa.int64())}
        )
        for pid in range(P):
            vp = os.path.join(graph_dir, "vertexstate", f"vertexstate-{pid:05d}.parquet")
            if not os.path.exists(vp):
                _atomic_write(empty_vs, vp)

        # ---- Pass C: CSR blocks ------------------------------------------
        def build_csr(batch: pa.Table) -> pa.Table:
            schema = WEIGHTED_CSR_SCHEMA if weight_col else CSR_SCHEMA
            done = []
            for pid in batch.column("id").to_pylist():
                pid = int(pid)
                rows = _build_csr_for_pid(
                    graph_dir, pid, P, max_edges_per_block, bool(weight_col)
                )
                t = (
                    pa.Table.from_pylist(rows, schema=schema)
                    if rows
                    else schema.empty_table()
                )
                # one file per pid: resident actors read exactly their own
                _atomic_write(t, os.path.join(graph_dir, "csr", f"csr-{pid:05d}.parquet"))
                done.append(pid)
            return pa.table({"pid": pa.array(done, pa.int32())})

        # one block per pid so the P CSR builds run as P parallel tasks
        rd.range(P, override_num_blocks=P).map_batches(
            build_csr, batch_format="pyarrow"
        ).materialize()

        n_vertices = int(vcounts["n_vertices"].sum())
        n_edges = 0
        for pid in range(P):
            n_edges += pq.read_metadata(
                os.path.join(graph_dir, "edges", f"edges-{pid:05d}.parquet")
            ).num_rows
        meta = {
            "P": P,
            "n_vertices": n_vertices,
            "n_edges": int(n_edges),
            "symmetrize": symmetrize,
            "weighted": bool(weight_col),
            "max_edges_per_block": max_edges_per_block,
            "digest": f"v{n_vertices}-e{n_edges}-p{P}-s{int(symmetrize)}",
        }
        with open(os.path.join(graph_dir, "meta.json"), "w") as f:
            json.dump(meta, f)
        return LinkGraph(graph_dir)


def _read_oids(graph_dir: str, pid: int) -> np.ndarray:
    return (
        pq.read_table(
            os.path.join(graph_dir, "vertexstate", f"vertexstate-{pid:05d}.parquet"),
            columns=["oid"],
        )
        .column("oid")
        .to_numpy(zero_copy_only=False)
    )


def _build_csr_for_pid(
    graph_dir: str, pid: int, P: int, max_edges_per_block: int,
    weighted: bool = False,
) -> list[dict]:
    """Blocks laid out for zero-mask scatter: edges sorted by
    (hash(dst)%P, dst, src) so destination segments are contiguous AND
    grouped by target partition; ``tgt_ptr`` (P+1 offsets over the udst
    runs) makes per-target emission a pure slice, and ``udst_pos``
    (position of each udst in its TARGET partition's sorted oid array,
    resolved here against the vertexstate files) lets receivers reduce
    with a bare bincount — no hashing or searchsorted in the iterate loop
    (the analogue of the reference's gid->lid translation being done once
    at load, arrow_projected_fragment.h ovg2l map)."""
    edges = pq.read_table(
        os.path.join(graph_dir, "edges", f"edges-{pid:05d}.parquet")
    )
    src = edges.column("src_id").to_numpy(zero_copy_only=False)
    dst = edges.column("dst_id").to_numpy(zero_copy_only=False)
    w = (
        edges.column("weight").to_numpy(zero_copy_only=False)
        if weighted and edges.num_rows
        else None
    )
    if len(src) == 0:
        return []
    oids = _read_oids(graph_dir, pid)
    dst_pid = partition_of(dst, P)
    order = np.lexsort((src, dst, dst_pid))
    src, dst, dst_pid = src[order], dst[order], dst_pid[order]
    if w is not None:
        w = w[order]
    tgt_oids_cache: dict[int, np.ndarray] = {}
    rows = []
    for block_id, lo in enumerate(range(0, len(src), max_edges_per_block)):
        hi = min(lo + max_edges_per_block, len(src))
        bsrc, bdst, bpid = src[lo:hi], dst[lo:hi], dst_pid[lo:hi]
        # run-length encode dst (duplicates are adjacent within pid groups)
        is_new = np.r_[True, np.diff(bdst) != 0] | np.r_[True, np.diff(bpid) != 0]
        starts = np.flatnonzero(is_new)
        udst = bdst[starts]
        udst_pid = bpid[starts]
        dst_ptr = np.append(starts, len(bdst)).astype(np.int64)
        # per-edge run index: bincount-ready segment sums (4.7x faster
        # than add.reduceat at web-scale segment counts)
        dst_code = (np.cumsum(is_new) - 1).astype(np.int32)
        usrc, src_code = np.unique(bsrc, return_inverse=True)
        tgt_ptr = np.searchsorted(udst_pid, np.arange(P + 1)).astype(np.int64)
        udst_pos = np.empty(len(udst), np.int32)
        for q in range(P):
            qlo, qhi = tgt_ptr[q], tgt_ptr[q + 1]
            if qlo == qhi:
                continue
            toids = tgt_oids_cache.get(q)
            if toids is None:
                toids = _read_oids(graph_dir, q) if q != pid else oids
                assert len(toids) < 2**31
                tgt_oids_cache[q] = toids
            udst_pos[qlo:qhi] = np.searchsorted(toids, udst[qlo:qhi]).astype(np.int32)
        row = {
            "pid": pid,
            "block_id": block_id,
            "n_edges": int(hi - lo),
            "src_pos": np.searchsorted(oids, usrc).astype(np.int64),
            "src_code": src_code.astype(np.int32),
            "dst_ptr": dst_ptr,
            "dst_code": dst_code,
            "udst": udst,
            "udst_pos": udst_pos,
            "tgt_ptr": tgt_ptr,
        }
        if w is not None:
            row["weight"] = w[lo:hi]
        rows.append(row)
    return rows
