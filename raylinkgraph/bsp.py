"""Generic BSP superstep driver over CSR shard blocks.

The Ray-Data recast of the reference's PIE fixpoint loop
(docs/analytical_engine/programming_model_pie.md:24-30; worker loop
core/grape_instance.cc:314-331): the driver `for` loop is the superstep
barrier; each superstep is ONE Ray Data execution

    csr_blocks.map_batches(scatter)            # gather-scatter, vectorized,
        .union(per-pid marker rows)            # every pid gets an apply call
        .groupby("pid").map_groups(apply)      # message reduce + state update

plus a tiny P-row collect of per-partition scalars (the analogue of
grape::Communicator::Sum allreduce, apps/pagerank/pagerank_networkx.h:85).

Messages are PRE-COMBINED inside scatter per (CSR block, target pid) —
the combiner the reference gets from per-fragment message aggregation —
so the all-to-all `groupby` only moves one reduced row group per
(block, dst-partition), never per-edge rows.

State lives in per-step, per-partition Parquet files
(state/checkpoint.py): scatter/apply read step k, apply writes step k+1.
On a multi-node cluster those files sit on shared storage, making the
superstep state exchange identical to the checkpoint stream the north
rule requires; nothing O(V) ever passes through the driver.

An algorithm implements the ``Superstep`` protocol below — equivalent
expressive power to Pregel-with-combiner (reference extension surface
core/app/pregel/i_vertex_program.h:45-92), natively Arrow-batch-oriented.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from raylinkgraph.stages.graph_build import LinkGraph
from raylinkgraph.state import checkpoint as ckpt


class Superstep:
    """Protocol for BSP algorithms. All arrays are numpy; all methods must
    be deterministic and order-insensitive (SURVEY.md §4 determinism).

    CONTRACT — replace, don't mutate: ``apply`` must return NEW state
    arrays (or the old ones unchanged), never update the received arrays
    in place. The resident engine's async checkpoint writer snapshots the
    previous round's arrays zero-copy while the next round computes
    (bsp_actors.py), so in-place mutation would race the writer. The
    engine enforces this by marking checkpointed arrays read-only."""

    name: str = "abstract"
    #: state-file columns written next to ``oid`` (e.g. {"rank": float64})
    state_dtypes: dict[str, pa.DataType] = {}
    #: columns scatter actually reads from the state file (pruned read)
    scatter_columns: list[str] = []
    #: message payload columns (besides ``dst``)
    msg_dtypes: dict[str, pa.DataType] = {}
    #: names of per-partition scalar partials (reduced by summation)
    scalar_names: list[str] = []
    #: True when scatter emits the SAME (target, pos) structure every
    #: round (all-active algorithms like PageRank): engines may then ship
    #: positions once and only stream payload values afterwards — the
    #: analogue of the reference's fixed preallocated message channels
    static_messages: bool = False
    #: state columns DERIVED from the others: omitted from checkpoint
    #: files (rehydrate() reconstructs them on load) — cuts superstep
    #: checkpoint IO, the dominant cost of short rounds at high W
    ckpt_exclude: list[str] = []
    #: omit the oid column too (reconstructed from the graph's
    #: vertexstate files, which share the per-partition sort order)
    ckpt_implicit_oid: bool = False

    def rehydrate(self, state: dict, oids, out_deg) -> dict:
        """Reconstruct ckpt_exclude columns after loading a checkpoint."""
        return state

    def params(self) -> dict:
        return {}

    def init(self, oids: np.ndarray, out_deg: np.ndarray):
        """-> (state dict[str, np.ndarray], scalar partials dict)."""
        raise NotImplementedError

    def scatter(self, state: dict, block: dict, scalars: dict):
        """-> iterable of (target_pid, dst: np.ndarray, payload dict)."""
        raise NotImplementedError

    def apply(self, oids, out_deg, state: dict, msgs: dict, scalars: dict):
        """msgs has ``dst`` + payload columns (concatenated, unordered).
        -> (new state dict, scalar partials dict)."""
        raise NotImplementedError

    def converged(self, scalars: dict, completed_rounds: int) -> bool:
        raise NotImplementedError


@dataclass
class BSPResult:
    workdir: str
    final_step: int
    rounds: int
    converged: bool
    scalars: dict
    history: list = field(default_factory=list)
    iterate_sec: float = 0.0  # wall-clock of the superstep loop only
    round_secs: list = field(default_factory=list)  # per-superstep wall
    graph_dir: str | None = None  # for oid hydration of reduced checkpoints

    def state_ds(self) -> rd.Dataset:
        return rd.read_parquet(ckpt.step_dir(self.workdir, self.final_step))

    def state_pandas(self) -> pd.DataFrame:
        sd = ckpt.step_dir(self.workdir, self.final_step)
        frames = []
        for f in sorted(os.listdir(sd)):
            if not (f.startswith("state-") and f.endswith(".parquet")):
                continue
            df = pq.read_table(os.path.join(sd, f)).to_pandas()
            if "oid" not in df.columns:
                # reduced checkpoint (ckpt_implicit_oid): rows are aligned
                # with the partition's sorted vertexstate oids
                pid = int(f[6:11])
                vs = pq.read_table(
                    os.path.join(self.graph_dir, "vertexstate",
                                 f"vertexstate-{pid:05d}.parquet"),
                    columns=["oid"],
                )
                df.insert(0, "oid", vs.column("oid").to_numpy(zero_copy_only=False))
            frames.append(df)
        return (
            pd.concat(frames, ignore_index=True)
            .sort_values("oid")
            .reset_index(drop=True)
        )


def _np(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.to_numpy(zero_copy_only=False)


def _list_np(col, flat_dtype) -> list[np.ndarray]:
    """large_list column -> list of numpy arrays (per row)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    offs = col.offsets.to_numpy(zero_copy_only=False)
    flat = col.values.to_numpy(zero_copy_only=False)
    return [flat[offs[i] : offs[i + 1]] for i in range(len(col))]


def _fsl_size(t: pa.DataType) -> int | None:
    """list_size for fixed-size-list dtypes, else None. FSL state/message
    columns let an algorithm carry a (n, S) matrix per quantity (e.g.
    64-source Brandes) instead of S scalar columns — the wave-packed
    layout; numpy side is always a 2D array."""
    return t.list_size if pa.types.is_fixed_size_list(t) else None


def _pa_state_col(arr: np.ndarray, t: pa.DataType) -> pa.Array:
    S = _fsl_size(t)
    if S is None:
        return pa.array(arr, t)
    flat = np.ascontiguousarray(arr).reshape(-1)
    return pa.FixedSizeListArray.from_arrays(pa.array(flat, t.value_type), S)


def _np_state_col(col, t: pa.DataType) -> np.ndarray:
    """Inverse of _pa_state_col; tolerant of parquet round-tripping FSL
    as plain list (flatten() respects offsets on both)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    S = _fsl_size(t)
    if S is None:
        return col.to_numpy(zero_copy_only=False)
    return col.flatten().to_numpy(zero_copy_only=False).reshape(-1, S)


def _build_msg_col(chunks: list[np.ndarray], t: pa.DataType) -> pa.Array:
    """list of per-yield payload arrays -> large_list(t) column."""
    S = _fsl_size(t)
    if S is None:
        return pa.array(chunks, pa.large_list(t))
    lens = [len(c) for c in chunks]
    flat = (
        np.concatenate([np.ascontiguousarray(c).reshape(-1) for c in chunks])
        if chunks
        else np.array([], dtype=np.float64)
    )
    values = pa.FixedSizeListArray.from_arrays(pa.array(flat, t.value_type), S)
    offsets = pa.array(np.r_[0, np.cumsum(lens)].astype(np.int64), pa.int64())
    return pa.LargeListArray.from_arrays(offsets, values)


def _flat_msg_np(col, t: pa.DataType) -> np.ndarray:
    """large_list(t) column -> flat numpy ((M,) scalars or (M, S) FSL)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    v = col.flatten()
    S = _fsl_size(t)
    if S is None:
        return v.to_numpy(zero_copy_only=False)
    return v.flatten().to_numpy(zero_copy_only=False).reshape(-1, S)


def _msg_schema(algo: Superstep) -> pa.Schema:
    # messages address receivers by POSITION in the target partition's
    # sorted oid array (precomputed at CSR build) — int32, no per-round
    # hashing/searchsorted on the receive side
    fields = [("pid", pa.int32()), ("pos", pa.large_list(pa.int32()))]
    fields += [(k, pa.large_list(t)) for k, t in algo.msg_dtypes.items()]
    return pa.schema(fields)


def run_bsp(
    graph: LinkGraph,
    algo: Superstep,
    workdir: str,
    *,
    max_rounds: int = 100,
    resume: bool = True,
    keep_steps: int = 2,
) -> BSPResult:
    """Run `algo` to convergence (or max_rounds) over `graph`.

    Checkpoints every superstep; resumes from the latest complete step
    when `resume` and the lineage (algo, params, graph digest, P) matches.
    """
    P = graph.P
    params = algo.params()
    digest = graph.digest()
    graph_dir = graph.graph_dir
    os.makedirs(workdir, exist_ok=True)
    msg_schema = _msg_schema(algo)
    scalar_names = list(algo.scalar_names)
    history: list[dict] = []

    start = ckpt.latest_complete_step(workdir, algo.name, params, digest, P) if resume else None
    if start is not None:
        step, lin = start
        scalars = dict(lin["scalars"])
        history.append(scalars)
    else:
        step = 0
        scalars = _run_init(graph, algo, workdir, scalar_names)
        ckpt.write_lineage(
            workdir, 0, ckpt.lineage_for(algo.name, params, digest, P, 0, scalars)
        )
        history.append(scalars)

    csr = graph.csr_ds()
    rounds_done = step
    converged = algo.converged(scalars, rounds_done)
    loop_t0 = time.time()
    round_secs: list[float] = []
    while not converged and rounds_done < max_rounds:
        rt0 = time.time()
        cur, nxt = rounds_done, rounds_done + 1
        # ``_round`` = completed rounds so far: level-indexed algorithms
        # (MSBFS, Brandes) read it instead of shipping a counter scalar
        rscal = {**scalars, "_round": float(cur)}
        scatter_fn = _make_scatter(algo, workdir, cur, rscal, graph_dir)
        apply_fn = _make_apply(algo, graph_dir, workdir, cur, nxt, rscal, scalar_names)
        markers = rd.range(P, override_num_blocks=max(1, P // 8)).map_batches(
            _make_markers(msg_schema), batch_format="pyarrow"
        )
        out = (
            csr.map_batches(scatter_fn, batch_format="pyarrow")
            .union(markers)
            .groupby("pid")
            .map_groups(apply_fn, batch_format="pyarrow")
        )
        rows = out.to_pandas()
        scalars = {k: float(rows[k].sum()) for k in scalar_names}
        ckpt.write_lineage(
            workdir, nxt, ckpt.lineage_for(algo.name, params, digest, P, nxt, scalars)
        )
        history.append(scalars)
        rounds_done = nxt
        converged = algo.converged(scalars, rounds_done)
        ckpt.prune_steps(workdir, keep_from=max(0, nxt - keep_steps + 1))
        round_secs.append(time.time() - rt0)

    return BSPResult(
        workdir=workdir,
        final_step=rounds_done,
        rounds=rounds_done,
        converged=converged,
        scalars=scalars,
        history=history,
        iterate_sec=time.time() - loop_t0,
        round_secs=round_secs,
        graph_dir=graph_dir,
    )


def _run_init(graph: LinkGraph, algo: Superstep, workdir: str, scalar_names) -> dict:
    graph_dir, P = graph.graph_dir, graph.P

    def init_batch(batch: pa.Table) -> pa.Table:
        out = {"pid": [], **{k: [] for k in scalar_names}}
        for pid in batch.column("id").to_pylist():
            pid = int(pid)
            vs = pq.read_table(
                os.path.join(graph_dir, "vertexstate", f"vertexstate-{pid:05d}.parquet")
            )
            oids = _np(vs.column("oid"))
            deg = _np(vs.column("out_deg"))
            state, partials = algo.init(oids, deg)
            cols = {"oid": pa.array(oids, pa.int64())}
            for k, t in algo.state_dtypes.items():
                cols[k] = _pa_state_col(state[k], t)
            ckpt.write_state(workdir, 0, pid, pa.table(cols))
            out["pid"].append(pid)
            for k in scalar_names:
                out[k].append(float(partials.get(k, 0.0)))
        return pa.table(
            {
                "pid": pa.array(out["pid"], pa.int32()),
                **{k: pa.array(out[k], pa.float64()) for k in scalar_names},
            }
        )

    rows = (
        rd.range(P, override_num_blocks=max(1, min(P, 32)))
        .map_batches(init_batch, batch_format="pyarrow")
        .to_pandas()
    )
    return {k: float(rows[k].sum()) for k in scalar_names}


def _make_markers(msg_schema: pa.Schema):
    def markers(batch: pa.Table) -> pa.Table:
        pids = batch.column("id").to_numpy(zero_copy_only=False).astype(np.int32)
        n = len(pids)
        cols = {"pid": pa.array(pids, pa.int32())}
        for f in msg_schema:
            if f.name == "pid":
                continue
            cols[f.name] = pa.array([[]] * n, f.type)
        return pa.table(cols, schema=msg_schema)

    return markers


def _load_hydrated(algo: Superstep, workdir: str, step: int, pid: int,
                   graph_dir: str) -> dict:
    """Load a REDUCED checkpoint (ckpt_exclude / implicit oid, written by
    the resident engine): read the columns present, reconstruct the rest
    via algo.rehydrate against the partition's vertexstate."""
    path = ckpt.state_path(workdir, step, pid)
    avail = set(pq.read_schema(path).names)
    cols = [c for c in algo.state_dtypes if c in avail]
    t = pq.read_table(path, columns=cols)
    state = {c: _np_state_col(t.column(c), algo.state_dtypes[c]) for c in cols}
    vs = pq.read_table(
        os.path.join(graph_dir, "vertexstate", f"vertexstate-{pid:05d}.parquet")
    )
    return algo.rehydrate(state, _np(vs.column("oid")), _np(vs.column("out_deg")))


def _make_scatter(algo: Superstep, workdir: str, step: int, scalars: dict,
                  graph_dir: str):
    msg_schema = _msg_schema(algo)
    scatter_cols = list(algo.scatter_columns)
    payload_names = list(algo.msg_dtypes.keys())

    def scatter_batch(batch: pa.Table) -> pa.Table:
        state_cache: dict[int, dict] = {}
        out = {f.name: [] for f in msg_schema}
        pids = batch.column("pid").to_pylist()
        src_pos = _list_np(batch.column("src_pos"), np.int64)
        src_code = _list_np(batch.column("src_code"), np.int32)
        dst_ptr = _list_np(batch.column("dst_ptr"), np.int64)
        dst_code = _list_np(batch.column("dst_code"), np.int32)
        udst = _list_np(batch.column("udst"), np.int64)
        udst_pos = _list_np(batch.column("udst_pos"), np.int32)
        tgt_ptr = _list_np(batch.column("tgt_ptr"), np.int64)
        weight = (
            _list_np(batch.column("weight"), np.float64)
            if "weight" in batch.column_names
            else None
        )
        for i, pid in enumerate(pids):
            pid = int(pid)
            st = state_cache.get(pid)
            if st is None:
                try:
                    t = ckpt.read_state(workdir, step, pid, columns=scatter_cols)
                    st = {
                        c: _np_state_col(t.column(c), algo.state_dtypes[c])
                        for c in scatter_cols
                    }
                except Exception:  # reduced checkpoint: hydrate
                    full = _load_hydrated(algo, workdir, step, pid, graph_dir)
                    st = {c: full[c] for c in scatter_cols}
                state_cache[pid] = st
            block = {
                "pid": pid,
                "src_pos": src_pos[i],
                "src_code": src_code[i],
                "dst_ptr": dst_ptr[i],
                "dst_code": dst_code[i],
                "udst": udst[i],
                "udst_pos": udst_pos[i],
                "tgt_ptr": tgt_ptr[i],
            }
            if weight is not None:
                block["weight"] = weight[i]
            for q, pos, payload in algo.scatter(st, block, scalars):
                out["pid"].append(int(q))
                out["pos"].append(pos)
                for k in payload_names:
                    out[k].append(payload[k])
        cols = {"pid": pa.array(np.asarray(out["pid"], np.int32), pa.int32())}
        cols["pos"] = pa.array(out["pos"], pa.large_list(pa.int32()))
        for k in payload_names:
            cols[k] = _build_msg_col(out[k], algo.msg_dtypes[k])
        return pa.table(cols, schema=msg_schema)

    return scatter_batch


def _make_apply(
    algo: Superstep,
    graph_dir: str,
    workdir: str,
    step: int,
    next_step: int,
    scalars: dict,
    scalar_names: list[str],
):
    payload_names = list(algo.msg_dtypes.keys())
    state_names = list(algo.state_dtypes.keys())

    def apply_group(g: pa.Table) -> pa.Table:
        pid = int(g.column("pid")[0].as_py())
        pos_col = g.column("pos")
        if isinstance(pos_col, pa.ChunkedArray):
            pos_col = pos_col.combine_chunks()
        msgs = {"pos": pos_col.values.to_numpy(zero_copy_only=False)}
        for k in payload_names:
            msgs[k] = _flat_msg_np(g.column(k), algo.msg_dtypes[k])
        vs = pq.read_table(
            os.path.join(graph_dir, "vertexstate", f"vertexstate-{pid:05d}.parquet")
        )
        oids = _np(vs.column("oid"))
        deg = _np(vs.column("out_deg"))
        old_t = ckpt.read_state(workdir, step, pid)
        if all(c in old_t.column_names for c in state_names):
            old = {
                c: _np_state_col(old_t.column(c), algo.state_dtypes[c])
                for c in state_names
            }
        else:  # reduced checkpoint: hydrate the derived columns
            old = algo.rehydrate(
                {c: _np_state_col(old_t.column(c), algo.state_dtypes[c])
                 for c in state_names if c in old_t.column_names},
                oids, deg,
            )
        new_state, partials = algo.apply(oids, deg, old, msgs, scalars)
        cols = {"oid": pa.array(oids, pa.int64())}
        for k, t in algo.state_dtypes.items():
            cols[k] = _pa_state_col(new_state[k], t)
        ckpt.write_state(workdir, next_step, pid, pa.table(cols))
        return pa.table(
            {
                "pid": pa.array([pid], pa.int32()),
                **{
                    k: pa.array([float(partials.get(k, 0.0))], pa.float64())
                    for k in scalar_names
                },
            }
        )

    return apply_group
