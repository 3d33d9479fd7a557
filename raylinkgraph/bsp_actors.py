"""Resident-worker BSP engine: the low-latency iterate path.

The Dataset engine (bsp.py) re-launches a Ray Data execution per
superstep — robust and streaming-friendly, but each round pays the
executor's fixed latency, which dominates when per-round compute is
small. The reference avoids this by keeping fragments RESIDENT in MPI
worker memory for the whole session (grape_engine workers + vineyard,
SURVEY.md §3.1). This module is the Ray analogue: W long-lived worker
actors (W = the cluster's CPU budget, each reserving num_cpus=1 so the
parallelism level genuinely bounds concurrent execution) each own
P/W graph partitions — CSR blocks + vertex state + algorithm state
pinned in process memory. P stays FIXED as W varies, exactly like a
fixed partitioning spread over different cluster sizes; results are
independent of W. A superstep is two actor round-trips

    refs = [w.scatter(scalars) for w in workers]     # pre-combined msgs
    outs = [w.apply(scalars, *refs) for w in workers] # reduce + update

with messages exchanged through the object store (zero-copy numpy on a
node; partitions co-located on one worker hand off in-process, the
analogue of the reference's intra-node vineyard sharing; on a multi-node
cluster scatter would use per-target returns so only each receiver's
slice crosses the network).

Semantics are IDENTICAL to the Dataset engine: the same Superstep
protocol objects run unchanged, the same per-superstep Parquet
checkpoints + lineage are written (resume is interchangeable between
engines), and tests assert bitwise-equal results. Raw actors are used
here precisely where the Dataset API can't express the need — per-round
mutable partitioned state with sub-second barrier latency.
"""

from __future__ import annotations

import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray

from raylinkgraph.bsp import BSPResult, Superstep, _np
from raylinkgraph.stages.graph_build import LinkGraph
from raylinkgraph.state import checkpoint as ckpt


class _Partition:
    def __init__(self, graph_dir: str, pid: int):
        self.pid = pid
        vs = pq.read_table(
            os.path.join(graph_dir, "vertexstate", f"vertexstate-{pid:05d}.parquet")
        )
        self.oids = _np(vs.column("oid"))
        self.deg = _np(vs.column("out_deg"))
        self.blocks: list[dict] = []
        t = pq.read_table(os.path.join(graph_dir, "csr", f"csr-{pid:05d}.parquet"))
        for i in range(t.num_rows):
            b = {
                "pid": pid,
                "src_pos": _np(t.column("src_pos")[i].values),
                "src_code": _np(t.column("src_code")[i].values),
                "dst_ptr": _np(t.column("dst_ptr")[i].values),
                "dst_code": _np(t.column("dst_code")[i].values),
                "udst": _np(t.column("udst")[i].values),
                "udst_pos": _np(t.column("udst_pos")[i].values),
                "tgt_ptr": _np(t.column("tgt_ptr")[i].values),
            }
            if "weight" in t.column_names:
                b["weight"] = _np(t.column("weight")[i].values)
            for v in b.values():
                if isinstance(v, np.ndarray) and len(v):
                    _ = v.sum()  # fault every page in at init, not in round 1
            self.blocks.append(b)
        self.state: dict | None = None


@ray.remote
class _Worker:
    """Owns a fixed subset of partitions; one per CPU of the 'cluster'."""

    def __init__(self, graph_dir: str, pids: list[int], state_dtypes: dict):
        self.parts = {pid: _Partition(graph_dir, pid) for pid in pids}
        self.pids = list(pids)
        self.algo: Superstep | None = None
        self.state_dtypes = state_dtypes
        self._sent_pos = False          # static-message senders ship pos once
        self._pos_cache: dict = {}      # (sender_idx, pid) -> np.ndarray

    def set_algo(self, algo: Superstep) -> None:
        self.algo = algo

    def init_state(self, workdir: str, checkpoint: bool) -> dict:
        merged: dict[str, float] = {}
        for pid, p in self.parts.items():
            p.state, partials = self.algo.init(p.oids, p.deg)
            if checkpoint:
                self._write_ckpt(workdir, 0, pid)
            for k, v in partials.items():
                merged[k] = merged.get(k, 0.0) + float(v)
        return merged

    def load_state(self, workdir: str, step: int) -> None:
        from raylinkgraph.bsp import _np_state_col

        for pid, p in self.parts.items():
            t = ckpt.read_state(workdir, step, pid)
            p.state = {
                k: _np_state_col(t.column(k), self.state_dtypes[k])
                for k in self.state_dtypes
                if k in t.column_names
            }
            if len(p.state) != len(self.state_dtypes):
                p.state = self.algo.rehydrate(p.state, p.oids, p.deg)

    def _ckpt_table(self, pid: int, state: dict) -> pa.Table:
        """Checkpoint columns only: ckpt_exclude'd derived columns and
        (optionally) the oid column are reconstructed on load instead of
        hitting disk every superstep."""
        p = self.parts[pid]
        skip = set(getattr(self.algo, "ckpt_exclude", ()))
        cols = {}
        if not getattr(self.algo, "ckpt_implicit_oid", False):
            cols["oid"] = pa.array(p.oids, pa.int64())
        from raylinkgraph.bsp import _pa_state_col

        for k, t in self.state_dtypes.items():
            if k not in skip:
                arr = state[k]
                if isinstance(arr, np.ndarray):
                    # enforce the Superstep replace-don't-mutate contract:
                    # the async flush wraps these arrays zero-copy; an
                    # in-place update from a future superstep now raises
                    # instead of persisting a corrupted checkpoint
                    arr.setflags(write=False)
                cols[k] = _pa_state_col(arr, t)
        return pa.table(cols)

    def _write_ckpt(self, workdir: str, step: int, pid: int) -> None:
        ckpt.write_state(
            workdir, step, pid, self._ckpt_table(pid, self.parts[pid].state)
        )

    def write_ckpt(self, workdir: str, step: int) -> None:
        for pid in self.pids:
            self._write_ckpt(workdir, step, pid)

    def scatter(self, scalars: dict) -> dict:
        """-> {target_pid: (pos chunk list | None, {payload: chunk list})}
        over ALL owned partitions, pre-combined per block by the
        algorithm. Chunks are NEVER concatenated — pickle ships each numpy
        array out-of-band zero-copy, and receivers reduce chunk-wise, so
        the round loop does no large allocations. With
        ``algo.static_messages`` the pos chunks ship only once (receivers
        cache them), the analogue of the reference's fixed preallocated
        message channels."""
        out: dict[int, list] = {}
        for p in self.parts.values():
            for block in p.blocks:
                for q, pos, payload in self.algo.scatter(p.state, block, scalars):
                    out.setdefault(int(q), []).append((pos, payload))
        static = getattr(self.algo, "static_messages", False)
        omit_pos = static and self._sent_pos
        packed = {}
        for q, parts in out.items():
            pos_chunks = None if omit_pos else [x[0] for x in parts]
            payload_chunks = {
                k: [x[1][k] for x in parts] for k in parts[0][1]
            }
            packed[q] = (pos_chunks, payload_chunks)
        if static:
            self._sent_pos = True
        return packed

    def confirm_flush(self) -> bool:
        """Barrier for the async checkpoint writer (see apply)."""
        t = getattr(self, "_flush", None)
        if t is not None:
            t.join()
            self._flush = None
        return True

    def apply(self, scalars: dict, workdir: str, next_step: int,
              checkpoint: bool, *scatter_outs) -> dict:
        merged: dict[str, float] = {}
        self.confirm_flush()  # never two in-flight flushes per worker
        for pid, p in self.parts.items():
            chunks: list[tuple[np.ndarray, dict]] = []
            for si, so in enumerate(scatter_outs):
                mine = so.get(pid)
                if mine is None:
                    continue
                pos_chunks = mine[0]
                if pos_chunks is None:
                    pos_chunks = self._pos_cache[(si, pid)]
                elif getattr(self.algo, "static_messages", False):
                    self._pos_cache[(si, pid)] = [
                        np.array(c, copy=True) for c in pos_chunks
                    ]
                payload_chunks = mine[1]
                keys = list(payload_chunks.keys())
                for j, pc in enumerate(pos_chunks):
                    chunks.append((pc, {k: payload_chunks[k][j] for k in keys}))
            if hasattr(self.algo, "apply_chunks"):
                p.state, partials = self.algo.apply_chunks(
                    p.oids, p.deg, p.state, chunks, scalars
                )
            else:
                if chunks:
                    msgs = {"pos": np.concatenate([c[0] for c in chunks])}
                    for k in self.algo.msg_dtypes:
                        msgs[k] = np.concatenate([c[1][k] for c in chunks])
                else:
                    msgs = {"pos": np.array([], np.int32)}
                    for k in self.algo.msg_dtypes:
                        msgs[k] = np.array([])
                p.state, partials = self.algo.apply(
                    p.oids, p.deg, p.state, msgs, scalars
                )
            for k, v in partials.items():
                merged[k] = merged.get(k, 0.0) + float(v)
        if checkpoint:
            # flush asynchronously: the parquet write overlaps the NEXT
            # round's scatter compute (supersteps replace state arrays, so
            # the writer's references stay immutable); the driver calls
            # confirm_flush() before committing the step's lineage, which
            # preserves crash consistency (lineage only after durable state)
            import threading

            tables = {
                pid: self._ckpt_table(pid, p.state)
                for pid, p in self.parts.items()
            }

            def flush():
                for pid, t in tables.items():
                    ckpt.write_state(workdir, next_step, pid, t)

            self._flush = threading.Thread(target=flush, daemon=True)
            self._flush.start()
        return merged


def _default_workers(P: int, wait_s: float = 15.0) -> int:
    """W = min(P, CPUs we can actually get). Sized from AVAILABLE (not
    total) CPUs: upstream Ray Data actor pools wind down asynchronously
    and Ray's accounting has been observed to permanently leak a token
    after ray.kill of a just-created actor — sizing W to the total
    budget then makes the W-th actor creation infeasible and the job
    hangs forever (observed live: 31/32 workers created, available=0,
    driver blocked in ray.get). Wait briefly for the full budget to
    come back, then take what is actually free; results are
    W-invariant, so running with fewer workers only changes speed."""
    budget = int(ray.cluster_resources().get("CPU", 4))
    deadline = time.time() + wait_s
    avail = ray.available_resources().get("CPU", 0.0)
    while avail < budget and time.time() < deadline:
        time.sleep(0.25)
        avail = ray.available_resources().get("CPU", 0.0)
    return max(1, min(P, int(avail)))


def run_bsp_actors(
    graph: LinkGraph,
    algo: Superstep,
    workdir: str,
    *,
    max_rounds: int = 100,
    resume: bool = True,
    keep_steps: int = 2,
    checkpoint_every: int = 1,
    num_workers: int | None = None,
) -> BSPResult:
    """Drop-in alternative to bsp.run_bsp with resident workers.

    ``num_workers`` defaults to the Ray CPU budget (minus one for the
    driver), each reserving one CPU — so ray.init(num_cpus=N) genuinely
    caps the engine's parallelism at N. Partitioning (P) is a property of
    the graph and does not change with W: results are W-invariant.
    ``checkpoint_every`` > 1 trades the north-rule's every-superstep
    checkpoint for throughput benchmarking; the default honours the rule.
    """
    P = graph.P
    W = num_workers or _default_workers(P)
    params = algo.params()
    digest = graph.digest()
    os.makedirs(workdir, exist_ok=True)
    scalar_names = list(algo.scalar_names)
    history: list[dict] = []

    while True:
        assignment = [
            [pid for pid in range(P) if pid % W == w] for w in range(W)
        ]
        workers = [
            _Worker.options(num_cpus=1).remote(
                graph.graph_dir, pids, algo.state_dtypes
            )
            for pids in assignment
            if pids
        ]
        try:
            # a creation that cannot be scheduled (leaked CPU token, a
            # stage that never released its pool) would block forever;
            # time out, shrink W to what is demonstrably free, retry
            ray.get([w.set_algo.remote(algo) for w in workers],
                    timeout=120)
            break
        except ray.exceptions.GetTimeoutError:
            for w in workers:
                ray.kill(w)
            free = int(ray.available_resources().get("CPU", 1))
            if W <= 1:
                raise RuntimeError(
                    "BSP worker creation timed out even at W=1 "
                    f"(available CPU={free}); cluster is wedged"
                )
            W = max(1, min(W - 1, free))

    start = ckpt.latest_complete_step(workdir, algo.name, params, digest, P) if resume else None
    if start is not None:
        step, lin = start
        scalars = dict(lin["scalars"])
        ray.get([w.load_state.remote(workdir, step) for w in workers])
        history.append(scalars)
    else:
        step = 0
        partials = ray.get([w.init_state.remote(workdir, True) for w in workers])
        scalars = {k: float(sum(p.get(k, 0.0) for p in partials)) for k in scalar_names}
        ckpt.write_lineage(
            workdir, 0, ckpt.lineage_for(algo.name, params, digest, P, 0, scalars)
        )
        history.append(scalars)

    rounds_done = step
    converged = algo.converged(scalars, rounds_done)
    loop_t0 = time.time()
    round_secs: list[float] = []
    # lineage commit for step N is deferred until step N+1's scatter is in
    # flight: the workers' async parquet flush overlaps the next round's
    # compute, and the commit (flush barrier + lineage write) happens off
    # the critical path. Crash consistency holds: a lineage file is only
    # ever written after its step's state files are durable.
    pending: tuple[int, list, dict] | None = None

    def commit(p):
        step_p, refs_p, scal_p = p
        ray.get(refs_p)
        ckpt.write_lineage(
            workdir, step_p,
            ckpt.lineage_for(algo.name, params, digest, P, step_p, scal_p),
        )
        ckpt.prune_steps(workdir, keep_from=max(0, step_p - keep_steps + 1))

    while not converged and rounds_done < max_rounds:
        rt0 = time.time()
        nxt = rounds_done + 1
        do_ckpt = (nxt % checkpoint_every == 0) or nxt >= max_rounds
        rscal = {**scalars, "_round": float(rounds_done)}
        scatter_refs = [w.scatter.remote(rscal) for w in workers]
        if pending is not None:
            commit(pending)
            pending = None
        partials = ray.get(
            [
                w.apply.remote(rscal, workdir, nxt, do_ckpt, *scatter_refs)
                for w in workers
            ]
        )
        scalars = {k: float(sum(p.get(k, 0.0) for p in partials)) for k in scalar_names}
        rounds_done = nxt
        converged = algo.converged(scalars, rounds_done)
        if converged and not do_ckpt:
            # final state must be durable even off the checkpoint cadence
            ray.get([w.write_ckpt.remote(workdir, nxt) for w in workers])
            do_ckpt = True
        if do_ckpt:
            pending = (
                nxt,
                [w.confirm_flush.remote() for w in workers],
                dict(scalars),
            )
        history.append(scalars)
        round_secs.append(time.time() - rt0)

    if pending is not None:
        commit(pending)
    iterate_sec = time.time() - loop_t0
    for w in workers:
        ray.kill(w)
    return BSPResult(
        workdir=workdir,
        final_step=rounds_done,
        rounds=rounds_done,
        converged=converged,
        scalars=scalars,
        history=history,
        iterate_sec=iterate_sec,
        round_secs=round_secs,
        graph_dir=graph.graph_dir,
    )
