"""Per-superstep Parquet checkpoints + lineage (north-rule resumability).

Layout under a run's workdir:

    step=00000/state-00000.parquet ... state-{P-1}.parquet
    step=00000/_lineage.json        <- written LAST; marks the step complete

State files double as the BSP state transport between supersteps (scatter
and apply read the previous step's files, apply writes the next step's),
so checkpointing is not an extra copy — it IS the engine's state exchange.
A killed run resumes from the latest complete step whose lineage matches
(algo, params, graph digest, P). The reference has no intra-job recovery
at all (SURVEY.md §4 fault-tolerance row); its only analogue is whole-graph
serialize/deserialize (python/graphscope/framework/dag_utils.py:1115-1145).
"""

from __future__ import annotations

import json
import os
import shutil
import time

import pyarrow as pa
import pyarrow.parquet as pq


def step_dir(workdir: str, step: int) -> str:
    return os.path.join(workdir, f"step={step:05d}")


def state_path(workdir: str, step: int, pid: int) -> str:
    return os.path.join(step_dir(workdir, step), f"state-{pid:05d}.parquet")


def write_state(workdir: str, step: int, pid: int, table: pa.Table) -> None:
    d = step_dir(workdir, step)
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, f".state-{pid:05d}.tmp")
    # uncompressed: state writes are on the per-superstep critical path and
    # encode speed beats the ~2x size (numeric columns, short-lived files)
    pq.write_table(table, tmp, compression="NONE")
    os.rename(tmp, os.path.join(d, f"state-{pid:05d}.parquet"))


def read_state(workdir: str, step: int, pid: int, columns=None) -> pa.Table:
    return pq.read_table(state_path(workdir, step, pid), columns=columns)


def write_lineage(workdir: str, step: int, lineage: dict) -> None:
    d = step_dir(workdir, step)
    tmp = os.path.join(d, "._lineage.tmp")
    with open(tmp, "w") as f:
        json.dump(lineage, f)
    os.rename(tmp, os.path.join(d, "_lineage.json"))


def read_lineage(workdir: str, step: int) -> dict | None:
    p = os.path.join(step_dir(workdir, step), "_lineage.json")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def lineage_for(algo_name: str, params: dict, graph_digest: str, P: int, step: int,
                scalars: dict) -> dict:
    return {
        "algo": algo_name,
        "params": params,
        "graph_digest": graph_digest,
        "P": P,
        "step": step,
        "scalars": {k: float(v) for k, v in scalars.items()},
        "wall_ts": time.time(),
    }


def latest_complete_step(
    workdir: str, algo_name: str, params: dict, graph_digest: str, P: int
) -> tuple[int, dict] | None:
    """Largest step with a matching lineage and all P state files present."""
    if not os.path.isdir(workdir):
        return None
    steps = sorted(
        (
            int(d.split("=")[1])
            for d in os.listdir(workdir)
            if d.startswith("step=") and d.split("=")[1].isdigit()
        ),
        reverse=True,
    )
    for s in steps:
        lin = read_lineage(workdir, s)
        if (
            lin
            and lin.get("algo") == algo_name
            and lin.get("params") == params
            and lin.get("graph_digest") == graph_digest
            and lin.get("P") == P
            and all(os.path.exists(state_path(workdir, s, p)) for p in range(P))
        ):
            return s, lin
    return None


def prune_steps(workdir: str, keep_from: int) -> None:
    """Drop step dirs below ``keep_from`` (bounded disk; latest steps are
    both the resume point and the live state)."""
    if not os.path.isdir(workdir):
        return
    for d in os.listdir(workdir):
        if d.startswith("step=") and d.split("=")[1].isdigit():
            if int(d.split("=")[1]) < keep_from:
                shutil.rmtree(os.path.join(workdir, d), ignore_errors=True)
