#!/usr/bin/env python
"""Job entrypoint for the north-rule pipeline on a STANDING Ray cluster.

On a real multi-node cluster this is what the job manager executes:

    ray job submit --working-dir /root/repo -- \
        python scripts/job_pagerank.py <pages_dir> <out_root>

This sandbox image lacks ray[default]'s job server (`ray job submit`
raises "requires the ray[default] installation"), so the same
execution context is exercised directly: start a head with
`ray start --head`, then run this script, which attaches via
`ray.init(address="auto")` — exactly how a submitted job's driver
attaches. `scripts/job_resume_demo.py` drives the full north-rule
story against it: submit, SIGKILL mid-iteration, resubmit, verify the
resumed final state is bitwise-equal to an uninterrupted run.

Steps (all idempotent / resumable):
  1. build the linkgraph from the pages parquet if <out_root>/graph
     has no meta.json (per-partition parquet artifacts, skippable)
  2. run PageRank to 1e-6 with per-superstep checkpoints + lineage
     (resume=True: a rerun continues from the latest COMPLETE step)
  3. write final ranks to <out_root>/ranks.parquet and print a
     one-line JSON summary to stdout
"""

from __future__ import annotations

import json
import os
import sys


def main() -> None:
    pages_dir = sys.argv[1]
    out_root = sys.argv[2]
    num_cpus = int(sys.argv[3]) if len(sys.argv) > 3 else None

    import ray

    if not ray.is_initialized():
        # inside `ray job submit` RAY_ADDRESS is set by the job manager;
        # against a local `ray start --head`, "auto" finds the GCS.
        ray.init(address=os.environ.get("RAY_ADDRESS", "auto"),
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from raylinkgraph.algos import PageRank
    from raylinkgraph.bsp_actors import run_bsp_actors
    from raylinkgraph.pipelines.linkgraph import build_linkgraph_from_pages
    from raylinkgraph.stages.graph_build import LinkGraph

    gdir = os.path.join(out_root, "graph")
    if os.path.exists(os.path.join(gdir, "meta.json")):
        graph = LinkGraph(gdir)  # finished build: skip (resumable output)
    else:
        graph, _ = build_linkgraph_from_pages(
            pages_dir, out_root, P=32, write_text_table=False,
            extract_concurrency=(1, max(2, (num_cpus or 8) - 2)),
        )

    res = run_bsp_actors(
        graph,
        PageRank(graph.n_vertices, alpha=0.85, tol=1e-6, max_rounds=100),
        os.path.join(out_root, "ck-pagerank"),
        resume=True,
        num_workers=num_cpus,
    )
    ranks = res.state_pandas()[["oid", "rank"]]
    out_parquet = os.path.join(out_root, "ranks.parquet")
    ranks.to_parquet(out_parquet, index=False)
    print(json.dumps({
        "n_vertices": graph.n_vertices,
        "n_edges": graph.n_edges,
        "rounds": res.rounds,
        "final_step": res.final_step,
        "converged": res.converged,
        "out": out_parquet,
    }))


if __name__ == "__main__":
    main()
