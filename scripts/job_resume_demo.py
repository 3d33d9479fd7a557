#!/usr/bin/env python
"""North-rule kill/resume demonstration against a STANDING Ray cluster.

Drives scripts/job_pagerank.py the way `ray job submit` would (same
attach path: the entrypoint runs in its own process and connects to
the running GCS via address="auto"; the sandbox lacks ray[default]'s
job server, so the submission transport is subprocess instead of the
REST client — the driver lifecycle being exercised is identical):

  1. baseline: submit the job on a fresh workdir, let it finish
  2. submit on a second fresh workdir, SIGKILL the driver
     mid-iteration (the cluster survives — jobs are processes)
  3. resubmit the SAME command; it must resume from the latest
     COMPLETE per-partition checkpoint (lineage-gated) and finish
  4. assert the resumed ranks.parquet content equals the
     uninterrupted run's EXACTLY (bitwise on the float64 ranks)

Usage: a Ray head must already be running (`ray start --head
--num-cpus=8`); then  python scripts/job_resume_demo.py [pages_dir].
Prints one JSON line with the verdict.
"""

from __future__ import annotations

import json
import os
import shutil
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ROOT = "/tmp/raylinkgraph_jobdemo"


def submit(pages: str, out: str, wait: bool = True) -> subprocess.Popen:
    env = dict(os.environ, PYTHONPATH=REPO)
    p = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "scripts", "job_pagerank.py"),
         pages, out, "6"],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
    )
    if wait:
        p.wait()
        assert p.returncode == 0, f"job failed rc={p.returncode}"
    return p


def latest_step(ck: str) -> int:
    if not os.path.isdir(ck):
        return -1
    steps = [int(d.split("=")[1]) for d in os.listdir(ck) if d.startswith("step=")]
    return max(steps, default=-1)


def main() -> None:
    pages = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        ROOT, "pages-30000-s42"
    )
    if not os.path.isdir(pages):
        # build a pages table on the standing cluster, job-style
        env = dict(os.environ, PYTHONPATH=REPO)
        subprocess.run(
            [sys.executable, "-c",
             "import sys, ray; ray.init(address='auto', logging_level='ERROR');"
             "from raylinkgraph.sources.pages import generate_pages_parquet;"
             f"generate_pages_parquet({pages!r}, 30000, seed=42)"],
            env=env, check=True,
        )

    a = os.path.join(ROOT, "run-a")
    b = os.path.join(ROOT, "run-b")
    for d in (a, b):
        shutil.rmtree(d, ignore_errors=True)

    submit(pages, a)  # uninterrupted baseline

    # interrupted run: SIGKILL the driver once iteration has begun
    p = submit(pages, b, wait=False)
    ck = os.path.join(b, "ck-pagerank")
    t0 = time.time()
    while latest_step(ck) < 1 and time.time() - t0 < 600:
        if p.poll() is not None:
            raise SystemExit("job finished before it could be killed; "
                             "rerun with a bigger pages table")
        time.sleep(0.1)
    killed_at = latest_step(ck)
    p.send_signal(signal.SIGKILL)
    p.wait()

    p2 = submit(pages, b)  # resubmit: must resume, not restart
    summary = json.loads(p2.stdout.read().strip().splitlines()[-1])

    import pyarrow.parquet as pq

    ra = pq.read_table(os.path.join(a, "ranks.parquet")).to_pandas()
    rb = pq.read_table(os.path.join(b, "ranks.parquet")).to_pandas()
    ra = ra.sort_values("oid").reset_index(drop=True)
    rb = rb.sort_values("oid").reset_index(drop=True)
    bitwise = bool(
        (ra["oid"].to_numpy() == rb["oid"].to_numpy()).all()
        and (ra["rank"].to_numpy().view("u8")
             == rb["rank"].to_numpy().view("u8")).all()
    )
    print(json.dumps({
        "metric": "job_kill_resume",
        "killed_at_step": killed_at,
        "resumed_rounds_total": summary["rounds"],
        "converged": summary["converged"],
        "bitwise_equal_to_uninterrupted": bitwise,
    }))
    assert bitwise, "resumed ranks differ from uninterrupted run"


if __name__ == "__main__":
    main()
