#!/usr/bin/env python
"""sf1 soak of the flagship pipeline (round-3 verdict item 8).

Runs the north-rule pipeline at 10x the bench scale (1.2M pages
~ 15M extracted links) and records, per stage: wall seconds, the PEAK
box memory in use while the stage ran (0.5s sampler over
/proc/meminfo, so Ray worker + object-store growth is included — the
cheapest way to catch hidden O(V)-driver accumulation or tiny-block
blowup the sf0.1 bench can't see), and bracketing box-health probes.

Usage:  python scripts/soak.py [n_pages] [num_cpus]
Output: one JSON line; record the numbers in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import SICK_MOPS, box_probe_mops  # noqa: E402

N_PAGES = int(sys.argv[1]) if len(sys.argv) > 1 else 1_200_000
NUM_CPUS = int(sys.argv[2]) if len(sys.argv) > 2 else 32
SEED = 42
ROOT = "/tmp/raylinkgraph_soak"


def mem_used_gib() -> float:
    info = {}
    with open("/proc/meminfo") as f:
        for line in f:
            k, v = line.split(":", 1)
            info[k] = int(v.split()[0])
    return (info["MemTotal"] - info["MemAvailable"]) / (1 << 20)


class MemSampler:
    def __init__(self) -> None:
        self.peak = 0.0
        self._stop = threading.Event()
        self._t = threading.Thread(target=self._loop, daemon=True)

    def _loop(self) -> None:
        while not self._stop.is_set():
            self.peak = max(self.peak, mem_used_gib())
            self._stop.wait(0.5)

    def __enter__(self):
        self.peak = mem_used_gib()
        self._t.start()
        return self

    def __exit__(self, *exc):
        self._stop.set()
        self._t.join()


def main() -> None:
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from raylinkgraph.algos import CDLP, WCC, PageRank
    from raylinkgraph.algos.triangles import run_triangles
    from raylinkgraph.bsp_actors import run_bsp_actors
    from raylinkgraph.pipelines.linkgraph import (
        build_linkgraph_from_pages,
        undirected_view,
    )
    from raylinkgraph.sources.pages import generate_pages_parquet

    stages: dict[str, dict] = {}
    state: dict = {}

    def stage(name: str, fn) -> None:
        before = box_probe_mops()
        with MemSampler() as ms:
            t0 = time.time()
            fn()
            wall = time.time() - t0
        after = box_probe_mops()
        stages[name] = {
            "sec": round(wall, 2),
            "peak_mem_gib": round(ms.peak, 2),
            "probe_mops": [before, after],
            "sick": min(before, after) < SICK_MOPS,
        }
        print(f"## {name}: {stages[name]}", file=sys.stderr, flush=True)

    pages_dir = os.path.join(ROOT, f"pages-{N_PAGES}-s{SEED}")
    run_tag = f"soak-{N_PAGES}-c{NUM_CPUS}"
    gdir = os.path.join(ROOT, f"g-{run_tag}")
    base_mem = mem_used_gib()

    stage("generate_pages",
          lambda: generate_pages_parquet(pages_dir, N_PAGES, seed=SEED))
    def _build():
        g, _vmap = build_linkgraph_from_pages(
            pages_dir, gdir, P=32, vmap_partitions=64,
            extract_concurrency=(max(1, NUM_CPUS // 2), max(2, NUM_CPUS - 2)),
            extract_batch_size=256,
        )
        state["g"] = g

    stage("build_extract_edges_csr", _build)
    stage("build_undirected", lambda: state.update(
        gu=undirected_view(state["g"], os.path.join(ROOT, f"gu-{run_tag}"))))

    def _pr():
        g = state["g"]
        state["pr"] = run_bsp_actors(
            g,
            PageRank(g.n_vertices, alpha=0.85, tol=1e-6, max_rounds=200),
            os.path.join(ROOT, f"pr-{run_tag}"),
            max_rounds=200,
        )

    stage("pagerank", _pr)
    stage("wcc", lambda: state.update(wcc=run_bsp_actors(
        state["gu"], WCC(), os.path.join(ROOT, f"wcc-{run_tag}"),
        max_rounds=10_000)))
    stage("cdlp", lambda: state.update(cdlp=run_bsp_actors(
        state["gu"], CDLP(max_rounds=10),
        os.path.join(ROOT, f"cdlp-{run_tag}"), max_rounds=10)))
    stage("triangles", lambda: state.update(tri=run_triangles(
        state["gu"], os.path.join(ROOT, f"tri-{run_tag}")).count()))

    pr = state["pr"]
    out = {
        "metric": "sf1_soak",
        "n_pages": N_PAGES,
        "num_cpus": NUM_CPUS,
        "n_vertices": state["g"].n_vertices,
        "n_edges": state["g"].n_edges,
        "base_mem_gib": round(base_mem, 2),
        "stages": stages,
        "pagerank": {
            "rounds": pr.rounds,
            "converged": pr.converged,
            "iterate_sec": round(pr.iterate_sec, 3),
            "best_round_sec": round(min(pr.round_secs), 3) if pr.round_secs else None,
        },
    }
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
