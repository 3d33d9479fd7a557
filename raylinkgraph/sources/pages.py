"""Pages-table source: deterministic synthetic generation + Parquet IO.

Mirrors the reference's loader surface (SURVEY.md §2.3,
`core/loader/arrow_fragment_loader.h:199-252`) recast as Ray Data: the
table is written as one Parquet file per fixed-size generation shard
(resumable — a rerun skips shards whose files already exist), and read
back with `ray.data.read_parquet` with column pruning.
"""

from __future__ import annotations

import json
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data as rd

from raylinkgraph.schema import PageGen

GEN_VERSION = 2  # bump when the generator's content changes


def generate_pages_parquet(
    out_dir: str, n_pages: int, seed: int = 42, use_ray: bool = True
) -> str:
    """Write the deterministic pages table to ``out_dir`` (one file per
    generation shard). Idempotent and resumable: existing shard files are
    kept (shard content depends only on (n_pages, seed, GEN_VERSION));
    a stale generator version clears the directory first."""
    meta_path = os.path.join(out_dir, "_gen_meta.json")
    want_meta = {"n_pages": n_pages, "seed": seed, "version": GEN_VERSION}
    if os.path.isdir(out_dir):
        have = None
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                have = json.load(f)
        if have != want_meta:
            shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    with open(meta_path, "w") as f:
        json.dump(want_meta, f)
    gen = PageGen(n_pages, seed)
    todo = [
        s
        for s in range(gen.num_shards())
        if not os.path.exists(os.path.join(out_dir, f"shard-{s:05d}.parquet"))
    ]
    if not todo:
        return out_dir

    def write_shard(s: int) -> None:
        table = PageGen(n_pages, seed).shard_table(s)
        tmp = os.path.join(out_dir, f".shard-{s:05d}.tmp")
        pq.write_table(table, tmp)
        os.rename(tmp, os.path.join(out_dir, f"shard-{s:05d}.parquet"))

    if use_ray and ray.is_initialized() and len(todo) > 1:
        remote = ray.remote(num_cpus=1)(write_shard)
        ray.get([remote.remote(s) for s in todo])
    else:
        for s in todo:
            write_shard(s)
    return out_dir


def read_pages(path: str, columns: list[str] | None = None) -> rd.Dataset:
    """Read a pages table directory/file with column pruning at the read."""
    return rd.read_parquet(path, columns=columns)
