"""Loader with the reference's option-suffix URI syntax.

Reference: python/graphscope/framework/loader.py:94-211 — a location
string may carry `#key=value` suffixes (`header_row`, `delimiter`), e.g.
``/data/edges.csv#header_row=true#delimiter=|``; protocol prefixes
(file://, s3:// etc.) pass through to the underlying reader. Format is
chosen by extension: .csv (pyarrow CSV options honored), .parquet,
.json/.jsonl. Without a header row, columns are named f0..fn (the
reference's positional addressing)."""

from __future__ import annotations

import os

import ray.data as rd


def parse_location(uri: str) -> tuple[str, dict]:
    parts = uri.split("#")
    path = parts[0]
    opts: dict[str, str] = {}
    for p in parts[1:]:
        if "=" in p:
            k, v = p.split("=", 1)
            # value is NOT stripped: a single-space delimiter
            # (`#delimiter= `, the .v/.e graph-file convention) is legal
            opts[k.strip()] = v
    return path, opts


def _bool(v: str, default: bool) -> bool:
    if v is None:
        return default
    return str(v).lower() in ("1", "true", "yes", "y")


def _probe_ncol(path: str, delim: str, filesystem=None) -> int:
    """Column count from the first line of the first CSV shard.

    Resolved through ``pyarrow.fs.FileSystem.from_uri`` so the probe
    follows the SAME filesystem the read will use — plain local paths,
    file:// URIs, and (on a real deployment) s3://, oss://, hdfs://
    (reference Loader protocol list, framework/loader.py:94-211) all take
    this one code path. A directory of shards (write_csv's layout) probes
    its lexicographically first shard."""
    from pyarrow import fs as pafs

    if filesystem is not None:
        fsys, fpath = filesystem, path
    elif "://" in path:
        fsys, fpath = pafs.FileSystem.from_uri(path)
    else:
        fsys, fpath = pafs.LocalFileSystem(), os.path.abspath(path)
    info = fsys.get_file_info(fpath)
    if info.type == pafs.FileType.Directory:
        shards = sorted(
            f.path for f in fsys.get_file_info(pafs.FileSelector(fpath))
            if f.path.lower().endswith(
                (".csv", ".tsv", ".txt",
                 ".csv.gz", ".tsv.gz", ".txt.gz")
            )
        )
        if not shards:
            raise FileNotFoundError(f"no CSV shards under {path}")
        fpath = shards[0]
    with fsys.open_input_stream(fpath) as f:
        head = f.read(1 << 16).decode("utf-8", "replace")
    first = head.split("\n", 1)[0].rstrip("\r")
    return len(first.split(delim))


def load_table(
    uri: str, *, columns: list[str] | None = None, filesystem=None
) -> rd.Dataset:
    """Read a table from an option-suffixed location string.

    ``filesystem`` (optional) is any ``pyarrow.fs.FileSystem`` — including
    ``PyFileSystem(FSSpecHandler(...))`` wrappers for fsspec-only schemes
    — forwarded to the Ray Data read AND the header probe, so remote
    object stores (the reference Loader's oss://, hdfs://, s3://,
    framework/loader.py:94-211) flow through the same code path as local
    files."""
    path, opts = parse_location(uri)
    lower = path.lower()
    # compressed shards: route by the inner extension (data.csv.gz ->
    # csv). pyarrow's open_input_stream and Ray's readers both
    # auto-detect the codec from the outer suffix, so only format
    # detection needs the strip.
    for comp in (".gz", ".bz2", ".zst", ".lz4"):
        if lower.endswith(comp):
            lower = lower[: -len(comp)]
            break
    # explicit `#format=` wins over the extension (reference Loader also
    # accepts an explicit format, framework/loader.py:94-211) — how
    # extension-less graph files (.v/.e) route into the CSV reader
    fmt = opts.get("format", "").strip().lower()
    if fmt == "parquet" or (not fmt and (lower.endswith(".parquet") or lower.endswith(".pq"))):
        return rd.read_parquet(path, columns=columns, filesystem=filesystem)
    if fmt == "json" or (not fmt and (lower.endswith(".json") or lower.endswith(".jsonl"))):
        ds = rd.read_json(path, filesystem=filesystem)
        return ds.select_columns(columns) if columns else ds
    if fmt == "csv" or (
        not fmt
        and (lower.endswith(".csv") or lower.endswith(".tsv") or lower.endswith(".txt"))
    ):
        from pyarrow import csv as pacsv

        delim = opts.get("delimiter", "\t" if lower.endswith(".tsv") else ",")
        if delim in ("\\t", "t"):  # loader.py accepts escaped tab
            delim = "\t"
        header = _bool(opts.get("header_row"), True)
        parse_options = pacsv.ParseOptions(delimiter=delim)
        if header:
            read_options = pacsv.ReadOptions()
        else:
            ncol = _probe_ncol(path, delim, filesystem)
            read_options = pacsv.ReadOptions(
                column_names=[f"f{i}" for i in range(ncol)]
            )
        ds = rd.read_csv(
            path,
            parse_options=parse_options,
            read_options=read_options,
            filesystem=filesystem,
        )
        return ds.select_columns(columns) if columns else ds
    raise ValueError(f"unsupported location: {uri}")


def edges_from_pandas(
    df, src_col: str = "src_id", dst_col: str = "dst_id",
    weight_col: str | None = None,
) -> rd.Dataset:
    """Edge Dataset from an in-memory pandas DataFrame (the reference
    Loader accepts DataFrames directly, framework/loader.py:94-211) ->
    columns (src_id, dst_id[, weight]) ready for LinkGraph.build."""
    import numpy as np
    import pandas as pd

    cols = {
        "src_id": df[src_col].to_numpy(np.int64),
        "dst_id": df[dst_col].to_numpy(np.int64),
    }
    if weight_col is not None:
        cols["weight"] = df[weight_col].to_numpy(np.float64)
    return rd.from_pandas(pd.DataFrame(cols))


def edges_from_coo(src, dst, weight=None) -> rd.Dataset:
    """Edge Dataset from parallel numpy COO arrays (reference Loader's
    numpy input form)."""
    import numpy as np
    import pandas as pd

    cols = {
        "src_id": np.asarray(src, np.int64),
        "dst_id": np.asarray(dst, np.int64),
    }
    if weight is not None:
        cols["weight"] = np.asarray(weight, np.float64)
    return rd.from_pandas(pd.DataFrame(cols))


def edges_from_csr(indptr, indices, weight=None) -> rd.Dataset:
    """Edge Dataset from CSR arrays (indptr of length n+1, indices of
    length nnz): row i owns indices[indptr[i]:indptr[i+1]] — the
    reference Loader's scipy-CSR input form, without needing scipy."""
    import numpy as np

    indptr = np.asarray(indptr, np.int64)
    indices = np.asarray(indices, np.int64)
    deg = np.diff(indptr)
    src = np.repeat(np.arange(len(deg), dtype=np.int64), deg)
    return edges_from_coo(src, indices, weight)


def write_table(ds: rd.Dataset, uri: str, *, filesystem=None) -> None:
    """Extension-routed result sink (the reference's `.output(fd)` /
    to_data_sink surface, context.py:137-288 dag_utils.py:883-957):
    .parquet -> write_parquet, .csv -> write_csv, .json/.jsonl ->
    write_json; any pyarrow.fs filesystem (local/oss/hdfs/s3) flows
    through, same as the loader side. The uri names a DIRECTORY of
    shards (Ray's resumable partitioned layout), never one giant file."""
    path, opts = parse_location(uri)
    lower = path.lower()
    fmt = opts.get("format", "").strip().lower()
    if fmt == "parquet" or (not fmt and (lower.endswith(".parquet") or lower.endswith(".pq"))):
        ds.write_parquet(path, filesystem=filesystem)
    elif fmt == "csv" or (not fmt and lower.endswith(".csv")):
        ds.write_csv(path, filesystem=filesystem)
    elif fmt == "json" or (not fmt and (lower.endswith(".json") or lower.endswith(".jsonl"))):
        ds.write_json(path, filesystem=filesystem)
    else:
        raise ValueError(f"write_table: cannot infer format from {uri!r}")
