"""Bundled dataset loaders + standard graph-file readers.

The reference ships ``graphscope.dataset`` — 15+ convenience loaders
(load_p2p_network python/graphscope/dataset/p2p_network.py:26, load_ldbc
ldbc.py:27, load_modern_graph modern_graph.py:25, ...) that each
download a fixture and register its labeled vertex/edge tables on a
property graph. This module is the Ray-Data-native equivalent:

* ``read_graphalytics`` / ``read_snap_edges`` parse the two public
  on-disk graph formats the reference's test harness consumes
  (libgrape-lite ``.v``/``.e`` files, analytical_engine/test/app_tests.sh:403;
  SNAP edge lists with ``#`` comments) into lazy ``ray.data.Dataset``s
  via the option-suffix Loader — no driver-side row parsing, shardable
  exactly like any CSV read.
* ``load_modern_graph`` / ``load_p2p_network`` return a
  :class:`~raylinkgraph.pipelines.property_graph.PropertyGraph` over
  small vendored fixtures (offline — the sandbox has no network; the
  reference downloads from its DATA_SITE). modern_graph is the public
  6-vertex TinkerPop toy dataset in the reference's exact CSV layout
  (``|``-delimited person/software/knows/created, modern_graph.py:80-108);
  p2p-mini is a deterministic synthetic Gnutella-shaped graph in
  ``.v``/``.e`` format standing in for p2p-Gnutella31.

A loaded graph is projected with ``pg.to_simple(graph_dir, ...)`` and
then runs any algorithm — the same load -> project -> run_app flow as
the reference tutorials.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import ray.data as rd

from raylinkgraph.pipelines.property_graph import PropertyGraph
from raylinkgraph.sources.loader import load_table

_DATA_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")


def read_graphalytics(
    vfile: str, efile: str, *, weighted: bool | None = None
) -> tuple[rd.Dataset, rd.Dataset]:
    """LDBC-Graphalytics / libgrape-lite format: ``.v`` = one int vertex
    id per line; ``.e`` = ``src dst [weight]`` space-delimited
    (test/run_app.cc --vfile/--efile convention). Returns lazy
    (vertices(vid), edges(src_id, dst_id[, weight])) Datasets.

    ``weighted=None`` auto-detects from the first edge row."""
    v = load_table(f"{vfile}#format=csv#header_row=false#delimiter= ")
    v = v.select_columns(["f0"]).map_batches(
        lambda t: pa.table({"vid": t.column("f0").cast(pa.int64())}),
        batch_format="pyarrow",
    )
    e_raw = load_table(f"{efile}#format=csv#header_row=false#delimiter= ")
    ncol = len(e_raw.schema().names)
    if weighted is None:
        weighted = ncol >= 3

    def to_edges(t: pa.Table, weighted=weighted) -> pa.Table:
        cols = {
            "src_id": t.column("f0").cast(pa.int64()),
            "dst_id": t.column("f1").cast(pa.int64()),
        }
        if weighted:
            cols["weight"] = t.column("f2").cast(pa.float64())
        return pa.table(cols)

    return v, e_raw.map_batches(to_edges, batch_format="pyarrow")


def read_snap_edges(path: str) -> rd.Dataset:
    """SNAP edge-list format (the reference's p2p fixtures originate from
    SNAP, p2p_network.py:31): ``#``-prefixed comment header lines then
    whitespace/tab-delimited ``src dst`` rows. Parsed via a sharded
    ``read_text`` + vectorized Arrow whitespace split, so ragged comment
    lines can't break a columnar CSV parse."""
    import pyarrow.compute as pc

    raw = rd.read_text(path)

    def to_edges(t: pa.Table) -> pa.Table:
        s = pc.utf8_trim_whitespace(t.column("text").cast(pa.string()))
        keep = pc.and_(
            pc.invert(pc.starts_with(s, "#")), pc.greater(pc.utf8_length(s), 0)
        )
        parts = pc.utf8_split_whitespace(s.filter(keep))
        return pa.table(
            {
                "src_id": pc.list_element(parts, 0).cast(pa.int64()),
                "dst_id": pc.list_element(parts, 1).cast(pa.int64()),
            }
        )

    return raw.map_batches(to_edges, batch_format="pyarrow")


def load_modern_graph(prefix: str | None = None) -> PropertyGraph:
    """The TinkerPop 'modern' toy graph with the reference's exact label
    schema (modern_graph.py:80-108): person/software vertices,
    knows/created weighted edges, '|'-delimited CSVs."""
    prefix = prefix or os.path.join(_DATA_DIR, "modern_graph")

    def tbl(name: str) -> rd.Dataset:
        return load_table(f"{os.path.join(prefix, name)}#delimiter=|")

    person, software = tbl("person.csv"), tbl("software.csv")
    return (
        PropertyGraph()
        .add_vertices("person", person, "id")
        .add_vertices("software", software, "id")
        .add_edges(
            "knows", tbl("knows.csv"), "src_id", "dst_id",
            src_label="person", dst_label="person", weight_col="weight",
        )
        .add_edges(
            "created", tbl("created.csv"), "src_id", "dst_id",
            src_label="person", dst_label="software", weight_col="weight",
        )
    )


def load_p2p_network(prefix: str | None = None) -> PropertyGraph:
    """Gnutella-shaped p2p graph (reference p2p_network.py:26 — single
    'host' vertex label, 'connect' edge label with a weight property).
    The bundled fixture is a deterministic 120-vertex synthetic graph in
    ``.v``/``.e`` format; pass ``prefix`` to read real p2p-31 files."""
    prefix = prefix or os.path.join(_DATA_DIR, "p2p_mini")
    name = "p2p-31" if os.path.exists(os.path.join(prefix, "p2p-31.v")) else "p2p-mini"
    v, e = read_graphalytics(
        os.path.join(prefix, f"{name}.v"), os.path.join(prefix, f"{name}.e")
    )
    return (
        PropertyGraph()
        .add_vertices("host", v, "vid")
        .add_edges(
            "connect", e, "src_id", "dst_id",
            src_label="host", dst_label="host", weight_col="weight",
        )
    )
