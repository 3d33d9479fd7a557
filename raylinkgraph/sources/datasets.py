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


def load_cora(prefix: str | None = None) -> PropertyGraph:
    """Cora citation network (reference cora.py:26 — 'paper' vertices from
    node.csv with word-vector features + class label, 'cites' edges from
    edge.csv). The bundled fixture is a deterministic 48-paper synthetic
    stand-in in the same layout; pass ``prefix`` for the real files."""
    prefix = prefix or os.path.join(_DATA_DIR, "cora")
    node = load_table(os.path.join(prefix, "node.csv"))
    edge = load_table(os.path.join(prefix, "edge.csv"))
    return (
        PropertyGraph()
        .add_vertices("paper", node, "id")
        .add_edges(
            "cites", edge, "src_id", "dst_id",
            src_label="paper", dst_label="paper",
        )
    )


def load_u2i(prefix: str | None = None) -> PropertyGraph:
    """User-item bipartite graph (reference u2i.py:28 — ONE node.csv
    registered as BOTH 'u' and 'i' labels, edge.csv registered forward as
    'u-i' and reversed as 'u-i_reverse', all tab-delimited). Feeds
    lpa_u2i end-to-end from files."""
    prefix = prefix or os.path.join(_DATA_DIR, "u2i")
    node = load_table(os.path.join(prefix, "node.csv") + "#delimiter=\t")
    edge = load_table(os.path.join(prefix, "edge.csv") + "#delimiter=\t")
    return (
        PropertyGraph()
        .add_vertices("u", node, "id")
        .add_vertices("i", node, "id")
        .add_edges(
            "u-i", edge, "src_id", "dst_id",
            src_label="u", dst_label="i", weight_col="weight",
        )
        .add_edges(
            "u-i_reverse", edge, "dst_id", "src_id",
            src_label="i", dst_label="u", weight_col="weight",
        )
    )


def load_ogbn_mag(prefix: str | None = None) -> PropertyGraph:
    """ogbn-mag academic graph (reference ogbn_mag.py:75-108): paper /
    author / institution / field_of_study vertex labels; affiliated /
    hasTopic / cites / writes edge labels. Bundled fixture: deterministic
    small synthetic stand-in in the same csv layout."""
    prefix = prefix or os.path.join(_DATA_DIR, "ogbn_mag_small")

    def tbl(name: str) -> rd.Dataset:
        return load_table(os.path.join(prefix, f"{name}.csv"))

    return (
        PropertyGraph()
        .add_vertices("paper", tbl("paper"), "id")
        .add_vertices("author", tbl("author"), "id")
        .add_vertices("institution", tbl("institution"), "id")
        .add_vertices("field_of_study", tbl("field_of_study"), "id")
        .add_edges(
            "affiliated", tbl("author_affiliated_with_institution"),
            "src_id", "dst_id", src_label="author", dst_label="institution",
        )
        .add_edges(
            "hasTopic", tbl("paper_has_topic_field_of_study"),
            "src_id", "dst_id", src_label="paper", dst_label="field_of_study",
        )
        .add_edges(
            "cites", tbl("paper_cites_paper"),
            "src_id", "dst_id", src_label="paper", dst_label="paper",
        )
        .add_edges(
            "writes", tbl("author_writes_paper"),
            "src_id", "dst_id", src_label="author", dst_label="paper",
        )
    )


# (elabel, file stem, src field, src label, dst field, dst label, weight)
# — the reference's full ldbc_sample spec (ldbc.py:76-460); edge families
# spanning several (src, dst) label pairs become one edge label per pair,
# which is how the reference's fragments store them internally anyway.
_LDBC_EDGES = [
    ("replyOf", "comment_replyOf_comment", "Comment.id", "comment",
     "Comment.id.1", "comment", None),
    ("replyOf", "comment_replyOf_post", "Comment.id", "comment",
     "Post.id", "post", None),
    ("isPartOf", "place_isPartOf_place", "Place.id", "place",
     "Place.id.1", "place", None),
    ("isSubclassOf", "tagclass_isSubclassOf_tagclass", "TagClass.id",
     "tagclass", "TagClass.id.1", "tagclass", None),
    ("hasTag", "forum_hasTag_tag", "Forum.id", "forum", "Tag.id", "tag", None),
    ("hasTag", "comment_hasTag_tag", "Comment.id", "comment", "Tag.id", "tag", None),
    ("hasTag", "post_hasTag_tag", "Post.id", "post", "Tag.id", "tag", None),
    ("knows", "person_knows_person", "Person.id", "person",
     "Person.id.1", "person", None),
    ("hasModerator", "forum_hasModerator_person", "Forum.id", "forum",
     "Person.id", "person", None),
    ("hasInterest", "person_hasInterest_tag", "Person.id", "person",
     "Tag.id", "tag", None),
    ("isLocatedIn", "post_isLocatedIn_place", "Post.id", "post",
     "Place.id", "place", None),
    ("isLocatedIn", "comment_isLocatedIn_place", "Comment.id", "comment",
     "Place.id", "place", None),
    ("isLocatedIn", "organisation_isLocatedIn_place", "Organisation.id",
     "organisation", "Place.id", "place", None),
    ("isLocatedIn", "person_isLocatedIn_place", "Person.id", "person",
     "Place.id", "place", None),
    ("hasType", "tag_hasType_tagclass", "Tag.id", "tag",
     "TagClass.id", "tagclass", None),
    ("hasCreator", "post_hasCreator_person", "Post.id", "post",
     "Person.id", "person", None),
    ("hasCreator", "comment_hasCreator_person", "Comment.id", "comment",
     "Person.id", "person", None),
    ("containerOf", "forum_containerOf_post", "Forum.id", "forum",
     "Post.id", "post", None),
    ("hasMember", "forum_hasMember_person", "Forum.id", "forum",
     "Person.id", "person", None),
    ("workAt", "person_workAt_organisation", "Person.id", "person",
     "Organisation.id", "organisation", None),
    ("studyAt", "person_studyAt_organisation", "Person.id", "person",
     "Organisation.id", "organisation", None),
    ("likes", "person_likes_comment", "Person.id", "person",
     "Comment.id", "comment", None),
    ("likes", "person_likes_post", "Person.id", "person",
     "Post.id", "post", None),
]

_LDBC_VERTICES = [
    "comment", "organisation", "tagclass", "person",
    "forum", "place", "post", "tag",
]


def load_ldbc(prefix: str | None = None) -> PropertyGraph:
    """LDBC SNB sample graph (reference ldbc.py:27 load_ldbc — 8 vertex
    labels, 15 edge families over 23 '|'-delimited csv files). Families
    that span several (src, dst) label pairs register one edge label per
    pair: ``{family}_{src}_{dst}``. Bundled fixture: a deterministic
    referentially-consistent miniature in the exact same layout; pass
    ``prefix`` to load a real ldbc_sample export."""
    prefix = prefix or os.path.join(_DATA_DIR, "ldbc_sample")

    def tbl(stem: str) -> rd.Dataset:
        return load_table(os.path.join(prefix, f"{stem}_0_0.csv") + "#delimiter=|")

    pg = PropertyGraph()
    for lab in _LDBC_VERTICES:
        pg.add_vertices(lab, tbl(lab), "id")
    for fam, stem, sfield, sl, dfield, dl, wcol in _LDBC_EDGES:
        n = sum(1 for f, *_ in _LDBC_EDGES if f == fam)
        label = fam if n == 1 else f"{fam}_{sl}_{dl}"
        pg.add_edges(
            label, tbl(stem), sfield, dfield,
            src_label=sl, dst_label=dl, weight_col=wcol,
        )
    return pg


def _simple_graph(
    fixture: str, vlabel: str, elabel: str, prefix: str | None,
    node_file: str = "nodes.csv",
) -> PropertyGraph:
    """Shared shape of the reference's single-label node/edge loaders
    (ppi.py, ogbn_arxiv.py, ogbl_collab.py, ogbl_ddi.py,
    ogbn_proteins.py): one vertex csv keyed 'id', one edge csv with
    (src_id, dst_id) first — any extra columns ride along as edge
    properties, exactly like the reference's property-less add_edges."""
    prefix = prefix or os.path.join(_DATA_DIR, fixture)
    nodes = load_table(os.path.join(prefix, node_file))
    edges = load_table(os.path.join(prefix, "edge.csv"))
    return (
        PropertyGraph()
        .add_vertices(vlabel, nodes, "id")
        .add_edges(
            elabel, edges, "src_id", "dst_id",
            src_label=vlabel, dst_label=vlabel,
        )
    )


def load_ppi(prefix: str | None = None) -> PropertyGraph:
    """Protein-protein interaction graph (reference ppi.py:26:
    'protein' vertices, 'link' edges)."""
    return _simple_graph("ppi", "protein", "link", prefix, node_file="node.csv")


def load_ogbn_arxiv(prefix: str | None = None) -> PropertyGraph:
    """ogbn-arxiv citation graph (reference ogbn_arxiv.py:26: 'paper'
    vertices, 'citation' edges)."""
    return _simple_graph("ogbn_arxiv", "paper", "citation", prefix)


def load_ogbl_collab(prefix: str | None = None) -> PropertyGraph:
    """ogbl-collab collaboration graph (reference ogbl_collab.py:26:
    'author' vertices, 'collaboration' edges)."""
    return _simple_graph("ogbl_collab", "author", "collaboration", prefix)


def load_ogbl_ddi(prefix: str | None = None) -> PropertyGraph:
    """ogbl-ddi drug-drug interaction graph (reference ogbl_ddi.py:26:
    'drug' vertices, 'effect' edges)."""
    return _simple_graph("ogbl_ddi", "drug", "effect", prefix)


def load_ogbn_proteins(prefix: str | None = None) -> PropertyGraph:
    """ogbn-proteins association graph (reference ogbn_proteins.py:26:
    'proteins' vertices, 'associations' edges with strength columns)."""
    return _simple_graph("ogbn_proteins", "proteins", "associations", prefix)


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
