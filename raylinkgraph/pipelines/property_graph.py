"""Multi-label property graph: labeled vertex/edge tables with per-label
schemas and label-aware projection to the simple-graph engine.

The reference's core data model is a labeled property graph — each
vertex label is a table with an id column plus properties, each edge
label a (src_label, edge_label, dst_label) triple with its own table
(python/graphscope/framework/graph.py:80-97 `add_vertices/add_edges`;
fragment model docs/frag_intro.md 1.2; multi-label twitter fixtures
python/graphscope/tests/unittest/conftest.py:150-360). Algorithms run on
a label-projected simple view (`project_to_simple`,
python/graphscope/framework/graph_utils.py).

Ray-Data-first re-expression: every label is its own ``ray.data.Dataset``
(lazy, column-pruned parquet read); projection is a per-edge-label
``map_batches`` that rewrites local keys into a partitioned global id
space, then a ``union`` across the selected labels — no shuffle at all
until ``LinkGraph.build`` does its one edge-dedup exchange.

Global id layout (mirrors the reference's label-partitioned gid space,
core/vertex_map/global_vertex_map.h — label id in the high bits)::

    gid = (vlabel_index << 40) | local_key     (0 <= local_key < 2^40)

``vlabel_index`` is the label's rank in SORTED label-name order, so gids
are a pure function of the schema + keys — independent of insertion
order, parallelism, and block layout. The arithmetic is plain integer
math, reproducible in ANSI SQL (`key + idx * 1099511627776`), which is
what makes the labeled driver queries hash-exact against DuckDB.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from raylinkgraph.functions.hashing import pair_hash, partition_of
from raylinkgraph.stages.graph_build import LinkGraph

LABEL_SHIFT = 40
LABEL_STRIDE = 1 << LABEL_SHIFT  # 1_099_511_627_776
_LOCAL_MASK = np.int64(LABEL_STRIDE - 1)


class PropertyGraph:
    """Labeled vertex/edge tables + label-aware projection.

    Vertex labels: ``add_vertices(label, ds, id_col)`` — any Dataset with
    an int64 key column (checked < 2^40) and arbitrary property columns.
    Edge labels: ``add_edges(label, ds, src_col, dst_col, src_label,
    dst_label)`` — endpoints are LOCAL keys of the endpoint labels.

    Nothing is materialized at registration; datasets stay lazy until a
    projection or count consumes them.
    """

    def __init__(self) -> None:
        self._v: dict[str, tuple[rd.Dataset, str]] = {}
        self._e: dict[str, dict] = {}

    # -- schema registration ------------------------------------------------

    def add_vertices(self, label: str, ds: rd.Dataset, id_col: str) -> "PropertyGraph":
        if label in self._v:
            raise ValueError(f"vertex label {label!r} already registered")
        self._v[label] = (ds, id_col)
        return self

    def add_edges(
        self,
        label: str,
        ds: rd.Dataset,
        src_col: str,
        dst_col: str,
        *,
        src_label: str,
        dst_label: str,
        weight_col: str | None = None,
    ) -> "PropertyGraph":
        if label in self._e:
            raise ValueError(f"edge label {label!r} already registered")
        for vl in (src_label, dst_label):
            if vl not in self._v:
                raise ValueError(f"unknown vertex label {vl!r} (add_vertices first)")
        self._e[label] = {
            "ds": ds,
            "src_col": src_col,
            "dst_col": dst_col,
            "src_label": src_label,
            "dst_label": dst_label,
            "weight_col": weight_col,
        }
        return self

    # -- introspection -------------------------------------------------------

    @property
    def vertex_labels(self) -> list[str]:
        return sorted(self._v)

    @property
    def edge_labels(self) -> list[str]:
        return sorted(self._e)

    def label_index(self, label: str) -> int:
        return self.vertex_labels.index(label)

    def label_offset(self, label: str) -> int:
        """gid base of a vertex label — usable verbatim in oracle SQL."""
        return self.label_index(label) * LABEL_STRIDE

    def vertices(self, label: str) -> rd.Dataset:
        return self._v[label][0]

    def edges(self, label: str) -> rd.Dataset:
        return self._e[label]["ds"]

    def num_vertices(self, label: str) -> int:
        return self._v[label][0].count()

    def num_edges(self, label: str, *, distinct: bool = False) -> int:
        meta = self._e[label]
        if not distinct:
            return meta["ds"].count()
        return _distinct_pair_count(
            meta["ds"], meta["src_col"], meta["dst_col"]
        )

    def schema(self) -> dict:
        return {
            "vertices": {
                lab: {"id_col": idc, "columns": ds.schema().names}
                for lab, (ds, idc) in sorted(self._v.items())
            },
            "edges": {
                lab: {
                    k: m[k]
                    for k in ("src_col", "dst_col", "src_label", "dst_label", "weight_col")
                }
                for lab, m in sorted(self._e.items())
            },
        }

    # -- projection ----------------------------------------------------------

    def project(
        self, e_labels: list[str] | None = None, *, weight: bool = False
    ) -> rd.Dataset:
        """Label-projected edge Dataset: (src_id, dst_id[, weight]) in the
        global gid space over the selected edge labels (all by default).

        One vectorized map_batches per label (gid arithmetic + u32^40
        range check) + a union; duplicates survive until LinkGraph.build's
        dedup exchange — exactly one shuffle for the whole projection.
        """
        labels = sorted(self._e) if e_labels is None else list(e_labels)
        parts = []
        for lab in labels:
            m = self._e[lab]
            soff = np.int64(self.label_offset(m["src_label"]))
            doff = np.int64(self.label_offset(m["dst_label"]))
            scol, dcol, wcol = m["src_col"], m["dst_col"], m["weight_col"]

            def to_gids(
                batch: pa.Table, soff=soff, doff=doff, scol=scol, dcol=dcol, wcol=wcol
            ) -> pa.Table:
                s = batch.column(scol).to_numpy(zero_copy_only=False).astype(np.int64)
                d = batch.column(dcol).to_numpy(zero_copy_only=False).astype(np.int64)
                for arr in (s, d):
                    if len(arr) and (arr.min() < 0 or arr.max() >= LABEL_STRIDE):
                        raise ValueError(
                            "vertex key outside [0, 2^40): gid packing would corrupt"
                        )
                cols = {
                    "src_id": pa.array(s + soff, pa.int64()),
                    "dst_id": pa.array(d + doff, pa.int64()),
                }
                if weight:
                    w = (
                        batch.column(wcol).to_numpy(zero_copy_only=False).astype(np.float64)
                        if wcol
                        else np.ones(len(s), np.float64)
                    )
                    cols["weight"] = pa.array(w, pa.float64())
                return pa.table(cols)

            cols = [scol, dcol] + ([wcol] if (weight and wcol) else [])
            parts.append(
                m["ds"].select_columns(cols).map_batches(to_gids, batch_format="pyarrow")
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.union(p)
        return out

    def to_simple(
        self, graph_dir: str, e_labels: list[str] | None = None, **build_kw
    ) -> LinkGraph:
        """project() -> LinkGraph.build: the labeled analogue of the
        reference's project_to_simple + arrow_fragment load. Passing
        ``weight_col`` (a LinkGraph.build kwarg) makes the projection
        carry each edge label's registered weight column (1.0 where a
        label has none), renamed to that output column."""
        wcol = build_kw.get("weight_col")
        edges = self.project(e_labels, weight=wcol is not None)
        if wcol is not None and wcol != "weight":
            edges = edges.map_batches(
                lambda t, w=wcol: t.rename_columns(
                    [w if c == "weight" else c for c in t.column_names]
                ),
                batch_format="pyarrow",
            )
        return LinkGraph.build(edges, graph_dir, **build_kw)

    # -- result mapping --------------------------------------------------------

    def split_gids(self, gids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """gid array -> (label_index array, local key array)."""
        g = gids.astype(np.int64)
        return (g >> np.int64(LABEL_SHIFT)).astype(np.int32), g & _LOCAL_MASK

    def label_names(self, label_idx: np.ndarray) -> np.ndarray:
        names = np.array(self.vertex_labels, dtype=object)
        return names[label_idx]

    def with_labels(self, df: pd.DataFrame, gid_col: str = "oid") -> pd.DataFrame:
        """Add (vlabel, local key) columns derived from a gid column —
        how per-label algorithm results map back onto their label tables."""
        idx, local = self.split_gids(df[gid_col].to_numpy(np.int64))
        out = df.copy()
        out["vlabel"] = self.label_names(idx)
        out["vkey"] = local
        return out


def _distinct_pair_count(
    ds: rd.Dataset, src_col: str, dst_col: str, *, buckets: int = 64
) -> int:
    """Exact distinct (src, dst) count: per-batch unique pair-hash
    partials -> one fixed-width bucketed fold -> sum of per-bucket
    uniques. The pair hash is 64-bit splitmix over both endpoints; a
    collision would need ~2^32 distinct pairs in one graph label."""

    def partial(batch: pa.Table) -> pa.Table:
        s = batch.column(src_col).to_numpy(zero_copy_only=False).astype(np.int64)
        d = batch.column(dst_col).to_numpy(zero_copy_only=False).astype(np.int64)
        h = np.unique(pair_hash(s, d).astype(np.int64))
        return pa.table(
            {"h": pa.array(h, pa.int64()),
             "b": pa.array(partition_of(h, buckets), pa.int32())}
        )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"n": [np.int64(g["h"].nunique())]})

    parts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("b")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
    )
    return int(parts["n"].sum())
