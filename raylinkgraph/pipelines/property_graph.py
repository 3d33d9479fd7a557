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
import ray
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
        self._str_keyed: dict[str, bool] = {}
        self._keymaps: dict[str, rd.Dataset] = {}

    # -- schema registration ------------------------------------------------

    def add_vertices(self, label: str, ds: rd.Dataset, id_col: str) -> "PropertyGraph":
        """Register a vertex label. The id column may be int64 (keys must
        be in [0, 2^40)) or string — reference oids are
        int32/int64/std::string (python/graphscope/framework/utils.py:
        411-418). String labels get a deterministic dense key->local map
        (stages/vertex_map.py dense_key_map) built lazily at first
        projection; results map back via with_keys/attach_keys."""
        if label in self._v:
            raise ValueError(f"vertex label {label!r} already registered")
        from raylinkgraph.functions.joins import _pa_schema

        typ = _pa_schema(ds).field(id_col).type
        self._str_keyed[label] = pa.types.is_string(typ) or pa.types.is_large_string(typ)
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

    def is_string_keyed(self, label: str) -> bool:
        return self._str_keyed[label]

    def key_map(self, label: str) -> rd.Dataset:
        """(key, local) map of a string-keyed label — deterministic dense
        locals (vertex_map.dense_key_map), built once and cached
        materialized (it is consumed by every projection AND by result
        mapping)."""
        if not self._str_keyed[label]:
            raise ValueError(f"label {label!r} is int-keyed; no key map")
        if label not in self._keymaps:
            ds, idc = self._v[label]
            from raylinkgraph.stages.vertex_map import dense_key_map

            self._keymaps[label] = dense_key_map(ds, idc).materialize()
        return self._keymaps[label]

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

    def consolidate_columns(
        self,
        label: str,
        columns: list[str],
        result_column: str,
        *,
        kind: str = "vertex",
    ) -> "PropertyGraph":
        """Merge several numeric property columns of one label into a
        single fixed-size ``list<double>`` column (reference
        consolidate_columns, framework/dag_utils.py:232-276 — the
        feature-packing step GNN pipelines run before sampling). One
        vectorized map_batches; every other column rides through
        untouched. Returns self (the label's dataset is replaced)."""
        d = len(columns)

        def merge(t: pa.Table) -> pa.Table:
            mats = [
                t.column(c).to_numpy(zero_copy_only=False).astype(np.float64)
                for c in columns
            ]
            flat = np.column_stack(mats).ravel()
            packed = pa.FixedSizeListArray.from_arrays(
                pa.array(flat, pa.float64()), d
            )
            out = t.drop_columns(columns)
            return out.append_column(result_column, packed)

        if kind == "vertex":
            ds, idc = self._v[label]
            if idc in columns:
                raise ValueError("cannot consolidate the id column")
            self._v[label] = (ds.map_batches(merge, batch_format="pyarrow"), idc)
        elif kind == "edge":
            m = self._e[label]
            if m["src_col"] in columns or m["dst_col"] in columns:
                raise ValueError("cannot consolidate endpoint columns")
            m["ds"] = m["ds"].map_batches(merge, batch_format="pyarrow")
        else:
            raise ValueError(f"kind must be 'vertex' or 'edge', got {kind!r}")
        return self

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
            cols = [scol, dcol] + ([wcol] if (weight and wcol) else [])
            ds = m["ds"].select_columns(cols)

            # string-keyed endpoints: substitute key -> dense local via a
            # byte-gated broadcast-or-bucketed hash join against the
            # label's key map (small maps ray.put once and read zero-copy
            # per task; big maps go through the partitioned bucket join)
            s_str = self._str_keyed[m["src_label"]]
            d_str = self._str_keyed[m["dst_label"]]
            if s_str:
                ds = self._subst_local(ds, m["src_label"], scol, "_lsrc")
            if d_str:
                ds = self._subst_local(ds, m["dst_label"], dcol, "_ldst")
            s_in, d_in = ("_lsrc" if s_str else scol), ("_ldst" if d_str else dcol)

            def to_gids(
                batch: pa.Table, soff=soff, doff=doff, s_in=s_in, d_in=d_in,
                wcol=wcol, lab=lab, subst=(s_str, d_str),
            ) -> pa.Table:
                s = _local_ids(batch, s_in, lab, substituted=subst[0])
                d = _local_ids(batch, d_in, lab, substituted=subst[1])
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

            parts.append(ds.map_batches(to_gids, batch_format="pyarrow"))
        out = parts[0]
        for p in parts[1:]:
            out = out.union(p)
        return out

    # broadcast gate (shared with functions/joins.py defaults)
    _BC_ROWS = 5_000_000
    _BC_BYTES = 256 << 20

    def _subst_local(
        self, ds: rd.Dataset, vlabel: str, key_col: str, out_col: str
    ) -> rd.Dataset:
        """Append ``out_col`` = dense local id of the string key in
        ``key_col``. Small maps broadcast (ONE ``ray.put`` of a hash
        index, plain map TASKS — deliberately not an actor pool: a
        many-edge-label projection would otherwise stack one pool per
        endpoint in a single plan and the pools starve each other on a
        small cluster); maps past the rows/bytes gate go through the
        partitioned bucket join. A missing key surfaces as a null that
        ``_local_ids`` turns into a hard error, mirroring the reference
        loader's behavior on dangling edges."""
        km = self.key_map(vlabel)
        if km.count() > self._BC_ROWS or km.size_bytes() > self._BC_BYTES:
            from raylinkgraph.functions.joins import hash_join

            km2 = km.map_batches(
                lambda t, o=out_col: t.rename_columns(
                    [o if c == "local" else c for c in t.column_names]
                ),
                batch_format="pyarrow",
            )
            return hash_join(ds, km2, on=key_col, right_on="key", how="left")
        kp = km.to_pandas()
        ref = ray.put(
            pd.Series(kp["local"].to_numpy(np.int64), index=kp["key"].to_numpy(object))
        )

        def subst(batch: pa.Table) -> pa.Table:
            lut = ray.get(ref)
            vals = batch.column(key_col).to_numpy(zero_copy_only=False)
            idx = lut.index.get_indexer(vals)
            ok = idx >= 0
            out = lut.to_numpy()[np.maximum(idx, 0)]
            return batch.append_column(
                out_col, pa.array(out, pa.int64(), mask=~ok)
            )

        return ds.map_batches(subst, batch_format="pyarrow")

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

    def with_keys(self, df: pd.DataFrame, gid_col: str = "oid") -> pd.DataFrame:
        """Like ``with_labels`` but ``vkey`` carries the ORIGINAL key —
        string-keyed labels' locals translate back through the key map;
        int labels stringify their local key so the column has one dtype.

        Driver-result-sized mapping (materializes only the key maps of the
        labels actually present, each O(label vertices)); for corpus-sized
        results use ``attach_keys`` which joins as a Dataset.
        """
        idx, local = self.split_gids(df[gid_col].to_numpy(np.int64))
        names = self.label_names(idx)
        vkey = local.astype(str).astype(object)
        for lab in np.unique(names):
            if not self._str_keyed[lab]:
                continue
            sel = names == lab
            km = self.key_map(lab).to_pandas()
            lut = pd.Series(km["key"].to_numpy(object), index=km["local"])
            mapped = lut.reindex(local[sel]).to_numpy(object)
            if pd.isna(mapped).any():
                raise ValueError(f"gid maps to no key in label {lab!r}")
            vkey[sel] = mapped
        out = df.copy()
        out["vlabel"] = names
        out["vkey"] = vkey
        return out

    def attach_keys(
        self, ds: rd.Dataset, gid_col: str = "oid", out_col: str = "vkey"
    ) -> rd.Dataset:
        """Dataset-scale gid -> (vlabel, key) mapping. All string labels'
        key maps fold into ONE broadcast gid->key index (``ray.put``
        once, read per map task; same rows/bytes gate as the projection);
        past the gate each string label pays a byte-gated hash join
        against (gid = local + offset) instead."""
        str_labs = [lab for lab in self.vertex_labels if self._str_keyed[lab]]
        names = self.vertex_labels
        kms = {lab: self.key_map(lab) for lab in str_labs}
        total_rows = sum(km.count() for km in kms.values())
        total_bytes = sum(km.size_bytes() for km in kms.values())

        if total_rows > self._BC_ROWS or total_bytes > self._BC_BYTES:
            return self._attach_keys_joined(ds, gid_col, out_col)

        frames = []
        for lab in str_labs:
            kp = kms[lab].to_pandas()
            frames.append(
                pd.Series(
                    kp["key"].to_numpy(object),
                    index=kp["local"].to_numpy(np.int64)
                    + np.int64(self.label_offset(lab)),
                )
            )
        lut_all = pd.concat(frames) if frames else pd.Series(dtype=object)
        ref = ray.put(lut_all)

        def finish(b: pd.DataFrame) -> pd.DataFrame:
            lut = ray.get(ref)
            g = b[gid_col].to_numpy(np.int64)
            idx = (g >> LABEL_SHIFT).astype(np.int64)
            vkey = (g & np.int64(_LOCAL_MASK)).astype(str).astype(object)
            pos = lut.index.get_indexer(g)
            hit = pos >= 0
            vkey[hit] = lut.to_numpy()[pos[hit]]
            out = b.copy()
            out["vlabel"] = np.array(names, object)[idx]
            out[out_col] = vkey
            return out

        return ds.map_batches(finish, batch_format="pandas")

    def _attach_keys_joined(
        self, ds: rd.Dataset, gid_col: str, out_col: str
    ) -> rd.Dataset:
        """Scale path of attach_keys: one partitioned hash join per
        string label (each join itself byte-gates its broadcast)."""
        from raylinkgraph.functions.joins import hash_join

        str_labs = [lab for lab in self.vertex_labels if self._str_keyed[lab]]
        names = self.vertex_labels
        out = ds
        for lab in str_labs:
            off = np.int64(self.label_offset(lab))

            def to_gid(t: pa.Table, off=off, col=f"_k_{lab}") -> pa.Table:
                g = t.column("local").to_numpy(zero_copy_only=False) + off
                return pa.table(
                    {"_gid": pa.array(g, pa.int64()), col: t.column("key")}
                )

            km = self.key_map(lab).map_batches(to_gid, batch_format="pyarrow")
            out = hash_join(out, km, on=gid_col, right_on="_gid", how="left")

        def finish(b: pd.DataFrame) -> pd.DataFrame:
            g = b[gid_col].to_numpy(np.int64)
            idx = (g >> LABEL_SHIFT).astype(np.int64)
            vkey = (g & np.int64(_LOCAL_MASK)).astype(str).astype(object)
            labn = np.array(names, object)[idx]
            for lab in str_labs:
                sel = labn == lab
                if sel.any():
                    vkey[sel] = b[f"_k_{lab}"].to_numpy(object)[sel]
            out = b.drop(columns=[f"_k_{lab}" for lab in str_labs]).copy()
            out["vlabel"] = labn
            out[out_col] = vkey
            return out

        return out.map_batches(finish, batch_format="pandas")


def _local_ids(
    batch: pa.Table, col: str, edge_label: str, *, substituted: bool
) -> np.ndarray:
    """Read an endpoint column as checked int64 locals. Substituted
    (string-keyed) columns arrive as float64-with-NaN from the left
    join — NaN means the edge referenced a key absent from its vertex
    label, a hard error; locals are < 2^40 so the float64 round trip is
    exact. Int-keyed columns get the [0, 2^40) range check."""
    arr = batch.column(col).to_numpy(zero_copy_only=False)
    if substituted:
        bad = pd.isna(arr)
        if bad.any():
            raise ValueError(
                f"edge label {edge_label!r}: {int(bad.sum())} endpoint key(s) "
                "missing from the vertex label's key set"
            )
        return np.asarray(arr, np.float64).astype(np.int64)
    a = np.asarray(arr).astype(np.int64)
    if len(a) and (a.min() < 0 or a.max() >= LABEL_STRIDE):
        raise ValueError("vertex key outside [0, 2^40): gid packing would corrupt")
    return a


def _distinct_pair_count(
    ds: rd.Dataset, src_col: str, dst_col: str, *, buckets: int = 64
) -> int:
    """Exact distinct (src, dst) count: per-batch unique pair-hash
    partials -> one fixed-width bucketed fold -> sum of per-bucket
    uniques. Int pairs hash with 64-bit splitmix over both endpoints (a
    collision would need ~2^32 distinct pairs in one label); string
    endpoints concatenate with an unlikely separator and are compared
    as strings in-bucket — exact, no hash-collision exposure."""
    import pyarrow.compute as pc

    str_keys = any(
        pa.types.is_string(t) or pa.types.is_large_string(t)
        for t in (
            _pa_field_type(ds, src_col),
            _pa_field_type(ds, dst_col),
        )
    )

    def partial(batch: pa.Table) -> pa.Table:
        if str_keys:
            joined = pc.binary_join_element_wise(
                pc.cast(batch.column(src_col), pa.string()),
                pc.cast(batch.column(dst_col), pa.string()),
                "\x1f",
            )
            h = pc.unique(joined)
            from raylinkgraph.functions.hashing import crc32_str

            b = (crc32_str(h) % np.uint32(buckets)).astype(np.int32)
            return pa.table({"h": h, "b": pa.array(b, pa.int32())})
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


def _pa_field_type(ds: rd.Dataset, col: str) -> pa.DataType:
    from raylinkgraph.functions.joins import _pa_schema

    return _pa_schema(ds).field(col).type
