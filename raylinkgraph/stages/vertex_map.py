"""Vertex map: url -> deterministic int64 gid, parallelism-invariant.

Mirrors the reference's vertex-map construction (oid -> gid,
core/vertex_map/global_vertex_map.h:29-143; narrative docs/frag_intro.md
1.5.1) as one Ray Data shuffle: urls are hash-partitioned by crc32(url) %
V_P; within each partition the sorted-unique urls get dense local offsets;
``gid = offset * V_P + vpid``. The assignment depends only on the url set
and V_P — never on parallelism, block layout, or processing order — which
is what makes downstream component/label ids exactly reproducible
(SURVEY.md §4 determinism row).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from raylinkgraph.functions.hashing import crc32_str

VERTEX_MAP_SCHEMA = pa.schema([("url", pa.string()), ("gid", pa.int64())])


def build_vertex_map(link_pairs: rd.Dataset, *, vmap_partitions: int = 64) -> rd.Dataset:
    """(src_url, dst_url) pairs -> (url, gid) map over all distinct urls."""

    def local_unique(batch: pa.Table) -> pa.Table:
        # Arrow-native unique over both columns (round-3 verdict fix:
        # to_pylist + Python sorted(set()) pushed O(E) rows through the
        # Python heap); ordering is irrelevant here — `assign` re-sorts
        # the per-vpid unique set, which is what fixes the gids.
        both = pa.chunked_array(
            batch.column("src_url").chunks + batch.column("dst_url").chunks
        )
        urls = pc.unique(both)
        vpid = crc32_str(urls) % np.uint32(vmap_partitions)
        return pa.table(
            {
                "url": urls,
                "vpid": pa.array(vpid.astype(np.int32), pa.int32()),
            }
        )

    def assign(g: pd.DataFrame) -> pd.DataFrame:
        vpid = int(g["vpid"].iloc[0])
        urls = np.sort(g["url"].unique())
        gid = np.arange(len(urls), dtype=np.int64) * vmap_partitions + vpid
        return pd.DataFrame({"url": urls, "gid": gid})

    return (
        link_pairs.map_batches(local_unique, batch_format="pyarrow")
        .groupby("vpid")
        .map_groups(assign, batch_format="pandas")
    )


_MAX_LOCAL = 1 << 40  # property-graph gid packing: local key < 2^40


def dense_key_map(
    ds: rd.Dataset, key_col: str, *, partitions: int = 64
) -> rd.Dataset:
    """Distinct string keys -> deterministic dense int64 locals in [0, 2^40).

    The string-OID analogue of ``build_vertex_map`` (reference vertex ids
    may be int32/int64/std::string —
    python/graphscope/framework/utils.py:411-418; oid-type notes
    docs/analytical_engine/performance_tuning.md:155-162): keys are
    hash-partitioned by ``crc32(key) % partitions``; within a partition
    the sorted-unique keys get dense offsets; ``local = offset *
    partitions + vpid``. Pure function of the key set — invariant to
    parallelism, block layout and insertion order, which keeps labeled
    gids (and everything derived from them) exactly reproducible.

    Returns a Dataset with columns ``(key, local)``.
    """

    def local_unique(batch: pa.Table) -> pa.Table:
        keys = pc.unique(batch.column(key_col))
        if keys.null_count:
            raise ValueError(
                f"null key in {key_col!r}: string vertex keys must be "
                "non-null (reference loader rejects null oids)"
            )
        vpid = crc32_str(keys) % np.uint32(partitions)
        return pa.table(
            {"key": keys, "vpid": pa.array(vpid.astype(np.int32), pa.int32())}
        )

    def assign(g: pd.DataFrame) -> pd.DataFrame:
        vpid = int(g["vpid"].iloc[0])
        keys = np.sort(g["key"].unique())
        local = np.arange(len(keys), dtype=np.int64) * partitions + vpid
        if len(local) and local[-1] >= _MAX_LOCAL:
            raise ValueError(
                f"label has too many keys: local id {local[-1]} >= 2^40"
            )
        return pd.DataFrame({"key": keys, "local": local})

    return (
        ds.select_columns([key_col])
        .map_batches(local_unique, batch_format="pyarrow")
        .groupby("vpid")
        .map_groups(assign, batch_format="pandas")
    )


def attach_gids(
    link_pairs: rd.Dataset,
    vertex_map: rd.Dataset,
    *,
    broadcast_limit: int = 5_000_000,
    broadcast_bytes_limit: int = 256 << 20,
) -> rd.Dataset:
    """Substitute urls for gids: (src_url, dst_url) -> (src_id, dst_id).

    The reference's gid-substitution step (docs/frag_intro.md 1.5.1). The
    vertex map is broadcast via a single ``ray.put`` (sorted url array +
    gid array; lookup is a vectorized searchsorted) and read zero-copy by
    every map task — NOT re-shipped per batch. The gate is rows AND
    bytes (urls are wide, ~60-100 B each: a row gate alone would pin
    gigabytes on the driver before falling back); beyond either limit
    the url->gid substitution happens inside the same kind of shuffle
    that built the map (bucket-join on crc32(url) % V_P), which
    `attach_gids_partitioned` implements.
    """
    # materialize once: count()/size_bytes() would otherwise each re-run
    # the vertex-map shuffle, and the chosen path consumes it again
    vertex_map = vertex_map.materialize()
    if (
        vertex_map.count() > broadcast_limit
        or vertex_map.size_bytes() > broadcast_bytes_limit
    ):
        return attach_gids_partitioned(link_pairs, vertex_map)
    vm = vertex_map.to_pandas()
    vm = vm.sort_values("url")
    urls = vm["url"].to_numpy(dtype=object)
    gids = vm["gid"].to_numpy(np.int64)
    ref = ray.put((urls, gids))

    class Substitute:
        def __init__(self):
            self.urls, self.gids = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            src = batch.column("src_url").to_numpy(zero_copy_only=False)
            dst = batch.column("dst_url").to_numpy(zero_copy_only=False)
            si = np.searchsorted(self.urls, src)
            di = np.searchsorted(self.urls, dst)
            return pa.table(
                {
                    "src_id": pa.array(self.gids[si], pa.int64()),
                    "dst_id": pa.array(self.gids[di], pa.int64()),
                }
            )

    return link_pairs.map_batches(
        Substitute, batch_format="pyarrow", concurrency=(1, 8)
    )


def attach_gids_partitioned(
    link_pairs: rd.Dataset, vertex_map: rd.Dataset, *, buckets: int = 64
) -> rd.Dataset:
    """Scale path: two bucket-joins on crc32(url) % buckets (src then dst).

    Each join is union(tagged pairs, tagged map).groupby(bucket) with a
    pandas merge inside the group — an explicit partitioned hash join.
    """
    out = link_pairs
    for col, out_col in (("src_url", "src_id"), ("dst_url", "dst_id")):
        out = _bucket_join(out, vertex_map, col, out_col, buckets)
    return out.select_columns(["src_id", "dst_id"])


def _bucket_join(
    left: rd.Dataset, vmap: rd.Dataset, key: str, out_col: str, buckets: int
) -> rd.Dataset:
    from raylinkgraph.functions.joins import _pa_schema

    lschema = _pa_schema(left)
    left_cols = list(lschema.names)

    def tag_left(batch: pa.Table) -> pa.Table:
        b = (crc32_str(batch.column(key)) % np.uint32(buckets)).astype(np.int32)
        t = batch.append_column("bucket", pa.array(b, pa.int32()))
        return t.append_column("is_map", pa.array(np.zeros(len(b), np.bool_)))

    def tag_map(batch: pa.Table) -> pa.Table:
        b = (crc32_str(batch.column("url")) % np.uint32(buckets)).astype(np.int32)
        cols: dict = {c: pa.nulls(len(b), lschema.field(c).type) for c in left_cols}
        cols[key] = batch.column("url")
        cols["map_gid"] = batch.column("gid")
        cols["bucket"] = pa.array(b, pa.int32())
        cols["is_map"] = pa.array(np.ones(len(b), np.bool_))
        return pa.table(cols)

    def add_mapgid_left(batch: pa.Table) -> pa.Table:
        return batch.append_column("map_gid", pa.nulls(batch.num_rows, pa.int64()))

    tagged_left = left.map_batches(tag_left, batch_format="pyarrow").map_batches(
        add_mapgid_left, batch_format="pyarrow"
    )
    tagged_map = vmap.map_batches(tag_map, batch_format="pyarrow")

    def join_group(g: pd.DataFrame) -> pd.DataFrame:
        m = g[g["is_map"]]
        rows = g[~g["is_map"]]
        lut = pd.Series(m["map_gid"].to_numpy(np.int64), index=m[key])
        out = rows[left_cols].copy()
        out[out_col] = lut.reindex(rows[key]).to_numpy()
        return out

    return (
        tagged_left.union(tagged_map)
        .groupby("bucket")
        .map_groups(join_group, batch_format="pandas")
    )
