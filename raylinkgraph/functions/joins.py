"""General equi-join over Ray Datasets.

Broadcast the right side below a row limit (one ``ray.put``, read by
every map task — never re-shipped per batch); above it, an explicit
partitioned bucket join: both sides tagged with hash(key) % buckets,
null-padded to a common schema, unioned, and merged per bucket group —
ONE shuffle, no driver materialization. This is the generic form of the
idiom proven by ``stages/vertex_map.attach_gids[_partitioned]`` and the
cp/cpr edge builds (pipelines/tpch_graph.py).

Reference surface: GraphScope's loader/dataframe pipelines join vertex
and edge frames during graph construction
(python/graphscope/framework/loader.py, docs/frag_intro.md 1.5.1);
here the join is a first-class, reusable Ray Data composition.

Scale notes: the bucket count bounds per-group memory (a group holds
~|L|/buckets + |R|/buckets rows); skewed keys concentrate in one
bucket only if one KEY dominates — for those, pre-aggregate before the
join or raise ``buckets``. Key hashing is splitmix64 (ints) /
crc32 (strings), the same functions that partition every other shuffle
in this repo, so a join can reuse a co-partitioned layout.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from raylinkgraph.functions.hashing import crc32_str, partition_of


def _pa_schema(ds: rd.Dataset) -> pa.Schema:
    """Dataset schema as a pyarrow Schema, whatever the block format
    (pandas-backed blocks report a PandasBlockSchema of numpy dtypes)."""
    s = ds.schema()
    base = getattr(s, "base_schema", s)
    if isinstance(base, pa.Schema):
        return base
    fields = []
    for name, typ in zip(base.names, base.types):
        try:
            fields.append((name, pa.from_numpy_dtype(typ)))
        except (pa.ArrowNotImplementedError, TypeError):
            fields.append((name, pa.string()))  # object dtype -> string
    return pa.schema(fields)


def _key_buckets(vals: pa.ChunkedArray | pa.Array, buckets: int) -> np.ndarray:
    if pa.types.is_string(vals.type) or pa.types.is_large_string(vals.type):
        return (crc32_str(vals) % np.uint32(buckets)).astype(np.int32)
    v = vals.to_numpy(zero_copy_only=False).astype(np.int64)
    return partition_of(v, buckets).astype(np.int32)


def hash_join(
    left: rd.Dataset,
    right: rd.Dataset,
    *,
    on: str,
    right_on: str | None = None,
    how: str = "inner",
    broadcast_limit: int = 5_000_000,
    broadcast_bytes_limit: int = 256 << 20,
    buckets: int = 64,
    rsuffix: str = "_r",
    prefilter: str | None = None,
) -> rd.Dataset:
    """Equi-join ``left`` with ``right`` on one key column.

    Output columns: every left column, then right's non-key columns
    (``rsuffix``-renamed on clashes). ``how`` is ``inner``, ``left``,
    ``semi`` (left rows whose key EXISTS in right; left columns only)
    or ``anti`` (left rows whose key does NOT exist in right).
    Right sides of at most ``broadcast_limit`` rows are broadcast;
    larger ones go through the partitioned bucket join. Row order is
    not defined (sort downstream if needed).

    ``prefilter="bloom"`` (semi/anti only, partitioned path): build a
    mergeable Bloom bitmap over the right keys and resolve the
    definite rows WITHOUT shuffling them — a bloom-negative left row
    cannot match (no false negatives), so for semi it drops before the
    exchange and for anti it routes straight to the output; only the
    bloom-positive remainder (true matches + ~fpp false positives)
    pays the exact partitioned join. At a 1% fpp this cuts the
    exchange to ~|matches| + 1% of the left side.
    """
    if how in ("semi", "anti"):
        return _filter_join(
            left, right, on, right_on or on, how,
            broadcast_limit=broadcast_limit,
            broadcast_bytes_limit=broadcast_bytes_limit,
            buckets=buckets,
            prefilter=prefilter,
        )
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    right_on = right_on or on
    left_cols = list(left.schema().names)
    rschema = _pa_schema(right)
    rcols = [c for c in rschema.names if c != right_on]
    ren = {c: (c + rsuffix if c in left_cols else c) for c in rcols}
    out_rcols = [ren[c] for c in rcols]

    # Materialize once: count()/size_bytes() on a lazy Dataset would each
    # re-execute its pipeline, and whichever path wins consumes it again.
    # The byte gate matters when rows are wide (e.g. long url strings): a
    # row-count gate alone would pin gigabytes on the driver before the
    # partitioned fallback could kick in.
    right = right.materialize()
    if (
        right.count() <= broadcast_limit
        and right.size_bytes() <= broadcast_bytes_limit
    ):
        rp = right.to_pandas().rename(columns=ren)
        rp = rp.rename(columns={right_on: on}) if right_on != on else rp
        ref = ray.put(rp)

        # uniform dtype contract for how="left": right value int columns
        # are ALWAYS float64 (a fully-matched block would otherwise stay
        # int64 while a block with misses goes float — mixed block
        # schemas downstream)
        lfloat = (
            {
                ren[c]
                for c in rcols
                if pa.types.is_integer(rschema.field(c).type)
            }
            if how == "left"
            else set()
        )

        class BroadcastJoin:
            def __init__(self):
                self.r = ray.get(ref)

            def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
                out = batch.merge(self.r, on=on, how=how)
                for c in lfloat:
                    out[c] = out[c].astype(np.float64)
                return out

        return left.map_batches(
            BroadcastJoin, batch_format="pandas", concurrency=(1, 8)
        )

    # partitioned bucket join: common schema = left columns + renamed
    # right value columns + bucket + side marker; each side null-pads
    # the other's columns, the right key lands in the LEFT key slot so
    # the group merge sees one key column
    def tag_left(batch: pa.Table) -> pa.Table:
        b = _key_buckets(batch.column(on), buckets)
        cols = {c: batch.column(c) for c in left_cols}
        for c in rcols:
            cols[ren[c]] = pa.nulls(len(b), rschema.field(c).type)
        cols["bucket"] = pa.array(b, pa.int32())
        cols["is_right"] = pa.array(np.zeros(len(b), np.bool_))
        return pa.table(cols)

    lschema = _pa_schema(left)

    def tag_right(batch: pa.Table) -> pa.Table:
        b = _key_buckets(batch.column(right_on), buckets)
        cols = {
            c: pa.nulls(len(b), lschema.field(c).type) for c in left_cols
        }
        cols[on] = batch.column(right_on).cast(lschema.field(on).type)
        for c in rcols:
            cols[ren[c]] = batch.column(c)
        cols["bucket"] = pa.array(b, pa.int32())
        cols["is_right"] = pa.array(np.ones(len(b), np.bool_))
        return pa.table(cols)

    # null-padding turns int columns float in the pandas group frame;
    # after the merge the padded nulls are gone (inner: both sides
    # matched; left: left cols are never null), so cast back
    int_restore = {
        c: lschema.field(c).type.to_pandas_dtype()
        for c in left_cols
        if pa.types.is_integer(lschema.field(c).type)
    }
    rint = [
        ren[c] for c in rcols if pa.types.is_integer(rschema.field(c).type)
    ]
    if how == "inner":
        int_restore.update(
            (ren[c], rschema.field(c).type.to_pandas_dtype())
            for c in rcols
            if pa.types.is_integer(rschema.field(c).type)
        )
    else:
        # same uniform how="left" contract as the broadcast path
        int_restore.update((c, np.float64) for c in rint)

    def join_group(g: pd.DataFrame) -> pd.DataFrame:
        r = g[g["is_right"]]
        l = g[~g["is_right"]]
        out = l[left_cols].merge(r[[on] + out_rcols], on=on, how=how)
        for c, dt in int_restore.items():
            out[c] = out[c].astype(dt)
        return out

    tl = left.map_batches(tag_left, batch_format="pyarrow")
    tr = right.map_batches(tag_right, batch_format="pyarrow")
    return tl.union(tr).groupby("bucket").map_groups(
        join_group, batch_format="pandas"
    )


def _filter_join(
    left: rd.Dataset,
    right: rd.Dataset,
    on: str,
    right_on: str,
    how: str,
    *,
    broadcast_limit: int,
    broadcast_bytes_limit: int = 256 << 20,
    buckets: int,
    prefilter: str | None = None,
    rkeys_ds: rd.Dataset | None = None,
    n_keys: int | None = None,
) -> rd.Dataset:
    """semi / anti join: keep left rows by key membership in right.

    Only right's KEY column ever moves — the right side is reduced to
    its distinct keys per batch before anything is shipped, so the
    broadcast is a key set (not the table) and the partitioned path
    unions key rows only. Output schema = left's schema, unchanged.

    The key set is materialized once (count()/size_bytes() on a lazy
    Dataset would each re-run the right pipeline, and the chosen path
    consumes it again); the broadcast gate is rows AND bytes, so wide
    string keys fall back to the partitioned path before gigabytes pin
    on the driver."""
    left_cols = list(left.schema().names)
    keep_present = how == "semi"

    if rkeys_ds is None:
        rkeys_ds = right.select_columns([right_on]).map_batches(
            lambda b: b.select([right_on]).group_by([right_on]).aggregate([]),
            batch_format="pyarrow",
        ).materialize()
        # per-batch distinct: an upper bound on the distinct key count
        # (and well under right's row count) — the honest measure of
        # what would ship
        n_keys = rkeys_ds.count()

    over = n_keys > broadcast_limit or rkeys_ds.size_bytes() > broadcast_bytes_limit

    if prefilter == "bloom" and over:
        from raylinkgraph.functions.sketches import bloom_build, bloom_contains

        bits, m, k = bloom_build(rkeys_ds, right_on, fpp=0.01,
                                 n_keys=n_keys)
        bref = ray.put(bits)

        def _bloom_split(want_positive: bool):
            class BloomSplit:
                def __init__(self):
                    self.bits = ray.get(bref)

                def __call__(self, batch: pa.Table) -> pa.Table:
                    keys = batch.column(on).to_numpy(zero_copy_only=False)
                    pos = bloom_contains(self.bits, m, k, keys)
                    return batch.filter(pa.array(pos if want_positive else ~pos))

            return BloomSplit

        maybe = left.map_batches(
            _bloom_split(True), batch_format="pyarrow", concurrency=(1, 8)
        )
        exact = _filter_join(
            maybe, right, on, right_on, how,
            broadcast_limit=broadcast_limit,
            broadcast_bytes_limit=broadcast_bytes_limit,
            buckets=buckets,
            rkeys_ds=rkeys_ds, n_keys=n_keys,
        )
        if keep_present:
            # bloom-negatives cannot match: the exact semi of the
            # positives IS the answer
            return exact
        # anti: bloom-negatives are definite keeps and never shuffle
        definite = left.map_batches(
            _bloom_split(False), batch_format="pyarrow", concurrency=(1, 8)
        )
        return definite.union(exact)

    if not over:
        rk = rkeys_ds.to_pandas()[right_on].unique()
        ref = ray.put(rk)

        class MembershipFilter:
            def __init__(self):
                self.keys = ray.get(ref)

            def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
                m = batch[on].isin(self.keys)
                return batch[m if keep_present else ~m]

        return left.map_batches(
            MembershipFilter, batch_format="pandas", concurrency=(1, 8)
        )

    # partitioned path: left rows + right key rows share hash(key)
    # buckets; per bucket, one vectorized isin over the local key set
    lschema = _pa_schema(left)

    def tag_left(batch: pa.Table) -> pa.Table:
        b = _key_buckets(batch.column(on), buckets)
        cols = {c: batch.column(c) for c in left_cols}
        cols["bucket"] = pa.array(b, pa.int32())
        cols["is_right"] = pa.array(np.zeros(len(b), np.bool_))
        return pa.table(cols)

    def tag_right(batch: pa.Table) -> pa.Table:
        b = _key_buckets(batch.column(right_on), buckets)
        cols = {
            c: pa.nulls(len(b), lschema.field(c).type) for c in left_cols
        }
        cols[on] = batch.column(right_on).cast(lschema.field(on).type)
        cols["bucket"] = pa.array(b, pa.int32())
        cols["is_right"] = pa.array(np.ones(len(b), np.bool_))
        return pa.table(cols)

    # union null-padding coerces left int columns to float in the
    # pandas group frame; restore after the filter
    int_restore = {
        c: lschema.field(c).type.to_pandas_dtype()
        for c in left_cols
        if pa.types.is_integer(lschema.field(c).type)
    }

    def filter_group(g: pd.DataFrame) -> pa.Table:
        rk = g.loc[g["is_right"], on].unique()
        l = g[~g["is_right"]]
        m = l[on].isin(rk)
        out = l.loc[m if keep_present else ~m, left_cols].copy()
        for c, dt in int_restore.items():
            out[c] = out[c].astype(dt)
        # emit Arrow with the left schema pinned: empty pandas frames
        # with object columns trip Ray's block size estimation
        return pa.Table.from_pandas(
            out, schema=lschema, preserve_index=False
        )

    tl = left.map_batches(tag_left, batch_format="pyarrow")
    tr = rkeys_ds.map_batches(tag_right, batch_format="pyarrow")
    return tl.union(tr).groupby("bucket").map_groups(
        filter_group, batch_format="pandas"
    )
