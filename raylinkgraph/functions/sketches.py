"""Mergeable sketches for cardinality at scale.

HyperLogLog (Flajolet et al. 2007, the standard bias-corrected form):
each batch emits its PARTIAL register maxima (at most 2^p rows — the
combiner), one groupby-max merges them, and the estimate is computed
from the 2^p final registers. Nothing proportional to the distinct
count ever moves or materializes, which is the point at 100 TB: exact
COUNT(DISTINCT url) is an all-to-all shuffle of every distinct value;
this is a fixed 2^p-row exchange regardless of input size. Fully
deterministic (splitmix64 / crc32 hashing — no RNG), so results are
reproducible across runs, partitionings, and parallelism.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from raylinkgraph.functions.hashing import crc32_str, splitmix64


def _hll_alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def _hash_column(vals, is_str: bool) -> np.ndarray:
    if is_str:
        # crc32 alone has only 32 bits; widen deterministically
        h32 = crc32_str(vals).astype(np.uint64)
        return splitmix64(h32)
    v = vals.to_numpy(zero_copy_only=False).astype(np.uint64)
    return splitmix64(v)


def hll_partials(
    ds: rd.Dataset, col: str, *, p: int = 12, batch_size: int = 65536
) -> rd.Dataset:
    """Per-batch HLL register partial maxima -> (register, rank) rows."""
    if not 4 <= p <= 16:
        raise ValueError("p must be in [4, 16]")

    def partial(batch: pa.Table) -> pa.Table:
        vals = batch.column(col)
        is_str = pa.types.is_string(vals.type) or pa.types.is_large_string(
            vals.type
        )
        h = _hash_column(vals, is_str)
        reg = (h >> np.uint64(64 - p)).astype(np.int64)
        rest = h << np.uint64(p)  # top (64-p) significant bits remain
        # rank = leading zeros of `rest` within (64-p) bits, + 1;
        # all-zero rest -> rank (64-p)+1
        nz = rest != 0
        lz = np.full(len(h), 64 - p, np.int64)
        # bit_length via log2 is unsafe at 64 bits; use the float64
        # exponent trick only below 2^53 — instead do it exactly with
        # a de Bruijn-free loop over 6 shifts (branchless, vectorized)
        x = rest[nz]
        n = np.zeros(x.shape, np.int64)
        for shift in (32, 16, 8, 4, 2, 1):
            mask = x < (np.uint64(1) << np.uint64(64 - shift))
            n[mask] += shift
            x[mask] = x[mask] << np.uint64(shift)
        lz[nz] = n
        rank = np.minimum(lz, 64 - p) + 1
        out = pd.DataFrame({"register": reg, "rank": rank})
        out = out.groupby("register", as_index=False)["rank"].max()
        return pa.table(
            {
                "register": pa.array(out["register"].to_numpy(np.int64)),
                "rank": pa.array(out["rank"].to_numpy(np.int64)),
            }
        )

    return ds.map_batches(partial, batch_format="pyarrow", batch_size=batch_size)


def hll_estimate(registers: np.ndarray, p: int = 12) -> float:
    """Bias-corrected HLL estimate from the 2^p final register ranks
    (0 = never touched)."""
    m = 1 << p
    full = registers.astype(np.float64)
    raw = _hll_alpha(m) * m * m / np.sum(np.power(2.0, -full))
    zeros = int((full == 0).sum())
    if raw <= 2.5 * m and zeros:
        return m * np.log(m / zeros)  # linear counting, small range
    return float(raw)


def approx_distinct(ds: rd.Dataset, col: str, *, p: int = 12) -> float:
    """Approximate COUNT(DISTINCT col): partial registers -> groupby-max
    -> estimate. Deterministic; standard error ~= 1.04 / sqrt(2^p)."""
    def fold_max(g: pd.DataFrame) -> pd.DataFrame:
        # 8 fixed partitions, vectorized max per partition — not
        # groupby(register).max over 2^p keys (per-group dispatch)
        agg = g.groupby("register", as_index=False, sort=True)["rank"].max()
        return agg.rename(columns={"rank": "max(rank)"})

    merged = (
        hll_partials(ds, col, p=p)
        .map_batches(
            lambda b: b.assign(__p=(b["register"].to_numpy(np.int64) & 7).astype(np.int32)),
            batch_format="pandas",
        )
        .groupby("__p")
        .map_groups(fold_max, batch_format="pandas")
        .to_pandas()
    )
    m = 1 << p
    regs = np.zeros(m, np.float64)
    regs[merged["register"].to_numpy(np.int64)] = merged["max(rank)"].to_numpy(
        np.float64
    )
    return hll_estimate(regs, p)


def bottom_k_sample(
    ds: rd.Dataset,
    id_col: str,
    k: int,
    *,
    columns: list[str] | None = None,
) -> pd.DataFrame:
    """Deterministic uniform sample of k rows: keep the k smallest
    splitmix64(id) hashes. Order- and partition-INVARIANT (a pure
    function of the id set — no RNG, no reservoir order dependence) and
    mergeable: each batch pre-trims to its local bottom-k, the driver
    folds the <= k * n_blocks survivors. One streaming pass, fixed-k
    exchange regardless of input size."""
    from raylinkgraph.functions.hashing import splitmix64

    cols = columns or [c for c in ds.schema().names if c != id_col]

    def trim(b: pd.DataFrame) -> pd.DataFrame:
        h = splitmix64(b[id_col].to_numpy(np.int64)).astype(np.uint64)
        if len(h) > k:
            keep = np.argpartition(h, k)[:k]
            b = b.iloc[keep]
            h = h[keep]
        out = b[[id_col] + cols].copy()
        out["__h"] = h
        return out

    got = ds.map_batches(trim, batch_format="pandas").to_pandas()
    # secondary tie key: duplicate id_col values hash identically, and
    # nsmallest alone would break such ties by incidental row order
    # (partition-dependent); sorting by (__h, id_col) keeps the result a
    # pure function of the id multiset (advisor round-3)
    got = (
        got.nsmallest(k, "__h", keep="all")
        .sort_values(["__h", id_col], kind="mergesort")
        .head(k)
    )
    return got.drop(columns="__h").reset_index(drop=True)


def approx_quantiles_sample(
    ds: rd.Dataset,
    id_col: str,
    val_col: str,
    qs: list[float],
    *,
    k: int = 4096,
) -> pd.DataFrame:
    """One-pass approximate quantiles from a bottom-k uniform sample ->
    (q_e6, value). Rank error is O(1/sqrt(k)) with high probability
    (~1.63/sqrt(k) at 99% per the DKW inequality); use
    quantiles.exact_quantiles when exactness matters. Deterministic for
    a given id set, so repeated runs agree bit-for-bit."""
    sample = bottom_k_sample(ds, id_col, k, columns=[val_col])
    v = np.sort(sample[val_col].to_numpy(np.float64))
    n = len(v)
    q = np.asarray(qs, np.float64)
    idx = np.maximum(0, np.ceil(q * n).astype(np.int64) - 1)
    return pd.DataFrame(
        {
            "q_e6": np.floor(q * 1e6 + 0.5).astype(np.int64),
            "value": v[np.minimum(idx, n - 1)] if n else np.full(len(q), np.nan),
        }
    )


def _mg_compress(vals: np.ndarray, counts: np.ndarray, k: int):
    """Misra-Gries compression to at most k counters: subtract the
    (k+1)-th largest count from every counter and drop the non-positive
    remainder (the mergeable-summaries formulation, Agarwal et al. 2012).
    Each subtraction decrements > k counters at once, so the total mass
    removed from any single item is <= n / (k+1)."""
    if len(vals) <= k:
        return vals, counts
    order = np.argsort(counts, kind="stable")[::-1]
    dec = counts[order[k]]
    keep = counts > dec
    return vals[keep], counts[keep] - dec


def heavy_hitters(ds: rd.Dataset, col: str, k: int) -> pd.DataFrame:
    """EXACT "frequency strictly greater than n/k" items -> (value, n),
    via a Misra-Gries sketch plus one verification pass.

    Pass 1 (streaming, fixed exchange): each batch folds to exact local
    value counts (vectorized) compressed to a <= k-counter Misra-Gries
    summary, so at most k rows leave any batch no matter how many
    distinct values it holds. The driver sums the partial counters by
    value and MG-compresses once more: any item with true frequency
    f > n/(k+1) necessarily survives with a positive counter (its
    estimate is >= f - n/(k+1)), so the <= k survivors are a SUPERSET of
    every item with f > n/k.  No groupby over the unbounded value domain
    ever happens — the candidate set is bounded by k by construction.

    Pass 2 (streaming): broadcast the candidate values once (ray.put via
    map_batches closure capture of a small frozen array) and count their
    exact occurrences per batch (vectorized isin + value_counts); fold
    the <= k-row partials and keep items with n * k > total.  Exact,
    deterministic, partition/order-invariant — the same contract the SQL
    oracle (GROUP BY ... HAVING COUNT(*) * k > total) states.

    Reference analogue: GraphScope's property statistics run exact
    groupbys inside one fragment (fragment_reporter.h); at 100 TB the
    MG + verify shape is the one that avoids shuffling the full key
    domain for a top-heavy-hitter question.
    """
    if k < 1:
        raise ValueError("k must be >= 1")

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        vc = b[col].value_counts()  # exact within the batch, vectorized
        vals, counts = _mg_compress(
            vc.index.to_numpy(), vc.to_numpy(np.int64), k
        )
        out = pd.DataFrame({"value": vals, "cnt": counts})
        out["total"] = np.int64(0)
        # one extra row carrying the batch's row count for n
        out.loc[len(out)] = [vc.index[0] if len(vc) else None, 0, len(b)]
        return out

    parts = ds.select_columns([col]).map_batches(
        partial, batch_format="pandas"
    ).to_pandas()
    total = int(parts["total"].sum())
    cand = parts[parts["cnt"] > 0].groupby("value", as_index=False)["cnt"].sum()
    cvals, ccnts = _mg_compress(
        cand["value"].to_numpy(), cand["cnt"].to_numpy(np.int64), k
    )
    cand_set = pd.unique(cvals)

    def exact_count(b: pd.DataFrame) -> pd.DataFrame:
        v = b[col]
        vc = v[v.isin(cand_set)].value_counts()
        return pd.DataFrame(
            {"value": vc.index.to_numpy(), "n": vc.to_numpy(np.int64)}
        )

    exact = ds.select_columns([col]).map_batches(
        exact_count, batch_format="pandas"
    ).to_pandas()
    if len(exact) == 0:
        return pd.DataFrame({"value": cand_set[:0], "n": np.array([], np.int64)})
    agg = exact.groupby("value", as_index=False)["n"].sum()
    hot = agg[agg["n"].to_numpy(np.int64) * k > total]
    return hot.sort_values("value").reset_index(drop=True)


def weighted_sample_k(
    ds: rd.Dataset,
    id_col: str,
    weight_col: str,
    k: int,
    *,
    columns: list[str] | None = None,
) -> pd.DataFrame:
    """Deterministic weighted sample WITHOUT replacement of k rows
    (Efraimidis & Spirakis 2006 one-pass weighted reservoir, the
    Gumbel-top-k form): each row scores

      score_i = ln(w_i) + gumbel(h_i),  gumbel = -ln(-ln(u)),
      u = (splitmix64(id) + 0.5) / 2^64

    and the k highest scores win — equivalent to sequential draws with
    probability proportional to weight. This is the RESAMPLING half of
    a DSIR pipeline (dsir.dsir_weights produces importance_e6; exp of
    it is the weight). No RNG state: a pure function of the id set, so
    order/partition-invariant and mergeable exactly like
    bottom_k_sample — per-batch local top-k, driver folds <= k *
    n_blocks survivors. Rows with weight <= 0 are excluded. Ties
    (possible only for duplicate ids) break by (score desc, id asc)."""
    from raylinkgraph.functions.hashing import splitmix64

    cols = columns or [
        c for c in ds.schema().names if c not in (id_col, weight_col)
    ]

    def trim(b: pd.DataFrame) -> pd.DataFrame:
        w = b[weight_col].to_numpy(np.float64)
        h = splitmix64(b[id_col].to_numpy(np.int64)).astype(np.uint64)
        u = (h.astype(np.float64) + 0.5) / float(2**64)
        with np.errstate(divide="ignore", invalid="ignore"):
            score = np.log(w) - np.log(-np.log(u))
        ok = w > 0
        b, score = b[ok], score[ok]
        if len(b) > k:
            keep = np.argpartition(-score, k)[:k]
            b = b.iloc[keep]
            score = score[keep]
        out = b[[id_col, weight_col] + cols].copy()
        out["__s"] = score
        return out

    got = ds.map_batches(trim, batch_format="pandas").to_pandas()
    got = (
        got.nlargest(k, "__s", keep="all")
        .sort_values(["__s", id_col], ascending=[False, True], kind="mergesort")
        .head(k)
    )
    return got.drop(columns="__s").reset_index(drop=True)


def approx_distinct_by(
    ds: rd.Dataset,
    group_col: str,
    col: str,
    *,
    p: int = 12,
    buckets: int = 32,
    batch_size: int = 65536,
) -> rd.Dataset:
    """Grouped approximate COUNT(DISTINCT col) -> (group, approx_distinct):
    one HLL sketch per group key, the 100TB shape for per-segment
    cardinality (distinct users per event type, distinct urls per host):
    each batch emits per-(group, register) partial maxima (<= 2^p rows
    per group seen), groups hash to fixed buckets (any_key_partition —
    a group's registers all land in ONE bucket), and the in-bucket fold
    is fully vectorized: lexsort segment-max to final registers, then
    bincount folds to per-group estimates. Deterministic; standard
    error ~1.04 / sqrt(2^p) per group."""
    from raylinkgraph.functions.hashing import any_key_partition

    if not 4 <= p <= 16:
        raise ValueError("p must be in [4, 16]")
    m = 1 << p
    alpha = _hll_alpha(m)

    def partial(batch: pa.Table) -> pa.Table:
        vals = batch.column(col)
        is_str = pa.types.is_string(vals.type) or pa.types.is_large_string(
            vals.type
        )
        h = _hash_column(vals, is_str)
        reg = (h >> np.uint64(64 - p)).astype(np.int64)
        rest = h << np.uint64(p)
        nz = rest != 0
        lz = np.full(len(h), 64 - p, np.int64)
        x = rest[nz]
        n = np.zeros(x.shape, np.int64)
        for shift in (32, 16, 8, 4, 2, 1):
            mask = x < (np.uint64(1) << np.uint64(64 - shift))
            n[mask] += shift
            x[mask] = x[mask] << np.uint64(shift)
        lz[nz] = n
        rank = np.minimum(lz, 64 - p) + 1
        gv = batch.column(group_col).to_pandas()
        out = pd.DataFrame({"g": gv, "register": reg, "rank": rank})
        out = out.groupby(["g", "register"], as_index=False, sort=False)[
            "rank"
        ].max()
        out["__p"] = any_key_partition(out["g"].to_numpy(), buckets)
        return pa.Table.from_pandas(out, preserve_index=False)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        codes_g, uniq_g = pd.factorize(g["g"], sort=True)
        reg = g["register"].to_numpy(np.int64)
        rank = g["rank"].to_numpy(np.int64)
        # segment max over (group, register)
        order = np.lexsort((-rank, reg, codes_g))
        cg, rg, rk = codes_g[order], reg[order], rank[order]
        first = np.r_[True, (cg[1:] != cg[:-1]) | (rg[1:] != rg[:-1])] \
            if len(cg) else np.array([], bool)
        cg, rk = cg[first], rk[first]
        sum2 = np.bincount(cg, weights=np.power(2.0, -rk.astype(np.float64)),
                           minlength=len(uniq_g))
        cnt = np.bincount(cg, minlength=len(uniq_g)).astype(np.int64)
        raw = alpha * m * m / (sum2 + (m - cnt))  # untouched regs add 2^0
        zeros = (m - cnt).astype(np.float64)
        lin = np.where(zeros > 0, m * np.log(np.maximum(m / np.maximum(zeros, 1e-300), 1.0)), raw)
        est = np.where((raw <= 2.5 * m) & (zeros > 0), lin, raw)
        return pd.DataFrame(
            {
                group_col: uniq_g,
                "approx_distinct": np.floor(est + 0.5).astype(np.int64),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=batch_size)
        .groupby("__p")
        .map_groups(fold, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# Bloom filter (mergeable bitmap sketch)
# ---------------------------------------------------------------------------


def _bloom_params(n_keys: int, fpp: float) -> tuple[int, int]:
    """Optimal (m_bits rounded up to a power of two, k_hashes)."""
    n = max(n_keys, 1)
    m = int(np.ceil(-n * np.log(fpp) / (np.log(2.0) ** 2)))
    m = 1 << max(6, int(np.ceil(np.log2(m))))
    k = max(1, int(round(m / n * np.log(2.0))))
    return m, min(k, 8)


def _bloom_positions(keys, m: int, k: int) -> np.ndarray:
    """(len(keys), k) bit positions via double hashing h1 + i*h2 — the
    standard Kirsch-Mitzenmacher construction, fully vectorized.
    Accepts int64 arrays or string arrays (crc32-widened)."""
    from raylinkgraph.functions.hashing import crc32_str, splitmix64

    arr = np.asarray(keys)
    if arr.dtype.kind in "iu":
        base = arr.astype(np.int64)
    else:
        base = splitmix64(crc32_str(arr).astype(np.uint64).astype(np.int64)).astype(
            np.int64
        )
    h1 = splitmix64(base)
    h2 = splitmix64(base ^ np.int64(-0x61C8864680B583EB)) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)[None, :]
    return ((h1[:, None] + i * h2[:, None]) % np.uint64(m)).astype(np.int64)


def bloom_build(
    ds: rd.Dataset, col: str, *, fpp: float = 0.01, n_keys: int | None = None
) -> "tuple[np.ndarray, int, int]":
    """Build a Bloom bitmap over a key column -> (bits_u64, m, k).

    Mergeable by construction: each block folds its keys into a local
    bitmap and Ray's aggregate merges bitmaps with bitwise OR — the
    exchange is O(m) per block pair, never O(keys). Size m targets
    ``fpp`` at ``n_keys`` (defaults to ds.count())."""
    from ray.data.aggregate import AggregateFn

    n = int(n_keys if n_keys is not None else ds.count())
    m, k = _bloom_params(n, fpp)
    words = m // 64

    def acc_block(state: np.ndarray, block) -> np.ndarray:
        keys = block[col].to_numpy()
        if len(keys):
            pos = _bloom_positions(keys, m, k).ravel()
            np.bitwise_or.at(
                state, pos >> 6, np.uint64(1) << (pos & 63).astype(np.uint64)
            )
        return state

    agg = AggregateFn(
        init=lambda _: np.zeros(words, np.uint64),
        accumulate_block=acc_block,
        merge=np.bitwise_or,
        name="bloom",
    )
    bits = ds.aggregate(agg)["bloom"]
    return bits, m, k


def bloom_contains(bits: np.ndarray, m: int, k: int, keys) -> np.ndarray:
    """Vectorized membership probe -> bool array (no false negatives)."""
    pos = _bloom_positions(keys, m, k)
    word = bits[pos >> 6]
    hit = (word >> (pos & 63).astype(np.uint64)) & np.uint64(1)
    return hit.all(axis=1)
