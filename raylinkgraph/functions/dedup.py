"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Shapes follow the standard large-scale recipes:
- exact: content hash per batch -> groupby(hash) -> keep min doc_id
  (hash only partitions; equality is re-checked on the actual text, so
  hash collisions cannot merge distinct documents)
- MinHash+LSH: char-shingles -> ``num_perm`` universal-hash minima ->
  band hashes -> explode (band, band_hash, doc_id) -> groupby buckets ->
  candidate pairs -> verify with signature-estimated Jaccard (signatures
  shuffle with the rows; nothing O(corpus) is broadcast)
- SimHash: 64-bit weighted token-hash signature; banding on 4x16-bit
  chunks finds candidates; verify by Hamming distance
All hashing is fixed-seed and vectorized; results are independent of
parallelism.
"""

from __future__ import annotations

import os
import re
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

_U64 = np.uint64
_MERSENNE = _U64((1 << 61) - 1)


def _text_hash(texts: pd.Series) -> np.ndarray:
    """Vectorized 64-bit content hash (pandas siphash, fixed default key).
    The hash only PARTITIONS the groupby; in-group equality on the actual
    text decides dedup, so collisions cannot merge distinct documents."""
    return (
        pd.util.hash_pandas_object(texts.reset_index(drop=True), index=False)
        .to_numpy(np.uint64)
        .astype(np.int64)
    )


def exact_dedup(docs: rd.Dataset, text_col: str = "text") -> rd.Dataset:
    """Keep the smallest doc_id per distinct text -> (doc_id) rows.

    SQL parity: SELECT min(doc_id) AS doc_id FROM docs GROUP BY text.
    """

    from raylinkgraph.functions.hashing import partition_of

    def add_hash(batch: pd.DataFrame) -> pd.DataFrame:
        # per-batch pre-combine: one (hash, text) survivor per batch
        h = _text_hash(batch[text_col])
        out = pd.DataFrame(
            {"doc_id": batch["doc_id"], "t": batch[text_col], "h": h}
        )
        out = out.loc[out.groupby(["h", "t"], sort=False)["doc_id"].idxmin()]
        out["__p"] = partition_of(out["h"].to_numpy(np.int64), 64)
        return out

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        # hash(h)-bucketed, NOT groupby(h) — distinct-text cardinality is
        # unbounded and Ray's groupby dispatches Python-per-group; the
        # per-bucket (h, t) groupby is vectorized pandas
        kept = g.groupby(["h", "t"], sort=False)["doc_id"].min()
        return pd.DataFrame({"doc_id": np.sort(kept.to_numpy(np.int64))})

    return (
        docs.map_batches(add_hash, batch_format="pandas")
        .groupby("__p")
        .map_groups(keep_first, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """64-bit FNV-1a hashes of the char k-shingles of ``text``."""
    b = text.encode("utf-8")
    if len(b) < k:
        b = b + b"\x00" * (k - len(b))
    n = len(b) - k + 1
    arr = np.frombuffer(b, dtype=np.uint8)
    h = np.full(n, _U64(14695981039346656037))
    prime = _U64(1099511628211)
    for j in range(k):
        h = (h ^ arr[j : j + n].astype(_U64)) * prime
    return np.unique(h)


class MinHasher:
    """Actor-pool stage: per-doc MinHash signature + LSH band hashes."""

    def __init__(self, num_perm: int = 64, bands: int = 16, shingle_k: int = 5,
                 seed: int = 1234):
        assert num_perm % bands == 0
        rng = np.random.Generator(np.random.Philox(key=[seed, 0]))
        self.a = rng.integers(1, (1 << 61) - 1, num_perm, dtype=np.uint64)
        self.b = rng.integers(0, (1 << 61) - 1, num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.shingle_k = shingle_k

    def signature(self, text: str) -> np.ndarray:
        sh = _shingle_hashes(text, self.shingle_k)
        # universal hash (a*x + b) mod 2^61-1, min over shingles, per perm
        x = sh[None, :]
        v = (self.a[:, None] * x + self.b[:, None]) % _MERSENNE
        return v.min(axis=1)

    def batch_signatures(self, texts) -> np.ndarray:
        """All signatures of a batch in one vectorized pass: docs are
        concatenated with k-1 sentinel bytes, the FNV window hashes of
        the whole buffer are computed in k vector ops, windows crossing a
        doc boundary are dropped by index, and each permutation's min is
        a single ``np.minimum.reduceat`` at the doc offsets. Min over the
        shingle multiset == min over its unique set, so the result is
        byte-identical to ``signature()`` per doc."""
        k = self.shingle_k
        if not len(texts):
            return np.empty((0, self.num_perm), np.uint64)
        bufs = []
        lens = np.empty(len(texts), np.int64)
        for i, t in enumerate(texts):
            bt = t.encode("utf-8")
            if len(bt) < k:
                bt = bt + b"\x00" * (k - len(bt))
            bufs.append(bt)
            lens[i] = len(bt)
        buf = (b"\xff" * (k - 1)).join(bufs)
        arr = np.frombuffer(buf, np.uint8)
        nwin_total = len(arr) - k + 1
        h = np.full(nwin_total, _U64(14695981039346656037))
        prime = _U64(1099511628211)
        for j in range(k):
            h = (h ^ arr[j : j + nwin_total].astype(_U64)) * prime
        # valid window start per doc i: starts[i] .. starts[i]+lens[i]-k
        starts = np.concatenate(([0], np.cumsum(lens + (k - 1))[:-1]))
        nwin = lens - k + 1
        offsets = np.concatenate(([0], np.cumsum(nwin)[:-1]))
        idx = np.arange(int(nwin.sum()), dtype=np.int64)
        idx += np.repeat(starts - offsets, nwin)
        hv = h[idx]
        # chunked 2D broadcast: ~4k shingles x num_perm stays in L2, and
        # one (mult, add, mod, reduceat) numpy call sequence covers many
        # docs at once instead of one call sequence per doc
        sigs = np.empty((len(texts), self.num_perm), np.uint64)
        a2, b2 = self.a[:, None], self.b[:, None]
        target = 4096
        d0 = 0
        while d0 < len(texts):
            d1 = d0 + 1
            while d1 < len(texts) and offsets[d1] - offsets[d0] < target:
                d1 += 1
            lo = offsets[d0]
            hi = offsets[d1] if d1 < len(texts) else len(hv)
            v = (a2 * hv[None, lo:hi] + b2) % _MERSENNE
            sigs[d0:d1] = np.minimum.reduceat(
                v, offsets[d0:d1] - lo, axis=1
            ).T
            d0 = d1
        return sigs

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sigs = self.batch_signatures(batch["text"].tolist())
        band_ids = np.repeat(np.arange(self.bands, dtype=np.int32), len(batch))
        doc_ids = np.tile(batch["doc_id"].to_numpy(np.int64), self.bands)
        bh = []
        for bnd in range(self.bands):
            seg = sigs[:, bnd * self.rows_per_band : (bnd + 1) * self.rows_per_band]
            mix = np.full(len(seg), _U64(14695981039346656037))
            for c in range(seg.shape[1]):
                mix = (mix ^ seg[:, c]) * _U64(1099511628211)
            bh.append(mix)
        band_hash = np.concatenate(bh).astype(np.int64)
        sig_rows = np.tile(sigs.astype(np.int64), (self.bands, 1))
        return pd.DataFrame(
            {
                "band": band_ids,
                "band_hash": band_hash,
                "doc_id": doc_ids,
                "sig": list(sig_rows),
            }
        )


def minhash_lsh_pairs(
    docs: rd.Dataset,
    *,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    threshold: float = 0.5,
    concurrency=(1, 4),
    max_bucket: int = 200,
) -> rd.Dataset:
    """Near-duplicate candidate pairs with signature-estimated Jaccard >=
    threshold -> (a, b, est_jaccard), a < b, deduplicated across bands."""
    sig_ds = docs.map_batches(
        MinHasher,
        fn_constructor_kwargs={
            "num_perm": num_perm, "bands": bands, "shingle_k": shingle_k
        },
        batch_format="pandas",
        concurrency=concurrency,
        num_cpus=1,
    )

    def one_bucket(ids: np.ndarray, sigs: np.ndarray) -> pd.DataFrame:
        n = len(ids)
        iu, ju = np.triu_indices(n, k=1)
        est = (sigs[iu] == sigs[ju]).mean(axis=1)
        keep = est >= threshold
        return pd.DataFrame(
            {"a": ids[iu[keep]], "b": ids[ju[keep]], "est_jaccard": est[keep]}
        )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"a": [], "b": [], "est_jaccard": []}).astype(
            {"a": np.int64, "b": np.int64, "est_jaccard": np.float64}
        )
        g = g.drop_duplicates("doc_id").sort_values("doc_id")
        n = len(g)
        if n < 2:
            return empty
        ids = g["doc_id"].to_numpy(np.int64)
        sigs = np.stack(g["sig"].to_numpy())
        if n <= max_bucket:
            return one_bucket(ids, sigs)
        # skew guard: SPLIT the hot bucket instead of silently dropping.
        # TWO-PROBE sub-split: every row lands in a sub-bucket keyed by
        # signature component 0 AND one keyed by component 1, so a
        # near-dup pair is compared whenever it agrees on EITHER
        # component — P(compared) ~ 1-(1-j)^2 (~75% at j=0.5) vs j for a
        # single-component split. BOTH residual losses are counted and
        # logged: pairs that disagree on both probe components
        # (cross-sub-bucket, estimated from the sub-bucket sizes) and
        # pairs chunked apart inside an oversized identical-key
        # sub-bucket (exact).
        n_sub = int(np.ceil(n / max_bucket))
        total_pairs = n * (n - 1) // 2
        parts, chunk_skipped, within = [], 0, []
        for probe in (0, 1):
            sub = (sigs[:, probe].astype(np.uint64) % np.uint64(n_sub)).astype(
                np.int64
            )
            probe_within = 0
            for s in np.unique(sub):
                m = sub == s
                sids, ssigs = ids[m], sigs[m]
                probe_within += len(sids) * (len(sids) - 1) // 2
                if len(sids) <= max_bucket:
                    parts.append(one_bucket(sids, ssigs))
                else:
                    for lo in range(0, len(sids), max_bucket):
                        hi = min(lo + max_bucket, len(sids))
                        parts.append(one_bucket(sids[lo:hi], ssigs[lo:hi]))
                    chunk_skipped += len(sids) * (len(sids) - 1) // 2 - sum(
                        (min(lo + max_bucket, len(sids)) - lo)
                        * (min(lo + max_bucket, len(sids)) - lo - 1) // 2
                        for lo in range(0, len(sids), max_bucket)
                    )
            within.append(probe_within)
        cross_lb = max(0, total_pairs - within[0] - within[1])
        cross_ub = min(total_pairs - within[0], total_pairs - within[1])
        if chunk_skipped or cross_ub:
            print(
                f"[minhash_lsh] hot bucket (n={n}) two-probe sub-split: "
                f"{cross_lb}..{cross_ub} pairs outside both probes (compared "
                f"only if another band co-locates them), {chunk_skipped} "
                f"pairs chunked apart inside oversized sub-buckets",
                file=sys.stderr,  # keep stdout clean for the bench JSON line
            )
        out = pd.concat(parts, ignore_index=True) if parts else empty
        return out.drop_duplicates(["a", "b"]) if len(out) else empty

    # hash the unbounded (band, band_hash) key down to fixed partitions
    # (Ray groupby dispatches Python-per-group — any_key_partition doc);
    # inside a partition, LSH buckets iterate as pandas sub-groups
    from raylinkgraph.functions.hashing import pair_hash, partition_of

    def tag_part(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["__p"] = partition_of(
            pair_hash(
                b["band"].to_numpy(np.int64), b["band_hash"].to_numpy(np.int64)
            ).astype(np.int64),
            64,
        )
        return b

    def partition_pairs(g: pd.DataFrame) -> pd.DataFrame:
        parts = [
            bucket_pairs(sub)
            for _, sub in g.groupby(["band", "band_hash"], sort=False)
        ]
        out = pd.concat(parts, ignore_index=True) if parts else bucket_pairs(g.iloc[0:0])
        return out

    pairs = (
        sig_ds.map_batches(tag_part, batch_format="pandas")
        .groupby("__p")
        .map_groups(partition_pairs, batch_format="pandas")
    )

    def tag_pair(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["__q"] = partition_of(
            pair_hash(b["a"].to_numpy(np.int64), b["b"].to_numpy(np.int64)).astype(
                np.int64
            ),
            64,
        )
        return b

    def dedup_pairs(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["a", "b"]).drop(columns="__q")

    return (
        pairs.map_batches(tag_pair, batch_format="pandas")
        .groupby("__q")
        .map_groups(dedup_pairs, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(r"\S+")


_FNV_OFF = _U64(14695981039346656037)
_FNV_PRIME = _U64(1099511628211)


def _fnv_tokens(toks: list[str]) -> np.ndarray:
    """FNV-1a of each token, vectorized: one pass over a padded view of
    the space-joined byte stream (tokens are \\S+ so the space separator
    is unambiguous); the inner loop runs max-token-LENGTH times over all
    tokens at once — byte-identical to the per-byte Python loop it
    replaces."""
    if not toks:
        return np.empty(0, _U64)
    arr = np.frombuffer(" ".join(toks).encode("utf-8"), np.uint8)
    sep = np.flatnonzero(arr == 32)
    starts = np.r_[0, sep + 1]
    ends = np.r_[sep, len(arr)]
    lengths = ends - starts
    h = np.full(len(toks), _FNV_OFF)
    for j in range(int(lengths.max())):
        active = lengths > j
        h[active] = (h[active] ^ arr[starts[active] + j].astype(_U64)) * _FNV_PRIME
    return h


class SimHasher:
    """64-bit SimHash over token FNV hashes (weight = token count)."""

    def __init__(self, seed: int = 99):
        self.token = _TOKEN_RE

    def simhash(self, text: str) -> np.uint64:
        toks = self.token.findall(text)
        if not toks:
            return _U64(0)
        hs = _fnv_tokens(toks)
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & _U64(1))
        v = (2 * bits.astype(np.int64) - 1).sum(axis=0)
        return _U64(np.packbits((v > 0)[::-1]).view(">u8")[0])

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sh = np.array([self.simhash(t) for t in batch["text"]], dtype=np.uint64)
        return pd.DataFrame({"doc_id": batch["doc_id"], "simhash": sh.astype(np.int64)})


def simhash_pairs(
    docs: rd.Dataset, *, max_hamming: int = 3, concurrency=(1, 4)
) -> rd.Dataset:
    """Near-dup pairs by SimHash: band on (max_hamming+1) chunks (any
    chunk equal -> candidate; catches all pairs with Hamming <=
    max_hamming by pigeonhole), verify Hamming -> (a, b, hamming)."""
    sig = docs.map_batches(
        SimHasher, batch_format="pandas", concurrency=concurrency, num_cpus=1
    )
    return hash64_band_pairs(
        sig, id_col="doc_id", hash_col="simhash", max_hamming=max_hamming
    )


def hash64_band_pairs(
    sig: rd.Dataset,
    *,
    id_col: str,
    hash_col: str,
    max_hamming: int = 3,
    maxb: int = 2000,
) -> rd.Dataset:
    """Generic near-dup pairs over ANY 64-bit signature column (SimHash
    text signatures, image perceptual hashes, ...) -> (a, b, hamming).

    Banding: the 64 bits split into B = max_hamming + 1 nearly-even
    chunks; two signatures at Hamming <= max_hamming must agree on at
    least one chunk (pigeonhole), so candidate generation is
    recall-complete. The (chunk, key) space is unbounded -> hashed down
    to 64 fixed partitions (the engine-wide any-key rule); hot buckets
    sub-split locality-preservingly on the top bits of the signature
    outside the matched chunk — degraded recall is reported, never
    silent."""
    from raylinkgraph.functions.hashing import pair_hash, partition_of

    B = max_hamming + 1
    if not 1 <= B <= 64:
        raise ValueError(f"max_hamming must be in [0, 63], got {max_hamming}")
    width = 64 // B
    shifts = [k * width for k in range(B)]
    masks = [
        (1 << width) - 1 if k < B - 1 else (1 << (64 - shifts[-1])) - 1
        for k in range(B)
    ]

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        h = batch[hash_col].to_numpy(np.int64).astype(np.uint64)
        ids = batch[id_col].to_numpy(np.int64)
        rows = [
            pd.DataFrame(
                {
                    "chunk": np.full(len(h), k, np.int32),
                    "key": ((h >> _U64(shifts[k])) & _U64(masks[k])).astype(np.int64),
                    "id": ids,
                    "sig": h.astype(np.int64),
                }
            )
            for k in range(B)
        ]
        return pd.concat(rows, ignore_index=True)

    def pairs_of(ids: np.ndarray, h: np.ndarray) -> pd.DataFrame:
        iu, ju = np.triu_indices(len(ids), k=1)
        x = h[iu] ^ h[ju]
        ham = np.zeros(len(x), np.int64)
        while True:
            nz = x != 0
            if not nz.any():
                break
            ham[nz] += 1
            x = x & (x - _U64(1))
        keep = ham <= max_hamming
        return pd.DataFrame(
            {"a": ids[iu[keep]], "b": ids[ju[keep]], "hamming": ham[keep]}
        )

    def bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"a": pd.Series([], dtype=np.int64), "b": pd.Series([], dtype=np.int64),
             "hamming": pd.Series([], dtype=np.int64)}
        )
        g = g.drop_duplicates("id").sort_values("id")
        n = len(g)
        if n < 2:
            return empty
        ids = g["id"].to_numpy(np.int64)
        h = g["sig"].to_numpy(np.int64).astype(np.uint64)
        if n <= maxb:
            return pairs_of(ids, h)
        # Hot bucket: sub-split on the TOP bits of the signature with the
        # matched band chunk removed (locality-preserving).  Every pair in
        # this bucket agrees exactly on chunk c; a true near-dup pair
        # differs in <= max_hamming of the remaining bits, so splitting on
        # log2(n_sub) high REST bits separates it only when a differing
        # bit lands in those few positions (~log2(n_sub)/rest_bits per
        # bit) — unlike an avalanche mix of the full signature, which
        # separates any hamming>=1 pair w.p. (n_sub-1)/n_sub.  Chunk any
        # residue; log both as potential recall loss, never silently.
        c = int(g["chunk"].iloc[0])
        s_c, w_c = shifts[c], int(masks[c]).bit_length()
        rest = ((h >> _U64(s_c + w_c)) << _U64(s_c)) | (h & _U64((1 << s_c) - 1))
        rest_bits = 64 - w_c
        n_sub = int(np.ceil(n / maxb))
        sub_bits = max(1, int(np.ceil(np.log2(n_sub))))
        sub = (rest >> _U64(rest_bits - sub_bits)).astype(np.int64)
        parts, chunked = [], 0
        for s in np.unique(sub):
            m = sub == s
            sids, sh = ids[m], h[m]
            for lo in range(0, len(sids), maxb):
                hi = min(lo + maxb, len(sids))
                parts.append(pairs_of(sids[lo:hi], sh[lo:hi]))
            if len(sids) > maxb:
                chunked += 1
        print(
            f"[hash64_band] hot bucket chunk={c} n={n}: split into "
            f"{1 << sub_bits} top-rest-bit sub-buckets (potential recall "
            f"loss for pairs differing in the top {sub_bits} rest bits)"
            + (f"; {chunked} sub-buckets further chunked" if chunked else ""),
            file=sys.stderr,
        )
        out = pd.concat(parts, ignore_index=True) if parts else empty
        return out.drop_duplicates(["a", "b"]) if len(out) else empty

    def tag_part(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["__p"] = partition_of(
            pair_hash(
                b["chunk"].to_numpy(np.int32).astype(np.int64),
                b["key"].to_numpy(np.int64),
            ).astype(np.int64),
            64,
        )
        return b

    def partition_buckets(g: pd.DataFrame) -> pd.DataFrame:
        parts = [
            bucket(sub) for _, sub in g.groupby(["chunk", "key"], sort=False)
        ]
        return pd.concat(parts, ignore_index=True) if parts else bucket(g.iloc[0:0])

    pairs = (
        sig.map_batches(explode, batch_format="pandas")
        .map_batches(tag_part, batch_format="pandas")
        .groupby("__p")
        .map_groups(partition_buckets, batch_format="pandas")
    )

    def tag_pair(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["__q"] = partition_of(
            pair_hash(b["a"].to_numpy(np.int64), b["b"].to_numpy(np.int64)).astype(
                np.int64
            ),
            64,
        )
        return b

    def dedup_pairs(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["a", "b"]).drop(columns="__q")

    return (
        pairs.map_batches(tag_pair, batch_format="pandas")
        .groupby("__q")
        .map_groups(dedup_pairs, batch_format="pandas")
    )


def ngram_jaccard_pairs(
    docs: rd.Dataset, *, n: int = 3, threshold: float = 0.4, **lsh_kwargs
) -> rd.Dataset:
    """Exact word-n-gram Jaccard on MinHash-LSH candidates: candidates come
    from minhash_lsh_pairs (cheap screen), exact verification re-reads the
    two texts via a partitioned join on doc_id -> (a, b, jaccard)."""
    cands = minhash_lsh_pairs(docs, threshold=threshold * 0.5, **lsh_kwargs)
    texts = docs.select_columns(["doc_id", "text"])

    def tag(batch: pd.DataFrame, col, out):
        b = batch.copy()
        b["join_key"] = b[col]
        b["side"] = out
        return b

    # attach text of a then b via hash(doc_id)-BUCKETED joins — join_key
    # cardinality is the corpus size, so a raw groupby(join_key) would hit
    # Ray's per-group dispatch; per bucket the lookup is one dict build +
    # one vectorized map
    from raylinkgraph.functions.hashing import partition_of

    def join_side(pairs_ds, col, text_name):
        def tag_pairs(b: pd.DataFrame) -> pd.DataFrame:
            b = tag(b, col, 0)
            b["__p"] = partition_of(b["join_key"].to_numpy(np.int64), 64)
            return b

        tagged_pairs = pairs_ds.map_batches(tag_pairs, batch_format="pandas")
        tagged_text = texts.map_batches(
            lambda b: pd.DataFrame(
                {
                    "join_key": b["doc_id"],
                    "side": 1,
                    "text": b["text"],
                    "__p": partition_of(b["doc_id"].to_numpy(np.int64), 64),
                }
            ),
            batch_format="pandas",
        )

        def merge(g: pd.DataFrame) -> pd.DataFrame:
            t = g[g["side"] == 1]
            p = g[g["side"] == 0]
            if len(p) == 0 or len(t) == 0:
                return p.drop(
                    columns=["join_key", "side", "text", "__p"], errors="ignore"
                ).assign(**{text_name: pd.Series([], dtype=object)}).iloc[0:0]
            lut = dict(zip(t["join_key"], t["text"]))
            out = p.drop(columns=["side", "text", "__p"], errors="ignore").copy()
            out[text_name] = out["join_key"].map(lut)
            return out.drop(columns=["join_key"])

        return tagged_pairs.union(tagged_text).groupby("__p").map_groups(
            merge, batch_format="pandas"
        )

    with_a = join_side(cands, "a", "text_a")
    with_b = join_side(with_a, "b", "text_b")

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"a": pd.Series([], dtype=np.int64),
             "b": pd.Series([], dtype=np.int64),
             "jaccard": pd.Series([], dtype=np.float64)}
        )
        if not len(batch):
            return empty
        ha = _ngram_hash_sets(batch["text_a"], n)
        hb = _ngram_hash_sets(batch["text_b"], n)
        jac = np.empty(len(batch), np.float64)
        for i, (x, y) in enumerate(zip(ha, hb)):
            if not len(x) and not len(y):
                jac[i] = 1.0
            else:
                inter = np.intersect1d(x, y, assume_unique=True).size
                jac[i] = inter / (len(x) + len(y) - inter)
        keep = jac >= threshold
        return pd.DataFrame(
            {"a": batch["a"].to_numpy(np.int64)[keep],
             "b": batch["b"].to_numpy(np.int64)[keep],
             "jaccard": jac[keep]}
        )

    return with_b.map_batches(verify, batch_format="pandas")


def _ngram_hash_sets(texts: pd.Series, n: int) -> list[np.ndarray]:
    """Per doc: sorted unique 64-bit hashes of word n-grams. Tokenizing is
    the only per-doc step; token hashing and the rolling n-gram combine
    are vectorized over each doc's token array, and the pair comparison
    in verify() is a sorted-array intersection (no Python sets, no
    iterrows). 64-bit hash collisions perturb Jaccard by < 1e-9 at any
    realistic doc size."""
    _P = np.uint64(1099511628211)
    out = []
    for t in texts:
        toks = _TOKEN_RE.findall(t)
        L = len(toks)
        if L < n:
            out.append(np.empty(0, np.uint64))
            continue
        th = pd.util.hash_pandas_object(
            pd.Series(toks), index=False
        ).to_numpy(np.uint64)
        with np.errstate(over="ignore"):
            h = np.zeros(L - n + 1, np.uint64)
            for j in range(n):
                h = (h * _P) ^ th[j : L - n + 1 + j]
        out.append(np.unique(h))
    return out


# ---------------------------------------------------------------------------
# Duplicate-cluster resolution (pairs -> connected components -> keep list)
# ---------------------------------------------------------------------------


def dup_clusters(
    docs: rd.Dataset,
    workdir: str,
    *,
    n: int = 8,
    max_df: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 32,
    batch_size: int = 2048,
    P: int = 8,
) -> rd.Dataset:
    """Fuzzy-dedup final step: candidate pairs -> weakly-connected
    components -> canonical keep list (SlimPajama/Dolma-style cluster
    resolution) -> (doc_id, cluster_id, keep) for EVERY document.

    Two docs pair when they share a distinct word ``n``-gram that occurs
    in at most ``max_df`` documents (the df cap drops boilerplate grams
    the way real pipelines drop stop-shingles — and bounds per-gram pair
    fan-out at C(max_df, 2)). Components are computed by the repo's own
    BSP hash-min WCC (algos/wcc.py — reference gs::WCCProjected,
    analytical_engine/apps/projected/wcc_projected.h:29-186) over the
    pair graph, so ``cluster_id`` = MIN doc_id reachable via shared-gram
    links, transitively. ``keep`` = 1 iff the doc is its cluster's min.

    Dataflow (scale shape):
      1. map_batches: distinct (gram, doc_id) per doc, hash(gram)-bucketed
         (gram strings travel with rows — no collision risk).
      2. per gram-bucket fold: df-filtered grams expand to sorted doc
         pairs, vectorized per size class (triu_indices broadcast);
         the pair set (bounded by C(max_df,2) per surviving gram) is
         materialized once into the spill-backed object store.
      3. LinkGraph.build(symmetrize) + run_bsp(WCC) — one graph build +
         per-superstep-checkpointed fixpoint; nothing O(corpus) on the
         driver.
      4. doc ids UNION component labels, hash(doc)-bucketed fold picks
         the component label when present else self.
    """

    from raylinkgraph.functions.hashing import any_key_partition, partition_of

    def grams_stage(batch: pd.DataFrame) -> pd.DataFrame:
        doc_ids = batch[id_col].to_numpy(np.int64)
        grams: list[np.ndarray] = []
        docs_rep: list[np.ndarray] = []
        for did, toks in zip(doc_ids, batch[text_col].str.split(" ", regex=False)):
            if len(toks) < n:
                continue
            a = np.array(toks, dtype=object)
            parts = [a[i: len(a) - n + 1 + i] for i in range(n)]
            g = parts[0]
            for p in parts[1:]:
                g = g + " " + p
            g = np.unique(g)
            grams.append(g)
            docs_rep.append(np.full(len(g), did, np.int64))
        if not grams:
            return pd.DataFrame(
                {"gram": pd.Series([], dtype=object),
                 id_col: pd.Series([], dtype=np.int64),
                 "__p": pd.Series([], dtype=np.int32)}
            )
        g = np.concatenate(grams)
        return pd.DataFrame(
            {"gram": g, id_col: np.concatenate(docs_rep),
             "__p": any_key_partition(g, buckets)}
        )

    def pair_fold(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"src_id": pd.Series([], dtype=np.int64),
             "dst_id": pd.Series([], dtype=np.int64)}
        )
        g = g.sort_values(["gram", id_col], kind="mergesort")
        sz = g.groupby("gram", sort=False)["gram"].transform("size").to_numpy(np.int64)
        keep = (sz >= 2) & (sz <= max_df)
        g, sz = g[keep], sz[keep]
        if not len(g):
            return empty
        ids = g[id_col].to_numpy(np.int64)
        gv = g["gram"].to_numpy()
        starts = np.flatnonzero(np.r_[True, gv[1:] != gv[:-1]])
        gsz = sz[starts]
        a_out, b_out = [], []
        for s in np.unique(gsz):  # <= max_df-1 size classes, each vectorized
            rows = starts[gsz == s]
            block = ids[rows[:, None] + np.arange(int(s))]
            iu, ju = np.triu_indices(int(s), 1)
            a_out.append(block[:, iu].ravel())
            b_out.append(block[:, ju].ravel())
        out = pd.DataFrame(
            {"src_id": np.concatenate(a_out), "dst_id": np.concatenate(b_out)}
        ).drop_duplicates()
        return out if len(out) else empty

    pairs = (
        docs.map_batches(grams_stage, batch_format="pandas", batch_size=batch_size)
        .groupby("__p")
        .map_groups(pair_fold, batch_format="pandas")
        .materialize()  # bounded: <= C(max_df,2) per surviving gram; spill-backed
    )

    ids_only = docs.select_columns([id_col])

    def self_rows(batch: pa.Table) -> pd.DataFrame:
        did = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return pd.DataFrame(
            {id_col: did, "cluster_id": did,
             "pri": np.ones(len(did), np.int8),
             "__b": partition_of(did, buckets)}
        )

    if pairs.count() == 0:
        def finish_all(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {id_col: b[id_col].to_numpy(np.int64),
                 "cluster_id": b[id_col].to_numpy(np.int64),
                 "keep": np.ones(len(b), np.int64)}
            )
        return ids_only.map_batches(
            lambda t: finish_all(t.to_pandas()), batch_format="pyarrow"
        )

    from raylinkgraph.algos.wcc import WCC
    from raylinkgraph.bsp import run_bsp
    from raylinkgraph.stages.graph_build import LinkGraph

    g = LinkGraph.build(
        pairs, os.path.join(workdir, "graph"), P=P, symmetrize=True
    )
    res = run_bsp(g, WCC(), os.path.join(workdir, "bsp"), max_rounds=10_000)

    def comp_rows(batch: pa.Table) -> pd.DataFrame:
        oid = batch.column("oid").to_numpy(zero_copy_only=False).astype(np.int64)
        comp = batch.column("comp").to_numpy(zero_copy_only=False).astype(np.int64)
        return pd.DataFrame(
            {id_col: oid, "cluster_id": comp,
             "pri": np.zeros(len(oid), np.int8),
             "__b": partition_of(oid, buckets)}
        )

    def resolve(gr: pd.DataFrame) -> pd.DataFrame:
        gr = gr.sort_values([id_col, "pri"], kind="mergesort")
        first = gr.drop_duplicates(id_col, keep="first")
        did = first[id_col].to_numpy(np.int64)
        cid = first["cluster_id"].to_numpy(np.int64)
        return pd.DataFrame(
            {id_col: did, "cluster_id": cid,
             "keep": (did == cid).astype(np.int64)}
        )

    tagged = ids_only.map_batches(self_rows, batch_format="pyarrow").union(
        res.state_ds().map_batches(comp_rows, batch_format="pyarrow")
    )
    return tagged.groupby("__b").map_groups(resolve, batch_format="pandas")


def paragraph_dedup(
    docs: rd.Dataset,
    *,
    window: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 64,
) -> rd.Dataset:
    """CCNet-style duplicated-paragraph removal (Wenzek et al. 2020 §3.1:
    CCNet dedups Common-Crawl by dropping every paragraph whose hash is
    duplicated across shards; RefinedWeb keeps the same step). The
    driver's documents have no paragraph marks, so pseudo-paragraphs are
    consecutive ``window``-word chunks (last chunk may be shorter) — the
    unit swap leaves the pipeline shape identical.

    A chunk is dropped when its EXACT text occurs more than once across
    the whole corpus (all occurrences dropped — CCNet drops duplicated
    paragraphs everywhere, unlike keep-first document dedup). Grouping
    travels by hash but the duplicate decision compares real chunk text
    inside the bucket, so hash collisions cannot merge distinct chunks.

    Two bucketed exchanges: (1) hash(chunk_text) — all occurrences of a
    chunk co-locate, per-bucket value_counts flags dups; (2) hash(doc) —
    surviving chunks reassemble in position order. -> (doc_id, n_chunks,
    n_dropped, text_kept).
    """
    from raylinkgraph.functions.hashing import partition_of

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        ids, cids, texts = [], [], []
        for did, txt in zip(b[id_col], b[text_col]):
            ws = txt.split(" ") if txt else []
            for k in range(0, max(len(ws), 1), window):
                ids.append(did)
                cids.append(k // window)
                texts.append(" ".join(ws[k : k + window]))
        out = pd.DataFrame(
            {id_col: np.asarray(ids, np.int64),
             "cid": np.asarray(cids, np.int64),
             "ctext": texts}
        )
        out["__p"] = (
            pd.util.hash_pandas_object(out["ctext"], index=False).to_numpy(
                np.uint64
            )
            % np.uint64(buckets)
        ).astype(np.int32)
        return out

    def flag(g: pd.DataFrame) -> pd.DataFrame:
        n = g.groupby("ctext")["ctext"].transform("size")
        out = g[[id_col, "cid", "ctext"]].copy()
        out["dup"] = (n > 1).to_numpy()
        out["__p"] = partition_of(out[id_col].to_numpy(np.int64), buckets)
        return out

    def reassemble(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([id_col, "cid"], kind="mergesort")
        rows = []
        for did, u in g.groupby(id_col, sort=True):
            dup = u["dup"].to_numpy()
            kept = u["ctext"].to_numpy()[~dup]
            rows.append(
                (did, len(u), int(dup.sum()), " ".join(kept))
            )
        return pd.DataFrame(
            rows, columns=[id_col, "n_chunks", "n_dropped", "text_kept"]
        ).astype({id_col: np.int64, "n_chunks": np.int64,
                  "n_dropped": np.int64})

    return (
        docs.map_batches(explode, batch_format="pandas")
        .groupby("__p")
        .map_groups(flag, batch_format="pandas")
        .groupby("__p")
        .map_groups(reassemble, batch_format="pandas")
    )
