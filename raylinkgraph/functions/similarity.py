"""Similarity search over an embedding column (list<float>).

- Brute-force cosine top-k: the query matrix is normalized once, shipped
  via one ``ray.put`` and read zero-copy by an actor pool; each batch is
  a numpy matmul; per-batch top-k partials are reduced by a tiny final
  groupby. O(batch x k_q) work per batch, no全-corpus materialization.
- LSH-bucketed ANN (scale path): random-hyperplane signatures bucket the
  corpus; queries search only their own bucket (with multiprobe over
  1-bit flips), then exact-rerank. Recall < 1 by design; the brute-force
  path is the exactness baseline.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd


def _train_sample(
    embeddings: rd.Dataset, id_col: str, n_total: int, train_sample: int
) -> pd.DataFrame:
    """Deterministic ~``train_sample``-row training subset, independent
    of the id distribution: select on ``splitmix64(id) % step == 0``
    rather than ``id % step == 0`` (the latter assumes dense 0-based
    ids — a sparse or offset id space yields an empty or skewed sample,
    and an empty sample would crash np.stack before k-means)."""
    from raylinkgraph.functions.hashing import splitmix64

    step = max(1, n_total // train_sample)

    def sample_rows(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        keep = splitmix64(ids.astype(np.int64)) % np.uint64(step) == 0
        return batch.filter(pa.array(keep))

    train = embeddings.map_batches(sample_rows, batch_format="pyarrow").to_pandas()
    if not len(train):
        raise ValueError(
            f"k-means training sample is empty (n_total={n_total}, "
            f"step={step}); the input id column may be empty"
        )
    return train.sort_values(id_col)


def _to_matrix(col) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if isinstance(col, pa.FixedSizeListArray):
        flat = col.values.to_numpy(zero_copy_only=False).astype(np.float64)
        return flat.reshape(len(col), col.type.list_size)
    if not isinstance(col, (pa.ListArray, pa.LargeListArray)):
        # e.g. Ray's ArrowTensorArray extension (from_pandas with ndarray
        # cells); to_numpy yields an (n, d) array directly
        return np.stack(col.to_numpy(zero_copy_only=False)).astype(np.float64)
    flat = col.values.to_numpy(zero_copy_only=False).astype(np.float64)
    offs = col.offsets.to_numpy(zero_copy_only=False)
    dim = offs[1] - offs[0]
    return flat.reshape(len(col), int(dim))


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def knn_cosine(
    embeddings: rd.Dataset,
    query_ids: list[int],
    k: int = 10,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    concurrency=(1, 4),
) -> pd.DataFrame:
    """Exact top-k cosine neighbors for each query id -> (query_id,
    neighbor_id, rnk), self excluded; ties broken by neighbor_id asc.
    Output is integer-only so oracle comparison is exact."""
    qset = sorted(int(q) for q in query_ids)

    def grab(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        mask = np.isin(ids, qset)
        return batch.filter(pa.array(mask))

    qtab = embeddings.map_batches(grab, batch_format="pyarrow").to_pandas()
    qtab = qtab.sort_values(id_col)
    Q = _normalize(np.stack(qtab[vec_col].to_numpy()).astype(np.float64))
    qids = qtab[id_col].to_numpy(np.int64)
    ref = ray.put((qids, Q))

    class Score:
        def __init__(self):
            self.qids, self.Q = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            X = _normalize(_to_matrix(batch.column(vec_col)))
            ids = batch.column(id_col).to_numpy(zero_copy_only=False)
            sims = self.Q @ X.T  # (k_q, batch)
            kk = min(k + 1, sims.shape[1])
            out_q, out_n, out_s = [], [], []
            for qi in range(sims.shape[0]):
                row = sims[qi]
                # local top-(k+1) (self might be in-batch). argpartition
                # alone is tie-arbitrary at the cutoff, so order the
                # over-selected slice by the SAME total order as the global
                # top-k -- (sim desc, neighbor_id asc) -- before truncating;
                # results are then batch-layout / parallelism independent.
                part = np.argpartition(-row, kk - 1)[:kk]
                thresh = row[part].min()
                cand = np.flatnonzero(row >= thresh)  # every cutoff tie
                cand = cand[np.lexsort((ids[cand], -row[cand]))][:kk]
                out_q.append(np.full(kk, self.qids[qi]))
                out_n.append(ids[cand])
                out_s.append(row[cand])
            return pa.table(
                {
                    "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                    "neighbor_id": pa.array(np.concatenate(out_n), pa.int64()),
                    "sim": pa.array(np.concatenate(out_s), pa.float64()),
                }
            )

    partials = embeddings.map_batches(
        Score, batch_format="pyarrow", concurrency=concurrency, num_cpus=1
    )

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        qid = int(g["query_id"].iloc[0])
        g = g[g["neighbor_id"] != qid]
        g = g.sort_values(["sim", "neighbor_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        return pd.DataFrame(
            {
                "query_id": np.full(len(g), qid, np.int64),
                "neighbor_id": g["neighbor_id"].to_numpy(np.int64),
                "rnk": np.arange(1, len(g) + 1, dtype=np.int64),
            }
        )

    res = partials.groupby("query_id").map_groups(topk, batch_format="pandas")
    return (
        res.to_pandas()
        .sort_values(["query_id", "rnk"])
        .reset_index(drop=True)
    )


def lsh_knn_cosine(
    embeddings: rd.Dataset,
    query_ids: list[int],
    k: int = 10,
    *,
    n_bits: int = 8,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """Approximate top-k: random-hyperplane LSH buckets + 1-bit multiprobe
    + exact rerank inside candidate buckets -> (query_id, neighbor_id,
    rnk). The scale path: each query touches ~(n_bits+1)/2^n_bits of the
    corpus instead of all of it."""
    sample = embeddings.take(1)[0]
    dim = len(sample[vec_col])
    rng = np.random.Generator(np.random.Philox(key=[seed, 0]))
    R = rng.standard_normal((dim, n_bits))
    ref_R = ray.put(R)

    def bucketize(batch: pa.Table) -> pa.Table:
        Rm = ray.get(ref_R)
        X = _to_matrix(batch.column(vec_col))
        bits = (X @ Rm) > 0
        code = np.zeros(len(X), np.int64)
        for j in range(n_bits):
            code |= bits[:, j].astype(np.int64) << j
        return pa.table(
            {
                id_col: batch.column(id_col),
                vec_col: batch.column(vec_col),
                "bucket": pa.array(code, pa.int64()),
            }
        )

    bucketed = embeddings.map_batches(bucketize, batch_format="pyarrow")
    qset = sorted(int(q) for q in query_ids)

    def grab(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(np.isin(ids, qset)))

    qtab = bucketed.map_batches(grab, batch_format="pyarrow").to_pandas()
    # probe set per query: own bucket + all 1-bit flips
    probes: dict[int, list[tuple[int, np.ndarray]]] = {}
    for _, r in qtab.iterrows():
        b = int(r["bucket"])
        want = [b] + [b ^ (1 << j) for j in range(n_bits)]
        for w in want:
            probes.setdefault(w, []).append(
                (int(r[id_col]), np.asarray(r[vec_col], np.float64))
            )
    ref_probes = ray.put(probes)

    def score_bucket(g: pd.DataFrame) -> pd.DataFrame:
        pr = ray.get(ref_probes)
        b = int(g["bucket"].iloc[0])
        qs = pr.get(b, [])
        if not qs:
            return pd.DataFrame(
                {"query_id": pd.Series([], dtype=np.int64),
                 "neighbor_id": pd.Series([], dtype=np.int64),
                 "sim": pd.Series([], dtype=np.float64)}
            )
        X = _normalize(np.stack(g[vec_col].to_numpy()).astype(np.float64))
        ids = g[id_col].to_numpy(np.int64)
        frames = []
        for qid, qv in qs:
            qv = qv / (np.linalg.norm(qv) or 1.0)
            sims = X @ qv
            frames.append(
                pd.DataFrame({"query_id": qid, "neighbor_id": ids, "sim": sims})
            )
        return pd.concat(frames, ignore_index=True)

    cand = bucketed.groupby("bucket").map_groups(score_bucket, batch_format="pandas")

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        qid = int(g["query_id"].iloc[0])
        g = g[g["neighbor_id"] != qid].drop_duplicates("neighbor_id")
        g = g.sort_values(["sim", "neighbor_id"], ascending=[False, True]).head(k)
        return pd.DataFrame(
            {
                "query_id": np.full(len(g), qid, np.int64),
                "neighbor_id": g["neighbor_id"].to_numpy(np.int64),
                "rnk": np.arange(1, len(g) + 1, dtype=np.int64),
            }
        )

    return (
        cand.groupby("query_id")
        .map_groups(topk, batch_format="pandas")
        .to_pandas()
        .sort_values(["query_id", "rnk"])
        .reset_index(drop=True)
    )


def cosine_dup_pairs(
    embeddings: rd.Dataset,
    threshold: float,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    concurrency=(1, 4),
) -> rd.Dataset:
    """EXACT embedding-cosine near-duplicate pairs: every (a, b) with
    a < b and cosine >= threshold.

    The normalized corpus matrix ships ONCE via ray.put (O(n x d) — a
    1M x 64 f32 corpus is 256 MB, well within a node's object store) and
    each batch matmuls against it, so the O(n^2) similarity compute
    streams over batches with no pair materialization below threshold.
    Beyond broadcast size, use cosine_dup_pairs_lsh (the scale path)."""
    corpus = embeddings.to_pandas().sort_values(id_col)
    ids = corpus[id_col].to_numpy(np.int64)
    M = _normalize(np.stack(corpus[vec_col].to_numpy()).astype(np.float64))
    ref = ray.put((ids, M))

    class Score:
        def __init__(self):
            self.ids, self.M = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pd.DataFrame:
            bids = batch.column(id_col).to_numpy(zero_copy_only=False)
            B = _normalize(_to_matrix(batch.column(vec_col)))
            sims = B @ self.M.T
            # keep a < b only: each unordered pair is emitted exactly once,
            # by the batch that holds its smaller id
            keep = (sims >= threshold) & (bids[:, None] < self.ids[None, :])
            i, j = np.nonzero(keep)
            return pd.DataFrame(
                {"a": bids[i], "b": self.ids[j]}
            )

    return embeddings.map_batches(
        Score, batch_format="pyarrow", concurrency=concurrency, num_cpus=1
    )


def cosine_dup_pairs_lsh(
    embeddings: rd.Dataset,
    threshold: float,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bands: int = 8,
    band_bits: int = 2,
    seed: int = 11,
    concurrency=(1, 4),
) -> rd.Dataset:
    """Banded signed-random-projection LSH near-dup pairs (scale path).

    Each vector gets n_bands x band_bits hyperplane sign bits; a pair is
    a candidate when ANY band's bits match (one groupby per band key,
    all bands in one shuffle via a (band, sig) composite key). Candidates
    dedup on (a, b) and exact-verify by cosine. Recall < 1 by design:
    for same-bit probability p = 1 - theta/pi, recall =
    1 - (1 - p^band_bits)^n_bands (~0.97 at threshold 0.3 with 8x2).
    The verify step broadcasts the normalized corpus like the exact path;
    at corpus sizes beyond broadcast, swap in a partitioned gather."""
    rng = np.random.Generator(np.random.Philox(key=[seed, 0]))
    dim_probe = embeddings.take(1)[0][vec_col]
    planes = rng.standard_normal((n_bands * band_bits, len(dim_probe)))
    pref = ray.put(planes)

    class Sig:
        def __init__(self):
            self.planes = ray.get(pref)

        def __call__(self, batch: pa.Table) -> pd.DataFrame:
            ids = batch.column(id_col).to_numpy(zero_copy_only=False)
            M = _to_matrix(batch.column(vec_col))
            bits = (M @ self.planes.T) >= 0  # (n, bands*bits)
            rows = []
            w = np.power(2, np.arange(band_bits), dtype=np.int64)
            for band in range(n_bands):
                seg = bits[:, band * band_bits : (band + 1) * band_bits]
                sig = seg.astype(np.int64) @ w
                rows.append(
                    pd.DataFrame(
                        {"band": np.int32(band), "sig": sig,
                         "vid": ids.astype(np.int64)}
                    )
                )
            return pd.concat(rows, ignore_index=True)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(g["vid"].to_numpy(np.int64))
        n = len(v)
        if n < 2:
            return pd.DataFrame(
                {"a": pd.Series([], dtype=np.int64),
                 "b": pd.Series([], dtype=np.int64)}
            )
        i, j = np.triu_indices(n, 1)
        return pd.DataFrame({"a": v[i], "b": v[j]})

    def tag_pair(b: pd.DataFrame) -> pd.DataFrame:
        # dedup via hash(a,b)-bucketed drop_duplicates, not a groupby
        # over the unbounded pair key (Ray per-group dispatch)
        from raylinkgraph.functions.hashing import pair_hash, partition_of

        b = b.copy()
        b["__q"] = partition_of(
            pair_hash(b["a"].to_numpy(np.int64), b["b"].to_numpy(np.int64)).astype(
                np.int64
            ),
            32,
        )
        return b

    def dedup(g: pd.DataFrame) -> pd.DataFrame:
        return g[["a", "b"]].drop_duplicates()

    cands = (
        embeddings.map_batches(Sig, batch_format="pyarrow",
                               concurrency=concurrency, num_cpus=1)
        .groupby(["band", "sig"])  # bounded: n_bands * 2^band_bits keys
        .map_groups(bucket_pairs, batch_format="pandas")
        .map_batches(tag_pair, batch_format="pandas")
        .groupby("__q")
        .map_groups(dedup, batch_format="pandas")
    )

    corpus = embeddings.to_pandas().sort_values(id_col)
    ids = corpus[id_col].to_numpy(np.int64)
    M = _normalize(np.stack(corpus[vec_col].to_numpy()).astype(np.float64))
    cref = ray.put((ids, M))

    class Verify:
        def __init__(self):
            self.ids, self.M = ray.get(cref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            if not len(batch):
                return batch[["a", "b"]]
            ia = np.searchsorted(self.ids, batch["a"].to_numpy(np.int64))
            ib = np.searchsorted(self.ids, batch["b"].to_numpy(np.int64))
            sims = np.einsum("ij,ij->i", self.M[ia], self.M[ib])
            return batch[["a", "b"]][sims >= threshold]

    return cands.map_batches(
        Verify, batch_format="pandas", concurrency=concurrency, num_cpus=1
    )


def _spherical_kmeans(
    X: np.ndarray, n_cells: int, n_iter: int = 10, init: str = "spaced"
) -> np.ndarray:
    """Deterministic spherical k-means over NORMALIZED rows: init =
    evenly spaced training rows (no RNG; ``init='farthest'`` uses a
    deterministic farthest-first traversal instead — seeds never land
    twice in one well-separated cluster), assign by max cosine, centroid
    = renormalized mean. Empty cells keep their previous centroid, so
    the result is stable and the cell count never collapses."""
    n = len(X)
    if init == "farthest":
        idx = [0]
        best = X @ X[0]  # max cosine to any chosen seed, per row
        for _ in range(n_cells - 1):
            nxt = int(np.argmin(best))
            idx.append(nxt)
            np.maximum(best, X @ X[nxt], out=best)
        C = X[np.array(idx, dtype=np.int64)].copy()
    else:
        C = X[np.linspace(0, n - 1, n_cells).astype(np.int64)].copy()
    for _ in range(n_iter):
        assign = np.argmax(X @ C.T, axis=1)
        for c in range(n_cells):
            m = assign == c
            if m.any():
                v = X[m].mean(axis=0)
                nv = np.linalg.norm(v)
                if nv > 0:
                    C[c] = v / nv
    return C


def ivf_knn_cosine(
    embeddings: rd.Dataset,
    query_ids: list[int],
    k: int = 10,
    *,
    n_cells: int = 16,
    nprobe: int = 4,
    train_sample: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    concurrency=(1, 4),
) -> pd.DataFrame:
    """IVF-partitioned approximate top-k cosine: a coarse quantizer
    (deterministic spherical k-means, trained on a modulo-sampled
    subset) prunes the corpus to the ``nprobe`` cells nearest each
    query -> (query_id, neighbor_id, rnk).

    The scale shape (vs lsh_knn_cosine's hyperplane buckets): the corpus
    is NEVER shuffled — one actor-pool ``map_batches`` assigns each
    corpus row to its cell from the broadcast centroids and immediately
    scores it against only the queries probing that cell (~nprobe/n_cells
    of the query matrix per row), then a tiny partial-top-k groupby
    finalizes. Centroids + queries ship once via ray.put. Recall < 1 by
    design (a true neighbor in an unprobed cell is missed); measured
    against exact knn_cosine in tests."""
    # --- train: deterministic modulo sample, driver-side small k-means
    n_total = embeddings.count()
    train = _train_sample(embeddings, id_col, n_total, train_sample)
    Xt = _normalize(np.stack(train[vec_col].to_numpy()).astype(np.float64))
    C = _spherical_kmeans(Xt, min(n_cells, len(Xt)))

    # --- queries: pull their rows, pick nprobe nearest cells each
    qset = sorted(int(q) for q in query_ids)

    def grab(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(np.isin(ids, qset)))

    qtab = embeddings.map_batches(grab, batch_format="pyarrow").to_pandas()
    qtab = qtab.sort_values(id_col)
    Q = _normalize(np.stack(qtab[vec_col].to_numpy()).astype(np.float64))
    qids = qtab[id_col].to_numpy(np.int64)
    qcells = np.argsort(-(Q @ C.T), axis=1)[:, : min(nprobe, len(C))]
    # per-cell query slices, built once and broadcast with the centroids
    cell_q: dict[int, np.ndarray] = {}
    for qi in range(len(qids)):
        for c in qcells[qi]:
            cell_q.setdefault(int(c), []).append(qi)
    cell_q = {c: np.asarray(v, np.int64) for c, v in cell_q.items()}
    ref = ray.put((C, qids, Q, cell_q))

    class AssignScore:
        def __init__(self):
            self.C, self.qids, self.Q, self.cell_q = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pd.DataFrame:
            ids = batch.column(id_col).to_numpy(zero_copy_only=False)
            X = _normalize(_to_matrix(batch.column(vec_col)))
            cells = np.argmax(X @ self.C.T, axis=1)
            frames = []
            for c in np.unique(cells):
                qs = self.cell_q.get(int(c))
                if qs is None:
                    continue
                m = cells == c
                sims = self.Q[qs] @ X[m].T  # (probing queries, cell rows)
                nloc = int(m.sum())
                kk = min(k + 1, nloc)
                sub_ids = ids[m]
                for row, qi in enumerate(qs):
                    srow = sims[row]
                    part = np.argpartition(-srow, kk - 1)[:kk]
                    thresh = srow[part].min()
                    cand = np.flatnonzero(srow >= thresh)
                    cand = cand[np.lexsort((sub_ids[cand], -srow[cand]))][:kk]
                    frames.append(
                        pd.DataFrame(
                            {
                                "query_id": np.full(len(cand), self.qids[qi]),
                                "neighbor_id": sub_ids[cand],
                                "sim": srow[cand],
                            }
                        )
                    )
            if not frames:
                return pd.DataFrame(
                    {"query_id": pd.Series([], dtype=np.int64),
                     "neighbor_id": pd.Series([], dtype=np.int64),
                     "sim": pd.Series([], dtype=np.float64)}
                )
            return pd.concat(frames, ignore_index=True)

    partials = embeddings.map_batches(
        AssignScore, batch_format="pyarrow", concurrency=concurrency, num_cpus=1
    )

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        qid = int(g["query_id"].iloc[0])
        g = g[g["neighbor_id"] != qid].drop_duplicates("neighbor_id")
        g = g.sort_values(["sim", "neighbor_id"], ascending=[False, True]).head(k)
        return pd.DataFrame(
            {
                "query_id": np.full(len(g), qid, np.int64),
                "neighbor_id": g["neighbor_id"].to_numpy(np.int64),
                "rnk": np.arange(1, len(g) + 1, dtype=np.int64),
            }
        )

    return (
        partials.groupby("query_id")
        .map_groups(topk, batch_format="pandas")
        .to_pandas()
        .sort_values(["query_id", "rnk"])
        .reset_index(drop=True)
    )


def semantic_dedup(
    embeddings: rd.Dataset,
    threshold: float,
    *,
    n_cells: int = 16,
    train_sample: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    concurrency=(1, 4),
) -> rd.Dataset:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication by clustering then in-cluster pruning -> one row per
    input, (vec_id, cell, keep, dup_of).

    Rule (deterministic, no transitive closure needed): a vector is
    DROPPED iff some SMALLER-id vector in the SAME cell has cosine >=
    threshold with it; dup_of = the smallest such id (-1 when kept).
    With n_cells=1 this degenerates to exact greedy dedup over the
    whole corpus (pinned by the test); with real cell counts it is the
    paper's approximation — cross-cell near-dups are intentionally not
    compared.

    Scale shape: centroids are trained driver-side on a modulo sample
    and broadcast; ONE actor-pool pass assigns cells (corpus never
    pairwise-materialized); the in-cell O(m^2) matmul is the paper's
    design point — n_cells is chosen so a cell fits a worker (cells
    are the unit of parallelism, key count is bounded, so a plain
    groupby is safe)."""
    n_total = embeddings.count()
    train = _train_sample(embeddings, id_col, n_total, train_sample)
    Xt = _normalize(np.stack(train[vec_col].to_numpy()).astype(np.float64))
    C = _spherical_kmeans(Xt, min(n_cells, len(Xt)))
    cref = ray.put(C)

    class Assign:
        def __init__(self):
            self.C = ray.get(cref)

        def __call__(self, batch: pa.Table) -> pd.DataFrame:
            ids = batch.column(id_col).to_numpy(zero_copy_only=False)
            X = _normalize(_to_matrix(batch.column(vec_col)))
            cell = np.argmax(X @ self.C.T, axis=1).astype(np.int32)
            return pd.DataFrame(
                {id_col: ids.astype(np.int64), "cell": cell,
                 "vec": list(X.astype(np.float64))}
            )

    def prune(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col).reset_index(drop=True)
        ids = g[id_col].to_numpy(np.int64)
        X = np.stack(g["vec"].to_numpy())
        sims = X @ X.T
        # strictly-lower-triangular hits: j < i with sims >= threshold
        hit = (sims >= threshold) & np.tri(len(g), k=-1, dtype=bool)
        any_hit = hit.any(axis=1)
        first = np.where(any_hit, hit.argmax(axis=1), -1)
        dup_of = np.where(any_hit, ids[first], np.int64(-1))
        return pd.DataFrame(
            {id_col: ids, "cell": g["cell"].to_numpy(np.int32),
             "keep": (~any_hit).astype(np.int64), "dup_of": dup_of}
        )

    return (
        embeddings.map_batches(
            Assign, batch_format="pyarrow", concurrency=concurrency,
            num_cpus=1,
        )
        .groupby("cell")
        .map_groups(prune, batch_format="pandas")
    )


def gram_moments_e6(
    embeddings: rd.Dataset,
    *,
    vec_col: str = "embedding",
    buckets: int = 32,
) -> rd.Dataset:
    """EXACT integer Gram (second-moment) matrix of the e6-quantized
    embedding column: (i, j, gram) upper triangle, gram = sum over rows
    of q_i * q_j with q = floor(v * 1e6 + 0.5) as int64.

    This is the hash-exact pin of pca_project's distributed pass-1 shape
    (per-batch X^T X partials -> fixed-width fold): quantizing BEFORE the
    sum makes the aggregate an order-free integer sum, reproducible
    verbatim in SQL — the same trick the money aggregates use. Each batch
    contributes a d x d int64 partial regardless of row count; the fold
    exchange is O(d^2), never O(rows). Exactness envelope: values must
    satisfy max|q|^2 * n_rows < 2^63 (|v| <= 8 holds to ~10M rows; the
    per-batch guard rejects |v| > 67 outright).
    """

    def partial(b: pa.Table) -> pd.DataFrame:
        m = _to_matrix(b.column(vec_col))
        q = np.floor(m * 1e6 + 0.5).astype(np.int64)
        if len(q) and np.abs(q).max() > (1 << 26):
            raise ValueError("embedding values too large for exact int64 Gram")
        g = q.T @ q
        d = g.shape[0]
        iu, ju = np.triu_indices(d)
        k = (iu * d + ju).astype(np.int64)
        return pd.DataFrame(
            {
                "k": k,
                "i": iu.astype(np.int64),
                "j": ju.astype(np.int64),
                "g": g[iu, ju],
                "b": (k % buckets).astype(np.int32),
            }
        )

    def fold(grp: pd.DataFrame) -> pd.DataFrame:
        out = grp.groupby("k", sort=True).agg(
            i=("i", "first"), j=("j", "first"), gram=("g", "sum")
        ).reset_index(drop=True)
        out["gram"] = out["gram"].astype(np.int64)
        return out[["i", "j", "gram"]]

    return (
        embeddings.select_columns([vec_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("b")
        .map_groups(fold, batch_format="pandas")
    )


def pca_project(
    embeddings: rd.Dataset,
    *,
    n_components: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[rd.Dataset, np.ndarray, np.ndarray]:
    """Distributed PCA over an embedding column: two streaming passes.

    Pass 1 accumulates the (d, d) second-moment matrix and the mean as
    per-batch partials (each batch contributes X^T X, Σx, n — a few KB
    per batch regardless of row count); the covariance eigendecomposition
    happens on the driver at O(d^3), d = embedding width (tiny). Pass 2
    projects every row onto the top components via one matmul per batch
    with the broadcast (d, k) basis — the standard scalable-PCA shape
    (no row ever leaves its block, nothing corpus-sized on the driver).

    Deterministic sign convention: each component is flipped so its
    largest-|coefficient| entry is positive (eigh is sign-ambiguous).
    -> (projected Dataset (id_col, pc0..pc{k-1}), components (k, d),
    explained_variance (k,)).
    """
    import ray

    def moments(batch: pa.Table) -> pd.DataFrame:
        m = _to_matrix(batch.column(vec_col))
        return pd.DataFrame(
            {
                "n": [float(len(m))],
                "sx": [m.sum(axis=0).tobytes()],
                "xtx": [(m.T @ m).tobytes()],
            }
        )

    parts = embeddings.map_batches(moments, batch_format="pyarrow").to_pandas()
    d = int(np.sqrt(len(np.frombuffer(parts["xtx"].iloc[0]))))
    n = float(parts["n"].sum())
    sx = np.sum([np.frombuffer(b) for b in parts["sx"]], axis=0)
    xtx = np.sum(
        [np.frombuffer(b).reshape(d, d) for b in parts["xtx"]], axis=0
    )
    mean = sx / n
    cov = xtx / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:n_components]
    comps = evecs[:, order].T  # (k, d)
    flip = np.sign(comps[np.arange(len(comps)),
                         np.abs(comps).argmax(axis=1)])
    flip[flip == 0] = 1.0
    comps = comps * flip[:, None]
    ev = evals[order]
    ref = ray.put((mean, comps))

    def project(batch: pa.Table) -> pd.DataFrame:
        mu, c = ray.get(ref)
        m = _to_matrix(batch.column(vec_col))
        proj = (m - mu) @ c.T
        out = {id_col: batch.column(id_col).to_numpy(zero_copy_only=False)}
        for i in range(proj.shape[1]):
            out[f"pc{i}"] = proj[:, i]
        return pd.DataFrame(out)

    return (
        embeddings.map_batches(project, batch_format="pyarrow"),
        comps,
        ev,
    )


def kmeans_assign(
    embeddings: rd.Dataset,
    n_clusters: int = 8,
    *,
    n_iter: int = 10,
    train_sample: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    concurrency=(1, 4),
) -> rd.Dataset:
    """Spherical k-means clustering as a first-class surface ->
    (vec_id, cell, sim_e6): the coarse quantizer behind ivf_knn_cosine /
    semantic_dedup exposed directly (the embedding-curation "cluster the
    corpus" step of SemDeDup / DSIR-style pipelines).

    Scale shape: centroids train driver-side on a deterministic modulo
    sample (k x d doubles), ship ONCE via ray.put, and one actor-pool
    map_batches assigns every row by max cosine — the corpus is never
    shuffled and nothing proportional to it reaches the driver. Fully
    deterministic (evenly-spaced init, no RNG); sim quantized e6."""
    n_total = embeddings.count()
    train = _train_sample(embeddings, id_col, n_total, train_sample)
    Xt = _normalize(np.stack(train[vec_col].to_numpy()).astype(np.float64))
    C = _spherical_kmeans(
        Xt, min(n_clusters, len(Xt)), n_iter=n_iter, init="farthest"
    )
    cref = ray.put(C)

    class Assign:
        def __init__(self):
            self.C = ray.get(cref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            X = _normalize(_to_matrix(batch.column(vec_col)))
            sims = X @ self.C.T
            cell = np.argmax(sims, axis=1)
            best = sims[np.arange(len(X)), cell]
            return pa.table(
                {
                    id_col: batch.column(id_col),
                    "cell": pa.array(cell.astype(np.int64)),
                    "sim_e6": pa.array(
                        np.floor(best * 1e6 + 0.5).astype(np.int64)
                    ),
                }
            )

    return embeddings.map_batches(
        Assign, batch_format="pyarrow", concurrency=concurrency, num_cpus=1
    )


def ivf_index_build(
    embeddings: rd.Dataset,
    out_dir: str,
    *,
    n_cells: int = 16,
    train_sample: int = 4096,
    n_iter: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    concurrency=(1, 4),
) -> "pd.DataFrame":
    """Persist an IVF index: build once, query many (the FAISS-style
    IVF-flat layout as a Dataset job). Centroids (spherical k-means,
    farthest-first init) go to ``centroids.parquet``; the corpus is
    assigned cell ids in one actor-pool pass and lands in
    ``postings/part=<cell>/`` via the resumable sink — a killed build
    rerun skips committed cells, and a query later READS ONLY its
    probed cells' directories (IO pruning, not just compute pruning).
    Returns the build manifest (part, n_rows, skipped)."""
    import os

    import pyarrow.parquet as _pq

    from raylinkgraph.sources.resumable import resumable_write

    n_total = embeddings.count()
    train = _train_sample(embeddings, id_col, n_total, train_sample)
    Xt = _normalize(np.stack(train[vec_col].to_numpy()).astype(np.float64))
    C = _spherical_kmeans(Xt, min(n_cells, len(Xt)), n_iter=n_iter, init="farthest")
    os.makedirs(out_dir, exist_ok=True)
    _pq.write_table(
        pa.table({"cell": pa.array(np.arange(len(C), dtype=np.int64)),
                  "centroid": pa.array(list(C.astype(np.float64)),
                                       pa.list_(pa.float64()))}),
        os.path.join(out_dir, "centroids.parquet"),
    )
    cref = ray.put(C)

    class Assign:
        def __init__(self):
            self.C = ray.get(cref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            X = _normalize(_to_matrix(batch.column(vec_col)))
            cell = np.argmax(X @ self.C.T, axis=1).astype(np.int64)
            return pa.table(
                {
                    id_col: batch.column(id_col),
                    vec_col: batch.column(vec_col),
                    "cell": pa.array(cell),
                }
            )

    assigned = embeddings.map_batches(
        Assign, batch_format="pyarrow", concurrency=concurrency, num_cpus=1
    )
    # partition DIRECTLY on the cell id (bucket count = cell count) so a
    # query's nprobe cells map 1:1 onto directories
    return resumable_write(
        assigned, os.path.join(out_dir, "postings"), "cell", buckets=len(C)
    )


def ivf_index_query(
    index_dir: str,
    queries: "pd.DataFrame",
    k: int = 10,
    *,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> "pd.DataFrame":
    """Query a persisted IVF index -> (query_id, neighbor_id, rnk):
    load the tiny centroid table, pick each query's nprobe cells, and
    ``read_parquet`` ONLY those cells' posting directories — at corpus
    scale the scan is nprobe/n_cells of the data, pruned at the
    filesystem level. Scoring streams over the pruned Dataset with the
    query matrix broadcast once; a bounded partial-top-k folds on the
    driver (k rows per query per block)."""
    import os

    import pyarrow.parquet as _pq

    from raylinkgraph.functions.hashing import splitmix64  # noqa: F401 (layout doc)

    cent = _pq.read_table(os.path.join(index_dir, "centroids.parquet")).to_pandas()
    C = np.stack(cent.sort_values("cell")["centroid"].to_numpy())
    Q = _normalize(np.stack(queries[vec_col].to_numpy()).astype(np.float64))
    qids = queries[id_col].to_numpy(np.int64)
    qcells = np.argsort(-(Q @ C.T), axis=1)[:, : min(nprobe, len(C))]
    # cell -> hash bucket of the resumable layout: buckets == n_cells and
    # the key IS the cell id, so the mapping is partition_of(cell, n)
    from raylinkgraph.functions.hashing import partition_of

    cells = np.unique(qcells.ravel())
    parts = np.unique(partition_of(cells, len(C)))
    paths = [
        os.path.join(index_dir, "postings", f"part={p}", "data.parquet")
        for p in parts
        if os.path.exists(
            os.path.join(index_dir, "postings", f"part={p}", "_SUCCESS")
        )
    ]
    if not paths:
        raise FileNotFoundError(f"no committed postings under {index_dir}")
    probe_set = set(int(c) for c in cells)
    cell_q: dict[int, list[int]] = {}
    for qi in range(len(qids)):
        for c in qcells[qi]:
            cell_q.setdefault(int(c), []).append(qi)
    cell_q = {c: np.asarray(v, np.int64) for c, v in cell_q.items()}
    ref = ray.put((qids, Q, cell_q, probe_set))

    class Score:
        def __init__(self):
            self.qids, self.Q, self.cell_q, self.probe = ray.get(ref)

        def __call__(self, batch: pa.Table) -> "pd.DataFrame":
            cells_b = batch.column("cell").to_numpy(zero_copy_only=False)
            keep = np.isin(cells_b, np.fromiter(self.probe, np.int64))
            if not keep.any():
                return pd.DataFrame(
                    {"query_id": pd.Series([], dtype=np.int64),
                     "neighbor_id": pd.Series([], dtype=np.int64),
                     "sim_e6": pd.Series([], dtype=np.int64)}
                )
            sub = batch.filter(pa.array(keep))
            ids = sub.column(id_col).to_numpy(zero_copy_only=False)
            cells_s = sub.column("cell").to_numpy(zero_copy_only=False)
            X = _normalize(_to_matrix(sub.column(vec_col)))
            frames = []
            for c in np.unique(cells_s):
                qs = self.cell_q.get(int(c))
                if qs is None:
                    continue
                m = cells_s == c
                sims = X[m] @ self.Q[qs].T  # (rows_in_cell, probing_qs)
                rows, qcols = np.nonzero(np.ones_like(sims, dtype=bool))
                frames.append(
                    pd.DataFrame(
                        {
                            "query_id": self.qids[qs[qcols]],
                            "neighbor_id": ids[m][rows],
                            "sim_e6": np.floor(
                                sims[rows, qcols] * 1e6 + 0.5
                            ).astype(np.int64),
                        }
                    )
                )
            out = pd.concat(frames, ignore_index=True)
            # bounded partial top-k per query inside the block
            out = out.sort_values(
                ["query_id", "sim_e6", "neighbor_id"],
                ascending=[True, False, True],
            )
            return out.groupby("query_id", sort=False).head(k)

    scored = rd.read_parquet(paths, partitioning=None).map_batches(
        Score, batch_format="pyarrow", concurrency=(1, 4), num_cpus=1
    ).to_pandas()
    scored = scored.sort_values(
        ["query_id", "sim_e6", "neighbor_id"], ascending=[True, False, True]
    )
    top = scored.groupby("query_id", sort=True).head(k).copy()
    top["rnk"] = top.groupby("query_id").cumcount() + 1
    return top[["query_id", "neighbor_id", "rnk", "sim_e6"]].reset_index(drop=True)
