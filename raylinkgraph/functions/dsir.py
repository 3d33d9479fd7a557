"""DSIR-style importance weights for data selection.

Data Selection with Importance Resampling (Xie et al. 2023,
arXiv:2302.03169): score every raw document by how much its word
distribution looks like a TARGET slice, importance weight

  log w(d) = sum over tokens t of  ln( p_target(t) / p_raw(t) )

with add-one-smoothed unigram models fit on the corpus itself. Docs are
then kept by top-weight (or Gumbel-resampled) downstream. Here the
target slice is a column predicate (e.g. lang == 'en').

Engine shape (3 bucketed exchanges, nothing O(vocab) on the driver):
  1. per-batch token counts -> hash(word)-bucketed vocab fold giving
     (word, n_target, n_raw); word strings travel with rows.
  2. scalar totals (N_t, N_r, V) fold down to the driver (per-bucket
     partials only), then a map over the vocab table computes each
     word's integer log-ratio lambda_e6 = floor(ln(ratio)*1e6 + 0.5).
  3. (doc, word, count) partials join lambda in the same word-hash
     buckets; per-doc integer sums re-bucket by hash(doc).

Parity discipline: lambda is quantized to int e6 PER WORD, so each doc
score is an integer sum — immune to float addition order (same device
as bm25/ranking.py; the ln() last-ulp risk is the documented one).
With ``hash_features=K`` words collapse to K hashed buckets first (the
paper's hashed n-gram variant, the right shape at open-vocab scale);
the SQL oracle covers the exact-word variant.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd


def dsir_weights(
    docs: rd.Dataset,
    *,
    target_col: str = "lang",
    target_val: str = "en",
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 32,
    batch_size: int = 2048,
    hash_features: int | None = None,
) -> rd.Dataset:
    """-> (doc_id, importance_e6): integer summed log-ratio per doc."""

    from raylinkgraph.functions.hashing import any_key_partition, partition_of

    def featurize(words: pd.Series) -> pd.Series:
        if hash_features is None:
            return words
        from raylinkgraph.functions.hashing import crc32_str

        return pd.Series(
            (crc32_str(words.to_numpy()) % np.uint32(hash_features)).astype(np.int64),
            index=words.index,
        )

    def tok_counts(b: pd.DataFrame) -> pd.DataFrame:
        # (word, doc_id, cnt, is_target) rows, batch-locally combined
        rows = b[[id_col, target_col]].copy()
        rows["w"] = b[text_col].str.split(" ", regex=False)
        e = rows.explode("w")
        e["w"] = featurize(e["w"])
        e["cnt"] = 1
        e["tgt"] = (e[target_col] == target_val).astype(np.int64)
        out = (
            e.groupby([id_col, "w", "tgt"], sort=False)["cnt"].sum().reset_index()
        )
        out["__p"] = any_key_partition(out["w"].to_numpy(), buckets)
        return out[[id_col, "w", "tgt", "cnt", "__p"]]

    counted = docs.map_batches(
        tok_counts, batch_format="pandas", batch_size=batch_size
    ).materialize()  # consumed twice: vocab fold + lambda join

    def vocab_fold(g: pd.DataFrame) -> pd.DataFrame:
        n_r = g.groupby("w", sort=False)["cnt"].sum()
        n_t = (
            g.loc[g["tgt"] == 1]
            .groupby("w", sort=False)["cnt"]
            .sum()
            .reindex(n_r.index, fill_value=0)
        )
        agg = pd.DataFrame({"w": n_r.index, "n_r": n_r.to_numpy(np.int64),
                            "n_t": n_t.to_numpy(np.int64)})
        agg["__p"] = g["__p"].iloc[0]
        return agg

    vocab = counted.groupby("__p").map_groups(
        vocab_fold, batch_format="pandas"
    ).materialize()  # consumed twice: totals + lambda

    # scalar totals from per-bucket partials (one tiny row per block)
    tot = vocab.map_batches(
        lambda b: pd.DataFrame(
            {"nr": [int(b["n_r"].sum())], "nt": [int(b["n_t"].sum())], "v": [len(b)]}
        ),
        batch_format="pandas",
    ).to_pandas()
    N_r, N_t, V = int(tot["nr"].sum()), int(tot["nt"].sum()), int(tot["v"].sum())
    denom_t = float(N_t + V)
    denom_r = float(N_r + V)

    def lam(b: pd.DataFrame) -> pd.DataFrame:
        n_t = b["n_t"].to_numpy(np.float64)
        n_r = b["n_r"].to_numpy(np.float64)
        ratio = ((n_t + 1.0) / denom_t) / ((n_r + 1.0) / denom_r)
        return pd.DataFrame(
            {
                "w": b["w"],
                "lam": np.floor(np.log(ratio) * 1e6 + 0.5).astype(np.int64),
                "__p": b["__p"].to_numpy(np.int32),
            }
        )

    lam_ds = vocab.map_batches(lam, batch_format="pandas")

    # join token counts with lambda inside the shared word-hash buckets
    def tag_cnt(b: pd.DataFrame) -> pd.DataFrame:
        b = b[[id_col, "w", "cnt", "__p"]].copy()
        b["lam"] = np.int64(0)
        b["side"] = np.int8(0)
        return b

    def tag_lam(b: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                id_col: np.zeros(len(b), np.int64),
                "w": b["w"],
                "cnt": np.zeros(len(b), np.int64),
                "__p": b["__p"].to_numpy(np.int32),
                "lam": b["lam"].to_numpy(np.int64),
                "side": np.ones(len(b), np.int8),
            }
        )
        return out

    def join_fold(g: pd.DataFrame) -> pd.DataFrame:
        lam_map = g.loc[g["side"] == 1].set_index("w")["lam"]
        c = g.loc[g["side"] == 0]
        contrib = c["cnt"].to_numpy(np.int64) * lam_map.reindex(
            c["w"]
        ).to_numpy(np.int64)
        part = pd.DataFrame({id_col: c[id_col].to_numpy(np.int64), "s": contrib})
        out = part.groupby(id_col, sort=False)["s"].sum().reset_index()
        out["__d"] = partition_of(out[id_col].to_numpy(np.int64), buckets)
        return out

    joined = (
        counted.map_batches(tag_cnt, batch_format="pandas")
        .union(lam_ds.map_batches(tag_lam, batch_format="pandas"))
        .groupby("__p")
        .map_groups(join_fold, batch_format="pandas")
    )

    def doc_fold(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(id_col, sort=True)["s"].sum().reset_index()
        return pd.DataFrame(
            {
                id_col: out[id_col].to_numpy(np.int64),
                "importance_e6": out["s"].to_numpy(np.int64),
            }
        )

    return joined.groupby("__d").map_groups(doc_fold, batch_format="pandas")
