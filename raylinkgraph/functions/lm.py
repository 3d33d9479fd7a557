"""CCNet-style n-gram language-model scoring for corpus filtering.

CCNet (Wenzek et al. 2020, arXiv:1911.00359) filters Common-Crawl text
by the perplexity of a target-domain LM (they use a KenLM 5-gram
trained on Wikipedia). Same device here with a self-contained add-one
smoothed BIGRAM model fit on a target slice of the corpus itself
(e.g. ``lang == 'en'``), scoring EVERY document:

  log p(d) = sum over adjacent word pairs (v, u) of
             ln( (c(v,u) + 1) / (c(v) + V) )

where c(v,u) / c(v) are bigram / context counts over the training
slice and V is the training slice's distinct-unigram count. Output is
(doc_id, n_bigrams, logprob_e6); downstream keeps low-perplexity docs
(logprob_e6 / n_bigrams closest to 0).

Engine shape (the dsir.py device, two bucketed exchanges + one scalar
fold; the model is never broadcast and never touches the driver):
  1. training-slice bigram partials fold to (v, u, c_vw) and context
     partials to (v, c_v) inside hash(v) buckets; V folds from
     per-bucket distinct-unigram partials (hash(w) buckets), so only
     one tiny integer row per bucket reaches the driver.
  2. per-doc bigram partials (doc_id, v, u, cnt) re-use the SAME
     hash(v) buckets, joining both count maps colocated there; each
     distinct (v, u) gets the integer lambda_e6 = floor(ln(p)*1e6+0.5)
     and doc scores are pure integer sums — immune to float addition
     order (ln last-ulp parity is the documented residual risk, as in
     dsir.py / top_terms).
  3. per-doc integer sums re-bucket by hash(doc_id).

Tokenization is a plain single-space split (empty tokens preserved),
byte-identical to DuckDB's string_split for oracle parity.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd


def bigram_lm_logprob(
    docs: rd.Dataset,
    *,
    target_col: str = "lang",
    target_val: str = "en",
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 32,
    batch_size: int = 2048,
) -> rd.Dataset:
    """-> (doc_id, n_bigrams, logprob_e6): add-one bigram-LM score of
    every doc under the model fit on the ``target_col == target_val``
    slice. Raises if the training slice is empty."""

    from raylinkgraph.functions.hashing import any_key_partition, partition_of

    def bigram_partials(b: pd.DataFrame) -> pd.DataFrame:
        # one row per (doc, v, u) with count + target flag, bucketed by
        # hash(v) so model fold and scoring join share partitioning.
        # Vectorized: explode keeps a doc's tokens contiguous, so the
        # shifted-pair mask (same doc id at i and i+1) yields exactly
        # its adjacent bigrams with no per-row loop.
        rows = b[[id_col, target_col]].copy()
        rows["w"] = b[text_col].str.split(" ", regex=False)
        e = rows.explode("w")
        did = e[id_col].to_numpy(np.int64)
        tgt = (e[target_col] == target_val).to_numpy()
        w = e["w"].to_numpy(dtype=object)
        if len(w) < 2:
            m = np.zeros(0, dtype=bool)
        else:
            m = did[:-1] == did[1:]
        ebig = pd.DataFrame(
            {
                id_col: did[:-1][m] if len(w) >= 2 else np.empty(0, np.int64),
                "v": w[:-1][m] if len(w) >= 2 else np.empty(0, object),
                "u": w[1:][m] if len(w) >= 2 else np.empty(0, object),
                "tgt": (tgt[:-1][m] if len(w) >= 2 else np.empty(0, bool)).astype(
                    np.int8
                ),
            }
        )
        if not len(ebig):
            return pd.DataFrame(
                {
                    id_col: pd.Series([], dtype=np.int64),
                    "v": pd.Series([], dtype=object),
                    "u": pd.Series([], dtype=object),
                    "tgt": pd.Series([], dtype=np.int8),
                    "cnt": pd.Series([], dtype=np.int64),
                    "__p": pd.Series([], dtype=np.int32),
                }
            )
        out = (
            ebig.groupby([id_col, "v", "u", "tgt"], sort=False)
            .size()
            .rename("cnt")
            .reset_index()
        )
        out["cnt"] = out["cnt"].astype(np.int64)
        out["__p"] = any_key_partition(out["v"].to_numpy(), buckets)
        return out

    partials = docs.map_batches(
        bigram_partials, batch_format="pandas", batch_size=batch_size
    ).materialize()  # consumed twice: model fold + scoring join

    # V = distinct unigrams of the TRAINING slice: per-batch distinct
    # partials -> hash(w) bucket dedup -> one integer per bucket
    def uni_partials(b: pd.DataFrame) -> pd.DataFrame:
        m = b[b[target_col] == target_val]
        toks = m[text_col].str.split(" ", regex=False).explode().dropna()
        u = toks.unique()
        return pd.DataFrame(
            {"w": u, "__p": any_key_partition(np.asarray(u, dtype=object), buckets)}
        )

    def uni_fold(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"nv": [int(g["w"].nunique())]})

    vtab = (
        docs.map_batches(uni_partials, batch_format="pandas", batch_size=batch_size)
        .groupby("__p")
        .map_groups(uni_fold, batch_format="pandas")
        .to_pandas()
    )
    V = int(vtab["nv"].sum()) if len(vtab) else 0
    if V == 0:
        raise ValueError(
            f"bigram_lm_logprob: empty training slice {target_col}=={target_val!r}"
        )

    def score_fold(g: pd.DataFrame) -> pd.DataFrame:
        # inside one hash(v) bucket: model counts from tgt rows, then
        # integer lambda per distinct (v, u) seen in ANY doc here
        t = g[g["tgt"] == 1]
        c_vw = t.groupby(["v", "u"], sort=False)["cnt"].sum()
        c_v = t.groupby("v", sort=False)["cnt"].sum()
        keys = g[["v", "u"]].drop_duplicates()
        kvw = c_vw.reindex(
            pd.MultiIndex.from_frame(keys), fill_value=0
        ).to_numpy(np.float64)
        kv = c_v.reindex(keys["v"], fill_value=0).to_numpy(np.float64)
        lam = np.floor(
            np.log((kvw + 1.0) / (kv + float(V))) * 1e6 + 0.5
        ).astype(np.int64)
        lam_map = pd.Series(lam, index=pd.MultiIndex.from_frame(keys))
        idx = pd.MultiIndex.from_arrays([g["v"], g["u"]])
        contrib = g["cnt"].to_numpy(np.int64) * lam_map.reindex(idx).to_numpy(
            np.int64
        )
        part = pd.DataFrame(
            {
                id_col: g[id_col].to_numpy(np.int64),
                "s": contrib,
                "n": g["cnt"].to_numpy(np.int64),
            }
        )
        out = part.groupby(id_col, sort=False)[["s", "n"]].sum().reset_index()
        out["__d"] = partition_of(out[id_col].to_numpy(np.int64), buckets)
        return out

    def doc_fold(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(id_col, sort=True)[["s", "n"]].sum().reset_index()
        return pd.DataFrame(
            {
                id_col: out[id_col].to_numpy(np.int64),
                "n_bigrams": out["n"].to_numpy(np.int64),
                "logprob_e6": out["s"].to_numpy(np.int64),
            }
        )

    return (
        partials.groupby("__p")
        .map_groups(score_fold, batch_format="pandas")
        .groupby("__d")
        .map_groups(doc_fold, batch_format="pandas")
    )
