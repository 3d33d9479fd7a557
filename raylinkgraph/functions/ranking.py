"""BM25 ranked retrieval over the document corpus.

Okapi BM25 (Robertson/Sparck Jones; the Lucene +1 idf variant so idf is
always positive): for a small probe-term query set,

  score(d) = sum_t idf(t) * tf * (k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
  idf(t)   = ln((N - df + 0.5) / (df + 0.5) + 1)

Scale shape: the query side is a handful of constants (closure-captured,
never shuffled); pass A folds (N, sum dl, per-term df) down to a few
scalars via per-batch partials; pass B scores each batch independently
(tf per probe term via compiled whitespace-boundary regex counts — no
explode of the corpus vocabulary) and keeps a local top-k, and one final
tiny fold merges the per-batch top-k lists. Nothing O(corpus) moves.

Parity discipline: each per-term contribution is quantized to int e6
BEFORE summing, so the doc score is an integer sum — immune to float
addition order across engines (the remaining ln() last-ulp risk is the
same documented one top_terms carries). Words = text split on a single
space (SQL string_split parity); dl = word count.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import ray.data as rd


def bm25_topk(
    docs: rd.Dataset,
    terms: list[str],
    *,
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    batch_size: int = 2048,
) -> pd.DataFrame:
    """-> (rank, doc_id, score_e6): top-k docs by BM25, ties by doc_id."""
    terms = list(terms)
    pats = [re.compile(rf"(?<![^ ]){re.escape(t)}(?![^ ])") for t in terms]

    def stats(batch: pd.DataFrame) -> pd.DataFrame:
        txt = batch[text_col]
        dl = (txt.str.count(" ") + 1).to_numpy(np.int64)
        row = {"n": [len(batch)], "sum_dl": [int(dl.sum())]}
        for i, p in enumerate(pats):
            row[f"df{i}"] = [int((txt.str.count(p) > 0).sum())]
        return pd.DataFrame(row)

    st = docs.map_batches(stats, batch_format="pandas", batch_size=batch_size).to_pandas()
    N = int(st["n"].sum())
    if N == 0:
        return pd.DataFrame({"rank": pd.Series([], dtype=np.int64),
                             id_col: pd.Series([], dtype=np.int64),
                             "score_e6": pd.Series([], dtype=np.int64)})
    avgdl = st["sum_dl"].sum() / N  # int sum, one division: exact parity
    df = np.array([int(st[f"df{i}"].sum()) for i in range(len(terms))], np.float64)
    idf = np.log((N - df + 0.5) / (df + 0.5) + 1.0)

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        txt = batch[text_col]
        dl = (txt.str.count(" ") + 1).to_numpy(np.float64)
        norm = k1 * (1.0 - b + b * dl / avgdl)
        total = np.zeros(len(batch), np.int64)
        for i, p in enumerate(pats):
            tf = txt.str.count(p).to_numpy(np.float64)
            contrib = idf[i] * tf * (k1 + 1.0) / (tf + norm)
            contrib[tf == 0] = 0.0
            total += np.floor(contrib * 1e6 + 0.5).astype(np.int64)
        hit = total > 0
        out = pd.DataFrame(
            {id_col: batch[id_col].to_numpy(np.int64)[hit], "score_e6": total[hit]}
        )
        return out.sort_values(
            ["score_e6", id_col], ascending=[False, True]
        ).head(k)

    cand = docs.map_batches(
        score, batch_format="pandas", batch_size=batch_size
    ).to_pandas()
    if "score_e6" not in cand.columns:  # no batch produced a hit
        cand = pd.DataFrame({id_col: pd.Series([], dtype=np.int64),
                             "score_e6": pd.Series([], dtype=np.int64)})
    cand = cand.sort_values(
        ["score_e6", id_col], ascending=[False, True]
    ).head(k).reset_index(drop=True)
    cand.insert(0, "rank", np.arange(1, len(cand) + 1, dtype=np.int64))
    return cand
