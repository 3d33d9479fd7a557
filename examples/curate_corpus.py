"""End-to-end corpus curation on Ray Data — the composed LLM-data
pipeline this engine is built for, as a runnable example:

  1. exact dedup (keep the min doc_id per distinct text)
  2. MinHash-shingle near-dup clusters -> keep cluster minimum
  3. Gopher repetition gates (dup-word / top-word mass)
  4. bigram-LM quality score (CCNet-style, fit on the lang='en' slice)
  5. final keep list + partitioned Parquet of surviving documents

Every stage is an already-oracle-verified operator from
raylinkgraph.functions; this script only composes them. Run:

    python examples/curate_corpus.py [sf_dir] [out_dir]

defaults: /root/testdata/sf0.001 -> /tmp/raylinkgraph_curated
"""

import os
import sys

# runnable from anywhere: python puts the script's dir (examples/), not
# the repo root, on sys.path
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd

import ray
import ray.data as rd


def main(sf_dir: str, out_dir: str) -> None:
    from raylinkgraph.functions.dedup import dup_clusters, exact_dedup
    from raylinkgraph.functions.lm import bigram_lm_logprob
    from raylinkgraph.functions.textops import word_repetition_stats

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"))
    all_ids = docs.select_columns(["doc_id"]).to_pandas()["doc_id"]

    # -- 1. exact dedup: keeper ids (min doc_id per distinct text) ---------
    exact_keep = set(exact_dedup(docs).to_pandas()["doc_id"])

    # -- 2. near-dup clusters: keep each cluster's min doc_id --------------
    clusters = dup_clusters(docs, os.path.join(out_dir, "wcc-work")).to_pandas()
    near_keep = set(clusters.loc[clusters["keep"] == 1, "doc_id"])

    # -- 3. repetition gates -------------------------------------------------
    rep = word_repetition_stats(docs).to_pandas()
    rep_keep = set(rep.loc[rep["keep"] == 1, "doc_id"])

    # -- 4. LM quality: keep docs above the 10th percentile of per-token
    #       log-probability (drop the most out-of-distribution tail) -------
    lm = bigram_lm_logprob(docs).to_pandas()
    per_tok = (lm["logprob_e6"] / lm["n_bigrams"].clip(lower=1)).to_numpy()
    lm_keep = set(lm.loc[per_tok >= np.quantile(per_tok, 0.10), "doc_id"])

    keep_ids = (
        set(all_ids) & exact_keep & near_keep & rep_keep & lm_keep
    )

    # -- 5. partitioned output: broadcast the keep set once, filter each
    #       Arrow batch vectorized (no per-row Python in the write path) ---
    keep_arr = np.sort(np.fromiter(keep_ids, dtype=np.int64))
    ref = ray.put(keep_arr)

    class KeepFilter:
        def __init__(self):
            self.keep = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            ids = batch["doc_id"].to_numpy(np.int64)
            pos = np.searchsorted(self.keep, ids)
            pos[pos == len(self.keep)] = 0
            return batch[self.keep[pos] == ids]

    kept = docs.map_batches(KeepFilter, batch_format="pandas", concurrency=(1, 4))
    kept.write_parquet(os.path.join(out_dir, "kept"))
    n_total = len(all_ids)
    print(
        f"curated {n_total} docs -> kept {len(keep_ids)} "
        f"({100.0 * len(keep_ids) / n_total:.1f}%); dropped by gate: "
        f"exact={n_total - len(exact_keep)}, "
        f"near={n_total - len(near_keep)}, "
        f"repetition={n_total - len(rep_keep)}, "
        f"lm={n_total - len(lm_keep)}"
    )
    print(f"kept docs written under {os.path.join(out_dir, 'kept')}/")


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/raylinkgraph_curated"
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)
    try:
        main(sf, out)
    finally:
        ray.shutdown()
