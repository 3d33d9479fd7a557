"""Partition/parameter-invariance for the round-4 additions: sequence
packing, dup-cluster resolution, BM25, JSON field stats. The oracle
parity of each is covered by test_oracle_parity; here we pin the scale
contract — results must not depend on bucket/range/parallelism knobs."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

SF = "/root/testdata/sf0.001"


def _docs():
    return rd.read_parquet(f"{SF}/documents.parquet")


def test_pack_sequences_range_invariance(ray_session):
    from raylinkgraph.functions.packing import pack_sequences

    a = pack_sequences(_docs(), budget=64, ranges=3).to_pandas()
    b = pack_sequences(_docs(), budget=64, ranges=17).to_pandas()
    a = a.sort_values("doc_id").reset_index(drop=True)
    b = b.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    # offsets are the exclusive prefix sum of n_tokens in doc_id order
    assert (a["offset"].to_numpy()
            == np.concatenate([[0], np.cumsum(a["n_tokens"].to_numpy())[:-1]])).all()
    assert (a["pack_id"].to_numpy() == a["offset"].to_numpy() // 64).all()


def test_dup_clusters_bucket_invariance(ray_session, tmp_path):
    from raylinkgraph.functions.dedup import dup_clusters

    a = dup_clusters(_docs(), str(tmp_path / "w1"), buckets=8, P=2).to_pandas()
    b = dup_clusters(_docs(), str(tmp_path / "w2"), buckets=32, P=8).to_pandas()
    a = a.sort_values("doc_id").reset_index(drop=True)
    b = b.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    # cluster_id is the component minimum, so every cluster keeps exactly
    # its own min and the keep flag matches id==cluster
    assert (a["keep"].to_numpy() == (a["doc_id"] == a["cluster_id"]).to_numpy()).all()
    reps = set(a.loc[a["keep"] == 1, "doc_id"])
    assert set(a["cluster_id"]).issubset(reps)


def test_bm25_batch_size_invariance(ray_session):
    from raylinkgraph.functions.ranking import bm25_topk

    t = ["spark", "merge"]
    a = bm25_topk(_docs(), t, k=10, batch_size=64)
    b = bm25_topk(_docs(), t, k=10, batch_size=4096)
    pd.testing.assert_frame_equal(a, b)
    assert (a["score_e6"].to_numpy()[:-1] >= a["score_e6"].to_numpy()[1:]).all()


def test_bm25_empty_terms_absent(ray_session):
    from raylinkgraph.functions.ranking import bm25_topk

    out = bm25_topk(_docs(), ["zzz_not_a_word_zzz"], k=5)
    assert len(out) == 0


def test_json_stats_matches_pandas(ray_session):
    from raylinkgraph.functions.jsonops import json_int_field_stats

    ev = rd.read_parquet(f"{SF}/events.parquet", columns=["event_type", "props"])
    got = (
        json_int_field_stats(ev)
        .to_pandas().sort_values("event_type").reset_index(drop=True)
    )
    pdf = pd.read_parquet(f"{SF}/events.parquet", columns=["event_type", "props"])
    k = pdf["props"].str.extract(r'"k"\s*:\s*(-?\d+)', expand=False).astype("float64")
    want = (
        pd.DataFrame({"event_type": pdf["event_type"], "v": k})
        .groupby("event_type")
        .agg(n=("v", "size"), n_with_field=("v", "count"),
             sum_v=("v", "sum"), min_v=("v", "min"), max_v=("v", "max"))
        .reset_index()
    )
    for c in ["n", "n_with_field", "sum_v", "min_v", "max_v"]:
        assert (got[c].to_numpy(np.int64) == want[c].to_numpy(np.int64)).all(), c


def test_dsir_hashed_variant_and_direction(ray_session):
    from raylinkgraph.functions.dsir import dsir_weights

    exact = (
        dsir_weights(_docs())
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    hashed = (
        dsir_weights(_docs(), hash_features=256)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert len(exact) == len(hashed)
    # target-slice docs must score higher on average than the rest
    langs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "lang"])
    m = exact.merge(langs, on="doc_id")
    en = m.loc[m["lang"] == "en", "importance_e6"].mean()
    rest = m.loc[m["lang"] != "en", "importance_e6"].mean()
    assert en > rest
    # bucket-count invariance of the exact variant
    b = (
        dsir_weights(_docs(), buckets=8)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(exact, b)


def test_bigram_lm_logprob_brute_force(ray_session):
    from raylinkgraph.functions.lm import bigram_lm_logprob

    docs = pd.DataFrame(
        {
            "doc_id": np.arange(6, dtype=np.int64),
            "lang": ["en", "en", "fr", "en", "fr", "en"],
            "text": [
                "the cat sat on the mat",
                "the dog sat",
                "le chat noir",
                "the cat ran",
                "chat",          # single token: no bigrams, no output row
                "dog the cat",
            ],
        }
    )
    out = (
        bigram_lm_logprob(rd.from_pandas(docs), buckets=4)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    # brute-force reference model on the en slice
    train = [t.split(" ") for t, l in zip(docs.text, docs.lang) if l == "en"]
    from collections import Counter
    cvw, cv, vocab = Counter(), Counter(), set()
    for w in train:
        vocab.update(w)
        for v, u in zip(w[:-1], w[1:]):
            cvw[(v, u)] += 1
            cv[v] += 1
    V = len(vocab)
    exp = {}
    for did, t in zip(docs.doc_id, docs.text):
        w = t.split(" ")
        if len(w) < 2:
            continue
        s = 0
        for v, u in zip(w[:-1], w[1:]):
            s += int(np.floor(np.log((cvw[(v, u)] + 1.0) / (cv[v] + V)) * 1e6 + 0.5))
        exp[did] = (len(w) - 1, s)
    assert len(out) == len(exp)
    for _, r in out.iterrows():
        assert (r["n_bigrams"], r["logprob_e6"]) == exp[r["doc_id"]], r["doc_id"]
    # en docs must on average score higher than the fr doc under the en LM
    en_mean = out[out.doc_id.isin([0, 1, 3, 5])].apply(
        lambda r: r.logprob_e6 / r.n_bigrams, axis=1).mean()
    fr = out[out.doc_id == 2].iloc[0]
    assert en_mean > fr.logprob_e6 / fr.n_bigrams


def test_bigram_lm_bucket_invariance_and_empty_slice(ray_session):
    from raylinkgraph.functions.lm import bigram_lm_logprob

    a = bigram_lm_logprob(_docs(), buckets=8).to_pandas()
    b = bigram_lm_logprob(_docs(), buckets=32, batch_size=97).to_pandas()
    a = a.sort_values("doc_id").reset_index(drop=True)
    b = b.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    with pytest.raises(ValueError, match="empty training slice"):
        bigram_lm_logprob(_docs(), target_val="zz").to_pandas()
