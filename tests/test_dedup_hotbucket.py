"""Hot-bucket splitting keeps planted near-dups; vectorized hashes are
byte-identical to the per-byte reference loops they replaced."""

import numpy as np
import pandas as pd
import ray.data as rd

from raylinkgraph.functions.dedup import _fnv_tokens, minhash_lsh_pairs
from raylinkgraph.functions.textops import Fingerprint, _fnv1a_bytes


def _fnv_ref(t: str) -> np.uint64:
    h = np.uint64(14695981039346656037)
    for b in t.encode("utf-8"):
        h = (h ^ np.uint64(b)) * np.uint64(1099511628211)
    return h


def test_fnv_tokens_matches_reference():
    toks = ["hello", "wörld", "a", "tokenized-stream", "x" * 40]
    got = _fnv_tokens(toks)
    want = np.array([_fnv_ref(t) for t in toks], np.uint64)
    assert np.array_equal(got, want)


def test_fingerprint_matches_slow_reference():
    fp = Fingerprint(k=3)
    rng = np.random.Generator(np.random.Philox(key=[3, 0]))
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    for _ in range(20):
        n = int(rng.integers(1, 30))
        text = " ".join(words[int(i)] for i in rng.integers(0, len(words), n))
        toks = text.split()
        if len(toks) < 3:
            want = int(_fnv1a_bytes(" ".join(toks)))
        else:
            want = min(
                int(_fnv1a_bytes(" ".join(toks[i : i + 3])))
                for i in range(len(toks) - 2)
            )
        assert fp.doc_fp(text) == want


def test_hot_lsh_bucket_split_keeps_planted_pair(ray_session):
    # 300 near-identical docs -> every band bucket is "hot" for
    # max_bucket=50; the planted identical pair (ids 7, 8) must survive
    base = "the quick brown fox jumps over the lazy dog " * 6
    rows = []
    for i in range(300):
        if i in (7, 8):
            rows.append((i, base + "planted duplicate tail"))
        else:
            rows.append((i, base + f"suffix variant {i % 5}"))
    docs = rd.from_pandas(pd.DataFrame(rows, columns=["doc_id", "text"]))
    pairs = minhash_lsh_pairs(
        docs, threshold=0.9, max_bucket=50, concurrency=(1, 2)
    ).to_pandas()
    assert len(pairs) > 0
    found = set(zip(pairs["a"], pairs["b"]))
    assert (7, 8) in found, sorted(found)[:10]
