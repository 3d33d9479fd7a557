"""HLL internals: the vectorized leading-zero kernel must be exact, and
the estimator must hit its published error bound across regimes."""

import numpy as np
import pandas as pd

from raylinkgraph.functions.hashing import splitmix64
from raylinkgraph.functions.sketches import hll_estimate


def _kernel_rank(h: np.ndarray, p: int) -> np.ndarray:
    # the same branchless clz used in hll_partials
    rest = h << np.uint64(p)
    nz = rest != 0
    lz = np.full(len(h), 64 - p, np.int64)
    x = rest[nz].copy()
    n = np.zeros(x.shape, np.int64)
    for shift in (32, 16, 8, 4, 2, 1):
        mask = x < (np.uint64(1) << np.uint64(64 - shift))
        n[mask] += shift
        x[mask] = x[mask] << np.uint64(shift)
    lz[nz] = n
    return np.minimum(lz, 64 - p) + 1


def test_clz_kernel_exact():
    rng = np.random.Generator(np.random.Philox(key=[99, 0]))
    h = rng.integers(0, 1 << 63, 100000, dtype=np.uint64) * np.uint64(2) \
        + rng.integers(0, 2, 100000, dtype=np.uint64)
    # force edge cases: all-zero payload, single low bit, single high bit
    h = np.concatenate([h, np.array([0, 1, 1 << 63, (1 << 52) - 1], np.uint64)])
    for p in (4, 12, 16):
        rest = (h << np.uint64(p)).tolist()
        ref = np.array(
            [min(64 - int(v).bit_length(), 64 - p) + 1 if v else 64 - p + 1
             for v in rest],
            np.int64,
        )
        assert np.array_equal(_kernel_rank(h, p), ref)


def test_estimator_error_bound():
    p = 12
    m = 1 << p
    for true_n in (100, 5000, 200000, 2000000):
        vals = splitmix64(np.arange(true_n, dtype=np.uint64))
        reg = (vals >> np.uint64(64 - p)).astype(np.int64)
        rank = _kernel_rank(vals, p)
        regs = np.zeros(m, np.float64)
        np.maximum.at(regs, reg, rank.astype(np.float64))
        est = hll_estimate(regs, p)
        # sigma ~ 1.04/sqrt(4096) = 1.6%; allow 4 sigma
        assert abs(est - true_n) / true_n < 0.065, (true_n, est)


def test_bottom_k_sample_matches_bruteforce_and_partitioning(ray_session):
    import ray.data as rd

    from raylinkgraph.functions.hashing import splitmix64
    from raylinkgraph.functions.sketches import bottom_k_sample

    ids = np.arange(10_000, dtype=np.int64) * 17 + 3
    df = pd.DataFrame({"doc_id": ids, "v": ids.astype(np.float64) % 97})
    h = splitmix64(ids)
    want = ids[np.argsort(h)][:64]
    for blocks in (1, 13):
        ds = rd.from_pandas(df).repartition(blocks)
        got = bottom_k_sample(ds, "doc_id", 64)
        assert got["doc_id"].tolist() == sorted(
            want, key=lambda i: h[np.where(ids == i)[0][0]]
        )


def test_approx_quantiles_sample_error_bound(ray_session):
    import ray.data as rd

    from raylinkgraph.functions.sketches import approx_quantiles_sample

    rng = np.random.default_rng(9)
    x = rng.normal(0, 1, 200_000)
    df = pd.DataFrame({"doc_id": np.arange(len(x), dtype=np.int64), "v": x})
    out = approx_quantiles_sample(
        rd.from_pandas(df), "doc_id", "v", [0.1, 0.5, 0.9], k=4096
    )
    xs = np.sort(x)
    for q, v in zip([0.1, 0.5, 0.9], out["value"]):
        true_rank = np.searchsorted(xs, v) / len(xs)
        assert abs(true_rank - q) < 3 * 1.63 / np.sqrt(4096), (q, true_rank)


def test_heavy_hitters_exact_and_partition_invariant(ray_session):
    import ray.data as rd

    from raylinkgraph.functions.sketches import heavy_hitters

    # Zipf-ish skew: value v appears ~ N/(v+1) times, many singletons
    rng = np.random.default_rng(4)
    counts = {v: max(1, 5000 // (v + 1)) for v in range(400)}
    vals = np.concatenate([np.full(c, v, np.int64) for v, c in counts.items()])
    rng.shuffle(vals)
    n, k = len(vals), 32
    truth = sorted(v for v, c in counts.items() if c * k > n)
    for blocks in (1, 7, 23):
        ds = rd.from_pandas(pd.DataFrame({"x": vals})).repartition(blocks)
        got = heavy_hitters(ds, "x", k)
        assert got["value"].tolist() == truth
        assert got["n"].tolist() == [counts[v] for v in truth]


def test_heavy_hitters_string_values_and_empty(ray_session):
    import ray.data as rd

    from raylinkgraph.functions.sketches import heavy_hitters

    vals = ["hot"] * 50 + [f"cold{i}" for i in range(200)]
    ds = rd.from_pandas(pd.DataFrame({"x": vals})).repartition(5)
    got = heavy_hitters(ds, "x", 4)  # threshold 250/4 = 62.5 -> none
    assert len(got) == 0
    got = heavy_hitters(ds, "x", 8)  # threshold 31.25 -> only "hot"
    assert got["value"].tolist() == ["hot"] and got["n"].tolist() == [50]


def test_weighted_sample_k_replay_and_invariance(ray_session):
    import ray.data as rd

    from raylinkgraph.functions.hashing import splitmix64
    from raylinkgraph.functions.sketches import weighted_sample_k

    rng = np.random.default_rng(11)
    df = pd.DataFrame(
        {
            "id": np.arange(3000, dtype=np.int64),
            "w": rng.exponential(1.0, 3000),
            "v": rng.integers(0, 100, 3000).astype(np.int64),
        }
    )
    df.loc[5, "w"] = 0.0  # weight<=0 rows are excluded
    got = weighted_sample_k(rd.from_pandas(df), "id", "w", 100)
    # exact sequential replay of the Gumbel-top-k scores
    h = splitmix64(df["id"].to_numpy()).astype(np.uint64)
    u = (h.astype(np.float64) + 0.5) / float(2**64)
    with np.errstate(divide="ignore"):
        score = np.log(df["w"].to_numpy()) - np.log(-np.log(u))
    ok = df["w"].to_numpy() > 0
    want = df[ok].iloc[np.argsort(-score[ok], kind="stable")[:100]]
    assert list(got["id"]) == list(want["id"])
    assert 5 not in set(got["id"])
    # partition invariance
    got2 = weighted_sample_k(rd.from_pandas(df).repartition(13), "id", "w", 100)
    pd.testing.assert_frame_equal(got, got2)


def test_weighted_sample_k_respects_weights(ray_session):
    import ray.data as rd

    from raylinkgraph.functions.sketches import weighted_sample_k

    # two strata: heavy rows get 50x weight -> dominate the sample
    n = 4000
    df = pd.DataFrame(
        {
            "id": np.arange(n, dtype=np.int64),
            "w": np.where(np.arange(n) < n // 2, 50.0, 1.0),
        }
    )
    got = weighted_sample_k(rd.from_pandas(df), "id", "w", 200)
    heavy = (got["id"] < n // 2).mean()
    assert heavy > 0.9, heavy


def test_approx_distinct_by_accuracy_and_invariance(ray_session):
    import ray.data as rd

    from raylinkgraph.functions.sketches import approx_distinct_by

    rng = np.random.default_rng(4)
    n = 60000
    grp = np.array(["a", "b", "c"])[rng.integers(0, 3, n)]
    # per-group distinct ranges differ by an order of magnitude
    val = np.where(
        grp == "a", rng.integers(0, 200, n),
        np.where(grp == "b", rng.integers(0, 5000, n), rng.integers(0, 40000, n)),
    ).astype(np.int64)
    df = pd.DataFrame({"g": grp, "v": val})
    exact = df.groupby("g")["v"].nunique()
    got = (
        approx_distinct_by(rd.from_pandas(df), "g", "v", p=12)
        .to_pandas().set_index("g")["approx_distinct"]
    )
    for k in exact.index:
        rel = abs(got[k] - exact[k]) / exact[k]
        assert rel < 0.05, (k, got[k], exact[k])
    got2 = (
        approx_distinct_by(rd.from_pandas(df).repartition(9), "g", "v", p=12)
        .to_pandas().set_index("g")["approx_distinct"]
    )
    assert got.sort_index().equals(got2.sort_index())
