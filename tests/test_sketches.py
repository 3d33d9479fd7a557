"""HLL internals: the vectorized leading-zero kernel must be exact, and
the estimator must hit its published error bound across regimes."""

import numpy as np

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
