"""Generic hash_join: broadcast and partitioned paths must agree with
each other and with a pandas merge, for int and string keys."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from raylinkgraph.functions.joins import hash_join


def _mk(n_left=500, n_right=80, seed=3):
    rng = np.random.default_rng(seed)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 100, n_left).astype(np.int64),
            "x": rng.standard_normal(n_left),
            "tag": [f"t{i % 7}" for i in range(n_left)],
        }
    )
    right = pd.DataFrame(
        {
            "rk": rng.choice(100, n_right, replace=False).astype(np.int64),
            "y": rng.integers(0, 1000, n_right).astype(np.int64),
            # clashing name exercises the rsuffix rename
            "x": rng.standard_normal(n_right),
        }
    )
    return left, right


def _norm(df):
    return (
        df.sort_values(list(df.columns))
        .reset_index(drop=True)
        .round(12)
    )


@pytest.mark.parametrize("how", ["inner", "left"])
def test_hash_join_matches_pandas(ray_session, how):
    left, right = _mk()
    want = left.merge(
        right.rename(columns={"rk": "k", "x": "x_r"}), on="k", how=how
    )
    for limit in (10**6, 0):  # broadcast path, then partitioned path
        got = hash_join(
            rd.from_pandas(left.copy()),
            rd.from_pandas(right.copy()),
            on="k",
            right_on="rk",
            how=how,
            broadcast_limit=limit,
            buckets=8,
        ).to_pandas()
        assert sorted(got.columns) == sorted(want.columns)
        pd.testing.assert_frame_equal(
            _norm(got)[sorted(got.columns)],
            _norm(want)[sorted(want.columns)],
            check_dtype=(how == "inner"),  # left join NaNs float-pad ints
        )


def test_hash_join_string_keys_and_dtypes(ray_session):
    left = pd.DataFrame(
        {"url": [f"u{i % 9}" for i in range(60)],
         "v": np.arange(60, dtype=np.int64)}
    )
    right = pd.DataFrame(
        {"url": [f"u{i}" for i in range(6)],
         "gid": np.arange(6, dtype=np.int64) * 10}
    )
    got = hash_join(
        rd.from_pandas(left), rd.from_pandas(right), on="url",
        broadcast_limit=0, buckets=4,
    ).to_pandas()
    want = left.merge(right, on="url", how="inner")
    # int columns survive the null-padding round trip as int64
    assert got["v"].dtype == np.int64 and got["gid"].dtype == np.int64
    pd.testing.assert_frame_equal(
        _norm(got)[sorted(got.columns)], _norm(want)[sorted(want.columns)]
    )


def test_hash_join_many_to_many(ray_session):
    # duplicate keys on BOTH sides: the per-bucket merge must expand
    # m x n, identically on both paths
    rng = np.random.default_rng(7)
    left = pd.DataFrame(
        {"k": rng.integers(0, 10, 200).astype(np.int64),
         "lv": np.arange(200, dtype=np.int64)}
    )
    right = pd.DataFrame(
        {"k": rng.integers(0, 10, 50).astype(np.int64),
         "rv": np.arange(50, dtype=np.int64)}
    )
    want = left.merge(right, on="k", how="inner")
    for limit in (10**6, 0):
        got = hash_join(
            rd.from_pandas(left.copy()), rd.from_pandas(right.copy()),
            on="k", broadcast_limit=limit, buckets=4,
        ).to_pandas()
        assert len(got) == len(want)
        pd.testing.assert_frame_equal(
            _norm(got)[sorted(got.columns)], _norm(want)[sorted(want.columns)]
        )


def test_hash_join_rejects_bad_how(ray_session):
    left, right = _mk(10, 5)
    with pytest.raises(ValueError):
        hash_join(
            rd.from_pandas(left), rd.from_pandas(right),
            on="k", right_on="rk", how="outer",
        )


@pytest.mark.parametrize("how", ["semi", "anti"])
def test_filter_join_paths_agree_with_pandas(ray_session, how):
    left, right = _mk()
    exists = left["k"].isin(right["rk"].unique())
    want = left[exists if how == "semi" else ~exists].reset_index(drop=True)
    for limit in (10**6, 0):  # broadcast path, then partitioned path
        got = (
            hash_join(
                rd.from_pandas(left.copy()), rd.from_pandas(right.copy()),
                on="k", right_on="rk", how=how,
                broadcast_limit=limit, buckets=4,
            )
            .to_pandas()
            .sort_values(["k", "x"]).reset_index(drop=True)
        )
        w = want.sort_values(["k", "x"]).reset_index(drop=True)
        assert list(got.columns) == list(left.columns)
        pd.testing.assert_frame_equal(got, w)
        assert got["k"].dtype == np.int64  # int dtype restored on both paths


def test_filter_join_string_key(ray_session):
    left = pd.DataFrame(
        {"k": [f"u{i % 5}" for i in range(40)], "v": np.arange(40, dtype=np.int64)}
    )
    right = pd.DataFrame({"k": ["u0", "u3", "u9"]})
    want_semi = left[left["k"].isin({"u0", "u3"})].reset_index(drop=True)
    got = (
        hash_join(
            rd.from_pandas(left), rd.from_pandas(right),
            on="k", how="semi", broadcast_limit=0, buckets=3,
        )
        .to_pandas().sort_values("v").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want_semi)


@pytest.mark.parametrize("how", ["semi", "anti"])
def test_filter_join_bloom_prefilter_exact(ray_session, how):
    """bloom prefilter must change the exchange volume, never the
    result: identical output to the plain partitioned path."""
    left, right = _mk(2000, 80, seed=9)
    plain = (
        hash_join(
            rd.from_pandas(left.copy()), rd.from_pandas(right.copy()),
            on="k", right_on="rk", how=how, broadcast_limit=0, buckets=4,
        )
        .to_pandas().sort_values(["k", "x"]).reset_index(drop=True)
    )
    bloomed = (
        hash_join(
            rd.from_pandas(left.copy()), rd.from_pandas(right.copy()),
            on="k", right_on="rk", how=how, broadcast_limit=0, buckets=4,
            prefilter="bloom",
        )
        .to_pandas().sort_values(["k", "x"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(plain, bloomed)


def test_bloom_sketch_no_false_negatives(ray_session):
    from raylinkgraph.functions.sketches import bloom_build, bloom_contains

    keys = pd.DataFrame({"k": np.arange(0, 50000, 2, dtype=np.int64)})
    bits, m, k = bloom_build(rd.from_pandas(keys).repartition(7), "k", fpp=0.01)
    probe = np.arange(50000, dtype=np.int64)
    got = bloom_contains(bits, m, k, probe)
    present = probe % 2 == 0
    assert not (present & ~got).any()  # NO false negatives, ever
    fp = float((got & ~present).sum() / (~present).sum())
    assert fp < 0.03, fp
    # string keys route through crc32 widening
    skeys = pd.DataFrame({"s": [f"u{i}" for i in range(0, 1000, 2)]})
    b2, m2, k2 = bloom_build(rd.from_pandas(skeys), "s", fpp=0.01)
    probe_s = np.array([f"u{i}" for i in range(1000)], dtype=object)
    got2 = bloom_contains(b2, m2, k2, probe_s)
    assert got2[::2].all()


def test_byte_gate_falls_back_on_wide_strings(ray_session):
    """A right side few in ROWS but wide in BYTES must route through the
    partitioned path (round-4 verdict: the row-only gate pinned multi-GB
    url maps on the driver) and still produce the broadcast answer."""
    left, right = _mk()
    want = hash_join(
        rd.from_pandas(left.copy()),
        rd.from_pandas(right.copy()),
        on="k", right_on="rk", how="inner", buckets=8,
    ).to_pandas()
    got = hash_join(
        rd.from_pandas(left.copy()),
        rd.from_pandas(right.copy()),
        on="k", right_on="rk", how="inner", buckets=8,
        broadcast_limit=10**6,        # rows alone would broadcast
        broadcast_bytes_limit=1,      # bytes force the partitioned path
    ).to_pandas()
    pd.testing.assert_frame_equal(
        _norm(got)[sorted(got.columns)], _norm(want)[sorted(want.columns)]
    )
    # semi/anti byte gate too
    for how in ("semi", "anti"):
        want_f = hash_join(
            rd.from_pandas(left.copy()), rd.from_pandas(right.copy()),
            on="k", right_on="rk", how=how, buckets=8,
        ).to_pandas()
        got_f = hash_join(
            rd.from_pandas(left.copy()), rd.from_pandas(right.copy()),
            on="k", right_on="rk", how=how, buckets=8,
            broadcast_limit=10**6, broadcast_bytes_limit=1,
        ).to_pandas()
        pd.testing.assert_frame_equal(
            _norm(got_f)[sorted(got_f.columns)],
            _norm(want_f)[sorted(want_f.columns)],
        )


def test_attach_gids_byte_gate(ray_session):
    """attach_gids with a byte limit of 1 must take the partitioned
    bucket-join and agree with the broadcast path."""
    import ray.data as _rd

    from raylinkgraph.stages.vertex_map import attach_gids, build_vertex_map

    pairs = pd.DataFrame(
        {
            "src_url": [f"http://h{i % 13}.test/p{i}" for i in range(300)],
            "dst_url": [f"http://h{(i * 7) % 13}.test/p{(i * 3) % 300}" for i in range(300)],
        }
    )
    vmap = build_vertex_map(_rd.from_pandas(pairs.copy()))
    bc = attach_gids(_rd.from_pandas(pairs.copy()), vmap).to_pandas()
    vmap2 = build_vertex_map(_rd.from_pandas(pairs.copy()))
    pt = attach_gids(
        _rd.from_pandas(pairs.copy()), vmap2, broadcast_bytes_limit=1
    ).to_pandas()
    key = ["src_id", "dst_id"]
    pd.testing.assert_frame_equal(
        bc.sort_values(key).reset_index(drop=True),
        pt[key].sort_values(key).reset_index(drop=True).astype(bc.dtypes.to_dict()),
    )
