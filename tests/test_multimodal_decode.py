"""Real pure-numpy image decode (PPM/BMP), features, resize."""

import numpy as np
import ray.data as rd

from raylinkgraph.functions.multimodal import (
    DecodeImage,
    decode_image_array,
    extract_image_features,
    ppm_media_table,
    resize_images,
)


def _ppm_bytes(img: np.ndarray) -> bytes:
    h, w, _ = img.shape
    return f"P6\n{w} {h}\n255\n".encode() + img.astype(np.uint8).tobytes()


def _bmp_bytes(img: np.ndarray) -> bytes:
    """Minimal 24-bit bottom-up BMP encoder (BGR, 4-byte row padding)."""
    h, w, _ = img.shape
    stride = (w * 3 + 3) // 4 * 4
    rows = np.zeros((h, stride), np.uint8)
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)
    pix = rows.tobytes()
    off = 54
    header = (
        b"BM"
        + (off + len(pix)).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + off.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(pix).to_bytes(4, "little")
        + b"\x00" * 16
    )
    return header + pix


def test_ppm_roundtrip():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (11, 7, 3)).astype(np.uint8)
    got = decode_image_array(_ppm_bytes(img))
    assert got is not None and np.array_equal(got, img)
    # comments in the header are skipped
    with_comment = b"P6\n# a comment\n7 11\n255\n" + img.tobytes()
    assert np.array_equal(decode_image_array(with_comment), img)


def test_bmp_roundtrip():
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (5, 6, 3)).astype(np.uint8)
    got = decode_image_array(_bmp_bytes(img))
    assert got is not None and np.array_equal(got, img)


def test_non_image_returns_none():
    assert decode_image_array(b"hello world, not an image") is None
    assert decode_image_array(b"P6 bogus header") is None


def test_decode_real_features_and_dims():
    img = np.full((10, 20, 3), 128, np.uint8)  # constant gray
    t = ppm_media_table(1)
    t = t.set_column(2, "payload", [[_ppm_bytes(img)]])
    out = DecodeImage(feature_dim=4)(t)
    assert out.column("width").to_pylist() == [20]
    assert out.column("height").to_pylist() == [10]
    feat = np.array(out.column("feature").to_pylist()[0])
    assert np.allclose(feat, 128 / 255.0)


def test_pipeline_real_ppm(ray_session):
    media = rd.from_arrow(ppm_media_table(25))
    feats = extract_image_features(
        media, feature_dim=9, concurrency=2, batch_size=8
    ).to_pandas()
    assert len(feats) == 25
    # gradient images: features vary with position, deterministic
    f = np.stack(feats.sort_values("media_id")["feature"].to_numpy())
    assert f.shape == (25, 9)
    assert (f.std(axis=1) > 0).all()
    again = extract_image_features(
        rd.from_arrow(ppm_media_table(25)), feature_dim=9, concurrency=2,
        batch_size=8,
    ).to_pandas()
    g = np.stack(again.sort_values("media_id")["feature"].to_numpy())
    assert np.allclose(f, g)


def test_resize_real(ray_session):
    img = np.zeros((40, 40, 3), np.uint8)
    img[:, 20:] = 200  # left black, right 200
    t = ppm_media_table(1).set_column(2, "payload", [[_ppm_bytes(img)]])
    out = resize_images(rd.from_arrow(t), out_w=4, out_h=4).take_all()[0]
    rimg = decode_image_array(out["payload"])
    assert rimg.shape == (4, 4, 3)
    assert (rimg[:, :2] < 10).all() and (rimg[:, 2:] > 190).all()


def test_wav_decode_and_features(ray_session):
    from raylinkgraph.functions.multimodal import (
        decode_wav,
        extract_audio_features,
        wav_media_table,
    )

    t = wav_media_table(10)
    rate, x = decode_wav(t.column("payload").to_pylist()[0])
    assert rate == 8000 and len(x) > 100
    assert np.abs(x).max() <= 1.0
    feats = extract_audio_features(
        rd.from_arrow(t), n_frames=4, concurrency=2, batch_size=4
    ).to_pandas().sort_values("media_id")
    assert len(feats) == 10
    assert (feats["duration_sec"] > 0.04).all()
    # a sine wave has substantial RMS energy in every frame
    e = np.stack(feats["energy"].to_numpy())
    assert (e > 0.1).all()
    # pure tone: zero-crossing rate ~ 2 * f0 / rate, definitely positive
    assert (feats["zcr"] > 0.01).all()
    assert decode_wav(b"not a wav at all") is None


def _ppm(img: np.ndarray) -> bytes:
    h, w, _ = img.shape
    return f"P6\n{w} {h}\n255\n".encode() + img.astype(np.uint8).tobytes()


def test_phash_planted_visual_dups(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from raylinkgraph.functions.multimodal import MEDIA_SCHEMA, phash_dup_pairs

    rng = np.random.default_rng(3)
    yy, xx = np.mgrid[0:40, 0:40]
    base = np.stack([xx * 6, yy * 6, (xx + yy) * 3], axis=2).astype(np.uint8)
    noisy = np.clip(
        base.astype(np.int64) + rng.integers(-2, 3, base.shape), 0, 255
    ).astype(np.uint8)
    inverted = 255 - base
    imgs = [base, noisy, inverted]
    t = pa.table(
        {
            "media_id": pa.array(np.arange(3, dtype=np.int64), pa.int64()),
            "mime": pa.array(["image/x-portable-pixmap"] * 3, pa.string()),
            "payload": pa.array([_ppm(i) for i in imgs], pa.large_binary()),
            "width": pa.array(np.full(3, 40, np.int32), pa.int32()),
            "height": pa.array(np.full(3, 40, np.int32), pa.int32()),
        },
        schema=MEDIA_SCHEMA,
    )
    pairs = (
        phash_dup_pairs(rd.from_arrow(t), max_hamming=3)
        .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    )
    # the noisy copy pairs with the original; the inverted image doesn't
    assert [(0, 1)] == list(zip(pairs.a, pairs.b)), pairs
    assert pairs.hamming.iloc[0] <= 3


def test_phash_partition_invariant_and_identical_fakes(ray_session):
    import ray.data as rd

    from raylinkgraph.functions.multimodal import (
        fake_media_table, image_phash, phash_dup_pairs, ppm_media_table,
    )

    t = ppm_media_table(60, seed=7)
    a = image_phash(rd.from_arrow(t)).to_pandas().sort_values("media_id")
    b = (
        image_phash(rd.from_arrow(t).repartition(7))
        .to_pandas().sort_values("media_id")
    )
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))
    # fake (non-decodable) path: byte-identical payloads collide exactly
    import pyarrow as pa

    f = fake_media_table(4, seed=1)
    dup = f.set_column(
        0, "media_id", pa.array(np.array([10, 11, 12, 13], np.int64))
    )
    both = pa.concat_tables([f, dup])
    pairs = phash_dup_pairs(rd.from_arrow(both), max_hamming=0).to_pandas()
    got = set(map(tuple, pairs[["a", "b"]].to_numpy()))
    assert got == {(0, 10), (1, 11), (2, 12), (3, 13)}, got
