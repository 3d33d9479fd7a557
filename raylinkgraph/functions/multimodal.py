"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``large_binary`` columns with metadata
(mime, width/height/duration) beside them. Decode / feature-extraction /
resize / frame-sampling run as actor-pool ``map_batches`` stages with
SMALL batch sizes (wide binary rows; see the memory-aware sizing note in
the module functions).

The decode libraries (PIL/ffmpeg/torchaudio) are NOT in this container,
so the codec step is stubbed: each stage detects the library at actor
init; with ``fake=True`` it produces a deterministic, content-hash-based
stand-in so the Ray-side plumbing (schema, batch size, actor signature,
output layout) is real and tested; with ``fake=False`` and no library it
raises NotImplementedError at first batch.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data as rd

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("mime", pa.string()),
        ("payload", pa.large_binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
    ]
)


def _content_hash_floats(payload: bytes, n: int) -> np.ndarray:
    """Deterministic fake feature vector derived from the payload bytes."""
    h = hashlib.sha256(payload).digest()
    seed = int.from_bytes(h[:8], "big")
    rng = np.random.Generator(np.random.Philox(key=[seed % (1 << 63), 0]))
    return rng.standard_normal(n)


class DecodeImage:
    """payload -> decoded dims + feature vector (stub-gated codec)."""

    def __init__(self, feature_dim: int = 32, fake: bool = True):
        self.feature_dim = feature_dim
        self.fake = fake
        try:
            import PIL.Image  # noqa: F401

            self.pil = True
        except ImportError:
            self.pil = False

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake and not self.pil:
            raise NotImplementedError(
                "real image decode needs PIL, which is not in this container; "
                "run with fake=True for the deterministic stand-in"
            )
        payloads = batch.column("payload").to_pylist()
        feats = np.stack(
            [_content_hash_floats(p, self.feature_dim) for p in payloads]
        )
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "width": batch.column("width"),
                "height": batch.column("height"),
                "feature": pa.array(list(feats), pa.list_(pa.float64())),
            }
        )


def extract_image_features(
    media: rd.Dataset, *, feature_dim: int = 32, fake: bool = True,
    concurrency: int | tuple[int, int] = (1, 4), batch_size: int = 32,
) -> rd.Dataset:
    """Actor-pool feature extraction. ``batch_size`` deliberately small:
    batch_size x concurrency x payload size must fit worker heaps — for
    1 MB images and 8 actors, 32-row batches keep peak heap ~256 MB."""
    return media.map_batches(
        DecodeImage,
        fn_constructor_kwargs={"feature_dim": feature_dim, "fake": fake},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


class SampleFrames:
    """video payload -> N deterministic 'frames' (offsets into payload);
    the frame-decode itself is stub-gated like DecodeImage."""

    def __init__(self, n_frames: int = 4, fake: bool = True):
        self.n_frames = n_frames
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frame_no, frame_hash = [], [], []
        for mid, payload in zip(
            batch.column("media_id").to_pylist(), batch.column("payload").to_pylist()
        ):
            if not self.fake:
                raise NotImplementedError("real frame sampling needs ffmpeg")
            for f in range(self.n_frames):
                chunk = payload[f::self.n_frames] or b"\x00"
                ids.append(mid)
                frame_no.append(f)
                frame_hash.append(
                    int.from_bytes(hashlib.sha1(chunk).digest()[:8], "big") >> 1
                )
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_no": pa.array(frame_no, pa.int32()),
                "frame_hash": pa.array(frame_hash, pa.int64()),
            }
        )


def sample_frames(media: rd.Dataset, *, n_frames=4, fake=True,
                  concurrency=(1, 4), batch_size=16) -> rd.Dataset:
    return media.map_batches(
        SampleFrames,
        fn_constructor_kwargs={"n_frames": n_frames, "fake": fake},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def fake_media_table(n: int, seed: int = 5) -> pa.Table:
    """Deterministic binary-payload fixture for the plumbing tests."""
    rng = np.random.Generator(np.random.Philox(key=[seed, 0]))
    payloads = [rng.integers(0, 256, int(rng.integers(100, 4000)), dtype=np.uint8)
                .tobytes() for _ in range(n)]
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
            "mime": pa.array(["image/png"] * n, pa.string()),
            "payload": pa.array(payloads, pa.large_binary()),
            "width": pa.array(np.full(n, 64, np.int32), pa.int32()),
            "height": pa.array(np.full(n, 64, np.int32), pa.int32()),
        },
        schema=MEDIA_SCHEMA,
    )
