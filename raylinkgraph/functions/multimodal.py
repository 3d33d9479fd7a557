"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``large_binary`` columns with metadata
(mime, width/height/duration) beside them. Decode / feature-extraction /
resize / frame-sampling run as actor-pool ``map_batches`` stages with
SMALL batch sizes (wide binary rows; see the memory-aware sizing note in
the module functions).

Decode is REAL for uncompressed formats that need no external library:
P6 PPM and 24-bit uncompressed BMP images are parsed in pure numpy
(``decode_image_array``), RIFF/WAVE PCM audio via ``decode_wav``, and
YUV4MPEG2 (.y4m — the uncompressed interchange format ffmpeg/mjpegtools
use) video via ``decode_y4m_frames`` (header parse, per-frame plane
slicing, chroma upsample, BT.601 YCbCr->RGB). Features/resize are
computed from the actual pixels (block-mean pooling via a 2-D
summed-area table). For compressed codecs (JPEG/PNG/H.264/MP3) the
libraries (PIL/ffmpeg) are NOT in this container, so that path is
stubbed: each stage detects the format at decode time; with
``fake=True`` it produces a deterministic, content-hash-based stand-in
so the Ray-side plumbing (schema, batch size, actor signature, output
layout) is real and tested; with ``fake=False`` and no library it
raises NotImplementedError at first batch.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data as rd


def decode_image_array(payload: bytes) -> np.ndarray | None:
    """Pure-numpy decode of P6 PPM (maxval 255) and 24-bit uncompressed
    BMP into an (h, w, 3) uint8 array; None when the payload is neither
    (the caller falls back to the stub / library path)."""
    if payload[:2] == b"P6":
        # header: P6 <w> <h> <maxval><single whitespace><raw RGB>
        toks: list[int] = []
        i = 2
        n = len(payload)
        while len(toks) < 3 and i < n:
            c = payload[i : i + 1]
            if c == b"#":
                while i < n and payload[i : i + 1] != b"\n":
                    i += 1
            elif c.isspace():
                i += 1
            else:
                j = i
                while j < n and not payload[j : j + 1].isspace():
                    j += 1
                try:
                    toks.append(int(payload[i:j]))
                except ValueError:
                    return None
                i = j
        if len(toks) < 3 or toks[2] != 255:
            return None
        i += 1  # the single whitespace after maxval
        w, h = toks[0], toks[1]
        if i + w * h * 3 > n:
            return None
        return (
            np.frombuffer(payload, np.uint8, count=w * h * 3, offset=i)
            .reshape(h, w, 3)
            .copy()
        )
    if payload[:2] == b"BM" and len(payload) >= 54:
        off = int.from_bytes(payload[10:14], "little")
        w = int.from_bytes(payload[18:22], "little", signed=True)
        h = int.from_bytes(payload[22:26], "little", signed=True)
        bpp = int.from_bytes(payload[28:30], "little")
        comp = int.from_bytes(payload[30:34], "little")
        if bpp != 24 or comp != 0 or w <= 0 or h == 0:
            return None
        bottom_up = h > 0
        h = abs(h)
        stride = (w * 3 + 3) // 4 * 4
        if off + stride * h > len(payload):
            return None
        rows = np.frombuffer(
            payload, np.uint8, count=stride * h, offset=off
        ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
        if bottom_up:
            rows = rows[::-1]
        return rows[:, :, ::-1].copy()  # BGR -> RGB
    return None


def _block_mean(gray: np.ndarray, k: int) -> np.ndarray:
    """k x k block-mean pooling via a summed-area table (vectorized)."""
    h, w = gray.shape
    sat = np.zeros((h + 1, w + 1), np.float64)
    sat[1:, 1:] = gray.cumsum(0).cumsum(1)
    ys = np.arange(k + 1) * h // k
    xs = np.arange(k + 1) * w // k
    S = sat[ys][:, xs]
    blocks = S[1:, 1:] - S[:-1, 1:] - S[1:, :-1] + S[:-1, :-1]
    area = np.outer(np.diff(ys), np.diff(xs))
    out = np.zeros((k, k), np.float64)
    nz = area > 0
    out[nz] = blocks[nz] / area[nz]
    return out


def _real_features(img: np.ndarray, n: int) -> np.ndarray:
    """First n entries of the k x k block-mean grayscale grid, scaled to
    [0, 1] (k = ceil(sqrt(n)))."""
    k = int(np.ceil(np.sqrt(n)))
    return (_block_mean(img.mean(axis=2), k) / 255.0).ravel()[:n]

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
    """payload -> decoded dims + feature vector.

    PPM/BMP payloads decode for real (pure numpy) and yield true pixel
    dims + block-mean features; anything else falls back to the
    stub-gated codec path (PIL if present, else fake stand-in or
    NotImplementedError)."""

    def __init__(self, feature_dim: int = 32, fake: bool = True):
        self.feature_dim = feature_dim
        self.fake = fake
        try:
            import PIL.Image  # noqa: F401

            self.pil = True
        except ImportError:
            self.pil = False

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        width = batch.column("width").to_numpy(zero_copy_only=False).copy()
        height = batch.column("height").to_numpy(zero_copy_only=False).copy()
        feats = np.empty((len(payloads), self.feature_dim), np.float64)
        for i, p in enumerate(payloads):
            img = decode_image_array(p)
            if img is not None:
                height[i], width[i] = img.shape[0], img.shape[1]
                feats[i] = _real_features(img, self.feature_dim)
            elif self.fake:
                feats[i] = _content_hash_floats(p, self.feature_dim)
            else:
                raise NotImplementedError(
                    "payload is not PPM/BMP and real decode of compressed "
                    "codecs needs PIL, which is not in this container; run "
                    "with fake=True for the deterministic stand-in"
                )
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "width": pa.array(width.astype(np.int32), pa.int32()),
                "height": pa.array(height.astype(np.int32), pa.int32()),
                "feature": pa.array(list(feats), pa.list_(pa.float64())),
            }
        )


class ResizeImage:
    """payload -> block-mean resized image, re-encoded as P6 PPM bytes.
    Real for PPM/BMP inputs; non-decodable payloads produce a
    deterministic hash-gray stand-in with ``fake=True``, else raise."""

    def __init__(self, out_w: int = 32, out_h: int = 32, fake: bool = True):
        self.out_w, self.out_h, self.fake = out_w, out_h, fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        header = f"P6\n{self.out_w} {self.out_h}\n255\n".encode()
        for p in batch.column("payload").to_pylist():
            img = decode_image_array(p)
            if img is None:
                if not self.fake:
                    raise NotImplementedError(
                        "resize of non-PPM/BMP payloads needs PIL/ffmpeg"
                    )
                g = _content_hash_floats(p, self.out_w * self.out_h)
                px = np.repeat(
                    ((g - g.min()) / max(float(np.ptp(g)), 1e-12) * 255)
                    .astype(np.uint8),
                    3,
                )
            else:
                chans = [
                    _block_mean(img[:, :, c].astype(np.float64), self.out_h)
                    for c in range(3)
                ]
                # _block_mean pools to k x k; pool rows to out_h then
                # columns to out_w by slicing the square grid
                k = self.out_h
                grid = np.stack(chans, axis=2)
                xs = (np.arange(self.out_w) * k // self.out_w).clip(max=k - 1)
                px = grid[:, xs].astype(np.uint8).ravel()
            out.append(header + px.tobytes())
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "mime": pa.array(
                    ["image/x-portable-pixmap"] * len(out), pa.string()
                ),
                "payload": pa.array(out, pa.large_binary()),
                "width": pa.array(
                    np.full(len(out), self.out_w, np.int32), pa.int32()
                ),
                "height": pa.array(
                    np.full(len(out), self.out_h, np.int32), pa.int32()
                ),
            }
        )


def resize_images(
    media: rd.Dataset, *, out_w: int = 32, out_h: int = 32, fake: bool = True,
    concurrency: int | tuple[int, int] = (1, 4), batch_size: int = 32,
) -> rd.Dataset:
    return media.map_batches(
        ResizeImage,
        fn_constructor_kwargs={"out_w": out_w, "out_h": out_h, "fake": fake},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
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


def _parse_y4m_header(payload: bytes):
    """YUV4MPEG2 stream header -> (w, h, chroma_w, chroma_h, body_offset)
    or None. Supported colorspaces: C420* (any 4:2:0 siting variant),
    C422, C444, Cmono (chroma_w = chroma_h = 0)."""
    if not payload.startswith(b"YUV4MPEG2"):
        return None
    nl = payload.find(b"\n")
    if nl < 0:
        return None
    w = h = 0
    cs = b"420jpeg"  # spec default
    for tok in payload[9:nl].split(b" "):
        if len(tok) < 2:
            continue
        tag, val = tok[:1], tok[1:]
        try:
            if tag == b"W":
                w = int(val)
            elif tag == b"H":
                h = int(val)
            elif tag == b"C":
                cs = val
        except ValueError:
            return None
    if w <= 0 or h <= 0:
        return None
    if cs.startswith(b"444"):
        cw, ch = w, h
    elif cs.startswith(b"422"):
        cw, ch = (w + 1) // 2, h
    elif cs.startswith(b"420"):
        cw, ch = (w + 1) // 2, (h + 1) // 2
    elif cs.startswith(b"mono"):
        cw = ch = 0
    else:
        return None
    return w, h, cw, ch, nl + 1


def decode_y4m_frames(
    payload: bytes, indices: "list[int] | None" = None
) -> "tuple[int, int, int, list[np.ndarray]] | None":
    """Pure-numpy decode of a YUV4MPEG2 payload.

    Returns ``(n_frames_total, w, h, frames)`` where ``frames`` holds an
    (h, w, 3) uint8 RGB array for each requested frame index (all frames
    when ``indices`` is None; pass ``[]`` to probe the frame count
    without decoding pixels). BT.601 full-range YCbCr -> RGB, chroma
    planes nearest-neighbor upsampled. None when not a y4m payload."""
    hdr = _parse_y4m_header(payload)
    if hdr is None:
        return None
    w, h, cw, ch, off = hdr
    fsz = w * h + 2 * cw * ch
    n = len(payload)
    offsets: list[int] = []
    while off < n:
        if payload[off : off + 5] != b"FRAME":
            break
        nl = payload.find(b"\n", off)
        if nl < 0 or nl + 1 + fsz > n:
            break
        offsets.append(nl + 1)
        off = nl + 1 + fsz
    if not offsets:
        return None
    sel = range(len(offsets)) if indices is None else indices
    frames: list[np.ndarray] = []
    for i in sel:
        if not 0 <= i < len(offsets):
            continue
        o = offsets[i]
        Y = (
            np.frombuffer(payload, np.uint8, w * h, o)
            .reshape(h, w)
            .astype(np.float64)
        )
        if cw == 0:  # mono
            g = np.clip(np.rint(Y), 0, 255).astype(np.uint8)
            frames.append(np.repeat(g[:, :, None], 3, axis=2))
            continue
        U = (
            np.frombuffer(payload, np.uint8, cw * ch, o + w * h)
            .reshape(ch, cw)
            .astype(np.float64)
        )
        V = (
            np.frombuffer(payload, np.uint8, cw * ch, o + w * h + cw * ch)
            .reshape(ch, cw)
            .astype(np.float64)
        )
        ry, rx = -(-h // ch), -(-w // cw)
        U = U.repeat(ry, 0)[:h].repeat(rx, 1)[:, :w] - 128.0
        V = V.repeat(ry, 0)[:h].repeat(rx, 1)[:, :w] - 128.0
        rgb = np.stack(
            [
                Y + 1.402 * V,
                Y - 0.344136 * U - 0.714136 * V,
                Y + 1.772 * U,
            ],
            axis=2,
        )
        frames.append(np.clip(np.rint(rgb), 0, 255).astype(np.uint8))
    return len(offsets), w, h, frames


class SampleFrames:
    """video payload -> N evenly-spaced frames with content hash + mean
    luma. REAL for YUV4MPEG2 payloads (pure-numpy plane decode); other
    containers are stub-gated like DecodeImage (deterministic stand-in
    with ``fake=True``, NotImplementedError otherwise)."""

    def __init__(self, n_frames: int = 4, fake: bool = True):
        self.n_frames = n_frames
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frame_no, frame_hash, luma = [], [], [], []
        k = self.n_frames
        for mid, payload in zip(
            batch.column("media_id").to_pylist(), batch.column("payload").to_pylist()
        ):
            probe = decode_y4m_frames(payload, [])
            if probe is not None:
                total = probe[0]
                # floor-spaced indices: always exactly k rows (repeats
                # when the clip has fewer than k frames)
                idx = [(f * total) // k for f in range(k)]
                _, _, _, frames = decode_y4m_frames(payload, idx)
                for f, img in enumerate(frames):
                    ids.append(mid)
                    frame_no.append(f)
                    frame_hash.append(
                        int.from_bytes(
                            hashlib.sha1(img.tobytes()).digest()[:8], "big"
                        )
                        >> 1
                    )
                    # BT.601 luma of the decoded RGB
                    luma.append(
                        float(
                            img[:, :, 0].mean() * 0.299
                            + img[:, :, 1].mean() * 0.587
                            + img[:, :, 2].mean() * 0.114
                        )
                    )
                continue
            if not self.fake:
                raise NotImplementedError(
                    "payload is not YUV4MPEG2 and real frame sampling of "
                    "compressed video needs ffmpeg, which is not in this "
                    "container; run with fake=True for the stand-in"
                )
            for f in range(k):
                chunk = payload[f::k] or b"\x00"
                ids.append(mid)
                frame_no.append(f)
                frame_hash.append(
                    int.from_bytes(hashlib.sha1(chunk).digest()[:8], "big") >> 1
                )
                luma.append(float(frame_hash[-1] % 256))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_no": pa.array(frame_no, pa.int32()),
                "frame_hash": pa.array(frame_hash, pa.int64()),
                "luma_mean": pa.array(luma, pa.float64()),
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


def decode_wav(payload: bytes) -> tuple[int, np.ndarray] | None:
    """Pure-numpy decode of RIFF/WAVE PCM (8/16-bit int, any channel
    count) -> (sample_rate, float64 samples in [-1, 1], channel-meaned);
    None when the payload is not such a WAV."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    i, n = 12, len(payload)
    fmt = None
    while i + 8 <= n:
        cid = payload[i : i + 4]
        sz = int.from_bytes(payload[i + 4 : i + 8], "little")
        body = payload[i + 8 : i + 8 + sz]
        if cid == b"fmt " and sz >= 16:
            audio_fmt = int.from_bytes(body[0:2], "little")
            n_ch = int.from_bytes(body[2:4], "little")
            rate = int.from_bytes(body[4:8], "little")
            bits = int.from_bytes(body[14:16], "little")
            if audio_fmt != 1 or n_ch == 0 or bits not in (8, 16):
                return None
            fmt = (n_ch, rate, bits)
        elif cid == b"data" and fmt is not None:
            n_ch, rate, bits = fmt
            if bits == 16:
                x = np.frombuffer(
                    body, "<i2", count=len(body) // 2
                ).astype(np.float64) / 32768.0
            else:
                x = (
                    np.frombuffer(body, np.uint8).astype(np.float64) - 128.0
                ) / 128.0
            usable = len(x) - len(x) % n_ch
            return rate, x[:usable].reshape(-1, n_ch).mean(axis=1)
        i += 8 + sz + (sz & 1)  # chunks are word-aligned
    return None


class ExtractAudioFeatures:
    """WAV payload -> duration + per-frame RMS energy / zero-crossing
    features (real for PCM WAV; stub-gated otherwise, like DecodeImage)."""

    def __init__(self, n_frames: int = 8, fake: bool = True):
        self.n_frames = n_frames
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id")
        payloads = batch.column("payload").to_pylist()
        k = self.n_frames
        dur = np.zeros(len(payloads), np.float64)
        feats = np.zeros((len(payloads), k), np.float64)
        zcr = np.zeros(len(payloads), np.float64)
        for i, p in enumerate(payloads):
            got = decode_wav(p)
            if got is None:
                if not self.fake:
                    raise NotImplementedError(
                        "payload is not PCM WAV; compressed audio needs "
                        "ffmpeg, which is not in this container"
                    )
                feats[i] = np.abs(_content_hash_floats(p, k))
                continue
            rate, x = got
            dur[i] = len(x) / max(rate, 1)
            if len(x):
                m = len(x) - len(x) % k
                if m >= k:
                    fr = x[:m].reshape(k, -1)
                    feats[i] = np.sqrt((fr * fr).mean(axis=1))
                zcr[i] = float((np.diff(np.signbit(x)) != 0).mean()) if len(x) > 1 else 0.0
        return pa.table(
            {
                "media_id": ids,
                "duration_sec": pa.array(dur, pa.float64()),
                "zcr": pa.array(zcr, pa.float64()),
                "energy": pa.array(list(feats), pa.list_(pa.float64())),
            }
        )


def extract_audio_features(
    media: rd.Dataset, *, n_frames: int = 8, fake: bool = True,
    concurrency: int | tuple[int, int] = (1, 4), batch_size: int = 32,
) -> rd.Dataset:
    return media.map_batches(
        ExtractAudioFeatures,
        fn_constructor_kwargs={"n_frames": n_frames, "fake": fake},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def wav_media_table(n: int, seed: int = 9) -> pa.Table:
    """REAL 16-bit PCM WAV payloads (deterministic sine + noise mixes)."""
    rng = np.random.Generator(np.random.Philox(key=[seed, 0]))
    ids, payloads = [], []
    for i in range(n):
        rate = 8000
        secs = float(rng.uniform(0.05, 0.3))
        t = np.arange(int(rate * secs)) / rate
        f0 = float(rng.uniform(100, 1500))
        x = 0.6 * np.sin(2 * np.pi * f0 * t) + 0.1 * rng.standard_normal(len(t))
        pcm = (np.clip(x, -1, 1) * 32767).astype("<i2").tobytes()
        hdr = (
            b"RIFF" + (36 + len(pcm)).to_bytes(4, "little") + b"WAVE"
            + b"fmt " + (16).to_bytes(4, "little")
            + (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
            + rate.to_bytes(4, "little") + (rate * 2).to_bytes(4, "little")
            + (2).to_bytes(2, "little") + (16).to_bytes(2, "little")
            + b"data" + len(pcm).to_bytes(4, "little")
        )
        payloads.append(hdr + pcm)
        ids.append(i)
    return pa.table(
        {
            "media_id": pa.array(np.array(ids, np.int64), pa.int64()),
            "mime": pa.array(["audio/wav"] * n, pa.string()),
            "payload": pa.array(payloads, pa.large_binary()),
            "width": pa.array(np.zeros(n, np.int32), pa.int32()),
            "height": pa.array(np.zeros(n, np.int32), pa.int32()),
        },
        schema=MEDIA_SCHEMA,
    )


def encode_y4m(
    frames: "list[tuple[np.ndarray, np.ndarray, np.ndarray]]", w: int, h: int
) -> bytes:
    """Encode (Y, U, V) uint8 plane triples (U/V at 4:2:0 = ceil(w/2) x
    ceil(h/2)) into a YUV4MPEG2 payload."""
    out = [f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C420jpeg\n".encode()]
    for Y, U, V in frames:
        out.append(b"FRAME\n")
        out.append(Y.astype(np.uint8).tobytes())
        out.append(U.astype(np.uint8).tobytes())
        out.append(V.astype(np.uint8).tobytes())
    return b"".join(out)


def y4m_media_table(n: int, seed: int = 11, n_frames: int = 8) -> pa.Table:
    """REAL YUV4MPEG2 payloads: per-clip rolling luma gradient + constant
    seeded chroma, 4:2:0 — exercises the pure-numpy video decode path."""
    rng = np.random.Generator(np.random.Philox(key=[seed, 0]))
    ids, payloads, ws, hs = [], [], [], []
    for i in range(n):
        w = int(rng.integers(8, 25)) * 2  # even dims keep 4:2:0 exact
        h = int(rng.integers(8, 25)) * 2
        base = (
            np.arange(h)[:, None] * 7 + np.arange(w)[None, :] * 3
        ) % 256
        u0 = int(rng.integers(0, 256))
        v0 = int(rng.integers(0, 256))
        frames = []
        for f in range(n_frames):
            Y = np.roll(base, f * 3, axis=1).astype(np.uint8)
            U = np.full(((h + 1) // 2, (w + 1) // 2), u0, np.uint8)
            V = np.full(((h + 1) // 2, (w + 1) // 2), v0, np.uint8)
            frames.append((Y, U, V))
        payloads.append(encode_y4m(frames, w, h))
        ids.append(i)
        ws.append(w)
        hs.append(h)
    return pa.table(
        {
            "media_id": pa.array(np.array(ids, np.int64), pa.int64()),
            "mime": pa.array(["video/x-yuv4mpeg"] * n, pa.string()),
            "payload": pa.array(payloads, pa.large_binary()),
            "width": pa.array(np.array(ws, np.int32), pa.int32()),
            "height": pa.array(np.array(hs, np.int32), pa.int32()),
        },
        schema=MEDIA_SCHEMA,
    )


def ppm_media_table(n: int, seed: int = 5) -> pa.Table:
    """REAL P6 PPM payloads (deterministic gradient + seeded noise
    channel, varying dims) — exercises the pure-numpy decode path."""
    rng = np.random.Generator(np.random.Philox(key=[seed, 0]))
    ids, payloads, ws, hs = [], [], [], []
    for i in range(n):
        w = int(rng.integers(16, 49))
        h = int(rng.integers(16, 49))
        yy, xx = np.mgrid[0:h, 0:w]
        gx = xx * 255.0 / max(w - 1, 1)
        gy = yy * 255.0 / max(h - 1, 1)
        img = np.stack(
            [gx, gy[::-1], rng.integers(0, 256, (h, w))], axis=2
        ).astype(np.uint8)
        payloads.append(f"P6\n{w} {h}\n255\n".encode() + img.tobytes())
        ids.append(i)
        ws.append(w)
        hs.append(h)
    return pa.table(
        {
            "media_id": pa.array(np.array(ids, np.int64), pa.int64()),
            "mime": pa.array(["image/x-portable-pixmap"] * n, pa.string()),
            "payload": pa.array(payloads, pa.large_binary()),
            "width": pa.array(np.array(ws, np.int32), pa.int32()),
            "height": pa.array(np.array(hs, np.int32), pa.int32()),
        },
        schema=MEDIA_SCHEMA,
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


def _ahash64(img: np.ndarray) -> np.uint64:
    """64-bit average-hash: 8x8 grayscale block means, bit set where the
    block mean exceeds the mean of the 64 block means. Robust to
    resizing / mild noise; Hamming distance measures visual change."""
    g = _block_mean(img.mean(axis=2), 8).ravel()
    bits = g > g.mean()
    return np.uint64(np.packbits(bits[::-1]).view(">u8")[0])


class PerceptualHash:
    """payload -> 64-bit aHash. Real for PPM/BMP; non-decodable payloads
    get a deterministic content-hash stand-in with ``fake=True`` (two
    byte-identical payloads still collide exactly), else raise."""

    def __init__(self, fake: bool = True):
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = np.empty(len(batch), np.uint64)
        for i, p in enumerate(batch.column("payload").to_pylist()):
            img = decode_image_array(p)
            if img is not None:
                out[i] = _ahash64(img)
            elif self.fake:
                out[i] = np.frombuffer(
                    hashlib.sha256(p).digest()[:8], dtype=">u8"
                )[0]
            else:
                raise NotImplementedError(
                    "perceptual hash of non-PPM/BMP payloads needs PIL"
                )
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "phash": pa.array(out.astype(np.int64), pa.int64()),
            }
        )


def image_phash(
    media: rd.Dataset, *, fake: bool = True,
    concurrency: int | tuple[int, int] = (1, 4), batch_size: int = 32,
) -> rd.Dataset:
    """-> (media_id, phash): actor-pool perceptual hashing; payloads are
    dropped at the actor so only 16 bytes/row continue downstream."""
    return media.map_batches(
        PerceptualHash,
        fn_constructor_kwargs={"fake": fake},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def phash_dup_pairs(
    media: rd.Dataset, *, max_hamming: int = 3, fake: bool = True,
    concurrency: int | tuple[int, int] = (1, 4), batch_size: int = 32,
) -> rd.Dataset:
    """Visual near-duplicate pairs -> (a, b, hamming): perceptual aHash
    per image, then the generic banded 64-bit-signature join
    (dedup.hash64_band_pairs — recall-complete at <= max_hamming by
    pigeonhole, hot buckets sub-split with logged residue). The image
    payloads never shuffle; only (media_id, phash) rows do."""
    from raylinkgraph.functions.dedup import hash64_band_pairs

    sig = image_phash(
        media, fake=fake, concurrency=concurrency, batch_size=batch_size
    )
    return hash64_band_pairs(
        sig, id_col="media_id", hash_col="phash", max_hamming=max_hamming
    )
