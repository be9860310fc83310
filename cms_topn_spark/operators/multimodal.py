"""Multimodal (image / audio / video) columns as opaque binary + typed metadata.

The Spark-side plumbing is real and tested: schema convention, Arrow batch
shapes, ``mapInArrow`` UDF signatures, partition preservation, and the
numpy feature/resize/frame-sample math. The *codec* is the only stub: this
container ships no image/audio libraries, so decode dispatches on mime —

- ``x-fake/*`` (the deterministic synthetic format below) decodes for real,
- real formats (image/jpeg, audio/wav, …) use Pillow/soundfile when
  importable and raise ``NotImplementedError`` otherwise (clearly marked).

Schema convention for a media column group:

    media   BINARY      -- encoded payload
    mime    STRING      -- dispatch key
    width   INT, height INT, n_frames INT   -- typed metadata

The fake format: ``b"FIMG" | u16 w | u16 h | seed u64`` — pixels are
splitmix64-generated from (seed, pixel index), so decode is deterministic,
content-addressed, and cheap; exactly what the plumbing tests need.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession

from ..sources.webpages import _splitmix64

_IMG = struct.Struct("<4sHHQ")
MAGIC_IMG = b"FIMG"
MAGIC_VID = b"FVID"
_VID = struct.Struct("<4sHHHQ")  # magic, w, h, n_frames, seed

MEDIA_SCHEMA = "media_id long, media binary, mime string, width int, height int, n_frames int"


def encode_fake_image(w: int, h: int, seed: int) -> bytes:
    return _IMG.pack(MAGIC_IMG, w, h, seed)


def encode_fake_video(w: int, h: int, n_frames: int, seed: int) -> bytes:
    return _VID.pack(MAGIC_VID, w, h, n_frames, seed)


def decode_image(payload: bytes, mime: str) -> np.ndarray:
    """→ (h, w, 3) uint8. Real decode for the fake format; gated imports for
    real formats; NotImplementedError when the codec library is absent."""
    if mime == "x-fake/image":
        magic, w, h, seed = _IMG.unpack_from(payload, 0)
        if magic != MAGIC_IMG:
            raise ValueError("bad fake-image payload")
        idx = np.arange(h * w * 3, dtype=np.int64) + (seed << 1)
        return (_splitmix64(idx) % np.uint64(256)).astype(np.uint8).reshape(h, w, 3)
    try:  # pragma: no cover - library not in this container
        import io

        from PIL import Image

        return np.asarray(Image.open(io.BytesIO(payload)).convert("RGB"))
    except ImportError as e:  # clearly-marked stub boundary
        raise NotImplementedError(
            f"decoding {mime} requires Pillow, which is not installed; "
            "only x-fake/image decodes in this environment"
        ) from e


def decode_video_frames(payload: bytes, mime: str, every: int = 1) -> np.ndarray:
    """→ (n_sampled, h, w, 3) uint8, frames [0, every, 2*every, ...]."""
    if mime == "x-fake/video":
        magic, w, h, n_frames, seed = _VID.unpack_from(payload, 0)
        if magic != MAGIC_VID:
            raise ValueError("bad fake-video payload")
        frames = []
        for f in range(0, n_frames, every):
            idx = np.arange(h * w * 3, dtype=np.int64) + ((seed + f) << 1)
            frames.append(
                (_splitmix64(idx) % np.uint64(256)).astype(np.uint8).reshape(h, w, 3)
            )
        return np.stack(frames) if frames else np.empty((0, h, w, 3), np.uint8)
    raise NotImplementedError(
        f"decoding {mime} requires a video codec library, not installed here"
    )


def synthesize_media(spark: SparkSession, n: int, partitions: int = 4) -> DataFrame:
    """Deterministic media table: 3/4 images, 1/4 videos, sizes from the id."""

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for rb in batches:
            ids = rb.column(0).to_numpy()
            w = (16 + _splitmix64(ids * 3 + 1) % np.uint64(48)).astype(np.int32)
            h = (16 + _splitmix64(ids * 3 + 2) % np.uint64(48)).astype(np.int32)
            is_vid = (_splitmix64(ids * 3 + 3) % np.uint64(4)) == 0
            nf = np.where(is_vid, 4 + (_splitmix64(ids * 3 + 4) % np.uint64(12)), 1).astype(
                np.int32
            )
            payloads, mimes = [], []
            for i, vid in enumerate(is_vid):
                if vid:
                    payloads.append(
                        encode_fake_video(int(w[i]), int(h[i]), int(nf[i]), int(ids[i]))
                    )
                    mimes.append("x-fake/video")
                else:
                    payloads.append(encode_fake_image(int(w[i]), int(h[i]), int(ids[i])))
                    mimes.append("x-fake/image")
            yield pa.RecordBatch.from_pydict(
                {
                    "media_id": pa.array(ids, pa.int64()),
                    "media": pa.array(payloads, pa.binary()),
                    "mime": pa.array(mimes, pa.string()),
                    "width": pa.array(w, pa.int32()),
                    "height": pa.array(h, pa.int32()),
                    "n_frames": pa.array(nf, pa.int32()),
                }
            )

    return spark.range(0, n, 1, partitions).mapInArrow(fn, MEDIA_SCHEMA)


def resize_nn(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize (real math, no codec needed)."""
    h, w = img.shape[:2]
    ys = (np.arange(out_h) * h // out_h).astype(np.int64)
    xs = (np.arange(out_w) * w // out_w).astype(np.int64)
    return img[ys][:, xs]


def image_features(df: DataFrame, hist_bins: int = 8) -> DataFrame:
    """Per-image feature vector: channel means/stds + grey histogram.

    mapInArrow over (media_id, media, mime); videos contribute frame 0.
    Output: (media_id, features array<double>) — feeds the ANN operators."""

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for rb in batches:
            ids = rb.column(0).to_numpy()
            payloads = rb.column(1)
            mimes = rb.column(2).to_pylist()
            feats = []
            for i in range(len(ids)):
                payload = payloads[i].as_py()
                mime = mimes[i]
                if mime == "x-fake/video":
                    img = decode_video_frames(payload, mime, every=10**9)[0]
                else:
                    img = decode_image(payload, mime)
                fl = img.astype(np.float64)
                grey = fl.mean(axis=2)
                hist, _ = np.histogram(grey, bins=hist_bins, range=(0, 256))
                feats.append(
                    np.concatenate(
                        [fl.mean(axis=(0, 1)) / 255.0, fl.std(axis=(0, 1)) / 255.0,
                         hist / max(grey.size, 1)]
                    )
                )
            yield pa.RecordBatch.from_pydict(
                {
                    "media_id": pa.array(ids, pa.int64()),
                    "features": pa.array([f.tolist() for f in feats], pa.list_(pa.float64())),
                }
            )

    return df.select("media_id", "media", "mime").mapInArrow(
        fn, "media_id long, features array<double>"
    )


def resize_images(df: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Decode → nearest-neighbor resize → re-encode raw RGB; schema-stable."""

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for rb in batches:
            ids = rb.column(0).to_numpy()
            payloads = rb.column(1)
            mimes = rb.column(2).to_pylist()
            out = []
            for i in range(len(ids)):
                img = decode_image(payloads[i].as_py(), mimes[i])
                out.append(resize_nn(img, out_w, out_h).tobytes())
            yield pa.RecordBatch.from_pydict(
                {
                    "media_id": pa.array(ids, pa.int64()),
                    "media": pa.array(out, pa.binary()),
                    "mime": pa.array(["x-raw/rgb8"] * len(ids), pa.string()),
                    "width": pa.array([out_w] * len(ids), pa.int32()),
                    "height": pa.array([out_h] * len(ids), pa.int32()),
                    "n_frames": pa.array([1] * len(ids), pa.int32()),
                }
            )

    return df.select("media_id", "media", "mime").where(df.mime == "x-fake/image").mapInArrow(
        fn, MEDIA_SCHEMA
    )


def sample_frames(df: DataFrame, every: int = 2) -> DataFrame:
    """Frame sampling for video rows: one output row per kept frame."""

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for rb in batches:
            ids = rb.column(0).to_numpy()
            payloads = rb.column(1)
            mimes = rb.column(2).to_pylist()
            out_ids, out_frame, out_media, w_, h_ = [], [], [], [], []
            for i in range(len(ids)):
                frames = decode_video_frames(payloads[i].as_py(), mimes[i], every=every)
                for fidx in range(frames.shape[0]):
                    out_ids.append(int(ids[i]))
                    out_frame.append(fidx * every)
                    out_media.append(frames[fidx].tobytes())
                    h_.append(frames.shape[1])
                    w_.append(frames.shape[2])
            yield pa.RecordBatch.from_pydict(
                {
                    "media_id": pa.array(out_ids, pa.int64()),
                    "frame_no": pa.array(out_frame, pa.int32()),
                    "media": pa.array(out_media, pa.binary()),
                    "width": pa.array(w_, pa.int32()),
                    "height": pa.array(h_, pa.int32()),
                }
            )

    return df.where(df.mime == "x-fake/video").select("media_id", "media", "mime").mapInArrow(
        fn, "media_id long, frame_no int, media binary, width int, height int"
    )
