"""Multimodal column operators: decode / resize / feature-extract /
frame-sample over opaque binary payload columns.

Image ops are fully real (engine codecs, warp/codecs.py). Audio/video
decode is STUBBED per SURVEY.md §7.4 — no audio/video libraries exist
in this environment — but the Spark-side plumbing (schema, batching,
UDF signatures) is real and tested: a deterministic fake decoder
(`fake-pcm` / `fake-frames` formats, raw little-endian payloads)
exercises the identical path; any real container format raises
NotImplementedError.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from equi7grid_spark.warp.codecs import decode, encode

IMAGE_STATS_SCHEMA = (
    "image_id string, fmt string, w int, h int, "
    "px_mean double, px_std double, px_min int, px_max int"
)


def image_stats(images: DataFrame) -> DataFrame:
    """Decode every image and emit per-image pixel statistics."""

    def go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # decode of variable-size binaries is inherently per-row; the
        # iteration is zip over .values (iterrows costs ~10x more)
        for pdf in batches:
            n = len(pdf)
            mean = np.empty(n)
            std = np.empty(n)
            lo = np.empty(n, dtype=np.int32)
            hi = np.empty(n, dtype=np.int32)
            it = zip(
                pdf["bytes"].to_numpy(object),
                pdf["fmt"].to_numpy(object),
                pdf["w"].to_numpy(),
                pdf["h"].to_numpy(),
            )
            for i, (b, f, w, h) in enumerate(it):
                arr = decode(b, f, int(w), int(h))
                mean[i] = arr.mean()
                std[i] = arr.std()
                lo[i] = arr.min()
                hi[i] = arr.max()
            yield pd.DataFrame(
                {
                    "image_id": pdf["image_id"].to_numpy(object),
                    "fmt": pdf["fmt"].to_numpy(object),
                    "w": pdf["w"].to_numpy(np.int32),
                    "h": pdf["h"].to_numpy(np.int32),
                    "px_mean": mean,
                    "px_std": std,
                    "px_min": lo,
                    "px_max": hi,
                }
            )

    return images.select("image_id", "bytes", "fmt", "w", "h").mapInPandas(
        go, schema=IMAGE_STATS_SCHEMA
    )


def resize_images(images: DataFrame, out_w: int, out_h: int, out_fmt: str = "raw") -> DataFrame:
    """Nearest-neighbor resize of every image to (out_w, out_h)."""
    schema = "image_id string, bytes binary, w int, h int, fmt string"

    def go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = np.empty(len(pdf), dtype=object)
            it = zip(
                pdf["bytes"].to_numpy(object),
                pdf["fmt"].to_numpy(object),
                pdf["w"].to_numpy(),
                pdf["h"].to_numpy(),
            )
            for i, (b, f, w, h) in enumerate(it):
                arr = decode(b, f, int(w), int(h))
                h2, w2 = arr.shape
                ri = np.minimum((np.arange(out_h) * h2) // out_h, h2 - 1)
                ci = np.minimum((np.arange(out_w) * w2) // out_w, w2 - 1)
                out[i] = encode(arr[ri[:, None], ci[None, :]], out_fmt)
            yield pd.DataFrame(
                {
                    "image_id": pdf["image_id"].to_numpy(object),
                    "bytes": out,
                    "w": np.full(len(pdf), out_w, dtype=np.int32),
                    "h": np.full(len(pdf), out_h, dtype=np.int32),
                    "fmt": np.full(len(pdf), out_fmt, dtype=object),
                }
            )

    return images.select("image_id", "bytes", "fmt", "w", "h").mapInPandas(go, schema=schema)


def image_histogram_features(images: DataFrame, n_bins: int = 16) -> DataFrame:
    """Per-image normalized intensity histogram as array<double> — a
    deterministic stand-in embedding for similarity search."""
    schema = "image_id string, features array<double>"

    def go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = np.empty(len(pdf), dtype=object)
            it = zip(
                pdf["bytes"].to_numpy(object),
                pdf["fmt"].to_numpy(object),
                pdf["w"].to_numpy(),
                pdf["h"].to_numpy(),
            )
            for i, (b, f, w, h) in enumerate(it):
                arr = decode(b, f, int(w), int(h))
                # bincount on the uint8 ravel beats np.histogram ~5x here
                counts = np.bincount(arr.ravel(), minlength=256)
                hist = counts.reshape(n_bins, 256 // n_bins).sum(axis=1)
                feats[i] = (hist / max(1, arr.size)).astype(np.float64).tolist()
            yield pd.DataFrame(
                {"image_id": pdf["image_id"].to_numpy(object), "features": feats}
            )

    return images.select("image_id", "bytes", "fmt", "w", "h").mapInPandas(go, schema=schema)


def decode_audio_pcm(data: bytes, fmt: str) -> np.ndarray:
    """STUB: real audio containers unsupported offline; `fake-pcm` is
    raw little-endian int16 mono exercising the same path."""
    if fmt == "fake-pcm":
        return np.frombuffer(data, dtype="<i2")
    raise NotImplementedError(
        f"audio format {fmt!r}: no audio codecs in this environment "
        "(stubbed per SURVEY.md §7.4; use 'fake-pcm')"
    )


def audio_stats(audio: DataFrame) -> DataFrame:
    """Per-clip RMS/peak over the (stub-)decoded waveform."""
    schema = "clip_id string, n_samples long, rms double, peak int"

    def go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            n_samples = np.empty(n, dtype=np.int64)
            rms = np.empty(n)
            peak = np.empty(n, dtype=np.int32)
            it = zip(pdf["bytes"].to_numpy(object), pdf["fmt"].to_numpy(object))
            for i, (b, f) in enumerate(it):
                wav = decode_audio_pcm(b, f).astype(np.float64)
                n_samples[i] = wav.size
                rms[i] = np.sqrt(np.mean(wav**2)) if wav.size else 0.0
                peak[i] = np.abs(wav).max() if wav.size else 0
            yield pd.DataFrame(
                {
                    "clip_id": pdf["clip_id"].to_numpy(object),
                    "n_samples": n_samples,
                    "rms": rms,
                    "peak": peak,
                }
            )

    return audio.select("clip_id", "bytes", "fmt").mapInPandas(go, schema=schema)


def sample_video_frames(video: DataFrame, every_n: int = 2) -> DataFrame:
    """STUB frame sampler: `fake-frames` payloads are concatenated raw
    uint8 w*h frames; real containers raise NotImplementedError. Emits
    one row per sampled frame (the UDTF-shaped explode)."""
    schema = "video_id string, frame_idx int, bytes binary, w int, h int"

    def go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vids, idxs, frames, ws, hs = [], [], [], [], []
            it = zip(
                pdf["video_id"].to_numpy(object),
                pdf["bytes"].to_numpy(object),
                pdf["fmt"].to_numpy(object),
                pdf["w"].to_numpy(),
                pdf["h"].to_numpy(),
            )
            for vid, b, f, w, h in it:
                if f != "fake-frames":
                    raise NotImplementedError(
                        f"video format {f!r}: no video codecs in this "
                        "environment (stubbed per SURVEY.md §7.4)"
                    )
                w, h = int(w), int(h)
                frame_sz = w * h
                n_frames = len(b) // frame_sz
                for k in range(0, n_frames, every_n):
                    vids.append(vid)
                    idxs.append(k)
                    frames.append(b[k * frame_sz : (k + 1) * frame_sz])
                    ws.append(w)
                    hs.append(h)
            yield pd.DataFrame(
                {
                    "video_id": pd.array(vids, dtype=object),
                    "frame_idx": np.asarray(idxs, dtype=np.int32),
                    "bytes": pd.array(frames, dtype=object),
                    "w": np.asarray(ws, dtype=np.int32),
                    "h": np.asarray(hs, dtype=np.int32),
                }
            )

    return video.select("video_id", "bytes", "fmt", "w", "h").mapInPandas(go, schema=schema)


def binary_u8_sum(col):
    """long Column: sum of a binary column's bytes as uint8 — the
    vectorized reduce over raw frame payloads (one Arrow batch pass,
    np.frombuffer + sum per row; no per-byte Python)."""
    from pyspark.sql import functions as F

    @F.pandas_udf("long")
    def _sum(b: pd.Series) -> pd.Series:
        return pd.Series(
            [
                int(np.frombuffer(v, dtype=np.uint8).sum()) if v is not None else None
                for v in b.to_numpy(object)
            ],
            dtype="Int64",
        )

    return _sum(col)


_DCT32 = None


def _dct32() -> np.ndarray:
    """Orthonormal 32-point DCT-II basis (float64, deterministic)."""
    global _DCT32
    if _DCT32 is None:
        n = np.arange(32)
        k = np.arange(32)[:, None]
        c = np.sqrt(2.0 / 32) * np.cos(np.pi * (2 * n[None, :] + 1) * k / 64.0)
        c[0] *= 1.0 / np.sqrt(2.0)
        _DCT32 = c
    return _DCT32


def phash64(arr: np.ndarray) -> int:
    """64-bit perceptual hash of one grayscale image: NN-resample to
    32x32, 2D DCT-II, keep the 8x8 low-frequency block, threshold every
    coefficient at the median of the 63 non-DC coefficients. Calibrated
    on the engine codecs: q8 requantization (~2 LSB) moves the hash by
    <=2 bits while distinct synthetic images differ by >=12
    (tests/test_phash_dedup.py)."""
    h2, w2 = arr.shape
    ri = np.minimum((np.arange(32) * h2) // 32, h2 - 1)
    ci = np.minimum((np.arange(32) * w2) // 32, w2 - 1)
    a = arr[ri[:, None], ci[None, :]].astype(np.float64)
    c = _dct32()
    block = (c @ a @ c.T)[:8, :8].ravel()
    med = np.median(block[1:])
    bits = np.flatnonzero(block > med)
    v = 0
    for i in bits:
        v |= 1 << int(i)
    return v - (1 << 64) if v >= 1 << 63 else v


def compute_phash(images: DataFrame) -> DataFrame:
    """(image_id, phash) from pixel content — the input side of
    dedup.phash_near_dup, completing the bytes -> phash -> banded
    near-dup image-dedup pipeline.

    Decode is per-row (variable-size binaries); the DCT runs as ONE
    batched tensor contraction over the whole Arrow batch (the
    per-image 32x32 resamples stack into (K,32,32) and both DCT
    matmuls apply batch-wide) — same vectorize-the-kernel shape as the
    LSH banding pass (queries.py embedding_near_dup)."""
    schema = "image_id string, phash long"

    def go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        c = _dct32()
        grid = np.arange(32)
        for pdf in batches:
            k = len(pdf)
            stack = np.empty((k, 32, 32), dtype=np.float64)
            it = zip(
                pdf["bytes"].to_numpy(object),
                pdf["fmt"].to_numpy(object),
                pdf["w"].to_numpy(),
                pdf["h"].to_numpy(),
            )
            for i, (b, f, w, h) in enumerate(it):
                arr = decode(b, f, int(w), int(h))
                h2, w2 = arr.shape
                ri = np.minimum((grid * h2) // 32, h2 - 1)
                ci = np.minimum((grid * w2) // 32, w2 - 1)
                stack[i] = arr[ri[:, None], ci[None, :]]
            # batched 2D DCT: (K,32,32) -> (K,8,8) low-frequency blocks.
            # Same contraction ORDER as the scalar phash64 (c @ a @ c.T)
            # so both paths agree bit-for-bit even on knife-edge
            # median comparisons.
            d = np.matmul(np.matmul(c[None, :, :], stack), c.T[None, :, :])
            blocks = d[:, :8, :8].reshape(k, 64)
            med = np.median(blocks[:, 1:], axis=1)
            bits = blocks > med[:, None]
            weights = (np.uint64(1) << np.arange(64, dtype=np.uint64))
            ph = (bits.astype(np.uint64) * weights[None, :]).sum(axis=1)
            yield pd.DataFrame(
                {
                    "image_id": pdf["image_id"].to_numpy(object),
                    "phash": ph.astype(np.int64),
                }
            )

    return images.select("image_id", "bytes", "fmt", "w", "h").mapInPandas(
        go, schema=schema
    )


def transcode_images(images: DataFrame, out_fmt: str) -> DataFrame:
    """Re-encode every image to `out_fmt` at its native size (decode ->
    encode; q8 is the lossy path, ~2 LSB). Pixel dims pass through."""
    schema = "image_id string, bytes binary, w int, h int, fmt string"

    def go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = np.empty(len(pdf), dtype=object)
            it = zip(
                pdf["bytes"].to_numpy(object),
                pdf["fmt"].to_numpy(object),
                pdf["w"].to_numpy(),
                pdf["h"].to_numpy(),
            )
            for i, (b, f, w, h) in enumerate(it):
                out[i] = encode(decode(b, f, int(w), int(h)), out_fmt)
            yield pd.DataFrame(
                {
                    "image_id": pdf["image_id"].to_numpy(object),
                    "bytes": out,
                    "w": pdf["w"].to_numpy(np.int32),
                    "h": pdf["h"].to_numpy(np.int32),
                    "fmt": np.full(len(pdf), out_fmt, dtype=object),
                }
            )

    return images.select("image_id", "bytes", "fmt", "w", "h").mapInPandas(
        go, schema=schema
    )
