"""Deterministic synthetic audio/video tables (FIXTURES.md §1 family).

The audio/video modality is environment-stubbed at the CODEC level
(operators/multimodal.py: no audio/video container libraries exist
offline; 'fake-pcm' / 'fake-frames' are raw little-endian payloads
exercising the identical mapInPandas plumbing). The fixtures here make
that modality DRIVER-ORACLE-ABLE: every byte is a pure function of
(clip index, sample/pixel position) in small-integer arithmetic, so
DuckDB can recompute the decoded stats straight from the formula while
Spark runs the real bytes -> decode -> aggregate path — the comparison
then certifies the encode/decode roundtrip AND the stats arithmetic.

Audio clip k (fmt 'fake-pcm', mono int16 LE):
  n_samples(k) = 500 + (k*7919) % 1500
  sample(k, j) = ((k*131 + j*31) % 4001) - 2000

Video k (fmt 'fake-frames', concatenated row-major uint8 w*h frames):
  w(k) = 8 + k % 5;  h(k) = 8 + k % 7;  n_frames(k) = 4 + k % 5
  pixel(k, f, r, c) = (k*7 + f*13 + r*31 + c*17) % 251

All sums stay far inside 2^53, so double division / sqrt downstream is
a single correctly-rounded IEEE operation on both engines (no libm).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

AUDIO_SCHEMA = "clip_id string, bytes binary, fmt string"
VIDEO_SCHEMA = "video_id string, bytes binary, fmt string, w int, h int"


def audio_n_samples(k: int) -> int:
    return 500 + (k * 7919) % 1500


def synthetic_audio(
    spark: SparkSession, n: int, *, partitions: int | None = None
) -> DataFrame:
    """Distributed deterministic audio-clips table of `n` rows."""
    parts = partitions or spark.sparkContext.defaultParallelism * 2

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ks = pdf["id"].to_numpy()
            ids = np.array([f"clip{int(k):08d}" for k in ks], dtype=object)
            data = np.empty(len(ks), dtype=object)
            for i, k in enumerate(ks):
                k = int(k)
                j = np.arange(audio_n_samples(k), dtype=np.int64)
                s = ((k * 131 + j * 31) % 4001) - 2000
                data[i] = s.astype("<i2").tobytes()
            yield pd.DataFrame(
                {
                    "clip_id": ids,
                    "bytes": pd.Series(data, dtype=object),
                    "fmt": np.full(len(ks), "fake-pcm", dtype=object),
                }
            )

    return spark.range(0, n, numPartitions=parts).mapInPandas(
        gen, schema=AUDIO_SCHEMA
    )


def video_dims(k: int) -> tuple[int, int, int]:
    """(w, h, n_frames) of video k."""
    return 8 + k % 5, 8 + k % 7, 4 + k % 5


def synthetic_video(
    spark: SparkSession, n: int, *, partitions: int | None = None
) -> DataFrame:
    """Distributed deterministic video table of `n` rows."""
    parts = partitions or spark.sparkContext.defaultParallelism * 2

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ks = pdf["id"].to_numpy()
            m = len(ks)
            ids = np.array([f"vid{int(k):06d}" for k in ks], dtype=object)
            data = np.empty(m, dtype=object)
            ws = np.empty(m, dtype=np.int32)
            hs = np.empty(m, dtype=np.int32)
            for i, k in enumerate(ks):
                k = int(k)
                w, h, nf = video_dims(k)
                f = np.arange(nf, dtype=np.int64)[:, None, None]
                r = np.arange(h, dtype=np.int64)[None, :, None]
                c = np.arange(w, dtype=np.int64)[None, None, :]
                frames = ((k * 7 + f * 13 + r * 31 + c * 17) % 251).astype(
                    np.uint8
                )
                data[i] = frames.tobytes()
                ws[i], hs[i] = w, h
            yield pd.DataFrame(
                {
                    "video_id": ids,
                    "bytes": pd.Series(data, dtype=object),
                    "fmt": np.full(m, "fake-frames", dtype=object),
                    "w": ws,
                    "h": hs,
                }
            )

    return spark.range(0, n, numPartitions=parts).mapInPandas(
        gen, schema=VIDEO_SCHEMA
    )
