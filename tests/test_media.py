"""Synthetic audio/video fixtures (media.py): the payload bytes must
decode back to the generating formula — that identity is what lets the
driver oracles recompute decoded stats from arithmetic alone."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from equi7grid_spark.media import audio_n_samples, synthetic_audio, synthetic_video, video_dims
from equi7grid_spark.operators.multimodal import (
    audio_stats,
    binary_u8_sum,
    decode_audio_pcm,
    sample_video_frames,
)


def test_audio_bytes_decode_to_formula(spark):
    rows = {r["clip_id"]: r for r in synthetic_audio(spark, 5).collect()}
    for k in range(5):
        r = rows[f"clip{k:08d}"]
        wav = decode_audio_pcm(bytes(r["bytes"]), r["fmt"])
        j = np.arange(audio_n_samples(k))
        expect = ((k * 131 + j * 31) % 4001) - 2000
        assert wav.size == audio_n_samples(k)
        assert (wav == expect).all()


def test_audio_stats_match_numpy(spark):
    out = {r["clip_id"]: r for r in audio_stats(synthetic_audio(spark, 4)).collect()}
    for k in range(4):
        j = np.arange(audio_n_samples(k), dtype=np.float64)
        s = ((k * 131 + j * 31) % 4001) - 2000
        r = out[f"clip{k:08d}"]
        assert r["n_samples"] == s.size
        assert r["peak"] == int(np.abs(s).max())
        assert r["rms"] == np.sqrt(np.mean(s**2))


def test_video_frames_and_u8_sum(spark):
    vids = synthetic_video(spark, 6)
    frames = sample_video_frames(vids, every_n=2).withColumn(
        "px_sum", binary_u8_sum(F.col("bytes"))
    )
    got = {
        (r["video_id"], r["frame_idx"]): r for r in frames.collect()
    }
    for k in range(6):
        w, h, nf = video_dims(k)
        sampled = list(range(0, nf, 2))
        for f in sampled:
            r = got[(f"vid{k:06d}", f)]
            rr = np.arange(h)[:, None]
            cc = np.arange(w)[None, :]
            px = (k * 7 + f * 13 + rr * 31 + cc * 17) % 251
            assert (r["w"], r["h"]) == (w, h)
            assert r["px_sum"] == int(px.sum())
        # no unsampled frame leaked through
        assert all(
            fi in sampled for (vid, fi) in got if vid == f"vid{k:06d}"
        )
