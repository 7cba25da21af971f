"""AVI/MJPEG frame decode (engine/pipeline/avimjpeg.py): fixture
encoder → decoder roundtrips (pixel-weighted means vs numpy, the
per-frame timeline, grayscale, restart markers), header-parse
dims/duration, the Spark deep-decode dispatch, and rejection of
non-MJPEG AVIs, truncation, malformed nesting and undecodable
frames."""

import struct

import numpy as np
import pytest

from engine.pipeline.avimjpeg import (decode_avi_frame_stats,
                                      decode_avi_mjpeg,
                                      encode_avi_mjpeg)
from engine.pipeline.multimodal import parse_media_header

RNG = np.random.default_rng(5)


def blocky_frames(n, bh=3, bw=4):
    out = []
    for _ in range(n):
        blocks = RNG.integers(0, 256, (bh, bw, 3))
        out.append(np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1)
                   .astype(np.uint8))
    return out


FRAMES = blocky_frames(6)
AVI = encode_avi_mjpeg(FRAMES, fps=10)


def test_roundtrip_weighted_means_and_meta():
    d = decode_avi_mjpeg(AVI)
    true = np.stack(FRAMES).reshape(-1, 3).mean(axis=0)
    assert (d["width"], d["height"]) == (32, 24)
    assert d["n_frames"] == 6 and d["fps"] == 10.0
    assert d["duration_ms"] == 600
    assert d["n_pixels"] == 6 * 32 * 24
    for ch, t in zip(("mean_r", "mean_g", "mean_b"), true):
        # DC quantization rounds per-block YCbCr means to integers
        assert abs(d[ch] - t) < 1.0, (ch, d[ch], t)


def test_per_frame_timeline():
    fs = decode_avi_frame_stats(AVI)
    assert [f["frame_idx"] for f in fs] == list(range(6))
    assert [f["t_ms"] for f in fs] == [0, 100, 200, 300, 400, 500]
    for f, img in zip(fs, FRAMES):
        true = img.reshape(-1, 3).mean(axis=0)
        assert f["n_pixels"] == 768
        for ch, t in zip(("mean_r", "mean_g", "mean_b"), true):
            assert abs(f[ch] - t) < 1.0


def test_grayscale_and_restart_markers():
    gray = [np.full((16, 16), 100, dtype=np.uint8)] * 3
    d = decode_avi_mjpeg(encode_avi_mjpeg(gray, fps=5))
    assert d["n_frames"] == 3 and d["mean_r"] == 100.0
    rst = decode_avi_mjpeg(encode_avi_mjpeg(FRAMES, fps=10,
                                            restart_interval=2))
    assert rst == decode_avi_mjpeg(AVI)


def test_header_parse():
    assert parse_media_header(AVI) == {"width": 32, "height": 24,
                                       "duration_ms": 600}


def test_rejects_non_avi_truncation_and_non_mjpeg():
    assert decode_avi_mjpeg(b"RIFF\x08\x00\x00\x00WAVEdata") is None
    assert decode_avi_mjpeg(b"not a riff at all") is None
    for cut in (10, 60, len(AVI) // 2):
        assert decode_avi_mjpeg(AVI[:cut]) is None
    # same container, stream handler+compression rewritten to raw DIB
    bad = AVI.replace(b"MJPG", b"DIB ")
    assert decode_avi_mjpeg(bad) is None


def test_rejects_undecodable_frame():
    # truncate the first frame chunk's JPEG to a bare SOI marker: the
    # chunk walk stays valid but the frame decode fails
    movi_at = AVI.index(b"00dc")
    (flen,) = struct.unpack("<I", AVI[movi_at + 4:movi_at + 8])
    bad = (AVI[:movi_at + 4] + struct.pack("<I", flen)
           + b"\xff\xd8" + b"\x00" * (flen - 2)
           + AVI[movi_at + 8 + flen + (flen & 1):])
    assert decode_avi_mjpeg(bad) is None


def test_decode_video_frames_spark(spark):
    from engine.pipeline.multimodal import decode_video_frames
    df = spark.createDataFrame(
        [(7, bytearray(AVI)), (8, bytearray(b"not video"))],
        "media_id long, payload binary")
    rows = decode_video_frames(df).orderBy("frame_idx").collect()
    assert len(rows) == 6                   # non-video yields no rows
    assert [r["t_ms"] for r in rows] == [0, 100, 200, 300, 400, 500]
    assert all(r["media_id"] == 7 and (r["width"], r["height"])
               == (32, 24) for r in rows)
    true0 = FRAMES[0].reshape(-1, 3).mean(axis=0)
    assert abs(rows[0]["mean_r"] - true0[0]) < 1.0


def test_deep_feature_dispatch_avi(spark):
    from engine.pipeline.multimodal import extract_deep_features
    df = spark.createDataFrame([(7, bytearray(AVI))],
                               "media_id long, payload binary")
    row = extract_deep_features(df).collect()[0]
    assert row["kind"] == "avi_mjpeg"
    assert (row["width"], row["height"]) == (32, 24)
    assert row["n_pixels"] == 6 * 32 * 24
    true = np.stack(FRAMES).reshape(-1, 3).mean(axis=0)
    assert abs(row["mean_r"] - true[0]) < 1.0
