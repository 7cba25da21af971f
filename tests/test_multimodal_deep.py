"""Real deep decode for raw containers — 24-bit BMP pixels and
16-bit PCM WAV samples — plus the mixed-batch dispatch incl. the
pure-Python PNG path (engine/pipeline/multimodal.py)."""

import math
import struct

import pytest

from engine.pipeline.multimodal import (decode_bmp_pixels,
                                        decode_wav_samples,
                                        extract_deep_features)


def make_bmp(pixels_topdown):
    """Spec-constructed 24-bit BI_RGB BMP from [[(r,g,b)...] rows],
    written bottom-up with 4-byte row padding (the standard layout)."""
    h = len(pixels_topdown)
    w = len(pixels_topdown[0])
    row_bytes = (w * 3 + 3) & ~3
    data = bytearray()
    for row in reversed(pixels_topdown):          # bottom-up storage
        rb = bytearray()
        for (r, g, b) in row:
            rb += bytes([b, g, r])                # BGR order
        rb += b"\x00" * (row_bytes - len(rb))
        data += rb
    header = (b"BM"
              + struct.pack("<IHHI", 54 + len(data), 0, 0, 54)
              + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                            len(data), 2835, 2835, 0, 0))
    return bytes(header + data)


def make_wav(samples, rate=8000, channels=1):
    data = b"".join(struct.pack("<h", s) for s in samples)
    fmt = struct.pack("<HHIIHH", 1, channels, rate,
                      rate * channels * 2, channels * 2, 16)
    body = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


PIXELS = [
    [(255, 0, 0), (0, 255, 0), (0, 0, 255)],   # top row
    [(10, 20, 30), (40, 50, 60), (70, 80, 90)],
]
SAMPLES = [0, 16384, -16384, 32767, -32768, 0]


def test_bmp_pixel_decode_exact():
    got = decode_bmp_pixels(make_bmp(PIXELS))
    assert (got["width"], got["height"], got["n_pixels"]) == (3, 2, 6)
    flat = [c for row in PIXELS for c in row]
    for i, ch in enumerate(("mean_r", "mean_g", "mean_b")):
        want = sum(p[i] for p in flat) / 6.0
        assert got[ch] == pytest.approx(want, abs=1e-12), ch


def test_bmp_rejects_undecodable_flavors():
    assert decode_bmp_pixels(b"BM" + b"\x00" * 60) is None  # bpp 0
    bmp = bytearray(make_bmp(PIXELS))
    bmp[30] = 1                                   # compression = RLE8
    assert decode_bmp_pixels(bytes(bmp)) is None
    assert decode_bmp_pixels(make_bmp(PIXELS)[:40]) is None  # truncated


def test_wav_sample_decode_exact():
    got = decode_wav_samples(make_wav(SAMPLES))
    assert got["sample_rate"] == 8000
    assert got["n_samples"] == len(SAMPLES)
    norm = [s / 32768.0 for s in SAMPLES]
    rms = math.sqrt(sum(x * x for x in norm) / len(norm))
    assert got["rms"] == pytest.approx(rms, abs=1e-12)
    assert got["peak"] == pytest.approx(max(abs(x) for x in norm), abs=1e-12)


def test_wav_rejects_non_pcm():
    wav = bytearray(make_wav(SAMPLES))
    wav[20] = 3                                   # IEEE float format
    assert decode_wav_samples(bytes(wav)) is None


def test_extract_deep_features_mixed_batch(spark):
    import numpy as np

    from engine.pipeline.giflzw import encode_gif
    from engine.pipeline.pngpix import encode_png

    png_arr = np.arange(4 * 3 * 3, dtype=np.uint8).reshape(4, 3, 3)
    gif_pal = np.array([[10, 20, 30], [200, 100, 0]], dtype=np.uint8)
    gif_idx = np.array([[0, 1], [1, 1]], dtype=np.uint8)
    rows = [
        (1, "image", make_bmp(PIXELS), "image/bmp"),
        (2, "audio", make_wav(SAMPLES), "audio/wav"),
        (3, "video", b"\x00\x00\x00\x18ftypmp42" + b"\x00" * 64,
         "video/mp4"),
        (4, "image", encode_png(png_arr, 2, interlace=1), "image/png"),
        (5, "image", encode_gif(gif_idx, gif_pal), "image/gif"),
    ]
    media = spark.createDataFrame(
        rows, "media_id long, modality string, payload binary, "
              "mime string")
    got = {r["media_id"]: r
           for r in extract_deep_features(media).collect()}
    assert got[1]["kind"] == "bmp_pixels"
    assert got[1]["n_pixels"] == 6
    assert got[1]["mean_r"] == pytest.approx(
        sum(p[0] for row in PIXELS for p in row) / 6.0, abs=1e-12)
    assert got[2]["kind"] == "wav_pcm"
    assert got[2]["n_samples"] == len(SAMPLES)
    # video stays the documented stub gap...
    assert got[3]["kind"] == "stub"
    assert got[3]["rms"] is None
    # ...but PNG now decodes for real — incl. Adam7 (r5, pngpix.py)
    assert got[4]["kind"] == "png_pixels"
    assert got[4]["n_pixels"] == 12
    assert got[4]["mean_r"] == pytest.approx(
        float(png_arr[:, :, 0].astype(float).mean()), abs=1e-9)
    # ...and so does GIF (r5, giflzw.py: pure-Python LZW)
    assert got[5]["kind"] == "gif_pixels"
    assert got[5]["mean_r"] == pytest.approx(
        (10 + 200 * 3) / 4.0, abs=1e-9)


def test_riff_family_dispatch_disambiguation(spark):
    """WAV-PCM, ADPCM-WAV and AVI all share the RIFF magic; FLAC adds
    a fourth audio container — one mixed Arrow batch must route each
    to its own decoder (the dispatch-chain ordering guard)."""
    import numpy as np

    from engine.pipeline.avimjpeg import encode_avi_mjpeg
    from engine.pipeline.flacpcm import encode_flac
    from engine.pipeline.wavcodecs import encode_wav_adpcm

    sig = np.cumsum(np.arange(600) % 17 - 8).astype(np.int64) * 50
    frame = np.full((16, 16), 77, dtype=np.uint8)
    rows = [
        (1, "audio", make_wav(sig[:100].tolist()), "audio/wav"),
        (2, "audio", bytes(encode_wav_adpcm(sig)), "audio/wav"),
        (3, "video", encode_avi_mjpeg([frame] * 2, fps=4), "video/avi"),
        (4, "audio", encode_flac(sig), "audio/flac"),
    ]
    media = spark.createDataFrame(
        rows, "media_id long, modality string, payload binary, "
              "mime string")
    got = {r["media_id"]: r
           for r in extract_deep_features(media).collect()}
    assert got[1]["kind"] == "wav_pcm" and got[1]["n_samples"] == 100
    assert got[2]["kind"] == "wav_adpcm"
    assert got[2]["n_samples"] == sig.size
    assert got[3]["kind"] == "avi_mjpeg"
    assert got[3]["mean_r"] == 77.0 and got[3]["n_pixels"] == 512
    assert got[4]["kind"] == "flac_pcm"
    assert got[4]["n_samples"] == sig.size
