"""Full PNG pixel decode (engine/pipeline/pngpix.py): round-trips of
the fixture encoder through the decoder against numpy reference
means, per color type / bit depth / filter, plus the documented
rejection envelope."""

import struct
import zlib

import numpy as np
import pytest

from engine.pipeline.pngpix import (PNG_SIG, decode_png_pixels,
                                    encode_png)

RNG = np.random.default_rng(421)


def _check(arr, color, depth=8, filters=None, palette=None):
    png = decode_png_pixels(encode_png(arr, color, depth=depth,
                                       filters=filters,
                                       palette=palette))
    assert png is not None
    h, w = arr.shape[:2]
    assert (png["width"], png["height"], png["n_pixels"]) == (w, h,
                                                              w * h)
    if color == 3:
        ref = palette[arr.astype(np.int64)].astype(np.float64)
    elif arr.ndim == 2:
        ref = arr[:, :, None].astype(np.float64)
    else:
        ref = arr.astype(np.float64)
    if depth == 16:
        ref = ref / 257.0
    if ref.shape[2] >= 3:
        want = ref[:, :, :3].mean(axis=(0, 1))
    else:
        want = np.repeat(ref[:, :, 0].mean(), 3)
    for i, chn in enumerate(("mean_r", "mean_g", "mean_b")):
        assert png[chn] == pytest.approx(float(want[i]), abs=1e-9), chn
    return png


def test_rgb8_all_filters_roundtrip():
    # one row per filter type plus a tall tail that cycles them —
    # exercises Sub/Up/Average/Paeth reconstruction incl. row 0 edges
    arr = RNG.integers(0, 256, size=(11, 7, 3), dtype=np.uint8)
    for ft in (0, 1, 2, 3, 4, None):
        _check(arr, 2, filters=None if ft is None else [ft])


def test_gray8_and_gray_alpha():
    _check(RNG.integers(0, 256, size=(5, 9), dtype=np.uint8), 0)
    ga = RNG.integers(0, 256, size=(6, 4, 2), dtype=np.uint8)
    got = _check(ga, 4)
    # alpha must NOT weight the mean (stats pass, not compositing)
    assert got["mean_r"] == pytest.approx(
        float(ga[:, :, 0].mean()), abs=1e-9)


def test_rgba8_alpha_ignored():
    arr = RNG.integers(0, 256, size=(8, 5, 4), dtype=np.uint8)
    got = _check(arr, 6)
    assert got["mean_g"] == pytest.approx(
        float(arr[:, :, 1].astype(np.float64).mean()), abs=1e-9)


def test_palette8_roundtrip():
    pal = RNG.integers(0, 256, size=(16, 3), dtype=np.uint8)
    idx = RNG.integers(0, 16, size=(7, 7), dtype=np.uint8)
    _check(idx, 3, palette=pal)
    # index beyond the palette -> None, not a crash
    bad = encode_png(np.full((2, 2), 15, dtype=np.uint8), 3,
                     palette=pal[:8])
    assert decode_png_pixels(bad) is None


def test_adam7_interlace_roundtrip():
    """Adam7: every pass an independently filtered sub-image; sizes
    chosen so some passes are empty (w or h < pass start) and others
    ragged — the spec's edge cases."""
    for shape in ((1, 1, 3), (2, 3, 3), (7, 5, 3), (16, 16, 3),
                  (9, 2, 3)):
        arr = RNG.integers(0, 256, size=shape, dtype=np.uint8)
        plain = _check(arr, 2)
        inter = decode_png_pixels(encode_png(arr, 2, interlace=1))
        assert inter is not None, shape
        for k in ("width", "height", "mean_r", "mean_g", "mean_b"):
            assert inter[k] == plain[k], (shape, k)
    # gray 16-bit interlaced too (bpp=2 lanes through the scatter)
    a16 = RNG.integers(0, 65536, size=(6, 7), dtype=np.uint16)
    got = decode_png_pixels(encode_png(a16, 0, depth=16, interlace=1))
    assert got["mean_r"] == pytest.approx(
        float(a16.astype(np.float64).mean() / 257.0), abs=1e-9)


def test_rgb16_scale():
    arr = RNG.integers(0, 65536, size=(4, 6, 3), dtype=np.uint16)
    _check(arr, 2, depth=16)
    # a constant 0xFFFF image must mean exactly 255.0 (the /257 map)
    white = np.full((3, 3, 3), 0xFFFF, dtype=np.uint16)
    got = decode_png_pixels(encode_png(white, 2, depth=16))
    assert got["mean_r"] == 255.0


def test_rejection_envelope():
    arr = RNG.integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
    good = encode_png(arr, 2)
    assert decode_png_pixels(good) is not None
    # sub-byte palette depth: documented gap (forge depth=4)
    pal = RNG.integers(0, 256, size=(8, 3), dtype=np.uint8)
    p8 = encode_png(RNG.integers(0, 8, size=(3, 3), dtype=np.uint8),
                    3, palette=pal)
    ihdr4 = struct.pack(">IIBBBBB", 3, 3, 4, 3, 0, 0, 0)
    forged4 = bytearray(p8)
    forged4[16:16 + 13] = ihdr4
    forged4[29:33] = struct.pack(
        ">I", zlib.crc32(b"IHDR" + ihdr4) & 0xFFFFFFFF)
    assert decode_png_pixels(bytes(forged4)) is None
    # corrupt IDAT CRC
    bad = bytearray(good)
    bad[-20] ^= 0xFF
    assert decode_png_pixels(bytes(bad)) is None
    # truncation and non-PNG
    assert decode_png_pixels(good[:40]) is None
    assert decode_png_pixels(b"not a png at all") is None
    # declared size lies about the stream (IHDR says taller)
    ihdr = struct.pack(">IIBBBBB", 4, 9, 8, 2, 0, 0, 0)
    forged = bytearray(good)
    forged[16:16 + 13] = ihdr
    forged[29:33] = struct.pack(
        ">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
    assert decode_png_pixels(bytes(forged)) is None


def test_third_party_shape_sanity():
    """The encoder's output starts with the PNG signature and walks
    as chunks with valid CRCs — the envelope any external reader
    checks first."""
    png = encode_png(RNG.integers(0, 256, size=(3, 3, 3),
                                  dtype=np.uint8), 2)
    assert png[:8] == PNG_SIG
    pos = 8
    seen = []
    while pos < len(png):
        (size,) = struct.unpack(">I", png[pos:pos + 4])
        ctype = png[pos + 4:pos + 8]
        body = png[pos + 8:pos + 8 + size]
        (crc,) = struct.unpack(">I", png[pos + 8 + size:pos + 12 + size])
        assert zlib.crc32(ctype + body) & 0xFFFFFFFF == crc
        seen.append(ctype)
        pos += 12 + size
    assert seen[0] == b"IHDR" and seen[-1] == b"IEND"
    assert seen.count(b"IDAT") == 2               # multi-IDAT path
