"""GIF pixel decode (engine/pipeline/giflzw.py): LZW round-trips of
the fixture encoder through the decoder against numpy reference
means — incl. the code-width growth schedule, CLEAR-on-full-table,
interlace, local color tables, first-frame-of-animation — plus the
rejection envelope."""

import struct

import numpy as np
import pytest

from engine.pipeline.giflzw import (decode_gif_pixels, encode_gif,
                                    _lzw_decode, _lzw_encode)

RNG = np.random.default_rng(1107)


def _check(idx, pal, **kw):
    got = decode_gif_pixels(encode_gif(idx, pal, **kw))
    assert got is not None
    h, w = idx.shape
    assert (got["width"], got["height"], got["n_pixels"]) == (w, h,
                                                              w * h)
    ref = pal[idx.astype(np.int64)].astype(np.float64).mean(axis=(0, 1))
    for i, chn in enumerate(("mean_r", "mean_g", "mean_b")):
        assert got[chn] == pytest.approx(float(ref[i]), abs=1e-9), chn
    return got


def test_basic_and_87a():
    pal = RNG.integers(0, 256, size=(8, 3), dtype=np.uint8)
    idx = RNG.integers(0, 8, size=(9, 13), dtype=np.uint8)
    _check(idx, pal)
    _check(idx, pal, animated_89a=False)     # bare GIF87a, no GCE


def test_interlaced_rows_reordered():
    # a height-8 gradient: row means differ per row, so a missed
    # 4-pass reorder flips the column-axis means
    pal = np.stack([np.arange(0, 256, 16)] * 3, axis=1).astype(np.uint8)
    idx = np.tile(np.arange(8, dtype=np.uint8)[:, None], (1, 5))
    plain = _check(idx, pal, interlace=False)
    inter = _check(idx, pal, interlace=True)
    assert plain["mean_r"] == inter["mean_r"]
    # and the stored byte streams genuinely differ (rows reordered)
    assert encode_gif(idx, pal, interlace=True) != \
        encode_gif(idx, pal, interlace=False)


def test_width_growth_past_every_boundary():
    # enough distinct runs to push the code table past the 3->4->...
    # width boundaries; min_code=2 grows fastest
    pal = RNG.integers(0, 256, size=(4, 3), dtype=np.uint8)
    idx = RNG.integers(0, 4, size=(64, 64), dtype=np.uint8)
    _check(idx, pal, min_code=2)


def test_clear_on_full_table():
    # 90k symbols over a 2-entry alphabet forces the 4096-entry table
    # full -> CLEAR -> rebuild path in both encoder and decoder
    pal = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
    idx = (RNG.integers(0, 2, size=(300, 300)) ).astype(np.uint8)
    _check(idx, pal, min_code=2)


def test_lzw_kwkwk_case():
    # the classic cScSc pattern emits a code equal to the table size
    # (entry defined and used in the same step)
    data = bytes([0, 1, 0, 0, 1, 0, 0, 1, 0])
    enc = _lzw_encode(2, data)
    got = _lzw_decode(2, enc, len(data))
    assert got is not None and bytes(got) == data


def test_local_color_table_wins():
    gct = np.zeros((4, 3), dtype=np.uint8)          # all black globally
    lct = np.full((4, 3), 200, dtype=np.uint8)
    idx = np.zeros((3, 3), dtype=np.uint8)
    base = encode_gif(idx, gct)
    # splice a local color table in: set LCT flag + depth 1 (4 colors)
    # by rebuilding the image descriptor by hand
    pos = base.index(b"\x2c")
    desc = bytearray(base[pos:pos + 10])
    desc[9] = 0x80 | 1                              # LCT present, 4 entries
    forged = base[:pos] + bytes(desc) + bytes(lct) + base[pos + 10:]
    got = decode_gif_pixels(forged)
    assert got["mean_r"] == 200.0


def test_animation_first_frame_only():
    pal = RNG.integers(0, 256, size=(8, 3), dtype=np.uint8)
    f1 = RNG.integers(0, 8, size=(6, 6), dtype=np.uint8)
    f2 = RNG.integers(0, 8, size=(6, 6), dtype=np.uint8)
    one = encode_gif(f1, pal)
    two = encode_gif(f2, pal)
    # append frame 2's GCE+descriptor+data before the trailer
    animated = one[:-1] + two[13 + 24:]
    got = decode_gif_pixels(animated)
    ref = pal[f1.astype(np.int64)].astype(np.float64).mean(axis=(0, 1))
    assert got["mean_r"] == pytest.approx(float(ref[0]), abs=1e-9)


def test_rejection_envelope():
    pal = RNG.integers(0, 256, size=(4, 3), dtype=np.uint8)
    idx = RNG.integers(0, 4, size=(5, 5), dtype=np.uint8)
    good = encode_gif(idx, pal)
    assert decode_gif_pixels(good) is not None
    assert decode_gif_pixels(b"GIF89a") is None            # truncated
    assert decode_gif_pixels(good[:20]) is None
    assert decode_gif_pixels(b"JIF89a" + good[6:]) is None  # bad magic
    # no color table anywhere
    nogct = bytearray(good)
    nogct[10] &= 0x7F                                      # clear GCT flag
    assert decode_gif_pixels(bytes(nogct[:13]) + good[13 + 12:]) is None
    # corrupt LZW stream: a code two beyond the table is invalid
    # (min_code=2: first data code read with prev=None must be < 6)
    assert _lzw_decode(2, bytes([0b00000111]), 4) is None
    # truncated mid-sub-block
    assert decode_gif_pixels(good[:len(good) - 4]) is None
