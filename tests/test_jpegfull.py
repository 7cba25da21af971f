"""Full baseline JPEG pixel codec (engine/pipeline/jpegfull.py):
round-trip error bounds per config, zigzag/IDCT identities, interop
with the DC-image decoder, and the honest fallback ladder."""

import numpy as np
import pytest

from engine.pipeline.jpegdc import (decode_jpeg_dc, encode_jpeg_baseline,
                                    encode_jpeg_progressive)
from engine.pipeline.jpegfull import (_ZZ_FLAT, _fdct_block, _idct_blocks,
                                      decode_jpeg_pixels, encode_jpeg_full)


def _test_image(h=45, w=61, seed=7):
    rng = np.random.default_rng(seed)
    base = np.linspace(0, 255, w)[None, :] * np.ones((h, 1))
    gray = np.clip(base + rng.normal(0, 12, (h, w)), 0, 255)
    return gray.astype(np.uint8)


def _test_rgb(h=45, w=61, seed=7):
    g = _test_image(h, w, seed)
    return np.stack([g, 255 - g, g // 2 + 40], axis=-1).astype(np.uint8)


# ---------------------------------------------------------------------------
# Transform identities
# ---------------------------------------------------------------------------

def test_zigzag_is_the_spec_order():
    # spec Figure A.6 first and last entries (row-major flat indices)
    zz = list(_ZZ_FLAT)
    assert zz[:10] == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert zz[-6:] == [61, 54, 47, 55, 62, 63]
    assert sorted(zz) == list(range(64))


def test_fdct_idct_roundtrip_is_identity():
    rng = np.random.default_rng(1)
    blocks = rng.uniform(-128, 127, (20, 8, 8))
    coefs = np.stack([_fdct_block(b) for b in blocks])
    back = _idct_blocks(coefs)
    assert np.abs(back - blocks).max() < 1e-9
    # DC of a constant block is 8·level, all AC zero (orthonormality)
    c = _fdct_block(np.full((8, 8), 13.0))
    assert c[0, 0] == pytest.approx(8 * 13.0)
    assert np.abs(c).sum() == pytest.approx(abs(c[0, 0]))


# ---------------------------------------------------------------------------
# Round trips (error bounded by each config's true information loss)
# ---------------------------------------------------------------------------

def test_roundtrip_near_lossless_q1():
    for src in (_test_image(), _test_rgb()):
        dec = decode_jpeg_pixels(encode_jpeg_full(src))
        assert dec is not None
        assert (dec["width"], dec["height"]) == (61, 45)
        assert dec["n_pixels"] == 61 * 45
        ref = np.stack([src] * 3, -1) if src.ndim == 2 else src
        err = np.abs(dec["pixels"].astype(int) - ref.astype(int))
        # q=1: only DCT float + coefficient rounding survives
        assert err.max() <= 2 and err.mean() < 0.5


def test_roundtrip_with_restarts_matches_plain():
    src = _test_rgb()
    plain = decode_jpeg_pixels(encode_jpeg_full(src))
    rst = decode_jpeg_pixels(encode_jpeg_full(src, restart_interval=3))
    assert np.array_equal(plain["pixels"], rst["pixels"])


def test_roundtrip_420_subsampling():
    # smooth image: chroma downsample loses little; luma stays q=1
    h, w = 40, 48
    base = (np.linspace(0, 200, w)[None, :]
            + np.linspace(0, 55, h)[:, None])
    rgb = np.stack([base, base * 0.8 + 20, 255 - base],
                   axis=-1).astype(np.uint8)
    dec = decode_jpeg_pixels(encode_jpeg_full(rgb, subsample="4:2:0"))
    assert dec is not None
    err = np.abs(dec["pixels"].astype(int) - rgb.astype(int))
    # nearest-neighbour chroma upsample on a ~4 levels/px gradient:
    # worst pixel ~slope·1px × the 1.772 Cb→B gain ≈ 7
    assert err.max() <= 8 and err.mean() < 2.0
    # and it genuinely subsampled: smaller than 4:4:4 at same quality
    assert (len(encode_jpeg_full(rgb, subsample="4:2:0"))
            < 0.65 * len(encode_jpeg_full(rgb)))


def test_quantization_error_scales_with_q():
    src = _test_rgb()
    errs = []
    for q in (1, 8, 32):
        dec = decode_jpeg_pixels(encode_jpeg_full(src, q_luma=q,
                                                  q_chroma=q))
        errs.append(np.abs(dec["pixels"].astype(int)
                           - src.astype(int)).mean())
    assert errs[0] < errs[1] < errs[2]
    # and compression improves alongside
    sizes = [len(encode_jpeg_full(src, q_luma=q, q_chroma=q))
             for q in (1, 8, 32)]
    assert sizes[0] > sizes[1] > sizes[2]


# ---------------------------------------------------------------------------
# Interop with the DC-image decoder (shared block means)
# ---------------------------------------------------------------------------

def test_dc_decoder_reads_full_encoder_output():
    src = _test_rgb(h=48, w=64)          # full blocks: means are exact
    enc = encode_jpeg_full(src)
    dc = decode_jpeg_dc(enc)
    full = decode_jpeg_pixels(enc)
    assert dc is not None and full is not None
    # full-block image: DC means ≈ full-decode means (clamp + chroma
    # rounding keep them within ~1 gray level)
    for ch in ("mean_r", "mean_g", "mean_b"):
        assert dc[ch] == pytest.approx(full[ch], abs=1.5)


def test_full_decoder_reads_dc_only_fixture():
    img = np.full((16, 24), 77, dtype=np.uint8)
    dec = decode_jpeg_pixels(encode_jpeg_baseline(img))
    assert dec is not None
    assert np.abs(dec["pixels"].astype(int) - 77).max() <= 1


# ---------------------------------------------------------------------------
# Fallback ladder honesty
# ---------------------------------------------------------------------------

def test_progressive_and_garbage_return_none():
    img = _test_image(16, 16)
    assert decode_jpeg_pixels(encode_jpeg_progressive(img, al=1)) is None
    assert decode_jpeg_pixels(b"not a jpeg") is None
    good = encode_jpeg_full(img)
    assert decode_jpeg_pixels(good[:len(good) // 2]) is None
