"""Baseline JPEG DC-image decode (engine/pipeline/jpegdc.py): fixture
encoder → decoder roundtrips (solid/blocky RGB/gray, edge padding,
restart markers), a HAND-CRAFTED entropy stream with real AC
coefficients (run/size skip, ZRL, the k==63 no-EOB exit — paths the
DC-only fixture encoder never emits), and rejection of everything the
decoder honestly does not support (progressive, truncation,
non-JPEG)."""

import struct

import numpy as np
import pytest

from engine.pipeline.jpegdc import (_BitWriter, decode_jpeg_dc,
                                    encode_jpeg_baseline,
                                    encode_jpeg_progressive)


def test_solid_gray_roundtrip_exact():
    img = np.full((16, 24), 100, dtype=np.uint8)
    d = decode_jpeg_dc(encode_jpeg_baseline(img))
    assert d == {"width": 24, "height": 16, "n_pixels": 384,
                 "n_blocks": 6, "mean_r": 100.0, "mean_g": 100.0,
                 "mean_b": 100.0}


def test_blocky_rgb_means_within_ycbcr_rounding():
    rng = np.random.default_rng(7)
    blocks = rng.integers(0, 256, (4, 5, 3))
    img = np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1) \
        .astype(np.uint8)
    d = decode_jpeg_dc(encode_jpeg_baseline(img))
    true = img.reshape(-1, 3).mean(axis=0)
    assert d["n_blocks"] == 4 * 5 * 3
    for ch, t in zip(("mean_r", "mean_g", "mean_b"), true):
        # DC quantization rounds each block's YCbCr mean to integers;
        # the color transform amplifies by ≤ 1.772
        assert abs(d[ch] - t) < 1.0, (ch, d[ch], t)


def test_restart_markers_equal_plain():
    rng = np.random.default_rng(11)
    blocks = rng.integers(0, 256, (3, 7, 3))
    img = np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1) \
        .astype(np.uint8)
    plain = decode_jpeg_dc(encode_jpeg_baseline(img))
    rst = decode_jpeg_dc(encode_jpeg_baseline(img, restart_interval=3))
    assert plain == rst


def test_edge_padding_dims():
    img = np.full((17, 19, 3), 200, dtype=np.uint8)
    d = decode_jpeg_dc(encode_jpeg_baseline(img))
    assert (d["width"], d["height"], d["n_pixels"]) == (19, 17, 323)
    assert d["n_blocks"] == 3 * 3 * 3      # ceil dims → 3×3 MCUs
    assert abs(d["mean_r"] - 200.0) < 0.5


def _handcrafted_with_ac(ac_plan):
    """One-component 8×8 baseline JPEG whose single block carries DC=3
    and the given AC symbol plan — symbols the DC-only fixture encoder
    never produces. AC table: 4 two-bit codes for EOB/0x01/0xF0/0x12."""
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([0]) + bytes([8] * 64)
    sof = struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    dc_bits = [0, 0, 0, 12] + [0] * 12
    ac_bits = [0, 4] + [0] * 14
    dht = (bytes([0x00]) + bytes(dc_bits) + bytes(range(12))
           + bytes([0x10]) + bytes(ac_bits)
           + bytes([0x00, 0x01, 0xF0, 0x12]))
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    bw = _BitWriter()
    bw.write(0b0010, 4)        # DC category 2
    bw.write(0b11, 2)          # diff = +3
    codes = {0x00: 0b00, 0x01: 0b01, 0xF0: 0b10, 0x12: 0b11}
    sizes = {0x00: 0, 0x01: 1, 0xF0: 0, 0x12: 2}
    for sym in ac_plan:
        bw.write(codes[sym], 2)
        if sizes[sym]:
            bw.write((1 << sizes[sym]) - 1, sizes[sym])  # any bits
    bw.pad_to_byte()
    out += bw.out + b"\xff\xd9"
    return bytes(out)


def test_ac_skip_paths_do_not_disturb_dc():
    # run/size skip + ZRL + EOB: k walks 1→2 (0x01), →18 (ZRL),
    # →20 (0x12: run 1 + coeff), then EOB
    d = decode_jpeg_dc(_handcrafted_with_ac([0x01, 0xF0, 0x12, 0x00]))
    assert d is not None
    assert (d["width"], d["height"], d["n_blocks"]) == (8, 8, 1)
    assert d["mean_r"] == 131.0            # DC 3 · Q 8 / 8 + 128


def test_ac_runs_to_63_without_eob():
    # k: 1→2 via 0x01, three ZRLs → 50, then 13 × 0x01 → 63, one more
    # coeff lands exactly on 63 → loop exits with NO EOB (legal)
    plan = [0x01, 0xF0, 0xF0, 0xF0] + [0x01] * 14
    d = decode_jpeg_dc(_handcrafted_with_ac(plan))
    assert d is not None and d["mean_r"] == 131.0


def test_single_component_scan_is_non_interleaved():
    """Spec F.2.1: a one-component scan has one data unit per MCU —
    sampling factors declared in SOF must NOT group blocks. A 16×8
    grayscale frame declaring 2×2 sampling still carries exactly two
    blocks (regression: the interleaved MCU walk read 4 blocks/MCU
    and fell off the entropy stream)."""
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([0]) \
        + bytes([8] * 64)
    sof = struct.pack(">BHHB", 8, 8, 16, 1) + bytes([1, 0x22, 0])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    dht = (bytes([0x00]) + bytes([0, 0, 0, 12] + [0] * 12)
           + bytes(range(12))
           + bytes([0x10]) + bytes([1] + [0] * 15) + bytes([0x00]))
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    bw = _BitWriter()
    pred = 0
    for dc in (10, 20):
        diff = dc - pred
        pred = dc
        s = abs(diff).bit_length()
        bw.write(s, 4)
        bw.write(diff if diff > 0 else diff + (1 << s) - 1, s)
        bw.write(0, 1)                     # EOB
    bw.pad_to_byte()
    out += bw.out + b"\xff\xd9"
    d = decode_jpeg_dc(bytes(out))
    assert d is not None
    assert (d["n_blocks"], d["mean_r"]) == (2, 143.0)   # mean DC 15


def test_progressive_equals_baseline():
    """SOF2 DC-image path (r5): same image through the progressive
    fixture encoder (DC first scan + Al refinement scans + skipped
    AC EOB-run scans) must decode to exactly the baseline answer —
    both carry identical quantized DC grids."""
    rng = np.random.default_rng(23)
    blocks = rng.integers(0, 256, (4, 5, 3))
    img = np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1) \
        .astype(np.uint8)
    base = decode_jpeg_dc(encode_jpeg_baseline(img))
    for al in (0, 1, 2, 3):
        prog = decode_jpeg_dc(encode_jpeg_progressive(img, al=al))
        assert prog == base, al
    # grayscale + edge padding + restart markers
    g = rng.integers(0, 256, (17, 21)).astype(np.uint8)
    gb = decode_jpeg_dc(encode_jpeg_baseline(g))
    assert decode_jpeg_dc(encode_jpeg_progressive(g, al=1)) == gb
    assert decode_jpeg_dc(
        encode_jpeg_progressive(g, al=2, restart_interval=2)) == gb
    rgb = rng.integers(0, 256, (9, 25, 3)).astype(np.uint8)
    assert decode_jpeg_dc(
        encode_jpeg_progressive(rgb, al=1, restart_interval=3)) == \
        decode_jpeg_dc(encode_jpeg_baseline(rgb))


def test_progressive_refinement_bits_matter():
    # negative and odd DC values exercise the two's-complement OR of
    # refinement bits: a solid level whose DC is odd flips the last
    # refinement bit in every block
    img = np.full((8, 8), 137, dtype=np.uint8)   # DC = +9 (odd)
    base = decode_jpeg_dc(encode_jpeg_baseline(img))
    prog = decode_jpeg_dc(encode_jpeg_progressive(img, al=1))
    assert prog == base and base["mean_r"] == 137.0
    dark = np.full((8, 8), 117, dtype=np.uint8)  # DC = −11 (negative odd)
    assert decode_jpeg_dc(encode_jpeg_progressive(dark, al=2)) == \
        decode_jpeg_dc(encode_jpeg_baseline(dark))


def test_progressive_truncation_rejected():
    img = np.full((16, 16), 80, dtype=np.uint8)
    prog = encode_jpeg_progressive(img, al=1)
    assert decode_jpeg_dc(prog) is not None
    assert decode_jpeg_dc(prog[:40]) is None     # inside the headers
    # cut inside the first DC scan's entropy data
    sos = prog.index(b"\xff\xda")
    assert decode_jpeg_dc(prog[:sos + 12]) is None


def test_rejections():
    img = np.full((8, 8), 50, dtype=np.uint8)
    good = encode_jpeg_baseline(img)
    assert decode_jpeg_dc(good) is not None
    assert decode_jpeg_dc(b"not a jpeg") is None
    assert decode_jpeg_dc(b"\xff\xd8\xff\xc2\x00\x04\x00\x00") is None
    assert decode_jpeg_dc(good[:len(good) // 2]) is None   # truncated
    # PNG magic must fall through to the header layer, not crash
    assert decode_jpeg_dc(b"\x89PNG\r\n\x1a\n" + b"\x00" * 64) is None


def test_deep_features_dispatch_jpeg(spark):
    from engine.pipeline.multimodal import extract_deep_features

    img = np.full((8, 16, 3), 90, dtype=np.uint8)
    rows = [(1, bytearray(encode_jpeg_baseline(img))),
            (2, bytearray(b"\x00" * 32)),
            (3, bytearray(encode_jpeg_progressive(img, al=1)))]
    media = spark.createDataFrame(rows,
                                  "media_id long, payload binary")
    got = {r["media_id"]: r for r in
           extract_deep_features(media).collect()}
    # baseline rides the FULL pixel decoder now (jpegfull.py, r5) —
    # a DC-only stream is legal baseline JPEG, so it qualifies
    assert got[1]["kind"] == "jpeg_pixels"
    assert (got[1]["width"], got[1]["height"]) == (16, 8)
    assert got[1]["mean_g"] == pytest.approx(90.0, abs=1.0)
    assert got[2]["kind"] == "stub"
    # progressive stays on the DC-image stats path
    assert got[3]["kind"] == "jpeg_dc"
    assert got[3]["mean_g"] == pytest.approx(90.0, abs=1.0)
