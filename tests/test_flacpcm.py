"""FLAC sample decode (engine/pipeline/flacpcm.py): fixture encoder →
decoder roundtrips across every supported subframe type (CONSTANT /
VERBATIM / FIXED 0-4 / LPC), all three stereo decorrelations, Rice
partition orders, the escaped raw-bits partitions, wasted bits and
8/16/24-bit depths; bitwise stat parity with the WAV decoder on the
same signal; header-parse duration; and rejection of everything the
decoder honestly verifies (CRC-8, CRC-16, MD5, truncation,
STREAMINFO-order, the decompression-bomb guard)."""

import numpy as np
import pytest

from engine.pipeline.flacpcm import (_crc8, _crc16, decode_flac_samples,
                                     encode_flac)
from engine.pipeline.multimodal import (decode_wav_samples,
                                        parse_media_header)

RNG = np.random.default_rng(42)
MONO = RNG.normal(0, 3000, 1000).astype(np.int64).clip(-32768, 32767)
STEREO = np.stack([MONO, (MONO * 0.7).astype(np.int64)], axis=1)


def ref_stats(samples, bits=16):
    arr = np.asarray(samples, dtype=np.int64)
    if arr.ndim == 1:
        arr = arr[:, None]
    norm = arr.astype(np.float64) / float(1 << (bits - 1))
    return (int(arr.size),
            float(np.sqrt((norm * norm).mean())) if arr.size else 0.0,
            float(np.abs(norm).max()) if arr.size else 0.0)


def assert_roundtrip(samples, bits=16, **kw):
    d = decode_flac_samples(encode_flac(samples, bits=bits, **kw))
    n, rms, peak = ref_stats(samples, bits)
    assert d is not None
    assert d["n_samples"] == n
    assert d["rms"] == pytest.approx(rms, abs=1e-15)
    assert d["peak"] == pytest.approx(peak, abs=1e-15)
    return d


@pytest.mark.parametrize("mode", ["verbatim", "fixed0", "fixed1",
                                  "fixed2", "fixed3", "fixed4",
                                  "lpc:2", "lpc:8", "lpc:12"])
def test_subframe_types_roundtrip(mode):
    assert_roundtrip(MONO, mode=mode)


def test_constant_subframe():
    d = assert_roundtrip(np.full(500, 123), mode="constant")
    assert d["sample_rate"] == 8000 and d["n_channels"] == 1


@pytest.mark.parametrize("cm", ["independent", "left_side",
                                "right_side", "mid_side"])
def test_stereo_decorrelations_roundtrip(cm):
    d = assert_roundtrip(STEREO, mode="fixed2", channel_mode=cm)
    assert d["n_channels"] == 2


def test_rice_partition_orders_agree():
    # same signal, different partitionings → identical decoded stats
    ds = [assert_roundtrip(MONO[:512], mode="fixed3",
                           partition_order=po, block_size=512)
          for po in (0, 1, 2, 4)]
    assert all(d == ds[0] for d in ds)


def test_escaped_raw_partitions():
    assert_roundtrip(MONO, mode="fixed1", escape_raw=18)
    # the 0-bit escape encodes an all-zero partition in 9 bits total
    assert_roundtrip(np.zeros(256, dtype=np.int64), mode="fixed0",
                     escape_raw=0)


def test_wasted_bits():
    shifted = (MONO >> 3) << 3
    assert_roundtrip(shifted, mode="fixed2", wasted=3)


@pytest.mark.parametrize("bits,scale", [(8, 1 / 256), (16, 1),
                                        (24, 256)])
def test_bit_depths(bits, scale):
    sig = (MONO * scale).astype(np.int64)
    d = assert_roundtrip(sig, bits=bits, mode="fixed2")
    assert d["n_samples"] == sig.size


def test_multi_frame_with_odd_tail_and_metadata_chain():
    d = assert_roundtrip(MONO[:777], mode="fixed2", block_size=256,
                         extra_metadata=True)
    assert d["n_samples"] == 777


def test_stats_bitwise_equal_to_wav_decoder():
    from tests.test_multimodal_deep import make_wav
    wav = decode_wav_samples(make_wav(MONO.tolist(), rate=8000))
    flac = decode_flac_samples(encode_flac(MONO, sample_rate=8000))
    assert flac["rms"] == wav["rms"]
    assert flac["peak"] == wav["peak"]
    assert flac["n_samples"] == wav["n_samples"]
    assert flac["sample_rate"] == wav["sample_rate"]


def test_header_parse_duration():
    payload = encode_flac(MONO, sample_rate=8000)   # 1000 smp @ 8 kHz
    h = parse_media_header(payload)
    assert h == {"width": None, "height": None, "duration_ms": 125}


def test_rejects_non_flac_and_truncation():
    assert decode_flac_samples(b"not flac at all") is None
    payload = encode_flac(MONO)
    for cut in (3, 20, 41, len(payload) // 2, len(payload) - 1):
        assert decode_flac_samples(payload[:cut]) is None


def test_rejects_frame_crc16_corruption():
    payload = bytearray(encode_flac(MONO, write_md5=False))
    # flip one bit deep inside the (only) frame's subframe data
    payload[-20] ^= 0x10
    assert decode_flac_samples(bytes(payload)) is None


def test_rejects_header_crc8_corruption():
    payload = bytearray(encode_flac(MONO))
    # frame starts right after the 42-byte magic+STREAMINFO; byte 44
    # sits in the frame header, before its CRC-8
    assert payload[42] == 0xFF              # frame sync
    payload[44] ^= 0x01                     # sample-rate/blocksize code
    assert decode_flac_samples(bytes(payload)) is None


def test_rejects_md5_mismatch():
    payload = bytearray(encode_flac(MONO))
    payload[30] ^= 0xFF                     # inside STREAMINFO md5
    assert decode_flac_samples(bytes(payload)) is None


def test_rejects_streaminfo_not_first():
    good = encode_flac(MONO)
    # splice a PADDING block in front of STREAMINFO — spec violation
    bad = (good[:4] + bytes([1]) + (2).to_bytes(3, "big") + b"\x00\x00"
           + good[4:])
    assert decode_flac_samples(bad) is None


def test_bomb_guard_on_total_samples():
    payload = bytearray(encode_flac(MONO))
    payload[21] |= 0x0F                     # total_samples ≥ 2^32
    assert decode_flac_samples(bytes(payload)) is None


def test_crc_reference_values():
    # spot-pin both CRC polynomials against hand-computed vectors
    assert _crc8(b"\x00") == 0x00
    assert _crc8(b"123456789") == 0xF4      # CRC-8/SMBUS check value
    assert _crc16(b"123456789") == 0xFEE8   # CRC-16/BUYPASS check value


def test_deep_feature_dispatch_flac(spark):
    from engine.pipeline.multimodal import extract_deep_features
    payload = encode_flac(MONO, sample_rate=8000)
    df = spark.createDataFrame(
        [(1, bytearray(payload)), (2, bytearray(b"\x00garbage"))],
        "media_id long, payload binary")
    rows = {r["media_id"]: r for r in
            extract_deep_features(df).collect()}
    n, rms, _ = ref_stats(MONO)
    assert rows[1]["kind"] == "flac_pcm"
    assert rows[1]["sample_rate"] == 8000
    assert rows[1]["n_samples"] == n
    assert rows[1]["rms"] == pytest.approx(rms, abs=1e-15)
    assert rows[2]["kind"] == "stub"
