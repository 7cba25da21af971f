"""Compressed-WAV audio decode (engine/pipeline/wavcodecs.py): G.711
µ-law/A-law against the per-segment quantization bound over the FULL
16-bit sweep plus spec known-vectors, IMA ADPCM (genuinely lossy
4-bit coding) via a hand-computed kernel vector, round-trip tracking
bounds, stereo interleave, fact-chunk trimming, the Spark dispatch,
and rejection of PCM/garbage/truncation (plain PCM stays
decode_wav_samples' job)."""

import numpy as np
import pytest

from engine.pipeline.wavcodecs import (_ALAW, _ULAW, _alaw_encode,
                                       _ulaw_encode, decode_wav_codec,
                                       encode_wav_adpcm,
                                       encode_wav_alaw,
                                       encode_wav_ulaw)

RNG = np.random.default_rng(9)
SIG = np.cumsum(RNG.integers(-300, 301, 4000)) \
    .clip(-30000, 30000).astype(np.int64)


@pytest.mark.parametrize("enc,table", [(_ulaw_encode, _ULAW),
                                       (_alaw_encode, _ALAW)],
                         ids=["ulaw", "alaw"])
def test_g711_full_sweep_quantization_bound(enc, table):
    # segment k has step 2^(k+4) → |err| ≤ max(8, |s|/16); /15 for the
    # µ-law bias offset
    sweep = np.arange(-32768, 32768, 7, dtype=np.int64)
    dec = np.array([table[enc(int(s))] for s in sweep])
    err = np.abs(dec - sweep)
    assert (err <= np.maximum(8, np.abs(sweep) / 15)).all()


def test_g711_known_vectors():
    # G.711 spec pins: µ-law 0xFF ↔ 0; A-law 0xD5 ↔ +8 (sign bit 1 =
    # positive in A-law, the opposite of µ-law)
    assert _ULAW[0xFF] == 0 and _ulaw_encode(0) == 0xFF
    assert _ALAW[0xD5] == 8 and _alaw_encode(8) == 0xD5
    assert _ALAW[0x55] == -8                 # 0x55 ^ 0x55 = 0 → -8
    assert _ULAW[0x7F] == -0                 # negative zero folds to 0


def test_adpcm_kernel_hand_vector():
    # pred=0, idx=0 (step 7) throughout (ADJ[1]=ADJ[2]=-1 clamp to 0):
    # nibble 2 → diff = 7>>1 = 3 → pred 3; nibble 9 (8|1) → diff =
    # 7>>2 = 1 → pred 3-1 = 2; nibble 7 → diff = (7>>2)+(7>>1)+7 = 11
    # → pred 13, idx 0+8=8
    from engine.pipeline.wavcodecs import _adpcm_decode_block
    import struct
    nibbles = [2, 9, 7, 0, 0, 0, 0, 0]
    data = struct.pack("<hBB", 0, 0, 0) + bytes(
        nibbles[k] | (nibbles[k + 1] << 4) for k in range(0, 8, 2))
    out = _adpcm_decode_block(data, 1, 9)[0]
    assert out[:4] == [0, 3, 2, 13]


def test_ulaw_roundtrip_stats():
    d = decode_wav_codec(encode_wav_ulaw(SIG, rate=8000))
    assert d["codec"] == "ulaw" and d["sample_rate"] == 8000
    assert d["n_samples"] == SIG.size
    ref = float(np.sqrt(((SIG / 32768.0) ** 2).mean()))
    assert d["rms"] == pytest.approx(ref, rel=0.01)


def test_alaw_roundtrip_stats():
    d = decode_wav_codec(encode_wav_alaw(SIG))
    assert d["codec"] == "alaw"
    ref = float(np.sqrt(((SIG / 32768.0) ** 2).mean()))
    assert d["rms"] == pytest.approx(ref, rel=0.01)


def test_adpcm_roundtrip_tracks_signal():
    d = decode_wav_codec(encode_wav_adpcm(SIG, samples_per_block=505))
    assert d["codec"] == "adpcm"
    # fact chunk trims the zero-padded final block: 8×505 → 4000
    assert d["n_samples"] == SIG.size
    ref = float(np.sqrt(((SIG / 32768.0) ** 2).mean()))
    assert d["rms"] == pytest.approx(ref, rel=0.02)   # lossy by design


def test_adpcm_stereo_interleave():
    st = np.stack([SIG, (SIG * 0.5).astype(np.int64)], axis=1)
    d = decode_wav_codec(encode_wav_adpcm(st, samples_per_block=505))
    assert d["n_channels"] == 2 and d["n_samples"] == 2 * SIG.size
    ref = float(np.sqrt(((st / 32768.0) ** 2).mean()))
    assert d["rms"] == pytest.approx(ref, rel=0.02)


def test_rejects_pcm_garbage_truncation():
    from tests.test_multimodal_deep import make_wav
    assert decode_wav_codec(make_wav([1, 2, 3])) is None   # plain PCM
    assert decode_wav_codec(b"not a riff") is None
    assert decode_wav_codec(encode_wav_adpcm(SIG)[:40]) is None
    # corrupt step index in the first block header → rejected
    payload = bytearray(encode_wav_adpcm(SIG, samples_per_block=505))
    at = payload.index(b"data") + 8
    payload[at + 2] = 200                   # step index > 88
    assert decode_wav_codec(bytes(payload)) is None


def test_deep_feature_dispatch_wav_codecs(spark):
    from engine.pipeline.multimodal import extract_deep_features
    rows_in = [(1, bytearray(encode_wav_ulaw(SIG))),
               (2, bytearray(encode_wav_alaw(SIG))),
               (3, bytearray(encode_wav_adpcm(SIG)))]
    df = spark.createDataFrame(rows_in,
                               "media_id long, payload binary")
    rows = {r["media_id"]: r for r in
            extract_deep_features(df).collect()}
    assert rows[1]["kind"] == "wav_ulaw"
    assert rows[2]["kind"] == "wav_alaw"
    assert rows[3]["kind"] == "wav_adpcm"
    ref = float(np.sqrt(((SIG / 32768.0) ** 2).mean()))
    for mid in (1, 2, 3):
        assert rows[mid]["n_samples"] == SIG.size
        assert rows[mid]["rms"] == pytest.approx(ref, rel=0.02)
