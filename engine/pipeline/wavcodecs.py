"""Compressed-WAV sample decode — G.711 µ-law/A-law companding and
IMA ADPCM — pure Python/numpy, no codec libs (closing the LOSSY-audio
corner of the multimodal deep-decode gap: all three codecs are pure
integer table/step arithmetic, spec'd in G.711 and the IMA ADPCM
reference algorithm, so a complete decode needs nothing outside the
standard library; IMA ADPCM in particular IS lossy compression — 4
bits/sample with an adaptive step size — making this the first
genuinely lossy audio codec the pipeline decodes rather than stubs).

Wire formats (RIFF/WAVE ``fmt `` wFormatTag): 7 = µ-law, 6 = A-law
(8-bit companded bytes, decoded through the exact G.711 segment
tables to 14/13-bit linear), 0x11 = IMA/DVI ADPCM (per-channel
4-byte block headers — predictor int16 + step index — then nibble
pairs, low nibble first, stereo interleaved in 4-byte words per
channel; samples-per-block honored from the fmt extension, total
length from the ``fact`` chunk when present). Output stats are on
the same 16-bit scale as :func:`~engine.pipeline.multimodal.
decode_wav_samples` (normalize by 2^15).

:func:`decode_wav_codec` returns {codec, sample_rate, n_channels,
n_samples, rms, peak} or ``None`` for plain PCM (the existing
decoder's job), unknown format tags, or malformed containers — the
multimodal dispatch contract.

The companion encoders (:func:`encode_wav_ulaw` / ``alaw`` /
``adpcm``) generate spec-valid fixtures any audio tool accepts; the
ADPCM round-trip is tested for bounded reconstruction error (it is
lossy by design) plus bit-exactness against an independent reference
decode of the same nibble stream.

Reference parity note: the reference engine (876 lines of Java/
Python over Lucene) has no media path at all — this module belongs
to the beyond-reference LLM-data-pipeline surface (SURVEY.md §2's
multimodal rows).
"""

from __future__ import annotations

import struct

import numpy as np

# IMA ADPCM reference tables
_STEPS = [7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
          34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118,
          130, 143, 157, 173, 190, 209, 230, 253, 279, 307, 337, 371,
          408, 449, 494, 544, 598, 658, 724, 796, 876, 963, 1060,
          1166, 1282, 1411, 1552, 1707, 1878, 2066, 2272, 2499, 2749,
          3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894, 6484, 7132,
          7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289, 16818,
          18500, 20350, 22385, 24623, 27086, 29794, 32767]
_INDEX_ADJ = [-1, -1, -1, -1, 2, 4, 6, 8]
MAX_SAMPLES = 1 << 28


def _ulaw_decode_table() -> np.ndarray:
    out = np.empty(256, dtype=np.int64)
    for b in range(256):
        u = ~b & 0xFF
        exp = (u >> 4) & 7
        mant = u & 0x0F
        s = (((mant << 3) + 0x84) << exp) - 0x84
        out[b] = -s if u & 0x80 else s
    return out


def _alaw_decode_table() -> np.ndarray:
    out = np.empty(256, dtype=np.int64)
    for b in range(256):
        a = b ^ 0x55
        exp = (a >> 4) & 7
        mant = a & 0x0F
        s = (((mant << 4) + 0x108) << (exp - 1)) if exp \
            else (mant << 4) + 8
        out[b] = s if a & 0x80 else -s      # A-law: sign bit 1 = positive
    return out


_ULAW = _ulaw_decode_table()
_ALAW = _alaw_decode_table()


def _walk_wav(payload: bytes):
    """Yield (fourcc, body) for each RIFF/WAVE chunk, or raise."""
    if len(payload) < 12 or payload[:4] != b"RIFF" \
            or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos = 12
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        body = payload[pos + 8:pos + 8 + size]
        if len(body) < size:
            raise ValueError("truncated chunk")
        yield cid, body
        pos += 8 + size + (size & 1)


def _adpcm_decode_block(data: bytes, n_ch: int,
                        samples_per_block: int) -> list[list[int]]:
    """One IMA ADPCM block → per-channel sample lists (the header
    predictor is the block's first output sample)."""
    chans: list[list[int]] = []
    preds, idxs = [], []
    for c in range(n_ch):
        pred, idx, _rsv = struct.unpack_from("<hBB", data, c * 4)
        if idx > 88:
            raise ValueError("adpcm: bad step index")
        preds.append(pred)
        idxs.append(idx)
        chans.append([pred])
    pos = 4 * n_ch
    # nibble payload: 4-byte words per channel, interleaved
    need = samples_per_block - 1
    while any(len(c) - 1 < need for c in chans):
        for c in range(n_ch):
            if pos + 4 > len(data):
                raise ValueError("adpcm: truncated block")
            word = data[pos:pos + 4]
            pos += 4
            pred, idx = preds[c], idxs[c]
            out = chans[c]
            for byte in word:
                for nib in (byte & 0x0F, byte >> 4):
                    step = _STEPS[idx]
                    diff = step >> 3
                    if nib & 1:
                        diff += step >> 2
                    if nib & 2:
                        diff += step >> 1
                    if nib & 4:
                        diff += step
                    pred = pred - diff if nib & 8 else pred + diff
                    pred = max(-32768, min(32767, pred))
                    idx = max(0, min(88, idx + _INDEX_ADJ[nib & 7]))
                    out.append(pred)
            preds[c], idxs[c] = pred, idx
    return [c[:samples_per_block] for c in chans]


def decode_wav_codec(payload: bytes) -> dict | None:
    """REAL sample decode for compressed WAV — see module docstring.
    Returns {codec, sample_rate, n_channels, n_samples, rms, peak}
    or None (plain PCM included — that is decode_wav_samples' job)."""
    try:
        fmt = data = fact_len = None
        for cid, body in _walk_wav(payload):
            if cid == b"fmt " and len(body) >= 16:
                fmt = body
            elif cid == b"data":
                data = body
            elif cid == b"fact" and len(body) >= 4:
                (fact_len,) = struct.unpack("<I", body[:4])
        if fmt is None or data is None:
            return None
        tag, n_ch, rate, _brate, align, bits = struct.unpack(
            "<HHIIHH", fmt[:16])
        if n_ch < 1 or rate == 0:
            return None
        if tag in (6, 7):                   # A-law / µ-law
            if bits != 8:
                return None
            table = _ALAW if tag == 6 else _ULAW
            idx = np.frombuffer(data, dtype=np.uint8)
            if idx.size > MAX_SAMPLES:
                return None
            samples = table[idx].astype(np.float64)
            codec = "alaw" if tag == 6 else "ulaw"
        elif tag == 0x11:                   # IMA ADPCM
            if bits != 4 or align < 4 * n_ch or align % (4 * n_ch):
                return None
            if len(fmt) >= 20:
                (spb,) = struct.unpack("<H", fmt[18:20])
            else:
                spb = (align - 4 * n_ch) * 2 // n_ch + 1
            if spb != (align - 4 * n_ch) * 2 // n_ch + 1:
                return None
            per_ch: list[list[int]] = [[] for _ in range(n_ch)]
            for off in range(0, len(data) - align + 1, align):
                blk = _adpcm_decode_block(data[off:off + align],
                                          n_ch, spb)
                for acc, b in zip(per_ch, blk):
                    acc.extend(b)
                if len(per_ch[0]) > MAX_SAMPLES:
                    return None
            if not per_ch[0]:
                return None
            if fact_len is not None:        # trim the final block pad
                if fact_len > len(per_ch[0]):
                    return None
                per_ch = [c[:fact_len] for c in per_ch]
            samples = np.array(per_ch, dtype=np.int64).T \
                .reshape(-1).astype(np.float64)
            codec = "adpcm"
        else:
            return None                     # PCM and unknown tags
        if samples.size == 0:
            return {"codec": codec, "sample_rate": rate,
                    "n_channels": n_ch, "n_samples": 0,
                    "rms": 0.0, "peak": 0.0}
        norm = samples / 32768.0
        return {"codec": codec, "sample_rate": rate,
                "n_channels": n_ch, "n_samples": int(samples.size),
                "rms": float(np.sqrt((norm * norm).mean())),
                "peak": float(np.abs(norm).max())}
    except (ValueError, IndexError, struct.error):
        return None


# ---------------------------------------------------------------------------
# fixture encoders


def _wav_container(fmt_body: bytes, data: bytes,
                   fact_len: int | None = None) -> bytes:
    chunks = b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
    if len(fmt_body) & 1:
        chunks += b"\x00"
    if fact_len is not None:
        chunks += b"fact" + struct.pack("<II", 4, fact_len)
    chunks += b"data" + struct.pack("<I", len(data)) + data
    if len(data) & 1:
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" \
        + chunks


def _ulaw_encode(s: int) -> int:
    sign = 0x80 if s < 0 else 0
    s = min(-s if s < 0 else s, 32635) + 0x84
    exp = s.bit_length() - 8                # segment: top bit position
    mant = (s >> (exp + 3)) & 0x0F
    return ~(sign | (exp << 4) | mant) & 0xFF


def _alaw_encode(s: int) -> int:
    sign = 0x80 if s >= 0 else 0
    s = min(-s if s < 0 else s, 32767)
    if s >= 256:
        exp = s.bit_length() - 9
        mant = (s >> (exp + 4)) & 0x0F
        a = (exp + 1) << 4 | mant
    else:
        a = s >> 4
    return (a | sign) ^ 0x55


def encode_wav_ulaw(samples, rate: int = 8000,
                    channels: int = 1) -> bytes:
    data = bytes(_ulaw_encode(int(s)) for s in
                 np.asarray(samples).reshape(-1))
    fmt = struct.pack("<HHIIHH", 7, channels, rate, rate * channels,
                      channels, 8)
    return _wav_container(fmt, data)


def encode_wav_alaw(samples, rate: int = 8000,
                    channels: int = 1) -> bytes:
    data = bytes(_alaw_encode(int(s)) for s in
                 np.asarray(samples).reshape(-1))
    fmt = struct.pack("<HHIIHH", 6, channels, rate, rate * channels,
                      channels, 8)
    return _wav_container(fmt, data)


def encode_wav_adpcm(samples, rate: int = 8000,
                     samples_per_block: int = 505) -> bytes:
    """IMA ADPCM encoder (the reference quantizer). ``samples`` is
    (n,) mono or (n, ch) int16-range; the last block is zero-padded
    on the wire and a ``fact`` chunk records the true length."""
    arr = np.asarray(samples, dtype=np.int64)
    if arr.ndim == 1:
        arr = arr[:, None]
    n, n_ch = arr.shape
    assert (samples_per_block - 1) % 8 == 0, \
        "nibble payload must fill whole 4-byte words"
    align = 4 * n_ch + (samples_per_block - 1) // 2 * n_ch
    data = bytearray()
    idxs = [0] * n_ch
    for start in range(0, n, samples_per_block):
        blk = arr[start:start + samples_per_block]
        if blk.shape[0] < samples_per_block:        # zero-pad the tail
            blk = np.vstack([blk, np.zeros(
                (samples_per_block - blk.shape[0], n_ch),
                dtype=np.int64)])
        preds = []
        nibs: list[list[int]] = []
        for c in range(n_ch):
            pred = int(blk[0, c])
            data += struct.pack("<hBB", pred, idxs[c], 0)
            preds.append(pred)
            nibs.append([])
        for c in range(n_ch):
            pred, idx = preds[c], idxs[c]
            for s in blk[1:, c].tolist():
                step = _STEPS[idx]
                diff = s - pred
                nib = 8 if diff < 0 else 0
                if diff < 0:
                    diff = -diff
                if diff >= step:
                    nib |= 4
                    diff -= step
                if diff >= step >> 1:
                    nib |= 2
                    diff -= step >> 1
                if diff >= step >> 2:
                    nib |= 1
                # reconstruct exactly as the decoder will
                d = step >> 3
                if nib & 1:
                    d += step >> 2
                if nib & 2:
                    d += step >> 1
                if nib & 4:
                    d += step
                pred = pred - d if nib & 8 else pred + d
                pred = max(-32768, min(32767, pred))
                idx = max(0, min(88, idx + _INDEX_ADJ[nib & 7]))
                nibs[c].append(nib)
            idxs[c] = idx
        # interleave: 8 nibbles (one 4-byte word) per channel in turn
        for w in range(0, samples_per_block - 1, 8):
            for c in range(n_ch):
                grp = nibs[c][w:w + 8]
                for k in range(0, 8, 2):
                    data.append(grp[k] | (grp[k + 1] << 4))
    fmt = struct.pack("<HHIIHHHH", 0x11, n_ch, rate,
                      rate * align // samples_per_block, align, 4,
                      2, samples_per_block)
    return _wav_container(fmt, bytes(data), fact_len=n)
