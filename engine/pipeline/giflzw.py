"""GIF pixel decode — pure Python/numpy, no codec libs (the third
member of the dependency-free decoder set: jpegdc.py walks baseline
JPEG entropy, pngpix.py inflates PNG with stdlib zlib, and GIF's only
compression is LZW — a dictionary algorithm needing nothing but this
file).

Supported: GIF87a/GIF89a, global or local color table, the FIRST
image descriptor (animated GIFs: frame 1 — the stats contract, not an
animation player), interlaced row order (the 4-pass reorder),
extension blocks skipped per spec. Transparency (GCE transparent
index) does NOT exclude pixels from the means — same unweighted-stats
contract as the RGBA/alpha paths in pngpix.py. Returns ``None`` — the
multimodal dispatch contract (engine/pipeline/multimodal.py) — for
missing color tables, truncated streams, LZW code-stream corruption,
or frames larger than the bomb guard.

The LZW decoder is the textbook variable-width-code loop (initial
width = min-code-size + 1, grow at table size 2^width, cap 12 bits,
CLEAR resets, EOI stops); the inner loop is per-code Python —
same honesty note as the siblings: decode parallelizes per-payload
across mapInPandas batches here, a production 100 TB media pass
swaps in a compiled kernel, the Spark plumbing carries over.

The companion :func:`encode_gif` emits spec-valid fixtures (real LZW
compression with table growth and CLEAR handling, optional interlace)
that any third-party GIF reader accepts; tests round-trip it against
numpy reference means.
"""

from __future__ import annotations

import struct

import numpy as np

MAX_PIXELS = 1 << 28
_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))   # (start, step)


def _lzw_decode(min_code: int, data: bytes,
                n_expected: int) -> np.ndarray | None:
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    width = min_code + 1
    # table as byte strings; rebuilt on CLEAR
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    out = bytearray()
    acc = bits = 0
    prev: bytes | None = None
    for byte in data:
        acc |= byte << bits
        bits += 8
        while bits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            bits -= width
            if code == clear:
                table = list(base)
                width = min_code + 1
                prev = None
                continue
            if code == eoi:
                if len(out) < n_expected:
                    return None
                return np.frombuffer(
                    bytes(out[:n_expected]), dtype=np.uint8)
            if prev is None:
                if code >= len(table):
                    return None
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):       # the KwKwK case
                entry = prev + prev[:1]
                table.append(entry)
            else:
                return None
            out += entry
            prev = entry
            if len(table) == (1 << width) and width < 12:
                width += 1
            if len(out) >= n_expected:
                # lenient tail: spec wants EOI but real encoders vary
                return np.frombuffer(
                    bytes(out[:n_expected]), dtype=np.uint8)
    return None                             # ran out before the frame


def _deinterlace(idx: np.ndarray, h: int) -> np.ndarray:
    order = [y for start, step in _INTERLACE_PASSES
             for y in range(start, h, step)]
    out = np.empty_like(idx)
    out[np.asarray(order, dtype=np.int64)] = idx
    return out


def decode_gif_pixels(payload: bytes) -> dict | None:
    """Decode the first GIF frame to channel statistics: {width,
    height, n_pixels, mean_r, mean_g, mean_b} (0-255 scale), or
    ``None`` outside the supported envelope — see module doc."""
    if len(payload) < 13 or payload[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    sw, sh, packed, _bg, _ar = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        if pos + 3 * n > len(payload):
            return None
        gct = np.frombuffer(payload, dtype=np.uint8, count=3 * n,
                            offset=pos).reshape(n, 3)
        pos += 3 * n
    while pos < len(payload):
        b = payload[pos]
        if b == 0x3B:                        # trailer
            return None
        if b == 0x21:                        # extension: skip sub-blocks
            pos += 2
            while pos < len(payload) and payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if b != 0x2C:                        # not an image descriptor
            return None
        if pos + 10 > len(payload):
            return None
        _x, _y, w, h, ipacked = struct.unpack(
            "<HHHHB", payload[pos + 1:pos + 10])
        pos += 10
        ct = gct
        if ipacked & 0x80:                   # local color table
            n = 2 << (ipacked & 0x07)
            if pos + 3 * n > len(payload):
                return None
            ct = np.frombuffer(payload, dtype=np.uint8, count=3 * n,
                               offset=pos).reshape(n, 3)
            pos += 3 * n
        if ct is None or w == 0 or h == 0 or w * h > MAX_PIXELS:
            return None
        if pos >= len(payload):
            return None
        min_code = payload[pos]
        pos += 1
        if not 2 <= min_code <= 11:
            return None
        chunks = []
        while pos < len(payload) and payload[pos] != 0:
            n = payload[pos]
            chunk = payload[pos + 1:pos + 1 + n]
            if len(chunk) != n:
                return None
            chunks.append(chunk)
            pos += 1 + n
        idx = _lzw_decode(min_code, b"".join(chunks), w * h)
        if idx is None or int(idx.max()) >= len(ct):
            return None
        idx = idx.reshape(h, w)
        if ipacked & 0x40:
            idx = _deinterlace(idx, h)
        px = ct[idx.astype(np.int64)].astype(np.float64)
        means = px.mean(axis=(0, 1))
        return {"width": int(w), "height": int(h),
                "n_pixels": int(w) * int(h),
                "mean_r": float(means[0]), "mean_g": float(means[1]),
                "mean_b": float(means[2])}
    return None


# ---------------------------------------------------------------------------
# Fixture encoder (tests only — real LZW with table growth + CLEAR)
# ---------------------------------------------------------------------------

def _lzw_encode(min_code: int, idx: bytes) -> bytes:
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    width = min_code + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    acc = bits = 0
    out = bytearray()

    def emit(code: int):
        nonlocal acc, bits
        acc |= code << bits
        bits += width
        while bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            bits -= 8

    emit(clear)
    run = b""
    for ch in idx:
        cand = run + bytes([ch])
        if cand in table:
            run = cand
            continue
        emit(table[run])
        if next_code < (1 << 12):
            table[cand] = next_code
            # decoder grows width when ITS table hits 2^width; its
            # table size tracks next_code, so grow in lockstep
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:                               # table full: reset
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code + 1
        run = bytes([ch])
    if run:
        emit(table[run])
    emit(eoi)
    if bits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(idx: np.ndarray, palette: np.ndarray,
               interlace: bool = False, animated_89a: bool = True,
               min_code: int | None = None) -> bytes:
    """Spec-valid GIF fixture: (h, w) uint8 indices + (n, 3) palette
    (n a power of two ≥ 2). Interlace writes the 4-pass row order."""
    h, w = idx.shape
    n = len(palette)
    assert n & (n - 1) == 0 and n >= 2
    depth = max(1, int(n).bit_length() - 1)
    if min_code is None:
        min_code = max(2, depth)
    hdr = (b"GIF89a" if animated_89a else b"GIF87a") \
        + struct.pack("<HHBBB", w, h, 0x80 | (depth - 1), 0, 0) \
        + bytes(palette.astype(np.uint8))
    rows = idx
    if interlace:
        order = [y for start, step in _INTERLACE_PASSES
                 for y in range(start, h, step)]
        rows = idx[np.asarray(order, dtype=np.int64)]
    body = _lzw_encode(min_code, bytes(rows.astype(np.uint8)))
    sub = b"".join(
        bytes([len(body[i:i + 255])]) + body[i:i + 255]
        for i in range(0, len(body), 255))
    gce = (b"\x21\xf9\x04\x00\x00\x00\x00\x00"   # no-op graphic control
           if animated_89a else b"")
    img = b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h,
                                0x40 if interlace else 0)
    return (hdr + gce + img + bytes([min_code]) + sub + b"\x00"
            + b"\x3b")
