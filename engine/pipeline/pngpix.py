"""Full PNG pixel decode — pure Python/numpy + stdlib ``zlib``, no
codec libs (closing more of the multimodal deep-decode gap the same
way engine/pipeline/jpegdc.py did for baseline JPEG: PNG's only
compression is DEFLATE, which ships in the Python standard library,
so a complete, spec-honest pixel decode needs no third-party codec).

Supported: bit depth 8 or 16, color types 0 (grayscale), 2 (RGB), 3
(palette, 8-bit indices), 4 (gray+alpha), 6 (RGBA); all five
scanline filters (None/Sub/Up/Average/Paeth); Adam7 interlace (each
pass an independently filtered sub-image scattered back onto the
grid); multi-IDAT streams. Returns ``None`` — the multimodal
dispatch contract (engine/pipeline/multimodal.py) — for sub-byte
palette indices (bit depth 1/2/4), CRC mismatches on critical
chunks, truncated/oversized images, or any zlib error.

Channel means are reported on the 0-255 scale (16-bit samples divide
by 257 — the exact 0xFFFF→0xFF mapping); RGBA/gray+alpha means are
UNWEIGHTED by alpha (a stats pass, not compositing). ``n_pixels`` is
width×height regardless of alpha.

Throughput, honestly: unfiltering rows with Sub/Up is vectorized
(mod-256 lane cumsum / row add); Average and Paeth rows fall back to
a per-byte Python loop (their left+up dependency is inherently
sequential). Fine for this environment's correctness-first role —
the decode parallelizes per-payload across mapInPandas batches — and
a production 100 TB media pass would swap in a compiled unfilter
kernel; the Spark-side plumbing (schema, dispatch, Arrow batching)
carries over unchanged.

The companion :func:`encode_png` generates spec-valid fixtures
(forward-filtered scanlines, correct CRCs) that any third-party PNG
reader accepts; the tests round-trip it through
:func:`decode_png_pixels` against numpy reference means.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"
MAX_PIXELS = 1 << 28    # decompression-bomb guard (~268 MP)
# Adam7 pass grid: (x_start, x_step, y_start, y_step), spec order
_ADAM7 = ((0, 8, 0, 8), (4, 8, 0, 8), (0, 4, 4, 8), (2, 4, 0, 4),
          (0, 2, 2, 4), (1, 2, 0, 2), (0, 1, 1, 2))
# channels per color type (palette counts as 1 index channel on the wire)
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _unfilter(raw: np.ndarray, h: int, row_bytes: int,
              bpp: int) -> np.ndarray | None:
    """Invert per-row filtering. ``raw`` is the decompressed stream
    reshaped (h, 1 + row_bytes); returns (h, row_bytes) uint8."""
    out = np.zeros((h, row_bytes), dtype=np.uint8)
    prev = np.zeros(row_bytes, dtype=np.int64)
    for y in range(h):
        ft = int(raw[y, 0])
        row = raw[y, 1:].astype(np.int64)
        if ft == 0:
            rec = row
        elif ft == 1:                   # Sub: mod-256 cumsum per lane
            lanes = row.reshape(-1, bpp)
            rec = np.cumsum(lanes, axis=0).reshape(-1) & 0xFF
        elif ft == 2:                   # Up
            rec = (row + prev) & 0xFF
        elif ft == 3:                   # Average (sequential in x)
            rec = np.zeros(row_bytes, dtype=np.int64)
            for x in range(row_bytes):
                left = rec[x - bpp] if x >= bpp else 0
                rec[x] = (row[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ft == 4:                   # Paeth (sequential in x)
            rec = np.zeros(row_bytes, dtype=np.int64)
            for x in range(row_bytes):
                left = rec[x - bpp] if x >= bpp else 0
                ul = prev[x - bpp] if x >= bpp else 0
                rec[x] = (row[x] + _paeth(int(left), int(prev[x]),
                                          int(ul))) & 0xFF
        else:
            return None
        out[y] = rec.astype(np.uint8)
        prev = rec
    return out


def _adam7_expand(raw: bytes, w: int, h: int,
                  bpp: int) -> np.ndarray | None:
    """Reassemble an Adam7-interlaced stream: each pass is an
    independently filtered sub-image (prev row zero at pass start);
    pixels scatter back onto the (y0::dy, x0::dx) grid."""
    img = np.zeros((h, w * bpp), dtype=np.uint8)
    pos = 0
    for x0, dx, y0, dy in _ADAM7:
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue
        rb = pw * bpp
        need = ph * (1 + rb)
        if pos + need > len(raw):
            return None
        rec = _unfilter(
            np.frombuffer(raw, dtype=np.uint8, count=need,
                          offset=pos).reshape(ph, 1 + rb),
            ph, rb, bpp)
        pos += need
        if rec is None:
            return None
        cells = rec.reshape(ph, pw, bpp)
        ys = np.arange(y0, h, dy)
        xs = np.arange(x0, w, dx)
        for j in range(bpp):
            img[np.ix_(ys, xs * bpp + j)] = cells[:, :, j]
    if pos != len(raw):
        return None
    return img


def decode_png_pixels(payload: bytes) -> dict | None:
    """Decode a PNG payload to channel statistics: {width, height,
    n_pixels, mean_r, mean_g, mean_b} (0-255 scale), or ``None``
    when the container isn't a decodable flavor — see module doc for
    the supported envelope."""
    if len(payload) < 8 + 25 or payload[:8] != PNG_SIG:
        return None
    pos, ihdr, plte, idat = 8, None, None, []
    while pos + 12 <= len(payload):
        (size,) = struct.unpack(">I", payload[pos:pos + 4])
        ctype = payload[pos + 4:pos + 8]
        if pos + 12 + size > len(payload):
            return None                 # truncated chunk (body or CRC)
        body = payload[pos + 8:pos + 8 + size]
        if ctype == b"IHDR" and size < 13:
            return None
        if ctype in (b"IHDR", b"PLTE", b"IDAT"):
            (crc,) = struct.unpack(
                ">I", payload[pos + 8 + size:pos + 12 + size])
            if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
                return None
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body[:13])
        elif ctype == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
        pos += 12 + size
    if ihdr is None or not idat:
        return None
    w, h, depth, color, comp, filt, interlace = ihdr
    if (comp != 0 or filt != 0 or interlace not in (0, 1)
            or color not in _CHANNELS or w == 0 or h == 0
            or w * h > MAX_PIXELS):
        return None
    if depth not in (8, 16) or (color == 3 and depth != 8):
        return None                     # sub-byte palette: documented gap
    ch = _CHANNELS[color]
    bpp = ch * (depth // 8)             # filter unit, per the spec
    row_bytes = w * bpp
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error:
        return None
    if interlace == 1:
        rec = _adam7_expand(raw, w, h, bpp)
    else:
        if len(raw) != h * (1 + row_bytes):
            return None
        rec = _unfilter(
            np.frombuffer(raw, dtype=np.uint8).reshape(
                h, 1 + row_bytes),
            h, row_bytes, bpp)
    if rec is None:
        return None
    if depth == 16:
        px = (rec.reshape(h, w, ch, 2).astype(np.float64) @ [256.0, 1.0]
              ) / 257.0                 # exact 0xFFFF -> 0xFF scale
    else:
        px = rec.reshape(h, w, ch).astype(np.float64)
    if color == 3:
        if plte is None or int(px.max()) >= len(plte):
            return None
        px = plte[rec.reshape(h, w).astype(np.int64)].astype(np.float64)
        ch = 3
    if ch >= 3:
        means = px[:, :, :3].mean(axis=(0, 1))
        mr, mg, mb = (float(means[0]), float(means[1]), float(means[2]))
    else:                               # gray / gray+alpha
        g = float(px[:, :, 0].mean())
        mr = mg = mb = g
    return {"width": int(w), "height": int(h),
            "n_pixels": int(w) * int(h),
            "mean_r": mr, "mean_g": mg, "mean_b": mb}


# ---------------------------------------------------------------------------
# Fixture encoder (tests only — forward filters, real CRCs)
# ---------------------------------------------------------------------------

def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))


def _forward_filter(rows: np.ndarray, bpp: int,
                    filters: list[int]) -> list[bytes]:
    """Forward-filter (n, row_bytes) int64 rows; prev starts zero
    (also per Adam7 pass, which filters independently)."""
    n, row_bytes = rows.shape
    out, prev = [], np.zeros(row_bytes, dtype=np.int64)
    for y in range(n):
        ft = filters[y % len(filters)]
        row = rows[y]
        if ft == 0:
            f = row
        elif ft == 1:
            left = np.zeros_like(row)
            left[bpp:] = row[:-bpp]
            f = (row - left) & 0xFF
        elif ft == 2:
            f = (row - prev) & 0xFF
        elif ft == 3:
            f = np.zeros_like(row)
            for x in range(row_bytes):
                left = row[x - bpp] if x >= bpp else 0
                f[x] = (row[x] - ((left + prev[x]) >> 1)) & 0xFF
        else:
            f = np.zeros_like(row)
            for x in range(row_bytes):
                left = row[x - bpp] if x >= bpp else 0
                ul = prev[x - bpp] if x >= bpp else 0
                f[x] = (row[x] - _paeth(int(left), int(prev[x]),
                                        int(ul))) & 0xFF
        out.append(bytes([ft]) + bytes(f.astype(np.uint8)))
        prev = row
    return out


def encode_png(arr: np.ndarray, color: int, depth: int = 8,
               filters: list[int] | None = None,
               palette: np.ndarray | None = None,
               interlace: int = 0) -> bytes:
    """Spec-valid PNG encoder for test fixtures. ``arr`` is (h, w) for
    color types 0/3 or (h, w, channels) otherwise, dtype uint8
    (depth 8) or uint16 (depth 16); ``filters`` picks the per-row
    filter type (default cycles 0..4); ``interlace=1`` writes real
    Adam7 passes. Palette required for color 3."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    assert ch == _CHANNELS[color], (ch, color)
    bpp = ch * (depth // 8)
    if depth == 16:
        wire = np.ascontiguousarray(arr.astype(">u2")).view(np.uint8)
    else:
        wire = arr.astype(np.uint8)
    filters = filters or [y % 5 for y in range(h)]
    px = wire.reshape(h, w, bpp)
    if interlace == 1:
        out = []
        for x0, dx, y0, dy in _ADAM7:
            sub = px[y0::dy, x0::dx]
            if sub.shape[0] and sub.shape[1]:
                out += _forward_filter(
                    sub.reshape(sub.shape[0], -1).astype(np.int64),
                    bpp, filters)
    else:
        out = _forward_filter(
            px.reshape(h, w * bpp).astype(np.int64), bpp, filters)
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, interlace)
    png = [PNG_SIG, _chunk(b"IHDR", ihdr)]
    if color == 3:
        png.append(_chunk(b"PLTE", bytes(palette.astype(np.uint8))))
    body = zlib.compress(b"".join(out), 6)
    png.append(_chunk(b"IDAT", body[:len(body) // 2]))
    png.append(_chunk(b"IDAT", body[len(body) // 2:]))  # multi-IDAT path
    png.append(_chunk(b"IEND", b""))
    return b"".join(png)
