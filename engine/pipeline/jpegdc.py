"""Baseline JPEG DC-only decode — pure Python/numpy, no codec libs
(VERDICT r4 item 8: upgrade the compressed-image stub to a real
baseline decoder where that is cheap and honest).

What "DC-only" buys exactly: the 63 AC basis functions of the 8×8
DCT are zero-mean, so a block's PIXEL MEAN is fully determined by its
dequantized DC coefficient — mean = DC·Q[0]/8 + 128 (8-bit level
shift) — regardless of AC content (modulo the codec's final [0,255]
clamp, which only bites on saturated blocks). Decoding therefore
walks the FULL entropy stream (Huffman is variable-length — AC codes
must be decoded to be skipped) but keeps only DC terms, yielding
exact per-block means and hence exact image-level channel means for
full blocks, at a fraction of a full IDCT decode. This is the
classic "decode the DC image" trick thumbnail/stats pipelines use.

Supported: baseline sequential DCT (SOF0) with a single interleaved
scan, AND progressive DCT (SOF2, r5): progressive streams deliver
the DC term as one Huffman first scan (successive approximation)
plus raw-bit refinement scans, while AC scans never carry DC bits —
so the DC image decodes from the DC scans alone and AC scans are
skipped WITHOUT entropy decoding (inside scan data every true 0xFF
is stuffed, so the next unstuffed non-RST 0xFF ends the scan). Both
paths: 8-bit samples, 1 or 3 components, arbitrary h×v sampling
factors (4:4:4/4:2:2/4:2:0 …), 8- and 16-bit DQT precision, restart
markers (DRI/RSTn), progressive interleaved or single-component DC
scans and mid-stream DHT/DQT/DRI. Returns None — the multimodal
dispatch contract (engine/pipeline/multimodal.py) — for anything
else (arithmetic coding, 12-bit, lossless/hierarchical), which
stays the documented stub.

Throughput, honestly: the entropy walk is a per-bit Python loop —
~270 KB of compressed stream/sec/core measured (a large photo costs
seconds). That is fine for this environment's correctness-first role
(the decode parallelizes per-payload across mapInPandas batches, so
wall-clock scales with cores), but a production 100 TB media pass
would swap this exact algorithm into a vectorized/compiled kernel or
a codec lib — the Spark-side plumbing (schema, dispatch, batching)
is the part that carries over unchanged.

The companion :func:`encode_jpeg_baseline` exists to GENERATE test
fixtures without codec libs: a spec-valid baseline encoder restricted
to DC-only blocks (every block emits its DC code then EOB — legal
JPEG, just maximally compressed-looking), minimal custom Huffman
tables carried in DHT as the spec requires, 4:4:4 sampling, optional
restart intervals. Any third-party baseline decoder reads its output;
the tests round-trip it through :func:`decode_jpeg_dc`.
"""

from __future__ import annotations

import struct

import numpy as np

ZIGZAG_DC = 0   # quant tables arrive in zigzag order; DC is index 0


# ---------------------------------------------------------------------------
# Bit I/O over the entropy-coded segment (0xFF00 byte stuffing)
# ---------------------------------------------------------------------------

class _BitReader:
    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos          # next byte index
        self.bit = 0            # bits consumed of current byte
        self.marker = None      # pending marker (0xFFxx) hit mid-stream

    def _cur(self) -> int:
        if self.pos >= len(self.data):
            raise EOFError("entropy stream truncated")
        return self.data[self.pos]

    def read_bit(self) -> int:
        if self.marker is not None:
            raise EOFError("read past marker")
        b = self._cur()
        if b == 0xFF and self.bit == 0:
            nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) \
                else None
            if nxt is None:
                raise EOFError("dangling 0xFF")
            if nxt != 0x00:
                self.marker = 0xFF00 | nxt
                raise EOFError("marker in stream")
        bit = (b >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
            if b == 0xFF:       # skip the stuffed 0x00
                self.pos += 1
        return bit

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_past_rst(self) -> None:
        """Consume padding to the next RSTn marker and step over it.
        Safe scan: inside entropy data every real 0xFF is stuffed with
        0x00, so FF Dx before the marker cannot be a false positive —
        only padding (1-bits, possibly a stuffed 0xFF pad byte) sits
        between the current position and the marker."""
        self.bit = 0
        while self.pos + 1 < len(self.data):
            if self.data[self.pos] == 0xFF and \
                    0xD0 <= self.data[self.pos + 1] <= 0xD7:
                self.pos += 2
                self.marker = None
                return
            self.pos += 1
        raise EOFError("expected RST marker")


class _Huff:
    """Canonical JPEG Huffman table (BITS counts + HUFFVAL symbols)."""

    def __init__(self, bits: list[int], vals: bytes):
        self.lookup: dict[tuple[int, int], int] = {}
        code, k = 0, 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.lookup[(length, code)] = vals[k]
                code += 1
                k += 1
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | br.read_bit()
            length += 1
            sym = self.lookup.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")


def _extend(v: int, s: int) -> int:
    """JPEG EXTEND: s-bit raw value → signed coefficient."""
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

def decode_jpeg_dc(payload: bytes) -> dict | None:
    """Decode a baseline JPEG's DC image; see module docstring.

    Returns {width, height, n_pixels, n_blocks, mean_r, mean_g,
    mean_b} (grayscale: the Y mean on all three channels) or None for
    unsupported/corrupt streams. Channel means are computed from the
    per-component DC means in YCbCr, converted with the JFIF matrix —
    exact for full blocks; images whose dimensions are not multiples
    of the MCU size include the encoder's edge-padding blocks in the
    mean (noted divergence from a cropped full decode)."""
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        return None
    try:
        return _decode(payload)
    except (EOFError, ValueError, IndexError, KeyError, struct.error,
            ZeroDivisionError):
        return None


def _parse_dqt(body: bytes, qt: dict) -> None:
    i = 0
    while i < len(body):
        pq, tq = body[i] >> 4, body[i] & 0x0F
        i += 1
        if pq == 0:
            tab = np.frombuffer(body[i:i + 64], dtype=np.uint8)
            i += 64
        else:
            tab = np.frombuffer(body[i:i + 128], dtype=">u2")
            i += 128
        qt[tq] = tab.astype(np.int64)


def _parse_dht(body: bytes, huff_dc: dict, huff_ac: dict) -> None:
    i = 0
    while i < len(body):
        tc, th = body[i] >> 4, body[i] & 0x0F
        bits = list(body[i + 1:i + 17])
        n = sum(bits)
        vals = bytes(body[i + 17:i + 17 + n])
        (huff_dc if tc == 0 else huff_ac)[th] = _Huff(bits, vals)
        i += 17 + n


def _parse_sof(body: bytes) -> dict | None:
    prec, h, w, nc = struct.unpack(">BHHB", body[:6])
    if prec != 8 or nc not in (1, 3) or h == 0 or w == 0:
        return None
    comps = []
    for c in range(nc):
        cid, samp, tq = body[6 + 3 * c:9 + 3 * c]
        comps.append({"id": cid, "h": samp >> 4, "v": samp & 0x0F,
                      "tq": tq})
    return {"w": w, "h": h, "comps": comps}


def _decode(payload: bytes) -> dict | None:
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _Huff] = {}
    huff_ac: dict[int, _Huff] = {}
    frame = None
    restart_interval = 0

    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            return None
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:          # EOI before SOS
            return None
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue                # standalone
        (seglen,) = struct.unpack(">H", payload[pos:pos + 2])
        body = payload[pos + 2:pos + seglen]
        if marker == 0xDB:          # DQT
            _parse_dqt(body, qt)
        elif marker == 0xC4:        # DHT
            _parse_dht(body, huff_dc, huff_ac)
        elif marker == 0xC0:        # SOF0 baseline
            frame = _parse_sof(body)
            if frame is None:
                return None
        elif marker == 0xC2:        # SOF2 progressive: DC-image path
            frame = _parse_sof(body)
            if frame is None:
                return None
            frame["progressive"] = True
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            return None             # extended/lossless/arithmetic
        elif marker == 0xDD:        # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:        # SOS
            if frame is None:
                return None
            if frame.get("progressive"):
                # multi-scan walk owns the stream from here on
                return _decode_progressive(payload, pos - 2, frame, qt,
                                           huff_dc, huff_ac,
                                           restart_interval)
            ns = body[0]
            scan = []
            for c in range(ns):
                cs, tables = body[1 + 2 * c], body[2 + 2 * c]
                comp = next((x for x in frame["comps"]
                             if x["id"] == cs), None)
                if comp is None:
                    return None
                scan.append({**comp, "td": tables >> 4,
                             "ta": tables & 0x0F})
            if len(scan) != len(frame["comps"]):
                return None         # baseline multi-scan: unsupported
            return _decode_scan(payload, pos + seglen, frame, scan, qt,
                                huff_dc, huff_ac, restart_interval)
        pos += seglen
    return None


def _decode_scan(payload, pos, frame, scan, qt, huff_dc, huff_ac,
                 restart_interval):
    if len(scan) == 1:
        # single-component scans are NON-interleaved (spec F.2.1):
        # one data unit per MCU, sampling factors do not group blocks
        scan = [{**scan[0], "h": 1, "v": 1}]
    hmax = max(c["h"] for c in scan)
    vmax = max(c["v"] for c in scan)
    if hmax < 1 or vmax < 1:
        return None
    w, h = frame["w"], frame["h"]
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    br = _BitReader(payload, pos)
    pred = [0] * len(scan)
    dc_sum = [0] * len(scan)       # Σ quantized DC per component
    dc_n = [0] * len(scan)
    mcu_count = 0
    for _my in range(mcuy):
        for _mx in range(mcux):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                br.align_past_rst()
                pred = [0] * len(scan)
            for ci, comp in enumerate(scan):
                dct = huff_dc.get(comp["td"])
                act = huff_ac.get(comp["ta"])
                if dct is None or act is None:
                    return None
                for _b in range(comp["h"] * comp["v"]):
                    s = dct.decode(br)
                    if s > 11:
                        return None
                    diff = _extend(br.read_bits(s), s)
                    pred[ci] += diff
                    dc_sum[ci] += pred[ci]
                    dc_n[ci] += 1
                    k = 1
                    while k <= 63:  # AC: decode to skip
                        rs = act.decode(br)
                        r, size = rs >> 4, rs & 0x0F
                        if size == 0:
                            if r == 15:
                                k += 16     # ZRL
                                continue
                            break           # EOB
                        k += r
                        br.read_bits(size)
                        k += 1
            mcu_count += 1
    means = []
    for ci, comp in enumerate(scan):
        q = qt.get(comp["tq"])
        if q is None or dc_n[ci] == 0:
            return None
        mean_dc = dc_sum[ci] / dc_n[ci] * float(q[ZIGZAG_DC])
        means.append(mean_dc / 8.0 + 128.0)
    return _finish(w, h, int(sum(dc_n)), means)


def _finish(w: int, h: int, n_blocks: int, means: list) -> dict:
    """Per-component DC means (pixel scale) → channel means via the
    JFIF YCbCr matrix, clamped to [0, 255]."""
    if len(means) == 1:
        y = min(max(means[0], 0.0), 255.0)
        r = g = b = y
    else:
        y, cb, cr = means
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        r, g, b = (min(max(v, 0.0), 255.0) for v in (r, g, b))
    return {"width": w, "height": h, "n_pixels": w * h,
            "n_blocks": n_blocks,
            "mean_r": float(r), "mean_g": float(g), "mean_b": float(b)}


# ---------------------------------------------------------------------------
# Progressive (SOF2) DC-image path
# ---------------------------------------------------------------------------
#
# Progressive streams split coefficients across scans: the DC term
# arrives as ONE Huffman-coded first scan (values divided by 2^Al,
# successive approximation) plus Al raw-bit refinement scans; AC
# terms arrive in separate per-component scans that NEVER carry DC
# bits. The DC image therefore needs only the DC scans — AC scans
# can be skipped WITHOUT entropy decoding (inside scan data every
# true 0xFF is stuffed with 0x00, so the next unstuffed non-RST
# 0xFF is the scan's end marker). Per-block coefficient storage (not
# running sums) is required because refinements OR bits into blocks
# decoded earlier.


def _skip_entropy(payload: bytes, pos: int) -> int:
    """Position of the first marker after an entropy-coded segment
    (skips stuffed 0xFF00 and RSTn)."""
    while pos + 1 < len(payload):
        if payload[pos] == 0xFF:
            nxt = payload[pos + 1]
            if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
                pos += 2
                continue
            return pos
        pos += 1
    return len(payload)


def _decode_progressive(payload, pos, frame, qt, huff_dc, huff_ac,
                        restart_interval):
    comps = frame["comps"]
    w, h = frame["w"], frame["h"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax < 1 or vmax < 1:
        return None
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    grids, true_dims = [], []
    for c in comps:
        grids.append(np.zeros((mcuy * c["v"], mcux * c["h"]),
                              dtype=np.int64))
        cw = -(-(w * c["h"]) // hmax)       # component sample dims
        ch_ = -(-(h * c["v"]) // vmax)
        true_dims.append((-(-ch_ // 8), -(-cw // 8)))   # (rows, cols)
    seen_dc = False

    while pos + 2 <= len(payload):
        if payload[pos] != 0xFF:
            return None
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:                  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        (seglen,) = struct.unpack(">H", payload[pos:pos + 2])
        body = payload[pos + 2:pos + seglen]
        if marker == 0xDB:
            _parse_dqt(body, qt)
        elif marker == 0xC4:
            _parse_dht(body, huff_dc, huff_ac)
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:
            ns = body[0]
            scan = []
            for c in range(ns):
                cs, tables = body[1 + 2 * c], body[2 + 2 * c]
                ci = next((i for i, x in enumerate(comps)
                           if x["id"] == cs), None)
                if ci is None:
                    return None
                scan.append({"ci": ci, "td": tables >> 4})
            ss = body[1 + 2 * ns]
            ahal = body[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            data = pos + seglen
            if ss == 0:                     # DC scan (first or refine)
                end = _dc_scan(payload, data, comps, scan, grids,
                               true_dims, mcux, mcuy, ah, al,
                               huff_dc, restart_interval)
                if end is None:
                    return None
                pos = end
                seen_dc = True
            else:                           # AC scan: marker-skip
                pos = _skip_entropy(payload, data)
            continue
        elif marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            return None                     # second frame: malformed
        pos += seglen
    if not seen_dc:
        return None
    means, n_blocks = [], 0
    for ci, comp in enumerate(comps):
        q = qt.get(comp["tq"])
        if q is None:
            return None
        th, tw = true_dims[ci]
        crop = grids[ci][:th, :tw]          # padding blocks excluded
        n_blocks += crop.size
        means.append(float(crop.mean()) * float(q[ZIGZAG_DC]) / 8.0
                     + 128.0)
    return _finish(w, h, n_blocks, means)


def _dc_scan(payload, pos, comps, scan, grids, true_dims, mcux, mcuy,
             ah, al, huff_dc, restart_interval):
    """One progressive DC scan: ``ah == 0`` is the Huffman-coded
    first pass (diffs of DC >> al, stored << al); ``ah > 0`` is a
    refinement (one raw bit per block, OR'd in at position al —
    two's-complement OR matches the reference decoders). Interleaved
    (ns > 1, MCU order) or single-component (raster over the
    component's true block dims). Returns the position of the next
    marker, or None on corruption."""
    br = _BitReader(payload, pos)
    pred = [0] * len(scan)
    if len(scan) > 1:                       # interleaved MCU order
        units = [(my, mx) for my in range(mcuy) for mx in range(mcux)]

        def blocks(my, mx):
            for si, sc in enumerate(scan):
                c = comps[sc["ci"]]
                for bv in range(c["v"]):
                    for bh in range(c["h"]):
                        yield (si, my * c["v"] + bv, mx * c["h"] + bh)
    else:
        th, tw = true_dims[scan[0]["ci"]]
        units = [(by, bx) for by in range(th) for bx in range(tw)]

        def blocks(by, bx):
            yield (0, by, bx)
    mcu_count = 0
    for uy, ux in units:
        if restart_interval and mcu_count and \
                mcu_count % restart_interval == 0:
            br.align_past_rst()
            pred = [0] * len(scan)
        for si, gy, gx in blocks(uy, ux):
            grid = grids[scan[si]["ci"]]
            if ah == 0:
                dct = huff_dc.get(scan[si]["td"])
                if dct is None:
                    return None
                s = dct.decode(br)
                if s > 11:
                    return None
                pred[si] += _extend(br.read_bits(s), s)
                grid[gy, gx] = pred[si] << al
            elif br.read_bit():
                grid[gy, gx] |= 1 << al
        mcu_count += 1
    return _skip_entropy(payload, br.pos)


# ---------------------------------------------------------------------------
# Fixture encoder (spec-valid baseline, DC-only blocks)
# ---------------------------------------------------------------------------

# flat quant tables keep fixture math exact: DC quantizer 8 makes the
# quantized DC equal round(block_mean) - 128 exactly
_FIXTURE_Q = 8

# DC categories 0..11 as canonical 4-bit codes (12 codes of length 4:
# 0000..1011 — prefix-free, no all-ones code)
_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = bytes(range(12))
# AC table with the single symbol EOB (0x00) as code '0'
_AC_BITS = [1] + [0] * 15
_AC_VALS = bytes([0x00])


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)   # byte stuffing
                self.acc = 0
                self.nbits = 0

    def pad_to_byte(self) -> None:
        while self.nbits:
            self.write(1, 1)                # pad with 1s per spec


def _dc_code(bw: _BitWriter, diff: int) -> None:
    s = 0 if diff == 0 else int(abs(diff)).bit_length()
    assert s <= 11
    bw.write(0b0000 + s, 4)                 # category s → code s (4 bits)
    if s:
        bw.write(diff if diff > 0 else diff + (1 << s) - 1, s)


def encode_jpeg_baseline(img: np.ndarray,
                         restart_interval: int = 0) -> bytes:
    """Encode an (H, W) grayscale or (H, W, 3) RGB uint8 array as a
    spec-valid baseline JPEG whose blocks carry ONLY their DC term
    (each block's pixels decode to the block's rounded mean) — the
    fixture generator for :func:`decode_jpeg_dc`. 4:4:4 sampling,
    flat quant tables (DC quantizer 8 → quantized DC =
    round(block_mean) − 128 exactly), minimal DHT tables, optional
    DRI/RSTn emission."""
    img = np.asarray(img, dtype=np.float64)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    assert h > 0 and w > 0
    if gray:
        planes = [img]
    else:
        r, g, b = img[..., 0], img[..., 1], img[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]

    out = bytearray(b"\xff\xd8")                    # SOI
    qtab = bytes([0x00]) + bytes([_FIXTURE_Q] * 64)
    out += b"\xff\xdb" + struct.pack(">H", 2 + len(qtab)) + qtab
    nc = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for c in range(nc):
        sof += bytes([c + 1, 0x11, 0])              # 1×1 sampling, Q0
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    dht = bytes([0x00]) + bytes(_DC_BITS) + _DC_VALS \
        + bytes([0x10]) + bytes(_AC_BITS) + _AC_VALS
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([nc])
    for c in range(nc):
        sos += bytes([c + 1, 0x00])                 # DC 0 / AC 0
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    bw = _BitWriter()
    pred = [0] * nc
    bx, by = -(-w // 8), -(-h // 8)
    mcu_count = 0
    rst = 0
    for j in range(by):
        for i in range(bx):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                bw.pad_to_byte()
                out += bw.out
                bw = _BitWriter()
                out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                pred = [0] * nc
            for ci, plane in enumerate(planes):
                blk = plane[j * 8:(j + 1) * 8, i * 8:(i + 1) * 8]
                # edge blocks: replicate-pad to 8×8 (the standard
                # encoder convention)
                if blk.shape != (8, 8):
                    blk = np.pad(blk, ((0, 8 - blk.shape[0]),
                                       (0, 8 - blk.shape[1])),
                                 mode="edge")
                dc = int(round(blk.mean())) - 128   # quantizer 8 ÷ 8·mean
                _dc_code(bw, dc - pred[ci])
                pred[ci] = dc
                bw.write(0, 1)                      # EOB
            mcu_count += 1
    bw.pad_to_byte()
    out += bw.out
    out += b"\xff\xd9"                              # EOI
    return bytes(out)


# progressive AC table: the 15 EOBn symbols (n<<4, n=0..14) at code
# length 4 (codes 0000..1110 — prefix-free, all-ones unused)
_ACP_BITS = [0, 0, 0, 15] + [0] * 12
_ACP_VALS = bytes([n << 4 for n in range(15)])


def encode_jpeg_progressive(img: np.ndarray, al: int = 1,
                            restart_interval: int = 0) -> bytes:
    """Encode an (H, W) grayscale or (H, W, 3) RGB uint8 array as a
    spec-valid PROGRESSIVE JPEG (SOF2) whose blocks carry only their
    DC term — the fixture generator for the progressive path of
    :func:`decode_jpeg_dc`. Scan sequence: one interleaved DC first
    scan at successive-approximation ``Al=al``, then ``al``
    one-bit-per-block DC refinement scans down to Al=0, then one
    all-zero AC scan per component coded as EOB runs (which the
    decoder must marker-skip). 4:4:4 sampling, flat quant tables,
    optional DRI/RSTn in every scan."""
    img = np.asarray(img, dtype=np.float64)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    assert h > 0 and w > 0 and 0 <= al <= 13
    if gray:
        planes = [img]
    else:
        r, g, b = img[..., 0], img[..., 1], img[..., 2]
        planes = [0.299 * r + 0.587 * g + 0.114 * b,
                  -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
                  0.5 * r - 0.418688 * g - 0.081312 * b + 128.0]
    nc = len(planes)
    bx, by = -(-w // 8), -(-h // 8)
    # per-component quantized DC grid (flat Q, DC quantizer 8)
    dcs = []
    for plane in planes:
        grid = np.zeros((by, bx), dtype=np.int64)
        for j in range(by):
            for i in range(bx):
                blk = plane[j * 8:(j + 1) * 8, i * 8:(i + 1) * 8]
                if blk.shape != (8, 8):
                    blk = np.pad(blk, ((0, 8 - blk.shape[0]),
                                       (0, 8 - blk.shape[1])),
                                 mode="edge")
                grid[j, i] = int(round(blk.mean())) - 128
        dcs.append(grid)

    out = bytearray(b"\xff\xd8")
    qtab = bytes([0x00]) + bytes([_FIXTURE_Q] * 64)
    out += b"\xff\xdb" + struct.pack(">H", 2 + len(qtab)) + qtab
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for c in range(nc):
        sof += bytes([c + 1, 0x11, 0])
    out += b"\xff\xc2" + struct.pack(">H", 2 + len(sof)) + sof
    dht = bytes([0x00]) + bytes(_DC_BITS) + _DC_VALS \
        + bytes([0x10]) + bytes(_ACP_BITS) + _ACP_VALS
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    rst = [0]

    def flush(bw):
        bw.pad_to_byte()
        out.extend(bw.out)

    def emit_rst():
        out.extend(bytes([0xFF, 0xD0 + rst[0]]))
        rst[0] = (rst[0] + 1) % 8

    def sos(comp_ids, tds, ss, se, ah, al_):
        s = bytes([len(comp_ids)])
        for cid, td in zip(comp_ids, tds):
            s += bytes([cid, td])
        s += bytes([ss, se, (ah << 4) | al_])
        out.extend(b"\xff\xda" + struct.pack(">H", 2 + len(s)) + s)

    # --- DC first scan (interleaved, Al=al) ---
    sos(list(range(1, nc + 1)), [0x00] * nc, 0, 0, 0, al)
    bw = _BitWriter()
    pred = [0] * nc
    mcu = 0
    for j in range(by):
        for i in range(bx):
            if restart_interval and mcu and mcu % restart_interval == 0:
                flush(bw)
                bw = _BitWriter()
                emit_rst()
                pred = [0] * nc
            for ci in range(nc):
                v = int(dcs[ci][j, i]) >> al
                _dc_code(bw, v - pred[ci])
                pred[ci] = v
            mcu += 1
    flush(bw)

    # --- DC refinement scans (one raw bit per block per scan) ---
    for bit in range(al - 1, -1, -1):
        sos(list(range(1, nc + 1)), [0x00] * nc, 0, 0, bit + 1, bit)
        bw = _BitWriter()
        mcu = 0
        for j in range(by):
            for i in range(bx):
                if restart_interval and mcu and \
                        mcu % restart_interval == 0:
                    flush(bw)
                    bw = _BitWriter()
                    emit_rst()
                for ci in range(nc):
                    bw.write((int(dcs[ci][j, i]) >> bit) & 1, 1)
                mcu += 1
        flush(bw)

    # --- AC scans: all-zero spectra as EOB runs (per component) ---
    for ci in range(nc):
        sos([ci + 1], [0x00], 1, 63, 0, 0)
        bw = _BitWriter()
        remaining = bx * by
        seg = restart_interval or remaining
        while remaining:
            run = min(remaining, seg)
            remaining -= run
            while run:
                n = min(14, run.bit_length() - 1)
                chunk = min(run, (1 << (n + 1)) - 1)
                # canonical code for symbol n<<4 is n at length 4
                # (_ACP_VALS order), NOT the raw symbol byte
                bw.write(n, 4)
                if n:
                    bw.write(chunk - (1 << n), n)
                run -= chunk
            if remaining:
                flush(bw)
                bw = _BitWriter()
                emit_rst()
        flush(bw)

    out += b"\xff\xd9"
    return bytes(out)
