"""AVI/MJPEG video frame decode — pure Python, no codec libs
(closing the VIDEO half of the multimodal deep-decode gap: Motion
JPEG stores each frame as a complete baseline/progressive JPEG inside
a RIFF AVI container, so a spec-honest frame walk is a RIFF chunk
scan and the per-frame pixel work is exactly the DC-image decoder
this repo already has, engine/pipeline/jpegdc.py).

Container per the Microsoft AVI RIFF spec: ``RIFF``/``AVI `` outer
form; ``LIST hdrl`` with the ``avih`` MainAVIHeader
(dwMicroSecPerFrame → fps/duration, dwTotalFrames, dwWidth/dwHeight)
and a ``LIST strl`` per stream (``strh`` fccType ``vids`` handler
``MJPG``, ``strf`` BITMAPINFOHEADER biCompression ``MJPG``);
``LIST movi`` holding the frame chunks (``00dc``/``00db`` — compressed
/ uncompressed naming only, both JPEG payloads under MJPEG); optional
``idx1`` index (skipped — the sequential walk needs no seek table).
Word-aligned chunks throughout.

:func:`decode_avi_mjpeg` walks every video frame chunk through the
FULL baseline pixel decoder
(:func:`~engine.pipeline.jpegfull.decode_jpeg_pixels`, r5 late —
exact edge-cropped means), falling back per-frame to
:func:`~engine.pipeline.jpegdc.decode_jpeg_dc` for streams the full
path declines, and aggregates pixel-weighted channel means — a real
decode of every frame, not a header skim. Any undecodable frame, malformed chunk nesting, missing
MJPEG video stream, or bomb-sized frame count returns ``None`` (the
multimodal dispatch contract). :func:`decode_avi_frame_stats`
returns the per-frame timeline (frame_idx, t_ms, per-frame means) —
the step engine/pipeline/multimodal.py's ``sample_frames`` laid out
as a stub now decodes for real on MJPEG input.

The companion :func:`encode_avi_mjpeg` generates spec-valid fixtures
(real avih/strh/strf headers, real per-frame JPEGs via
``encode_jpeg_baseline``, correct idx1) that any MJPEG-capable player
accepts; tests round-trip it against numpy reference means.

Reference parity note: the reference engine (876 lines of Java/
Python over Lucene) has no media path at all — this module belongs
to the beyond-reference LLM-data-pipeline surface (SURVEY.md §2's
multimodal rows).
"""

from __future__ import annotations

import struct

import numpy as np

from .jpegdc import decode_jpeg_dc, encode_jpeg_baseline

MAX_FRAMES = 1 << 20            # bomb guard (~1M frames)


def _walk_chunks(payload: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_size) for each chunk in
    [start, end); LIST chunks yield ('LIST:<type>', ...) with the body
    past the 4-byte list type. Raises ValueError on malformed sizes."""
    pos = start
    while pos + 8 <= end:
        cid = payload[pos:pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        body = pos + 8
        if body + size > end:
            raise ValueError("avi: chunk overruns container")
        if cid == b"LIST":
            if size < 4:
                raise ValueError("avi: LIST too small")
            ltype = payload[body:body + 4]
            yield (b"LIST:" + ltype, body + 4, size - 4)
        else:
            yield (cid, body, size)
        pos = body + size + (size & 1)      # word alignment


def decode_avi_mjpeg(payload: bytes) -> dict | None:
    """REAL frame decode for AVI/MJPEG — see module docstring. Returns
    {width, height, n_frames, fps, duration_ms, n_pixels, mean_r,
    mean_g, mean_b} (means pixel-weighted across ALL frames,
    n_pixels the decoded total) or None."""
    frames = decode_avi_frame_stats(payload)
    if not frames:
        return None
    meta = frames[0]["_meta"]
    n_px = sum(f["n_pixels"] for f in frames)
    return {"width": frames[0]["width"], "height": frames[0]["height"],
            "n_frames": len(frames), "fps": meta["fps"],
            "duration_ms": meta["duration_ms"], "n_pixels": n_px,
            "mean_r": sum(f["mean_r"] * f["n_pixels"]
                          for f in frames) / n_px,
            "mean_g": sum(f["mean_g"] * f["n_pixels"]
                          for f in frames) / n_px,
            "mean_b": sum(f["mean_b"] * f["n_pixels"]
                          for f in frames) / n_px}


def decode_avi_frame_stats(payload: bytes) -> list[dict] | None:
    """Per-frame decode timeline: one dict per video frame with
    frame_idx, t_ms, width, height, n_pixels, mean_r/g/b (the first
    row also carries container metadata under ``_meta``). None when
    the payload is not a decodable MJPEG AVI."""
    try:
        if len(payload) < 12 or payload[:4] != b"RIFF" \
                or payload[8:12] != b"AVI ":
            return None
        usec_per_frame = None
        is_mjpeg_vids = False
        frame_chunks: list[tuple[int, int]] = []
        for cid, body, size in _walk_chunks(payload, 12, len(payload)):
            if cid == b"LIST:hdrl":
                for c2, b2, s2 in _walk_chunks(payload, body,
                                               body + size):
                    if c2 == b"avih" and s2 >= 40:
                        (usec_per_frame,) = struct.unpack(
                            "<I", payload[b2:b2 + 4])
                    elif c2 == b"LIST:strl":
                        fcc_type = handler = compression = None
                        for c3, b3, s3 in _walk_chunks(payload, b2,
                                                       b2 + s2):
                            if c3 == b"strh" and s3 >= 8:
                                fcc_type = payload[b3:b3 + 4]
                                handler = payload[b3 + 4:b3 + 8]
                            elif c3 == b"strf" and s3 >= 20:
                                compression = payload[b3 + 16:b3 + 20]
                        if fcc_type == b"vids" and (
                                handler == b"MJPG"
                                or compression == b"MJPG"):
                            is_mjpeg_vids = True
            elif cid == b"LIST:movi":
                for c2, b2, s2 in _walk_chunks(payload, body,
                                               body + size):
                    # ##dc/##db: a video frame from stream ##
                    if c2[2:4] in (b"dc", b"db") \
                            and c2[:2].isdigit():
                        frame_chunks.append((b2, s2))
                        if len(frame_chunks) > MAX_FRAMES:
                            return None
        if not is_mjpeg_vids or not frame_chunks:
            return None
        fps = (1e6 / usec_per_frame) if usec_per_frame else None
        out = []
        from .jpegfull import decode_jpeg_pixels

        for i, (b, s) in enumerate(frame_chunks):
            # baseline frames get the FULL pixel decode (exact means,
            # edge-cropped — jpegfull.py, r5 late); anything the full
            # path declines (progressive MJPEG is nonstandard but
            # legal) falls back to the DC-image stats walk
            frame = payload[b:b + s]
            d = decode_jpeg_pixels(frame) or decode_jpeg_dc(frame)
            if d is None:
                return None                 # an undecodable frame
            t_ms = int(i * usec_per_frame // 1000) \
                if usec_per_frame else None
            out.append({"frame_idx": i, "t_ms": t_ms,
                        "width": d["width"], "height": d["height"],
                        "n_pixels": d["n_pixels"],
                        "mean_r": d["mean_r"], "mean_g": d["mean_g"],
                        "mean_b": d["mean_b"]})
        dur = int(len(out) * usec_per_frame // 1000) \
            if usec_per_frame else None
        out[0]["_meta"] = {"fps": fps, "duration_ms": dur}
        return out
    except (ValueError, IndexError, struct.error):
        return None


# ---------------------------------------------------------------------------
# fixture encoder


def _chunk(cid: bytes, body: bytes) -> bytes:
    return cid + struct.pack("<I", len(body)) + body \
        + (b"\x00" if len(body) & 1 else b"")


def _list(ltype: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", ltype + body)


def encode_avi_mjpeg(frames: list[np.ndarray], fps: int = 25,
                     restart_interval: int = 0) -> bytes:
    """Spec-valid AVI/MJPEG encoder for test fixtures: each frame an
    (H, W) or (H, W, 3) uint8 array, JPEG-encoded via
    :func:`encode_jpeg_baseline`; real avih/strh/strf headers and an
    idx1 index."""
    assert frames
    jpegs = [encode_jpeg_baseline(f, restart_interval=restart_interval)
             for f in frames]
    h, w = frames[0].shape[:2]
    usec = 1_000_000 // fps
    max_bytes = max(len(j) for j in jpegs)

    avih = struct.pack("<14I", usec, max_bytes * fps, 0, 0x10,
                       len(jpegs), 0, 1, max_bytes, w, h, 0, 0, 0, 0)
    strh = (b"vids" + b"MJPG"
            + struct.pack("<I2HI", 0, 0, 0, 0)       # flags/prio/lang/init
            + struct.pack("<7I", 1, fps, 0, len(jpegs), max_bytes,
                          0xFFFFFFFF, 0)             # scale,rate,...,quality
            + struct.pack("<4H", 0, 0, w, h))        # rcFrame
    strf = struct.pack("<I2i2H", 40, w, h, 1, 24) + b"MJPG" \
        + struct.pack("<5I", w * h * 3, 0, 0, 0, 0)
    hdrl = _list(b"hdrl", _chunk(b"avih", avih)
                 + _list(b"strl", _chunk(b"strh", strh)
                         + _chunk(b"strf", strf)))

    movi_body = b""
    idx_rows = []
    for j in jpegs:
        # offset within movi (from the 'movi' fourcc), per convention
        idx_rows.append((4 + len(movi_body), len(j)))
        movi_body += _chunk(b"00dc", j)
    movi = _list(b"movi", movi_body)
    idx1 = _chunk(b"idx1", b"".join(
        b"00dc" + struct.pack("<3I", 0x10, off, ln)
        for off, ln in idx_rows))

    form = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(form)) + form
