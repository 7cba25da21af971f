"""Posting-list codec: delta docIDs + term frequencies, variable-byte
compressed in fixed-size blocks with block-max metadata.

Re-expresses what Lucene's codec does internally for the reference
(SURVEY.md §2.4 I4-I6; the reference delegates to ``IndexWriter`` at
src/main/java/org/cs7is3/Indexer.java:39,67 and relies on Lucene's
impacts/BlockMaxWAND at Searcher.java:45,77).

Layout per term (one ``postings: binary`` cell + array metadata):

* docIDs are sorted ascending, delta-encoded (first value absolute,
  then gaps), then VB-encoded.
* term frequencies VB-encoded in the same order.
* per-posting document lengths (exact, unquantized — SURVEY.md §4.3)
  VB-encoded in the same order, so a scorer needs no doclens join
  (the Lucene analog is the impact (tf, norm) pair stored per posting).
* entries are grouped in blocks of ``BLOCK_SIZE`` (default 128,
  Lucene-style); per block we store ``block_last_doc`` (int64),
  ``block_max_tf`` (int32) and ``block_max_w`` (float64) where
  ``w = tf / (tf + k1*(1-b+b*dl/avgdl))`` is the idf-free BM25 weight:
  block-max WAND upper bound = idf(term) * block_max_w.
  (k1, b, avgdl are frozen at build time — pinned constants per
  SURVEY.md §4.3; avgdl is recorded in the index stats.)

Byte format of the binary cell (v2, block-framed):
    codec_byte || VB(n_entries) || VB(block_size) ||
    per block b: ENC(doc deltas_b) || ENC(tfs_b) || ENC(dls_b)

The first delta of every block is relative to the LAST docID of the
previous block (absolute for block 0), and :func:`encode_postings`
additionally returns per-block byte offsets into the payload — so any
consecutive run of blocks can be (a) byte-sliced out of the blob
without decoding (query-time doc-sharding) and (b) decoded standalone
given the previous block's ``block_last`` (block-max WAND decode
skipping). This is the role Lucene's skip data / block boundaries play
for its BlockMaxWAND.

All encode/decode paths are numpy-vectorized per block (no per-element
Python loops over postings); they run inside ``applyInPandas`` /
``mapInPandas`` on the executors.

VB convention: big-endian 7-bit groups, the LAST byte of each value has
its high bit set (Lucene-style terminator byte).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

BLOCK_SIZE = 128


# ---------------------------------------------------------------------------
# Vectorized variable-byte codec
# ---------------------------------------------------------------------------

def vb_encode(values: np.ndarray) -> np.ndarray:
    """Encode a non-negative int array into a uint8 VB byte stream."""
    a = np.asarray(values, dtype=np.uint64)
    if a.size == 0:
        return np.empty(0, dtype=np.uint8)
    # bytes needed per value: number of 7-bit groups
    nb = np.ones(a.size, dtype=np.int64)
    t = a >> np.uint64(7)
    while t.any():
        nb += (t > 0)
        t >>= np.uint64(7)
    ends = np.cumsum(nb)
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    # fill k-th byte from the end of each value: holds bits [7k, 7k+7)
    for k in range(int(nb.max())):
        mask = nb > k
        out[ends[mask] - 1 - k] = ((a[mask] >> np.uint64(7 * k)) & np.uint64(0x7F)).astype(np.uint8)
    out[ends - 1] |= 0x80  # terminator bit on the last byte of each value
    return out


def vb_decode(buf: np.ndarray, count: int | None = None) -> Tuple[np.ndarray, int]:
    """Decode a VB byte stream; returns (values:uint64, bytes_consumed).

    If ``count`` is given, decodes exactly that many values and stops.
    """
    b = np.asarray(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64), 0
    is_end = (b & 0x80) != 0
    end_idx = np.flatnonzero(is_end)
    if count is not None:
        end_idx = end_idx[:count]
        consumed = int(end_idx[-1]) + 1 if end_idx.size else 0
        b = b[:consumed]
        is_end = is_end[:consumed]
    else:
        consumed = b.size
    n = end_idx.size
    if n == 0:
        return np.empty(0, dtype=np.uint64), 0
    pos = np.arange(b.size, dtype=np.int64)
    # each byte belongs to the value whose terminator is the next end >= pos
    owner_end = end_idx[np.searchsorted(end_idx, pos, side="left")]
    exp = (owner_end - pos).astype(np.uint64)  # 0 for terminator byte
    contrib = (b.astype(np.uint64) & np.uint64(0x7F)) << (np.uint64(7) * exp)
    starts = np.concatenate(([0], end_idx[:-1] + 1))
    vals = np.add.reduceat(contrib, starts)
    return vals.astype(np.uint64), consumed


# ---------------------------------------------------------------------------
# Posting-list encode/decode with block-max metadata
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# FOR / PForDelta-style bit-packed codec (alternative to VB)
# ---------------------------------------------------------------------------
#
# Frame-of-reference per block: store varint(min), one width byte
# (bits of max-min), then the (v - min) values bit-packed LSB-first via
# numpy unpackbits/packbits. Fully vectorized both directions.

FOR_BLOCK = 128


def for_encode(values: np.ndarray, block: int = FOR_BLOCK) -> np.ndarray:
    a = np.asarray(values, dtype=np.uint64)
    if a.size == 0:
        return np.empty(0, dtype=np.uint8)
    chunks: list[np.ndarray] = []
    for i in range(0, a.size, block):
        v = a[i:i + block]
        lo = v.min()
        rel = v - lo
        width = int(rel.max()).bit_length()
        header = vb_encode(np.array([lo, width], dtype=np.uint64))
        chunks.append(header)
        if width:
            # bits[j, k] = bit k of rel[j]  (LSB-first)
            bits = ((rel[:, None] >> np.arange(width, dtype=np.uint64)[None, :])
                    & np.uint64(1)).astype(np.uint8)
            chunks.append(np.packbits(bits.reshape(-1)))
    return np.concatenate(chunks)


def for_decode(buf: np.ndarray, count: int,
               block: int = FOR_BLOCK) -> Tuple[np.ndarray, int]:
    b = np.asarray(buf, dtype=np.uint8)
    out = np.empty(count, dtype=np.uint64)
    pos = 0
    done = 0
    while done < count:
        n = min(block, count - done)
        (hdr, used) = vb_decode(b[pos:], count=2)
        lo, width = np.uint64(hdr[0]), int(hdr[1])
        pos += used
        if width:
            nbytes = (n * width + 7) // 8
            bits = np.unpackbits(b[pos:pos + nbytes])[: n * width]
            bits = bits.reshape(n, width).astype(np.uint64)
            rel = (bits << np.arange(width, dtype=np.uint64)[None, :]).sum(
                axis=1, dtype=np.uint64)
            pos += nbytes
        else:
            rel = np.zeros(n, dtype=np.uint64)
        out[done:done + n] = rel + lo
        done += n
    return out, pos


def bm25_weight(tf: np.ndarray, dl: np.ndarray, avgdl: float,
                k1: float = 1.2, b: float = 0.75) -> np.ndarray:
    """Idf-free BM25 weight w = tf / (tf + k1*(1-b+b*dl/avgdl))."""
    tf = tf.astype(np.float64)
    return tf / (tf + k1 * (1.0 - b + b * dl.astype(np.float64) / avgdl))


# codec ids (first blob byte)
CODEC_VB = 1    # variable-byte
CODEC_FOR = 2   # frame-of-reference bit packing (PForDelta-style)
CODECS = {"vb": CODEC_VB, "for": CODEC_FOR}


def block_counts(n: int, block_size: int) -> np.ndarray:
    """Entries per block for an n-entry list: full blocks + a tail."""
    nblocks = (n + block_size - 1) // block_size
    c = np.full(nblocks, block_size, dtype=np.int64)
    if nblocks:
        c[-1] = n - (nblocks - 1) * block_size
    return c


def encode_postings(doc_ids: np.ndarray, tfs: np.ndarray, dls: np.ndarray,
                    avgdl: float, k1: float = 1.2, b: float = 0.75,
                    block_size: int = BLOCK_SIZE, codec: str = "vb"
                    ) -> Tuple[bytes, np.ndarray, np.ndarray, np.ndarray,
                               np.ndarray]:
    """Encode one term's postings (block-framed layout).

    Parameters: sorted ascending int64 ``doc_ids``, int ``tfs`` (>0) and
    per-posting doc lengths ``dls``, all equal length. Returns
    ``(blob, block_last_doc, block_max_tf, block_max_w, block_off)``
    where ``block_off`` has ``nblocks + 1`` entries: byte offset of each
    block within the payload (after the header), last = payload length.

    ``codec``: 'vb' (variable-byte) or 'for' (bit-packed
    frame-of-reference, PForDelta-style); recorded in the blob's first
    byte so readers self-dispatch.
    """
    d = np.asarray(doc_ids, dtype=np.int64)
    t = np.asarray(tfs, dtype=np.int64)
    dl = np.asarray(dls, dtype=np.int64)
    n = d.size
    if n == 0:
        return (b"", np.empty(0, np.int64), np.empty(0, np.int32),
                np.empty(0, np.float64), np.zeros(1, np.int64))
    deltas = np.empty(n, dtype=np.uint64)
    deltas[0] = np.uint64(d[0])
    if n > 1:
        # first delta of a block = gap to the previous block's last doc,
        # so a block decodes standalone given block_last[b-1]
        deltas[1:] = np.diff(d).astype(np.uint64)
    enc = vb_encode if codec == "vb" else for_encode
    header = np.concatenate([
        np.array([CODECS[codec]], dtype=np.uint8),
        vb_encode(np.array([n, block_size], dtype=np.uint64)),
    ])
    nblocks = (n + block_size - 1) // block_size
    parts = [header]
    off = np.zeros(nblocks + 1, dtype=np.int64)
    for bi in range(nblocks):
        sl = slice(bi * block_size, min((bi + 1) * block_size, n))
        seg = np.concatenate([enc(deltas[sl]),
                              enc(t[sl].astype(np.uint64)),
                              enc(dl[sl].astype(np.uint64))])
        parts.append(seg)
        off[bi + 1] = off[bi] + seg.size
    blob = np.concatenate(parts).tobytes()
    block_last = d[np.minimum(np.arange(1, nblocks + 1) * block_size, n) - 1]
    pad = nblocks * block_size - n
    t_pad = np.concatenate([t, np.zeros(pad, np.int64)]) if pad else t
    block_max_tf = t_pad.reshape(nblocks, block_size).max(axis=1).astype(np.int32)
    w = bm25_weight(t, dl, avgdl, k1, b)
    w_pad = np.concatenate([w, np.zeros(pad)]) if pad else w
    block_max_w = w_pad.reshape(nblocks, block_size).max(axis=1)
    return blob, block_last.astype(np.int64), block_max_tf, block_max_w, off


def split_payload(blob: bytes) -> Tuple[int, int, int, np.ndarray]:
    """Parse the blob header → (codec, n_entries, block_size, payload)."""
    buf = np.frombuffer(blob, dtype=np.uint8)
    codec = int(buf[0])
    hdr, used = vb_decode(buf[1:], count=2)
    n, block_size = int(hdr[0]), int(hdr[1])
    return codec, n, block_size, buf[1 + used:]


def decode_run(payload: np.ndarray, counts: np.ndarray, codec: int,
               base: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode a CONSECUTIVE run of blocks from a payload byte slice.

    ``counts``: entries per block in the run; ``base``: last docID of
    the block preceding the run (0 if the run starts at block 0).
    Returns (doc_ids, tfs, dls) int64. Delta chaining is intact inside
    a consecutive run, so docs = base + cumsum(all run deltas).
    """
    counts = np.asarray(counts, dtype=np.int64)
    n = int(counts.sum())
    if n == 0:
        z = np.empty(0, np.int64)
        return z, z, z
    if codec == CODEC_VB:
        # VB is self-delimiting: decode the whole run payload at once
        # (3n values: d0 t0 l0 d1 t1 l1 ... per block), then de-interleave
        vals, _ = vb_decode(payload, count=3 * n)
        deltas = np.empty(n, dtype=np.uint64)
        tfs = np.empty(n, dtype=np.uint64)
        dls = np.empty(n, dtype=np.uint64)
        pos = vpos = 0
        # all run blocks are uniform except a possible short tail —
        # the uniform prefix de-interleaves with one reshape
        if counts.size > 1 and counts[-1] != counts[0]:
            nfull = counts.size - 1
        else:
            nfull = counts.size
        bsz = int(counts[0])
        if nfull:
            r = vals[: 3 * bsz * nfull].reshape(nfull, 3, bsz)
            deltas[: bsz * nfull] = r[:, 0, :].reshape(-1)
            tfs[: bsz * nfull] = r[:, 1, :].reshape(-1)
            dls[: bsz * nfull] = r[:, 2, :].reshape(-1)
            pos = bsz * nfull
            vpos = 3 * bsz * nfull
        if pos < n:
            c = n - pos
            deltas[pos:] = vals[vpos:vpos + c]
            tfs[pos:] = vals[vpos + c:vpos + 2 * c]
            dls[pos:] = vals[vpos + 2 * c:vpos + 3 * c]
    else:
        deltas = np.empty(n, dtype=np.uint64)
        tfs = np.empty(n, dtype=np.uint64)
        dls = np.empty(n, dtype=np.uint64)
        bpos = 0
        pos = 0
        for c in counts:
            c = int(c)
            dch, used = for_decode(payload[bpos:], count=c)
            bpos += used
            tch, used = for_decode(payload[bpos:], count=c)
            bpos += used
            lch, used = for_decode(payload[bpos:], count=c)
            bpos += used
            deltas[pos:pos + c] = dch
            tfs[pos:pos + c] = tch
            dls[pos:pos + c] = lch
            pos += c
    doc_ids = np.cumsum(deltas.astype(np.int64)) + np.int64(base)
    return doc_ids, tfs.astype(np.int64), dls.astype(np.int64)


def decode_postings(blob: bytes) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Inverse of :func:`encode_postings` → (doc_ids, tfs, dls) int64.
    Codec self-dispatch from the blob's first byte."""
    if not blob:
        z = np.empty(0, np.int64)
        return z, z, z
    codec, n, block_size, payload = split_payload(blob)
    return decode_run(payload, block_counts(n, block_size), codec, 0)
