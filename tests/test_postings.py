"""Posting codec properties (SURVEY.md §5.2 item 1, FIXTURES.md §5)."""

import numpy as np
import pytest

from engine.postings import (
    BLOCK_SIZE, bm25_weight, decode_postings, encode_postings, vb_decode,
    vb_encode,
)


@pytest.mark.parametrize("seed", range(20))
def test_vb_roundtrip(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 2000))
    vals = rng.integers(0, 2 ** int(rng.integers(4, 62)), n).astype(np.uint64)
    enc = vb_encode(vals)
    dec, used = vb_decode(enc)
    assert used == enc.size
    assert (dec == vals).all()


def test_vb_partial_decode():
    vals = np.array([300, 1, 2 ** 40, 7], dtype=np.uint64)
    enc = vb_encode(vals)
    dec, used = vb_decode(enc, count=2)
    assert (dec == vals[:2]).all()
    dec2, _ = vb_decode(enc[used:], count=2)
    assert (dec2 == vals[2:]).all()


def test_vb_empty():
    enc = vb_encode(np.empty(0, np.uint64))
    assert enc.size == 0
    dec, used = vb_decode(enc)
    assert dec.size == 0 and used == 0


@pytest.mark.parametrize("seed", range(10))
def test_postings_roundtrip_and_blockmax(seed):
    rng = np.random.default_rng(100 + seed)
    n = int(rng.integers(1, 1500))
    docs = np.cumsum(rng.integers(1, 10 ** 6, n))
    tfs = rng.integers(1, 500, n)
    dls = rng.integers(1, 3000, n)
    avgdl = 350.0
    blob, last, mtf, mw, off = encode_postings(docs, tfs, dls, avgdl)
    d2, t2, l2 = decode_postings(blob)
    assert (d2 == docs).all() and (t2 == tfs).all() and (l2 == dls).all()
    nblocks = (n + BLOCK_SIZE - 1) // BLOCK_SIZE
    assert len(last) == len(mtf) == len(mw) == nblocks
    w = bm25_weight(tfs, dls, avgdl)
    for i in range(nblocks):
        sl = slice(i * BLOCK_SIZE, (i + 1) * BLOCK_SIZE)
        assert mtf[i] == tfs[sl].max()
        assert last[i] == docs[sl][-1]
        # block_max_w is a valid upper bound on every weight in the block
        assert mw[i] >= w[sl].max() - 1e-12
        assert mw[i] == pytest.approx(w[sl].max())


def test_postings_empty():
    blob, last, mtf, mw, off = encode_postings(
        np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0, np.int64), 1.0)
    assert blob == b""
    d, t, dl = decode_postings(blob)
    assert d.size == t.size == dl.size == 0


def test_compression_is_compact():
    # 1000 dense postings with small gaps/tfs should take ~3 bytes each
    n = 1000
    docs = np.arange(1, n + 1) * 3
    tfs = np.ones(n, np.int64)
    dls = np.full(n, 100)
    blob, *_ = encode_postings(docs, tfs, dls, 100.0)
    assert len(blob) < n * 4


@pytest.mark.parametrize("seed", range(10))
def test_for_codec_roundtrip(seed):
    from engine.postings import for_decode, for_encode

    rng = np.random.default_rng(300 + seed)
    n = int(rng.integers(1, 1200))
    vals = rng.integers(0, 2 ** int(rng.integers(1, 40)), n).astype(np.uint64)
    enc = for_encode(vals)
    dec, used = for_decode(enc, count=n)
    assert used == enc.size
    assert (dec == vals).all()


def test_for_codec_constant_block():
    from engine.postings import for_decode, for_encode

    vals = np.full(300, 7, dtype=np.uint64)  # width 0 blocks
    enc = for_encode(vals)
    dec, _ = for_decode(enc, count=300)
    assert (dec == 7).all()
    assert enc.size < 10  # 3 blocks × ~2 header bytes


@pytest.mark.parametrize("codec", ["vb", "for"])
def test_postings_roundtrip_codecs(codec):
    rng = np.random.default_rng(55)
    n = 1000
    docs = np.cumsum(rng.integers(1, 50, n))
    tfs = rng.integers(1, 30, n)
    dls = rng.integers(20, 800, n)
    blob, last, mtf, mw, off = encode_postings(docs, tfs, dls, 300.0, codec=codec)
    d2, t2, l2 = decode_postings(blob)
    assert (d2 == docs).all() and (t2 == tfs).all() and (l2 == dls).all()


def test_for_beats_vb_on_dense_small_gaps():
    # FOR bit-packing should compress small uniform gaps harder than VB
    rng = np.random.default_rng(9)
    n = 4096
    docs = np.cumsum(rng.integers(1, 8, n))
    tfs = rng.integers(1, 4, n)
    dls = rng.integers(90, 110, n)
    vb, *_ = encode_postings(docs, tfs, dls, 100.0, codec="vb")
    fr, *_ = encode_postings(docs, tfs, dls, 100.0, codec="for")
    assert len(fr) < len(vb)


@pytest.mark.parametrize("codec", ["vb", "for"])
@pytest.mark.parametrize("seed", range(5))
def test_block_slice_decode(codec, seed):
    """Any consecutive run of blocks byte-sliced via block_off decodes
    standalone (v2 block-framed layout — the WAND doc-shard primitive)."""
    from engine.postings import block_counts, decode_run, split_payload

    rng = np.random.default_rng(500 + seed)
    n = int(rng.integers(1, 2500))
    docs = np.cumsum(rng.integers(1, 1000, n)).astype(np.int64)
    tfs = rng.integers(1, 80, n).astype(np.int64)
    dls = rng.integers(10, 900, n).astype(np.int64)
    blob, last, mtf, mw, off = encode_postings(docs, tfs, dls, 250.0,
                                               codec=codec)
    c, n2, bs, payload = split_payload(blob)
    assert n2 == n and bs == BLOCK_SIZE
    counts = block_counts(n, bs)
    nblocks = counts.size
    assert off.size == nblocks + 1 and off[-1] == payload.size
    # every consecutive run [i, j)
    runs = [(0, nblocks), (0, 1), (nblocks - 1, nblocks)]
    if nblocks >= 3:
        runs.append((1, nblocks - 1))
    for i, j in runs:
        base = int(last[i - 1]) if i > 0 else 0
        d2, t2, l2 = decode_run(payload[off[i]:off[j]], counts[i:j], c, base)
        sl = slice(i * bs, min(j * bs, n))
        assert (d2 == docs[sl]).all()
        assert (t2 == tfs[sl]).all()
        assert (l2 == dls[sl]).all()
