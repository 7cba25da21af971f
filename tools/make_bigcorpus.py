#!/usr/bin/env python
"""Generate a measurement-only corpus shaped like the driver's larger
scale factors (single-file, single-row-group parquet per table — the
layout whose scan behavior round 6 optimizes for). NOT test data: the
oracle gates keep running on /root/testdata/sf*; this exists so bench
runs can be repeated at ~sf1.0 scale after the sandbox reset removed
the driver-generated sf1.0 directory.

Matches the observed sf0.1 distributions: 30-word vocab, doc length
U[10,100], lang {en:0.4, others:0.15}, source = src(doc_id % 20), 5%%
near-dup docs (earlier doc text + " dup"), 64-d float32 embeddings,
events over a 30-day window. Deterministic (numpy seed 4242).

Usage: python tools/make_bigcorpus.py <out_dir> [scale]
       scale 10 -> 50k docs / 20k embeddings / 1M events (sf1.0-like)
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "row",
    "the", "agg", "key", "query", "a", "scan", "batch",
]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.4, 0.15, 0.15, 0.15, 0.15]
EVENT_TYPES = ["signup", "purchase", "view", "click", "error"]


def write_one_group(path: str, table: pa.Table) -> None:
    pq.write_table(table, path, row_group_size=max(table.num_rows, 1))


def main() -> None:
    out_dir = sys.argv[1]
    scale = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.RandomState(4242)

    n_docs = int(5000 * scale)
    lens = rng.randint(10, 101, size=n_docs)
    word_idx = rng.randint(0, len(VOCAB), size=int(lens.sum()))
    texts: list[str] = []
    pos = 0
    dup_mask = rng.rand(n_docs) < 0.05
    for i in range(n_docs):
        L = lens[i]
        if dup_mask[i] and i > 0:
            texts.append(texts[rng.randint(0, i)] + " dup")
            pos += L  # keep the stream aligned deterministically
        else:
            texts.append(" ".join(VOCAB[j] for j in word_idx[pos:pos + L]))
            pos += L
    langs = rng.choice(LANGS, size=n_docs, p=LANG_P)
    docs = pa.table({
        "doc_id": pa.array(np.arange(n_docs), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array([f"src{i % 20}" for i in range(n_docs)],
                           pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    write_one_group(os.path.join(out_dir, "documents.parquet"), docs)

    n_emb = int(2000 * scale)
    vecs = rng.normal(0.0, 0.125, size=(n_emb, 64)).astype(np.float32)
    emb = pa.table({
        "vec_id": pa.array(np.arange(n_emb), pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array(rng.randint(0, 10, size=n_emb), pa.int32()),
    })
    write_one_group(os.path.join(out_dir, "embeddings.parquet"), emb)

    n_ev = int(100000 * scale)
    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    offs = np.sort(rng.randint(0, 30 * 86400 * 1000000, size=n_ev,
                               dtype=np.int64))
    ev = pa.table({
        "event_id": pa.array(np.arange(n_ev), pa.int64()),
        "ts": pa.array(t0 + offs, pa.timestamp("us")),
        "user_id": pa.array(rng.randint(0, int(1500 * scale), size=n_ev),
                            pa.int64()),
        "event_type": pa.array(rng.choice(EVENT_TYPES, size=n_ev),
                               pa.string()),
        "value": pa.array(np.round(rng.uniform(0, 200, size=n_ev), 2),
                          pa.float64()),
        "props": pa.array(['{"k": %d}' % k for k in
                           rng.randint(0, 100, size=n_ev)], pa.string()),
    })
    write_one_group(os.path.join(out_dir, "events.parquet"), ev)
    print(f"wrote {out_dir}: {n_docs} docs, {n_emb} embeddings, "
          f"{n_ev} events")


if __name__ == "__main__":
    main()
