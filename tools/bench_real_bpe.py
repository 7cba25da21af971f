#!/usr/bin/env python
"""Real-corpus (527k-doc TREC, ~285M tokens) measurement for the BPE
subword trainer + encoder (engine/pipeline/bpe.py):

1. the ONE O(corpus) stage — the word-frequency aggregation — timed at
   real scale (everything after runs on the vocabulary-bounded table);
2. driver-path training (incremental pair counts + lazy heap) at a
   production-like merge budget over the real ~560k-word vocabulary;
3. distributed-trainer equivalence at real scale: the spark path's
   first N merges must equal the driver path's first N rows exactly
   (the small-fixture equivalence test, re-run on real data);
4. corpus encode with the learned table (zero-shuffle pandas UDF with
   per-process word memo): wall, tokens/sec, and fertility
   (subword tokens per word) — the number LLM-pipeline users care
   about.

Usage: python tools/bench_real_bpe.py [--index-dir /tmp/trec_idx]
       [--cpus 16] [--merges 8000] [--spark-rounds 40]
Writes bench_out/real_bpe_r4.json. Run from a snapshot copy if editing
the repo meanwhile (executors re-import modules from disk).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index-dir", default="/tmp/trec_idx")
    ap.add_argument("--cpus", default="16")
    ap.add_argument("--merges", type=int, default=8000)
    ap.add_argument("--spark-rounds", type=int, default=40)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from engine.pipeline import bpe
    from engine.search import Index
    from engine.session import get_spark

    spark = get_spark(app="bench-real-bpe",
                      master=f"local[{args.cpus}]",
                      shuffle_partitions=int(args.cpus) * 2)
    spark.sparkContext.setLogLevel("ERROR")
    idx = Index(spark, args.index_dir)
    docs = idx.docs.select("doc_id", F.col("content").alias("text"))
    out: dict = {"n_docs": idx.n_docs, "n_merges": args.merges}

    # --- 1. the O(corpus) word-frequency stage ------------------------
    t0 = time.time()
    words = bpe.word_frequencies(docs).persist()
    stats = words.agg(F.count(F.lit(1)).alias("vocab"),
                      F.sum("freq").alias("tokens")).collect()[0]
    out["wordfreq_sec"] = round(time.time() - t0, 1)
    out["vocab"] = int(stats["vocab"])
    out["corpus_tokens"] = int(stats["tokens"])
    print(f"word_frequencies: {out['wordfreq_sec']}s — "
          f"{out['vocab']:,} words / {out['corpus_tokens']:,} tokens")

    # --- 2. driver-path training at a production merge budget ---------
    t0 = time.time()
    rows = words.collect()
    out["collect_sec"] = round(time.time() - t0, 1)
    t0 = time.time()
    merges = bpe.train_bpe_py([(r["word"], r["freq"]) for r in rows],
                              args.merges, min_count=2)
    out["train_driver_sec"] = round(time.time() - t0, 1)
    out["merges_learned"] = len(merges)
    out["merges_per_sec"] = round(len(merges) / max(
        out["train_driver_sec"], 1e-9), 1)
    print(f"driver train: {out['train_driver_sec']}s for "
          f"{len(merges)} merges ({out['merges_per_sec']}/s); "
          f"head: {[(m[1], m[2]) for m in merges[:5]]}")

    # --- 3. distributed-trainer equivalence at real scale -------------
    n = args.spark_rounds
    t0 = time.time()
    spark_merges = bpe._train_spark(words, n, min_count=2, eow=bpe.EOW,
                                    checkpoint_every=6)
    out["train_spark_rounds"] = n
    out["train_spark_sec"] = round(time.time() - t0, 1)
    driver_head = [(m[1], m[2], m[3]) for m in merges[:n]]
    spark_head = [(m[1], m[2], m[3]) for m in spark_merges]
    out["spark_equals_driver"] = bool(driver_head == spark_head)
    print(f"spark train: {out['train_spark_sec']}s for {n} rounds — "
          f"equals driver head: {out['spark_equals_driver']}")
    if not out["spark_equals_driver"]:
        for i, (d, s) in enumerate(zip(driver_head, spark_head)):
            if d != s:
                print(f"  first divergence at rank {i}: {d} vs {s}")
                break
    words.unpersist()

    # --- 4. corpus encode with the learned table ----------------------
    t0 = time.time()
    enc = bpe.bpe_encode(docs, merges)
    n_subwords = enc.agg(F.sum(F.size("tokens"))).collect()[0][0]
    out["encode_sec"] = round(time.time() - t0, 1)
    out["subword_tokens"] = int(n_subwords)
    out["encode_tokens_per_sec"] = int(
        out["corpus_tokens"] / max(out["encode_sec"], 1e-9))
    out["fertility"] = round(n_subwords / out["corpus_tokens"], 3)
    print(f"encode: {out['encode_sec']}s — {n_subwords:,} subword "
          f"tokens ({out['encode_tokens_per_sec']:,} words/s), "
          f"fertility {out['fertility']}")

    os.makedirs("bench_out", exist_ok=True)
    with open("bench_out/real_bpe_r4.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
