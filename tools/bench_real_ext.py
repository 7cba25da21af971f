#!/usr/bin/env python
"""Real-corpus (527k-doc TREC) measurements for the round-3 second-wave
operators: DisMax and combined_fields over REAL per-field indexes
(TITLE / TEXT as their own stemmed indexes, like the reference's two
Lucene fields), completion suggestion from the real dictionary, the
function_score decay composition over WAND output, CCNet chunk dedup,
MOSS winnowing, and percolation — each timed on local[N].

Usage: python tools/bench_real_ext.py [--index-dir /tmp/trec_idx]
       [--field-dir /tmp/trec_fidx] [--cpus 16]
Writes bench_out/real_ext_r3.json (run from a snapshot copy if editing
the repo meanwhile — executors re-import modules from disk).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference"
CORPORA = ("fbis", "fr94", "ft", "latimes")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index-dir", default="/tmp/trec_idx")
    ap.add_argument("--field-dir", default="/tmp/trec_fidx")
    ap.add_argument("--cpus", default="16")
    ap.add_argument("--k", type=int, default=1000)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from engine.fields import combined_fields_topk, dismax_topk
    from engine.index_build import build_index
    from engine.percolate import percolate
    from engine.pipeline.curation import line_dedup
    from engine.pipeline.dedup import winnow_fingerprints, winnow_pairs
    from engine.search import Index, complete_prefix, score_wand
    from engine.session import get_spark
    from engine.sources import read_sgml_corpus
    from engine.topics import parse_topics, topics_to_query_terms

    spark = get_spark(app="real-ext", master=f"local[{args.cpus}]",
                      shuffle_partitions=int(args.cpus) * 2)
    spark.sparkContext.setLogLevel("ERROR")
    results: dict[str, dict] = {}

    def bench(name, fn):
        t0 = time.time()
        n = fn()
        results[name] = {"sec": round(time.time() - t0, 2), "rows": int(n)}
        print(json.dumps({"op": name, **results[name]}), flush=True)

    # ---- per-field indexes (title / body), resumable ----
    t0 = time.time()
    for fname, col in (("title", "title"), ("body", "text")):
        fdir = f"{args.field_dir}_{fname}"
        if os.path.exists(f"{fdir}/manifest"):
            continue
        parts = []
        for c in CORPORA:
            parsed = read_sgml_corpus(
                spark, f"{REF}/Assignment Two/{c}", c)
            parts.append(parsed.select(
                F.lit(c).alias("repo"),
                F.col("docno").alias("path"),
                F.lit("-").alias("commit"),
                F.lit("en").alias("lang"),
                F.coalesce(F.col(col), F.lit("")).alias("content")))
        corpus = parts[0]
        for p in parts[1:]:
            corpus = corpus.unionByName(p)
        build_index(spark, corpus, fdir, stem=True)
        print(f"[field-index] {fname} built "
              f"({time.time() - t0:.0f}s cumulative)", flush=True)
    results["field_index_build"] = {"sec": round(time.time() - t0, 2),
                                    "rows": 2}
    fidx = {"title": Index(spark, f"{args.field_dir}_title"),
            "body": Index(spark, f"{args.field_dir}_body")}

    # ---- topic queries (stemmed title/desc/narr terms) ----
    with open(f"{REF}/topics") as f:
        topics = parse_topics(f.read())
    qt = topics_to_query_terms(topics, stem=True)
    fq = [(q, fname, t, w) for q, t, w in qt
          for fname in ("title", "body")]
    print(f"[queries] {len(topics)} topics, {len(qt)} clauses",
          flush=True)

    # warmup (fresh-JVM codegen; CLAUDE.md)
    complete_prefix(fidx["title"], [("w", "econ")], n=3).collect()

    bench(f"dismax_topk_k{args.k}", lambda: len(
        dismax_topk(fidx, fq, args.k, tie_breaker=0.3).collect()))
    bench(f"combined_fields_k{args.k}", lambda: len(
        combined_fields_topk(
            fidx, [(q, sorted({t for q2, t, _ in qt if q2 == q}))
                   for q in sorted({q for q, _, _ in qt})],
            {"title": 2.0, "body": 1.0}, args.k).collect()))

    idx = Index(spark, args.index_dir)
    bench("completion_5prefixes", lambda: len(complete_prefix(
        idx, [("c1", "econ"), ("c2", "trad"), ("c3", "pol"),
              ("c4", "intern"), ("c5", "govern")], n=10).collect()))

    # decay over the WAND path: rank by BM25 × doc-length recency proxy
    vals = idx.docs.select(
        "doc_id", F.length("content").cast("double").alias("value"))
    wq = [(q, t, w) for q, t, w in qt]

    def _decayed():
        from engine.fusion import decay_multiply
        scored = score_wand(idx, wq, 100).select(
            "qid", "doc_id", F.col("score").alias("s"))
        return len(decay_multiply(scored, vals, origin=0.0,
                                  scale=5000.0, decay=0.5,
                                  kind="gauss").collect())
    bench("decay_over_wand_k100", _decayed)

    docs = idx.docs.select("doc_id", F.col("content").alias("text"))
    bench("line_dedup_chunk15", lambda: line_dedup(
        docs, min_docs=2, chunk_tokens=15)
        .where(F.col("n_removed") > 0).count())

    def _winnow():
        fps = winnow_fingerprints(docs, k=8, window=8)
        return winnow_pairs(fps, min_jaccard=0.8,
                            max_fp_docs=20).count()
    bench("winnow_pairs_k8w8_j08", _winnow)

    bench("percolate_6alerts", lambda: percolate(docs, [
        ("al1", ["econom", "polici"], []),
        ("al2", ["foreign", "trade"], ["embargo"]),
        ("al3", ["nuclear"], []),
        ("al4", ["elect", "presid"], []),
        ("al5", ["privat", "market"], ["bank"]),
        ("al6", ["zzzznothing"], []),
    ]).count())

    os.makedirs("bench_out", exist_ok=True)
    with open("bench_out/real_ext_r3.json", "w") as f:
        json.dump(results, f, indent=1)
    print("REAL_EXT " + json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
