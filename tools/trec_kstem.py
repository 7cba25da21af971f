#!/usr/bin/env python
"""Reproduce the reference's ABANDONED analyzer row (VERDICT r3 item 4):
GROUP_12.pdf §5.2.1 table — "KStemAnalyzer + BM25" MAP 0.22 / P@20 0.35
/ nDCG@20 0.38, the experiment that made the team keep EnglishAnalyzer
(0.3044 in the same table).

The reference's CustomAnalyzer (CustomAnalyzer.java:20-39) chain is
tokenize → possessive strip → lowercase → stop → ASCIIFolding → KStem;
the engine's ``stemmer="kstem", ascii_fold=True`` build reproduces it
(engine/analysis.py:92, 291; kstem+fold e2e test). Same boosted
title/desc/narr query as the EnglishAnalyzer row, NO RM3 — analyzer is
the only swapped variable, exactly as in the published table. Stemming
is index-time, so this needs its own index of the 527k-doc corpus
(resumable; rerun continues where it died).

Usage: python tools/trec_kstem.py [--index-dir /tmp/trec_idx_kstem]
           [--num-docs 1000] [--cpus 32]
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

PUBLISHED = {"MAP": 0.22, "P@20": 0.35, "nDCG@20": 0.38}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default=REF)
    ap.add_argument("--index-dir", default="/tmp/trec_idx_kstem")
    ap.add_argument("--num-docs", type=int, default=1000)
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ap.add_argument("--mismatch", action="store_true",
                    help="also run PORTER-analyzed queries against the "
                         "KStem index — the stale-analyzer experiment "
                         "that attributes the published 0.22 collapse "
                         "(the reference hard-codes EnglishAnalyzer in "
                         "Searcher.java:19 and Indexer.java:23-24 "
                         "discards its analyzer argument)")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from engine.evaluate import macro_metrics
    from engine.expand import search_topics
    from engine.index_build import build_index, check_sha
    from engine.search import Index
    from engine.session import get_spark
    from engine.sources import read_sgml_corpus, sgml_to_corpus
    from engine.topics import parse_topics

    spark = get_spark(app="trec-kstem", master=f"local[{args.cpus}]",
                      shuffle_partitions=int(args.cpus))
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    parts = []
    for c in CORPORA:
        parsed = read_sgml_corpus(spark, f"{args.ref}/Assignment Two/{c}", c)
        parts.append(sgml_to_corpus(parsed, c))
    corpus = parts[0]
    for p in parts[1:]:
        corpus = corpus.unionByName(p)

    metrics = build_index(spark, corpus, args.index_dir, stem=True,
                          stemmer="kstem", ascii_fold=True)
    t_idx = time.time()
    print(f"[index] {json.dumps(metrics)}", flush=True)
    idx = Index(spark, args.index_dir)
    assert check_sha(idx.docs) == 0, "sha invariant violated"
    assert idx.analyzer_opts() == {"stem": True, "stemmer": "kstem",
                                   "ascii_fold": True}, idx.analyzer_opts()

    with open(f"{args.ref}/topics") as f:
        topics = parse_topics(f.read())
    # boosted anchor query, NO RM3 — §5.2.1 compares analyzers only
    hits = search_topics(idx, topics, num_docs=args.num_docs,
                         expand=False, stem=True)
    run = (hits.join(idx.docs.select("doc_id", "path"), "doc_id")
           .select("qid", F.col("path").alias("docno"), "rank"))
    run_rows = run.collect()
    t_search = time.time()
    print(f"[search] {len(run_rows)} run rows in "
          f"{t_search - t_idx:.1f}s", flush=True)

    qrels = (spark.read.csv(f"{args.ref}/qrels.assignment2.part1", sep=" ")
             .toDF("qid", "iter", "docno", "rel")
             .select("qid", "docno", F.col("rel").cast("int").alias("rel")))
    m = macro_metrics(spark.createDataFrame(run_rows), qrels, k=20)
    out = {
        "config": {"analyzer": "kstem+fold", "expand": False,
                   "num_docs": args.num_docs},
        "n_docs": metrics["n_docs"],
        "index_sec": round(t_idx - t0, 1),
        "search_sec": round(t_search - t_idx, 1),
        "metrics": {k: round(v, 4) for k, v in m.items()},
        "published": PUBLISHED,
    }
    print("RESULT " + json.dumps(out), flush=True)

    if args.mismatch:
        from engine.expand import drop_malformed_topics
        from engine.search import score_exhaustive
        from engine.topics import topics_to_query_terms
        tps = drop_malformed_topics(topics, stem=True, stemmer="porter",
                                    ascii_fold=False)
        qt = topics_to_query_terms(tps, stem=True, stemmer="porter",
                                   ascii_fold=False)
        mm = (score_exhaustive(idx, qt, args.num_docs, include_docno=True)
              .join(idx.docs.select("doc_id", "path"), "doc_id")
              .select("qid", F.col("path").alias("docno"), "rank"))
        m2 = macro_metrics(spark.createDataFrame(mm.collect()), qrels, k=20)
        print("RESULT_MISMATCH "
              + json.dumps({k: round(v, 4) for k, v in m2.items()}),
              flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
