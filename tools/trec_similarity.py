#!/usr/bin/env python
"""Similarity comparison on the REAL reference corpora — reproduces the
reference's §5.2.2 experiment (GROUP_12.pdf: boosted title/desc/narr
query, NO RM3, similarity swapped): BM25 published MAP 0.3044,
LMDirichlet published MAP 0.2791 / P@20 0.432 / nDCG@20 0.4827, and
"BM25 + IB Hybrid" published MAP 0.3183 / P@20 0.486 / nDCG@20 0.5561.

The hybrid's exact composition is unpublished ("an IB component in
specific fields"); here ``--similarity hybrid`` scores every matched
doc with BM25 + IB summed (the engine's TREC index is single-field
concatenated, so the field split is out of reach — documented
divergence), and ``--similarity ib`` is the pure IB ranking
(DistributionLL·LambdaDF·NormalizationH2, engine/scoring.py:ib_col).

Reuses an already-built index (tools/trec_e2e.py --index-dir) — the
similarity is a query-time choice in this engine, exactly as
``IndexSearcher.setSimilarity`` is in the reference (Searcher.java).

Usage: python tools/trec_similarity.py --index-dir /tmp/trec_idx \
           [--similarity lmd|bm25|ib|hybrid] [--num-docs 1000] [--stem]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference"

PUBLISHED = {
    "lmd": {"MAP": 0.2791, "P@20": 0.432, "nDCG@20": 0.4827},
    "bm25": {"MAP": 0.3044, "P@20": 0.482, "nDCG@20": 0.55335},
    # the paper's hybrid row; 'ib' (pure IB) has no published row and
    # compares against the hybrid as the nearest anchor
    "ib": {"MAP": 0.3183, "P@20": 0.486, "nDCG@20": 0.5561},
    "hybrid": {"MAP": 0.3183, "P@20": 0.486, "nDCG@20": 0.5561},
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default=REF)
    ap.add_argument("--index-dir", default="/tmp/trec_idx")
    ap.add_argument("--similarity",
                    choices=("lmd", "bm25", "ib", "hybrid"), default="lmd")
    ap.add_argument("--norms", choices=("exact", "lucene"),
                    default="exact",
                    help="'lucene' scores BM25 with the 1-byte "
                         "SmallFloat length quantization — isolates "
                         "the norm component of the engine-vs-Lucene "
                         "delta (bm25 similarity only)")
    ap.add_argument("--num-docs", type=int, default=1000)
    ap.add_argument("--stem", action="store_true", default=True)
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "12"))
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from engine.evaluate import macro_metrics
    from engine.search import Index, score_exhaustive, score_ib, score_lmd
    from engine.session import get_spark
    from engine.topics import parse_topics, topics_to_query_terms
    from engine.expand import drop_malformed_topics

    spark = get_spark(app=f"trec-sim-{args.similarity}",
                      master=f"local[{args.cpus}]",
                      shuffle_partitions=int(args.cpus))
    spark.sparkContext.setLogLevel("ERROR")
    idx = Index(spark, args.index_dir)

    with open(f"{args.ref}/topics") as f:
        topics = drop_malformed_topics(parse_topics(f.read()),
                                       stem=args.stem)
    qt = topics_to_query_terms(topics, stem=args.stem)

    t0 = time.time()
    if args.similarity == "lmd":
        hits = score_lmd(idx, qt, args.num_docs)
    elif args.similarity == "ib":
        hits = score_ib(idx, qt, args.num_docs)
    elif args.similarity == "hybrid":
        # BM25 + IB summed over the full matched set, then one top-k
        # cut (a doc's hybrid rank needs both components first — a
        # join of two top-k lists would truncate incorrectly)
        from pyspark.sql import Window
        big = 2_147_483_647
        bm = (score_exhaustive(idx, qt, big)
              .select("qid", "doc_id", F.col("score").alias("s_bm")))
        ib = (score_ib(idx, qt, big)
              .select("qid", "doc_id", F.col("score").alias("s_ib")))
        both = (bm.join(ib, ["qid", "doc_id"])
                .withColumn("score", F.col("s_bm") + F.col("s_ib")))
        w = Window.partitionBy("qid").orderBy(F.desc("score"),
                                              F.asc("doc_id"))
        hits = (both.withColumn("rank", F.row_number().over(w))
                .where(F.col("rank") <= args.num_docs)
                .select("qid", "doc_id", "score", "rank"))
    else:
        hits = score_exhaustive(idx, qt, args.num_docs, norms=args.norms)
    run = (hits.join(idx.docs.select("doc_id", "path"), "doc_id")
           .select("qid", F.col("path").alias("docno"), "rank")
           .orderBy("qid", "rank"))
    run_rows = run.collect()
    t1 = time.time()

    qrels = (spark.read.csv(f"{args.ref}/qrels.assignment2.part1", sep=" ")
             .toDF("qid", "iter", "docno", "rel")
             .select("qid", "docno", F.col("rel").cast("int").alias("rel")))
    m = macro_metrics(spark.createDataFrame(run_rows), qrels, k=20,
                      p_at_ks=(5,))
    print("RESULT " + json.dumps({
        "similarity": args.similarity,
        "norms": args.norms,
        "n_run_rows": len(run_rows),
        "search_sec": round(t1 - t0, 1),
        "metrics": {k: round(v, 4) for k, v in m.items()},
        "reference_published": PUBLISHED[args.similarity],
    }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
