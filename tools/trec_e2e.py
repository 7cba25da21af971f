#!/usr/bin/env python
"""End-to-end parity run on the REAL reference corpora (VERDICT r01
item 1): index the four TREC collections from /root/reference
("Assignment Two": FBIS/FR94/FT/LATimes, 527,018 docs), run the 50
real topics (401-450) through the full boosted + entity-RM3 pipeline,
evaluate against qrels.assignment2.part1, and print MAP / P@20 /
nDCG@20 next to the reference's published final numbers
(MAP 0.3651 / P@20 0.54 / nDCG@20 0.6005 — GROUP_12.pdf §5.3; recipe
.github/workflows/evaluation.yml:62-81).

Usage: python tools/trec_e2e.py [--no-expand] [--no-stem]
       [--num-docs 1000] [--index-dir DIR] [--out runs/spark.run]

Exact score parity with Lucene is impossible (Lucene quantizes doc
lengths to 8-bit norms; we keep exact lengths — SURVEY.md §4.3), so
the goal is metrics within a few points, not bit-identity.
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
    ap.add_argument("--ref", default=REF)
    ap.add_argument("--index-dir", default="/tmp/trec_idx")
    ap.add_argument("--num-docs", type=int, default=1000)
    ap.add_argument("--no-expand", action="store_true")
    ap.add_argument("--no-stem", action="store_true")
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ap.add_argument("--out", default="/tmp/trec_runs/spark.run")
    args = ap.parse_args()
    stem = not args.no_stem

    from pyspark.sql import functions as F

    from engine.evaluate import macro_metrics
    from engine.expand import search_topics
    from engine.index_build import build_index, check_sha
    from engine.runfile import write_run
    from engine.search import Index
    from engine.session import get_spark
    from engine.sources import read_sgml_corpus, sgml_to_corpus
    from engine.topics import parse_topics

    spark = get_spark(app="trec-e2e", master=f"local[{args.cpus}]",
                      shuffle_partitions=int(args.cpus))
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    # ---- corpus: 4 SGML collections → input_hint schema ----
    parts = []
    for c in CORPORA:
        parsed = read_sgml_corpus(spark, f"{args.ref}/Assignment Two/{c}", c)
        parts.append(sgml_to_corpus(parsed, c))
    corpus = parts[0]
    for p in parts[1:]:
        corpus = corpus.unionByName(p)

    # ---- index (resumable; rerun continues where it died) ----
    metrics = build_index(spark, corpus, args.index_dir, stem=stem)
    t_idx = time.time()
    print(f"[index] {json.dumps(metrics)}", flush=True)
    idx = Index(spark, args.index_dir)
    assert check_sha(idx.docs) == 0, "sha invariant violated"

    # ---- topics + search (boosts 3.0/1.3/0.5 + entity-RM3) ----
    with open(f"{args.ref}/topics") as f:
        topics = parse_topics(f.read())
    print(f"[topics] {len(topics)} parsed", flush=True)
    hits = search_topics(idx, topics, num_docs=args.num_docs,
                         expand=not args.no_expand, stem=stem)
    # docno for TREC output is the original DOCNO (stored as `path`)
    run = (hits.join(idx.docs.select("doc_id", "path"), "doc_id")
           .select("qid", F.col("path").alias("docno"), "rank", "score")
           .orderBy("qid", "rank"))
    run_rows = run.collect()
    t_search = time.time()
    print(f"[search] {len(run_rows)} run rows in "
          f"{t_search - t_idx:.1f}s", flush=True)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    run_df = spark.createDataFrame(run_rows)
    write_run(run_df, args.out, tag="SPARK_FTS")

    # ---- evaluate vs qrels ----
    qrels = (spark.read.csv(f"{args.ref}/qrels.assignment2.part1", sep=" ")
             .toDF("qid", "iter", "docno", "rel")
             .select("qid", "docno", F.col("rel").cast("int").alias("rel")))
    m = macro_metrics(run_df.select("qid", "docno", "rank"), qrels, k=20)
    out = {
        "config": {"stem": stem, "expand": not args.no_expand,
                   "num_docs": args.num_docs},
        "n_docs": metrics["n_docs"],
        "index_sec": round(t_idx - t0, 1),
        "search_sec": round(t_search - t_idx, 1),
        "docs_per_sec": round(metrics["docs_per_sec"], 1),
        "metrics": {k: round(v, 4) for k, v in m.items()},
        "reference_published": {"MAP": 0.3651, "P@20": 0.54,
                                "nDCG@20": 0.6005},
    }
    print("RESULT " + json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
