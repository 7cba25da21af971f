#!/usr/bin/env python
"""spark-submit entry point (north rule: "runs via spark-submit
--py-files on multi-executor clusters").

Builds (or resumes) an index over a corpus parquet and runs the
synthetic topic batch through block-max WAND, printing metrics JSON.

Usage:
    zip -r /tmp/engine.zip engine
    spark-submit --master local[12] --py-files /tmp/engine.zip \
        tools/submit_job.py <corpus_parquet> <index_dir> [num_topics]

On a real cluster, --master yarn/k8s and the same --py-files zip are
the only changes; every stage is shuffle-parallel (see BENCH.md).
"""

from __future__ import annotations

import json
import sys
import time


def main() -> None:
    corpus_path, index_dir = sys.argv[1], sys.argv[2]
    n_topics = int(sys.argv[3]) if len(sys.argv) > 3 else 20

    from pyspark.sql import SparkSession

    # spark-submit owns master/conf; just get the session
    spark = SparkSession.builder.appName("fts-build-and-search").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from engine.index_build import build_index
    from engine.search import Index, score_wand
    from engine.sources import read_corpus
    from engine.topics import synthetic_topics, topics_to_query_terms

    # parquet path or Iceberg-style catalog table name (engine/sources)
    corpus = read_corpus(spark, corpus_path)
    t0 = time.time()
    m = build_index(spark, corpus, index_dir)
    t_build = time.time() - t0

    idx = Index(spark, index_dir)
    qt = topics_to_query_terms(synthetic_topics(n_topics))
    t0 = time.time()
    n_hits = score_wand(idx, qt, 100).count()
    t_query = time.time() - t0

    print("SUBMIT_RESULT " + json.dumps({
        "n_docs": m["n_docs"], "n_postings": m["n_postings"],
        "build_sec": round(t_build, 2), "docs_per_sec": round(m["docs_per_sec"], 1),
        "n_topics": n_topics, "query_sec": round(t_query, 2),
        "hits": n_hits,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
