#!/usr/bin/env python
"""Quick isolated re-measure of individual bench rows (r6 iteration
loop; the frozen bench.py stays the measurement of record).

Usage: python tools/bench_rows_r6.py <sf_dir> [row ...]
Rows: index minhash boolean stringstats bpe mbp sqs scripted
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1big"
    only = set(sys.argv[2:])
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from engine.session import get_spark

    spark = get_spark(app="rows_r6", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod
    from engine.index_build import build_index
    from engine.search import Index, boolean_and, score_wand

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()
    if n_docs <= 50_000:
        spark.conf.set("spark.sql.shuffle.partitions", "8")

    warm = f"/tmp/rows_warm_{os.getpid()}"
    shutil.rmtree(warm, ignore_errors=True)
    build_index(spark, entrymod._documents_as_corpus(docs.limit(256)),
                warm, n_buckets=2, n_doc_buckets=1)
    score_wand(Index(spark, warm),
               [(q, t, 1.0) for q, ts in entrymod.BM25_QUERIES for t in ts],
               5).collect()
    shutil.rmtree(warm, ignore_errors=True)

    def timed(label, fn, reps=3):
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        print(f"{label:24s} {best:7.3f}s")

    idx_dir = f"/tmp/rows_idx_{os.getpid()}"
    corpus = entrymod._documents_as_corpus(docs)

    if not only or "index" in only:
        def _build():
            shutil.rmtree(idx_dir, ignore_errors=True)
            build_index(spark, corpus, idx_dir, n_buckets=8,
                        n_doc_buckets=1)
        timed("index_build", _build, 2)
    else:
        shutil.rmtree(idx_dir, ignore_errors=True)
        build_index(spark, corpus, idx_dir, n_buckets=8, n_doc_buckets=1)
    idx = Index(spark, idx_dir)
    qt = [(q, t, 1.0) for q, ts in entrymod.BM25_QUERIES for t in ts]

    if not only or "minhash" in only:
        from engine.pipeline import dedup

        def _minhash():
            mnd = dedup.minhash_near_dups(docs, threshold=0.3)
            mnd.count()
            mnd._minhash_sigs.unpersist()
        timed("minhash_dedup", _minhash, 2)

    if not only or "boolean" in only:
        timed("boolean_and", lambda: boolean_and(
            idx, entrymod.AND_QUERIES).count())

    if not only or "stringstats" in only:
        from engine.search import string_stats_agg
        timed("string_stats", lambda: string_stats_agg(
            idx, entrymod.BM25_QUERIES).collect(), 2)

    if not only or "bpe" in only:
        from engine.pipeline import bpe

        def _bpe():
            merges = bpe.bpe_train(docs, 200, min_count=2, mode="driver")
            bpe.bpe_encode(docs, merges).select(
                F.sum(F.size("tokens"))).collect()
        timed("bpe_train_encode", _bpe, 2)

    if not only or "mbp" in only:
        from engine.search import match_bool_prefix_topk
        mbp = [(q, " ".join(ts[:-1] + [ts[-1][:4]]))
               for q, ts in entrymod.BM25_QUERIES]
        timed("match_bool_prefix",
              lambda: match_bool_prefix_topk(idx, mbp, 10).collect())

    if not only or "sqs" in only:
        from engine.queryparse import simple_query_string_topk
        timed("simple_query_string", lambda: simple_query_string_topk(
            idx, "sq1", entrymod.SQS_QUERY, 10).collect())

    if not only or "scripted" in only:
        from engine.search import scripted_metric_agg
        timed("scripted_metric", lambda: scripted_metric_agg(
            idx, entrymod.BM25_QUERIES, "dl * nc", "avg",
            "state / 1000.0").collect())

    shutil.rmtree(idx_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
