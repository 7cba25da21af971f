#!/usr/bin/env python
"""Real-corpus (527k-doc TREC) measurements for the round-3 third-wave
operators: HLL cardinality vs exact count-distinct on the same matched
sets (the re-shuffle the sketch removes), HDR-bucket percentiles,
composite-agg pagination, and filtered ANN on a synthetic embedding
table sized to the corpus.

Usage: python tools/bench_real_wave3.py [--index-dir /tmp/trec_idx]
       [--cpus 16]
Writes bench_out/real_wave3_r3.json. Run from a snapshot copy if
editing the repo meanwhile (executors re-import modules from disk).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index-dir", default="/tmp/trec_idx")
    ap.add_argument("--cpus", default="16")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from engine.search import (Index, _matched_hits, _paths,
                               cardinality_agg, composite_agg,
                               percentiles_agg)
    from engine.session import get_spark
    from engine.topics import parse_topics, topics_to_query_terms

    spark = get_spark(app="real-wave3", master=f"local[{args.cpus}]",
                      shuffle_partitions=int(args.cpus) * 2)
    spark.sparkContext.setLogLevel("ERROR")
    results: dict[str, dict] = {}

    def bench(name, fn):
        t0 = time.time()
        n = fn()
        results[name] = {"sec": round(time.time() - t0, 2), "rows": int(n)}
        print(json.dumps({"op": name, **results[name]}), flush=True)

    idx = Index(spark, args.index_dir)
    with open(f"{REF}/topics") as f:
        topics = parse_topics(f.read())
    qt = topics_to_query_terms(topics, stem=True)
    queries = [(q, sorted({t for q2, t, _ in qt if q2 == q}))
               for q in sorted({q for q, _, _ in qt})]
    print(f"[queries] {len(queries)} topics", flush=True)

    # warmup (fresh-JVM codegen; CLAUDE.md)
    cardinality_agg(idx, queries[:1]).collect()

    # the headline pair: identical matched sets + identical value
    # source, sketch vs exact distinct
    bench("hll_cardinality_50topics", lambda: len(
        cardinality_agg(idx, queries).collect()))

    def _exact():
        hits = _matched_hits(idx, queries)
        tf = spark.read.parquet(
            _paths(idx.index_dir)["tf"]).select("doc_id", "term")
        return len(hits.join(tf, "doc_id").groupBy("qid")
                   .agg(F.count_distinct("term").alias("n")).collect())
    bench("exact_count_distinct_50topics", _exact)

    bench("percentiles_dl_50topics", lambda: len(
        percentiles_agg(idx, queries).collect()))

    # composite pagination: 3 pages of 20 (docno-prefix, lang) buckets
    fields = idx.docs.select(
        "doc_id", F.substring("path", 1, 3).alias("src"), "lang")

    def _composite_pages():
        total, after = 0, None
        for _ in range(3):
            page = composite_agg(idx, queries[:1], fields,
                                 ["src", "lang"], 20, after=after
                                 ).collect()
            total += len(page)
            if not page:
                break
            after = (page[-1]["src"], page[-1]["lang"])
        return total
    bench("composite_3pages_of_20", _composite_pages)

    # filtered ANN at corpus-row scale: deterministic synthetic
    # embeddings (dim 16) keyed by doc_id, filter keeps doc_id % 5 == 0
    from engine.pipeline.similarity import cosine_topk_ivf
    dim = 16
    emb = idx.docs.select("doc_id").withColumn(
        "embedding", F.array(*[
            (F.conv(F.substring(F.md5(F.concat(F.col("doc_id").cast("string"),
                                               F.lit(f"_{d}"))), 1, 6),
                    16, 10).cast("double") / F.lit(float(0xFFFFFF)))
            for d in range(dim)]))
    qids = [r["doc_id"] for r in idx.docs.select("doc_id")
            .orderBy("doc_id").limit(5).collect()]
    allowed = emb.where(F.col("doc_id") % 5 == 0).select(
        F.col("doc_id").alias("vec_id"))
    bench("filtered_ivf_527k_5q", lambda: len(cosine_topk_ivf(
        emb, qids, 10, n_centroids=None, n_probe=None,
        id_col="doc_id", allowed=allowed).collect()))

    os.makedirs("bench_out", exist_ok=True)
    with open("bench_out/real_wave3_r3.json", "w") as f:
        json.dump(results, f, indent=1)
    print("wrote bench_out/real_wave3_r3.json", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
