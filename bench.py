#!/usr/bin/env python
"""Headline benchmark. Runs on $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) at local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...}.

Every timed section runs BEST-OF-N inside this one invocation
($SPARK_GRAFT_BENCH_REPS, default 3; the heavy build/pipeline rows
default to 2) — the r4 adjudication showed single-shot numbers on this
shared VM drift 1.4-1.9x with noisy neighbors, so a single driver run
must be drift-resistant by construction (the same lesson
tools/bench_scaling.py already encodes). The reported total is the sum
of per-query minima.

Queries benched (each timed to completion, i.e. a full action):

  index_build      tokenize → tf/df/dl → salted encode → postings+manifest
                   (fresh build each rep; the headline metric)
  wand_topk        block-max WAND BM25 top-10, 5 queries, via the index
  exhaustive_topk  full-scoring BM25 top-10 (no index reuse of decode)
  boolean_and      posting-intersection AND over 4 queries
  minhash_dedup    MinHash→LSH→Jaccard near-dup pipeline
  cosine_topk      brute-force cosine top-10, 5 query vectors
  simhash          tf-weighted 32-bit simhash for every doc
  quality_lang     quality scores + language ID full pass
  substring_dedup  ExactSubstr duplicated-span removal (window hash)
  nb_classifier    NB quality-classifier fit + full-corpus inference
  lm_perplexity    CCNet bigram-LM cross-entropy fit + full-corpus score
  bpe_train_encode BPE: word-freq agg + 200-merge driver train + full
                   corpus encode (zero-shuffle pandas UDF)
  highlight        WAND top-10 page + best-passage <em> snippets
  rank_feature     ES rank_feature saturation boost top-10 (cut last)
  string_stats     char-distribution entropy agg over the match sets
  match_bool_prefix search_as_you_type query: BM25 terms + constant-
                   score last-term prefix, top-10
  simple_query_string  the lenient user-facing boolean-tree query
                   (terms + OR group + NOT + prefix, one pivot)
  scripted_metric  map/combine/reduce agg as Catalyst SQL (avg of
                   dl*nc per match set, one reduce expression)

Extra keys: docs_per_sec (index build throughput), n_docs, reps.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import functions as F


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    heavy_reps = max(2, reps - 1)

    from engine.session import get_spark

    spark = get_spark(app="bench", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod
    from engine.index_build import build_index
    from engine.search import Index, boolean_and, score_exhaustive, score_wand

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()
    timings: dict[str, float] = {}

    def bench(name: str, fn, n: int = reps) -> None:
        """Best-of-n wall time for fn() — min over reps filters the
        VM's noisy-neighbor inflation out of a single invocation."""
        best = float("inf")
        for _ in range(n):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        timings[name] = best

    # small corpora don't amortize 32-way reduce tasks: fewer shuffle
    # partitions measurably speed every stage at sf<=0.1 (A/B in
    # BENCH.md); a real run at cluster scale keeps partitions ∝ cores
    if n_docs <= 50_000:
        spark.conf.set("spark.sql.shuffle.partitions", "8")

    # --- untimed warmup: one miniature build+query so the timed
    # sections measure the engine, not JVM JIT + whole-stage-codegen
    # compilation (standard benchmark practice; the first build in a
    # fresh JVM is ~3x slower than every later one, see BENCH.md) ---
    warm_dir = f"/tmp/bench_warm_{os.getpid()}"
    shutil.rmtree(warm_dir, ignore_errors=True)
    build_index(spark, entrymod._documents_as_corpus(docs.limit(256)),
                warm_dir, n_buckets=2, n_doc_buckets=1)
    score_wand(Index(spark, warm_dir),
               [(q, t, 1.0) for q, ts in entrymod.BM25_QUERIES for t in ts],
               5).collect()
    shutil.rmtree(warm_dir, ignore_errors=True)

    # --- index build (fresh each rep; metrics kept from the last) ---
    idx_dir = f"/tmp/bench_idx_{os.getpid()}"
    corpus = entrymod._documents_as_corpus(docs)
    metrics: dict = {}

    def _build():
        shutil.rmtree(idx_dir, ignore_errors=True)
        # 8 term buckets: at this corpus size more buckets only
        # multiply dynamic-partition write overhead (files = buckets
        # × tasks)
        metrics.update(build_index(spark, corpus, idx_dir, n_buckets=8,
                                   n_doc_buckets=1))

    bench("index_build", _build, heavy_reps)
    idx = Index(spark, idx_dir)

    qt = [(q, t, 1.0) for q, terms in entrymod.BM25_QUERIES for t in terms]

    bench("wand_topk", lambda: score_wand(idx, qt, 10).collect())

    # decode-skip evidence (not timed into the headline): fraction of
    # postings the BMW kernel actually scored for the same queries
    from engine.search import wand_stats
    ws = wand_stats(idx, qt, 10).groupBy().sum(
        "blocks_total", "blocks_decoded",
        "postings_total", "postings_scored").collect()[0]
    wand_skip = {
        "blocks_decoded_pct": round(100.0 * ws[1] / max(ws[0], 1), 1),
        "postings_scored_pct": round(100.0 * ws[3] / max(ws[2], 1), 1),
    }
    # the bounded-additive-feature kernel path (rank_feature below runs
    # it): same counters under the θ relaxation it actually uses
    from engine.search import WAND_FEATURE_EPS
    fs = wand_stats(idx, qt, 10,
                    ub_shift=entrymod.RF_BOOST + WAND_FEATURE_EPS
                    ).groupBy().sum(
        "blocks_total", "blocks_decoded",
        "postings_total", "postings_scored").collect()[0]
    feature_wand_skip = {
        "ub_shift": entrymod.RF_BOOST,
        "blocks_decoded_pct": round(100.0 * fs[1] / max(fs[0], 1), 1),
        "postings_scored_pct": round(100.0 * fs[3] / max(fs[2], 1), 1),
    }

    bench("exhaustive_topk", lambda: score_exhaustive(idx, qt, 10).collect())
    bench("boolean_and",
          lambda: boolean_and(idx, entrymod.AND_QUERIES).count())

    from engine.pipeline import dedup, similarity, textstats

    def _minhash():
        mnd = dedup.minhash_near_dups(docs, threshold=0.3)
        mnd.count()
        mnd._minhash_sigs.unpersist()  # release cached signature blocks

    bench("minhash_dedup", _minhash, heavy_reps)

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    bench("cosine_topk", lambda: similarity.cosine_topk(
        emb, entrymod.ANN_QUERY_IDS, 10).count())
    bench("simhash", lambda: dedup.simhash(docs).count())

    def _quality_lang():
        q = textstats.quality_scores(docs)
        li = textstats.lang_id(docs)
        q.join(li, "doc_id").count()

    bench("quality_lang", _quality_lang)

    from engine.pipeline import curation

    bench("substring_dedup", lambda: curation.exact_substring_dedup(
        docs, n=10).count(), heavy_reps)
    bench("nb_classifier", lambda: textstats.nb_classifier(
        docs.withColumn("pos", F.col("lang") == "en"), "pos").count())
    bench("lm_perplexity", lambda: textstats.lm_cross_entropy(
        docs.withColumn("r", F.col("lang") == "en"), "r").count())

    from engine.pipeline import bpe

    def _bpe():
        merges = bpe.bpe_train(docs, 200, min_count=2, mode="driver")
        bpe.bpe_encode(docs, merges).select(
            F.sum(F.size("tokens"))).collect()

    bench("bpe_train_encode", _bpe, heavy_reps)

    from engine.highlight import highlight

    bench("highlight", lambda: highlight(
        score_wand(idx, qt, 10), docs.select("doc_id", "text"),
        entrymod.BM25_QUERIES, window=12).count())

    from engine.search import rank_feature_topk, string_stats_agg

    bench("rank_feature", lambda: rank_feature_topk(
        idx, qt, 10, pivot=entrymod.RF_PIVOT,
        boost=entrymod.RF_BOOST).collect())
    bench("string_stats", lambda: string_stats_agg(
        idx, entrymod.BM25_QUERIES).collect(), heavy_reps)

    from engine.search import match_bool_prefix_topk, scripted_metric_agg

    mbp = [(q, " ".join(ts[:-1] + [ts[-1][:4]]))
           for q, ts in entrymod.BM25_QUERIES]
    bench("match_bool_prefix",
          lambda: match_bool_prefix_topk(idx, mbp, 10).collect())
    bench("scripted_metric", lambda: scripted_metric_agg(
        idx, entrymod.BM25_QUERIES, "dl * nc", "avg",
        "state / 1000.0").collect())

    from engine.queryparse import simple_query_string_topk

    bench("simple_query_string", lambda: simple_query_string_topk(
        idx, "sq1", entrymod.SQS_QUERY, 10).collect())

    from engine.streaming import sessionize

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    bench("sessionize",
          lambda: sessionize(events, gap="30 minutes").count())
    bench("ann_multiprobe", lambda: similarity.cosine_topk_multiprobe(
        emb, entrymod.ANN_QUERY_IDS, 10,
        dims=[0, 8, 16, 24, 32, 40, 48, 56]).count())

    shutil.rmtree(idx_dir, ignore_errors=True)
    total = sum(timings.values())
    out = {
        "metric": "engine_bench_total",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in timings.items()},
        "sf": sf_dir,
        "n_docs": n_docs,
        "docs_per_sec": round(metrics["docs_per_sec"], 1),
        "index_bytes": metrics["index_bytes"],
        "n_postings": metrics["n_postings"],
        "wand_skip": wand_skip,
        "feature_wand_skip": feature_wand_skip,
        "reps": {"default": reps, "heavy": heavy_reps},
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
