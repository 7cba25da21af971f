#!/usr/bin/env python
"""Dump .explain('formatted') for the round-6 optimization targets.

Usage: python tools/dump_plans_r06.py <out_dir> [sf_dir]
Run once from the round-start tree (-> *_before.txt) and once from the
optimized tree (-> *_after.txt); the judge checks plan claims against
these files.
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F


def main() -> None:
    out_dir = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    suffix = sys.argv[3] if len(sys.argv) > 3 else "after"
    os.makedirs(out_dir, exist_ok=True)

    from engine.session import get_spark

    spark = get_spark(app="plans_r06", master="local[8]",
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod
    from engine.index_build import build_index
    from engine.search import Index, score_exhaustive, score_wand

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    idx_dir = f"/tmp/plans_r06_idx_{os.getpid()}"
    shutil.rmtree(idx_dir, ignore_errors=True)
    build_index(spark, entrymod._documents_as_corpus(docs), idx_dir,
                n_buckets=8, n_doc_buckets=1)
    idx = Index(spark, idx_dir)
    qt = [(q, t, 1.0) for q, terms in entrymod.BM25_QUERIES for t in terms]

    def dump(name, df):
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution
                .ExplainMode.fromString("formatted")))
        print("wrote", path)

    from engine.pipeline import bpe, dedup, similarity, textstats

    dump("minhash_signatures", dedup.minhash_signatures(docs))
    # NB: the _before file was dumped with persist=False (old code:
    # same subtree shape as persist=True minus the cache node); the
    # _after uses the bench's persist=True so the narrow sig-only
    # InMemoryRelation + fresh shingle subtree are visible.
    mnd = dedup.minhash_near_dups(docs, threshold=0.3)
    dump("minhash_near_dups", mnd)
    if getattr(mnd, "_minhash_sigs", None) is not None:
        mnd._minhash_sigs.unpersist()
    from engine.search import boolean_and, scripted_metric_agg
    dump("boolean_and", boolean_and(idx, entrymod.AND_QUERIES))
    dump("scripted_metric", scripted_metric_agg(
        idx, entrymod.BM25_QUERIES, "dl * nc", "avg", "state / 1000.0"))
    dump("simhash", dedup.simhash(docs))
    from engine.search import string_stats_agg
    dump("string_stats", string_stats_agg(idx, entrymod.BM25_QUERIES))
    dump("exhaustive_topk", score_exhaustive(idx, qt, 10))
    dump("wand_topk", score_wand(idx, qt, 10))
    from engine.search import match_bool_prefix_topk
    mbp = [(q, " ".join(ts[:-1] + [ts[-1][:4]]))
           for q, ts in entrymod.BM25_QUERIES]
    dump("match_bool_prefix", match_bool_prefix_topk(idx, mbp, 10))
    dump("bpe_word_frequencies", bpe.word_frequencies(docs))
    merges = [(0, "t", "h", 1), (1, "th", "e", 1)]
    dump("bpe_encode", bpe.bpe_encode(docs, merges))
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dump("cosine_topk", similarity.cosine_topk(
        emb, entrymod.ANN_QUERY_IDS, 10))
    dump("quality_lang", textstats.quality_scores(docs).join(
        textstats.lang_id(docs), "doc_id"))
    # the index build's postings-encode stage (the plan, not the write)
    from engine.index_build import _paths, load_stats
    stats = load_stats(spark, idx_dir)
    tf_all = spark.read.parquet(_paths(idx_dir)["tf"])
    try:
        from engine.index_build import _encode_tf_arrow
        enc = _encode_tf_arrow(tf_all, stats["avgdl"], stats["k1"],
                               stats["b"], stats["block_size"],
                               stats["codec"])
    except ImportError:
        from engine.index_build import _ENC_SCHEMA, _make_encode_fn
        enc = tf_all.groupBy("bucket", "term", "salt").applyInPandas(
            _make_encode_fn(stats["avgdl"], stats["k1"], stats["b"],
                            stats["block_size"], stats["codec"]),
            schema=_ENC_SCHEMA)
    dump("index_postings_encode", enc)
    shutil.rmtree(idx_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
