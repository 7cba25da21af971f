#!/usr/bin/env python
"""Round-6 profiling: isolate the stages of the heavy bench rows
(guide §1.1/§1.4 — noop-sink isolation, labeled jobs). Not part of the
frozen bench; numbers feed OPTIMIZATION_r06.md.

Usage: python tools/bench_profile_r6.py [sf_dir] [section ...]
Sections: index minhash stringstats mbp bpe
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf1.0"
    only = set(sys.argv[2:])
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from engine.session import get_spark

    spark = get_spark(app="profile_r6", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    import __spark_entry__ as entrymod
    from engine.index_build import build_index
    from engine.search import Index, score_wand

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()
    if n_docs <= 50_000:
        spark.conf.set("spark.sql.shuffle.partitions", "8")

    def timed(label, fn, n=2):
        best = float("inf")
        for _ in range(n):
            sc.setJobDescription(label)
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        sc.setJobDescription(None)
        print(f"{label:45s} {best:8.3f}s")
        return best

    # warmup (same as bench.py)
    warm_dir = f"/tmp/prof_warm_{os.getpid()}"
    shutil.rmtree(warm_dir, ignore_errors=True)
    build_index(spark, entrymod._documents_as_corpus(docs.limit(256)),
                warm_dir, n_buckets=2, n_doc_buckets=1)
    score_wand(Index(spark, warm_dir),
               [(q, t, 1.0) for q, ts in entrymod.BM25_QUERIES for t in ts],
               5).collect()
    shutil.rmtree(warm_dir, ignore_errors=True)

    idx_dir = f"/tmp/prof_idx_{os.getpid()}"
    corpus = entrymod._documents_as_corpus(docs)

    if not only or "index" in only:
        shutil.rmtree(idx_dir, ignore_errors=True)
        m = build_index(spark, corpus, idx_dir, n_buckets=8,
                        n_doc_buckets=1)
        print({k: round(v, 3) for k, v in m.items()
               if k.startswith("sec_")})
        shutil.rmtree(idx_dir, ignore_errors=True)
        m = build_index(spark, corpus, idx_dir, n_buckets=8,
                        n_doc_buckets=1)
        print({k: round(v, 3) for k, v in m.items()
               if k.startswith("sec_")})
    else:
        shutil.rmtree(idx_dir, ignore_errors=True)
        build_index(spark, corpus, idx_dir, n_buckets=8, n_doc_buckets=1)
    idx = Index(spark, idx_dir)
    qt = [(q, t, 1.0) for q, terms in entrymod.BM25_QUERIES
          for t in terms]

    if not only or "minhash" in only:
        from engine.pipeline import dedup

        sigs = dedup.minhash_signatures(docs)
        timed("minhash: signatures (noop, no persist)", lambda: noop(sigs))
        timed("minhash: shingles only (noop)", lambda: noop(
            docs.select("doc_id",
                        dedup.shingles_col(F.col("text")).alias("sh"))))
        timed("minhash: tokens only (noop)", lambda: noop(
            docs.select("doc_id",
                        dedup._tokens(F.col("text")).alias("t"))))

        def full(persist):
            mnd = dedup.minhash_near_dups(docs, threshold=0.3,
                                          persist=persist)
            mnd.count()
            if persist is True:
                mnd._minhash_sigs.unpersist()

        timed("minhash: full persist=True", lambda: full(True))

        def stage_counts():
            s = dedup.minhash_signatures(docs).persist()
            t0 = time.time()
            s.count()
            t1 = time.time()
            pairs = dedup.lsh_candidate_pairs(s)
            n_pairs = pairs.count()
            t2 = time.time()
            v = dedup.jaccard_verify(s, pairs, 0.3)
            n_v = v.count()
            t3 = time.time()
            s.unpersist()
            print(f"  sig materialize {t1-t0:6.3f}s | band join "
                  f"{t2-t1:6.3f}s ({n_pairs} pairs) | verify "
                  f"{t3-t2:6.3f}s ({n_v} kept)")

        sc.setJobDescription("minhash staged")
        stage_counts()
        sc.setJobDescription(None)

    if not only or "stringstats" in only:
        from engine.search import _matched_hits

        hits = _matched_hits(idx, entrymod.BM25_QUERIES)
        n_hits = hits.count()
        nd = hits.select("doc_id").distinct().count()
        print(f"  string_stats: hits={n_hits} distinct_docs={nd} "
              f"corpus={n_docs}")
        d = idx.docs.select("doc_id", "content",
                            F.length("content").cast("long").alias("nc"))
        rows = hits.join(d, "doc_id")
        timed("sstats: hits join docs (noop)", lambda: noop(rows))
        chars = (rows.select("qid", F.explode(F.split("content", ""))
                             .alias("ch"))
                 .where(F.length("ch") > 0)
                 .groupBy("qid", "ch")
                 .agg(F.count(F.lit(1)).alias("c")))
        timed("sstats: char explode+agg (noop)", lambda: noop(chars))
        from engine.search import string_stats_agg
        timed("sstats: full agg", lambda: string_stats_agg(
            idx, entrymod.BM25_QUERIES).collect())

    if not only or "mbp" in only:
        from engine.search import (match_bool_prefix_topk,
                                   expand_prefix_terms, score_exhaustive)

        mbp = [(q, " ".join(ts[:-1] + [ts[-1][:4]]))
               for q, ts in entrymod.BM25_QUERIES]
        timed("mbp: full", lambda: match_bool_prefix_topk(
            idx, mbp, 10).collect())
        from engine.analysis import tokenize_texts
        opts = idx.analyzer_opts()
        pref = []
        term_qt = []
        for qid, text in mbp:
            toks = tokenize_texts([text], **opts)[0]
            pref.append((qid, toks[-1]))
            for t in toks[:-1]:
                term_qt.append((qid, t, 1.0))
        timed("mbp: expand_prefix_terms", lambda: expand_prefix_terms(
            idx, pref))
        timed("mbp: term-side exhaustive", lambda: noop(
            score_exhaustive(idx, term_qt, None)))

    if not only or "bpe" in only:
        from engine.pipeline import bpe

        words = bpe.word_frequencies(docs)
        timed("bpe: word_frequencies (noop)", lambda: noop(words))

        def train_only():
            bpe.bpe_train(docs, 200, min_count=2, mode="driver")

        timed("bpe: train only", train_only)
        merges = bpe.bpe_train(docs, 200, min_count=2, mode="driver")
        mlist = bpe._merges_list(merges)
        timed("bpe: encode only", lambda: bpe.bpe_encode(
            docs, mlist).select(F.sum(F.size("tokens"))).collect())

    shutil.rmtree(idx_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
