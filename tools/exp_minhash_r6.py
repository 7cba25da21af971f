#!/usr/bin/env python
"""A/B experiment: minhash_near_dups persist strategies (round 6).

v0: current pipeline (persist=True on the full signature table)
v1: persist only (doc_id, sig); verify recomputes shingles from docs
v2: no persist; band self-join reuses its own exchange, verify
    recomputes shingles per join side
v3: persist (doc_id, sig) AND (doc_id, shingles) separately

Prints wall time + pair counts for equivalence.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1big"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from engine.session import get_spark, fan_out
    from engine.pipeline import dedup

    spark = get_spark(app="exp_minhash", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    if n <= 50_000:
        spark.conf.set("spark.sql.shuffle.partitions", "8")

    # warmup
    dedup.minhash_near_dups(docs.limit(500), threshold=0.3,
                            persist=False).count()

    def timed(label, fn, reps=2):
        best = float("inf")
        res = None
        for _ in range(reps):
            t0 = time.time()
            res = fn()
            best = min(best, time.time() - t0)
        print(f"{label:28s} {best:7.3f}s  pairs={res}")

    def v0():
        mnd = dedup.minhash_near_dups(docs, threshold=0.3)
        c = mnd.count()
        mnd._minhash_sigs.unpersist()
        return c

    def v1():
        sigs = dedup.minhash_signatures(docs)
        small = sigs.select("doc_id", "sig").persist()
        pairs = dedup.lsh_candidate_pairs(small)
        sh = fan_out(docs).where(
            F.size(dedup._tokens(F.col("text"))) >= 3).select(
            F.col("doc_id"),
            dedup.shingles_col(F.col("text"), 3).alias("shingles"))
        out = dedup.jaccard_verify(sh, pairs, 0.3)
        c = out.count()
        small.unpersist()
        return c

    def v2():
        sigs = dedup.minhash_signatures(docs).select("doc_id", "sig")
        pairs = dedup.lsh_candidate_pairs(sigs)
        sh = fan_out(docs).where(
            F.size(dedup._tokens(F.col("text"))) >= 3).select(
            F.col("doc_id"),
            dedup.shingles_col(F.col("text"), 3).alias("shingles"))
        out = dedup.jaccard_verify(sh, pairs, 0.3)
        return out.count()

    def v3():
        sigs = dedup.minhash_signatures(docs)
        small = sigs.select("doc_id", "sig").persist()
        shs = sigs.select("doc_id", "shingles").persist()
        pairs = dedup.lsh_candidate_pairs(small)
        out = dedup.jaccard_verify(shs, pairs, 0.3)
        c = out.count()
        small.unpersist()
        shs.unpersist()
        return c

    timed("v0 current persist=True", v0)
    timed("v1 sig-persist + recompute", v1)
    timed("v2 no persist", v2)
    timed("v3 split persists", v3)
    spark.stop()


if __name__ == "__main__":
    main()
