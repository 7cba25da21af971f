#!/usr/bin/env python
"""Real-corpus (527k-doc TREC, 561k-term dictionary) measurements for
the round-3 wave-9/10/11 operators: trigram-pruned wildcards vs the
full dictionary scan (the headline claim), ordered intervals, top_hits
by collection, extended_stats, CCNet bigram-LM perplexity at 285M
tokens, and Bloom vs exact decontamination.

Usage: python tools/bench_real_wave911.py [--index-dir /tmp/trec_idx]
       [--cpus 16]
Writes bench_out/real_wave911_r3.json. Run from a snapshot copy if
editing the repo meanwhile (executors re-import modules from disk).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index-dir", default="/tmp/trec_idx")
    ap.add_argument("--cpus", default="16")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from engine.search import Index, expand_wildcard_terms
    from engine.session import get_spark
    from engine.trigram import (build_term_trigrams,
                                expand_wildcard_terms_trigram)

    spark = get_spark(app="bench-real-w911",
                      master=f"local[{args.cpus}]",
                      shuffle_partitions=int(args.cpus) * 2)
    spark.sparkContext.setLogLevel("ERROR")
    idx = Index(spark, args.index_dir)
    out: dict = {"n_docs": idx.n_docs,
                 "vocab": idx.termstats.count()}

    # --- trigram sidecar build -----------------------------------------
    t0 = time.time()
    built = build_term_trigrams(spark, idx.index_dir)
    out["trigram_build_s"] = round(time.time() - t0, 1)
    out["trigram_resumed"] = bool(built.get("resumed"))
    out["trigram_rows"] = spark.read.parquet(
        idx.index_dir + "/term_trigrams").count()

    # --- wildcard: full dictionary scan vs trigram pruning -------------
    pats = [("p1", "*ation*"), ("p2", "*ment"), ("p3", "gov*ment"),
            ("p4", "*icror*")]
    t0 = time.time()
    full = expand_wildcard_terms(idx, pats)
    out["wildcard_full_scan_s"] = round(time.time() - t0, 1)
    t0 = time.time()
    tri = expand_wildcard_terms_trigram(idx, pats)
    out["wildcard_trigram_s"] = round(time.time() - t0, 1)
    assert sorted(full) == sorted(tri), "trigram rewrite diverged!"
    per = {}
    for q, _, _ in full:
        per[q] = per.get(q, 0) + 1
    out["wildcard_terms_per_query"] = per
    out["wildcard_speedup"] = round(
        out["wildcard_full_scan_s"] / max(out["wildcard_trigram_s"], 1e-9),
        2)

    # --- ordered intervals on the real positional index ----------------
    from engine.positions import interval_match

    ivq = [("i1", "soviet union"), ("i2", "health care"),
           ("i3", "united states congress")]
    for g in (0, 4):
        t0 = time.time()
        hits = interval_match(idx, ivq, max_gaps=g)
        per_q = {r["qid"]: r["n"] for r in
                 hits.groupBy("qid").agg(F.count("*").alias("n"))
                 .collect()}
        out[f"intervals_g{g}_s"] = round(time.time() - t0, 1)
        out[f"intervals_g{g}_hits"] = per_q

    # --- top_hits by collection (repo) ----------------------------------
    from engine.search import extended_stats_agg, top_hits_agg

    qts = [("q1", ["soviet", "union"]), ("q2", ["health", "care"])]
    t0 = time.time()
    th = top_hits_agg(idx, qts, "repo", 4, 3).collect()
    out["top_hits_s"] = round(time.time() - t0, 1)
    out["top_hits_rows"] = len(th)

    t0 = time.time()
    es = {r["qid"]: {"count": r["count"], "avg_dl": r["avg_dl"],
                     "std_dev": r["std_dev"]}
          for r in extended_stats_agg(idx, qts).collect()}
    out["extended_stats_s"] = round(time.time() - t0, 1)
    out["extended_stats"] = es

    # --- CCNet bigram-LM perplexity at 285M tokens ----------------------
    from engine.pipeline.textstats import lm_cross_entropy

    docs = idx.docs.select("doc_id", "docno",
                           F.col("content").alias("text"))
    lab = docs.withColumn("r", F.col("docno").startswith("la"))
    t0 = time.time()
    ce = lm_cross_entropy(lab, "r", threshold=7.0)
    agg = ce.agg(
        F.avg(F.when(F.col("keep"), 1.0).otherwise(0.0)).alias("kept"),
        F.avg("cross_entropy").alias("mean_ce")).collect()[0]
    out["lm_perplexity_s"] = round(time.time() - t0, 1)
    out["lm_perplexity"] = {"kept_frac": round(agg["kept"], 4),
                            "mean_ce": round(agg["mean_ce"], 4)}
    # the property the filter relies on: in-domain (LA) docs score
    # lower cross-entropy than out-of-domain under the LA-trained LM
    by = (ce.join(lab.select("doc_id", "r"), "doc_id")
          .groupBy("r").agg(F.avg("cross_entropy").alias("m")).collect())
    out["lm_perplexity_by_slice"] = {
        ("la" if r["r"] else "rest"): round(r["m"], 4) for r in by}

    # --- Bloom vs exact decontamination ---------------------------------
    from engine.pipeline.curation import bloom_decontaminate, decontaminate

    ev = docs.where(F.col("doc_id") % 997 == 0)
    t0 = time.time()
    ex = decontaminate(docs, ev, n=10).agg(
        F.sum("n_hit").alias("h"),
        F.sum(F.when(F.col("contaminated"), 1).otherwise(0)).alias("c")
    ).collect()[0]
    out["decontam_exact_s"] = round(time.time() - t0, 1)
    t0 = time.time()
    bl = bloom_decontaminate(docs, ev, n=10).agg(
        F.sum("n_maybe").alias("h"),
        F.sum(F.when(F.col("contaminated"), 1).otherwise(0)).alias("c")
    ).collect()[0]
    out["decontam_bloom_s"] = round(time.time() - t0, 1)
    out["decontam"] = {
        "exact_hits": int(ex["h"]), "exact_flagged": int(ex["c"]),
        "bloom_maybe": int(bl["h"]), "bloom_flagged": int(bl["c"]),
    }
    assert bl["h"] >= ex["h"], "bloom lost a true hit (impossible)"

    os.makedirs("bench_out", exist_ok=True)
    with open("bench_out/real_wave911_r3.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
