#!/usr/bin/env python
"""Real-corpus (527k-doc TREC) measurements for the round-3 wave-4/5/6
operators: positional-index build at real scale, match_phrase_prefix,
did-you-mean over the real corpus LM, ExactSubstr span dedup across
527k real documents, the NB quality classifier fit on a real label
(LA Times vs the rest — distinguishable outlets), and Count-Min sketch
error against exact counts on a ~90M-token stream.

Usage: python tools/bench_real_wave47.py [--index-dir /tmp/trec_idx]
       [--cpus 16]
Writes bench_out/real_wave47_r3.json. Run from a snapshot copy if
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

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from engine.session import get_spark
    from engine.search import Index, random_score_topk

    spark = get_spark(app="bench-real-w47",
                      master=f"local[{args.cpus}]",
                      shuffle_partitions=int(args.cpus) * 2)
    spark.sparkContext.setLogLevel("ERROR")
    idx = Index(spark, args.index_dir)
    docs = idx.docs.select("doc_id", "docno",
                           F.col("content").alias("text"))
    out: dict = {"n_docs": idx.n_docs}

    # --- positional index build at real scale -------------------------
    from engine.positions import (build_positions, phrase_prefix_match,
                                  phrase_prefix_topk)

    t0 = time.time()
    built = build_positions(spark, idx.index_dir)
    out["positions_build_s"] = round(time.time() - t0, 1)
    out["positions_resumed"] = bool(built.get("resumed"))

    # --- match_phrase_prefix ------------------------------------------
    ppq = [("q1", "united stat"), ("q2", "soviet uni"),
           ("q3", "health car"), ("q4", "presiden")]
    t0 = time.time()
    hits = phrase_prefix_match(idx, ppq)
    per_q = {r["qid"]: r["n"] for r in
             hits.groupBy("qid").agg(F.count("*").alias("n")).collect()}
    out["phrase_prefix_match_s"] = round(time.time() - t0, 1)
    out["phrase_prefix_hits"] = per_q
    t0 = time.time()
    top = phrase_prefix_topk(idx, ppq, 10).collect()
    out["phrase_prefix_topk_s"] = round(time.time() - t0, 1)
    out["phrase_prefix_topk_rows"] = len(top)

    # --- did-you-mean over the real corpus LM -------------------------
    from engine.pipeline.textstats import did_you_mean

    dym = [("d1", "goverment policy"), ("d2", "enviromental protecton"),
           ("d3", "presidant electon"), ("d4", "soviet union")]
    t0 = time.time()
    sugg = {r["qid"]: (r["suggestion"], r["n_corrected"])
            for r in did_you_mean(docs, dym, max_edits=2).collect()}
    out["did_you_mean_s"] = round(time.time() - t0, 1)
    out["did_you_mean"] = sugg

    # --- ExactSubstr span dedup across 527k real docs -----------------
    from engine.pipeline.curation import exact_substring_dedup

    t0 = time.time()
    dd = exact_substring_dedup(docs, n=10)
    stats = dd.agg(
        F.sum("n_tokens").alias("tok"),
        F.sum("n_removed").alias("rem"),
        F.count(F.when(F.col("n_removed") > 0, 1)).alias("docs_hit"),
    ).collect()[0]
    out["substring_dedup_s"] = round(time.time() - t0, 1)
    out["substring_dedup"] = {
        "total_tokens": int(stats["tok"]),
        "tokens_removed": int(stats["rem"]),
        "removed_frac": round(stats["rem"] / max(stats["tok"], 1), 5),
        "docs_with_removal": int(stats["docs_hit"]),
    }

    # --- NB classifier on a real label (LA Times vs rest) -------------
    from engine.pipeline.textstats import nb_classifier

    lab = docs.withColumn("pos", F.col("docno").startswith("la"))
    t0 = time.time()
    nb = nb_classifier(lab, "pos")
    acc_row = (nb.join(lab.select("doc_id", "pos"), "doc_id")
               .agg(F.avg(F.when(F.col("pred") == F.col("pos"), 1.0)
                          .otherwise(0.0)).alias("acc"),
                    F.avg(F.when(F.col("pos"), 1.0).otherwise(0.0))
                    .alias("base")).collect()[0])
    out["nb_classifier_s"] = round(time.time() - t0, 1)
    out["nb_classifier"] = {
        "train_accuracy": round(acc_row["acc"], 4),
        "majority_baseline": round(max(acc_row["base"],
                                       1 - acc_row["base"]), 4),
    }

    # --- CMS error on the real token stream ---------------------------
    from engine import sketches
    from engine.pipeline.curation import _tokens

    toks = docs.select(F.explode(_tokens(F.col("text"))).alias("term"))
    t0 = time.time()
    regs = sketches.cms_registers(toks, [], "term")
    exact = toks.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    topw = Window.orderBy(F.desc("cnt"), F.asc("term"))
    top20 = (exact.withColumn("rn", F.row_number().over(topw))
             .where(F.col("rn") <= 20).drop("rn"))
    est = sketches.cms_lookup(regs, top20.select("term"), [], "term")
    rows = top20.join(est, "term").collect()
    out["cms_s"] = round(time.time() - t0, 1)
    n_stream = toks.count()
    errs = [(r["est"] - r["cnt"]) / n_stream for r in rows]
    out["cms"] = {
        "stream_tokens": int(n_stream),
        "max_overcount_frac_of_stream": round(max(errs), 6),
        "top1": {r["term"]: [int(r["cnt"]), int(r["est"])]
                 for r in rows[:3]},
    }

    # --- seeded random_score on the real index -------------------------
    rq = [("r1", ["soviet", "union"]), ("r2", ["health", "care"])]
    qt_an = []
    opts = idx.analyzer_opts()
    from engine.analysis import tokenize_texts
    for qid, terms in rq:
        qt_an.append((qid, [tokenize_texts([t], **opts)[0][0]
                            for t in terms]))
    t0 = time.time()
    n_rand = random_score_topk(idx, qt_an, 100).count()
    out["random_score_s"] = round(time.time() - t0, 1)
    out["random_score_rows"] = int(n_rand)

    os.makedirs("bench_out", exist_ok=True)
    with open("bench_out/real_wave47_r3.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
