#!/usr/bin/env python
"""Real-scale measurements for the round-4 closing wave on the
527k-doc TREC index: simple_query_string with a mixed boolean tree
(phrase gate + negation + OR group), span_or-near over the positional
sidecar, value_count/missing/global over a derived stored field,
cross_fields over two REAL field indexes (TREC TITLE-ish head slice
vs body), and percentiles_bucket over the sf0.1 events table.

Usage: python tools/bench_real_wave4g.py [--index-dir /tmp/trec_idx]
       [--events /root/testdata/sf0.1/events.parquet] [--cpus 12]
Writes bench_out/real_wave4g.json. Run from a snapshot copy if editing
the repo meanwhile — executors re-import modules from disk.
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
    ap.add_argument("--events",
                    default="/root/testdata/sf0.1/events.parquet")
    ap.add_argument("--cpus", default="12")
    ap.add_argument("--skip-fields", action="store_true",
                    help="skip the cross_fields two-index build")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from engine import streaming
    from engine.analysis import tokenize_texts
    from engine.positions import build_positions, span_or_near_match
    from engine.queryparse import simple_query_string_topk
    from engine.search import Index, value_count_missing_agg
    from engine.session import get_spark

    spark = get_spark(app="bench-real-w4g", master=f"local[{args.cpus}]",
                      shuffle_partitions=int(args.cpus) * 2)
    spark.sparkContext.setLogLevel("ERROR")
    idx = Index(spark, args.index_dir)
    out: dict = {"n_docs": idx.n_docs}
    opts = idx.analyzer_opts()

    def analyze(*words: str) -> list[str]:
        return [t for toks in tokenize_texts(list(words), **opts)
                for t in toks]

    def bench(name, fn):
        t0 = time.time()
        r = fn()
        out[f"{name}_s"] = round(time.time() - t0, 1)
        out[f"{name}_rows"] = len(r)
        print(json.dumps({"op": name, "sec": out[f"{name}_s"],
                          "rows": len(r)}), flush=True)
        return r

    t0 = time.time()
    build_positions(spark, idx.index_dir)
    out["positions_build_s"] = round(time.time() - t0, 1)

    # simple_query_string: term + OR group + phrase gate + negation
    # (raw surface words — the parser analyzes them itself)
    tr, po, he, ho = "trade", "policy", "health", "hospital"
    sq = f'{tr} + ({po} | {he}) -"{ho} care" {tr[:4]}*'
    sqs = bench("simple_query_string", lambda: simple_query_string_topk(
        idx, "q1", sq, 1000).collect())
    out["sqs_query"] = sq
    # pure term tree for cost comparison (no phrase gate, no prefix)
    sq2 = f"{tr} + ({po} | {he})"
    bench("sqs_terms_only", lambda: simple_query_string_topk(
        idx, "q1", sq2, 1000).collect())

    so = bench("span_or_near", lambda: span_or_near_match(
        idx, [("q1", ["trade", "export"], "policy", 4),
              ("q2", ["health", "medical"], "hospital", 4)]).collect())
    out["span_or_docs"] = len({(r["qid"], r["doc_id"]) for r in so})

    # value_count/missing/global: year-mention extraction on the REAL
    # corpus (the derived-optional-field reading; both branches bite)
    fields = idx.docs.select(
        "doc_id", F.nullif(F.regexp_extract(
            "content", r"\b(19|20)\d\d\b", 0), F.lit("")).alias("year"))
    queries = [("q1", analyze("trade", "policy")),
               ("q2", analyze("health", "care", "hospital"))]
    vc = bench("value_count_missing", lambda: value_count_missing_agg(
        idx, queries, fields, "year").collect())
    out["value_count_rows"] = [(r["qid"], r["n_docs"], r["value_count"],
                                r["missing"]) for r in vc]

    if not args.skip_fields:
        # two REAL field indexes over the same corpus rows: title-ish
        # head slice (first 10 analyzed-ish words) vs full body —
        # doc-aligned for free by deterministic (repo, path) ids
        from engine.fields import cross_fields_topk, dismax_topk
        from engine.index_build import build_index
        docs = idx.docs.select("docno", "content")
        corpus = docs.select(
            F.split(F.col("docno"), "/").getItem(0).alias("repo"),
            F.col("docno").alias("path"),
            F.lit("c" * 12).alias("commit"), F.lit("txt").alias("lang"),
            F.col("content"))
        head = corpus.withColumn(
            "content",
            F.concat_ws(" ", F.slice(F.split("content", r"\s+"), 1, 10)))
        # path keyed by corpus size — a smoke run at another sf must
        # never leak its tiny field indexes into the real measurement
        base = f"/tmp/w4g_fields_{idx.n_docs}"
        t0 = time.time()
        for sub, df in (("head", head), ("body", corpus)):
            p = f"{base}/{sub}"
            if not os.path.exists(f"{p}/stats"):
                build_index(spark, df, p, n_buckets=16,
                            n_doc_buckets=32, stem=opts["stem"],
                            stemmer=opts["stemmer"],
                            ascii_fold=opts["ascii_fold"])
        out["field_index_build_s"] = round(time.time() - t0, 1)
        fidx = {"head": Index(spark, f"{base}/head"),
                "body": Index(spark, f"{base}/body")}
        cq = [(q, t, 1.0) for q, ts in queries for t in ts]
        xf = bench("cross_fields", lambda: cross_fields_topk(
            fidx, cq, 1000, tie_breaker=0.3).collect())
        bf = bench("best_fields_dismax", lambda: dismax_topk(
            fidx, [(q, f, t, w) for q, t, w in cq
                   for f in ("head", "body")], 1000,
            tie_breaker=0.3).collect())
        xp = {(r["qid"], r["doc_id"]) for r in xf}
        bp = {(r["qid"], r["doc_id"]) for r in bf}
        out["cross_vs_best_overlap"] = len(xp & bp)

    ev = spark.read.parquet(args.events)
    out["n_events"] = ev.count()
    bench("percentiles_bucket", lambda:
          streaming.windowed_percentiles_bucket(ev).collect())

    os.makedirs("bench_out", exist_ok=True)
    with open("bench_out/real_wave4g.json", "w") as f:
        json.dump(out, f, indent=1, default=str)
    print(json.dumps(out, default=str), flush=True)


if __name__ == "__main__":
    main()
