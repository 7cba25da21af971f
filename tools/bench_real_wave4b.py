#!/usr/bin/env python
"""Real-corpus (527k-doc TREC) measurements for the round-4 late-wave
operators: rare_terms, sampler/diversified_sampler, significant_text
(re-analysis on a STEMMED index — the analyzer-parity path), boosting,
terms_set, and the metric aggs (weighted_avg / boxplot / MAD /
multi_terms) — each timed on local[N] against /tmp/trec_idx.

Usage: python tools/bench_real_wave4b.py [--index-dir /tmp/trec_idx]
       [--cpus 16]
Writes bench_out/real_wave4b.json. Run from a snapshot copy if editing
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
    ap.add_argument("--cpus", default="16")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from engine.analysis import tokenize_texts
    from engine.search import (Index, boosting_topk, boxplot_agg,
                               mad_agg, multi_terms_agg, rare_terms_agg,
                               sampler_facet, significant_text,
                               terms_set_topk, weighted_avg_agg)
    from engine.session import get_spark

    spark = get_spark(app="bench-real-w4b", master=f"local[{args.cpus}]",
                      shuffle_partitions=int(args.cpus) * 2)
    spark.sparkContext.setLogLevel("ERROR")
    idx = Index(spark, args.index_dir)
    out: dict = {"n_docs": idx.n_docs}
    opts = idx.analyzer_opts()

    def analyze(*words: str) -> list[str]:
        return [t for toks in tokenize_texts(list(words), **opts)
                for t in toks]

    # matched-set queries in the 50-60k-doc class (same vocabulary the
    # wave-14-16 benches used, analyzed through the index's stemmer)
    q_sets = [("r1", analyze("trade", "policy")),
              ("r2", analyze("health", "care", "hospital"))]

    def bench(name, fn):
        t0 = time.time()
        n = fn()
        out[f"{name}_s"] = round(time.time() - t0, 1)
        out[f"{name}_rows"] = int(n)
        print(json.dumps({"op": name, "sec": out[f"{name}_s"],
                          "rows": int(n)}), flush=True)

    bench("rare_terms",
          lambda: len(rare_terms_agg(idx, q_sets, 2).collect()))
    bench("sampler_repo",
          lambda: len(sampler_facet(idx, q_sets, "repo", 100).collect()))
    bench("diversified_sampler", lambda: len(sampler_facet(
        idx, q_sets, "repo", 100,
        dedup_expr=F.col("repo"), max_per_value=40).collect()))
    # significant_text on a stemmed index: re-analysis must stem or
    # every fg term misses the dictionary — the parity path on real data
    bench("significant_text", lambda: len(significant_text(
        idx, q_sets, 10, shard_size=25,
        filter_duplicate_text=True).collect()))
    bq = [("b1", analyze("trade", "policy"), analyze("soviet")),
          ("b2", analyze("health", "care"), analyze("insurance"))]
    bench("boosting",
          lambda: len(boosting_topk(idx, bq, 1000, 0.3).collect()))
    req = idx.docs.select(
        "doc_id",
        (F.lit(1) + F.pmod(F.length("content"), F.lit(3)))
        .alias("required_matches"))
    tq = [("t1", analyze("trade", "policy", "export", "tariff")),
          ("t2", analyze("health", "care", "hospital", "insurance"))]
    bench("terms_set",
          lambda: len(terms_set_topk(idx, tq, req, 1000).collect()))
    bench("weighted_avg",
          lambda: len(weighted_avg_agg(idx, q_sets).collect()))
    bench("boxplot",
          lambda: len(boxplot_agg(idx, q_sets).collect()))
    bench("mad", lambda: len(mad_agg(idx, q_sets).collect()))
    fields = idx.docs.select(
        "doc_id", "repo",
        (F.floor(F.length("content") / F.lit(2000)) * F.lit(2000))
        .cast("long").alias("len_bucket"))
    bench("multi_terms", lambda: len(multi_terms_agg(
        idx, q_sets, fields, ["repo", "len_bucket"], 10).collect()))

    os.makedirs("bench_out", exist_ok=True)
    with open("bench_out/real_wave4b.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
