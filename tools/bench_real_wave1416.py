#!/usr/bin/env python
"""Real-corpus (527k-doc TREC) measurements for the wave-14/15/16
operators: free-text MLT, SpanNot, matrix_stats, percentile_ranks.

Usage: python tools/bench_real_wave1416.py [--index-dir /tmp/trec_idx]
       [--cpus 16]
Writes bench_out/real_wave1416_r3.json.
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

    from engine.search import (Index, matrix_stats_agg, more_like_text,
                               percentile_ranks_agg)
    from engine.session import get_spark

    spark = get_spark(app="bench-real-w1416",
                      master=f"local[{args.cpus}]",
                      shuffle_partitions=int(args.cpus) * 2)
    spark.sparkContext.setLogLevel("ERROR")
    idx = Index(spark, args.index_dir)
    out: dict = {"n_docs": idx.n_docs}

    # --- free-text MLT -------------------------------------------------
    mlt_q = [("m1", "The collapse of the Soviet Union reshaped trade "
                    "policy across eastern Europe"),
             ("m2", "hospital health care reform and insurance costs")]
    t0 = time.time()
    rows = more_like_text(idx, mlt_q, 10).collect()
    out["mlt_text_s"] = round(time.time() - t0, 1)
    out["mlt_text_rows"] = len(rows)

    # --- SpanNot -------------------------------------------------------
    from engine.positions import span_not_match

    snq = [("s1", "bank", "river"), ("s2", "union", "soviet")]
    t0 = time.time()
    per = {r["qid"]: r["n"] for r in
           span_not_match(idx, snq, pre=5, post=5)
           .groupBy("qid").count().withColumnRenamed("count", "n")
           .collect()}
    out["span_not_s"] = round(time.time() - t0, 1)
    out["span_not_hits"] = per
    # the exclusion must bite: plain term match is strictly bigger
    plain = {r["qid"]: r["n"] for r in
             span_not_match(idx, [(q, inc, "zzznope") for q, inc, _ in snq])
             .groupBy("qid").count().withColumnRenamed("count", "n")
             .collect()}
    out["span_not_plain"] = plain

    # --- matrix_stats / percentile_ranks --------------------------------
    qts = [("q1", ["soviet", "union"]), ("q2", ["health", "care"])]
    t0 = time.time()
    ms = {r["qid"]: {"count": r["count"], "corr": r["corr"],
                     "mean_dl": r["mean_dl"]}
          for r in matrix_stats_agg(idx, qts).collect()}
    out["matrix_stats_s"] = round(time.time() - t0, 1)
    out["matrix_stats"] = ms

    t0 = time.time()
    pr = {f'{r["qid"]}@{r["value"]}': r["pct_rank"] for r in
          percentile_ranks_agg(idx, qts, [100, 500, 2000]).collect()}
    out["percentile_ranks_s"] = round(time.time() - t0, 1)
    out["percentile_ranks"] = pr

    os.makedirs("bench_out", exist_ok=True)
    with open("bench_out/real_wave1416_r3.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
