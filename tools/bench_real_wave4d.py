#!/usr/bin/env python
"""Real-scale measurements for the round-4 final wave: t_test on the
527k-doc TREC index (two 50-60k-doc populations), and the pipeline
aggs (bucket_script/selector/sort, normalize, cumulative_cardinality,
top_metrics) over the sf0.1 events table — the pipeline aggs are
volume-independent second passes by contract, so the interesting
number is cumulative_cardinality's densify grid (4096 registers x
|buckets| — calendar-bounded) and top_metrics' one event-scan window.

Usage: python tools/bench_real_wave4d.py [--index-dir /tmp/trec_idx]
       [--events /root/testdata/sf0.1/events.parquet] [--cpus 16]
Writes bench_out/real_wave4d.json. Run from a snapshot copy if editing
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
    ap.add_argument("--cpus", default="16")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from engine import streaming
    from engine.analysis import tokenize_texts
    from engine.search import Index, t_test_agg
    from engine.session import get_spark

    spark = get_spark(app="bench-real-w4d", master=f"local[{args.cpus}]",
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

    # the same 50-60k-doc population class the metric-agg benches use
    pairs = [("p1", analyze("trade", "policy"),
              analyze("health", "care", "hospital"))]
    rows = bench("t_test", lambda: t_test_agg(idx, pairs).collect())
    out["t_test_result"] = rows[0].asDict() if rows else None

    ev = spark.read.parquet(args.events)
    out["n_events"] = ev.count()
    bench("bucket_script", lambda: streaming.windowed_bucket_script(
        ev, min_n=3, size=20).collect())
    bench("normalize_zscore", lambda: streaming.windowed_normalize(
        ev, method="z_score").collect())
    cc = bench("cumulative_cardinality",
               lambda: streaming.windowed_cumulative_cardinality(
                   ev).collect())
    out["cumcard_final_est"] = cc[-1]["est"] if cc else None
    out["cumcard_exact_total"] = (ev.select("user_id").distinct()
                                  .count())
    bench("top_metrics", lambda: streaming.windowed_top_metrics(
        ev, size=3).collect())
    ah = bench("auto_histogram", lambda: streaming
               .windowed_auto_histogram(ev, target_buckets=40).collect())
    out["auto_histogram_interval"] = ah[0]["interval"] if ah else None
    bench("range_agg", lambda: streaming.range_agg(
        ev, "value", [("low", None, 100.0), ("mid", 100.0, 500.0),
                      ("high", 500.0, None),
                      ("all", None, None)]).collect())

    from engine.search import filters_agg
    bench("filters_agg", lambda: filters_agg(
        idx, [("trade", analyze("trade", "policy")),
              ("health", analyze("health", "care", "hospital"))],
        other_bucket=True).collect())

    os.makedirs("bench_out", exist_ok=True)
    with open("bench_out/real_wave4d.json", "w") as f:
        json.dump(out, f, indent=1, default=str)
    print(json.dumps(out, default=str), flush=True)


if __name__ == "__main__":
    main()
