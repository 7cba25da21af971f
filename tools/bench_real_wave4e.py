#!/usr/bin/env python
"""Real-scale measurements for the round-4 closing wave:
span_within / span_containing on the 527k-doc TREC positional index
(the 'union within/containing (union ... soviet)' pair — the span_not
bench's vocabulary, so the numbers compare), match_bool_prefix at
k=1000 (BM25 term clauses + constant-score prefix over the 561k-term
dictionary's range-pruned expansions), scripted_metric over the same
50-60k-doc match-set class the metric aggs use, and
moving_percentiles over the sf0.1 events table (volume-independent
second pass by contract — the row shows it).

Usage: python tools/bench_real_wave4e.py [--index-dir /tmp/trec_idx]
       [--events /root/testdata/sf0.1/events.parquet] [--cpus 16]
Writes bench_out/real_wave4e.json. Run from a snapshot copy if editing
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

    from engine import streaming
    from engine.analysis import tokenize_texts
    from engine.positions import span_containing_match, span_within_match
    from engine.search import (Index, match_bool_prefix_topk,
                               scripted_metric_agg)
    from engine.session import get_spark

    spark = get_spark(app="bench-real-w4e", master=f"local[{args.cpus}]",
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

    # span algebra: little = 'socialist' inside big = ordered
    # (soviet ... republics) within slop 4 — "Soviet Socialist
    # Republics", the collocation that makes the gate genuinely bite
    s, r, soc = analyze("soviet", "republics", "socialist")
    sq = [("sw", soc, s, r, 4)]
    bench("span_within", lambda: span_within_match(idx, sq).collect())
    bench("span_containing",
          lambda: span_containing_match(idx, sq).collect())

    # search-as-you-type: two full terms + a prefix with a fat
    # dictionary expansion ('econ*'), k=1000
    mq = [("m1", "soviet union econ"), ("m2", "health care hosp")]
    mb = bench("match_bool_prefix",
               lambda: match_bool_prefix_topk(idx, mq, 1000).collect())
    out["match_bool_prefix_top_score"] = (
        max(r["score"] for r in mb) if mb else None)

    # scripted_metric over the trade/policy match-set class
    smq = [("s1", analyze("trade", "policy")),
           ("s2", analyze("health", "care", "hospital"))]
    sm = bench("scripted_metric", lambda: scripted_metric_agg(
        idx, smq, "dl * nc", "avg", "state / 1000.0").collect())
    out["scripted_metric_result"] = [r.asDict() for r in sm]

    ev = spark.read.parquet(args.events)
    out["n_events"] = ev.count()
    bench("moving_percentiles",
          lambda: streaming.windowed_moving_percentiles(ev).collect())

    os.makedirs("bench_out", exist_ok=True)
    with open("bench_out/real_wave4e.json", "w") as f:
        json.dump(out, f, indent=1, default=str)
    print(json.dumps(out, default=str), flush=True)


if __name__ == "__main__":
    main()
