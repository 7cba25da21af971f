#!/usr/bin/env python
"""Real-corpus (527k-doc TREC) measurements for the round-4 final-wave
operators: rank_feature (additive saturation boost over the raw
char-length feature, exhaustive-by-necessity with the cut last) and
string_stats (character-distribution entropy over the matched stored
content — the one agg here whose cost is O(matched chars), measured
honestly at real doc sizes). The two pipeline aggs
(windowed_bucket_stats / windowed_moving_fn) are second passes over
date_histogram BUCKET rows — volume-independent by contract — so the
sf0.1 bench rows are their honest measurement; no real-corpus row
exists to add.

Usage: python tools/bench_real_wave4c.py [--index-dir /tmp/trec_idx]
       [--cpus 16]
Writes bench_out/real_wave4c.json. Run from a snapshot copy if editing
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

    from engine.analysis import tokenize_texts
    from engine.search import (Index, rank_feature_topk,
                               string_stats_agg)
    from engine.session import get_spark

    spark = get_spark(app="bench-real-w4c", master=f"local[{args.cpus}]",
                      shuffle_partitions=int(args.cpus) * 2)
    spark.sparkContext.setLogLevel("ERROR")
    idx = Index(spark, args.index_dir)
    out: dict = {"n_docs": idx.n_docs}
    opts = idx.analyzer_opts()

    def analyze(*words: str) -> list[str]:
        return [t for toks in tokenize_texts(list(words), **opts)
                for t in toks]

    q_sets = [("r1", analyze("trade", "policy")),
              ("r2", analyze("health", "care", "hospital"))]
    qt = [(q, t, 1.0) for q, ts in q_sets for t in ts]

    def bench(name, fn):
        t0 = time.time()
        n = fn()
        out[f"{name}_s"] = round(time.time() - t0, 1)
        out[f"{name}_rows"] = int(n)
        print(json.dumps({"op": name, "sec": out[f"{name}_s"],
                          "rows": int(n)}), flush=True)

    # real TREC docs average ~2.8k chars → pivot at that scale keeps
    # the saturation term discriminating (the ES default pivot is the
    # field's approximate mean)
    bench("rank_feature_k1000", lambda: len(rank_feature_topk(
        idx, qt, 1000, pivot=2500.0, boost=5.0).collect()))
    rf = rank_feature_topk(idx, qt, 1000, pivot=2500.0, boost=5.0)
    import pyspark.sql.functions as F
    from engine.search import score_exhaustive
    base = score_exhaustive(idx, qt, 1000).select("qid", "doc_id")
    moved = (rf.select("qid", "doc_id").exceptAll(base).count())
    out["rank_feature_docs_not_in_plain_top1000"] = int(moved)
    print(json.dumps({"op": "rank_feature_reorder_probe",
                      "docs_not_in_plain_top1000": int(moved)}),
          flush=True)

    bench("string_stats",
          lambda: len(string_stats_agg(idx, q_sets).collect()))
    ss = {r["qid"]: (r["count"], r["avg_length"], r["entropy"])
          for r in string_stats_agg(idx, q_sets).collect()}
    out["string_stats_values"] = {k: list(v) for k, v in ss.items()}
    print(json.dumps({"op": "string_stats_values",
                      "values": out["string_stats_values"]}), flush=True)

    os.makedirs("bench_out", exist_ok=True)
    with open("bench_out/real_wave4c.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote bench_out/real_wave4c.json")
    spark.stop()


if __name__ == "__main__":
    main()
