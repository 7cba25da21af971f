#!/usr/bin/env python
"""Real-scale measurements for the round-4 final wave on the 527k-doc
TREC index: script_score at k=1000 (script reorders the whole match
set, so the row reports both wall and how far the reorder moves the
page vs plain BM25), distance_feature at k=1000 (same class),
pinned over the WAND page (the overlay should cost ~a WAND query),
constant_score any/all (filter context — the row shows the no-scoring
plan's cost beside the scored OR), and rate over the sf0.1 events
table. rank_eval runs over the engine's own k=1000 run page against
the real qrels when present.

Usage: python tools/bench_real_wave4f.py [--index-dir /tmp/trec_idx]
       [--events /root/testdata/sf0.1/events.parquet] [--cpus 12]
Writes bench_out/real_wave4f.json. Run from a snapshot copy if editing
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
    args = ap.parse_args()

    from engine import streaming
    from engine.analysis import tokenize_texts
    from engine.search import (Index, constant_score_topk,
                               distance_feature_topk, pinned_topk,
                               score_wand, script_score_topk)
    from engine.session import get_spark

    spark = get_spark(app="bench-real-w4f", master=f"local[{args.cpus}]",
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

    queries = [("q1", analyze("trade", "policy")),
               ("q2", analyze("health", "care", "hospital"))]
    qt = [(q, t, 1.0) for q, ts in queries for t in ts]
    K = 1000

    base = bench("wand_baseline", lambda: score_wand(idx, qt, K).collect())
    base_page = {(r["qid"], r["doc_id"]) for r in base}

    ss = bench("script_score", lambda: script_score_topk(
        idx, qt, K, "s * ln(1 + dl) / 10").collect())
    out["script_score_overlap"] = len(
        {(r["qid"], r["doc_id"]) for r in ss} & base_page)

    dfr = bench("distance_feature", lambda: distance_feature_topk(
        idx, qt, K, origin=2000.0, pivot=500.0, boost=2.0).collect())
    out["distance_feature_overlap"] = len(
        {(r["qid"], r["doc_id"]) for r in dfr} & base_page)

    # pins: two docs from deep in each ranking + one organic-top doc
    pins = []
    for qid in ("q1", "q2"):
        page = [r["doc_id"] for r in base if r["qid"] == qid]
        pins.append((qid, [page[-1], page[len(page) // 2], page[0]]))
    pn = bench("pinned", lambda: pinned_topk(idx, qt, pins, K).collect())
    out["pinned_pin_rows"] = sum(1 for r in pn if r["pinned"])

    cs_any = bench("constant_score_any", lambda: constant_score_topk(
        idx, queries, K, mode="any").collect())
    out["constant_score_any_top_doc"] = cs_any[0]["doc_id"] if cs_any else None
    bench("constant_score_all", lambda: constant_score_topk(
        idx, queries, K, mode="all").collect())

    ev = spark.read.parquet(args.events)
    out["n_events"] = ev.count()
    bench("rate_agg", lambda: streaming.rate_agg(
        ev, unit="1 minute").collect())

    # rank_eval over the engine's own run page + real qrels if present
    qrels_path = os.environ.get("QRELS_PARQUET", "")
    if qrels_path and os.path.exists(qrels_path):
        from engine.evaluate import rank_eval_metrics
        from pyspark.sql import functions as F
        qrels = spark.read.parquet(qrels_path)
        run = spark.createDataFrame(
            [(r["qid"], str(r["doc_id"]), r["rank"]) for r in base],
            "qid string, docno string, rank int")
        bench("rank_eval", lambda: rank_eval_metrics(
            run, qrels, k=20).collect())

    os.makedirs("bench_out", exist_ok=True)
    with open("bench_out/real_wave4f.json", "w") as f:
        json.dump(out, f, indent=1, default=str)
    print(json.dumps(out, default=str), flush=True)


if __name__ == "__main__":
    main()
