#!/usr/bin/env python
"""Measure the bounded-additive-feature WAND path (VERDICT r4 item 3
'Done' criterion) on the REAL 527k-doc TREC index: rank_feature /
distance_feature kernel vs exhaustive wall-clock, rank-identity spot
check on the real corpus, and the decode-skip counters as a function
of the feature bound (ub_shift) — the evidence that the relaxed
threshold still prunes when the bound is small relative to the BM25
score spread, and degrades gracefully toward exhaustive as it grows.

Usage: python tools/bench_feature_wand.py [--index-dir /tmp/trec_idx]
           [--runs 2] [--cpus 16] [--k 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default=REF)
    ap.add_argument("--index-dir", default="/tmp/trec_idx")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS",
                                                     "16"))
    args = ap.parse_args()

    from engine.expand import drop_malformed_topics
    from engine.search import (WAND_FEATURE_EPS, Index,
                               distance_feature_topk, rank_feature_topk,
                               wand_stats)
    from engine.session import get_spark
    from engine.topics import parse_topics, topics_to_query_terms

    spark = get_spark(app="feature-wand", master=f"local[{args.cpus}]",
                      shuffle_partitions=int(args.cpus))
    spark.sparkContext.setLogLevel("ERROR")
    idx = Index(spark, args.index_dir)
    aopts = idx.analyzer_opts()   # CLAUDE.md: derive the query-side
    # analyzer from the index stats, never a hand-threaded stem flag

    with open(f"{args.ref}/topics") as f:
        topics = drop_malformed_topics(parse_topics(f.read()), **aopts)
    qt = topics_to_query_terms(topics, **aopts)
    out: dict = {"n_topics": len(topics), "k": args.k}

    def best(fn):
        b, rows = None, None
        for _ in range(args.runs):
            t0 = time.time()
            rows = fn().collect()
            el = time.time() - t0
            b = el if b is None else min(b, el)
        return round(b, 1), rows

    def key(rows):
        return [(r["qid"], r["rank"], r["doc_id"], r["score"])
                for r in sorted(rows, key=lambda r: (r["qid"], r["rank"]))]

    # warm (JIT/codegen)
    rank_feature_topk(idx, qt, args.k, pivot=1000.0, boost=1.0).collect()

    for name, fn_kw in (
            ("rank_feature_sat_b1",
             dict(fn="rf", pivot=3000.0, boost=1.0)),
            ("rank_feature_sat_b10",
             dict(fn="rf", pivot=3000.0, boost=10.0)),
            ("distance_feature_b2",
             dict(fn="df", origin=3000.0, pivot=500.0, boost=2.0))):
        kw = dict(fn_kw)
        which = kw.pop("fn")
        if which == "rf":
            call = lambda uw, kw=kw: rank_feature_topk(
                idx, qt, args.k, use_wand=uw, **kw)
        else:
            call = lambda uw, kw=kw: distance_feature_topk(
                idx, qt, args.k, kw["origin"], kw["pivot"], kw["boost"],
                use_wand=uw)
        sec_k, rows_k = best(lambda: call(True))
        sec_e, rows_e = best(lambda: call(False))
        ident = key(rows_k) == key(rows_e)
        out[name] = {"kernel_sec": sec_k, "exhaustive_sec": sec_e,
                     "speedup": round(sec_e / sec_k, 2),
                     "rank_identical": ident, "boost": kw["boost"]}
        print(json.dumps({"op": name, **out[name]}), flush=True)
        assert ident, f"{name}: kernel != exhaustive on the real corpus"

    # decode-skip counters vs the feature bound
    shifts = [0.0, 1.0, 2.0, 5.0, 10.0]
    counters = []
    for s in shifts:
        ws = wand_stats(idx, qt, args.k,
                        ub_shift=(s + WAND_FEATURE_EPS) if s else 0.0
                        ).groupBy().sum(
            "blocks_total", "blocks_decoded",
            "postings_total", "postings_scored").collect()[0]
        counters.append({
            "ub_shift": s,
            "blocks_decoded_pct": round(100.0 * ws[1] / max(ws[0], 1), 1),
            "postings_scored_pct": round(100.0 * ws[3] / max(ws[2], 1), 1),
        })
        print(json.dumps(counters[-1]), flush=True)
    out["shift_counters"] = counters
    print("RESULT " + json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
