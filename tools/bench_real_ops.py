#!/usr/bin/env python
"""Latency check of the round-5 query operators on the REAL 527k-doc
TREC index (built by tools/trec_e2e.py): generic BooleanQuery, parsed
query strings, hit counting, dictionary-scan rewrites, field-sorted
search, searchAfter, term vectors. Prints one JSON line per op.

Usage: python tools/bench_real_ops.py [index_dir]  (default
/tmp/trec_idx_r5; the index must exist — see CLAUDE.md recipes.)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    idx_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/trec_idx_r5"
    from pyspark.sql import functions as F

    from engine.queryparse import search_parsed
    from engine.search import (Index, boolean_topk, count_matches,
                               field_sorted_topk, prefix_topk,
                               search_after, term_range_topk, term_vectors)
    from engine.session import get_spark

    spark = get_spark(app="real-ops", master="local[12]",
                      shuffle_partitions=24)
    spark.sparkContext.setLogLevel("ERROR")
    idx = Index(spark, idx_dir)
    stem = bool(idx.stats.get("stem"))
    # stemmed index → use stemmed forms of common TREC vocabulary
    t = (lambda s: s) if not stem else (lambda s: {
        "economy": "economi", "policy": "polici",
        "industry": "industri", "trade": "trade",
        "foreign": "foreign", "market": "market"}.get(s, s))
    results = {}

    def bench(name, fn, warm=False):
        t0 = time.time()
        n = fn()
        results[name] = {"sec": round(time.time() - t0, 2), "rows": n}
        print(json.dumps({"op": name, **results[name]}), flush=True)

    # JIT/codegen warmup (CLAUDE.md: first build/query in a fresh JVM
    # pays whole-stage-codegen compile)
    count_matches(idx, [("w", [t("trade")])]).collect()

    bench("count_matches_5q", lambda: len(count_matches(idx, [
        ("c1", [t("economy"), t("policy")]),
        ("c2", [t("industry"), t("trade")]),
        ("c3", [t("foreign"), t("market")]),
        ("c4", [t("economy")]), ("c5", [t("market"), t("policy")]),
    ]).collect()))
    bench("boolean_topk", lambda: len(boolean_topk(idx, [
        ("b1", [t("economy")], [t("policy"), t("trade")], [t("market")]),
        ("b2", [t("foreign"), t("trade")], [], []),
    ], 100).collect()))
    bench("parsed_query", lambda: len(search_parsed(
        idx, "p1", f'+{t("economy")} {t("trade")} -{t("market")}',
        100).collect()))
    bench("prefix_topk(econ*)", lambda: len(prefix_topk(
        idx, [("pf", "econ")], 100).collect()))
    bench("term_range_topk", lambda: len(term_range_topk(
        idx, [("tr", "trade", "tradf")], 100).collect()))
    bench("field_sorted(doc length)", lambda: len(field_sorted_topk(
        idx, [("fs", [t("economy")])],
        idx.docs.select("doc_id",
                        F.length("content").alias("sort_key")),
        100).collect()))
    bench("search_after_p2", lambda: len(search_after(
        idx, [("sa", t("economy"), 1.0), ("sa", t("trade"), 1.0)],
        100, after={}).collect()))
    bench("term_vectors_10docs", lambda: len(term_vectors(
        idx, list(range(10))).collect()))
    print("REAL_OPS " + json.dumps(results), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
