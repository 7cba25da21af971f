#!/usr/bin/env python
"""Greedy coordinate-ascent parameter sweep (port of the reference's
sweep_greedy.sh:51-236 as a Spark-native bench utility — SURVEY.md
§4.1 'port as optional bench utility').

Sweeps, one parameter at a time with all others held at the current
best (greedy coordinate ascent, same control flow as the reference):

  title_boost, desc_boost, narr_boost   (reference lines 53-55)
  pilot_k  (TopDocsPilot, line 57)
  entity_boost (WeightMultiplier, line 58)
  top_terms (NumExpansions, line 59)
  k1, b    (BM25 constants — ours are query-time overridable)

Metric: MAP@k against qrels. By default runs on a synthetic corpus +
synthetic topics with derived qrels (docs matching ALL title terms);
pass --index-dir/--topics/--qrels to sweep a real index (e.g. the TREC
index built by tools/trec_e2e.py). Each config has a wall-clock
timeout like the reference (sweep_greedy.sh:17).

Output: CSV of every evaluated config + the best row, printed and
written to --out.
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GRID = {
    "title_boost": [0.5, 1.0, 1.5, 2.0, 2.5, 3.0],
    "desc_boost": [0.5, 1.0, 1.3, 1.5, 2.0],
    "narr_boost": [0.0, 0.25, 0.5, 1.0],
    "pilot_k": [10, 20, 40, 60],
    "entity_boost": [1.0, 1.25, 1.5, 2.0],
    "top_terms": [20, 40, 60],
    "k1": [0.9, 1.2, 1.5, 2.0],
    "b": [0.4, 0.6, 0.75, 0.9],
}
DEFAULTS = {"title_boost": 3.0, "desc_boost": 1.3, "narr_boost": 0.5,
            "pilot_k": 20, "entity_boost": 1.25, "top_terms": 40,
            "k1": 1.2, "b": 0.75}


def run_config(spark, idx, topics, qrels, cfg, num_docs, k, timeout_s,
               stem=False, docno_from_path=False):
    from pyspark.sql import functions as F

    from engine.evaluate import macro_metrics
    from engine.expand import expanded_query_terms
    from engine.search import score_exhaustive

    t0 = time.time()
    qt = expanded_query_terms(
        idx, topics, pilot_k=int(cfg["pilot_k"]),
        top_terms=int(cfg["top_terms"]), stem=stem,
        boosts=(cfg["title_boost"], cfg["desc_boost"], cfg["narr_boost"]),
        entity_boost=cfg["entity_boost"], k1=cfg["k1"], b=cfg["b"])
    hits = score_exhaustive(idx, qt, num_docs, include_docno=not docno_from_path,
                            k1=cfg["k1"], b=cfg["b"])
    if docno_from_path:
        # TREC qrels use the bare DOCNO, stored as `path` in the docs
        # table (docno is the repo/path concat)
        hits = hits.join(
            idx.docs.select("doc_id", F.col("path").alias("docno")), "doc_id")
    run = hits.select("qid", F.col("docno"), "rank")
    m = macro_metrics(run, qrels, k=k)
    elapsed = time.time() - t0
    if elapsed > timeout_s:
        print(f"  [timeout-flag] config took {elapsed:.0f}s > {timeout_s}s")
    return m, elapsed


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index-dir", default=None,
                    help="existing index (default: build synthetic)")
    ap.add_argument("--topics", default=None, help="TREC topics file")
    ap.add_argument("--qrels", default=None, help="TREC qrels file")
    ap.add_argument("--stem", action="store_true",
                    help="stemmed analyzer (must match the index build)")
    ap.add_argument("--n-docs", type=int, default=2000,
                    help="synthetic corpus size")
    ap.add_argument("--n-topics", type=int, default=12)
    ap.add_argument("--num-docs", type=int, default=100,
                    help="results per topic")
    ap.add_argument("--k", type=int, default=20)
    ap.add_argument("--timeout", type=int, default=300,
                    help="per-config budget (reference: 300s/50 topics)")
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "16"))
    ap.add_argument("--out", default="bench_out/sweep.csv")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from engine.search import Index
    from engine.session import get_spark

    spark = get_spark(app="sweep", master=f"local[{args.cpus}]",
                      shuffle_partitions=int(args.cpus))
    spark.sparkContext.setLogLevel("ERROR")

    if args.index_dir:
        idx = Index(spark, args.index_dir)
        from engine.topics import parse_topics
        with open(args.topics) as f:
            topics = parse_topics(f.read())
        qrels = (spark.read.csv(args.qrels, sep=" ")
                 .toDF("qid", "iter", "docno", "rel")
                 .select("qid", "docno", F.col("rel").cast("int").alias("rel")))
    else:
        from engine.corpus import generate_corpus_df
        from engine.index_build import build_index
        from engine.topics import synthetic_topics, topics_to_query_terms

        corpus = generate_corpus_df(spark, args.n_docs, partitions=8,
                                    max_tokens=200)
        d = "/tmp/sweep_idx"
        import shutil
        shutil.rmtree(d, ignore_errors=True)
        build_index(spark, corpus, d, n_buckets=8)
        idx = Index(spark, d)
        topics = synthetic_topics(args.n_topics)
        # derived qrels: docs containing ALL title terms of the topic
        from engine.search import boolean_and
        from engine.topics import Topic, anchor_weights
        title_q = [(t.number,
                    sorted(anchor_weights(
                        Topic(t.number, t.title, None, None))))
                   for t in topics]
        hits = boolean_and(idx, title_q)
        qrels = (hits.join(idx.docs.select("doc_id", "docno"), "doc_id")
                 .select("qid", "docno", F.lit(1).alias("rel"))
                 .persist())
        qrels.count()

    cfg = dict(DEFAULTS)
    rows = []
    base_m, base_t = run_config(spark, idx, topics, qrels, cfg,
                                args.num_docs, args.k, args.timeout,
                                stem=args.stem,
                                docno_from_path=bool(args.index_dir))
    best_map = base_m["MAP"]
    rows.append({"param": "baseline", "value": "-", **cfg, **base_m,
                 "sec": round(base_t, 1)})
    print(f"baseline MAP={base_m['MAP']:.4f} ({base_t:.0f}s)", flush=True)

    for param, grid in GRID.items():
        best_val = cfg[param]
        for val in grid:
            if val == cfg[param]:
                continue
            trial = dict(cfg)
            trial[param] = val
            m, el = run_config(spark, idx, topics, qrels, trial,
                               args.num_docs, args.k, args.timeout,
                               stem=args.stem,
                               docno_from_path=bool(args.index_dir))
            rows.append({"param": param, "value": val, **trial, **m,
                         "sec": round(el, 1)})
            print(f"{param}={val}: MAP={m['MAP']:.4f} ({el:.0f}s)",
                  flush=True)
            if m["MAP"] > best_map:
                best_map, best_val = m["MAP"], val
        cfg[param] = best_val  # greedy: lock in the winner
        print(f"-> {param} locked at {best_val} (MAP={best_map:.4f})",
              flush=True)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    print("BEST " + json.dumps({"MAP": best_map, **cfg}))
    spark.stop()


if __name__ == "__main__":
    main()
