#!/usr/bin/env python
"""Real-corpus lifecycle benchmark (VERDICT r2 item 6): on the 527k-doc
TREC index, measure what the delete/update/purge/verify machinery costs
at real scale, not test scale:

* baseline WAND top-k latency (no deletes);
* delete 1% of the corpus → WAND latency with the kernel's broadcast
  liveDocs mask (the pre-purge query overhead);
* update_docs batch → NRT (base ∪ delta) WAND latency;
* purge_deleted wall time + docs/s (the forceMergeDeletes analog:
  full decode → mask → re-encode of every posting);
* verify_index (CheckIndex analog) wall time.

Operates on a COPY of the index (purge rewrites in place).

Usage: python tools/bench_lifecycle.py --index-dir /tmp/trec_idx \
           [--work-dir /tmp/trec_idx_lc] [--num-docs 1000] [--cpus 24]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default=REF)
    ap.add_argument("--index-dir", default="/tmp/trec_idx")
    ap.add_argument("--work-dir", default="/tmp/trec_idx_lc")
    ap.add_argument("--num-docs", type=int, default=1000)
    ap.add_argument("--delete-pct", type=float, default=1.0)
    ap.add_argument("--update-batch", type=int, default=500)
    ap.add_argument("--stem", action="store_true", default=True)
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "24"))
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from engine.checkindex import verify_index
    from engine.deletes import delete_docs, purge_deleted, update_docs
    from engine.expand import drop_malformed_topics
    from engine.search import Index, score_wand
    from engine.session import get_spark
    from engine.streaming import compact_deltas, nrt_index
    from engine.topics import parse_topics, topics_to_query_terms

    if os.path.exists(args.work_dir):
        shutil.rmtree(args.work_dir)
    t0 = time.time()
    shutil.copytree(args.index_dir, args.work_dir)
    copy_sec = time.time() - t0

    spark = get_spark(app="lifecycle-bench", master=f"local[{args.cpus}]",
                      shuffle_partitions=int(args.cpus))
    spark.sparkContext.setLogLevel("ERROR")

    with open(f"{args.ref}/topics") as f:
        topics = drop_malformed_topics(parse_topics(f.read()),
                                       stem=args.stem)
    qt = topics_to_query_terms(topics, stem=args.stem)
    out: dict = {"n_topics": len(topics)}

    def timed_wand(idx, label: str, runs: int = 2) -> None:
        best = None
        for _ in range(runs):
            t = time.time()
            n = score_wand(idx, qt, args.num_docs).count()
            el = time.time() - t
            best = el if best is None else min(best, el)
        out[label] = {"sec": round(best, 1), "rows": int(n)}

    idx = Index(spark, args.work_dir)
    out["n_docs"] = idx.n_docs
    timed_wand(idx, "wand_baseline")

    # delete delete_pct% of docs (deterministic slice)
    mod = max(2, int(round(100.0 / args.delete_pct)))
    dead = idx.docs.where(F.col("doc_id") % mod == 0).select("doc_id")
    t = time.time()
    n_dead = delete_docs(spark, args.work_dir, dead)
    out["delete"] = {"sec": round(time.time() - t, 1), "n_dead": n_dead}
    idx2 = Index(spark, args.work_dir)
    timed_wand(idx2, "wand_with_tombstones")

    # NRT: update a batch of existing docs (delete + delta re-add)
    batch = (idx2.docs.where((F.col("doc_id") % mod == 1))
             .limit(args.update_batch)
             .select("repo", "path", "commit", "lang",
                     F.concat(F.col("content"),
                              F.lit(" updated fresh content")).alias(
                                  "content")))
    t = time.time()
    m = update_docs(spark, args.work_dir, batch)
    out["update_docs"] = {"sec": round(time.time() - t, 1), **m}
    t = time.time()
    nrt = nrt_index(spark, args.work_dir)
    n = score_wand(nrt, qt, args.num_docs).count()
    out["wand_nrt_delta"] = {"sec": round(time.time() - t, 1),
                             "rows": int(n)}

    # fold the delta in, then physically purge the dead docs
    t = time.time()
    n_terms = compact_deltas(spark, args.work_dir)
    out["compact_deltas"] = {"sec": round(time.time() - t, 1),
                             "n_terms": int(n_terms)}
    t = time.time()
    pm = purge_deleted(spark, args.work_dir)
    purge_sec = time.time() - t
    out["purge"] = {"sec": round(purge_sec, 1),
                    "purged": pm["purged"],
                    "purged_per_sec": round(pm["purged"] / purge_sec, 1),
                    "groups_rewritten": pm.get("groups_rewritten"),
                    "n_docs_after": pm.get("n_docs")}
    idx3 = Index(spark, args.work_dir)
    timed_wand(idx3, "wand_post_purge")

    t = time.time()
    v = verify_index(spark, args.work_dir)
    out["verify_index"] = {
        "sec": round(time.time() - t, 1),
        "ok": bool(v.get("ok")),
        "violations": int(sum(n for k, n in v.items() if k != "ok"))}
    out["copy_sec"] = round(copy_sec, 1)
    print("RESULT " + json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
