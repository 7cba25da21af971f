#!/usr/bin/env python
"""Measure the generalized-kernel payoff on the REAL 527k-doc TREC
index (VERDICT r2 item 3 'Done' criterion): exhaustive decode-explode
vs the sharded block-max kernel for the non-BM25 scoring family, plus
boolean must-lead gating on vs off.

Usage: python tools/bench_wand_variants.py --index-dir /tmp/trec_idx
           [--num-docs 1000] [--cpus 16]
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
    ap.add_argument("--num-docs", type=int, default=1000)
    ap.add_argument("--stem", action="store_true", default=True)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "16"))
    args = ap.parse_args()

    from engine.expand import drop_malformed_topics
    from engine.search import (Index, boolean_topk, score_ib, score_lmd,
                               score_wand)
    from engine.session import get_spark
    from engine.topics import parse_topics, topics_to_query_terms

    spark = get_spark(app="wand-variants", master=f"local[{args.cpus}]",
                      shuffle_partitions=int(args.cpus))
    spark.sparkContext.setLogLevel("ERROR")
    idx = Index(spark, args.index_dir)

    with open(f"{args.ref}/topics") as f:
        topics = drop_malformed_topics(parse_topics(f.read()),
                                       stem=args.stem)
    qt = topics_to_query_terms(topics, stem=args.stem)
    out: dict = {"n_topics": len(topics), "k": args.num_docs}

    def best(fn) -> tuple[float, int]:
        b, n = None, 0
        for _ in range(args.runs):
            t = time.time()
            n = fn().count()
            el = time.time() - t
            b = el if b is None else min(b, el)
        return round(b, 1), int(n)

    def rounded_order(rows):
        """Re-rank on the ROUNDED score (repo rule: exact float sums
        differ in the last ulp across summation orders and flip real
        ties — engine/portable.py round-rank-window discipline)."""
        return sorted(((r["qid"], round(r["score"], 6), r["doc_id"])
                       for r in rows),
                      key=lambda t: (t[0], -t[1], t[2]))

    # rank-identity spot check + timings, per scorer
    for name, exh, scorer in (("lmd", score_lmd, "lmd"),
                              ("ib", score_ib, "ib")):
        sec_e, n_e = best(lambda: exh(idx, qt, args.num_docs))
        sec_w, n_w = best(lambda: score_wand(idx, qt, args.num_docs,
                                             scorer=scorer))
        ex = rounded_order(exh(idx, qt, 20).collect())
        wa = rounded_order(score_wand(idx, qt, 20,
                                      scorer=scorer).collect())
        out[name] = {"exhaustive_sec": sec_e, "wand_sec": sec_w,
                     "rows": n_e, "rows_match": n_e == n_w,
                     "top20_rank_identical": ex == wa}

    # boolean: per topic, MUST = the topic's rarest term, SHOULD = the
    # rest (a realistic gated conjunction over real head terms).
    # Three plans: the boolean kernel (default route), the explode
    # plan with must-lead broadcast gating, and the ungated explode.
    dfm = idx.df_map(sorted({t for _, t, _ in qt}))
    by_topic: dict[str, list] = {}
    for q, t, _ in qt:
        if t in dfm:
            by_topic.setdefault(q, []).append(t)
    bq, bqn = [], []
    for q, terms in by_topic.items():
        terms = sorted(set(terms), key=lambda t: (dfm[t], t))
        bq.append((q, [terms[0]], terms[1:], []))
        # must_not variant: exclude one mid-df term from the bag
        notq = terms[len(terms) // 2] if len(terms) > 2 else terms[-1]
        bqn.append((q, [terms[0]],
                    [t for t in terms[1:] if t != notq], [notq]))
    sec_k, n_k = best(lambda: boolean_topk(idx, bq, args.num_docs))
    sec_g, n_g = best(lambda: boolean_topk(idx, bq, args.num_docs,
                                           use_kernel=False,
                                           lead_min_saved=0))
    sec_p, n_p = best(lambda: boolean_topk(idx, bq, args.num_docs,
                                           use_kernel=False,
                                           lead_max_df=0))
    kk = rounded_order(boolean_topk(idx, bq, 20).collect())
    g = rounded_order(boolean_topk(idx, bq, 20, use_kernel=False,
                                   lead_min_saved=0).collect())
    p = rounded_order(boolean_topk(idx, bq, 20, use_kernel=False,
                                   lead_max_df=0).collect())
    out["boolean_must"] = {
        "kernel_sec": sec_k, "gated_explode_sec": sec_g,
        "explode_sec": sec_p, "rows": n_k,
        "rows_match": n_k == n_g == n_p,
        "top20_rank_identical": kk == g == p}

    sec_kn, n_kn = best(lambda: boolean_topk(idx, bqn, args.num_docs))
    sec_en, n_en = best(lambda: boolean_topk(idx, bqn, args.num_docs,
                                             use_kernel=False))
    kn = rounded_order(boolean_topk(idx, bqn, 20).collect())
    en = rounded_order(boolean_topk(idx, bqn, 20,
                                    use_kernel=False).collect())
    out["boolean_must_not"] = {
        "kernel_sec": sec_kn, "explode_sec": sec_en,
        "rows": n_kn, "rows_match": n_kn == n_en,
        "top20_rank_identical": kn == en}

    print("RESULT " + json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
