"""Measure the trigram-pruned fuzzy/suggest family against the brute
dictionary scan on the REAL index (527k TREC docs, ~561k-term
dictionary) — VERDICT r3 item 2's "terms-touched vs full scan" bench.

Usage: python tools/bench_fuzzy_trigram.py [--index-dir /tmp/trec_idx]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from engine.session import get_spark
from engine.search import Index, expand_fuzzy_terms, suggest_terms
from engine.trigram import (build_term_trigrams, fuzzy_candidate_pairs,
                            fuzzy_piece_grams, has_trigrams)

# realistic misspellings across the length spectrum; ≥9 chars engages
# the e=2 pigeonhole, ≥6 the e=1 one
QUERIES = [("q1", "goverment"), ("q2", "sovietunion"), ("q3", "presdent"),
           ("q4", "internatonal"), ("q5", "agricultre"), ("q6", "militry")]


def best_of(n, fn):
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--index-dir", default="/tmp/trec_idx")
    ap.add_argument("--cpus", type=int, default=12)
    args = ap.parse_args()

    spark = get_spark(app="bench-fuzzy", master=f"local[{args.cpus}]",
                      shuffle_partitions=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    idx = Index(spark, args.index_dir)
    if not has_trigrams(idx):
        print("building trigram sidecar ...")
        build_term_trigrams(spark, args.index_dir)
    vocab = idx.termstats.count()
    print(f"dictionary: {vocab} terms")

    for e in (1, 2):
        elig = [q for _, q in QUERIES
                if fuzzy_piece_grams(q, e) is not None]
        cand = fuzzy_candidate_pairs(idx, QUERIES, e).count()
        print(f"max_edits={e}: pigeonhole eligible {len(elig)}/"
              f"{len(QUERIES)} queries; candidates touched {cand} "
              f"(vs {vocab * len(QUERIES)} brute DP pairs before the "
              f"length filter)")

    for e in (1, 2):
        tb = best_of(2, lambda: suggest_terms(
            idx, QUERIES, max_edits=e, n=5, use_trigram=False).collect())
        tt = best_of(2, lambda: suggest_terms(
            idx, QUERIES, max_edits=e, n=5, use_trigram=True).collect())
        same = (
            sorted(map(tuple, suggest_terms(idx, QUERIES, max_edits=e,
                                            n=5, use_trigram=False)
                       .collect()))
            == sorted(map(tuple, suggest_terms(idx, QUERIES, max_edits=e,
                                               n=5, use_trigram=True)
                          .collect())))
        print(f"suggest_terms e={e}: brute {tb:.2f}s  trigram {tt:.2f}s "
              f"({tb / tt:.2f}x)  rank-identical={same}")

    fb = best_of(2, lambda: expand_fuzzy_terms(idx, QUERIES, 1,
                                               use_trigram=False))
    ft = best_of(2, lambda: expand_fuzzy_terms(idx, QUERIES, 1,
                                               use_trigram=True))
    same = (sorted(expand_fuzzy_terms(idx, QUERIES, 1, use_trigram=False))
            == sorted(expand_fuzzy_terms(idx, QUERIES, 1,
                                         use_trigram=True)))
    print(f"expand_fuzzy e=1: brute {fb:.2f}s  trigram {ft:.2f}s "
          f"({fb / ft:.2f}x)  identical={same}")
    spark.stop()


if __name__ == "__main__":
    main()
