#!/usr/bin/env python
"""Generate the pinned golden run (FIXTURES.md §4): exhaustive-scorer
top-50 for the synthetic topic set over the deterministic 'small'
synthetic corpus. Written once, committed, and asserted against by
tests/test_golden.py (WAND path + rebuilds at other parallelism must
reproduce it rank- and score-identically).
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = 2000
MAX_TOKENS = 400
N_TOPICS = 20
K = 50
GOLDEN = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "golden", "small_run.tsv")


def main() -> None:
    from engine.corpus import generate_corpus_df
    from engine.index_build import build_index
    from engine.search import Index, score_exhaustive
    from engine.session import get_spark
    from engine.topics import synthetic_topics, topics_to_query_terms

    spark = get_spark(app="goldens", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    idx_dir = "/tmp/golden_idx"
    shutil.rmtree(idx_dir, ignore_errors=True)
    corpus = generate_corpus_df(spark, N_DOCS, partitions=8,
                                max_tokens=MAX_TOKENS)
    build_index(spark, corpus, idx_dir, n_buckets=8, n_doc_buckets=16)
    idx = Index(spark, idx_dir)
    qt = topics_to_query_terms(synthetic_topics(N_TOPICS))
    rows = score_exhaustive(idx, qt, K).collect()
    os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
    with open(GOLDEN, "w") as f:
        f.write("# qid\trank\tdoc_id\tscore  — exhaustive BM25, "
                f"corpus(seed=42,n={N_DOCS},max_tokens={MAX_TOKENS}), "
                f"topics(seed=7,n={N_TOPICS}), k={K}\n")
        for r in rows:
            f.write(f"{r['qid']}\t{r['rank']}\t{r['doc_id']}"
                    f"\t{r['score']:.6f}\n")
    print(f"wrote {GOLDEN}: {len(rows)} rows")
    shutil.rmtree(idx_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
