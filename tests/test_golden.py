"""Pinned golden run (FIXTURES.md §4): a fresh index build at a
DIFFERENT parallelism/bucketing than the generator must reproduce the
committed exhaustive-scorer run exactly — through the WAND path.

Covers at once: corpus determinism, docID-assignment determinism,
codec round-trip through parquet, scoring math stability, and
WAND-vs-exhaustive rank identity across sessions.
"""

import os

import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "small_run.tsv")


@pytest.mark.skipif(not os.path.exists(GOLDEN),
                    reason="golden not generated (tools/make_goldens.py)")
def test_wand_reproduces_pinned_golden(spark, tmp_path):
    from engine.corpus import generate_corpus_df
    from engine.index_build import build_index
    from engine.search import Index, score_wand
    from engine.topics import synthetic_topics, topics_to_query_terms

    want = []
    with open(GOLDEN) as f:
        for line in f:
            if line.startswith("#"):
                continue
            qid, rank, doc_id, score = line.rstrip("\n").split("\t")
            want.append((qid, int(rank), int(doc_id), float(score)))

    idx_dir = str(tmp_path / "golden_idx")
    # deliberately different parallelism + bucket counts than the
    # generator (local[4]/5 buckets vs local[8]/8): results must match
    corpus = generate_corpus_df(spark, 2000, partitions=5, max_tokens=400)
    build_index(spark, corpus, idx_dir, n_buckets=5, n_doc_buckets=16)
    idx = Index(spark, idx_dir)
    qt = topics_to_query_terms(synthetic_topics(20))
    got = [(r["qid"], r["rank"], r["doc_id"], round(r["score"], 6))
           for r in score_wand(idx, qt, 50).collect()]
    want_keys = [(q, r, d) for q, r, d, _ in want]
    got_keys = [(q, r, d) for q, r, d, _ in got]
    assert got_keys == want_keys  # rank-identical docID sequences
    for (g, w) in zip(got, want):
        assert g[3] == pytest.approx(w[3], abs=1e-6)  # score equality
