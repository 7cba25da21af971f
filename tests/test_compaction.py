"""Full NRT cycle: batch base index → streamed delta segments →
delta-aware search → compaction → identical results, updated df."""

import numpy as np
from pyspark.sql import functions as F

from engine import streaming
from engine.index_build import build_index
from engine.postings import decode_postings
from engine.search import Index, score_exhaustive, score_wand


def test_stream_compact_cycle(spark, tmp_path):
    idx_dir = str(tmp_path / "nrt")
    watch = str(tmp_path / "incoming")

    # base: 6 docs containing 'alpha' with varying tf
    base_rows = [("r", f"{i:04d}", "-", "py", " ".join(["alpha"] * (i + 1) + ["beta"]))
                 for i in range(6)]
    base = spark.createDataFrame(
        base_rows, "repo string, path string, commit string, lang string, content string")
    build_index(spark, base, idx_dir, n_buckets=4, n_doc_buckets=1)
    base_idx = Index(spark, idx_dir)
    avgdl = base_idx.avgdl
    n0 = base_idx.n_docs

    # stream 3 new docs (pre-assigned ids continuing the base range)
    new_rows = [("r", f"n{i}", "-", "py", "alpha gamma gamma", n0 + i)
                for i in range(3)]
    spark.createDataFrame(new_rows, streaming.CORPUS_SCHEMA) \
        .write.parquet(watch)
    q = streaming.incremental_index(spark, watch, idx_dir)
    q.awaitTermination(120)

    # delta-aware search: new docs visible pre-compaction
    nrt = Index(spark, idx_dir)
    nrt.postings = streaming.searchable_postings(spark, idx_dir)
    res = score_exhaustive(nrt, [("q", "alpha", 1.0)], 20).collect()
    assert len(res) == 9  # 6 base + 3 streamed

    # compact: selective — only the DELTA terms (alpha, gamma) merge;
    # beta is untouched base and streams through as columnar IO
    n_terms = streaming.compact_deltas(spark, idx_dir)
    assert n_terms == 2  # alpha, gamma (the dirty set, not the vocab)
    comp = Index(spark, idx_dir)
    rows = {r["term"]: r for r in comp.postings.collect()}
    d, tf, dl = decode_postings(bytes(rows["alpha"]["blob"]))
    assert list(d) == list(range(9))
    assert (np.diff(d) > 0).all()
    assert rows["alpha"]["df_part"] == 9
    assert "gamma" in rows and rows["gamma"]["df_part"] == 3

    # df stats refreshed
    dfm = comp.df_map(["alpha", "gamma", "beta"])
    assert dfm == {"alpha": 9, "gamma": 3, "beta": 6}

    # WAND == exhaustive on the compacted index; scores use frozen avgdl
    ex = [(r["qid"], r["rank"], r["doc_id"], round(r["score"], 9))
          for r in score_exhaustive(comp, [("q", "alpha", 1.0)], 20).collect()]
    wd = [(r["qid"], r["rank"], r["doc_id"], round(r["score"], 9))
          for r in score_wand(comp, [("q", "alpha", 1.0)], 20).collect()]
    assert ex == wd and len(ex) == 9
    # frozen-avgdl invariant: stats unchanged by compaction
    assert comp.avgdl == avgdl
