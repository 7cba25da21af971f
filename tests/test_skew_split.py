"""Head-term skew split (north rule: 'skew-split of head terms'):
an index built with a tiny split_threshold (forcing every frequent
term into multiple salted sub-postings) must return IDENTICAL results
to an unsplit index, through both scoring paths."""

from pyspark.sql import functions as F

from engine.corpus import generate_corpus_df
from engine.index_build import build_index
from engine.search import Index, boolean_and, score_exhaustive, score_wand
from engine.topics import synthetic_topics, topics_to_query_terms


def test_salted_index_matches_unsplit(spark, tmp_path):
    corpus = generate_corpus_df(spark, 150, partitions=4, max_tokens=200)
    p_plain = str(tmp_path / "plain")
    p_salted = str(tmp_path / "salted")
    build_index(spark, corpus, p_plain, n_buckets=4, n_doc_buckets=8)
    build_index(spark, corpus, p_salted, n_buckets=4, n_doc_buckets=8,
                split_threshold=10)  # every df>10 term gets split
    plain, salted = Index(spark, p_plain), Index(spark, p_salted)

    # salting actually happened: some terms have >1 posting row
    multi = (salted.postings.groupBy("term")
             .agg(F.count(F.lit(1)).alias("n"), F.max("salt").alias("ms"))
             .where(F.col("n") > 1).count())
    assert multi > 0
    assert salted.postings.agg(F.max("salt")).collect()[0][0] > 0
    assert plain.postings.agg(F.max("salt")).collect()[0][0] == 0

    # per-term df must still match (sub-postings partition the doc set)
    a = {r["term"]: r["s"] for r in salted.postings.groupBy("term")
         .agg(F.sum("df_part").alias("s")).collect()}
    b = {r["term"]: r["s"] for r in plain.postings.groupBy("term")
         .agg(F.sum("df_part").alias("s")).collect()}
    assert a == b

    qt = topics_to_query_terms(synthetic_topics(5))
    for fn in (score_exhaustive, score_wand):
        r1 = [(r["qid"], r["rank"], r["doc_id"], round(r["score"], 9))
              for r in fn(plain, qt, 20).collect()]
        r2 = [(r["qid"], r["rank"], r["doc_id"], round(r["score"], 9))
              for r in fn(salted, qt, 20).collect()]
        assert r1 == r2, fn.__name__

    and_q = [("q", ["getset", "get_set", "parseread"])]
    h1 = sorted((r["qid"], r["doc_id"]) for r in boolean_and(plain, and_q).collect())
    h2 = sorted((r["qid"], r["doc_id"]) for r in boolean_and(salted, and_q).collect())
    assert h1 == h2


def test_for_codec_index_matches_vb(spark, tmp_path):
    """An index built with the FOR (PForDelta-style) codec returns
    byte-for-byte identical query results to the VB index."""
    corpus = generate_corpus_df(spark, 100, partitions=4, max_tokens=150)
    p_vb, p_for = str(tmp_path / "vb"), str(tmp_path / "for")
    build_index(spark, corpus, p_vb, n_buckets=4, n_doc_buckets=8, codec="vb")
    build_index(spark, corpus, p_for, n_buckets=4, n_doc_buckets=8, codec="for")
    i_vb, i_for = Index(spark, p_vb), Index(spark, p_for)
    assert i_for.stats["codec"] == "for"
    qt = topics_to_query_terms(synthetic_topics(4))
    for fn in (score_exhaustive, score_wand):
        r1 = [(r["qid"], r["rank"], r["doc_id"], round(r["score"], 10))
              for r in fn(i_vb, qt, 15).collect()]
        r2 = [(r["qid"], r["rank"], r["doc_id"], round(r["score"], 10))
              for r in fn(i_for, qt, 15).collect()]
        assert r1 == r2, fn.__name__
