"""Resume / lineage-manifest semantics (north rule; SURVEY.md §5.2
item 5): a build interrupted after K of P bucket-chunks resumes with
no duplicates and produces an index identical to a fresh build."""

from pyspark.sql import functions as F

from engine.corpus import generate_corpus_df
from engine.index_build import _manifest_schema, build_index, plan_missing_buckets
from engine.search import Index, score_exhaustive
from engine.topics import synthetic_topics, topics_to_query_terms


def _posting_fingerprint(idx):
    return sorted(
        (r["term"], r["salt"], r["df_part"], bytes(r["blob"]))
        for r in idx.postings.select("term", "salt", "df_part", "blob").collect())


def test_resume_after_partial_build(spark, tmp_path):
    corpus = generate_corpus_df(spark, 80, partitions=4, max_tokens=120)
    fresh_dir = str(tmp_path / "fresh")
    build_index(spark, corpus, fresh_dir, n_buckets=6, n_doc_buckets=4)
    fresh = Index(spark, fresh_dir)

    # interrupted build: chunk_size=2 → manifest rows land per 2 buckets;
    # simulate a kill by deleting manifest rows for buckets >= 2 AND their
    # postings (as if the job died mid-way through chunk 2).
    part_dir = str(tmp_path / "partial")
    build_index(spark, corpus, part_dir, n_buckets=6, n_doc_buckets=4,
                chunk_size=2)
    # rewrite manifest/postings to keep only buckets 0,1
    man = spark.read.parquet(f"{part_dir}/manifest") \
        .where(F.col("segment_id") < 2).collect()
    post = spark.read.parquet(f"{part_dir}/postings") \
        .where(F.col("bucket") < 2)
    post_pd = post.toPandas()
    import shutil
    shutil.rmtree(f"{part_dir}/manifest")
    shutil.rmtree(f"{part_dir}/postings")
    spark.createDataFrame(man, _manifest_schema()) \
        .write.parquet(f"{part_dir}/manifest")
    spark.createDataFrame(post_pd, schema=post.schema) \
        .write.partitionBy("bucket").parquet(f"{part_dir}/postings")

    missing = plan_missing_buckets(spark, part_dir, 6)
    assert missing == [2, 3, 4, 5]

    m = build_index(spark, corpus, part_dir, n_buckets=6, n_doc_buckets=4,
                    chunk_size=2)
    assert m["buckets_resumed"] == 2
    assert "docs" in m["resumed_stages"] and "tf" in m["resumed_stages"]

    resumed = Index(spark, part_dir)
    # byte-identical postings, identical manifest coverage, identical queries
    assert _posting_fingerprint(resumed) == _posting_fingerprint(fresh)
    assert plan_missing_buckets(spark, part_dir, 6) == []
    qt = topics_to_query_terms(synthetic_topics(3))
    r1 = [(r["qid"], r["rank"], r["doc_id"]) for r in
          score_exhaustive(fresh, qt, 10).collect()]
    r2 = [(r["qid"], r["rank"], r["doc_id"]) for r in
          score_exhaustive(resumed, qt, 10).collect()]
    assert r1 == r2


def test_resume_after_crashed_chunk_no_duplicates(spark, tmp_path):
    """A chunk killed AFTER writing some postings but BEFORE its
    manifest row must not duplicate postings when reprocessed (dynamic
    partition overwrite replaces the partial bucket partitions)."""
    corpus = generate_corpus_df(spark, 60, partitions=4, max_tokens=100)
    d = str(tmp_path / "crash")
    build_index(spark, corpus, d, n_buckets=4, n_doc_buckets=4, chunk_size=2)

    # simulate the crash: drop manifest rows for buckets 2,3 but KEEP
    # their postings files (orphaned partial output)
    import shutil
    man = spark.read.parquet(f"{d}/manifest") \
        .where(F.col("segment_id") < 2).collect()
    from engine.index_build import _manifest_schema
    shutil.rmtree(f"{d}/manifest")
    spark.createDataFrame(man, _manifest_schema()) \
        .write.parquet(f"{d}/manifest")
    assert plan_missing_buckets(spark, d, 4) == [2, 3]

    before = spark.read.parquet(f"{d}/postings") \
        .groupBy("term", "salt").count() \
        .where(F.col("count") > 1).count()
    assert before == 0

    m = build_index(spark, corpus, d, n_buckets=4, n_doc_buckets=4,
                    chunk_size=2)
    assert m["buckets_resumed"] == 2
    post = spark.read.parquet(f"{d}/postings")
    dupes = post.groupBy("term", "salt").count() \
        .where(F.col("count") > 1).count()
    assert dupes == 0  # orphans replaced, not appended to
    # df invariant still holds
    idx = Index(spark, d)
    joined = post.groupBy("term").agg(F.sum("df_part").alias("s")) \
        .join(idx.termstats, "term")
    assert joined.where(F.col("s") != F.col("df")).count() == 0


def test_resume_repairs_missing_termstats(spark, tmp_path):
    """Crash window between the tf commit and the termstats commit
    (ADVICE r01): stage 2 writes tf/ then termstats/; a build resumed
    from an index dir where tf/ is committed but termstats/ is absent
    must RE-RUN stage 2 (idempotent overwrite), not skip it forever."""
    import shutil

    corpus = generate_corpus_df(spark, 50, partitions=4, max_tokens=100)
    d = str(tmp_path / "ts_crash")
    build_index(spark, corpus, d, n_buckets=4, n_doc_buckets=4)
    fresh = Index(spark, d)
    fresh_ts = sorted((r["term"], r["df"]) for r in
                      fresh.termstats.select("term", "df").collect())

    # simulate the crash: termstats never committed, and downstream
    # stages never ran
    shutil.rmtree(f"{d}/termstats")
    shutil.rmtree(f"{d}/stats")
    shutil.rmtree(f"{d}/postings")
    shutil.rmtree(f"{d}/manifest")

    m = build_index(spark, corpus, d, n_buckets=4, n_doc_buckets=4)
    assert "tf" not in m["resumed_stages"]  # stage 2 re-ran
    repaired = Index(spark, d)
    got = sorted((r["term"], r["df"]) for r in
                 repaired.termstats.select("term", "df").collect())
    assert got == fresh_ts
