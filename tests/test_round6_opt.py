"""Round-6 optimization equivalence gates.

Each rewrite this round must be result-identical to the path it
replaced; these tests pin that structurally:

* ``_encode_tf_arrow`` (mapInArrow postings encode) vs the
  per-group ``applyInPandas`` encode — bit-identical blobs and
  metadata, including groups that straddle Arrow batch boundaries;
* ``minhash_signatures``'s cheap non-empty filter
  (``size(tokens) >= k``) vs the original ``size(shingles) > 0`` —
  same row set (the predicate-equivalence the pushdown fix relies on);
* ``_char_hist_udf`` vs ``explode(split(content, ''))`` counting —
  identical (value, count) histograms;
* ``fan_out`` — repartitions only when the plan is under-partitioned.
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from engine.session import fan_out


@pytest.fixture(scope="module")
def spark():
    from engine.session import get_spark

    sp = get_spark(app="t_r6opt", master="local[4]", shuffle_partitions=4)
    sp.sparkContext.setLogLevel("ERROR")
    yield sp


def test_encode_tf_arrow_matches_applyinpandas(spark, tmp_path):
    from engine.index_build import (_ENC_SCHEMA, _encode_tf_arrow,
                                    _make_encode_fn)

    rng = np.random.RandomState(7)
    rows = []
    # head term with many postings (multi-block, straddles the small
    # Arrow batches forced below), several small terms, a salted term
    for d in range(900):
        rows.append((0, "head", 0, d, int(rng.randint(1, 9)), 100 + d % 7))
    for t in ("alpha", "beta", "gamma", "delta"):
        for d in rng.choice(2000, size=17, replace=False):
            rows.append((1, t, 0, int(d), 2, 55))
    for salt in (0, 1, 2):
        for d in range(salt, 300, 3):
            rows.append((2, "salty", salt, d, 1, 80))
    tf = spark.createDataFrame(
        rows, "bucket int, term string, salt int, doc_id long, "
              "tf long, dl long")
    old = tf.groupBy("bucket", "term", "salt").applyInPandas(
        _make_encode_fn(77.5, 1.2, 0.75, 128, "vb"), schema=_ENC_SCHEMA)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "64")
    try:
        new = _encode_tf_arrow(tf, 77.5, 1.2, 0.75, 128, "vb")
        o = {(r["term"], r["salt"]): r for r in old.collect()}
        n = {(r["term"], r["salt"]): r for r in new.collect()}
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch",
                       "10000")
    assert set(o) == set(n)
    for key, ro in o.items():
        rn = n[key]
        for col in ("df_part", "blob", "block_last", "block_max_tf",
                    "block_max_w", "block_off", "bucket"):
            assert ro[col] == rn[col], (key, col)


def test_minhash_nonempty_filter_equivalence(spark):
    from engine.pipeline import dedup

    docs = spark.createDataFrame(
        [(0, ""), (1, "  ,,  "), (2, "one"), (3, "one two"),
         (4, "one two three"), (5, "a b c d e f"),
         (6, "x! y? z."), (7, "dup dup dup dup")],
        "doc_id long, text string")
    sigs = dedup.minhash_signatures(docs)
    kept = sorted(r["doc_id"] for r in sigs.select("doc_id").collect())
    # old semantics: docs with at least one 3-shingle, i.e. >= 3 tokens
    assert kept == [4, 5, 6, 7]
    # and the signature values still match the original expression
    sh = dedup.shingles_col(F.col("text"))
    base = F.transform(
        F.col("shingles"),
        lambda s: F.conv(F.substring(F.md5(s), 1, 8), 16, 10)
        .cast("long") % dedup.MINHASH_P)
    old = (docs.select("doc_id", sh.alias("shingles"))
           .where(F.size("shingles") > 0)
           .withColumn("hs", base)
           .withColumn("sig", F.array(*[
               F.array_min(F.transform(
                   F.col("hs"),
                   (lambda i: (lambda h: (F.lit(dedup._mh_a(i)) * h
                                          + F.lit(dedup._mh_b(i)))
                               % dedup.MINHASH_P))(i)))
               for i in range(16)]))
           .select("doc_id", "sig"))
    o = {r["doc_id"]: list(r["sig"]) for r in old.collect()}
    s = {r["doc_id"]: list(r["sig"]) for r in sigs.collect()}
    assert o == s


def test_char_hist_udf_matches_split_explode(spark):
    from engine.search import _char_hist_udf

    vals = ["", "a", "abc abc!", "ABC  abc", "é—ü\tx", "a" * 300, None]
    docs = spark.createDataFrame([(i, v) for i, v in enumerate(vals)],
                                 "doc_id long, content string")
    old = (docs.select("doc_id",
                       F.explode(F.split("content", "")).alias("ch"))
           .where(F.length("ch") > 0)
           .groupBy("doc_id", "ch").agg(F.count(F.lit(1)).alias("c")))
    h = docs.select("doc_id", _char_hist_udf("content").alias("h"))
    new = h.select("doc_id", F.explode("h").alias("ch", "c"))
    o = {(r["doc_id"], r["ch"]): r["c"] for r in old.collect()}
    n = {(r["doc_id"], r["ch"]): r["c"] for r in new.collect()}
    assert o == n


def test_minhash_narrow_persist_equivalence(spark):
    """The r6 sig-only-persist pipeline (persist=True / 'transient':
    narrow (doc_id, sig) cache + fresh shingle pass for verify) must
    produce the same verified pair set as the original single-subtree
    pipeline (persist=False)."""
    from engine.pipeline import dedup

    rows = []
    words = ["al", "be", "ga", "de", "ep", "ze", "et", "th"]
    for i in range(60):
        txt = " ".join(words[(i + j) % 8] for j in range(6 + i % 5))
        rows.append((i, txt))
    # exact and near dups
    rows.append((60, rows[3][1]))
    rows.append((61, rows[7][1] + " extra"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    def pairset(df):
        return {(r["doc_a"], r["doc_b"], round(r["jaccard"], 9))
                for r in df.collect()}

    base = pairset(dedup.minhash_near_dups(docs, threshold=0.3,
                                           persist=False))
    new = dedup.minhash_near_dups(docs, threshold=0.3, persist=True)
    assert pairset(new) == base
    new._minhash_sigs.unpersist()
    tr = dedup.minhash_near_dups(docs, threshold=0.3,
                                 persist="transient")
    assert pairset(tr) == base


def test_fused_single_shard_kernel_equivalence(spark, tmp_path):
    """The r6 fused slice+kernel path (single applyInPandas when every
    query is single-shard) must be row-identical to the two-stage
    slice → kernel plan (forced via explicit n_shards, and via
    fused_single_shard=False on the same matched frame)."""
    from engine.index_build import build_index
    from engine.search import Index, score_wand, wand_stats

    rows = []
    words = ["red", "blue", "green", "gold", "gray", "pink"]
    for i in range(300):
        rows.append((f"r{i}", f"p{i}", "c", "en",
                     " ".join(words[(i + j) % 6]
                              for j in range(3 + i % 7))))
    corpus = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, "
              "content string")
    d = str(tmp_path / "idx")
    build_index(spark, corpus, d, n_buckets=4, n_doc_buckets=1)
    idx = Index(spark, d)
    qt = [("q1", "red", 1.0), ("q1", "gold", 1.0), ("q2", "pink", 2.0),
          ("q2", "blue", 0.5)]

    fused = [tuple(r) for r in score_wand(idx, qt, 7).collect()]
    # n_shards=3 forces the two-stage slice → kernel plan
    sliced = [tuple(r) for r in score_wand(idx, qt, 7,
                                           n_shards=3).collect()]
    assert fused == sliced
    # stats emit through the fused path agrees on totals
    s1 = wand_stats(idx, qt, 7).groupBy().sum(
        "postings_total").collect()[0][0]
    assert s1 > 0


def test_fan_out_repartitions_only_when_needed(spark):
    few = spark.createDataFrame([(i,) for i in range(100)], "x long") \
        .coalesce(1)
    assert fan_out(few).rdd.getNumPartitions() == \
        spark.sparkContext.defaultParallelism
    many = spark.range(0, 1000, 1, 16)
    assert fan_out(many, min_parts=8) is many
