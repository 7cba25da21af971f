"""Index integrity verification (Lucene ``CheckIndex`` analog).

Decodes every posting and cross-checks the structural invariants the
engine relies on, entirely as distributed aggregations — the check
scales like one exhaustive read of the index, no driver-side loops:

* per-posting: decoded length == df_part, doc_ids strictly ascending,
  last decoded doc == last block_last entry (block metadata frames
  the payload it claims to);
* dictionary: termstats df == Σ df_part over the term's sub-postings;
* referential: every posting doc_id exists in the docs table;
* stored rows: sha2(content) equality (the input_hint invariant);
* stats: total_tokens == Σ tf over the forward table;
* derived sidecars, whenever present (VERDICT r4 item 4): positions
  and term_trigrams are VIEWS of docs/tf/termstats that lifecycle ops
  must invalidate (engine/index_build.invalidate_sidecars) — a stale
  or corrupted positions table silently misses phrase/interval
  matches, a stale trigram table misses new dictionary terms in
  wildcard/fuzzy rewrites. Checks: per-(term, doc_id) positions count
  == forward tf (both directions — a missing pair is as bad as a
  wrong one), gap-numbering invariants (non-empty, strictly
  ascending, non-negative), the bucket layout the phrase scans prune
  on, and exact two-way trigram coverage of the ≥3-char dictionary.

Returns a dict of violation counts — all zero means healthy. Run it
after compaction / purge / resume, the way Lucene users run CheckIndex
after an unclean shutdown.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def verify_index(spark: SparkSession, index_dir: str) -> dict:
    from .index_build import _paths, check_sha
    from .search import Index, decode_udf

    idx = Index(spark, index_dir)
    p = _paths(index_dir)

    dec = idx.postings.withColumn("d", decode_udf("blob"))
    per = dec.select(
        "term", "bucket", "df_part",
        F.size("d.doc_ids").alias("n"),
        (F.col("d.doc_ids") ==
         F.array_sort(F.array_distinct("d.doc_ids"))).alias("sorted_ok"),
        F.element_at("d.doc_ids", -1).alias("last_doc"),
        F.element_at("block_last", -1).alias("meta_last"),
    ).persist()
    bad_len = per.where(F.col("n") != F.col("df_part")).count()
    bad_sorted = per.where(~F.col("sorted_ok")).count()
    bad_blockmeta = per.where(
        F.col("last_doc") != F.col("meta_last")).count()
    per.unpersist()

    df_mismatch = (
        idx.postings.groupBy("term").agg(F.sum("df_part").alias("s"))
        .join(idx.termstats.groupBy("term").agg(F.sum("df").alias("df")),
              "term", "full")
        .where(F.coalesce(F.col("s"), F.lit(0))
               != F.coalesce(F.col("df"), F.lit(0)))
        .count())

    orphan_docs = (
        dec.select(F.explode("d.doc_ids").alias("doc_id")).distinct()
        .join(idx.docs.select("doc_id"), "doc_id", "left_anti")
        .count())

    sha_bad = check_sha(idx.docs)

    tok = spark.read.parquet(p["tf"]).agg(F.sum("tf")).collect()[0][0]
    stats_tokens_bad = int(int(tok or 0)
                           != int(idx.stats["total_tokens"]))

    # dictionary layout: termstats files must be pairwise DISJOINT in
    # term range (write_sorted_termstats's contract — what parquet
    # min/max file pruning of the MultiTermQuery rewrites relies on);
    # one (lo, hi) row per file, overlap check on the tiny driver list
    spans = sorted((r["lo"], r["hi"]) for r in
                   (idx.termstats
                    .withColumn("f", F.input_file_name())
                    .groupBy("f")
                    .agg(F.min("term").alias("lo"),
                         F.max("term").alias("hi"))).collect())
    dict_range_overlaps = sum(
        1 for (l1, h1), (l2, h2) in zip(spans, spans[1:]) if h1 > l2)

    # --- derived sidecars (present only if built; see module doc) ---
    from .index_build import _exists
    from .positions import _positions_path
    from .trigram import _trigrams_path

    pos_tf_mismatch = pos_order_bad = pos_bucket_bad = 0
    positions_checked = _exists(spark, _positions_path(index_dir))
    if positions_checked:
        pos = spark.read.parquet(_positions_path(index_dir))
        tfagg = (spark.read.parquet(p["tf"])
                 .groupBy("term", "doc_id")
                 .agg(F.sum("tf").cast("long").alias("tf")))
        pos_tf_mismatch = (
            pos.select("term", "doc_id",
                       F.size("positions").cast("long").alias("np"))
            .join(tfagg, ["term", "doc_id"], "full")
            .where(F.coalesce(F.col("np"), F.lit(-1))
                   != F.coalesce(F.col("tf"), F.lit(-2)))
            .count())
        pos_order_bad = pos.where(
            (F.size("positions") == 0)
            | (F.col("positions")
               != F.array_sort(F.array_distinct("positions")))
            | (F.element_at("positions", 1) < 0)).count()
        nb = int(idx.stats["n_buckets"])
        pos_bucket_bad = pos.where(
            F.col("bucket") != F.pmod(F.xxhash64("term"),
                                      F.lit(nb)).cast("int")).count()

    trigram_missing = trigram_extra = 0
    trigrams_checked = _exists(spark, _trigrams_path(index_dir))
    if trigrams_checked:
        want = (idx.termstats.select("term")
                .where(F.length("term") >= 3).distinct()
                .select("term", F.explode(F.expr(
                    "transform(sequence(1, length(term) - 2),"
                    " i -> substring(term, i, 3))")).alias("tg"))
                .distinct())
        have = (spark.read.parquet(_trigrams_path(index_dir))
                .select("tg", "term").distinct())
        trigram_missing = want.join(have, ["tg", "term"],
                                    "left_anti").count()
        trigram_extra = have.join(want, ["tg", "term"],
                                  "left_anti").count()

    report = {
        "bad_posting_len": bad_len,
        "bad_doc_order": bad_sorted,
        "bad_block_meta": bad_blockmeta,
        "df_mismatch_terms": df_mismatch,
        "orphan_posting_docs": orphan_docs,
        "sha_mismatch_docs": sha_bad,
        "stats_tokens_bad": stats_tokens_bad,
        "dict_range_overlaps": dict_range_overlaps,
        "pos_tf_mismatch": pos_tf_mismatch,
        "pos_order_bad": pos_order_bad,
        "pos_bucket_bad": pos_bucket_bad,
        "trigram_missing": trigram_missing,
        "trigram_extra": trigram_extra,
    }
    report["ok"] = not any(report.values())
    # info only (never part of the ok predicate): which sidecars exist
    report["sidecars_checked"] = {"positions": positions_checked,
                                  "term_trigrams": trigrams_checked}
    return report


if __name__ == "__main__":      # python -m engine.checkindex <index_dir>
    import json
    import sys

    from .session import get_spark

    spark = get_spark(app="checkindex", master="local[8]",
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    print(json.dumps(verify_index(spark, sys.argv[1])))
    spark.stop()
