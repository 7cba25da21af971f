"""Multi-index federation (Lucene ``MultiReader`` analog).

At serving scale an index is usually N shard indexes — each built
over its corpus slice — searched as ONE logical index. Lucene does
this with MultiReader: per-segment postings, GLOBAL collection
statistics, and per-reader docBase offsets. This module is the same
contract over N on-disk engine indexes:

* global stats: N = Σ n_docs, total_tokens = Σ, avgdl = Σtok / Σdocs,
  df(term) = Σ per-shard df — so scores equal what one monolithic
  index over the union corpus would produce (verified in tests);
* docBase: shard i's doc_ids are offset by Σ n_docs of shards < i,
  making result ids globally unique (``shard`` column also returned);
* per-shard liveDocs (tombstones) still apply.

The plan fans out bucket-pruned broadcast-join scans per shard and
unions the decoded rows BEFORE one global aggregate + top-k window —
a query touches each shard's postings once, and the only global
shuffle is the (qid, doc) score aggregation.
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

from .scoring import bm25_col
from .search import Index, QueryTerms, _query_df, decode_udf


def federated_topk(indexes: Sequence[Index], query_terms: QueryTerms,
                   k: int) -> DataFrame:
    """Exhaustive BM25 top-k across shard indexes under global
    statistics. Returns (qid, shard, doc_id, score, rank) where
    doc_id is docBase-offset (globally unique); ordering
    (score desc, doc_id asc) matches the monolithic index."""
    assert indexes, "at least one shard index required"
    # heterogeneous shards would silently break the monolithic-index
    # score equivalence (ADVICE r2): every shard must share the BM25
    # constants, the analyzer chain, and the codec family
    ref = indexes[0]
    ref_sig = (ref.stats["k1"], ref.stats["b"], ref.analyzer_opts(),
               ref.stats.get("codec", "vb"))
    for i, ix in enumerate(indexes[1:], start=1):
        sig = (ix.stats["k1"], ix.stats["b"], ix.analyzer_opts(),
               ix.stats.get("codec", "vb"))
        if sig != ref_sig:
            raise ValueError(
                f"federated shard {i} ({ix.index_dir}) disagrees with "
                f"shard 0 on (k1, b, analyzer, codec): {sig} != {ref_sig}")
    spark = indexes[0].spark
    n_docs = sum(ix.n_docs for ix in indexes)
    total_tokens = sum(int(ix.stats["total_tokens"]) for ix in indexes)
    avgdl = total_tokens / max(n_docs, 1)
    k1 = indexes[0].stats["k1"]
    b = indexes[0].stats["b"]

    # global df: Σ per-shard termstats over the query's terms only
    terms = sorted({t for _, t, _ in query_terms})
    tdf = spark.createDataFrame([(t,) for t in terms], "term string")
    gdf = reduce(
        lambda a, bdf: a.unionByName(bdf),
        [ix.termstats.join(F.broadcast(tdf), "term").select("term", "df")
         for ix in indexes]
    ).groupBy("term").agg(F.sum("df").alias("df"))

    qt = _query_df(spark, query_terms)
    parts = []
    base = 0
    for i, ix in enumerate(indexes):
        buckets = ix.term_buckets(terms)
        matched = (ix.postings
                   .where(F.col("bucket").isin(buckets))
                   .join(F.broadcast(qt), "term"))
        dec = matched.withColumn("d", decode_udf("blob"))
        rows = dec.select(
            "qid", "term", "weight",
            F.explode(F.arrays_zip("d.doc_ids", "d.tfs", "d.dls"))
            .alias("e"),
        ).select(
            "qid", "term", "weight",
            F.col("e.doc_ids").alias("doc_id"),
            F.col("e.tfs").alias("tf"),
            F.col("e.dls").alias("dl"),
        )
        rows = ix.live(rows)
        parts.append(rows.select(
            "qid", "term", "weight", "tf", "dl",
            (F.col("doc_id") + F.lit(base)).alias("doc_id"),
            F.lit(i).alias("shard")))
        base += ix.n_docs
    rows = reduce(lambda a, bdf: a.unionByName(bdf), parts)
    rows = rows.join(F.broadcast(gdf), "term")
    scored = rows.withColumn(
        "pscore",
        F.col("weight") * bm25_col(F.col("tf"), F.col("df"), F.col("dl"),
                                   avgdl, float(n_docs), k1, b))
    agg = (scored.groupBy("qid", "shard", "doc_id")
           .agg(F.sum("pscore").alias("score")))
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_id"))
    return (agg.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("qid", "shard", "doc_id", "score", "rank")
            .orderBy("qid", "rank"))
