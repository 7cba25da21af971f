"""Fielded ranked retrieval (Lucene multi-field semantics).

The reference indexes TITLE and TEXT as separate Lucene fields and
queries a BooleanQuery of per-field BoostQuery clauses
(Indexer.java:30-44, Searcher.java:37-43): each clause scores against
ITS FIELD's statistics (df, doc length, avgdl are all per-field in
Lucene), and the doc score is the boosted sum. The engine's RM3/TREC
path approximates that with query-side term boosts against one
concatenated field; this module implements the real thing.

A field here is ITS OWN index over the same corpus rows with a
different content column. Because doc_id assignment is deterministic
by (repo, path) (engine/index_build.py:assign_doc_ids), per-field
indexes are doc-aligned for free — no join key mapping, exactly like
Lucene segments sharing one docID space across fields.

``fielded_topk`` then unions the per-field decoded scoring rows
(each joined against its OWN field's df/avgdl/N) and runs ONE
(qid, doc) aggregate + top-k window. At scale each field is a
bucket-pruned broadcast-join scan — the same plan the single-field
path audits — and fields fan out in parallel.
"""

from __future__ import annotations

from functools import reduce
from typing import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

from .scoring import bm25_col
from .search import Index, _query_df, decode_udf

# (qid, field, term, boost)
FieldedQuery = Sequence[tuple[str, str, str, float]]


def fielded_topk(field_indexes: Mapping[str, Index],
                 queries: FieldedQuery, k: int) -> DataFrame:
    """Per-field boosted BM25 top-k:
    score(doc) = Σ_clauses boost · BM25_field(term, doc), with BM25
    computed against the clause's FIELD statistics (its own df, dl,
    avgdl, N — Lucene's per-field similarity). A doc matching in any
    queried field is a candidate. Returns (qid, doc_id, score, rank).
    """
    parts = []
    for fname, idx in field_indexes.items():
        fq = [(q, t, w) for q, f, t, w in queries if f == fname]
        if not fq:
            continue
        matched = idx.postings \
            .where(F.col("bucket").isin(idx.term_buckets(
                [t for _, t, _ in fq]))) \
            .join(F.broadcast(_query_df(idx.spark, fq)), "term")
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
        rows = idx.live(rows)
        ts = idx.termstats.select("term", "df")
        rows = rows.join(F.broadcast(
            ts.join(_query_df(idx.spark, fq).select("term").distinct(),
                    "term")), "term")
        pscore = F.col("weight") * bm25_col(
            F.col("tf"), F.col("df"), F.col("dl"),
            idx.avgdl, float(idx.n_docs),
            idx.stats["k1"], idx.stats["b"])
        parts.append(rows.select("qid", "doc_id",
                                 pscore.alias("pscore")))
    assert parts, "no queried field has an index"
    rows = reduce(lambda a, b: a.unionByName(b), parts)
    agg = rows.groupBy("qid", "doc_id").agg(F.sum("pscore").alias("score"))
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_id"))
    return (agg.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("qid", "doc_id", "score", "rank")
            .orderBy("qid", "rank"))
