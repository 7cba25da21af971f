"""Percolation — reverse search (Elasticsearch ``percolate`` query /
Lucene Monitor, né Luwak): a store of REGISTERED queries is run against
incoming documents, answering "which saved searches does this new doc
match?" — the alerting / saved-search / routing primitive every
production search deployment grows.

The reference stops at forward search (its users would script this by
hand around the searcher); semantics here follow Lucene's
``MemoryIndex``-per-document contract for boolean queries: a document
matches a registered query iff it contains EVERY must term and NO
must_not term, under the same analyzer as the forward index.

Plan shape at 100 TB — the inverse of forward search, and exactly the
Lucene Monitor "presearcher" design: the QUERY store is the small side
(thousands of alerts vs billions of docs), so its term table
broadcasts; incoming documents are tokenized ONCE (the same
Catalyst-only analyzer as the index build), reduced to distinct
(doc, term), and the must-count aggregate is map-side combinable.  No
per-document index is ever built — one scan, one broadcast join, one
hash aggregate, plus a broadcast anti-join for prohibitions.  The
streaming form is the same plan inside ``foreachBatch`` (each
micro-batch percolates against the broadcast store), matching how the
engine's streaming near-dup filter composes.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .analysis import tokens_col

# (qid, must_terms, must_not_terms)
PercolateQueries = Sequence[tuple[str, Sequence[str], Sequence[str]]]


def percolate(docs: DataFrame, queries: PercolateQueries,
              text_col: str = "text", id_col: str = "doc_id",
              ascii_fold: bool = False) -> DataFrame:
    """Match every document against every registered query.

    ``queries``: (qid, must, must_not) with at least one must term per
    query (a match-all percolation is a broadcast of the whole stream
    — rejected here, as ES rejects unbounded percolators in practice).
    Terms are compared in ANALYZED form (the Catalyst tokenizer, with
    the index's ``ascii_fold`` setting threaded through — the same
    stale-analyzer trap as query-side search analysis, CLAUDE.md).
    Percolating against a STEMMED index means analyzing the stored
    queries with that index's stemmer up front
    (``engine.analysis.tokenize_texts``); the tokenizer here is the
    unstemmed Catalyst path, matching the engine's default build.

    Returns (id_col, qid) — one row per (document, matched query).
    """
    assert queries, "at least one registered query required"
    assert all(m for _, m, _ in queries), \
        "every percolate query needs >= 1 must term"
    spark = docs.sparkSession

    must_rows = [(q, t) for q, must, _ in queries for t in set(must)]
    not_rows = [(q, t) for q, _, mnot in queries for t in set(mnot or ())]
    n_must = [(q, len(set(m))) for q, m, _ in queries]
    qmust = spark.createDataFrame(must_rows, "qid string, term string")
    qn = spark.createDataFrame(n_must, "qid string, n_must int")

    # one analyzer pass; distinct (doc, term) is all percolation needs
    toks = docs.select(
        id_col,
        F.explode(tokens_col(F.col(text_col), ascii_fold=ascii_fold))
        .alias("term")).distinct()

    matched = (toks.join(F.broadcast(qmust), "term")
               .groupBy(id_col, "qid")
               .agg(F.count(F.lit(1)).cast("int").alias("hit")))
    full = (matched.join(F.broadcast(qn), "qid")
            .where(F.col("hit") == F.col("n_must"))
            .select(id_col, "qid"))
    if not_rows:
        qnot = spark.createDataFrame(not_rows, "qid string, term string")
        prohibited = (toks.join(F.broadcast(qnot), "term")
                      .select(id_col, "qid").distinct())
        full = full.join(F.broadcast(prohibited), [id_col, "qid"],
                         "left_anti")
    return full
