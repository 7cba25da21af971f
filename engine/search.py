"""Query engine: weighted-OR BM25 top-k, boolean AND, block-max WAND
(SURVEY.md §2.5 Q1-Q14; reference Searcher.java:22-86).

Query model: a batch of queries, each a bag of ``(term, weight)``
clauses — the flattening of the reference's BooleanQuery-of-BoostQuery
trees (Searcher.java:37-43: a term occurring c times in a field with
boost β contributes weight c·β; SHOULD-clause scores sum).

Two scoring paths, required rank-identical (SURVEY.md §5.2):

* :func:`score_exhaustive` — pure DataFrame plan: broadcast query terms
  ⨝ postings (partition-pruned by term bucket) → vectorized decode →
  BM25 column math → sum per (query, doc) → per-query top-k window.
  Every matching doc is scored; this is the correctness oracle.
* :func:`score_wand` — per-query ``applyInPandas`` scorer that uses the
  per-block ``block_max_w`` upper bounds to skip exact scoring of docs
  that cannot enter the top-k (a vectorized block-max WAND variant:
  candidate pruning at block granularity with a partial-score seeded
  threshold; see ``_wand_kernel``).

Both paths order by (score desc, doc_id asc) — the reference's
tie-break (SURVEY.md §4.3) — in float64 end-to-end.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
import pyspark.sql.types as T

from .index_build import load_stats, _paths
from .scoring import bm25_col, idf_col

QueryTerms = Sequence[tuple[str, str, float]]  # (qid, term, weight)


class Index:
    """Handle on an on-disk index (lazy DataFrames + broadcast stats)."""

    def __init__(self, spark: SparkSession, index_dir: str):
        self.spark = spark
        self.index_dir = index_dir
        p = _paths(index_dir)
        self.stats = load_stats(spark, index_dir)
        self.postings = spark.read.parquet(p["postings"])
        self.termstats = spark.read.parquet(p["termstats"])
        self.docs = spark.read.parquet(p["docs"])

    @property
    def n_docs(self) -> int:
        return self.stats["n_docs"]

    @property
    def avgdl(self) -> float:
        return self.stats["avgdl"]

    def term_buckets(self, terms: Sequence[str]) -> list[int]:
        """Driver-side bucket lookup for partition pruning (one tiny job;
        xxhash64 must match the JVM's, so ask Spark)."""
        if not terms:
            return []
        df = self.spark.createDataFrame([(t,) for t in set(terms)], "term string")
        rows = df.select(
            F.pmod(F.xxhash64("term"), F.lit(self.stats["n_buckets"]))
            .cast("int").alias("b")).distinct().collect()
        return [int(r["b"]) for r in rows]

    def df_map(self, terms: Sequence[str]) -> dict[str, int]:
        """Driver-side df lookup for a small term set (bucket-pruned)."""
        if not terms:
            return {}
        buckets = self.term_buckets(terms)
        rows = (self.termstats
                .where(F.col("bucket").isin(buckets))
                .where(F.col("term").isin(list(set(terms))))
                .select("term", "df").collect())
        return {r["term"]: int(r["df"]) for r in rows}


_DECODE_SCHEMA = T.StructType([
    T.StructField("doc_ids", T.ArrayType(T.LongType())),
    T.StructField("tfs", T.ArrayType(T.LongType())),
    T.StructField("dls", T.ArrayType(T.LongType())),
])


@F.pandas_udf(_DECODE_SCHEMA)
def decode_udf(blobs: pd.Series) -> pd.DataFrame:
    """Vectorized posting decode: binary -> (doc_ids, tfs, dls) arrays."""
    from .postings import decode_postings
    out = {"doc_ids": [], "tfs": [], "dls": []}
    for blob in blobs:
        d, t, dl = decode_postings(bytes(blob) if blob is not None else b"")
        out["doc_ids"].append(d.tolist())
        out["tfs"].append(t.tolist())
        out["dls"].append(dl.tolist())
    return pd.DataFrame(out)


def _query_df(spark: SparkSession, query_terms: QueryTerms) -> DataFrame:
    return spark.createDataFrame(
        [(q, t, float(w)) for q, t, w in query_terms],
        "qid string, term string, weight double")


def _matched_postings(index: Index, query_terms: QueryTerms) -> DataFrame:
    """Postings rows for the query's terms, partition-pruned + broadcast
    joined (SURVEY.md Q4: the tiny side is always the query)."""
    qt = _query_df(index.spark, query_terms)
    buckets = index.term_buckets([t for _, t, _ in query_terms])
    return (index.postings
            .where(F.col("bucket").isin(buckets))
            .join(F.broadcast(qt), "term"))


def score_exhaustive(index: Index, query_terms: QueryTerms, k: int,
                     include_docno: bool = False) -> DataFrame:
    """Weighted-OR BM25 top-k, scoring every matching document.

    Returns (qid, doc_id, score, rank) ordered by qid, rank.
    """
    matched = _matched_postings(index, query_terms)
    dec = matched.withColumn("d", decode_udf("blob"))
    rows = dec.select(
        "qid", "term", "weight",
        F.explode(F.arrays_zip("d.doc_ids", "d.tfs", "d.dls")).alias("e"),
    ).select(
        "qid", "term", "weight",
        F.col("e.doc_ids").alias("doc_id"),
        F.col("e.tfs").alias("tf"),
        F.col("e.dls").alias("dl"),
    )
    ts = index.termstats.select("term", "df")
    rows = rows.join(F.broadcast(
        ts.join(_query_df(index.spark, query_terms).select("term").distinct(),
                "term")), "term")
    scored = rows.withColumn(
        "pscore",
        F.col("weight") * bm25_col(F.col("tf"), F.col("df"), F.col("dl"),
                                   index.avgdl, float(index.n_docs),
                                   index.stats["k1"], index.stats["b"]))
    agg = scored.groupBy("qid", "doc_id").agg(F.sum("pscore").alias("score"))
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_id"))
    out = (agg.withColumn("rank", F.row_number().over(w))
           .where(F.col("rank") <= k)
           .select("qid", "doc_id", "score", "rank"))
    if include_docno:
        out = out.join(index.docs.select("doc_id", "docno"), "doc_id") \
                 .select("qid", "doc_id", "docno", "score", "rank")
    return out.orderBy("qid", "rank")


def boolean_and(index: Index, queries: Sequence[tuple[str, Sequence[str]]]
                ) -> DataFrame:
    """Conjunctive (AND) retrieval: docs containing ALL query terms
    (north-rule Q13; posting-list intersection as a count-match agg).

    Returns (qid, doc_id) ordered.
    """
    qt = [(q, t, 1.0) for q, terms in queries for t in set(terms)]
    n_terms = {q: len(set(terms)) for q, terms in queries}
    matched = _matched_postings(index, qt)
    dec = matched.withColumn("d", decode_udf("blob"))
    rows = dec.select("qid", "term",
                      F.explode("d.doc_ids").alias("doc_id"))
    nt = F.broadcast(index.spark.createDataFrame(
        list(n_terms.items()), "qid string, n_terms int"))
    hits = (rows.groupBy("qid", "doc_id")
            .agg(F.count_distinct("term").alias("nmatch"))
            .join(nt, "qid")
            .where(F.col("nmatch") == F.col("n_terms"))
            .select("qid", "doc_id"))
    return hits.orderBy("qid", "doc_id")


# ---------------------------------------------------------------------------
# Block-max WAND path
# ---------------------------------------------------------------------------

def _wand_kernel(pdf: pd.DataFrame, k: int, k1: float, b: float,
                 avgdl: float, block_size: int) -> pd.DataFrame:
    """Top-k for ONE query from its matched posting rows.

    Vectorized block-max pruning:
      1. decode all matched lists (numpy);
      2. exact per-posting contributions c = weight*idf*w(tf,dl);
      3. seed threshold θ = k-th largest contribution within the
         single highest-upper-bound list (partial scores lower-bound
         totals, so θ lower-bounds the true k-th score);
      4. per-posting upper bound = weight*idf*block_max_w of its block
         (block granularity — this is the WAND bound);
      5. candidate docs: Σ upper bounds ≥ θ; all others provably cannot
         reach the top-k;
      6. exact-score candidates only; top-k by (-score, doc_id).
    """
    from .postings import decode_postings

    qid = pdf["qid"].iloc[0]
    doc_arrays, contrib_arrays, ub_arrays = [], [], []
    for i in range(len(pdf)):
        d, tf, dl = decode_postings(bytes(pdf["blob"].iloc[i]))
        if d.size == 0:
            continue
        wgt = float(pdf["weight"].iloc[i]) * float(pdf["idf"].iloc[i])
        wexact = tf.astype(np.float64) / (
            tf + k1 * (1.0 - b + b * dl.astype(np.float64) / avgdl))
        c = wgt * wexact
        bmw = np.asarray(pdf["block_max_w"].iloc[i], dtype=np.float64)
        ub = wgt * np.repeat(bmw, block_size)[: d.size]
        doc_arrays.append(d)
        contrib_arrays.append(c)
        ub_arrays.append(ub)
    if not doc_arrays:
        return pd.DataFrame({"qid": [], "doc_id": [], "score": []})

    # 3. seed θ from the strongest list's own contributions
    best_i = int(np.argmax([c.max() for c in contrib_arrays]))
    seed = np.sort(contrib_arrays[best_i])
    theta = seed[-k] if seed.size >= k else -np.inf

    docs = np.concatenate(doc_arrays)
    contribs = np.concatenate(contrib_arrays)
    ubs = np.concatenate(ub_arrays)
    uniq, inv = np.unique(docs, return_inverse=True)
    ub_sum = np.zeros(uniq.size)
    np.add.at(ub_sum, inv, ubs)
    cand = ub_sum >= theta  # block-max pruning

    keep = cand[inv]
    sc = np.zeros(uniq.size)
    np.add.at(sc, inv, np.where(keep, contribs, 0.0))
    cidx = np.flatnonzero(cand)
    order = np.lexsort((uniq[cidx], -sc[cidx]))[:k]
    sel = cidx[order]
    return pd.DataFrame({
        "qid": qid, "doc_id": uniq[sel].astype(np.int64),
        "score": sc[sel],
    })


_WAND_SCHEMA = T.StructType([
    T.StructField("qid", T.StringType()),
    T.StructField("doc_id", T.LongType()),
    T.StructField("score", T.DoubleType()),
])


def score_wand(index: Index, query_terms: QueryTerms, k: int) -> DataFrame:
    """Block-max WAND top-k (north-rule Q14): queries are distributed
    across executors (one applyInPandas group per query); each group
    receives only its matched posting rows plus idf, and prunes with
    the per-block score bounds stored in the index.
    """
    terms = [t for _, t, _ in query_terms]
    dfm = index.df_map(terms)
    n, avgdl = float(index.n_docs), index.avgdl
    k1, b = index.stats["k1"], index.stats["b"]
    block_size = int(index.stats["block_size"])
    rows = [(q, t, float(w),
             float(np.log1p((n - dfm.get(t, 0) + 0.5) / (dfm.get(t, 0) + 0.5))))
            for q, t, w in query_terms if t in dfm]
    if not rows:
        return index.spark.createDataFrame([], _WAND_SCHEMA)
    qt = index.spark.createDataFrame(
        rows, "qid string, term string, weight double, idf double")
    buckets = index.term_buckets(terms)
    matched = (index.postings
               .where(F.col("bucket").isin(buckets))
               .join(F.broadcast(qt), "term")
               .select("qid", "term", "weight", "idf", "blob", "block_max_w"))
    out = matched.groupBy("qid").applyInPandas(
        lambda pdf: _wand_kernel(pdf, k, k1, b, avgdl, block_size),
        schema=_WAND_SCHEMA)
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_id"))
    return (out.withColumn("rank", F.row_number().over(w))
            .select("qid", "doc_id", "score", "rank")
            .orderBy("qid", "rank"))
