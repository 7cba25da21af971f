"""Entity-biased RM3 pseudo-relevance expansion (SURVEY.md §2.5 Q7-Q11;
reference Searcher.java:45-75, 88-108).

Pipeline (batched over all topics as DataFrames — the reference loops
per topic in one JVM; we fan the pilot fetch + mining out):

  1. pilot top-20 on the anchor query (Q7)
  2. fetch pilot docs' content (Q8: join hits ⨝ docs on doc_id)
  3. mine candidate terms per doc via a vectorized pandas UDF (T10-T12):
     first 200 analyzed tokens, len > 3, no digits, dedup per doc;
     entity = its letters-only lowercase form appears among the first
     200 *whitespace* words of the raw text with an uppercase initial
  4. drop original (title+desc) query terms; df band 2 <= df <= 0.15·N
  5. weight per (doc, term): (ln(N/(df+1)) + 1) · hit_score, ×1.25 if
     entity; sum over pilot docs (Q9)
  6. top-40 terms by (weight desc, term asc — total order imposed per
     SURVEY.md §4.3 expansion-nondeterminism note) (Q10)
  7. final query = anchor weights + 0.5 per expansion term (Q11)
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
import pyspark.sql.types as T

from .analysis import _tokenize_series
from .search import Index, QueryTerms, score_exhaustive
from .topics import BOOST_EXPANSION, Topic, original_terms, topics_to_query_terms

PILOT_K = 20
TOKEN_CAP = 200
TOP_TERMS = 40
ENTITY_BOOST = 1.25
DF_MAX_FRAC = 0.15

_MINE_SCHEMA = T.ArrayType(T.StructType([
    T.StructField("term", T.StringType()),
    T.StructField("entity", T.BooleanType()),
]))


def mine_terms_udf(stem: bool = False, stemmer: str = "porter",
                   ascii_fold: bool = False):
    """Pandas UDF: content -> array<struct<term, entity>> per doc
    (reference analyze(), Searcher.java:88-108)."""

    @F.pandas_udf(_MINE_SCHEMA)
    def _mine(texts: pd.Series) -> pd.Series:
        toks = _tokenize_series(texts, stem=stem, keep_stopwords=False,
                                ascii_fold=ascii_fold, stemmer=stemmer)
        out = []
        for raw, ts in zip(texts.fillna(""), toks):
            caps = set()
            for w in re.split(r"\s+", raw)[:TOKEN_CAP]:
                if w and w[0].isupper():
                    caps.add(re.sub(r"[^a-zA-Z]", "", w).lower())
            seen: dict[str, bool] = {}
            for t in ts[:TOKEN_CAP]:
                if len(t) > 3 and not any(c.isdigit() for c in t):
                    seen[t] = t in caps
            out.append([(t, e) for t, e in seen.items()])
        return pd.Series(out)

    return _mine


def mine_expansion_terms(index: Index, pilot: DataFrame,
                         orig: DataFrame, top_terms: int = TOP_TERMS,
                         stem: bool = False,
                         entity_boost: float = ENTITY_BOOST) -> DataFrame:
    """(qid, term, weight) expansion rows from pilot hits.

    pilot: (qid, doc_id, score); orig: (qid, term) to exclude.
    Mining analyzes doc content, so it uses the INDEX's stemmer/fold
    settings (stale-analyzer rule) — ``stem`` stays caller-controlled
    for parity with the reference's flag.
    """
    an = index.analyzer_opts()
    n = index.n_docs
    docs = index.docs.select("doc_id", "content")
    pilot_docs = pilot.join(docs, "doc_id")
    mined = (pilot_docs
             .withColumn("tm", F.explode(
                 mine_terms_udf(stem, stemmer=an["stemmer"],
                                ascii_fold=an["ascii_fold"])("content")))
             .select("qid", "score",
                     F.col("tm.term").alias("term"),
                     F.col("tm.entity").alias("entity")))
    mined = mined.join(orig.withColumn("_orig", F.lit(1)),
                       ["qid", "term"], "left_anti")
    ts = index.termstats.select("term", "df")
    mined = (mined.join(ts, "term")  # terms absent from index have no df
             .where((F.col("df") >= 2) & (F.col("df") <= n * DF_MAX_FRAC)))
    weighted = mined.withColumn(
        "w",
        (F.log(F.lit(float(n)) / (F.col("df") + 1)) + 1.0) * F.col("score")
        * F.when(F.col("entity"), F.lit(entity_boost)).otherwise(F.lit(1.0)))
    agg = weighted.groupBy("qid", "term").agg(F.sum("w").alias("w"))
    win = Window.partitionBy("qid").orderBy(F.desc("w"), F.asc("term"))
    return (agg.withColumn("r", F.row_number().over(win))
            .where(F.col("r") <= top_terms)
            .select("qid", "term", "w"))


def expanded_query_terms(index: Index, topics: list[Topic],
                         pilot_k: int = PILOT_K, top_terms: int = TOP_TERMS,
                         stem: bool = False,
                         boosts: tuple[float, float, float] | None = None,
                         entity_boost: float = ENTITY_BOOST,
                         expansion_boost: float = BOOST_EXPANSION,
                         k1: float | None = None,
                         b: float | None = None) -> QueryTerms:
    """Full entity-RM3 anchor→pilot→mine→final query assembly.

    Returns (qid, term, weight) rows for the FINAL query: anchor
    weights plus BOOST_EXPANSION per selected expansion term (a term in
    both gets the sum, matching the reference's SHOULD-clause scoring).
    """
    an = index.analyzer_opts()
    anchor = topics_to_query_terms(topics, stem=stem, boosts=boosts,
                                   stemmer=an["stemmer"],
                                   ascii_fold=an["ascii_fold"])
    pilot = score_exhaustive(index, anchor, pilot_k, k1=k1, b=b) \
        .select("qid", "doc_id", "score")
    orig_rows = [(t.number, term) for t in topics
                 for term in original_terms(t, stem=stem,
                                            stemmer=an["stemmer"],
                                            ascii_fold=an["ascii_fold"])]
    orig = index.spark.createDataFrame(orig_rows or [("", "")],
                                       "qid string, term string")
    exp = mine_expansion_terms(index, pilot, orig, top_terms, stem=stem,
                               entity_boost=entity_boost)
    exp_rows = [(r["qid"], r["term"], expansion_boost)
                for r in exp.collect()]
    combined: dict[tuple[str, str], float] = {}
    for qid, term, w in list(anchor) + exp_rows:
        combined[(qid, term)] = combined.get((qid, term), 0.0) + w
    return [(q, t, w) for (q, t), w in sorted(combined.items())]


def drop_malformed_topics(topics: list[Topic], stem: bool = False, *,
                          stemmer: str = "porter",
                          ascii_fold: bool = False) -> list[Topic]:
    """Q12 per-topic error isolation (reference Searcher.java:82: each
    topic's query build runs in a try/catch; a failure logs and the
    loop continues). Our plan is batched, so the per-topic failure mode
    lives in query ASSEMBLY (parse/tokenize/boost of one topic) — probe
    it per topic here and drop offenders with a warning instead of
    failing the whole batch."""
    import warnings

    from .topics import anchor_weights

    good = []
    for t in topics:
        try:
            if not anchor_weights(t, stem=stem, stemmer=stemmer,
                                  ascii_fold=ascii_fold):
                raise ValueError("topic yields no query terms")
            good.append(t)
        except Exception as e:  # noqa: BLE001 — isolation is the point
            warnings.warn(f"skipping malformed topic "
                          f"{getattr(t, 'number', '?')!r}: {e}")
    return good


def search_topics(index: Index, topics: list[Topic], num_docs: int = 1000,
                  expand: bool = True, stem: bool = False,
                  pilot_k: int = PILOT_K, top_terms: int = TOP_TERMS,
                  boosts: tuple[float, float, float] | None = None,
                  entity_boost: float = ENTITY_BOOST,
                  expansion_boost: float = BOOST_EXPANSION) -> DataFrame:
    """End-to-end reference search lifecycle (Searcher.java:22-86):
    anchor (+ optional RM3 expansion) → BM25 top-numDocs with docno.
    Malformed topics are dropped per-topic (Q12), not batch-fatal.
    Query analysis uses the INDEX's stemmer/ascii_fold settings
    (Index.analyzer_opts() — the stale-analyzer rule); ``stem`` stays
    the caller's parity flag as in the reference CLI.
    Returns (qid, doc_id, docno, score, rank)."""
    an = index.analyzer_opts()
    topics = drop_malformed_topics(topics, stem=stem,
                                   stemmer=an["stemmer"],
                                   ascii_fold=an["ascii_fold"])
    if expand:
        qt = expanded_query_terms(index, topics, pilot_k, top_terms,
                                  stem=stem, boosts=boosts,
                                  entity_boost=entity_boost,
                                  expansion_boost=expansion_boost)
    else:
        qt = topics_to_query_terms(topics, stem=stem, boosts=boosts,
                                   stemmer=an["stemmer"],
                                   ascii_fold=an["ascii_fold"])
    return score_exhaustive(index, qt, num_docs, include_docno=True)
