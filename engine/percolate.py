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


# ---------------------------------------------------------------------------
# Indexed query store (the Lucene Monitor / ES percolator-index design)
# ---------------------------------------------------------------------------

def register_queries(spark, store_dir: str, queries: PercolateQueries,
                     df_map: dict | None = None) -> dict:
    """Materialize the registered-query store as an INDEX (VERDICT r3
    item 7 — ES stores percolator queries in a real index and
    "presearches" it; Lucene Monitor is the same design): three
    term-sorted parquet tables under ``store_dir`` —

      anchors/  (term, qid)          one row per query: its ANCHOR =
                                     the rarest must term (df from
                                     ``df_map`` when given, longest-
                                     term rarity proxy otherwise; ties
                                     term asc). A doc can only match a
                                     query if it contains the anchor,
                                     so the candidate join touches
                                     |queries sharing an anchor WITH
                                     the doc| rows, not |store|.
      must/     (qid, term, n_must)  full conjunction for verification
      mnot/     (qid, term)          prohibitions

    The anchor choice is pure pruning — any must term is sound; rarer
    anchors mean fewer candidates. Returns {"n_queries": ...}.
    """
    assert queries, "at least one registered query required"
    assert all(m for _, m, _ in queries), \
        "every percolate query needs >= 1 must term"

    def anchor(must):
        ms = sorted(set(must))
        if df_map:
            return min(ms, key=lambda t: (df_map.get(t, 0), t))
        return min(ms, key=lambda t: (-len(t), t))

    anchors = [(anchor(m), q) for q, m, _ in queries]
    must_rows = [(q, t, len(set(m)))
                 for q, m, _ in queries for t in sorted(set(m))]
    not_rows = [(q, t) for q, _, mn in queries for t in sorted(set(mn or ()))]
    # the three table writes are not atomic as a group: a marker
    # brackets them (reshard_index's recipe) so a crash mid-register
    # can never be read as a valid store mixing old and new tables —
    # percolate_indexed refuses while the marker exists
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    marker = jvm.org.apache.hadoop.fs.Path(
        f"{store_dir}/_REGISTER_IN_PROGRESS")
    fs = marker.getFileSystem(conf)
    fs.mkdirs(marker)
    (spark.createDataFrame(anchors, "term string, qid string")
     .sort("term").write.mode("overwrite")
     .parquet(f"{store_dir}/anchors"))
    (spark.createDataFrame(must_rows, "qid string, term string, n_must int")
     .sort("qid").write.mode("overwrite").parquet(f"{store_dir}/must"))
    if not_rows:
        (spark.createDataFrame(not_rows, "qid string, term string")
         .sort("qid").write.mode("overwrite")
         .parquet(f"{store_dir}/mnot"))
    else:
        # a re-register with NO prohibitions must also REMOVE any
        # mnot left by a previous register over the same store_dir —
        # a stale table would keep firing old prohibitions against
        # reused qids (regression: test_reregister_clears_stale_mnot)
        hp = jvm.org.apache.hadoop.fs.Path(f"{store_dir}/mnot")
        if fs.exists(hp):
            fs.delete(hp, True)
    fs.delete(marker, True)
    return {"n_queries": len(queries)}


def percolate_indexed(docs: DataFrame, store_dir: str,
                      text_col: str = "text", id_col: str = "doc_id",
                      ascii_fold: bool = False,
                      with_stats: bool = False):
    """Percolation against an indexed query store
    (:func:`register_queries`) — the plan that scales in BOTH
    directions (doc volume AND store size, where :func:`percolate`
    broadcasts the whole store):

    1. tokenize docs once → distinct (doc, term)           [unchanged]
    2. candidate join: doc terms ⋈ anchors — a doc pairs only with
       queries whose rarest must term it contains (the Monitor
       presearcher step). Equi-join, never a broadcast of the store.
    3. verify: candidates expand to their full must sets (join by
       qid), containment-checked against the doc's term set (one
       (doc, term) semi-join), count == n_must.
    4. prohibitions checked for candidates only.

    EXACT — identical output to :func:`percolate` (a matching doc
    contains every must term, in particular the anchor;
    equivalence-tested). ``with_stats=True`` additionally returns
    {"n_queries", "avg_candidates_per_doc", "max_candidates_per_doc"}
    — the queries-evaluated-per-doc ≪ store-size counter.
    """
    spark = docs.sparkSession
    from .index_build import _exists

    jvm0 = spark._jvm
    mk = jvm0.org.apache.hadoop.fs.Path(
        f"{store_dir}/_REGISTER_IN_PROGRESS")
    if mk.getFileSystem(spark._jsc.hadoopConfiguration()).exists(mk):
        raise ValueError(
            f"percolator store {store_dir} has an interrupted "
            "register_queries (marker present) — re-run "
            "register_queries to repair it")
    anchors = spark.read.parquet(f"{store_dir}/anchors")
    must = spark.read.parquet(f"{store_dir}/must")
    # presence check, NOT try/except: a store registered WITH
    # prohibitions whose mnot read fails (corrupt/partial parquet, FS
    # error) must raise, never silently disable must_not checking
    mnot_path = f"{store_dir}/mnot"
    if _exists(spark, mnot_path):
        mnot = spark.read.parquet(mnot_path)
    else:
        jvm = spark._jvm
        hp = jvm.org.apache.hadoop.fs.Path(mnot_path)
        fs = hp.getFileSystem(spark._jsc.hadoopConfiguration())
        if fs.exists(hp):   # dir present but no _SUCCESS gate
            raise ValueError(
                f"percolator store {mnot_path} is partially written "
                "(no _SUCCESS) — re-run register_queries")
        mnot = None

    toks = docs.select(
        id_col,
        F.explode(tokens_col(F.col(text_col), ascii_fold=ascii_fold))
        .alias("term")).distinct()

    cand = toks.join(anchors, "term").select(id_col, "qid")
    need = cand.join(must, "qid")                  # (doc, qid, term, n)
    have = need.join(toks, [id_col, "term"], "left_semi")
    full = (have.groupBy(id_col, "qid", "n_must")
            .agg(F.count(F.lit(1)).cast("int").alias("hit"))
            .where(F.col("hit") == F.col("n_must"))
            .select(id_col, "qid"))
    if mnot is not None:
        prohibited = (cand.join(mnot, "qid")
                      .join(toks, [id_col, "term"], "left_semi")
                      .select(id_col, "qid").distinct())
        full = full.join(prohibited, [id_col, "qid"], "left_anti")
    if not with_stats:
        return full
    n_queries = must.select("qid").distinct().count()
    st = (cand.groupBy(id_col).agg(F.count(F.lit(1)).alias("nc"))
          .agg(F.avg("nc").alias("avg"), F.max("nc").alias("mx"))
          .collect()[0])
    stats = {"n_queries": int(n_queries),
             "avg_candidates_per_doc": float(st["avg"] or 0.0),
             "max_candidates_per_doc": int(st["mx"] or 0)}
    return full, stats
