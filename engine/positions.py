"""Positional index: phrase and proximity queries (beyond the
reference's term-bag model).

The reference's Lucene index stores positions by default
(IndexWriter with TextField, reference Indexer.java:30-44), but its
searcher only ever issues BooleanQuery-of-BoostQuery term bags
(Searcher.java:37-43) — so positions are a latent capability of the
reference a user could tap via Lucene's PhraseQuery. This module makes
that capability first-class, Spark-style.

Position semantics (Lucene-like gap positions):

* position = 0-based index in the FULL analyzed token stream
  (possessive/camel/lower splits applied, empty tokens dropped,
  STOPWORDS STILL COUNTED) — i.e. Lucene's position increments: a
  stopword consumes a position but emits no token. The phrase
  ``"state of the art"`` therefore analyzes to ``[(state,0),(art,3)]``
  and matches exactly the docs where those gaps line up.
* the positional table stores only non-stopword terms (same vocabulary
  as the inverted index), one row per (term, doc_id) with a sorted
  int-array of positions — partitioned by the SAME xxhash64 term
  bucket as postings, so reads are partition-pruned identically.

Scale design (the 100 TB story):

* build is one tokenize pass: posexplode (Catalyst, whole-stage
  codegen) → groupBy (term, doc) collect sorted positions — the same
  shuffle shape and volume class as the tf stage of the main index.
* phrase match is the ANCHOR-ALIGNMENT plan: each posting position p
  of a phrase term at offset o votes for anchor a = p − o; a doc
  matches iff some anchor receives a vote from EVERY phrase offset.
  That is a plain groupBy((qid, doc, anchor)) count-distinct — no
  per-doc Python, no self-join, shuffle bounded by Σ positions of the
  matched terms, and lead-term gating (rarest list broadcast semi-
  filter, as in boolean AND) bounds it further to the rarest term's
  docs × phrase length.
* proximity match anchors on the rarest term and range-joins the
  others within the window — the join is per-doc-local (equi-join on
  (qid, doc_id) then a window predicate), never a cross product.
"""

from __future__ import annotations

from typing import Sequence

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .analysis import (RE_NONTOKEN, STOPWORDS, _STOPSET, kstem,
                       porter_stem, tokenize_texts)
from .index_build import _exists, _paths
from .search import Index

POSITIONS_DIRNAME = "positions"


def _positions_path(index_dir: str) -> str:
    return f"{index_dir}/{POSITIONS_DIRNAME}"


def _full_tokens_col(col, ascii_fold: bool = False):
    """All tokens (stopwords INCLUDED) in stream order — the position
    axis. Pure Catalyst; mirrors analysis.tokens_col(keep_stopwords)."""
    from .analysis import RE_CAMEL_A, RE_CAMEL_B, RE_POSSESSIVE, fold_col
    if ascii_fold:
        col = fold_col(col)
    c = F.regexp_replace(col, RE_POSSESSIVE, "")
    c = F.regexp_replace(c, RE_CAMEL_A, r"$1 $2")
    c = F.regexp_replace(c, RE_CAMEL_B, r"$1 $2")
    c = F.lower(c)
    return F.filter(F.split(c, RE_NONTOKEN), lambda t: t != F.lit(""))


def build_positions(spark: SparkSession, index_dir: str) -> dict:
    """Add a positional table to an existing index (resumable stage:
    gated on its own _SUCCESS like every other build stage).

    Layout: ``{index_dir}/positions`` parquet partitioned by ``bucket``
    with rows (bucket, term, doc_id, positions: array<int> sorted asc).
    Stemming parity: applied per-term AFTER position assignment when
    the index was built with ``stem=True`` (stop-then-stem, matching
    the analyzer chain), via a vectorized pandas UDF off the hot path.
    """
    from .index_build import load_stats

    p = _paths(index_dir)
    out = _positions_path(index_dir)
    stats = load_stats(spark, index_dir)
    if _exists(spark, out):
        return {"resumed": True, "n_rows": None}

    docs = spark.read.parquet(p["docs"]).select("doc_id", "content")
    stops = F.array(*[F.lit(s) for s in STOPWORDS])
    tok = (docs
           .select("doc_id",
                   F.posexplode(_full_tokens_col(
                       F.col("content"),
                       ascii_fold=bool(stats.get("ascii_fold"))))
                   .alias("pos", "term"))
           .where(~F.array_contains(stops, F.col("term"))))
    if stats.get("stem"):
        _fn = porter_stem if stats.get("stemmer", "porter") == "porter" \
            else kstem

        @F.pandas_udf("string")
        def _stem(s: pd.Series) -> pd.Series:
            return s.map(_fn)
        tok = tok.withColumn("term", _stem("term"))
    n_buckets = int(stats["n_buckets"])
    rows = (tok.groupBy("term", "doc_id")
            .agg(F.sort_array(F.collect_list(F.col("pos").cast("int")))
                 .alias("positions"))
            .withColumn("bucket",
                        F.pmod(F.xxhash64("term"), F.lit(n_buckets))
                        .cast("int")))
    (rows.select("bucket", "term", "doc_id", "positions")
     .write.mode("overwrite").partitionBy("bucket").parquet(out))
    return {"resumed": False}


def analyze_phrase(text: str, stem: bool = False,
                   stemmer: str = "porter",
                   ascii_fold: bool = False) -> list[tuple[str, int]]:
    """Driver-side phrase analysis → [(term, offset)] with gap-
    preserving offsets (stopwords consume an offset, emit nothing).
    Must be called with the INDEX's analyzer settings."""
    toks = tokenize_texts([text], keep_stopwords=True,
                          ascii_fold=ascii_fold)[0]
    fn = porter_stem if stemmer == "porter" else kstem
    out = []
    for i, t in enumerate(toks):
        if t in _STOPSET:
            continue
        out.append((fn(t) if stem else t, i))
    return out


def _positions_df(index: Index, terms: Sequence[str]) -> DataFrame:
    pos = index.spark.read.parquet(_positions_path(index.index_dir))
    buckets = index.term_buckets(list(terms))
    return pos.where(F.col("bucket").isin(buckets))


PHRASE_LEAD_MAX_DF = 100_000  # broadcastable lead doc-set bound


def phrase_match(index: Index,
                 phrases: Sequence[tuple[str, str]],
                 lead_max_df: int = PHRASE_LEAD_MAX_DF) -> DataFrame:
    """Exact phrase retrieval: docs where the analyzed phrase occurs
    with its exact gap pattern. Returns (qid, doc_id) ordered.

    Anchor-alignment plan (see module docstring): shuffle rows =
    Σ positions of matched terms, lead-gated by the rarest term's doc
    set when that is broadcastable — a query with one head term never
    explodes the head term's positions past the rarest list's docs.
    """
    opts = index.analyzer_opts()
    qrows: list[tuple[str, str, int]] = []
    n_offs: dict[str, int] = {}
    for qid, text in phrases:
        toks = analyze_phrase(text, **opts)
        for t, off in toks:
            qrows.append((qid, t, off))
        n_offs[qid] = len(toks)
    qrows = [r for r in qrows if n_offs[r[0]] > 0]
    spark = index.spark
    if not qrows:
        return spark.createDataFrame([], "qid string, doc_id long")

    # lead gating: per query, the rarest term's docs (df from termstats)
    terms = sorted({t for _, t, _ in qrows})
    dfm = index.df_map(terms)
    lead: dict[str, str] = {}
    for qid in n_offs:
        ts = sorted({t for q, t, _ in qrows if q == qid})
        if any(t not in dfm for t in ts):
            continue  # some term absent → query matches nothing anyway
        rare = min(ts, key=lambda t: (dfm[t], t))
        if dfm[rare] <= lead_max_df and len(ts) > 1:
            lead[qid] = rare
    return _anchor_match(index, qrows, n_offs, lead)


def _anchor_match(index: Index, qrows: Sequence[tuple[str, str, int]],
                  n_offs: dict[str, int],
                  lead: dict[str, str]) -> DataFrame:
    """Shared anchor-alignment core: docs where every query offset is
    matched by SOME (term, off) row at the same anchor — multiple terms
    may share an offset (MultiPhraseQuery semantics; count_distinct is
    over offsets, so any one of them satisfies that position)."""
    spark = index.spark
    terms = sorted({t for _, t, _ in qrows})
    qdf = spark.createDataFrame(list(qrows),
                                "qid string, term string, off int")
    pos = _positions_df(index, terms)
    matched = pos.join(F.broadcast(qdf), "term")

    if lead:
        lqdf = spark.createDataFrame(
            [(q, t) for q, t in lead.items()], "qid string, term string")
        lead_docs = (_positions_df(index, sorted(set(lead.values())))
                     .join(F.broadcast(lqdf), "term")
                     .select("qid", "doc_id").distinct()
                     .withColumn("_keep", F.lit(1)))
        matched = (matched
                   .join(F.broadcast(lead_docs), ["qid", "doc_id"], "left")
                   .where(F.col("_keep").isNotNull()
                          | ~F.col("qid").isin(list(lead)))
                   .drop("_keep"))

    exploded = (matched
                .select("qid", "doc_id", "off",
                        F.explode("positions").alias("p"))
                .withColumn("anchor", F.col("p") - F.col("off"))
                .where(F.col("anchor") >= 0))
    ndf = F.broadcast(spark.createDataFrame(
        list(n_offs.items()), "qid string, n_offs int"))
    hits = (exploded.groupBy("qid", "doc_id", "anchor")
            .agg(F.count_distinct("off").alias("nmatch"))
            .join(ndf, "qid")
            .where(F.col("nmatch") == F.col("n_offs"))
            .select("qid", "doc_id").distinct())
    return index.live(hits).orderBy("qid", "doc_id")


def phrase_prefix_expansions(index: Index, prefixes: Sequence[str],
                             max_expansions: int = 50) -> dict[str, list[str]]:
    """Per-prefix dictionary expansions in TERM ORDER, capped at
    ``max_expansions`` — Lucene's match_phrase_prefix rewrite collects
    the first ``max_expansions`` terms of the prefix's term-dictionary
    range (TermsEnum order), not the highest-df ones.  The scan is
    pre-pruned to the prefixes' [p, next(p)) sorted-dictionary ranges;
    only the capped expansion lists come to the driver (the same
    enumerate-then-query shape as expand_prefix_terms)."""
    from .search import _prefix_range_filter

    if not prefixes:
        return {}
    pdf = index.spark.createDataFrame([(p,) for p in sorted(set(prefixes))],
                                      "prefix string")
    ts = _prefix_range_filter(index.termstats.select("term"),
                              list(prefixes))
    w = Window.partitionBy("prefix").orderBy(F.asc("term"))
    rows = (ts.join(F.broadcast(pdf),
                    F.col("term").startswith(F.col("prefix")))
            .withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= max_expansions)
            .select("prefix", "term").collect())
    out: dict[str, list[str]] = {p: [] for p in prefixes}
    for r in rows:
        out[r["prefix"]].append(r["term"])
    return out


def phrase_prefix_match(index: Index,
                        queries: Sequence[tuple[str, str]],
                        max_expansions: int = 50,
                        lead_max_df: int = PHRASE_LEAD_MAX_DF) -> DataFrame:
    """match_phrase_prefix retrieval (Elasticsearch
    ``match_phrase_prefix`` / Lucene ``MultiPhraseQuery`` with a
    prefix-expanded last position): the analyzed phrase must occur
    with its exact gap pattern, where the LAST emitted token is
    treated as a prefix matched by any of its first
    ``max_expansions`` dictionary expansions (term order — the Lucene
    rewrite's cap).  Returns (qid, doc_id) ordered.

    Semantics notes (documented divergence surface): the prefix seed
    is the last token the analyzer EMITS (so a trailing stopword is
    dropped and the previous token becomes the seed, as in
    ES/Lucene); the seed itself goes through the index's analyzer
    (stemming included) exactly like ES's analyzed prefix.  A query
    whose seed has no dictionary expansion matches nothing.

    Plan: one capped dictionary enumeration per distinct prefix
    (sorted-range-pruned termstats scan), then the shared
    anchor-alignment join — expansions ride as extra (term, last_off)
    rows, so count_distinct(off) == n_offs implements the
    any-expansion-at-that-position OR.  Lead gating stays on the
    EXACT offsets only (an expansion doc set is a union across
    expansion terms, so no single expansion term may gate).
    """
    opts = index.analyzer_opts()
    spark = index.spark
    exact: dict[str, list[tuple[str, int]]] = {}
    seed: dict[str, tuple[str, int]] = {}
    n_offs: dict[str, int] = {}
    for qid, text in queries:
        toks = analyze_phrase(text, **opts)
        if not toks:
            continue
        exact[qid] = toks[:-1]
        seed[qid] = toks[-1]
        n_offs[qid] = len(toks)
    if not seed:
        return spark.createDataFrame([], "qid string, doc_id long")

    exps = phrase_prefix_expansions(index, [p for p, _ in seed.values()],
                                    max_expansions)
    qrows: list[tuple[str, str, int]] = []
    for qid in seed:
        p, poff = seed[qid]
        for t, off in exact[qid]:
            qrows.append((qid, t, off))
        for t in exps.get(p, []):
            qrows.append((qid, t, poff))
    if not qrows:
        return spark.createDataFrame([], "qid string, doc_id long")

    # lead gating over EXACT terms only
    ets = sorted({t for q in exact for t, _ in exact[q]})
    dfm = index.df_map(ets) if ets else {}
    lead: dict[str, str] = {}
    for qid in n_offs:
        ts = sorted({t for t, _ in exact[qid]})
        if not ts or any(t not in dfm for t in ts):
            continue
        rare = min(ts, key=lambda t: (dfm[t], t))
        if dfm[rare] <= lead_max_df:
            lead[qid] = rare
    return _anchor_match(index, qrows, n_offs, lead)


def phrase_prefix_topk(index: Index,
                       queries: Sequence[tuple[str, str]], k: int,
                       max_expansions: int = 50) -> DataFrame:
    """match_phrase_prefix top-k: docs matching the prefix-expanded
    phrase, ranked by the BM25 term-bag of the EXACT (non-prefix)
    tokens — the prefix position gates the match set but does not
    score (documented divergence: Lucene blends expansion stats into
    the last position's weight).  A query with no exact tokens (bare
    prefix) therefore returns no rows here — use
    :func:`phrase_prefix_match` for its hit set.  Returns
    (qid, doc_id, score, rank), gate applied BEFORE the rank cut.
    """
    from .portable import round_half_up
    from .scoring import bm25_col
    from .search import _matched_postings, decode_udf

    opts = index.analyzer_opts()
    weights: dict[tuple[str, str], float] = {}
    for qid, text in queries:
        toks = analyze_phrase(text, **opts)
        for t, _ in toks[:-1]:
            weights[(qid, t)] = weights.get((qid, t), 0.0) + 1.0
    spark = index.spark
    hits = phrase_prefix_match(index, queries, max_expansions)
    if not weights:
        return spark.createDataFrame(
            [], "qid string, doc_id long, score double, rank int")
    qt = [(q, t, w) for (q, t), w in sorted(weights.items())]
    matched = _matched_postings(index, qt)
    dec = matched.withColumn("d", decode_udf("blob"))
    rows = dec.select(
        "qid", "term", "weight",
        F.explode(F.arrays_zip("d.doc_ids", "d.tfs", "d.dls")).alias("e"),
    ).select("qid", "term", "weight",
             F.col("e.doc_ids").alias("doc_id"),
             F.col("e.tfs").alias("tf"),
             F.col("e.dls").alias("dl"))
    ts = index.termstats.select("term", "df")
    qterms = spark.createDataFrame([(t,) for t in
                                    sorted({t for _, t, _ in qt})],
                                   "term string")
    rows = rows.join(F.broadcast(ts.join(qterms, "term")), "term")
    scored = rows.withColumn(
        "pscore",
        F.col("weight") * bm25_col(F.col("tf"), F.col("df"), F.col("dl"),
                                   index.avgdl, float(index.n_docs),
                                   index.stats["k1"], index.stats["b"]))
    agg = (scored.groupBy("qid", "doc_id")
           .agg(F.sum("pscore").alias("s"))
           .join(hits, ["qid", "doc_id"]))  # gate BEFORE the window
    r = round_half_up(F.col("s"), 4)
    w = Window.partitionBy("qid").orderBy(r.desc(), F.asc("doc_id"))
    return (agg.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("qid", "doc_id", r.alias("score"), "rank")
            .orderBy("qid", "rank"))


def proximity_match(index: Index,
                    queries: Sequence[tuple[str, Sequence[str]]],
                    window: int) -> DataFrame:
    """Unordered proximity retrieval: docs with an occurrence of the
    query's FIRST term at some position p such that every other term
    occurs within ``|q − p| ≤ window``. Returns (qid, doc_id) ordered.

    The anchor term is part of the query semantics (documented, so the
    DuckDB oracle and any reimplementation agree); the others join
    per-doc on (qid, doc_id) with the window predicate — row volume is
    |anchor positions| × |other positions| WITHIN each doc only.
    """
    opts = index.analyzer_opts()
    spark = index.spark

    def _an(t: str) -> str:
        toks = tokenize_texts([t], **opts)[0]
        return toks[0] if toks else ""

    qanchor: list[tuple[str, str]] = []
    qother: list[tuple[str, str]] = []
    n_other: dict[str, int] = {}
    single: list[str] = []
    for qid, terms in queries:
        ts = [x for x in (_an(t) for t in terms) if x]
        if not ts:
            continue
        qanchor.append((qid, ts[0]))
        others = sorted(set(ts[1:]) - {ts[0]})
        n_other[qid] = len(others)
        if not others:
            single.append(qid)
        for t in others:
            qother.append((qid, t))
    if not qanchor:
        return spark.createDataFrame([], "qid string, doc_id long")

    terms = sorted({t for _, t in qanchor} | {t for _, t in qother})
    pos = _positions_df(index, terms)
    adf = spark.createDataFrame(qanchor, "qid string, term string")
    anchors = (pos.join(F.broadcast(adf), "term")
               .select("qid", "doc_id", F.explode("positions").alias("p")))
    if single:
        hits_single = (anchors.where(F.col("qid").isin(single))
                       .select("qid", "doc_id").distinct())
    multi = [q for q in n_other if n_other[q] > 0]
    if multi:
        odf = spark.createDataFrame(qother, "qid string, term string")
        others = (pos.join(F.broadcast(odf), "term")
                  .select("qid", "term", "doc_id",
                          F.explode("positions").alias("q")))
        ndf = F.broadcast(spark.createDataFrame(
            [(q, n_other[q]) for q in multi], "qid string, n_other int"))
        joined = (anchors.where(F.col("qid").isin(multi))
                  .join(others, ["qid", "doc_id"])
                  .where(F.abs(F.col("q") - F.col("p")) <= window))
        hits_multi = (joined.groupBy("qid", "doc_id", "p")
                      .agg(F.count_distinct("term").alias("nmatch"))
                      .join(ndf, "qid")
                      .where(F.col("nmatch") == F.col("n_other"))
                      .select("qid", "doc_id").distinct())
    if single and multi:
        hits = hits_single.unionByName(hits_multi)
    elif single:
        hits = hits_single
    else:
        hits = hits_multi
    return hits.orderBy("qid", "doc_id")


def interval_match(index: Index,
                   queries: Sequence[tuple[str, str]],
                   max_gaps: int = 0,
                   lead_max_df: int = PHRASE_LEAD_MAX_DF) -> DataFrame:
    """Ordered interval retrieval — the ES ``intervals`` query's
    ``all_of(ordered=true, max_gaps=g)`` / Lucene
    ``Intervals.maxgaps(g, Intervals.ordered(...))`` contract
    (public semantics; the reference never issues interval queries but
    its Lucene index supports them, reference Indexer.java:30-44):
    a doc matches iff its token stream has positions
    ``p_1 < p_2 < … < p_n``, one per analyzed query term IN ORDER,
    with total gap ``(p_n − p_1) − (n − 1) ≤ max_gaps``. Positions are
    gap positions (stopwords consume a position), so a stopword between
    two matched terms costs one gap — same stream semantics as
    :func:`phrase_match`. Query-side stopwords are dropped by the
    analyzer and do not affect ``max_gaps`` (ES behavior). Returns
    (qid, doc_id) ordered.

    Plan (the 100 TB story): positions stay AS ARRAYS end-to-end —
    the bucket-pruned positional scan broadcast-joins the (qid, term,
    ord) rows, a rarest-term doc-set semi-filter gates the head terms
    (same recipe as :func:`phrase_match`), and one groupBy(qid, doc)
    assembles a per-doc ord→positions map; the ordered-chain existence
    check is a single Catalyst nested higher-order expression (for
    each p₁, greedily chain the smallest next position per ord — the
    greedy chain minimizes p_n for a fixed p₁, so existence is exact).
    Shuffle volume is one ROW per (query term, doc), never exploded
    positions; per-row work is doc-local.
    """
    opts = index.analyzer_opts()
    spark = index.spark
    qrows: list[tuple[str, str, int]] = []   # (qid, term, ord 1-based)
    n_ords: dict[str, int] = {}
    for qid, text in queries:
        toks = analyze_phrase(text, **opts)   # [(term, gap-offset)] in order
        terms = [t for t, _ in sorted(toks, key=lambda x: x[1])]
        n_ords[qid] = len(terms)
        for i, t in enumerate(terms):
            qrows.append((qid, t, i + 1))
    if not qrows:
        return spark.createDataFrame([], "qid string, doc_id long")

    terms = sorted({t for _, t, _ in qrows})
    qdf = spark.createDataFrame(qrows, "qid string, term string, ord int")
    pos = _positions_df(index, terms)
    matched = pos.join(F.broadcast(qdf), "term")

    # rarest-term lead gating (broadcastable doc-set semi-filter)
    dfm = index.df_map(terms)
    lead: dict[str, str] = {}
    for qid in n_ords:
        ts = sorted({t for q, t, _ in qrows if q == qid})
        # guard the all-stopword query (ts empty — min() would raise)
        # and any absent term (no match anyway), like phrase_prefix
        if not ts or any(t not in dfm for t in ts):
            continue
        rare = min(ts, key=lambda t: (dfm[t], t))
        if dfm[rare] <= lead_max_df and len(ts) > 1:
            lead[qid] = rare
    if lead:
        lqdf = spark.createDataFrame(
            [(q, t) for q, t in lead.items()], "qid string, term string")
        lead_docs = (_positions_df(index, sorted(set(lead.values())))
                     .join(F.broadcast(lqdf), "term")
                     .select("qid", "doc_id").distinct()
                     .withColumn("_keep", F.lit(1)))
        matched = (matched
                   .join(F.broadcast(lead_docs), ["qid", "doc_id"], "left")
                   .where(F.col("_keep").isNotNull()
                          | ~F.col("qid").isin(list(lead)))
                   .drop("_keep"))

    ndf = F.broadcast(spark.createDataFrame(
        [(q, n) for q, n in n_ords.items() if n > 0],
        "qid string, n_ords int"))
    # NOTE: a query term repeated at two ords joins the SAME positions
    # row to both ords — the map gets both keys; the strict p-ascending
    # chain then forces distinct occurrences.
    grouped = (matched.groupBy("qid", "doc_id")
               .agg(F.map_from_entries(F.collect_list(
                        F.struct("ord", "positions"))).alias("m"),
                    F.count_distinct("ord").alias("nd"))
               .join(ndf, "qid")
               .where(F.col("nd") == F.col("n_ords")))

    def _gt(p):                     # factory, not `lambda x, p=p` — the
        return lambda x: x > p      # kwarg form becomes (elem, idx) args

    def _chain_ok(n: int):
        if n == 1:
            return F.lit(True)

        def cond(p1):
            p = p1
            for i in range(2, n + 1):
                p = F.get(F.filter(F.col("m")[F.lit(i)], _gt(p)), 0)
            return F.coalesce(
                (p - p1) <= F.lit(n - 1 + max_gaps), F.lit(False))

        return F.exists(F.col("m")[F.lit(1)], cond)

    parts = []
    for n in sorted({v for v in n_ords.values() if v > 0}):
        parts.append(grouped.where(F.col("n_ords") == n)
                     .where(_chain_ok(n)).select("qid", "doc_id"))
    hits = parts[0]
    for p in parts[1:]:
        hits = hits.unionByName(p)
    # no distinct needed: grouped is unique per (qid, doc) and the
    # per-n parts are disjoint, so the union carries no duplicates
    return index.live(hits).orderBy("qid", "doc_id")


def phrase_topk(index: Index, phrases: Sequence[tuple[str, str]],
                k: int) -> DataFrame:
    """Phrase-filtered BM25 top-k (Lucene PhraseQuery analog at doc
    granularity): only docs containing the exact phrase are ranked, by
    the BM25 sum of the phrase's terms (term multiplicity = weight,
    the reference's term-bag weighting). Returns
    (qid, doc_id, score, rank) with score rounded engine-stably.

    Plan: phrase_match's anchor-alignment hit set (qid, doc_id) inner-
    joins the decoded BM25 partial scores BEFORE the top-k window — the
    window only ever sees phrase-matching docs, so top-k is exact
    within the phrase set (same guarantee as score_exhaustive's
    doc_filter, but per-query).
    """
    import numpy as np  # noqa: F401  (kept local: scoring is Catalyst)
    from pyspark.sql import Window

    from .portable import round_half_up
    from .scoring import bm25_col
    from .search import _matched_postings, decode_udf

    opts = index.analyzer_opts()
    weights: dict[tuple[str, str], float] = {}
    for qid, text in phrases:
        for t, _ in analyze_phrase(text, **opts):
            weights[(qid, t)] = weights.get((qid, t), 0.0) + 1.0
    spark = index.spark
    if not weights:
        return spark.createDataFrame(
            [], "qid string, doc_id long, score double, rank int")
    qt = [(q, t, w) for (q, t), w in sorted(weights.items())]

    hits = phrase_match(index, phrases)
    matched = _matched_postings(index, qt)
    dec = matched.withColumn("d", decode_udf("blob"))
    rows = dec.select(
        "qid", "term", "weight",
        F.explode(F.arrays_zip("d.doc_ids", "d.tfs", "d.dls")).alias("e"),
    ).select("qid", "term", "weight",
             F.col("e.doc_ids").alias("doc_id"),
             F.col("e.tfs").alias("tf"),
             F.col("e.dls").alias("dl"))
    ts = index.termstats.select("term", "df")
    qterms = spark.createDataFrame([(t,) for t in
                                    sorted({t for _, t, _ in qt})],
                                   "term string")
    rows = rows.join(F.broadcast(ts.join(qterms, "term")), "term")
    scored = rows.withColumn(
        "pscore",
        F.col("weight") * bm25_col(F.col("tf"), F.col("df"), F.col("dl"),
                                   index.avgdl, float(index.n_docs),
                                   index.stats["k1"], index.stats["b"]))
    agg = (scored.groupBy("qid", "doc_id")
           .agg(F.sum("pscore").alias("s"))
           .join(hits, ["qid", "doc_id"]))  # phrase gate BEFORE the window
    r = round_half_up(F.col("s"), 4)
    w = Window.partitionBy("qid").orderBy(r.desc(), F.asc("doc_id"))
    return (agg.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("qid", "doc_id", r.alias("score"), "rank")
            .orderBy("qid", "rank"))


def span_or_near_match(index: Index,
                       queries: Sequence[tuple[str, Sequence[str],
                                               str, int]],
                       ordered: bool = True) -> DataFrame:
    """Lucene SpanNearQuery with a SpanOrQuery clause — the canonical
    composite use of SpanOr ("any of {a1..an} near b"): spans where
    SOME or-group term occurs within ``slop`` of the other term.
    queries: (qid, or_texts, other_text, slop); ``ordered`` pins
    NearSpansOrdered (or-term first: q > p, q − p − 1 ≤ slop) vs the
    unordered reading (p ≠ q, |q − p| − 1 ≤ slop) for the whole call.

    Pinned span semantics: the OR span is the POSITION-SET UNION of
    its terms' single-term spans (SpanOrQuery's disjunction iterator,
    deduplicated — two or-terms at one position span once); pairs are
    the ALL-PAIRS enumeration — a superset of Lucene's lazy
    minimal-interval iterator, the same documented divergence class
    as span_within/interval_match. An or-group none of whose terms
    analyzes matches nothing, as does a missing other term (Lucene: a
    missing subquery spans nothing); or-terms the ANALYZER drops just
    leave the group (their clause vanishes). Gap-numbered positions
    as the phrase plan (stopwords consume a position).

    Plan: two bucket-pruned positional scans broadcast-joined to the
    query rows; the or-group union is ONE (qid, doc)-keyed agg
    (flatten + distinct + sort — arrays ride, never exploded); the
    pair test is a per-row nested HOF with the qualifying spans
    materialized in one projection and exploded in the NEXT (the
    builder pattern). Returns (qid, doc_id, span_start, span_end)
    ordered — end exclusive, one row per qualifying pair.
    Reference: search delegated to the Lucene stack that ships
    SpanOr/SpanNear (GROUP_12 SearchFiles.java:1)."""
    opts = index.analyzer_opts()
    spark = index.spark

    def _an(t: str) -> str:
        toks = tokenize_texts([t], **opts)[0]
        return toks[0] if toks else ""

    seen_qids: set[str] = set()
    or_rows, oth_rows, slop_rows = [], [], []
    for qid, or_texts, other, slop in queries:
        # the per-qid joins below (or-group agg, other-term join,
        # slop join) all assume ONE query per qid — a repeated qid
        # would silently cross-pair the duplicates (ADVICE r4)
        if qid in seen_qids:
            raise ValueError(f"span_or_near_match: duplicate qid "
                             f"{qid!r} — one query per qid")
        seen_qids.add(qid)
        ots = sorted({t for t in (_an(x) for x in or_texts) if t})
        to = _an(other)
        if not ots or not to:
            continue                # missing subquery spans nothing
        or_rows += [(qid, t) for t in ots]
        oth_rows.append((qid, to))
        slop_rows.append((qid, int(slop)))
    empty = spark.createDataFrame(
        [], "qid string, doc_id long, span_start long, span_end long")
    if not or_rows:
        return empty

    pos_or = _positions_df(index, sorted({t for _, t in or_rows}))
    odf = spark.createDataFrame(or_rows, "qid string, term string")
    grp = (pos_or.join(F.broadcast(odf), "term")
           .groupBy("qid", "doc_id")
           .agg(F.array_sort(F.array_distinct(
               F.flatten(F.collect_list("positions")))).alias("a")))
    pos_oth = _positions_df(index, sorted({t for _, t in oth_rows}))
    bdf = spark.createDataFrame(oth_rows, "qid string, term string")
    oth = (pos_oth.join(F.broadcast(bdf.distinct()), "term")
           .select("qid", "doc_id", F.col("positions").alias("b")))
    slops = spark.createDataFrame(slop_rows, "qid string, slop int")
    joined = (grp.join(oth, ["qid", "doc_id"])
              .join(F.broadcast(slops.distinct()), "qid"))
    slop = F.col("slop")

    def _ok(p):
        if ordered:
            return lambda q: (q > p) & (q - p - 1 <= slop)
        return lambda q: (q != p) & \
            (F.greatest(p, q) - F.least(p, q) - 1 <= slop)

    def _spans(p):
        return lambda q: F.struct(
            F.least(p, q).cast("long").alias("s"),
            (F.greatest(p, q) + 1).cast("long").alias("e"))

    cand = F.flatten(F.transform(
        F.col("a"),
        lambda p: F.transform(F.filter(F.col("b"), _ok(p)), _spans(p))))
    built = joined.select("qid", "doc_id", cand.alias("spans"))
    out = (built.select("qid", "doc_id", F.explode("spans").alias("sp"))
           .select("qid", "doc_id",
                   F.col("sp.s").alias("span_start"),
                   F.col("sp.e").alias("span_end")))
    return index.live(out).orderBy("qid", "doc_id", "span_start",
                                   "span_end")


def span_first_match(index: Index,
                     queries: Sequence[tuple[str, str, int]]) -> DataFrame:
    """Lucene SpanFirstQuery analog: docs whose first occurrence of the
    (analyzed) term lies within the stream's first ``limit`` positions
    — the single-term span's end (first_pos + 1) must be ≤ limit, over
    the same gap-numbered positions the phrase plan uses (stopwords
    consume a position). queries: (qid, term_text, limit).

    Plan: bucket-pruned positions scan + broadcast query join; the
    predicate is per-row (``element_at(positions, 1)`` — the build
    sorts each doc's position list ascending), so there is NO shuffle
    at all: scan → broadcast-join → filter → project.
    Returns (qid, doc_id, first_pos) ordered.
    """
    opts = index.analyzer_opts()
    qrows = []
    for qid, text, limit in queries:
        toks = tokenize_texts([text], **opts)[0]
        if toks:
            qrows.append((qid, toks[0], int(limit)))
    spark = index.spark
    if not qrows:
        return spark.createDataFrame(
            [], "qid string, doc_id long, first_pos long")
    qdf = spark.createDataFrame(qrows, "qid string, term string, lim int")
    pos = _positions_df(index, sorted({t for _, t, _ in qrows}))
    return index.live(
        pos.join(F.broadcast(qdf), "term")
            .withColumn("first_pos",
                        F.element_at("positions", 1).cast("long"))
            .where(F.col("first_pos") + 1 <= F.col("lim"))
            .select("qid", "doc_id", "first_pos")) \
        .orderBy("qid", "doc_id")


def span_not_match(index: Index,
                   queries: Sequence[tuple[str, str, str]],
                   pre: int = 0, post: int = 0) -> DataFrame:
    """Lucene SpanNotQuery analog (term-level spans, the common use):
    docs with an occurrence of the INCLUDE term at some position p
    such that NO occurrence of the EXCLUDE term lies within
    ``[p − pre, p + post]`` — "bank not near river". pre/post are
    Lucene SpanNotQuery's dilation params (0/0 = overlap-only, which
    for single-term spans means same position — never true across
    distinct terms — so callers set a window). queries:
    (qid, include_text, exclude_text); an absent exclude term means
    every include occurrence survives; an absent include term matches
    nothing. Returns (qid, doc_id) ordered.

    Plan: two bucket-pruned positional scans broadcast-joined to the
    query rows, one per-doc LEFT join (exclude lists ride as arrays),
    and a per-row nested-HOF existence check — the interval_match
    shape, arrays never exploded.
    """
    opts = index.analyzer_opts()

    def _an(t: str) -> str:
        toks = tokenize_texts([t], **opts)[0]
        return toks[0] if toks else ""

    inc_rows, exc_rows = [], []
    for qid, inc, exc in queries:
        ti, te = _an(inc), _an(exc)
        if not ti:
            continue
        inc_rows.append((qid, ti))
        if te:
            exc_rows.append((qid, te))
    spark = index.spark
    if not inc_rows:
        return spark.createDataFrame([], "qid string, doc_id long")

    pos_inc = _positions_df(index, sorted({t for _, t in inc_rows}))
    idf = spark.createDataFrame(inc_rows, "qid string, term string")
    inc = (pos_inc.join(F.broadcast(idf), "term")
           .select("qid", "doc_id", F.col("positions").alias("inc")))
    if exc_rows:
        pos_exc = _positions_df(index, sorted({t for _, t in exc_rows}))
        edf = spark.createDataFrame(exc_rows, "qid string, term string")
        exc = (pos_exc.join(F.broadcast(edf), "term")
               .select("qid", "doc_id", F.col("positions").alias("exc")))
        joined = inc.join(exc, ["qid", "doc_id"], "left")
    else:
        joined = inc.withColumn("exc",
                                F.lit(None).cast("array<int>"))
    excl = F.coalesce(F.col("exc"), F.array().cast("array<int>"))

    def _near(p):
        return lambda q: (q >= p - F.lit(int(pre))) & \
                         (q <= p + F.lit(int(post)))

    def _survives(p):
        return ~F.exists(excl, _near(p))

    hits = (joined.where(F.exists(F.col("inc"), _survives))
            .select("qid", "doc_id"))
    return index.live(hits).orderBy("qid", "doc_id")


def _span_within_joined(index: Index,
                        queries: Sequence[tuple[str, str, str, str, int]]
                        ) -> DataFrame | None:
    """Shared little/big-pair assembly for SpanWithin/SpanContaining:
    per (qid, doc), the little term's positions (``lit``) and the big
    pair's positions (``a``, ``b``) ride as arrays with the per-query
    ``slop``, via three bucket-pruned positional scans broadcast-joined
    to the query rows — the span_not shape, arrays never exploded.
    Inner joins throughout: a doc (or query) missing any of the three
    terms has no candidate spans (Lucene: a missing subquery spans
    nothing). Returns None when no query analyzes fully."""
    opts = index.analyzer_opts()

    def _an(t: str) -> str:
        toks = tokenize_texts([t], **opts)[0]
        return toks[0] if toks else ""

    qrows = []
    for qid, little, big_a, big_b, slop in queries:
        tl, ta, tb = _an(little), _an(big_a), _an(big_b)
        if tl and ta and tb:
            qrows.append((qid, tl, ta, tb, int(slop)))
    if not qrows:
        return None
    spark = index.spark

    def _side(pairs: list[tuple[str, str]], out: str) -> DataFrame:
        pos = _positions_df(index, sorted({t for _, t in pairs}))
        qdf = spark.createDataFrame(pairs, "qid string, term string")
        return (pos.join(F.broadcast(qdf.distinct()), "term")
                .select("qid", "doc_id", F.col("positions").alias(out)))

    lit = _side([(q, tl) for q, tl, _, _, _ in qrows], "lit")
    aa = _side([(q, ta) for q, _, ta, _, _ in qrows], "a")
    bb = _side([(q, tb) for q, _, _, tb, _ in qrows], "b")
    slops = spark.createDataFrame([(q, s) for q, _, _, _, s in qrows],
                                  "qid string, slop int")
    return (lit.join(aa, ["qid", "doc_id"])
            .join(bb, ["qid", "doc_id"])
            .join(F.broadcast(slops), "qid"))


def span_within_match(index: Index,
                      queries: Sequence[tuple[str, str, str, str, int]]
                      ) -> DataFrame:
    """Lucene SpanWithinQuery analog: occurrences of the LITTLE term
    that lie inside some BIG span, where big is the ordered two-term
    near span (a ... b) with ≤ ``slop`` positions between — one row
    per surviving little occurrence. queries:
    (qid, little_text, big_first_text, big_second_text, slop).

    Pinned span semantics: big spans are ALL ordered pairs (pa ∈ A,
    pb ∈ B) with pb > pa and pb − pa − 1 ≤ slop — the interval-algebra
    reading; Lucene's NearSpansOrdered is a lazy minimal-interval
    iterator that can skip an enveloping candidate pair, so the pinned
    form is a superset enumeration (documented divergence, same class
    as interval_match's). Little span [p, p+1) is within big
    [pa, pb+1) iff pa ≤ p ≤ pb. Gap-numbered positions as the phrase
    plan (stopwords consume a position).

    Plan: three bucket-pruned positional scans broadcast-joined per
    role, arrays ride per (qid, doc); the containment test is a
    per-row nested HOF (filter→exists→exists) with the survivors
    materialized in ONE projection and exploded in the NEXT (the
    builder pattern — an inlined filter would re-evaluate inside the
    Generate). No shuffle beyond the three (qid, doc)-keyed joins.
    Returns (qid, doc_id, little_pos) ordered."""
    spark = index.spark
    joined = _span_within_joined(index, queries)
    if joined is None:
        return spark.createDataFrame(
            [], "qid string, doc_id long, little_pos long")
    slop = F.col("slop")

    def _pair_covers(p):
        def _b_ok(pa):
            return lambda pb: ((pb > pa) & (pb - pa - 1 <= slop) &
                               (pb >= p))
        return lambda pa: (pa <= p) & F.exists(F.col("b"), _b_ok(pa))

    def _within(p):
        return F.exists(F.col("a"), _pair_covers(p))

    kept = joined.select(
        "qid", "doc_id", F.filter(F.col("lit"), _within).alias("keep"))
    out = (kept.select("qid", "doc_id", F.explode("keep").alias("lp"))
           .select("qid", "doc_id",
                   F.col("lp").cast("long").alias("little_pos")))
    return index.live(out).orderBy("qid", "doc_id", "little_pos")


def span_containing_match(index: Index,
                          queries: Sequence[tuple[str, str, str, str,
                                                  int]]) -> DataFrame:
    """Lucene SpanContainingQuery analog: BIG spans (the ordered
    two-term near span, as span_within_match — same pinned
    enumeration) that contain at least one LITTLE occurrence — one
    row per qualifying big span (an exists over little, so a big span
    with several littles inside emits once). queries and plan as
    span_within_match; the pair enumeration is a transform→filter
    nested HOF flattened to a span list, materialized in its own
    projection before the explode. Returns
    (qid, doc_id, big_start, big_end) ordered — end exclusive
    (pb + 1), the Lucene span convention."""
    spark = index.spark
    joined = _span_within_joined(index, queries)
    if joined is None:
        return spark.createDataFrame(
            [], "qid string, doc_id long, big_start long, big_end long")
    slop = F.col("slop")

    def _has_little(pa):
        return lambda pb: ((pb > pa) & (pb - pa - 1 <= slop) &
                           F.exists(F.col("lit"),
                                    lambda p: (pa <= p) & (p <= pb)))

    def _pairs(pa):
        return F.transform(F.filter(F.col("b"), _has_little(pa)),
                           lambda pb: F.struct(pa.alias("s"),
                                               pb.alias("e")))

    spans = joined.select(
        "qid", "doc_id",
        F.flatten(F.transform(F.col("a"), _pairs)).alias("spans"))
    out = (spans.select("qid", "doc_id",
                        F.explode("spans").alias("sp"))
           .select("qid", "doc_id",
                   F.col("sp.s").cast("long").alias("big_start"),
                   (F.col("sp.e") + 1).cast("long").alias("big_end")))
    return index.live(out).orderBy("qid", "doc_id", "big_start",
                                   "big_end")


def snippets(index: Index, hits: DataFrame,
             query_terms: Sequence[tuple[str, str]],
             width: int = 5) -> DataFrame:
    """KWIC snippet generation (Lucene highlighter analog): for each
    (qid, doc_id) hit, the ±``width``-token window around the doc's
    FIRST occurrence of any of the query's terms. Returns
    (qid, doc_id, first_pos, snippet).

    The snippet is over the ANALYZED full token stream (lowercased,
    camel/snake-split, stopwords present — the same stream positions
    index), so the window aligns exactly with the positional index;
    original-byte highlighting would need stored char offsets, which
    this index does not keep (documented divergence from Lucene's
    offset-bearing term vectors).

    Plan: positions table (bucket-pruned, broadcast query join) →
    min first position per (qid, doc) → inner join the hit set →
    join docs and slice the re-derived token array. Every step is a
    Catalyst expression; the only shuffle is the per-(qid, doc) min.
    """
    opts = index.analyzer_opts()

    def _an(t: str) -> str:
        toks = tokenize_texts([t], **opts)[0]
        return toks[0] if toks else ""

    qrows = sorted({(q, _an(t)) for q, t in query_terms if _an(t)})
    spark = index.spark
    qdf = spark.createDataFrame(qrows, "qid string, term string")
    pos = _positions_df(index, [t for _, t in qrows])
    first = (pos.join(F.broadcast(qdf), "term")
             .groupBy("qid", "doc_id")
             .agg(F.min(F.element_at("positions", 1)).alias("first_pos")))
    docs = index.docs.select("doc_id",
                             _full_tokens_col(F.col("content")).alias("toks"))
    joined = (hits.select("qid", "doc_id")
              .join(first, ["qid", "doc_id"])
              .join(docs, "doc_id"))
    start = F.greatest(F.col("first_pos") + 1 - width, F.lit(1))
    end = F.least(F.col("first_pos") + 1 + width, F.size("toks"))
    return (joined.select(
        "qid", "doc_id", "first_pos",
        F.concat_ws(" ", F.slice("toks", start, end - start + 1))
        .alias("snippet"))
        .orderBy("qid", "doc_id"))
