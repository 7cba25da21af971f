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
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
import pyspark.sql.types as T

from .index_build import load_stats, _paths
from .scoring import MU, bm25_col, idf_col, lmd_col

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
        # liveDocs: tombstoned deletes awaiting purge (engine/deletes.py)
        from .deletes import load_tombstones
        self.tombstones = load_tombstones(spark, index_dir)
        self.n_tombstones = (self.tombstones.count()
                             if self.tombstones is not None else 0)

    def live(self, df: DataFrame, col: str = "doc_id") -> DataFrame:
        """Drop tombstoned docs (the liveDocs filter every Lucene
        search applies): broadcast left_anti; no-op without deletes.
        The tombstone set stays small between purges by design."""
        if self.tombstones is None:
            return df
        t = self.tombstones
        if col != "doc_id":
            t = t.withColumnRenamed("doc_id", col)
        return df.join(F.broadcast(t), col, "left_anti")

    def dead_ids(self) -> np.ndarray | None:
        """The tombstoned doc_ids as a SORTED int64 array (memoized) —
        the liveDocs bitset the WAND kernel masks during block decode
        (engine/deletes.py uses the same recipe for purge). None when
        there are no deletes."""
        if self.tombstones is None:
            return None
        if not hasattr(self, "_dead_ids"):
            self._dead_ids = np.array(
                sorted(r["doc_id"] for r in self.tombstones.collect()),
                dtype=np.int64)
        return self._dead_ids if self._dead_ids.size else None

    @property
    def n_docs(self) -> int:
        return self.stats["n_docs"]

    @property
    def avgdl(self) -> float:
        return self.stats["avgdl"]

    def term_buckets(self, terms: Sequence[str]) -> list[int]:
        """Driver-side bucket lookup for partition pruning — a pure
        Python XXH64 replica of the JVM's xxhash64 (engine/portable.py,
        verified bit-equal in tests), so no Spark job per query."""
        from .portable import xxhash64_str

        n = int(self.stats["n_buckets"])
        return sorted({xxhash64_str(t) % n for t in set(terms)})

    def analyzer_opts(self) -> dict:
        """The index's analyzer settings as ``tokenize_texts`` kwargs —
        every query-side analyze MUST use these (stem/stemmer/fold
        mismatches silently miss the vocabulary)."""
        return {"stem": bool(self.stats.get("stem")),
                "stemmer": self.stats.get("stemmer", "porter"),
                "ascii_fold": bool(self.stats.get("ascii_fold"))}

    def df_map(self, terms: Sequence[str]) -> dict[str, int]:
        """Driver-side df lookup for a small term set (bucket-pruned),
        memoized per Index handle — the Lucene term-dictionary-in-heap
        analog (r6). Negative lookups are cached too, so repeated
        queries over the same vocabulary never re-scan the dictionary.
        Consistent with the handle's snapshot semantics: ``stats``,
        ``termstats``'s file listing and ``n_tombstones`` are equally
        frozen at construction; lifecycle ops hand out a fresh Index."""
        if not terms:
            return {}
        if not hasattr(self, "_df_memo"):
            self._df_memo: dict[str, int | None] = {}
        want = set(terms)
        missing = [t for t in want if t not in self._df_memo]
        if missing:
            buckets = self.term_buckets(missing)
            rows = (self.termstats
                    .where(F.col("bucket").isin(buckets))
                    .where(F.col("term").isin(missing))
                    .select("term", "df").collect())
            found = {r["term"]: int(r["df"]) for r in rows}
            for t in missing:
                self._df_memo[t] = found.get(t)
        return {t: v for t in want
                if (v := self._df_memo[t]) is not None}

    def ctf_map(self, terms: Sequence[str]) -> dict[str, int]:
        """Driver-side collection-term-frequency lookup (Σ tf over all
        docs) for a small term set — the LMD scale path's λ input. Read
        from the build's forward tf table, which is term-bucket
        partitioned, so the scan prunes to the query's buckets and the
        columnar read touches only (term, tf). Includes deleted-but-
        unpurged and delta postings, exactly like Lucene's frozen
        collection statistics."""
        if not terms:
            return {}
        buckets = self.term_buckets(terms)
        tf = self.spark.read.parquet(_paths(self.index_dir)["tf"])
        rows = (tf.where(F.col("bucket").isin(buckets))
                .where(F.col("term").isin(list(set(terms))))
                .groupBy("term").agg(F.sum("tf").alias("ctf")).collect())
        return {r["term"]: int(r["ctf"]) for r in rows}


_DECODE_SCHEMA = T.StructType([
    T.StructField("doc_ids", T.ArrayType(T.LongType())),
    T.StructField("tfs", T.ArrayType(T.LongType())),
    T.StructField("dls", T.ArrayType(T.LongType())),
])


@F.pandas_udf(_DECODE_SCHEMA)
def decode_udf(blobs: pd.Series) -> pd.DataFrame:
    """Vectorized posting decode: binary -> (doc_ids, tfs, dls) arrays.
    Cells stay numpy int64 arrays — Arrow converts them directly,
    skipping the per-element Python-int boxing ``tolist()`` paid
    (guide §4.2; measured ~10% off the decode stage at 1M postings)."""
    from .postings import decode_postings
    out = {"doc_ids": [], "tfs": [], "dls": []}
    for blob in blobs:
        d, t, dl = decode_postings(bytes(blob) if blob is not None else b"")
        out["doc_ids"].append(d)
        out["tfs"].append(t)
        out["dls"].append(dl)
    return pd.DataFrame(out)


def _query_df(spark: SparkSession, query_terms: QueryTerms) -> DataFrame:
    return spark.createDataFrame(
        [(q, t, float(w)) for q, t, w in query_terms],
        "qid string, term string, weight double")


# Above this many (qid, term) tuples the literal-map attach falls back
# to the broadcast join (a literal map rides the plan/task closure —
# fine for interactive batches, wrong for a 3000-term expansion run).
_LIT_QT_MAX = 256


def _attach_terms_lit(post: DataFrame, by_term: dict[str, list[tuple]],
                      fields: list[tuple[str, str]]) -> DataFrame | None:
    """Attach per-term query tuples via a LITERAL map + explode instead
    of a broadcast hash join (r6). The query side of Q4 is a handful of
    rows; the broadcast exchange still costs a separate job (collect →
    build relation → ship) of ~0.2-0.3 s on every fresh query plan. A
    ``map<term, array<struct<fields>>>`` literal with
    ``explode(element_at(map, term))`` is the same inner-join semantics
    (absent term → NULL → explode drops the row; duplicate tuples per
    term all emit) with zero extra jobs and zero exchanges. Returns
    None when the batch exceeds ``_LIT_QT_MAX`` tuples — caller falls
    back to the broadcast join.
    """
    n = sum(len(v) for v in by_term.values())
    if not by_term or n > _LIT_QT_MAX:
        return None
    terms = sorted(by_term)
    entries = [F.array(*[F.struct(*[F.lit(v).cast(ty).alias(nm)
                                    for v, (nm, ty) in zip(tup, fields)])
                         for tup in by_term[t]]) for t in terms]
    m = F.map_from_arrays(F.array(*[F.lit(t) for t in terms]),
                          F.array(*entries))
    post = (post.where(F.col("term").isin(terms))
            .withColumn("_q", F.explode(F.element_at(m, F.col("term")))))
    for nm, _ in fields:
        post = post.withColumn(nm, F.col(f"_q.{nm}"))
    return post.drop("_q")


def _matched_postings(index: Index, query_terms: QueryTerms) -> DataFrame:
    """Postings rows for the query's terms, partition-pruned, with the
    query tuples attached by literal map (small batches — no broadcast
    job) or broadcast join (SURVEY.md Q4: the tiny side is always the
    query)."""
    buckets = index.term_buckets([t for _, t, _ in query_terms])
    post = index.postings.where(F.col("bucket").isin(buckets))
    by_term: dict[str, list[tuple]] = {}
    for q, t, w in query_terms:
        by_term.setdefault(t, []).append((q, float(w)))
    lit = _attach_terms_lit(post, by_term,
                            [("qid", "string"), ("weight", "double")])
    if lit is not None:
        return lit
    qt = _query_df(index.spark, query_terms)
    return post.join(F.broadcast(qt), "term")


def _decoded_rows_with_df(index: Index,
                          query_terms: QueryTerms) -> DataFrame:
    """The exhaustive scorers' shared front half: bucket-pruned
    postings ⨝ broadcast query terms → vectorized decode → explode,
    with ``df`` riding the query-terms broadcast from the driver-side
    memoized dictionary lookup (r6) instead of a per-query termstats
    scan + second broadcast join — one less job and one less exchange
    per query. Terms absent from the dictionary have no postings, so
    their df=0 placeholder rows join nothing (exactly what the old
    inner join against termstats produced). liveDocs NOT applied —
    callers decide (LMD needs collection stats before masking)."""
    dfm = index.df_map(sorted({t for _, t, _ in query_terms}))
    buckets = index.term_buckets([t for _, t, _ in query_terms])
    post = index.postings.where(F.col("bucket").isin(buckets))
    by_term: dict[str, list[tuple]] = {}
    for q, t, w in query_terms:
        by_term.setdefault(t, []).append((q, float(w),
                                          int(dfm.get(t, 0))))
    matched = _attach_terms_lit(
        post, by_term,
        [("qid", "string"), ("weight", "double"), ("df", "long")])
    if matched is None:
        qt = index.spark.createDataFrame(
            [(q, t, float(w), int(dfm.get(t, 0)))
             for q, t, w in query_terms],
            "qid string, term string, weight double, df long")
        matched = post.join(F.broadcast(qt), "term")
    dec = matched.withColumn("d", decode_udf("blob"))
    return dec.select(
        "qid", "term", "weight", "df",
        F.explode(F.arrays_zip("d.doc_ids", "d.tfs", "d.dls")).alias("e"),
    ).select(
        "qid", "term", "weight", "df",
        F.col("e.doc_ids").alias("doc_id"),
        F.col("e.tfs").alias("tf"),
        F.col("e.dls").alias("dl"),
    )


def score_exhaustive(index: Index, query_terms: QueryTerms,
                     k: int | None,
                     include_docno: bool = False,
                     k1: float | None = None,
                     b: float | None = None,
                     doc_filter: DataFrame | None = None,
                     norms: str = "exact") -> DataFrame:
    """Weighted-OR BM25 top-k, scoring every matching document.

    ``k1``/``b`` override the index's pinned BM25 constants at query
    time (the sweep harness's knob — exact scoring never reads the
    build-frozen block_max_w, only WAND's pruning bounds do).

    ``doc_filter``: optional DataFrame with a ``doc_id`` column — the
    Lucene FILTER-clause equivalent: only docs in the set are scored
    and ranked (top-k is exact WITHIN the filtered set, not a post-
    filter of the unfiltered top-k). Applied as a semi-join on the
    decoded posting rows before aggregation, so AQE broadcasts a
    selective filter and the top-k window never sees excluded docs.

    ``norms='lucene'``: score with Lucene's 1-byte SmallFloat
    length quantization (engine/scoring.py:lucene_norm_dl) instead of
    the engine's exact doc lengths — the parity mode that isolates the
    norm component of the engine-vs-Lucene score delta.
    Returns (qid, doc_id, score, rank) ordered by qid, rank.
    """
    rows = index.live(_decoded_rows_with_df(index, query_terms))
    if doc_filter is not None:
        rows = rows.join(doc_filter.select("doc_id").distinct(),
                         "doc_id", "left_semi")
    dl_col = F.col("dl")
    if norms == "lucene":
        from .scoring import lucene_norm_dl
        dl_col = lucene_norm_dl(dl_col)
    scored = rows.withColumn(
        "pscore",
        F.col("weight") * bm25_col(F.col("tf"), F.col("df"), dl_col,
                                   index.avgdl, float(index.n_docs),
                                   k1 if k1 is not None else index.stats["k1"],
                                   b if b is not None else index.stats["b"]))
    agg = scored.groupBy("qid", "doc_id").agg(F.sum("pscore").alias("score"))
    if k is None:
        if include_docno:
            raise ValueError(
                "score_exhaustive: include_docno is not supported with "
                "k=None (the no-cut form returns the bare scored agg)")
        # the no-cut form (top_hits / field_value_factor consume the
        # full scored match set): skip the per-qid sort + rank window
        # a cut would need — callers window on their own keys instead
        return agg
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_id"))
    out = (agg.withColumn("rank", F.row_number().over(w))
           .where(F.col("rank") <= k)
           .select("qid", "doc_id", "score", "rank"))
    if include_docno:
        out = out.join(index.docs.select("doc_id", "docno"), "doc_id") \
                 .select("qid", "doc_id", "docno", "score", "rank")
    return out.orderBy("qid", "rank")


def score_lmd(index: Index, query_terms: QueryTerms, k: int,
              mu: float = MU, include_docno: bool = False,
              pair_filter: DataFrame | None = None) -> DataFrame:
    """Weighted-OR **LMDirichlet** top-k — the reference's published
    alternative similarity (Lucene LMDirichletSimilarity, GROUP_12.pdf
    §5.2.2; formula pinned in engine/scoring.py:lmd_col).

    The collection term frequency ctf(t) is not stored in termstats; it
    is recovered exactly from the matched postings themselves — the
    weighted-OR plan already decodes the full posting list of every
    query term, so ``Σ tf`` over a (qid, term) window IS ctf(t). One
    window shuffle keyed like the downstream (qid, doc) aggregate; at
    cluster scale this path shares the exhaustive plan's shape (the
    correctness baseline — WAND remains the pruned scale path for BM25).

    ``pair_filter``: optional (qid, doc_id) DataFrame restricting
    SCORING to those pairs (the rescore-window gate).  Applied AFTER
    the ctf window — collection statistics must come from the full
    posting lists, not the window — and before the (qid, doc) sum, so
    a selective window broadcasts and the aggregate never sees
    out-of-window docs.
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
    wt = Window.partitionBy("qid", "term")
    rows = rows.withColumn("ctf", F.sum("tf").over(wt))
    # liveDocs AFTER the ctf window: Lucene keeps deleted docs in the
    # collection statistics until their segments merge
    rows = index.live(rows)
    if pair_filter is not None:
        rows = rows.join(pair_filter.select("qid", "doc_id").distinct(),
                         ["qid", "doc_id"], "left_semi")
    total_tokens = float(index.stats["total_tokens"])
    scored = rows.withColumn(
        "pscore",
        F.col("weight") * lmd_col(F.col("tf"), F.col("ctf"), F.col("dl"),
                                  total_tokens, mu))
    agg = scored.groupBy("qid", "doc_id").agg(F.sum("pscore").alias("score"))
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_id"))
    out = (agg.withColumn("rank", F.row_number().over(w))
           .where(F.col("rank") <= k)
           .select("qid", "doc_id", "score", "rank"))
    if include_docno:
        out = out.join(index.docs.select("doc_id", "docno"), "doc_id") \
                 .select("qid", "doc_id", "docno", "score", "rank")
    return out.orderBy("qid", "rank")


def rescore_topk(index: Index, queries_first: QueryTerms,
                 queries_second: QueryTerms, k: int, window: int = 50,
                 query_weight: float = 1.0, rescore_weight: float = 1.0,
                 mu: float = MU, overfetch: int = 20) -> DataFrame:
    """Query rescoring (Lucene ``QueryRescorer`` / the Elasticsearch
    ``rescore`` window): rank the corpus with the CHEAP pruned
    first-pass query (the sharded block-max WAND kernel), re-score
    only the top-``window`` docs per query with the expensive second
    query (LMDirichlet here — the engine's heavyweight similarity),
    and combine

        score = query_weight·first + rescore_weight·second

    (the QueryRescorer combine; window docs the rescore query does not
    match keep only the first term — Lucene's convention).  This is
    the production recipe for expensive scorers at scale: the second
    pass touches ``window × |queries|`` docs, never the corpus — the
    (qid, doc) window broadcasts into the rescore decode while WAND
    does the corpus-scale pruning.  ``k ≤ window`` required (ES:
    rescore re-orders the window; docs below it are never re-ranked).

    House determinism: window membership by ROUNDED first score
    (overfetch, then rounded re-rank), rescore scores rounded before
    the combine, final rank on the rounded combination.
    Returns (qid, doc_id, score, rank) ordered by qid, rank.
    """
    from .portable import round_half_up

    assert k <= window, "rescore never re-ranks below its window"
    first_raw = score_wand(index, queries_first, window + overfetch)
    r4 = round_half_up(F.col("score"), 4)
    wv = Window.partitionBy("qid").orderBy(r4.desc(), F.asc("doc_id"))
    first = (first_raw.withColumn("_r", F.row_number().over(wv))
             .where(F.col("_r") <= window)
             .select("qid", "doc_id", r4.alias("s1")))
    second = score_lmd(index, queries_second, k=window, mu=mu,
                       pair_filter=first.select("qid", "doc_id"))
    s2 = round_half_up(F.col("score"), 4)
    comb = (first.join(second.select("qid", "doc_id", s2.alias("s2")),
                       ["qid", "doc_id"], "left")
            .withColumn("c",
                        F.lit(float(query_weight)) * F.col("s1") +
                        F.lit(float(rescore_weight)) *
                        F.coalesce(F.col("s2"), F.lit(0.0))))
    rc = round_half_up(F.col("c"), 4)
    w = Window.partitionBy("qid").orderBy(rc.desc(), F.asc("doc_id"))
    return (comb.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("qid", "doc_id", rc.alias("score"), "rank")
            .orderBy("qid", "rank"))


def score_ib(index: Index, query_terms: QueryTerms, k: int,
             c: float | None = None,
             include_docno: bool = False) -> DataFrame:
    """Weighted-OR **Information-Based** top-k — the reference's
    §5.2.2 "BM25 + IB Hybrid" component (GROUP_12.pdf; Lucene
    IBSimilarity, pinned to DistributionLL·LambdaDF·NormalizationH2
    in engine/scoring.py:ib_col since the paper omits the component
    choice). Same plan shape as :func:`score_exhaustive`: bucket-
    pruned broadcast-join scan → decode → column math → (qid, doc)
    sum → per-query top-k window."""
    from .scoring import IB_C, ib_col

    rows = index.live(_decoded_rows_with_df(index, query_terms))
    scored = rows.withColumn(
        "pscore",
        F.col("weight") * ib_col(F.col("tf"), F.col("df"), F.col("dl"),
                                 index.avgdl, float(index.n_docs),
                                 c if c is not None else IB_C))
    agg = scored.groupBy("qid", "doc_id").agg(F.sum("pscore").alias("score"))
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_id"))
    out = (agg.withColumn("rank", F.row_number().over(w))
           .where(F.col("rank") <= k)
           .select("qid", "doc_id", "score", "rank"))
    if include_docno:
        out = out.join(index.docs.select("doc_id", "docno"), "doc_id") \
                 .select("qid", "doc_id", "docno", "score", "rank")
    return out.orderBy("qid", "rank")


BOOLEAN_LEAD_MAX_DF = 100_000  # broadcastable lead-list bound (~0.8 MB)
# engage gating only when the OTHER lists would shuffle at least this
# many postings — below it the extra lead-decode job costs more than
# the shuffle it saves (pure small-scale latency; at cluster scale any
# head-term query clears this instantly)
BOOLEAN_LEAD_MIN_SAVED = 250_000


def boolean_and(index: Index, queries: Sequence[tuple[str, Sequence[str]]],
                lead_max_df: int = BOOLEAN_LEAD_MAX_DF,
                lead_min_saved: int = BOOLEAN_LEAD_MIN_SAVED) -> DataFrame:
    """Conjunctive (AND) retrieval: docs containing ALL query terms
    (north-rule Q13; posting-list intersection as a count-match agg).

    Lead-term gating (the classic shortest-list-first intersection,
    distributed): when a query's rarest term has df ≤ ``lead_max_df``,
    its doc set is decoded once and BROADCAST as an (qid, doc_id)
    filter semi-joined against the other lists' exploded postings
    BEFORE the count-match shuffle — the shuffle then carries at most
    |lead| × n_terms rows instead of Σ df. Queries whose rarest term
    is still huge fall back to the plain count-match plan (their
    intersection is inherently big). Returns (qid, doc_id) ordered.
    """
    qt = [(q, t, 1.0) for q, terms in queries for t in set(terms)]
    n_terms = {q: len(set(terms)) for q, terms in queries}
    dfm = index.df_map([t for _, t, _ in qt])
    lead: dict[str, str] = {}
    for q, terms in queries:
        ts = [t for t in set(terms) if t in dfm]
        if len(ts) < len(set(terms)):
            continue  # a term is absent from the index → empty result
        rare = min(ts, key=lambda t: (dfm[t], t))
        saved = sum(dfm[t] for t in ts) - dfm[rare]
        if dfm[rare] <= lead_max_df and len(ts) > 1 \
                and saved >= lead_min_saved:
            lead[q] = rare
    matched = _matched_postings(index, qt)
    dec = matched.withColumn("d", decode_udf("blob"))
    rows = index.live(dec.select("qid", "term",
                                 F.explode("d.doc_ids").alias("doc_id")))
    if lead:
        # decode ONLY the (small) lead lists for the broadcast filter —
        # never the full matched set — then gate the main decode in a
        # single pass: one broadcast left join + filter (a semi/anti
        # branch pair would re-evaluate the decode subtree per branch)
        lead_qt = [(q, t, 1.0) for q, t in lead.items()]
        lead_dec = _matched_postings(index, lead_qt) \
            .withColumn("d", decode_udf("blob"))
        lead_docs = (lead_dec
                     .select("qid", F.explode("d.doc_ids").alias("doc_id"))
                     .distinct()
                     .withColumn("_keep", F.lit(1)))
        rows = (rows.join(F.broadcast(lead_docs), ["qid", "doc_id"], "left")
                .where(F.col("_keep").isNotNull()
                       | ~F.col("qid").isin(list(lead)))
                .drop("_keep"))
    nt = F.broadcast(index.spark.createDataFrame(
        list(n_terms.items()), "qid string, n_terms int"))
    # plain count, NOT count_distinct (r6): (qid, term, doc_id) rows
    # are unique by construction — qt dedups terms per query, a blob's
    # doc_ids are strictly increasing, salts partition doc_ids
    # disjointly, and (term, doc_id) is an index-wide invariant
    # verify_index checks — so the counts are equal and the plain
    # count map-side-combines instead of planning the two-phase
    # distinct aggregate (the significant_terms argument).
    hits = (rows.groupBy("qid", "doc_id")
            .agg(F.count(F.lit(1)).alias("nmatch"))
            .join(nt, "qid")
            .where(F.col("nmatch") == F.col("n_terms"))
            .select("qid", "doc_id"))
    return hits.orderBy("qid", "doc_id")


# ---------------------------------------------------------------------------
# Block-max WAND path (doc-sharded, decode-skipping)
# ---------------------------------------------------------------------------
#
# Two distributed stages (SURVEY.md Q14; replaces what Lucene's
# BlockMaxWAND does inside one JVM at reference Searcher.java:45,77):
#
#   1. shard-slice (mapInPandas, narrow): each matched posting row is
#      byte-sliced — NO decode — into per-doc-shard runs of blocks using
#      the index's per-block byte offsets. Shard s covers doc_ids
#      [s·R, (s+1)·R); a block straddling a boundary is emitted to both
#      shards and the kernel filters decoded docs to its own range.
#   2. per-(qid, shard) BMW kernel (applyInPandas): every shard holds
#      ALL the query's terms restricted to its doc range, so its local
#      top-k is exact for its docs; a tiny global window merges the
#      n_shards × k candidates.
#
# This bounds per-task memory to (matched bytes / n_shards) — a query
# containing the most frequent term never pulls the whole posting list
# into one executor — and the kernel genuinely SKIPS decode of blocks
# whose upper-bound sum is below the running threshold θ.

_SLICE_SCHEMA = T.StructType([
    T.StructField("qid", T.StringType()),
    T.StructField("shard", T.IntegerType()),
    T.StructField("wgt", T.DoubleType()),        # clause multiplier
    T.StructField("kind", T.IntegerType()),      # scorer: 0 bm25/1 lmd/2 ib
    T.StructField("p1", T.DoubleType()),         # scorer params (see
    T.StructField("p2", T.DoubleType()),         #   _contrib_np)
    T.StructField("payload", T.BinaryType()),    # block run, byte-sliced
    T.StructField("counts", T.ArrayType(T.LongType())),
    T.StructField("block_last", T.ArrayType(T.LongType())),
    T.StructField("block_ub", T.ArrayType(T.DoubleType())),
    T.StructField("block_off", T.ArrayType(T.LongType())),  # rebased to 0
    T.StructField("base", T.LongType()),         # docID base of the run
    T.StructField("codec", T.IntegerType()),
    T.StructField("n_shards", T.IntegerType()),
    T.StructField("shard_rows", T.LongType()),
    # boolean-clause channel (all 0/-1/0 for plain weighted-OR):
    T.StructField("role", T.IntegerType()),      # 0 SHOULD / 1 MUST / 2 NOT
    T.StructField("gid", T.IntegerType()),       # must-term group id
    T.StructField("n_must", T.IntegerType()),    # query's distinct must count
])

# scorer kinds for the generic kernel (VERDICT r2 item 3: one sharded
# block-max path for every similarity, not just BM25)
KIND_BM25 = 0   # p1 = k1*(1-b), p2 = k1*b/avgdl   (field-local stats OK)
KIND_LMD = 1    # p1 = mu*(ctf+1)/(C+1), p2 = mu
KIND_IB = 2     # p1 = c*avgdl, p2 = (df+1)/(N+1)


def _contrib_np(kind: int, tf: np.ndarray, dl: np.ndarray,
                p1: float, p2: float) -> np.ndarray:
    """Unweighted per-posting contribution of one list (dispatch on
    scorer kind). Single source shared by the kernel, the θ seeds and
    the slice-stage bound check; formulas pinned in engine/scoring.py.
    """
    tf = tf.astype(np.float64)
    dl = dl.astype(np.float64)
    if kind == KIND_BM25:
        return tf / (tf + p1 + p2 * dl)
    if kind == KIND_LMD:
        return np.maximum(
            np.log(1.0 + tf / p1) + np.log(p2 / (dl + p2)), 0.0)
    return np.log2(1.0 + tf * np.log2(1.0 + p1 / dl) / p2)


def _block_ub_np(kind: int, bmt: np.ndarray, bmw: np.ndarray,
                 p1: float, p2: float) -> np.ndarray:
    """Per-block upper bound of the unweighted contribution.

    BM25 reuses the build-frozen ``block_max_w`` (exact bound under
    the list's own index stats — per-field indexes bake their own).
    LMD/IB derive a bound from ``block_max_tf``: both formulas are
    increasing in tf and decreasing in dl, and every posting satisfies
    dl ≥ tf, so the feasible max over the block is at tf = dl =
    block_max_tf — evaluate the formula there (LMD additionally uses
    that its dl=tf diagonal is increasing because p ≤ 1; IB because
    x·log2(1+A/x) is increasing)."""
    if kind == KIND_BM25:
        return bmw
    return _contrib_np(kind, bmt, bmt, p1, p2)


def _make_slice_fn():
    """mapInPandas fn: matched posting row → ≤ n_shards block runs.
    Shard count and width are PER QUERY (columns joined in from the
    query side): a small query stays in one shard — one kernel task,
    full-strength local seed — while a head-term query fans out.
    Emits the scorer-aware per-block upper bound (``block_ub``) so the
    kernel is similarity-agnostic."""

    def slice_rows(batches):
        from .postings import block_counts, split_payload

        for pdf in batches:
            out: dict[str, list] = {f.name: [] for f in _SLICE_SCHEMA.fields}
            for i in range(len(pdf)):
                blob = bytes(pdf["blob"].iloc[i])
                if not blob:
                    continue
                codec, n, bs, payload = split_payload(blob)
                bl = np.asarray(pdf["block_last"].iloc[i], dtype=np.int64)
                kind = int(pdf["kind"].iloc[i])
                p1 = float(pdf["p1"].iloc[i])
                p2 = float(pdf["p2"].iloc[i])
                bmw = np.asarray(pdf["block_max_w"].iloc[i], dtype=np.float64)
                bmt = np.asarray(pdf["block_max_tf"].iloc[i], dtype=np.float64)
                ub = _block_ub_np(kind, bmt, bmw, p1, p2)
                off = np.asarray(pdf["block_off"].iloc[i], dtype=np.int64)
                counts = block_counts(n, bs)
                n_shards = int(pdf["n_shards"].iloc[i])
                shard_rows = int(pdf["shard_rows"].iloc[i])
                prev = np.concatenate(([np.int64(-1)], bl[:-1]))
                s_lo = np.maximum(prev + 1, 0) // shard_rows
                s_hi = bl // shard_rows
                qid = pdf["qid"].iloc[i]
                wgt = float(pdf["wgt"].iloc[i])
                role = int(pdf["role"].iloc[i])
                gid = int(pdf["gid"].iloc[i])
                n_must = int(pdf["n_must"].iloc[i])
                # the LAST shard is unbounded above so docs past the
                # nominal n_docs (e.g. streaming delta segments under
                # frozen base stats) still land in a shard
                s_lo = np.minimum(s_lo, n_shards - 1)
                s_hi = np.minimum(s_hi, n_shards - 1)
                for s in range(int(s_lo[0]), int(s_hi[-1]) + 1):
                    hit = np.flatnonzero((s_lo <= s) & (s_hi >= s))
                    if hit.size == 0:
                        continue
                    lo_b, hi_b = int(hit[0]), int(hit[-1]) + 1
                    out["qid"].append(qid)
                    out["shard"].append(s)
                    out["wgt"].append(wgt)
                    out["kind"].append(kind)
                    out["p1"].append(p1)
                    out["p2"].append(p2)
                    out["payload"].append(
                        payload[off[lo_b]:off[hi_b]].tobytes())
                    out["counts"].append(counts[lo_b:hi_b])
                    out["block_last"].append(bl[lo_b:hi_b])
                    out["block_ub"].append(ub[lo_b:hi_b])
                    out["block_off"].append(off[lo_b:hi_b + 1] - off[lo_b])
                    out["base"].append(int(bl[lo_b - 1]) if lo_b > 0 else 0)
                    out["codec"].append(codec)
                    out["n_shards"].append(n_shards)
                    out["shard_rows"].append(shard_rows)
                    out["role"].append(role)
                    out["gid"].append(gid)
                    out["n_must"].append(n_must)
            yield pd.DataFrame(out)

    return slice_rows


def _in_sorted(values: np.ndarray, sorted_arr: np.ndarray) -> np.ndarray:
    """Membership mask of ``values`` in a SORTED unique int array —
    O(n log m) searchsorted, cheaper than np.isin's per-call sort when
    the same array is probed once per decoded block."""
    pos = np.searchsorted(sorted_arr, values)
    pos_c = np.minimum(pos, sorted_arr.size - 1)
    return (pos < sorted_arr.size) & (sorted_arr[pos_c] == values)


def _runs(sorted_ids: np.ndarray) -> list[tuple[int, int]]:
    """Consecutive runs [i, j) in a sorted unique int array."""
    if sorted_ids.size == 0:
        return []
    breaks = np.flatnonzero(np.diff(sorted_ids) > 1)
    starts = np.concatenate(([0], breaks + 1))
    ends = np.concatenate((breaks + 1, [sorted_ids.size]))
    return [(int(sorted_ids[s]), int(sorted_ids[e - 1]) + 1)
            for s, e in zip(starts, ends)]


def _bmw_kernel(pdf: pd.DataFrame, k: int, thetas: dict[str, float],
                emit: str = "topk",
                dead: np.ndarray | None = None,
                ub_shift: float = 0.0,
                quantize: bool = False) -> pd.DataFrame:
    """Block-max top-k over ONE (query, doc-shard) group — a
    MaxScore/block-max-WAND hybrid that provably skips decode:

    1. θ = max(shared global seed from ``thetas`` — threshold sharing
       across shards — and a local seed: fully decode the single
       strongest list; its k-th largest exact contribution lower-bounds
       the true k-th total score).
    2. MaxScore split (Turtle & Flood): sort lists ascending by their
       max upper bound; the longest prefix with Σ ub < θ is
       NON-ESSENTIAL — a doc absent from every essential list totals
       < θ and can never reach the top-k.
    3. decode essential lists; candidate docs get a potential =
       exact essential total + Σ non-essential block-max ub at that
       doc (block-level WAND bound). potential < θ → pruned. The
       surviving partial totals re-tighten θ.
    4. decode ONLY the non-essential blocks that contain a surviving
       candidate (consecutive runs); every other block is never
       touched. Exact totals; top-k by (-score, doc_id).

    ``emit='stats'`` returns decode/skip counters instead of hits.
    ``dead``: sorted tombstoned doc_ids (liveDocs mask) — dead docs
    are dropped AT DECODE, so the kernel's k stays k under any delete
    volume (VERDICT r2: the previous k + |tombstones| overfetch built
    degenerate heaps when deletes were large).

    ``ub_shift`` ≥ 0 makes the kernel sound under a BOUNDED ADDITIVE
    per-doc feature term (ES rank_feature saturation/sigmoid,
    distance_feature): total(d) = bm25(d) + f(d) with 0 ≤ f(d) ≤ shift,
    so UB_total = UB_bm25 + shift and every θ-comparison relaxes by
    ``shift``. θ itself still tightens from exact bm25 partials — a
    valid lower bound on the k-th TOTAL since f ≥ 0. With a shift the
    caller must use ``emit='cands'``: return ALL candidates whose
    exact bm25 ≥ θ − shift (a low-bm25/high-feature doc can still win
    the total ranking, so a bm25 top-k cut here would be unsound); the
    caller joins the feature and ranks the totals outside.

    ``quantize`` (r5, the simple_query_string fast path): every
    decoded contribution is quantized ONCE to int64 micro-units
    (floor(c·1e6 + 0.5) kept as integer-valued float64 — sums of
    which are EXACT below 2^53), making the per-doc total
    association-free and bit-identical to the tree plan's / DuckDB
    oracle's integer accumulation (the repo's cross-engine float
    recipe). All bounds, seeds and θ values scale ×1e6 to match;
    emitted scores divide back once. Quantization can EXCEED the true
    contribution by ≤0.5 µu per list, so callers must pass
    ``ub_shift ≥ 1e-3`` (= 1000 µu ≫ 0.5·n_lists) — the same relaxed
    comparisons as the feature path keep pruning sound, and the float
    bounds themselves stay un-quantized upper bounds.
    """
    from .postings import decode_run

    qid = pdf["qid"].iloc[0]
    shard = int(pdf["shard"].iloc[0])
    n_shards = int(pdf["n_shards"].iloc[0])
    shard_rows = int(pdf["shard_rows"].iloc[0])
    lo = shard * shard_rows
    hi = (shard + 1) * shard_rows if shard < n_shards - 1 else np.iinfo(
        np.int64).max  # last shard unbounded (see slice fn)

    nrows = len(pdf)
    scale = 1e6 if quantize else 1.0
    wgts = pdf["wgt"].to_numpy(dtype=np.float64)
    kinds = pdf["kind"].to_numpy(dtype=np.int64)
    p1s = pdf["p1"].to_numpy(dtype=np.float64)
    p2s = pdf["p2"].to_numpy(dtype=np.float64)
    # negative list weights (possible under stale stats, e.g. a frozen
    # base index searched with delta segments where df > n): their
    # contribution wgt·w with w ≥ 0 bounded by the BM25 w ≤ 1 case is
    # bounded ABOVE by 0 and BELOW by wgt·w_max; for LMD/IB w is
    # unbounded by 1 but the ubs→0 handling below stays sound because
    # tighten() only ever uses the floors for wgt < 0 lists whose
    # maximum possible contribution is ≤ 0... the conservative floor
    # is wgt * max block ub (≥ true minimum) — computed per list.
    ubs_raw = [np.asarray(pdf["block_ub"].iloc[i], dtype=np.float64)
               for i in range(nrows)]
    neg_floor_each = np.array([
        scale * wgts[i] * float(ubs_raw[i].max() if ubs_raw[i].size else 0.0)
        if wgts[i] < 0 else 0.0
        for i in range(nrows)])
    neg_floor_total = float(neg_floor_each.sum())
    bls = [np.asarray(pdf["block_last"].iloc[i], dtype=np.int64)
           for i in range(nrows)]
    ubs = [scale * wgts[i] * ubs_raw[i] if wgts[i] > 0 else
           np.zeros(ubs_raw[i].size)
           for i in range(nrows)]
    offs = [np.asarray(pdf["block_off"].iloc[i], dtype=np.int64)
            for i in range(nrows)]
    cnts = [np.asarray(pdf["counts"].iloc[i], dtype=np.int64)
            for i in range(nrows)]
    blocks_total = int(sum(b_.size for b_ in bls))
    postings_total = int(sum(c.sum() for c in cnts))
    blocks_decoded = 0
    postings_scored = 0

    def decode_row_blocks(i: int, block_ids: np.ndarray):
        """Decode selected blocks of row i (grouped into runs);
        returns (docs, contribs) filtered to the shard range."""
        nonlocal blocks_decoded, postings_scored
        payload = np.frombuffer(bytes(pdf["payload"].iloc[i]), dtype=np.uint8)
        codec = int(pdf["codec"].iloc[i])
        base0 = int(pdf["base"].iloc[i])
        bl, off, counts = bls[i], offs[i], cnts[i]
        dparts, cparts = [], []
        for r_lo, r_hi in _runs(block_ids):
            base = int(bl[r_lo - 1]) if r_lo > 0 else base0
            d, tf, dl = decode_run(payload[off[r_lo]:off[r_hi]],
                                   counts[r_lo:r_hi], codec, base)
            blocks_decoded += r_hi - r_lo
            keep = (d >= lo) & (d < hi)
            if dead is not None:
                keep &= ~_in_sorted(d, dead)     # liveDocs at decode
            if not keep.all():
                d, tf, dl = d[keep], tf[keep], dl[keep]
            if d.size:
                w = _contrib_np(int(kinds[i]), tf, dl, p1s[i], p2s[i])
                c = wgts[i] * w
                if quantize:    # int64-µu recipe: exact float64 sums
                    c = np.floor(c * 1e6 + 0.5)
                dparts.append(d)
                cparts.append(c)
                postings_scored += int(d.size)
        if not dparts:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        return np.concatenate(dparts), np.concatenate(cparts)

    # 1. θ: shared global seed (threshold sharing) + local strongest list.
    # A doc's total ≥ its seed contribution + Σ other lists' negative
    # floors, so the seed θ is shifted by that floor (exact 0 shift in
    # the normal all-positive case). Under quantize, the float seed
    # scales into µu — it may overshoot the quantized k-th total by
    # ≤0.5 µu per list, which the (scaled) ub_shift relaxation covers.
    theta = float(thetas.get(qid, -np.inf)) * scale
    ub_shift = ub_shift * scale
    list_ub = np.array([u.max() if u.size else -np.inf for u in ubs])
    seed_i = int(np.argmax(list_ub))
    decoded: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    decoded[seed_i] = decode_row_blocks(seed_i, np.arange(bls[seed_i].size))
    seed_c = decoded[seed_i][1]
    if seed_c.size >= k:
        kth = np.partition(seed_c, seed_c.size - k)[seed_c.size - k]
        theta = max(theta,
                    kth + (neg_floor_total - neg_floor_each[seed_i]))

    # 2. MaxScore essential / non-essential split (a doc absent from
    # every essential list totals < cum + ub_shift, hence the relax)
    order = np.argsort(list_ub, kind="stable")
    cum = np.cumsum(list_ub[order])
    ness_mask = np.zeros(nrows, dtype=bool)
    ness_mask[order[cum < theta - ub_shift]] = True
    ness_mask[seed_i] = False  # already decoded — keep it essential
    essential = [i for i in range(nrows) if not ness_mask[i]]
    non_essential = [i for i in range(nrows) if ness_mask[i]]

    # 3. incremental block-max pruning WITHIN essential lists.
    # Elementary doc segments come from the union of all block
    # boundaries. Essential lists decode one at a time in DESCENDING
    # upper-bound order; before each list, every segment gets the bound
    #   max-partial-so-far(seg) + Σ_{undecoded lists} block-ub(seg)
    # which upper-bounds the total score of ANY doc in the segment
    # (decoded docs carry their exact partial; unseen docs carry 0;
    # negative lists carry ub 0 ≥ their true contribution). Segments
    # below the RISING θ die globally; a block is decoded only if it
    # still covers a live segment. θ rises after each list from the
    # k-th best partial + the undecoded lists' negative floors — this
    # is the compounding threshold that makes doc-at-a-time BMW skip.
    boundaries = np.unique(np.concatenate(bls))
    nseg = boundaries.size
    seg_map = []
    for i in range(nrows):
        idx = np.searchsorted(bls[i], boundaries, side="left")
        valid = idx < bls[i].size
        seg_map.append((idx, valid))

    def seg_ub_of(i: int) -> np.ndarray:
        idx, valid = seg_map[i]
        out = np.zeros(nseg)
        out[valid] = ubs[i][idx[valid]]
        return out

    order_ess = sorted(essential, key=lambda i: -list_ub[i])
    alive = np.ones(nseg, dtype=bool)
    undecoded = [i for i in range(nrows) if i != seed_i]
    rem_ub = np.zeros(nseg)
    for j in undecoded:
        rem_ub += seg_ub_of(j)
    acc_docs, acc_part = decoded[seed_i]

    def tighten(theta: float) -> float:
        if acc_part.size >= k:
            kth = np.partition(acc_part, acc_part.size - k)[
                acc_part.size - k]
            floor = float(sum(neg_floor_each[j] for j in undecoded))
            theta = max(theta, kth + floor)
        return theta

    theta = tighten(theta)
    for i in order_ess:
        if i == seed_i:
            continue
        seg_max = np.zeros(nseg)  # 0 = partial of any unseen doc
        if acc_docs.size:
            dseg = np.searchsorted(boundaries, acc_docs, side="left")
            np.maximum.at(seg_max, dseg, acc_part)
        alive &= (seg_max + rem_ub) >= theta - ub_shift
        idx, valid = seg_map[i]
        if wgts[i] > 0:
            need = np.unique(idx[alive & valid])
        else:
            # negative-weight lists (stale-stats idf) decode FULLY:
            # skipping their blocks would leave skipped docs' partials
            # OVERestimated, and tighten() treats partials as lower
            # bounds — θ could then overshoot the true k-th score
            need = np.arange(bls[i].size)
        d, c = decode_row_blocks(i, need)
        decoded[i] = (d, c)
        rem_ub -= seg_ub_of(i)
        undecoded.remove(i)
        if d.size:
            md = np.concatenate([acc_docs, d])
            mc = np.concatenate([acc_part, c])
            acc_docs, inv = np.unique(md, return_inverse=True)
            acc_part = np.zeros(acc_docs.size)
            np.add.at(acc_part, inv, mc)
        theta = tighten(theta)

    if acc_docs.size == 0:
        cand_docs = np.empty(0, np.int64)
        cand_part = np.empty(0, np.float64)
    else:
        uniq, part = acc_docs, acc_part
        # docs in dead segments are provably < θ; also their partial
        # totals may be incomplete (their block in a later essential
        # list may have been pruned) — drop them outright
        seg_ok = alive[np.searchsorted(boundaries, uniq, side="left")]
        potential = part.copy()
        for i in non_essential:
            idx = np.searchsorted(bls[i], uniq, side="left")
            valid = idx < bls[i].size
            potential[valid] += ubs[i][idx[valid]]
        keep = seg_ok & (potential >= theta - ub_shift)
        cand_docs = uniq[keep]
        cand_part = part[keep]

    # 4. decode only non-essential blocks containing a candidate
    sc = cand_part.copy()
    for i in non_essential:
        if cand_docs.size == 0:
            decoded[i] = (np.empty(0, np.int64), np.empty(0, np.float64))
            continue
        idx = np.searchsorted(bls[i], cand_docs, side="left")
        need = np.unique(idx[idx < bls[i].size])
        d, c = decode_row_blocks(i, need)
        decoded[i] = (d, c)
        if d.size:
            pos = np.searchsorted(cand_docs, d)
            ok = (pos < cand_docs.size)
            ok[ok] &= cand_docs[pos[ok]] == d[ok]
            np.add.at(sc, pos[ok], c[ok])

    if emit == "stats":
        return pd.DataFrame({
            "qid": [qid], "shard": [shard],
            "blocks_total": [blocks_total],
            "blocks_decoded": [int(blocks_decoded)],
            "postings_total": [postings_total],
            "postings_scored": [int(postings_scored)],
        })

    if cand_docs.size == 0:
        return pd.DataFrame({"qid": pd.Series([], dtype=str),
                             "doc_id": pd.Series([], dtype=np.int64),
                             "score": pd.Series([], dtype=np.float64)})
    if emit == "cands":
        # no top-k cut: every doc with exact bm25 ≥ θ − shift could
        # still reach the TOTAL top-k once its feature term is added
        # (excluded docs: total ≤ sc + shift < θ ≤ true k-th total)
        keep = sc >= theta - ub_shift
        return pd.DataFrame({
            "qid": qid, "doc_id": cand_docs[keep].astype(np.int64),
            "score": sc[keep] / scale,   # ONE division at the end
        })
    sel = np.lexsort((cand_docs, -sc))[:k]
    return pd.DataFrame({
        "qid": qid, "doc_id": cand_docs[sel].astype(np.int64),
        "score": sc[sel] / scale,
    })


def _boolean_kernel(pdf: pd.DataFrame, k: int,
                    dead: np.ndarray | None = None) -> pd.DataFrame:
    """Boolean (must / should / must_not) top-k over ONE
    (query, doc-shard) group — the kernel-side replacement for the
    exploded (qid, doc) boolean plan (VERDICT r2 "remaining
    exhaustive-class plans").

    The role channel marks each sliced list: 0 = SHOULD (scoring),
    1 = MUST (scoring + gating), 2 = MUST_NOT (exclusion only).
    Doc-sharding makes the group COMPLETE for its doc range — every
    list's postings for docs in [lo, hi) are in this group — so
    boolean eligibility (ALL musts, NONE of the nots) is decidable
    locally, and the shard's top-k is exact for its range:

    1. decode the must_not lists fully; their doc ids merge with the
       broadcast liveDocs tombstones into one sorted exclusion array
       applied at every later decode (the distributed analog of
       Lucene's ReqExclScorer walking the exclusion iterator).
    2. decode the must lists fully — they are the match drivers, as in
       a Lucene conjunction; candidates = docs present in ALL
       ``n_must`` distinct must terms (salt-split sub-postings of one
       term share a ``gid`` and are unioned before the intersection).
    3. decode ONLY the should-list blocks that contain a candidate
       (consecutive runs — the same skip recipe as the BMW
       non-essential stage); should postings of non-candidates are
       never touched. No θ machinery is needed: the candidate set is
       already bounded by the rarest must list.

    Score = Σ wgt·contrib over the candidate's must + should
    occurrences (identical composition to the exhaustive plan).
    A group with NO must lists (pure should + not, the "foo -bar"
    shape) delegates to :func:`_bmw_kernel` with the exclusion array
    as its liveDocs mask — full MaxScore/block-max pruning applies,
    and every bound stays sound because excluded docs simply never
    produce partials (the local θ seed is computed post-mask).
    """
    from .postings import decode_run

    qid = pdf["qid"].iloc[0]
    shard = int(pdf["shard"].iloc[0])
    n_shards = int(pdf["n_shards"].iloc[0])
    shard_rows = int(pdf["shard_rows"].iloc[0])
    lo = shard * shard_rows
    hi = (shard + 1) * shard_rows if shard < n_shards - 1 else np.iinfo(
        np.int64).max

    roles = pdf["role"].to_numpy(dtype=np.int64)
    wgts = pdf["wgt"].to_numpy(dtype=np.float64)
    kinds = pdf["kind"].to_numpy(dtype=np.int64)
    p1s = pdf["p1"].to_numpy(dtype=np.float64)
    p2s = pdf["p2"].to_numpy(dtype=np.float64)
    gids = pdf["gid"].to_numpy(dtype=np.int64)
    n_must = int(pdf["n_must"].max())
    bls = [np.asarray(pdf["block_last"].iloc[i], dtype=np.int64)
           for i in range(len(pdf))]
    offs = [np.asarray(pdf["block_off"].iloc[i], dtype=np.int64)
            for i in range(len(pdf))]
    cnts = [np.asarray(pdf["counts"].iloc[i], dtype=np.int64)
            for i in range(len(pdf))]

    empty = pd.DataFrame({"qid": pd.Series([], dtype=str),
                          "doc_id": pd.Series([], dtype=np.int64),
                          "score": pd.Series([], dtype=np.float64)})

    excl = dead

    def decode_blocks(i: int, block_ids: np.ndarray):
        """Decode selected blocks of row i (runs), filtered to the
        shard range and the current exclusion array; returns
        (docs, tfs, dls)."""
        payload = np.frombuffer(bytes(pdf["payload"].iloc[i]),
                                dtype=np.uint8)
        codec = int(pdf["codec"].iloc[i])
        base0 = int(pdf["base"].iloc[i])
        bl, off, counts = bls[i], offs[i], cnts[i]
        dparts, tparts, lparts = [], [], []
        for r_lo, r_hi in _runs(block_ids):
            base = int(bl[r_lo - 1]) if r_lo > 0 else base0
            d, tf, dl = decode_run(payload[off[r_lo]:off[r_hi]],
                                   counts[r_lo:r_hi], codec, base)
            keep = (d >= lo) & (d < hi)
            if excl is not None:
                keep &= ~_in_sorted(d, excl)
            if not keep.all():
                d, tf, dl = d[keep], tf[keep], dl[keep]
            if d.size:
                dparts.append(d)
                tparts.append(tf)
                lparts.append(dl)
        if not dparts:
            z = np.empty(0, np.int64)
            return z, z, z
        return (np.concatenate(dparts), np.concatenate(tparts),
                np.concatenate(lparts))

    # 1. exclusion set: must_not lists ∪ liveDocs tombstones
    not_rows = np.flatnonzero(roles == 2)
    if not_rows.size:
        nparts = [dead] if dead is not None else []
        for i in not_rows:
            d, _tf, _dl = decode_blocks(i, np.arange(bls[i].size))
            if d.size:
                nparts.append(d)
        if nparts:
            excl = np.unique(np.concatenate(nparts))

    # pure should (+ not): BMW with the exclusion as its liveDocs mask
    must_rows = np.flatnonzero(roles == 1)
    score_rows = np.flatnonzero(roles != 2)
    if score_rows.size == 0:
        return empty   # only exclusion lists reached this shard
    if n_must == 0:
        sub = pdf.iloc[score_rows].reset_index(drop=True)
        return _bmw_kernel(sub, k, {}, "topk", dead=excl)
    if must_rows.size == 0:
        return empty   # a must list has no postings in this shard

    # 2. must lists: full decode, per-gid union, n_must-way intersect
    per_gid: dict[int, list[np.ndarray]] = {}
    m_docs: list[np.ndarray] = []
    m_contrib: list[np.ndarray] = []
    for i in must_rows:
        d, tf, dl = decode_blocks(i, np.arange(bls[i].size))
        if d.size:
            per_gid.setdefault(int(gids[i]), []).append(d)
            m_docs.append(d)
            m_contrib.append(
                wgts[i] * _contrib_np(int(kinds[i]), tf, dl,
                                      p1s[i], p2s[i]))
    if len(per_gid) < n_must:
        return empty   # some must term matches nothing in this shard
    gid_sets = [np.unique(np.concatenate(v)) for v in per_gid.values()]
    gid_sets.sort(key=lambda a: a.size)
    cand = gid_sets[0]
    for s_ in gid_sets[1:]:
        cand = cand[_in_sorted(cand, s_)]
        if cand.size == 0:
            return empty

    sc = np.zeros(cand.size)

    def add_contrib(d: np.ndarray, c: np.ndarray) -> None:
        pos = np.searchsorted(cand, d)
        ok = pos < cand.size
        ok[ok] &= cand[pos[ok]] == d[ok]
        np.add.at(sc, pos[ok], c[ok])

    for d, c in zip(m_docs, m_contrib):
        add_contrib(d, c)

    # 3. should lists: decode only blocks containing a candidate
    for i in np.flatnonzero(roles == 0):
        idx = np.searchsorted(bls[i], cand, side="left")
        need = np.unique(idx[idx < bls[i].size])
        if need.size == 0:
            continue
        d, tf, dl = decode_blocks(i, need)
        if d.size:
            add_contrib(d, wgts[i] * _contrib_np(int(kinds[i]), tf, dl,
                                                 p1s[i], p2s[i]))

    sel = np.lexsort((cand, -sc))[:k]
    return pd.DataFrame({
        "qid": qid, "doc_id": cand[sel].astype(np.int64),
        "score": sc[sel],
    })


def _dismax_kernel(pdf: pd.DataFrame, k: int, tie: float,
                   dead: np.ndarray | None = None) -> pd.DataFrame:
    """DisjunctionMax top-k over ONE (query, doc-shard) group — the
    block-max kernel generalized from sum-combination to the DisMax
    combiner (VERDICT r3 item 6):

        score(d) = tie·Σ_f S_f(d) + (1−tie)·max_f S_f(d)

    where S_f = Σ clause contributions within field f (lists carry
    their field id in the ``gid`` channel). The identity rewrites
    Lucene's ``max + tie·Σ_others`` exactly. Every pruning bound of
    the sum kernel carries over because the combiner is MONOTONE in
    each per-field total (all list weights must be ≥ 0 — asserted;
    the caller falls back to the exhaustive plan under stale-stats
    negative idfs):

    * a segment's upper bound combines the per-FIELD sums of block
      maxima — componentwise max over docs dominates every single
      doc's vector, and combine() is monotone, so
      combine(seg_max_f + rem_f) ≥ the true total of any doc there;
    * the MaxScore split marks the longest ub-ascending prefix whose
      COMBINED per-field bound stays < θ as non-essential;
    * decoded per-field partials are lower bounds of the per-field
      totals (missing contributions ≥ 0), so combine(partials) is a
      sound θ-tightener;
    * the strongest-list seed is exact: a doc seen only in one list
      has combine = tie·c + (1−tie)·c = c.

    Rank-identical to :func:`engine.fields.dismax_topk` by
    construction (equivalence-tested at tie ∈ {0, 0.3, 1}).
    """
    from .postings import decode_run

    qid = pdf["qid"].iloc[0]
    shard = int(pdf["shard"].iloc[0])
    n_shards = int(pdf["n_shards"].iloc[0])
    shard_rows = int(pdf["shard_rows"].iloc[0])
    lo = shard * shard_rows
    hi = (shard + 1) * shard_rows if shard < n_shards - 1 else np.iinfo(
        np.int64).max

    nrows = len(pdf)
    wgts = pdf["wgt"].to_numpy(dtype=np.float64)
    assert (wgts >= 0).all(), "dismax kernel requires non-negative wgts"
    kinds = pdf["kind"].to_numpy(dtype=np.int64)
    p1s = pdf["p1"].to_numpy(dtype=np.float64)
    p2s = pdf["p2"].to_numpy(dtype=np.float64)
    fids = pdf["gid"].to_numpy(dtype=np.int64)     # field id channel
    ufids = np.unique(fids)
    nf = ufids.size
    fj = np.searchsorted(ufids, fids)              # dense field col
    ubs_raw = [np.asarray(pdf["block_ub"].iloc[i], dtype=np.float64)
               for i in range(nrows)]
    ubs = [wgts[i] * ubs_raw[i] for i in range(nrows)]
    bls = [np.asarray(pdf["block_last"].iloc[i], dtype=np.int64)
           for i in range(nrows)]
    offs = [np.asarray(pdf["block_off"].iloc[i], dtype=np.int64)
            for i in range(nrows)]
    cnts = [np.asarray(pdf["counts"].iloc[i], dtype=np.int64)
            for i in range(nrows)]
    tie = float(tie)

    def combine(pf: np.ndarray) -> np.ndarray:
        # pf: (n, nf) per-field totals/bounds → combined score/bound
        return tie * pf.sum(axis=1) + (1.0 - tie) * pf.max(axis=1)

    def decode_row_blocks(i: int, block_ids: np.ndarray):
        payload = np.frombuffer(bytes(pdf["payload"].iloc[i]),
                                dtype=np.uint8)
        codec = int(pdf["codec"].iloc[i])
        base0 = int(pdf["base"].iloc[i])
        bl, off, counts = bls[i], offs[i], cnts[i]
        dparts, cparts = [], []
        for r_lo, r_hi in _runs(block_ids):
            base = int(bl[r_lo - 1]) if r_lo > 0 else base0
            d, tf, dl = decode_run(payload[off[r_lo]:off[r_hi]],
                                   counts[r_lo:r_hi], codec, base)
            keep = (d >= lo) & (d < hi)
            if dead is not None:
                keep &= ~_in_sorted(d, dead)
            if not keep.all():
                d, tf, dl = d[keep], tf[keep], dl[keep]
            if d.size:
                dparts.append(d)
                cparts.append(wgts[i] * _contrib_np(int(kinds[i]), tf, dl,
                                                    p1s[i], p2s[i]))
        if not dparts:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        return np.concatenate(dparts), np.concatenate(cparts)

    acc_docs = np.empty(0, np.int64)
    acc_pf = np.empty((0, nf))

    def merge(d: np.ndarray, c: np.ndarray, col: int) -> None:
        nonlocal acc_docs, acc_pf
        if d.size == 0:
            return
        uniq, inv = np.unique(np.concatenate([acc_docs, d]),
                              return_inverse=True)
        pf = np.zeros((uniq.size, nf))
        pf[inv[:acc_docs.size]] = acc_pf    # old docs are unique rows
        np.add.at(pf[:, col], inv[acc_docs.size:], c)
        acc_docs, acc_pf = uniq, pf

    # 1. θ seed from the strongest list (exact single-list lower bound)
    theta = -np.inf
    list_ub = np.array([u.max() if u.size else -np.inf for u in ubs])
    seed_i = int(np.argmax(list_ub))
    d0, c0 = decode_row_blocks(seed_i, np.arange(bls[seed_i].size))
    merge(d0, c0, int(fj[seed_i]))
    if c0.size >= k:
        theta = float(np.partition(c0, c0.size - k)[c0.size - k])

    # 2. MaxScore split under the COMBINED prefix bound
    order = np.argsort(list_ub, kind="stable")
    pref_f = np.zeros(nf)
    ness_mask = np.zeros(nrows, dtype=bool)
    for i in order:
        pref_f[fj[i]] += max(list_ub[i], 0.0)
        if combine(pref_f[None, :])[0] < theta:
            ness_mask[i] = True
        else:
            break
    ness_mask[seed_i] = False
    essential = [i for i in range(nrows) if not ness_mask[i]]
    non_essential = [i for i in range(nrows) if ness_mask[i]]

    # 3. segment-level pruning (per-field remaining bounds)
    boundaries = np.unique(np.concatenate(bls))
    nseg = boundaries.size
    seg_map = []
    for i in range(nrows):
        idx = np.searchsorted(bls[i], boundaries, side="left")
        valid = idx < bls[i].size
        seg_map.append((idx, valid))

    def seg_ub_of(i: int) -> np.ndarray:
        idx, valid = seg_map[i]
        out = np.zeros(nseg)
        out[valid] = ubs[i][idx[valid]]
        return out

    alive = np.ones(nseg, dtype=bool)
    undecoded = [i for i in range(nrows) if i != seed_i]
    rem_f = np.zeros((nseg, nf))
    for j in undecoded:
        rem_f[:, fj[j]] += seg_ub_of(j)

    def tighten(theta: float) -> float:
        if acc_docs.size >= k:
            comb = combine(acc_pf)
            kth = np.partition(comb, comb.size - k)[comb.size - k]
            theta = max(theta, float(kth))
        return theta

    theta = tighten(theta)
    for i in sorted(essential, key=lambda i: -list_ub[i]):
        if i == seed_i:
            continue
        seg_pf = np.zeros((nseg, nf))
        if acc_docs.size:
            dseg = np.searchsorted(boundaries, acc_docs, side="left")
            for col in range(nf):
                np.maximum.at(seg_pf[:, col], dseg, acc_pf[:, col])
        alive &= combine(seg_pf + rem_f) >= theta
        idx, valid = seg_map[i]
        need = np.unique(idx[alive & valid])
        d, c = decode_row_blocks(i, need)
        merge(d, c, int(fj[i]))
        rem_f[:, fj[i]] -= seg_ub_of(i)
        undecoded.remove(i)
        theta = tighten(theta)

    if acc_docs.size == 0:
        return pd.DataFrame({"qid": pd.Series([], dtype=str),
                             "doc_id": pd.Series([], dtype=np.int64),
                             "score": pd.Series([], dtype=np.float64)})

    # candidates: drop dead-segment docs (their partials may be
    # incomplete), then the block-level potential test
    seg_ok = alive[np.searchsorted(boundaries, acc_docs, side="left")]
    pot_f = acc_pf.copy()
    for i in non_essential:
        idx = np.searchsorted(bls[i], acc_docs, side="left")
        valid = idx < bls[i].size
        pot_f[valid, fj[i]] += ubs[i][idx[valid]]
    keep = seg_ok & (combine(pot_f) >= theta)
    cand_docs = acc_docs[keep]
    cand_pf = acc_pf[keep]

    # 4. decode only non-essential blocks containing a candidate
    for i in non_essential:
        if cand_docs.size == 0:
            break
        idx = np.searchsorted(bls[i], cand_docs, side="left")
        need = np.unique(idx[idx < bls[i].size])
        d, c = decode_row_blocks(i, need)
        if d.size:
            pos = np.searchsorted(cand_docs, d)
            ok = pos < cand_docs.size
            ok[ok] &= cand_docs[pos[ok]] == d[ok]
            np.add.at(cand_pf[:, fj[i]], pos[ok], c[ok])

    if cand_docs.size == 0:
        return pd.DataFrame({"qid": pd.Series([], dtype=str),
                             "doc_id": pd.Series([], dtype=np.int64),
                             "score": pd.Series([], dtype=np.float64)})
    sc = combine(cand_pf)
    sel = np.lexsort((cand_docs, -sc))[:k]
    return pd.DataFrame({
        "qid": qid, "doc_id": cand_docs[sel].astype(np.int64),
        "score": sc[sel],
    })


def _run_dismax(spark, matched: DataFrame, k: int, tie: float,
                dead_b) -> DataFrame:
    """Slice → per-(qid, shard) DisMax kernel (field ids ride the
    ``gid`` channel)."""
    sliced = matched.mapInPandas(_make_slice_fn(), schema=_SLICE_SCHEMA)

    def run_group(pdf: pd.DataFrame) -> pd.DataFrame:
        dead = dead_b.value if dead_b is not None else None
        return _dismax_kernel(pdf, k, tie, dead=dead)

    return sliced.groupBy("qid", "shard").applyInPandas(
        run_group, schema=_WAND_SCHEMA)


_WAND_SCHEMA = T.StructType([
    T.StructField("qid", T.StringType()),
    T.StructField("doc_id", T.LongType()),
    T.StructField("score", T.DoubleType()),
])

_WAND_STATS_SCHEMA = T.StructType([
    T.StructField("qid", T.StringType()),
    T.StructField("shard", T.IntegerType()),
    T.StructField("blocks_total", T.LongType()),
    T.StructField("blocks_decoded", T.LongType()),
    T.StructField("postings_total", T.LongType()),
    T.StructField("postings_scored", T.LongType()),
])

# per-task posting budget for auto-sharding: with ~16-byte decoded
# postings this keeps a kernel's working set well under executor memory
WAND_TARGET_POSTINGS_PER_TASK = 2_000_000

# only seed a global θ from a term whose full posting list is small
# enough to decode in one task (sparse high-idf terms — exactly the
# ones that produce useful thresholds)
SEED_MAX_DF = 500_000

# extra θ relaxation on the bounded-additive-feature kernel path
# (rank_feature saturation/sigmoid, distance_feature): the final rank
# reads 4 dp-ROUNDED totals with doc_id tiebreaks, so a doc whose exact
# total sits within one rounding grid step (1e-4) of the k-th could
# still flip in — 1e-3 keeps every such doc in the candidate set at the
# cost of a few extra exact-scored candidates
WAND_FEATURE_EPS = 1e-3


def _seed_thetas(index: Index, rows: list, dfm: dict[str, int],
                 k: int, dead_b=None) -> dict[str, float]:
    """Threshold sharing across shards: per query, fully score the
    single strongest term (max strength proxy, df-capped) in one tiny
    job; its k-th largest contribution is a GLOBAL lower bound on the
    true k-th total score, broadcast into every shard kernel. Queries
    whose strongest term is still a head term skip the seed (their
    per-shard local seeds are strong anyway — every shard holds plenty
    of head docs).

    ``rows``: (qid, term, wgt, kind, p1, p2, strength) — wgt is the
    full clause multiplier (weight·idf for BM25), kind/p1/p2 the
    scorer spec (see _contrib_np), strength the pick proxy."""
    pick: dict[str, tuple] = {}
    neg_sum: dict[str, float] = {}  # Σ negative floors (BM25: wgt·1)
    skip: set[str] = set()
    for q, t, wgt, kind, p1, p2, strength in rows:
        if wgt < 0:
            if kind == KIND_BM25:
                # BM25 contribution w ∈ (0, 1]: floor is wgt itself
                neg_sum[q] = neg_sum.get(q, 0.0) + wgt
            else:
                # LMD/IB contributions are unbounded by 1 — no cheap
                # driver-side floor, so don't seed this query at all
                skip.add(q)
        else:
            neg_sum.setdefault(q, 0.0)
        if dfm[t] > SEED_MAX_DF:
            continue
        if q not in pick or strength > pick[q][6]:
            pick[q] = (t, wgt, kind, p1, p2, dfm[t], strength)
    pick = {q: v for q, v in pick.items() if q not in skip}
    if not pick:
        return {}
    qt = index.spark.createDataFrame(
        [(q, t, wgt, kind, p1, p2)
         for q, (t, wgt, kind, p1, p2, _, _) in pick.items()],
        "qid string, term string, wgt double, kind int, "
        "p1 double, p2 double")
    buckets = index.term_buckets([v[0] for v in pick.values()])
    matched = (index.postings
               .where(F.col("bucket").isin(buckets))
               .join(F.broadcast(qt), "term")
               .select("qid", "wgt", "kind", "p1", "p2", "blob"))

    def theta_fn(key, pdf: pd.DataFrame) -> pd.DataFrame:
        from .postings import decode_postings
        dead = dead_b.value if dead_b is not None else None
        cs = []
        for i in range(len(pdf)):
            d, tf, dl = decode_postings(bytes(pdf["blob"].iloc[i]))
            if dead is not None and d.size:
                # liveDocs in the seed too: a θ fed by a dead doc's
                # contribution could exceed the true k-th live score
                keep = ~_in_sorted(d, dead)
                d, tf, dl = d[keep], tf[keep], dl[keep]
            if d.size == 0:
                continue
            wgt = float(pdf["wgt"].iloc[i])
            cs.append(wgt * _contrib_np(int(pdf["kind"].iloc[i]), tf, dl,
                                        float(pdf["p1"].iloc[i]),
                                        float(pdf["p2"].iloc[i])))
        c = np.concatenate(cs) if cs else np.empty(0)
        if c.size < k:
            return pd.DataFrame({"qid": [], "theta": []})
        th = float(np.partition(c, c.size - k)[c.size - k])
        return pd.DataFrame({"qid": [key[0]], "theta": [th]})

    out = matched.groupBy("qid").applyInPandas(
        theta_fn, schema="qid string, theta double").collect()
    # a doc's total ≥ its seed contribution + the other terms' negative
    # floors (Σ min(wgt, 0) for BM25, exact 0 for normal positive idfs)
    return {r["qid"]: float(r["theta"])
            + (neg_sum[r["qid"]]
               - min(pick[r["qid"]][1], 0.0))
            for r in out}


def _scorer_rows(index: Index, query_terms: QueryTerms,
                 dfm: dict[str, int], scorer: str,
                 mu: float, ib_c: float) -> list[tuple]:
    """(qid, term, wgt, kind, p1, p2, strength) rows for the generic
    kernel (see _contrib_np for the param meanings). ``strength`` is
    the θ-seed pick proxy: the rarer/stronger the list, the better its
    k-th contribution lower-bounds the true k-th total."""
    n, avgdl = float(index.n_docs), index.avgdl
    k1, b = index.stats["k1"], index.stats["b"]
    if scorer == "bm25":
        out = []
        for q, t, w in query_terms:
            if t not in dfm:
                continue
            idf = float(np.log1p((n - dfm[t] + 0.5) / (dfm[t] + 0.5)))
            out.append((q, t, float(w) * idf, KIND_BM25,
                        k1 * (1.0 - b), k1 * b / avgdl, float(w) * idf))
        return out
    if scorer == "lmd":
        ctfm = index.ctf_map([t for _, t, _ in query_terms])
        C = float(index.stats["total_tokens"])
        return [(q, t, float(w), KIND_LMD,
                 mu * (ctfm.get(t, 0) + 1.0) / (C + 1.0), mu,
                 float(w) * (C + 1.0) / (ctfm.get(t, 0) + 1.0))
                for q, t, w in query_terms if t in dfm]
    if scorer == "ib":
        return [(q, t, float(w), KIND_IB,
                 ib_c * avgdl, (dfm[t] + 1.0) / (n + 1.0),
                 float(w) * (n + 1.0) / (dfm[t] + 1.0))
                for q, t, w in query_terms if t in dfm]
    raise ValueError(f"unknown scorer {scorer!r}")


def _run_bmw(spark, matched: DataFrame, k: int, thetas: dict,
             dead_b, emit: str, schema,
             ub_shift: float = 0.0,
             quantize: bool = False,
             fused_single_shard: bool = False) -> DataFrame:
    """Shared slice → per-(qid, shard) kernel tail of every WAND-class
    plan. ``matched`` needs columns (qid, wgt, kind, p1, p2, n_shards,
    shard_rows, blob, block_last, block_max_w, block_max_tf,
    block_off).

    ``fused_single_shard`` (r6): when the CALLER knows every query in
    the batch is single-shard (s_q ≡ 1 — the common case for
    interactive queries at any corpus size), the slice stage is a pure
    pass-through (one run covering the whole list, base 0, shard 0),
    so slicing fuses INTO the kernel group fn: one exchange and ONE
    Python stage instead of mapInPandas → exchange → applyInPandas —
    the posting payloads cross the Python boundary once, not twice.
    Multi-shard batches keep the two-stage plan (the slice genuinely
    fans lists out to shards there)."""
    def run_group(pdf: pd.DataFrame) -> pd.DataFrame:
        dead = dead_b.value if dead_b is not None else None
        if (pdf["role"] != 0).any():
            # boolean groups carry clause structure; stats emit is a
            # plain-scoring diagnostic and never routes here
            assert emit == "topk"
            return _boolean_kernel(pdf, k, dead=dead)
        return _bmw_kernel(pdf, k, thetas, emit, dead=dead,
                           ub_shift=ub_shift, quantize=quantize)

    if fused_single_shard:
        from .postings import block_counts, split_payload

        def run_fused(pdf: pd.DataFrame) -> pd.DataFrame:
            cols: dict[str, list] = {f.name: []
                                     for f in _SLICE_SCHEMA.fields}
            for i in range(len(pdf)):
                blob = bytes(pdf["blob"].iloc[i])
                if not blob:
                    continue
                codec, n, bs, payload = split_payload(blob)
                kind = int(pdf["kind"].iloc[i])
                p1 = float(pdf["p1"].iloc[i])
                p2 = float(pdf["p2"].iloc[i])
                bmw = np.asarray(pdf["block_max_w"].iloc[i],
                                 dtype=np.float64)
                bmt = np.asarray(pdf["block_max_tf"].iloc[i],
                                 dtype=np.float64)
                cols["qid"].append(pdf["qid"].iloc[i])
                cols["shard"].append(0)
                cols["wgt"].append(float(pdf["wgt"].iloc[i]))
                cols["kind"].append(kind)
                cols["p1"].append(p1)
                cols["p2"].append(p2)
                cols["payload"].append(payload.tobytes())
                cols["counts"].append(block_counts(n, bs))
                cols["block_last"].append(
                    np.asarray(pdf["block_last"].iloc[i],
                               dtype=np.int64))
                cols["block_ub"].append(
                    _block_ub_np(kind, bmt, bmw, p1, p2))
                cols["block_off"].append(
                    np.asarray(pdf["block_off"].iloc[i],
                               dtype=np.int64))
                cols["base"].append(0)
                cols["codec"].append(codec)
                cols["n_shards"].append(1)
                cols["shard_rows"].append(
                    int(pdf["shard_rows"].iloc[i]))
                cols["role"].append(int(pdf["role"].iloc[i]))
                cols["gid"].append(int(pdf["gid"].iloc[i]))
                cols["n_must"].append(int(pdf["n_must"].iloc[i]))
            spdf = pd.DataFrame(cols)
            if not len(spdf):
                # dtype=object empties: a default float64 empty column
                # can fail the Arrow cast to the declared schema (the
                # CLAUDE.md round-5 applyInPandas pitfall)
                return pd.DataFrame({
                    f.name: pd.Series([], dtype=object)
                    for f in schema.fields})
            return run_group(spdf)

        return matched.groupBy("qid").applyInPandas(
            run_fused, schema=schema)

    sliced = matched.mapInPandas(_make_slice_fn(), schema=_SLICE_SCHEMA)
    return sliced.groupBy("qid", "shard").applyInPandas(
        run_group, schema=schema)


_MATCH_COLS = ["qid", "wgt", "kind", "p1", "p2", "n_shards", "shard_rows",
               "blob", "block_last", "block_max_w", "block_max_tf",
               "block_off", "role", "gid", "n_must"]


def _wand_sharded(index: Index, query_terms: QueryTerms, k: int,
                  n_shards: int | None, emit: str,
                  scorer: str = "bm25", mu: float = MU,
                  ib_c: float | None = None,
                  ub_shift: float = 0.0,
                  quantize: bool = False) -> DataFrame:
    from .scoring import IB_C
    terms = [t for _, t, _ in query_terms]
    dfm = index.df_map(terms)
    rows = _scorer_rows(index, query_terms, dfm, scorer, mu,
                        ib_c if ib_c is not None else IB_C)
    schema = _WAND_STATS_SCHEMA if emit == "stats" else _WAND_SCHEMA
    if not rows:
        return index.spark.createDataFrame([], schema)
    # PER-QUERY shard count: a query fans out only as wide as ITS
    # matched postings require (ceil(Σ df / target)). A global count
    # sized by the batch's biggest query would over-shard every small
    # query — multiplying kernel fixed costs and weakening the local
    # seeds (each shard then sees 1/n of the strongest list).
    per_q: dict[str, int] = {}
    for q, t, *_ in rows:
        per_q[q] = per_q.get(q, 0) + dfm[t]
    if n_shards is None:
        s_q = {q: max(1, -(-v // WAND_TARGET_POSTINGS_PER_TASK))
               for q, v in per_q.items()}
    else:
        s_q = {q: n_shards for q in per_q}
    shard_rows_q = {q: max(1, -(-index.n_docs // s)) for q, s in s_q.items()}
    # liveDocs: broadcast the sorted tombstone ids once; kernels mask
    # dead docs AT DECODE (k stays k under any delete volume)
    dead = index.dead_ids()
    dead_b = (index.spark.sparkContext.broadcast(dead)
              if dead is not None else None)
    # threshold sharing only pays when there ARE shards to share with:
    # single-shard queries' kernels decode the same strongest list as
    # their local seed, so the extra job would be pure latency for them
    multi = [r for r in rows if s_q[r[0]] > 1]
    thetas = (_seed_thetas(index, multi, dfm, k, dead_b=dead_b)
              if multi else {})
    buckets = index.term_buckets(terms)
    post = index.postings.where(F.col("bucket").isin(buckets))
    by_term: dict[str, list[tuple]] = {}
    for q, t, wgt, kind, p1, p2, _ in rows:
        by_term.setdefault(t, []).append(
            (q, wgt, kind, p1, p2, s_q[q], shard_rows_q[q]))
    fields = [("qid", "string"), ("wgt", "double"), ("kind", "int"),
              ("p1", "double"), ("p2", "double"), ("n_shards", "int"),
              ("shard_rows", "long")]
    matched = _attach_terms_lit(post, by_term, fields)
    if matched is None:
        qt = index.spark.createDataFrame(
            [(q, t, wgt, kind, p1, p2, s_q[q], shard_rows_q[q])
             for q, t, wgt, kind, p1, p2, _ in rows],
            "qid string, term string, wgt double, kind int, p1 double, "
            "p2 double, n_shards int, shard_rows long")
        matched = post.join(F.broadcast(qt), "term")
    matched = (matched
               .withColumn("role", F.lit(0))
               .withColumn("gid", F.lit(-1))
               .withColumn("n_must", F.lit(0))
               .select(*_MATCH_COLS))
    return _run_bmw(index.spark, matched, k, thetas, dead_b, emit, schema,
                    ub_shift=ub_shift, quantize=quantize,
                    fused_single_shard=all(v == 1 for v in s_q.values()))


def score_wand(index: Index, query_terms: QueryTerms, k: int,
               n_shards: int | None = None,
               scorer: str = "bm25",
               quantize: bool = False) -> DataFrame:
    """Distributed block-max WAND top-k (north-rule Q14).

    ``n_shards``: doc shards per query (None = derived from Σ df so
    each task stays under WAND_TARGET_POSTINGS_PER_TASK postings).
    ``scorer``: 'bm25' (default), 'lmd' or 'ib' — the generic kernel
    dispatches the contribution formula per list and derives LMD/IB
    block bounds from block_max_tf (VERDICT r2 item 3: the newer
    similarities get the same sharded decode-skipping path instead of
    the exhaustive explode). Rank-identical to the matching
    exhaustive-path scorer by construction.

    Pending deletes are masked INSIDE the kernel at block decode (a
    broadcast sorted-id liveDocs probe, same recipe as purge's mask —
    engine/deletes.py), so the kernel computes a plain top-k whatever
    the tombstone volume; the redundant post-side live() is kept as a
    zero-cost invariant guard.

    ``quantize``: per-contribution int64-µu quantization inside the
    kernel (association-free sums, bit-identical to the integer-
    accumulating tree plans / DuckDB oracles; see _bmw_kernel) —
    pruning runs with the WAND_FEATURE_EPS relaxation that keeps it
    sound under the ≤0.5 µu/list quantization divergence. Callers
    ranking on the ROUNDED score should page k+margin as usual.
    """
    out = index.live(_wand_sharded(
        index, query_terms, k, n_shards, "topk", scorer=scorer,
        ub_shift=WAND_FEATURE_EPS if quantize else 0.0,
        quantize=quantize))
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_id"))
    return (out.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("qid", "doc_id", "score", "rank")
            .orderBy("qid", "rank"))


def boolean_wand(index: Index, queries, k: int,
                 n_shards: int | None = None) -> DataFrame:
    """Kernel-side boolean retrieval: CLAUSED queries (must and/or
    must_not present) run through the sharded slice →
    :func:`_boolean_kernel` path, shuffling compressed block runs
    instead of exploded (qid, doc) score rows — the kernel analog of
    Lucene's ConjunctionScorer/ReqExclScorer walk (see the kernel
    docstring for role semantics). Rank-identical to the
    ``use_kernel=False`` explode plan by construction.

    A query whose must term has no postings matches nothing and is
    dropped driver-side (the explode plan's must-count gate reaches
    the same answer the long way). Returns (qid, doc_id, score, rank).
    """
    from .scoring import IB_C
    all_terms = sorted({t for _, m, s, n_ in queries
                        for t in set(m) | set(s) | set(n_)})
    dfm = index.df_map(all_terms)
    rows: list[tuple] = []
    per_q: dict[str, int] = {}
    for q, m, s, n_ in queries:
        mset = sorted(set(m))
        if any(t not in dfm for t in mset):
            continue   # a must term with zero df: query matches nothing
        scoring = sorted(set(mset) | set(s))
        sr = _scorer_rows(index, [(q, t, 1.0) for t in scoring], dfm,
                          "bm25", MU, IB_C)
        mpos = {t: i for i, t in enumerate(mset)}
        for qq, t, wgt, kind, p1, p2, _st in sr:
            rows.append((qq, t, wgt, kind, p1, p2,
                         1 if t in mpos else 0, mpos.get(t, -1),
                         len(mset)))
        for t in sorted(set(n_)):
            if t in dfm:
                rows.append((q, t, 0.0, KIND_BM25, 0.0, 0.0, 2, -1,
                             len(mset)))
        per_q[q] = sum(dfm[t] for t in set(scoring) | set(n_) if t in dfm)
    if not rows:
        return (index.spark.createDataFrame([], _WAND_SCHEMA)
                .withColumn("rank", F.lit(1))
                .select("qid", "doc_id", "score", "rank"))
    # shard budget counts the NOT lists too — the kernel decodes them
    if n_shards is None:
        s_q = {q: max(1, -(-v // WAND_TARGET_POSTINGS_PER_TASK))
               for q, v in per_q.items()}
    else:
        s_q = {q: n_shards for q in per_q}
    shard_rows_q = {q: max(1, -(-index.n_docs // s)) for q, s in s_q.items()}
    dead = index.dead_ids()
    dead_b = (index.spark.sparkContext.broadcast(dead)
              if dead is not None else None)
    buckets = index.term_buckets([t for _, t, *_ in rows])
    post = index.postings.where(F.col("bucket").isin(buckets))
    by_term: dict[str, list[tuple]] = {}
    for q, t, wgt, kind, p1, p2, role, gid, nm in rows:
        by_term.setdefault(t, []).append(
            (q, wgt, kind, p1, p2, s_q[q], shard_rows_q[q], role, gid,
             nm))
    fields = [("qid", "string"), ("wgt", "double"), ("kind", "int"),
              ("p1", "double"), ("p2", "double"), ("n_shards", "int"),
              ("shard_rows", "long"), ("role", "int"), ("gid", "int"),
              ("n_must", "int")]
    matched = _attach_terms_lit(post, by_term, fields)
    if matched is None:
        qt = index.spark.createDataFrame(
            [(q, t, wgt, kind, p1, p2, s_q[q], shard_rows_q[q], role,
              gid, nm)
             for q, t, wgt, kind, p1, p2, role, gid, nm in rows],
            "qid string, term string, wgt double, kind int, p1 double, "
            "p2 double, n_shards int, shard_rows long, role int, "
            "gid int, n_must int")
        matched = post.join(F.broadcast(qt), "term")
    matched = matched.select(*_MATCH_COLS)
    # no cross-shard θ seed: a seed computed from an UNMASKED strongest
    # list would overshoot under exclusions, and must-queries don't use
    # θ at all — the masked local seed inside the kernel stays sound
    out = index.live(_run_bmw(
        index.spark, matched, k, {}, dead_b, "topk", _WAND_SCHEMA,
        fused_single_shard=all(v == 1 for v in s_q.values())))
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_id"))
    return (out.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("qid", "doc_id", "score", "rank")
            .orderBy("qid", "rank"))


def term_vectors(index: Index, doc_ids: Sequence[int],
                 with_df: bool = False) -> DataFrame:
    """Lucene ``TermVectors``/``Terms`` analog — and, with
    ``with_df=True``, the ES ``_termvectors`` endpoint with
    ``term_statistics``: the per-document term vector for the
    requested docs, read from the build's forward tf table — which
    doubles as stored term vectors, the way Lucene materializes
    per-doc terms when termVectors are enabled. The read is a parquet
    scan with the doc_id filter pushed down (no decode of the inverted
    postings); tombstoned docs return nothing.

    ``with_df=False`` (default): (doc_id, term, tf, dl) ordered.
    ``with_df=True``: (doc_id, term, tf, dl, df) with the dictionary
    document frequency attached by broadcasting the page-bounded
    result side against the termstats scan, integer columns widened to
    long — the one corpus-shaped cost is that dictionary scan.
    """
    from .index_build import _paths

    p = _paths(index.index_dir)
    tf = index.spark.read.parquet(p["tf"])
    out = (tf.where(F.col("doc_id").isin([int(d) for d in doc_ids]))
           .select("doc_id", "term", "tf", "dl"))
    out = index.live(out)
    if not with_df:
        return out.orderBy("doc_id", "term")
    rows = (out.groupBy("doc_id", "term")
            .agg(F.sum("tf").cast("long").alias("tf"),
                 F.max("dl").cast("long").alias("dl")))
    ts = index.termstats.select("term", F.col("df").cast("long").alias("df"))
    return (ts.join(F.broadcast(rows), "term")
            .select("doc_id", "term", "tf", "dl", "df")
            .orderBy("doc_id", "term"))


def search_after(index: Index, query_terms: QueryTerms, k: int,
                 after: dict[str, tuple[float, int]],
                 ndigits: int = 4) -> DataFrame:
    """Deep pagination (``IndexSearcher.searchAfter`` analog): the next
    ``k`` results strictly after each query's cursor in the global
    (score desc, doc_id asc) order.

    ``after``: qid → (score, doc_id) of the last row of the previous
    page (as returned by the engine). Scores are compared ROUNDED to
    ``ndigits`` (the repo's rounded-rank-window rule — cursor scores
    cross process/engine boundaries, where exact float sums differ in
    the last ulp). A qid absent from ``after`` pages from the top.

    Like Lucene's searchAfter, this re-scores the query and skips past
    the cursor rather than caching earlier pages — page N costs one
    scoring pass, not N stored pages of state.
    Returns (qid, doc_id, score, rank) with rank restarting at 1.
    """
    from engine.portable import round_half_up

    spark = index.spark
    cur = spark.createDataFrame(
        [(q, float(s), int(d)) for q, (s, d) in after.items()],
        "qid string, a_score double, a_doc long")
    scored = score_exhaustive(index, query_terms,
                              k=2_147_483_647).drop("rank")
    r = round_half_up(F.col("score"), ndigits)
    ra = round_half_up(F.col("a_score"), ndigits)
    out = (scored.join(F.broadcast(cur), "qid", "left")
           .where(F.col("a_score").isNull()
                  | (r < ra)
                  | ((r == ra) & (F.col("doc_id") > F.col("a_doc")))))
    w = Window.partitionBy("qid").orderBy(r.desc(), F.asc("doc_id"))
    return (out.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("qid", "doc_id", r.alias("score"), "rank")
            .orderBy("qid", "rank"))


def wand_stats(index: Index, query_terms: QueryTerms, k: int,
               n_shards: int | None = None,
               scorer: str = "bm25",
               ub_shift: float = 0.0) -> DataFrame:
    """Decode/skip counters per (qid, shard) for the same BMW plan:
    (qid, shard, blocks_total, blocks_decoded, postings_total,
    postings_scored). Evidence that block-max pruning skips work.
    ``ub_shift`` reports the bounded-additive-feature path's counters
    (pass the feature query's boost + WAND_FEATURE_EPS — the exact
    shift rank_feature/distance_feature run with)."""
    return _wand_sharded(index, query_terms, k, n_shards, "stats",
                         scorer=scorer, ub_shift=ub_shift)


# ---------------------------------------------------------------------------
# Term-expansion queries (Lucene MultiTermQuery rewrites: Prefix/Fuzzy)
# ---------------------------------------------------------------------------

def _next_prefix(p: str) -> str | None:
    """The smallest string greater than every string with prefix ``p``
    (increment the last incrementable codepoint), or None if no such
    string exists. Used to turn a prefix into a [p, next) range."""
    b = list(p)
    for i in range(len(b) - 1, -1, -1):
        cp = ord(b[i])
        if cp < 0x10FFFF:
            return "".join(b[:i]) + chr(cp + 1)
        b.pop()
    return None


def _literal_head(pattern: str, meta: str) -> str:
    """Leading literal run of a wildcard/regex pattern (chars before
    the first metacharacter) — the seekable prefix Lucene's automaton
    intersection starts from."""
    out = []
    for ch in pattern:
        if ch in meta:
            break
        out.append(ch)
    return "".join(out)


def _regex_literal_head(pattern: str) -> str:
    """Sound seekable prefix of a regex: empty on top-level alternation
    (``abc|xyz`` matches need not start with ``abc``), and the last
    literal char is dropped when a quantifier follows (``abc*`` matches
    ``ab``) — both cases where the naive literal head over-prunes."""
    depth, esc, in_class = 0, False, False
    for ch in pattern:
        if esc:
            esc = False
            continue
        if ch == "\\":
            esc = True
            continue
        if in_class:
            in_class = ch != "]"
            continue
        if ch == "[":
            in_class = True
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "|" and depth == 0:
            return ""
    head = _literal_head(pattern, "\\.^$*+?()[]{}|")
    if head and len(head) < len(pattern) and pattern[len(head)] in "*+?{":
        head = head[:-1]
    return head


def _prefix_range_filter(df: DataFrame, prefixes: Sequence[str]) -> DataFrame:
    """Coarse dictionary pruning: restrict a termstats scan to the
    union of the prefixes' [p, next(p)) ranges BEFORE the exact-match
    join. The ranges are plain literal comparisons on the scan, so
    Catalyst pushes them into the parquet reader, where the sorted
    term-range layout (index_build.write_sorted_termstats) turns them
    into file/row-group pruning — the distributed analog of seeking a
    sorted term dictionary instead of scanning it. Pure ASCII prefixes
    only (identical ordering in Java, parquet stats and DuckDB); any
    other — or empty — prefix keeps the full scan, so this is ONLY an
    optimization and never changes the match set."""
    conds = []
    for p in set(prefixes):
        if not p or any(ord(c) > 0x7e for c in p):
            return df   # unprunable pattern in the batch: full scan
        nxt = _next_prefix(p)
        c = F.col("term") >= F.lit(p)
        if nxt is not None:
            c = c & (F.col("term") < F.lit(nxt))
        conds.append(c)
    if not conds:
        return df
    cond = conds[0]
    for c in conds[1:]:
        cond = cond | c
    return df.where(cond)


def expand_prefix_terms(index: Index,
                        queries: Sequence[tuple[str, str]]) -> QueryTerms:
    """Prefix rewrite: (qid, prefix) → [(qid, term, 1.0)] for every
    vocabulary term starting with the prefix (Lucene PrefixQuery's
    scoring-boolean rewrite). The dictionary scan is distributed over
    termstats, pre-pruned to the prefixes' term ranges (pushed-down
    range predicates over the sorted dictionary layout — see
    _prefix_range_filter); only the MATCHED terms come to the driver,
    exactly what Lucene's rewrite enumerates, after which the normal
    bucket-pruned scoring path applies."""
    qdf = index.spark.createDataFrame(list(queries),
                                      "qid string, prefix string")
    ts = _prefix_range_filter(index.termstats.select("term"),
                              [p for _, p in queries])
    rows = (ts.join(F.broadcast(qdf),
                    F.col("term").startswith(F.col("prefix")))
            .select("qid", "term").collect())
    return [(r["qid"], r["term"], 1.0) for r in rows]


def expand_fuzzy_terms(index: Index, queries: Sequence[tuple[str, str]],
                       max_edits: int = 1,
                       use_trigram: bool | None = None,
                       transpositions: bool = False) -> QueryTerms:
    """Fuzzy rewrite: vocabulary terms within ``max_edits`` edits of
    the query term (Lucene FuzzyQuery). ``transpositions=False`` is
    plain Levenshtein — the repo's pinned-oracle default; pass
    ``transpositions=True`` for Lucene/ES parity (FuzzyQuery and the
    classic parser's ``term~`` default to transpositions=true, i.e.
    the OSA metric — engine/editdist.py). When the trigram sidecar
    exists (``use_trigram=None`` auto-detects) candidates come from
    the pigeonhole trigram prune — intersect-then-verify, the
    FST-automaton-walk analog — instead of a full dictionary scan;
    results are identical either way (the prune is exact in both
    metrics). The brute path is a dictionary scan with a length
    pre-filter (|len(t) − len(q)| ≤ max_edits holds for both metrics)
    and, in OSA mode, the JVM ``levenshtein ≤ 2e`` sandwich before
    the Python DP touches a row."""
    from .trigram import expand_fuzzy_terms_trigram, has_trigrams

    if use_trigram is None:
        use_trigram = has_trigrams(index)
    if use_trigram:
        return expand_fuzzy_terms_trigram(index, queries, max_edits,
                                          transpositions)
    qdf = index.spark.createDataFrame(list(queries),
                                      "qid string, qterm string")
    # JVM-only join condition (a pandas UDF can't sit in a join
    # predicate); the OSA DP verifies as a post-join filter over the
    # lev-prefiltered pairs.
    lev_cap = 2 * max_edits if transpositions else max_edits
    cond = ((F.abs(F.length("term") - F.length("qterm")) <= max_edits)
            & (F.levenshtein("term", "qterm") <= lev_cap))
    cand = index.termstats.select("term").join(F.broadcast(qdf), cond)
    if transpositions:
        from .editdist import osa_udf
        cand = cand.where(osa_udf("term", "qterm") <= max_edits)
    rows = cand.select("qid", "term").collect()
    return [(r["qid"], r["term"], 1.0) for r in rows]


def suggest_terms(index: Index, queries: Sequence[tuple[str, str]],
                  max_edits: int = 2, n: int = 5,
                  use_trigram: bool | None = None,
                  transpositions: bool = False) -> DataFrame:
    """Spell suggestion (Lucene ``DirectSpellChecker`` analog): for
    each (qid, input term), the top-``n`` vocabulary terms within
    ``max_edits`` Levenshtein edits, ranked the way DirectSpellChecker
    breaks ties — smaller edit distance first, then higher df (more
    popular corrections win), then term asc for determinism.  Exact
    matches (distance 0) are excluded: a suggestion must differ from
    the input.

    Plan shape: the dictionary scan is vocabulary-sized by
    construction (termstats, never postings), broadcast-joined against
    the tiny query list under a length pre-filter
    (|len(t) − len(q)| ≤ max_edits) that culls most of the vocabulary
    before the Levenshtein DP runs — Lucene's FST automaton
    intersection is an optimization of the same enumeration, as with
    :func:`expand_fuzzy_terms`.  When the trigram sidecar exists
    (``use_trigram=None`` auto-detects) the scan is replaced by the
    pigeonhole trigram prune (rank-identical; equivalence-tested).
    The rank window partitions by qid.
    ``transpositions=True`` ranks by the OSA distance instead
    (Lucene DirectSpellChecker's own default comparator uses the
    transposition-aware distance) — see :func:`expand_fuzzy_terms`.
    Returns (qid, suggestion, distance, df, rank).
    """
    from .trigram import has_trigrams, suggest_terms_trigram

    if use_trigram is None:
        use_trigram = has_trigrams(index)
    if use_trigram:
        return suggest_terms_trigram(index, queries, max_edits, n,
                                     transpositions)
    qdf = index.spark.createDataFrame(list(queries),
                                      "qid string, qterm string")
    lev = F.levenshtein("term", "qterm")
    lev_cap = 2 * max_edits if transpositions else max_edits
    cand = (index.termstats.select("term", "df")
            .join(F.broadcast(qdf),
                  (F.abs(F.length("term") - F.length("qterm"))
                   <= max_edits)
                  & (lev <= lev_cap) & (lev >= 1)))
    if transpositions:
        from .editdist import osa_udf
        dist = osa_udf("term", "qterm")
        cand = cand.withColumn("_osa", dist).where(
            (F.col("_osa") <= max_edits) & (F.col("_osa") >= 1))
        dist = F.col("_osa")
    else:
        dist = lev
    cand = cand.select("qid", F.col("term").alias("suggestion"),
                       dist.cast("int").alias("distance"), "df")
    w = Window.partitionBy("qid").orderBy(
        F.asc("distance"), F.desc("df"), F.asc("suggestion"))
    return (cand.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= n))


def complete_prefix(index: Index, queries: Sequence[tuple[str, str]],
                    n: int = 10) -> DataFrame:
    """Autocomplete / completion suggester (the dictionary half of
    Elasticsearch's ``completion`` suggester and Lucene's
    ``PrefixCompletionQuery``: enumerate dictionary entries under a
    prefix, ranked by a stored weight — here df, the corpus-popularity
    default): for each (qid, prefix), the top-``n`` vocabulary terms
    starting with the prefix, ranked df desc then term asc.

    Plan shape: a termstats scan pre-pruned to the prefixes'
    [p, next(p)) ranges, which the sorted-dictionary layout turns into
    parquet file/row-group pruning (_prefix_range_filter — the
    distributed analog of an FST prefix walk), then a broadcast join
    against the tiny prefix list and a qid-partitioned rank window.
    Never touches postings.  Returns (qid, term, df, rank).
    """
    qdf = index.spark.createDataFrame(list(queries),
                                      "qid string, prefix string")
    ts = _prefix_range_filter(index.termstats.select("term", "df"),
                              [p for _, p in queries])
    cand = (ts.join(F.broadcast(qdf),
                    F.col("term").startswith(F.col("prefix")))
            .select("qid", "term", "df"))
    w = Window.partitionBy("qid").orderBy(F.desc("df"), F.asc("term"))
    return (cand.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= n))


def count_matches(index: Index,
                  queries: Sequence[tuple[str, Sequence[str]]]) -> DataFrame:
    """``IndexSearcher.count(query)`` analog: the number of distinct
    documents matching ANY of the query's terms (the weighted-OR match
    set), without scoring or ranking. Lucene answers this with a
    TotalHitCountCollector that skips scoring entirely; here the plan
    is decode → explode doc_ids only (no tf/dl columns) → per-query
    distinct count. Queries whose terms are all absent return 0 (kept
    via the left join on the query list). Returns (qid, n_hits)."""
    spark = index.spark
    qt = [(q, t, 1.0) for q, terms in queries for t in sorted(set(terms))]
    qids = spark.createDataFrame([(q,) for q, _ in queries], "qid string")
    matched = _matched_postings(index, qt)
    dec = matched.withColumn("d", decode_udf("blob"))
    counts = (index.live(
        dec.select("qid", F.explode("d.doc_ids").alias("doc_id")))
              .groupBy("qid")
              .agg(F.count_distinct("doc_id").alias("n_hits")))
    return (qids.join(counts, "qid", "left")
            .select("qid", F.coalesce("n_hits", F.lit(0)).alias("n_hits"))
            .orderBy("qid"))


def random_score_topk(index: Index,
                      queries: Sequence[tuple[str, Sequence[str]]],
                      k: int, seed: int = 42) -> DataFrame:
    """``function_score`` with ``random_score`` in replace mode (the
    Elasticsearch deterministic random ranking: hash(seed, doc)
    uniform per document) — the standard "sample k matched docs per
    query, reproducibly" primitive for relevance-testing and dataset
    sampling.  Score = first 8 md5 hex digits of ``seed:doc_id`` over
    2^32 (the house cross-engine uniform, same recipe as
    curation.hash_sample), identical for a doc across queries exactly
    like ES's seeded random_score; ties broken doc_id asc.

    Plan: the weighted-OR match set (decode → explode doc_ids only,
    no tf/dl), liveDocs-filtered, then a per-qid rank window — the
    gate sits BEFORE the rank cut.  Returns (qid, doc_id, score,
    rank), score rounded 6 dp.
    """
    from engine.portable import round_half_up

    spark = index.spark
    qt = [(q, t, 1.0) for q, terms in queries for t in sorted(set(terms))]
    if not qt:
        return spark.createDataFrame(
            [], "qid string, doc_id long, score double, rank int")
    matched = _matched_postings(index, qt)
    dec = matched.withColumn("d", decode_udf("blob"))
    hits = index.live(
        dec.select("qid", F.explode("d.doc_ids").alias("doc_id"))
    ).select("qid", "doc_id").distinct()
    u = (F.conv(F.substring(
        F.md5(F.concat(F.lit(f"{seed}:"),
                       F.col("doc_id").cast("string"))), 1, 8),
        16, 10).cast("double") / F.lit(float(1 << 32)))
    scored = hits.withColumn("score", round_half_up(u, 6))
    w = Window.partitionBy("qid").orderBy(F.desc("score"),
                                          F.asc("doc_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("qid", "doc_id", "score", "rank")
            .orderBy("qid", "rank"))


def collection_stats(index: Index) -> DataFrame:
    """Lucene ``CollectionStatistics`` / ``IndexReader`` counters as a
    one-row DataFrame: maxDoc, sumTotalTermFreq, avg doc length,
    vocabulary size and total postings — all from the index's own
    termstats/stats tables (no corpus re-scan). avgdl is rounded to
    6 dp for engine-stable comparison."""
    from engine.portable import round_half_up

    ts = (index.termstats
          .agg(F.count_distinct("term").alias("vocab_size"),
               F.sum("df").alias("total_postings")))
    return ts.select(
        F.lit(index.n_docs).cast("long").alias("n_docs"),
        F.lit(int(index.stats["total_tokens"])).alias("total_tokens"),
        round_half_up(F.lit(float(index.avgdl)), 6).alias("avgdl"),
        F.col("vocab_size").cast("long").alias("vocab_size"),
        F.col("total_postings").cast("long").alias("total_postings"))


def field_sorted_topk(index: Index,
                      queries: Sequence[tuple[str, Sequence[str]]],
                      field_df: DataFrame, k: int,
                      descending: bool = True) -> DataFrame:
    """Lucene ``Sort(SortField)`` analog: the query's match set (docs
    containing ANY term) ranked by a STORED FIELD instead of the
    relevance score, ties broken by ascending doc_id.

    ``field_df``: (doc_id, sort_key) — at scale a columnar doc-values
    table (numeric parquet column), joined to the match set AFTER the
    distinct, so the wide field column never rides through the
    postings decode or the distinct shuffle.
    Returns (qid, doc_id, sort_key, rank) ordered by (qid, rank)."""
    qt = [(q, t, 1.0) for q, terms in queries for t in sorted(set(terms))]
    matched = _matched_postings(index, qt)
    dec = matched.withColumn("d", decode_udf("blob"))
    hits = (index.live(
        dec.select("qid", F.explode("d.doc_ids").alias("doc_id")))
            .distinct()
            .join(field_df.select("doc_id", "sort_key"), "doc_id"))
    key = F.desc("sort_key") if descending else F.asc("sort_key")
    w = Window.partitionBy("qid").orderBy(key, F.asc("doc_id"))
    return (hits.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("qid", "doc_id", "sort_key", "rank")
            .orderBy("qid", "rank"))


def expand_regexp_terms(index: Index,
                        queries: Sequence[tuple[str, str]]) -> QueryTerms:
    """Regexp rewrite (Lucene RegexpQuery's scoring-boolean rewrite):
    enumerate vocabulary terms whose ENTIRE text matches the pattern
    (Lucene anchors implicitly; we anchor explicitly). Distributed
    dictionary scan over termstats, like the prefix/wildcard/fuzzy
    rewrites. Patterns must stay in the RE2-safe subset (no
    lookaround) so the DuckDB oracle can reproduce the scan."""
    pats = [(q, f"^(?:{p})$") for q, p in queries]
    qdf = index.spark.createDataFrame(pats, "qid string, pat string")
    ts = _prefix_range_filter(index.termstats.select("term"),
                              [_regex_literal_head(p) for _, p in queries])
    rows = (ts.join(F.broadcast(qdf), F.expr("term RLIKE pat"))
            .select("qid", "term").collect())
    return [(r["qid"], r["term"], 1.0) for r in rows]


def regexp_topk(index: Index, queries: Sequence[tuple[str, str]],
                k: int) -> DataFrame:
    """BM25 top-k for regexp queries (dictionary rewrite)."""
    return score_exhaustive(index, expand_regexp_terms(index, queries), k)


def expand_range_terms(index: Index,
                       queries: Sequence[tuple[str, str, str]]) -> QueryTerms:
    """Term-range rewrite (Lucene TermRangeQuery): every vocabulary
    term in [lo, hi) by codepoint order — lo inclusive, hi exclusive
    (Lucene's includeLower=true/includeUpper=false form). Same
    distributed dictionary scan as the other MultiTermQuery rewrites."""
    qdf = index.spark.createDataFrame(list(queries),
                                      "qid string, lo string, hi string")
    ts = index.termstats.select("term")
    # coarse pushable envelope over the batch: [min lo, max hi)
    los = [lo for _, lo, _ in queries]
    his = [hi for _, _, hi in queries]
    if los and all(not any(ord(c) > 0x7e for c in s) for s in los + his):
        ts = ts.where((F.col("term") >= F.lit(min(los)))
                      & (F.col("term") < F.lit(max(his))))
    rows = (ts.join(F.broadcast(qdf),
                  (F.col("term") >= F.col("lo")) & (F.col("term") < F.col("hi")))
            .select("qid", "term").collect())
    return [(r["qid"], r["term"], 1.0) for r in rows]


def term_range_topk(index: Index, queries: Sequence[tuple[str, str, str]],
                    k: int) -> DataFrame:
    """BM25 top-k for term-range queries (dictionary rewrite)."""
    return score_exhaustive(index, expand_range_terms(index, queries), k)


BooleanClauses = Sequence[tuple[str, Sequence[str], Sequence[str],
                                Sequence[str]]]


def boolean_topk(index: Index, queries: BooleanClauses, k: int,
                 k1: float | None = None,
                 b: float | None = None,
                 min_should: int = 0,
                 doc_filter: DataFrame | None = None,
                 lead_max_df: int = BOOLEAN_LEAD_MAX_DF,
                 lead_min_saved: int = BOOLEAN_LEAD_MIN_SAVED,
                 use_kernel: bool = True) -> DataFrame:
    """Generic Lucene BooleanQuery analog — each query is
    (qid, must, should, must_not).

    Semantics (Lucene BooleanWeight, minimumNumberShouldMatch=0):
    a doc matches iff it contains ALL ``must`` terms, NONE of the
    ``must_not`` terms, and — when ``must`` is empty — at least one
    ``should`` term (matching is what creates scoring rows, so that
    holds structurally; pure-negation queries are unsatisfiable, as
    in Lucene). Score = Σ BM25 over the doc's must+should occurrences;
    must_not never contributes. ``min_should`` is Lucene's
    ``minimumNumberShouldMatch``: when > 0, a doc must additionally
    match at least that many distinct should terms — and, as in
    BooleanWeight, a query with fewer should clauses than the minimum
    matches nothing. ``doc_filter`` (doc_id column) restricts matching
    BEFORE the top-k cut, like score_exhaustive's FILTER clause — the
    query parser uses it for phrase gating.

    Plan shape: ONE decode of the scoring terms' postings feeds both
    the must-count gate and the score aggregation (same (qid, doc_id)
    shuffle keys, so the exchange is reused); must_not lists are
    decoded separately (they are not in the scoring set) and applied
    as a left_anti join. Everything is bucket-pruned + broadcast on
    the query side like the other query paths.

    Scale path (VERDICT r2 item 3): a query whose RAREST must term has
    df ≤ ``lead_max_df`` is gated by that term's broadcast doc set
    BEFORE the (qid, doc) shuffle — sound because every result doc
    must contain all must terms, so dropping scoring rows of docs
    absent from one must list changes nothing; the shuffle then
    carries ≤ |lead| × n_terms rows instead of Σ df (the ~72M-row
    explosion BENCH.md measured at k=1000 on head terms). Engaged only
    when it saves ≥ ``lead_min_saved`` postings (small-scale job-count
    discipline, same gating as boolean_and).
    Kernel routing (default): a PURE-SHOULD query (no must, no
    must_not — the common bag-of-words case the query parser emits for
    plain terms) is exactly a weight-1.0 weighted OR and routes
    through :func:`score_wand`; a CLAUSED query (must and/or must_not)
    routes through :func:`boolean_wand`, whose per-shard kernel
    decides eligibility locally (conjunction-driven candidates,
    exclusion mask at decode) and ships compressed block runs instead
    of the exploded (qid, doc) score rows below — same results by
    construction (equivalence tests compare both). The explode plan
    remains for ``min_should > 0``, ``doc_filter``, k1/b overrides,
    pure-negation queries (which match nothing), and
    ``use_kernel=False``.
    Returns (qid, doc_id, score, rank) ordered by (qid, rank).
    """
    spark = index.spark
    pure_qids: set[str] = set()
    claused_qids: set[str] = set()
    if (use_kernel and min_should == 0 and doc_filter is None
            and k1 is None and b is None):
        pure_qids = {q for q, m, s, n_ in queries
                     if not m and not n_ and s}
        claused_qids = {q for q, m, s, n_ in queries
                        if (m or n_) and (m or s)}
    if pure_qids or claused_qids:
        parts = []
        if pure_qids:
            simple_qt = [(q, t, 1.0) for q, _m, s, _n in queries
                         if q in pure_qids for t in sorted(set(s))]
            parts.append(score_wand(index, simple_qt, k))
        if claused_qids:
            parts.append(boolean_wand(
                index, [qc for qc in queries if qc[0] in claused_qids], k))
        rest = [qc for qc in queries
                if qc[0] not in pure_qids and qc[0] not in claused_qids]
        if rest:
            parts.append(boolean_topk(index, rest, k, k1, b, min_should,
                                      doc_filter, lead_max_df,
                                      lead_min_saved, use_kernel=False))
        if len(parts) == 1:
            return parts[0]
        out = parts[0]
        for p_ in parts[1:]:
            out = out.unionByName(p_)
        return out.orderBy("qid", "rank")
    score_qt = [(q, t, 1.0) for q, m, s, _n in queries
                for t in sorted(set(m) | set(s))]
    matched = _matched_postings(index, score_qt)
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
    rows = index.live(rows)
    if doc_filter is not None:
        rows = rows.join(doc_filter.select("doc_id").distinct(),
                         "doc_id", "left_semi")
    # must-lead gating (shortest-list-first intersection, distributed)
    dfm = index.df_map([t for q, m, _s, _n in queries for t in set(m)])
    lead: dict[str, str] = {}
    for q, m, s, _n in queries:
        ms = [t for t in set(m) if t in dfm]
        if not ms or len(ms) < len(set(m)):
            continue   # no must terms, or one absent (query is empty)
        rare = min(ms, key=lambda t: (dfm[t], t))
        saved = sum(dfm.get(t, 0) for t in set(m) | set(s)) - dfm[rare]
        if dfm[rare] <= lead_max_df and saved >= lead_min_saved:
            lead[q] = rare
    if lead:
        lead_qt = [(q, t, 1.0) for q, t in lead.items()]
        lead_dec = _matched_postings(index, lead_qt) \
            .withColumn("d", decode_udf("blob"))
        lead_docs = (lead_dec
                     .select("qid", F.explode("d.doc_ids").alias("doc_id"))
                     .distinct()
                     .withColumn("_keep", F.lit(1)))
        rows = (rows.join(F.broadcast(lead_docs), ["qid", "doc_id"],
                          "left")
                .where(F.col("_keep").isNotNull()
                       | ~F.col("qid").isin(list(lead)))
                .drop("_keep"))
    # must-count gate over the SAME decoded rows
    must_pairs = [(q, t) for q, m, _s, _n in queries for t in sorted(set(m))]
    n_must = [(q, len(set(m))) for q, m, _s, _n in queries]
    nm = F.broadcast(spark.createDataFrame(n_must,
                                           "qid string, n_must int"))
    if must_pairs:
        mq = F.broadcast(spark.createDataFrame(must_pairs,
                                               "qid string, term string"))
        hit = (rows.join(mq, ["qid", "term"])
               .groupBy("qid", "doc_id")
               .agg(F.count_distinct("term").alias("n_hit")))
    else:
        hit = spark.createDataFrame(
            [], "qid string, doc_id long, n_hit int")
    eligible = (rows.select("qid", "doc_id").distinct()
                .join(hit, ["qid", "doc_id"], "left")
                .join(nm, "qid")
                .where(F.coalesce(F.col("n_hit"), F.lit(0))
                       == F.col("n_must"))
                .select("qid", "doc_id"))
    if min_should > 0:
        sh_pairs = [(q, t) for q, _m, s, _n in queries
                    for t in sorted(set(s))]
        if sh_pairs:
            shq = F.broadcast(spark.createDataFrame(
                sh_pairs, "qid string, term string"))
            sh_hit = (rows.join(shq, ["qid", "term"])
                      .groupBy("qid", "doc_id")
                      .agg(F.count_distinct("term").alias("n_sh")))
        else:
            sh_hit = spark.createDataFrame(
                [], "qid string, doc_id long, n_sh int")
        eligible = (eligible.join(sh_hit, ["qid", "doc_id"], "left")
                    .where(F.coalesce(F.col("n_sh"), F.lit(0))
                           >= min_should)
                    .select("qid", "doc_id"))
    not_qt = [(q, t, 1.0) for q, _m, _s, n in queries for t in sorted(set(n))]
    if not_qt:
        not_dec = _matched_postings(index, not_qt) \
            .withColumn("d", decode_udf("blob"))
        not_docs = (not_dec
                    .select("qid", F.explode("d.doc_ids").alias("doc_id"))
                    .distinct())
        eligible = eligible.join(not_docs, ["qid", "doc_id"], "left_anti")
    ts = index.termstats.select("term", "df")
    srows = rows.join(F.broadcast(
        ts.join(_query_df(spark, score_qt).select("term").distinct(),
                "term")), "term")
    scored = srows.withColumn(
        "pscore",
        F.col("weight") * bm25_col(F.col("tf"), F.col("df"), F.col("dl"),
                                   index.avgdl, float(index.n_docs),
                                   k1 if k1 is not None else index.stats["k1"],
                                   b if b is not None else index.stats["b"]))
    agg = (scored.groupBy("qid", "doc_id").agg(F.sum("pscore").alias("score"))
           .join(eligible, ["qid", "doc_id"], "left_semi"))
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_id"))
    return (agg.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("qid", "doc_id", "score", "rank")
            .orderBy("qid", "rank"))


def score_explain(index: Index, query_terms: QueryTerms,
                  doc_ids: Sequence[int],
                  k1: float | None = None,
                  b: float | None = None) -> DataFrame:
    """Score-breakdown for specific (query, doc) pairs — the
    ``IndexSearcher.explain`` analog: one row per contributing term
    with every formula input exposed.

    Returns (qid, doc_id, term, weight, tf, df, dl, idf, pscore)
    ordered by (qid, doc_id, term); Σ pscore over a (qid, doc_id)
    group equals that doc's score_exhaustive score exactly (same
    column math). The doc filter applies right after decode, so only
    the requested docs' rows survive to the small output."""
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
    ).where(F.col("doc_id").isin([int(d) for d in doc_ids]))
    ts = index.termstats.select("term", "df")
    rows = rows.join(F.broadcast(
        ts.join(_query_df(index.spark, query_terms).select("term").distinct(),
                "term")), "term")
    idf = idf_col(F.col("df").cast("double"), float(index.n_docs))
    pscore = F.col("weight") * bm25_col(
        F.col("tf"), F.col("df"), F.col("dl"), index.avgdl,
        float(index.n_docs),
        k1 if k1 is not None else index.stats["k1"],
        b if b is not None else index.stats["b"])
    return (rows.select("qid", "doc_id", "term", "weight", "tf", "df",
                        "dl", idf.alias("idf"), pscore.alias("pscore"))
            .orderBy("qid", "doc_id", "term"))


def wildcard_to_like(pattern: str) -> str:
    """Lucene wildcard syntax → SQL LIKE: '*' = any run → '%',
    '?' = one char → '_'. Index terms are lowercase alnum, so the LIKE
    metacharacters never occur literally and need no escaping."""
    return pattern.replace("*", "%").replace("?", "_")


def expand_wildcard_terms(index: Index,
                          queries: Sequence[tuple[str, str]]) -> QueryTerms:
    """Wildcard rewrite (Lucene WildcardQuery scoring-boolean rewrite):
    enumerate vocabulary terms matching the pattern via a distributed
    dictionary scan with SQL LIKE. A leading wildcard forces a full
    vocabulary scan — the cost Lucene's docs warn about — but here the
    scan distributes over termstats instead of walking a single-node
    term dictionary."""
    pats = [(q, wildcard_to_like(p)) for q, p in queries]
    qdf = index.spark.createDataFrame(pats, "qid string, pat string")
    ts = _prefix_range_filter(index.termstats.select("term"),
                              [_literal_head(p, "*?") for _, p in queries])
    rows = (ts.join(F.broadcast(qdf), F.expr("term LIKE pat"))
            .select("qid", "term").collect())
    return [(r["qid"], r["term"], 1.0) for r in rows]


def wildcard_topk(index: Index, queries: Sequence[tuple[str, str]],
                  k: int) -> DataFrame:
    """BM25 top-k for wildcard queries (LIKE dictionary rewrite)."""
    return score_exhaustive(index, expand_wildcard_terms(index, queries), k)


def more_like_this(index: Index, seed_ids: Sequence[int], k: int,
                   n_terms: int = 25) -> DataFrame:
    """Lucene MoreLikeThis analog: treat a document as the query.

    Per seed doc: rank its terms by tf·idf (the MLT "interesting
    terms" heuristic; idf is the engine's pinned BM25 idf), keep the
    top ``n_terms`` (rounded-score desc, term asc — deterministic
    cross-engine), issue them as a weight-1.0 weighted-OR query, and
    exclude the seed itself from the hits (MLT's default). qid is the
    seed doc_id as a string.

    The forward lookup (doc → terms) reuses the build's tf table; at
    cluster scale that table is doc-bucketed parquet, so the seed
    filter prunes files. The interesting-term sets (n_seeds × n_terms
    rows) come to the driver exactly like RM3's expansion terms do.
    """
    from .portable import round_half_up

    p = _paths(index.index_dir)
    seeds = [int(s) for s in seed_ids]
    tf_seed = (index.spark.read.parquet(p["tf"])
               .where(F.col("doc_id").isin(seeds))
               .select("doc_id", "term", "tf"))
    scored = (index.termstats.select("term", "df")
              .join(F.broadcast(tf_seed), "term")
              .withColumn("tfidf", F.col("tf").cast("double") *
                          idf_col(F.col("df").cast("double"),
                                  float(index.n_docs))))
    r = round_half_up(F.col("tfidf"), 6)
    w = Window.partitionBy("doc_id").orderBy(r.desc(), F.asc("term"))
    top = (scored.withColumn("rnk", F.row_number().over(w))
           .where(F.col("rnk") <= n_terms)
           .select("doc_id", "term").collect())
    qt = [(str(r_["doc_id"]), r_["term"], 1.0) for r_ in top]
    if not qt:
        return index.spark.createDataFrame(
            [], "qid string, doc_id long, score double, rank int")
    res = score_exhaustive(index, qt, k + 1)
    res = res.where(F.col("qid") != F.col("doc_id").cast("string"))
    w2 = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_id"))
    return (res.withColumn("rank", F.row_number().over(w2))
            .where(F.col("rank") <= k)
            .select("qid", "doc_id", "score", "rank")
            .orderBy("qid", "rank"))


def more_like_text(index: Index, queries: Sequence[tuple[str, str]],
                   k: int, n_terms: int = 25) -> DataFrame:
    """The free-text half of the ES More-Like-This API (``like`` also
    accepts raw text, not only indexed doc ids): analyze the text with
    the INDEX's analyzer (stem/fold parity — the stale-analyzer class
    of bug), rank its terms by tf·idf against the index's df table,
    keep the top ``n_terms`` (rounded tf·idf desc, term asc), and
    issue them as a weight-1.0 weighted-OR BM25 query. No seed doc to
    exclude. Term selection is driver-side arithmetic over the
    analyzed text + a bucket-pruned df lookup — no corpus pass before
    the final scoring query. Returns (qid, doc_id, score, rank)."""
    import math as _math

    from .analysis import tokenize_texts

    opts = index.analyzer_opts()
    all_tf: dict[str, dict[str, int]] = {}
    for qid, text in queries:
        toks = tokenize_texts([text], **opts)[0]
        cnt: dict[str, int] = {}
        for t in toks:
            cnt[t] = cnt.get(t, 0) + 1
        all_tf[qid] = cnt
    vocab = sorted({t for c in all_tf.values() for t in c})
    dfm = index.df_map(vocab)          # bucket-pruned dictionary lookup
    n = float(index.n_docs)
    qt: QueryTerms = []
    for qid, cnt in all_tf.items():
        scored = []
        for t, tf in cnt.items():
            df = dfm.get(t)
            if df is None:             # not in vocabulary → no signal
                continue
            idf = _math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            s = _math.floor(tf * idf * 1e6 + 0.5) / 1e6  # house rhu(6)
            scored.append((-s, t))
        for _, t in sorted(scored)[:n_terms]:
            qt.append((qid, t, 1.0))
    if not qt:
        return index.spark.createDataFrame(
            [], "qid string, doc_id long, score double, rank int")
    return score_exhaustive(index, qt, k)


def _doc_lengths(index: Index) -> DataFrame:
    """(doc_id, dl) from the forward tf table — the single definition
    of analyzed doc length every length-consuming agg shares (sum of
    tf, the same stat the build computes for avgdl)."""
    p = _paths(index.index_dir)
    return (index.spark.read.parquet(p["tf"])
            .groupBy("doc_id").agg(F.sum("tf").alias("dl")))


def facet_counts(index: Index, queries: Sequence[tuple[str, Sequence[str]]],
                 facet_col: str, k: int) -> DataFrame:
    """Faceting analog (Lucene facets module): for each query, the
    top-k values of a stored doc field over the MATCHED document set
    (docs containing ≥1 query term), with distinct-doc counts.
    Ordered by (n_docs desc, value asc). The matched set comes from
    the same bucket-pruned posting decode as scoring; the facet field
    joins in from the docs table (broadcast the hit side when small,
    AQE's call); the count is one map-side-combinable hash agg."""
    qt = [(q, t, 1.0) for q, terms in queries for t in set(terms)]
    matched = _matched_postings(index, qt)
    dec = matched.withColumn("d", decode_udf("blob"))
    hits = (dec.select("qid", F.explode("d.doc_ids").alias("doc_id"))
            .distinct())
    vals = hits.join(index.docs.select("doc_id",
                                       F.col(facet_col).alias("value")),
                     "doc_id")
    agg = vals.groupBy("qid", "value").agg(
        F.count_distinct("doc_id").alias("n_docs"))
    w = Window.partitionBy("qid").orderBy(F.desc("n_docs"), F.asc("value"))
    return (agg.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("qid", "value", "n_docs", "rank")
            .orderBy("qid", "rank"))


def top_hits_agg(index: Index, queries: Sequence[tuple[str, Sequence[str]]],
                 facet_col: str, n_buckets: int,
                 hits_per_bucket: int) -> DataFrame:
    """ES ``terms`` aggregation with a ``top_hits`` sub-aggregation:
    for each query, the top-``n_buckets`` values of a stored doc field
    over the matched set (by distinct-doc count, value asc tiebreak —
    the ES terms-agg order), and within each bucket the
    ``hits_per_bucket`` best docs by BM25 (rounded score desc, doc_id
    asc). Returns (qid, value, n_docs, bucket_rank, doc_id, score,
    hit_rank).

    Gate-before-cut: a bucket's best doc can sit arbitrarily deep in
    the GLOBAL ranking (the same trap as collapse/field grouping), so
    the per-bucket window runs over the full exhaustively-scored match
    set, never a post-filter of a global top-k. At scale, a selective
    bucket is better served by re-running the WAND kernel with that
    bucket's doc set as ``doc_filter`` — this operator is the
    correctness-exact reference shape (one posting decode, one hash
    agg, two qid-partitioned windows)."""
    from .portable import round_half_up

    qt = [(q, t, 1.0) for q, terms in queries for t in set(terms)]
    scored = score_exhaustive(index, qt, None)
    vals = scored.join(
        index.docs.select("doc_id", F.col(facet_col).alias("value")),
        "doc_id")
    bw = Window.partitionBy("qid").orderBy(F.desc("n_docs"), F.asc("value"))
    buckets = (vals.groupBy("qid", "value")
               .agg(F.count(F.lit(1)).alias("n_docs"))  # 1 row/(qid,doc)
               .withColumn("bucket_rank", F.row_number().over(bw))
               .where(F.col("bucket_rank") <= n_buckets))
    r = round_half_up(F.col("score"), 4)
    hw = Window.partitionBy("qid", "value").orderBy(r.desc(), F.asc("doc_id"))
    return (vals.join(buckets, ["qid", "value"])
            .withColumn("hit_rank", F.row_number().over(hw))
            .where(F.col("hit_rank") <= hits_per_bucket)
            .select("qid", "value", F.col("n_docs").cast("long").alias("n_docs"),
                    "bucket_rank", "doc_id", r.alias("score"), "hit_rank")
            .orderBy("qid", "bucket_rank", "hit_rank"))


def prefix_topk(index: Index, queries: Sequence[tuple[str, str]],
                k: int) -> DataFrame:
    """BM25 top-k for prefix queries (scoring-boolean rewrite)."""
    return score_exhaustive(index, expand_prefix_terms(index, queries), k)


def match_bool_prefix_topk(index: Index,
                           queries: Sequence[tuple[str, str]],
                           k: int) -> DataFrame:
    """ES ``match_bool_prefix`` — the query behind the
    ``search_as_you_type`` field's default multi_match mode: the input
    analyzes to terms, every term but the LAST becomes a BM25 term
    clause (multiplicity = weight, the term-bag convention), and the
    last becomes a PREFIX clause under Lucene's in-bool default
    rewrite — CONSTANT_SCORE (+1.0 for docs matching any expansion),
    NOT prefix_topk's scoring-boolean rewrite. All clauses are SHOULD:
    a doc matching only the prefix still ranks (at 1.0), and a
    single-token query degenerates to a constant-score prefix match
    ranked by doc_id — ES's actual behavior there. A query whose text
    analyzes empty returns no rows.

    Plan: the term clauses ride the normal bucket-pruned exhaustive
    scorer; the prefix expansions come from the sorted range-pruned
    dictionary (expand_prefix_terms) and their matched set is ONE
    distinct (qid, doc) decode; full outer join + coalesce sums the
    two sides, the rank cut LAST (gate-before-cut: a prefix-only doc
    can out-rank a weak term match). Returns (qid, doc_id, score,
    rank) with the 4dp-rounded house ordering."""
    from .analysis import tokenize_texts
    from .portable import round_half_up

    opts = index.analyzer_opts()
    term_qt: list[tuple[str, str, float]] = []
    pref: list[tuple[str, str]] = []
    for qid, text in queries:
        toks = tokenize_texts([text], **opts)[0]
        if not toks:
            continue
        pref.append((qid, toks[-1]))
        w: dict[str, float] = {}
        for t in toks[:-1]:
            w[t] = w.get(t, 0.0) + 1.0
        term_qt += [(qid, t, wt) for t, wt in sorted(w.items())]
    spark = index.spark
    if not pref:
        return spark.createDataFrame(
            [], "qid string, doc_id long, score double, rank int")

    exp = expand_prefix_terms(index, pref)
    by_q: dict[str, list[str]] = {}
    for q, t, _ in exp:
        by_q.setdefault(q, []).append(t)
    sides = []
    if term_qt:
        sides.append(score_exhaustive(index, term_qt, None)
                     .select("qid", "doc_id",
                             F.col("score").alias("s_term")))
    if by_q:
        sides.append(_matched_hits(index, sorted(by_q.items()))
                     .select("qid", "doc_id",
                             F.lit(1.0).alias("s_pref")))
    if not sides:
        return spark.createDataFrame(
            [], "qid string, doc_id long, score double, rank int")
    if len(sides) == 2:
        both = sides[0].join(sides[1], ["qid", "doc_id"], "full_outer")
    else:
        only = sides[0]
        missing = "s_pref" if "s_pref" not in only.columns else "s_term"
        both = only.withColumn(missing, F.lit(None).cast("double"))
    total = (F.coalesce(F.col("s_term"), F.lit(0.0)) +
             F.coalesce(F.col("s_pref"), F.lit(0.0)))
    r = round_half_up(total, 4)
    w = Window.partitionBy("qid").orderBy(r.desc(), F.asc("doc_id"))
    return (both.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= int(k))
            .select("qid", "doc_id", r.alias("score"), "rank")
            .orderBy("qid", "rank"))


def fuzzy_topk(index: Index, queries: Sequence[tuple[str, str]],
               k: int, max_edits: int = 1,
               transpositions: bool = False) -> DataFrame:
    """BM25 top-k for fuzzy queries (edit-distance term rewrite).
    ``transpositions=True`` = Lucene/ES FuzzyQuery default (OSA)."""
    return score_exhaustive(
        index,
        expand_fuzzy_terms(index, queries, max_edits,
                           transpositions=transpositions), k)


def _matched_hits(index: Index, queries: Sequence[tuple[str, Sequence[str]]],
                  ) -> DataFrame:
    """Distinct (qid, doc_id) matched set (docs containing >=1 query
    term), via the same bucket-pruned posting decode as scoring, with
    tombstoned docs masked."""
    qt = [(q, t, 1.0) for q, terms in queries for t in set(terms)]
    dec = _matched_postings(index, qt).withColumn("d", decode_udf("blob"))
    hits = (dec.select("qid", F.explode("d.doc_ids").alias("doc_id"))
            .distinct())
    return index.live(hits)


def _matched_hits_dl(index: Index,
                     queries: Sequence[tuple[str, Sequence[str]]],
                     ) -> DataFrame:
    """Distinct (qid, doc_id, dl) matched set: :func:`_matched_hits`
    with each doc's analyzed length riding the SAME decode (dl is
    stored per posting — the no-doclens-join design the scorers
    already use). The length-consuming aggs previously joined
    ``_doc_lengths`` onto the hit set, i.e. a full re-aggregation of
    the forward tf table per query (at cluster scale: a second
    complete pass over the forward index) to recover a value the
    decoded postings already carried (r6). ``max`` is an arbitrary
    pick of the per-doc constant (every posting of a doc stores the
    same dl)."""
    qt = [(q, t, 1.0) for q, terms in queries for t in set(terms)]
    dec = _matched_postings(index, qt).withColumn("d", decode_udf("blob"))
    rows = (dec.select(
        "qid", F.explode(F.arrays_zip("d.doc_ids", "d.dls")).alias("e"))
        .select("qid", F.col("e.doc_ids").alias("doc_id"),
                F.col("e.dls").alias("dl")))
    hits = rows.groupBy("qid", "doc_id").agg(F.max("dl").alias("dl"))
    return index.live(hits)


def significant_terms(index: Index,
                      queries: Sequence[tuple[str, Sequence[str]]],
                      n: int) -> DataFrame:
    """Significant-terms aggregation (the Elasticsearch
    ``significant_terms`` bucket agg; reference delegates search to the
    Lucene stack this agg ships with). For each query, the terms most
    over-represented in the MATCHED doc set relative to the corpus,
    scored by the ES JLH heuristic:

        jlh = (fg_pct - bg_pct) * (fg_pct / bg_pct)

    with fg_pct = fg_df / |foreground| and bg_pct = df / N. Only
    over-represented terms (fg_pct > bg_pct) qualify; the query terms
    themselves are not excluded (ES default — they rank, trivially).
    Deterministic rank: 6dp-rounded score desc, term asc.

    Scale: the foreground (qid, doc) set equi-joins the doc-bucketed
    forward tf table on doc_id (file-pruned parquet at cluster scale),
    the per-(qid, term) fg_df agg is map-side combinable, the per-query
    foreground sizes broadcast (|queries| rows), and the candidate
    terms equi-join termstats on term — no second corpus pass: the
    background model IS the already-built termstats table.
    Returns (qid, term, fg_df, df, score, rank) ordered by qid, rank.
    """
    from .portable import round_half_up

    hits = _matched_hits(index, queries)
    p = _paths(index.index_dir)
    tfw = index.spark.read.parquet(p["tf"]).select("doc_id", "term")
    # plain counts, NOT count_distinct: hits is distinct (qid, doc_id)
    # by construction and the forward tf table carries exactly one row
    # per (term, doc_id) — the build aggregates on that key and
    # updates append only fresh doc_ids — so the counts are equal and
    # the plain count genuinely map-side-combines (count_distinct
    # forces a two-phase Expand/dedup keyed (qid, term, doc_id) first)
    fg = (hits.join(tfw, "doc_id")
          .groupBy("qid", "term")
          .agg(F.count(F.lit(1)).alias("fg_df")))
    fg_n = hits.groupBy("qid").agg(F.count(F.lit(1)).alias("fg_n"))
    cand = (fg.join(F.broadcast(fg_n), "qid")
            .join(index.termstats.select("term", "df"), "term"))
    fg_pct = F.col("fg_df").cast("double") / F.col("fg_n").cast("double")
    bg_pct = F.col("df").cast("double") / F.lit(float(index.n_docs))
    jlh = (fg_pct - bg_pct) * (fg_pct / bg_pct)
    scored = (cand.where(fg_pct > bg_pct)
              .select("qid", "term", "fg_df", "df",
                      round_half_up(jlh, 6).alias("score")))
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("term"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= n)
            .select("qid", "term", "fg_df", "df", "score", "rank")
            .orderBy("qid", "rank"))


def rare_terms_agg(index: Index,
                   queries: Sequence[tuple[str, Sequence[str]]],
                   max_doc_count: int = 1) -> DataFrame:
    """Rare-terms aggregation (the Elasticsearch ``rare_terms`` bucket
    agg — the long-tail counterpart of ``terms``): for each query, the
    terms whose doc count WITHIN the matched set is <= max_doc_count.
    ES documents its implementation as approximate (a CuckooFilter
    sieve, default ~1% false positives, dropping terms as they cross
    the threshold — a single-node memory concession); this engine
    computes the exact answer, because on Spark the agg is just one
    map-side-combinable (qid, term) count over the forward tf join and
    needs no bounded-memory sieve.

    Returns (qid, term, fg_df, df) ordered by qid, fg_df asc, term
    asc — fg_df is the in-matched-set doc count, df the corpus-wide
    one from termstats (ES reports the same pair per bucket).

    Scale: identical shuffle shape to significant_terms — the matched
    (qid, doc) set equi-joins the doc-bucketed forward tf table, one
    hash agg with map-side combine produces fg_df, and the background
    df is the already-built termstats table (no second corpus pass).
    The <= filter sits ABOVE the agg (it needs the total), but the agg
    output is bounded by |matched| x distinct-terms-per-doc, the same
    class ES pays. Reference: search delegated to the Lucene stack
    that ships this agg (GROUP_12 SearchFiles.java:1).
    """
    hits = _matched_hits(index, queries)
    p = _paths(index.index_dir)
    tfw = index.spark.read.parquet(p["tf"]).select("doc_id", "term")
    # plain count, not count_distinct — see significant_terms: the
    # (qid, doc_id, term) rows are unique by construction, and the
    # plain count is the one that map-side-combines (measured hottest
    # path: 325k-bucket long tail at 527k docs)
    fg = (hits.join(tfw, "doc_id")
          .groupBy("qid", "term")
          .agg(F.count(F.lit(1)).alias("fg_df")))
    return (fg.where(F.col("fg_df") <= int(max_doc_count))
            .join(index.termstats.select("term", "df"), "term")
            .select("qid", "term", "fg_df", "df")
            .orderBy("qid", "fg_df", "term"))


def sampler_facet(index: Index,
                  queries: Sequence[tuple[str, Sequence[str]]],
                  field: str, shard_size: int,
                  dedup_expr: Column | None = None,
                  max_per_value: int = 1) -> DataFrame:
    """Sampler / diversified_sampler aggregation (the Elasticsearch
    ``sampler`` and ``diversified_sampler`` bucket aggs): run a child
    terms facet on ``field`` over only the ``shard_size`` best-scoring
    hits instead of the full matched set — the standard trick for
    making expensive child aggs (significant_terms and friends)
    affordable on huge match sets.

    With ``dedup_expr`` the sample is DIVERSIFIED first: at most
    ``max_per_value`` docs per dedup key survive (in score order), and
    the shard_size cut applies to the survivors — ES's semantics,
    where de-duplication happens before the sample fills, so one
    over-represented key cannot crowd out the sample.

    Rank order is the engine's deterministic contract: 4dp-rounded
    BM25 desc, doc_id asc (rounded BEFORE every cut so both the dedup
    window and the sample cut reproduce cross-engine — the CLAUDE.md
    float discipline; exact-score ordering flips real ties).

    Returns (qid, value, n_docs) ordered by qid, value.

    Scale: the scored match set never leaves the cluster — the dedup
    window partitions on (qid, dedup key) and the sample window on
    qid (both genuine partitionings, never a global window), then one
    hash agg on (qid, value); shard_size bounds the sampled rows per
    query so the child agg's input is k-sized regardless of corpus.
    Reference: search delegated to the Lucene stack that ships this
    agg (GROUP_12 SearchFiles.java:1).
    """
    from .portable import round_half_up

    qt = [(q, t, 1.0) for q, terms in queries for t in sorted(set(terms))]
    scored = score_exhaustive(index, qt, k=None)
    rows = (scored.join(index.docs.select("doc_id", field), "doc_id")
            .withColumn("rscore", round_half_up(F.col("score"), 4)))
    order = [F.desc("rscore"), F.asc("doc_id")]
    if dedup_expr is not None:
        wd = Window.partitionBy("qid", dedup_expr).orderBy(*order)
        rows = (rows.withColumn("dup_rank", F.row_number().over(wd))
                .where(F.col("dup_rank") <= int(max_per_value)))
    ws = Window.partitionBy("qid").orderBy(*order)
    sampled = (rows.withColumn("srank", F.row_number().over(ws))
               .where(F.col("srank") <= int(shard_size)))
    return (sampled.groupBy("qid", F.col(field).alias("value"))
            .agg(F.count(F.lit(1)).alias("n_docs"))
            .orderBy("qid", "value"))


def significant_text(index: Index,
                     queries: Sequence[tuple[str, Sequence[str]]],
                     n: int, shard_size: int,
                     filter_duplicate_text: bool = False) -> DataFrame:
    """Significant-text aggregation (the Elasticsearch
    ``significant_text`` bucket agg): like ``significant_terms``, but
    the foreground counts come from RE-ANALYZING the stored source
    text of the ``shard_size`` best-scoring hits — the agg ES built
    for unindexed/source-only fields, always run under a sampler
    because re-analysis is per-hit work. The re-analysis uses the
    INDEX's own analyzer settings (``Index.analyzer_opts()`` — the
    stale-analyzer rule: a stemmed index must re-stem or the fg terms
    miss the dictionary).

    ``filter_duplicate_text`` is ES's near-copy guard, pinned
    deterministically: within each query's sample, documents whose
    content is byte-identical (sha256 from the docs table) to a
    better-ranked sampled doc are dropped from BOTH the foreground
    counts and the foreground size — so boilerplate/retweet copies
    can't manufacture significance.

    Sample order is the engine contract (4dp-rounded BM25 desc,
    doc_id asc); scoring is the same JLH heuristic and 6dp rounding
    as ``significant_terms``; terms absent from the index dictionary
    are dropped (background df would be 0 — on a frozen index every
    re-analyzed token IS in termstats, so the inner join is a no-op
    there). Returns (qid, term, fg_df, df, score, rank).

    Scale: the only per-hit work (tokenize) happens AFTER the sample
    cut, so its cost is |queries| x shard_size docs regardless of
    corpus; the fg agg is map-side combinable on (qid, term); the
    background model is the already-built termstats table (no second
    corpus pass). Tokens are materialized in their own projection
    before the explode (the udf-above-Generate re-run pitfall).
    Reference: search delegated to the Lucene stack that ships this
    agg (GROUP_12 SearchFiles.java:1).
    """
    from .analysis import tokenize_pandas_udf, tokens_col
    from .portable import round_half_up

    qt = [(q, t, 1.0) for q, terms in queries for t in sorted(set(terms))]
    scored = score_exhaustive(index, qt, k=None)
    rows = scored.withColumn("rscore", round_half_up(F.col("score"), 4))
    ws = Window.partitionBy("qid").orderBy(F.desc("rscore"), F.asc("doc_id"))
    sampled = (rows.withColumn("srank", F.row_number().over(ws))
               .where(F.col("srank") <= int(shard_size))
               .select("qid", "doc_id", "srank"))
    docs = index.docs.select("doc_id", "content", "sha")
    sample_docs = sampled.join(docs, "doc_id")
    if filter_duplicate_text:
        wd = Window.partitionBy("qid", "sha").orderBy(F.asc("srank"))
        sample_docs = (sample_docs
                       .withColumn("dup", F.row_number().over(wd))
                       .where(F.col("dup") == 1))
    opts = index.analyzer_opts()
    if opts["stem"]:
        tok = tokenize_pandas_udf(**opts)(F.col("content"))
    else:
        tok = tokens_col(F.col("content"), ascii_fold=opts["ascii_fold"])
    toks = sample_docs.select("qid", "doc_id",
                              F.array_distinct(tok).alias("toks"))
    fg = (toks.select("qid", F.explode("toks").alias("term"))
          .groupBy("qid", "term")
          .agg(F.count(F.lit(1)).alias("fg_df")))
    fg_n = (sample_docs.groupBy("qid")
            .agg(F.count(F.lit(1)).alias("fg_n")))
    cand = (fg.join(F.broadcast(fg_n), "qid")
            .join(index.termstats.select("term", "df"), "term"))
    fg_pct = F.col("fg_df").cast("double") / F.col("fg_n").cast("double")
    bg_pct = F.col("df").cast("double") / F.lit(float(index.n_docs))
    jlh = (fg_pct - bg_pct) * (fg_pct / bg_pct)
    sc = (cand.where(fg_pct > bg_pct)
          .select("qid", "term", "fg_df", "df",
                  round_half_up(jlh, 6).alias("score")))
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("term"))
    return (sc.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= n)
            .select("qid", "term", "fg_df", "df", "score", "rank")
            .orderBy("qid", "rank"))


def boosting_topk(index: Index,
                  queries: Sequence[tuple[str, Sequence[str], Sequence[str]]],
                  k: int, negative_boost: float = 0.5) -> DataFrame:
    """Boosting query (the Elasticsearch ``boosting`` compound query /
    Lucene's modern BoostingQuery reading): matching is the POSITIVE
    clause's alone, but any hit that ALSO matches the negative clause
    has its score multiplied by ``negative_boost`` — demotion without
    exclusion (must_not removes; boosting just sinks).

    ``queries``: (qid, positive_terms, negative_terms) triples; both
    clauses are weight-1.0 term disjunctions, scored BM25.

    The demotion happens BEFORE the rank cut (the gate-before-cut
    rule: a demoted head doc can fall arbitrarily deep, so the k-th
    surviving doc of the demoted ranking may sit far below rank k of
    the raw one — a post-cut demotion would be wrong). That makes
    this an exhaustive-by-necessity plan like field_value_factor: the
    positive match set is scored in full, the negative MATCH SET
    (ids only, never scores) left-joins on (qid, doc_id), and the cut
    applies to the demoted score. Returns (qid, doc_id, score, rank)
    with the exact demoted score — callers re-rank rounded (the
    4dp overfetch contract). Reference: search delegated to the
    Lucene stack that ships this query (GROUP_12 SearchFiles.java:1).
    """
    pos_qt = [(q, t, 1.0) for q, pos, _neg in queries
              for t in sorted(set(pos))]
    scored = score_exhaustive(index, pos_qt, k=None)
    negq = [(q, list(neg)) for q, _pos, neg in queries if neg]
    if negq:
        neg = (_matched_hits(index, negq)
               .withColumn("_neg", F.lit(1)))
        scored = scored.join(neg, ["qid", "doc_id"], "left")
    else:
        scored = scored.withColumn("_neg", F.lit(None).cast("int"))
    demoted = F.when(F.col("_neg").isNotNull(),
                     F.col("score") * F.lit(float(negative_boost))) \
               .otherwise(F.col("score"))
    out = scored.select("qid", "doc_id", demoted.alias("score"))
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_id"))
    return (out.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("qid", "doc_id", "score", "rank")
            .orderBy("qid", "rank"))


def terms_set_topk(index: Index,
                   queries: Sequence[tuple[str, Sequence[str]]],
                   msm_df: DataFrame, k: int,
                   msm_col: str = "required_matches") -> DataFrame:
    """Terms-set query (the Elasticsearch ``terms_set`` query /
    Lucene ``CoveringQuery``): a doc matches iff it contains at least
    ``msm(doc)`` DISTINCT terms of the query's term set, where the
    minimum is a PER-DOCUMENT value read from a field
    (``minimum_should_match_field``) — the dynamic generalization of
    minimumNumberShouldMatch. Scoring is the boolean-should sum: BM25
    over the doc's matched terms.

    ``msm_df``: (doc_id, ``msm_col``) — the per-doc required count.
    A required count above the query's term count is unsatisfiable
    for that doc (as in ES); values <= 1 degrade to plain OR (scoring
    rows exist only for docs matching >= 1 term, so the floor is
    structural — Lucene's CoveringQuery iterates clause matches too).
    Docs ABSENT from ``msm_df`` never match (inner join — the ES
    reading of a missing minimum_should_match_field value, which
    Lucene's LongValues source treats as no-value → no match).

    Plan: ONE posting decode feeds both the match-count gate and the
    score — posting lists carry each (term, doc) once, so the
    distinct-matched-terms count is a plain COUNT over the (qid,
    doc_id) window, whose shuffle key the downstream score agg reuses
    (the boolean_topk exchange-reuse shape). The per-doc minimum
    joins on doc_id; at cluster scale that field lives in the
    doc-bucketed forward table so the join co-locates with the
    posting rows. Returns (qid, doc_id, n_matched, score, rank) with
    the exact score — callers re-rank rounded (4dp overfetch).
    Reference: search delegated to the Lucene stack that ships this
    query (GROUP_12 SearchFiles.java:1).
    """
    qt = [(q, t, 1.0) for q, terms in queries for t in sorted(set(terms))]
    matched = _matched_postings(index, qt)
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
    rows = index.live(rows)
    wc = Window.partitionBy("qid", "doc_id")
    rows = rows.withColumn("n_matched", F.count(F.lit(1)).over(wc))
    req = msm_df.select("doc_id", F.col(msm_col).cast("long").alias("_req"))
    rows = (rows.join(req, "doc_id")
            .where(F.col("n_matched") >= F.greatest(F.col("_req"),
                                                    F.lit(1))))
    ts = index.termstats.select("term", "df")
    rows = rows.join(F.broadcast(
        ts.join(_query_df(index.spark, qt).select("term").distinct(),
                "term")), "term")
    pscore = F.col("weight") * bm25_col(
        F.col("tf"), F.col("df"), F.col("dl"), index.avgdl,
        float(index.n_docs), index.stats["k1"], index.stats["b"])
    agg = (rows.withColumn("pscore", pscore)
           .groupBy("qid", "doc_id")
           .agg(F.max("n_matched").alias("n_matched"),
                F.sum("pscore").alias("score")))
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_id"))
    return (agg.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("qid", "doc_id", "n_matched", "score", "rank")
            .orderBy("qid", "rank"))


def explain_scores(index: Index, query_terms: QueryTerms,
                   hits: DataFrame) -> DataFrame:
    """Score-explanation over a result PAGE (the Elasticsearch
    ``_explain`` endpoint shape; a thin wrapper over ``score_explain``,
    the doc-id-list ``IndexSearcher.explain`` analog): for each (qid,
    doc_id) in ``hits``, the per-term BM25 breakdown — tf, dl, df, the
    idf component, the tf-saturation component tf/(tf+k1(1−b+b·dl/
    avgdl)), the clause weight, and the term's contribution.

    Cross-engine determinism: idf contains one ln() (libm may differ
    in the last ulp between engines) and the components multiply, so
    idf and tf_norm are each rounded to 6 dp FIRST and the
    contribution is one multiply of the two rounded values (times the
    weight) rounded once more — both engines multiply identical
    doubles in identical order.

    Scale: ``hits`` is a page (qid × k rows) by contract — its distinct
    doc ids collect to the driver and feed ``score_explain`` (the
    doc-id-list Lucene ``IndexSearcher.explain`` analog this API
    wraps: same bucket-pruned decode, same formula inputs), then the
    per-(qid, doc) pair join keeps each hit's OWN rows only
    (score_explain's flat id filter would also return a doc's rows
    under every other qid that matched it). Output is page × terms
    rows.
    Returns (qid, doc_id, term, tf, dl, df, idf, tf_norm, weight,
    contribution) ordered by qid, doc_id, term.
    """
    from .portable import round_half_up

    page = hits.select("qid", "doc_id").distinct()
    ids = [r["doc_id"] for r in page.select("doc_id").distinct().collect()]
    rows = (score_explain(index, query_terms, ids)
            .join(F.broadcast(page), ["qid", "doc_id"])
            .select("qid", "doc_id", "term", "weight",
                    F.col("tf").cast("long").alias("tf"),
                    F.col("dl").cast("long").alias("dl"),
                    F.col("df").cast("long").alias("df")))
    k1 = float(index.stats["k1"])
    b = float(index.stats["b"])
    idf = round_half_up(
        F.log1p((F.lit(float(index.n_docs)) - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))), 6)
    tf_norm = round_half_up(
        F.col("tf").cast("double")
        / (F.col("tf").cast("double")
           + F.lit(k1) * (F.lit(1.0 - b)
                          + F.lit(b) * F.col("dl").cast("double")
                          / F.lit(float(index.avgdl)))), 6)
    out = (rows.withColumn("idf", idf)
           .withColumn("tf_norm", tf_norm)
           .withColumn("contribution",
                       round_half_up(F.col("idf") * F.col("tf_norm")
                                     * F.col("weight"), 6)))
    return (out.select("qid", "doc_id", "term", "tf", "dl", "df",
                       "idf", "tf_norm", "weight", "contribution")
            .orderBy("qid", "doc_id", "term"))


def adjacency_matrix_agg(index: Index,
                         filters: Sequence[tuple[str, Sequence[str]]]
                         ) -> DataFrame:
    """Adjacency-matrix aggregation (the Elasticsearch
    ``adjacency_matrix`` bucket agg): given named term filters, the
    count of docs matching each filter and each PAIR intersection,
    keyed ES-style — ``A`` for the filter's own bucket, ``A&B``
    (names sorted) for the intersection; empty buckets are omitted.

    Plan: the per-filter matched sets (bucket-pruned posting decode)
    aggregate to one sorted filter-name array per doc, pairs expand
    in-row with an indexed transform (never a matched×matched
    self-join — per-doc work is |filters|², a query constant), and one
    hash agg counts keys. Output ≤ f(f+1)/2 rows.
    Returns (key, doc_count) ordered by key.
    """
    names = [n for n, _ in filters]
    assert len(set(names)) == len(names), "duplicate filter names"
    assert not any("&" in n for n in names), "'&' is the ES key separator"
    hits = _matched_hits(index, filters)
    fids = (hits.groupBy("doc_id")
            .agg(F.sort_array(F.collect_set("qid")).alias("fids")))
    # self key + pair keys for j > i, all in-row
    keys = F.flatten(F.transform(
        F.col("fids"),
        lambda a, i: F.concat(
            F.array(a),
            F.transform(
                F.slice(F.col("fids"), i + F.lit(2),
                        F.size(F.col("fids"))),
                lambda bb: F.concat_ws("&", a, bb)))))
    return (fids.select(F.explode(keys).alias("key"))
            .groupBy("key")
            .agg(F.count(F.lit(1)).cast("long").alias("doc_count"))
            .orderBy("key"))


def facet_histogram(index: Index,
                    queries: Sequence[tuple[str, Sequence[str]]],
                    interval: int) -> DataFrame:
    """Histogram facet (the Elasticsearch ``histogram`` agg / Lucene
    LongRange facets) over analyzed document length: bucket =
    floor(dl / interval) * interval, counting matched docs per bucket.
    Divergence doc'd: only OCCUPIED buckets are returned
    (min_doc_count=1 in ES terms) — emitting empty buckets between min
    and max is a driver-side densify over a tiny result, not a data
    question. dl derives from the forward tf table (sum of tf — the
    same stat the build computes for avgdl), so the facet source is
    index-resident: one doc-bucketed join, one map-side-combinable agg,
    output rows = |queries| x occupied buckets.
    Returns (qid, bucket, n_docs) ordered by qid, bucket.
    """
    hits = _matched_hits_dl(index, queries)
    b = (F.floor(F.col("dl") / F.lit(int(interval))) *
         F.lit(int(interval))).cast("long")
    buckets = hits.select("qid", b.alias("bucket"))
    return (buckets.groupBy("qid", "bucket")
            .agg(F.count("*").alias("n_docs"))
            .orderBy("qid", "bucket"))


def extended_stats_agg(index: Index,
                       queries: Sequence[tuple[str, Sequence[str]]]
                       ) -> DataFrame:
    """Extended-stats aggregation (the Elasticsearch ``extended_stats``
    agg) over analyzed document length per query match set: count /
    min / max / sum / sum_of_squares exact, plus avg, POPULATION
    variance (the ES definition) and std_deviation.

    Cross-engine determinism: dl is integer, so every accumulator is
    exact; Σdl² and the variance numerator n·Σdl² − (Σdl)² use
    DECIMAL(38,0) — the matrix_stats recipe (ADVICE r3: at 527k docs
    × dl≈2000 the int64 numerator sits only ~8× below wrap; a larger
    corpus silently wraps in Spark while DuckDB's int128 diverges
    instead) — keeping the numerator exact to 38 digits with ONE
    final IEEE division, and sqrt is correctly rounded — no
    float-summation-order divergence exists anywhere. avg/variance/
    std rounded 6 dp. One doc-bucketed join + one map-side-combinable
    agg; output = |queries| rows.
    Returns (qid, count, min_dl, max_dl, sum_dl, sum_sq, avg_dl,
    variance, std_dev) ordered by qid (sum_sq reported long — the
    REPORTED column stays within int64 far past this corpus class;
    only the n·Σdl² product needed the wider accumulator).
    """
    from .portable import round_half_up

    hits = _matched_hits_dl(index, queries)
    dec = "decimal(38,0)"
    x = F.col("dl").cast(dec)
    agg = (hits
           .groupBy("qid")
           .agg(F.count(F.lit(1)).cast("long").alias("count"),
                F.min("dl").cast("long").alias("min_dl"),
                F.max("dl").cast("long").alias("max_dl"),
                F.sum("dl").cast("long").alias("sum_dl"),
                F.sum(x * x).alias("sum_sq_dec")))
    n = F.col("count").cast(dec)
    var = ((n * F.col("sum_sq_dec")
            - F.col("sum_dl").cast(dec) * F.col("sum_dl").cast(dec))
           .cast("double") / (n * n).cast("double"))
    agg = agg.withColumn("sum_sq", F.col("sum_sq_dec").cast("long"))
    return (agg.select(
        "qid", "count", "min_dl", "max_dl", "sum_dl", "sum_sq",
        round_half_up(F.col("sum_dl").cast("double") / F.col("count"), 6)
        .alias("avg_dl"),
        round_half_up(var, 6).alias("variance"),
        round_half_up(F.sqrt(var), 6).alias("std_dev"))
        .orderBy("qid"))


def matrix_stats_agg(index: Index,
                     queries: Sequence[tuple[str, Sequence[str]]]
                     ) -> DataFrame:
    """Matrix-stats aggregation (the Elasticsearch ``matrix_stats``
    agg) over the two numeric per-doc fields the index carries:
    analyzed doc length (dl) and raw char length — per query match
    set: count, means, POPULATION variances, covariance, and Pearson
    correlation.

    Cross-engine determinism (the extended_stats recipe, doubled):
    both fields are integers, so Σx, Σy, Σx², Σy², Σxy are exact
    int64; covariance = (n·Σxy − Σx·Σy)/n² and each variance keep
    EXACT integer numerators/denominators with one IEEE division;
    correlation divides the exact-integer covariance numerator by
    sqrt(a)·sqrt(b) of the exact variance numerators — two correctly-
    rounded sqrts and one multiply, written identically in the oracle
    SQL so the float op sequence matches. 6 dp rounding on the float
    outputs. One doc-bucketed join + one map-side-combinable agg.
    Returns (qid, count, mean_dl, mean_chars, var_dl, var_chars,
    cov, corr) ordered by qid.
    """
    from .portable import round_half_up

    hits = _matched_hits_dl(index, queries)
    nc = index.docs.select("doc_id",
                           F.length("content").cast("long").alias("nc"))
    j = hits.join(nc, "doc_id")
    # DECIMAL(38,0) accumulators: n·Σnc² overflows int64 around 500k
    # docs × 10KB texts (review catch) — decimal keeps the numerators
    # exact to 38 digits, matching DuckDB's int128 BIGINT sums
    dec = "decimal(38,0)"
    x = F.col("dl").cast(dec)
    y = F.col("nc").cast(dec)
    agg = (j.groupBy("qid")
           .agg(F.count(F.lit(1)).cast("long").alias("n"),
                F.sum(x).alias("sx"),
                F.sum(y).alias("sy"),
                F.sum(x * x).alias("sxx"),
                F.sum(y * y).alias("syy"),
                F.sum(x * y).alias("sxy")))
    n = F.col("n").cast(dec)
    vx_num = (n * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    vy_num = (n * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    cov_num = (n * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    nn = (n * n).cast("double")
    corr = F.when((vx_num > 0) & (vy_num > 0),
                  cov_num / (F.sqrt(vx_num) * F.sqrt(vy_num)))
    return (agg.select(
        "qid", F.col("n").alias("count"),
        round_half_up(F.col("sx").cast("double") / n, 6).alias("mean_dl"),
        round_half_up(F.col("sy").cast("double") / n, 6).alias("mean_chars"),
        round_half_up(vx_num / nn, 6).alias("var_dl"),
        round_half_up(vy_num / nn, 6).alias("var_chars"),
        round_half_up(cov_num / nn, 6).alias("cov"),
        round_half_up(corr, 6).alias("corr"))
        .orderBy("qid"))


def percentile_ranks_agg(index: Index,
                         queries: Sequence[tuple[str, Sequence[str]]],
                         values: Sequence[int]) -> DataFrame:
    """Percentile-ranks aggregation (the Elasticsearch
    ``percentile_ranks`` agg — the inverse of ``percentiles``): for
    each given value v, the percentage of the query's matched docs
    whose analyzed length is ≤ v. Where ES estimates through t-digest,
    the engine computes the EXACT rank — integer count / one division
    / 6 dp round (deterministic by construction); the scale shape is
    one conditional-sum hash agg, |values| columns wide, so exactness
    costs nothing here (no sketch state is even needed: the values
    are query constants, not quantile probes). Returns
    (qid, value, pct_rank) ordered.
    """
    from .portable import round_half_up

    hits = _matched_hits_dl(index, queries)
    j = hits
    aggs = [F.count(F.lit(1)).cast("long").alias("n")]
    vals = sorted({int(v) for v in values})   # dups → ambiguous le_ cols
    for v in vals:
        aggs.append(F.sum(F.when(F.col("dl") <= v, 1).otherwise(0))
                    .cast("long").alias(f"le_{v}"))
    agg = j.groupBy("qid").agg(*aggs)
    parts = [agg.select(
        "qid", F.lit(v).cast("long").alias("value"),
        round_half_up(F.col(f"le_{v}").cast("double") * 100.0
                      / F.col("n"), 6).alias("pct_rank"))
        for v in vals]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("qid", "value")


def field_value_factor_topk(index: Index, query_terms: QueryTerms,
                            k: int) -> DataFrame:
    """ES ``function_score`` with ``field_value_factor`` (modifier
    ``ln1p``, boost_mode ``multiply``) over analyzed doc length:
    final = bm25 × ln(1 + dl) — the standard popularity/length boost
    shape (ES docs' canonical field_value_factor example). The factor
    REORDERS the ranking, so scoring is exhaustive over the match set
    and the rank cut comes last (gate before cut); the factor is
    quantized to 6 dp before the multiply so both engines rank the
    same rounded product. Returns (qid, doc_id, score, rank)."""
    from .portable import round_half_up

    scored = score_exhaustive(index, query_terms, None)
    dl = _doc_lengths(index)
    factor = round_half_up(F.log(F.col("dl") + 1.0), 6)
    j = scored.join(dl, "doc_id").withColumn(
        "fscore", round_half_up(F.col("score") * factor, 4))
    w = Window.partitionBy("qid").orderBy(F.desc("fscore"),
                                          F.asc("doc_id"))
    return (j.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("qid", "doc_id", F.col("fscore").alias("score"),
                    "rank")
            .orderBy("qid", "rank"))


def percentiles_agg(index: Index,
                    queries: Sequence[tuple[str, Sequence[str]]],
                    percents: Sequence[float] = (50.0, 90.0, 99.0)
                    ) -> DataFrame:
    """Percentiles aggregation (the Elasticsearch ``percentiles`` agg)
    over analyzed document length, with a DETERMINISTIC mergeable
    sketch state: an HDR-histogram-style power-of-two bucket table
    (4 mantissa bits) instead of ES's t-digest, whose centroids depend
    on merge order and so cannot be reproduced across engines or
    partitionings.  Divergence documented: values are bucket-midpoint
    estimates with relative error ≤ 2^-4 ≈ 6 % (t-digest is ~0.1 % at
    the tails); the SCALE SHAPE is the point — the per-(qid, bucket)
    count is one map-side-combinable hash agg over a fixed
    ~8·log2(max_dl) bucket state, and sketches merge by adding counts,
    exactly the t-digest role in a 1000-executor plan.

    Bucketing is pure integer arithmetic (exact cross-engine):
    ``e = bit_length(dl)`` via the binary-string length,
    ``shift = max(e-4, 0)``, ``m = dl >> shift``, bucket =
    ``[m << shift, ((m+1) << shift) - 1]`` — dl < 16 is exact.
    The estimate for percent p is the midpoint of the bucket holding
    nearest-rank ``ceil(p/100 · N)``.  Returns (qid, pct, est)
    ordered by qid, pct.
    """
    hits = _matched_hits_dl(index, queries)
    vals = hits.select("qid", "dl")
    b = vals.withColumn(
        "shift", F.greatest(F.length(F.bin("dl")) - F.lit(4), F.lit(0)))
    b = b.selectExpr(
        "qid",
        "shiftleft(shiftright(dl, shift), shift) as lo",
        "shiftleft(shiftright(dl, shift) + 1L, shift) - 1L as hi")
    counts = b.groupBy("qid", "lo", "hi").agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("qid").orderBy("lo")
    cum = (counts
           .withColumn("cum", F.sum("cnt").over(w))
           .withColumn("n", F.sum("cnt").over(Window.partitionBy("qid"))))
    pcts = index.spark.createDataFrame(
        [(float(x),) for x in percents], "pct double")
    tgt = F.ceil(F.col("pct") / F.lit(100.0) * F.col("n").cast("double"))
    hit = (cum.crossJoin(F.broadcast(pcts))
           .where((F.col("cum") >= tgt) &
                  ((F.col("cum") - F.col("cnt")) < tgt)))
    return (hit.select("qid", "pct",
                       ((F.col("lo") + F.col("hi")) / F.lit(2.0))
                       .alias("est"))
            .orderBy("qid", "pct"))


def weighted_avg_agg(index: Index,
                     queries: Sequence[tuple[str, Sequence[str]]]
                     ) -> DataFrame:
    """Weighted-average aggregation (the Elasticsearch
    ``weighted_avg`` agg) over the index's two numeric per-doc
    fields: value = analyzed doc length, weight = raw char length —
    Σ(value·weight) / Σ(weight) per query match set.

    Cross-engine determinism (the matrix_stats recipe): both fields
    are integers, so the Σ(v·w) numerator and Σw denominator are
    EXACT — accumulated in DECIMAL(38,0) (dl·chars ≈ 2·10⁷ per doc
    wraps int64 near 10¹² docs, precisely the advertised scale class)
    — with ONE final IEEE division, rounded 6 dp. One doc-bucketed
    join + one map-side-combinable agg; output = |queries| rows.
    Returns (qid, count, weight_sum, weighted_avg) ordered by qid.
    Reference: search delegated to the Lucene stack that ships this
    agg (GROUP_12 SearchFiles.java:1).
    """
    from .portable import round_half_up

    hits = _matched_hits_dl(index, queries)
    nc = index.docs.select("doc_id",
                           F.length("content").cast("long").alias("nc"))
    dec = "decimal(38,0)"
    rows = hits.join(nc, "doc_id")
    agg = (rows.groupBy("qid")
           .agg(F.count(F.lit(1)).cast("long").alias("count"),
                F.sum(F.col("dl").cast(dec) * F.col("nc").cast(dec))
                .alias("vw"),
                F.sum(F.col("nc").cast(dec)).alias("wsum")))
    wavg = F.col("vw").cast("double") / F.col("wsum").cast("double")
    return (agg.select("qid", "count",
                       F.col("wsum").cast("long").alias("weight_sum"),
                       round_half_up(wavg, 6).alias("weighted_avg"))
            .orderBy("qid"))


def scripted_metric_agg(index: Index,
                        queries: Sequence[tuple[str, Sequence[str]]],
                        map_sql: str = "dl",
                        combine: str = "sum",
                        reduce_sql: str | None = None) -> DataFrame:
    """Scripted-metric aggregation (the Elasticsearch
    ``scripted_metric`` agg) with the four script stages rendered as
    Catalyst-compiled SQL, never a Python UDF:

    * init   — the aggregate's zero (implicit);
    * map    — ``map_sql``, an expression over the per-doc columns
      ``dl`` (analyzed length), ``nc`` (char length), ``lang``,
      ``repo``, evaluated once per matched doc;
    * combine — the per-partition partial of the ``combine``
      aggregate (sum/min/max/avg/count) — Spark's map-side combine IS
      ES's per-shard combine_script, so the stage correspondence is
      structural, not simulated;
    * reduce — ``reduce_sql``, one final expression over the merged
      ``state`` column (plus ``n_docs``), e.g. ``"state / n_docs"``.

    Determinism contract (the house float discipline generalized):
    the mapped value is quantized ONCE to DECIMAL(38,9) — exact for
    integer-valued scripts, 9 dp-pinned for float ones — so the sum
    accumulates exactly in any addition order on both engines; the
    reduce stage is the single IEEE step, rounded 6 dp. Queries whose
    match set is empty emit no row (the agg-family contract; ES would
    return the init state). NULL mapped values (a no-ELSE CASE, a NULL
    input column) follow plain SQL aggregate semantics — skipped by
    the combine, with ``n_docs`` still counting every MATCHED doc and
    avg dividing by the non-NULL count. One doc-bucketed join + one
    map-side-combinable agg; output = |queries| rows. Returns
    (qid, n_docs, value) ordered by qid."""
    from .portable import round_half_up

    combines = ("sum", "min", "max", "avg", "count")
    if combine not in combines:
        raise ValueError(f"unknown combine {combine!r} "
                         f"(supported: {combines})")
    hits = _matched_hits_dl(index, queries)
    cols = index.docs.select(
        "doc_id", F.length("content").cast("long").alias("nc"),
        "lang", "repo")
    rows = (hits.join(cols, "doc_id")
            .withColumn("m", F.expr(map_sql).cast("decimal(38,9)")))
    # n_docs counts MATCHED docs (the docstring's 'once per matched
    # doc'); a map script producing NULL (no-ELSE CASE, NULL input
    # col) is skipped by the aggregates under plain SQL semantics —
    # counting non-NULL m here silently shrank n_docs AND the avg
    # denominator together, hiding that anything was skipped
    n = F.count(F.lit(1)).cast("long").alias("n_docs")
    if combine == "count":
        agg = rows.groupBy("qid").agg(n, F.count("m")
                                      .cast("decimal(38,9)").alias("st"))
    elif combine == "avg":
        # SQL AVG: sum of non-NULL values over the COUNT OF NON-NULL
        # values (not n_docs — the two differ for NULL-producing maps)
        agg = (rows.groupBy("qid")
               .agg(n, F.sum("m").alias("s"),
                    F.count("m").cast("long").alias("nm"))
               .select("qid", "n_docs",
                       (F.col("s").cast("double") /
                        F.col("nm").cast("double")).alias("st")))
    else:
        agg = rows.groupBy("qid").agg(
            n, getattr(F, combine)("m").alias("st"))
    state = agg.select("qid", "n_docs",
                       F.col("st").cast("double").alias("state"))
    out = F.expr(reduce_sql) if reduce_sql else F.col("state")
    return (state.select("qid", "n_docs",
                         round_half_up(out, 6).alias("value"))
            .orderBy("qid"))


def boxplot_agg(index: Index,
                queries: Sequence[tuple[str, Sequence[str]]]
                ) -> DataFrame:
    """Boxplot aggregation (the Elasticsearch ``boxplot`` agg) over
    analyzed document length per query match set: min, q1, q2
    (median), q3, max. Divergence documented: ES estimates the
    quartiles through a t-digest (merge-order-dependent, not
    reproducible cross-engine); here they are EXACT linear-
    interpolated quantiles (type 7 — h = (n−1)·p, the
    numpy/DuckDB-quantile_cont definition, verified bitwise equal
    between Spark ``percentile`` and DuckDB on integer inputs).
    Exactness costs one sort of each query's dl multiset — the
    ``percentile`` aggregate's standard distributed plan — where the
    t-digest trades accuracy for a fixed-size mergeable state; at the
    100× scale the HDR-bucket percentiles_agg is the sketch path, the
    same split ES documents for percentiles vs boxplot users.
    Returns (qid, min_dl, q1, q2, q3, max_dl) ordered by qid; the
    quartiles are 6 dp-rounded doubles.
    Reference: search delegated to the Lucene stack that ships this
    agg (GROUP_12 SearchFiles.java:1).
    """
    from .portable import round_half_up

    hits = _matched_hits_dl(index, queries)
    rows = hits
    agg = (rows.groupBy("qid")
           .agg(F.min("dl").cast("long").alias("min_dl"),
                F.percentile("dl", 0.25).alias("q1x"),
                F.percentile("dl", 0.5).alias("q2x"),
                F.percentile("dl", 0.75).alias("q3x"),
                F.max("dl").cast("long").alias("max_dl")))
    return (agg.select("qid", "min_dl",
                       round_half_up(F.col("q1x"), 6).alias("q1"),
                       round_half_up(F.col("q2x"), 6).alias("q2"),
                       round_half_up(F.col("q3x"), 6).alias("q3"),
                       "max_dl")
            .orderBy("qid"))


def mad_agg(index: Index,
            queries: Sequence[tuple[str, Sequence[str]]]) -> DataFrame:
    """Median-absolute-deviation aggregation (the Elasticsearch
    ``median_absolute_deviation`` agg) over analyzed document length
    per query match set: MAD = median(|dl − median(dl)|). ES computes
    both medians through t-digests; here both are EXACT type-7
    quantiles (the boxplot_agg rationale — integer inputs make every
    interpolation step exactly representable, verified bitwise
    across engines).

    Plan: two passes by necessity (the inner median must complete
    before deviations exist) — one percentile agg per qid, a
    broadcast join of the |queries|-row medians back onto the match
    set, then the outer percentile agg. Both aggs shuffle on qid
    only. Returns (qid, median_dl, mad) ordered by qid (6 dp).
    Reference: search delegated to the Lucene stack that ships this
    agg (GROUP_12 SearchFiles.java:1).
    """
    from .portable import round_half_up

    hits = _matched_hits_dl(index, queries)
    rows = hits
    med = (rows.groupBy("qid")
           .agg(F.percentile("dl", 0.5).alias("med")))
    dev = (rows.join(F.broadcast(med), "qid")
           .select("qid",
                   F.abs(F.col("dl").cast("double") - F.col("med"))
                   .alias("adev")))
    out = (dev.groupBy("qid")
           .agg(F.percentile("adev", 0.5).alias("madx"))
           .join(F.broadcast(med), "qid"))
    return (out.select("qid",
                       round_half_up(F.col("med"), 6).alias("median_dl"),
                       round_half_up(F.col("madx"), 6).alias("mad"))
            .orderBy("qid"))


def t_test_agg(index: Index,
               pairs: Sequence[tuple[str, Sequence[str], Sequence[str]]]
               ) -> DataFrame:
    """Two-sample t-test aggregation (the Elasticsearch ``t_test``
    agg) over analyzed document length between the match sets of two
    term filters per query — ``pairs`` rows are (qid, terms_a,
    terms_b), mirroring the ES agg's two filtered populations.

    Emits BOTH statistics ES's two unpaired types derive from:
    ``t_welch`` (heteroscedastic — the ES default) with its
    Welch–Satterthwaite ``df_welch``, and ``t_pooled``
    (homoscedastic, df = n_a + n_b − 2). Documented divergence: ES
    returns the two-sided p-value; the p-value is
    2·(1 − CDF_t(|t|, df)) — a scalar transform of (t, df) via the
    regularized incomplete beta, which neither Spark nor DuckDB
    exposes as a built-in — so the engine returns the deterministic
    sufficient statistics instead and the transform is a driver-side
    afterthought (scipy.stats.t.sf where available).

    Cross-engine determinism (the weighted_avg/matrix_stats recipe):
    dl is an exact integer, so Σdl and Σdl² accumulate in
    DECIMAL(38,0) (n·Σdl² ≈ 10³⁴ at the advertised 10¹²-doc scale
    class — wraps int64, fits decimal38) and the variance NUMERATOR
    n·Σx² − (Σx)² is computed exactly in decimal before the single
    cast to double; everything after is a fixed float expression
    tree on identical IEEE inputs (no accumulation), rounded 6 dp.
    NULL statistics when either side has n < 2 (variance undefined)
    or both variances are 0 (the ES NaN, rendered relationally as
    derivative/moving_fn do).

    Scale: two bucket-pruned match-set decodes, one doc-bucketed dl
    join, one map-side-combinable (qid, side) moment agg → the rest
    is |pairs|-row arithmetic. Returns (qid, n_a, n_b, mean_a,
    mean_b, t_welch, df_welch, t_pooled) ordered by qid. Reference:
    search delegated to the Lucene stack that ships this agg
    (GROUP_12 SearchFiles.java:1).
    """
    from .portable import round_half_up

    qa = [(q, ta) for q, ta, _ in pairs]
    qb = [(q, tb) for q, _, tb in pairs]
    hits = (_matched_hits_dl(index, qa).withColumn("side", F.lit("a"))
            .unionByName(_matched_hits_dl(index, qb)
                         .withColumn("side", F.lit("b"))))
    dec = "decimal(38,0)"
    rows = hits
    mom = (rows.groupBy("qid", "side")
           .agg(F.count(F.lit(1)).cast("long").alias("n"),
                F.sum(F.col("dl").cast(dec)).alias("s"),
                F.sum(F.col("dl").cast(dec) * F.col("dl").cast(dec))
                .alias("ss")))

    def side(tag):
        return (mom.where(F.col("side") == tag)
                .select("qid", F.col("n").alias(f"n_{tag}"),
                        F.col("s").alias(f"s_{tag}"),
                        F.col("ss").alias(f"ss_{tag}")))

    # every pair's qid appears even when a side matches NOTHING
    # (n = 0 < 2 ⇒ the documented NULL statistics, not a dropped
    # row — an inner join here silently lost the qid entirely)
    qids = index.spark.createDataFrame(
        [(q,) for q, _, _ in pairs], "qid string").distinct()
    j = (qids.join(side("a"), "qid", "left")
         .join(side("b"), "qid", "left")
         .withColumn("n_a", F.coalesce("n_a", F.lit(0).cast("long")))
         .withColumn("n_b", F.coalesce("n_b", F.lit(0).cast("long"))))

    def moments(tag):
        n = F.col(f"n_{tag}").cast("double")
        mean = F.col(f"s_{tag}").cast("double") / n
        # exact decimal numerator n·Σx² − (Σx)², then ONE cast
        varnum = (F.col(f"n_{tag}").cast(dec) * F.col(f"ss_{tag}")
                  - F.col(f"s_{tag}") * F.col(f"s_{tag}"))
        var = (F.when(F.col(f"n_{tag}") >= 2,
                      varnum.cast("double")
                      / (n * (n - F.lit(1.0)))))
        return n, mean, var

    na, ma, va = moments("a")
    nb, mb, vb = moments("b")
    se2 = va / na + vb / nb
    t_w = F.when(se2 > 0, (ma - mb) / F.sqrt(se2))
    df_w = F.when(
        se2 > 0,
        (se2 * se2) / ((va / na) * (va / na) / (na - F.lit(1.0))
                       + (vb / nb) * (vb / nb) / (nb - F.lit(1.0))))
    sp2 = (((na - F.lit(1.0)) * va + (nb - F.lit(1.0)) * vb)
           / (na + nb - F.lit(2.0)))
    t_p = F.when(sp2 > 0,
                 (ma - mb) / F.sqrt(sp2 * (F.lit(1.0) / na
                                           + F.lit(1.0) / nb)))
    return (j.select("qid", "n_a", "n_b",
                     round_half_up(ma, 6).alias("mean_a"),
                     round_half_up(mb, 6).alias("mean_b"),
                     round_half_up(t_w, 6).alias("t_welch"),
                     round_half_up(df_w, 6).alias("df_welch"),
                     round_half_up(t_p, 6).alias("t_pooled"))
            .orderBy("qid"))


def filters_agg(index: Index,
                filters: Sequence[tuple[str, Sequence[str]]],
                other_bucket: bool = False,
                other_bucket_key: str = "_other_") -> DataFrame:
    """ES ``filters`` aggregation: one NAMED bucket per filter, each
    an independent term-match set — buckets may OVERLAP (a doc
    matching two filters counts in both), which is what separates
    this from a terms/multi_terms agg where buckets partition. With
    ``other_bucket=True`` an extra bucket counts the LIVE docs
    matching NO filter (the ES other_bucket contract; its key must
    not collide with a filter name).

    Per bucket: doc count plus the avg analyzed length of the matched
    docs (the metric sub-agg every other match-set agg here carries)
    — exact long sums, one final division, 6 dp; the other bucket's
    metric needs the complement's dl sum, derived from the corpus
    totals minus the union's (one extra DISTINCT over the union set —
    the only part that isn't a plain map-side combine, and it is
    gated behind the flag). NULL avg_dl for an empty bucket (ES
    renders an empty-bucket sub-agg as null). Row order follows the
    given filter order, other bucket last (the ES response contract).
    Returns (key, n_docs, avg_dl).
    Reference: search delegated to the Lucene stack that ships this
    agg (GROUP_12 SearchFiles.java:1).
    """
    from .portable import round_half_up

    names = [k for k, _ in filters]
    if len(set(names)) != len(names):
        raise ValueError("duplicate filter keys")
    if other_bucket and other_bucket_key in names:
        raise ValueError(f"other_bucket_key {other_bucket_key!r} "
                         "collides with a filter name")
    spark = index.spark
    hits = _matched_hits_dl(index, filters)
    rows = hits
    per = (rows.groupBy("qid")
           .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                F.sum("dl").cast("long").alias("dl_sum")))
    order = spark.createDataFrame(
        [(k, i) for i, k in enumerate(names)], "qid string, i int")
    out = (order.join(per, "qid", "left")
           .select(F.col("qid").alias("key"), "i",
                   F.coalesce("n_docs", F.lit(0).cast("long"))
                   .alias("n_docs"),
                   F.coalesce("dl_sum", F.lit(0).cast("long"))
                   .alias("dl_sum")))
    if other_bucket:
        # complement = live corpus minus the union of the match sets
        # (the union needs ONE distinct — overlapping buckets share
        # docs); totals come from the corpus stats pass
        union = rows.select("doc_id", "dl").distinct()
        # LEFT join dl: a live doc whose content analyzed to zero
        # tokens has no dl row but still matches no filter — an inner
        # join here undercounted the other bucket by those docs.
        # (The corpus-wide totals genuinely need the forward-table
        # aggregation; only the per-bucket rows ride the decode's dl.)
        tot = (index.live(index.docs.select("doc_id"))
               .join(_doc_lengths(index), "doc_id", "left")
               .agg(F.count(F.lit(1)).cast("long").alias("n"),
                    F.sum(F.coalesce("dl", F.lit(0)))
                    .cast("long").alias("s")).first())
        u = union.agg(F.count(F.lit(1)).cast("long").alias("n"),
                      F.sum("dl").cast("long").alias("s")).first()
        other = spark.createDataFrame(
            [(other_bucket_key, len(names),
              int(tot["n"] - u["n"]),
              int((tot["s"] or 0) - (u["s"] or 0)))],
            "key string, i int, n_docs long, dl_sum long")
        out = out.unionByName(other)
    avg = F.when(F.col("n_docs") > 0,
                 F.col("dl_sum").cast("double")
                 / F.col("n_docs").cast("double"))
    return (out.orderBy("i")
            .select("key", "n_docs",
                    round_half_up(avg, 6).alias("avg_dl")))


def multi_terms_agg(index: Index,
                    queries: Sequence[tuple[str, Sequence[str]]],
                    fields: DataFrame, key_cols: Sequence[str],
                    n: int) -> DataFrame:
    """Multi-terms aggregation (the Elasticsearch ``multi_terms``
    agg): buckets keyed by a COMPOSITE of several fields, ordered by
    doc count desc — the terms agg generalized to key tuples (the
    count-ordered sibling of ``composite_agg``, which pages in key
    order instead). Docs missing any key component are dropped (the
    ES contract — multi_terms has no missing-bucket support).

    ``fields``: (doc_id, key_cols...) stored-field source.
    Deterministic rank: n_docs desc, then the key tuple asc. Scale:
    one doc-bucketed join + one map-side-combinable agg on (qid,
    keys); the rank window partitions on qid and the cut bounds the
    output at |queries| × n rows. Returns (qid, key_cols..., n_docs,
    rank) ordered by qid, rank.
    Reference: search delegated to the Lucene stack that ships this
    agg (GROUP_12 SearchFiles.java:1).
    """
    hits = _matched_hits(index, queries)
    cols = list(key_cols)
    joined = hits.join(fields.select("doc_id", *cols), "doc_id")
    for c in cols:
        joined = joined.where(F.col(c).isNotNull())
    agg = (joined.groupBy("qid", *cols)
           .agg(F.count(F.lit(1)).alias("n_docs")))
    w = Window.partitionBy("qid").orderBy(
        F.desc("n_docs"), *[F.asc(c) for c in cols])
    return (agg.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= int(n))
            .select("qid", *cols, "n_docs", "rank")
            .orderBy("qid", "rank"))


def value_count_missing_agg(index: Index,
                            queries: Sequence[tuple[str, Sequence[str]]],
                            fields: DataFrame, field: str,
                            include_global: bool = True) -> DataFrame:
    """ES ``value_count`` + ``missing`` metric/bucket aggs, plus the
    ``global`` bucket, over a stored field: per query, how many
    matched docs HAVE a value for ``field`` (value_count), how many
    do not (missing — NULL value or absent from ``fields`` entirely,
    both "no value" in the ES reading), and the match-set size their
    sum must equal. With ``include_global`` a ``_global``-qid row
    aggregates the same pair over ALL live docs — the ES ``global``
    bucket, which ESCAPES the query scope (its point: side-by-side
    per-query vs corpus-wide ratios in one response).

    Pinned divergence: ES value_count counts VALUES (a multi-valued
    field counts each element); ``fields`` here is a scalar column,
    so value_count == docs-with-a-value — the scalar-field reading.
    That contract makes duplicate doc_id rows in ``fields`` malformed
    input; they are dropped (one arbitrary row wins, ADVICE r4) so a
    dirty fields table cannot fan out the match set and silently
    break the n_docs = value_count + missing = |match set| invariant.

    Scale: the match set equi-joins ``fields`` on doc_id (LEFT join —
    absent rows are the missing bucket, never silently dropped), the
    per-qid agg is map-side combinable, output is |queries| (+1)
    rows. The global row costs one docs-table scan of doc_id only
    (column-pruned), no decode. Returns (qid, n_docs, value_count,
    missing) ordered by qid. Reference: search delegated to the
    Lucene/ES stack that ships these aggs (GROUP_12
    SearchFiles.java:1).
    """
    hits = _matched_hits(index, queries)
    if include_global:
        if any(q == "_global" for q, _ in queries):
            raise ValueError("qid '_global' is reserved for the "
                             "global bucket row")
        everything = (index.live(index.docs.select("doc_id"))
                      .select(F.lit("_global").alias("qid"), "doc_id"))
        hits = hits.unionByName(everything)
    joined = hits.join(
        fields.select("doc_id", field).dropDuplicates(["doc_id"]),
        "doc_id", "left")
    return (joined.groupBy("qid")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.count(field).cast("long").alias("value_count"),
                 F.count_if(F.col(field).isNull()).cast("long")
                 .alias("missing"))
            .orderBy("qid"))


def composite_agg(index: Index,
                  queries: Sequence[tuple[str, Sequence[str]]],
                  fields: DataFrame, key_cols: Sequence[str],
                  page_size: int,
                  after: Sequence | None = None) -> DataFrame:
    """Composite aggregation (the Elasticsearch ``composite`` agg):
    key-ordered bucket pages over the matched doc set with after-key
    pagination — THE way to stream an unbounded bucket space out of an
    aggregation (a terms agg with 10^9 buckets cannot materialize its
    ordered tail; key-ordered pages can).

    ``fields``: (doc_id, key_cols...) stored-field source; docs with
    any NULL key are omitted (the ES ``missing_bucket: false``
    default).  ``after``: the last key tuple of the previous page —
    strictly-greater buckets (lexicographic over ``key_cols``, the ES
    after-key contract) form the next page.

    Scale: the bucket agg is map-side combinable on (qid, keys), the
    after-key predicate prunes BEFORE the page sort, and the page cut
    is a TakeOrderedAndProject-class plan (sort bounded by page_size ×
    |queries|, never a global bucket sort).  Returns
    (qid, key_cols..., n_docs) — the first ``page_size`` buckets per
    qid in key order.
    """
    hits = _matched_hits(index, queries)
    joined = hits.join(fields, "doc_id")
    for c in key_cols:
        joined = joined.where(F.col(c).isNotNull())
    agg = (joined.groupBy("qid", *key_cols)
           .agg(F.count_distinct("doc_id").alias("n_docs")))
    if after is not None:
        assert len(after) == len(key_cols)
        agg = agg.where(
            F.struct(*[F.col(c) for c in key_cols]) >
            F.struct(*[F.lit(v) for v in after]))
    w = Window.partitionBy("qid").orderBy(*[F.asc(c) for c in key_cols])
    return (agg.withColumn("_r", F.row_number().over(w))
            .where(F.col("_r") <= page_size)
            .select("qid", *key_cols, "n_docs")
            .orderBy("qid", *key_cols))


def cardinality_agg(index: Index,
                    queries: Sequence[tuple[str, Sequence[str]]],
                    values: DataFrame | None = None,
                    value_col: str = "value") -> DataFrame:
    """Cardinality aggregation (the Elasticsearch ``cardinality`` agg,
    Lucene HyperLogLogPlusPlus; the reference's stack ships it —
    reference delegates to Lucene 9.9.2, SearchFiles.java:1): for each
    query, the approximate number of DISTINCT values of a doc-keyed
    field over the matched document set, via the deterministic HLL
    sketch in :mod:`engine.sketches`.

    Default field: the analyzed vocabulary of the matched docs (the
    forward tf table's ``term`` column) — "how many distinct terms do
    the docs matching this query span", a high-cardinality field that
    exercises the sketch's raw-estimate regime; pass ``values`` as any
    (doc_id, ``value_col``) DataFrame for stored-field cardinality.

    Scale: matched (qid, doc) hits equi-join the doc-bucketed field
    source, the register build is ONE map-side-combinable max-agg
    (≤ 4096 rows per query leave the map side — the whole point: no
    count-distinct re-shuffle of matched rows), and the estimate
    collapse is |queries| × ≤4096 rows.  Returns
    (qid, v_zero, est) ordered by qid.
    """
    from .sketches import hll_cardinality

    hits = _matched_hits(index, queries)
    if values is None:
        p = _paths(index.index_dir)
        values = (index.spark.read.parquet(p["tf"])
                  .select("doc_id", F.col("term").alias("value")))
        value_col = "value"
    vals = hits.join(values, "doc_id").select(
        "qid", F.col(value_col).alias("value"))
    return hll_cardinality(vals, ["qid"], "value").orderBy("qid")


def synonym_topk(index: Index,
                 queries: Sequence[tuple[str, Sequence[Sequence[str]]]],
                 k: int, k1: float | None = None,
                 b: float | None = None) -> DataFrame:
    """Lucene SynonymQuery analog: the terms inside a group score as
    ONE pseudo-term — per-doc tf is the SUM over member terms and df is
    the MAX member df (SynonymQuery's docFreq blending; public Lucene
    semantics) — so synonyms never multiply idf the way a plain OR of
    the members would. Groups then combine as an unweighted OR sum,
    exactly a BooleanQuery of SynonymQuery clauses (the shape analyzer
    synonym graphs emit). Members absent from the vocabulary drop out
    of both the tf sum and the df max, like Lucene terms with
    docFreq 0.

    Plan: member postings decode through the same bucket-pruned
    broadcast join as scoring, re-key to (qid, gid, doc) for the
    map-side-combinable tf-sum, and the blended-df table (|groups|
    rows) broadcasts. Exhaustive-class by design (it is the correctness
    oracle path); the generalized block-max kernel could take a merged
    member list as one posting list whose bound uses the blended df —
    the documented pruned-path extension.
    Returns (qid, doc_id, score, rank) ordered by qid, rank.
    """
    rows = [(qid, gi, t) for qid, groups in queries
            for gi, g in enumerate(groups) for t in sorted(set(g))]
    gterms = index.spark.createDataFrame(
        rows, "qid string, gid int, term string")
    buckets = index.term_buckets([t for _, _, t in rows])
    post = (index.postings
            .where(F.col("bucket").isin(buckets))
            .join(F.broadcast(gterms), "term"))
    dec = post.withColumn("d", decode_udf("blob"))
    ex = (dec.select(
            "qid", "gid",
            F.explode(F.arrays_zip("d.doc_ids", "d.tfs", "d.dls")).alias("e"))
          .select("qid", "gid",
                  F.col("e.doc_ids").alias("doc_id"),
                  F.col("e.tfs").alias("tf"),
                  F.col("e.dls").alias("dl")))
    ex = index.live(ex)
    grouped = (ex.groupBy("qid", "gid", "doc_id")
               .agg(F.sum("tf").alias("tfs"), F.max("dl").alias("dl")))
    gdf = (index.termstats.select("term", "df")
           .join(F.broadcast(gterms), "term")
           .groupBy("qid", "gid").agg(F.max("df").alias("df")))
    sc = grouped.join(F.broadcast(gdf), ["qid", "gid"]).withColumn(
        "pscore",
        bm25_col(F.col("tfs"), F.col("df"), F.col("dl"),
                 index.avgdl, float(index.n_docs),
                 k1 if k1 is not None else index.stats["k1"],
                 b if b is not None else index.stats["b"]))
    agg = sc.groupBy("qid", "doc_id").agg(F.sum("pscore").alias("score"))
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_id"))
    return (agg.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("qid", "doc_id", "score", "rank")
            .orderBy("qid", "rank"))


def rank_feature_topk(index: Index, query_terms: QueryTerms, k: int,
                      pivot: float = 1000.0, boost: float = 1.0,
                      function: str = "saturation",
                      exponent: int = 2,
                      use_wand: bool = True) -> DataFrame:
    """ES ``rank_feature`` query over the index's raw char-length
    feature (the canonical "pagerank/url_length"-class numeric field):
    the feature contributes ADDITIVELY to the BM25 sum — the ES
    contract (rank_feature is a should clause; docs missing the
    feature contribute 0, never match removal). Three ES functions:

    * ``saturation``: boost · x/(x + pivot)  (the ES default)
    * ``log``:        boost · ln(scaling + x), scaling = pivot
    * ``sigmoid``:    boost · x^e/(x^e + pivot^e)

    The boost term REORDERS the ranking relative to plain BM25, so the
    rank cut must come after the feature add — but saturation and
    sigmoid are BOUNDED by ``boost`` (x/(x+p) < 1, xᵉ/(xᵉ+pᵉ) < 1), so
    UB_total = UB_bm25 + boost is a sound WAND bound and the block-max
    kernel applies with every θ-comparison relaxed by boost
    (``ub_shift``; VERDICT r4 item 3). Default path (``use_wand``):
    the kernel emits ALL candidates whose exact bm25 ≥ θ − boost − ε
    (``emit='cands'`` — a bm25 top-k cut would be unsound, a
    feature-rich doc can win from below it), the feature joins onto
    that small candidate set, and the rounded total ranks last.
    ε = WAND_FEATURE_EPS absorbs the 4 dp rounded re-rank boundary.
    Rank-identical to the exhaustive path by construction
    (equivalence-tested, tests/test_round5_kernel.py). ``log`` is
    unbounded by boost (ln grows with x) — its sound bound needs a
    stored corpus feature-max statistic (what Lucene's FeatureField
    gets from maxFreq), so it stays exhaustive here, as does a
    negative boost (the term is then a penalty with floor −boost;
    ES rejects negative boosts outright).

    Cross-engine determinism: x and pivot are integers-as-doubles, so
    saturation/sigmoid are one exact ratio (x^e ≤ (10^5)^2 « 2^53);
    the feature term is quantized to 6 dp BEFORE the add (ln's last
    ulp may differ between libms), the combined score re-rounds to
    4 dp for ranking (house float discipline). Returns
    (qid, doc_id, score, rank). Reference: search delegated to the
    Lucene stack that ships this query (GROUP_12 SearchFiles.java:1).
    """
    from .portable import round_half_up

    if function not in ("saturation", "log", "sigmoid"):
        raise ValueError(f"unknown rank_feature function {function!r}")
    if use_wand and function in ("saturation", "sigmoid") \
            and float(boost) >= 0.0:
        scored = index.live(_wand_sharded(
            index, query_terms, k, None, "cands",
            ub_shift=float(boost) + WAND_FEATURE_EPS))
    else:
        scored = score_exhaustive(index, query_terms, None)
    feat = index.docs.select(
        "doc_id", F.length("content").cast("double").alias("x"))
    p = float(pivot)
    if function == "saturation":
        raw = F.col("x") / (F.col("x") + F.lit(p))
    elif function == "log":
        raw = F.log(F.col("x") + F.lit(p))
    else:
        e = int(exponent)
        xe = F.pow(F.col("x"), F.lit(float(e)))
        raw = xe / (xe + F.lit(float(p ** e)))
    fterm = round_half_up(F.lit(float(boost)) * raw, 6)
    j = scored.join(feat, "doc_id").withColumn(
        "fscore", round_half_up(F.col("score") + fterm, 4))
    w = Window.partitionBy("qid").orderBy(F.desc("fscore"),
                                          F.asc("doc_id"))
    return (j.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("qid", "doc_id", F.col("fscore").alias("score"),
                    "rank")
            .orderBy("qid", "rank"))


@F.pandas_udf(T.MapType(T.StringType(), T.LongType()))
def _char_hist_udf(texts: pd.Series) -> pd.Series:
    """Per-value character histogram (codepoint counts) — the Arrow
    replacement for explode(split(content, '')): one map per value
    instead of one row per character."""
    from collections import Counter

    return texts.map(lambda s: dict(Counter(s)) if s is not None else {})


def string_stats_agg(index: Index,
                     queries: Sequence[tuple[str, Sequence[str]]]
                     ) -> DataFrame:
    """String-stats aggregation (the Elasticsearch ``string_stats``
    agg with ``show_distribution``) over the stored content field per
    query match set: value count, min/max/avg character length, and
    the Shannon entropy of the CHARACTER distribution across all
    matched values — ES's exact definition (−Σ pᵢ·log2 pᵢ over every
    character in every value).

    Cross-engine determinism: lengths are exact integers (one final
    division for avg, 6 dp); entropy is a sum of ln() terms, so the
    nb_classifier int64 micro-unit recipe applies — each character's
    −p·log2 p is quantized ONCE to 10⁻⁹ units (floor(x·1e9 + 0.5) as
    long), accumulated as integers (addition-order-proof), and divided
    back once at the end (6 dp). |alphabet| ≤ a few hundred keys per
    query, so the quantized sum is « 2^53.

    Scale shape: the char explode is O(total matched chars) — the
    tokenizer's own class — feeding a map-side-combinable
    (qid, char) count agg; the entropy pass runs over |queries| ×
    |alphabet| rows. Character unit is the JVM UTF-16 code unit
    (≡ codepoint for BMP text; supplementary-plane codepoints would
    count as surrogate pairs — a doc'd divergence from DuckDB's
    codepoint split, unreachable on the ASCII corpus). Returns (qid, count, min_length, max_length,
    avg_length, entropy) ordered by qid. Reference: search delegated
    to the Lucene stack that ships this agg (GROUP_12
    SearchFiles.java:1).
    """
    from .portable import round_half_up
    from .session import fan_out

    # hits feeds THREE branches (lens, the distinct-doc histogram
    # pruning, the per-query char sum); after column pruning the three
    # subtrees no longer canonicalize equal, so nothing is reused and
    # the decode+explode+distinct ran once per branch (r6 plan audit:
    # 4 copies of the subtree, ReusedExchange: 0). One eager
    # localCheckpoint of the narrow (qid, doc_id) set bounds it to one
    # execution; blocks are pair-set sized and die with the RDD (the
    # dedup persist='transient' precedent).
    hits = _matched_hits(index, queries).localCheckpoint(eager=True)
    docs = index.docs.select(
        "doc_id", F.length("content").cast("long").alias("nc"))
    rows = hits.join(docs, "doc_id")
    lens = (rows.groupBy("qid")
            .agg(F.count(F.lit(1)).cast("long").alias("count"),
                 F.min("nc").alias("min_length"),
                 F.max("nc").alias("max_length"),
                 F.sum("nc").alias("tot")))
    # character counts via a per-doc Arrow-batched histogram rather
    # than exploding one row per character of every (qid, doc) pair:
    # the explode was O(Σ_q matched chars) rows through a shuffle —
    # the round-6 profile's 5.8 s of a 6.6 s query at sf1.0, with docs
    # matching ~4.6 queries each re-counted per query. Counting each
    # matched doc ONCE and summing the narrow (doc_id, ch, c) rows per
    # query is count-identical (integer counts), so entropy/avg are
    # bitwise unchanged. Counter iterates codepoints exactly like the
    # JVM's regex-based split("").
    md = hits.select("doc_id").distinct()
    src = (fan_out(index.docs.select("doc_id", "content"))
           .join(md, "doc_id", "left_semi"))
    # builder pattern: materialize the UDF column in its own select,
    # explode in the next (CLAUDE.md round-3 Generate pitfall)
    h = src.select("doc_id", _char_hist_udf("content").alias("h"))
    hist = h.select("doc_id", F.explode("h").alias("ch", "c"))
    qids = [q for q, _ in queries]
    if len(qids) <= 32 and all("'" not in q and "\\" not in q
                               for q in qids):
        # small query batches (the serving norm): pivot the per-query
        # membership into |queries| boolean columns on the per-doc
        # histogram rows and take conditional sums keyed by ch ALONE —
        # the (doc_id, ch) rows cross the plan once instead of once
        # per matching query (the hits⨝hist join multiplied them by
        # ~4.6 at bench scale), and the agg key space collapses from
        # |queries|×|alphabet| to |alphabet| with map-side combine.
        # Conditional sums of the same integer counts ⇒ identical
        # (qid, ch, c) rows (NULL-sum rows are pairs the join never
        # produced).
        flags = hits.groupBy("doc_id").agg(
            *[F.max(F.when(F.col("qid") == q, F.lit(True)))
              .alias(f"_m{i}") for i, q in enumerate(qids)])
        per_ch = (hist.join(flags, "doc_id")
                  .groupBy("ch")
                  .agg(*[F.sum(F.when(F.col(f"_m{i}"), F.col("c")))
                         .alias(f"_c{i}") for i in range(len(qids))]))
        stack = "stack({n}, {args}) as (qid, c)".format(
            n=len(qids),
            args=", ".join(f"'{q}', _c{i}"
                           for i, q in enumerate(qids)))
        chars = (per_ch.select("ch", F.expr(stack))
                 .where(F.col("c").isNotNull())
                 .select("qid", "ch", "c"))
    else:
        chars = (hits.join(hist, "doc_id")
                 .groupBy("qid", "ch")
                 .agg(F.sum("c").alias("c")))
    tot = chars.groupBy("qid").agg(F.sum("c").alias("totc"))
    p = F.col("c").cast("double") / F.col("totc").cast("double")
    term = -(p * F.log2(p))
    micro = F.floor(term * F.lit(1e9) + F.lit(0.5)).cast("long")
    ent = (chars.join(F.broadcast(tot), "qid")
           .select("qid", micro.alias("m"))
           .groupBy("qid").agg(F.sum("m").alias("msum")))
    avg = F.col("tot").cast("double") / F.col("count").cast("double")
    return (lens.join(ent, "qid")
            .select("qid", "count", "min_length", "max_length",
                    round_half_up(avg, 6).alias("avg_length"),
                    round_half_up(F.col("msum").cast("double") /
                                  F.lit(1e9), 6).alias("entropy"))
            .orderBy("qid"))


def script_score_topk(index: Index, query_terms: QueryTerms, k: int,
                      script_sql: str = "s",
                      min_score: float | None = None) -> DataFrame:
    """ES ``script_score`` query: the script's value REPLACES the
    query score (unlike ``rank_feature``'s additive should clause).
    ``script_sql`` is a deterministic Catalyst SQL expression — the
    engine's "script language", mirroring how ES scripts compile to
    Lucene ``DoubleValuesSource`` — over three bound variables:

    * ``s``  — the raw BM25 weighted-OR sum (ES ``_score``)
    * ``dl`` — analyzed doc length (``doc['dl'].value``-class access)
    * ``nc`` — raw char length of the stored content field

    ``min_score``: docs whose (rounded) script score falls below it
    are EXCLUDED from the result entirely — the ES contract, applied
    BEFORE the rank cut (gate-before-cut: exclusion promotes deeper
    docs into the top-k, never truncates it).

    The script reorders arbitrarily, so — like
    :func:`field_value_factor_topk` — scoring is exhaustive over the
    match set with the rank cut last. ES additionally REJECTS negative
    final scores at runtime; a distributed plan cannot cheaply assert
    per-row, so that caller contract is documented, not enforced
    (negative values simply rank low; a script evaluating to NULL
    follows SQL semantics — the doc ranks after every scored doc, and
    under ``min_score`` the NULL comparison excludes it).
    Cross-engine determinism: the
    script output is quantized ONCE to 4 dp (house float discipline)
    and both the ``min_score`` gate and the rank window read the
    ROUNDED value. Returns (qid, doc_id, score, rank). Reference:
    search delegated to the Lucene stack that ships this query
    (GROUP_12 SearchFiles.java:1).
    """
    from .portable import round_half_up

    scored = (score_exhaustive(index, query_terms, None)
              .select("qid", "doc_id", F.col("score").alias("s")))
    feats = index.docs.select(
        "doc_id", F.length("content").cast("double").alias("nc"))
    j = (scored.join(_doc_lengths(index), "doc_id")
         .join(feats, "doc_id")
         .withColumn("fs", round_half_up(F.expr(script_sql), 4)))
    if min_score is not None:
        j = j.where(F.col("fs") >= F.lit(float(min_score)))
    w = Window.partitionBy("qid").orderBy(F.desc("fs"), F.asc("doc_id"))
    return (j.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("qid", "doc_id", F.col("fs").alias("score"), "rank")
            .orderBy("qid", "rank"))


def distance_feature_topk(index: Index, query_terms: QueryTerms, k: int,
                          origin: float, pivot: float,
                          boost: float = 1.0,
                          use_wand: bool = True) -> DataFrame:
    """ES ``distance_feature`` query over the index's raw char-length
    feature (the numeric-field convention shared with
    :func:`rank_feature_topk`): the feature term

        boost · pivot / (pivot + |x − origin|)

    is ADDED to the BM25 sum as a should clause — the exact ES
    formula for numeric/date fields (1.0 at the origin, 0.5 at
    ``pivot`` distance, monotone-decaying), docs missing the feature
    contribute 0. Distinct from ``function_score`` decay
    (engine/fusion.py decayed_topk): decay MULTIPLIES the query score
    and offers gauss/exp/linear shapes; distance_feature is additive,
    reciprocal-shaped, and — because the term is bounded by ``boost``
    (pivot/(pivot+dist) ≤ 1 at dist=0) — WAND-safe: UB_total =
    UB_bm25 + boost, so the default path (``use_wand``, boost ≥ 0)
    runs the block-max kernel with θ-comparisons relaxed by
    boost + WAND_FEATURE_EPS and ``emit='cands'`` (all docs with exact
    bm25 ≥ θ − shift — no bm25 top-k cut, a near-origin doc can win
    from below it), then joins the feature onto the candidate set and
    ranks the rounded totals (VERDICT r4 item 3; rank-identical to the
    exhaustive path by construction, equivalence-tested in
    tests/test_round5_kernel.py).

    Cross-engine determinism: x, origin and pivot are exact doubles;
    the single division quantizes to 6 dp before the add, the
    combined score to 4 dp (house discipline). Returns (qid, doc_id,
    score, rank). Reference: search delegated to the Lucene stack
    that ships this query (GROUP_12 SearchFiles.java:1).
    """
    from .portable import round_half_up

    if float(pivot) <= 0:
        raise ValueError("distance_feature pivot must be > 0")
    if use_wand and float(boost) >= 0.0:
        scored = index.live(_wand_sharded(
            index, query_terms, k, None, "cands",
            ub_shift=float(boost) + WAND_FEATURE_EPS))
    else:
        scored = score_exhaustive(index, query_terms, None)
    feat = index.docs.select(
        "doc_id", F.length("content").cast("double").alias("x"))
    dist = F.abs(F.col("x") - F.lit(float(origin)))
    # docs missing the feature contribute 0 (the ES should-clause
    # contract) — coalesce so a NULL feature can never NULL the score
    fterm = F.coalesce(round_half_up(
        F.lit(float(boost)) * F.lit(float(pivot)) /
        (F.lit(float(pivot)) + dist), 6), F.lit(0.0))
    j = scored.join(feat, "doc_id").withColumn(
        "fscore", round_half_up(F.col("score") + fterm, 4))
    w = Window.partitionBy("qid").orderBy(F.desc("fscore"),
                                          F.asc("doc_id"))
    return (j.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("qid", "doc_id", F.col("fscore").alias("score"),
                    "rank")
            .orderBy("qid", "rank"))


def pinned_topk(index: Index, query_terms: QueryTerms,
                pinned: Sequence[tuple[str, Sequence[int]]], k: int,
                use_wand: bool = True) -> DataFrame:
    """ES ``pinned`` query: per query, the listed doc ids are promoted
    to the TOP of the result in exactly the order given; organic
    results follow in plain BM25 order with pinned docs removed
    (never shown twice). Pinned ids that do not exist in the corpus
    or are tombstoned are skipped (the ES contract — unknown ids are
    ignored, not errors). ES assigns pins synthetic scores
    (Float.MAX_VALUE-class constants so they sort first); here pinned
    rows carry ``score`` NULL and ``pinned`` true instead — the
    honest rendering, since a pin needs no organic score to justify
    its position and computing one for an arbitrarily-deep doc would
    cost a full exhaustive pass.

    Scale shape: the pin list is a per-query constant (broadcast);
    organic retrieval is the engine's sharded block-max WAND page at
    k + |pins| + margin with the house rounded re-rank
    (``use_wand=False`` forces the exhaustive path — rank-identical
    by construction, equivalence-tested), pins drop out via a
    broadcast anti-join, and the overlay window is one per-qid
    row_number. Pins can only push organic rows DOWN, so a k-deep
    organic page always suffices. Returns (qid, doc_id, score,
    pinned, rank). Reference: search delegated to the Lucene stack
    that ships this query (GROUP_12 SearchFiles.java:1).
    """
    from .portable import round_half_up

    spark = index.spark
    prows = []
    for q, ids in pinned:
        seen = set()
        for d in ids:
            if int(d) in seen:       # ES dedups, first occurrence wins
                continue
            seen.add(int(d))
            prows.append((q, int(d), len(seen)))
    pdf = spark.createDataFrame(
        prows or [("", -1, 0)], "qid string, doc_id long, pin_order int")
    if not prows:
        pdf = pdf.where(F.lit(False))
    pdf = index.live(pdf.join(index.docs.select("doc_id"), "doc_id"))
    n_pins = max((len(ids) for _, ids in pinned), default=0)
    if use_wand:
        raw = score_wand(index, query_terms, k + n_pins + 50)
    else:
        raw = score_exhaustive(index, query_terms, None)
    org = (raw.select("qid", "doc_id",
                      round_half_up(F.col("score"), 4).alias("score"))
           .join(pdf.select("qid", "doc_id"), ["qid", "doc_id"],
                 "left_anti")
           .withColumn("pin_order", F.lit(None).cast("int")))
    pins = pdf.select("qid", "doc_id",
                      F.lit(None).cast("double").alias("score"),
                      "pin_order")
    full = pins.unionByName(org)
    w = Window.partitionBy("qid").orderBy(
        F.asc_nulls_last("pin_order"), F.desc_nulls_last("score"),
        F.asc("doc_id"))
    return (full.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("qid", "doc_id", "score",
                    F.col("pin_order").isNotNull().alias("pinned"),
                    "rank")
            .orderBy("qid", "rank"))

def constant_score_topk(index: Index,
                        queries: Sequence[tuple[str, Sequence[str]]],
                        k: int, boost: float = 1.0,
                        mode: str = "any") -> DataFrame:
    """ES ``constant_score`` query: a FILTER-context wrapper — every
    matching doc scores exactly ``boost``, no tf/idf/norm math
    anywhere (Lucene's ConstantScoreQuery, the query ES docs push for
    yes/no clauses because filter context skips scoring and caches).
    ``mode='any'`` wraps an OR-of-terms filter, ``mode='all'`` an
    AND-of-terms filter (the two filter shapes the engine's boolean
    layer provides; richer bool filters compose via
    :func:`boolean_topk`'s machinery).

    With every score identical, ranking degenerates to the index
    order tie-break — doc_id asc, Lucene's constant-score contract —
    so the plan is one bucket-pruned match-set decode feeding a
    per-qid row_number window: NO score aggregation, NO per-term
    weights, nothing proportional to tf. That absence IS the
    operator: at 100× the filter path ships (qid, doc_id) pairs only
    (count_matches' shuffle class), while a scored OR would carry a
    per-posting contribution into an agg. Returns (qid, doc_id,
    score, rank) with score ≡ boost. Reference: search delegated to
    the Lucene stack that ships ConstantScoreQuery (GROUP_12
    SearchFiles.java:1).
    """
    if mode == "any":
        hits = _matched_hits(index, queries)
    elif mode == "all":
        hits = boolean_and(index, queries)
    else:
        raise ValueError(f"unknown constant_score mode {mode!r}")
    w = Window.partitionBy("qid").orderBy(F.asc("doc_id"))
    return (hits.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("qid", "doc_id",
                    F.lit(float(boost)).alias("score"), "rank")
            .orderBy("qid", "rank"))
