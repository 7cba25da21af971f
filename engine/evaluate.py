"""Retrieval evaluation: MAP / P@5 / P@20 / nDCG@20 (SURVEY.md §2.7
E1-E5; reference tools/evaluate.py:43-95; the reference CI leaderboard
submits the four-metric set MAP/P@5/P@20/nDCG@20,
.github/workflows/evaluation.yml:83 — ``p_at_ks`` covers the extra
precision cutoffs).

Faithfully mirrors the reference's quirks:

* DCG uses rel/log2(i) for i >= 2 and plain rel at i == 1
  (tools/evaluate.py:63-71 — NOT the usual log2(i+1)).
* ideal DCG = DCG of an all-relevant prefix of length min(|rel|, k)
  (tools/evaluate.py:75).
* AP denominator = |relevant_set| (full recall base).
* macro-average over ALL qrels topics; topics missing from the run
  score 0 (tools/evaluate.py:80-95).

Implemented as pure DataFrame ops (windows + aggregations): scales to
arbitrarily many topics even though the reference is 50.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def evaluate_run(run: DataFrame, qrels: DataFrame, k: int = 20,
                 p_at_ks: Sequence[int] = ()) -> DataFrame:
    """Per-topic metrics.

    run:   (qid, docno, rank)       — rank 1-based
    qrels: (qid, docno, rel)        — rel in {0, 1}
    ``p_at_ks``: extra precision cutoffs (e.g. ``(5,)`` for the
    reference leaderboard's P@5), each appended as a ``p_at_<kk>``
    column after the core metrics.
    returns (qid, ap, p_at_k, ndcg_at_k[, p_at_<kk>...]) for every
    qrels topic.
    """
    rel_docs = qrels.where(F.col("rel") > 0).select("qid", "docno").distinct()
    n_rel = rel_docs.groupBy("qid").agg(F.count(F.lit(1)).alias("n_rel"))

    ranked = (run.select("qid", "docno", "rank")
              .join(rel_docs.withColumn("is_rel", F.lit(1)),
                    ["qid", "docno"], "left")
              .withColumn("is_rel", F.coalesce("is_rel", F.lit(0))))

    w = (Window.partitionBy("qid").orderBy("rank")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    ranked = ranked.withColumn("cum_rel", F.sum("is_rel").over(w))

    # E1: AP = sum(precision@hit) / n_rel
    ap = (ranked.where(F.col("is_rel") == 1)
          .withColumn("prec", F.col("cum_rel") / F.col("rank"))
          .groupBy("qid").agg(F.sum("prec").alias("sum_prec")))

    # E2: P@k
    pk = (ranked.where(F.col("rank") <= k)
          .groupBy("qid")
          .agg((F.sum("is_rel") / F.lit(k)).alias("p_at_k")))

    # E3: DCG@k with the reference's log2(i) discount (i>=2)
    dcg = (ranked.where(F.col("rank") <= k)
           .withColumn("gain",
                       F.when(F.col("rank") == 1, F.col("is_rel").cast("double"))
                       .otherwise(F.col("is_rel") / F.log2(F.col("rank"))))
           .groupBy("qid").agg(F.sum("gain").alias("dcg")))

    # ideal DCG = all-relevant prefix of length min(n_rel, k):
    # 1 + sum_{i=2..m} 1/log2(i), computed closed-form per topic via a
    # tiny sequence explode (k is small).
    ideal = (n_rel
             .withColumn("m", F.least(F.col("n_rel"), F.lit(k)))
             .withColumn("i", F.explode(F.sequence(F.lit(1), F.col("m"))))
             .withColumn("gain",
                         F.when(F.col("i") == 1, F.lit(1.0))
                         .otherwise(F.lit(1.0) / F.log2(F.col("i"))))
             .groupBy("qid", "n_rel").agg(F.sum("gain").alias("idcg")))

    # extra precision cutoffs (reference leaderboard: P@5 beside P@20)
    extra = {}
    for kk in p_at_ks:
        extra[kk] = (ranked.where(F.col("rank") <= kk)
                     .groupBy("qid")
                     .agg((F.sum("is_rel") / F.lit(int(kk)))
                          .alias(f"p_at_{kk}")))

    # E4 framing: every qrels topic appears; missing run topics score 0.
    topics = qrels.select("qid").distinct()
    out = (topics
           .join(ideal.select("qid", "n_rel", "idcg"), "qid", "left")
           .join(ap, "qid", "left")
           .join(pk, "qid", "left")
           .join(dcg, "qid", "left")
           .withColumn("ap", F.coalesce(F.col("sum_prec") / F.col("n_rel"),
                                        F.lit(0.0)))
           .withColumn("p_at_k", F.coalesce("p_at_k", F.lit(0.0)))
           .withColumn("ndcg_at_k",
                       F.coalesce(F.col("dcg") / F.col("idcg"), F.lit(0.0))))
    cols = ["qid", "ap", "p_at_k", "ndcg_at_k"]
    for kk, dfk in extra.items():
        out = (out.join(dfk, "qid", "left")
               .withColumn(f"p_at_{kk}",
                           F.coalesce(f"p_at_{kk}", F.lit(0.0))))
        cols.append(f"p_at_{kk}")
    return out.select(*cols)


def macro_metrics(run: DataFrame, qrels: DataFrame, k: int = 20,
                  p_at_ks: Sequence[int] = ()) -> dict:
    """E4: MAP / P@k / nDCG@k (+ extra P@kk) macro-averaged over all
    qrels topics."""
    per = evaluate_run(run, qrels, k, p_at_ks=p_at_ks)
    aggs = [F.avg("ap"), F.avg("p_at_k"), F.avg("ndcg_at_k")]
    aggs += [F.avg(f"p_at_{kk}") for kk in p_at_ks]
    row = per.agg(*aggs).collect()[0]
    out = {"MAP": float(row[0] or 0.0),
           f"P@{k}": float(row[1] or 0.0),
           f"nDCG@{k}": float(row[2] or 0.0)}
    for i, kk in enumerate(p_at_ks):
        out[f"P@{kk}"] = float(row[3 + i] or 0.0)
    return out


def standings(runs: dict[str, DataFrame], qrels: DataFrame,
              k: int = 20) -> list[dict]:
    """E5 (tools/evaluate.py:97-125): evaluate several runs, sorted by
    (MAP, nDCG@k, P@k) descending."""
    rows = []
    for name, run in runs.items():
        m = macro_metrics(run, qrels, k)
        rows.append({"run": name, **m})
    rows.sort(key=lambda r: (r["MAP"], r[f"nDCG@{k}"], r[f"P@{k}"]),
              reverse=True)
    return rows


def extra_metrics(run: DataFrame, qrels: DataFrame) -> DataFrame:
    """R-precision and bpref — trec_eval's judged-aware companions to
    the reference's four-metric set (Buckley & Voorhees, SIGIR 2004;
    trec_eval 8.1 semantics):

    * ``r_prec`` = |relevant within the top-R| / R with R = |relevant|
      per topic — precision at the recall-equivalence point.
    * ``bpref``  = (1/R) Σ_{relevant retrieved r}
      (1 − min(nonrel_above(r), D) / D) with D = max(min(R, N), 1),
      where N = |judged NONrelevant| and nonrel_above counts judged
      nonrelevant retrieved above r.  bpref only reacts to JUDGED
      documents, so it is the stable metric under incomplete judgments
      (the reason TREC adopted it).  D's max(·,1) pins the degenerate
      N = 0 case to full credit per retrieved relevant doc.

    run:   (qid, docno, rank);  qrels: (qid, docno, rel) with rel = 1
    relevant, rel = 0 judged-nonrelevant (unjudged docs simply absent).
    Topics with R = 0 are excluded (as trec_eval does); every other
    qrels topic appears, scoring 0 when absent from the run.  Pure
    window + aggregate plan, qid-partitioned throughout.
    """
    rel_docs = (qrels.where(F.col("rel") > 0)
                .select("qid", "docno").distinct())
    nonrel_docs = (qrels.where(F.col("rel") == 0)
                   .select("qid", "docno").distinct()
                   .join(rel_docs, ["qid", "docno"], "left_anti"))
    n_rel = rel_docs.groupBy("qid").agg(F.count(F.lit(1)).alias("n_rel"))
    n_non = nonrel_docs.groupBy("qid").agg(
        F.count(F.lit(1)).alias("n_non"))

    ranked = (run.select("qid", "docno", "rank")
              .join(rel_docs.withColumn("is_rel", F.lit(1)),
                    ["qid", "docno"], "left")
              .join(nonrel_docs.withColumn("is_non", F.lit(1)),
                    ["qid", "docno"], "left")
              .withColumn("is_rel", F.coalesce("is_rel", F.lit(0)))
              .withColumn("is_non", F.coalesce("is_non", F.lit(0))))
    w = (Window.partitionBy("qid").orderBy("rank")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    # at a relevant row is_non = 0, so the inclusive cumsum equals the
    # strictly-above judged-nonrelevant count
    ranked = ranked.withColumn("cum_non", F.sum("is_non").over(w))

    rp = (ranked.join(n_rel, "qid")
          .where(F.col("rank") <= F.col("n_rel"))
          .groupBy("qid")
          .agg((F.sum("is_rel") / F.first("n_rel")).alias("r_prec")))

    d = F.greatest(F.least(F.col("n_rel"), F.col("n_non")), F.lit(1)) \
        .cast("double")
    bp = (ranked.join(n_rel, "qid")
          .join(n_non, "qid", "left")
          .withColumn("n_non", F.coalesce("n_non", F.lit(0)))
          .where(F.col("is_rel") == 1)
          .withColumn("contrib",
                      F.lit(1.0) - F.least(F.col("cum_non").cast("double"),
                                           d) / d)
          .groupBy("qid")
          .agg((F.sum("contrib") / F.first("n_rel")).alias("bpref")))

    return (n_rel.select("qid")
            .join(rp, "qid", "left")
            .join(bp, "qid", "left")
            .select("qid",
                    F.coalesce("r_prec", F.lit(0.0)).alias("r_prec"),
                    F.coalesce("bpref", F.lit(0.0)).alias("bpref")))

def rank_eval_metrics(run: DataFrame, qrels: DataFrame,
                      k: int = 20) -> DataFrame:
    """The ES ``_rank_eval`` API's remaining metric set beside the
    reference's four: per-topic MRR@k, recall@k, and ERR@k
    (Chapelle et al., CIKM 2009 — the metric ES ships as
    ``expected_reciprocal_rank``).

    * ``mrr``    = 1/rank of the FIRST relevant doc within the top-k,
      0 when none (the ES reciprocal_rank contract).
    * ``recall`` = |relevant ∩ top-k| / |relevant| (ES recall's
      full-recall base, same denominator class as AP's).
    * ``err``    = Σ_{r≤k} (1/r)·R_r·Π_{i<r}(1−R_i) with binary
      grades: R ∈ {0, ½} via (2^g−1)/2^g_max at g_max = 1 — so each
      relevant doc at rank r with m relevant above contributes
      (½)^{m+1}/r.

    Determinism: MRR and recall are one division each; ERR terms mix
    exact dyadics with a 1/r division, so each term is quantized ONCE
    to int64 nano-units (the nb_classifier recipe), integer-summed,
    divided back once (6 dp — sums of per-rank floats would carry
    addition-order ulps across engines otherwise).

    run: (qid, docno, rank); qrels: (qid, docno, rel) with rel ∈
    {0, 1}. Every qrels topic with ≥1 relevant doc appears (topics
    absent from the run score 0); R = 0 topics are excluded as
    trec_eval does. Pure window + aggregate plan, qid-partitioned.
    """
    rel_docs = (qrels.where(F.col("rel") > 0)
                .select("qid", "docno").distinct())
    n_rel = rel_docs.groupBy("qid").agg(
        F.count(F.lit(1)).alias("n_rel"))

    ranked = (run.select("qid", "docno", "rank")
              .where(F.col("rank") <= k)
              .join(rel_docs.withColumn("is_rel", F.lit(1)),
                    ["qid", "docno"], "left")
              .withColumn("is_rel", F.coalesce("is_rel", F.lit(0))))
    w = (Window.partitionBy("qid").orderBy("rank")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    ranked = ranked.withColumn("cum_rel", F.sum("is_rel").over(w))

    hits = ranked.where(F.col("is_rel") == 1)
    mrr = hits.groupBy("qid").agg(
        (F.lit(1.0) / F.min("rank")).alias("mrr_raw"))
    rec = hits.groupBy("qid").agg(
        F.count(F.lit(1)).cast("long").alias("rel_in_k"))
    # ERR term: (1/2)^cum_rel / rank, nano-quantized per term
    term = (F.pow(F.lit(0.5), F.col("cum_rel")) /
            F.col("rank").cast("double"))
    nano = F.floor(term * F.lit(1e9) + F.lit(0.5)).cast("long")
    err = (hits.select("qid", nano.alias("t"))
           .groupBy("qid").agg(F.sum("t").alias("tsum")))

    from .portable import round_half_up
    out = (n_rel
           .join(mrr, "qid", "left")
           .join(rec, "qid", "left")
           .join(err, "qid", "left")
           .select(
               "qid",
               round_half_up(F.coalesce("mrr_raw", F.lit(0.0)), 6)
               .alias("mrr"),
               round_half_up(
                   F.coalesce("rel_in_k", F.lit(0)).cast("double") /
                   F.col("n_rel").cast("double"), 6).alias("recall"),
               round_half_up(
                   F.coalesce("tsum", F.lit(0)).cast("double") /
                   F.lit(1e9), 6).alias("err"))
           .orderBy("qid"))
    return out
