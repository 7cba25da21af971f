"""Result-set fusion and field collapsing (post-retrieval reshaping).

Two operators the reference's users would otherwise script by hand on
top of its searcher output (the reference — Assignment Two's
SearchFiles/tools pipeline — stops at a single ranked run per query):

* :func:`rrf_fuse` — Reciprocal Rank Fusion (Cormack, Clarke &
  Buettcher, SIGIR 2009): fuse any number of per-query rankings by
  summing ``1 / (k + rank)``.  This is the standard hybrid
  sparse+dense recipe (Elasticsearch ``rrf`` retriever, Vespa and
  Azure AI Search ship exactly this formula), and is how the engine's
  BM25/WAND path composes with its ANN paths into one hybrid search.
* :func:`collapse_topk` — field collapsing (Lucene's grouping module /
  ``CollapsingTopDocsCollector``, Elasticsearch ``collapse``): at most
  ``per_group`` hits per group key, re-ranked per query.

Both are pure Catalyst plans — a union + hash aggregate + rank
windows; no UDFs, no driver-side loops.  Scale shape at 100 TB:

* fusion consumes already-ranked TOP-K inputs, so its shuffles are
  keyed on (qid, id) over ``n_rankings × k`` rows per query — bounded
  by the requested depth, NOT corpus size;
* collapsing runs over a full scored set when exact semantics are
  required (best-per-group can sit arbitrarily deep — the same
  gate-before-cut rule as doc_filter / deletes), and its windows
  partition by (qid, group) then (qid): per-query parallelism, never a
  single global window.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .portable import round_half_up

#: RRF dampening constant; 60 is the value from Cormack et al. 2009
#: and every production default (Elasticsearch `rank_constant`).
RRF_K = 60


def rrf_fuse(rankings: Sequence[DataFrame], k: int = RRF_K,
             id_col: str = "doc_id", topk: int | None = None,
             ndigits: int = 6) -> DataFrame:
    """Fuse per-query rankings: ``rrf = Σ_r 1 / (k + rank_r)``.

    Each input must carry (qid, ``id_col``, rank) with rank 1-based
    within qid — exactly the shape the engine's top-k operators emit.
    An id absent from one ranking simply contributes nothing for it
    (the Cormack et al. convention).  Ranks, not scores, are fused, so
    heterogeneous score scales (BM25 vs cosine) need no normalization
    — the reason RRF is the robust default for hybrid search.

    Returns (qid, id_col, rrf, n_lists, rank) with rrf rounded to
    ``ndigits`` and the rank window ordered by the ROUNDED score then
    id asc (house cross-engine determinism rule; summed reciprocals
    from different engines agree far beyond 6 dp, and structural ties
    — identical rank sets — round identically).
    """
    assert rankings, "at least one ranking required"
    contribs = [r.select("qid", id_col,
                         (F.lit(1.0) / (F.lit(float(k)) + F.col("rank")))
                         .alias("c"))
                for r in rankings]
    u = contribs[0]
    for c in contribs[1:]:
        u = u.unionByName(c)
    fused = (u.groupBy("qid", id_col)
             .agg(F.sum("c").alias("s"),
                  F.count(F.lit(1)).cast("int").alias("n_lists")))
    r = round_half_up(F.col("s"), ndigits)
    w = Window.partitionBy("qid").orderBy(r.desc(), F.asc(id_col))
    out = (fused.withColumn("rank", F.row_number().over(w))
           .select("qid", id_col, r.alias("rrf"), "n_lists", "rank"))
    if topk is not None:
        out = out.where(F.col("rank") <= topk)
    return out


def linear_fuse(rankings: Sequence[DataFrame],
                weights: Sequence[float] | None = None,
                id_col: str = "doc_id", topk: int | None = None,
                score_col: str = "score",
                ndigits: int = 6) -> DataFrame:
    """Weighted linear fusion with per-query min-max normalization —
    the score-based hybrid alternative to :func:`rrf_fuse`
    (Elasticsearch 8.18's ``linear`` retriever with the ``minmax``
    normalizer; the classic CombSUM-with-normalization of Fox & Shaw
    1994).

    Each input carries (qid, ``id_col``, ``score_col``) — raw scores
    on arbitrary scales (BM25 vs cosine).  Per (qid, input) the scores
    min-max normalize to [0, 1]; the fused score is
    ``Σ_r w_r · norm_r``, with a doc absent from an input contributing
    0 for it (the ES convention).  Degenerate inputs where every doc
    ties (max == min) normalize to 1.0 for all members — they are all
    equally "best"; divergence from ES documented (ES emits 0 there,
    discarding the input's unanimous vote).

    Cross-engine determinism: normalization divides ROUNDED
    (house 6 dp) raw scores — min/max are order-invariant exact
    comparisons, so the only float work is one subtraction/division
    per row — and the fused sum re-rounds at ``ndigits`` before the
    rank window (rounded-score + id-asc house rule).

    Scale shape: identical to RRF — inputs are already-ranked top-k
    sets, so every shuffle (the per-(qid, input) min/max agg, the
    (qid, id) fused sum) is keyed over ``n_rankings × k`` rows per
    query, bounded by requested depth, never corpus size; the min/max
    table (|queries| × n_rankings rows) broadcasts.

    Returns (qid, id_col, fused, n_lists, rank).
    """
    assert rankings, "at least one ranking required"
    if weights is None:
        weights = [1.0] * len(rankings)
    assert len(weights) == len(rankings)
    parts = []
    for i, (r, w_i) in enumerate(zip(rankings, weights)):
        s6 = round_half_up(F.col(score_col).cast("double"), 6)
        parts.append(r.select("qid", id_col, F.lit(i).alias("src"),
                              s6.alias("s")))
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    ext = (u.groupBy("qid", "src")
           .agg(F.min("s").alias("lo"), F.max("s").alias("hi")))
    norm = (u.join(F.broadcast(ext), ["qid", "src"])
            .withColumn("n",
                        F.when(F.col("hi") == F.col("lo"), F.lit(1.0))
                        .otherwise((F.col("s") - F.col("lo")) /
                                   (F.col("hi") - F.col("lo")))))
    wmap = F.create_map(*[x for i, w_i in enumerate(weights)
                          for x in (F.lit(i), F.lit(float(w_i)))])
    contrib = norm.select("qid", id_col,
                          (wmap[F.col("src")] * F.col("n")).alias("c"))
    fused = (contrib.groupBy("qid", id_col)
             .agg(F.sum("c").alias("s"),
                  F.count(F.lit(1)).cast("int").alias("n_lists")))
    r6 = round_half_up(F.col("s"), ndigits)
    w = Window.partitionBy("qid").orderBy(r6.desc(), F.asc(id_col))
    out = (fused.withColumn("rank", F.row_number().over(w))
           .select("qid", id_col, r6.alias("fused"), "n_lists", "rank"))
    if topk is not None:
        out = out.where(F.col("rank") <= topk)
    return out


def decay_multiply(scored: DataFrame, doc_values: DataFrame,
                   origin: float, scale: float, offset: float = 0.0,
                   decay: float = 0.5, kind: str = "gauss",
                   id_col: str = "doc_id", value_col: str = "value",
                   score_col: str = "s") -> DataFrame:
    """Elasticsearch ``function_score`` decay composition: multiply a
    relevance score by a distance decay on a stored numeric doc value
    (the recency/geo boost every production search deployment layers
    on BM25; Lucene exposes the same shape via
    ``FunctionScoreQuery``).

    ``d = max(0, |value - origin| - offset)`` and the multiplier is

    * ``gauss``: ``exp(d² · ln(decay) / scale²)`` — ES's
      ``exp(-d²/2σ²)`` with ``σ² = -scale²/(2·ln decay)`` folded in;
    * ``exp``:   ``exp(d · ln(decay) / scale)``;
    * ``linear``: ``max(0, (s - d) / s)`` with ``s = scale/(1-decay)``.

    All three satisfy multiplier(origin±offset) = 1 and
    multiplier(origin±(offset+scale)) = decay, the ES contract.
    Docs with a NULL / missing value keep multiplier 1 (ES's
    ``missing`` default of the origin).  Pure Catalyst projection on
    the scored set — the join broadcasts when doc_values is a stored
    column fetch, and nothing reshuffles: the (qid, doc) keying of
    ``scored`` is preserved.

    Returns (qid, id_col, score) with score = raw · multiplier,
    unrounded (callers rank with the house rounded-rerank rule).
    """
    import math

    assert kind in ("gauss", "exp", "linear"), kind
    assert 0.0 < decay < 1.0 and scale > 0.0
    joined = scored.join(doc_values.select(id_col, value_col),
                         id_col, "left")
    d = F.greatest(
        F.lit(0.0),
        F.abs(F.col(value_col).cast("double") - F.lit(float(origin)))
        - F.lit(float(offset)))
    ln_decay = math.log(decay)
    if kind == "gauss":
        mult = F.exp(d * d * F.lit(ln_decay / (scale * scale)))
    elif kind == "exp":
        mult = F.exp(d * F.lit(ln_decay / scale))
    else:
        s = scale / (1.0 - decay)
        mult = F.greatest(F.lit(0.0), (F.lit(s) - d) / F.lit(s))
    mult = F.when(F.col(value_col).isNull(), F.lit(1.0)).otherwise(mult)
    return joined.select(
        "qid", id_col, (F.col(score_col) * mult).alias("score"))


def collapse_topk(scored: DataFrame, groups: DataFrame, k: int,
                  per_group: int = 1, id_col: str = "doc_id",
                  group_col: str = "group", score_col: str = "s",
                  ndigits: int = 4) -> DataFrame:
    """Field collapsing: keep the best ``per_group`` docs per
    (qid, group), then rank the survivors per qid and cut at ``k``.

    ``scored``: (qid, id_col, score_col) — the FULL scored match set,
    not a truncated top-k (a group's best hit can sit arbitrarily deep
    in the ungated ranking; collapsing is a gate, and gates apply
    before the rank cut).  ``groups``: (id_col, group_col); docs
    without a group row collapse into per-doc singleton groups (the
    Lucene grouping module's null-group behavior of keeping ungrouped
    hits individually).

    Both windows are qid-partitioned — no single-partition stage.
    Returns (qid, id_col, group_col, score, rank).
    """
    joined = (scored.join(groups, id_col, "left")
              .withColumn(group_col,
                          F.coalesce(F.col(group_col),
                                     F.concat(F.lit("__doc__"),
                                              F.col(id_col)))))
    r = round_half_up(F.col(score_col), ndigits)
    wg = Window.partitionBy("qid", group_col).orderBy(r.desc(),
                                                      F.asc(id_col))
    best = (joined.withColumn("_g", F.row_number().over(wg))
            .where(F.col("_g") <= per_group))
    wq = Window.partitionBy("qid").orderBy(r.desc(), F.asc(id_col))
    return (best.withColumn("rank", F.row_number().over(wq))
            .where(F.col("rank") <= k)
            .select("qid", id_col, group_col, r.alias("score"), "rank"))
