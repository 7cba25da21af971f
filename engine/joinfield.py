"""ES join-field family — ``has_child`` / ``has_parent`` queries and
the ``children`` aggregation — as co-partitioned relational joins.

ES models 1-N document relations with a ``join`` field and requires
parent and children routed to the SAME shard; queries then pivot
between the two contexts: ``has_child`` returns PARENTS whose
children match (child scores folded by ``score_mode`` ∈ none/sum/
max/min/avg, gated by ``min_children``/``max_children``),
``has_parent`` returns CHILDREN whose parent matches (parent score
propagated), and the ``children`` agg switches a parent bucket
context to child-level metrics. The ``nested`` query is the same
algebra over inner objects — a child table that happens to be stored
inline; Spark's natural encoding of both is the exploded child
DataFrame, so one implementation covers the pair.

Scale shape: everything here is an equi-join on the parent key plus
one map-side-combinable agg — the Spark analog of ES's same-shard
routing is co-partitioning on the parent key (broadcast when one side
is dim-sized; the fold-then-join order below aggregates children
BEFORE touching parents, so the shuffled payload is one row per
parent, not one per child). Scores accumulate in int64 micro-units
(CLAUDE.md float recipe) so engine sum order can never flip a rank.

Reference scope: the Lucene/ES stack the reference repo wraps ships
the join field (GROUP_12 SearchFiles.java:1).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from engine.portable import round_half_up

SCORE_MODES = ("none", "sum", "max", "min", "avg")


def has_child(parents: DataFrame, children: DataFrame,
              parent_key: str, child_key: str,
              child_match: Column, child_score_mu: Column,
              score_mode: str = "sum", min_children: int = 1,
              max_children: int | None = None,
              k: int = 10, ndigits: int = 2) -> DataFrame:
    """ES ``has_child``: parents with a matching-children count in
    [min_children, max_children], scored by ``score_mode`` over the
    int64-micro-unit child scores, top-k by (score desc, key asc).

    Returns (parent_key, n_children, score, rank); ``score_mode
    'none'`` emits 0.0 scores and ranks by key alone (the ES
    constant-score reading)."""
    assert score_mode in SCORE_MODES
    matched = children.where(child_match).select(
        F.col(child_key).alias(parent_key),
        child_score_mu.cast("long").alias("s_mu"))
    # fold children FIRST: the join then ships one row per parent
    folded = (matched.groupBy(parent_key)
              .agg(F.count(F.lit(1)).alias("n_children"),
                   F.sum("s_mu").alias("sum_mu"),
                   F.max("s_mu").alias("max_mu"),
                   F.min("s_mu").alias("min_mu")))
    folded = folded.where(F.col("n_children") >= F.lit(int(min_children)))
    if max_children is not None:
        folded = folded.where(
            F.col("n_children") <= F.lit(int(max_children)))
    gated = parents.select(parent_key).join(folded, parent_key)
    if score_mode == "none":
        score = F.lit(0.0)
    elif score_mode == "sum":
        score = F.col("sum_mu") / F.lit(1e6)
    elif score_mode == "max":
        score = F.col("max_mu") / F.lit(1e6)
    elif score_mode == "min":
        score = F.col("min_mu") / F.lit(1e6)
    else:                               # avg
        score = F.col("sum_mu") / F.col("n_children") / F.lit(1e6)
    scored = gated.select(parent_key, "n_children",
                          round_half_up(score, ndigits).alias("score"))
    order = [F.desc("score"), F.asc(parent_key)] \
        if score_mode != "none" else [F.asc(parent_key)]
    top = scored.orderBy(*order).limit(int(k))
    w = Window.orderBy(*order)
    return top.withColumn("rank", F.row_number().over(w))


def has_parent(children: DataFrame, parents: DataFrame,
               parent_key: str, child_key: str,
               parent_match: Column, parent_score: Column,
               ndigits: int = 2) -> DataFrame:
    """ES ``has_parent``: children whose parent matches, with the
    parent's score propagated onto every child (the ES contract —
    one parent score, broadcast down). Returns the child rows +
    ``parent_score``; the parent side is filtered BEFORE the join so
    a dim-sized match set broadcasts."""
    p = (parents.where(parent_match)
         .select(F.col(parent_key).alias(child_key),
                 round_half_up(parent_score, ndigits)
                 .alias("parent_score")))
    return children.join(F.broadcast(p), child_key)


def children_agg(parents: DataFrame, children: DataFrame,
                 parent_key: str, child_key: str, bucket_col: str,
                 child_value_mu: Column, ndigits: int = 2) -> DataFrame:
    """ES ``children`` aggregation: parent buckets (``bucket_col``)
    switched to child context — child doc count and the micro-unit-
    exact child value sum/avg per bucket. The bucket label joins onto
    the folded child rows (one per parent), not the raw children."""
    folded = (children.select(
        F.col(child_key).alias(parent_key),
        child_value_mu.cast("long").alias("v_mu"))
        .groupBy(parent_key)
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v_mu").alias("mu")))
    lab = parents.select(parent_key, bucket_col)
    return (lab.join(folded, parent_key)
            .groupBy(bucket_col)
            .agg(F.sum("n").alias("n_children"),
                 round_half_up(F.sum("mu") / F.lit(1e6), ndigits)
                 .alias("sum_value"),
                 round_half_up(F.sum("mu") / F.sum("n") / F.lit(1e6),
                               ndigits).alias("avg_value")))
