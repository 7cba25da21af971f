"""ES ``frequent_item_sets`` aggregation — closed frequent itemsets
over per-document distinct token sets, mined Apriori-style.

Deterministic reading of the ES agg (its docs describe Eclat over
multi-valued fields returning the most frequent CLOSED item sets):

* items = a document's DISTINCT lowercase-alnum tokens;
* support = number of documents containing ALL items of the set,
  frequent ⇔ support ≥ ceil(min_support · n_docs);
* sets mined up to ``max_set_size`` (ES caps the same way via its
  ``size``/runtime limits); within that mined universe a set is
  CLOSED iff no mined superset has EQUAL support — pairs are checked
  against frequent triples, top-size sets are closed by contract;
* rank = (support desc, set_size asc, items asc), top-N.

Scale shape (the Apriori/Eclat plan every production miner uses):

1. L1 — ONE map-side-combinable (item → doc count) agg; the frequent
   item list is DRIVER-BOUNDED by construction (|L1| ≤ total item
   occurrences / minsup) and broadcast back as an array literal.
2. COLLAPSE — per-doc item lists FILTERED to L1 in-row, then
   aggregated to DISTINCT projected sets with multiplicities (the
   condensed-transaction table of FP-growth-class miners): every
   later stage works per distinct frequent-item profile, weighted,
   never per document. Zero collapse degrades gracefully to the
   per-doc plan; real corpora share profiles heavily.
3. L2/L3 — weighted in-row pair/triple enumeration over the
   collapsed table (O(C(m', k)) per set, m' = frequent items in the
   set — the L1 prune is what bounds it) into one map-side-combinable
   count each. The support floor subsumes the Apriori candidate
   prune, so no candidate set is ever materialized. No self-join of
   the corpus anywhere.

Counts are integers end-to-end — bit-exact in any engine; the DuckDB
oracle states the identical lattice with joins instead of closures.

Reference scope: the Lucene/ES stack the reference repo wraps ships
this agg family (GROUP_12 SearchFiles.java:1).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def frequent_item_sets(docs: DataFrame, text_col: str = "text",
                       min_support: float = 0.6, max_set_size: int = 3,
                       min_set_size: int = 2,
                       top_n: int = 25) -> DataFrame:
    """Mine closed frequent itemsets; returns (items, set_size,
    support, rank) with ``items`` the space-joined sorted set."""
    assert 1 <= min_set_size <= max_set_size <= 3
    toks = F.expr(
        f"filter(split(lower({text_col}), '[^a-z0-9]+'), x -> x <> '')")
    d = docs.select(F.array_sort(F.array_distinct(toks)).alias("items"))
    d = d.where(F.size("items") > 0)
    # every heavy frame here is consumed by driver-side collect()s and
    # the returned DataFrame is rebuilt from driver rows (_rank), so
    # cache + unpersist inside the call is safe and saves the 3-4
    # re-tokenizations of the corpus the collect boundaries otherwise
    # force (measured ~2 s of the sf0.1 path)
    d = d.cache()
    n_docs = d.count()
    minsup = max(int(math.ceil(min_support * n_docs)), 1)

    # L1: one hash agg; result driver-bounded by support ≥ minsup
    l1_rows = (d.select(F.explode("items").alias("i"))
               .groupBy("i").agg(F.count(F.lit(1)).alias("support"))
               .where(F.col("support") >= F.lit(minsup))
               .collect())
    l1 = {r["i"]: r["support"] for r in l1_rows}
    freq1 = sorted(l1)
    out_rows: list[tuple[str, int, int]] = []   # (items, size, support)
    if min_set_size <= 1:
        out_rows += [(i, 1, l1[i]) for i in freq1]
    if not freq1 or max_set_size < 2:
        d.unpersist()
        return _rank(docs.sparkSession, out_rows, _close1(out_rows, []),
                     top_n)

    # materialize the frequent-filtered list ONCE (builder pattern —
    # no re-eval per element), then COLLAPSE to distinct projected
    # sets with multiplicities: documents sharing a frequent-item
    # profile become ONE weighted row (the condensed-transaction
    # trick every FP-growth-class miner uses) — at sf0.1 this took
    # the L3 stage from 52.5 s to 1.6 s (5,000 docs → 3,725 distinct
    # sets, and the enumeration replaced a 4,060-literal HOF
    # membership filter that cost ~500M string compares).
    farr = F.array(*[F.lit(x) for x in freq1])
    fd = (d.select(F.array_intersect("items", farr).alias("fitems"))
          .where(F.size("fitems") >= 2)
          .groupBy("fitems").agg(F.count(F.lit(1)).alias("w"))
          .cache())
    pairs = fd.select(F.col("w"), F.explode(F.expr(
        "flatten(transform(fitems, (x, i) -> "
        "transform(slice(fitems, i + 2, size(fitems)), "
        "y -> struct(x AS a, y AS b))))")).alias("p"))
    l2_rows = (pairs.select("w", "p.a", "p.b")
               .groupBy("a", "b").agg(F.sum("w").alias("support"))
               .where(F.col("support") >= F.lit(minsup))
               .collect())
    l2 = {(r["a"], r["b"]): r["support"] for r in l2_rows}
    if min_set_size <= 2:
        out_rows += [(f"{a} {b}", 2, s) for (a, b), s in l2.items()]

    l3: dict[tuple[str, str, str], int] = {}
    if max_set_size >= 3 and l2:
        # weighted in-row triple enumeration over the collapsed set
        # table — the support floor subsumes the Apriori candidate
        # prune (a triple with an infrequent sub-pair cannot reach
        # minsup), so no candidate array is materialized at all;
        # per-row work is C(m', 3) with m' the frequent items in the
        # set, the same bound ES enforces via its size/runtime caps
        triples = (fd.where(F.size("fitems") >= 3)
                   .select(F.col("w"), F.explode(F.expr(
                       "flatten(transform(fitems, (x, i) -> "
                       "flatten(transform(slice(fitems, i + 2, "
                       "size(fitems)), (y, j) -> "
                       "transform(slice(fitems, i + j + 3, "
                       "size(fitems)), "
                       "z -> struct(x AS a, y AS b, z AS c))))))"))
                       .alias("t")))
        l3_rows = (triples.groupBy("t")
                   .agg(F.sum("w").alias("support"))
                   .where(F.col("support") >= F.lit(minsup))
                   .collect())
        l3 = {(r["t"]["a"], r["t"]["b"], r["t"]["c"]): r["support"]
              for r in l3_rows}
        out_rows += [(" ".join(t), 3, s) for t, s in l3.items()]

    d.unpersist()
    fd.unpersist()
    closed = _closed_keys(l1, l2, l3, min_set_size, max_set_size)
    out_rows = [r for r in out_rows if r[0] in closed]
    return _rank(docs.sparkSession, out_rows, closed, top_n)


def _close1(rows, _):
    return {r[0] for r in rows}


def _closed_keys(l1, l2, l3, min_set_size, max_set_size) -> set[str]:
    """Closed-within-the-mined-universe keys: a set survives unless a
    mined FREQUENT superset one size up has equal support."""
    keys: set[str] = set()
    for i, s in l1.items():
        if min_set_size <= 1 and not any(
                sp == s for (a, b), sp in l2.items() if i in (a, b)):
            keys.add(i)
    for (a, b), s in l2.items():
        if min_set_size <= 2 and not any(
                sp == s for t, sp in l3.items() if a in t and b in t):
            keys.add(f"{a} {b}")
    for t in l3:                      # top mined size: closed by contract
        keys.add(" ".join(t))
    return keys


def _rank(spark, rows, closed, top_n) -> DataFrame:
    df = spark.createDataFrame(
        rows or [("", 0, 0)],
        "items string, set_size int, support long")
    if not rows:
        df = df.where(F.lit(False))
    w = Window.orderBy(F.desc("support"), F.asc("set_size"),
                       F.asc("items"))
    return (df.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= int(top_n)))


def frequent_item_sets_sql(table_expr: str, text_col: str = "text",
                           min_support: float = 0.6,
                           max_set_size: int = 3, min_set_size: int = 2,
                           top_n: int = 25) -> str:
    """DuckDB twin: the identical lattice as joins (supports are
    integers, so plan-shape differences cannot move a value)."""
    assert min_set_size == 2 and max_set_size == 3, \
        "oracle pinned to the entry's configuration"
    return f"""
WITH d AS (
  SELECT row_number() OVER () AS did,
         list_sort(list_distinct(
           [x for x in regexp_split_to_array(lower({text_col}),
                                             '[^a-z0-9]+')
            if x <> ''])) AS items
  FROM {table_expr}),
d2 AS (SELECT * FROM d WHERE len(items) > 0),
ms AS (SELECT CAST(ceil({min_support!r} * count(*)) AS BIGINT) AS v
       FROM d2),
s AS (SELECT did, unnest(items) AS i FROM d2),
l1 AS (SELECT i, count(*)::BIGINT AS support FROM s GROUP BY i
       HAVING count(*) >= (SELECT v FROM ms)),
sf AS (SELECT s.did, s.i FROM s JOIN l1 USING (i)),
l2 AS (SELECT x.i AS a, y.i AS b, count(*)::BIGINT AS support
       FROM sf x JOIN sf y ON x.did = y.did AND x.i < y.i
       GROUP BY 1, 2 HAVING count(*) >= (SELECT v FROM ms)),
c3 AS (SELECT p.a, p.b, q.b AS c
       FROM l2 p JOIN l2 q ON p.a = q.a AND p.b < q.b
       JOIN l2 r ON r.a = p.b AND r.b = q.b),
l3 AS (SELECT c3.a, c3.b, c3.c, count(*)::BIGINT AS support
       FROM c3 JOIN sf x ON x.i = c3.a
       JOIN sf y ON y.did = x.did AND y.i = c3.b
       JOIN sf z ON z.did = x.did AND z.i = c3.c
       GROUP BY 1, 2, 3 HAVING count(*) >= (SELECT v FROM ms)),
closed2 AS (
  SELECT a, b, support FROM l2
  WHERE NOT EXISTS (SELECT 1 FROM l3
                    WHERE l3.support = l2.support
                      AND l2.a IN (l3.a, l3.b, l3.c)
                      AND l2.b IN (l3.a, l3.b, l3.c))),
u AS (
  SELECT a || ' ' || b AS items, 2 AS set_size, support FROM closed2
  UNION ALL
  SELECT a || ' ' || b || ' ' || c AS items, 3 AS set_size, support
  FROM l3),
r AS (SELECT items, set_size, support,
             row_number() OVER (ORDER BY support DESC, set_size ASC,
                                items ASC) AS rank
      FROM u)
SELECT items, set_size, support, rank FROM r WHERE rank <= {int(top_n)}
"""
