"""Round-5 ADVICE regressions (ADVICE.md r4):

* value_count_missing_agg must not fan out the match set when the
  stored-fields table carries duplicate doc_id rows — the documented
  invariant n_docs = value_count + missing = |match set| has to hold
  on dirty input too;
* span_or_near_match must REJECT a repeated qid instead of silently
  cross-pairing the duplicates through its per-qid joins;
* simple_query_string accumulates per-term int64 micro-unit scores
  through the boolean tree — association-free, so the engine total
  equals an integer recompute from per-term scalar BM25 exactly
  (not just at 4 dp).
"""

import math

import pytest
from pyspark.sql import functions as F

from engine.analysis import tokenize_texts
from engine.search import value_count_missing_agg


def _queries(tiny_index):
    terms = [r["term"] for r in
             tiny_index.termstats.orderBy(F.desc("df"), "term")
             .limit(2).collect()]
    return [("q1", [terms[0]]), ("q2", [terms[1]])]


def test_value_count_missing_dup_fields_rows(spark, tiny_index):
    queries = _queries(tiny_index)
    rows = tiny_index.docs.select("doc_id", "content").collect()
    toks = tokenize_texts([r["content"] for r in rows])
    terms_of = {r["doc_id"]: set(t) for r, t in zip(rows, toks)}
    all_ids = sorted(terms_of)
    clean = [(d, f"g{d % 2}") for d in all_ids]
    fields = spark.createDataFrame(clean, "doc_id long, grp string")
    base = {r["qid"]: (r["n_docs"], r["value_count"], r["missing"])
            for r in value_count_missing_agg(
                tiny_index, queries, fields, "grp").collect()}
    # triplicate every fields row (same value, so dedup is
    # deterministic): counts must be IDENTICAL to the clean run
    dirty = spark.createDataFrame(clean * 3, "doc_id long, grp string")
    got = {r["qid"]: (r["n_docs"], r["value_count"], r["missing"])
           for r in value_count_missing_agg(
               tiny_index, queries, fields=dirty, field="grp").collect()}
    assert got == base
    for qid, ts in queries:
        n = sum(1 for d in all_ids
                if any(t in terms_of[d] for t in ts))
        assert got[qid][0] == n              # no fan-out
        assert got[qid][1] + got[qid][2] == n


def test_span_or_duplicate_qid_raises(spark, tiny_index):
    from engine.positions import build_positions, span_or_near_match

    build_positions(spark, tiny_index.index_dir)
    ts = [r["term"] for r in
          tiny_index.termstats.orderBy(F.desc("df"), "term")
          .limit(3).collect()]
    with pytest.raises(ValueError, match="duplicate qid"):
        span_or_near_match(tiny_index, [
            ("q", [ts[0]], ts[2], 3),
            ("q", [ts[1]], ts[2], 5),
        ])
    # distinct qids with the same shape still work
    out = span_or_near_match(tiny_index, [
        ("qa", [ts[0]], ts[2], 3),
        ("qb", [ts[1]], ts[2], 5),
    ])
    assert {c for c in out.columns} == {
        "qid", "doc_id", "span_start", "span_end"}


def test_sqs_score_is_integer_exact(spark, tiny_index):
    """The engine's simple_query_string total must equal a per-term
    int64 micro-unit recompute EXACTLY — integer accumulation leaves
    no addition-order ulp for Spark's partial aggs to vary."""
    from engine.queryparse import simple_query_string_topk
    from engine.scoring import bm25_col
    from engine.search import score_exhaustive

    terms = [r["term"] for r in
             tiny_index.termstats.orderBy(F.desc("df"), "term")
             .limit(3).collect()]
    a, b, c = terms
    q = f"{a} + ({b} | {c})"
    got = {r["doc_id"]: r["score"]
           for r in simple_query_string_topk(
               tiny_index, "q", q, k=10).collect()}
    assert got, "query matched nothing — pick different terms"
    # per-term micro-unit reference via the oracle-green scorer
    per = {(r["qid"], r["doc_id"]): math.floor(r["score"] * 1e6 + 0.5)
           for r in score_exhaustive(
               tiny_index, [("ta", a, 1.0), ("tb", b, 1.0),
                            ("tc", c, 1.0)], k=None).collect()}
    for d, s in got.items():
        total = per[("ta", d)]
        total += per.get(("tb", d), 0) + per.get(("tc", d), 0)
        want = math.floor(total / 1e6 * 1e4 + 0.5) / 1e4
        assert s == want, (d, s, want)
