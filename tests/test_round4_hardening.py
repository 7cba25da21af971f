"""Regression tests for the round-4 hardening wave: NULL semantics in
scripted_metric (a no-ELSE CASE map must not shrink n_docs, and avg
divides by the non-NULL count), t_test pairs whose side matches
NOTHING (the qid row must survive with the documented NULL stats, not
vanish through an inner join), filters_agg's other bucket counting
live zero-token docs (no dl row), script_score's NULL-script ordering
(rank after every scored doc; excluded under min_score), the
moving-percentiles label collision (99.0 vs 99.9 both rendered
p99_n before the fix), and range_agg's empty-list / int-bound caller
contracts."""

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from engine import streaming


def _r(x, p):
    return math.floor(x * 10 ** p + 0.5) / 10 ** p


def _common_term(tiny_index):
    return (tiny_index.termstats.orderBy(F.desc("df"), "term")
            .limit(1).collect()[0]["term"])


# ---------------------------------------------------------------------------
# scripted_metric: NULL map values
# ---------------------------------------------------------------------------

def test_scripted_metric_null_map_values(spark, tiny_index):
    """A no-ELSE CASE map emits NULL for non-matching docs: n_docs
    still counts EVERY matched doc (sql COUNT(1)), sum skips NULLs,
    and avg divides by the non-NULL count — not n_docs."""
    from engine.analysis import tokenize_texts
    from engine.search import scripted_metric_agg

    term = _common_term(tiny_index)
    rows = tiny_index.docs.select("doc_id", "content", "lang").collect()
    toks = tokenize_texts([r["content"] for r in rows])
    info = {r["doc_id"]: (len(t), r["lang"], set(t))
            for r, t in zip(rows, toks)}
    matched = [d for d, (_, _, s) in info.items() if term in s]
    py = [d for d in matched if info[d][1] == "python"]
    assert py and len(py) < len(matched), "fixture: need a py/non-py mix"

    map_sql = "case when lang = 'python' then dl end"  # no ELSE -> NULL
    got_sum = {r["qid"]: (r["n_docs"], r["value"])
               for r in scripted_metric_agg(
                   tiny_index, [("q1", [term])], map_sql, "sum").collect()}
    exp_sum = float(sum(info[d][0] for d in py))
    assert got_sum["q1"] == (len(matched), _r(exp_sum, 6))

    got_avg = {r["qid"]: (r["n_docs"], r["value"])
               for r in scripted_metric_agg(
                   tiny_index, [("q1", [term])], map_sql, "avg").collect()}
    exp_avg = sum(info[d][0] for d in py) / len(py)   # non-NULL count
    assert got_avg["q1"] == (len(matched), _r(exp_avg, 6))


# ---------------------------------------------------------------------------
# t_test: a side matching nothing must not drop the qid
# ---------------------------------------------------------------------------

def test_t_test_empty_side_keeps_qid(spark, tiny_index):
    from engine.search import t_test_agg

    term = _common_term(tiny_index)
    out = {r["qid"]: r.asDict() for r in t_test_agg(tiny_index, [
        ("q_b_empty", [term], ["zzz_no_such_term"]),
        ("q_a_empty", ["zzz_no_such_term"], [term]),
        ("q_both", ["zzz_no_such_term"], ["zzz_no_such_term"]),
    ]).collect()}
    assert set(out) == {"q_b_empty", "q_a_empty", "q_both"}
    assert out["q_b_empty"]["n_b"] == 0
    assert out["q_a_empty"]["n_a"] == 0
    assert out["q_both"]["n_a"] == 0 and out["q_both"]["n_b"] == 0
    for q in out.values():
        assert q["t_welch"] is None and q["t_pooled"] is None
    # the non-empty side's mean is still defined
    assert out["q_b_empty"]["mean_a"] is not None
    assert out["q_a_empty"]["mean_b"] is not None
    assert out["q_both"]["mean_a"] is None


# ---------------------------------------------------------------------------
# filters_agg: other bucket counts live zero-token docs
# ---------------------------------------------------------------------------

def test_filters_other_bucket_counts_zero_token_docs(spark, tmp_path):
    from engine.index_build import build_index
    from engine.search import Index, filters_agg

    rows = [("r", f"p{i}", "c", "py", "alpha beta gamma") for i in range(3)]
    rows += [("r", f"q{i}", "c", "py", "delta epsilon") for i in range(2)]
    rows += [("r", "empty", "c", "py", "")]          # zero tokens: no dl row
    corpus = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, "
              "content string")
    path = str(tmp_path / "zt_idx")
    build_index(spark, corpus, path, n_buckets=2, n_doc_buckets=2)
    idx = Index(spark, path)
    assert idx.docs.count() == 6        # the empty doc IS in the corpus

    out = {r["key"]: (r["n_docs"], r["avg_dl"])
           for r in filters_agg(idx, [("a", ["alpha"])],
                                other_bucket=True).collect()}
    assert out["a"] == (3, 3.0)
    # other = 2 delta/epsilon docs (dl=2) + the zero-token doc (dl 0)
    assert out["_other_"] == (3, _r(4 / 3.0, 6))


# ---------------------------------------------------------------------------
# script_score: NULL script values rank last and fail min_score
# ---------------------------------------------------------------------------

def test_script_score_null_ranks_last_and_min_score_excludes(
        spark, tiny_index):
    from engine.search import score_exhaustive, script_score_topk

    term = _common_term(tiny_index)
    qt = [("q1", term, 1.0)]
    base = score_exhaustive(tiny_index, qt, None)
    n_match = base.count()
    docs = [r["doc_id"] for r in base.orderBy("doc_id").collect()]
    cut = docs[len(docs) // 2]
    script = f"case when doc_id <= {cut} then s + 1.0 end"  # NULL above cut

    out = script_score_topk(tiny_index, qt, k=n_match,
                            script_sql=script).collect()
    scored = [r for r in out if r["score"] is not None]
    nulls = [r for r in out if r["score"] is None]
    assert scored and nulls, "fixture: need both branches"
    assert max(r["rank"] for r in scored) < min(r["rank"] for r in nulls)
    assert {r["doc_id"] for r in nulls} == {d for d in docs if d > cut}
    # NULL fails any min_score gate (SQL comparison semantics)
    gated = script_score_topk(tiny_index, qt, k=n_match,
                              script_sql=script, min_score=0.0).collect()
    assert {r["doc_id"] for r in gated} == {d for d in docs if d <= cut}


# ---------------------------------------------------------------------------
# moving percentiles: fractional percents get distinct labels
# ---------------------------------------------------------------------------

def test_moving_percentiles_fractional_labels(spark):
    base = dt.datetime(2026, 1, 1)
    ev = spark.createDataFrame(
        [(base + dt.timedelta(hours=h, minutes=i), "click", 1.0, 1)
         for h, n in enumerate([1, 2, 3, 4]) for i in range(n)],
        "ts timestamp, event_type string, value double, user_id long")
    out = streaming.windowed_moving_percentiles(
        ev, mov_window=3, percents=(99.0, 99.9))
    cols = [f.name for f in out.schema.fields]
    assert "p99_n" in cols and "p99_9_n" in cols
    last = out.orderBy("window_start").collect()[-1]
    # window [1,2,3]: type-7 h=(m-1)p -> p99: 2.98, p99.9: 2.998
    assert last["p99_n"] == _r(1 + 2 * 0.99, 6)
    assert last["p99_9_n"] == _r(1 + 2 * 0.999, 6)


# ---------------------------------------------------------------------------
# range_agg caller contracts
# ---------------------------------------------------------------------------

def test_range_agg_rejects_empty_and_takes_int_bounds(spark):
    df = spark.createDataFrame([(5.0,), (15.0,)], "x double")
    with pytest.raises(ValueError):
        streaming.range_agg(df, "x", [])
    out = [(r["key"], r["n"], r["range_from"], r["range_to"])
           for r in streaming.range_agg(
               df, "x", [("a", 0, 10), ("b", 10, None)]).collect()]
    assert out == [("a", 1, 0.0, 10.0), ("b", 1, 10.0, None)]
