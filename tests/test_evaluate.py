"""Evaluator vs hand-computed AP / P@20 / nDCG@20, including the
reference quirks (SURVEY.md §2.7 E1-E4; tools/evaluate.py:43-95)."""

import math

import pytest

from engine.evaluate import evaluate_run, macro_metrics


def test_hand_computed_metrics(spark):
    # topic t1: retrieved [d1,d2,d3,d4], relevant {d1,d3,d9}
    run = spark.createDataFrame(
        [("t1", f"d{i}", i) for i in (1, 2, 3, 4)],
        "qid string, docno string, rank int")
    qrels = spark.createDataFrame(
        [("t1", "d1", 1), ("t1", "d3", 1), ("t1", "d9", 1), ("t1", "d2", 0)],
        "qid string, docno string, rel int")
    per = {r["qid"]: r for r in evaluate_run(run, qrels, k=20).collect()}
    # AP = (1/1 + 2/3) / 3
    assert per["t1"]["ap"] == pytest.approx((1 + 2 / 3) / 3)
    # P@20 = 2/20
    assert per["t1"]["p_at_k"] == pytest.approx(2 / 20)
    # DCG = 1 (rank1) + 1/log2(3); ideal = 1 + 1/log2(2) + 1/log2(3)
    dcg = 1 + 1 / math.log2(3)
    idcg = 1 + 1 / math.log2(2) + 1 / math.log2(3)
    assert per["t1"]["ndcg_at_k"] == pytest.approx(dcg / idcg)


def test_missing_topic_scores_zero(spark):
    run = spark.createDataFrame([("t1", "d1", 1)],
                                "qid string, docno string, rank int")
    qrels = spark.createDataFrame(
        [("t1", "d1", 1), ("t2", "d5", 1)],
        "qid string, docno string, rel int")
    m = macro_metrics(run, qrels, k=20)
    # t1 perfect (AP=1, nDCG=1, P@20=1/20), t2 all-zero; macro over 2
    assert m["MAP"] == pytest.approx(0.5)
    assert m["nDCG@20"] == pytest.approx(0.5)
    assert m["P@20"] == pytest.approx((1 / 20) / 2)


def test_rank1_discount_quirk(spark):
    # relevant only at rank 2: DCG = 1/log2(2) = 1; ideal (1 rel) = 1
    run = spark.createDataFrame([("t", "a", 1), ("t", "b", 2)],
                                "qid string, docno string, rank int")
    qrels = spark.createDataFrame([("t", "b", 1)],
                                  "qid string, docno string, rel int")
    per = evaluate_run(run, qrels, k=20).collect()[0]
    assert per["ndcg_at_k"] == pytest.approx(1.0)


def test_p_at_5_extra_cutoff(spark):
    """The reference leaderboard submits MAP/P@5/P@20/nDCG@20
    (evaluation.yml:83): p_at_ks adds the extra precision cutoffs."""
    # relevant at ranks 1, 4, 7 → P@5 = 2/5, P@20 = 3/20
    run = spark.createDataFrame(
        [("t1", f"d{i}", i) for i in range(1, 11)],
        "qid string, docno string, rank int")
    qrels = spark.createDataFrame(
        [("t1", "d1", 1), ("t1", "d4", 1), ("t1", "d7", 1)],
        "qid string, docno string, rel int")
    per = evaluate_run(run, qrels, k=20, p_at_ks=(5,)).collect()[0]
    assert per["p_at_5"] == pytest.approx(2 / 5)
    assert per["p_at_k"] == pytest.approx(3 / 20)
    m = macro_metrics(run, qrels, k=20, p_at_ks=(5,))
    assert m["P@5"] == pytest.approx(2 / 5)
    assert m["P@20"] == pytest.approx(3 / 20)
    # a topic with no run rows scores 0 for the extra cutoff too
    qrels2 = qrels.union(spark.createDataFrame(
        [("t2", "d1", 1)], "qid string, docno string, rel int"))
    per2 = {r["qid"]: r for r in
            evaluate_run(run, qrels2, k=20, p_at_ks=(5,)).collect()}
    assert per2["t2"]["p_at_5"] == 0.0
