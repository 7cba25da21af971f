"""ES join-field family (engine/joinfield.py): has_child score modes
and gates, has_parent propagation, children agg — against in-test
python references."""

import math

import pytest
from pyspark.sql import functions as F

from engine.joinfield import children_agg, has_child, has_parent

PARENTS = [(1, "A", 10.0), (2, "A", -5.0), (3, "B", 7.5), (4, "B", 0.0)]
# (child_id, parent_id, value, flag)
CHILDREN = [
    (10, 1, 100.25, True), (11, 1, 50.5, True), (12, 1, 10.0, False),
    (20, 2, 30.75, True),
    (30, 3, 200.0, True), (31, 3, 99.99, True), (32, 3, 1.01, True),
    # parent 4 has only non-matching children
    (40, 4, 500.0, False),
]


def _dfs(spark):
    p = spark.createDataFrame(PARENTS, "pid long, seg string, bal double")
    c = spark.createDataFrame(
        CHILDREN, "cid long, cpid long, value double, flag boolean")
    return p, c


def _mu(col):
    return F.floor(col * F.lit(1e6) + F.lit(0.5))


def test_has_child_score_modes(spark):
    p, c = _dfs(spark)
    match = {1: [100.25, 50.5], 2: [30.75], 3: [200.0, 99.99, 1.01]}
    for mode, fold in [("sum", sum), ("max", max), ("min", min),
                       ("avg", lambda v: sum(v) / len(v))]:
        out = {r["pid"]: (r["n_children"], r["score"]) for r in
               has_child(p, c, "pid", "cpid", F.col("flag"),
                         _mu(F.col("value")), score_mode=mode,
                         k=10).collect()}
        for pid, vals in match.items():
            n, s = out[pid]
            assert n == len(vals)
            mu = [math.floor(v * 1e6 + 0.5) for v in vals]
            want_mu = (sum(mu) if fold is sum else
                       max(mu) if fold is max else
                       min(mu) if fold is min else sum(mu) / len(mu))
            want = math.floor(want_mu / 1e6 * 100 + 0.5) / 100
            assert s == pytest.approx(want, abs=1e-9), (mode, pid)
        assert 4 not in out                 # no matching children


def test_has_child_gates_and_rank(spark):
    p, c = _dfs(spark)
    out = has_child(p, c, "pid", "cpid", F.col("flag"),
                    _mu(F.col("value")), score_mode="sum",
                    min_children=2, k=10).orderBy("rank").collect()
    assert [r["pid"] for r in out] == [3, 1]    # 301.0 > 150.75
    assert [r["rank"] for r in out] == [1, 2]
    capped = has_child(p, c, "pid", "cpid", F.col("flag"),
                       _mu(F.col("value")), score_mode="sum",
                       min_children=2, max_children=2, k=10).collect()
    assert [r["pid"] for r in capped] == [1]    # parent 3 exceeds cap
    none_mode = has_child(p, c, "pid", "cpid", F.col("flag"),
                          _mu(F.col("value")), score_mode="none",
                          k=2).orderBy("rank").collect()
    assert [(r["pid"], r["score"]) for r in none_mode] == \
        [(1, 0.0), (2, 0.0)]                    # key order + k cut


def test_has_parent_propagates_score(spark):
    p, c = _dfs(spark)
    out = has_parent(c, p, "pid", "cpid",
                     (F.col("seg") == "A") & (F.col("bal") > 0),
                     F.col("bal")).collect()
    # only parent 1 matches (parent 2 has bal < 0)
    assert sorted(r["cid"] for r in out) == [10, 11, 12]
    assert all(r["parent_score"] == 10.0 for r in out)


def test_children_agg_matches_python(spark):
    p, c = _dfs(spark)
    out = {r["seg"]: r for r in
           children_agg(p, c, "pid", "cpid", "seg",
                        _mu(F.col("value"))).collect()}
    for seg in ("A", "B"):
        pids = [pid for pid, s, _ in PARENTS if s == seg]
        vals = [v for _, cp, v, _ in CHILDREN if cp in pids]
        mu = sum(math.floor(v * 1e6 + 0.5) for v in vals)
        assert out[seg]["n_children"] == len(vals)
        assert out[seg]["sum_value"] == pytest.approx(
            math.floor(mu / 1e6 * 100 + 0.5) / 100, abs=1e-9)
        assert out[seg]["avg_value"] == pytest.approx(
            math.floor(mu / len(vals) / 1e6 * 100 + 0.5) / 100,
            abs=1e-9)
