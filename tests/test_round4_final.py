"""Round-4 final engine wave: t_test agg plus the remaining ES
pipeline-agg family (bucket_script/bucket_selector/bucket_sort,
normalize, cumulative_cardinality, top_metrics) — python replicas on
the shared tiny index / synthetic events, the pinned ES contracts
(selector-before-sort phase order, per-method normalize formulas with
the NULL degenerate rendering, the HLL prefix identity), and the
documented edge cases. These are engine-complete ahead of their
queries() window slots (the 50-slot driver window is at capacity with
never-checked entries — tools/check_rotation.py; entries queue for
the r5 rotation, noted in COVERAGE.md)."""

import collections
import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from engine import streaming


def _r(x, p):
    return math.floor(x * 10 ** p + 0.5) / 10 ** p


# ---------------------------------------------------------------------------
# t_test_agg
# ---------------------------------------------------------------------------

def _two_terms(tiny_index):
    rows = (tiny_index.termstats.orderBy(F.desc("df"), "term")
            .limit(2).collect())
    return [r["term"] for r in rows]


def test_t_test_matches_python_replica(spark, tiny_index):
    from engine.search import t_test_agg

    ta, tb = _two_terms(tiny_index)
    pairs = [("q1", [ta], [tb]), ("q2", [tb], [ta])]
    # ground truth from the forward tables
    from engine.analysis import tokenize_texts
    rows = tiny_index.docs.select("doc_id", "content").collect()
    toks = tokenize_texts([r["content"] for r in rows])
    dl = {r["doc_id"]: len(t) for r, t in zip(rows, toks)}
    members = {r["doc_id"]: set(t) for r, t in zip(rows, toks)}

    def moments(term):
        xs = [dl[d] for d, s in members.items() if term in s]
        n = len(xs)
        m = sum(xs) / n
        var = (n * sum(x * x for x in xs) - sum(xs) ** 2) / (n * (n - 1.0))
        return n, m, var

    got = {r["qid"]: r.asDict()
           for r in t_test_agg(tiny_index, pairs).collect()}
    for qid, terms_a, terms_b in pairs:
        na, ma, va = moments(terms_a[0])
        nb, mb, vb = moments(terms_b[0])
        assert na >= 2 and nb >= 2  # fixture sanity: stats defined
        se2 = va / na + vb / nb
        t_w = (ma - mb) / math.sqrt(se2)
        df_w = se2 ** 2 / ((va / na) ** 2 / (na - 1)
                           + (vb / nb) ** 2 / (nb - 1))
        sp2 = ((na - 1) * va + (nb - 1) * vb) / (na + nb - 2)
        t_p = (ma - mb) / math.sqrt(sp2 * (1 / na + 1 / nb))
        g = got[qid]
        assert (g["n_a"], g["n_b"]) == (na, nb)
        assert g["mean_a"] == _r(ma, 6) and g["mean_b"] == _r(mb, 6)
        assert g["t_welch"] == pytest.approx(_r(t_w, 6), abs=2e-6)
        assert g["df_welch"] == pytest.approx(_r(df_w, 6), abs=2e-6)
        assert g["t_pooled"] == pytest.approx(_r(t_p, 6), abs=2e-6)
        # the two opposite-direction pairs are sign mirrors
    assert got["q1"]["t_welch"] == pytest.approx(
        -got["q2"]["t_welch"], abs=2e-6)


def test_t_test_small_side_yields_null(spark, tiny_index):
    """n < 2 on a side leaves the variance (hence every t statistic)
    NULL — the relational rendering of ES's NaN, per the docstring."""
    from engine.search import t_test_agg

    ta, _ = _two_terms(tiny_index)
    # a term that matches exactly ONE doc: take the rarest df=1 term
    rare = (tiny_index.termstats.where(F.col("df") == 1)
            .orderBy("term").limit(1).collect())
    if not rare:
        pytest.skip("fixture has no df=1 term")
    out = t_test_agg(tiny_index,
                     [("q1", [ta], [rare[0]["term"]])]).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_b"] == 1
    assert r["t_welch"] is None
    assert r["df_welch"] is None
    assert r["t_pooled"] is None
    assert r["mean_b"] is not None  # the mean itself is defined


# ---------------------------------------------------------------------------
# pipeline aggs over synthetic events
# ---------------------------------------------------------------------------

def _mk_events(spark):
    base = dt.datetime(2026, 1, 1, 0, 0, 0)
    # click: hourly buckets n = 1,2,3,4,5 with value = 10*n per event;
    # view: two buckets n = 2,1
    rows = []
    for h, n in enumerate([1, 2, 3, 4, 5]):
        for i in range(n):
            rows.append((base + dt.timedelta(hours=h, minutes=i),
                         "click", float(10 * n), 100 + h))
    rows += [(base, "view", 1.0, 200),
             (base + dt.timedelta(minutes=1), "view", 3.0, 201),
             (base + dt.timedelta(hours=3), "view", 5.0, 200)]
    return spark.createDataFrame(
        rows, "ts timestamp, event_type string, value double, "
              "user_id long")


def test_bucket_script_selector_sort(spark):
    ev = _mk_events(spark)
    # no selector/sort: per_event = total_value / n
    out = {(r["event_type"], r["n"]): (r["per_event"], r["pos"])
           for r in streaming.windowed_bucket_script(ev).collect()}
    # click bucket h: n events of value 10*n -> per_event = 10*n
    for n in (1, 2, 3, 4, 5):
        per, pos = out[("click", n)]
        assert per == float(10 * n)
        assert pos == 6 - n          # sorted n desc
    assert out[("view", 2)] == (2.0, 1)   # (1.0 + 3.0)/2
    assert out[("view", 1)] == (5.0, 2)

    # selector (min_n=2) drops n<2 buckets BEFORE sort; size=2 keeps
    # the filtered top-2 per series
    kept = [(r["event_type"], r["n"], r["pos"])
            for r in streaming.windowed_bucket_script(
                ev, min_n=2, size=2).collect()]
    assert kept == [("click", 5, 1), ("click", 4, 2), ("view", 2, 1)]


def test_normalize_methods_match_replica(spark):
    ev = _mk_events(spark)
    series = {"click": [1, 2, 3, 4, 5], "view": [2, 1]}

    def replica(method, xs):
        s, mn, mx = sum(xs), min(xs), max(xs)
        mean = s / len(xs)
        rng = mx - mn
        if method == "percent_of_sum":
            return [x / s for x in xs]
        if rng == 0:
            return [None] * len(xs)
        if method == "rescale_0_1":
            return [(x - mn) / rng for x in xs]
        if method == "rescale_0_100":
            return [100.0 * (x - mn) / rng for x in xs]
        if method == "mean":
            return [(x - mean) / rng for x in xs]
        var = sum((x - mean) ** 2 for x in xs) / len(xs)
        if var == 0:
            return [None] * len(xs)
        return [(x - mean) / math.sqrt(var) for x in xs]

    for method in ("percent_of_sum", "rescale_0_1", "rescale_0_100",
                   "mean", "z_score"):
        got = collections.defaultdict(list)
        for r in streaming.windowed_normalize(ev, method=method).collect():
            got[r["event_type"]].append(r["normalized"])
        for et, xs in series.items():
            exp = [None if e is None else _r(e, 6)
                   for e in replica(method, xs)]
            assert got[et] == pytest.approx(exp, abs=2e-6), (method, et)
    with pytest.raises(ValueError, match="softmax|unknown"):
        streaming.windowed_normalize(ev, method="softmax")


def test_normalize_degenerate_series_is_null(spark):
    base = dt.datetime(2026, 1, 1)
    ev = spark.createDataFrame(
        [(base, "flat", 1.0, 1),
         (base + dt.timedelta(hours=1), "flat", 1.0, 2)],
        "ts timestamp, event_type string, value double, user_id long")
    for method in ("rescale_0_1", "mean", "z_score"):
        vals = [r["normalized"] for r in
                streaming.windowed_normalize(ev, method=method).collect()]
        assert vals == [None, None], method
    # percent_of_sum has no degenerate case: 1/2 each
    vals = [r["normalized"] for r in
            streaming.windowed_normalize(ev).collect()]
    assert vals == [0.5, 0.5]


def test_cumulative_cardinality_prefix_identity(spark):
    """est(w) must equal the engine's own HLL estimate over the event
    PREFIX up to w's end — register-exact, not approximately."""
    from engine.sketches import hll_cardinality

    ev = _mk_events(spark)
    out = streaming.windowed_cumulative_cardinality(ev).collect()
    assert len(out) == 5
    ests = [r["est"] for r in out]
    assert ests == sorted(ests)          # cumulative => monotone
    for r in out:
        end = r["window_start"] + dt.timedelta(hours=1)
        prefix = ev.where(F.col("ts") < F.lit(end))
        exp = hll_cardinality(prefix.withColumn("g", F.lit(1)),
                              ["g"], "user_id").collect()[0]
        assert (r["v_zero"], r["est"]) == (exp["v_zero"], exp["est"])
    # sanity: distinct users are few, so the small-range (linear
    # counting) estimate is exact here
    n_users = ev.select("user_id").distinct().count()
    assert ests[-1] == pytest.approx(n_users, abs=0.01)


def test_top_metrics_latest_per_bucket(spark):
    ev = _mk_events(spark)
    out = [(r["event_type"], r["window_start"].hour, r["pos"],
            r["ts"].minute, r["value"])
           for r in streaming.windowed_top_metrics(ev, size=2).collect()
           if r["event_type"] == "click"]
    # per click bucket h (n events at minutes 0..n-1), top-2 by ts
    # desc = minutes n-1, n-2 (hour 0 has a single event)
    exp = []
    for h, n in enumerate([1, 2, 3, 4, 5]):
        exp.append(("click", h, 1, n - 1, float(10 * n)))
        if n > 1:
            exp.append(("click", h, 2, n - 2, float(10 * n)))
    assert out == exp


# ---------------------------------------------------------------------------
# second mini-wave: auto_date_histogram, range agg, filters agg
# ---------------------------------------------------------------------------

def test_auto_histogram_picks_ladder_interval(spark):
    ev = _mk_events(spark)          # 5 hours of click + view events
    # target 10 buckets over a ~4h span: 30 minutes gives <= 10
    out = streaming.windowed_auto_histogram(ev, target_buckets=10)
    rows = out.collect()
    assert {r["interval"] for r in rows} == {"30 minutes"}
    assert len(rows) <= 10
    assert sum(r["n"] for r in rows) == 18      # every event counted
    # a tight target forces a coarser rung
    coarse = streaming.windowed_auto_histogram(ev, target_buckets=2)
    assert {r["interval"] for r in coarse.collect()} == {"3 hours"}
    # monotone window starts
    starts = [r["window_start"] for r in rows]
    assert starts == sorted(starts)


def test_auto_histogram_bound_is_exact_not_occupied(spark):
    """The ladder choice bounds the worst-case EPOCH-ALIGNED bucket
    count, so even adversarial span placement never overshoots."""
    import datetime as dt
    base = dt.datetime(2026, 1, 1, 0, 59, 0)   # straddles hour edges
    ev = spark.createDataFrame(
        [(base + dt.timedelta(minutes=7 * i), "e", 1.0, i)
         for i in range(40)],
        "ts timestamp, event_type string, value double, user_id long")
    for target in (3, 5, 10, 20):
        rows = streaming.windowed_auto_histogram(ev, target).collect()
        assert 0 < len(rows) <= target, (target, len(rows))


def test_auto_histogram_empty_input(spark):
    ev = spark.createDataFrame(
        [], "ts timestamp, event_type string, value double, user_id long")
    out = streaming.windowed_auto_histogram(ev)
    assert out.collect() == []
    assert [f.name for f in out.schema.fields] == [
        "window_start", "interval", "n"]


def test_range_agg_bounds_and_overlap(spark):
    ev = _mk_events(spark)          # click values 10,20,30,40,50; view 1,3,5
    ranges = [("low", None, 10.0),         # to EXCLUSIVE: 1,3,5
              ("mid", 10.0, 40.0),         # from INCLUSIVE: 10,20,30 buckets
              ("high", 40.0, None),
              ("all", None, None),         # overlapping bucket
              ("empty", 1000.0, 2000.0)]
    out = [(r["key"], r["n"]) for r in
           streaming.range_agg(ev, "value", ranges).collect()]
    vals = [float(10 * n) for n in (1, 2, 3, 4, 5) for _ in range(n)] + \
           [1.0, 3.0, 5.0]
    exp = [("low", sum(1 for v in vals if v < 10)),
           ("mid", sum(1 for v in vals if 10 <= v < 40)),
           ("high", sum(1 for v in vals if v >= 40)),
           ("all", len(vals)),
           ("empty", 0)]
    assert out == exp               # given order preserved, not sorted


def test_range_agg_null_values_drop(spark):
    df = spark.createDataFrame([(1.0,), (None,), (2.0,)], "x double")
    out = {r["key"]: r["n"]
           for r in streaming.range_agg(df, "x",
                                        [("a", None, None)]).collect()}
    assert out == {"a": 2}


def test_filters_agg_overlap_other_and_order(spark, tiny_index):
    from engine.analysis import tokenize_texts
    from engine.search import filters_agg

    ta, tb = _two_terms(tiny_index)
    rows = tiny_index.docs.select("doc_id", "content").collect()
    toks = tokenize_texts([r["content"] for r in rows])
    dl = {r["doc_id"]: len(t) for r, t in zip(rows, toks)}
    members = {r["doc_id"]: set(t) for r, t in zip(rows, toks)}

    def bucket(term):
        ds = [d for d, s in members.items() if term in s]
        return len(ds), _r(sum(dl[d] for d in ds) / len(ds), 6)

    filters = [("zz_a", [ta]), ("aa_both", [ta, tb])]  # keys NOT sorted
    got = [(r["key"], r["n_docs"], r["avg_dl"])
           for r in filters_agg(tiny_index, filters,
                                other_bucket=True).collect()]
    na, aa = bucket(ta)
    both_ds = [d for d, s in members.items() if ta in s or tb in s]
    nb = len(both_ds)
    ab = _r(sum(dl[d] for d in both_ds) / nb, 6)
    other_ds = [d for d in members if d not in set(both_ds)]
    # zz_a ⊆ aa_both: overlapping buckets both count the shared docs;
    # given order preserved with _other_ last
    assert got[0] == ("zz_a", na, aa)
    assert got[1] == ("aa_both", nb, ab)
    assert got[2][0] == "_other_" and got[2][1] == len(other_ds)
    if other_ds:
        assert got[2][2] == _r(
            sum(dl[d] for d in other_ds) / len(other_ds), 6)
    assert na + nb > len(set(both_ds))     # overlap genuinely bites


def test_filters_agg_empty_bucket_and_key_collision(spark, tiny_index):
    from engine.search import filters_agg

    ta, _ = _two_terms(tiny_index)
    out = filters_agg(tiny_index,
                      [("hit", [ta]), ("miss", ["zzzznotaterm"])]).collect()
    assert [r["key"] for r in out] == ["hit", "miss"]
    assert out[1]["n_docs"] == 0 and out[1]["avg_dl"] is None
    with pytest.raises(ValueError, match="collides"):
        filters_agg(tiny_index, [("_other_", [ta])], other_bucket=True)
    with pytest.raises(ValueError, match="duplicate"):
        filters_agg(tiny_index, [("a", [ta]), ("a", [ta])])
