"""ES 8 ML-agg family (random_sampler / bucket_correlation /
change_point): synthetic series where each operator's distinguishing
branch genuinely bites — a step the detector must locate, a ramp the
correlation must score 1.0, constant series that must yield NULL —
plus the deterministic-sample contracts."""

import math

import pytest
from pyspark.sql import functions as F

from engine.pipeline.curation import SAMPLER_MIX, random_sampler_agg
from engine.streaming import bucket_correlation, change_point_agg


def _events(spark, counts_by_type):
    """One event per (type, hour-slot) unit: counts_by_type maps
    event_type -> list of per-hour counts (hour i gets counts[i]
    events)."""
    rows = []
    eid = 0
    for et, counts in counts_by_type.items():
        for hour, c in enumerate(counts):
            for _ in range(c):
                rows.append((eid, et, hour * 3600, 1.0))
                eid += 1
    return (spark.createDataFrame(
        rows, "event_id long, event_type string, sec long, value double")
        .withColumn("ts", F.timestamp_seconds(F.col("sec")))
        .drop("sec"))


# ---------------------------------------------------------------------------
# random_sampler
# ---------------------------------------------------------------------------

def test_random_sampler_gate_and_scaling(spark):
    ev = _events(spark, {"a": [40] * 5, "b": [10] * 4})
    p = 0.35
    out = {r["event_type"]: r
           for r in random_sampler_agg(ev, p).collect()}
    lim = int(p * 4294967296)
    rows = ev.select("event_id", "event_type").collect()
    for et in ("a", "b"):
        want = [r for r in rows if r["event_type"] == et
                and (r["event_id"] * SAMPLER_MIX) % 4294967296 < lim]
        got = out[et]
        assert got["n_sampled"] == len(want)
        assert got["n_est"] == math.floor(len(want) / p + 0.5)
        assert got["avg_value"] == pytest.approx(1.0)
    # the gate is a real subset (both include and exclude bite)
    n_total = len(rows)
    n_kept = sum(out[et]["n_sampled"] for et in out)
    assert 0 < n_kept < n_total


def test_random_sampler_probability_contract(spark):
    ev = _events(spark, {"a": [3]})
    for bad in (0.0, 0.7, 1.2, -0.1):
        with pytest.raises(ValueError):
            random_sampler_agg(ev, bad)
    random_sampler_agg(ev, 1.0)          # exactly 1 is allowed
    random_sampler_agg(ev, 0.5)


# ---------------------------------------------------------------------------
# bucket_correlation
# ---------------------------------------------------------------------------

def test_bucket_correlation_ramp_flat_and_inverse(spark):
    ev = _events(spark, {
        "up": [1, 2, 3, 4, 5],          # perfect positive trend
        "down": [5, 4, 3, 2, 1],        # perfect negative trend
        "flat": [3, 3, 3, 3],           # zero variance -> NULL
        "one": [7],                     # single bucket -> NULL
    })
    out = {r["event_type"]: r for r in bucket_correlation(ev).collect()}
    assert out["up"]["r"] == pytest.approx(1.0)
    assert out["down"]["r"] == pytest.approx(-1.0)
    assert out["flat"]["r"] is None
    assert out["one"]["r"] is None
    assert out["up"]["k"] == 5 and out["one"]["k"] == 1


def test_bucket_correlation_matches_python_pearson(spark):
    counts = [4, 1, 6, 2, 9, 3, 5]
    ev = _events(spark, {"s": counts})
    got = bucket_correlation(ev).collect()[0]["r"]
    k = len(counts)
    t = list(range(k))
    sn, st = sum(counts), sum(t)
    snt = sum(a * b for a, b in zip(counts, t))
    snn = sum(a * a for a in counts)
    stt = sum(b * b for b in t)
    want = ((k * snt - sn * st)
            / math.sqrt((k * snn - sn * sn) * (k * stt - st * st)))
    want = math.floor(want * 1e6 + 0.5) / 1e6
    assert got == pytest.approx(want, abs=1e-9)


# ---------------------------------------------------------------------------
# change_point
# ---------------------------------------------------------------------------

def test_change_point_finds_the_step(spark):
    # 6 low buckets then 6 high buckets: the detector must split
    # exactly at k=6 and report the two level means
    ev = _events(spark, {"s": [2] * 6 + [10] * 6})
    row = change_point_agg(ev).collect()[0]
    assert row["split_after"] == 6
    assert row["mean_before"] == pytest.approx(2.0)
    assert row["mean_after"] == pytest.approx(10.0)
    assert row["type"] == "step_change"
    # score = num^2/(B k (B-k)) with num = 6*6*(2-10) = -288
    assert row["score"] == pytest.approx(288 ** 2 / (12 * 6 * 6))


def test_change_point_edge_series(spark):
    ev = _events(spark, {"one": [5], "two": [3, 9]})
    out = {r["event_type"]: r for r in change_point_agg(ev).collect()}
    assert "one" not in out                  # no split exists
    assert out["two"]["split_after"] == 1    # the only candidate
    assert out["two"]["mean_before"] == pytest.approx(3.0)
    assert out["two"]["mean_after"] == pytest.approx(9.0)


def test_change_point_tie_breaks_earliest(spark):
    # symmetric series: splits k and B-k score identically; the
    # contract picks the EARLIEST k
    ev = _events(spark, {"s": [8, 1, 1, 8]})
    row = change_point_agg(ev).collect()[0]
    scores = {}
    counts = [8, 1, 1, 8]
    B, S = 4, sum(counts)
    for k in range(1, 4):
        sk = sum(counts[:k])
        num = sk * (B - k) - (S - sk) * k
        scores[k] = math.floor(num * num / (B * k * (B - k)) * 1e6
                               + 0.5) / 1e6
    best = max(scores.values())
    assert scores[1] == scores[3] == best     # a genuine tie
    assert row["split_after"] == 1
