"""Wave-4 operators: ExactSubstr span dedup, Count-Min sketch,
Johnson-Lindenstrauss random projection."""

import math

import pytest
from pyspark.sql import functions as F

from engine.pipeline.curation import exact_substring_dedup
from engine.pipeline.similarity import rp_project, rp_signs
from engine import sketches


SPAN = "alpha bravo charlie delta echo foxtrot golf hotel india juliett"


def _dedup(spark, rows, n=10):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = exact_substring_dedup(df, n=n)
    return {r["doc_id"]: r for r in out.collect()}


class TestExactSubstringDedup:
    def test_owner_keeps_loser_loses_span(self, spark):
        rows = [
            (1, SPAN + " kilo lima"),
            (2, "xray yankee " + SPAN + " zulu"),
        ]
        got = _dedup(spark, rows)
        # doc 1 is the lowest-id owner of the shared window: untouched
        assert got[1]["n_removed"] == 0
        assert got[1]["cleaned_text"] == SPAN + " kilo lima"
        # doc 2 loses exactly the 10 shared positions, unique text stays
        assert got[2]["n_tokens"] == 13
        assert got[2]["n_removed"] == 10
        assert got[2]["cleaned_text"] == "xray yankee zulu"

    def test_overlapping_windows_merge(self, spark):
        # an 11-token shared span = two overlapping 10-token windows;
        # the interval union must remove 11 tokens, not 20
        span11 = SPAN + " kilo"
        rows = [(1, span11), (2, "pre " + span11 + " post")]
        got = _dedup(spark, rows)
        assert got[2]["n_removed"] == 11
        assert got[2]["cleaned_text"] == "pre post"

    def test_short_doc_untouched_and_full_removal_is_null(self, spark):
        rows = [(1, SPAN), (2, SPAN), (3, "tiny doc")]
        got = _dedup(spark, rows)
        assert got[1]["cleaned_text"] == SPAN          # owner keeps
        assert got[2]["cleaned_text"] is None          # fully excised
        assert got[2]["n_removed"] == 10
        assert got[3] ["n_removed"] == 0               # < n tokens
        assert got[3]["cleaned_text"] == "tiny doc"

    def test_within_doc_repeat_kept_by_owner(self, spark):
        # the owner doc keeps ALL its copies (documented divergence
        # from the suffix-array method)
        rows = [(1, SPAN + " and " + SPAN), (2, SPAN + " tail")]
        got = _dedup(spark, rows)
        assert got[1]["n_removed"] == 0
        assert got[1]["cleaned_text"].count("alpha") == 2
        assert got[2]["cleaned_text"] == "tail"


class TestCountMinSketch:
    def test_matches_python_replica_and_one_sided(self, spark):
        words = (["the"] * 50 + ["cat"] * 20 + ["sat"] * 5 +
                 [f"w{i}" for i in range(200)])
        df = spark.createDataFrame([(w,) for w in words], ["term"])
        regs = sketches.cms_registers(df, [], "term")
        qterms = ["the", "cat", "sat", "w0", "absent"]
        qdf = spark.createDataFrame([(t,) for t in qterms], ["term"])
        got = {r["term"]: r["est"]
               for r in sketches.cms_lookup(regs, qdf, [],
                                            "term").collect()}
        want = sketches.cms_estimate_py(words, qterms)
        assert got == want
        truth = {"the": 50, "cat": 20, "sat": 5, "w0": 1, "absent": 0}
        for t, c in truth.items():
            assert got[t] >= c  # CMS never under-estimates

    def test_registers_bounded_and_mergeable(self, spark):
        words = [f"w{i % 37}" for i in range(500)]
        df = spark.createDataFrame([(w,) for w in words], ["term"])
        regs = sketches.cms_registers(df, [], "term").collect()
        assert len(regs) <= sketches.CMS_DEPTH * sketches.CMS_WIDTH
        assert all(0 <= r["row"] < sketches.CMS_DEPTH and
                   0 <= r["col"] < sketches.CMS_WIDTH for r in regs)
        # merge = register-wise add: sketch(halves) == sketch(whole)
        h1 = spark.createDataFrame([(w,) for w in words[:250]], ["term"])
        h2 = spark.createDataFrame([(w,) for w in words[250:]], ["term"])
        merged = (sketches.cms_registers(h1, [], "term")
                  .unionByName(sketches.cms_registers(h2, [], "term"))
                  .groupBy("row", "col").agg(F.sum("cnt").alias("cnt"))
                  .collect())
        assert sorted(map(tuple, merged)) == sorted(map(tuple, regs))


class TestRandomProjection:
    def _vecs(self, rng, n, d):
        return [[float(x) for x in rng.standard_normal(d)]
                for _ in range(n)]

    def test_matches_numpy_replica(self, spark):
        import numpy as np

        rng = np.random.default_rng(7)
        vecs = self._vecs(rng, 3, 64)
        df = spark.createDataFrame(
            [(i, [float(np.float32(x)) for x in v])
             for i, v in enumerate(vecs)], ["vec_id", "embedding"])
        out = rp_project(df, d_in=64, d_out=16)
        got = {(r["id"], r["dim"]): r["val"] for r in out.collect()}
        signs = rp_signs(64, 16)
        for i, v in enumerate(vecs):
            v32 = [float(np.float32(x)) for x in v]
            for j in range(16):
                acc = 0.0
                for x, s in zip(v32, signs[j]):
                    acc += x * float(s)
                want = math.floor(acc * 0.25 * 1e6 + 0.5) / 1e6
                assert got[(i, j)] == pytest.approx(want, abs=1e-12)

    def test_jl_distance_preservation(self, spark):
        import numpy as np

        rng = np.random.default_rng(11)
        vecs = np.asarray(self._vecs(rng, 40, 64))
        df = spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
            ["vec_id", "embedding"])
        rows = rp_project(df, d_in=64, d_out=16).collect()
        proj = np.zeros((40, 16))
        for r in rows:
            proj[r["id"], r["dim"]] = r["val"]
        # JL with d_out=16: distances preserved in expectation — check
        # the distortion distribution, not a per-pair bound
        ratios = []
        for a in range(0, 40, 3):
            for b in range(a + 1, 40, 7):
                d0 = np.linalg.norm(vecs[a] - vecs[b])
                d1 = np.linalg.norm(proj[a] - proj[b])
                ratios.append(d1 / d0)
        ratios = np.asarray(ratios)
        assert abs(float(ratios.mean()) - 1.0) < 0.15
        assert float(ratios.std()) < 0.35

    def test_rejects_non_power_of_four(self):
        with pytest.raises(ValueError):
            rp_project(None, d_in=64, d_out=8)
