"""CheckIndex over the derived sidecars (VERDICT r4 item 4):
positions and term_trigrams are views of docs/tf/termstats that
lifecycle ops invalidate — verify_index now validates them whenever
they exist (row parity vs forward tf, gap-numbering invariants,
bucket layout, two-way trigram coverage), so an injected stale or
corrupted sidecar is detected the way the dictionary-df corruption is
in test_verify_index_healthy_and_corrupt."""

import shutil

from pyspark.sql import functions as F

from engine.checkindex import verify_index
from engine.index_build import build_index
from engine.positions import _positions_path, build_positions
from engine.search import Index
from engine.trigram import _trigrams_path, build_term_trigrams

DOCS = [
    "apple banana cherry apple",
    "banana cherry durian apple banana",
    "cherry durian apple",
    "durian apple banana cherry durian",
    "apple cherry",
]


def _sidecar_index(spark, tmp_path, name="vfy"):
    rows = [(f"org/r{i}", f"f{i}.py", "c" * 12, "python", text)
            for i, text in enumerate(DOCS)]
    df = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, "
        "content string")
    path = str(tmp_path / name)
    build_index(spark, df, path, n_buckets=2, n_doc_buckets=2)
    build_positions(spark, path)
    build_term_trigrams(spark, path)
    return Index(spark, path)


def _rewrite(spark, df, out, partition_by=None):
    tmp = out + "_rw"
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(partition_by)
    w.parquet(tmp)
    shutil.rmtree(out)
    shutil.move(tmp, out)


def test_verify_sidecars_healthy(spark, tmp_path):
    idx = _sidecar_index(spark, tmp_path)
    rep = verify_index(spark, idx.index_dir)
    assert rep["ok"], rep
    assert rep["sidecars_checked"] == {"positions": True,
                                       "term_trigrams": True}
    for key in ("pos_tf_mismatch", "pos_order_bad", "pos_bucket_bad",
                "trigram_missing", "trigram_extra"):
        assert rep[key] == 0, (key, rep)


def test_verify_without_sidecars_still_ok(spark, tmp_path):
    rows = [("org/a", "x.py", "c" * 12, "python", "apple banana")]
    df = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, "
        "content string")
    path = str(tmp_path / "bare")
    build_index(spark, df, path, n_buckets=2, n_doc_buckets=1)
    rep = verify_index(spark, path)
    assert rep["ok"], rep
    assert rep["sidecars_checked"] == {"positions": False,
                                       "term_trigrams": False}


def test_verify_detects_dropped_positions_row(spark, tmp_path):
    idx = _sidecar_index(spark, tmp_path, "drop")
    out = _positions_path(idx.index_dir)
    pos = spark.read.parquet(out)
    first = pos.orderBy("term", "doc_id").limit(1).collect()[0]
    _rewrite(spark,
             pos.where(~((F.col("term") == first["term"])
                         & (F.col("doc_id") == first["doc_id"]))),
             out, partition_by="bucket")
    rep = verify_index(spark, idx.index_dir)
    assert not rep["ok"]
    assert rep["pos_tf_mismatch"] == 1
    assert rep["pos_order_bad"] == 0


def test_verify_detects_bad_position_numbering(spark, tmp_path):
    idx = _sidecar_index(spark, tmp_path, "order")
    out = _positions_path(idx.index_dir)
    pos = spark.read.parquet(out)
    first = pos.where(F.size("positions") >= 2) \
               .orderBy("term", "doc_id").limit(1).collect()[0]
    hit = ((F.col("term") == first["term"])
           & (F.col("doc_id") == first["doc_id"]))
    _rewrite(spark,
             pos.withColumn("positions",
                            F.when(hit, F.reverse("positions"))
                            .otherwise(F.col("positions"))),
             out, partition_by="bucket")
    rep = verify_index(spark, idx.index_dir)
    assert not rep["ok"]
    assert rep["pos_order_bad"] == 1
    assert rep["pos_tf_mismatch"] == 0   # counts untouched


def test_verify_detects_trigram_gaps_and_strays(spark, tmp_path):
    idx = _sidecar_index(spark, tmp_path, "tg")
    out = _trigrams_path(idx.index_dir)
    tg = spark.read.parquet(out)
    doctored = (tg.where(F.col("term") != "banana")
                .union(spark.createDataFrame([("zzz", "zzzbogus")],
                                             "tg string, term string")))
    _rewrite(spark, doctored, out)
    rep = verify_index(spark, idx.index_dir)
    assert not rep["ok"]
    assert rep["trigram_missing"] >= 1   # banana's trigrams gone
    assert rep["trigram_extra"] == 1     # the stray non-dictionary term


def test_verify_detects_stale_sidecar_after_update(spark, tmp_path):
    """The REAL failure mode the check exists for: a lifecycle op that
    rewrote docs/tf but did not invalidate the positions sidecar. We
    simulate the forgotten invalidation by saving the sidecar aside,
    running update_docs (which correctly invalidates), and restoring
    the stale copy — verify_index must flag the inconsistency."""
    from engine.deletes import update_docs

    idx = _sidecar_index(spark, tmp_path, "stale")
    out = _positions_path(idx.index_dir)
    keep = str(tmp_path / "stale_positions_copy")
    shutil.copytree(out, keep)
    upd = spark.createDataFrame(
        [("org/r0", "f0.py", "d" * 12, "python",
          "elderberry fig elderberry grape")],
        "repo string, path string, commit string, lang string, "
        "content string")
    update_docs(spark, idx.index_dir, upd)   # correctly invalidates
    shutil.rmtree(out, ignore_errors=True)
    shutil.copytree(keep, out)               # ...and we put it back
    rep = verify_index(spark, idx.index_dir)
    assert not rep["ok"]
    assert rep["pos_tf_mismatch"] >= 1, rep
