"""streaming_percolate auto-dispatch to the indexed query store
(VERDICT r4 item 5): at volume the stream registers the store as an
index once and every micro-batch runs the anchor-pruned candidate
join instead of broadcasting the store — these tests pin
stream≡batch equivalence on the indexed path, the auto cutover in
both directions, and the queries-evaluated counter in the stream
logs."""

import json

from engine import streaming
from engine.percolate import percolate


def _doc(i, text):
    return ("r", f"f{i}", "-", "py", text, i)


WAVE1 = [_doc(0, "merge sort in the engine core"),
         _doc(1, "hash join only here")]
WAVE2 = [_doc(10, "merge sort plus hash extras"),
         _doc(11, "nothing relevant at all")]
QUERIES = [("a1", ["merge", "sort"], ["hash"]),
           ("a2", ["hash"], []),
           ("a3", ["engine", "core"], []),
           ("a4", ["quicksilver"], [])]


def _run_two_waves(spark, tmp_path, name, **kw):
    watch = str(tmp_path / f"{name}_in")
    out = str(tmp_path / f"{name}_out")
    spark.createDataFrame(WAVE1, streaming.CORPUS_SCHEMA) \
        .write.parquet(watch)
    q = streaming.streaming_percolate(spark, watch, out, QUERIES, **kw)
    q.awaitTermination(180)
    spark.createDataFrame(WAVE2, streaming.CORPUS_SCHEMA) \
        .write.mode("append").parquet(watch)
    q = streaming.streaming_percolate(spark, watch, out, QUERIES, **kw)
    q.awaitTermination(180)
    got = {(r["doc_id"], r["qid"])
           for r in spark.read.parquet(f"{out}/matches").collect()}
    return got, out


def test_streaming_indexed_matches_batch(spark, tmp_path):
    got, out = _run_two_waves(spark, tmp_path, "idx", mode="indexed")
    both = spark.createDataFrame(WAVE1 + WAVE2, streaming.CORPUS_SCHEMA)
    want = {(r["doc_id"], r["qid"])
            for r in percolate(both, QUERIES, text_col="content")
            .collect()}
    assert got == want == {(0, "a1"), (0, "a3"), (1, "a2"), (10, "a2")}
    # the stream log carries the queries-evaluated counter per epoch
    lines = [json.loads(ln) for ln in
             open(f"{out}/percolate_stats.jsonl").read().splitlines()]
    assert len(lines) >= 2
    for st in lines:
        assert st["n_queries"] == len(QUERIES)
        # anchor pruning engages: no doc pairs with the whole store
        assert st["max_candidates_per_doc"] < len(QUERIES)
        assert st["avg_candidates_per_doc"] <= st["max_candidates_per_doc"]
        assert "epoch" in st


def test_streaming_auto_dispatch_cutover(spark, tmp_path):
    """auto with a threshold above the store size broadcasts (no
    query_store dir, no stats log); at/below the store size it
    registers the indexed store — same matches either way."""
    import os
    got_b, out_b = _run_two_waves(spark, tmp_path, "auto_bc",
                                  mode="auto", indexed_threshold=100)
    assert not os.path.exists(f"{out_b}/query_store")
    assert not os.path.exists(f"{out_b}/percolate_stats.jsonl")
    got_i, out_i = _run_two_waves(spark, tmp_path, "auto_ix",
                                  mode="auto", indexed_threshold=4)
    assert os.path.exists(f"{out_i}/query_store")
    assert os.path.exists(f"{out_i}/percolate_stats.jsonl")
    assert got_b == got_i == {(0, "a1"), (0, "a3"), (1, "a2"),
                              (10, "a2")}
