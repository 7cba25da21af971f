"""Structured Streaming: incremental delta-segment indexing and
watermarked windowed aggregation (engine/streaming.py)."""

import numpy as np
from pyspark.sql import functions as F

from engine import streaming
from engine.postings import decode_postings


def test_incremental_index_delta_segments(spark, tmp_path):
    watch = str(tmp_path / "incoming")
    idx = str(tmp_path / "sidx")
    rows1 = [("r", f"f{i}", "-", "py", f"alpha beta doc{i}", i)
             for i in range(4)]
    spark.createDataFrame(rows1, streaming.CORPUS_SCHEMA) \
        .write.parquet(watch)
    q = streaming.incremental_index(spark, watch, idx, avgdl=3.0,
                                    n_buckets=4)
    q.awaitTermination(120)
    delta = streaming.read_delta_postings(spark, idx)
    rows = {r["term"]: r for r in delta.collect()}
    assert set(rows) >= {"alpha", "beta"}
    d, tf, dl = decode_postings(bytes(rows["alpha"]["blob"]))
    assert list(d) == [0, 1, 2, 3]
    assert list(tf) == [1] * 4

    # second batch of files → second delta epoch, no dupes
    rows2 = [("r", f"g{i}", "-", "py", "alpha gamma", 100 + i)
             for i in range(2)]
    spark.createDataFrame(rows2, streaming.CORPUS_SCHEMA) \
        .write.mode("append").parquet(watch)
    q2 = streaming.incremental_index(spark, watch, idx, avgdl=3.0,
                                     n_buckets=4)
    q2.awaitTermination(120)
    delta = streaming.read_delta_postings(spark, idx)
    alpha = delta.where(F.col("term") == "alpha").collect()
    assert len(alpha) == 2  # one posting row per delta epoch
    all_docs = sorted(
        int(x) for r in alpha for x in decode_postings(bytes(r["blob"]))[0])
    assert all_docs == [0, 1, 2, 3, 100, 101]


def test_windowed_event_counts_batch_oracle(spark):
    import datetime as dt

    base = dt.datetime(2026, 1, 1, 0, 0, 0)
    rows = [(base + dt.timedelta(minutes=m), "click", float(m))
            for m in (5, 20, 70, 130)] + \
           [(base + dt.timedelta(minutes=10), "view", 1.0)]
    events = spark.createDataFrame(rows, "ts timestamp, event_type string, value double")
    out = streaming.windowed_event_counts(events, window="1 hour")
    got = {(r["window_start"].hour, r["event_type"]): (r["n"], r["total_value"])
           for r in out.collect()}
    assert got[(0, "click")] == (2, 25.0)
    assert got[(1, "click")] == (1, 70.0)
    assert got[(2, "click")] == (1, 130.0)
    assert got[(0, "view")] == (1, 1.0)


def test_windowed_event_counts_streaming_matches_batch(spark, tmp_path):
    """availableNow streaming result == batch result on the same files
    (the batch form is the oracle)."""
    src = str(tmp_path / "events_src")
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    events.write.parquet(src)
    batch = {(str(r["window_start"]), r["event_type"]): (r["n"], round(r["total_value"], 6))
             for r in streaming.windowed_event_counts(events).collect()}

    stream = (spark.readStream.schema(events.schema).parquet(src))
    # complete mode + memory sink: append mode would hold back windows
    # newer than the final watermark (availableNow never advances past
    # the last batch), so complete is the right drain-everything mode.
    q = (streaming.windowed_event_counts(stream)
         .writeStream.outputMode("complete")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True)
         .format("memory").queryName("wincounts").start())
    q.awaitTermination(180)
    got = {(str(r["window_start"]), r["event_type"]): (r["n"], round(r["total_value"], 6))
           for r in spark.sql("select * from wincounts").collect()}
    assert got == batch
