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


def test_sessionize_stream_matches_batch(spark, tmp_path):
    """Custom stateful operator (applyInPandasWithState): the streaming
    sessionizer's CLOSED sessions must equal the batch sessionizer's
    output minus each user's final (still-open) session."""
    import datetime as dt

    from engine.streaming import sessionize, sessionize_stream

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for uid in (1, 2, 3):
        t = base + dt.timedelta(minutes=uid)
        for sess in range(3):          # 3 sessions per user
            for j in range(4):         # 4 events each, 5 min apart
                rows.append((eid, t, uid, "click", float(uid * 10 + j)))
                eid += 1
                t += dt.timedelta(minutes=5)
            t += dt.timedelta(minutes=45)  # gap > 30 min closes session
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double")
    src = str(tmp_path / "sess_src")
    events.repartition(2).write.parquet(src)

    batch = sessionize(events, gap="30 minutes").collect()
    assert len(batch) == 9  # 3 users × 3 sessions

    stream = spark.readStream.schema(
        spark.read.parquet(src).schema).parquet(src)
    out_dir = str(tmp_path / "sess_out")
    q = (sessionize_stream(stream, gap="30 minutes")
         .writeStream.format("parquet")
         .option("path", out_dir)
         .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
         .outputMode("append")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination(120)
    got = spark.read.parquet(out_dir).collect()

    def key(r):
        return (r["user_id"], r["session_start"], r["session_end"],
                r["n_events"], round(r["total_value"], 6))

    # closed = batch sessions minus each user's LAST session (open in state)
    last_per_user = {}
    for r in batch:
        cur = last_per_user.get(r["user_id"])
        if cur is None or r["session_start"] > cur["session_start"]:
            last_per_user[r["user_id"]] = r
    expect = sorted(key(r) for r in batch
                    if key(r) != key(last_per_user[r["user_id"]]))
    assert sorted(key(r) for r in got) == expect
    assert len(got) == 6


def test_sessionize_stream_late_event_does_not_regress(spark, tmp_path):
    """A late (out-of-order, cross-batch) event must extend the open
    session's bounds monotonically — never regress session_end (which
    would also corrupt subsequent gap checks)."""
    import datetime as dt
    import time

    from engine.streaming import sessionize_stream

    schema = ("event_id long, ts timestamp, user_id long, "
              "event_type string, value double")
    base = dt.datetime(2024, 1, 1, 10, 0)
    src = str(tmp_path / "late_src")
    out_dir = str(tmp_path / "late_out")
    ckpt = str(tmp_path / "late_ckpt")

    def run_batch(rows):
        spark.createDataFrame(rows, schema).coalesce(1) \
            .write.mode("append").parquet(src)
        stream = spark.readStream.schema(
            spark.read.parquet(src).schema).parquet(src)
        q = (sessionize_stream(stream, gap="30 minutes")
             .writeStream.format("parquet")
             .option("path", out_dir)
             .option("checkpointLocation", ckpt)
             .outputMode("append")
             .trigger(availableNow=True)
             .start())
        q.awaitTermination(120)

    # batch 1: open session [10:00, 10:05]
    run_batch([(0, base, 1, "c", 1.0),
               (1, base + dt.timedelta(minutes=5), 1, "c", 1.0)])
    time.sleep(1.1)  # distinct file mtime for the source ordering
    # batch 2: a LATE event (9:58) + a far event (10:40) that closes
    # the session — the emitted session must end at 10:05, not 9:58
    run_batch([(2, base - dt.timedelta(minutes=2), 1, "c", 1.0),
               (3, base + dt.timedelta(minutes=40), 1, "c", 1.0)])
    got = spark.read.parquet(out_dir).collect()
    assert len(got) == 1
    s = got[0]
    assert s["session_start"] == base - dt.timedelta(minutes=2)
    assert s["session_end"] == base + dt.timedelta(minutes=5)  # no regress
    assert s["n_events"] == 3


def test_streaming_dedup_filter_matches_reference(spark, tmp_path):
    """Two micro-batches through streaming_dedup_filter == a Python
    reference applying the documented keep rule to the engine's own
    band hashes (store collision OR in-batch bucket-leader loss)."""
    from engine.pipeline.dedup import band_table, minhash_signatures

    watch = str(tmp_path / "dd_in")
    out = str(tmp_path / "dd_out")

    def doc(i, text):
        return ("r", f"f{i}", "-", "py", text, i)

    wave1 = [
        doc(0, "the quick brown fox jumps over the lazy dog today"),
        doc(1, "merge sort runs in n log n time on any input array"),
        doc(2, "hash join builds a table from the smaller input side"),
        doc(3, "merge sort runs in n log n time on any input array"),  # dup of 1
        doc(4, "short doc"),  # too short to shingle → always kept
    ]
    wave2 = [
        doc(10, "the quick brown fox jumps over the lazy dog today"),  # dup of 0
        doc(11, "window functions rank rows within partitions by order"),
        doc(12, "window functions rank rows within partitions by order"),  # dup of 11
        doc(13, "vectorized execution processes batches of columnar data"),
    ]

    spark.createDataFrame(wave1, streaming.CORPUS_SCHEMA).write.parquet(watch)
    q = streaming.streaming_dedup_filter(spark, watch, out)
    q.awaitTermination(180)
    spark.createDataFrame(wave2, streaming.CORPUS_SCHEMA) \
        .write.mode("append").parquet(watch)
    q = streaming.streaming_dedup_filter(spark, watch, out)
    q.awaitTermination(180)

    kept = {int(r["doc_id"])
            for r in spark.read.parquet(f"{out}/kept").collect()}

    # reference: engine band hashes + the documented rule in Python
    alldf = spark.createDataFrame(wave1 + wave2, streaming.CORPUS_SCHEMA)
    bt = band_table(minhash_signatures(alldf, text_col="content")).collect()
    bands_of: dict[int, set] = {}
    for r in bt:
        bands_of.setdefault(int(r["doc_id"]), set()).add(
            (r["band_idx"], r["band_hash"]))
    store: set = set()
    expect: set = set()
    for wave in ([d[5] for d in wave1], [d[5] for d in wave2]):
        bucket_min: dict = {}
        for d in wave:
            for bh in bands_of.get(d, ()):
                bucket_min[bh] = min(bucket_min.get(bh, d), d)
        kept_wave = {
            d for d in wave
            if not any(bh in store or bucket_min[bh] < d
                       for bh in bands_of.get(d, ()))}
        for d in kept_wave:
            store |= bands_of.get(d, set())
        expect |= kept_wave
    assert kept == expect
    assert 4 in kept          # unshingleable doc always kept
    assert 3 not in kept and 10 not in kept and 12 not in kept


def test_windowed_cardinality_stream_matches_batch(spark, tmp_path):
    """Windowed HLL distinct-count: the streaming register path
    (single stateful max-agg, bounded state) must produce exactly the
    batch registers, hence the identical estimate."""
    import datetime as dt

    from engine.sketches import hll_estimate
    from engine.streaming import (windowed_cardinality,
                                  windowed_cardinality_registers)

    base = dt.datetime(2024, 1, 1)
    rows = []
    for h in range(3):                    # 3 hourly windows
        for i in range(200 * (h + 1)):    # distinct users per window
            rows.append((h * 1000 + i,
                         base + dt.timedelta(hours=h,
                                             seconds=i % 3600),
                         i % (150 * (h + 1)),  # dups inside window
                         "click", 1.0))
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double")
    src = str(tmp_path / "wc_src")
    events.repartition(3).write.parquet(src)

    batch = {r["window_start"]: (r["v_zero"], r["est"])
             for r in windowed_cardinality(events).collect()}
    assert len(batch) == 3
    # sketch accuracy: within 5 % of the true distinct count here
    truth = {0: 150, 1: 300, 2: 450}
    for h, (ws, (_vz, est)) in enumerate(sorted(batch.items())):
        assert abs(est - truth[h]) / truth[h] < 0.05

    stream = (spark.readStream.schema(events.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    regs = windowed_cardinality_registers(stream)
    q = (regs.writeStream.format("memory").queryName("wc_regs")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got_regs = spark.table("wc_regs")
    est = hll_estimate(got_regs, ["win"])
    got = {r["win"]["start"].strftime("%Y-%m-%d %H:%M:%S"):
           (r["v_zero"], r["est"]) for r in est.collect()}
    want = {k.strftime("%Y-%m-%d %H:%M:%S"): v for k, v in batch.items()}
    assert got == want


def test_windowed_heavy_hitters_stream_matches_batch(spark, tmp_path):
    """Windowed CMS heavy hitters: the streaming register path (single
    stateful sum-agg, bounded 4x1024 state per window) must produce
    exactly the batch registers; extraction never misses a TRUE heavy
    hitter (est >= true, one-sided)."""
    import datetime as dt

    from engine.streaming import (windowed_heavy_hitters,
                                  windowed_heavy_hitters_registers)

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for h in range(2):
        # user 7 dominates (30%), user 8 at 10%, long tail below phi
        for i in range(300):
            uid = 7 if i % 10 < 3 else (8 if i % 10 == 3 else 100 + i)
            rows.append((eid, base + dt.timedelta(hours=h,
                                                  seconds=i % 3600),
                         uid, "click", 1.0))
            eid += 1
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double")

    hh = windowed_heavy_hitters(events, phi=0.08).collect()
    per_win = {}
    for r in hh:
        per_win.setdefault(r["window_start"], set())
        if r["hh"]:
            per_win[r["window_start"]].add(r["value"])
    assert len(per_win) == 2
    for ws, flagged in per_win.items():
        # the true >=8% users MUST be flagged (no misses, one-sided)
        assert {7, 8} <= flagged
        # over-flagging bounded: tail users are ~0.3% each, far from
        # phi even with CMS overcounts at this width
        assert len(flagged) <= 4
    # est >= true count for the dominant user
    est7 = {r["window_start"]: r["est"] for r in hh if r["value"] == 7}
    assert all(v >= 90 for v in est7.values())

    src = str(tmp_path / "hh_src")
    events.repartition(3).write.parquet(src)
    stream = (spark.readStream.schema(events.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    regs = windowed_heavy_hitters_registers(stream)
    q = (regs.writeStream.format("memory").queryName("hh_regs")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r["win"]["start"], r["row"], r["col"]): r["cnt"]
           for r in spark.table("hh_regs").collect()}
    want = {(r["win"]["start"], r["row"], r["col"]): r["cnt"]
            for r in windowed_heavy_hitters_registers(events).collect()}
    assert got == want


def test_windowed_heavy_hitters_ignores_null_values(spark):
    """NULL values never enter the sketch, so they must not inflate
    window_n or appear as candidates — else a true heavy hitter of
    the non-null traffic falls under ceil(phi*N) (review regression)."""
    import datetime as dt

    from engine.streaming import windowed_heavy_hitters

    base = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(50):                      # user 7: 100% of non-null
        rows.append((i, base + dt.timedelta(seconds=i), 7, "c", 1.0))
    for i in range(950):                     # swamp of NULL users
        rows.append((1000 + i, base + dt.timedelta(seconds=i),
                     None, "c", 1.0))
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double")
    got = windowed_heavy_hitters(events, phi=0.5).collect()
    assert [r["value"] for r in got] == [7]      # no NULL candidate row
    assert got[0]["window_n"] == 50              # non-null N only
    assert got[0]["hh"] is True                  # 100% >= 50% of 50
