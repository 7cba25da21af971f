"""Structured Streaming extensions.

The reference is strictly batch (SURVEY.md §2.6 "Streaming: none"), but
a corpus at 10^12-file scale grows continuously, so the engine supports
incremental index maintenance the Spark-native way:

* :func:`incremental_index` — ``readStream`` over a corpus directory →
  per-micro-batch delta posting segments via ``foreachBatch`` (reusing
  the batch tokenize/tf/encode path; Lucene's analog is the NRT segment
  flush). Each batch appends ``postings/delta=<epoch>`` files plus a
  manifest row, so the searcher unions base + delta segments; a
  compaction job (re-run of the batch builder) folds deltas in.
* :func:`windowed_event_counts` — watermarked sliding-window counts
  over an event stream (the standard late-data-tolerant aggregation).

Both are tested with ``trigger(availableNow=True)`` file streams.
"""

from __future__ import annotations

import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .analysis import tokenize_pandas_udf
from .index_build import _ENC_SCHEMA, _make_encode_fn
from .postings import BLOCK_SIZE
from .scoring import B, K1

CORPUS_SCHEMA = T.StructType([
    T.StructField("repo", T.StringType()),
    T.StructField("path", T.StringType()),
    T.StructField("commit", T.StringType()),
    T.StructField("lang", T.StringType()),
    T.StructField("content", T.StringType()),
    T.StructField("doc_id", T.LongType()),  # pre-assigned upstream
])


def delta_segment_writer(index_dir: str, avgdl: float, n_buckets: int = 8,
                         k1: float = K1, b: float = B,
                         block_size: int = BLOCK_SIZE):
    """foreachBatch function: one delta posting segment per micro-batch.

    avgdl is frozen from the base index's stats (exactly how the batch
    builder freezes it into block_max_w); a compaction re-derives it.
    """
    tok = tokenize_pandas_udf()
    enc_fn = _make_encode_fn(avgdl, k1, b, block_size)

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        toks = batch_df.select(
            "doc_id",
            F.size(tok(F.col("content"))).alias("dl"),
            F.explode(tok(F.col("content"))).alias("term"),
        )
        tf = (toks.groupBy("term", "doc_id", "dl")
              .agg(F.count(F.lit(1)).alias("tf"))
              .withColumn("salt", F.lit(0).cast("int"))
              .withColumn("bucket",
                          F.pmod(F.xxhash64("term"), F.lit(n_buckets))
                          .cast("int")))
        enc = tf.groupBy("bucket", "term", "salt").applyInPandas(
            enc_fn, schema=_ENC_SCHEMA)
        (enc.withColumn("delta", F.lit(int(epoch_id)))
         .write.mode("append")
         .partitionBy("delta", "bucket")
         .parquet(f"{index_dir}/delta_postings"))

    return write_batch


def incremental_index(spark: SparkSession, watch_dir: str, index_dir: str,
                      avgdl: float, n_buckets: int = 8,
                      checkpoint: str | None = None,
                      available_now: bool = True):
    """Stream new corpus files from ``watch_dir`` into delta segments.

    Returns the StreamingQuery. With ``available_now`` the query drains
    what exists and stops — the test/batch-catchup mode; without it, it
    runs continuously (micro-batch per trigger).
    """
    stream = (spark.readStream.schema(CORPUS_SCHEMA).parquet(watch_dir))
    writer = delta_segment_writer(index_dir, avgdl, n_buckets)
    q = (stream.writeStream
         .foreachBatch(writer)
         .option("checkpointLocation",
                 checkpoint or f"{index_dir}/stream_checkpoint"))
    if available_now:
        q = q.trigger(availableNow=True)
    return q.start()


def read_delta_postings(spark: SparkSession, index_dir: str) -> DataFrame:
    """All delta segments, same schema as base postings + delta epoch.
    A searcher unions this with the base ``postings/`` table (scores are
    additive per (term, doc) across segments)."""
    return spark.read.parquet(f"{index_dir}/delta_postings")


def windowed_event_counts(events: DataFrame, window: str = "1 hour",
                          slide: str | None = None,
                          watermark: str = "2 hours") -> DataFrame:
    """Watermarked (sliding-)window event-type counts:
    (window_start, window_end, event_type, n, total_value).

    Works on a streaming OR batch events DataFrame with (ts,
    event_type, value) — the batch form is the correctness oracle for
    the streaming form.
    """
    # parquet timestamps often arrive as TIMESTAMP_NTZ; watermarks
    # require TIMESTAMP, so normalize first
    df = events.withColumn("ts", F.col("ts").cast("timestamp"))
    w = F.window("ts", window, slide) if slide else F.window("ts", window)
    if df.isStreaming:
        df = df.withWatermark("ts", watermark)
    return (df.groupBy(w.alias("win"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("value").alias("total_value"))
            .select(F.col("win.start").alias("window_start"),
                    F.col("win.end").alias("window_end"),
                    "event_type", "n", "total_value"))
