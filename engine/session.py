"""SparkSession factory with the engine's standard configuration."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def get_spark(app: str = "spark-fts", master: str | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    sp = shuffle_partitions if shuffle_partitions is not None else int(cpus)
    return (
        SparkSession.builder.master(master).appName(app)
        .config("spark.sql.shuffle.partitions", str(sp))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # local test files are small; 128MB splits would serialize the
        # scan+tokenize map side on a handful of tasks (at cluster scale
        # the file count provides the splits instead)
        .config("spark.sql.files.maxPartitionBytes", "8m")
        # let the planner pick shuffled-hash over sort-merge when its
        # size conditions hold (guide §3.1/§9): avoids sorting rows
        # that carry array payloads through a join — measured r6:
        # minhash verify 5.5 → 4.8 s at sf1.0. Scale note: this is the
        # guide's recommended batch-ETL baseline, not a local-only
        # tune; the planner still falls back to sort-merge when the
        # per-partition build side could not fit.
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def fan_out(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Give a map-heavy stage at least ``min_parts`` input partitions.

    A single-file, single-row-group parquet input defeats byte-range
    splitting (a row group is read whole by one task), so everything
    upstream of the first exchange — tokenize, shingle+md5, sha2,
    per-row decode — runs on ONE core regardless of cluster size
    (measured r6: the minhash signature pass was 11.6 s single-task at
    sf1.0 on local[32]). One round-robin repartition of the narrow
    input rows costs a small shuffle and parallelizes the expensive
    map side across the cluster.

    Scale-adaptive by construction (guide §2.4 — never add a shuffle
    the data layout doesn't need): ``min_parts`` defaults to
    ``defaultParallelism`` and the repartition is skipped whenever the
    plan already provides that many partitions — at 100 TB the file
    count does, so this is a no-op there. The same guard un-collapses
    stages downstream of a few-bucket window (the CLAUDE.md round-3
    single-partition-window pitfall).

    Call it on SCAN-ROOTED inputs only: probing ``.rdd`` on a plan
    that already contains an exchange makes AQE materialize the
    upstream stages eagerly, and the repartitioned result would then
    recompute them. Post-shuffle call sites should gate on what they
    know statically (see build_index stage 1) instead.
    """
    if df.isStreaming:
        return df   # no .rdd probe on streaming frames
    sc = df.sparkSession.sparkContext
    n = int(min_parts) if min_parts is not None else sc.defaultParallelism
    if df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n)
