"""TREC run-file sink/source (SURVEY.md §2.1 S6, S9; reference
Searcher.java:79: ``"%s Q0 %s %d %.4f %s%n"``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RUN_TAG = "SPARK_FTS_Entity_RM3"


def format_run(hits: DataFrame, tag: str = RUN_TAG) -> DataFrame:
    """(qid, docno, rank, score) -> single-column TREC run lines,
    ordered by (qid, rank)."""
    return (hits
            .select(F.format_string("%s Q0 %s %d %.4f %s",
                                    F.col("qid"), F.col("docno"),
                                    F.col("rank"), F.col("score"),
                                    F.lit(tag)).alias("line"),
                    "qid", "rank")
            .orderBy("qid", "rank")
            .select("line"))


def write_run(hits: DataFrame, path: str, tag: str = RUN_TAG) -> None:
    """Write run file. coalesce(1) is fine at run-file scale (50 topics ×
    1000 rows); the upstream scoring stays distributed."""
    format_run(hits, tag).coalesce(1).write.mode("overwrite").text(path)


def read_run(spark, path: str) -> DataFrame:
    """Parse a run file back into (qid, docno, rank, score, tag)."""
    df = spark.read.text(path)
    parts = F.split(F.col("value"), " ")
    return df.select(
        parts.getItem(0).alias("qid"),
        parts.getItem(2).alias("docno"),
        parts.getItem(3).cast("int").alias("rank"),
        parts.getItem(4).cast("double").alias("score"),
        parts.getItem(5).alias("tag"),
    )
