"""Distributed inverted-index construction (SURVEY.md §2.4 I1-I9, §3.1).

Replaces what the reference delegates to Lucene's ``IndexWriter``
(reference: src/main/java/org/cs7is3/Indexer.java:27-71) with an
explicit Spark dataflow:

    corpus table ──► deterministic dense doc_id (I1)
                ──► tokenize (vectorized pandas UDF, T1-T5)
                ──► explode ──► tf per (term, doc) (I2)  [shuffle 1]
                ──► df / dl / avgdl / N stats (I3, I8, I9)
                ──► salted repartition-by-term + head-term skew split
                ──► per-group sort + VB/block-max encode (I4-I6)
                                                          [shuffle 2]
                ──► segment parquet per term bucket + lineage manifest
                    (I7; resumable — the Spark analog of Lucene's
                    flush-segments-no-forceMerge at Indexer.java:50)

On-disk layout under ``index_dir``::

    docs/       doc_id, docno, repo, path, commit, lang, content, sha
    tf/         bucket=*/ term, salt, doc_id, tf, dl      (checkpoint 1)
    termstats/  term, df, bucket
    stats/      single row: n_docs, avgdl, total_tokens, n_buckets, ...
    postings/   bucket=*/ term, salt, df_part, blob, block_last,
                block_max_tf, block_max_w                 (checkpoint 2)
    manifest/   segment_id(bucket), n_terms, n_postings, bytes,
                term_min, term_max, chunk_id, status      (lineage)

Resume: stage outputs are committed atomically per Spark job; the
postings stage processes buckets in chunks, appending manifest rows per
chunk, so a killed build restarts exactly at the first unfinished
chunk (``plan_missing_buckets`` anti-joins all buckets vs manifest).

Scale notes (designed for ~100 TB / 1000 executors, tested local[32]):
* doc_id assignment is two-pass hash-bucketed (no global sort, no
  single-partition window): canonical order = (hash-bucket, repo, path).
* dl is carried through the explode so tf aggregation needs no
  doclens join (dl is functionally dependent on doc_id).
* head terms (Zipf skew) are split by ``doc_id % n_splits`` so no
  posting group exceeds ``split_threshold`` entries — bounds both the
  shuffle skew and the applyInPandas group memory.
* everything downstream of the tokenizer UDF is built-in Catalyst
  (whole-stage codegen) except the final applyInPandas encode.
"""

from __future__ import annotations

import json
import time

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
import pyspark.sql.types as T

from .analysis import tokenize_pandas_udf, tokens_col
from .postings import BLOCK_SIZE, encode_postings
from .scoring import B, K1

DEFAULT_N_BUCKETS = 32
DEFAULT_SPLIT_THRESHOLD = 100_000


# ---------------------------------------------------------------------------
# I1: deterministic dense doc_id assignment — distributed, no global sort
# ---------------------------------------------------------------------------

DOCS_PER_ID_BUCKET = 200_000  # target rows per doc-id window task


def assign_doc_ids(corpus: DataFrame,
                   n_doc_buckets: int | None = None) -> DataFrame:
    """Dense, deterministic ``doc_id`` per (repo, path).

    Canonical total order = (xxhash64-bucket, repo, path): stable across
    runs and parallelism levels, computed with one small aggregate plus
    a per-bucket window — no single-partition global sort (SURVEY.md
    §2.4 I1, §4.2 item 4).

    ``n_doc_buckets=None`` derives the bucket count from the corpus
    size (≈ DOCS_PER_ID_BUCKET rows per bucket, min 32) so the
    per-bucket sort never becomes a straggler at scale: a fixed default
    would put corpus/64 rows into one task's sort at 10^9+ docs. Note
    the doc_id ASSIGNMENT depends on the bucket count, so resuming or
    delta-indexing an existing index must reuse its recorded count.
    """
    if n_doc_buckets is None:
        n = corpus.count()
        n_doc_buckets = max(32, -(-n // DOCS_PER_ID_BUCKET))
    b = F.pmod(F.xxhash64("repo", "path"), F.lit(n_doc_buckets)).alias("_b")
    # the id-assigning window runs over the NARROW (bucket, repo, path)
    # projection only — the window's exchange + per-bucket sort then
    # move a few dozen bytes per row instead of the document payload
    # (guide §8: decide with small rows, move big rows once; r6 — the
    # old form sorted full content rows inside the window task). The
    # content is re-attached by an equi-join on the natural key, which
    # AQE broadcasts whenever the id table fits (always at bench
    # scale) and otherwise costs the one content shuffle the window
    # itself used to pay, minus the content sort.
    keys = corpus.select("repo", "path").withColumn("_b", b)
    if n_doc_buckets == 1:
        # single-bucket fast path (tiny corpora / oracle-comparable
        # bench indexes): every row lands in bucket 0 with offset 0, so
        # the per-bucket count job would be pure latency
        w1 = Window.partitionBy("_b").orderBy("repo", "path")
        # cast: row_number alone is int32 while the multi-bucket path
        # (offset long + row_number) is int64 — doc_id must be a
        # single physical type whatever the bucket count, or appends
        # from one path poison a table built by the other (mixed
        # parquet physical types fail at scan time)
        ids = (keys.withColumn("doc_id",
                               (F.row_number().over(w1) - 1).cast("long"))
               .drop("_b"))
    else:
        counts = keys.groupBy("_b").count().collect()
        by_bucket = {int(r["_b"]): int(r["count"]) for r in counts}
        offsets, acc = {}, 0
        for k in sorted(by_bucket):
            offsets[k] = acc
            acc += by_bucket[k]
        spark = corpus.sparkSession
        off_df = F.broadcast(spark.createDataFrame(
            [(k, v) for k, v in offsets.items()], "_b long, _off long"))
        w = Window.partitionBy("_b").orderBy("repo", "path")
        ids = (keys.join(off_df, "_b")
               .withColumn("doc_id",
                           (F.col("_off") + F.row_number().over(w) - 1)
                           .cast("long"))
               .drop("_b", "_off"))
    return (corpus.join(ids, ["repo", "path"])
            .withColumn("docno", F.concat_ws("/", "repo", "path")))


# ---------------------------------------------------------------------------
# sha invariant (BASELINE.json input_hint)
# ---------------------------------------------------------------------------

def check_sha(df: DataFrame) -> int:
    """Number of rows whose stored ``sha`` mismatches recomputed
    ``sha2(content, 256)`` — must be 0 after every materialization."""
    return df.where(F.sha2(F.col("content"), 256) != F.col("sha")).count()


# ---------------------------------------------------------------------------
# Build stages
# ---------------------------------------------------------------------------

def _paths(index_dir: str) -> dict[str, str]:
    return {k: f"{index_dir}/{k}" for k in
            ("docs", "tf", "termstats", "stats", "postings", "manifest")}


def _exists(spark: SparkSession, path: str) -> bool:
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(hpath):
        return False
    # A Spark parquet write is complete iff _SUCCESS exists.
    return fs.exists(jvm.org.apache.hadoop.fs.Path(path + "/_SUCCESS"))


def write_sorted_termstats(df, path: str, n_parts: int) -> None:
    """Write the term dictionary RANGE-partitioned and sorted by term
    (Lucene's sorted term dict / FST analog): every file covers a
    disjoint term range and every row group is term-sorted, so parquet
    min/max statistics prune the MultiTermQuery rewrites' dictionary
    scans (prefix / wildcard / regexp literal heads, term ranges) down
    to the few files that can match, instead of a full vocabulary scan
    per rewrite. The hash ``bucket`` column (postings lookup key) is
    unchanged — only the row layout moves. Used by the batch build,
    purge and delta compaction so the property survives the lifecycle."""
    (df.repartitionByRange(max(int(n_parts), 8), "term")
       .sortWithinPartitions("term")
       .write.mode("overwrite").parquet(path))


def _manifest_schema() -> T.StructType:
    return T.StructType([
        T.StructField("segment_id", T.IntegerType()),
        T.StructField("n_terms", T.LongType()),
        T.StructField("n_postings", T.LongType()),
        T.StructField("bytes", T.LongType()),
        T.StructField("term_min", T.StringType()),
        T.StructField("term_max", T.StringType()),
        T.StructField("chunk_id", T.IntegerType()),
        T.StructField("status", T.StringType()),
    ])


_ENC_SCHEMA = T.StructType([
    T.StructField("term", T.StringType()),
    T.StructField("salt", T.IntegerType()),
    T.StructField("df_part", T.LongType()),
    T.StructField("blob", T.BinaryType()),
    T.StructField("block_last", T.ArrayType(T.LongType())),
    T.StructField("block_max_tf", T.ArrayType(T.IntegerType())),
    T.StructField("block_max_w", T.ArrayType(T.DoubleType())),
    T.StructField("block_off", T.ArrayType(T.LongType())),
    T.StructField("bucket", T.IntegerType()),
])


def _make_encode_fn(avgdl: float, k1: float, b: float, block_size: int,
                    codec: str = "vb"):
    def encode_group(key, pdf: pd.DataFrame) -> pd.DataFrame:
        bucket, term, salt = int(key[0]), key[1], int(key[2])
        order = np.argsort(pdf["doc_id"].to_numpy(), kind="stable")
        docs = pdf["doc_id"].to_numpy()[order]
        tfs = pdf["tf"].to_numpy()[order]
        dls = pdf["dl"].to_numpy()[order]
        blob, last, mtf, mw, off = encode_postings(docs, tfs, dls, avgdl,
                                                   k1, b, block_size, codec)
        return pd.DataFrame({
            "term": [term], "salt": [salt], "df_part": [int(len(docs))],
            "blob": [blob], "block_last": [last.tolist()],
            "block_max_tf": [mtf.tolist()], "block_max_w": [mw.tolist()],
            "block_off": [off.tolist()],
            "bucket": [bucket],
        })
    return encode_group


def _encode_tf_arrow(tf: DataFrame, avgdl: float, k1: float, b: float,
                     block_size: int, codec: str = "vb") -> DataFrame:
    """Posting encode as ``mapInArrow`` over (term, salt)-clustered,
    doc_id-sorted partitions — the batch-build replacement for the
    per-group ``applyInPandas`` encode.

    Why: the build's groups are tiny (≈18 postings each at bench
    scale), so ``applyInPandas`` pays its per-group machinery (a key
    tuple + a pandas DataFrame built and returned per group) tens of
    thousands of times per bucket — the dominant cost of the postings
    stage, not the encoding itself (guide §4.1: reach for mapInArrow
    when volume is high). Here one Arrow batch covers thousands of
    groups; group boundaries are found vectorized, and
    :func:`encode_postings` is called on slices of the already-sorted
    columns, so the blobs are bit-identical to the applyInPandas path
    (regression-tested). Groups straddling Arrow batch boundaries are
    carried forward; memory per task is bounded by one batch plus the
    largest single group (≤ split_threshold postings by the head-term
    salting).

    The incremental paths (streaming delta writer, purge rewrite) keep
    the applyInPandas form — their group counts are small.
    """
    clustered = (tf.select("bucket", "term", "salt", "doc_id", "tf", "dl")
                 .repartition("term", "salt")
                 .sortWithinPartitions("term", "salt", "doc_id"))

    def enc_iter(batches):
        import pyarrow as pa

        schema = pa.schema([
            ("term", pa.string()), ("salt", pa.int32()),
            ("df_part", pa.int64()), ("blob", pa.binary()),
            ("block_last", pa.list_(pa.int64())),
            ("block_max_tf", pa.list_(pa.int32())),
            ("block_max_w", pa.list_(pa.float64())),
            ("block_off", pa.list_(pa.int64())),
            ("bucket", pa.int32()),
        ])
        carry: dict | None = None

        def cols_of(batch):
            return {
                "term": batch.column("term").to_numpy(zero_copy_only=False),
                "salt": batch.column("salt").to_numpy(zero_copy_only=False),
                "doc_id": batch.column("doc_id").to_numpy(
                    zero_copy_only=False),
                "tf": batch.column("tf").to_numpy(zero_copy_only=False),
                "dl": batch.column("dl").to_numpy(zero_copy_only=False),
                "bucket": batch.column("bucket").to_numpy(
                    zero_copy_only=False),
            }

        def encode_groups(c, starts, ends):
            out = {k: [] for k in ("term", "salt", "df_part", "blob",
                                   "block_last", "block_max_tf",
                                   "block_max_w", "block_off", "bucket")}
            for s, e in zip(starts, ends):
                blob, last, mtf, mw, off = encode_postings(
                    c["doc_id"][s:e], c["tf"][s:e], c["dl"][s:e],
                    avgdl, k1, b, block_size, codec)
                out["term"].append(c["term"][s])
                out["salt"].append(int(c["salt"][s]))
                out["df_part"].append(int(e - s))
                out["blob"].append(blob)
                out["block_last"].append(last.tolist())
                out["block_max_tf"].append(mtf.tolist())
                out["block_max_w"].append(mw.tolist())
                out["block_off"].append(off.tolist())
                out["bucket"].append(int(c["bucket"][s]))
            return pa.RecordBatch.from_pydict(out, schema=schema)

        for batch in batches:
            c = cols_of(batch)
            if carry is not None:
                c = {k: np.concatenate([carry[k], c[k]]) for k in c}
            n = len(c["term"])
            if n == 0:
                continue
            chg = np.flatnonzero(
                (c["term"][1:] != c["term"][:-1])
                | (c["salt"][1:] != c["salt"][:-1])) + 1
            starts = np.concatenate(([0], chg))
            # the final group may continue in the next batch — carry it
            carry = {k: v[starts[-1]:] for k, v in c.items()}
            starts = starts[:-1]
            if starts.size:
                ends = np.concatenate((starts[1:], [int(
                    len(c["term"]) - len(carry["term"]))]))
                yield encode_groups(c, starts, ends)
        if carry is not None and len(carry["term"]):
            yield encode_groups(carry, [0], [len(carry["term"])])

    return clustered.mapInArrow(enc_iter, schema=_ENC_SCHEMA)


def _encode_and_manifest(spark: SparkSession, p: dict, part: DataFrame,
                         chunk: list[int], chunk_id: int, avgdl: float,
                         k1: float, b: float, block_size: int,
                         codec: str) -> list[tuple]:
    """Encode one chunk's tf rows, write the postings partitions, and
    append the lineage manifest rows (returned for metric totals).

    The manifest aggregates ride the write job itself via
    Dataset.observe (r6): the old read-back re-scanned the postings
    just written — including every blob byte for the size sum, i.e. a
    full re-read of the index — purely to build |chunk| manifest rows.
    Per-bucket conditional aggregates as observed metrics see exactly
    the rows the write commits (accumulator updates from failed or
    duplicate task attempts are not applied) at zero extra passes.
    Very large chunks fall back to the read-back rather than plant
    5·|chunk| metric expressions in the plan.
    """
    from pyspark.sql import Observation

    enc = _encode_tf_arrow(part, avgdl, k1, b, block_size, codec)
    obs = Observation() if len(chunk) <= 64 else None
    if obs is not None:
        exprs = []
        for bkt in chunk:
            cond = F.col("bucket") == bkt
            exprs += [
                F.count(F.when(cond, 1)).alias(f"t{bkt}"),
                F.sum(F.when(cond, F.col("df_part"))).alias(f"p{bkt}"),
                F.sum(F.when(cond, F.length("blob"))).alias(f"b{bkt}"),
                F.min(F.when(cond, F.col("term"))).alias(f"lo{bkt}"),
                F.max(F.when(cond, F.col("term"))).alias(f"hi{bkt}"),
            ]
        enc = enc.observe(obs, *exprs)
    (enc.write.partitionBy("bucket").mode("overwrite")
     .option("partitionOverwriteMode", "dynamic")
     .parquet(p["postings"]))
    rows: list[tuple] = []
    if obs is not None:
        m = obs.get
        for bkt in chunk:
            rows.append((bkt,
                         int(m[f"t{bkt}"] or 0),
                         int(m[f"p{bkt}"] or 0),
                         int(m[f"b{bkt}"] or 0),
                         m[f"lo{bkt}"], m[f"hi{bkt}"],
                         chunk_id, "done"))
    else:
        written = (spark.read.parquet(p["postings"])
                   .where(F.col("bucket").isin(chunk))
                   .groupBy("bucket").agg(
                       F.count(F.lit(1)).alias("n_terms"),
                       F.sum("df_part").alias("n_postings"),
                       F.sum(F.length("blob")).alias("bytes"),
                       F.min("term").alias("term_min"),
                       F.max("term").alias("term_max"),
                   ).collect())
        by_b = {int(r["bucket"]): r for r in written}
        for bkt in chunk:
            r = by_b.get(bkt)
            rows.append((bkt,
                         int(r["n_terms"]) if r else 0,
                         int(r["n_postings"]) if r else 0,
                         int(r["bytes"]) if r else 0,
                         r["term_min"] if r else None,
                         r["term_max"] if r else None,
                         chunk_id, "done"))
    spark.createDataFrame(rows, _manifest_schema()) \
        .write.mode("append").parquet(p["manifest"])
    return rows


def plan_missing_buckets(spark: SparkSession, index_dir: str,
                         n_buckets: int) -> list[int]:
    """Lineage anti-join: buckets with no 'done' manifest row."""
    p = _paths(index_dir)
    done: set[int] = set()
    try:
        rows = (spark.read.parquet(p["manifest"])
                .where(F.col("status") == "done")
                .select("segment_id").distinct().collect())
        done = {int(r[0]) for r in rows}
    except Exception:
        pass
    return [bkt for bkt in range(n_buckets) if bkt not in done]


def build_index(
    spark: SparkSession,
    corpus: DataFrame,
    index_dir: str,
    *,
    n_buckets: int = DEFAULT_N_BUCKETS,
    n_doc_buckets: int | None = None,
    split_threshold: int = DEFAULT_SPLIT_THRESHOLD,
    chunk_size: int | None = None,
    block_size: int = BLOCK_SIZE,
    codec: str = "vb",
    stem: bool = False,
    stemmer: str = "porter",
    ascii_fold: bool = False,
    k1: float = K1,
    b: float = B,
    overwrite: bool = False,
) -> dict:
    """Build (or resume) the index; returns build metrics.

    ``chunk_size``: buckets per postings job — the resume checkpoint
    granularity. None = all missing buckets in one job (fastest).
    """
    t0 = time.time()
    p = _paths(index_dir)
    metrics: dict = {"resumed_stages": []}

    if overwrite:
        jvm = spark._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(index_dir)
        fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
        if fs.exists(hpath):
            fs.delete(hpath, True)

    # ---- stage 1: docs table (doc_id + sha) -------------------------------
    if not _exists(spark, p["docs"]):
        docs = assign_doc_ids(corpus, n_doc_buckets)
        # un-collapse the doc-id window's partitioning before the sha2
        # pass + write (few doc buckets ⇒ few partitions — the round-3
        # single-partition-window pitfall); also spreads docs/ across
        # enough files that later scans of it parallelize without help.
        # Gated on the bucket-count hint, not fan_out's partition probe:
        # probing (.rdd) a post-exchange AQE plan materializes its
        # upstream stages eagerly. A derived bucket count is ≥ 32 and
        # grows with the corpus, so at scale this is a no-op.
        par = spark.sparkContext.defaultParallelism
        if (n_doc_buckets if n_doc_buckets is not None else 32) < par:
            docs = docs.repartition(par)
        docs = (
            docs.withColumn("sha", F.sha2(F.col("content"), 256))
            .select("doc_id", "docno", "repo", "path", "commit", "lang",
                    "content", "sha")
        )
        docs.write.mode("overwrite").parquet(p["docs"])
    else:
        metrics["resumed_stages"].append("docs")
    docs = spark.read.parquet(p["docs"])
    t_docs = time.time()

    # ---- stage 2: tf table, salted + bucketed (checkpoint 1) --------------
    # gate on BOTH stage outputs: the stage writes tf/ then termstats/,
    # and a crash between the two commits must re-run the stage (both
    # writes are mode('overwrite'), so re-running is idempotent)
    if not (_exists(spark, p["tf"]) and _exists(spark, p["termstats"])):
        # single tokenize pass. Default tokenizer is the pure-Catalyst
        # column (whole-stage codegen, zero Python): measured 2-3×
        # faster AND core-scalable vs the pandas UDF, whose Arrow
        # return of ~token-count strings dominates its profile (and a
        # struct<term,tf> return was 10× worse still). The pandas-UDF
        # variant (identical semantics — tested 3-way vs DuckDB) is
        # used when stemming is on; both are SURVEY.md §2.3 T1-T5.
        if stem:
            tok = tokenize_pandas_udf(stem=True, ascii_fold=ascii_fold,
                                      stemmer=stemmer)
            tokens = tok(F.col("content"))
        else:
            tokens = tokens_col(F.col("content"), ascii_fold=ascii_fold)
        from .session import fan_out

        # the tokenize+explode map side dominates the stage (r6: 6-8 s
        # of a ~10 s build at sf1.0) — never let it serialize on a
        # handful of input splits
        toks = (fan_out(docs)
                .select("doc_id", tokens.alias("tokens"))
                .select("doc_id",
                        F.size("tokens").cast("long").alias("dl"),
                        F.explode("tokens").alias("term")))
        # persist: feeds the df-stats broadcast, the salted tf write AND
        # the termstats write — without it the tokenize subtree runs 3×.
        tf_agg = toks.groupBy("term", "doc_id", "dl").agg(
            F.count(F.lit(1)).alias("tf")).persist()
        dfstats = tf_agg.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
        head = (dfstats.where(F.col("df") > split_threshold)
                .withColumn("n_splits",
                            F.ceil(F.col("df") / F.lit(split_threshold))
                            .cast("int"))
                .select("term", "n_splits"))
        tf = (
            tf_agg.join(F.broadcast(head), "term", "left")
            .withColumn("salt",
                        F.when(F.col("n_splits").isNull(), F.lit(0))
                        .otherwise(F.pmod(F.col("doc_id"), F.col("n_splits"))
                                   .cast("int")))
            .withColumn("bucket",
                        F.pmod(F.xxhash64("term"), F.lit(n_buckets))
                        .cast("int"))
            .select("bucket", "term", "salt", "doc_id", "tf", "dl")
        )
        # the consumers of the persisted aggregate are independent
        # jobs — overlap them so the tails of one back-fill the
        # executors of the others (guide §2.6); BlockManager's
        # per-block locks make the concurrent first-touch of the cache
        # compute each partition once. On a fresh unchunked build the
        # POSTINGS ENCODE joins the same pool (r6): it consumes
        # exactly the rows the tf write persists, so it can encode
        # from the in-memory aggregate — skipping the tf parquet
        # re-read — while the tf/termstats writes drain. Crash safety
        # is unchanged: a partial run re-enters stage 2 (idempotent
        # overwrite of the SAME deterministic rows), and
        # plan_missing_buckets still skips any manifested bucket.
        from concurrent.futures import ThreadPoolExecutor

        fuse_postings = (
            chunk_size is None and not _exists(spark, p["stats"])
            and len(plan_missing_buckets(spark, index_dir, n_buckets))
            == n_buckets)
        _fused_nd = None
        _fused_rows: list[tuple] = []
        with ThreadPoolExecutor(max_workers=4) as pool:
            f_tf = pool.submit(
                lambda: tf.write.mode("overwrite")
                .partitionBy("bucket").parquet(p["tf"]))
            f_ts = pool.submit(
                write_sorted_termstats,
                dfstats.withColumn(
                    "bucket", F.pmod(F.xxhash64("term"),
                                     F.lit(n_buckets)).cast("int")),
                p["termstats"], n_buckets)
            # total-token count off the still-persisted aggregate:
            # saves stage 3 a re-read of the tf parquet it just wrote
            f_sum = pool.submit(
                lambda: int(tf_agg.agg(F.sum("tf")).collect()[0][0]
                            or 0))
            f_enc = None
            if fuse_postings:
                def _enc_job():
                    total = f_sum.result()
                    nd = docs.count()
                    return nd, _encode_and_manifest(
                        spark, p, tf, list(range(n_buckets)), 0,
                        total / max(nd, 1), k1, b, block_size, codec)
                f_enc = pool.submit(_enc_job)
            f_tf.result()
            f_ts.result()
            _fresh_tokens = f_sum.result()
            if f_enc is not None:
                _fused_nd, _fused_rows = f_enc.result()
        tf_agg.unpersist()
    else:
        metrics["resumed_stages"].append("tf")
        _fresh_tokens = None
        _fused_nd = None
        _fused_rows = []
    t_tf = time.time()

    # ---- stage 3: global stats -------------------------------------------
    if not _exists(spark, p["stats"]):
        n_docs = _fused_nd if _fused_nd is not None else docs.count()
        if _fresh_tokens is not None:
            total_tokens = _fresh_tokens
        else:
            tok_agg = spark.read.parquet(p["tf"]).agg(
                F.sum("tf").alias("total_tokens")).collect()[0]
            total_tokens = int(tok_agg["total_tokens"] or 0)
        stats = {
            # avgdl over ALL docs (zero-token docs included), exact
            "n_docs": n_docs, "avgdl": total_tokens / max(n_docs, 1),
            "total_tokens": total_tokens,
            "n_buckets": n_buckets, "split_threshold": split_threshold,
            "block_size": block_size, "codec": codec,
            "k1": k1, "b": b, "stem": stem, "stemmer": stemmer,
            "ascii_fold": ascii_fold,
        }
        # the stats WRITE leaves the critical path (r6, guide §2.6):
        # stage 4 needs the VALUES (in hand), not the file, and a crash
        # before the write commits simply re-runs this stage on resume
        # (idempotent overwrite; plan_missing_buckets still skips any
        # manifested buckets). Joined right after stage 4's jobs.
        from concurrent.futures import ThreadPoolExecutor as _TPE

        _stats_pool = _TPE(max_workers=1)
        _stats_f = _stats_pool.submit(
            lambda: spark.createDataFrame([json.dumps(stats)], "string")
            .toDF("stats_json").write.mode("overwrite")
            .parquet(p["stats"]))
    else:
        metrics["resumed_stages"].append("stats")
        stats = None
        _stats_f = _stats_pool = None
    if stats is None:
        # resumed: recover the frozen stats from disk; a fresh build
        # just wrote the dict it already holds (skip the read-back job)
        stats = load_stats(spark, index_dir)
    t_stats = time.time()

    # ---- stage 4: postings encode, chunked + manifested (checkpoint 2) ----
    fresh_rows: list[tuple] = []
    if _fused_rows:
        # the encode already ran inside stage 2's job pool (fresh
        # unchunked build) — nothing left to plan
        metrics["buckets_resumed"] = 0
        fresh_rows = _fused_rows
    else:
        missing = plan_missing_buckets(spark, index_dir, n_buckets)
        metrics["buckets_resumed"] = n_buckets - len(missing)
        if missing:
            step = chunk_size or len(missing)
            tf_all = spark.read.parquet(p["tf"])
            for ci in range(0, len(missing), step):
                chunk = missing[ci:ci + step]
                fresh_rows += _encode_and_manifest(
                    spark, p, tf_all.where(F.col("bucket").isin(chunk)),
                    chunk, ci // step, stats["avgdl"], k1, b,
                    block_size, stats.get("codec", "vb"))
    if _stats_f is not None:
        _stats_f.result()   # surface a failed stats write loudly
        _stats_pool.shutdown()
    t_post = time.time()

    if metrics["buckets_resumed"] == 0 and len(fresh_rows) == n_buckets:
        # fully fresh build: the totals are the rows just manifested —
        # skip the manifest read-back job (r6). Any resumed bucket means
        # prior rows exist on disk; aggregate those instead.
        tot = (sum(r[2] for r in fresh_rows),
               sum(r[3] for r in fresh_rows),
               sum(r[1] for r in fresh_rows))
    else:
        man = spark.read.parquet(p["manifest"])
        tot = man.agg(F.sum("n_postings"), F.sum("bytes"),
                      F.sum("n_terms")).collect()[0]
    metrics.update({
        "n_docs": stats["n_docs"],
        "total_tokens": stats["total_tokens"],
        "avgdl": stats["avgdl"],
        "n_postings": int(tot[0] or 0),
        "index_bytes": int(tot[1] or 0),
        "n_term_segments": int(tot[2] or 0),
        "sec_docs": t_docs - t0,
        "sec_tf": t_tf - t_docs,
        "sec_stats": t_stats - t_tf,
        "sec_postings": t_post - t_stats,
        "sec_total": t_post - t0,
        "docs_per_sec": stats["n_docs"] / max(t_post - t0, 1e-9),
    })
    return metrics


RESHARD_MARKER = "_RESHARD_IN_PROGRESS"


def _marker_fs(spark: SparkSession, index_dir: str):
    jvm = spark._jvm
    hp = jvm.org.apache.hadoop.fs.Path(f"{index_dir}/{RESHARD_MARKER}")
    return hp.getFileSystem(spark._jsc.hadoopConfiguration()), hp


def reshard_in_progress(spark: SparkSession, index_dir: str) -> bool:
    fs, hp = _marker_fs(spark, index_dir)
    return fs.exists(hp)


def load_stats(spark: SparkSession, index_dir: str,
               allow_reshard_in_progress: bool = False) -> dict:
    """Load the index's global stats. Refuses to load while a reshard
    marker is present (ADVICE r3): reshard's four rename-aside swaps
    are not atomic as a group, so a crash mid-sequence can leave data
    partitioned at new_n while stats still read old_n — term-bucket
    pruning would then scan the wrong partitions and silently return
    missing rows. Re-running ``reshard_index`` completes the swaps
    idempotently and clears the marker."""
    if not allow_reshard_in_progress and \
            reshard_in_progress(spark, index_dir):
        raise RuntimeError(
            f"index at {index_dir} has an interrupted reshard "
            f"({RESHARD_MARKER} present): bucket partitioning and "
            "stats.n_buckets may disagree. Re-run reshard_index(...) "
            "to complete the swaps before loading.")
    row = spark.read.parquet(_paths(index_dir)["stats"]).collect()[0]
    return json.loads(row["stats_json"])


# Derived dictionary/position sidecars are VIEWS of docs/tf/termstats;
# any lifecycle op that rewrites those tables must drop them so the
# next build_positions / build_term_trigrams call rebuilds from the
# current state (both builders are idempotent and _SUCCESS-gated).
# Pure DELETES (tombstones) do NOT invalidate: every sidecar consumer
# applies the live-docs mask at query time.
SIDECAR_DIRS = ("positions", "term_trigrams")


def invalidate_sidecars(spark: SparkSession, index_dir: str) -> list[str]:
    """Drop stale derived sidecars after a base-table rewrite.
    Returns the list of paths actually removed."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    removed = []
    for d in SIDECAR_DIRS:
        path = f"{index_dir}/{d}"
        hp = jvm.org.apache.hadoop.fs.Path(path)
        fs = hp.getFileSystem(conf)
        if fs.exists(hp):
            fs.delete(hp, True)
            removed.append(path)
    return removed


def reshard_index(spark: SparkSession, index_dir: str,
                  new_n_buckets: int) -> dict:
    """Change the index's term-bucket count in place — the ES
    shrink/split API analog (reference users get shard-count changes
    from the ES/Lucene stack; here the term hash-bucket IS the shard
    key). The bucket is a PHYSICAL partition key only: posting blobs
    are per (term, salt) and carry no bucket dependence, so resharding
    is a pure partition-column rewrite — re-hash, repartition, swap —
    with NO posting decode/re-encode anywhere. Scale story: retuning
    bucket count for a grown corpus costs one shuffle of the postings
    bytes, not a rebuild.

    Contract mirrors purge_deleted: delta segments must be compacted
    first (their rows carry the OLD bucket hash); tombstones are
    doc-level and survive untouched; the positional/trigram sidecars
    are bucket-partitioned views and are invalidated (next build picks
    up the new count from stats). The manifest keeps recording the
    ORIGINAL build's lineage (resume is a build-time concern).
    """
    from .streaming import _has_deltas, _swap_dirs

    if _has_deltas(spark, index_dir):
        raise ValueError(
            "reshard_index: delta segments present — run compact_deltas "
            "first (delta rows carry the old bucket hash)")
    p = _paths(index_dir)
    stats = load_stats(spark, index_dir, allow_reshard_in_progress=True)
    new_n = int(new_n_buckets)
    if new_n < 1:
        raise ValueError("new_n_buckets must be >= 1")
    old_n = int(stats["n_buckets"])
    fs, marker = _marker_fs(spark, index_dir)
    if new_n == old_n:
        # marker present + stats already at new_n ⇒ the interrupted
        # run completed every swap including stats; only the marker
        # delete was lost — finish it here so the index loads again
        if fs.exists(marker):
            fs.delete(marker, False)
            return {"resharded": True, "n_buckets": new_n,
                    "resumed": True}
        return {"resharded": False, "n_buckets": old_n}
    nb = F.pmod(F.xxhash64("term"), F.lit(new_n)).cast("int")

    # reshard-in-progress marker BEFORE the first swap (ADVICE r3):
    # the four rename-aside swaps are not atomic as a group — a crash
    # after the postings/tf/termstats swaps but before the stats swap
    # leaves data partitioned at new_n while stats.n_buckets reads
    # old_n, so bucket pruning scans the wrong partitions. load_stats
    # refuses while the marker exists; re-running reshard_index
    # completes the (idempotent, key-only) rewrite and clears it.
    fs.createNewFile(marker)

    # drop derived sidecars BEFORE any swap: a crash after the stats
    # swap but before a trailing invalidation would leave an old-
    # bucket-partitioned positions/trigram table that the _SUCCESS
    # gate treats as valid forever, silently missing matches under
    # the new bucket pruning (review catch). Invalidating first is
    # crash-safe in both directions — sidecars rebuild on demand.
    invalidate_sidecars(spark, index_dir)

    post = spark.read.parquet(p["postings"]).drop("bucket") \
        .withColumn("bucket", nb)
    tmp = f"{index_dir}/postings_reshard_tmp"
    post.repartition(new_n, "bucket").write.mode("overwrite") \
        .partitionBy("bucket").parquet(tmp)
    _swap_dirs(spark, p["postings"], tmp)

    tf = spark.read.parquet(p["tf"]).drop("bucket").withColumn("bucket", nb)
    tmp = f"{index_dir}/tf_reshard_tmp"
    tf.repartition(new_n, "bucket").write.mode("overwrite") \
        .partitionBy("bucket").parquet(tmp)
    _swap_dirs(spark, p["tf"], tmp)

    ts = spark.read.parquet(p["termstats"]).drop("bucket") \
        .withColumn("bucket", nb)
    tmp = f"{index_dir}/termstats_reshard_tmp"
    write_sorted_termstats(ts, tmp, new_n)
    _swap_dirs(spark, p["termstats"], tmp)

    stats["n_buckets"] = new_n
    tmp = f"{index_dir}/stats_reshard_tmp"
    spark.createDataFrame([json.dumps(stats)], "string") \
        .toDF("stats_json").write.mode("overwrite").parquet(tmp)
    _swap_dirs(spark, p["stats"], tmp)
    fs.delete(marker, False)   # all swaps complete: the index is whole
    return {"resharded": True, "n_buckets": new_n, "was": old_n}
