"""Document deletes: tombstones + physical purge.

Lucene analogs: ``IndexWriter.deleteDocuments`` marks docs in a
liveDocs bitset and every search skips them; segments keep the dead
postings until a merge (``forceMergeDeletes``) rewrites them out.
Here the liveDocs set is a tiny ``tombstones/`` parquet under the
index dir (append-only — each delete batch is one file), the query
paths anti-join it (broadcast — the set is small by design between
purges), and :func:`purge_deleted` is the merge: decode → drop dead
docIDs → re-encode per (bucket, term), then refresh docs/tf/termstats
and the global stats, exactly like Lucene's merge recomputing segment
stats. Scoring BETWEEN delete and purge intentionally keeps the old
df/avgdl (Lucene behaves the same way: deleted docs still count in
collection statistics until their segments merge).

At web scale the tombstone set between purges stays bounded (purge
when it grows past a few % of the corpus); the purge itself is an
embarrassingly parallel per-(bucket, term) rewrite — the same shape
as the streaming compaction (engine/streaming.py:compact_deltas).
"""

from __future__ import annotations

import json
import time
from typing import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
import pyspark.sql.types as T


def _tomb_dir(index_dir: str) -> str:
    return f"{index_dir}/tombstones"


def delete_docs(spark: SparkSession, index_dir: str,
                doc_ids: Sequence[int] | DataFrame) -> int:
    """Tombstone the given doc_ids (append-only; idempotent on purge —
    duplicates across batches are fine, the readers distinct()).
    Returns the number of ids written in this batch."""
    if isinstance(doc_ids, DataFrame):
        df = doc_ids.select(F.col("doc_id").cast("long"))
    else:
        df = spark.createDataFrame([(int(d),) for d in doc_ids],
                                   "doc_id long")
    df.write.mode("append").parquet(_tomb_dir(index_dir))
    return df.count()


def load_tombstones(spark: SparkSession, index_dir: str) -> DataFrame | None:
    """The distinct tombstoned doc_ids, or None if none exist."""
    from .index_build import _exists

    if not _exists(spark, _tomb_dir(index_dir)):
        return None
    return spark.read.parquet(_tomb_dir(index_dir)) \
        .select("doc_id").distinct()


def update_docs(spark: SparkSession, index_dir: str,
                new_docs: DataFrame) -> dict:
    """``IndexWriter.updateDocument`` analog — delete-then-add: each
    incoming corpus row (repo, path, commit, lang, content) REPLACES
    the live document with the same docno (repo/path identity); a
    docno not yet in the index is a plain add. The old internal
    doc_id is tombstoned (liveDocs hides it in every query path) and
    the new content is appended under a FRESH doc_id as a delta
    posting segment (the NRT-flush shape, engine/streaming.py) plus
    docs/tf rows — exactly Lucene's scheme, where an update is a
    delete plus a re-add under a new internal docID.

    Search through :func:`engine.streaming.nrt_index` to see updates
    pre-compaction; run ``compact_deltas`` then :func:`purge_deleted`
    to fold the delta in and physically reclaim the dead postings.
    Collection stats stay frozen until then (Lucene NRT semantics).
    doc_id assignment uses a single small window over the incoming
    batch — updates are incremental batches by design; bulk loads go
    through the batch builder's distributed assignment."""
    from pyspark.sql import Window

    from .index_build import _paths, load_stats
    from .postings import BLOCK_SIZE as _BS
    from .streaming import (_has_deltas, delta_segment_writer,
                            read_delta_postings)

    p = _paths(index_dir)
    stats = load_stats(spark, index_dir)
    docs = spark.read.parquet(p["docs"])
    incoming = new_docs.withColumn("docno",
                                   F.concat_ws("/", "repo", "path"))
    old = (docs.join(F.broadcast(incoming.select("docno").distinct()),
                     "docno", "left_semi").select("doc_id"))
    n_old = delete_docs(spark, index_dir, old)
    max_id = int(docs.agg(F.max("doc_id")).collect()[0][0] or 0)
    w = Window.orderBy("docno")
    # the global row_number window collapses the batch to ONE
    # partition — repartition straight after, or the downstream
    # tokenize/explode/agg chain runs in a single task (OOM'd on a
    # 500-doc TREC batch with large documents; caught by
    # tools/bench_lifecycle.py)
    par = spark.sparkContext.defaultParallelism
    # cast to LONG: the base docs/tf tables store doc_id as int64 and
    # lit+row_number is int32 — appending int32 files into the same
    # parquet dir makes later reads fail with a physical-type mismatch
    # (hit by the real-corpus lifecycle bench; invisible at test scale)
    assigned = (incoming.withColumn(
        "doc_id", (F.lit(max_id) + F.row_number().over(w)).cast("long"))
        .repartition(par, "doc_id").persist())
    epoch = 0
    if _has_deltas(spark, index_dir):
        prev = read_delta_postings(spark, index_dir) \
            .agg(F.max("delta")).collect()[0][0]
        epoch = int(prev if prev is not None else -1) + 1
    stem = bool(stats.get("stem"))
    stemmer = stats.get("stemmer", "porter")
    fold = bool(stats.get("ascii_fold"))
    writer = delta_segment_writer(index_dir, stats["avgdl"],
                                  int(stats["n_buckets"]), stats["k1"],
                                  stats["b"],
                                  stats.get("block_size", _BS),
                                  stem=stem, stemmer=stemmer,
                                  ascii_fold=fold)
    # invalidate the derived positional/trigram sidecars BEFORE the
    # first destructive write (ADVICE r3): a crash between the docs/tf
    # appends and a trailing invalidation would leave a stale
    # _SUCCESS-gated sidecar that silently misses the updated content
    # forever; invalidate-first is crash-safe in both directions (the
    # same ordering reshard_index uses). They rebuild on next use.
    from .index_build import invalidate_sidecars
    invalidate_sidecars(spark, index_dir)
    writer(assigned, epoch)
    # docs + tf rows for the new ids (tf keeps purge's stats refresh
    # and the forward lookups consistent with the delta postings)
    (assigned.withColumn("sha", F.sha2(F.col("content"), 256))
     .select("doc_id", "docno", "repo", "path", "commit", "lang",
             "content", "sha")
     .write.mode("append").parquet(p["docs"]))
    from .analysis import tokenize_pandas_udf
    tok = tokenize_pandas_udf(stem=stem, stemmer=stemmer, ascii_fold=fold)
    # tokenize once, then size+explode (see delta_segment_writer: the
    # one-select form re-evaluates the UDF per exploded row)
    toks = (assigned
            .select("doc_id", tok(F.col("content")).alias("tokens"))
            .select("doc_id",
                    F.size("tokens").cast("long").alias("dl"),
                    F.explode("tokens").alias("term")))
    tf = (toks.groupBy("term", "doc_id", "dl")
          .agg(F.count(F.lit(1)).alias("tf"))
          .withColumn("salt", F.lit(0).cast("int"))
          .withColumn("bucket",
                      F.pmod(F.xxhash64("term"),
                             F.lit(int(stats["n_buckets"]))).cast("int"))
          .select("bucket", "term", "salt", "doc_id", "tf", "dl"))
    tf.write.mode("append").partitionBy("bucket").parquet(p["tf"])
    n_new = assigned.count()
    assigned.unpersist()
    return {"replaced": n_old, "added": n_new, "epoch": epoch}


def purge_deleted(spark: SparkSession, index_dir: str,
                  selective: bool = True) -> dict:
    """Physically rewrite the index without the tombstoned docs
    (forceMergeDeletes): per-(bucket, term, salt) decode → mask →
    re-encode (sub-postings left with zero postings are dropped), then
    docs/tf tables filtered, termstats recomputed from the new
    postings, and the global stats (n_docs, total_tokens, avgdl)
    refreshed. Grouping keeps the build's skew-split salts: each
    sub-posting of a head term is masked in its own task (never one
    merged driver-scale group), and WAND task sizing survives purge.

    ``selective`` (default, VERDICT r3 item 3): only the (bucket,
    term) groups that actually CONTAIN a dead posting — enumerated by
    one equi-join of the tombstones against the forward ``tf`` table —
    go through the Python decode→mask→re-encode; every clean group's
    blob streams through unchanged columnar IO. Matching is on
    (bucket, term), NOT (bucket, term, salt): compact_deltas merges a
    dirty term's salts into salt=0 while tf keeps the build-lineage
    salts, so salt-level matching would silently miss compacted
    groups (and a head term with any dirty salt has every salt dirty
    at realistic delete fractions anyway — the savings live in the
    salt-less tail). The
    decode cost therefore scales with the affected-postings volume
    (at small delete fractions the long tail of rare terms — most
    groups — skips the decoder entirely), not with index size.
    Clean groups keep bounds baked under the OLD avgdl; that stays
    WAND-sound by rescaling ``block_max_w`` by
    ``max(1, avgdl_new/avgdl_old)``: w = tf/(tf + k1(1−b+b·dl/avgdl))
    — if avgdl shrinks, every new w is ≤ the old w (old bounds still
    dominate); if avgdl grows by factor s, w grows by < s (the
    denominator shrinks by at most s), so the scaled bound dominates.
    LMD/IB bounds derive from block_max_tf at query time and carry no
    avgdl dependence. The affected list broadcasts — bounded by the
    purge policy (tombstones stay a few %% of the corpus between
    purges), the same bound the tombstone broadcast itself relies on.
    Delta segments keep the full mask (they are small by design —
    incremental batches that compaction folds in).

    Delta posting segments (streamed epochs / update_docs re-adds,
    engine/streaming.py) are masked too, re-encoded under the POST-
    purge avgdl like the base postings — without this a tombstoned doc
    whose postings live in a delta would be resurrected in nrt_index
    searches once the tombstones clear.

    Directory swaps are rename-aside (same recipe as compact_deltas)
    so every crash point leaves a live directory; the tombstones are
    cleared LAST, so re-running purge_deleted after any crash is
    idempotent (masking already-purged postings is a no-op) and
    completes the remaining swaps. Returns purge metrics."""
    from .index_build import _ENC_SCHEMA, _paths, load_stats
    from .postings import BLOCK_SIZE as _BS
    from .postings import decode_postings, encode_postings
    from .streaming import _has_deltas, _swap_dirs

    t0 = time.time()
    tomb = load_tombstones(spark, index_dir)
    if tomb is None:
        return {"purged": 0, "sec": 0.0}
    dead = {int(r["doc_id"]) for r in tomb.collect()}
    if not dead:
        return {"purged": 0, "sec": 0.0}
    p = _paths(index_dir)
    stats = load_stats(spark, index_dir)
    k1, b = stats["k1"], stats["b"]
    codec = stats.get("codec", "vb")
    bs = stats.get("block_size", _BS)
    # NEW stats first: the re-encode must bake the post-purge avgdl
    # into the block-max bounds, or WAND pruning under the new avgdl
    # could skip blocks whose true scores exceed the stale bounds
    n_docs = (spark.read.parquet(p["docs"])
              .join(F.broadcast(tomb), "doc_id", "left_anti").count())
    tok = (spark.read.parquet(p["tf"])
           .join(F.broadcast(tomb), "doc_id", "left_anti")
           .agg(F.sum("tf").alias("t")).collect()[0]["t"])
    total_tokens = int(tok or 0)
    avgdl = total_tokens / max(n_docs, 1)
    dead_b = spark.sparkContext.broadcast(np.array(sorted(dead),
                                                   dtype=np.int64))

    def _mask_reencode(bucket: int, term: str, salt: int,
                       blobs) -> pd.DataFrame:
        empty = pd.DataFrame({
            c: pd.Series([], dtype=object)
            for c in ("term", "salt", "df_part", "blob", "block_last",
                      "block_max_tf", "block_max_w", "block_off",
                      "bucket")})
        ds, ts, ls = [], [], []
        for blob in blobs:
            d, t, dl = decode_postings(bytes(blob))
            ds.append(d), ts.append(t), ls.append(dl)
        d = np.concatenate(ds)
        t = np.concatenate(ts)
        dl = np.concatenate(ls)
        order = np.argsort(d, kind="stable")
        d, t, dl = d[order], t[order], dl[order]
        keep = ~np.isin(d, dead_b.value)
        d, t, dl = d[keep], t[keep], dl[keep]
        if d.size == 0:   # every posting of this sub-list was deleted
            return empty
        blob, last, mtf, mw, off = encode_postings(d, t, dl, avgdl, k1, b,
                                                   bs, codec)
        return pd.DataFrame({
            "term": [term], "salt": [int(salt)], "df_part": [int(d.size)],
            "blob": [blob], "block_last": [last.tolist()],
            "block_max_tf": [mtf.tolist()], "block_max_w": [mw.tolist()],
            "block_off": [off.tolist()],
            "bucket": [bucket],
        })

    def rewrite_group(key, pdf: pd.DataFrame) -> pd.DataFrame:
        # (bucket, term, salt) group: each skew-split sub-posting is
        # masked independently and keeps its salt (ADVICE r2: a merged
        # (bucket, term) group would fold a head term's split back
        # into one driver-scale task and lose the split forever)
        return _mask_reencode(int(key[0]), key[1], int(key[2]),
                              pdf["blob"])

    post = spark.read.parquet(p["postings"])
    n_groups_rewritten = None
    if selective:
        avgdl_old = float(stats["avgdl"])
        # dirty flag deliberately IGNORES salt (the docstring's
        # invariant): tf keeps build-lineage salts while
        # compact_deltas collapses a dirty term's postings to salt=0,
        # so a (bucket, term, salt) join would miss the compacted
        # group and stream a dead posting through as "clean" — the
        # deleted doc resurrects (regression:
        # test_selective_purge_after_compact_salt_collapse)
        affected = (spark.read.parquet(p["tf"])
                    .join(F.broadcast(tomb), "doc_id", "left_semi")
                    .select("bucket", "term").distinct()
                    .withColumn("dirty", F.lit(True))
                    .persist())
        n_groups_rewritten = affected.count()   # materialize once
        flagged = post.join(F.broadcast(affected),
                            ["bucket", "term"], "left")
        dirty = flagged.where(F.col("dirty")).drop("dirty")
        scale = max(1.0, avgdl / max(avgdl_old, 1e-12))
        clean = (flagged.where(F.col("dirty").isNull()).drop("dirty")
                 .withColumn("block_max_w",
                             F.transform("block_max_w",
                                         lambda x: x * F.lit(scale))))
        masked_dirty = (dirty.groupBy("bucket", "term", "salt")
                        .applyInPandas(rewrite_group, schema=_ENC_SCHEMA))
        rewritten = masked_dirty.unionByName(
            clean.select(*[f.name for f in _ENC_SCHEMA.fields]))
    else:
        rewritten = (post.groupBy("bucket", "term", "salt")
                     .applyInPandas(rewrite_group, schema=_ENC_SCHEMA))
    tmp = f"{index_dir}/postings_purge_tmp"
    rewritten.write.mode("overwrite").partitionBy("bucket").parquet(tmp)
    if selective:
        affected.unpersist()
    # invalidate the derived positional/trigram sidecars BEFORE the
    # first swap (ADVICE r3): a crash after any base-table swap but
    # before a trailing invalidation leaves a stale _SUCCESS-gated
    # sidecar that keeps returning purged docs' anchors forever;
    # invalidate-first is crash-safe both ways (reshard's ordering)
    from .index_build import invalidate_sidecars
    invalidate_sidecars(spark, index_dir)
    _swap_dirs(spark, p["postings"], tmp)

    # delta segments (streamed epochs / update re-adds) hold postings
    # too — mask them or purged docs resurrect in nrt_index once the
    # tombstones clear. Re-encoded under the NEW avgdl so their
    # block-max bounds stay sound beside the rewritten base.
    if _has_deltas(spark, index_dir):
        _DELTA_SCHEMA = T.StructType(
            list(_ENC_SCHEMA.fields)
            + [T.StructField("delta", T.LongType())])
        dp = spark.read.parquet(f"{index_dir}/delta_postings")
        delta_type = dict(dp.dtypes)["delta"]

        def rewrite_delta(key, pdf: pd.DataFrame) -> pd.DataFrame:
            out = _mask_reencode(int(key[1]), key[2], int(key[3]),
                                 pdf["blob"])
            out["delta"] = pd.Series([int(key[0])] * len(out),
                                     dtype=object)
            return out

        masked = (dp.groupBy("delta", "bucket", "term", "salt")
                  .applyInPandas(rewrite_delta, schema=_DELTA_SCHEMA)
                  .withColumn("delta", F.col("delta").cast(delta_type)))
        d_tmp = f"{index_dir}/delta_postings_purge_tmp"
        masked.write.mode("overwrite").partitionBy("delta", "bucket") \
            .parquet(d_tmp)
        jvm = spark._jvm
        conf = spark._jsc.hadoopConfiguration()
        fs = jvm.org.apache.hadoop.fs.Path(d_tmp).getFileSystem(conf)
        it = fs.listFiles(jvm.org.apache.hadoop.fs.Path(d_tmp), True)
        has_rows = False
        while it.hasNext():
            if it.next().getPath().getName().endswith(".parquet"):
                has_rows = True
                break
        live_delta = f"{index_dir}/delta_postings"
        if has_rows:
            _swap_dirs(spark, live_delta, d_tmp)
        else:
            # every delta posting was purged: an empty parquet dir is
            # unreadable (no schema), so drop the segments entirely
            fs.delete(jvm.org.apache.hadoop.fs.Path(live_delta), True)
            fs.delete(jvm.org.apache.hadoop.fs.Path(d_tmp), True)

    # docs and tf tables drop the dead rows (broadcast anti-join);
    # tf keeps its bucket partitioning (the forward-lookup readers
    # and any future resume scan expect the partitioned layout)
    for name, part in (("docs", None), ("tf", "bucket")):
        src = spark.read.parquet(p[name])
        out = src.join(F.broadcast(tomb), "doc_id", "left_anti")
        t_dir = f"{index_dir}/{name}_purge_tmp"
        w = out.write.mode("overwrite")
        (w.partitionBy(part) if part else w).parquet(t_dir)
        _swap_dirs(spark, p[name], t_dir)

    # termstats from the new postings (df = Σ df_part); sorted layout
    # preserved so dictionary-scan pruning survives the purge
    from .index_build import write_sorted_termstats
    ts_tmp = f"{index_dir}/termstats_purge_tmp"
    write_sorted_termstats(
        spark.read.parquet(p["postings"])
        .groupBy("term", "bucket").agg(F.sum("df_part").alias("df"))
        .select("term", "df", "bucket"),
        ts_tmp, int(stats.get("n_buckets", 8)))
    _swap_dirs(spark, p["termstats"], ts_tmp)

    # global stats refresh (the merge recomputes segment stats)
    stats.update({"n_docs": n_docs, "total_tokens": total_tokens,
                  "avgdl": avgdl})
    st_tmp = f"{index_dir}/stats_purge_tmp"
    spark.createDataFrame([json.dumps(stats)], "string") \
        .toDF("stats_json").write.mode("overwrite").parquet(st_tmp)
    _swap_dirs(spark, p["stats"], st_tmp)

    # clear the tombstones (their docs are physically gone now)
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    fs = jvm.org.apache.hadoop.fs.Path(index_dir).getFileSystem(conf)
    fs.delete(jvm.org.apache.hadoop.fs.Path(_tomb_dir(index_dir)), True)
    return {"purged": len(dead), "n_docs": n_docs,
            "total_tokens": total_tokens,
            "groups_rewritten": n_groups_rewritten,
            "sec": round(time.time() - t0, 2)}
