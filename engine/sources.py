"""TREC SGML corpus source (SURVEY.md §2.1 S2-S4, §2.2 P1-P5).

The reference parses four TREC collections (FBIS/FR94/FT/LATimes) with
one near-identical parser each (reference:
src/main/java/org/cs7is3/Parsers/{FT,FBIS,FR94,LATimes}Parser.java);
the only difference is which tag feeds TITLE (P4). This module is the
Spark-first equivalent: whole-file reads → per-file record split →
column-expression tag extraction, all Catalyst (scales to any corpus
directory; the reference buffers each sub-collection in driver RAM —
Indexer.java:60,70 — which we never do).

Semantics mirrored exactly:
* record split: ``split("(?s)(?=<DOC>)")`` (P1, FTParser.java:64-65).
  DIVERGENCE, deliberate: the reference then iterates from element 1
  (FTParser.java:65), assuming element 0 is a pre-<DOC> preamble — but
  Java's split produces no leading empty element for a zero-width
  match at position 0, and the real TREC files START with "<DOC>", so
  the reference silently drops the FIRST document of every file. We
  keep every element and let the empty-DOCNO filter (P5) discard
  genuine preamble fragments, which handles both file shapes
  correctly;
* tag extract: substring between the FIRST start tag and the NEXT end
  tag, '' if either missing (P2, FTParser.java:20-28) — expressed as a
  non-greedy DOTALL regexp_extract (equivalent because it anchors at
  the first start tag and stops at the earliest end tag);
* whitespace normalization: trim + newlines→space + collapse (P3);
* null-key filter: drop docs with empty DOCNO (P5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# P4: per-corpus TITLE tag (FTParser.java:68, FBISParser.java:65,
# FR94Parser.java:68, LATimesParser.java:65)
TITLE_TAG = {
    "ft": "HEADLINE",
    "fbis": "TI",
    "fr94": "PARENT",
    "latimes": "HEADLINE",
}


def _extract(col, tag: str):
    """P2+P3: first <TAG>…</TAG> body, whitespace-normalized, '' if
    missing. (?s) DOTALL + non-greedy = reference's indexOf semantics."""
    body = F.regexp_extract(col, f"(?s)<{tag}>(.*?)</{tag}>", 1)
    return F.trim(F.regexp_replace(body, r"\s+", " "))


def read_sgml_corpus(spark: SparkSession, path: str, corpus: str,
                     recursive: bool = True) -> DataFrame:
    """Directory of SGML files → (docno, title, text, src_file) rows.

    S2/S3 (flat or recursive scan, skipping readme files by name —
    FTParser.java:44-47) + S4 (whole-file read) + P1-P5.
    """
    reader = spark.read
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    # NB: wholetext must be the text() kwarg — a .option("wholetext",
    # "true") is silently IGNORED by DataFrameReader.text and the read
    # degrades to per-line rows (caught on the real TREC corpora:
    # DOCNOs are single-line so they still parsed, but every TEXT body
    # spanning lines came back empty)
    raw = (reader.text(path, wholetext=True)
           .withColumn("src_file", F.input_file_name())
           .where(~F.lower(F.element_at(F.split("src_file", "/"), -1))
                  .rlike("^read(me|chg)")))
    return parse_sgml(raw, corpus, text_col="value")


def parse_sgml(df: DataFrame, corpus: str, text_col: str = "value"
               ) -> DataFrame:
    """P1-P5 over whole-file strings already loaded as rows."""
    title_tag = TITLE_TAG[corpus.lower()]
    # P1: one file → N docs (all elements kept; see module docstring)
    docs = (df.select("*", F.explode(
                F.split(F.col(text_col), r"(?=<DOC>)")).alias("doc"))
            .drop(text_col))
    out = docs.select(
        "*",
        _extract(F.col("doc"), "DOCNO").alias("docno"),
        _extract(F.col("doc"), title_tag).alias("title"),
        _extract(F.col("doc"), "TEXT").alias("text"),
    ).drop("doc")
    # P5: null-key filter
    return out.where(F.length("docno") > 0)


CORPUS_COLUMNS = ("repo", "path", "commit", "lang", "content")


def read_corpus(spark: SparkSession, source: str) -> DataFrame:
    """Corpus source adapter (BASELINE.json input_hint): the corpus is
    an Iceberg-style CATALOG TABLE of (repo, path, commit, lang,
    content) in production — `spark.read.table("catalog.db.files")`,
    which is how Iceberg tables are addressed and gets us partition
    pruning / snapshot isolation for free — or a bare parquet path for
    local runs. Dispatch: anything containing a '/' (or existing on
    the local fs) is a path; otherwise a table identifier.

    Column pruning matters more than anything else here: callers
    select only CORPUS_COLUMNS so a wide production table scans five
    columns, not all of them.
    """
    import os

    if "/" in source or os.path.exists(source):
        df = spark.read.parquet(source)
    else:
        df = spark.read.table(source)
    return df.select(*CORPUS_COLUMNS)


def sgml_to_corpus(parsed: DataFrame, corpus: str) -> DataFrame:
    """Adapt parsed TREC docs to the engine's input_hint corpus schema:
    title and body concatenated into content (the engine's multi-field
    boosts are applied query-side via term weights, SURVEY.md §1.2)."""
    return parsed.select(
        F.lit(corpus).alias("repo"),
        F.col("docno").alias("path"),
        F.lit("-").alias("commit"),
        F.lit("en").alias("lang"),
        F.concat_ws(" ", "title", "text").alias("content"),
    )
