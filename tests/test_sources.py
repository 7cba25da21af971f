"""SGML source parsing (S2-S4, P1-P5) against synthetic TREC-format
files mirroring the reference corpora's structure."""

import pytest

from engine.sources import parse_sgml, read_sgml_corpus, sgml_to_corpus

FT_FILE = """
<DOC>
<DOCNO> FT911-1 </DOCNO>
<PROFILE>x</PROFILE>
<HEADLINE>
FT  Title   One
</HEADLINE>
<TEXT>
Body   of
document one.
</TEXT>
</DOC>
<DOC>
<DOCNO>FT911-2</DOCNO>
<HEADLINE>Second</HEADLINE>
<TEXT>Body two</TEXT>
</DOC>
<DOC>
<DOCNO></DOCNO>
<HEADLINE>No key</HEADLINE>
<TEXT>dropped</TEXT>
</DOC>
<DOC>
<HEADLINE>Missing docno entirely</HEADLINE>
<TEXT>also dropped</TEXT>
</DOC>
"""

FBIS_FILE = """
<DOC>
<DOCNO> FBIS3-1 </DOCNO>
<TI>  FBIS   title </TI>
<TEXT>fbis body</TEXT>
</DOC>
"""


def test_parse_ft(spark):
    df = spark.createDataFrame([(FT_FILE,)], "value string")
    rows = {r["docno"]: r for r in parse_sgml(df, "ft").collect()}
    # P5: empty/missing DOCNO docs dropped
    assert set(rows) == {"FT911-1", "FT911-2"}
    # P2+P3: tag body extracted, whitespace collapsed, trimmed
    assert rows["FT911-1"]["title"] == "FT Title One"
    assert rows["FT911-1"]["text"] == "Body of document one."
    assert rows["FT911-2"]["title"] == "Second"


def test_parse_fbis_title_tag(spark):
    df = spark.createDataFrame([(FBIS_FILE,)], "value string")
    r = parse_sgml(df, "fbis").collect()[0]
    assert r["docno"] == "FBIS3-1"
    assert r["title"] == "FBIS title"  # <TI> is FBIS's title tag (P4)


def test_missing_tag_empty(spark):
    df = spark.createDataFrame(
        [("<DOC>\n<DOCNO>X1</DOCNO>\n<TEXT>t</TEXT>\n</DOC>",)],
        "value string")
    r = parse_sgml(df, "ft").collect()[0]
    assert r["title"] == ""  # missing <HEADLINE> → '' (P2)


def test_read_directory_skips_readmes(spark, tmp_path):
    d = tmp_path / "ft" / "sub"
    d.mkdir(parents=True)
    (d / "ft911_1").write_text(FT_FILE)
    (tmp_path / "ft" / "readmeft.txt").write_text("not a doc <DOC> x")
    (tmp_path / "ft" / "readchg.txt").write_text("changes <DOC> y")
    out = read_sgml_corpus(spark, str(tmp_path / "ft"), "ft")
    rows = {r["docno"]: r for r in out.collect()}
    assert sorted(rows) == ["FT911-1", "FT911-2"]
    # regression (real-corpus bug): the read must be whole-file — a
    # per-line read still extracts single-line DOCNOs but loses every
    # multi-line TEXT body, so assert the body came through intact
    assert rows["FT911-1"]["text"] == "Body of document one."
    assert rows["FT911-1"]["title"] == "FT Title One"


def test_sgml_to_corpus_and_index(spark, tmp_path):
    df = spark.createDataFrame([(FT_FILE,)], "value string")
    corpus = sgml_to_corpus(parse_sgml(df, "ft"), "ft")
    rows = {r["path"]: r for r in corpus.collect()}
    assert rows["FT911-1"]["content"] == "FT Title One Body of document one."
    # and it indexes + queries end-to-end
    from engine.index_build import build_index
    from engine.search import Index, score_exhaustive

    p = str(tmp_path / "sgml_idx")
    build_index(spark, corpus, p, n_buckets=2, n_doc_buckets=2)
    idx = Index(spark, p)
    res = score_exhaustive(idx, [("q", "body", 1.0)], 10).collect()
    assert len(res) == 2


def test_read_corpus_table_and_path(spark, tmp_path):
    """read_corpus dispatches between a parquet PATH and an
    Iceberg-style catalog TABLE name, and prunes to the corpus columns
    either way."""
    from engine.sources import CORPUS_COLUMNS, read_corpus

    rows = [("org/r1", "a.py", "c1", "python", "def f(): pass", 99)]
    df = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, "
              "content string, extra_col long")
    p = str(tmp_path / "corpus_pq")
    df.write.parquet(p)
    got = read_corpus(spark, p)
    assert tuple(got.columns) == CORPUS_COLUMNS   # extra_col pruned
    assert got.count() == 1

    df.createOrReplaceTempView("corpus_files")
    got_t = read_corpus(spark, "corpus_files")
    assert tuple(got_t.columns) == CORPUS_COLUMNS
    assert got_t.collect() == got.collect()
