"""Tokenizer spec tests (SURVEY.md §2.3 T1-T5) + three-way equivalence
of the pandas UDF / Catalyst column / DuckDB SQL implementations."""

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from engine.analysis import (
    FOLD_DST, FOLD_SRC, STOPWORDS, duckdb_clean_sql, duckdb_stoplist_sql,
    kstem, porter_stem, tokenize_pandas_udf, tokenize_texts, tokens_col,
)

CASES = {
    "getUserName": ["get", "user", "name"],
    "parse_doc_count": ["parse", "doc", "count"],
    "HTTPServer2": ["http", "server2"],
    "utf8Decoder": ["utf8", "decoder"],
    "the Parser's edge-case": ["parser", "edge", "case"],
    "The QUICK brown fox, and the dog.": ["quick", "brown", "fox", "dog"],
    "foo->bar::baz(qux);": ["foo", "bar", "baz", "qux"],
    "": [],
    "AND OR NOT": [],  # stopwords after lowercasing
    "x = y + 42": ["x", "y", "42"],
}


def test_tokenize_cases():
    got = tokenize_texts(list(CASES.keys()))
    for (text, want), g in zip(CASES.items(), got):
        assert g == want, text


def test_stopword_set_is_lucene_33():
    assert len(STOPWORDS) == 33
    assert "the" in STOPWORDS and "with" in STOPWORDS


def test_porter_reference_cases():
    # classic published examples from Porter (1980)
    cases = {
        "caresses": "caress", "ponies": "poni", "cats": "cat",
        "feed": "feed", "agreed": "agre", "plastered": "plaster",
        "motoring": "motor", "sing": "sing", "conflated": "conflat",
        "happy": "happi", "relational": "relat", "rational": "ration",
        "digitizer": "digit", "operator": "oper",
        "probate": "probat", "controll": "control",
    }
    for w, want in cases.items():
        assert porter_stem(w) == want, w


def test_three_way_equivalence(spark):
    texts = list(CASES.keys()) + [
        "MixedCASE_and_snake mixedCase99Counter the quick's",
        "a1B2c3D4 __init__ FooBARBaz",
    ]
    pdf = pd.DataFrame({"i": range(len(texts)), "text": texts})
    sdf = spark.createDataFrame(pdf).orderBy("i")
    # 1: pandas UDF
    udf_out = [r[0] for r in
               sdf.select(tokenize_pandas_udf()("text")).collect()]
    # 2: Catalyst column
    col_out = [r[0] for r in sdf.select(tokens_col(F.col("text"))).collect()]
    # 3: DuckDB
    con = duckdb.connect()
    con.register("t", pdf)
    # per-row token lists, keeping empty rows
    duck = con.sql(f"""
      SELECT i, [x for x in regexp_split_to_array({duckdb_clean_sql('text')},
             '[^a-z0-9]+') if x <> '' and x not in {duckdb_stoplist_sql()}]
      FROM t ORDER BY i
    """).fetchall()
    duck_out = [list(r[1]) for r in duck]
    assert udf_out == col_out == duck_out


def test_kstem_hand_cases():
    """T7 — Krovetz-style conflation returns dictionary-looking words
    (unlike Porter: kstem('policies')=='policy', porter=='polici')."""
    cases = {
        "cats": "cat", "policies": "policy", "boxes": "box",
        "churches": "church", "classes": "class", "races": "race",
        "buzzes": "buzz", "tried": "try", "carried": "carry",
        "agreed": "agree", "feed": "feed", "fitted": "fit",
        "planned": "plan", "called": "call", "passed": "pass",
        "used": "use", "moved": "move", "hoped": "hope",
        "running": "run", "making": "make", "sing": "sing",
        "string": "string", "children": "child", "series": "series",
        "tennis": "tennis", "campus": "campus", "goes": "go",
        "dying": "die", "ties": "tie", "news": "news", "basis": "basis",
        "utf8": "utf8",  # digit guard: identifiers never stem
    }
    for w, want in cases.items():
        assert kstem(w) == want, (w, kstem(w))
    assert porter_stem("policies") == "polici"  # the KStem difference


def test_ascii_fold_three_way_equivalence(spark):
    """T6 — the fold+tokenize chain agrees across pandas UDF, Catalyst
    translate()/replace(), and the DuckDB oracle fragment."""
    import duckdb as _dd
    texts = ["café naïve Zürich", "Łódź Ærøskøbing straße",
             "ĲsselmeerÇağrı İstanbul", "plain ascii stays",
             FOLD_SRC]  # every pinned 1:1 mapping in one row
    pdf = pd.DataFrame({"i": range(len(texts)), "text": texts})
    sdf = spark.createDataFrame(pdf).orderBy("i")
    udf_out = [r[0] for r in
               sdf.select(tokenize_pandas_udf(ascii_fold=True)("text")).collect()]
    col_out = [r[0] for r in
               sdf.select(tokens_col(F.col("text"), ascii_fold=True)).collect()]
    con = _dd.connect()
    con.register("t", pdf)
    duck = con.sql(f"""
      SELECT i, [x for x in regexp_split_to_array(
             {duckdb_clean_sql("text", ascii_fold=True)},
             '[^a-z0-9]+') if x <> '' and x not in {duckdb_stoplist_sql()}]
      FROM t ORDER BY i
    """).fetchall()
    duck_out = [list(r[1]) for r in duck]
    assert udf_out == col_out == duck_out
    assert udf_out[0] == ["cafe", "naive", "zurich"]
    # folded uppercase participates in camel splitting: Ĳ→"IJ" then
    # camel-B splits "IJsselmeer"→"I Jsselmeer"; "...Çağrı İ..."→camel-A
    assert udf_out[2] == ["i", "jsselmeer", "cagri", "istanbul"]
    assert len(FOLD_SRC) == len(FOLD_DST)


def test_python_xxhash64_matches_spark(spark):
    """The driver-side XXH64 replica (engine/portable.py) must be
    bit-equal to Spark's xxhash64 — it drives postings partition
    pruning; a mismatch would silently skip buckets (zero recall)."""
    from pyspark.sql import functions as F

    from engine.portable import xxhash64_str

    words = ["", "a", "ab", "abc", "abcd", "merge", "quicksort",
             "x" * 7, "y" * 8, "z" * 31, "w" * 32, "v" * 33,
             "a longer string exercising the 32-byte striped path!",
             "üñïçødé", "snake_case_token", "doc42"]
    df = spark.createDataFrame([(w,) for w in words], "t string") \
        .select("t", F.xxhash64("t").alias("h"))
    for r in df.collect():
        assert xxhash64_str(r["t"]) == r["h"], r["t"]
