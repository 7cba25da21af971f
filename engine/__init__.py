"""PySpark-native full-text indexing + BM25 query engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference engine (Raaghav2/Full_Text-Search-Engine — a Lucene 9.9.2
TREC ad-hoc retrieval system; see SURVEY.md). Everything here is
DataFrame / vectorized-Arrow-UDF based: no per-row Python UDFs, no RDD
logic in the hot path.

Modules
-------
analysis      tokenizer chain (SURVEY.md §2.3 T1-T5, T10-T12)
postings      variable-byte posting codec + block-max metadata (I4-I6)
index_build   distributed index construction w/ manifests + resume (I1-I9)
scoring       BM25 constants + formula (Q3)
search        query engine: OR/AND/top-k/WAND (Q1-Q14)
expand        entity-biased RM3 pseudo-relevance expansion (Q9-Q11)
topics        TREC-style topic parsing (P6-P7)
runfile       TREC run-file sink (S6)
evaluate      MAP / P@20 / nDCG@20 (E1-E5)
corpus        deterministic synthetic source-code corpus (FIXTURES.md)
pipeline.*    large-scale training-data ops (dedup, similarity, text stats)
"""

__version__ = "0.1.0"
