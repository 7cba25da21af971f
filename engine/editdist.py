"""OSA (optimal string alignment, a.k.a. restricted Damerau-
Levenshtein) edit distance — the metric behind Lucene FuzzyQuery's
``transpositions=true`` mode, which is the default both for the
classic QueryParser's ``term~`` surface and for Elasticsearch's
``fuzzy``/``match`` fuzziness (``fuzzy_transpositions: true``): an
adjacent-character swap counts as ONE edit, under the restriction
that no substring is edited twice.

Reference parity note (src/main/java/org/cs7is3/Searcher.java:27 —
the reference's QueryParser would build transposition-aware
FuzzyQuery automata for any un-escaped ``~`` token; its own TREC
pipeline escapes queries first, so the flag never fires there, but
the parser surface the engine replicates carries it).

Why OSA and not the unrestricted Damerau-Levenshtein: Lucene's
parametric Levenshtein automata "with transpositions" implement the
restricted flavor. The two differ exactly when an edit lands between
transposed characters — the textbook pair is osa("ca","abc") = 3
vs unrestricted dl("ca","abc") = 2. DuckDB ships the UNRESTRICTED
flavor as ``damerau_levenshtein()``, so the builtin is NOT a valid
cross-engine oracle for this metric above distance 1; at
``max_edits = 1`` the predicate ``osa(a,b) <= 1`` IS exactly
SQL-expressible (``levenshtein(a,b) <= 1`` OR the strings differ by
exactly one adjacent swap). tests/test_fuzzy_transpositions.py pins
both facts, plus the dl <= osa <= lev sandwich used below.

Bounds callers rely on (all pinned by tests):

* ``osa <= lev`` (transposition only ADDS an allowed op), and one
  transposition costs two plain edits, so ``osa(a,b) <= e`` implies
  ``lev(a,b) <= 2e`` — the JVM-side prefilter that keeps the Python
  DP off the full candidate set;
* every OSA op changes length by at most 1, so
  ``|len(a) - len(b)| <= osa(a,b)`` — the same length pre-filter the
  plain-Levenshtein paths use;
* a transposition rewrites two adjacent positions, touching at most
  4 trigrams and at most 2 of a contiguous-piece partition — hence
  the trigram prune's ``2e+1`` pieces / ``g - 4e`` shared-gram count
  bound in transposition mode (engine/trigram.py).
"""
from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType


def osa(a: str, b: str) -> int:
    """Textbook O(|a|·|b|) three-row rolling OSA DP."""
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return la or lb
    prev2: list[int] = []
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        ai = a[i - 1]
        for j in range(1, lb + 1):
            cost = 0 if ai == b[j - 1] else 1
            d = min(prev[j] + 1,          # deletion
                    cur[j - 1] + 1,       # insertion
                    prev[j - 1] + cost)   # substitution / match
            if (i > 1 and j > 1 and ai == b[j - 2]
                    and a[i - 2] == b[j - 1]):
                d = min(d, prev2[j - 2] + 1)   # adjacent transposition
            cur[j] = d
        prev2, prev = prev, cur
    return prev[lb]


@F.pandas_udf(IntegerType())
def osa_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """Arrow-batched OSA. Hot-path discipline: callers prefilter with
    the JVM-side ``levenshtein <= 2e`` + length bounds (and, when the
    sidecar exists, the trigram prune) so the Python DP only ever sees
    the small verified-candidate set, never a vocabulary scan."""
    return pd.Series([osa(x, y) for x, y in zip(a, b)], dtype="int32")
