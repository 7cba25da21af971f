"""Engine-portable numeric helpers.

Spark's ``round`` is HALF_UP while DuckDB's is HALF_EVEN, so values
landing exactly on a rounding boundary (common with ratios of small
integers) diverge. Both engines agree on ``floor(x·10^n + 0.5)/10^n``,
so every float column that feeds an oracle comparison is rounded with
these helpers on BOTH sides.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def round_half_up(col: Column, n: int) -> Column:
    scale = float(10 ** n)
    return F.floor(col * F.lit(scale) + F.lit(0.5)) / F.lit(scale)


def round_half_up_sql(expr: str, n: int) -> str:
    scale = f"1e{n}"
    return f"(floor(({expr}) * {scale} + 0.5) / {scale})"
