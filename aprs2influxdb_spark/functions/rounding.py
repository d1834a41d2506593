"""Engine-agnostic rounding for oracle parity.

Spark's ``round`` is BigDecimal HALF_UP; DuckDB's is C-style nearest.
They disagree exactly on .5 boundaries — which 2-decimal inputs hit
*systematically* (0.5 * v^2 of a 2dp value always ends in ...5).
``rhu`` computes half-up as pure double arithmetic
(``floor(x * 10^n + 0.5) / 10^n``) so both engines run the identical
IEEE operations and can't disagree.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def rhu(col: Column | str, n: int) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    m = 10 ** n
    return F.floor(c * m + F.lit(0.5)) / F.lit(float(m))


def rhu_sql(expr: str, n: int) -> str:
    m = 10 ** n
    return f"(floor(({expr}) * {m} + 0.5) / {m}.0)"
