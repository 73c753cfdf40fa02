"""Cross-engine-stable rounding.

Spark's ``round(double, n)`` rounds the value's full DECIMAL expansion
(BigDecimal HALF_UP); DuckDB's rounds the scaled DOUBLE. For doubles
whose expansion straddles the n-th digit (…49999… / …50000…) the two
disagree — one row in ~500 at 6 digits, enough to break a value-hash
parity gate.

``qround`` computes floor(x·10ⁿ + 0.5)/10ⁿ instead. Both engines
evaluate that formula with identical IEEE double ops, so results are
bit-identical everywhere (including the pandas/numpy kernels, which
use the same formula via ``qround_py``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def qround(col: Column, ndigits: int = 6) -> Column:
    scale = float(10**ndigits)
    return F.floor(col * F.lit(scale) + F.lit(0.5)) / F.lit(scale)


def qround_sql(expr: str, ndigits: int = 6) -> str:
    scale = float(10**ndigits)
    return f"(floor(({expr}) * {scale} + 0.5) / {scale})"


def qround_py(x: float, ndigits: int = 6) -> float:
    import math

    scale = float(10**ndigits)
    return math.floor(x * scale + 0.5) / scale
