"""Cross-engine determinism helpers.

The driver's correctness gate hashes values produced by Spark and DuckDB
side by side.  Both engines implement ``ROUND(double, n)`` differently
(Spark: exact-decimal HALF_UP; DuckDB: scale-multiply + round-half-away on
the double), so values landing exactly on a .xx5 boundary -- which is
*common* for products of 2-decimal money -- round differently.

``rnd``/``sql_round`` sidestep the problem by expressing rounding as
``floor(x * 10^s + 0.5) / 10^s`` on BOTH engines: every step (multiply,
add, floor, divide) is an IEEE-754 operation with one defined result, so
if the inputs are bit-identical the outputs are bit-identical, boundary
or not.  (The goal is not mathematically perfect decimal rounding -- it
is that both engines produce the *same* double.)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def rnd(col: Column, scale: int = 2) -> Column:
    """Deterministic cross-engine round of a double column."""
    f = float(10 ** scale)
    return F.floor(col * F.lit(f) + F.lit(0.5)) / F.lit(f)


def sql_round(expr: str, scale: int = 2) -> str:
    """DuckDB-side twin of :func:`rnd` for oracle SQL strings.

    Exponent literals (``1e2``, ``5e-1``) parse as DOUBLE in both Spark
    SQL and DuckDB, whereas bare decimal literals (``100.0``, ``0.5``)
    parse as DECIMAL and would propagate decimal arithmetic through the
    expression (diverging from the DataFrame-API double path).
    """
    return f"floor(CAST(({expr}) AS DOUBLE)*1e{scale} + 5e-1)/1e{scale}"
