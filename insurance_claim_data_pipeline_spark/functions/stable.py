"""Order-stable aggregate helpers.

Floating-point SUM/AVG depend on partial-aggregation order, which differs
between Spark (parallel partial + final agg) and the DuckDB oracle, and —
worse — across runs and cluster sizes. Every monetary aggregate in this
engine therefore routes through exact decimal arithmetic and converts to
double only at the end; results are bit-identical regardless of
parallelism, which is exactly what you want on a 1000-executor cluster
too (a reproducibility property, not just a test convenience).

The SQL-side mirror of ``dec_sum(col, s)`` is
``CAST(SUM(CAST(col AS DECIMAL(18,s))) AS DOUBLE)``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec(col: Column | str, scale: int = 2, precision: int = 18) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({precision},{scale})")


def dec_sum(col: Column | str, scale: int = 2, precision: int = 18) -> Column:
    """Exact (order-independent) SUM of a double column, as double."""
    return F.sum(dec(col, scale, precision)).cast("double")


def dec_avg(col: Column | str, scale: int = 2, precision: int = 18) -> Column:
    """AVG as exact-decimal sum divided by count, as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(dec(c, scale, precision)).cast("double") / F.count(c)


def dec_sum_sql(expr: str, scale: int = 2, precision: int = 18) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL({precision},{scale}))) AS DOUBLE)"


def dec_avg_sql(expr: str, scale: int = 2, precision: int = 18) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL({precision},{scale}))) AS DOUBLE) / COUNT({expr})"
