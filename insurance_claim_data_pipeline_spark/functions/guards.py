"""Degenerate-input guards.

A statistic whose denominator collapses to zero on a degenerate slice
(one row → sample variance 0, one group → k−1 = 0, an empty side of a
two-sample split) is UNDEFINED there — the engine must emit NULL, never
throw. Spark 4 runs ANSI mode by default, so an unguarded division by
zero is a hard SparkArithmeticException: a single 1-row partition can
kill a 100 TB job. scripts/empty_probe.py sweeps for this class;
tests/test_empty_inputs.py pins every site it has ever caught.

``nonzero`` is the standard guard: dividing by ``nonzero(d)`` yields
exactly ``x / d`` whenever ``d != 0`` (bit-identical — NULLIF passes the
original value through) and NULL when the statistic is undefined, which
matches SQL aggregate semantics (AVG/STDDEV of nothing is NULL).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def nonzero(c: Column) -> Column:
    """NULL when ``c`` is 0, else ``c`` unchanged — divide by
    ``nonzero(d)`` to make an undefined statistic NULL instead of a
    SparkArithmeticException under ANSI mode."""
    return F.nullif(c, F.lit(0))
