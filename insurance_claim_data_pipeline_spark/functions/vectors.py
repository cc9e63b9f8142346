"""Vector math over ``array<float>`` embedding columns — pure
higher-order-function expressions (F.zip_with / F.aggregate), JVM-side,
no UDFs.

Cross-engine determinism: elements are cast to double FIRST, then
multiplied pairwise and summed with a sequential left fold in array
order. IEEE double ops are exact given identical inputs and order, so
Spark's ``aggregate`` and DuckDB's ``list_reduce`` produce bit-identical
dot products — which is what lets cosine similarity be oracle-checked
at full precision (outputs still rounded to 6 dp for belt-and-braces).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(arr: Column | str) -> Column:
    a = F.col(arr) if isinstance(arr, str) else arr
    return F.transform(a, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product (order-deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


# --- DuckDB mirrors (same fold order) --------------------------------------


def dot_sql(a: str, b: str) -> str:
    return (
        f"list_reduce(list_transform(list_zip({a}, {b}), "
        f"t -> CAST(t[1] AS DOUBLE) * CAST(t[2] AS DOUBLE)), (x, y) -> x + y)"
    )


def norm_sql(a: str) -> str:
    return f"SQRT({dot_sql(a, a)})"


def cosine_sql(a: str, b: str) -> str:
    return f"({dot_sql(a, b)} / ({norm_sql(a)} * {norm_sql(b)}))"
