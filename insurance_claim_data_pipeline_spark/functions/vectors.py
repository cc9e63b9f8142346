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


def _fold_dot(a: Column, b: Column, prod) -> Column:
    # The one fold body both dot variants share (ADVICE r06): zip,
    # per-pair product, sequential left fold from double 0.0. Keeping a
    # single source of truth means any change to the accumulate order
    # moves BOTH variants together — the bit-identity property
    # (tests/test_properties.py::test_dot_float_bit_identical_to_dot_as_double)
    # guards the contract, this guards the drift.
    return F.aggregate(F.zip_with(a, b, prod), F.lit(0.0), lambda acc, x: acc + x)


def dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product (order-deterministic)."""
    return _fold_dot(a, b, lambda x, y: x * y)


def dot_float(a: Column, b: Column) -> Column:
    """Dot product over RAW ``array<float>`` columns, casting each
    element to double inside the fold. Bit-identical to
    ``dot(as_double(a), as_double(b))`` — float→double is exact and the
    multiply/accumulate order is unchanged — but the operands stay
    4-byte floats until the fold touches them.

    When to use which (A/B-measured at sf0.1, semantic-LSH refine):

    - PAIR EQUI-JOINS (candidate ids join vectors from both sides, the
      joined rows materialize between operators): ``dot_float`` — the
      pair frame carries half the bytes, and the per-element cast runs
      once per pair either way since nothing upstream could share it.
      Refine stage 16.4 → 13.1 s (−20%) on the same loaded machine.
    - BROADCAST Q×N SCANS / nested-loop pair scans (one corpus row
      feeds MANY pairs): keep ``as_double`` once per row + ``dot`` —
      there the pre-cast is amortized across Q folds, and re-casting
      per pair would ADD work instead of removing bytes. Measured on
      the brute-force cosine BNLJ at sf0.1: double 24.0 s vs float
      27.9 s (−14% from switching BACK to as_double) — nothing
      materializes between nested-loop probes, so the cast is pure
      added per-pair CPU there."""
    return _fold_dot(a, b, lambda x, y: x.cast("double") * y.cast("double"))


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


# Rejected alternative (measured r5, kept as a note so it isn't re-tried):
# unrolling the fold into a fixed 64-term expression tree
# (lit(0.0) + a[1]*b[1] + ... + a[64]*b[64], bit-identical op order) to
# move the dot from the higher-order-function evaluator into whole-stage
# codegen made every pair-scan SLOWER, not faster — A/B on the 40-query
# × 40k-vector broadcast join at sf0.1: fold 0.61 s vs unrolled 1.63 s
# (no-cast variant on materialized double arrays; the cast-per-element
# variant on raw float arrays was equally slow), and the full
# brute-force pair scan regressed 24.5 s → 79.6 s. Spark 4's
# ArrayAggregate over primitive arrays is a tight specialized loop,
# while 64 chained element_at calls pay per-call bounds checks and the
# deep Add tree defeats JIT inlining. The PQ min(struct) rewrite's
# "HOFs are interpreted" lesson does NOT generalize to primitive-array
# folds.


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
