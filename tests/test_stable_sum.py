"""Unit tests for the split-long exact accumulator (functions/stable.py).

The quotient/remainder split must stay in LONG arithmetic end-to-end: a
double-promoting division makes the quotient inexact once a per-row
scaled value exceeds 2^53 (~9e15). These tests pin the shift-based
quotient against exact Python integer math in exactly that regime, and
the small-value regime against the DECIMAL-sum oracle formulation.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from insurance_claim_data_pipeline_spark.functions.stable import dec_sum


def _exact_sum(values, scale):
    # reference: sign-aware HALF_UP of v*10^s computed the same way the
    # Column does (double multiply, then floor(+0.5)), summed exactly
    m = 10**scale
    total = 0
    for v in values:
        total += int(math.floor(abs(v) * m + 0.5)) * (1 if v >= 0 else -1)
    return float(total) / m


def test_dec_sum_exact_above_2_53(spark):
    # scaled values ~1e16-9e18: past double's integer range but inside
    # long range — the regime where `/` silently breaks and shiftright
    # must not
    values = [
        9.007199254740993e13,   # just past 2^53 at scale 2
        1.23456789012345e14,
        -8.7654321098765e13,
        4.611686018427387e16,   # near 2^62 at scale 2
        -4.611686018427387e16,
        0.005,                  # HALF_UP boundary
        -0.005,
    ]
    df = spark.createDataFrame([(v,) for v in values], "v double")
    got = df.agg(dec_sum("v", 2).alias("s")).collect()[0]["s"]
    assert got == _exact_sum(values, 2)


def test_dec_sum_matches_decimal_formulation_small(spark):
    values = [1.115, 2.225, -3.335, 0.004, 100.0, -0.006]
    df = spark.createDataFrame([(v,) for v in values], "v double")
    got = df.agg(dec_sum("v", 2).alias("s")).collect()[0]["s"]
    ref = df.agg(
        F.sum(F.col("v").cast("decimal(18,2)")).cast("double").alias("s")
    ).collect()[0]["s"]
    assert got == ref


def test_dec_sum_partition_order_independent(spark):
    values = [i * 0.01 + (1 if i % 2 else -1) * 1e13 for i in range(1000)]
    df1 = spark.createDataFrame([(v,) for v in values], "v double").repartition(1)
    df32 = spark.createDataFrame([(v,) for v in reversed(values)], "v double").repartition(32)
    s1 = df1.agg(dec_sum("v", 2).alias("s")).collect()[0]["s"]
    s32 = df32.agg(dec_sum("v", 2).alias("s")).collect()[0]["s"]
    assert s1 == s32 == _exact_sum(values, 2)


def test_dec_sum_parts_merge_is_bit_identical(spark):
    """Merging split-accumulator partials from two disjoint slices must
    reproduce the single-pass dec_sum bit-for-bit (the incremental-
    view-maintenance contract) — including in the >2^53-scaled regime
    where merging finished doubles would drift."""
    from insurance_claim_data_pipeline_spark.functions.stable import (
        dec_sum_from_parts,
        dec_sum_parts,
    )

    values = [
        9.007199254740993e13,
        1.23456789012345e14,
        -8.7654321098765e13,
        4.611686018427387e16,
        -4.611686018427387e16,
        0.005,
        -0.005,
        123.456,
        -0.01,
        3.335,
    ]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(values)], "i int, v double"
    )
    single = df.agg(dec_sum("v").alias("s")).collect()[0]["s"]

    def parts(pred):
        q, r = dec_sum_parts("v")
        row = df.filter(pred).agg(q.alias("q"), r.alias("r")).collect()[0]
        return row["q"], row["r"]

    qa, ra = parts("i % 2 = 0")
    qb, rb = parts("i % 2 = 1")
    merged = (
        spark.range(1)
        .select(
            dec_sum_from_parts(
                F.lit(qa + qb).cast("long"), F.lit(ra + rb).cast("long")
            ).alias("s")
        )
        .collect()[0]["s"]
    )
    assert merged == single


def test_dec_sum_rejects_scale_above_six(spark):
    """r06 guard: Spark's decimal division scale-adjusts every dec_sum
    result to 6 decimals, so a scale-7+ request would be silently
    rounded here while the SQL mirror keeps the full scale — a latent
    cross-engine divergence (it bit the k-means trainers at scale 12).
    The helper must refuse loudly instead. (The spark fixture is
    requested because F.col construction itself needs an active
    session — without it the test would error before reaching the
    guard on order-randomized runs.)"""
    import pytest

    from insurance_claim_data_pipeline_spark.functions.stable import (
        dec_avg,
        dec_sum,
        dec_sum_from_parts,
    )
    from pyspark.sql import functions as F

    with pytest.raises(ValueError, match="scale 7 > 6"):
        dec_sum("x", 7)
    with pytest.raises(ValueError, match="scale 12 > 6"):
        dec_avg("x", 12)
    with pytest.raises(ValueError, match="scale 9 > 6"):
        dec_sum_from_parts(F.lit(0), F.lit(0), 9)


def test_mean_e12_matches_exact_rational_floor(spark):
    """stable.mean_e12 must equal the pure-integer model
    floor(sum(round_half_away(v*1e12)) / n) / 1e12 on adversarial
    values (negatives, half-boundaries, mixed signs) — the contract
    that makes the unrolled-Lloyd oracles exact."""
    from pyspark.sql import functions as F

    from insurance_claim_data_pipeline_spark.functions.stable import mean_e12

    cases = [
        [0.1, 0.2, 0.3],
        [-0.1, -0.2, 0.05],
        [1.0000000000005, -1.0000000000005, 0.0],  # half-boundary at 1e-12
        [-5.4321, 2.2222, 1.1111, -0.0001],
        [0.0000000000005] * 7,  # rounds to 1 at scale 12, floor-div by 7
        [-0.0000000000005] * 3,
    ]

    def model(vals):
        import math

        scaled = [
            int(math.floor(abs(v) * 10**12 + 0.5)) * (1 if v > 0 else (-1 if v < 0 else 0))
            for v in vals
        ]
        s, n = sum(scaled), len(vals)
        return (s - ((s % n) + n) % n) // n / 10**12

    for vals in cases:
        df = spark.createDataFrame([(v,) for v in vals], "x double")
        got = df.agg(mean_e12("x").alias("mu")).first()["mu"]
        want = model(vals)
        assert got == want, (vals, got, want)


from hypothesis import given, settings, strategies as st

from insurance_claim_data_pipeline_spark.functions.stable import _MEAN_E12_MAX

# Just inside the live guard, derived from the constant itself so the
# property can never silently decouple from the real domain: if the
# guard is ever loosened back toward the old 9.2e6 int64 bound, this
# strategy widens with it, generates 2^52-band values, and reproduces
# the ADVICE r06 tie divergence immediately. (The old [-100, 100]
# strategy sat far below both the tie band and the guard edge, so it
# could not falsify the docstring's bit-identity claim.)
_E12_DOMAIN_EDGE = _MEAN_E12_MAX - 1e-4


@given(
    st.lists(
        st.floats(
            min_value=-_E12_DOMAIN_EDGE, max_value=_E12_DOMAIN_EDGE, allow_nan=False
        ),
        min_size=1,
        max_size=9,
    )
)
@settings(max_examples=10, deadline=None)
def test_mean_e12_cross_engine_property(spark, vals):
    """Hypothesis cross-engine contract: Spark mean_e12 must equal
    DuckDB mean_e12_sql bit-for-bit on arbitrary value lists — the
    property that would have caught the r06 floor bug (DuckDB's
    integer `//` truncates toward zero; negative-sum groups diverged
    by 1e-12 until the mirror spelled out the pmod-subtract floor)."""
    import struct

    import duckdb

    from insurance_claim_data_pipeline_spark.functions.stable import (
        mean_e12,
        mean_e12_sql,
    )

    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = df.agg(mean_e12("x").alias("mu")).first()["mu"]
    con = duckdb.connect()
    con.execute("CREATE TABLE t(x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in vals])
    want = con.execute(f"SELECT {mean_e12_sql('x')} FROM t").fetchone()[0]
    con.close()
    assert struct.pack("<d", got) == struct.pack("<d", want), (vals, got, want)


def test_mean_e12_rejects_out_of_domain_values(spark):
    """ADVICE r07 tightened guard: beyond |v| = 2^52/1e12 ≈ 4503.6 the
    scaled product enters the ULP≥1 binade where Spark's floor(x+0.5)
    round-to-even tie diverges from DuckDB's ROUND(x) on ~50% of values
    (and beyond 9.2e6 the cast would saturate int64) — exactly the
    silent-divergence class the helper exists to close. mean_e12 must
    refuse loudly per row, in BOTH engines (the SQL mirror carries the
    same guard so the failure window is symmetric)."""
    import duckdb
    import pytest

    from insurance_claim_data_pipeline_spark.functions.stable import (
        _MEAN_E12_MAX,
        mean_e12,
        mean_e12_sql,
    )

    # the r06 ADVICE counterexample sits inside the old 9.2e6 guard but
    # inside the [2^52/1e12, 2^53/1e12) tie band — must now be rejected
    for bad in (8320.087321044215, 1e7, _MEAN_E12_MAX):
        df = spark.createDataFrame([(bad,), (1.0,)], "x double")
        with pytest.raises(Exception, match="mean_e12 domain"):
            df.agg(mean_e12("x").alias("mu")).collect()
        con = duckdb.connect()
        con.execute("CREATE TABLE t(x DOUBLE)")
        con.executemany("INSERT INTO t VALUES (?)", [(bad,), (1.0,)])
        with pytest.raises(Exception, match="mean_e12 domain"):
            con.execute(f"SELECT {mean_e12_sql('x')} FROM t").fetchone()
        con.close()
    # in-domain values (up to the new guard edge) are untouched
    ok = spark.createDataFrame([(4503.5,), (-4503.5,), (0.25,)], "x double")
    got = ok.agg(mean_e12("x").alias("mu")).first()["mu"]
    assert got == 0.083333333333
