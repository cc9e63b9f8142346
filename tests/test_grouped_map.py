"""Unit tests for functions/grouped.py::sorted_grouped_map — the
whole-partition grouped map used by the high-cardinality recurrence
operators (EMA, Kalman, LTTB, Croston).

The dangerous case is a group that straddles two (or many) Arrow
batches of the same partition: the carry-over logic must hand the
per-group closure every group EXACTLY once and COMPLETE. We force the
straddle by shrinking spark.sql.execution.arrow.maxRecordsPerBatch far
below the group size.
"""

from __future__ import annotations

import pandas as pd
import pytest

from pyspark.sql import functions as F

from insurance_claim_data_pipeline_spark.functions.grouped import sorted_grouped_map


@pytest.fixture()
def small_batches(spark):
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "137")
    yield
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def _count_sum(pdf: pd.DataFrame) -> pd.DataFrame:
    # One output row per delivered group — duplicates would expose a
    # group split across two closure calls.
    return pd.DataFrame(
        {
            "k": [pdf["k"].iloc[0]],
            "n": [len(pdf)],
            "s": [int(pdf["v"].sum())],
        }
    )


def test_groups_straddling_batches_arrive_whole(spark, small_batches):
    # 5 keys x 1000 rows: every group spans ~8 Arrow batches.
    df = spark.range(5000).select(
        (F.col("id") % 5).alias("k"), F.col("id").alias("v")
    )
    out = (
        sorted_grouped_map(df, ["k"], _count_sum, "k long, n long, s long")
        .toPandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    expected = (
        df.groupBy("k")
        .agg(F.count("*").alias("n"), F.sum("v").alias("s"))
        .toPandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert len(out) == 5  # exactly one closure call per group
    pd.testing.assert_frame_equal(out, expected, check_dtype=False)


def test_matches_apply_in_pandas(spark, small_batches):
    # Same closure through both code paths must agree row-for-row.
    df = spark.range(2000).select(
        (F.col("id") % 37).alias("k"), (F.col("id") * 3 % 101).alias("v")
    )
    via_gm = (
        sorted_grouped_map(df, ["k"], _count_sum, "k long, n long, s long")
        .toPandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    via_aip = (
        df.groupBy("k")
        .applyInPandas(_count_sum, "k long, n long, s long")
        .toPandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(via_gm, via_aip, check_dtype=False)


def test_null_key_group_preserved(spark):
    df = spark.range(60).select(
        F.when(F.col("id") % 3 == 0, None).otherwise(F.col("id") % 3).alias("k"),
        F.col("id").alias("v"),
    )
    out = sorted_grouped_map(
        df, ["k"], _count_sum, "k long, n long, s long"
    ).toPandas()
    assert len(out) == 3  # null key is its own group, like groupBy
    assert out["n"].sum() == 60


def test_empty_input(spark):
    df = spark.range(0).select(F.col("id").alias("k"), F.col("id").alias("v"))
    out = sorted_grouped_map(df, ["k"], _count_sum, "k long, n long, s long")
    assert out.count() == 0
