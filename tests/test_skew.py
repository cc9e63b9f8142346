"""salted_join must be row-identical to the plain join while spreading
a hot key across salt shards."""

from __future__ import annotations

from pyspark.sql import functions as F

from insurance_claim_data_pipeline_spark.operators.skew import salted_join


def _skewed_frames(spark):
    # 90% of the big side on one hot key, like a null-ish tenant id
    big = spark.range(2000).select(
        F.when(F.col("id") % 10 < 9, 1).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.range(50).select(
        F.col("id").alias("k2"), F.concat(F.lit("dim_"), F.col("id")).alias("name")
    )
    return big, small


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_salted_inner_join_equals_plain(spark):
    big, small = _skewed_frames(spark)
    plain = big.join(small, big.k == small.k2, "inner")
    salted = salted_join(big, small, "k", "k2", n_salt=8, how="inner")
    assert _rows(salted.select("k", "payload", "k2", "name")) == _rows(
        plain.select("k", "payload", "k2", "name")
    )


def test_salted_left_join_equals_plain(spark):
    big, small = _skewed_frames(spark)
    plain = big.join(small, big.k == small.k2, "left")
    salted = salted_join(big, small, "k", "k2", n_salt=8, how="left")
    assert _rows(salted.select("k", "payload", "k2", "name")) == _rows(
        plain.select("k", "payload", "k2", "name")
    )


def test_salt_actually_spreads_hot_key(spark):
    big, _ = _skewed_frames(spark)
    salted = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(8))
    )
    n_shards = salted.filter(F.col("k") == 1).select("_salt").distinct().count()
    assert n_shards == 8  # the hot key occupies every shard


def test_join_skew_salted_plan_shape(spark):
    """The registry query must actually exercise the salted shuffle
    join: no BroadcastHashJoin (the dim side is shuffle_hash-hinted —
    at target scale it doesn't fit a broadcast), and the join keys must
    include the salt column pair."""
    from insurance_claim_data_pipeline_spark.operators.skew import join_skew_salted

    from .conftest import SF_SMOKE

    plan = (
        join_skew_salted(spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" not in plan
    assert "_salt" in plan
    assert "ShuffledHashJoin" in plan or "SortMergeJoin" in plan


def test_join_skew_planner_bookkeeping(spark, sf_dir):
    """Ratio identity and strategy thresholds: skew_ratio_e6 must equal
    top_cnt*1e6*n_distinct // n_rows exactly, and the strategy column
    must be the deterministic CASE over (n_distinct, ratio)."""
    from insurance_claim_data_pipeline_spark.operators.skew import (
        AQE_RATIO_E6,
        BROADCAST_KEYS,
        SALT_RATIO_E6,
        profile_join_skew_planner,
    )

    rows = profile_join_skew_planner(spark, sf_dir).collect()
    assert len(rows) == 4
    for r in rows:
        assert r["skew_ratio_e6"] == r["top_cnt"] * 1_000_000 * r["n_distinct"] // r["n_rows"]
        if r["n_distinct"] <= BROADCAST_KEYS:
            want = "broadcast_dim"
        elif r["skew_ratio_e6"] >= SALT_RATIO_E6:
            want = "salt_hot_keys"
        elif r["skew_ratio_e6"] >= AQE_RATIO_E6:
            want = "aqe_skew_join"
        else:
            want = "plain_shuffle"
        assert r["strategy"] == want
        assert r["top_cnt"] >= r["n_rows"] // r["n_distinct"]  # top ≥ mean
