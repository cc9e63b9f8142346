"""Deterministic-sketch guarantees that the DuckDB oracle alone cannot
express: HLL accuracy vs the exact count, HLL mergeability (shard-wise
sketch union == global sketch), Bloom-prefilter transparency (result
identical to the filter-free join) and effectiveness (the prefilter
actually drops non-matching fact rows before the join)."""

from __future__ import annotations

from pyspark.sql import functions as F

from insurance_claim_data_pipeline_spark.operators import sketches
from insurance_claim_data_pipeline_spark.operators.sketches import (
    HLL_M,
    HLL_W_BITS,
    _bloom_probe_sql,
    _h60,
    agg_hll_deterministic,
    join_bloom_prefilter,
)
from insurance_claim_data_pipeline_spark.session import load_table

from .conftest import SF_DRIVER


def _hll_registers(df):
    """(event_type, bucket) -> max rho registers for an events frame."""
    h = _h60(F.col("user_id"))
    rho = F.when(F.col("w") == 0, F.lit(HLL_W_BITS + 1)).otherwise(
        F.lit(HLL_W_BITS + 1) - F.length(F.conv(F.col("w"), 10, 2))
    )
    return (
        df.select(
            "event_type",
            (h % HLL_M).alias("bucket"),
            F.shiftright(h, 8).alias("w"),
        )
        .groupBy("event_type", "bucket")
        .agg(F.max(rho).alias("r"))
    )


def test_hll_estimate_close_to_exact(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    est = {
        r["event_type"]: r["est_distinct_users"]
        for r in agg_hll_deterministic(spark, sf_dir).collect()
    }
    assert set(est) == set(exact)
    for et, n in exact.items():
        # m=256 -> ~6.5% standard error in HLL mode; linear counting is
        # much tighter at these cardinalities. 15% is 2+ sigma.
        assert abs(est[et] - n) / n < 0.15, (et, n, est[et])


def test_hll_sketch_is_mergeable(spark, sf_dir):
    """MAX-aggregated registers merge losslessly: sketching each day
    separately and MAX-merging the registers gives bit-identical
    registers to sketching the whole table — the property that lets a
    100 TB corpus be sketched shard-by-shard and unioned for free."""
    ev = load_table(spark, sf_dir, "events")
    global_regs = _hll_registers(ev)
    # day-partitioned sketches: registers per (day, event_type, bucket),
    # then merged with a second MAX across days.
    h = _h60(F.col("user_id"))
    rho = F.when(F.col("w") == 0, F.lit(HLL_W_BITS + 1)).otherwise(
        F.lit(HLL_W_BITS + 1) - F.length(F.conv(F.col("w"), 10, 2))
    )
    daily = (
        ev.select(
            F.to_date("ts").alias("day"),
            "event_type",
            (h % HLL_M).alias("bucket"),
            F.shiftright(h, 8).alias("w"),
        )
        .groupBy("day", "event_type", "bucket")
        .agg(F.max(rho).alias("r"))
    )
    merged = daily.groupBy("event_type", "bucket").agg(F.max("r").alias("r"))
    assert global_regs.count() == merged.count()
    assert merged.exceptAll(global_regs).count() == 0
    assert global_regs.exceptAll(merged).count() == 0


def test_bloom_prefilter_transparent(spark, sf_dir):
    """The Bloom pre-filter must not change the join result (no false
    negatives; false positives die in the equi-join)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    build = orders.filter(F.expr(sketches._BUILD_PRED))
    plain = (
        li.join(build, li.l_orderkey == build.o_orderkey)
        .groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("order_month"))
        .agg(F.count(F.lit(1)).alias("n_lineitems"))
    )
    got = join_bloom_prefilter(spark, sf_dir).select("order_month", "n_lineitems")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, plain.collect()))


def test_bloom_prefilter_drops_rows_before_join(spark):
    """Effectiveness at the driver gate scale: the 16 KiB filter must
    reject the overwhelming majority of non-matching fact rows ahead of
    the join shuffle (that reduction IS the 100 TB story)."""
    sf = SF_DRIVER
    orders = load_table(spark, sf, "orders")
    li = load_table(spark, sf, "lineitem")
    build = orders.filter(F.expr(sketches._BUILD_PRED)).select("o_orderkey")
    pos = F.explode(F.array(*sketches._bloom_positions(F.col("o_orderkey")))).alias(
        "__pos__"
    )
    words = (
        build.select(pos)
        .select(
            (F.col("__pos__") / F.lit(64)).cast("long").alias("word"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(pmod(__pos__, 64) AS INT))"
            ).alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )
    bloom = words.agg(
        F.map_from_entries(F.collect_list(F.struct("word", "bits"))).alias("__bloom__")
    )
    total = li.count()
    survivors = (
        li.select("l_orderkey")
        .crossJoin(F.broadcast(bloom))
        .filter(F.expr(_bloom_probe_sql("l_orderkey")))
        .count()
    )
    true_matches = li.join(build, li.l_orderkey == build.o_orderkey, "left_semi").count()
    assert true_matches <= survivors  # no false negatives
    # false-positive rate of the survivors beyond true matches is small:
    # with m=2^17 bits, k=3 and ~2% build keys the FP rate is << 1%.
    assert survivors < 0.25 * total, (survivors, total)


def test_bloom_probe_filter_sits_below_join(spark, sf_dir):
    """Plan audit: the bitmask membership test must appear as a Filter
    below the order-key join, i.e. fact rows are pruned pre-shuffle."""
    plan = (
        join_bloom_prefilter(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "md5" in plan and "shiftleft" in plan
    assert "CartesianProduct" not in plan
    # the probe crossJoin is against the single-row broadcast bloom map
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
