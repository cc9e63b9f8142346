"""Bucketing: pre-shuffled on-disk layout → shuffle-free co-located
joins. At 100 TB the orders⋈lineitem shuffle is the single biggest cost
in the star-schema queries; bucketing both fact tables by the join key
at write time removes it from EVERY downstream join. This test writes
bucketed copies at sf0.001 and asserts the join plan has no shuffle
exchange on either side."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from insurance_claim_data_pipeline_spark.session import load_table

N_BUCKETS = 8


@pytest.fixture()
def no_broadcast(spark):
    """Force shuffle-join planning so the assertion targets the bucketed
    layout, not broadcast selection (which tiny test tables would get)."""
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
    spark.conf.set("spark.sql.adaptive.enabled", old_aqe)


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path, no_broadcast):
    for name, key in (("orders", "o_orderkey"), ("lineitem", "l_orderkey")):
        (
            load_table(spark, sf_dir, name)
            .write.mode("overwrite")
            .option("path", str(tmp_path / name))
            .bucketBy(N_BUCKETS, key)
            .sortBy(key)
            .saveAsTable(f"bkt_{name}")
        )
    try:
        o = spark.table("bkt_orders")
        li = spark.table("bkt_lineitem")
        joined = o.join(li, o.o_orderkey == li.l_orderkey).groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("n")
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # the join itself must read both sides bucket-aligned: no shuffle
        # before the join (the only Exchange allowed is the 5-group
        # aggregate after it). Either shuffle-exchange-free join impl
        # qualifies — under the AQE SMJ→SHJ rewrite (r12/r13) the
        # runtime may legally pick ShuffledHashJoin over the bucketed
        # layout; what this test pins is the ABSENCE of a re-shuffle,
        # not the join algorithm.
        join_name = (
            "SortMergeJoin" if "SortMergeJoin" in plan else "ShuffledHashJoin"
        )
        join_part = plan.split(join_name)[-1]
        assert join_name in plan
        assert "Exchange hashpartitioning" not in join_part

        # sanity: same result as the unbucketed join
        plain = (
            load_table(spark, sf_dir, "orders")
            .join(
                load_table(spark, sf_dir, "lineitem"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, plain.collect()))
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_orders")
        spark.sql("DROP TABLE IF EXISTS bkt_lineitem")
