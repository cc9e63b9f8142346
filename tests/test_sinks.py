"""Partitioned-sink round-trip: the written layout must give readers
partition pruning (PartitionFilters in the scan, pruned directory
count), and the data must survive the round-trip exactly."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from insurance_claim_data_pipeline_spark.session import load_table
from insurance_claim_data_pipeline_spark.sources.sinks import write_partitioned


def test_partitioned_write_prunes_on_read(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    out = str(tmp_path / "events_by_date")
    write_partitioned(ev, out, ["event_date"], coalesce_files=2)

    # hive-style directories exist
    dirs = [d for d in os.listdir(out) if d.startswith("event_date=")]
    assert len(dirs) >= 2

    back = spark.read.parquet(out)
    one_day = sorted(d.split("=")[1] for d in dirs)[0]
    q = back.filter(F.col("event_date") == one_day)
    plan = q._jdf.queryExecution().executedPlan().toString()
    # the date filter must be a partition filter (directory pruning),
    # not a data filter evaluated per row
    assert "PartitionFilters: [" in plan
    assert "event_date" in plan.split("PartitionFilters:")[1].split("]")[0]

    # round-trip equality for that day
    expected = ev.filter(F.col("event_date") == one_day).count()
    assert q.count() == expected


def test_dynamic_partition_pruning_on_join(spark, sf_dir, tmp_path):
    """Joining a date-partitioned fact against a filtered dim must prune
    fact partitions at RUNTIME (dynamicpruning expression in the scan's
    PartitionFilters) — at 100 TB this is the difference between
    scanning 2 days and scanning 7 years when the date set comes out of
    another query instead of a literal."""
    ev = load_table(spark, sf_dir, "events").withColumn("event_date", F.to_date("ts"))
    out = str(tmp_path / "events_dpp")
    write_partitioned(ev, out, ["event_date"], coalesce_files=2)
    fact = spark.read.parquet(out)

    # a "dim" whose surviving dates are only known at runtime; the
    # selective filter on the dim side is what makes Catalyst insert the
    # runtime pruning subquery into the fact scan
    dim = (
        ev.filter(F.col("event_type") == "error")
        .select(F.to_date("ts").alias("event_date"))
        .distinct()
    )
    joined = fact.join(dim, "event_date").groupBy("event_date").agg(
        F.sum("value").alias("sum_value")
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan, plan[:2000]

    # correctness: the pruned scan covers exactly the dim's dates
    got_dates = {r["event_date"] for r in joined.collect()}
    want_dates = {r["event_date"] for r in dim.collect()}
    assert got_dates == want_dates and got_dates


def test_orc_round_trip_with_pushdown(spark, sf_dir, tmp_path):
    """ORC sink/source parity: write orders as ORC, read it back
    identically, and confirm predicate pushdown reaches the ORC scan
    just as it does for parquet."""
    orders = load_table(spark, sf_dir, "orders")
    out = str(tmp_path / "orders_orc")
    orders.write.mode("overwrite").orc(out)
    back = spark.read.orc(out)
    assert back.schema == orders.schema
    assert back.count() == orders.count()
    q = back.filter(F.col("o_totalprice") > 100000.0).select("o_orderkey")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "o_totalprice" in plan.split("PushedFilters")[1].split("]")[0]
    expected = orders.filter(F.col("o_totalprice") > 100000.0).count()
    assert q.count() == expected


def test_compact_files_merges_small_files(spark, sf_dir, tmp_path):
    """64 tiny files in, a handful out, data byte-identical."""
    import os

    from insurance_claim_data_pipeline_spark.sources.sinks import compact_files

    ev = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "fragmented")
    ev.repartition(64).write.mode("overwrite").parquet(src)
    n_in = sum(1 for f in os.listdir(src) if f.endswith(".parquet"))
    assert n_in == 64

    dst = str(tmp_path / "compacted")
    compact_files(spark, src, dst, target_file_bytes=8 * 1024 * 1024)
    n_out = sum(1 for f in os.listdir(dst) if f.endswith(".parquet"))
    assert n_out < n_in

    back = spark.read.parquet(dst)
    assert back.count() == ev.count()
    a = {tuple(r) for r in back.collect()}
    b = {tuple(r) for r in ev.collect()}
    assert a == b


def test_schema_evolution_merge_on_read(spark, sf_dir, tmp_path):
    """Appended files with a new column must merge on read
    (mergeSchema): old rows read NULL for the new column, both
    generations survive, and the merged schema is the union."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    out = str(tmp_path / "evolving")
    ev.filter(F.col("event_id") % 2 == 0).write.mode("overwrite").parquet(out)
    (
        ev.filter(F.col("event_id") % 2 == 1)
        .withColumn("schema_v", F.lit(2))
        .write.mode("append")
        .parquet(out)
    )
    merged = spark.read.option("mergeSchema", "true").parquet(out)
    assert set(merged.columns) == {"event_id", "user_id", "schema_v"}
    assert merged.count() == ev.count()
    nulls = merged.filter(F.col("schema_v").isNull()).count()
    assert nulls == ev.filter(F.col("event_id") % 2 == 0).count()


def test_schema_evolution_null_backfill(spark, sf_dir):
    """The merged read must expose price_cents as NULL on every v1 row
    and non-null on every v2 row — the additive-evolution contract."""
    import os as _os
    import tempfile

    from pyspark.sql import functions as F

    from insurance_claim_data_pipeline_spark.operators.multimodal import (
        source_schema_evolution,
    )

    source_schema_evolution(spark, sf_dir)  # writes the generations
    out = _os.path.join(tempfile.gettempdir(), "icdp_source_schema_evolution")
    back = spark.read.option("mergeSchema", "true").parquet(
        _os.path.join(out, "gen=v1"), _os.path.join(out, "gen=v2")
    )
    bad_v1 = back.filter(F.col("is_v1") & F.col("price_cents").isNotNull()).count()
    bad_v2 = back.filter(~F.col("is_v1") & F.col("price_cents").isNull()).count()
    assert bad_v1 == 0 and bad_v2 == 0
    assert {f.name for f in back.schema.fields} >= {"o_orderkey", "is_v1", "price_cents"}
