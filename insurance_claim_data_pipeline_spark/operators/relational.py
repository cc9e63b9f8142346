"""Relational operator library over the synthetic star schema.

This is the extension surface of SURVEY.md §2.2: the reference
(claim_pipeline.py) is a single-table pipeline, so joins, aggregation
families, window functions, sorts, set ops and the scalar-function
families are implemented here Spark-first over the TPC-H-ish tables.

Scale design notes (local[N] tests, 1000-executor mental model):

- Dimension tables (region/nation/customer/supplier/part at these
  ratios) are broadcast explicitly — no shuffle for the big fact side.
- Fact-fact joins (orders⋈lineitem) shuffle on the join key once; AQE
  coalesces post-shuffle partitions and splits skewed keys.
- The as-of join is the union+window formulation: one shuffle on the
  partition key, no range cross-product, no per-key driver loop. This is
  the plan that survives 100× data (an O(n·m) range join would not).
- All money aggregates are decimal-stabilized (functions/stable.py) —
  reproducible across any degree of parallelism.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.stable import dec, dec_avg, dec_sum, dec_sum_sql
from ..functions.guards import nonzero
from ..functions.localframe import local_frame
from ..registry import register
from ..session import load_table, pin, tiny_frame_key


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Aggregation family
# ---------------------------------------------------------------------------

Q1_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       {dec_sum_sql('l_quantity')} AS sum_qty,
       {dec_sum_sql('l_extendedprice')} AS sum_base_price,
       {dec_sum_sql('l_extendedprice * (1 - l_discount)', 4)} AS sum_disc_price,
       {dec_sum_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 6)} AS sum_charge,
       {dec_sum_sql('l_quantity')} / COUNT(l_quantity) AS avg_qty,
       {dec_sum_sql('l_extendedprice')} / COUNT(l_extendedprice) AS avg_price,
       {dec_sum_sql('l_discount', 2)} / COUNT(l_discount) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@register("q1_pricing_summary", oracle=Q1_ORACLE, tags=("agg", "flagship", "bench"))
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-style pricing summary: scan → filter (parquet pushdown) →
    hash aggregate with 8 aggregates. Whole plan stays in whole-stage
    codegen; partial aggregation happens map-side before the single
    shuffle on (l_returnflag, l_linestatus)."""
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.to_timestamp(F.lit("1998-09-02 00:00:00")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dec_sum("l_quantity").alias("sum_qty"),
            dec_sum("l_extendedprice").alias("sum_base_price"),
            dec_sum(disc_price, 4).alias("sum_disc_price"),
            dec_sum(charge, 6).alias("sum_charge"),
            dec_avg("l_quantity").alias("avg_qty"),
            dec_avg("l_extendedprice").alias("avg_price"),
            dec_avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


AGG_STATS_ORACLE = f"""
WITH g AS (
  SELECT l_returnflag,
         COUNT(*) AS n,
         COUNT(DISTINCT l_partkey) AS distinct_parts,
         MIN(l_extendedprice) AS min_price,
         MAX(l_extendedprice) AS max_price,
         {dec_sum_sql('l_quantity')} AS sum_qty,
         {dec_sum_sql('l_quantity * l_quantity', 4, 28)} AS sum_qty_sq
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n, distinct_parts, min_price, max_price,
       sum_qty / n AS avg_qty,
       (sum_qty_sq - sum_qty * sum_qty / n) / (n - 1) AS var_qty
FROM g
"""


@register("agg_stats", oracle=AGG_STATS_ORACLE, tags=("agg",))
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min/max/count-distinct plus a variance computed from exact decimal
    sums (sum, sum-of-squares) so the result is order-independent —
    the built-in var_samp is a running double and not reproducible
    across partition counts."""
    li = _t(spark, sf_dir, "lineitem")
    g = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("l_partkey").alias("distinct_parts"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        dec_sum("l_quantity").alias("sum_qty"),
        dec_sum(F.col("l_quantity") * F.col("l_quantity"), 4, 28).alias("sum_qty_sq"),
    )
    return g.select(
        "l_returnflag",
        "n",
        "distinct_parts",
        "min_price",
        "max_price",
        (F.col("sum_qty") / F.col("n")).alias("avg_qty"),
        (
            (F.col("sum_qty_sq") - F.col("sum_qty") * F.col("sum_qty") / F.col("n"))
            / nonzero(F.col("n") - 1)
        ).alias("var_qty"),
    )


ROLLUP_ORACLE = f"""
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n_orders,
       {dec_sum_sql('o_totalprice')} AS total_price
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


@register("agg_rollup", oracle=ROLLUP_ORACLE, tags=("agg",))
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (status → status+priority → grand total)."""
    return (
        _t(spark, sf_dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"), dec_sum("o_totalprice").alias("total_price"))
    )


CUBE_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS n_items,
       {dec_sum_sql('l_quantity')} AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


@register("agg_cube", oracle=CUBE_ORACLE, tags=("agg",))
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus): all 2^2 grouping sets."""
    return (
        _t(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n_items"), dec_sum("l_quantity").alias("sum_qty"))
    )


GROUPING_SETS_ORACLE = f"""
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n_orders,
       {dec_sum_sql('o_totalprice')} AS total_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
"""


@register("agg_grouping_sets", oracle=GROUPING_SETS_ORACLE, tags=("agg",))
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — by status and, separately, by priority."""
    o = _t(spark, sf_dir, "orders")
    o.createOrReplaceTempView("orders_gs")
    return spark.sql(
        f"""
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n_orders,
               {dec_sum_sql('o_totalprice')} AS total_price
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )


@register("agg_approx", tags=("agg", "approx"))  # no oracle: sketch outputs are engine-specific
def agg_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregates (HLL++ distinct, approximate percentiles).
    Sketch values are engine-specific, so the driver runs the weaker
    rows-only check; exact counterparts are oracle-checked in agg_stats /
    sort_percentiles."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.percentile_approx("l_extendedprice", 0.5).alias("approx_median_price"),
        F.count(F.lit(1)).alias("n"),
    )


PIVOT_ORACLE = """
SELECT o_orderstatus,
       COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS "1-URGENT",
       COUNT(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS "2-HIGH",
       COUNT(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS "3-MEDIUM",
       COUNT(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS "4-NOT SPECIFIED",
       COUNT(*) FILTER (WHERE o_orderpriority = '5-LOW') AS "5-LOW"
FROM orders
GROUP BY o_orderstatus
"""

_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


@register("pivot_priority_counts", oracle=PIVOT_ORACLE, tags=("agg", "pivot"))
def pivot_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (cross-tab) with an explicit value list — the explicit list
    avoids the extra distinct-values job Spark otherwise runs first."""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .pivot("o_orderpriority", _PRIORITIES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, _PRIORITIES)
    )


# ---------------------------------------------------------------------------
# Join family
# ---------------------------------------------------------------------------

Q3_ORACLE = f"""
SELECT l_orderkey,
       {dec_sum_sql('l_extendedprice * (1 - l_discount)', 4)} AS revenue,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, o_orderpriority
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_orderkey, strftime(o_orderdate, '%Y-%m-%d'), o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
"""


@register("q3_shipping_priority", oracle=Q3_ORACLE, tags=("join", "agg", "topk", "bench"))
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q3-style: selective dim filter → broadcast customer into
    orders, shuffle-join lineitem on orderkey, aggregate, global top-10
    with a total-order tie-break (unique l_orderkey last)."""
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.to_timestamp(F.lit("1998-01-01 00:00:00"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.to_timestamp(F.lit("1998-01-01 00:00:00"))
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"), "o_orderpriority")
        .agg(dec_sum(disc_price, 4).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


Q5_ORACLE = f"""
SELECT n_name,
       {dec_sum_sql('l_extendedprice * (1 - l_discount)', 4)} AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
"""


@register("q5_local_supplier_volume", oracle=Q5_ORACLE, tags=("join", "agg", "bench"))
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5-style 6-way join. All dimensions broadcast; the only
    shuffle joins are the fact-fact orders⋈lineitem. (Measured
    alternative: streaming lineitem against an orders⋈customer build
    side loses the scan-level size estimate and degrades to a
    sort-merge join — 2.2 s vs 1.0 s at sf0.1 — so the statistics-
    friendly shape below, where every build side is a bare scan, wins
    even though it lets Spark hash-build the larger input at this
    tiny scale; above the broadcast threshold both shapes shuffle and
    the distinction disappears.)"""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(dec_sum(disc_price, 4).alias("revenue"))
    )


JOIN_INNER_ORACLE = f"""
SELECT c_mktsegment, COUNT(*) AS n_orders, {dec_sum_sql('o_totalprice')} AS total_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


@register("join_broadcast_inner", oracle=JOIN_INNER_ORACLE, tags=("join",))
def join_broadcast_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact⋈dim inner join with an explicit broadcast hint — zero
    shuffle for the orders side; aggregation shuffles 5 groups only."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_orders"), dec_sum("o_totalprice").alias("total_price"))
    )


SEMI_ORACLE = """
SELECT c_custkey, c_name
FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
"""


@register("join_left_semi", oracle=SEMI_ORACLE, tags=("join",))
def join_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join (EXISTS): customers having at least one finished
    order. Output columns come from the left side only."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


ANTI_ORACLE = """
SELECT c_nationkey, COUNT(*) AS n_customers_without_urgent
FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
GROUP BY c_nationkey
"""


@register("join_left_anti", oracle=ANTI_ORACLE, tags=("join",))
def join_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join (NOT EXISTS): customers with no urgent orders,
    counted per nation."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_customers_without_urgent"))
    )


FULL_OUTER_ORACLE = """
SELECT COUNT(*) FILTER (WHERE o_orderkey IS NULL) AS customers_without_orders,
       COUNT(*) FILTER (WHERE c_custkey IS NULL) AS orders_without_customers,
       COUNT(*) FILTER (WHERE o_orderkey IS NOT NULL AND c_custkey IS NOT NULL) AS matched
FROM customer FULL OUTER JOIN orders ON c_custkey = o_custkey
"""


@register("join_full_outer", oracle=FULL_OUTER_ORACLE, tags=("join",))
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join with match/no-match accounting on both sides."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    j = cust.join(orders, cust.c_custkey == orders.o_custkey, "full_outer")
    return j.agg(
        F.count(F.when(F.col("o_orderkey").isNull(), 1)).alias("customers_without_orders"),
        F.count(F.when(F.col("c_custkey").isNull(), 1)).alias("orders_without_customers"),
        F.count(F.when(F.col("o_orderkey").isNotNull() & F.col("c_custkey").isNotNull(), 1)).alias(
            "matched"
        ),
    )


RANGE_JOIN_ORACLE = f"""
WITH bands(band, lo, hi) AS (
  VALUES ('900-925', 900.0, 925.0), ('925-950', 925.0, 950.0),
         ('950-975', 950.0, 975.0), ('975-1000', 975.0, 1000.0)
)
SELECT band, COUNT(*) AS n_parts, {dec_sum_sql('p_retailprice')} AS sum_price
FROM part JOIN bands ON p_retailprice >= lo AND p_retailprice < hi
GROUP BY band
"""


@register("join_range_bands", oracle=RANGE_JOIN_ORACLE, tags=("join", "range"))
def join_range_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (range) join: parts bucketed into price bands. The band
    table is tiny → broadcast nested-loop join, which is the right
    physical plan; for large-large range joins see the as-of join's
    union+window technique instead."""
    part = _t(spark, sf_dir, "part")
    bands = local_frame(
        spark,
        [("900-925", 900.0, 925.0), ("925-950", 925.0, 950.0),
         ("950-975", 950.0, 975.0), ("975-1000", 975.0, 1000.0)],
        "band string, lo double, hi double",
    )
    return (
        part.join(
            F.broadcast(bands),
            (part.p_retailprice >= bands.lo) & (part.p_retailprice < bands.hi),
        )
        .groupBy("band")
        .agg(F.count(F.lit(1)).alias("n_parts"), dec_sum("p_retailprice").alias("sum_price"))
    )


Q4_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1995-04-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
  )
GROUP BY o_orderpriority
"""


@register("q4_order_priority", oracle=Q4_ORACLE, tags=("join", "agg", "subquery"))
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q4-style: EXISTS with a correlated non-equi condition.
    Expressed as a left-semi join on orderkey with the l_shipdate >
    o_orderdate predicate folded into the join condition — Catalyst
    plans exactly this from the SQL EXISTS too; semi-join output is
    bounded by the orders side regardless of lineitem fan-out."""
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1995-01-01 00:00:00")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1995-04-01 00:00:00")))
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


Q18_ORACLE = f"""
WITH big AS (
  SELECT l_orderkey, {dec_sum_sql('l_quantity')} AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING {dec_sum_sql('l_quantity')} > 150
)
SELECT c_name, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o_totalprice, total_qty
FROM big
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 25
"""


@register("q18_large_orders", oracle=Q18_ORACLE, tags=("join", "agg", "topk"))
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q18-style: aggregate-then-filter (HAVING) feeding joins.
    The quantity aggregate runs FIRST, shrinking lineitem to the few
    big orderkeys before any join — the selective side drives the plan
    instead of joining full fact tables and filtering late."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(dec_sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_totalprice",
            "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(25)
    )


# ---------------------------------------------------------------------------
# Window family
# ---------------------------------------------------------------------------

WINDOW_STATS_ORACLE = """
SELECT o_orderkey, o_custkey,
       ROW_NUMBER() OVER w AS rn,
       LAG(o_totalprice) OVER w AS prev_price,
       LEAD(o_totalprice) OVER w AS next_price,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


@register("window_order_stats", oracle=WINDOW_STATS_ORACLE, tags=("window", "bench"))
def window_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer order timeline: row_number, lag, lead and an exact
    running total. One shuffle on o_custkey serves all four window
    functions (same window spec)."""
    orders = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.row_number().over(w).cast("long").alias("rn"),
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.sum(dec("o_totalprice"))
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .cast("double")
        .alias("running_spend"),
    )


TOPK_GROUP_ORACLE = """
SELECT c_mktsegment, o_orderkey, o_totalprice, rnk
FROM (
  SELECT c_mktsegment, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                            ORDER BY o_totalprice DESC, o_orderkey) AS rnk
  FROM orders JOIN customer ON o_custkey = c_custkey
) t
WHERE rnk <= 3
"""


@register("window_topk_per_group", oracle=TOPK_GROUP_ORACLE, tags=("window", "topk"))
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders by price per market segment — row_number over a
    deterministic total order (price desc, then unique orderkey)."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select("c_mktsegment", "o_orderkey", "o_totalprice", F.row_number().over(w).cast("long").alias("rnk"))
        .filter(F.col("rnk") <= 3)
    )


RANK_FN_ORACLE = """
SELECT s_suppkey, s_nationkey, s_acctbal,
       RANK() OVER w AS rnk,
       DENSE_RANK() OVER w AS drnk,
       NTILE(4) OVER w AS quartile
FROM supplier
WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey)
"""


@register("window_rank_functions", oracle=RANK_FN_ORACLE, tags=("window",))
def window_rank_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / ntile over supplier balances per nation."""
    supp = _t(spark, sf_dir, "supplier")
    w = W.partitionBy("s_nationkey").orderBy(F.desc("s_acctbal"), "s_suppkey")
    return supp.select(
        "s_suppkey",
        "s_nationkey",
        "s_acctbal",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )


# ---------------------------------------------------------------------------
# Sort / limit / distinct / set ops
# ---------------------------------------------------------------------------

TOPK_GLOBAL_ORACLE = """
SELECT l_orderkey, l_linenumber, l_extendedprice
FROM lineitem
ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
LIMIT 10
"""


@register("sort_topk_global", oracle=TOPK_GLOBAL_ORACLE, tags=("sort", "topk"))
def sort_topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 — Spark plans orderBy+limit as TakeOrderedAndProject
    (per-partition top-k then k-way merge), never a full sort."""
    return (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.desc("l_extendedprice"), "l_orderkey", "l_linenumber")
        .limit(10)
    )


PERCENTILE_ORACLE = """
SELECT l_returnflag,
       ROUND(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
       ROUND(quantile_cont(l_extendedprice, 0.50), 4) AS p50,
       ROUND(quantile_cont(l_extendedprice, 0.75), 4) AS p75
FROM lineitem GROUP BY l_returnflag
"""


@register("sort_percentiles", oracle=PERCENTILE_ORACLE, tags=("agg", "sort"))
def sort_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolated percentiles (both engines implement the
    (n-1)*p convention); rounded to 4 decimals to absorb last-ulp
    interpolation differences."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_extendedprice", F.lit(0.25)), 4).alias("p25"),
        F.round(F.percentile("l_extendedprice", F.lit(0.50)), 4).alias("p50"),
        F.round(F.percentile("l_extendedprice", F.lit(0.75)), 4).alias("p75"),
    )


DISTINCT_ORACLE = """
SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
"""


@register("distinct_pairs", oracle=DISTINCT_ORACLE, tags=("sort",))
def distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT — hash aggregate without aggregate functions."""
    return _t(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


INTERSECT_ORACLE = """
SELECT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1995
INTERSECT
SELECT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1996
"""


@register("setop_intersect", oracle=INTERSECT_ORACLE, tags=("setop",))
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics): customers ordering in both years."""
    orders = _t(spark, sf_dir, "orders")
    y95 = orders.filter(F.year("o_orderdate") == 1995).select("o_custkey")
    y96 = orders.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    return y95.intersect(y96)


EXCEPT_ORACLE = """
SELECT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1995
EXCEPT
SELECT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1996
"""


@register("setop_except", oracle=EXCEPT_ORACLE, tags=("setop",))
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): 1995 customers who did not order in 1996."""
    orders = _t(spark, sf_dir, "orders")
    y95 = orders.filter(F.year("o_orderdate") == 1995).select("o_custkey")
    y96 = orders.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    return y95.subtract(y96)


UNION_ORACLE = """
SELECT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1995
UNION
SELECT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1996
"""


@register("setop_union_distinct", oracle=UNION_ORACLE, tags=("setop",))
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct): customers ordering in either year."""
    orders = _t(spark, sf_dir, "orders")
    y95 = orders.filter(F.year("o_orderdate") == 1995).select("o_custkey")
    y96 = orders.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    return y95.unionByName(y96).distinct()


# ---------------------------------------------------------------------------
# Scalar function families
# ---------------------------------------------------------------------------

STRING_FUNCS_ORACLE = """
SELECT p_partkey,
       UPPER(p_name) AS name_upper,
       LENGTH(p_name) AS name_len,
       SUBSTR(p_type, 1, 5) AS type_prefix,
       CAST(regexp_extract(p_brand, 'Brand#(\\d+)', 1) AS INTEGER) AS brand_num,
       p_brand || '/' || p_type AS brand_type,
       REPLACE(p_name, ' ', '_') AS name_snake,
       CASE WHEN p_type LIKE '%STEEL%' THEN 'steel' ELSE 'other' END AS material
FROM part
"""


@register("scalar_string_funcs", oracle=STRING_FUNCS_ORACLE, tags=("scalar",))
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family: upper/length/substr/regexp_extract/concat/replace/
    LIKE — all JVM-side codegen'd expressions, no UDFs."""
    part = _t(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").cast("long").alias("name_len"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.regexp_extract("p_brand", r"Brand#(\d+)", 1).cast("int").alias("brand_num"),
        F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.when(F.col("p_type").like("%STEEL%"), "steel").otherwise("other").alias("material"),
    )


DATE_FUNCS_ORACLE = """
SELECT o_orderkey,
       EXTRACT(year FROM o_orderdate) AS order_year,
       EXTRACT(month FROM o_orderdate) AS order_month,
       EXTRACT(quarter FROM o_orderdate) AS order_quarter,
       EXTRACT(dow FROM o_orderdate) AS order_dow,
       strftime(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date,
       datediff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS days_to_2002,
       strftime(o_orderdate, '%Y-%m') AS order_ym
FROM orders
"""


@register("scalar_date_funcs", oracle=DATE_FUNCS_ORACLE, tags=("scalar",))
def scalar_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family: extract fields, date arithmetic, formatting.
    DuckDB's EXTRACT(dow) is 0=Sunday; Spark's dayofweek is 1=Sunday —
    adjusted with -1 so semantics match."""
    orders = _t(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_month"),
        F.quarter("o_orderdate").cast("long").alias("order_quarter"),
        (F.dayofweek("o_orderdate") - 1).cast("long").alias("order_dow"),
        F.date_format(F.date_add(F.to_date("o_orderdate"), 30), "yyyy-MM-dd").alias("due_date"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.to_date("o_orderdate")).cast("long").alias(
            "days_to_2002"
        ),
        F.date_format("o_orderdate", "yyyy-MM").alias("order_ym"),
    )


MATH_FUNCS_ORACLE = """
SELECT p_partkey,
       ROUND(p_retailprice, 1) AS price_round1,
       CAST(FLOOR(p_retailprice) AS BIGINT) AS price_floor,
       CAST(CEIL(p_retailprice) AS BIGINT) AS price_ceil,
       ABS(p_retailprice - 950.0) AS dist_from_950,
       CAST(SQRT(p_size) AS DOUBLE) AS size_sqrt,
       MOD(p_size, 7) AS size_mod7,
       CAST(POWER(p_size, 2) AS DOUBLE) AS size_sq
FROM part
"""


@register("scalar_math_funcs", oracle=MATH_FUNCS_ORACLE, tags=("scalar",))
def scalar_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family — round/floor/ceil/abs/sqrt/mod/power (sqrt and
    integer powers are IEEE-exact, so cross-engine deterministic)."""
    part = _t(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.round("p_retailprice", 1).alias("price_round1"),
        F.floor("p_retailprice").alias("price_floor"),
        F.ceil("p_retailprice").alias("price_ceil"),
        F.abs(F.col("p_retailprice") - 950.0).alias("dist_from_950"),
        F.sqrt(F.col("p_size").cast("double")).alias("size_sqrt"),
        (F.col("p_size") % 7).alias("size_mod7"),
        F.pow(F.col("p_size").cast("double"), 2).alias("size_sq"),
    )


# ---------------------------------------------------------------------------
# As-of join (custom operator — Spark has no native ASOF JOIN)
# ---------------------------------------------------------------------------


def asof_join_last_event(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_value: str,
) -> DataFrame:
    """Generic as-of join: for each left row, the most recent right row
    with ``right_ts <= left_ts`` on the same key.

    Implemented as union + window (tag sides, sort by time within key,
    forward-fill the right value) — a single shuffle on the key, linear
    work, no range cross-product. This is the formulation that scales to
    100 TB; a naive ``left join on key and ts<=ts + max`` explodes on hot
    keys. Ties: a right row at exactly left_ts wins (sorts first via the
    side tag), and among equal-ts right rows the largest value row wins
    (deterministic total order).
    """
    l_tag = left.select(
        F.col(key).alias("k"),
        F.col(left_ts).alias("t"),
        F.lit(1).alias("side"),
        F.lit(None).cast("long").alias("rv"),
        F.col(left_ts).alias("left_ts"),
        *[F.col(c) for c in left.columns if c not in (key, left_ts)],
    )
    extra_cols = [c for c in left.columns if c not in (key, left_ts)]
    r_tag = right.select(
        F.col(key).alias("k"),
        F.col(right_ts).alias("t"),
        F.lit(0).alias("side"),
        F.col(right_value).cast("long").alias("rv"),
        F.lit(None).cast(dict(left.dtypes)[left_ts]).alias("left_ts"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in extra_cols],
    )
    w = (
        W.partitionBy("k")
        .orderBy("t", "side", "rv")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        l_tag.unionByName(r_tag)
        .withColumn("asof_value", F.last("rv", ignorenulls=True).over(w))
        .filter(F.col("side") == 1)
        .drop("t", "side", "rv")
    )


ASOF_ORACLE = """
WITH tagged AS (
  SELECT user_id AS k, ts AS t,
         CASE WHEN event_type = 'error' THEN 0 ELSE 1 END AS side,
         CASE WHEN event_type = 'error' THEN event_id END AS rv,
         CASE WHEN event_type = 'purchase' THEN event_id END AS purchase_id
  FROM events WHERE event_type IN ('error', 'purchase')
), filled AS (
  SELECT k, t, side, purchase_id,
         last_value(rv IGNORE NULLS) OVER (
             PARTITION BY k ORDER BY t, side, rv
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_error_id
  FROM tagged
)
SELECT purchase_id, k AS user_id, CAST(epoch_us(t) AS BIGINT) AS purchase_ts_us, last_error_id
FROM filled WHERE side = 1
"""


@register("join_asof_last_error", oracle=ASOF_ORACLE, tags=("join", "asof", "bench"))
def join_asof_last_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join inside the events table: for every purchase, the most
    recent error event by the same user at or before the purchase."""
    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id")
    )
    errors = ev.filter(F.col("event_type") == "error").select("user_id", "ts", "event_id")
    out = asof_join_last_event(purchases, errors, "user_id", "ts", "ts", "event_id")
    return out.select(
        "purchase_id",
        F.col("k").alias("user_id"),
        F.unix_micros(F.col("left_ts")).alias("purchase_ts_us"),
        F.col("asof_value").alias("last_error_id"),
    )


# ---------------------------------------------------------------------------
# TPC-H Q7 / Q8 style — the hardest join-order + broadcast tests here
# ---------------------------------------------------------------------------

Q7_NATION_A = "NATION_1"
Q7_NATION_B = "NATION_2"

Q7_ORACLE = f"""
SELECT supp_nation, cust_nation, l_year,
       {dec_sum_sql('volume', 4)} AS revenue
FROM (
  SELECT n1.n_name AS supp_nation,
         n2.n_name AS cust_nation,
         EXTRACT(year FROM l_shipdate) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = '{Q7_NATION_A}' AND n2.n_name = '{Q7_NATION_B}')
      OR (n1.n_name = '{Q7_NATION_B}' AND n2.n_name = '{Q7_NATION_A}'))
    AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
) shipping
GROUP BY supp_nation, cust_nation, l_year
"""


@register("q7_volume_shipping", oracle=Q7_ORACLE, tags=("join", "agg", "bench"))
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q7-style bilateral trade volume: revenue shipped between two
    named nations, by supplier nation × customer nation × ship year.

    Join-order design: both nation dims are pre-filtered to the two
    relevant names BEFORE the join (partition-pruning-grade selectivity
    pushed into the broadcast build side, so supplier and customer shrink
    to the two nations' rows at the join, not after). The asymmetric OR
    pair predicate runs as a residual filter on the already-restricted
    rows. Fact side: lineitem filtered on the pushed-down shipdate range,
    one shuffle join with orders; everything else broadcast."""
    both = [Q7_NATION_A, Q7_NATION_B]
    n1 = _t(spark, sf_dir, "nation").filter(F.col("n_name").isin(both)).select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").filter(F.col("n_name").isin(both)).select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    supp = _t(spark, sf_dir, "supplier")
    cust = _t(spark, sf_dir, "customer")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1995-01-01 00:00:00")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-01-01 00:00:00")))
    )
    orders = _t(spark, sf_dir, "orders")
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == Q7_NATION_A) & (F.col("cust_nation") == Q7_NATION_B))
            | ((F.col("supp_nation") == Q7_NATION_B) & (F.col("cust_nation") == Q7_NATION_A))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(dec_sum(volume, 4).alias("revenue"))
    )


Q8_REGION = "ASIA"
Q8_TYPE = "ECONOMY"
Q8_NATION = "NATION_4"  # an ASIA nation: its market share within the region

Q8_ORACLE = f"""
SELECT o_year,
       ROUND({dec_sum_sql('nation_volume', 4)} / {dec_sum_sql('volume', 4)}, 9)
         AS mkt_share
FROM (
  SELECT EXTRACT(year FROM o_orderdate) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         CASE WHEN n2.n_name = '{Q8_NATION}'
              THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END AS nation_volume
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region   ON n1.n_regionkey = r_regionkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = '{Q8_REGION}'
    AND p_type = '{Q8_TYPE}'
    AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
) all_nations
GROUP BY o_year
"""


@register("q8_market_share", oracle=Q8_ORACLE, tags=("join", "agg", "bench"))
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q8-style market share: within one region's customers and
    one part type, the share of revenue supplied by one nation, per
    order year — an 8-way join whose selective dims (part type, region)
    must reach the scans as pushed filters.

    All five dims broadcast; the two fact tables meet in one shuffle
    join. Both the numerator and denominator are decimal-stabilized sums
    (order-independent), so the final ratio is the same double on any
    cluster size — ROUND(…, 9) in both engines pins the last ulp."""
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == Q8_TYPE)
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == Q8_REGION)
    n_cust = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nc_key"), F.col("n_regionkey").alias("nc_region")
    )
    n_supp = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")
    )
    supp = _t(spark, sf_dir, "supplier")
    cust = _t(spark, sf_dir, "customer")
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1995-01-01 00:00:00")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1997-01-01 00:00:00")))
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    nation_volume = F.when(F.col("supp_nation") == Q8_NATION, volume).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n_supp), F.col("s_nationkey") == F.col("ns_key"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n_cust), F.col("c_nationkey") == F.col("nc_key"))
        .join(F.broadcast(region), F.col("nc_region") == region.r_regionkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                dec_sum(nation_volume, 4) / dec_sum(volume, 4), 9
            ).alias("mkt_share")
        )
    )


# ---------------------------------------------------------------------------
# TPC-H breadth, round 2: Q6/Q10/Q13/Q14/Q15/Q16/Q17/Q19 over the reduced
# star schema (no partsupp / shipmode / receiptdate columns in the synthetic
# tables, so Q16/Q17/Q19 use the documented nearest-equivalent predicates).
# ---------------------------------------------------------------------------

Q6_ORACLE = f"""
SELECT {dec_sum_sql('l_extendedprice * l_discount', 4)} AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


@register("q6_forecast_revenue", oracle=Q6_ORACLE, tags=("agg",))
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q6-style forecast revenue: pure scan→filter→single-row
    aggregate. All three predicates are min/max-pruneable parquet
    pushdowns — at 100 TB this query reads only row groups whose
    shipdate/discount/quantity statistics overlap the range, the
    canonical 'filter reaches the scan' benchmark."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01 00:00:00")))
            & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-01-01 00:00:00")))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(dec_sum(F.col("l_extendedprice") * F.col("l_discount"), 4).alias("revenue"))
    )


Q10_ORACLE = f"""
SELECT c_custkey, c_name, {dec_sum_sql('l_extendedprice * (1 - l_discount)', 4)} AS revenue,
       c_acctbal, n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1995-10-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@register("q10_returned_items", oracle=Q10_ORACLE, tags=("join", "agg", "sort"))
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q10-style returned-item reporting: top-20 customers by
    revenue lost to returns in one quarter. The returnflag and orderdate
    filters are pushed to the two fact scans; customer and nation
    broadcast; orders⋈lineitem is the one shuffle. Top-20 runs as
    TakeOrderedAndProject (per-partition heaps + driver merge of 20-row
    heads — never a global sort), with c_custkey as the total-order
    tie-break so the cut is deterministic."""
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1995-10-01 00:00:00")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1996-01-01 00:00:00")))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


Q13_EXCLUDED_PRIORITY = "1-URGENT"

Q13_ORACLE = f"""
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey
                  AND o_orderpriority <> '{Q13_EXCLUDED_PRIORITY}'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
"""


@register("q13_customer_distribution", oracle=Q13_ORACLE, tags=("join", "agg"))
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q13-style customer order-count distribution: LEFT OUTER
    join with a compound ON condition (the priority exclusion must live
    in the join condition, not a WHERE — a WHERE would drop the
    zero-order customers the histogram exists to count), then two
    cascaded aggregations. The reference Q13 excludes on an o_comment
    pattern; the synthetic orders table has no comment column, so the
    documented equivalent is an o_orderpriority exclusion — same plan
    shape (non-equi residual on an outer join).

    Scale: customer⋈orders shuffles on custkey; the first aggregation
    is already partitioned by its group key (no second shuffle); the
    c_count histogram shuffles tiny data."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    joined = cust.join(
        orders,
        (cust.c_custkey == orders.o_custkey)
        & (orders.o_orderpriority != Q13_EXCLUDED_PRIORITY),
        "left",
    )
    return (
        joined.groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


Q14_ORACLE = f"""
SELECT ROUND(
  100.0 * {dec_sum_sql("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END", 4)}
        / {dec_sum_sql('l_extendedprice * (1 - l_discount)', 4)}, 9) AS promo_revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
"""


@register("q14_promo_revenue", oracle=Q14_ORACLE, tags=("join", "agg"))
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q14-style promotion effect: share of one month's revenue
    from PROMO-type parts. One broadcast join (part is the small dim),
    shipdate pushed to the lineitem scan, conditional + total revenue in
    a single aggregate pass; both sums decimal-stabilized so the ratio
    is the same double at any parallelism, ROUND(…,9) pins the ulp."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-03-01 00:00:00")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1996-04-01 00:00:00")))
    )
    part = _t(spark, sf_dir, "part")
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", volume).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(F.lit(100.0) * dec_sum(promo, 4) / dec_sum(volume, 4), 9).alias(
                "promo_revenue"
            )
        )
    )


Q15_ORACLE = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         {dec_sum_sql('l_extendedprice * (1 - l_discount)', 4)} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
"""


@register("q15_top_supplier", oracle=Q15_ORACLE, tags=("join", "agg", "subquery"))
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q15-style top supplier: the supplier(s) whose quarterly
    revenue equals the global max. The revenue CTE aggregates once
    (shuffle on suppkey); the scalar MAX is a one-row broadcast the
    equality filter consumes — no second shuffle of the revenue frame,
    no window over a single global partition. Equality-on-double is safe
    here because both sides come from the same exact decimal sum."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01 00:00:00")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1996-04-01 00:00:00")))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("total_revenue")
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    supp = _t(spark, sf_dir, "supplier")
    return (
        revenue.join(F.broadcast(max_rev), F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(supp), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


Q16_EXCLUDED_BRAND = "Brand#1"
Q16_EXCLUDED_TYPE = "PROMO"
Q16_SIZES = (1, 5, 9, 15, 23, 29, 36, 45)

Q16_ORACLE = f"""
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> '{Q16_EXCLUDED_BRAND}'
  AND p_type  <> '{Q16_EXCLUDED_TYPE}'
  AND p_size IN {Q16_SIZES}
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""


@register("q16_supplier_counts", oracle=Q16_ORACLE, tags=("join", "agg", "subquery"))
def q16_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q16-style part/supplier relationship count: distinct
    suppliers per (brand, type, size) bucket, excluding one brand, one
    type, and a NOT-IN supplier blacklist. The synthetic schema has no
    partsupp table, so lineitem serves as the part–supplier bridge
    (same join/agg shape, bigger bridge side — harder, not easier).

    The NOT IN runs as a broadcast LEFT ANTI join against the
    (pre-filtered, tiny) blacklist — the scalable formulation; a
    NOT-IN-as-cross-filter would be a cartesian. All part predicates
    (brand/type/size) are pushed into the broadcast build side."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != Q16_EXCLUDED_BRAND)
        & (F.col("p_type") != Q16_EXCLUDED_TYPE)
        & (F.col("p_size").isin(list(Q16_SIZES)))
    )
    blacklist = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(F.broadcast(blacklist), li.l_suppkey == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


Q17_BRAND = "Brand#3"

Q17_ORACLE = f"""
SELECT {dec_sum_sql('l_extendedprice', 4)} AS revenue
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN (
  SELECT l_partkey AS a_partkey,
         0.2 * ({dec_sum_sql('l_quantity')} / COUNT(*)) AS qty_cut
  FROM lineitem GROUP BY l_partkey
) pa ON p_partkey = a_partkey
WHERE p_brand = '{Q17_BRAND}'
  AND l_quantity < qty_cut
"""

# avg_yearly = revenue / 7, emitted at micro-precision via exact integer
# arithmetic. ROUND(x / 7.0, k) is NOT cross-engine-stable: 1/7's binary
# expansion puts a near-tie at arbitrary decimal positions and Spark
# (BigDecimal HALF_UP on the exact binary value) and DuckDB (double
# multiply-round) resolve it differently in the last ulp. Instead both
# engines scale the (exact, decimal-stabilized) revenue sum to an integer
# k = revenue·10⁴, then compute HALF_UP micros as ⌊(200k + 7) / 14⌋ in
# pure BIGINT arithmetic — bit-identical by construction.
Q17_ORACLE = f"""
WITH rev AS ({Q17_ORACLE.strip()})
SELECT revenue,
       ((CAST(ROUND(revenue * 10000) AS BIGINT) * 200 + 7) // 14) / 1000000.0
         AS avg_yearly
FROM rev
"""


@register("q17_small_quantity", oracle=Q17_ORACLE, tags=("join", "agg", "subquery"))
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q17-style small-quantity revenue: lineitems of one brand
    whose quantity is below 20% of that part's average order quantity.
    The correlated AVG subquery is decorrelated into one per-part
    aggregate joined back on partkey — the standard rewrite; the
    per-part frame is small (one row per part) so it broadcasts, and
    lineitem is scanned twice but shuffled never. The cut threshold is
    decimal-sum/count (order-independent), mirrored exactly in the
    oracle so the < boundary decides identically in both engines.
    avg_yearly (= revenue/7) is derived via exact scaled-long HALF_UP
    division — see the Q17_ORACLE comment for why ROUND(x/7.0, k) is
    not cross-engine-stable."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_brand") == Q17_BRAND)
    per_part = li.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        (F.lit(0.2) * (dec_sum("l_quantity") / F.count(F.lit(1)))).alias("qty_cut")
    )
    rev = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(per_part), li.l_partkey == F.col("a_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_cut"))
        .agg(dec_sum("l_extendedprice", 4).alias("revenue"))
    )
    micros = F.expr("(cast(round(revenue * 10000) as bigint) * 200 + 7) div 14")
    return rev.select("revenue", (micros / F.lit(1000000.0)).alias("avg_yearly"))


Q19_BANDS = (
    ("Brand#12", 1, 5, 1, 11),
    ("Brand#23", 1, 10, 10, 20),
    ("Brand#3", 1, 15, 20, 30),
)

Q19_ORACLE = f"""
SELECT {dec_sum_sql('l_extendedprice * (1 - l_discount)', 4)} AS revenue
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE (p_brand = '{Q19_BANDS[0][0]}' AND p_size BETWEEN {Q19_BANDS[0][1]} AND {Q19_BANDS[0][2]}
       AND l_quantity >= {Q19_BANDS[0][3]} AND l_quantity <= {Q19_BANDS[0][4]})
   OR (p_brand = '{Q19_BANDS[1][0]}' AND p_size BETWEEN {Q19_BANDS[1][1]} AND {Q19_BANDS[1][2]}
       AND l_quantity >= {Q19_BANDS[1][3]} AND l_quantity <= {Q19_BANDS[1][4]})
   OR (p_brand = '{Q19_BANDS[2][0]}' AND p_size BETWEEN {Q19_BANDS[2][1]} AND {Q19_BANDS[2][2]}
       AND l_quantity >= {Q19_BANDS[2][3]} AND l_quantity <= {Q19_BANDS[2][4]})
"""


@register("q19_discounted_revenue", oracle=Q19_ORACLE, tags=("join", "agg"))
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q19-style disjunctive revenue: three OR'd conjunction bands
    mixing part-side (brand, size) and lineitem-side (quantity)
    predicates — the classic test of predicate decomposition. Catalyst
    derives the single-side implications (brand ∈ {…} pushes to the
    part scan, quantity ∈ [min,max] hull to the lineitem scan) while
    the cross-side disjunction stays a residual on the broadcast join.
    The synthetic part table has no container column; size bands stand
    in for the container lists — same plan shape."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    band = None
    for brand, size_lo, size_hi, qty_lo, qty_hi in Q19_BANDS:
        clause = (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(size_lo, size_hi)
            & (F.col("l_quantity") >= qty_lo)
            & (F.col("l_quantity") <= qty_hi)
        )
        band = clause if band is None else (band | clause)
    return joined.filter(band).agg(
        dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue")
    )


# ---------------------------------------------------------------------------
# TPC-H completion set: Q2/Q9/Q11/Q20 (partsupp-shaped), Q12/Q21/Q22.
#
# The synthetic schema has no partsupp table and no
# commitdate/receiptdate/shipmode/phone columns, so each query keeps its
# textbook PLAN SHAPE with available columns:
# - partsupp is derived once per query as the distinct (partkey, suppkey)
#   supply catalog observed in lineitem, with ps_supplycost := the best
#   (minimum) unit price ever charged and ps_availqty := total quantity
#   moved. IEEE double division and MIN are order-independent and
#   bit-identical across engines, so the catalog is oracle-stable.
# - "late" (Q12/Q21) is shipdate lagging orderdate by >= LATE_DAYS, the
#   receipt-vs-commit proxy available here.
# With these stand-ins all 22 TPC-H query shapes are covered.
# ---------------------------------------------------------------------------

SUPPLY_SQL = f"""
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         MIN(l_extendedprice / l_quantity) AS ps_supplycost,
         {dec_sum_sql('l_quantity')} AS ps_availqty
  FROM lineitem
  GROUP BY l_partkey, l_suppkey
"""


def _supply_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem-derived partsupp stand-in. One shuffle on the composite
    (partkey, suppkey) key; at 100 TB this is a map-side-combined
    aggregate whose output is bounded by |part|x|supp per part|, far
    smaller than lineitem — the right side to reuse across joins."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy(
        F.col("l_partkey").alias("ps_partkey"), F.col("l_suppkey").alias("ps_suppkey")
    ).agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("ps_supplycost"),
        dec_sum("l_quantity").alias("ps_availqty"),
    )


Q2_REGION = "ASIA"
Q2_TYPE = "STANDARD"
Q2_SIZE_LO, Q2_SIZE_HI = 10, 20

Q2_ORACLE = f"""
WITH supply AS ({SUPPLY_SQL}),
regional AS (
  SELECT ps_partkey, ps_suppkey, ps_supplycost, s_acctbal, s_name, n_name
  FROM supply
  JOIN supplier ON ps_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE r_name = '{Q2_REGION}'
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, ps_supplycost AS supplycost
FROM part
JOIN regional ON p_partkey = ps_partkey
WHERE p_type = '{Q2_TYPE}' AND p_size BETWEEN {Q2_SIZE_LO} AND {Q2_SIZE_HI}
  AND ps_supplycost = (
    SELECT MIN(r2.ps_supplycost) FROM regional r2 WHERE r2.ps_partkey = p_partkey
  )
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey, supplycost
LIMIT 100
"""


@register("q2_min_cost_supplier", oracle=Q2_ORACLE, tags=("join", "subquery", "topk"))
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q2-style minimum-cost supplier: for each part of one type
    and size band, the regional supplier(s) offering the lowest derived
    supply cost. The correlated MIN subquery is decorrelated into a
    per-part window minimum over the regional catalog — one shuffle on
    partkey, no second scan, no self-join. supplier/nation/region/part
    all broadcast; the top-100 runs as TakeOrderedAndProject. Derived
    catalog per the module note (reference has no partsupp —
    claim_pipeline.py is single-table; this is §2.2 extension surface)."""
    supply = _supply_catalog(spark, sf_dir)
    supplier = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == Q2_REGION)
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_type") == Q2_TYPE) & F.col("p_size").between(Q2_SIZE_LO, Q2_SIZE_HI)
    )
    regional = (
        supply.join(F.broadcast(supplier), supply.ps_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("ps_partkey", "ps_suppkey", "ps_supplycost", "s_acctbal", "s_name", "n_name")
    )
    min_cost = F.min("ps_supplycost").over(W.partitionBy("ps_partkey"))
    cheapest = regional.withColumn("min_cost", min_cost).filter(
        F.col("ps_supplycost") == F.col("min_cost")
    )
    return (
        cheapest.join(F.broadcast(part), cheapest.ps_partkey == part.p_partkey)
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_brand",
            F.col("ps_supplycost").alias("supplycost"),
        )
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey", "supplycost"
        )
        .limit(100)
    )


Q9_NAME_FRAGMENT = "blue"

Q9_ORACLE = f"""
WITH supply AS ({SUPPLY_SQL})
SELECT nation, o_year, {dec_sum_sql('amount', 4)} AS sum_profit
FROM (
  SELECT n_name AS nation,
         CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
         l_extendedprice * (1 - l_discount) - ps_supplycost * l_quantity AS amount
  FROM lineitem
  JOIN part     ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN supply   ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE p_name LIKE '%{Q9_NAME_FRAGMENT}%'
) profit
GROUP BY nation, o_year
"""


@register("q9_product_profit", oracle=Q9_ORACLE, tags=("join", "agg"))
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q9-style product-type profit by nation and order year:
    the 6-way join headliner. Profit = discounted revenue minus derived
    supply cost x quantity. part (name-filtered), supplier and nation
    broadcast; lineitem x orders and lineitem x supply are the two fact
    shuffles, both on keys AQE can split if skewed. The part filter
    broadcast-semi-prunes lineitem BEFORE the catalog join, so the
    expensive composite-key shuffle only carries matching parts."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").contains(Q9_NAME_FRAGMENT))
    supplier = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    orders = _t(spark, sf_dir, "orders")
    supply = _supply_catalog(spark, sf_dir)
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "ps_supplycost"
    ) * F.col("l_quantity")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(
            supply,
            (li.l_partkey == supply.ps_partkey) & (li.l_suppkey == supply.ps_suppkey),
        )
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(dec_sum("amount", 4).alias("sum_profit"))
    )


Q11_NATION = "NATION_7"
Q11_FRACTION = 0.01

Q11_ORACLE = f"""
WITH supply AS ({SUPPLY_SQL}),
natsupp AS (
  SELECT ps_partkey, ps_supplycost * ps_availqty AS value
  FROM supply
  JOIN supplier ON ps_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE n_name = '{Q11_NATION}'
)
SELECT ps_partkey, {dec_sum_sql('value', 4)} AS part_value
FROM natsupp
GROUP BY ps_partkey
HAVING {dec_sum_sql('value', 4)} > (
  SELECT {dec_sum_sql('value', 4)} * {Q11_FRACTION} FROM natsupp
)
"""


@register("q11_important_stock", oracle=Q11_ORACLE, tags=("join", "agg", "subquery"))
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q11-style important stock: parts whose inventory value at
    one nation's suppliers exceeds a fraction of that nation's total.
    The global-total scalar subquery is computed once and broadcast via
    a 1-row cross join — the natsupp frame is built once, aggregated
    twice (per-part and total) from the same cached lineage; Spark
    reuses the shuffle exchange for both aggregations."""
    supply = _supply_catalog(spark, sf_dir)
    supplier = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation").filter(F.col("n_name") == Q11_NATION)
    natsupp = (
        supply.join(F.broadcast(supplier), supply.ps_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .select(
            "ps_partkey", (F.col("ps_supplycost") * F.col("ps_availqty")).alias("value")
        )
    )
    per_part = natsupp.groupBy("ps_partkey").agg(dec_sum("value", 4).alias("part_value"))
    threshold = natsupp.agg(
        (dec_sum("value", 4) * F.lit(Q11_FRACTION)).alias("threshold")
    )
    return (
        per_part.join(F.broadcast(threshold))
        .filter(F.col("part_value") > F.col("threshold"))
        .select("ps_partkey", "part_value")
    )


LATE_DAYS = 365

Q12_YEAR_LO = "1997-01-01 00:00:00"
Q12_YEAR_HI = "1998-01-01 00:00:00"
Q12_HIGH = ("1-URGENT", "2-HIGH")

Q12_ORACLE = f"""
SELECT lag_class,
       CAST(SUM(CASE WHEN o_orderpriority IN ('{Q12_HIGH[0]}', '{Q12_HIGH[1]}')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('{Q12_HIGH[0]}', '{Q12_HIGH[1]}')
                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM (
  SELECT o_orderpriority,
         CASE WHEN date_diff('day', o_orderdate, l_shipdate) >= {LATE_DAYS}
              THEN 'SLOW' ELSE 'FAST' END AS lag_class
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  WHERE l_shipdate >= TIMESTAMP '{Q12_YEAR_LO}'
    AND l_shipdate <  TIMESTAMP '{Q12_YEAR_HI}'
) lagged
GROUP BY lag_class
"""


@register("q12_shipping_priority_classes", oracle=Q12_ORACLE, tags=("join", "agg"))
def q12_shipping_priority_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q12-style shipping-class audit: per fulfillment-speed class
    (SLOW = shipped >= LATE_DAYS after ordering — the schema's stand-in
    for Q12's shipmode + receipt/commit lag), how many lineitems belong
    to high- vs low-priority orders, as conditional aggregates in a
    single pass. Shipdate range is pushed to the lineitem scan; one
    fact-fact shuffle on orderkey; two-row output."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit(Q12_YEAR_LO)))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit(Q12_YEAR_HI)))
    )
    orders = _t(spark, sf_dir, "orders")
    is_high = F.col("o_orderpriority").isin(list(Q12_HIGH))
    lag_class = F.when(
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) >= LATE_DAYS, "SLOW"
    ).otherwise("FAST")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(lag_class.alias("lag_class"), is_high.alias("is_high"))
        .groupBy("lag_class")
        .agg(
            F.sum(F.when(F.col("is_high"), 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(F.col("is_high"), 0).otherwise(1)).alias("low_line_count"),
        )
    )


Q20_NATION = "NATION_3"
Q20_NAME_PREFIX = "red"
Q20_YEAR_LO = "1997-01-01 00:00:00"
Q20_YEAR_HI = "1998-01-01 00:00:00"

Q20_ORACLE = f"""
WITH supply AS ({SUPPLY_SQL}),
shipped AS (
  SELECT l_partkey AS sh_partkey, l_suppkey AS sh_suppkey,
         {dec_sum_sql('l_quantity')} AS qty_year
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{Q20_YEAR_LO}'
    AND l_shipdate <  TIMESTAMP '{Q20_YEAR_HI}'
  GROUP BY l_partkey, l_suppkey
)
SELECT s_name, s_acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = '{Q20_NATION}'
  AND s_suppkey IN (
    SELECT ps_suppkey
    FROM supply
    JOIN shipped ON ps_partkey = sh_partkey AND ps_suppkey = sh_suppkey
    WHERE ps_partkey IN (
      SELECT p_partkey FROM part WHERE p_name LIKE '{Q20_NAME_PREFIX}%'
    )
      AND ps_availqty > 0.5 * qty_year
  )
"""


@register("q20_promotion_suppliers", oracle=Q20_ORACLE, tags=("join", "subquery"))
def q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q20-style potential-promotion suppliers: suppliers in one
    nation holding surplus stock (derived availqty > half of what they
    shipped of that part in the target year) of name-prefixed parts.
    The nested INs run as semi joins: part-prefix prunes the catalog via
    broadcast semi join; supply x shipped joins on the same composite
    grouping key (both sides are lineitem aggregates, co-partitioned);
    the qualifying-supplier set is tiny and broadcast back to the
    nation-filtered supplier dim."""
    supply = _supply_catalog(spark, sf_dir)
    shipped = (
        _t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.to_timestamp(F.lit(Q20_YEAR_LO)))
            & (F.col("l_shipdate") < F.to_timestamp(F.lit(Q20_YEAR_HI)))
        )
        .groupBy(
            F.col("l_partkey").alias("sh_partkey"), F.col("l_suppkey").alias("sh_suppkey")
        )
        .agg(dec_sum("l_quantity").alias("qty_year"))
    )
    prefix_parts = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").startswith(Q20_NAME_PREFIX))
        .select("p_partkey")
    )
    qualifying = (
        supply.join(
            F.broadcast(prefix_parts), supply.ps_partkey == F.col("p_partkey"), "left_semi"
        )
        .join(
            shipped,
            (supply.ps_partkey == shipped.sh_partkey)
            & (supply.ps_suppkey == shipped.sh_suppkey),
        )
        .filter(F.col("ps_availqty") > 0.5 * F.col("qty_year"))
        .select("ps_suppkey")
        .distinct()
    )
    supplier = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation").filter(F.col("n_name") == Q20_NATION)
    return (
        supplier.join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(qualifying), supplier.s_suppkey == F.col("ps_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
    )


Q21_NATION = "NATION_5"

Q21_ORACLE = f"""
WITH late AS (
  SELECT DISTINCT l_orderkey, l_suppkey
  FROM lineitem
  JOIN orders ON o_orderkey = l_orderkey
  WHERE o_orderstatus = 'F'
    AND l_shipdate > o_orderdate + INTERVAL {LATE_DAYS} DAY
)
SELECT s_name, COUNT(*) AS numwait
FROM late l1
JOIN supplier ON s_suppkey = l1.l_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE n_name = '{Q21_NATION}'
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM late l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
  )
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""


@register("q21_waiting_suppliers", oracle=Q21_ORACLE, tags=("join", "agg", "subquery", "topk"))
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q21-style suppliers who kept orders waiting: on finished
    multi-supplier orders, the supplier who was the ONLY late one
    (late = shipped > LATE_DAYS after ordering, the schema's
    receipt-vs-commit stand-in). The EXISTS / NOT-EXISTS pair is
    decorrelated into per-order counts — n_suppliers >= 2 carries the
    EXISTS, n_late_suppliers == 1 carries the NOT EXISTS — so the whole
    query is two aggregates over (orderkey) plus broadcast dims: no
    correlated per-row re-scan, no self-join explosion; this is the
    formulation that survives a 100 TB lineitem."""
    li = _t(spark, sf_dir, "lineitem")
    orders_f = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    late = (
        li.join(orders_f, li.l_orderkey == orders_f.o_orderkey)
        .filter(F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), LATE_DAYS))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    per_order_late = late.groupBy(F.col("l_orderkey").alias("lo_orderkey")).agg(
        F.count(F.lit(1)).alias("n_late"), F.max("l_suppkey").alias("only_late_supp")
    )
    per_order_supp = li.groupBy(F.col("l_orderkey").alias("so_orderkey")).agg(
        F.countDistinct("l_suppkey").alias("n_supp")
    )
    lone_late = (
        per_order_late.filter(F.col("n_late") == 1)
        .join(per_order_supp, F.col("lo_orderkey") == F.col("so_orderkey"))
        .filter(F.col("n_supp") >= 2)
        .select(F.col("only_late_supp").alias("w_suppkey"))
    )
    supplier = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation").filter(F.col("n_name") == Q21_NATION)
    return (
        lone_late.join(F.broadcast(supplier), F.col("w_suppkey") == supplier.s_suppkey)
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


Q22_NATIONKEYS = (1, 3, 5, 7, 9, 11, 13)
Q22_IDLE_SINCE = "1999-07-01 00:00:00"

Q22_ORACLE = f"""
WITH bucket AS (
  SELECT c_custkey, c_acctbal, c_nationkey
  FROM customer
  WHERE c_nationkey IN {Q22_NATIONKEYS}
),
threshold AS (
  SELECT {dec_sum_sql('c_acctbal')} / COUNT(*) AS avg_bal
  FROM bucket WHERE c_acctbal > 0.0
)
SELECT c_nationkey AS cntrycode, COUNT(*) AS numcust,
       {dec_sum_sql('c_acctbal')} AS totacctbal
FROM bucket, threshold
WHERE c_acctbal > avg_bal
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey
      AND o_orderdate >= TIMESTAMP '{Q22_IDLE_SINCE}'
  )
GROUP BY c_nationkey
"""


@register("q22_idle_customers", oracle=Q22_ORACLE, tags=("join", "agg", "subquery"))
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q22-style global sales opportunity: above-average-balance
    customers in selected nation buckets with no RECENT orders (every
    synthetic customer has some order, so idleness is bounded by date —
    same anti-join shape as the original's no-orders-at-all). The
    scalar AVG subquery broadcasts as a 1-row cross join; the NOT
    EXISTS runs as a left anti join against the date-pruned orders
    scan; one shuffle on custkey."""
    cust = _t(spark, sf_dir, "customer").filter(
        F.col("c_nationkey").isin(list(Q22_NATIONKEYS))
    )
    threshold = cust.filter(F.col("c_acctbal") > 0.0).agg(
        (dec_sum("c_acctbal") / F.count(F.lit(1))).alias("avg_bal")
    )
    recent = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.to_timestamp(F.lit(Q22_IDLE_SINCE))
    )
    return (
        cust.join(F.broadcast(threshold))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dec_sum("c_acctbal").alias("totacctbal"),
        )
    )


DISTRIBUTION_FN_ORACLE = """
SELECT o_orderkey, o_orderpriority,
       ROUND(percent_rank() OVER w, 9) AS pct_rank,
       ROUND(cume_dist() OVER w, 9) AS cume,
       ntile(10) OVER w AS decile
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
"""


@register("window_distribution_funcs", oracle=DISTRIBUTION_FN_ORACLE, tags=("window",))
def window_distribution_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: percent_rank / cume_dist /
    ntile(10) of order value within priority class. The o_orderkey
    tie-break makes the order TOTAL, so rank-derived ratios are the
    same exact integer divisions in both engines. One shuffle on the
    partition key, linear pass per partition."""
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.percent_rank().over(w), 9).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 9).alias("cume"),
        F.ntile(10).over(w).alias("decile"),
    )


RANGE_SORT_ORACLE = """
SELECT l_orderkey, l_linenumber, l_extendedprice,
       CAST(epoch_us(l_shipdate) AS BIGINT) AS shipdate_us
FROM lineitem
WHERE l_returnflag = 'R' AND l_discount >= 0.08
"""


@register("sort_range_partitioned", oracle=RANGE_SORT_ORACLE, tags=("sort", "scale"))
def sort_range_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed total-order sort: ``repartitionByRange`` samples the
    sort key to build range boundaries, every partition receives a
    disjoint key range, and ``sortWithinPartitions`` finishes locally —
    partition i's rows all precede partition i+1's, so writing the
    partitions in order yields a globally sorted dataset without ever
    moving all rows to one node (the only scalable shape for "ORDER BY
    the whole table" output jobs at 100 TB; contrast
    ``sort_topk_global``, which is the right shape when only k rows
    survive). The driver's hash compare is order-insensitive, so the
    oracle checks the filtered row SET; the global ordering itself is
    plan-gated (RangePartitioning + in-partition Sort, no single
    partition) and value-checked in tests/test_plans.py."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter((F.col("l_returnflag") == "R") & (F.col("l_discount") >= 0.08))
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_extendedprice",
            F.unix_micros("l_shipdate").alias("shipdate_us"),
        )
        .repartitionByRange(8, F.desc("l_extendedprice"), "l_orderkey", "l_linenumber")
        .sortWithinPartitions(F.desc("l_extendedprice"), "l_orderkey", "l_linenumber")
    )


# ---- Z-order clustering -------------------------------------------------
# Morton interleave of two 16-bit keys via the classic mask-shift spread
# (each step doubles the gap between a value's bits; 4 steps spread 16
# bits across 32). Pure 64-bit integer ops, written once and rendered
# into BOTH engines so the oracle replays the identical bit math.
_ZORDER_SPREAD_STEPS = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def _zspread(c: Column) -> Column:
    x = c.bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _ZORDER_SPREAD_STEPS:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def _zspread_sql(expr: str) -> str:
    x = f"({expr} & 65535)"
    for shift, mask in _ZORDER_SPREAD_STEPS:
        x = f"(({x} | ({x} << {shift})) & {mask})"
    return x


_ZNORM_PK = "((l_partkey - min_pk) * 65535 // GREATEST(max_pk - min_pk, 1))"
_ZNORM_SK = "((l_suppkey - min_sk) * 65535 // GREATEST(max_sk - min_sk, 1))"

ZORDER_ORACLE = f"""
WITH f AS (
  SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'
), s AS (
  SELECT CAST(MIN(l_partkey) AS BIGINT) AS min_pk, CAST(MAX(l_partkey) AS BIGINT) AS max_pk,
         CAST(MIN(l_suppkey) AS BIGINT) AS min_sk, CAST(MAX(l_suppkey) AS BIGINT) AS max_sk
  FROM f
)
SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
       ({_zspread_sql(_ZNORM_PK)} | ({_zspread_sql(_ZNORM_SK)} << 1)) AS zval
FROM f, s
"""


@register("sort_zorder_interleave", oracle=ZORDER_ORACLE, tags=("sort", "scale"))
def sort_zorder_interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton-curve) clustering of lineitem on
    (l_partkey, l_suppkey): interleave the low 16 bits of both keys into
    one 32-bit z-value, then range-partition + locally sort on it.

    Why this exists: min/max-statistics data skipping (parquet row
    groups, Delta/Iceberg file pruning) only prunes on the leading sort
    column — a plain ORDER BY l_partkey leaves l_suppkey scattered, so
    supplier-predicate scans read everything. Interleaving bits makes
    file-level min/max ranges tight in BOTH dimensions at once (each
    partition of 2^k z-span covers ~2^(k/2) of each key), so point or
    band predicates on either key skip ~sqrt instead of nothing — the
    standard multi-dimensional clustering layout for 100 TB fact tables
    (Delta OPTIMIZE ZORDER does exactly this). The locality property is
    asserted empirically in tests/test_plans.py: per-partition key
    ranges shrink in both dimensions vs a single-column sort.

    Keys are min-max normalized onto the full 16-bit domain first (a
    broadcast one-row stats frame; exact integer scaling) — raw low-bit
    interleaving would waste resolution whenever one key's range is much
    narrower than the other's (TPC-H suppkey spans ~1% of partkey), so
    the curve would degenerate to a single-column sort in the narrow
    dimension. Delta's OPTIMIZE ZORDER equalizes dimensions the same way
    (range-bucketing each column before interleaving).

    The spread is 4 mask-shift steps per key — pure 64-bit integer ops
    inside whole-stage codegen, no UDF; the oracle replays the same bit
    arithmetic rendered from the same step table. RangePartitioning
    samples z-values for balanced output files exactly as in
    ``sort_range_partitioned`` (same two-level scale shape)."""
    li = _t(spark, sf_dir, "lineitem")
    f = li.filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    stats = f.agg(
        F.min("l_partkey").cast("long").alias("min_pk"),
        F.max("l_partkey").cast("long").alias("max_pk"),
        F.min("l_suppkey").cast("long").alias("min_sk"),
        F.max("l_suppkey").cast("long").alias("max_sk"),
    )
    norm_pk = F.expr(f"CAST({_ZNORM_PK.replace('//', ' DIV ')} AS BIGINT)")
    norm_sk = F.expr(f"CAST({_ZNORM_SK.replace('//', ' DIV ')} AS BIGINT)")
    z = _zspread(norm_pk).bitwiseOR(F.shiftleft(_zspread(norm_sk), 1))
    return (
        f.crossJoin(F.broadcast(stats))
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", z.alias("zval"))
        .repartitionByRange(16, "zval")
        .sortWithinPartitions("zval", "l_orderkey", "l_linenumber")
    )


# ---- nearest-direction as-of join ---------------------------------------
ASOF_NEAREST_ORACLE = """
WITH tagged AS (
  SELECT user_id AS k, CAST(epoch_us(ts) AS BIGINT) AS t_us,
         CASE WHEN event_type = 'error' THEN 0 ELSE 1 END AS side,
         CASE WHEN event_type = 'error' THEN event_id END AS err_id,
         CASE WHEN event_type = 'error' THEN CAST(epoch_us(ts) AS BIGINT) END AS err_t,
         CASE WHEN event_type = 'purchase' THEN event_id END AS purchase_id
  FROM events WHERE event_type IN ('error', 'purchase')
), back AS (
  SELECT *,
         last_value(err_id IGNORE NULLS) OVER wb AS b_id,
         last_value(err_t IGNORE NULLS) OVER wb AS b_t
  FROM tagged
  WINDOW wb AS (PARTITION BY k ORDER BY t_us, side, err_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), bidir AS (
  SELECT *,
         last_value(err_id IGNORE NULLS) OVER wf AS f_id,
         last_value(err_t IGNORE NULLS) OVER wf AS f_t
  FROM back
  WINDOW wf AS (PARTITION BY k ORDER BY t_us DESC, side ASC, err_id DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT purchase_id, k AS user_id, t_us AS purchase_ts_us,
       CASE WHEN b_id IS NOT NULL AND (f_id IS NULL OR t_us - b_t <= f_t - t_us)
            THEN b_id ELSE f_id END AS nearest_error_id,
       CASE WHEN b_id IS NULL AND f_id IS NULL THEN NULL
            WHEN b_id IS NOT NULL AND (f_id IS NULL OR t_us - b_t <= f_t - t_us)
            THEN 'backward' ELSE 'forward' END AS direction,
       CASE WHEN b_id IS NOT NULL AND (f_id IS NULL OR t_us - b_t <= f_t - t_us)
            THEN t_us - b_t ELSE f_t - t_us END AS delta_us
FROM bidir WHERE side = 1
"""


@register("join_asof_nearest", oracle=ASOF_NEAREST_ORACLE, tags=("join", "asof"))
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-direction as-of join (pandas ``merge_asof
    direction='nearest'``): for every purchase, the error event by the
    same user closest in time in EITHER direction, ties to the earlier
    (backward) side.

    Same union+window construction as ``join_asof_last_error`` — tag
    both sides into one stream, then one ascending last-ignorenulls
    window for the backward candidate and one descending for the
    forward candidate, nearest picked by exact integer |delta| compare.
    Two linear window passes over each user's partition, no range
    self-join (the naive t-band join is quadratic in event density).
    Equal-timestamp errors are visible to both windows (side orders
    errors first in each direction) and resolve backward with delta 0.
    """
    ev = _t(spark, sf_dir, "events")
    t_us = F.unix_micros(F.col("ts"))
    tagged = ev.filter(F.col("event_type").isin("error", "purchase")).select(
        F.col("user_id").alias("k"),
        t_us.alias("t_us"),
        F.when(F.col("event_type") == "error", 0).otherwise(1).alias("side"),
        F.when(F.col("event_type") == "error", F.col("event_id")).alias("err_id"),
        F.when(F.col("event_type") == "error", t_us).alias("err_t"),
        F.when(F.col("event_type") == "purchase", F.col("event_id")).alias("purchase_id"),
    )
    wb = (
        W.partitionBy("k")
        .orderBy("t_us", "side", "err_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wf = (
        W.partitionBy("k")
        .orderBy(F.desc("t_us"), F.asc("side"), F.desc("err_id"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    both = (
        tagged.withColumn("b_id", F.last("err_id", ignorenulls=True).over(wb))
        .withColumn("b_t", F.last("err_t", ignorenulls=True).over(wb))
        .withColumn("f_id", F.last("err_id", ignorenulls=True).over(wf))
        .withColumn("f_t", F.last("err_t", ignorenulls=True).over(wf))
    )
    pick_back = F.col("b_id").isNotNull() & (
        F.col("f_id").isNull()
        | ((F.col("t_us") - F.col("b_t")) <= (F.col("f_t") - F.col("t_us")))
    )
    return both.filter(F.col("side") == 1).select(
        "purchase_id",
        F.col("k").alias("user_id"),
        F.col("t_us").alias("purchase_ts_us"),
        F.when(pick_back, F.col("b_id")).otherwise(F.col("f_id")).alias("nearest_error_id"),
        F.when(F.col("b_id").isNull() & F.col("f_id").isNull(), F.lit(None).cast("string"))
        .when(pick_back, F.lit("backward"))
        .otherwise(F.lit("forward"))
        .alias("direction"),
        F.when(pick_back, F.col("t_us") - F.col("b_t"))
        .otherwise(F.col("f_t") - F.col("t_us"))
        .alias("delta_us"),
    )


# ---------------------------------------------------------------------------
# Interval-overlap self-join via time-grid bucketing.
# ---------------------------------------------------------------------------

IVL_GRID_DAYS = 90  # grid cell width; candidates must share a cell
IVL_SAMPLE_MOD = 100  # orders subset (o_orderkey % MOD == 0) to bound pair volume

IVL_OVERLAP_ORACLE = f"""
WITH iv AS (
  SELECT o.o_orderkey AS k,
         CAST(o.o_orderdate AS DATE) AS s,
         CAST(MAX(l.l_shipdate) AS DATE) AS e
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
  WHERE o.o_orderkey % {IVL_SAMPLE_MOD} = 0
  GROUP BY 1, 2
)
SELECT a.k AS key_a, b.k AS key_b,
       CAST(date_diff('day', GREATEST(a.s, b.s), LEAST(a.e, b.e)) + 1 AS BIGINT)
         AS overlap_days
FROM iv a JOIN iv b
  ON a.k < b.k AND a.s <= b.e AND b.s <= a.e
"""


@register(
    "join_interval_overlap",
    oracle=IVL_OVERLAP_ORACLE,
    tags=("join", "range", "scale"),
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval×interval overlap join (order lifespans that coincide,
    with the overlap length) — the temporal-join shape a naive
    non-equi self-join turns into a cartesian at scale. Here each
    interval is exploded onto a {IVL_GRID_DAYS}-day grid and pairs are
    generated ONLY within grid cells (equi-join on cell id — hash
    partitionable), then exactness-filtered and deduplicated by
    crediting each pair to ONE cell (the cell of the later start):
    candidate-complete because two overlapping intervals always share
    the cell containing max(s_a, s_b), and duplicate-free without a
    distinct over the pair set. Work scales with overlap density per
    cell, not with n². The oracle runs the naive predicate join — same
    pairs, proving the grid decomposition exact."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    iv = (
        orders.filter(F.col("o_orderkey") % IVL_SAMPLE_MOD == 0)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy(
            F.col("o_orderkey").alias("k"),
            F.to_date("o_orderdate").alias("s"),
        )
        .agg(F.max(F.to_date("l_shipdate")).alias("e"))
    )
    epoch = F.lit("1970-01-01").cast("date")
    cell = lambda c: F.floor(F.datediff(c, epoch) / IVL_GRID_DAYS).cast("long")
    g = iv.select(
        "k", "s", "e",
        cell(F.col("s")).alias("c_lo"),
        cell(F.col("e")).alias("c_hi"),
    ).withColumn("cell", F.explode(F.sequence("c_lo", "c_hi")))
    a, b = g.alias("a"), g.alias("b")
    pairs = a.join(
        b,
        (F.col("a.cell") == F.col("b.cell"))
        & (F.col("a.k") < F.col("b.k"))
        & (F.col("a.s") <= F.col("b.e"))
        & (F.col("b.s") <= F.col("a.e"))
        # credit the pair to exactly one shared cell: the one holding
        # the later of the two starts
        & (F.col("a.cell") == cell(F.greatest(F.col("a.s"), F.col("b.s")))),
    )
    return pairs.select(
        F.col("a.k").alias("key_a"),
        F.col("b.k").alias("key_b"),
        (
            F.datediff(
                F.least(F.col("a.e"), F.col("b.e")),
                F.greatest(F.col("a.s"), F.col("b.s")),
            )
            + 1
        )
        .cast("long")
        .alias("overlap_days"),
    )


# ---- Hilbert-curve clustering (locality-optimal multi-dim layout) -------

HILBERT_BITS = 8  # per-axis resolution; index spans [0, 2^16)


def _hilbert_level_exprs(s: int) -> dict[str, str]:
    """One xy2d level at quadrant size ``s``: emit (d increment, next
    x, next y) as engine-neutral SQL over columns x, y. Uses div/mod
    (not bit ops) and masks the processed bit off before the
    rotate/flip, so every intermediate stays in [0, s). The quadrant
    order is the classic U: (0,0)->0, (0,1)->1, (1,1)->2, (1,0)->3,
    i.e. ((3*rx) XOR ry) rendered as a CASE."""
    rx = f"((x // {s}) % 2)"
    ry = f"((y // {s}) % 2)"
    quad = (
        f"(CASE WHEN {rx} = 0 AND {ry} = 0 THEN 0 WHEN {rx} = 0 THEN 1 "
        f"WHEN {ry} = 1 THEN 2 ELSE 3 END)"
    )
    xm, ym = f"(x % {s})", f"(y % {s})"
    flip_x = f"(CASE WHEN {rx} = 1 THEN {s - 1} - {ym} ELSE {ym} END)"
    flip_y = f"(CASE WHEN {rx} = 1 THEN {s - 1} - {xm} ELSE {xm} END)"
    return {
        "dd": f"{s * s} * {quad}",
        "x_next": f"(CASE WHEN {ry} = 0 THEN {flip_x} ELSE {xm} END)",
        "y_next": f"(CASE WHEN {ry} = 0 THEN {flip_y} ELSE {ym} END)",
    }


def _hilbert_sql_ctes(base_cte: str, key_cols: str) -> str:
    """Chain of CTEs lvl1..lvlB applying the unrolled xy2d levels to a
    base CTE exposing columns (key_cols, x, y); final level carries
    d = the Hilbert index."""
    parts = [f"lvl0 AS (SELECT {key_cols}, x, y, 0 AS d FROM {base_cte})"]
    prev = "lvl0"
    for i in range(HILBERT_BITS):
        s = 1 << (HILBERT_BITS - 1 - i)
        e = _hilbert_level_exprs(s)
        parts.append(
            f"lvl{i + 1} AS (SELECT {key_cols}, {e['x_next']} AS x, "
            f"{e['y_next']} AS y, d + {e['dd']} AS d FROM {prev})"
        )
        prev = f"lvl{i + 1}"
    return ", ".join(parts), prev


def hilbert_index_frame(df: DataFrame) -> DataFrame:
    """Append column ``hval`` = Hilbert index of integer columns (x, y)
    in [0, 2^HILBERT_BITS) to any frame — the same unrolled levels the
    oracle renders, executed via F.expr so both engines evaluate one
    arithmetic tree. Pure codegen integer ops, no UDF, no shuffle."""
    df = df.withColumn("d", F.lit(0))
    for i in range(HILBERT_BITS):
        s = 1 << (HILBERT_BITS - 1 - i)
        e = _hilbert_level_exprs(s)
        df = df.withColumns(
            {
                "d": F.col("d") + F.expr(e["dd"].replace("//", " DIV ")),
                "x": F.expr(e["x_next"].replace("//", " DIV ")),
                "y": F.expr(e["y_next"].replace("//", " DIV ")),
            }
        )
    return df.withColumn("hval", F.col("d").cast("long"))


_HNORM_PK = f"((l_partkey - min_pk) * {(1 << HILBERT_BITS) - 1} // GREATEST(max_pk - min_pk, 1))"
_HNORM_SK = f"((l_suppkey - min_sk) * {(1 << HILBERT_BITS) - 1} // GREATEST(max_sk - min_sk, 1))"


def _hilbert_oracle() -> str:
    ctes, last = _hilbert_sql_ctes("n", "l_orderkey, l_linenumber, l_partkey, l_suppkey")
    return f"""
WITH f AS (
  SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'
), s AS (
  SELECT CAST(MIN(l_partkey) AS BIGINT) AS min_pk, CAST(MAX(l_partkey) AS BIGINT) AS max_pk,
         CAST(MIN(l_suppkey) AS BIGINT) AS min_sk, CAST(MAX(l_suppkey) AS BIGINT) AS max_sk
  FROM f
), n AS (
  SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
         CAST({_HNORM_PK} AS BIGINT) AS x, CAST({_HNORM_SK} AS BIGINT) AS y
  FROM f, s
), {ctes}
SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, CAST(d AS BIGINT) AS hval
FROM {last}
"""


@register("sort_hilbert_interleave", oracle=_hilbert_oracle(), tags=("sort", "scale"))
def sort_hilbert_interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert-curve clustering of lineitem on (l_partkey, l_suppkey) —
    the locality-optimal upgrade of ``sort_zorder_interleave``: the
    Hilbert curve visits every cell of the 2^8 x 2^8 normalized grid in
    unit Manhattan steps (no Morton 'seams' where the curve jumps
    across the keyspace), so consecutive index ranges map to tighter
    key rectangles and min/max file skipping prunes strictly better on
    band predicates (Databricks liquid clustering and Iceberg both
    offer Hilbert ordering for exactly this reason; the unit-step
    property and the beats-Morton adjacent-gap comparison are asserted
    from first principles in tests/test_plans.py).

    Same scale shape as z-order: one broadcast min/max stats frame for
    exact integer normalization, then the 8 unrolled xy2d levels —
    div/mod/CASE integer arithmetic inside whole-stage codegen (the
    oracle renders the SAME level expressions into chained CTEs) —
    then range-partition + local sort on hval. No UDF, no extra
    shuffle beyond the one RangePartitioning any clustering rewrite
    pays."""
    li = _t(spark, sf_dir, "lineitem")
    f = li.filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    stats = f.agg(
        F.min("l_partkey").cast("long").alias("min_pk"),
        F.max("l_partkey").cast("long").alias("max_pk"),
        F.min("l_suppkey").cast("long").alias("min_sk"),
        F.max("l_suppkey").cast("long").alias("max_sk"),
    )
    base = f.crossJoin(F.broadcast(stats)).select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        "l_suppkey",
        F.expr(f"CAST({_HNORM_PK.replace('//', ' DIV ')} AS BIGINT)").alias("x"),
        F.expr(f"CAST({_HNORM_SK.replace('//', ' DIV ')} AS BIGINT)").alias("y"),
    )
    return (
        hilbert_index_frame(base)
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "hval")
        .repartitionByRange(16, "hval")
        .sortWithinPartitions("hval", "l_orderkey", "l_linenumber")
    )


# ---- min/max data-skipping simulator across physical layouts ------------

SKIP_N_FILES = 256  # file budget per simulated layout
# band predicate: the middle [25%, 35%] slice of each key's range
SKIP_BAND_LO_PCT, SKIP_BAND_HI_PCT = 25, 35


def _skip_oracle() -> str:
    zorder = ZORDER_ORACLE.strip()
    hilbert = _hilbert_oracle().strip()
    return f"""
WITH zsrc AS ({zorder}),
hsrc AS ({hilbert}),
base AS (
  SELECT l_orderkey, l_partkey, l_suppkey FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'
), st AS (
  SELECT CAST(MIN(l_orderkey) AS BIGINT) AS min_ok, CAST(MAX(l_orderkey) AS BIGINT) AS max_ok,
         CAST(MIN(l_partkey) AS BIGINT) AS min_pk, CAST(MAX(l_partkey) AS BIGINT) AS max_pk,
         CAST(MIN(l_suppkey) AS BIGINT) AS min_sk, CAST(MAX(l_suppkey) AS BIGINT) AS max_sk
  FROM base
), assigned AS (
  SELECT 'natural' AS layout,
         LEAST((b.l_orderkey - st.min_ok) * {SKIP_N_FILES}
               // GREATEST(st.max_ok - st.min_ok + 1, 1), {SKIP_N_FILES} - 1) AS file_id,
         b.l_partkey, b.l_suppkey
  FROM base b, st
  UNION ALL
  SELECT 'sort_partkey',
         LEAST((b.l_partkey - st.min_pk) * {SKIP_N_FILES}
               // GREATEST(st.max_pk - st.min_pk + 1, 1), {SKIP_N_FILES} - 1),
         b.l_partkey, b.l_suppkey
  FROM base b, st
  UNION ALL
  SELECT 'zorder', z.zval // {(1 << 32) // SKIP_N_FILES}, z.l_partkey, z.l_suppkey
  FROM zsrc z
  UNION ALL
  SELECT 'hilbert', h.hval // {(1 << 16) // SKIP_N_FILES}, h.l_partkey, h.l_suppkey
  FROM hsrc h
), bands AS (
  SELECT st.min_pk + (st.max_pk - st.min_pk) * {SKIP_BAND_LO_PCT} // 100 AS pk_lo,
         st.min_pk + (st.max_pk - st.min_pk) * {SKIP_BAND_HI_PCT} // 100 AS pk_hi,
         st.min_sk + (st.max_sk - st.min_sk) * {SKIP_BAND_LO_PCT} // 100 AS sk_lo,
         st.min_sk + (st.max_sk - st.min_sk) * {SKIP_BAND_HI_PCT} // 100 AS sk_hi
  FROM st
), files AS (
  SELECT layout, file_id,
         CAST(COUNT(*) AS BIGINT) AS rows_in_file,
         MIN(l_partkey) AS f_min_pk, MAX(l_partkey) AS f_max_pk,
         MIN(l_suppkey) AS f_min_sk, MAX(l_suppkey) AS f_max_sk
  FROM assigned GROUP BY 1, 2
)
SELECT layout,
       CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(SUM(rows_in_file) AS BIGINT) AS n_rows,
       CAST(COUNT(*) FILTER (f_min_pk <= pk_hi AND f_max_pk >= pk_lo
                             AND f_min_sk <= sk_hi AND f_max_sk >= sk_lo)
            AS BIGINT) AS files_read,
       CAST(COALESCE(SUM(rows_in_file) FILTER (f_min_pk <= pk_hi AND f_max_pk >= pk_lo
                             AND f_min_sk <= sk_hi AND f_max_sk >= sk_lo), 0)
            AS BIGINT) AS rows_read,
       CAST(COUNT(*) FILTER (f_min_pk <= pk_hi AND f_max_pk >= pk_lo
                             AND f_min_sk <= sk_hi AND f_max_sk >= sk_lo)
            * 1000000 // COUNT(*) AS BIGINT) AS read_frac_e6
FROM files, bands
GROUP BY layout, pk_lo, pk_hi, sk_lo, sk_hi
"""


@register("sink_skipping_stats", oracle=_skip_oracle(), tags=("sort", "scale", "sink"))
def sink_skipping_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min/max data-skipping simulator: lay the SAME fact slice out
    four ways — natural (insert) order, single-column sort, z-order,
    Hilbert — cut each layout into {SKIP_N_FILES} fixed-span files,
    collect per-file min/max zone maps, and count the files a
    two-dimensional band predicate (the middle ~10% of each key's
    range) would have to read. This turns the clustering debate into a
    number: natural order reads ~everything, a single-column sort
    prunes only its own dimension, the space-filling curves prune both
    (ordering asserted in tests/test_plans.py).

    Reuses the REAL layout operators — the z-order and Hilbert values
    come from the same code paths (and the oracle composes their
    oracle SQL verbatim as CTEs), so the simulator certifies the
    layouts actually shipped, not a reimplementation. All file
    assignment is exact integer arithmetic on the layout keys; the
    whole simulation is two aggregates over the slice per layout —
    the shape of a metadata-only planning query at 100 TB."""
    zf = sort_zorder_interleave(spark, sf_dir)
    hf = sort_hilbert_interleave(spark, sf_dir)
    base = (
        _t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
        )
        .select("l_orderkey", "l_partkey", "l_suppkey")
    )
    st = base.agg(
        F.min("l_orderkey").cast("long").alias("min_ok"),
        F.max("l_orderkey").cast("long").alias("max_ok"),
        F.min("l_partkey").cast("long").alias("min_pk"),
        F.max("l_partkey").cast("long").alias("max_pk"),
        F.min("l_suppkey").cast("long").alias("min_sk"),
        F.max("l_suppkey").cast("long").alias("max_sk"),
    ).transform(pin)
    # ^ the one-row stats frame feeds both span-file arms AND the band
    # bounds; unpinned, each consumer re-ran the base slice scan (r07
    # plan-scan audit; 3.51 → 3.14 s best-of-3 at sf0.1). The four
    # layout arms themselves scan by design — they ARE the comparison.

    def span_file(key, lo, hi):
        return F.least(
            F.floor(
                (F.col(key) - F.col(lo))
                * SKIP_N_FILES
                / F.greatest(F.col(hi) - F.col(lo) + 1, F.lit(1))
            ),
            F.lit(SKIP_N_FILES - 1),
        ).cast("long")

    bs = base.crossJoin(F.broadcast(st))
    natural = bs.select(
        F.lit("natural").alias("layout"),
        span_file("l_orderkey", "min_ok", "max_ok").alias("file_id"),
        "l_partkey",
        "l_suppkey",
    )
    sorted_pk = bs.select(
        F.lit("sort_partkey").alias("layout"),
        span_file("l_partkey", "min_pk", "max_pk").alias("file_id"),
        "l_partkey",
        "l_suppkey",
    )
    zorder = zf.select(
        F.lit("zorder").alias("layout"),
        F.floor(F.col("zval") / ((1 << 32) // SKIP_N_FILES)).cast("long").alias("file_id"),
        "l_partkey",
        "l_suppkey",
    )
    hilbert = hf.select(
        F.lit("hilbert").alias("layout"),
        F.floor(F.col("hval") / ((1 << 16) // SKIP_N_FILES)).cast("long").alias("file_id"),
        "l_partkey",
        "l_suppkey",
    )
    from functools import reduce

    assigned = reduce(DataFrame.unionByName, (natural, sorted_pk, zorder, hilbert))
    files = assigned.groupBy("layout", "file_id").agg(
        F.count(F.lit(1)).cast("long").alias("rows_in_file"),
        F.min("l_partkey").alias("f_min_pk"),
        F.max("l_partkey").alias("f_max_pk"),
        F.min("l_suppkey").alias("f_min_sk"),
        F.max("l_suppkey").alias("f_max_sk"),
    )
    bands = st.select(
        (F.col("min_pk") + F.floor((F.col("max_pk") - F.col("min_pk")) * SKIP_BAND_LO_PCT / 100)).alias("pk_lo"),
        (F.col("min_pk") + F.floor((F.col("max_pk") - F.col("min_pk")) * SKIP_BAND_HI_PCT / 100)).alias("pk_hi"),
        (F.col("min_sk") + F.floor((F.col("max_sk") - F.col("min_sk")) * SKIP_BAND_LO_PCT / 100)).alias("sk_lo"),
        (F.col("min_sk") + F.floor((F.col("max_sk") - F.col("min_sk")) * SKIP_BAND_HI_PCT / 100)).alias("sk_hi"),
    )
    hit = (
        (F.col("f_min_pk") <= F.col("pk_hi"))
        & (F.col("f_max_pk") >= F.col("pk_lo"))
        & (F.col("f_min_sk") <= F.col("sk_hi"))
        & (F.col("f_max_sk") >= F.col("sk_lo"))
    )
    return (
        files.crossJoin(F.broadcast(bands))
        .groupBy("layout")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_files"),
            F.sum("rows_in_file").cast("long").alias("n_rows"),
            F.sum(hit.cast("long")).cast("long").alias("files_read"),
            F.coalesce(
                F.sum(F.when(hit, F.col("rows_in_file"))), F.lit(0)
            ).cast("long").alias("rows_read"),
            F.floor(
                F.sum(hit.cast("long")) * 1_000_000 / F.count(F.lit(1))
            ).cast("long").alias("read_frac_e6"),
        )
    )


# ---------------------------------------------------------------------------
# As-of join with linear interpolation (time-weighted value at query time)
# ---------------------------------------------------------------------------

ASOF_INTERP_ORACLE = """
WITH v AS (
  SELECT user_id, epoch_us(ts) AS t, event_id,
         CAST(round(value * 100) AS BIGINT) AS vc
  FROM events WHERE event_type = 'view'
), p AS (
  SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS t
  FROM events WHERE event_type = 'purchase'
), b AS (
  SELECT p.purchase_id, p.user_id, p.t,
         (SELECT max(v.t) FROM v
            WHERE v.user_id = p.user_id AND v.t <= p.t) AS tb,
         (SELECT min(v.t) FROM v
            WHERE v.user_id = p.user_id AND v.t > p.t) AS tf
  FROM p
), vbj AS (
  SELECT b.purchase_id, v.vc,
         ROW_NUMBER() OVER (PARTITION BY b.purchase_id
                            ORDER BY v.event_id DESC) AS rn
  FROM b JOIN v ON v.user_id = b.user_id AND v.t = b.tb
), vfj AS (
  SELECT b.purchase_id, v.vc,
         ROW_NUMBER() OVER (PARTITION BY b.purchase_id
                            ORDER BY v.event_id ASC) AS rn
  FROM b JOIN v ON v.user_id = b.user_id AND v.t = b.tf
)
SELECT b.purchase_id, b.user_id,
       b.t AS purchase_t_us, b.tb AS tb_us, b.tf AS tf_us,
       CASE WHEN b.tb IS NOT NULL AND b.tf IS NOT NULL
              THEN (vb.vc * (b.tf - b.t) + vf.vc * (b.t - b.tb)) // (b.tf - b.tb)
            WHEN b.tb IS NOT NULL THEN vb.vc
            WHEN b.tf IS NOT NULL THEN vf.vc END AS interp_value_c,
       CASE WHEN b.tb IS NOT NULL AND b.tf IS NOT NULL THEN 'interp'
            WHEN b.tb IS NOT NULL THEN 'back_only'
            WHEN b.tf IS NOT NULL THEN 'fwd_only'
            ELSE 'none' END AS mode
FROM b
LEFT JOIN (SELECT purchase_id, vc FROM vbj WHERE rn = 1) vb USING (purchase_id)
LEFT JOIN (SELECT purchase_id, vc FROM vfj WHERE rn = 1) vf USING (purchase_id)
"""


@register("join_asof_interpolate", oracle=ASOF_INTERP_ORACLE, tags=("join", "asof", "window"))
def join_asof_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolating as-of join (the kdb/TimescaleDB ``interpolate``
    companion to plain as-of): for every purchase, the same user's
    'view' VALUE linearly time-interpolated at the purchase instant
    from the bracketing view events — last view at-or-before and first
    view strictly after; edge cases hold the single available side
    (LOCF / NOCB) and tag the mode. Values are ×100 fixed-point cents
    and the interpolation is exact integer arithmetic
    ``(vb·(tf−t) + vf·(t−tb)) div (tf−tb)`` — no engine-divergent
    doubles.

    Same two-window union construction as ``join_asof_nearest``
    (tag both sides into one per-user stream; ascending last-ignorenulls
    for the backward bracket, descending for the forward one) — two
    linear window passes per user partition, never a range self-join,
    so event-dense users cost O(n log n) sort, not O(n²) pairs.
    Equal-timestamp semantics: a view AT the purchase instant is the
    backward bracket (weight collapses to it exactly); the forward
    bracket is strictly later; window tie order (event_id) matches the
    oracle's deterministic pick."""
    ev = _t(spark, sf_dir, "events")
    t_us = F.unix_micros(F.col("ts"))
    is_view = F.col("event_type") == "view"
    tagged = ev.filter(F.col("event_type").isin("view", "purchase")).select(
        F.col("user_id").alias("k"),
        t_us.alias("t_us"),
        F.col("event_id").alias("eid"),
        F.when(is_view, 0).otherwise(1).alias("side"),
        F.when(is_view, t_us).alias("v_t"),
        F.when(is_view, F.round(F.col("value") * 100).cast("long")).alias("v_c"),
    )
    wb = (
        W.partitionBy("k")
        .orderBy("t_us", "side", "eid")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wf = (
        W.partitionBy("k")
        .orderBy(F.desc("t_us"), F.desc("side"), F.desc("eid"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    both = (
        tagged.withColumn("tb", F.last("v_t", ignorenulls=True).over(wb))
        .withColumn("vb", F.last("v_c", ignorenulls=True).over(wb))
        .withColumn("tf", F.last("v_t", ignorenulls=True).over(wf))
        .withColumn("vf", F.last("v_c", ignorenulls=True).over(wf))
    )
    interp = F.when(
        F.col("tb").isNotNull() & F.col("tf").isNotNull(),
        F.expr("(vb * (tf - t_us) + vf * (t_us - tb)) div (tf - tb)"),
    ).when(F.col("tb").isNotNull(), F.col("vb")).otherwise(F.col("vf"))
    return both.filter(F.col("side") == 1).select(
        F.col("eid").alias("purchase_id"),
        F.col("k").alias("user_id"),
        F.col("t_us").alias("purchase_t_us"),
        F.col("tb").alias("tb_us"),
        F.col("tf").alias("tf_us"),
        interp.alias("interp_value_c"),
        F.when(F.col("tb").isNotNull() & F.col("tf").isNotNull(), F.lit("interp"))
        .when(F.col("tb").isNotNull(), F.lit("back_only"))
        .when(F.col("tf").isNotNull(), F.lit("fwd_only"))
        .otherwise(F.lit("none"))
        .alias("mode"),
    )


# ---------------------------------------------------------------------------
# Exact distributed median via two-pass bucket selection
# ---------------------------------------------------------------------------

_MED_BUCKET_C = 100_000  # bucket width in cents ($1000)

EXACT_MEDIAN_ORACLE = f"""
WITH v AS (
  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS vc FROM lineitem
), ranked AS (
  SELECT vc, ROW_NUMBER() OVER (ORDER BY vc) AS rn, COUNT(*) OVER () AS n
  FROM v
)
SELECT CAST(n AS BIGINT) AS n_rows,
       CAST((n + 1) // 2 AS BIGINT) AS median_rank,
       vc AS median_cents
FROM ranked WHERE rn = (n + 1) // 2
"""


@register("sort_exact_median_twopass", oracle=EXACT_MEDIAN_ORACLE, tags=("sort", "agg", "scale"))
def sort_exact_median_twopass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT global median (lower median) of l_extendedprice without a
    global sort — the two-pass distributed selection pattern: pass 1
    histograms values into $1000 buckets (one narrow aggregate);
    cumulative counts over the TINY bucket table locate the single
    bucket containing the target rank; pass 2 ranks only inside that
    bucket (~N/#buckets rows) and picks the residual offset. This is
    the scale answer when percentile_approx's error bound isn't
    acceptable: a full sort of 100 TB is a terabyte-scale shuffle,
    while this plan shuffles the ~10⁵-row histogram plus one bucket's
    rows. Generalizes to any rank/quantile set (run pass 2 once per
    selected bucket).

    The only single-partition stages are the cumulative window over
    the bucket histogram (#buckets rows, keyed via ``tiny_frame_key``
    so WindowExec gets an explicit spec) and the in-bucket rank
    (bounded by bucket occupancy — widen buckets or recurse the same
    trick if a bucket is hot). Values are exact
    integer cents; rank ties collapse on equal values, so the result
    is deterministic with no tie-break column needed."""
    li = load_table(spark, sf_dir, "lineitem")
    v = li.select(F.round(F.col("l_extendedprice") * 100).cast("long").alias("vc"))
    hist = v.groupBy(
        (F.col("vc") - F.pmod("vc", F.lit(_MED_BUCKET_C))).alias("b")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    wc = (
        W.partitionBy(tiny_frame_key("b"))
        .orderBy("b")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wn = W.partitionBy(tiny_frame_key("b")).rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    cum = hist.select(
        "b", "cnt", F.sum("cnt").over(wc).alias("cum"), F.sum("cnt").over(wn).alias("n")
    )
    sel = (
        cum.filter(F.col("cum") >= F.expr("(n + 1) div 2"))
        .orderBy("b")
        .limit(1)
        .select(
            "b",
            F.col("n").alias("n_rows"),
            F.expr("(n + 1) div 2").alias("median_rank"),
            F.expr("(n + 1) div 2 - (cum - cnt)").alias("off"),
        )
    )
    in_bucket = v.join(
        F.broadcast(sel),
        (F.col("vc") - F.pmod("vc", F.lit(_MED_BUCKET_C))) == F.col("b"),
    )
    wr = W.partitionBy(tiny_frame_key("vc")).orderBy("vc")
    picked = in_bucket.select(
        "n_rows", "median_rank", "vc", "off", F.row_number().over(wr).alias("rn")
    ).filter(F.col("rn") == F.col("off"))
    return picked.select(
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("median_rank").cast("long").alias("median_rank"),
        F.col("vc").alias("median_cents"),
    )
