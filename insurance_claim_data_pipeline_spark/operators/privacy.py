"""Privacy-governance reports: k-anonymity and l-diversity audits.

A training-data pipeline that exports analytical extracts has to answer
"can a row be re-identified from its quasi-identifiers?" before
publishing. These operators produce the two standard audit frames
(Sweeney's k-anonymity; Machanavajjhala's l-diversity) over a
quasi-identifier projection of the orders table:

- ``privacy_k_anonymity`` — equivalence-class sizes of the QI tuple
  (priority, status, order month); classes with k < K_MIN would let an
  attacker who knows a target's QI values single them out among < K
  candidates, so they must be suppressed or generalized before export.
- ``privacy_l_diversity`` — within each (priority, month) class, how
  many DISTINCT values of the sensitive attribute (order status)
  co-occur; k-anonymous classes with l = 1 still leak the sensitive
  value outright (homogeneity attack).

Both are plain aggregates: one map-side-combined groupBy to the
|classes| frame (orders of magnitude smaller than the table), then
report arithmetic on that tiny frame — the same shape at 100 TB. The
reference has no privacy surface (SURVEY §2.2 extension); the audit is
the governance gate of the LLM-data north star (BASELINE.json).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..session import load_table, tiny_frame_key

K_MIN = 5  # minimum acceptable equivalence-class size
L_MIN = 2  # minimum acceptable sensitive-value diversity

K_ANON_ORACLE = f"""
WITH cells AS (
  SELECT o_orderpriority, o_orderstatus, strftime(o_orderdate, '%Y-%m') AS order_month,
         CAST(COUNT(*) AS BIGINT) AS k
  FROM orders GROUP BY 1, 2, 3
), tot AS (
  SELECT *,
         SUM(k) OVER () AS n_all,
         SUM(CASE WHEN k < {K_MIN} THEN k ELSE 0 END) OVER () AS n_risky
  FROM cells
)
SELECT o_orderpriority, o_orderstatus, order_month, k,
       k < {K_MIN} AS risky,
       CAST(n_risky AS DOUBLE) / CAST(n_all AS DOUBLE) AS risky_row_share
FROM tot
"""


@register("privacy_k_anonymity", oracle=K_ANON_ORACLE, tags=("privacy", "dq", "agg"))
def privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit of the (priority, status, order-month) QI
    projection: per equivalence class its size k, the k < K_MIN risk
    flag, and the global share of rows living in risky classes (the
    suppression cost of publishing at K_MIN). One aggregate to the
    tiny class frame; the share is a window over that frame."""
    o = load_table(spark, sf_dir, "orders")
    cells = o.groupBy(
        "o_orderpriority",
        "o_orderstatus",
        F.date_format("o_orderdate", "yyyy-MM").alias("order_month"),
    ).agg(F.count(F.lit(1)).cast("long").alias("k"))
    w = Window.partitionBy(tiny_frame_key("k"))
    tot = cells.withColumn("n_all", F.sum("k").over(w)).withColumn(
        "n_risky",
        F.sum(F.when(F.col("k") < K_MIN, F.col("k")).otherwise(F.lit(0))).over(w),
    )
    return tot.select(
        "o_orderpriority",
        "o_orderstatus",
        "order_month",
        "k",
        (F.col("k") < K_MIN).alias("risky"),
        (F.col("n_risky").cast("double") / F.col("n_all").cast("double")).alias(
            "risky_row_share"
        ),
    )


L_DIV_ORACLE = f"""
WITH cls AS (
  SELECT o_orderpriority, strftime(o_orderdate, '%Y-%m') AS order_month,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS l_distinct
  FROM orders GROUP BY 1, 2
)
SELECT o_orderpriority, order_month, n, l_distinct,
       l_distinct < {L_MIN} AS homogeneity_risk
FROM cls
"""


@register("privacy_l_diversity", oracle=L_DIV_ORACLE, tags=("privacy", "dq", "agg"))
def privacy_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit: distinct sensitive values (order status) per
    (priority, month) class. Classes passing k-anonymity but with
    l = 1 are homogeneity attacks waiting to happen — everyone in the
    class shares the sensitive value, so 'anonymity' reveals it.
    COUNT(DISTINCT) over a low-cardinality sensitive column is a
    two-level exact aggregate Spark executes with partial expand —
    no extra shuffle beyond the class keys."""
    o = load_table(spark, sf_dir, "orders")
    cls = o.groupBy(
        "o_orderpriority", F.date_format("o_orderdate", "yyyy-MM").alias("order_month")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.countDistinct("o_orderstatus").cast("long").alias("l_distinct"),
    )
    return cls.select(
        "o_orderpriority",
        "order_month",
        "n",
        "l_distinct",
        (F.col("l_distinct") < L_MIN).alias("homogeneity_risk"),
    )


T_MAX_E6 = 200_000  # flag classes whose sensitive skew exceeds t = 0.2

T_CLOSE_ORACLE = """
WITH cv AS (
  SELECT o_orderpriority, strftime(o_orderdate, '%Y-%m') AS order_month,
         o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_cv
  FROM orders GROUP BY 1, 2, 3
), c AS (
  SELECT o_orderpriority, order_month, SUM(n_cv) AS n_c
  FROM cv GROUP BY 1, 2
), v AS (
  SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_v,
         SUM(COUNT(*)) OVER () AS n_all
  FROM orders GROUP BY 1
), grid AS (
  SELECT c.o_orderpriority, c.order_month, c.n_c, v.o_orderstatus, v.n_v, v.n_all,
         COALESCE(cv.n_cv, 0) AS n_cv
  FROM c CROSS JOIN v
  LEFT JOIN cv ON cv.o_orderpriority = c.o_orderpriority
              AND cv.order_month = c.order_month
              AND cv.o_orderstatus = v.o_orderstatus
)
SELECT o_orderpriority, order_month, CAST(n_c AS BIGINT) AS n,
       CAST(SUM(ABS(n_cv * 1000000 // n_c - n_v * 1000000 // n_all)) // 2 AS BIGINT)
         AS t_variational_e6,
       SUM(ABS(n_cv * 1000000 // n_c - n_v * 1000000 // n_all)) // 2 > 200000
         AS skew_risk
FROM grid GROUP BY 1, 2, 3
"""


@register("privacy_t_closeness", oracle=T_CLOSE_ORACLE, tags=("privacy", "dq", "agg"))
def privacy_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit (Li et al.'s completion of the k-anonymity /
    l-diversity triad): per (priority, month) equivalence class, the
    variational distance ½·Σ|p_class(v) − p_global(v)| between the
    class's sensitive-value (order status) distribution and the
    corpus-wide one. A class can pass l-diversity with 2 token
    outliers yet still be 95% one value — a probabilistic disclosure
    t-closeness catches. Distances are ×1e6 fixed point with
    truncating division, so the audit is engine-exact.

    Plan: two tiny aggregates (class×value counts; global value
    counts), then a class-frame × value-frame grid via a BROADCAST
    nested-loop join against the handful of sensitive values — zero-
    count cells must contribute |0 − p(v)|, which a plain join would
    silently drop. Everything after the first groupBy runs on frames
    orders of magnitude smaller than the table; same shape at 100 TB."""
    o = load_table(spark, sf_dir, "orders")
    month = F.date_format("o_orderdate", "yyyy-MM").alias("order_month")
    cv = o.groupBy("o_orderpriority", month, "o_orderstatus").agg(
        F.count(F.lit(1)).cast("long").alias("n_cv")
    )
    c = cv.groupBy("o_orderpriority", "order_month").agg(F.sum("n_cv").alias("n_c"))
    v = o.groupBy(F.col("o_orderstatus").alias("v_status")).agg(
        F.count(F.lit(1)).cast("long").alias("n_v")
    )
    v = v.withColumn("n_all", F.sum("n_v").over(Window.partitionBy(tiny_frame_key("n_v"))))
    # c descends from cv, so a direct c⋈cv join would be an ambiguous
    # self-join; alias cv's key columns to break the shared lineage.
    cv2 = cv.select(
        F.col("o_orderpriority").alias("cv_prio"),
        F.col("order_month").alias("cv_month"),
        F.col("o_orderstatus").alias("cv_status"),
        "n_cv",
    )
    grid = (
        c.crossJoin(F.broadcast(v))
        .join(
            cv2,
            (F.col("cv_prio") == F.col("o_orderpriority"))
            & (F.col("cv_month") == F.col("order_month"))
            & (F.col("cv_status") == F.col("v_status")),
            "left",
        )
        .select(
            "o_orderpriority",
            "order_month",
            "n_c",
            "n_v",
            "n_all",
            F.coalesce("n_cv", F.lit(0)).alias("n_cv"),
        )
    )
    out = grid.groupBy(
        "o_orderpriority", "order_month", F.col("n_c").cast("long").alias("n")
    ).agg(
        F.expr(
            "CAST(sum(abs(n_cv * 1000000 div n_c - n_v * 1000000 div n_all)) div 2 AS BIGINT)"
        ).alias("t_variational_e6")
    )
    return out.select(
        "o_orderpriority",
        "order_month",
        "n",
        "t_variational_e6",
        (F.col("t_variational_e6") > T_MAX_E6).alias("skew_risk"),
    )


# --- differentially-private release (keyed seeded Laplace mechanism) --------

DP_EPS = 1.0  # per-cell epsilon; count sensitivity is 1, so b = 1/eps
DP_U_DENOM = 4503599627370496.0  # 2^52 — md5's first 13 hex chars as U(0,1)

# TEST-FIXTURE noise key, not a secret (ADVICE r04): with a committed
# key anyone can recompute the noise and the release provides no actual
# DP. A real deployment injects SPARK_GRAFT_DP_SECRET (ideally via a
# proper HMAC with a managed key); the committed default exists so the
# static oracle can replay the noise in the correctness gate. Both the
# Spark plan and the oracle interpolate the SAME resolved key at import,
# so injection keeps them in lockstep.
_DP_FIXTURE_KEY = "spark-graft-dp-fixture"

DP_SECRET = os.environ.get("SPARK_GRAFT_DP_SECRET", _DP_FIXTURE_KEY)

DP_COUNTS_ORACLE = f"""
WITH cells AS (
  SELECT o_orderpriority, strftime(o_orderdate, '%Y-%m') AS order_month,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM orders GROUP BY 1, 2
), seeded AS (
  SELECT *,
         (('0x' || substr(md5('{DP_SECRET}' || '|' || o_orderpriority || '|' || order_month), 1, 13))::BIGINT)
           / {DP_U_DENOM} - 0.5 AS t
  FROM cells
)
SELECT o_orderpriority, order_month,
       CAST(n * 1000000
            + CAST(ROUND(-SIGN(t) * (1.0 / {DP_EPS}) * ln(1.0 - 2.0 * ABS(t))
                         * 1000000) AS BIGINT)
         AS BIGINT) AS dp_n_e6,
       CAST(ABS(CAST(ROUND(-SIGN(t) * (1.0 / {DP_EPS}) * ln(1.0 - 2.0 * ABS(t))
                           * 1000000) AS BIGINT)) AS BIGINT) AS noise_abs_e6
FROM seeded
"""


@register(
    "privacy_dp_counts",
    oracle=DP_COUNTS_ORACLE,
    tags=("privacy", "dq", "agg", "seeded-noise"),
)
def privacy_dp_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KEYED-SEEDED-noise count release for the (priority, month)
    histogram, Laplace-mechanism shaped (sensitivity 1, b = 1/eps).
    Each cell's Laplace draw comes from the inverse CDF applied to a
    uniform derived from md5(key | cell) (first 52 hash bits / 2^52) —
    deterministic given the key, identical in both engines, so the
    release is reproducible run-to-run and auditable (re-running the
    pipeline cannot silently re-randomize a published table).
    noise = -sign(u-.5)·(1/eps)·ln(1-2|u-.5|), reported ×1e6 fixed
    point next to the noisy count.

    THE DP GUARANTEE IS ONLY AS PRIVATE AS THE KEY (ADVICE r04): the
    noise key is injected via ``SPARK_GRAFT_DP_SECRET``; the committed
    default is a TEST FIXTURE so the static oracle can replay the
    noise, and a release built on it provides NO differential privacy —
    anyone can recompute the noise from the public cell keys. A
    production release injects a managed secret (and preferably swaps
    md5(key|cell) for HMAC-SHA256(key, cell) — the plan is unchanged,
    one keyed scalar expression).

    Scale shape: one map-side-combined groupBy to the tiny cell frame,
    then pure per-row scalar arithmetic — nothing after the aggregate
    touches the fact table, same shape at 100 TB."""
    o = load_table(spark, sf_dir, "orders")
    cells = o.groupBy(
        "o_orderpriority",
        F.date_format("o_orderdate", "yyyy-MM").alias("order_month"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|", F.lit(DP_SECRET), "o_orderpriority", "order_month"
                    )
                ),
                1,
                13,
            ),
            16,
            10,
        ).cast("long")
        / F.lit(DP_U_DENOM)
    )
    t = u - F.lit(0.5)
    noise_e6 = F.round(
        -F.signum(t) * F.lit(1.0 / DP_EPS) * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(t)) * 1_000_000
    ).cast("long")
    return cells.withColumn("t", t).select(
        "o_orderpriority",
        "order_month",
        (F.col("n") * 1_000_000 + noise_e6).cast("long").alias("dp_n_e6"),
        F.abs(noise_e6).cast("long").alias("noise_abs_e6"),
    )
