"""Event-time window operators over the ``events`` table: tumbling /
sliding / session windows, sessionization, JSON property extraction.

The reference is a one-shot batch job with frozen time (claim_pipeline.py:33)
and no streaming; this module supplies the event-time surface
(SURVEY.md §2.2) in batch mode where the DuckDB oracle can check it
exactly. The Structured Streaming variants (same semantics, watermarks,
memory-sink tested) live in streaming/events_stream.py.

Window boundaries are output as epoch MICROSECOND bigints —
representation-stable across engines (no timestamp formatting drift).

Scale notes: tumbling/sliding aggs are map-side-combinable hash
aggregates (slide duplicates rows by window/slide factor — here 2×);
sessionization is one shuffle on user_id + a linear window pass, the
standard formulation that scales with users, not events-per-user².
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.stable import dec_sum, dec_sum_sql
from ..registry import register
from ..session import load_table, pin

US_10MIN = 600_000_000
US_5MIN = 300_000_000
US_1H = 3_600_000_000
SESSION_GAP_US = 1_800_000_000  # 30 minutes


TUMBLING_ORACLE = f"""
SELECT (epoch_us(ts) // {US_10MIN}) * {US_10MIN} AS window_start_us,
       event_type,
       COUNT(*) AS n_events,
       {dec_sum_sql('value')} AS sum_value
FROM events
GROUP BY 1, 2
"""


@register("events_tumbling_window", oracle=TUMBLING_ORACLE, tags=("events", "window", "bench"))
def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute tumbling event-time windows per event type —
    F.window() (epoch-aligned), the batch twin of the streaming query in
    streaming/events_stream.py."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), dec_sum("value").alias("sum_value"))
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


SLIDING_ORACLE = f"""
SELECT ((epoch_us(ts) - k.off * {US_5MIN}) // {US_10MIN}) * {US_10MIN} + k.off * {US_5MIN}
         AS window_start_us,
       COUNT(*) AS n_events,
       {dec_sum_sql('value')} AS sum_value
FROM events, (SELECT unnest(generate_series(0, 1)) AS off) k
GROUP BY 1
"""


@register("events_sliding_window", oracle=SLIDING_ORACLE, tags=("events", "window"))
def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute windows sliding every 5 minutes (each event lands in 2
    windows). The oracle derives the same window set arithmetically via
    the offset trick."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), dec_sum("value").alias("sum_value"))
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "n_events",
            "sum_value",
        )
    )


# Session semantics shared by the manual formulation, the native
# session_window variant and the streaming variant: a NEW session starts
# when the gap since the previous event is >= 30 minutes (half-open
# [start, last+gap) windows, which is exactly Spark's session_window
# rule).
SESSIONIZE_ORACLE = f"""
WITH lagged AS (
  SELECT user_id, ts, event_id, value,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
), marked AS (
  SELECT *, CASE WHEN prev_ts IS NULL
                   OR epoch_us(ts) - epoch_us(prev_ts) >= {SESSION_GAP_US}
                 THEN 1 ELSE 0 END AS is_new
  FROM lagged
), numbered AS (
  SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
  FROM marked
)
SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
       MIN(epoch_us(ts)) AS session_start_us,
       MAX(epoch_us(ts)) AS session_last_us,
       COUNT(*) AS n_events,
       {dec_sum_sql('value')} AS sum_value
FROM numbered
GROUP BY user_id, session_seq
"""


@register("events_sessionize", oracle=SESSIONIZE_ORACLE, tags=("events", "window", "bench"))
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via lag + gap-flag + running sum (the portable
    ANSI formulation): per-user sessions split at >= 30-minute gaps."""
    ev = load_table(spark, sf_dir, "events")
    order = W.partitionBy("user_id").orderBy("ts", "event_id")
    lagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        "value",
        F.lag("ts").over(order).alias("prev_ts"),
    )
    marked = lagged.withColumn(
        "is_new",
        F.when(
            F.col("prev_ts").isNull()
            | (F.unix_micros("ts") - F.unix_micros("prev_ts") >= SESSION_GAP_US),
            1,
        ).otherwise(0),
    )
    numbered = marked.withColumn(
        "session_seq",
        F.sum("is_new").over(order.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    return numbered.groupBy("user_id", F.col("session_seq").cast("long").alias("session_seq")).agg(
        F.min(F.unix_micros("ts")).alias("session_start_us"),
        F.max(F.unix_micros("ts")).alias("session_last_us"),
        F.count(F.lit(1)).alias("n_events"),
        dec_sum("value").alias("sum_value"),
    )


SESSION_WINDOW_ORACLE = f"""
WITH lagged AS (
  SELECT user_id, ts, event_id,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
), marked AS (
  SELECT *, CASE WHEN prev_ts IS NULL
                   OR epoch_us(ts) - epoch_us(prev_ts) >= {SESSION_GAP_US}
                 THEN 1 ELSE 0 END AS is_new
  FROM lagged
), numbered AS (
  SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
  FROM marked
)
SELECT user_id,
       MIN(epoch_us(ts)) AS session_start_us,
       MAX(epoch_us(ts)) + {SESSION_GAP_US} AS session_end_us,
       COUNT(*) AS n_events
FROM numbered
GROUP BY user_id, session_seq
"""


@register("events_session_window_native", oracle=SESSION_WINDOW_ORACLE, tags=("events", "window"))
def events_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's native F.session_window (gap-merged event-time sessions).
    The oracle reconstructs identical sessions with the portable
    formulation — session_window.end is last-event + gap by definition,
    which the oracle mirrors arithmetically."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            F.unix_micros(F.col("w.end")).alias("session_end_us"),
            "n_events",
        )
    )


JSON_PROPS_ORACLE = """
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS DOUBLE) / COUNT(*) AS avg_k
FROM events
GROUP BY event_type
"""


@register("events_json_extract", oracle=JSON_PROPS_ORACLE, tags=("events", "scalar"))
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed JSON extraction from the props column via from_json (schema
    'k INT') — integer sums are exact so no decimal stabilization
    needed."""
    ev = load_table(spark, sf_dir, "events")
    k = F.from_json("props", "k INT")["k"].cast("long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            (F.sum("k").cast("double") / F.count(F.lit(1))).alias("avg_k"),
        )
    )


HYPERTABLE_ROLLUP_ORACLE = f"""
SELECT (epoch_us(ts) // {US_1H}) * {US_1H} AS hour_us,
       ((epoch_us(ts) // {US_1H * 24}) * {US_1H * 24}) AS day_us,
       event_type,
       COUNT(*) AS n_events,
       {dec_sum_sql('value')} AS sum_value
FROM events
GROUP BY GROUPING SETS (
  ((epoch_us(ts) // {US_1H}) * {US_1H},
   ((epoch_us(ts) // {US_1H * 24}) * {US_1H * 24}), event_type),
  (((epoch_us(ts) // {US_1H * 24}) * {US_1H * 24}), event_type),
  (((epoch_us(ts) // {US_1H * 24}) * {US_1H * 24}))
)
"""


@register("events_hypertable_rollup", oracle=HYPERTABLE_ROLLUP_ORACLE, tags=("events", "window", "agg"))
def events_hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-resolution rollup (the continuous-aggregate
    pattern): one pass produces hourly-per-type, daily-per-type and
    daily-total rows via GROUPING SETS — Catalyst expands the sets and
    shares the scan, which is how you maintain downsampled views of an
    events hypertable without re-reading the raw table per resolution."""
    ev = load_table(spark, sf_dir, "events")
    hour = (F.unix_micros("ts") - F.pmod(F.unix_micros("ts"), F.lit(US_1H))).alias("hour_us")
    day = (F.unix_micros("ts") - F.pmod(F.unix_micros("ts"), F.lit(US_1H * 24))).alias("day_us")
    ev.select(hour, day, "event_type", "value").createOrReplaceTempView("events_ht")
    return spark.sql(
        f"""
        SELECT hour_us, day_us, event_type,
               COUNT(*) AS n_events,
               {dec_sum_sql('value')} AS sum_value
        FROM events_ht
        GROUP BY GROUPING SETS (
          (hour_us, day_us, event_type),
          (day_us, event_type),
          (day_us)
        )
        """
    )


ERROR_RATE_ORACLE = f"""
SELECT (epoch_us(ts) // {US_1H}) * {US_1H} AS window_start_us,
       COUNT(*) AS n_events,
       COUNT(*) FILTER (WHERE event_type = 'error') AS n_errors,
       ROUND(CAST(COUNT(*) FILTER (WHERE event_type = 'error') AS DOUBLE) / COUNT(*), 6)
         AS error_rate
FROM events
GROUP BY 1
"""


@register("events_error_rate", oracle=ERROR_RATE_ORACLE, tags=("events", "window"))
def events_error_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly error-rate monitoring window: conditional counts + ratio."""
    ev = load_table(spark, sf_dir, "events")
    n_err = F.count(F.when(F.col("event_type") == "error", 1))
    n = F.count(F.lit(1))
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            n.alias("n_events"),
            n_err.alias("n_errors"),
            F.round(n_err.cast("double") / n, 6).alias("error_rate"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "n_events",
            "n_errors",
            "error_rate",
        )
    )


# ---------------------------------------------------------------------------
# Event-to-event conversion join (batch twin of the stream-stream join)
# ---------------------------------------------------------------------------

CONVERSION_WINDOW_MIN = 30

CONVERSION_ORACLE = f"""
SELECT a.event_id AS error_id, b.event_id AS purchase_id, a.user_id,
       CAST(epoch_us(b.ts) - epoch_us(a.ts) AS BIGINT) AS gap_us
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND b.ts > a.ts
 AND b.ts <= a.ts + INTERVAL {CONVERSION_WINDOW_MIN} MINUTES
WHERE a.event_type = 'error' AND b.event_type = 'purchase'
"""


@register("events_conversion_join", oracle=CONVERSION_ORACLE, tags=("events", "join", "range"))
def events_conversion_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error→purchase conversion pairs: every purchase by the same user
    within {CONVERSION_WINDOW_MIN} minutes after an error — the
    event-correlation join behind funnel/conversion analytics, and the
    batch twin of events_conversion_streaming (the stream-stream join).

    Scale shape: an equi-join on user_id carries the time-range bound as
    a join residual, so this plans as a hash join plus filter — never a
    range cross-product; per-user event lists bound the pair blow-up."""
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        F.col("user_id"),
        F.col("ts").alias("a_ts"),
    )
    b = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("b_ts"),
    )
    j = a.join(
        b,
        ["user_id"],
    ).filter(
        (F.col("b_ts") > F.col("a_ts"))
        & (F.col("b_ts") <= F.col("a_ts") + F.expr(f"INTERVAL {CONVERSION_WINDOW_MIN} MINUTES"))
    )
    return j.select(
        "error_id",
        "purchase_id",
        "user_id",
        (F.unix_micros("b_ts") - F.unix_micros("a_ts")).alias("gap_us"),
    )


CAP_PER_KEY_K = 2

CAP_PER_KEY_ORACLE = f"""
SELECT user_id, day_us, event_id,
       CAST(epoch_us(ts) AS BIGINT) AS ts_us, event_type
FROM (
  SELECT user_id,
         (epoch_us(ts) - epoch_us(ts) % 86400000000) AS day_us,
         event_id, ts, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id,
                            (epoch_us(ts) - epoch_us(ts) % 86400000000)
                            ORDER BY epoch_us(ts), event_id) AS rn
  FROM events
) WHERE rn <= {CAP_PER_KEY_K}
"""


@register("events_cap_per_key", oracle=CAP_PER_KEY_ORACLE, tags=("events", "window", "sampling"))
def events_cap_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic rate limiting: keep the first {CAP_PER_KEY_K}
    events per (user, day), in (ts, event_id) arrival order — the
    bounded-fanout guard every ingestion pipeline puts in front of a
    chatty producer (a runaway client can otherwise dominate storage
    and every downstream per-user aggregate). The cap genuinely binds
    on the test data (~2.2 events/user-day), so the parity hash proves
    the keep/drop boundary, not just a pass-through.

    Scale: one window over (user_id, day) — millions of small groups,
    uniformly distributed by construction (the cap itself removes the
    skew the hot user would cause downstream). No global state."""
    ev = load_table(spark, sf_dir, "events")
    day_us = (
        F.unix_micros("ts") - F.pmod(F.unix_micros("ts"), F.lit(86_400_000_000))
    ).alias("day_us")
    w = W.partitionBy("user_id", "day_us").orderBy("ts_us", "event_id")
    return (
        ev.select(
            "user_id",
            day_us,
            "event_id",
            F.unix_micros("ts").alias("ts_us"),
            "event_type",
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= CAP_PER_KEY_K)
        .drop("rn")
    )


# ---------------------------------------------------------------------------
# Hourly event-mix Shannon entropy.
# ---------------------------------------------------------------------------

US_1H = 3_600_000_000

ENTROPY_ORACLE = f"""
WITH c AS (
  SELECT (epoch_us(ts) // {US_1H}) AS hour_idx, event_type,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1, 2
), t AS (
  SELECT hour_idx, CAST(SUM(cnt) AS BIGINT) AS n_events,
         CAST(COUNT(*) AS BIGINT) AS n_types
  FROM c GROUP BY 1
), per AS (
  SELECT c.hour_idx,
         CAST(ROUND((CAST(c.cnt AS DOUBLE) / t.n_events)
                    * ln(CAST(c.cnt AS DOUBLE) / t.n_events)
                    * 1000000) AS BIGINT) AS term
  FROM c JOIN t ON c.hour_idx = t.hour_idx
)
SELECT t.hour_idx, t.n_events, t.n_types,
       CAST(-SUM(per.term) AS BIGINT) AS entropy_e6
FROM per JOIN t ON per.hour_idx = t.hour_idx
GROUP BY t.hour_idx, t.n_events, t.n_types
"""


@register("events_hourly_entropy", oracle=ENTROPY_ORACLE, tags=("events", "analytics", "agg"))
def events_hourly_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of the event-type mix per hour — the standard
    traffic-composition anomaly signal (a DDoS or a broken client
    collapses the mix; entropy drops before any single count alarms).

    Two partial-aggregated shuffles on tiny keys (hour × type, then
    hour). Each type's −p·ln p contribution is quantized to ×1e6
    BEFORE the per-hour sum (the text_bigram_logprob idiom), so the
    statistic is an exact integer sum — engine- and order-independent
    despite ln() being a libm call (rounding at 1e-6 absorbs any
    last-ulp disagreement)."""
    ev = load_table(spark, sf_dir, "events")
    hour_idx = (
        (F.unix_micros("ts") - F.pmod(F.unix_micros("ts"), F.lit(US_1H))) / F.lit(US_1H)
    ).cast("long")
    c = (
        ev.select(hour_idx.alias("hour_idx"), "event_type")
        .groupBy("hour_idx", "event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    tot = W.partitionBy("hour_idx")
    p = F.col("cnt").cast("double") / F.sum("cnt").over(tot)
    term = F.round(p * F.log(p) * 1_000_000).cast("long")
    per = c.select("hour_idx", "cnt", term.alias("term"))
    return per.groupBy("hour_idx").agg(
        F.sum("cnt").cast("long").alias("n_events"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        (-F.sum("term")).cast("long").alias("entropy_e6"),
    )


# ---------------------------------------------------------------------------
# Rolling median of the hourly count series (robust trend).
# ---------------------------------------------------------------------------

ROLL_MED_HALF = 12  # centered 25-hour window

ROLL_MED_ORACLE = f"""
WITH hourly AS (
  SELECT event_type, (epoch_us(ts) // {US_1H}) AS hour_idx,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
)
SELECT event_type, hour_idx, n,
       ROUND(quantile_cont(n, 0.5) OVER (
         PARTITION BY event_type ORDER BY hour_idx
         RANGE BETWEEN {ROLL_MED_HALF} PRECEDING AND {ROLL_MED_HALF} FOLLOWING
       ), 4) AS rolling_median
FROM hourly
"""


@register("events_rolling_median", oracle=ROLL_MED_ORACLE, tags=("events", "analytics", "window"))
def events_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Centered 25-hour rolling MEDIAN of each type's hourly counts —
    the robust trend line (a traffic spike shifts a rolling mean for a
    full window width; the median shrugs it off — pairs with
    events_outlier_mad as the robust-statistics family's smoother).
    A RANGE frame keyed on the hour index keeps calendar gaps from
    misaligning the window (the events_seasonal_decompose discipline);
    both engines share the (n−1)·p percentile interpolation, rounded at
    4 dp. The window partitions by event type over the tiny hourly
    series — parallel, never single-partition."""
    ev = load_table(spark, sf_dir, "events")
    hour_idx = (
        (F.unix_micros("ts") - F.pmod(F.unix_micros("ts"), F.lit(US_1H))) / F.lit(US_1H)
    ).cast("long")
    hourly = (
        ev.select("event_type", hour_idx.alias("hour_idx"))
        .groupBy("event_type", "hour_idx")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("hour_idx")
        .rangeBetween(-ROLL_MED_HALF, ROLL_MED_HALF)
    )
    return hourly.select(
        "event_type",
        "hour_idx",
        "n",
        F.round(F.percentile("n", F.lit(0.5)).over(w), 4).alias("rolling_median"),
    )


# ---------------------------------------------------------------------------
# SRE error-budget burn rate (multi-window alerting).
# ---------------------------------------------------------------------------

SLO_TARGET_E6 = 990_000  # 99.0% success SLO
BURN_FAST_E6, BURN_SLOW_E6 = 14_400_000, 6_000_000  # 14.4x / 6x (Google SRE)

BURN_ORACLE = f"""
WITH hourly AS (
  SELECT (epoch_us(ts) // {US_1H}) AS hour_idx,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COUNT(*) FILTER (event_type = 'error') AS BIGINT) AS n_err
  FROM events GROUP BY 1
), win AS (
  SELECT hour_idx, n, n_err,
         CAST(SUM(n) OVER w1 AS BIGINT) AS n_1h,
         CAST(SUM(n_err) OVER w1 AS BIGINT) AS e_1h,
         CAST(SUM(n) OVER w6 AS BIGINT) AS n_6h,
         CAST(SUM(n_err) OVER w6 AS BIGINT) AS e_6h
  FROM hourly
  WINDOW w1 AS (ORDER BY hour_idx RANGE BETWEEN 0 PRECEDING AND CURRENT ROW),
         w6 AS (ORDER BY hour_idx RANGE BETWEEN 5 PRECEDING AND CURRENT ROW)
), burn AS (
  SELECT hour_idx,
         (e_1h * 1000000) // n_1h AS err_rate_1h_e6,
         (e_6h * 1000000) // n_6h AS err_rate_6h_e6,
         ((e_1h * 1000000) // n_1h) * 1000000 // (1000000 - {SLO_TARGET_E6})
           AS burn_1h_e6,
         ((e_6h * 1000000) // n_6h) * 1000000 // (1000000 - {SLO_TARGET_E6})
           AS burn_6h_e6
  FROM win
)
SELECT hour_idx, err_rate_1h_e6, err_rate_6h_e6, burn_1h_e6, burn_6h_e6,
       (burn_1h_e6 > {BURN_FAST_E6} AND burn_6h_e6 > {BURN_SLOW_E6}) AS page
FROM burn
"""


@register("events_error_budget_burn", oracle=BURN_ORACLE, tags=("events", "analytics", "window", "dq"))
def events_error_budget_burn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRE error-budget burn-rate alerting against a 99% success SLO:
    per hour, the 1h and 6h error rates as multiples of the budget
    (burn = rate / (1 − SLO)) and the Google-SRE multiwindow page
    condition (burn_1h > 14.4 AND burn_6h > 6 — fast burn confirmed by
    the slower window, so a one-hour blip can't page and a slow leak
    still does). Every rate and burn is an exact ×1e6 integer
    (integer division), so the page verdict is bit-stable — no float
    epsilon at the alert boundary. RANGE frames on the hour index keep
    calendar gaps honest. The single unpartitioned window runs over the
    HOURLY frame (calendar-bounded, tiny at any corpus size — the
    orders_open_concurrency argument); tiny_frame_key keeps the spec
    non-foldable."""
    ev = load_table(spark, sf_dir, "events")
    hour_idx = (
        (F.unix_micros("ts") - F.pmod(F.unix_micros("ts"), F.lit(US_1H))) / F.lit(US_1H)
    ).cast("long")
    hourly = (
        ev.select(hour_idx.alias("hour_idx"), "event_type")
        .groupBy("hour_idx")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum((F.col("event_type") == "error").cast("long")).cast("long").alias("n_err"),
        )
    )
    from ..session import tiny_frame_key

    w1 = (
        W.partitionBy(tiny_frame_key("hour_idx"))
        .orderBy("hour_idx")
        .rangeBetween(0, 0)
    )
    w6 = (
        W.partitionBy(tiny_frame_key("hour_idx"))
        .orderBy("hour_idx")
        .rangeBetween(-5, 0)
    )
    win = hourly.select(
        "hour_idx",
        F.sum("n").over(w1).cast("long").alias("n_1h"),
        F.sum("n_err").over(w1).cast("long").alias("e_1h"),
        F.sum("n").over(w6).cast("long").alias("n_6h"),
        F.sum("n_err").over(w6).cast("long").alias("e_6h"),
    )
    budget = 1_000_000 - SLO_TARGET_E6
    r1 = F.expr("(e_1h * 1000000) div n_1h")
    r6 = F.expr("(e_6h * 1000000) div n_6h")
    b1 = F.expr(f"((e_1h * 1000000) div n_1h) * 1000000 div {budget}")
    b6 = F.expr(f"((e_6h * 1000000) div n_6h) * 1000000 div {budget}")
    return win.select(
        "hour_idx",
        r1.alias("err_rate_1h_e6"),
        r6.alias("err_rate_6h_e6"),
        b1.alias("burn_1h_e6"),
        b6.alias("burn_6h_e6"),
        ((b1 > BURN_FAST_E6) & (b6 > BURN_SLOW_E6)).alias("page"),
    )


# ---------------------------------------------------------------------------
# Day-of-week x hour-of-day activity heatmap.
# ---------------------------------------------------------------------------

HEATMAP_ORACLE = """
WITH c AS (
  SELECT CAST((epoch_us(ts) // 86400000000 + 4) % 7 AS BIGINT) AS dow,
         CAST((epoch_us(ts) % 86400000000) // 3600000000 AS BIGINT) AS hod,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
), t AS (SELECT CAST(SUM(n) AS BIGINT) AS n_all FROM c)
SELECT c.dow, c.hod, c.n,
       (c.n * 1000000) // t.n_all AS share_e6
FROM c, t
"""


@register("events_dow_hour_heatmap", oracle=HEATMAP_ORACLE, tags=("events", "analytics", "agg"))
def events_dow_hour_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week × hour-of-day activity matrix with each cell's
    traffic share — the usage-heatmap primitive behind capacity plans
    and maintenance-window picks. Day-of-week comes from pure epoch
    arithmetic ((days since 1970-01-01 + 4) mod 7; Jan 1 1970 was a
    Thursday, so 0 = Monday … 6 = Sunday) — identical integer math in
    both engines, no locale-dependent date function anywhere near the
    hash. Shares are exact ×1e6 integer divisions. One
    map-side-combined aggregate over ≤168 cells."""
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    c = (
        ev.select(
            F.pmod(F.floor(us / 86_400_000_000) + 4, F.lit(7)).cast("long").alias("dow"),
            F.floor(F.pmod(us, F.lit(86_400_000_000)) / 3_600_000_000)
            .cast("long")
            .alias("hod"),
        )
        .groupBy("dow", "hod")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        # ≤168 cells consumed twice (the total and the final join);
        # unpinned, each consumer re-runs the full fact-table aggregate.
        .transform(pin)
    )
    t = c.agg(F.sum("n").cast("long").alias("n_all"))
    return (
        c.crossJoin(F.broadcast(t))
        .select("dow", "hod", "n", F.expr("(n * 1000000) div n_all").alias("share_e6"))
    )


# ---------------------------------------------------------------------------
# Bot / abuse detection: superhuman event-rate heuristics per user
# ---------------------------------------------------------------------------

BOT_BURST_WINDOW_S = 600  # trailing rate window (seconds)
BOT_TOP_K = 25

BOT_ORACLE = f"""
WITH s AS (
  SELECT user_id, event_id, epoch_us(ts) // 1000000 AS ts_s FROM events
), burst AS (
  SELECT user_id, event_id,
         COUNT(*) OVER (PARTITION BY user_id ORDER BY ts_s
                        RANGE BETWEEN {BOT_BURST_WINDOW_S} PRECEDING
                                  AND CURRENT ROW) AS w_cnt
  FROM s
), per_user AS (
  SELECT s.user_id,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(MAX(ts_s) - MIN(ts_s) AS BIGINT) AS span_s,
         CAST((SELECT MAX(w_cnt) FROM burst b WHERE b.user_id = s.user_id)
              AS BIGINT) AS max_burst
  FROM s GROUP BY 1
), scored AS (
  SELECT user_id, n_events, span_s, max_burst,
         CAST(n_events * 86400 * 1000000 // GREATEST(span_s, 1) AS BIGINT)
           AS rate_per_day_e6
  FROM per_user
)
SELECT user_id, n_events, span_s, max_burst, rate_per_day_e6, rnk FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY max_burst DESC, user_id) AS rnk
  FROM scored
) WHERE rnk <= {BOT_TOP_K}
"""


@register("events_bot_screen", oracle=BOT_ORACLE, tags=("events", "window", "quality"))
def events_bot_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Abuse/bot screening heuristics per user — the rate-based triage
    every ingestion pipeline runs before trusting engagement data: for
    each user, lifetime event count and span, the peak trailing-
    {BOT_BURST_WINDOW_S}-second burst (a RANGE-frame count over event
    seconds — the physiological-plausibility signal), and the
    normalized daily rate; top-{BOT_TOP_K} by peak burst. Flagged users
    feed the same exclusion interface as the dedup keep flags.

    Exactness: all integers (epoch seconds, counts, one integer
    division with a GREATEST guard for single-instant users). Scale:
    one user-keyed window pass + one aggregate; the RANGE frame is per
    user, bounded by per-user activity; global top-k is
    TakeOrderedAndProject."""
    ev = load_table(spark, sf_dir, "events")
    s = ev.select(
        "user_id", "event_id", F.expr("unix_micros(ts) div 1000000").alias("ts_s")
    )
    wb = (
        W.partitionBy("user_id")
        .orderBy("ts_s")
        .rangeBetween(-BOT_BURST_WINDOW_S, 0)
    )
    # One pass: the lifetime aggregates ride the SAME windowed frame as
    # the burst counts (the window keeps every row, so per-user count /
    # min / max are unchanged), and the groupBy reuses the window's
    # user_id partitioning — the old shape scanned events twice and
    # joined two separately-shuffled per-user frames.
    burst = s.select("user_id", "ts_s", F.count(F.lit(1)).over(wb).alias("w_cnt"))
    per_user = burst.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        (F.max("ts_s") - F.min("ts_s")).cast("long").alias("span_s"),
        F.max("w_cnt").cast("long").alias("max_burst"),
    )
    scored = per_user.select(
        "user_id",
        "n_events",
        "span_s",
        "max_burst",
        F.expr(
            "CAST(n_events * 86400 * 1000000 div GREATEST(span_s, 1) AS BIGINT)"
        ).alias("rate_per_day_e6"),
    )
    from ..session import tiny_frame_key

    top = scored.orderBy(F.desc("max_burst"), "user_id").limit(BOT_TOP_K)
    w = W.partitionBy(tiny_frame_key("user_id")).orderBy(
        F.desc("max_burst"), "user_id"
    )
    return top.select("*", F.row_number().over(w).cast("long").alias("rnk"))


# ---------------------------------------------------------------------------
# CEP-style sequence pattern matching over per-user daily event strings
# ---------------------------------------------------------------------------

_US_DAY = 86_400_000_000

CEP_PATTERN_ORACLE = f"""
WITH e AS (
  SELECT user_id, (epoch_us(ts) // {_US_DAY}) AS day_idx,
         epoch_us(ts) AS t, event_id, substr(event_type, 1, 1) AS letter
  FROM events
), seqs AS (
  SELECT user_id, day_idx,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         string_agg(letter, '' ORDER BY t, event_id) AS seq
  FROM e GROUP BY user_id, day_idx
)
SELECT user_id, day_idx, n_events, seq,
       regexp_matches(seq, 'v[^p]*p') AS conv_view_purchase,
       regexp_matches(seq, 'e[^p]*e[^p]*e') AS err3_before_purchase,
       regexp_matches(seq, 's.*p') AS signup_to_purchase
FROM seqs
"""


@register("events_cep_pattern", oracle=CEP_PATTERN_ORACLE, tags=("events", "window", "analytics"))
def events_cep_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-style complex-event-processing patterns, Spark
    has no native operator for: encode each user-day's time-ordered
    event stream as a letter string (event types here map to distinct
    initials) and run the pattern layer as regexes over it —
    view-then-purchase with no purchase in between (``v[^p]*p``),
    three errors before any purchase, signup-eventually-purchase.
    Regex over a materialized sequence string is the classic
    scale-friendly reduction of CEP when patterns don't need
    event-time constraints tighter than the grouping grain (those go
    to ``events_sessionize``/``events_funnel_steps``).

    One shuffle to (user, day) groups; each group's string build is an
    ordered in-group sort (array_sort of (t, id, letter) structs — no
    corpus-wide window), and the regex match is per-row codegen over
    strings bounded by a user-day's event count. Pattern evaluation
    cost is linear in total events at any scale; there is no
    state-machine join and no cross-row backtracking beyond each
    bounded string."""
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "user_id",
        F.expr(f"unix_micros(ts) div {_US_DAY}").alias("day_idx"),
        F.unix_micros("ts").alias("t"),
        "event_id",
        F.substring("event_type", 1, 1).alias("letter"),
    )
    seqs = e.groupBy("user_id", "day_idx").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("t", "event_id", "letter"))),
                lambda s: s["letter"],
            ),
            "",
        ).alias("seq"),
    )
    return seqs.select(
        "user_id",
        "day_idx",
        "n_events",
        "seq",
        F.col("seq").rlike("v[^p]*p").alias("conv_view_purchase"),
        F.col("seq").rlike("e[^p]*e[^p]*e").alias("err3_before_purchase"),
        F.col("seq").rlike("s.*p").alias("signup_to_purchase"),
    )


# --- Schuster periodogram (seasonality scan) --------------------------------

PERIODOGRAM_PERIODS = (6, 8, 12, 24, 168)  # candidate cycle lengths, hours


PERIODOGRAM_ORACLE = f"""
WITH hourly AS (
  SELECT (epoch_us(ts) // {US_1H}) AS h, CAST(COUNT(*) AS BIGINT) AS x
  FROM events GROUP BY 1
), b AS (SELECT MIN(h) AS h0, SUM(x) AS sx, COUNT(*) AS n FROM hourly),
cent AS (
  SELECT (h - b.h0) AS t, CAST(x AS DOUBLE) - CAST(b.sx AS DOUBLE) / b.n AS xc
  FROM hourly, b
), p AS (SELECT unnest([{', '.join(str(p) for p in PERIODOGRAM_PERIODS)}]) AS period_h),
terms AS (
  SELECT CAST(p.period_h AS BIGINT) AS period_h,
         CAST(ROUND(xc * cos(2 * pi() * (t % p.period_h) / p.period_h) * 1000)
              AS BIGINT) AS c3,
         CAST(ROUND(xc * sin(2 * pi() * (t % p.period_h) / p.period_h) * 1000)
              AS BIGINT) AS s3
  FROM cent CROSS JOIN p
)
SELECT period_h, CAST(SUM(c3) AS BIGINT) AS sc_e3, CAST(SUM(s3) AS BIGINT) AS ss_e3,
       CAST(SUM(c3) * SUM(c3) + SUM(s3) * SUM(s3) AS BIGINT) AS power_e6
FROM terms GROUP BY 1
"""


@register("events_periodogram", oracle=PERIODOGRAM_ORACLE, tags=("events", "analytics", "agg"))
def events_periodogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schuster periodogram of the hourly event-count series at a
    fixed set of candidate periods (6/8/12/24/168 h): spectral power
    |Σ x̂_t·e^(-2πi·t/P)|² of the mean-centered series — the classic
    'which seasonality does this metric actually have?' scan that
    picks the period argument for events_seasonal_decompose /
    events_holt_winters instead of assuming 24.

    Determinism across engines: per-term products x̂_t·cos(θ_t) are
    quantized to ×1e3 BIGINT before summation (the ln() idiom from
    events_hourly_entropy, applied to libm trig), so the two fold
    orders cannot disagree; the trig argument is reduced to
    2π·(t mod P)/P first, keeping both engines' range reduction in the
    same well-conditioned interval. Power is exact integer arithmetic
    on the two sums.

    Scale shape: one partial-aggregated groupBy to the hourly frame
    (tiny — hours, not events), a broadcast of the 3-number global
    stats, a crossJoin against the {len(PERIODOGRAM_PERIODS)}-row
    period frame, and one (period)-keyed aggregate. Nothing after the
    first groupBy scales with the fact table."""
    ev = load_table(spark, sf_dir, "events")
    h = (F.unix_micros("ts") - F.pmod(F.unix_micros("ts"), F.lit(US_1H))) / F.lit(US_1H)
    hourly = (
        ev.select(h.cast("long").alias("h"))
        .groupBy("h")
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
        # hours-sized frame consumed twice (global stats + centering);
        # unpinned, both consumers re-run the fact-table aggregate.
        .transform(pin)
    )
    b = hourly.agg(
        F.min("h").alias("h0"), F.sum("x").alias("sx"), F.count(F.lit(1)).alias("n")
    )
    cent = hourly.crossJoin(F.broadcast(b)).select(
        (F.col("h") - F.col("h0")).alias("t"),
        (F.col("x").cast("double") - F.col("sx").cast("double") / F.col("n")).alias("xc"),
    )
    periods = spark.range(1).select(
        F.explode(F.array(*[F.lit(p) for p in PERIODOGRAM_PERIODS])).alias("period_h")
    )
    theta = (
        F.lit(2.0)
        * F.lit(3.141592653589793)
        * F.pmod(F.col("t"), F.col("period_h"))
        / F.col("period_h")
    )
    terms = cent.crossJoin(F.broadcast(periods)).select(
        F.col("period_h").cast("long").alias("period_h"),
        F.round(F.col("xc") * F.cos(theta) * 1000).cast("long").alias("c3"),
        F.round(F.col("xc") * F.sin(theta) * 1000).cast("long").alias("s3"),
    )
    agg = terms.groupBy("period_h").agg(
        F.sum("c3").cast("long").alias("sc_e3"), F.sum("s3").cast("long").alias("ss_e3")
    )
    return agg.select(
        "period_h",
        "sc_e3",
        "ss_e3",
        (F.col("sc_e3") * F.col("sc_e3") + F.col("ss_e3") * F.col("ss_e3"))
        .cast("long")
        .alias("power_e6"),
    )


# --- local-maximum peak detection over the hourly series --------------------

PEAK_HALF_W = 2  # strict local max within ± this many hours


PEAK_ORACLE = f"""
WITH hourly AS (
  SELECT (epoch_us(ts) // {US_1H}) AS hour_idx, CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1
), tot AS (
  SELECT CAST(SUM(n) AS BIGINT) AS tot_n, CAST(COUNT(*) AS BIGINT) AS tot_h FROM hourly
), nb AS (
  SELECT hour_idx, n,
         MAX(n) OVER (ORDER BY hour_idx
                      ROWS BETWEEN {PEAK_HALF_W} PRECEDING AND 1 PRECEDING) AS l_max,
         MAX(n) OVER (ORDER BY hour_idx
                      ROWS BETWEEN 1 FOLLOWING AND {PEAK_HALF_W} FOLLOWING) AS r_max
  FROM hourly
)
SELECT nb.hour_idx, nb.n
FROM nb, tot
WHERE nb.n > COALESCE(nb.l_max, -1) AND nb.n > COALESCE(nb.r_max, -1)
  AND nb.n * tot.tot_h >= tot.tot_n
"""


@register("events_peak_detection", oracle=PEAK_ORACLE, tags=("events", "analytics", "window"))
def events_peak_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-maximum peaks in the hourly event-count series: hours that
    strictly dominate every neighbor within ±{PEAK_HALF_W} hours AND
    sit at or above the series mean (the mean test is the exact
    integer cross-multiplication n·H ≥ Σn — no division) — the
    load-spike detector that feeds capacity alerts, and the discrete
    cousin of events_changepoint_meanshift (which finds level SHIFTS;
    this finds spikes).

    Scale shape: one partial-aggregated groupBy to the hourly frame,
    then ±{PEAK_HALF_W}-row MAX windows over that tiny series (ordered
    by hour on the single-digit-thousands frame; the fact table never
    enters a window). Series boundaries count as dominated via the
    COALESCE(-1) sentinel, matching the oracle exactly."""
    ev = load_table(spark, sf_dir, "events")
    hour_idx = (
        (F.unix_micros("ts") - F.pmod(F.unix_micros("ts"), F.lit(US_1H))) / F.lit(US_1H)
    ).cast("long")
    hourly = (
        ev.select(hour_idx.alias("hour_idx"))
        .groupBy("hour_idx")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        # hours-sized frame consumed twice (totals + the neighbor
        # windows); unpinned, both re-run the fact-table aggregate.
        .transform(pin)
    )
    tot = hourly.agg(
        F.sum("n").cast("long").alias("tot_n"), F.count(F.lit(1)).cast("long").alias("tot_h")
    )
    from ..session import tiny_frame_key

    base_w = W.partitionBy(tiny_frame_key("n")).orderBy("hour_idx")
    l_max = F.max("n").over(base_w.rowsBetween(-PEAK_HALF_W, -1))
    r_max = F.max("n").over(base_w.rowsBetween(1, PEAK_HALF_W))
    nb = hourly.select("hour_idx", "n", l_max.alias("l_max"), r_max.alias("r_max"))
    return (
        nb.crossJoin(F.broadcast(tot))
        .filter(
            (F.col("n") > F.coalesce("l_max", F.lit(-1)))
            & (F.col("n") > F.coalesce("r_max", F.lit(-1)))
            & (F.col("n") * F.col("tot_h") >= F.col("tot_n"))
        )
        .select("hour_idx", "n")
    )
