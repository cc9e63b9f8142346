"""Table-maintenance and stream-operations planners.

Two operators a 100 TB lakehouse deployment runs constantly but most
query engines leave to external tooling:

- ``sink_compaction_plan`` — the bin-packing step of Delta/Iceberg
  ``OPTIMIZE``: group small files within each partition into
  target-size rewrite jobs (next-fit by file order), leaving
  already-large files alone. Planning is pure metadata work — the
  inventory frame is |files| rows, orders of magnitude smaller than
  the data — so the plan itself is a cheap windowed aggregate even
  when the table is 100 TB.
- ``events_watermark_lateness`` — the measurement that sizes a
  Structured Streaming watermark: how late do events actually arrive,
  relative to the max event-time seen so far in arrival order? The
  running max is computed with the same two-level bucket construction
  as the packing prefix sums (per-bucket running max + broadcast
  prefix-max of bucket maxima — MAX is associative, so the
  decomposition is exact), never a global single-task window.

Beyond-reference extension surface (the reference is a 242-line batch
ETL with no file management or streaming — SURVEY §2.2); north-star
LLM-pipeline ops per BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..session import load_table, pin, tiny_frame_key

# ---------------------------------------------------------------------------
# Compaction planner (OPTIMIZE-style bin packing of small files)
# ---------------------------------------------------------------------------

FILE_GROUP_W = 500  # event_ids per synthetic file
TARGET_BYTES = 60_000  # rewrite-job payload target

COMPACTION_ORACLE = f"""
WITH inv AS (
  SELECT strftime(ts, '%Y-%m-%d') AS part_day,
         event_id // {FILE_GROUP_W} AS file_id,
         CAST(SUM(length(COALESCE(props, '')) + 64) AS BIGINT) AS file_bytes
  FROM events GROUP BY 1, 2
), small AS (
  SELECT *,
         CAST(SUM(file_bytes) OVER (PARTITION BY part_day ORDER BY file_id
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_end
  FROM inv WHERE file_bytes < {TARGET_BYTES}
), assign AS (
  SELECT part_day, file_id, file_bytes,
         (cum_end - file_bytes) // {TARGET_BYTES} AS bin_id
  FROM small
)
SELECT part_day, bin_id,
       CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(SUM(file_bytes) AS BIGINT) AS bin_bytes,
       CAST(MIN(file_id) AS BIGINT) AS first_file_id,
       CAST(MAX(file_id) AS BIGINT) AS last_file_id,
       COUNT(*) > 1 AS rewrite_needed
FROM assign GROUP BY 1, 2
"""


@register("sink_compaction_plan", oracle=COMPACTION_ORACLE, tags=("sink", "scale", "warehouse"))
def sink_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIMIZE-style compaction planner: build a per-partition file
    inventory (synthetic: day-partitioned event files of FILE_GROUP_W
    rows, payload = props bytes + fixed row overhead), drop files
    already at/above TARGET_BYTES, and next-fit-pack the small ones in
    file_id order into rewrite bins of ~TARGET_BYTES. Emits one row
    per planned rewrite job with its contiguous file range;
    single-file bins (rewrite_needed = false) are no-ops a scheduler
    skips.

    Scale shape: the fact scan reduces to |files| metadata rows in one
    map-side-combined aggregate (in production this frame comes free
    from the table manifest); the prefix sum windows over
    PARTITION BY part_day — bounded per-partition file counts, no
    global ordering, no single-task collapse. Next-fit (not best-fit)
    is deliberate: it is the zero-look-ahead discipline that yields
    deterministic, manifest-order-stable plans.
    """
    ev = load_table(spark, sf_dir, "events")
    inv = (
        ev.groupBy(
            F.date_format("ts", "yyyy-MM-dd").alias("part_day"),
            F.floor(F.col("event_id") / FILE_GROUP_W).cast("long").alias("file_id"),
        )
        .agg(
            F.sum(F.length(F.coalesce(F.col("props"), F.lit(""))) + F.lit(64))
            .cast("long")
            .alias("file_bytes")
        )
        .filter(F.col("file_bytes") < TARGET_BYTES)
    )
    cum_end = F.sum("file_bytes").over(
        Window.partitionBy("part_day").orderBy("file_id")
    )
    assigned = inv.select(
        "part_day",
        "file_id",
        "file_bytes",
        F.floor((cum_end - F.col("file_bytes")) / TARGET_BYTES)
        .cast("long")
        .alias("bin_id"),
    )
    return assigned.groupBy("part_day", "bin_id").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum("file_bytes").alias("bin_bytes"),
        F.min("file_id").alias("first_file_id"),
        F.max("file_id").alias("last_file_id"),
        (F.count(F.lit(1)) > 1).alias("rewrite_needed"),
    )


# ---------------------------------------------------------------------------
# Watermark-lateness profile (sizing withWatermark for real arrivals)
# ---------------------------------------------------------------------------

WM_BUCKET_SECS = 3600  # arrival seconds per prefix-max bucket
WM_MAX_DELAY = 900  # synthetic ingest delay bound (seconds)

# Band upper bounds in seconds; the last band is open-ended.
_WM_BANDS = (0, 60, 300, 900, 3600)


def _wm_band_sql(expr: str) -> str:
    cases = [f"WHEN {expr} <= 0 THEN 0"]
    for i in range(1, len(_WM_BANDS)):
        cases.append(f"WHEN {expr} <= {_WM_BANDS[i]} THEN {i}")
    return "CASE " + " ".join(cases) + f" ELSE {len(_WM_BANDS)} END"


WM_LATENESS_ORACLE = f"""
WITH arr AS (
  SELECT event_id, ts,
         epoch_us(ts) + (('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))::BIGINT
                         % {WM_MAX_DELAY}) * 1000000 AS arrival_us
  FROM events
), runmax AS (
  SELECT ts,
         MAX(ts) OVER (ORDER BY arrival_us, event_id ROWS UNBOUNDED PRECEDING)
           AS max_seen
  FROM arr
), late AS (
  SELECT CAST((epoch_us(max_seen) - epoch_us(ts)) // 1000000 AS BIGINT) AS late_s
  FROM runmax
)
SELECT CAST({_wm_band_sql("late_s")} AS BIGINT) AS band,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(MAX(late_s) AS BIGINT) AS max_lateness_s
FROM late GROUP BY 1
"""


@register("events_watermark_lateness", oracle=WM_LATENESS_ORACLE, tags=("events", "streaming", "scale"))
def events_watermark_lateness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-sizing profile: compute each event's lateness versus
    the max event-time seen so far in arrival order (exactly the
    quantity ``withWatermark`` bounds), then band it (on-time, ≤1 m,
    ≤5 m, ≤15 m, ≤1 h, later) with per-band counts and the worst
    observed lateness. Reading the result: the smallest band bound
    covering ~p99.9 of events is the watermark delay that drops
    almost nothing.

    The fixture has no ingest-sequence column and event_id is
    time-monotone (zero lateness — a vacuous profile), so arrival is
    modeled deterministically: arrival_s = epoch(ts) + md5(event_id)
    mod WM_MAX_DELAY, a bounded per-event ingest delay; in production
    the Kafka offset / ingest timestamp replaces it verbatim.

    The running max is the associative-scan decomposition (two-level,
    like the packing prefix sums): per-bucket running max windows over
    PARTITION BY arrival-hour bucket (contiguous in arrival order);
    bucket maxima — a tiny aggregate — get a prefix max over the tiny
    frame, broadcast back, and ``greatest()`` combines the two. No
    global-order window touches the fact table; at 100 TB shrink
    WM_BUCKET_SECS until per-bucket rows fit a task.
    """
    base = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.col("ts"),
        (
            F.unix_micros("ts")
            + F.pmod(
                F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 8), 16, 10).cast(
                    "long"
                ),
                F.lit(WM_MAX_DELAY),
            )
            * F.lit(1_000_000)
        ).alias("arrival_us"),
    )
    ev = base.withColumn(
        "bkt", F.floor(F.col("arrival_us") / (WM_BUCKET_SECS * 1_000_000)).cast("long")
    )
    in_bkt_max = F.max("ts").over(
        Window.partitionBy("bkt").orderBy("arrival_us", "event_id")
    )
    ev = ev.withColumn("in_bkt_max", in_bkt_max)
    prior_max = F.max("bkt_max").over(
        Window.partitionBy(tiny_frame_key("bkt"))
        .orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        ev.groupBy("bkt")
        .agg(F.max("ts").alias("bkt_max"))
        .select("bkt", prior_max.alias("prior_max"))
    )
    late_s = F.floor(
        (
            F.unix_micros(
                F.greatest("in_bkt_max", F.coalesce("prior_max", "in_bkt_max"))
            )
            - F.unix_micros("ts")
        )
        / F.lit(1_000_000)
    ).cast("long")
    banded = ev.join(F.broadcast(offsets), "bkt").select(late_s.alias("late_s"))
    band = F.when(F.col("late_s") <= 0, F.lit(0))
    for i in range(1, len(_WM_BANDS)):
        band = band.when(F.col("late_s") <= _WM_BANDS[i], F.lit(i))
    band = band.otherwise(F.lit(len(_WM_BANDS)))
    return banded.groupBy(band.cast("long").alias("band")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max("late_s").alias("max_lateness_s"),
    )


# ---------------------------------------------------------------------------
# Batch twin of append-mode watermark finalization.
# ---------------------------------------------------------------------------

WM_TWIN_DELAY_US = 300 * 1_000_000
WM_WINDOW_US = 600 * 1_000_000

WM_FINALIZED_ORACLE = f"""
WITH ev AS (
  SELECT epoch_us(ts) AS ts_us, event_type FROM events
), mx AS (
  SELECT MAX(ts_us) AS max_us FROM ev
), agg AS (
  SELECT (ts_us // {WM_WINDOW_US}) * {WM_WINDOW_US} AS window_start_us,
         event_type, CAST(COUNT(*) AS BIGINT) AS n_events
  FROM ev GROUP BY 1, 2
)
SELECT a.window_start_us, a.event_type, a.n_events
FROM agg a, mx
WHERE a.window_start_us + {WM_WINDOW_US} <= mx.max_us - {WM_TWIN_DELAY_US}
"""


@register(
    "events_watermark_finalized",
    oracle=WM_FINALIZED_ORACLE,
    tags=("events", "streaming", "agg"),
)
def events_watermark_finalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of ``events_watermark_drop_streaming``: the windows an
    append-mode watermarked aggregation FINALIZES when the whole table
    arrives as one micro-batch — i.e. tumbling 10-minute counts for
    windows whose end precedes (max event time − delay). Window starts
    are epoch-aligned floor division on microseconds, exactly
    ``F.window``'s boundary rule, so the streaming run must match
    row-for-row (asserted in tests/test_streaming.py, along with the
    multi-batch late-drop case simulated batch-side).

    Scale: one aggregate plus a broadcast 1-row max frame — the
    finalization filter is a scalar comparison, not a join."""
    ev = load_table(spark, sf_dir, "events").select(
        F.unix_micros("ts").alias("ts_us"), "event_type"
    )
    # The global max event time is the max of per-window maxes, so it
    # rides the SAME aggregate instead of a second full scan (the
    # audit's 2-scan case: ev fed both mx and agg), and the global fold
    # is a window over the tiny grouped frame — no pin barrier, no
    # crossJoin, one corpus pass.
    agg = ev.groupBy(
        (F.floor(F.col("ts_us") / WM_WINDOW_US) * WM_WINDOW_US).alias(
            "window_start_us"
        ),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max("ts_us").alias("g_max_us"),
    )
    max_us = F.max("g_max_us").over(Window.partitionBy(tiny_frame_key("window_start_us")))
    return (
        agg.withColumn("max_us", max_us)
        .filter(
            F.col("window_start_us") + WM_WINDOW_US
            <= F.col("max_us") - WM_TWIN_DELAY_US
        )
        .select("window_start_us", "event_type", "n_events")
    )


# ---------------------------------------------------------------------------
# Retention-based VACUUM planner
# ---------------------------------------------------------------------------

VACUUM_RETAIN_DAYS = 7  # events span ~30 days; a 7-day horizon leaves real work

VACUUM_ORACLE = f"""
WITH inv AS (
  SELECT strftime(ts, '%Y-%m-%d') AS part_day,
         event_id // {FILE_GROUP_W} AS file_id,
         CAST(SUM(length(COALESCE(props, '')) + 64) AS BIGINT) AS file_bytes,
         CAST(MAX(epoch_us(ts)) AS BIGINT) AS max_ts_us
  FROM events GROUP BY 1, 2
), horizon AS (
  SELECT MAX(max_ts_us) - {VACUUM_RETAIN_DAYS}::BIGINT * 86400 * 1000000
           AS cutoff_us
  FROM inv
), marked AS (
  SELECT i.*, i.max_ts_us < h.cutoff_us AS expired,
         -- superseded: a later compaction rewrote the day (modeled:
         -- even file ids are the rewritten generation and survive)
         (i.file_id % 2) = 1 AS superseded
  FROM inv i, horizon h
)
SELECT part_day,
       CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(COUNT(*) FILTER (expired AND superseded) AS BIGINT) AS n_deletable,
       CAST(COALESCE(SUM(file_bytes) FILTER (expired AND superseded), 0) AS BIGINT)
         AS reclaim_bytes
FROM marked GROUP BY 1
HAVING COUNT(*) FILTER (expired AND superseded) > 0
"""


@register("sink_vacuum_plan", oracle=VACUUM_ORACLE, tags=("sink", "warehouse", "scale"))
def sink_vacuum_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VACUUM planner: from the same metadata-sized file inventory as
    the compaction planner, mark files both past the retention horizon
    (newest row older than max-seen minus {VACUUM_RETAIN_DAYS} days)
    AND superseded by a rewrite (modeled: odd file ids are the
    pre-compaction generation), and emit the per-partition deletion
    manifest with reclaimable bytes — Delta VACUUM / Iceberg
    expire-snapshots as a planning query. Only days with something to
    delete appear (a HAVING over the tiny per-day rollup). The
    retention guard is the whole point: expired-but-current files are
    NEVER listed, asserted in tests."""
    ev = load_table(spark, sf_dir, "events")
    inv = ev.groupBy(
        F.date_format("ts", "yyyy-MM-dd").alias("part_day"),
        F.floor(F.col("event_id") / FILE_GROUP_W).cast("long").alias("file_id"),
    ).agg(
        F.sum(F.length(F.coalesce(F.col("props"), F.lit(""))) + F.lit(64))
        .cast("long")
        .alias("file_bytes"),
        F.max(F.unix_micros("ts")).cast("long").alias("max_ts_us"),
    )
    horizon = inv.agg(
        (F.max("max_ts_us") - F.lit(VACUUM_RETAIN_DAYS * 86400 * 1_000_000))
        .cast("long")
        .alias("cutoff_us")
    )
    marked = inv.crossJoin(F.broadcast(horizon)).select(
        "part_day",
        "file_bytes",
        (F.col("max_ts_us") < F.col("cutoff_us")).alias("expired"),
        (F.pmod(F.col("file_id"), F.lit(2)) == 1).alias("superseded"),
    )
    deletable = F.col("expired") & F.col("superseded")
    return (
        marked.groupBy("part_day")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_files"),
            F.sum(deletable.cast("long")).cast("long").alias("n_deletable"),
            F.coalesce(F.sum(F.when(deletable, F.col("file_bytes"))), F.lit(0))
            .cast("long")
            .alias("reclaim_bytes"),
        )
        .filter(F.col("n_deletable") > 0)
    )


# --- clustering-depth audit (how sorted ARE the files?) ---------------------

CLUSTER_FILES = 32

CLUSTER_DEPTH_ORACLE = f"""
WITH st AS (
  SELECT MIN(l_orderkey) AS lo, MAX(l_orderkey) AS hi,
         CAST(COUNT(*) AS BIGINT) AS n FROM lineitem
), pos AS (
  SELECT l.l_shipdate,
         LEAST((l.l_orderkey - st.lo) * {CLUSTER_FILES}
               // GREATEST(st.hi - st.lo + 1, 1), {CLUSTER_FILES - 1}) AS nat_file,
         (ROW_NUMBER() OVER (ORDER BY epoch_us(l.l_shipdate) // 86400000000,
                             l.l_orderkey, l.l_linenumber) - 1)
           * {CLUSTER_FILES} // st.n AS sorted_file
  FROM lineitem l, st
), ranges AS (
  SELECT 'natural' AS layout, nat_file AS file_id,
         MIN(l_shipdate) AS dt_lo, MAX(l_shipdate) AS dt_hi
  FROM pos GROUP BY 2
  UNION ALL
  SELECT 'sorted', sorted_file, MIN(l_shipdate), MAX(l_shipdate)
  FROM pos GROUP BY 2
), depth AS (
  SELECT a.layout, a.file_id, CAST(COUNT(*) AS BIGINT) AS depth
  FROM ranges a JOIN ranges b
    ON a.layout = b.layout AND a.dt_lo <= b.dt_hi AND b.dt_lo <= a.dt_hi
  GROUP BY 1, 2
)
SELECT layout, CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(SUM(depth) * 1000000 // COUNT(*) AS BIGINT) AS avg_depth_e6,
       CAST(MAX(depth) AS BIGINT) AS max_depth
FROM depth GROUP BY 1
"""


@register(
    "warehouse_clustering_depth", oracle=CLUSTER_DEPTH_ORACLE, tags=("sink", "scale", "dq")
)
def warehouse_clustering_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-OPTIMIZE-style clustering-depth audit: per layout, how
    many files' [min, max] l_shipdate zone-map ranges overlap each
    file (itself included — depth 1 = perfectly clustered, depth =
    n_files = every range predicate reads everything). Measures the
    natural l_orderkey-ranged layout against a shipdate-sorted one;
    this is the metric a table-maintenance service watches to decide
    WHEN re-clustering (sort_range_partitioned / sort_zorder) pays for
    itself — the skipping simulator (sink_skipping_stats) measures one
    workload, depth bounds ALL range workloads on the column.

    Scale shape: one scan to (file, min, max) ranges (the sorted
    layout's file id comes from the exact distributed row_number — at
    real scale this column is read from the parquet footer metadata
    table, no data scan at all), then an interval self-join of the
    {CLUSTER_FILES}-row range frames. Everything past the first
    aggregate is metadata-sized."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_shipdate"
    )
    st = li.agg(
        F.min("l_orderkey").alias("lo"),
        F.max("l_orderkey").alias("hi"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    from .analytics import _with_global_rank

    # unique sort key for the exact global row_number: shipdate-major,
    # (orderkey, linenumber) tiebreak packed into one integer.
    keyed = li.crossJoin(F.broadcast(st)).select(
        "l_shipdate",
        F.least(
            F.expr(f"(l_orderkey - lo) * {CLUSTER_FILES} div greatest(hi - lo + 1, 1)"),
            F.lit(CLUSTER_FILES - 1),
        ).alias("nat_file"),
        # shipdate is stored midnight-timestamp; pack (day, orderkey,
        # linenumber) into one long so the global rank's unique sort key
        # reproduces (shipdate, orderkey, linenumber) order exactly.
        (
            F.expr("unix_micros(l_shipdate) div 86400000000") * F.lit(10_000_000_000)
            + F.col("l_orderkey") * 10
            + F.col("l_linenumber")
        ).alias("_k"),
        F.col("n"),
    )
    ranked = _with_global_rank(
        keyed.select("l_shipdate", "nat_file", "n", (-F.col("_k")).alias("_nk")),
        "_nk",
        "_nk",
        "_r",
    )
    pos = ranked.select(
        "l_shipdate",
        "nat_file",
        F.expr(f"(_r - 1) * {CLUSTER_FILES} div n").alias("sorted_file"),
    )
    ranges = (
        pos.groupBy(F.col("nat_file").alias("file_id"))
        .agg(F.min("l_shipdate").alias("dt_lo"), F.max("l_shipdate").alias("dt_hi"))
        .select(F.lit("natural").alias("layout"), "file_id", "dt_lo", "dt_hi")
        .unionAll(
            pos.groupBy(F.col("sorted_file").alias("file_id"))
            .agg(F.min("l_shipdate").alias("dt_lo"), F.max("l_shipdate").alias("dt_hi"))
            .select(F.lit("sorted").alias("layout"), "file_id", "dt_lo", "dt_hi")
        )
        .transform(pin)  # tiny 64-row frame, self-joined next
    )
    a, b = ranges.alias("a"), ranges.alias("b")
    depth = (
        a.join(
            b,
            (F.col("a.layout") == F.col("b.layout"))
            & (F.col("a.dt_lo") <= F.col("b.dt_hi"))
            & (F.col("b.dt_lo") <= F.col("a.dt_hi")),
        )
        .groupBy(F.col("a.layout").alias("layout"), F.col("a.file_id").alias("file_id"))
        .agg(F.count(F.lit(1)).cast("long").alias("depth"))
    )
    return depth.groupBy("layout").agg(
        F.count(F.lit(1)).cast("long").alias("n_files"),
        F.expr("CAST(sum(depth) * 1000000 div count(1) AS BIGINT)").alias("avg_depth_e6"),
        F.max("depth").cast("long").alias("max_depth"),
    )
