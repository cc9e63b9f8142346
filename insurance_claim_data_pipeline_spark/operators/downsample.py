"""Custom batch operator via ``applyInPandas``: LTTB (Largest Triangle
Three Buckets) time-series downsampling per user.

Second member of the justified-pandas family (with operators/ema.py):
LTTB keeps, per bucket, the point forming the largest triangle with the
PREVIOUSLY SELECTED point and the next bucket's centroid — the selection
depends on the algorithm's own prior output, which no window frame can
express. Everything around the sequential core (grouping, ordering,
schema, shuffle) stays engine-side: one shuffle on user_id, Arrow
transfer, O(events) per user.

This is the standard dashboard/monitoring reducer: ~millions of points
per series down to a plot-sized sketch that preserves visual extremes
(peaks/troughs win triangle areas), where uniform striding would alias
them away.

Correctness: fully oracled (r03 upgrade from rows-only). The
sequential self-referencing selection IS expressible in DuckDB as a
recursive CTE whose state is (bucket index, last-kept point): per
iteration, an inline list expression recomputes the candidate range,
the next-bucket centroid (same left-fold double sums both engines
round identically), the triangle areas, and the first-position argmax
— which equals Python's strict-``>`` earliest-tie loop. The whole
selection is therefore deterministic double math in identical order,
so the driver value hash matches. tests/test_llm_ops.py additionally
recomputes LTTB independently in plain Python and asserts the exact
same rows are chosen.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.grouped import sorted_grouped_map
from ..registry import register
from ..session import load_table

LTTB_BUCKETS = 20  # points kept per user series (incl. endpoints)

LTTB_SCHEMA = "user_id bigint, event_id bigint, ts_us bigint, value double"


def _lttb_oracle(n_out: int = LTTB_BUCKETS) -> str:
    """Recursive-CTE replay of the LTTB scan (module docstring). The
    repeated lo/hi/centroid sub-expressions are macro-expanded inline
    because DuckDB's recursive term cannot correlate through nested
    subqueries; recomputation is deterministic so it cannot diverge."""
    lo = "(1 + CAST(FLOOR(b * width) AS INTEGER))"
    hi = "(LEAST(1 + CAST(FLOOR((b + 1) * width) AS INTEGER), n - 1))"
    nhi = (
        f"(CASE WHEN b + 2 < {n_out} - 1 "
        f"THEN LEAST(1 + CAST(FLOOR((b + 2) * width) AS INTEGER), n) ELSE n END)"
    )
    cx = f"(list_reduce(ts[{hi} + 1 : {nhi}], (x, y) -> x + y) / ({nhi} - {hi}))"
    cy = f"(list_reduce(xs[{hi} + 1 : {nhi}], (x, y) -> x + y) / ({nhi} - {hi}))"
    areas = (
        f"list_transform(range({lo}, {hi}), ii -> ABS("
        f"(ts[last_i + 1] - {cx}) * (xs[ii + 1] - xs[last_i + 1])"
        f" - (ts[last_i + 1] - ts[ii + 1]) * ({cy} - xs[last_i + 1])))"
    )
    best = f"COALESCE(range({lo}, {hi})[list_position({areas}, list_max({areas}))], {lo})"
    return f"""
WITH RECURSIVE s AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us, value,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) - 1 AS i,
         COUNT(*) OVER (PARTITION BY user_id) AS n
  FROM events
), arr AS (
  SELECT user_id, CAST(n AS INTEGER) AS n,
         list(CAST(ts_us AS DOUBLE) ORDER BY i) AS ts,
         list(value ORDER BY i) AS xs
  FROM s GROUP BY user_id, n
), rec AS (
  SELECT user_id, n, ts, xs,
         CAST((n - 2) AS DOUBLE) / ({n_out} - 2) AS width,
         0 AS b, 0 AS last_i
  FROM arr WHERE n > {n_out}
  UNION ALL
  SELECT user_id, n, ts, xs, width, b + 1, {best}
  FROM rec WHERE b < {n_out} - 2
), kept AS (
  SELECT user_id, last_i AS i FROM rec
  UNION ALL
  SELECT user_id, n - 1 AS i FROM arr WHERE n > {n_out}
  UNION ALL
  SELECT s.user_id, CAST(s.i AS INTEGER) FROM s WHERE s.n <= {n_out}
)
SELECT s.user_id, s.event_id, s.ts_us, s.value
FROM s JOIN kept ON s.user_id = kept.user_id AND s.i = kept.i
"""


def lttb_select(ts: list, xs: list, n_out: int) -> list:
    """Indices LTTB keeps for one already-sorted series. Pure Python
    floats (not numpy) so the test's recomputation is bit-identical.
    Ties on area pick the earliest point; first/last always kept."""
    n = len(ts)
    if n <= n_out:
        return list(range(n))
    keep = [0]
    # bucket boundaries over the interior points [1, n-1)
    width = (n - 2) / (n_out - 2)
    for b in range(n_out - 2):
        lo = 1 + int(b * width)
        hi = 1 + int((b + 1) * width)
        hi = min(hi, n - 1)
        nlo, nhi = hi, (1 + int((b + 2) * width) if b + 2 < n_out - 1 else n)
        nhi = min(nhi, n)
        # next-bucket centroid (the last "bucket" is the final point)
        cx = sum(ts[nlo:nhi]) / (nhi - nlo)
        cy = sum(xs[nlo:nhi]) / (nhi - nlo)
        ax, ay = ts[keep[-1]], xs[keep[-1]]
        best, best_area = lo, -1.0
        for i in range(lo, hi):
            area = abs((ax - cx) * (xs[i] - ay) - (ax - ts[i]) * (cy - ay))
            if area > best_area:
                best, best_area = i, area
        keep.append(best)
    keep.append(n - 1)
    return keep


def lttb_frame(events: DataFrame, n_out: int = LTTB_BUCKETS) -> DataFrame:
    # closure (shipped by value — workers never import this package)
    def lttb_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts_us", "event_id"]).reset_index(drop=True)
        ts = [float(t) for t in pdf["ts_us"]]
        xs = [float(v) for v in pdf["value"]]
        n = len(ts)
        if n <= n_out:
            keep = list(range(n))
        else:
            keep = [0]
            width = (n - 2) / (n_out - 2)
            for b in range(n_out - 2):
                lo = 1 + int(b * width)
                hi = min(1 + int((b + 1) * width), n - 1)
                nlo = hi
                nhi = min(1 + int((b + 2) * width) if b + 2 < n_out - 1 else n, n)
                cx = sum(ts[nlo:nhi]) / (nhi - nlo)
                cy = sum(xs[nlo:nhi]) / (nhi - nlo)
                ax, ay = ts[keep[-1]], xs[keep[-1]]
                best, best_area = lo, -1.0
                for i in range(lo, hi):
                    area = abs((ax - cx) * (xs[i] - ay) - (ax - ts[i]) * (cy - ay))
                    if area > best_area:
                        best, best_area = i, area
                keep.append(best)
            keep.append(n - 1)
        return pdf.iloc[keep][["user_id", "event_id", "ts_us", "value"]]

    return sorted_grouped_map(events, ["user_id"], lttb_group, LTTB_SCHEMA)


@register("events_lttb_downsample", oracle=_lttb_oracle(), tags=("events", "pandas", "llm"))
def events_lttb_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LTTB downsampling of each user's event series to LTTB_BUCKETS
    visually-representative points (module docstring). Fully oracled
    via a recursive-CTE replay of the selection scan; the exact-
    recompute equality test additionally gates it."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us"), "value"
    )
    return lttb_frame(ev)


# ---------------------------------------------------------------------------
# M4 downsampling (min/max/first/last per pixel bucket)
# ---------------------------------------------------------------------------

M4_WIDTH = 200  # pixel columns per series

M4_ORACLE = f"""
WITH ev AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us, value FROM events
), ext AS (
  SELECT user_id, CAST(MIN(ts_us) AS BIGINT) AS t0, CAST(MAX(ts_us) AS BIGINT) AS t1
  FROM ev GROUP BY 1
), b AS (
  SELECT e.user_id, e.event_id, e.ts_us, e.value,
         LEAST((e.ts_us - x.t0) * {M4_WIDTH} // GREATEST(x.t1 - x.t0 + 1, 1),
               {M4_WIDTH} - 1) AS px
  FROM ev e JOIN ext x ON e.user_id = x.user_id
)
SELECT user_id, CAST(px AS BIGINT) AS px,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MIN(ts_us) AS BIGINT) AS t_first,
       CAST(MAX(ts_us) AS BIGINT) AS t_last,
       CAST(ROUND(MIN(value) * 100) AS BIGINT) AS v_min_e2,
       CAST(ROUND(MAX(value) * 100) AS BIGINT) AS v_max_e2,
       CAST(ROUND(MIN(struct_pack(t := ts_us, id := event_id, v := value)).v * 100)
            AS BIGINT) AS v_first_e2,
       CAST(ROUND(MAX(struct_pack(t := ts_us, id := event_id, v := value)).v * 100)
            AS BIGINT) AS v_last_e2
FROM b GROUP BY 1, 2
"""


@register("events_m4_downsample", oracle=M4_ORACLE, tags=("events", "agg", "scale"))
def events_m4_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 time-series downsampling (Jugel et al., VLDB'14): per series
    and pixel column keep exactly min, max, first and last — the four
    values that make a line chart rendered from the reduction
    PIXEL-IDENTICAL to one rendered from all points. Unlike LTTB (a
    sequential per-series pandas pass), M4 is a pure grouped aggregate:
    one shuffle on (series, pixel), map-side combined, perfectly
    scalable — which is why it is THE reduction dashboards push down to
    the store at 100 TB.

    first/last are MIN/MAX over a (ts, event_id, value) struct
    (lexicographic struct ordering, identical in both engines, with
    the unique event_id tie-break — the as-of-join idiom); values are
    quantized to cents at emission."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us"), "value"
    )
    ext = ev.groupBy("user_id").agg(
        F.min("ts_us").alias("t0"), F.max("ts_us").alias("t1")
    )
    px = F.least(
        F.floor(
            (F.col("ts_us") - F.col("t0"))
            * M4_WIDTH
            / F.greatest(F.col("t1") - F.col("t0") + 1, F.lit(1))
        ),
        F.lit(M4_WIDTH - 1),
    ).cast("long")
    b = ev.join(F.broadcast(ext), "user_id").select(
        "user_id", "event_id", "ts_us", "value", px.alias("px")
    )
    key = F.struct(
        F.col("ts_us").alias("t"), F.col("event_id").alias("id"), F.col("value").alias("v")
    )
    return b.groupBy("user_id", "px").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.min("ts_us").cast("long").alias("t_first"),
        F.max("ts_us").cast("long").alias("t_last"),
        F.round(F.min("value") * 100).cast("long").alias("v_min_e2"),
        F.round(F.max("value") * 100).cast("long").alias("v_max_e2"),
        F.round(F.min(key)["v"] * 100).cast("long").alias("v_first_e2"),
        F.round(F.max(key)["v"] * 100).cast("long").alias("v_last_e2"),
    )
