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

Correctness: no DuckDB oracle (sequential self-referencing selection);
tests/test_llm_ops.py recomputes LTTB independently in plain Python
over the collected input and asserts the exact same rows are chosen.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..session import load_table

LTTB_BUCKETS = 20  # points kept per user series (incl. endpoints)

LTTB_SCHEMA = "user_id bigint, event_id bigint, ts_us bigint, value double"


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

    return events.groupBy("user_id").applyInPandas(lttb_group, schema=LTTB_SCHEMA)


@register("events_lttb_downsample", tags=("events", "pandas", "llm"))
def events_lttb_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LTTB downsampling of each user's event series to LTTB_BUCKETS
    visually-representative points (module docstring). Rows-only driver
    check by design; exact-recompute equality test gates it."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us"), "value"
    )
    return lttb_frame(ev)
