"""Custom batch operator via ``applyInPandas``: per-user exponential
moving average over irregularly-spaced event times.

This is the (b)-tier custom-operator case (SURVEY §2.2 / build plan):
the recurrence ``ema_i = w_i·x_i + (1-w_i)·ema_{i-1}`` with a
time-dependent weight ``w_i = 1 - exp(-Δt_i/τ)`` depends on the
previous OUTPUT row, which no built-in window frame can express —
window aggregates fold over inputs, not over their own results. So the
group is handed to a vectorized pandas function; everything around it
(grouping, ordering, schema) stays in the engine.

Scale: one shuffle on user_id, Arrow-batched transfer, O(events) work
per user. Same shape as the streaming stateful twin
(streaming/stateful.py) but for batch backfills.

Correctness: no DuckDB oracle (the recurrence is what SQL can't say);
tests/test_llm_ops.py recomputes the recurrence independently in plain
Python over collected input and asserts exact equality.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..session import load_table

TAU_US = 3_600_000_000  # 1-hour decay constant

EMA_SCHEMA = "user_id bigint, event_id bigint, ts_us bigint, value double, ema double"


def ema_frame(events: DataFrame) -> DataFrame:
    tau_us = TAU_US

    def ema_group(pdf: pd.DataFrame) -> pd.DataFrame:
        # EMA scan per user (the loop is over one user's events, already
        # sorted engine-side). math.exp, not np.exp — the two can differ
        # by one ulp (different libm paths) and the reproducibility
        # contract is exact equality with an independent recomputation.
        # NOTE: defined as a closure, not at module level — cloudpickle
        # then ships it BY VALUE, so Python workers need neither this
        # package on their path nor a matching PYTHONPATH (the driver
        # contract runs from an arbitrary cwd).
        import math

        pdf = pdf.sort_values(["ts_us", "event_id"]).reset_index(drop=True)
        ts = [int(t) for t in pdf["ts_us"]]
        x = [float(v) for v in pdf["value"]]
        ema: list[float] = []
        for i in range(len(x)):
            if i == 0:
                ema.append(x[0])
            else:
                w = 1.0 - math.exp(-(ts[i] - ts[i - 1]) / tau_us)
                ema.append(w * x[i] + (1.0 - w) * ema[i - 1])
        out = pdf[["user_id", "event_id", "ts_us", "value"]].copy()
        out["ema"] = ema
        return out

    prepared = events.select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us"), "value"
    )
    return prepared.groupBy("user_id").applyInPandas(ema_group, schema=EMA_SCHEMA)


@register("events_ema_irregular", tags=("events", "llm", "pandas"))
def events_ema_irregular(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-decayed EMA of event values per user over irregular
    timestamps (rows-only check — the recurrence is exactly what SQL
    cannot express; an independent Python recomputation asserts exact
    equality in tests)."""
    return ema_frame(load_table(spark, sf_dir, "events"))
