"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference has no streaming at all (one-shot batch with frozen time,
claim_pipeline.py:33, :155-233); this is the extension surface for
arbitrary per-key running state that Spark's built-in streaming
aggregates can't express (e.g. conditional counters, last-N tracking,
custom session logic). The demo operator keeps per-user running totals
(event count, value sum, last event micros) across micro-batches.

Correctness contract: after draining a finite input, the LAST update
emitted per user must equal the batch groupBy result — asserted in
tests/test_streaming.py against the oracle-checked batch twin
(events_user_totals below).

Scale notes: state lives in the state store, partitioned by the group
key — one shuffle on user_id per micro-batch, state size O(distinct
users), Arrow-batched transfer to the Python worker. For production
you'd add a timeout (GroupStateTimeout) to expire idle keys; the demo
keeps NoTimeout because the input is finite.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..registry import register
from ..session import load_table

OUTPUT_SCHEMA = (
    "user_id bigint, n_events bigint, sum_value_cents bigint, last_event_us bigint"
)
STATE_SCHEMA = "n bigint, cents bigint, last_us bigint"


def user_totals_stream(events: DataFrame) -> DataFrame:
    """Streaming per-user running totals over a stream of events rows
    (requires a ``ts`` timestamp and ``value`` double column)."""

    def update_user_totals(
        key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        # Fold each micro-batch's rows for one user into running state
        # and emit the updated snapshot. Values are folded as integer
        # cents, rounded per row as floor(x*100 + 0.5) — the one
        # convention all three engines (pandas fold, Spark batch twin,
        # DuckDB oracle) express identically, making the sum exact and
        # order-independent.
        # Defined as a closure so cloudpickle ships it by value: Python
        # workers don't need this package importable (the driver contract
        # runs from an arbitrary cwd with no PYTHONPATH for workers).
        import numpy as np

        (user_id,) = key
        n, cents, last_us = state.get if state.exists else (0, 0, 0)
        for pdf in pdfs:
            n += len(pdf)
            cents += int(np.floor(pdf["value"].astype(float) * 100 + 0.5).sum())
            if len(pdf):
                last_us = max(last_us, int(pdf["ts_us"].max()))
        state.update((n, cents, last_us))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "sum_value_cents": [cents],
                "last_event_us": [last_us],
            }
        )

    prepared = events.select(
        "user_id", F.unix_micros("ts").alias("ts_us"), "value"
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        update_user_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


USER_TOTALS_ORACLE = """
SELECT user_id,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_cents,
       MAX(epoch_us(ts)) AS last_event_us
FROM events
GROUP BY user_id
"""


@register("events_user_totals", oracle=USER_TOTALS_ORACLE, tags=("events", "agg", "streaming"))
def events_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stateful streaming operator: per-user totals as
    one hash aggregate (integer-cents sum — exact and order-free)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long")).alias("sum_value_cents"),
        F.max(F.unix_micros("ts")).alias("last_event_us"),
    )


@register("events_user_totals_stateful_streaming", tags=("events", "streaming"))
def events_user_totals_stateful_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming execution of the stateful per-user totals
    (rows-only check; batch/stream equality is asserted in tests against
    the oracle-checked batch twin). Returns the final snapshot per user
    (last update wins)."""
    from .events_stream import _events_stream, run_stream_to_memory

    events = _events_stream(spark, sf_dir)
    out = run_stream_to_memory(user_totals_stream(events), spark, output_mode="update")
    # update-mode memory sink appends every per-batch snapshot; the final
    # state per user is the row with the highest n_events
    w_last = W.partitionBy("user_id").orderBy(F.desc("n_events"), F.desc("last_event_us"))
    return (
        out.withColumn("rn", F.row_number().over(w_last))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


# ---------------------------------------------------------------------------
# Stateful streaming EMA (streaming twin of operators/ema.py)
# ---------------------------------------------------------------------------

EMA_OUT_SCHEMA = "user_id bigint, event_id bigint, ts_us bigint, value double, ema_e6 bigint"
EMA_STATE_SCHEMA = "last_ts bigint, ema bigint, initialized bigint"


def ema_stream(events: DataFrame) -> DataFrame:
    """Streaming per-user time-decayed EMA: state is (last event time,
    running ema) in the same x1e6 integer fixed point as the batch twin
    (operators/ema.py), so a drained finite stream emits EXACTLY the
    batch answer, row for row.

    Ordering contract: rows are folded in (ts, event_id) order WITHIN
    each micro-batch; correctness across batches requires the source to
    deliver batches in non-decreasing event time per user (true for
    time-ordered file drops and for any replayed log partitioned by
    key). A production deployment that can see cross-batch disorder
    fronts this with a watermark + sort buffer; state here is O(users),
    one shuffle per micro-batch."""

    def update_ema(
        key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        # Same integer recurrence as the batch twin — closure-shipped,
        # stdlib math only (see update_user_totals above for why).
        import math

        e6 = 1_000_000
        tau = 3_600_000_000.0
        (user_id,) = key
        last_ts, ema, initialized = state.get if state.exists else (0, 0, 0)
        out: dict[str, list] = {"user_id": [], "event_id": [], "ts_us": [], "value": [], "ema_e6": []}
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(["ts_us", "event_id"]).reset_index(drop=True)
        for row in batch.itertuples(index=False):
            ts_us = int(row.ts_us)
            x = int(math.floor(float(row.value) * e6 + 0.5))
            if not initialized:
                ema, initialized = x, 1
            else:
                w = int(math.floor(e6 * (1.0 - math.exp(-(ts_us - last_ts) / tau)) + 0.5))
                ema = (w * x + (e6 - w) * ema) // e6
            last_ts = ts_us
            out["user_id"].append(user_id)
            out["event_id"].append(int(row.event_id))
            out["ts_us"].append(ts_us)
            out["value"].append(float(row.value))
            out["ema_e6"].append(ema)
        state.update((last_ts, ema, initialized))
        yield pd.DataFrame(out)

    prepared = events.select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us"), "value"
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        update_ema,
        outputStructType=EMA_OUT_SCHEMA,
        stateStructType=EMA_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


@register("events_ema_streaming", tags=("events", "streaming", "pandas"))
def events_ema_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming execution of the per-user EMA (rows-only
    check; every emitted row must equal the oracle-checked batch twin
    events_ema_irregular — asserted in tests/test_streaming.py, both
    single-batch and under forced time-split micro-batching)."""
    from .events_stream import _events_stream, run_stream_to_memory

    events = _events_stream(spark, sf_dir)
    return run_stream_to_memory(ema_stream(events), spark, output_mode="update")
