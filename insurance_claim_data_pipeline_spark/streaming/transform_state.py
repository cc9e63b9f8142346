"""transformWithState (Spark 4.x arbitrary-state API) and streaming
deduplication.

Two round-2 streaming extensions beyond the reference (which has no
streaming at all — claim_pipeline.py:33, :155-233 is one-shot batch):

1. ``events_lastk_types`` — per-user last-K event types, the shape of a
   "recent activity" feature. The BATCH twin is oracle-checked; the
   streaming implementation uses ``transformWithStateInPandas`` with
   **ListState** (the Spark 4 StatefulProcessor API — typed state
   variables, timers, TTL — successor to applyInPandasWithState's
   single-blob state). The API runs a gRPC state server between the JVM
   and the Python worker and therefore needs ``google.protobuf``, which
   this container does not ship — so the streaming path is gated behind
   :data:`TWS_AVAILABLE` exactly like the PIL-gated multimodal decode:
   the processor, schemas and query wiring are real and tested
   (tests/test_streaming.py skips when the capability probe fails), and
   the registry carries the oracle-checked batch twin.

2. ``events_dedup_streaming`` — streaming exact dedup via
   ``dropDuplicatesWithinWatermark``: drops event_id duplicates whose
   arrivals land within the watermark delay of each other, with state
   that EXPIRES (unlike plain dropDuplicates on a stream, whose state
   grows forever). The equality test injects a duplicated input file
   and asserts the drained stream equals batch DISTINCT.

Scale notes: both operators shuffle once on their key per micro-batch;
state is per-key in the state store (RocksDB provider in production —
required for transformWithState, optional for dedup). Last-K state is
O(K) per user; dedup state is O(events inside the watermark horizon),
which is the point of the watermarked variant.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any, Iterator, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..session import load_table
from .events_stream import _events_stream, run_stream_to_memory

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

LAST_K = 3


def tws_available() -> bool:
    """transformWithStateInPandas needs google.protobuf for its
    JVM↔Python state-server channel; probe it instead of crashing the
    streaming query mid-batch."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


TWS_AVAILABLE = tws_available()

LASTK_OUTPUT_SCHEMA = "user_id bigint, last_types string"


def make_lastk_processor():
    """Build the StatefulProcessor for per-user last-K event types.

    ListState keeps the K most recent (ts_us, event_type) pairs; each
    micro-batch folds its rows in event-time order and emits the updated
    snapshot, so the LAST emission per user equals the batch twin on a
    finite input. Constructed lazily (a) so importing this module never
    requires the streaming API, (b) as a closure, pickled by value — the
    driver-side streaming worker can't import this package."""
    import pandas as pd
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class LastKTypesProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getListState("lastk", "ts_us bigint, t string")

        def handleInputRows(
            self, key: Tuple[Any, ...], rows: Iterator["pd.DataFrame"], timerValues
        ) -> Iterator["pd.DataFrame"]:
            vals = [(int(ts), str(t)) for ts, t in self._state.get()]
            for pdf in rows:
                ordered = pdf.sort_values(["ts_us", "event_id"])
                vals.extend(zip(ordered["ts_us"].astype("int64"), ordered["event_type"]))
            vals.sort()
            vals = vals[-LAST_K:]
            self._state.put([(ts, t) for ts, t in vals])
            yield pd.DataFrame(
                {
                    "user_id": [int(key[0])],
                    "last_types": ["|".join(t for _, t in vals)],
                }
            )

        def close(self) -> None:
            pass

    return LastKTypesProcessor()


def lastk_types_stream(events: DataFrame) -> DataFrame:
    """Streaming per-user last-K tracker (requires TWS_AVAILABLE)."""
    if not TWS_AVAILABLE:
        raise RuntimeError(
            "transformWithStateInPandas needs google.protobuf, which this "
            "environment does not provide; use events_lastk_types (batch)."
        )
    prepared = events.select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us"), "event_type"
    )
    return prepared.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=make_lastk_processor(),
        outputStructType=LASTK_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


LASTK_ORACLE = f"""
WITH ranked AS (
  SELECT user_id, event_type, ts, event_id,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC)
           AS rnk
  FROM events
)
SELECT user_id,
       string_agg(event_type, '|' ORDER BY ts, event_id) AS last_types
FROM ranked
WHERE rnk <= {LAST_K}
GROUP BY user_id
"""


@register("events_lastk_types", oracle=LASTK_ORACLE, tags=("events", "streaming"))
def events_lastk_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the last-K tracker: the K most recent event types
    per user, oldest→newest, pipe-joined. (ts, event_id) is a unique
    total order, so the cut and the join order are deterministic.

    Plan: one shuffle on user_id; the top-K runs as a rank window and
    the ordered join as array_sort over K-element arrays — no second
    shuffle, no collect."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    rnk = F.row_number().over(
        W.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    )
    kept = ev.select("user_id", "event_type", "ts", "event_id", rnk.alias("rnk")).filter(
        F.col("rnk") <= LAST_K
    )
    ordered = F.array_sort(
        F.collect_list(F.struct(F.unix_micros("ts").alias("ts_us"), "event_id", "event_type"))
    )
    return kept.groupBy("user_id").agg(
        F.concat_ws("|", F.transform(ordered, lambda s: s["event_type"])).alias("last_types")
    )


def dedup_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup on event_id with bounded state: duplicates
    arriving within the watermark horizon are dropped; state for events
    older than the horizon is evicted. Projection mirrors dedup-by-key
    batch semantics (first occurrence wins per micro-batch ordering)."""
    return (
        events.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id", "user_id", "event_type", F.unix_micros("ts").alias("ts_us"))
    )


DEDUP_STREAM_ORACLE = """
SELECT event_id, user_id, event_type,
       CAST(epoch_us(ts) AS BIGINT) AS ts_us
FROM events
"""


@register(
    "events_dedup_streaming",
    oracle=DEDUP_STREAM_ORACLE,
    tags=("events", "streaming", "dedup"),
)
def events_dedup_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming execution of exact event dedup,
    ORACLE-CHECKED (upgraded from rows-only in r06): event_id is unique
    in the events table (enforced by the dq_fk_discovery canary), so on
    the pristine source the deduped stream must emit EVERY event exactly
    once — the oracle certifies no-drop/no-dup delivery through the
    watermarked state store. The dedup semantics themselves (duplicates
    within the watermark horizon dropped, first occurrence wins) are
    pinned by the duplicate-injection equality test in
    tests/test_streaming.py."""
    events = _events_stream(spark, sf_dir)
    return run_stream_to_memory(dedup_stream(events), spark, output_mode="append")
