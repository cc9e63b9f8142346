"""Streaming file sinks: foreachBatch parquet writer with
exactly-once semantics and checkpoint-based restart recovery.

The memory-sink twins in events_stream.py prove operator semantics;
this module proves the DELIVERY side — how streaming results land
durably. ``foreachBatch`` hands each micro-batch to ordinary batch
code; writing batch N to its own ``batch_id=N`` directory with
mode=overwrite makes the write IDEMPOTENT: if a batch is retried after
a crash (Structured Streaming replays the last uncommitted batch from
the checkpoint's offset log), the rewrite lands byte-identical in the
same directory instead of duplicating rows. Combined with the
checkpoint (offset log + commit log), the pipeline is end-to-end
exactly-once onto files — the standard production pattern when the
sink is not transactional.

Restart recovery is tested in tests/test_streaming.py: run over half
the input, stop, add the rest, restart with the SAME checkpoint — the
source resumes from recorded offsets, already-committed batches are
not reprocessed, and the final files equal the batch answer.

Scale notes: each micro-batch write is a normal distributed parquet
job (no driver funnel); the ``batch_id=N`` layout is hive-partitioned,
so readers prune by batch and the compaction sink (tests/test_sinks.py)
can roll small per-batch files into fat ones asynchronously.
"""

from __future__ import annotations

import os
import tempfile
from uuid import uuid4

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .events_stream import _events_stream

ERRORS_ORACLE = """
SELECT event_id, user_id,
       CAST(epoch_us(ts) AS BIGINT) AS ts_us,
       value
FROM events
WHERE event_type = 'error'
"""


def errors_projected(events: DataFrame) -> DataFrame:
    """Stateless filter+project: error events with an epoch-us
    timestamp. Stateless → append mode, every row emitted exactly once,
    no watermark needed."""
    return events.filter(F.col("event_type") == "error").select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "value",
    )


def run_foreachbatch_parquet(
    stream_df: DataFrame, out_dir: str, checkpoint_dir: str
) -> None:
    """Drain ``stream_df`` to ``out_dir`` via foreachBatch, one
    ``batch_id=N`` parquet directory per micro-batch (idempotent
    overwrite — see module docstring), availableNow trigger (process
    all pending input, then stop; the checkpoint makes the next call
    incremental)."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch_id={batch_id}")
        )

    q = (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


@register("events_errors_foreachbatch", oracle=ERRORS_ORACLE, tags=("events", "streaming", "sink"))
def events_errors_foreachbatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end streaming file pipeline, ORACLE-CHECKED: readStream →
    stateless transform → foreachBatch exactly-once parquet sink → read
    the files back. Because the transform is stateless and the sink
    idempotent, the landed files must equal the batch answer exactly —
    which makes this the rare streaming query the DuckDB oracle can
    hash-verify, not just row-count."""
    base = tempfile.mkdtemp(prefix=f"icdp_fb_{uuid4().hex[:8]}_")
    out = os.path.join(base, "out")
    ckpt = os.path.join(base, "ckpt")
    transformed = errors_projected(_events_stream(spark, sf_dir))
    run_foreachbatch_parquet(transformed, out, ckpt)
    # empty-input guard: zero micro-batches → no batch_id=N dir is ever
    # written; read the (created) dir with the transform's own schema so
    # an empty stream yields an empty frame instead of a read error.
    # batch_id is the hive-partition dir name; the explicit schema omits
    # it, which also drops it for the compare.
    os.makedirs(out, exist_ok=True)
    return spark.read.schema(transformed.schema).parquet(out).select(
        "event_id", "user_id", "ts_us", "value"
    )


LATEST_PER_USER_ORACLE = """
SELECT user_id, event_id,
       CAST(epoch_us(ts) AS BIGINT) AS ts_us,
       event_type, value
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id
                               ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""


def _merge_latest(prev: DataFrame | None, batch: DataFrame) -> DataFrame:
    """Latest row per user_id across prev state ∪ batch — the MERGE
    step of the CDC apply loop. max_by over the (ts_us, event_id)
    struct totalizes ordering (event_id unique), so the kept witness
    row is deterministic."""
    both = batch if prev is None else prev.unionByName(batch)
    rank = F.struct(F.col("ts_us"), F.col("event_id"))
    row = F.struct("user_id", "event_id", "ts_us", "event_type", "value")
    return (
        both.groupBy("user_id")
        .agg(F.max_by(row, rank).alias("r"))
        .select("r.user_id", "r.event_id", "r.ts_us", "r.event_type", "r.value")
    )


def run_cdc_upsert(stream_df: DataFrame, state_dir: str, checkpoint_dir: str) -> str:
    """foreachBatch CDC apply: each micro-batch MERGEs into a keyed
    latest-per-user state table. State is VERSIONED by batch id
    (``v=N`` is the merge of ``v=M`` for the largest M < N with batch
    N) instead of overwritten in place: a batch retried after a crash
    deterministically rewrites its own version from the same
    predecessor — exactly-once without a transactional sink, the same
    idempotency trick as the batch_id=N append sink. Returns the path
    of the newest version after the drain.

    Scale notes: the merge is one shuffle of (bounded) state keyed by
    user plus the micro-batch; at warehouse scale state would be
    bucketed by user_id so the merge join is shuffle-free, and old
    versions vacuumed asynchronously."""
    import re

    def versions() -> list[int]:
        if not os.path.isdir(state_dir):
            return []
        return sorted(
            int(m.group(1))
            for m in (re.match(r"^v=(\d+)$", d) for d in os.listdir(state_dir))
            if m
        )

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        prior = [v for v in versions() if v < batch_id]
        prev = (
            spark.read.parquet(os.path.join(state_dir, f"v={prior[-1]}"))
            if prior
            else None
        )
        projected = batch_df.select(
            "user_id", "event_id", F.unix_micros("ts").alias("ts_us"), "event_type", "value"
        )
        _merge_latest(prev, projected).write.mode("overwrite").parquet(
            os.path.join(state_dir, f"v={batch_id}")
        )

    q = (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    vs = versions()
    return os.path.join(state_dir, f"v={vs[-1]}") if vs else state_dir


@register("events_cdc_upsert_stream", oracle=LATEST_PER_USER_ORACLE, tags=("events", "streaming", "sink"))
def events_cdc_upsert_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CDC upsert, ORACLE-CHECKED: readStream → foreachBatch
    MERGE into versioned latest-per-user state → read the final state
    back. However the input is micro-batched, the drained state must
    equal the batch 'latest event per user' answer — so the DuckDB
    oracle hash-verifies the whole apply loop (multi-batch delivery +
    restart recovery are exercised in tests/test_streaming.py)."""
    base = tempfile.mkdtemp(prefix=f"icdp_cdc_{uuid4().hex[:8]}_")
    state = os.path.join(base, "state")
    ckpt = os.path.join(base, "ckpt")
    stream = _events_stream(spark, sf_dir)
    # the exact schema write_batch's projection lands in the state files
    # (derived, not hardcoded, so a source-schema change can't desync it)
    state_schema = stream.select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us"), "event_type", "value"
    ).schema
    final = run_cdc_upsert(stream, state, ckpt)
    # empty-input guard: with zero micro-batches no state version is ever
    # written — read the (created) empty dir with the explicit state
    # schema instead of failing schema inference / path resolution
    os.makedirs(final, exist_ok=True)
    return spark.read.schema(state_schema).parquet(final).select(
        "user_id", "event_id", "ts_us", "event_type", "value"
    )
