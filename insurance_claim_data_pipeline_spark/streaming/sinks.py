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
    run_foreachbatch_parquet(errors_projected(_events_stream(spark, sf_dir)), out, ckpt)
    # batch_id is the inferred hive-partition column; drop it for the compare
    return spark.read.parquet(out).select("event_id", "user_id", "ts_us", "value")
