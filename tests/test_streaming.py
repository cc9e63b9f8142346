"""Structured Streaming smoke + batch-equivalence tests: the streaming
queries must produce exactly the batch twins' results once fully
drained (finite input, complete mode)."""

from __future__ import annotations

from insurance_claim_data_pipeline_spark.operators.eventops import (
    events_session_window_native,
    events_tumbling_window,
)
from insurance_claim_data_pipeline_spark.streaming import events_stream as es


def _sorted_rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_streaming_tumbling_equals_batch(spark, sf_dir):
    stream_result = es.events_tumbling_window_streaming(spark, sf_dir)
    batch_result = events_tumbling_window(spark, sf_dir)
    cols = ["window_start_us", "event_type", "n_events", "sum_value"]
    assert _sorted_rows(stream_result, cols) == _sorted_rows(batch_result, cols)


def test_streaming_reads_directory_layout_parquet(spark, sf_dir, tmp_path):
    """r09 scale-lab catch: `pathGlobFilter="events.parquet"` matches
    LEAF file names, so when events.parquet is a DIRECTORY of part
    files — every real writer's output layout — the file-stream source
    listed nothing and every events twin silently streamed ZERO rows.
    The harness's generated single-file testdata never trips it, so
    this fixture writes the directory layout explicitly and pins
    stream == batch == nonzero on it."""
    from insurance_claim_data_pipeline_spark.operators.eventops import (
        events_tumbling_window as batch_fn,
    )
    from insurance_claim_data_pipeline_spark.session import load_table

    d = tmp_path / "dir_layout_sf"
    load_table(spark, sf_dir, "events").write.parquet(str(d / "events.parquet"))
    stream_result = es.events_tumbling_window_streaming(spark, str(d))
    batch_result = batch_fn(spark, str(d))
    cols = ["window_start_us", "event_type", "n_events", "sum_value"]
    got = _sorted_rows(stream_result, cols)
    assert got == _sorted_rows(batch_result, cols)
    assert got, "directory-layout stream read zero rows"


def test_streaming_session_window_equals_batch(spark, sf_dir):
    events = es._events_stream(spark, sf_dir)
    stream_result = es.run_stream_to_memory(es.session_counts_stream(events), spark)
    batch_result = events_session_window_native(spark, sf_dir)
    cols = ["user_id", "session_start_us", "session_end_us", "n_events"]
    assert _sorted_rows(stream_result, cols) == _sorted_rows(batch_result, cols)


def test_streaming_claims_candidates_equals_batch(spark, sf_dir):
    from insurance_claim_data_pipeline_spark.plans.claim_queries import (
        ALPHA_PATH,
        BETA_PATH,
    )
    from insurance_claim_data_pipeline_spark.plans.claim_pipeline import candidates_frame
    from insurance_claim_data_pipeline_spark.sources.claims import load_claims
    from insurance_claim_data_pipeline_spark.streaming.claims_stream import (
        claims_candidates_streaming,
    )

    stream_result = claims_candidates_streaming(spark, sf_dir)
    batch = candidates_frame(load_claims(spark, [ALPHA_PATH, BETA_PATH]).claims).drop(
        "_file_idx", "_row_idx"
    )
    cols = ["claim_id", "resubmission_reason", "source_system", "recommended_changes"]
    assert _sorted_rows(stream_result, cols) == _sorted_rows(batch, cols)
    assert stream_result.count() == 4  # golden: A123, A124, A127, B988


def test_stateful_streaming_equals_batch(spark, sf_dir):
    from insurance_claim_data_pipeline_spark.streaming.stateful import (
        events_user_totals,
        events_user_totals_stateful_streaming,
    )

    stream_result = events_user_totals_stateful_streaming(spark, sf_dir)
    batch_result = events_user_totals(spark, sf_dir)
    cols = ["user_id", "n_events", "sum_value_cents", "last_event_us"]
    assert _sorted_rows(stream_result, cols) == _sorted_rows(batch_result, cols)


def test_watermark_drops_late_rows_vs_batch(spark, tmp_path):
    """Late-data semantics: with a 10-minute watermark in APPEND mode, a
    row arriving after its window has been finalized is DROPPED from the
    streaming result, while the batch twin (no watermark) counts it.
    This pins the state-bounding behavior the 1-hour production
    watermark relies on: state for closed windows is reclaimable because
    Spark is allowed to ignore stragglers behind the watermark."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyspark.sql import functions as F

    src = tmp_path / "stream_src"
    src.mkdir()
    base = dt.datetime(2025, 1, 1, 0, 0, 0)

    def write_file(name, rows):
        ts, et, val = zip(*rows)
        tbl = pa.table(
            {
                "ts": pa.array([base + dt.timedelta(minutes=m) for m in ts], pa.timestamp("us")),
                "event_type": pa.array(et),
                "value": pa.array(val, pa.float64()),
            }
        )
        pq.write_table(tbl, src / name)

    schema = "ts timestamp, event_type string, value double"
    stream = spark.readStream.schema(schema).parquet(str(src))
    agg = es.tumbling_counts_stream(stream, watermark="10 minutes")
    from uuid import uuid4

    name = f"late_{uuid4().hex[:8]}"
    # batch 1: window [00:00,00:10) gets one row; 01:00 advances the
    # watermark to 00:50, finalizing that window
    write_file("f1.parquet", [(5, "click", 1.0), (60, "click", 1.0)])
    q = agg.writeStream.outputMode("append").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
        # batch 2: a straggler for the closed [00:00,00:10) window plus an
        # on-time row for [01:00,01:10)
        write_file("f2.parquet", [(6, "click", 1.0), (65, "click", 1.0)])
        q.processAllAvailable()
        # batch 3: push the watermark past 01:10 so the second window flushes
        write_file("f3.parquet", [(180, "click", 1.0)])
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        r["window_start_us"]: r["n_events"] for r in spark.table(name).collect()
    }
    us = lambda m: int((base + dt.timedelta(minutes=m)).timestamp() * 1_000_000)
    # the late straggler was dropped: closed window keeps n=1
    assert got[us(0)] == 1
    # the on-time batch-2 row was counted
    assert got[us(60)] == 2

    # batch twin over the same files counts ALL rows, including the straggler
    batch = (
        spark.read.schema(schema)
        .parquet(str(src))
        .groupBy(F.window("ts", "10 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.unix_micros("w.start").alias("window_start_us"), "n_events")
    )
    bgot = {r["window_start_us"]: r["n_events"] for r in batch.collect()}
    assert bgot[us(0)] == 2 and bgot[us(60)] == 2


def test_streaming_dedup_drops_injected_duplicates(spark, tmp_path, sf_dir):
    """dropDuplicatesWithinWatermark: the same events file delivered
    twice (two micro-batches) must produce each event exactly once,
    equal to batch DISTINCT over one copy."""
    import shutil

    from insurance_claim_data_pipeline_spark.streaming import transform_state as tws

    src = tmp_path / "dup_src"
    src.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", src / "a.parquet")
    shutil.copy(f"{sf_dir}/events.parquet", src / "b.parquet")

    from pyspark.sql import functions as F

    from insurance_claim_data_pipeline_spark.session import normalize_timestamps as fix

    batch_one_copy = fix(spark.read.parquet(str(src / "a.parquet")))

    stream = spark.readStream.schema(
        spark.read.parquet(str(src)).schema
    ).option("maxFilesPerTrigger", "1").parquet(str(src))
    drained = tws.run_stream_to_memory(
        tws.dedup_stream(fix(stream)), spark, output_mode="append"
    )
    expected = (
        batch_one_copy.select(
            "event_id", "user_id", "event_type", F.unix_micros("ts").alias("ts_us")
        )
        .distinct()
        .collect()
    )
    got = drained.collect()
    assert len(got) == len(expected)
    assert sorted(map(tuple, got)) == sorted(map(tuple, expected))


def test_lastk_batch_twin_matches_pandas_model(spark, sf_dir):
    """The oracle-checked batch twin must equal an independent pandas
    recomputation of 'last K event types per user, oldest→newest'."""
    from insurance_claim_data_pipeline_spark.session import load_table
    from insurance_claim_data_pipeline_spark.streaming.transform_state import (
        LAST_K,
        events_lastk_types,
    )

    got = {r["user_id"]: r["last_types"] for r in events_lastk_types(spark, sf_dir).collect()}
    pdf = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    ).toPandas()
    pdf = pdf.sort_values(["user_id", "ts", "event_id"])
    for user_id, grp in pdf.groupby("user_id"):
        expect = "|".join(grp["event_type"].tail(LAST_K))
        assert got[int(user_id)] == expect, user_id


def test_transform_with_state_lastk_streaming_equals_batch(spark, sf_dir):
    """Full transformWithStateInPandas run (skipped where the gRPC state
    channel's protobuf dependency is absent — see TWS_AVAILABLE)."""
    import pytest

    from insurance_claim_data_pipeline_spark.streaming import transform_state as tws

    if not tws.TWS_AVAILABLE:
        pytest.skip("google.protobuf not available: transformWithState gated off")
    events = tws._events_stream(spark, sf_dir)
    drained = tws.run_stream_to_memory(
        tws.lastk_types_stream(events), spark, output_mode="update"
    )
    # update mode emits one snapshot per (user, micro-batch); the final
    # snapshot per user must equal the batch twin
    final = {r["user_id"]: r["last_types"] for r in drained.collect()}
    batch = {r["user_id"]: r["last_types"] for r in tws.events_lastk_types(spark, sf_dir).collect()}
    assert final == batch


def test_lastk_stream_raises_cleanly_when_gated(spark, sf_dir):
    from insurance_claim_data_pipeline_spark.streaming import transform_state as tws

    if tws.TWS_AVAILABLE:
        import pytest

        pytest.skip("capability present; gate path not reachable")
    import pytest

    events = tws._events_stream(spark, sf_dir)
    with pytest.raises(RuntimeError, match="protobuf"):
        tws.lastk_types_stream(events)


def test_streaming_conversion_join_equals_batch(spark, sf_dir):
    """The stream-stream watermarked join must produce exactly the batch
    join's pairs (one finite source, watermark far past the data)."""
    from insurance_claim_data_pipeline_spark.operators.eventops import (
        events_conversion_join,
    )
    from insurance_claim_data_pipeline_spark.streaming import events_stream as es

    got = {
        tuple(r)
        for r in es.events_conversion_streaming(spark, sf_dir).collect()
    }
    want = {tuple(r) for r in events_conversion_join(spark, sf_dir).collect()}
    assert got == want and want


def test_stream_static_enrichment_equals_batch(spark, sf_dir):
    """The stream-static enrichment join (stateless: each micro-batch
    probes the static dim) must equal its batch twin exactly."""
    from insurance_claim_data_pipeline_spark.streaming import events_stream as es

    got = {tuple(r) for r in es.events_enrich_streaming(spark, sf_dir).collect()}
    want = {tuple(r) for r in es.events_enriched_purchases(spark, sf_dir).collect()}
    assert got == want and want


def test_foreachbatch_sink_checkpoint_restart(spark, sf_dir, tmp_path):
    """Exactly-once file sink + restart recovery: drain half the input,
    stop, add the other half, restart with the SAME checkpoint. The
    second run must process only the new file (committed batches are
    not replayed) and the final files must equal the batch answer with
    no duplicates."""
    from insurance_claim_data_pipeline_spark.streaming import sinks as sk

    from insurance_claim_data_pipeline_spark.session import normalize_timestamps

    ev = normalize_timestamps(spark.read.parquet(f"{sf_dir}/events.parquet"))
    half_a = ev.filter("event_id % 2 = 0")
    half_b = ev.filter("event_id % 2 = 1")

    staging = str(tmp_path / "staging")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    half_a.coalesce(1).write.mode("append").parquet(staging)

    def run_once():
        stream = spark.readStream.schema(ev.schema).parquet(staging)
        sk.run_foreachbatch_parquet(sk.errors_projected(stream), out, ckpt)

    run_once()
    n_first = spark.read.parquet(out).count()
    batch_dirs_first = {p.name for p in (tmp_path / "out").glob("batch_id=*")}

    half_b.coalesce(1).write.mode("append").parquet(staging)
    run_once()

    got = spark.read.parquet(out).select("event_id", "user_id", "ts_us", "value")
    want = sk.errors_projected(ev)
    got_rows = sorted(tuple(r) for r in got.collect())
    want_rows = sorted(tuple(r) for r in want.collect())
    assert got_rows == want_rows and want_rows
    # no duplicates across batches (exactly-once), and the restart
    # appended new batch dirs instead of reprocessing committed ones
    assert len(got_rows) == len({r[0] for r in got_rows})
    assert n_first < len(got_rows)
    batch_dirs_final = {p.name for p in (tmp_path / "out").glob("batch_id=*")}
    assert batch_dirs_first < batch_dirs_final


def test_foreachbatch_rerun_without_new_data_is_noop(spark, sf_dir, tmp_path):
    """A third run with the same checkpoint and no new input must write
    nothing new (the offset log knows everything is committed)."""
    from insurance_claim_data_pipeline_spark.streaming import sinks as sk

    from insurance_claim_data_pipeline_spark.session import normalize_timestamps

    ev = normalize_timestamps(spark.read.parquet(f"{sf_dir}/events.parquet"))
    staging = str(tmp_path / "staging")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    ev.coalesce(1).write.mode("append").parquet(staging)

    stream = spark.readStream.schema(ev.schema).parquet(staging)
    sk.run_foreachbatch_parquet(sk.errors_projected(stream), out, ckpt)
    before = {p.name for p in (tmp_path / "out").glob("batch_id=*")}
    n_before = spark.read.parquet(out).count()

    stream2 = spark.readStream.schema(ev.schema).parquet(staging)
    sk.run_foreachbatch_parquet(sk.errors_projected(stream2), out, ckpt)
    after = {p.name for p in (tmp_path / "out").glob("batch_id=*")}
    assert after == before
    assert spark.read.parquet(out).count() == n_before


def test_cdc_upsert_multibatch_and_restart(spark, sf_dir, tmp_path):
    """CDC apply loop under real micro-batching: events delivered one
    file per trigger, then a restart with the same checkpoint and new
    data. Final state must equal batch latest-per-user over everything
    delivered; versions only grow (committed batches never reapply)."""
    from pyspark.sql import functions as F

    from insurance_claim_data_pipeline_spark.session import normalize_timestamps
    from insurance_claim_data_pipeline_spark.streaming import sinks as sk

    ev = normalize_timestamps(spark.read.parquet(f"{sf_dir}/events.parquet"))
    staging = str(tmp_path / "staging")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    # three files -> three micro-batches with maxFilesPerTrigger=1
    for i in range(3):
        ev.filter(F.col("event_id") % 4 == i).coalesce(1).write.mode("append").parquet(staging)

    def drain():
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(staging)
        )
        return sk.run_cdc_upsert(stream, state, ckpt)

    final = drain()
    import os as _os

    versions_after_first = set(_os.listdir(state))
    assert len(versions_after_first) >= 2  # really micro-batched

    def latest_per_user(df):
        rank = F.struct(F.unix_micros("ts").alias("ts_us"), F.col("event_id"))
        row = F.struct(
            "user_id", "event_id", F.unix_micros("ts").alias("ts_us"), "event_type", "value"
        )
        return (
            df.groupBy("user_id")
            .agg(F.max_by(row, rank).alias("r"))
            .select("r.user_id", "r.event_id", "r.ts_us", "r.event_type", "r.value")
        )

    got = sorted(tuple(r) for r in spark.read.parquet(final).collect())
    want = sorted(
        tuple(r) for r in latest_per_user(ev.filter(F.col("event_id") % 4 != 3)).collect()
    )
    assert got == want and want

    # restart with the remaining quarter: only the new file is applied
    ev.filter(F.col("event_id") % 4 == 3).coalesce(1).write.mode("append").parquet(staging)
    final2 = drain()
    got2 = sorted(tuple(r) for r in spark.read.parquet(final2).collect())
    want2 = sorted(tuple(r) for r in latest_per_user(ev).collect())
    assert got2 == want2
    assert versions_after_first < set(_os.listdir(state))  # monotone versions


def test_streaming_ema_equals_batch(spark, sf_dir):
    """Drained single-batch stream: every emitted (user, event) EMA row
    must equal the oracle-checked batch twin exactly."""
    from insurance_claim_data_pipeline_spark.operators.ema import events_ema_irregular
    from insurance_claim_data_pipeline_spark.streaming.stateful import events_ema_streaming

    got = sorted(tuple(r) for r in events_ema_streaming(spark, sf_dir).collect())
    want = sorted(tuple(r) for r in events_ema_irregular(spark, sf_dir).collect())
    assert got == want and want


def test_streaming_ema_multibatch_time_split(spark, sf_dir, tmp_path):
    """Real micro-batching: events delivered as three time-ordered file
    drops (maxFilesPerTrigger=1), so per-user state must carry the decay
    across batch boundaries. The union of all emitted rows must still
    equal the batch answer row-for-row."""
    from pyspark.sql import functions as F

    from insurance_claim_data_pipeline_spark.operators.ema import events_ema_irregular
    from insurance_claim_data_pipeline_spark.session import normalize_timestamps
    from insurance_claim_data_pipeline_spark.streaming.events_stream import (
        run_stream_to_memory,
    )
    from insurance_claim_data_pipeline_spark.streaming.stateful import ema_stream

    ev = normalize_timestamps(spark.read.parquet(f"{sf_dir}/events.parquet"))
    lo, hi = ev.agg(
        F.min(F.unix_micros("ts")), F.max(F.unix_micros("ts"))
    ).first()
    cut1, cut2 = lo + (hi - lo) // 3, lo + 2 * (hi - lo) // 3
    staging = str(tmp_path / "staging")
    us = F.unix_micros("ts")
    # FileStreamSource orders micro-batches by file modification time;
    # the EMA state contract requires time-ordered batches, so stamp
    # each drop's new files with strictly increasing mtimes (ADVICE
    # r03: equal coarse-granularity timestamps could reorder batches).
    import os as _os2
    import time as _time

    stamped: set[str] = set()
    base = _time.time()
    for i, cond in enumerate((us <= cut1, (us > cut1) & (us <= cut2), us > cut2)):
        ev.filter(cond).coalesce(1).write.mode("append").parquet(staging)
        for name in _os2.listdir(staging):
            if name.endswith(".parquet") and name not in stamped:
                _os2.utime(_os2.path.join(staging, name), (base + 10 * i,) * 2)
                stamped.add(name)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(staging)
    )
    out = run_stream_to_memory(
        ema_stream(normalize_timestamps(stream)), spark, output_mode="update"
    )
    got = sorted(tuple(r) for r in out.collect())
    want = sorted(tuple(r) for r in events_ema_irregular(spark, sf_dir).collect())
    assert got == want and want


def test_streaming_cusum_multibatch_equals_batch(spark, sf_dir, tmp_path):
    """The streaming CUSUM monitor must emit the batch twin's rows
    exactly — both in one gulp and under forced time-split
    micro-batching (three ordered file drops, maxFilesPerTrigger=1),
    where S+ must carry across batch boundaries."""
    import os as _os
    import time as _time

    from pyspark.sql import functions as F

    from insurance_claim_data_pipeline_spark.operators.ema import events_cusum_alarm
    from insurance_claim_data_pipeline_spark.streaming.events_stream import (
        run_stream_to_memory,
    )
    from insurance_claim_data_pipeline_spark.streaming.stateful import (
        cusum_seq_frame,
        cusum_stream,
    )

    batch = {
        (r["event_type"], r["hour_idx"]): (r["s_plus_e6"], r["alarm"])
        for r in events_cusum_alarm(spark, sf_dir).collect()
    }
    seq = cusum_seq_frame(spark, sf_dir)
    lo, hi = seq.agg(F.min("hour_idx"), F.max("hour_idx")).first()
    cut1, cut2 = lo + (hi - lo) // 3, lo + 2 * (hi - lo) // 3
    staging = str(tmp_path / "staging")
    stamped: set[str] = set()
    base = _time.time()
    h = F.col("hour_idx")
    for i, cond in enumerate((h <= cut1, (h > cut1) & (h <= cut2), h > cut2)):
        seq.filter(cond).coalesce(1).write.mode("append").parquet(staging)
        for name in _os.listdir(staging):
            if name.endswith(".parquet") and name not in stamped:
                _os.utime(_os.path.join(staging, name), (base + 10 * i,) * 2)
                stamped.add(name)
    stream = (
        spark.readStream.schema(seq.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(staging)
    )
    got = run_stream_to_memory(cusum_stream(stream), spark, output_mode="update")
    out = {
        (r["event_type"], r["hour_idx"]): (r["s_plus_e6"], r["alarm"])
        for r in got.collect()
    }
    assert out == batch


def test_streaming_watermark_finalization_single_batch(spark, sf_dir):
    """On a single-gulp source nothing is late, so the append-mode
    drained output must equal the oracle-checked batch twin exactly."""
    from insurance_claim_data_pipeline_spark.operators.maintenance import (
        events_watermark_finalized,
    )
    from insurance_claim_data_pipeline_spark.registry import all_specs

    st = all_specs()["events_watermark_drop_streaming"]
    got = sorted(tuple(r) for r in st.fn(spark, sf_dir).collect())
    want = sorted(tuple(r) for r in events_watermark_finalized(spark, sf_dir).collect())
    assert got == want and want


def test_streaming_watermark_drops_late_rows_as_simulated(spark, sf_dir, tmp_path):
    """Force six micro-batches in a modeled ARRIVAL order and check
    Spark's real watermark semantics against a from-first-principles
    simulation of the TWO-watermark model (SPARK-24634): late input in
    batch b is filtered against the PREVIOUS watermark (max event time
    through batch b−2, minus delay — so a row arriving in the very
    batch that advances the watermark is still accepted), eviction and
    emission use the CURRENT watermark, and a window is emitted iff
    its end ≤ the final watermark. Watermarks are tracked in
    milliseconds, as the engine does.

    The jitter here is deliberately LARGE (md5 mod ~9 days — unlike
    the production-shaped 900 s model in events_watermark_lateness)
    because the one-batch filter lag means a row is only dropped when
    its disorder exceeds a full micro-batch arrival span (~4.5 days
    here) plus the delay; the run must actually drop rows (asserted),
    otherwise the drop path never fires and the test is vacuous."""
    import os as _os
    import time as _time

    from pyspark.sql import functions as F

    from insurance_claim_data_pipeline_spark.operators.maintenance import (
        WM_TWIN_DELAY_US,
        WM_WINDOW_US,
    )
    from insurance_claim_data_pipeline_spark.session import load_table, normalize_timestamps
    from insurance_claim_data_pipeline_spark.streaming.events_stream import (
        run_stream_to_memory,
        watermark_finalized_stream,
    )

    test_jitter_s = 800_000  # ~9 days of modeled ingest disorder
    n_batches = 6
    ev = load_table(spark, sf_dir, "events").select(
        "ts",
        "event_type",
        (
            F.unix_micros("ts")
            + F.pmod(
                F.conv(
                    F.substring(F.md5(F.col("event_id").cast("string")), 1, 8), 16, 10
                ).cast("long"),
                F.lit(test_jitter_s),
            )
            * F.lit(1_000_000)
        ).alias("arrival_us"),
    )
    all_rows = sorted(
        (
            (r["arrival_us"], r["us"], r["event_type"])
            for r in ev.withColumn("us", F.unix_micros("ts")).collect()
        )
    )
    per = (len(all_rows) + n_batches - 1) // n_batches
    cuts = sorted({all_rows[min((i + 1) * per, len(all_rows)) - 1][0] for i in range(n_batches)})

    staging = str(tmp_path / "staging")
    stamped: set[str] = set()
    base = _time.time()
    prev_cut = None
    batch_files: list[str] = []
    for i, cut in enumerate(cuts):
        a = F.col("arrival_us")
        cond = a <= cut if prev_cut is None else (a > prev_cut) & (a <= cut)
        prev_cut = cut
        ev.filter(cond).select("ts", "event_type").coalesce(1).write.mode(
            "append"
        ).parquet(staging)
        for name in _os.listdir(staging):
            if name.endswith(".parquet") and name not in stamped:
                _os.utime(_os.path.join(staging, name), (base + 10 * i,) * 2)
                stamped.add(name)
                batch_files.append(_os.path.join(staging, name))
    # simulate from the ACTUAL staged files (the exact micro-batch
    # contents), not from recomputed slices
    batches = [
        [
            (r["us"], r["event_type"])
            for r in spark.read.parquet(f)
            .withColumn("us", F.unix_micros("ts"))
            .collect()
        ]
        for f in batch_files
    ]

    stream = (
        spark.readStream.schema(spark.read.parquet(staging).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(staging)
    )
    got = run_stream_to_memory(
        watermark_finalized_stream(normalize_timestamps(stream)),
        spark,
        output_mode="append",
    )
    out = {
        (r["window_start_us"], r["event_type"]): r["n_events"] for r in got.collect()
    }

    # first-principles simulation over the same batch partitioning
    counts: dict[tuple[int, str], int] = {}
    max_prev = None  # max event time through batch b-2 (late filter)
    max_seen = None  # max event time through batch b-1 (eviction)
    dropped = 0

    def wm_us(mx):
        # Spark tracks event-time watermarks in MILLISECONDS: the max
        # event time is truncated to ms before the delay is subtracted.
        return (mx // 1000 - WM_TWIN_DELAY_US // 1000) * 1000

    for batch in batches:
        wm_late = None if max_prev is None else wm_us(max_prev)
        for us, ty in batch:
            wstart = us // WM_WINDOW_US * WM_WINDOW_US
            if wm_late is not None and wstart + WM_WINDOW_US <= wm_late:
                dropped += 1
                continue
            counts[(wstart, ty)] = counts.get((wstart, ty), 0) + 1
        batch_max = max(us for us, _ in batch)
        max_prev = max_seen
        max_seen = batch_max if max_seen is None else max(max_seen, batch_max)
    final_wm = wm_us(max_seen)
    want = {k: v for k, v in counts.items() if k[0] + WM_WINDOW_US <= final_wm}
    assert dropped > 0  # the scenario genuinely exercises late-drop
    assert out == want


def test_streaming_kalman_equals_batch(spark, sf_dir):
    """Drained single-batch stream: every emitted Kalman row must equal
    the oracle-checked batch twin exactly — estimate AND covariance."""
    from insurance_claim_data_pipeline_spark.operators.ema import events_kalman_filter
    from insurance_claim_data_pipeline_spark.streaming.stateful import (
        events_kalman_streaming,
    )

    got = sorted(tuple(r) for r in events_kalman_streaming(spark, sf_dir).collect())
    want = sorted(tuple(r) for r in events_kalman_filter(spark, sf_dir).collect())
    assert got == want and want


def test_streaming_kalman_multibatch_time_split(spark, sf_dir, tmp_path):
    """Three time-ordered file drops (maxFilesPerTrigger=1): the
    (estimate, covariance) state must carry across micro-batch
    boundaries; union of emitted rows == batch answer row-for-row."""
    import os as _os
    import time as _time

    from pyspark.sql import functions as F

    from insurance_claim_data_pipeline_spark.operators.ema import events_kalman_filter
    from insurance_claim_data_pipeline_spark.session import normalize_timestamps
    from insurance_claim_data_pipeline_spark.streaming.events_stream import (
        run_stream_to_memory,
    )
    from insurance_claim_data_pipeline_spark.streaming.stateful import kalman_stream

    ev = normalize_timestamps(spark.read.parquet(f"{sf_dir}/events.parquet"))
    lo, hi = ev.agg(F.min(F.unix_micros("ts")), F.max(F.unix_micros("ts"))).first()
    cut1, cut2 = lo + (hi - lo) // 3, lo + 2 * (hi - lo) // 3
    staging = str(tmp_path / "staging")
    us = F.unix_micros("ts")
    stamped: set[str] = set()
    base = _time.time()
    for i, cond in enumerate((us <= cut1, (us > cut1) & (us <= cut2), us > cut2)):
        ev.filter(cond).coalesce(1).write.mode("append").parquet(staging)
        for name in _os.listdir(staging):
            if name.endswith(".parquet") and name not in stamped:
                _os.utime(_os.path.join(staging, name), (base + 10 * i,) * 2)
                stamped.add(name)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(staging)
    )
    got = sorted(
        tuple(r)
        for r in run_stream_to_memory(
            kalman_stream(stream), spark, output_mode="update"
        ).collect()
    )
    want = sorted(tuple(r) for r in events_kalman_filter(spark, sf_dir).collect())
    assert got == want and want


def test_batching_independence_of_oracled_twins(spark, sf_dir, tmp_path):
    """r06 upgraded five more twins to oracle-checked on
    batching-independence arguments (complete-mode final snapshot,
    stateless append, final-snapshot filter, watermark-margin
    co-arrival). This test REPLAYS each argument under real
    micro-batching — three time-ordered file drops,
    maxFilesPerTrigger=1 — and asserts the drained result still equals
    the batch twin row-for-row. The conversion join's margin claim is
    load-bearing: state eviction trails the watermark by 1 h while
    matches span <=30 min, so a time-ordered split can never separate a
    pair beyond eviction."""
    from pyspark.sql import functions as F

    from insurance_claim_data_pipeline_spark.operators.eventops import (
        events_conversion_join,
        events_session_window_native,
        events_tumbling_window,
    )
    from insurance_claim_data_pipeline_spark.session import normalize_timestamps
    from insurance_claim_data_pipeline_spark.streaming.events_stream import (
        _user_dim,
        conversion_join_stream,
        enriched_purchases,
        events_enriched_purchases,
        run_stream_to_memory,
        session_counts_stream,
        tumbling_counts_stream,
    )
    from insurance_claim_data_pipeline_spark.streaming.stateful import (
        events_user_totals,
        user_totals_stream,
    )

    ev = normalize_timestamps(spark.read.parquet(f"{sf_dir}/events.parquet"))
    lo, hi = ev.agg(F.min(F.unix_micros("ts")), F.max(F.unix_micros("ts"))).first()
    cut1, cut2 = lo + (hi - lo) // 3, lo + 2 * (hi - lo) // 3
    staging = str(tmp_path / "staging")
    us = F.unix_micros("ts")
    import os as _os
    import time as _time

    stamped: set[str] = set()
    base = _time.time()
    for i, cond in enumerate((us <= cut1, (us > cut1) & (us <= cut2), us > cut2)):
        ev.filter(cond).coalesce(1).write.mode("append").parquet(staging)
        for name in _os.listdir(staging):
            if name.endswith(".parquet") and name not in stamped:
                _os.utime(_os.path.join(staging, name), (base + 10 * i,) * 2)
                stamped.add(name)

    def staged_stream():
        return normalize_timestamps(
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(staging)
        )

    # complete mode: final snapshot regardless of batching
    got = run_stream_to_memory(tumbling_counts_stream(staged_stream()), spark)
    want = events_tumbling_window(spark, sf_dir)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))

    got = run_stream_to_memory(session_counts_stream(staged_stream()), spark)
    want = events_session_window_native(spark, sf_dir)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))

    # stateless append: each purchase emitted exactly once per batch it's in
    got = run_stream_to_memory(
        enriched_purchases(staged_stream(), F.broadcast(_user_dim(spark, sf_dir))),
        spark,
        output_mode="append",
    )
    want = events_enriched_purchases(spark, sf_dir)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))

    # stream-stream join: watermark margin keeps cross-batch matches alive
    got = run_stream_to_memory(
        conversion_join_stream(staged_stream()), spark, output_mode="append"
    )
    want = events_conversion_join(spark, sf_dir)
    rows = sorted(map(tuple, got.collect()))
    assert rows == sorted(map(tuple, want.collect())) and rows

    # stateful totals: the final snapshot per user equals full-table totals
    from pyspark.sql import Window as W

    out = run_stream_to_memory(
        user_totals_stream(staged_stream()), spark, output_mode="update"
    )
    w_last = W.partitionBy("user_id").orderBy(
        F.desc("n_events"), F.desc("last_event_us")
    )
    got_rows = sorted(
        map(
            tuple,
            out.withColumn("rn", F.row_number().over(w_last))
            .filter(F.col("rn") == 1)
            .drop("rn")
            .collect(),
        )
    )
    want_rows = sorted(map(tuple, events_user_totals(spark, sf_dir).collect()))
    assert got_rows == want_rows and want_rows
