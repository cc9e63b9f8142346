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
