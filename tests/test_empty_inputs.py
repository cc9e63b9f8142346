"""Degenerate-input regression pins.

scripts/empty_probe.py sweeps the WHOLE registry against zero-row and
one-row star schemas (~8 min — run per round, not per test session).
This module pins just the queries that have ever FAILED those sweeps,
so the specific guards that fixed them can't regress without a red
test. Spark 4 runs ANSI mode by default, so any unguarded division by
zero is a hard SparkArithmeticException — ``functions/guards.py``
documents the standard ``nonzero`` fix.

Empty-input class (r04 ADVICE + r05 sweep):

- er_blocking_budget       (ADVICE r04: unguarded n·(n−1)/2 denominator)
- sample_ht_estimator      (unguarded div by n_all/n_kept/ht_den)
- graph_components_modularity (modularity division by zero edges)
- graph_pagerank           (Python ZeroDivision on node count)
- text_bpe_train_merges / text_bpe_apply_fertility
                           (collect()[0] into an empty argmax)
- sink_partitioned_parquet_stats (schema inference over zero files)
- events_errors_foreachbatch / events_cdc_upsert_stream
                           (zero micro-batches → sink dir never created)

Single-row class (r05 sweep — the n−1 / zero-variance family): 17
statistics whose denominator collapses when a slice has one row, one
group, or one split side; each now yields NULL for the undefined
statistic via ``nonzero``.

Constant-input class (r05 sweep, one row duplicated 5×: n>1 but zero
variance everywhere): stats_corr_matrix (Pearson denominator).

NULL-payload class (r05 sweep, NULLs injected into the surfaces real
corpora actually null out — documents.text, events.value,
embeddings.embedding): 12 Arrow/Pandas-UDF paths that fed ``bytes(None)``
/ ``float(None)`` / ``list(None)`` into worker closures. Fixed with
fail-soft ``isNotNull`` filters BEFORE the Arrow stage (the X1
per-record discipline), never inside the closure.
"""

from __future__ import annotations

import os

import pytest

from insurance_claim_data_pipeline_spark import registry
from insurance_claim_data_pipeline_spark.session import load_table

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

EMPTY_EVER_FAILED = (
    "er_blocking_budget",
    "sample_ht_estimator",
    "graph_components_modularity",
    "graph_pagerank",
    "text_bpe_train_merges",
    "text_bpe_apply_fertility",
    "sink_partitioned_parquet_stats",
    "events_errors_foreachbatch",
    "events_cdc_upsert_stream",
)

ONEROW_EVER_FAILED = (
    "drift_ks_twosample",
    "agg_bootstrap_ci",
    "stats_spearman_corr",
    "stats_brown_forsythe",
    "stats_lift_bootstrap_ci",
    "emb_pca_project",
    "emb_isotropy_score",
    "text_heaps_fit",
    "text_jsd_split_shift",
    "feat_target_encode_cv",
    "events_burstiness",
    "events_outlier_mad",
    "stats_anova_oneway",
    "stats_power_mde",
    "stats_fixed_effects_ols",
    "agg_stats",
    "events_linear_trend",
)


def _write_fixture(spark, base: str, n_rows: int) -> str:
    for t in TABLES:
        load_table(spark, "/root/testdata/sf0.001", t).limit(n_rows).write.mode(
            "overwrite"
        ).parquet(os.path.join(base, f"{t}.parquet"))
    return base


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory):
    return _write_fixture(spark, str(tmp_path_factory.mktemp("sf_empty")), 0)


@pytest.fixture(scope="module")
def onerow_sf_dir(spark, tmp_path_factory):
    return _write_fixture(spark, str(tmp_path_factory.mktemp("sf_one")), 1)


@pytest.mark.parametrize("name", EMPTY_EVER_FAILED)
def test_runs_on_empty_input(spark, empty_sf_dir, name):
    # Must produce a frame (possibly zero-row) — never raise. NULL
    # metrics on degenerate input are fine; crashes are not.
    rows = registry.all_specs()[name].fn(spark, empty_sf_dir).limit(5).collect()
    assert rows is not None


CONSTANT_EVER_FAILED = ("stats_corr_matrix",)


@pytest.fixture(scope="module")
def constant_sf_dir(spark, tmp_path_factory):
    import pyspark.sql.functions as F

    base = str(tmp_path_factory.mktemp("sf_const"))
    for t in TABLES:
        one = load_table(spark, "/root/testdata/sf0.001", t).limit(1)
        rep = one.crossJoin(spark.range(5).select(F.lit(1).alias("_d"))).drop("_d")
        rep.write.mode("overwrite").parquet(os.path.join(base, f"{t}.parquet"))
    return base


@pytest.mark.parametrize("name", CONSTANT_EVER_FAILED)
def test_runs_on_constant_input(spark, constant_sf_dir, name):
    # n>1 but zero variance: a correlation/variance denominator of 0
    # must surface as NULL, not a SparkArithmeticException.
    rows = registry.all_specs()[name].fn(spark, constant_sf_dir).limit(5).collect()
    assert rows is not None


NULL_EVER_FAILED = (
    "multimodal_decode_metadata",
    "multimodal_frame_sample",
    "multimodal_resize",
    "multimodal_feature_extract",
    "multimodal_audio_framing",
    "multimodal_audio_vad",
    "multimodal_shot_boundaries",
    "events_ema_irregular",
    "events_kalman_filter",
    # r10: their STREAMING twins crashed on the same fixture once the
    # r09 directory-layout fix let file streams actually read it (the
    # probe fixtures are Spark-written directories) — float(None) in
    # the state handler. Fixed with the batch twins' exact pre-Arrow
    # isNotNull filter, so stream == batch holds on NULL corpora too.
    "events_ema_streaming",
    "events_kalman_streaming",
    "text_rolling_fingerprint",
    "sim_topk_ivf_trained",
    "sim_topk_pq_trained",
)


@pytest.fixture(scope="module")
def nullpayload_sf_dir(spark, tmp_path_factory):
    import pyspark.sql.functions as F

    keys = {"documents": ("text", "doc_id"), "events": ("value", "event_id"),
            "embeddings": ("embedding", "vec_id")}
    base = str(tmp_path_factory.mktemp("sf_nulls"))
    for t in TABLES:
        df = load_table(spark, "/root/testdata/sf0.001", t)
        if t in keys:
            c, k = keys[t]
            df = df.withColumn(
                c, F.when(F.col(k) % 3 == 0, F.lit(None)).otherwise(F.col(c))
            )
        df.write.mode("overwrite").parquet(os.path.join(base, f"{t}.parquet"))
    return base


@pytest.mark.parametrize("name", NULL_EVER_FAILED)
def test_runs_on_null_payload_input(spark, nullpayload_sf_dir, name):
    # A corpus row with a NULL payload (no text, no measurement, no
    # embedding) must be skipped fail-soft, not crash the Arrow stage.
    rows = registry.all_specs()[name].fn(spark, nullpayload_sf_dir).limit(5).collect()
    assert rows is not None


@pytest.mark.parametrize("name", ONEROW_EVER_FAILED)
def test_runs_on_single_row_input(spark, onerow_sf_dir, name):
    # Undefined statistics (variance of one point, correlation with zero
    # rank spread, an empty split side) must surface as NULL, not as a
    # SparkArithmeticException.
    rows = registry.all_specs()[name].fn(spark, onerow_sf_dir).limit(5).collect()
    assert rows is not None
