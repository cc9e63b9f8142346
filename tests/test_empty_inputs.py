"""Empty-input regression pins.

scripts/empty_probe.py sweeps the WHOLE registry against a zero-row
star schema (~4 min — run per round, not per test session). This module
pins just the queries that have ever FAILED that sweep, so the specific
guards that fixed them can't regress without a red test:

- er_blocking_budget       (ADVICE r04: unguarded n·(n−1)/2 denominator)
- sample_ht_estimator      (r05 sweep: unguarded div by n_all/n_kept/ht_den)
- graph_components_modularity (r05: modularity division by zero edges)
- graph_pagerank           (r05: Python ZeroDivision on node count)
- text_bpe_train_merges / text_bpe_apply_fertility
                           (r05: collect()[0] into an empty argmax)
- sink_partitioned_parquet_stats (r05: schema inference over zero files)
- events_errors_foreachbatch / events_cdc_upsert_stream
                           (r05: zero micro-batches → sink dir never created)
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

EVER_FAILED = (
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


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("sf_empty"))
    for t in TABLES:
        load_table(spark, "/root/testdata/sf0.001", t).limit(0).write.mode(
            "overwrite"
        ).parquet(os.path.join(base, f"{t}.parquet"))
    return base


@pytest.mark.parametrize("name", EVER_FAILED)
def test_runs_on_empty_input(spark, empty_sf_dir, name):
    # Must produce a frame (possibly zero-row) — never raise. NULL
    # metrics on degenerate input are fine; crashes are not.
    rows = registry.all_specs()[name].fn(spark, empty_sf_dir).limit(5).collect()
    assert rows is not None
