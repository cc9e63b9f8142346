"""Every registered query must match its DuckDB oracle (the driver's
correctness gate, replicated locally — see oracle_utils).

Runs at sf0.001 by default for speed; set SPARK_GRAFT_PARITY_SF to
/root/testdata/sf0.01 to reproduce the driver's exact configuration.
"""

from __future__ import annotations

import pytest

from insurance_claim_data_pipeline_spark import registry

from .conftest import SF_DRIVER, SF_ORACLE
from .oracle_utils import run_parity

SPECS = registry.all_specs()
ORACLE_SPECS = sorted(n for n, s in SPECS.items() if s.oracle is not None)
ROWS_ONLY_SPECS = sorted(n for n, s in SPECS.items() if s.oracle is None)


@pytest.mark.parametrize("name", ORACLE_SPECS)
def test_oracle_parity(spark, name):
    spec = SPECS[name]
    problems = run_parity(spark, SF_ORACLE, name, spec.fn, spec.oracle)
    assert not problems, "\n".join(problems)


@pytest.mark.parametrize("name", ROWS_ONLY_SPECS)
def test_rows_only_queries_run(spark, name):
    df = SPECS[name].fn(spark, SF_ORACLE)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_seasonal_decompose_parity_is_nonvacuous(spark):
    """ADVICE r03: events_seasonal_decompose keeps only complete
    24-hour trend windows (wcnt == 24); at sf0.001 the hourly series is
    too short and BOTH engines return 0 rows, so the generic parity
    test above passes vacuously. Pin this query's parity to sf0.01 (the
    driver's gate scale) and require a non-empty result so a divergence
    in the non-trivial path cannot hide."""
    spec = SPECS["events_seasonal_decompose"]
    assert spec.fn(spark, SF_DRIVER).count() > 0
    problems = run_parity(spark, SF_DRIVER, "events_seasonal_decompose", spec.fn, spec.oracle)
    assert not problems, "\n".join(problems)


def test_bare_sum_oracle_flagged_locally(spark):
    """Regression guard for the r02 driver-hash failure class: a DuckDB
    oracle with a bare SUM over an integer column types the result
    HUGEINT, which the driver hash distinguishes from Spark's long even
    on identical values. The local harness must flag it (it did NOT in
    r02 — canon_cell unified the representations)."""
    from pyspark.sql import functions as F

    from insurance_claim_data_pipeline_spark.session import load_table

    def fn(sp, sf):
        return load_table(sp, sf, "documents").agg(F.sum("n_chars").alias("s"))

    bad = run_parity(spark, SF_ORACLE, "bare_sum", fn, "SELECT SUM(n_chars) AS s FROM documents")
    assert any("HUGEINT" in p for p in bad), bad
    good = run_parity(
        spark, SF_ORACLE, "cast_sum", fn,
        "SELECT CAST(SUM(n_chars) AS BIGINT) AS s FROM documents",
    )
    assert not good, good


def test_driver_contract_surface():
    import __spark_entry__ as entrymod

    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) == len(SPECS)


def test_entry_smoke(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
