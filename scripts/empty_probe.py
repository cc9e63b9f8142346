"""Empty-input robustness sweep: run EVERY registry query against a
zero-row copy of the star schema and report any Spark-side crash.

An empty partition, date-slice, or filtered-out shard is routine at
100 TB; an operator that throws on zero rows (unguarded division,
``collect()[0]``, schema inference over zero files) is the bug class
ADVICE r04 found in er_blocking_budget. The r05 sweep found and fixed
8 more (see tests/test_empty_inputs.py for the pinned regressions).

Run from anywhere:

    python /root/repo/scripts/empty_probe.py        # ~4 min

Exits non-zero on any failure. claims_* queries are skipped (they read
the checked-in fixture files, not the sf dir).
"""

from __future__ import annotations

import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from insurance_claim_data_pipeline_spark import registry  # noqa: E402
from insurance_claim_data_pipeline_spark.session import get_spark, load_table  # noqa: E402

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def write_empty_fixture(spark, base: str) -> None:
    for t in TABLES:
        load_table(spark, "/root/testdata/sf0.001", t).limit(0).write.mode(
            "overwrite"
        ).parquet(os.path.join(base, f"{t}.parquet"))


def main() -> int:
    spark = get_spark("empty-probe")
    base = os.path.join(tempfile.gettempdir(), "icdp_empty_fixture")
    write_empty_fixture(spark, base)
    failures = []
    for name, spec in registry.all_specs().items():
        if name.startswith("claims_"):
            continue
        try:
            spec.fn(spark, base).limit(5).collect()
        except Exception as e:  # noqa: BLE001 — report-and-continue sweep
            failures.append(name)
            print(f"FAIL {name}: {type(e).__name__}: {str(e)[:140]}", flush=True)
    print(f"done: {len(failures)} empty-input failure(s)")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
