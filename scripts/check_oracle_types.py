"""Cross-engine result-type audit: flag oracle SQL whose DuckDB output
types would hash differently from Spark's under the driver's value hash.

Root cause class (VERDICT r02): DuckDB types ``SUM(BIGINT)`` as HUGEINT
(int128); the driver serializes HUGEINT differently from Spark's long
even when values are numerically identical, so the hash check fails on
correct answers. Same risk for DECIMAL-vs-double divergence.

Rules (per column of each oracled query, via ``DESCRIBE`` — no data read):
- DuckDB HUGEINT/UHUGEINT            -> always flagged (Spark has no int128).
- DuckDB DECIMAL where Spark long/int/double -> flagged.
- DuckDB DOUBLE where Spark long/int (or vice versa) -> flagged
  (int/float serialize differently in the driver hash).

Run:  python scripts/check_oracle_types.py [sf_dir]
Exit code 1 if anything is flagged. The same check is enforced in
``tests/test_oracle_parity.py`` via :func:`oracle_type_problems`.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from insurance_claim_data_pipeline_spark import registry  # noqa: E402
from insurance_claim_data_pipeline_spark.session import get_spark  # noqa: E402
from tests.oracle_utils import duckdb_conn, oracle_type_problems  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("oracle-type-audit")
    con = duckdb_conn(sf_dir)
    flagged = 0
    for name, spec in registry.all_specs().items():
        if spec.oracle is None:
            continue
        try:
            spark_schema = spec.fn(spark, sf_dir).schema
        except Exception as e:  # pragma: no cover - diagnostic tool
            print(f"ERROR  {name}: spark plan failed: {e}")
            flagged += 1
            continue
        problems = oracle_type_problems(con, spec.oracle, spark_schema, name)
        for p in problems:
            print("FLAG  ", p)
        flagged += len(problems)
    con.close()
    print(f"done: {flagged} flagged column(s)")
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
